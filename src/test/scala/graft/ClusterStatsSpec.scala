package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ClusterScaling

/** Statistics/reporting contract of the cluster-scaling evidence (no
  * spark-submit here — that is exercised by ClusterScalingBench itself):
  * the headline `efficiency` is the MEDIAN of valid strict run-total
  * samples (round-3 verdict item 2 — a storm-inflated super-linear sample
  * must never headline), per-sample storm validity is flagged in the
  * history JSONL, the optimistic best-batch and best-of-history ratios
  * live under their own keys, and history aggregation is keyed on
  * config + statistic with real JSON parsing.
  */
class ClusterStatsSpec extends AnyFunSuite {

  private def res(thrLow: Double, thrHigh: Double, runLow: Double,
      runHigh: Double, events: Long = 1000000L) =
    ClusterScaling.Result(events, 2, 1, 4, thrLow, thrHigh, runLow, runHigh)

  test("per-sample JSON: strict run_efficiency + storm validity flag") {
    val r = res(100.0, 380.0, 100.0, 320.0)
    assert(math.abs(r.runEfficiency - 0.8) < 1e-9)
    assert(math.abs(r.bestBatchEfficiency - 0.95) < 1e-9)
    assert(r.valid)
    assert(r.json.contains(""""run_efficiency":0.800"""))
    assert(r.json.contains(""""valid":true"""))
    assert(r.json.contains(""""best_batch_efficiency":0.950"""))
    assert(r.json.contains(""""statistic":"best_batch""""))
    // a single sample never carries the headline key — that statistic is
    // aggregate-only (median of valid history)
    assert(!r.json.contains(""""efficiency":"""))

    // super-linear run-total ratio = storm-degraded low leg = invalid
    val storm = res(100.0, 380.0, 100.0, 433.2) // run_efficiency 1.083
    assert(!storm.valid)
    assert(storm.json.contains(""""valid":false"""))
  }

  test("headline = median of VALID history samples, clamped to 1.0") {
    val hist = java.nio.file.Files.createTempFile("graft-hist-med", ".jsonl").toString
    def headline(j: String) = ClusterScaling.headlineEfficiency(j)
    // valid samples 0.84, 0.90 -> median 0.87
    ClusterScaling.appendAndAggregate(res(100, 360, 100, 336), hist) // 0.84
    val j2 = ClusterScaling.appendAndAggregate(res(100, 360, 100, 360), hist) // 0.90
    assert(headline(j2).exists(h => math.abs(h - 0.87) < 1e-9))
    // a 1.083 storm sample is recorded + flagged but does NOT move the median
    val j3 = ClusterScaling.appendAndAggregate(res(100, 380, 100, 433.2), hist)
    assert(j3.contains(""""valid":false"""))
    assert(j3.contains(""""invalid_runs":1"""))
    assert(j3.contains(""""valid_runs":2"""))
    assert(headline(j3).exists(h => math.abs(h - 0.87) < 1e-9))
    // headline is clamped at 1.0 even if the valid median lands above it
    // (valid samples allow up to MaxPlausibleEfficiency = 1.02)
    val histHi = java.nio.file.Files.createTempFile("graft-hist-hi", ".jsonl").toString
    ClusterScaling.appendAndAggregate(res(100, 400, 100, 404), histHi) // 1.01 valid
    val jHi = ClusterScaling.appendAndAggregate(res(100, 400, 100, 406), histHi) // 1.015 valid
    assert(headline(jHi).contains(1.0))
  }

  test("legacy history lines without a valid flag classify by run_efficiency") {
    val hist = java.nio.file.Files.createTempFile("graft-hist-leg", ".jsonl").toString
    // hand-write a round-3-format line: no "valid" key, per-sample
    // "efficiency" key, run_efficiency 1.083 (the committed storm artifact)
    val legacyStorm = res(100, 380, 100, 433.2).json
      .replace(""""valid":false,""", """"efficiency":1.083,""")
    val legacyOk = res(100, 360, 100, 340).json // 0.85
      .replace(""""valid":true,""", """"efficiency":0.850,""")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(hist),
      legacyStorm + "\n" + legacyOk + "\n")
    val j = ClusterScaling.appendAndAggregate(res(100, 360, 100, 348), hist) // 0.87
    // 3 samples: legacy storm invalid, legacy 0.85 + new 0.87 valid
    assert(j.contains(""""runs":3""") && j.contains(""""valid_runs":2"""))
    assert(ClusterScaling.headlineEfficiency(j).exists(h => math.abs(h - 0.86) < 1e-9))
  }

  test("history aggregate: per-config best-of-history under its own key") {
    val hist = java.nio.file.Files.createTempFile("graft-hist", ".jsonl").toString
    val j1 = ClusterScaling.appendAndAggregate(res(100, 360, 90, 300), hist)
    assert(j1.contains(""""aggregate":{"runs":1"""))
    // a second, faster run raises the per-level bests
    val j2 = ClusterScaling.appendAndAggregate(res(120, 400, 110, 350), hist)
    assert(j2.contains(""""runs":2"""))
    assert(j2.contains(""""thr_low_best":120"""))
    assert(j2.contains(""""thr_high_best":400"""))
    assert(j2.contains(""""best_of_history_efficiency":0.833"""))
    assert(j2.contains(""""ts_ms_first""""))
    // a DIFFERENT config (events) and a corrupt line never mix in
    java.nio.file.Files.writeString(java.nio.file.Paths.get(hist),
      "{not json\n", java.nio.file.StandardOpenOption.APPEND)
    val j3 = ClusterScaling.appendAndAggregate(
      res(10, 40, 10, 40, events = 555L), hist)
    assert(j3.contains(""""runs":1""")) // only its own sample
    // rows with a different statistic value are excluded
    java.nio.file.Files.writeString(java.nio.file.Paths.get(hist),
      res(900, 3600, 900, 3600).json.replace(
        """"statistic":"best_batch"""", """"statistic":"run_total"""") + "\n",
      java.nio.file.StandardOpenOption.APPEND)
    val j4 = ClusterScaling.appendAndAggregate(res(100, 360, 90, 300), hist)
    assert(j4.contains(""""runs":3""") && !j4.contains(""""thr_low_best":900"""))
  }

  test("history IO failure degrades to the run's own JSON") {
    val r = res(100, 360, 90, 300)
    val out = ClusterScaling.appendAndAggregate(r,
      "/proc/definitely/not/writable/h.jsonl")
    assert(out === r.json)
    assert(ClusterScaling.headlineEfficiency(out).isEmpty)
  }
}
