package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ClusterScaling

/** Statistics/reporting contract of the cluster-scaling evidence (no
  * spark-submit here — that is exercised by ClusterScalingBench itself):
  * the headline `efficiency` is the strict run-total ratio, the optimistic
  * best-batch and best-of-history ratios live under their own keys, and
  * history aggregation is keyed on config + statistic with real JSON
  * parsing (round-2 ADVICE items on ClusterScaling.scala).
  */
class ClusterStatsSpec extends AnyFunSuite {

  private def res(thrLow: Double, thrHigh: Double, runLow: Double,
      runHigh: Double, events: Long = 1000000L) =
    ClusterScaling.Result(events, 2, 1, 4, thrLow, thrHigh, runLow, runHigh)

  test("headline efficiency is the strict run-total statistic") {
    val r = res(100.0, 380.0, 100.0, 320.0)
    assert(r.efficiency === r.runEfficiency)
    assert(math.abs(r.runEfficiency - 0.8) < 1e-9)
    assert(math.abs(r.bestBatchEfficiency - 0.95) < 1e-9)
    assert(r.json.contains(""""efficiency":0.800"""))
    assert(r.json.contains(""""best_batch_efficiency":0.950"""))
    assert(r.json.contains(""""statistic":"best_batch""""))
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
  }
}
