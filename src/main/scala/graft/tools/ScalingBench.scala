package graft.tools

import graft.Bench

/** Two-parallelism scaling evidence (north rule: ≥0.8 efficiency from N
  * to 4N executors; sandbox stand-in per BASELINE.md — same job, same
  * input, local[N] vs local[4N]).
  *
  * Method: write the binlog once (tmpfs — see [[Bench.workDir]]); for each
  * parallelism, start a fresh session, run an untimed warmup replay (JIT +
  * codegen classes are per-session), then the timed replay of the full
  * input through the complete merge pipeline. Efficiency =
  * (thr_high / thr_low) / (nHigh / nLow).
  *
  * Each level is replayed `reps` times and the best run is kept — the
  * sandbox VM shows intermittent multi-second CPU-steal stalls, and the
  * minimum wall time is the standard estimator for uncontended hardware.
  *
  * Usage: runMain graft.tools.ScalingBench [events] [nLow] [nHigh] [reps]
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val events = if (args.length > 0) args(0).toLong else 10000000L
    val nLow = if (args.length > 1) args(1).toInt else 8
    val nHigh = if (args.length > 2) args(2).toInt else 32
    val reps = if (args.length > 3) args(3).toInt else 3

    // produce the shared inputs once (parallelism of this phase irrelevant)
    val work = Bench.workDir("graft-scaling")
    val s0 = Bench.session(nHigh)
    s0.sparkContext.setLogLevel("WARN")
    val binlog = Bench.writeBenchBinlog(s0, events, hotPct = 0, work)
    val warmupBinlog = {
      val w = s"$work/warmup"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(w))
      val ch = graft.sources.Gen.changelog(s0,
        graft.sources.Gen.GenConfig(events = events / 10, convs = events / 500))
      graft.sources.Changelog.writeBinlog(ch, s"$w/binlog", shards = 16,
        segSize = math.max(events / 40, 1L))
      s"$w/binlog"
    }
    s0.stop()

    val thr = Seq(nLow, nHigh).map { cpus =>
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      val s = Bench.session(cpus)
      s.sparkContext.setLogLevel("WARN")
      Bench.replayBinlog(s, warmupBinlog, s"$work/warm-$cpus", cpus) // JIT warmup
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$work/warm-$cpus"))
      val runs = (1 to reps).map { r =>
        val res = Bench.replayBinlog(s, binlog, s"$work/run-$cpus-$r", cpus)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$work/run-$cpus-$r"))
        println(f"[scaling]   local[$cpus] rep $r: ${res.secs}%.1f s, rows=${res.rows}")
        res.secs
      }
      s.stop()
      val secs = runs.min
      val t = events / secs
      println(f"[scaling] local[$cpus]: best $secs%.1f s of ${runs.map(x => f"$x%.1f").mkString("/")} → $t%.0f events/s")
      cpus -> t
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    val eff = (thr(1)._2 / thr(0)._2) / (nHigh.toDouble / nLow)
    println(f"[scaling] efficiency local[$nLow]→local[$nHigh]: $eff%.3f (target ≥ 0.8)")
    println(f"""{"scaling":{"n_low":$nLow,"n_high":$nHigh,"events":$events,""" +
      f""""thr_low":${thr(0)._2}%.0f,"thr_high":${thr(1)._2}%.0f,"efficiency":$eff%.3f}}""")
  }
}
