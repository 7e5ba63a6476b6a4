package graft.tools

import java.nio.file.Files

import graft.Bench

/** Two-parallelism scaling evidence (north rule: ≥0.8 efficiency from N
  * to 4N executors; sandbox stand-in per BASELINE.md — same job, same
  * input, local[N] vs local[4N]).
  *
  * Writes the binlog once, then replays it through the full merge
  * pipeline at each parallelism in a fresh SparkSession, reporting
  * events/s and efficiency = (thr_4N / thr_N) / 4.
  *
  * Usage: runMain graft.tools.ScalingBench [events] [nLow] [nHigh]
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val events = if (args.length > 0) args(0).toLong else 10000000L
    val nLow = if (args.length > 1) args(1).toInt else 8
    val nHigh = if (args.length > 2) args(2).toInt else 32

    // produce the shared input once (parallelism of this phase irrelevant)
    val work = Files.createTempDirectory("graft-scaling").toString
    val s0 = Bench.session(nHigh)
    s0.sparkContext.setLogLevel("WARN")
    val binlog = Bench.writeBenchBinlog(s0, events, hotPct = 0, work)
    s0.stop()

    val thr = Seq(nLow, nHigh).map { cpus =>
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      val s = Bench.session(cpus)
      s.sparkContext.setLogLevel("WARN")
      val (secs, rows) = Bench.replayBinlog(s, binlog, s"$work/run-$cpus", cpus)
      s.stop()
      val t = events / secs
      println(f"[scaling] local[$cpus]: $secs%.1f s, $t%.0f events/s, final rows=$rows")
      cpus -> t
    }
    val eff = (thr(1)._2 / thr(0)._2) / (nHigh.toDouble / nLow)
    println(f"[scaling] efficiency local[$nLow]→local[$nHigh]: $eff%.3f " +
      f"(target ≥ ${0.8 * 1}%.1f scaled by core ratio ${nHigh / nLow})")
    println(f"""{"scaling":{"n_low":$nLow,"n_high":$nHigh,"events":$events,""" +
      f""""thr_low":${thr(0)._2}%.0f,"thr_high":${thr(1)._2}%.0f,"efficiency":$eff%.3f}}""")
  }
}
