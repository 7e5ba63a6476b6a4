package graft.tools

import graft.Bench
import graft.plans.Icelite
import graft.streaming.Ingest

/** Streaming-mode throughput benchmark: checkpointed `runStream`
  * (Trigger.AvailableNow draining a pre-written WAL in
  * `maxFilesPerTrigger`-file micro-batches) over the same synthetic
  * changelog the batch bench uses — the apples-to-apples number for
  * "what does exactly-once streaming machinery cost over batch replay".
  *
  * Cold run includes codegen/JIT; the warm run (same JVM, fresh
  * table + checkpoint) is the steady-state figure. Per-batch wall times
  * come from the engine's own lineage table, so no metrics listener is
  * attached (progress metrics force batch caching — see
  * `Ingest.Config.cacheBatch`).
  *
  * Usage: runMain graft.tools.StreamBench [events] [cpus] [filesPerTrigger]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val events = if (args.length > 0) args(0).toLong else 10000000L
    val cpus = if (args.length > 1) args(1).toInt else 32
    val filesPerTrigger = if (args.length > 2) args(2).toInt else 64
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val work = Bench.workDir("graft-streambench")
    val binlog = Bench.writeBenchBinlog(spark, events, 0, work)
    def cfgFor(tag: String) = Ingest.Config(s"$work/$tag/t", s"$work/$tag/ck",
      writerId = tag, buckets = 64,
      opts = Icelite.Options(alignedDeltaWrite = true),
      maxFilesPerTrigger = filesPerTrigger)
    for (tag <- Seq("cold", "warm")) {
      val cfg = cfgFor(tag)
      val t0 = System.nanoTime()
      Ingest.runStream(spark, cfg, binlog)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[stream] $tag: $events events in $secs%.1f s = ${events / secs}%.0f ev/s")
      val lin = Ingest.lineage(spark, cfg)
      val perBatch = lin.groupBy("batch_id")
        .agg(org.apache.spark.sql.functions.sum("rows").as("rows"),
          org.apache.spark.sql.functions.max("wall_ms").as("wall_ms"))
        .orderBy("batch_id").collect()
      perBatch.foreach(r => println(
        f"[stream]   batch ${r.getLong(0)}: ${r.getLong(1)} rows in ${r.getLong(2)} ms" +
          f" = ${r.getLong(1) * 1000.0 / math.max(r.getLong(2), 1)}%.0f ev/s"))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    spark.stop()
  }
}
