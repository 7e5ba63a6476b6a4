package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.Icelite
import graft.sources.Changelog
import graft.streaming.Ingest

/** End-to-end driver: derive the changelog from `<sfDir>/events.parquet`,
  * write binlog segments, stream them into an icelite table (checkpointed,
  * exactly-once), and print the final state summary + lineage.
  *
  * Usage: runMain graft.tools.ReplayDemo <sfDir> <workDir> [mode]
  * mode: stream (default) | batch
  * Re-running with the same workDir resumes from the checkpoint (no-op if
  * fully applied) — the resume/idempotence demo.
  */
object ReplayDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val work = args(1)
    val mode = if (args.length > 2) args(2) else "stream"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-replay-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val binlog = s"$work/binlog"
    val cfg = Ingest.Config(s"$work/table", s"$work/ckpt", writerId = "demo",
      buckets = 16, maxFilesPerTrigger = 8)

    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(binlog))) {
      val ch = Changelog.fromEvents(spark, sfDir)
      Changelog.writeBinlog(ch, binlog, shards = 8, segSize = 2048)
      println(s"[demo] wrote binlog segments to $binlog")
    } else println(s"[demo] reusing binlog at $binlog")

    val t0 = System.nanoTime()
    mode match {
      case "batch" =>
        val all = Changelog.readBinlog(spark, binlog)
        val segs = all.select("seg").distinct().collect().map(_.getInt(0)).sorted
        val stats = Ingest.replay(spark, cfg, segs.toSeq.map(s => all.filter(col("seg") === s)))
        stats.foreach(s => println(s"[demo] $s"))
      case _ =>
        Ingest.runStream(spark, cfg, binlog)
    }
    val secs = (System.nanoTime() - t0) / 1e9

    val table = Icelite.load(spark, cfg.tablePath)
    val snap = table.snapshot()
    val finalDf = table.read().orderBy("conv_id", "turn_idx").cache()
    val n = finalDf.count()
    println(f"[demo] applied in $secs%.1fs; snapshot=${snap.snapshotId} " +
      s"lastBatchId=${snap.lastBatchId} files=${snap.files.size} rows=$n")
    finalDf.show(5, truncate = false)
    // dump final state for external (DuckDB) comparison
    finalDf.coalesce(1).write.mode("overwrite").parquet(s"$work/final")
    println(s"[demo] final state parquet at $work/final")
    println("[demo] lineage (last 10):")
    Ingest.lineage(spark, cfg).orderBy(col("batch_id").desc, col("shard")).show(10)
    spark.stop()
  }
}
