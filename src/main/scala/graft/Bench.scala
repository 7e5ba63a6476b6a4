package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Model
import graft.operators.{Ann, Dedup, Lww}
import graft.plans.Icelite
import graft.sources.{Changelog, Gen}
import graft.streaming.Ingest

/** Benchmark main — prints ONE JSON line.
  *
  * Headline: CDC apply throughput (change-events/s) of the full ingest
  * pipeline (binlog read → LWW dedup → salted bucketed merge → atomic
  * snapshot commit) on a seeded synthetic changelog
  * (`SPARK_GRAFT_BENCH_EVENTS`, default 10^7 — the local stand-in for
  * the 10^10 target), uniform and hot-key-skewed variants, plus
  * operator benches on the driver-provided sf dir.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_BENCH_EVENTS.
  */
object Bench {

  def session(cpus: Int): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .appName("graft-bench")
    .config("spark.sql.shuffle.partitions", cpus.toString)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
    .getOrCreate()

  /** Generate changelog, write binlog segments; returns binlog dir. */
  def writeBenchBinlog(spark: SparkSession, events: Long, hotPct: Int,
      work: String): String = {
    val binlog = s"$work/binlog"
    val ch = Gen.changelog(spark,
      Gen.GenConfig(events = events, convs = events / 50, hotPct = hotPct))
    Changelog.writeBinlog(ch, binlog, shards = 16,
      segSize = math.max(events / 8, 1L))
    binlog
  }

  /** Timed section of the headline: replay all binlog segments through
    * the exactly-once merge. Returns (seconds, finalRows). */
  def replayBinlog(spark: SparkSession, binlog: String, work: String,
      cpus: Int): (Double, Long) = {
    val cfg = Ingest.Config(s"$work/table", s"$work/ckpt", writerId = "bench",
      buckets = math.max(cpus * 2, 16))
    val all = Changelog.readBinlog(spark, binlog)
    val segs = all.select("seg").distinct().collect().map(_.getInt(0)).sorted
    val t0 = System.nanoTime()
    Ingest.replay(spark, cfg, segs.toSeq.map(sg => all.filter(col("seg") === sg)))
    val secs = (System.nanoTime() - t0) / 1e9
    val rows = Icelite.load(spark, cfg.tablePath).read().count()
    (secs, rows)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val events = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "10000000").toLong
    val spark = session(cpus)
    spark.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val extra = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      results(name) = (System.nanoTime() - t0) / 1e9; a
    }

    // ---- headline: CDC apply throughput, uniform + skewed -------------
    for ((tag, hot) <- Seq(("uniform", 0), ("skew", 30))) {
      val work = Files.createTempDirectory(s"graft-bench-$tag").toString
      val binlog = time(s"binlog_write_$tag") {
        writeBenchBinlog(spark, events, hot, work)
      }
      val (secs, rows) = replayBinlog(spark, binlog, work, cpus)
      results(s"cdc_apply_$tag") = secs
      extra(s"events_per_sec_$tag") = events / secs
      extra(s"final_rows_$tag") = rows.toDouble
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }

    // ---- operator benches on the sf dir -------------------------------
    def run(name: String)(df: => DataFrame): Unit =
      time(name) { df.write.mode("overwrite").format("noop").save() }

    run("lww_dedup_sf") {
      Lww.latest(Changelog.fromEvents(spark, sfDir), Model.keyCols, Seq("event_ts", "seq"))
    }
    run("dedup_minhash_sf") {
      Dedup.minHashLshPairs(spark.read.parquet(s"$sfDir/documents.parquet"),
        "doc_id", "text")
    }
    run("dedup_simhash_sf") {
      Dedup.simHash(spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
    }
    run("ann_topk_sf") {
      Ann.bruteForceTopK(spark.read.parquet(s"$sfDir/embeddings.parquet"),
        "vec_id", "embedding", 5)
    }
    run("ann_lsh_sf") {
      Ann.lshTopK(spark.read.parquet(s"$sfDir/embeddings.parquet"),
        "vec_id", "embedding", 5)
    }

    val total = results.values.sum
    def fmt(m: scala.collection.Map[String, Double]) =
      m.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec",""" +
      s""""queries":${fmt(results)},"throughput":${fmt(extra)},""" +
      s""""bench_events":$events,"cpus":$cpus,"sf":"$sfDir"}""")
    spark.stop()
  }
}
