package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.plans.Icelite
import graft.sources.Changelog
import graft.streaming.Ingest

/** One role of the two-process multi-writer race test: a real JVM that
  * ingests change batches into a shared icelite table (`role=ingest`) or
  * compacts it (`role=compact`), pacing itself on barrier files so the
  * orchestrating spec can force genuinely concurrent cross-process
  * commits.
  *
  * The in-JVM commit races (MaintenanceSpec, via the `beforeCommit` test
  * seam) pin the retry/rebase logic deterministically; this harness is
  * the missing evidence CLASS — two separate Spark drivers, two
  * [[graft.plans.CommitStore]] instances, no shared JVM state — hitting
  * the same table the way a production ingest writer and a maintenance
  * job would (reference analogue: independent DataX job processes sharing
  * one warehouse table). Orchestrated by MultiWriterRaceSpec; runnable by
  * hand with two `spark-submit`s against a real cluster.
  *
  * Protocol, per round i in [0, rounds):
  *   wait for  `<barriers>/go-<role>-<i>`      (created by the orchestrator)
  *   do work   (ingest: applyBatch of segment-chunk i; compact: compactAll)
  *   touch     `<barriers>/done-<role>-<i>`
  *
  * The orchestrator releases `go-ingest-<i>` and `go-compact-<i-1>`
  * together, so an ingest merge+commit and a compaction rewrite+commit
  * are in flight simultaneously every contended round; whichever loses
  * the atomic snapshot create rebases and retries. Exit code 0 = all
  * rounds committed (ingest also verifies its own batches' idempotence
  * gate advanced).
  */
object RaceHarness {

  private def waitFor(dir: String, name: String, timeoutMs: Long = 180000L): Unit = {
    val p = Paths.get(dir, name)
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!Files.exists(p)) {
      if (System.currentTimeMillis() > deadline)
        sys.error(s"barrier timeout waiting for $name")
      Thread.sleep(25)
    }
  }

  private def touch(dir: String, name: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), Array.emptyByteArray)
  }

  def main(args: Array[String]): Unit = {
    val kv = IngestMain.parse(args)
    val role = kv("role")
    val table = kv("table")
    val barriers = kv("barriers")
    val rounds = kv.getOrElse("rounds", "4").toInt
    val spark = SparkSession.builder()
      .appName(s"graft-race-$role")
      .master(kv.getOrElse("master", "local[4]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      role match {
        case "ingest" =>
          val cfg = Ingest.Config(table, kv("checkpoint"),
            writerId = "race-ingest", buckets = kv.getOrElse("buckets", "8").toInt,
            // the compactor owns compaction: keep ingest merge-on-read so
            // every round really appends delta files for it to fold
            opts = Icelite.Options(compactThreshold = Int.MaxValue))
          val all = Changelog.readBinlog(spark, kv("binlog")).cache()
          val segs = all.select("seg").distinct().collect().map(_.getInt(0)).sorted
          val chunks = segs.grouped(math.max(1, segs.length / rounds)).toSeq
            .take(rounds)
          val covered = chunks.flatten.toSet
          val rest = segs.filterNot(covered) // remainder rides the last round
          for (i <- 0 until rounds) {
            waitFor(barriers, s"go-ingest-$i")
            val mine = chunks.lift(i).map(_.toSeq).getOrElse(Nil) ++
              (if (i == rounds - 1) rest.toSeq else Nil)
            if (mine.nonEmpty)
              Ingest.applyBatch(spark, cfg,
                all.filter(col("seg").isin(mine.map(Integer.valueOf): _*)), i.toLong)
            touch(barriers, s"done-ingest-$i")
          }
          // the gate must have advanced to the last batch even if every
          // single commit lost its first race to the compactor — and a
          // compaction that wins AFTER us must preserve it (base.copy
          // keeps the winner's gate fields)
          val snap = Icelite.load(spark, table).snapshot()
          require(snap.writerId == "race-ingest" &&
            snap.lastBatchId == (rounds - 1).toLong,
            s"ingest gate wrong: writer=${snap.writerId} batch=${snap.lastBatchId}")
        case "compact" =>
          for (i <- 0 until rounds) {
            waitFor(barriers, s"go-compact-$i")
            val snapId = Icelite.load(spark, table)
              .compactAll(Icelite.Options(targetRowsPerTask = 100000L))
            touch(barriers, s"done-compact-$i")
            println(s"[race-compact] round $i committed snapshot $snapId")
          }
        case other => sys.error(s"role=$other (expected ingest|compact)")
      }
      println(s"[race-$role] all $rounds rounds done")
    } finally spark.stop()
  }
}
