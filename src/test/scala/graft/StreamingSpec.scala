package graft

import org.apache.spark.sql.functions._

import graft.plans.Icelite
import graft.sources.{Changelog, Gen}
import graft.streaming.Ingest

/** Streaming ingest: checkpointed exactly-once, kill-and-resume, late
  * segment arrival (SURVEY.md §5 items 3–4). */
class StreamingSpec extends SparkSpec {

  private def gen(n: Long, hot: Int = 0) =
    Gen.changelog(spark, Gen.GenConfig(events = n, convs = 40, maxTurns = 8,
      hotPct = hot))

  private def diffEmpty(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Boolean = {
    val cols = a.columns.sorted.map(col).toSeq
    val x = a.select(cols: _*); val y = b.select(cols: _*)
    x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty
  }

  test("streaming ingest over binlog equals declarative oracle") {
    val root = tmpDir("st1")
    val ch = gen(3000).cache()
    Changelog.writeBinlog(ch, s"$root/binlog", shards = 4, segSize = 500)
    val cfg = Ingest.Config(s"$root/t", s"$root/c", "w-st1", buckets = 4,
      maxFilesPerTrigger = 6)
    Ingest.runStream(spark, cfg, s"$root/binlog")
    val table = Icelite.load(spark, cfg.tablePath)
    assert(diffEmpty(table.read(), Gen.expectedFinalState(ch)))
    // lineage has per-shard offset ranges mapped to snapshot ids
    val lin = Ingest.lineage(spark, cfg)
    assert(lin.filter(col("shard") >= 0).count() > 0)
    assert(lin.select("snapshot_id").distinct().count() ===
      lin.select("batch_id").distinct().count())
  }

  test("kill-and-resume: second run picks up only the remaining segments") {
    val root = tmpDir("st2")
    val ch = gen(2000).cache()
    // stage 1: only first half of the WAL exists
    val early = ch.filter(col("seq") < 1000)
    Changelog.writeBinlog(early, s"$root/binlog", shards = 4, segSize = 250)
    val cfg = Ingest.Config(s"$root/t", s"$root/c", "w-st2", buckets = 4,
      maxFilesPerTrigger = 4)
    Ingest.runStream(spark, cfg, s"$root/binlog")
    val table = Icelite.load(spark, cfg.tablePath)
    val snapAfterHalf = table.snapshot().snapshotId
    assert(diffEmpty(table.read(), Gen.expectedFinalState(early)))
    // stage 2: rest of the WAL arrives; resumed stream applies only it
    Changelog.writeBinlog(ch.filter(col("seq") >= 1000), s"$root/binlog",
      shards = 4, segSize = 250)
    Ingest.runStream(spark, cfg, s"$root/binlog")
    assert(table.snapshot().snapshotId > snapAfterHalf)
    assert(diffEmpty(table.read(), Gen.expectedFinalState(ch)))
    // stage 3: re-run with nothing new — table state unchanged
    val snapDone = table.snapshot().snapshotId
    val rowsDone = table.read().count()
    Ingest.runStream(spark, cfg, s"$root/binlog")
    assert(table.read().count() === rowsDone)
    assert(diffEmpty(table.read(), Gen.expectedFinalState(ch)))
    assert(table.snapshot().snapshotId <= snapDone + 1) // at most an empty commit
  }

  test("skewed stream (hot conversations) converges to the same state") {
    val root = tmpDir("st3")
    val ch = gen(3000, hot = 40).cache()
    Changelog.writeBinlog(ch, s"$root/binlog", shards = 4, segSize = 750)
    val cfg = Ingest.Config(s"$root/t", s"$root/c", "w-st3", buckets = 4,
      opts = Icelite.Options(targetRowsPerTask = 100)) // force salting
    Ingest.runStream(spark, cfg, s"$root/binlog")
    val table = Icelite.load(spark, cfg.tablePath)
    assert(diffEmpty(table.read(), Gen.expectedFinalState(ch)))
    // the hot conversations really are hot (skew generator sanity)
    val top = ch.groupBy("conv_id").count().orderBy(col("count").desc)
      .limit(1).head().getLong(1)
    assert(top > 3000 / 40 * 3)
  }
}
