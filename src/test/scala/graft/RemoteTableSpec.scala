package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.Icelite
import graft.sources.Changelog
import graft.streaming.Ingest

/** The object-store deployment shape, end to end: the icelite TABLE lives
  * on a non-local Hadoop scheme (`graftmem://`, the in-memory stand-in
  * for HDFS/OSS/S3 connectors) while the WAL and the streaming checkpoint
  * stay local — and every table operation (replay, idempotence gate,
  * time travel, bucket-pruned lookup, incremental scan, compaction,
  * snapshot expiry, lineage, roll-up) runs against the remote root.
  * Equality is pinned against the identical replay into a `file://` root,
  * whose own correctness EngineSpec pins against the oracle.
  */
class RemoteTableSpec extends SparkSpec {

  private def batches(dir: String): Seq[DataFrame] = {
    val ch = Changelog.fromEvents(spark, dir)
    // three deterministic micro-batches by seq range (seq = event_id;
    // sf0.001 carries event_ids 0-999)
    val cuts = Seq(0L, 300L, 700L, Long.MaxValue)
    cuts.sliding(2).map { case Seq(lo, hi) =>
      ch.filter(col("seq") >= lo && col("seq") < hi)
    }.toSeq
  }

  private def stateOf(df: DataFrame): Set[String] =
    df.selectExpr(
      "concat_ws('|', conv_id, turn_idx, coalesce(role,'~'), coalesce(text,'~'), " +
        "coalesce(tool,'~'), coalesce(cast(ts as string),'~'))")
      .collect().map(_.getString(0)).toSet

  test("replay into a graftmem:// table root equals the file:// replay") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftmem.impl", classOf[MemFs].getName)
    MemFs.clear()
    val sf = "/root/testdata/sf0.001"
    val local = tmpDir("remote-ref")
    val cfgL = Ingest.Config(s"$local/table", s"$local/ckpt", "w0", buckets = 4)
    val cfgR = Ingest.Config("graftmem://store/tbl", s"$local/ckpt-r", "w0",
      buckets = 4)
    val bs = batches(sf)
    Ingest.replay(spark, cfgL, bs)
    Ingest.replay(spark, cfgR, bs)

    val tL = Icelite.load(spark, cfgL.tablePath)
    val tR = Icelite.load(spark, cfgR.tablePath)
    assert(stateOf(tR.read()) === stateOf(tL.read()))
    assert(tR.read().count() === 270) // sf0.001 oracle final-row count

    // the table genuinely lives in the in-memory scheme: version files,
    // data parquet and lineage are all graftmem keys, and commits went
    // through the HadoopCommitStore (exclusive create on the scheme)
    val keys = {
      import scala.jdk.CollectionConverters._
      MemFs.files.keySet.asScala.toSet
    }
    assert(keys.exists(k => k.startsWith("/tbl/_icelite/v") && k.endsWith(".json")))
    assert(keys.exists(k => k.startsWith("/tbl/data/") && k.endsWith(".parquet")))
    assert(keys.exists(_.startsWith("/tbl/_lineage/")))

    // idempotence gate reads remote metadata: same (writer, batch) skips
    val again = Ingest.applyBatch(spark, cfgR, bs.last, bs.size - 1L)
    assert(again.skipped)

    // time travel + incremental scan over the remote root
    val history = tR.history()
    assert(history.size === bs.size + 1) // create + one commit per batch
    val atFirst = tR.readAt(history(1).snapshotId)
    assert(atFirst.count() > 0)
    // later batches updated/deleted rows, so the first snapshot's state
    // must differ from the final one
    assert(stateOf(atFirst) !== stateOf(tR.read()))
    val changes = tR.changesSince(history(1).snapshotId)
    assert(changes.count() > 0)

    // bucket-pruned point lookup against remote data files
    val anyKey = tR.read().select("conv_id").head().getString(0)
    assert(tR.lookup(anyKey).count() > 0)

    // lineage over the remote root: one row set per batch, then roll up
    val lin = Ingest.lineage(spark, cfgR)
    assert(lin.select("batch_id").distinct().count() === bs.size)
    assert(Ingest.rollupLineage(spark, cfgR) > 0)
    assert(Ingest.lineage(spark, cfgR).select("batch_id").distinct().count() === bs.size)

    // compaction + snapshot expiry (targeted GC) on the remote root
    tR.compactAll()
    val before = tR.read().count()
    val (expired, deletedFiles) = tR.expireSnapshots(keepLast = 1, orphanGraceMs = 0L)
    assert(expired > 0 && deletedFiles > 0)
    assert(tR.read().count() === before)
    assert(stateOf(tR.read()) === stateOf(tL.read()))
  }

  test("streaming ingest: remote binlog WAL -> remote table (checkpoint local)") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftmem.impl", classOf[MemFs].getName)
    MemFs.clear()
    val sf = "/root/testdata/sf0.001"
    val local = tmpDir("remote-stream")
    val wal = "graftmem://store/wal"

    // capture side: binlog segments + schema sidecar land on the scheme
    Changelog.writeBinlog(Changelog.fromEvents(spark, sf), wal,
      shards = 4, segSize = 250L)
    assert(Changelog.readSchemaSidecar(wal).isDefined)
    val keys = {
      import scala.jdk.CollectionConverters._
      MemFs.files.keySet.asScala.toSet
    }
    assert(keys.contains("/wal/_schema.json"))
    assert(keys.exists(k => k.startsWith("/wal/shard=") && k.endsWith(".parquet")))

    // ingest side: checkpointed stream tails the remote WAL into a
    // remote-rooted table; Spark's file-stream source lists the scheme
    val cfg = Ingest.Config("graftmem://store/tbl2", s"$local/ckpt", "ws",
      buckets = 4)
    Ingest.runStream(spark, cfg, wal)
    val t = Icelite.load(spark, cfg.tablePath)
    assert(t.read().count() === 270)

    // checkpoint resume over the same remote WAL is a no-op
    val snapBefore = t.snapshot().snapshotId
    Ingest.runStream(spark, cfg, wal)
    assert(t.snapshot().snapshotId === snapBefore)
  }
}
