package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.model.Model
import graft.model.Model.ChangeEvent
import graft.operators.Lww
import graft.plans.Icelite
import graft.streaming.Ingest

/** Slice-0 spine + LWW edge cases: replay a changelog through the engine
  * and row-diff the final table against an in-memory oracle
  * (SURVEY.md §5 items 1–3).
  */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  private def ev(op: String, conv: String, turn: Int, text: String,
      eventSec: Long, seq: Long): ChangeEvent =
    ChangeEvent(op, conv, turn,
      if (op == "D") null else "user",
      if (op == "D") null else text,
      null,
      if (op == "D") null else ts(eventSec),
      ts(eventSec), seq)

  /** In-memory oracle: last event per key by (event_ts, seq); drop D. */
  private def oracle(events: Seq[ChangeEvent]): Set[(String, Int, String)] =
    events.groupBy(e => (e.conv_id, e.turn_idx))
      .map { case (_, es) => es.maxBy(e => (e.event_ts.getTime, e.seq)) }
      .filter(_.op != "D")
      .map(e => (e.conv_id, e.turn_idx, e.text)).toSet

  private def tableState(df: DataFrame): Set[(String, Int, String)] =
    df.select("conv_id", "turn_idx", "text").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet

  private val edgeEvents: Seq[ChangeEvent] = Seq(
    // plain insert then two updates
    ev("I", "c1", 0, "a", 1, 1), ev("U", "c1", 0, "b", 2, 2), ev("U", "c1", 0, "c", 3, 3),
    // insert then delete
    ev("I", "c1", 1, "x", 1, 4), ev("D", "c1", 1, null, 5, 5),
    // delete then re-insert
    ev("I", "c2", 0, "gone", 1, 6), ev("D", "c2", 0, null, 2, 7), ev("I", "c2", 0, "back", 3, 8),
    // update before insert (late arrival order in seq, but event_ts decides)
    ev("U", "c3", 0, "late-update", 9, 9), ev("I", "c3", 0, "early-insert", 1, 10),
    // event_ts tie broken by seq
    ev("I", "c4", 0, "tie-lo", 5, 11), ev("U", "c4", 0, "tie-hi", 5, 12),
    // delete wins a tie
    ev("I", "c5", 0, "t", 7, 13), ev("D", "c5", 0, null, 7, 14))

  test("LWW agg == window formulation, and matches oracle on edge cases") {
    val df = spark.createDataset(edgeEvents).toDF()
    val cols = df.columns.map(col).toSeq
    val a = Lww.latest(df, Model.keyCols, Seq("event_ts", "seq")).select(cols: _*)
    val b = Lww.latestByWindow(df, Model.keyCols, Seq("event_ts", "seq")).select(cols: _*)
    val c = Lww.latestSalted(df, Model.keyCols, Seq("event_ts", "seq"), 4).select(cols: _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.exceptAll(c).isEmpty && c.exceptAll(a).isEmpty)
    val live = a.filter($"op" =!= "D").select("conv_id", "turn_idx", "text")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(live === oracle(edgeEvents))
  }

  test("slice 0: multi-batch merge replay matches oracle row-for-row") {
    val root = tmpDir("t0")
    val cfg = Ingest.Config(s"$root/table", s"$root/ckpt", "w0", buckets = 4)
    val df = spark.createDataset(edgeEvents).toDF()
    // split into 3 batches by seq ranges (simulates WAL segments)
    val batches = Seq(df.filter($"seq" <= 5), df.filter($"seq" > 5 && $"seq" <= 10),
      df.filter($"seq" > 10))
    val stats = Ingest.replay(spark, cfg, batches)
    assert(stats.forall(!_.skipped))
    val table = Icelite.load(spark, cfg.tablePath)
    assert(tableState(table.read()) === oracle(edgeEvents))
    // deleted keys are tombstoned, not resurrected-able
    val raw = table.readRaw()
    assert(raw.filter($"_deleted").count() === 2) // (c1,1) and (c5,0)
  }

  test("idempotence: re-applying a batch (same writer+batchId) is a no-op") {
    val root = tmpDir("t1")
    val cfg = Ingest.Config(s"$root/table", s"$root/ckpt", "w0", buckets = 4)
    val df = spark.createDataset(edgeEvents).toDF()
    Ingest.replay(spark, cfg, Seq(df))
    val table = Icelite.load(spark, cfg.tablePath)
    val snapBefore = table.snapshot().snapshotId
    val replayStats = Ingest.applyBatch(spark, cfg, df, 0L) // same batchId
    assert(replayStats.skipped)
    assert(table.snapshot().snapshotId === snapBefore)
    assert(tableState(table.read()) === oracle(edgeEvents))
  }

  test("double-apply with a NEW batch id still converges (LWW is idempotent)") {
    val root = tmpDir("t2")
    val cfg = Ingest.Config(s"$root/table", s"$root/ckpt", "w0", buckets = 4)
    val df = spark.createDataset(edgeEvents).toDF()
    Ingest.replay(spark, cfg, Seq(df))
    Ingest.applyBatch(spark, cfg, df, 1L) // full re-apply under a new id
    val table = Icelite.load(spark, cfg.tablePath)
    assert(tableState(table.read()) === oracle(edgeEvents))
  }

  test("late event older than a delete does not resurrect the row") {
    val root = tmpDir("t3")
    val cfg = Ingest.Config(s"$root/table", s"$root/ckpt", "w0", buckets = 4)
    val batch1 = spark.createDataset(Seq(
      ev("I", "c9", 0, "v1", 1, 1), ev("D", "c9", 0, null, 10, 2))).toDF()
    val batch2 = spark.createDataset(Seq(
      ev("U", "c9", 0, "zombie", 5, 3))).toDF() // event_ts 5 < delete's 10
    Ingest.replay(spark, cfg, Seq(batch1, batch2))
    val table = Icelite.load(spark, cfg.tablePath)
    assert(table.read().filter($"conv_id" === "c9").count() === 0)
  }

  test("COW mode (compactThreshold=0) produces the same table") {
    val root = tmpDir("t4")
    val cfg = Ingest.Config(s"$root/table", s"$root/ckpt", "w0", buckets = 4,
      opts = Icelite.Options(compactThreshold = 0))
    val df = spark.createDataset(edgeEvents).toDF()
    val batches = Seq(df.filter($"seq" <= 7), df.filter($"seq" > 7))
    Ingest.replay(spark, cfg, batches)
    val table = Icelite.load(spark, cfg.tablePath)
    assert(tableState(table.read()) === oracle(edgeEvents))
    // COW leaves no delta files
    assert(table.snapshot().files.forall(_.kind == "base"))
  }

  test("lookup prunes to one bucket and finds the row") {
    val root = tmpDir("t5")
    val cfg = Ingest.Config(s"$root/table", s"$root/ckpt", "w0", buckets = 8)
    Ingest.replay(spark, cfg, Seq(spark.createDataset(edgeEvents).toDF()))
    val table = Icelite.load(spark, cfg.tablePath)
    val got = table.lookup("c1").orderBy("turn_idx").collect()
    assert(got.map(r => (r.getInt(1), r.getString(3))).toSeq === Seq((0, "c")))
  }

  test("data files carry a conv_id bloom filter; bloom-filtered lookup matches") {
    val root = tmpDir("t5b")
    // compactThreshold=0 (COW): blooms ride BASE files only — the delta
    // hot path skips them by design
    val cfg = Ingest.Config(s"$root/table", s"$root/ckpt", "w0", buckets = 2,
      opts = Icelite.Options(compactThreshold = 0))
    // high-cardinality keys: parquet only materializes a bloom once the
    // column overflows its dictionary page (a complete dictionary is
    // already an exact membership filter — bloom would be redundant), so
    // the fixture needs enough distinct conv_ids to force the fallback
    val many = spark.range(200000).select(
      lit("I").as("op"),
      concat(lit("conv-"), lpad($"id".cast("string"), 12, "0")).as("conv_id"),
      lit(0).as("turn_idx"), lit("user").as("role"),
      concat(lit("txt"), $"id").as("text"), lit(null).cast("string").as("tool"),
      lit(ts(0)).as("ts"), lit(ts(0)).as("event_ts"), $"id".as("seq"))
    Ingest.replay(spark, cfg, Seq(many))
    val table = Icelite.load(spark, cfg.tablePath)
    val snap = table.snapshot()
    // footer check: each data file's conv_id chunk carries a bloom filter
    // unless it stayed fully dictionary-encoded (exact pruning either way)
    val conf = new org.apache.hadoop.conf.Configuration()
    var withBloom = 0
    snap.files.foreach { f =>
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(s"${cfg.tablePath}/${f.path}"), conf))
      try {
        import scala.jdk.CollectionConverters._
        val rg = rdr.getFooter.getBlocks.get(0)
        val cc = rg.getColumns.asScala
          .find(_.getPath.toDotString == "conv_id").get
        val bloom = rdr.getBloomFilterDataReader(rg).readBloomFilter(cc)
        val dictOnly = !cc.getEncodingStats.hasNonDictionaryEncodedPages
        assert(bloom != null || dictOnly,
          s"no bloom filter AND no complete dictionary on conv_id in ${f.path}")
        if (bloom != null) withBloom += 1
      } finally rdr.close()
    }
    assert(withBloom > 0, "high-cardinality fixture produced no bloom filters")
    // behavior check: the equality predicate still returns the right rows
    // through the bloom-capable scan path
    val got = table.lookup("conv-000000012345").collect()
    assert(got.map(r => (r.getInt(1), r.getString(3))).toSeq === Seq((0, "txt12345")))
  }

  test("time travel: earlier snapshot readable after later merges") {
    val root = tmpDir("t6")
    val cfg = Ingest.Config(s"$root/table", s"$root/ckpt", "w0", buckets = 4)
    val df = spark.createDataset(edgeEvents).toDF()
    Ingest.replay(spark, cfg, Seq(df.filter($"seq" <= 5)))
    val table = Icelite.load(spark, cfg.tablePath)
    val snap1 = table.snapshot()
    Ingest.applyBatch(spark, cfg, df.filter($"seq" > 5), 1L)
    val then_ = table.readRaw(Some(snap1)).filter(!$"_deleted")
    assert(tableState(then_.toDF()) === oracle(edgeEvents.filter(_.seq <= 5)))
    assert(tableState(table.read()) === oracle(edgeEvents))
  }
}
