package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.Icelite
import graft.streaming.Ingest

/** Schema evolution at merge time (north rule: add-column / type-widen;
  * the reference has none — writer errors on column-count mismatch,
  * `CommonRdbmsWriter.java:290-300`). */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  private def batch(rows: Seq[(String, String, Int, String, Long)]): DataFrame =
    rows.toDF("op", "conv_id", "turn_idx", "text", "seq")
      .withColumn("role", lit("user"))
      .withColumn("tool", lit(null).cast("string"))
      .withColumn("ts", lit(ts(0)))
      .withColumn("event_ts", timestamp_millis(lit(1700000000000L) + col("seq")))

  test("streaming restart picks up new-column segments and evolves the table") {
    val root = tmpDir("evo-stream")
    val binlog = s"$root/binlog"
    graft.sources.Changelog.writeBinlog(
      batch(Seq(("I", "c1", 0, "a", 1L), ("I", "c2", 0, "b", 2L))),
      binlog, shards = 2, segSize = 10)
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w-evo", buckets = 2)
    Ingest.runStream(spark, cfg, binlog)
    val t = Icelite.load(spark, cfg.tablePath)
    assert(!t.read().columns.contains("lang"))
    // new segments arrive carrying an extra payload column; the restarted
    // query infers the wider source schema and the merge evolves the table
    graft.sources.Changelog.writeBinlog(
      batch(Seq(("I", "c3", 0, "c", 21L), ("U", "c1", 0, "a2", 22L)))
        .withColumn("lang", lit("en")),
      binlog, shards = 2, segSize = 10)
    Ingest.runStream(spark, cfg, binlog)
    val rows = t.read().select("conv_id", "turn_idx", "text", "lang")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSet
    assert(rows === Set(("c1", 0, "a2", "en"), ("c2", 0, "b", null),
      ("c3", 0, "c", "en")))
  }

  test("schema sentinel: a continuous tail picks up a column added mid-run") {
    val root = tmpDir("evo-sentinel")
    val binlog = s"$root/binlog"
    graft.sources.Changelog.writeBinlog(
      batch(Seq(("I", "c1", 0, "a", 1L), ("I", "c2", 0, "b", 2L))),
      binlog, shards = 2, segSize = 10)
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w-sentinel", buckets = 2)
    val qName = s"graft-ingest-${cfg.writerId}"
    // once the tail has drained phase 1, append segments carrying a NEW
    // column mid-run (sidecar widens first — writeBinlog's contract), then
    // poll the table until the restarted leg landed the new values and
    // stop the still-running tail so the test doesn't ride out stopAfterMs
    @volatile var sawLang = false
    val writer = new Thread(() => {
      while (!Icelite.exists(cfg.tablePath) ||
          scala.util.Try(Icelite.load(spark, cfg.tablePath).read().count()).getOrElse(0L) < 2L)
        Thread.sleep(100)
      graft.sources.Changelog.writeBinlog(
        batch(Seq(("I", "c3", 0, "c", 21L), ("U", "c1", 0, "a2", 22L)))
          .withColumn("lang", lit("en")),
        binlog, shards = 2, segSize = 10)
      while (!sawLang) {
        sawLang = scala.util.Try {
          val t = Icelite.load(spark, cfg.tablePath)
          t.currentSchema().fieldNames.contains("lang") &&
            t.read().filter(col("lang") === "en").count() === 2L
        }.getOrElse(false)
        if (!sawLang) Thread.sleep(150)
      }
      spark.streams.active.filter(_.name == qName).foreach(_.stop())
    })
    writer.start()
    // ONE runStream call: the sentinel must stop + restart internally —
    // no manual second run (contrast the restart test above)
    Ingest.runStream(spark, cfg, binlog,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(200L),
      stopAfterMs = Some(90000L)) // safety net; the writer stops it early
    writer.join(10000)
    assert(sawLang, "sentinel never restarted the tail with the wider schema")
    val rows = Icelite.load(spark, cfg.tablePath).read()
      .select("conv_id", "turn_idx", "text", "lang")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSet
    assert(rows === Set(("c1", 0, "a2", "en"), ("c2", 0, "b", null),
      ("c3", 0, "c", "en")))
  }

  test("SchemaSentinel.widerColumns flags new columns and widened types") {
    import graft.streaming.SchemaSentinel.widerColumns
    val run = StructType(Seq(StructField("a", IntegerType),
      StructField("b", StringType)))
    assert(widerColumns(run, run) === Nil)
    assert(widerColumns(run, StructType(run.fields :+
      StructField("c", StringType))) === Seq("c"))
    assert(widerColumns(run, StructType(Seq(StructField("a", LongType),
      StructField("b", StringType)))) === Seq("a"))
  }

  test("add-column: later batch introduces a new nullable payload column") {
    val root = tmpDir("evo1")
    val cfg = Ingest.Config(s"$root/t", s"$root/c", "w0", buckets = 4)
    Ingest.applyBatch(spark, cfg,
      batch(Seq(("I", "c1", 0, "v1", 1L))), 0L)
    // batch 2 carries an extra column `score`
    Ingest.applyBatch(spark, cfg,
      batch(Seq(("I", "c2", 0, "v2", 2L))).withColumn("score", lit(7)), 1L)
    val table = Icelite.load(spark, cfg.tablePath)
    val schema = table.currentSchema()
    assert(schema.fieldNames.contains("score"))
    val rows = table.read().orderBy("conv_id").collect()
    assert(rows.length === 2)
    val byConv = rows.map(r => r.getString(0) -> r).toMap
    assert(byConv("c1").isNullAt(byConv("c1").fieldIndex("score"))) // backfilled null
    assert(byConv("c2").getInt(byConv("c2").fieldIndex("score")) === 7)
  }

  test("type widen: int payload column widens to long; old rows upcast") {
    val root = tmpDir("evo2")
    val cfg = Ingest.Config(s"$root/t", s"$root/c", "w0", buckets = 4)
    Ingest.applyBatch(spark, cfg,
      batch(Seq(("I", "c1", 0, "v1", 1L))).withColumn("score", lit(7)), 0L)
    Ingest.applyBatch(spark, cfg,
      batch(Seq(("I", "c2", 0, "v2", 2L)))
        .withColumn("score", lit(9000000000L)), 1L)
    val table = Icelite.load(spark, cfg.tablePath)
    assert(table.currentSchema()("score").dataType === LongType)
    val m = table.read().collect()
      .map(r => r.getString(r.fieldIndex("conv_id")) ->
        r.getLong(r.fieldIndex("score"))).toMap
    assert(m === Map("c1" -> 7L, "c2" -> 9000000000L))
  }

  test("narrowing and incompatible changes are rejected") {
    assert(!Icelite.canWiden(LongType, IntegerType))
    assert(!Icelite.canWiden(DoubleType, FloatType))
    assert(!Icelite.canWiden(StringType, LongType))
    assert(Icelite.canWiden(IntegerType, LongType))
    assert(Icelite.canWiden(FloatType, DoubleType))
    val root = tmpDir("evo3")
    val cfg = Ingest.Config(s"$root/t", s"$root/c", "w0", buckets = 4)
    Ingest.applyBatch(spark, cfg,
      batch(Seq(("I", "c1", 0, "v1", 1L))).withColumn("score", lit(1L)), 0L)
    val ex = intercept[IllegalArgumentException] {
      Ingest.applyBatch(spark, cfg,
        batch(Seq(("I", "c2", 0, "v2", 2L))).withColumn("score", lit("oops")), 1L)
    }
    assert(ex.getMessage.contains("score"))
  }

  test("time travel across a schema change reads each snapshot's schema") {
    val root = tmpDir("evo4")
    val cfg = Ingest.Config(s"$root/t", s"$root/c", "w0", buckets = 4)
    Ingest.applyBatch(spark, cfg, batch(Seq(("I", "c1", 0, "v1", 1L))), 0L)
    val table = Icelite.load(spark, cfg.tablePath)
    val snap1 = table.snapshot()
    Ingest.applyBatch(spark, cfg,
      batch(Seq(("U", "c1", 0, "v2", 2L))).withColumn("score", lit(1)), 1L)
    // old snapshot: no score column, old text
    val old = table.readRaw(Some(snap1))
    assert(!old.columns.contains("score"))
    assert(old.select("text").head().getString(0) === "v1")
    // new snapshot: evolved schema, LWW winner
    val cur = table.read()
    assert(cur.columns.contains("score"))
    assert(cur.select("text").head().getString(0) === "v2")
  }
}
