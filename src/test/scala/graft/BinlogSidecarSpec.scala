package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Changelog

/** The binlog `_schema.json` sidecar: O(1) stream-start schema inference
  * (round-2 verdict item 1 — the footer-merge over every WAL segment sat
  * on the restart path, the documented schema-evolution mechanism).
  */
class BinlogSidecarSpec extends SparkSpec {
  import spark.implicits._

  private def ch(rows: Seq[(String, String, Int, String, Long)]) =
    rows.toDF("op", "conv_id", "turn_idx", "text", "seq")
      .withColumn("role", lit("user"))
      .withColumn("tool", lit(null).cast("string"))
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("seq")))
      .withColumn("event_ts", col("ts"))

  private def types(s: StructType): Map[String, DataType] =
    s.fields.map(f => f.name -> f.dataType).toMap

  private def footerMerged(dir: String): StructType =
    spark.read.option("mergeSchema", "true").parquet(dir).schema

  test("writeBinlog maintains the sidecar; inference matches footer merge") {
    val dir = s"${tmpDir("sidecar")}/binlog"
    Changelog.writeBinlog(ch(Seq(("I", "c1", 0, "a", 1L))), dir, 2, 10)
    assert(java.nio.file.Files.isRegularFile(Changelog.schemaSidecarPath(dir)))
    val inferred = Changelog.inferBinlogSchema(spark, dir)
    assert(types(inferred) === types(footerMerged(dir)))
    // partition columns stay last, like the footer-merged layout
    assert(inferred.fieldNames.takeRight(2).toSeq === Seq("shard", "seg"))
  }

  test("widened append widens the sidecar; stale fallback still works") {
    val dir = s"${tmpDir("sidecar-widen")}/binlog"
    Changelog.writeBinlog(ch(Seq(("I", "c1", 0, "a", 1L))), dir, 2, 10)
    Changelog.writeBinlog(
      ch(Seq(("I", "c2", 0, "b", 2L))).withColumn("lang", lit("en")), dir, 2, 10)
    val s = Changelog.inferBinlogSchema(spark, dir)
    assert(s("lang").dataType === StringType && s("lang").nullable)
    assert(s.fieldNames.takeRight(2).toSeq === Seq("shard", "seg"))
    assert(types(s) === types(footerMerged(dir)))
    // without the sidecar (foreign binlog) the footer-merge fallback is
    // the ground truth and still sees the evolved column
    java.nio.file.Files.delete(Changelog.schemaSidecarPath(dir))
    assert(types(Changelog.inferBinlogSchema(spark, dir))("lang") === StringType)
    // a corrupt sidecar self-heals via the same fallback
    java.nio.file.Files.writeString(Changelog.schemaSidecarPath(dir), "{nope")
    assert(types(Changelog.inferBinlogSchema(spark, dir))("lang") === StringType)
  }

  test("concurrent widenings compose (no last-writer-wins column loss)") {
    // two writers each widening with a DIFFERENT new column used to race
    // read-widen-move: both read the old sidecar and the last move won,
    // silently losing the other's column. The lock serializes them so the
    // second re-reads the first's result and the union survives.
    val dir = s"${tmpDir("sidecar-race")}/binlog"
    Changelog.writeSchemaSidecar(dir, StructType(Seq(
      StructField("conv_id", StringType), StructField("seq", LongType))))
    val cols = (0 until 8).map(i => s"extra_$i")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = cols.map { c =>
      new Thread(() =>
        try Changelog.writeSchemaSidecar(dir, StructType(Seq(
          StructField("conv_id", StringType), StructField(c, StringType))))
        catch { case t: Throwable => errs.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"widener threw: ${Option(errs.peek())}")
    val names = Changelog.readSchemaSidecar(dir).get.fieldNames.toSet
    cols.foreach(c => assert(names.contains(c), s"lost column $c"))
  }

  test("type widening merges; incompatible change throws; empty dir static") {
    val dir = s"${tmpDir("sidecar-types")}/binlog"
    Changelog.writeBinlog(ch(Seq(("I", "c1", 0, "a", 1L)))
      .withColumn("score", lit(1).cast("int")), dir, 2, 10)
    Changelog.writeBinlog(ch(Seq(("I", "c2", 0, "b", 2L)))
      .withColumn("score", lit(2L)), dir, 2, 10)
    assert(types(Changelog.inferBinlogSchema(spark, dir))("score") === LongType)
    intercept[IllegalArgumentException] {
      Changelog.writeSchemaSidecar(dir, StructType(Seq(
        StructField("score", StringType))))
    }
    // no data yet: static schema, no sidecar required
    assert(Changelog.inferBinlogSchema(spark, s"${tmpDir("sidecar-empty")}/nope")
      === Changelog.binlogSchema)
  }

  test("an explicit file: URI dir writes and reads the same sidecar as the plain path") {
    // regression: Paths.get("file:///x") treats the URI as a literal
    // relative path — the sidecar/lock would land in $CWD/file:/x while
    // the scheme-aware reader resolves the real /x, so the stream would
    // silently pay the footer merge forever
    val plain = s"${tmpDir("sidecar-uri")}/binlog"
    val asUri = s"file://$plain"
    Changelog.writeBinlog(ch(Seq(("I", "c1", 0, "a", 1L))), asUri, 2, 10)
    assert(java.nio.file.Files.isRegularFile(
      java.nio.file.Paths.get(plain, "_schema.json")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"file:$plain"))) // no $CWD/file:/... litter
    assert(Changelog.readSchemaSidecar(asUri).isDefined)
    assert(Changelog.readSchemaSidecar(plain).isDefined)
    assert(types(Changelog.inferBinlogSchema(spark, asUri))
      === types(footerMerged(plain)))
  }
}
