package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kafka record shaping — the fork-added kafkareader's parsing surface
  * (`kafkareader/.../KafkaReader.java:290-351`: parse the message value by
  * json / split / regex; `:371-387`: reorder columns by `writerOrder`;
  * synthetic columns `uuid`, `datax_time`, `data_from`).
  *
  * The consume loop itself maps to `spark.readStream.format("kafka")`
  * (at-least-once commitSync replaced by checkpoint + idempotent merge —
  * see [[graft.streaming.Ingest]]); what Spark does not provide is this
  * value-shaping contract, restated here as pure Catalyst projections over
  * any DataFrame with a string `value` column (streaming or batch — same
  * code, which is the point).
  */
object KafkaShape {

  /** Parse JSON values: one output column per (name, json path). Malformed
    * values yield nulls (route via [[graft.streaming.Ingest.dirtyCond]]-style
    * gates downstream — the reference writes them to an exception file). */
  def parseJson(df: DataFrame, valueCol: String,
      fields: Seq[(String, String)]): DataFrame =
    df.select(fields.map { case (name, path) =>
      get_json_object(col(valueCol), path).as(name)
    }: _*)

  /** Parse JSON values with a full schema in one pass (from_json — one
    * parse per row however many fields, unlike per-path extraction). */
  def parseJsonSchema(df: DataFrame, valueCol: String, schema: StructType): DataFrame =
    df.select(from_json(col(valueCol), schema).as("j")).select(col("j.*"))

  /** Split values on a delimiter into fixed positions (reference `split`
    * mode): column i = element i, null when missing. */
  def parseSplit(df: DataFrame, valueCol: String, delimiter: String,
      names: Seq[String]): DataFrame = {
    val parts = split(col(valueCol), java.util.regex.Pattern.quote(delimiter))
    df.select(names.zipWithIndex.map { case (n, i) =>
      // try_element_at: short rows yield null (ANSI element_at would throw)
      try_element_at(parts, lit(i + 1)).as(n)
    }: _*)
  }

  /** Regex-group extraction (reference `regex` mode): column i = capture
    * group i+1; non-matching rows yield empty strings per Spark's
    * regexp_extract contract. */
  def parseRegex(df: DataFrame, valueCol: String, pattern: String,
      names: Seq[String]): DataFrame =
    df.select(names.zipWithIndex.map { case (n, i) =>
      regexp_extract(col(valueCol), pattern, i + 1).as(n)
    }: _*)

  /** The reference's synthetic columns (`KafkaReader.java:318-338`):
    * `uuid` (random id), `datax_time` (ingest wall clock), `data_from`
    * (static source marker) — appended on demand. */
  def withSynthetic(df: DataFrame, dataFrom: String): DataFrame =
    df.withColumn("uuid", expr("uuid()"))
      .withColumn("datax_time", current_timestamp())
      .withColumn("data_from", lit(dataFrom))

  /** Reorder/project columns to the writer's expected order (reference
    * `writerOrder`, `KafkaReader.java:371-387`); missing names become
    * null columns rather than failing mid-stream. */
  def writerOrder(df: DataFrame, order: Seq[String]): DataFrame =
    df.select(order.map { n =>
      // typed null: an untyped NullType column is rejected by every
      // parquet/orc/csv writer downstream
      if (df.columns.contains(n)) col(n) else lit(null).cast("string").as(n)
    }: _*)

  /** Consume-side wiring of the CDC topic (S10): shape a Kafka-record
    * DataFrame (binary or string `value` column, as `readStream
    * .format("kafka")` yields it) into typed change events per
    * [[graft.model.Model.changeSchema]]. Shared by `IngestMain mode=kafka`
    * and the broker-less MemoryStream contract test — the same projection
    * either way, which is what makes the contract test evidence for the
    * CLI path. Modes mirror the reference's value formats
    * (`KafkaReader.java:290-351`): `split` (delimited fields, the
    * [[render]] inverse), `json` (one object per record), `regex`
    * (capture group i = column i). Empty strings — the render default
    * `nullFormat` and regexp_extract's non-match result — become typed
    * nulls; malformed records surface as null op/conv_id/seq and route to
    * the dirty gate downstream instead of failing the stream. */
  def changeEvents(df: DataFrame, mode: String = "split",
      delimiter: String = "\u0001", pattern: String = ""): DataFrame = {
    val schema = graft.model.Model.changeSchema
    val value = df.select(col("value").cast("string").as("value"))
    mode match {
      case "json" => parseJsonSchema(value, "value", schema)
      case m =>
        val names = schema.fieldNames.toSeq
        val strings = m match {
          case "split" => parseSplit(value, "value", delimiter, names)
          case "regex" =>
            require(pattern.nonEmpty, "kafkaParse=regex needs kafkaPattern=<re>")
            parseRegex(value, "value", pattern, names)
          case other => throw new IllegalArgumentException(
            s"kafkaParse=$other (expected json|split|regex)")
        }
        strings.select(schema.fields.toSeq.map { f =>
          nullif(col(f.name), lit("")).cast(f.dataType).as(f.name)
        }: _*)
    }
  }

  /** Kafka produce rendering — the fork-added kafkawriter's value contract
    * (`kafkawriter/.../KafkaWriter.java`: record fields joined by
    * `fieldDelimiter`): (key, value) string columns ready for
    * `df.writeStream.format("kafka")` where the connector jar exists.
    * `key` = the partition key (conv_id for change streams) so one topic
    * partition preserves per-key order — the property the CDC pipeline
    * depends on. Nulls render as `nullFormat` to keep field positions. */
  def render(df: DataFrame, keyCol: String, delimiter: String,
      cols: Seq[String], nullFormat: String = ""): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      concat_ws(delimiter, cols.map(c =>
        coalesce(col(c).cast("string"), lit(nullFormat))): _*).as("value"))
}
