package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Executable Kafka read/write pipelines (S10 consume loop / W11 produce),
  * capability-detected so the same code serves both worlds:
  *
  *  - on a real cluster (`spark-submit --packages
  *    org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>`) [[readStream]] /
  *    [[writeStream]] build the actual `format("kafka")` pipelines — the
  *    reference's consume loop (`kafkareader/.../KafkaReader.java:203-241`:
  *    poll → parse → send, commitSync per batch) maps to readStream +
  *    checkpointed offsets + idempotent merge, and its produce loop
  *    (`kafkawriter/.../KafkaWriter.java`) to writeStream over
  *    [[KafkaShape.render]] output;
  *  - offline (this sandbox — the connector ships as a separate artifact
  *    and never reaches the classpath) [[connectorAvailable]] is false and
  *    every executable entry point fails fast with the actionable fix
  *    instead of a bare provider-lookup error.
  *
  * The option assembly is pure data ([[SourceConfig.options]] /
  * [[SinkConfig.options]]) so the exact reader/writer wiring — subscribe,
  * startingOffsets, maxOffsetsPerTrigger, bootstrap servers — is
  * spec-assertable without a broker; the value shaping on top is
  * [[KafkaShape]], shared with the broker-less MemoryStream contract test.
  */
object KafkaIo {

  /** `readStream.format("kafka")` option set. `maxOffsetsPerTrigger` is the
    * streaming analogue of the reference's per-channel record throttle
    * (F6); `failOnDataLoss=false` mirrors its skip-and-log stance on
    * expired offsets (the dirty gate downstream owns data-quality). */
  final case class SourceConfig(
      brokers: String,
      topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = false,
      extra: Map[String, String] = Map.empty) {
    def options: Map[String, String] =
      Map(
        "kafka.bootstrap.servers" -> brokers,
        "subscribe" -> topic,
        "startingOffsets" -> startingOffsets,
        "failOnDataLoss" -> failOnDataLoss.toString) ++
        maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
        extra
  }

  /** `format("kafka")` sink option set: the topic rides as an option so the
    * frame needs only (key, value) — exactly [[KafkaShape.render]]'s shape. */
  final case class SinkConfig(
      brokers: String,
      topic: String,
      extra: Map[String, String] = Map.empty) {
    def options: Map[String, String] =
      Map("kafka.bootstrap.servers" -> brokers, "topic" -> topic) ++ extra
  }

  /** True when the spark-sql-kafka connector is on the classpath. Detected
    * by provider class, not by attempting a `load()` — cheap, side-effect
    * free, and usable as a spec `assume` for graceful offline skips. */
  def connectorAvailable: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider",
        false, getClass.getClassLoader)
      true
    } catch { case _: ClassNotFoundException => false }

  private def requireConnector(what: String): Unit =
    if (!connectorAvailable) throw new IllegalStateException(
      s"$what needs the Kafka connector jar on the classpath — run under " +
        "spark-submit --packages " +
        "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> " +
        "(it is not bundled with Spark and this environment is offline); " +
        "the parse/gate/merge chain itself is broker-independent and " +
        "covered by the MemoryStream contract test")

  /** The executable consume source: raw Kafka records as Spark yields them
    * (binary key/value + topic/partition/offset/timestamp columns). */
  def readStream(spark: SparkSession, cfg: SourceConfig): DataFrame = {
    requireConnector("KafkaIo.readStream")
    spark.readStream.format("kafka").options(cfg.options).load()
  }

  /** Consume + shape in one call: the CDC topic tail as typed change
    * events, ready for [[graft.streaming.Ingest.runStreamSource]]. */
  def changeStream(spark: SparkSession, cfg: SourceConfig,
      mode: String = "split", delimiter: String = "\u0001",
      pattern: String = ""): DataFrame =
    KafkaShape.changeEvents(readStream(spark, cfg), mode, delimiter, pattern)

  /** The executable produce sink for a streaming frame already in (key,
    * value) shape (see [[KafkaShape.render]]). Caller attaches trigger and
    * calls `.start()` — checkpointing makes the produce at-least-once,
    * which with key=conv_id partitioning preserves the per-conversation
    * order the CDC pipeline depends on. */
  def writeStream(df: DataFrame, cfg: SinkConfig,
      checkpointDir: String): DataStreamWriter[Row] = {
    requireConnector("KafkaIo.writeStream")
    df.writeStream.format("kafka").options(cfg.options)
      .option("checkpointLocation", checkpointDir)
  }

  /** Batch produce of a bounded (key, value) frame — the reference's
    * one-shot job shape (DataX runs Kafka writes as bounded jobs too). */
  def writeBatch(df: DataFrame, cfg: SinkConfig): Unit = {
    requireConnector("KafkaIo.writeBatch")
    df.write.format("kafka").options(cfg.options).save()
  }
}
