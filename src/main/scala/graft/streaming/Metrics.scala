package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-batch throughput/lag metrics — the reference's channel speed
  * reporting (`core/.../communication/CommunicationTool.java:16-50`,
  * report loop `TaskGroupContainer.java:253-266`: records/s, bytes/s,
  * wait times, merged task→taskGroup→job every 10 s) restated as a
  * `StreamingQueryListener` that mirrors every `QueryProgressEvent` to a
  * JSONL directory. Each file is the engine's own progress JSON —
  * inputRowsPerSecond, processedRowsPerSecond, per-source start/end
  * offsets, batch durations — i.e. strictly more than the reference's
  * counters, with zero code in the data path.
  *
  * Complements the `_lineage` table ([[Ingest.applyBatch]]): lineage maps
  * (batch, shard, seq-range) → snapshot id; this maps batch → rates.
  */
object Metrics {

  class ProgressSink(dir: String, queryName: String) extends StreamingQueryListener {
    graft.plans.Hfs.mkdirs(graft.plans.Hfs.path(dir))
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      if (e.progress.name == queryName)
        graft.plans.Hfs.write(
          graft.plans.Hfs.path(dir,
            f"progress-${e.progress.batchId}%09d-${e.progress.id}.json"),
          e.progress.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Load the mirrored progress events as a DataFrame (schema inferred
    * from the engine's progress JSON). */
  def read(spark: SparkSession, dir: String): DataFrame = spark.read.json(dir)

  /** Headline rates per batch: rows, rows/s in, rows/s processed. */
  def rates(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    read(spark, dir).select(
      col("batchId").as("batch_id"),
      col("numInputRows").as("rows"),
      col("inputRowsPerSecond").as("rows_per_sec_in"),
      col("processedRowsPerSecond").as("rows_per_sec_processed"),
      col("durationMs.triggerExecution").as("trigger_ms"))
  }
}
