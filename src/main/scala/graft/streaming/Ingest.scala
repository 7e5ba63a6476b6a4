package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.Model
import graft.plans.{Icelite, IceliteTable}
import graft.sources.Changelog

/** The ingest job: binlog → LWW → merge, batch-replay or streaming.
  *
  * Spark-first restatement of the reference's job container
  * (`core/.../job/JobContainer.java:96-182`: init → split → schedule →
  * run → stats): the micro-batch is the unit of work, the checkpoint dir
  * is the offset WAL (≈ `ShardCheckpoint`,
  * `otsstreamreader/.../model/ShardCheckpoint.java:8-53`), and per-batch
  * lineage rows replace the Communication counters
  * (`core/.../communication/CommunicationTool.java:16-50`).
  *
  * Exactly-once = checkpointed offsets × idempotent snapshot commit keyed
  * by (writerId, batchId): a replayed micro-batch is a metadata no-op.
  */
object Ingest {

  case class Config(
      tablePath: String,
      checkpointDir: String,
      writerId: String,
      buckets: Int = 32,
      opts: Icelite.Options = Icelite.Options(),
      maxFilesPerTrigger: Int = 8,
      /** route malformed change rows here instead of failing the batch —
        * the reference's dirty-record collector (F8, `core/.../statistics/
        * plugin/task/StdoutPluginCollector.java:21-60`). None = gate off. */
      deadLetterDir: Option[String] = None,
      /** fail the batch if dirty/total exceeds this ratio — the error-limit
        * gate (F9, `core/.../util/ErrorRecordChecker.java:18-81`). */
      errorPctLimit: Double = 1.0,
      /** mirror per-batch StreamingQueryProgress JSON here (metrics). */
      metricsDir: Option[String] = None)

  class ErrorLimitExceeded(val dirty: Long, val total: Long, limit: Double)
    extends RuntimeException(
      f"dirty records $dirty/$total = ${dirty.toDouble / total}%.4f over limit $limit%.4f")

  /** A change row the merge cannot key or order — dirty by the same
    * definition the reference uses (unparseable / missing required fields,
    * `TransformerExchanger.java:110-120`). */
  def dirtyCond: org.apache.spark.sql.Column =
    col("op").isNull || !col("op").isin("I", "U", "D") ||
      col("conv_id").isNull || col("turn_idx").isNull ||
      col("event_ts").isNull || col("seq").isNull

  /** Columns of the batch that are not part of the change event. */
  private val sourceMeta = Seq("shard", "seg")

  /** Ensure the table exists (payload schema = batch payload). */
  def ensureTable(spark: SparkSession, cfg: Config, batch: DataFrame): IceliteTable =
    if (Icelite.exists(cfg.tablePath)) Icelite.load(spark, cfg.tablePath)
    else {
      val payload = org.apache.spark.sql.types.StructType(
        batch.schema.fields.filterNot(f =>
          Seq("op", "event_ts", "seq").contains(f.name) || sourceMeta.contains(f.name)))
      Icelite.create(spark, cfg.tablePath, payload, cfg.buckets)
    }

  /** Apply one change batch: merge + per-shard lineage row.
    * Lineage satisfies the north rule's "per-partition lineage (source
    * offset range → snapshot id)": one row per source shard per batch with
    * its seq range, plus rows/s — the reference's per-channel speed report
    * (`TaskGroupContainer.java:253-266`) as a queryable table.
    */
  def applyBatch(spark: SparkSession, cfg: Config, batchIn: DataFrame, batchId: Long): Icelite.MergeStats = {
    // Cache the micro-batch once: the gate, the shard-stats aggregate and
    // the merge each run an action over it — without this every action
    // re-scans the source files (at 10^10 events, 2-3× the input IO).
    val src = batchIn.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // dirty-record gate: split off malformed rows BEFORE the merge; one
      // counting aggregate only when the gate is configured (hot path free)
      val batch = cfg.deadLetterDir match {
        case None => src
        case Some(dl) =>
          val flagged = src.withColumn("_dirty", dirtyCond)
          val Array(total, dirty) = flagged.agg(
            count(lit(1)), count_if(col("_dirty"))).head().toSeq
            .map(v => v.asInstanceOf[Long]).toArray
          if (dirty > 0) {
            flagged.filter(col("_dirty")).drop("_dirty")
              .withColumn("_batch_id", lit(batchId))
              .write.mode("append").parquet(dl)
            if (total > 0 && dirty.toDouble / total > cfg.errorPctLimit)
              throw new ErrorLimitExceeded(dirty, total, cfg.errorPctLimit)
          }
          flagged.filter(!col("_dirty")).drop("_dirty")
      }
      val table = ensureTable(spark, cfg, batch)
      val hasShard = batch.columns.contains("shard")
      // per-shard offset ranges (cheap partial agg) BEFORE dropping source meta
      val shardStats =
        if (hasShard)
          batch.groupBy(col("shard")).agg(
            count(lit(1)).as("rows"),
            min(col("seq")).as("start_seq"),
            max(col("seq")).as("end_seq")).collect()
        else Array.empty[org.apache.spark.sql.Row]
      val stats = table.merge(batch.drop(sourceMeta: _*), batchId, cfg.writerId, cfg.opts)
      if (!stats.skipped) {
        import spark.implicits._
        val rows =
          if (shardStats.nonEmpty)
            shardStats.toSeq.map(r => LineageRow(batchId, r.getInt(0), r.getLong(1),
              r.getLong(2), r.getLong(3), stats.snapshotId, stats.wallMs))
          else Seq(LineageRow(batchId, -1, stats.inputRows, -1L, -1L,
            stats.snapshotId, stats.wallMs))
        spark.createDataset(rows).write.mode("append")
          .parquet(s"${cfg.tablePath}/_lineage")
      }
      stats
    } finally src.unpersist()
  }

  case class LineageRow(batch_id: Long, shard: Int, rows: Long,
      start_seq: Long, end_seq: Long, snapshot_id: Long, wall_ms: Long)

  /** Read the lineage/metrics table. */
  def lineage(spark: SparkSession, cfg: Config): DataFrame =
    spark.read.parquet(s"${cfg.tablePath}/_lineage")

  /** Batch-mode replay: apply pre-split batches sequentially. */
  def replay(spark: SparkSession, cfg: Config, batches: Seq[DataFrame]): Seq[Icelite.MergeStats] =
    batches.zipWithIndex.map { case (b, i) => applyBatch(spark, cfg, b, i.toLong) }

  /** Streaming ingest over a binlog dir; Trigger.AvailableNow drains what
    * exists then stops (used by tests/verify); pass `continuous = true`
    * semantics by re-running — checkpoint makes it resumable/exactly-once.
    */
  def runStream(spark: SparkSession, cfg: Config, binlogDir: String): Unit = {
    val name = s"graft-ingest-${cfg.writerId}"
    val sink = cfg.metricsDir.map { d =>
      val s = new Metrics.ProgressSink(d, name)
      spark.streams.addListener(s); s
    }
    try {
      val src = Changelog.binlogStream(spark, binlogDir, cfg.maxFilesPerTrigger)
      val q = src.writeStream
        .queryName(name)
        .option("checkpointLocation", cfg.checkpointDir)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, id: Long) =>
          applyBatch(spark, cfg, df, id); ()
        }
        .start()
      q.awaitTermination()
    } finally sink.foreach(spark.streams.removeListener)
  }
}
