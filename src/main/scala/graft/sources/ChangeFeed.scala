package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graft.StreamingBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.plans.Icelite

/** Outbound CDC: tail an icelite table's COMMITS as a Structured
  * Streaming source (the Delta change-data-feed / Iceberg incremental
  * read analogue, downstream-facing where [[Changelog.binlogStream]] is
  * upstream-facing). Offsets are snapshot ids — monotone, checkpointable,
  * and resolved against the PUBLISHED view, so a write-audit-publish
  * cycle holds the feed back with every other reader until it publishes.
  * Each micro-batch is `changesBetween(start, end)`: planned from the end
  * snapshot's own manifest with per-file seq-range pruning, so a trigger
  * reads O(new data), never O(table).
  *
  * {{{
  * spark.readStream.format(classOf[IceliteChangeFeed].getName)
  *   .option("root", tableRoot).load()   // payload + event_ts/seq/deleted
  * }}}
  *
  * V1 `Source` by design, not DSv2: `getBatch` returns a DataFrame, so
  * batches reuse the table's vectorized parquet scan, pushed filters, and
  * whole-stage codegen — a DSv2 `PartitionReader` would mean hand-rolling
  * a row-oriented parquet reader on executors (the `FileStreamSource` /
  * Delta `DeltaSource` precedent; the one internal seam it needs is
  * [[org.apache.spark.sql.graft.StreamingBridge]]).
  *
  * `Trigger.AvailableNow` runs as Spark's documented V1 fallback (single
  * batch of everything committed at query start, then stop) — exactly a
  * drain's semantics; long-running tails use `Trigger.ProcessingTime`.
  *
  * Contracts: net-effect at-least-once — a compaction inside a batch
  * range collapses superseded intermediate versions into their surviving
  * winners (every key's final state always flows). Schema is pinned at
  * query start; an evolution UNDER a running query fails it with a
  * restart instruction (the [[graft.streaming.SchemaSentinel]] pattern),
  * and the restarted query pins the widened schema, aligns replayed
  * pre-evolution ranges up to it, and resumes from its checkpoint. A `from` snapshot
  * already retired by `expireSnapshots` fails the query: re-seed with
  * `startingSnapshotId` or widen retention. A ROLLBACK below the feed's
  * seq watermark also fails the query with a re-seed instruction (the
  * re-applied batches reuse seq numbers the watermark covers — flowing
  * past it would silently skip them); a `wapAbort` of staged-only
  * commits is detected as safe and passes.
  */
class IceliteChangeFeed extends StreamSourceProvider with DataSourceRegister {
  import IceliteChangeFeed._

  override def shortName(): String = "icelite-feed"

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), publicSchema(
      Icelite.load(sqlContext.sparkSession, rootOf(parameters))))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new ChangeFeedSource(sqlContext, rootOf(parameters),
      parameters.get("startingSnapshotId").map(_.toLong).getOrElse(0L))
}

object IceliteChangeFeed {
  private[sources] def rootOf(parameters: Map[String, String]): String =
    parameters.get("root").orElse(parameters.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "option 'root' (icelite table root) is required"))

  /** The feed's public row shape: payload columns + the lineage triple
    * under its external names (the [[graft.plans.IceliteTable.changesSince]]
    * consumer convention — `event_ts`, `seq`, `deleted`). */
  private[sources] def publicSchema(table: graft.plans.IceliteTable): StructType = {
    import org.apache.spark.sql.types._
    // PUBLISHED schema, matching the view the batches resolve — a schema
    // evolution staged mid-WAP must not pin an unpublished shape
    val snap = table.publishedSnapshot()
    val full = org.apache.spark.sql.types.DataType
      .fromJson(snap.schemas(snap.currentSchemaId)).asInstanceOf[StructType]
    StructType(full.fields.filterNot(f => f.name.startsWith("_")).toSeq ++ Seq(
      StructField("event_ts", TimestampType, nullable = false),
      StructField("seq", LongType, nullable = false),
      StructField("deleted", BooleanType, nullable = false)))
  }

  private[sources] def rename(df: DataFrame): DataFrame = df
    .withColumnRenamed("_event_ts", "event_ts")
    .withColumnRenamed("_seq", "seq")
    .withColumnRenamed("_deleted", "deleted")
}

private class ChangeFeedSource(sql: SQLContext, root: String, startSid: Long)
    extends Source {
  import IceliteChangeFeed._

  private val table = Icelite.load(sql.sparkSession, root)

  /** Pinned at stream start — see the schema-evolution contract above. */
  override val schema: StructType = publicSchema(table)

  override def getOffset: Option[Offset] =
    Some(LongOffset(table.publishedSnapshot().snapshotId))

  private def sid(o: Offset): Long = o.json.trim.toLong

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromSid = start.map(sid).getOrElse(startSid)
    val toSid = sid(end)
    // rollback guard: a rollback whose target predates the feed's seq
    // watermark means the undone batches will be RE-APPLIED with seq
    // numbers the watermark already covers — changesBetween would filter
    // them and the downstream replica would silently keep stale data.
    // Fail with the re-seed instruction instead. A rollback at-or-above
    // the watermark (e.g. a wapAbort of commits this feed, reading the
    // published view, never saw) is safe and passes. Detection walks the
    // snapshot range (driver metadata, LRU-cached, O(commits/trigger));
    // rollback snapshots replicate their target's manifest, so the
    // target's watermark is read off the rollback snapshot itself.
    if (start.isDefined) {
      val fromMax = table.snapshotAt(fromSid).files
        .map(_.maxSeq).foldLeft(-1L)(math.max)
      ((fromSid + 1) to toSid).foreach { v =>
        scala.util.Try(table.snapshotAt(v)).toOption.foreach { sn =>
          val targetMax = sn.files.map(_.maxSeq).foldLeft(-1L)(math.max)
          if (sn.summary.get("op").contains("rollback") && targetMax < fromMax)
            throw new IllegalStateException(
              s"icelite-feed: table at $root was rolled back (snapshot $v" +
                s" -> ${sn.summary.getOrElse("rollback.to", "?")}) below this " +
                s"feed's seq watermark ($targetMax < $fromMax); re-applied " +
                "changes would be silently skipped. Re-seed the feed: fresh " +
                "checkpoint with startingSnapshotId at or before the " +
                "rollback target.")
        }
      }
    }
    val raw = rename(table.changesBetween(fromSid, toSid))
    // schema guard, direction-aware: a batch NARROWER than the pin is a
    // pre-evolution range (the engine replays the last committed batch
    // through getBatch on every restart — recovery, not evolution) and
    // aligns up (missing columns null, types upcast). A batch the pin
    // cannot express — a new column, a widened type — means the table
    // evolved UNDER a running query: fail with the restart instruction
    // (a restarted query pins the evolved schema and adopts it).
    val pinned = schema.fields.map(f => f.name -> f.dataType).toMap
    raw.schema.fields.foreach { f =>
      pinned.get(f.name) match {
        case Some(t) if f.dataType == t || Icelite.canWiden(f.dataType, t) => ()
        case what =>
          throw new IllegalStateException(
            s"icelite-feed: table schema evolved under the running query " +
              s"at $root (column ${f.name}: ${f.dataType.simpleString} vs " +
              s"pinned ${what.map(_.simpleString).getOrElse("<absent>")}); " +
              "restart the query to adopt it")
      }
    }
    StreamingBridge.asStreamingBatch(Icelite.align(raw, schema))
  }

  override def stop(): Unit = ()

  override def toString: String = s"IceliteChangeFeed[$root]"
}
