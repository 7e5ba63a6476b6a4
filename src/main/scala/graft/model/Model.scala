package graft.model

import org.apache.spark.sql.types._

/** Core data model of the CDC/ingest engine.
  *
  * Mirrors the reference's row-level change semantics (n-kong/Datax,
  * otsstreamreader PUT/UPDATE/DELETE: `MultiVerModeRecordSender.java:41-65`)
  * but as a fixed Catalyst schema instead of the reference's schemaless
  * positional `Record` (`common/.../element/Record.java:7-23`).
  *
  * Target table primary key: (conv_id, turn_idx).
  * LWW ordering: (event_ts, seq) — seq is the global tiebreak, like the
  * reference's shard `seq_id` (`MultiVerModeRecordSender.java:135-141`).
  */
object Model {

  /** A row-level change event (the binlog/WAL record). op ∈ {I, U, D}. */
  case class ChangeEvent(
      op: String,
      conv_id: String,
      turn_idx: Int,
      role: String,
      text: String,
      tool: String,
      ts: java.sql.Timestamp,
      event_ts: java.sql.Timestamp,
      seq: Long)

  /** A materialized turn (the public target-table row). */
  case class Turn(
      conv_id: String,
      turn_idx: Int,
      role: String,
      text: String,
      tool: String,
      ts: java.sql.Timestamp)

  /** Public (user-facing) columns of the target table, in stable order. */
  val publicCols: Seq[String] =
    Seq("conv_id", "turn_idx", "role", "text", "tool", "ts")

  /** Primary-key columns. */
  val keyCols: Seq[String] = Seq("conv_id", "turn_idx")

  /** Lineage columns the engine maintains inside table data files.
    * `_deleted` rows are tombstones kept so that late (out-of-order)
    * events older than a delete cannot resurrect a row — the
    * exactly-once-under-reorder guard (SURVEY.md §7.3).
    */
  val lineageCols: Seq[String] = Seq("_event_ts", "_seq", "_deleted")

  val changeSchema: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("tool", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("event_ts", TimestampType, nullable = false),
    StructField("seq", LongType, nullable = false)))

  /** Schema of table data files = public payload + lineage. */
  val tableSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("tool", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("_event_ts", TimestampType, nullable = false),
    StructField("_seq", LongType, nullable = false),
    StructField("_deleted", BooleanType, nullable = false)))
}
