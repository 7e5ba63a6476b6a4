package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal operators Spark lacks as built-ins: as-of join and
  * inactivity-gap sessionization.
  *
  * Both are implemented shuffle-minimally — ONE hash exchange on the
  * partition key, then sorted-within-partition window passes. Neither
  * materializes a range explosion or an all-pairs candidate set, so both
  * survive a 100× scale-up: the cost model is `shuffle(rows) +
  * sort-within-partition`, the same as any keyed aggregation. Skewed keys
  * fall under AQE skew handling like any other single-key shuffle.
  *
  * The reference engine has no temporal joins (nearest analogue: the
  * opentsdb reader's time-bucketed scan, `opentsdbreader/.../
  * TSDBReader.java`); these are the event/transcript-analytics extensions
  * a training-data pipeline needs (e.g. "attach the most recent retrieval
  * result to each model turn", "split a conversation into sessions").
  */
object Temporal {

  /** As-of join: attach to each left row the single most recent right row
    * with `right.timeCol <= left.timeCol` and equal `keyCols` (the
    * inclusive-past variant — DuckDB `ASOF JOIN ON l.t >= r.t`, kdb `aj`).
    * Left rows with no prior right row keep null value columns (left
    * outer semantics).
    *
    * Implementation: tag both sides, union, ONE window pass per key ordered
    * by (time, side) carrying the last non-null right-value struct forward
    * — right rows sort before left rows at equal timestamps, which is what
    * makes the join inclusive. No range join, no per-key collect; the plan
    * is a single exchange on `keyCols` + in-partition sort, so it scales
    * like a groupBy and beats the O(|L|·|R|) conditional-join Catalyst
    * would pick for a plain `l.t >= r.t` predicate by construction.
    *
    * Right rows must be unique per (keyCols, timeCol) — enforce upstream
    * with a deterministic rule (the spec and the oracle use max-id); with
    * duplicates the carried row would be order-dependent.
    *
    * @param valueCols right columns to attach, emitted as `prefix+name`
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      timeCol: String, valueCols: Seq[String], prefix: String = "asof_")
      : DataFrame = {
    val keys = keyCols.map(col)
    val rvType = StructType(valueCols.map(c => right.schema(c)))
    val lrowType = StructType(left.schema.fields)
    val l = left.select(keys :+ left(timeCol).as("__t") :+ lit(1).as("__side")
      :+ lit(null).cast(rvType).as("__rv")
      :+ struct(left.columns.toIndexedSeq.map(left(_)): _*).as("__lrow"): _*)
    val r = right.select(keys :+ right(timeCol).as("__t") :+ lit(0).as("__side")
      :+ struct(valueCols.map(right(_)): _*).as("__rv")
      :+ lit(null).cast(lrowType).as("__lrow"): _*)
    val w = Window.partitionBy(keys: _*).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__carried", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__lrow.*") +:
        valueCols.map(v => col(s"__carried.$v").as(s"$prefix$v")): _*)
  }

  /** Inactivity-gap sessionization: split each key's event sequence into
    * sessions wherever consecutive events are more than `gapMicros` apart
    * (strict >, microsecond-exact), numbering sessions 1..n per key in
    * time order. Adds `session_idx`. Ordering ties on `timeCol` break by
    * `tieCol` so the row→session assignment is total and deterministic.
    *
    * Two window passes (lag, then running sum) over the SAME
    * (partition, order) spec — one exchange, one sort; and because hash
    * partitioning on `keyCol` also satisfies any downstream
    * groupBy(keyCol, session_idx), per-session aggregation adds NO second
    * shuffle (pinned by PipelineOpsSpec's plan assertion).
    */
  def sessionize(df: DataFrame, keyCol: String, timeCol: String,
      tieCol: String, gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol), col(tieCol))
    // parquet sources may carry TIMESTAMP_NTZ; the cast is a pure
    // reinterpretation under the repo-wide session timeZone=UTC
    val t = unix_micros(col(timeCol).cast("timestamp"))
    val prev = lag(t, 1).over(w)
    val isNew = when(prev.isNull || t - prev > gapMicros, 1).otherwise(0)
    df.withColumn("__new", isNew)
      .withColumn("session_idx", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Per-session rollup over [[sessionize]] output: event count, first/last
    * timestamp, and an exact integer cents-sum of `valueCol` (doubles are
    * summed as `round(v*100)::long` so the total is associative and
    * engine-portable — a float sum's value depends on reduction order). */
  def sessionStats(sessions: DataFrame, keyCol: String, timeCol: String,
      valueCol: String): DataFrame =
    sessions.groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(timeCol)).as("start_ts"),
        max(col(timeCol)).as("end_ts"),
        sum(round(col(valueCol) * 100).cast("long")).as("value_cents"))

  /** Structured-Streaming counterpart of [[sessionize]]+[[sessionStats]]:
    * Spark's native `session_window` aggregation, so the same rollup runs
    * incrementally over an unbounded stream with watermark-driven state
    * eviction. Boundary nuance vs the batch operator: `session_window`
    * treats a gap of EXACTLY `gap` as a new session (window end exclusive)
    * where the batch split is strict-greater — equivalent for every
    * non-boundary input (pinned by PipelineOpsSpec).
    *
    * Scale: state is per (key, open session) and the watermark closes
    * sessions `watermark` behind the max event time — bounded memory on
    * an unbounded stream, shuffled once on the grouping key. */
  def sessionStatsStream(events: DataFrame, keyCol: String, timeCol: String,
      valueCol: String, gap: String, watermark: String): DataFrame =
    events.withWatermark(timeCol, watermark)
      .groupBy(col(keyCol), session_window(col(timeCol), gap))
      .agg(count(lit(1)).as("n_events"),
        // max event time, NOT session_window.end (that is last event + gap,
        // end-exclusive) — so end_ts means the same thing as in the batch
        // rollup above
        max(col(timeCol)).as("end_ts"),
        sum(round(col(valueCol) * 100).cast("long")).as("value_cents"))
      .select(col(keyCol), col("session_window.start").as("start_ts"),
        col("end_ts"), col("n_events"), col("value_cents"))
}
