package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Schema-evolution sentinel for long-running tails.
  *
  * A streaming query's source schema is FIXED at start, so a binlog
  * segment written with a NEW (or type-widened) column while the tail is
  * running loses those values until a restart — the documented
  * restart-to-widen contract ([[graft.sources.Changelog.binlogStream]]),
  * previously enforced only by a post-run warning. The sentinel makes the
  * contract self-enforcing: a daemon thread polls `probe` — an O(1) read
  * of the binlog's `_schema.json` sidecar
  * ([[graft.sources.Changelog.readSchemaSidecar]]), which [[graft.sources
  * .Changelog.writeBinlog]] widens BEFORE writing the data — and
  * gracefully stops the query the moment the probed schema is wider than
  * the running one, so the ingest loop ([[Ingest.runStream]]) restarts
  * the tail with the wider schema.
  *
  * The poll alone is NOT the correctness mechanism — at short trigger
  * intervals the next micro-batch can consume the widened segments narrow
  * before the poll fires, and once their offsets commit a restart never
  * re-reads them (observed in practice at 200 ms triggers). Correctness
  * comes from the per-batch guard ([[Ingest]] probes the sidecar at the
  * START of every foreachBatch and throws [[SchemaSentinel.SchemaWidened]]
  * when it widened): the batch fails BEFORE its offsets commit, so the
  * restart re-reads the same files with the wider schema. The sidecar is
  * written before the widened data files ([[graft.sources.Changelog
  * .writeBinlog]]'s ordering contract), so a batch that picked up a
  * widened file always probes a widened sidecar — no window. The polling
  * thread remains for promptness (stop an idle tail without waiting for
  * the next data trigger). Checkpointed offsets + the idempotent commit
  * gate make either stop/restart exactly-once, same as the [[Watchdog]]'s
  * failover stop (reference analogue: the job container reloading task
  * config on restart, `core/.../taskgroup/TaskGroupContainer.java:146-269`).
  *
  * A sidecar-less (foreign) binlog probes as None and the sentinel idles
  * — the post-run warning remains that case's contract.
  */
final class SchemaSentinel(q: StreamingQuery, runSchema: StructType,
    probe: () => Option[StructType], pollMs: Long = 250L)
    extends AutoCloseable {

  /** Columns the probed schema carries beyond the run's — non-empty once
    * the sentinel stopped the query for a restart. */
  @volatile var widened: Seq[String] = Nil
  @volatile private var closed = false

  private val t = new Thread(() => {
    while (!closed && widened.isEmpty && q.isActive) {
      val w = probe().map(SchemaSentinel.widerColumns(runSchema, _))
        .getOrElse(Nil)
      if (w.nonEmpty) {
        widened = w
        try q.stop()
        catch { case _: Throwable => () } // query already terminating
      } else Thread.sleep(pollMs)
    }
  }, s"graft-schema-sentinel-${q.name}")
  t.setDaemon(true)
  t.start()

  override def close(): Unit = { closed = true }
}

object SchemaSentinel {

  /** Thrown by the per-batch guard to fail a micro-batch BEFORE its
    * offsets commit when the sidecar widened — the restart then re-reads
    * the same files with the wider schema (nothing is lost; the failed
    * batch never merged, and [[graft.plans.IceliteTable.merge]]'s
    * (writerId, batchId) gate makes any replay idempotent anyway). */
  final class SchemaWidened(val widened: Seq[String]) extends RuntimeException(
    s"binlog schema widened mid-stream (${widened.mkString(", ")}); " +
      "failing the batch before its offsets commit so the restart " +
      "re-reads it with the wider schema")

  /** Names of columns `now` carries that `run` lacks, plus shared columns
    * whose type differs (the sidecar only ever widens —
    * [[graft.sources.Changelog.writeSchemaSidecar]] throws on an
    * incompatible change — so different means wider). */
  def widerColumns(run: StructType, now: StructType): Seq[String] =
    now.fields.toSeq.collect {
      case f if !run.fieldNames.contains(f.name) => f.name
      case f if run(f.name).dataType != f.dataType => f.name
    }
}
