package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.Model.ChangeEvent

/** Stateful streaming LWW — the alternative materialization to the
  * merge-on-read table path ([[Ingest]]): per-key winners live in the
  * Spark state store and every state improvement is emitted downstream as
  * a net change. Use when consumers want a *change stream of winners*
  * (e.g. cache invalidation, search-index feed) rather than a table.
  *
  * Semantics match [[graft.operators.Lww.latest]]: per (conv_id,
  * turn_idx) the row with the greatest (event_ts, seq) wins; deletes are
  * events like any other (downstream sees the tombstone win and can drop
  * the key). Late events older than the current winner are absorbed
  * silently — exactly the merge guard of the table path (SURVEY.md §7.3).
  *
  * State is bounded by the event-time watermark: a key's entry is freed
  * `stateTtl` after its last update passes the watermark — the engine's
  * answer to the reference's unbounded per-shard memory
  * (`otsstreamreader/.../RecordProcessor.java` keeps no per-key state at
  * all and therefore cannot deduplicate). After state expiry a
  * yet-later-arriving stale event would re-emit; choose the watermark to
  * cover the source's real disorder bound, and let the idempotent table
  * merge be the final arbiter.
  */
object StatefulLww {

  /** Full microsecond precision — Timestamp.getTime alone truncates to
    * millis and would diverge from the table path's struct comparison
    * ([[graft.operators.Lww.latest]]) on sub-millisecond event times. */
  private def epochMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def newer(a: ChangeEvent, b: ChangeEvent): Boolean = {
    val (am, bm) = (epochMicros(a.event_ts), epochMicros(b.event_ts))
    am > bm || (am == bm && a.seq > b.seq)
  }

  /** Process one key's new events against its stored winner. */
  private[streaming] def updateKey(
      key: (String, Int),
      events: Iterator[ChangeEvent],
      state: GroupState[ChangeEvent],
      stateTtlMs: Long): Iterator[ChangeEvent] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val incoming = events.toSeq
    if (incoming.isEmpty) return Iterator.empty
    val best = incoming.reduce((a, b) => if (newer(b, a)) b else a)
    val improved = state.getOption match {
      case Some(cur) if !newer(best, cur) => None
      case _ => Some(best)
    }
    improved.foreach { w =>
      state.update(w)
      if (state.getCurrentWatermarkMs() > 0 || stateTtlMs > 0)
        state.setTimeoutTimestamp( // timeout API is millis-based
          math.max(w.event_ts.getTime, state.getCurrentWatermarkMs()) + stateTtlMs)
    }
    improved.iterator
  }

  /** Winner-change stream: one output row per (key, improvement).
    * `watermarkDelay` bounds both reorder tolerance and state size. */
  def winners(events: Dataset[ChangeEvent],
      watermarkDelay: String = "10 minutes",
      stateTtlMs: Long = 600000L): Dataset[ChangeEvent] = {
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.scalaInt)
    implicit val evEnc = Encoders.product[ChangeEvent]
    events
      .withWatermark("event_ts", watermarkDelay)
      .groupByKey(e => (e.conv_id, e.turn_idx))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (k: (String, Int), it: Iterator[ChangeEvent], s: GroupState[ChangeEvent]) =>
          updateKey(k, it, s, stateTtlMs))
  }
}
