package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Hang monitor — the reference's TaskMonitor (F11, `core/.../taskgroup/
  * TaskMonitor.java:16-94`: a task whose counters have not moved for 48 h
  * is failed and retried). Spark restatement: a daemon thread that stops
  * a streaming query stuck INSIDE one trigger for longer than `stallMs`.
  *
  * Idle-but-healthy queries are NOT stalled: between triggers
  * `isTriggerActive` is false and the window resets, and every completed
  * batch (new `lastProgress.batchId`) resets it too — only a trigger that
  * started and never finished trips the guard, matching the reference's
  * no-progress-while-running semantics. After the stop, the normal
  * restart-from-checkpoint path applies (the exactly-once commit gate
  * makes the retry safe), which is the reference's failover loop
  * (`TaskGroupContainer.java:146-269`) in Spark terms.
  */
final class Watchdog(q: StreamingQuery, stallMs: Long, pollMs: Long = 500L)
    extends AutoCloseable {

  /** True once the guard stopped the query for exceeding `stallMs`. */
  @volatile var stalled: Boolean = false
  @volatile private var closed = false

  private val t = new Thread(() => {
    var windowStart = -1L
    var lastBatch = -2L
    while (!closed && !stalled && q.isActive) {
      val now = System.currentTimeMillis()
      val cur = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
      if (!q.status.isTriggerActive) windowStart = -1L
      else if (cur != lastBatch) { lastBatch = cur; windowStart = now }
      else if (windowStart < 0) windowStart = now
      else if (now - windowStart > stallMs) {
        stalled = true
        try q.stop()
        catch { case _: Throwable => () } // stop timeout — query already dying
      }
      if (!stalled) Thread.sleep(pollMs)
    }
  }, s"graft-watchdog-${q.name}")
  t.setDaemon(true)
  t.start()

  override def close(): Unit = { closed = true }
}
