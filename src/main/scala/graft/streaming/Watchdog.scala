package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Hang monitor — the reference's TaskMonitor (F11, `core/.../taskgroup/
  * TaskMonitor.java:16-94`: a task whose counters have not moved for 48 h
  * is failed and retried). Spark restatement: a daemon thread that stops
  * a streaming query making NO progress for longer than `stallMs`, where
  * progress is what the reference's counters measure — work completing:
  *
  *  - a micro-batch finishing (new `lastProgress.batchId`), or
  *  - ANY Spark task finishing (SparkListener `onTaskEnd`).
  *
  * A long-but-healthy trigger (big backfill batch, compaction of a fat
  * bucket) keeps completing tasks and never trips the guard — only a
  * trigger that is active while nothing finishes (deadlock, stuck task,
  * hung driver-side code) does. Idle-but-completing triggers reset the
  * window via `isTriggerActive`. Task-end events are context-wide, so in
  * a multi-query session another query's progress also counts — this
  * engine runs one ingest query per session (documented contract).
  *
  * After the stop, the normal restart-from-checkpoint path applies (the
  * exactly-once commit gate makes the retry safe) — the reference's
  * failover loop (`TaskGroupContainer.java:146-269`) in Spark terms.
  */
final class Watchdog(q: StreamingQuery, stallMs: Long, pollMs: Long = 500L)
    extends AutoCloseable {

  /** True once the guard stopped the query for exceeding `stallMs`. */
  @volatile var stalled: Boolean = false
  @volatile private var closed = false
  @volatile private var lastTaskEnd = System.currentTimeMillis()

  private val taskListener = new org.apache.spark.scheduler.SparkListener {
    override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      // SUCCESSFUL tasks only: failed/killed attempts from a crash-retry
      // or livelocked stage must not read as progress, or the guard never
      // fires on exactly the loops it exists to break
      if (e.reason == org.apache.spark.Success)
        lastTaskEnd = System.currentTimeMillis()
  }
  q.sparkSession.sparkContext.addSparkListener(taskListener)

  private val t = new Thread(() => {
    var windowStart = -1L
    var lastBatch = -2L
    try {
      while (!closed && !stalled && q.isActive) {
        val now = System.currentTimeMillis()
        val cur = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
        if (!q.status.isTriggerActive) windowStart = -1L
        else if (cur != lastBatch) { lastBatch = cur; windowStart = now }
        else if (windowStart < 0) windowStart = now
        else if (now - windowStart > stallMs && now - lastTaskEnd > stallMs) {
          stalled = true
          try q.stop()
          catch { case _: Throwable => () } // stop timeout — query already dying
        }
        if (!stalled) Thread.sleep(pollMs)
      }
    } finally q.sparkSession.sparkContext.removeSparkListener(taskListener)
  }, s"graft-watchdog-${q.name}")
  t.setDaemon(true)
  t.start()

  override def close(): Unit = { closed = true }
}
