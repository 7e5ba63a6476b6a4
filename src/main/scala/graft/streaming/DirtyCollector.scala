package graft.streaming

import org.apache.spark.sql.DataFrame

/** Pluggable dirty-record REPORTING — the reference's TaskPluginCollector
  * family (`core/.../statistics/plugin/task/StdoutPluginCollector.java:
  * 21-60` logs a bounded sample; `HttpPluginCollector.java` POSTs dirty
  * records to an operator endpoint). Reporting is orthogonal to the
  * durable dead-letter parquet sink and to the error limits
  * ([[Ingest.Config.deadLetterDir]] / `errorRecordLimit` / `errorPctLimit`)
  * — a collector OBSERVES the batch's dirty rows; the gate still decides
  * drop-vs-fail.
  *
  * Driver-side and bounded by design: `collect` receives the dirty frame
  * and pulls at most [[DirtyCollector.SampleLimit]] rows — an operator
  * reading a report needs examples and counts, never the full spill (the
  * parquet dead letter holds that). A collector failure must not fail the
  * batch (reporting is best-effort, the reference swallows collector
  * errors the same way) — [[Ingest]] wraps the call. */
trait DirtyCollector {
  def collect(batchId: Long, dirty: DataFrame, dirtyCount: Long,
      total: Long): Unit
}

object DirtyCollector {
  /** Max rows a collector pulls to the driver per batch. */
  val SampleLimit = 100
}

/** Bounded stderr sample — StdoutPluginCollector parity. */
object StdoutDirtyCollector extends DirtyCollector {
  override def collect(batchId: Long, dirty: DataFrame, dirtyCount: Long,
      total: Long): Unit = {
    val sample = dirty.limit(DirtyCollector.SampleLimit).toJSON.collect()
    System.err.println(
      s"[dirty] batch $batchId: $dirtyCount/$total dirty; " +
        s"sample (${sample.length} of $dirtyCount):")
    sample.foreach(l => System.err.println(s"[dirty]   $l"))
  }
}

/** HTTP collector — HttpPluginCollector parity: the batch's dirty sample
  * POSTs to an operator endpoint as one JSON document. The transport is
  * injected (`poster(url, body) => status`) so the rendering/batching
  * contract is testable without egress; the default uses
  * `java.net.HttpURLConnection`. Non-2xx is reported to stderr, never
  * thrown — see the trait contract. */
class HttpDirtyCollector(
    endpoint: String,
    poster: (String, String) => Int = HttpDirtyCollector.defaultPoster)
    extends DirtyCollector {
  override def collect(batchId: Long, dirty: DataFrame, dirtyCount: Long,
      total: Long): Unit = {
    val sample = dirty.limit(DirtyCollector.SampleLimit).toJSON.collect()
    val body =
      s"""{"batchId":$batchId,"dirty":$dirtyCount,"total":$total,""" +
        s""""sample":[${sample.mkString(",")}]}"""
    val status = poster(endpoint, body)
    if (status < 200 || status >= 300)
      System.err.println(
        s"[dirty] batch $batchId: collector POST $endpoint returned $status")
  }
}

object HttpDirtyCollector {
  /** Plain JDK HTTP POST (application/json). Kept tiny on purpose —
    * anything fancier (retries, auth) belongs in an injected poster. */
  def defaultPoster(url: String, body: String): Int = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setRequestProperty("Content-Type", "application/json")
      conn.setDoOutput(true)
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(10000)
      val out = conn.getOutputStream
      try out.write(body.getBytes("UTF-8")) finally out.close()
      conn.getResponseCode
    } finally conn.disconnect()
  }
}
