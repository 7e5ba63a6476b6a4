package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Row-level scalar transforms — the reference's only "expression" surface,
  * re-expressed as Catalyst columns (codegen'd, no UDFs).
  *
  * Reference registry: `core/.../transformer/TransformerRegistry.java:28-40`;
  * semantics per transformer file (cited per function). Unlike the
  * reference's per-record Java loop (`TransformerExchanger.doTransformer`,
  * `core/.../exchanger/TransformerExchanger.java:53-127`), these stay inside
  * whole-stage codegen — at 10^10 rows the difference between a JIT'd
  * column expression and a virtual call per record per transformer.
  */
object Transforms {

  /** `dx_substr(col, start, len)` — substring; null passes through.
    * (`SubstrTransformer.java:15-66`; start is 0-based there, 1-based here
    * via the +1.) */
  def dxSubstr(c: Column, start: Int, len: Int): Column =
    substring(c, start + 1, len)

  /** `dx_pad(col, 'l'|'r', len, pad)` — pad to len, truncating if longer;
    * null → "" in the reference (`PadTransformer.java:15-90`). Spark/ANSI
    * lpad/rpad already truncate; we keep nulls null (documented delta —
    * null-in null-out is the saner contract). */
  def dxPad(c: Column, leftNotRight: Boolean, len: Int, pad: String): Column =
    if (leftNotRight) lpad(c, len, pad) else rpad(c, len, pad)

  /** `dx_replace(col, start, len, str)` — splice-replace a character range
    * (`ReplaceTransformer.java:15-66`). start 0-based. */
  def dxReplace(c: Column, start: Int, len: Int, replaceStr: String): Column =
    concat(substring(c, 1, start), lit(replaceStr),
      // overlong start yields empty tail, like the reference
      substring(c, start + len + 1, Int.MaxValue))

  /** `dx_filter(col, op, value)` — predicate with INVERTED sense: a match
    * removes the row (`FilterTransformer.java:14-311`). Returns the *keep*
    * condition, so `df.filter(keepFilter(...))`. `like` is a full-match
    * regex in the reference (Java `String.matches`). Range ops never match
    * null (`FilterTransformer.java:206-212`) → null rows are kept. */
  def keepFilter(c: Column, op: String, value: String): Column = {
    // reference `like` is Java String.matches = FULL match, not find.
    // \A..\z, not ^..$: `$` also matches before a trailing line terminator,
    // which String.matches (and DuckDB regexp_full_match) do not allow
    val full = s"\\A(?:$value)\\z"
    val matched: Column = op match {
      case "like"     => c.rlike(full)
      case "not like" => !c.rlike(full)
      case ">"        => c > value
      case "<"        => c < value
      case ">="       => c >= value
      case "<="       => c <= value
      case "="        => c === value
      case "!="       => c =!= value
      case other => throw new IllegalArgumentException(s"dx_filter op: $other")
    }
    // null never matches a range/like op ⇒ keep the row (coalesce false)
    !coalesce(matched, lit(false))
  }

  /** `dx_url2base64(col)` (fork-added, `UrlTransformer.java:25-95`) —
    * replace a URL column with the Base64 of the fetched body. Reference
    * semantics kept exactly: null passes through untouched (`:51-53`), and
    * any fetch failure leaves the ORIGINAL value in place
    * (`image2Base64`'s catch falls through to `return imageUrl`).
    *
    * This is the one transform that cannot be a Catalyst expression —
    * it performs side-effecting I/O per row — so it runs as a
    * `mapPartitions` over the full row (blobs never hit a shuffle; the
    * fetch happens inside the scan stage). The fetcher is pluggable so
    * unit tests and no-egress sandboxes use `file://` / `data:` URIs
    * while production injects a pooled HTTP client; [[defaultFetch]]
    * handles whatever protocols the JVM's URL handlers provide (file,
    * http(s), jar) plus RFC-2397 `data:` URIs, with the reference's 5 s
    * connect timeout. At 10^10 rows the fetch dominates; parallelism =
    * input partitions, so `repartition` the frame to the desired request
    * concurrency before calling. */
  def urlToBase64(df: DataFrame, colName: String,
      fetch: String => Array[Byte] = defaultFetch): DataFrame = {
    val schema = df.schema
    val idx = schema.fieldIndex(colName)
    require(schema(idx).dataType == StringType,
      s"dx_url2base64 needs a string column, got ${schema(idx).dataType}")
    df.mapPartitions { rows =>
      val b64 = java.util.Base64.getEncoder // not serializable — per-task
      rows.map { row =>
        val url = row.getString(idx)
        if (url == null) row
        else {
          val replaced =
            try b64.encodeToString(fetch(url))
            catch { case scala.util.control.NonFatal(_) => url }
          Row.fromSeq(row.toSeq.updated(idx, replaced))
        }
      }
    }(Encoders.row(schema))
  }

  /** Default fetcher for [[urlToBase64]]: `data:` URIs decoded locally
    * (base64 or percent-encoded per RFC 2397), everything else through
    * `java.net.URL` (file://, and http(s) where egress exists) with the
    * reference's 5 s connect timeout (`UrlTransformer.java:74`). */
  val defaultFetch: String => Array[Byte] = { url =>
    if (url.startsWith("data:")) {
      val comma = url.indexOf(',')
      require(comma >= 0, s"malformed data: URI")
      val (header, payload) = (url.substring(5, comma), url.substring(comma + 1))
      if (header.endsWith(";base64"))
        java.util.Base64.getMimeDecoder.decode(payload)
      else
        java.net.URLDecoder.decode(payload, "UTF-8").getBytes("UTF-8")
    } else {
      val conn = new java.net.URL(url).openConnection()
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(5000)
      val is = conn.getInputStream
      try is.readAllBytes() finally is.close()
    }
  }
}
