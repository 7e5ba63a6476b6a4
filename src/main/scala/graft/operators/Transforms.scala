package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
}
