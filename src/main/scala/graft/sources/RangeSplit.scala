package graft.sources

/** splitPk range partitioning — the reference's core scan-parallelism
  * operator (S1): split a table into N slices by primary-key range so each
  * task scans `WHERE pk >= lo AND pk < hi` (`plugin-rdbms-util/.../reader/
  * util/SingleTableSplitUtil.java:32-123`, numeric/string range math
  * `RangeSplitUtil.java:14-93`, null slice `SingleTableSplitUtil.java:107-115`).
  *
  * In Spark the *execution* side is `spark.read.jdbc(url, table,
  * partitionColumn/lowerBound/upperBound/numPartitions)` for numeric pks and
  * `spark.read.jdbc(url, table, predicates)` for string pks — this module
  * computes those inputs (the part Spark does not provide): even numeric
  * ranges, radix-interpolated string ranges, and the WHERE predicates
  * including the reference's `IS NULL` catch-all slice.
  */
object RangeSplit {

  /** Sample-based quantile split — the reference's Oracle strategy
    * (`SingleTableSplitUtil.java:293-388`: `SAMPLE(0.1)` + `ORDER BY
    * DBMS_RANDOM.VALUE` → quantile cut points) restated Spark-first: ONE
    * `percentile_approx` aggregate over the pk yields the interior cut
    * points, so a skewed pk distribution gets balanced slices where
    * [[longRanges]]' even arithmetic split would put most rows in one fat
    * slice. Duplicate cuts (a single very hot value) collapse, so fewer
    * than `n` slices may return. Ranges are [lo, hi) except the last
    * ([lo, max]), exactly like [[longRanges]] — feed to [[predicates]]. */
  def quantileRanges(df: org.apache.spark.sql.DataFrame, pk: String, n: Int,
      accuracy: Int = 10000): Seq[(Long, Long)] = {
    import org.apache.spark.sql.functions._
    require(n >= 1)
    val probs = (1 until n).map(i => i.toDouble / n)
    val aggs =
      if (probs.isEmpty) Seq(min(col(pk)).cast("long"), max(col(pk)).cast("long"))
      else Seq(min(col(pk)).cast("long"), max(col(pk)).cast("long"),
        expr(s"percentile_approx($pk, array(${probs.mkString(",")}), $accuracy)")
          .cast("array<long>"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    if (row.isNullAt(0)) return Seq.empty // no non-null pk rows
    val lo = row.getLong(0)
    val hi = row.getLong(1)
    val interior =
      if (probs.isEmpty) Seq.empty[Long]
      else row.getSeq[Long](2).map(q => math.max(math.min(q, hi), lo))
    // percentiles are monotone, so after clamping the cut list is sorted;
    // distinct keeps encounter order = sorted order
    val cuts = (lo +: interior :+ hi).distinct
    // single-value pk: one degenerate slice, not zero
    if (cuts.size == 1) Seq((lo, hi)) else cuts.init.zip(cuts.tail)
  }

  /** Split [min, max] (inclusive) into at most `n` contiguous long ranges
    * covering every value exactly once. Returned as [lo, hi) pairs except
    * the last, which is [lo, max] — rendered inclusively by [[predicates]].
    * Degenerates gracefully: n ≥ span collapses to single-value ranges. */
  def longRanges(min: Long, max: Long, n: Int): Seq[(Long, Long)] = {
    require(n >= 1 && min <= max, s"bad split: [$min,$max] x $n")
    val span = BigInt(max) - BigInt(min) + 1
    val k = if (span < n) span.toInt else n
    (0 until k).map { i =>
      val lo = BigInt(min) + span * i / k
      // all ranges are [lo, hi) except the last, which is [lo, max]
      val hi = if (i == k - 1) BigInt(max) else BigInt(min) + span * (i + 1) / k
      (lo.toLong, hi.toLong)
    }
  }

  /** Interpolate `n` split points between two strings by mapping each onto
    * a big integer over its char codes (the reference's ASCII-radix trick,
    * `RangeSplitUtil.java:14-93`), splitting evenly in that numeric space,
    * and mapping back. The digit alphabet is the 95 printable ASCII chars
    * `' '..'~'` so generated cut points are always printable — safe to
    * render into WHERE predicates and to diff as text (below-space input
    * chars clamp to digit 0; the mapping stays order-preserving). Split
    * points are only used in range predicates, and consecutive slices
    * share their cut string, so lossy round-tripping cannot lose rows —
    * the chained ranges cover the whole [min, max] space by construction. */
  def stringRanges(min: String, max: String, n: Int): Seq[(String, String)] = {
    require(n >= 1)
    // ASCII-space construction (like the reference's): masking non-ASCII
    // chars to 7 bits would produce bounds that sort BELOW the true max
    // and silently exclude rows from every slice
    require((min + max).forall(_ < 128),
      "stringRanges requires ASCII pk bounds; supply explicit cut points otherwise")
    val base = 95 // printable digits: ' ' = 0 .. '~' = 94
    def digit(c: Char): Int = math.min(math.max(c.toInt - 0x20, 0), base - 1)
    val width = math.max(min.length, max.length)
    def toNum(s: String): BigInt =
      s.padTo(width, ' ').foldLeft(BigInt(0))((acc, c) => acc * base + digit(c))
    def toStr(x: BigInt): String = {
      val sb = new StringBuilder
      var v = x
      (0 until width).foreach { _ =>
        sb.insert(0, (0x20 + (v % base).toInt).toChar); v /= base
      }
      sb.toString.reverse.dropWhile(_ == ' ').reverse
    }
    val (lo, hi) = (toNum(min), toNum(max))
    require(lo <= hi, "min > max in radix space")
    val span = hi - lo
    val k = if (span < n) span.toInt.max(1) else n
    val cuts = (0 to k).map(i => lo + span * i / k)
    // outer endpoints use the CALLER's exact strings: the round-trip trims
    // padding, which could otherwise drop the min/max rows (e.g. a max
    // ending in spaces) from the first/last slice
    (0 until k).map { i =>
      val a = if (i == 0) min else toStr(cuts(i))
      val b = if (i == k - 1) max else toStr(cuts(i + 1))
      (a, b)
    }
  }

  /** Composite-PK cut points — the reference's multi-dimensional range
    * split (S5/S6: HBase rowkey ranges `hbase11xreader/.../Hbase11xHelper
    * .java:163-190`, OTS multi-dim PK split `otsreader/.../utils/
    * RangeSplit.java`) restated over a DataFrame: boundaries are
    * LEXICOGRAPHIC cut points over (pk1, pk2), so a hot pk1 value gets
    * sub-split by pk2 where [[quantileRanges]]'s single-dim cuts would
    * collapse into one fat slice. Cut points come from a seeded, bounded
    * sample (the reference's Oracle `SAMPLE(0.1)` strategy,
    * `SingleTableSplitUtil.java:293-388`) sorted driver-side — the collect
    * is capped at `maxSample` pairs, O(1) in table size. Returns ≤ n-1
    * sorted distinct cuts (duplicates collapse; fewer slices may result).
    * Feed to [[compositePredicates]]. */
  def compositeCuts[A: Ordering, B: Ordering](
      df: org.apache.spark.sql.DataFrame, pk1: String, pk2: String, n: Int,
      maxSample: Int = 100000, seed: Long = 42L)(
      getA: org.apache.spark.sql.Row => A, getB: org.apache.spark.sql.Row => B)
      : Seq[(A, B)] = {
    import org.apache.spark.sql.functions.col
    require(n >= 1 && maxSample >= n, s"bad composite split: n=$n sample=$maxSample")
    if (n == 1) return Seq.empty
    val keys = df.select(col(pk1), col(pk2)).na.drop()
    val total = keys.count()
    if (total == 0) return Seq.empty
    // 1.2 oversample so the post-sample row count lands near maxSample even
    // with Bernoulli variance; limit() caps the driver transfer regardless
    val frac = math.min(1.0, maxSample.toDouble * 1.2 / total)
    val sample = keys.sample(withReplacement = false, frac, seed)
      .limit(maxSample).collect()
      .map(r => (getA(r), getB(r))).sorted.toSeq
    if (sample.isEmpty) Seq.empty
    else {
      val m = sample.length
      (1 until n).map(i => sample(math.min(i * m / n, m - 1))).distinct
    }
  }

  /** Render sorted composite cut points into ≤ |cuts|+1 lexicographic range
    * predicates plus the null catch-all — usable both as
    * `spark.read.jdbc(url, table, predicates)` slices and as
    * `df.filter(expr(...))`. Slice i covers `[cut(i-1), cut(i))` in
    * (pk1, pk2) lexicographic order; the first/last slices are unbounded
    * below/above. Every range slice requires both keys non-null (a null
    * pk2 would otherwise satisfy the `pk1 > a` disjunct and double-count
    * against the catch-all), so the slices partition the table: each row
    * matches exactly one predicate. */
  def compositePredicates[A: Ordering, B: Ordering](pk1: String, pk2: String,
      cuts: Seq[(A, B)], quoteA: A => String, quoteB: B => String)
      : Seq[String] = {
    val ord = Ordering.Tuple2(Ordering[A], Ordering[B])
    require(cuts.sliding(2).forall {
      case Seq(a, b) => ord.lt(a, b)
      case _         => true
    }, "composite cuts must be strictly increasing")
    val notNull = s"$pk1 IS NOT NULL AND $pk2 IS NOT NULL"
    def lower(c: (A, B)) =
      s"($pk1 > ${quoteA(c._1)} OR ($pk1 = ${quoteA(c._1)} AND $pk2 >= ${quoteB(c._2)}))"
    def upper(c: (A, B)) =
      s"($pk1 < ${quoteA(c._1)} OR ($pk1 = ${quoteA(c._1)} AND $pk2 < ${quoteB(c._2)}))"
    val ranges =
      if (cuts.isEmpty) Seq(notNull)
      else {
        val mids = cuts.sliding(2).collect { case Seq(a, b) =>
          s"$notNull AND ${lower(a)} AND ${upper(b)}"
        }.toSeq
        (s"$notNull AND ${upper(cuts.head)}" +: mids) :+
          s"$notNull AND ${lower(cuts.last)}"
      }
    ranges :+ s"($pk1 IS NULL OR $pk2 IS NULL)"
  }

  /** Render ranges into scan predicates for `spark.read.jdbc(url, table,
    * predicates)`, one per slice plus the reference's `IS NULL` slice so
    * null-pk rows are not lost (`SingleTableSplitUtil.java:107-115`).
    * `quote`: SQL literal renderer for the pk type. */
  def predicates[A](pk: String, ranges: Seq[(A, A)],
      quote: A => String = (a: A) => a.toString): Seq[String] = {
    if (ranges.isEmpty) return Seq(s"$pk IS NULL")
    val mids = ranges.init.map { case (lo, hi) =>
      s"$pk >= ${quote(lo)} AND $pk < ${quote(hi)}"
    }
    val (llo, lhi) = ranges.last
    (mids :+ s"$pk >= ${quote(llo)} AND $pk <= ${quote(lhi)}") :+ s"$pk IS NULL"
  }

  /** SQL string-literal renderer for string pks (single-quoted, embedded
    * quotes doubled) — pass as the `quote` arg of [[predicates]] so cut
    * points render as valid literals in every ANSI dialect. */
  def sqlString(s: String): String = "'" + s.replace("'", "''") + "'"
}
