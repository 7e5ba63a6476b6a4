package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Executable half of the reference's RDBMS splitPk scan (S1): assemble
  * the `spark.read.jdbc(url, table, predicates)` reader from
  * [[RangeSplit]]'s slice math — the part round 1 left as math only.
  *
  * Reference: split planning `plugin-rdbms-util/.../reader/util/
  * SingleTableSplitUtil.java:32-123` (ranges), `:270-288` (MIN/MAX SQL),
  * table-mode fanout `ReaderSplitUtil.java:20-107`, querySql passthrough
  * `ReaderSplitUtil.java:92-102`.
  *
  * No database exists in this sandbox, so `scan`/`scanQuery` are thin and
  * untested at runtime; every string they assemble (min/max derived table,
  * per-slice predicates, quantile variant) is pure and unit-tested
  * (SourcesSpec). At scale the predicates array is what spreads the scan:
  * one Spark input partition per slice, each fetching
  * `WHERE pk >= lo AND pk < hi` server-side — filter + projection push
  * down through the JDBC source as in the reference's spliced SELECT
  * (`SingleTableSplitUtil.buildQuerySql:125-138`).
  */
object Jdbc {

  case class Spec(
      url: String,
      table: String,
      pk: String,
      slices: Int,
      user: Option[String] = None,
      password: Option[String] = None,
      /** extra row filter AND'ed into every slice predicate. */
      where: Option[String] = None)

  /** MIN/MAX discovery as a derived table for the one-partition jdbc
    * reader (reference `SingleTableSplitUtil.java:270-288`). */
  def minMaxSql(spec: Spec): String = {
    val w = spec.where.map(w => s" WHERE $w").getOrElse("")
    s"(SELECT MIN(${spec.pk}) AS pk_min, MAX(${spec.pk}) AS pk_max" +
      s" FROM ${spec.table}$w) graft_minmax"
  }

  /** Per-slice WHERE predicates — even pk ranges plus the IS NULL
    * catch-all, each AND'ed with the user filter; one jdbc partition per
    * entry. */
  def slicePredicates(spec: Spec, minPk: Long, maxPk: Long): Seq[String] =
    withWhere(spec, RangeSplit.predicates(spec.pk,
      RangeSplit.longRanges(minPk, maxPk, spec.slices)))

  /** Quantile-balanced slice predicates for skewed pks: cut points from
    * [[RangeSplit.quantileRanges]] over a sample/stats DataFrame the
    * caller already has (e.g. a prior snapshot of the table). */
  def quantileSlicePredicates(spec: Spec, sample: DataFrame): Seq[String] =
    withWhere(spec,
      RangeSplit.predicates(spec.pk,
        RangeSplit.quantileRanges(sample, spec.pk, spec.slices)))

  private def withWhere(spec: Spec, preds: Seq[String]): Seq[String] =
    preds.map(p => spec.where.map(w => s"($p) AND ($w)").getOrElse(p))

  def connProps(spec: Spec): Properties = {
    val p = new Properties()
    spec.user.foreach(p.setProperty("user", _))
    spec.password.foreach(p.setProperty("password", _))
    p
  }

  /** The assembled parallel reader. `bounds` = known (min, max) pk;
    * None discovers them via [[minMaxSql]] first — one extra round trip,
    * exactly like the reference. NULL bounds (empty table / all-null pk)
    * degrade to the lone `pk IS NULL` slice instead of crashing, and any
    * integral pk type works (the JDBC source may map INT/SMALLINT cells
    * to non-Long row values). */
  def scan(spark: SparkSession, spec: Spec,
      bounds: Option[(Long, Long)] = None): DataFrame = {
    val resolved = bounds.orElse {
      val r = spark.read.jdbc(spec.url, minMaxSql(spec), connProps(spec)).head()
      if (r.isNullAt(0) || r.isNullAt(1)) None
      else Some((r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    }
    val preds = resolved match {
      case Some((lo, hi)) => slicePredicates(spec, lo, hi)
      case None => // no non-null pk rows: only the catch-all slice applies
        withWhere(spec, RangeSplit.predicates[Long](spec.pk, Seq.empty))
    }
    spark.read.jdbc(spec.url, spec.table, preds.toArray, connProps(spec))
  }

  /** querySql passthrough (`ReaderSplitUtil.java:92-102`): user-authored
    * SQL runs server-side as a derived table, single partition. */
  def scanQuery(spark: SparkSession, url: String, sql: String,
      user: Option[String] = None, password: Option[String] = None): DataFrame =
    spark.read.jdbc(url, s"($sql) graft_q",
      connProps(Spec(url, "", "", 1, user, password)))

  /** Cell decode to the reference's all-strings row shape
    * (`CommonRdbmsReader.java:247-394`: every JDBC type is stringified in
    * this fork, BLOB/BINARY → Base64 at `:346-352`). Spark's JDBC source
    * already decodes cells into typed columns — this restores the
    * reference's wire shape for consumers that expect it. */
  def decodeAllStrings(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case org.apache.spark.sql.types.BinaryType => base64(col(f.name)).as(f.name)
        case _ => col(f.name).cast("string").as(f.name)
      }
    }.toSeq: _*)
  }
}
