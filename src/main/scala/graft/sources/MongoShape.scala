package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MongoDB document shaping — the connector-free half of the reference's
  * mongodbreader/mongodbwriter (S12/W8): Extended JSON (v2) rendering and
  * parsing, plus the reader's `_id` range split
  * (`mongodbreader/` splits scans by ObjectId ranges; the upsert itself is
  * the engine's merge, `MongoDBWriter.java:303` ≡ [[graft.plans.IceliteTable.merge]]).
  *
  * Extended JSON is Mongo's lossless interchange text form (mongoexport /
  * change-stream payloads): int64 as `{"$numberLong":"v"}`, instants as
  * `{"$date":{"$numberLong":"millis"}}`, ids as `{"$oid":"hex24"}` —
  * epoch-millis form, so round-trips are timezone-free. Both directions
  * are pure Catalyst (`to_json`/`from_json`); no Mongo endpoint exists in
  * this sandbox, so the wire client stays with a connector, and every
  * testable piece ships here.
  */
object MongoShape {

  /** Render rows as Extended JSON documents (one `doc` string column):
    * `_id` from `oidExpr` (24-hex ObjectId), longs/timestamps in canonical
    * wrapped form, strings/doubles/bools relaxed (plain JSON). Null fields
    * are omitted, per `to_json`'s contract — [[parseExtended]] restores
    * them as nulls. */
  def renderExtended(df: DataFrame, oidExpr: Column, cols: Seq[String]): DataFrame = {
    val fields = cols.map { c =>
      df.schema(c).dataType match {
        case LongType =>
          struct(col(c).cast("string").as("$numberLong")).as(c)
        case TimestampType =>
          struct(struct(unix_millis(col(c)).cast("string")
            .as("$numberLong")).as("$date")).as(c)
        case TimestampNTZType =>
          // naive → instant via the session TZ; every engine main pins
          // spark.sql.session.timeZone=UTC, so this is TZ-free in practice
          struct(struct(unix_millis(col(c).cast(TimestampType)).cast("string")
            .as("$numberLong")).as("$date")).as(c)
        case _ => col(c).as(c)
      }
    }
    df.select(to_json(struct(
      (struct(oidExpr.as("$oid")).as("_id") +: fields): _*)).as("doc"))
  }

  /** Parse Extended JSON documents back into `_id` (hex string) plus the
    * typed columns of `schema` — the mongodbreader's cell-decode restated
    * as one `from_json` pass. Unknown/missing fields yield nulls
    * (malformed docs too — route via the dirty gate downstream, F8). */
  def parseExtended(df: DataFrame, docCol: String, schema: StructType): DataFrame = {
    val ext = StructType(
      StructField("_id", StructType(Seq(StructField("$oid", StringType)))) +:
        schema.map { f =>
          f.dataType match {
            case LongType =>
              StructField(f.name, StructType(Seq(
                StructField("$numberLong", StringType))))
            case TimestampType | TimestampNTZType =>
              StructField(f.name, StructType(Seq(StructField("$date",
                StructType(Seq(StructField("$numberLong", StringType)))))))
            case dt => StructField(f.name, dt)
          }
        })
    val j = from_json(col(docCol), ext)
    df.select((j.getField("_id").getField("$oid").as("_id") +:
      schema.map { f =>
        f.dataType match {
          case LongType =>
            j.getField(f.name).getField("$numberLong").cast("long").as(f.name)
          case TimestampType =>
            timestamp_millis(j.getField(f.name).getField("$date")
              .getField("$numberLong").cast("long")).as(f.name)
          case TimestampNTZType =>
            timestamp_millis(j.getField(f.name).getField("$date")
              .getField("$numberLong").cast("long"))
              .cast(TimestampNTZType).as(f.name)
          case _ => j.getField(f.name).as(f.name)
        }
      }): _*)
  }

  /** ObjectId `_id` range split — the mongodbreader's scan parallelism:
    * split [min, max] (24-hex ObjectIds, inclusive) into ≤ n contiguous
    * ranges in the 96-bit id space. Same [lo, hi)-plus-inclusive-last
    * contract as [[RangeSplit.longRanges]]; render WHERE slices with
    * [[RangeSplit.predicates]] (quote = [[RangeSplit.sqlString]]). */
  def objectIdRanges(min: String, max: String, n: Int): Seq[(String, String)] = {
    val Hex = "^[0-9a-f]{24}$".r
    require(Hex.matches(min) && Hex.matches(max),
      s"ObjectIds must be 24 lowercase hex chars: $min, $max")
    require(n >= 1 && min <= max, s"bad split: [$min,$max] x $n")
    val (lo, hi) = (BigInt(min, 16), BigInt(max, 16))
    val span = hi - lo + 1
    val k = if (span < n) span.toInt else n
    def render(x: BigInt): String = {
      val s = x.toString(16)
      "0" * (24 - s.length) + s
    }
    (0 until k).map { i =>
      val a = lo + span * i / k
      val b = if (i == k - 1) hi else lo + span * (i + 1) / k
      (render(a), render(b))
    }
  }
}
