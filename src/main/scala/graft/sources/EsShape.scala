package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Elasticsearch bulk-write shaping — the render/verify half of the
  * reference's ES writer (`elasticsearchwriter/.../ESWriter.java:413-445`:
  * bulk index with a per-item status check, dirty collection on item
  * error instead of failing the batch). No ES endpoint exists in this
  * sandbox, so the transport (POSTing each body to `/_bulk`) stays with
  * the caller; everything testable ships here — action-line rendering and
  * body chunking as pure Catalyst/typed projections, response-item error
  * extraction as a driver-side parser. Mirrors [[KafkaShape.render]]'s
  * role for the Kafka producer.
  */
object EsShape {

  /** Render one `_bulk` action pair per row: the action line
    * `{"index":{"_index":...,"_id":...}}` plus the source document, both
    * via `to_json` (codegen'd, correct JSON escaping — never hand-spliced
    * strings). `idExpr` is the document id; CDC upserts should pass the
    * table key (e.g. `concat_ws(":", conv_id, turn_idx)`) so re-applied
    * events overwrite the same doc — ES indexing is idempotent per id,
    * the same property the merge sink relies on. Output column `bulk`
    * holds "action\nsource", ready for [[bulkBodies]]. */
  def bulkLines(df: DataFrame, index: String, idExpr: Column,
      sourceCols: Seq[String]): DataFrame =
    df.select(concat(
      to_json(struct(struct(lit(index).as("_index"),
        idExpr.cast("string").as("_id")).as("index"))),
      lit("\n"),
      to_json(struct(sourceCols.map(col): _*))).as("bulk"))

  /** Chunk rendered pairs into `_bulk` request bodies of ≤ `batchSize`
    * docs (the reference's batch flush): grouping runs PER PARTITION —
    * no shuffle, each task posts its own bodies, matching the reference's
    * per-channel writer threads. Bodies carry the trailing newline the
    * `_bulk` API requires. */
  def bulkBodies(bulk: DataFrame, batchSize: Int): Dataset[String] = {
    require(batchSize >= 1, s"batchSize: $batchSize")
    import bulk.sparkSession.implicits._
    bulk.select(col("bulk")).as[String]
      .mapPartitions(_.grouped(batchSize).map(_.mkString("", "\n", "\n")))
  }

  /** Per-item status check over a `_bulk` RESPONSE body
    * (`ESWriter.java:413-445`): returns (item position, error reason) for
    * each failed item so callers route those documents to dirty
    * collection (F8) and count them against the error-limit gate (F9)
    * instead of failing the whole batch. An item fails when it carries an
    * `error` object or a status ≥ 300. */
  def bulkItemErrors(responseJson: String): Seq[(Int, String)] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = JsonMethods.parse(responseJson)
    (root \ "items") match {
      case JArray(items) =>
        items.zipWithIndex.flatMap { case (item, i) =>
          // each item is {"<op>": {...}} for op ∈ index/create/update/delete
          val body = item match {
            case JObject((_, b) :: _) => b
            case other                => other
          }
          val status = body \ "status" match {
            case JInt(s) => s.toInt
            case _       => 0
          }
          body \ "error" match {
            case JNothing | JNull =>
              if (status >= 300) Some(i -> s"status $status") else None
            case err =>
              val typ = err \ "type" match { case JString(t) => t; case _ => "error" }
              val reason = err \ "reason" match { case JString(r) => r; case _ => "" }
              Some(i -> s"$typ: $reason".stripSuffix(": "))
          }
        }
      case _ => Seq.empty
    }
  }
}
