package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.DataFrame

/** The ONE private[sql] seam the engine needs: a V1 streaming `Source`'s
  * `getBatch` must return a DataFrame whose leaves carry
  * `isStreaming = true` (MicroBatchExecution asserts it), and the only
  * constructors for such plans (`Dataset.ofRows`, `internalCreateDataFrame`)
  * are `private[sql]`. This bridge lives in an `org.apache.spark.sql`
  * subpackage to reach them — the same approach Delta Lake takes for its
  * DeltaSource (`org.apache.spark.sql.delta`). Nothing else in the repo
  * uses internal access.
  */
object StreamingBridge {

  /** Re-tag a BATCH DataFrame (parquet scans, filters, projections) as a
    * streaming micro-batch: flip `isStreaming` on its leaf relations and
    * rebuild the frame — exactly what `FileStreamSource.getBatch` does
    * internally with `DataSource.resolveRelation` + `isStreaming = true`.
    * Transform-only: the scan, pushed filters, and codegen are untouched. */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[ClassicSession]
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming => lr.copy(isStreaming = true)
      case lr: LocalRelation if !lr.isStreaming => lr.copy(isStreaming = true)
    }
    Dataset.ofRows(spark, plan)
  }
}
