package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Lww
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session(8)
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(1000).select(
      concat(lit("c"), pmod(col("id"), lit(50))).as("conv_id"),
      pmod(col("id"), lit(5)).cast("int").as("turn_idx"),
      col("id").as("_seq"),
      timestamp_millis(col("id")).as("_event_ts"),
      lit(false).as("_deleted"),
      pmod(hash(concat(lit("c"), pmod(col("id"), lit(50)))), lit(8)).as("bkt"),
      pmod(xxhash64(col("id")), lit(2)).cast("int").as("_ksalt"))
    val out = Lww.latestBucketed(df, Seq("conv_id", "turn_idx"),
      Seq("_event_ts", "_seq"), "bkt", "_ksalt")
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    println(s"[plancheck] exchanges in fused LWW plan: $exchanges")
    println(plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Aggregate")).mkString("\n"))
    spark.stop()
  }
}
