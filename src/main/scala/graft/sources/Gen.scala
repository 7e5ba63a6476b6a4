package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic changelog generator (seeded, no RNG state) — the Spark
  * restatement of the reference's synthetic streamreader
  * (`/root/reference/streamreader/.../StreamReader.java:95-167`: const /
  * random column specs), used for the 10^7-event bench fixture
  * (FIXTURES.md §3).
  *
  * Built on `spark.range(n)` + pure hash expressions: fully distributed,
  * reproducible for any partitioning, no driver-side loop, no
  * `Math.random`. All pseudo-randomness is `xxhash64(seed, i, tag)` —
  * engine-internal determinism only (no cross-engine oracle reads these).
  */
object Gen {

  case class GenConfig(
      events: Long,
      convs: Long,
      maxTurns: Int = 25,
      /** fraction (percent) of events funneled to [[hotConvs]] hot keys. */
      hotPct: Int = 0,
      hotConvs: Int = 3,
      /** percent of events whose event_ts is shifted backwards (late). */
      latePct: Int = 10,
      seed: Long = 42L)

  /** Change-event DataFrame with the Model.changeSchema columns.
    * op mix ≈ 70% I / 25% U / 5% D; `seq` = row id (monotone, unique);
    * `event_ts` mostly monotone with `latePct`% shifted up to 1000 s back
    * (out-of-order within watermark). */
  def changelog(spark: SparkSession, cfg: GenConfig): DataFrame = {
    def h(tag: String) = xxhash64(lit(cfg.seed), col("id"), lit(tag))
    val base = lit(1700000000000L)
    spark.range(cfg.events)
      .withColumn("r", pmod(h("op"), lit(100)))
      .withColumn("hot", pmod(h("hot"), lit(100)) < cfg.hotPct)
      .withColumn("conv_n",
        when(col("hot"), pmod(h("conv"), lit(cfg.hotConvs.toLong)))
          .otherwise(pmod(h("conv"), lit(cfg.convs))))
      // pad width sized to the key space: Spark's lpad TRUNCATES a longer
      // string, which would silently collide distinct conversations
      .withColumn("conv_id", concat(lit("c"), lpad(col("conv_n").cast("string"),
        math.max(8, cfg.convs.toString.length), "0")))
      .withColumn("turn_idx", pmod(h("turn"), lit(cfg.maxTurns.toLong)).cast("int"))
      .withColumn("op",
        when(col("r") < 70, "I").when(col("r") < 95, "U").otherwise("D"))
      .withColumn("late",
        when(pmod(h("late"), lit(100)) < cfg.latePct,
          pmod(h("lateby"), lit(1000000L))).otherwise(lit(0L)))
      .withColumn("event_ts",
        timestamp_millis(base + col("id") * 100 - col("late")))
      .withColumn("isD", col("op") === "D")
      .select(
        col("op"),
        col("conv_id"),
        col("turn_idx"),
        when(col("isD"), lit(null)).otherwise(
          element_at(array(lit("user"), lit("assistant"), lit("tool")),
            (pmod(h("role"), lit(3)) + 1).cast("int"))).as("role"),
        when(col("isD"), lit(null)).otherwise(
          concat(lit("turn text "), col("conv_id"), lit("/"), col("turn_idx"),
            lit(" v"), col("id"))).as("text"),
        when(!col("isD") && pmod(h("tool"), lit(4)) === 0,
          concat(lit("t"), pmod(h("toolname"), lit(7)))).otherwise(lit(null)).as("tool"),
        when(col("isD"), lit(null).cast("timestamp"))
          .otherwise(timestamp_millis(base + col("id") * 100)).as("ts"),
        col("event_ts"),
        col("id").as("seq"))
  }

  /** The final-state oracle computed the declarative way (window LWW over
    * the generated changelog) — for row-diffing engine output at bench
    * scale without an external engine. */
  def expectedFinalState(changelog: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("conv_id", "turn_idx")
      .orderBy(col("event_ts").desc, col("seq").desc)
    changelog.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("op") =!= "D")
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
  }
}
