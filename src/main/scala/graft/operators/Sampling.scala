package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines: rate-based
  * stratified sampling and fixed-quota per-stratum selection.
  *
  * Both key off [[TextOps.portableHash]] of the row id — NOT `rand()` —
  * so a sample is (a) reproducible run-to-run and engine-to-engine (the
  * DuckDB oracles replay the identical md5 arithmetic), (b) stable under
  * repartitioning/retries (a property `rand()` does not have inside a
  * retried task), and (c) consistent across datasets: any table sampled
  * with the same id and salt keeps the SAME rows, so joins between
  * independently-sampled tables still line up — the standard trick for
  * sampling a fact table and its satellites coherently.
  *
  * Scale: [[stratified]] is a map-only filter (no shuffle, pushdown-
  * friendly); [[topNPerStratum]] is one exchange on the stratum key + an
  * in-partition top-N — the same cost envelope as a groupBy, with the
  * rank window bounded per stratum.
  *
  * The reference has no sampler (its record semantics are
  * every-row ETL); this is a training-pipeline extension like
  * [[TextOps]]/[[Dedup]].
  */
object Sampling {

  /** Deterministic per-row sampling key in [0, 100): the portable 60-bit
    * md5 hash of `salt || id` reduced mod 100. Uniform enough for rate
    * control; exactly reproducible in SQL. */
  def samplePct(id: Column, salt: String): Column =
    pmod(TextOps.portableHash(concat(lit(salt), id.cast("string"))), lit(100L))

  /** Rate-based stratified sample: keep a row iff its [[samplePct]] falls
    * below the percentage assigned to its stratum (`rates`, in whole
    * percent; strata not listed fall back to `defaultPct`). Map-only —
    * the filter is a pure expression on (id, stratum), so it pushes into
    * the scan and costs zero shuffle at any scale. */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Int], defaultPct: Int, salt: String = "graft")
      : DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct).cast("long")) {
      case (acc, (stratum, pct)) =>
        when(col(strataCol) === stratum, lit(pct).cast("long")).otherwise(acc)
    }
    df.filter(samplePct(col(idCol), salt) < rate)
  }

  /** Source-mixture rebalancing — downsample an unbalanced corpus to
    * target source proportions (the "data mixture" pass of a training
    * pipeline: e.g. 50% web / 30% code / 20% wiki). The largest feasible
    * corpus respecting the weights keeps EVERY row of the binding
    * (scarcest-relative-to-weight) source and hash-downsamples the rest:
    * with per-source counts n_s and weights w_s, the feasible total is
    * K = min_s(n_s/w_s) and each source keeps at rate K·w_s/n_s ≤ 1.
    * Weights are RELATIVE (mathematically scale-invariant) and used
    * unnormalized, so the identical double arithmetic replays in the
    * oracle. Rows of sources not in `weights` are dropped.
    *
    * Keep/drop is the deterministic [[TextOps.portableHash]] of
    * (salt, id) against a per-source parts-per-million threshold — exact
    * double arithmetic replicated in the DuckDB oracle, reproducible
    * under repartitioning and retries, and consistent across tables like
    * [[stratified]]. The binding source's threshold is PINNED to the full
    * 10^6 (detected by n/w = K exactly) rather than recomputed as
    * K·w/n — the round trip can land at 0.99999… and floor to 999999,
    * which would drop ~1-per-million binding rows.
    *
    * A `weights` key with NO rows in `df` contributes nothing to K (it
    * cannot be upsampled; the remaining sources are balanced among
    * themselves). If the absent source must instead fail the job, assert
    * its presence upstream — this operator stays a lazy transformation.
    *
    * Scale: one map-combined count per source (tiny aggregate), a
    * |sources|-row rate table broadcast back, then a map-side filter —
    * the corpus itself is scanned once and never shuffled. The empty
    * window below runs on |sources| rows only. */
  def mixture(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double], salt: String = "graft"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    val sorted = weights.toSeq.sortBy(_._1)
    val wCol = sorted.tail.foldLeft(lit(sorted.head._2)) {
      case (acc, (src, w)) => when(col(sourceCol) === src, lit(w)).otherwise(acc)
    }
    val rates = df.filter(col(sourceCol).isInCollection(weights.keys.toSeq))
      .groupBy(col(sourceCol)).agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__t", col("__n") / wCol)
      .withColumn("__k", min(col("__t")).over(Window.partitionBy()))
      .withColumn("__thresh",
        when(col("__t") === col("__k"), lit(1000000L))
          .otherwise(floor(least(col("__k") * wCol / col("__n"), lit(1.0))
            * 1000000.0).cast("long")))
      .select(col(sourceCol), col("__thresh"))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(pmod(TextOps.portableHash(
        concat(lit(salt), col(idCol).cast("string"))), lit(1000000L))
        < col("__thresh"))
      .drop("__thresh")
  }

  /** Fixed-quota sample: exactly `min(n, |stratum|)` rows per stratum,
    * chosen by ascending hash order (deterministic; ties on the 60-bit
    * hash break by id). One shuffle on the stratum key; the window is a
    * rank-truncation, so only N rows per stratum survive the stage. */
  def topNPerStratum(df: DataFrame, idCol: String, strataCol: String,
      n: Int, salt: String = "graft"): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(TextOps.portableHash(concat(lit(salt), col(idCol).cast("string"))),
        col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
  }
}
