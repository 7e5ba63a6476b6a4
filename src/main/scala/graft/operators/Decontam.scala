package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the pre-training hygiene pass that flags
  * training documents sharing n-gram content with an evaluation/benchmark
  * set, so eval items can be dropped from the corpus before training.
  *
  * Semantics (the standard n-gram-overlap definition): a document's
  * contamination score is the fraction of its DISTINCT word n-gram
  * shingles that appear anywhere in the benchmark set; `contaminated`
  * is score ≥ threshold. Tokenization/shingling is identical to the
  * dedup family ([[Dedup.shingleSet]]) so the same DuckDB oracle idiom
  * applies verbatim.
  *
  * Scale story: the benchmark side is distinct-shingled and BROADCAST —
  * eval suites are ~10^4-10^6 shingles, far under the broadcast bar — so
  * the corpus is scanned once map-side with no shuffle of document text;
  * the only exchange is the per-doc hash aggregation of (shingle-count,
  * hit-count), both computed in ONE pass over the exploded shingles
  * (conditional count, no second join). At 100 TB that is scan + one
  * map-combined agg. If the benchmark ever outgrew broadcast, drop the
  * hint and the same plan becomes a shuffle equi-join on the shingle.
  *
  * No counterpart in the reference (its closest surface is the
  * per-record filter transformer, `core/.../transformer/FilterTransformer
  * .java`); this is part of the training-pipeline extension.
  */
object Decontam {

  /** Per-document contamination against `bench`. Returns one row per
    * input document: `doc_id` (named after `idCol`), `n_shingles`
    * (distinct shingles in the doc), `n_hit` (of those, how many occur in
    * the benchmark), `overlap_ratio` (round 6), `contaminated`.
    *
    * `n` is the shingle width (3 matches the dedup family); `threshold`
    * the flagging bar on the distinct-shingle overlap fraction. */
  def contamination(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, benchTextCol: String, n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val benchSh = bench
      .select(explode(array_distinct(
        TextOps.shingles(TextOps.tokens(TextOps.normalize(col(benchTextCol))), n)))
        .as("sh"))
      .distinct()
      .withColumn("__hit", lit(1))
    val docSh = docs.select(col(idCol),
      explode(array_distinct(
        TextOps.shingles(TextOps.tokens(TextOps.normalize(col(textCol))), n)))
        .as("sh"))
    docSh
      .join(broadcast(benchSh), Seq("sh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_hit"))
      .withColumn("overlap_ratio",
        round(col("n_hit").cast("double") / col("n_shingles"), 6))
      .withColumn("contaminated",
        col("n_hit").cast("double") / col("n_shingles") >= threshold)
  }
}
