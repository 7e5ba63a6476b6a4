package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup.MinHashConfig

/** Incremental near-duplicate detection against a persisted MinHash
  * signature index — the CDC-shaped dedup: each arriving batch is checked
  * against everything already ingested WITHOUT re-scanning the corpus.
  *
  * Semantics (deterministic, oracle-checkable): a document is DROPPED iff
  * some EARLIER document — earlier batch, or same batch with a smaller
  * id — shares at least one LSH band with it and their signatures agree on
  * ≥ `minMatches` of the k MinHash positions (the standard estimator:
  * matches/k ≈ Jaccard). "Earlier" compares against all earlier
  * *arrivals*, kept or dropped, so the decision for a document never
  * depends on the (sequential, order-dependent) keep/drop outcome of its
  * predecessors — each batch's decisions are a pure function of the index
  * contents, which is what makes the operator both parallelizable and
  * expressible as one declarative oracle query.
  *
  * Scale design (100 TB corpus, 10^9+ documents):
  *  - per batch, only the batch's documents are shingled/signed (linear in
  *    the batch, never in the corpus);
  *  - the index holds two tables: `bands/` (band, bkey, id, arrival) — the
  *    LSH buckets, ~16 short rows/doc — and `sigs/` (id, arrival, sig) —
  *    one k-long array/doc for verification. Candidates come from an
  *    equi-join of the batch's bands against `bands/` (shuffles band keys,
  *    not documents or signatures); signatures are fetched by id equi-join
  *    for candidates only;
  *  - signature match counting is a codegen'd `zip_with`/`filter` over two
  *    k-arrays — no UDF;
  *  - band keys are the signature slice VALUES (comma-joined), not an
  *    engine hash, so candidates are bit-identical across engines (the
  *    batch-oriented [[Dedup.lshCandidates]] keeps xxhash64 keys — cheaper
  *    shuffle bytes — because its output is exact-verified anyway);
  *  - the verification threshold is an integer match count, so no
  *    float-comparison hazard between engines.
  *
  * The reference has no incremental dedup (nearest analogue: idempotent
  * REPLACE writes, `plugin-rdbms-util/.../writer/WriterUtil.java:113-196`);
  * this is the training-pipeline extension composed with the CDC engine's
  * batch-arrival model.
  */
object IncrementalDedup {

  /** Per-doc MinHash signatures for one batch: (id, sig). */
  def signatures(df: DataFrame, idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig()): DataFrame =
    Dedup.minHashSignatures(Dedup.shingleSet(df, idCol, textCol, cfg.shingleN), cfg)

  /** Banded index rows for signatures: (id, band, bkey) where bkey is the
    * portable comma-joined signature slice for that band. */
  def banded(sigs: DataFrame, cfg: MinHashConfig): DataFrame = {
    val r = cfg.rowsPerBand
    sigs.select(col("id"), explode(
        transform(sequence(lit(0), lit(cfg.bands - 1)),
          b => struct(b.as("band"),
            concat_ws(",", slice(col("sig"), b * r + 1, lit(r))).as("bkey"))))
        .as("e"))
      .select(col("id"), col("e.band").as("band"), col("e.bkey").as("bkey"))
  }

  /** Match count of two k-long signature arrays (codegen'd, no UDF). */
  private def matchCount(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    size(filter(zip_with(a, b, (x, y) => x === y), v => v))

  /** Process one arriving batch against the index at `indexRoot`:
    * returns the per-document decision frame
    * `(id, arrival, kept, dup_of)` — `dup_of` = the EARLIEST (by
    * (arrival, id)) matching document, null when kept — and appends the
    * batch's bands+signatures to the index (all of them: semantics above).
    *
    * `arrival` must strictly increase across calls for one index; ids must
    * be unique across the corpus. `minMatches` defaults to
    * ceil(0.7·k) — at j = 0.8 true near-dups match ~51 of 64 positions
    * (σ≈3.2), so 45 catches them with 2σ margin while honest-unique pairs
    * (j ≤ 0.5, E ≤ 32) stay clear. */
  def dedupeBatch(spark: SparkSession, indexRoot: String, batch: DataFrame,
      arrival: Long, idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig(),
      minMatchesOpt: Option[Int] = None): DataFrame = {
    val minMatches = minMatchesOpt.getOrElse(
      math.ceil(0.7 * cfg.numHashes).toInt)
    val sigs = signatures(batch, idCol, textCol, cfg)
      .withColumn("arrival", lit(arrival)).cache()
    val bnd = banded(sigs, cfg)

    val bandsDir = s"$indexRoot/bands"
    val sigsDir = s"$indexRoot/sigs"
    val haveIndex = graft.plans.Hfs.isDir(graft.plans.Hfs.path(bandsDir))

    // candidate pairs within the batch: earlier = smaller id
    val vsSelf = bnd.as("a")
      .join(bnd.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("b.id").as("id"), col("a.id").as("id_a"))
      .distinct()
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id"), col("sig").as("sig_b")), "id")
      .filter(matchCount(col("sig_a"), col("sig_b")) >= minMatches)
      .select(col("id"), lit(arrival).as("arr_a"), col("id_a"))

    // candidate pairs vs the corpus: equi-join on the band key — the new
    // batch is the small side, so it broadcasts against the arbitrarily
    // large index (the index side streams; only candidates shuffle)
    val vsCorpus = if (!haveIndex) None
      else {
        // arrival guard: the protocol appends this batch only after the
        // decisions materialize, but a crashed writer can leave partial
        // same-arrival files — never let them (or re-listing) match
        val idxBands = spark.read.parquet(bandsDir)
          .filter(col("arrival") < arrival)
        val cand = idxBands.as("i")
          .join(broadcast(bnd.as("n")),
            col("i.band") === col("n.band") && col("i.bkey") === col("n.bkey"))
          .select(col("n.id").as("id"), col("i.id").as("id_a"),
            col("i.arrival").as("arr_a"))
          .distinct()
        val idxSigs = spark.read.parquet(sigsDir)
          .filter(col("arrival") < arrival)
        Some(cand
          .join(idxSigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
          .join(sigs.select(col("id"), col("sig").as("sig_b")), "id")
          .filter(matchCount(col("sig_a"), col("sig_b")) >= minMatches)
          .select(col("id"), col("arr_a"), col("id_a")))
      }

    // earliest match per dropped doc (min_by over the (arrival, id) pair)
    val dup = vsCorpus.fold(vsSelf)(_.unionByName(vsSelf))
      .groupBy(col("id"))
      .agg(min_by(col("id_a"), struct(col("arr_a"), col("id_a"))).as("dup_of"))

    val decisions = sigs.select(col("id"), col("arrival"))
      .join(dup, Seq("id"), "left")
      .select(col("id"), col("arrival"),
        col("dup_of").isNull.as("kept"), col("dup_of"))

    // sever lineage BEFORE the index append: localCheckpoint materializes
    // the decisions and cuts the plan, so a later action on the returned
    // frame can never re-list the index dirs the append is about to grow
    // (a plain cache is not enough — evicted/invalidated partitions would
    // recompute against the grown index and match documents to themselves)
    val out = decisions.localCheckpoint()
    bnd.withColumn("arrival", lit(arrival))
      .write.mode("append").parquet(bandsDir)
    sigs.select(col("id"), col("arrival"), col("sig"))
      .write.mode("append").parquet(sigsDir)
    sigs.unpersist()
    out
  }

  /** Replay `batches` (arrival order) through a fresh index at `indexRoot`
    * and return the concatenated decision frame. */
  def replay(spark: SparkSession, indexRoot: String,
      batches: Seq[DataFrame], idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig(),
      minMatchesOpt: Option[Int] = None): DataFrame =
    batches.zipWithIndex.map { case (b, i) =>
      dedupeBatch(spark, indexRoot, b, i.toLong, idCol, textCol, cfg, minMatchesOpt)
    }.reduce(_.unionByName(_))
}
