package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextOps.{fingerprint, normalize, portableHash, shingles, tokens}

/** Document deduplication for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (100 TB corpus):
  *  - exact dedup is one hash aggregation on a 16-byte digest (map-side
  *    combine; shuffles digests, not documents);
  *  - exact Jaccard all-pairs joins on shingles — correct but its shuffle
  *    is O(Σ per-shingle df²): the small-scale oracle, not the scale path;
  *  - MinHash+LSH is the scale path: per-doc signature (linear), band
  *    buckets (linear), candidate pairs only within buckets, exact
  *    verification on candidates only;
  *  - SimHash reduces each doc to one 60-bit key; near-dup = small Hamming
  *    distance, found via bit-band blocking (same banding idea).
  * The reference has no dedup at all (nearest analogue: idempotent
  * REPLACE/upsert writes, `plugin-rdbms-util/.../writer/WriterUtil.java:113-196`);
  * this module is the training-pipeline extension.
  */
object Dedup {

  // ------------------------------------------------------------ exact

  /** Exact duplicate groups by normalized-content fingerprint: one row per
    * distinct content with the canonical (min) id and the group size. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** Keep one row per distinct content (the min-id representative). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(fingerprint(col(textCol))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  // ------------------------------------------------------------ shingle sets

  /** (id, shingle) pairs, distinct — the set representation used by both
    * exact Jaccard and MinHash (identical tokenization ⇒ identical sets). */
  def shingleSet(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(array_distinct(shingles(tokens(normalize(col(textCol))), n))).as("sh"))
      .distinct()

  // ------------------------------------------------------------ exact jaccard

  /** All pairs (id_a < id_b) with shingle-set Jaccard ≥ threshold.
    * Exact (joins on shingle) — quadratic in per-shingle doc frequency, so
    * only for modest corpora / as the verification oracle. Output jaccard
    * is rounded to 6 dp for cross-engine comparability.
    * Note: the shingle set is cached and stays cached for the lifetime of
    * the returned (lazy) plan — long-lived sessions doing many dedup runs
    * should `spark.catalog.clearCache()` between corpora. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double): DataFrame = {
    val sh = shingleSet(df, idCol, textCol, n).cache()
    val card = sh.groupBy(col("id")).agg(count(lit(1)).as("card"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(card.withColumnRenamed("id", "id_a").withColumnRenamed("card", "ca"), "id_a")
      .join(card.withColumnRenamed("id", "id_b").withColumnRenamed("card", "cb"), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("ca") + col("cb") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ------------------------------------------------------------ minhash + lsh

  case class MinHashConfig(
      numHashes: Int = 64,
      bands: Int = 16,
      shingleN: Int = 3,
      threshold: Double = 0.8,
      /** signature formulation. True (default) = collect each doc's
        * shingle hashes once and compute all k minima in one projection —
        * no ×k row explode, fastest on normal corpora. False = the
        * explode→groupBy(id, i)→min formulation: k× the intermediate rows
        * but CONSTANT per-group aggregation state — flip it for corpora
        * with pathological single documents (≫10^5 shingles) where the
        * collected list would dominate one task's memory. Identical
        * signatures either way. */
      perRowSignatures: Boolean = true) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    def rowsPerBand: Int = numHashes / bands
  }

  private val MersennePrime = 2147483647L // 2^31-1

  /** Per-doc MinHash signature as an array column `sig` of length k.
    * Two formulations with identical output — see
    * [[MinHashConfig.perRowSignatures]] for the trade-off. Permutations
    * h_i(x) = (a_i·x + b_i) mod p over the 31-bit folded portable hash
    * (deterministic across runs AND engines); min is order-free, so
    * collect_list's nondeterministic order is fine. */
  def minHashSignatures(sh: DataFrame, cfg: MinHashConfig): DataFrame = {
    val base = pmod(portableHash(col("sh")), lit(MersennePrime)).as("x")
    // Deterministic full-range multipliers: a_i = (K·(2i+1)) mod p with
    // K = 2654435761 mod p (Knuth's 2^32/φ). The multiplier must span the
    // field — an early version used a_i = 2i+1 and tiny multipliers make
    // (a·x+b) mod p NEARLY ORDER-PRESERVING in x (few wraps), so every
    // "permutation" picks the same min-x shingle and two short docs
    // sharing one shingle matched on 50+/64 positions at true j≈0.01
    // (caught by the incremental-dedup estimator; the batch path masked
    // it behind exact verification). a_i ≠ 0 since p is prime and both
    // factors are nonzero mod p. Same formulas verbatim in the
    // dedup_incremental DuckDB oracle.
    val K = 2654435761L % MersennePrime
    val aArr = array((0 until cfg.numHashes).map(i =>
      lit((K * (2L * i + 1)) % MersennePrime)): _*)
    val bArr = array((0 until cfg.numHashes).map(i =>
      lit((2246822519L * (i + 1L) + 12345L) % MersennePrime)): _*)
    if (cfg.perRowSignatures)
      sh.select(col("id"), base)
        .groupBy(col("id")).agg(collect_list(col("x")).as("xs"))
        .select(col("id"),
          transform(sequence(lit(0), lit(cfg.numHashes - 1)), i =>
            array_min(transform(col("xs"), x =>
              pmod(element_at(aArr, i + 1) * x + element_at(bArr, i + 1),
                lit(MersennePrime))))).as("sig"))
    else
      sh.select(col("id"), base)
        .select(col("id"), explode(
          transform(sequence(lit(0), lit(cfg.numHashes - 1)),
            i => struct(i.as("i"),
              pmod(element_at(aArr, i + 1) * col("x") + element_at(bArr, i + 1),
                lit(MersennePrime)).as("h")))).as("p"))
        .groupBy(col("id"), col("p.i").as("i"))
        .agg(min(col("p.h")).as("mh"))
        .groupBy(col("id"))
        .agg(array_sort(collect_list(struct(col("i"), col("mh")))).as("s"))
        .select(col("id"), transform(col("s"), e => e("mh")).as("sig"))
  }

  /** Candidate pairs: docs sharing at least one LSH band (band = hash of a
    * contiguous signature slice). Internal hash may be engine-local
    * (xxhash64) — only the verified output must be portable. */
  def lshCandidates(sigs: DataFrame, cfg: MinHashConfig): DataFrame = {
    val r = cfg.rowsPerBand
    val banded = sigs.select(col("id"), explode(
      transform(sequence(lit(0), lit(cfg.bands - 1)),
        b => struct(b.as("band"),
          xxhash64(b, concat_ws(",",
            slice(col("sig"), b * r + 1, lit(r)))).as("bh")))).as("e"))
      .select(col("id"), col("e.band"), col("e.bh"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** MinHash-LSH near-dup pairs, exact-verified: candidates from banding,
    * then true Jaccard (computed on the candidates only) ≥ threshold.
    * At 16 bands × 4 rows the miss probability for a pair at j=0.8 is
    * (1-0.8⁴)¹⁶ ≈ 2·10⁻⁴ and vanishes for the near-identical pairs real
    * corpora dedup targets. */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    val sh = shingleSet(df, idCol, textCol, cfg.shingleN).cache()
    val sigs = minHashSignatures(sh, cfg)
    val cand = lshCandidates(sigs, cfg)
    val card = sh.groupBy(col("id")).agg(count(lit(1)).as("card"))
    // exact verification restricted to candidate pairs
    val inter = cand.join(sh.as("a"), col("id_a") === col("a.id"))
      .join(sh.as("b"),
        col("id_b") === col("b.id") && col("a.sh") === col("b.sh"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(card.withColumnRenamed("id", "id_a").withColumnRenamed("card", "ca"), "id_a")
      .join(card.withColumnRenamed("id", "id_b").withColumnRenamed("card", "cb"), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("ca") + col("cb") - col("inter")), 6))
      .filter(col("jaccard") >= cfg.threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ------------------------------------------------------------ clustering

  /** Duplicate clusters from near-dup pairs: connected components by
    * min-label propagation PLUS per-round pointer jumping (path halving:
    * `cluster(id) ← cluster(cluster(id))` — labels only decrease, so the
    * jump is sound). Propagation alone advances the minimum one hop per
    * round (O(diameter)); the jump makes chains collapse in O(log
    * diameter) rounds, so pathological long chains converge too, not just
    * the small cliques near-dup graphs usually form (pinned by the
    * 200-node chain spec). Each round = the edges ⋈ labels join + min
    * aggregation + one labels self-join. Throws if convergence is not
    * reached within `maxIters` — silently returning split components
    * would corrupt downstream dedup.
    * The canonical "keep one per cluster" reduction after any
    * pair-producing dedup ([[jaccardPairs]], [[minHashLshPairs]],
    * [[simHashPairs]], [[Ann.cosinePairs]]).
    * Output: (id, cluster) where cluster = min id in the component;
    * only ids that appear in some pair are clustered.
    */
  def clusters(pairs: DataFrame, idACol: String = "id_a", idBCol: String = "id_b",
      maxIters: Int = 20): DataFrame = {
    val fwd = pairs.select(col(idACol).as("src"), col(idBCol).as("dst"))
    val edges = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    // localCheckpoint each round: iterative self-joins double the LOGICAL
    // plan per iteration (caching short-circuits execution but not
    // analysis), so without lineage truncation planning time explodes
    // exponentially after ~12 rounds
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id")).localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      iter += 1
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst2"), col("dst") === col("dst2"))
        .groupBy(col("src")).agg(min(col("cluster")).as("nmin"))
      // materialized: the pointer-jump self-join below would otherwise
      // execute this edges⋈labels subtree twice (once per join side)
      val propagated = labels
        .join(neighborMin.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
        .localCheckpoint(true)
      // pointer jump: follow the label one step (cluster ids are node ids,
      // so the lookup is a labels self-join) and keep the smaller label
      val jumped = propagated.as("a")
        .join(propagated.select(col("id").as("jid"), col("cluster").as("jcluster")),
          col("a.cluster") === col("jid"), "left")
      val next = jumped
        .select(col("a.id").as("id"),
          least(col("a.cluster"), coalesce(col("jcluster"), col("a.cluster"))).as("cluster"))
        .localCheckpoint(true)
      converged = next.join(labels.withColumnRenamed("cluster", "old"), "id")
        .filter(col("cluster") < col("old")).isEmpty
      labels = next
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"clusters() did not converge within $maxIters iterations — " +
          "component diameter exceeds maxIters; raise it")
    labels
  }

  // ------------------------------------------------------------ simhash

  /** 60-bit SimHash per doc over tf-weighted token hashes ([[portableHash]]
    * → engine-portable fingerprints). bit_j(doc) = [Σ_tokens tf·(2·bit_j(h)−1) > 0].
    *
    * Two formulations, identical output (pinned by OperatorsSpec):
    * `perRow = true` (default) collects each doc's distinct (tf, h) pairs
    * and computes all 60 bit-sums in one projection — no ×60 row explode
    * and two fewer shuffles, the same trade
    * [[MinHashConfig.perRowSignatures]] makes (flip for pathological
    * ≫10^5-distinct-token documents). `perRow = false` is the
    * explode→groupBy(id, j) formulation, whose per-group state is
    * constant-size. */
  def simHash(df: DataFrame, idCol: String, textCol: String,
      perRow: Boolean = true): DataFrame = {
    val tf = df.select(col(idCol).as("id"),
        explode(tokens(normalize(col(textCol)))).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
      .withColumn("h", portableHash(col("tok")))
    if (perRow)
      tf.groupBy(col("id"))
        .agg(collect_list(struct(col("tf"), col("h"))).as("th"))
        .select(col("id"), expr(
          // same arithmetic as the explode path, term for term
          """aggregate(sequence(0, 59), 0L, (acc, j) -> acc +
            |  IF(aggregate(th, 0L,
            |       (s, t) -> s + t.tf * (shiftright(t.h, j) % 2 * 2 - 1)) > 0,
            |     shiftleft(1L, j), 0L))""".stripMargin).as("simhash"))
    else
      tf.select(col("id"), col("tf"), col("h"),
          explode(sequence(lit(0), lit(59))).as("j"))
        .withColumn("c", col("tf") * (expr("shiftright(h, j)") % 2 * 2 - 1))
        .groupBy(col("id"), col("j"))
        .agg(sum(col("c")).as("s"))
        .groupBy(col("id"))
        .agg(sum(when(col("s") > 0, expr("shiftleft(1L, j)"))
          .otherwise(lit(0L))).as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxDist, blocked on
    * 4 × 15-bit bands (a pair within distance ≤ 3 shares ≥ 1 intact band —
    * pigeonhole), so the join is band-bucketed, not all-pairs. */
  def simHashPairs(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    val bands = 4
    // pigeonhole soundness: a pair within distance d shares an intact band
    // only when d < bands — beyond that the blocking silently loses pairs
    require(maxDist < bands,
      s"simHashPairs blocking is exact only for maxDist < $bands (got $maxDist)")
    val width = 15
    val banded = hashes.select(col("id"), col("simhash"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bh", expr(s"shiftright(simhash, band * $width) % ${1L << width}"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // ------------------------------------------------------------ paragraphs

  /** Corpus-level exact SPAN dedup (the C4 / CCNet / RefinedWeb
    * paragraph-dedup shape): split every document into fixed
    * `chunkTokens`-token spans, keep each distinct span's FIRST corpus
    * occurrence (ordered by (id, span position)), drop later repeats, and
    * reassemble each document from its surviving spans. This removes
    * boilerplate repeated ACROSS documents — finer-grained than whole-doc
    * dedup ([[exact]]) and complementary to near-dup ([[minHashLsh]]).
    *
    * Output: (id, n_paras, n_kept, text_kept) — one row per input doc,
    * docs whose every span was seen earlier included with n_kept = 0.
    *
    * Scale shape (pinned by PipelineOpsSpec): exactly TWO exchanges, both
    * unavoidable for a global first-occurrence rule — (1) spans shuffle
    * by their 128-bit md5 (16-byte digest moves, not the span text, in
    * the window's partitioning) for the min-(id,pos) resolution, (2) the
    * surviving spans shuffle back by doc id for reassembly. No join: the
    * kept flag rides the span row, so one groupBy emits counts and
    * reassembled text together. At 10^10 spans the digest shuffle is the
    * cost floor of ANY exact corpus-wide rule; per-partition state is one
    * min struct per distinct span. */
  def paragraphDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", chunkTokens: Int = 20): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1 (got $chunkTokens)")
    // null text reads as empty: the doc still emits its (empty) span row,
    // honoring the one-row-per-input-doc contract — split(null) would
    // posexplode to zero rows and silently drop the document
    val toks = split(coalesce(col(textCol), lit("")), " ")
    // ceil(n/k) spans; empty/short docs still yield their single span
    val nChunks = greatest(
      ceil(size(toks).cast("double") / chunkTokens).cast("int"), lit(1))
    val spans = docs.select(col(idCol).as("id"),
      posexplode(transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(toks, i * chunkTokens + 1, lit(chunkTokens)), " ")))
        .as(Seq("para_idx", "para")))
    val me = struct(col("id"), col("para_idx"))
    val marked = spans
      .withColumn("kept",
        // min over the digest partition = global first occurrence; an
        // unordered window aggregate, so no per-partition sort
        me === min(me).over(Window.partitionBy(md5(col("para")))))
    marked.groupBy(col("id"))
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        // collect_list skips nulls: only surviving spans ride into the
        // sort-by-position reassembly
        array_join(transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("para_idx"), col("para"))))),
          s => s("para")), " ").as("text_kept"))
  }
}
