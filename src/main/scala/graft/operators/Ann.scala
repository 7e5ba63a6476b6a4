package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Baseline: exact brute-force cosine top-k (quadratic — the correctness
  * oracle and fine up to ~10⁵ vectors per partition-pair). Scale path:
  * random-hyperplane LSH bucketing — vectors are hashed to sign-pattern
  * buckets, the quadratic join runs only within buckets, and multiple
  * independent tables recover recall. All arithmetic in double with a fixed
  * fold order so results are deterministic and engine-comparable.
  *
  * The reference has no vector ops (nearest: opentsdb numeric series,
  * `opentsdbreader/`); this module is the training-pipeline extension.
  */
object Ann {

  /** id + embedding (cast to double) + precomputed L2 norm.
    * Uses the native codegen'd [[graft.functions.L2Norm]] — identical
    * left-to-right fold as the declarative `aggregate` formulation and the
    * DuckDB oracle, minus the interpreted lambda dispatch per element. */
  private def prep(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(
      col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("norm", expr("graft_norm(v)"))
  }

  private def dot = expr("graft_dot(a.v, b.v)")

  /** Exact cosine top-k per vector (self excluded). Output:
    * (id, rank, neighbor_id, cos) with cos rounded to 6 dp; ties broken by
    * neighbor id ascending. At scale, shard the cross join by blocking
    * ([[lshTopK]]) — this operator is the small-N / verification path. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val p = prep(df, idCol, vecCol)
    val pairs = p.as("a").join(p.as("b"), col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id"), col("b.id").as("neighbor_id"),
        (dot / (col("a.norm") * col("b.norm"))).as("cos"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cos"))
  }

  /** Broadcast-side exact kNN — same results as [[bruteForceTopK]]
    * (asserted in OperatorsSpec), ~20× faster: the corpus (id, vector,
    * norm) is broadcast to every task (the classic map-side brute force —
    * fine while the corpus fits in executor memory; beyond that, block via
    * [[lshTopK]]/[[ivfTopK]]), and each partition scores its queries with
    * primitive-array loops instead of interpreted `aggregate`/`zip_with`
    * expression trees. Arithmetic is the same left-to-right double fold,
    * so cosines are bitwise identical to the declarative form and the
    * DuckDB oracle.
    *
    * Scale guard: the corpus is `collect()`ed to the driver, which is only
    * safe while it fits in driver memory. Corpora above `maxDriverRows`
    * fall back to [[ivfTopK]] (bucketed, never driver-resident) instead of
    * OOMing the driver — the caller keeps one entry point that is exact
    * when exactness is affordable and approximate past the memory cliff. */
  def bruteForceTopKFast(df: DataFrame, idCol: String, vecCol: String, k: Int,
      maxDriverRows: Long = 2000000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    if (df.limit(math.min(maxDriverRows + 1, Int.MaxValue).toInt).count() > maxDriverRows)
      return ivfTopK(df, idCol, vecCol, k)
    // the fast path encodes ids as Long; non-integral id columns get the
    // (identical-result) declarative path instead of a runtime crash
    val integral = df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    if (!integral) return bruteForceTopK(df, idCol, vecCol, k)
    val p = df.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .as[(Long, Array[Double])]
    def norm(v: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val corpus = p.collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(corpus.map { case (id, v) => (id, v, norm(v)) })
    p.mapPartitions { iter =>
      val all = bc.value
      iter.flatMap { case (qid, qv) =>
        val qn = norm(qv)
        // bounded selection: keep the k best by (cos desc, id asc)
        val bestCos = new Array[Double](k)
        val bestId = new Array[Long](k)
        var size = 0
        var j = 0
        while (j < all.length) {
          val (cid, cv, cn) = all(j)
          if (cid != qid) {
            var dot = 0.0; var i = 0
            while (i < cv.length) { dot += qv(i) * cv(i); i += 1 }
            val cos = dot / (qn * cn)
            // Double.compare, not >: SQL DESC ordering ranks NaN greatest
            // (a zero-norm vector yields NaN cosine), and the fast path
            // must match the declarative ranking exactly
            def beats(c: Double, id: Long, pos: Int): Boolean = {
              val cmp = java.lang.Double.compare(c, bestCos(pos))
              cmp > 0 || (cmp == 0 && id < bestId(pos))
            }
            if (size < k || beats(cos, cid, size - 1)) {
              var pos = if (size < k) size else k - 1
              while (pos > 0 && beats(cos, cid, pos - 1)) {
                bestCos(pos) = bestCos(pos - 1); bestId(pos) = bestId(pos - 1); pos -= 1
              }
              bestCos(pos) = cos; bestId(pos) = cid
              if (size < k) size += 1
            }
          }
          j += 1
        }
        (0 until size).map(r => (qid, r + 1, bestId(r), bestCos(r)))
      }
    }.toDF("id", "rank", "neighbor_id", "cos")
      .withColumn("cos", round(col("cos"), 6))
  }

  /** Deterministic pseudo-random hyperplane vector for (table, plane):
    * per-dim components uniform in [-1, 1) from md5 — no RNG, reproducible
    * across runs. Materialized driver-side as a literal array so the
    * per-row projection is one codegen'd `graft_dot` loop instead of an
    * interpreted zip_with/aggregate pair. */
  private def planeVec(table: Int, plane: Int, dims: Int): Array[Double] =
    (0 until dims).map { d =>
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${table}_${plane}_$d".getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(digest.take(8).map("%02x".format(_)).mkString.take(15), 16)
      (h % 2000L).toDouble / 1000.0d - 1.0d
    }.toArray

  /** LSH bucket code for one table: sign bits of `planes` hyperplane dots. */
  private def bucketCode(table: Int, planes: Int, dims: Int) = {
    val codes = (0 until planes).map { pl =>
      // plane vector as a literal SQL array — foldable, so the analyzed
      // plan carries one constant array per (table, plane)
      val w = planeVec(table, pl, dims)
        .map(x => s"CAST('$x' AS DOUBLE)").mkString("array(", ",", ")")
      val proj = expr(s"graft_dot(v, $w)")
      when(proj >= 0, lit(1)).otherwise(lit(0)) * lit(1 << pl)
    }
    codes.reduce(_ + _)
  }

  private def vecDims(p: DataFrame): Int =
    p.select(size(col("v"))).head().getInt(0)

  /** ANN top-k via random-hyperplane LSH: `tables` independent bucketings
    * of `planes` bits each; candidate pairs share a bucket in ≥1 table;
    * exact cosine + rank within candidates. Recall < 1 by construction —
    * the scale/latency trade; verify against [[bruteForceTopK]] on samples.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      planes: Int = 4, tables: Int = 8): DataFrame = {
    val p = prep(df, idCol, vecCol).cache()
    val dims = vecDims(p)
    // cached: the self-join would otherwise recompute every hyperplane
    // projection for both sides
    val buckets = (0 until tables).map { t =>
      p.select(col("id"), col("v"), col("norm"),
        lit(t).as("tbl"), bucketCode(t, planes, dims).as("bkt"))
    }.reduce(_.unionByName(_)).cache()
    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bkt") === col("b.bkt") &&
          col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id"), col("b.id").as("neighbor_id"),
        (dot / (col("a.norm") * col("b.norm"))).as("cos"))
      .groupBy(col("id"), col("neighbor_id"))
      .agg(first(col("cos")).as("cos"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val out = cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cos"))
      .cache()
    // materialize the (small, ≤ n·k rows) result so the big intermediate
    // caches can be dropped now instead of leaking across calls
    out.count()
    p.unpersist(); buckets.unpersist()
    out
  }

  /** Embedding-cosine near-duplicate pairs: all (id_a < id_b) with cosine ≥
    * `threshold`. Exact all-pairs — the correctness baseline and the oracle
    * for the LSH-blocked variant; at corpus scale run [[lshCosinePairs]].
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val p = prep(df, idCol, vecCol)
    p.as("a").join(p.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (dot / (col("a.norm") * col("b.norm"))).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** LSH-blocked cosine near-dup pairs: candidates share a random-hyperplane
    * bucket in ≥1 of `tables` tables; exact cosine computed on candidates
    * only, then thresholded. Same output shape as [[cosinePairs]]; recall
    * (vs exact) rises with `tables` and falls with `threshold` distance. */
  def lshCosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 4, tables: Int = 8): DataFrame = {
    val p = prep(df, idCol, vecCol).cache()
    val dims = vecDims(p)
    val buckets = (0 until tables).map { t =>
      p.select(col("id"), col("v"), col("norm"),
        lit(t).as("tbl"), bucketCode(t, planes, dims).as("bkt"))
    }.reduce(_.unionByName(_)).cache()
    val out = buckets.as("a").join(buckets.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bkt") === col("b.bkt") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (dot / (col("a.norm") * col("b.norm"))).as("cos"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("cos")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .cache()
    out.count() // see lshTopK: free the big caches eagerly
    p.unpersist(); buckets.unpersist()
    out
  }

  /** Lloyd's k-means over the embedding column — trains the IVF coarse
    * quantizer ([[ivfTopK]]'s `trainIters` > 0 path). Spark-first: each
    * iteration is one broadcast-join assignment pass (map-only over the
    * corpus) plus one `Summarizer.mean` aggregation per cluster on ML
    * vectors — no explode, no driver loop over rows. Deterministic
    * initialization (seeds = `nlist` vectors in xxhash64(id) order, a
    * cheap deterministic spread); empty clusters keep their previous
    * centroid. At the 100 TB scale train on a sample (`df.sample` or a
    * hash filter) — centroid quality needs only O(nlist × 10^3) points.
    * Output: (cid, cv, cnorm), the shape [[ivfTopK]] consumes. */
  def kMeansCentroids(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 3): DataFrame = {
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    import org.apache.spark.ml.stat.Summarizer
    val p = prep(df, idCol, vecCol).cache()
    var cents = p.orderBy(xxhash64(col("id")), col("id")).limit(nlist)
      .withColumn("cid", row_number().over(
        Window.orderBy(xxhash64(col("id")), col("id"))) - 1)
      .select(col("cid"), col("v").as("cv"), expr("graft_norm(v)").as("cnorm"))
      .localCheckpoint(true)
    val cdot = expr("graft_dot(v, cv)")
    (0 until iters).foreach { _ =>
      val assigned = p.join(broadcast(cents))
        .withColumn("crank", row_number().over(
          Window.partitionBy(col("id")).orderBy(
            (cdot / (col("norm") * col("cnorm"))).desc, col("cid").asc)))
        .filter(col("crank") === 1)
      val means = assigned.groupBy(col("cid"))
        .agg(Summarizer.mean(array_to_vector(col("v"))).as("mv"))
        .select(col("cid"), vector_to_array(col("mv")).as("nv"))
      cents = cents.join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("nv"), col("cv")).as("cv"))
        .withColumn("cnorm", expr("graft_norm(cv)"))
        .localCheckpoint(true) // truncate the per-iteration plan growth
    }
    p.unpersist()
    cents
  }

  /** IVF (inverted-file) ANN top-k — the classic scale path for dense
    * retrieval (coarse quantizer + per-list exact search):
    *
    *  1. coarse centroids: `trainIters` = 0 (default) uses the `nlist`
    *     smallest-id vectors — a deterministic stand-in whose output is
    *     stable across partitionings (what the driver oracle pins);
    *     `trainIters` > 0 runs [[kMeansCentroids]] Lloyd iterations for
    *     real list balance/recall (float summation order makes trained
    *     centroids partitioning-sensitive in the last ulps — fine for
    *     retrieval, not for bitwise-reproducibility gates);
    *  2. build: every vector is assigned to its nearest centroid
    *     (broadcast the centroid table — it is tiny — so assignment is a
    *     map-only pass, no shuffle of the corpus);
    *  3. query: each vector probes its `nProbe` nearest centroids and runs
    *     exact cosine against only those inverted lists.
    *
    * The candidate join is equi-join on `list_id` — a shuffle of corpus
    * rows grouped by list, each list small (corpus/nlist on average), so
    * the quadratic blow-up is bounded per list. Recall < 1 by construction
    * (asserted vs [[bruteForceTopK]] in AnnSpec).
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nProbe: Int = 4, trainIters: Int = 0): DataFrame = {
    val p = prep(df, idCol, vecCol)
    val cents =
      if (trainIters > 0) kMeansCentroids(df, idCol, vecCol, nlist, trainIters)
      else p.orderBy(col("id")).limit(nlist)
        .select(col("id").as("cid"), col("v").as("cv"), col("norm").as("cnorm"))
    val cdot = expr("graft_dot(v, cv)")
    // rank centroids per vector once; slot 1 = assignment, 1..nProbe = probes
    val ranked = p.join(broadcast(cents))
      .select(col("id"), col("v"), col("norm"), col("cid"),
        (cdot / (col("norm") * col("cnorm"))).as("ccos"))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("ccos").desc, col("cid").asc)))
    val lists = ranked.filter(col("crank") === 1) // inverted lists
      .select(col("cid").as("list_id"), col("id"), col("v"), col("norm"))
    val probes = ranked.filter(col("crank") <= nProbe)
      .select(col("id"), col("v"), col("norm"), col("cid").as("list_id"))
    val cand = probes.as("a").join(lists.as("b"),
        col("a.list_id") === col("b.list_id") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id"), col("b.id").as("neighbor_id"),
        (dot / (col("a.norm") * col("b.norm"))).as("cos"))
      .groupBy(col("id"), col("neighbor_id"))
      .agg(first(col("cos")).as("cos"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cos"))
  }

  /** Symmetric int8 quantization of an embedding column — the standard
    * 4× shrink before shipping vectors to an ANN index or a feature
    * store. Per vector: `scale = max|x| / 127`, `q_i = round(x_i/scale)`
    * (zero vectors quantize to all-zero, scale 0). Map-only, codegen'd
    * `transform`, no shuffle — a pure column pipeline at any scale.
    *
    * Every step is double-precision with a fixed operation order
    * (`round(x * 127 / max|x|)`) so quantized values are bitwise
    * reproducible in the DuckDB oracle (both engines round halves away
    * from zero). Adds: `scale` (double), `qvec` (array<int>). */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val maxAbs = array_max(transform(col(vecCol), x => abs(x))).cast("double")
    df.withColumn("__maxabs", maxAbs)
      .withColumn("scale", col("__maxabs") / 127.0d)
      .withColumn("qvec",
        when(col("__maxabs") === 0.0d,
          transform(col(vecCol), _ => lit(0)))
        .otherwise(transform(col(vecCol),
          x => round(x.cast("double") * 127.0d / col("__maxabs")).cast("int"))))
      .drop("__maxabs")
  }
}
