package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Decontam, Dedup, Sampling, Temporal, TextOps}

/** Semantics + plan-shape of the temporal/sampling/quantization/vocabulary
  * pipeline operators added in round 4. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def executed(df: DataFrame): String = {
    df.write.mode("overwrite").format("noop").save()
    df.queryExecution.executedPlan.toString
  }

  private def exchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).length

  // ------------------------------------------------------------ as-of join

  private lazy val trades = Seq(
    (1L, "k1", ts("2024-01-01 10:00:00"), 100.0),
    (2L, "k1", ts("2024-01-01 10:05:00"), 101.0),
    (3L, "k1", ts("2024-01-01 09:00:00"), 99.0), // before any quote
    (4L, "k2", ts("2024-01-01 10:00:00"), 200.0) // key with no quotes at all
  ).toDF("id", "k", "t", "px")

  private lazy val quotes = Seq(
    ("k1", ts("2024-01-01 09:30:00"), 10L),
    ("k1", ts("2024-01-01 10:00:00"), 20L), // equal ts: inclusive match
    ("k1", ts("2024-01-01 10:04:00"), 30L)
  ).toDF("k", "t", "q")

  test("asofJoin: inclusive most-recent-past match, left outer on misses") {
    val got = Temporal.asofJoin(trades, quotes, Seq("k"), "t", Seq("q"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got === Array(
      (1L, Some(20L)), // 10:00 matches the equal-ts quote (inclusive)
      (2L, Some(30L)), // 10:05 matches 10:04
      (3L, None),      // 09:00 predates every quote
      (4L, None)))     // no quotes for k2
  }

  test("asofJoin matches a per-row scan of the right side (property)") {
    // randomized-but-deterministic inputs; oracle = filter + max per row
    val left = (1 to 200).map(i =>
      (i.toLong, s"k${i % 7}", ts(f"2024-01-01 ${i % 24}%02d:${(i * 13) % 60}%02d:00")))
      .toDF("id", "k", "t")
    val right = (1 to 60).map(j =>
      (s"k${j % 7}", ts(f"2024-01-01 ${(j * 5) % 24}%02d:${(j * 29) % 60}%02d:00"), j.toLong))
      .distinct.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      .toDF("k", "t", "v")
    val got = Temporal.asofJoin(left, right, Seq("k"), "t", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    val rs = right.collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    left.collect().foreach { l =>
      val (id, k, t) = (l.getLong(0), l.getString(1), l.getTimestamp(2))
      val want = rs.filter(r => r._1 == k && !r._2.after(t))
        .sortBy(r => (r._2.getTime, r._3)).lastOption.map(_._3)
      assert(got(id) === want, s"id=$id k=$k t=$t")
    }
  }

  test("asofJoin plans exactly one exchange (union + single window pass)") {
    val plan = executed(Temporal.asofJoin(trades, quotes, Seq("k"), "t", Seq("q")))
    assert(exchanges(plan) === 1, s"expected 1 exchange:\n$plan")
  }

  // ------------------------------------------------------------ sessionize

  test("sessionize: strict gap split, per-key numbering, deterministic ties") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 10L, ts("2024-01-01 10:20:00"), 2.0), // 20 min ≤ 30 → same session
      (3L, 10L, ts("2024-01-01 10:50:00"), 3.0), // exactly 30 min → NOT > gap
      (4L, 10L, ts("2024-01-01 11:25:00"), 4.0), // 35 min → new session
      (5L, 20L, ts("2024-01-01 10:00:00"), 5.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val s = Temporal.sessionize(ev, "user_id", "ts", "event_id",
      gapMicros = 30L * 60 * 1000000)
    val idx = s.orderBy("event_id").collect().map(_.getAs[Long]("session_idx"))
    assert(idx === Array(1L, 1L, 1L, 2L, 1L))
    val stats = Temporal.sessionStats(s, "user_id", "ts", "value")
      .orderBy("user_id", "session_idx").collect()
    assert(stats.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5))) ===
      Array((10L, 1L, 3L, 600L), (10L, 2L, 1L, 400L), (20L, 1L, 1L, 500L)))
    assert(stats(0).getAs[Timestamp]("start_ts") === ts("2024-01-01 10:00:00"))
    assert(stats(0).getAs[Timestamp]("end_ts") === ts("2024-01-01 10:50:00"))
  }

  test("sessionize + sessionStats share ONE exchange (window feeds the agg)") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val q = Temporal.sessionStats(
      Temporal.sessionize(ev, "user_id", "ts", "event_id", 1800000000L),
      "user_id", "ts", "value")
    val plan = executed(q)
    assert(exchanges(plan) === 1,
      s"groupBy(user_id, session_idx) must reuse the window partitioning:\n$plan")
  }

  // ------------------------------------------------------------ sampling

  private lazy val corpus = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("stratified sample is deterministic and repartition-invariant") {
    val a = Sampling.stratified(corpus, "doc_id", "lang",
      Map("en" -> 50), defaultPct = 20).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    val b = Sampling.stratified(corpus.repartition(7), "doc_id", "lang",
      Map("en" -> 50), defaultPct = 20).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(a.nonEmpty && a.length < corpus.count())
    assert(a === b, "sample must not depend on physical layout")
    // rate is enforced per stratum (uniform hash ⇒ loose band check)
    val en = corpus.filter($"lang" === "en").count().toDouble
    val enKept = Sampling.stratified(corpus, "doc_id", "lang",
      Map("en" -> 50), defaultPct = 20)
      .filter($"lang" === "en").count().toDouble
    assert(enKept / en > 0.25 && enKept / en < 0.75, s"en rate ${enKept / en}")
  }

  test("stratified sampling keys are consistent across tables (same id ⇒ same verdict)") {
    val ids = corpus.select($"doc_id", $"lang")
    val other = corpus.select($"doc_id", $"lang", lit("x").as("extra"))
    val a = Sampling.stratified(ids, "doc_id", "lang", Map(), 30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratified(other, "doc_id", "lang", Map(), 30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("topNPerStratum: exact quota, deterministic rank order") {
    val got = Sampling.topNPerStratum(corpus, "doc_id", "source", n = 5)
    val perGroup = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = corpus.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (src, n) =>
      assert(perGroup(src) === math.min(5L, n), s"quota broken for $src")
    }
    val again = Sampling.topNPerStratum(corpus.repartition(5), "doc_id", "source", 5)
      .select("doc_id", "sample_rank").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val first = got.select("doc_id", "sample_rank").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(first === again)
  }

  // ------------------------------------------------------------ quantization

  test("quantizeInt8: max maps to ±127, zero vector to zeros, bounded error") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f)),
      (3L, Array(3.0f))
    ).toDF("vec_id", "embedding")
    val q = Ann.quantizeInt8(df, "embedding").orderBy("vec_id").collect()
    assert(q(0).getAs[Seq[Int]]("qvec") === Seq(64, -127, 32)) // 0.5/1*127=63.5 → 64
    assert(q(1).getAs[Seq[Int]]("qvec") === Seq(0, 0))
    assert(q(1).getAs[Double]("scale") === 0.0)
    assert(q(2).getAs[Seq[Int]]("qvec") === Seq(127))
    // reconstruction error ≤ scale/2 on every component
    val r0 = q(0).getAs[Double]("scale")
    Seq(0.5, -1.0, 0.25).zip(q(0).getAs[Seq[Int]]("qvec")).foreach { case (x, qi) =>
      assert(math.abs(qi * r0 - x) <= r0 / 2 + 1e-12)
    }
  }

  test("quantizeInt8 stays in [-127, 127] over the real embeddings") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bad = Ann.quantizeInt8(embs, "embedding")
      .select(explode($"qvec").as("q")).filter(abs($"q") > 127).count()
    assert(bad === 0L)
  }

  test("sessionStatsStream (native session_window) matches batch sessionize off-boundary") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val stream = input.toDF().toDF("user_id", "ts", "value")
    val q = Temporal.sessionStatsStream(stream, "user_id", "ts", "value",
        gap = "30 minutes", watermark = "0 seconds")
      .writeStream.outputMode("complete").format("memory")
      .queryName("sess_stream").start()
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:10:00"), 2.0), // 10 min < 30 → same session
      (1L, ts("2024-01-01 10:50:00"), 3.0), // 40 min > 30 → new session
      (2L, ts("2024-01-01 10:00:00"), 4.0))
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess_stream")
      .select("user_id", "n_events", "end_ts", "value_cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    val batch = Temporal.sessionStats(
        Temporal.sessionize(rows.toDF("user_id", "ts", "value"),
          "user_id", "ts", "ts", gapMicros = 30L * 60 * 1000000),
        "user_id", "ts", "value")
      .select("user_id", "n_events", "end_ts", "value_cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    assert(streamed === batch)
    assert(streamed === Set(
      (1L, 2L, ts("2024-01-01 10:10:00"), 300L),
      (1L, 1L, ts("2024-01-01 10:50:00"), 300L),
      (2L, 1L, ts("2024-01-01 10:00:00"), 400L)))
  }

  // ------------------------------------------------------------ packing

  test("packSequences: contiguous layout, boundary spill, shard independence") {
    val d = Seq(
      ("s1", 1L, 100L), ("s1", 2L, 100L), ("s1", 3L, 100L),
      ("s2", 9L, 300L), ("s2", 10L, 10L)
    ).toDF("shard", "id", "n_tokens")
    val got = TextOps.packSequences(d, "id", "n_tokens", "shard", budget = 256L)
      .orderBy("shard", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(got === Array(
      ("s1", 1L, 0L, 0L), ("s1", 2L, 0L, 100L), ("s1", 3L, 0L, 200L),
      ("s2", 9L, 0L, 0L), ("s2", 10L, 1L, 44L))) // 300 spills 44 into pack 1
  }

  test("packSequences plans one exchange and conserves the token stream") {
    val docs = corpus.select($"doc_id", $"source",
      size(split($"text", " ")).cast("long").as("n_tokens"))
    val q = TextOps.packSequences(docs, "doc_id", "n_tokens", "source", 256L)
    assert(exchanges(executed(q)) === 1)
    // offset of each doc = cumulative tokens before it, mod budget
    val rows = q.orderBy("source", "doc_id").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (_, ds) =>
      var cum = 0L
      ds.foreach { case (_, n, packId, off) =>
        assert(packId === cum / 256 && off === cum % 256)
        cum += n
      }
    }
  }

  // ------------------------------------------------------------ mixture

  test("mixture: binding source keeps all rows, others downsample, deterministic") {
    val d = (1 to 40).map(i => (i.toLong, if (i <= 8) "a" else "b", s"t$i"))
      .toDF("doc_id", "source", "text")
    // a: 8 rows w=1 → n/w=8; b: 32 rows w=1 → 32 ⇒ K=8, b keeps at 0.25
    val got = Sampling.mixture(d, "doc_id", "source", Map("a" -> 1.0, "b" -> 1.0))
      .select("doc_id", "source").collect()
    assert(got.count(_.getString(1) == "a") === 8) // binding source intact
    val bKept = got.count(_.getString(1) == "b")
    assert(bKept > 0 && bKept < 32)
    val again = Sampling.mixture(d.repartition(7), "doc_id", "source",
        Map("a" -> 1.0, "b" -> 1.0))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(again === got.map(_.getLong(0)).sorted)
  }

  test("mixture pins the binding source threshold (FP boundary regression)") {
    // id 819186: md5('graft819186') mod 10^6 == 999999 — the maximal
    // sampling key. n=2, w=0.09 makes (n/w)*w/n round-trip to
    // 0.9999999999999999, so an unpinned threshold floors to 999999 and
    // silently drops this binding-source row.
    val d = (Seq((819186L, "a"), (819187L, "a")) ++
      (1 to 30).map(i => (i.toLong, "b"))).toDF("doc_id", "source")
    val kept = Sampling.mixture(d, "doc_id", "source",
        Map("a" -> 0.09, "b" -> 0.91))
      .filter($"source" === "a").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(819186L, 819187L))
  }

  test("mixture: a weights key absent from the corpus is ignored (documented)") {
    val d = (1 to 20).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "source")
    val kept = Sampling.mixture(d, "doc_id", "source",
      Map("a" -> 1.0, "b" -> 1.0, "ghost" -> 1.0))
    assert(kept.filter($"source" === "ghost").count() === 0)
    assert(kept.count() > 0) // present sources still balance among themselves
  }

  test("mixture plans a broadcast join and never shuffles the corpus") {
    val w = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    val q = Sampling.mixture(corpus, "doc_id", "source", w)
    val plan = executed(q)
    assert(plan.contains("BroadcastHashJoin"))
    assert(exchanges(plan) === 1) // only the tiny per-source count agg
    val n = corpus.filter($"source".isin(w.keys.toSeq: _*))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = q.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet.subsetOf(w.keySet)) // unlisted sources dropped
    val binding = n.keys.minBy(s => n(s) / w(s))
    assert(kept(binding) === n(binding))
  }

  // ------------------------------------------------------------ redaction

  test("piiStats: exact counts, email digits not double-counted") {
    val d = Seq(
      (1L, "write to Bob@Example.com or 12345678 now"),
      (2L, "a1@b2.org has digits, outside 9999999 too"),
      (3L, "clean text 123 456")
    ).toDF("doc_id", "text")
    val got = TextOps.piiStats(d, "text").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(got === Array(
      (1L, 1, 1, "write to <EMAIL> or <NUM> now"),
      (2L, 1, 1, "<EMAIL> has digits, outside <NUM> too"),
      (3L, 0, 0, "clean text 123 456")))
  }

  test("piiStats is map-only (no exchange)") {
    assert(exchanges(executed(TextOps.piiStats(corpus, "text")
      .select("doc_id", "n_emails", "n_longnums", "redacted"))) === 0)
  }

  // ------------------------------------------------------------ decontam

  test("contamination: overlap fractions, zero-hit docs kept, flag threshold") {
    val train = Seq(
      (1L, "a b c d e"),   // shingles {abc,bcd,cde}; hits: abc,bcd → 2/3
      (2L, "x y z w"),     // {xyz,yzw}; 0 hits
      (3L, "a b c d")      // {abc,bcd}; 2/2 → contaminated
    ).toDF("doc_id", "text")
    val bench = Seq("a b c d q").toDF("text") // bench shingles {abc,bcd,cdq}
    val got = Decontam.contamination(train, bench, "doc_id", "text", "text",
        n = 3, threshold = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(got === Array(
      (1L, 3L, 2L, 0.666667, true),
      (2L, 2L, 0L, 0.0, false),
      (3L, 2L, 2L, 1.0, true)))
  }

  test("contamination broadcasts the bench side and aggregates once") {
    val bench = corpus.filter($"doc_id" % 37 === 0)
    val q = Decontam.contamination(corpus.filter($"doc_id" % 37 =!= 0),
      bench, "doc_id", "text", "text")
    val plan = executed(q)
    assert(plan.contains("BroadcastHashJoin"))
    // bench-side distinct (small) + per-doc aggregation; the corpus text
    // itself is never shuffled — the join side it rides is broadcast
    assert(exchanges(plan) === 2)
  }

  // ------------------------------------------------------------ chunking

  test("chunkTokens: stride windows, short tail, one chunk for short docs") {
    val d = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "a b"))
      .toDF("doc_id", "text")
    val got = TextOps.chunkTokens(d, "doc_id", "text", size = 4, stride = 2)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getString(3), r.getInt(4)))
    assert(got === Array(
      (1L, 0, "t1 t2 t3 t4", 4), (1L, 1, "t3 t4 t5 t6", 4),
      (1L, 2, "t5 t6 t7 t8", 4), (1L, 3, "t7 t8 t9 t10", 4),
      (2L, 0, "a b", 2)))
    // every token position is covered by at least one chunk
    val covered = TextOps.chunkTokens(d, "doc_id", "text", 4, 2)
      .groupBy("doc_id").agg(sum($"chunk_tokens").as("s")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(covered(1L) >= 10 && covered(2L) >= 2)
  }

  test("chunkTokens is map-only (no exchange)") {
    val q = TextOps.chunkTokens(corpus.select($"doc_id", $"text"),
      "doc_id", "text", 64, 32)
    assert(exchanges(executed(q)) === 0)
  }

  // ------------------------------------------------------------ repetition

  test("repetitionStats: duplicate-token and top-bigram fractions") {
    val d = Seq((1L, "a a a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val got = TextOps.repetitionStats(d, "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    // doc 1: 2 distinct / 4 tokens → dup 0.5; bigrams [a a, a a, a b] → top 2/3
    assert(got === Array((1L, 0.5, 0.666667), (2L, 0.0, 0.333333)))
  }

  test("repetitionStats is map-only (no exchange)") {
    assert(exchanges(executed(TextOps.repetitionStats(corpus, "text")
      .select("doc_id", "dup_token_frac", "top_bigram_frac"))) === 0)
  }

  // ------------------------------------------------------------ vocabulary

  test("topNgrams: exact counts and deterministic tie order") {
    val docs = Seq("a b a b c", "b c", "Z").toDF("text")
    val got = TextOps.topNgrams(docs, "text", n = 2, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // bigrams: "a b"×2, "b a"×1, "b c"×2 (one per doc), "z"×1 (short doc)
    assert(got === Array(("a b", 2L, 1), ("b c", 2L, 2), ("b a", 1L, 3)))
  }

  // ------------------------------------------- corpus_prep_v3 composition

  test("v3 composition (decontam→mixture→redact→chunk→pack) plan shape") {
    import graft.operators.{Decontam, Sampling}
    val docs = (0 until 200).map(i => (i.toLong, s"src${i % 3}",
      s"the quick brown fox $i jumps over the lazy dog number ${i * 7} end"))
      .toDF("doc_id", "source", "text")
    val corpus = docs.filter(col("doc_id") % 37 =!= 0)
    val bench = docs.filter(col("doc_id") % 37 === 0)
    val contaminated = Decontam
      .contamination(corpus, bench, "doc_id", "text", "text", 3, 0.5)
      .filter(col("contaminated")).select("doc_id")
    val clean = corpus.join(contaminated, Seq("doc_id"), "left_anti")
    val mixed = Sampling.mixture(clean, "doc_id", "source",
      Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
    val redacted = mixed.withColumn("text", TextOps.redactPii(col("text")))
    val chunks = TextOps.chunkTokens(
        redacted.select("doc_id", "source", "text"),
        "doc_id", "text", size = 8, stride = 4)
      .withColumn("chunk_key", col("doc_id") * lit(100000L) + col("chunk_idx"))
    val packed = TextOps.packSequences(
      chunks, "chunk_key", "chunk_tokens", "source", budget = 16L)
    val plan = executed(packed)
    // every join in the composition broadcasts (bench shingles, the
    // contaminated-id set, the per-source mixture thresholds) — the
    // corpus itself is NEVER shuffled by a join at any scale
    assert("SortMergeJoin".r.findAllIn(plan).isEmpty,
      s"corpus-shuffling join crept in:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).length === 5)
    // the single-partition exchange is the mixture's min-over-() on the
    // per-source COUNT frame (≤ |sources| rows) — never corpus data
    assert("Exchange SinglePartition".r.findAllIn(plan).length === 1)
    // 6 hash exchanges total: decontam's two shingle aggs + its id-set
    // agg, the mixture count agg, and the per-shard packing window's —
    // all keyed aggregations, none avoidable without losing a stage
    assert(exchanges(plan) === 6, s"exchange count drifted:\n$plan")
  }

  test("topNgrams top-k is distributed (TakeOrderedAndProject, no global Window sort)") {
    val docs = Seq("a b a b c", "b c", "Z").toDF("text")
    val q = TextOps.topNgrams(docs, "text", n = 2, k = 3)
    val plan = executed(q)
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a distributed TakeOrderedAndProject top-k:\n$plan")
    // the only Window is the O(k) rank over the ≤k survivors, which must sit
    // ABOVE the TakeOrderedAndProject — i.e. no unbounded single-partition
    // sort of all distinct n-grams feeds a Window
    val winIdx = plan.indexOf("Window")
    val topIdx = plan.indexOf("TakeOrderedAndProject")
    assert(winIdx < topIdx,
      s"rank Window must consume the top-k output, not the full agg:\n$plan")
  }

  // ------------------------------------------------------------ incremental dedup

  test("incremental dedup broadcasts the batch against the index (corpus never shuffles)") {
    val work = tmpDir("incplan")
    val mk = (ids: Seq[Long]) => ids.map(i => (i, s"txt $i one two three four"))
      .toDF("doc_id", "text")
    // seed the index with an arrival so the corpus join exists in batch 2
    graft.operators.IncrementalDedup.dedupeBatch(
      spark, s"$work/idx", mk(0L until 50L), 0L, "doc_id", "text")
    val dec2 = graft.operators.IncrementalDedup.dedupeBatch(
      spark, s"$work/idx", mk(100L until 120L), 1L, "doc_id", "text")
    // the decision frame is localCheckpointed — the executed plan of the
    // RUN is what matters; re-derive the corpus-join plan unmaterialized
    val sigs = graft.operators.IncrementalDedup.signatures(
      mk(100L until 120L), "doc_id", "text").withColumn("arrival", lit(1L))
    val bnd = graft.operators.IncrementalDedup.banded(
      sigs, graft.operators.Dedup.MinHashConfig())
    val idx = spark.read.parquet(s"$work/idx/bands").filter($"arrival" < 1L)
    val j = idx.as("i").join(broadcast(bnd.as("n")),
      $"i.band" === $"n.band" && $"i.bkey" === $"n.bkey")
    val plan = executed(j.select($"n.id"))
    assert(plan.contains("BroadcastHashJoin"),
      s"batch side must broadcast against the index scan:\n$plan")
    // the probe (index/corpus) side — printed between the join node and
    // the BroadcastExchange build side — must stream with no shuffle; the
    // exchanges inside the build subtree aggregate only the small batch
    val probe = plan.substring(plan.indexOf("BroadcastHashJoin"),
      plan.indexOf("BroadcastExchange"))
    assert(exchanges(probe) === 0,
      s"the index (corpus) side must stream with no shuffle:\n$plan")
    assert(probe.contains("PushedFilters: [IsNotNull(arrival), LessThan(arrival,1)"),
      s"the arrival guard must push into the index scan:\n$plan")
    assert(dec2.count() === 20L)
  }

  // ------------------------------------------------------- paragraph dedup

  test("paragraphDedup: keep-first across corpus, reassembly, empty survivors") {
    val docs = Seq(
      (0L, "a b c d e f"),       // both spans first occurrences
      (1L, "a b c x y z"),       // span 0 repeats doc 0's; span 1 unique
      (2L, "d e f a b c"),       // every span seen earlier -> nothing kept
      (3L, "x y z q")            // dup span + short 1-token tail span
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text", chunkTokens = 3)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (0L, 2L, 2L, "a b c d e f"),
      (1L, 2L, 1L, "x y z"),
      (2L, 2L, 0L, ""),
      (3L, 2L, 1L, "q")))
  }

  test("paragraphDedup is two exchanges (digest window + doc reassembly)") {
    val docs = Seq((0L, "a b c d e f"), (1L, "a b c x y z"))
      .toDF("doc_id", "text")
    val plan = executed(Dedup.paragraphDedup(docs, "doc_id", "text", 3))
    // the global first-occurrence rule costs exactly one digest-keyed
    // shuffle; reassembly one doc-keyed shuffle — no join, nothing else
    assert(exchanges(plan) === 2, s"expected exactly 2 exchanges:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"paragraphDedup must not plan a join:\n$plan")
  }
}
