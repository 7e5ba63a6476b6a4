package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for a large-scale training-data pipeline: token stats,
  * quality scoring, language ID, document fingerprinting.
  *
  * Everything here is pure Catalyst expressions (whole-stage codegen, no
  * UDFs) and — deliberately — restricted to the Spark∩DuckDB-expressible
  * dialect so each operator has an exact SQL oracle. Cross-engine hashing
  * uses [[portableHash]] (md5-based), never `xxhash64`/`hash` (engine
  * specific).
  *
  * The reference has no text analytics (its closest analogue is the
  * per-record transformer chain, `core/.../transformer/`); this module is
  * the training-pipeline extension the target engine needs.
  */
object TextOps {

  /** Whitespace tokens. Synthetic corpus is single-space separated; for
    * real corpora swap the delimiter regex — semantics are unchanged. */
  def tokens(text: Column): Column = split(text, " ")

  /** 60-bit portable hash: first 15 hex chars of md5, base-16 decoded.
    * Identical in DuckDB as `('0x' || substr(md5(x),1,15))::BIGINT` —
    * the cross-engine determinism anchor for minhash/simhash/fingerprints.
    */
  def portableHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Word n-gram shingles: n-token windows joined by a space.
    * `transform(sequence(...))` keeps it codegen-friendly; duplicate
    * shingles retained (dedup where the operator needs sets). */
  def shingles(toks: Column, n: Int): Column =
    transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))

  /** BPE-ish pre-tokenization (the GPT-2 pre-tokenizer shape): letter
    * runs, digit runs, and single punctuation marks, as one codegen'd
    * regex extraction. The character-class-only pattern has identical
    * semantics in Java regex and DuckDB's RE2 (oracle-expressible). */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))

  /** Canonical text normalization for fingerprinting: lower, trim,
    * collapse runs of whitespace. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Exact-content fingerprint (md5 of normalized text). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Polynomial rolling hash (Karp-Rabin) of the normalized text:
    * h = fold(chars, h*B + codepoint mod M), B=131, M=2^31-1. The
    * incremental-update fingerprint family real pipelines use for
    * streaming/windowed dedup; here the whole-document variant, with the
    * same left-to-right fold in the DuckDB oracle (list_reduce). */
  def rollingHash(text: Column): Column =
    aggregate(split(normalize(text), ""), lit(0L),
      (acc, c) => (acc * 131L + ascii(c)) % 2147483647L)

  /** Winnowing-style robust fingerprint: the minimum shingle hash — a
    * 1-permutation minhash; equal for any two docs sharing their minimal
    * shingle, cheap first-pass near-dup key. */
  def minShingleFingerprint(text: Column, n: Int): Column =
    array_min(transform(shingles(tokens(normalize(text)), n), s => portableHash(s)))

  /** Tiny per-language stopword lists for the n-gram/stopword language
    * heuristic. Deterministic, oracle-expressible. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "fr" -> Seq("le", "la", "les", "des", "une"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Count of tokens that appear in `words` (multiset count). */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Token/char statistics per document. Adds n_tokens, n_chars_calc,
    * avg_token_len, distinct_ratio. */
  def tokenStats(df: DataFrame, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    df.withColumn("n_tokens", size(t))
      .withColumn("n_chars_calc", length(col(textCol)))
      .withColumn("avg_token_len",
        (length(col(textCol)) - size(t) + 1).cast("double") / size(t))
      .withColumn("distinct_ratio",
        size(array_distinct(t)).cast("double") / size(t))
  }

  /** Quality score in [0,1]: blend of length band, lexical diversity and
    * stopword presence — the shape of a real quality filter, with a
    * deterministic closed form so the oracle is exact. */
  def qualityScore(textCol: Column): Column = {
    val t = tokens(textCol)
    val nTok = size(t).cast("double")
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val diversity = size(array_distinct(t)).cast("double") / nTok
    val stopHits = stopwordHits(t, Seq("the", "a")).cast("double")
    val stopScore = least(stopHits / lit(3.0), lit(1.0))
    round(lit(0.4) * lenScore + lit(0.4) * diversity + lit(0.2) * stopScore, 6)
  }

  /** Language ID by stopword voting: argmax over languages of the per-lang
    * stopword hit count; ties and zero evidence → "und" (undetermined).
    * Tie-break: deterministic by language code ascending. */
  def langId(textCol: Column): Column = {
    val t = tokens(textCol)
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(stopwordHits(t, words).as("hits"), lit(lang).as("lang"))
    }
    // max by (hits, then lang DESC) so that on hit-ties the FIRST lang code
    // alphabetically wins under max ⇒ compare (hits asc, lang desc)
    val best = scored.reduce { (a, b) =>
      when(b("hits") > a("hits"), b)
        .when(b("hits") === a("hits") && b("lang") < a("lang"), b)
        .otherwise(a)
    }
    when(best("hits") > 0, best("lang")).otherwise(lit("und"))
  }

  /** Token-budget sequence packing — the concatenate-and-split pass that
    * turns a document corpus into fixed-budget training sequences: within
    * each shard, documents are laid out in deterministic id order and the
    * running token offset assigns each document its pack (sequence) id and
    * byte-0 offset inside that pack. Documents straddling a boundary spill
    * into the next pack, exactly like a contiguous token stream split
    * every `budget` tokens.
    *
    * Sharded on purpose: the running sum is a window per `shardCol` (one
    * exchange, in-partition scan), so packing parallelizes across shards
    * instead of serializing the corpus through one global window — shards
    * pack independently, which is how distributed packing runs at 100 TB.
    * Integral arithmetic only (`div`/`pmod`), no float drift. Adds
    * `pack_id`, `pack_offset`. */
  def packSequences(df: DataFrame, idCol: String, nTokensCol: String,
      shardCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum_before",
        coalesce(sum(col(nTokensCol).cast("long")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"__cum_before div $budget"))
      .withColumn("pack_offset", pmod(col("__cum_before"), lit(budget)))
      .drop("__cum_before")
  }

  /** Overlapping token chunking — the long-document split pass (context-
    * window packing, RAG indexing): each document becomes ceil-strided
    * windows of `size` tokens starting every `stride` tokens, the last
    * window possibly short; a document of ≤ `size` tokens yields exactly
    * one chunk. Adds `chunk_idx`, `chunk_text`, `chunk_tokens`.
    *
    * Map-only by construction (explode over a computed index range, no
    * exchange) — at 100 TB this is a scan that fans out rows in place;
    * output partitioning inherits the input's. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val nTok = functions.size(col("__toks"))
    val nChunks = when(nTok <= size, lit(1))
      .otherwise(expr(s"(size(__toks) - $size + $stride - 1) div $stride") + 1)
    df.withColumn("__toks", tokens(normalize(col(textCol))))
      .withColumn("chunk_idx", explode(sequence(lit(0), (nChunks - 1).cast("int"))))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("__toks"), col("chunk_idx") * stride + 1, lit(size))))
      .withColumn("chunk_tokens",
        functions.size(slice(col("__toks"), col("chunk_idx") * stride + 1, lit(size))))
      .drop("__toks")
  }

  /** Per-document repetition signals (the Gopher-rules family of quality
    * filters): `dup_token_frac` = 1 − distinct/total tokens, and
    * `top_bigram_frac` = occurrences of the document's most frequent
    * bigram over its bigram count — high values mark boilerplate/spam.
    *
    * Pure per-row Catalyst (map-only, no exchange); the bigram mode is an
    * O(distinct × n) array fold per document — bounded by document
    * length, independent of corpus size, so it scales linearly. */
  def repetitionStats(df: DataFrame, textCol: String): DataFrame = {
    val t = tokens(normalize(col(textCol)))
    val bg = shingles(t, 2)
    val topCnt = array_max(transform(array_distinct(bg),
      d => functions.size(filter(bg, x => x === d))))
    df.withColumn("dup_token_frac",
        round(lit(1.0) - functions.size(array_distinct(t)).cast("double")
          / functions.size(t), 6))
      .withColumn("top_bigram_frac",
        round(topCnt.cast("double") / functions.size(bg), 6))
  }

  /** PII patterns shared by [[redactPii]]/[[piiStats]] and the DuckDB
    * oracle: character-class-only regexes (no backrefs/lookaround) with
    * identical semantics in Java regex and RE2. */
  val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val longNumRe = "[0-9]{7,}"

  private def deEmail(text: Column): Column =
    regexp_replace(text, emailRe, "<EMAIL>")
  private def deNum(text: Column): Column =
    regexp_replace(text, longNumRe, "<NUM>")

  /** PII redaction — the scrubbing pass a training corpus gets before
    * anything else: emails → `<EMAIL>`, 7+-digit runs (phone/account
    * numbers) → `<NUM>`. Emails first, so digits inside an address are
    * not double-counted as numbers. Pure codegen'd `regexp_replace`,
    * map-only at any scale. */
  def redactPii(text: Column): Column = deNum(deEmail(text))

  /** Redaction plus per-document counts: `n_emails` (on the raw text),
    * `n_longnums` (counted AFTER email redaction, so an address's digits
    * don't inflate it), and `redacted` (= [[redactPii]], via the same
    * helpers). Map-only. */
  def piiStats(df: DataFrame, textCol: String): DataFrame = {
    val deEmailed = deEmail(col(textCol))
    df.withColumn("n_emails",
        functions.size(regexp_extract_all(col(textCol), lit(emailRe), lit(0))))
      .withColumn("n_longnums",
        functions.size(regexp_extract_all(deEmailed, lit(longNumRe), lit(0))))
      .withColumn("redacted", deNum(deEmailed))
  }

  /** Corpus-level top-k n-grams: explode word n-gram shingles of the
    * normalized text, count, keep the k most frequent with a total
    * deterministic order (count desc, then n-gram asc — rank ties cannot
    * flap between runs or engines). The count is a hash aggregation with
    * map-side partial combine and the top-k runs as a distributed
    * `TakeOrderedAndProject` (each partition keeps its local k, the
    * driver merges k·partitions candidates) — never a single-partition
    * global sort over every distinct n-gram, which at corpus scale would
    * funnel billions of rows through one task. Only the ≤k survivors are
    * then ranked, so the rank window is O(k). The standard
    * vocabulary/frequency pass of a tokenizer-training pipeline, linear
    * in corpus tokens at any scale. */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    val counted = df
      .select(explode(shingles(tokens(normalize(col(textCol))), n)).as("ngram"))
      .filter(length(col("ngram")) > 0)
      .groupBy(col("ngram")).agg(count(lit(1)).as("cnt"))
    counted
      .orderBy(col("cnt").desc, col("ngram").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("ngram").asc)))
  }
}
