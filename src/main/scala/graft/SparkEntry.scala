package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Model
import graft.operators.{Ann, Decontam, Dedup, IncrementalDedup, Lww, Multimodal, Sampling, Skew, Temporal, TextOps, Transforms}
import graft.plans.Icelite
import graft.sources.{Changelog, FileIo}
import graft.streaming.Ingest

/** Driver contract — queries (one per operator, SURVEY.md §2) + exact
  * DuckDB oracle SQL per query. Column names and row ordering match
  * between the Spark result and the oracle; all cross-engine arithmetic
  * is double-precision with identical operation order, hashes are
  * md5-based ([[TextOps.portableHash]]).
  */
object SparkEntry {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** The lexical half of the corpus-prep pipeline, shared by `corpus_prep`
    * and `corpus_prep_v2`: quality gate → language-ID gate → exact dedup
    * (keep min doc_id per normalized-text fingerprint) → MinHash-LSH
    * near-dup clustering (keep min doc_id per cluster). Every stage is
    * individually oracle-checked; each is a hash agg or a banded
    * equi-join — no all-pairs work enters the plan. */
  private def corpusKept(s: SparkSession, dir: String): DataFrame = {
    val scored = docs(s, dir).select(col("doc_id"), col("source"), col("text"),
      TextOps.qualityScore(col("text")).as("quality"),
      TextOps.langId(col("text")).as("lang_pred"),
      size(TextOps.tokens(col("text"))).as("n_tokens"))
    val gated = scored.filter(col("quality") >= 0.55 && col("lang_pred") =!= "und")
    val canon = Dedup.exactGroups(gated, "doc_id", "text")
      .select(col("canonical_id").as("doc_id"))
    val uniq = gated.join(canon, Seq("doc_id"), "left_semi")
    val drops = Dedup.clusters(Dedup.minHashLshPairs(uniq, "doc_id", "text"))
      .filter(col("id") =!= col("cluster")).select(col("id").as("doc_id"))
    uniq.join(drops, Seq("doc_id"), "left_anti")
  }

  /** [[corpusKept]] + the semantic near-dup stage (corpus_prep_v2's body,
    * shared with corpus_prep_v3): the lexical survivors' embeddings go
    * through LSH-blocked cosine pairing (banded equi-join, never
    * all-pairs) and connected components keep one doc per cluster. */
  private def corpusKeptV2(s: SparkSession, dir: String): DataFrame = {
    val kept = corpusKept(s, dir)
    val vecs = embs(s, dir).join(kept.select(col("doc_id")),
      col("vec_id") === col("doc_id"), "left_semi")
    val semPairs = Ann.lshCosinePairs(vecs, "vec_id", "embedding", 0.4)
    val semDrops = Dedup.clusters(semPairs)
      .filter(col("id") =!= col("cluster")).select(col("id").as("doc_id"))
    kept.join(semDrops, Seq("doc_id"), "left_anti")
  }

  /** Flagship: full CDC replay (changelog → binlog → LWW merge → icelite
    * snapshot table) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    replayFinal(spark, "/root/testdata/sf0.001")

  /** The end-to-end engine run behind `cdc_replay_final`: derive the
    * changelog, write binlog segments, batch-replay them through the
    * exactly-once merge, read back the final table. */
  private def replayFinal(spark: SparkSession, sfDir: String): DataFrame = {
    val work = Files.createTempDirectory("graft-replay").toString
    val binlog = s"$work/binlog"
    val ch = Changelog.fromEvents(spark, sfDir)
    Changelog.writeBinlog(ch, binlog, shards = 8, segSize = 4096)
    val cfg = Ingest.Config(s"$work/table", s"$work/ckpt", writerId = "verify",
      buckets = 16)
    val all = Changelog.readBinlog(spark, binlog)
    val segs = all.select("seg").distinct().collect().map(_.getInt(0)).sorted
    Ingest.replay(spark, cfg, segs.toSeq.map(sg => all.filter(col("seg") === sg)))
    Icelite.load(spark, cfg.tablePath).read()
      .orderBy("conv_id", "turn_idx")
  }

  /** Two-phase replay behind the snapshot-history queries: replay the first
    * half of the binlog segments, remember that snapshot id, replay the
    * rest. Compaction is disabled (`compactThreshold = MaxValue`) so phase-2
    * row versions stay in raw delta files — [[Icelite.IceliteTable.changesSince]]
    * then returns exactly the phase-2 events, which a declarative oracle can
    * reproduce as `WHERE seq >= cutoff`. The cutoff segment is
    * `max(1, (maxSeg + 1) / 2)` — the same arithmetic the oracle SQL runs on
    * `max(seq)`, so both sides split the log at the identical event. */
  /** @param wap open a write-audit-publish cycle at the cutoff: phase-2
    *   batches land STAGED (tip advances, published view pinned at the
    *   mid snapshot) — the caller audits and publishes. */
  private def replayHalves(spark: SparkSession, sfDir: String,
      wap: Boolean = false): (graft.plans.IceliteTable, Long) = {
    val work = Files.createTempDirectory("graft-halves").toString
    val binlog = s"$work/binlog"
    val ch = Changelog.fromEvents(spark, sfDir)
    Changelog.writeBinlog(ch, binlog, shards = 8, segSize = 4096)
    val cfg = Ingest.Config(s"$work/table", s"$work/ckpt", writerId = "verify",
      buckets = 16, opts = Icelite.Options(compactThreshold = Int.MaxValue))
    val all = Changelog.readBinlog(spark, binlog)
    val segs = all.select("seg").distinct().collect().map(_.getInt(0)).sorted
    val cutSeg = math.max(1, (segs.max + 1) / 2)
    // batch ids strictly increase across both phases: the idempotence gate
    // (writerId, batchId) must see each batch as new
    var batchId = -1L
    def apply1(sg: Int): Unit = {
      batchId += 1
      Ingest.applyBatch(spark, cfg, all.filter(col("seg") === sg), batchId)
    }
    segs.filter(_ < cutSeg).foreach(apply1)
    val table = Icelite.load(spark, cfg.tablePath)
    val midSnap = table.snapshot().snapshotId
    if (wap) table.wapBegin()
    segs.filter(_ >= cutSeg).foreach(apply1)
    (table, midSnap)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------ CDC core (events)
    "cdc_changelog" -> ((s, dir) =>
      Changelog.fromEvents(s, dir).orderBy("seq")),

    "cdc_lww_dedup" -> ((s, dir) =>
      Lww.latest(Changelog.fromEvents(s, dir), Model.keyCols, Seq("event_ts", "seq"))
        .select("op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "event_ts", "seq")
        .orderBy("conv_id", "turn_idx")),

    "cdc_replay_final" -> ((s, dir) => replayFinal(s, dir)),

    // time-travel read (Iceberg VERSION AS OF): the table as of the
    // mid-replay snapshot — old manifests stay readable after later commits
    "cdc_time_travel" -> ((s, dir) => {
      val (table, midSnap) = replayHalves(s, dir)
      table.readAt(midSnap).orderBy("conv_id", "turn_idx")
    }),

    // snapshot rollback (Iceberg rollback_to_snapshot analogue): replay
    // both halves, then roll the HEAD back to the mid-replay snapshot —
    // the current read (not a time-travel read) must equal the mid
    // state; the exactly-once gate reverts with the files, so a resumed
    // stream re-applies the undone batches (convergence pinned by
    // MaintenanceSpec)
    "cdc_rollback" -> ((s, dir) => {
      val (table, midSnap) = replayHalves(s, dir)
      table.rollbackTo(midSnap)
      table.read().orderBy("conv_id", "turn_idx")
    }),

    // write-audit-publish over named refs (Iceberg branch/tag + WAP):
    // phase 1 replays, wapBegin pins the published view, phase-2 commits
    // land STAGED (the tip and the exactly-once gate advance; read() stays
    // frozen), wapPublish flips readers atomically. The query emits BOTH
    // views the cycle exposes — the frozen published read while staged
    // ('audit' rows = the mid state) and the post-publish read
    // ('published' rows = the full replay) — so the oracle checks the
    // isolation AND the convergence in one result
    "cdc_branch_wap" -> ((s, dir) => {
      val (table, _) = replayHalves(s, dir, wap = true)
      // read() resolves the published snapshot EAGERLY (file list baked
      // into the plan), so this frame stays the frozen view even though
      // it is evaluated after the publish below
      val audit = table.read().withColumn("phase", lit("audit"))
      table.wapPublish()
      val published = table.read().withColumn("phase", lit("published"))
      audit.unionByName(published).orderBy("phase", "conv_id", "turn_idx")
    }),

    // incremental scan (Iceberg incremental-read analogue): every row
    // version committed after the mid-replay snapshot, tombstones included
    "cdc_changes_since" -> ((s, dir) => {
      val (table, midSnap) = replayHalves(s, dir)
      table.changesSince(midSnap)
        .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
          col("tool"), col("ts"), col("_event_ts").as("event_ts"),
          col("_seq").as("seq"), col("_deleted").as("deleted"))
        .orderBy("seq")
    }),

    // engine-side DML (Delta/Iceberg DELETE ... WHERE analogue): replay,
    // then tombstone every live tool-role row in one exactly-once merge;
    // late events below the delete's seq cannot resurrect the rows
    "cdc_delete_where" -> ((s, dir) => {
      val (table, _) = replayHalves(s, dir)
      table.deleteWhere(col("role") === "tool", batchId = 100000L,
        writerId = "verify")
      table.read().orderBy("conv_id", "turn_idx")
    }),

    // engine-side UPDATE ... SET ... WHERE: rewrite matching live rows as
    // upserts at the table's next sequence number
    "cdc_update_where" -> ((s, dir) => {
      val (table, _) = replayHalves(s, dir)
      table.updateWhere(col("role") === "assistant",
        Map("tool" -> lit("redacted")), batchId = 100000L, writerId = "verify")
      table.read().orderBy("conv_id", "turn_idx")
    }),

    // outbound change-data feed (Delta CDF / Iceberg incremental-read
    // analogue): tail the replayed table's commits as a Structured
    // Streaming source (snapshot-id offsets) into a parquet sink; the
    // drained feed must carry every committed row version, tombstones
    // included, exactly as the declarative changelog says
    "cdc_change_feed" -> ((s, dir) => {
      val (table, _) = replayHalves(s, dir) // compaction off: all versions live
      val work = Files.createTempDirectory("graft-feed-q").toString
      val q = s.readStream
        .format(classOf[graft.sources.IceliteChangeFeed].getName)
        .option("root", table.root).load()
        .writeStream.format("parquet")
        .option("path", s"$work/out")
        .option("checkpointLocation", s"$work/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$work/out").orderBy("seq")
    }),

    // per-partition lineage (F10 / north rule): after a full replay, the
    // lineage table's per-batch totals — row counts and source seq
    // ranges — must equal what a declarative pass over the changelog says
    // each 4096-event segment contained
    "cdc_lineage_totals" -> ((s, dir) => {
      val work = Files.createTempDirectory("graft-lin").toString
      val binlog = s"$work/binlog"
      val ch = Changelog.fromEvents(s, dir)
      Changelog.writeBinlog(ch, binlog, shards = 8, segSize = 4096)
      val cfg = Ingest.Config(s"$work/table", s"$work/ckpt",
        writerId = "verify", buckets = 16)
      val all = Changelog.readBinlog(s, binlog)
      val segs = all.select("seg").distinct().collect().map(_.getInt(0)).sorted
      Ingest.replay(s, cfg, segs.toSeq.map(sg => all.filter(col("seg") === sg)))
      Ingest.lineage(s, cfg)
        .groupBy("batch_id")
        .agg(sum("rows").as("n_rows"), min("start_seq").as("start_seq"),
          max("end_seq").as("end_seq"))
        .orderBy("batch_id")
    }),

    // schema evolution through the merge (north rule: add-column AND
    // int→long widen), end-to-end oracle-checked: phase 1 carries
    // score:int; phase 2 widens score to long (values past int range
    // prove the upcast) and adds extra:string; phase-1 winners read back
    // widened with extra backfilled NULL
    "cdc_schema_evolution" -> ((s, dir) => {
      val work = Files.createTempDirectory("graft-evo").toString
      val binlog = s"$work/binlog"
      val ch = Changelog.fromEvents(s, dir)
      Changelog.writeBinlog(ch, binlog, shards = 8, segSize = 4096)
      val cfg = Ingest.Config(s"$work/table", s"$work/ckpt",
        writerId = "verify", buckets = 16)
      val all = Changelog.readBinlog(s, binlog)
      val segs = all.select("seg").distinct().collect().map(_.getInt(0)).sorted
      val cutSeg = math.max(1, (segs.max + 1) / 2)
      var batchId = -1L
      def apply1(b: DataFrame): Unit = {
        batchId += 1; Ingest.applyBatch(s, cfg, b, batchId)
      }
      segs.filter(_ < cutSeg).foreach(sg => apply1(
        all.filter(col("seg") === sg)
          .withColumn("score", (col("seq") % 1000).cast("int"))))
      segs.filter(_ >= cutSeg).foreach(sg => apply1(
        all.filter(col("seg") === sg)
          .withColumn("score", col("seq") + lit(3000000000L))
          .withColumn("extra", concat(lit("x"), col("seq").cast("string")))))
      Icelite.load(s, cfg.tablePath).read().orderBy("conv_id", "turn_idx")
    }),

    // manifest-pruned point lookup: one bucket's files, predicate pushed
    // into the parquet scan — the engine's splitPk-range-pruning analogue
    "cdc_point_lookup" -> ((s, dir) => {
      val ch = Changelog.fromEvents(s, dir)
      val target = ch.agg(min(col("conv_id"))).collect()(0).getString(0)
      val work = Files.createTempDirectory("graft-lookup").toString
      val binlog = s"$work/binlog"
      Changelog.writeBinlog(ch, binlog, shards = 8, segSize = 4096)
      val cfg = Ingest.Config(s"$work/table", s"$work/ckpt", writerId = "verify",
        buckets = 16)
      Ingest.replay(spark = s, cfg = cfg,
        batches = Seq(Changelog.readBinlog(s, binlog)))
      Icelite.load(s, cfg.tablePath).lookup(target).orderBy("turn_idx")
    }),

    // batch point lookup: several keys (first + last conversation + one
    // absent), ONE lookup call — per-bucket grouped scans, IN pushdown
    "cdc_batch_lookup" -> ((s, dir) => {
      val ch = Changelog.fromEvents(s, dir)
      val mm = ch.agg(min(col("conv_id")), max(col("conv_id"))).collect()(0)
      val keys = Seq(mm.getString(0), mm.getString(1), "no-such-conversation")
      val work = Files.createTempDirectory("graft-batch-lookup").toString
      val binlog = s"$work/binlog"
      Changelog.writeBinlog(ch, binlog, shards = 8, segSize = 4096)
      val cfg = Ingest.Config(s"$work/table", s"$work/ckpt", writerId = "verify",
        buckets = 16)
      Ingest.replay(spark = s, cfg = cfg,
        batches = Seq(Changelog.readBinlog(s, binlog)))
      Icelite.load(s, cfg.tablePath).lookup(keys).orderBy("conv_id", "turn_idx")
    }),

    // maintenance preserves content: full replay, then an in-place bucket
    // re-layout (16 → 32) — the read-back must still equal the replay oracle
    "cdc_rebucket" -> ((s, dir) => {
      val (table, _) = replayHalves(s, dir)
      table.rebucket(32)
      table.read().orderBy("conv_id", "turn_idx")
    }),

    // classic copy-on-write mode (compactThreshold=0: every batch compacts
    // its touched buckets, no deltas survive) reaches the same final state
    "cdc_compact_cow" -> ((s, dir) => {
      val work = Files.createTempDirectory("graft-cow").toString
      val binlog = s"$work/binlog"
      val ch = Changelog.fromEvents(s, dir)
      Changelog.writeBinlog(ch, binlog, shards = 8, segSize = 4096)
      val cfg = Ingest.Config(s"$work/table", s"$work/ckpt",
        writerId = "verify", buckets = 16,
        opts = Icelite.Options(compactThreshold = 0))
      val all = Changelog.readBinlog(s, binlog)
      val segs = all.select("seg").distinct().collect().map(_.getInt(0)).sorted
      Ingest.replay(s, cfg, segs.toSeq.map(sg => all.filter(col("seg") === sg)))
      val table = Icelite.load(s, cfg.tablePath)
      assert(table.snapshot().files.forall(_.kind == "base"),
        "compactThreshold=0 must leave no delta files")
      table.read().orderBy("conv_id", "turn_idx")
    }),

    "cdc_heavy_hitters" -> ((s, dir) =>
      Skew.heavyHitters(Changelog.fromEvents(s, dir), "conv_id", 10)),

    // single-version upsert-only CDC shaping (reference S9)
    "cdc_upsert_only" -> ((s, dir) =>
      Changelog.upsertOnly(Changelog.fromEvents(s, dir)).orderBy("seq")),

    // multi-version cell-level CDC shaping (reference S8)
    "cdc_cell_changes" -> ((s, dir) =>
      Changelog.cellChanges(Changelog.fromEvents(s, dir))
        .orderBy("seq", "column_name")),

    // final-state transcripts reassembled in stable turn order
    "transcript_assembly" -> ((s, dir) => {
      val fin = Lww.latest(Changelog.fromEvents(s, dir), Model.keyCols,
          Seq("event_ts", "seq"))
        .filter(col("op") =!= "D")
      fin.groupBy(col("conv_id"))
        .agg(count(lit(1)).as("n_turns"),
          array_join(
            transform(
              array_sort(collect_list(struct(col("turn_idx"), col("text")))),
              e => e("text")),
            "\n").as("transcript"))
        .orderBy("conv_id")
    }),

    // ------------------------------------------------ ETL transforms (events)
    "etl_transform_chain" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      ev.select(
          col("event_id"),
          Transforms.dxSubstr(col("event_type"), 0, 3).as("etype3"),
          Transforms.dxPad(col("user_id").cast("string"), leftNotRight = true, 6, "0").as("uid6"),
          Transforms.dxReplace(col("event_type"), 1, 2, "__").as("masked"))
        .filter(Transforms.keepFilter(col("event_type"), "like", "err.*"))
        .orderBy("event_id")
    }),

    // dx_filter range/equality ops (inverted sense: match ⇒ drop)
    "etl_filter_range" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      ev.filter(Transforms.keepFilter(col("value"), ">", "50.0"))
        .filter(Transforms.keepFilter(col("user_id"), "<=", "10"))
        .filter(Transforms.keepFilter(col("event_type"), "=", "purchase"))
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    }),

    // CSV source/sink round-trip (reference S3/W6: delimiter, header,
    // nullFormat, gzip) — engine reads back exactly what it wrote
    "src_csv_roundtrip" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val tmp = Files.createTempDirectory("graft-csv").toString
      val o = FileIo.TextOptions(delimiter = "\t", header = true,
        compress = Some("gzip"))
      FileIo.writeCsv(ev, s"$tmp/events_csv", o)
      FileIo.readCsv(s, s"$tmp/events_csv", ev.schema, o).orderBy("event_id")
    }),

    // .zip text scan (reference S3/S4 compression list): write a
    // zip-compressed CSV through the codec, then read it back via the
    // standard extension→codec lookup — plus a hand-built MULTI-entry
    // archive to pin the reference's entry-concatenation semantics
    "src_zip_roundtrip" -> ((s, dir) => {
      FileIo.registerZipCodec(s)
      val ev = s.read.parquet(s"$dir/events.parquet")
      val tmp = Files.createTempDirectory("graft-zip").toString
      val o = FileIo.TextOptions(delimiter = "\t", header = false,
        compress = Some("zip"))
      FileIo.writeCsv(ev.filter(col("event_id") % 2 === 0),
        s"$tmp/ev_zip", o)
      // the odd half goes into ONE archive holding two entries
      val odd = ev.filter(col("event_id") % 2 === 1)
      val csvTmp = s"$tmp/ev_csv"
      FileIo.writeCsv(odd, csvTmp, o.copy(compress = None))
      val parts = new java.io.File(csvTmp).listFiles()
        .filter(_.getName.endsWith(".csv")).sortBy(_.getName)
      val zf = new java.util.zip.ZipOutputStream(
        Files.newOutputStream(java.nio.file.Paths.get(s"$tmp/ev_zip/odd.zip")))
      try parts.zipWithIndex.foreach { case (f, i) =>
        zf.putNextEntry(new java.util.zip.ZipEntry(s"entry-$i.csv"))
        Files.copy(f.toPath, zf); zf.closeEntry()
      } finally zf.close()
      FileIo.readCsv(s, s"$tmp/ev_zip", ev.schema, o).orderBy("event_id")
    }),

    "src_jsonl_roundtrip" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val tmp = Files.createTempDirectory("graft-jsonl").toString
      val o = FileIo.TextOptions(compress = Some("gzip"))
      FileIo.writeJsonl(ev, s"$tmp/events_jsonl", o)
      FileIo.readJsonl(s, s"$tmp/events_jsonl", ev.schema, o).orderBy("event_id")
    }),

    // SequenceFile TEXT mode round-trip (reference S4 SEQ fileType)
    "src_seq_roundtrip" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val tmp = Files.createTempDirectory("graft-seq").toString
      FileIo.writeSeq(ev, s"$tmp/events_seq")
      FileIo.readSeq(s, s"$tmp/events_seq", ev.schema).orderBy("event_id")
    }),

    // RCFile TEXT mode round-trip (reference S4 RC fileType — columnar
    // cells via Hive's RCFile formats, no Hive session)
    "src_rc_roundtrip" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val tmp = Files.createTempDirectory("graft-rc").toString
      FileIo.writeRc(ev, s"$tmp/events_rc")
      FileIo.readRc(s, s"$tmp/events_rc", ev.schema).orderBy("event_id")
    }),

    // composite-PK range scan (reference S5/S6: HBase rowkey ranges, OTS
    // multi-dim PK split): sample-based lexicographic cuts over
    // (conv_id, turn_idx), one scan per slice predicate, union — rows+hash
    // equality against the plain changelog proves the slices partition the
    // table (no row lost to a cut, none double-scanned)
    "src_composite_split" -> ((s, dir) => {
      val ch = Changelog.fromEvents(s, dir)
      val cuts = graft.sources.RangeSplit.compositeCuts[String, Int](
        ch, "conv_id", "turn_idx", n = 8)(_.getString(0), _.getInt(1))
      val preds = graft.sources.RangeSplit.compositePredicates(
        "conv_id", "turn_idx", cuts,
        graft.sources.RangeSplit.sqlString, (b: Int) => b.toString)
      preds.map(p => ch.filter(expr(p))).reduce(_.unionAll(_)).orderBy("seq")
    }),

    // Mongo Extended JSON round-trip (reference S12/W8 interchange form):
    // typed rows → extended-JSON docs (wrapped int64, epoch-millis dates,
    // md5-derived ObjectIds) → parsed back; the oracle rebuilds the id and
    // millisecond-truncated timestamps declaratively
    "src_mongo_extjson" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select("event_id", "event_type", "user_id", "ts")
      val docs = graft.sources.MongoShape.renderExtended(ev,
        substring(md5(col("event_id").cast("string")), 1, 24),
        Seq("event_id", "event_type", "user_id", "ts"))
      graft.sources.MongoShape.parseExtended(docs, "doc", ev.schema)
        .orderBy("event_id")
    }),

    // ES bulk-write rendering (reference W10): action line + source doc per
    // row via to_json; the oracle rebuilds both lines in DuckDB, so the
    // exact JSON bytes a _bulk endpoint would receive are pinned
    "sink_es_bulk_render" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      graft.sources.EsShape.bulkLines(ev, "events", col("event_id"),
        Seq("event_id", "event_type", "user_id")).orderBy("bulk")
    }),

    // dx_url2base64 over deterministic data: URIs (no egress in sandbox);
    // output = base64 of the fetched body, null URLs pass through
    "etl_url2base64" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), concat(lit("data:;base64,"),
          base64(col("text").cast("binary"))).as("url"))
      Transforms.urlToBase64(docs, "url")
        .withColumnRenamed("url", "b64").orderBy("doc_id")
    }),

    // the SAME chain a job would name in its config (IngestMain
    // transforms=...), resolved through the TransformerRegistry — pins
    // the registry parse + builtin factory semantics end to end (incl.
    // commas inside the last argument: the dx_expr SQL)
    "etl_registry_chain" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select("event_id", "user_id", "event_type")
      graft.operators.TransformerRegistry.applyChain(ev,
        "dx_pad(event_type,r,12,_)," +
          "dx_replace(event_type,2,3,***)," +
          "dx_substr(event_type,0,8)," +
          "dx_filter(user_id,<=,50)," +
          "dx_expr(uid2,user_id % 100)")
        .orderBy("event_id")
    }),

    // dx_groovy parity driven from pure config text: the chain argument
    // IS code (a Java method body Janino-compiled per executor), arriving
    // through the same registry parse a job config uses — filter (return
    // null) + in-place rewrite, the two GroovyTransformer verbs
    "etl_scripted" -> ((s, dir) =>
      graft.operators.TransformerRegistry.applyChain(docs(s, dir),
        "dx_script(" +
          "if (((Long) record[4]).longValue() < 200L) return null; " +
          "record[2] = ((String) record[2]).toUpperCase(java.util.Locale.ROOT); " +
          "return record;)")
        .orderBy("doc_id")),

    "src_orc_roundtrip" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val tmp = Files.createTempDirectory("graft-orc").toString
      FileIo.writeOrc(ev, s"$tmp/events_orc")
      FileIo.readOrc(s, s"$tmp/events_orc", ev.schema).orderBy("event_id")
    }),

    "etl_dirty_gate" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      // parse-or-dirty: JSON prop k; dirty rows (null parse) routed out,
      // clean rows pass — the F8/F9 dirty-collection analogue as a query
      ev.select(col("event_id"),
          // try_cast: under ANSI mode (Spark 4 default) a plain cast would
          // ABORT the job on the first non-numeric k instead of nulling it
          expr("try_cast(get_json_object(props, '$.k') AS INT)").as("k"))
        .filter(col("k").isNotNull && pmod(col("k"), lit(7)) =!= 0)
        .orderBy("event_id")
    }),

    // ------------------------------------------------ text analysis (documents)
    "text_token_stats" -> ((s, dir) => {
      val t = TextOps.tokens(col("text"))
      docs(s, dir).select(
          col("doc_id"),
          size(t).as("n_tokens"),
          ((length(col("text")) - size(t) + 1).cast("double") / size(t)).as("avg_token_len"),
          (size(array_distinct(t)).cast("double") / size(t)).as("distinct_ratio"))
        .orderBy("doc_id")
    }),

    "text_token_bpe" -> ((s, dir) => {
      val b = TextOps.bpeTokens(col("text"))
      docs(s, dir).select(col("doc_id"),
          size(b).as("n_bpe"),
          size(array_distinct(b)).as("n_bpe_distinct"))
        .orderBy("doc_id")
    }),

    // corpus length profile — the pre-filter histogram every training
    // pipeline computes before choosing length cutoffs
    "text_length_histogram" -> ((s, dir) =>
      docs(s, dir)
        .select((floor(size(TextOps.tokens(col("text"))) / 10) * 10).as("bucket_lo"))
        .groupBy("bucket_lo").agg(count(lit(1)).as("n_docs"))
        .orderBy("bucket_lo")),

    "text_quality" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
          TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    "text_langid" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
          TextOps.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    "text_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
          TextOps.fingerprint(col("text")).as("fp"),
          TextOps.minShingleFingerprint(col("text"), 3).as("minfp"),
          TextOps.rollingHash(col("text")).as("rh"))
        .orderBy("doc_id")),

    // ------------------------------------------------ dedup (documents)
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(docs(s, dir), "doc_id", "text").orderBy("fp")),

    "dedup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(docs(s, dir), "doc_id", "text", 3, 0.8)
        .orderBy("id_a", "id_b")),

    // corpus-level exact SPAN dedup (C4/CCNet paragraph-dedup shape):
    // 20-token spans, first corpus occurrence kept, docs reassembled
    "dedup_paragraphs" -> ((s, dir) =>
      Dedup.paragraphDedup(docs(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id").orderBy("doc_id")),

    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minHashLshPairs(docs(s, dir), "doc_id", "text")
        .orderBy("id_a", "id_b")),

    // duplicate clusters = connected components over the near-dup pairs.
    // The pair source is the SCALE path (banded MinHash-LSH, no all-pairs
    // stage) — legitimate against the exact-Jaccard recursive-CTE oracle
    // because `dedup_minhash_lsh` separately pins LSH pairs ≡ exact
    // Jaccard pairs on this corpus (both hash-green)
    "dedup_clusters" -> ((s, dir) =>
      Dedup.clusters(Dedup.minHashLshPairs(docs(s, dir), "doc_id", "text"))
        .orderBy("id")),

    // incremental near-dup against a persisted MinHash signature index:
    // the documents table arrives as three CDC-style batches (arrival =
    // doc_id % 3); each batch is deduped against everything that arrived
    // earlier WITHOUT re-scanning the corpus — candidates come from an
    // equi-join of the batch's LSH bands (broadcast) against the index,
    // verified by an integer signature-match count (no float compare)
    "dedup_incremental" -> ((s, dir) => {
      val work = Files.createTempDirectory("graft-incdedup").toString
      val d = docs(s, dir)
      val batches = (0 until 3).map(a =>
        d.filter(pmod(col("doc_id"), lit(3)) === a))
      IncrementalDedup.replay(s, s"$work/idx", batches, "doc_id", "text")
        .select(col("id").as("doc_id"), col("arrival"), col("kept"),
          col("dup_of"))
        .orderBy("doc_id")
    }),

    "dedup_simhash" -> ((s, dir) =>
      Dedup.simHash(docs(s, dir), "doc_id", "text").orderBy("id")),

    "dedup_simhash_pairs" -> ((s, dir) =>
      Dedup.simHashPairs(Dedup.simHash(docs(s, dir), "doc_id", "text"), maxDist = 3)
        .orderBy("id_a", "id_b")),

    // the flagship training-corpus preparation pipeline, operators
    // composed end-to-end: quality gate → language-ID gate → exact dedup
    // (keep min doc_id per normalized-text fingerprint) → MinHash-LSH
    // near-dup clustering (keep min doc_id per cluster). Every stage is
    // individually oracle-checked above; this entry pins the COMPOSITION
    // against one DuckDB query. Scale: each stage is a hash agg or a
    // banded equi-join — no all-pairs work enters the plan.
    "corpus_prep" -> ((s, dir) =>
      corpusKept(s, dir)
        .select("doc_id", "source", "lang_pred", "quality", "n_tokens")
        .orderBy("doc_id")),

    // corpus_prep + the SEMANTIC near-dup stage real training pipelines
    // add after lexical dedup: the surviving docs' embeddings go through
    // LSH-blocked cosine pairing ([[Ann.lshCosinePairs]] — banded
    // equi-join, never all-pairs) and connected-components keeps one doc
    // per semantic cluster. Deterministic end to end (md5-derived
    // hyperplanes), so the oracle replicates buckets and cosines exactly.
    "corpus_prep_v2" -> ((s, dir) =>
      corpusKeptV2(s, dir)
        .select("doc_id", "source", "lang_pred", "quality", "n_tokens")
        .orderBy("doc_id")),

    // v2 + the post-dedup stages a production training pipeline runs:
    // benchmark-decontamination gate (the held-out eval set doc_id%37==0
    // never trains AND near-copies of it are dropped) → source-mixture
    // rebalance (5:3:2) → PII redaction → 64/32 overlapping chunking of
    // the REDACTED text → 256-token sequence packing per source shard.
    // Every stage is a hash agg, broadcast join, or map-only transform;
    // the only window is the per-shard packing sum — one exchange
    // (PipelineOpsSpec pins the composition's exchange count).
    "corpus_prep_v3" -> ((s, dir) => {
      val kept = corpusKeptV2(s, dir) // carries text through the chain
      // 1. decontam: corpus = survivors minus the eval set itself, then
      //    minus docs whose distinct-3-gram overlap with the bench ≥ 0.5
      val corpus = kept.filter(col("doc_id") % 37 =!= 0)
        .select("doc_id", "source", "text")
      val bench = docs(s, dir).filter(col("doc_id") % 37 === 0)
      val contaminated = Decontam.contamination(
          corpus, bench, "doc_id", "text", "text", n = 3, threshold = 0.5)
        .filter(col("contaminated")).select("doc_id")
      val clean = corpus.join(contaminated, Seq("doc_id"), "left_anti")
      // 2. mixture rebalance over the SURVIVORS' per-source counts
      val mixed = Sampling.mixture(clean, "doc_id", "source",
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
      // 3. PII redaction (same deterministic injection as text_redact —
      //    the synthetic corpus carries no PII of its own)
      val redacted = mixed.withColumn("text", TextOps.redactPii(concat(
        col("text"),
        when(col("doc_id") % 10 === 0,
          concat(lit(" mail u"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" phone 555"), lpad(col("doc_id").cast("string"), 7, "0")))
          .otherwise(lit("")))))
      // 4. chunk the redacted text; 5. pack chunks into 256-token packs,
      //    keyed by (doc_id, chunk_idx) via a collision-free composite
      val chunks = TextOps.chunkTokens(
          redacted.select("doc_id", "source", "text"),
          "doc_id", "text", size = 64, stride = 32)
        .withColumn("chunk_key",
          col("doc_id") * lit(100000L) + col("chunk_idx"))
      TextOps.packSequences(chunks, "chunk_key", "chunk_tokens", "source",
          budget = 256L)
        .select(col("doc_id"), col("chunk_idx"), col("source"),
          col("chunk_tokens").cast("long").as("chunk_tokens"),
          col("pack_id"), col("pack_offset"))
        .orderBy("source", "doc_id", "chunk_idx")
    }),

    // ------------------------------------------------ similarity (embeddings)
    "ann_topk" -> ((s, dir) =>
      Ann.bruteForceTopKFast(embs(s, dir), "vec_id", "embedding", 5)
        .orderBy("id", "rank")),

    // approximate by construction but fully deterministic: the hyperplanes
    // are md5-derived, so the oracle replicates the exact bucketing and
    // the result is hash-checked end to end; recall vs brute force is
    // additionally asserted in OperatorsSpec
    "ann_lsh_topk" -> ((s, dir) =>
      Ann.lshTopK(embs(s, dir), "vec_id", "embedding", 5)
        .orderBy("id", "rank")),

    // embedding-cosine near-duplicate pairs (exact baseline, oracle'd)
    "ann_cosine_dup" -> ((s, dir) =>
      Ann.cosinePairs(embs(s, dir), "vec_id", "embedding", 0.4)
        .orderBy("id_a", "id_b")),

    // IVF ANN — approximate by construction but deterministic (min-id
    // centroids), so the oracle replicates the exact list assignment and
    // the result is hash-checked; recall asserted in OperatorsSpec
    "ann_ivf_topk" -> ((s, dir) =>
      Ann.ivfTopK(embs(s, dir), "vec_id", "embedding", 5)
        .orderBy("id", "rank")),

    // multimodal pipeline — blob bytes are md5-derived (portable), so the
    // oracle regenerates the exact blobs and checksums in SQL; partition
    // batching + determinism additionally asserted in MultimodalSpec
    "mm_decode_features" -> ((s, _) => {
      implicit val sp = s
      Multimodal.decodeImage(Multimodal.syntheticMedia(s, 2000))
        .toDF().select("media_id", "kind", "n_bytes", "checksum")
        .orderBy("media_id")
    }),

    "mm_frame_sample" -> ((s, _) =>
      Multimodal.sampleFrames(Multimodal.syntheticMedia(s, 2000), everyK = 2)
        .groupBy("media_id").agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame"))).as("sampled_bytes"))
        .orderBy("media_id")),

    // querySql passthrough (reference S1 `querySql` mode,
    // `ReaderSplitUtil.java:92-102`): user-authored SQL text runs as-is —
    // the exact same string is the DuckDB oracle
    "sql_passthrough" -> ((s, dir) => {
      s.read.parquet(s"$dir/events.parquet").createOrReplaceTempView("events")
      s.sql(sqlPassthroughText)
    }),

    // ------------------------------------------------ temporal (events)
    // as-of join — the operator Spark lacks natively; oracle is DuckDB's
    // NATIVE ASOF JOIN, so the union-tag + window-carry implementation is
    // checked against an independent first-class implementation. Right
    // side deduped to one row per (user_id, ts) by max event_id (the
    // operator's uniqueness precondition), identically in the oracle.
    "events_asof_join" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(struct(col("event_id"), col("value"))).as("m"))
        .select(col("user_id"), col("ts"),
          col("m.event_id").as("view_id"), col("m.value").as("view_value"))
      Temporal.asofJoin(clicks, views, Seq("user_id"), "ts",
          Seq("view_id", "view_value"))
        .orderBy("event_id")
    }),

    // inactivity-gap sessionization (8 h gap) + per-session rollup; the
    // value sum is integer cents so the total is order-independent
    "events_sessionize" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      Temporal.sessionStats(
          Temporal.sessionize(ev, "user_id", "ts", "event_id",
            gapMicros = 480L * 60L * 1000000L),
          "user_id", "ts", "value")
        .orderBy("user_id", "session_idx")
    }),

    // the SAME rollup as an actual Structured Streaming run: native
    // session_window + watermark drained through a memory sink — the
    // incremental twin a topic tail would execute, oracled against the
    // stream's boundary semantics (gap of EXACTLY 8 h starts a new
    // session, end-exclusive, vs the batch operator's strict-greater)
    "events_sessionize_stream" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      // the file-stream source tails DIRECTORIES; stage the single-file
      // table as a hardlink (no copy) the way a real feed would land files
      val feedDir = Files.createTempDirectory("graft-sess-feed")
      val link = feedDir.resolve("events.parquet")
      val src = java.nio.file.Paths.get(s"$dir/events.parquet")
      try Files.createLink(link, src)
      catch { case _: Exception => Files.copy(src, link) } // cross-device

      val stream = s.readStream.schema(schema)
        .parquet(feedDir.toString)
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
          col("value"))
      val q = Temporal.sessionStatsStream(stream, "user_id", "ts", "value",
          gap = "8 hours", watermark = "0 seconds")
        .writeStream.outputMode("complete").format("memory")
        .queryName("graft_sess_stream").start()
      try q.processAllAvailable() finally q.stop()
      s.table("graft_sess_stream")
        .select("user_id", "start_ts", "end_ts", "n_events", "value_cents")
        .orderBy("user_id", "start_ts")
    }),

    // ------------------------------------------------ sampling (documents)
    // deterministic hash-rate stratified sample — map-only, reproducible,
    // engine-portable (md5 arithmetic replayed exactly in the oracle)
    "sample_stratified" -> ((s, dir) =>
      Sampling.stratified(docs(s, dir), "doc_id", "lang",
          rates = Map("en" -> 37, "zh" -> 11), defaultPct = 23)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")),

    // fixed-quota per-stratum sample: exactly min(7, |source|) docs per
    // source, selected and ranked by deterministic hash order
    "sample_topn_per_group" -> ((s, dir) =>
      Sampling.topNPerStratum(docs(s, dir), "doc_id", "source", n = 7)
        .select("doc_id", "source", "lang", "sample_rank")
        .orderBy("source", "sample_rank")),

    // ------------------------------------------------ quantization (embeddings)
    // symmetric int8 quantization; the oracle recomputes the identical
    // double arithmetic and compares scale exactly plus the quantized
    // vector via md5-of-joined-values and its L1 mass
    "embed_quantize" -> ((s, dir) => {
      val q = Ann.quantizeInt8(embs(s, dir), "embedding")
      q.select(col("vec_id"), col("scale"),
          md5(array_join(transform(col("qvec"), x => x.cast("string")), ","))
            .as("q_hash"),
          aggregate(col("qvec"), lit(0L), (a, x) => a + abs(x)).as("q_l1"))
        .orderBy("vec_id")
    }),

    // ------------------------------------------------ packing (documents)
    // token-budget sequence packing (256-token packs, sharded by source so
    // the running sum parallelizes); integral arithmetic only
    "doc_pack" -> ((s, dir) =>
      TextOps.packSequences(
          docs(s, dir).select(col("doc_id"), col("source"),
            size(TextOps.tokens(col("text"))).cast("long").as("n_tokens")),
          "doc_id", "n_tokens", "source", budget = 256L)
        .orderBy("source", "doc_id")),

    // ------------------------------------------------ decontam (documents)
    // benchmark decontamination: docs with doc_id % 37 == 0 stand in for
    // the held-out eval set; the rest of the corpus is scored against it
    // (distinct 3-gram overlap fraction, broadcast bench side)
    "doc_decontam" -> ((s, dir) => {
      val d = docs(s, dir)
      Decontam.contamination(
          d.filter(col("doc_id") % 37 =!= 0),
          d.filter(col("doc_id") % 37 === 0),
          "doc_id", "text", "text", n = 3, threshold = 0.5)
        .orderBy("doc_id")
    }),

    // ------------------------------------------------ chunking (documents)
    // overlapping token windows (64-token chunks, stride 32) — map-only
    "doc_chunks" -> ((s, dir) =>
      TextOps.chunkTokens(docs(s, dir).select(col("doc_id"), col("text")),
          "doc_id", "text", size = 64, stride = 32)
        .select("doc_id", "chunk_idx", "chunk_text", "chunk_tokens")
        .orderBy("doc_id", "chunk_idx")),

    // ------------------------------------------------ repetition (documents)
    // Gopher-style per-doc repetition signals — map-only
    "text_repetition" -> ((s, dir) =>
      TextOps.repetitionStats(docs(s, dir), "text")
        .select("doc_id", "dup_token_frac", "top_bigram_frac")
        .orderBy("doc_id")),

    // ------------------------------------------------ mixture (documents)
    // rebalance three sources to 5:3:2 — the binding source keeps every
    // row, the rest hash-downsample; corpus is never shuffled
    "mix_rebalance" -> ((s, dir) =>
      Sampling.mixture(docs(s, dir), "doc_id", "source",
          Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
        .select("doc_id", "source", "lang", "n_chars")
        .orderBy("doc_id")),

    // ------------------------------------------------ redaction (documents)
    // PII scrub over text with deterministically injected emails/phone
    // numbers (the synthetic corpus has none); md5 of the redacted text
    // keeps the result compact
    "text_redact" -> ((s, dir) =>
      TextOps.piiStats(
          docs(s, dir).withColumn("text", concat(col("text"),
            when(col("doc_id") % 10 === 0,
              concat(lit(" mail u"), col("doc_id"), lit("@example.com")))
              .otherwise(lit("")),
            when(col("doc_id") % 7 === 0,
              concat(lit(" phone 555"), lpad(col("doc_id").cast("string"), 7, "0")))
              .otherwise(lit("")))),
          "text")
        .select(col("doc_id"), col("n_emails"), col("n_longnums"),
          md5(col("redacted")).as("redacted_md5"))
        .orderBy("doc_id")),

    // ------------------------------------------------ vocabulary (documents)
    // corpus-level top-k bigrams (tokenizer-training frequency pass);
    // deterministic total order (count desc, ngram asc)
    "text_topk_ngrams" -> ((s, dir) =>
      TextOps.topNgrams(docs(s, dir), "text", n = 2, k = 20)
        .orderBy("rank")),

    // ------------------------------------------------ relational smoke
    "docs_by_source" -> ((s, dir) =>
      docs(s, dir).groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_doc"))
        .orderBy("source", "lang")))

  /** Dialect-neutral SQL (Spark ∩ DuckDB) for the passthrough query. */
  private val sqlPassthroughText = """
    SELECT event_type, count(*) AS n, min(value) AS min_v, max(value) AS max_v,
      min(event_id) AS min_id
    FROM events GROUP BY event_type ORDER BY event_type"""

  // ================================================================ oracles

  /** 3-gram shingle set per doc (parameterized by source relation),
    * shared by the jaccard/minhash/corpus-prep oracles. */
  private def duckShinglesFrom(rel: String) = s"""
    SELECT DISTINCT doc_id AS id, s FROM (
      SELECT doc_id, t, unnest(
        [array_to_string(t[i+1:i+3], ' ')
         FOR i IN range(greatest(len(t)-2, 1))]) AS s
      FROM (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
            FROM $rel))"""
  private val duckShingles = duckShinglesFrom("documents")

  /** Table state at the mid-replay cutoff (same cutoff arithmetic as
    * [[replayHalves]]) — shared by the cdc_time_travel and cdc_rollback
    * oracles. */
  private val duckMidStateSql = s"""
      WITH ch AS (${Changelog.duckChangelogSql}),
      b AS (SELECT greatest(1, (max(seq) // 4096 + 1) // 2) * 4096 AS cutoff FROM ch),
      ranked AS (
        SELECT ch.*, row_number() OVER (
          PARTITION BY conv_id, turn_idx
          ORDER BY event_ts DESC, seq DESC) AS rn
        FROM ch WHERE seq < (SELECT cutoff FROM b))
      SELECT conv_id, turn_idx, role, text, tool, ts
      FROM ranked WHERE rn = 1 AND op <> 'D'
      ORDER BY conv_id, turn_idx"""

  /** Shared lexical corpus-prep CTE chain (through `drops`), used by the
    * corpus_prep and corpus_prep_v2 oracles. */
  private val duckCorpusPrepCtes = s"""scored AS (
        SELECT doc_id, source, text,
          round(0.4 * least(n::DOUBLE / 50.0, 1.0)
              + 0.4 * (d::DOUBLE / n)
              + 0.2 * least(sw::DOUBLE / 3.0, 1.0), 6) AS quality,
          CASE WHEN greatest(de, en, es, fr, zh) = 0 THEN 'und'
               WHEN de >= en AND de >= es AND de >= fr AND de >= zh THEN 'de'
               WHEN en >= es AND en >= fr AND en >= zh THEN 'en'
               WHEN es >= fr AND es >= zh THEN 'es'
               WHEN fr >= zh THEN 'fr'
               ELSE 'zh' END AS lang_pred,
          n AS n_tokens
        FROM (
          SELECT doc_id, source, text,
            len(t) AS n, len(list_distinct(t)) AS d,
            len(list_filter(t, x -> x IN ('the', 'a'))) AS sw,
            len(list_filter(t, x -> x IN ('der','die','und','das','ein'))) AS de,
            len(list_filter(t, x -> x IN ('the','a','of','and','to'))) AS en,
            len(list_filter(t, x -> x IN ('el','la','de','los','que'))) AS es,
            len(list_filter(t, x -> x IN ('le','la','les','des','une'))) AS fr,
            len(list_filter(t, x -> x IN ('的','是','了','在','和'))) AS zh
          FROM (SELECT doc_id, source, text, string_split(text, ' ') AS t
                FROM documents))),
      gated AS (
        SELECT * FROM scored WHERE quality >= 0.55 AND lang_pred <> 'und'),
      canon AS (
        SELECT min(doc_id) AS doc_id FROM gated
        GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
      uniq AS (SELECT g.* FROM gated g JOIN canon c ON g.doc_id = c.doc_id),
      sh AS (${duckShinglesFrom("uniq")}),
      card AS (SELECT id, count(*) AS c FROM sh GROUP BY 1),
      inter AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
        FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b FROM inter
        JOIN card ca ON ca.id = id_a
        JOIN card cb ON cb.id = id_b
        WHERE i::DOUBLE / (ca.c + cb.c - i) >= 0.8),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs),
      reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.id),
      drops AS (
        SELECT id FROM (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
        WHERE id <> cluster)"""

  /** corpus_prep_v2's full CTE chain (lexical survivors `kept` +
    * semantic-LSH drop set `edrops`), shared by the v2 and v3 oracles.
    * See the STRUCTURE NOTE on `corpus_prep_v2` for why the recursion is
    * confined to the nested sub-select and the semantic closure uses
    * squaring. */
  private val duckCorpusV2Ctes = s"""kept AS MATERIALIZED (
        WITH RECURSIVE $duckCorpusPrepCtes
        SELECT doc_id, source, lang_pred, quality, n_tokens
        FROM uniq WHERE doc_id NOT IN (SELECT id FROM drops)),
      ev AS MATERIALIZED (
        SELECT vec_id AS id, embedding::DOUBLE[] AS v,
          sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        FROM embeddings WHERE vec_id IN (SELECT doc_id FROM kept)),
      edims AS (SELECT len(v) AS nd FROM ev LIMIT 1),
      eplanes AS (
        SELECT t, p,
          [(('0x' || substr(md5(t::VARCHAR || '_' || p::VARCHAR || '_' || d::VARCHAR), 1, 15))::BIGINT
            % 2000) / 1000.0 - 1.0 FOR d IN range(nd)] AS w
        FROM (SELECT unnest(range(8)) AS t), (SELECT unnest(range(4)) AS p), edims),
      ecodes AS (
        SELECT ev.id, pl.t AS tbl,
          CAST(sum(CASE WHEN list_dot_product(ev.v, pl.w) >= 0
                   THEN (1::BIGINT << pl.p) ELSE 0 END) AS BIGINT) AS bkt
        FROM ev, eplanes pl GROUP BY ev.id, pl.t),
      epairs AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM ecodes a JOIN ecodes b
          ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.id < b.id),
      sem AS MATERIALIZED (
        SELECT p.id_a, p.id_b FROM epairs p
        JOIN ev va ON va.id = p.id_a JOIN ev vb ON vb.id = p.id_b
        WHERE list_dot_product(va.v, vb.v) / (va.norm * vb.norm) >= 0.4),
      eedges AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM sem
        UNION SELECT id_b, id_a FROM sem
        UNION SELECT id_a, id_a FROM sem
        UNION SELECT id_b, id_b FROM sem),
      ec1 AS MATERIALIZED (SELECT DISTINCT a.src, b.dst FROM eedges a JOIN eedges b ON a.dst = b.src),
      ec2 AS MATERIALIZED (SELECT DISTINCT a.src, b.dst FROM ec1 a JOIN ec1 b ON a.dst = b.src),
      ec3 AS MATERIALIZED (SELECT DISTINCT a.src, b.dst FROM ec2 a JOIN ec2 b ON a.dst = b.src),
      ec4 AS MATERIALIZED (SELECT DISTINCT a.src, b.dst FROM ec3 a JOIN ec3 b ON a.dst = b.src),
      ec5 AS MATERIALIZED (SELECT DISTINCT a.src, b.dst FROM ec4 a JOIN ec4 b ON a.dst = b.src),
      ec6 AS MATERIALIZED (SELECT DISTINCT a.src, b.dst FROM ec5 a JOIN ec5 b ON a.dst = b.src),
      edrops AS (
        SELECT src AS id FROM ec6 GROUP BY src HAVING src <> min(dst))"""

  /** tf-weighted token rows (one per (doc, token)) feeding simhash. */
  private val duckSimhash = """
    SELECT id, CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
    FROM (
      SELECT id, j, sum(tf * (((h >> j) % 2) * 2 - 1)) AS s
      FROM (
        SELECT tf.id, tf.tok, tf.tf,
          ('0x' || substr(md5(tf.tok), 1, 15))::BIGINT AS h, u.j
        FROM (
          SELECT id, tok, count(*) AS tf FROM (
            SELECT doc_id AS id, unnest(
              string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
            FROM documents)
          GROUP BY id, tok) tf,
          (SELECT unnest(range(60)) AS j) u)
      GROUP BY id, j)
    GROUP BY id"""

  private val duckJaccardPairs = s"""
    WITH sh AS ($duckShingles),
    card AS (SELECT id, count(*) AS c FROM sh GROUP BY 1),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2)
    SELECT id_a, id_b,
      round(i::DOUBLE / (ca.c + cb.c - i), 6) AS jaccard
    FROM inter
    JOIN card ca ON ca.id = id_a
    JOIN card cb ON cb.id = id_b
    WHERE i::DOUBLE / (ca.c + cb.c - i) >= 0.8
    ORDER BY id_a, id_b"""

  def oracleSql: Map[String, String] = Map(
    "cdc_changelog" ->
      s"${Changelog.duckChangelogSql}\nORDER BY seq",

    // slices of a composite-PK split must reassemble the exact table
    "src_composite_split" ->
      s"${Changelog.duckChangelogSql}\nORDER BY seq",

    "src_mongo_extjson" -> """
      SELECT substr(md5(CAST(event_id AS VARCHAR)), 1, 24) AS _id,
        event_id, event_type, user_id,
        date_trunc('milliseconds', ts) AS ts
      FROM events ORDER BY event_id""",

    // byte-exact _bulk lines: DuckDB's to_json renders structs in the same
    // compact key-ordered form as Spark's (longs unquoted, strings escaped)
    "sink_es_bulk_render" -> """
      SELECT concat(
        to_json(struct_pack(index := struct_pack(
          "_index" := 'events', "_id" := CAST(event_id AS VARCHAR)))),
        chr(10),
        to_json(struct_pack(event_id := event_id,
          event_type := event_type, user_id := user_id))) AS bulk
      FROM events ORDER BY bulk""",

    "cdc_lww_dedup" -> Changelog.duckLwwSql,

    "cdc_replay_final" -> Changelog.duckFinalStateSql,
    // maintenance ops must not change content — same oracle as replay
    "cdc_rebucket" -> Changelog.duckFinalStateSql,
    "cdc_compact_cow" -> Changelog.duckFinalStateSql,

    // cutoff arithmetic mirrors replayHalves: cutSeg = max(1, (maxSeg+1)/2),
    // segSize 4096, so phase 1 = events with seq < cutSeg*4096
    "cdc_time_travel" -> duckMidStateSql,

    // rollback republishes the mid-replay state as the HEAD, so the
    // current read equals the time-travel read of the target snapshot
    "cdc_rollback" -> duckMidStateSql,

    // WAP: 'audit' rows = the table at the cutoff (the frozen published
    // view while phase 2 is staged); 'published' rows = the full replay
    "cdc_branch_wap" -> s"""
      WITH ch AS (${Changelog.duckChangelogSql}),
      b AS (SELECT greatest(1, (max(seq) // 4096 + 1) // 2) * 4096 AS cutoff FROM ch),
      ranked_mid AS (
        SELECT ch.*, row_number() OVER (
          PARTITION BY conv_id, turn_idx
          ORDER BY event_ts DESC, seq DESC) AS rn
        FROM ch WHERE seq < (SELECT cutoff FROM b)),
      ranked_all AS (
        SELECT ch.*, row_number() OVER (
          PARTITION BY conv_id, turn_idx
          ORDER BY event_ts DESC, seq DESC) AS rn
        FROM ch)
      SELECT 'audit' AS phase, conv_id, turn_idx, role, text, tool, ts
      FROM ranked_mid WHERE rn = 1 AND op <> 'D'
      UNION ALL
      SELECT 'published' AS phase, conv_id, turn_idx, role, text, tool, ts
      FROM ranked_all WHERE rn = 1 AND op <> 'D'
      ORDER BY phase, conv_id, turn_idx""",

    "cdc_changes_since" -> s"""
      WITH ch AS (${Changelog.duckChangelogSql}),
      b AS (SELECT greatest(1, (max(seq) // 4096 + 1) // 2) * 4096 AS cutoff FROM ch)
      SELECT conv_id, turn_idx, role, text, tool, ts, event_ts, seq,
        (op = 'D') AS deleted
      FROM ch WHERE seq >= (SELECT cutoff FROM b)
      ORDER BY seq""",

    // DELETE WHERE role='tool' over the replayed final state
    "cdc_delete_where" -> s"""
      WITH ch AS (${Changelog.duckChangelogSql}),
      ranked AS (
        SELECT ch.*, row_number() OVER (
          PARTITION BY conv_id, turn_idx
          ORDER BY event_ts DESC, seq DESC) AS rn
        FROM ch)
      SELECT conv_id, turn_idx, role, text, tool, ts
      FROM ranked WHERE rn = 1 AND op <> 'D' AND role <> 'tool'
      ORDER BY conv_id, turn_idx""",

    // UPDATE SET tool='redacted' WHERE role='assistant' over the final state
    "cdc_update_where" -> s"""
      WITH ch AS (${Changelog.duckChangelogSql}),
      ranked AS (
        SELECT ch.*, row_number() OVER (
          PARTITION BY conv_id, turn_idx
          ORDER BY event_ts DESC, seq DESC) AS rn
        FROM ch)
      SELECT conv_id, turn_idx, role, text,
        CASE WHEN role = 'assistant' THEN 'redacted' ELSE tool END AS tool, ts
      FROM ranked WHERE rn = 1 AND op <> 'D'
      ORDER BY conv_id, turn_idx""",

    // the drained feed = the full changelog, every version, in seq order
    "cdc_change_feed" -> s"""
      WITH ch AS (${Changelog.duckChangelogSql})
      SELECT conv_id, turn_idx, role, text, tool, ts, event_ts, seq,
        (op = 'D') AS deleted
      FROM ch ORDER BY seq""",

    "cdc_lineage_totals" -> s"""
      WITH ch AS (${Changelog.duckChangelogSql})
      SELECT seq // 4096 AS batch_id, count(*) AS n_rows,
        min(seq) AS start_seq, max(seq) AS end_seq
      FROM ch GROUP BY 1 ORDER BY 1""",

    "cdc_schema_evolution" -> s"""
      WITH ch AS (${Changelog.duckChangelogSql}),
      b AS (SELECT greatest(1, (max(seq) // 4096 + 1) // 2) * 4096 AS cutoff FROM ch),
      ranked AS (
        SELECT ch.*, row_number() OVER (
          PARTITION BY conv_id, turn_idx
          ORDER BY event_ts DESC, seq DESC) AS rn
        FROM ch)
      SELECT conv_id, turn_idx, role, text, tool, ts,
        CASE WHEN seq < (SELECT cutoff FROM b) THEN CAST(seq % 1000 AS BIGINT)
             ELSE seq + 3000000000 END AS score,
        CASE WHEN seq >= (SELECT cutoff FROM b)
             THEN concat('x', CAST(seq AS VARCHAR)) ELSE NULL END AS extra
      FROM ranked WHERE rn = 1 AND op <> 'D'
      ORDER BY conv_id, turn_idx""",

    "cdc_point_lookup" -> s"""
      WITH ch AS (${Changelog.duckChangelogSql}),
      ranked AS (
        SELECT ch.*, row_number() OVER (
          PARTITION BY conv_id, turn_idx
          ORDER BY event_ts DESC, seq DESC) AS rn
        FROM ch)
      SELECT conv_id, turn_idx, role, text, tool, ts
      FROM ranked WHERE rn = 1 AND op <> 'D'
        AND conv_id = (SELECT min(conv_id) FROM ch)
      ORDER BY turn_idx""",

    "cdc_batch_lookup" -> s"""
      WITH ch AS (${Changelog.duckChangelogSql}),
      ranked AS (
        SELECT ch.*, row_number() OVER (
          PARTITION BY conv_id, turn_idx
          ORDER BY event_ts DESC, seq DESC) AS rn
        FROM ch)
      SELECT conv_id, turn_idx, role, text, tool, ts
      FROM ranked WHERE rn = 1 AND op <> 'D'
        AND conv_id IN ((SELECT min(conv_id) FROM ch),
                        (SELECT max(conv_id) FROM ch))
      ORDER BY conv_id, turn_idx""",

    "cdc_heavy_hitters" -> s"""
      WITH ch AS (${Changelog.duckChangelogSql})
      SELECT conv_id, count(*) AS n FROM ch GROUP BY 1
      ORDER BY n DESC, conv_id LIMIT 10""",

    "cdc_upsert_only" -> s"""
      SELECT * FROM (${Changelog.duckChangelogSql})
      WHERE op <> 'D' ORDER BY seq""",

    "src_orc_roundtrip" -> "SELECT * FROM events ORDER BY event_id",
    "src_rc_roundtrip" -> "SELECT * FROM events ORDER BY event_id",

    "cdc_cell_changes" -> s"""
      WITH ch AS (${Changelog.duckChangelogSql})
      SELECT * FROM (
        SELECT conv_id, turn_idx, 'role' AS column_name, role AS value,
          'U' AS op_type, event_ts, seq FROM ch WHERE op <> 'D' AND role IS NOT NULL
        UNION ALL
        SELECT conv_id, turn_idx, 'text', text, 'U', event_ts, seq
        FROM ch WHERE op <> 'D' AND text IS NOT NULL
        UNION ALL
        SELECT conv_id, turn_idx, 'tool', tool, 'U', event_ts, seq
        FROM ch WHERE op <> 'D' AND tool IS NOT NULL
        UNION ALL
        SELECT conv_id, turn_idx, NULL, NULL, 'DR', event_ts, seq
        FROM ch WHERE op = 'D')
      ORDER BY seq, column_name""",

    "transcript_assembly" -> s"""
      WITH ch AS (${Changelog.duckChangelogSql}),
      ranked AS (
        SELECT ch.*, row_number() OVER (
          PARTITION BY conv_id, turn_idx
          ORDER BY event_ts DESC, seq DESC) AS rn
        FROM ch)
      SELECT conv_id, count(*) AS n_turns,
        string_agg(text, chr(10) ORDER BY turn_idx) AS transcript
      FROM ranked WHERE rn = 1 AND op <> 'D'
      GROUP BY conv_id ORDER BY conv_id""",

    "etl_filter_range" -> """
      SELECT event_id, user_id, event_type, value
      FROM events
      WHERE NOT coalesce(value > 50.0, false)
        AND NOT coalesce(user_id <= 10, false)
        AND NOT coalesce(event_type = 'purchase', false)
      ORDER BY event_id""",

    "src_csv_roundtrip" -> "SELECT * FROM events ORDER BY event_id",

    "src_zip_roundtrip" -> "SELECT * FROM events ORDER BY event_id",

    "src_jsonl_roundtrip" -> "SELECT * FROM events ORDER BY event_id",

    "src_seq_roundtrip" -> "SELECT * FROM events ORDER BY event_id",

    "etl_url2base64" -> """
      SELECT doc_id, to_base64(encode(text)) AS b64
      FROM documents ORDER BY doc_id""",

    "etl_transform_chain" -> """
      SELECT event_id,
        substr(event_type, 1, 3) AS etype3,
        lpad(CAST(user_id AS VARCHAR), 6, '0') AS uid6,
        concat(substr(event_type, 1, 1), '__', substr(event_type, 4)) AS masked
      FROM events
      WHERE NOT coalesce(regexp_full_match(event_type, 'err.*'), false)
      ORDER BY event_id""",

    // the registry chain replayed declaratively: rpad truncates past len
    // in both engines; dx_replace splices [start, start+len); dx_filter
    // match REMOVES the row (inverted sense, null keeps)
    "etl_registry_chain" -> """
      SELECT event_id, user_id,
        substr(concat(substr(rpad(event_type, 12, '_'), 1, 2), '***',
               substr(rpad(event_type, 12, '_'), 6)), 1, 8) AS event_type,
        user_id % 100 AS uid2
      FROM events
      WHERE NOT coalesce(user_id <= 50, false)
      ORDER BY event_id""",

    // the scripted transform's two verbs replayed declaratively: the
    // n_chars guard is the return-null drop, upper(lang) the slot rewrite
    "etl_scripted" -> """
      SELECT doc_id, text, upper(lang) AS lang, source, n_chars
      FROM documents WHERE n_chars >= 200 ORDER BY doc_id""",

    // TRY_CAST: a non-numeric k must become null (= the Spark cast
    // semantics) rather than abort the oracle query
    "etl_dirty_gate" -> """
      SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k
      FROM events
      WHERE TRY_CAST(json_extract_string(props, '$.k') AS INT) IS NOT NULL
        AND TRY_CAST(json_extract_string(props, '$.k') AS INT) % 7 <> 0
      ORDER BY event_id""",

    "text_token_stats" -> """
      SELECT doc_id,
        len(string_split(text, ' ')) AS n_tokens,
        (length(text) - len(string_split(text, ' ')) + 1)::DOUBLE
          / len(string_split(text, ' ')) AS avg_token_len,
        len(list_distinct(string_split(text, ' ')))::DOUBLE
          / len(string_split(text, ' ')) AS distinct_ratio
      FROM documents ORDER BY doc_id""",

    "text_token_bpe" -> """
      SELECT doc_id,
        len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe,
        len(list_distinct(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS n_bpe_distinct
      FROM documents ORDER BY doc_id""",

    "text_length_histogram" -> """
      SELECT (len(string_split(text, ' ')) // 10) * 10 AS bucket_lo,
        count(*) AS n_docs
      FROM documents GROUP BY 1 ORDER BY bucket_lo""",

    "text_quality" -> """
      SELECT doc_id,
        round(0.4 * least(n::DOUBLE / 50.0, 1.0)
            + 0.4 * (d::DOUBLE / n)
            + 0.2 * least(sw::DOUBLE / 3.0, 1.0), 6) AS quality
      FROM (
        SELECT doc_id,
          len(string_split(text, ' ')) AS n,
          len(list_distinct(string_split(text, ' '))) AS d,
          len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS sw
        FROM documents)
      ORDER BY doc_id""",

    "text_langid" -> """
      SELECT doc_id,
        CASE WHEN greatest(de, en, es, fr, zh) = 0 THEN 'und'
             WHEN de >= en AND de >= es AND de >= fr AND de >= zh THEN 'de'
             WHEN en >= es AND en >= fr AND en >= zh THEN 'en'
             WHEN es >= fr AND es >= zh THEN 'es'
             WHEN fr >= zh THEN 'fr'
             ELSE 'zh' END AS lang_pred
      FROM (
        SELECT doc_id,
          len(list_filter(t, x -> x IN ('der','die','und','das','ein'))) AS de,
          len(list_filter(t, x -> x IN ('the','a','of','and','to'))) AS en,
          len(list_filter(t, x -> x IN ('el','la','de','los','que'))) AS es,
          len(list_filter(t, x -> x IN ('le','la','les','des','une'))) AS fr,
          len(list_filter(t, x -> x IN ('的','是','了','在','和'))) AS zh
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
      ORDER BY doc_id""",

    "text_fingerprint" -> """
      SELECT doc_id, fp,
        list_min([('0x' || substr(md5(s), 1, 15))::BIGINT FOR s IN shs]) AS minfp,
        list_reduce(
          list_prepend(0::BIGINT, [ascii(c)::BIGINT FOR c IN string_split(norm, '')]),
          (a, b) -> (a * 131 + b) % 2147483647) AS rh
      FROM (
        SELECT doc_id, md5(norm) AS fp, norm,
          [array_to_string(t[i+1:i+3], ' ') FOR i IN range(greatest(len(t)-2, 1))] AS shs
        FROM (SELECT doc_id,
                regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
                string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
              FROM documents))
      ORDER BY doc_id""",

    "dedup_exact" -> """
      SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        min(doc_id) AS canonical_id, count(*) AS n_dups
      FROM documents GROUP BY 1 ORDER BY fp""",

    "dedup_jaccard" -> duckJaccardPairs,

    // exact span dedup: row_number-over-md5 keep-first is the declarative
    // mirror of the engine's min-(id,pos)-per-digest window
    "dedup_paragraphs" -> """
      WITH toks AS (
        SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t
        FROM documents),
      paras AS (
        SELECT doc_id, i AS para_idx,
               array_to_string(t[20*i+1 : 20*i+20], ' ') AS para
        FROM toks, LATERAL (SELECT unnest(range(
          greatest(CAST(ceil(len(t)/20.0) AS BIGINT), 1))) AS i) r),
      marked AS (
        SELECT doc_id, para_idx, para,
               row_number() OVER (PARTITION BY md5(para)
                 ORDER BY doc_id, para_idx) = 1 AS kept
        FROM paras)
      SELECT doc_id,
        count(*) AS n_paras,
        CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        coalesce(string_agg(CASE WHEN kept THEN para END, ' '
          ORDER BY para_idx), '') AS text_kept
      FROM marked GROUP BY doc_id ORDER BY doc_id""",

    // LSH banding at 16 bands × 4 rows has ~100% recall for the near-
    // identical pairs in this corpus; verified-exact output equals the
    // exact all-pairs result
    "dedup_minhash_lsh" -> duckJaccardPairs,

    // full MinHash reproduction: same 60-bit md5 hash, same full-range
    // (K·(2i+1))x + b_i mod 2^31-1 permutations (K = 2654435761 mod p —
    // see Dedup.minHashSignatures), same 16×4 banding (band key = the
    // slice VALUES, engine-neutral), same integer match-count threshold
    // ceil(0.7·64) = 45 — the estimator's noise is irrelevant because
    // both engines compute identical signatures
    "dedup_incremental" -> """
      WITH toks AS (
        SELECT doc_id AS id, doc_id % 3 AS arrival,
               string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        FROM documents),
      sh AS (
        SELECT DISTINCT id, unnest(
          [array_to_string(t[i+1:i+3], ' ') FOR i IN range(greatest(len(t)-2, 1))]) AS s
        FROM toks),
      xs AS (
        SELECT id, ('0x' || substring(md5(s), 1, 15))::BIGINT % 2147483647 AS x
        FROM sh),
      mins AS (
        SELECT id, u.i,
          min((((2654435761 % 2147483647) * (2*u.i+1)) % 2147483647 * x
               + (2246822519 * (u.i+1) + 12345) % 2147483647) % 2147483647) AS mh
        FROM xs CROSS JOIN (SELECT unnest(range(64)) AS i) u GROUP BY id, u.i),
      sg AS (SELECT id, list(mh ORDER BY i) AS sig FROM mins GROUP BY id),
      dcs AS (
        SELECT g.id, k.arrival, g.sig
        FROM sg g JOIN (SELECT DISTINCT id, arrival FROM toks) k USING (id)),
      bnd AS (
        SELECT id, arrival, u.b,
          array_to_string(sig[u.b*4+1:u.b*4+4], ',') AS bkey
        FROM dcs CROSS JOIN (SELECT unnest(range(16)) AS b) u),
      cand AS (
        SELECT DISTINCT x.id AS id_a, x.arrival AS arr_a, y.id AS id_b
        FROM bnd x JOIN bnd y ON x.b = y.b AND x.bkey = y.bkey
          AND (x.arrival < y.arrival OR (x.arrival = y.arrival AND x.id < y.id))),
      m AS (
        SELECT c.id_b, c.arr_a, c.id_a
        FROM cand c JOIN dcs sa ON sa.id = c.id_a JOIN dcs sb ON sb.id = c.id_b
        WHERE len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) >= 45),
      dup AS (
        SELECT id_b AS id, id_a AS dup_of FROM (
          SELECT id_b, id_a,
            row_number() OVER (PARTITION BY id_b ORDER BY arr_a, id_a) AS rn
          FROM m) WHERE rn = 1)
      SELECT d.id AS doc_id, d.arrival, (dup.id IS NULL) AS kept, dup.dup_of
      FROM dcs d LEFT JOIN dup ON dup.id = d.id
      ORDER BY doc_id""",

    "dedup_clusters" -> s"""
      WITH RECURSIVE pairs AS ($duckJaccardPairs),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs),
      reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.id)
      SELECT id, min(r) AS cluster FROM reach GROUP BY id ORDER BY id""",

    // the composed pipeline: same stage formulas as the individual
    // text_quality / text_langid / dedup_exact / dedup_minhash_lsh /
    // dedup_clusters oracles, chained over narrowing CTEs
    "corpus_prep" -> s"""
      WITH RECURSIVE $duckCorpusPrepCtes
      SELECT doc_id, source, lang_pred, quality, n_tokens
      FROM uniq WHERE doc_id NOT IN (SELECT id FROM drops)
      ORDER BY doc_id""",

    // corpus_prep + the semantic stage: the survivors' embeddings through
    // the ann_lsh_topk hyperplane replication (identical doubles), exact
    // cosine on same-bucket candidates, connected components, keep the
    // min-id doc per semantic cluster.
    //
    // STRUCTURE NOTE (DuckDB 1.0.0 workaround, found at sf0.1): inside one
    // large `WITH RECURSIVE` scope, CTEs placed after the first recursive
    // member can silently evaluate to EMPTY once the input passes a size
    // threshold — reproduced here: with the whole chain under WITH
    // RECURSIVE, `epairs` (563k rows when probed alone) evaluated to 0
    // rows in the full query, so the semantic stage dropped nothing and
    // the oracle disagreed with Spark by exactly the 500 semantic dups.
    // The workaround: the outer query is a PLAIN WITH; the lexical
    // chain's recursion is confined to a nested sub-select inside `kept`
    // (materialized — it is referenced twice); the semantic connected
    // components use non-recursive transitive-closure SQUARING
    // (e_{k+1} = e_k ∘ e_k with identity kept, 6 squarings = 64-hop
    // diameter bound, far above any near-dup cluster here). The Spark
    // side (Dedup.clusters) has no such bound and THROWS on
    // non-convergence, so a mismatch would fail loudly, not silently.
    "corpus_prep_v2" -> s"""
      WITH $duckCorpusV2Ctes
      SELECT doc_id, source, lang_pred, quality, n_tokens
      FROM kept WHERE doc_id NOT IN (SELECT id FROM edrops)
      ORDER BY doc_id""",

    // the full v3 chain replayed declaratively on top of the shared v2
    // CTEs: decontam gate (doc shingles vs the doc_id%37 bench set) →
    // per-source mixture thresholds over the SURVIVORS → inject+redact →
    // chunk the redacted text → per-source running-sum packing ordered by
    // the same composite chunk key the engine sorts on
    "corpus_prep_v3" -> s"""
      WITH $duckCorpusV2Ctes,
      kept3 AS MATERIALIZED (
        SELECT doc_id FROM kept WHERE doc_id NOT IN (SELECT id FROM edrops)),
      corpus AS MATERIALIZED (
        SELECT d.doc_id, d.source, d.text
        FROM documents d JOIN kept3 USING (doc_id)
        WHERE d.doc_id % 37 <> 0),
      tsh3 AS (${duckShinglesFrom("corpus")}),
      bsh3 AS (SELECT DISTINCT s FROM
        (${duckShinglesFrom("(SELECT * FROM documents WHERE doc_id % 37 = 0)")})),
      contam AS (
        SELECT id FROM (
          SELECT id, count(*) AS c, count(b.s) AS h
          FROM tsh3 LEFT JOIN bsh3 b USING (s) GROUP BY 1)
        WHERE h::DOUBLE / c >= 0.5),
      clean AS MATERIALIZED (
        SELECT * FROM corpus WHERE doc_id NOT IN (SELECT id FROM contam)),
      mc AS (
        SELECT source, CAST(count(*) AS DOUBLE) AS n,
          CAST(CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3 ELSE 0.2 END
               AS DOUBLE) AS w
        FROM clean WHERE source IN ('src0', 'src1', 'src2') GROUP BY 1),
      mk AS (SELECT source, n, w, n / w AS t, min(n / w) OVER () AS kk FROM mc),
      mr AS (SELECT source,
        CASE WHEN t = kk THEN 1000000
             ELSE CAST(floor(least(kk * w / n, 1.0) * 1000000.0) AS BIGINT)
        END AS thresh FROM mk),
      mixed AS MATERIALIZED (
        SELECT clean.doc_id, clean.source, clean.text
        FROM clean JOIN mr USING (source)
        WHERE ('0x' || substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 1000000 < thresh),
      red AS (
        SELECT doc_id, source,
          regexp_replace(regexp_replace(
            text
            || CASE WHEN doc_id % 10 = 0
                 THEN ' mail u' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
            || CASE WHEN doc_id % 7 = 0
                 THEN ' phone 555' || lpad(CAST(doc_id AS VARCHAR), 7, '0')
                 ELSE '' END,
            '${TextOps.emailRe}', '<EMAIL>', 'g'),
            '${TextOps.longNumRe}', '<NUM>', 'g') AS txt
        FROM mixed),
      dtok AS (
        SELECT doc_id, source,
          string_split(regexp_replace(lower(trim(txt)), '\\s+', ' ', 'g'), ' ') AS t
        FROM red),
      cc3 AS (
        SELECT doc_id, source, t,
          CASE WHEN len(t) <= 64 THEN 1
               ELSE (len(t) - 64 + 31) // 32 + 1 END AS nc
        FROM dtok),
      ce AS (SELECT doc_id, source, t, unnest(range(nc)) AS i FROM cc3),
      chunks AS MATERIALIZED (
        SELECT doc_id, CAST(i AS INT) AS chunk_idx, source,
          CAST(len(t[i*32+1 : i*32+64]) AS BIGINT) AS chunk_tokens
        FROM ce),
      pk AS (
        SELECT *, CAST(COALESCE(sum(chunk_tokens) OVER (
          PARTITION BY source ORDER BY doc_id * 100000 + chunk_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
        FROM chunks)
      SELECT doc_id, chunk_idx, source, chunk_tokens,
        CAST(cb // 256 AS BIGINT) AS pack_id,
        CAST(cb % 256 AS BIGINT) AS pack_offset
      FROM pk ORDER BY source, doc_id, chunk_idx""",

    "dedup_simhash" -> s"$duckSimhash\nORDER BY id",

    "dedup_simhash_pairs" -> s"""
      WITH sims AS ($duckSimhash)
      SELECT a.id AS id_a, b.id AS id_b,
        bit_count(xor(a.simhash, b.simhash)) AS hamming
      FROM sims a JOIN sims b ON a.id < b.id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      ORDER BY id_a, id_b""",

    "ann_topk" -> """
      WITH v AS (
        SELECT vec_id AS id, embedding::DOUBLE[] AS v,
          sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        FROM embeddings),
      pairs AS (
        SELECT a.id, b.id AS neighbor_id,
          list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cos
        FROM v a JOIN v b ON a.id <> b.id),
      ranked AS (
        SELECT id, neighbor_id, cos, row_number() OVER (
          PARTITION BY id ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM pairs)
      SELECT id, rank, neighbor_id, round(cos, 6) AS cos
      FROM ranked WHERE rank <= 5 ORDER BY id, rank""",

    // exact replication of Ann.lshTopK (planes=4, tables=8, k=5): the
    // hyperplane components are ('0x'||substr(md5("t_p_d"),1,15))::BIGINT
    // % 2000 / 1000.0 - 1.0 — identical doubles to the engine's literals,
    // so buckets, candidates and cosines all match bitwise
    "ann_lsh_topk" -> """
      WITH v AS (
        SELECT vec_id AS id, embedding::DOUBLE[] AS v,
          sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        FROM embeddings),
      dims AS (SELECT len(v) AS nd FROM v LIMIT 1),
      planes AS (
        SELECT t, p,
          [(('0x' || substr(md5(t::VARCHAR || '_' || p::VARCHAR || '_' || d::VARCHAR), 1, 15))::BIGINT
            % 2000) / 1000.0 - 1.0 FOR d IN range(nd)] AS w
        FROM (SELECT unnest(range(8)) AS t), (SELECT unnest(range(4)) AS p), dims),
      codes AS (
        SELECT v.id, pl.t AS tbl,
          CAST(sum(CASE WHEN list_dot_product(v.v, pl.w) >= 0
                   THEN (1::BIGINT << pl.p) ELSE 0 END) AS BIGINT) AS bkt
        FROM v, planes pl GROUP BY v.id, pl.t),
      cand AS (
        SELECT DISTINCT a.id, b.id AS neighbor_id
        FROM codes a JOIN codes b
          ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.id <> b.id),
      scored AS (
        SELECT c.id, c.neighbor_id,
          list_dot_product(va.v, vb.v) / (va.norm * vb.norm) AS cos
        FROM cand c JOIN v va ON va.id = c.id JOIN v vb ON vb.id = c.neighbor_id),
      ranked AS (
        SELECT id, neighbor_id, cos, row_number() OVER (
          PARTITION BY id ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT id, rank, neighbor_id, round(cos, 6) AS cos
      FROM ranked WHERE rank <= 5 ORDER BY id, rank""",

    // exact replication of Ann.ivfTopK (nlist=16, nProbe=4, k=5):
    // centroids = 16 smallest ids, assignment = rank-1 centroid by
    // (ccos desc, cid asc), probes = rank ≤ 4
    "ann_ivf_topk" -> """
      WITH v AS (
        SELECT vec_id AS id, embedding::DOUBLE[] AS v,
          sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        FROM embeddings),
      cents AS (SELECT id AS cid, v AS cv, norm AS cnorm FROM v ORDER BY id LIMIT 16),
      cc AS (
        SELECT v.id, c.cid, list_dot_product(v.v, c.cv) / (v.norm * c.cnorm) AS ccos
        FROM v, cents c),
      ranked AS (
        SELECT id, cid, row_number() OVER (
          PARTITION BY id ORDER BY ccos DESC, cid ASC) AS crank
        FROM cc),
      lists AS (SELECT cid AS list_id, id FROM ranked WHERE crank = 1),
      probes AS (SELECT id, cid AS list_id FROM ranked WHERE crank <= 4),
      cand AS (
        SELECT DISTINCT p.id, l.id AS neighbor_id
        FROM probes p JOIN lists l ON p.list_id = l.list_id AND p.id <> l.id),
      scored AS (
        SELECT c.id, c.neighbor_id,
          list_dot_product(va.v, vb.v) / (va.norm * vb.norm) AS cos
        FROM cand c JOIN v va ON va.id = c.id JOIN v vb ON vb.id = c.neighbor_id),
      ranked2 AS (
        SELECT id, neighbor_id, cos, row_number() OVER (
          PARTITION BY id ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT id, rank, neighbor_id, round(cos, 6) AS cos
      FROM ranked2 WHERE rank <= 5 ORDER BY id, rank""",

    // regenerates Multimodal.syntheticMedia's md5-derived blobs byte-for-
    // byte in SQL: nwords = h('_len') % 257 + 16 4-byte big-endian words,
    // checksum = Karp-Rabin fold (h*131 + b) % (2^31-1) over the bytes
    "mm_decode_features" -> """
      WITH ids AS (SELECT unnest(range(2000)) AS id),
      m AS (
        SELECT id,
          ['image','audio','video'][CAST(('0x' || substr(md5(id::VARCHAR || '_k'), 1, 15))::BIGINT % 3 AS INT) + 1] AS kind,
          ('0x' || substr(md5(id::VARCHAR || '_len'), 1, 15))::BIGINT % 257 + 16 AS nwords
        FROM ids),
      words AS (
        SELECT id, kind, nwords, unnest(range(nwords)) AS i FROM m),
      wb AS (
        SELECT id, kind, nwords, i,
          ('0x' || substr(md5(id::VARCHAR || '_' || i::VARCHAR), 1, 15))::BIGINT % 4294967296 AS w
        FROM words),
      bytes AS (
        SELECT id, kind, nwords,
          flatten(list([w // 16777216 % 256, w // 65536 % 256,
                        w // 256 % 256, w % 256] ORDER BY i)) AS bs
        FROM wb GROUP BY id, kind, nwords)
      SELECT id AS media_id, kind, CAST(nwords * 4 AS BIGINT) AS n_bytes,
        list_reduce(list_prepend(0::BIGINT, bs),
          (a, b) -> (a * 131 + b) % 2147483647) AS checksum
      FROM bytes ORDER BY media_id""",

    // video blobs (kind_i = 2): n_frames = max(bytes/256, 1), every 2nd
    // frame sampled; last frame truncated when the blob is < 256 bytes
    "mm_frame_sample" -> """
      WITH ids AS (SELECT unnest(range(2000)) AS id),
      m AS (
        SELECT id,
          ('0x' || substr(md5(id::VARCHAR || '_k'), 1, 15))::BIGINT % 3 AS kind_i,
          (('0x' || substr(md5(id::VARCHAR || '_len'), 1, 15))::BIGINT % 257 + 16) * 4 AS nbytes
        FROM ids),
      vids AS (
        SELECT id, nbytes, greatest(nbytes // 256, 1) AS nf
        FROM m WHERE kind_i = 2),
      frames AS (
        SELECT id, nbytes, unnest(range(0, nf, 2)) AS idx FROM vids)
      SELECT id AS media_id, count(*) AS n_frames,
        CAST(sum(least(256, nbytes - idx * 256)) AS BIGINT) AS sampled_bytes
      FROM frames GROUP BY id ORDER BY media_id""",

    "ann_cosine_dup" -> """
      WITH v AS (
        SELECT vec_id AS id, embedding::DOUBLE[] AS v,
          sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        FROM embeddings)
      SELECT a.id AS id_a, b.id AS id_b,
        round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) AS cos
      FROM v a JOIN v b ON a.id < b.id
      WHERE list_dot_product(a.v, b.v) / (a.norm * b.norm) >= 0.4
      ORDER BY id_a, id_b""",

    "sql_passthrough" -> sqlPassthroughText,

    // the independent first-class implementation: DuckDB's native ASOF
    // JOIN (inclusive-past, a.ts >= b.ts), over the identically-deduped
    // right side
    "events_asof_join" -> """
      WITH clicks AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'click'),
      views AS (
        SELECT user_id, ts, event_id AS view_id, value AS view_value FROM (
          SELECT user_id, ts, event_id, value,
            row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
          FROM events WHERE event_type = 'view')
        WHERE rn = 1)
      SELECT c.event_id, c.user_id, c.ts, c.value,
        v.view_id AS asof_view_id, v.view_value AS asof_view_value
      FROM clicks c ASOF LEFT JOIN views v
        ON c.user_id = v.user_id AND c.ts >= v.ts
      ORDER BY c.event_id""",

    // 8 h inactivity gap, microsecond-exact (strict >); cents-sum so the
    // aggregate is order-independent across engines
    "events_sessionize" -> """
      WITH marked AS (
        SELECT user_id, ts, event_id, value,
          CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 28800000000
               THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, ts, value,
          CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS session_idx
        FROM marked)
      SELECT user_id, session_idx, count(*) AS n_events,
        min(ts) AS start_ts, max(ts) AS end_ts,
        CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      FROM sess GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx""",

    // the streaming twin's boundary rule: session_window closes at
    // last_event + gap EXCLUSIVE, so a gap of exactly 8 h splits (>=,
    // where the batch rule above is strict >); no tie column — membership
    // and the aggregates are order-independent within equal timestamps
    "events_sessionize_stream" -> """
      WITH marked AS (
        SELECT user_id, ts, value,
          CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 28800000000
               THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT user_id, ts, value,
          CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS session_idx
        FROM marked)
      SELECT user_id, min(ts) AS start_ts, max(ts) AS end_ts,
        count(*) AS n_events,
        CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      FROM sess GROUP BY user_id, session_idx
      ORDER BY user_id, start_ts""",

    "sample_stratified" -> """
      SELECT doc_id, lang, source, n_chars FROM documents
      WHERE ('0x' || substr(md5('graft' || doc_id::VARCHAR), 1, 15))::BIGINT % 100
          < CASE lang WHEN 'en' THEN 37 WHEN 'zh' THEN 11 ELSE 23 END
      ORDER BY doc_id""",

    "sample_topn_per_group" -> """
      SELECT doc_id, source, lang, sample_rank FROM (
        SELECT doc_id, source, lang,
          row_number() OVER (PARTITION BY source
            ORDER BY ('0x' || substr(md5('graft' || doc_id::VARCHAR), 1, 15))::BIGINT,
              doc_id) AS sample_rank
        FROM documents)
      WHERE sample_rank <= 7
      ORDER BY source, sample_rank""",

    // identical double arithmetic: maxabs is exact (float abs/max, then
    // one widening cast), q_i = round(x*127/maxabs) — both engines round
    // halves away from zero, so q_hash/q_l1/scale match bitwise
    "embed_quantize" -> """
      WITH q AS (
        SELECT vec_id, embedding,
          CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS maxabs
        FROM embeddings),
      qq AS (
        SELECT vec_id, maxabs / 127.0 AS scale,
          list_transform(embedding, x -> CASE WHEN maxabs = 0 THEN 0
            ELSE CAST(round(CAST(x AS DOUBLE) * 127.0 / maxabs) AS INT) END) AS qvec
        FROM q)
      SELECT vec_id, scale,
        md5(array_to_string(qvec, ',')) AS q_hash,
        CAST(list_sum(list_transform(qvec, x -> abs(x))) AS BIGINT) AS q_l1
      FROM qq ORDER BY vec_id""",

    // running token offset per source shard; HUGEINT-safe casts so the
    // window sum compares as BIGINT like the Spark longs
    "doc_pack" -> """
      WITH d AS (
        SELECT doc_id, source,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, source, n_tokens,
          CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
        FROM d)
      SELECT doc_id, source, n_tokens,
        CAST(cb // 256 AS BIGINT) AS pack_id,
        CAST(cb % 256 AS BIGINT) AS pack_offset
      FROM c ORDER BY source, doc_id""",

    // same distinct-3-gram sets as the dedup oracles, train side LEFT
    // JOINed to the deduped bench shingles; count(b.s) counts hits only
    "doc_decontam" -> s"""
      WITH tsh AS (${duckShinglesFrom("(SELECT * FROM documents WHERE doc_id % 37 <> 0)")}),
      bsh AS (SELECT DISTINCT s FROM
        (${duckShinglesFrom("(SELECT * FROM documents WHERE doc_id % 37 = 0)")})),
      agg AS (
        SELECT id, count(*) AS c, count(b.s) AS h
        FROM tsh LEFT JOIN bsh b USING (s) GROUP BY 1)
      SELECT id AS doc_id, CAST(c AS BIGINT) AS n_shingles,
        CAST(h AS BIGINT) AS n_hit,
        round(h::DOUBLE / c, 6) AS overlap_ratio,
        h::DOUBLE / c >= 0.5 AS contaminated
      FROM agg ORDER BY doc_id""",

    // 1-based inclusive list slices == Spark slice(toks, start, 64);
    // strided window count via integer ceil, min one chunk per doc
    "doc_chunks" -> """
      WITH d AS (
        SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        FROM documents),
      c AS (
        SELECT doc_id, t,
          CASE WHEN len(t) <= 64 THEN 1
               ELSE (len(t) - 64 + 31) // 32 + 1 END AS nc
        FROM d),
      e AS (SELECT doc_id, t, unnest(range(nc)) AS i FROM c)
      SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        array_to_string(t[i*32+1 : i*32+64], ' ') AS chunk_text,
        CAST(len(t[i*32+1 : i*32+64]) AS INT) AS chunk_tokens
      FROM e ORDER BY doc_id, chunk_idx""",

    // identical double arithmetic: n/w per source, global min, ppm
    // threshold floor'd to BIGINT; the binding source (n/w = kk) pins to
    // the full 10^6 exactly like Sampling.mixture; same md5 sampling key
    "mix_rebalance" -> """
      WITH c AS (
        SELECT source, CAST(count(*) AS DOUBLE) AS n,
          CAST(CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3 ELSE 0.2 END
               AS DOUBLE) AS w
        FROM documents WHERE source IN ('src0', 'src1', 'src2') GROUP BY 1),
      k AS (SELECT source, n, w, n / w AS t, min(n / w) OVER () AS kk FROM c),
      r AS (SELECT source,
        CASE WHEN t = kk THEN 1000000
             ELSE CAST(floor(least(kk * w / n, 1.0) * 1000000.0) AS BIGINT)
        END AS thresh FROM k)
      SELECT doc_id, source, lang, n_chars
      FROM documents JOIN r USING (source)
      WHERE ('0x' || substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
            % 1000000 < thresh
      ORDER BY doc_id""",

    // same injected PII, same RE2-safe patterns (interpolated from
    // TextOps so Spark and the oracle cannot drift), counts before/after
    // email redaction exactly like piiStats
    "text_redact" -> s"""
      WITH t AS (
        SELECT doc_id, text
          || CASE WHEN doc_id % 10 = 0
               THEN ' mail u' || CAST(doc_id AS VARCHAR) || '@example.com'
               ELSE '' END
          || CASE WHEN doc_id % 7 = 0
               THEN ' phone 555' || lpad(CAST(doc_id AS VARCHAR), 7, '0')
               ELSE '' END AS txt
        FROM documents),
      e AS (SELECT doc_id, txt,
        regexp_replace(txt, '${TextOps.emailRe}', '<EMAIL>', 'g') AS de
        FROM t)
      SELECT doc_id,
        CAST(len(regexp_extract_all(txt, '${TextOps.emailRe}')) AS INT) AS n_emails,
        CAST(len(regexp_extract_all(de, '${TextOps.longNumRe}')) AS INT) AS n_longnums,
        md5(regexp_replace(de, '${TextOps.longNumRe}', '<NUM>', 'g')) AS redacted_md5
      FROM e ORDER BY doc_id""",

    // bigram replication matches text_topk_ngrams; the per-doc mode is the
    // same O(distinct×n) list fold the Spark expression computes
    "text_repetition" -> """
      WITH d AS (
        SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        FROM documents),
      b AS (
        SELECT doc_id, t,
          [array_to_string(t[i+1:i+2], ' ') FOR i IN range(greatest(len(t)-1, 1))] AS bg
        FROM d)
      SELECT doc_id,
        round(1.0 - len(list_distinct(t))::DOUBLE / len(t), 6) AS dup_token_frac,
        round(list_max(list_transform(list_distinct(bg),
            g -> len(list_filter(bg, x -> x = g))))::DOUBLE / len(bg), 6) AS top_bigram_frac
      FROM b ORDER BY doc_id""",

    // bigram shingles replicated exactly like the 3-gram dedup oracles
    // (slice t[i+1:i+2], short docs yield their single truncated shingle)
    "text_topk_ngrams" -> """
      WITH toks AS (
        SELECT string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        FROM documents),
      grams AS (
        SELECT unnest([array_to_string(t[i+1:i+2], ' ')
                       FOR i IN range(greatest(len(t)-1, 1))]) AS ngram
        FROM toks),
      counted AS (
        SELECT ngram, count(*) AS cnt FROM grams
        WHERE len(ngram) > 0 GROUP BY ngram)
      SELECT ngram, cnt, rank FROM (
        SELECT ngram, cnt,
          row_number() OVER (ORDER BY cnt DESC, ngram ASC) AS rank
        FROM counted)
      WHERE rank <= 20 ORDER BY rank""",

    "docs_by_source" -> """
      SELECT source, lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        min(doc_id) AS min_doc
      FROM documents GROUP BY 1, 2 ORDER BY source, lang""")
}
