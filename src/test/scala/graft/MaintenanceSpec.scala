package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.model.Model.ChangeEvent
import graft.plans.Icelite
import graft.sources.{Changelog, FileIo}
import graft.streaming.{Ingest, Metrics}

/** Table maintenance (compaction, snapshot expiry), the dirty-record /
  * error-limit gate (reference F8/F9), streaming metrics, and file-format
  * source round-trips (reference S3/W6).
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  private def ev(op: String, conv: String, turn: Int, text: String,
      eventSec: Long, seq: Long): ChangeEvent =
    ChangeEvent(op, conv, turn,
      if (op == "D") null else "user",
      if (op == "D") null else text,
      null,
      if (op == "D") null else ts(eventSec),
      ts(eventSec), seq)

  private def batchOf(events: ChangeEvent*) = spark.createDataset(events).toDF()

  // ------------------------------------------------------------ maintenance

  test("compactAll folds deltas into base; reads unchanged; expire GCs files") {
    val root = tmpDir("maint")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 4,
      opts = Icelite.Options(compactThreshold = 100)) // never auto-compact
    val batches = (0 until 5).map { b =>
      batchOf((0 until 20).map(i =>
        ev(if (i % 7 == 0 && b > 0) "U" else "I", s"c${i % 5}", i,
          s"t$b-$i", b * 100 + i, b * 1000 + i)): _*)
    }
    Ingest.replay(spark, cfg, batches)
    val table = Icelite.load(spark, cfg.tablePath)
    val before = table.read().orderBy("conv_id", "turn_idx").collect()
    assert(table.snapshot().files.count(_.kind == "delta") > 0)

    val sid = table.compactAll()
    assert(sid === table.snapshot().snapshotId)
    assert(table.snapshot().files.forall(_.kind == "base"))
    val after = table.read().orderBy("conv_id", "turn_idx").collect()
    assert(after.toSeq === before.toSeq)
    // compacting again is a no-op
    assert(table.compactAll() === sid)

    // expire everything but the head; orphaned delta files get deleted
    val (expired, deleted) = table.expireSnapshots(keepLast = 1, orphanGraceMs = 0)
    assert(expired > 0 && deleted > 0)
    val after2 = table.read().orderBy("conv_id", "turn_idx").collect()
    assert(after2.toSeq === before.toSeq)
    // only referenced parquet files remain on disk
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(root, "t", "data"))
    val onDisk = try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.filter(p => p.toString.endsWith(".parquet")).size
    } finally walk.close()
    assert(onDisk === table.snapshot().files.size)
  }

  test("rebucket changes the bucket count; reads, lookup, and ingest continue") {
    val root = tmpDir("rebucket")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 4)
    val batches = (0 until 3).map { b =>
      batchOf((0 until 40).map(i =>
        ev(if (i == 13 && b == 2) "D" else if (i % 5 == 0 && b > 0) "U" else "I",
          s"c${i % 10}", i, s"t$b-$i", b * 100 + i, b * 1000 + i)): _*)
    }
    Ingest.replay(spark, cfg, batches)
    val table = Icelite.load(spark, cfg.tablePath)
    val before = table.read().orderBy("conv_id", "turn_idx").collect()
    val preSid = table.snapshot().snapshotId

    // widen 4 → 16: state identical, manifest buckets in the new range
    table.rebucket(16)
    val snap = table.snapshot()
    assert(snap.buckets === 16)
    assert(snap.files.forall(f => f.kind == "base" && f.bucket >= 0 && f.bucket < 16))
    assert(table.read().orderBy("conv_id", "turn_idx").collect().toSeq === before.toSeq)
    // bucket-pruned point lookup agrees with a full-scan filter
    val viaLookup = table.lookup("c3").orderBy("turn_idx").collect()
    val viaScan = table.read().filter(col("conv_id") === "c3")
      .orderBy("turn_idx").collect()
    assert(viaLookup.toSeq === viaScan.toSeq)
    // batch lookup: keys spanning several buckets + one absent key, one
    // call — equals the full-scan filter (and Nil returns an empty frame)
    val keys = Seq("c3", "c7", "c0", "nope")
    val viaBatch = table.lookup(keys).orderBy("conv_id", "turn_idx").collect()
    val viaScanB = table.read().filter(col("conv_id").isInCollection(keys))
      .orderBy("conv_id", "turn_idx").collect()
    assert(viaBatch.toSeq === viaScanB.toSeq && viaBatch.nonEmpty)
    assert(table.lookup(Seq.empty[String]).count() === 0)
    // same count is a no-op; shrinking also preserves state
    val sid16 = table.snapshot().snapshotId
    assert(table.rebucket(16) === sid16)
    table.rebucket(2)
    assert(table.snapshot().buckets === 2)
    assert(table.read().orderBy("conv_id", "turn_idx").collect().toSeq === before.toSeq)

    // ingest keeps working against the new layout (a fresh writer id —
    // the first writer's (w, batchId) gate would rightly skip a replayed
    // batch 0; applyBatch picks the bucket count up from the snapshot)
    Ingest.replay(spark, cfg.copy(writerId = "w2",
      checkpointDir = s"$root/ck2"), Seq(batchOf(
      ev("U", "c3", 1, "post-rebucket", 999, 99999),
      ev("I", "cNew", 0, "fresh", 999, 99998))))
    val rows = table.read().filter(col("conv_id").isin("c3", "cNew"))
      .filter(col("turn_idx") <= 1)
    assert(rows.filter(col("text") === "post-rebucket").count() === 1)
    assert(rows.filter(col("conv_id") === "cNew").count() === 1)
    // incremental read across the rebucket boundary still surfaces the
    // post-rebucket changes (conservative seq ranges may re-emit winners,
    // never lose them)
    val inc = table.changesSince(preSid)
    assert(inc.filter(col("conv_id") === "cNew").count() >= 1)

    // tombstone survived both rewrites: the deleted turn stays deleted
    assert(table.read().filter(col("conv_id") === "c3" && col("turn_idx") === 13)
      .count() === 0)
  }

  test("dropTombstones compaction of an all-tombstone table stages nothing, commits") {
    val root = tmpDir("all-tomb")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 2,
      opts = Icelite.Options(compactThreshold = 100))
    Ingest.replay(spark, cfg, Seq(
      batchOf(ev("I", "c1", 0, "x", 1, 1)),
      batchOf(ev("D", "c1", 0, null, 2, 2))))
    val table = Icelite.load(spark, cfg.tablePath)
    val sid = table.compactAll(dropTombstones = true)
    assert(sid === table.snapshot().snapshotId)
    assert(table.snapshot().files.isEmpty) // every row was a dropped tombstone
    assert(table.read().count() === 0)
  }

  test("retention contract: expiry spares in-flight staged files and retained time travel") {
    val root = tmpDir("retain")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 2,
      opts = Icelite.Options(compactThreshold = 100))
    Ingest.replay(spark, cfg, Seq(
      batchOf(ev("I", "c1", 0, "v1", 1, 1)),
      batchOf(ev("U", "c1", 0, "v2", 2, 2)),
      batchOf(ev("I", "c2", 0, "w", 3, 3))))
    val table = Icelite.load(spark, cfg.tablePath)
    val hist = table.history().map(_.snapshotId)
    val sMid = hist(hist.size - 2)
    val atMid = table.readAt(sMid).orderBy("conv_id", "turn_idx").collect()

    // a stale orphan: unreferenced AND older than the grace window — the
    // sweep must take THIS and spare the in-flight writer's fresh files
    val orphanDir = java.nio.file.Paths.get(root, "t", "data", "d-999-dead", "bkt=0")
    java.nio.file.Files.createDirectories(orphanDir)
    val orphan = orphanDir.resolve("part-stale.parquet")
    java.nio.file.Files.write(orphan, Array[Byte](1, 2, 3))
    java.nio.file.Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 7200000L))

    // deterministic race (same seam as the commit-race tests): expiry
    // runs INSIDE the merge's commit window — after the merge staged its
    // delta files, before the snapshot referencing them exists
    var expired: Option[(Int, Int)] = None
    table.beforeCommit = () => if (expired.isEmpty) {
      expired = Some(Icelite.load(spark, cfg.tablePath)
        .expireSnapshots(keepLast = 2, orphanGraceMs = 3600000L,
          deepGc = true)) // the stale orphan was never committed — only
                          // the deep walk can see it
    }
    try {
      val stats = table.merge(batchOf(ev("I", "c3", 0, "x", 4, 4)),
        batchId = 100L, writerId = "w")
      assert(!stats.skipped)
    } finally table.beforeCommit = () => ()
    assert(expired.exists(_._1 >= 1)) // old snapshots really expired mid-race
    assert(!java.nio.file.Files.exists(orphan)) // stale orphan swept
    // the racing writer's staged files survived the sweep: its commit's
    // rows are all readable
    assert(table.read().filter(col("conv_id") === "c3").count() === 1)
    // retained snapshot: time travel yields the identical rows post-expiry
    assert(table.readAt(sMid).orderBy("conv_id", "turn_idx").collect().toSeq
      === atMid.toSeq)
    // expired snapshot is gone by design
    intercept[Exception] { table.readAt(hist.head).count() }
  }

  test("manifest stats are write-side: exact rows, measured rebucket seq ranges prune changesSince") {
    val root = tmpDir("manifest-stats")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 4,
      opts = Icelite.Options(compactThreshold = 100))
    // batch 0 touches every conversation (all buckets), seqs 0..79
    Ingest.replay(spark, cfg, Seq(batchOf((0 until 80).map(i =>
      ev("I", s"c${i % 16}", i / 16, s"t$i", i, i.toLong)): _*)))
    val table = Icelite.load(spark, cfg.tablePath)
    // non-collapsing delta append: per-BUCKET manifest row sums equal the
    // batch's input rows exactly, with no footer read on the commit path
    assert(table.snapshot().files.map(_.rows).sum === 80L)
    val s1 = table.snapshot().snapshotId
    val fromMax = table.snapshot().files.map(_.maxSeq).max
    assert(fromMax === 79L)

    // batch 1 touches ONLY c3 (one bucket), far-future seqs
    Ingest.replay(spark, cfg.copy(checkpointDir = s"$root/ck2", writerId = "w2"),
      Seq(batchOf(ev("U", "c3", 0, "late", 900, 9000L),
        ev("U", "c3", 1, "late2", 901, 9001L))))

    table.rebucket(8)
    val snap = table.snapshot()
    // measured (post-LWW) rows: manifest sum equals the physical row count
    assert(snap.files.map(_.rows).sum === table.readRaw().count())
    // measured per-file seq ranges: only the bucket holding c3 can carry
    // seqs past s1 — the other buckets' files prune out of changesSince
    // (the old conservative global range kept ALL files in scope)
    val c3Bucket = Icelite.bucketOfKey("c3", snap.buckets)
    val unpruned = snap.files.filter(_.maxSeq > fromMax)
    assert(unpruned.nonEmpty && unpruned.forall(_.bucket === c3Bucket))
    assert(snap.files.exists(_.maxSeq <= fromMax)) // something actually pruned
    val inc = table.changesSince(s1).select("conv_id", "turn_idx", "text")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(inc === Set(("c3", 0, "late"), ("c3", 1, "late2")))
  }

  test("large file lists spill to a gzipped side manifest; reads and GC unaffected") {
    val root = tmpDir("manifest")
    sys.props("graft.manifest.inlineMax") = "4"
    try {
      val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 8,
        opts = Icelite.Options(compactThreshold = 100)) // keep deltas: many files
      val batches = (0 until 3).map { b =>
        batchOf((0 until 32).map(i =>
          ev("I", s"c$i", b, s"t$b-$i", b * 100 + i, b * 1000 + i)): _*)
      }
      Ingest.replay(spark, cfg, batches)
      val table = Icelite.load(spark, cfg.tablePath)
      val snap = table.snapshot()
      assert(snap.files.size > 4)          // inflated in memory
      assert(snap.manifestRef.isDefined)   // spilled on disk
      // the version JSON itself carries no inline file list
      val raw = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(root, "t", "_icelite",
          f"v${snap.snapshotId}%010d.json")))
      assert(raw.contains("\"files\":[]") && raw.contains("\"manifestRef\""))
      // reads plan off the inflated manifest as before
      val before = table.read().orderBy("conv_id", "turn_idx").collect()
      assert(before.length === 96)
      assert(table.lookup("c7").count() === 3)
      // expiry drops old snapshots' manifests but keeps the referenced one
      table.expireSnapshots(keepLast = 1, orphanGraceMs = 0)
      val manifests = {
        val ls = java.nio.file.Files.list(
          java.nio.file.Paths.get(root, "t", "_icelite"))
        try {
          import scala.jdk.CollectionConverters._
          ls.iterator().asScala.map(_.getFileName.toString)
            .filter(_.startsWith("m-")).toList
        } finally ls.close()
      }
      assert(manifests === List(snap.manifestRef.get.stripPrefix("_icelite/")))
      assert(table.read().orderBy("conv_id", "turn_idx").collect().toSeq
        === before.toSeq)
    } finally sys.props.remove("graft.manifest.inlineMax")
  }

  test("crash between data write and commit leaves invisible orphans; GC removes them") {
    val root = tmpDir("crash")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 2)
    Ingest.applyBatch(spark, cfg,
      batchOf(ev("I", "c1", 0, "a", 1, 1), ev("I", "c2", 0, "b", 2, 2)), 0L)
    val table = Icelite.load(spark, cfg.tablePath)
    val before = table.read().orderBy("conv_id", "turn_idx").collect()
    val sid = table.snapshot().snapshotId

    // simulate a writer that crashed after staging data but before the
    // atomic metadata link: orphan data dir + tmp metadata file
    val orphanDir = java.nio.file.Paths.get(cfg.tablePath, "data", s"d-${sid + 1}", "bkt=0")
    java.nio.file.Files.createDirectories(orphanDir)
    java.nio.file.Files.writeString(orphanDir.resolve("part-orphan.parquet"), "not parquet")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(cfg.tablePath, "_icelite", s".tmp-${sid + 1}-dead"), "{}")

    // reads plan from the manifest, so the orphan is invisible
    assert(table.read().orderBy("conv_id", "turn_idx").collect().toSeq === before.toSeq)
    // the table recovers: next merge commits fine (snapshot id advances past
    // the orphan generation), and snapshot expiry deletes the orphan file
    val st = Ingest.applyBatch(spark, cfg, batchOf(ev("I", "c3", 0, "c", 3, 3)), 1L)
    assert(st.snapshotId === sid + 1)
    // never-committed staged output is invisible to the targeted
    // manifest-diff — the deep tree walk is the mode that sweeps it
    val (_, deletedTargeted) = table.expireSnapshots(keepLast = 1, orphanGraceMs = 0)
    assert(java.nio.file.Files.exists(orphanDir.resolve("part-orphan.parquet")),
      s"targeted expiry must not walk the tree (deleted $deletedTargeted)")
    val (_, deleted) = table.expireSnapshots(keepLast = 1, orphanGraceMs = 0,
      deepGc = true)
    assert(deleted >= 1)
    assert(!java.nio.file.Files.exists(orphanDir.resolve("part-orphan.parquet")))
    assert(table.read().count() === 3)
  }

  test("lineage roll-up: JSONL folds to parquet; lineage() identical across the roll") {
    val root = tmpDir("linroll")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 2)
    (0 until 5).foreach(b => Ingest.applyBatch(spark, cfg,
      batchOf(ev("I", s"c$b", 0, s"t$b", b + 1, b + 1)), b.toLong))
    val before = Ingest.lineage(spark, cfg).orderBy("batch_id", "shard").collect()
    assert(before.length === 5)
    def liveFiles() = {
      val walk = java.nio.file.Files.walk(
        java.nio.file.Paths.get(root, "t", "_lineage"))
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .filter(p => p.getFileName.toString.endsWith(".jsonl")).size
      } finally walk.close()
    }
    assert(liveFiles() === 5)
    // everything but the newest batch's file rolls (that one is the
    // checkpoint-replay idempotence probe)
    assert(Ingest.rollupLineage(spark, cfg) === 4)
    assert(liveFiles() === 1)
    val after = Ingest.lineage(spark, cfg).orderBy("batch_id", "shard").collect()
    assert(after.toSeq === before.toSeq)
    // immediate re-roll is a no-op
    assert(Ingest.rollupLineage(spark, cfg) === 0)
    // new batches keep accruing and a later roll keeps the union intact
    (5 until 8).foreach(b => Ingest.applyBatch(spark, cfg,
      batchOf(ev("I", s"c$b", 0, s"t$b", b + 1, b + 1)), b.toLong))
    assert(Ingest.rollupLineage(spark, cfg) === 3) // batches 4,5,6 (7 stays live)
    val full = Ingest.lineage(spark, cfg).orderBy("batch_id", "shard").collect()
    assert(full.length === 8)
    assert(full.take(5).toSeq === before.toSeq)
    // a checkpoint replay of the LAST batch after the roll does not
    // double-write lineage (the probe still sees its live file)
    val st = Ingest.applyBatch(spark, cfg,
      batchOf(ev("I", "c7", 0, "t7", 8, 8)), 7L)
    assert(st.skipped)
    assert(Ingest.lineage(spark, cfg).count() === 8)
  }

  test("history lists snapshots; changesSince returns only newer row versions") {
    val root = tmpDir("inc")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 2)
    Ingest.applyBatch(spark, cfg,
      batchOf(ev("I", "c1", 0, "v1", 1, 1), ev("I", "c2", 0, "x", 2, 2)), 0L)
    val table = Icelite.load(spark, cfg.tablePath)
    val s1 = table.snapshot().snapshotId
    Ingest.applyBatch(spark, cfg,
      batchOf(ev("U", "c1", 0, "v2", 3, 3), ev("D", "c2", 0, null, 4, 4)), 1L)
    Ingest.applyBatch(spark, cfg, batchOf(ev("I", "c3", 1, "y", 5, 5)), 2L)

    assert(table.history().map(_.snapshotId) === Seq(0L, 1L, 2L, 3L))

    val changes = table.changesSince(s1)
      .select("conv_id", "turn_idx", "text", "_seq", "_deleted")
      .orderBy("_seq").collect()
    assert(changes.map(_.getLong(3)).toSeq === Seq(3L, 4L, 5L)) // seqs 1,2 excluded
    assert(changes(1).getBoolean(4)) // the delete arrives as a tombstone version
    // net changes = LWW over the incremental read
    val net = graft.operators.Lww.latest(table.changesSince(s1),
      Seq("conv_id", "turn_idx"), Seq("_event_ts", "_seq"))
    assert(net.count() === 3)

    // changes survive compaction: manifest seq pruning + row filter
    table.compactAll()
    val afterCompact = table.changesSince(s1).select("_seq").collect().map(_.getLong(0)).sorted
    assert(afterCompact.toSeq === Seq(3L, 4L, 5L))
    assert(table.changesSince(table.snapshot().snapshotId).count() === 0)
  }

  test("metadata tables: filesDf mirrors the manifest, snapshotsDf the history") {
    val root = tmpDir("meta")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 2)
    Ingest.applyBatch(spark, cfg,
      batchOf(ev("I", "c1", 0, "v1", 1, 1), ev("I", "c2", 0, "x", 2, 2)), 0L)
    Ingest.applyBatch(spark, cfg, batchOf(ev("U", "c1", 0, "v2", 3, 3)), 1L)
    val table = Icelite.load(spark, cfg.tablePath)
    val snap = table.snapshot()

    val files = table.filesDf().collect()
    assert(files.length === snap.files.size)
    // per-bucket manifest row sums surface exactly
    val byBucket = files.groupBy(_.getInt(1)).view
      .mapValues(_.map(_.getLong(3)).sum).toMap
    snap.files.groupBy(_.bucket).foreach { case (b, fs) =>
      assert(byBucket(b) === fs.map(_.rows).sum)
    }
    assert(files.forall(r => r.getLong(5) <= r.getLong(6))) // min_seq <= max_seq

    val snaps = table.snapshotsDf().orderBy("snapshot_id").collect()
    assert(snaps.map(_.getLong(0)).toSeq === table.history().map(_.snapshotId))
    assert(snaps.map(_.getLong(1)).toSeq === snaps.map(_.getLong(0)).map(_ - 1))
    // row totals are write-side stats: the latest snapshot's total equals
    // the physical row count (3 versions: 2 inserts + 1 delta upsert)
    assert(snaps.last.getLong(7) === 3L)
    assert(snaps.last.getLong(6) === snap.files.size.toLong)

    // legacy manifests (rows = -1 = unknown) clamp to 0 in n_rows like
    // every other consumer — they must not SUBTRACT from the total
    val vf = java.nio.file.Paths.get(cfg.tablePath, "_icelite",
      f"v${snap.snapshotId}%010d.json")
    java.nio.file.Files.writeString(vf, java.nio.file.Files.readString(vf)
      .replaceAll(""""rows":\d+""", """"rows":-1"""))
    val legacyRows = Icelite.load(spark, cfg.tablePath).snapshotsDf()
      .orderBy("snapshot_id").collect().last.getLong(7)
    assert(legacyRows === 0L)
  }

  test("readAt time-travels: old snapshot unchanged by later upserts/deletes") {
    val root = tmpDir("tt")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 2)
    Ingest.applyBatch(spark, cfg,
      batchOf(ev("I", "c1", 0, "v1", 1, 1), ev("I", "c2", 0, "x", 2, 2)), 0L)
    val table = Icelite.load(spark, cfg.tablePath)
    val s1 = table.snapshot().snapshotId
    val before = table.read().orderBy("conv_id", "turn_idx").collect()
    Ingest.applyBatch(spark, cfg,
      batchOf(ev("U", "c1", 0, "v2", 3, 3), ev("D", "c2", 0, null, 4, 4)), 1L)
    // current read sees the update + delete; readAt(s1) still sees v1 and c2
    assert(table.read().count() === 1)
    val asOf = table.readAt(s1).orderBy("conv_id", "turn_idx").collect()
    assert(asOf.toSeq === before.toSeq)
    assert(table.readAt(table.snapshot().snapshotId).count() === 1)
  }

  test("rollbackTo reverts state AND the exactly-once gate; re-apply converges") {
    val root = tmpDir("rb")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 2)
    val b1 = batchOf(ev("U", "c1", 0, "v2", 3, 3), ev("D", "c2", 0, null, 4, 4))
    Ingest.applyBatch(spark, cfg,
      batchOf(ev("I", "c1", 0, "v1", 1, 1), ev("I", "c2", 0, "x", 2, 2)), 0L)
    val table = Icelite.load(spark, cfg.tablePath)
    val s1 = table.snapshot().snapshotId
    val mid = table.read().orderBy("conv_id", "turn_idx").collect()
    Ingest.applyBatch(spark, cfg, b1, 1L)
    val s2 = table.snapshot().snapshotId
    val fin = table.read().orderBy("conv_id", "turn_idx").collect()

    val head = table.rollbackTo(s1)
    assert(head === s2 + 1)
    // the CURRENT read (head, not time travel) is back to the target state
    assert(table.read().orderBy("conv_id", "turn_idx").collect().toSeq === mid.toSeq)
    // gate reverted with the state
    assert(table.snapshot().lastBatchId === 0L)
    assert(table.snapshot().summary("rollback.to") === s1.toString)
    // history is append-only: the rolled-back snapshot stays readable
    assert(table.readAt(s2).orderBy("conv_id", "turn_idx").collect().toSeq === fin.toSeq)

    // re-applying the undone batch is NOT skipped and converges to the
    // same final state (what a checkpoint-resumed stream does)
    val re = Ingest.applyBatch(spark, cfg, b1, 1L)
    assert(!re.skipped)
    assert(table.read().orderBy("conv_id", "turn_idx").collect().toSeq === fin.toSeq)
    // ...and re-applying it AGAIN hits the reverted-then-advanced gate
    assert(Ingest.applyBatch(spark, cfg, b1, 1L).skipped)
  }

  test("rollback head protects old files across expiry; race rebases (last rollback wins)") {
    val root = tmpDir("rbgc")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 2,
      opts = Icelite.Options(compactThreshold = 0)) // CoW: later commits rewrite files
    Ingest.applyBatch(spark, cfg, batchOf(ev("I", "c1", 0, "v1", 1, 1)), 0L)
    val table = Icelite.load(spark, cfg.tablePath)
    val s1 = table.snapshot().snapshotId
    Ingest.applyBatch(spark, cfg, batchOf(ev("U", "c1", 0, "v2", 2, 2)), 1L)
    table.rollbackTo(s1)
    // expire every pre-rollback snapshot; the files the head re-references
    // must survive the GC because the head still names them
    table.expireSnapshots(keepLast = 1, orphanGraceMs = 0)
    val r = table.read().collect()
    assert(r.length === 1 && r.head.getAs[String]("text") === "v1")

    // race: a competing commit lands inside the rollback's commit window;
    // the rollback rebases onto it and still forces the target state
    Ingest.applyBatch(spark, cfg, batchOf(ev("U", "c1", 0, "v3", 3, 3)), 2L)
    val sTarget = table.snapshot().snapshotId // state with v3
    Ingest.applyBatch(spark, cfg, batchOf(ev("U", "c1", 0, "v4", 4, 4)), 3L)
    var raced = false
    table.beforeCommit = () => if (!raced) {
      raced = true
      Ingest.applyBatch(spark, cfg, batchOf(ev("U", "c1", 0, "v5", 5, 5)), 4L)
    }
    table.rollbackTo(sTarget)
    table.beforeCommit = () => ()
    assert(raced)
    assert(table.read().collect().head.getAs[String]("text") === "v3")
  }

  test("snapshotIdAsOf resolves timestamp time-travel; readAsOf reads it") {
    val root = tmpDir("asof")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 2)
    Ingest.applyBatch(spark, cfg, batchOf(ev("I", "c1", 0, "v1", 1, 1)), 0L)
    val table = Icelite.load(spark, cfg.tablePath)
    val s1 = table.snapshot()
    Thread.sleep(5) // distinct commit timestamps
    Ingest.applyBatch(spark, cfg, batchOf(ev("U", "c1", 0, "v2", 2, 2)), 1L)
    val s2 = table.snapshot()
    assert(table.snapshotIdAsOf(s1.committedAtMs) === s1.snapshotId)
    assert(table.snapshotIdAsOf(s2.committedAtMs - 1) === s1.snapshotId)
    assert(table.snapshotIdAsOf(System.currentTimeMillis()) === s2.snapshotId)
    assert(table.readAsOf(s1.committedAtMs).collect()
      .head.getAs[String]("text") === "v1")
    intercept[IllegalArgumentException](table.snapshotIdAsOf(s1.committedAtMs - 100000))
  }

  test("changesSince survives a compaction triggered by a late low-seq batch") {
    val root = tmpDir("latecompact")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 1,
      opts = Icelite.Options(compactThreshold = 2))
    Ingest.applyBatch(spark, cfg, batchOf(ev("I", "c1", 0, "a", 1, 10)), 0L)
    val table = Icelite.load(spark, cfg.tablePath)
    val s1 = table.snapshot().snapshotId
    Ingest.applyBatch(spark, cfg, batchOf(ev("I", "c2", 0, "b", 2, 100)), 1L)
    // a LATE batch (low seqs) pushes the bucket over the threshold: the
    // compacted base file's manifest range must cover the REWRITTEN rows
    // (up to seq 100), not just the late batch — else changesSince prunes
    // the file and silently loses the committed seq-100 change
    Ingest.applyBatch(spark, cfg, batchOf(ev("I", "c3", 0, "late", 0, 5)), 2L)
    assert(table.snapshot().files.forall(_.kind == "base"))
    val seqs = table.changesSince(s1).select("_seq").collect().map(_.getLong(0)).toSet
    assert(seqs === Set(100L)) // seq 5 < fromMax(10) excluded by contract; 100 retained
  }

  test("dryRun validates binlog, schema evolution, and checkpoint state") {
    val root = tmpDir("dry")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 2)
    val ch = batchOf(ev("I", "c1", 0, "a", 1, 1))
    Changelog.writeBinlog(ch, s"$root/binlog", shards = 1, segSize = 10)

    val checks = Ingest.dryRun(spark, cfg, s"$root/binlog")
    assert(checks.exists(_.contains("binlog readable")))
    assert(checks.exists(_.contains("table absent")))
    assert(checks.exists(_.contains("no checkpoint")))

    intercept[IllegalArgumentException] {
      Ingest.dryRun(spark, cfg, s"$root/nonexistent")
    }
    // a "binlog" missing the op column fails the contract check
    spark.range(3).select($"id".as("conv_id")).write.parquet(s"$root/bad")
    val e = intercept[IllegalArgumentException] { Ingest.dryRun(spark, cfg, s"$root/bad") }
    assert(e.getMessage.contains("required columns"))

    // after a real run: table present + checkpoint present
    Ingest.runStream(spark, cfg, s"$root/binlog")
    val checks2 = Ingest.dryRun(spark, cfg, s"$root/binlog")
    assert(checks2.exists(_.contains("schema evolvable")))
    assert(checks2.exists(_.contains("checkpoint present")))
  }

  // ------------------------------------------------------------ concurrency

  test("optimistic commit retry: merge rebases over a concurrent compaction") {
    val root = tmpDir("ccr1")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 2,
      opts = Icelite.Options(compactThreshold = 100)) // keep deltas around
    Ingest.replay(spark, cfg, Seq(batchOf(
      ev("I", "c1", 0, "a", 1, 1), ev("I", "c2", 0, "b", 1, 2))))
    val t = Icelite.load(spark, cfg.tablePath)
    val maint = Icelite.load(spark, cfg.tablePath)
    val base = t.snapshot().snapshotId
    // interleave a full compaction into the merge's commit window — the
    // merge's first attempt conflicts and must rebase onto the new head
    var fired = false
    t.beforeCommit = () => if (!fired) { fired = true; maint.compactAll() }
    val stats = t.merge(batchOf(ev("U", "c1", 0, "a2", 5, 10)), 1L, "w", cfg.opts)
    assert(fired)
    assert(!stats.skipped)
    assert(stats.snapshotId === base + 2) // compaction took base+1
    val got = t.read().select("conv_id", "turn_idx", "text")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got === Set(("c1", 0, "a2"), ("c2", 0, "b")))
    // the maintenance commit sits between the two ingest snapshots
    assert(t.snapshotAt(base + 1).summary.get("maintenance").contains("compact"))
  }

  test("optimistic commit retry: compaction rebases over a concurrent merge") {
    val root = tmpDir("ccr2")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 2,
      opts = Icelite.Options(compactThreshold = 100))
    Ingest.replay(spark, cfg, Seq(batchOf(
      ev("I", "c1", 0, "a", 1, 1), ev("I", "c2", 0, "b", 1, 2))))
    val t = Icelite.load(spark, cfg.tablePath)
    val writer = Icelite.load(spark, cfg.tablePath)
    var fired = false
    t.beforeCommit = () => if (!fired) {
      fired = true
      writer.merge(batchOf(ev("I", "c3", 0, "c", 6, 20)), 1L, "w", cfg.opts)
    }
    val sid = t.compactAll()
    assert(fired)
    val snap = t.snapshot()
    assert(snap.snapshotId === sid)
    // the interleaved merge's rows AND its idempotence gate survive the
    // rebased compaction (base.copy keeps the winner's writerId/batchId)
    assert(snap.writerId === "w" && snap.lastBatchId === 1L)
    val got = t.read().select("conv_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("c1", "a"), ("c2", "b"), ("c3", "c")))
  }

  // ------------------------------------------------------------ dirty gate

  test("dirty rows route to dead-letter; clean rows merge; limit trips") {
    val root = tmpDir("dirty")
    val dl = s"$root/dead"
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 2,
      deadLetterDir = Some(dl), errorPctLimit = 0.5)
    val good = Seq(ev("I", "c1", 0, "a", 1, 1), ev("I", "c1", 1, "b", 2, 2))
    val bad = Seq(
      ChangeEvent("X", "c9", 0, "u", "t", null, ts(1), ts(1), 50), // bad op
      ChangeEvent("I", null, 1, "u", "t", null, ts(1), ts(1), 51)) // null key
    val stats = Ingest.applyBatch(spark, cfg, batchOf(good ++ bad: _*), 0L)
    assert(stats.inputRows === 2) // only clean rows reached the merge
    val dead = spark.read.parquet(dl)
    assert(dead.count() === 2)
    assert(dead.columns.contains("_batch_id"))
    val live = Icelite.load(spark, cfg.tablePath).read()
    assert(live.count() === 2)

    // replaying the SAME batch (checkpoint recovery) must not re-append
    // dead-letter rows — the idempotence pre-check runs before the gate
    val replay = Ingest.applyBatch(spark, cfg, batchOf(good ++ bad: _*), 0L)
    assert(replay.skipped)
    assert(spark.read.parquet(dl).count() === 2)

    // 3 dirty of 4 > 50% ⇒ gate trips, nothing merged, dead-letter kept
    val mostlyBad = batchOf(
      ev("I", "c2", 0, "ok", 3, 60),
      ChangeEvent("?", "c9", 1, null, null, null, ts(1), ts(1), 61),
      ChangeEvent("I", "c9", 2, null, null, null, ts(1), null, 62),
      ChangeEvent(null, "c9", 3, null, null, null, ts(1), ts(1), 63))
    intercept[Ingest.ErrorLimitExceeded] {
      Ingest.applyBatch(spark, cfg, mostlyBad, 1L)
    }
    assert(Icelite.load(spark, cfg.tablePath).read().count() === 2) // unchanged
    assert(spark.read.parquet(dl).count() === 5)
  }

  test("dirty collector reports a bounded sample; a failing collector never fails the batch") {
    import graft.streaming.{DirtyCollector, HttpDirtyCollector}
    val root = tmpDir("dirty-coll")
    // HTTP-shaped collector with an injected transport (no egress here):
    // records every POST so the rendering/batching contract is assertable
    val posts = scala.collection.mutable.ListBuffer.empty[(String, String)]
    val http = new HttpDirtyCollector("http://ops.example/dirty",
      (url, body) => { posts += ((url, body)); 200 })
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 2,
      dirtyCollector = Some(http))
    val batch = batchOf(
      ev("I", "c1", 0, "a", 1, 1),
      ChangeEvent("X", "c9", 0, "u", "t", null, ts(1), ts(1), 50),
      ChangeEvent("I", null, 1, "u", "t", null, ts(1), ts(1), 51))
    val stats = Ingest.applyBatch(spark, cfg, batch, 0L)
    assert(stats.inputRows === 1) // collector is reporting-only; gate still drops
    assert(posts.size === 1)
    val (url, body) = posts.head
    assert(url === "http://ops.example/dirty")
    assert(body.contains(""""batchId":0""") && body.contains(""""dirty":2""")
      && body.contains(""""total":3""") && body.contains(""""op":"X""""))

    // a collector that throws must not fail the batch (best-effort contract)
    val angry = new DirtyCollector {
      override def collect(b: Long, d: org.apache.spark.sql.DataFrame,
          n: Long, t: Long): Unit = throw new RuntimeException("endpoint down")
    }
    val cfg2 = Ingest.Config(s"$root/t2", s"$root/ck2", "w", buckets = 2,
      dirtyCollector = Some(angry))
    val ok = Ingest.applyBatch(spark, cfg2, batch, 0L)
    assert(ok.inputRows === 1)
    assert(Icelite.load(spark, cfg2.tablePath).read().count() === 1)
  }

  test("absolute error-record limit wins over the percentage (F9)") {
    val root = tmpDir("reclim")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 2,
      deadLetterDir = Some(s"$root/dead"), errorPctLimit = 1.0,
      errorRecordLimit = Some(1L))
    // 2 dirty of 4 = 50% — passes the pct limit but trips the record limit
    val batch = batchOf(
      ev("I", "c1", 0, "a", 1, 1), ev("I", "c1", 1, "b", 1, 2),
      ChangeEvent("X", "c9", 0, "u", "t", null, ts(1), ts(1), 50),
      ChangeEvent(null, "c9", 1, null, null, null, ts(1), ts(1), 51))
    val e = intercept[Ingest.ErrorLimitExceeded] {
      Ingest.applyBatch(spark, cfg, batch, 0L)
    }
    assert(e.getMessage.contains("record limit"))
    assert(spark.read.parquet(s"$root/dead").count() === 2)

    // limits must fire WITHOUT a dead-letter sink too (the gate is not
    // tied to the collector, matching ErrorRecordChecker)
    val cfgNoDl = Ingest.Config(s"$root/t2", s"$root/ck2", "w", buckets = 2,
      errorRecordLimit = Some(1L))
    intercept[Ingest.ErrorLimitExceeded] {
      Ingest.applyBatch(spark, cfgNoDl, batch, 0L)
    }
    // and under the limits, dirty rows are dropped, clean rows merge
    val cfgLoose = Ingest.Config(s"$root/t3", s"$root/ck3", "w", buckets = 2,
      errorRecordLimit = Some(10L))
    val st = Ingest.applyBatch(spark, cfgLoose, batch, 0L)
    assert(st.inputRows === 2)
  }

  test("pre/post hooks run around replay (reference preSql/postSql)") {
    val root = tmpDir("hooks")
    val order = scala.collection.mutable.ListBuffer.empty[String]
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 2,
      preHook = Some(_ => order += "pre"),
      postHook = Some(_ => order += "post"))
    Ingest.replay(spark, cfg, Seq(batchOf(ev("I", "c1", 0, "a", 1, 1))))
    order += "done"
    assert(order.toSeq === Seq("pre", "post", "done"))
  }

  // ------------------------------------------------------------ metrics

  test("streaming ingest mirrors per-batch progress metrics") {
    val root = tmpDir("metrics")
    val binlog = s"$root/binlog"
    val ch = spark.createDataset((0 until 40).map(i =>
      ev("I", s"c${i % 4}", i % 10, s"m$i", i, i))).toDF()
    Changelog.writeBinlog(ch, binlog, shards = 2, segSize = 10)
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 2,
      maxFilesPerTrigger = 2, metricsDir = Some(s"$root/metrics"))
    Ingest.runStream(spark, cfg, binlog)
    // the mirror rides the async listener bus: the final progress event
    // can land after awaitTermination returns — poll briefly (observed
    // flaking only under heavy external machine load)
    def sumRows(): Long = Metrics.rates(spark, s"$root/metrics")
      .agg(sum($"rows")).head().getLong(0)
    val deadline = System.currentTimeMillis() + 15000
    while (sumRows() != 40L && System.currentTimeMillis() < deadline)
      Thread.sleep(250)
    val rates = Metrics.rates(spark, s"$root/metrics")
    assert(rates.count() >= 2) // several micro-batches
    assert(rates.agg(sum($"rows")).head().getLong(0) === 40L)
    assert(rates.select("trigger_ms").collect().forall(!_.isNullAt(0)))
  }

  // ------------------------------------------------------------ file io

  test("CSV and JSONL round-trip with delimiter/header/null/gzip options") {
    val root = tmpDir("fileio")
    val df = Seq(
      (1L, "a,b\t\"quoted\"", Some(1.5), Some(ts(1))),
      (2L, null, None, None),
      (3L, "plain", Some(-0.25), Some(ts(909)))).toDF("id", "s", "d", "t")
    val o = FileIo.TextOptions(delimiter = "\t", header = true, compress = Some("gzip"))
    FileIo.writeCsv(df, s"$root/csv", o)
    // files really are gzip
    val gz = new java.io.File(s"$root/csv").listFiles()
      .exists(_.getName.endsWith(".csv.gz"))
    assert(gz)
    val back = FileIo.readCsv(spark, s"$root/csv", df.schema, o).orderBy("id")
    assert(back.collect().toSeq === df.orderBy("id").collect().toSeq)

    FileIo.writeJsonl(df, s"$root/jsonl", o)
    val backJ = FileIo.readJsonl(spark, s"$root/jsonl", df.schema, o).orderBy("id")
    assert(backJ.collect().toSeq === df.orderBy("id").collect().toSeq)

    // const columns (reference const-value column spec)
    val withConst = FileIo.readCsv(spark, s"$root/csv", df.schema, o,
      constCols = Seq("src" -> lit("csv")))
    assert(withConst.select("src").distinct().head().getString(0) === "csv")
  }

  // ------------------------------------------------------------ cell shaping

  test("cellChanges explodes I/U into per-cell rows and D into DR markers") {
    val ch = batchOf(
      ev("I", "c1", 0, "hello", 1, 1),
      ev("U", "c1", 0, "world", 2, 2),
      ev("D", "c1", 0, null, 3, 3))
    val cells = Changelog.cellChanges(ch).orderBy("seq", "column_name").collect()
    // I/U rows: role+text+ts-as-cells? — role, text (tool null ⇒ absent)
    val upserts = cells.filter(_.getString(4) == "U")
    assert(upserts.map(_.getString(2)).toSet === Set("role", "text"))
    assert(upserts.length === 4) // 2 events × (role, text)
    val dr = cells.filter(_.getString(4) == "DR")
    assert(dr.length === 1 && dr(0).isNullAt(2) && dr(0).isNullAt(3))
  }
}
