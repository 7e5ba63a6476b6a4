package graft

import java.sql.Timestamp

import graft.model.Model.ChangeEvent
import graft.plans.Icelite
import graft.streaming.Ingest

/** Named refs (tags/branches) and the write-audit-publish cycle over the
  * icelite snapshot log (Iceberg branch/tag + WAP analogue).
  */
class RefsSpec extends SparkSpec {
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

  private def mkBatches(n: Int) = (0 until n).map { b =>
    batchOf((0 until 20).map(i =>
      ev(if (i % 7 == 0 && b > 0) "U" else "I", s"c${i % 5}", i,
        s"t$b-$i", b * 100 + i, b * 1000 + i)): _*)
  }

  test("tags are immutable pins and survive snapshot expiry") {
    val root = tmpDir("refs-tag")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 4,
      opts = Icelite.Options(compactThreshold = 100))
    val batches = mkBatches(4)
    Ingest.replay(spark, cfg, batches.take(2))
    val table = Icelite.load(spark, cfg.tablePath)
    val early = table.snapshot().snapshotId
    val earlyRows = table.read().orderBy("conv_id", "turn_idx").collect()

    table.setRef("release-1", early) // default kind = tag
    // batch ids continue past the first replay's 0,1 — the gate must see
    // these as new
    batches.drop(2).zipWithIndex.foreach { case (b, i) =>
      Ingest.applyBatch(spark, cfg, b, batchId = 2L + i)
    }

    // immutability: re-pointing throws; same-target set is a no-op commit
    val head = table.snapshot().snapshotId
    val e = intercept[IllegalArgumentException](table.setRef("release-1", head))
    assert(e.getMessage.contains("immutable"))
    // kind mismatch throws
    val e2 = intercept[IllegalArgumentException](
      table.setRef("release-1", early, kind = "branch"))
    assert(e2.getMessage.contains("already exists as a tag"))

    // expiry would normally drop `early`; the tag pins it AND its files
    val (expired, _) = table.expireSnapshots(keepLast = 1, orphanGraceMs = 0)
    assert(expired > 0)
    assert(table.readRef("release-1").orderBy("conv_id", "turn_idx")
      .collect().toSeq === earlyRows.toSeq)
    assert(table.readAt(early).count() === earlyRows.length)

    // dropping the tag removes protection; the next expiry retires it
    table.dropRef("release-1")
    table.expireSnapshots(keepLast = 1, orphanGraceMs = 0)
    intercept[java.io.FileNotFoundException](table.snapshotAt(early))
    // metadata table
    assert(table.refsDf().columns.toSeq ===
      Seq("name", "kind", "snapshot_id"))
    assert(table.refs().isEmpty)
  }

  test("fastForward verifies ancestry; dropRef of a missing ref throws") {
    val root = tmpDir("refs-ff")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 4)
    Ingest.replay(spark, cfg, mkBatches(2))
    val table = Icelite.load(spark, cfg.tablePath)
    val a = table.snapshot().snapshotId
    table.setRef("dev", a, kind = "branch")
    mkBatches(3).drop(2).zipWithIndex.foreach { case (b, i) =>
      Ingest.applyBatch(spark, cfg, b, batchId = 2L + i)
    }
    val b = table.snapshot().snapshotId
    assert(b > a)
    table.fastForward("dev", b)
    assert(table.refs()("dev").snapshotId === b)
    // backwards (not a descendant) throws
    intercept[IllegalArgumentException](table.fastForward("dev", a))
    // fast-forwarding a tag throws
    table.setRef("pin", b)
    intercept[IllegalArgumentException](table.fastForward("pin", b))
    intercept[IllegalArgumentException](table.dropRef("nope"))
  }

  test("write-audit-publish: staged commits invisible until publish; gate intact") {
    val root = tmpDir("refs-wap")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 4,
      opts = Icelite.Options(compactThreshold = 100))
    val batches = mkBatches(4)
    Ingest.replay(spark, cfg, batches.take(2))
    val table = Icelite.load(spark, cfg.tablePath)
    val mid = table.snapshot().snapshotId
    val midRows = table.read().orderBy("conv_id", "turn_idx").collect()

    table.wapBegin()
    // re-entry guard: a retry of a crashed orchestration must not re-pin
    // at the staged tip (that would publish unaudited commits)
    val eOpen = intercept[IllegalStateException](table.wapBegin())
    assert(eOpen.getMessage.contains("already open"))
    // stage phase-2 batches (batch ids continue — the gate advances on the TIP)
    batches.drop(2).zipWithIndex.foreach { case (b, i) =>
      Ingest.applyBatch(spark, cfg, b, batchId = 2L + i)
    }
    // published view frozen: read, lookup, changesSince all serve the pin
    assert(table.read().orderBy("conv_id", "turn_idx").collect().toSeq
      === midRows.toSeq)
    assert(table.lookup("c0").collect().map(_.getAs[String]("text")).sorted
      .forall(t => t.startsWith("t0-") || t.startsWith("t1-")))
    assert(table.changesSince(mid).count() === 0)
    // ...while the audit view sees the staged state
    val tipRows = table.readTip().orderBy("conv_id", "turn_idx").collect()
    assert(tipRows.exists(_.getAs[String]("text").startsWith("t3-")))

    // idempotence gate advanced with the staged commits: re-applying a
    // staged batch is skipped even though it is unpublished
    val stats = table.merge(batches(2), batchId = 2L, writerId = "w")
    assert(stats.skipped)

    table.wapPublish()
    assert(table.read().orderBy("conv_id", "turn_idx").collect().toSeq
      === tipRows.toSeq)
    assert(table.changesSince(mid).count() > 0)
    // publish CLOSED the cycle: the pin is gone, so a commit made after
    // the cycle is immediately visible without another publish (a
    // forgotten pin would freeze every reader forever)
    assert(table.refs().isEmpty)
    Ingest.applyBatch(spark, cfg,
      batchOf(ev("I", "zz", 0, "post-wap", 900, 9000)), batchId = 10L)
    assert(table.read().filter($"conv_id" === "zz").count() === 1)
    intercept[IllegalArgumentException](table.wapPublish()) // no open cycle
  }

  test("deleteWhere / updateWhere: DML as exactly-once merges, no resurrection") {
    import org.apache.spark.sql.functions.{col, lit}
    val root = tmpDir("dml")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 4)
    Ingest.replay(spark, cfg, mkBatches(3))
    val table = Icelite.load(spark, cfg.tablePath)
    val before = table.read().count()

    // delete the multiples of 4: keys (c4,4) (c3,8) (c2,12) (c1,16) (c0,0)
    // — 5 of the fixture's 20 distinct (conv, turn) keys
    val stats = table.deleteWhere(col("turn_idx") % 4 === 0,
      batchId = 100L, writerId = "w")
    assert(!stats.skipped)
    val after = table.read()
    assert(after.filter(col("turn_idx") % 4 === 0).count() === 0)
    assert(after.count() === before - 5)

    // replaying the same DML batch id is idempotent (the gate)
    assert(table.deleteWhere(col("turn_idx") % 4 === 0, 100L, "w").skipped)

    // a LATE event for a deleted key (seq below the tombstone) cannot
    // resurrect the row
    Ingest.applyBatch(spark, cfg,
      batchOf(ev("U", "c4", 4, "late-ghost", 50, 1500)), batchId = 101L)
    assert(table.read()
      .filter(col("conv_id") === "c4" && col("turn_idx") === 4).count() === 0)

    // update rewrites matching live rows in place
    table.updateWhere(col("turn_idx") === 1, Map("text" -> lit("patched")),
      batchId = 102L, writerId = "w")
    val texts = table.read().filter(col("turn_idx") === 1)
      .select("text").collect().map(_.getString(0)).distinct
    assert(texts.toSeq === Seq("patched"))
    // key columns are immutable
    intercept[IllegalArgumentException](table.updateWhere(lit(true),
      Map("conv_id" -> lit("x")), 103L, "w"))
  }

  test("wapAbort reverts the tip to the published state; re-apply converges") {
    val root = tmpDir("refs-abort")
    val cfg = Ingest.Config(s"$root/t", s"$root/ck", "w", buckets = 4,
      opts = Icelite.Options(compactThreshold = 100))
    val batches = mkBatches(4)
    Ingest.replay(spark, cfg, batches.take(2))
    val table = Icelite.load(spark, cfg.tablePath)
    val midRows = table.read().orderBy("conv_id", "turn_idx").collect()

    table.wapBegin()
    batches.drop(2).zipWithIndex.foreach { case (b, i) =>
      Ingest.applyBatch(spark, cfg, b, batchId = 2L + i)
    }
    table.wapAbort()
    // abort closed the cycle (pin dropped) and reverted the tip; readers
    // track the tip again
    assert(table.refs().isEmpty)
    assert(table.readTip().orderBy("conv_id", "turn_idx").collect().toSeq
      === midRows.toSeq)
    assert(table.read().orderBy("conv_id", "turn_idx").collect().toSeq
      === midRows.toSeq)
    // the undone batches re-apply (gate rolled back) and converge to the
    // same final state a straight-through replay produces
    batches.drop(2).zipWithIndex.foreach { case (b, i) =>
      Ingest.applyBatch(spark, cfg, b, batchId = 2L + i)
    }

    val straightCfg = Ingest.Config(s"$root/t2", s"$root/ck2", "w", buckets = 4)
    Ingest.replay(spark, straightCfg, batches)
    val expect = Icelite.load(spark, straightCfg.tablePath)
      .read().orderBy("conv_id", "turn_idx").collect()
    assert(table.read().orderBy("conv_id", "turn_idx").collect().toSeq
      === expect.toSeq)
  }
}
