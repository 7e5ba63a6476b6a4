package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing: schema, determinism, batch shape of the stubbed
  * decode, frame sampling. */
class MultimodalSpec extends SparkSpec {

  test("synthetic media table has the contract schema and is deterministic") {
    val a = Multimodal.syntheticMedia(spark, 50)
    val b = Multimodal.syntheticMedia(spark, 50)
    assert(a.schema.fieldNames.toSeq === Seq("media_id", "blob", "meta"))
    assert(a.exceptAll(b).isEmpty) // same seed → identical
    val metas = a.select("meta.kind", "meta.bytes", "meta.width").collect()
    assert(metas.forall(_.getLong(1) > 0))
    assert(metas.filter(_.getString(0) == "image").forall(_.getInt(2) >= 16))
    assert(metas.filter(_.getString(0) != "image").forall(_.getInt(2) == -1))
  }

  test("decode stage: per-partition batching, deterministic features") {
    implicit val s = spark
    val media = Multimodal.syntheticMedia(spark, 40).repartition(4)
    val feats = Multimodal.decodeImage(media).collect()
    assert(feats.length === 40)
    feats.foreach { f =>
      assert(f.feature.length === 16)
      assert(math.abs(f.feature.sum - 1.0f) < 1e-3) // L1-normalized histogram
      assert(f.n_bytes > 0 && f.checksum != 0)
    }
    // rerun is bit-identical (stub decode is pure)
    val again = Multimodal.decodeImage(media).collect()
    assert(feats.map(f => (f.media_id, f.checksum)).sorted.toSeq ===
      again.map(f => (f.media_id, f.checksum)).sorted.toSeq)
  }

  test("frame sampling emits every k-th frame with correct sizes") {
    val media = Multimodal.syntheticMedia(spark, 60)
    val frames = Multimodal.sampleFrames(media, everyK = 2)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(1) % 2 == 0)) // only even frame indices
    assert(rows.exists(_.getInt(1) > 0)) // multi-frame sampling genuinely exercised
    val videos = media.filter(col("meta.kind") === "video").count()
    assert(frames.select("media_id").distinct().count() === videos)
  }
}
