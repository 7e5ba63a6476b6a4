package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for a training-data pipeline: image/audio/
  * video payloads as opaque `binary` columns with typed metadata, plus
  * decode / feature-extract / frame-sample stages.
  *
  * The Spark-side contract is real and tested — schema, partition-aligned
  * batching (`mapPartitions`, the JVM analogue of an arrow-batched UDF),
  * deterministic outputs. The actual codec work is STUBBED (`fakeDecode`):
  * no image/audio libraries exist in this sandbox, so the "decoder"
  * derives deterministic pseudo-content from the bytes. Swap
  * [[decodeImage]]'s body for a real codec (JavaCV/TwelveMonkeys) without
  * touching any caller.
  *
  * Scale notes: payloads stay off the shuffle path (metadata-only ops
  * never deserialize the blob); feature extraction is per-partition
  * streaming with O(1) memory per row; `spark.sql.files.maxPartitionBytes`
  * governs scan parallelism for blob-heavy tables.
  */
object Multimodal {

  /** Typed metadata carried next to every blob. */
  case class MediaMeta(
      kind: String,      // image | audio | video
      format: String,    // png/jpeg/wav/mp4/...
      bytes: Long,
      width: Int,        // -1 when n/a
      height: Int,       // -1 when n/a
      durationMs: Long)  // -1 when n/a

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("blob", BinaryType, nullable = true),
    StructField("meta", Encoders.mediaMetaSchema, nullable = true)))

  object Encoders {
    val mediaMetaSchema: StructType = StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("durationMs", LongType, nullable = false)))
  }

  /** Engine↔oracle-portable 60-bit hash ([[TextOps.portableHash]] — ONE
    * definition of the cross-engine contract), which is what makes the
    * multimodal fixtures fully oracle-checkable (xxhash64 is
    * Spark-internal and was the round-1 `no_oracle` cause). */
  private def pHash(c: Column): Column = TextOps.portableHash(c)

  /** Deterministic synthetic media table (the fixture generator): blob
    * bytes derived from the id via [[pHash]], metadata consistent with
    * the blob. */
  def syntheticMedia(spark: SparkSession, n: Long): DataFrame = {
    val kinds = array(lit("image"), lit("audio"), lit("video"))
    val fmts = array(lit("png"), lit("wav"), lit("mp4"))
    val id = col("id").cast("string")
    spark.range(n)
      .withColumn("kind_i", pmod(pHash(concat(id, lit("_k"))), lit(3)).cast("int"))
      .withColumn("kind", element_at(kinds, col("kind_i") + 1))
      .withColumn("format", element_at(fmts, col("kind_i") + 1))
      // blob: 64–1088 deterministic pseudo-random bytes (16..272 words of 4)
      .withColumn("blob", unhex(concat_ws("",
        transform(sequence(lit(0), pmod(pHash(concat(id, lit("_len"))), lit(257)) + 15),
          i => lpad(hex(pmod(pHash(concat(id, lit("_"), i.cast("string"))),
            lit(4294967296L))), 8, "0")))))
      .select(
        col("id").as("media_id"),
        col("blob"),
        struct(
          col("kind"),
          col("format"),
          length(col("blob")).cast("long").as("bytes"),
          when(col("kind") === "image",
            (pmod(pHash(concat(id, lit("_w"))), lit(1920)) + 16).cast("int"))
            .otherwise(lit(-1)).as("width"),
          when(col("kind") === "image",
            (pmod(pHash(concat(id, lit("_h"))), lit(1080)) + 16).cast("int"))
            .otherwise(lit(-1)).as("height"),
          when(col("kind") =!= "image",
            pmod(pHash(concat(id, lit("_d"))), lit(600000L)))
            .otherwise(lit(-1L)).as("durationMs")).as("meta"))
  }

  /** Feature row produced by the decode stage. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Float])

  /** Decode + feature-extract via partition-aligned batching
    * (`mapPartitions` — rows stream through the stub codec one partition
    * at a time; swap `fakeDecode` for a real library call). */
  def decodeImage(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "meta.kind", "blob").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, blob) =>
          val bytes = if (blob == null) Array.empty[Byte] else blob
          MediaFeatures(id, kind, bytes.length.toLong,
            // Karp-Rabin rolling hash mod 2^31-1 (same scheme as
            // TextOps.rollingHash) — overflow-free, so the DuckDB oracle
            // reproduces it exactly (FNV-1a's 64-bit wraparound can't be
            // expressed in BIGINT arithmetic)
            checksum = bytes.foldLeft(0L)((h, b) =>
              (h * 131 + (b & 0xff)) % 2147483647L),
            feature = fakeDecode(bytes))
        }
      }
  }

  /** ??? in spirit: the deterministic stand-in for a real codec —
    * 16-bin byte histogram normalized to unit L1. */
  private def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) / 16) += 1f; i += 1 }
    val n = math.max(bytes.length, 1).toFloat
    hist.map(_ / n)
  }

  /** Frame sampling for video blobs: every k-th 256-byte "frame" of the
    * blob (stub for container demux), exploded to one row per frame —
    * the shape a real frame sampler produces. */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame = {
    val frameSize = 256
    media.filter(col("meta.kind") === "video")
      .withColumn("n_frames",
        greatest(floor(length(col("blob")) / frameSize).cast("int"), lit(1)))
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), col("n_frames") - 1),
          i => i % everyK === 0)))
      .select(
        col("media_id"), col("frame_idx"),
        expr(s"substring(blob, frame_idx * $frameSize + 1, $frameSize)").as("frame"))
  }
}
