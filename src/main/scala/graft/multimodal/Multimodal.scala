package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: media as opaque
  * `binary` columns + typed metadata, with decode / feature-extract /
  * resize / frame-sample as per-partition transforms.
  *
  * The Spark-side plumbing here is real — schema, partition-sized
  * batching, transform signatures, output shapes. The actual codec calls
  * are STUBBED with deterministic fakes (this container ships no
  * image/audio libraries): `decodeImageStub` fabricates dimensions from a
  * content hash instead of parsing the bytes. Swap the stub body for a
  * real codec (e.g. javax.imageio / ffmpeg bindings) in production — the
  * dataflow around it does not change.
  */
object Multimodal {

  /** A media row: opaque payload + source metadata. The payload stays
    * byte-opaque through shuffles; only hashes/features cross stages where
    * possible. */
  case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte],
                         mime: String, source_doc: Long)

  /** Decoded-image features (the stub's output shape). */
  case class ImageFeatures(media_id: Long, width: Int, height: Int,
                           n_bytes: Long, content_hash: String,
                           embedding: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("source_doc", LongType)))

  /** Fabricate a media table from the documents fixture: text bytes stand
    * in for an image payload. Deterministic, schema-faithful. */
  def syntheticMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents.select(
      col("doc_id").alias("media_id"),
      lit("image").alias("kind"),
      col("text").cast("binary").alias("bytes"),
      lit("image/fake").alias("mime"),
      col("doc_id").alias("source_doc")).as[MediaRecord]
  }

  // ---- STUB: deterministic fake decode -------------------------------
  // Real implementation would parse image headers / run a codec. The fake
  // derives stable pseudo-dimensions and a tiny pseudo-embedding from md5
  // so tests are reproducible and the distributed plumbing is exercised
  // end-to-end.
  private def md5Bytes(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(b)

  private[multimodal] def decodeImageStub(r: MediaRecord): ImageFeatures = {
    val h = md5Bytes(r.bytes)
    val hex = h.map("%02x".format(_)).mkString
    val w = 64 + (java.lang.Byte.toUnsignedInt(h(0)) % 64)
    val ht = 64 + (java.lang.Byte.toUnsignedInt(h(1)) % 64)
    val emb = (0 until 8).map(i => (java.lang.Byte.toUnsignedInt(h(i)) / 255.0f) - 0.5f).toArray
    ImageFeatures(r.media_id, w, ht, r.bytes.length.toLong, hex, emb)
  }

  /** Decode + feature-extract over partitions: one codec context per
    * partition (the expensive init happens once per task, not per row) —
    * the same batching shape a Pandas-UDF/mapInPandas pipeline uses. */
  def extractImageFeatures(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init would go here (codec handles, model weights)
      it.map(decodeImageStub)
    }
  }

  /** Resize stub: records the target size; a real impl would transcode
    * bytes. Shows the metadata-update-without-reshuffle pattern. */
  def resizeTo(features: Dataset[ImageFeatures], w: Int, h: Int)
              (implicit spark: SparkSession): DataFrame =
    features.toDF()
      .withColumn("width", lit(w)).withColumn("height", lit(h))
      .withColumn("resized", lit(true))

  /** Frame-sample stub for video-shaped payloads: take every `stride`-th
    * chunk of the payload as a "frame" — the partition-local slicing shape
    * of a real frame sampler. */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRecord],
                   frameBytes: Int = 16, stride: Int = 4): DataFrame = {
    import spark.implicits._
    media.flatMap { r =>
      val nFrames = r.bytes.length / (frameBytes * stride)
      (0 until nFrames).map { i =>
        val off = i * frameBytes * stride
        (r.media_id, i, r.bytes.slice(off, off + frameBytes))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }
}
