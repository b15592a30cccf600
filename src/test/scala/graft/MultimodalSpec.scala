package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Multimodal plumbing: binary payload → per-partition decode → typed
  * features; REAL resize (bytes transcoded, dimensions verified by
  * re-decoding); gated frame sampling. Image decode/resize are real
  * javax.imageio; only audio/video stay stand-ins (no codecs in this
  * container) and those are refused for non-video mimes.
  */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private lazy val media =
    Multimodal.syntheticMedia(spark, Tables.documents(spark, sf0).limit(50))
  private lazy val pngMedia =
    Multimodal.syntheticPngMedia(spark, Tables.documents(spark, sf0).limit(50))

  test("extractImageFeatures: deterministic stub features over partitions") {
    val f = Multimodal.extractImageFeatures(spark, media)
    val rows = f.collect()
    assert(rows.length == 50)
    assert(rows.forall(r => r.width >= 64 && r.width < 128))
    assert(rows.forall(_.embedding.length == 8))
    // determinism: same input → same hash
    val again = Multimodal.extractImageFeatures(spark, media).collect()
    assert(rows.map(_.content_hash).toSeq == again.map(_.content_hash).toSeq)
  }

  test("extractImageFeatures: REAL decode recovers true PNG dimensions") {
    val feats = Multimodal.extractImageFeatures(spark, pngMedia).collect()
    assert(feats.length == 50)
    // syntheticPngMedia encodes w = 4 + id%13 — real decode must agree
    feats.foreach { f =>
      assert(f.width == 4 + (f.media_id % 13).toInt,
        s"media ${f.media_id}: decoded width ${f.width}")
      assert(f.embedding.length == 8)
    }
  }

  test("resizeImages: transcoded bytes decode to the TARGET dimensions") {
    val resized = Multimodal.resizeImages(spark, pngMedia, w = 7, h = 5)
    val rows = resized.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("resized"))
      assert(r.getAs[Int]("width") == 7 && r.getAs[Int]("height") == 5)
      // the proof: decode the RESIZED payload and check its real dimensions
      val im = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bytes")))
      assert(im != null && im.getWidth == 7 && im.getHeight == 5)
    }
  }

  test("resizeImages: undecodable payloads pass through tagged, unchanged") {
    val out = Multimodal.resizeImages(spark, media, w = 7, h = 5).collect()
    assert(out.length == 50)
    out.foreach { r =>
      assert(!r.getAs[Boolean]("resized"))
      assert(r.getAs[Int]("width") == -1)
      assert(r.getAs[String]("mime") == "image/fake")
    }
  }

  test("frame sampling slices video payloads partition-locally, labeled synthetic") {
    import spark.implicits._
    val video = media.map(_.copy(mime = "video/synthetic"))
    val frames = Multimodal.sampleFrames(spark, video, frameBytes = 16, stride = 4)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "synthetic_frame_bytes"))
    assert(frames.count() > 0)
    val maxLen = frames.select(max(length(col("synthetic_frame_bytes")))).head().getInt(0)
    assert(maxLen <= 16)
  }

  test("frame sampling REFUSES non-video mimes") {
    val ex = intercept[Exception] {
      Multimodal.sampleFrames(spark, media).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("refusing non-video")),
      s"expected IllegalArgumentException(refusing non-video), got $ex")
  }
}
