package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Multimodal plumbing smoke: binary payload → per-partition decode stub →
  * typed features; frame sampling shape. The decode itself is a
  * deterministic fake (no codecs in this container) — the distributed
  * dataflow is what's under test. */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private lazy val media =
    Multimodal.syntheticMedia(spark, Tables.documents(spark, sf0).limit(50))

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

  test("frame sampling slices payloads partition-locally") {
    val frames = Multimodal.sampleFrames(spark, media, frameBytes = 16, stride = 4)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame_bytes"))
    assert(frames.count() > 0)
    val maxLen = frames.select(max(length(col("frame_bytes")))).head().getInt(0)
    assert(maxLen <= 16)
  }
}
