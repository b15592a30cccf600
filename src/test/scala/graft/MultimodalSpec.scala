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

  test("audio: REAL WAV decode recovers format, energy, and pitch-rate features") {
    import spark.implicits._
    val wav = Multimodal.syntheticWavMedia(spark, Tables.documents(spark, sf0).limit(20))
    val feats = Multimodal.extractAudioFeatures(spark, wav).collect().sortBy(_.media_id)
    assert(feats.length == 20)
    feats.foreach { f =>
      assert(f.decoded, s"media ${f.media_id} failed to decode")
      assert(f.sample_rate == 8000 && f.channels == 1)
      // synthetic burst length is 800 + (id%5)*400 samples
      assert(f.n_samples == 800 + (f.media_id % 5) * 400)
      assert(math.abs(f.duration_sec - f.n_samples / 8000.0) < 1e-9)
      // sine RMS = amplitude/sqrt(2) = (12000/32768)/1.414 ~ 0.259
      assert(math.abs(f.rms - 0.259) < 0.01, s"rms ${f.rms}")
      // zero-crossing rate of a sine ~ 2*freq/rate
      val freq = 220.0 * (1 + f.media_id % 4)
      assert(math.abs(f.zero_cross_rate - 2 * freq / 8000) < 0.01,
        s"media ${f.media_id}: zcr ${f.zero_cross_rate} for $freq Hz")
    }
    // non-audio payloads degrade to tagged zero rows, never throw
    val bad = Multimodal.extractAudioFeatures(spark, media).collect()
    assert(bad.forall(!_.decoded))
  }

  test("pHash: identical collide, brightness-scaled near, distinct far") {
    import spark.implicits._
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) im.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    def gray(v: Int) = (v << 16) | (v << 8) | v
    // smooth sinusoidal blob — a spread spectrum, so coefficients sit
    // away from the median and quantization noise can't mass-flip bits
    // (a wrap-around sawtooth parks ~50 coefficients AT the median and
    // makes any hash unstable)
    def blob(x: Int, y: Int): Double =
      128.0 + 55.0 * math.sin(x / 5.0) * math.cos(y / 7.0) +
        40.0 * math.sin((x + 2.0 * y) / 11.0)
    val baseF = (x: Int, y: Int) => gray(blob(x, y).toInt)
    // uniform 0.8× brightness: scales every DCT AC coefficient and their
    // median together — only pixel quantization can move bits
    val dimmedF = (x: Int, y: Int) => gray((blob(x, y) * 0.8).toInt)
    val differentF = (x: Int, y: Int) =>
      gray(((255 - x * 2 - y * 5) & 0xff) ^ (x * y & 0xff))
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", png(baseF), "image/png", 1L),
      Multimodal.MediaRecord(2L, "image", png(baseF), "image/png", 2L),
      Multimodal.MediaRecord(3L, "image", png(dimmedF), "image/png", 3L),
      Multimodal.MediaRecord(4L, "image", png(differentF), "image/png", 4L)).toDS()
    val hs = Multimodal.pHashes(spark, media).collect().sortBy(_.media_id)
    assert(hs.forall(_.decoded))
    def hd(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hs(0).phash == hs(1).phash)
    assert(hd(hs(0).phash, hs(2).phash) <= 8,
      s"brightness scale drifted ${hd(hs(0).phash, hs(2).phash)} bits")
    assert(hd(hs(0).phash, hs(3).phash) > 8,
      s"distinct image unexpectedly near: ${hd(hs(0).phash, hs(3).phash)} bits")
    val pairs = Multimodal.phashNearDupPairs(
        Multimodal.pHashes(spark, media).toDF(), maxDist = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("dHash: identical images collide, perturbed stay near, distinct far") {
    import spark.implicits._
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) im.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val baseF = (x: Int, y: Int) => gray((x * 3 + y) & 0xff)
    // +10 luminance on a 4x4 corner — a mild re-encode/watermark-style edit
    val perturbedF = (x: Int, y: Int) => {
      val v = (x * 3 + y) & 0xff
      gray(if (x < 4 && y < 4) math.min(255, v + 10) else v)
    }
    val differentF = (x: Int, y: Int) =>
      gray(((255 - x * 2 - y * 5) & 0xff) ^ (x * y & 0xff))
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", png(baseF), "image/png", 1L),
      Multimodal.MediaRecord(2L, "image", png(baseF), "image/png", 2L),
      Multimodal.MediaRecord(3L, "image", png(perturbedF), "image/png", 3L),
      Multimodal.MediaRecord(4L, "image", png(differentF), "image/png", 4L)).toDS()
    val hashes = Multimodal.dHashes(spark, media)
    val hs = hashes.collect().sortBy(_.media_id)
    assert(hs.forall(_.decoded))
    def hd(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hs(0).dhash == hs(1).dhash)
    assert(hd(hs(0).dhash, hs(2).dhash) <= 8,
      s"perturbed drifted ${hd(hs(0).dhash, hs(2).dhash)} bits")
    assert(hd(hs(0).dhash, hs(3).dhash) > 8,
      s"distinct image unexpectedly near: ${hd(hs(0).dhash, hs(3).dhash)} bits")
    // banded candidate join + verify finds exactly the near pairs
    val pairs = Multimodal.dhashNearDupPairs(hashes.toDF(), maxDist = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    // end-to-end image dedup: pairs feed the SAME clustering engine as
    // text near-dups — the {1,2,3} family collapses to canonical 1, the
    // distinct image stays its own cluster
    import org.apache.spark.sql.functions.col
    val labels = graft.ops.ScaleDedup.connectedComponents(
      hashes.toDF().select(col("media_id").alias("id")),
      pairs.toSeq.toDF("id1", "id2"))
    val canon = labels.filter(col("label") === col("id"))
      .select("id").as[Long].collect().toSet
    assert(canon == Set(1L, 4L), s"image dedup survivors were $canon")
  }

  test("measured image near-dup recall: dHash vs pHash over a perturbation ladder") {
    import spark.implicits._
    // The image twin of q_ann_recall / q_dedup_recall: 30 distinct base
    // images, each with three perturbed variants (uniform 0.8×
    // brightness; sparse pixel noise; a local 8×8 patch edit), scored
    // against the SAME-BASE ground truth. Quantifies what each hash's
    // banded pairing actually recovers instead of asserting single
    // handpicked examples.
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) im.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    def gray(v: Double) = {
      val c = math.max(0, math.min(255, v.toInt)); (c << 16) | (c << 8) | c
    }
    val nBase = 30
    // smooth per-base textures (spread-spectrum blobs, parameters keyed
    // on the base id) — high-frequency noise textures would make every
    // hash trivially fragile and the ladder meaningless
    def blob(b: Int)(x: Int, y: Int): Double =
      128.0 + 55.0 * math.sin((x + b * 3) / (4.0 + b % 5)) *
        math.cos((y + b * 7) / (5.0 + b % 4)) +
        35.0 * math.sin((x + 2.0 * y + b * 11) / (9.0 + b % 6))
    val records = (0 until nBase).flatMap { b =>
      val base = blob(b) _
      Seq(
        Multimodal.MediaRecord(b.toLong, "image",
          png((x, y) => gray(base(x, y))), "image/png", b.toLong),
        Multimodal.MediaRecord(b + 1000L, "image",
          png((x, y) => gray(base(x, y) * 0.8)), "image/png", b + 1000L),
        Multimodal.MediaRecord(b + 2000L, "image",
          png((x, y) => gray(base(x, y) +
            (if ((x * 31 + y * 7 + b) % 97 == 0) 25 else 0))),
          "image/png", b + 2000L),
        Multimodal.MediaRecord(b + 3000L, "image",
          png((x, y) => gray(base(x, y) +
            (if (x >= 8 && x < 16 && y >= 8 && y < 16) 20 else 0))),
          "image/png", b + 3000L))
    }
    val media = records.toDS()
    def score(pairs: Set[(Long, Long)]): (Double, Double) = {
      val truePairs = (0 until nBase).flatMap { b =>
        val ids = Seq(b.toLong, b + 1000L, b + 2000L, b + 3000L)
        for (i <- ids; j <- ids if i < j) yield (i, j)
      }.toSet
      val hit = pairs.intersect(truePairs)
      (hit.size.toDouble / truePairs.size,
        if (pairs.isEmpty) 1.0 else hit.size.toDouble / pairs.size)
    }
    val dPairs = Multimodal.dhashNearDupPairs(
        Multimodal.dHashes(spark, media).toDF(), maxDist = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val pPairs = Multimodal.phashNearDupPairs(
        Multimodal.pHashes(spark, media).toDF(), maxDist = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val (dRec, dPrec) = score(dPairs)
    val (pRec, pPrec) = score(pPairs)
    info(f"dHash recall=$dRec%.2f precision=$dPrec%.2f (${dPairs.size} pairs)")
    info(f"pHash recall=$pRec%.2f precision=$pPrec%.2f (${pPairs.size} pairs)")
    // floors, not exact pins: the measurement is the artifact, the
    // floors catch a hash or banding regression
    assert(dRec >= 0.6, f"dHash recall collapsed: $dRec%.2f")
    assert(pRec >= 0.6, f"pHash recall collapsed: $pRec%.2f")
    assert(dPrec >= 0.9, f"dHash precision collapsed: $dPrec%.2f")
    assert(pPrec >= 0.9, f"pHash precision collapsed: $pPrec%.2f")
  }
}
