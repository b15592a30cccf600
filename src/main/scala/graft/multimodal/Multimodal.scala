package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: media as opaque
  * `binary` columns + typed metadata, with decode / feature-extract /
  * resize / frame-sample as per-partition transforms.
  *
  * Image decode is REAL: `decodeImage` parses the payload with
  * `javax.imageio` (ships in the JDK — no external codec dependency) and
  * extracts true dimensions plus a coarse luminance-grid embedding.
  * Payloads ImageIO cannot parse (corrupt bytes, non-image stand-ins)
  * fall back to `decodeImageStub`, a deterministic md5-derived fake, so
  * the pipeline is total — exactly how a production decode stage handles
  * undecodable records (tag-and-keep rather than throw). Audio decode is
  * REAL for WAV/PCM via `javax.sound.sampled` (also JDK-resident). Only
  * VIDEO remains a stand-in (no codecs in this container), so frame
  * sampling stays a byte-slicing shape around real distributed plumbing.
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
    * in for an opaque (non-image) payload. Deterministic, schema-faithful. */
  def syntheticMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents.select(
      col("doc_id").alias("media_id"),
      lit("image").alias("kind"),
      col("text").cast("binary").alias("bytes"),
      lit("image/fake").alias("mime"),
      col("doc_id").alias("source_doc")).as[MediaRecord]
  }

  /** Fabricate a media table of REAL PNG payloads: per document, a tiny
    * deterministic image (dimensions and pixels derived from doc_id/
    * n_chars) encoded with javax.imageio. Exercises the actual binary
    * codec path end-to-end — encode on the executors, decode on the
    * executors, nothing driver-side. */
  def syntheticPngMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .map { case (id, nChars) =>
        val w = 4 + (id % 13).toInt
        val h = 3 + (nChars % 11).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            // deterministic pixel pattern keyed on the record
            img.setRGB(x, y, (id * 2654435761L + x * 31 + y * 7).toInt & 0xffffff)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRecord(id, "image", bos.toByteArray, "image/png", id)
      }
  }

  private def md5Bytes(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(b)

  /** REAL image decode via javax.imageio: true width/height plus a coarse
    * 2×4 mean-luminance grid as the embedding (a stand-in for a model
    * embedding with the same dataflow shape). Returns None when the bytes
    * are not a decodable image — including payloads ImageIO RECOGNIZES but
    * cannot decode (truncated PNG, CMYK JPEG throw IIOException rather than
    * returning null); the Try keeps the pipeline total as documented
    * (tag-and-keep, never fail the task on one corrupt record). */
  private[multimodal] def decodeImage(r: MediaRecord): Option[ImageFeatures] = {
    val img = scala.util.Try(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
    ).getOrElse(null)
    Option(img).map { im =>
      val (w, h) = (im.getWidth, im.getHeight)
      val (gx, gy) = (4, 2)
      val emb = new Array[Float](gx * gy)
      val cnt = new Array[Int](gx * gy)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = im.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 0.299 + ((rgb >> 8) & 0xff) * 0.587 +
            (rgb & 0xff) * 0.114) / 255.0
          val cell = math.min(gy - 1, y * gy / h) * gx + math.min(gx - 1, x * gx / w)
          emb(cell) += lum.toFloat
          cnt(cell) += 1
          x += 1
        }
        y += 1
      }
      var i = 0
      while (i < emb.length) { if (cnt(i) > 0) emb(i) /= cnt(i); i += 1 }
      val hex = md5Bytes(r.bytes).map("%02x".format(_)).mkString
      ImageFeatures(r.media_id, w, h, r.bytes.length.toLong, hex, emb)
    }
  }

  // ---- STUB: deterministic fake decode (fallback) ---------------------
  // Used when ImageIO cannot parse the payload (non-image stand-ins,
  // corrupt bytes): stable pseudo-dimensions and a tiny pseudo-embedding
  // derived from md5, so the pipeline is total and reproducible.

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
    * the same batching shape a Pandas-UDF/mapInPandas pipeline uses.
    * Real ImageIO decode first; undecodable payloads degrade to the
    * deterministic stub instead of failing the task. */
  def extractImageFeatures(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // ImageIO's disk-backed cache is pure overhead for in-memory blobs
      javax.imageio.ImageIO.setUseCache(false)
      it.map(r => decodeImage(r).getOrElse(decodeImageStub(r)))
    }
  }

  /** Resize stub: records the target size; a real impl transcodes bytes —
    * see `resizeImages`. Kept for the metadata-update-without-reshuffle
    * pattern (e.g. when a downstream service does the transcode). */
  def resizeTo(features: Dataset[ImageFeatures], w: Int, h: Int)
              (implicit spark: SparkSession): DataFrame =
    features.toDF()
      .withColumn("width", lit(w)).withColumn("height", lit(h))
      .withColumn("resized", lit(true))

  /** REAL image resize: ImageIO decode → `Graphics2D.drawImage` scaled to
    * (w, h) with bilinear interpolation → PNG re-encode. JDK-only (no new
    * codec dependency), per-partition codec init, bytes transformed on the
    * executors. Undecodable payloads pass through UNCHANGED with
    * `resized = false` (tag-and-keep — same totality contract as decode),
    * so the pipeline never fails a 100 TB task on one corrupt record. */
  def resizeImages(spark: SparkSession, media: Dataset[MediaRecord],
                   w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0, s"resize target must be positive, got ${w}x$h")
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val decoded = scala.util.Try(
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
        ).toOption.flatMap(Option(_))
        decoded match {
          case Some(im) =>
            val out = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(im, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            (r.media_id, bos.toByteArray, "image/png", w, h, true)
          case None =>
            (r.media_id, r.bytes, r.mime, -1, -1, false)
        }
      }
    }.toDF("media_id", "bytes", "mime", "width", "height", "resized")
  }

  /** Decoded-audio features: true format parameters plus the standard
    * cheap signal features (RMS energy, zero-crossing rate) a corpus
    * pipeline filters on (silence/clipping detection, speech-vs-noise
    * heuristics). */
  case class AudioFeatures(media_id: Long, sample_rate: Int, channels: Int,
                           n_samples: Long, duration_sec: Double,
                           rms: Double, zero_cross_rate: Double,
                           decoded: Boolean)

  /** Fabricate WAV payloads: per document, a deterministic 16-bit PCM mono
    * sine burst (frequency and length keyed on doc_id) encoded with
    * javax.sound.sampled — a REAL audio container round-trip, executor-side. */
  def syntheticWavMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].map { id =>
      val rate = 8000
      val n = 800 + (id % 5).toInt * 400 // 0.1–0.3 s
      val freq = 220.0 * (1 + (id % 4))
      val samples = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val v = (math.sin(2 * math.Pi * freq * i / rate) * 12000).toInt
        samples(2 * i) = (v & 0xff).toByte
        samples(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(samples), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      MediaRecord(id, "audio", bos.toByteArray, "audio/wav", id)
    }
  }

  /** REAL audio decode via javax.sound.sampled (ships in the JDK — WAV/PCM
    * needs no external codec): true sample rate / channel count / length,
    * plus RMS energy and zero-crossing rate over the PCM samples. Payloads
    * the sound stack cannot parse (mp3/ogg, corrupt bytes) degrade to a
    * zeroed row with `decoded = false` — the same tag-and-keep totality
    * contract as the image path. Per-partition decode, nothing driver-side. */
  def extractAudioFeatures(spark: SparkSession,
                           media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        scala.util.Try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.bytes))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16, "feature pass expects 16-bit PCM")
          val raw = ais.readAllBytes()
          val bigEndian = fmt.isBigEndian
          val n = raw.length / 2
          var sumSq = 0.0
          var crossings = 0L
          var prevSign = 0
          var i = 0
          while (i < n) {
            val lo = raw(2 * i).toInt
            val hi = raw(2 * i + 1).toInt
            val v = if (bigEndian) (lo << 8) | (hi & 0xff)
              else (hi << 8) | (lo & 0xff)
            val x = v / 32768.0
            sumSq += x * x
            val sign = java.lang.Integer.signum(v)
            if (sign != 0 && prevSign != 0 && sign != prevSign) crossings += 1
            if (sign != 0) prevSign = sign
            i += 1
          }
          val frames = n / fmt.getChannels
          AudioFeatures(r.media_id, fmt.getSampleRate.toInt, fmt.getChannels,
            n.toLong, frames.toDouble / fmt.getSampleRate,
            math.sqrt(sumSq / math.max(n, 1)),
            crossings.toDouble / math.max(n - 1, 1), decoded = true)
        }.getOrElse(
          AudioFeatures(r.media_id, 0, 0, 0L, 0.0, 0.0, 0.0, decoded = false))
      }
    }
  }

  /** A perceptual image hash row. `decoded = false` marks payloads that
    * fell back to the md5-derived stand-in hash (effectively unique, so
    * undecodable records never spuriously collide as near-dups). */
  case class ImageHash(media_id: Long, dhash: Long, decoded: Boolean)

  /** REAL perceptual hash (dHash, public algorithm): decode → bilinear
    * resize to 9×8 → per-pixel luminance → 64 bits, bit (x,y) set iff
    * lum(x+1,y) > lum(x,y). Robust to re-encoding, scaling, and mild
    * noise — the standard image near-dup key; JDK-only decode path shared
    * with `resizeImages`. Undecodable payloads get a deterministic
    * md5-derived hash and `decoded = false` (tag-and-keep totality, same
    * contract as decode/resize). */
  def dHashes(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[ImageHash] = {
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val decoded = scala.util.Try(
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
        ).toOption.flatMap(Option(_))
        decoded match {
          case Some(im) =>
            val out = new java.awt.image.BufferedImage(
              9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(im, 0, 0, 9, 8, null)
            g.dispose()
            def lum(x: Int, y: Int): Double = {
              val rgb = out.getRGB(x, y)
              ((rgb >> 16) & 0xff) * 0.299 + ((rgb >> 8) & 0xff) * 0.587 +
                (rgb & 0xff) * 0.114
            }
            var hash = 0L
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                if (lum(x + 1, y) > lum(x, y)) hash |= 1L << (y * 8 + x)
                x += 1
              }
              y += 1
            }
            ImageHash(r.media_id, hash, decoded = true)
          case None =>
            val h = md5Bytes(r.bytes)
            var hash = 0L
            var i = 0
            while (i < 8) { hash = (hash << 8) | java.lang.Byte.toUnsignedInt(h(i)); i += 1 }
            ImageHash(r.media_id, hash, decoded = false)
        }
      }
    }
  }

  /** Hamming near-dup pairs over dHashes — delegates to the generic
    * banded pigeonhole join (`ScaleDedup.hammingNearDupPairs`, 64-bit):
    * the only shuffles are on the band key, never all-pairs. */
  def dhashNearDupPairs(hashes: DataFrame, maxDist: Int): DataFrame =
    graft.ops.ScaleDedup.hammingNearDupPairs(hashes, "media_id", "dhash",
      bits = 64, maxDist = maxDist)

  /** A DCT perceptual hash row (same tag-and-keep contract as dHash). */
  case class ImagePHash(media_id: Long, phash: Long, decoded: Boolean)

  /** 32-point DCT-II basis, precomputed once per executor: B(u,i) =
    * α(u)·cos((2i+1)uπ/64). Plain doubles — the same IEEE values on any
    * JVM, so hashes are reproducible across the cluster. */
  private lazy val dctBasis32: Array[Array[Double]] = {
    val n = 32
    Array.tabulate(n, n) { (u, i) =>
      val alpha = if (u == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n)
      alpha * math.cos((2 * i + 1) * u * math.Pi / (2 * n))
    }
  }

  /** REAL pHash (DCT perceptual hash, public algorithm): decode →
    * bilinear resize to 32×32 → luminance → 2D DCT-II (separable, two
    * 32-point passes over the precomputed basis) → keep the low-frequency
    * 8×8 corner, drop the DC term, set bit (u,v) iff the coefficient
    * exceeds the median of the remaining 63. Complements `dHashes`:
    * gradient hashing keys on LOCAL edges, the DCT keys on GLOBAL
    * structure — and because a uniform brightness/contrast scale
    * multiplies every AC coefficient (and their median) by the same
    * positive factor, pHash is exactly invariant to it, where dHash is
    * only approximately so. Same JDK-only decode path, same md5 fallback
    * with `decoded = false` for undecodable payloads. */
  def pHashes(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[ImagePHash] = {
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val basis = dctBasis32
      it.map { r =>
        val decoded = scala.util.Try(
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
        ).toOption.flatMap(Option(_))
        decoded match {
          case Some(im) =>
            val out = new java.awt.image.BufferedImage(
              32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(im, 0, 0, 32, 32, null)
            g.dispose()
            val lum = Array.tabulate(32, 32) { (y, x) =>
              val rgb = out.getRGB(x, y)
              ((rgb >> 16) & 0xff) * 0.299 + ((rgb >> 8) & 0xff) * 0.587 +
                (rgb & 0xff) * 0.114
            }
            // rows then columns: C = B · L · Bᵀ, only the first 8 of each
            val rowPass = Array.tabulate(8, 32) { (u, x) =>
              var s = 0.0; var y = 0
              while (y < 32) { s += basis(u)(y) * lum(y)(x); y += 1 }
              s
            }
            val coeff = Array.tabulate(8, 8) { (u, v) =>
              var s = 0.0; var x = 0
              while (x < 32) { s += basis(v)(x) * rowPass(u)(x); x += 1 }
              s
            }
            val ac = (for (u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0)
              yield coeff(u)(v)).toArray
            val median = ac.sorted.apply(31)
            var hash = 0L
            for (u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0)
              if (coeff(u)(v) > median) hash |= 1L << (u * 8 + v)
            ImagePHash(r.media_id, hash, decoded = true)
          case None =>
            val h = md5Bytes(r.bytes)
            var hash = 0L
            var i = 0
            while (i < 8) { hash = (hash << 8) | java.lang.Byte.toUnsignedInt(h(i)); i += 1 }
            ImagePHash(r.media_id, hash, decoded = false)
        }
      }
    }
  }

  /** Hamming near-dup pairs over pHashes — same generic banded
    * pigeonhole join as the dHash path. */
  def phashNearDupPairs(hashes: DataFrame, maxDist: Int): DataFrame =
    graft.ops.ScaleDedup.hammingNearDupPairs(hashes, "media_id", "phash",
      bits = 64, maxDist = maxDist)

  /** Frame-sample STAND-IN for video payloads: take every `stride`-th chunk
    * of the payload as a "frame" — the partition-local slicing shape of a
    * real frame sampler. This container ships no video codecs, so this is
    * explicitly NOT decode: mimes without a `video/` prefix are REFUSED (loud
    * IllegalArgumentException, not silent garbage) and the output column is
    * named `synthetic_frame_bytes` so a consumer cannot mistake the chunks
    * for decoded frames. */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRecord],
                   frameBytes: Int = 16, stride: Int = 4): DataFrame = {
    import spark.implicits._
    media.flatMap { r =>
      require(r.mime != null && r.mime.startsWith("video/"),
        s"sampleFrames: refusing non-video payload (media_id=${r.media_id}, " +
          s"mime=${r.mime}) — no codecs in this build; byte-slice stand-in " +
          "is only meaningful on video streams")
      val nFrames = r.bytes.length / (frameBytes * stride)
      (0 until nFrames).map { i =>
        val off = i * frameBytes * stride
        (r.media_id, i, r.bytes.slice(off, off + frameBytes))
      }
    }.toDF("media_id", "frame_idx", "synthetic_frame_bytes")
  }
}
