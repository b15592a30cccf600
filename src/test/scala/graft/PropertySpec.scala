package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DatesNums, Dedup, ScaleDedup, TextParse}

/** SURVEY.md §5.3 property tests: format→parse round-trips, dedup
  * idempotence, and the zero-aware fill lattice. Generated inputs via
  * scalacheck with a fixed seed (deterministic CI). */
class PropertySpec extends AnyFunSuite with SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(7L))

  test("property: multi-format date round-trip (format → parse → same date)") {
    import spark.implicits._
    val dateGen = for {
      epochDay <- Gen.chooseNum(0L, 20000L) // 1970..2024
      form <- Gen.chooseNum(0, 3)
    } yield (LocalDate.ofEpochDay(epochDay), form)
    val rows = samples(dateGen, 400).map { case (dt, form) =>
      val raw = form match {
        case 0 => s"${dt.getMonth.getDisplayName(java.time.format.TextStyle.FULL, java.util.Locale.US)} ${dt.getDayOfMonth}, ${dt.getYear}"
        case 1 => dt.toString                       // yyyy-MM-dd
        case 2 => s"${dt.getMonth.getDisplayName(java.time.format.TextStyle.FULL, java.util.Locale.US)} ${dt.getYear}"
        case _ => dt.getYear.toString
      }
      // forms 2/3 lose day/month: expected truncates accordingly
      val expect = form match {
        case 0 | 1 => dt
        case 2 => dt.withDayOfMonth(1)
        case _ => dt.withDayOfYear(1)
      }
      (raw, expect.toString)
    }
    val out = rows.toDF("raw", "expect")
      .withColumn("parsed", DatesNums.parseDateMulti(col("raw")).cast("string"))
      .collect()
    out.foreach { r =>
      assert(r.getString(2) === r.getString(1), s"raw='${r.getString(0)}'")
    }
  }

  test("property: keep-first dedup is idempotent and keeps the min order key") {
    import spark.implicits._
    val rowGen = for {
      k <- Gen.chooseNum(0, 30)
      ord <- Gen.chooseNum(0, 1000)
      payload <- Gen.alphaStr.map(_.take(5))
    } yield (k, ord, payload)
    val df = samples(rowGen, 500).toDF("k", "ord", "p")
      .dropDuplicates("k", "ord") // make (k, ord) a unique order key
    val once = Dedup.keepFirst(df, Seq("k"), Seq(col("ord").asc))
    val twice = Dedup.keepFirst(once, Seq("k"), Seq(col("ord").asc))
    assert(once.orderBy("k").collect().toSeq === twice.orderBy("k").collect().toSeq)
    // keep-first under ascending ord == min(ord) per key
    val expectMin = df.groupBy("k").agg(min("ord").alias("ord"))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val gotMin = once.select("k", "ord").orderBy("k").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(gotMin === expectMin)
    // the aggregation form is row-identical to the window form
    val aggForm = Dedup.keepFirstAgg(df, Seq("k"), Seq("ord"))
      .orderBy("k").collect().toSeq
    assert(aggForm === once.orderBy("k").collect().toSeq)
  }

  test("property: zero-aware fill lattice (J2 semantics)") {
    import spark.implicits._
    val vGen = Gen.oneOf[java.lang.Double](null.asInstanceOf[java.lang.Double],
      java.lang.Double.valueOf(0.0), java.lang.Double.valueOf(1.5),
      java.lang.Double.valueOf(-3.0))
    val pairs = samples(Gen.zip(vGen, vGen), 200)
    val df = pairs.toDF("kaggle", "wiki")
    // zeroOnly=true: ONLY kaggle==0 pulls wiki (nulls survive — J2)
    val strict = df.select(col("kaggle"), col("wiki"),
      DatesNums.fillZeroFrom(col("kaggle"), col("wiki"), zeroOnly = true).alias("f"))
      .collect()
    strict.foreach { r =>
      val k = if (r.isNullAt(0)) null else r.getDouble(0).asInstanceOf[Any]
      val w = if (r.isNullAt(1)) null else r.getDouble(1).asInstanceOf[Any]
      val f = if (r.isNullAt(2)) null else r.getDouble(2).asInstanceOf[Any]
      if (k == 0.0) assert(f === w, s"k=0 must pull wiki: $r")
      else assert(f === k, s"k≠0 must keep kaggle (incl. null): $r")
    }
    // zeroOnly=false: null OR 0 pulls wiki
    val lenient = df.select(col("kaggle"), col("wiki"),
      DatesNums.fillZeroFrom(col("kaggle"), col("wiki"), zeroOnly = false).alias("f"))
      .collect()
    lenient.foreach { r =>
      val k = if (r.isNullAt(0)) null else r.getDouble(0).asInstanceOf[Any]
      val w = if (r.isNullAt(1)) null else r.getDouble(1).asInstanceOf[Any]
      val f = if (r.isNullAt(2)) null else r.getDouble(2).asInstanceOf[Any]
      if (k == null || k == 0.0) assert(f === w, s"null/0 must pull wiki: $r")
      else assert(f === k, s"non-zero kaggle survives: $r")
    }
  }

  test("property: native hash kernels == Column-expression forms on arbitrary unicode") {
    import spark.implicits._
    // Unicode-heavy token strings: multi-byte UTF-8 is where a byte-level
    // kernel could diverge from the built-ins' string path
    val tokGen = Gen.listOfN(6,
      Gen.oneOf(Gen.alphaNumStr.map(_.take(4)), Gen.const("héllo"),
        Gen.const("日本語"), Gen.const("mañana"), Gen.const(""), Gen.const("#1")))
      .map(_.mkString(" "))
    val df = samples(tokGen, 300).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val toks = ScaleDedup.tokenSet(col("text"))
    val mh = df.select(col("id") +: ScaleDedup.minhashSignature(toks, 6): _*)
      .orderBy("id").collect().toSeq
    val mhRef = df.select(col("id") +: ScaleDedup.minhashSignatureCols(toks, 6): _*)
      .orderBy("id").collect().toSeq
    assert(mh == mhRef)
    val sh = df.select(col("id"), ScaleDedup.simhash(toks, 16).alias("s"))
      .orderBy("id").collect().toSeq
    val shRef = df.select(col("id"), ScaleDedup.simhashCols(toks, 16).alias("s"))
      .orderBy("id").collect().toSeq
    assert(sh == shRef)
    val sg = df.select(col("id") +: ScaleDedup.shingleSignature(col("text"), 3, 2): _*)
      .orderBy("id").collect().toSeq
    val sgExpr = ScaleDedup.shingles(col("text"), 3)
    val sgRef = df.select(col("id") +: size(sgExpr).cast("long").alias("n_shingles") +:
      ScaleDedup.minhashSignatureCols(sgExpr, 2): _*)
      .orderBy("id").collect().toSeq
    assert(sg == sgRef)
  }

  test("property: parse_dollars plain-number round-trip") {
    import spark.implicits._
    val amounts = samples(Gen.chooseNum(1, 9999999), 200).map(_.toDouble)
    val df = amounts.map(a => (a, s"$$$a")).toDF("amount", "raw")
      .withColumn("parsed", TextParse.parseDollars(col("raw")))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(0)) < 1e-6, r.toString)
    }
  }

  test("property: BPE tokenization partitions each word (concat reconstructs)") {
    import spark.implicits._
    // merging only ever concatenates adjacent symbols, so the tokens of a
    // word must concatenate back to the word, for ANY merges table
    val wordGen = Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString)
    val docs = samples(Gen.listOfN(6, wordGen), 150).map(_.mkString(" "))
    val out = docs.toDF("text")
      .select(col("text"),
        concat_ws(" ", graft.functions.Bpe.bpe_tokens(col("text"),
          graft.ops.TextAnalysis.DefaultBpeMerges)).alias("rejoined"))
      .collect()
    out.foreach { r =>
      // token boundaries never cross words and never drop characters:
      // space-joining the tokens re-inserts exactly the word boundaries
      assert(r.getString(1).replace(" ", "") == r.getString(0).replace(" ", ""),
        s"text='${r.getString(0)}'")
    }
  }

  test("property: banded Hamming pairing equals brute force on random hashes") {
    import spark.implicits._
    val hashes = samples(Gen.chooseNum(0L, 65535L), 60).distinct
      .zipWithIndex.map { case (h, i) => (i.toLong, h) }
    // duplicate a few hash values under new ids to exercise the
    // same-value fast path
    val withDups = hashes ++ hashes.take(5)
      .map { case (i, h) => (1000L + i, h) }
    val df = withDups.toDF("id", "h")
    for (maxDist <- Seq(0, 2, 4)) {
      val banded = ScaleDedup.hammingNearDupPairs(df, "id", "h", 16, maxDist)
        .select("id1", "id2", "dist")
        .as[(Long, Long, Long)].collect().toSet
      val brute = (for {
        (i1, h1) <- withDups; (i2, h2) <- withDups
        if i1 < i2
        d = java.lang.Long.bitCount(h1 ^ h2).toLong
        if d <= maxDist
      } yield (i1, i2, d)).toSet
      assert(banded == brute, s"maxDist=$maxDist")
    }
  }

  test("property: chunker reconstructs the document (drop overlap, concat)") {
    import spark.implicits._
    // for any token count, chunk 0 plus each later chunk minus its
    // leading `overlap` tokens concatenates back to the original —
    // i.e. coverage is exact: no token lost, none double-emitted
    val texts = samples(Gen.chooseNum(1, 40), 30)
      .map(n => (1 to n).map(i => s"w$i").mkString(" "))
    val got = texts.toDF("text")
      .select(col("text"),
        graft.ops.TextAnalysis.chunkOverlap(col("text"), 7, 3).alias("ch"))
      .as[(String, Seq[String])].collect()
    got.foreach { case (text, chunks) =>
      val toks = text.split(" ").toSeq
      val rebuilt = chunks.head.split(" ").toSeq ++
        chunks.tail.flatMap(_.split(" ").toSeq.drop(3))
      assert(rebuilt == toks, s"n=${toks.size}")
    }
  }

  test("property: maxGroup caps same-value expansion without changing clusters") {
    import spark.implicits._
    // a mega-group of 8 identical hashes, a small group of 3, a cross-value
    // neighbor at distance 1 of the mega value, and an isolated hash
    val mega = (1L to 8L).map(i => (i, 0xF0F0L))
    val smallG = (21L to 23L).map(i => (i, 0x1234L))
    val neighbor = Seq((31L, 0xF0F1L))
    val lone = Seq((41L, 0x0A0AL))
    val df = (mega ++ smallG ++ neighbor ++ lone).toDF("id", "h")
    def pairs(cap: Int) =
      ScaleDedup.hammingNearDupPairs(df, "id", "h", 16, maxDist = 1,
        maxGroup = cap)
        .select("id1", "id2", "dist").as[(Long, Long, Long)].collect().toSet
    val full = pairs(4096)
    val capped = pairs(4)
    // below the cap nothing changes: the small group's pairs are identical
    assert(capped.filter(p => p._1 >= 21 && p._1 <= 23) ==
      full.filter(p => p._1 >= 21 && p._1 <= 23))
    // the mega group collapses from 28 quadratic pairs to a 7-row hub star
    assert(full.count(p => p._1 <= 8 && p._2 <= 8) == 28)
    assert(capped.filter(p => p._2 <= 8) ==
      (2L to 8L).map(i => (1L, i, 0L)).toSet)
    // cross-value pairs attach to the hub only
    assert(capped.filter(p => p._2 == 31L) == Set((1L, 31L, 1L)))
    // and connected components over capped pairs == over full pairs
    def clusters(ps: Set[(Long, Long, Long)]) = {
      val labels = ScaleDedup.connectedComponents(
        df.select(col("id")),
        ps.toSeq.toDF("id1", "id2", "dist").select("id1", "id2"))
      labels.select("id", "label").as[(Long, Long)].collect().toMap
    }
    assert(clusters(capped) == clusters(full))
  }

  test("property: span dedup == sequential first-occurrence reference") {
    import spark.implicits._
    // tiny vocab forces heavy cross-doc gram sharing; k=3 spans
    val k = 3
    val docGen = Gen.chooseNum(3, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    val docs = samples(docGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    // reference: walk docs in id order, positions left-to-right; a gram
    // occurrence is removed iff its gram string was seen before (in any
    // doc, or earlier in this one); removed spans union their positions
    val seen = scala.collection.mutable.Set[String]()
    val expected = docs.map { case (id, text) =>
      val toks = text.split(" ")
      val cov = scala.collection.mutable.Set[Int]()
      for (p <- 0 to toks.length - k) {
        val gram = toks.slice(p, p + k).mkString(" ")
        if (seen.contains(gram)) cov ++= (p until p + k)
        else seen += gram
      }
      val clean = toks.zipWithIndex.collect {
        case (t, i) if !cov.contains(i) => t }.mkString(" ")
      (id, clean, cov.size.toLong)
    }
    val got = ScaleDedup.removeRepeatedSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got == expected)
  }

  test("property: dispersion resultant identity equals brute-force pairwise mean") {
    import spark.implicits._
    val vecGen = for {
      x <- Gen.chooseNum(-5.0f, 5.0f)
      y <- Gen.chooseNum(-5.0f, 5.0f)
      z <- Gen.chooseNum(-5.0f, 5.0f)
    } yield Array(x, y, z)
    val vecs = samples(vecGen, 30).filter(v =>
      v.map(x => x.toDouble * x).sum > 1e-6)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) }
      .toDF("vec_id", "embedding", "label")
    val got = graft.ops.Similarity.dispersionReport(df, "embedding", "label")
      .collect().head.getDouble(3)
    // brute force over all ordered pairs of normalized vectors
    val unit = vecs.map { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(_ / n)
    }
    val n = unit.size
    val brute = (for {
      a <- unit; b <- unit if !(a eq b)
    } yield a.zip(b).map { case (x, y) => x * y }.sum).sum / (n.toDouble * (n - 1))
    assert(math.abs(got - brute) < 1e-4, s"identity $got vs brute $brute")
  }

  test("property: clustering agreement is symmetric and maximal on itself") {
    import spark.implicits._
    val labGen = for {
      a <- Gen.chooseNum(0, 4)
      b <- Gen.chooseNum(0, 3)
    } yield (a.toLong, b.toLong)
    val rows = samples(labGen, 60).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
    val av = rows.map { case (i, a, _) => (i, a) }.toDF("id", "label")
    val bv = rows.map { case (i, _, b) => (i, b) }.toDF("id", "label")
    val ab = graft.ops.Stats.clusteringAgreement(av, bv).collect().head
    val ba = graft.ops.Stats.clusteringAgreement(bv, av).collect().head
    assert(ab.getDouble(3) == ba.getDouble(3) && ab.getDouble(4) == ba.getDouble(4))
    val self = graft.ops.Stats.clusteringAgreement(av, av).collect().head
    assert(self.getDouble(3) == 1.0 && self.getDouble(4) == 1.0)
  }

  test("property: periodogram == plain-Scala DFT reference on random series") {
    import spark.implicits._
    def r(d: Double, s: Int): Double =
      BigDecimal(d).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dsum(ts: Seq[Double], s: Int): Double =
      ts.map(BigDecimal(_).setScale(s, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    def ref(counts: Seq[Int], maxP: Int): Map[Long, Double] = {
      val n = counts.size.toDouble
      val mraw = dsum(counts.map(_.toDouble), 6) / n
      val cc = counts.map(c => r(c - r(mraw, 9), 9))
      (2 to maxP).map { p =>
        val cos = cc.indices.map(t =>
          cc(t) * r(math.cos(6.283185307179586 * (t % p) / p), 9))
        val sin = cc.indices.map(t =>
          cc(t) * r(math.sin(6.283185307179586 * (t % p) / p), 9))
        val sc = dsum(cos, 12); val ss = dsum(sin, 12)
        p.toLong -> r((sc * sc + ss * ss) / n, 6)
      }.toMap
    }
    val serGen = Gen.listOfN(50, Gen.chooseNum(1, 9))
    samples(serGen, 6).foreach { counts =>
      val rows = counts.zipWithIndex.flatMap { case (c, i) =>
        val d = java.sql.Date.valueOf(
          java.time.LocalDate.of(2024, 1, 1).plusDays(i))
        Seq.fill(c)(d)
      }
      val got = graft.ops.Stats.periodogram(rows.toDF("d"), col("d"),
          maxPeriod = 8)
        .collect().map(r0 => r0.getLong(0) -> r0.getDouble(1)).toMap
      val expect = ref(counts, 8)
      assert(got === expect, s"counts=$counts")
    }
  }

  test("property: isotonic minimax identity == sequential PAV on random bins") {
    import spark.implicits._
    // Independent reference: the textbook pool-adjacent-violators stack.
    // Pools accumulate exact longs, so the pooled mean is the identical
    // long/long double the minimax form computes — 6-dp equality exact.
    def pavRef(nb: Seq[Long], ny: Seq[Long]): Seq[Double] = {
      val pools = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
      for (i <- nb.indices) {
        var (n, y, w) = (nb(i), ny(i), 1)
        while (pools.nonEmpty &&
          pools.last._2.toDouble / pools.last._1.toDouble >
            y.toDouble / n.toDouble) {
          val (pn, py, pw) = pools.remove(pools.size - 1)
          n += pn; y += py; w += pw
        }
        pools += ((n, y, w))
      }
      pools.flatMap { case (n, y, w) =>
        Seq.fill(w)(y.toDouble / n.toDouble) }.toSeq
    }
    val caseGen = for {
      bins <- Gen.chooseNum(2, 8)
      cells <- Gen.listOfN(bins, for {
        n <- Gen.chooseNum(1, 5)
        y <- Gen.chooseNum(0, 5)
      } yield (n.toLong, math.min(y, n).toLong))
    } yield (bins, cells)
    samples(caseGen, 25).foreach { case (bins, cells) =>
      // score (b + 0.5)/bins sits mid-bin (anchors at 0 and 1 pin the
      // min-max identity); every bin is non-empty by construction
      val rows = cells.zipWithIndex.flatMap { case ((n, y), b) =>
        val s = if (b == 0) 0.0 else if (b == bins - 1) 1.0
          else (b + 0.5) / bins
        (0L until n).map(i => (s, i < y))
      } ++ Seq((0.0, false), (1.0, false)) // anchor lo/hi
      val withAnchors = cells.zipWithIndex.map { case ((n, y), b) =>
        if (b == 0 || b == bins - 1) (n + 1, y) else (n, y)
      }
      val expect = pavRef(withAnchors.map(_._1), withAnchors.map(_._2))
        .map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      val got = graft.ops.Stats.isotonicCalibration(
          rows.toDF("s", "y"), col("y"), "s", bins)
        .collect().map(_.getDouble(3)).toSeq
      assert(got === expect, s"bins=$bins cells=$cells")
    }
  }

  test("property: gmmEm1d == plain-Scala EM reference on random samples") {
    import spark.implicits._
    // Plain-Scala replay of the round-13 PORTABLE value path (the cox
    // replay's construction): floor-ladder pins, exact integer (hi, lo)
    // pair sums (BigInt stands in for the op's DECIMAL(38,0)), IEEE
    // rebuilds — NO engine round(), NO decimal<->double cast anywhere.
    // The asserts are BIT equality on the pin6 readouts.
    def pin(d: Double, q: Double): Double = {
      val hi = math.floor(d)
      hi + math.floor((d - hi) * q + 0.5) / q
    }
    def pairSum(vs: Seq[Double]): Double = {
      val (h, l) = vs.foldLeft((BigInt(0), BigInt(0))) { case ((h, l), v) =>
        val hi = math.floor(v)
        (h + BigInt(hi.toLong),
          l + BigInt(math.floor((v - hi) * 1e9 + 0.5).toLong))
      }
      h.toDouble + l.toDouble / 1e9
    }
    def emRef(xs: Seq[Double], iters: Int): (Double, Double, Double, Double, Double) = {
      val n = xs.size.toDouble
      val m = pin(pairSum(xs) / n, 1e9)
      val exx = pairSum(xs.map(x => x * x)) / n
      val sd0 = math.sqrt(math.max(exx - m * m, 1e-12))
      var (p2, mu1, s1, mu2, s2) =
        (0.5, pin(m - sd0, 1e9), pin(sd0, 1e9), pin(m + sd0, 1e9),
          pin(sd0, 1e9))
      for (_ <- 1 to iters) {
        val rs = xs.map { x =>
          val d1 = (x - mu1) / s1; val d2 = (x - mu2) / s2
          // the op's PORTABLE exp kernel (not libm) — the reference
          // must be exp-exact, not merely 9-dp-close, or a boundary
          // input flips the pinned ratio
          val pexp = graft.functions.PortableMathKernel.pexp _
          val w1 = ((1.0 - p2) / s1) * pexp(-(0.5 * (d1 * d1)))
          val w2 = (p2 / s2) * pexp(-(0.5 * (d2 * d2)))
          // larger-mean-keyed midpoint tiebreak + pinned ratio
          if (w1 + w2 == 0.0) {
            if ((x > (mu1 + mu2) / 2.0) == (mu2 >= mu1)) 1.0 else 0.0
          } else pin(w2 / (w1 + w2), 1e9)
        }
        val r2 = pairSum(rs); val r1 = pairSum(rs.map(1.0 - _))
        val r2x = pairSum(rs.zip(xs).map { case (rr, x) => rr * x })
        val r1x = pairSum(rs.zip(xs).map { case (rr, x) => (1.0 - rr) * x })
        val r2xx = pairSum(rs.zip(xs).map { case (rr, x) => rr * x * x })
        val r1xx = pairSum(rs.zip(xs).map { case (rr, x) => (1.0 - rr) * x * x })
        val m1u = r1x / r1; val m2u = r2x / r2
        p2 = pin(r2 / n, 1e9)
        s1 = pin(math.sqrt(math.max(r1xx / r1 - m1u * m1u, 1e-12)), 1e9)
        s2 = pin(math.sqrt(math.max(r2xx / r2 - m2u * m2u, 1e-12)), 1e9)
        mu1 = pin(m1u, 1e9); mu2 = pin(m2u, 1e9)
      }
      if (mu1 > mu2) (p2, mu2, s2, mu1, s1) else (1.0 - p2, mu1, s1, mu2, s2)
    }
    val xsGen = Gen.listOfN(40, Gen.chooseNum(-300, 300).map(_ / 50.0))
    samples(xsGen, 8).foreach { xs =>
      val (piLo, muLo, sLo, muHi, sHi) = emRef(xs, 3)
      val row = graft.ops.Stats.gmmEm1d(xs.toDF("x"), col("x"), iters = 3)
        .collect().head
      assert(row.getDouble(1) == pin(piLo, 1e6), s"pi_lo xs=$xs")
      assert(row.getDouble(2) == pin(muLo, 1e6), s"mu_lo xs=$xs")
      assert(row.getDouble(3) == pin(sLo, 1e6), s"sigma_lo xs=$xs")
      assert(row.getDouble(5) == pin(muHi, 1e6), s"mu_hi xs=$xs")
      assert(row.getDouble(6) == pin(sHi, 1e6), s"sigma_hi xs=$xs")
    }
  }

  test("property: coxPh == plain-Scala Newton reference on random subjects") {
    import spark.implicits._
    // Plain-Scala replay of the round-13 PORTABLE value path: floor-
    // ladder pins, exact integer (hi, lo) pair sums (BigInt stands in
    // for the op's DECIMAL(38,0)), IEEE rebuilds — NO engine round(),
    // NO decimal<->double cast anywhere, mirroring Stats.coxPh op for
    // op. The assert is BIT equality on the pin6 readout.
    def pin(d: Double, q: Double): Double = {
      val hi = math.floor(d)
      hi + math.floor((d - hi) * q + 0.5) / q
    }
    def coxRef(subj: Seq[(Long, Boolean, Double)], iters: Int): Double = {
      val pexp = graft.functions.PortableMathKernel.pexp _
      def pair(vs: Seq[Double]): (BigInt, BigInt) =
        vs.foldLeft((BigInt(0), BigInt(0))) { case ((h, l), v) =>
          val hi = math.floor(v)
          (h + BigInt(hi.toLong),
            l + BigInt(math.floor((v - hi) * 1e9 + 0.5).toLong))
        }
      def rebuild(p: (BigInt, BigInt)): Double =
        p._1.toDouble + p._2.toDouble / 1e9
      var b = 0.0
      for (_ <- 1 to iters) {
        val byT = subj.groupBy(_._1).toSeq.sortBy(_._1)
        val perT = byT.map { case (t, rows) =>
          val exs = rows.map(rr => pin(pexp(b * rr._3), 1e9))
          val a0 = pair(exs)
          val a1 = pair(rows.zip(exs).map { case (rr, ex) => rr._3 * ex })
          val a2 = pair(rows.zip(exs).map { case (rr, ex) =>
            rr._3 * rr._3 * ex })
          val ne = rows.count(_._2).toLong
          val sx = pair(rows.map(rr => if (rr._2) rr._3 else 0.0))
          (t, a0, a1, a2, ne, sx)
        }
        def padd(a: (BigInt, BigInt), b2: (BigInt, BigInt)) =
          (a._1 + b2._1, a._2 + b2._2)
        val (u, i) = perT.indices.foldLeft(
          (List.empty[Double], List.empty[Double])) {
          case ((us, is), idx) =>
            val tail = perT.drop(idx)
            val s0 = rebuild(tail.map(_._2).reduce(padd))
            val s1 = rebuild(tail.map(_._3).reduce(padd))
            val s2 = rebuild(tail.map(_._4).reduce(padd))
            val (_, _, _, _, ne, sx) = perT(idx)
            if (ne > 0) {
              val ratio = s1 / s0
              (us :+ (rebuild(sx) - ne.toDouble * ratio),
                is :+ (ne.toDouble * (s2 / s0 - ratio * ratio)))
            } else (us, is)
        }
        b = pin(b + rebuild(pair(u)) / rebuild(pair(i)), 1e9)
      }
      b
    }
    val subjGen = Gen.listOfN(30, for {
      t <- Gen.chooseNum(0, 12)
      e <- Gen.oneOf(true, false)
      x <- Gen.chooseNum(-20, 20).map(_ / 10.0)
    } yield (t.toLong, e, x))
    samples(subjGen, 8).filter(s => s.count(_._2) >= 3).foreach { subj =>
      val beta = coxRef(subj, 3)
      val row = graft.ops.Stats.coxPh(subj.toDF("dur", "obs", "x"),
        "dur", "obs", "x", iters = 3).collect().head
      assert(java.lang.Double.doubleToLongBits(row.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(pin(beta, 1e6)),
        s"beta ${row.getDouble(2)} vs ref ${pin(beta, 1e6)} subj=$subj")
    }
  }
}
