package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Stats

/** Classical statistics against analytically-known answers. */
class StatsSpec extends AnyFunSuite with SparkSpec {

  test("autocorrelation of an alternating series is -(n-l)/n at odd lags") {
    import spark.implicits._
    // Counts per day alternate 1,2,1,2,... (mean 1.5, deviations ±0.5):
    // acf(l) = Σ c_t c_{t+l} / Σ c_t² = ±(n−l)/n exactly.
    val n = 40
    val rows = (0 until n).flatMap { i =>
      val d = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
      Seq.fill(if (i % 2 == 0) 1 else 2)(d)
    }
    val df = rows.toDF("d")
    val acf = Stats.autocorrelation(df, col("d"), maxLag = 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(acf(1) - (-(n - 1).toDouble / n)) < 1e-6)
    assert(math.abs(acf(2) - ((n - 2).toDouble / n)) < 1e-6)
    assert(math.abs(acf(3) - (-(n - 3).toDouble / n)) < 1e-6)
  }

  test("mannWhitneyU matches the hand-computed rank sums with ties") {
    import spark.implicits._
    // A = {1, 2, 4}, B = {3, 4, 5, 6}: combined ranks 1,2,3,4.5,4.5,6,7
    // → R_A = 1 + 2 + 4.5 = 7.5, U_A = 7.5 − 3·4/2 = 1.5, U_B = 10.5.
    val df = Seq((0, 1.0), (0, 2.0), (0, 4.0), (1, 3.0), (1, 4.0),
      (1, 5.0), (1, 6.0)).toDF("g", "v")
    val r = Stats.mannWhitneyU(df, col("g") === 1, "v").collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 4L)
    assert(math.abs(r.getDouble(2) - 1.5) < 1e-9)
    assert(math.abs(r.getDouble(3) - 10.5) < 1e-9)
    // z = (U_A − 6) / sqrt(12/12 · (8 − 6/42)) = −4.5 / sqrt(7.857142…)
    assert(math.abs(r.getDouble(4) - (-4.5 / math.sqrt(8.0 - 6.0 / 42.0))) < 1e-6)
  }

  test("benfordDigits reads the leading significant digit, not the sign") {
    import spark.implicits._
    val df = Seq(123.45, -987.0, 1.0, 10.0, 0.5, 9999.99).toDF("v")
    val rows = Stats.benfordDigits(df, "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // 0.5 excluded (|x| < 1); digits: 1 (123.45), 9 (-987), 1 (1.0),
    // 1 (10.0), 9 (9999.99).
    assert(rows === Map(1 -> 3L, 9 -> 2L))
  }

  test("gini is 0 for equal shares and (n-1)/n-scaled for one-holder") {
    import spark.implicits._
    val equal = Seq.fill(10)(5.0).toDF("v")
    val g0 = Stats.giniCoefficient(equal, "v").collect().head
    assert(g0.getLong(0) === 10L && math.abs(g0.getDouble(2)) < 1e-9)

    // One key holds everything: G = (n−1)/n with zero-valued others.
    val onePct = (1.0 +: Seq.fill(9)(0.0)).toDF("v")
    val g1 = Stats.giniCoefficient(onePct, "v").collect().head
    assert(math.abs(g1.getDouble(2) - 0.9) < 1e-6)
  }

  test("kaplanMeier matches the hand-computed product-limit curve") {
    import spark.implicits._
    // (dur, observed): events at t=1 (n=6), t=3 (n=4, d=2), t=5 (n=1);
    // censored at t=2 and t=4. S = 5/6, then 5/6·1/2 = 5/12, then 0.
    val subj = Seq((1L, true), (2L, false), (3L, true), (3L, true),
      (4L, false), (5L, true)).toDF("dur", "observed")
    val rows = Stats.kaplanMeier(subj, "dur", "observed")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq((1L, 6L, 1L), (3L, 4L, 2L), (5L, 1L, 1L)))
    assert(math.abs(rows(0)._4 - 5.0 / 6) < 1e-6)
    assert(math.abs(rows(1)._4 - 5.0 / 12) < 1e-6)
    assert(rows(2)._4 === 0.0)
  }

  test("mahalanobisTopK ranks the off-ridge point above larger on-ridge ones") {
    import spark.implicits._
    // Tight y≈x ridge plus one anti-correlated point: (2,-2) must beat
    // the farther-out but on-ridge (3,3).
    val df = Seq((1, 0.0, 0.0), (2, 1.0, 1.0), (3, -1.0, -1.0),
      (4, 2.0, 2.0), (5, -2.0, -2.0), (6, 3.0, 3.0), (7, -3.0, -3.0),
      (8, 2.0, -2.0)).toDF("id", "x", "y")
    val top = Stats.mahalanobisTopK(df, "x", "y", Seq("id"), k = 2)
      .collect().map(_.getInt(0))
    assert(top.head === 8, s"expected the anti-correlated point first, got ${top.toSeq}")
  }

  test("pathTrigrams counts consecutive per-key type sequences") {
    import spark.implicits._
    val e = Seq((1, 1L, "a"), (1, 2L, "b"), (1, 3L, "c"), (1, 4L, "a"),
      (2, 1L, "a"), (2, 2L, "b"), (2, 3L, "c")).toDF("u", "t", "ty")
    val rows = graft.ops.Sessionize.pathTrigrams(e, "u", "t", "t", "ty", topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.toSeq === Seq(("a", "b", "c", 2L), ("b", "c", "a", 1L)))
  }

  test("cramersV is 1 for a deterministic mapping, ~0 for independence") {
    import spark.implicits._
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"),
      ("c", "z"), ("c", "z")).toDF("u", "v")
    val v1 = Stats.cramersV(dep, "u", "v").collect().head
    assert(math.abs(v1.getDouble(2) - 1.0) < 1e-9)

    val indep = (for { a <- Seq("a", "b"); b <- Seq("x", "y") }
      yield (a, b)).toDF("u", "v")
    val v0 = Stats.cramersV(indep, "u", "v").collect().head
    assert(math.abs(v0.getDouble(2)) < 1e-9)
  }

  test("olsFit2 recovers an exact plane with r2 = 1") {
    import spark.implicits._
    // y = 2 + 3·x1 − 4·x2, x grid chosen non-collinear.
    val df = (for { x1 <- 0 to 4; x2 <- 0 to 3 }
      yield (x1.toDouble, x2.toDouble, 2.0 + 3.0 * x1 - 4.0 * x2))
      .toDF("x1", "x2", "y")
    val r = Stats.olsFit2(df, "y", "x1", "x2").collect().head
    assert(math.abs(r.getDouble(1) - 2.0) < 1e-6)
    assert(math.abs(r.getDouble(2) - 3.0) < 1e-6)
    assert(math.abs(r.getDouble(3) - (-4.0)) < 1e-6)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-6)
  }

  test("frequentTriples: A-priori pruning returns the exact support counts") {
    import spark.implicits._
    // Baskets: {1,2,3} ×3, {1,2,4} ×2, {2,3,4} ×1 → triple (1,2,3)
    // support 3, (1,2,4) support 2, (2,3,4) support 1 (dropped).
    val rows =
      (1 to 3).flatMap(b => Seq(1, 2, 3).map(i => (s"a$b", i))) ++
      (1 to 2).flatMap(b => Seq(1, 2, 4).map(i => (s"b$b", i))) ++
      Seq(2, 3, 4).map(i => ("c1", i))
    val df = rows.toDF("bk", "it")
    val t = Stats.frequentTriples(df, "bk", "it", minSupport = 2L, topN = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(t.toSeq === Seq((1, 2, 3, 3L), (1, 2, 4, 2L)))
  }

  test("crossCorrelation: y echoing x one day later peaks at lag +1") {
    import spark.implicits._
    // Daily count x alternates 1,2; value sum y echoes the PREVIOUS
    // day's count, so corr(x_t, y_{t+1}) = +1 and corr(x_t, y_t) = −1.
    val rows = (0 until 30).flatMap { i =>
      val d = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 3, 1).plusDays(i))
      val cnt = if (i % 2 == 0) 1 else 2
      val yv = if ((i - 1 + 2) % 2 == 0) 10.0 else 20.0 // yesterday's pattern
      (0 until cnt).map(k => (d, if (k == 0) yv else 0.0))
    }
    val df = rows.toDF("d", "v")
    val ccf = Stats.crossCorrelation(df, col("d"), col("v"), maxLag = 2)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(ccf(1) > 0.9, s"expected strong positive at +1, got $ccf")
    assert(ccf(0) < -0.9, s"expected strong negative at 0, got $ccf")
  }

  test("rfmSegments bands a uniform spread into equal quintiles") {
    import spark.implicits._
    // 10 customers, one order each on distinct days with distinct spend:
    // every metric bands 2 customers per quintile; frequency ties all
    // share band 1 (first-position rule).
    val df = (1 to 10).map { c =>
      (c.toLong, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, c)),
        c * 100.0)
    }.toDF("cust", "d", "amt")
    val seg = Stats.rfmSegments(df, "cust", col("d"), "amt", tiles = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(seg.map(_._4).sum === 10L)
    assert(seg.forall(_._2 === 1), s"tied frequency must share band 1: ${seg.toSeq}")
    // Later order date (higher cust) = more recent = higher r_score,
    // and spend rises with cust, so r and m scores move together.
    val rToM = seg.map(s => (s._1, s._3))
    assert(rToM.sorted === rToM.sortBy(_._2), s"r/m scores misaligned: ${seg.toSeq}")
  }

  test("windowFunnel: steps must be ordered and inside the window from step 1") {
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val e = Seq(
      (1, ts(0), "view"), (1, ts(5), "click"), (1, ts(9), "purchase"), // full
      (2, ts(0), "view"), (2, ts(5), "click"), (2, ts(30), "purchase"), // p late
      (3, ts(5), "view"), (3, ts(0), "click"), // click BEFORE view
      (4, ts(0), "view")) // view only
      .toDF("u", "t", "ty")
    val got = graft.ops.Sessionize.windowFunnel(e, "u", "t", "ty",
        Seq("view", "click", "purchase"), windowMicros = 10L * 60 * 1000000)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((1, "view", 4L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("theilSenTrend ignores a wild outlier day that would wreck OLS") {
    import spark.implicits._
    // Counts rise 1/day except one day with a 1000-row spike: the
    // median pairwise slope stays 1.0.
    val rows = (0 until 20).flatMap { i =>
      val d = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 5, 1).plusDays(i))
      val cnt = if (i == 10) 1000 else i + 1
      Seq.fill(cnt)(d)
    }
    val r = Stats.theilSenTrend(rows.toDF("d"), col("d")).collect().head
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-6, s"slope ${r.getDouble(1)}")
  }

  test("kendallTau matches the hand-counted concordance") {
    import spark.implicits._
    // daily x = (1,2,3) rows, y = (10, 2, 15): pair (d1,d2) discordant,
    // (d1,d3) and (d2,d3) concordant → tau_b = (2−1)/3
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 5, 1).plusDays(i))
    val rows = Seq((day(0), 10.0)) ++
      Seq.fill(2)((day(1), 1.0)) ++ Seq.fill(3)((day(2), 5.0))
    val r = Stats.kendallTau(rows.toDF("d", "v"), col("d"), col("v"))
      .collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 2 && r.getLong(2) == 1)
    assert(r.getLong(3) == 0 && r.getLong(4) == 0)
    assert(math.abs(r.getDouble(5) - 1.0 / 3) < 1e-5)
    // perfectly monotone days → tau_b = 1
    val mono = (0 until 5).flatMap(i => Seq.fill(i + 1)((day(i), i + 0.0)))
    val m = Stats.kendallTau(mono.toDF("d", "v"), col("d"), col("v"))
      .collect().head
    assert(m.getDouble(5) == 1.0)
  }

  test("classifierMetrics: hand-computed Brier/log-loss/accuracy") {
    import spark.implicits._
    // scores 0/1/0.5 normalize to themselves; brier = 0.25/3; the only
    // non-clamp log-loss term is −ln(0.5)
    val df = Seq((0.0, "n"), (1.0, "p"), (0.5, "p")).toDF("s", "lab")
    val r = Stats.classifierMetrics(df, col("lab") === "p", "s")
      .collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 0.083333)
    assert(math.abs(r.getDouble(3) - 0.23105) < 1e-5)
    assert(r.getDouble(4) == 1.0)
    // constant score degenerates to p = 0.5 everywhere, acc counts all
    // positives correct (p >= 0.5) and all negatives wrong
    val c = Stats.classifierMetrics(
      Seq((7.0, "p"), (7.0, "n")).toDF("s", "lab"), col("lab") === "p", "s")
      .collect().head
    assert(c.getDouble(2) == 0.25 && c.getDouble(4) == 0.5)
  }

  test("pacf applies Durbin-Levinson to the pinned ACF values") {
    import spark.implicits._
    val n = 40
    val rows = (0 until n).flatMap { i =>
      val d = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
      Seq.fill(if (i % 2 == 0) 1 else 2)(d)
    }
    val df = rows.toDF("d")
    val got = Stats.pacf(df, col("d"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // recompute DL independently from the alternating-series ACF
    def r6(v: Double) = new java.math.BigDecimal(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val (r1, r2, r3) = (r6(-(n - 1).toDouble / n), r6((n - 2).toDouble / n),
      r6(-(n - 3).toDouble / n))
    val p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val p21 = r1 - p22 * r1
    val p33 = (r3 - (p21 * r2 + p22 * r1)) / (1.0 - (p21 * r1 + p22 * r2))
    assert(got(1) == r1)
    assert(math.abs(got(2) - p22) < 1e-6)
    assert(math.abs(got(3) - p33) < 1e-6)
  }

  test("sessionReport: hand-computed bounce and duration") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-05 00:$m%02d:00")
    val events = Seq((1L, t(0), 1L), (1L, t(10), 2L), (2L, t(5), 3L))
      .toDF("user_id", "ts", "event_id")
    val r = graft.ops.Sessionize.sessionReport(events, "user_id", "ts",
      "event_id", 30).collect().head
    assert(r.getLong(1) == 2)
    assert(r.getDouble(2) == 0.5)      // one of two sessions bounced
    assert(r.getDouble(3) == 1.5)      // 3 events / 2 sessions
    assert(r.getDouble(4) == 300.0)    // (600 + 0) / 2 seconds
  }

  test("wilcoxonSignedRank matches the textbook rank sums") {
    import spark.implicits._
    // diffs (1, −2, 3, 4, 5, 0): the zero drops; |d| ranks 1..5 →
    // W⁺ = 1+3+4+5 = 13, W⁻ = 2, z = 5.5/√13.75
    val pairs = Seq((2.0, 1.0), (1.0, 3.0), (5.0, 2.0), (6.0, 2.0),
      (8.0, 3.0), (4.0, 4.0)).toDF("a", "b")
    val r = Stats.wilcoxonSignedRank(pairs, "a", "b").collect().head
    assert(r.getLong(0) == 5)
    assert(r.getDouble(1) == 13.0 && r.getDouble(2) == 2.0)
    assert(math.abs(r.getDouble(3) - 5.5 / math.sqrt(13.75)) < 1e-5)
    // tied |d| values share average ranks: diffs (1, −1, 2) →
    // ranks (1.5, 1.5, 3): W⁺ = 4.5, W⁻ = 1.5
    val tied = Seq((2.0, 1.0), (1.0, 2.0), (3.0, 1.0)).toDF("a", "b")
    val t = Stats.wilcoxonSignedRank(tied, "a", "b").collect().head
    assert(t.getDouble(1) == 4.5 && t.getDouble(2) == 1.5)
  }

  test("conformalCoverage: hand-computed band and coverage") {
    import spark.implicits._
    // train mean = 1; cal residuals sorted (0, 0.5, 0.5, 1.0) → q90
    // interpolates 0.5 + 0.7·0.5 = 0.85; test residuals (0.8, 2.0) →
    // coverage 0.5
    val rows = Seq(
      ("a", 0.0, 0L), ("a", 2.0, 1L),               // train (m <= 5)
      ("a", 1.5, 16L), ("a", 0.5, 26L), ("a", 2.0, 36L), ("a", 1.0, 46L),
      ("a", 1.8, 18L), ("a", 3.0, 28L))             // test (m >= 8)
      .toDF("g", "v", "uid")
    val r = Stats.conformalCoverage(rows, "g", "v",
      col("uid") % 10 <= 5, col("uid") % 10 === 6, col("uid") % 10 >= 8,
      alpha = 0.1).collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 0.85)
    assert(r.getDouble(3) == 0.5)
  }

  test("adfStat: mean-reverting alternation gives a negative beta") {
    import spark.implicits._
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 4, 1).plusDays(i))
    // counts 1,3,1,3,1,3,1,3,2 → two-level x, group means pin the line:
    // beta = (−1.75 − 2)/2 = −1.875
    val counts = Seq(1, 3, 1, 3, 1, 3, 1, 3, 2)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(day(i)) }
    val r = Stats.adfStat(rows.toDF("d"), col("d")).collect().head
    assert(r.getLong(0) == 8)
    assert(math.abs(r.getDouble(2) + 1.875) < 1e-6, s"beta ${r.getDouble(2)}")
    assert(r.getDouble(3) < -5.0, s"t ${r.getDouble(3)}")
  }

  test("segmentedTrend recovers an exact piecewise slope change") {
    import spark.implicits._
    // counts: 2+i for days 0..4, then 7+3(i−5) — slope 1 before the
    // break at day 5, slope 3 after, continuous at the hinge
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 3, 1).plusDays(i))
    val rows = (0 until 10).flatMap { i =>
      val cnt = if (i < 5) 2 + i else 7 + 3 * (i - 5)
      Seq.fill(cnt)(day(i))
    }
    val r = Stats.segmentedTrend(rows.toDF("d"), col("d"), "2024-03-06")
      .collect().head
    assert(r.getLong(0) == 10)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-6, s"before ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 2.0) < 1e-6, s"change ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 3.0) < 1e-6)
    assert(r.getDouble(5) == 1.0)
  }

  test("positionAttribution splits 40/20/40 per closed path") {
    import spark.implicits._
    def t(i: Int) = java.sql.Timestamp.valueOf(s"2024-01-01 00:0$i:00")
    val events = Seq(
      (1L, t(1), 1L, "view"), (1L, t(2), 2L, "click"), (1L, t(3), 3L, "email"),
      (1L, t(4), 4L, "purchase"), (1L, t(5), 5L, "view"),
      (1L, t(6), 6L, "purchase"), (1L, t(7), 7L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.ops.Attribution.positionAttribution(events, "user_id",
      "ts", "event_id", "event_type", "purchase")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // path 1: view/click/email → 0.4/0.2/0.4; path 2: lone view → 1.0;
    // the trailing click never closes and earns nothing
    assert(got("view") == ((2L, 1.4)))
    assert(got("click") == ((1L, 0.2)))
    assert(got("email") == ((1L, 0.4)))
  }

  test("partialCorr removes a pure confounder") {
    import spark.implicits._
    // x and y are independent noise plus a strong shared z component:
    // raw r_xy is large, r_xy·z collapses toward 0.
    val rnd = new scala.util.Random(11)
    val df = (1 to 2000).map { _ =>
      val z = rnd.nextDouble() * 10
      (z + rnd.nextDouble(), z + rnd.nextDouble(), z)
    }.toDF("x", "y", "z")
    val r = Stats.partialCorr(df, "x", "y", "z").collect().head
    assert(r.getDouble(1) > 0.9, s"raw r_xy should be strong: ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(4)) < 0.1,
      s"partial r should collapse: ${r.getDouble(4)}")
  }

  test("geoNeighborPairs finds seam pairs exactly once and respects the radius") {
    import spark.implicits._
    val df = Seq(
      (1L, 0.0, 179.9), (2L, 0.0, -179.9),   // 22 km apart across ±180
      (3L, 10.0, 10.0), (4L, 10.1, 10.0),    // ~11 km apart
      (5L, 50.0, 50.0), (6L, 55.0, 50.0),    // ~556 km apart
      (7L, 70.0, 0.0))                       // beyond the |lat|<=60 domain
      .toDF("k", "lat", "lon")
    val got = graft.ops.Joins.geoNeighborPairs(df, "k", "lat", "lon", 200.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L), (3L, 4L)),
      s"got ${got.toSeq}")
    assert(got(0)._3 > 20 && got(0)._3 < 25, s"seam distance ${got(0)._3}")
  }

  test("zipfFit recovers slope -1 on an exact power-law vocabulary") {
    import spark.implicits._
    // Token k (rank k) appears floor(1200/k) times: counts 1200, 600,
    // 400, ... — an exact 1/k curve, so the log-log slope ≈ −1.
    val docs = (1 to 40).flatMap(k => Seq.fill(1200 / k)(s"w$k"))
    val df = Seq(docs.mkString(" ")).toDF("text")
    val r = Stats.zipfFit(df, "text").collect().head
    assert(r.getLong(0) === 40L)
    assert(math.abs(r.getDouble(1) - (-1.0)) < 0.05, s"slope ${r.getDouble(1)}")
    assert(r.getDouble(3) > 0.99, s"r2 ${r.getDouble(3)}")
  }

  test("xyzAnalysis bands steady vs spiky demand correctly") {
    import spark.implicits._
    def d(m: Int) = java.sql.Date.valueOf(f"2024-$m%02d-15")
    // Part 1: 10 units every month (cv 0 → X). Part 2: one spike month
    // (cv = sqrt(11) ≈ 3.3 over 12 months → Z).
    val rows = (1 to 12).map(m => (1L, d(m), 10.0)) ++ Seq((2L, d(6), 120.0))
    val got = Stats.xyzAnalysis(rows.toDF("k", "dt", "q"), "k", col("dt"), "q")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === Map("X" -> 1L, "Z" -> 1L), s"got $got")
  }

  test("forecastBaseline computes exact lag-error means") {
    import spark.implicits._
    // Daily counts 1,2,1,2,...: |y−l1| = 1 always, |y−l7| = 1 (odd lag).
    val rows = (0 until 15).flatMap { i =>
      val d = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 6, 1).plusDays(i))
      Seq.fill(if (i % 2 == 0) 1 else 2)(d)
    }
    val r = Stats.forecastBaseline(rows.toDF("d"), col("d")).collect().head
    assert(r.getDouble(0) === 1.0 && r.getDouble(2) === 1.0)
    assert(r.getDouble(3) === 1.0)
  }

  test("markovAttribution credits the gateway channel, not the bystander") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")
    // Every conversion passes through 'gate'; 'noise' appears in
    // journeys but never leads anywhere conversions need it.
    val rows = Seq(
      (1, t(0), 1L, "gate"), (1, t(1), 2L, "buy"),
      (2, t(0), 3L, "gate"), (2, t(1), 4L, "buy"),
      (3, t(0), 5L, "noise"), (3, t(1), 6L, "gate"), (3, t(2), 7L, "buy"),
      (4, t(0), 8L, "noise"))
      .toDF("u", "ts", "eid", "ty")
    val got = graft.ops.Attribution.markovAttribution(rows, "u", "ts", "eid",
        "ty", "buy", Seq("gate", "noise"), iters = 16)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toMap
    assert(got("gate")._1 === 1.0, s"gate must carry all credit: $got")
    assert(got("noise")._1 < 0.5, s"noise overcredited: $got")
    assert(got("gate")._2 > 0.6)
  }

  test("entropyProfile: uniform 4-way is 2 bits, constant is 0 bits") {
    import spark.implicits._
    val df = (0 until 64).map(i => (i % 4, "k")).toDF("four", "const")
    val rows = Stats.entropyProfile(df.toDF(), Seq("four", "const"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val m = rows.map(r => r._1 -> r).toMap
    assert(m("four")._2 === 4L && math.abs(m("four")._3 - 2.0) < 1e-9)
    assert(m("const")._2 === 1L && math.abs(m("const")._3) < 1e-9)
  }

  test("rocAuc: perfect separation is 1, swapped labels 0, ties midrank") {
    import spark.implicits._
    val perfect = Seq((1, 3.0), (1, 4.0), (0, 1.0), (0, 2.0)).toDF("y", "s")
    val p = Stats.rocAuc(perfect, col("y") === 1, "s").collect().head
    assert(p.getLong(0) === 2L && p.getLong(1) === 2L)
    assert(math.abs(p.getDouble(2) - 1.0) < 1e-9)
    assert(math.abs(p.getDouble(3) - 1.0) < 1e-9) // gini = 2·1 − 1

    val inverted = Stats.rocAuc(perfect, col("y") === 0, "s").collect().head
    assert(math.abs(inverted.getDouble(2)) < 1e-9)

    // One positive tied with one negative at 2.0: pairs = (2>1)=1 and
    // (2=2)=½ → AUC = 1.5/2.
    val tied = Seq((1, 2.0), (0, 1.0), (0, 2.0)).toDF("y", "s")
    val t = Stats.rocAuc(tied, col("y") === 1, "s").collect().head
    assert(math.abs(t.getDouble(2) - 0.75) < 1e-9)
  }

  test("bhAdjust: step-up reverse min, clamping, and tie-broken ranks") {
    import spark.implicits._
    // m=5, sorted raws m·p/i = .005, .025, .033̄, .05, .5 — already
    // monotone, so adj = raw; boundary .05 is significant at α=.05
    val flat = Seq(("a", 0.001), ("b", 0.01), ("c", 0.02), ("d", 0.04),
      ("e", 0.5)).toDF("id", "p")
    val got = Stats.bhAdjust(flat, "id", "p")
      .orderBy("rank")
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getBoolean(4)))
    assert(got.map(_._1).toSeq == Seq("a", "b", "c", "d", "e"))
    assert(got.map(_._2).toSeq == Seq(0.005, 0.025, 0.033333, 0.05, 0.5))
    assert(got.map(_._3).toSeq == Seq(true, true, true, true, false))

    // non-monotone raws: m·p/i = .04, .05, .033̄, .9 — the step-up
    // min-from-the-right pulls ranks 1-3 down to .033333
    val bump = Seq(("a", 0.01), ("b", 0.02), ("c", 0.025), ("d", 0.9))
      .toDF("id", "p")
    val adj = Stats.bhAdjust(bump, "id", "p").orderBy("rank")
      .collect().map(_.getDouble(3)).toSeq
    assert(adj == Seq(0.033333, 0.033333, 0.033333, 0.9))

    // p=1 everywhere: raw m·p/i > 1 for every i < m → clamps to 1
    val ones = Seq(("a", 1.0), ("b", 1.0)).toDF("id", "p")
    assert(Stats.bhAdjust(ones, "id", "p").collect()
      .map(_.getDouble(3)).toSeq == Seq(1.0, 1.0))
  }

  test("ksTest: disjoint supports give D=1; identical samples D=0") {
    import spark.implicits._
    val disjoint = (Seq.fill(5)(0).zip(Seq(1.0, 2.0, 3.0, 4.0, 5.0)) ++
      Seq.fill(5)(1).zip(Seq(11.0, 12.0, 13.0, 14.0, 15.0))).toDF("g", "v")
    val d1 = Stats.ksTest(disjoint, col("g") === 1, "v").collect().head
    assert(d1.getLong(0) === 5L && d1.getLong(1) === 5L)
    assert(math.abs(d1.getDouble(2) - 1.0) < 1e-9)

    val same = (Seq.fill(4)(0) ++ Seq.fill(4)(1)).zip(
      Seq(1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0)).toDF("g", "v")
    val d0 = Stats.ksTest(same, col("g") === 1, "v").collect().head
    assert(math.abs(d0.getDouble(2)) < 1e-9)
    assert(math.abs(d0.getDouble(3) - 1.0) < 1e-9) // p capped at 1
  }

  test("calibrationReport: a perfectly calibrated uniform scorer") {
    import spark.implicits._
    // Scores 0..99 normalized to [0,1]; y = 1 iff score >= 50 →
    // bins 0-4 all-negative (frac 0), bins 5-9 all-positive (frac 1).
    val df = (0 until 100).map(i => (i.toDouble, if (i >= 50) 1 else 0))
      .toDF("s", "y")
    val rows = Stats.calibrationReport(df, col("y") === 1, "s", bins = 10)
      .collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val bin = r.getLong(0); val frac = r.getDouble(3)
      assert(r.getLong(1) === 10L)
      assert(frac === (if (bin < 5) 0.0 else 1.0), s"bin $bin frac $frac")
    }
  }

  test("infoGain: the label itself carries H(label); noise carries 0") {
    import spark.implicits._
    val df = (0 until 64).map(i => (i % 2, i % 2, 7)).toDF("y", "copy", "const")
    val rows = Stats.infoGain(df, col("y") === 1,
        Seq(("copy", col("copy")), ("const", col("const"))))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(4))).toMap
    assert(math.abs(rows("copy")._1 - 1.0) < 1e-9) // H(label) = 1 bit
    assert(math.abs(rows("copy")._2 - 1.0) < 1e-9) // IG(copy) = H
    assert(math.abs(rows("const")._2) < 1e-9)      // IG(const) = 0
  }

  test("hhiConcentration: monopoly scores 10000, equal split 10000/n") {
    import spark.implicits._
    val df = Seq(("mono", "a", 100.0), ("duo", "x", 50.0), ("duo", "y", 50.0),
      ("quad", "p", 25.0), ("quad", "q", 25.0), ("quad", "r", 25.0),
      ("quad", "t", 25.0)).toDF("g", "e", "v")
    val m = Stats.hhiConcentration(df, "g", "e", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(m("mono") === ((1L, 10000.0, 1.0)))
    assert(m("duo")._2 === 5000.0 && m("duo")._3 === 1.0)
    assert(m("quad")._2 === 2500.0 && m("quad")._3 === 1.0)
  }

  test("assocRules: confidence is directional, lift symmetric") {
    import spark.implicits._
    // b appears in 4 baskets, a in 2, both-in-2: conf(a→b)=1,
    // conf(b→a)=0.5, lift = (2/4)/((2/4)(4/4)) = 1 both ways.
    val df = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "b"), (4, "b"))
      .toDF("bk", "it")
    val rows = Stats.assocRules(df, "bk", "it", minSupport = 2L, topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(4), r.getDouble(5))).toMap
    assert(rows(("a", "b")) === ((2L, 1.0, 1.0)))
    assert(rows(("b", "a")) === ((2L, 0.5, 1.0)))
  }

  test("bootstrapCI: brackets the true mean, reproducible run-to-run") {
    import spark.implicits._
    // 200 values uniform-ish over [0, 99] by construction: mean 49.5
    val df = (0L until 200L).map(i => (i, (i % 100).toDouble))
      .toDF("id", "v")
    val a = Stats.bootstrapCI(df, "id", "v", reps = 100, alpha = 0.05)
      .head()
    assert(a.getLong(0) === 200L)
    assert(a.getDouble(1) === 49.5)
    val (lo, hi) = (a.getDouble(2), a.getDouble(3))
    assert(lo < 49.5 && 49.5 < hi, s"CI [$lo, $hi] misses the mean")
    // a ±2·SE sanity band: SE ≈ 28.9/√200 ≈ 2.04, so the 95% CI spans
    // roughly 8 — insist it is neither degenerate nor absurdly wide
    assert(hi - lo > 2.0 && hi - lo < 16.0, s"CI width ${hi - lo}")
    // determinism: the md5 draws carry no state — rerun is identical
    val b = Stats.bootstrapCI(df, "id", "v", reps = 100, alpha = 0.05)
      .head()
    assert(a.getDouble(2) === b.getDouble(2) &&
      a.getDouble(3) === b.getDouble(3))
    // different id partitioning (repartition) must not move the interval
    val c = Stats.bootstrapCI(df.repartition(7), "id", "v",
      reps = 100, alpha = 0.05).head()
    assert(a.getDouble(2) === c.getDouble(2) &&
      a.getDouble(3) === c.getDouble(3))
    // replicated-row budget guard: 200 rows × 100 reps = 20000 > 10000
    val boom = intercept[Exception] {
      Stats.bootstrapCI(df, "id", "v", reps = 100, alpha = 0.05,
        maxReplicated = 10000L).head()
    }
    assert(boom.getMessage.contains("replicated rows"))
  }

  test("seasonalIndex: flat series indexes 1.0 on every weekday") {
    import spark.implicits._
    val days = (0 until 28).map(i =>
      java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)))
    val df = days.flatMap(d => Seq.fill(3)(d)).toDF("d")
    val rows = Stats.seasonalIndex(df, col("d")).collect()
    assert(rows.length === 7)
    assert(rows.map(_.getLong(0)).toSeq === (1L to 7L))
    rows.foreach { r =>
      assert(r.getLong(1) === 4L)
      assert(math.abs(r.getDouble(2) - 3.0) < 1e-9)
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
    }
  }

  test("weightedMedian: crossing value of the cumulative weight, per group") {
    import spark.implicits._
    // g=a: values 1(w3), 2(w1), 3(w2); total 6, half 3 → cumw at v=1 is
    // 3 ≥ 3 → median 1. g=b: 10(w1), 20(w1), 30(w5): half 3.5 → v=30.
    val df = Seq(("a", 1.0, 3.0), ("a", 2.0, 1.0), ("a", 3.0, 2.0),
      ("b", 10.0, 1.0), ("b", 20.0, 1.0), ("b", 30.0, 5.0))
      .toDF("g", "v", "w")
    val m = Stats.weightedMedian(df, "g", col("v"), col("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("a") === 1.0 && m("b") === 30.0)
    // equal weights degrade to the lower-median of the values
    val eq = Seq(("c", 1.0, 1.0), ("c", 2.0, 1.0), ("c", 3.0, 1.0),
      ("c", 4.0, 1.0)).toDF("g", "v", "w")
    assert(Stats.weightedMedian(eq, "g", col("v"), col("w"))
      .head().getDouble(1) === 2.0)
  }

  test("stlDecompose: recomposition identity and full-window edge drop") {
    import spark.implicits._
    val days = (0 until 35).flatMap { i =>
      val d = java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i))
      Seq.fill(3 + (i % 7))(d) // pure weekly pattern
    }
    val out = Stats.stlDecompose(days.toDF("d"), col("d"), halfWindow = 3)
      .collect()
    // 35 days minus 3 on each edge
    assert(out.length === 29)
    out.foreach { r =>
      val y = r.getDouble(1); val t = r.getDouble(2)
      val s = r.getDouble(3); val rem = r.getDouble(4)
      assert(math.abs(y - t - s - rem) < 1e-6, s"identity broke at $r")
    }
    // a pure weekly pattern over a flat trend: remainder ≈ 0 everywhere
    assert(out.forall(r => math.abs(r.getDouble(4)) < 1e-6))
    // seasonal indexes sum to ~0 over one week
    val week = out.take(7).map(_.getDouble(3)).sum
    assert(math.abs(week) < 1e-5, s"seasonal not centered: $week")
  }

  test("anovaOneWay matches the textbook two-group case") {
    import spark.implicits._
    // a = {1,2,3}, b = {4,5,6}: SSB = 13.5, SSW = 4,
    // F = 13.5/(4/4) = 13.5, eta² = 13.5/17.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Stats.anovaOneWay(df, "g", "v").head()
    assert(r.getLong(0) === 2L && r.getLong(1) === 6L)
    assert(r.getLong(2) === 1L && r.getLong(3) === 4L)
    assert(r.getDouble(4) === 13.5 && r.getDouble(5) === 4.0)
    assert(r.getDouble(6) === 13.5)
    assert(r.getDouble(7) === 0.771429)
  }

  test("effectSize: d = 3 and Hedges g shrinks it by 1 - 3/(4N-9)") {
    import spark.implicits._
    val df = Seq((0, 1.0), (0, 2.0), (0, 3.0), (1, 4.0), (1, 5.0),
      (1, 6.0)).toDF("t", "v")
    val r = Stats.effectSize(df, col("t") === 1, "v").head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(r.getDouble(2) === 2.0 && r.getDouble(3) === 5.0)
    assert(r.getDouble(4) === 1.0)     // pooled SD
    assert(r.getDouble(5) === 3.0)     // Cohen's d
    assert(r.getDouble(6) === 2.4)     // g = 3·(1 − 3/15)
  }

  test("diffInDiff nets out group baseline and time shock") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // control: 10 → 12 (+2 common shock); treated: 20 → 25
    // → did = (25−20) − (12−10) = 3
    val df = Seq((1L, ts(1), 10.0), (1L, ts(20), 12.0),
      (2L, ts(1), 20.0), (2L, ts(20), 25.0)).toDF("u", "t", "v")
    val r = Stats.diffInDiff(df, col("u") === 2,
      col("t") >= lit("2024-01-16").cast("timestamp"), "v").head()
    assert((r.getDouble(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4)) === ((20.0, 25.0, 10.0, 12.0, 3.0)))
  }

  test("cuped matches the hand-computed adjustment and shrinks variance") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // users 1..4, treated = even; pre x = u, post y = x + 1[treated]
    // + (x − x̄) noise-free trend: x=(1,2,3,4), y=(1,3,3,5)
    // → θ = 1.2, diff_raw = 2, diff_cuped = 0.8, var ratio = 0.1
    val rows = Seq(
      (1L, ts(1), 1.0), (1L, ts(20), 1.0),
      (2L, ts(1), 2.0), (2L, ts(20), 3.0),
      (3L, ts(1), 3.0), (3L, ts(20), 3.0),
      (4L, ts(1), 4.0), (4L, ts(20), 5.0)).toDF("u", "t", "v")
    val r = Stats.cuped(rows, "u", col("u") % 2 === 0,
      col("t") >= lit("2024-01-16").cast("timestamp"), "v").head()
    assert(r.getLong(0) === 4L)
    assert(r.getDouble(1) === 1.2)          // theta
    assert(r.getDouble(2) === 2.0)          // diff_raw
    assert(r.getDouble(3) === 0.8)          // diff_cuped
    assert(r.getDouble(4) === 0.1)          // var_ratio
  }

  test("prCurve: hand-computed precision/recall at each threshold") {
    import spark.implicits._
    // scores 0.9+, 0.8−, 0.7+, 0.6− → thresholds desc:
    // 0.9: tp=1 npred=1 → p=1, r=1/2; 0.8: 1/2, 1/2; 0.7: 2/3, 1;
    // 0.6: 2/4, 1
    val df = Seq((0.9, true), (0.8, false), (0.7, true), (0.6, false))
      .toDF("s", "pos")
    val got = Stats.prCurve(df, col("pos"), "s", decimals = 1)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq === Seq((0.9, 1.0, 0.5), (0.8, 0.5, 0.5),
      (0.7, 0.666667, 1.0), (0.6, 0.5, 1.0)))
  }

  test("robustZscoreByGroup: planted outlier flagged; zero-MAD flags none") {
    import spark.implicits._
    // g=a: 20 values near 10 plus one at 1000 → modified z huge
    // g=b: constant column → MAD 0 → no robust scale, zero flags
    val a = (1 to 20).map(i => ("a", 10.0 + (i % 3))) :+ (("a", 1000.0))
    val b = (1 to 10).map(_ => ("b", 5.0))
    val got = Stats.robustZscoreByGroup((a ++ b).toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(4))).toMap
    assert(got("a")._1 === 21L && got("a")._3 === 1L, s"a: ${got("a")}")
    assert(got("b") === ((10L, 5.0, 0L)), s"b: ${got("b")}")
  }

  test("stlAnomalies: a planted spike day is the only flag") {
    import spark.implicits._
    val days = (0 until 35).flatMap { i =>
      val d = java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i))
      val n = if (i == 17) 60 else 3 + (i % 7) // spike mid-series
      Seq.fill(n)(d)
    }
    val out = Stats.stlAnomalies(days.toDF("d"), col("d"), halfWindow = 3)
      .collect()
    // the spike day must be flagged; the moving average smears it into
    // neighbors' trend, so a few adjacent days may flag too — but the
    // spike itself must be the LARGEST |sigma|
    assert(out.nonEmpty)
    val top = out.maxBy(r => math.abs(r.getDouble(5)))
    assert(top.getDate(0).toString === "2024-01-18", s"top flag $top")
    assert(top.getDouble(5) > 0)
  }

  test("saxSymbols: symbols follow the Gaussian quartile breakpoints") {
    import spark.implicits._
    // 4 frames of 5 days with counts 1,1,1,1 / 3,3,3,3 / 5,... / 7,...
    // — frame means are strictly increasing through all four bands.
    val days = (0 until 20).flatMap { i =>
      val d = java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i))
      Seq.fill(1 + 2 * (i / 5))(d)
    }
    val out = Stats.saxSymbols(days.toDF("d"), col("d"), frameLen = 5)
      .collect()
    assert(out.length === 4)
    assert(out.map(_.getString(3)).toSeq === Seq("a", "b", "c", "d"))
    assert(out.forall(_.getLong(1) === 5L))
    // PAA means of a z-normalized series average to ~0 overall
    val mean = out.map(_.getDouble(2)).sum / 4
    assert(math.abs(mean) < 1e-5)
  }

  test("runsTest counts sign runs and drops zero deltas") {
    import spark.implicits._
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 3, 1).plusDays(i))
    // counts 1,2,1,2,1 → deltas +,−,+,− → 4 runs of n_up=2/n_down=2:
    // μ = 2·2·2/4+1 = 3, σ² = 2/3, z = 1/√(2/3)
    val alt = (0 until 5).flatMap(i =>
      Seq.fill(if (i % 2 == 0) 1 else 2)(day(i)))
    val r = Stats.runsTest(alt.toDF("d"), col("d")).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 2 && r.getLong(2) == 4)
    assert(math.abs(r.getDouble(3) - 3.0) < 1e-9)
    assert(math.abs(r.getDouble(4) - 1.0 / math.sqrt(2.0 / 3.0)) < 1e-6)
    // counts 1,2,2,3,1 → deltas +,0,+,− → the zero delta is DROPPED:
    // signs +,+,− → n_up=2, n_down=1, runs=2
    val withZero = Seq(1, 2, 2, 3, 1).zipWithIndex.flatMap {
      case (c, i) => Seq.fill(c)(day(i)) }
    val z = Stats.runsTest(withZero.toDF("d"), col("d")).collect().head
    assert(z.getLong(0) == 2 && z.getLong(1) == 1 && z.getLong(2) == 2)
    // expected_runs is 6-dp-rounded output: 7/3 → 2.333333
    assert(math.abs(z.getDouble(3) - 7.0 / 3.0) < 1e-6)
  }

  test("brownForsythe matches the hand-computed Levene W on medians") {
    import spark.implicits._
    // g1 = (0,2,4): med 2, z = (2,0,2), z̄₁ = 4/3; g2 = (0,10): med 5,
    // z = (5,5), z̄₂ = 5. z̄ = 2.8, SSB = 16.13̄, SSW = 8/3
    // → W = (3/1)·(16.13̄ / 2.6̄) = 18.15
    val df = Seq(("a", 0.0), ("a", 2.0), ("a", 4.0), ("b", 0.0), ("b", 10.0))
      .toDF("g", "v")
    val r = Stats.brownForsythe(df, "g", "v").collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 5)
    assert(math.abs(r.getDouble(2) - 18.15) < 1e-6)
  }

  test("theilsU: determined column scores 1, independent columns 0") {
    import spark.implicits._
    // b determines a exactly (b=1 ↔ a=x, b=2 ↔ a=y) → U(a|b) = 1
    val det = Seq(("x", 1), ("x", 1), ("y", 2)).toDF("a", "b")
    val r = Stats.theilsU(det, "a", "b").collect().head
    assert(r.getLong(0) == 3)
    val ha = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(r.getDouble(1) - ha) < 1e-6)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
    // independent uniform columns → both directions 0
    val ind = Seq(("x", 1), ("x", 2), ("y", 1), ("y", 2)).toDF("a", "b")
    val i = Stats.theilsU(ind, "a", "b").collect().head
    assert(math.abs(i.getDouble(3)) < 1e-9 && math.abs(i.getDouble(4)) < 1e-9)
  }

  test("cohensKappa: hand-computed chance-corrected agreement") {
    import spark.implicits._
    // (A,A),(A,A),(B,B),(A,B): p_o = 3/4, p_e = 3/4·2/4 + 1/4·2/4 = 1/2
    // → κ = (0.75 − 0.5)/0.5 = 0.5
    val df = Seq(("A", "A"), ("A", "A"), ("B", "B"), ("A", "B")).toDF("r1", "r2")
    val r = Stats.cohensKappa(df, col("r1"), col("r2")).collect().head
    assert(r.getLong(0) == 4)
    assert(r.getDouble(1) == 0.75 && r.getDouble(2) == 0.5)
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-9)
    // both raters constant and equal → p_e = 1 pins κ to NULL
    val const = Seq(("A", "A"), ("A", "A")).toDF("r1", "r2")
    assert(Stats.cohensKappa(const, col("r1"), col("r2"))
      .collect().head.isNullAt(3))
  }

  test("gumbelFit: method-of-moments on two known block maxima") {
    import spark.implicits._
    def day(m: Int, i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, m, 1 + i))
    // month 1 daily counts (1,2) → max 2; month 2 (4,1) → max 4
    val rows = Seq.fill(1)(day(1, 0)) ++ Seq.fill(2)(day(1, 1)) ++
      Seq.fill(4)(day(2, 0)) ++ Seq.fill(1)(day(2, 1))
    val r = Stats.gumbelFit(rows.toDF("d"), col("d")).collect().head
    val sd = math.sqrt(2.0)
    val beta = sd * math.sqrt(6.0) / math.Pi
    val mu = 3.0 - 0.5772156649015329 * beta
    assert(r.getLong(0) == 2)
    assert(math.abs(r.getDouble(1) - 3.0) < 1e-9)
    assert(math.abs(r.getDouble(2) - beta) < 1e-6)
    assert(math.abs(r.getDouble(3) - mu) < 1e-6)
    assert(math.abs(r.getDouble(4) -
      (mu - beta * math.log(-math.log(0.9)))) < 1e-6)
  }

  test("methodAgreement: identity = CCC 1, constant offset penalized") {
    import spark.implicits._
    val xs = Seq(1.0, 2.0, 3.0, 4.0)
    val same = xs.map(v => (v, v)).toDF("x", "y")
    val s = Stats.methodAgreement(same, col("x"), col("y")).collect().head
    assert(s.getLong(0) == 4 && s.getDouble(1) == 1.0 && s.getDouble(2) == 0.0)
    assert(s.getDouble(3) == 0.0 && s.getDouble(4) == 0.0)
    // y = x + 5: Pearson would say 1; CCC = 2v/(2v+25) with POPULATION
    // (1/n) variance per Lin (1989), bias −5, LoA ±0
    val shift = xs.map(v => (v, v + 5.0)).toDF("x", "y")
    val r = Stats.methodAgreement(shift, col("x"), col("y")).collect().head
    val v = xs.map(a => (a - 2.5) * (a - 2.5)).sum / 4
    assert(math.abs(r.getDouble(1) - 2 * v / (2 * v + 25)) < 1e-6)
    assert(r.getDouble(2) == -5.0 && r.getDouble(3) == -5.0 &&
      r.getDouble(4) == -5.0)
  }

  test("logRankTest: identical curves chi2 0, separated curves chi2 3") {
    import spark.implicits._
    val same = Seq((1L, true, 0), (2L, true, 0), (1L, true, 1), (2L, true, 1))
      .toDF("dur", "observed", "g")
    val s = Stats.logRankTest(same, "dur", "observed", col("g") === 1)
      .collect().head
    assert(s.getLong(0) == 2 && s.getDouble(1) == 2.0 && s.getDouble(2) == 0.0)
    // group a converts at t=1, group b at t=10: O_a = 2, E_a = 1, V = 1/3
    val sep = Seq((1L, true, 0), (1L, true, 0), (10L, true, 1), (10L, true, 1))
      .toDF("dur", "observed", "g")
    val r = Stats.logRankTest(sep, "dur", "observed", col("g") === 1)
      .collect().head
    assert(r.getLong(0) == 2 && r.getDouble(1) == 1.0)
    assert(math.abs(r.getDouble(2) - 3.0) < 1e-6)
  }

  test("ratioMetricCI: constant per-unit ratio collapses the interval") {
    import spark.implicits._
    // every unit has y = 2x exactly → ratio 2, zero variance → se 0
    val df = (1 to 10).flatMap(u => (1 to u).map(_ => (u.toLong, 2.0, 1.0)))
      .toDF("u", "y", "x")
    val r = Stats.ratioMetricCI(df, col("u"), col("y"), col("x"))
      .collect().head
    assert(r.getLong(0) == 10)
    assert(r.getDouble(1) == 2.0 && r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 2.0)
  }

  test("ebShrinkage pulls small samples toward the prior") {
    import spark.implicits._
    // big keys with stable ~50% rates fit the prior; a tiny 2/2 key
    // must NOT outrank a big 90/100 key after shrinkage
    val rows =
      (1 to 10).flatMap(k => (1 to 100).map(i => (k.toLong, i <= 40 + k))) ++
      (1 to 2).map(i => (99L, true)) ++
      (1 to 100).map(i => (50L, i <= 90))
    val got = Stats.ebShrinkage(rows.toDF("k", "s"), col("k"), col("s"),
      minN = 5, topN = 5).collect()
    assert(got.head.getLong(0) == 50L)
    val tiny = got.find(_.getLong(0) == 99L)
    // the 2/2 key's shrunk rate sits far below its raw 1.0
    tiny.foreach(t => assert(t.getDouble(3) < 0.8))
  }

  test("hurstExponent: trend reads persistent, alternation reads anti") {
    import spark.implicits._
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2023, 1, 1).plusDays(i))
    // strictly increasing counts → cumulative deviations grow with the
    // block → H near 1
    val trend = (0 until 70).flatMap(i => Seq.fill(i + 1)(day(i)))
    val t = Stats.hurstExponent(trend.toDF("d"), col("d")).collect().head
    assert(t.getLong(0) == 4)
    assert(t.getDouble(1) > 0.85)
    // alternating 1,2,1,2 → bounded range at every scale → H near 0
    val alt = (0 until 70).flatMap(i => Seq.fill(1 + i % 2)(day(i)))
    val a = Stats.hurstExponent(alt.toDF("d"), col("d")).collect().head
    assert(a.getDouble(1) < 0.2)
  }

  test("mantelHaenszel: homogeneous strata pool to the common OR") {
    import spark.implicits._
    // s1 cells (2,1,1,2) and s2 cells (4,2,2,4): both OR 4 → MH 4, crude 4
    def cell(s: Int, e: Int, y: Int, n: Int) = Seq.fill(n)((s, e, y))
    val rows = cell(1, 1, 1, 2) ++ cell(1, 1, 0, 1) ++ cell(1, 0, 1, 1) ++
      cell(1, 0, 0, 2) ++ cell(2, 1, 1, 4) ++ cell(2, 1, 0, 2) ++
      cell(2, 0, 1, 2) ++ cell(2, 0, 0, 4)
    val r = Stats.mantelHaenszel(rows.toDF("s", "e", "y"),
      col("e") === 1, col("y") === 1, col("s")).collect().head
    assert(r.getLong(0) == 2)
    assert(r.getDouble(1) == 4.0 && r.getDouble(2) == 4.0)
  }

  test("theilIndex: equal values within groups put all inequality between") {
    import spark.implicits._
    val df = Seq((1, 1.0), (1, 1.0), (2, 2.0), (2, 2.0)).toDF("g", "x")
    val r = Stats.theilIndex(df, col("g"), col("x")).collect().head
    val total = 2 * (1.0 / 6) * math.log(1.0 / 1.5) +
      2 * (2.0 / 6) * math.log(2.0 / 1.5)
    assert(r.getLong(0) == 4 && r.getLong(1) == 2)
    assert(math.abs(r.getDouble(2) - total) < 1e-6)
    assert(math.abs(r.getDouble(3) - total) < 1e-6)
    assert(r.getDouble(4) == 0.0)
  }

  test("overlapCoefficient: identical slices 1, disjoint slices 0") {
    import spark.implicits._
    val same = ((1 to 10).map(v => (0, v.toDouble)) ++
      (1 to 10).map(v => (1, v.toDouble))).toDF("g", "v")
    val s = Stats.overlapCoefficient(same, col("g") === 1, "v").collect().head
    assert(s.getLong(0) == 10 && s.getLong(1) == 10)
    assert(s.getDouble(3) == 1.0)
    val disj = ((0 to 9).map(v => (0, v.toDouble)) ++
      (100 to 109).map(v => (1, v.toDouble))).toDF("g", "v")
    val d = Stats.overlapCoefficient(disj, col("g") === 1, "v").collect().head
    assert(d.getDouble(3) == 0.0)
  }

  test("stlStrength: pure weekly pattern maxes seasonal, flat trend pins NULL") {
    import spark.implicits._
    // counts = isodow: perfectly weekly, trend exactly constant after
    // trimming → Var(T+R) = 0 (trend NULL), seasonal strength = 1
    val rows = (0 until 35).flatMap { i =>
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i)
      Seq.fill(d.getDayOfWeek.getValue)(java.sql.Date.valueOf(d))
    }
    val r = Stats.stlStrength(rows.toDF("d"), col("d")).collect().head
    assert(r.isNullAt(1))
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-6)
  }

  test("binAdvisor: FD width 3.5 and Sturges 4 on 1..8") {
    import spark.implicits._
    // q1 = 2.75, q3 = 6.25, IQR = 3.5; 8^(-1/3) = 1/2 → width 3.5,
    // fd_bins = ceil(7/3.5) = 2; sturges = ceil(3) + 1 = 4
    val df = (1 to 8).map(_.toDouble).toDF("v")
    val r = Stats.binAdvisor(df, "v").collect().head
    assert(r.getLong(0) == 8 && r.getDouble(1) == 1.0 && r.getDouble(2) == 8.0)
    assert(r.getDouble(3) == 3.5 && r.getDouble(4) == 3.5)
    assert(r.getLong(5) == 2 && r.getLong(6) == 4)
    // constant column: zero IQR pins the FD outputs to NULL
    val const = Seq.fill(5)(7.0).toDF("v")
    val c = Stats.binAdvisor(const, "v").collect().head
    assert(c.isNullAt(4) && c.isNullAt(5))
  }

  test("clusteringAgreement: identical = 1/1, crossing pairs go negative") {
    import spark.implicits._
    val a = Seq((1L, 10L), (2L, 10L), (3L, 30L), (4L, 30L)).toDF("id", "label")
    val same = Stats.clusteringAgreement(a, a).collect().head
    assert(same.getLong(0) == 4 && same.getLong(1) == 2 && same.getLong(2) == 2)
    assert(same.getDouble(3) == 1.0 && same.getDouble(4) == 1.0)
    // b cuts across a: {1,3} / {2,4} → MI = 0 (NMI 0), ARI = −0.5
    val b = Seq((1L, 10L), (3L, 10L), (2L, 30L), (4L, 30L)).toDF("id", "label")
    val x = Stats.clusteringAgreement(a, b).collect().head
    assert(math.abs(x.getDouble(3)) < 1e-9)
    assert(math.abs(x.getDouble(4) - (-0.5)) < 1e-6)
    // single-cluster side: H = 0 pins NMI to NULL
    val one = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)).toDF("id", "label")
    assert(Stats.clusteringAgreement(a, one).collect().head.isNullAt(3))
  }

  test("ivWald: ITT rescaled by the first stage") {
    import spark.implicits._
    // z=1: mean y 10, t rate 1/2; z=0: mean y 8, t rate 0
    // → itt = 2, first = 0.5, LATE = 4
    val df = Seq((1, 1, 12.0), (1, 0, 8.0), (0, 0, 8.0), (0, 0, 8.0))
      .toDF("z", "t", "y")
    val r = Stats.ivWald(df, col("z") === 1, col("t") === 1, col("y"))
      .collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 0.5 &&
      r.getDouble(4) == 4.0)
  }

  test("bestSplit finds the level shift") {
    import spark.implicits._
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 6, 1).plusDays(i))
    // daily counts 1,1,1,5,5 → split after day 3: gain = 3+50−33.8 = 19.2
    val rows = (0 until 3).map(i => (day(i), 1)) ++ Seq((day(3), 5), (day(4), 5))
    val df = rows.flatMap { case (d, c) => Seq.fill(c)(d) }.toDF("d")
    val r = Stats.bestSplit(df, col("d")).collect().head
    assert(r.getDate(0) == day(2) && r.getLong(1) == 3 && r.getLong(2) == 2)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 5.0)
    assert(math.abs(r.getDouble(5) - 19.2) < 1e-6)
  }

  test("mdeReport: pooled sd and MDE from hand moments") {
    import spark.implicits._
    // arm a = (0,2): mean 1, SS 2; arm b = (10,14): mean 12, SS 8
    // → s_p = √((2+8)/2) = √5, MDE = 2.80158...·√5·√(1/2+1/2)
    val df = Seq((0, 0.0), (0, 2.0), (1, 10.0), (1, 14.0)).toDF("g", "v")
    val r = Stats.mdeReport(df, col("g") === 1, "v").collect().head
    val z = 1.9599639845400545 + 0.8416212335729143
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(math.abs(r.getDouble(2) - math.sqrt(5.0)) < 1e-6)
    assert(math.abs(r.getDouble(3) - z * math.sqrt(5.0)) < 1e-6)
    assert(math.abs(r.getDouble(4) - z * math.sqrt(5.0)) < 1e-6)
  }

  test("kruskalWallis: textbook three-group ranks") {
    import spark.implicits._
    // groups (1,2), (3,4), (5,6): ranks 1..6, R = (3, 7, 11), no ties
    // → H = 12/(6·7)·(9/2 + 49/2 + 121/2) − 3·7 = 179/7 − 21 ≈ 4.5714
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 5.0), ("c", 6.0)).toDF("g", "v")
    val r = Stats.kruskalWallis(df, col("g"), "v").collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 6)
    assert(math.abs(r.getDouble(2) - (179.0 / 7 - 21.0)) < 1e-6)
    // no ties → the corrected statistic equals H
    assert(r.getDouble(2) == r.getDouble(3))
    // identical single value everywhere → C = 0 pins both to NULL
    val const = Seq(("a", 5.0), ("b", 5.0)).toDF("g", "v")
    val k = Stats.kruskalWallis(const, col("g"), "v").collect().head
    assert(k.isNullAt(2) && k.isNullAt(3))
  }

  test("friedmanTest: hand-ranked blocks, incomplete block dropped") {
    import spark.implicits._
    // 4 complete blocks over treatments a<b<c except block 4 swaps b/c;
    // mean ranks (1, 2.25, 2.75) → Q = 4·[1+.0625+.5625] = 6.5,
    // W = 6.5/(4·2) = .8125. Block 5 misses treatment c → dropped.
    val rows = (1 to 4).flatMap { bl =>
      val (rb, rc) = if (bl == 4) (3.0, 2.0) else (2.0, 3.0)
      Seq((bl, "a", 1.0), (bl, "b", rb), (bl, "c", rc))
    } ++ Seq((5, "a", 9.0), (5, "b", 9.0))
    val df = rows.toDF("blk", "t", "v")
    val r = Stats.friedmanTest(df, col("blk"), col("t"), "v").collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 3)
    assert(math.abs(r.getDouble(2) - 6.5) < 1e-9)
    assert(math.abs(r.getDouble(3) - 0.8125) < 1e-9)
  }

  test("friedmanTest: within-block ties get average ranks + scipy tie divisor") {
    import spark.implicits._
    // b1 (5,5,9) → ranks (1.5, 1.5, 3); b2 (1,2,3) → (1,2,3);
    // mean ranks (1.25, 1.75, 3) → Q_raw = 2·[.5625+.0625+1] = 3.25;
    // tie mass T = 2³−2 = 6, divisor 1 − 6/(2·3·8) = 0.875 →
    // Q = 3.25/0.875 (= scipy.stats.friedmanchisquare's 3.7142857…)
    val df = Seq((1, "a", 5.0), (1, "b", 5.0), (1, "c", 9.0),
      (2, "a", 1.0), (2, "b", 2.0), (2, "c", 3.0)).toDF("blk", "t", "v")
    val r = Stats.friedmanTest(df, col("blk"), col("t"), "v").collect().head
    assert(math.abs(r.getDouble(2) - 3.25 / 0.875) < 1e-6)
    // every cell tied in every block → divisor 0 → NULL Q and W
    val allTied = Seq((1, "a", 2.0), (1, "b", 2.0), (1, "c", 2.0),
      (2, "a", 7.0), (2, "b", 7.0), (2, "c", 7.0)).toDF("blk", "t", "v")
    val r2 = Stats.friedmanTest(allTied, col("blk"), col("t"), "v")
      .collect().head
    assert(r2.isNullAt(2) && r2.isNullAt(3))
  }

  test("grubbsTest: planted outlier scores G = |x-mean|/s; degenerates NULL") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0),
      ("b", 1.0), ("b", 2.0),
      ("c", 5.0), ("c", 5.0), ("c", 5.0)).toDF("g", "v")
    val got = Stats.grubbsTest(df, col("g"), "v").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getDouble(5) == 100.0)                       // suspect value
    assert(math.abs(a.getDouble(4) - 78.0 / math.sqrt(1902.5)) < 1e-6)
    assert(got("b").isNullAt(4))                          // n < 3
    assert(got("c").isNullAt(4))                          // sd = 0
  }

  test("sprt: crossings land at the hand-computed step, continue stays open") {
    import spark.implicits._
    // p0=.2 vs p1=.8: each success adds ln 4, each failure ln .25;
    // boundaries +/- ln 19 ~ 2.944. SSS crosses up at n=3 (2.77 at n=2),
    // FFF crosses down at n=3, SF-alternation never crosses.
    def ev(arm: String, bits: Seq[Int]) = bits.zipWithIndex.map { case (b, i) =>
      (arm, f"2024-01-01 00:${i}%02d:00", i.toLong, b == 1)
    }
    val df = (ev("a", Seq(1, 1, 1, 0, 0)) ++ ev("b", Seq(0, 0, 0)) ++
      ev("c", Seq(1, 0, 1, 0)))
      .toDF("arm", "ts", "tie", "succ")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = Stats.sprt(df, col("arm"), "ts", "tie", col("succ"),
        p0 = 0.2, p1 = 0.8)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getLong(4) == 3L && got("a").getString(6) == "reject_h0")
    assert(math.abs(got("a").getDouble(3) - math.log(4.0)) < 1e-6)
    assert(got("b").getLong(4) == 3L && got("b").getString(6) == "accept_h0")
    assert(got("c").isNullAt(4) && got("c").getString(6) == "continue")
  }

  test("psmAtt: caliper matching removes the composition bias the naive diff keeps") {
    import spark.implicits._
    // three covariate levels with rising treatment share (.25/.5/.75) →
    // three well-separated propensity values; outcome = level + 2 for
    // treated, level for control, so any within-level match yields diff
    // exactly 2 while the naive contrast is inflated to 16/6 by the
    // treated mass sitting at high levels. x2 = x² is level-constant
    // (within-level Δp stays 0) yet linearly independent of (1, x), so
    // the Hessian is non-singular.
    val rows = Seq(
      (1L, true, 2.0, 0.0), (2L, false, 0.0, 0.0), (3L, false, 0.0, 0.0),
      (4L, false, 0.0, 0.0),
      (5L, true, 3.0, 1.0), (6L, true, 3.0, 1.0), (7L, false, 1.0, 1.0),
      (8L, false, 1.0, 1.0),
      (9L, true, 4.0, 2.0), (10L, true, 4.0, 2.0), (11L, true, 4.0, 2.0),
      (12L, false, 2.0, 2.0))
    val df = rows.toDF("id", "tr", "y", "x")
      .withColumn("x2", col("x") * col("x"))
    val r = Stats.psmAtt(df, col("id"), col("tr"), col("y"),
      col("x"), col("x2"), caliper = 0.05).collect().head
    assert(r.getLong(0) == 6 && r.getLong(1) == 6 && r.getLong(2) == 6)
    assert(math.abs(r.getDouble(3) - 2.0) < 1e-9)           // matched ATT
    assert(math.abs(r.getDouble(4) - 16.0 / 6) < 1e-6)      // naive diff
  }

  test("stratifiedATE: confounded naive diff, zero adjusted effect") {
    import spark.implicits._
    // stratum A: treated 10/control 10 (no effect inside), stratum B:
    // treated 20/control 20; treatment concentrated in B → naive diff
    // > 0 purely from composition, stratified ATE = 0
    val rows =
      Seq.fill(1)((true, 10.0, "A")) ++ Seq.fill(9)((false, 10.0, "A")) ++
      Seq.fill(9)((true, 20.0, "B")) ++ Seq.fill(1)((false, 20.0, "B"))
    val r = Stats.stratifiedATE(rows.toDF("tr", "y", "s"),
      col("tr"), col("y"), col("s")).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 20)
    assert(r.getDouble(2) == 8.0 && r.getDouble(3) == 0.0)
    // a stratum with an empty arm is dropped (positivity)
    val part = rows ++ Seq.fill(5)((true, 999.0, "C"))
    val p = Stats.stratifiedATE(part.toDF("tr", "y", "s"),
      col("tr"), col("y"), col("s")).collect().head
    assert(p.getLong(0) == 2 && p.getLong(1) == 20)
  }

  test("permutationTest: planted separation is significant, noise is not") {
    import spark.implicits._
    // two clearly separated groups: no permutation should beat the
    // observed gap except (rarely) by hash luck → p near 1/(reps+1)
    val sep = ((1 to 10).map(i => (i.toLong, 0, 0.0)) ++
      (11 to 20).map(i => (i.toLong, 1, 100.0 + i))).toDF("id", "g", "v")
    val r = Stats.permutationTest(sep, "id", col("g") === 1, "v", reps = 99)
      .collect().head
    assert(r.getLong(0) == 10 && r.getLong(1) == 10 && r.getLong(3) == 99)
    assert(r.getDouble(2) > 100.0)
    assert(r.getDouble(4) <= 0.05)
    // identical constant groups: every permutation ties the observed 0
    // diff → p = 1 exactly
    val flat = (1 to 20).map(i => (i.toLong, i % 2, 5.0)).toDF("id", "g", "v")
    val f = Stats.permutationTest(flat, "id", col("g") === 1, "v", reps = 99)
      .collect().head
    assert(f.getDouble(2) == 0.0 && f.getDouble(4) == 1.0)
    // replicated-row budget guard fires loudly BEFORE the ×reps explode:
    // 20 rows × 99 reps = 1980 > maxReplicated 1000
    val boom = intercept[Exception] {
      Stats.permutationTest(flat, "id", col("g") === 1, "v", reps = 99,
        maxReplicated = 1000L).collect()
    }
    assert(boom.getMessage.contains("replicated rows"))
  }

  test("hbosTopK ranks the jointly-rare row first") {
    import spark.implicits._
    // 40 inliers clustered at (1, 10) plus one far point (1000, -50):
    // the outlier is alone in both of its bins
    val rows = (1L to 40L).map(i => (i, 1.0 + (i % 4) * 0.1, 10.0 + (i % 5))) :+
      (99L, 1000.0, -50.0)
    val got = Stats.hbosTopK(rows.toDF("id", "a", "b"), col("id"),
      Seq(("a", col("a")), ("b", col("b"))), bins = 10, topK = 3)
      .collect()
    assert(got.head.getLong(0) == 99L)
    assert(got.head.getDouble(1) > got(1).getDouble(1))
  }

  test("mcnemarTest reads only the discordant cells") {
    import spark.implicits._
    // u1: A only, u2/u5/u6: B only, u3: both, u4: neither
    // → n00=1, n01=3, n10=1, n11=1, χ² = (|3−1|−1)²/4 = 0.25
    val df = Seq((1L, "c"), (2L, "p"), (3L, "c"), (3L, "p"), (4L, "v"),
      (5L, "p"), (6L, "p")).toDF("u", "t")
    val r = Stats.mcnemarTest(df, "u", col("t") === "c", col("t") === "p")
      .collect().head
    assert(r.getLong(0) == 1 && r.getLong(1) == 3 &&
      r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(math.abs(r.getDouble(4) - 0.25) < 1e-9)
    // perfectly concordant table pins χ² to NULL, not an error
    val conc = Seq((1L, "c"), (1L, "p"), (2L, "v")).toDF("u", "t")
    val c = Stats.mcnemarTest(conc, "u", col("t") === "c", col("t") === "p")
      .collect().head
    assert(c.isNullAt(4))
  }

  test("logisticFit2 matches an independent Newton replay and separates") {
    import spark.implicits._
    // y flips with x1: x1 > 0 → mostly 1, x1 < 0 → mostly 0; x2 is noise
    val rows = (0 until 40).map { i =>
      val x1 = if (i < 20) -1.0 + 0.02 * i else 0.6 + 0.02 * (i - 20)
      val y = if (i < 20) (if (i % 7 == 0) 1.0 else 0.0)
              else (if (i % 9 == 0) 0.0 else 1.0)
      (y, x1, 0.1 * (i % 5))
    }
    val df = rows.toDF("y", "x1", "x2")
    val got = Stats.logisticFit2(df, col("y"), col("x1"), col("x2"), iters = 3)
      .collect().head
    // independent replay of the exact round-13 pipeline: portable
    // floor-ladder pins and exact integer (hi, lo) pair sums (BigInt
    // stands in for the op's DECIMAL(38,0)), Cramer updates
    var (b0, b1, b2) = (0.0, 0.0, 0.0)
    def r9(v: Double) = { // PortableMath.pin9's floor-ladder
      val hi = math.floor(v)
      hi + math.floor((v - hi) * 1e9 + 0.5) / 1e9
    }
    def pairSum(vs: Seq[Double]): Double = {
      val (h, l) = vs.foldLeft((BigInt(0), BigInt(0))) { case ((h, l), v) =>
        val hi = math.floor(v)
        (h + BigInt(hi.toLong),
          l + BigInt(math.floor((v - hi) * 1e9 + 0.5).toLong))
      }
      h.toDouble + l.toDouble / 1e9
    }
    for (_ <- 1 to 3) {
      val terms = rows.map { case (y, x1, x2) =>
        // pin9'd sigmoid output (logisticP's cross-libm stance)
        val p = r9(1.0 / (1.0 +
          graft.functions.PortableMathKernel.pexp(-(b0 + b1 * x1 + b2 * x2))))
        val w = p * (1.0 - p); val rr = y - p
        (rr, rr * x1, rr * x2, w, w * x1, w * x2, w * x1 * x1,
          w * x1 * x2, w * x2 * x2)
      }
      val g0 = pairSum(terms.map(_._1)); val g1 = pairSum(terms.map(_._2))
      val g2 = pairSum(terms.map(_._3))
      val h00 = pairSum(terms.map(_._4)); val h01 = pairSum(terms.map(_._5))
      val h02 = pairSum(terms.map(_._6)); val h11 = pairSum(terms.map(_._7))
      val h12 = pairSum(terms.map(_._8)); val h22 = pairSum(terms.map(_._9))
      val det = h00 * (h11 * h22 - h12 * h12) - h01 * (h01 * h22 - h12 * h02) +
        h02 * (h01 * h12 - h11 * h02)
      val d0 = g0 * (h11 * h22 - h12 * h12) - h01 * (g1 * h22 - h12 * g2) +
        h02 * (g1 * h12 - h11 * g2)
      val d1 = h00 * (g1 * h22 - h12 * g2) - g0 * (h01 * h22 - h12 * h02) +
        h02 * (h01 * g2 - g1 * h02)
      val d2 = h00 * (h11 * g2 - g1 * h12) - h01 * (h01 * g2 - g1 * h02) +
        g0 * (h01 * h12 - h11 * h02)
      b0 = r9(b0 + d0 / det); b1 = r9(b1 + d1 / det); b2 = r9(b2 + d2 / det)
    }
    // the replay IS the op's arithmetic (pin9 + pair sums), so β
    // matches to the pin6 readout exactly; keep a hair of slack for
    // the getDouble(.)-vs-b comparison being pin6(β) vs raw β
    assert(math.abs(got.getDouble(1) - b0) < 1e-6)
    assert(math.abs(got.getDouble(2) - b1) < 1e-6)
    assert(math.abs(got.getDouble(3) - b2) < 1e-6)
    // the separating feature earns a strongly positive coefficient and
    // the fit beats chance on its own training set
    assert(got.getDouble(2) > 1.0 || b1 > 1.0)
    assert(got.getDouble(5) > 0.7)
    assert(got.getDouble(4) > 0.0 && got.getDouble(4) < 0.693)
    val boom = intercept[IllegalArgumentException] {
      Stats.logisticFit2(df, col("y"), col("x1"), col("x2"), iters = 0)
    }
    assert(boom.getMessage.contains("bad iters"))
    // the filtering step: scores are per-row, in (0,1), and monotone in
    // the separating feature (b1 > 0 ⇒ larger x1 ⇒ larger score at
    // fixed x2 — compare rows 0 and 39, both with x2 = 0)
    val ids = rows.zipWithIndex.map { case ((y, x1, x2), i) =>
      (i.toLong, y, x1, x2) }.toDF("id", "y", "x1", "x2")
    val sc = Stats.logisticScore(ids, col("id"), col("y"), col("x1"),
        col("x2"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sc.size == 40 && sc.values.forall(v => v > 0.0 && v < 1.0))
    assert(sc(39L) > sc(0L))
    // score equals σ(β·x) of the replayed fit at the shared rounding
    val s0 = r9(1.0 / (1.0 +
      graft.functions.PortableMathKernel.pexp(-(b0 + b1 * -1.0 + b2 * 0.0))))
    assert(math.abs(sc(0L) - s0) < 1e-5)
  }

  test("mannKendall: strictly rising series, tie-corrected variance") {
    import spark.implicits._
    // day i has i rows -> counts 1,2,3,4: all 6 pairs concordant, S = 6;
    // no count ties -> var = 4*3*13/18 = 26/3; z = 5/sqrt(26/3)
    val rows = for { d <- 1 to 4; _ <- 1 to d } yield s"2024-01-0$d"
    val df = rows.toDF("ds").select(to_date(col("ds")).alias("d"))
    val r = Stats.mannKendall(df, col("d")).collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 6)
    assert(math.abs(r.getDouble(2) - 26.0 / 3) < 1e-6)
    assert(math.abs(r.getDouble(3) - 5.0 / math.sqrt(26.0 / 3)) < 1e-6)
    // two equal-count days: all pairs tied -> var 0 -> z NULL
    val flat = Seq("2024-02-01", "2024-02-02").toDF("ds")
      .select(to_date(col("ds")).alias("d"))
    val f = Stats.mannKendall(flat, col("d")).collect().head
    assert(f.getLong(1) == 0 && f.isNullAt(3))
  }

  test("jarqueBera: symmetric 1..5 has zero skew, hand-computed kurtosis") {
    import spark.implicits._
    // mean 3, m2 = 2, m3 = 0, m4 = 6.8 -> skew 0, kurt 1.7,
    // JB = 5/6 * (0 + 1.69/4) = 0.3520833...
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("g", _)) ++
      Seq(("h", 1.0), ("h", 2.0), ("h", 3.0))).toDF("grp", "v")
    val got = Stats.jarqueBera(df, col("grp"), "v").collect()
      .map(r => r.getString(0) -> r).toMap
    val g = got("g")
    assert(g.getLong(1) == 5 && g.getDouble(2) == 0.0)
    assert(math.abs(g.getDouble(3) - 1.7) < 1e-9)
    assert(math.abs(g.getDouble(4) - 5.0 / 6 * (1.69 / 4)) < 1e-6)
    assert(got("h").isNullAt(4)) // n < 4 -> undefined
  }

  test("cochranQ: textbook 4x3 table gives Q = 14/3") {
    import spark.implicits._
    // C = (3,4,1), N = 8, sumC2 = 26; R = (2,2,1,3), sumR2 = 18;
    // Q = 2*(3*26 - 64)/(3*8 - 18) = 28/6
    val df = Seq(
      (1, "a", 1), (1, "b", 1), (1, "c", 0),
      (2, "a", 1), (2, "b", 1), (2, "c", 0),
      (3, "a", 0), (3, "b", 1), (3, "c", 0),
      (4, "a", 1), (4, "b", 1), (4, "c", 1)).toDF("blk", "t", "s")
    val r = Stats.cochranQ(df, col("blk"), col("t"), col("s") === 1)
      .collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 3 && r.getLong(2) == 8)
    assert(math.abs(r.getDouble(3) - 28.0 / 6) < 1e-6)
    // degenerate: every block all-success -> zero denominator -> NULL Q
    val allOne = Seq((1, "a", 1), (1, "b", 1), (2, "a", 1), (2, "b", 1))
      .toDF("blk", "t", "s")
    val d = Stats.cochranQ(allOne, col("blk"), col("t"), col("s") === 1)
      .collect().head
    assert(d.isNullAt(3))
  }

  test("phiCdf matches the normal CDF within the A&S error bound") {
    import spark.implicits._
    val zs = Seq(0.0, 1.0, 1.96, -1.96, 2.5758, -0.5)
    val got = zs.toDF("z").select(Stats.phiCdf(col("z")).alias("p"))
      .collect().map(_.getDouble(0))
    val want = Seq(0.5, 0.8413447461, 0.9750021049, 0.0249978951,
      0.9950001154, 0.3085375387)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-6) }
  }

  test("tost: near-identical arms are equivalent at a wide margin") {
    import spark.implicits._
    val df = (Seq(10.0, 11.0, 12.0, 13.0).map((0, _)) ++
      Seq(10.5, 11.5, 12.4, 13.1).map((1, _))).toDF("g", "v")
    val r = Stats.tost(df, col("g") === 1, "v", margin = 5.0).collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 4)
    assert(math.abs(r.getDouble(2) - 0.375) < 1e-9) // mb - ma
    assert(r.getDouble(6) < 0.05 && r.getBoolean(7)) // p_tost, equivalent
    // an arm with one row fails fast (mdeReport's stance)
    val tiny = Seq((0, 1.0), (0, 2.0), (1, 9.0)).toDF("g", "v")
    val boom = intercept[Exception] {
      Stats.tost(tiny, col("g") === 1, "v", margin = 1.0).collect()
    }
    assert(boom.getMessage.contains("tost: need at least 2 rows per arm"))
  }

  test("proportionPValues: flat groups give |z| small and p near 1") {
    import spark.implicits._
    // group g: identical 50% success in both arms -> z = 0, p = 1
    val rows = for (i <- 0 until 40) yield ("g", i % 2 == 1, i % 4 < 2)
    val df = rows.toDF("grp", "tr", "succ")
    val r = Stats.proportionPValues(df, col("grp"), col("tr"), col("succ"))
      .collect().head
    assert(r.getDouble(5) == 0.0 && math.abs(r.getDouble(6) - 1.0) < 1e-9)
  }

  test("pageHinkley: planted level shift alarms, flat series does not") {
    import spark.implicits._
    // 10 days at 1 row/day then 10 days at 5 rows/day
    val rows = (1 to 10).map(d => (f"2024-01-$d%02d", 1)) ++
      (11 to 20).map(d => (f"2024-01-$d%02d", 5))
    val df = rows.flatMap { case (ds, n) => Seq.fill(n)(ds) }.toDF("ds")
      .select(to_date(col("ds")).alias("d"))
    val r = Stats.pageHinkley(df, col("d"), lambda = 5.0).collect().head
    assert(r.getLong(0) == 20 && r.getLong(2) > 0)
    assert(r.getDate(3).toString >= "2024-01-11")
    val flat = (1 to 20).map(d => f"2024-01-$d%02d").toDF("ds")
      .select(to_date(col("ds")).alias("d"))
    val f = Stats.pageHinkley(flat, col("d"), lambda = 5.0).collect().head
    assert(f.getLong(2) == 0 && f.isNullAt(3))
  }

  test("trimmedMean: scipy trim_mean convention with duplicate values") {
    import spark.implicits._
    // g: sorted (1,2,2,3,100), n=5, k=floor(0.2*5)=1 -> keep (2,2,3) -> 7/3
    // h: n=3, k=0 -> plain mean 2
    val df = (Seq(1.0, 2.0, 2.0, 3.0, 100.0).map(("g", _)) ++
      Seq(1.0, 2.0, 3.0).map(("h", _))).toDF("grp", "v")
    val got = Stats.trimmedMean(df, "grp", "v", alpha = 0.2).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("g").getLong(1) == 5 && got("g").getLong(2) == 1)
    assert(math.abs(got("g").getDouble(3) - 7.0 / 3) < 1e-6)
    assert(got("h").getLong(2) == 0)
    assert(math.abs(got("h").getDouble(3) - 2.0) < 1e-9)
    // 49% trim of a 2-row group keeps both (k = 0); a 1-row group at
    // alpha .49 keeps its single row
    val tiny = Seq(("t", 5.0)).toDF("grp", "v")
    val t = Stats.trimmedMean(tiny, "grp", "v", alpha = 0.49).collect().head
    assert(t.getLong(2) == 0 && t.getDouble(3) == 5.0)
  }

  test("wasserstein1: hand-computed ECDF area, degenerates pinned") {
    import spark.implicits._
    // A = {1,2,3}, B = {2,3,4}: |Fa-Fb| = 1/3 on each unit strip -> W1 = 1
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(2, 3, 4).map(("b", _)))
      .toDF("arm", "v")
    val r = Stats.wasserstein1(df, col("arm") === "a", "v").collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 3)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-6)
    // empty arm pins w1 NULL (ECDF of nothing is undefined)
    val one = Seq(("a", 1), ("a", 2)).toDF("arm", "v")
    val e = Stats.wasserstein1(one, col("arm") === "a", "v").collect().head
    assert(e.isNullAt(2))
    // both arms on one identical value -> zero strips -> exactly 0.0
    val same = Seq(("a", 5), ("b", 5)).toDF("arm", "v")
    val z = Stats.wasserstein1(same, col("arm") === "a", "v").collect().head
    assert(z.getDouble(2) == 0.0)
  }

  test("calibrationDecomp: perfect and anti-calibrated hand cases") {
    import spark.implicits._
    // perfect classifier (score == label): brier/reliability/ece/wbv 0,
    // resolution = uncertainty = ybar(1-ybar) = 0.25
    val perfect = Seq((0.0, false), (0.0, false), (1.0, true), (1.0, true))
      .toDF("s", "y")
    val p = Stats.calibrationDecomp(perfect, col("y"), "s", bins = 2)
      .collect().head
    assert(p.getLong(0) == 4 && p.getLong(1) == 2)
    assert(p.getDouble(2) == 0.0 && p.getDouble(3) == 0.0)
    assert(math.abs(p.getDouble(4) - 0.25) < 1e-9)
    assert(math.abs(p.getDouble(5) - 0.25) < 1e-9)
    assert(p.getDouble(6) == 0.0 && p.getDouble(7) == 0.0)
    // anti-calibrated (score = 1 - label): reliability 1, ece 1, brier 1
    val anti = Seq((1.0, false), (0.0, true)).toDF("s", "y")
    val a = Stats.calibrationDecomp(anti, col("y"), "s", bins = 2)
      .collect().head
    assert(a.getDouble(2) == 1.0 && a.getDouble(3) == 1.0)
    assert(math.abs(a.getDouble(4) - 0.25) < 1e-9)
    assert(a.getDouble(7) == 1.0)
  }

  test("ljungBox: ramped series Q matches the pinned-ACF replica") {
    import spark.implicits._
    // day i of January has i rows: strong positive autocorrelation.
    // Expected Q replayed offline with the exact dual-engine convention
    // (6-dp ACF, 9-dp terms, n(n+2) factor): 101.041416
    val rows = (1 to 30).flatMap(i => Seq.fill(i)(f"2024-01-$i%02d"))
    val df = rows.toDF("ds").select(to_date(col("ds")).alias("d"))
    val r = Stats.ljungBox(df, col("d"), maxLag = 7).collect().head
    assert(r.getLong(0) == 30 && r.getInt(1) == 7)
    assert(math.abs(r.getDouble(2) - 101.041416) < 1e-9)
    // n <= maxLag pins Q NULL (a term would divide by zero)
    val short = (1 to 5).map(i => f"2024-01-$i%02d").toDF("ds")
      .select(to_date(col("ds")).alias("d"))
    val s = Stats.ljungBox(short, col("d"), maxLag = 7).collect().head
    assert(s.getLong(0) == 5 && s.isNullAt(2))
  }

  test("cramerVonMises: identical samples zero, disjoint hand case") {
    import spark.implicits._
    // identical arms -> Fa = Fb everywhere -> T = 0
    val same = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)).toDF("arm", "v")
    val z = Stats.cramerVonMises(same, col("arm") === "a", "v").collect().head
    assert(z.getLong(0) == 2 && z.getLong(1) == 2)
    assert(z.getDouble(2) == 0.0)
    // A = {1}, B = {2}: term 1 at v=1, 0 at v=2; factor 1/4 -> T = 0.25
    val dis = Seq(("a", 1), ("b", 2)).toDF("arm", "v")
    val d = Stats.cramerVonMises(dis, col("arm") === "a", "v").collect().head
    assert(math.abs(d.getDouble(2) - 0.25) < 1e-9)
    // empty arm pins NULL
    val one = Seq(("a", 1), ("a", 2)).toDF("arm", "v")
    val e = Stats.cramerVonMises(one, col("arm") === "a", "v").collect().head
    assert(e.isNullAt(2))
  }

  test("hillTailIndex: exact log-excess hand case, short-input pin") {
    import spark.implicits._
    // top-3 of {8,4,2,1} at k=2: ln(8/2)+ln(4/2)+ln(2/2) = 2.079441542
    val df = Seq(8.0, 4.0, 2.0, 1.0).toDF("v")
    val r = Stats.hillTailIndex(df, "v", k = 2).collect().head
    assert(r.getLong(0) == 2 && r.getDouble(1) == 2.0)
    assert(math.abs(r.getDouble(2) - 1.039721) < 1e-9)
    assert(math.abs(r.getDouble(3) - 0.961797) < 1e-9)
    // fewer than k+1 positive rows: estimator undefined -> NULL
    val short = Seq(3.0, -1.0, 2.0).toDF("v")
    val s = Stats.hillTailIndex(short, "v", k = 2).collect().head
    assert(s.getLong(0) == 1 && s.isNullAt(2) && s.isNullAt(3))
    // flat tail (all equal): gamma 0, alpha pinned NULL (1/0)
    val flat = Seq(5.0, 5.0, 5.0, 5.0).toDF("v")
    val f = Stats.hillTailIndex(flat, "v", k = 2).collect().head
    assert(f.getDouble(2) == 0.0 && f.isNullAt(3))
  }

  test("mutualInfo: independence zeroes MI, identity saturates NMI") {
    import spark.implicits._
    val ind = Seq(("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"))
      .toDF("x", "y")
    val i = Stats.mutualInfo(ind, col("x"), col("y")).collect().head
    assert(i.getLong(0) == 4 && i.getLong(1) == 4)
    assert(i.getDouble(2) == 0.0)
    assert(i.getDouble(3) == 1.0 && i.getDouble(4) == 1.0)
    assert(i.getDouble(5) == 0.0)
    val dep = Seq(("a", "c"), ("a", "c"), ("b", "d"), ("b", "d"))
      .toDF("x", "y")
    val d = Stats.mutualInfo(dep, col("x"), col("y")).collect().head
    assert(d.getDouble(2) == 1.0 && d.getDouble(5) == 1.0)
    // constant column: its entropy readout is +0.0 (not IEEE -0.0 from
    // negating an exact zero sum) and NMI pins NULL
    val const = Seq(("a", "c"), ("b", "c")).toDF("x", "y")
    val c = Stats.mutualInfo(const, col("x"), col("y")).collect().head
    assert(c.getDouble(4) == 0.0 &&
      java.lang.Double.doubleToRawLongBits(c.getDouble(4)) == 0L)
    assert(c.isNullAt(5))
  }

  test("coxPh: one Newton step matches the hand-computed score/info") {
    import spark.implicits._
    // Subjects (t=1, event, x=1) and (t=2, event, x=0), β₀ = 0:
    // at t=1 risk set {both}: S0=2, S1=1 → U = 1 − 1/2 = 0.5,
    // I = 1/2 − 1/4 = 0.25; at t=2 the lone subject has x=0 → U += 0,
    // I += 0. β₁ = 0 + 0.5/0.25 = 2 exactly; HR = e².
    val df = Seq((1L, true, 1.0), (2L, true, 0.0)).toDF("dur", "obs", "x")
    val r = Stats.coxPh(df, "dur", "obs", "x", iters = 1).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 2.0)
    assert(math.abs(r.getDouble(5) - 7.389056) < 1e-6) // e² at 6 dp
    // se reads I at the FINAL β: p = e²/(e²+1), I = p(1−p)
    val p = math.exp(2.0) / (math.exp(2.0) + 1.0)
    assert(math.abs(r.getDouble(3) - 1.0 / math.sqrt(p * (1 - p))) < 1e-5)
    // planted positive effect keeps β positive under more iterations
    val many = ((1 to 10).map(i => (i.toLong, true, 1.0)) ++
      (11 to 20).map(i => (i.toLong, true, 0.0))).toDF("dur", "obs", "x")
    val m = Stats.coxPh(many, "dur", "obs", "x", iters = 3).collect().head
    assert(m.getDouble(2) > 0.5)
  }

  test("cox diag probes: stage digests consistent with the fit") {
    import spark.implicits._
    val many = ((1 to 10).map(i => (i.toLong, true, 1.25)) ++
      (11 to 20).map(i => (i.toLong, i % 2 == 0, 0.5))).toDF("dur", "obs", "x")
    val fit = Stats.coxPh(many, "dur", "obs", "x", iters = 3).collect().head
    val dx = Stats.coxDiagX(many, "dur", "obs", "x").collect().head
    // subjects digest matches the fit's n / n_events
    assert(dx.getLong(0) == fit.getLong(0))
    assert(dx.getLong(1) == fit.getLong(1))
    assert(dx.getLong(2) == (1 to 20).sum) // t_sum
    // covariate multiset digest: 10×1.25 + 10×0.5: hi = 10×1 + 10×0,
    // lo = 10×0.25e9 + 10×0.5e9 — all BIGINT since round 15
    assert(dx.getLong(3) == 10L)
    assert(dx.getLong(4) == 10L * 250000000L + 10L * 500000000L)
    // Σlo² carried as the bounded split (Σq², Σqr, Σr²) with
    // lo = q·2^20 + r: rebuild and compare against the direct sum
    val los = Seq.fill(10)(250000000L) ++ Seq.fill(10)(500000000L)
    val expLl = los.map(l => BigInt(l) * BigInt(l)).sum
    val gotLl = BigInt(dx.getLong(5)) * BigInt(2).pow(40) +
      BigInt(dx.getLong(6)) * BigInt(2).pow(21) + BigInt(dx.getLong(7))
    assert(gotLl == expLl, s"xll split $gotLl vs $expLl")
    // per-value rows probe: multiplicities and (hi, lo) pairs, and its
    // totals rebuild the aggregate digest's (xh, xl)
    val xr = Stats.coxDiagXRows(many, "dur", "obs", "x").collect()
    assert(xr.length == 2)
    assert(xr.map(_.getLong(2)).sum == 20)
    assert(xr.map(r => r.getLong(0) * r.getLong(2)).sum == dx.getLong(3))
    assert(xr.map(r => r.getLong(1) * r.getLong(2)).sum == dx.getLong(4))
    // sorted ascending by (xh, xl): 0.5 before 1.25
    assert(xr(0).getLong(0) == 0L && xr(0).getLong(1) == 500000000L)
    assert(xr(1).getLong(0) == 1L && xr(1).getLong(1) == 250000000L)
    val g1 = Stats.coxDiagG1(many, "dur", "obs", "x").collect().head
    assert(g1.getLong(0) == 20) // 20 distinct durations
    assert(g1.getLong(1) == 15) // 10 + 5 events
    // pass-1 (β=0, ex=1) S0 suffix counts: Σ_t |risk set at t| = Σ 1..20
    // — BIGINT outputs since round 15
    assert(g1.getLong(2) * 1000000000L +
      g1.getLong(3) == (1 to 20).map(i => i.toLong).sum *
      1000000000L)
    // β ladder: the last pass's (hi, lo) pair rebuilds to the fit's
    // 6-dp beta under the same portable pin
    val lad = Stats.coxDiagBetas(many, "dur", "obs", "x", iters = 3)
      .collect().head
    val b3 = lad.getLong(4) + lad.getLong(5) / 1e9
    val pin6 = math.floor(b3) +
      math.floor((b3 - math.floor(b3)) * 1e6 + 0.5) / 1e6
    assert(pin6 == fit.getDouble(2), s"ladder b3 $b3 vs beta ${fit.getDouble(2)}")
  }

  test("kernel-at-fit-arguments probes: chunks rebuild the raw outputs") {
    import spark.implicits._
    val many = ((1 to 10).map(i => (i.toLong, true, 1.25)) ++
      (11 to 20).map(i => (i.toLong, i % 2 == 0, 0.5))).toDF("dur", "obs", "x")
    // cox exp probe: one row per distinct covariate, chunks rebuild the
    // exact kernel output at β₃·x (the ladder's b3 is the rebuilt pin)
    val lad = Stats.coxDiagBetas(many, "dur", "obs", "x", iters = 3)
      .collect().head
    val b3 = lad.getLong(4) + lad.getLong(5) / 1e9
    val ke = Stats.coxDiagKernelExp(many, "dur", "obs", "x", iters = 3)
      .collect()
    assert(ke.length == 2)
    assert(ke.map(_.getLong(2)).sum == 20)
    ke.foreach { r =>
      val x = r.getLong(0) + r.getLong(1) / 1e9
      val v = r.getLong(3) + r.getLong(4) / math.pow(2, 27) +
        r.getLong(5) / math.pow(2, 54) + r.getLong(6) / math.pow(2, 81)
      val want = graft.functions.PortableMathKernel.pexp(b3 * x)
      assert(math.abs(v - want) < 1e-12, s"x=$x v=$v want=$want")
    }
    // cox ln probe: one row per duration with events (10 + 5 here);
    // fraction chunks strictly below 2^27 (floor(f·2^27) with f ∈ [0,1)
    // is at most 2^27 − 1 — round-15 ADVICE tightening), and the
    // chunks rebuild pln at the emitted exact S0 argument
    val kl = Stats.coxDiagKernelLn(many, "dur", "obs", "x", iters = 3)
      .collect()
    assert(kl.length == 15)
    kl.foreach { r =>
      Seq(5, 6, 7).foreach(i =>
        assert(r.getLong(i) >= 0L && r.getLong(i) < (1L << 27)))
      val s0 = r.getLong(2) + r.getLong(3) / 1e9
      val v = r.getLong(4) + r.getLong(5) / math.pow(2, 27) +
        r.getLong(6) / math.pow(2, 54) + r.getLong(7) / math.pow(2, 81)
      val want = graft.functions.PortableMathKernel.pln(s0)
      assert(math.abs(v - want) < 1e-12, s"s0=$s0 v=$v want=$want")
    }
    // logistic probe with one row per id-mod-20 group: the sigmoid
    // chunks rebuild a pexp that re-pins to the logisticScore score
    val docs = (1 to 20).map(i => (i.toLong, if (i % 2 == 0) 1.0 else 0.0,
      1.0 + (i % 5) * 0.25, 0.5 + (i % 3) * 0.125)).toDF("id", "y", "x1", "x2")
    val scores = Stats.logisticScore(docs, col("id"), col("y"), col("x1"),
      col("x2"), iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lk = Stats.logisticDiagKernel(docs, col("id"), col("y"), col("x1"),
      col("x2"), iters = 3).collect()
    assert(lk.length == 20 && lk.forall(_.getLong(1) == 1))
    def pinD(v: Double, q: Double): Double = {
      val hi = math.floor(v)
      hi + math.floor((v - hi) * q + 0.5) / q
    }
    lk.foreach { r =>
      val id = if (r.getLong(0) == 0L) 20L else r.getLong(0)
      val pe = r.getLong(2) + r.getLong(3) / math.pow(2, 27) +
        r.getLong(4) / math.pow(2, 54) + r.getLong(5) / math.pow(2, 81)
      assert(pinD(pinD(1.0 / (1.0 + pe), 1e9), 1e6) == scores(id),
        s"id=$id")
    }
    // gmm probe: group counts cover every row, density chunks bounded
    val xs = Seq(-2.1, -2.0, -1.9).flatMap(v => Seq.fill(10)(v)) ++
      Seq(1.9, 2.0, 2.1).flatMap(v => Seq.fill(10)(v))
    val gk = Stats.gmmDiagKernel(xs.toDF("x"), col("x"), iters = 3).collect()
    assert(gk.map(_.getLong(1)).sum == 60)
    gk.foreach { r =>
      // densities are pexp(≤ 0) ∈ (0, 1]: per-row hi ∈ {0, 1} so the
      // group hi sum is bounded by the group count
      assert(r.getLong(2) >= 0L && r.getLong(2) <= r.getLong(1))
      assert(r.getLong(6) >= 0L && r.getLong(6) <= r.getLong(1))
    }
  }

  test("round-17 cox probes: kargs splits cover kargs; kterms/a0 rebuild") {
    import spark.implicits._
    // Round 18 (VERDICT r17 #1): the tn/s0/q1..q4/a0 one-shot bisect
    // splits are REGISTRY-RETIRED (their question — which column/row
    // range diverges — was answered: none; wire typing) and this test
    // is their standing coverage; kln/kargs/kterms remain the
    // registered wire+value sentinels.
    val many = ((1 to 10).map(i => (i.toLong, true, 1.25)) ++
      (11 to 20).map(i => (i.toLong, i % 2 == 0, 0.5))).toDF("dur", "obs", "x")
    val kargs = Stats.coxDiagKArgs(many, "dur", "obs", "x", iters = 3)
      .collect()
    // column split (VERDICT r16 #1): tn/s0 are exact projections
    val tn = Stats.coxDiagKArgsTn(many, "dur", "obs", "x", iters = 3)
      .collect()
    assert(tn.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      kargs.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    val s0 = Stats.coxDiagKArgsS0(many, "dur", "obs", "x", iters = 3)
      .collect()
    assert(s0.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      kargs.map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq)
    // row bisect (VERDICT r16 #2): quartiles partition kargs in rank
    // order, sizes within 1 of each other
    val quarts = (1 to 4).map(q => Stats.coxDiagKArgsQuart(
      many, "dur", "obs", "x", quart = q, iters = 3).collect().toSeq)
    assert(quarts.flatten.map(_.toSeq) === kargs.map(_.toSeq).toSeq)
    val sizes = quarts.map(_.length)
    assert(sizes.sum == kargs.length && sizes.max - sizes.min <= 1)
    // window-boundary split: suffix-summing the per-duration (a0h, a0l)
    // pairs rebuilds kargs' exact S0 pairs at every duration
    val a0 = Stats.coxDiagKArgsA0(many, "dur", "obs", "x", iters = 3)
      .collect()
    var hh = 0L; var ll = 0L
    val cum = a0.sortBy(r => -r.getLong(0)).map { r =>
      hh += r.getLong(2); ll += r.getLong(3); r.getLong(0) -> ((hh, ll))
    }.toMap
    kargs.foreach { r =>
      assert(cum(r.getLong(0)) === ((r.getLong(2), r.getLong(3))),
        s"t=${r.getLong(0)}")
    }
    // per-term live-chain probe (VERDICT r16 #3): chunk sums are n × the
    // pinned kernel term, and the pair-decomposition sums are exactly
    // n × (⌊pin9(ex)⌋, lo(pin9(ex))) — what the a0 moment pairs feed
    val lad = Stats.coxDiagBetas(many, "dur", "obs", "x", iters = 3)
      .collect().head
    val b3 = lad.getLong(4) + lad.getLong(5) / 1e9
    val kt = Stats.coxDiagKTerms(many, "dur", "obs", "x", iters = 3)
      .collect()
    assert(kt.length == 2 && kt.map(_.getLong(2)).sum == 20)
    kt.foreach { r =>
      val x = r.getLong(0) + r.getLong(1) / 1e9
      val n = r.getLong(2)
      val raw = graft.functions.PortableMathKernel.pexp(b3 * x)
      val hi = math.floor(raw)
      val quanta = math.floor((raw - hi) * 1e9 + 0.5)
      val pinned = hi + quanta / 1e9
      val v = r.getLong(3).toDouble / n +
        r.getLong(4).toDouble / n / math.pow(2, 27) +
        r.getLong(5).toDouble / n / math.pow(2, 54) +
        r.getLong(6).toDouble / n / math.pow(2, 81)
      assert(math.abs(v - pinned) < 1e-12, s"x=$x v=$v want=$pinned")
      assert(r.getLong(7) == n * math.floor(pinned).toLong, s"p_hi x=$x")
      val pq = math.floor((pinned - math.floor(pinned)) * 1e9 + 0.5).toLong
      assert(r.getLong(8) == n * pq, s"p_lo x=$x")
    }
    // registry-retired halves stay exercised (round 17, VERDICT r16 #5):
    // xint/xcov agree with the full x digest column for column
    val dx = Stats.coxDiagX(many, "dur", "obs", "x").collect().head
    val xi = Stats.coxDiagXInt(many, "dur", "obs", "x").collect().head
    assert((0 to 2).forall(i => xi.getLong(i) == dx.getLong(i)))
    val xc = Stats.coxDiagXCov(many, "dur", "obs", "x").collect().head
    assert(xc.getLong(0) == dx.getLong(0))
    assert((1 to 5).forall(i => xc.getLong(i) == dx.getLong(i + 2)))
  }

  test("gmmEm1d: separates two planted clusters from moment init") {
    import spark.implicits._
    // Two tight clusters at ±2; EM from the x̄ ∓ s init must localize
    // both means and split the weight evenly.
    val xs = Seq(-2.1, -2.0, -1.9).flatMap(v => Seq.fill(10)(v)) ++
      Seq(1.9, 2.0, 2.1).flatMap(v => Seq.fill(10)(v))
    val r = Stats.gmmEm1d(xs.toDF("x"), col("x"), iters = 3).collect().head
    assert(r.getLong(0) == 60)
    assert(math.abs(r.getDouble(1) - 0.5) < 0.02)  // pi_lo
    assert(math.abs(r.getDouble(2) + 2.0) < 0.05)  // mu_lo
    assert(r.getDouble(3) < 0.3)                   // sigma_lo tight
    assert(math.abs(r.getDouble(5) - 2.0) < 0.05)  // mu_hi
    assert(math.abs(r.getDouble(1) + r.getDouble(4) - 1.0) < 1e-9)
    assert(!r.isNullAt(7))                         // finite avg loglik
  }

  test("isotonicCalibration: adjacent violators pool to their mean") {
    import spark.implicits._
    // Scores span [0, 1] exactly so min-max is the identity; 4 bins with
    // raw rates (0.2, 0.6, 0.4, 0.8) — the middle pair violates
    // monotonicity and PAV pools it to (3+2)/10 = 0.5.
    def rows(score: Double, pos: Int, tot: Int) =
      (0 until tot).map(i => (score, i < pos))
    val df = (rows(0.0, 1, 1) ++ rows(0.1, 0, 4) ++ // bin 0: 1/5
      rows(0.3, 3, 5) ++                            // bin 1: 3/5
      rows(0.6, 2, 5) ++                            // bin 2: 2/5
      rows(0.9, 3, 4) ++ rows(1.0, 1, 1))           // bin 3: 4/5
      .toDF("s", "y")
    val got = Stats.isotonicCalibration(df, col("y"), "s", bins = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq((0L, 5L, 0.2, 0.2), (1L, 5L, 0.6, 0.5),
      (2L, 5L, 0.4, 0.5), (3L, 5L, 0.8, 0.8)))
  }

  test("overdispersion: hand moments per group, single-entity pins NULL") {
    import spark.implicits._
    // Group a: per-entity counts {1, 2, 3} → mean 2, s² 1, D 0.5, χ² 1.
    val df = (Seq(("a", 1)) ++ Seq.fill(2)(("a", 2)) ++
      Seq.fill(3)(("a", 3)) ++ Seq.fill(4)(("b", 9))).toDF("g", "e")
    val got = Stats.overdispersion(df, col("g"), col("e")).collect()
    val a = got(0)
    assert(a.getString(0) == "a" && a.getLong(1) == 3)
    assert(a.getDouble(2) == 2.0 && a.getDouble(3) == 1.0)
    assert(a.getDouble(4) == 0.5 && a.getDouble(5) == 1.0)
    val b = got(1)
    assert(b.getString(0) == "b" && b.getLong(1) == 1)
    assert(b.getDouble(2) == 4.0 && b.isNullAt(3) && b.isNullAt(4) &&
      b.isNullAt(5))
  }

  test("periodogram: planted weekly rhythm peaks at period 7") {
    import spark.implicits._
    // 56 days, 2 events on day ≡ 0 (mod 7), 1 otherwise: the variance
    // concentrates at period 7 (and its alias 14 at lower power).
    val rows = (0 until 56).flatMap { i =>
      val d = java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i))
      Seq.fill(if (i % 7 == 0) 2 else 1)(d)
    }
    val got = Stats.periodogram(rows.toDF("d"), col("d"), maxPeriod = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == 9)
    assert((2 to 10).filter(_ != 7).forall(p => got(7) > got(p.toLong)))
    // flat series: zero centered mass → zero power, NULL variance share
    val flat = (0 until 14).map(i => java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i))).toDF("d")
    val f = Stats.periodogram(flat, col("d"), maxPeriod = 5).collect()
    assert(f.forall(r => r.getDouble(1) == 0.0 && r.isNullAt(2)))
  }

  test("cronbachAlpha: duplicated item is perfectly reliable; constant total pins NULL") {
    import spark.implicits._
    // item2 == item1: var_total = 4v, item vars sum 2v -> alpha = 1
    val dup = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 4.0))
      .toDF("a", "b")
    val r = Stats.cronbachAlpha(dup, Seq("a" -> col("a"), "b" -> col("b")))
      .collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 1.0)
    // perfectly anti-correlated items: total constant -> vt = 0 -> NULL
    val anti = Seq((1.0, 0.0), (0.0, 1.0), (1.0, 0.0), (0.0, 1.0))
      .toDF("a", "b")
    val p = Stats.cronbachAlpha(anti, Seq("a" -> col("a"), "b" -> col("b")))
      .collect().head
    assert(p.isNullAt(2) && p.getDouble(4) == 0.0)
    // duplicate item NAMES would alias two __i_<name> columns and make
    // the null-filter/total references ambiguous — guarded at entry
    val boom = intercept[IllegalArgumentException] {
      Stats.cronbachAlpha(dup, Seq("a" -> col("a"), "a" -> col("b")))
    }
    assert(boom.getMessage.contains("duplicate item names"))
  }

  test("tukeyHsd: hand-computed Tukey-Kramer q over three groups") {
    import spark.implicits._
    // a={1,2,3} b={4,5,6} c={1,2,3}: means 2/5/2, within-SS 2 each,
    // MSE = 6/6 = 1; q_ab = 3/sqrt((1/2)(2/3)) = 3*sqrt(3) = 5.196152
    val df = Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0, "b" -> 4.0,
      "b" -> 5.0, "b" -> 6.0, "c" -> 1.0, "c" -> 2.0, "c" -> 3.0)
      .toDF("g", "v")
    val rows = Stats.tukeyHsd(df, col("g"), "v").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    val ab = rows(0); val ac = rows(1); val bc = rows(2)
    assert(ab.getDouble(2) == -3.0 && ab.getDouble(3) == 5.196152)
    assert(ab.getBoolean(4) && bc.getBoolean(4))
    assert(ac.getDouble(3) == 0.0 && !ac.getBoolean(4))
  }

  test("holdoutForecast: seasonal-naive nails a pure weekly pattern") {
    import spark.implicits._
    // 14 days with a weekly spike (2 on day ≡ 0 mod 7, else 1);
    // horizon 7: the last train week predicts the test week exactly
    // (snaive errors 0), naive-last stays at the day-6 value 1.
    val rows = (0 until 14).flatMap { i =>
      val d = java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i))
      Seq.fill(if (i % 7 == 0) 2 else 1)(d)
    }
    val r = Stats.holdoutForecast(rows.toDF("d"), col("d"),
      horizon = 7, season = 7).collect().head
    assert(r.getLong(0) == 7)
    assert(math.abs(r.getDouble(1) - 0.142857) < 1e-9)  // mae_naive 1/7
    assert(math.abs(r.getDouble(3) - 0.095238) < 1e-9)  // smape_naive
    assert(math.abs(r.getDouble(4) - 0.857143) < 1e-9)  // mase = (1/7)/(1/6)
    assert(r.getDouble(5) == 0.0 && r.getDouble(8) == 0.0) // snaive exact
  }
}
