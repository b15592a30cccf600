package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{PortableMath, PortableMathKernel => K}

/** The portable exp/ln kernel (cross-engine determinism, VERDICT r11
  * item 1): accuracy vs libm within a few ulp across the domain, exact
  * identities at the anchors, Catalyst expression ≡ kernel, and the
  * SQL mirror's literal round-trip invariant. The JVM↔DuckDB bit-parity
  * itself is driver-checked by q_portable_exp / q_portable_ln (and by
  * every migrated fit's oracle); these tests pin the JVM half. */
class PortableMathSpec extends AnyFunSuite with SparkSpec {

  private def ulps(a: Double, b: Double): Long = {
    val x = java.lang.Double.doubleToLongBits(a)
    val y = java.lang.Double.doubleToLongBits(b)
    math.abs(x - y)
  }

  private def samples(g: Gen[Double], n: Int): Seq[Double] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(12L))

  test("pexp within 4 ulp of Math.exp across [-80, 80]") {
    val xs = samples(Gen.chooseNum(-80.0, 80.0), 4000) ++
      Seq(0.0, 1.0, -1.0, 0.5, -0.5, 80.0, -80.0, 1e-12, -1e-12,
        0.34657359027997264, -0.34657359027997264) // |r| boundary
    val worst = xs.map(x => ulps(K.pexp(x), Math.exp(x))).max
    assert(worst <= 4, s"pexp worst ulp distance $worst")
  }

  test("pln within 4 ulp of Math.log across the clamp domain") {
    val ys = samples(Gen.chooseNum(-41.0, 87.0), 4000).map(Math.exp) ++
      Seq(1.0, 2.0, 0.5, 1.5, 0.75, 1e-18, 1e38, 1.0 + 1e-15, 1.0 - 1e-16)
    val worst = ys.map(y => ulps(K.pln(y), Math.log(y))).max
    assert(worst <= 4, s"pln worst ulp distance $worst")
  }

  test("anchors and clamps are exact") {
    assert(K.pexp(0.0) === 1.0)
    assert(K.pln(1.0) === 0.0)
    assert(!(java.lang.Double.doubleToRawLongBits(K.pln(1.0)) < 0), "-0.0 leak")
    // clamps: out-of-domain pins to the boundary value, never Inf/NaN
    assert(K.pexp(1e6) === K.pexp(80.0))
    assert(K.pexp(-1e6) === K.pexp(-80.0))
    assert(K.pln(0.0) === K.pln(1e-18))
    assert(K.pln(1e40) === K.pln(1e38))
    // NaN must PROPAGATE, not clamp — a degenerate fit (0/0 β) has to
    // fail loudly and identically on both engines (the SQL mirror leads
    // its clamp CASE with isnan for the same reason; round-12 ADVICE)
    assert(K.pexp(Double.NaN).isNaN)
    assert(K.pln(Double.NaN).isNaN)
    val nanSql = graft.functions.PortableMathSql.expFrom(
      "t", "x", "o", "p")
    assert(nanSql.contains("isnan"), "SQL mirror must lead with isnan")
  }

  test("round-trip: pln(pexp(x)) ≈ x, pexp(pln(y)) ≈ y") {
    for (x <- samples(Gen.chooseNum(-40.0, 40.0), 500))
      assert(math.abs(K.pln(K.pexp(x)) - x) <= 1e-13 * math.max(1.0, math.abs(x)))
    for (y <- samples(Gen.chooseNum(-12.0, 60.0), 500).map(Math.exp))
      assert(math.abs(K.pexp(K.pln(y)) - y) <= 1e-13 * y)
  }

  test("Catalyst expression ≡ kernel, interpreted and codegen") {
    import spark.implicits._
    val xs = samples(Gen.chooseNum(-30.0, 30.0), 300)
    val df = xs.toDF("x")
    val got = df.select(PortableMath.pexp(col("x")).alias("e"),
      PortableMath.pln(abs(col("x")) + lit(0.001)).alias("l"))
      .collect()
    xs.zip(got).foreach { case (x, row) =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(K.pexp(x)), s"pexp($x)")
      assert(java.lang.Double.doubleToLongBits(row.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(K.pln(math.abs(x) + 0.001)), s"pln($x)")
    }
    // null propagates
    val n = Seq[java.lang.Double](null).toDF("x")
      .select(PortableMath.pexp(col("x"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("SQL registration: portable_exp / portable_ln in spark.sql") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq(0.25, 1.0, -3.5).toDF("x").createOrReplaceTempView("pm_probe")
    val rows = spark.sql(
      "SELECT portable_exp(x) AS e, portable_ln(abs(x) + 1.0) AS l " +
        "FROM pm_probe ORDER BY x").collect()
    assert(rows.map(_.getDouble(0)).sameElements(
      Array(K.pexp(-3.5), K.pexp(0.25), K.pexp(1.0))))
    assert(rows.map(_.getDouble(1)).sameElements(
      Array(K.pln(4.5), K.pln(1.25), K.pln(2.0))))
  }

  test("SQL literal emitter: every kernel constant round-trips exactly") {
    import graft.functions.PortableMathSql.lit
    val consts = Seq(K.InvLn2, K.Ln2Hi, K.Ln2Lo, K.ExpClamp, -K.ExpClamp,
      K.LnClampLo, K.LnClampHi, 0.5, 1.5, 2.0, -64.0) ++
      K.ExpC ++ K.LnC ++ K.Pos ++ K.Neg
    consts.foreach { c =>
      val s = lit(c)
      assert(s.contains("e"), s"$s must force DOUBLE typing")
      assert(java.lang.Double.parseDouble(s) === c, s"literal $s drifted")
    }
  }

  test("pin: floor-ladder tracks HALF_UP rounding and never emits -0.0") {
    import spark.implicits._
    val xs = samples(Gen.chooseNum(-5000.0, 5000.0), 2000) ++
      Seq(0.0, -0.0, 1e-10, -1e-10, 0.1234567895, -0.1234567895,
        2.5e-7, -2.5e-7, 4094.9999999994, -4094.9999999994)
    val got = xs.toDF("x")
      .select(PortableMath.pin9(col("x")).alias("p9"),
        PortableMath.pin6(col("x")).alias("p6")).collect()
    xs.zip(got).foreach { case (x, row) =>
      val p9 = row.getDouble(0)
      val p6 = row.getDouble(1)
      // a 9-dp pin sits within half a quantum (+ repr slack) of x
      assert(math.abs(p9 - x) <= 5.01e-10, s"pin9($x) = $p9")
      assert(math.abs(p6 - x) <= 5.01e-7, s"pin6($x) = $p6")
      // HALF_UP agreement within one quantum (exact midpoints aside)
      val hu9 = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      assert((BigDecimal(p9) - hu9).abs <= BigDecimal("1.1e-9"),
        s"pin9($x) = $p9 vs HALF_UP $hu9")
      // no negative zero can leave the ladder
      assert(!(p9 == 0.0 &&
        java.lang.Double.doubleToRawLongBits(p9) < 0), s"-0.0 from pin9($x)")
      assert(!(p6 == 0.0 &&
        java.lang.Double.doubleToRawLongBits(p6) < 0), s"-0.0 from pin6($x)")
    }
  }

  test("JVM pin twin: kernel pin9/pin6 bit-match the Column floor-ladder") {
    import spark.implicits._
    // the round-14 grid-injection contract: a grid value computed ONCE
    // by PortableMathKernel.pin9 must be the EXACT double the Column
    // pin9 would have produced (floor→double vs floor→LONG→double —
    // exact either way below 2^52). Cover BOTH injected grids' actual
    // domains (pln of the first 2048 integers ⊇ the 256-entry cox grid
    // and the 2048-entry GMM/logistic grid) plus random doubles.
    val xs = (1 to 2048).map(k => K.pln(k.toDouble)) ++
      samples(Gen.chooseNum(-5000.0, 5000.0), 1000)
    val got = xs.toDF("x")
      .select(PortableMath.pin9(col("x")).alias("p9"),
        PortableMath.pin6(col("x")).alias("p6")).collect()
    xs.zip(got).foreach { case (x, row) =>
      assert(java.lang.Double.doubleToLongBits(K.pin9(x)) ===
        java.lang.Double.doubleToLongBits(row.getDouble(0)),
        s"pin9($x): JVM ${K.pin9(x)} vs Column ${row.getDouble(0)}")
      assert(java.lang.Double.doubleToLongBits(K.pin(x, 1e6)) ===
        java.lang.Double.doubleToLongBits(row.getDouble(1)),
        s"pin6($x): JVM ${K.pin(x, 1e6)} vs Column ${row.getDouble(1)}")
    }
    // and the SQL literal emitter round-trips every grid value exactly
    // (both injected grids: cox 1..256 ⊂ lnGrid 1..2048)
    (1 to 2048).map(k => K.pin9(K.pln(k.toDouble))).foreach { g =>
      val s = graft.functions.PortableMathSql.lit(g)
      assert(java.lang.Double.parseDouble(s) === g, s"grid literal $s drifted")
    }
  }

  test("pairParts/pairSumCols: the staged pair sum equals the unstaged one") {
    import spark.implicits._
    // the round-14 staging refactor's contract: moving the (hi, lo)
    // decomposition into a projection changes WHERE the work happens,
    // never the integers — staged totals and the rebuilt double must
    // equal the unstaged pairSum's exactly, at any partitioning.
    val vs = samples(Gen.chooseNum(-2000L * 1000000000L, 2000L * 1000000000L)
      .map(_.toDouble), 2000).map(n => math.rint(n) / 1e9)
    Seq(1, 7).foreach { parts =>
      val df = vs.toDF("v").repartition(parts)
      val un = df.agg(PortableMath.pairSum(col("v"), "s").head,
          PortableMath.pairSum(col("v"), "s").tail: _*)
        .select(col("sh"), col("sl")).collect().head
      val st = df.select(PortableMath.pairParts(col("v"), "s"): _*)
        .agg(PortableMath.pairSumCols("s").head,
          PortableMath.pairSumCols("s").tail: _*)
        .select(col("sh"), col("sl")).collect().head
      assert(un.getDecimal(0) === st.getDecimal(0), s"hi sums differ @$parts")
      assert(un.getDecimal(1) === st.getDecimal(1), s"lo sums differ @$parts")
    }
  }

  test("pairSum/pairVal: exact, order-independent, within 2 ulp of truth") {
    import spark.implicits._
    // 9-dp-pinned values (the only class the cox path ever pair-sums)
    val vs = samples(Gen.chooseNum(-2000L * 1000000000L, 2000L * 1000000000L)
      .map(_.toDouble), 3000).map(n => math.rint(n) / 1e9)
    def run(parts: Int): (java.math.BigDecimal, java.math.BigDecimal, Double) = {
      val df = vs.toDF("v").repartition(parts)
      val cols = PortableMath.pairSum(col("v"), "s")
      val r = df.agg(cols.head, cols.tail: _*)
        .select(col("sh"), col("sl"),
          PortableMath.pairVal(col("sh"), col("sl")).alias("sv"))
        .collect().head
      (r.getDecimal(0), r.getDecimal(1), r.getDouble(2))
    }
    val (h1, l1, v1) = run(1)
    val (h7, l7, v7) = run(7)
    // shuffle-order independence is BIT-level: the pair sums are exact
    // integers, the rebuild a fixed IEEE expression of them
    assert(h1 == h7 && l1 == l7)
    assert(java.lang.Double.doubleToLongBits(v1) ===
      java.lang.Double.doubleToLongBits(v7))
    // against exact decimal ground truth: hi/lo decomposition loses
    // nothing on 9-dp inputs, so the rebuild is the exact sum up to the
    // two IEEE roundings in H + L/1e9
    // absolute bound, not ulps: mixed signs may cancel the total near
    // zero where relative error is meaningless; the rebuild's only
    // inexactness is the two IEEE roundings in H + L/1e9 (≤ ~1e-12
    // here), far under one 9-dp quantum
    val exact = vs.map(v => BigDecimal(v).setScale(9,
      BigDecimal.RoundingMode.HALF_UP)).sum
    assert((BigDecimal(v1) - exact).abs <= BigDecimal("1e-9"),
      s"pair rebuild $v1 vs exact $exact")
  }

  test("pairValNorm: carry-normalized rebuild lands in the probed shape") {
    import spark.implicits._
    // Round 16 (VERDICT r15 #3): the normalized rebuild must (a) stay
    // within one 9-dp quantum of the exact H + L/1e9 value, and (b) be
    // BIT-equal to the canonical pairVal(H + ⌊L/1e9⌋, L mod 1e9) —
    // i.e. exactly the k + q/1e9, q < 1e9 shape the q_portable_ln_s0
    // parity grid probes, which is the whole point of normalizing.
    // L spans the live un-normalized suffix-sum range (up to ~8e11 at
    // the gate SFs, here to 4e12) and H the live hi range.
    val hs = samples(Gen.chooseNum(0L, 20000L), 400)
    val ls = samples(Gen.chooseNum(0L, 4000000000000L), 400)
    val df = hs.zip(ls).toDF("h", "l")
      .select(col("h").cast("decimal(38,0)").alias("h"),
        col("l").cast("decimal(38,0)").alias("l"))
    val got = df.select(
      PortableMath.pairValNorm(col("h"), col("l")).alias("nv"),
      PortableMath.pairVal(col("h") +
        ((col("l") - col("l") % lit(1000000000L)) / lit(1000000000L))
          .cast("decimal(38,0)"),
        col("l") % lit(1000000000L)).alias("cv"),
      col("h").cast("double").alias("hd"), col("l").cast("double").alias("ld"))
      .collect()
    got.foreach { r =>
      val (nv, cv) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.doubleToLongBits(nv) ===
        java.lang.Double.doubleToLongBits(cv),
        s"normalized rebuild not in canonical probed shape: $nv vs $cv")
      val exact = BigDecimal(r.getDouble(2)) + BigDecimal(r.getDouble(3)) /
        BigDecimal("1e9")
      assert((BigDecimal(nv) - exact).abs <= BigDecimal("1e-9"),
        s"pairValNorm $nv vs exact $exact")
    }
  }

  test("ln_s0_wide midpoint arm: pln outputs dwell at pin9 midpoints") {
    // Construction guard for q_portable_ln_s0_wide's (m) arm: the probe
    // claims its arguments pexp((m+0.5)/1e9) · (1 + j·2⁻⁵²) put the pln
    // OUTPUT within a few ulp of a pin9 midpoint — the only region where
    // a 1-ulp build-dependent kernel flip can cross the pin ladder. If a
    // future edit broke that (wrong quantum, wrong nudge scale), the
    // probe would silently stop exercising the knife edge while staying
    // green. Replays the exact probe formulas through the Scala kernel
    // and asserts the distance to the nearest (k+½)/1e9 midpoint stays
    // ≤ 1e-12 — three orders under the 5e-10 half-quantum, yet loose
    // enough for the kernel's few-ulp composition error.
    val eps = 2.220446049250313e-16
    (1L to 4000L).map(_ * 37L + 11L).foreach { id =>
      val m = (id * 2654435761L % 10000000000L).toDouble
      val mid = (m + 0.5) / 1e9
      val j = (id % 5 - 2).toDouble
      val arg = K.pexp(mid) * (1.0 + j * eps)
      val v = K.pln(arg)
      val dist = math.abs(v - (math.floor(v * 1e9) + 0.5) / 1e9)
      assert(dist <= 1e-12,
        s"midpoint-arm drift: id=$id mid=$mid v=$v dist=$dist")
    }
  }

  test("bitChunks: exact rebuild and strict 27-bit chunk range") {
    import spark.implicits._
    // values spanning the probes' live shapes: ln outputs (±small),
    // pair rebuilds k + q/1e9, and exp outputs near 0
    val vs = samples(Gen.chooseNum(1.0, 9999.0), 400).map(_.toLong)
      .flatMap { k =>
        val q = (k * 1000003L) % 1000000000L
        Seq(k + q / 1e9, K.pln(k + q / 1e9), K.pexp(-(k % 80).toDouble / 7.0))
      }
    val rows = PortableMath.bitChunks(vs.toDF("v"), "v", "t_")
      .select(col("v"), col("t_hi"), col("t_c1"), col("t_c2"), col("t_c3"))
      .collect()
    rows.foreach { r =>
      val (v, hi) = (r.getDouble(0), r.getLong(1))
      val (c1, c2, c3) = (r.getLong(2), r.getLong(3), r.getLong(4))
      // fraction chunks are floor(f·2^27) with f ∈ [0,1): strictly < 2^27
      Seq(c1, c2, c3).foreach(c => assert(c >= 0L && c < (1L << 27)))
      val rebuilt = hi + c1 / math.pow(2, 27) + c2 / math.pow(2, 54) +
        c3 / math.pow(2, 81)
      // chunks cover mantissa bits ≥ 2^-81: rebuild within that tail
      assert(math.abs(rebuilt - v) < math.pow(2, -80), s"v=$v rebuilt=$rebuilt")
    }
  }

  test("CountTrueExpr: tallies TRUE rows through codegen, passes value through") {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import spark.implicits._
    val sc = spark.sparkContext
    val acc = sc.longAccumulator("count-true-spec")
    val df = spark.range(1000).toDF("id").repartition(7)
      .select(col("id"),
        column(graft.functions.CountTrueExpr(
          expression(col("id") % 3 === 0), acc)).alias("flag"))
    val got = df.collect()
    // pass-through semantics: flag == the wrapped predicate, row for row
    assert(got.count(_.getBoolean(1)) == (0 until 1000).count(_ % 3 == 0))
    // tally: one materialization pass counted each TRUE exactly once
    assert(acc.value == (0 until 1000).count(_ % 3 == 0))
    // contract note exercised: a SECOND action over the same frame
    // overcounts (callers may only branch on zero vs nonzero)
    df.write.format("noop").mode("overwrite").save()
    assert(acc.value >= 2L * (0 until 1000).count(_ % 3 == 0))
    // and a changeless frame stays at zero across repeated evaluation
    val acc0 = sc.longAccumulator("count-true-spec-0")
    val none = spark.range(100).toDF("id")
      .select(column(graft.functions.CountTrueExpr(
        expression(col("id") < 0), acc0)).alias("flag"))
    none.write.format("noop").mode("overwrite").save()
    none.write.format("noop").mode("overwrite").save()
    assert(acc0.value == 0L)
  }
}
