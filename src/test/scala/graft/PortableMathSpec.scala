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
}
