package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JaroWinkler.jaro_winkler
import graft.functions.JaroWinklerKernel

/** The Jaro-Winkler kernel against textbook values and the column API
  * against the kernel (codegen path ≡ static forwarder). */
class JaroWinklerSpec extends AnyFunSuite with SparkSpec {

  test("kernel matches the textbook values") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def jw(a: String, b: String) = JaroWinklerKernel.similarity(u(a), u(b))
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-12)
    assert(math.abs(jw("duane", "dwayne") - 0.8400000000000001) < 1e-12)
    // Transposed pair below the 0.7 boost threshold: no prefix boost.
    assert(math.abs(jw("crate", "trace") - 0.7333333333333334) < 1e-12)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("", "abc") === 0.0 && jw("ab", "") === 0.0)
    assert(jw("a", "b") === 0.0)
  }

  test("SQL surface: jaro_winkler(a, b) resolves through the registry") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT round(jaro_winkler('martha', 'marhta'), 6) AS jw").collect().head
    assert(math.abs(got.getDouble(0) - 0.961111) < 1e-9)
  }

  test("column API runs the kernel inside the plan and keeps nulls null") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("crate", "trace"), (null, "x"))
      .toDF("a", "b")
    val got = df.select(jaro_winkler(col("a"), col("b")).alias("jw"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(math.abs(got(0).get - 0.9611111111111111) < 1e-12)
    assert(math.abs(got(1).get - 0.7333333333333334) < 1e-12)
    assert(got(2).isEmpty)
  }
}
