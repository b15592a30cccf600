package graft

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalactic.Tolerance
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, MinHashSig, ParseDollarsKernel, SimHash, TextStats}
import graft.ops.TextParse

/** The native Catalyst ParseDollarsExpr must be value-equivalent to the
  * `when`-chain TextParse.parseDollars on every input, and must stay inside
  * whole-stage codegen. */
class ParseDollarsExprSpec extends AnyFunSuite with SparkSpec with Tolerance {

  private val cases: Seq[(String, Option[Double])] = Seq(
    "$123.4 million" -> Some(1.234e8),
    "$1.2 billion" -> Some(1.2e9),
    "$123,456,789" -> Some(1.23456789e8),
    "$123.456.789" -> Some(1.23456789e8),
    "$ 5 millon" -> Some(5e6),        // reference tolerates the typo
    "$3.9 Billion" -> Some(3.9e9),
    "$12[3] million" -> Some(12e6),   // citation stripped first
    "$10–$15 million" -> Some(15e6),  // range collapses to upper bound
    "$42" -> Some(42.0),
    "$7.5" -> Some(7.5),
    "no money here" -> None,
    "" -> None,
  )

  test("kernel matches hand-computed reference semantics") {
    cases.foreach { case (in, want) =>
      val got = Option(ParseDollarsKernel.parse(
        org.apache.spark.unsafe.types.UTF8String.fromString(in)))
        .map(_.doubleValue())
      assert(got === want, s"input: '$in'")
    }
    assert(ParseDollarsKernel.parse(null) == null)
  }

  private def assertEquivalent(inputs: Seq[String]): Unit = {
    import spark.implicits._
    val rows = inputs.toDF("raw").select(
      col("raw"),
      GraftFunctions.parse_dollars(col("raw")).alias("native"),
      TextParse.parseDollars(col("raw")).alias("chain")).collect()
    rows.foreach { r =>
      val in = r.getString(0)
      assert(r.isNullAt(1) === r.isNullAt(2), s"null mismatch on '$in'")
      if (!r.isNullAt(1)) {
        val (n, c) = (r.getDouble(1), r.getDouble(2))
        assert(n === c +- math.max(math.abs(c) * 1e-12, 1e-12), s"mismatch on '$in'")
      }
    }
  }

  test("native expression ≡ when-chain on fixtures and edge cases") {
    assertEquivalent(cases.map(_._1))
  }

  test("property: equivalence over 500 generated money strings") {
    val gen = for {
      a <- Gen.chooseNum(0, 999999)
      f <- Gen.chooseNum(0, 99)
      u <- Gen.oneOf("million", "billion", "millon", "m", "")
      sp <- Gen.oneOf("", " ", "  ")
      withFrac <- Gen.oneOf(true, false)
      prefix <- Gen.oneOf("", "about ", "[12] ")
    } yield s"$prefix$$$a${if (withFrac) s".$f" else ""}$sp$u"
    val samples = Gen.listOfN(500, gen)
      .pureApply(Gen.Parameters.default, Seed(42L))
    assertEquivalent(samples)
  }

  test("expression participates in whole-stage codegen") {
    // spark.range (not a local Seq): ConvertToLocalRelation would fold a
    // literal table into a LocalTableScan and skip codegen entirely.
    val df = spark.range(1, 6)
      .select(concat(lit("$"), col("id"), lit(" million")).alias("raw"))
      .select(GraftFunctions.parse_dollars(col("raw")).alias("v"))
    val hasWsc = df.queryExecution.executedPlan.exists {
      case _: WholeStageCodegenExec => true
      case _ => false
    }
    assert(hasWsc, df.queryExecution.executedPlan.toString)
    assert(df.orderBy("v").head().getDouble(0) === 1e6)
  }

  test("SQL registration works") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq("$2 billion").toDF("raw").createOrReplaceTempView("pd_t")
    assert(spark.sql("SELECT parse_dollars(raw) AS v FROM pd_t").head().getDouble(0) === 2e9)
    // normalize_nfc registers through the same injection list
    Seq("café").toDF("raw").createOrReplaceTempView("nfc_t")
    assert(spark.sql("SELECT normalize_nfc(raw) AS v FROM nfc_t")
      .head().getString(0) == "caf\u00e9")
  }

  test("kernel SQL surface: every registered function equals its Column twin") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, split}
    GraftFunctions.register(spark)
    Seq("the quick brown fox jumps over the lazy dog")
      .toDF("text").createOrReplaceTempView("kfn_t")
    val sql = spark.sql(
      "SELECT minhash_sig(split(text, ' '), 4) AS mh, " +
        "shingle_minhash_sig(split(text, ' '), 3, 4) AS smh, " +
        "shingle_hashes(split(text, ' '), 3) AS sh, " +
        "simhash(split(text, ' '), 16) AS s16, " +
        "top_ngram_best(text, 2) AS tg FROM kfn_t").head()
    val api = spark.table("kfn_t").select(
      MinHashSig.minhash_sig(split(col("text"), " "), 4).alias("mh"),
      MinHashSig.shingle_minhash_sig(split(col("text"), " "), 3, 4).alias("smh"),
      MinHashSig.shingle_hashes(split(col("text"), " "), 3).alias("sh"),
      SimHash.simhash(split(col("text"), " "), 16).alias("s16"),
      TextStats.top_ngram_best(col("text"), 2).alias("tg"))
      .head()
    assert(sql.toSeq == api.toSeq)
    // a non-literal kernel param must fail loudly, not misbehave
    val err = intercept[Exception](
      spark.sql("SELECT simhash(split(text, ' '), length(text)) FROM kfn_t").collect())
    def mentions(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("INT literal")) || mentions(t.getCause))
    assert(mentions(err), s"unexpected error: $err")
  }

  test("custom aggregates register as SQL functions and match the Column API") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    GraftFunctions.register(spark)
    val rows = Seq.fill(30)("hot") ++ (1 to 10).map(i => s"c$i")
    rows.toDF("item").createOrReplaceTempView("agg_t")
    val sqlRow = spark.sql(
      "SELECT misra_gries(item, 4) AS mg, " +
        "bottom_k_sketch(xxhash64(item), 5) AS bk FROM agg_t").head()
    val apiRow = spark.table("agg_t").agg(
      graft.functions.MisraGries.misra_gries(col("item"), 4).alias("mg"),
      graft.functions.BottomKSketch.bottom_k_sketch(
        org.apache.spark.sql.functions.xxhash64(col("item")), 5).alias("bk"))
      .head()
    assert(sqlRow.getSeq[String](0) === apiRow.getSeq[String](0))
    assert(sqlRow.getSeq[Long](1) === apiRow.getSeq[Long](1))
    assert(sqlRow.getSeq[String](0).contains("hot"))
    // aggregates compose with GROUP BY through the analyzer wrapping
    val grouped = spark.sql(
      "SELECT item = 'hot' AS is_hot, misra_gries(item, 2) AS mg " +
        "FROM agg_t GROUP BY 1 ORDER BY 1").collect()
    assert(grouped.length === 2)
  }
}
