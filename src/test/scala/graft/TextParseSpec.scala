package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DatesNums, TextAnalysis, TextParse}

/** Unit specs for the scalar parsing suite (SURVEY.md §2 D/E), pinning the
  * reference's semantics gotchas J4/J5 (challenge2.py:114-198). */
class TextParseSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def parseAll(inputs: Seq[String]): Seq[Option[Double]] =
    inputs.toDF("raw")
      .select(TextParse.parseDollars(col("raw")).alias("v"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))

  test("parse_dollars: all reference branches (challenge2.py:114-157)") {
    val got = parseAll(Seq(
      "$123.4 million",      // form one
      "$1.2 billion",        // form one billion
      "$5.5 millon",         // typo tolerated
      "$123,456,789",        // form two comma
      "$3.000.000",          // form two period separators
      "$10–$15 million",     // range collapses to upper bound
      "$7.5 million[3] ",    // citation stripped
      "$300,000",
      "$42",                 // bare dollar amount
      "unknown",             // no match → null
      "N/A"))
    assert(got == Seq(
      Some(1.234e8), Some(1.2e9), Some(5.5e6), Some(1.23456789e8),
      Some(3e6), Some(1.5e7), Some(7.5e6), Some(3e5), Some(42.0),
      None, None))
  }

  test("runtime parse: hour/minute variants (challenge2.py:193-198)") {
    val got = Seq("102 minutes", "2 hours 15 minutes", "1 h 40 m", "95 min", "1 hour")
      .toDF("raw").select(TextParse.parseRuntimeMinutes(col("raw")).alias("v"))
      .collect().toSeq.map(_.getDouble(0))
    assert(got == Seq(102.0, 135.0, 100.0, 95.0, 60.0))
  }

  test("str.extract semantics: no-match is NULL, not '' (J5)") {
    val got = Seq("tt1234567x", "nope").toDF("s")
      .select(TextParse.extract(col("s"), "(tt\\d{7})").alias("v"))
      .collect().toSeq.map(r => Option(r.getString(0)))
    assert(got == Seq(Some("tt1234567"), None))
  }

  test("multi-format date parse (challenge2.py:184-189)") {
    val got = Seq("January 15, 1990", "1991-06-30", "March 1992", "1993", "garbage")
      .toDF("s").select(DatesNums.parseDateMulti(col("s")).cast("string").alias("d"))
      .collect().toSeq.map(r => Option(r.getString(0)))
    assert(got == Seq(Some("1990-01-15"), Some("1991-06-30"),
      Some("1992-03-01"), Some("1993-01-01"), None))
  }

  test("fillZeroFrom: zero-only mode leaves nulls (J2, challenge2.py:237)") {
    val df = Seq((0.0d: java.lang.Double, 7.0d: java.lang.Double),
      (null.asInstanceOf[java.lang.Double], 7.0d: java.lang.Double),
      (3.0d: java.lang.Double, 7.0d: java.lang.Double)).toDF("k", "w")
    val strict = df.select(DatesNums.fillZeroFrom(col("k"), col("w"), zeroOnly = true).alias("v"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(strict == Seq(Some(7.0), None, Some(3.0)))
    val lenient = df.select(DatesNums.fillZeroFrom(col("k"), col("w")).alias("v"))
      .collect().toSeq.map(_.getDouble(0))
    assert(lenient == Seq(7.0, 7.0, 3.0))
  }

  test("BPE kernel: chained merges, leftmost-lowest-rank order") {
    val merges = TextAnalysis.DefaultBpeMerges
    val got = Seq("the", "and", "thinking", "x", "")
      .toDF("text")
      .select(graft.functions.Bpe.bpe_tokens(col("text"), merges).alias("t"))
      .as[Seq[String]].collect().toSeq
    // "the": t+h -> th (rank 1), th+e -> the (rank 2)
    assert(got(0) == Seq("the"))
    // "and": a+n (rank 4), an+d (rank 5)
    assert(got(1) == Seq("and"))
    // "thinking": t+h, then i+n twice (leftmost first), then in+g
    assert(got(2) == Seq("th", "in", "k", "ing"))
    assert(got(3) == Seq("x"))
    assert(got(4) == Seq.empty)
    // multi-word doc concatenates word tokenizations in order
    val doc = Seq("the and").toDF("text")
      .select(graft.functions.Bpe.bpe_tokens(col("text"), merges).alias("t"))
      .as[Seq[String]].collect().head
    assert(doc == Seq("the", "and"))
  }

  test("BPE training learns the most frequent pair first, ties lexicographic") {
    val corpus = Seq("the the the the cat", "the hat").toDF("text")
    val merges = TextAnalysis.bpeTrainMerges(corpus, "text", 2)
    // (t,h) and (h,e) both occur 5x ("the" x5); tie broken by a asc
    assert(merges.head == ("h", "e"))
    // after h+e -> he, (t,he) occurs 5x, beating (a,t)'s 2
    assert(merges(1) == ("t", "he"))
  }
}
