package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Cleaning

/** Dictionary encoding: ids are dense, ordered, stable, and reversible
  * through the shipped dictionary; nulls encode to null. */
class DictEncodeSpec extends AnyFunSuite with SparkSpec {

  test("encode is reversible via the dictionary and nulls stay null") {
    import spark.implicits._
    val df = Seq(Some("b"), Some("a"), Some("b"), None, Some("c"))
      .toDF("v").withColumn("row", monotonically_increasing_id())
    val (enc, dict) = Cleaning.dictEncode(df, "v", "vid")

    val ids = dict.orderBy("vid").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(ids.toSeq === Seq(("a", 1L), ("b", 2L), ("c", 3L)))

    val decoded = enc.join(dict.withColumnRenamed("v", "v2"), Seq("vid"), "left")
      .select(col("v"), col("v2"))
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1))))
    assert(decoded.forall { case (orig, back) => orig == back })

    val nullRows = enc.filter(col("v").isNull).select("vid").collect()
    assert(nullRows.length === 1 && nullRows.head.isNullAt(0))
  }

  test("maxDict guard fails loudly on a high-cardinality column") {
    import spark.implicits._
    val df = (1 to 100).map(i => s"v$i").toDF("v")
    val (enc, _) = Cleaning.dictEncode(df, "v", "vid", maxDict = 10)
    val err = intercept[Exception] { enc.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("dictEncode(v)")),
      s"expected the maxDict raise_error, got: $err")
    // At or under the cap the same data encodes fine.
    val (ok, dict) = Cleaning.dictEncode(df, "v", "vid", maxDict = 100)
    assert(ok.count() === 100 && dict.count() === 100)
  }
}
