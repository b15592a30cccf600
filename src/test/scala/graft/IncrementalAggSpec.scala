package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IncrementalAgg

/** Incremental aggregate maintenance must equal the full recompute for
  * any batch split and any merge association order. */
class IncrementalAggSpec extends AnyFunSuite with SparkSpec {

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    IncrementalAgg.finish(df).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap

  test("three-way split merge equals the full recompute") {
    val o = Tables.orders(spark, sf0)
    val full = IncrementalAgg.aggregate(o, "o_custkey", "o_totalprice")
    val parts = Seq(
      o.filter(col("o_orderkey") % 3 === 0),
      o.filter(col("o_orderkey") % 3 === 1),
      o.filter(col("o_orderkey") % 3 === 2)
    ).map(b => IncrementalAgg.aggregate(b, "o_custkey", "o_totalprice"))
    assert(asMap(IncrementalAgg.merge(parts)) === asMap(full))
  }

  test("merge is associative: (a+b)+c == a+(b+c)") {
    val o = Tables.orders(spark, sf0)
    val Seq(a, b, c) = Seq(0, 1, 2).map(i =>
      IncrementalAgg.aggregate(o.filter(col("o_orderkey") % 3 === i), "o_custkey", "o_totalprice"))
    val left = IncrementalAgg.merge(Seq(IncrementalAgg.merge(Seq(a, b)), c))
    val right = IncrementalAgg.merge(Seq(a, IncrementalAgg.merge(Seq(b, c))))
    assert(asMap(left) === asMap(right))
  }

  test("a batch with unseen keys extends the state") {
    import spark.implicits._
    val b1 = IncrementalAgg.aggregate(Seq((1L, 10.0), (1L, 20.0)).toDF("k", "v"), "k", "v")
    val b2 = IncrementalAgg.aggregate(Seq((2L, 5.0)).toDF("k", "v"), "k", "v")
    val got = asMap(IncrementalAgg.merge(Seq(b1, b2)))
    assert(got === Map(1L -> ((2L, 30.0, 15.0)), 2L -> ((1L, 5.0, 5.0))))
  }
}
