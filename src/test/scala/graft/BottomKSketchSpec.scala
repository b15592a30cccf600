package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BottomKSketch.bottom_k_sketch

/** The bottom-k sketch must equal sort-distinct-take-k exactly, survive
  * partial/merge aggregation across many partitions, and ignore nulls. */
class BottomKSketchSpec extends AnyFunSuite with SparkSpec {

  test("sketch == sorted distinct bottom-k, through partial aggregation") {
    import spark.implicits._
    val rows = (1 to 2000).map(i => ((i % 5).toString, ((i * 7919) % 613).toLong))
    val df = rows.toDF("g", "v").repartition(13) // force partial + merge
    val got = df.groupBy("g").agg(bottom_k_sketch(col("v"), 6).alias("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val expect = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).distinct.sorted.take(6)
    }
    assert(got === expect)
  }

  test("k larger than distinct count returns everything; nulls ignored") {
    import spark.implicits._
    val df = Seq(Some(3L), Some(1L), None, Some(3L), Some(2L))
      .toDF("v")
    val sk = df.agg(bottom_k_sketch(col("v"), 100).alias("sk"))
      .head().getSeq[Long](0).toSeq
    assert(sk === Seq(1L, 2L, 3L))
  }

  test("KMV cardinality estimate is in a sane band") {
    import spark.implicits._
    val n = 5000
    // hash32-style spread via a multiplicative hash into positive longs
    val df = (1 to n).map(i => (i * 2654435761L) & 0x7fffffffL).toDF("h")
    val k = 64
    val sk = df.agg(bottom_k_sketch(col("h"), k).alias("sk"))
      .head().getSeq[Long](0).toSeq
    // KMV estimator: (k-1) * M / kthMin, M = hash range
    val est = (k - 1).toDouble * 0x7fffffffL.toDouble / sk.last.toDouble
    assert(est > n * 0.5 && est < n * 2.0, s"estimate $est for true $n")
  }
}
