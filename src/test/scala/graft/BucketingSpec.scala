package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

/** Bucketed layout must make the equi-join on the bucket key shuffle-free
  * and keep results identical to the plain join. */
class BucketingSpec extends AnyFunSuite with SparkSpec with AdaptiveSparkPlanHelper {

  test("join of two same-bucketed tables plans zero shuffles") {
    val o = Tables.orders(spark, sf0).select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables.lineitem(spark, sf0)
      .select(col("l_orderkey").alias("o_orderkey"), col("l_quantity"))
    Bucketing.writeBucketed(o, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(l, "b_lineitem", "o_orderkey", 4)

    val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem",
      Seq("o_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity").alias("q"))

    // force execution so AQE finalizes the plan, then walk it
    joined.write.format("noop").mode("overwrite").save()
    val plan = joined.queryExecution.executedPlan
    val shuffles = collectWithSubqueries(plan) { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty, s"expected shuffle-free plan, got:\n$plan")

    // result identity vs the unbucketed join
    val expect = o.join(l, Seq("o_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity").alias("q"))
      .orderBy("o_orderkey").collect().toSeq
    val got = joined.orderBy("o_orderkey").collect().toSeq
    assert(got === expect)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
