package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Tpch

/** Plan-shape assertions for the TPC-H suite: the value checks live in
  * the DuckDB oracle gate; these pin the SCALE properties — pushdown
  * reaching the parquet scan, narrow read schemas, broadcast dims, and
  * single-exchange aggregation — so a regression that keeps values right
  * but wrecks the 100 TB plan fails loudly. */
class TpchSpec extends AnyFunSuite with SparkSpec with AdaptiveSparkPlanHelper {

  private def executedPlan(df: DataFrame) = {
    df.write.format("noop").mode("overwrite").save() // finalize AQE
    df.queryExecution.executedPlan
  }

  test("Q6: predicate and projection push into the lineitem scan") {
    val plan = executedPlan(Tpch.q6(spark, sf0))
    val scans = collectWithSubqueries(plan) { case s: FileSourceScanExec => s }
    assert(scans.size === 1)
    val scan = scans.head
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("l_shipdate"), s"no shipdate pushdown in: $pushed")
    // only the four referenced columns are read, not the 11-column table
    assert(scan.schema.fieldNames.toSet ===
      Set("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"))
  }

  test("Q1: one data shuffle (partial agg map-side; the only other exchange " +
      "is the 6-row output sort)") {
    val plan = executedPlan(Tpch.q1(spark, sf0))
    val shuffles = collectWithSubqueries(plan) { case s: ShuffleExchangeExec => s }
    val hashShuffles = shuffles.filter(_.outputPartitioning.toString.contains("hashpartitioning"))
    assert(hashShuffles.size === 1, s"expected single hash exchange, got:\n$plan")
    assert(shuffles.size <= 2)
  }

  test("Q5: six-table star join broadcasts the small sides, no cartesian") {
    val plan = executedPlan(Tpch.q5(spark, sf0))
    val bhj = collectWithSubqueries(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 2, s"expected broadcast dims, got:\n$plan")
    assert(!plan.toString.contains("CartesianProduct"))
  }

  test("Q2: one row per qualifying part (window tie-break is total)") {
    val rows = Tpch.q2(spark, sf0).collect()
    val parts = rows.map(_.getLong(3))
    assert(parts.distinct.length === parts.length)
  }

  test("Q21: blamed suppliers are sole-late on multi-supplier finished orders") {
    // recompute the invariant from the raw tables with independent code
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf0)
      .join(Tables.orders(spark, sf0).filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")).alias("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byOrder = li.groupBy(_._1).toSeq.map { case (_, rows) =>
      val supps = rows.map(_._2).distinct
      val lateSupps = rows.filter(_._3).map(_._2).distinct
      (supps.length, lateSupps)
    }
    val expected = byOrder
      .filter { case (nSupp, lateSupps) => nSupp >= 2 && lateSupps.length == 1 }
      .flatMap(_._2).groupBy(x => x).map { case (sk, xs) => (sk, xs.size.toLong) }
    val suppName = Tables.supplier(spark, sf0).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val expectedByName = expected.map { case (sk, n) => (suppName(sk), n) }
    val got = Tpch.q21(spark, sf0).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // q21 is top-20; every returned row must match the recomputed count
    got.foreach { case (name, n) =>
      assert(expectedByName.get(name).contains(n), s"mismatch for $name")
    }
    assert(got.nonEmpty)
  }
}
