package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Constraints._

/** Data-quality report: planted violations are counted exactly, clean
  * checks pass, and the row-local checks share a single scan. */
class ConstraintsSpec extends AnyFunSuite with SparkSpec
    with AdaptiveSparkPlanHelper {

  private def dirty = {
    import spark.implicits._
    Seq(
      (Some(1L), 10.0, "ok"),
      (Some(1L), -5.0, "ok"),   // dup key + below range
      (None, 20.0, "ok"),       // null key
      (Some(2L), 999.0, "bad")  // failing predicate
    ).toDF("id", "amount", "status")
  }

  test("planted violations are counted exactly") {
    import spark.implicits._
    val dim = Seq(1L).toDF("k") // id=2 dangles
    val got = report(dirty, Seq(
      NotNull("id"),
      InRange("amount", 0.0, 100.0),
      Satisfies("status_ok", col("status") === "ok"),
      Unique(Seq("id")),
      RefIntegrity("id", dim, "k")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got === Seq(
      ("in_range(amount,0.0,100.0)", 2L, false),   // -5 and 999
      ("not_null(id)", 1L, false),
      // id=2 dangles; the NULL id is NOT an FK violation (ANSI
      // semantics — it's NotNull's job) and must not be counted.
      ("ref_integrity(id)", 1L, false),
      ("satisfies(status_ok)", 1L, false),
      ("unique(id)", 1L, false)))                  // one extra row of id=1
  }

  test("ref integrity ignores null FKs even when the dim key has nulls") {
    import spark.implicits._
    // A NULL in the dim key column made the previous NOT-IN-shaped
    // semantics collapse to zero violations for every row; the anti-join
    // with null FKs filtered must still count the dangling key.
    val dim = Seq(Some(1L), None).toDF("k")
    val got = report(dirty, Seq(RefIntegrity("id", dim, "k")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("ref_integrity(id)", 1L)))
  }

  test("clean data passes every check") {
    import spark.implicits._
    val clean = Seq((1L, 5.0), (2L, 6.0)).toDF("id", "amount")
    val got = report(clean, Seq(NotNull("id"), InRange("amount", 0.0, 10.0),
      Unique(Seq("id"))))
    assert(got.filter(!col("pass")).count() === 0)
  }

  test("row-local checks fold into one scan of the table") {
    val df = Tables.orders(spark, sf0)
    val rep = report(df, Seq(
      NotNull("o_custkey"),
      InRange("o_totalprice", 0.0, 1e9),
      Satisfies("status", col("o_orderstatus").isNotNull)))
    rep.write.format("noop").mode("overwrite").save()
    val scans = collectWithSubqueries(rep.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.size === 1, "adding row-local checks must not add scans")
  }
}
