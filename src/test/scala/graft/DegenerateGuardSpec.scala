package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Stats

/** Pins the ORACLE-CONTRACT degenerate paths (SparkEntry.oracleSql's
  * "ORACLE CONTRACT for degenerate inputs" note): ops that `raise_error`
  * on a degenerate slice fail LOUDLY engine-side while their DuckDB
  * mirrors carry no equivalent guard — that divergence is intentional
  * and these specs prove each guard actually trips, so the contract
  * note ("each guard has its own spec") stays true. One test per op the
  * round-8/9 audits called out as unpinned: runsTest, gumbelFit,
  * mdeReport, ratioMetricCI, ivWald. */
class DegenerateGuardSpec extends AnyFunSuite with SparkSpec {

  private def boomMessage(body: => Unit): String = {
    val e = intercept[Exception](body)
    // raise_error surfaces as SparkRuntimeException (USER_RAISED_EXCEPTION)
    // possibly wrapped in a SparkException cause chain — search the chain.
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
  }

  test("runsTest raises on a one-sided series (n+ = 0 or n- = 0)") {
    import spark.implicits._
    // strictly growing daily counts: day i has i rows → every delta
    // positive → zero down-moves → sigma = 0, the guarded degenerate
    val rows = for { d <- 1 to 4; _ <- 1 to d } yield s"2024-01-0$d"
    val df = rows.toDF("ds").select(to_date(col("ds")).alias("d"))
    val msg = boomMessage(Stats.runsTest(df, col("d")).collect())
    assert(msg.contains("runsTest: series is one-sided"))
  }

  test("gumbelFit raises on fewer than 2 monthly blocks") {
    import spark.implicits._
    val df = Seq("2024-03-01", "2024-03-02", "2024-03-09").toDF("ds")
      .select(to_date(col("ds")).alias("d"))
    val msg = boomMessage(Stats.gumbelFit(df, col("d")).collect())
    assert(msg.contains("gumbelFit: need at least 2 blocks"))
  }

  test("mdeReport raises when an arm has fewer than 2 rows") {
    import spark.implicits._
    val df = Seq((0, 1.0), (0, 2.0), (0, 3.0), (1, 9.0)).toDF("g", "v")
    val msg = boomMessage(
      Stats.mdeReport(df, col("g") === 1, "v").collect())
    assert(msg.contains("mdeReport: need at least 2 rows per arm"))
  }

  test("ratioMetricCI raises on a zero denominator total") {
    import spark.implicits._
    val df = Seq((1L, 3.0, 0.0), (2L, 5.0, 0.0), (3L, 1.0, 0.0))
      .toDF("u", "num", "den")
    val msg = boomMessage(
      Stats.ratioMetricCI(df, col("u"), col("num"), col("den")).collect())
    assert(msg.contains("ratioMetricCI: zero denominator total"))
  }

  test("ivWald raises on a zero first stage") {
    import spark.implicits._
    // treatment rate identical in both instrument arms → first stage 0
    val df = Seq((true, true, 1.0), (true, false, 2.0),
      (false, true, 3.0), (false, false, 4.0)).toDF("z", "t", "y")
    val msg = boomMessage(
      Stats.ivWald(df, col("z"), col("t"), col("y")).collect())
    assert(msg.contains("ivWald: zero first stage"))
  }
}
