package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Joins

/** As-of join semantics: latest right row with rightTs ≤ leftTs per key;
  * equal timestamps match; no prior right row → null payload. */
class AsOfJoinSpec extends AnyFunSuite with SparkSpec {

  test("asOf picks latest prior value, equal ts eligible, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", 100L),  // after r@50 → 5.0
      (2L, "u1", 50L),   // equal ts  → 5.0
      (3L, "u1", 10L),   // before everything → null
      (4L, "u2", 100L),  // different key, after r@90 → 9.0
      (5L, "u3", 100L),  // key with no right rows → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      ("u1", 50L, 5.0),
      ("u1", 200L, 7.0), // future row must never match
      ("u2", 90L, 9.0),
    ).toDF("user_id", "ts", "v")

    val got = Joins.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("v"))
      .orderBy("event_id")
      .select("event_id", "v")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

    assert(got === Map(
      1L -> Some(5.0), 2L -> Some(5.0), 3L -> None, 4L -> Some(9.0), 5L -> None))
  }

  test("asOf carries multiple payload columns and preserves left row count") {
    import spark.implicits._
    val left = (1 to 20).map(i => (i.toLong, "k", i.toLong * 10)).toDF("id", "k", "ts")
    val right = Seq(("k", 35L, 1.0, "a"), ("k", 95L, 2.0, "b")).toDF("k", "ts", "x", "y")
    val out = Joins.asOf(left, right, Seq("k"), "ts", "ts", Seq("x", "y"))
    assert(out.count() === 20)
    val at40 = out.filter(col("ts") === 40).head()
    assert(at40.getDouble(out.columns.indexOf("x")) === 1.0)
    assert(at40.getString(out.columns.indexOf("y")) === "a")
    val at100 = out.filter(col("ts") === 100).head()
    assert(at100.getDouble(out.columns.indexOf("x")) === 2.0)
    assert(at100.getString(out.columns.indexOf("y")) === "b")
    assert(out.filter(col("ts") === 30).head().isNullAt(out.columns.indexOf("x")))
  }
}
