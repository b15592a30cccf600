package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scd

/** SCD Type-2: history build compresses no-op changes and assigns
  * half-open effective ranges; the incremental apply closes changed
  * current rows, passes unchanged ones through, opens new keys, and
  * fails loudly on a duplicate-key update batch. */
class ScdSpec extends AnyFunSuite with SparkSpec {

  private def log = {
    import spark.implicits._
    Seq(
      ("A", "x", 1L, 10L), ("A", "x", 2L, 11L), ("A", "y", 3L, 12L),
      ("B", "p", 1L, 13L)
    ).toDF("k", "v", "ts", "tb")
  }

  test("scd2Build compresses no-ops and versions changes") {
    val dim = Scd.scd2Build(log, "k", "v", "ts", "tb")
      .select("k", "v", "effective_from", "effective_to", "is_current")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).sorted
    assert(dim.toSeq === Seq(
      ("A", "x", 1L, 3L, false),
      ("A", "y", 3L, -1L, true),
      ("B", "p", 1L, -1L, true)))
  }

  test("scd2Apply closes changed, keeps unchanged, births new keys") {
    val dim = Scd.scd2Build(log, "k", "v", "ts", "tb").drop("tb")
    import spark.implicits._
    val updates = Seq(
      ("A", "z", 9L), // change → close y@9, open z@9
      ("B", "p", 9L), // no-op → untouched
      ("C", "q", 9L)  // new key → first version
    ).toDF("k", "v", "ts")
    val next = Scd.scd2Apply(dim, updates, "k", "v", "ts")
      .select("k", "v", "effective_from", "effective_to", "is_current")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).sorted
    assert(next.toSeq === Seq(
      ("A", "x", 1L, 3L, false),
      ("A", "y", 3L, 9L, false),
      ("A", "z", 9L, -1L, true),
      ("B", "p", 1L, -1L, true),
      ("C", "q", 9L, -1L, true)))
  }

  test("pointInTime attaches the version covering each fact timestamp") {
    import spark.implicits._
    val dim = Scd.scd2Build(log, "k", "v", "ts", "tb")
      .select(col("k"), col("v").alias("ver"), col("effective_from"), col("effective_to"))
    // A: x on [1,3), y on [3,∞); B: p on [1,∞)
    val fact = Seq((100L, "A", 0L), (101L, "A", 2L), (102L, "A", 3L),
      (103L, "A", 9L), (104L, "B", 5L)).toDF("fid", "fk", "fts")
    val got = Scd.pointInTime(fact, "fk", "fts", dim, "k")
      .select("fid", "ver").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    // fid 100 precedes A's history → dropped; 102 lands exactly on the
    // boundary → new version
    assert(got.toSeq === Seq((101L, "x"), (102L, "y"), (103L, "y"), (104L, "p")))
  }

  test("scd2Apply rejects duplicate update keys loudly") {
    val dim = Scd.scd2Build(log, "k", "v", "ts", "tb").drop("tb")
    import spark.implicits._
    val dup = Seq(("A", "z", 9L), ("A", "w", 9L)).toDF("k", "v", "ts")
    val e = intercept[Exception] {
      Scd.scd2Apply(dim, dup, "k", "v", "ts").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("duplicate update key")),
      s"unexpected error: $e")
  }
}
