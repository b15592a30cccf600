package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Cdc

/** CDC apply: latest change per key wins, deletes remove, inserts and
  * updates upsert, and replaying the same batch is a no-op. */
class CdcSpec extends AnyFunSuite with SparkSpec {

  private def snap = {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
  }

  private def batch = {
    import spark.implicits._
    Seq(
      (1L, "x", "U", 10L, 0L), (1L, "y", "U", 11L, 0L), // later y wins
      (2L, "b", "D", 10L, 0L),                           // delete
      (3L, "c", "I", 10L, 0L)                            // insert
    ).toDF("k", "v", "op", "ts", "tb")
  }

  private def collectKv(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

  test("latest-wins apply: update, delete, insert") {
    val next = Cdc.applyCdc(snap, batch, "k", "op", "ts", "tb")
    assert(collectKv(next) === Seq((1L, "y"), (3L, "c")))
  }

  test("replaying the same batch is idempotent") {
    val once = Cdc.applyCdc(snap, batch, "k", "op", "ts", "tb")
    val twice = Cdc.applyCdc(once, batch, "k", "op", "ts", "tb")
    assert(collectKv(twice) === collectKv(once))
  }

  test("extractCdc derives the minimal feed and round-trips through applyCdc") {
    import spark.implicits._
    val oldS = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF("k", "s", "v")
    val newS = Seq((2L, "b", 2.0), (3L, "C", 3.5), (4L, "d", 4.0)).toDF("k", "s", "v")
    val feed = Cdc.extractCdc(oldS, newS, "k")
    // 1 dropped → D, 2 unchanged → absent, 3 changed → U, 4 new → I
    val ops = feed.collect().map(r => (r.getLong(0), r.getString(3))).toMap
    assert(ops === Map(1L -> "D", 3L -> "U", 4L -> "I"))
    val applied = Cdc.applyCdc(oldS,
      feed.withColumn("ts", org.apache.spark.sql.functions.lit(1L))
        .withColumn("tb", org.apache.spark.sql.functions.lit(1L)),
      "k", "op", "ts", "tb")
    def rows(df: org.apache.spark.sql.DataFrame) = df.select("k", "s", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows(applied) === rows(newS))
  }
}
