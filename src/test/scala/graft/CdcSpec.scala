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
}
