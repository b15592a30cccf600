package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ZOrder

/** Z-order key correctness (vs a plain bit-loop reference) and the layout
  * property the key exists for: after z-order clustering, a range filter
  * on the SECOND dimension touches a fraction of the partitions, where a
  * lexicographic sort on the first dimension touches all of them. */
class ZOrderSpec extends AnyFunSuite with SparkSpec {

  private def mortonRef(a: Long, b: Long): Long = {
    var out = 0L
    var i = 0
    while (i < 32) {
      out |= ((a >> i) & 1L) << (2 * i)
      out |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }

  test("zorderKey matches the bit-loop reference") {
    import spark.implicits._
    val vals = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 1L), (12345L, 67890L),
      (0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL), (0xABCDL, 0x1234L))
    val got = vals.toDF("a", "b")
      .select(ZOrder.zorderKey(col("a"), col("b"))).collect().map(_.getLong(0))
    val want = vals.map { case (a, b) => mortonRef(a, b) }
    assert(got.toSeq === want)
  }

  test("z-order layout prunes files on the second dimension; lex sort does not") {
    import spark.implicits._
    import java.nio.file.Files
    // 256x256 grid written as 16 files: z-order gives each file a ~64x64
    // block, so y < 32 lives in ~4 files' min/max range; an x-sort
    // spreads every y value across all 16. Measured on the MATERIALIZED
    // layout (a filter on the in-memory frame would be pushed below the
    // repartition and defeat the measurement).
    val grid = (0 until 256).flatMap(x => (0 until 256).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    def filesServing(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val dir = Files.createTempDirectory("graft-zorder").toString
      df.write.mode("overwrite").parquet(dir)
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .map(_.getPath)
      val serving = files.count { f =>
        spark.read.parquet(f).agg(min(col("y"))).head.getLong(0) < 32
      }
      (serving, files.length)
    }
    val (zServing, zTotal) = filesServing(ZOrder.clusterByZorder(grid, "x", "y", 16))
    val (lexServing, lexTotal) =
      filesServing(grid.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    assert(zTotal === 16 && lexTotal === 16)
    assert(lexServing === 16)
    assert(zServing <= 8, s"z-order should confine y<32 to few files, got $zServing")
  }
}
