package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping: sort
  * a table by the bit-interleaving of two key columns so that file-level
  * min/max statistics stay narrow on BOTH dimensions — a range filter on
  * EITHER column then prunes most files, where a lexicographic sort only
  * serves its leading column. The standard layout trick for 100 TB fact
  * tables queried along more than one axis (public technique from the
  * Morton-curve literature; Delta/Iceberg expose the same idea as
  * OPTIMIZE ZORDER BY).
  *
  * The interleave is a pure Column expression (shift/mask bit spreading,
  * no UDF, stays in whole-stage codegen), so the key costs nothing at
  * scan time and the layout is produced by a plain
  * repartitionByRange + sortWithinPartitions — one range shuffle, the
  * same cost as any global sort.
  */
object ZOrder {

  /** Spread the low 32 bits of a non-negative value so bit i lands at
    * position 2i (the classic Morton magic-mask ladder). */
  private[graft] def spreadBits(c: Column): Column = {
    var x = c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
    x
  }

  /** 64-bit Morton key of two non-negative 32-bit dimensions: bit i of
    * `a` → position 2i, bit i of `b` → position 2i+1. Callers with
    * signed/wide/skewed dimensions should rank or bucket them into
    * [0, 2^32) first — interleaving ranks rather than raw values is also
    * what keeps the curve balanced under skew. */
  def zorderKey(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Lay `df` out in `numFiles` z-ordered ranges (one range shuffle, then
    * an in-partition sort — exactly a global sort by the Morton key). */
  def clusterByZorder(df: DataFrame, a: String, b: String,
                      numFiles: Int): DataFrame = {
    val keyed = df.withColumn("__z", zorderKey(col(a), col(b)))
    keyed.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z").drop("__z")
  }

  /** The DuckDB mirror of `spreadBits`/`zorderKey` as SQL text, so oracle
    * queries can reproduce the key bit-for-bit. */
  def spreadSql(e: String): String = {
    def step(x: String, s: Int, m: Long) = s"(($x | ($x << $s)) & $m)"
    val x0 = s"(CAST($e AS BIGINT) & ${0xFFFFFFFFL})"
    val x1 = step(x0, 16, 0x0000FFFF0000FFFFL)
    val x2 = step(x1, 8, 0x00FF00FF00FF00FFL)
    val x3 = step(x2, 4, 0x0F0F0F0F0F0F0F0FL)
    val x4 = step(x3, 2, 0x3333333333333333L)
    step(x4, 1, 0x5555555555555555L)
  }

  def zorderSql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"
}
