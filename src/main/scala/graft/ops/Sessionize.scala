package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the lag + running-sum formulation:
  * a session boundary is an event whose gap from the previous event (per
  * key) exceeds the threshold; the running count of boundaries is the
  * session sequence number. One window pass (single shuffle on the key),
  * the batch twin of streaming/EventsStream.sessionize. */
object Sessionize {

  /** Adds `session_seq` (1-based per key). `tieCol` makes the per-key
    * event order total when timestamps collide. */
  def byGap(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
            gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    val prev = lag(col(tsCol), 1).over(w)
    val isBreak = when(prev.isNull ||
      unix_millis(col(tsCol)) - unix_millis(prev) > gapMinutes * 60000L, 1)
      .otherwise(0)
    df.withColumn("session_seq",
      sum(isBreak).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
  }

  /** Collapses sessionized events into one row per session. */
  def sessions(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
               gapMinutes: Int): DataFrame =
    byGap(df, keyCol, tsCol, tieCol, gapMinutes)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).alias("n_events"),
        min(col(tsCol)).alias("session_start"),
        max(col(tsCol)).alias("session_end"))
}
