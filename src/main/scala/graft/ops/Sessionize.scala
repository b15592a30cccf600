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

  /** Time-series resample with forward fill: per key, an hourly grid from
    * the key's first to last observation, each grid point carrying the
    * most recent observed value at or before it. The standard gap-fill a
    * metrics/feature pipeline needs before windowed math — irregular
    * events become an aligned series.
    *
    * Shape: grid points are generated per key as an array expression off
    * a tiny (key, span) aggregate — the grid fan-out never shuffles raw
    * events twice; one union + ONE window pass (single exchange on the
    * key) computes the fill via last(ignoreNulls) over (time, then
    * observations-before-grid-points, then `tieCol`) — the explicit total
    * order makes same-instant collisions deterministic on any engine and
    * partitioning. Grid points before a key's first observation are
    * dropped (nothing to carry forward). */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
              tieCol: String, stepHours: Int = 1): DataFrame = {
    val span = df.groupBy(col(keyCol)).agg(
      date_trunc("hour", min(col(tsCol))).alias("__t0"),
      date_trunc("hour", max(col(tsCol))).alias("__t1"))
    val grid = span.select(col(keyCol),
      explode(expr(s"sequence(__t0, __t1, interval $stepHours hour)"))
        .alias("__gts"))
      .select(col(keyCol), col("__gts"),
        lit(null).cast("double").alias("__v"), lit(1).alias("__flag"),
        lit(Long.MaxValue).alias("__tie"))
    val actual = df.select(col(keyCol), col(tsCol).alias("__gts"),
      col(valCol).cast("double").alias("__v"), lit(0).alias("__flag"),
      col(tieCol).cast("long").alias("__tie"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__gts").asc, col("__flag").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    actual.unionAll(grid)
      .withColumn("__fill", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__flag") === 1 && col("__fill").isNotNull)
      .select(col(keyCol), col("__gts").alias("bucket_ts"),
        col("__fill").alias(valCol))
  }

  /** Debounce — drop an event that follows the previous event of the same
    * key within `minGapMs` (double-click / duplicate-beacon suppression).
    * Gap semantics: each event is judged against its RAW predecessor, not
    * the last survivor — the one-window (single key-shuffle) formulation.
    * (Last-survivor chaining would need a sequential scan per key; if a
    * steady sub-gap drumbeat must collapse to one event, sessionize with
    * `byGap` and keep each session's first row instead.) */
  def debounce(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
               minGapMs: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    val prev = lag(col(tsCol), 1).over(w)
    df.withColumn("__gap", unix_millis(col(tsCol)) - unix_millis(prev))
      .filter(col("__gap").isNull || col("__gap") > minGapMs)
      .drop("__gap")
  }
}
