package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key additive state table
  * (count + exact DECIMAL sum) and fold in delta batches WITHOUT
  * rescanning history — the materialized-view maintenance pattern for
  * append-mostly facts. A 100 TB table whose daily increment is 100 GB
  * costs one increment-sized aggregation plus a state-sized merge per
  * day, instead of a full recompute; pair the state table with a
  * bucketed layout on the key (sources/Bucketing) and the merge's
  * shuffle drops to the delta side only.
  *
  * The state carries ONLY additive moments (n, Σ) pinned to a fixed
  * DECIMAL schema, so merge is associative and commutative — batch
  * arrival order cannot change a single bit of the result (spec-checked),
  * which is what makes backfills and replays safe. Derived values (mean
  * here; variance would add Σx²) appear only in `finish`, never in
  * state.
  */
object IncrementalAgg {

  private val SumType = "decimal(28,2)"

  /** Aggregate one batch into state rows (key, n, s). */
  def aggregate(batch: DataFrame, key: String, valueCol: String): DataFrame =
    batch.groupBy(col(key))
      .agg(count(lit(1)).alias("n"),
        sum(col(valueCol).cast("decimal(18,2)")).cast(SumType).alias("s"))

  /** Merge any number of state tables (additive moments sum). */
  def merge(states: Seq[DataFrame]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(col(states.head.columns.head))
      .agg(sum(col("n")).alias("n"), sum(col("s")).cast(SumType).alias("s"))

  /** Surface the maintained state as the user-facing aggregate. */
  def finish(state: DataFrame): DataFrame =
    state.select(col(state.columns.head), col("n"),
      col("s").cast("double").alias("total"),
      round(col("s").cast("double") / col("n"), 6).alias("mean"))
}
