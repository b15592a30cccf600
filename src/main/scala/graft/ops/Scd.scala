package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history building: turn a change log
  * into versioned dimension rows with effective ranges — the standard
  * warehouse pattern for tracking attribute history (Kimball SCD2; the
  * reference's pandas pipeline has no history tracking at all, this is
  * engine breadth for the load side).
  *
  * Scale shape: everything is per-key window work over the change log —
  * one shuffle on the dimension key, then two narrow window passes
  * (change compression + range assignment) over the SAME partitioning
  * (Catalyst reuses the exchange for stacked windows with identical
  * partition/order specs). No self-joins, no driver state. At 100 TB of
  * change log the cost is the one key shuffle, which is the lower bound
  * for any per-key history computation.
  */
object Scd {

  /** Build the SCD2 table from a change log.
    *
    * @param log       change events, one row per observation
    * @param key       dimension key column
    * @param attr      tracked attribute (a version closes when it changes)
    * @param ts        observation time
    * @param tieBreak  total-order tie break within equal timestamps —
    *                  REQUIRED for determinism: without it, same-instant
    *                  changes would version in partition-arrival order
    *
    * Consecutive observations with an unchanged attribute are compressed
    * away (no-op changes produce no version). `effective_to` is the next
    * version's `effective_from`, open (null) for the current version.
    */
  def scd2Build(log: DataFrame, key: String, attr: String,
                ts: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    log
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .withColumn("__first", row_number().over(w) === 1)
      // the first observation always opens a version; afterwards only a
      // real change does (null-safe compare keeps null attrs versionable)
      .filter(col("__first") || !(col(attr) <=> col("__prev")))
      .withColumn("effective_from", col(ts))
      .withColumn("effective_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .drop("__prev", "__first")
  }

  /** Apply one update batch to an existing SCD2 dimension: close current
    * versions whose attribute changed, append the new versions, open
    * first versions for unseen keys.
    *
    * `updates` must carry at most one row per key — a violated
    * precondition would silently fork history, so it fails the job loudly
    * (one narrow window over the small batch). A null updated attribute
    * is a real value (null-safe compare), not a tombstone. Closed history
    * rows pass through untouched — at scale this merges only the CURRENT
    * slice (pair with a layout partitioned on is_current) while the
    * closed majority of the table is never rewritten.
    */
  def scd2Apply(dim: DataFrame, updates: DataFrame, key: String, attr: String,
                ts: String): DataFrame = {
    // the guard wraps the carried values themselves (same pattern as the
    // broadcast caps elsewhere) so column pruning cannot drop it: any
    // consumption of a duplicate key's update fails the job
    val dupW = Window.partitionBy(key)
    val u = updates
      .withColumn("__n", count(lit(1)).over(dupW))
      .select(col(key),
        when(col("__n") > 1, raise_error(concat(
            lit("scd2Apply: duplicate update key "), col(key).cast("string"))))
          .otherwise(col(attr)).alias("__new_attr"),
        when(col("__n") > 1, raise_error(lit("scd2Apply: duplicate update key")))
          .otherwise(col(ts)).alias("__new_ts"))
      .withColumn("__upd", lit(true))
    val current = dim.filter(col("is_current")).withColumn("__cur", lit(true))
    val closed = dim.filter(!col("is_current"))
    val joined = current.join(u, Seq(key), "full_outer")
    def clean(df: DataFrame) =
      df.drop("__new_attr", "__new_ts", "__cur", "__upd")
    val unchanged = clean(joined.filter(col("__cur").isNotNull &&
      (col("__upd").isNull || (col(attr) <=> col("__new_attr")))))
    val toClose = joined.filter(col("__cur").isNotNull && col("__upd").isNotNull &&
      !(col(attr) <=> col("__new_attr")))
    val closedNow = clean(toClose
      .withColumn("effective_to", col("__new_ts"))
      .withColumn("is_current", lit(false)))
    val opened = clean(toClose
      .withColumn(attr, col("__new_attr"))
      .withColumn("effective_from", col("__new_ts"))
      .withColumn("effective_to", lit(null).cast(dim.schema("effective_to").dataType))
      .withColumn("is_current", lit(true)))
    val born = clean(joined.filter(col("__cur").isNull && col("__upd").isNotNull)
      .withColumn(attr, col("__new_attr"))
      .withColumn("effective_from", col("__new_ts"))
      .withColumn("effective_to", lit(null).cast(dim.schema("effective_to").dataType))
      .withColumn("is_current", lit(true)))
    closed.unionByName(unchanged)
      .unionByName(closedNow).unionByName(opened).unionByName(born)
  }

  /** Point-in-time (as-of) dimension lookup: for each fact row, attach
    * the SCD2 version whose [effective_from, effective_to) range covers
    * the fact's timestamp. Equi-join on the key carries the range
    * predicate — versions-per-key is small (that is what SCD2 change
    * compression guarantees), so the fan-in stays bounded; facts before
    * a key's first version simply drop (inner semantics). This is the
    * lookup every fact-table load does against a versioned dimension. */
  def pointInTime(fact: DataFrame, factKey: String, factTs: String,
                  dim: DataFrame, dimKey: String): DataFrame = {
    val d = dim.withColumnRenamed(dimKey, "__dk")
    fact.join(d,
      col(factKey) === col("__dk") &&
        col(factTs) >= col("effective_from") &&
        (col("effective_to").isNull || col(factTs) < col("effective_to")))
      .drop("__dk")
  }
}
