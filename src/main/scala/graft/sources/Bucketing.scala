package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout: pre-shuffle data ONCE at write time so every
  * subsequent equi-join / aggregation on the bucket key runs shuffle-free.
  *
  * At 100 TB this is the difference between re-shuffling the fact table on
  * every query and paying the exchange once at ingest: two tables bucketed
  * into the same bucket count on the join key sort-merge-join directly
  * (zero Exchange in the plan), and groupBy on the bucket key skips its
  * exchange too.
  */
object Bucketing {

  /** Write `df` as a bucketed (+ optionally sorted) managed table. Parquet
    * format; `buckets` should be sized so one bucket ≈ one task's worth of
    * data at target scale.
    *
    * Pre-cleans both the catalog entry AND the table's warehouse location:
    * a location orphaned by a previous session (the in-memory catalog dies
    * with the JVM, the directory does not) otherwise fails every later
    * overwrite with LOCATION_ALREADY_EXISTS. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sorted: Boolean = true): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w).saveAsTable(table)
  }

  /** Append a batch to an existing bucketed table, preserving the bucket
    * layout (insertInto routes rows through the table's declared
    * bucketing, so post-append reads keep their shuffle-free plans). The
    * maintenance half of a bucketed ingest: write once with
    * `writeBucketed`, then absorb arriving batches without rewriting the
    * table. Batch cost is one bucket-hash exchange of the BATCH only —
    * independent of table size. */
  def appendBucketed(batch: DataFrame, table: String): Unit =
    batch.write.mode(SaveMode.Append).format("parquet").insertInto(table)

  /** Shuffle-free equi-join of two tables bucketed on the join key with the
    * SAME bucket count. The caller asserts the layout; Spark's planner
    * recognizes the matching HashPartitioning and plans SMJ without
    * exchanges. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   on: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), on, joinType)
}
