package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-assembly stages of a training-data pipeline: packing documents
  * into fixed token-budget training sequences, and deterministic
  * train/validation splitting.
  */
object Pack {

  /** Concat-and-cut sequence packing (the standard pretraining batch
    * shape: all tokens of a shard are conceptually concatenated in order
    * and cut every `budget` tokens; documents may straddle a cut). Each
    * document gets the sequence id and intra-sequence offset where it
    * STARTS: seq_id = floor(prev_cumsum / budget), offset = prev_cumsum −
    * seq_id·budget, with prev_cumsum the running token total of earlier
    * documents in its shard.
    *
    * Scale: ONE window over (shardCol, order by orderCol) — the shuffle
    * is on the shard key, and shards are independent, so packing 100 TB
    * parallelizes across shards (a single global pack would serialize
    * into one partition; shard first, always). Deterministic given the
    * (shardCol, orderCol) total order. */
  def packGreedy(df: DataFrame, shardCol: String, orderCol: String,
                 tokenCol: String, budget: Int): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = (sum(col(tokenCol)).over(w) - col(tokenCol)).alias("__prev")
    df.withColumn("__prev", prev)
      .withColumn("seq_id", floor(col("__prev") / budget).cast("long"))
      .withColumn("seq_offset", (col("__prev") - col("seq_id") * budget).cast("long"))
      .drop("__prev")
  }

  /** Deterministic train/validation split: the same md5-threshold draw as
    * `Mix.stratifiedSample` (reproducible row-for-row, independent of
    * partitioning), labeling instead of filtering. `valFraction` of rows
    * land in 'val', the rest in 'train'; the split is stable under corpus
    * growth (a document's label never changes when other rows are added,
    * because it depends only on its own key). */
  def trainValSplit(df: DataFrame, idCol: String,
                    valFraction: Double): DataFrame = {
    require(valFraction >= 0.0 && valFraction <= 1.0,
      s"valFraction must be in [0, 1], got $valFraction")
    val draw = ScaleDedup.hash32(
      concat_ws("|", lit("split"), col(idCol).cast("string")), 0)
    df.withColumn("split",
      when(draw < lit(valFraction * 4294967296.0), lit("val"))
        .otherwise(lit("train")))
  }
}
