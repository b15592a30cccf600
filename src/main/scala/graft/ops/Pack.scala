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

  /** Materialize the packed training sequences `packGreedy` assigns: each
    * output row IS one training sequence — (shardCol, seq_id, n_toks,
    * toks), with toks the budget-window slice of the shard's concatenated
    * token stream. A document straddling a cut contributes its head to one
    * sequence and its tail to the next, exactly the concat-and-cut
    * semantics consumers expect.
    *
    * Dataflow: the same single window as `packGreedy` computes each doc's
    * global start offset; tokens then posexplode WITH their global
    * position, group by (shard, floor(pos / budget)), and reassemble in
    * position order. The shuffle key is (shard, seq) — sequences build
    * independently and in parallel; only tokens of one `budget`-sized
    * sequence ever meet in a reducer, so memory per group is bounded by
    * the budget regardless of corpus size. Every sequence except a
    * shard's last has exactly `budget` tokens (spec-pinned invariant). */
  def packEmit(df: DataFrame, shardCol: String, orderCol: String,
               tokensCol: String, budget: Int): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = size(col(tokensCol)).cast("long")
    val positioned = df
      .withColumn("__prev", sum(n).over(w) - n)
      .select(col(shardCol), col("__prev"), posexplode(col(tokensCol)))
      .select(col(shardCol), (col("__prev") + col("pos")).alias("__gpos"),
        col("col").alias("__tok"))
    positioned
      .groupBy(col(shardCol),
        floor(col("__gpos") / budget).cast("long").alias("seq_id"))
      .agg(count(lit(1)).alias("n_toks"),
        array_sort(collect_list(struct(col("__gpos"), col("__tok"))))
          .alias("__ordered"))
      .select(col(shardCol), col("seq_id"), col("n_toks"),
        transform(col("__ordered"), e => e.getField("__tok")).alias("toks"))
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

  /** Leakage-safe group k-fold assignment with its balance audit — the
    * cross-validation counterpart of [[trainValSplit]]: the fold is a
    * pure hash of the GROUP key (md5 bucket, no RNG state), so every row
    * of a group lands in the same fold by construction — the structural
    * guarantee that no user/document straddles train and eval — and
    * assignment is stable under corpus growth (new groups join folds,
    * old ones never move). Returns the per-fold audit a pipeline gates
    * on before running CV: group count, row count, and the mean of a
    * caller-supplied metric column (class balance / conversion rate) —
    * skewed folds surface here, not as mystery CV variance. One grouped
    * aggregation; exact distinct via the fold×group two-phase. */
  def groupKFoldReport(df: DataFrame, groupCol: Column, k: Int,
                       metric: Column): DataFrame = {
    require(k >= 2, s"groupKFoldReport: need k >= 2, got $k")
    val fold = pmod(ScaleDedup.hash32(
      concat_ws("|", lit("fold"), groupCol.cast("string")), 0), lit(k.toLong))
    df.select(fold.alias("fold"), groupCol.alias("__g"),
        metric.cast("double").alias("__m"))
      .groupBy("fold")
      .agg(countDistinct(col("__g")).alias("n_groups"),
        count(lit(1)).alias("n_rows"),
        round0(sum(col("__m").cast("decimal(28,8)")).cast("double") /
          count(lit(1)), 6).alias("metric_mean"))
      .orderBy("fold")
  }

  /** Deterministic training-shard manifest: every row gets a shard (md5
    * bucket of its key — balanced in expectation, stable under corpus
    * growth) and a position within the shard drawn from an INDEPENDENT
    * md5 order (the "global shuffle" a training run needs, with no RNG
    * state and no global sort — each shard orders itself, so the one
    * window shuffle is keyed by shard and 100 TB parallelizes across
    * shards). Returns (idCol, shard, pos) with pos 1-based in shard
    * order; a writer partitions by `shard` and sorts by `pos` to
    * materialize the shards. */
  def shardManifest(df: DataFrame, idCol: String, numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val key = concat_ws("|", lit("shard"), col(idCol).cast("string"))
    val w = Window.partitionBy("shard").orderBy(col("__ord"), col(idCol))
    df.select(col(idCol),
        pmod(ScaleDedup.hash32(key, 0), lit(numShards.toLong)).alias("shard"),
        ScaleDedup.hash32(key, 1).alias("__ord"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__ord")
  }

  /** Materialize training shards: every input row joined to its
    * `shardManifest` slot, written hive-partitioned by shard with rows in
    * `pos` order inside each shard file. `repartition(shard)` puts each
    * shard in exactly one task and `sortWithinPartitions(pos)` makes file
    * order the training order, so a reader streams shard=K/ and gets the
    * deterministic global-shuffle order with zero further work. One
    * id-keyed join shuffle + one shard-keyed exchange — at 100 TB use
    * more shards, not bigger ones (a shard is one task's write). */
  def writeShards(df: DataFrame, idCol: String, numShards: Int,
                  path: String): Unit = {
    val manifest = shardManifest(df.select(col(idCol)), idCol, numShards)
    df.join(manifest, Seq(idCol))
      .repartition(numShards, col("shard"))
      // sort key must LEAD with the partition column: the dynamic-
      // partition writer requires rows ordered by partition cols and
      // inserts its own (pos-oblivious) sort if they aren't already
      .sortWithinPartitions("shard", "pos")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("shard").parquet(path)
  }

  /** Quality-first token-budget selection — "which slices of the corpus
    * make the training mix when we can only afford `budget` tokens":
    * docs roll up into quality bands, bands are consumed best-first, and
    * the band straddling the budget line is taken FRACTIONALLY — the
    * selection artifact (band → keep fraction) a sampling stage then
    * applies with a deterministic per-doc hash. Scale shape: one
    * band-celled aggregation over the stream; the cumulative runs over
    * the BAND-COUNT-sized table (bounded by the banding, not the data);
    * keep fractions are fixed-form doubles, 6 dp. */
  def tokenBudgetSelect(df: DataFrame, bandCol: Column, tokensCol: Column,
                        budget: Long): DataFrame = {
    require(budget > 0, s"tokenBudgetSelect: bad budget $budget")
    val cells = df.filter(tokensCol.isNotNull)
      .groupBy(bandCol.alias("band"))
      .agg(count(lit(1)).alias("n_docs"), sum(tokensCol).alias("tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("band").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val keep = (lit(budget.toDouble) - col("__prev").cast("double")) /
      col("tokens").cast("double")
    cells
      .withColumn("__prev", coalesce(sum("tokens").over(w), lit(0L)))
      .select(col("band"), col("n_docs"), col("tokens"),
        (col("__prev") + col("tokens")).alias("cum_tokens"),
        round(least(greatest(keep, lit(0.0)), lit(1.0)), 6)
          .alias("keep_fraction"))
      .orderBy(col("band").desc)
  }
}
