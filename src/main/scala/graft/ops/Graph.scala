package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over plain edge tables (duplicate-cluster
  * connected components lives in ScaleDedup; this is the ranking side).
  * Corpus-curation use: link-graph authority scores (PageRank over a web
  * graph) are a standard document-quality prior at pretraining scale.
  */
object Graph {

  /** Weighted PageRank, deterministic across engines and cluster sizes.
    *
    * Each round is the standard power-iteration step
    *   rank'(v) = (1−d)/N + d · Σ_{(u,v,w)∈E} rank(u) · w / outw(u)
    * expressed as two equi-joins (edges⋈out-weights⋈ranks on src) and one
    * aggregation on dst — per round the rank table shuffles, never
    * anything bigger, and the groupBy gets map-side partial aggregation.
    * Determinism mirrors `Similarity.kmeansCentroids`: per-edge
    * contributions are cast to DECIMAL(28,14) before the sum (shuffle
    * order cannot flip low bits) and each round's rank is rounded to
    * 9 dp, so the iteration chain is reproducible bit-for-bit anywhere.
    *
    * `edges` must expose (src, dst, w≥0). Nodes without out-edges leak
    * their mass (the standard dangling simplification — totals then sum
    * to < 1); nodes without in-edges settle at (1−d)/N. The fixed,
    * caller-chosen `iters` keeps the op a finite declarative plan; rank
    * movement per round shrinks geometrically (d^t), so small iteration
    * counts already order nodes stably. Lineage grows linearly with
    * `iters` — for dozens of rounds pass pre-checkpointed edges and see
    * ScaleDedup.connectedComponents for the checkpoint pattern. */
  def pagerank(edges: DataFrame, iters: Int,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"pagerank: need iters >= 1, got $iters")
    val nodes = edges.select(col("src").alias("node"))
      .union(edges.select(col("dst").alias("node")))
      .distinct()
    val n = nodes.count()
    require(n > 0, "pagerank: empty edge set")
    val outw = edges.groupBy("src").agg(sum("w").alias("__outw"))
    var ranks = nodes.select(col("node"), lit(1.0 / n).alias("rank"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(outw, "src")
        .join(ranks.select(col("node").alias("src"), col("rank")), "src")
        .select(col("dst").alias("node"),
          (col("rank") * col("w") / col("__outw"))
            .cast("decimal(28,14)").alias("__c"))
      val sums = contrib.groupBy("node").agg(sum("__c").alias("__cs"))
      ranks = nodes.join(sums, Seq("node"), "left").select(col("node"),
        round(lit(1.0 - damping) / lit(n.toDouble) +
          lit(damping) * coalesce(col("__cs").cast("double"), lit(0.0)), 9)
          .alias("rank"))
    }
    ranks
  }
}
