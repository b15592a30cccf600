package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969):
  * given candidate pairs (from any blocking scheme — sorted-neighbor,
  * LSH, token prefix) carrying per-field agreement predicates and a
  * labeled truth subset, estimate per field
  *   m_k = P(field k agrees | pair is a match)
  *   u_k = P(field k agrees | pair is a non-match)
  * and score pairs by the summed log-likelihood ratio
  *   Σ_k  agree_k ? log₂(m_k/u_k) : log₂((1−m_k)/(1−u_k)).
  * This is the estimator that turns the reference's deterministic
  * fuzzy-match gate (see er-golden, challenge.py's join-cleanup family)
  * into a calibrated one: fields earn their influence from data instead
  * of a hand-tuned threshold.
  *
  * Scale shape: both ops are ONE aggregation over the candidate-pair
  * stream — the m/u estimates collapse to a single row of exact integer
  * counts (2 + 2·k cells), which then broadcasts back onto the pairs for
  * scoring; nothing wider than the blocking output ever shuffles, and
  * the blocking step (not this op) owns the candidate-count bound.
  * Determinism: m/u are doubles from exact counts with +0.5/+1 Laplace
  * smoothing (keeps every log finite by construction — a field that
  * always or never agrees stays bounded), weights are log₂ of identical
  * doubles, the score sum is a fixed left-assoc chain, outputs 6-dp.
  */
object Linkage {

  private def countCells(label: Column, fields: Seq[(String, Column)]) =
    Seq(sum(when(label, 1L).otherwise(0L)).alias("__nm"),
      sum(when(label, 0L).otherwise(1L)).alias("__nu")) ++
      fields.flatMap { case (n, c) => Seq(
        sum(when(label && c, 1L).otherwise(0L)).alias(s"__am_$n"),
        sum(when(!label && c, 1L).otherwise(0L)).alias(s"__au_$n")) }

  private def mOf(n: String): Column =
    (col(s"__am_$n").cast("double") + lit(0.5)) /
      (col("__nm").cast("double") + lit(1.0))

  private def uOf(n: String): Column =
    (col(s"__au_$n").cast("double") + lit(0.5)) /
      (col("__nu").cast("double") + lit(1.0))

  /** Per-field m/u estimates and agreement/disagreement weights, one row
    * per field ordered by field name. `fields` are (name, agreement
    * predicate over the pair columns). */
  def fellegiSunterWeights(pairs: DataFrame, label: Column,
                           fields: Seq[(String, Column)]): DataFrame = {
    require(fields.nonEmpty && fields.size <= 16,
      s"fellegiSunterWeights: need 1..16 fields, got ${fields.size}")
    val cells = countCells(label, fields)
    pairs.agg(cells.head, cells.tail: _*)
      .select(explode(array(fields.map { case (n, _) =>
        struct(lit(n).alias("field"),
          round(mOf(n), 6).alias("m"),
          round(uOf(n), 6).alias("u"),
          round(log2(mOf(n) / uOf(n)), 6).alias("w_agree"),
          round(log2((lit(1.0) - mOf(n)) / (lit(1.0) - uOf(n))), 6)
            .alias("w_disagree"))
      }: _*)).alias("__f"))
      .select(col("__f.*"))
      .orderBy("field")
  }

  /** Pairs ranked by total match weight (the log-likelihood-ratio sum),
    * top `topN` by (score DESC, id1, id2). `pairs` must expose id1/id2;
    * the label rides along as is_match for audit. */
  def fellegiSunterScore(pairs: DataFrame, label: Column,
                         fields: Seq[(String, Column)],
                         topN: Int): DataFrame = {
    require(fields.nonEmpty && fields.size <= 16 && topN >= 1,
      s"fellegiSunterScore: bad fields=${fields.size} topN=$topN")
    val cells = countCells(label, fields)
    val a = pairs.agg(cells.head, cells.tail: _*)
    val score = fields.map { case (n, c) =>
      when(c, log2(mOf(n) / uOf(n)))
        .otherwise(log2((lit(1.0) - mOf(n)) / (lit(1.0) - uOf(n))))
    }.reduce(_ + _)
    pairs.crossJoin(broadcast(a))
      .select(col("id1"), col("id2"),
        when(label, 1L).otherwise(0L).alias("is_match"),
        round(score, 6).alias("score"))
      .orderBy(desc("score"), col("id1"), col("id2"))
      .limit(topN)
  }
}
