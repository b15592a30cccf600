package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-engineering transforms for model-training pipelines — each in
  * the one-aggregation-then-broadcast shape that survives 100 TB: the
  * row stream collapses to a category- / distinct-value-sized summary
  * first, and every per-row readout is a broadcast join against that
  * summary. Determinism follows the [[Stats]] stance: DECIMAL sums,
  * fixed double parenthesization, 6-dp outputs.
  */
object Features {

  /** Out-of-fold smoothed target encoding — the leakage-safe version of
    * "replace category with its mean label": a row in fold f is encoded
    * by the OTHER folds' statistics only,
    *   enc(c, f) = (sum_c − sum_{c,f} + m·μ) / (n_c − n_{c,f} + m)
    * with prior weight `m` pulling rare categories toward the global
    * mean μ (plain per-category means ARE the label for singleton
    * categories — the leak [[Stats.infoGain]] detects, this op
    * prevents). Output: one row per (category, fold) with the held-out
    * count and encoding — the lookup table a training job broadcast-
    * joins back onto its rows. Scale shape: ONE (category × fold)-keyed
    * aggregation over the stream, then category-count-sized arithmetic;
    * label sums in DECIMAL, μ and the encodings as fixed-form doubles. */
  def targetEncodeOOF(df: DataFrame, catCol: Column, labelCol: Column,
                      foldCol: Column, priorWeight: Double = 10.0)
      : DataFrame = {
    require(priorWeight > 0, s"targetEncodeOOF: bad priorWeight $priorWeight")
    val base = df.filter(labelCol.isNotNull)
      .select(catCol.alias("category"), foldCol.alias("fold"),
        labelCol.cast("double").alias("__y"))
    val cf = base.groupBy("category", "fold")
      .agg(count(lit(1)).alias("__ncf"),
        sum(col("__y").cast("decimal(28,10)")).alias("__scf"))
    val c = cf.groupBy("category")
      .agg(sum("__ncf").alias("__nc"), sum("__scf").alias("__sc"))
    val g = c.agg(sum("__nc").alias("__n"), sum("__sc").alias("__s"))
    val mu = col("__s").cast("double") / col("__n").cast("double")
    cf.join(broadcast(c), "category")
      .crossJoin(broadcast(g))
      .select(col("category"), col("fold"),
        (col("__nc") - col("__ncf")).alias("n_oof"),
        round(((col("__sc") - col("__scf")).cast("double") +
            lit(priorWeight) * mu) /
          ((col("__nc") - col("__ncf")).cast("double") + lit(priorWeight)),
          6).alias("encoding"))
      .orderBy("category", "fold")
  }

  /** Weight-of-evidence binning + information value — the credit-scoring
    * readout of how a categorical (or pre-binned) feature separates a
    * boolean label:
    *   WoE(bin) = ln(p_good(bin) / p_bad(bin)),
    *   IV(feature) = Σ_bins (p_good − p_bad)·WoE
    * with a half-count continuity correction per cell (p = (c + 0.5) /
    * (C + 0.5)) so empty-side bins stay finite — the same finiteness-by-
    * construction stance as [[Linkage]]'s smoothed m/u. IV is the
    * ranking [[Stats.infoGain]] gives in entropy units, in the units
    * scorecard builders actually quote (< 0.02 useless, > 0.5 suspect —
    * a leakage detector too). Scale shape: the stream explodes ×features
    * into (feature, bin, y) triples, map-side combined to bin-count
    * cells in ONE aggregation; totals and IV are feature-count-sized
    * joins; WoE term sums in DECIMAL. Output: one row per (feature,
    * bin) with counts, WoE, and the feature's IV alongside. */
  def woeIv(df: DataFrame, label: Column,
            features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty && features.size <= 16,
      s"woeIv: need 1..16 features, got ${features.size}")
    val e = df.select(when(label, 1L).otherwise(0L).alias("__y"),
        explode(array(features.map { case (n, c) =>
          struct(lit(n).alias("__fn"), c.cast("string").alias("__bin"))
        }: _*)).alias("__e"))
      .select(col("__y"), col("__e.__fn").alias("feature"),
        col("__e.__bin").alias("bin"))
    val c = e.groupBy("feature", "bin")
      .agg(sum("__y").alias("__g"), sum(lit(1L) - col("__y")).alias("__b"))
    val t = c.groupBy("feature")
      .agg(sum("__g").alias("__gt"), sum("__b").alias("__bt"))
    val pg = (col("__g").cast("double") + lit(0.5)) /
      (col("__gt").cast("double") + lit(0.5))
    val pb = (col("__b").cast("double") + lit(0.5)) /
      (col("__bt").cast("double") + lit(0.5))
    val w = c.join(broadcast(t), "feature")
      .select(col("feature"), col("bin"), col("__g"), col("__b"),
        pg.alias("__pg"), pb.alias("__pb"))
    // WoE·Δp terms pin to 9 dp before the 14-dp DECIMAL cast (the
    // cross-libm transcendental-output stance)
    val iv = w.groupBy("feature")
      .agg(sum(round((col("__pg") - col("__pb")) *
          log(col("__pg") / col("__pb")), 9)
        .cast("decimal(28,14)")).alias("__iv"))
    w.join(broadcast(iv), "feature")
      .select(col("feature"), col("bin"),
        col("__g").alias("n_pos"), col("__b").alias("n_neg"),
        round(log(col("__pg") / col("__pb")), 6).alias("woe"),
        round(col("__iv").cast("double"), 6).alias("iv"))
      .orderBy("feature", "bin")
  }

  /** Quantile normalization of a value column against the GLOBAL
    * distribution, per group — the batch-effect correction that maps
    * every source's values onto one reference scale (a p95 document
    * score means the same thing regardless of which crawl scored it).
    * Each distinct (group, value) gets the mid-rank fractional position
    *   p = (before + (t+1)/2 − 0.5) / n_g
    * within its group and maps to the reference grid's linear
    * interpolation at p over `gridPoints` exact global percentiles.
    * Scale shape: the stream collapses to the per-(group, value) count
    * table in one aggregation; the rank window is GROUP-partitioned over
    * that distinct-value-compressed table (parallel across groups, the
    * [[Stats.withCumBefore]] compression argument per group); the
    * reference grid is one exact-percentile aggregation broadcast at
    * grid size. Output: (group, value, p, normalized), one row per
    * distinct (group, value) — the lookup table the pipeline joins back. */
  def quantileNormalize(df: DataFrame, valueCol: Column, groupCol: Column,
                        gridPoints: Int = 11): DataFrame = {
    require(gridPoints >= 2 && gridPoints <= 1001,
      s"quantileNormalize: need 2 <= gridPoints <= 1001, got $gridPoints")
    val base = df.filter(valueCol.isNotNull)
      .select(groupCol.alias("grp"), valueCol.cast("double").alias("value"))
    val pv = base.groupBy("grp", "value").agg(count(lit(1)).alias("__t"))
    val ng = pv.groupBy("grp").agg(sum("__t").alias("__ng"))
    val w = Window.partitionBy("grp").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = pv
      .withColumn("__before", coalesce(sum("__t").over(w), lit(0L)))
      .join(broadcast(ng), "grp")
      .withColumn("__p",
        (col("__before").cast("double") +
          (col("__t").cast("double") + lit(1.0)) / lit(2.0) - lit(0.5)) /
          col("__ng").cast("double"))
    val qs = (0 until gridPoints)
      .map(j => j.toDouble / (gridPoints - 1)).mkString(", ")
    val grid = base.agg(expr(s"percentile(value, array($qs))").alias("__g"))
      .select(posexplode(col("__g")).as(Seq("__j", "__gv")))
    val pos = col("__p") * lit((gridPoints - 1).toDouble)
    val lo = floor(pos).cast("int")
    ranked
      .join(broadcast(grid.select(col("__j").alias("__lo"),
        col("__gv").alias("__glo"))), lo === col("__lo"))
      .join(broadcast(grid.select(col("__j").alias("__hi"),
        col("__gv").alias("__ghi"))),
        least(lo + 1, lit(gridPoints - 1)) === col("__hi"))
      .select(col("grp"), col("value"), round(col("__p"), 6).alias("p"),
        round(col("__glo") +
          (pos - lo.cast("double")) * (col("__ghi") - col("__glo")), 6)
          .alias("normalized"))
      .orderBy("grp", "value")
  }
}
