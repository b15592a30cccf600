package graft.ops

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** Markov removal-effect attribution — the data-driven alternative to
  * first/last-touch ([[Sessionize.attribution]]): model journeys as an
  * absorbing Markov chain (S → touches → C/N), then credit each channel
  * by how much conversion probability DISAPPEARS when journeys through
  * it are severed (its state's probability pinned to 0). A channel that
  * merely appears often gets no credit unless paths actually need it.
  *
  * Scale shape: journeys reduce to a TRANSITION COUNT table in one
  * window pass + one count shuffle (states² rows, ≤ ~40 for any
  * realistic channel set — a bounded artifact, the vocabulary-collect
  * stance); the chain solve happens on that artifact. Absorption uses
  * K-step value iteration with each per-state sum DECIMAL(28,14)-
  * truncated — a fixed-K OPERATOR DEFINITION both engines replicate
  * bit-for-bit (geometric convergence puts K=16 within ~1e-3 of the
  * fixpoint; determinism beats the fourth decimal here).
  *
  * Journey construction: per key, touches strictly before the first
  * conversion event in (ts, tie) order; S→first touch (or S→C when a
  * key converts with no prior touch), touch→touch for consecutive
  * touches, last touch→C/N by conversion. */
object Attribution {

  private val Scale = 14

  /** One value-iteration sweep: p'(src) = Σ_dst t(src,dst)·p(dst) with
    * p(C)=1, p(N)=0 and each term truncated to DECIMAL(28,14) before an
    * exact sum — mirrors SUM(CAST(t*p AS DECIMAL(28,14))) exactly. */
  private def sweep(trans: Map[(String, String), Double], channels: Seq[String],
                    p: Map[String, Double], removed: Option[String])
      : Map[String, Double] = {
    val states = "S" +: channels
    states.map { src =>
      val terms = channels.map { dst =>
        val pd = if (removed.contains(dst)) 0.0 else p.getOrElse(dst, 0.0)
        trans.getOrElse((src, dst), 0.0) * pd
      } :+ trans.getOrElse((src, "C"), 0.0) * 1.0
      val sum = terms.foldLeft(JBigDecimal.ZERO) { (acc, t) =>
        acc.add(new JBigDecimal(t).setScale(Scale, RoundingMode.HALF_UP))
      }
      src -> sum.doubleValue
    }.toMap
  }

  private def absorb(trans: Map[(String, String), Double], channels: Seq[String],
                     removed: Option[String], iters: Int): Double = {
    var p = channels.map(_ -> 0.0).toMap + ("S" -> 0.0)
    (1 to iters).foreach { _ =>
      val next = sweep(trans, channels, p, removed)
      p = removed.fold(next)(r => next + (r -> 0.0))
    }
    p("S")
  }

  /** Removal-effect attribution over `channels` (the touch-type domain;
    * passed explicitly so the output schema is data-independent).
    * Output per channel: removal_effect = 1 − p_removed/p_full and the
    * normalized attribution share, 6-dp. */
  def markovAttribution(df: DataFrame, keyCol: String, tsCol: String,
                        tieCol: String, typeCol: String,
                        conversionType: String, channels: Seq[String],
                        iters: Int = 16): DataFrame = {
    require(channels.nonEmpty && !channels.contains(conversionType),
      "markovAttribution: channels must exclude the conversion type")
    require(iters >= 1 && iters <= 64, s"markovAttribution: bad iters $iters")
    val spark = df.sparkSession
    val ev = df.select(col(keyCol).alias("__k"), col(typeCol).alias("__ty"),
      col(tsCol).alias("__ts"), col(tieCol).alias("__tie"))
    val fp = ev.filter(col("__ty") === conversionType)
      .groupBy("__k")
      .agg(min(struct(col("__ts"), col("__tie"))).alias("__fp"))
    val touches = ev.filter(col("__ty") =!= conversionType)
      .join(fp, Seq("__k"), "left")
      .filter(col("__fp").isNull ||
        struct(col("__ts"), col("__tie")) < col("__fp"))
    val w = Window.partitionBy("__k").orderBy(col("__ts").asc, col("__tie").asc)
    val steps = touches
      .withColumn("__nxt", lead(col("__ty"), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__conv", col("__fp").isNotNull)
    val stepTrans = steps.select(col("__ty").alias("src"),
      coalesce(col("__nxt"),
        when(col("__conv"), lit("C")).otherwise(lit("N"))).alias("dst"))
    val startTrans = steps.filter(col("__rn") === 1)
      .select(lit("S").alias("src"), col("__ty").alias("dst"))
    val directConv = fp.join(
        touches.select("__k").distinct(), Seq("__k"), "left_anti")
      .select(lit("S").alias("src"), lit("C").alias("dst"))
    val counts = stepTrans.unionByName(startTrans).unionByName(directConv)
      .groupBy("src", "dst").agg(count(lit(1)).alias("cnt"))
    val totals = counts.groupBy("src").agg(sum("cnt").alias("tot"))
    // Bounded artifact: ≤ (|channels|+1)·(|channels|+2) rows.
    val trans = counts.join(totals, "src")
      .select(col("src"), col("dst"),
        (col("cnt").cast("double") / col("tot").cast("double")).alias("t"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val pFull = absorb(trans, channels, None, iters)
    val rows = channels.sorted.map { c =>
      val pc = absorb(trans, channels, Some(c), iters)
      // max-guard: an unused channel's ratio can float past 1 by an ulp.
      val re = math.max(1.0 - pc / pFull, 0.0)
      (c, re)
    }
    val totRe = rows.map(_._2).sum
    val out = rows.map { case (c, re) =>
      Row(c, round6(re), if (totRe > 0) round6(re / totRe) else null)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(StructField("channel", StringType, nullable = false),
        StructField("removal_effect", DoubleType, nullable = false),
        StructField("share", DoubleType, nullable = true))))
      .orderBy("channel")
  }

  private def round6(v: Double): Double =
    new JBigDecimal(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  /** Position-based (U-shaped) attribution — the 40/20/40 rule between
    * the data-driven Markov model above and Sessionize.attribution's
    * first/last endpoints: each conversion's credit splits 0.4 to the
    * first touch of its path, 0.4 to the last, 0.2 evenly over the
    * middles (single-touch paths take 1.0; two-touch paths 0.5/0.5).
    * Paths reset at each conversion: a running preceding-conversion
    * count segments every key's history (one window over the per-key
    * sort), so each touch credits exactly ONE conversion — no
    * conversion×touch fan-out, the whole op is two windows and a
    * channel-sized aggregation on the same per-key exchange. Middle
    * credit 0.2/(m−2) rounds to 9 dp before the DECIMAL credit sum
    * (engine-identical doubles); segments with no closing conversion
    * (the still-open tail) earn nothing. Returns (channel, n_touches,
    * credit) with credit 6-dp. */
  def positionAttribution(df: DataFrame, keyCol: String, tsCol: String,
                          tieCol: String, typeCol: String,
                          conversionType: String): DataFrame = {
    val wPrev = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val seg = df.withColumn("__seg", coalesce(
      sum(when(col(typeCol) === conversionType, 1L).otherwise(0L))
        .over(wPrev), lit(0L)))
    val wSeg = Window.partitionBy(col(keyCol), col("__seg"))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val touches = seg.filter(col(typeCol) =!= conversionType)
      .withColumn("__i", row_number().over(wSeg))
      .withColumn("__m", count(lit(1)).over(
        Window.partitionBy(col(keyCol), col("__seg"))))
    val closed = seg.filter(col(typeCol) === conversionType)
      .select(col(keyCol), col("__seg")).distinct()
    touches.join(closed, Seq(keyCol, "__seg"))
      .select(col(typeCol).alias("channel"),
        when(col("__m") === 1, lit(1.0))
          .when(col("__m") === 2, lit(0.5))
          .when(col("__i") === 1 || col("__i") === col("__m"), lit(0.4))
          .otherwise(round(lit(0.2) / (col("__m") - 2).cast("double"), 9))
          .alias("__c"))
      .groupBy("channel")
      .agg(count(lit(1)).alias("n_touches"),
        round(sum(col("__c").cast("decimal(18,9)")).cast("double"), 6)
          .alias("credit"))
      .orderBy("channel")
  }
}
