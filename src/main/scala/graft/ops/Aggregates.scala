package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregations / reshaping — SURVEY.md §2 H1–H8.
  *
  * Reference: the 26M-row ratings groupby-count-pivot
  * (challenge2.py:273-277), value_counts frequency tables, describe().
  *
  * Scale notes: groupBy gets map-side partial aggregation for free;
  * pivot REQUIRES an explicit value list (SURVEY.md §2 J6) both for
  * determinism and to avoid a planning-time distinct job over 100 TB.
  * Sums over doubles are computed through DECIMAL so results are
  * order-independent (shuffle-order-proof) and oracle-exact.
  */
object Aggregates {

  /** H1 — group-by count over composite keys (challenge2.py:273). */
  def groupCount(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).count()

  /** H2+D7+E9 — pivot long→wide with an EXPLICIT value list, prefixed
    * column names, and 0-fill (challenge2.py:273-281: groupby → pivot →
    * 'rating_'+col rename → fillna(0)).
    *
    * Implemented as ONE conditional aggregation rather than
    * `groupBy.pivot.count`: Spark's pivot plans two exchanges (pre-agg on
    * (key, pivotCol), then pivotfirst on key); the known-values conditional
    * form is a single shuffle on `key` with map-side partial aggregation —
    * the plan that survives a 100 TB fact table. */
  def pivotCounts(df: DataFrame, key: String, pivotCol: String,
                  values: Seq[String], prefix: String): DataFrame = {
    val aggs = values.map(v =>
      count(when(col(pivotCol) === v, 1)).alias(prefix + sanitize(v)))
    df.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /** Pivot-derived column names: lowercase, non-alphanumerics collapsed to
    * `_` so downstream name-based APIs (na.fill, col) never trip over dots
    * ("0.5" → "0_5"). */
  def sanitize(v: String): String =
    v.toLowerCase.replaceAll("[^a-z0-9]+", "_")

  /** H2 generalized — pivot with an arbitrary aggregate per known value:
    * same single-shuffle conditional-aggregation shape as pivotCounts. */
  def pivotAgg(df: DataFrame, key: String, pivotCol: String,
               values: Seq[String], prefix: String,
               measure: Column, agg: Column => Column): DataFrame = {
    val aggs = values.map(v =>
      agg(when(col(pivotCol) === v, measure)).alias(prefix + sanitize(v)))
    df.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /** Wide→long unpivot (pandas melt): each (column, value) pair becomes a
    * row. Pure stack expression — no shuffle at all. */
  def unpivot(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
              keyName: String = "key", valueName: String = "value"): DataFrame =
    df.unpivot(idCols.map(qcol).toArray, valueCols.map(qcol).toArray,
      keyName, valueName)

  /** Order-independent exact sum of a double column: cast each value to
    * DECIMAL(18,scale) before summing so shuffle order cannot flip low
    * bits, then surface as double. */
  def exactSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** H5 — frequency table (value_counts,
    * exploratory_data_analysis.ipynb:3924). */
  def freqTable(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c)).count().orderBy(desc("count"), col(c))

  /** H6 — descriptive stats (describe(),
    * exploratory_data_analysis.ipynb:4278) computed from exact decimal
    * sums so the result is deterministic under any partitioning:
    * n / mean / stddev (sample) / min / max. */
  def summaryStats(df: DataFrame, c: String, scale: Int = 2): DataFrame = {
    val v = col(c)
    val agg = df.agg(
      count(v).alias("n"),
      sum(v.cast(s"decimal(18,$scale)")).cast("double").alias("__s"),
      sum((v * v).cast(s"decimal(28,${2 * scale})")).cast("double").alias("__ss"),
      min(v).alias("min_v"),
      max(v).alias("max_v"))
    agg.select(
      col("n"),
      round(col("__s") / col("n"), 6).alias("mean_v"),
      round(sqrt((col("__ss") - col("__s") * col("__s") / col("n")) / (col("n") - 1)), 6).alias("std_v"),
      col("min_v"), col("max_v"))
  }

  /** H6 — exact quartiles, linearly interpolated (pandas describe() prints
    * 25%/50%/75%, exploratory_data_analysis.ipynb:4257-4264). Spark's
    * `percentile` is exact with linear interpolation — the same definition
    * as pandas quantile / DuckDB quantile_cont.
    *
    * The ARRAY form matters: three scalar `percentile(c, q)` calls are
    * three independent aggregate buffers, each holding and sorting every
    * value (measured 3× the cost at sf0.1); `percentile(c, array(...))`
    * shares one buffer and one sort for all three points. Scale caveat,
    * honestly: exact percentile buffers the whole column on the merging
    * task — fine at fixture scale and for the oracle's exact compare, but
    * a 100 TB column needs `approx_percentile` (t-digest, bounded state)
    * or sort-based distributed rank selection instead. */
  def quartiles(df: DataFrame, c: String): DataFrame =
    df.agg(expr(s"percentile($c, array(0.25D, 0.5D, 0.75D))").alias("__q"))
      .select(
        round(col("__q").getItem(0), 6).alias("q25"),
        round(col("__q").getItem(1), 6).alias("q50"),
        round(col("__q").getItem(2), 6).alias("q75"))

  /** H7 — histogram: fixed-width binned counts (the rating hist,
    * exploratory_data_analysis.ipynb:4277). Rendering is out of scope; the
    * binned aggregate is the engine op. */
  def histogram(df: DataFrame, c: String, binWidth: Double): DataFrame =
    df.groupBy(floor(col(c) / binWidth).cast("long").alias("bin"))
      .count().orderBy("bin")

  /** Rollup subtotals (engine breadth; GROUP BY ROLLUP). */
  def rollupCount(df: DataFrame, keys: Seq[String]): DataFrame =
    df.rollup(keys.map(col): _*).count()

  /** Cube: every grouping-set combination in one pass (GROUP BY CUBE).
    * Spark expands the 2^k grouping sets map-side and aggregates them in
    * ONE shuffle — the same exchange count as a plain groupBy. */
  def cubeCount(df: DataFrame, keys: Seq[String]): DataFrame =
    df.cube(keys.map(col): _*).agg(count(lit(1)).alias("n"))

  /** Per-group simple linear regression (trend fit): slope / intercept /
    * r² of y on x via the closed-form moment identities
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *   intercept = (Σy − slope·Σx) / n
    *   r² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))
    * One shuffle with full map-side partial aggregation — each task ships
    * six numbers per group, never rows, so the fit costs the same
    * exchange as a group-count at any scale. All moment sums go through
    * DECIMAL (inputs bounded to 12 integer digits at 6-dp scale) so
    * shuffle order cannot flip low bits: the doubles entering the final
    * formulas are exact and engine-portable. Groups with constant x (or
    * n = 1) have a zero denominator → the op surfaces slope/r² = NULL
    * rather than a division error. */
  def linearFit(df: DataFrame, groupCol: String, xCol: String,
                yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(18,6)")
    val y = col(yCol).cast("decimal(18,6)")
    val agged = df.groupBy(col(groupCol)).agg(
      count(lit(1)).alias("n"),
      sum(x).cast("double").alias("__sx"),
      sum(y).cast("double").alias("__sy"),
      sum((x * y).cast("decimal(38,12)")).cast("double").alias("__sxy"),
      sum((x * x).cast("decimal(38,12)")).cast("double").alias("__sxx"),
      sum((y * y).cast("decimal(38,12)")).cast("double").alias("__syy"))
    val n = col("n").cast("double")
    val covn = n * col("__sxy") - col("__sx") * col("__sy")
    val varxn = n * col("__sxx") - col("__sx") * col("__sx")
    val varyn = n * col("__syy") - col("__sy") * col("__sy")
    val slope = covn / nullif(varxn, lit(0.0))
    agged.select(col(groupCol), col("n"),
      round(slope, 6).alias("slope"),
      round((col("__sy") - slope * col("__sx")) / n, 6).alias("intercept"),
      round((covn * covn) / nullif(varxn * varyn, lit(0.0)), 6).alias("r2"))
  }

  /** Per-group z-score normalization — the feature-engineering staple:
    * (x − μ_g) / σ_g with population σ. Moments come from exact DECIMAL
    * sums (shuffle-order-proof, one grouped pass) broadcast back onto the
    * rows via the group key; the normalize step is a narrow projection.
    * The broadcast assumes the GROUP COUNT is small (a stats table, one
    * row per group); for a high-cardinality group key drop the broadcast
    * hint and let the join shuffle both sides.
    * Zero-variance groups yield NULL (nullif guard), mirroring
    * `linearFit`'s degenerate-group convention. Output adds `zscore`,
    * 6-dp rounded. */
  def zscoreByGroup(df: DataFrame, groupCol: String, valueCol: String,
                    scale: Int = 6): DataFrame = {
    val moments = df.groupBy(groupCol).agg(
      count(lit(1)).alias("__n"),
      sum(col(valueCol).cast(s"decimal(18,$scale)")).alias("__s"),
      sum((col(valueCol) * col(valueCol)).cast(s"decimal(18,$scale)"))
        .alias("__s2"))
    val n = col("__n").cast("double")
    val mean = col("__s").cast("double") / n
    val variance = col("__s2").cast("double") / n - mean * mean
    df.join(broadcast(moments), Seq(groupCol))
      .withColumn("zscore",
        round((col(valueCol) - mean) / sqrt(nullif(variance, lit(0.0))), 6))
      .drop("__n", "__s", "__s2")
  }

  /** Winsorize: clamp a column to its [pLo, pHi] exact percentiles — the
    * tail-taming companion of `madOutlierKeep` that keeps every row but
    * bounds influence. The two cutpoints reduce to ONE broadcast row;
    * clamping is a narrow projection. Cutpoints and output are 6-dp
    * rounded so the clamp boundary is engine-exact. */
  def winsorize(df: DataFrame, valueCol: String,
                pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    val cuts = df.agg(
      round(expr(s"percentile($valueCol, ${pLo}D)"), 6).alias("__lo"),
      round(expr(s"percentile($valueCol, ${pHi}D)"), 6).alias("__hi"))
    df.crossJoin(broadcast(cuts))
      .withColumn(valueCol + "_w",
        round(greatest(col("__lo"), least(col("__hi"), round(col(valueCol), 6))), 6))
      .drop("__lo", "__hi")
  }

  /** Robust outlier filter: keep rows whose |value − median| stays within
    * `nSigmas` MAD-estimated standard deviations (MAD × 1.4826 ≈ σ for
    * normal data). Median/MAD resist the very outliers a mean/stddev
    * filter would absorb — the standard robust gate for messy numeric
    * feeds. Two exact-percentile aggregations, each reduced to ONE
    * broadcast row; the filter itself is a narrow pass (no shuffle of the
    * data). Both sides of the comparison are 6-dp rounded so the boundary
    * is engine-exact. At 100 TB swap the exact percentile for an
    * approximate sketch — the broadcast-threshold shape is unchanged. */
  def madOutlierKeep(df: DataFrame, valueCol: String,
                     nSigmas: Double = 3.0): DataFrame = {
    val med = df.agg(expr(s"percentile($valueCol, 0.5D)").alias("__med"))
    val dev = df.crossJoin(broadcast(med))
      .withColumn("__dev", abs(col(valueCol) - col("__med")))
    val thr = dev.agg(
      round(expr("percentile(__dev, 0.5D)") * lit(nSigmas) * lit(1.4826), 6)
        .alias("__thr"))
    dev.crossJoin(broadcast(thr))
      .filter(round(col("__dev"), 6) <= col("__thr"))
      .select(df.columns.map(col): _*)
  }

  /** Chi-square independence test between two categoricals: Σ (o−e)²/e
    * over the contingency table, e = rowTotal·colTotal/N, plus the
    * degrees of freedom (r−1)(c−1). One count shuffle builds the table;
    * marginals are broadcast re-aggregations of the (tiny) table itself,
    * never of the data. Per-cell terms go through a DECIMAL sum so the
    * statistic is partitioning-proof; identical arithmetic order in the
    * oracle keeps it bit-exact. */
  def chiSquare(df: DataFrame, a: String, b: String): DataFrame = {
    val obs = df.groupBy(col(a), col(b)).agg(count(lit(1)).alias("__o"))
    val rowT = obs.groupBy(col(a)).agg(sum("__o").alias("__rt"))
    val colT = obs.groupBy(col(b)).agg(sum("__o").alias("__ct"))
    val n = obs.agg(sum("__o").alias("__n"))
    obs.join(broadcast(rowT), Seq(a)).join(broadcast(colT), Seq(b))
      .crossJoin(broadcast(n))
      .withColumn("__e", col("__rt").cast("double") * col("__ct").cast("double")
        / col("__n").cast("double"))
      .withColumn("__term", (col("__o").cast("double") - col("__e"))
        * (col("__o").cast("double") - col("__e")) / col("__e"))
      .agg(
        // Zero cells never reach the observed-cell aggregation, but each
        // contributes exactly its expected mass e to χ² ((0−e)²/e = e),
        // and Σ_all e = n — so the missing-cell mass is n − Σ_observed e.
        round(sum(col("__term").cast("decimal(28,10)")).cast("double") +
          (max(col("__n")).cast("double") -
            sum(col("__e").cast("decimal(28,10)")).cast("double")), 6).alias("chi2"),
        ((countDistinct(col(a)) - 1) * (countDistinct(col(b)) - 1)).alias("dof"))
  }

  /** Exact percentile WITHOUT buffering the column: the histogram-refine
    * two-pass plan. Spark's exact `percentile` (and the winsorize/MAD ops
    * built on it) collects every value into the merging aggregation
    * buffer — correct, but memory ∝ column size, which is the one shape
    * that cannot survive a 100 TB column. This computes the SAME
    * interpolated value (quantile_cont semantics, 6-dp rounded) in three
    * bounded steps:
    *
    *   1. one aggregation → (n, min, max);
    *   2. one scan → counts over `bins` equal-width buckets (the shuffle
    *      carries ≤ `bins` rows; the driver sees only the histogram);
    *   3. the cumulative histogram pins the two order statistics
    *      h = p·(n−1) needs to their buckets, and one final narrow scan
    *      ranks JUST those buckets (expected n/bins rows each) with a
    *      per-bucket window.
    *
    * Interpolation runs on the driver over the ≤ 2 picked rows with the
    * same lower + (upper−lower)·frac arithmetic the single-pass exact
    * form uses. Heavily skewed columns can still concentrate one bucket —
    * the general fix is recursing step 2-3 on the fat bucket; one level
    * is implemented because fixture-scale data never needs the second.
    * All driver materializations are bounded by `bins`, never by n. */
  def percentileTwoPass(df: DataFrame, valueCol: String, p: Double,
                        bins: Int = 4096): DataFrame = {
    require(p >= 0.0 && p <= 1.0, s"percentileTwoPass: need 0 <= p <= 1, got $p")
    require(bins >= 1, s"percentileTwoPass: need bins >= 1, got $bins")
    val spark = df.sparkSession
    val vals = df.select(col(valueCol).cast("double").alias("__v"))
      .filter(col("__v").isNotNull)
    val stats = vals.agg(count(lit(1)).alias("n"),
      min("__v").alias("mn"), max("__v").alias("mx")).head()
    val n = stats.getLong(0)
    require(n > 0, "percentileTwoPass: no non-null values")
    val (mn, mx) = (stats.getDouble(1), stats.getDouble(2))
    def result(v: Double): DataFrame = {
      val rounded = BigDecimal(v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      spark.range(1).select(lit(p).alias("p"), lit(rounded).alias("value"))
    }
    if (mn == mx) return result(mn)
    val width = (mx - mn) / bins
    val binOf = least(floor((col("__v") - lit(mn)) / lit(width)).cast("int"),
      lit(bins - 1))
    val hist = vals.groupBy(binOf.alias("__b")).agg(count(lit(1)).alias("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val h = p * (n - 1)                      // 0-based fractional rank
    val rLo = math.floor(h).toLong
    val rHi = math.ceil(h).toLong
    def locate(r0: Long): (Int, Long) = {    // bucket + rows before it
      var cum = 0L
      hist.foreach { case (b, c) =>
        if (r0 < cum + c) return (b, cum)
        cum += c
      }
      throw new IllegalStateException(s"rank $r0 beyond histogram total $cum")
    }
    val (bLo, beforeLo) = locate(rLo)
    val (bHi, beforeHi) = locate(rHi)
    val w = Window.partitionBy(col("__b")).orderBy(col("__v").asc)
    val picked = vals.withColumn("__b", binOf)
      .filter(col("__b").isin(Seq(bLo, bHi).distinct: _*))
      .withColumn("__rk", row_number().over(w))
      .filter((col("__b") === bLo && col("__rk") === rLo - beforeLo + 1) ||
        (col("__b") === bHi && col("__rk") === rHi - beforeHi + 1))
      .select("__b", "__rk", "__v").collect()
    def at(b: Int, rk: Long): Double = picked
      .find(r => r.getInt(0) == b && r.getInt(1).toLong == rk)
      .getOrElse(throw new IllegalStateException(s"order statistic ($b, $rk) not found"))
      .getDouble(2)
    val vLo = at(bLo, rLo - beforeLo + 1)
    val vHi = at(bHi, rHi - beforeHi + 1)
    result(vLo + (vHi - vLo) * (h - rLo))
  }

  /** Population stability index between a reference and a current slice
    * of a numeric column — the standard "did the distribution move"
    * monitor a corpus/feature pipeline runs per release:
    * PSI = Σ_bins (p_new − p_old) · ln(p_new / p_old) over a FIXED bin
    * grid (data-independent bins keep releases comparable; Laplace
    * smoothing (+1 per bin) keeps empty bins finite instead of clipping).
    * Rule-of-thumb thresholds: < 0.1 stable, > 0.25 investigate.
    *
    * Each side reduces to one bin-count aggregation (≤ nBins rows
    * shuffle); the grid join and totals are broadcast-sized; per-bin
    * terms go through a DECIMAL sum so the statistic is
    * partitioning-proof. Returns one row (psi, n_bins). */
  def psiDrift(oldDf: DataFrame, newDf: DataFrame, valueCol: Column,
               binWidth: Double, nBins: Int): DataFrame = {
    require(nBins >= 2, s"psiDrift: need nBins >= 2, got $nBins")
    require(binWidth > 0, s"psiDrift: need binWidth > 0, got $binWidth")
    def binned(df: DataFrame, side: String): DataFrame = df
      .select(least(greatest(floor(valueCol / lit(binWidth)), lit(0)),
        lit(nBins - 1)).cast("int").alias("bin"))
      .groupBy("bin").agg(count(lit(1)).alias(side))
    val grid = oldDf.sparkSession.range(nBins)
      .select(col("id").cast("int").alias("bin"))
    val j = grid
      .join(binned(oldDf, "__no"), Seq("bin"), "left")
      .join(binned(newDf, "__nn"), Seq("bin"), "left")
      .na.fill(0L, Seq("__no", "__nn"))
    val totals = j.agg(sum("__no").alias("__to"), sum("__nn").alias("__tn"))
    j.crossJoin(broadcast(totals))
      .withColumn("__po", (col("__no") + lit(1.0)) / (col("__to") + lit(nBins)))
      .withColumn("__pn", (col("__nn") + lit(1.0)) / (col("__tn") + lit(nBins)))
      // Δp·ln-ratio pins to 9 dp before the 14-dp DECIMAL cast (the
      // cross-libm transcendental-output stance)
      .withColumn("__term",
        round((col("__pn") - col("__po")) * log(col("__pn") / col("__po")), 9))
      .agg(round(sum(col("__term").cast("decimal(28,14)")).cast("double"), 6)
        .alias("psi"), count(lit(1)).alias("n_bins"))
  }

  /** Per-group exact heavy hitters — the grouped form of
    * `exactHeavyHitters`, with NO driver collect anywhere: pass 1 runs
    * the Misra–Gries aggregate per group and explodes the candidate
    * arrays into a (group, item) table that stays distributed and is
    * broadcast into pass 2 (groups × sketchK rows — groups must be
    * dimension-sized, which is what "per source" / "per language" means);
    * pass 2 tags each row against its group's candidates with one
    * broadcast join, so the count shuffle carries at most
    * groups × (sketchK + 1) keys after map-side partials — never the
    * per-group vocabulary. The per-group integer threshold
    * cnt · k > n_group makes the output exact and deterministic. */
  def exactHeavyHittersByGroup(df: DataFrame, groupCol: String, itemCol: String,
                               k: Int, sketchK: Int): DataFrame = {
    require(sketchK >= k, s"sketchK ($sketchK) must be >= k ($k) for the " +
      "Misra-Gries superset guarantee to cover the n/k threshold")
    val cands = df.groupBy(col(groupCol))
      .agg(graft.functions.MisraGries.misra_gries(col(itemCol), sketchK).alias("__c"))
      .select(col(groupCol).alias("__g"), explode(col("__c")).alias("__item"))
    val grouped = df.select(col(groupCol), col(itemCol))
      .join(broadcast(cands),
        col(groupCol) === col("__g") && col(itemCol) === col("__item"), "left")
      .groupBy(col(groupCol), col("__item").alias("item"))
      .agg(count(lit(1)).alias("cnt"))
    val totals = grouped.groupBy(col(groupCol)).agg(sum("cnt").alias("__n"))
    grouped.filter(col("item").isNotNull)
      .join(broadcast(totals), Seq(groupCol))
      .filter(col("cnt") * lit(k.toLong) > col("__n"))
      .select(col(groupCol), col("item"), col("cnt"))
      .orderBy(col(groupCol), desc("cnt"), col("item"))
  }

  /** Exact heavy hitters at scale — the canonical two-pass plan:
    *
    * pass 1: one scan through the Misra–Gries summary
    *   (`functions.MisraGries`, O(sketchK) state, map-side partials) yields
    *   ≤ sketchK candidates guaranteed to INCLUDE every item with true
    *   frequency > n/(sketchK+1);
    * pass 2: one more scan counts ONLY those candidates exactly (the
    *   candidate list is a driver-bounded literal membership filter, so no
    *   full-vocabulary shuffle ever happens) and keeps items with
    *   exact_count · k > n — an INTEGER comparison, so the result is
    *   deterministic and independent of everything probabilistic about
    *   pass 1, as long as sketchK ≥ k (superset property).
    *
    * Returns (item, cnt) for items with count > n/k, ordered by count desc.
    * The full-vocabulary GROUP BY ... HAVING the oracle runs is exactly
    * what this plan avoids materializing at 100 TB.
    */
  def exactHeavyHitters(df: DataFrame, itemCol: String, k: Int,
                        sketchK: Int): DataFrame = {
    require(sketchK >= k, s"sketchK ($sketchK) must be >= k ($k) for the " +
      "Misra-Gries superset guarantee to cover the n/k threshold")
    val cands: Seq[String] = df
      .agg(graft.functions.MisraGries.misra_gries(col(itemCol), sketchK).alias("c"))
      .head().getSeq[String](0)
    if (cands.isEmpty) return df.sparkSession.emptyDataFrame
      .select(lit("").alias("item"), lit(0L).alias("cnt"))
    // one scan: per-candidate exact counts; everything else folds into one
    // null group that only contributes to the total
    val grouped = df
      .groupBy(when(col(itemCol).isin(cands: _*), col(itemCol)).alias("item"))
      .agg(count(lit(1)).alias("cnt"))
    val total = grouped.agg(sum("cnt").alias("__n"))
    grouped.filter(col("item").isNotNull)
      .crossJoin(broadcast(total))
      .filter(col("cnt") * lit(k.toLong) > col("__n"))
      .select(col("item"), col("cnt"))
      .orderBy(desc("cnt"), col("item"))
  }

  /** Exact fractional (average) ranks for every DISTINCT value of
    * `valueCol`, computed WITHOUT a single-task global window — the
    * unpartitioned `rank() OVER (ORDER BY v)` that textbook rank SQL
    * plans collapses the whole table into one task, which is exactly the
    * thing that cannot run at 100 TB. Shape here:
    *   1. distinct-value counts (one hash shuffle, map-side partials);
    *   2. a deterministic order-preserving bucket id computed FROM the
    *      value (equi-width over the global span — Stats.orderBucket);
    *   3. per-bucket running counts (windows partitioned by bucket id
    *      run in parallel);
    *   4. per-bucket totals cumsum'd into global offsets — a window
    *      over #buckets rows, metadata-sized by construction;
    *   5. avg_rank(v) = offset(bucket) + local_running(v) + (cnt+1)/2.
    * Every stage is declarative and bucket-parallel except the
    * offsets table, whose size is the bucket count, not the data.
    * Ranks use the average-of-positions convention for ties (what
    * Spearman needs). Returns (value, cnt, avg_rank).
    *
    * Determinism: ranks are a pure function of the value multiset —
    * the bucket id is too, so offset+local reconstructs the same global
    * rank on every evaluation (each distinct value lives in exactly one
    * bucket, so no tie straddles a boundary). */
  def fractionalRanks(df: DataFrame, valueCol: String,
                      numParts: Int = 32): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).alias("value"))
      .agg(count(lit(1)).alias("cnt"))
    // deterministic value-derived bucket, NOT spark_partition_id after a
    // range shuffle — the sampled bounds differ between the offsets
    // branch's evaluation and the final join's (see Stats.orderBucket)
    val fb = counts.agg(min(col("value")).cast("double").alias("__lo"),
      max(col("value")).cast("double").alias("__hi"))
    val pidW = Window.partitionBy("__pid").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = counts.crossJoin(broadcast(fb))
      .withColumn("__pid",
        Stats.orderBucket(col("value"), col("__lo"), col("__hi"), numParts))
      .drop("__lo", "__hi")
      .withColumn("__before", coalesce(sum("cnt").over(pidW), lit(0L)))
    val offsets = local.groupBy("__pid").agg(sum("cnt").alias("__ptot"))
      .withColumn("__off", coalesce(sum("__ptot").over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("__pid", "__off")
    local.join(broadcast(offsets), "__pid")
      .select(col("value"), col("cnt"),
        (col("__off") + col("__before") +
          (col("cnt") + 1) / lit(2.0)).alias("avg_rank"))
  }

  /** Spearman rank correlation of two numeric columns: Pearson over each
    * row's fractional ranks. Ranks come from `fractionalRanks` (the
    * distributed shape — no global window anywhere), mapped back onto
    * the rows by two value-keyed joins; the rank tables are
    * distinct-value-sized, the joins shuffle on the value keys. Ties get
    * average ranks, so this is the tie-corrected Spearman ρ. 6-dp
    * rounded double, matching the corr conventions elsewhere.
    * Ranks are computed over the PAIRWISE-COMPLETE rows (both columns
    * non-null) — ranking each column over its own non-null multiset
    * would diverge from the tie-corrected definition whenever one
    * column is null where the other is not. */
  def spearmanCorr(df: DataFrame, c1: String, c2: String): DataFrame = {
    val complete = df.select(c1, c2)
      .filter(col(c1).isNotNull && col(c2).isNotNull)
    val r1 = fractionalRanks(complete, c1)
      .select(col("value").alias(c1), col("avg_rank").alias("__r1"))
    val r2 = fractionalRanks(complete, c2)
      .select(col("value").alias(c2), col("avg_rank").alias("__r2"))
    complete
      .join(r1, c1).join(r2, c2)
      .agg(round(corr(col("__r1"), col("__r2")), 6).alias("spearman_rho"))
  }

  /** Merge two Misra-Gries summaries held as (item, cnt) TABLES into one
    * with at most `k` counters — the mergeable-summaries operation
    * (Agarwal et al.) at the DataFrame level, for summaries that OUTLIVE
    * one job: a maintained heavy-hitters table folds in each new batch's
    * counts without ever rescanning history. Sum counters by item, then
    * subtract the (k+1)-th largest merged count from every counter and
    * drop the non-positive — each merge adds at most that decrement to
    * any item's undercount, and the global bound stays n/(k+1) over the
    * TOTAL stream, so `item with true freq > n/(k+1) is always present`
    * survives arbitrary batch splits (spec-checked across a streamed
    * replay). Cost per merge: one item shuffle over summary∪batch-vocab
    * plus a top-(k+1) (TakeOrderedAndProject, never a global sort). */
  def mgMergeTables(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"mgMergeTables: need k >= 1, got $k")
    val summed = a.select(col("item"), col("cnt"))
      .unionByName(b.select(col("item"), col("cnt")))
      .groupBy("item").agg(sum("cnt").alias("cnt"))
    val kth = summed.orderBy(desc("cnt")).limit(k + 1)
      .agg(when(count(lit(1)) > k, min("cnt")).otherwise(lit(0L)).alias("__d"))
    summed.crossJoin(broadcast(kth))
      .select(col("item"), (col("cnt") - col("__d")).alias("cnt"))
      .filter(col("cnt") > 0)
  }

  /** KMV distinct estimate off a bottom-k sketch column (ArrayType[Long]
    * of 32-bit md5 draws, as produced by `bottom_k_sketch`): exact size
    * when the sketch is unsaturated, else the (k−1)/r_k estimator on the
    * k-th smallest normalized draw. Deterministic (md5 draws), so an
    * oracle replays it bit-for-bit; 6-dp-rounded double. */
  def kmvEstimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(round(lit((k - 1).toDouble) /
        (element_at(sk, k).cast("double") / lit(4294967296.0)), 6))

  /** KMV sketch ROLLUP — the mergeable-summaries cube pattern: sketches
    * pre-aggregated at a fine grain (per day, per source) re-merge to any
    * coarser grain WITHOUT rescanning the base table, because
    * bottom-k(∪ᵢ bottom-k(Sᵢ)) = bottom-k(∪ᵢ Sᵢ) — every global bottom-k
    * draw is in its own group's bottom-k. That is what makes a daily
    * sketch table answer "distinct users over any date range" at 100 TB
    * with a k-row-per-day scan instead of a base-table pass per question.
    *
    * Input: a sketch table with `skCol` (ArrayType[Long] bottom-k draws);
    * output: one merged sketch per `groups` key. Cost: explode of
    * k×fine-groups rows (tiny) + one hash shuffle keyed by the coarse
    * group. */
  def kmvRollup(sketches: DataFrame, groups: Seq[String], skCol: String,
                k: Int): DataFrame =
    sketches
      .select(groups.map(col) :+ explode(col(skCol)).alias("__h"): _*)
      .groupBy(groups.map(col): _*)
      .agg(graft.functions.BottomKSketch.bottom_k_sketch(col("__h"), k)
        .alias(skCol))

  /** Two-proportion z-test — the A/B experiment readout (did the
    * treatment slice convert at a different rate than control?). One
    * aggregation pass carrying four conditional counters; the pooled-
    * variance statistic is assembled with fixed parenthesization, all
    * divisions on explicit doubles, and 6-dp rounding, so both engines
    * evaluate the identical IEEE expression (the chiSquare stance).
    * Degenerate inputs (an empty side, pooled rate 0 or 1) yield NULL z
    * rather than ±Inf. */
  def twoProportionZ(df: DataFrame, groupB: Column, success: Column): DataFrame = {
    val counts = df.agg(
      sum(when(!groupB, 1L).otherwise(0L)).alias("n_a"),
      sum(when(!groupB && success, 1L).otherwise(0L)).alias("x_a"),
      sum(when(groupB, 1L).otherwise(0L)).alias("n_b"),
      sum(when(groupB && success, 1L).otherwise(0L)).alias("x_b"))
    val na = col("n_a").cast("double"); val xa = col("x_a").cast("double")
    val nb = col("n_b").cast("double"); val xb = col("x_b").cast("double")
    val pooled = (xa + xb) / (na + nb)
    val se = sqrt(pooled * (lit(1.0) - pooled) * (lit(1.0) / na + lit(1.0) / nb))
    counts.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      round(xa / na, 6).alias("rate_a"),
      round(xb / nb, 6).alias("rate_b"),
      round(when(se > 0, (xb / nb - xa / na) / se), 6).alias("z"))
  }

  /** Exact per-group mode with a deterministic tie-break (the smallest
    * value among the equally-most-frequent). Two levels: a value-count
    * aggregation (map-side combined — the only pass over base rows),
    * then a rank window over the tiny (group × distinct-value) count
    * table. The window never sees base data, so the operator scales
    * with the value domain, not the table. */
  def groupMode(df: DataFrame, group: String, valueCol: String): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(group), col(valueCol).alias("mode_value"))
      .agg(count(lit(1)).alias("mode_count"))
    val w = Window.partitionBy(group)
      .orderBy(desc("mode_count"), col("mode_value"))
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .orderBy(group)
  }

  /** Deterministic HyperLogLog distinct count per group, built entirely
    * from the engine-portable md5 draw family ([[ScaleDedup.hash32]]'s
    * stance) so an oracle replays it bit-for-bit: no library sketch, no
    * platform hash. Flajolet et al.'s estimator with m = 2^p registers:
    *   - 48-bit draw = first 12 hex chars of md5(value);
    *     register index = the high p bits (first p/4 hex chars),
    *     rank input w = the remaining 48−p bits.
    *   - rho(w) = leading-zero count + 1, computed on the HEX STRING
    *     (4·leading-'0'-chars + a 16-way CASE on the first non-zero
    *     digit) — exact integer arithmetic, no float log2 that could
    *     round differently across engines at exact powers of two.
    *   - Σ 2^−M_j is summed as the EXACT integer Σ 2^(maxRho−M_j)
    *     (absent registers contribute 2^maxRho), so the harmonic mean
    *     is shuffle-order-proof; only the final α·m²/S division is
    *     floating point, with fixed parenthesization.
    *   - Linear-counting small-range correction when empty registers
    *     exist and the raw estimate ≤ 2.5m.
    * The register table (group, register, M) is mergeable by max — the
    * same pre-aggregated-cube property as [[kmvRollup]]: per-day HLL
    * register tables answer any coarser distinct question without a
    * base-table rescan. p must be a multiple of 4 (hex-aligned). */
  def hllDistinct(df: DataFrame, group: String, valueCol: Column,
                  p: Int = 8): DataFrame =
    hllEstimate(hllRegisters(df, Seq(group), valueCol, p), Seq(group), p)
      .orderBy(group)

  /** The register table behind [[hllDistinct]]: one (groups…, register,
    * M_j) row per non-empty register — the persistable, MERGEABLE sketch
    * artifact. Register tables at a fine grain (per day, per source)
    * re-merge to any coarser grain by max ([[hllRollup]]) without a
    * base-table rescan. */
  def hllRegisters(df: DataFrame, groups: Seq[String], valueCol: Column,
                   p: Int): DataFrame = {
    require(p >= 4 && p <= 16 && p % 4 == 0,
      s"hllRegisters: need p in {4,8,12,16}, got $p")
    val restLen = 12 - p / 4               // hex chars carrying rho bits
    val maxRho = 4 * restLen + 1           // all-zero remainder sentinel
    val hex = md5(valueCol.cast("string").cast("binary"))
    val rest = substring(hex, p / 4 + 1, restLen)
    // leading zero BITS of the first non-zero hex digit
    val lzc = when(col("__c").isin("1"), 3)
      .when(col("__c").isin("2", "3"), 2)
      .when(col("__c").isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    df.filter(valueCol.isNotNull)
      .select(groups.map(col) ++ Seq(
        conv(substring(hex, 1, p / 4), 16, 10).cast("long").alias("__j"),
        rest.alias("__rest"), ltrim(rest, "0").alias("__strip"),
        substring(ltrim(rest, "0"), 1, 1).alias("__c")): _*)
      .withColumn("__rho",
        when(col("__strip") === "", lit(maxRho))
          .otherwise((length(col("__rest")) - length(col("__strip"))) * 4 +
            lzc + 1))
      .groupBy(groups.map(col) :+ col("__j"): _*)
      .agg(max("__rho").alias("__mj"))
  }

  /** Merge an HLL register table to a coarser grain: max per register —
    * the [[kmvRollup]] operation for HLL. Exact: max is associative and
    * idempotent, so rolled-up registers equal the registers a direct
    * coarse-grain pass would have produced. */
  def hllRollup(regs: DataFrame, groups: Seq[String]): DataFrame =
    regs.groupBy(groups.map(col) :+ col("__j"): _*)
      .agg(max("__mj").alias("__mj"))

  /** Exact sliding-window distinct count per day (the DAU/WAU family):
    * for each observed day, the distinct ids seen in the trailing
    * `windowDays` window. Shape: collapse to the distinct (day, id)
    * table once (the only base-row shuffle), then fan each pair out to
    * the ≤`windowDays` window-ends it supports — an array-expression
    * explode of an already-deduplicated, DAU-sized table, NOT a
    * non-equi range join (which would plan a broadcast nested loop over
    * base rows). Window-ends outside the observed calendar are dropped
    * by a broadcast semi-join against the (tiny, calendar-bounded) day
    * list. */
  def rollingDistinct(df: DataFrame, tsCol: Column, idCol: Column,
                      windowDays: Int): DataFrame = {
    require(windowDays >= 1 && windowDays <= 370,
      s"rollingDistinct: need 1 <= windowDays <= 370, got $windowDays")
    val du = df.filter(idCol.isNotNull)
      .select(to_date(tsCol).alias("__d"), idCol.alias("__u")).distinct()
    val days = du.select(col("__d").alias("window_end")).distinct()
    du.select(explode(sequence(col("__d"),
        date_add(col("__d"), windowDays - 1))).alias("window_end"),
        col("__u"))
      .join(broadcast(days), Seq("window_end"), "left_semi")
      .groupBy("window_end")
      .agg(countDistinct(col("__u")).alias(s"active_${windowDays}d"))
      .orderBy("window_end")
  }

  /** Daily growth accounting — the canonical active-user ledger: each
    * day's actives decompose into NEW (first day ever), RETAINED
    * (also active the previous day), and RESURRECTED (active before,
    * but not yesterday); CHURNED counts yesterday's actives who didn't
    * return today. new + retained + resurrected = DAU by construction,
    * and dau_t − dau_{t−1} = new + resurrected − churned — the identity
    * that makes the ledger audit itself. Shape: one distinct
    * (day, user) pass, a per-user first-day aggregate, and equi-joins
    * on the DAU-sized table (user, day−1) — no window, no range join. */
  def growthAccounting(df: DataFrame, tsCol: Column,
                       idCol: Column): DataFrame = {
    val du = df.filter(idCol.isNotNull)
      .select(to_date(tsCol).alias("__d"), idCol.alias("__u")).distinct()
    val firsts = du.groupBy("__u").agg(min("__d").alias("__first"))
    val prev = du.select(date_add(col("__d"), 1).alias("__d"),
      col("__u"), lit(1L).alias("__wasActive"))
    val today = du
      .join(firsts, "__u")
      .join(prev, Seq("__d", "__u"), "left")
      .groupBy(col("__d").alias("d"))
      .agg(count(lit(1)).alias("dau"),
        sum(when(col("__first") === col("__d"), 1L).otherwise(0L))
          .alias("n_new"),
        sum(when(col("__wasActive") === 1L, 1L).otherwise(0L))
          .alias("n_retained"),
        sum(when(col("__first") < col("__d") && col("__wasActive").isNull,
          1L).otherwise(0L)).alias("n_resurrected"))
    val churned = du.alias("y")
      .join(du.alias("t"),
        col("y.__u") === col("t.__u") &&
          date_add(col("y.__d"), 1) === col("t.__d"), "left_anti")
      .groupBy(date_add(col("__d"), 1).alias("d"))
      .agg(count(lit(1)).alias("n_churned"))
    today.join(churned, Seq("d"), "left")
      .na.fill(0L, Seq("n_churned"))
      .orderBy("d")
  }

  /** The HLL estimator over a register table ([[hllRegisters]]):
    * Σ 2^−M_j as the EXACT integer Σ 2^(maxRho−M_j) (absent registers
    * contribute 2^maxRho), α·m²/S in fixed-parenthesization doubles,
    * linear counting when empty registers exist and raw ≤ 2.5m. */
  def hllEstimate(regs: DataFrame, groups: Seq[String], p: Int): DataFrame = {
    val m = 1 << p
    val restLen = 12 - p / 4
    val maxRho = 4 * restLen + 1
    val scale = math.pow(2.0, maxRho).toLong
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    regs.groupBy(groups.map(col): _*)
      .agg(
        sum(pow(lit(2.0), lit(maxRho.toDouble) - col("__mj")).cast("long"))
          .alias("__sp"),
        count(lit(1)).alias("__npresent"))
      .withColumn("__s",
        col("__sp") + (lit(m.toLong) - col("__npresent")) * scale)
      .withColumn("__raw",
        alpha * lit(m.toDouble) * lit(m.toDouble) * lit(scale.toDouble) /
          col("__s").cast("double"))
      .withColumn("__v", lit(m.toLong) - col("__npresent"))
      .select(groups.map(col) :+
        round(when(col("__v") > 0 && col("__raw") <= lit(2.5 * m),
          lit(m.toDouble) * log(lit(m.toDouble) / col("__v").cast("double")))
          .otherwise(col("__raw")), 4).alias("hll_distinct"): _*)
  }
}
