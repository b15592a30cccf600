package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain mixing for training corpora: deterministic per-stratum sampling
  * rates (e.g. "keep 100% of books, 30% of common-crawl, 10% of forums").
  *
  * Why not `df.sample()` / `sampleBy()`: their draws depend on partition
  * layout and RNG seeds per task, so the selected SET changes across
  * cluster sizes, retries, and re-runs — a training corpus must be
  * reproducible row-for-row. Here the keep decision is a pure function of
  * (stratum, id): md5-derived uniform hash < rate · 2³². Same inputs ⇒
  * same corpus on 1 executor or 1000, and the filter is a narrow
  * codegen'd predicate on the scan — zero shuffle, zero RNG state.
  *
  * The hash is salted with the stratum key, so the same id appearing in
  * two strata draws independently, and re-sampling a stratum at a higher
  * rate yields a SUPERSET of the lower-rate sample (hash < r is monotone
  * in r) — handy for mix re-weighting without re-reading other strata.
  */
object Mix {

  /** Keep rows where hash(key, id) falls under the stratum's rate.
    * `rates` maps stratum values to [0, 1] keep-rates; unlisted strata
    * use `defaultRate`. The rate lookup compiles to a literal when-chain
    * (strata counts are small by definition — domains, not keys). */
  def stratifiedSample(df: DataFrame, keyCol: String, idCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "sampling rates must be in [0, 1]")
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (k, r)) => when(col(keyCol) === k, lit(r)).otherwise(acc)
    }
    df.filter(keepHash(col(keyCol), col(idCol)) < rate * lit(4294967296.0))
  }

  /** The uniform [0, 2³²) draw: md5 of "stratum|id" (stratum-salted so
    * strata draw independently). */
  private[graft] def keepHash(key: Column, id: Column): Column =
    ScaleDedup.hash32(concat_ws("|", key, id.cast("string")), 0)

  /** Weighted sample without replacement, k rows with inclusion odds
    * proportional to `weightCol` — the Efraimidis–Spirakis order-sample:
    * each row draws u = (hash(id)+0.5)/2³² ∈ (0,1) and the k LARGEST
    * ln(u)/weight keys win (the log form of u^(1/w); heavier rows pull
    * keys toward 0). The mix use-case: length- or score-weighted corpus
    * subsets that stay reproducible row-for-row — same md5 determinism
    * story as stratifiedSample, no RNG state, no partition-layout
    * dependence. Keys are 9-dp rounded and tie-broken on id, so the
    * selection boundary is engine-exact.
    *
    * Plan shape: the key is a narrow expression on the scan and
    * orderBy+limit compiles to TakeOrderedAndProject — every task keeps a
    * k-row heap and the driver merges task tops; no global sort at any
    * corpus size (same note as Inspect.exactRandomSample). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    val u = (keepHash(lit("ws"), col(idCol)) + lit(0.5)) / lit(4294967296.0)
    df.withColumn("draw_key", round(log(u) / col(weightCol), 9))
      .orderBy(desc("draw_key"), col(idCol))
      .limit(k)
  }

  /** Temperature-scaled (α-)sampling — the multilingual/domain
    * rebalancing rule (XLM-R's q_i ∝ p_i^α): big domains are downsampled
    * toward, small domains kept toward, a flattened mixture. Target
    * share q_i = n_i^α / Σ n_j^α; each domain's keep-rate is
    * min(1, budget·N·q_i / n_i), i.e. the sampled corpus approaches
    * `budget`·N rows distributed by q (capped domains keep everything).
    * α = 1 reproduces the natural mix scaled by `budget`; α = 0 is
    * uniform-across-domains.
    *
    * Determinism: per-domain n_i^α rounds to 9 dp before the
    * DECIMAL(28,9) normalizer sum, the rate is one fixed-parenthesization
    * double expression rounded to 9 dp, and the keep decision is the
    * [[stratifiedSample]] md5 draw — so the selected SET is identical on
    * any engine/cluster/partitioning. Scale shape: two domain-sized
    * aggregations (broadcast back), then a narrow codegen'd filter on
    * the scan — the corpus never shuffles. Returns the per-domain audit
    * (key, n_total, rate, n_kept); use the same rate table with
    * [[stratifiedSample]]'s filter to emit the rows themselves. */
  def alphaSample(df: DataFrame, keyCol: String, idCol: String,
                  alpha: Double, budget: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alphaSample: bad alpha $alpha")
    require(budget > 0.0 && budget <= 1.0, s"alphaSample: bad budget $budget")
    val counts = df.groupBy(col(keyCol).alias("__k"))
      .agg(count(lit(1)).alias("__n"))
      .select(col("__k"), col("__n"),
        round(pow(col("__n").cast("double"), lit(alpha)), 9).alias("__p"))
    val tot = counts.agg(sum("__n").alias("__t"),
      sum(col("__p").cast("decimal(28,9)")).cast("double").alias("__s"))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col("__k"), col("__n"),
        round(least(lit(1.0),
          ((lit(budget) * col("__t").cast("double")) * col("__p")) /
            (col("__s") * col("__n").cast("double"))), 9).alias("rate"))
    val kept = df
      .join(broadcast(rates.select(col("__k"), col("rate"))),
        col(keyCol) === col("__k"))
      .filter(keepHash(col(keyCol), col(idCol)) < col("rate") * lit(4294967296.0))
      .groupBy(col(keyCol).alias("__k")).agg(count(lit(1)).alias("__kept"))
    rates.join(kept, Seq("__k"), "left")
      .select(col("__k").alias(keyCol), col("__n").alias("n_total"),
        col("rate"), coalesce(col("__kept"), lit(0L)).alias("n_kept"))
      .orderBy(keyCol)
  }

  /** word2vec-style negative sampling from the unigram^0.75 distribution
    * — deterministic draws, SCALE-CORRECT inverse-CDF lookup. The
    * smoothed distribution (Mikolov et al. 2013: p ∝ count^0.75) is the
    * one contrastive trainers actually sample; the engineering question
    * at 100 TB is the lookup: a draw⋈vocab range join is the quadratic
    * nested-loop this engine bans. Instead the cumulative [lo, hi) table
    * is indexed into `buckets` equi-width cells (each token explodes to
    * the ≤ span-width cells it overlaps — index size ≤ vocab + buckets),
    * a draw's cell is floor(u·buckets) BY CONSTRUCTION (u ∈ [0,1)), and
    * the lookup becomes one broadcast EQUI-join + containment filter.
    * Draws are md5-uniform per (doc, j) ([[stratifiedSample]]'s
    * no-RNG-state stance). Cumulative doubles accumulate in ONE pinned
    * token order on both engines (ordered window over the vocab table),
    * and Z is the last cumulative's hi — never a separately-ordered
    * re-sum. Output: top-N tokens by sampled count vs expectation. */
  def negativeSamples(df: DataFrame, idCol: String, textCol: String,
                      drawsPerDoc: Int = 3, buckets: Int = 256,
                      topN: Int = 30): DataFrame = {
    require(drawsPerDoc >= 1 && drawsPerDoc <= 64 &&
      buckets >= 16 && buckets <= 65536 && topN >= 1,
      s"negativeSamples: bad drawsPerDoc=$drawsPerDoc buckets=$buckets")
    val counts = df
      .select(explode(split(col(textCol), " ")).alias("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).alias("__c"))
    // pow OUTPUT pins to 9 dp: the cumulative interval bounds and Z are
    // IEEE sums of these weights in one pinned order, so pinned inputs
    // make every bucket-boundary compare engine-identical (a raw libm
    // pow ulp could reassign a draw sitting exactly on a token edge)
    val w = round(pow(col("__c").cast("double"), lit(0.75)), 9)
    val cumW = org.apache.spark.sql.expressions.Window.orderBy("token")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cum = counts
      .withColumn("__w", w)
      .withColumn("__lo", coalesce(sum("__w").over(cumW), lit(0.0)))
      .withColumn("__hi", col("__lo") + col("__w"))
    val z = cum.agg(max("__hi").alias("__z"))
    val idx = cum.crossJoin(broadcast(z))
      .select(col("token"), col("__w"), col("__lo"), col("__hi"), col("__z"),
        explode(sequence(
          floor(col("__lo") / col("__z") * lit(buckets.toDouble)).cast("int"),
          least(floor(col("__hi") / col("__z") * lit(buckets.toDouble)),
            lit((buckets - 1).toDouble)).cast("int"))).alias("__b"))
    val draws = df
      .select(col(idCol).cast("string").alias("__id"),
        explode(sequence(lit(0), lit(drawsPerDoc - 1))).alias("__j"))
      .select((graft.ops.ScaleDedup.hash32(
          concat_ws(":", col("__id"), col("__j").cast("string")), 2)
        .cast("double") / lit(4294967296.0)).alias("__u"))
      .select(col("__u"), floor(col("__u") * lit(buckets.toDouble))
        .cast("int").alias("__b"))
    val nDraws = draws.agg(count(lit(1)).alias("__nd"))
    draws.join(broadcast(idx), "__b")
      .filter(col("__lo") <= col("__u") * col("__z") &&
        col("__u") * col("__z") < col("__hi"))
      .groupBy("token")
      .agg(count(lit(1)).alias("n_sampled"), max("__w").alias("__tw"),
        max("__z").alias("__tz"))
      .crossJoin(broadcast(nDraws))
      .select(col("token"), col("n_sampled"),
        round(col("__nd").cast("double") * (col("__tw") / col("__tz")), 6)
          .alias("expected"),
        round(col("n_sampled").cast("double") /
          (col("__nd").cast("double") * (col("__tw") / col("__tz"))), 6)
          .alias("ratio"))
      .orderBy(desc("n_sampled"), col("token"))
      .limit(topN)
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169): score every raw document by how much more likely
    * its hashed-n-gram features are under a small TARGET corpus's
    * feature distribution than under the raw SOURCE distribution, then
    * keep the top slice. The published recipe exactly: features are word
    * unigrams + bigrams hashed into `buckets` cells, both distributions
    * are add-one-smoothed bucket frequencies, and a document's importance
    * weight is Σ_f [ln p̂_target(b(f)) − ln p̂_source(b(f))] over its
    * feature MULTISET (counts matter — repetition is signal here).
    *
    * Scale shape (the whole point of the hashed approximation): the
    * feature explode is row-local; bucket counting is ONE map-side-
    * combined shuffle that collapses to ≤ `buckets` rows; the log-ratio
    * table is ≤ `buckets` rows and broadcasts; per-doc scoring is one
    * map-side-combined (id, partial-sum) shuffle. Document text NEVER
    * crosses the wire, and nothing anywhere is proportional to
    * |target|×|source|.
    *
    * Determinism: per-bucket log-ratios round to 9 dp, the per-doc sum
    * runs in DECIMAL(28,9) (exact, order-independent — the repo's
    * exactSum law), and the readout is signed-zero-safe ([[round0]]).
    * Returns (id, n_feats, weight) for SOURCE docs only; top-slice
    * selection is `orderBy(desc("weight"), id).limit(k)` at the call
    * site, which compiles to TakeOrderedAndProject (per-task k-row
    * heaps, no global sort). */
  def dsirImportance(df: DataFrame, idCol: String, textCol: String,
                     isTarget: Column, buckets: Int = 64): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"dsirImportance: bad buckets=$buckets")
    val toks = split(col(textCol), " ")
    val ex = df.select(col(idCol), isTarget.alias("__t"),
        explode(concat(toks, ScaleDedup.wordBigrams(toks, " "))).alias("__f"))
      .select(col(idCol), col("__t"),
        pmod(ScaleDedup.hash32(col("__f"), 0), lit(buckets.toLong)).alias("__b"))
    val bc = ex.groupBy("__b").agg(
      sum(when(col("__t"), 1L).otherwise(0L)).alias("__tc"),
      sum(when(!col("__t"), 1L).otherwise(0L)).alias("__sc"))
    val tot = bc.agg(sum("__tc").alias("__tt"), sum("__sc").alias("__st"))
    val lw = bc.crossJoin(broadcast(tot)).select(col("__b"),
      round(log((col("__tc") + lit(1)).cast("double") /
            (col("__tt") + lit(buckets)).cast("double")) -
            log((col("__sc") + lit(1)).cast("double") /
            (col("__st") + lit(buckets)).cast("double")), 9).alias("__lw"))
    ex.filter(!col("__t"))
      .join(broadcast(lw), "__b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).alias("n_feats"),
        round0(sum(col("__lw").cast("decimal(28,9)")).cast("double"), 6)
          .alias("weight"))
  }
}
