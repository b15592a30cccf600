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
}
