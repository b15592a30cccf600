package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.window.WindowGroupLimitExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gate for the most expensive non-TPC-H queries
  * (TpchSpec covers the suite): the properties that make each one viable
  * at 100 TB — no nested-loop/cartesian fallbacks, document text staying
  * out of every shuffle, map-side WindowGroupLimit on top-k paths,
  * broadcast dims — asserted against the EXECUTED (post-AQE) plan, so a
  * change that keeps values right but wrecks the scale plan fails
  * `sbt test` instead of waiting for a bench delta. */
class PlanAuditSpec extends AnyFunSuite with SparkSpec
    with AdaptiveSparkPlanHelper {

  private def executedPlan(df: DataFrame) = {
    df.write.format("noop").mode("overwrite").save() // finalize AQE
    df.queryExecution.executedPlan
  }

  private def run(name: String) =
    executedPlan(SparkEntry.queries(name)(spark, sf0))

  /** No BroadcastNestedLoopJoin with a non-trivial (non-single-row)
    * stream side and no CartesianProduct: the silent O(n·m) fallbacks.
    * Broadcast-scalar crossJoins (one-row thresholds/vocab artifacts)
    * are the documented exception — they pass because the BUILD side is
    * one row, which planwise is still a BroadcastNestedLoopJoin, so the
    * assertion here is only on CartesianProduct plus nested loops whose
    * build side is a multi-row plan. */
  private def assertNoQuadraticJoin(name: String): Unit = {
    val plan = run(name)
    assert(!plan.toString.contains("CartesianProduct"),
      s"$name plans a CartesianProduct:\n$plan")
  }

  /** The document text column must never be a COMPUTATION shuffle
    * payload: every near-dup/prep operator is designed so only
    * fingerprints, band keys, token hashes, and ids cross the wire.
    * The final range exchange that globally sorts the RESULT rows for
    * the deterministic oracle compare legitimately carries the
    * surviving text, so only hash-partitioned exchanges are audited. */
  private def assertTextNeverShuffles(name: String): Unit = {
    val plan = run(name)
    val shuffles = collectWithSubqueries(plan) { case s: ShuffleExchangeExec => s }
    assert(shuffles.nonEmpty, s"$name: expected at least one exchange")
    val leaky = shuffles.filter(s =>
      s.outputPartitioning.toString.contains("hashpartitioning") &&
        s.output.exists(_.name == "text"))
    assert(leaky.isEmpty,
      s"$name shuffles the text column:\n${leaky.headOption.getOrElse("")}")
  }

  test("q_semdedup: within-cell pairing is an equi-join, never all-pairs") {
    assertNoQuadraticJoin("q_semdedup")
  }

  test("q_dbscan: eps-grid candidate join is an equi-join, never all-pairs") {
    assertNoQuadraticJoin("q_dbscan")
  }

  test("q_lof: within-cell kNN is an equi-join, never all-pairs") {
    assertNoQuadraticJoin("q_lof")
  }

  test("q_psm_att: caliper match is a bucket equi-join, never all-pairs") {
    assertNoQuadraticJoin("q_psm_att")
  }

  test("q_sprt: running (n,k) is bucket-distributed — no arm-only full-stream window") {
    val plan = run("q_sprt")
    val wins = collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, s"q_sprt lost its windows entirely:\n$plan")
    // A window partitioned by the arm alone that still carries the
    // per-event success column would be the scale-killer shape: every
    // event of an arm sorting through ONE task. The distributed
    // cumulative's data window partitions by (arm, ts-bucket); the only
    // single-column window allowed is the offset cumsum over the
    // arms-by-buckets metadata table (which has no per-event columns).
    val armOnly = wins.filter(w => w.partitionSpec.size == 1 &&
      w.child.output.exists(_.name == "__s"))
    assert(armOnly.isEmpty,
      s"q_sprt plans an arm-only window over the raw event stream:\n${armOnly.headOption.getOrElse("")}")
  }

  test("q_wasserstein / q_cramer_von_mises: windows run over the collapsed value table, never raw rows") {
    // The scale contract of the ksTest-machinery family: the row stream
    // collapses to per-distinct-value counts BEFORE anything ordered
    // happens, so no window's child may still carry the raw value
    // column; the only unpartitioned window is the numParts-row offsets
    // cumsum over the bucket metadata table (no per-value counts).
    for ((name, raw) <- Seq("q_wasserstein" -> "l_quantity",
      "q_cramer_von_mises" -> "value")) {
      val plan = run(name)
      val wins = collectWithSubqueries(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.nonEmpty, s"$name lost its windows entirely:\n$plan")
      val overRaw = wins.filter(_.child.output.exists(_.name == raw))
      assert(overRaw.isEmpty,
        s"$name plans a window over raw rows:\n${overRaw.headOption.getOrElse("")}")
      val globalOverCounts = wins.filter(w => w.partitionSpec.isEmpty &&
        w.child.output.exists(_.name == "__ca"))
      assert(globalOverCounts.isEmpty,
        s"$name plans an unpartitioned window over the per-value count " +
          s"table:\n${globalOverCounts.headOption.getOrElse("")}")
    }
  }

  test("q_hill_tail: top-(k+1) selection is a TakeOrderedAndProject, not a sort") {
    val plan = run("q_hill_tail")
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"q_hill_tail lost its TakeOrderedAndProject:\n$plan")
  }

  test("q_ngram_diversity: gram counts shuffle tokens, never text") {
    assertTextNeverShuffles("q_ngram_diversity")
  }

  test("q_llm_prep_fuzzy: full fuzzy-dedup flagship keeps text out of every shuffle") {
    assertTextNeverShuffles("q_llm_prep_fuzzy")
    assertNoQuadraticJoin("q_llm_prep_fuzzy")
  }

  test("q_span_dedup: span dedup shuffles gram hashes, not text") {
    assertTextNeverShuffles("q_span_dedup")
  }

  test("q_bm25_topk: per-query top-k plans a map-side WindowGroupLimit") {
    val plan = run("q_bm25_topk")
    val wgl = collectWithSubqueries(plan) { case w: WindowGroupLimitExec => w }
    assert(wgl.nonEmpty, s"q_bm25_topk lost its WindowGroupLimit:\n$plan")
    assertTextNeverShuffles("q_bm25_topk")
  }

  test("q_qlm_topk: QL ranker keeps BM25's posting shape — WindowGroupLimit, no text shuffle") {
    val plan = run("q_qlm_topk")
    val wgl = collectWithSubqueries(plan) { case w: WindowGroupLimitExec => w }
    assert(wgl.nonEmpty, s"q_qlm_topk lost its WindowGroupLimit:\n$plan")
    assertTextNeverShuffles("q_qlm_topk")
  }

  test("q_rank_eval: eval joins stay on ≤k-per-query tables, text never shuffles") {
    assertTextNeverShuffles("q_rank_eval")
  }

  test("q_ann_pq: compressed-domain search keeps joins broadcast, no cartesian") {
    assertNoQuadraticJoin("q_ann_pq")
  }

  test("q_ann_batch: broadcast probe set + map-side WindowGroupLimit") {
    val plan = run("q_ann_batch")
    val wgl = collectWithSubqueries(plan) { case w: WindowGroupLimitExec => w }
    assert(wgl.nonEmpty, s"q_ann_batch lost its WindowGroupLimit:\n$plan")
  }

  test("q_dedup_clusters: pointer jumping joins stay hash/broadcast, no cartesian") {
    assertNoQuadraticJoin("q_dedup_clusters")
  }

  test("headliner q_pivot_ratings: single-shuffle conditional agg + broadcast join-back") {
    val plan = run("q_pivot_ratings")
    val bhj = collectWithSubqueries(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"pivot join-back no longer broadcasts:\n$plan")
  }

  test("headliner q_dedup_keep_first: keep-first dedup is one hash exchange") {
    val plan = run("q_dedup_keep_first")
    val shuffles = collectWithSubqueries(plan) { case s: ShuffleExchangeExec => s }
    val hash = shuffles.filter(_.outputPartitioning.toString.contains("hashpartitioning"))
    assert(hash.size <= 1,
      s"q_dedup_keep_first grew extra hash exchanges (${hash.size}):\n$plan")
  }

  test("headliner q_minhash_pairs: LSH banding never shuffles text") {
    assertTextNeverShuffles("q_minhash_pairs")
  }

  test("headliner q_text_quality: quality scoring is scan-local (no text shuffle)") {
    val plan = run("q_text_quality")
    val shuffles = collectWithSubqueries(plan) { case s: ShuffleExchangeExec => s }
    val leaky = shuffles.filter(_.output.exists(_.name == "text"))
    assert(leaky.isEmpty, s"q_text_quality shuffles text:\n$plan")
  }

  /** No Window over an unpartitioned SinglePartition child whose input
    * is row-scale: the ranked stats run their cumulatives inside range
    * partitions (withCumBefore); the only global-window inputs allowed
    * are the documented bounded tables (per-PARTITION offset rows,
    * calendar-grain series). Heuristic: every single-partition window's
    * input plan must sit behind an aggregation or be the 32-row offset
    * table — here asserted as "the window's child partitioning is not
    * the raw scan", by requiring at least one HashAggregate below it. */
  private def assertWindowsBehindAggregation(name: String): Unit = {
    val plan = run(name)
    val windows = collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    windows.foreach { w =>
      val aggBelow = w.child.collect {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
        case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
        case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
      }
      assert(aggBelow.nonEmpty,
        s"$name has a window running over unaggregated rows:\n$w")
    }
  }

  test("q_mannwhitney: ranks run on the per-value table, windows behind aggregation") {
    assertWindowsBehindAggregation("q_mannwhitney")
    assertNoQuadraticJoin("q_mannwhitney")
  }

  test("q_gini: rank-sum identity never windows raw rows") {
    assertWindowsBehindAggregation("q_gini")
  }

  test("q_rfm: band tables window per-value counts only; scored join keeps hash shape") {
    assertWindowsBehindAggregation("q_rfm")
    assertNoQuadraticJoin("q_rfm")
  }

  test("q_mahalanobis: broadcast moments + top-k via TakeOrderedAndProject") {
    val plan = run("q_mahalanobis")
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"q_mahalanobis lost its TakeOrderedAndProject:\n$plan")
    assertNoQuadraticJoin("q_mahalanobis")
  }

  test("q_basket_triples: A-priori pruning keeps pair/triple joins hash or broadcast") {
    assertNoQuadraticJoin("q_basket_triples")
  }

  test("q_jaro_winkler: banded blocking joins on equi keys, never all-pairs") {
    assertNoQuadraticJoin("q_jaro_winkler")
  }

  /** kCore references each round's edge set three times (degree union +
    * both endpoint semi-joins): without per-round checkpoints the plan
    * holds 3^rounds copies of the source scan. Assert the truncation so
    * a refactor can't silently drop it — 8 rounds un-truncated would put
    * thousands of leaves in the plan; checkpointed it's a handful. */
  test("kCore truncates lineage per peel round (3^rounds guard)") {
    import spark.implicits._
    val edges = (1L to 40L).map(i => (i, i % 20 + 1)).toDF("src", "dst")
    val core = ops.Graph.kCore(edges, k = 2, rounds = 8)
    val leaves = core.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size <= 8,
      s"kCore lineage not truncated: ${leaves.size} plan leaves")
  }

  test("kCoreWeighted and labelPropagation truncate lineage per round") {
    import spark.implicits._
    val wedges = (1L to 40L).map(i => (i, i % 20 + 1, 0.5)).toDF("src", "dst", "w")
    val wl = ops.Graph.kCoreWeighted(wedges, minWeight = 0.5, rounds = 8)
      .queryExecution.optimizedPlan.collectLeaves()
    assert(wl.size <= 8, s"kCoreWeighted lineage: ${wl.size} leaves")
    val edges = (1L to 40L).map(i => (i, i % 20 + 1)).toDF("src", "dst")
    val ll = ops.Graph.labelPropagation(edges, rounds = 8)
      .queryExecution.optimizedPlan.collectLeaves()
    assert(ll.size <= 8, s"labelPropagation lineage: ${ll.size} leaves")
  }

  test("graph-family queries join on equi keys only, never all-pairs") {
    assertNoQuadraticJoin("q_edge_support")
    assertNoQuadraticJoin("q_communities")
    assertNoQuadraticJoin("q_kcore_weighted")
  }

  test("kTruss truncates lineage per sweep (triple self-join rounds)") {
    import spark.implicits._
    val edges = (1L to 40L).map(i => (i, i % 20 + 1)).toDF("src", "dst")
    val tl = ops.Graph.kTruss(edges, k = 3, rounds = 6)
      .queryExecution.optimizedPlan.collectLeaves()
    // final support recompute legitimately fans the last checkpoint a few
    // times; un-truncated it would be 3^6-scale
    assert(tl.size <= 16, s"kTruss lineage: ${tl.size} leaves")
  }

  /** The ranked/ordered statistics reduce to calendar- or
    * aggregation-bounded tables BEFORE any ordered window runs — the
    * documented reason their global windows are safe at 100 TB. Pin it. */
  test("q_spearman: rank windows run on aggregated tables only") {
    assertWindowsBehindAggregation("q_spearman")
  }

  test("q_acf: lag windows run on the calendar-aggregated series") {
    assertWindowsBehindAggregation("q_acf")
  }

  test("q_survival_km: KM product window runs on the per-day event table") {
    assertWindowsBehindAggregation("q_survival_km")
  }

  test("round-8 series/rank ops: windows run on aggregated tables only") {
    // stl/sax window the calendar-bounded daily series; weighted median
    // cumulates over the distinct-value table; concurrency sweeps the
    // 2×sessions delta table; group mode ranks the value-count table
    assertWindowsBehindAggregation("q_stl_decompose")
    assertWindowsBehindAggregation("q_sax_symbols")
    assertWindowsBehindAggregation("q_weighted_median")
    assertWindowsBehindAggregation("q_group_mode")
  }

  test("q_concurrency: only the GLOBAL sweep window must sit behind the " +
    "session aggregation (sessionize windows are user-partitioned)") {
    val plan = run("q_concurrency")
    val windows = collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    val global = windows.filter(_.partitionSpec.isEmpty)
    assert(global.nonEmpty, s"q_concurrency lost its sweep window:\n$plan")
    global.foreach { w =>
      val aggBelow = w.child.collect {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
        case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
      }
      assert(aggBelow.nonEmpty,
        s"q_concurrency sweeps unaggregated rows:\n$w")
    }
  }

  test("harmonicCentrality truncates lineage per hop (union + join rounds)") {
    import spark.implicits._
    val und = (1L to 40L).map(i => (i, i % 20 + 1))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(1L, 2L).toDF("node")
    val hl = ops.Graph.harmonicCentrality(edges, seeds, hops = 8)
      .queryExecution.optimizedPlan.collectLeaves()
    assert(hl.size <= 8, s"harmonicCentrality lineage: ${hl.size} leaves")
  }

  test("round-8 fan-out ops join on equi keys only, never all-pairs") {
    // followsPairs self-joins the per-key firsts table on the key;
    // rollingDistinct fans out THEN semi-joins the day list (no range
    // join); centroid classify broadcasts the label-sized centroid table
    assertNoQuadraticJoin("q_follows_pairs")
    assertNoQuadraticJoin("q_rolling_distinct")
  }

  test("round-8 second wave: windows stay behind aggregation") {
    // PR curve cumulates the per-threshold table; vocab coverage ranks
    // the vocabulary table; item CF ranks the pair-count table;
    // interval union sweeps the interval table
    assertWindowsBehindAggregation("q_pr_curve")
    assertWindowsBehindAggregation("q_vocab_coverage")
    assertWindowsBehindAggregation("q_item_cf")
  }

  test("round-8 second wave: fan-out ops never plan an all-pairs join") {
    // Adamic-Adar wedges are two equi-joins; growth accounting joins the
    // (user, day-1) key; item CF self-joins on the basket key
    assertNoQuadraticJoin("q_link_predict")
    assertNoQuadraticJoin("q_growth_accounting")
    assertNoQuadraticJoin("q_item_cf")
    assertNoQuadraticJoin("q_dedup_keep_best")
  }

  test("late-round wave: windows stay behind aggregation") {
    // runs test lags the calendar-bounded daily series; quantile
    // normalization ranks the per-(group, value) count table
    assertWindowsBehindAggregation("q_runs_test")
    assertWindowsBehindAggregation("q_quantile_normalize")
  }

  test("late-round wave: pair/score ops never plan an all-pairs join") {
    // clustering coefficient = degree-oriented wedge equi-joins;
    // linkage scoring joins the blocking output against one broadcast
    // cell row; HBOS joins broadcast bin-count cells; dispersion's whole
    // point is NO pairwise join (the resultant identity)
    assertNoQuadraticJoin("q_clustering_coeff")
    assertNoQuadraticJoin("q_linkage_score")
    assertNoQuadraticJoin("q_hbos")
    assertNoQuadraticJoin("q_embedding_dispersion")
  }

  test("final wave: windows stay behind aggregation") {
    // kruskal ranks the per-value table; hurst windows per (size, block)
    // over the calendar-bounded series; token budget cumulates the
    // band-count table; log-rank risk sets cumulate the duration table
    assertWindowsBehindAggregation("q_kruskal_wallis")
    assertWindowsBehindAggregation("q_hurst")
    assertWindowsBehindAggregation("q_token_budget")
    assertWindowsBehindAggregation("q_logrank")
  }

  test("final wave: fan-out/join ops never plan an all-pairs join") {
    // negative sampling is the bucketed equi-join (the op exists to
    // avoid the range nested-loop); keyness/capture are vocab joins;
    // agreement/quality joins are id- or cluster-keyed
    assertNoQuadraticJoin("q_neg_sampling")
    assertNoQuadraticJoin("q_keyness")
    assertNoQuadraticJoin("q_capture_recapture")
    assertNoQuadraticJoin("q_cluster_agreement")
  }

  test("q_permutation_test: every rank window is replicate-partitioned") {
    // the 30M-row explode would be a disaster under ONE global sort;
    // the exact-margin ranking must stay partitioned by replicate
    val plan = run("q_permutation_test")
    val windows = collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, s"q_permutation_test lost its rank window:\n$plan")
    val global = windows.filter(_.partitionSpec.isEmpty)
    assert(global.isEmpty,
      s"q_permutation_test plans a GLOBAL window:\n${global.headOption.getOrElse("")}")
  }

  test("q_dsir_weights: DSIR shuffles hashed buckets and id partials, never text") {
    assertTextNeverShuffles("q_dsir_weights")
    assertNoQuadraticJoin("q_dsir_weights")
    // the log-ratio table joins in as a BROADCAST build, not a shuffle
    val plan = run("q_dsir_weights")
    val bhj = collectWithSubqueries(plan) { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, s"q_dsir_weights lost its broadcast LLR join:\n$plan")
  }

  test("q_dsir_select: top-slice selection plans TakeOrdered, never a global sort") {
    val plan = run("q_dsir_select")
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"q_dsir_select lost its TakeOrderedAndProject:\n$plan")
  }

  test("q_quality_scores: classifier scoring never shuffles the corpus") {
    // training aggregations reduce map-side; scoring is a projection on
    // the scan joined to a broadcast one-row model — the only exchanges
    // in the plan must be single-row aggregate or result-sort exchanges,
    // never a hash repartition of corpus rows carrying text
    assertTextNeverShuffles("q_quality_scores")
  }

  /** Per-row values must never be a hash-shuffle payload in an
    * iterated-moment op: every EM/Newton pass reduces map-side, so the
    * only hash exchanges carry aggregation partials, never the raw
    * column. */
  private def assertColumnNeverShuffles(name: String, colName: String): Unit = {
    val plan = run(name)
    val leaky = collectWithSubqueries(plan) { case s: ShuffleExchangeExec => s }
      .filter(s => s.outputPartitioning.toString.contains("hashpartitioning") &&
        s.output.exists(_.name == colName))
    assert(leaky.isEmpty,
      s"$name hash-shuffles the per-row column $colName:\n" +
        leaky.headOption.getOrElse(""))
  }

  test("q_gmm_doclen: EM passes reduce map-side — x never shuffles") {
    assertColumnNeverShuffles("q_gmm_doclen", "__x")
    assertNoQuadraticJoin("q_gmm_doclen")
  }

  test("q_cox_ph: per-step risk moments combine map-side — x never shuffles") {
    // the duration-keyed exchange carries (t, partial DECIMAL sums);
    // the covariate itself stays in the map task
    assertColumnNeverShuffles("q_cox_ph", "__x")
    assertNoQuadraticJoin("q_cox_ph")
  }

  test("q_isotonic: corpus collapses to the bin table before the B^3 metadata join") {
    // the only hash exchanges carry (bin, partial counts) — the scored
    // per-row projection (__p/__y) never crosses the wire, and the
    // minimax never plans a CartesianProduct (bounded BNL broadcasts)
    assertColumnNeverShuffles("q_isotonic", "__p")
    assertNoQuadraticJoin("q_isotonic")
  }
}
