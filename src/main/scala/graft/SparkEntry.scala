package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops._

/** Driver contract — one named query per implemented operator family from
  * SURVEY.md §2, each with a DuckDB oracle over the same parquet fixtures.
  * Every query ends in an explicit deterministic ORDER BY (unique
  * tie-breakers) and avoids raw TimestampType in outputs (cast to DATE /
  * formatted string) so the cross-engine compare is exact. Sums over
  * doubles go through DECIMAL so shuffle order can't flip low bits.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. The
    * reference's rating-counts chain (challenge2.py:273-281): groupby →
    * pivot(explicit values) → prefix-rename → left-join base → fill 0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_pivot_ratings")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ graft.ops.Tpch.queries

  private val baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A5 — parquet scan + projection
    "q_scan_project" -> ((s, d) =>
      Filters.project(Tables.region(s, d), Seq("r_regionkey", "r_name"))
        .orderBy("r_regionkey")),

    // B1/B6 — existence predicate + inequality
    "q_filter_exists" -> ((s, d) =>
      Filters.existence(Tables.documents(s, d), Seq("text", "lang"))
        .filter(col("source") =!= "src0")
        .select("doc_id", "lang", "source").orderBy("doc_id")),

    // B2/B8/B9 — projection + rename
    "q_project_rename" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey").alias("order_id"),
          col("l_linenumber").alias("line_no"),
          col("l_quantity").alias("qty"))
        .orderBy("order_id", "line_no")),

    // B3 — membership predicate
    "q_filter_in" -> ((s, d) =>
      Filters.membership(Tables.customer(s, d), "c_mktsegment",
        Seq("BUILDING", "AUTOMOBILE"))
        .select("c_custkey", "c_name", "c_mktsegment").orderBy("c_custkey")),

    // B4 — compound range predicate (timestamp + numeric)
    "q_filter_range" -> ((s, d) =>
      Filters.range(Tables.orders(s, d),
        col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01")) &&
          col("o_totalprice") > 1000)
        .select(col("o_orderkey"), col("o_orderdate").cast("date").alias("o_date"),
          col("o_totalprice"))
        .orderBy("o_orderkey")),

    // B5 — negated regex masks
    "q_filter_not_rlike" -> ((s, d) =>
      Filters.matchesNeither(Tables.part(s, d), "p_name", Seq("widget", "^blue"))
        .select("p_partkey", "p_name").orderBy("p_partkey")),

    // C1/D3 — regex key extraction, str.extract null semantics (J5)
    "q_regex_extract" -> ((s, d) =>
      Dedup.extractKey(Tables.events(s, d), "props", "k", "\"k\": (\\d+)")
        .select("event_id", "k").orderBy("event_id")),

    // C2/J1 — keep-FIRST dedup. The order columns form a unique key
    // ((l_orderkey, l_linenumber) alone is NOT unique in the fixture), so
    // "first" is well-defined (J1). Aggregation form: map-side partial
    // combine ships ≤1 row per key per task instead of window-sorting
    // every row.
    "q_dedup_keep_first" -> ((s, d) =>
      Dedup.keepFirstAgg(
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        Seq("l_orderkey"), Seq("l_linenumber", "l_partkey", "l_suppkey"))
        .select("l_orderkey", "l_linenumber", "l_partkey").orderBy("l_orderkey")),

    // C3 — single-pass per-column null profile
    "q_null_profile" -> ((s, d) =>
      Dedup.nullProfile(Tables.documents(s, d),
        Seq("doc_id", "text", "lang", "source", "n_chars"))),

    // C5 — exact distinct-count profile
    "q_distinct_profile" -> ((s, d) =>
      Dedup.distinctProfile(Tables.orders(s, d),
        Seq("o_orderstatus", "o_orderpriority"))),

    // D1 — case-insensitive regex contains
    "q_regex_contains_count" -> ((s, d) =>
      Tables.part(s, d).filter(TextParse.containsI(col("p_name"), "^b"))
        .agg(count(lit(1)).alias("n_match"))),

    // D2 — regex replace
    "q_regex_replace" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_replace(substring(col("text"), 1, 60), "[aeiou]", "*").alias("redacted"))
        .orderBy("doc_id")),

    // D6 — parse_dollars over synthesized money strings
    "q_parse_dollars" -> ((s, d) => {
      val sz = col("p_size")
      val raw = when(sz % 3 === 0, concat(lit("$"), sz.cast("string"), lit(" million")))
        .when(sz % 3 === 1, concat(lit("$"), sz.cast("string"), lit(".5 billion")))
        .otherwise(concat(lit("$"), (sz * 1000).cast("string")))
      Tables.part(s, d).select(col("p_partkey"), raw.alias("raw"))
        .withColumn("amount", TextParse.parseDollars(col("raw")))
        .orderBy("p_partkey")
    }),

    // D6 as a native Catalyst Expression (codegen'd) — same oracle as the
    // when-chain version; one regex pass per pattern instead of
    // rlike+regexp_extract double evaluation.
    "q_parse_dollars_native" -> ((s, d) => {
      val sz = col("p_size")
      val raw = when(sz % 3 === 0, concat(lit("$"), sz.cast("string"), lit(" million")))
        .when(sz % 3 === 1, concat(lit("$"), sz.cast("string"), lit(".5 billion")))
        .otherwise(concat(lit("$"), (sz * 1000).cast("string")))
      Tables.part(s, d).select(col("p_partkey"), raw.alias("raw"))
        .withColumn("amount", graft.functions.GraftFunctions.parse_dollars(col("raw")))
        .orderBy("p_partkey")
    }),

    // E1 — multi-format date parse via to_date coalesce
    "q_date_multiformat" -> ((s, d) => {
      val k = col("o_orderkey") % 4
      val raw = when(k === 0, date_format(col("o_orderdate"), "MMMM d, yyyy"))
        .when(k === 1, date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .when(k === 2, date_format(col("o_orderdate"), "MMMM yyyy"))
        .otherwise(date_format(col("o_orderdate"), "yyyy"))
      Tables.orders(s, d).select(col("o_orderkey"), raw.alias("raw"))
        .withColumn("parsed", DatesNums.parseDateMulti(col("raw")))
        .orderBy("o_orderkey")
    }),

    // E3 — epoch seconds → timestamp (output formatted, tz-free)
    "q_epoch_seconds" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          date_format(DatesNums.epochToTimestamp(col("event_id") * 1000),
            "yyyy-MM-dd HH:mm:ss").alias("t"))
        .orderBy("event_id")),

    // E4/E9 — null-on-error numeric coercion + fill
    "q_coerce_fill" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          DatesNums.coerceDoubleFill(
            TextParse.extract(col("props"), "(\\d+)")).alias("k_filled"))
        .orderBy("event_id")),

    // E6/E8 — conditional arithmetic / zero-aware fill
    "q_conditional_fill" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          DatesNums.conditional(col("l_discount") === 0,
            col("l_extendedprice"),
            col("l_extendedprice") * (lit(1) - col("l_discount"))).alias("net_price"))
        .orderBy("l_orderkey", "l_linenumber")),

    // F2 — synonym coalesce shape
    "q_synonym_coalesce" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          coalesce(nullif(col("event_type"), lit("view")), lit("viewed")).alias("etype"))
        .orderBy("event_id")),

    // G1 — inner equi-join
    "q_join_inner" -> ((s, d) => {
      val o = Tables.orders(s, d); val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice").orderBy("o_orderkey")
    }),

    // G2/E9 — left join of an aggregate + fill
    "q_join_left_agg" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val cnt = Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(count(lit(1)).alias("n_items"))
      o.join(cnt, o("o_orderkey") === cnt("l_orderkey"), "left")
        .select(col("o_orderkey"), coalesce(col("n_items"), lit(0L)).alias("n_items"))
        .orderBy("o_orderkey")
    }),

    // semi join — EXISTS
    "q_join_semi" -> ((s, d) => {
      val recent = Tables.orders(s, d).filter(year(col("o_orderdate")) === 1997)
        .select(col("o_custkey").alias("c_custkey"))
      Joins.semi(Tables.customer(s, d), recent, Seq("c_custkey"))
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // anti join — NOT EXISTS
    "q_join_anti" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_custkey").alias("c_custkey"))
      Joins.anti(Tables.customer(s, d), o, Seq("c_custkey"))
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // range join anchored on equi-key
    "q_join_range" -> ((s, d) => {
      val l = Tables.lineitem(s, d); val o = Tables.orders(s, d)
      Joins.rangeJoin(l, o, l("l_orderkey") === o("o_orderkey"),
        l("l_shipdate") > o("o_orderdate"))
        .agg(count(lit(1)).alias("n_late"))
    }),

    // broadcast-hinted dimension join
    "q_join_broadcast" -> ((s, d) => {
      val n = Tables.nation(s, d); val r = Tables.region(s, d)
      Joins.broadcastJoin(n, r, n("n_regionkey") === r("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name").orderBy("n_nationkey")
    }),

    // multi-join + aggregate (TPC-H Q5 shape; headline)
    "q_join_multi" -> ((s, d) => {
      val l = Tables.lineitem(s, d); val o = Tables.orders(s, d)
      val c = Tables.customer(s, d); val n = Tables.nation(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").alias("revenue"))
        .orderBy("n_name")
    }),

    // H1 — group-by count
    "q_group_count" -> ((s, d) =>
      Aggregates.groupCount(Tables.lineitem(s, d), Seq("l_returnflag", "l_linestatus"))
        .orderBy("l_returnflag", "l_linestatus")),

    // H1+ — pricing summary (TPC-H Q1 shape; headline)
    "q_agg_pricing" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Aggregates.exactSum(col("l_quantity")).alias("sum_qty"),
          Aggregates.exactSum(col("l_extendedprice")).alias("sum_base"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)")).cast("double").alias("sum_disc"),
          count(lit(1)).alias("n"))
        .withColumn("avg_qty", round(col("sum_qty") / col("n"), 6))
        .orderBy("l_returnflag", "l_linestatus")),

    // H2/D7/E9/G2 — the flagship pivot chain (challenge2.py:273-281)
    "q_pivot_ratings" -> ((s, d) => {
      val piv = Aggregates.pivotCounts(Tables.lineitem(s, d),
        "l_orderkey", "l_returnflag", Seq("A", "N", "R"), "cnt_")
      val o = Tables.orders(s, d)
      o.join(piv, o("o_orderkey") === piv("l_orderkey"), "left")
        .select(col("o_orderkey"), col("o_orderstatus"),
          coalesce(col("cnt_a"), lit(0L)).alias("cnt_a"),
          coalesce(col("cnt_n"), lit(0L)).alias("cnt_n"),
          coalesce(col("cnt_r"), lit(0L)).alias("cnt_r"))
        .orderBy("o_orderkey")
    }),

    // H2 generalized — pivot with SUM measure (single-shuffle)
    "q_pivot_sum" -> ((s, d) =>
      Aggregates.pivotAgg(Tables.lineitem(s, d), "l_orderkey", "l_returnflag",
        Seq("A", "N", "R"), "qty_", col("l_quantity").cast("decimal(18,2)"),
        c => coalesce(sum(c), lit(0).cast("decimal(18,2)")).cast("double"))
        .orderBy("l_orderkey")),

    // wide→long unpivot (melt)
    "q_unpivot" -> ((s, d) =>
      Aggregates.unpivot(
        Tables.part(s, d).select("p_partkey", "p_size", "p_retailprice"),
        Seq("p_partkey"), Seq("p_size", "p_retailprice"))
        .select(col("p_partkey"), col("key"), col("value").cast("double").alias("value"))
        .orderBy("p_partkey", "key")),

    // H5 — frequency table
    "q_freq_table" -> ((s, d) =>
      Aggregates.freqTable(Tables.customer(s, d), "c_mktsegment")),

    // H6 — describe() from exact decimal sums
    "q_summary_stats" -> ((s, d) =>
      Aggregates.summaryStats(Tables.lineitem(s, d), "l_quantity")),

    // H6 — exact interpolated quartiles (pandas describe 25%/50%/75%)
    "q_summary_quartiles" -> ((s, d) =>
      Aggregates.quartiles(Tables.lineitem(s, d), "l_extendedprice")),

    // H7 — fixed-width histogram
    "q_histogram" -> ((s, d) =>
      Aggregates.histogram(Tables.events(s, d), "value", 10.0)),

    // rollup subtotals
    "q_rollup" -> ((s, d) =>
      Aggregates.rollupCount(Tables.lineitem(s, d), Seq("l_returnflag", "l_linestatus"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // cube: all grouping-set subtotal combinations, one shuffle. Subtotal
    // NULL keys are labeled '(all)' so every output column is non-null
    // (the driver's row-sort compare needs an orderable first column).
    "q_cube" -> ((s, d) =>
      Aggregates.cubeCount(Tables.orders(s, d), Seq("o_orderstatus", "o_orderpriority"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).alias("o_orderstatus"),
          coalesce(col("o_orderpriority"), lit("(all)")).alias("o_orderpriority"),
          col("n"))
        .orderBy("o_orderstatus", "o_orderpriority")),

    // window navigation: lag/lead within each customer's order history —
    // partitioned window (shuffles once on the customer key, no global
    // sort). Boundary NULLs are sentinel-filled so no nullable column can
    // lead the driver's sorted-row compare.
    "q_window_lead_lag" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
          coalesce(lag("o_totalprice", 1).over(w), lit(-1.0)).alias("prev_price"),
          coalesce(lead("o_totalprice", 1).over(w), lit(-1.0)).alias("next_price"))
        .orderBy("o_orderkey")
    }),

    // ntile quartiles WITHIN each status partition (a global ntile would be
    // a single-partition sort — at scale, bucket by a partition key or use
    // percentile boundaries instead)
    "q_ntile" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
      Tables.orders(s, d).select(col("o_orderkey"),
        ntile(4).over(w).alias("quartile")).orderBy("o_orderkey")
    }),

    // array higher-order functions: filter → transform → aggregate entirely
    // inside the row (no explode, no shuffle)
    "q_array_hof" -> ((s, d) => {
      val longToks = filter(split(col("text"), " "), t => length(t) > 3)
      Tables.documents(s, d).select(col("doc_id"),
        size(longToks).cast("long").alias("n_long_tokens"),
        aggregate(longToks, lit(0L), (acc, t) => acc + length(t))
          .alias("chars_long_tokens"))
        .orderBy("doc_id")
    }),

    // D-family breadth — string-function battery (all codegen'd built-ins
    // with engine-portable semantics: pad, reverse, translate, edit
    // distance, 1-based field split)
    "q_string_funcs" -> ((s, d) =>
      Tables.part(s, d).select(col("p_partkey"),
        lpad(col("p_name"), 30, "*").alias("padded"),
        reverse(col("p_name")).alias("rev"),
        translate(col("p_name"), "aeiou", "12345").alias("xlat"),
        levenshtein(col("p_name"), lit("widget")).cast("long").alias("edit_dist"),
        expr("split_part(p_name, ' ', 1)").alias("first_word"))
        .orderBy("p_partkey")),

    // D-family breadth — extract ALL regex matches as an array (joined to a
    // string for the oracle compare)
    "q_regex_extract_all" -> ((s, d) =>
      Tables.events(s, d).select(col("event_id"),
        concat_ws(",", expr("regexp_extract_all(props, '(\\\\d+)', 1)"))
          .alias("all_nums"))
        .orderBy("event_id")),

    // grouping sets: two independent group-bys answered in ONE shuffle
    // (status totals ∪ priority totals), subtotal keys labeled non-null
    "q_grouping_sets" -> ((s, d) =>
      Tables.orders(s, d)
        .groupingSets(Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).alias("n"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).alias("o_orderstatus"),
          coalesce(col("o_orderpriority"), lit("(all)")).alias("o_orderpriority"),
          col("n"))
        .orderBy("o_orderstatus", "o_orderpriority")),

    // E-family breadth — calendar arithmetic: month truncation, fixed-day
    // shift, day difference (all string/long outputs — oracle-portable)
    "q_date_arith" -> ((s, d) =>
      Tables.orders(s, d).select(col("o_orderkey"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .alias("month_start"),
        date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd")
          .alias("due_date"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").alias("days_to_eoy"))
        .orderBy("o_orderkey")),

    // I1 — top-k (TakeOrderedAndProject)
    "q_topk" -> ((s, d) =>
      Inspect.topK(Tables.orders(s, d).select("o_orderkey", "o_totalprice"),
        10, Seq(desc("o_totalprice"), asc("o_orderkey")))),

    // I2 — deterministic systematic sample
    "q_sample_systematic" -> ((s, d) =>
      Inspect.systematicSample(Tables.lineitem(s, d), "l_orderkey", 97)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // distinct
    "q_distinct" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_returnflag").alias("flag"))
        .distinct().orderBy("flag")),

    // set op — INTERSECT
    "q_set_intersect" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").alias("nk"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").alias("nk")))
        .orderBy("nk")),

    // window — row_number top-n per group
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // window — the full ranking family over one window definition:
    // dense_rank (no gaps), percent_rank and cume_dist (distribution
    // positions, rounded for engine portability)
    "q_window_rank_family" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(asc("o_totalprice"), asc("o_orderkey"))
      Tables.orders(s, d).select(col("o_orderkey"),
          dense_rank().over(w).cast("long").alias("drank"),
          round(percent_rank().over(w), 6).alias("prank"),
          round(cume_dist().over(w), 6).alias("cdist"))
        .orderBy("o_orderkey")
    }),

    // window — running sum
    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 6).alias("running"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- training-data extras ------------------------------------------

    // text: token count
    "q_text_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").alias("n_tokens"))
        .orderBy("doc_id")),

    // text: quality features
    "q_text_quality" -> ((s, d) => {
      val f = TextAnalysis.qualityFeatures(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          f.getField("n_chars").cast("long").alias("n_chars"),
          f.getField("n_tokens").cast("long").alias("n_tokens"),
          f.getField("mean_tok_len").alias("mean_tok_len"),
          f.getField("stopword_ratio").alias("stopword_ratio"))
        .orderBy("doc_id")
    }),

    // text: Gopher repetition signals — duplicate-line fraction and
    // top-2-gram character fraction, over text with planted boilerplate
    // (every third doc gets its first 40 chars appended twice as repeat
    // "lines", the nav-bar/cookie-banner shape these filters exist for)
    "q_quality_repetition" -> ((s, d) => {
      val line1 = substring(col("text"), 1, 40)
      val dirty = when(col("doc_id") % 3 === 0,
        concat(col("text"), lit("\n"), line1, lit("\n"), line1))
        .otherwise(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.dupLineFraction(dirty).alias("dup_line_ratio"),
          TextAnalysis.topNgramCharFraction(dirty, 2).alias("top2_char_ratio"))
        .orderBy("doc_id")
    }),

    // text: Gopher-style quality keep/drop gate, repetition filters ACTIVE
    // (dup-line ≤ 0.2 kills the planted boilerplate docs at 1/3 dup lines;
    // top-2-gram ≤ 0.2 kills keyword stuffing)
    "q_quality_filter" -> ((s, d) => {
      val line1 = substring(col("text"), 1, 40)
      val dirty = when(col("doc_id") % 3 === 0,
        concat(col("text"), lit("\n"), line1, lit("\n"), line1))
        .otherwise(col("text"))
      Tables.documents(s, d)
        .filter(TextAnalysis.qualityKeep(dirty, minTokens = 8,
          maxTokens = 100000, minStopRatio = 0.01,
          maxDupLineRatio = 0.2, maxTopNgramCharRatio = 0.2))
        .select("doc_id", "lang").orderBy("doc_id")
    }),

    // text: language-ID heuristic
    "q_lang_id" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.langId(col("text")).alias("lang_guess"))
        .orderBy("doc_id")),

    // eval: language-ID confusion matrix — labeled lang vs classifier
    // guess with counts (the classifier-eval table); one grouped pass
    "q_lang_confusion" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang"), TextAnalysis.langId(col("text")).alias("lang_guess"))
        .agg(count(lit(1)).alias("n"))
        .orderBy("lang", "lang_guess")),

    // mix planning: per-source repeat factors toward a uniform token
    // budget (target_share / actual_share — the DoReMi-style rebalancing
    // table a mix designer starts from); two tiny aggregations
    "q_mix_rebalance" -> ((s, d) => {
      val per = Tables.documents(s, d).groupBy("source")
        .agg(sum(size(split(col("text"), " ")).cast("long")).alias("n_tokens"))
      val tot = per.agg(sum("n_tokens").alias("__tot"),
        count(lit(1)).alias("__k"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_tokens"),
          round(col("n_tokens").cast("double") / col("__tot"), 6)
            .alias("actual_share"),
          round(lit(1.0) / col("__k"), 6).alias("target_share"),
          round((lit(1.0) / col("__k"))
            / (col("n_tokens").cast("double") / col("__tot")), 6)
            .alias("repeat_factor"))
        .orderBy("source")
    }),

    // text: tokenizer-compression report — chars per whitespace token by
    // source (the bytes/token dataset-card figure that says how far a
    // token budget stretches on each domain); one grouped pass
    "q_token_compression" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).alias("n_docs"),
          sum(length(col("text")).cast("long")).alias("n_chars"),
          sum(size(split(col("text"), " ")).cast("long")).alias("n_tokens"))
        .withColumn("chars_per_token",
          round(col("n_chars").cast("double") / col("n_tokens"), 6))
        .orderBy("source")),

    // text: one-row corpus report (the "dataset card" numbers a corpus
    // release ships with) — all counts in ONE aggregation pass
    "q_corpus_report" -> ((s, d) =>
      Tables.documents(s, d).agg(
        count(lit(1)).alias("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).alias("total_tokens"),
        round(avg(length(col("text"))), 6).alias("mean_chars"),
        countDistinct(TextAnalysis.fingerprint(col("text"))).alias("n_unique_texts"),
        countDistinct(col("source")).alias("n_sources"),
        sum(when(TextAnalysis.langId(col("text")) === "en", 1L).otherwise(0L))
          .alias("n_en"))),

    // text: per-source corpus report — the by-source breakdown a dataset
    // card actually publishes (docs, tokens, duplicate rate, English
    // share per source). One aggregation pass, grouped on the source key.
    // First output column 'domain' is the unique group key (driver-compare
    // invariant: the alphabetically-first column sorts the rows).
    "q_corpus_report_by_source" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(col("source").alias("domain"))
        .agg(
          count(lit(1)).alias("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long"))
            .alias("total_tokens"),
          countDistinct(TextAnalysis.fingerprint(col("text"))).alias("__uniq"),
          sum(when(TextAnalysis.langId(col("text")) === "en", 1L).otherwise(0L))
            .alias("__en"))
        .select(col("domain"), col("n_docs"), col("total_tokens"),
          round(lit(1.0) - col("__uniq").cast("double") / col("n_docs"), 6)
            .alias("dup_rate"),
          round(col("__en").cast("double") / col("n_docs"), 6)
            .alias("share_en"))
        .orderBy("domain")),

    // text: corpus-wide boilerplate-line removal (C4-style) — two banner
    // lines planted across many docs are detected (appear in >= 10 docs)
    // and stripped from every doc; original text lines are untouched
    "q_strip_boilerplate" -> ((s, d) => {
      val dirty = concat(col("text"),
        when(col("doc_id") % 3 === 0,
          lit("\nsubscribe to our newsletter today")).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          lit("\ncookie consent required to continue")).otherwise(lit("")))
      val dirtyDocs = Tables.documents(s, d)
        .select(col("doc_id"), dirty.alias("text"))
      TextAnalysis.stripBoilerplateLines(dirtyDocs, "doc_id", "text", minDocs = 10)
        .select(col("doc_id"), col("text").alias("cleaned"))
        .orderBy("doc_id")
    }),

    // text: unigram LM log-probability (perplexity-style quality score) —
    // each doc scored under the corpus's own unigram distribution
    "q_unigram_logprob" -> ((s, d) =>
      TextAnalysis.unigramLogProb(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // text: overlapping 64-token chunks with 16-token overlap — the
    // document chunker of pretraining/retrieval pipelines. Pure array
    // expressions; the fan-out rides the scan, zero shuffle.
    "q_chunk_overlap" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(TextAnalysis.chunkOverlap(col("text"), 64, 16)))
        .select(concat(col("doc_id").cast("string"), lit("_"),
          col("pos").cast("string")).alias("key"),
          col("doc_id"), col("pos").cast("long").alias("chunk_id"),
          col("col").alias("chunk_text"))
        .orderBy("key")),

    // text: CHUNK-level exact dedup — dedup at the granularity a
    // retrieval store actually indexes: chunk the corpus, fingerprint
    // each chunk, keep the first (doc, chunk) per fingerprint with its
    // copy count. One narrow chunk fan-out + one fingerprint shuffle.
    "q_chunk_dedup" -> ((s, d) => {
      val chunks = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(TextAnalysis.chunkOverlap(col("text"), 64, 16)))
        .select(col("doc_id"), col("pos").cast("long").alias("chunk_id"),
          col("col").alias("chunk_text"))
      chunks
        .groupBy(TextAnalysis.fingerprint(col("chunk_text")).alias("fp"))
        .agg(min(struct(col("doc_id"), col("chunk_id"))).alias("__k"),
          count(lit(1)).alias("n_copies"))
        .select(col("fp"), col("__k.doc_id").alias("doc_id"),
          col("__k.chunk_id").alias("chunk_id"), col("n_copies"))
        .orderBy("fp")
    }),

    // text: frozen-vocab unigram scoring — the production shape for
    // scoring NEW data under a pretrained LM: vocab = the corpus's top-20
    // tokens with exact ln(tf/N) log-probs (one small aggregation),
    // broadcast as a single map row; every doc is then scored by a
    // narrow per-row fold with an OOV floor — the token stream never
    // shuffles (unlike q_unigram_logprob's corpus-self join).
    "q_unigram_score_frozen" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(explode(TextAnalysis.tokens(col("text"))).alias("token"))
      val n = toks.agg(count(lit(1)).alias("__n"))
      val vocab = toks.groupBy("token").agg(count(lit(1)).alias("__tf"))
        .crossJoin(broadcast(n))
        .orderBy(desc("__tf"), asc("token")).limit(20)
        .select(col("token"),
          // 9-dp-pinned ln output (cross-libm transcendental stance)
          round(log(col("__tf").cast("double") / col("__n")), 9)
            .alias("logp"))
      TextAnalysis.unigramScoreFrozen(docs, "doc_id", "text", vocab,
        oovLogProb = -15.0)
        .orderBy("doc_id")
    }),

    // text: content fingerprint
    "q_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).alias("fp"),
          TextAnalysis.fingerprint32(col("text")).alias("fp32"))
        .orderBy("doc_id")),

    // dedup: exact groups by content hash
    "q_dedup_exact" -> ((s, d) =>
      ScaleDedup.exactDedupGroups(Tables.documents(s, d), "doc_id", "text")
        .orderBy("keep_id")),

    // dedup: incremental (append-only) — the src0 batch arrives against
    // the already-ingested rest of the corpus: within-batch min-id
    // canonical, then an anti-join against the existing fingerprint set.
    // Batch cost is independent of corpus size once the fingerprint set
    // is maintained as a table.
    "q_dedup_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      ScaleDedup.dedupAgainst(
        docs.filter(col("source") === "src0"),
        docs.filter(col("source") =!= "src0"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // versioning AUDIT: snapshot diff between two corpus versions —
    // added / removed / changed / same per id, fingerprints only across
    // the wire. (The fixture derives "old" and "new" from the table:
    // old drops doc_id % 7 == 0, new drops % 5 == 0 and edits % 11 == 0.)
    "q_corpus_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val oldV = docs.filter(col("doc_id") % 7 =!= 0)
      val newV = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" edited")))
            .otherwise(col("text")))
      Inspect.snapshotDiff(oldV, newV, "doc_id", "text").orderBy("doc_id")
    }),

    // near-dup: asymmetric CONTAINMENT over the LSH candidate pairs —
    // catches a short doc quoted inside a longer one (Jaccard dilutes
    // these toward 0); kept when either direction's containment ≥ 0.8
    "q_containment_pairs" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cands = ScaleDedup.minhashCandidatePairs(docs, "doc_id", "text",
        numHashes = 4, bands = 2)
      val toks = docs.select(col("doc_id"),
        ScaleDedup.tokenSet(col("text")).alias("toks"))
      cands
        .join(toks.select(col("doc_id").alias("id1"), col("toks").alias("t1")), "id1")
        .join(toks.select(col("doc_id").alias("id2"), col("toks").alias("t2")), "id2")
        .select(col("id1"), col("id2"),
          ScaleDedup.containment(col("t1"), col("t2")).alias("cont1"),
          ScaleDedup.containment(col("t2"), col("t1")).alias("cont2"))
        .filter(col("cont1") >= 0.8 || col("cont2") >= 0.8)
        .orderBy("id1", "id2")
    }),

    // dedup: SPAN level — duplicated 8-token spans removed corpus-wide,
    // first occurrence kept (the substring-granularity pass that catches
    // boilerplate paragraphs document-level dedup can't). Only gram
    // hashes + int positions shuffle; the rebuild is a narrow per-row
    // array filter.
    "q_span_dedup" -> ((s, d) =>
      ScaleDedup.removeRepeatedSpans(Tables.documents(s, d), "doc_id", "text",
        k = 8)
        .orderBy("doc_id")),

    // text: per-document NOVELTY — fraction of a doc's 8-gram occurrences
    // making their corpus-wide first appearance in this doc (1.0 = all
    // new, 0.0 = verbatim copy of earlier text). Same gram fan-out and
    // single windowed shuffle as q_span_dedup, aggregated instead of
    // rewritten.
    "q_doc_novelty" -> ((s, d) =>
      ScaleDedup.docNovelty(Tables.documents(s, d), "doc_id", "text", k = 8)
        .orderBy("doc_id")),

    // text: perplexity-style TAIL DROP — score every doc under the corpus
    // unigram LM, then keep docs at or above the 10th percentile (the
    // standard "drop the weird tail" quality pass). The threshold is ONE
    // broadcast row; both sides work on 6-dp-rounded scores so the
    // boundary comparison is engine-exact.
    "q_quality_tail_drop" -> ((s, d) => {
      val scored = TextAnalysis.unigramLogProb(Tables.documents(s, d),
        "doc_id", "text")
      val thr = scored.agg(
        round(expr("percentile(logprob, 0.1D)"), 6).alias("__thr"))
      scored.crossJoin(broadcast(thr))
        .filter(col("logprob") >= col("__thr"))
        .select("doc_id", "logprob").orderBy("doc_id")
    }),

    // text: quality-decile CURRICULUM table — docs bucketed into exact
    // deciles of the unigram LM score, with per-decile count, score range,
    // and mean length (the table behind "train on the top-N deciles
    // first"). The global ntile window sorts only (id, score, n_tok)
    // triples — narrow; exact deciles inherently total-order the corpus
    // (approximate quantile cutpoints are the 100 TB path, same report
    // shape).
    "q_quality_deciles" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val scored = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      val withTok = scored.join(
        docs.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").alias("n_tok")),
        "doc_id")
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("logprob"), col("doc_id"))
      withTok.withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy("decile")
        .agg(count(lit(1)).alias("n_docs"),
          round(min(col("logprob")), 6).alias("min_lp"),
          round(max(col("logprob")), 6).alias("max_lp"),
          round(sum(col("n_tok")).cast("double") / count(lit(1)), 6)
            .alias("avg_tokens"))
        .orderBy("decile")
    }),

    // FLAGSHIP composite — the LLM training-data prep pipeline end-to-end:
    // Gopher-style quality gate → language filter (keep English) → exact
    // dedup (content fingerprint, min-id canonical) → token counts for the
    // surviving corpus. Each stage is an independently oracle-proven
    // operator; the composition is the workload this engine exists for.
    // Plan shape: one scan feeds the narrow filters (no shuffle until the
    // dedup groupBy), dedup shuffles the 128-bit fingerprint only, and the
    // canonical-id semi-join shuffles ids — text never crosses the wire
    // after the scan.
    "q_llm_prep" -> ((s, d) => {
      val kept = Tables.documents(s, d)
        .filter(TextAnalysis.qualityKeep(col("text"), minTokens = 8,
          maxTokens = 100000, minStopRatio = 0.01))
        .filter(TextAnalysis.langId(col("text")) === "en")
      val canon = ScaleDedup.exactDedupGroups(kept, "doc_id", "text")
        .select(col("keep_id").alias("doc_id"))
      kept.join(canon, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").alias("n_tokens"))
        .orderBy("doc_id")
    }),

    // pack: concat-and-cut sequence packing — per source shard, documents
    // in doc_id order fill 512-token training sequences; each doc reports
    // the sequence and offset where it starts (one window per shard key,
    // shards pack independently — the 100 TB-parallel shape)
    "q_pack_sequences" -> ((s, d) =>
      Pack.packGreedy(
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("text")).cast("long").alias("n_tokens")),
        "source", "doc_id", "n_tokens", budget = 512)
        .select("doc_id", "source", "seq_id", "seq_offset")
        .orderBy("doc_id")),

    // pack: materialized packed sequences — the actual training rows a
    // consumer reads: per (source, seq_id), the 512-token window of the
    // shard's concatenated token stream, reassembled in position order
    // (every sequence except a shard's last has exactly 512 tokens —
    // spec-pinned). Shuffle key is (shard, seq): bounded groups, shards
    // pack in parallel.
    "q_pack_emit" -> ((s, d) =>
      Pack.packEmit(
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            TextAnalysis.tokens(col("text")).alias("toks")),
        "source", "doc_id", "toks", budget = 512)
        .select(concat(col("source"), lit("_"), col("seq_id").cast("string"))
          .alias("key"),
          col("n_toks"), concat_ws(" ", col("toks")).alias("seq_text"))
        .orderBy("key")),

    // pack: TOKENIZE-AND-PACK — the final assembly a training job reads:
    // real BPE tokens (broadcast merges kernel, zero shuffle) packed into
    // 128-token sequences per source shard. Composes the two
    // oracle-proven stages end-to-end; the only shuffles are the pack
    // window on the shard key and the bounded (shard, seq) regroup.
    "q_tokenize_pack" -> ((s, d) =>
      Pack.packEmit(
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            graft.functions.Bpe.bpe_tokens(col("text"),
              TextAnalysis.DefaultBpeMerges).alias("toks")),
        "source", "doc_id", "toks", budget = 128)
        .select(concat(col("source"), lit("_"), col("seq_id").cast("string"))
          .alias("key"),
          col("n_toks"), concat_ws(" ", col("toks")).alias("seq_text"))
        .orderBy("key")),

    // pack: deterministic hash train/val split — labels depend only on
    // the row's own key, so they are stable under corpus growth
    "q_train_val_split" -> ((s, d) =>
      Pack.trainValSplit(Tables.documents(s, d), "doc_id", valFraction = 0.1)
        .select("doc_id", "split").orderBy("doc_id")),

    // split AUDIT: near-duplicate pairs straddling the train/val split —
    // the leakage report a split ships with (a val doc whose near-dup
    // lives in train inflates eval). Reuses the LSH candidate pairs; the
    // split labels join on ids only.
    "q_split_leakage" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = ScaleDedup.minhashCandidatePairs(docs, "doc_id", "text",
        numHashes = 4, bands = 2)
      val split = Pack.trainValSplit(docs.select("doc_id"), "doc_id",
        valFraction = 0.1).select(col("doc_id"), col("split"))
      pairs
        .join(split.select(col("doc_id").alias("id1"),
          col("split").alias("split1")), Seq("id1"))
        .join(split.select(col("doc_id").alias("id2"),
          col("split").alias("split2")), Seq("id2"))
        .filter(col("split1") =!= col("split2"))
        .select("id1", "id2", "split1", "split2")
        .orderBy("id1", "id2")
    }),

    // pack: deterministic shard manifest — md5-bucket shard + independent
    // md5 in-shard order (the "global shuffle then shard" a training run
    // reads; no RNG state, no global sort, one shard-keyed window)
    "q_shard_manifest" -> ((s, d) =>
      Pack.shardManifest(Tables.documents(s, d), "doc_id", numShards = 8)
        .orderBy("doc_id")),

    // mix: deterministic per-group sample — 3 docs per source, chosen by
    // md5 draw order (stable under corpus growth AND partitioning, unlike
    // any rand()-based pick; the inspection-sample shape for eyeballing
    // each domain). row_number ≤ k plans WindowGroupLimit: each map task
    // forwards only its local top-3 per source into the exchange.
    "q_group_sample" -> ((s, d) => {
      val draw = ScaleDedup.hash32(
        concat_ws("|", lit("gs"), col("doc_id").cast("string")), 0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(draw, col("doc_id"))
      Tables.documents(s, d)
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 3)
        .select("doc_id", "source").orderBy("doc_id")
    }),

    // mix: deterministic stratified domain sampling — keep 50% of src0,
    // 25% of src1, all of everything else, via an md5-threshold predicate
    // (reproducible row-for-row across cluster sizes, unlike sample()).
    "q_domain_mix" -> ((s, d) =>
      Mix.stratifiedSample(Tables.documents(s, d), "source", "doc_id",
        Map("src0" -> 0.5, "src1" -> 0.25))
        .select("doc_id", "source").orderBy("doc_id")),

    // mix: DSIR importance weights (Xie et al. 2023) — hashed
    // unigram+bigram log-likelihood ratio of each raw doc against the
    // eval-style target slice (doc_id % 37, the decontamination
    // convention). Bucket counts collapse to 64 rows, the log-ratio
    // table broadcasts, text never shuffles.
    "q_dsir_weights" -> ((s, d) =>
      Mix.dsirImportance(Tables.documents(s, d), "doc_id", "text",
        col("doc_id") % 37 === 0, buckets = 64)
        .orderBy("doc_id")),

    // mix: DSIR top-slice selection — the resampling step as a
    // deterministic top-k (weight desc, doc_id tie-break), which
    // compiles to TakeOrderedAndProject (per-task heaps, no global
    // sort at any corpus size).
    "q_dsir_select" -> ((s, d) =>
      Mix.dsirImportance(Tables.documents(s, d), "doc_id", "text",
        col("doc_id") % 37 === 0, buckets = 64)
        .orderBy(desc("weight"), col("doc_id")).limit(500)
        .select("doc_id", "weight").orderBy("doc_id")),

    // text: document token-length histogram — the sequence-length
    // distribution a dataset card publishes (and the input to choosing a
    // packing budget). Width-20 buckets, one narrow pass + one tiny agg.
    "q_doclen_histogram" -> ((s, d) =>
      Tables.documents(s, d)
        .select((floor(TextAnalysis.tokenCount(col("text")) / 20) * 20)
          .cast("long").alias("bucket"))
        .groupBy("bucket").agg(count(lit(1)).alias("n_docs"))
        .orderBy("bucket")),

    // dedup: decontamination REPORT — for each contaminated corpus doc,
    // how many distinct 13-gram hashes it shares with the eval set (the
    // audit table a decontamination run ships: verbatim leaks score high,
    // boilerplate collisions score 1–2). Same broadcast shape as
    // q_decontaminate; only matching (doc, hash) rows reach the count.
    "q_decon_report" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val evalHashes = docs.filter(col("doc_id") % 37 === 0)
        .select(explode(graft.functions.MinHashSig.shingle_hashes(
          split(col("text"), " "), 13)).alias("__h"))
        .distinct()
      docs.select(col("doc_id"),
        explode(graft.functions.MinHashSig.shingle_hashes(
          split(col("text"), " "), 13)).alias("__h"))
        .join(broadcast(evalHashes), Seq("__h"))
        .groupBy("doc_id").agg(count(lit(1)).alias("n_shared"))
        .orderBy("doc_id")
    }),

    // dedup: benchmark decontamination — every 37th document plays the
    // "eval set"; corpus docs sharing any 13-gram with it are dropped
    // (including the eval docs themselves, which trivially self-collide).
    // Zero corpus shuffle: eval shingle hashes broadcast as one array row,
    // contamination is a narrow arrays_overlap per document.
    "q_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val evalSet = docs.filter(col("doc_id") % 37 === 0)
      ScaleDedup.decontaminate(docs, "doc_id", "text", evalSet, "text", n = 13)
        .select("doc_id", "source").orderBy("doc_id")
    }),

    // FLAGSHIP v2 — the complete modern pretraining-prep stack in one
    // composition: Gopher quality gate WITH repetition bounds → language
    // filter → benchmark decontamination (13-gram vs the %37 eval set) →
    // exact dedup canonical → deterministic domain mix → real BPE token
    // count. Every stage is an independently oracle-proven operator; plan
    // shape: narrow filters off one scan, the only corpus-wide shuffles
    // are the dedup fingerprint groupBy and the contaminated/canonical id
    // joins — text itself never crosses the wire after the scan, and the
    // BPE kernel runs only on surviving rows.
    "q_llm_prep_full" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val evalSet = docs.filter(col("doc_id") % 37 === 0)
      val kept = docs
        .filter(TextAnalysis.qualityKeep(col("text"), minTokens = 8,
          maxTokens = 100000, minStopRatio = 0.01,
          maxDupLineRatio = 0.2, maxTopNgramCharRatio = 0.2))
        .filter(TextAnalysis.langId(col("text")) === "en")
      val clean = ScaleDedup.decontaminate(kept, "doc_id", "text",
        evalSet, "text", n = 13)
      val canon = ScaleDedup.exactDedupGroups(clean, "doc_id", "text")
        .select(col("keep_id").alias("doc_id"))
      val mixed = Mix.stratifiedSample(
        clean.join(canon, Seq("doc_id"), "left_semi"),
        "source", "doc_id", Map("src0" -> 0.5, "src1" -> 0.25))
      mixed.select(col("doc_id"),
        size(graft.functions.Bpe.bpe_tokens(col("text"),
          TextAnalysis.DefaultBpeMerges)).cast("long").alias("n_bpe"))
        .orderBy("doc_id")
    }),

    // FLAGSHIP v4 (span variant) — the v2 kept chain with SPAN-level
    // dedup composed in: quality + repetition gate → language filter →
    // 13-gram decontamination → exact dedup canonical → remove duplicated
    // 8-token spans corpus-wide (first occurrence kept) → per-doc clean
    // token count + removed count. Document-level dedup passes a page
    // that pastes a boilerplate paragraph into fresh prose; this stage
    // cuts exactly the paragraph. Text still never shuffles: the kept
    // chain ships fingerprints/shingle hashes, the span stage ships gram
    // md5s + int positions, the rebuild is a narrow array filter.
    "q_llm_prep_spans" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val evalSet = docs.filter(col("doc_id") % 37 === 0)
      val kept = docs
        .filter(TextAnalysis.qualityKeep(col("text"), minTokens = 8,
          maxTokens = 100000, minStopRatio = 0.01,
          maxDupLineRatio = 0.2, maxTopNgramCharRatio = 0.2))
        .filter(TextAnalysis.langId(col("text")) === "en")
      val clean = ScaleDedup.decontaminate(kept, "doc_id", "text",
        evalSet, "text", n = 13)
      val canon = ScaleDedup.exactDedupGroups(clean, "doc_id", "text")
        .select(col("keep_id").alias("doc_id"))
      val uniq = clean.join(canon, Seq("doc_id"), "left_semi")
      ScaleDedup.removeRepeatedSpans(uniq, "doc_id", "text", k = 8)
        .select(col("doc_id"),
          when(col("text_clean") === "", lit(0L))
            .otherwise(size(split(col("text_clean"), " ")).cast("long"))
            .alias("n_tokens_clean"),
          col("n_removed"))
        .orderBy("doc_id")
    }),

    // FLAGSHIP v3 — the v2 stack with FUZZY dedup composed in: quality +
    // repetition gate → language filter → 13-gram decontamination → exact
    // dedup (collapses identical mega-clusters cheaply, and keeps the LSH
    // input free of degenerate same-text buckets) → MinHash-LSH candidate
    // pairs → EXACT Jaccard verification (≥ 0.5 on the token sets — LSH
    // candidates are probabilistic; production always verifies before
    // merging clusters) → connected components → keep each near-dup
    // cluster's min-id canonical — THE production pretraining dedup,
    // end-to-end. Text never shuffles: fingerprints, band keys, token
    // SETS of candidate rows only, and id edges are all that cross the
    // wire; the one iterative job (clustering) checkpoints reliably and
    // fails loudly on non-convergence.
    "q_llm_prep_fuzzy" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val evalSet = docs.filter(col("doc_id") % 37 === 0)
      // Quality + langId kernels run ONCE (round 18): the gate-survivor
      // ids are materialized first, and every later stage re-derives text
      // by an id semi-join against the scan — a parquet re-read, not a
      // kernel re-run. Previously `kept` (filter kernels inline) was
      // evaluated ~3× inside the survivor-id job alone (decontamination
      // references its corpus twice — shingle side + output side — and
      // the exact-dedup group adds a third), so the most expensive per-doc
      // expressions in the pipeline ran three times per run.
      val keptIds = docs
        .filter(TextAnalysis.qualityKeep(col("text"), minTokens = 8,
          maxTokens = 100000, minStopRatio = 0.01,
          maxDupLineRatio = 0.2, maxTopNgramCharRatio = 0.2))
        .filter(TextAnalysis.langId(col("text")) === "en")
        .select("doc_id").localCheckpoint()
      val kept = docs.join(keptIds, Seq("doc_id"), "left_semi")
      val clean = ScaleDedup.decontaminate(kept, "doc_id", "text",
        evalSet, "text", n = 13)
      val exact = ScaleDedup.exactDedupGroups(clean, "doc_id", "text")
        .select(col("keep_id").alias("doc_id"))
      // The quality/decon chain feeds three consumers (LSH input, CC
      // vertices, final output). Materialize the SURVIVOR IDS once — a
      // narrow id column, ~8 bytes/doc cluster-wide — and re-derive the
      // text by a cheap semi-join against the scan, instead of paying the
      // quality kernels + decontamination join once per consumer
      // (measured 9.5 s -> ~5 s at sf0.1). localCheckpoint truncates
      // lineage and stores blocks on executors, so an executor loss FAILS
      // the job (no recompute — Iterate.scala documents this trade); the
      // job then reruns from its reliable parquet inputs. The id
      // semi-joins assume doc_id is unique (it is the documents PK): a
      // duplicate doc_id whose sibling row passed the gate would be kept
      // even if its own row failed.
      val uniqIds = clean.join(exact, Seq("doc_id"), "left_semi")
        .select("doc_id").localCheckpoint()
      val uniq = docs.join(uniqIds, Seq("doc_id"), "left_semi")
      // Tokenize the survivors ONCE (round-14, VERDICT #7): the same
      // (id, token set) frame feeds the LSH signature stage AND the
      // exact-Jaccard verify below — previously each branch re-read the
      // text and re-split it. localCheckpoint trades fault tolerance
      // for speed (round-15 ADVICE): it truncates lineage, so blocks
      // lost with an executor FAIL the job rather than recompute — the
      // job is then rerun from its reliable inputs. The materialized
      // per-doc token arrays are also this stage's main memory/disk
      // pressure at scale, which is why only the SURVIVORS (post
      // exact-dedup) are tokenized, and a deployment preferring
      // recompute-on-loss would persist(DISK_ONLY) here instead.
      // n_tokens rides the same checkpoint (round 18): the final readout
      // previously re-scanned the corpus text a further time just to
      // count tokens; size(split(..)) shares the tokenizing split with
      // tokenSet via codegen subexpression elimination, so carrying the
      // 8-byte count here makes the last stage a scan-free projection of
      // this frame.
      val toks = uniq.select(col("doc_id"),
        ScaleDedup.tokenSet(col("text")).alias("toks"),
        TextAnalysis.tokenCount(col("text")).cast("long").alias("n_tokens"))
        .localCheckpoint()
      val pairs = ScaleDedup.minhashCandidatePairsFromToks(toks, "doc_id",
        "toks", numHashes = 4, bands = 2)
      val verified = pairs
        .join(toks.select(col("doc_id").alias("id1"), col("toks").alias("t1")), "id1")
        .join(toks.select(col("doc_id").alias("id2"), col("toks").alias("t2")), "id2")
        .filter(ScaleDedup.jaccard(col("t1"), col("t2")) >= 0.5)
        .select("id1", "id2")
      val labels = ScaleDedup.connectedComponents(
        uniqIds.select(col("doc_id").alias("id")), verified)
      val canon = labels.filter(col("label") === col("id"))
        .select(col("id").alias("doc_id"))
      // Token counts are computed BEFORE the canonical semi-join so the
      // join shuffles (doc_id, n_tokens) — 16 bytes/row — rather than
      // the surviving text (canon grows with the corpus, so it can't be
      // assumed broadcastable; PlanAuditSpec pins text out of every
      // hash exchange here). The counts come from the checkpointed toks
      // frame (round 18) — no extra corpus scan for the readout.
      toks.select(col("doc_id"), col("n_tokens"))
        .join(canon, Seq("doc_id"), "left_semi")
        .orderBy("doc_id")
    }),

    // dedup: minhash signatures
    "q_minhash_sig" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id") +:
          ScaleDedup.minhashSignature(ScaleDedup.tokenSet(col("text")), 4): _*)
        .orderBy("doc_id")),

    // dedup: minhash-LSH candidate pairs
    "q_minhash_pairs" -> ((s, d) =>
      ScaleDedup.minhashCandidatePairs(Tables.documents(s, d), "doc_id", "text",
        numHashes = 4, bands = 2)
        .orderBy("id1", "id2")),

    // dedup: bottom-k (KMV) sketch per group via a custom
    // TypedImperativeAggregate — fixed-size state per group
    "q_bottomk_sketch" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          ScaleDedup.hash32(col("l_partkey").cast("string"), 0).alias("h"))
        .groupBy("l_returnflag")
        .agg(graft.functions.BottomKSketch.bottom_k_sketch(col("h"), 8).alias("sk"))
        .select(col("l_returnflag"),
          concat_ws(",", transform(col("sk"), x => x.cast("string"))).alias("sketch"))
        .orderBy("l_returnflag")),

    // dedup: word-3-shingle minhash (n-gram signatures) — native one-pass
    // kernel (shingles built in a StringBuilder, distinct-only hashing)
    "q_shingle_minhash" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id") +: ScaleDedup.shingleSignature(col("text"), 3, 2): _*)
        .orderBy("doc_id")),

    // dedup: minhash-LSH pairs → connected components (duplicate clusters)
    // over the FULL corpus. The oversized-bucket guard inside
    // minhashCandidatePairs keeps the pair graph non-degenerate (the
    // synthetic corpus's tiny vocabulary otherwise makes LSH buckets cover
    // most of the table), so clustering needs no sampling.
    "q_dedup_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = ScaleDedup.minhashCandidatePairs(docs, "doc_id", "text",
        numHashes = 4, bands = 2)
      ScaleDedup.connectedComponents(
        docs.select(col("doc_id").alias("id")), pairs)
        .select(col("id").alias("doc_id"), col("label").alias("cluster"))
        .orderBy("doc_id")
    }),

    // dedup MEASUREMENT: precision/recall of the LSH candidate generator
    // against exact-Jaccard (≥ 0.5) ground truth on a FIXED-SIZE
    // (~500-doc) id sample — "measured, not claimed", the dedup twin of
    // q_ann_recall. The all-pairs ground truth is confined to the
    // sample (a measurement query runs on a slice; the operator itself
    // never does all-pairs), and the sample modulus scales with the
    // corpus (max(1, ceil(n/500))) so the measurement stays O(1) at ANY
    // corpus size — a proportional 1-in-10 sample made the truth join
    // grow quadratically (61x wall on the 10x salted stress fixture;
    // BASELINE.md round-12 stress table). At sf0.01 (5000 docs) the
    // modulus is exactly the old 10, so the driver artifact is
    // unchanged.
    "q_dedup_recall" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val m = math.max(1L, math.ceil(docs.count() / 500.0).toLong)
      val samp = docs.filter(col("doc_id") % m === 0)
      val cands = ScaleDedup.minhashCandidatePairs(samp, "doc_id", "text",
        numHashes = 4, bands = 2)
      val toks = samp.select(col("doc_id"),
        ScaleDedup.tokenSet(col("text")).alias("toks"))
      val withJ = cands
        .join(toks.select(col("doc_id").alias("id1"), col("toks").alias("t1")), "id1")
        .join(toks.select(col("doc_id").alias("id2"), col("toks").alias("t2")), "id2")
        .select(ScaleDedup.jaccard(col("t1"), col("t2")).alias("jac"))
      val truth = toks.select(col("doc_id").alias("id1"), col("toks").alias("t1"))
        .crossJoin(toks.select(col("doc_id").alias("id2"), col("toks").alias("t2")))
        .filter(col("id1") < col("id2"))
        .filter(ScaleDedup.jaccard(col("t1"), col("t2")) >= 0.5)
      val cAgg = withJ.agg(count(lit(1)).alias("n_cand"),
        sum(when(col("jac") >= 0.5, 1L).otherwise(0L)).alias("n_hit"))
      cAgg.crossJoin(truth.agg(count(lit(1)).alias("n_truth")))
        .select(col("n_cand"), col("n_truth"),
          round(col("n_hit").cast("double") / col("n_cand"), 6).alias("prec"),
          round(col("n_hit").cast("double") / col("n_truth"), 6).alias("rec"))
    }),

    // dedup AUDIT: near-dup cluster size distribution — the dataset-card
    // figure a dedup run publishes (how much of the corpus sits in
    // duplicate families, and how big the worst family is). Reuses the
    // clustering pipeline; the histogram is two tiny aggregations on its
    // id-sized output.
    "q_dup_cluster_sizes" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = ScaleDedup.minhashCandidatePairs(docs, "doc_id", "text",
        numHashes = 4, bands = 2)
      ScaleDedup.connectedComponents(
          docs.select(col("doc_id").alias("id")), pairs)
        .groupBy(col("label")).agg(count(lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(count(lit(1)).alias("n_clusters"))
        .withColumn("n_docs", (col("cluster_size") * col("n_clusters")).cast("long"))
        .orderBy("cluster_size")
    }),

    // dedup: simhash
    "q_simhash" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          ScaleDedup.simhash(ScaleDedup.tokenSet(col("text")), 16).alias("sh"))
        .orderBy("doc_id")),

    // dedup: SimHash near-dup PAIRS — 16-bit signatures paired via the
    // generic banded Hamming join (pigeonhole on maxDist+1 bands, never
    // all-pairs), the text-side twin of the image dHash pairing
    "q_simhash_pairs" -> ((s, d) => {
      val sigs = Tables.documents(s, d).select(col("doc_id"),
        ScaleDedup.simhash(ScaleDedup.tokenSet(col("text")), 32).alias("sh"))
      ScaleDedup.hammingNearDupPairs(sigs, "doc_id", "sh",
        bits = 32, maxDist = 3)
        .orderBy("id1", "id2")
    }),

    // dedup: n-gram Jaccard VERIFICATION of the LSH candidate pairs — the
    // full minhash→LSH→exact-verify pipeline. The candidate set comes from
    // the banded equi-join (bounded by the bucket guard), never from a
    // low-cardinality-key cartesian.
    "q_jaccard_pairs" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cands = ScaleDedup.minhashCandidatePairs(docs, "doc_id", "text",
        numHashes = 4, bands = 2)
      val toks = docs.select(col("doc_id"),
        ScaleDedup.tokenSet(col("text")).alias("toks"))
      cands
        .join(toks.select(col("doc_id").alias("id1"), col("toks").alias("t1")), "id1")
        .join(toks.select(col("doc_id").alias("id2"), col("toks").alias("t2")), "id2")
        .select(col("id1"), col("id2"),
          ScaleDedup.jaccard(col("t1"), col("t2")).alias("jac"))
        .orderBy("id1", "id2")
    }),

    // similarity: brute-force cosine top-k
    "q_ann_cosine" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.orderBy("vec_id").limit(1)
        .select(Similarity.asDouble(col("embedding")).alias("qv"))
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 20)
    }),

    // embedding corpus diagnostics (Similarity.embeddingProfile): per
    // label — count, mean L2 norm, centroid norm, mean cosine to the
    // centroid. The anisotropy/drift dashboard row for each source.
    "q_embedding_profile" -> ((s, d) =>
      Similarity.embeddingProfile(Tables.embeddings(s, d), "embedding",
        "label")),

    // MMR diversified retrieval (Similarity.mmrSelect): greedy
    // λ·rel − (1−λ)·max-sim-to-selected over the top-20 relevance pool,
    // k=5, λ=0.75 (0.25 penalty weight is binary-exact, so both engines
    // walk the identical selection path).
    "q_mmr_select" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.orderBy("vec_id").limit(1)
        .select(Similarity.asDouble(col("embedding")).alias("qv"))
      Similarity.mmrSelect(emb, "vec_id", "embedding", q, k = 5,
        poolSize = 20, lambda = 0.75).orderBy("rank")
    }),

    // Hard-negative mining (Similarity.hardNegatives): per probe, the 5
    // most-similar DIFFERENT-label vectors — contrastive-training pair
    // generation on the knnPredict scan shape.
    "q_hard_negatives" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val probes = emb.orderBy("vec_id").limit(5)
        .select(col("vec_id").alias("qid"), col("label").alias("qlabel"),
          Similarity.asDouble(col("embedding")).alias("qv"))
      Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
        probes, 5).orderBy("key")
    }),

    // similarity: LSH-bucketed ANN
    "q_ann_lsh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.orderBy("vec_id").limit(1)
        .select(Similarity.asDouble(col("embedding")).alias("qv"))
      Similarity.lshTopK(emb, "vec_id", "embedding", q, dim = 64, k = 20, nPlanes = 8)
    }),

    // similarity: multi-probe LSH ANN (query bucket + Hamming-1 neighbors —
    // recall superset of q_ann_lsh, same single corpus scan + equi-join)
    "q_ann_lsh_multiprobe" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.orderBy("vec_id").limit(1)
        .select(Similarity.asDouble(col("embedding")).alias("qv"))
      Similarity.lshTopKMultiProbe(emb, "vec_id", "embedding", q,
        dim = 64, k = 20, nPlanes = 8)
    }),

    // similarity: multi-TABLE LSH ANN — 4 independent 4-plane tables,
    // candidates unioned (the recall fix for the starved single-table
    // variant; corpus scanned once, bounded ×4 fan-out)
    "q_ann_lsh_multitable" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.orderBy("vec_id").limit(1)
        .select(Similarity.asDouble(col("embedding")).alias("qv"))
      Similarity.lshTopKMultiTable(emb, "vec_id", "embedding", q,
        dim = 64, k = 20, nPlanes = 4, nTables = 4)
    }),

    // similarity: IVF ANN (deterministic centroids → cell equi-join)
    "q_ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.orderBy("vec_id").limit(1)
        .select(Similarity.asDouble(col("embedding")).alias("qv"))
      Similarity.ivfTopK(emb, "vec_id", "embedding", q, k = 20, nCells = 8)
    }),

    // similarity: PERSISTED IVF index — the corpus assignment is written
    // once as a cell-bucketed parquet table (the index layout a vector
    // store keeps across queries), then probed shuffle-free: the probe
    // broadcasts and the index scan flows straight into the join. Same
    // deterministic first-8 centroids as q_ann_ivf, so results (and the
    // recall row) must match it exactly.
    "q_ann_ivf_indexed" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val base = emb.select(col("vec_id"),
        Similarity.asDouble(col("embedding")).alias("v"))
      val centroids = base.orderBy("vec_id").limit(8)
        .select(col("vec_id").alias("cid"), col("v").alias("cv"))
      Similarity.writeIvfIndex(emb, "vec_id", "embedding", centroids,
        "graft_ivf_index")
      val q = emb.orderBy("vec_id").limit(1)
        .select(Similarity.asDouble(col("embedding")).alias("qv"))
      Similarity.ivfTopKIndexed(s, "graft_ivf_index", "vec_id", q, k = 20,
        centroids)
    }),

    // similarity: IVF multi-probe ANN (query probes its 2 nearest cells —
    // recall superset of q_ann_ivf, same single corpus assignment pass)
    "q_ann_ivf_multiprobe" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.orderBy("vec_id").limit(1)
        .select(Similarity.asDouble(col("embedding")).alias("qv"))
      Similarity.ivfTopKMultiProbe(emb, "vec_id", "embedding", q,
        k = 20, nCells = 8, nProbe = 2)
    }),

    // similarity: IVF ANN with Lloyd-trained centroids — 3 deterministic
    // k-means rounds (decimal-exact means, 9-dp rounding) then the same
    // cell equi-join as q_ann_ivf. The index-quality upgrade over first-n
    // centroids; dataflow cost = one corpus scan + one (cell, sums)
    // shuffle per training round.
    "q_ann_ivf_kmeans" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.orderBy("vec_id").limit(1)
        .select(Similarity.asDouble(col("embedding")).alias("qv"))
      Similarity.ivfTopKKMeans(emb, "vec_id", "embedding", q,
        k = 20, nCells = 8, iters = 3, dim = 64)
    }),

    // similarity: dimension-truncation recall ladder — price the
    // "score on the first d dims" bandwidth cut in measured recall@20
    "q_ann_dim_tradeoff" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.orderBy("vec_id").limit(1)
        .select(Similarity.asDouble(col("embedding")).alias("qv"))
      Similarity.dimTradeoffRecall(emb, "vec_id", "embedding", q,
        k = 20, dims = Seq(8, 16, 32, 64), fullDim = 64)
    }),

    // similarity: product-quantization ANN — 8 subspace codebooks (Lloyd,
    // 3 rounds), corpus encoded to 8-code words, ADC scoring over the
    // codes table only, exact-cosine rerank of the top-50 candidates.
    // The compressed-domain variant of the IVF family: the per-query scan
    // touches ~64x less data than raw vectors.
    "q_ann_pq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.orderBy("vec_id").limit(1)
        .select(Similarity.asDouble(col("embedding")).alias("qv"))
      Similarity.pqTopK(emb, "vec_id", "embedding", q, k = 20,
        m = 8, kPerSub = 8, iters = 3, dim = 64, rerank = 50)
    }),

    // similarity: measured recall@20 of every ANN variant against the
    // brute-force ground truth — turns the "recall superset" design claims
    // into numbers. Each variant's top-20 semi-joins the exact top-20 ids;
    // recall = hit count / 20. (The variant plans each scan the corpus
    // once; the union is of 5 × ≤20-row results, so the combine is free.)
    "q_ann_recall" -> ((s, d) => {
      val gt = queries("q_ann_cosine")(s, d).select("vec_id")
      // The two k-means variants share ONE Lloyd training: centroids are
      // 8 tiny rows, so materializing them once (localCheckpoint) drops
      // the second training from the ladder (measured 8.2 -> 7.8 s at
      // sf0.1 — the ladder's cost is dominated by the 8 per-variant
      // corpus scans, incl. the indexed variant's table rebuild, which
      // is the measurement's point); every variant still assigns the
      // corpus itself.
      val emb = Tables.embeddings(s, d)
      val q1 = emb.orderBy("vec_id").limit(1)
        .select(Similarity.asDouble(col("embedding")).alias("qv"))
      val base = emb.select(col("vec_id"),
        Similarity.asDouble(col("embedding")).alias("v"))
      val kmCents = Similarity.kmeansCentroids(base, "vec_id", "v",
        nCells = 8, iters = 3, dim = 64).localCheckpoint()
      val shared = Map(
        "q_ann_ivf_kmeans" -> Similarity.ivfTopKWithCentroids(
          emb, "vec_id", "embedding", q1, 20, kmCents),
        "q_ann_ivf_kmeans_multiprobe" -> Similarity.ivfTopKMultiProbeWithCentroids(
          emb, "vec_id", "embedding", q1, 20, kmCents, nProbe = 2))
      Seq("q_ann_ivf", "q_ann_ivf_indexed", "q_ann_ivf_kmeans",
        "q_ann_ivf_kmeans_multiprobe", "q_ann_ivf_multiprobe", "q_ann_lsh",
        "q_ann_lsh_multiprobe", "q_ann_lsh_multitable", "q_ann_pq")
        .map(v => shared.getOrElse(v, queries(v)(s, d))
          .select(lit(v.stripPrefix("q_")).alias("variant"), col("vec_id")))
        .reduce(_ unionAll _)
        .join(gt, Seq("vec_id"), "left_semi")
        .groupBy("variant")
        .agg(round(count(lit(1)).cast("double") / 20.0, 6).alias("recall"))
        .orderBy("variant")
    }),

    // similarity: BATCH ANN — the realistic retrieval shape (many queries
    // at once): 5 query vectors broadcast as one probe set, the corpus is
    // scanned ONCE and every (query, candidate) cosine scored in a single
    // narrow pass; per-query top-5 via row_number, which Spark plans with
    // WindowGroupLimit — each map task keeps only its local top-5 per
    // query BEFORE the shuffle, so the exchange carries O(tasks × Q × k)
    // rows, not the full scored cross product.
    "q_ann_batch" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.orderBy("vec_id").limit(5)
        .select(col("vec_id").alias("qid"),
          Similarity.asDouble(col("embedding")).alias("qv"))
      val scored = emb
        .select(col("vec_id"), Similarity.asDouble(col("embedding")).alias("v"))
        .crossJoin(broadcast(q))
        .select(col("qid"), col("vec_id"),
          Similarity.cosine(col("v"), col("qv")).alias("sim"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(desc("sim"), col("vec_id"))
      scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 5)
        .select(concat(col("qid").cast("string"), lit("_"),
          col("vec_id").cast("string")).alias("key"),
          col("qid"), col("vec_id"), col("sim"))
        .orderBy("key")
    }),

    // similarity: the trained-index + recall-lever pairing — k-means
    // centroids AND 2-cell multi-probe (the two levers compose; measured
    // the best recall of all ANN variants on the fixture)
    "q_ann_ivf_kmeans_multiprobe" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.orderBy("vec_id").limit(1)
        .select(Similarity.asDouble(col("embedding")).alias("qv"))
      val base = emb.select(col("vec_id"),
        Similarity.asDouble(col("embedding")).alias("v"))
      val cents = Similarity.kmeansCentroids(base, "vec_id", "v",
        nCells = 8, iters = 3, dim = 64)
      Similarity.ivfTopKMultiProbeWithCentroids(emb, "vec_id", "embedding",
        q, k = 20, cents, nProbe = 2)
    }),

    // similarity: embedding-cosine near-dup pairs (LSH-pruned self-join).
    // Norms are computed ONCE PER ROW before the join — inside the pair
    // expression they would be recomputed per candidate pair, tripling the
    // per-pair flops (dot+2 norms vs 1 dot). sqrt(dot(v,v)) here is the
    // exact same fold the oracle evaluates, so values are bit-identical.
    "q_neardup_embedding" -> ((s, d) => {
      val base = Tables.embeddings(s, d)
        .select(col("vec_id"), Similarity.asDouble(col("embedding")).alias("v"))
        .withColumn("bucket", Similarity.lshBucket(col("v"), 64, 4))
        .withColumn("nrm", Similarity.norm(col("v")))
      val a = base.select(col("vec_id").alias("id1"), col("v").alias("v1"),
        col("nrm").alias("n1"), col("bucket"))
      val b = base.select(col("vec_id").alias("id2"), col("v").alias("v2"),
        col("nrm").alias("n2"), col("bucket"))
      a.join(b, Seq("bucket")).filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          round(Similarity.dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 6)
            .alias("cos"))
        .filter(col("cos") >= 0.3)
        .orderBy("id1", "id2")
    }),

    // D4/E6 — multi-group regex runtime parse ("N hours M" / "N minutes")
    "q_runtime_minutes" -> ((s, d) => {
      val k = col("p_partkey") % 3
      val sz = col("p_size")
      val raw = when(k === 0, concat(sz.cast("string"), lit(" hours "),
          (sz % 60).cast("string")))
        .when(k === 1, concat((sz * 10).cast("string"), lit(" minutes")))
        .otherwise(concat(sz.cast("string"), lit(" h")))
      Tables.part(s, d).select(col("p_partkey"), raw.alias("raw"))
        .withColumn("minutes", TextParse.parseRuntimeMinutes(col("raw")))
        .orderBy("p_partkey")
    }),

    // D5 — list→string join (concat_ws over a token array)
    "q_join_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextParse.joinTokens(slice(split(col("text"), " "), 1, 5)).alias("head5"))
        .orderBy("doc_id")),

    // E2 — lenient single-format date parse
    "q_date_lenient" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").alias("raw"))
        .withColumn("parsed", to_date(col("raw")))
        .orderBy("o_orderkey")),

    // E5 — strict numeric coercion as a validation pass (corrupt-row finder)
    "q_strict_cast" -> ((s, d) => {
      val raw = when(col("event_id") % 7 === 0,
          concat(lit("x"), col("user_id").cast("string")))
        .otherwise(col("user_id").cast("string"))
      Tables.events(s, d).select(col("event_id"), raw.alias("raw"))
        .withColumn("parsed", col("raw").cast("long"))
        .withColumn("corrupt", col("parsed").isNull)
        .orderBy("event_id")
    }),

    // E7 — boolean derivation from a string column
    "q_bool_derive" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          DatesNums.boolFromString(col("event_type"), "purchase").alias("is_purchase"))
        .orderBy("event_id")),

    // F1 — key consolidation into one MapType column (alt_titles shape)
    "q_consolidate_map" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .withColumn("alt_a", when(col("doc_id") % 3 === 0, col("lang")))
        .withColumn("alt_b", when(col("doc_id") % 5 === 0, upper(col("source"))))
      Cleaning.consolidateToMap(base, Seq("alt_a", "alt_b"), "alts")
        .select(col("doc_id"), to_json(col("alts")).alias("alts_json"))
        .orderBy("doc_id")
    }),

    // H3 — count rows
    "q_count_rows" -> ((s, d) =>
      Tables.lineitem(s, d).agg(count(lit(1)).alias("n"))),

    // H8 — group by an array-typed key
    "q_group_by_array" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(slice(split(col("text"), " "), 1, 2).alias("k"))
        .agg(count(lit(1)).alias("cnt"))
        .select(concat_ws(" ", col("k")).alias("key2"), col("cnt"))
        .orderBy("key2")),

    // I1 — offset+limit slice over an explicit total order
    "q_slice" -> ((s, d) =>
      Inspect.slice(
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"),
        Seq(asc("l_orderkey"), asc("l_linenumber"), asc("l_partkey"), asc("l_suppkey")),
        100, 110)
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),

    // C4 — data-dependent null-ratio column pruning (survivor list)
    "q_prune_columns" -> ((s, d) => {
      val df = Tables.documents(s, d)
        .withColumn("mostly_null", when(col("doc_id") % 100 === 0, lit("x")))
      val pruned = Dedup.pruneMostlyNullColumns(df, 0.9)
      import s.implicits._
      pruned.columns.sorted.toSeq.toDF("col_name")
    }),

    // §1.2 — from_json over a stringified-JSON blob column
    "q_from_json" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").alias("k"))
        .orderBy("event_id")),

    // text: REAL BPE tokenization against a fixed merges table — the
    // native kernel applies SentencePiece-style leftmost-lowest-rank
    // merging per word (a zero-shuffle projection; the merges table is
    // the broadcast model artifact). Token counts are now subword counts,
    // not word counts.
    "q_bpe_tokens" -> ((s, d) => {
      val toks = graft.functions.Bpe.bpe_tokens(col("text"),
        TextAnalysis.DefaultBpeMerges)
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(toks).cast("long").alias("n_bpe"),
          concat_ws("|", slice(toks, 1, 10)).alias("head_toks"))
        .orderBy("doc_id")
    }),

    // text: BPE-ish regex tokenization
    "q_regex_tokens" -> ((s, d) => {
      val toks = TextAnalysis.regexTokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(toks).cast("long").alias("n_rtokens"),
          concat_ws("|", slice(toks, 1, 8)).alias("head_toks"))
        .orderBy("doc_id")
    }),

    // set op — EXCEPT
    "q_set_except" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").alias("nk"))
        .except(Tables.supplier(s, d).filter(col("s_suppkey") % 2 === 0)
          .select(col("s_nationkey").alias("nk")))
        .orderBy("nk")),

    // exact interpolated median + correlation aggregates
    "q_median_corr" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).alias("corr_qty_price"))),

    // tie-corrected Spearman ρ through DISTRIBUTED fractional ranks — no
    // single-task global window anywhere (the rank tables are built via
    // range-repartition + partition-offset cumsum)
    "q_spearman" -> ((s, d) =>
      Aggregates.spearmanCorr(Tables.lineitem(s, d),
        "l_quantity", "l_extendedprice")),

    // PII scrub — redact emails/URLs before training
    "q_scrub_pii" -> ((s, d) => {
      val dirty = when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" user@example.com see https://example.com/x")))
        .otherwise(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.scrubPii(substring(dirty, 1, 80)).alias("clean"))
        .orderBy("doc_id")
    }),

    // cross join (small × small)
    "q_cross_join" -> ((s, d) =>
      Tables.region(s, d).select(col("r_name"))
        .crossJoin(Tables.nation(s, d).select(col("n_name")))
        .orderBy("r_name", "n_name")),

    // G-extra — upsert/merge by key (the MERGE INTO dataflow): every 10th
    // customer's balance zeroed (row replace), every 100th key re-inserted
    // under a new id (append) — one full-outer join, no driver loop
    "q_upsert" -> ((s, d) => {
      val t = Tables.customer(s, d).select("c_custkey", "c_name", "c_acctbal")
      val upd = t.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), col("c_name"), lit(0.0).alias("c_acctbal"))
      val novel = t.filter(col("c_custkey") % 100 === 0)
        .select((col("c_custkey") + 10000000L).alias("c_custkey"),
          concat(lit("new_"), col("c_custkey").cast("string")).alias("c_name"),
          lit(1.0).alias("c_acctbal"))
      Joins.upsert(t, upd.unionByName(novel), Seq("c_custkey"))
        .orderBy("c_custkey")
    }),

    // exact per-group median
    "q_group_median" -> ((s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"))
        .orderBy("l_returnflag")),

    // TF-IDF top-3 terms per sampled document
    "q_tfidf_top" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).alias("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).alias("tf"))
      val dfreq = tf.groupBy("token").agg(count(lit(1)).alias("df"))
      val n = docs.agg(count(lit(1)).alias("N"))
      val scored = tf.filter(col("doc_id") % 50 === 0)
        .join(dfreq, "token").crossJoin(broadcast(n))
        .withColumn("tfidf",
          round(col("tf") * log(col("N").cast("double") / col("df")), 6))
      val w = Window.partitionBy("doc_id").orderBy(desc("tfidf"), asc("token"))
      scored.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("doc_id", "token", "tfidf", "rn")
        .orderBy("doc_id", "rn")
    }),

    // explode + aggregate — corpus token frequency, top-20
    "q_token_freq" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).alias("token"))
        .groupBy("token").agg(count(lit(1)).alias("n"))
        .orderBy(desc("n"), asc("token")).limit(20)),

    // grouped collect_set (sorted for determinism)
    "q_group_collect" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("source")
        .agg(array_sort(collect_set(col("lang"))).alias("langs"),
          count(lit(1)).alias("n_docs"))
        .select(col("source"), concat_ws(",", col("langs")).alias("langs"),
          col("n_docs"))
        .orderBy("source")),

    // set op — UNION (distinct)
    "q_set_union" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").alias("nk"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").alias("nk")))
        .distinct().orderBy("nk")),

    // as-of join — latest prior view value per purchase (union+window plan)
    "q_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts").agg(max("value").alias("vval"))
      Joins.asOf(purchases, views, Seq("user_id"), "ts", "ts", Seq("vval"))
        .select(col("event_id"), col("user_id"), round(col("vval"), 6).alias("vval"))
        .orderBy("event_id")
    }),

    // salted equi-join (skew spread) — result identical to the plain join
    "q_join_salted" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").alias("l_orderkey"), col("o_orderstatus"))
      Skew.saltedJoin(l, o, Seq("l_orderkey"), salts = 8,
        bigSaltFrom = Seq("l_orderkey", "l_linenumber"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).alias("n"),
          Aggregates.exactSum(col("l_quantity")).alias("sum_qty"))
        .orderBy("o_orderstatus")
    }),

    // two-phase exact distinct count per group
    "q_distinct_two_phase" -> ((s, d) =>
      Skew.twoPhaseDistinctCount(Tables.lineitem(s, d),
        Seq("l_returnflag"), "l_partkey")
        .orderBy("l_returnflag")),

    // batch gap-based sessionization (lag + running sum of boundaries)
    "q_sessionize_batch" -> ((s, d) =>
      Sessionize.sessions(Tables.events(s, d), "user_id", "ts", "event_id", 30)
        .select(col("user_id"), col("session_seq"), col("n_events"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").alias("s_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").alias("s_end"))
        .orderBy("user_id", "session_seq")),

    // product analytics: 3-step funnel (view → later click → later
    // purchase per user, first-qualifying-time chaining). Comparisons run
    // on epoch MICROS on both engines — the fixture carries sub-µs nanos
    // DuckDB keeps and Spark truncates, so raw-ts inequalities would be
    // engine-dependent for same-µs event pairs.
    "q_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).alias("tus"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("tus").alias("t1"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("tus") > col("t1"))
        .groupBy("user_id").agg(min("tus").alias("t2"))
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("tus") > col("t2"))
        .groupBy("user_id").agg(min("tus").alias("t3"))
      v.agg(count(lit(1)).alias("n_view"))
        .crossJoin(c.agg(count(lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(count(lit(1)).alias("n_view_click_purchase")))
    }),

    // product analytics: cohort retention — users by first-seen day ×
    // active-day offset (the classic retention triangle), one distinct
    // pass + one grouped pass
    "q_cohort_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts").cast("date").alias("day"))
      val first = ev.groupBy("user_id").agg(min("day").alias("cohort_day"))
      ev.distinct().join(first, "user_id")
        .select(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long").alias("day_offset"))
        .groupBy("cohort_day", "day_offset").agg(count(lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // product analytics: next-event transition matrix — per-user lead
    // pairs, counts and row-normalized probabilities (the Markov view of
    // the event stream); one user-keyed window + one tiny grouped pass
    "q_event_transitions" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("tus"), col("event_id"))
      val wSrc = org.apache.spark.sql.expressions.Window.partitionBy("src")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).alias("tus"))
        .withColumn("dst", lead(col("event_type"), 1).over(w))
        .filter(col("dst").isNotNull)
        .groupBy(col("event_type").alias("src"), col("dst"))
        .agg(count(lit(1)).alias("n"))
        .withColumn("p",
          round(col("n").cast("double") / sum(col("n")).over(wSrc), 6))
        .orderBy("src", "dst")
    }),

    // event cleaning: debounce — drop an event within 60 s of the same
    // user's previous event (duplicate-beacon suppression, one window)
    "q_debounce" -> ((s, d) =>
      Sessionize.debounce(Tables.events(s, d), "user_id", "ts", "event_id",
        minGapMs = 60000L)
        .select("event_id", "user_id").orderBy("event_id")),

    // aggregate family: argmax/argmin — each user's highest- and
    // lowest-valued event id via max_by/min_by (one grouped pass, no
    // window, no self-join; ties broken by the max/min of the tied ids
    // so the answer is deterministic on both engines)
    "q_argmax" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"))
      // make the ordering key unique per user so arg ties cannot occur:
      // (value, event_id) pairs are distinct because event_id is unique
      ev.groupBy("user_id")
        .agg(
          max(struct(col("value"), col("event_id"))).getField("event_id")
            .alias("best_event"),
          min(struct(col("value"), col("event_id"))).getField("event_id")
            .alias("worst_event"),
          round(max(col("value")), 6).alias("best_value"))
        .orderBy("user_id")
    }),

    // join family: NULL-SAFE equi-join (<=> / IS NOT DISTINCT FROM) —
    // null keys match each other instead of silently dropping (the
    // semantics corner plain equi-joins get wrong on nullable keys)
    "q_join_nullsafe" -> ((s, d) => {
      val ev = Tables.events(s, d)
      // 1-in-100 slices keep the null-key group's cross product bounded
      // (the query exists for its join semantics, not its volume)
      val l = ev.filter(col("event_id") % 100 === 0)
        .select(col("event_id").alias("l_id"),
          nullif(col("event_type"), lit("error")).alias("k"))
      val r = ev.filter(col("event_id") % 100 === 1)
        .select(col("event_id").alias("r_id"),
          nullif(col("event_type"), lit("error")).alias("k"))
      l.join(r, l("k") <=> r("k"))
        .groupBy(l("k").alias("k"))
        .agg(count(lit(1)).alias("n_pairs"))
        .orderBy(col("k").asc_nulls_first)
    }),

    // schema evolution: UNION BY NAME with missing columns null-filled —
    // how two batches with drifted schemas append safely
    "q_union_by_name" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val a = ev.filter(col("event_id") % 2 === 0)
        .select(col("event_id"), col("event_type"), col("value"))
      val b = ev.filter(col("event_id") % 2 === 1)
        .select(col("event_id"), col("user_id"), col("event_type"))
      a.unionByName(b, allowMissingColumns = true)
        .orderBy("event_id")
    }),

    // ops report: per-event-type latency percentile bands (p50/p90/p99),
    // exact interpolated percentiles, one grouped pass
    "q_event_percentiles" -> ((s, d) =>
      Tables.events(s, d).groupBy("event_type")
        .agg(count(lit(1)).alias("n"),
          expr("percentile(value, array(0.5D, 0.9D, 0.99D))").alias("__q"))
        .select(col("event_type"), col("n"),
          round(col("__q").getItem(0), 6).alias("p50"),
          round(col("__q").getItem(1), 6).alias("p90"),
          round(col("__q").getItem(2), 6).alias("p99"))
        .orderBy("event_type")),

    // sketch: APPROXIMATE quantiles from a deterministic KMV sample — the
    // 256 rows with the smallest md5 draw (TakeOrderedAndProject: local
    // top-k per task + driver k-merge, no global sort) estimate p50/p90.
    // The 100 TB quantile path with none of rand()'s irreproducibility:
    // the sketch is a pure function of the ids, so the DuckDB mirror
    // replays it exactly — approximate vs the full data, deterministic
    // vs the oracle.
    "q_approx_quantile_kmv" -> ((s, d) =>
      Tables.events(s, d).select(col("event_id"), col("value"))
        .orderBy(ScaleDedup.hash32(col("event_id").cast("string"), 0),
          col("event_id"))
        .limit(256)
        .agg(count(lit(1)).alias("k"),
          round(expr("percentile(value, 0.5D)"), 6).alias("p50_est"),
          round(expr("percentile(value, 0.9D)"), 6).alias("p90_est"))),

    // monitoring: rolling anomaly flags — trailing-7-day per-user
    // mean/std from exact DECIMAL window sums; emit events with |z| > 3
    // over a ≥ 5-event baseline (rolling-window + z-score composed; the
    // fixture's users emit ~20 events/month, so an hour-scale baseline
    // would never reach 5 events)
    "q_rolling_anomaly" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts_ms"))
        .rangeBetween(-604800000L, 0L)
      val n = count(lit(1)).over(w)
      val sm = sum(col("value").cast("decimal(18,6)")).over(w).cast("double")
      val s2 = sum((col("value") * col("value")).cast("decimal(18,6)"))
        .over(w).cast("double")
      val mean = sm / n
      val variance = s2 / n - mean * mean
      Tables.events(s, d).select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).alias("ts_ms"), col("value"))
        .select(col("event_id"), col("user_id"), col("value"),
          n.cast("long").alias("n_base"),
          round((col("value") - mean) / sqrt(nullif(greatest(variance, lit(0.0)), lit(0.0))), 6)
            .alias("zscore"))
        .filter(col("n_base") >= 5 && abs(col("zscore")) > 3)
        .orderBy("event_id")
    }),

    // trailing event-time RANGE window — per user, count and exact-decimal
    // average of `value` over the preceding hour (rangeBetween on epoch
    // millis; the rolling-feature shape a monitoring/feature pipeline
    // computes). One shuffle on the user key.
    "q_window_rolling_range" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).alias("ts_ms"), col("value"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts_ms"))
        .rangeBetween(-3600000L, 0L)
      ev.select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).alias("n_1h"),
          round(sum(col("value").cast("decimal(18,6)")).over(w).cast("double")
            / count(lit(1)).over(w), 6).alias("avg_1h"))
        .orderBy("event_id")
    }),

    // robust numeric cleaning: MAD outlier gate on the event value feed
    // (median/MAD resist the outliers a mean/stddev filter would absorb)
    "q_outlier_mad" -> ((s, d) =>
      Aggregates.madOutlierKeep(
          Tables.events(s, d).select(col("event_id"), col("value")), "value")
        .orderBy("event_id")),

    // feature engineering: per-group z-score (exact DECIMAL moments, one
    // grouped pass broadcast back; zero-variance groups yield NULL)
    "q_zscore_by_group" -> ((s, d) =>
      Aggregates.zscoreByGroup(
          Tables.events(s, d).select(col("event_id"), col("event_type"),
            col("value")), "event_type", "value")
        .orderBy("event_id")),

    // numeric cleaning: winsorize — clamp value to its exact [p1, p99];
    // keeps every row, bounds tail influence (companion of the MAD gate)
    "q_winsorize" -> ((s, d) =>
      Aggregates.winsorize(
          Tables.events(s, d).select(col("event_id"), col("value")), "value")
        .orderBy("event_id")),

    // tumbling-window batch aggregate over event time
    "q_window_tumbling" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").alias("w"))
        .agg(count(lit(1)).alias("n"),
          Aggregates.exactSum(col("value"), 6).alias("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
          col("n"), col("sum_value"))
        .orderBy("bucket")),

    // per-group linear trend fit (closed-form moments, one shuffle)
    "q_regr_trend" -> ((s, d) =>
      Aggregates.linearFit(Tables.lineitem(s, d), "l_returnflag",
          "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag")),

    // text: in-document duplicate-line removal (same planted boilerplate
    // as q_quality_repetition — this is the remediation, that's the signal)
    "q_dedup_lines" -> ((s, d) => {
      val line1 = substring(col("text"), 1, 40)
      val dirty = when(col("doc_id") % 3 === 0,
        concat(col("text"), lit("\n"), line1, lit("\n"), line1))
        .otherwise(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), dirty.alias("raw"))
        .select(col("doc_id"), col("raw"),
          TextAnalysis.dedupLinesInDoc(col("raw")).alias("text_clean"))
        .select(col("doc_id"), col("text_clean"),
          (length(col("raw")) - length(col("text_clean"))).cast("long")
            .alias("removed_chars"))
        .orderBy("doc_id")
    }),

    // retrieval: BM25 top-5 per keyword query (lexical-search baseline)
    "q_bm25_topk" -> ((s, d) =>
      TextAnalysis.bm25TopK(Tables.documents(s, d), "doc_id", "text",
          Bm25Queries, k = 5)
        .select("query_id", "doc_id", "score", "rank")
        .orderBy("query_id", "rank")),

    // text: RAKE keyword extraction — top-20 content phrases by
    // degree/frequency word scores (model-free corpus-card keywords)
    "q_rake_keywords" -> ((s, d) =>
      TextAnalysis.rakeKeywords(Tables.documents(s, d), "text",
        topK = 20, maxWords = 3)),

    // retrieval: Dirichlet query-likelihood top-5 — the LM ranker the
    // stack A/Bs against BM25 over the same query batch
    "q_qlm_topk" -> ((s, d) =>
      TextAnalysis.qlmTopK(Tables.documents(s, d), "doc_id", "text",
          Bm25Queries, k = 5)
        .select("query_id", "doc_id", "score", "rank")
        .orderBy("query_id", "rank")),

    // Rank-biased overlap between the BM25 and QLM runs (p=0.9, k=5) —
    // the top-weighted ranker-agreement diff, computed on the two
    // runs-sized outputs (the corpus is scanned only by the runs).
    "q_rbo" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val a = TextAnalysis.bm25TopK(docs, "doc_id", "text", Bm25Queries, k = 5)
      val b = TextAnalysis.qlmTopK(docs, "doc_id", "text", Bm25Queries, k = 5)
      TextAnalysis.rankBiasedOverlap(a, b, "query_id", "doc_id", "rank",
        k = 5, p = 0.9)
    }),

    // retrieval eval: NDCG@5 / AP@5 / RR of the BM25 run against graded
    // relevance (= distinct query terms present in the doc) — the offline
    // report a ranker change ships with
    "q_rank_eval" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      import s.implicits._
      val qtok = Bm25Queries.toDF("query_id", "qtext")
        .select(col("query_id"),
          explode(split(col("qtext"), " ")).alias("token"))
        .distinct()
      val rel = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).alias("token"))
        .distinct()
        .join(broadcast(qtok), "token")
        .groupBy("query_id", "doc_id")
        .agg(count(lit(1)).alias("rel"))
      val run = TextAnalysis.bm25TopK(docs, "doc_id", "text", Bm25Queries, 5)
        .select("query_id", "doc_id", "rank")
      TextAnalysis.rankingEval(run, rel, k = 5).orderBy("query_id")
    }),

    // time series: hourly resample + forward fill per user
    "q_gap_fill" -> ((s, d) =>
      Sessionize.gapFill(Tables.events(s, d), "user_id", "ts", "value",
          tieCol = "event_id")
        .select(col("user_id"),
          date_format(col("bucket_ts"), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
          col("value"))
        .orderBy("user_id", "bucket")),

    // ops tooling: key-skew pre-flight report on a prospective join key.
    // (Was registered as q_skew_report, silently shadowed by the later
    // Inspect.skewReport entry — revived under its own name in round 10.)
    "q_skew_preflight" -> ((s, d) =>
      Skew.skewReport(Tables.lineitem(s, d), Seq("l_suppkey"))),

    // composite: clean-ingest — the ingest-side prep chain the round-6
    // ops form: NFC normalize + invisible strip (planted dirt) →
    // in-document line dedup (planted boilerplate) → exact dedup on the
    // CLEANED fingerprint (cleaning is what makes near-identical raw
    // bytes collapse) → per-source dataset-card row. Text never
    // shuffles: the rewrite rides the scan, dedup ships md5 fingerprints,
    // the report is one grouped aggregation.
    "q_clean_ingest" -> ((s, d) => {
      val line1 = substring(col("text"), 1, 40)
      val dirt1 = when(col("doc_id") % 3 === 0,
        concat(col("text"), lit("\n"), line1, lit("\n"), line1))
        .otherwise(col("text"))
      val dirty = when(col("doc_id") % 2 === 0,
        concat(dirt1, lit(" cafe\u0301\u200B  tail\u0007 ")))
        .otherwise(dirt1)
      val cleaned = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextAnalysis.dedupLinesInDoc(
            TextAnalysis.normalizeText(dirty)).alias("clean"))
      // everything the dedup + report need is derived BEFORE the
      // exchange: the window shuffles 4 narrow columns, never text
      val slim = cleaned.select(col("doc_id"), col("source"),
        md5(col("clean")).alias("__fp"),
        size(split(col("clean"), " ")).alias("__nt"))
      val w = Window.partitionBy("__fp").orderBy("doc_id")
      slim.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .groupBy("source")
        .agg(count(lit(1)).alias("n_docs"),
          sum(col("__nt")).alias("n_tokens"))
        .orderBy("source")
    }),

    // vocabulary typo mining — entity-resolution shape: bucket the
    // DISTINCT vocabulary by length (tokens of length L emit keys
    // {L, L+1}, so |len(a)−len(b)| ≤ 1 pairs meet), equi-join buckets,
    // keep edit-distance-1 pairs. All-pairs work happens on the VOCAB
    // (Heaps-law small), never the corpus; the token stream only feeds
    // one count shuffle. Planted single-edit typos (scan→scam,
    // join→joim in a deterministic doc slice) give the miner targets.
    "q_token_typos" -> ((s, d) => {
      val dirty = when(col("doc_id") % 37 === 0,
          regexp_replace(col("text"), "\\bscan\\b", "scam"))
        .when(col("doc_id") % 41 === 0,
          regexp_replace(col("text"), "\\bjoin\\b", "joim"))
        .otherwise(col("text"))
      val vocab = Tables.documents(s, d)
        .select(explode(split(dirty, " ")).alias("token"))
        .groupBy("token").agg(count(lit(1)).alias("n"))
      val k = vocab.select(col("token"), col("n"),
        explode(array(length(col("token")), length(col("token")) + 1))
          .alias("b"))
      val a = k.select(col("b"), col("token").alias("t1"), col("n").alias("n1"))
      val b = k.select(col("b"), col("token").alias("t2"), col("n").alias("n2"))
      a.join(b, Seq("b")).filter(col("t1") < col("t2"))
        .filter(levenshtein(col("t1"), col("t2")) === 1)
        .select("t1", "t2", "n1", "n2").distinct()
        .orderBy("t1", "t2")
    }),

    // retrieval: reciprocal-rank fusion of two ANN retrievers (IVF +
    // multi-table LSH) — the standard way hybrid search combines ranked
    // lists without comparable scores: rrf = Σ 1/(60 + rank), missing
    // list membership contributes 0. Rank windows run over ≤20-row
    // retriever outputs, so the fusion itself is driver-trivial at any
    // corpus size — the cost lives in the retrievers.
    "q_rrf_fusion" -> ((s, d) => {
      def ranked(df: DataFrame, rn: String) = df.select(col("vec_id"),
        row_number().over(Window.orderBy(desc("cos"), col("vec_id")))
          .alias(rn))
      val a = ranked(queries("q_ann_ivf")(s, d), "ra")
      val b = ranked(queries("q_ann_lsh_multitable")(s, d), "rb")
      a.join(b, Seq("vec_id"), "full_outer")
        .select(col("vec_id"),
          round(coalesce(lit(1.0) / (lit(60) + col("ra")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("rb")), lit(0.0)), 9)
            .alias("rrf"))
        .orderBy(desc("rrf"), col("vec_id")).limit(10)
    }),

    // text: bigram-LM quality score (perplexity-filter ladder, rung 2)
    "q_bigram_logprob" -> ((s, d) =>
      TextAnalysis.bigramLogProb(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // mix: weighted reproducible sample — 25 docs, odds ∝ n_chars
    "q_weighted_sample" -> ((s, d) =>
      Mix.weightedSample(Tables.documents(s, d), "doc_id", "n_chars", 25)
        .select("doc_id", "n_chars", "draw_key")
        .orderBy(desc("draw_key"), col("doc_id"))),

    // text: Unicode NFC + control/zero-width strip + whitespace collapse
    // (planted combining accents, ZWSP, a control char, double spaces)
    "q_normalize_text" -> ((s, d) => {
      val dirty = when(col("doc_id") % 2 === 0,
        // "e"+U+0301 COMBINING ACUTE (composes under NFC), U+200B ZWSP,
        // double space, U+0007 BEL, trailing space - one probe per rule
        concat(col("text"), lit(" cafe\u0301\u200B  tail\u0007 ")))
        .otherwise(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.normalizeText(dirty).alias("text_norm"))
        .withColumn("n_norm", length(col("text_norm")).cast("long"))
        .orderBy("doc_id")
    }),

    // graph: weighted PageRank over the bipartite user↔event-type graph
    // (3 decimal-deterministic power iterations)
    "q_pagerank" -> ((s, d) => {
      val ue = Tables.events(s, d).groupBy("user_id", "event_type")
        .agg(count(lit(1)).alias("w"))
      val edges = ue.select(concat(lit("u:"), col("user_id")).alias("src"),
          concat(lit("t:"), col("event_type")).alias("dst"), col("w"))
        .unionAll(ue.select(concat(lit("t:"), col("event_type")).alias("src"),
          concat(lit("u:"), col("user_id")).alias("dst"), col("w")))
      Graph.pagerank(edges, iters = 3)
        .select(col("node"), round(col("rank"), 6).alias("rank"))
        .orderBy("node")
    }),

    // HITS over the DIRECTED user→event_type bipartite graph (no reverse
    // edges — hub/authority is what splits the two sides): users score as
    // hubs, event types as authorities. 3 mutual-reinforcement rounds.
    "q_hits" -> ((s, d) => {
      val edges = Tables.events(s, d).groupBy("user_id", "event_type")
        .agg(count(lit(1)).alias("w"))
        .select(concat(lit("u:"), col("user_id")).alias("src"),
          concat(lit("t:"), col("event_type")).alias("dst"), col("w"))
      Graph.hits(edges, iters = 3).orderBy("node")
    }),

    // similarity: kNN label prediction — the first 10 vectors take the
    // majority label of their 5 nearest neighbors (self excluded); the
    // embedding-space weak-labeling/eval loop over one corpus scan
    "q_knn_classify" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val probes = emb.orderBy("vec_id").limit(10)
        .select(col("vec_id").alias("qid"), col("label").alias("qlabel"),
          Similarity.asDouble(col("embedding")).alias("qv"))
      Similarity.knnPredict(emb, "vec_id", "embedding", "label", probes, k = 5)
        .orderBy("qid")
    }),

    // graph AUDIT: per-node triangle participation in the near-dup graph
    // (node-iterator: two equi-joins over the id-oriented edge list;
    // triangle density separates template families from chance collisions)
    "q_triangle_counts" -> ((s, d) => {
      val edges = ScaleDedup.minhashCandidatePairs(Tables.documents(s, d),
          "doc_id", "text", numHashes = 4, bands = 2)
        .select(col("id1").alias("src"), col("id2").alias("dst"))
      Graph.triangleCounts(edges).orderBy("node")
    }),

    // the hub-skew-proof variant: identical answer through the
    // degree-oriented joins (out-degree bounded by arboricity, so a
    // template-family mega-hub cannot anchor a quadratic wedge set)
    "q_triangle_counts_degree" -> ((s, d) => {
      val edges = ScaleDedup.minhashCandidatePairs(Tables.documents(s, d),
          "doc_id", "text", numHashes = 4, bands = 2)
        .select(col("id1").alias("src"), col("id2").alias("dst"))
      Graph.triangleCountsDegreeOriented(edges).orderBy("node")
    }),

    // graph AUDIT: degree histogram of the near-dup graph (mass at degree
    // 1 = pairwise accidents; a fat tail = template families)
    "q_degree_histogram" -> ((s, d) => {
      val edges = ScaleDedup.minhashCandidatePairs(Tables.documents(s, d),
          "doc_id", "text", numHashes = 4, bands = 2)
        .select(col("id1").alias("src"), col("id2").alias("dst"))
      Graph.degreeHistogram(edges).orderBy("degree")
    }),

    // similarity: SemDeDup — k-means cells, within-cell cosine pairs,
    // drop every vector with a lower-id neighbor at cos >= 0.3
    "q_semdedup" -> ((s, d) => {
      val base = Tables.embeddings(s, d)
        .select(col("vec_id"), Similarity.asDouble(col("embedding")).alias("v"))
      val cents = Similarity.kmeansCentroids(base, "vec_id", "v",
        nCells = 8, iters = 3, dim = 64).localCheckpoint()
      Similarity.semDedup(base, "vec_id", "v", cents, tau = 0.3)
        .orderBy("vec_id")
    }),

    // similarity: Local Outlier Factor over the shared Lloyd cells —
    // within-cell exact kNN (k=5, rounded-distance + id tie-break),
    // reachability density, LOF readout. Surfaces OOD embeddings.
    "q_lof" -> ((s, d) => {
      val base = Tables.embeddings(s, d)
        .select(col("vec_id"), Similarity.asDouble(col("embedding")).alias("v"))
      val cents = Similarity.kmeansCentroids(base, "vec_id", "v",
        nCells = 8, iters = 3, dim = 64).localCheckpoint()
      Similarity.lof(base, "vec_id", "v", cents, k = 5)
        .orderBy("vec_id")
    }),

    // similarity: grid-bucketed DBSCAN on the (dim0, dim1) projection —
    // eps-grid candidate join (never all-pairs), cores at minPts=5,
    // clusters = CC over core-core edges, borders adopt their min core
    // neighbor, the rest is noise. The oracle brute-forces the eps graph.
    "q_dbscan" -> ((s, d) =>
      Similarity.dbscan2d(Tables.embeddings(s, d), "vec_id", "embedding",
          eps = 0.02, minPts = 5)
        .orderBy("vec_id")),

    // similarity: cluster-mix report — docs per k-means cell and each
    // cell's corpus share (the topic-balance dataset-card table; the
    // embedding-space analog of q_domain_mix's source shares). Training
    // reuses the Lloyd trainer; the report is one tiny aggregation on
    // cell ids.
    "q_cluster_mix" -> ((s, d) => {
      val base = Tables.embeddings(s, d)
        .select(col("vec_id"), Similarity.asDouble(col("embedding")).alias("v"))
      val cents = Similarity.kmeansCentroids(base, "vec_id", "v",
        nCells = 8, iters = 3, dim = 64).localCheckpoint()
      val cells = Similarity.ivfAssign(base, "vec_id", "v", cents)
        .groupBy("cell").agg(count(lit(1)).alias("n_vecs"))
      val total = cells.agg(sum(col("n_vecs")).alias("__total"))
      cells.crossJoin(broadcast(total))
        .select(col("cell"), col("n_vecs"),
          round(col("n_vecs").cast("double") / col("__total"), 6).alias("share"))
        .orderBy("cell")
    }),

    // model-based quality gate: Naive-Bayes bag-of-words classifier
    // trained on lang=='en' and applied back over the corpus
    "q_nb_classify" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.naiveBayesScore(docs, "doc_id", "text",
          col("lang") === "en")
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .select("doc_id", "score", "pred", "lang")
        .orderBy("doc_id")
    }),

    // Bloom-filter join pruning: fact scan pre-filtered by a compact
    // dim-key membership sketch before the join shuffle (ops/BloomPrune).
    // Value-identical to the plain join — the oracle IS the plain join.
    "q_bloom_prune_join" -> ((s, d) => {
      val dim = Tables.supplier(s, d).filter(col("s_nationkey") === 3)
        .select("s_suppkey", "s_name")
      graft.ops.BloomPrune.prunedInnerJoin(
          Tables.lineitem(s, d).select("l_suppkey", "l_extendedprice", "l_discount"),
          "l_suppkey", dim, "s_suppkey", 1000L, 0.01)
        .groupBy("s_name")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double").alias("revenue"))
        .orderBy("s_name")
    }),

    // SCD Type-2 history build (ops/Scd): order-status change log per
    // customer → versioned rows with effective ranges. No-op observations
    // compress away; o_orderkey is the same-instant tie break.
    "q_scd2_build" -> ((s, d) =>
      graft.ops.Scd.scd2Build(
          Tables.orders(s, d).select("o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"),
          "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
        .select(col("o_custkey"), col("o_orderstatus"),
          col("effective_from").cast("date").alias("effective_from"),
          col("effective_to").cast("date").alias("effective_to"),
          col("is_current"))
        .orderBy("o_custkey", "effective_from", "o_orderstatus")),

    // Z-order (Morton) clustering key (ops/ZOrder): the multi-dimensional
    // layout key — pure shift/mask Column expression, zero UDF.
    "q_zorder_key" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          graft.ops.ZOrder.zorderKey(col("l_partkey"), col("l_suppkey")).alias("zkey"))
        .orderBy("zkey", "l_orderkey", "l_linenumber")),

    // Declarative data-quality gate (ops/Constraints): row-local checks
    // fold into ONE aggregation pass; uniqueness and referential
    // integrity get their minimal dedicated plans. The FK check is
    // deliberately violated (orders without lineitems exist).
    "q_dq_report" -> ((s, d) => {
      import graft.ops.Constraints._
      report(Tables.orders(s, d), Seq(
        NotNull("o_custkey"),
        InRange("o_totalprice", 0.0, 1000000.0),
        Satisfies("status_valid", col("o_orderstatus").isin("F", "O", "P")),
        Unique(Seq("o_orderkey")),
        RefIntegrity("o_orderkey", Tables.lineitem(s, d), "l_orderkey")))
    }),

    // Incremental aggregate maintenance (ops/IncrementalAgg): fold three
    // date-sliced delta batches of orders into the additive state, never
    // rescanning earlier slices; result == the full recompute (the
    // oracle IS the full group-by).
    "q_incr_agg" -> ((s, d) => {
      import graft.ops.IncrementalAgg._
      val o = Tables.orders(s, d)
      val cut1 = to_timestamp(lit("1997-01-01"))
      val cut2 = to_timestamp(lit("1999-01-01"))
      val batches = Seq(
        o.filter(col("o_orderdate") < cut1),
        o.filter(col("o_orderdate") >= cut1 && col("o_orderdate") < cut2),
        o.filter(col("o_orderdate") >= cut2))
        .map(b => aggregate(b, "o_custkey", "o_totalprice"))
      finish(merge(batches)).orderBy("o_custkey")
    }),

    // CDC apply (ops/Cdc): fold a deterministic I/U/D change batch
    // (derived from orders itself: every 7th order changes; op by key
    // mod 3) into the snapshot — the MERGE INTO shape.
    "q_cdc_apply" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val src = o.filter(col("o_orderkey") % 7 === 0)
        .withColumn("__m", col("o_orderkey") % 3)
      val changes = src.select(
        when(col("__m") === 2, col("o_orderkey") + 10000000L)
          .otherwise(col("o_orderkey")).alias("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"),
        when(col("__m") === 1, round(col("o_totalprice") * 2, 2))
          .otherwise(col("o_totalprice")).alias("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"),
        when(col("__m") === 0, "D").when(col("__m") === 1, "U")
          .otherwise("I").alias("op"))
      graft.ops.Cdc.applyCdc(o, changes, "o_orderkey", "op", "o_orderdate", "o_custkey")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          round(col("o_totalprice"), 2).alias("price"),
          col("o_orderdate").cast("date").alias("odate"))
        .orderBy("o_orderkey")
    }),

    // KMV set-overlap estimation (join-planning statistics): bottom-64
    // md5-draw sketches per side, (k-1)/r_k distinct estimates,
    // inclusion-exclusion overlap — deterministic, so the oracle replays
    // it exactly; the exact overlap rides along for honesty.
    "q_join_overlap_kmv" -> ((s, d) => {
      val k = 64
      val cut = to_timestamp(lit("1998-01-01"))
      // one scan → per-hash side flags (one shuffle on the small distinct
      // hash set) → one tiny aggregation carrying all three sketches AND
      // the exact overlap; the sketch inputs are the same sets a
      // four-scan formulation would see, so values are identical
      val perHash = Tables.lineitem(s, d)
        .select(graft.ops.ScaleDedup.hash32(col("l_suppkey").cast("string"), 0).alias("h"),
          (col("l_shipdate") < cut).alias("ina"))
        .groupBy("h")
        .agg(max(when(col("ina"), 1L).otherwise(0L)).alias("a"),
          max(when(!col("ina"), 1L).otherwise(0L)).alias("b"))
      import graft.functions.BottomKSketch.bottom_k_sketch
      def est(sk: Column): Column =
        when(size(sk) < k, size(sk).cast("double"))
          .otherwise(round(lit((k - 1).toDouble) /
            (element_at(sk, k).cast("double") / lit(4294967296.0)), 6))
      perHash.agg(
          bottom_k_sketch(when(col("a") === 1L, col("h")), k).alias("ska"),
          bottom_k_sketch(when(col("b") === 1L, col("h")), k).alias("skb"),
          bottom_k_sketch(col("h"), k).alias("sku"),
          sum(col("a") * col("b")).alias("exact_intersect"))
        .select(
          est(col("ska")).alias("est_a"), est(col("skb")).alias("est_b"),
          est(col("sku")).alias("est_union"),
          round(est(col("ska")) + est(col("skb")) - est(col("sku")), 6)
            .alias("est_intersect"),
          col("exact_intersect"))
    }),

    // Dictionary (categorical) encoding (ops/Cleaning.dictEncode):
    // value → dense id, dictionary broadcast back onto the data.
    "q_dict_encode" -> ((s, d) => {
      val (enc, _) = graft.ops.Cleaning.dictEncode(
        Tables.customer(s, d), "c_mktsegment", "seg_id")
      enc.select("c_custkey", "c_mktsegment", "seg_id").orderBy("c_custkey")
    }),

    // ABC (Pareto) classification: parts ranked by revenue, cumulative
    // share cut at 50%/80%. The running sum is over the DIMENSION-sized
    // per-part aggregate, not the fact table.
    "q_abc_analysis" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")).alias("__rev"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("__rev").desc, col("l_partkey"))
      val total = rev.agg(sum(col("__rev")).alias("__total"))
      rev.crossJoin(broadcast(total))
        .withColumn("cum_share",
          round((sum(col("__rev")).over(w) / col("__total")).cast("double"), 6))
        .withColumn("abc_class",
          when(col("cum_share") <= 0.5, "A")
            .when(col("cum_share") <= 0.8, "B").otherwise("C"))
        .select(col("l_partkey"), col("__rev").cast("double").alias("revenue"),
          col("cum_share"), col("abc_class"))
        .orderBy(desc("revenue"), col("l_partkey"))
    }),

    // Market-basket pair affinity: parts co-occurring in an order, with
    // lift vs independence. The self-join is on the order key, so the
    // pair fan-out is bounded by basket size squared — never corpus².
    "q_basket_pairs" -> ((s, d) => {
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val nOrders = Tables.lineitem(s, d)
        .agg(countDistinct(col("l_orderkey")).alias("__n"))
      val perPart = items.groupBy(col("l_partkey").alias("__pk"))
        .agg(count(lit(1)).alias("__pn"))
      val i2 = items.select(col("l_orderkey").alias("__ok2"),
        col("l_partkey").alias("p2"))
      val pairs = items
        .join(i2, col("l_orderkey") === col("__ok2") && col("l_partkey") < col("p2"))
        .groupBy(col("l_partkey").alias("p1"), col("p2"))
        .agg(count(lit(1)).alias("pair_n"))
      pairs
        .join(broadcast(perPart), col("p1") === col("__pk"))
        .withColumnRenamed("__pn", "n1").drop("__pk")
        .join(broadcast(perPart), col("p2") === col("__pk"))
        .withColumnRenamed("__pn", "n2").drop("__pk")
        .crossJoin(broadcast(nOrders))
        .withColumn("lift", round(col("pair_n").cast("double") * col("__n")
          / (col("n1") * col("n2")), 6))
        .select("p1", "p2", "pair_n", "lift")
        .orderBy(desc("pair_n"), col("p1"), col("p2"))
        .limit(20)
    }),

    // Per-group KMV distinct estimate beside the exact count — the
    // cardinality-statistics table with its own error audit.
    "q_approx_distinct_kmv" -> ((s, d) => {
      val k = 64
      val h = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          graft.ops.ScaleDedup.hash32(col("l_partkey").cast("string"), 0).alias("h"))
      h.groupBy("l_returnflag")
        .agg(graft.functions.BottomKSketch.bottom_k_sketch(col("h"), k).alias("sk"),
          countDistinct(col("h")).alias("exact_nd"))
        .select(col("l_returnflag"),
          when(size(col("sk")) < k, size(col("sk")).cast("double"))
            .otherwise(round(lit((k - 1).toDouble) /
              (element_at(col("sk"), k).cast("double") / lit(4294967296.0)), 6))
            .alias("est_nd"),
          col("exact_nd"))
        .orderBy("l_returnflag")
    }),

    // Generic per-group top-k (ops/Inspect.topKPerGroup): WindowGroupLimit
    // keeps the exchange at O(groups × k).
    "q_topk_per_group" -> ((s, d) =>
      graft.ops.Inspect.topKPerGroup(
          Tables.lineitem(s, d)
            .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"),
          Seq("l_returnflag"), 3,
          Seq(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber")))
        .orderBy(col("l_returnflag"), desc("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"))),

    // One-pass table profile (ops/Inspect.tableProfile): the relational
    // dataset-card row per column.
    "q_table_profile" -> ((s, d) =>
      graft.ops.Inspect.tableProfile(Tables.orders(s, d),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))),

    // Chi-square independence (ops/Aggregates.chiSquare): market segment
    // vs order priority over the joined star.
    "q_chi_square" -> ((s, d) => {
      val j = Tables.orders(s, d).select("o_custkey", "o_orderpriority")
        .join(Tables.customer(s, d).select("c_custkey", "c_mktsegment"),
          col("o_custkey") === col("c_custkey"))
      graft.ops.Aggregates.chiSquare(j, "c_mktsegment", "o_orderpriority")
    }),

    // Warehouse flagship composite: DQ gate → CDC apply → SCD2 history
    // build → point-in-time enrichment → versioned revenue report. The
    // warehouse twin of q_llm_prep_full: every stage is an
    // already-oracle-proven operator, composed end-to-end; one window
    // chain per key, one range-predicate join, one final aggregation.
    "q_warehouse_flagship" -> ((s, d) => {
      val o = Tables.orders(s, d)
      // 1. DQ gate (row-local; Constraints semantics inlined as the
      // keep-predicate the report stage would enforce)
      val gated = o.filter(col("o_custkey").isNotNull &&
        col("o_totalprice") >= 0.0 && col("o_totalprice") <= 1000000.0)
      // 2. CDC apply (same deterministic %7 change feed as q_cdc_apply)
      val src = gated.filter(col("o_orderkey") % 7 === 0)
        .withColumn("__m", col("o_orderkey") % 3)
      val changes = src.select(
        when(col("__m") === 2, col("o_orderkey") + 10000000L)
          .otherwise(col("o_orderkey")).alias("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"),
        when(col("__m") === 1, round(col("o_totalprice") * 2, 2))
          .otherwise(col("o_totalprice")).alias("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"),
        when(col("__m") === 0, "D").when(col("__m") === 1, "U")
          .otherwise("I").alias("op"))
      // The applied snapshot feeds TWO consumers (the SCD2 dim build and
      // the point-in-time fact side); differently-pruned projections make
      // the two subtrees canonically distinct, so AQE exchange reuse
      // cannot dedupe them and the orders scan + change-window +
      // anti-join ran twice. Materialize it once (round 18), projected to
      // the union of both consumers' columns. localCheckpoint truncates
      // lineage and stores blocks on executors, so an executor loss FAILS
      // the job rather than recomputing (Iterate.scala's documented
      // trade); the rerun recomputes from the reliable parquet inputs.
      val applied = graft.ops.Cdc.applyCdc(
          gated, changes, "o_orderkey", "op", "o_orderdate", "o_custkey")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
          "o_totalprice")
        .localCheckpoint()
      // 3. SCD2 status history per customer over the applied snapshot
      val dim = graft.ops.Scd.scd2Build(
          applied.select("o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"),
          "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
        .select(col("o_custkey"), col("o_orderstatus").alias("status_version"),
          col("effective_from"), col("effective_to"))
      // 4. point-in-time enrich each applied order with its version
      val enriched = graft.ops.Scd.pointInTime(
        applied.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        "o_custkey", "o_orderdate", dim, "o_custkey")
      // 5. versioned revenue report
      enriched.groupBy("status_version")
        .agg(count(lit(1)).alias("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"))
        .orderBy("status_version")
    }),

    // SCD2 point-in-time lookup (ops/Scd.pointInTime): each order keyed
    // to the status version effective at its own date — the fact-load
    // lookup against a versioned dimension. Ranges are disjoint per key,
    // so exactly one version matches.
    "q_scd2_lookup" -> ((s, d) => {
      val dim = graft.ops.Scd.scd2Build(
          Tables.orders(s, d).select("o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"),
          "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
        .select(col("o_custkey"), col("o_orderstatus").alias("status_version"),
          col("effective_from"), col("effective_to"))
      val fact = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate")
      graft.ops.Scd.pointInTime(fact, "o_custkey", "o_orderdate", dim, "o_custkey")
        .select(col("o_orderkey"), col("o_custkey"), col("status_version"),
          col("effective_from").cast("date").alias("vfrom"))
        .orderBy("o_orderkey", "status_version", "vfrom")
    }),

    // Exact heavy hitters over the token stream (Aggregates.exactHeavyHitters):
    // Misra-Gries candidates (one scan, O(sketchK) state) → exact rescore of
    // the ≤ sketchK candidates (one scan, literal membership filter) →
    // integer threshold cnt·100 > n. The oracle runs the full-vocabulary
    // GROUP BY ... HAVING this plan avoids shuffling at 100 TB.
    "q_heavy_tokens" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).alias("token"))
      graft.ops.Aggregates.exactHeavyHitters(tok, "token", k = 100, sketchK = 400)
        .withColumnRenamed("item", "token")
    }),

    // 2D skyline (Inspect.skyline2D): parts on the Pareto frontier of
    // (cheapest price, largest size). Bucket-local elimination prunes in
    // parallel; only skyline-sized survivors reach the exact global pass.
    // The oracle runs the quadratic NOT EXISTS dominance self-join that
    // defines the answer.
    "q_skyline" -> ((s, d) =>
      graft.ops.Inspect.skyline2D(Tables.part(s, d),
          round(col("p_retailprice") * 100), col("p_size"))
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")),

    // BFS 3-hop distances (Graph.bfsDistances) over the bipartite
    // user↔event-type graph (same edge construction as q_pagerank), from
    // the lexicographically-first event-type node. Hop 1 = its users,
    // hop 2 = everything those users also did, hop 3 = that cohort.
    "q_graph_bfs" -> ((s, d) => {
      val ue = Tables.events(s, d)
        .select(col("user_id"), col("event_type")).distinct()
      val ed = ue.select(concat(lit("u:"), col("user_id")).alias("src"),
          concat(lit("t:"), col("event_type")).alias("dst"))
        .unionByName(ue.select(concat(lit("t:"), col("event_type")).alias("src"),
          concat(lit("u:"), col("user_id")).alias("dst")))
      val src = Tables.events(s, d)
        .agg(concat(lit("t:"), min(col("event_type"))).alias("node"))
      graft.ops.Graph.bfsDistances(ed, src, hops = 3).orderBy("node")
    }),

    // Weighted shortest distances (Graph.shortestPaths): Bellman-Ford
    // 3-round relaxation over the weighted bipartite user↔event-type
    // graph (edge cost = interaction count), from the
    // lexicographically-first event-type node. LONG min/plus end-to-end.
    "q_graph_sssp" -> ((s, d) => {
      val ue = Tables.events(s, d).groupBy("user_id", "event_type")
        .agg(count(lit(1)).alias("w"))
      val ed = ue.select(concat(lit("u:"), col("user_id")).alias("src"),
          concat(lit("t:"), col("event_type")).alias("dst"), col("w"))
        .unionByName(ue.select(
          concat(lit("t:"), col("event_type")).alias("src"),
          concat(lit("u:"), col("user_id")).alias("dst"), col("w")))
      val src = Tables.events(s, d)
        .agg(concat(lit("t:"), min(col("event_type"))).alias("node"))
      graft.ops.Graph.shortestPaths(ed, src, rounds = 3).orderBy("node")
    }),

    // Principal component of the embedding space
    // (Similarity.pcaPowerIteration): one-pass DECIMAL covariance →
    // 8 deterministic power-iteration rounds over the metadata-sized
    // matrix table — the embedding-drift/structure audit (which
    // direction dominates the corpus) without any vector leaving its
    // partition twice.
    "q_pca_top" -> ((s, d) =>
      Similarity.pcaPowerIteration(Tables.embeddings(s, d), "embedding",
          dim = 64, iters = 8)
        .orderBy("dim_idx")),

    // Entity-resolution composite (catalog consolidation): plant typo
    // twins of every 20th part name → sorted-neighborhood blocking →
    // levenshtein ≤ 2 gate → connected components → one golden record
    // per entity cluster (canonical = min id, its name, member count).
    // The fixture catalog repeats names heavily, so identical rows chain
    // through sorted adjacency and typo twins merge into their name's
    // cluster — the catalog collapses to its distinct golden entities.
    // Scale shape: blocking emits n·w candidates (never all-pairs), the
    // gate is a narrow filter, clustering is the same pointer-jumping
    // engine as text dedup.
    "q_er_golden" -> ((s, d) => {
      val base = Tables.part(s, d)
        .select(col("p_partkey").cast("long").alias("id"),
          col("p_name").alias("name"))
      val twins = base.filter(col("id") % 20 === 0)
        .select((col("id") + 10000000L).alias("id"),
          concat(expr("substring(name, 1, length(name) - 1)"), lit("x"))
            .alias("name"))
      val ent = base.unionByName(twins)
      val pairs = ScaleDedup.sortedNeighborPairs(ent, "id",
        lower(col("name")), window = 3)
      val gated = pairs
        .join(ent.select(col("id").alias("id1"), col("name").alias("n1")), "id1")
        .join(ent.select(col("id").alias("id2"), col("name").alias("n2")), "id2")
        .filter(levenshtein(col("n1"), col("n2")) <= 2)
        .select("id1", "id2")
      ScaleDedup.connectedComponents(ent.select("id"), gated)
        .groupBy(col("label").alias("cluster"))
        .agg(count(lit(1)).alias("n_members"))
        .join(ent.select(col("id").alias("cluster"),
          col("name").alias("canonical_name")), "cluster")
        .orderBy("cluster")
    }),

    // Inverted positional index (InvertedIndex.buildPostings): the
    // token-keyed posting-list pivot of the corpus — audit slice: the
    // 20 most selective tokens' postings with doc counts and positions.
    "q_inverted_postings" -> ((s, d) => {
      val post = graft.ops.InvertedIndex.buildPostings(
        Tables.documents(s, d), "doc_id", "text")
      post.groupBy("token")
        .agg(count(lit(1)).alias("df"), sum("tf").alias("ctf"))
        .orderBy(col("df").asc, col("token").asc).limit(20)
    }),

    // Exact phrase search via posting-list intersection
    // (InvertedIndex.phraseSearch): every doc containing the contiguous
    // phrase "big order scan", with its occurrence count — the query
    // touches only the three tokens' postings, never the text column.
    "q_phrase_search" -> ((s, d) => {
      val post = graft.ops.InvertedIndex.buildPostings(
        Tables.documents(s, d), "doc_id", "text")
      graft.ops.InvertedIndex.phraseSearch(
          post, Seq("big", "order", "scan"))
        .orderBy("doc_id")
    }),

    // Hierarchy explosion (Graph.explodeHierarchy): BOM rollup over a
    // binary part hierarchy (parent k → children 2k, 2k+1, qty = child
    // mod 3 + 1) — per root, every descendant with its multiplied-out
    // total quantity; the recursive-CTE shape as unrolled frontier joins.
    "q_bom_rollup" -> ((s, d) => {
      val p = Tables.part(s, d).select(col("p_partkey"))
      val edges = p.select(col("p_partkey").alias("parent"),
          explode(array(col("p_partkey") * 2, col("p_partkey") * 2 + 1))
            .alias("child"))
        .join(p.select(col("p_partkey").alias("child")), "child")
        .select(col("parent"), col("child"),
          (pmod(col("child"), lit(3)) + 1).alias("qty"))
      val roots = s.range(2, 6).select(col("id").alias("node"))
      graft.ops.Graph.explodeHierarchy(edges, roots, maxDepth = 16)
        .orderBy("root", "node")
    }),

    // OHLC bars (Sessionize.resampleOhlc): per user, 15-minute
    // open/high/low/close/count/volume — ONE grouped aggregation,
    // open/close as min/max over a (ts, tie, value) struct instead of a
    // per-bucket sort.
    "q_resample_ohlc" -> ((s, d) =>
      Sessionize.resampleOhlc(Tables.events(s, d), "user_id", "ts",
          tieCol = "event_id", valCol = "value", bucketMs = 900000L)
        .orderBy("user_id", "bucket_ms")),

    // CUSUM changepoints (Sessionize.cusumChangepoints) on a planted
    // per-user second-half mean shift: the sequential max(0, ·) recursion
    // rewritten as running-sum − running-min — two stacked frames over
    // one key sort, DECIMAL end-to-end so the flag boundary is exact.
    "q_cusum_change" -> ((s, d) => {
      val ow = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val cw = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      val planted = Tables.events(s, d)
        .withColumn("__rn", row_number().over(ow))
        .withColumn("__cnt", count(lit(1)).over(cw))
        .withColumn("value_drift", col("value") +
          when(col("__rn") * 2 > col("__cnt"), lit(150.0)).otherwise(lit(0.0)))
      Sessionize.cusumChangepoints(planted, "user_id", "ts",
          tieCol = "event_id", valCol = "value_drift", kappa = 0.5, h = 4.0)
        .orderBy("user_id", "event_id")
    }),

    // Trailing-20 EWMA per user (Sessionize.ewmaTrailing): bounded ROWS
    // frame, literal decay-weight ladder shared with the oracle so both
    // engines evaluate the identical IEEE expression.
    "q_ewma" -> ((s, d) =>
      Sessionize.ewmaTrailing(Tables.events(s, d), "user_id", "ts", "value",
          tieCol = "event_id")
        .select("user_id", "event_id", "ewma")
        .orderBy("user_id", "event_id")),

    // time series: Bollinger bands — rolling mean ± 2sigma envelope with
    // %B, exact-decimal rolling moments, tie-free (ts, event_id) frames.
    "q_bollinger" -> ((s, d) =>
      Sessionize.bollinger(Tables.events(s, d), "user_id", "ts", "value",
          tieCol = "event_id")
        .orderBy("user_id", "event_id")),

    // time series: MACD momentum — fast/slow windowed EWMAs, signal line,
    // histogram and bull/bear crossover flags on the ewmaTrailing
    // convention (bounded frames, renormalized decay ladder).
    "q_macd" -> ((s, d) =>
      Sessionize.macd(Tables.events(s, d), "user_id", "ts", "value",
          tieCol = "event_id")
        .orderBy("user_id", "event_id")),

    // time series: Brown double-exponential smoothing
    // (Sessionize.holtForecast): level/trend split and the 7-step-ahead
    // linear forecast on the q_macd windowed-EWMA convention.
    "q_holt_forecast" -> ((s, d) =>
      Sessionize.holtForecast(Tables.events(s, d), "user_id", "ts", "value",
          tieCol = "event_id")
        .orderBy("user_id", "event_id")),

    // Linear-interpolation gap fill (Sessionize.interpolateLinear): the
    // hourly grid of q_gap_fill with interior points blended
    // time-proportionally between surrounding observations.
    "q_interpolate" -> ((s, d) =>
      Sessionize.interpolateLinear(Tables.events(s, d), "user_id", "ts", "value",
          tieCol = "event_id")
        .select(col("user_id"),
          date_format(col("bucket_ts"), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
          col("value"))
        .orderBy("user_id", "bucket")),

    // Two-pass exact percentile (Aggregates.percentileTwoPass): histogram
    // pass pins the order statistics to buckets, a narrow final pass ranks
    // only those buckets — exact quantile_cont without buffering the
    // column (the shape Spark's exact percentile can't take at 100 TB).
    "q_percentile_two_pass" -> ((s, d) =>
      graft.ops.Aggregates.percentileTwoPass(
        Tables.lineitem(s, d), "l_extendedprice", 0.9)),

    // Per-source exact heavy hitters (Aggregates.exactHeavyHittersByGroup):
    // grouped Misra-Gries candidates broadcast into one tagging join — the
    // count shuffle carries candidate keys only, never the vocabulary.
    "q_heavy_tokens_by_source" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).alias("token"))
      graft.ops.Aggregates.exactHeavyHittersByGroup(
          tok, "source", "token", k = 50, sketchK = 200)
        .withColumnRenamed("item", "token")
    }),

    // EXACT similarity self-join (ScaleDedup.jaccardJoinExact): prefix
    // filtering gives every pair with Jaccard >= 0.5, no misses — the
    // deterministic complement to the LSH candidate path. Deterministic
    // 1-in-10 doc slice bounds the (inherently dense: the fixture corpus
    // is heavily near-duplicate) answer and the oracle's all-pairs verify.
    "q_ssjoin_exact" -> ((s, d) =>
      graft.ops.ScaleDedup.jaccardJoinExact(
          Tables.documents(s, d).filter(col("doc_id") % 10 === 0),
          "doc_id", "text", threshold = 0.5)
        .orderBy("id1", "id2")),

    // PSI drift monitor (Aggregates.psiDrift): document-length
    // distribution shift between two deterministic corpus halves over a
    // fixed 10-bin grid — the per-release drift number a dataset card
    // tracks.
    "q_psi_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.Aggregates.psiDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        size(split(col("text"), " ")).cast("double"),
        binWidth = 20.0, nBins = 10)
    }),

    // Sorted-neighborhood entity resolution (ScaleDedup.sortedNeighborPairs):
    // candidates from a window-3 pass over the name sort order, verified
    // with levenshtein <= 3 — n·window candidates, never n².
    "q_sorted_neighbors" -> ((s, d) => {
      val p = Tables.part(s, d).select("p_partkey", "p_name")
      val pairs = graft.ops.ScaleDedup.sortedNeighborPairs(
        p, "p_partkey", lower(col("p_name")), window = 3)
      pairs
        .join(p.select(col("p_partkey").alias("id1"), col("p_name").alias("n1")), "id1")
        .join(p.select(col("p_partkey").alias("id2"), col("p_name").alias("n2")), "id2")
        .withColumn("dist", levenshtein(col("n1"), col("n2")))
        .filter(col("dist") <= 3)
        .select("id1", "id2", "dist")
        .orderBy("id1", "id2")
    }),

    // CDC extraction (Cdc.extractCdc): diff two deterministic snapshot
    // versions of orders into the minimal I/U/D feed — the inverse of
    // q_cdc_apply; unchanged keys never reach the output.
    "q_cdc_extract" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val oldSnap = base.filter(col("o_orderkey") % 3 =!= 0)
      val newSnap = base.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, round(col("o_totalprice") * 2, 2))
            .otherwise(col("o_totalprice")))
      graft.ops.Cdc.extractCdc(oldSnap, newSnap, "o_orderkey")
        .orderBy("o_orderkey")
    }),

    // Keyless band join (Joins.bandJoin): clicks paired with purchases
    // within 30 s across ALL users — the proximity join that would plan
    // as a nested loop without the bucket rewrite (plan-asserted in
    // OpsSpec). The oracle runs the plain theta join.
    "q_band_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").alias("click_id"),
          unix_micros(col("ts")).alias("__cm"))
      val buys = e.filter(col("event_type") === "purchase")
        .select(col("event_id").alias("purchase_id"),
          unix_micros(col("ts")).alias("__pm"))
      graft.ops.Joins.bandJoin(clicks, buys, "__cm", "__pm", 30000000L)
        .select(col("click_id"), col("purchase_id"),
          (col("__pm") - col("__cm")).alias("delta_us"))
        .orderBy("click_id", "purchase_id")
    }),

    // Incremental clustering (ScaleDedup.ccIncremental): cluster the first
    // 60% of the corpus, then fold the rest in via star edges + the edges
    // touching the new batch — the oracle is the FULL recompute, so the
    // driver compare verifies incremental == from-scratch row-for-row.
    // The prior clustering MUST come from the same edge universe
    // restricted to old vertices: capped-LSH candidate generation is
    // non-monotonic under corpus growth (a bucket under the cap in the
    // old subset can blow past it in the full corpus and be dropped), so
    // re-banding the old subset in isolation yields edges the full
    // recompute never sees — observed at sf0.1 as 902 subset-only pairs.
    // A production incremental pipeline gets this premise for free: its
    // maintained pair set (q_dedup_incremental's fingerprint table) IS
    // the single evolving universe.
    "q_dedup_clusters_incr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cut = lit(0.6) * Tables.documents(s, d).agg(max("doc_id")).head().getLong(0)
      val oldDocs = docs.filter(col("doc_id") <= cut)
      val newDocs = docs.filter(col("doc_id") > cut)
      val allPairs = ScaleDedup.minhashCandidatePairs(docs, "doc_id", "text",
        numHashes = 4, bands = 2)
      val prev = ScaleDedup.connectedComponents(
        oldDocs.select(col("doc_id").alias("id")),
        allPairs.filter(col("id1") <= cut && col("id2") <= cut))
      val touchingNew = allPairs.filter(col("id1") > cut || col("id2") > cut)
      ScaleDedup.ccIncremental(prev,
          newDocs.select(col("doc_id").alias("id")), touchingNew)
        .select(col("id").alias("doc_id"), col("label").alias("cluster"))
        .orderBy("doc_id")
    }),

    // Interval-overlap join (Joins.intervalOverlapJoin): click intervals
    // × view intervals of VARIABLE deterministic length (60–359 s from
    // event_id) — the theta join a fixed band can't express, rewritten to
    // one equi-shuffle with exactly-once pair emission (plan-asserted
    // nested-loop-free in OpsSpec). The oracle runs the plain theta join.
    "q_interval_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      def iv(t: String, id: String, st: String, en: String) =
        e.filter(col("event_type") === t)
          .select(col("event_id").alias(id),
            unix_micros(col("ts")).alias(st),
            (unix_micros(col("ts")) +
              (col("event_id") % 300 + 60) * 1000000L).alias(en))
      graft.ops.Joins.intervalOverlapJoin(
          iv("click", "click_id", "cs", "ce"),
          iv("view", "view_id", "vs", "ve"),
          "cs", "ce", "vs", "ve", 300000000L)
        .select(col("click_id"), col("view_id"),
          (least(col("ce"), col("ve")) - greatest(col("cs"), col("vs")))
            .alias("overlap_us"))
        .orderBy("click_id", "view_id")
    }),

    // Order-independent table checksum (Inspect.tableChecksum): per
    // returnflag, (n_rows, commutative md5-sum digest) over
    // engine-stable canonical columns — the replication-validation
    // primitive; the oracle recomputes the digest independently.
    "q_table_checksum" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_linestatus"),
          col("l_shipdate").cast("date").cast("string").alias("ship_d"))
      graft.ops.Inspect.tableChecksum(li,
          Seq("l_orderkey", "l_linenumber", "l_linestatus", "ship_d"),
          Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_rows"),
          col("checksum").cast("string").alias("checksum"))
        .orderBy("l_returnflag")
    }),

    // Skew diagnosis report (Inspect.skewReport): the 20 heaviest order
    // keys in lineitem with share and ratio-to-mean-key-load — the audit
    // that decides whether a join key needs salting.
    "q_skew_report" -> ((s, d) =>
      graft.ops.Inspect.skewReport(Tables.lineitem(s, d), "l_orderkey", 20)),

    // KMV sketch cube (Aggregates.kmvRollup): daily bottom-64 sketches of
    // order custkeys re-merged to MONTH grain without rescanning the base
    // table (bottom-k of union-of-bottom-ks = bottom-k of union); exact
    // distinct rides along as the error audit. The oracle computes each
    // month's bottom-64 directly — equality IS the merge property.
    "q_sketch_cube" -> ((s, d) => {
      val k = 64
      val o = Tables.orders(s, d)
        .select(date_format(col("o_orderdate"), "yyyy-MM-dd").alias("day"),
          date_format(col("o_orderdate"), "yyyy-MM").alias("month"),
          graft.ops.ScaleDedup.hash32(col("o_custkey").cast("string"), 0).alias("h"))
      val daily = o.groupBy("day", "month")
        .agg(graft.functions.BottomKSketch.bottom_k_sketch(col("h"), k).alias("sk"))
      val monthly = graft.ops.Aggregates.kmvRollup(daily, Seq("month"), "sk", k)
      val exact = o.groupBy("month").agg(countDistinct(col("h")).alias("exact_nd"))
      monthly
        .select(col("month"),
          graft.ops.Aggregates.kmvEstimate(col("sk"), k).alias("est_nd"))
        .join(exact, "month")
        .orderBy("month")
    }),

    // PMI collocations (TextAnalysis.collocations): top-50 adjacent token
    // pairs by pointwise mutual information (min pair count 5) over the
    // documents corpus — multi-word-expression mining for vocabulary
    // curation.
    "q_collocations" -> ((s, d) =>
      graft.ops.TextAnalysis.collocations(Tables.documents(s, d), "text",
        minCount = 5L, topN = 50)),

    // TextRank keywords (TextAnalysis.textrankKeywords): PageRank over
    // the adjacent-token co-occurrence graph, top 30 tokens — the
    // graph-centrality complement to q_tfidf_top's frequency ranking.
    "q_textrank_keywords" -> ((s, d) =>
      graft.ops.TextAnalysis.textrankKeywords(Tables.documents(s, d),
        "text", iters = 3, topN = 30)),

    // Pairwise source vocabulary Jaccard (TextAnalysis.sourceOverlap):
    // the sources×sources shared-template radar.
    "q_source_overlap" -> ((s, d) =>
      graft.ops.TextAnalysis.sourceOverlap(Tables.documents(s, d),
        "source", "text")),

    // Temperature-scaled α-sampling audit (Mix.alphaSample): q_i ∝ n_i^0.5
    // at half budget — big sources downsampled toward the flattened mix,
    // md5-deterministic keep set, per-source (total, rate, kept) readout.
    "q_alpha_sample" -> ((s, d) =>
      graft.ops.Mix.alphaSample(Tables.documents(s, d), "source",
        "doc_id", alpha = 0.5, budget = 0.5)),

    // Count-min sketch (ops/CountMin): depth-3 × width-64 counts table
    // over the lineitem supplier stream, probed for the 20 heaviest
    // items beside their exact counts — the bounded-memory point-
    // frequency sketch (one-sided: est >= exact, visible in the
    // overcount column because width < distinct items here). The oracle
    // rebuilds the identical sketch from the shared md5 hash family.
    "q_cms_freq" -> ((s, d) => {
      val items = Tables.lineitem(s, d)
        .select(col("l_suppkey").cast("string").alias("item"))
      val sketch = graft.ops.CountMin.cmsBuild(items, "item", depth = 3, width = 64)
      val exact = items.groupBy("item").agg(count(lit(1)).alias("exact_cnt"))
      val probes = exact.orderBy(col("exact_cnt").desc, col("item").asc).limit(20)
      graft.ops.CountMin.cmsEstimate(sketch, probes.select("item"), "item",
          depth = 3, width = 64)
        .join(probes, "item")
        .select(col("item"), col("exact_cnt"), col("cms_est"),
          (col("cms_est") - col("exact_cnt")).alias("overcount"))
        .orderBy("item")
    }),

    // Corpus vocabulary drift (TextAnalysis.klDrift): smoothed
    // KL(even-docs ‖ odd-docs) over unigram distributions — the text
    // twin of q_psi_drift's numeric monitor.
    "q_kl_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.TextAnalysis.klDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "text")
    }),

    // First/last-touch attribution (Sessionize.attribution): every
    // purchase attributed to the first and most recent strictly-
    // preceding non-purchase event type in the user's history; one
    // window, no self-join.
    "q_attribution" -> ((s, d) =>
      graft.ops.Sessionize.attribution(Tables.events(s, d), "user_id",
          "ts", "event_id", "event_type", conversionType = "purchase")
        .select(col("user_id"), col("event_id"),
          col("first_touch"), col("last_touch"))
        .orderBy("user_id", "event_id")),

    // Position-based 40/20/40 attribution (Attribution
    // .positionAttribution): per-conversion path credit split
    // first/middles/last, paths segmented by the preceding-conversion
    // count — each touch credits exactly one conversion.
    "q_position_attribution" -> ((s, d) =>
      graft.ops.Attribution.positionAttribution(Tables.events(s, d),
        "user_id", "ts", "event_id", "event_type",
        conversionType = "purchase")),

    // Segmented trend-break regression (Stats.segmentedTrend): daily
    // order volume with a hinge at 1998-01-01 — slope before, slope
    // change at the break, and the recomposed after-slope.
    "q_segmented_trend" -> ((s, d) =>
      graft.ops.Stats.segmentedTrend(Tables.orders(s, d),
        to_date(col("o_orderdate")), "1998-01-01")),

    // Split-conformal coverage (Stats.conformalCoverage): per-type mean
    // model on the 60% train hash slice, 90%-residual-quantile band from
    // the 20% calibration slice, achieved coverage on the 20% test slice.
    "q_conformal" -> ((s, d) =>
      graft.ops.Stats.conformalCoverage(Tables.events(s, d), "event_type",
        "value", col("user_id") % 10 <= 5,
        col("user_id") % 10 === 6 || col("user_id") % 10 === 7,
        col("user_id") % 10 >= 8, alpha = 0.1)),

    // Dickey-Fuller stationarity stat (Stats.adfStat): Δy on lagged y
    // over the daily order-volume series.
    "q_adf_stat" -> ((s, d) =>
      graft.ops.Stats.adfStat(Tables.orders(s, d),
        to_date(col("o_orderdate")))),

    // Wilcoxon signed-rank (Stats.wilcoxonSignedRank): 1996 vs 1997
    // daily revenue paired by (month, day) — the paired nonparametric
    // year-over-year shift test.
    "q_wilcoxon" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .select(to_date(col("o_orderdate")).alias("dt"), col("o_totalprice"))
        .groupBy(year(col("dt")).alias("y"), month(col("dt")).alias("m"),
          dayofmonth(col("dt")).alias("dd"))
        .agg(sum(col("o_totalprice").cast("decimal(28,6)")).cast("double")
          .alias("rev"))
      val a = daily.filter(col("y") === 1996)
        .select(col("m"), col("dd"), col("rev").alias("rev_a"))
      val b = daily.filter(col("y") === 1997)
        .select(col("m"), col("dd"), col("rev").alias("rev_b"))
      graft.ops.Stats.wilcoxonSignedRank(a.join(b, Seq("m", "dd")),
        "rev_a", "rev_b")
    }),

    // Two-proportion z-test (Aggregates.twoProportionZ): did odd users
    // (treatment) reach a purchase at a different rate than even users
    // (control)? Per-user conversion flags from one groupBy, then the
    // one-row pooled-variance readout.
    "q_ab_test" -> ((s, d) => {
      val perUser = Tables.events(s, d).groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
          .alias("conv"))
      graft.ops.Aggregates.twoProportionZ(perUser,
        col("user_id") % 2 === 1, col("conv") === 1)
    }),

    // Multiple testing: per-hour purchase-share z sweep (24 hypotheses)
    // → Benjamini-Hochberg step-up adjustment. The surrogate
    // p = exp(−z²/2) is the Gaussian tail bound — monotone in |z|, so
    // the BH ordering/adjustment under test is exercised faithfully
    // while both engines evaluate the identical closed form (no erf).
    "q_bh_fdr" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val hyp = ev.groupBy(hour(col("ts")).cast("long").alias("hour"))
        .agg(count(lit(1)).alias("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .alias("x"))
      val pool = ev.agg(
        (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double")).alias("p0"))
      val z = (col("x").cast("double") / col("n").cast("double") -
        col("p0")) /
        sqrt(col("p0") * (lit(1.0) - col("p0")) / col("n").cast("double"))
      val h = hyp.crossJoin(broadcast(pool))
        .select(col("hour"), col("n"), col("x"), round(z, 6).alias("z"))
        .select(col("hour"), col("n"), col("x"), col("z"),
          round(exp(lit(-0.5) * col("z") * col("z")), 6).alias("p"))
      graft.ops.Stats.bhAdjust(h, "hour", "p").orderBy("rank")
    }),

    // Sample autocorrelation of the daily order-count series, lags 1–7
    // (weekly structure shows as a lag-7 spike). The table reduces to a
    // calendar-bounded series before the one ordered window.
    "q_acf" -> ((s, d) =>
      graft.ops.Stats.autocorrelation(Tables.orders(s, d),
        to_date(col("o_orderdate")), maxLag = 7)),

    // Partial autocorrelation lags 1-3 (Stats.pacf): Durbin-Levinson on
    // the pinned ACF values — the AR-order readout.
    "q_pacf" -> ((s, d) =>
      graft.ops.Stats.pacf(Tables.orders(s, d), to_date(col("o_orderdate")))),

    // Ljung-Box portmanteau Q over q_acf's first 7 autocorrelations
    // (Stats.ljungBox): the one-number white-noise check.
    "q_ljung_box" -> ((s, d) =>
      graft.ops.Stats.ljungBox(Tables.orders(s, d),
        to_date(col("o_orderdate")), maxLag = 7)),

    // Daily session-quality report (Sessionize.sessionReport): sessions,
    // bounce rate, events/session, mean duration over the same 30-min
    // gap sessionization as q_sessionize_batch.
    "q_session_report" -> ((s, d) =>
      graft.ops.Sessionize.sessionReport(Tables.events(s, d), "user_id",
        "ts", "event_id", 30)),

    // Wald-Wolfowitz runs test (Stats.runsTest): randomness of the daily
    // order-count series from the sign pattern of day-over-day deltas.
    "q_runs_test" -> ((s, d) =>
      graft.ops.Stats.runsTest(Tables.orders(s, d),
        to_date(col("o_orderdate")))),

    // Brown-Forsythe homogeneity of variance (Stats.brownForsythe):
    // Levene's W on |value - group median| across event types — the
    // equal-spread gatekeeper in front of q_anova.
    "q_brown_forsythe" -> ((s, d) =>
      graft.ops.Stats.brownForsythe(Tables.events(s, d), "event_type",
        "value")),

    // McNemar paired-binary test (Stats.mcnemarTest): per user, clicked
    // vs purchased — the discordant-cell readout marginal rates hide.
    "q_mcnemar" -> ((s, d) =>
      graft.ops.Stats.mcnemarTest(Tables.events(s, d), "user_id",
        col("event_type") === "click", col("event_type") === "purchase")),

    // Hellinger distance between the even/odd document slices' unigram
    // distributions (TextAnalysis.hellingerDrift): the bounded symmetric
    // metric twin of q_kl_drift, on the same slice split.
    "q_hellinger" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.TextAnalysis.hellingerDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "text")
    }),

    // Embedding dispersion per label (Similarity.dispersionReport): the
    // exact mean pairwise cosine via the resultant-vector identity —
    // O(n·d) where the naive readout is O(n²·d).
    "q_embedding_dispersion" -> ((s, d) =>
      graft.ops.Similarity.dispersionReport(Tables.embeddings(s, d),
        "embedding", "label")),

    // Theil's uncertainty coefficient (Stats.theilsU): the asymmetric
    // entropy-based association between return flag and line status —
    // the directional complement of q_cramers_v on the same columns.
    "q_theils_u" -> ((s, d) =>
      graft.ops.Stats.theilsU(Tables.lineitem(s, d),
        "l_returnflag", "l_linestatus")),

    // Cohen's kappa (Stats.cohensKappa) between two rule raters of
    // document length: char-length > 800 vs letter-word-count > 150 —
    // chance-corrected agreement of correlated heuristics.
    "q_cohens_kappa" -> ((s, d) => {
      val t = col("text")
      graft.ops.Stats.cohensKappa(Tables.documents(s, d),
        when(length(t) > 800, "long").otherwise("short"),
        when(regexp_count(t, lit("[A-Za-z]+")) > 150, "long")
          .otherwise("short"))
    }),

    // Gumbel block-maxima fit (Stats.gumbelFit): monthly maxima of the
    // daily order count, method-of-moments location/scale and the
    // 10-block return level — the provisioning-peak readout.
    "q_gumbel_fit" -> ((s, d) =>
      graft.ops.Stats.gumbelFit(Tables.orders(s, d),
        to_date(col("o_orderdate")))),

    // Local clustering coefficient (Graph.clusteringCoefficient) of the
    // near-dup candidate graph: dense template cores vs hub-and-spoke
    // LSH accidents at equal degree.
    "q_clustering_coeff" -> ((s, d) => {
      val edges = ScaleDedup.minhashCandidatePairs(Tables.documents(s, d),
          "doc_id", "text", numHashes = 4, bands = 2)
        .select(col("id1").alias("src"), col("id2").alias("dst"))
      Graph.clusteringCoefficient(edges).orderBy("node")
    }),

    // Exact-margin permutation test (Stats.permutationTest): 100
    // md5-dealt re-labelings of the odd/even-user split — the
    // distribution-free p-value beside q_ab_test's normal z. Cost is
    // linear in reps (the documented x-reps multiplier); 100 keeps the
    // engine's heaviest deliberate op inside the sweep budget.
    "q_permutation_test" -> ((s, d) =>
      graft.ops.Stats.permutationTest(Tables.events(s, d), "event_id",
        col("user_id") % 2 === 1, "value", reps = 100)),

    // Method agreement (Stats.methodAgreement): Lin's CCC + Bland-Altman
    // limits between daily order count and daily shipped-line count —
    // the two-channels-same-metric migration readout.
    "q_method_agreement" -> ((s, d) => {
      val a = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).alias("d"))
        .agg(count(lit(1)).alias("x"))
      val b = Tables.lineitem(s, d)
        .groupBy(to_date(col("l_shipdate")).alias("d"))
        .agg(count(lit(1)).alias("y"))
      graft.ops.Stats.methodAgreement(a.join(b, "d"), col("x"), col("y"))
    }),

    // Log-rank test (Stats.logRankTest): odd vs even users'
    // time-to-purchase curves compared at every event time — the
    // two-curve companion to q_survival_km, same censoring.
    "q_logrank" -> ((s, d) => {
      val subj = Tables.events(s, d).groupBy("user_id").agg(
        min(col("ts")).alias("__first"),
        min(when(col("event_type") === "purchase", col("ts"))).alias("__conv"),
        max(col("ts")).alias("__last"))
        .select(col("user_id"),
          datediff(to_date(coalesce(col("__conv"), col("__last"))),
            to_date(col("__first"))).cast("long").alias("dur"),
          col("__conv").isNotNull.alias("observed"))
      graft.ops.Stats.logRankTest(subj, "dur", "observed",
        col("user_id") % 2 === 1)
    }),

    // Dunning keyness (TextAnalysis.keyness): which tokens carry the
    // even/odd slice difference — the per-token drill-down under the
    // KL/Hellinger aggregate monitors.
    "q_keyness" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.TextAnalysis.keyness(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "text")
    }),

    // Ratio-metric delta CI (Stats.ratioMetricCI): revenue per event
    // with per-user correlated numerator/denominator — the inference a
    // naive mean-of-ratios gets wrong.
    "q_ratio_ci" -> ((s, d) =>
      graft.ops.Stats.ratioMetricCI(Tables.events(s, d), col("user_id"),
        coalesce(col("value"), lit(0.0)), lit(1))),

    // Empirical-Bayes rate shrinkage (Stats.ebShrinkage): per-user
    // purchase rates under a moment-fitted beta prior — the "3/3 beats
    // 950/1000" fix by learned prior rather than Wilson pessimism.
    "q_eb_shrinkage" -> ((s, d) =>
      graft.ops.Stats.ebShrinkage(Tables.events(s, d), col("user_id"),
        col("event_type") === "purchase")),

    // Hurst exponent (Stats.hurstExponent): R/S long-memory of daily
    // order volume over block sizes 8..64 — persistent vs mean-reverting.
    "q_hurst" -> ((s, d) =>
      graft.ops.Stats.hurstExponent(Tables.orders(s, d),
        to_date(col("o_orderdate")))),

    // Mantel-Haenszel pooled OR (Stats.mantelHaenszel): purchase odds by
    // user parity pooled across hour strata, beside the crude OR — the
    // Simpson-reversal detector for binary outcomes.
    "q_mantel_haenszel" -> ((s, d) =>
      graft.ops.Stats.mantelHaenszel(Tables.events(s, d),
        col("user_id") % 2 === 1, col("event_type") === "purchase",
        hour(col("ts")))),

    // Theil T decomposition (Stats.theilIndex): per-customer revenue
    // inequality split into between-nation and within-nation components
    // — the decomposable concentration readout beside q_gini.
    "q_theil_index" -> ((s, d) => {
      val perCust = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_nationkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .alias("rev"))
      graft.ops.Stats.theilIndex(perCust, col("c_nationkey"), col("rev"))
    }),

    // Capture-recapture (TextAnalysis.captureRecapture): Chapman
    // estimate of the true document population from two overlapping
    // crawl slices matched on content fingerprint.
    "q_capture_recapture" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.TextAnalysis.captureRecapture(
        docs.filter(col("doc_id") % 3 < 2),
        docs.filter(col("doc_id") % 3 > 0), "text")
    }),

    // Vocabulary richness (TextAnalysis.vocabRichness): Chao1 true-size
    // estimate + Good-Turing unseen mass off the count-of-counts table.
    "q_vocab_richness" -> ((s, d) =>
      graft.ops.TextAnalysis.vocabRichness(Tables.documents(s, d), "text")),

    // Distribution overlap (Stats.overlapCoefficient): do odd and even
    // users' value distributions share support — the positivity
    // diagnostic in front of the causal estimators.
    "q_overlap_coefficient" -> ((s, d) =>
      graft.ops.Stats.overlapCoefficient(Tables.events(s, d),
        col("user_id") % 2 === 1, "value")),

    // STL strength (Stats.stlStrength): Hyndman's F_trend/F_seasonal
    // over the decomposition — does the weekly shape mean anything?
    "q_stl_strength" -> ((s, d) =>
      graft.ops.Stats.stlStrength(Tables.orders(s, d),
        to_date(col("o_orderdate")))),

    // Heaps'-law fit (TextAnalysis.heapsLaw): vocabulary growth V = K*N^b
    // over 10 id-order prefixes via the first-seen table — the zipf
    // curve's growth companion.
    // Bound to word BIGRAMS, not unigrams: the sf0.01 fixture's unigram
    // vocabulary saturates at the first checkpoint (vt constant → β = ±0,
    // verifying only the rounding path); the bigram type inventory keeps
    // growing at the gate SF, so the OLS fits a real Heaps curve (β > 0).
    "q_heaps_law" -> ((s, d) => {
      val t = split(col("text"), " ")
      val big = Tables.documents(s, d).filter(size(t) >= 2)
        .select(col("doc_id"),
          array_join(graft.ops.ScaleDedup.wordBigrams(t, "_"), " ")
            .alias("text"))
      graft.ops.TextAnalysis.heapsLaw(big, "doc_id", "text")
    }),

    // Markov entropy rate (Sessionize.markovEntropyRate): how
    // predictable is the next event given the current one — the
    // signal-vs-noise gate over q_event_transitions.
    "q_markov_entropy" -> ((s, d) =>
      graft.ops.Sessionize.markovEntropyRate(Tables.events(s, d),
        "user_id", "ts", "event_id", "event_type")),

    // Quality-first token-budget selection (Pack.tokenBudgetSelect):
    // Flesch bands consumed best-first against a 100k-token budget; the
    // straddling band keeps a fraction — the mix-selection artifact.
    "q_token_budget" -> ((s, d) => {
      val t = col("text")
      val words = regexp_count(t, lit("[A-Za-z]+"))
      val sents = greatest(regexp_count(t, lit("[.!?]+")), lit(1))
      val syll = regexp_count(lower(t), lit("[aeiouy]+"))
      val flesch = round(lit(206.835) -
        lit(1.015) * words.cast("double") / sents.cast("double") -
        lit(84.6) * syll.cast("double") / words.cast("double"), 6)
      val band = least(greatest(floor(flesch / 10.0), lit(-5L)), lit(12L))
      val ntok = size(filter(split(t, " "), x => x =!= "")).cast("long")
      graft.ops.Pack.tokenBudgetSelect(
        Tables.documents(s, d).filter(t.isNotNull && words > 0),
        band, ntok, budget = 100000L)
    }),

    // Histogram-bin advisor (Stats.binAdvisor): Freedman-Diaconis width
    // and count beside Sturges over the extended-price column.
    "q_bin_advisor" -> ((s, d) =>
      graft.ops.Stats.binAdvisor(Tables.lineitem(s, d), "l_extendedprice")),

    // Cluster quality (Similarity.clusterQualityReport): simplified
    // silhouette, dispersion, and Davies-Bouldin component per k-means
    // cell — the partition-quality gate in front of the IVF build.
    "q_cluster_quality" -> ((s, d) =>
      graft.ops.Similarity.clusterQualityReport(Tables.embeddings(s, d),
        "vec_id", "embedding", nCells = 8, iters = 3, dim = 64)),

    // Clustering agreement (Stats.clusteringAgreement): NMI + adjusted
    // Rand between the CC dedup clusters and the LPA communities over
    // the SAME candidate graph — is LPA a refinement or a re-carve?
    "q_cluster_agreement" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = ScaleDedup.minhashCandidatePairs(docs, "doc_id", "text",
        numHashes = 4, bands = 2)
      val cc = ScaleDedup.connectedComponents(
          docs.select(col("doc_id").alias("id")), pairs)
      val lpa = Graph.labelPropagation(
        pairs.select(col("id1").alias("src"), col("id2").alias("dst")),
        rounds = 4)
      val lpaAll = docs.select(col("doc_id").alias("id"))
        .join(lpa.select(col("node").alias("id"), col("community")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("community"), col("id")).alias("label"))
      graft.ops.Stats.clusteringAgreement(cc, lpaAll)
    }),

    // word2vec negative sampling (Mix.negativeSamples): deterministic
    // unigram^0.75 draws via the bucketed inverse-CDF equi-join — never
    // a draws x vocab range nested-loop.
    "q_neg_sampling" -> ((s, d) =>
      graft.ops.Mix.negativeSamples(Tables.documents(s, d), "doc_id",
        "text")),

    // Wald IV estimator (Stats.ivWald): ITT / first stage on a synthetic
    // odd-user instrument — the unobserved-confounder leg of the causal
    // family.
    "q_iv_wald" -> ((s, d) =>
      graft.ops.Stats.ivWald(Tables.events(s, d),
        col("user_id") % 2 === 1,
        col("user_id") % 2 === 1 && col("value") > 50, col("value"))),

    // Best-split changepoint (Stats.bestSplit): the single day that
    // maximizes between-segment variance of daily order volume — binary
    // segmentation's first step beside the fixed-hinge q_segmented_trend.
    "q_best_split" -> ((s, d) =>
      graft.ops.Stats.bestSplit(Tables.orders(s, d),
        to_date(col("o_orderdate")))),

    // GloVe-style windowed co-occurrence (TextAnalysis.cooccurrence):
    // 1/d-weighted token pairs within a 4-token window — the matrix an
    // embedding trainer consumes; row-local fan-out, no self-join.
    "q_cooccurrence" -> ((s, d) =>
      graft.ops.TextAnalysis.cooccurrence(Tables.documents(s, d), "text")),

    // Int8 quantization distortion (Similarity.quantizationReport):
    // absmax per-dim scales, quantize-dequantize, cosine + abs-error
    // readout per label — the 4x-compression go/no-go.
    "q_embedding_quantize" -> ((s, d) =>
      graft.ops.Similarity.quantizationReport(Tables.embeddings(s, d),
        "embedding", "label")),

    // Tokenizer fertility (TextAnalysis.bpeFertility): BPE tokens per
    // whitespace word per source over the frozen merges artifact — the
    // vocabulary-fit readout before a training run.
    "q_bpe_fertility" -> ((s, d) =>
      graft.ops.TextAnalysis.bpeFertility(Tables.documents(s, d),
        "text", "source")),

    // Dedup savings (TextAnalysis.dedupSavings): what exact keep-first
    // dedup buys per source in docs AND tokens — the number that
    // justifies the dedup stage in a token budget.
    "q_dedup_savings" -> ((s, d) =>
      graft.ops.TextAnalysis.dedupSavings(Tables.documents(s, d),
        "doc_id", "text", "source")),

    // Minimum detectable effect (Stats.mdeReport): what lift could the
    // odd/even-user split even see at alpha .05 / power .80 — the
    // experiment-design readout beside q_ab_test.
    "q_mde" -> ((s, d) =>
      graft.ops.Stats.mdeReport(Tables.events(s, d),
        col("user_id") % 2 === 1, "value")),

    // Rich-club ladder (Graph.richClub): do the near-dup graph's hubs
    // wire to each other — the hub-club readout assortativity blurs.
    "q_rich_club" -> ((s, d) => {
      val edges = ScaleDedup.minhashCandidatePairs(Tables.documents(s, d),
          "doc_id", "text", numHashes = 4, bands = 2)
        .select(col("id1").alias("src"), col("id2").alias("dst"))
      Graph.richClub(edges, maxK = 10)
    }),

    // Kruskal-Wallis H (Stats.kruskalWallis): do the five event types'
    // value distributions differ? — the k-group rank ANOVA beside
    // q_anova, on the mann-whitney rank machinery.
    "q_kruskal_wallis" -> ((s, d) =>
      graft.ops.Stats.kruskalWallis(Tables.events(s, d),
        col("event_type"), "value")),

    // Friedman repeated-measures test: 40 order-key blocks x return-flag
    // treatments over per-cell mean extended price, with Kendall's W.
    "q_friedman" -> ((s, d) =>
      graft.ops.Stats.friedmanTest(Tables.lineitem(s, d),
        col("l_orderkey") % 40, col("l_returnflag"), "l_extendedprice")),

    // Grubbs single-outlier statistic per market segment on acctbal.
    "q_grubbs" -> ((s, d) =>
      graft.ops.Stats.grubbsTest(Tables.customer(s, d),
        col("c_mktsegment"), "c_acctbal").orderBy("grp")),

    // Stratified ATE (Stats.stratifiedATE): odd vs even users' value
    // gap, hour-of-day strata — the naive-vs-adjusted causal contrast.
    "q_stratified_ate" -> ((s, d) =>
      graft.ops.Stats.stratifiedATE(Tables.events(s, d),
        col("user_id") % 2 === 1, col("value"), hour(col("ts")))),

    // Sequential probability ratio test (Stats.sprt): per-arm purchase
    // Bernoulli stream in (ts, event_id) order, Wald boundaries, first
    // crossing + end-of-stream state — the always-valid A/B readout.
    "q_sprt" -> ((s, d) =>
      graft.ops.Stats.sprt(Tables.events(s, d), col("user_id") % 2,
        "ts", "event_id", col("event_type") === "purchase",
        p0 = 0.15, p1 = 0.22)),

    // Propensity-score matching ATT (Stats.psmAtt): per-user activity
    // features, shared Newton propensity fit, caliper-bucketed 1-NN
    // match, ATT beside the naive conversion gap.
    "q_psm_att" -> ((s, d) => {
      val perUser = Tables.events(s, d).groupBy("user_id")
        .agg(sum(col("value").cast("decimal(18,6)")).cast("double")
            .alias("tv"),
          count(lit(1)).alias("ne"),
          max(when(col("event_type") === "purchase", 1.0).otherwise(0.0))
            .alias("conv"))
      graft.ops.Stats.psmAtt(perUser, col("user_id"),
        col("user_id") % 10 < 3, col("conv"),
        graft.functions.PortableMath.pin9(
          graft.functions.PortableMath.pln(lit(1.0) + col("tv"))),
        graft.functions.PortableMath.pin9(
          graft.functions.PortableMath.pln(lit(1.0) + col("ne").cast("double"))))
    }),

    // Kernel-at-fit-arguments probe for the PSM features (round-13
    // VERDICT next-round #5): q_psm_att's x1 = pin9(pln(1+Σvalue)) is
    // the ONE remaining covariate with a non-enumerable domain (the sum
    // is non-integer), still kernel-computed on both engines — so digest
    // the RAW pln outputs at those exact arguments, bit-chunked and
    // BIGINT-summed per user-mod-20 group. A driver red here names the
    // diverging feature class before any fit machinery runs.
    "q_psm_diag_kln" -> ((s, d) => {
      val P = graft.functions.PortableMath
      val perUser = Tables.events(s, d).groupBy("user_id")
        .agg(sum(col("value").cast("decimal(18,6)")).cast("double")
            .alias("tv"),
          count(lit(1)).alias("ne"))
        .filter(col("tv").isNotNull)
        .select(col("user_id"),
          P.pln(lit(1.0) + col("tv")).alias("__plv"),
          P.pln(lit(1.0) + col("ne").cast("double")).alias("__plw"))
      val chunked = bitChunks(bitChunks(perUser, "__plv", "a_"),
        "__plw", "b_")
      val sums = Seq("a_", "b_").flatMap(p =>
        Seq("hi", "c1", "c2", "c3").map(c =>
          sum(org.apache.spark.sql.functions.col(s"$p$c").cast("long"))
            .alias(s"$p$c")))
      chunked.groupBy((col("user_id") % 20).alias("grp"))
        .agg(count(lit(1)).alias("n"), sums: _*)
        .orderBy("grp")
    }),

    // Mann-Kendall trend test (Stats.mannKendall): monotone-trend
    // hypothesis readout over the daily order series — the significance
    // companion to q_theil_sen's slope.
    "q_mann_kendall" -> ((s, d) =>
      graft.ops.Stats.mannKendall(Tables.orders(s, d),
        to_date(col("o_orderdate")))),

    // Jarque-Bera normality statistic per market segment on acctbal
    // (Stats.jarqueBera): skewness/kurtosis/JB from one DECIMAL
    // power-sum pass — the is-it-even-Gaussian pre-flight.
    "q_jarque_bera" -> ((s, d) =>
      graft.ops.Stats.jarqueBera(Tables.customer(s, d),
        col("c_mktsegment"), "c_acctbal").orderBy("grp")),

    // Cochran's Q (Stats.cochranQ): user-bucket blocks x event-type
    // treatments, success = saw a value>50 event of that type — the
    // k-treatment binary repeated-measures test beside q_friedman.
    "q_cochran_q" -> ((s, d) =>
      graft.ops.Stats.cochranQ(Tables.events(s, d),
        col("user_id") % 60, col("event_type"), col("value") > 50)),

    // TOST equivalence (Stats.tost): odd vs even users' event value,
    // +/-5.0 margin — evidence of NO effect, with Cohen's d beside.
    "q_tost" -> ((s, d) =>
      graft.ops.Stats.tost(Tables.events(s, d),
        col("user_id") % 2 === 1, "value", margin = 5.0)),

    // Per-segment two-proportion tests with REAL normal-tail p-values
    // (Stats.proportionPValues via the A&S phiCdf) pushed through the
    // existing BH step-up (Stats.bhAdjust) at alpha = 0.1 — the
    // full-fidelity sibling of q_bh_fdr's surrogate-p sweep.
    "q_prop_ztest_fdr" -> ((s, d) =>
      graft.ops.Stats.bhAdjust(
        graft.ops.Stats.proportionPValues(Tables.customer(s, d),
          col("c_mktsegment"), col("c_nationkey") % 2 === 1,
          col("c_acctbal") > 5000).filter(col("p").isNotNull),
        "grp", "p", alpha = 0.1).orderBy("grp")),

    // Page-Hinkley drift alarm (Stats.pageHinkley): running-mean
    // deviation monitor over the daily order series, lambda = 25.
    "q_page_hinkley" -> ((s, d) =>
      graft.ops.Stats.pageHinkley(Tables.orders(s, d),
        to_date(col("o_orderdate")), lambda = 25.0)),

    // Cronbach's alpha (Stats.cronbachAlpha): do per-user view/click/
    // purchase counts cohere as one engagement scale? One moment pass
    // over the per-user item table.
    "q_cronbach_alpha" -> ((s, d) => {
      val per = Tables.events(s, d).groupBy("user_id").agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .alias("views"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .alias("clicks"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .alias("purchases"))
      graft.ops.Stats.cronbachAlpha(per, Seq(
        "views" -> col("views"), "clicks" -> col("clicks"),
        "purchases" -> col("purchases")))
    }),

    // Tukey HSD (Stats.tukeyHsd): which order priorities differ in
    // mean total price, pairwise, after the omnibus ANOVA — k-row
    // summary self-join, q = 3.86 (k=5, df=inf, alpha=.05).
    "q_tukey_hsd" -> ((s, d) =>
      graft.ops.Stats.tukeyHsd(Tables.orders(s, d),
        col("o_orderpriority"), "o_totalprice", qCrit = 3.86)),

    // Holdout forecast scorecard (Stats.holdoutForecast): last-28-day
    // holdout of the daily order series, naive-last vs seasonal-naive
    // with MAE/RMSE/sMAPE/MASE — the evaluation protocol beside the
    // in-sample q_forecast_baseline.
    "q_holdout_forecast" -> ((s, d) =>
      graft.ops.Stats.holdoutForecast(Tables.orders(s, d),
        to_date(col("o_orderdate")), horizon = 28, season = 7)),

    // Cox proportional hazards (Stats.coxPh): does per-user activity
    // scale the time-to-purchase hazard? Same subjects construction as
    // q_survival_km plus the ln(events) covariate; 3 Newton steps on
    // the Breslow partial likelihood, risk sets from duration-grain
    // suffix sums. Round 17 (VERDICT r16 #4): the registry row emits
    // the practitioner readout (n/β/se/z/HR); the partial_loglik
    // scalar rides its own q_cox_loglik row so the operator row is no
    // longer hostage to one forensic scalar. ROOT CAUSE of the
    // rounds-10..16 red found this round (see Stats.coxPh scaladoc):
    // the oracle's n_events (and kln/kargs' ne) was an uncast
    // SUM-of-integers — DuckDB HUGEINT on the wire, the r15-PROVEN
    // wide-integer driver dump class. BIGINT casts applied; no value
    // ever diverged.
    "q_cox_ph" -> ((s, d) =>
      graft.ops.Stats.coxPh(coxSubjects(s, d), "dur", "observed",
        "activity", iters = 3)
        .select("n", "n_events", "beta", "se", "z", "hazard_ratio")),
    "q_cox_loglik" -> ((s, d) =>
      graft.ops.Stats.coxPh(coxSubjects(s, d), "dur", "observed",
        "activity", iters = 3)
        .select("n_events", "partial_loglik")),

    // Cox forensic ladder, COLLAPSED in round 17 (VERDICT r16 #5): the
    // x/xint/xcov/xrows/grid/g1/b/kexp probes each proved their fact
    // (driver-green in CORRECTNESS_r15/r16) and retired to StatsSpec
    // coverage — git history and tools/driver_red_ack.txt carry the
    // full hunt. What remains registered: the kernel-at-live-argument
    // sentinel (kln), the argument transport (kargs) and its round-17
    // decisive splits (VERDICT r16 #1–#3).
    "q_cox_diag_kln" -> ((s, d) =>
      graft.ops.Stats.coxDiagKernelLn(coxSubjects(s, d), "dur",
        "observed", "activity", iters = 3)),

    // kln's ARGUMENT-ONLY twin (round 16 — VERDICT r15 #1): the same
    // (t, ne, s0h, s0l) rows with the pln chunks removed, pure integer
    // transport. Round 17: its r16 red is now explained (the uncast
    // HUGEINT ne — see q_cox_ph above); the oracle casts, and the
    // splits below confirm the no-value-divergence claim per column
    // class and per row range.
    "q_cox_diag_kargs" -> ((s, d) =>
      graft.ops.Stats.coxDiagKArgs(coxSubjects(s, d), "dur",
        "observed", "activity", iters = 3)),
    // column split (VERDICT r16 #1): duration/event half vs risk-sum half
    "q_cox_diag_kargs_tn" -> ((s, d) =>
      graft.ops.Stats.coxDiagKArgsTn(coxSubjects(s, d), "dur",
        "observed", "activity", iters = 3)),
    "q_cox_diag_kargs_s0" -> ((s, d) =>
      graft.ops.Stats.coxDiagKArgsS0(coxSubjects(s, d), "dur",
        "observed", "activity", iters = 3)),
    // row bisect (VERDICT r16 #2): rank-quartile restriction
    "q_cox_diag_kargs_q1" -> ((s, d) =>
      graft.ops.Stats.coxDiagKArgsQuart(coxSubjects(s, d), "dur",
        "observed", "activity", quart = 1, iters = 3)),
    "q_cox_diag_kargs_q2" -> ((s, d) =>
      graft.ops.Stats.coxDiagKArgsQuart(coxSubjects(s, d), "dur",
        "observed", "activity", quart = 2, iters = 3)),
    "q_cox_diag_kargs_q3" -> ((s, d) =>
      graft.ops.Stats.coxDiagKArgsQuart(coxSubjects(s, d), "dur",
        "observed", "activity", quart = 3, iters = 3)),
    "q_cox_diag_kargs_q4" -> ((s, d) =>
      graft.ops.Stats.coxDiagKArgsQuart(coxSubjects(s, d), "dur",
        "observed", "activity", quart = 4, iters = 3)),
    // window-boundary split: per-duration pre-window (a0h, a0l) pairs
    "q_cox_diag_kargs_a0" -> ((s, d) =>
      graft.ops.Stats.coxDiagKArgsA0(coxSubjects(s, d), "dur",
        "observed", "activity", iters = 3)),
    // per-term live-chain probe (VERDICT r16 #3): pinned ex terms +
    // their pair decomposition through the LIVE final-risk context
    "q_cox_diag_kterms" -> ((s, d) =>
      graft.ops.Stats.coxDiagKTerms(coxSubjects(s, d), "dur",
        "observed", "activity", iters = 3)),

    // Portable-exp bit-parity probe (functions/PortableMath.scala): a
    // deterministic integer-derived grid of ~|events| arguments across
    // [-20, 20] whose outputs are decomposed EXACTLY into integer bit
    // chunks (floor + power-of-two scaling, every step IEEE-exact) and
    // BIGINT-summed — one flipped mantissa bit in ANY row flips a sum —
    // plus raw min/max doubles across [-80, 80] (big-stage ladder,
    // bit-level compare; raw doubles ride parquet/arrow untouched).
    // Raw-double→DECIMAL casts are deliberately absent: Spark casts via
    // shortest-repr (BigDecimal.valueOf) while DuckDB scales by 10^s in
    // double, so sub-repr digits differ by ALGORITHM, not libm. The
    // DRIVER runs the mirrored SQL arithmetic on its own host, so a
    // green here proves the kernel is bit-identical cross-engine — the
    // guarantee the Cox/GMM/logistic replay chains stand on.
    "q_portable_exp" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val x = (col("event_id") * 37 % 40001).cast("double") / 1000.0 - 20.0
      val x8 = (col("event_id") * 41 % 160001).cast("double") / 1000.0 - 80.0
      val base = bitChunks(ev.select(col("event_id"),
        graft.functions.PortableMath.pexp(x).alias("__v"),
        graft.functions.PortableMath.pexp(x8).alias("__v8")), "__v", "e_")
      base.groupBy((col("event_id") % 20).alias("grp"))
        .agg(count(lit(1)).alias("n"),
          sum(col("e_hi")).alias("e_hi"), sum(col("e_c1")).alias("e_c1"),
          sum(col("e_c2")).alias("e_c2"), sum(col("e_c3")).alias("e_c3"),
          min(col("__v8")).alias("mn"), max(col("__v8")).alias("mx"))
    }),

    // Portable-ln bit-parity probe: ln over three integer-derived
    // ranges (mid [0.06, 6250], cubed up to 2.4e11, reciprocal down to
    // 4e-12 — every normalize stage incl. the below-1 up-shift), each
    // output exactly bit-chunked and BIGINT-summed as above.
    "q_portable_ln" -> ((s, d) => {
      val ev = Tables.events(s, d)
      var base = ev.select(col("event_id"),
        ((col("event_id") * 53 % 100003 + 1).cast("double") / 16.0).alias("__y"))
        .select(col("event_id"), col("__y"),
          (col("__y") * col("__y") * col("__y")).alias("__y2"))
        .select(col("event_id"), col("__y"), col("__y2"),
          (lit(1.0) / col("__y2")).alias("__y3"))
        .select(col("event_id"),
          graft.functions.PortableMath.pln(col("__y")).alias("__l1"),
          graft.functions.PortableMath.pln(col("__y2")).alias("__l2"),
          graft.functions.PortableMath.pln(col("__y3")).alias("__l3"))
      base = bitChunks(base, "__l1", "a_")
      base = bitChunks(base, "__l2", "b_")
      base = bitChunks(base, "__l3", "c_")
      val sums = Seq("a_", "b_", "c_").flatMap(p =>
        Seq("hi", "c1", "c2", "c3").map(c => sum(col(s"$p$c")).alias(s"$p$c")))
      base.groupBy((col("event_id") % 20).alias("grp"))
        .agg(count(lit(1)).alias("n"), sums: _*)
    }),

    // Portable-ln parity at the LIVE cox argument shape (round-15
    // VERDICT #3b): the q_portable_ln grid above is 1/16-quantized, so
    // its fraction bits are sparse — while the cox partial-loglik feeds
    // pln(S0) with S0 = H + L/1e9, H ∈ [1, ~10⁴], L any 1e-9 quantum.
    // This probe runs the kernel over ~|events| arguments of EXACTLY
    // that pair-rebuild form (k ∈ [1, 10⁴] dense × full-range quanta),
    // bit-chunked and BIGINT-summed per group: a driver red localizes a
    // build-dependent pln divergence inside the live S0 domain that the
    // synthetic grid misses; green retires "the grid missed it" as an
    // explanation for a q_cox_diag_kln red.
    "q_portable_ln_s0" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val k = (col("event_id") * 37 % 10000 + 1).cast("double")
      val q = (col("event_id") * 1000003 % 1000000000).cast("double")
      val base = bitChunks(ev.select(col("event_id"),
        graft.functions.PortableMath.pln(k + q / lit(1e9)).alias("__v")),
        "__v", "s_")
      base.groupBy((col("event_id") % 20).alias("grp"))
        .agg(count(lit(1)).alias("n"),
          sum(col("s_hi")).alias("s_hi"), sum(col("s_c1")).alias("s_c1"),
          sum(col("s_c2")).alias("s_c2"), sum(col("s_c3")).alias("s_c3"))
    }),

    // Live-shape ln parity, WIDE quanta (round 16 — VERDICT r15 #2,
    // the honest-coverage fix): q_portable_ln_s0 probes k + q/1e9 only
    // for q < 1e9, but the PRE-round-16 live argument rebuilt an
    // UN-normalized suffix-sum L ~ n·1e9 (~4e12 at the gate SFs) whose
    // L/1e9 rounds at a completely different ulp scale — a domain no
    // green probe covered while kln stayed red. Two arms, both exact
    // integer-derived so the arguments are bit-identical cross-engine
    // by construction:
    //  (w) wide-quanta: k + q/1e9 with q spanning [0, 4e12) — the real
    //      un-normalized S0l range, so the r15 gap is probed directly;
    //  (m) pin9-midpoint band: arg = pexp((m + 0.5)/1e9) nudged by
    //      j ∈ {-2..2} ulp-scale factors — pln(arg) lands within ~1 ulp
    //      of a pin9 midpoint, the only 1-ulp-sensitive region of the
    //      loglik readout, in the exact mantissa neighborhoods where a
    //      build-dependent kernel flip would cross a pin.
    "q_portable_ln_s0_wide" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val P = graft.functions.PortableMath
      val k = (col("event_id") * 37 % 10000 + 1).cast("double")
      // Round 17 (ADVICE r16): pre-mod event_id so both arm multiplies
      // stay inside int64 for ANY event_id — the raw 2654435761·id
      // overflowed past id ≈ 3.5e9, where Spark wraps silently while
      // DuckDB raises (a cross-engine crash, not a parity signal).
      // Below 1e8 the pre-mod is the identity, so every fixture SF
      // produces bit-identical arguments to the round-16 probe.
      val eid = col("event_id") % 100000007L
      val qw = (eid * 73856093L % 4000000000000L).cast("double")
      val wide = k + qw / lit(1e9)
      val m = (eid * 2654435761L % 10000000000L).cast("double")
      val mid = (m + lit(0.5)) / lit(1e9)
      val j = (col("event_id") % 5 - lit(2)).cast("double")
      val argm = P.pexp(mid) *
        (lit(1.0) + j * lit(2.220446049250313e-16))
      var base = bitChunks(ev.select(col("event_id"),
        P.pln(wide).alias("__vw"), P.pln(argm).alias("__vm")), "__vw", "w_")
      base = bitChunks(base, "__vm", "m_")
      val sums = Seq("w_", "m_").flatMap(p =>
        Seq("hi", "c1", "c2", "c3").map(c => sum(col(s"$p$c")).alias(s"$p$c")))
      base.groupBy((col("event_id") % 20).alias("grp"))
        .agg(count(lit(1)).alias("n"), sums: _*)
    }),

    // 1-D Gaussian mixture (Stats.gmmEm1d): 3 unrolled EM passes over
    // the log document-length distribution — one population or two?
    // Nine integer-pair moments shuffle per pass; the corpus never moves.
    "q_gmm_doclen" -> ((s, d) =>
      // covariate pin9(pln(1+n_chars)) from the INJECTED literal grid
      // (round 14) — never computed by an engine
      graft.ops.Stats.gmmEm1d(Tables.documents(s, d),
        lnGridX((col("n_chars") + 1).cast("long"), "q_gmm_doclen"),
        iters = 3)),

    // Kernel-at-fit-arguments probe for the GMM (round-13 VERDICT
    // next-round #5): bit-chunk digests of the RAW density pexps and
    // the loglik pln at the exact final-params arguments.
    "q_gmm_diag_kernel" -> ((s, d) =>
      graft.ops.Stats.gmmDiagKernel(Tables.documents(s, d),
        lnGridX((col("n_chars") + 1).cast("long"), "q_gmm_diag_kernel"),
        iters = 3)),

    // Isotonic calibration (Stats.isotonicCalibration): PAV via the
    // minimax identity over the same 10 min-max score bins as
    // q_calibration — the monotone-fitted reliability curve.
    "q_isotonic" -> ((s, d) =>
      graft.ops.Stats.isotonicCalibration(Tables.events(s, d),
        col("event_type") === "purchase", "value", bins = 10)),

    // Count overdispersion (Stats.overdispersion): per event type, are
    // per-user event counts Poisson-like or clumped? D = s²/x̄ + χ².
    "q_overdispersion" -> ((s, d) =>
      graft.ops.Stats.overdispersion(Tables.events(s, d),
        col("event_type"), col("user_id"))),

    // Schuster periodogram (Stats.periodogram): which period dominates
    // the daily order series — the frequency-domain view beside
    // q_autocorr's lag view (weekly structure spikes at period 7).
    "q_periodogram" -> ((s, d) =>
      graft.ops.Stats.periodogram(Tables.orders(s, d),
        to_date(col("o_orderdate")), maxPeriod = 14)),

    // Zipf rank-frequency slope (TextAnalysis.zipfSlope): log-log OLS
    // over the top-64 token head of the documents corpus.
    "q_zipf_slope" -> ((s, d) =>
      graft.ops.TextAnalysis.zipfSlope(Tables.documents(s, d),
        "text", topN = 64)),

    // Character-class mix per source (TextAnalysis.scriptMix): the
    // corpus-QA dashboard row — letter/digit/space/other fractions.
    "q_script_mix" -> ((s, d) =>
      graft.ops.TextAnalysis.scriptMix(Tables.documents(s, d),
        col("source"), "text")),

    // PII exposure audit per source (TextAnalysis.piiAudit): email/URL
    // hit counts with scrubPii's exact patterns — governance before
    // the scrub runs.
    "q_pii_audit" -> ((s, d) =>
      graft.ops.TextAnalysis.piiAudit(Tables.documents(s, d),
        col("source"), "text")),

    // HBOS density outliers (Stats.hbosTopK): top-50 line items whose
    // quantity/price/discount all sit in rare histogram bins — the
    // independence-density gate beside Mahalanobis.
    "q_hbos" -> ((s, d) =>
      graft.ops.Stats.hbosTopK(Tables.lineitem(s, d),
        col("l_orderkey") * 10 + col("l_linenumber"),
        Seq(("qty", col("l_quantity")), ("price", col("l_extendedprice")),
          ("disc", col("l_discount"))))),

    // Weight-of-evidence / information value (Features.woeIv): purchase
    // separation per hour-of-day and value band — infoGain's ranking in
    // scorecard units, with the IV leakage readout.
    "q_woe_iv" -> ((s, d) =>
      graft.ops.Features.woeIv(Tables.events(s, d),
        col("event_type") === "purchase",
        Seq(("hour", hour(col("ts"))),
          ("value_band",
            least(floor(col("value") / 50.0), lit(9.0)).cast("long"))))),

    // Out-of-fold smoothed target encoding (Features.targetEncodeOOF):
    // event-type encoded by the other folds' mean value with a prior of
    // weight 10 — the leakage-safe category-mean lookup table.
    "q_target_encode" -> ((s, d) =>
      graft.ops.Features.targetEncodeOOF(Tables.events(s, d),
        col("event_type"), col("value"), col("user_id") % 5)),

    // Quantile normalization (Features.quantileNormalize): every event
    // type's value distribution mapped onto the global 11-point
    // reference grid — the cross-source batch-effect correction.
    "q_quantile_normalize" -> ((s, d) =>
      graft.ops.Features.quantileNormalize(Tables.events(s, d),
        col("value"), col("event_type"))),

    // Fellegi-Sunter m/u weight estimation (Linkage
    // .fellegiSunterWeights) over the planted-twin customer pairs: each
    // field's agreement odds learned from the labeled blocking output.
    "q_linkage_weights" -> ((s, d) =>
      Linkage.fellegiSunterWeights(linkagePairs(s, d),
        abs(col("id1") - col("id2")) === 10000000L, linkageFields)),

    // Fellegi-Sunter pair scoring (Linkage.fellegiSunterScore): summed
    // log-likelihood-ratio weights rank the same candidate pairs; the
    // planted twins should dominate the top of the list.
    "q_linkage_score" -> ((s, d) =>
      Linkage.fellegiSunterScore(linkagePairs(s, d),
        abs(col("id1") - col("id2")) === 10000000L, linkageFields,
        topN = 40)),

    // Mann-Whitney rank-sum test (Stats.mannWhitneyU): do odd users'
    // event values stochastically dominate even users'? Tie-corrected
    // normal approximation, ranks from the distributed per-value
    // cumulative — the nonparametric twin of q_ab_test.
    "q_mannwhitney" -> ((s, d) =>
      graft.ops.Stats.mannWhitneyU(Tables.events(s, d),
        col("user_id") % 2 === 1, "value")),

    // Benford first-digit audit of the extended-price column: observed
    // vs log10(1+1/d) share with per-digit chi-square contributions.
    "q_benford" -> ((s, d) =>
      graft.ops.Stats.benfordDigits(Tables.lineitem(s, d), "l_extendedprice")),

    // Exact 10% trimmed mean of acctbal per market segment
    // (Stats.trimmedMean): the robust location readout between mean and
    // median, scipy's floor(alpha*n)-each-end convention.
    "q_trimmed_mean" -> ((s, d) =>
      graft.ops.Stats.trimmedMean(Tables.customer(s, d),
        "c_mktsegment", "c_acctbal", alpha = 0.1)),

    // Gini coefficient of per-customer revenue concentration via the
    // rank-sum identity over the fractional-ranks count table.
    "q_gini" -> ((s, d) => {
      val rev = Tables.orders(s, d).groupBy("o_custkey")
        .agg(graft.ops.Aggregates.exactSum(col("o_totalprice"), 2).alias("rev"))
      graft.ops.Stats.giniCoefficient(rev, "rev")
    }),

    // Shannon-entropy column profile beside the null/distinct profiles:
    // bits per column over four lineitem columns of very different
    // cardinality (flag ≈ 1.5 bits, suppkey ≈ log2 n).
    "q_entropy_profile" -> ((s, d) =>
      graft.ops.Stats.entropyProfile(Tables.lineitem(s, d),
        Seq("l_returnflag", "l_linestatus", "l_suppkey", "l_quantity"))),

    // Top-20 three-step behavior paths (Sessionize.pathTrigrams): the
    // trigram extension of q_event_transitions' Markov matrix.
    "q_path_trigrams" -> ((s, d) =>
      graft.ops.Sessionize.pathTrigrams(Tables.events(s, d), "user_id",
        "ts", "event_id", "event_type", topN = 20)),

    // Kaplan-Meier time-to-purchase curve: per-user duration from first
    // event to first purchase (censored at the last event when no
    // purchase), survival over day-grain event times.
    "q_survival_km" -> ((s, d) => {
      val subj = Tables.events(s, d).groupBy("user_id").agg(
        min(col("ts")).alias("__first"),
        min(when(col("event_type") === "purchase", col("ts"))).alias("__conv"),
        max(col("ts")).alias("__last"))
        .select(
          datediff(to_date(coalesce(col("__conv"), col("__last"))),
            to_date(col("__first"))).cast("long").alias("dur"),
          col("__conv").isNotNull.alias("observed"))
      graft.ops.Stats.kaplanMeier(subj, "dur", "observed")
    }),

    // Nelson-Aalen cumulative hazard over the same time-to-purchase
    // construction as q_survival_km — the when-does-risk-spike view.
    "q_hazard_na" -> ((s, d) => {
      val subj = Tables.events(s, d).groupBy("user_id").agg(
        min(col("ts")).alias("__first"),
        min(when(col("event_type") === "purchase", col("ts"))).alias("__conv"),
        max(col("ts")).alias("__last"))
        .select(
          datediff(to_date(coalesce(col("__conv"), col("__last"))),
            to_date(col("__first"))).cast("long").alias("dur"),
          col("__conv").isNotNull.alias("observed"))
      graft.ops.Stats.nelsonAalen(subj, "dur", "observed")
    }),

    // Joint-distribution outliers (Stats.mahalanobisTopK): the 25 rows
    // farthest off the quantity/price covariance ridge.
    "q_mahalanobis" -> ((s, d) =>
      graft.ops.Stats.mahalanobisTopK(Tables.lineitem(s, d),
        "l_quantity", "l_extendedprice",
        Seq("l_orderkey", "l_linenumber"), k = 25)),

    // Cramér's V: the [0,1] effect-size readout over the q_chi_square
    // contingency shape.
    "q_cramers_v" -> ((s, d) =>
      graft.ops.Stats.cramersV(Tables.lineitem(s, d),
        "l_returnflag", "l_linestatus")),

    // Symmetric mutual information (Stats.mutualInfo) over the
    // q_cramers_v contingency shape: MI, marginal entropies, and the
    // min-entropy-normalized NMI.
    "q_mutual_info" -> ((s, d) =>
      graft.ops.Stats.mutualInfo(Tables.lineitem(s, d),
        col("l_returnflag"), col("l_linestatus"))),

    // Symmetric bounded drift between the two corpus halves — the JSD
    // twin of q_kl_drift on the same slices.
    "q_js_divergence" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.TextAnalysis.jsDivergence(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "text")
    }),

    // Two-feature OLS (Stats.olsFit2): price ~ quantity + discount in
    // one exact-DECIMAL moment pass, Cramer closed form, R² readout.
    "q_ols2" -> ((s, d) =>
      graft.ops.Stats.olsFit2(Tables.lineitem(s, d),
        "l_extendedprice", "l_quantity", "l_discount")),

    // A-priori frequent triples over order baskets: pair-frequency
    // pruning before the third join (monotonicity keeps it exact).
    "q_basket_triples" -> ((s, d) =>
      graft.ops.Stats.frequentTriples(Tables.lineitem(s, d),
        "l_orderkey", "l_partkey", minSupport = 2L, topN = 50)),

    // Cross-correlation of daily order count vs daily revenue at lags
    // −3..3 — does volume echo into revenue days later?
    "q_ccf" -> ((s, d) =>
      graft.ops.Stats.crossCorrelation(Tables.orders(s, d),
        to_date(col("o_orderdate")), col("o_totalprice"), maxLag = 3)),

    // RFM customer-value segmentation: quintile bands per metric via
    // the distributed cumulative, (r,f,m) segment census with spend.
    "q_rfm" -> ((s, d) =>
      graft.ops.Stats.rfmSegments(Tables.orders(s, d), "o_custkey",
        to_date(col("o_orderdate")), "o_totalprice", tiles = 5)),

    // Near-identical vocabulary pairs scored by the native Jaro-Winkler
    // kernel over the q_token_typos length-banded blocking (all-pairs
    // work on the Heaps-law vocab, never the corpus; the metric runs
    // inside codegen on each blocked candidate).
    "q_jaro_winkler" -> ((s, d) => {
      // Planted single-edit typos (the q_token_typos protocol) give the
      // miner targets above the 0.93 gate: JW(customer,customes)=0.95,
      // JW(column,colunn)=0.9333.
      val dirty = when(col("doc_id") % 37 === 0,
          regexp_replace(col("text"), "\\bcustomer\\b", "customes"))
        .when(col("doc_id") % 41 === 0,
          regexp_replace(col("text"), "\\bcolumn\\b", "colunn"))
        .otherwise(col("text"))
      val vocab = Tables.documents(s, d)
        .select(explode(split(dirty, " ")).alias("token"))
        .filter(length(col("token")) >= 4)
        .groupBy("token").agg(count(lit(1)).alias("n"))
      val k = vocab.select(col("token"),
        explode(array(length(col("token")), length(col("token")) + 1))
          .alias("b"))
      val a = k.select(col("b"), col("token").alias("t1"))
      val bb = k.select(col("b"), col("token").alias("t2"))
      val jw = graft.functions.JaroWinkler.jaro_winkler(col("t1"), col("t2"))
      a.join(bb, Seq("b")).filter(col("t1") < col("t2"))
        .filter(jw >= 0.93)
        .select(col("t1"), col("t2"), round(jw, 6).alias("jw")).distinct()
        .orderBy(col("jw").desc, col("t1"), col("t2"))
        .limit(50)
    }),

    // Time-constrained funnel (Sessionize.windowFunnel): view → click →
    // purchase with every step inside 7 days of the first view — the
    // q_funnel chain with the ClickHouse window semantics.
    "q_window_funnel" -> ((s, d) =>
      graft.ops.Sessionize.windowFunnel(Tables.events(s, d), "user_id",
        "ts", "event_type", Seq("view", "click", "purchase"),
        windowMicros = 604800000000L)),

    // Theil-Sen robust daily-volume trend: median pairwise slope over
    // the calendar-bounded series, through the two-pass percentile.
    "q_theil_sen" -> ((s, d) =>
      graft.ops.Stats.theilSenTrend(Tables.orders(s, d),
        to_date(col("o_orderdate")))),

    // Kendall tau-b concordance between daily order volume and daily
    // exact revenue — the integer-pair-count rank correlation over the
    // same calendar-bounded pair set as q_theil_sen.
    "q_kendall_tau" -> ((s, d) =>
      graft.ops.Stats.kendallTau(Tables.orders(s, d),
        to_date(col("o_orderdate")), col("o_totalprice"))),

    // Partial correlation: quantity↔price with the discount channel
    // removed, all three correlations from one moment pass.
    "q_partial_corr" -> ((s, d) =>
      graft.ops.Stats.partialCorr(Tables.lineitem(s, d),
        "l_quantity", "l_extendedprice", "l_discount")),

    // Grid-bucketed geospatial neighbor join (Joins.geoNeighborPairs):
    // customer pairs within 200 km over deterministic synthetic
    // coordinates — one cell equi-join with 3×3 fan-out, never n².
    "q_geo_neighbors" -> ((s, d) => {
      val pts = Tables.customer(s, d).select(col("c_custkey"),
        (((col("c_custkey") * 37) % 12000) / lit(100.0) - lit(60.0)).alias("lat"),
        (((col("c_custkey") * 91) % 36000) / lit(100.0) - lit(180.0)).alias("lon"))
      graft.ops.Joins.geoNeighborPairs(pts, "c_custkey", "lat", "lon",
        radiusKm = 200.0)
    }),

    // Zipf rank-frequency fit over the corpus vocabulary: weighted
    // log-log OLS on the count-of-counts table, slope ≈ −1 audit.
    "q_zipf_fit" -> ((s, d) =>
      graft.ops.Stats.zipfFit(Tables.documents(s, d), "text")),

    // XYZ demand-variability bands per part over the full month grid
    // (zero months count), beside q_abc_analysis' value bands.
    "q_xyz_analysis" -> ((s, d) =>
      graft.ops.Stats.xyzAnalysis(Tables.lineitem(s, d), "l_partkey",
        to_date(col("l_shipdate")), "l_quantity")),

    // Naive / seasonal-naive forecast error floor over daily volume —
    // the MASE denominator every forecast model must beat.
    "q_forecast_baseline" -> ((s, d) =>
      graft.ops.Stats.forecastBaseline(Tables.orders(s, d),
        to_date(col("o_orderdate")))),

    // Markov removal-effect attribution (Attribution.markovAttribution):
    // absorbing-chain channel credit — how much conversion probability
    // disappears when journeys through each channel are severed.
    "q_markov_attribution" -> ((s, d) =>
      graft.ops.Attribution.markovAttribution(Tables.events(s, d),
        "user_id", "ts", "event_id", "event_type", "purchase",
        Seq("click", "error", "signup", "view"), iters = 16)),

    // ROC AUC by the rank statistic (Stats.rocAuc): does `value`
    // separate purchase events from the rest? Mann-Whitney normalized
    // to P(score⁺ > score⁻), midranks for ties.
    "q_auc" -> ((s, d) =>
      graft.ops.Stats.rocAuc(Tables.events(s, d),
        col("event_type") === "purchase", "value")),

    // Two-sample Kolmogorov-Smirnov (Stats.ksTest): error-event values
    // vs the rest — sup-norm ECDF drift, no binning choice, beside the
    // binned KL/PSI/JS monitors.
    "q_ks_test" -> ((s, d) =>
      graft.ops.Stats.ksTest(Tables.events(s, d),
        col("event_type") === "error", "value")),

    // Exact 1-D Wasserstein-1 drift (Stats.wasserstein1): returned
    // lineitems vs the rest on quantity — the ECDF-area drift metric
    // WITH UNITS beside q_ks_test's sup-norm, same range-bucketed
    // cumulative machinery.
    "q_wasserstein" -> ((s, d) =>
      graft.ops.Stats.wasserstein1(Tables.lineitem(s, d),
        col("l_returnflag") === "R", "l_quantity")),

    // Two-sample Cramér–von Mises (Stats.cramerVonMises): error-event
    // values vs the rest — the integrated-squared ECDF gap on the same
    // slices as q_ks_test's sup-norm.
    "q_cramer_von_mises" -> ((s, d) =>
      graft.ops.Stats.cramerVonMises(Tables.events(s, d),
        col("event_type") === "error", "value")),

    // Hill tail-index (Stats.hillTailIndex): mean log-excess of the top
    // 100 extended prices over the 101st — the heavy-tail alpha readout
    // beside q_gumbel_fit's block maxima.
    "q_hill_tail" -> ((s, d) =>
      graft.ops.Stats.hillTailIndex(Tables.lineitem(s, d),
        "l_extendedprice", k = 100)),

    // Calibration / reliability table (Stats.calibrationReport):
    // min-max-normalized value vs purchase incidence, 10 bins, per-bin
    // Brier contribution.
    "q_calibration" -> ((s, d) =>
      graft.ops.Stats.calibrationReport(Tables.events(s, d),
        col("event_type") === "purchase", "value", bins = 10)),

    // Global classifier scorecard (Stats.classifierMetrics): Brier,
    // clamped log loss, accuracy at the 0.5 cut — the one-row summary
    // beside q_calibration's per-bin reliability table.
    "q_classifier_metrics" -> ((s, d) =>
      graft.ops.Stats.classifierMetrics(Tables.events(s, d),
        col("event_type") === "purchase", "value")),

    // Murphy decomposition + ECE (Stats.calibrationDecomp): the one-row
    // reliability/resolution/uncertainty/ECE split of q_calibration's
    // table — same min-max projection, same 10 bins.
    "q_calibration_decomp" -> ((s, d) =>
      graft.ops.Stats.calibrationDecomp(Tables.events(s, d),
        col("event_type") === "purchase", "value", bins = 10)),

    // Trained quality classifier (Stats.logisticFit2): 3 unrolled
    // Newton steps of two-feature logistic regression — is-English vs
    // (ln(1+tokens), chars-per-token) — the GPT-3-style "fit a
    // classifier against a reference slice" training step beside the
    // counting Naive Bayes. Each step is one 10-number moment shuffle;
    // the corpus never moves.
    "q_logistic_quality" -> ((s, d) => {
      val P = graft.functions.PortableMath
      val nTok = size(split(col("text"), " ")).cast("double")
      // x1 = pin9(pln(1+tokens)) from the INJECTED literal grid
      // (round 14) — the integer-domain covariate is computed once on
      // the JVM, never by an engine; x2's division is a single
      // correctly-rounded IEEE op, identical cross-engine by itself
      graft.ops.Stats.logisticFit2(Tables.documents(s, d),
        (col("lang") === "en").cast("double"),
        lnGridX((size(split(col("text"), " ")) + 1).cast("long"),
          "q_logistic_quality"),
        P.pin9(col("n_chars").cast("double") / nTok))
    }),

    // Kernel-at-fit-arguments probe for the logistic family (round-13
    // VERDICT next-round #5, q_cox_diag_kexp's sibling): bit-chunk
    // digests of the RAW sigmoid pexp and the two clamped loss plns at
    // the exact final-β arguments over the documents corpus.
    "q_logistic_diag_kernel" -> ((s, d) =>
      graft.ops.Stats.logisticDiagKernel(Tables.documents(s, d),
        col("doc_id"), (col("lang") === "en").cast("double"),
        lnGridX((size(split(col("text"), " ")) + 1).cast("long"),
          "q_logistic_diag_kernel"),
        graft.functions.PortableMath.pin9(col("n_chars").cast("double") /
          size(split(col("text"), " ")).cast("double")))),

    // The classifier's FILTERING step (Stats.logisticScore): train the
    // same 3-step β, broadcast the one-row model, score every doc as a
    // narrow projection on the scan — zero corpus shuffles end-to-end.
    "q_quality_scores" -> ((s, d) => {
      val P = graft.functions.PortableMath
      val nTok = size(split(col("text"), " ")).cast("double")
      // same grid-injected x1 as q_logistic_quality (round 14)
      graft.ops.Stats.logisticScore(Tables.documents(s, d), col("doc_id"),
        (col("lang") === "en").cast("double"),
        lnGridX((size(split(col("text"), " ")) + 1).cast("long"),
          "q_quality_scores"),
        P.pin9(col("n_chars").cast("double") / nTok))
        .select(col("id").alias("doc_id"), col("score"))
        .orderBy("doc_id")
    }),

    // Information-gain feature ranking (Stats.infoGain): hour-of-day,
    // ISO weekday, and value band against purchase incidence.
    "q_info_gain" -> ((s, d) =>
      graft.ops.Stats.infoGain(Tables.events(s, d),
        col("event_type") === "purchase",
        Seq(
          ("hour", hour(col("ts"))),
          ("dow", (weekday(col("ts")) + 1).cast("long")),
          ("value_band",
            least(floor(col("value") / 50.0), lit(9.0)).cast("long"))))),

    // Day-of-week seasonal index (Stats.seasonalIndex) of daily order
    // volume — the multiplicative weekly profile.
    "q_seasonal_index" -> ((s, d) =>
      graft.ops.Stats.seasonalIndex(Tables.orders(s, d),
        to_date(col("o_orderdate")))),

    // Market concentration (Stats.hhiConcentration): HHI + CR4 of
    // customer revenue within each nation.
    "q_hhi" -> ((s, d) => {
      val j = Tables.orders(s, d).select("o_custkey", "o_totalprice")
        .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
      graft.ops.Stats.hhiConcentration(j, "c_nationkey", "o_custkey",
        "o_totalprice")
    }),

    // Association rules (Stats.assocRules): directed part pairs over
    // order baskets with support/confidence/lift/leverage.
    "q_assoc_rules" -> ((s, d) =>
      graft.ops.Stats.assocRules(Tables.lineitem(s, d),
        "l_orderkey", "l_partkey", minSupport = 2L, topN = 50)),

    // Bounded-round k-core peeling (Graph.kCore) of the near-dup
    // candidate graph: 8 sweeps at k=2 — chains and pairwise accidents
    // peel away, template families survive as cores.
    "q_kcore" -> ((s, d) => {
      val edges = ScaleDedup.minhashCandidatePairs(Tables.documents(s, d),
          "doc_id", "text", numHashes = 4, bands = 2)
        .select(col("id1").alias("src"), col("id2").alias("dst"))
      Graph.kCore(edges, k = 2, rounds = 8).orderBy("node")
    }),

    // Flesch readability per source (TextAnalysis.readabilityReport):
    // word/sentence/syllable regexp counts at the scan, one aggregation.
    "q_readability" -> ((s, d) =>
      graft.ops.TextAnalysis.readabilityReport(Tables.documents(s, d),
        "text", "source")),

    // Character-class / encoding-damage profile per source
    // (TextAnalysis.charsetProfile): the mojibake detector.
    "q_charset_profile" -> ((s, d) =>
      graft.ops.TextAnalysis.charsetProfile(Tables.documents(s, d),
        "text", "source")),

    // Weighted k-core (Graph.kCoreWeighted) of the near-dup graph with
    // exact-Jaccard edge weights: 8 sweeps peeling weighted degree < 1.0
    // — similarity-weighted corroboration instead of neighbor counting.
    "q_kcore_weighted" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cands = ScaleDedup.minhashCandidatePairs(docs, "doc_id", "text",
        numHashes = 4, bands = 2)
      val toks = docs.select(col("doc_id"),
        ScaleDedup.tokenSet(col("text")).alias("toks"))
      val edges = cands
        .join(toks.select(col("doc_id").alias("id1"), col("toks").alias("t1")), "id1")
        .join(toks.select(col("doc_id").alias("id2"), col("toks").alias("t2")), "id2")
        .select(col("id1").alias("src"), col("id2").alias("dst"),
          ScaleDedup.jaccard(col("t1"), col("t2")).alias("w"))
      Graph.kCoreWeighted(edges, minWeight = 1.0, rounds = 8).orderBy("node")
    }),

    // Label-propagation communities (Graph.labelPropagation) over the
    // near-dup candidate graph: 4 deterministic synchronous sweeps —
    // finer than connected components (weak bridges don't merge
    // template families).
    "q_communities" -> ((s, d) => {
      val edges = ScaleDedup.minhashCandidatePairs(Tables.documents(s, d),
          "doc_id", "text", numHashes = 4, bands = 2)
        .select(col("id1").alias("src"), col("id2").alias("dst"))
      Graph.labelPropagation(edges, rounds = 4).orderBy("node")
    }),

    // Per-edge triangle support (Graph.edgeTriangleSupport) of the
    // near-dup graph: support-0 edges are uncorroborated bridges — the
    // edge-granular audit under q_triangle_counts.
    "q_edge_support" -> ((s, d) => {
      val edges = ScaleDedup.minhashCandidatePairs(Tables.documents(s, d),
          "doc_id", "text", numHashes = 4, bands = 2)
        .select(col("id1").alias("src"), col("id2").alias("dst"))
      Graph.edgeTriangleSupport(edges).orderBy("a", "b")
    }),

    // Bounded k-truss peeling (Graph.kTruss): 4 sweeps at k=3 — every
    // surviving edge sits in a triangle of survivors; chains and stars
    // peel even where k-core keeps them.
    "q_ktruss" -> ((s, d) => {
      val edges = ScaleDedup.minhashCandidatePairs(Tables.documents(s, d),
          "doc_id", "text", numHashes = 4, bands = 2)
        .select(col("id1").alias("src"), col("id2").alias("dst"))
      Graph.kTruss(edges, k = 3, rounds = 4).orderBy("a", "b")
    }),

    // Deterministic Poisson-bootstrap CI (Stats.bootstrapCI) for the
    // mean order price: md5-derived resamples both engines replay
    // exactly — the distributed bootstrap with zero RNG state.
    "q_bootstrap_ci" -> ((s, d) =>
      graft.ops.Stats.bootstrapCI(Tables.orders(s, d),
        "o_orderkey", "o_totalprice", reps = 100, alpha = 0.05)),

    // Personalized PageRank (Graph.personalizedPagerank) on the
    // user↔event-type graph seeded at the purchase node: proximity-to-
    // purchase trust scores instead of global authority (TrustRank).
    "q_ppr_trust" -> ((s, d) => {
      import s.implicits._
      val ue = Tables.events(s, d).groupBy("user_id", "event_type")
        .agg(count(lit(1)).alias("w"))
      val edges = ue.select(concat(lit("u:"), col("user_id")).alias("src"),
          concat(lit("t:"), col("event_type")).alias("dst"), col("w"))
        .unionAll(ue.select(concat(lit("t:"), col("event_type")).alias("src"),
          concat(lit("u:"), col("user_id")).alias("dst"), col("w")))
      val seeds = Seq("t:purchase").toDF("node")
      Graph.personalizedPagerank(edges, seeds, iters = 3)
        .select(col("node"), round(col("rank"), 6).alias("rank"))
        .orderBy("node")
    }),

    // Exact per-group mode (Aggregates.groupMode): most frequent lang per
    // source, smallest-value tie-break.
    "q_group_mode" -> ((s, d) =>
      Aggregates.groupMode(Tables.documents(s, d), "source", "lang")),

    // Exact weighted median (Stats.weightedMedian): quantity-weighted
    // median extended price per return flag — the "median unit shipped"
    // rather than the median line.
    "q_weighted_median" -> ((s, d) =>
      graft.ops.Stats.weightedMedian(Tables.lineitem(s, d), "l_returnflag",
        col("l_extendedprice"), col("l_quantity"))),

    // Additive STL-style decomposition (Stats.stlDecompose) of daily
    // order volume: ±3-day centered trend, centered day-of-week
    // seasonal, remainder.
    "q_stl_decompose" -> ((s, d) =>
      graft.ops.Stats.stlDecompose(Tables.orders(s, d),
        to_date(col("o_orderdate")), halfWindow = 3)),

    // SAX symbolization (Stats.saxSymbols) of daily order volume:
    // z-normalize, weekly PAA frames, 4-letter Gaussian-breakpoint
    // alphabet.
    "q_sax_symbols" -> ((s, d) =>
      graft.ops.Stats.saxSymbols(Tables.orders(s, d),
        to_date(col("o_orderdate")), frameLen = 7)),

    // Eventually-follows pairs (Sessionize.followsPairs): which event
    // type's first occurrence precedes which, per user, with support.
    "q_follows_pairs" -> ((s, d) =>
      Sessionize.followsPairs(Tables.events(s, d), "user_id", "ts",
        "event_type")),

    // Harmonic centrality (Graph.harmonicCentrality) on the bipartite
    // user↔event-type graph from all five type nodes, 3 hops: which
    // users sit closest to the whole behavioral alphabet.
    "q_harmonic" -> ((s, d) => {
      val ue = Tables.events(s, d)
        .select(col("user_id"), col("event_type")).distinct()
      val edges = ue.select(concat(lit("u:"), col("user_id")).alias("src"),
          concat(lit("t:"), col("event_type")).alias("dst"))
        .unionAll(ue.select(concat(lit("t:"), col("event_type")).alias("src"),
          concat(lit("u:"), col("user_id")).alias("dst")))
      val seeds = Tables.events(s, d)
        .select(concat(lit("t:"), col("event_type")).alias("node")).distinct()
      Graph.harmonicCentrality(edges, seeds, hops = 3)
    }),

    // Deterministic HyperLogLog (Aggregates.hllDistinct, p=8): distinct
    // users per event type from 256 md5-draw registers — the mergeable
    // sketch beside the exact count it approximates.
    "q_hll_distinct" -> ((s, d) =>
      Aggregates.hllDistinct(Tables.events(s, d), "event_type",
        col("user_id"), p = 8)),

    // HLL mergeability (Aggregates.hllRollup): per-(type, day) register
    // tables max-merged to per-type and estimated — must equal the
    // direct q_hll_distinct numbers (max is associative).
    "q_hll_rollup" -> ((s, d) => {
      val fine = Aggregates.hllRegisters(
        Tables.events(s, d).withColumn("__day", to_date(col("ts"))),
        Seq("event_type", "__day"), col("user_id"), p = 8)
      Aggregates.hllEstimate(
        Aggregates.hllRollup(fine, Seq("event_type")),
        Seq("event_type"), p = 8).orderBy("event_type")
    }),

    // Exact trailing-7-day active users per day (Aggregates
    // .rollingDistinct): the WAU curve via dedup-then-fan-out, not a
    // range join.
    "q_rolling_distinct" -> ((s, d) =>
      Aggregates.rollingDistinct(Tables.events(s, d), col("ts"),
        col("user_id"), windowDays = 7)),

    // Peak concurrent sessions per day (Sessionize.peakConcurrency):
    // 30-min-gap sessions swept as +1/−1 deltas.
    "q_concurrency" -> ((s, d) =>
      Sessionize.peakConcurrency(Tables.events(s, d), "user_id", "ts",
        "event_id", gapMinutes = 30)),

    // Jelinek-Mercer interpolated bigram LM
    // (TextAnalysis.interpolatedLogProb, λ=0.7): conditional bigram
    // probability mixed with the unigram back-off.
    "q_interp_logprob" -> ((s, d) =>
      TextAnalysis.interpolatedLogProb(Tables.documents(s, d), "doc_id",
        "text", lambda = 0.7).orderBy("doc_id")),

    // text LM: Kneser-Ney interpolated bigram score (D=0.75) — absolute
    // discount plus continuation-probability back-off, the smoothing
    // shipped n-gram LMs use; top rung of the perplexity-filter ladder.
    "q_kneser_ney" -> ((s, d) =>
      TextAnalysis.kneserNeyLogProb(Tables.documents(s, d), "doc_id",
        "text").orderBy("doc_id")),

    // Nearest-centroid (Rocchio) classifier confusion matrix
    // (Similarity.centroidClassify) over the labeled embeddings.
    "q_centroid_classify" -> ((s, d) =>
      Similarity.centroidClassify(
        Tables.embeddings(s, d).filter(size(col("embedding")) === 64),
        "vec_id", "embedding", "label")),

    // Precision-recall curve (Stats.prCurve) for "value predicts
    // purchase", thresholds on the 1-dp score grid.
    "q_pr_curve" -> ((s, d) =>
      graft.ops.Stats.prCurve(Tables.events(s, d),
        col("event_type") === "purchase", "value", decimals = 1)),

    // Robust per-group outlier report (Stats.robustZscoreByGroup):
    // modified z via median/MAD per event type at the 3.5 cutoff.
    "q_robust_zscore" -> ((s, d) =>
      graft.ops.Stats.robustZscoreByGroup(Tables.events(s, d),
        "event_type", "value", cutoff = 3.5)),

    // Seasonal anomaly days (Stats.stlAnomalies): order-volume days
    // whose STL remainder exceeds 3σ.
    "q_stl_anomaly" -> ((s, d) =>
      graft.ops.Stats.stlAnomalies(Tables.orders(s, d),
        to_date(col("o_orderdate")), halfWindow = 3)),

    // Adamic-Adar link prediction (Graph.adamicAdar) over the near-dup
    // candidate graph: which unlinked doc pairs share the most
    // (rarest) neighbors.
    "q_link_predict" -> ((s, d) => {
      val edges = ScaleDedup.minhashCandidatePairs(Tables.documents(s, d),
          "doc_id", "text", numHashes = 4, bands = 2)
        .select(col("id1").alias("src"), col("id2").alias("dst"))
      Graph.adamicAdar(edges, topN = 50)
    }),

    // Keep-BEST dedup (ScaleDedup.keepBestPerCluster): cluster near-dups
    // then keep the longest member per cluster — the canonical-selection
    // step after q_dedup_clusters.
    "q_dedup_keep_best" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = ScaleDedup.minhashCandidatePairs(docs, "doc_id", "text",
        numHashes = 4, bands = 2)
      val labels = ScaleDedup.connectedComponents(
        docs.select(col("doc_id").alias("id")), pairs)
      ScaleDedup.keepBestPerCluster(docs, "doc_id", labels, col("n_chars"))
    }),

    // Difference-in-differences (Stats.diffInDiff): even-user "rollout"
    // crossed with the Jan-16 cutover on event value.
    "q_did" -> ((s, d) =>
      graft.ops.Stats.diffInDiff(Tables.events(s, d),
        col("user_id") % 2 === 0,
        col("ts") >= lit("2024-01-16").cast("timestamp"), "value")),

    // CUPED variance reduction (Stats.cuped): pre-period per-user value
    // baseline adjusting the post-period metric, same assignment/cutover.
    "q_cuped" -> ((s, d) =>
      graft.ops.Stats.cuped(Tables.events(s, d), "user_id",
        col("user_id") % 2 === 0,
        col("ts") >= lit("2024-01-16").cast("timestamp"), "value")),

    // k-anonymity / l-diversity audit (Constraints.kAnonymityReport)
    // over customer quasi-identifiers (nation, balance band) with the
    // market segment as the sensitive attribute.
    "q_k_anonymity" -> ((s, d) =>
      Constraints.kAnonymityReport(Tables.customer(s, d),
        Seq(col("c_nationkey"), floor(col("c_acctbal") / 1000).cast("long")),
        Seq("nation", "bal_band"), col("c_mktsegment"), k = 5, l = 2)),

    // privacy: entropy l-diversity — the skew-aware upgrade of the
    // distinct-count check (2000-wide balance bands to keep groups fat).
    "q_l_diversity" -> ((s, d) =>
      Constraints.entropyLDiversityReport(Tables.customer(s, d),
        Seq(col("c_nationkey"), floor(col("c_acctbal") / 2000).cast("long")),
        Seq("nation", "bal_band"), col("c_mktsegment"), l = 3)),

    // Newman modularity (Graph.modularity) of the LPA communities over
    // the near-dup graph — the quality gate on q_communities' output.
    "q_modularity" -> ((s, d) => {
      val edges = ScaleDedup.minhashCandidatePairs(Tables.documents(s, d),
          "doc_id", "text", numHashes = 4, bands = 2)
        .select(col("id1").alias("src"), col("id2").alias("dst"))
      Graph.modularity(edges, Graph.labelPropagation(edges, rounds = 4))
    }),

    // Degree assortativity (Graph.degreeAssortativity) of the near-dup
    // graph: template families link hubs-to-hubs, collision stars don't.
    "q_assortativity" -> ((s, d) => {
      val edges = ScaleDedup.minhashCandidatePairs(Tables.documents(s, d),
          "doc_id", "text", numHashes = 4, bands = 2)
        .select(col("id1").alias("src"), col("id2").alias("dst"))
      Graph.degreeAssortativity(edges)
    }),

    // Item-item CF (Stats.itemItemCosine): cosine co-occurrence top-5
    // recommendations per part over order baskets.
    "q_item_cf" -> ((s, d) =>
      graft.ops.Stats.itemItemCosine(Tables.lineitem(s, d), "l_orderkey",
        "l_partkey", minSupport = 2L, k = 5)),

    // Vocabulary coverage curve (TextAnalysis.vocabCoverage) over word
    // bigrams: the tokenizer-budget knee.
    "q_vocab_coverage" -> ((s, d) => {
      val t = split(col("text"), " ")
      // round 19: the inline transform/sequence bigram lambda re-split
      // the text per element_at (quadratic per doc — 22.6 s on the 10x
      // stress corpus); the compiled wordBigrams kernel is the
      // value-identical one-pass form (split elements are never null,
      // so concat_ws ≡ the old concat here).
      val bigrams = Tables.documents(s, d).filter(size(t) >= 2)
        .select(explode(graft.ops.ScaleDedup.wordBigrams(t, " "))
          .alias("tok"))
      TextAnalysis.vocabCoverage(bigrams, "tok",
        Seq(50, 100, 250, 500, 750, 900))
    }),

    // Wilson lower-bound ranking (Stats.wilsonRank): parts by the
    // pessimistic return-rate bound, volume floor 20.
    "q_wilson_rank" -> ((s, d) =>
      graft.ops.Stats.wilsonRank(Tables.lineitem(s, d), "l_partkey",
        col("l_returnflag") === "R", z = 1.96, minTrials = 20L, topN = 20)),

    // Event-time lateness profile (Sessionize.latenessProfile): how
    // out-of-order events arrive per user, by ingest order — the
    // measured watermark-delay recommendation.
    "q_lateness_profile" -> ((s, d) =>
      Sessionize.latenessProfile(Tables.events(s, d), "user_id", "ts",
        "event_id")),

    // Interval union (Sessionize.intervalUnion): per-supplier 7-day
    // shipping windows merged to de-overlapped coverage.
    "q_interval_union" -> ((s, d) => {
      val start = unix_millis(col("l_shipdate"))
      Sessionize.intervalUnion(Tables.lineitem(s, d), "l_suppkey",
        start, start + lit(604800000L))
    }),

    // Daily growth accounting (Aggregates.growthAccounting): DAU split
    // into new / retained / resurrected, churn reported next-day.
    "q_growth_accounting" -> ((s, d) =>
      Aggregates.growthAccounting(Tables.events(s, d), col("ts"),
        col("user_id"))),

    // Order consistency (Sessionize.orderConsistency): how
    // one-directional each eventually-follows pair really is.
    "q_order_consistency" -> ((s, d) =>
      Sessionize.orderConsistency(Tables.events(s, d), "user_id", "ts",
        "event_type")),

    // Goh-Barabási burstiness (Sessionize.burstiness) of within-day
    // inter-arrival gaps per event type.
    "q_burstiness" -> ((s, d) =>
      Sessionize.burstiness(Tables.events(s, d), "event_type", "ts",
        "event_id")),

    // Per-user feature assembly (Sessionize.userFeatures): the
    // churn/LTV feature-store readout.
    "q_user_features" -> ((s, d) =>
      Sessionize.userFeatures(Tables.events(s, d), "user_id", "ts",
        "event_type", "value", purchaseType = "purchase")),

    // Lexical richness (TextAnalysis.lexicalRichness): TTR + hapax
    // share per source — the template detector.
    "q_lexical_richness" -> ((s, d) =>
      TextAnalysis.lexicalRichness(Tables.documents(s, d), "text",
        "source")),

    // Token repeat rate (TextAnalysis.repeatRate): Yule's K and
    // Simpson's D per source — the length-robust template detector
    // beside q_lexical_richness's TTR/hapax view.
    "q_repeat_rate" -> ((s, d) =>
      TextAnalysis.repeatRate(Tables.documents(s, d), "source", "text")),

    // Distinct-n diversity (TextAnalysis.ngramDiversity): unique/total
    // unigrams and adjacent bigrams per source — the transition-level
    // template detector TTR misses.
    "q_ngram_diversity" -> ((s, d) =>
      TextAnalysis.ngramDiversity(Tables.documents(s, d), "source", "text")),

    // Graph health summary (Graph.graphSummary) of the near-dup
    // candidate graph: components, largest share, isolation.
    "q_graph_summary" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val edges = ScaleDedup.minhashCandidatePairs(docs, "doc_id", "text",
          numHashes = 4, bands = 2)
        .select(col("id1").alias("src"), col("id2").alias("dst"))
      Graph.graphSummary(docs.select(col("doc_id").alias("id")), edges)
    }),

    // One-way ANOVA (Stats.anovaOneWay): does mean event value differ
    // anywhere across the five event types, with eta-squared.
    "q_anova" -> ((s, d) =>
      graft.ops.Stats.anovaOneWay(Tables.events(s, d), "event_type",
        "value")),

    // Standardized effect size (Stats.effectSize): Cohen's d / Hedges' g
    // for the even-user split on event value.
    "q_effect_size" -> ((s, d) =>
      graft.ops.Stats.effectSize(Tables.events(s, d),
        col("user_id") % 2 === 0, "value")),

    // Eventually-follows lags (Sessionize.followsLag): median/p90 delay
    // between first occurrences per precedence pair.
    "q_follows_lag" -> ((s, d) =>
      Sessionize.followsLag(Tables.events(s, d), "user_id", "ts",
        "event_type")),

    // Inter-event gap bands (Sessionize.gapProfile): the histogram that
    // justifies the 30-min sessionization threshold.
    "q_gap_profile" -> ((s, d) =>
      Sessionize.gapProfile(Tables.events(s, d), "user_id", "ts",
        "event_id")),

    // Laspeyres/Paasche price indexes (Stats.priceIndex): 1995→1996
    // part-price movement, base- vs current-basket weighted.
    "q_price_index" -> ((s, d) =>
      graft.ops.Stats.priceIndex(Tables.lineitem(s, d), "l_partkey",
        when(year(col("l_shipdate")) === 1995, 0)
          .when(year(col("l_shipdate")) === 1996, 1),
        col("l_quantity"), col("l_extendedprice"))),

    // Anchored-literal regex filter: RegexAnchorSimplification rewrites
    // the RLIKE into a pushed StringStartsWith (RegexRewriteSpec asserts
    // the plan; this query asserts the answers survive the rewrite).
    "q_filter_prefix_rlike" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      Tables.customer(s, d)
        .filter(col("c_name").rlike("^Customer#00000001"))
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // DAU/WAU stickiness: daily actives over the trailing-7-day actives
    // (composition of the two distinct curves).
    "q_stickiness" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val daily = ev.filter(col("user_id").isNotNull)
        .select(to_date(col("ts")).alias("window_end"), col("user_id"))
        .distinct()
        .groupBy("window_end").agg(countDistinct("user_id").alias("dau"))
      val wau = Aggregates.rollingDistinct(ev, col("ts"), col("user_id"), 7)
      daily.join(wau, "window_end")
        .select(col("window_end").alias("d"), col("dau"),
          col("active_7d").alias("wau"),
          round(col("dau").cast("double") / col("active_7d").cast("double"),
            6).alias("stickiness"))
        .orderBy("d")
    }),
  )

  /** Query batch shared by q_bm25_topk and its oracle (terms drawn from
    * the fixture vocabulary). */
  private val Bm25Queries = Seq(
    ("qa", "hash join"), ("qb", "fast scan table"), ("qc", "window agg query"))

  // ------------------------------------------------------------ oracle SQL

  /** DuckDB-generated mirror of ScaleDedup.simhash (16 bits, seed "#0"). */
  /** Candidate pairs for the Fellegi-Sunter queries: every customer gets
    * a planted twin (id + 10⁷, balance + 1.5, segment string reversed
    * for every third customer), blocking is sorted-neighbor on balance
    * (window 3 — twins land adjacent because +1.5 is far below the
    * typical balance gap), and the pair columns carry both sides'
    * nation/segment/balance for the agreement predicates. */
  private def linkagePairs(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val base = c.select(col("c_custkey").cast("long").alias("id"),
      col("c_nationkey").alias("nat"), col("c_mktsegment").alias("seg"),
      col("c_acctbal").alias("bal"))
    val twins = c.select((col("c_custkey") + 10000000L).alias("id"),
      col("c_nationkey").alias("nat"),
      when(col("c_custkey") % 3 === 0, reverse(col("c_mktsegment")))
        .otherwise(col("c_mktsegment")).alias("seg"),
      (col("c_acctbal") + 1.5).alias("bal"))
    val ent = base.unionByName(twins)
    ScaleDedup.sortedNeighborPairs(ent, "id", col("bal"), window = 3)
      .join(ent.select(col("id").alias("id1"), col("nat").alias("nat1"),
        col("seg").alias("seg1"), col("bal").alias("bal1")), "id1")
      .join(ent.select(col("id").alias("id2"), col("nat").alias("nat2"),
        col("seg").alias("seg2"), col("bal").alias("bal2")), "id2")
  }

  /** Agreement predicates for the Fellegi-Sunter queries, alphabetical
    * by field name (the weights table orders by field). */
  private def linkageFields: Seq[(String, Column)] = Seq(
    "bal_close" -> (abs(col("bal1") - col("bal2")) <= 2.0),
    "nation" -> (col("nat1") === col("nat2")),
    "segment" -> (col("seg1") === col("seg2")))

  /** Oracle mirror of [[linkagePairs]]: entity union with planted twins,
    * sorted-neighbor blocking on (bal, id), per-pair label + agreement
    * flags, and the one-row m/u count cell table. */
  private def fsPairsCtes: String =
    "ent AS (SELECT CAST(c_custkey AS BIGINT) AS id, c_nationkey AS nat, " +
      "c_mktsegment AS seg, c_acctbal AS bal FROM customer " +
      "UNION ALL SELECT c_custkey + 10000000, c_nationkey, " +
      "CASE WHEN c_custkey % 3 = 0 THEN reverse(c_mktsegment) " +
      "ELSE c_mktsegment END, c_acctbal + 1.5 FROM customer), " +
      "r AS (SELECT id, nat, seg, bal, " +
      "row_number() OVER (ORDER BY bal, id) AS rk FROM ent), " +
      "pr AS (SELECT a.id AS id1, b.id AS id2, " +
      "CASE WHEN abs(a.id - b.id) = 10000000 THEN 1 ELSE 0 END AS lab, " +
      "CASE WHEN abs(a.bal - b.bal) <= 2.0 THEN 1 ELSE 0 END AS f_bal_close, " +
      "CASE WHEN a.nat = b.nat THEN 1 ELSE 0 END AS f_nation, " +
      "CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS f_segment " +
      "FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 3), " +
      "ag AS MATERIALIZED (SELECT sum(lab) AS nm, count(*) - sum(lab) AS nu, " +
      Seq("bal_close", "nation", "segment").map(f =>
        s"sum(CASE WHEN lab = 1 THEN f_$f ELSE 0 END) AS am_$f, " +
        s"sum(CASE WHEN lab = 0 THEN f_$f ELSE 0 END) AS au_$f")
        .mkString(", ") +
      " FROM pr)"

  /** Smoothed m estimate for field `f` as oracle SQL (the engine's
    * (am + 0.5)/(nm + 1.0) spelled identically). */
  private def fsM(f: String): String =
    s"((CAST(am_$f AS DOUBLE) + 0.5) / (CAST(nm AS DOUBLE) + 1.0))"

  private def fsU(f: String): String =
    s"((CAST(au_$f AS DOUBLE) + 0.5) / (CAST(nu AS DOUBLE) + 1.0))"

  /** Mirror of Stats.methodAgreement: paired-series DECIMAL moments,
    * Lin's CCC and Bland-Altman limits with the pinned z literal. */
  private def methodAgreementOracle: String = {
    val n = "CAST(n AS DOUBLE)"
    val mx = s"(CAST(sx AS DOUBLE) / $n)"
    val my = s"(CAST(sy AS DOUBLE) / $n)"
    val vx = s"(CAST(sxx AS DOUBLE) / $n - $mx * $mx)"
    val vy = s"(CAST(syy AS DOUBLE) / $n - $my * $my)"
    val cxy = s"(CAST(sxy AS DOUBLE) / $n - $mx * $my)"
    val den = s"($vx + $vy + ($mx - $my) * ($mx - $my))"
    val bias = s"($mx - $my)"
    val sd = s"sqrt(($vx + $vy - 2.0 * $cxy) * $n / ($n - 1.0))"
    "WITH a AS (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS x " +
      "FROM orders GROUP BY 1), " +
      "b AS (SELECT CAST(l_shipdate AS DATE) AS d, count(*) AS y " +
      "FROM lineitem GROUP BY 1), " +
      "p AS (SELECT CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y " +
      "FROM a JOIN b USING (d)), " +
      "m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
      "sum(CAST(x AS DECIMAL(38,10))) AS sx, sum(CAST(y AS DECIMAL(38,10))) AS sy, " +
      "sum(CAST(x * x AS DECIMAL(38,10))) AS sxx, " +
      "sum(CAST(y * y AS DECIMAL(38,10))) AS syy, " +
      "sum(CAST(x * y AS DECIMAL(38,10))) AS sxy FROM p) " +
      "SELECT n, " +
      s"CASE WHEN $den = 0.0 THEN NULL ELSE round(2.0 * $cxy / $den, 6) + 0.0 END AS ccc, " +
      s"round($bias, 6) + 0.0 AS bias, " +
      s"round($bias - 1.9599639845400545 * $sd, 6) + 0.0 AS loa_lo, " +
      s"round($bias + 1.9599639845400545 * $sd, 6) + 0.0 AS loa_hi FROM m"
  }

  /** Mirror of Stats.ratioMetricCI: per-unit DECIMAL totals, sample
    * variance/covariance moments, delta-method se with the pinned z. */
  private def ratioCiOracle: String = {
    val n = "CAST(n_units AS DOUBLE)"
    val my = s"(CAST(sy AS DOUBLE) / $n)"
    val mx = s"(CAST(sx AS DOUBLE) / $n)"
    val vy = s"((CAST(syy AS DOUBLE) - $n * $my * $my) / ($n - 1.0))"
    val vx = s"((CAST(sxx AS DOUBLE) - $n * $mx * $mx) / ($n - 1.0))"
    val cxy = s"((CAST(sxy AS DOUBLE) - $n * $mx * $my) / ($n - 1.0))"
    val r = s"($my / $mx)"
    val se = s"sqrt(($vy - 2.0 * $r * $cxy + $r * $r * $vx) / ($n * ($mx * $mx)))"
    "WITH p AS (SELECT user_id, " +
      "CAST(sum(CAST(coalesce(value, 0.0) AS DECIMAL(38,10))) AS DOUBLE) AS y, " +
      "CAST(sum(CAST(CAST(1 AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE) AS x " +
      "FROM events GROUP BY 1), " +
      "m AS (SELECT CAST(count(*) AS BIGINT) AS n_units, " +
      "sum(CAST(y AS DECIMAL(38,10))) AS sy, sum(CAST(x AS DECIMAL(38,10))) AS sx, " +
      "sum(CAST(y * y AS DECIMAL(38,10))) AS syy, " +
      "sum(CAST(x * x AS DECIMAL(38,10))) AS sxx, " +
      "sum(CAST(x * y AS DECIMAL(38,10))) AS sxy FROM p) " +
      s"SELECT n_units, round($r, 6) AS ratio, round($se, 6) AS se, " +
      s"round($r - 1.9599639845400545 * $se, 6) AS ci_lo, " +
      s"round($r + 1.9599639845400545 * $se, 6) AS ci_hi FROM m"
  }

  /** Mirror of Stats.ebShrinkage: beta prior by moments over the
    * qualifying keys, shrunken rates with identical arithmetic. */
  private def ebShrinkageOracle: String = {
    val k = "CAST(k AS DOUBLE)"
    val mu = s"(CAST(sp AS DOUBLE) / $k)"
    val v = s"((CAST(spp AS DOUBLE) - $k * $mu * $mu) / ($k - 1.0))"
    val mm = s"($mu * (1.0 - $mu) / $v - 1.0)"
    val alpha = s"($mu * $mm)"
    val beta = s"((1.0 - $mu) * $mm)"
    "WITH per AS (SELECT user_id AS key, count(*) AS n, " +
      "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s " +
      "FROM events GROUP BY 1), " +
      "pp AS (SELECT key, n, s, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS p FROM per), " +
      "pr AS (SELECT count(*) AS k, sum(CAST(p AS DECIMAL(28,10))) AS sp, " +
      "sum(CAST(p * p AS DECIMAL(28,10))) AS spp FROM pp WHERE n >= 5) " +
      "SELECT key, CAST(n AS BIGINT) AS n, round(p, 6) AS raw_rate, " +
      s"round((CAST(s AS DOUBLE) + $alpha) / (CAST(n AS DOUBLE) + $alpha + $beta), 6) AS shrunk_rate, " +
      s"round($alpha, 6) AS prior_alpha, round($beta, 6) AS prior_beta " +
      "FROM pp CROSS JOIN pr ORDER BY shrunk_rate DESC, key LIMIT 30"
  }

  /** Mirror of Stats.hurstExponent: full-block rescaled ranges per
    * (size, block), 9-dp block values, DECIMAL log-log OLS slope. */
  private def hurstOracle: String = {
    val mean = "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
    val sd = s"sqrt(CAST(qx AS DOUBLE) / CAST(n AS DOUBLE) - $mean * $mean)"
    "WITH s AS (SELECT CAST(o_orderdate AS DATE) AS d, " +
      "CAST(count(*) AS DOUBLE) AS x FROM orders GROUP BY 1), " +
      "r AS (SELECT x, row_number() OVER (ORDER BY d) AS i FROM s), " +
      "e AS (SELECT i, x, sz, CAST(floor((i - 1) / sz) AS BIGINT) AS blk " +
      "FROM r, unnest([8, 16, 32, 64]) AS u(sz)), " +
      "bs AS (SELECT sz, blk, count(*) AS n, " +
      "sum(CAST(x AS DECIMAL(28,8))) AS sx, " +
      "sum(CAST(x * x AS DECIMAL(28,8))) AS qx FROM e GROUP BY 1, 2), " +
      "f AS (SELECT e.sz, e.blk, e.i, e.x, bs.n, bs.sx, bs.qx FROM e " +
      "JOIN bs ON e.sz = bs.sz AND e.blk = bs.blk WHERE bs.n = e.sz), " +
      s"c AS (SELECT sz, blk, n, sx, qx, CAST(sum(CAST(x - $mean " +
      "AS DECIMAL(28,8))) OVER (PARTITION BY sz, blk ORDER BY i " +
      "ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum FROM f), " +
      "g AS (SELECT sz, blk, max(cum) AS mx, min(cum) AS mn, " +
      s"max($sd) AS sd FROM c GROUP BY 1, 2), " +
      "rs AS (SELECT sz, round((mx - mn) / sd, 9) AS rsv FROM g WHERE sd > 0.0), " +
      "ps AS (SELECT round(ln(CAST(sz AS DOUBLE)), 9) AS lx, " +
      "round(ln(CAST(sum(CAST(rsv AS DECIMAL(28,9))) AS DOUBLE) / CAST(count(*) AS DOUBLE)), 9) AS ly " +
      "FROM rs GROUP BY sz " +
      "HAVING CAST(sum(CAST(rsv AS DECIMAL(28,9))) AS DOUBLE) / CAST(count(*) AS DOUBLE) > 0.0), " +
      "m AS (SELECT CAST(count(*) AS BIGINT) AS ns, " +
      "sum(CAST(lx AS DECIMAL(28,10))) AS sx, sum(CAST(ly AS DECIMAL(28,10))) AS sy, " +
      "sum(CAST(lx * lx AS DECIMAL(28,10))) AS sxx, " +
      "sum(CAST(ly * ly AS DECIMAL(28,10))) AS syy, " +
      "sum(CAST(lx * ly AS DECIMAL(28,10))) AS sxy FROM ps) " +
      "SELECT ns AS n_sizes, " +
      "round((CAST(ns AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "(CAST(ns AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) + 0.0 AS hurst, " +
      "round((CAST(ns AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) * " +
      "(CAST(ns AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "((CAST(ns AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
      "(CAST(ns AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) + 0.0 AS r2 " +
      "FROM m"
  }

  /** Mirror of q_stl_strength: the q_stl_decompose chain, then
    * population variances of (T+R), (S+R), R from DECIMAL moments with
    * the engine's fixed arithmetic. */
  private def stlStrengthOracle: String = {
    def v(q: String, s: String) =
      s"(CAST($q AS DOUBLE) / CAST(n_days AS DOUBLE) - " +
        s"(CAST($s AS DOUBLE) / CAST(n_days AS DOUBLE)) * " +
        s"(CAST($s AS DOUBLE) / CAST(n_days AS DOUBLE)))"
    "WITH s AS MATERIALIZED (SELECT CAST(o_orderdate AS DATE) AS d, " +
      "CAST(count(*) AS DOUBLE) AS y FROM orders GROUP BY 1), " +
      "t AS MATERIALIZED (SELECT d, y, count(*) OVER w AS n, " +
      "round(CAST(SUM(CAST(y AS DECIMAL(28,8))) OVER w AS DOUBLE) / " +
      "CAST(count(*) OVER w AS DOUBLE), 6) AS trend FROM s " +
      "WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)), " +
      "f AS MATERIALIZED (SELECT d, y, trend, y - trend AS detr, " +
      "CAST(isodow(d) AS BIGINT) AS dow FROM t WHERE n = 7), " +
      "dm AS (SELECT dow, CAST(SUM(CAST(detr AS DECIMAL(28,8))) AS DOUBLE) / " +
      "CAST(count(*) AS DOUBLE) AS sm FROM f GROUP BY 1), " +
      "cc AS (SELECT CAST(SUM(CAST(sm AS DECIMAL(28,8))) AS DOUBLE) / " +
      "CAST(count(*) AS DOUBLE) AS c FROM dm), " +
      "se AS (SELECT dow, round(sm - c, 6) AS seasonal FROM dm CROSS JOIN cc), " +
      "r AS (SELECT f.y, f.trend, se.seasonal, " +
      "round(f.y - f.trend - se.seasonal, 6) AS rem FROM f JOIN se USING (dow)), " +
      "m AS (SELECT CAST(count(*) AS BIGINT) AS n_days, " +
      "sum(CAST(y - seasonal AS DECIMAL(28,8))) AS st, " +
      "sum(CAST((y - seasonal) * (y - seasonal) AS DECIMAL(28,8))) AS qt, " +
      "sum(CAST(y - trend AS DECIMAL(28,8))) AS ss, " +
      "sum(CAST((y - trend) * (y - trend) AS DECIMAL(28,8))) AS qs, " +
      "sum(CAST(rem AS DECIMAL(28,8))) AS sr, " +
      "sum(CAST(rem * rem AS DECIMAL(28,8))) AS qr FROM r) " +
      "SELECT n_days, " +
      s"CASE WHEN ${v("qt", "st")} = 0.0 THEN NULL ELSE " +
      s"round(greatest(0.0, 1.0 - ${v("qr", "sr")} / ${v("qt", "st")}), 6) + 0.0 END AS trend_strength, " +
      s"CASE WHEN ${v("qs", "ss")} = 0.0 THEN NULL ELSE " +
      s"round(greatest(0.0, 1.0 - ${v("qr", "sr")} / ${v("qs", "ss")}), 6) + 0.0 END AS seasonal_strength " +
      "FROM m"
  }

  /** Mirror of q_heaps_law: word-BIGRAM tokens (the engine's saturation-
    * free binding), first-seen vocabulary table + per-doc token counts,
    * 10 conditional-sum checkpoints, DECIMAL log-log OLS. */
  private def heapsLawOracle: String = {
    val ks = 1 to 10
    "WITH pr AS (SELECT doc_id, string_split(text, ' ') AS parts " +
      "FROM documents WHERE text IS NOT NULL AND " +
      "len(string_split(text, ' ')) >= 2), " +
      "tk AS (SELECT id, token FROM (SELECT doc_id AS id, " +
      "unnest(list_transform(range(1, len(parts)), " +
      "i -> parts[i] || '_' || parts[i + 1])) AS token FROM pr) " +
      "WHERE token <> ''), " +
      "fs AS (SELECT token, min(id) AS fd FROM tk GROUP BY 1), " +
      "pd AS (SELECT id, count(*) AS nt FROM tk GROUP BY 1), " +
      "mx AS (SELECT max(id) AS mx FROM pd), " +
      "nr AS (SELECT " +
      ks.map(k => "sum(CASE WHEN CAST(id AS DOUBLE) <= " +
        s"CAST(mx.mx AS DOUBLE) * ($k / 10.0) THEN nt ELSE 0 END) AS n_$k")
        .mkString(", ") +
      " FROM pd CROSS JOIN mx), " +
      "vr AS (SELECT " +
      ks.map(k => "sum(CASE WHEN CAST(fd AS DOUBLE) <= " +
        s"CAST(mx.mx AS DOUBLE) * ($k / 10.0) THEN 1 ELSE 0 END) AS v_$k")
        .mkString(", ") +
      " FROM fs CROSS JOIN mx), " +
      "p AS (" +
      ks.map(k => s"SELECT n_$k AS nt, v_$k AS vt FROM nr CROSS JOIN vr")
        .mkString(" UNION ALL ") +
      "), " +
      "pp AS (SELECT round(ln(CAST(nt AS DOUBLE)), 9) AS x, round(ln(CAST(vt AS DOUBLE)), 9) AS y " +
      "FROM p WHERE nt > 0 AND vt > 0), " +
      "m AS (SELECT CAST(count(*) AS BIGINT) AS nc, " +
      "sum(CAST(x AS DECIMAL(28,10))) AS sx, sum(CAST(y AS DECIMAL(28,10))) AS sy, " +
      "sum(CAST(x * x AS DECIMAL(28,10))) AS sxx, " +
      "sum(CAST(y * y AS DECIMAL(28,10))) AS syy, " +
      "sum(CAST(x * y AS DECIMAL(28,10))) AS sxy FROM pp) " +
      "SELECT nc AS n_checkpoints, " +
      "round((CAST(nc AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "(CAST(nc AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) + 0.0 AS beta, " +
      "round(exp((CAST(sy AS DOUBLE) - (CAST(nc AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "(CAST(nc AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / CAST(nc AS DOUBLE)), 6) + 0.0 AS k_coef, " +
      "round((CAST(nc AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) * " +
      "(CAST(nc AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "((CAST(nc AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
      "(CAST(nc AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) + 0.0 AS r2 " +
      "FROM m"
  }

  /** Mirror of q_cluster_quality: the kmeansCtes assignment (af) and
    * final centroids (c3), then simplified silhouette / dispersion /
    * Davies-Bouldin arithmetic with the engine's rounding points. */
  private def clusterQualityOracle: String = {
    def dist(v: String, cv: String) =
      s"list_sum(list_transform(range(1, 65), i -> ($v[i] - $cv[i]) * ($v[i] - $cv[i])))"
    kmeansCtes + ", " +
      s"ow AS (SELECT af.vec_id, af.cell, sqrt(${dist("af.v", "c.cv")}) AS a " +
      "FROM af JOIN c3 c ON c.cid = af.cell), " +
      s"ot AS (SELECT af.vec_id, sqrt(min(${dist("af.v", "c.cv")})) AS b " +
      "FROM af JOIN c3 c ON c.cid <> af.cell GROUP BY 1), " +
      "sl AS (SELECT ow.cell, CASE WHEN greatest(a, b) = 0.0 THEN 0.0 " +
      "ELSE round((b - a) / greatest(a, b), 6) END AS s, round(a, 9) AS a9 " +
      "FROM ow JOIN ot ON ow.vec_id = ot.vec_id), " +
      "per AS MATERIALIZED (SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs, " +
      "round(CAST(sum(CAST(s AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_silhouette, " +
      "round(CAST(sum(CAST(a9 AS DECIMAL(28,9))) AS DOUBLE) / count(*), 9) AS si " +
      "FROM sl GROUP BY 1), " +
      "cj AS (SELECT per.cell, per.si, c.cv FROM per JOIN c3 c ON c.cid = per.cell), " +
      s"db AS (SELECT p1.cell, round(max((p1.si + p2.si) / sqrt(${dist("p1.cv", "p2.cv")})), 6) " +
      "AS db_component FROM cj p1 JOIN cj p2 ON p1.cell <> p2.cell GROUP BY 1) " +
      "SELECT per.cell AS cell, n_vecs, mean_silhouette, round(si, 6) AS dispersion, " +
      "db_component FROM per LEFT JOIN db ON per.cell = db.cell ORDER BY per.cell"
  }

  /** Mirror of q_cluster_agreement: the dedupClustersOracle recursive CC
    * chain + the labelPropagationOracle 4-round chain over the SAME pair
    * CTEs, then the contingency/NMI/ARI arithmetic with DECIMAL entropy
    * and MI sums and exact integer pair counts. */
  private def clusterAgreementOracle: String = {
    val sb = new StringBuilder(
      s"WITH RECURSIVE $mhPairsCtes, " +
        "edges AS (SELECT id1 AS src, id2 AS dst FROM pairs " +
        "UNION ALL SELECT id2, id1 FROM pairs), " +
        "cc AS (SELECT doc_id AS id, doc_id AS label FROM documents " +
        "UNION SELECT e.dst AS id, cc.label FROM cc JOIN edges e ON cc.id = e.src), " +
        "laba AS MATERIALIZED (SELECT id, min(label) AS la FROM cc GROUP BY id), " +
        "n0 AS MATERIALIZED (SELECT id1 AS u, id2 AS v FROM pairs " +
        "UNION ALL SELECT id2, id1 FROM pairs), " +
        "l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM n0)")
    for (i <- 1 to 4) {
      sb.append(s", c$i AS MATERIALIZED (SELECT n.u AS u, l.label AS label, " +
        s"count(*) AS c FROM n0 n JOIN l${i - 1} l ON n.v = l.node " +
        "GROUP BY 1, 2)")
      sb.append(s", l$i AS MATERIALIZED (SELECT u AS node, label FROM c$i " +
        "QUALIFY row_number() OVER " +
        "(PARTITION BY u ORDER BY c DESC, label ASC) = 1)")
    }
    val ea = "(CAST(sa AS DOUBLE) / 2.0)"
    val eb = "(CAST(sb AS DOUBLE) / 2.0)"
    val nd = "CAST(n AS DOUBLE)"
    val expd = s"$ea * $eb / ($nd * ($nd - 1.0) / 2.0)"
    val maxi = s"($ea + $eb) / 2.0"
    sb.append(
      ", labb AS (SELECT d.doc_id AS id, coalesce(l.label, d.doc_id) AS lb " +
        "FROM documents d LEFT JOIN l4 l ON l.node = d.doc_id), " +
        "ct AS MATERIALIZED (SELECT la, lb, count(*) AS n FROM laba a " +
        "JOIN labb b ON a.id = b.id GROUP BY 1, 2), " +
        "ma AS (SELECT la, sum(n) AS ai FROM ct GROUP BY 1), " +
        "mb AS (SELECT lb, sum(n) AS bj FROM ct GROUP BY 1), " +
        "nn AS (SELECT sum(n) AS t FROM ct), " +
        "hha AS (SELECT CAST(count(*) AS BIGINT) AS clusters_a, " +
        "-CAST(sum(CAST(round((CAST(ai AS DOUBLE) / CAST(nn.t AS DOUBLE)) * " +
        "ln(CAST(ai AS DOUBLE) / CAST(nn.t AS DOUBLE)), 9) AS DECIMAL(28,14))) AS DOUBLE) AS ha, " +
        "sum(ai * (ai - 1)) AS sa FROM ma CROSS JOIN nn), " +
        "hhb AS (SELECT CAST(count(*) AS BIGINT) AS clusters_b, " +
        "-CAST(sum(CAST(round((CAST(bj AS DOUBLE) / CAST(nn.t AS DOUBLE)) * " +
        "ln(CAST(bj AS DOUBLE) / CAST(nn.t AS DOUBLE)), 9) AS DECIMAL(28,14))) AS DOUBLE) AS hb, " +
        "sum(bj * (bj - 1)) AS sb FROM mb CROSS JOIN nn), " +
        "mim AS (SELECT CAST(sum(CAST(round((CAST(ct.n AS DOUBLE) / CAST(nn.t AS DOUBLE)) * " +
        "ln((CAST(nn.t AS DOUBLE) * CAST(ct.n AS DOUBLE)) / " +
        "(CAST(ai AS DOUBLE) * CAST(bj AS DOUBLE))), 9) AS DECIMAL(28,14))) AS DOUBLE) AS mi, " +
        "sum(ct.n * (ct.n - 1)) AS sij, CAST(max(nn.t) AS BIGINT) AS n " +
        "FROM ct JOIN ma USING (la) JOIN mb USING (lb) CROSS JOIN nn) " +
        "SELECT n, clusters_a, clusters_b, " +
        "CASE WHEN ha = 0.0 OR hb = 0.0 THEN NULL " +
        "ELSE round(mi / sqrt(ha * hb), 6) END AS nmi, " +
        s"CASE WHEN $maxi - $expd = 0.0 THEN NULL " +
        s"ELSE round((CAST(sij AS DOUBLE) / 2.0 - $expd) / ($maxi - $expd), 6) " +
        "END AS ari FROM mim CROSS JOIN hha CROSS JOIN hhb")
    sb.toString
  }

  /** Mirror of Stats.bestSplit: DECIMAL prefix sums over the daily
    * series, per-candidate between-variance gain, rounded-gain argmax. */
  private def bestSplitOracle: String = {
    val n1 = "CAST(i AS DOUBLE)"
    val n = "CAST(t.n AS DOUBLE)"
    val n2 = s"($n - $n1)"
    val m1 = s"(CAST(cs AS DOUBLE) / $n1)"
    val m2 = s"(CAST(ct - cs AS DOUBLE) / $n2)"
    val m = s"(CAST(ct AS DOUBLE) / $n)"
    "WITH s AS (SELECT CAST(o_orderdate AS DATE) AS d, " +
      "CAST(count(*) AS DOUBLE) AS x FROM orders GROUP BY 1), " +
      "p AS (SELECT d, row_number() OVER (ORDER BY d) AS i, " +
      "sum(CAST(x AS DECIMAL(28,8))) OVER (ORDER BY d " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs FROM s), " +
      "t AS (SELECT max(i) AS n, max(cs) AS ct FROM p) " +
      "SELECT d AS split_day, CAST(i AS BIGINT) AS n_before, " +
      "CAST(t.n - i AS BIGINT) AS n_after, " +
      s"round($m1, 6) AS mean_before, round($m2, 6) AS mean_after, " +
      s"round($n1 * $m1 * $m1 + $n2 * $m2 * $m2 - $n * $m * $m, 6) + 0.0 AS gain " +
      "FROM p CROSS JOIN t WHERE i < t.n " +
      "ORDER BY gain DESC, split_day LIMIT 1"
  }

  /** Mirror of Stats.mdeReport: conditional DECIMAL moments, pooled sd,
    * z literals folded the same way on both engines. */
  private def mdeOracle: String = {
    val na = "CAST(n_a AS DOUBLE)"; val nb = "CAST(n_b AS DOUBLE)"
    val ma = s"(CAST(sa AS DOUBLE) / $na)"
    val mb = s"(CAST(sb AS DOUBLE) / $nb)"
    val sp = s"sqrt(((CAST(qa AS DOUBLE) - $na * $ma * $ma) + " +
      s"(CAST(qb AS DOUBLE) - $nb * $mb * $mb)) / ($na + $nb - 2.0))"
    val mde = s"(1.9599639845400545 + 0.8416212335729143) * $sp * " +
      s"sqrt(1.0 / $na + 1.0 / $nb)"
    "WITH b AS (SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS g, " +
      "value AS x FROM events WHERE value IS NOT NULL), " +
      "m AS (SELECT CAST(sum(1 - g) AS BIGINT) AS n_a, " +
      "CAST(sum(g) AS BIGINT) AS n_b, " +
      "sum(CAST(CASE WHEN g = 0 THEN x ELSE 0.0 END AS DECIMAL(38,10))) AS sa, " +
      "sum(CAST(CASE WHEN g = 1 THEN x ELSE 0.0 END AS DECIMAL(38,10))) AS sb, " +
      "sum(CAST(CASE WHEN g = 0 THEN x * x ELSE 0.0 END AS DECIMAL(38,10))) AS qa, " +
      "sum(CAST(CASE WHEN g = 1 THEN x * x ELSE 0.0 END AS DECIMAL(38,10))) AS qb " +
      "FROM b) " +
      s"SELECT n_a, n_b, round($sp, 6) AS pooled_sd, " +
      s"round($mde, 6) AS mde_abs, " +
      s"CASE WHEN $ma = 0.0 THEN NULL ELSE round($mde / $ma, 6) END AS mde_rel " +
      "FROM m"
  }

  private def simhashOracle: String = {
    val votes = (0 until 16).map { j =>
      s"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    "WITH t AS (SELECT doc_id, list_transform(list_distinct(string_split(text, ' ')), " +
      "x -> (('0x' || substr(md5(x || '#0'), 1, 8))::BIGINT)) AS hs FROM documents) " +
      s"SELECT doc_id, CAST($votes AS BIGINT) AS sh FROM t ORDER BY doc_id"
  }

  /** DuckDB mirror of ScaleDedup.minhashSignature's md5-slice scheme: hash
    * i = 32-bit slice i%4 of md5(token salted with "#"+i/4; no salt for the
    * first group). */
  private def mhExpr(i: Int): String = {
    val salted = if (i / 4 == 0) "x" else s"(x || '#${i / 4}')"
    s"list_min(list_transform(toks, x -> (('0x' || substr(md5($salted), ${(i % 4) * 8 + 1}, 8))::BIGINT)))"
  }

  /** DuckDB mirror of q_simhash_pairs: same 16-bit signature CTE as
    * simhashOracle, then an all-pairs distance filter — the ORACLE may go
    * all-pairs (it exists to define the answer, not to scale); the Spark
    * side's banded join must produce the identical pair set. */
  private def simhashPairsOracle: String = {
    val votes = (0 until 32).map { j =>
      s"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    "WITH t AS (SELECT doc_id, list_transform(list_distinct(string_split(text, ' ')), " +
      "x -> (('0x' || substr(md5(x || '#0'), 1, 8))::BIGINT)) AS hs FROM documents), " +
      s"s AS (SELECT doc_id, CAST($votes AS BIGINT) AS sh FROM t) " +
      "SELECT a.doc_id AS id1, b.doc_id AS id2, " +
      "CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS dist " +
      "FROM s a JOIN s b ON a.doc_id < b.doc_id " +
      "WHERE bit_count(xor(a.sh, b.sh)) <= 3 ORDER BY id1, id2"
  }

  /** DuckDB mirror of Similarity.lshBucket's plane literals. */
  private def planeLiteral(p: Int, dim: Int): String =
    (0 until dim).map(dd => Similarity.planeSign(p, dd))
      .map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  private def lshOracle: String = {
    val bucketOf = (v: String) => (0 until 8).map { p =>
      s"(CASE WHEN list_dot_product($v, ${planeLiteral(p, 64)}) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      "q AS (SELECT v AS qv FROM e ORDER BY vec_id LIMIT 1), " +
      s"cb AS (SELECT vec_id, v, ${bucketOf("v")} AS bucket FROM e), " +
      s"qb AS (SELECT qv, ${bucketOf("qv")} AS qbucket FROM q) " +
      "SELECT cb.vec_id, round(list_dot_product(cb.v, qb.qv) / " +
      "(sqrt(list_dot_product(cb.v, cb.v)) * sqrt(list_dot_product(qb.qv, qb.qv))), 6) AS cos " +
      "FROM cb, qb WHERE cb.bucket = qb.qbucket ORDER BY cos DESC, vec_id LIMIT 20"
  }

  /** DuckDB mirror of q_ann_lsh_multiprobe: probe list = query bucket plus
    * each single-bit flip (xor with 1<<p). */
  private def lshMultiProbeOracle: String = {
    val bucketOf = (v: String) => (0 until 8).map { p =>
      s"(CASE WHEN list_dot_product($v, ${planeLiteral(p, 64)}) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      "q AS (SELECT v AS qv FROM e ORDER BY vec_id LIMIT 1), " +
      s"cb AS (SELECT vec_id, v, ${bucketOf("v")} AS bucket FROM e), " +
      s"qb AS (SELECT qv, ${bucketOf("qv")} AS qbucket FROM q), " +
      "pr AS (SELECT qv, qbucket AS probe FROM qb " +
      (0 until 8).map(p => s"UNION ALL SELECT qv, xor(qbucket, ${1L << p}) FROM qb")
        .mkString(" ") + ") " +
      "SELECT cb.vec_id, round(list_dot_product(cb.v, pr.qv) / " +
      "(sqrt(list_dot_product(cb.v, cb.v)) * sqrt(list_dot_product(pr.qv, pr.qv))), 6) AS cos " +
      "FROM cb JOIN pr ON cb.bucket = pr.probe ORDER BY cos DESC, vec_id LIMIT 20"
  }

  private val annCosineOracle: String =
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      "q AS (SELECT v AS qv FROM e ORDER BY vec_id LIMIT 1) " +
      "SELECT e.vec_id, round(list_dot_product(e.v, q.qv) / " +
      "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos " +
      "FROM e, q ORDER BY cos DESC, vec_id LIMIT 20"

  private val ivfOracle: String =
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      "c AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8), " +
      "d AS (SELECT e.vec_id, e.v, c.cid, " +
      "list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv) + list_dot_product(c.cv, c.cv) AS dist " +
      "FROM e CROSS JOIN c), " +
      "a AS (SELECT vec_id, v, cid AS cell FROM " +
      "(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d) WHERE rn = 1), " +
      "q AS (SELECT cell, v AS qv FROM a ORDER BY vec_id LIMIT 1) " +
      "SELECT a.vec_id, round(list_dot_product(a.v, q.qv) / " +
      "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos " +
      "FROM a JOIN q ON a.cell = q.cell ORDER BY cos DESC, vec_id LIMIT 20"

  /** Multi-probe IVF: same assignment CTEs as q_ann_ivf, but the query
    * keeps its 2 nearest centroids (ORDER BY dist, cid LIMIT 2) as probes. */
  private val ivfMultiProbeOracle: String =
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      "c AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8), " +
      "d AS (SELECT e.vec_id, e.v, c.cid, " +
      "list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv) + list_dot_product(c.cv, c.cv) AS dist " +
      "FROM e CROSS JOIN c), " +
      "a AS (SELECT vec_id, v, cid AS cell FROM " +
      "(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d) WHERE rn = 1), " +
      "q AS (SELECT vec_id, v AS qv FROM e ORDER BY vec_id LIMIT 1), " +
      "qp AS (SELECT d.cid AS cell, q.qv FROM q JOIN d ON d.vec_id = q.vec_id " +
      "ORDER BY d.dist, d.cid LIMIT 2) " +
      "SELECT a.vec_id, round(list_dot_product(a.v, qp.qv) / " +
      "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(qp.qv, qp.qv))), 6) AS cos " +
      "FROM a JOIN qp ON a.cell = qp.cell ORDER BY cos DESC, vec_id LIMIT 20"

  /** DuckDB mirror of q_ann_lsh_multitable: 4 tables × 4 planes (table t
    * uses plane family offset 4t), candidate union deduplicated before
    * the top-k. */
  private def lshMultiTableOracle: String = {
    val bucketOf = (v: String, t: Int) => (0 until 4).map { i =>
      s"(CASE WHEN list_dot_product($v, ${planeLiteral(t * 4 + i, 64)}) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    val cbs = (0 until 4).map(t =>
      s"SELECT vec_id, v, $t AS tbl, ${bucketOf("v", t)} AS bkt FROM e").mkString(" UNION ALL ")
    val qbs = (0 until 4).map(t =>
      s"SELECT qv, $t AS tbl, ${bucketOf("qv", t)} AS bkt FROM q").mkString(" UNION ALL ")
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      "q AS (SELECT v AS qv FROM e ORDER BY vec_id LIMIT 1), " +
      s"cb AS ($cbs), qb AS ($qbs) " +
      "SELECT vec_id, cos FROM (SELECT DISTINCT cb.vec_id, " +
      "round(list_dot_product(cb.v, qb.qv) / " +
      "(sqrt(list_dot_product(cb.v, cb.v)) * sqrt(list_dot_product(qb.qv, qb.qv))), 6) AS cos " +
      "FROM cb JOIN qb ON cb.tbl = qb.tbl AND cb.bkt = qb.bkt) " +
      "ORDER BY cos DESC, vec_id LIMIT 20"
  }

  /** DuckDB mirror of q_ann_recall: each variant's oracle SELECT nests as
    * a subquery; recall = |variant top-20 ∩ brute-force top-20| / 20. */
  private def annRecallOracle: String = {
    val variants = Seq(
      "ann_ivf" -> ivfOracle,
      "ann_ivf_indexed" -> ivfOracle, // persisted index, same assignment
      "ann_ivf_kmeans" -> kmeansIvfOracle,
      "ann_ivf_kmeans_multiprobe" -> kmeansIvfMultiProbeOracle,
      "ann_ivf_multiprobe" -> ivfMultiProbeOracle,
      "ann_lsh" -> lshOracle,
      "ann_lsh_multiprobe" -> lshMultiProbeOracle,
      "ann_lsh_multitable" -> lshMultiTableOracle,
      "ann_pq" -> pqOracle)
    val rows = variants.map { case (name, sql) =>
      s"SELECT '$name' AS variant, (SELECT round(CAST(count(*) AS DOUBLE) / 20.0, 6) " +
        s"FROM ($sql) vv WHERE vv.vec_id IN (SELECT vec_id FROM ($annCosineOracle) gg)) AS recall"
    }.mkString(" UNION ALL ")
    s"SELECT variant, recall FROM ($rows) ORDER BY variant"
  }

  /** DuckDB mirror of q_ann_ivf_kmeans: 3 unrolled Lloyd rounds. The
    * distance is the SAME algebraic form as Similarity.sqDist's sequential
    * (x−y)² fold (not the dot-product expansion) so float values track the
    * Spark side bit-for-bit through the iteration chain; means mirror the
    * DECIMAL(28,14) exact sums + 9-dp rounding of kmeansCentroids. */
  /** Shared CTE chain for the k-means oracles: 3 unrolled Lloyd rounds
    * ending in `df` (distances to the final centroids) and `af` (final
    * assignments). */
  private def kmeansCtes: String = {
    def dist(v: String, cv: String) =
      s"list_sum(list_transform(range(1, 65), i -> ($v[i] - $cv[i]) * ($v[i] - $cv[i])))"
    val sb = new StringBuilder
    sb ++= "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    sb ++= "c0 AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8), "
    for (t <- 1 to 3) {
      sb ++= s"d$t AS (SELECT e.vec_id, e.v, c.cid, ${dist("e.v", "c.cv")} AS dist " +
        s"FROM e CROSS JOIN c${t - 1} c), "
      sb ++= s"a$t AS (SELECT vec_id, v, cid AS cell FROM (SELECT *, " +
        s"row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d$t) WHERE rn = 1), "
      sb ++= s"m$t AS (SELECT cell, i, round(CAST(sum(CAST(v[i] AS DECIMAL(28,14))) AS DOUBLE) " +
        s"/ count(*), 9) AS mv FROM a$t, range(1, 65) AS r(i) GROUP BY cell, i), "
      sb ++= s"c$t AS (SELECT cell AS cid, list(mv ORDER BY i) AS cv FROM m$t GROUP BY cell), "
    }
    sb ++= s"df AS (SELECT e.vec_id, e.v, c.cid, ${dist("e.v", "c.cv")} AS dist " +
      "FROM e CROSS JOIN c3 c), "
    sb ++= "af AS (SELECT vec_id, v, cid AS cell FROM (SELECT *, " +
      "row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM df) WHERE rn = 1)"
    sb.toString
  }

  private def kmeansIvfOracle: String =
    kmeansCtes + ", q AS (SELECT cell, v AS qv FROM af ORDER BY vec_id LIMIT 1) " +
      "SELECT af.vec_id, round(list_dot_product(af.v, q.qv) / " +
      "(sqrt(list_dot_product(af.v, af.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos " +
      "FROM af JOIN q ON af.cell = q.cell ORDER BY cos DESC, vec_id LIMIT 20"

  /** k-means + multi-probe: the query probes its 2 nearest FINAL centroids
    * (ORDER BY dist, cid LIMIT 2 over `df`, mirroring the Spark side's
    * sorted (d, cid) struct slice). */
  private def kmeansIvfMultiProbeOracle: String =
    kmeansCtes + ", q AS (SELECT vec_id, v AS qv FROM e ORDER BY vec_id LIMIT 1), " +
      "qp AS (SELECT df.cid AS cell, q.qv FROM q JOIN df ON df.vec_id = q.vec_id " +
      "ORDER BY df.dist, df.cid LIMIT 2) " +
      "SELECT af.vec_id, round(list_dot_product(af.v, qp.qv) / " +
      "(sqrt(list_dot_product(af.v, af.v)) * sqrt(list_dot_product(qp.qv, qp.qv))), 6) AS cos " +
      "FROM af JOIN qp ON af.cell = qp.cell ORDER BY cos DESC, vec_id LIMIT 20"

  /** Mirror of Similarity.dimTradeoffRecall (k=20, prefixes 8/16/32/64):
    * per prefix length, the same truncated-cosine top-20 with (cos DESC,
    * vec_id) cut order; recall = overlap with the full-64 cut / 20, with
    * a zero-hit prefix still reporting 0.0. */
  private def dimTradeoffOracle: String = {
    def cosD(d: Int) = {
      val sl = (v: String) => s"list_transform(range(1, ${d + 1}), i -> $v[i])"
      s"round(list_dot_product(${sl("e.v")}, ${sl("q.qv")}) / " +
        s"(sqrt(list_dot_product(${sl("e.v")}, ${sl("e.v")})) * " +
        s"sqrt(list_dot_product(${sl("q.qv")}, ${sl("q.qv")}))), 6)"
    }
    def topk(d: Int) =
      s"SELECT vec_id FROM (SELECT e.vec_id, ${cosD(d)} AS cos " +
        "FROM e CROSS JOIN q ORDER BY cos DESC, e.vec_id LIMIT 20)"
    val rows = Seq(8, 16, 32, 64).map { d =>
      s"SELECT CAST($d AS BIGINT) AS dims, (SELECT round(CAST(count(*) AS DOUBLE) / 20.0, 6) " +
        s"FROM (${topk(d)}) t WHERE t.vec_id IN (SELECT vec_id FROM gt)) AS recall"
    }.mkString(" UNION ALL ")
    "WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      "q AS MATERIALIZED (SELECT v AS qv FROM e ORDER BY vec_id LIMIT 1), " +
      s"gt AS MATERIALIZED (${topk(64)}) " +
      s"SELECT dims, recall FROM ($rows) ORDER BY dims"
  }

  /** Mirror of Similarity.pqTopK (m=8, kPerSub=8, 3 Lloyd rounds,
    * rerank=50, k=20): per-subspace unrolled k-means with the same
    * DECIMAL(28,14)/round-9 means and (dist, cid) tie order, codes from
    * the final codebooks, ADC = per-(vec, subspace) LUT contributions
    * summed through DECIMAL(28,14) (exact — fold order irrelevant, so
    * Spark's expression fold and this relational sum agree), candidate
    * cut (adc, vec_id) LIMIT 50, exact-cosine rerank. Scan-derived and
    * multiply-referenced CTEs are MATERIALIZED ([[kcoreOracle]]'s
    * fd-exhaustion lesson). */
  private def pqOracle: String = {
    def dist(v: String, cv: String) =
      s"list_sum(list_transform(range(1, 9), i -> ($v[i] - $cv[i]) * ($v[i] - $cv[i])))"
    val sb = new StringBuilder
    sb ++= "WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    sb ++= "sub AS MATERIALIZED (SELECT vec_id, j, " +
      "list_transform(range(1, 9), i -> v[j * 8 + i]) AS sv " +
      "FROM e, range(0, 8) AS r(j)), "
    sb ++= "c0 AS MATERIALIZED (SELECT j, vec_id AS cid, sv AS cv FROM sub " +
      "WHERE vec_id IN (SELECT vec_id FROM e ORDER BY vec_id LIMIT 8)), "
    for (t <- 1 to 3) {
      sb ++= s"d$t AS (SELECT s.vec_id, s.j, s.sv, c.cid, " +
        s"${dist("s.sv", "c.cv")} AS dist FROM sub s JOIN c${t - 1} c ON c.j = s.j), "
      sb ++= s"a$t AS MATERIALIZED (SELECT vec_id, j, sv, cid AS cell FROM " +
        s"(SELECT *, row_number() OVER (PARTITION BY vec_id, j " +
        s"ORDER BY dist, cid) AS rn FROM d$t) WHERE rn = 1), "
      sb ++= s"m$t AS (SELECT j, cell, i, " +
        s"round(CAST(sum(CAST(sv[i] AS DECIMAL(28,14))) AS DOUBLE) " +
        s"/ count(*), 9) AS mv FROM a$t, range(1, 9) AS r(i) GROUP BY j, cell, i), "
      sb ++= s"c$t AS MATERIALIZED (SELECT j, cell AS cid, " +
        s"list(mv ORDER BY i) AS cv FROM m$t GROUP BY j, cell), "
    }
    sb ++= s"fd AS (SELECT s.vec_id, s.j, c.cid, ${dist("s.sv", "c.cv")} AS dist " +
      "FROM sub s JOIN c3 c ON c.j = s.j), "
    sb ++= "codes AS MATERIALIZED (SELECT vec_id, j, cid AS code FROM " +
      "(SELECT *, row_number() OVER (PARTITION BY vec_id, j " +
      "ORDER BY dist, cid) AS rn FROM fd) WHERE rn = 1), "
    sb ++= "q AS MATERIALIZED (SELECT v AS qv FROM e ORDER BY vec_id LIMIT 1), "
    sb ++= "qsub AS (SELECT j, list_transform(range(1, 9), i -> qv[j * 8 + i]) AS qs " +
      "FROM q, range(0, 8) AS r(j)), "
    sb ++= s"lut AS MATERIALIZED (SELECT c.j, c.cid, ${dist("qs.qs", "c.cv")} AS d " +
      "FROM c3 c JOIN qsub qs ON qs.j = c.j), "
    sb ++= "adc AS (SELECT codes.vec_id, " +
      "CAST(sum(CAST(lut.d AS DECIMAL(28,14))) AS DOUBLE) AS adc " +
      "FROM codes JOIN lut ON lut.j = codes.j AND lut.cid = codes.code " +
      "GROUP BY 1), "
    sb ++= "cand AS (SELECT vec_id FROM adc ORDER BY adc, vec_id LIMIT 50) "
    sb ++= "SELECT e.vec_id, round(list_dot_product(e.v, q.qv) / " +
      "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos " +
      "FROM e JOIN cand USING (vec_id) CROSS JOIN q " +
      "ORDER BY cos DESC, vec_id LIMIT 20"
    sb.toString
  }

  /** DuckDB mirror of q_neardup_embedding: 4-plane LSH bucket self-join,
    * cosine ≥ 0.3 on the 6-dp-rounded value. */
  private def neardupOracle: String = {
    val bucketOf = (v: String) => (0 until 4).map { p =>
      s"(CASE WHEN list_dot_product($v, ${planeLiteral(p, 64)}) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      s"cb AS (SELECT vec_id, v, ${bucketOf("v")} AS bucket FROM e) " +
      "SELECT * FROM (SELECT a.vec_id AS id1, b.vec_id AS id2, " +
      "round(list_dot_product(a.v, b.v) / " +
      "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos " +
      "FROM cb a JOIN cb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) " +
      "WHERE cos >= 0.3 ORDER BY id1, id2"
  }

  /** Shared oracle for q_parse_dollars and q_parse_dollars_native (the
    * when-chain and native-Expression implementations must agree with the
    * same SQL). */
  private val parseDollarsOracle: String =
    "WITH t AS (SELECT p_partkey, CASE CAST(p_size % 3 AS INT) " +
      "WHEN 0 THEN '$' || p_size || ' million' " +
      "WHEN 1 THEN '$' || p_size || '.5 billion' " +
      "ELSE '$' || (p_size * 1000) END AS raw FROM part) " +
      "SELECT p_partkey, raw, CASE " +
      "WHEN regexp_matches(raw, '(?i)\\$\\s*\\d+(\\.\\d+)?\\s*milli?on') " +
      "THEN CAST(regexp_extract(raw, '(?i)\\$\\s*(\\d+(?:\\.\\d+)?)\\s*milli?on', 1) AS DOUBLE) * 1e6 " +
      "WHEN regexp_matches(raw, '(?i)\\$\\s*\\d+(\\.\\d+)?\\s*billion') " +
      "THEN CAST(regexp_extract(raw, '(?i)\\$\\s*(\\d+(?:\\.\\d+)?)\\s*billion', 1) AS DOUBLE) * 1e9 " +
      "WHEN regexp_matches(raw, '\\$\\s*\\d{1,3}([,.]\\d{3})+') " +
      "THEN CAST(regexp_replace(regexp_extract(raw, '\\$\\s*(\\d{1,3}(?:[,.]\\d{3})+)', 1), '[,.]', '', 'g') AS DOUBLE) " +
      "WHEN regexp_matches(raw, '\\$\\s*\\d+(\\.\\d+)?') " +
      "THEN CAST(regexp_extract(raw, '\\$\\s*(\\d+(?:\\.\\d+)?)', 1) AS DOUBLE) " +
      "ELSE NULL END AS amount FROM t ORDER BY p_partkey"

  /** Shared DuckDB CTE chain mirroring ScaleDedup.minhashCandidatePairs
    * (4 hashes, 2 bands, oversized buckets > 64 dropped before the band
    * self-join): yields `t` (doc_id, toks) and `pairs` (id1, id2).
    * Parameterized by the source relation so composites can run the pair
    * pipeline over an upstream CTE instead of the raw table. */
  private def mhPairsCtesOver(tbl: String): String =
    s"t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM $tbl), " +
      s"sig AS (SELECT doc_id, ${mhExpr(0)} AS mh_0, ${mhExpr(1)} AS mh_1, " +
      s"${mhExpr(2)} AS mh_2, ${mhExpr(3)} AS mh_3 FROM t), " +
      "b AS (SELECT doc_id, 0 AS band, mh_0 || '_' || mh_1 AS bkey FROM sig " +
      "UNION ALL SELECT doc_id, 1 AS band, mh_2 || '_' || mh_3 AS bkey FROM sig), " +
      "bg AS (SELECT doc_id, band, bkey FROM b " +
      "QUALIFY count(*) OVER (PARTITION BY band, bkey) <= 64), " +
      "pairs AS (SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2 FROM bg x JOIN bg y " +
      "ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)"

  private def mhPairsCtes: String = mhPairsCtesOver("documents")

  /** Shared DuckDB CTE chain mirroring Stats.logisticBeta (3 Newton
    * steps over the documents feature table): yields `f` (doc_id, y,
    * x1, x2) and `bb3` (the fitted one-row 9-dp β). Each step is a
    * p-projection CTE over f × the previous one-row β, an integer-pair
    * moment CTE + rebuild, and a Cramer 3×3 update CTE — textually the
    * same fixed parenthesization as the Spark side. */
  private def logisticCtes: String = logisticCtesFor(
    // mirror the engine's null-feature drop (logisticFit2 filters rows
    // where y/x1/x2 is NULL): NULL lang nulls y, NULL text nulls x1,
    // NULL n_chars (or text) nulls x2 — without this the oracle would
    // keep NULL-lang docs as y=0 training rows. x1 = pin9(pln(1+tokens))
    // comes from the INJECTED literal grid (round 14, lnGridCte) — the
    // integer-domain covariate is never computed by an engine.
    lnGridCte + ", " +
      "f AS (SELECT doc_id, " +
      "CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y, " +
      s"${lnGridXSql("d.nk")} AS x1, " +
      s"${graft.functions.PortableMathSql.pin9Sql(
        "(CAST(n_chars AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE))")} AS x2 FROM " +
      "(SELECT doc_id, lang, text, n_chars, " +
      "1 + len(string_split(text, ' ')) AS nk FROM documents " +
      "WHERE lang IS NOT NULL AND text IS NOT NULL AND n_chars IS NOT NULL) d " +
      "LEFT JOIN lng g ON d.nk = g.gk)")

  /** The 3-step Newton chain over a caller-supplied `f` CTE (must expose
    * y, x1, x2; extra columns ride along untouched) — ends at bb3, the
    * fitted one-row 9-dp β. Shared by the quality-classifier mirrors
    * (documents features) and the PSM mirror (per-user features). */
  private def logisticCtesFor(fCte: String): String = {
    val pm = graft.functions.PortableMathSql
    def newtonStep(i: Int): String = {
      val prev = if (i == 1) "b0t" else s"bb${i - 1}"
      val det = "(h00 * (h11 * h22 - h12 * h12) - h01 * (h01 * h22 - h12 * h02) + " +
        "h02 * (h01 * h12 - h11 * h02))"
      // portable-kernel sigmoid, OUTPUT pinned via the portable
      // floor-ladder (Stats.logisticP's round-13 stance); the
      // gradient/Hessian moments are exact DECIMAL(38,0) integer PAIR
      // sums rebuilt H + L/1e9 — no engine round(), no DECIMAL↔DOUBLE
      // cast of a non-integer value anywhere in the chain
      s"p$i AS (SELECT y, x1, x2, b0, b1, b2, " +
        s"${pm.pin9Sql("(1.0 / (1.0 + __ps))")} AS p FROM " +
        pm.expFrom(
          s"(SELECT f.y, f.x1, f.x2, b.b0, b.b1, b.b2 FROM f, $prev b)",
          "-(b0 + b1 * x1 + b2 * x2)", "__ps", s"ls$i") +
        s" ls${i}w), " +
        s"m$i AS (SELECT max(b0) AS pb0, max(b1) AS pb1, max(b2) AS pb2, " +
        pm.pairSumSql("(y - p)", "g0") + ", " +
        pm.pairSumSql("((y - p) * x1)", "g1") + ", " +
        pm.pairSumSql("((y - p) * x2)", "g2") + ", " +
        pm.pairSumSql("(p * (1.0 - p))", "h00") + ", " +
        pm.pairSumSql("(p * (1.0 - p) * x1)", "h01") + ", " +
        pm.pairSumSql("(p * (1.0 - p) * x2)", "h02") + ", " +
        pm.pairSumSql("(p * (1.0 - p) * x1 * x1)", "h11") + ", " +
        pm.pairSumSql("(p * (1.0 - p) * x1 * x2)", "h12") + ", " +
        pm.pairSumSql("(p * (1.0 - p) * x2 * x2)", "h22") +
        s" FROM p$i), " +
        s"r$i AS (SELECT pb0, pb1, pb2, " +
        Seq("g0", "g1", "g2", "h00", "h01", "h02", "h11", "h12", "h22")
          .map(n => s"${pm.pairValSql(n)} AS $n").mkString(", ") +
        s" FROM m$i), " +
        s"u$i AS (SELECT " +
        "pb0 + (g0 * (h11 * h22 - h12 * h12) - h01 * (g1 * h22 - h12 * g2) + " +
        s"h02 * (g1 * h12 - h11 * g2)) / $det AS u0, " +
        "pb1 + (h00 * (g1 * h22 - h12 * g2) - g0 * (h01 * h22 - h12 * h02) + " +
        s"h02 * (h01 * g2 - g1 * h02)) / $det AS u1, " +
        "pb2 + (h00 * (h11 * g2 - g1 * h12) - h01 * (h01 * g2 - g1 * h02) + " +
        s"g0 * (h01 * h12 - h11 * h02)) / $det AS u2 " +
        s"FROM r$i), " +
        s"bb$i AS (SELECT ${pm.pin9Sql("u0")} AS b0, " +
        s"${pm.pin9Sql("u1")} AS b1, ${pm.pin9Sql("u2")} AS b2 FROM u$i)"
    }
    "WITH " + fCte + ", " +
      "b0t AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2), " +
      newtonStep(1) + ", " + newtonStep(2) + ", " + newtonStep(3)
  }

  /** Mirror of Stats.psmAtt over per-user event features: the shared
    * Newton chain on (treat, x1, x2), 6-dp propensities off bb3, the
    * brute-force caliper pair set (the engine's bucketed join must equal
    * it), (|Δp|, control-id) 1-NN, DECIMAL ATT / naive sums. */
  private def psmAttOracle: String = {
    val pm = graft.functions.PortableMathSql
    val fInner = pm.lnFrom(pm.lnFrom(
      "(SELECT user_id, tv, ne, conv FROM (SELECT user_id, " +
        "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS tv, " +
        "count(*) AS ne, " +
        "max(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END) AS conv " +
        "FROM events GROUP BY 1) pvi WHERE tv IS NOT NULL)",
      "1.0 + tv", "__plv", "pv"),
      "1.0 + CAST(ne AS DOUBLE)", "__plw", "pw")
    val scInner = pm.expFrom(
      "(SELECT f.uid, f.y, f.conv, f.x1, f.x2, b.b0, b.b1, b.b2 FROM f, bb3 b)",
      "-(b0 + b1 * x1 + b2 * x2)", "__ps", "pss")
    logisticCtesFor(
      "f AS (SELECT user_id AS uid, " +
        "CASE WHEN user_id % 10 < 3 THEN 1.0 ELSE 0.0 END AS y, conv, " +
        s"${pm.pin9Sql("__plv")} AS x1, " +
        s"${pm.pin9Sql("__plw")} AS x2 FROM $fInner pww)") +
      // portable pin9 sigmoid then pin6 propensity (Stats.psmAtt's
      // round-13 stance)
      ", sc0 AS (SELECT uid, y, conv, " +
      s"${pm.pin9Sql("(1.0 / (1.0 + __ps))")} AS p9 " +
      s"FROM $scInner pssw), " +
      "sc AS (SELECT uid, y AS t, conv AS yy, " +
      s"${pm.pin6Sql("p9")} AS p FROM sc0), " +
      "pr AS (SELECT a.uid AS tid, a.yy AS yt, c.uid AS cid, c.yy AS yc, " +
      "abs(a.p - c.p) AS dd FROM sc a JOIN sc c " +
      "ON a.t = 1.0 AND c.t = 0.0 AND abs(a.p - c.p) <= 0.05), " +
      "bm AS (SELECT tid, yt, yc FROM (SELECT pr.*, row_number() OVER " +
      "(PARTITION BY tid ORDER BY dd, cid) AS rn FROM pr) WHERE rn = 1), " +
      "cnt AS (SELECT " +
      "CAST(sum(CASE WHEN t = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_treated, " +
      "CAST(sum(CASE WHEN t = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_control, " +
      "CAST(sum(CASE WHEN t = 1.0 THEN CAST(yy AS DECIMAL(28,8)) END) AS DOUBLE) AS st, " +
      "CAST(sum(CASE WHEN t = 0.0 THEN CAST(yy AS DECIMAL(28,8)) END) AS DOUBLE) AS s_c " +
      "FROM sc), " +
      "at2 AS (SELECT count(*) AS n_matched, " +
      "CAST(sum(CAST(yt - yc AS DECIMAL(28,8))) AS DOUBLE) AS sd FROM bm) " +
      "SELECT n_treated, n_control, n_matched, " +
      "round(sd / n_matched, 6) + 0.0 AS att, " +
      "round(st / n_treated - s_c / n_control, 6) + 0.0 AS naive_diff " +
      "FROM cnt, at2"
  }

  private def logisticQualityOracle: String = {
    val pm = graft.functions.PortableMathSql
    val finInner = pm.expFrom(
      "(SELECT f.y, f.x1, f.x2, b.b0, b.b1, b.b2 FROM f, bb3 b)",
      "-(b0 + b1 * x1 + b2 * x2)", "__ps", "lq")
    val clInner = pm.lnFrom(pm.lnFrom("cl", "q", "__plq", "la"),
      "1.0 - q", "__plr", "lb")
    logisticCtes + ", " +
      "fin AS (SELECT y, b0, b1, b2, " +
      s"${pm.pin9Sql("(1.0 / (1.0 + __ps))")} AS p FROM $finInner lqw), " +
      "cl AS (SELECT y, b0, b1, b2, p, least(greatest(p, 1e-6), 1.0 - 1e-6) AS q " +
      "FROM fin), " +
      // loss term: portable 9-dp pin of the per-row ln mix, then exact
      // integer pair sums (Stats.logisticFit2's round-13 stance); the
      // 6-dp readouts are the portable floor-ladder (never −0.0, so no
      // `+ 0.0` normalization needed)
      "cl2 AS (SELECT y, b0, b1, b2, p, " +
      s"${pm.pin9Sql("(-(y * __plq + (1.0 - y) * __plr))")} AS lt " +
      s"FROM $clInner lbw), " +
      "fagg AS (SELECT count(*) AS n, max(b0) AS fb0, max(b1) AS fb1, " +
      s"max(b2) AS fb2, ${pm.pairSumSql("lt", "ls")}, " +
      "sum(CASE WHEN (p >= 0.5) = (y >= 0.5) THEN 1 ELSE 0 END) AS ok " +
      "FROM cl2) " +
      "SELECT CAST(n AS BIGINT) AS n, " +
      s"${pm.pin6Sql("fb0")} AS b0, ${pm.pin6Sql("fb1")} AS b1, " +
      s"${pm.pin6Sql("fb2")} AS b2, " +
      s"${pm.pin6Sql(s"(${pm.pairValSql("ls")} / CAST(n AS DOUBLE))")} AS log_loss, " +
      s"${pm.pin6Sql("(CAST(ok AS DOUBLE) / CAST(n AS DOUBLE))")} AS accuracy " +
      "FROM fagg"
  }

  /** Exact bit-decomposition for the q_portable_* parity probes —
    * hoisted to [[graft.functions.PortableMath.bitChunks]] (round-15
    * ADVICE: one DataFrame chunk ladder beside its SQL mirror
    * PortableMathSql.chunkFrom, not three hand-maintained twins). */
  private def bitChunks(df: DataFrame, v: String, p: String): DataFrame =
    graft.functions.PortableMath.bitChunks(df, v, p)

  /** Round-14 closure of the rounds-10..13 q_cox_ph driver red: the cox
    * covariate pin9(pln(k)) over the small integer domain k = per-user
    * event count is computed ONCE here on the JVM kernel and injected
    * into BOTH engines as the SAME IEEE doubles (the ewmaWeights
    * literal-injection stance) — Spark reads `element_at` of this array
    * literal, the oracle inlines shortest-round-trip literals in a
    * VALUES grid ([[coxGridCte]]). The covariate is never COMPUTED on
    * an engine again, so the r13 q_cox_diag_x divergence (a ±1e-9-
    * quantum covariate perturbation on the driver's DuckDB build, β
    * ladder green, input digest red) becomes impossible by
    * construction rather than merely unlikely. */
  private val CoxGridMax = 256
  private lazy val coxGridXs: Array[Double] = {
    val K = graft.functions.PortableMathKernel
    Array.tabulate(CoxGridMax)(i => K.pin9(K.pln((i + 1).toDouble)))
  }
  /** Grid lookup with a LOUD overflow guard (na beyond the grid must
    * fail, never silently drop or fall back to an engine kernel). */
  private def coxGridX(na: Column): Column =
    when(na <= lit(CoxGridMax.toLong),
      element_at(lit(coxGridXs), na.cast("int")))
      .otherwise(raise_error(concat(
        lit(s"cox covariate grid overflow (max $CoxGridMax): na="),
        na.cast("string"))))
  /** DuckDB twin: `cxg(k, x)` VALUES grid of the same doubles. */
  private def coxGridCte: String = {
    val rows = coxGridXs.zipWithIndex.map { case (x, i) =>
      s"(${i + 1}, ${graft.functions.PortableMathSql.lit(x)})"
    }.mkString(", ")
    s"cxg(k, x) AS (VALUES $rows)"
  }
  /** DuckDB-side guarded covariate: LEFT JOIN miss (na > grid) errors
    * loudly via a data-dependent string→DOUBLE cast (CASE branches are
    * lazily evaluated, so in-grid rows never touch it). */
  private def coxGridXSql: String =
    "(CASE WHEN g.k IS NULL THEN " +
      "CAST('cox covariate grid overflow' AS DOUBLE) ELSE g.x END)"

  /** The cox grid's sibling for the OTHER integer-domain fit
    * covariates (round-13 VERDICT next-round #1 tail): q_gmm_doclen's
    * pin9(pln(1+n_chars)) and the quality classifier's
    * pin9(pln(1+n_tokens)) — same hazard class, green on the driver by
    * build-luck only. k = 1+n_chars tops out ~578 and 1+n_tokens ~101
    * at sf0.1; 2048 gives ~3.5× headroom with the same loud overflow
    * guard. q_psm_att's x1 = pin9(pln(1+Σvalue)) is NOT enumerable
    * (non-integer sum) and stays kernel-computed on both engines — the
    * one remaining computed-twice covariate, documented in BASELINE. */
  private val LnGridMax = 2048
  private lazy val lnGridXs: Array[Double] = {
    val K = graft.functions.PortableMathKernel
    Array.tabulate(LnGridMax)(i => K.pin9(K.pln((i + 1).toDouble)))
  }
  /** Null-safe grid lookup (a null k must stay null for the fits' own
    * null-feature drop, never hit the overflow guard). */
  private def lnGridX(k: Column, what: String): Column =
    when(k.isNull, lit(null).cast("double"))
      .when(k <= lit(LnGridMax.toLong),
        element_at(lit(lnGridXs), k.cast("int")))
      .otherwise(raise_error(concat(
        lit(s"$what: pln covariate grid overflow (max $LnGridMax): k="),
        k.cast("string"))))
  /** DuckDB twin: `lng(gk, gx)` VALUES grid of the same doubles
    * (column names collision-proof against the fits' own k/x). */
  private def lnGridCte: String = {
    val rows = lnGridXs.zipWithIndex.map { case (x, i) =>
      s"(${i + 1}, ${graft.functions.PortableMathSql.lit(x)})"
    }.mkString(", ")
    s"lng(gk, gx) AS (VALUES $rows)"
  }
  /** DuckDB-side guarded covariate off a LEFT JOIN to lng g: null k
    * passes through (null gk AND null k), miss errors loudly. */
  private def lnGridXSql(k: String): String =
    s"(CASE WHEN $k IS NULL THEN NULL WHEN g.gk IS NULL THEN " +
      "CAST('pln covariate grid overflow' AS DOUBLE) ELSE g.gx END)"

  /** Shared q_cox_* subjects: q_survival_km's construction plus the
    * ln(events) covariate — since round 14 a [[coxGridXs]] literal
    * lookup (injected grid), NOT an engine-evaluated kernel chain; no
    * engine round() and no engine transcendental anywhere in the cox
    * value path (see Stats.coxPh's determinism note). */
  private def coxSubjects(s: org.apache.spark.sql.SparkSession,
                          d: String): DataFrame =
    Tables.events(s, d).groupBy("user_id").agg(
      min(col("ts")).alias("__first"),
      min(when(col("event_type") === "purchase", col("ts"))).alias("__conv"),
      max(col("ts")).alias("__last"),
      count(lit(1)).alias("__na"))
      .select(
        datediff(to_date(coalesce(col("__conv"), col("__last"))),
          to_date(col("__first"))).cast("long").alias("dur"),
        col("__conv").isNotNull.alias("observed"),
        coxGridX(col("__na")).alias("activity"))

  /** Shared CTE chain for q_cox_ph and the q_cox_diag_* probes: the
    * subjects (round-14: covariate from the INJECTED literal grid
    * [[coxGridCte]], not an engine-evaluated kernel), b0, and `upTo`
    * Newton iterations. Round-13 determinism rewrite, the exact mirror
    * of Stats.coxPh's: NO engine round() (portable floor-ladder pins
    * only) and NO DECIMAL↔DOUBLE cast of a non-integer value — every
    * order-sensitive sum is a PAIR of exact DECIMAL(38,0) integer sums
    * (PortableMathSql.pairSumSql) rebuilt H + L/1e9 in pure IEEE
    * (pairValSql). The old DECIMAL(38,12) suffix sums crossed 2^53
    * unscaled at S ≈ 9007, where DuckDB double-rounds the
    * decimal→double cast against Spark's single conversion, build-
    * dependently — the systematic rounds-10..12 driver red. */
  private def coxCtes(upTo: Int): String = {
    val pm = graft.functions.PortableMathSql
    // per-step risk-set moment pairs with ex = pin9(pexp(b*x)) and the
    // x·ex / x²·ex / event-x products NAMED before decomposition
    def g(name: String, prev: String, tag: String): String = {
      val inner = pm.expFrom(s"(SELECT * FROM subj CROSS JOIN $prev)",
        "b * x", "__pex", tag)
      s"$name AS (SELECT t, " +
        pm.pairSumSql("ex", "a0") + ", " +
        pm.pairSumSql("xe", "a1") + ", " +
        pm.pairSumSql("xxe", "a2") + ", " +
        "SUM(e) AS ne, " + pm.pairSumSql("sxv", "sx") + " FROM " +
        "(SELECT t, e, ex, x * ex AS xe, x * x * ex AS xxe, " +
        "CASE WHEN e = 1 THEN x ELSE 0e0 END AS sxv FROM " +
        s"(SELECT t, e, x, ${pm.pin9Sql("__pex")} AS ex FROM $inner " +
        s"${tag}w) ${tag}p) ${tag}q GROUP BY 1)"
    }
    def sWin(name: String, from: String): String =
      s"$name AS (SELECT t, ne, sxh, sxl, " +
        "SUM(a0h) OVER w AS s0h, SUM(a0l) OVER w AS s0l, " +
        "SUM(a1h) OVER w AS s1h, SUM(a1l) OVER w AS s1l, " +
        "SUM(a2h) OVER w AS s2h, SUM(a2l) OVER w AS s2l " +
        s"FROM $from WINDOW w AS (ORDER BY t ROWS BETWEEN CURRENT ROW " +
        "AND UNBOUNDED FOLLOWING))"
    def iter(k: Int): String = {
      val prev = s"b${k - 1}"
      g(s"g$k", prev, s"pe$k") + ", " + sWin(s"s$k", s"g$k") + ", " +
        s"u$k AS (SELECT ${pm.pairSumSql("ut", "u")}, " +
        s"${pm.pairSumSql("it", "i")} FROM " +
        s"(SELECT ${coxUTermSql} AS ut, ${coxITermSql} AS it " +
        s"FROM s$k WHERE ne > 0) uq$k), " +
        s"b$k AS (SELECT ${pm.pin9Sql("bn")} AS b FROM " +
        s"(SELECT b + ${pm.pairValSql("u")} / ${pm.pairValSql("i")} AS bn " +
        s"FROM u$k CROSS JOIN $prev) bq$k)"
    }
    "WITH s AS (SELECT user_id, min(ts) AS f, " +
      "min(CASE WHEN event_type = 'purchase' THEN ts END) AS c, " +
      "max(ts) AS l, count(*) AS na FROM events GROUP BY 1), " +
      // round 14: covariate from the injected literal grid (coxGridCte)
      // — identical IEEE doubles to the Spark side by construction
      s"$coxGridCte, " +
      "subj AS (SELECT CAST(date_diff('day', CAST(f AS DATE), " +
      "CAST(coalesce(c, l) AS DATE)) AS BIGINT) AS t, " +
      "CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END AS e, " +
      s"$coxGridXSql AS x FROM s LEFT JOIN cxg g ON s.na = g.k), " +
      "b0 AS (SELECT 0e0 AS b)" +
      (if (upTo >= 1) (1 to upTo).map(iter).mkString(", ", ", ", "")
       else "")
  }
  /** Mirrors of Stats.coxUTerm / coxITerm over an s$k window CTE —
    * parenthesization pinned to the Spark trees. */
  private def coxUTermSql: String = {
    val pm = graft.functions.PortableMathSql
    s"${pm.pairValSql("sx")} - CAST(ne AS DOUBLE) * " +
      s"(${pm.pairValSql("s1")} / ${pm.pairValSql("s0")})"
  }
  private def coxITermSql: String = {
    val pm = graft.functions.PortableMathSql
    val r1 = s"${pm.pairValSql("s1")} / ${pm.pairValSql("s0")}"
    s"CAST(ne AS DOUBLE) * (${pm.pairValSql("s2")} / " +
      s"${pm.pairValSql("s0")} - ($r1) * ($r1))"
  }

  /** DuckDB mirror of Stats.coxPh over the q_survival_km subjects plus
    * the ln(events) covariate: coxCtes(3) then the final risk pass and
    * the pin6 readouts — the whole value path engine-function-free
    * (portable exp/ln kernel, portable floor-ladder pins, exact
    * integer pair sums; see coxCtes). Round 17: `cols` selects the
    * registry row's readout (VERDICT r16 #4 split — q_cox_ph carries
    * the practitioner columns, q_cox_loglik the loglik scalar), and
    * n_events is CAST AS BIGINT — the uncast SUM-of-integers was
    * DuckDB HUGEINT on the wire, the r15-proven wide-integer driver
    * dump class and the ACTUAL rounds-10..16 q_cox_ph red (values
    * never diverged; see Stats.coxPh's post-mortem note). */
  private def coxReadoutOracle(cols: Seq[String]): String = {
    val pm = graft.functions.PortableMathSql
    // Round 16 (VERDICT r15 #3): carry-normalized rebuild, mirroring
    // Stats.coxPh's pairValNorm — the pln argument is now in the
    // k + q/1e9, q < 1e9 shape the parity probes cover.
    val s0v = pm.pairValNormSql("s0")
    val lnS0 = pm.lnFrom("sf", s0v, "__plns", "pf")
    val hazInner = pm.expFrom("(SELECT * FROM nn CROSS JOIN lf CROSS JOIN b3)",
      "b", "__peb", "pz")
    val items = Map(
      "n" -> "n",
      "n_events" -> "n_events",
      "beta" -> s"${pm.pin6Sql("b")} AS beta",
      "se" -> s"${pm.pin6Sql(s"(1.0e0 / sqrt(${pm.pairValSql("i")}))")} AS se",
      "z" -> s"${pm.pin6Sql(s"(b * sqrt(${pm.pairValSql("i")}))")} AS z",
      "hazard_ratio" -> s"${pm.pin6Sql("__peb")} AS hazard_ratio",
      "partial_loglik" ->
        (s"${pm.pin6Sql(s"(b * ${pm.pairValSql("sxt")} - ${pm.pairValSql("lns")})")} " +
          "AS partial_loglik"))
    coxCtes(3) + ", " +
      // final-β risk pass (gf/sf name the g/sWin shapes from coxCtes —
      // rebuilt inline to keep the builder's iter() single-purpose)
      coxFinalRiskCtes + ", " +
      s"lf AS (SELECT ${pm.pairSumSql("it", "i")}, " +
      "CAST(SUM(ne) AS BIGINT) AS n_events, " +
      "SUM(sxh) AS sxth, SUM(sxl) AS sxtl, " +
      s"${pm.pairSumSql("lnt", "lns")} FROM " +
      s"(SELECT ne, sxh, sxl, it, CAST(ne AS DOUBLE) * " +
      s"${pm.pin9Sql("__plns")} AS lnt FROM " +
      s"(SELECT *, ${coxITermSql} AS it FROM $lnS0 pfw) pfq " +
      "WHERE ne > 0) lfq), " +
      "nn AS (SELECT count(*) AS n FROM subj) " +
      s"SELECT ${cols.map(items).mkString(", ")} FROM $hazInner pzw"
  }
  private def coxOracle: String =
    coxReadoutOracle(Seq("n", "n_events", "beta", "se", "z",
      "hazard_ratio"))
  private def coxLoglikOracle: String =
    coxReadoutOracle(Seq("n_events", "partial_loglik"))
  /** gf/sf: the final-β (b3) risk pass reused by coxOracle. */
  private def coxFinalRiskCtes: String = {
    val pm = graft.functions.PortableMathSql
    val inner = pm.expFrom("(SELECT * FROM subj CROSS JOIN b3)",
      "b * x", "__pex", "pg")
    s"gf AS (SELECT t, ${pm.pairSumSql("ex", "a0")}, " +
      pm.pairSumSql("xe", "a1") + ", " +
      pm.pairSumSql("xxe", "a2") + ", " +
      "SUM(e) AS ne, " + pm.pairSumSql("sxv", "sx") + " FROM " +
      "(SELECT t, e, ex, x * ex AS xe, x * x * ex AS xxe, " +
      "CASE WHEN e = 1 THEN x ELSE 0e0 END AS sxv FROM " +
      s"(SELECT t, e, x, ${pm.pin9Sql("__pex")} AS ex FROM $inner " +
      "pgw) pgp) pgq GROUP BY 1), " +
      "sf AS (SELECT t, ne, sxh, sxl, " +
      "SUM(a0h) OVER w AS s0h, SUM(a0l) OVER w AS s0l, " +
      "SUM(a1h) OVER w AS s1h, SUM(a1l) OVER w AS s1l, " +
      "SUM(a2h) OVER w AS s2h, SUM(a2l) OVER w AS s2l " +
      "FROM gf WINDOW w AS (ORDER BY t ROWS BETWEEN CURRENT ROW " +
      "AND UNBOUNDED FOLLOWING))"
  }

  // Round 17 (VERDICT r16 #5): the retired forensic oracles —
  // coxCovDigest*, coxDiagX/XInt/XCov/XRows/Grid/G1/B/KExp — proved
  // their facts driver-green (CORRECTNESS_r15/r16) and live in git
  // history + tools/driver_red_ack.txt; their Stats twins stay
  // spec-covered in StatsSpec.

  /** q_cox_diag_kln oracle: the portable-ln chain at the exact
    * final-pass arguments pln(S0) (suffix risk sum rebuilt from its
    * integer pair), one row per duration, bit-chunked exactly. Round 15
    * (VERDICT r14 #3a): the S0 argument's exact (s0h, s0l) integer pair
    * rides along as BIGINTs so a red row distinguishes upstream
    * risk-sum divergence from a same-argument pln kernel divergence. */
  private def coxDiagKLnOracle: String = {
    val pm = graft.functions.PortableMathSql
    // Round 16: carry-normalized, as in coxOracle/Stats.coxDiagKernelLn.
    val s0v = pm.pairValNormSql("s0")
    val inner = pm.lnFrom("(SELECT t, ne, s0h, s0l FROM sf WHERE ne > 0)",
      s0v, "__pln", "dl")
    val chunked = pm.chunkFrom(inner, "__pln", "k_")
    // Round 17: ne CAST AS BIGINT — the uncast SUM-of-integers was
    // HUGEINT on the wire, the r15-proven driver dump class and the
    // actual r15/r16 kln red (see Stats.coxPh's post-mortem note).
    coxCtes(3) + ", " + coxFinalRiskCtes + " " +
      "SELECT t, CAST(ne AS BIGINT) AS ne, " +
      "CAST(s0h AS BIGINT) AS s0h, CAST(s0l AS BIGINT) AS s0l, " +
      "CAST(k_hi AS BIGINT) AS l_hi, CAST(k_c1 AS BIGINT) AS l_c1, " +
      "CAST(k_c2 AS BIGINT) AS l_c2, CAST(k_c3 AS BIGINT) AS l_c3 " +
      s"FROM $chunked ORDER BY t"
  }

  /** q_cox_diag_kargs oracle: kln's rows WITHOUT the pln chunks —
    * exactly the (t, ne, s0h, s0l) integer transport (round 16,
    * VERDICT r15 #1; see Stats.coxDiagKArgs for the split logic).
    * Round 17: ne BIGINT-cast (the r16 red's actual cause — uncast
    * HUGEINT on the wire, no value divergence). */
  private def coxDiagKArgsOracle: String =
    coxCtes(3) + ", " + coxFinalRiskCtes + " " +
      "SELECT t, CAST(ne AS BIGINT) AS ne, " +
      "CAST(s0h AS BIGINT) AS s0h, CAST(s0l AS BIGINT) AS s0l " +
      "FROM sf WHERE ne > 0 ORDER BY t"

  /** q_cox_diag_kargs_tn oracle — the duration/event column half
    * (round 17, VERDICT r16 #1): per-row (t, ne) transport at duration
    * grain, previously proven only in aggregate (the retired g1/xint
    * digests). All-BIGINT outputs. */
  private def coxDiagKArgsTnOracle: String =
    coxCtes(3) + ", " + coxFinalRiskCtes + " " +
      "SELECT t, CAST(ne AS BIGINT) AS ne " +
      "FROM sf WHERE ne > 0 ORDER BY t"

  /** q_cox_diag_kargs_s0 oracle — the risk-sum column half (round 17,
    * VERDICT r16 #1): per-row exact integer suffix pair at the final
    * β. All-BIGINT outputs. */
  private def coxDiagKArgsS0Oracle: String =
    coxCtes(3) + ", " + coxFinalRiskCtes + " " +
      "SELECT t, CAST(s0h AS BIGINT) AS s0h, CAST(s0l AS BIGINT) AS s0l " +
      "FROM sf WHERE ne > 0 ORDER BY t"

  /** q_cox_diag_kargs_q1..q4 oracle — the rank-quartile row bisect
    * (round 17, VERDICT r16 #2): quartile = ⌊(rank−1)·4 / count⌋, every
    * step exact small-integer arithmetic mirrored in the Spark probe
    * (Stats.coxDiagKArgsQuart). */
  private def coxDiagKArgsQuartOracle(quart: Int): String =
    coxCtes(3) + ", " + coxFinalRiskCtes + ", " +
      "ka AS (SELECT t, CAST(ne AS BIGINT) AS ne, " +
      "CAST(s0h AS BIGINT) AS s0h, CAST(s0l AS BIGINT) AS s0l, " +
      "ROW_NUMBER() OVER (ORDER BY t) AS rn, " +
      "CAST(COUNT(*) OVER () AS BIGINT) AS cnt " +
      "FROM sf WHERE ne > 0) " +
      "SELECT t, ne, s0h, s0l FROM ka " +
      "WHERE CAST(floor(CAST((rn - 1) * 4 AS DOUBLE) / " +
      s"CAST(cnt AS DOUBLE)) AS BIGINT) = ${quart - 1} ORDER BY t"

  /** q_cox_diag_kargs_a0 oracle — the pre-window per-duration moment
    * pairs (round 17): straight from the live gf CTE, BEFORE the
    * suffix window builds S0 — splits the chain at the window
    * boundary (see Stats.coxDiagKArgsA0). All durations, no events
    * filter. */
  private def coxDiagKArgsA0Oracle: String =
    coxCtes(3) + ", " + coxFinalRiskCtes + " " +
      "SELECT t, CAST(ne AS BIGINT) AS ne, " +
      "CAST(a0h AS BIGINT) AS a0h, CAST(a0l AS BIGINT) AS a0l " +
      "FROM gf ORDER BY t"

  /** q_cox_diag_kterms oracle — per-term probe through the LIVE
    * final-risk expression context (round 17, VERDICT r16 #3): the
    * pinned term ex = pin9(pexp(β₃·x)) evaluated per SUBJECT row in
    * exactly gf's innermost shape (expFrom over subj CROSS JOIN b3,
    * then the pin ladder), NOT on a pre-grouped distinct-x relation
    * the way the retired kexp oracle built its arguments — then
    * bit-chunk sums per distinct covariate plus the exact
    * (Σ⌊ex⌋, Σlo) pair-decomposition sums the a0 moments feed.
    * Splits "kernel/pin diverges in live context" from "per-duration
    * pair aggregation diverges". */
  private def coxDiagKTermsOracle: String = {
    val pm = graft.functions.PortableMathSql
    val inner = pm.expFrom("(SELECT * FROM subj CROSS JOIN b3)",
      "b * x", "__pex", "kt")
    val live = s"(SELECT t, e, x, ${pm.pin9Sql("__pex")} AS ex " +
      s"FROM $inner ktw)"
    val chunked = pm.chunkFrom(live, "ex", "k_")
    def s(v: String, n: String) =
      s"CAST(SUM(CAST($v AS DECIMAL(38,0))) AS BIGINT) AS $n"
    coxCtes(3) +
      ", ktg AS (SELECT x, CAST(count(*) AS BIGINT) AS n, " +
      s("k_hi", "e_hi") + ", " + s("k_c1", "e_c1") + ", " +
      s("k_c2", "e_c2") + ", " + s("k_c3", "e_c3") + ", " +
      s(pm.hiSql("ex"), "p_hi") + ", " +
      s(pm.loSql("ex", 1e9), "p_lo") +
      s" FROM $chunked GROUP BY 1) " +
      s"SELECT CAST(${pm.hiSql("x")} AS BIGINT) AS xh, " +
      s"CAST(${pm.loSql("x", 1e9)} AS BIGINT) AS xl, n, " +
      "e_hi, e_c1, e_c2, e_c3, p_hi, p_lo FROM ktg ORDER BY x"
  }

  /** DuckDB mirror of Stats.gmmEm1d over pin9(pln(1+n_chars)), 3 EM
    * steps: each pK CTE replays the nine integer-pair moment sums
    * from p(K−1)'s 9-dp params with the op's pinned parenthesization
    * (normalization-free w's, 9-dp-pinned responsibilities, larger-
    * mean-keyed midpoint rule on both-underflow, ln clamped at the
    * portable kernel's 1e-18 domain floor and 9-dp-pinned in the
    * loglik sum). The covariate is the INJECTED literal grid (round
    * 14, lnGridCte — never computed by an engine); every remaining
    * exp/ln — the densities, the loglik — is the PORTABLE kernel's
    * generated SQL arithmetic (PortableMathSql), bit-identical to the
    * Spark side by construction; libm is out of the value path
    * entirely. */
  private def gmmOracle: String = {
    val pm = graft.functions.PortableMathSql
    val llInner = pm.lnFrom(s"${gmmWRel("p3", "pwf")} pwfz",
      "greatest(w1 + w2, 1e-18)", "__pll", "pll")
    gmmCtes + ", " +
      s"f0 AS (SELECT ${pm.pin9Sql("__pll")} AS pll FROM $llInner pllw), " +
      "f AS (SELECT count(*) AS n, " +
      pm.pairSumSql(s"(pll - ${pm.lit(0.9189385332046727)})", "ll") +
      " FROM f0) " +
      "SELECT CAST(n AS BIGINT) AS n, " +
      s"${pm.pin6Sql("(CASE WHEN mu1 > mu2 THEN p2 ELSE 1.0 - p2 END)")} AS pi_lo, " +
      s"${pm.pin6Sql("(CASE WHEN mu1 > mu2 THEN mu2 ELSE mu1 END)")} AS mu_lo, " +
      s"${pm.pin6Sql("(CASE WHEN mu1 > mu2 THEN s2 ELSE s1 END)")} AS sigma_lo, " +
      s"${pm.pin6Sql("(CASE WHEN mu1 > mu2 THEN 1.0 - p2 ELSE p2 END)")} AS pi_hi, " +
      s"${pm.pin6Sql("(CASE WHEN mu1 > mu2 THEN mu1 ELSE mu2 END)")} AS mu_hi, " +
      s"${pm.pin6Sql("(CASE WHEN mu1 > mu2 THEN s1 ELSE s2 END)")} AS sigma_hi, " +
      s"${pm.pin6Sql(s"(${pm.pairValSql("ll")} / CAST(n AS DOUBLE))")} AS avg_loglik " +
      "FROM f CROSS JOIN p3"
  }

  /** Normalization-free densities from the broadcast one-row params:
    * w = (weight / sigma) * pexp(-(0.5 * z * z)), both pexp's the
    * portable kernel chain — shared by [[gmmOracle]], [[gmmCtes]]'s
    * EM steps, and the q_gmm_diag_kernel probe. */
  private def gmmWRel(prev: String, tag: String): String = {
    val pm = graft.functions.PortableMathSql
    val inner = s"(SELECT x, p2, mu1, mu2, s1, s2 FROM b CROSS JOIN $prev)"
    val e1 = pm.expFrom(inner,
      "-(0.5 * (((x - mu1) / s1) * ((x - mu1) / s1)))", "__pw1", tag + "a")
    val e2 = pm.expFrom(e1,
      "-(0.5 * (((x - mu2) / s2) * ((x - mu2) / s2)))", "__pw2", tag + "b")
    s"(SELECT x, __pw1, __pw2, ((1.0 - p2) / s1) * __pw1 AS w1, " +
      s"(p2 / s2) * __pw2 AS w2, mu1, mu2 FROM $e2 ${tag}w)"
  }

  /** Shared GMM CTE chain — covariate table `b` off the injected
    * literal grid, moment init p0, and the 3-step EM param ladder
    * ending at `p3`. Mirrors Stats.gmmFit op for op. */
  private def gmmCtes: String = {
    val pm = graft.functions.PortableMathSql
    // round-13 determinism rewrite (Stats.gmmEm1d's mirror, op for op):
    // NO engine round() (portable floor-ladder pins only) and NO
    // DECIMAL↔DOUBLE cast of a non-integer value — every moment sum is
    // a PAIR of exact DECIMAL(38,0) integer sums rebuilt H + L/1e9
    val iters = (1 to 3).map { k =>
      s"t$k AS (SELECT x, CASE WHEN w1 + w2 = 0.0 THEN " +
        "(CASE WHEN (x > (mu1 + mu2) / 2.0) = (mu2 >= mu1) " +
        "THEN 1.0 ELSE 0.0 END) " +
        s"ELSE ${pm.pin9Sql("(w2 / (w1 + w2))")} END AS r " +
        s"FROM ${gmmWRel(s"p${k - 1}", s"pw$k")} pw${k}z), " +
        s"a$k AS (SELECT count(*) AS n, " +
        pm.pairSumSql("r", "r2") + ", " +
        pm.pairSumSql("(r * x)", "r2x") + ", " +
        pm.pairSumSql("(r * x * x)", "r2xx") + ", " +
        pm.pairSumSql("(1.0 - r)", "r1") + ", " +
        pm.pairSumSql("((1.0 - r) * x)", "r1x") + ", " +
        pm.pairSumSql("((1.0 - r) * x * x)", "r1xx") +
        s" FROM t$k), " +
        s"rb$k AS (SELECT CAST(n AS DOUBLE) AS nd, " +
        Seq("r2", "r2x", "r2xx", "r1", "r1x", "r1xx")
          .map(n => s"${pm.pairValSql(n)} AS $n").mkString(", ") +
        s" FROM a$k), " +
        s"u$k AS (SELECT r2 / nd AS up2, r1x / r1 AS umu1, " +
        "sqrt(greatest(r1xx / r1 - (r1x / r1) * (r1x / r1), 1e-12)) AS us1, " +
        "r2x / r2 AS umu2, " +
        "sqrt(greatest(r2xx / r2 - (r2x / r2) * (r2x / r2), 1e-12)) AS us2 " +
        s"FROM rb$k), " +
        s"p$k AS (SELECT ${pm.pin9Sql("up2")} AS p2, " +
        s"${pm.pin9Sql("umu1")} AS mu1, ${pm.pin9Sql("us1")} AS s1, " +
        s"${pm.pin9Sql("umu2")} AS mu2, ${pm.pin9Sql("us2")} AS s2 " +
        s"FROM u$k)"
    }.mkString(", ")
    // covariate from the injected literal grid (round 14, lnGridCte)
    s"WITH $lnGridCte, " +
      s"b AS (SELECT ${lnGridXSql("d.nk")} AS x FROM " +
      "(SELECT 1 + n_chars AS nk FROM documents " +
      "WHERE n_chars IS NOT NULL) d LEFT JOIN lng g ON d.nk = g.gk), " +
      "m0 AS (SELECT count(*) AS n, CAST(count(*) AS DOUBLE) AS nd, " +
      pm.pairSumSql("x", "sx") + ", " + pm.pairSumSql("(x * x)", "sxx") +
      " FROM b), " +
      s"i0 AS (SELECT nd, ${pm.pin9Sql(s"(${pm.pairValSql("sx")} / nd)")} AS m, " +
      s"${pm.pairValSql("sxx")} / nd AS exx FROM m0), " +
      "i1 AS (SELECT m, sqrt(greatest(exx - m * m, 1e-12)) AS sd0 FROM i0), " +
      s"p0 AS (SELECT 0.5 AS p2, ${pm.pin9Sql("(m - sd0)")} AS mu1, " +
      s"${pm.pin9Sql("sd0")} AS s1, ${pm.pin9Sql("(m + sd0)")} AS mu2, " +
      s"${pm.pin9Sql("sd0")} AS s2 FROM i1), " +
      iters
  }

  /** q_gmm_diag_kernel oracle: the portable exp/ln chains at the exact
    * final-params arguments (the two densities and the loglik ln),
    * bit-chunked exactly and BIGINT-summed per covariate-quanta-mod-20
    * group — [[gmmCtes]] supplies the same p3 ladder as the fit. */
  private def gmmDiagKernelOracle: String = {
    val pm = graft.functions.PortableMathSql
    val lnRel = pm.lnFrom(s"${gmmWRel("p3", "dgf")} dgfz",
      "greatest(w1 + w2, 1e-18)", "__pl", "dgl")
    var rel = pm.chunkFrom(lnRel, "__pw1", "e_")
    rel = pm.chunkFrom(rel, "__pw2", "f_")
    rel = pm.chunkFrom(rel, "__pl", "a_")
    val sums = Seq("e_", "f_", "a_").flatMap(p =>
      Seq("hi", "c1", "c2", "c3").map(c =>
        s"CAST(SUM(CAST($p$c AS BIGINT)) AS BIGINT) AS $p$c")).mkString(", ")
    gmmCtes +
      s" SELECT CAST(${pm.loSql("x", 1e9)} AS BIGINT) % 20 AS grp, " +
      s"count(*) AS n, $sums FROM $rel GROUP BY 1 ORDER BY 1"
  }

  private def qualityScoresOracle: String = {
    val inner = graft.functions.PortableMathSql.expFrom(
      "(SELECT f.doc_id, f.x1, f.x2, b.b0, b.b1, b.b2 FROM f, bb3 b)",
      "-(b0 + b1 * x1 + b2 * x2)", "__ps", "qs")
    val pm = graft.functions.PortableMathSql
    logisticCtes + ", " +
      // portable pin9 sigmoid then pin6 readout (Stats.logisticScore's
      // round-13 stance) — p9 named so the pin ladders stay shallow
      s"sc0 AS (SELECT doc_id, ${pm.pin9Sql("(1.0 / (1.0 + __ps))")} AS p9 " +
      s"FROM $inner qsw) " +
      s"SELECT doc_id, ${pm.pin6Sql("p9")} AS score FROM sc0 ORDER BY doc_id"
  }

  /** q_logistic_diag_kernel oracle: the portable exp/ln chains at the
    * exact final-β arguments (sigmoid pexp, two clamped loss plns),
    * bit-chunked exactly and BIGINT-summed per doc-mod-20 group —
    * Stats.logisticDiagKernel's mirror over [[logisticCtes]]' bb3. */
  private def logisticDiagKernelOracle: String = {
    val pm = graft.functions.PortableMathSql
    val finInner = pm.expFrom(
      "(SELECT f.doc_id, f.y, f.x1, f.x2, b.b0, b.b1, b.b2 FROM f, bb3 b)",
      "-(b0 + b1 * x1 + b2 * x2)", "__pe", "dk")
    val cl = "(SELECT doc_id, __pe, least(greatest(" +
      s"${pm.pin9Sql("(1.0 / (1.0 + __pe))")}, 1e-6), 1.0 - 1e-6) AS q " +
      s"FROM $finInner dkw)"
    var rel = pm.lnFrom(cl, "q", "__lq", "da")
    rel = pm.lnFrom(rel, "1.0 - q", "__lr", "db")
    rel = pm.chunkFrom(rel, "__pe", "e_")
    rel = pm.chunkFrom(rel, "__lq", "a_")
    rel = pm.chunkFrom(rel, "__lr", "b_")
    val sums = Seq("e_", "a_", "b_").flatMap(p =>
      Seq("hi", "c1", "c2", "c3").map(c =>
        s"CAST(SUM(CAST($p$c AS BIGINT)) AS BIGINT) AS $p$c")).mkString(", ")
    logisticCtes +
      s" SELECT doc_id % 20 AS grp, count(*) AS n, $sums " +
      s"FROM $rel GROUP BY 1 ORDER BY 1"
  }

  /** q_psm_diag_kln oracle: the portable ln chain at the exact PSM
    * feature arguments — pln(1+Σvalue) (the one non-enumerable-domain
    * covariate still kernel-computed on both engines) and pln(1+count)
    * — bit-chunked exactly and BIGINT-summed per user-mod-20 group. */
  private def psmDiagKLnOracle: String = {
    val pm = graft.functions.PortableMathSql
    val inner = pm.lnFrom(pm.lnFrom(
      "(SELECT user_id, tv, ne FROM (SELECT user_id, " +
        "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS tv, " +
        "count(*) AS ne FROM events GROUP BY 1) kvi " +
        "WHERE tv IS NOT NULL)",
      "1.0 + tv", "__plv", "ka"),
      "1.0 + CAST(ne AS DOUBLE)", "__plw", "kb")
    var rel = pm.chunkFrom(inner, "__plv", "a_")
    rel = pm.chunkFrom(rel, "__plw", "b_")
    val sums = Seq("a_", "b_").flatMap(p =>
      Seq("hi", "c1", "c2", "c3").map(c =>
        s"CAST(SUM(CAST($p$c AS BIGINT)) AS BIGINT) AS $p$c")).mkString(", ")
    s"SELECT user_id % 20 AS grp, count(*) AS n, $sums " +
      s"FROM $rel GROUP BY 1 ORDER BY 1"
  }

  /** Shared DuckDB CTE chain mirroring Mix.dsirImportance (64 buckets,
    * target = doc_id % 37): yields `hb` (doc_id, is_t, b) — the hashed
    * unigram+bigram feature multiset — and `lw` (b, lw) — the 9-dp
    * add-one-smoothed log-likelihood-ratio table. range(0, len(w)-1) is
    * empty for single-token docs, so no bigram guard is needed (the
    * Spark side guards because sequence() descends for start > stop). */
  private def dsirCtes: String =
    "WITH tok AS (SELECT doc_id, (doc_id % 37 = 0) AS is_t, " +
      "string_split(text, ' ') AS w FROM documents), " +
      "feats AS (SELECT doc_id, is_t, unnest(list_concat(w, " +
      "list_transform(range(0, len(w) - 1), i -> w[i+1] || ' ' || w[i+2]))) AS f " +
      "FROM tok), " +
      "hb AS (SELECT doc_id, is_t, " +
      "('0x' || substr(md5(f || '#0'), 1, 8))::BIGINT % 64 AS b FROM feats), " +
      "bc AS (SELECT b, sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tc, " +
      "sum(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS sc FROM hb GROUP BY b), " +
      "tot AS (SELECT sum(tc) AS tt, sum(sc) AS st FROM bc), " +
      "lw AS (SELECT b, round(ln((tc + 1.0) / (tt + 64.0)) - " +
      "ln((sc + 1.0) / (st + 64.0)), 9) AS lw FROM bc, tot)"

  /** DuckDB mirror of q_dedup_clusters: the capped band join as the edge
    * set over the FULL corpus, then recursive min-label propagation. */
  private def dedupClustersOracle: String =
    s"WITH RECURSIVE $mhPairsCtes, " +
      "edges AS (SELECT id1 AS src, id2 AS dst FROM pairs UNION ALL SELECT id2, id1 FROM pairs), " +
      "cc AS (SELECT doc_id AS id, doc_id AS label FROM documents " +
      "UNION SELECT e.dst AS id, cc.label FROM cc JOIN edges e ON cc.id = e.src) " +
      "SELECT id AS doc_id, min(label) AS cluster FROM cc GROUP BY id ORDER BY doc_id"

  /** Cluster-size histogram over the same clustering as dedupClustersOracle. */
  private def dupClusterSizesOracle: String =
    s"WITH RECURSIVE $mhPairsCtes, " +
      "edges AS (SELECT id1 AS src, id2 AS dst FROM pairs UNION ALL SELECT id2, id1 FROM pairs), " +
      "cc AS (SELECT doc_id AS id, doc_id AS label FROM documents " +
      "UNION SELECT e.dst AS id, cc.label FROM cc JOIN edges e ON cc.id = e.src), " +
      "lab AS (SELECT id, min(label) AS cluster FROM cc GROUP BY id), " +
      "s AS (SELECT cluster, count(*) AS cluster_size FROM lab GROUP BY cluster) " +
      "SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters, " +
      "CAST(cluster_size * count(*) AS BIGINT) AS n_docs " +
      "FROM s GROUP BY cluster_size ORDER BY cluster_size"

  /** DuckDB mirror of Similarity.lof (k=5 over the kmeansCtes cells):
    * within-cell pair distances at 6 dp, kNN via row_number (d, j), k-dist
    * per neighbor, DECIMAL(28,14) reach and lrd sums cast back to double,
    * LOF = mean neighbor lrd / own lrd at 6 dp. Singleton cells surface
    * nk=0 with NULL kdist/lrd/lof on both engines. */
  private def lofOracle: String =
    kmeansCtes + ", pr AS (SELECT a.vec_id AS i, b.vec_id AS j, " +
      "round(sqrt(list_sum(list_transform(range(1, 65), " +
      "ix -> (a.v[ix] - b.v[ix]) * (a.v[ix] - b.v[ix])))), 6) AS d " +
      "FROM af a JOIN af b ON a.cell = b.cell AND a.vec_id <> b.vec_id), " +
      "knn AS (SELECT i, j, d FROM (SELECT pr.*, " +
      "row_number() OVER (PARTITION BY i ORDER BY d, j) AS rn FROM pr) " +
      "WHERE rn <= 5), " +
      "kd AS (SELECT i AS ki, max(d) AS kd FROM knn GROUP BY i), " +
      "lrd AS (SELECT knn.i, count(*) AS nk, round(CAST(count(*) AS DOUBLE) / " +
      "CAST(sum(CAST(greatest(kd.kd, knn.d) AS DECIMAL(28,14))) AS DOUBLE), 9) AS lrd " +
      "FROM knn JOIN kd ON knn.j = kd.ki GROUP BY knn.i), " +
      "lo AS (SELECT knn.i, round(CAST(sum(CAST(l2.lrd AS DECIMAL(28,14))) AS DOUBLE) / " +
      "(lrd.nk * lrd.lrd), 6) AS lof FROM knn JOIN lrd l2 ON knn.j = l2.i " +
      "JOIN lrd ON knn.i = lrd.i GROUP BY knn.i, lrd.nk, lrd.lrd) " +
      "SELECT af.vec_id, af.cell, coalesce(lrd.nk, 0) AS nk, kd.kd AS kdist, " +
      "lrd.lrd, lo.lof FROM af LEFT JOIN lrd ON af.vec_id = lrd.i " +
      "LEFT JOIN kd ON af.vec_id = kd.ki " +
      "LEFT JOIN lo ON af.vec_id = lo.i ORDER BY af.vec_id"

  /** DuckDB mirror of Similarity.dbscan2d (eps=0.02, minPts=5 on dims
    * 0/1): the eps graph is brute-forced — the engine's grid-bucketed
    * candidate join must reproduce it exactly — then cores, CC clusters
    * (recursive CTE, min-id labels) and border adoption follow the same
    * deterministic id-min rules. The eps² literal is the engine's own
    * Scala double product, so the boundary predicate is bit-identical. */
  private def dbscanOracle: String = {
    val epsSq = 0.02 * 0.02
    "WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x, " +
      "CAST(embedding[2] AS DOUBLE) AS y FROM embeddings), " +
      "nb AS (SELECT a.vec_id AS i, b.vec_id AS j FROM e a JOIN e b " +
      "ON a.vec_id <> b.vec_id AND " +
      s"(a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) <= $epsSq), " +
      "deg AS (SELECT i, count(*) AS d FROM nb GROUP BY i), " +
      "core AS (SELECT i AS id FROM deg WHERE d >= 4), " +
      "ce AS (SELECT i AS id1, j AS id2 FROM nb WHERE i < j " +
      "AND i IN (SELECT id FROM core) AND j IN (SELECT id FROM core)), " +
      "edges AS (SELECT id1 AS src, id2 AS dst FROM ce " +
      "UNION ALL SELECT id2, id1 FROM ce), " +
      "cc AS (SELECT id, id AS label FROM core " +
      "UNION SELECT e2.dst AS id, cc.label FROM cc JOIN edges e2 ON cc.id = e2.src), " +
      "lab AS (SELECT id, min(label) AS cluster FROM cc GROUP BY id), " +
      "bord AS (SELECT nb.i AS id, min(lab.cluster) AS cluster FROM nb " +
      "JOIN lab ON nb.j = lab.id WHERE nb.i NOT IN (SELECT id FROM core) " +
      "GROUP BY nb.i) " +
      "SELECT e.vec_id, CASE WHEN lab.id IS NOT NULL THEN 'core' " +
      "WHEN bord.id IS NOT NULL THEN 'border' ELSE 'noise' END AS role, " +
      "CASE WHEN lab.id IS NOT NULL THEN lab.cluster ELSE bord.cluster END AS cluster " +
      "FROM e LEFT JOIN lab ON e.vec_id = lab.id " +
      "LEFT JOIN bord ON e.vec_id = bord.id ORDER BY e.vec_id"
  }

  /** Planted-boilerplate text shared by the repetition-quality mirrors:
    * every third doc gets its first 40 chars appended twice as duplicate
    * "lines" (must match the Spark-side `dirty` construction exactly). */
  private val DirtyText: String =
    "CASE WHEN doc_id % 3 = 0 THEN text || chr(10) || substr(text, 1, 40) " +
      "|| chr(10) || substr(text, 1, 40) ELSE text END"

  /** DuckDB mirror of q_bpe_tokens: the merges table as a VALUES CTE and
    * the kernel's merge loop as a RECURSIVE CTE — each step finds the
    * lowest-rank pair present in a word's " a b c " symbol string and
    * replaces its first (leftmost) occurrence; a word's chain terminates
    * when no listed pair remains. Exactly the kernel's semantics (one
    * merge per step, full rescan), which is why that formulation was
    * chosen over GPT-2's merge-all-per-round. */
  /** The merges-table + per-word recursive-merge CTE chain shared by the
    * BPE oracles, ending in `agg` (doc_id, toks = the document's BPE
    * token list). */
  private def bpeTokCtes: String = {
    val mergeVals = graft.ops.TextAnalysis.DefaultBpeMerges.zipWithIndex
      .map { case ((a, b), i) => s"(${i + 1},'$a','$b')" }.mkString(",")
    s"merges(rank, a, b) AS (VALUES $mergeVals), " +
      "t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
      "w0 AS (SELECT doc_id, unnest(toks) AS w, unnest(range(1, len(toks) + 1)) AS wi FROM t), " +
      "w AS (SELECT doc_id, wi, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s " +
      "FROM w0 WHERE w <> ''), " +
      "bpe AS (SELECT doc_id, wi, s FROM w " +
      "UNION ALL " +
      "SELECT doc_id, wi, regexp_replace(s, ' ' || a || ' ' || b || ' ', ' ' || a || b || ' ') " +
      "FROM (SELECT doc_id, wi, s, a, b, " +
      "row_number() OVER (PARTITION BY doc_id, wi ORDER BY rank) AS rn " +
      "FROM bpe JOIN merges ON contains(s, ' ' || a || ' ' || b || ' ')) WHERE rn = 1), " +
      "fin AS (SELECT doc_id, wi, trim(s) AS s FROM bpe b WHERE NOT EXISTS " +
      "(SELECT 1 FROM merges m WHERE contains(b.s, ' ' || m.a || ' ' || m.b || ' '))), " +
      "agg AS (SELECT doc_id, string_split(string_agg(s, ' ' ORDER BY wi), ' ') AS toks " +
      "FROM fin GROUP BY doc_id)"
  }

  private def bpeOracle: String =
    s"WITH RECURSIVE $bpeTokCtes " +
      "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_bpe, " +
      "array_to_string(toks[1:10], '|') AS head_toks FROM agg ORDER BY doc_id"

  /** DuckDB mirror of q_tokenize_pack: the shared BPE chain produces each
    * doc's token list, then the q_pack_emit window/regroup runs over it
    * at budget 128. */
  private def tokenizePackOracle: String =
    s"WITH RECURSIVE $bpeTokCtes, " +
      "t2 AS (SELECT a.doc_id, d.source, a.toks FROM agg a " +
      "JOIN documents d USING (doc_id)), " +
      "c2 AS (SELECT doc_id, source, toks, " +
      "sum(len(toks)) OVER (PARTITION BY source ORDER BY doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - len(toks) AS prev FROM t2), " +
      "u2 AS (SELECT source, prev, unnest(toks) AS tok, " +
      "unnest(range(0, len(toks))) AS p FROM c2), " +
      "g2 AS (SELECT source, CAST(floor((prev + p) / 128) AS BIGINT) AS seq_id, " +
      "prev + p AS gpos, tok FROM u2) " +
      "SELECT source || '_' || CAST(seq_id AS VARCHAR) AS key, " +
      "CAST(count(*) AS BIGINT) AS n_toks, " +
      "string_agg(tok, ' ' ORDER BY gpos) AS seq_text " +
      "FROM g2 GROUP BY source, seq_id ORDER BY key"

  /** DuckDB mirror of q_llm_prep_full: each stage's CTE reuses the SQL of
    * its single-operator oracle (quality+repetition = q_quality_filter's
    * CTEs on raw text, lang = q_lang_id's en branch, decontamination =
    * q_decontaminate's shingle CTEs with the corpus restricted to the
    * language survivors, dedup = q_dedup_exact's fingerprint, mix =
    * q_domain_mix's threshold, BPE = q_bpe_tokens' recursive CTE over the
    * final survivors). */
  /** Shared CTE chain of the flagship composites — quality+repetition
    * gate → language filter → 13-gram decontamination → exact-dedup
    * canonical — ending in `k` (doc_id, text, source), the corpus the
    * final stages (mix/BPE in v2, fuzzy dedup in v3) consume. */
  private def llmPrepKeptCtes: String =
    "f0 AS (SELECT doc_id, text, source, string_split(text, ' ') AS toks, " +
      "string_split(text, chr(10)) AS lines FROM documents), " +
      "f1 AS (SELECT doc_id, text, source, toks, lines, " +
      "list_transform(range(0, greatest(len(toks) - 2, 0) + 1), " +
      "i -> array_to_string(toks[i+1:i+2], ' ')) AS grams FROM f0), " +
      "f AS (SELECT doc_id, text, source, len(toks) AS n_tok, " +
      s"round(CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN $EnStop)) AS DOUBLE) / len(toks), 6) AS stop_ratio, " +
      "round(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines), 6) AS dup_ratio, " +
      "round(CAST(list_max(list_transform(list_distinct(grams), " +
      "gg -> length(gg) * len(list_filter(grams, x -> x = gg)))) AS DOUBLE) / length(text), 6) AS top2_ratio " +
      "FROM f1), " +
      "q AS (SELECT doc_id, text, source FROM f WHERE n_tok BETWEEN 8 AND 100000 " +
      "AND stop_ratio >= 0.01 AND dup_ratio <= 0.2 AND top2_ratio <= 0.2), " +
      "lx AS (SELECT doc_id, text, source, " +
      s"len(list_filter(string_split(lower(text), ' '), x -> x IN $EnStop)) AS n_en, " +
      s"len(list_filter(string_split(lower(text), ' '), x -> x IN $DeStop)) AS n_de, " +
      s"len(list_filter(string_split(lower(text), ' '), x -> x IN $FrStop)) AS n_fr, " +
      s"len(list_filter(string_split(lower(text), ' '), x -> x IN $EsStop)) AS n_es FROM q), " +
      "l AS (SELECT doc_id, text, source FROM lx WHERE n_en > 0 AND n_en = greatest(n_en, n_de, n_fr, n_es)), " +
      "sh AS (SELECT doc_id, list_transform(list_distinct(list_transform(" +
      "range(0, greatest(len(string_split(text, ' ')) - 13, 0) + 1), " +
      "i -> array_to_string(string_split(text, ' ')[i+1:i+13], ' '))), " +
      "s -> ('0x' || substr(md5(s || '#0'), 1, 8))::BIGINT) AS hs FROM documents), " +
      "ev AS (SELECT DISTINCT unnest(hs) AS h FROM sh WHERE doc_id % 37 = 0), " +
      "bad AS (SELECT DISTINCT doc_id FROM (SELECT s.doc_id, unnest(s.hs) AS h FROM sh s " +
      "JOIN l ON s.doc_id = l.doc_id) x WHERE h IN (SELECT h FROM ev)), " +
      "dc AS (SELECT * FROM l WHERE doc_id NOT IN (SELECT doc_id FROM bad)), " +
      "c AS (SELECT min(doc_id) AS doc_id FROM (SELECT doc_id, " +
      "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp FROM dc) GROUP BY fp), " +
      "k AS (SELECT dc.* FROM dc JOIN c USING (doc_id))"

  private def llmPrepFullOracle: String = {
    val mergeVals = graft.ops.TextAnalysis.DefaultBpeMerges.zipWithIndex
      .map { case ((a, b), i) => s"(${i + 1},'$a','$b')" }.mkString(",")
    s"WITH RECURSIVE merges(rank, a, b) AS (VALUES $mergeVals), " +
      llmPrepKeptCtes + ", " +
      "m AS (SELECT * FROM k WHERE ('0x' || substr(md5(source || '|' || CAST(doc_id AS VARCHAR) || '#0'), 1, 8))::BIGINT " +
      "< (CASE WHEN source = 'src1' THEN 0.25 WHEN source = 'src0' THEN 0.5 ELSE 1.0 END) * 4294967296.0), " +
      "t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM m), " +
      "w0 AS (SELECT doc_id, unnest(toks) AS w, unnest(range(1, len(toks) + 1)) AS wi FROM t), " +
      "w AS (SELECT doc_id, wi, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s FROM w0 WHERE w <> ''), " +
      "bpe AS (SELECT doc_id, wi, s FROM w " +
      "UNION ALL " +
      "SELECT doc_id, wi, regexp_replace(s, ' ' || a || ' ' || b || ' ', ' ' || a || b || ' ') " +
      "FROM (SELECT doc_id, wi, s, a, b, row_number() OVER (PARTITION BY doc_id, wi ORDER BY rank) AS rn " +
      "FROM bpe JOIN merges ON contains(s, ' ' || a || ' ' || b || ' ')) WHERE rn = 1), " +
      "fin AS (SELECT doc_id, wi, trim(s) AS s FROM bpe b WHERE NOT EXISTS " +
      "(SELECT 1 FROM merges mm WHERE contains(b.s, ' ' || mm.a || ' ' || mm.b || ' '))), " +
      "agg AS (SELECT doc_id, string_split(string_agg(s, ' ' ORDER BY wi), ' ') AS toks FROM fin GROUP BY doc_id) " +
      "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_bpe FROM agg ORDER BY doc_id"
  }

  /** DuckDB mirror of q_llm_prep_fuzzy (flagship v3): the shared kept
    * chain through exact-dedup canonical `k`, then the MinHash-LSH pair
    * CTEs run OVER k, recursive min-label propagation into duplicate
    * clusters, and only each cluster's min id (label == id) survives —
    * the production near-dup dedup composed end-to-end. */
  private def llmPrepFuzzyOracle: String =
    s"WITH RECURSIVE $llmPrepKeptCtes, " +
      mhPairsCtesOver("k") + ", " +
      "jp AS (SELECT p.id1, p.id2 FROM pairs p " +
      "JOIN t a ON a.doc_id = p.id1 JOIN t b ON b.doc_id = p.id2 " +
      "WHERE round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / " +
      "len(list_distinct(list_concat(a.toks, b.toks))), 6) >= 0.5), " +
      "edges AS (SELECT id1 AS src, id2 AS dst FROM jp UNION ALL SELECT id2, id1 FROM jp), " +
      "cc AS (SELECT doc_id AS id, doc_id AS label FROM k " +
      "UNION SELECT e.dst AS id, cc.label FROM cc JOIN edges e ON cc.id = e.src), " +
      "lab AS (SELECT id, min(label) AS label FROM cc GROUP BY id), " +
      "canon AS (SELECT id FROM lab WHERE label = id) " +
      "SELECT k.doc_id, CAST(len(string_split(k.text, ' ')) AS BIGINT) AS n_tokens " +
      "FROM k JOIN canon ON k.doc_id = canon.id ORDER BY k.doc_id"

  /** DuckDB mirror of q_llm_prep_spans (flagship v4): the shared kept
    * chain through exact-dedup canonical `k`, then the span-dedup chain
    * (same gram hash / first-occurrence order as the q_span_dedup mirror)
    * run OVER k, counting surviving vs removed tokens per doc. */
  private def llmPrepSpansOracle: String =
    s"WITH $llmPrepKeptCtes, " +
      "st AS (SELECT doc_id, string_split(text, ' ') AS toks FROM k), " +
      "sg AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 8 + 1)) AS pos FROM st), " +
      "shh AS (SELECT doc_id, pos, md5(array_to_string(toks[pos+1 : pos+8], ' ')) AS gh FROM sg), " +
      "sm AS (SELECT doc_id, pos, row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn FROM shh), " +
      "scov AS (SELECT DISTINCT doc_id, p FROM (" +
      "SELECT doc_id, unnest(range(pos, pos + 8)) AS p FROM sm WHERE rn > 1)), " +
      "su AS (SELECT doc_id, unnest(toks) AS tok, unnest(range(0, len(toks))) AS p FROM st), " +
      "skept AS (SELECT su.doc_id, count(*) AS n_clean FROM su " +
      "LEFT JOIN scov ON su.doc_id = scov.doc_id AND su.p = scov.p " +
      "WHERE scov.p IS NULL GROUP BY su.doc_id), " +
      "snr AS (SELECT doc_id, count(*) AS n_removed FROM scov GROUP BY doc_id) " +
      "SELECT st.doc_id, CAST(coalesce(skept.n_clean, 0) AS BIGINT) AS n_tokens_clean, " +
      "CAST(coalesce(snr.n_removed, 0) AS BIGINT) AS n_removed " +
      "FROM st LEFT JOIN skept ON st.doc_id = skept.doc_id " +
      "LEFT JOIN snr ON st.doc_id = snr.doc_id ORDER BY st.doc_id"

  private val EnStop = "('the','of','and','a','to','in','is')"
  private val DeStop = "('der','die','das','und','ist','nicht')"
  private val FrStop = "('le','la','les','et','est','dans')"
  private val EsStop = "('el','los','las','es','en','una')"

  /** ORACLE CONTRACT for degenerate inputs: ops that `raise_error` on a
    * degenerate slice (e.g. runsTest one-sided, gumbelFit < 2 blocks,
    * rocAuc single-class, brownForsythe zero spread, ivWald weak
    * instrument) fail LOUDLY engine-side, while their DuckDB mirrors
    * carry no equivalent guard — on degenerate data the two engines
    * intentionally diverge (Spark error vs oracle NaN/Inf/NULL row).
    * Those error paths are OUTSIDE the dual-engine hash contract: the
    * contract covers the non-degenerate domain, the fixtures bind each
    * query inside it, and each guard has its own spec proving it trips.
    * Ops whose degenerate answer is representable (mcnemarTest,
    * kruskalWallis, stlStrength, methodAgreement…) instead pin NULL
    * identically on BOTH engines and stay inside the contract. */
  def oracleSql: Map[String, String] =
    baseOracleSql ++ graft.ops.Tpch.oracleSql

  private val baseOracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",

    "q_filter_exists" ->
      ("SELECT doc_id, lang, source FROM documents " +
        "WHERE text IS NOT NULL AND lang IS NOT NULL AND source <> 'src0' ORDER BY doc_id"),

    "q_project_rename" ->
      ("SELECT l_orderkey AS order_id, l_linenumber AS line_no, l_quantity AS qty " +
        "FROM lineitem ORDER BY order_id, line_no"),

    "q_filter_in" ->
      ("SELECT c_custkey, c_name, c_mktsegment FROM customer " +
        "WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE') ORDER BY c_custkey"),

    "q_filter_range" ->
      ("SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_totalprice FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01' " +
        "AND o_totalprice > 1000 ORDER BY o_orderkey"),

    "q_filter_not_rlike" ->
      ("SELECT p_partkey, p_name FROM part " +
        "WHERE NOT regexp_matches(p_name, 'widget') AND NOT regexp_matches(p_name, '^blue') " +
        "ORDER BY p_partkey"),

    "q_regex_extract" ->
      ("SELECT event_id, nullif(regexp_extract(props, '\"k\": (\\d+)', 1), '') AS k " +
        "FROM events ORDER BY event_id"),

    "q_dedup_keep_first" ->
      ("SELECT l_orderkey, l_linenumber, l_partkey FROM " +
        "(SELECT l_orderkey, l_linenumber, l_partkey, " +
        "row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn FROM lineitem) " +
        "WHERE rn = 1 ORDER BY l_orderkey"),

    "q_null_profile" ->
      ("SELECT count(CASE WHEN doc_id IS NULL THEN 1 END) AS null_doc_id, " +
        "count(CASE WHEN text IS NULL THEN 1 END) AS null_text, " +
        "count(CASE WHEN lang IS NULL THEN 1 END) AS null_lang, " +
        "count(CASE WHEN source IS NULL THEN 1 END) AS null_source, " +
        "count(CASE WHEN n_chars IS NULL THEN 1 END) AS null_n_chars FROM documents"),

    "q_distinct_profile" ->
      ("SELECT count(DISTINCT o_orderstatus) AS d_o_orderstatus, " +
        "count(DISTINCT o_orderpriority) AS d_o_orderpriority FROM orders"),

    "q_regex_contains_count" ->
      "SELECT count(*) AS n_match FROM part WHERE regexp_matches(p_name, '(?i)^b')",

    "q_regex_replace" ->
      ("SELECT doc_id, regexp_replace(substr(text, 1, 60), '[aeiou]', '*', 'g') AS redacted " +
        "FROM documents ORDER BY doc_id"),

    "q_parse_dollars" -> parseDollarsOracle,

    "q_parse_dollars_native" -> parseDollarsOracle,

    "q_date_multiformat" ->
      ("WITH t AS (SELECT o_orderkey, CASE CAST(o_orderkey % 4 AS INT) " +
        "WHEN 0 THEN strftime(o_orderdate, '%B %-d, %Y') " +
        "WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d') " +
        "WHEN 2 THEN strftime(o_orderdate, '%B %Y') " +
        "ELSE strftime(o_orderdate, '%Y') END AS raw FROM orders) " +
        "SELECT o_orderkey, raw, COALESCE(" +
        "CAST(try_strptime(raw, '%B %-d, %Y') AS DATE), " +
        "CAST(try_strptime(raw, '%Y-%m-%d') AS DATE), " +
        "CAST(try_strptime(raw, '%B %Y') AS DATE), " +
        "CAST(try_strptime(raw, '%Y') AS DATE)) AS parsed FROM t ORDER BY o_orderkey"),

    "q_epoch_seconds" ->
      ("SELECT event_id, strftime(TIMESTAMP '1970-01-01' + to_seconds(event_id * 1000), " +
        "'%Y-%m-%d %H:%M:%S') AS t FROM events ORDER BY event_id"),

    "q_coerce_fill" ->
      ("SELECT event_id, COALESCE(CAST(nullif(regexp_extract(props, '(\\d+)', 1), '') AS DOUBLE), 0.0) " +
        "AS k_filled FROM events ORDER BY event_id"),

    "q_conditional_fill" ->
      ("SELECT l_orderkey, l_linenumber, CASE WHEN l_discount = 0 THEN l_extendedprice " +
        "ELSE l_extendedprice * (1 - l_discount) END AS net_price " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),

    "q_synonym_coalesce" ->
      ("SELECT event_id, COALESCE(nullif(event_type, 'view'), 'viewed') AS etype " +
        "FROM events ORDER BY event_id"),

    "q_join_inner" ->
      ("SELECT o_orderkey, c_name, o_totalprice FROM orders " +
        "JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"),

    "q_join_left_agg" ->
      ("SELECT o_orderkey, COALESCE(n_items, 0) AS n_items FROM orders " +
        "LEFT JOIN (SELECT l_orderkey, count(*) AS n_items FROM lineitem GROUP BY 1) li " +
        "ON o_orderkey = li.l_orderkey ORDER BY o_orderkey"),

    "q_join_semi" ->
      ("SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND year(o_orderdate) = 1997) " +
        "ORDER BY c_custkey"),

    "q_join_anti" ->
      ("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey"),

    "q_join_range" ->
      ("SELECT count(*) AS n_late FROM lineitem JOIN orders " +
        "ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate"),

    "q_join_broadcast" ->
      ("SELECT n_nationkey, n_name, r_name FROM nation " +
        "JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey"),

    "q_join_multi" ->
      ("SELECT n_name, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) " +
        "AS revenue FROM lineitem " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name"),

    "q_group_count" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS \"count\" FROM lineitem " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),

    "q_agg_pricing" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base, " +
        "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc, " +
        "count(*) AS n, " +
        "round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),

    "q_pivot_ratings" ->
      ("SELECT o_orderkey, o_orderstatus, " +
        "count(CASE WHEN l_returnflag = 'A' THEN 1 END) AS cnt_a, " +
        "count(CASE WHEN l_returnflag = 'N' THEN 1 END) AS cnt_n, " +
        "count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS cnt_r " +
        "FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey " +
        "GROUP BY o_orderkey, o_orderstatus ORDER BY o_orderkey"),

    "q_pivot_sum" ->
      ("SELECT l_orderkey, " +
        "CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS qty_a, " +
        "CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS qty_n, " +
        "CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS qty_r " +
        "FROM lineitem GROUP BY 1 ORDER BY 1"),

    "q_unpivot" ->
      ("SELECT p_partkey, 'p_size' AS key, CAST(p_size AS DOUBLE) AS value FROM part " +
        "UNION ALL " +
        "SELECT p_partkey, 'p_retailprice' AS key, p_retailprice AS value FROM part " +
        "ORDER BY p_partkey, key"),

    "q_freq_table" ->
      ("SELECT c_mktsegment, count(*) AS \"count\" FROM customer GROUP BY 1 " +
        "ORDER BY \"count\" DESC, c_mktsegment"),

    "q_summary_stats" ->
      ("WITH a AS (SELECT count(l_quantity) AS n, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s, " +
        "CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS ss, " +
        "min(l_quantity) AS min_v, max(l_quantity) AS max_v FROM lineitem) " +
        "SELECT n, round(s / n, 6) AS mean_v, " +
        "round(sqrt((ss - s * s / n) / (n - 1)), 6) AS std_v, min_v, max_v FROM a"),

    "q_summary_quartiles" ->
      ("SELECT round(quantile_cont(l_extendedprice, 0.25), 6) AS q25, " +
        "round(quantile_cont(l_extendedprice, 0.5), 6) AS q50, " +
        "round(quantile_cont(l_extendedprice, 0.75), 6) AS q75 FROM lineitem"),

    "q_histogram" ->
      ("SELECT CAST(floor(value / 10) AS BIGINT) AS bin, count(*) AS \"count\" " +
        "FROM events GROUP BY 1 ORDER BY 1"),

    "q_rollup" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS \"count\" FROM lineitem " +
        "GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"),

    "q_cube" ->
      ("SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus, " +
        "coalesce(o_orderpriority, '(all)') AS o_orderpriority, count(*) AS n " +
        "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) " +
        "ORDER BY o_orderstatus, o_orderpriority"),

    "q_window_lead_lag" ->
      ("SELECT o_orderkey, o_custkey, " +
        "coalesce(lag(o_totalprice) OVER w, -1.0) AS prev_price, " +
        "coalesce(lead(o_totalprice) OVER w, -1.0) AS next_price FROM orders " +
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) " +
        "ORDER BY o_orderkey"),

    "q_ntile" ->
      ("SELECT o_orderkey, CAST(ntile(4) OVER " +
        "(PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile " +
        "FROM orders ORDER BY o_orderkey"),

    // list_sum of an empty list is NULL in DuckDB while Spark's aggregate
    // folds to the 0 seed — coalesce keeps the mirrors identical
    "q_array_hof" ->
      ("SELECT doc_id, " +
        "CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 3)) AS BIGINT) AS n_long_tokens, " +
        "CAST(coalesce(list_sum(list_transform(list_filter(string_split(text, ' '), " +
        "t -> length(t) > 3), t -> length(t))), 0) AS BIGINT) AS chars_long_tokens " +
        "FROM documents ORDER BY doc_id"),

    "q_string_funcs" ->
      ("SELECT p_partkey, lpad(p_name, 30, '*') AS padded, reverse(p_name) AS rev, " +
        "translate(p_name, 'aeiou', '12345') AS xlat, " +
        "CAST(levenshtein(p_name, 'widget') AS BIGINT) AS edit_dist, " +
        "split_part(p_name, ' ', 1) AS first_word " +
        "FROM part ORDER BY p_partkey"),

    "q_regex_extract_all" ->
      ("SELECT event_id, array_to_string(regexp_extract_all(props, '(\\d+)', 1), ',') AS all_nums " +
        "FROM events ORDER BY event_id"),

    "q_grouping_sets" ->
      ("SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus, " +
        "coalesce(o_orderpriority, '(all)') AS o_orderpriority, count(*) AS n " +
        "FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority)) " +
        "ORDER BY o_orderstatus, o_orderpriority"),

    "q_date_arith" ->
      ("SELECT o_orderkey, " +
        "strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start, " +
        "strftime(o_orderdate::DATE + 30, '%Y-%m-%d') AS due_date, " +
        "CAST(date_diff('day', o_orderdate::DATE, DATE '1998-12-31') AS BIGINT) AS days_to_eoy " +
        "FROM orders ORDER BY o_orderkey"),

    "q_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",

    "q_sample_systematic" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
        "WHERE l_orderkey % 97 = 0 ORDER BY l_orderkey, l_linenumber"),

    "q_distinct" ->
      "SELECT DISTINCT l_returnflag AS flag FROM lineitem ORDER BY flag",

    "q_set_intersect" ->
      ("SELECT c_nationkey AS nk FROM customer INTERSECT " +
        "SELECT s_nationkey AS nk FROM supplier ORDER BY nk"),

    "q_window_rank" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, rn FROM " +
        "(SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
        "FROM orders) WHERE rn <= 2 ORDER BY o_custkey, rn"),

    "q_window_rank_family" ->
      ("SELECT o_orderkey, " +
        "CAST(dense_rank() OVER w AS BIGINT) AS drank, " +
        "round(percent_rank() OVER w, 6) AS prank, " +
        "round(cume_dist() OVER w, 6) AS cdist FROM orders " +
        "WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) " +
        "ORDER BY o_orderkey"),

    "q_window_running" ->
      ("SELECT o_custkey, o_orderkey, round(SUM(o_totalprice) OVER " +
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running " +
        "FROM orders ORDER BY o_custkey, o_orderkey"),

    "q_text_tokens" ->
      ("SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens " +
        "FROM documents ORDER BY doc_id"),

    "q_text_quality" ->
      ("SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, " +
        "round(CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')), 6) AS mean_tok_len, " +
        s"round(CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN $EnStop)) AS DOUBLE) " +
        "/ len(string_split(text, ' ')), 6) AS stopword_ratio " +
        "FROM documents ORDER BY doc_id"),

    "q_quality_repetition" ->
      (s"WITH t AS (SELECT doc_id, $DirtyText AS tx FROM documents), " +
        "a AS (SELECT doc_id, tx, string_split(tx, chr(10)) AS lines, " +
        "string_split(tx, ' ') AS toks FROM t), " +
        "g AS (SELECT doc_id, tx, lines, " +
        "list_transform(range(0, greatest(len(toks) - 2, 0) + 1), " +
        "i -> array_to_string(toks[i+1:i+2], ' ')) AS grams FROM a) " +
        "SELECT doc_id, " +
        "round(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines), 6) AS dup_line_ratio, " +
        "round(CAST(list_max(list_transform(list_distinct(grams), " +
        "gg -> length(gg) * len(list_filter(grams, x -> x = gg)))) AS DOUBLE) / length(tx), 6) AS top2_char_ratio " +
        "FROM g ORDER BY doc_id"),

    "q_quality_filter" ->
      (s"WITH t AS (SELECT doc_id, lang, $DirtyText AS tx FROM documents), " +
        "a AS (SELECT doc_id, lang, tx, string_split(tx, chr(10)) AS lines, " +
        "string_split(tx, ' ') AS toks FROM t), " +
        "g AS (SELECT doc_id, lang, tx, lines, toks, " +
        "list_transform(range(0, greatest(len(toks) - 2, 0) + 1), " +
        "i -> array_to_string(toks[i+1:i+2], ' ')) AS grams FROM a), " +
        "f AS (SELECT doc_id, lang, len(toks) AS n_tok, " +
        s"round(CAST(len(list_filter(string_split(lower(tx), ' '), x -> x IN $EnStop)) AS DOUBLE) " +
        "/ len(toks), 6) AS stop_ratio, " +
        "round(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines), 6) AS dup_ratio, " +
        "round(CAST(list_max(list_transform(list_distinct(grams), " +
        "gg -> length(gg) * len(list_filter(grams, x -> x = gg)))) AS DOUBLE) / length(tx), 6) AS top2_ratio " +
        "FROM g) " +
        "SELECT doc_id, lang FROM f " +
        "WHERE n_tok BETWEEN 8 AND 100000 AND stop_ratio >= 0.01 " +
        "AND dup_ratio <= 0.2 AND top2_ratio <= 0.2 ORDER BY doc_id"),

    "q_lang_id" ->
      ("WITH s AS (SELECT doc_id, lang, " +
        s"CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN $EnStop)) AS BIGINT) AS n_en, " +
        s"CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN $DeStop)) AS BIGINT) AS n_de, " +
        s"CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN $FrStop)) AS BIGINT) AS n_fr, " +
        s"CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN $EsStop)) AS BIGINT) AS n_es " +
        "FROM documents) " +
        "SELECT doc_id, lang, CASE " +
        "WHEN n_en > 0 AND n_en = greatest(n_en, n_de, n_fr, n_es) THEN 'en' " +
        "WHEN n_de > 0 AND n_de = greatest(n_en, n_de, n_fr, n_es) THEN 'de' " +
        "WHEN n_fr > 0 AND n_fr = greatest(n_en, n_de, n_fr, n_es) THEN 'fr' " +
        "WHEN n_es > 0 AND n_es = greatest(n_en, n_de, n_fr, n_es) THEN 'es' " +
        "ELSE 'und' END AS lang_guess FROM s ORDER BY doc_id"),

    "q_lang_confusion" ->
      ("WITH s AS (SELECT doc_id, lang, " +
        s"CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN $EnStop)) AS BIGINT) AS n_en, " +
        s"CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN $DeStop)) AS BIGINT) AS n_de, " +
        s"CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN $FrStop)) AS BIGINT) AS n_fr, " +
        s"CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN $EsStop)) AS BIGINT) AS n_es " +
        "FROM documents) " +
        "SELECT lang, CASE " +
        "WHEN n_en > 0 AND n_en = greatest(n_en, n_de, n_fr, n_es) THEN 'en' " +
        "WHEN n_de > 0 AND n_de = greatest(n_en, n_de, n_fr, n_es) THEN 'de' " +
        "WHEN n_fr > 0 AND n_fr = greatest(n_en, n_de, n_fr, n_es) THEN 'fr' " +
        "WHEN n_es > 0 AND n_es = greatest(n_en, n_de, n_fr, n_es) THEN 'es' " +
        "ELSE 'und' END AS lang_guess, count(*) AS n FROM s " +
        "GROUP BY 1, 2 ORDER BY lang, lang_guess"),

    "q_mix_rebalance" ->
      ("WITH per AS (SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens " +
        "FROM documents GROUP BY source), " +
        "t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot, count(*) AS k FROM per) " +
        "SELECT source, n_tokens, " +
        "round(CAST(n_tokens AS DOUBLE) / tot, 6) AS actual_share, " +
        "round(1.0 / k, 6) AS target_share, " +
        "round((1.0 / k) / (CAST(n_tokens AS DOUBLE) / tot), 6) AS repeat_factor " +
        "FROM per, t ORDER BY source"),

    "q_token_compression" ->
      ("SELECT source, count(*) AS n_docs, " +
        "CAST(sum(length(text)) AS BIGINT) AS n_chars, " +
        "CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens, " +
        "round(CAST(sum(length(text)) AS DOUBLE) / sum(len(string_split(text, ' '))), 6) " +
        "AS chars_per_token FROM documents GROUP BY source ORDER BY source"),

    "q_corpus_report" ->
      ("WITH lx AS (SELECT doc_id, text, source, " +
        s"len(list_filter(string_split(lower(text), ' '), x -> x IN $EnStop)) AS n_en, " +
        s"len(list_filter(string_split(lower(text), ' '), x -> x IN $DeStop)) AS n_de, " +
        s"len(list_filter(string_split(lower(text), ' '), x -> x IN $FrStop)) AS n_fr, " +
        s"len(list_filter(string_split(lower(text), ' '), x -> x IN $EsStop)) AS n_es " +
        "FROM documents) " +
        "SELECT count(*) AS n_docs, " +
        "CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens, " +
        "round(avg(length(text)), 6) AS mean_chars, " +
        "count(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS n_unique_texts, " +
        "count(DISTINCT source) AS n_sources, " +
        "CAST(sum(CASE WHEN n_en > 0 AND n_en = greatest(n_en, n_de, n_fr, n_es) " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_en FROM lx"),

    "q_corpus_report_by_source" ->
      ("WITH lx AS (SELECT doc_id, text, source, " +
        s"len(list_filter(string_split(lower(text), ' '), x -> x IN $EnStop)) AS n_en, " +
        s"len(list_filter(string_split(lower(text), ' '), x -> x IN $DeStop)) AS n_de, " +
        s"len(list_filter(string_split(lower(text), ' '), x -> x IN $FrStop)) AS n_fr, " +
        s"len(list_filter(string_split(lower(text), ' '), x -> x IN $EsStop)) AS n_es " +
        "FROM documents) " +
        "SELECT source AS domain, count(*) AS n_docs, " +
        "CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens, " +
        "round(1.0 - CAST(count(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS DOUBLE) " +
        "/ count(*), 6) AS dup_rate, " +
        "round(CAST(sum(CASE WHEN n_en > 0 AND n_en = greatest(n_en, n_de, n_fr, n_es) " +
        "THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS share_en " +
        "FROM lx GROUP BY source ORDER BY domain"),

    "q_strip_boilerplate" ->
      ("WITH t AS (SELECT doc_id, text || " +
        "CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'subscribe to our newsletter today' ELSE '' END || " +
        "CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'cookie consent required to continue' ELSE '' END AS tx " +
        "FROM documents), " +
        "bl AS (SELECT line FROM (SELECT doc_id, unnest(list_distinct(string_split(tx, chr(10)))) AS line " +
        "FROM t) GROUP BY line HAVING count(*) >= 10), " +
        "u AS (SELECT doc_id, unnest(string_split(tx, chr(10))) AS l, " +
        "unnest(range(1, len(string_split(tx, chr(10))) + 1)) AS i FROM t), " +
        "k AS (SELECT doc_id, string_agg(l, chr(10) ORDER BY i) AS cleaned FROM u " +
        "WHERE l NOT IN (SELECT line FROM bl) GROUP BY doc_id) " +
        "SELECT t.doc_id, coalesce(k.cleaned, '') AS cleaned " +
        "FROM t LEFT JOIN k ON t.doc_id = k.doc_id ORDER BY t.doc_id"),

    "q_unigram_logprob" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents), " +
        "freq AS (SELECT t, count(*) AS tf FROM tok GROUP BY 1), " +
        "n AS (SELECT count(*) AS nn FROM tok) " +
        // 9-dp-pinned ln terms through an exact DECIMAL sum (the op's
        // cross-libm transcendental-output stance), round0 readout
        "SELECT tok.doc_id, round(CAST(sum(CAST(round(ln(CAST(freq.tf AS DOUBLE) " +
        "/ n.nn), 9) AS DECIMAL(28,9))) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) " +
        "+ 0.0 AS logprob " +
        "FROM tok JOIN freq USING (t) CROSS JOIN n GROUP BY tok.doc_id ORDER BY tok.doc_id"),

    "q_chunk_overlap" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "c AS (SELECT doc_id, toks, " +
        "CAST(floor((greatest(len(toks) - 16, 1) + 47) / 48) AS BIGINT) AS nc FROM t), " +
        "u AS (SELECT doc_id, toks, unnest(range(0, nc)) AS ci FROM c) " +
        "SELECT CAST(doc_id AS VARCHAR) || '_' || CAST(ci AS VARCHAR) AS key, " +
        "doc_id, ci AS chunk_id, " +
        "array_to_string(toks[ci*48+1 : ci*48+64], ' ') AS chunk_text " +
        "FROM u ORDER BY key"),

    "q_chunk_dedup" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "c AS (SELECT doc_id, toks, " +
        "CAST(floor((greatest(len(toks) - 16, 1) + 47) / 48) AS BIGINT) AS nc FROM t), " +
        "u AS (SELECT doc_id, toks, unnest(range(0, nc)) AS ci FROM c), " +
        "ch AS (SELECT doc_id, ci AS chunk_id, " +
        "md5(regexp_replace(lower(trim(array_to_string(toks[ci*48+1 : ci*48+64], ' '))), '\\s+', ' ', 'g')) AS fp " +
        "FROM u) " +
        "SELECT fp, doc_id, chunk_id, n_copies FROM (" +
        "SELECT fp, doc_id, chunk_id, " +
        "count(*) OVER (PARTITION BY fp) AS n_copies, " +
        "row_number() OVER (PARTITION BY fp ORDER BY doc_id, chunk_id) AS rn FROM ch) " +
        "WHERE rn = 1 ORDER BY fp"),

    "q_unigram_score_frozen" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents), " +
        "n AS (SELECT count(*) AS nn FROM tok), " +
        "v AS (SELECT t, round(ln(CAST(count(*) AS DOUBLE) / (SELECT nn FROM n)), 9) AS logp " +
        "FROM tok GROUP BY t ORDER BY count(*) DESC, t LIMIT 20) " +
        "SELECT tok.doc_id, round(sum(coalesce(v.logp, -15.0)) / count(*), 6) AS score " +
        "FROM tok LEFT JOIN v ON tok.t = v.t GROUP BY tok.doc_id ORDER BY tok.doc_id"),

    "q_fingerprint" ->
      ("WITH t AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp " +
        "FROM documents) " +
        "SELECT doc_id, fp, ('0x' || substr(fp, 1, 8))::BIGINT AS fp32 FROM t ORDER BY doc_id"),

    "q_dedup_exact" ->
      ("SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp, " +
        "min(doc_id) AS keep_id, count(*) AS n_copies " +
        "FROM documents GROUP BY 1 ORDER BY keep_id"),

    "q_dedup_incremental" ->
      ("WITH b AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp " +
        "FROM documents WHERE source = 'src0'), " +
        "k AS (SELECT min(doc_id) AS doc_id, fp FROM b GROUP BY fp), " +
        "e AS (SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp " +
        "FROM documents WHERE source <> 'src0') " +
        "SELECT doc_id, fp FROM k WHERE fp NOT IN (SELECT fp FROM e) ORDER BY doc_id"),

    "q_corpus_diff" ->
      ("WITH o AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp " +
        "FROM documents WHERE doc_id % 7 <> 0), " +
        "nw AS (SELECT doc_id, md5(regexp_replace(lower(trim(" +
        "CASE WHEN doc_id % 11 = 0 THEN text || ' edited' ELSE text END)), '\\s+', ' ', 'g')) AS fp " +
        "FROM documents WHERE doc_id % 5 <> 0) " +
        "SELECT coalesce(o.doc_id, nw.doc_id) AS doc_id, " +
        "CASE WHEN o.doc_id IS NULL THEN 'added' WHEN nw.doc_id IS NULL THEN 'removed' " +
        "WHEN o.fp = nw.fp THEN 'same' ELSE 'changed' END AS status " +
        "FROM o FULL OUTER JOIN nw ON o.doc_id = nw.doc_id ORDER BY doc_id"),

    "q_containment_pairs" ->
      (s"WITH $mhPairsCtes " +
        "SELECT id1, id2, cont1, cont2 FROM (SELECT p.id1, p.id2, " +
        "round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / len(a.toks), 6) AS cont1, " +
        "round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / len(b.toks), 6) AS cont2 " +
        "FROM pairs p JOIN t a ON a.doc_id = p.id1 JOIN t b ON b.doc_id = p.id2) " +
        "WHERE cont1 >= 0.8 OR cont2 >= 0.8 ORDER BY id1, id2"),

    // Span dedup mirror: same gram hash (md5 of the space-joined k-gram),
    // same first-occurrence order ((doc_id, pos) lexicographic), same
    // covered-position union; the rebuild string_aggs surviving tokens in
    // position order.
    "q_span_dedup" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "g AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 8 + 1)) AS pos FROM t), " +
        "h AS (SELECT doc_id, pos, md5(array_to_string(toks[pos+1 : pos+8], ' ')) AS gh FROM g), " +
        "m AS (SELECT doc_id, pos, row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn FROM h), " +
        "cov AS (SELECT DISTINCT doc_id, p FROM (" +
        "SELECT doc_id, unnest(range(pos, pos + 8)) AS p FROM m WHERE rn > 1)), " +
        "u AS (SELECT doc_id, unnest(toks) AS tok, unnest(range(0, len(toks))) AS p FROM t), " +
        "kept AS (SELECT u.doc_id, string_agg(u.tok, ' ' ORDER BY u.p) AS text_clean " +
        "FROM u LEFT JOIN cov ON u.doc_id = cov.doc_id AND u.p = cov.p " +
        "WHERE cov.p IS NULL GROUP BY u.doc_id), " +
        "nr AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id) " +
        "SELECT t.doc_id, coalesce(kept.text_clean, '') AS text_clean, " +
        "CAST(coalesce(nr.n_removed, 0) AS BIGINT) AS n_removed " +
        "FROM t LEFT JOIN kept ON t.doc_id = kept.doc_id " +
        "LEFT JOIN nr ON t.doc_id = nr.doc_id ORDER BY t.doc_id"),

    // Novelty mirror: same gram hash / first-occurrence order as the span
    // dedup mirror, aggregated per doc.
    "q_doc_novelty" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "g AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 8 + 1)) AS pos FROM t), " +
        "h AS (SELECT doc_id, pos, md5(array_to_string(toks[pos+1 : pos+8], ' ')) AS gh FROM g), " +
        "m AS (SELECT doc_id, row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn FROM h), " +
        "a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams, " +
        "CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel " +
        "FROM m GROUP BY doc_id) " +
        "SELECT d.doc_id, coalesce(a.n_grams, 0) AS n_grams, " +
        "coalesce(a.n_novel, 0) AS n_novel, " +
        "round(CAST(a.n_novel AS DOUBLE) / a.n_grams, 6) AS novelty " +
        "FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id ORDER BY d.doc_id"),

    "q_quality_deciles" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents), " +
        "freq AS (SELECT t, count(*) AS tf FROM tok GROUP BY 1), " +
        "n AS (SELECT count(*) AS nn FROM tok), " +
        "sc AS (SELECT tok.doc_id, round(CAST(sum(CAST(round(ln(CAST(freq.tf AS DOUBLE) " +
        "/ n.nn), 9) AS DECIMAL(28,9))) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) " +
        "+ 0.0 AS logprob " +
        "FROM tok JOIN freq USING (t) CROSS JOIN n GROUP BY tok.doc_id), " +
        "tt AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents), " +
        "j AS (SELECT sc.doc_id, sc.logprob, tt.n_tok, " +
        "ntile(10) OVER (ORDER BY sc.logprob, sc.doc_id) AS decile " +
        "FROM sc JOIN tt USING (doc_id)) " +
        "SELECT decile, count(*) AS n_docs, " +
        "round(min(logprob), 6) AS min_lp, round(max(logprob), 6) AS max_lp, " +
        "round(CAST(sum(n_tok) AS DOUBLE) / count(*), 6) AS avg_tokens " +
        "FROM j GROUP BY decile ORDER BY decile"),

    "q_quality_tail_drop" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents), " +
        "freq AS (SELECT t, count(*) AS tf FROM tok GROUP BY 1), " +
        "n AS (SELECT count(*) AS nn FROM tok), " +
        "sc AS (SELECT tok.doc_id, round(CAST(sum(CAST(round(ln(CAST(freq.tf AS DOUBLE) " +
        "/ n.nn), 9) AS DECIMAL(28,9))) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) " +
        "+ 0.0 AS logprob " +
        "FROM tok JOIN freq USING (t) CROSS JOIN n GROUP BY tok.doc_id), " +
        "thr AS (SELECT round(quantile_cont(logprob, 0.1), 6) AS th FROM sc) " +
        "SELECT sc.doc_id, sc.logprob FROM sc, thr WHERE sc.logprob >= thr.th " +
        "ORDER BY sc.doc_id"),

    // Composite mirror: quality gate ∘ lang-id='en' ∘ exact-dedup-canonical
    // ∘ token count — each CTE reuses the SQL of its single-operator oracle
    // (the 'en' condition is exactly q_lang_id's first CASE branch, which
    // wins ties by English priority).
    "q_llm_prep" ->
      ("WITH q AS (SELECT doc_id, text FROM (" +
        "SELECT doc_id, text, len(string_split(text, ' ')) AS n_tok, " +
        s"round(CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN $EnStop)) AS DOUBLE) " +
        "/ len(string_split(text, ' ')), 6) AS stop_ratio FROM documents) " +
        "WHERE n_tok BETWEEN 8 AND 100000 AND stop_ratio >= 0.01), " +
        "l AS (SELECT doc_id, text FROM (" +
        "SELECT doc_id, text, " +
        s"len(list_filter(string_split(lower(text), ' '), x -> x IN $EnStop)) AS n_en, " +
        s"len(list_filter(string_split(lower(text), ' '), x -> x IN $DeStop)) AS n_de, " +
        s"len(list_filter(string_split(lower(text), ' '), x -> x IN $FrStop)) AS n_fr, " +
        s"len(list_filter(string_split(lower(text), ' '), x -> x IN $EsStop)) AS n_es " +
        "FROM q) WHERE n_en > 0 AND n_en = greatest(n_en, n_de, n_fr, n_es)), " +
        "c AS (SELECT min(doc_id) AS doc_id FROM (" +
        "SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp " +
        "FROM l) GROUP BY fp) " +
        "SELECT l.doc_id, CAST(len(string_split(l.text, ' ')) AS BIGINT) AS n_tokens " +
        "FROM l JOIN c ON l.doc_id = c.doc_id ORDER BY l.doc_id"),

    "q_pack_sequences" ->
      ("WITH t AS (SELECT doc_id, source, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents), " +
        "c AS (SELECT doc_id, source, " +
        "sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS prev FROM t) " +
        "SELECT doc_id, source, " +
        "CAST(floor(prev / 512) AS BIGINT) AS seq_id, " +
        "CAST(prev - floor(prev / 512) * 512 AS BIGINT) AS seq_offset " +
        "FROM c ORDER BY doc_id"),

    "q_tokenize_pack" -> tokenizePackOracle,

    "q_pack_emit" ->
      ("WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents), " +
        "c AS (SELECT doc_id, source, toks, " +
        "sum(len(toks)) OVER (PARTITION BY source ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - len(toks) AS prev FROM t), " +
        "u AS (SELECT source, prev, unnest(toks) AS tok, " +
        "unnest(range(0, len(toks))) AS p FROM c), " +
        "g AS (SELECT source, CAST(floor((prev + p) / 512) AS BIGINT) AS seq_id, " +
        "prev + p AS gpos, tok FROM u) " +
        "SELECT source || '_' || CAST(seq_id AS VARCHAR) AS key, " +
        "CAST(count(*) AS BIGINT) AS n_toks, " +
        "string_agg(tok, ' ' ORDER BY gpos) AS seq_text " +
        "FROM g GROUP BY source, seq_id ORDER BY key"),

    "q_train_val_split" ->
      ("SELECT doc_id, CASE WHEN " +
        "('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR) || '#0'), 1, 8))::BIGINT " +
        "< 0.1 * 4294967296.0 THEN 'val' ELSE 'train' END AS split " +
        "FROM documents ORDER BY doc_id"),

    "q_split_leakage" ->
      (s"WITH $mhPairsCtes, " +
        "sp AS (SELECT doc_id, CASE WHEN " +
        "('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR) || '#0'), 1, 8))::BIGINT " +
        "< 0.1 * 4294967296.0 THEN 'val' ELSE 'train' END AS split FROM documents) " +
        "SELECT p.id1, p.id2, s1.split AS split1, s2.split AS split2 " +
        "FROM pairs p JOIN sp s1 ON p.id1 = s1.doc_id JOIN sp s2 ON p.id2 = s2.doc_id " +
        "WHERE s1.split <> s2.split ORDER BY p.id1, p.id2"),

    "q_shard_manifest" ->
      ("WITH a AS (SELECT doc_id, " +
        "('0x' || substr(md5('shard|' || CAST(doc_id AS VARCHAR) || '#0'), 1, 8))::BIGINT % 8 AS shard, " +
        "('0x' || substr(md5('shard|' || CAST(doc_id AS VARCHAR) || '#1'), 1, 8))::BIGINT AS ord " +
        "FROM documents) " +
        "SELECT doc_id, shard, " +
        "CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS BIGINT) AS pos " +
        "FROM a ORDER BY doc_id"),

    "q_group_sample" ->
      ("SELECT doc_id, source FROM (SELECT doc_id, source, " +
        "row_number() OVER (PARTITION BY source ORDER BY " +
        "('0x' || substr(md5('gs|' || CAST(doc_id AS VARCHAR) || '#0'), 1, 8))::BIGINT, doc_id) AS rn " +
        "FROM documents) WHERE rn <= 3 ORDER BY doc_id"),

    "q_domain_mix" ->
      ("SELECT doc_id, source FROM documents " +
        "WHERE ('0x' || substr(md5(source || '|' || CAST(doc_id AS VARCHAR) || '#0'), 1, 8))::BIGINT " +
        "< (CASE WHEN source = 'src1' THEN 0.25 WHEN source = 'src0' THEN 0.5 ELSE 1.0 END) * 4294967296.0 " +
        "ORDER BY doc_id"),

    "q_dsir_weights" ->
      (dsirCtes + " SELECT doc_id, count(*) AS n_feats, " +
        "round(CAST(sum(CAST(lw AS DECIMAL(28,9))) AS DOUBLE), 6) + 0.0 AS weight " +
        "FROM hb JOIN lw USING (b) WHERE NOT is_t GROUP BY doc_id ORDER BY doc_id"),

    "q_dsir_select" ->
      (dsirCtes + ", dw AS (SELECT doc_id, " +
        "round(CAST(sum(CAST(lw AS DECIMAL(28,9))) AS DOUBLE), 6) + 0.0 AS weight " +
        "FROM hb JOIN lw USING (b) WHERE NOT is_t GROUP BY doc_id) " +
        "SELECT doc_id, weight FROM " +
        "(SELECT * FROM dw ORDER BY weight DESC, doc_id LIMIT 500) ORDER BY doc_id"),

    "q_doclen_histogram" ->
      ("SELECT CAST(floor(len(string_split(text, ' ')) / 20) * 20 AS BIGINT) AS bucket, " +
        "count(*) AS n_docs FROM documents GROUP BY 1 ORDER BY bucket"),

    "q_decon_report" ->
      ("WITH sh AS (SELECT doc_id, list_transform(list_distinct(list_transform(" +
        "range(0, greatest(len(string_split(text, ' ')) - 13, 0) + 1), " +
        "i -> array_to_string(string_split(text, ' ')[i+1:i+13], ' '))), " +
        "s -> ('0x' || substr(md5(s || '#0'), 1, 8))::BIGINT) AS hs FROM documents), " +
        "ev AS (SELECT DISTINCT unnest(hs) AS h FROM sh WHERE doc_id % 37 = 0), " +
        "u AS (SELECT doc_id, unnest(hs) AS h FROM sh) " +
        "SELECT u.doc_id, count(*) AS n_shared FROM u WHERE h IN (SELECT h FROM ev) " +
        "GROUP BY u.doc_id ORDER BY doc_id"),

    "q_decontaminate" ->
      ("WITH sh AS (SELECT doc_id, list_transform(list_distinct(list_transform(" +
        "range(0, greatest(len(string_split(text, ' ')) - 13, 0) + 1), " +
        "i -> array_to_string(string_split(text, ' ')[i+1:i+13], ' '))), " +
        "s -> ('0x' || substr(md5(s || '#0'), 1, 8))::BIGINT) AS hs FROM documents), " +
        "ev AS (SELECT DISTINCT unnest(hs) AS h FROM sh WHERE doc_id % 37 = 0), " +
        "bad AS (SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest(hs) AS h FROM sh) x " +
        "WHERE h IN (SELECT h FROM ev)) " +
        "SELECT d.doc_id, d.source FROM documents d " +
        "WHERE d.doc_id NOT IN (SELECT doc_id FROM bad) ORDER BY doc_id"),

    "q_llm_prep_full" -> llmPrepFullOracle,

    "q_llm_prep_fuzzy" -> llmPrepFuzzyOracle,
    "q_llm_prep_spans" -> llmPrepSpansOracle,

    "q_minhash_sig" ->
      ("WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents) " +
        s"SELECT doc_id, ${mhExpr(0)} AS mh_0, ${mhExpr(1)} AS mh_1, " +
        s"${mhExpr(2)} AS mh_2, ${mhExpr(3)} AS mh_3 FROM t ORDER BY doc_id"),

    "q_minhash_pairs" ->
      s"WITH $mhPairsCtes SELECT id1, id2 FROM pairs ORDER BY id1, id2",

    "q_bottomk_sketch" ->
      ("WITH h AS (SELECT l_returnflag, " +
        "('0x' || substr(md5(l_partkey::VARCHAR || '#0'), 1, 8))::BIGINT AS h FROM lineitem) " +
        "SELECT l_returnflag, array_to_string(list_sort(list_distinct(list(h)))[1:8], ',') AS sketch " +
        "FROM h GROUP BY 1 ORDER BY 1"),

    "q_shingle_minhash" ->
      ("WITH t AS (SELECT doc_id, list_distinct(list_transform(" +
        "range(0, greatest(len(string_split(text, ' ')) - 3, 0) + 1), " +
        "i -> array_to_string(string_split(text, ' ')[i+1:i+3], ' '))) AS toks " +
        "FROM documents) " +
        s"SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_shingles, " +
        s"${mhExpr(0)} AS mh_0, ${mhExpr(1)} AS mh_1 FROM t ORDER BY doc_id"),

    "q_dedup_clusters" -> dedupClustersOracle,
    // incremental == full recompute is the law under test, so the oracle
    // IS the from-scratch clustering
    "q_dedup_clusters_incr" -> dedupClustersOracle,
    "q_dup_cluster_sizes" -> dupClusterSizesOracle,

    "q_dedup_recall" ->
      ("WITH samp AS (SELECT * FROM documents WHERE doc_id % " +
        "(SELECT greatest(1, CAST(ceil(count(*) / 500.0) AS BIGINT)) " +
        "FROM documents) = 0), " +
        mhPairsCtesOver("samp") + ", " +
        "wj AS (SELECT round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / " +
        "len(list_distinct(list_concat(a.toks, b.toks))), 6) AS jac " +
        "FROM pairs p JOIN t a ON a.doc_id = p.id1 JOIN t b ON b.doc_id = p.id2), " +
        "tr AS (SELECT 1 FROM t a JOIN t b ON a.doc_id < b.doc_id " +
        "WHERE round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / " +
        "len(list_distinct(list_concat(a.toks, b.toks))), 6) >= 0.5), " +
        "agg AS (SELECT (SELECT count(*) FROM wj) AS n_cand, " +
        "(SELECT count(*) FROM wj WHERE jac >= 0.5) AS n_hit, " +
        "(SELECT count(*) FROM tr) AS n_truth) " +
        "SELECT n_cand, n_truth, " +
        "round(CAST(n_hit AS DOUBLE) / n_cand, 6) AS prec, " +
        "round(CAST(n_hit AS DOUBLE) / n_truth, 6) AS rec FROM agg"),

    "q_knn_classify" ->
      ("WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings), " +
        "q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv FROM e ORDER BY vec_id LIMIT 10), " +
        "sc AS (SELECT q.qid, q.qlabel, e.vec_id, e.label, " +
        "round(list_dot_product(e.v, q.qv) / " +
        "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS sim " +
        "FROM e CROSS JOIN q WHERE e.vec_id <> q.qid), " +
        "top AS (SELECT qid, qlabel, label FROM (SELECT *, " +
        "row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn FROM sc) " +
        "WHERE rn <= 5), " +
        "votes AS (SELECT qid, qlabel, label, count(*) AS n_votes FROM top GROUP BY 1, 2, 3) " +
        "SELECT qid, qlabel AS true_label, label AS pred_label, n_votes FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY qid ORDER BY n_votes DESC, label) AS r " +
        "FROM votes) WHERE r = 1 ORDER BY qid"),

    "q_triangle_counts" ->
      (s"WITH $mhPairsCtes, " +
        "e AS (SELECT id1 AS a, id2 AS b FROM pairs), " +
        "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM e e1 " +
        "JOIN e e2 ON e1.b = e2.a JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b), " +
        "u AS (SELECT unnest([x, y, z]) AS node FROM tri) " +
        "SELECT node, count(*) AS n_triangles FROM u GROUP BY node ORDER BY node"),

    // same oracle as q_triangle_counts — the orientation is an execution
    // strategy, not a semantic change
    "q_triangle_counts_degree" ->
      (s"WITH $mhPairsCtes, " +
        "e AS (SELECT id1 AS a, id2 AS b FROM pairs), " +
        "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM e e1 " +
        "JOIN e e2 ON e1.b = e2.a JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b), " +
        "u AS (SELECT unnest([x, y, z]) AS node FROM tri) " +
        "SELECT node, count(*) AS n_triangles FROM u GROUP BY node ORDER BY node"),

    "q_degree_histogram" ->
      (s"WITH $mhPairsCtes, " +
        "d AS (SELECT node, count(*) AS degree FROM " +
        "(SELECT id1 AS node FROM pairs UNION ALL SELECT id2 FROM pairs) GROUP BY node) " +
        "SELECT degree, count(*) AS n_nodes FROM d GROUP BY degree ORDER BY degree"),

    "q_simhash" -> simhashOracle,

    "q_simhash_pairs" -> simhashPairsOracle,

    "q_jaccard_pairs" ->
      (s"WITH $mhPairsCtes " +
        "SELECT p.id1, p.id2, " +
        "round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / " +
        "len(list_distinct(list_concat(a.toks, b.toks))), 6) AS jac " +
        "FROM pairs p JOIN t a ON a.doc_id = p.id1 JOIN t b ON b.doc_id = p.id2 " +
        "ORDER BY id1, id2"),

    "q_ann_cosine" -> annCosineOracle,

    // Mirrors embeddingProfile's determinism recipe: centroid dims are
    // 9-dp-rounded exact-DECIMAL means; per-row norm (9 dp) and cosine
    // (6 dp) pre-round before their DECIMAL means; list_dot_product
    // folds in element order exactly like the Spark aggregate().
    "q_embedding_profile" ->
      ("WITH v AS MATERIALIZED (SELECT label AS grp, " +
        "embedding::DOUBLE[] AS v FROM embeddings), " +
        "pe AS (SELECT grp, i AS p, v[i] AS x FROM v, " +
        "unnest(generate_series(1, len(v))) AS u(i)), " +
        "cent AS (SELECT grp, p, " +
        "round(CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*), 9) AS c " +
        "FROM pe GROUP BY 1, 2), " +
        "carr AS MATERIALIZED (SELECT grp, list(c ORDER BY p) AS cv FROM cent GROUP BY 1), " +
        "rw AS (SELECT v.grp, " +
        "round(sqrt(list_dot_product(v.v, v.v)), 9) AS nrm, " +
        "CASE WHEN list_dot_product(v.v, v.v) = 0 " +
        "OR list_dot_product(carr.cv, carr.cv) = 0 THEN CAST(0 AS DOUBLE) " +
        "ELSE round(list_dot_product(v.v, carr.cv) / " +
        "(sqrt(list_dot_product(v.v, v.v)) * sqrt(list_dot_product(carr.cv, carr.cv))), 6) END AS cosc, " +
        "round(sqrt(list_dot_product(carr.cv, carr.cv)), 6) AS cnrm " +
        "FROM v JOIN carr ON v.grp = carr.grp) " +
        "SELECT grp, count(*) AS n_vecs, " +
        "round(CAST(sum(CAST(nrm AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) AS mean_norm, " +
        "min(cnrm) AS centroid_norm, " +
        "round(CAST(sum(CAST(cosc AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_cos_centroid " +
        "FROM rw GROUP BY grp ORDER BY grp"),

    "q_ann_batch" ->
      ("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "q AS (SELECT vec_id AS qid, v AS qv FROM e ORDER BY vec_id LIMIT 5), " +
        "sc AS (SELECT q.qid, e.vec_id, round(list_dot_product(e.v, q.qv) / " +
        "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS sim " +
        "FROM e CROSS JOIN q), " +
        "r AS (SELECT qid, vec_id, sim, " +
        "row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn FROM sc) " +
        "SELECT CAST(qid AS VARCHAR) || '_' || CAST(vec_id AS VARCHAR) AS key, " +
        "qid, vec_id, sim FROM r WHERE rn <= 5 ORDER BY key"),

    // Unrolled greedy MMR: the same top-20 pool and 6-dp pair cosines,
    // then five argmax steps as CTE hops (score desc, id asc at every
    // step); 0.75/0.25 stay binary-exact doubles in both engines.
    "q_mmr_select" -> mmrOracle,

    // q_ann_batch's scan with the label-mismatch filter ahead of the
    // per-probe rank window.
    "q_hard_negatives" ->
      ("WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings), " +
        "q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv FROM e " +
        "ORDER BY vec_id LIMIT 5), " +
        "sc AS (SELECT q.qid, q.qlabel, e.vec_id, e.label AS neg_label, " +
        "round(list_dot_product(e.v, q.qv) / " +
        "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS sim " +
        "FROM e CROSS JOIN q WHERE e.vec_id <> q.qid AND e.label <> q.qlabel), " +
        "r AS (SELECT qid, qlabel, vec_id, neg_label, sim, " +
        "row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn FROM sc) " +
        "SELECT CAST(qid AS VARCHAR) || '_' || CAST(vec_id AS VARCHAR) AS key, " +
        "qid, qlabel, vec_id, neg_label, sim FROM r WHERE rn <= 5 ORDER BY key"),

    "q_ann_lsh" -> lshOracle,
    "q_ann_lsh_multiprobe" -> lshMultiProbeOracle,
    "q_ann_lsh_multitable" -> lshMultiTableOracle,

    "q_ann_ivf" -> ivfOracle,

    "q_ann_ivf_indexed" -> ivfOracle,

    "q_ann_ivf_multiprobe" -> ivfMultiProbeOracle,

    "q_ann_recall" -> annRecallOracle,

    "q_ann_ivf_kmeans" -> kmeansIvfOracle,

    // Same unrolled per-subspace Lloyd, same ADC decimal sums, same cuts.
    "q_ann_pq" -> pqOracle,

    // Same truncated-cosine cuts per prefix, zero-hit prefixes report 0.
    "q_ann_dim_tradeoff" -> dimTradeoffOracle,
    "q_cluster_mix" -> (kmeansCtes +
      " SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs, " +
      "round(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM af), 6) AS share " +
      "FROM af GROUP BY cell ORDER BY cell"),

    "q_ann_ivf_kmeans_multiprobe" -> kmeansIvfMultiProbeOracle,

    "q_neardup_embedding" -> neardupOracle,

    "q_runtime_minutes" -> {
      val pat = """(\d+)\s*ho?u?r?s?\s*(\d*)|(\d+)\s*m"""
      "WITH t AS (SELECT p_partkey, CASE CAST(p_partkey % 3 AS INT) " +
        "WHEN 0 THEN p_size || ' hours ' || (p_size % 60) " +
        "WHEN 1 THEN (p_size * 10) || ' minutes' " +
        "ELSE p_size || ' h' END AS raw FROM part), " +
        s"g AS (SELECT p_partkey, raw, " +
        s"COALESCE(TRY_CAST(regexp_extract(raw, '$pat', 1) AS DOUBLE), 0.0) AS h, " +
        s"COALESCE(TRY_CAST(regexp_extract(raw, '$pat', 2) AS DOUBLE), 0.0) AS m, " +
        s"COALESCE(TRY_CAST(regexp_extract(raw, '$pat', 3) AS DOUBLE), 0.0) AS mm FROM t) " +
        "SELECT p_partkey, raw, CASE WHEN mm = 0.0 THEN h * 60 + m ELSE mm END AS minutes " +
        "FROM g ORDER BY p_partkey"
    },

    "q_join_tokens" ->
      ("SELECT doc_id, array_to_string(string_split(text, ' ')[1:5], ' ') AS head5 " +
        "FROM documents ORDER BY doc_id"),

    "q_date_lenient" ->
      ("SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS raw, " +
        "CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS parsed " +
        "FROM orders ORDER BY o_orderkey"),

    "q_strict_cast" ->
      ("WITH t AS (SELECT event_id, CASE WHEN event_id % 7 = 0 " +
        "THEN 'x' || user_id ELSE CAST(user_id AS VARCHAR) END AS raw FROM events) " +
        "SELECT event_id, raw, TRY_CAST(raw AS BIGINT) AS parsed, " +
        "TRY_CAST(raw AS BIGINT) IS NULL AS corrupt FROM t ORDER BY event_id"),

    "q_bool_derive" ->
      ("SELECT event_id, event_type = 'purchase' AS is_purchase " +
        "FROM events ORDER BY event_id"),

    "q_consolidate_map" ->
      ("SELECT doc_id, '{' || concat_ws(',', " +
        "CASE WHEN doc_id % 3 = 0 AND lang IS NOT NULL " +
        "THEN '\"alt_a\":\"' || lang || '\"' END, " +
        "CASE WHEN doc_id % 5 = 0 AND source IS NOT NULL " +
        "THEN '\"alt_b\":\"' || upper(source) || '\"' END) || '}' AS alts_json " +
        "FROM documents ORDER BY doc_id"),

    "q_count_rows" ->
      "SELECT count(*) AS n FROM lineitem",

    "q_group_by_array" ->
      ("SELECT array_to_string(k, ' ') AS key2, cnt FROM " +
        "(SELECT string_split(text, ' ')[1:2] AS k, count(*) AS cnt " +
        "FROM documents GROUP BY 1) ORDER BY key2"),

    "q_slice" ->
      ("SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity FROM " +
        "(SELECT *, row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey) AS rn " +
        "FROM lineitem) WHERE rn > 100 AND rn <= 110 " +
        "ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey"),

    "q_prune_columns" ->
      ("WITH r AS (" +
        "SELECT 'doc_id' AS col_name, avg(CASE WHEN doc_id IS NULL THEN 1.0 ELSE 0.0 END) AS nr FROM documents " +
        "UNION ALL SELECT 'text', avg(CASE WHEN text IS NULL THEN 1.0 ELSE 0.0 END) FROM documents " +
        "UNION ALL SELECT 'lang', avg(CASE WHEN lang IS NULL THEN 1.0 ELSE 0.0 END) FROM documents " +
        "UNION ALL SELECT 'source', avg(CASE WHEN source IS NULL THEN 1.0 ELSE 0.0 END) FROM documents " +
        "UNION ALL SELECT 'n_chars', avg(CASE WHEN n_chars IS NULL THEN 1.0 ELSE 0.0 END) FROM documents " +
        "UNION ALL SELECT 'mostly_null', avg(CASE WHEN doc_id % 100 = 0 THEN 0.0 ELSE 1.0 END) FROM documents" +
        ") SELECT col_name FROM r WHERE nr < 0.9 ORDER BY col_name"),

    "q_from_json" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k " +
        "FROM events ORDER BY event_id"),

    "q_bpe_tokens" -> bpeOracle,

    "q_regex_tokens" ->
      ("WITH t AS (SELECT doc_id, list_filter(string_split_regex(" +
        "regexp_replace(text, '([^\\s A-Za-z0-9]+)', ' \\1 ', 'g'), '\\s+'), " +
        "x -> x <> '') AS toks FROM documents) " +
        "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_rtokens, " +
        "array_to_string(toks[1:8], '|') AS head_toks FROM t ORDER BY doc_id"),

    "q_set_except" ->
      ("SELECT c_nationkey AS nk FROM customer EXCEPT " +
        "SELECT s_nationkey AS nk FROM supplier WHERE s_suppkey % 2 = 0 ORDER BY nk"),

    "q_set_union" ->
      ("SELECT c_nationkey AS nk FROM customer UNION " +
        "SELECT s_nationkey AS nk FROM supplier ORDER BY nk"),

    "q_median_corr" ->
      ("SELECT round(quantile_cont(l_quantity, 0.5), 6) AS median_qty, " +
        "round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price FROM lineitem"),

    // fractional rank = min-rank + (ties−1)/2 — the average-of-positions
    // convention spearmanCorr's distributed ranks implement
    "q_spearman" ->
      ("WITH t AS (SELECT l_quantity AS a, l_extendedprice AS b FROM lineitem " +
        "WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL), " +
        "r AS (SELECT rank() OVER (ORDER BY a) + " +
        "(count(*) OVER (PARTITION BY a) - 1) / 2.0 AS ra, " +
        "rank() OVER (ORDER BY b) + " +
        "(count(*) OVER (PARTITION BY b) - 1) / 2.0 AS rb FROM t) " +
        "SELECT round(corr(ra, rb), 6) AS spearman_rho FROM r"),

    "q_scrub_pii" ->
      ("WITH t AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 " +
        "THEN text || ' user@example.com see https://example.com/x' ELSE text END AS dirty " +
        "FROM documents) " +
        "SELECT doc_id, regexp_replace(regexp_replace(substr(dirty, 1, 80), " +
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), " +
        "'https?://[^\\s]+', '<URL>', 'g') AS clean FROM t ORDER BY doc_id"),

    "q_cross_join" ->
      ("SELECT r_name, n_name FROM region CROSS JOIN nation " +
        "ORDER BY r_name, n_name"),

    // Row-wise replace semantics (matched ⇒ ENTIRE update row wins), so the
    // mirror uses CASE on the update key's presence, not per-column COALESCE.
    "q_upsert" ->
      ("WITH t AS (SELECT c_custkey, c_name, c_acctbal FROM customer), " +
        "u AS (SELECT c_custkey, c_name, CAST(0.0 AS DOUBLE) AS c_acctbal FROM t " +
        "WHERE c_custkey % 10 = 0 " +
        "UNION ALL SELECT c_custkey + 10000000, 'new_' || c_custkey, " +
        "CAST(1.0 AS DOUBLE) FROM t WHERE c_custkey % 100 = 0) " +
        "SELECT CASE WHEN u.c_custkey IS NOT NULL THEN u.c_custkey ELSE t.c_custkey END AS c_custkey, " +
        "CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE t.c_name END AS c_name, " +
        "CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE t.c_acctbal END AS c_acctbal " +
        "FROM t FULL JOIN u ON t.c_custkey = u.c_custkey ORDER BY c_custkey"),

    "q_group_median" ->
      ("SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 6) AS median_qty " +
        "FROM lineitem GROUP BY 1 ORDER BY 1"),

    "q_tfidf_top" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents), " +
        "tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2), " +
        "dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1), " +
        "n AS (SELECT count(*) AS N FROM documents), " +
        "sc AS (SELECT tf.doc_id, tf.token, " +
        "round(tf.tf * ln(CAST(n.N AS DOUBLE) / dfreq.df), 6) AS tfidf " +
        "FROM tf JOIN dfreq USING (token) CROSS JOIN n WHERE tf.doc_id % 50 = 0) " +
        "SELECT doc_id, token, tfidf, CAST(rn AS BIGINT) AS rn FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn FROM sc) " +
        "WHERE rn <= 3 ORDER BY doc_id, rn"),

    "q_token_freq" ->
      ("SELECT token, count(*) AS n FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) " +
        "GROUP BY token ORDER BY n DESC, token LIMIT 20"),

    "q_group_collect" ->
      ("SELECT source, array_to_string(list_sort(list_distinct(list(lang))), ',') AS langs, " +
        "count(*) AS n_docs FROM documents GROUP BY source ORDER BY source"),

    "q_asof_join" ->
      ("WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'), " +
        "v AS (SELECT user_id, ts, max(value) AS vval FROM events WHERE event_type = 'view' GROUP BY 1, 2) " +
        "SELECT p.event_id, p.user_id, round(v.vval, 6) AS vval " +
        "FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts " +
        "ORDER BY event_id"),

    "q_join_salted" ->
      ("SELECT o_orderstatus, count(*) AS n, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1 ORDER BY 1"),

    "q_distinct_two_phase" ->
      ("SELECT l_returnflag, count(DISTINCT l_partkey) AS n_distinct_l_partkey " +
        "FROM lineitem GROUP BY 1 ORDER BY 1"),

    "q_sessionize_batch" ->
      ("WITH x AS (SELECT user_id, ts, event_id, " +
        "CASE WHEN lag(ts) OVER w IS NULL " +
        "OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1 ELSE 0 END AS brk " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "y AS (SELECT user_id, ts, CAST(sum(brk) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq " +
        "FROM x) " +
        "SELECT user_id, session_seq, count(*) AS n_events, " +
        "strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start, " +
        "strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS s_end " +
        "FROM y GROUP BY 1, 2 ORDER BY 1, 2"),

    // Same sessionization CTEs; durations sum as exact epoch-ms LONGs
    // before the one pinned double division.
    "q_session_report" ->
      ("WITH x AS (SELECT user_id, ts, event_id, " +
        "CASE WHEN lag(ts) OVER w IS NULL " +
        "OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1 ELSE 0 END AS brk " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "y AS (SELECT user_id, ts, CAST(sum(brk) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq " +
        "FROM x), " +
        "se AS (SELECT user_id, session_seq, count(*) AS n_events, " +
        "min(ts) AS st, max(ts) AS en FROM y GROUP BY 1, 2), " +
        "dd AS (SELECT CAST(st AS DATE) AS day, n_events, " +
        "epoch_ms(en) - epoch_ms(st) AS dur FROM se) " +
        "SELECT day, CAST(count(*) AS BIGINT) AS n_sessions, " +
        "round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) AS bounce_rate, " +
        "round(CAST(sum(n_events) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS avg_events, " +
        "round(CAST(sum(dur) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000.0, 6) AS avg_duration_sec " +
        "FROM dd GROUP BY 1 ORDER BY 1"),

    // Same zero-delta drop, same integer run count, same fixed
    // parenthesization of the mu/sigma normal approximation.
    "q_runs_test" ->
      ("WITH s AS (SELECT CAST(o_orderdate AS DATE) AS d, " +
        "CAST(count(*) AS DOUBLE) AS x FROM orders GROUP BY 1), " +
        "dx AS (SELECT d, x - lag(x) OVER (ORDER BY d) AS dx FROM s), " +
        "sg AS (SELECT d, CASE WHEN dx > 0 THEN 1 ELSE -1 END AS sg " +
        "FROM dx WHERE dx IS NOT NULL AND dx <> 0), " +
        "r AS (SELECT sg, lag(sg) OVER (ORDER BY d) AS pr FROM sg), " +
        "c AS (SELECT CAST(sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up, " +
        "CAST(sum(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down, " +
        "CAST(1 + sum(CASE WHEN pr IS NOT NULL AND sg <> pr THEN 1 ELSE 0 END) AS BIGINT) AS runs FROM r) " +
        "SELECT n_up, n_down, runs, " +
        "round(2.0 * n_up::DOUBLE * n_down::DOUBLE / (n_up::DOUBLE + n_down::DOUBLE) + 1.0, 6) AS expected_runs, " +
        "round((runs::DOUBLE - (2.0 * n_up::DOUBLE * n_down::DOUBLE / (n_up::DOUBLE + n_down::DOUBLE) + 1.0)) / " +
        "sqrt((2.0 * n_up::DOUBLE * n_down::DOUBLE * (2.0 * n_up::DOUBLE * n_down::DOUBLE - (n_up::DOUBLE + n_down::DOUBLE))) / " +
        "((n_up::DOUBLE + n_down::DOUBLE) * (n_up::DOUBLE + n_down::DOUBLE) * ((n_up::DOUBLE + n_down::DOUBLE) - 1.0))), 6) AS z " +
        "FROM c"),

    // Same quantile_cont group medians, DECIMAL deviation sums, same
    // two-pass SSB/SSW with fixed parenthesization.
    "q_brown_forsythe" ->
      ("WITH b AS (SELECT event_type AS g, value AS v FROM events " +
        "WHERE value IS NOT NULL), " +
        "m AS (SELECT g, quantile_cont(v, 0.5) AS med FROM b GROUP BY 1), " +
        "z AS (SELECT b.g, abs(b.v - m.med) AS z FROM b JOIN m ON b.g = m.g), " +
        "grp AS (SELECT g, count(*) AS n, " +
        "sum(CAST(z AS DECIMAL(28,10))) AS sz FROM z GROUP BY 1), " +
        "gm AS (SELECT g, n, sz, CAST(sz AS DOUBLE) / CAST(n AS DOUBLE) AS mz FROM grp), " +
        "ww AS (SELECT sum(CAST((z.z - gm.mz) * (z.z - gm.mz) AS DECIMAL(28,10))) AS ssw " +
        "FROM z JOIN gm ON z.g = gm.g), " +
        "tt AS (SELECT sum(n) AS nt, count(*) AS k, sum(sz) AS szt FROM gm), " +
        "bb AS (SELECT max(tt.nt) AS nt, max(tt.k) AS k, " +
        "sum(CAST(CAST(gm.n AS DOUBLE) * ((gm.mz - CAST(tt.szt AS DOUBLE) / CAST(tt.nt AS DOUBLE)) * " +
        "(gm.mz - CAST(tt.szt AS DOUBLE) / CAST(tt.nt AS DOUBLE))) AS DECIMAL(28,10))) AS ssb " +
        "FROM gm CROSS JOIN tt) " +
        "SELECT CAST(k AS BIGINT) AS k_groups, CAST(nt AS BIGINT) AS n_total, " +
        "round(((CAST(nt AS DOUBLE) - CAST(k AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0)) * " +
        "(CAST(ssb AS DOUBLE) / CAST(ssw AS DOUBLE)), 6) AS w_stat " +
        "FROM bb CROSS JOIN ww"),

    // Same per-entity max flags, same Edwards-corrected statistic with
    // the NULL pin on zero discordance.
    "q_mcnemar" ->
      ("WITH per AS (SELECT user_id, " +
        "max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a, " +
        "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b " +
        "FROM events GROUP BY 1), " +
        "c AS (SELECT " +
        "CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00, " +
        "CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01, " +
        "CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10, " +
        "CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11 FROM per) " +
        "SELECT n00, n01, n10, n11, " +
        "CASE WHEN n01 + n10 = 0 THEN NULL ELSE " +
        "round(greatest(CAST(abs(n01 - n10) AS DOUBLE) - 1.0, 0.0) * " +
        "greatest(CAST(abs(n01 - n10) AS DOUBLE) - 1.0, 0.0) / " +
        "CAST(n01 + n10 AS DOUBLE), 6) END AS chi2 FROM c"),

    // Same unsmoothed p/q doubles, IEEE-exact sqrt terms, DECIMAL BC sum.
    "q_hellinger" ->
      ("WITH ta AS (SELECT unnest(string_split(text, ' ')) AS token " +
        "FROM documents WHERE doc_id % 2 = 0), " +
        "tb AS (SELECT unnest(string_split(text, ' ')) AS token " +
        "FROM documents WHERE doc_id % 2 = 1), " +
        "ca AS (SELECT token, count(*) AS ca FROM ta WHERE token <> '' GROUP BY 1), " +
        "cb AS (SELECT token, count(*) AS cb FROM tb WHERE token <> '' GROUP BY 1), " +
        "j AS (SELECT coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb " +
        "FROM ca FULL OUTER JOIN cb ON ca.token = cb.token), " +
        "t AS (SELECT sum(ca) AS ta, sum(cb) AS tb FROM j), " +
        "p AS (SELECT sqrt((CAST(ca AS DOUBLE) / CAST(t.ta AS DOUBLE)) * " +
        "(CAST(cb AS DOUBLE) / CAST(t.tb AS DOUBLE))) AS term FROM j CROSS JOIN t) " +
        "SELECT CAST(count(*) AS BIGINT) AS vocab, " +
        "round(CAST(sum(CAST(term AS DECIMAL(28,14))) AS DOUBLE), 6) AS bhattacharyya, " +
        "round(sqrt(greatest(1.0 - CAST(sum(CAST(term AS DECIMAL(28,14))) AS DOUBLE), 0.0)), 6) AS hellinger " +
        "FROM p"),

    // Same element-order normalization fold, DECIMAL resultant sums,
    // same (||S||^2 - n) / (n(n-1)) readout with the singleton NULL pin.
    "q_embedding_dispersion" ->
      ("WITH v AS MATERIALIZED (SELECT label AS grp, embedding::DOUBLE[] AS v " +
        "FROM embeddings WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0), " +
        "vh AS MATERIALIZED (SELECT grp, round(sqrt(list_dot_product(v, v)), 9) AS nrm, " +
        "list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vh FROM v), " +
        "pe AS (SELECT grp, i AS p, vh[i] AS xh FROM vh, " +
        "unnest(generate_series(1, len(vh))) AS u(i)), " +
        "s AS (SELECT grp, p, CAST(sum(CAST(xh AS DECIMAL(28,14))) AS DOUBLE) AS s " +
        "FROM pe GROUP BY 1, 2), " +
        "sq AS (SELECT grp, CAST(sum(CAST(s * s AS DECIMAL(28,14))) AS DOUBLE) AS ssq " +
        "FROM s GROUP BY 1), " +
        "cnt AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_vecs, " +
        "round(CAST(sum(CAST(nrm AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) AS mean_norm " +
        "FROM vh GROUP BY 1) " +
        "SELECT cnt.grp, n_vecs, mean_norm, " +
        "CASE WHEN n_vecs < 2 THEN NULL ELSE " +
        "round((ssq - CAST(n_vecs AS DOUBLE)) / " +
        "(CAST(n_vecs AS DOUBLE) * (CAST(n_vecs AS DOUBLE) - 1.0)), 6) END AS mean_pairwise_cos, " +
        "round(sqrt(ssq) / CAST(n_vecs AS DOUBLE), 6) AS mean_resultant_norm " +
        "FROM cnt JOIN sq ON cnt.grp = sq.grp ORDER BY cnt.grp"),

    // Same observed-cells-only entropy sums in DECIMAL, same marginal
    // H tables, same NULL pin on a constant column.
    "q_theils_u" ->
      ("WITH obs AS (SELECT l_returnflag AS a, l_linestatus AS b, " +
        "count(*) AS o FROM lineitem GROUP BY 1, 2), " +
        "rt AS (SELECT a, sum(o) AS rt FROM obs GROUP BY 1), " +
        "ct AS (SELECT b, sum(o) AS ct FROM obs GROUP BY 1), " +
        "nn AS (SELECT sum(o) AS n FROM obs), " +
        "ha AS (SELECT -CAST(sum(CAST(round((CAST(rt AS DOUBLE) / CAST(nn.n AS DOUBLE)) * " +
        "ln(CAST(rt AS DOUBLE) / CAST(nn.n AS DOUBLE)), 9) AS DECIMAL(28,14))) AS DOUBLE) AS ha " +
        "FROM rt CROSS JOIN nn), " +
        "hb AS (SELECT -CAST(sum(CAST(round((CAST(ct AS DOUBLE) / CAST(nn.n AS DOUBLE)) * " +
        "ln(CAST(ct AS DOUBLE) / CAST(nn.n AS DOUBLE)), 9) AS DECIMAL(28,14))) AS DOUBLE) AS hb " +
        "FROM ct CROSS JOIN nn), " +
        "cond AS (SELECT " +
        "-CAST(sum(CAST(round((CAST(o AS DOUBLE) / CAST(nn.n AS DOUBLE)) * " +
        "ln(CAST(o AS DOUBLE) / CAST(ct.ct AS DOUBLE)), 9) AS DECIMAL(28,14))) AS DOUBLE) AS hab, " +
        "-CAST(sum(CAST(round((CAST(o AS DOUBLE) / CAST(nn.n AS DOUBLE)) * " +
        "ln(CAST(o AS DOUBLE) / CAST(rt.rt AS DOUBLE)), 9) AS DECIMAL(28,14))) AS DOUBLE) AS hba, " +
        "CAST(max(nn.n) AS BIGINT) AS n " +
        "FROM obs JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN nn) " +
        "SELECT n, round(ha, 6) AS h_a, round(hb, 6) AS h_b, " +
        "CASE WHEN ha = 0.0 THEN NULL ELSE round((ha - hab) / ha, 6) END AS u_a_given_b, " +
        "CASE WHEN hb = 0.0 THEN NULL ELSE round((hb - hba) / hb, 6) END AS u_b_given_a " +
        "FROM cond CROSS JOIN ha CROSS JOIN hb"),

    // Same rule raters, same full-outer marginal join for the chance
    // term, DECIMAL p_e sum, NULL pin at p_e = 1.
    "q_cohens_kappa" ->
      ("WITH r AS (SELECT " +
        "CASE WHEN length(text) > 800 THEN 'long' ELSE 'short' END AS r1, " +
        "CASE WHEN len(regexp_extract_all(text, '[A-Za-z]+')) > 150 THEN 'long' ELSE 'short' END AS r2 " +
        "FROM documents), " +
        "obs AS (SELECT r1, r2, count(*) AS o FROM r GROUP BY 1, 2), " +
        "tot AS (SELECT sum(o) AS n, " +
        "sum(CASE WHEN r1 = r2 THEN o ELSE 0 END) AS diag FROM obs), " +
        "rt AS (SELECT r1 AS k, sum(o) AS rt FROM obs GROUP BY 1), " +
        "ct AS (SELECT r2 AS k, sum(o) AS ct FROM obs GROUP BY 1), " +
        "pe AS (SELECT CAST(sum(CAST((CAST(coalesce(rt, 0) AS DOUBLE) / CAST(tot.n AS DOUBLE)) * " +
        "(CAST(coalesce(ct, 0) AS DOUBLE) / CAST(tot.n AS DOUBLE)) AS DECIMAL(28,14))) AS DOUBLE) AS pe " +
        "FROM rt FULL OUTER JOIN ct ON rt.k = ct.k CROSS JOIN tot) " +
        "SELECT CAST(n AS BIGINT) AS n, " +
        "round(CAST(diag AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_observed, " +
        "round(pe, 6) AS p_chance, " +
        "CASE WHEN pe = 1.0 THEN NULL ELSE " +
        "round((CAST(diag AS DOUBLE) / CAST(n AS DOUBLE) - pe) / (1.0 - pe), 6) END AS kappa " +
        "FROM tot CROSS JOIN pe"),

    // Same monthly block maxima, DECIMAL moment sums, same pinned
    // pi/Euler-gamma literals and fixed parenthesization.
    "q_gumbel_fit" ->
      ("WITH s AS (SELECT CAST(o_orderdate AS DATE) AS d, " +
        "CAST(count(*) AS DOUBLE) AS x FROM orders GROUP BY 1), " +
        "b AS (SELECT date_trunc('month', d) AS m, max(x) AS mx FROM s GROUP BY 1), " +
        "mo AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks, " +
        "sum(CAST(mx AS DECIMAL(28,8))) AS s1, " +
        "sum(CAST(mx * mx AS DECIMAL(28,8))) AS s2 FROM b) " +
        "SELECT n_blocks, " +
        "round(CAST(s1 AS DOUBLE) / CAST(n_blocks AS DOUBLE), 6) AS mean_max, " +
        "round(sqrt((CAST(s2 AS DOUBLE) - CAST(n_blocks AS DOUBLE) * " +
        "(CAST(s1 AS DOUBLE) / CAST(n_blocks AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n_blocks AS DOUBLE))) / " +
        "(CAST(n_blocks AS DOUBLE) - 1.0)) * sqrt(6.0) / 3.141592653589793, 6) AS beta, " +
        "round(CAST(s1 AS DOUBLE) / CAST(n_blocks AS DOUBLE) - 0.5772156649015329 * " +
        "(sqrt((CAST(s2 AS DOUBLE) - CAST(n_blocks AS DOUBLE) * " +
        "(CAST(s1 AS DOUBLE) / CAST(n_blocks AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n_blocks AS DOUBLE))) / " +
        "(CAST(n_blocks AS DOUBLE) - 1.0)) * sqrt(6.0) / 3.141592653589793), 6) AS mu, " +
        "round((CAST(s1 AS DOUBLE) / CAST(n_blocks AS DOUBLE) - 0.5772156649015329 * " +
        "(sqrt((CAST(s2 AS DOUBLE) - CAST(n_blocks AS DOUBLE) * " +
        "(CAST(s1 AS DOUBLE) / CAST(n_blocks AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n_blocks AS DOUBLE))) / " +
        "(CAST(n_blocks AS DOUBLE) - 1.0)) * sqrt(6.0) / 3.141592653589793)) - " +
        "(sqrt((CAST(s2 AS DOUBLE) - CAST(n_blocks AS DOUBLE) * " +
        "(CAST(s1 AS DOUBLE) / CAST(n_blocks AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n_blocks AS DOUBLE))) / " +
        "(CAST(n_blocks AS DOUBLE) - 1.0)) * sqrt(6.0) / 3.141592653589793) * " +
        "ln(-ln(0.9)), 6) AS return_level_10 FROM mo"),

    // Same canonical edge set, same degree-oriented triangle count, same
    // deg < 2 zero pin.
    "q_clustering_coeff" ->
      (s"WITH $mhPairsCtes, " +
        "e AS (SELECT id1 AS a, id2 AS b FROM pairs), " +
        "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM e e1 " +
        "JOIN e e2 ON e1.b = e2.a JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b), " +
        "u AS (SELECT unnest([x, y, z]) AS node FROM tri), " +
        "tc AS (SELECT node, CAST(count(*) AS BIGINT) AS nt FROM u GROUP BY 1), " +
        "d AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM " +
        "(SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1) " +
        "SELECT d.node, degree, coalesce(tc.nt, 0) AS n_triangles, " +
        "CASE WHEN degree < 2 THEN 0.0 ELSE " +
        "round(2.0 * CAST(coalesce(tc.nt, 0) AS DOUBLE) / " +
        "(CAST(degree AS DOUBLE) * (CAST(degree AS DOUBLE) - 1.0)), 6) END AS clustering_coeff " +
        "FROM d LEFT JOIN tc ON d.node = tc.node ORDER BY d.node"),

    // Same paired daily series, DECIMAL moments, pinned z literal.
    "q_method_agreement" -> methodAgreementOracle,

    // Same duration-grain per-group cells, reverse-cumulative risk sets,
    // DECIMAL expectation/variance sums.
    "q_logrank" ->
      ("WITH subj AS (SELECT user_id, " +
        "datediff('day', CAST(min(ts) AS DATE), " +
        "CAST(coalesce(min(CASE WHEN event_type = 'purchase' THEN ts END), " +
        "max(ts)) AS DATE)) AS t, " +
        "CASE WHEN min(CASE WHEN event_type = 'purchase' THEN ts END) " +
        "IS NOT NULL THEN 1 ELSE 0 END AS o, " +
        "CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS g " +
        "FROM events GROUP BY 1), " +
        "pt AS (SELECT t, " +
        "sum(CASE WHEN g = 0 THEN o ELSE 0 END) AS d1, " +
        "sum(CASE WHEN g = 1 THEN o ELSE 0 END) AS d2, " +
        "sum(1 - g) AS l1, sum(g) AS l2 FROM subj GROUP BY 1), " +
        "rk AS (SELECT t, d1, d2, " +
        "sum(l1) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND " +
        "UNBOUNDED FOLLOWING) AS n1, " +
        "sum(l2) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND " +
        "UNBOUNDED FOLLOWING) AS n2 FROM pt), " +
        "f AS (SELECT t, d1, d2, n1, n2, d1 + d2 AS d, n1 + n2 AS n FROM rk " +
        "WHERE d1 + d2 > 0 AND n1 + n2 > 1), " +
        "ag AS (SELECT CAST(sum(d1) AS BIGINT) AS o1, " +
        "sum(CAST(CAST(n1 AS DOUBLE) * CAST(d AS DOUBLE) / CAST(n AS DOUBLE) " +
        "AS DECIMAL(28,10))) AS e1, " +
        "sum(CAST(CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "(CAST(n2 AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "CAST(n - d AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0) " +
        "AS DECIMAL(28,10))) AS v FROM f) " +
        "SELECT o1 AS observed_a, round(CAST(e1 AS DOUBLE), 6) AS expected_a, " +
        "CASE WHEN CAST(v AS DOUBLE) = 0.0 THEN NULL ELSE " +
        "round((CAST(o1 AS DOUBLE) - CAST(e1 AS DOUBLE)) * " +
        "(CAST(o1 AS DOUBLE) - CAST(e1 AS DOUBLE)) / CAST(v AS DOUBLE), 6) " +
        "END AS chi2 FROM ag"),

    // Same vocab join and margin expectations, same 0*ln0 guards, same
    // (g2 DESC, token) order.
    "q_keyness" ->
      ("WITH ta AS (SELECT unnest(string_split(text, ' ')) AS token " +
        "FROM documents WHERE doc_id % 2 = 0), " +
        "tb AS (SELECT unnest(string_split(text, ' ')) AS token " +
        "FROM documents WHERE doc_id % 2 = 1), " +
        "ca AS (SELECT token, count(*) AS ca FROM ta WHERE token <> '' GROUP BY 1), " +
        "cb AS (SELECT token, count(*) AS cb FROM tb WHERE token <> '' GROUP BY 1), " +
        "j AS (SELECT coalesce(ca.token, cb.token) AS token, " +
        "coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb " +
        "FROM ca FULL OUTER JOIN cb ON ca.token = cb.token), " +
        "t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM j) " +
        "SELECT token, CAST(ca AS BIGINT) AS n_a, CAST(cb AS BIGINT) AS n_b, " +
        "round(2.0 * (CASE WHEN ca > 0 THEN CAST(ca AS DOUBLE) * " +
        "ln(CAST(ca AS DOUBLE) / (CAST(t.na AS DOUBLE) * " +
        "(CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE)) / " +
        "(CAST(t.na AS DOUBLE) + CAST(t.nb AS DOUBLE)))) ELSE 0.0 END + " +
        "CASE WHEN cb > 0 THEN CAST(cb AS DOUBLE) * " +
        "ln(CAST(cb AS DOUBLE) / (CAST(t.nb AS DOUBLE) * " +
        "(CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE)) / " +
        "(CAST(t.na AS DOUBLE) + CAST(t.nb AS DOUBLE)))) ELSE 0.0 END), 6) AS g2, " +
        "CASE WHEN CAST(ca AS DOUBLE) / CAST(t.na AS DOUBLE) >= " +
        "CAST(cb AS DOUBLE) / CAST(t.nb AS DOUBLE) THEN 'a' ELSE 'b' END AS enriched_in " +
        "FROM j CROSS JOIN t ORDER BY g2 DESC, token LIMIT 40"),

    // Same per-unit DECIMAL totals, sample moments, pinned z literal.
    "q_ratio_ci" -> ratioCiOracle,

    // Same moment-fitted beta prior over >= 5-trial keys, same shrunken
    // rate arithmetic and (rate DESC, key) order.
    "q_eb_shrinkage" -> ebShrinkageOracle,

    // Same full-block R/S per (size, block) with DECIMAL cumulative
    // deviations, 9-dp block values, DECIMAL log-log OLS.
    "q_hurst" -> hurstOracle,

    // Same stratum 2x2 cells, DECIMAL MH sums, same crude-OR contrast.
    "q_mantel_haenszel" ->
      ("WITH b AS (SELECT hour(ts) AS s, " +
        "CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS e, " +
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y FROM events), " +
        "c AS (SELECT s, " +
        "sum(CASE WHEN e = 1 AND y = 1 THEN 1 ELSE 0 END) AS aa, " +
        "sum(CASE WHEN e = 1 AND y = 0 THEN 1 ELSE 0 END) AS bb, " +
        "sum(CASE WHEN e = 0 AND y = 1 THEN 1 ELSE 0 END) AS cc, " +
        "sum(CASE WHEN e = 0 AND y = 0 THEN 1 ELSE 0 END) AS dd FROM b GROUP BY 1), " +
        "g AS (SELECT CAST(count(*) AS BIGINT) AS n_strata, " +
        "sum(aa) AS ta, sum(bb) AS tb, sum(cc) AS tc, sum(dd) AS td, " +
        "sum(CAST(CAST(aa AS DOUBLE) * CAST(dd AS DOUBLE) / " +
        "CAST(aa + bb + cc + dd AS DOUBLE) AS DECIMAL(28,10))) AS num, " +
        "sum(CAST(CAST(bb AS DOUBLE) * CAST(cc AS DOUBLE) / " +
        "CAST(aa + bb + cc + dd AS DOUBLE) AS DECIMAL(28,10))) AS den FROM c) " +
        "SELECT n_strata, " +
        "CASE WHEN tb * tc = 0 THEN NULL ELSE " +
        "round(CAST(ta AS DOUBLE) * CAST(td AS DOUBLE) / " +
        "(CAST(tb AS DOUBLE) * CAST(tc AS DOUBLE)), 6) END AS or_crude, " +
        "CASE WHEN CAST(den AS DOUBLE) = 0.0 THEN NULL ELSE " +
        "round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) END AS or_mh FROM g"),

    // Same per-customer DECIMAL revenue, same entity/between DECIMAL
    // term sums, within = total - between on both sides.
    "q_theil_index" ->
      ("WITH j AS (SELECT c_custkey, c_nationkey, o_totalprice FROM orders " +
        "JOIN customer ON o_custkey = c_custkey), " +
        "pc AS (SELECT c_custkey, c_nationkey AS g, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS x " +
        "FROM j GROUP BY 1, 2), " +
        "b AS (SELECT g, x FROM pc WHERE x IS NOT NULL AND x > 0), " +
        "gr AS (SELECT g, count(*) AS ng, sum(CAST(x AS DECIMAL(38,10))) AS sg " +
        "FROM b GROUP BY 1), " +
        "t AS (SELECT sum(ng) AS n, sum(sg) AS st FROM gr), " +
        "tm AS (SELECT g, sum(CAST(round((x / CAST(t.st AS DOUBLE)) * " +
        "ln(x / (CAST(t.st AS DOUBLE) / CAST(t.n AS DOUBLE))), 9) AS DECIMAL(28,14))) AS tt " +
        "FROM b CROSS JOIN t GROUP BY 1), " +
        "o AS (SELECT CAST(max(t.n) AS BIGINT) AS n, " +
        "CAST(count(*) AS BIGINT) AS n_groups, sum(tt) AS total, " +
        "sum(CAST(round((CAST(sg AS DOUBLE) / CAST(t.st AS DOUBLE)) * " +
        "ln((CAST(sg AS DOUBLE) / CAST(gr.ng AS DOUBLE)) / " +
        "(CAST(t.st AS DOUBLE) / CAST(t.n AS DOUBLE))), 9) AS DECIMAL(28,14))) AS betw " +
        "FROM gr JOIN tm USING (g) CROSS JOIN t) " +
        "SELECT n, n_groups, round(CAST(total AS DOUBLE), 6) AS theil_total, " +
        "round(CAST(betw AS DOUBLE), 6) AS theil_between, " +
        "round(CAST(total AS DOUBLE) - CAST(betw AS DOUBLE), 6) AS theil_within FROM o"),

    // Same per-crawl distinct fingerprints, same Chapman arithmetic.
    "q_capture_recapture" ->
      ("WITH a AS (SELECT DISTINCT md5(regexp_replace(lower(trim(text)), " +
        "'\\s+', ' ', 'g')) AS fp FROM documents " +
        "WHERE text IS NOT NULL AND doc_id % 3 < 2), " +
        "b AS (SELECT DISTINCT md5(regexp_replace(lower(trim(text)), " +
        "'\\s+', ' ', 'g')) AS fp FROM documents " +
        "WHERE text IS NOT NULL AND doc_id % 3 > 0), " +
        "j AS (SELECT CASE WHEN a.fp IS NULL THEN 0 ELSE 1 END AS ca, " +
        "CASE WHEN b.fp IS NULL THEN 0 ELSE 1 END AS cb " +
        "FROM a FULL OUTER JOIN b ON a.fp = b.fp), " +
        "m AS (SELECT CAST(sum(ca) AS BIGINT) AS n1, " +
        "CAST(sum(cb) AS BIGINT) AS n2, " +
        "CAST(sum(ca * cb) AS BIGINT) AS n_overlap FROM j) " +
        "SELECT n1, n2, n_overlap, " +
        "round((CAST(n1 AS DOUBLE) + 1.0) * (CAST(n2 AS DOUBLE) + 1.0) / " +
        "(CAST(n_overlap AS DOUBLE) + 1.0) - 1.0, 6) AS n_estimated, " +
        "round(sqrt((CAST(n1 AS DOUBLE) + 1.0) * (CAST(n2 AS DOUBLE) + 1.0) * " +
        "(CAST(n1 AS DOUBLE) - CAST(n_overlap AS DOUBLE)) * " +
        "(CAST(n2 AS DOUBLE) - CAST(n_overlap AS DOUBLE)) / " +
        "((CAST(n_overlap AS DOUBLE) + 1.0) * (CAST(n_overlap AS DOUBLE) + 1.0) * " +
        "(CAST(n_overlap AS DOUBLE) + 2.0))), 6) AS se FROM m"),

    // Same count-of-counts compression, same Chao1/Good-Turing scalars.
    "q_vocab_richness" ->
      ("WITH c AS (SELECT token, count(*) AS c FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) " +
        "WHERE token <> '' GROUP BY 1), " +
        "cc AS (SELECT c, count(*) AS m FROM c GROUP BY 1), " +
        "a AS (SELECT CAST(sum(m) AS BIGINT) AS v_obs, " +
        "CAST(sum(c * m) AS BIGINT) AS n_tokens, " +
        "CAST(sum(CASE WHEN c = 1 THEN m ELSE 0 END) AS BIGINT) AS singletons, " +
        "CAST(sum(CASE WHEN c = 2 THEN m ELSE 0 END) AS BIGINT) AS doubletons FROM cc) " +
        "SELECT v_obs, n_tokens, singletons, doubletons, " +
        "CASE WHEN doubletons = 0 THEN NULL ELSE " +
        "round(CAST(v_obs AS DOUBLE) + CAST(singletons AS DOUBLE) * " +
        "CAST(singletons AS DOUBLE) / (2.0 * CAST(doubletons AS DOUBLE)), 6) END AS chao1, " +
        "round(CAST(singletons AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS unseen_mass " +
        "FROM a"),

    // Same pooled-span bins, DECIMAL min-mass sum.
    "q_overlap_coefficient" ->
      ("WITH b AS (SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS g, " +
        "CAST(value AS DOUBLE) AS v FROM events WHERE value IS NOT NULL), " +
        "bo AS (SELECT min(v) AS lo, max(v) AS hi FROM b), " +
        "c AS (SELECT CASE WHEN hi = lo THEN 0 ELSE " +
        "least(greatest(CAST(floor((v - lo) / ((hi - lo) / 20.0)) AS BIGINT), 0), 19) END AS bin, " +
        "sum(1 - g) AS ca, sum(g) AS cb FROM b CROSS JOIN bo GROUP BY 1), " +
        "t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c) " +
        "SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b, " +
        "CAST(count(*) AS BIGINT) AS n_bins_used, " +
        "round(CAST(sum(CAST(least(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE), " +
        "CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) AS DECIMAL(28,14))) AS DOUBLE), 6) AS overlap " +
        "FROM c CROSS JOIN t"),

    // Same decomposition CTEs as q_stl_decompose, then the component
    // variances off DECIMAL moments of the 6-dp-pinned columns.
    "q_stl_strength" -> stlStrengthOracle,

    // Same first-seen/conditional-sum checkpoints, DECIMAL log-log OLS.
    "q_heaps_law" -> heapsLawOracle,

    // Same per-key lead, types-squared transition cells, DECIMAL entropy
    // sum, perplexity off the unrounded rate.
    "q_markov_entropy" ->
      ("WITH e AS (SELECT user_id, event_type, " +
        "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt " +
        "FROM events), " +
        "tr AS (SELECT event_type AS prev, nxt, count(*) AS n FROM e " +
        "WHERE nxt IS NOT NULL GROUP BY 1, 2), " +
        "mg AS (SELECT prev, sum(n) AS np FROM tr GROUP BY 1), " +
        "tt AS (SELECT sum(n) AS t FROM tr), " +
        "h AS (SELECT CAST(max(tt.t) AS BIGINT) AS n_transitions, " +
        "CAST(count(DISTINCT tr.prev) AS BIGINT) AS n_states, " +
        "-CAST(sum(CAST(round((CAST(tr.n AS DOUBLE) / CAST(tt.t AS DOUBLE)) * " +
        "ln(CAST(tr.n AS DOUBLE) / CAST(mg.np AS DOUBLE)), 9) AS DECIMAL(28,14))) AS DOUBLE) AS hh " +
        "FROM tr JOIN mg USING (prev) CROSS JOIN tt) " +
        "SELECT n_transitions, n_states, round(hh, 6) AS entropy_rate, " +
        "round(exp(hh), 6) AS perplexity FROM h"),

    // Same per-doc Flesch banding (readability's counts), band-sized
    // cumulative, same clamped fractional-keep arithmetic.
    "q_token_budget" ->
      ("WITH d AS (SELECT doc_id, text, " +
        "len(regexp_extract_all(text, '[A-Za-z]+')) AS w, " +
        "greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s, " +
        "len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y " +
        "FROM documents WHERE text IS NOT NULL), " +
        "f AS (SELECT doc_id, text, round(206.835 - " +
        "1.015 * CAST(w AS DOUBLE) / CAST(s AS DOUBLE) - " +
        "84.6 * CAST(y AS DOUBLE) / CAST(w AS DOUBLE), 6) AS fl FROM d WHERE w > 0), " +
        "b AS (SELECT least(greatest(CAST(floor(fl / 10.0) AS BIGINT), -5), 12) AS band, " +
        "len(list_filter(string_split(text, ' '), x -> x <> '')) AS ntok FROM f), " +
        "c AS (SELECT band, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(ntok) AS BIGINT) AS tokens FROM b GROUP BY 1), " +
        "r AS (SELECT band, n_docs, tokens, coalesce(sum(tokens) OVER " +
        "(ORDER BY band DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev FROM c) " +
        "SELECT band, n_docs, tokens, CAST(prev + tokens AS BIGINT) AS cum_tokens, " +
        "round(least(greatest((100000.0 - CAST(prev AS DOUBLE)) / CAST(tokens AS DOUBLE), 0.0), 1.0), 6) AS keep_fraction " +
        "FROM r ORDER BY band DESC"),

    // Same exact quartiles, pinned -1/3 exponent, ln-ratio Sturges.
    "q_bin_advisor" ->
      ("WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem " +
        "WHERE l_extendedprice IS NOT NULL), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n, min(v) AS lo, max(v) AS hi, " +
        "quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3 FROM b) " +
        "SELECT n, round(lo, 6) AS lo, round(hi, 6) AS hi, " +
        "round(q3 - q1, 6) AS iqr, " +
        "CASE WHEN q3 - q1 = 0.0 THEN NULL ELSE " +
        "round(2.0 * (q3 - q1) * pow(CAST(n AS DOUBLE), -1.0 / 3.0), 6) END AS fd_width, " +
        "CASE WHEN q3 - q1 = 0.0 THEN NULL ELSE " +
        "CAST(ceil(round((hi - lo) / (2.0 * (q3 - q1) * pow(CAST(n AS DOUBLE), -1.0 / 3.0)), 9)) AS BIGINT) END AS fd_bins, " +
        "CAST(ceil(round(ln(CAST(n AS DOUBLE)) / ln(2.0), 9)) AS BIGINT) + 1 AS sturges_bins FROM m"),

    // Shared deterministic-kmeans CTEs; same row-local a/b distances,
    // rounded-then-DECIMAL-mean readouts, k-squared DB cross join.
    "q_cluster_quality" -> clusterQualityOracle,

    // CC chain + LPA chain over the same pairs, contingency NMI/ARI.
    "q_cluster_agreement" -> clusterAgreementOracle,

    // Same pinned-order cumulative, same md5 draws; the oracle may use
    // the plain range join DuckDB is happy with — values are identical.
    "q_neg_sampling" ->
      ("WITH tk AS (SELECT token, count(*) AS c FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) " +
        "WHERE token <> '' GROUP BY 1), " +
        "cw AS (SELECT token, round(pow(CAST(c AS DOUBLE), 0.75), 9) AS w, " +
        "coalesce(sum(round(pow(CAST(c AS DOUBLE), 0.75), 9)) OVER (ORDER BY token " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS lo FROM tk), " +
        "ch AS (SELECT token, w, lo, lo + w AS hi FROM cw), " +
        "z AS (SELECT max(hi) AS z FROM ch), " +
        "dr AS (SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || " +
        "CAST(j AS VARCHAR) || '#2'), 1, 8))::BIGINT / 4294967296.0 AS u " +
        "FROM documents, unnest(range(3)) AS t(j)), " +
        "m AS (SELECT ch.token, ch.w FROM dr CROSS JOIN z JOIN ch " +
        "ON ch.lo <= dr.u * z.z AND dr.u * z.z < ch.hi), " +
        "nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM dr), " +
        "g AS (SELECT token, CAST(count(*) AS BIGINT) AS n_sampled, " +
        "max(w) AS tw FROM m GROUP BY 1) " +
        "SELECT token, n_sampled, " +
        "round(CAST(nd.nd AS DOUBLE) * (tw / z.z), 6) AS expected, " +
        "round(CAST(n_sampled AS DOUBLE) / (CAST(nd.nd AS DOUBLE) * (tw / z.z)), 6) AS ratio " +
        "FROM g CROSS JOIN nd CROSS JOIN z " +
        "ORDER BY n_sampled DESC, token LIMIT 30"),

    // Same conditional DECIMAL moments, same ITT / first-stage ratio.
    "q_iv_wald" ->
      ("WITH b AS (SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS z, " +
        "CASE WHEN user_id % 2 = 1 AND value > 50 THEN 1 ELSE 0 END AS t, " +
        "value AS y FROM events WHERE value IS NOT NULL), " +
        "m AS (SELECT CAST(sum(z) AS BIGINT) AS n_z1, " +
        "CAST(sum(1 - z) AS BIGINT) AS n_z0, " +
        "sum(CAST(CASE WHEN z = 1 THEN y ELSE 0.0 END AS DECIMAL(38,10))) AS y1, " +
        "sum(CAST(CASE WHEN z = 0 THEN y ELSE 0.0 END AS DECIMAL(38,10))) AS y0, " +
        "sum(CASE WHEN z = 1 THEN t ELSE 0 END) AS t1, " +
        "sum(CASE WHEN z = 0 THEN t ELSE 0 END) AS t0 FROM b) " +
        "SELECT n_z1, n_z0, " +
        "round(CAST(y1 AS DOUBLE) / CAST(n_z1 AS DOUBLE) - " +
        "CAST(y0 AS DOUBLE) / CAST(n_z0 AS DOUBLE), 6) AS itt, " +
        "round(CAST(t1 AS DOUBLE) / CAST(n_z1 AS DOUBLE) - " +
        "CAST(t0 AS DOUBLE) / CAST(n_z0 AS DOUBLE), 6) AS first_stage, " +
        "round((CAST(y1 AS DOUBLE) / CAST(n_z1 AS DOUBLE) - " +
        "CAST(y0 AS DOUBLE) / CAST(n_z0 AS DOUBLE)) / " +
        "(CAST(t1 AS DOUBLE) / CAST(n_z1 AS DOUBLE) - " +
        "CAST(t0 AS DOUBLE) / CAST(n_z0 AS DOUBLE)), 6) AS late FROM m"),

    // Same DECIMAL prefix sums over the calendar-bounded series, same
    // between-variance gain with fixed parenthesization.
    "q_best_split" -> bestSplitOracle,

    // Same 1/d weights (doc-local position join mirrors the row-local
    // fan-out), DECIMAL weight sums, same total tie order.
    "q_cooccurrence" ->
      ("WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), " +
        "x -> x <> '') AS toks FROM documents WHERE text IS NOT NULL), " +
        "p AS (SELECT doc_id, toks[i] AS w, i FROM t, " +
        "unnest(generate_series(1, len(toks))) AS u(i) WHERE len(toks) >= 2), " +
        "pr AS (SELECT a.w AS w1, b.w AS w2, " +
        "1.0 / CAST(b.i - a.i AS DOUBLE) AS wt FROM p a JOIN p b " +
        "ON a.doc_id = b.doc_id AND b.i > a.i AND b.i <= a.i + 4) " +
        "SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pairs, " +
        "round(CAST(sum(CAST(wt AS DECIMAL(28,10))) AS DOUBLE), 6) AS weight " +
        "FROM pr GROUP BY 1, 2 ORDER BY weight DESC, w1, w2 LIMIT 50"),

    // Same absmax scales, same clamp(round(x/s)) dequantize, DECIMAL
    // cosine/error means with the zero pins.
    "q_embedding_quantize" ->
      ("WITH v AS MATERIALIZED (SELECT label AS grp, embedding::DOUBLE[] AS v " +
        "FROM embeddings WHERE len(embedding) = 64 AND " +
        "list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0), " +
        "pe AS (SELECT i AS p, max(abs(v[i])) / 127.0 AS s FROM v, " +
        "unnest(generate_series(1, 64)) AS u(i) GROUP BY 1), " +
        "sc AS (SELECT list(s ORDER BY p) AS sv FROM pe), " +
        "dq AS MATERIALIZED (SELECT grp, v, " +
        "list_transform(generate_series(1, 64), i -> " +
        "CASE WHEN sv[i] = 0.0 THEN 0.0 ELSE " +
        "greatest(least(round(v[i] / sv[i], 0), 127.0), -127.0) * sv[i] END) AS q " +
        "FROM v CROSS JOIN sc), " +
        "cg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_vecs, " +
        "round(CAST(sum(CAST(CASE WHEN list_dot_product(q, q) = 0 THEN 0.0 ELSE " +
        "round(list_dot_product(v, q) / " +
        "(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(q, q))), 6) END " +
        "AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_cos_quant " +
        "FROM dq GROUP BY 1), " +
        "er AS (SELECT grp, round(CAST(sum(CAST(abs(v[i] - q[i]) " +
        "AS DECIMAL(28,14))) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_abs_err " +
        "FROM dq, unnest(generate_series(1, 64)) AS u(i) GROUP BY 1) " +
        "SELECT cg.grp AS grp, n_vecs, mean_cos_quant, mean_abs_err " +
        "FROM cg JOIN er ON cg.grp = er.grp ORDER BY cg.grp"),

    // Shared recursive-BPE chain; same word counts and DECIMAL ratio.
    "q_bpe_fertility" ->
      (s"WITH RECURSIVE $bpeTokCtes, " +
        "f AS (SELECT a.doc_id, d.source, len(a.toks) AS nb, " +
        "len(list_filter(string_split(d.text, ' '), x -> x <> '')) AS nw " +
        "FROM agg a JOIN documents d USING (doc_id)) " +
        "SELECT source AS grp, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(nw) AS BIGINT) AS n_words, CAST(sum(nb) AS BIGINT) AS n_bpe, " +
        "round(CAST(sum(CAST(nb AS DECIMAL(28,8))) AS DOUBLE) / " +
        "CAST(sum(CAST(nw AS DECIMAL(28,8))) AS DOUBLE), 6) AS fertility " +
        "FROM f WHERE nw > 0 GROUP BY 1 ORDER BY 1"),

    // Same normalized-text fingerprint, same min-id keeper and per-source
    // token rollup.
    "q_dedup_savings" ->
      ("WITH b AS (SELECT source AS grp, doc_id, " +
        "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp, " +
        "len(list_filter(string_split(text, ' '), x -> x <> '')) AS ntok " +
        "FROM documents WHERE text IS NOT NULL), " +
        "k AS (SELECT fp, min(doc_id) AS keep FROM b GROUP BY 1) " +
        "SELECT grp, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(CASE WHEN doc_id = keep THEN 1 ELSE 0 END) AS BIGINT) AS n_unique, " +
        "CAST(sum(ntok) AS BIGINT) AS tokens_total, " +
        "CAST(sum(CASE WHEN doc_id = keep THEN ntok ELSE 0 END) AS BIGINT) AS tokens_unique, " +
        "round(1.0 - CAST(sum(CASE WHEN doc_id = keep THEN ntok ELSE 0 END) AS DOUBLE) / " +
        "CAST(sum(ntok) AS DOUBLE), 6) AS token_savings " +
        "FROM b JOIN k USING (fp) GROUP BY 1 ORDER BY 1"),

    // Same conditional DECIMAL moments, same pooled-sd and z-literal
    // arithmetic with fixed parenthesization.
    "q_mde" -> mdeOracle,

    // Same degree/min-degree histograms, same bounded k-ladder and the
    // N_k < 2 NULL pin.
    "q_rich_club" ->
      (s"WITH $mhPairsCtes, " +
        "e AS (SELECT id1 AS a, id2 AS b FROM pairs), " +
        "d AS (SELECT node, count(*) AS deg FROM " +
        "(SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1), " +
        "dh AS (SELECT deg, count(*) AS dn FROM d GROUP BY 1), " +
        "em AS (SELECT least(da.deg, db.deg) AS m, count(*) AS en " +
        "FROM e JOIN d da ON da.node = e.a JOIN d db ON db.node = e.b GROUP BY 1), " +
        "kk AS (SELECT unnest(generate_series(1, 10)) AS k), " +
        "nk AS (SELECT k, sum(CASE WHEN deg > k THEN dn ELSE 0 END) AS n_nodes " +
        "FROM kk CROSS JOIN dh GROUP BY 1), " +
        "ek AS (SELECT k, sum(CASE WHEN m > k THEN en ELSE 0 END) AS n_edges " +
        "FROM kk CROSS JOIN em GROUP BY 1) " +
        "SELECT CAST(nk.k AS INTEGER) AS k, CAST(n_nodes AS BIGINT) AS n_nodes, " +
        "CAST(n_edges AS BIGINT) AS n_edges, " +
        "CASE WHEN n_nodes < 2 THEN NULL ELSE " +
        "round(2.0 * CAST(n_edges AS DOUBLE) / " +
        "(CAST(n_nodes AS DOUBLE) * (CAST(n_nodes AS DOUBLE) - 1.0)), 6) END AS phi " +
        "FROM nk JOIN ek ON nk.k = ek.k ORDER BY nk.k"),

    // Same per-value mid-ranks off the cumulative, DECIMAL R_g and tie
    // sums, same fixed H parenthesization with the C = 0 NULL pin.
    // Mirrors Stats.friedmanTest: 6-dp DECIMAL cell means, complete-block
    // restriction, within-block average-tie pairwise ranks, Q and W with
    // the same tie divisor 1 - sum(t^3-t)/(n*k*(k^2-1)) (NULL at 0).
    "q_friedman" ->
      ("WITH cells AS (SELECT l_orderkey % 40 AS b, l_returnflag AS t, " +
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) " +
        "/ count(*), 6) AS v FROM lineitem " +
        "WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2), " +
        "kk AS (SELECT count(DISTINCT t) AS k FROM cells), " +
        "comp AS (SELECT b FROM cells GROUP BY b " +
        "HAVING count(*) = (SELECT k FROM kk)), " +
        "cc AS (SELECT cells.* FROM cells JOIN comp USING (b)), " +
        "tg AS (SELECT b, v, count(*) AS t FROM cc GROUP BY b, v), " +
        "tts AS (SELECT coalesce(sum(t * t * t - t), 0) AS tt FROM tg), " +
        "rk AS (SELECT a.b, a.t, " +
        "sum(CASE WHEN o.v < a.v THEN 1 ELSE 0 END) + " +
        "(sum(CASE WHEN o.v = a.v THEN 1 ELSE 0 END) + 1) / 2.0 AS r " +
        "FROM cc a JOIN cc o ON a.b = o.b GROUP BY a.b, a.t), " +
        "mr AS (SELECT t, count(*) AS n, " +
        "CAST(sum(CAST(r AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS rbar " +
        "FROM rk GROUP BY t), " +
        "s AS (SELECT max(n) AS n_blocks, max(kk.k) AS k, " +
        "CAST(sum(CAST((rbar - (CAST(kk.k AS DOUBLE) + 1.0) / 2.0) * " +
        "(rbar - (CAST(kk.k AS DOUBLE) + 1.0) / 2.0) AS DECIMAL(28,8))) " +
        "AS DOUBLE) AS ss FROM mr CROSS JOIN kk), " +
        "f AS (SELECT n_blocks, k, " +
        "12.0 * CAST(n_blocks AS DOUBLE) / (CAST(k AS DOUBLE) * " +
        "(CAST(k AS DOUBLE) + 1.0)) * ss AS qraw, " +
        "1.0 - CAST(tt AS DOUBLE) / (CAST(n_blocks AS DOUBLE) * " +
        "CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)) " +
        "AS corr FROM s CROSS JOIN tts) " +
        "SELECT n_blocks, k AS k_treatments, " +
        "round(CASE WHEN corr = 0.0 THEN NULL ELSE qraw / corr END, 6) " +
        "+ 0.0 AS q, " +
        "round(CASE WHEN corr = 0.0 THEN NULL ELSE qraw / corr END / " +
        "(CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0)), 6) " +
        "+ 0.0 AS kendalls_w FROM f"),

    // Mirrors Stats.grubbsTest: DECIMAL moments, 6-dp |dev| argmax with
    // (dev, x) tie order, sample sd, G guarded on n>=3 and sd>0.
    "q_grubbs" ->
      ("WITH m AS (SELECT c_mktsegment AS grp, count(*) AS n, " +
        "CAST(sum(CAST(c_acctbal AS DECIMAL(28,8))) AS DOUBLE) AS s, " +
        "CAST(sum(CAST(c_acctbal * c_acctbal AS DECIMAL(28,8))) AS DOUBLE) AS s2 " +
        "FROM customer WHERE c_acctbal IS NOT NULL GROUP BY 1), " +
        "v AS (SELECT grp, n, s / CAST(n AS DOUBLE) AS mean, " +
        "sqrt(greatest((s2 - s * s / CAST(n AS DOUBLE)) / " +
        "(CAST(n AS DOUBLE) - 1.0), 0.0)) AS sd FROM m), " +
        "d AS (SELECT v.grp, round(abs(c.c_acctbal - v.mean), 6) AS dev, " +
        "c.c_acctbal AS x FROM customer c JOIN v ON c.c_mktsegment = v.grp " +
        "WHERE c.c_acctbal IS NOT NULL), " +
        "su AS (SELECT grp, x AS suspect FROM (SELECT grp, x, " +
        "row_number() OVER (PARTITION BY grp ORDER BY dev DESC, x DESC) AS rn " +
        "FROM d) WHERE rn = 1) " +
        "SELECT v.grp, v.n, round(v.mean, 6) + 0.0 AS mean, " +
        "round(v.sd, 6) + 0.0 AS sd, " +
        "CASE WHEN v.n >= 3 AND v.sd > 0 THEN " +
        "round(abs(su.suspect - v.mean) / v.sd, 6) + 0.0 END AS g, " +
        "su.suspect FROM v JOIN su USING (grp) ORDER BY grp"),

    "q_kruskal_wallis" ->
      ("WITH b AS (SELECT event_type AS g, value FROM events " +
        "WHERE value IS NOT NULL), " +
        "pv AS (SELECT g, value, count(*) AS c FROM b GROUP BY 1, 2), " +
        "pt AS (SELECT value, sum(c) AS t FROM pv GROUP BY 1), " +
        "r AS (SELECT value, t, coalesce(sum(t) OVER (ORDER BY value " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef FROM pt), " +
        "rk AS (SELECT value, CAST(bef AS DOUBLE) + (t + 1) / 2.0 AS rnk FROM r), " +
        "gg AS (SELECT pv.g, sum(c) AS ng, " +
        "sum(CAST(CAST(c AS DOUBLE) * rnk AS DECIMAL(28,8))) AS rg " +
        "FROM pv JOIN rk USING (value) GROUP BY 1), " +
        "tt AS (SELECT sum(t) AS n, " +
        "sum(CAST(t * t * t - t AS DECIMAL(28,8))) AS tc FROM pt), " +
        "cc AS (SELECT CAST(count(*) AS BIGINT) AS k_groups, " +
        "CAST(max(tt.n) AS BIGINT) AS n_total, " +
        "sum(CAST(CAST(rg AS DOUBLE) * CAST(rg AS DOUBLE) / " +
        "CAST(ng AS DOUBLE) AS DECIMAL(28,8))) AS s, max(tc) AS tc " +
        "FROM gg CROSS JOIN tt) " +
        "SELECT k_groups, n_total, " +
        "CASE WHEN 1.0 - CAST(tc AS DOUBLE) / " +
        "(CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)) = 0.0 " +
        "THEN NULL ELSE round(12.0 / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1.0)) * CAST(s AS DOUBLE) - " +
        "3.0 * (CAST(n_total AS DOUBLE) + 1.0), 6) END AS h, " +
        "CASE WHEN 1.0 - CAST(tc AS DOUBLE) / " +
        "(CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)) = 0.0 " +
        "THEN NULL ELSE round((12.0 / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1.0)) * CAST(s AS DOUBLE) - " +
        "3.0 * (CAST(n_total AS DOUBLE) + 1.0)) / " +
        "(1.0 - CAST(tc AS DOUBLE) / " +
        "(CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE))), 6) " +
        "END AS h_tie_corrected FROM cc"),

    // Same positivity-filtered stratum cells, DECIMAL outcome sums, same
    // share-weighted difference arithmetic.
    "q_psm_att" -> psmAttOracle,

    "q_psm_diag_kln" -> psmDiagKLnOracle,

    // Mirrors Stats.sprt (p0=.15, p1=.22, alpha=beta=.05): integer k/n
    // cumulative windows, per-row LLR from the same literal ratios,
    // first boundary crossing via row_number, end state via max-n row.
    "q_sprt" ->
      ("WITH b AS (SELECT user_id % 2 AS arm, ts, event_id, " +
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s FROM events), " +
        "c AS (SELECT arm, count(*) OVER w AS n, " +
        "CAST(sum(s) OVER w AS BIGINT) AS k FROM b " +
        "WINDOW w AS (PARTITION BY arm ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), " +
        "r AS (SELECT arm, n, k, CAST(k AS DOUBLE) * ln(0.22 / 0.15) + " +
        "CAST(n - k AS DOUBLE) * ln((1.0 - 0.22) / (1.0 - 0.15)) AS llr FROM c), " +
        "f AS (SELECT arm, n AS n_total, k AS k_total, llr AS llrf FROM " +
        "(SELECT r.*, row_number() OVER (PARTITION BY arm ORDER BY n DESC) AS rn " +
        "FROM r) WHERE rn = 1), " +
        "st AS (SELECT arm, n AS stop_n, llr AS llrs FROM " +
        "(SELECT r.*, row_number() OVER (PARTITION BY arm ORDER BY n) AS rn " +
        "FROM r WHERE llr >= ln((1.0 - 0.05) / 0.05) " +
        "OR llr <= ln(0.05 / (1.0 - 0.05))) WHERE rn = 1) " +
        "SELECT f.arm, f.n_total, f.k_total, " +
        "round(f.llrf, 6) + 0.0 AS llr_final, st.stop_n, " +
        "round(st.llrs, 6) + 0.0 AS stop_llr, " +
        "CASE WHEN st.stop_n IS NULL THEN 'continue' " +
        "WHEN st.llrs >= ln((1.0 - 0.05) / 0.05) THEN 'reject_h0' " +
        "ELSE 'accept_h0' END AS decision " +
        "FROM f LEFT JOIN st USING (arm) ORDER BY arm"),

    // Mirrors Stats.mannKendall: same pairwise sign sum over the daily
    // table, tie-corrected variance, continuity-corrected z.
    "q_mann_kendall" ->
      ("WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d, " +
        "CAST(count(*) AS DOUBLE) AS y FROM orders GROUP BY 1), " +
        "nd AS (SELECT count(*) AS n FROM daily), " +
        "sa AS (SELECT CAST(coalesce(sum(CASE WHEN b.y > a.y THEN 1 " +
        "WHEN b.y < a.y THEN -1 ELSE 0 END), 0) AS BIGINT) AS s " +
        "FROM daily a JOIN daily b ON a.d < b.d), " +
        "tm AS (SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) " +
        "AS BIGINT) AS tm FROM " +
        "(SELECT count(*) AS t FROM daily GROUP BY y)), " +
        "f AS (SELECT nd.n AS n_days, sa.s AS s, " +
        "(CAST(nd.n AS DOUBLE) * (CAST(nd.n AS DOUBLE) - 1.0) * " +
        "(2.0 * CAST(nd.n AS DOUBLE) + 5.0) - CAST(tm.tm AS DOUBLE)) / 18.0 " +
        "AS vs FROM nd CROSS JOIN sa CROSS JOIN tm) " +
        "SELECT n_days, s, round(vs, 6) + 0.0 AS var_s, " +
        "CASE WHEN vs > 0 THEN round(CASE WHEN s > 0 THEN " +
        "(CAST(s AS DOUBLE) - 1.0) / sqrt(vs) WHEN s < 0 THEN " +
        "(CAST(s AS DOUBLE) + 1.0) / sqrt(vs) ELSE 0.0 END, 6) + 0.0 END " +
        "AS z FROM f"),

    // Mirrors Stats.jarqueBera: DECIMAL(38,8) raw power sums, the same
    // fixed-parenthesization central-moment expansion, n>=4 / m2>0 pins.
    "q_jarque_bera" ->
      ("WITH m AS (SELECT c_mktsegment AS grp, count(*) AS n, " +
        "CAST(sum(CAST(c_acctbal AS DECIMAL(38,8))) AS DOUBLE) AS s1, " +
        "CAST(sum(CAST(c_acctbal * c_acctbal AS DECIMAL(38,8))) AS DOUBLE) AS s2, " +
        "CAST(sum(CAST(c_acctbal * c_acctbal * c_acctbal AS DECIMAL(38,8))) " +
        "AS DOUBLE) AS s3, " +
        "CAST(sum(CAST(c_acctbal * c_acctbal * c_acctbal * c_acctbal " +
        "AS DECIMAL(38,8))) AS DOUBLE) AS s4 " +
        "FROM customer WHERE c_acctbal IS NOT NULL GROUP BY 1), " +
        "v AS (SELECT grp, n, CAST(n AS DOUBLE) AS nd, " +
        "s1 / CAST(n AS DOUBLE) AS mean, s2, s3, s4 FROM m), " +
        "c AS (SELECT grp, n, nd, " +
        "s2 / nd - mean * mean AS m2, " +
        "s3 / nd - 3.0 * mean * (s2 / nd) + 2.0 * mean * mean * mean AS m3, " +
        "s4 / nd - 4.0 * mean * (s3 / nd) + 6.0 * mean * mean * (s2 / nd) " +
        "- 3.0 * mean * mean * mean * mean AS m4 FROM v), " +
        "r AS (SELECT grp, n, nd, m2, m3 / (m2 * sqrt(m2)) AS skew, " +
        "m4 / (m2 * m2) AS kurt FROM c) " +
        "SELECT grp, n, " +
        "CASE WHEN n >= 4 AND m2 > 0 THEN round(skew, 6) + 0.0 END AS skewness, " +
        "CASE WHEN n >= 4 AND m2 > 0 THEN round(kurt, 6) + 0.0 END AS kurtosis, " +
        "CASE WHEN n >= 4 AND m2 > 0 THEN round(nd / 6.0 * (skew * skew + " +
        "(kurt - 3.0) * (kurt - 3.0) / 4.0), 6) + 0.0 END AS jb " +
        "FROM r ORDER BY grp"),

    // Mirrors Stats.cochranQ: same max-per-cell binaries, complete-block
    // restriction, exact integer row/column sums, zero-denominator pin.
    "q_cochran_q" ->
      ("WITH cells AS (SELECT user_id % 60 AS b, event_type AS t, " +
        "max(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS x " +
        "FROM events GROUP BY 1, 2), " +
        "kk AS (SELECT count(DISTINCT t) AS k FROM cells), " +
        "comp AS (SELECT b FROM cells GROUP BY b " +
        "HAVING count(*) = (SELECT k FROM kk)), " +
        "cc AS (SELECT cells.* FROM cells JOIN comp USING (b)), " +
        "cs AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS nn, " +
        "CAST(coalesce(sum(c * c), 0) AS BIGINT) AS sc2 FROM " +
        "(SELECT sum(x) AS c FROM cc GROUP BY t)), " +
        "rs AS (SELECT count(*) AS n_blocks, " +
        "CAST(coalesce(sum(r * r), 0) AS BIGINT) AS sr2 FROM " +
        "(SELECT sum(x) AS r FROM cc GROUP BY b)) " +
        "SELECT rs.n_blocks, kk.k AS k_treatments, cs.nn AS n_success, " +
        "CASE WHEN CAST(kk.k AS DOUBLE) * CAST(cs.nn AS DOUBLE) - " +
        "CAST(rs.sr2 AS DOUBLE) > 0 THEN " +
        "round((CAST(kk.k AS DOUBLE) - 1.0) * (CAST(kk.k AS DOUBLE) * " +
        "CAST(cs.sc2 AS DOUBLE) - CAST(cs.nn AS DOUBLE) * CAST(cs.nn AS DOUBLE)) " +
        "/ (CAST(kk.k AS DOUBLE) * CAST(cs.nn AS DOUBLE) - " +
        "CAST(rs.sr2 AS DOUBLE)), 6) + 0.0 END AS q " +
        "FROM rs CROSS JOIN cs CROSS JOIN kk"),

    // Mirrors Stats.tost (margin 5.0, alpha 0.05): Welch se on DECIMAL
    // conditional moments, 6-dp z first, then the A&S 26.2.17 polynomial
    // (phiCdf's pinned literals) on the ROUNDED z, 9-dp p each side.
    "q_tost" ->
      ("WITH b AS (SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS g, " +
        "value AS x FROM events WHERE value IS NOT NULL), " +
        "m AS (SELECT CAST(sum(1 - g) AS BIGINT) AS n_a, " +
        "CAST(sum(g) AS BIGINT) AS n_b, " +
        "sum(CAST(CASE WHEN g = 0 THEN x ELSE 0.0 END AS DECIMAL(38,10))) AS sa, " +
        "sum(CAST(CASE WHEN g = 1 THEN x ELSE 0.0 END AS DECIMAL(38,10))) AS sb, " +
        "sum(CAST(CASE WHEN g = 0 THEN x * x ELSE 0.0 END AS DECIMAL(38,10))) AS qa, " +
        "sum(CAST(CASE WHEN g = 1 THEN x * x ELSE 0.0 END AS DECIMAL(38,10))) AS qb " +
        "FROM b), " +
        "c AS (SELECT n_a, n_b, CAST(n_a AS DOUBLE) AS na, " +
        "CAST(n_b AS DOUBLE) AS nb, " +
        "CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma, " +
        "CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb, qa, qb FROM m), " +
        "v AS (SELECT n_a, n_b, na, nb, ma, mb, " +
        "(CAST(qa AS DOUBLE) - na * ma * ma) / (na - 1.0) AS va, " +
        "(CAST(qb AS DOUBLE) - nb * mb * mb) / (nb - 1.0) AS vb FROM c), " +
        "s AS (SELECT n_a, n_b, na, nb, mb - ma AS diff, " +
        "sqrt(va / na + vb / nb) AS se, " +
        "sqrt(((na - 1.0) * va + (nb - 1.0) * vb) / (na + nb - 2.0)) AS sp " +
        "FROM v), " +
        "z AS (SELECT n_a, n_b, diff, se, sp, " +
        "round((diff + 5.0) / se, 6) + 0.0 AS zlo, " +
        "round((5.0 - diff) / se, 6) + 0.0 AS zhi FROM s), " +
        "t AS (SELECT z.*, 1.0 / (1.0 + 0.2316419 * abs(zlo)) AS tlo, " +
        "1.0 / (1.0 + 0.2316419 * abs(zhi)) AS thi FROM z), " +
        "u AS (SELECT t.*, " +
        "1.0 - exp(abs(zlo) * abs(zlo) * (-0.5)) * 0.3989422804014327 * " +
        "(tlo * (0.319381530 + tlo * (-0.356563782 + tlo * (1.781477937 + " +
        "tlo * (-1.821255978 + tlo * 1.330274429))))) AS uplo, " +
        "1.0 - exp(abs(zhi) * abs(zhi) * (-0.5)) * 0.3989422804014327 * " +
        "(thi * (0.319381530 + thi * (-0.356563782 + thi * (1.781477937 + " +
        "thi * (-1.821255978 + thi * 1.330274429))))) AS uphi FROM t), " +
        "p AS (SELECT u.*, " +
        "round(1.0 - CASE WHEN zlo >= 0 THEN uplo ELSE 1.0 - uplo END, 9) AS plo, " +
        "round(1.0 - CASE WHEN zhi >= 0 THEN uphi ELSE 1.0 - uphi END, 9) AS phi " +
        "FROM u) " +
        "SELECT n_a, n_b, round(diff, 6) + 0.0 AS diff, " +
        "CASE WHEN se > 0 THEN round(diff / sp, 6) + 0.0 END AS cohens_d, " +
        "CASE WHEN se > 0 THEN zlo END AS z_lower, " +
        "CASE WHEN se > 0 THEN zhi END AS z_upper, " +
        "CASE WHEN se > 0 THEN greatest(plo, phi) END AS p_tost, " +
        "CASE WHEN se > 0 THEN greatest(plo, phi) < 0.05 END AS equivalent " +
        "FROM p"),

    // Mirrors Stats.bhAdjust over Stats.proportionPValues: grouped
    // conditional counters, 6-dp z, A&S p, rank + reverse running min.
    "q_prop_ztest_fdr" ->
      ("WITH c AS (SELECT c_mktsegment AS grp, " +
        "CAST(sum(CASE WHEN c_nationkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a, " +
        "CAST(sum(CASE WHEN c_nationkey % 2 = 0 AND c_acctbal > 5000 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS x_a, " +
        "CAST(sum(CASE WHEN c_nationkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b, " +
        "CAST(sum(CASE WHEN c_nationkey % 2 = 1 AND c_acctbal > 5000 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS x_b FROM customer GROUP BY 1), " +
        "e AS (SELECT c.*, " +
        "(CAST(x_a AS DOUBLE) + CAST(x_b AS DOUBLE)) / " +
        "(CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pooled FROM c), " +
        "se AS (SELECT e.*, sqrt(pooled * (1.0 - pooled) * " +
        "(1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) AS sev FROM e), " +
        "zz AS (SELECT se.*, round((CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) - " +
        "CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)) / sev, 6) + 0.0 AS z FROM se), " +
        "pv AS (SELECT grp, n_a, x_a, n_b, x_b, " +
        "CASE WHEN sev > 0 THEN z END AS z, " +
        "CASE WHEN sev > 0 THEN round(2.0 * (1.0 - (1.0 - " +
        "exp(abs(z) * abs(z) * (-0.5)) * 0.3989422804014327 * " +
        "((1.0 / (1.0 + 0.2316419 * abs(z))) * (0.319381530 + " +
        "(1.0 / (1.0 + 0.2316419 * abs(z))) * (-0.356563782 + " +
        "(1.0 / (1.0 + 0.2316419 * abs(z))) * (1.781477937 + " +
        "(1.0 / (1.0 + 0.2316419 * abs(z))) * (-1.821255978 + " +
        "(1.0 / (1.0 + 0.2316419 * abs(z))) * 1.330274429))))))), 9) END AS p " +
        "FROM zz), " +
        "ok AS (SELECT * FROM pv WHERE p IS NOT NULL), " +
        "mm AS (SELECT count(*) AS m FROM ok), " +
        "rk AS (SELECT ok.*, CAST(row_number() OVER (ORDER BY p, grp) " +
        "AS BIGINT) AS rank FROM ok), " +
        "rw AS (SELECT rk.*, CAST(mm.m AS DOUBLE) * p / " +
        "CAST(rank AS DOUBLE) AS raw FROM rk CROSS JOIN mm), " +
        "ad AS (SELECT grp, n_a, x_a, n_b, x_b, z, p, rank, " +
        "round(least(1.0, min(raw) OVER (ORDER BY rank ROWS BETWEEN " +
        "CURRENT ROW AND UNBOUNDED FOLLOWING)), 6) AS p_adj FROM rw) " +
        "SELECT grp, n_a, x_a, n_b, x_b, z, p, rank, p_adj, " +
        "p_adj <= 0.1 AS signif FROM ad ORDER BY grp"),

    // Mirrors Stats.pageHinkley (lambda 25, delta 0): calendar-bounded
    // daily windows, 9-dp terms into DECIMAL(38,9) cumulatives.
    "q_page_hinkley" ->
      ("WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d, " +
        "CAST(count(*) AS DOUBLE) AS x FROM orders GROUP BY 1), " +
        "t AS (SELECT d, x, count(*) OVER w AS i, " +
        "sum(CAST(x AS DECIMAL(38,9))) OVER w AS cum FROM daily " +
        "WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW)), " +
        "tt AS (SELECT d, round(x - CAST(cum AS DOUBLE) / " +
        "CAST(i AS DOUBLE) - 0.0, 9) + 0.0 AS term FROM t), " +
        "ph AS (SELECT d, sum(CAST(term AS DECIMAL(38,9))) OVER w AS v " +
        "FROM tt WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED " +
        "PRECEDING AND CURRENT ROW)), " +
        "g AS (SELECT d, CAST(v - min(v) OVER w AS DOUBLE) AS gap FROM ph " +
        "WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW)), " +
        "a AS (SELECT CAST(count(*) AS BIGINT) AS n_alarms, " +
        "min(d) AS first_alarm FROM g WHERE gap > 25.0), " +
        "s AS (SELECT count(*) AS n_days, round(max(gap), 6) + 0.0 " +
        "AS max_gap FROM g) " +
        "SELECT s.n_days, s.max_gap, coalesce(a.n_alarms, 0) AS n_alarms, " +
        "a.first_alarm FROM s CROSS JOIN a"),

    // Mirrors Stats.isotonicCalibration: same min-max 10-bin table as
    // q_calibration_decomp, then the PAV minimax identity
    // fit_i = max_{j<=i} min_{k>=i} mean(y over bins j..k) — every
    // interval mean is an exact long/long ratio, so min/max are
    // engine-exact.
    "q_isotonic" ->
      ("WITH b AS (SELECT CAST(value AS DOUBLE) AS s, CASE WHEN " +
        "event_type = 'purchase' THEN 1 ELSE 0 END AS y FROM events " +
        "WHERE value IS NOT NULL), " +
        "mm AS (SELECT min(s) AS lo, max(s) AS hi FROM b), " +
        "sc AS (SELECT CASE WHEN hi = lo THEN 0.5 ELSE (s - lo) / (hi - lo) " +
        "END AS p, y FROM b CROSS JOIN mm), " +
        "g AS (SELECT CAST(least(floor(p * 10), 9) AS BIGINT) AS bin, " +
        "count(*) AS nb, SUM(y) AS ny FROM sc GROUP BY 1), " +
        "c AS (SELECT bin, nb, ny, SUM(nb) OVER w AS cn, SUM(ny) OVER w AS cy " +
        "FROM g WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING " +
        "AND CURRENT ROW)), " +
        "iv AS (SELECT j.bin AS j, k.bin AS k, " +
        "CAST(k.cy - (j.cy - j.ny) AS DOUBLE) / " +
        "CAST(k.cn - (j.cn - j.nb) AS DOUBLE) AS avg " +
        "FROM c j JOIN c k ON j.bin <= k.bin), " +
        "mn AS (SELECT i.bin AS bin, i.nb, i.ny, iv.j, min(iv.avg) AS m " +
        "FROM c i JOIN iv ON iv.j <= i.bin AND iv.k >= i.bin " +
        "GROUP BY 1, 2, 3, 4), " +
        "f AS (SELECT bin, nb, ny, max(m) AS fit FROM mn GROUP BY 1, 2, 3) " +
        "SELECT bin, nb AS n, " +
        "round(CAST(ny AS DOUBLE) / CAST(nb AS DOUBLE), 6) + 0.0 AS rate_raw, " +
        "round(fit, 6) + 0.0 AS rate_isotonic FROM f ORDER BY bin"),

    // Mirrors Stats.overdispersion: exact long moments, the same
    // ((n * mean) * mean) parenthesization, NULL pin on n <= 1.
    "q_overdispersion" ->
      ("WITH per AS (SELECT event_type AS g, user_id AS e, count(*) AS c " +
        "FROM events GROUP BY 1, 2), " +
        "m AS (SELECT g, count(*) AS n_entities, " +
        "SUM(CAST(c AS DECIMAL(38,0))) AS s, " +
        "SUM(CAST(c * c AS DECIMAL(38,0))) AS ss FROM per GROUP BY 1), " +
        "k AS (SELECT g, n_entities, CAST(n_entities AS DOUBLE) AS nd, " +
        "CAST(s AS DOUBLE) / CAST(n_entities AS DOUBLE) AS mean, " +
        "CAST(ss AS DOUBLE) AS ssd, s FROM m), " +
        "v AS (SELECT g, n_entities, nd, mean, s, " +
        "(ssd - nd * mean * mean) / (nd - 1.0) AS var FROM k) " +
        "SELECT g AS \"group\", n_entities, round(mean, 6) + 0.0 AS mean_count, " +
        "CASE WHEN n_entities > 1 AND s > 0 THEN round(var, 6) + 0.0 END " +
        "AS var_count, " +
        "CASE WHEN n_entities > 1 AND s > 0 THEN round(var / mean, 6) + 0.0 " +
        "END AS dispersion, " +
        "CASE WHEN n_entities > 1 AND s > 0 THEN " +
        "round((nd - 1.0) * (var / mean), 6) + 0.0 END AS chi2 " +
        "FROM v ORDER BY g"),

    // Mirrors Stats.periodogram (maxPeriod 14 over the daily order
    // series): 9-dp-rounded centered counts and cos/sin of
    // (2pi * (t mod p)) / p — at most sum(p) < 120 distinct angle
    // constants — with DECIMAL(38,12) product sums.
    "q_periodogram" ->
      ("WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d, " +
        "CAST(count(*) AS DOUBLE) AS x FROM orders GROUP BY 1), " +
        "m AS (SELECT CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE) AS mraw, min(d) AS d0 FROM daily), " +
        "c AS (SELECT CAST(date_diff('day', d0, d) AS BIGINT) AS t, " +
        "round(x - round(mraw, 9), 9) + 0.0 AS cc FROM daily CROSS JOIN m), " +
        "tm AS (SELECT t, cc, period FROM c CROSS JOIN " +
        "(SELECT unnest(range(2, 15)) AS period)), " +
        "th AS (SELECT period, cc, (6.283185307179586 * " +
        "CAST(t % period AS DOUBLE)) / CAST(period AS DOUBLE) AS theta FROM tm), " +
        "tr AS (SELECT period, cc, round(cos(theta), 9) + 0.0 AS co, " +
        "round(sin(theta), 9) + 0.0 AS si FROM th), " +
        "tot AS (SELECT count(*) AS n, " +
        "SUM(CAST(cc * cc AS DECIMAL(38,12))) AS css FROM c), " +
        "ag AS (SELECT period, " +
        "SUM(CAST(cc * co AS DECIMAL(38,12))) AS sc, " +
        "SUM(CAST(cc * si AS DECIMAL(38,12))) AS ss FROM tr GROUP BY 1) " +
        "SELECT CAST(period AS BIGINT) AS period, " +
        "round((CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) + " +
        "CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)) / CAST(n AS DOUBLE), 6) " +
        "+ 0.0 AS power, " +
        "CASE WHEN CAST(css AS DOUBLE) > 0 THEN " +
        "round((CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) + " +
        "CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)) / " +
        "(CAST(n AS DOUBLE) * CAST(css AS DOUBLE)), 6) + 0.0 END " +
        "AS var_share FROM ag CROSS JOIN tot ORDER BY period"),

    // Mirrors TextAnalysis.zipfSlope (topN 64): same split/unnest
    // tokens, (count DESC, token) head, heapsLaw's exact OLS.
    "q_zipf_slope" ->
      ("WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token " +
        "FROM documents WHERE text IS NOT NULL), " +
        "cnt AS (SELECT token, count(*) AS c FROM tok " +
        "WHERE token <> '' GROUP BY 1), " +
        "head AS (SELECT token, c FROM cnt ORDER BY c DESC, token LIMIT 64), " +
        "rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, token) AS r " +
        "FROM head), " +
        "pts AS (SELECT round(ln(CAST(r AS DOUBLE)), 9) AS x, " +
        "round(ln(CAST(c AS DOUBLE)), 9) AS y FROM rk), " +
        "m AS (SELECT count(*) AS n_head, " +
        "sum(CAST(x AS DECIMAL(28,10))) AS sx, " +
        "sum(CAST(y AS DECIMAL(28,10))) AS sy, " +
        "sum(CAST(x * x AS DECIMAL(28,10))) AS sxx, " +
        "sum(CAST(y * y AS DECIMAL(28,10))) AS syy, " +
        "sum(CAST(x * y AS DECIMAL(28,10))) AS sxy FROM pts), " +
        "f AS (SELECT n_head, CAST(n_head AS DOUBLE) AS n, " +
        "CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy, " +
        "CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy, " +
        "CAST(sxy AS DOUBLE) AS sxy FROM m), " +
        "g AS (SELECT n_head, n, sx, sy, n * sxy - sx * sy AS covn, " +
        "n * sxx - sx * sx AS varxn, n * syy - sy * sy AS varyn FROM f) " +
        "SELECT n_head, round(covn / varxn, 6) + 0.0 AS slope, " +
        "round((sy - covn / varxn * sx) / n, 6) + 0.0 AS intercept, " +
        "CASE WHEN varyn > 0 THEN round(covn * covn / (varxn * varyn), 6) " +
        "+ 0.0 END AS r2 FROM g"),

    // Mirrors TextAnalysis.scriptMix: same 9-dp per-doc class fractions
    // (global-flag regexp_replace deletions), DECIMAL(28,9) group means.
    "q_script_mix" ->
      ("WITH b AS (SELECT source AS grp, " +
        "round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) " +
        "AS DOUBLE) / CAST(length(text) AS DOUBLE), 9) AS l, " +
        "round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) " +
        "AS DOUBLE) / CAST(length(text) AS DOUBLE), 9) AS d, " +
        "round(CAST(length(regexp_replace(text, '[^ ]', '', 'g')) " +
        "AS DOUBLE) / CAST(length(text) AS DOUBLE), 9) AS s, " +
        "round(1.0 - CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) " +
        "AS DOUBLE) / CAST(length(text) AS DOUBLE) - " +
        "CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) " +
        "AS DOUBLE) / CAST(length(text) AS DOUBLE) - " +
        "CAST(length(regexp_replace(text, '[^ ]', '', 'g')) " +
        "AS DOUBLE) / CAST(length(text) AS DOUBLE), 9) AS o " +
        "FROM documents WHERE text IS NOT NULL AND length(text) > 0) " +
        "SELECT grp, count(*) AS n_docs, " +
        "round(CAST(sum(CAST(l AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) " +
        "+ 0.0 AS letter_frac, " +
        "round(CAST(sum(CAST(d AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) " +
        "+ 0.0 AS digit_frac, " +
        "round(CAST(sum(CAST(s AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) " +
        "+ 0.0 AS space_frac, " +
        "round(CAST(sum(CAST(o AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) " +
        "+ 0.0 AS other_frac " +
        "FROM b GROUP BY grp ORDER BY grp"),

    // Mirrors TextAnalysis.piiAudit: scrubPii's exact RE2-safe email/URL
    // patterns counted with regexp_extract_all, integer rollups.
    "q_pii_audit" ->
      ("WITH b AS (SELECT source AS grp, " +
        "CAST(len(regexp_extract_all(text, " +
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS e, " +
        "CAST(len(regexp_extract_all(text, 'https?://[^\\s]+')) AS BIGINT) AS u " +
        "FROM documents WHERE text IS NOT NULL) " +
        "SELECT grp, count(*) AS n_docs, " +
        "CAST(sum(CASE WHEN e > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email, " +
        "CAST(sum(CASE WHEN u > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_url, " +
        "CAST(sum(e) AS BIGINT) AS email_hits, CAST(sum(u) AS BIGINT) AS url_hits, " +
        "round(CAST(sum(CASE WHEN e > 0 THEN 1 ELSE 0 END) + " +
        "sum(CASE WHEN u > 0 THEN 1 ELSE 0 END) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) AS affected_rate " +
        "FROM b GROUP BY grp ORDER BY grp"),


    "q_stratified_ate" ->
      ("WITH b AS (SELECT hour(ts) AS s, " +
        "CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS tr, value AS y " +
        "FROM events WHERE value IS NOT NULL), " +
        "c AS (SELECT s, sum(tr) AS nt, sum(1 - tr) AS nc, " +
        "sum(CAST(CASE WHEN tr = 1 THEN y ELSE 0.0 END AS DECIMAL(28,10))) AS st, " +
        "sum(CAST(CASE WHEN tr = 0 THEN y ELSE 0.0 END AS DECIMAL(28,10))) AS sc " +
        "FROM b GROUP BY 1 HAVING sum(tr) > 0 AND sum(1 - tr) > 0), " +
        "a AS (SELECT CAST(count(*) AS BIGINT) AS n_strata, " +
        "CAST(sum(nt + nc) AS BIGINT) AS n_used, " +
        "sum(nt) AS tnt, sum(nc) AS tnc, sum(st) AS tst, sum(sc) AS tsc, " +
        "sum(CAST(CAST(nt + nc AS DOUBLE) * " +
        "(CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) - " +
        "CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)) AS DECIMAL(28,10))) AS wsum FROM c) " +
        "SELECT n_strata, n_used, " +
        "round(CAST(tst AS DOUBLE) / CAST(tnt AS DOUBLE) - " +
        "CAST(tsc AS DOUBLE) / CAST(tnc AS DOUBLE), 6) AS diff_naive, " +
        "round(CAST(wsum AS DOUBLE) / CAST(n_used AS DOUBLE), 6) AS ate_stratified " +
        "FROM a"),

    // Same md5 deal, same per-replicate rank windows and 2-cell DECIMAL
    // sums, same add-one p with the reps+1 literal.
    "q_permutation_test" ->
      ("WITH b AS (SELECT CAST(event_id AS VARCHAR) AS id, " +
        "CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS g, value AS x " +
        "FROM events WHERE value IS NOT NULL), " +
        "t AS (SELECT sum(1 - g) AS na, sum(g) AS nb, " +
        "sum(CAST(CASE WHEN g = 0 THEN x ELSE 0.0 END AS DECIMAL(38,10))) AS sa, " +
        "sum(CAST(CASE WHEN g = 1 THEN x ELSE 0.0 END AS DECIMAL(38,10))) AS sb FROM b), " +
        "r AS (SELECT id, x, unnest(range(100)) AS rep FROM b), " +
        "h AS (SELECT rep, x, id, ('0x' || substr(md5(id || ':' || " +
        "CAST(rep AS VARCHAR) || '#1'), 1, 8))::BIGINT AS hh FROM r), " +
        "rk AS (SELECT rep, x, row_number() OVER " +
        "(PARTITION BY rep ORDER BY hh, id) AS rk FROM h), " +
        "pm AS (SELECT rep, x, rk <= t.nb AS isb FROM rk CROSS JOIN t), " +
        "d AS (SELECT rep, " +
        "CAST(sum(CAST(CASE WHEN isb THEN x ELSE 0.0 END AS DECIMAL(38,10))) AS DOUBLE) / " +
        "CAST(sum(CASE WHEN isb THEN 1 ELSE 0 END) AS DOUBLE) - " +
        "CAST(sum(CAST(CASE WHEN NOT isb THEN x ELSE 0.0 END AS DECIMAL(38,10))) AS DOUBLE) / " +
        "CAST(sum(CASE WHEN isb THEN 0 ELSE 1 END) AS DOUBLE) AS dd " +
        "FROM pm GROUP BY 1) " +
        "SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b, " +
        "round(max(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) - " +
        "CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)), 6) + 0.0 AS diff_obs, " +
        "CAST(max(100) AS BIGINT) AS reps, " +
        "round((1.0 + CAST(sum(CASE WHEN abs(dd) >= " +
        "abs(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) - " +
        "CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)) THEN 1 ELSE 0 END) AS DOUBLE)) / " +
        "101.0, 6) AS p_perm FROM d CROSS JOIN t"),

    // Same equi-width bins off the global span, same -log10 bin-share
    // surprisal in DECIMAL, same (score DESC, id) top-50.
    "q_hbos" ->
      ("WITH b AS (SELECT l_orderkey * 10 + l_linenumber AS id, " +
        "CAST(l_quantity AS DOUBLE) AS f_qty, " +
        "CAST(l_extendedprice AS DOUBLE) AS f_price, " +
        "CAST(l_discount AS DOUBLE) AS f_disc FROM lineitem " +
        "WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL " +
        "AND l_discount IS NOT NULL), " +
        "bo AS (SELECT min(f_qty) AS lo_qty, max(f_qty) AS hi_qty, " +
        "min(f_price) AS lo_price, max(f_price) AS hi_price, " +
        "min(f_disc) AS lo_disc, max(f_disc) AS hi_disc FROM b), " +
        "e AS (" +
        Seq("qty", "price", "disc").map(f =>
          s"SELECT id, '$f' AS fn, CASE WHEN hi_$f = lo_$f THEN 0 ELSE " +
          s"least(greatest(CAST(floor((f_$f - lo_$f) / " +
          s"((hi_$f - lo_$f) / 10.0)) AS BIGINT), 0), 9) END AS bin " +
          "FROM b CROSS JOIN bo").mkString(" UNION ALL ") +
        "), " +
        "c AS (SELECT fn, bin, count(*) AS nb FROM e GROUP BY 1, 2), " +
        "n AS (SELECT count(*) AS n FROM b), " +
        "s AS (SELECT id, sum(CAST(round(-log10(CAST(nb AS DOUBLE) / " +
        "CAST(n.n AS DOUBLE)), 9) AS DECIMAL(28,14))) AS sc " +
        "FROM e JOIN c USING (fn, bin) CROSS JOIN n GROUP BY 1) " +
        "SELECT id, round(CAST(sc AS DOUBLE), 6) AS score FROM s " +
        "ORDER BY score DESC, id LIMIT 50"),

    // Same half-count continuity correction, DECIMAL IV term sums, same
    // string-cast bins.
    "q_woe_iv" ->
      ("WITH base AS (SELECT " +
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y, " +
        "CAST(hour(ts) AS VARCHAR) AS f_hour, " +
        "CAST(CAST(least(floor(value / 50.0), 9.0) AS BIGINT) AS VARCHAR) AS f_band " +
        "FROM events), " +
        "e AS (SELECT 'hour' AS feature, f_hour AS bin, y FROM base " +
        "UNION ALL SELECT 'value_band', f_band, y FROM base), " +
        "c AS (SELECT feature, bin, sum(y) AS g, sum(1 - y) AS bb " +
        "FROM e GROUP BY 1, 2), " +
        "t AS (SELECT feature, sum(g) AS gt, sum(bb) AS bt FROM c GROUP BY 1), " +
        "w AS (SELECT c.feature, bin, g, bb, " +
        "(CAST(g AS DOUBLE) + 0.5) / (CAST(gt AS DOUBLE) + 0.5) AS pg, " +
        "(CAST(bb AS DOUBLE) + 0.5) / (CAST(bt AS DOUBLE) + 0.5) AS pb " +
        "FROM c JOIN t ON c.feature = t.feature), " +
        "iv AS (SELECT feature, sum(CAST(round((pg - pb) * ln(pg / pb), 9) " +
        "AS DECIMAL(28,14))) AS iv FROM w GROUP BY 1) " +
        "SELECT w.feature AS feature, bin, CAST(g AS BIGINT) AS n_pos, " +
        "CAST(bb AS BIGINT) AS n_neg, round(ln(pg / pb), 6) AS woe, " +
        "round(CAST(iv.iv AS DOUBLE), 6) AS iv " +
        "FROM w JOIN iv ON w.feature = iv.feature ORDER BY w.feature, bin"),

    // Same (category, fold) cells, DECIMAL label sums, same smoothed
    // hold-out arithmetic with the prior-10 literal on both sides.
    "q_target_encode" ->
      ("WITH b AS (SELECT event_type AS category, user_id % 5 AS fold, " +
        "value AS y FROM events WHERE value IS NOT NULL), " +
        "cf AS (SELECT category, fold, count(*) AS ncf, " +
        "sum(CAST(y AS DECIMAL(28,10))) AS scf FROM b GROUP BY 1, 2), " +
        "c AS (SELECT category, sum(ncf) AS nc, sum(scf) AS sc FROM cf GROUP BY 1), " +
        "g AS (SELECT sum(nc) AS n, sum(sc) AS s FROM c) " +
        "SELECT category, fold, CAST(nc - ncf AS BIGINT) AS n_oof, " +
        "round((CAST(sc - scf AS DOUBLE) + " +
        "10.0 * (CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE))) / " +
        "(CAST(nc - ncf AS DOUBLE) + 10.0), 6) AS encoding " +
        "FROM cf JOIN c USING (category) CROSS JOIN g " +
        "ORDER BY category, fold"),

    // Same per-(group, value) mid-rank positions, same 11-point exact
    // global grid and linear interpolation arithmetic.
    "q_quantile_normalize" ->
      ("WITH b AS (SELECT event_type AS grp, value FROM events " +
        "WHERE value IS NOT NULL), " +
        "pv AS (SELECT grp, value, count(*) AS t FROM b GROUP BY 1, 2), " +
        "ng AS (SELECT grp, sum(t) AS ng FROM pv GROUP BY 1), " +
        "r AS (SELECT grp, value, t, coalesce(sum(t) OVER " +
        "(PARTITION BY grp ORDER BY value " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef FROM pv), " +
        "rk AS (SELECT r.grp, value, " +
        "(CAST(bef AS DOUBLE) + (CAST(t AS DOUBLE) + 1.0) / 2.0 - 0.5) / " +
        "CAST(ng.ng AS DOUBLE) AS p FROM r JOIN ng ON r.grp = ng.grp), " +
        "gg AS (SELECT quantile_cont(value, " +
        "[0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]) AS g FROM b), " +
        "gr AS MATERIALIZED (SELECT i - 1 AS j, g[i] AS gv FROM gg, " +
        "unnest(generate_series(1, 11)) AS u(i)) " +
        "SELECT grp, value, round(p, 6) AS p, " +
        "round(glo.gv + (p * 10.0 - floor(p * 10.0)) * (ghi.gv - glo.gv), 6) " +
        "AS normalized " +
        "FROM rk JOIN gr glo ON CAST(floor(p * 10.0) AS INT) = glo.j " +
        "JOIN gr ghi ON least(CAST(floor(p * 10.0) AS INT) + 1, 10) = ghi.j " +
        "ORDER BY grp, value"),

    // Same planted twins, same sorted-neighbor blocking on balance, same
    // Laplace-smoothed m/u and log2 weights.
    "q_linkage_weights" ->
      (s"WITH $fsPairsCtes " +
        "SELECT * FROM (" +
        Seq("bal_close", "nation", "segment").map(f =>
          s"SELECT '$f' AS field, round(${fsM(f)}, 6) AS m, " +
          s"round(${fsU(f)}, 6) AS u, " +
          s"round(log2(${fsM(f)} / ${fsU(f)}), 6) AS w_agree, " +
          s"round(log2((1.0 - ${fsM(f)}) / (1.0 - ${fsU(f)})), 6) AS w_disagree " +
          "FROM ag").mkString(" UNION ALL ") +
        ") ORDER BY field"),

    // Same smoothed weights broadcast back onto the pairs, same fixed
    // left-assoc score sum and (score DESC, id1, id2) order.
    "q_linkage_score" ->
      (s"WITH $fsPairsCtes " +
        "SELECT id1, id2, CAST(lab AS BIGINT) AS is_match, round(" +
        Seq("bal_close", "nation", "segment").map(f =>
          s"CASE WHEN f_$f = 1 THEN log2(${fsM(f)} / ${fsU(f)}) " +
          s"ELSE log2((1.0 - ${fsM(f)}) / (1.0 - ${fsU(f)})) END")
          .mkString(" + ") +
        ", 6) AS score FROM pr CROSS JOIN ag " +
        "ORDER BY score DESC, id1, id2 LIMIT 40"),

    "q_funnel" ->
      ("WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events), " +
        "v AS (SELECT user_id, min(tus) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1), " +
        "c AS (SELECT e.user_id, min(e.tus) AS t2 FROM e JOIN v USING (user_id) " +
        "WHERE e.event_type = 'click' AND e.tus > v.t1 GROUP BY 1), " +
        "p AS (SELECT e.user_id, min(e.tus) AS t3 FROM e JOIN c USING (user_id) " +
        "WHERE e.event_type = 'purchase' AND e.tus > c.t2 GROUP BY 1) " +
        "SELECT (SELECT count(*) FROM v) AS n_view, " +
        "(SELECT count(*) FROM c) AS n_view_click, " +
        "(SELECT count(*) FROM p) AS n_view_click_purchase"),

    "q_cohort_retention" ->
      ("WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY 1), " +
        "a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events) " +
        "SELECT f.cohort_day, datediff('day', f.cohort_day, a.d) AS day_offset, " +
        "count(*) AS n_users FROM a JOIN f USING (user_id) " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),

    "q_event_transitions" ->
      ("WITH s AS (SELECT user_id, event_type, lead(event_type) OVER " +
        "(PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS dst FROM events), " +
        "c AS (SELECT event_type AS src, dst, count(*) AS n FROM s " +
        "WHERE dst IS NOT NULL GROUP BY 1, 2) " +
        "SELECT src, dst, n, " +
        "round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src), 6) AS p " +
        "FROM c ORDER BY src, dst"),

    "q_debounce" ->
      ("SELECT event_id, user_id FROM (SELECT event_id, user_id, " +
        "epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap " +
        "FROM events) WHERE gap IS NULL OR gap > 60000 ORDER BY event_id"),

    "q_argmax" ->
      ("WITH r AS (SELECT user_id, event_id, value, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rb, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY value ASC, event_id ASC) AS rw " +
        "FROM events) " +
        "SELECT user_id, max(CASE WHEN rb = 1 THEN event_id END) AS best_event, " +
        "max(CASE WHEN rw = 1 THEN event_id END) AS worst_event, " +
        "round(max(value), 6) AS best_value " +
        "FROM r GROUP BY user_id ORDER BY user_id"),

    "q_join_nullsafe" ->
      ("WITH l AS (SELECT event_id AS l_id, nullif(event_type, 'error') AS k " +
        "FROM events WHERE event_id % 100 = 0), " +
        "r AS (SELECT event_id AS r_id, nullif(event_type, 'error') AS k " +
        "FROM events WHERE event_id % 100 = 1) " +
        "SELECT l.k, count(*) AS n_pairs FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k " +
        "GROUP BY l.k ORDER BY l.k NULLS FIRST"),

    "q_union_by_name" ->
      ("SELECT event_id, event_type, value FROM events WHERE event_id % 2 = 0 " +
        "UNION ALL BY NAME " +
        "SELECT event_id, user_id, event_type FROM events WHERE event_id % 2 = 1 " +
        "ORDER BY event_id"),

    "q_event_percentiles" ->
      ("SELECT event_type, count(*) AS n, " +
        "round(quantile_cont(value, 0.5), 6) AS p50, " +
        "round(quantile_cont(value, 0.9), 6) AS p90, " +
        "round(quantile_cont(value, 0.99), 6) AS p99 " +
        "FROM events GROUP BY event_type ORDER BY event_type"),

    "q_approx_quantile_kmv" ->
      ("WITH s AS (SELECT event_id, value FROM events " +
        "ORDER BY ('0x' || substr(md5(CAST(event_id AS VARCHAR) || '#0'), 1, 8))::BIGINT, event_id " +
        "LIMIT 256) " +
        "SELECT count(*) AS k, round(quantile_cont(value, 0.5), 6) AS p50_est, " +
        "round(quantile_cont(value, 0.9), 6) AS p90_est FROM s"),

    "q_rolling_anomaly" ->
      ("WITH x AS (SELECT event_id, user_id, value, count(*) OVER w AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sm, " +
        "CAST(sum(CAST(value * value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s2 " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts) " +
        "RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW)), " +
        "y AS (SELECT event_id, user_id, value, CAST(n AS BIGINT) AS n_base, " +
        "round((value - sm / n) / " +
        "sqrt(nullif(greatest(s2 / n - (sm / n) * (sm / n), 0), 0)), 6) AS zscore FROM x) " +
        "SELECT event_id, user_id, value, n_base, zscore FROM y " +
        "WHERE n_base >= 5 AND abs(zscore) > 3 ORDER BY event_id"),

    "q_window_rolling_range" ->
      ("SELECT event_id, user_id, CAST(count(*) OVER w AS BIGINT) AS n_1h, " +
        "round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) / (count(*) OVER w), 6) AS avg_1h " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts) " +
        "RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) ORDER BY event_id"),

    "q_zscore_by_group" ->
      ("WITH m AS (SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s, " +
        "CAST(sum(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE) AS s2 " +
        "FROM events GROUP BY event_type) " +
        "SELECT e.event_id, e.event_type, e.value, " +
        "round((e.value - m.s / m.n) / " +
        "sqrt(nullif(m.s2 / m.n - (m.s / m.n) * (m.s / m.n), 0)), 6) AS zscore " +
        "FROM events e JOIN m USING (event_type) ORDER BY event_id"),

    "q_winsorize" ->
      ("WITH c AS (SELECT round(quantile_cont(value, 0.01), 6) AS lo, " +
        "round(quantile_cont(value, 0.99), 6) AS hi FROM events) " +
        "SELECT event_id, value, " +
        "round(greatest(c.lo, least(c.hi, round(value, 6))), 6) AS value_w " +
        "FROM events, c ORDER BY event_id"),

    "q_outlier_mad" ->
      ("WITH v AS (SELECT event_id, value FROM events), " +
        "med AS (SELECT quantile_cont(value, 0.5) AS m FROM v), " +
        "dev AS (SELECT event_id, value, abs(value - med.m) AS dv FROM v, med), " +
        "thr AS (SELECT round(quantile_cont(dv, 0.5) * 3 * 1.4826, 6) AS t FROM dev) " +
        "SELECT event_id, value FROM dev, thr WHERE round(dv, 6) <= thr.t " +
        "ORDER BY event_id"),

    "q_window_tumbling" ->
      ("SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket, " +
        "count(*) AS n, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1 ORDER BY 1"),

    // Mirrors Aggregates.linearFit: identical moment identities over exact
    // DECIMAL sums, so the doubles entering the formulas match Spark's
    // bit-for-bit and round(…, 6) is engine-exact.
    "q_regr_trend" ->
      ("WITH m AS (SELECT l_returnflag, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS sxy, " +
        "CAST(sum(CAST(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS syy " +
        "FROM lineitem GROUP BY 1) " +
        "SELECT l_returnflag, n, " +
        "round((n*sxy - sx*sy) / nullif(n*sxx - sx*sx, 0), 6) AS slope, " +
        "round((sy - ((n*sxy - sx*sy) / nullif(n*sxx - sx*sx, 0)) * sx) / n, 6) AS intercept, " +
        "round(((n*sxy - sx*sy) * (n*sxy - sx*sy)) / nullif((n*sxx - sx*sx) * (n*syy - sy*sy), 0), 6) AS r2 " +
        "FROM m ORDER BY 1"),

    // DuckDB lambda indexes are 1-based (Spark's are 0-based, hence i+1
    // on the Spark side); list_position = first-occurrence index in both.
    "q_dedup_lines" ->
      (s"WITH t AS (SELECT doc_id, $DirtyText AS raw FROM documents), " +
        "c AS (SELECT doc_id, raw, array_to_string(list_filter(" +
        "string_split(raw, chr(10)), " +
        "(x, i) -> list_position(string_split(raw, chr(10)), x) = i), " +
        "chr(10)) AS text_clean FROM t) " +
        "SELECT doc_id, text_clean, " +
        "CAST(length(raw) - length(text_clean) AS BIGINT) AS removed_chars " +
        "FROM c ORDER BY doc_id"),

    "q_bm25_topk" -> bm25Oracle,

    // Same break-marker normalization, frozen stopword list, score sums.
    "q_rake_keywords" -> rakeOracle,

    // Same hit-postings decomposition, same μ literal, same tie order.
    "q_qlm_topk" -> qlmOracle,

    "q_rbo" -> rboOracle,

    // Same BM25 run CTEs, same gains/discounts/0-not-NULL conventions.
    "q_rank_eval" -> rankEvalOracle,

    // Same z sweep, same exp(−z²/2) surrogate, same step-up reverse min.
    "q_bh_fdr" -> bhFdrOracle,

    // Mirrors Sessionize.gapFill: scalar generate_series lists per key,
    // last_value IGNORE NULLS over the same (ts, flag, tie) total order
    // (grid rows tie = BIGINT max, observations their event_id).
    "q_gap_fill" ->
      ("WITH spans AS (SELECT user_id, date_trunc('hour', min(ts)) AS t0, " +
        "date_trunc('hour', max(ts)) AS t1 FROM events GROUP BY 1), " +
        "grid AS (SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS gts, " +
        "CAST(NULL AS DOUBLE) AS v, 1 AS flag, 9223372036854775807 AS tie FROM spans), " +
        "u AS (SELECT user_id, ts AS gts, value AS v, 0 AS flag, event_id AS tie FROM events " +
        "UNION ALL SELECT * FROM grid), " +
        "f AS (SELECT user_id, gts, flag, last_value(v IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY gts, flag, tie ROWS UNBOUNDED PRECEDING) AS fill FROM u) " +
        "SELECT user_id, strftime(gts, '%Y-%m-%d %H:%M:%S') AS bucket, fill AS value " +
        "FROM f WHERE flag = 1 AND fill IS NOT NULL ORDER BY user_id, bucket"),

    // Mirrors Skew.skewReport on l_suppkey (exact interpolated
    // percentiles == quantile_cont; DuckDB sum(BIGINT) cast back).
    "q_skew_preflight" ->
      ("WITH c AS (SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY 1) " +
        "SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows, " +
        "max(cnt) AS max_cnt, " +
        "round(CAST(sum(cnt) AS BIGINT) * 1.0 / count(*), 6) AS mean_cnt, " +
        "round(quantile_cont(cnt, 0.5), 6) AS p50_cnt, " +
        "round(quantile_cont(cnt, 0.99), 6) AS p99_cnt, " +
        "round(max(cnt) / (CAST(sum(cnt) AS BIGINT) * 1.0 / count(*)), 6) AS skew " +
        "FROM c"),

    // Mirrors q_clean_ingest: the same stage chain as the q_dedup_lines /
    // q_normalize_text mirrors, then QUALIFY keep-first per md5(clean)
    // and the per-source rollup (sum(BIGINT) is HUGEINT in DuckDB —
    // cast back).
    "q_clean_ingest" ->
      ("WITH t AS (SELECT doc_id, source, CASE WHEN doc_id % 3 = 0 THEN " +
        "text || chr(10) || substr(text, 1, 40) || chr(10) || substr(text, 1, 40) " +
        "ELSE text END AS d1 FROM documents), " +
        "t2 AS (SELECT doc_id, source, CASE WHEN doc_id % 2 = 0 THEN " +
        "d1 || ' cafe' || chr(769) || chr(8203) || '  tail' || chr(7) || ' ' " +
        "ELSE d1 END AS raw FROM t), " +
        "n AS (SELECT doc_id, source, trim(regexp_replace(regexp_replace(" +
        "nfc_normalize(raw), " +
        "'[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x{200B}-\\x{200D}\\x{FEFF}]', '', 'g'), " +
        "'[ \\t]+', ' ', 'g')) AS tx FROM t2), " +
        "l AS (SELECT doc_id, source, array_to_string(list_filter(" +
        "string_split(tx, chr(10)), " +
        "(x, i) -> list_position(string_split(tx, chr(10)), x) = i), " +
        "chr(10)) AS clean FROM n), " +
        "k AS (SELECT doc_id, source, clean FROM l " +
        "QUALIFY row_number() OVER (PARTITION BY md5(clean) ORDER BY doc_id) = 1) " +
        "SELECT source, count(*) AS n_docs, " +
        "CAST(sum(len(string_split(clean, ' '))) AS BIGINT) AS n_tokens " +
        "FROM k GROUP BY source ORDER BY source"),

    // Mirrors q_token_typos (same planting, same length banding; both
    // engines' levenshtein is classic unit-cost edit distance).
    "q_token_typos" ->
      ("WITH t AS (SELECT CASE WHEN doc_id % 37 = 0 THEN " +
        "regexp_replace(text, '\\bscan\\b', 'scam', 'g') " +
        "WHEN doc_id % 41 = 0 THEN regexp_replace(text, '\\bjoin\\b', 'joim', 'g') " +
        "ELSE text END AS text FROM documents), " +
        "v AS (SELECT token, count(*) AS n FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS token FROM t) GROUP BY 1), " +
        "k AS (SELECT token, n, unnest([length(token), length(token) + 1]) AS b FROM v) " +
        "SELECT DISTINCT a.token AS t1, b.token AS t2, a.n AS n1, b.n AS n2 " +
        "FROM k a JOIN k b ON a.b = b.b AND a.token < b.token " +
        "WHERE levenshtein(a.token, b.token) = 1 ORDER BY t1, t2"),

    // Mirrors q_rrf_fusion: same retriever mirrors as subqueries (DuckDB
    // accepts WITH inside a derived table), same 1/(60+rank) arithmetic.
    "q_rrf_fusion" ->
      (s"WITH a AS (SELECT vec_id, row_number() OVER (ORDER BY cos DESC, vec_id) AS ra " +
        s"FROM ($ivfOracle)), " +
        s"b AS (SELECT vec_id, row_number() OVER (ORDER BY cos DESC, vec_id) AS rb " +
        s"FROM ($lshMultiTableOracle)) " +
        "SELECT vec_id, round(coalesce(1.0 / (60 + ra), 0) + coalesce(1.0 / (60 + rb), 0), 9) AS rrf " +
        "FROM a FULL JOIN b USING (vec_id) ORDER BY rrf DESC, vec_id LIMIT 10"),

    // Mirrors TextAnalysis.bigramLogProb: row-local bigram lists (DuckDB
    // range() is a plain list inside lambdas), identical smoothing
    // arithmetic, DECIMAL(28,14) per-doc sums.
    "q_bigram_logprob" ->
      ("WITH a AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)), " +
        "i -> toks[i] || ' ' || toks[i+1])) AS big FROM a WHERE len(toks) >= 2), " +
        "bp AS (SELECT doc_id, string_split(big, ' ')[1] AS prev, big FROM bg), " +
        "cb AS (SELECT big, count(*) AS cb FROM bp GROUP BY 1), " +
        "cu AS (SELECT t, count(*) AS cu FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS t FROM documents) GROUP BY 1), " +
        "vv AS (SELECT count(*) AS v FROM cu) " +
        "SELECT bp.doc_id, round(CAST(sum(CAST(round(ln((cb.cb + 1.0) / (cu.cu + vv.v)), 9) " +
        "AS DECIMAL(28,14))) AS DOUBLE) / count(*), 6) AS logprob " +
        "FROM bp JOIN cb USING (big) JOIN cu ON cu.t = bp.prev CROSS JOIN vv " +
        "GROUP BY 1 ORDER BY 1"),

    // Mirrors Mix.weightedSample ('ws' salt, 9-dp keys, id tiebreak):
    // the md5 prefix → BIGINT is the same hash32 mirror q_domain_mix uses.
    "q_weighted_sample" ->
      ("WITH t AS (SELECT doc_id, n_chars, round(ln(" +
        "(('0x' || substr(md5('ws|' || CAST(doc_id AS VARCHAR) || '#0'), 1, 8))::BIGINT + 0.5) " +
        "/ 4294967296.0) / n_chars, 9) AS draw_key FROM documents) " +
        "SELECT doc_id, n_chars, draw_key FROM t " +
        "ORDER BY draw_key DESC, doc_id LIMIT 25"),

    // Mirrors TextAnalysis.normalizeText: utf8proc nfc_normalize and
    // java.text.Normalizer both implement Unicode TR15 NFC; the strip /
    // collapse regexes are spelled RE2-and-Java-compatible so the exact
    // same patterns run on both engines. chr() codepoints rebuild the
    // planted dirt (769=U+0301, 8203=U+200B, 7=BEL).
    "q_normalize_text" ->
      ("WITH t AS (SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN " +
        "text || ' cafe' || chr(769) || chr(8203) || '  tail' || chr(7) || ' ' " +
        "ELSE text END AS raw FROM documents), " +
        "n AS (SELECT doc_id, trim(regexp_replace(regexp_replace(" +
        "nfc_normalize(raw), " +
        "'[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x{200B}-\\x{200D}\\x{FEFF}]', '', 'g'), " +
        "'[ \\t]+', ' ', 'g')) AS text_norm FROM t) " +
        "SELECT doc_id, text_norm, CAST(length(text_norm) AS BIGINT) AS n_norm " +
        "FROM n ORDER BY doc_id"),

    "q_pagerank" -> pagerankOracle,

    "q_hits" -> hitsOracle,

    // Mirrors Similarity.semDedup over the shared 3-round Lloyd chain:
    // within-cell pairs at 6-dp cosine >= 0.3, anti-join the id2 set.
    "q_semdedup" ->
      (kmeansCtes + ", pr AS (SELECT a.vec_id AS id1, b.vec_id AS id2 " +
        "FROM af a JOIN af b ON a.cell = b.cell AND a.vec_id < b.vec_id " +
        "WHERE round(list_dot_product(a.v, b.v) / " +
        "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.3), " +
        "dr AS (SELECT DISTINCT id2 FROM pr) " +
        "SELECT af.vec_id, af.cell FROM af LEFT JOIN dr ON af.vec_id = dr.id2 " +
        "WHERE dr.id2 IS NULL ORDER BY af.vec_id"),

    // Mirrors Similarity.lof over the shared 3-round Lloyd chain:
    // within-cell pairs at 6-dp Euclidean distance, row_number kNN with
    // (d, j) order, DECIMAL reach/lrd sums, 6-dp LOF readout.
    "q_lof" -> lofOracle,

    // Mirrors Similarity.dbscan2d: brute-force eps graph (the oracle may
    // do all-pairs; the engine's grid join must produce the same graph),
    // degree>=minPts-1 cores, recursive-CTE CC over core-core edges,
    // borders adopt min core-neighbor label. eps^2 is interpolated from
    // the SAME Scala double product the engine compares against.
    "q_dbscan" -> dbscanOracle,

    // Mirrors TextAnalysis.naiveBayesScore: same Laplace llr shape and
    // DECIMAL(28,14) per-doc sums; pred is the 6-dp score's sign.
    "q_nb_classify" ->
      ("WITH lab AS (SELECT doc_id, text, (lang = 'en') AS y FROM documents), " +
        "tok AS (SELECT doc_id, y, unnest(string_split(text, ' ')) AS token FROM lab), " +
        "pt AS (SELECT token, sum(CASE WHEN y THEN 1 ELSE 0 END) AS c1, " +
        "sum(CASE WHEN y THEN 0 ELSE 1 END) AS c0 FROM tok GROUP BY 1), " +
        "tot AS (SELECT sum(c1) AS t1, sum(c0) AS t0, count(*) AS v FROM pt), " +
        "pri AS (SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS n1, " +
        "sum(CASE WHEN y THEN 0 ELSE 1 END) AS n0 FROM lab), " +
        "model AS (SELECT token, round(ln((c1 + 1.0) / (t1 + v)) - ln((c0 + 1.0) / (t0 + v)), 9) AS llr " +
        "FROM pt CROSS JOIN tot), " +
        "sc AS (SELECT doc_id, sum(CAST(llr AS DECIMAL(28,14))) AS sllr " +
        "FROM tok JOIN model USING (token) GROUP BY 1), " +
        "fin AS (SELECT doc_id, round(ln(CAST(n1 AS DOUBLE) / n0) + CAST(sllr AS DOUBLE), 6) AS score " +
        "FROM sc CROSS JOIN pri) " +
        "SELECT f.doc_id, f.score, f.score > 0 AS pred, d.lang " +
        "FROM fin f JOIN documents d USING (doc_id) ORDER BY f.doc_id"),

    "q_bloom_prune_join" ->
      ("SELECT s_name, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) " +
        "AS DECIMAL(18,6))) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "WHERE s_nationkey = 3 GROUP BY 1 ORDER BY 1"),

    "q_scd2_build" ->
      ("WITH dd AS (SELECT o_custkey, o_orderstatus, o_orderdate, " +
        "lag(o_orderstatus) OVER w AS prev, row_number() OVER w AS rn " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)), " +
        "ch AS (SELECT o_custkey, o_orderstatus, o_orderdate, rn FROM dd " +
        "WHERE rn = 1 OR o_orderstatus IS DISTINCT FROM prev), " +
        "v AS (SELECT o_custkey, o_orderstatus, o_orderdate AS ef, " +
        "lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, rn) AS et FROM ch) " +
        "SELECT o_custkey, o_orderstatus, CAST(ef AS DATE) AS effective_from, " +
        "CAST(et AS DATE) AS effective_to, et IS NULL AS is_current " +
        "FROM v ORDER BY o_custkey, effective_from, o_orderstatus"),

    "q_zorder_key" ->
      ("SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, " +
        graft.ops.ZOrder.zorderSql("l_partkey", "l_suppkey") + " AS zkey " +
        "FROM lineitem ORDER BY zkey, l_orderkey, l_linenumber"),

    "q_dq_report" ->
      ("WITH r AS (" +
        "SELECT 'not_null(o_custkey)' AS c, CAST(SUM(CASE WHEN o_custkey IS NULL " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS v FROM orders " +
        "UNION ALL SELECT 'in_range(o_totalprice,0.0,1000000.0)', " +
        "CAST(SUM(CASE WHEN o_totalprice < 0.0 OR o_totalprice > 1000000.0 " +
        "THEN 1 ELSE 0 END) AS BIGINT) FROM orders " +
        "UNION ALL SELECT 'satisfies(status_valid)', " +
        "CAST(SUM(CASE WHEN NOT coalesce(o_orderstatus IN ('F','O','P'), false) " +
        "THEN 1 ELSE 0 END) AS BIGINT) FROM orders " +
        "UNION ALL SELECT 'unique(o_orderkey)', " +
        "CAST(coalesce(SUM(n - 1), 0) AS BIGINT) FROM " +
        "(SELECT count(*) AS n FROM orders GROUP BY o_orderkey) " +
        "UNION ALL SELECT 'ref_integrity(o_orderkey)', " +
        "CAST(count(*) AS BIGINT) FROM orders o WHERE o_orderkey IS NOT NULL " +
        "AND NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o.o_orderkey)) " +
        "SELECT c AS \"constraint\", v AS violations, v = 0 AS pass " +
        "FROM r ORDER BY 1"),

    "q_incr_agg" ->
      ("SELECT o_custkey, count(*) AS n, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS mean " +
        "FROM orders GROUP BY 1 ORDER BY 1"),

    "q_cdc_apply" ->
      ("WITH src AS (SELECT *, o_orderkey % 3 AS m FROM orders WHERE o_orderkey % 7 = 0), " +
        "ch AS (SELECT CASE WHEN m = 2 THEN o_orderkey + 10000000 ELSE o_orderkey END AS k, " +
        "o_custkey, o_orderstatus, " +
        "CASE WHEN m = 1 THEN round(o_totalprice * 2, 2) ELSE o_totalprice END AS price0, " +
        "o_orderdate, o_orderpriority, " +
        "CASE m WHEN 0 THEN 'D' WHEN 1 THEN 'U' ELSE 'I' END AS op FROM src), " +
        "untouched AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate " +
        "FROM orders WHERE o_orderkey NOT IN (SELECT k FROM ch)), " +
        "ups AS (SELECT k AS o_orderkey, o_custkey, o_orderstatus, price0 AS o_totalprice, " +
        "o_orderdate FROM ch WHERE op <> 'D') " +
        "SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice, 2) AS price, " +
        "CAST(o_orderdate AS DATE) AS odate " +
        "FROM (SELECT * FROM untouched UNION ALL SELECT * FROM ups) ORDER BY o_orderkey"),

    "q_join_overlap_kmv" ->
      ("WITH a AS (SELECT DISTINCT ('0x' || substr(md5(l_suppkey::VARCHAR || '#0'), 1, 8))::BIGINT AS h " +
        "FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'), " +
        "b AS (SELECT DISTINCT ('0x' || substr(md5(l_suppkey::VARCHAR || '#0'), 1, 8))::BIGINT AS h " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'), " +
        "u AS (SELECT h FROM a UNION SELECT h FROM b), " +
        "ska AS (SELECT list_sort(list(h))[1:64] AS sk FROM a), " +
        "skb AS (SELECT list_sort(list(h))[1:64] AS sk FROM b), " +
        "sku AS (SELECT list_sort(list(h))[1:64] AS sk FROM u), " +
        "ex AS (SELECT count(*) AS exact_intersect FROM a JOIN b USING (h)), " +
        "est AS (SELECT " +
        "CASE WHEN len(ska.sk) < 64 THEN CAST(len(ska.sk) AS DOUBLE) " +
        "ELSE round(63.0 / (CAST(ska.sk[64] AS DOUBLE) / 4294967296.0), 6) END AS est_a, " +
        "CASE WHEN len(skb.sk) < 64 THEN CAST(len(skb.sk) AS DOUBLE) " +
        "ELSE round(63.0 / (CAST(skb.sk[64] AS DOUBLE) / 4294967296.0), 6) END AS est_b, " +
        "CASE WHEN len(sku.sk) < 64 THEN CAST(len(sku.sk) AS DOUBLE) " +
        "ELSE round(63.0 / (CAST(sku.sk[64] AS DOUBLE) / 4294967296.0), 6) END AS est_union " +
        "FROM ska, skb, sku) " +
        "SELECT est_a, est_b, est_union, round(est_a + est_b - est_union, 6) AS est_intersect, " +
        "exact_intersect FROM est, ex"),

    "q_dict_encode" ->
      ("WITH dict AS (SELECT c_mktsegment AS v, " +
        "row_number() OVER (ORDER BY c_mktsegment) AS seg_id " +
        "FROM (SELECT DISTINCT c_mktsegment FROM customer WHERE c_mktsegment IS NOT NULL)) " +
        "SELECT c_custkey, c_mktsegment, seg_id FROM customer " +
        "LEFT JOIN dict ON c_mktsegment = v ORDER BY c_custkey"),

    "q_abc_analysis" ->
      ("WITH rev AS (SELECT l_partkey, " +
        "SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS r " +
        "FROM lineitem GROUP BY 1), " +
        "t AS (SELECT SUM(r) AS total FROM rev), " +
        "c AS (SELECT l_partkey, r, " +
        "round(CAST(SUM(r) OVER (ORDER BY r DESC, l_partkey) / t.total AS DOUBLE), 6) " +
        "AS cum_share FROM rev CROSS JOIN t) " +
        "SELECT l_partkey, CAST(r AS DOUBLE) AS revenue, cum_share, " +
        "CASE WHEN cum_share <= 0.5 THEN 'A' WHEN cum_share <= 0.8 THEN 'B' " +
        "ELSE 'C' END AS abc_class " +
        "FROM c ORDER BY revenue DESC, l_partkey"),

    "q_basket_pairs" ->
      ("WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "n AS (SELECT count(DISTINCT l_orderkey) AS n FROM lineitem), " +
        "pp AS (SELECT l_partkey, count(*) AS pn FROM items GROUP BY 1), " +
        "pr AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS pair_n " +
        "FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey " +
        "AND a.l_partkey < b.l_partkey GROUP BY 1, 2) " +
        "SELECT p1, p2, pair_n, " +
        "round(CAST(pair_n AS DOUBLE) * n.n / (p1t.pn * p2t.pn), 6) AS lift " +
        "FROM pr JOIN pp p1t ON p1 = p1t.l_partkey " +
        "JOIN pp p2t ON p2 = p2t.l_partkey CROSS JOIN n " +
        "ORDER BY pair_n DESC, p1, p2 LIMIT 20"),

    "q_approx_distinct_kmv" ->
      ("WITH h AS (SELECT DISTINCT l_returnflag, " +
        "('0x' || substr(md5(l_partkey::VARCHAR || '#0'), 1, 8))::BIGINT AS h " +
        "FROM lineitem), " +
        "g AS (SELECT l_returnflag, list_sort(list(h))[1:64] AS sk, " +
        "count(*) AS exact_nd FROM h GROUP BY 1) " +
        "SELECT l_returnflag, " +
        "CASE WHEN len(sk) < 64 THEN CAST(len(sk) AS DOUBLE) " +
        "ELSE round(63.0 / (CAST(sk[64] AS DOUBLE) / 4294967296.0), 6) END AS est_nd, " +
        "exact_nd FROM g ORDER BY 1"),

    "q_topk_per_group" ->
      ("SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY l_returnflag " +
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn FROM lineitem) " +
        "WHERE rn <= 3 ORDER BY l_returnflag, l_extendedprice DESC, l_orderkey, l_linenumber"),

    "q_table_profile" ->
      ("SELECT * FROM (" +
        "SELECT 'o_custkey' AS \"column\", count(*) AS n_rows, " +
        "CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, " +
        "count(DISTINCT o_custkey) AS n_distinct, " +
        "CAST(min(o_custkey) AS DOUBLE) AS min_v, CAST(max(o_custkey) AS DOUBLE) AS max_v " +
        "FROM orders " +
        "UNION ALL SELECT 'o_orderkey', count(*), " +
        "CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT), " +
        "count(DISTINCT o_orderkey), CAST(min(o_orderkey) AS DOUBLE), " +
        "CAST(max(o_orderkey) AS DOUBLE) FROM orders " +
        "UNION ALL SELECT 'o_orderstatus', count(*), " +
        "CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT), " +
        "count(DISTINCT o_orderstatus), NULL, NULL FROM orders " +
        "UNION ALL SELECT 'o_totalprice', count(*), " +
        "CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT), " +
        "count(DISTINCT o_totalprice), CAST(min(o_totalprice) AS DOUBLE), " +
        "CAST(max(o_totalprice) AS DOUBLE) FROM orders) ORDER BY \"column\""),

    "q_chi_square" ->
      ("WITH j AS (SELECT c_mktsegment AS a, o_orderpriority AS b " +
        "FROM orders JOIN customer ON o_custkey = c_custkey), " +
        "obs AS (SELECT a, b, count(*) AS o FROM j GROUP BY 1, 2), " +
        "rt AS (SELECT a, sum(o) AS rt FROM obs GROUP BY 1), " +
        "ct AS (SELECT b, sum(o) AS ct FROM obs GROUP BY 1), " +
        "n AS (SELECT sum(o) AS n FROM obs), " +
        "cells AS (SELECT obs.o, CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) " +
        "/ CAST(n.n AS DOUBLE) AS e, obs.a, obs.b, n.n AS nn " +
        "FROM obs JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN n) " +
        "SELECT round(CAST(SUM(CAST((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e " +
        "AS DECIMAL(28,10))) AS DOUBLE) + (CAST(max(nn) AS DOUBLE) - " +
        "CAST(SUM(CAST(e AS DECIMAL(28,10))) AS DOUBLE)), 6) AS chi2, " +
        "(count(DISTINCT a) - 1) * (count(DISTINCT b) - 1) AS dof FROM cells"),

    "q_warehouse_flagship" ->
      ("WITH gated AS (SELECT * FROM orders WHERE o_custkey IS NOT NULL " +
        "AND o_totalprice >= 0.0 AND o_totalprice <= 1000000.0), " +
        "src AS (SELECT *, o_orderkey % 3 AS m FROM gated WHERE o_orderkey % 7 = 0), " +
        "ch AS (SELECT CASE WHEN m = 2 THEN o_orderkey + 10000000 ELSE o_orderkey END AS k, " +
        "o_custkey, o_orderstatus, " +
        "CASE WHEN m = 1 THEN round(o_totalprice * 2, 2) ELSE o_totalprice END AS price0, " +
        "o_orderdate, CASE m WHEN 0 THEN 'D' WHEN 1 THEN 'U' ELSE 'I' END AS op FROM src), " +
        "applied AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate " +
        "FROM gated WHERE o_orderkey NOT IN (SELECT k FROM ch) " +
        "UNION ALL SELECT k, o_custkey, o_orderstatus, price0, o_orderdate " +
        "FROM ch WHERE op <> 'D'), " +
        "sdd AS (SELECT o_custkey, o_orderstatus, o_orderdate, " +
        "lag(o_orderstatus) OVER w AS prev, row_number() OVER w AS rn " +
        "FROM applied WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)), " +
        "sch AS (SELECT o_custkey, o_orderstatus, o_orderdate, rn FROM sdd " +
        "WHERE rn = 1 OR o_orderstatus IS DISTINCT FROM prev), " +
        "v AS (SELECT o_custkey, o_orderstatus, o_orderdate AS ef, " +
        "lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, rn) AS et FROM sch) " +
        "SELECT v.o_orderstatus AS status_version, count(*) AS n_orders, " +
        "CAST(SUM(CAST(f.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue " +
        "FROM applied f JOIN v ON f.o_custkey = v.o_custkey " +
        "AND f.o_orderdate >= v.ef AND (v.et IS NULL OR f.o_orderdate < v.et) " +
        "GROUP BY 1 ORDER BY 1"),

    "q_scd2_lookup" ->
      ("WITH dd AS (SELECT o_custkey, o_orderstatus, o_orderdate, " +
        "lag(o_orderstatus) OVER w AS prev, row_number() OVER w AS rn " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)), " +
        "ch AS (SELECT o_custkey, o_orderstatus, o_orderdate, rn FROM dd " +
        "WHERE rn = 1 OR o_orderstatus IS DISTINCT FROM prev), " +
        "v AS (SELECT o_custkey, o_orderstatus, o_orderdate AS ef, " +
        "lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, rn) AS et FROM ch) " +
        "SELECT f.o_orderkey, f.o_custkey, v.o_orderstatus AS status_version, " +
        "CAST(v.ef AS DATE) AS vfrom " +
        "FROM orders f JOIN v ON f.o_custkey = v.o_custkey " +
        "AND f.o_orderdate >= v.ef AND (v.et IS NULL OR f.o_orderdate < v.et) " +
        "ORDER BY 1, 3, 4"),

    "q_heavy_tokens" ->
      ("WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents), " +
        "n AS (SELECT count(*) AS n FROM tok), " +
        "c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1) " +
        "SELECT token, cnt FROM c CROSS JOIN n WHERE cnt * 100 > n.n " +
        "ORDER BY cnt DESC, token"),

    "q_skyline" ->
      ("SELECT p_partkey, p_retailprice, p_size FROM part a " +
        "WHERE NOT EXISTS (SELECT 1 FROM part b " +
        "WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size " +
        "AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)) " +
        "ORDER BY p_retailprice, p_partkey"),

    "q_graph_bfs" -> bfsOracle,

    "q_graph_sssp" -> ssspOracle,

    "q_pca_top" -> pcaOracle,

    "q_er_golden" ->
      ("WITH RECURSIVE ent AS (SELECT CAST(p_partkey AS BIGINT) AS id, " +
        "p_name AS name FROM part " +
        "UNION ALL SELECT p_partkey + 10000000 AS id, " +
        "substr(p_name, 1, length(p_name) - 1) || 'x' AS name " +
        "FROM part WHERE p_partkey % 20 = 0), " +
        "r AS (SELECT id, name, row_number() OVER (ORDER BY lower(name), id) AS rk " +
        "FROM ent), " +
        "pairs AS (SELECT a.id AS id1, b.id AS id2 FROM r a " +
        "JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 3 " +
        "WHERE levenshtein(a.name, b.name) <= 2), " +
        "edges AS (SELECT id1 AS src, id2 AS dst FROM pairs " +
        "UNION ALL SELECT id2, id1 FROM pairs), " +
        "cc AS (SELECT id, id AS label FROM ent " +
        "UNION SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.id = e.src), " +
        "lab AS (SELECT id, min(label) AS cluster FROM cc GROUP BY id), " +
        "g AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_members " +
        "FROM lab GROUP BY 1) " +
        "SELECT g.cluster, g.n_members, e.name AS canonical_name " +
        "FROM g JOIN ent e ON e.id = g.cluster ORDER BY g.cluster"),

    "q_inverted_postings" ->
      ("WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), " +
        "pos AS (SELECT doc_id, t[i] AS token " +
        "FROM toks, unnest(generate_series(1, len(t))) AS u(i) WHERE t[i] <> ''), " +
        "post AS (SELECT token, doc_id, count(*) AS tf FROM pos GROUP BY 1, 2) " +
        "SELECT token, CAST(count(*) AS BIGINT) AS df, " +
        "CAST(sum(tf) AS BIGINT) AS ctf FROM post GROUP BY token " +
        "ORDER BY df ASC, token ASC LIMIT 20"),

    "q_phrase_search" ->
      ("WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), " +
        "pos AS (SELECT doc_id, i - 1 AS pos, t[i] AS token " +
        "FROM toks, unnest(generate_series(1, len(t))) AS u(i) WHERE t[i] <> ''), " +
        "ph AS (SELECT * FROM (VALUES ('big', 0), ('order', 1), ('scan', 2)) " +
        "AS v(token, slot)), " +
        "st AS (SELECT p.doc_id, p.pos - ph.slot AS start, ph.slot " +
        "FROM pos p JOIN ph ON p.token = ph.token WHERE p.pos - ph.slot >= 0), " +
        "m AS (SELECT doc_id, start FROM st GROUP BY doc_id, start " +
        "HAVING count(DISTINCT slot) = 3) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches FROM m " +
        "GROUP BY doc_id ORDER BY doc_id"),

    "q_bom_rollup" ->
      ("WITH RECURSIVE e AS (SELECT p1.p_partkey AS parent, " +
        "p2.p_partkey AS child, p2.p_partkey % 3 + 1 AS qty FROM part p1 " +
        "JOIN part p2 ON p2.p_partkey = p1.p_partkey * 2 " +
        "OR p2.p_partkey = p1.p_partkey * 2 + 1), " +
        "bom AS (SELECT CAST(node AS BIGINT) AS root, CAST(node AS BIGINT) AS node, " +
        "CAST(1 AS BIGINT) AS qty, 0 AS depth " +
        "FROM (SELECT unnest([2, 3, 4, 5]) AS node) " +
        "UNION ALL SELECT b.root, e.child, b.qty * e.qty, b.depth + 1 " +
        "FROM bom b JOIN e ON b.node = e.parent WHERE b.depth < 16) " +
        "SELECT root, node, CAST(sum(qty) AS BIGINT) AS total_qty " +
        "FROM bom GROUP BY 1, 2 ORDER BY 1, 2"),

    "q_resample_ohlc" ->
      ("WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, value " +
        "FROM events WHERE value IS NOT NULL), " +
        "b AS (SELECT user_id, ts_ms - ts_ms % 900000 AS bucket_ms, ts_ms, " +
        "event_id, value FROM e), " +
        "w AS (SELECT *, row_number() OVER (PARTITION BY user_id, bucket_ms " +
        "ORDER BY ts_ms, event_id) AS ra, " +
        "row_number() OVER (PARTITION BY user_id, bucket_ms " +
        "ORDER BY ts_ms DESC, event_id DESC) AS rd FROM b) " +
        "SELECT user_id, bucket_ms, " +
        "max(CASE WHEN ra = 1 THEN value END) AS open, " +
        "max(value) AS high, min(value) AS low, " +
        "max(CASE WHEN rd = 1 THEN value END) AS close, " +
        "CAST(count(*) AS BIGINT) AS n_events, " +
        "round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS volume " +
        "FROM w GROUP BY 1, 2 ORDER BY user_id, bucket_ms"),

    "q_cusum_change" ->
      ("WITH e AS (SELECT user_id, ts, event_id, value, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn, " +
        "count(*) OVER (PARTITION BY user_id) AS cnt FROM events), " +
        "v AS (SELECT user_id, ts, event_id, value + " +
        "CASE WHEN rn * 2 > cnt THEN 150.0 ELSE 0.0 END AS value_drift " +
        "FROM e WHERE value IS NOT NULL), " +
        "m AS (SELECT user_id, count(*) AS n, " +
        "CAST(sum(CAST(value_drift AS DECIMAL(18,6))) AS DOUBLE) AS s, " +
        "CAST(sum(CAST(value_drift * value_drift AS DECIMAL(18,6))) AS DOUBLE) AS s2 " +
        "FROM v GROUP BY 1), " +
        "mm AS (SELECT user_id, round(s / n, 6) AS mu, " +
        "round(sqrt(greatest(s2 / n - (s / n) * (s / n), 0)), 6) AS sd FROM m), " +
        "c AS (SELECT v.user_id, v.ts, v.event_id, v.value_drift, " +
        "CAST(v.value_drift AS DECIMAL(18,6)) - CAST(mm.mu AS DECIMAL(18,6)) - " +
        "CAST(round(0.5 * mm.sd, 6) AS DECIMAL(18,6)) AS d, " +
        "CAST(round(4.0 * mm.sd, 6) AS DECIMAL(18,6)) AS thr " +
        "FROM v JOIN mm ON v.user_id = mm.user_id), " +
        "p AS (SELECT user_id, ts, event_id, value_drift, thr, " +
        "sum(d) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ps FROM c), " +
        "q AS (SELECT user_id, event_id, value_drift, thr, ps, " +
        "least(0, min(ps) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS mn FROM p) " +
        "SELECT user_id, event_id, value_drift, " +
        "round(CAST(ps - mn AS DOUBLE), 6) AS cusum FROM q " +
        "WHERE ps - mn > thr ORDER BY user_id, event_id"),

    "q_ewma" -> ewmaOracle,

    "q_bollinger" -> bollingerOracle,

    "q_macd" -> macdOracle,

    "q_holt_forecast" -> holtOracle,

    "q_interpolate" ->
      ("WITH spans AS (SELECT user_id, date_trunc('hour', min(ts)) AS t0, " +
        "date_trunc('hour', max(ts)) AS t1 FROM events GROUP BY 1), " +
        "grid AS (SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS gts, " +
        "CAST(NULL AS DOUBLE) AS v, 1 AS flag, 9223372036854775807 AS tie FROM spans), " +
        "u AS (SELECT user_id, ts AS gts, value AS v, 0 AS flag, event_id AS tie FROM events " +
        "UNION ALL SELECT * FROM grid), " +
        "f AS (SELECT user_id, gts, flag, " +
        "last_value(v IGNORE NULLS) OVER wp AS pv, " +
        "last_value(CASE WHEN flag = 0 THEN epoch_us(gts) END IGNORE NULLS) OVER wp AS pt, " +
        "first_value(v IGNORE NULLS) OVER wn AS nv, " +
        "first_value(CASE WHEN flag = 0 THEN epoch_us(gts) END IGNORE NULLS) OVER wn AS nt, " +
        "epoch_us(gts) AS g FROM u " +
        "WINDOW wp AS (PARTITION BY user_id ORDER BY gts, flag, tie ROWS UNBOUNDED PRECEDING), " +
        "wn AS (PARTITION BY user_id ORDER BY gts, flag, tie " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
        "SELECT user_id, strftime(gts, '%Y-%m-%d %H:%M:%S') AS bucket, " +
        "round(CASE WHEN nt IS NULL OR nt = pt THEN pv " +
        "ELSE pv + (nv - pv) * ((g - pt) / (nt - pt)) END, 6) AS value " +
        "FROM f WHERE flag = 1 AND pv IS NOT NULL ORDER BY user_id, bucket"),

    "q_percentile_two_pass" ->
      ("SELECT CAST(0.9 AS DOUBLE) AS p, " +
        "round(quantile_cont(l_extendedprice, 0.9), 6) AS value FROM lineitem"),

    "q_heavy_tokens_by_source" ->
      ("WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token " +
        "FROM documents), " +
        "n AS (SELECT source, count(*) AS n FROM tok GROUP BY 1), " +
        "c AS (SELECT source, token, count(*) AS cnt FROM tok GROUP BY 1, 2) " +
        "SELECT c.source, c.token, c.cnt FROM c JOIN n USING (source) " +
        "WHERE c.cnt * 50 > n.n ORDER BY c.source, c.cnt DESC, c.token"),

    "q_ssjoin_exact" ->
      ("WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts " +
        "FROM documents WHERE doc_id % 10 = 0), " +
        "p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, " +
        "len(list_intersect(a.ts, b.ts)) AS i, " +
        "len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)) AS u " +
        "FROM t a JOIN t b ON a.doc_id < b.doc_id) " +
        "SELECT id1, id2, round(CAST(i AS DOUBLE) / CAST(u AS DOUBLE), 6) AS jaccard " +
        "FROM p WHERE CAST(i AS DOUBLE) >= 0.5 * CAST(u AS DOUBLE) " +
        "ORDER BY id1, id2"),

    "q_psi_drift" ->
      ("WITH ob AS (SELECT least(greatest(CAST(floor(len(string_split(text, ' ')) / 20.0) " +
        "AS INT), 0), 9) AS bin FROM documents WHERE doc_id % 2 = 0), " +
        "nb AS (SELECT least(greatest(CAST(floor(len(string_split(text, ' ')) / 20.0) " +
        "AS INT), 0), 9) AS bin FROM documents WHERE doc_id % 2 = 1), " +
        "g AS (SELECT unnest(generate_series(0, 9)) AS bin), " +
        "co AS (SELECT bin, count(*) AS no FROM ob GROUP BY 1), " +
        "cn AS (SELECT bin, count(*) AS nn FROM nb GROUP BY 1), " +
        "j AS (SELECT g.bin, coalesce(co.no, 0) AS no, coalesce(cn.nn, 0) AS nn " +
        "FROM g LEFT JOIN co USING (bin) LEFT JOIN cn USING (bin)), " +
        "t AS (SELECT CAST(sum(no) AS BIGINT) AS t_o, CAST(sum(nn) AS BIGINT) AS t_n FROM j), " +
        "s AS (SELECT (no + 1.0) / (t.t_o + 10) AS po, (nn + 1.0) / (t.t_n + 10) AS pn " +
        "FROM j CROSS JOIN t) " +
        "SELECT round(CAST(sum(CAST(round((pn - po) * ln(pn / po), 9) AS DECIMAL(28,14))) " +
        "AS DOUBLE), 6) AS psi, count(*) AS n_bins FROM s"),

    "q_sorted_neighbors" ->
      ("WITH r AS (SELECT p_partkey, p_name, " +
        "row_number() OVER (ORDER BY lower(p_name), p_partkey) AS rk FROM part) " +
        "SELECT a.p_partkey AS id1, b.p_partkey AS id2, " +
        "CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist " +
        "FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 3 " +
        "WHERE levenshtein(a.p_name, b.p_name) <= 3 ORDER BY id1, id2"),

    "q_cdc_extract" ->
      ("WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders " +
        "WHERE o_orderkey % 3 <> 0), " +
        "n AS (SELECT o_orderkey, o_orderstatus, " +
        "CASE WHEN o_orderkey % 7 = 0 THEN round(o_totalprice * 2, 2) " +
        "ELSE o_totalprice END AS o_totalprice FROM orders WHERE o_orderkey % 5 <> 0) " +
        "SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey, " +
        "CASE WHEN n.o_orderkey IS NULL THEN o.o_orderstatus ELSE n.o_orderstatus END " +
        "AS o_orderstatus, " +
        "CASE WHEN n.o_orderkey IS NULL THEN o.o_totalprice ELSE n.o_totalprice END " +
        "AS o_totalprice, " +
        "CASE WHEN o.o_orderkey IS NULL THEN 'I' WHEN n.o_orderkey IS NULL THEN 'D' " +
        "ELSE 'U' END AS op " +
        "FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey " +
        "WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL " +
        "OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus " +
        "OR o.o_totalprice IS DISTINCT FROM n.o_totalprice " +
        "ORDER BY o_orderkey"),

    "q_band_join" ->
      ("WITH c AS (SELECT event_id AS click_id, epoch_us(ts) AS cm FROM events " +
        "WHERE event_type = 'click'), " +
        "p AS (SELECT event_id AS purchase_id, epoch_us(ts) AS pm FROM events " +
        "WHERE event_type = 'purchase') " +
        "SELECT click_id, purchase_id, pm - cm AS delta_us FROM c JOIN p " +
        "ON abs(cm - pm) <= 30000000 ORDER BY click_id, purchase_id"),

    "q_interval_join" ->
      ("WITH c AS (SELECT event_id AS click_id, epoch_us(ts) AS cs, " +
        "epoch_us(ts) + (event_id % 300 + 60) * 1000000 AS ce FROM events " +
        "WHERE event_type = 'click'), " +
        "v AS (SELECT event_id AS view_id, epoch_us(ts) AS vs, " +
        "epoch_us(ts) + (event_id % 300 + 60) * 1000000 AS ve FROM events " +
        "WHERE event_type = 'view') " +
        "SELECT click_id, view_id, " +
        "least(ce, ve) - greatest(cs, vs) AS overlap_us " +
        "FROM c JOIN v ON cs <= ve AND vs <= ce " +
        "ORDER BY click_id, view_id"),

    "q_table_checksum" ->
      ("WITH r AS (SELECT l_returnflag, " +
        "('0x' || substr(md5(concat_ws(chr(1), " +
        "coalesce(l_orderkey::VARCHAR, chr(2)), " +
        "coalesce(l_linenumber::VARCHAR, chr(2)), " +
        "coalesce(l_linestatus, chr(2)), " +
        "coalesce(CAST(CAST(l_shipdate AS DATE) AS VARCHAR), chr(2)))), " +
        "1, 15))::BIGINT AS d FROM lineitem) " +
        "SELECT l_returnflag, count(*) AS n_rows, " +
        "CAST(sum(d) AS VARCHAR) AS checksum " +
        "FROM r GROUP BY 1 ORDER BY 1"),

    "q_skew_report" ->
      ("WITH c AS (SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY 1), " +
        "t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS nkeys FROM c) " +
        "SELECT l_orderkey, cnt, " +
        "round(cnt / CAST(total AS DOUBLE), 6) AS share, " +
        "round(CAST(cnt AS DOUBLE) / (CAST(total AS DOUBLE) / CAST(nkeys AS DOUBLE)), 6) " +
        "AS ratio_to_avg " +
        "FROM c CROSS JOIN t ORDER BY cnt DESC, l_orderkey LIMIT 20"),

    "q_sketch_cube" ->
      ("WITH h AS (SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS month, " +
        "('0x' || substr(md5(o_custkey::VARCHAR || '#0'), 1, 8))::BIGINT AS h " +
        "FROM orders), " +
        "g AS (SELECT month, list_sort(list(h))[1:64] AS sk, " +
        "count(*) AS exact_nd FROM h GROUP BY 1) " +
        "SELECT month, " +
        "CASE WHEN len(sk) < 64 THEN CAST(len(sk) AS DOUBLE) " +
        "ELSE round(63.0 / (CAST(sk[64] AS DOUBLE) / 4294967296.0), 6) END AS est_nd, " +
        "exact_nd FROM g ORDER BY month"),

    "q_collocations" ->
      ("WITH base AS (SELECT string_split(text, ' ') AS toks FROM documents), " +
        "bg AS (SELECT toks[i] AS w1, toks[i + 1] AS w2 " +
        "FROM base, unnest(generate_series(1, len(toks) - 1)) AS u(i) " +
        "WHERE len(toks) >= 2), " +
        "cb AS (SELECT w1, w2, count(*) AS pair_count FROM bg GROUP BY 1, 2), " +
        "cu AS (SELECT unnest(toks) AS t FROM base), " +
        "cuc AS (SELECT t, count(*) AS cu FROM cu GROUP BY 1), " +
        "tot AS (SELECT CAST((SELECT sum(cu) FROM cuc) AS BIGINT) AS n, " +
        "CAST((SELECT sum(pair_count) FROM cb) AS BIGINT) AS m) " +
        "SELECT cb.w1, cb.w2, cb.pair_count, " +
        "round(ln((CAST(cb.pair_count AS DOUBLE) / CAST(tot.m AS DOUBLE)) / " +
        "((CAST(a.cu AS DOUBLE) / CAST(tot.n AS DOUBLE)) * " +
        "(CAST(b.cu AS DOUBLE) / CAST(tot.n AS DOUBLE)))), 6) AS pmi " +
        "FROM cb JOIN cuc a ON cb.w1 = a.t JOIN cuc b ON cb.w2 = b.t " +
        "CROSS JOIN tot WHERE cb.pair_count >= 5 " +
        "ORDER BY pmi DESC, cb.w1, cb.w2 LIMIT 50"),

    "q_textrank_keywords" -> textrankOracle,

    "q_source_overlap" ->
      ("WITH vt AS MATERIALIZED (SELECT DISTINCT source AS k, " +
        "unnest(list_distinct(string_split(text, ' '))) AS t FROM documents), " +
        "sz AS (SELECT k, count(*) AS n FROM vt GROUP BY 1), " +
        "iv AS (SELECT a.k AS source1, b.k AS source2, count(*) AS n_common " +
        "FROM vt a JOIN vt b ON a.t = b.t AND a.k < b.k GROUP BY 1, 2) " +
        "SELECT source1, source2, CAST(s1.n AS BIGINT) AS n1, " +
        "CAST(s2.n AS BIGINT) AS n2, CAST(n_common AS BIGINT) AS n_common, " +
        "round(CAST(n_common AS DOUBLE) / CAST(s1.n + s2.n - n_common AS DOUBLE), 6) AS jaccard " +
        "FROM iv JOIN sz s1 ON iv.source1 = s1.k JOIN sz s2 ON iv.source2 = s2.k " +
        "ORDER BY source1, source2"),

    // Same 9-dp-rounded n^α terms, DECIMAL normalizer sum, pinned rate
    // arithmetic, and md5 keep draw as Mix.alphaSample.
    "q_alpha_sample" ->
      ("WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1), " +
        "p AS (SELECT source, n, round(pow(CAST(n AS DOUBLE), 0.5), 9) AS pw FROM c), " +
        "t AS (SELECT CAST(sum(n) AS BIGINT) AS nt, " +
        "CAST(sum(CAST(pw AS DECIMAL(28,9))) AS DOUBLE) AS s FROM p), " +
        "r AS (SELECT source, n, round(least(CAST(1 AS DOUBLE), " +
        "((0.5 * CAST(nt AS DOUBLE)) * pw) / (s * CAST(n AS DOUBLE))), 9) AS rate " +
        "FROM p CROSS JOIN t), " +
        "k AS (SELECT d.source, count(*) AS kept FROM documents d JOIN r " +
        "ON d.source = r.source WHERE " +
        "('0x' || substr(md5(d.source || '|' || CAST(d.doc_id AS VARCHAR) || '#0'), 1, 8))::BIGINT " +
        "< r.rate * 4294967296.0 GROUP BY 1) " +
        "SELECT r.source, CAST(r.n AS BIGINT) AS n_total, r.rate, " +
        "CAST(coalesce(k.kept, 0) AS BIGINT) AS n_kept " +
        "FROM r LEFT JOIN k ON r.source = k.source ORDER BY r.source"),

    // Rebuilds the identical d=3 × w=64 count-min sketch from the shared
    // md5 hash family, probes the same top-20 items.
    "q_cms_freq" ->
      ("WITH it AS (SELECT l_suppkey::VARCHAR AS item FROM lineitem), " +
        "dd AS (SELECT * FROM (VALUES (0), (1), (2)) t(d)), " +
        "hx AS (SELECT item, d, CAST(('0x' || substr(md5(item || '#' || " +
        "d::VARCHAR), 1, 8))::BIGINT % 64 AS INT) AS b FROM it CROSS JOIN dd), " +
        "sk AS (SELECT d, b, count(*) AS cnt FROM hx GROUP BY 1, 2), " +
        "ex AS (SELECT item, CAST(count(*) AS BIGINT) AS exact_cnt FROM it GROUP BY 1), " +
        "top AS (SELECT item, exact_cnt FROM ex " +
        "ORDER BY exact_cnt DESC, item LIMIT 20), " +
        "pb AS (SELECT t.item, t.exact_cnt, dd.d, " +
        "CAST(('0x' || substr(md5(t.item || '#' || dd.d::VARCHAR), 1, 8))::BIGINT % 64 AS INT) AS b " +
        "FROM top t CROSS JOIN dd) " +
        "SELECT pb.item, pb.exact_cnt, " +
        "CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS cms_est, " +
        "CAST(min(coalesce(sk.cnt, 0)) - pb.exact_cnt AS BIGINT) AS overcount " +
        "FROM pb LEFT JOIN sk ON pb.d = sk.d AND pb.b = sk.b " +
        "GROUP BY 1, 2 ORDER BY 1"),

    // Same Laplace-smoothed unigram KL with the same DECIMAL term sums.
    "q_kl_drift" ->
      ("WITH ta AS (SELECT unnest(string_split(text, ' ')) AS token " +
        "FROM documents WHERE doc_id % 2 = 0), " +
        "tb AS (SELECT unnest(string_split(text, ' ')) AS token " +
        "FROM documents WHERE doc_id % 2 = 1), " +
        "ca AS (SELECT token, count(*) AS ca FROM ta WHERE token <> '' GROUP BY 1), " +
        "cb AS (SELECT token, count(*) AS cb FROM tb WHERE token <> '' GROUP BY 1), " +
        "j AS (SELECT coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb " +
        "FROM ca FULL OUTER JOIN cb ON ca.token = cb.token), " +
        "t AS (SELECT sum(ca) AS ta, sum(cb) AS tb, count(*) AS v FROM j), " +
        "p AS (SELECT (ca + 1.0) / (t.ta + t.v) AS pa, " +
        "(cb + 1.0) / (t.tb + t.v) AS pb FROM j CROSS JOIN t) " +
        "SELECT round(CAST(sum(CAST(round(pa * ln(pa / pb), 9) AS DECIMAL(28,14))) " +
        "AS DOUBLE), 6) AS kl_ab, CAST(count(*) AS BIGINT) AS vocab FROM p"),

    // Same strictly-preceding frame with IGNORE NULLS on both engines.
    "q_attribution" ->
      ("WITH w AS (SELECT user_id, event_id, event_type, " +
        "first_value(CASE WHEN event_type <> 'purchase' THEN event_type END " +
        "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch, " +
        "last_value(CASE WHEN event_type <> 'purchase' THEN event_type END " +
        "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch " +
        "FROM events) " +
        "SELECT user_id, event_id, first_touch, last_touch FROM w " +
        "WHERE event_type = 'purchase' ORDER BY user_id, event_id"),

    // Same segment windows; middle credit rounds 0.2/(m−2) to 9 dp
    // before the DECIMAL sum, exactly like the Spark side.
    "q_position_attribution" ->
      ("WITH s AS (SELECT user_id AS k, ts, event_id AS tie, event_type AS t, " +
        "coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg FROM events), " +
        "tt AS (SELECT k, seg, t, " +
        "row_number() OVER (PARTITION BY k, seg ORDER BY ts, tie) AS i, " +
        "count(*) OVER (PARTITION BY k, seg) AS m FROM s WHERE t <> 'purchase'), " +
        "cv AS (SELECT DISTINCT k, seg FROM s WHERE t = 'purchase'), " +
        "cr AS (SELECT tt.t AS channel, CASE WHEN m = 1 THEN CAST(1.0 AS DOUBLE) " +
        "WHEN m = 2 THEN CAST(0.5 AS DOUBLE) " +
        "WHEN i = 1 OR i = m THEN CAST(0.4 AS DOUBLE) " +
        "ELSE round(CAST(0.2 AS DOUBLE) / CAST(m - 2 AS DOUBLE), 9) END AS c " +
        "FROM tt JOIN cv USING (k, seg)) " +
        "SELECT channel, CAST(count(*) AS BIGINT) AS n_touches, " +
        "round(CAST(sum(CAST(c AS DECIMAL(18,9))) AS DOUBLE), 6) AS credit " +
        "FROM cr GROUP BY 1 ORDER BY 1"),

    // Same pooled-variance statistic, identical parenthesization.
    "q_ab_test" ->
      ("WITH u AS (SELECT user_id, max(CASE WHEN event_type = 'purchase' " +
        "THEN 1 ELSE 0 END) AS conv FROM events GROUP BY 1), " +
        "c AS (SELECT " +
        "CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a, " +
        "CAST(SUM(CASE WHEN user_id % 2 = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS x_a, " +
        "CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b, " +
        "CAST(SUM(CASE WHEN user_id % 2 = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS x_b " +
        "FROM u) " +
        "SELECT n_a, x_a, n_b, x_b, " +
        "round(x_a::DOUBLE / n_a::DOUBLE, 6) AS rate_a, " +
        "round(x_b::DOUBLE / n_b::DOUBLE, 6) AS rate_b, " +
        "round(CASE WHEN sqrt(((x_a::DOUBLE + x_b::DOUBLE) / (n_a::DOUBLE + n_b::DOUBLE)) * " +
        "(1.0 - (x_a::DOUBLE + x_b::DOUBLE) / (n_a::DOUBLE + n_b::DOUBLE)) * " +
        "(1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE)) > 0 THEN " +
        "(x_b::DOUBLE / n_b::DOUBLE - x_a::DOUBLE / n_a::DOUBLE) / " +
        "sqrt(((x_a::DOUBLE + x_b::DOUBLE) / (n_a::DOUBLE + n_b::DOUBLE)) * " +
        "(1.0 - (x_a::DOUBLE + x_b::DOUBLE) / (n_a::DOUBLE + n_b::DOUBLE)) * " +
        "(1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE)) END, 6) AS z FROM c"),

    // Same calendar-grain series, same DECIMAL(28,8) moment sums.
    "q_acf" ->
      ("WITH s AS (SELECT CAST(o_orderdate AS DATE) AS d, " +
        "CAST(count(*) AS DOUBLE) AS x FROM orders GROUP BY 1), " +
        "m AS (SELECT sum(x) / count(*) AS m FROM s), " +
        "c AS (SELECT x - m.m AS c0, " +
        (1 to 7).map(l =>
          s"lead(x, $l) OVER (ORDER BY d) - m.m AS c$l").mkString(", ") +
        " FROM s CROSS JOIN m), " +
        "a AS (SELECT sum(CAST(c0 * c0 AS DECIMAL(28,8))) AS den, " +
        (1 to 7).map(l =>
          s"sum(CAST(c0 * c$l AS DECIMAL(28,8))) AS n$l").mkString(", ") +
        " FROM c) SELECT lag, acf FROM (" +
        (1 to 7).map(l =>
          s"SELECT $l AS lag, round(CAST(n$l AS DOUBLE) / CAST(den AS DOUBLE), 6) " +
          s"AS acf FROM a").mkString(" UNION ALL ") +
        ") ORDER BY lag"),

    // Same calendar-bounded ACF as q_acf; rho^2/(n-k) terms round to
    // 9 dp into a DECIMAL(38,9) sum, n(n+2) factor applied once.
    "q_ljung_box" ->
      ("WITH s AS (SELECT CAST(o_orderdate AS DATE) AS d, " +
        "CAST(count(*) AS DOUBLE) AS x FROM orders GROUP BY 1), " +
        "m AS (SELECT sum(x) / count(*) AS m FROM s), " +
        "c AS (SELECT x - m.m AS c0, " +
        (1 to 7).map(l =>
          s"lead(x, $l) OVER (ORDER BY d) - m.m AS c$l").mkString(", ") +
        " FROM s CROSS JOIN m), " +
        "a AS (SELECT sum(CAST(c0 * c0 AS DECIMAL(28,8))) AS den, " +
        (1 to 7).map(l =>
          s"sum(CAST(c0 * c$l AS DECIMAL(28,8))) AS n$l").mkString(", ") +
        " FROM c), " +
        "acf AS (SELECT lag, acf FROM (" +
        (1 to 7).map(l =>
          s"SELECT $l AS lag, round(CAST(n$l AS DOUBLE) / CAST(den AS DOUBLE), 6) " +
          s"AS acf FROM a").mkString(" UNION ALL ") +
        ")), nn AS (SELECT count(*) AS n FROM s), " +
        "q AS (SELECT max(n) AS n, SUM(CAST(CASE WHEN n > 7 THEN " +
        "round(acf * acf / (CAST(n AS DOUBLE) - CAST(lag AS DOUBLE)), 9) " +
        "ELSE 0.0 END AS DECIMAL(38,9))) AS s FROM acf CROSS JOIN nn) " +
        "SELECT CAST(n AS BIGINT) AS n_buckets, 7 AS df, " +
        "CASE WHEN n > 7 THEN round(CAST(n AS DOUBLE) * " +
        "(CAST(n AS DOUBLE) + 2.0) * CAST(s AS DOUBLE), 6) + 0.0 " +
        "END AS q_stat FROM q"),

    // The q_acf chain truncated to 3 lags, then the same unrolled
    // Durbin-Levinson scalar arithmetic on the 6-dp ρ values.
    "q_pacf" ->
      ("WITH s AS (SELECT CAST(o_orderdate AS DATE) AS d, " +
        "CAST(count(*) AS DOUBLE) AS x FROM orders GROUP BY 1), " +
        "m AS (SELECT sum(x) / count(*) AS m FROM s), " +
        "c AS (SELECT x - m.m AS c0, " +
        (1 to 3).map(l =>
          s"lead(x, $l) OVER (ORDER BY d) - m.m AS c$l").mkString(", ") +
        " FROM s CROSS JOIN m), " +
        "a AS (SELECT sum(CAST(c0 * c0 AS DECIMAL(28,8))) AS den, " +
        (1 to 3).map(l =>
          s"sum(CAST(c0 * c$l AS DECIMAL(28,8))) AS n$l").mkString(", ") +
        " FROM a0), ".replace("a0", "c") +
        "rr AS (SELECT " +
        (1 to 3).map(l =>
          s"round(CAST(n$l AS DOUBLE) / CAST(den AS DOUBLE), 6) AS r$l")
          .mkString(", ") +
        " FROM a), " +
        "p1 AS (SELECT r1, r2, r3, 1.0 - r1 * r1 AS d2 FROM rr), " +
        "p2 AS (SELECT *, (r2 - r1 * r1) / d2 AS p22 FROM p1), " +
        "p3 AS (SELECT *, r1 - p22 * r1 AS p21 FROM p2), " +
        "p4 AS (SELECT *, 1.0 - (p21 * r1 + p22 * r2) AS d3 FROM p3), " +
        "p5 AS (SELECT *, (r3 - (p21 * r2 + p22 * r1)) / d3 AS p33 FROM p4) " +
        "SELECT lag, pacf FROM (" +
        "SELECT 1 AS lag, round(r1, 6) AS pacf FROM p5 " +
        "UNION ALL SELECT 2, round(CASE WHEN d2 <> 0 THEN p22 END, 6) FROM p5 " +
        "UNION ALL SELECT 3, round(CASE WHEN d2 <> 0 AND d3 <> 0 THEN p33 END, 6) FROM p5" +
        ") ORDER BY lag"),

    // Same per-value rank cumulative, same tie-corrected variance with
    // fixed parenthesization.
    "q_mannwhitney" ->
      ("WITH v AS (SELECT value, CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END " +
        "AS b FROM events WHERE value IS NOT NULL), " +
        "pv AS (SELECT value, SUM(1 - b) AS ca, SUM(b) AS cb, " +
        "SUM(1 - b) + SUM(b) AS t FROM v GROUP BY 1), " +
        "r AS (SELECT ca, cb, t, COALESCE(SUM(t) OVER (ORDER BY value " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef FROM pv), " +
        "c AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a, " +
        "CAST(SUM(cb) AS BIGINT) AS n_b, " +
        "SUM(CAST((CAST(bef AS DOUBLE) + (t + 1) / 2.0) * ca AS DECIMAL(28,8))) AS ra, " +
        "SUM(CAST(t * t * t - t AS DECIMAL(28,8))) AS ties FROM r) " +
        "SELECT n_a, n_b, " +
        "round(CAST(ra AS DOUBLE) - n_a::DOUBLE * (n_a::DOUBLE + 1.0) / 2.0, 6) AS u_a, " +
        "round(n_a::DOUBLE * n_b::DOUBLE - (CAST(ra AS DOUBLE) - " +
        "n_a::DOUBLE * (n_a::DOUBLE + 1.0) / 2.0), 6) AS u_b, " +
        "round(CASE WHEN sqrt(n_a::DOUBLE * n_b::DOUBLE / 12.0 * " +
        "((n_a::DOUBLE + n_b::DOUBLE + 1.0) - CAST(ties AS DOUBLE) / " +
        "((n_a::DOUBLE + n_b::DOUBLE) * (n_a::DOUBLE + n_b::DOUBLE - 1.0)))) > 0 THEN " +
        "(CAST(ra AS DOUBLE) - n_a::DOUBLE * (n_a::DOUBLE + 1.0) / 2.0 - " +
        "n_a::DOUBLE * n_b::DOUBLE / 2.0) / " +
        "sqrt(n_a::DOUBLE * n_b::DOUBLE / 12.0 * " +
        "((n_a::DOUBLE + n_b::DOUBLE + 1.0) - CAST(ties AS DOUBLE) / " +
        "((n_a::DOUBLE + n_b::DOUBLE) * (n_a::DOUBLE + n_b::DOUBLE - 1.0)))) " +
        "END, 6) AS z FROM c"),

    // Same DECIMAL(18,2)-string leading digit, same chi-square expansion.
    "q_benford" ->
      ("WITH f AS (SELECT CAST(substr(CAST(CAST(abs(l_extendedprice) AS " +
        "DECIMAL(18,2)) AS VARCHAR), 1, 1) AS INT) AS digit FROM lineitem " +
        "WHERE l_extendedprice IS NOT NULL AND abs(l_extendedprice) >= 1), " +
        "c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1), " +
        "t AS (SELECT sum(n) AS tot FROM c) " +
        "SELECT digit, n, round(n::DOUBLE / tot::DOUBLE, 6) AS obs_share, " +
        "round(log10(1.0 + 1.0 / digit::DOUBLE), 6) AS exp_share, " +
        "round((n::DOUBLE / tot::DOUBLE - log10(1.0 + 1.0 / digit::DOUBLE)) * " +
        "(n::DOUBLE / tot::DOUBLE - log10(1.0 + 1.0 / digit::DOUBLE)) / " +
        "log10(1.0 + 1.0 / digit::DOUBLE) * tot::DOUBLE, 6) AS chi2_term " +
        "FROM c CROSS JOIN t ORDER BY digit"),

    // Mirrors Stats.trimmedMean (alpha 0.1): distinct-value cumulative,
    // integer rank-range overlap weights, DECIMAL kept-value sum.
    "q_trimmed_mean" ->
      ("WITH per AS (SELECT c_mktsegment AS g, CAST(c_acctbal AS DOUBLE) AS v, " +
        "count(*) AS c FROM customer WHERE c_acctbal IS NOT NULL GROUP BY 1, 2), " +
        "r AS (SELECT g, v, c, coalesce(sum(c) OVER (PARTITION BY g ORDER BY v " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef, " +
        "sum(c) OVER (PARTITION BY g) AS n FROM per), " +
        "k AS (SELECT g, v, c, bef, n, " +
        "CAST(floor(CAST(n AS DOUBLE) * 0.1) AS BIGINT) AS k FROM r), " +
        "wgt AS (SELECT g, n, k, v, greatest(0, least(bef + c, n - k) - " +
        "greatest(bef + 1, k + 1) + 1) AS w FROM k) " +
        "SELECT g AS c_mktsegment, CAST(max(n) AS BIGINT) AS n, " +
        "max(k) AS n_trimmed_each, " +
        "CASE WHEN sum(w) > 0 THEN round(CAST(sum(CAST(v * CAST(w AS DOUBLE) " +
        "AS DECIMAL(38,9))) AS DOUBLE) / CAST(sum(w) AS DOUBLE), 6) + 0.0 END " +
        "AS trimmed_mean FROM wgt GROUP BY g ORDER BY g"),

    // Same rank-sum identity over the per-value count table, same
    // DECIMAL(38,8) term sums.
    "q_gini" ->
      ("WITH rev AS (SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS " +
        "DECIMAL(18,2))) AS DOUBLE) AS rev FROM orders GROUP BY 1), " +
        "pv AS (SELECT rev AS value, count(*) AS cnt FROM rev GROUP BY 1), " +
        "r AS (SELECT value, cnt, COALESCE(SUM(cnt) OVER (ORDER BY value " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef FROM pv), " +
        "a AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n, " +
        "SUM(CAST(value * cnt AS DECIMAL(38,8))) AS sx, " +
        "SUM(CAST(value * (CAST(bef AS DOUBLE) + (cnt + 1) / 2.0) * cnt " +
        "AS DECIMAL(38,8))) AS srx FROM r) " +
        "SELECT n, round(CAST(sx AS DOUBLE), 2) AS total, " +
        "round(2.0 * CAST(srx AS DOUBLE) / (n::DOUBLE * CAST(sx AS DOUBLE)) - " +
        "(n::DOUBLE + 1.0) / n::DOUBLE, 6) AS gini FROM a"),

    // Same per-column count reduction, same n·log2(n) DECIMAL sums.
    "q_entropy_profile" ->
      ("WITH " +
        Seq("l_returnflag", "l_linestatus", "l_suppkey", "l_quantity")
          .zipWithIndex.map { case (c, i) =>
            s"c$i AS (SELECT $c AS v, count(*) AS n FROM lineitem GROUP BY 1), " +
            s"e$i AS (SELECT CAST(count(*) AS BIGINT) AS nd, sum(n) AS tot, " +
            s"SUM(CAST(n * log2(n) AS DECIMAL(28,8))) AS nl FROM c$i)"
          }.mkString(", ") +
        " SELECT col_name, n_distinct, entropy FROM (" +
        Seq("l_returnflag", "l_linestatus", "l_suppkey", "l_quantity")
          .zipWithIndex.map { case (c, i) =>
            s"SELECT '$c' AS col_name, nd AS n_distinct, " +
            s"round(log2(tot) - CAST(nl AS DOUBLE) / CAST(tot AS DOUBLE), 6) " +
            s"AS entropy FROM e$i"
          }.mkString(" UNION ALL ") +
        ") ORDER BY col_name"),

    // Same two-lead window, same deterministic top-20.
    "q_path_trigrams" ->
      ("WITH w AS (SELECT event_type AS step1, " +
        "lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step2, " +
        "lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step3 " +
        "FROM events) " +
        "SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n FROM w " +
        "WHERE step2 IS NOT NULL AND step3 IS NOT NULL GROUP BY 1, 2, 3 " +
        "ORDER BY n DESC, step1, step2, step3 LIMIT 20"),

    // Same censoring rule, same exp(Σ ln(1−d/n)) product.
    "q_survival_km" ->
      ("WITH s AS (SELECT user_id, min(ts) AS f, " +
        "min(CASE WHEN event_type = 'purchase' THEN ts END) AS c, " +
        "max(ts) AS l FROM events GROUP BY 1), " +
        "subj AS (SELECT CAST(date_diff('day', CAST(f AS DATE), " +
        "CAST(coalesce(c, l) AS DATE)) AS BIGINT) AS t, " +
        "(c IS NOT NULL) AS obs FROM s), " +
        "pt AS (SELECT t, CAST(SUM(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT) AS d, " +
        "count(*) AS lv FROM subj GROUP BY 1), " +
        "r AS (SELECT t, d, SUM(lv) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW " +
        "AND UNBOUNDED FOLLOWING) AS n_risk FROM pt), " +
        "k AS (SELECT t, d, n_risk, " +
        "max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER " +
        "(ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead, " +
        "exp(SUM(CASE WHEN d > 0 AND d < n_risk THEN " +
        "ln(1.0 - d::DOUBLE / n_risk::DOUBLE) ELSE 0.0 END) OVER " +
        "(ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS surv " +
        "FROM r) SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d, " +
        "round(CASE WHEN dead = 1 THEN 0.0 ELSE surv END, 6) AS surv " +
        "FROM k WHERE d > 0 ORDER BY t"),

    // Same risk sets as q_survival_km, DECIMAL hazard term sums.
    "q_hazard_na" ->
      ("WITH s AS (SELECT user_id, min(ts) AS f, " +
        "min(CASE WHEN event_type = 'purchase' THEN ts END) AS c, " +
        "max(ts) AS l FROM events GROUP BY 1), " +
        "subj AS (SELECT CAST(date_diff('day', CAST(f AS DATE), " +
        "CAST(coalesce(c, l) AS DATE)) AS BIGINT) AS t, " +
        "(c IS NOT NULL) AS obs FROM s), " +
        "pt AS (SELECT t, CAST(SUM(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT) AS d, " +
        "count(*) AS lv FROM subj GROUP BY 1), " +
        "r AS (SELECT t, d, SUM(lv) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW " +
        "AND UNBOUNDED FOLLOWING) AS n_risk FROM pt), " +
        "k AS (SELECT t, d, n_risk, " +
        "SUM(CAST(d::DOUBLE / n_risk::DOUBLE AS DECIMAL(28,14))) OVER " +
        "(ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ch " +
        "FROM r) SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d, " +
        "round(CAST(ch AS DOUBLE), 6) AS cum_hazard " +
        "FROM k WHERE d > 0 ORDER BY t"),

    // Same exact-DECIMAL moments, same closed-form 2x2 inverse with
    // pinned parenthesization.
    "q_mahalanobis" ->
      ("WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "SUM(CAST(l_quantity AS DECIMAL(38,8))) AS sx, " +
        "SUM(CAST(l_extendedprice AS DECIMAL(38,8))) AS sy, " +
        "SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,8))) AS sxx, " +
        "SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,8))) AS syy, " +
        "SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,8))) AS sxy " +
        "FROM lineitem), " +
        "s AS (SELECT CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx, " +
        "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my, " +
        "CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) - " +
        "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS vxx, " +
        "CAST(syy AS DOUBLE) / CAST(n AS DOUBLE) - " +
        "(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS vyy, " +
        "CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE) - " +
        "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS vxy FROM m), " +
        "s2 AS (SELECT mx, my, vxx, vyy, vxy, " +
        "vxx * vyy - vxy * vxy AS det FROM s) " +
        "SELECT l_orderkey, l_linenumber, " +
        "round((vyy * (l_quantity - mx) * (l_quantity - mx) - " +
        "2.0 * vxy * (l_quantity - mx) * (l_extendedprice - my) + " +
        "vxx * (l_extendedprice - my) * (l_extendedprice - my)) / det, 6) AS d2 " +
        "FROM lineitem CROSS JOIN s2 " +
        "ORDER BY d2 DESC, l_orderkey, l_linenumber LIMIT 25"),

    // Same contingency cells and DECIMAL chi-square sum as q_chi_square,
    // plus the LEAST-normalized V.
    "q_cramers_v" ->
      ("WITH j AS (SELECT l_returnflag AS a, l_linestatus AS b FROM lineitem), " +
        "obs AS (SELECT a, b, count(*) AS o FROM j GROUP BY 1, 2), " +
        "rt AS (SELECT a, sum(o) AS rt FROM obs GROUP BY 1), " +
        "ct AS (SELECT b, sum(o) AS ct FROM obs GROUP BY 1), " +
        "n AS (SELECT sum(o) AS n FROM obs), " +
        "cells AS (SELECT obs.o, CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) " +
        "/ CAST(n.n AS DOUBLE) AS e, obs.a, obs.b, n.n AS nn " +
        "FROM obs JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN n), " +
        "agg AS (SELECT CAST(SUM(CAST((CAST(o AS DOUBLE) - e) * " +
        "(CAST(o AS DOUBLE) - e) / e AS DECIMAL(28,10))) AS DOUBLE) + " +
        "(CAST(max(nn) AS DOUBLE) - " +
        "CAST(SUM(CAST(e AS DECIMAL(28,10))) AS DOUBLE)) AS chi2d, " +
        "count(DISTINCT a) AS r, count(DISTINCT b) AS c, max(nn) AS n FROM cells) " +
        "SELECT round(chi2d, 6) AS chi2, CAST(n AS BIGINT) AS n, " +
        "round(sqrt(chi2d / CAST(n AS DOUBLE) / " +
        "CAST(LEAST(r - 1, c - 1) AS DOUBLE)), 6) AS cramers_v FROM agg"),

    // Same joint-count collapse as q_cramers_v; marginals/total as
    // window sums of exact longs over the cell table, per-cell MI and
    // entropy terms round to 9 dp into DECIMAL(38,9) sums, NMI pinned
    // NULL when min(H) = 0.
    "q_mutual_info" ->
      ("WITH j AS (SELECT l_returnflag AS x, l_linestatus AS y, count(*) AS c " +
        "FROM lineitem GROUP BY 1, 2), " +
        "g AS (SELECT c, SUM(c) OVER (PARTITION BY x) AS cx, " +
        "SUM(c) OVER (PARTITION BY y) AS cy, SUM(c) OVER () AS n FROM j), " +
        "k AS (SELECT n, CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS pxy, " +
        "CAST(cx AS DOUBLE) / CAST(n AS DOUBLE) AS px, " +
        "CAST(cy AS DOUBLE) / CAST(n AS DOUBLE) AS py FROM g), " +
        "a AS (SELECT CAST(max(n) AS BIGINT) AS n, count(*) AS n_cells, " +
        "SUM(CAST(round(pxy * log2(pxy / (px * py)), 9) AS DECIMAL(38,9))) AS mi, " +
        "SUM(CAST(round(pxy * log2(px), 9) AS DECIMAL(38,9))) AS hx, " +
        "SUM(CAST(round(pxy * log2(py), 9) AS DECIMAL(38,9))) AS hy FROM k) " +
        "SELECT n, n_cells, round(CAST(mi AS DOUBLE), 6) + 0.0 AS mi, " +
        "round(-CAST(hx AS DOUBLE), 6) + 0.0 AS h_x, " +
        "round(-CAST(hy AS DOUBLE), 6) + 0.0 AS h_y, " +
        "CASE WHEN least(-CAST(hx AS DOUBLE), -CAST(hy AS DOUBLE)) > 0 THEN " +
        "round(CAST(mi AS DOUBLE) / least(-CAST(hx AS DOUBLE), " +
        "-CAST(hy AS DOUBLE)), 6) + 0.0 END AS nmi FROM a"),

    // Same smoothed vocab join as q_kl_drift, JSD terms.
    "q_js_divergence" ->
      ("WITH ta AS (SELECT unnest(string_split(text, ' ')) AS token " +
        "FROM documents WHERE doc_id % 2 = 0), " +
        "tb AS (SELECT unnest(string_split(text, ' ')) AS token " +
        "FROM documents WHERE doc_id % 2 = 1), " +
        "ca AS (SELECT token, count(*) AS ca FROM ta WHERE token <> '' GROUP BY 1), " +
        "cb AS (SELECT token, count(*) AS cb FROM tb WHERE token <> '' GROUP BY 1), " +
        "j AS (SELECT coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb " +
        "FROM ca FULL OUTER JOIN cb ON ca.token = cb.token), " +
        "t AS (SELECT sum(ca) AS ta, sum(cb) AS tb, count(*) AS v FROM j), " +
        "p AS (SELECT (ca + 1.0) / (t.ta + t.v) AS pa, " +
        "(cb + 1.0) / (t.tb + t.v) AS pb FROM j CROSS JOIN t) " +
        "SELECT round(CAST(sum(CAST(round(pa * ln(pa / ((pa + pb) / 2.0)) / 2.0 + " +
        "pb * ln(pb / ((pa + pb) / 2.0)) / 2.0, 9) AS DECIMAL(28,14))) " +
        "AS DOUBLE), 6) AS jsd, CAST(count(*) AS BIGINT) AS vocab FROM p"),

    // Same nine DECIMAL moments, same Cramer determinants with pinned
    // association.
    "q_ols2" ->
      ("WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(38,12))) AS DOUBLE) AS s1, " +
        "CAST(SUM(CAST(l_discount AS DECIMAL(38,12))) AS DOUBLE) AS s2, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS sy, " +
        "CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,12))) AS DOUBLE) AS s11, " +
        "CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(38,12))) AS DOUBLE) AS s22, " +
        "CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(38,12))) AS DOUBLE) AS s12, " +
        "CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS s1y, " +
        "CAST(SUM(CAST(l_discount * l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS s2y, " +
        "CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS syy " +
        "FROM lineitem WHERE l_extendedprice IS NOT NULL " +
        "AND l_quantity IS NOT NULL AND l_discount IS NOT NULL), " +
        "d AS (SELECT n, CAST(n AS DOUBLE) AS nd, s1, s2, sy, s11, s22, s12, " +
        "s1y, s2y, syy, " +
        "CAST(n AS DOUBLE) * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + " +
        "s2 * (s1 * s12 - s11 * s2) AS det, " +
        "sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + " +
        "s2 * (s1y * s12 - s11 * s2y) AS d0, " +
        "CAST(n AS DOUBLE) * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + " +
        "s2 * (s1 * s2y - s1y * s2) AS d1, " +
        "CAST(n AS DOUBLE) * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + " +
        "sy * (s1 * s12 - s11 * s2) AS d2 FROM m), " +
        "c AS (SELECT n, nd, sy, s1y, s2y, syy, " +
        "d0 / det AS b0, d1 / det AS b1, d2 / det AS b2 FROM d) " +
        "SELECT n, round(b0, 6) AS b0, round(b1, 6) AS b1, round(b2, 6) AS b2, " +
        "round(1.0 - (syy - b0 * sy - b1 * s1y - b2 * s2y) / " +
        "(syy - sy * sy / nd), 6) AS r2 FROM c"),

    // Same hash slices, 9-dp DECIMAL model means, quantile_cont band
    // (the proven percentileTwoPass equivalence), identical coverage
    // comparison.
    "q_conformal" ->
      ("WITH b AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v, " +
        "user_id % 10 AS m FROM events WHERE value IS NOT NULL), " +
        "mo AS (SELECT g, round(CAST(sum(CAST(v AS DECIMAL(28,9))) AS DOUBLE) / " +
        "count(*), 9) AS mu FROM b WHERE m <= 5 GROUP BY 1), " +
        "r AS (SELECT b.m, abs(b.v - mo.mu) AS r FROM b JOIN mo USING (g)), " +
        "q AS (SELECT round(quantile_cont(r, 0.9), 6) AS qhat, " +
        "count(*) AS n_cal FROM r WHERE m IN (6, 7)), " +
        "t AS (SELECT count(*) AS n_test, " +
        "sum(CASE WHEN r.r <= q.qhat THEN 1 ELSE 0 END) AS inb FROM r, q " +
        "WHERE m >= 8) " +
        "SELECT CAST(q.n_cal AS BIGINT) AS n_cal, " +
        "CAST(t.n_test AS BIGINT) AS n_test, q.qhat, " +
        "round(CAST(t.inb AS DOUBLE) / CAST(t.n_test AS DOUBLE), 6) AS coverage " +
        "FROM q, t"),

    // Same per-|d| count-table ranks (q_mannwhitney's cumulative shape),
    // DECIMAL rank sums, identical tie-corrected z parenthesization.
    "q_wilcoxon" ->
      ("WITH daily AS (SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, " +
        "day(o_orderdate) AS dd, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS rev " +
        "FROM orders GROUP BY 1, 2, 3), " +
        "pr AS (SELECT a.rev - b.rev AS d FROM daily a JOIN daily b " +
        "ON a.m = b.m AND a.dd = b.dd AND a.y = 1996 AND b.y = 1997), " +
        "nz AS (SELECT abs(d) AS v, CASE WHEN d > 0 THEN 1 ELSE 0 END AS p " +
        "FROM pr WHERE d <> 0), " +
        "pv AS (SELECT v, SUM(p) AS cp, SUM(1 - p) AS cn, " +
        "SUM(p) + SUM(1 - p) AS t FROM nz GROUP BY 1), " +
        "r AS (SELECT cp, cn, t, COALESCE(SUM(t) OVER (ORDER BY v " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef FROM pv), " +
        "c AS (SELECT CAST(SUM(cp + cn) AS BIGINT) AS n, " +
        "CAST(SUM(CAST((CAST(bef AS DOUBLE) + (t + 1) / 2.0) * cp AS DECIMAL(28,8))) AS DOUBLE) AS wp, " +
        "CAST(SUM(CAST((CAST(bef AS DOUBLE) + (t + 1) / 2.0) * cn AS DECIMAL(28,8))) AS DOUBLE) AS wm, " +
        "CAST(SUM(CAST(t * t * t - t AS DECIMAL(28,8))) AS DOUBLE) AS ties FROM r) " +
        "SELECT coalesce(n, 0) AS n, round(wp, 6) AS w_plus, " +
        "round(wm, 6) AS w_minus, " +
        "round(CASE WHEN sqrt(n::DOUBLE * (n::DOUBLE + 1.0) * (2.0 * n::DOUBLE + 1.0) / 24.0 " +
        "- ties / 48.0) > 0 THEN " +
        "(wp - n::DOUBLE * (n::DOUBLE + 1.0) / 4.0) / " +
        "sqrt(n::DOUBLE * (n::DOUBLE + 1.0) * (2.0 * n::DOUBLE + 1.0) / 24.0 " +
        "- ties / 48.0) END, 6) AS z FROM c"),

    // Same lag pair construction and five-moment regression with the
    // identical parenthesization chain.
    "q_adf_stat" ->
      ("WITH sd AS (SELECT CAST(o_orderdate AS DATE) AS d, " +
        "CAST(count(*) AS DOUBLE) AS y FROM orders GROUP BY 1), " +
        "l AS (SELECT y, lag(y) OVER (ORDER BY d) AS yl FROM sd), " +
        "p AS (SELECT yl AS x, y - yl AS z FROM l WHERE yl IS NOT NULL), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(z AS DECIMAL(38,12))) AS DOUBLE) AS sz, " +
        "CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(x * z AS DECIMAL(38,12))) AS DOUBLE) AS sxz, " +
        "CAST(sum(CAST(z * z AS DECIMAL(38,12))) AS DOUBLE) AS szz FROM p), " +
        "c AS (SELECT n, CAST(n AS DOUBLE) AS nd, sx, sz, sxx, sxz, szz, " +
        "sxx - sx * sx / CAST(n AS DOUBLE) AS sxxc FROM m), " +
        "e AS (SELECT n, nd, sz, sxz, szz, sxxc, sx, " +
        "(sxz - sx * sz / nd) / sxxc AS beta FROM c), " +
        "f AS (SELECT n, nd, sxz, szz, sxxc, beta, " +
        "sz / nd - beta * (sx / nd) AS a, sz FROM e) " +
        "SELECT n, round(a, 6) AS alpha_hat, round(beta, 6) AS beta, " +
        "round(beta / sqrt(((szz - a * sz - beta * sxz) / (nd - 2.0)) / sxxc), 6) AS t_stat " +
        "FROM f"),

    // The ols2 nine-moment chain over the daily series with the hinge
    // feature; slope_after recomposes the 6-dp coefficients.
    "q_segmented_trend" ->
      ("WITH sd AS (SELECT CAST(o_orderdate AS DATE) AS dte, " +
        "CAST(count(*) AS DOUBLE) AS y FROM orders GROUP BY 1), " +
        "f AS (SELECT y, CAST(date_diff('day', DATE '1970-01-01', dte) AS DOUBLE) AS x1, " +
        "greatest(CAST(0 AS DOUBLE), " +
        "CAST(date_diff('day', DATE '1970-01-01', dte) AS DOUBLE) - " +
        "CAST(date_diff('day', DATE '1970-01-01', DATE '1998-01-01') AS DOUBLE)) AS x2 " +
        "FROM sd), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(SUM(CAST(x1 AS DECIMAL(38,12))) AS DOUBLE) AS s1, " +
        "CAST(SUM(CAST(x2 AS DECIMAL(38,12))) AS DOUBLE) AS s2, " +
        "CAST(SUM(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy, " +
        "CAST(SUM(CAST(x1 * x1 AS DECIMAL(38,12))) AS DOUBLE) AS s11, " +
        "CAST(SUM(CAST(x2 * x2 AS DECIMAL(38,12))) AS DOUBLE) AS s22, " +
        "CAST(SUM(CAST(x1 * x2 AS DECIMAL(38,12))) AS DOUBLE) AS s12, " +
        "CAST(SUM(CAST(x1 * y AS DECIMAL(38,12))) AS DOUBLE) AS s1y, " +
        "CAST(SUM(CAST(x2 * y AS DECIMAL(38,12))) AS DOUBLE) AS s2y, " +
        "CAST(SUM(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS syy FROM f), " +
        "d AS (SELECT n, CAST(n AS DOUBLE) AS nd, s1, s2, sy, s11, s22, s12, " +
        "s1y, s2y, syy, " +
        "CAST(n AS DOUBLE) * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + " +
        "s2 * (s1 * s12 - s11 * s2) AS det, " +
        "sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + " +
        "s2 * (s1y * s12 - s11 * s2y) AS d0, " +
        "CAST(n AS DOUBLE) * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + " +
        "s2 * (s1 * s2y - s1y * s2) AS d1, " +
        "CAST(n AS DOUBLE) * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + " +
        "sy * (s1 * s12 - s11 * s2) AS d2 FROM m), " +
        "c AS (SELECT n, nd, sy, s1y, s2y, syy, " +
        "d0 / det AS b0, d1 / det AS b1, d2 / det AS b2 FROM d) " +
        "SELECT n AS n_days, round(b0, 6) AS b0, round(b1, 6) AS slope_before, " +
        "round(b2, 6) AS slope_change, " +
        "round(round(b1, 6) + round(b2, 6), 6) AS slope_after, " +
        "round(1.0 - (syy - b0 * sy - b1 * s1y - b2 * s2y) / " +
        "(syy - sy * sy / nd), 6) AS r2 FROM c"),

    // Plain three-way basket join — A-priori pruning is count-invariant
    // by monotonicity, so the unpruned oracle is the exact answer.
    "q_basket_triples" ->
      ("WITH items AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it " +
        "FROM lineitem), " +
        "t AS (SELECT a.it AS item1, b.it AS item2, c.it AS item3, " +
        "CAST(count(*) AS BIGINT) AS support " +
        "FROM items a JOIN items b ON a.bk = b.bk AND a.it < b.it " +
        "JOIN items c ON a.bk = c.bk AND b.it < c.it GROUP BY 1, 2, 3) " +
        "SELECT item1, item2, item3, support FROM t WHERE support >= 2 " +
        "ORDER BY support DESC, item1, item2, item3 LIMIT 50"),

    // Same daily series, same DECIMAL cross-moment sums, both lag signs.
    "q_ccf" ->
      ("WITH s AS (SELECT CAST(o_orderdate AS DATE) AS d, " +
        "CAST(count(*) AS DOUBLE) AS x, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y " +
        "FROM orders GROUP BY 1), " +
        "m AS (SELECT sum(x) / count(*) AS mx, sum(y) / count(*) AS my FROM s), " +
        "c AS (SELECT x - m.mx AS cx, y - m.my AS cy, " +
        (1 to 3).map(l =>
          s"lead(y, $l) OVER (ORDER BY d) - m.my AS cyl$l").mkString(", ") + ", " +
        (1 to 3).map(l =>
          s"lead(x, $l) OVER (ORDER BY d) - m.mx AS cxl$l").mkString(", ") +
        " FROM s CROSS JOIN m), " +
        "a AS (SELECT sum(CAST(cx * cx AS DECIMAL(28,8))) AS dx, " +
        "sum(CAST(cy * cy AS DECIMAL(28,8))) AS dy, " +
        "sum(CAST(cx * cy AS DECIMAL(28,8))) AS n0, " +
        (1 to 3).map(l =>
          s"sum(CAST(cx * cyl$l AS DECIMAL(28,8))) AS np$l").mkString(", ") + ", " +
        (1 to 3).map(l =>
          s"sum(CAST(cy * cxl$l AS DECIMAL(28,8))) AS nm$l").mkString(", ") +
        " FROM c) SELECT lag, ccf FROM (" +
        ((3 to 1 by -1).map(l =>
          s"SELECT -$l AS lag, round(CAST(nm$l AS DOUBLE) / " +
          s"sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)), 6) AS ccf FROM a") ++
         Seq("SELECT 0 AS lag, round(CAST(n0 AS DOUBLE) / " +
          "sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)), 6) AS ccf FROM a") ++
         (1 to 3).map(l =>
          s"SELECT $l AS lag, round(CAST(np$l AS DOUBLE) / " +
          s"sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)), 6) AS ccf FROM a"))
          .mkString(" UNION ALL ") +
        ") ORDER BY lag"),

    // Same first-position quantile bands over per-value cumulatives.
    "q_rfm" ->
      ("WITH pc AS (SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS lastd, " +
        "CAST(count(*) AS BIGINT) AS freq, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mon " +
        "FROM orders GROUP BY 1), " +
        "ao AS (SELECT max(lastd) AS asof FROM pc), " +
        "b AS (SELECT o_custkey, CAST(date_diff('day', lastd, ao.asof) AS BIGINT) " +
        "AS rec, freq, mon FROM pc CROSS JOIN ao), " +
        "n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b), " +
        "rcv AS (SELECT rec AS v, count(*) AS c FROM b GROUP BY 1), " +
        "rct AS (SELECT v, CAST(floor(CAST(COALESCE(SUM(c) OVER (ORDER BY v " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5 AS DOUBLE) / " +
        "CAST(n.n AS DOUBLE)) AS INT) + 1 AS tile FROM rcv CROSS JOIN n), " +
        "fcv AS (SELECT freq AS v, count(*) AS c FROM b GROUP BY 1), " +
        "fct AS (SELECT v, CAST(floor(CAST(COALESCE(SUM(c) OVER (ORDER BY v " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5 AS DOUBLE) / " +
        "CAST(n.n AS DOUBLE)) AS INT) + 1 AS tile FROM fcv CROSS JOIN n), " +
        "mcv AS (SELECT mon AS v, count(*) AS c FROM b GROUP BY 1), " +
        "mct AS (SELECT v, CAST(floor(CAST(COALESCE(SUM(c) OVER (ORDER BY v " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 5 AS DOUBLE) / " +
        "CAST(n.n AS DOUBLE)) AS INT) + 1 AS tile FROM mcv CROSS JOIN n), " +
        "sc AS (SELECT 6 - rct.tile AS r_score, fct.tile AS f_score, " +
        "mct.tile AS m_score, b.mon FROM b " +
        "JOIN rct ON b.rec = rct.v JOIN fct ON b.freq = fct.v " +
        "JOIN mct ON b.mon = mct.v) " +
        "SELECT r_score, f_score, m_score, CAST(count(*) AS BIGINT) AS n_customers, " +
        "round(CAST(SUM(CAST(mon AS DECIMAL(18,2))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) AS avg_monetary " +
        "FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),

    // DuckDB's jaro_winkler_similarity implements the same textbook
    // definition the kernel pins (0.7 boost threshold) — exact compare.
    "q_jaro_winkler" ->
      ("WITH dd AS (SELECT CASE WHEN doc_id % 37 = 0 THEN " +
        "regexp_replace(text, '\\bcustomer\\b', 'customes', 'g') " +
        "WHEN doc_id % 41 = 0 THEN " +
        "regexp_replace(text, '\\bcolumn\\b', 'colunn', 'g') " +
        "ELSE text END AS text FROM documents), " +
        "v AS (SELECT token FROM (SELECT unnest(string_split(text, ' ')) " +
        "AS token FROM dd) WHERE length(token) >= 4 GROUP BY 1), " +
        "k AS (SELECT token, b FROM v, " +
        "UNNEST([length(token), length(token) + 1]) AS u(b)), " +
        "p AS (SELECT a.token AS t1, bb.token AS t2 FROM k a JOIN k bb " +
        "ON a.b = bb.b AND a.token < bb.token) " +
        "SELECT DISTINCT t1, t2, " +
        "round(jaro_winkler_similarity(t1, t2), 6) AS jw FROM p " +
        "WHERE jaro_winkler_similarity(t1, t2) >= 0.93 " +
        "ORDER BY jw DESC, t1, t2 LIMIT 50"),

    // Same greedy-earliest chain with the 7-day window from first view.
    "q_window_funnel" ->
      ("WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events), " +
        "s1 AS (SELECT user_id, min(tus) AS t1 FROM e " +
        "WHERE event_type = 'view' GROUP BY 1), " +
        "s2 AS (SELECT e.user_id, s1.t1, min(tus) AS t2 FROM e " +
        "JOIN s1 ON e.user_id = s1.user_id WHERE event_type = 'click' " +
        "AND tus > s1.t1 AND tus <= s1.t1 + 604800000000 GROUP BY 1, 2), " +
        "s3 AS (SELECT e.user_id, min(tus) AS t3 FROM e " +
        "JOIN s2 ON e.user_id = s2.user_id WHERE event_type = 'purchase' " +
        "AND tus > s2.t2 AND tus <= s2.t1 + 604800000000 GROUP BY 1) " +
        "SELECT depth, step, n_keys FROM (" +
        "SELECT 1 AS depth, 'view' AS step, CAST(count(*) AS BIGINT) AS n_keys FROM s1 " +
        "UNION ALL SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2 " +
        "UNION ALL SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3) " +
        "ORDER BY depth"),

    // Same calendar-bounded pair set; all counts exact integers, tau_b
    // in the same fixed double arithmetic with the all-tied guard.
    "q_kendall_tau" ->
      ("WITH sd AS (SELECT CAST(o_orderdate AS DATE) AS d, " +
        "CAST(count(*) AS DOUBLE) AS x, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS y " +
        "FROM orders GROUP BY 1), " +
        "p AS (SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS c, " +
        "CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS dd, " +
        "CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx, " +
        "CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty " +
        "FROM sd a JOIN sd b ON a.d < b.d) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(sum(c) AS BIGINT) AS concordant, " +
        "CAST(sum(dd) AS BIGINT) AS discordant, " +
        "CAST(sum(tx) AS BIGINT) AS ties_x, " +
        "CAST(sum(ty) AS BIGINT) AS ties_y, " +
        "CASE WHEN (count(*) - sum(tx)) * (count(*) - sum(ty)) = 0 " +
        "THEN CAST(0 AS DOUBLE) " +
        "ELSE round(CAST(sum(c) - sum(dd) AS DOUBLE) / " +
        "sqrt(CAST((count(*) - sum(tx)) * (count(*) - sum(ty)) AS DOUBLE)), 6) " +
        "END AS tau_b FROM p"),

    // Same bounded pairwise-slope set, same quantile_cont median.
    "q_theil_sen" ->
      ("WITH sd AS (SELECT CAST(o_orderdate AS DATE) AS d, " +
        "CAST(count(*) AS DOUBLE) AS y FROM orders GROUP BY 1), " +
        "s AS (SELECT CAST(date_diff('day', DATE '1970-01-01', d) AS DOUBLE) " +
        "AS x, y FROM sd), " +
        "p AS (SELECT (b.y - a.y) / (b.x - a.x) AS slope FROM s a " +
        "JOIN s b ON a.x < b.x) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_pairs, " +
        "round(quantile_cont(slope, 0.5), 6) AS slope FROM p"),

    // Same ten DECIMAL moments, same pinned correlation arithmetic.
    "q_partial_corr" ->
      ("WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(38,12))) AS DOUBLE) AS sx, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS sy, " +
        "CAST(SUM(CAST(l_discount AS DECIMAL(38,12))) AS DOUBLE) AS sz, " +
        "CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,12))) AS DOUBLE) AS sxx, " +
        "CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS syy, " +
        "CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(38,12))) AS DOUBLE) AS szz, " +
        "CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS sxy, " +
        "CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(38,12))) AS DOUBLE) AS sxz, " +
        "CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,12))) AS DOUBLE) AS syz " +
        "FROM lineitem WHERE l_quantity IS NOT NULL " +
        "AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL), " +
        "r AS (SELECT n, " +
        "(CAST(n AS DOUBLE) * sxy - sx * sy) / " +
        "sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) * " +
        "(CAST(n AS DOUBLE) * syy - sy * sy)) AS rxy, " +
        "(CAST(n AS DOUBLE) * sxz - sx * sz) / " +
        "sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) * " +
        "(CAST(n AS DOUBLE) * szz - sz * sz)) AS rxz, " +
        "(CAST(n AS DOUBLE) * syz - sy * sz) / " +
        "sqrt((CAST(n AS DOUBLE) * syy - sy * sy) * " +
        "(CAST(n AS DOUBLE) * szz - sz * sz)) AS ryz FROM m) " +
        "SELECT n, round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz, " +
        "round(ryz, 6) AS r_yz, " +
        "round((rxy - rxz * ryz) / sqrt((1.0 - rxz * rxz) * " +
        "(1.0 - ryz * ryz)), 6) AS r_xy_given_z FROM r"),

    // Brute-force haversine over the same synthetic points — the grid
    // join must find exactly the all-pairs answer; association pinned
    // to the engine's (x * (pi/180)) ordering.
    "q_geo_neighbors" ->
      ("WITH p AS (SELECT c_custkey AS k, " +
        "((c_custkey * 37) % 12000) / 100.0 - 60.0 AS lat, " +
        "((c_custkey * 91) % 36000) / 100.0 - 180.0 AS lon FROM customer), " +
        "f AS (SELECT * FROM p WHERE abs(lat) <= 60.0), " +
        "pr AS (SELECT a.k AS k1, b.k AS k2, 2.0 * 6371.0 * asin(sqrt(" +
        "sin((b.lat - a.lat) * (pi() / 180.0) / 2.0) * " +
        "sin((b.lat - a.lat) * (pi() / 180.0) / 2.0) + " +
        "cos(a.lat * (pi() / 180.0)) * cos(b.lat * (pi() / 180.0)) * " +
        "sin((b.lon - a.lon) * (pi() / 180.0) / 2.0) * " +
        "sin((b.lon - a.lon) * (pi() / 180.0) / 2.0))) AS d " +
        "FROM f a JOIN f b ON a.k < b.k) " +
        "SELECT k1, k2, round(d, 6) AS dist_km FROM pr WHERE d <= 200.0 " +
        "ORDER BY k1, k2"),

    // Same count-of-counts reduction, same min-rank convention, same
    // weighted DECIMAL moments.
    "q_zipf_fit" ->
      ("WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents), " +
        "c AS (SELECT token, count(*) AS cnt FROM t WHERE token <> '' GROUP BY 1), " +
        "pc AS (SELECT cnt, count(*) AS m FROM c GROUP BY 1), " +
        "r AS (SELECT cnt, m, COALESCE(SUM(m) OVER (ORDER BY cnt DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef FROM pc), " +
        "p AS (SELECT m, round(ln(CAST(bef AS DOUBLE) + 1.0), 9) AS x, " +
        "round(ln(CAST(cnt AS DOUBLE)), 9) AS y FROM r), " +
        "mm AS (SELECT CAST(SUM(m) AS BIGINT) AS n, " +
        "CAST(SUM(CAST(m * x AS DECIMAL(28,10))) AS DOUBLE) AS sx, " +
        "CAST(SUM(CAST(m * y AS DECIMAL(28,10))) AS DOUBLE) AS sy, " +
        "CAST(SUM(CAST(m * x * x AS DECIMAL(28,10))) AS DOUBLE) AS sxx, " +
        "CAST(SUM(CAST(m * y * y AS DECIMAL(28,10))) AS DOUBLE) AS syy, " +
        "CAST(SUM(CAST(m * x * y AS DECIMAL(28,10))) AS DOUBLE) AS sxy FROM p), " +
        "c2 AS (SELECT n, CAST(n AS DOUBLE) AS nd, sx, sy, " +
        "CAST(n AS DOUBLE) * sxy - sx * sy AS covn, " +
        "CAST(n AS DOUBLE) * sxx - sx * sx AS varxn, " +
        "CAST(n AS DOUBLE) * syy - sy * sy AS varyn FROM mm) " +
        "SELECT n AS n_tokens_distinct, round(covn / varxn, 6) AS slope, " +
        "round((sy - covn / varxn * sx) / nd, 6) AS intercept, " +
        "round(covn * covn / (varxn * varyn), 6) AS r2 FROM c2"),

    // Same full-month-grid fill, same guarded population cv, same bands.
    "q_xyz_analysis" ->
      ("WITH mo AS (SELECT l_partkey AS k, " +
        "date_trunc('month', CAST(l_shipdate AS DATE)) AS m, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q " +
        "FROM lineitem GROUP BY 1, 2), " +
        "ms AS (SELECT DISTINCT m FROM mo), ks AS (SELECT DISTINCT k FROM mo), " +
        "g AS (SELECT k, m FROM ks CROSS JOIN ms), " +
        "f AS (SELECT g.k, COALESCE(mo.q, 0.0) AS q FROM g " +
        "LEFT JOIN mo ON g.k = mo.k AND g.m = mo.m), " +
        "st AS (SELECT k, CAST(count(*) AS BIGINT) AS n, " +
        "SUM(CAST(q AS DECIMAL(28,8))) AS s, " +
        "SUM(CAST(q * q AS DECIMAL(28,8))) AS ss FROM f GROUP BY 1), " +
        "cv AS (SELECT k, sqrt(greatest(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) - " +
        "(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)) / " +
        "(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS cv FROM st WHERE s > 0), " +
        "b AS (SELECT CASE WHEN cv < 0.5 THEN 'X' WHEN cv < 1.0 THEN 'Y' " +
        "ELSE 'Z' END AS band, cv FROM cv) " +
        "SELECT band, CAST(count(*) AS BIGINT) AS n_keys, " +
        "round(CAST(SUM(CAST(cv AS DECIMAL(28,10))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) AS avg_cv FROM b GROUP BY 1 ORDER BY 1"),

    // Same lag-1/lag-7 error sums over the daily series.
    "q_forecast_baseline" ->
      ("WITH s AS (SELECT CAST(o_orderdate AS DATE) AS d, " +
        "CAST(count(*) AS DOUBLE) AS y FROM orders GROUP BY 1), " +
        "l AS (SELECT y, lag(y, 1) OVER (ORDER BY d) AS l1, " +
        "lag(y, 7) OVER (ORDER BY d) AS l7 FROM s), " +
        "k AS (SELECT " +
        "CAST(SUM(CAST(abs(y - l1) AS DECIMAL(28,8))) AS DOUBLE) / " +
        "CAST(count(l1) AS DOUBLE) AS a1, " +
        "CAST(SUM(CAST(abs(y - l1) / y AS DECIMAL(28,8))) AS DOUBLE) / " +
        "CAST(count(l1) AS DOUBLE) AS p1, " +
        "CAST(SUM(CAST(abs(y - l7) AS DECIMAL(28,8))) AS DOUBLE) / " +
        "CAST(count(l7) AS DOUBLE) AS a7 FROM l) " +
        "SELECT round(a1, 6) AS mae_naive, round(p1, 6) AS mape_naive, " +
        "round(a7, 6) AS mae_snaive, round(a7 / a1, 6) AS snaive_vs_naive FROM k"),

    // Same journey construction, same transition probabilities, same
    // 16-sweep DECIMAL(28,14)-truncated value iteration per chain —
    // generated programmatically (5 chains × 16 unrolled CTEs).
    "q_markov_attribution" -> markovAttributionOracle,

    // Same per-value midrank construction as q_mannwhitney, normalized
    // to the AUC probability scale.
    "q_auc" ->
      ("WITH v AS (SELECT value, CASE WHEN event_type = 'purchase' THEN 1 " +
        "ELSE 0 END AS p FROM events WHERE value IS NOT NULL), " +
        "pv AS (SELECT value, SUM(p) AS cp, SUM(1 - p) AS cn, " +
        "SUM(p) + SUM(1 - p) AS t FROM v GROUP BY 1), " +
        "r AS (SELECT cp, cn, t, COALESCE(SUM(t) OVER (ORDER BY value " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef FROM pv), " +
        "c AS (SELECT CAST(SUM(cp) AS BIGINT) AS n_pos, " +
        "CAST(SUM(cn) AS BIGINT) AS n_neg, " +
        "SUM(CAST((CAST(bef AS DOUBLE) + (t + 1) / 2.0) * cp AS DECIMAL(28,8))) AS rp FROM r) " +
        "SELECT n_pos, n_neg, " +
        "round((CAST(rp AS DOUBLE) - n_pos::DOUBLE * (n_pos::DOUBLE + 1.0) / 2.0) / " +
        "(n_pos::DOUBLE * n_neg::DOUBLE), 6) AS auc, " +
        "round(2.0 * ((CAST(rp AS DOUBLE) - n_pos::DOUBLE * (n_pos::DOUBLE + 1.0) / 2.0) / " +
        "(n_pos::DOUBLE * n_neg::DOUBLE)) - 1.0, 6) AS gini FROM c"),

    // Inclusive ECDF cumulatives for both slices over the per-value
    // table, sup-norm max, asymptotic two-sided p.
    "q_ks_test" ->
      ("WITH v AS (SELECT value, CASE WHEN event_type = 'error' THEN 1 " +
        "ELSE 0 END AS b FROM events WHERE value IS NOT NULL), " +
        "pv AS (SELECT value, SUM(1 - b) AS ca, SUM(b) AS cb FROM v GROUP BY 1), " +
        "c AS (SELECT SUM(ca) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED " +
        "PRECEDING AND CURRENT ROW) AS cuma, SUM(cb) OVER (ORDER BY value " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb FROM pv), " +
        "t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM pv), " +
        "d AS (SELECT max(abs(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE) - " +
        "CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE))) AS dmax FROM c CROSS JOIN t) " +
        "SELECT na AS n_a, nb AS n_b, round(dmax, 6) AS d_stat, " +
        "round(least(1.0, 2.0 * exp(-2.0 * dmax * dmax * CAST(na AS DOUBLE) * " +
        "CAST(nb AS DOUBLE) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))), 6) " +
        "AS p_approx FROM d CROSS JOIN t"),

    // Same per-value count collapse as q_ks_test, inclusive-cumulative
    // ECDFs, strip terms round(|Fa-Fb|*dx, 9) into a DECIMAL(38,9) sum;
    // empty-arm CASE pin and the coalesce-to-0 single-value degenerate
    // mirror the engine exactly.
    "q_wasserstein" ->
      ("WITH v AS (SELECT CAST(l_quantity AS DOUBLE) AS v, CASE WHEN " +
        "l_returnflag = 'R' THEN 1 ELSE 0 END AS a FROM lineitem " +
        "WHERE l_quantity IS NOT NULL), " +
        "pv AS (SELECT v, SUM(a) AS ca, SUM(1 - a) AS cb FROM v GROUP BY 1), " +
        "c AS (SELECT v, SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED " +
        "PRECEDING AND CURRENT ROW) AS cuma, SUM(cb) OVER (ORDER BY v " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb, " +
        "lead(v) OVER (ORDER BY v) AS nxt FROM pv), " +
        "t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, " +
        "CAST(SUM(cb) AS BIGINT) AS nb FROM pv), " +
        "s AS (SELECT SUM(CAST(CASE WHEN na > 0 AND nb > 0 THEN " +
        "round(abs(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE) - " +
        "CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE)) * (nxt - v), 9) " +
        "ELSE 0.0 END AS DECIMAL(38,9))) AS w1 " +
        "FROM c CROSS JOIN t WHERE nxt IS NOT NULL) " +
        "SELECT na AS n_a, nb AS n_b, CASE WHEN na > 0 AND nb > 0 THEN " +
        "round(CAST(coalesce(w1, 0) AS DOUBLE), 6) + 0.0 END AS w1 " +
        "FROM s CROSS JOIN t"),

    // Same per-value collapse and inclusive cumulatives as q_ks_test;
    // per-value (ca+cb)*(Fa-Fb)^2 terms round to 9 dp into a
    // DECIMAL(38,9) sum, the na*nb/(na+nb)^2 factor applied once at
    // readout; empty-arm CASE pin mirrored.
    "q_cramer_von_mises" ->
      ("WITH v AS (SELECT CAST(value AS DOUBLE) AS v, CASE WHEN " +
        "event_type = 'error' THEN 1 ELSE 0 END AS a FROM events " +
        "WHERE value IS NOT NULL), " +
        "pv AS (SELECT v, SUM(a) AS ca, SUM(1 - a) AS cb FROM v GROUP BY 1), " +
        "c AS (SELECT ca, cb, SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED " +
        "PRECEDING AND CURRENT ROW) AS cuma, SUM(cb) OVER (ORDER BY v " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb FROM pv), " +
        "t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, " +
        "CAST(SUM(cb) AS BIGINT) AS nb FROM pv), " +
        "s AS (SELECT SUM(CAST(CASE WHEN na > 0 AND nb > 0 THEN " +
        "round(CAST(ca + cb AS DOUBLE) * " +
        "((CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE) - " +
        "CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE)) * " +
        "(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE) - " +
        "CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE))), 9) " +
        "ELSE 0.0 END AS DECIMAL(38,9))) AS s FROM c CROSS JOIN t) " +
        "SELECT na AS n_a, nb AS n_b, CASE WHEN na > 0 AND nb > 0 THEN " +
        "round((CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / " +
        "((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) * " +
        "(CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))) * CAST(s AS DOUBLE), 6) " +
        "+ 0.0 END AS t_stat FROM s CROSS JOIN t"),

    // Same top-(k+1) value multiset (ties value-deterministic), same
    // 9-dp ln terms into a DECIMAL(38,9) sum; short-input and flat-tail
    // NULL pins mirrored.
    "q_hill_tail" ->
      ("WITH top AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem " +
        "WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0 " +
        "ORDER BY v DESC LIMIT 101), " +
        "x AS (SELECT min(v) AS xk, count(*) AS m FROM top), " +
        "s AS (SELECT max(m) AS m, max(xk) AS xk, " +
        "SUM(CAST(round(ln(v / xk), 9) AS DECIMAL(38,9))) AS s " +
        "FROM top CROSS JOIN x) " +
        "SELECT CAST(m - 1 AS BIGINT) AS n_top, " +
        "round(xk, 6) + 0.0 AS x_threshold, " +
        "CASE WHEN m = 101 THEN round(CAST(s AS DOUBLE) / 100.0, 6) + 0.0 " +
        "END AS gamma, " +
        "CASE WHEN m = 101 AND CAST(s AS DOUBLE) > 0 THEN " +
        "round(100.0 / CAST(s AS DOUBLE), 6) + 0.0 END AS alpha FROM s"),

    // Min-max scalar CTE, equal-width bins, per-bin reliability + Brier.
    "q_calibration" ->
      ("WITH b AS (SELECT CAST(value AS DOUBLE) AS s, CASE WHEN " +
        "event_type = 'purchase' THEN 1 ELSE 0 END AS y FROM events " +
        "WHERE value IS NOT NULL), " +
        "mm AS (SELECT min(s) AS lo, max(s) AS hi FROM b), " +
        "sc AS (SELECT CASE WHEN hi = lo THEN 0.5 ELSE (s - lo) / (hi - lo) " +
        "END AS p, y FROM b CROSS JOIN mm), " +
        "bn AS (SELECT CAST(least(floor(p * 10), 9) AS BIGINT) AS bin, p, y FROM sc) " +
        "SELECT bin, count(*) AS n, " +
        "round(CAST(SUM(CAST(p AS DECIMAL(28,10))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) AS mean_pred, " +
        "round(CAST(SUM(y) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS frac_pos, " +
        "round(CAST(SUM(CAST((p - y) * (p - y) AS DECIMAL(28,10))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) AS brier " +
        "FROM bn GROUP BY 1 ORDER BY 1"),

    // Same min-max normalization and hi==lo pin as q_calibration; log
    // loss clamps with the identical double literals and rounds each
    // term through DECIMAL(28,12) before the sum.
    "q_classifier_metrics" ->
      ("WITH b AS (SELECT CAST(value AS DOUBLE) AS s, CASE WHEN " +
        "event_type = 'purchase' THEN 1 ELSE 0 END AS y FROM events " +
        "WHERE value IS NOT NULL), " +
        "mm AS (SELECT min(s) AS lo, max(s) AS hi FROM b), " +
        "sc AS (SELECT y, CASE WHEN hi = lo THEN 0.5 ELSE (s - lo) / (hi - lo) " +
        "END AS p FROM b CROSS JOIN mm), " +
        "pc AS (SELECT y, p, least(greatest(p, 1e-6), 1 - 1e-6) AS q FROM sc) " +
        "SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos, " +
        "round(CAST(sum(CAST((p - y) * (p - y) AS DECIMAL(28,12))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) AS brier, " +
        "round(CAST(sum(CAST(round(-(y * ln(q) + (1 - y) * ln(1 - q)), 9) AS DECIMAL(28,12))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) AS log_loss, " +
        "round(CAST(sum(CASE WHEN (p >= 0.5 AND y = 1) OR (p < 0.5 AND y = 0) " +
        "THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS acc_at_half " +
        "FROM pc"),

    // Same min-max projection and 10 bins as q_calibration; bin moments
    // in DECIMAL(28,10), per-bin decomposition terms round to 9 dp
    // before DECIMAL(38,9) sums, readouts /n at 6 dp signed-zero-safe.
    "q_calibration_decomp" ->
      ("WITH b AS (SELECT CAST(value AS DOUBLE) AS s, CASE WHEN " +
        "event_type = 'purchase' THEN 1 ELSE 0 END AS y FROM events " +
        "WHERE value IS NOT NULL), " +
        "mm AS (SELECT min(s) AS lo, max(s) AS hi FROM b), " +
        "sc AS (SELECT CASE WHEN hi = lo THEN 0.5 ELSE (s - lo) / (hi - lo) " +
        "END AS p, y FROM b CROSS JOIN mm), " +
        "bn AS (SELECT CAST(least(floor(p * 10), 9) AS BIGINT) AS bin, p, y FROM sc), " +
        "g AS (SELECT bin, count(*) AS nb, " +
        "SUM(CAST(p AS DECIMAL(28,10))) AS sp, " +
        "SUM(CAST(p * p AS DECIMAL(28,10))) AS spp, " +
        "SUM(y) AS ny, " +
        "SUM(CAST((p - y) * (p - y) AS DECIMAL(28,10))) AS sbr FROM bn GROUP BY 1), " +
        "w AS (SELECT *, SUM(nb) OVER () AS n, SUM(ny) OVER () AS npos FROM g), " +
        "k AS (SELECT n, npos, CAST(nb AS DOUBLE) AS nbd, " +
        "CAST(sp AS DOUBLE) / CAST(nb AS DOUBLE) AS conf, " +
        "CAST(ny AS DOUBLE) / CAST(nb AS DOUBLE) AS acc, " +
        "CAST(npos AS DOUBLE) / CAST(n AS DOUBLE) AS ybar, " +
        "CAST(spp AS DOUBLE) AS sppd, sbr FROM w), " +
        "t AS (SELECT CAST(max(n) AS BIGINT) AS n, " +
        "CAST(max(npos) AS BIGINT) AS n_pos, " +
        "SUM(CAST(round(nbd * (conf - acc) * (conf - acc), 9) AS DECIMAL(38,9))) AS rel, " +
        "SUM(CAST(round(nbd * (acc - ybar) * (acc - ybar), 9) AS DECIMAL(38,9))) AS res, " +
        "SUM(CAST(round(sppd - nbd * conf * conf, 9) AS DECIMAL(38,9))) AS wbv, " +
        "SUM(CAST(round(nbd * abs(conf - acc), 9) AS DECIMAL(38,9))) AS ece, " +
        "SUM(sbr) AS br FROM k) " +
        "SELECT n, n_pos, " +
        "round(CAST(br AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0 AS brier, " +
        "round(CAST(rel AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0 AS reliability, " +
        "round(CAST(res AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0 AS resolution, " +
        "round((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "(1.0 - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)), 6) + 0.0 AS uncertainty, " +
        "round(CAST(wbv AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0 AS within_bin_var, " +
        "round(CAST(ece AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0 AS ece FROM t"),

    "q_cox_ph" -> coxOracle,
    "q_cox_loglik" -> coxLoglikOracle,
    "q_cox_diag_kln" -> coxDiagKLnOracle,
    "q_cox_diag_kargs" -> coxDiagKArgsOracle,
    "q_cox_diag_kargs_tn" -> coxDiagKArgsTnOracle,
    "q_cox_diag_kargs_s0" -> coxDiagKArgsS0Oracle,
    "q_cox_diag_kargs_q1" -> coxDiagKArgsQuartOracle(1),
    "q_cox_diag_kargs_q2" -> coxDiagKArgsQuartOracle(2),
    "q_cox_diag_kargs_q3" -> coxDiagKArgsQuartOracle(3),
    "q_cox_diag_kargs_q4" -> coxDiagKArgsQuartOracle(4),
    "q_cox_diag_kargs_a0" -> coxDiagKArgsA0Oracle,
    "q_cox_diag_kterms" -> coxDiagKTermsOracle,

    // Bit-parity probes for the portable exp/ln kernel: the SQL is the
    // generated arithmetic mirror (PortableMathSql) of the Scala kernel
    // — no libm call on either engine; see q_portable_* in queries.
    "q_portable_exp" -> {
      val pm = graft.functions.PortableMathSql
      val inner1 = pm.expFrom("events",
        "((event_id * 37) % 40001) / 1000.0e0 - 20.0e0", "__v", "pm")
      val inner2 = pm.expFrom(inner1,
        "((event_id * 41) % 160001) / 1000.0e0 - 80.0e0", "__v8", "ph")
      val chunked = pm.chunkFrom(inner2, "__v", "e_")
      def s(c: String) = s"CAST(SUM(CAST(e_$c AS BIGINT)) AS BIGINT) AS e_$c"
      "SELECT event_id % 20 AS grp, count(*) AS n, " +
        s"${s("hi")}, ${s("c1")}, ${s("c2")}, ${s("c3")}, " +
        "MIN(__v8) AS mn, MAX(__v8) AS mx " +
        s"FROM $chunked GROUP BY 1"
    },

    "q_portable_ln" -> {
      val pm = graft.functions.PortableMathSql
      val base = "(SELECT event_id, __y, __y2, 1.0e0 / __y2 AS __y3 FROM " +
        "(SELECT event_id, __y, (__y * __y) * __y AS __y2 FROM " +
        "(SELECT event_id, ((event_id * 53) % 100003 + 1) / 16.0e0 AS __y " +
        "FROM events) pba) pbb)"
      var rel = pm.lnFrom(base, "__y", "__l1", "pa")
      rel = pm.lnFrom(rel, "__y2", "__l2", "pb")
      rel = pm.lnFrom(rel, "__y3", "__l3", "pc")
      rel = pm.chunkFrom(rel, "__l1", "a_")
      rel = pm.chunkFrom(rel, "__l2", "b_")
      rel = pm.chunkFrom(rel, "__l3", "c_")
      val sums = Seq("a_", "b_", "c_").flatMap(p =>
        Seq("hi", "c1", "c2", "c3").map(c =>
          s"CAST(SUM(CAST($p$c AS BIGINT)) AS BIGINT) AS $p$c")).mkString(", ")
      s"SELECT event_id % 20 AS grp, count(*) AS n, $sums FROM $rel GROUP BY 1"
    },

    // Live-S0-shape ln parity (round 15): arguments k + q/1e9 rebuilt
    // exactly as the cox readout rebuilds its pair sums — see
    // q_portable_ln_s0 in queries.
    "q_portable_ln_s0" -> {
      val pm = graft.functions.PortableMathSql
      val base = "(SELECT event_id, " +
        "CAST((event_id * 37) % 10000 + 1 AS DOUBLE) + " +
        "CAST((event_id * 1000003) % 1000000000 AS DOUBLE) / 1.0e9 " +
        "AS __arg FROM events)"
      val rel = pm.chunkFrom(pm.lnFrom(base, "__arg", "__v", "ps"),
        "__v", "s_")
      val sums = Seq("hi", "c1", "c2", "c3").map(c =>
        s"CAST(SUM(CAST(s_$c AS BIGINT)) AS BIGINT) AS s_$c").mkString(", ")
      s"SELECT event_id % 20 AS grp, count(*) AS n, $sums FROM $rel GROUP BY 1"
    },

    // Wide-quanta + pin9-midpoint-band ln parity (round 16): the SQL is
    // the generated arithmetic mirror of q_portable_ln_s0_wide's two
    // arms — see that entry in queries for the arm construction.
    "q_portable_ln_s0_wide" -> {
      val pm = graft.functions.PortableMathSql
      // event_id pre-mod mirrors the Spark arm (round 17, ADVICE r16):
      // int64-safe at any id, identity below 1e8 (all fixture SFs)
      val base = "(SELECT event_id, " +
        "CAST((event_id * 37) % 10000 + 1 AS DOUBLE) + " +
        "CAST(((event_id % 100000007) * 73856093) % 4000000000000 " +
        "AS DOUBLE) / 1.0e9 AS __aw, " +
        "(CAST(((event_id % 100000007) * 2654435761) % 10000000000 " +
        "AS DOUBLE) + 0.5e0) / 1.0e9 AS __mid, " +
        "CAST(event_id % 5 - 2 AS DOUBLE) AS __j FROM events)"
      val withExp = pm.expFrom(base, "__mid", "__em", "pwe")
      val withArg = "(SELECT *, __em * (1.0e0 + __j * " +
        s"2.220446049250313e-16) AS __am FROM $withExp pwa)"
      var rel = pm.lnFrom(withArg, "__aw", "__vw", "pww")
      rel = pm.lnFrom(rel, "__am", "__vm", "pwm")
      rel = pm.chunkFrom(rel, "__vw", "w_")
      rel = pm.chunkFrom(rel, "__vm", "m_")
      val sums = Seq("w_", "m_").flatMap(p =>
        Seq("hi", "c1", "c2", "c3").map(c =>
          s"CAST(SUM(CAST($p$c AS BIGINT)) AS BIGINT) AS $p$c")).mkString(", ")
      s"SELECT event_id % 20 AS grp, count(*) AS n, $sums FROM $rel GROUP BY 1"
    },

    // Mirrors Stats.cronbachAlpha over the per-user 3-item engagement
    // table: one DECIMAL moment pass, (ss - (s*s)/n)/(n-1) variances.
    "q_cronbach_alpha" ->
      ("WITH per AS (SELECT user_id, " +
        "SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views, " +
        "SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks, " +
        "SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchases " +
        "FROM events GROUP BY 1), " +
        "b AS (SELECT CAST(views AS DOUBLE) AS iv, CAST(clicks AS DOUBLE) AS ic, " +
        "CAST(purchases AS DOUBLE) AS ip, " +
        "CAST(views AS DOUBLE) + CAST(clicks AS DOUBLE) + " +
        "CAST(purchases AS DOUBLE) AS tot FROM per), " +
        "m AS (SELECT count(*) AS n, " +
        "SUM(CAST(iv AS DECIMAL(38,9))) AS sv, " +
        "SUM(CAST(iv * iv AS DECIMAL(38,9))) AS ssv, " +
        "SUM(CAST(ic AS DECIMAL(38,9))) AS sc, " +
        "SUM(CAST(ic * ic AS DECIMAL(38,9))) AS ssc, " +
        "SUM(CAST(ip AS DECIMAL(38,9))) AS sp, " +
        "SUM(CAST(ip * ip AS DECIMAL(38,9))) AS ssp, " +
        "SUM(CAST(tot AS DECIMAL(38,9))) AS st, " +
        "SUM(CAST(tot * tot AS DECIMAL(38,9))) AS sst FROM b), " +
        "k AS (SELECT n, " +
        "(CAST(ssv AS DOUBLE) - (CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)) / " +
        "CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS vv, " +
        "(CAST(ssc AS DOUBLE) - (CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)) / " +
        "CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS vc, " +
        "(CAST(ssp AS DOUBLE) - (CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)) / " +
        "CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS vp, " +
        "(CAST(sst AS DOUBLE) - (CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) / " +
        "CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS vt FROM m) " +
        "SELECT n, CAST(3 AS BIGINT) AS k_items, " +
        "CASE WHEN n > 1 AND vt > 0.0 THEN " +
        "round((3.0 / 2.0) * (1.0 - (vv + vc + vp) / vt), 6) + 0.0 END AS alpha, " +
        "CASE WHEN n > 1 THEN round(vv + vc + vp, 6) + 0.0 END AS item_var_sum, " +
        "CASE WHEN n > 1 THEN round(vt, 6) + 0.0 END AS total_var FROM k"),

    // Mirrors Stats.tukeyHsd (q crit 3.86): k-row group moments,
    // DECIMAL within-SS sum, Tukey-Kramer q over the pair self-join.
    "q_tukey_hsd" ->
      ("WITH g AS (SELECT o_orderpriority AS g, count(*) AS ng, " +
        "SUM(CAST(o_totalprice AS DECIMAL(38,9))) AS sg, " +
        "SUM(CAST(CAST(o_totalprice AS DOUBLE) * CAST(o_totalprice AS DOUBLE) " +
        "AS DECIMAL(38,9))) AS ssg FROM orders " +
        "WHERE o_totalprice IS NOT NULL GROUP BY 1), " +
        "t AS (SELECT SUM(ng) AS nn, count(*) AS k, " +
        "SUM(CAST(CAST(ssg AS DOUBLE) - (CAST(sg AS DOUBLE) * " +
        "CAST(sg AS DOUBLE)) / CAST(ng AS DOUBLE) AS DECIMAL(38,9))) AS wss " +
        "FROM g), " +
        "s AS (SELECT g, ng, CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) AS m " +
        "FROM g) " +
        "SELECT a.g AS g1, b.g AS g2, round(a.m - b.m, 6) + 0.0 AS mean_diff, " +
        "CASE WHEN nn > k AND CAST(wss AS DOUBLE) > 0.0 THEN " +
        "round(abs(a.m - b.m) / sqrt(((CAST(wss AS DOUBLE) / " +
        "CAST(nn - k AS DOUBLE)) / 2.0) * (1.0 / CAST(a.ng AS DOUBLE) + " +
        "1.0 / CAST(b.ng AS DOUBLE))), 6) + 0.0 END AS q_stat, " +
        "CASE WHEN nn > k AND CAST(wss AS DOUBLE) > 0.0 THEN " +
        "abs(a.m - b.m) / sqrt(((CAST(wss AS DOUBLE) / " +
        "CAST(nn - k AS DOUBLE)) / 2.0) * (1.0 / CAST(a.ng AS DOUBLE) + " +
        "1.0 / CAST(b.ng AS DOUBLE))) > 3.86 END AS significant " +
        "FROM s a JOIN s b ON a.g < b.g CROSS JOIN t ORDER BY g1, g2"),

    // Mirrors Stats.holdoutForecast (horizon 28, season 7): weekday is
    // the engine's own consistent key (isodow here, dayofweek in
    // Spark) — only the test-to-train-week MATCHING must agree.
    "q_holdout_forecast" ->
      ("WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d, " +
        "CAST(count(*) AS DOUBLE) AS y FROM orders GROUP BY 1), " +
        "c AS (SELECT max(d) - 28 AS cut FROM daily), " +
        "tr AS (SELECT d, y FROM daily CROSS JOIN c WHERE d <= cut), " +
        "te AS (SELECT d, y FROM daily CROSS JOIN c WHERE d > cut), " +
        "ts AS (SELECT max_by(y, d) AS lasty, " +
        "CAST(SUM(CAST(abs(y - l1) AS DECIMAL(38,9))) AS DOUBLE) / " +
        "CAST(count(l1) AS DOUBLE) AS maen FROM " +
        "(SELECT d, y, lag(y) OVER (ORDER BY d) AS l1 FROM tr)), " +
        "lw AS (SELECT isodow(d) AS dow, y AS ysn FROM tr CROSS JOIN c " +
        "WHERE d > cut - 7), " +
        "sc AS (SELECT te.y AS y, ts.lasty, lw.ysn, ts.maen FROM te " +
        "LEFT JOIN lw ON isodow(te.d) = lw.dow CROSS JOIN ts) " +
        "SELECT count(*) AS n_test, " +
        "round(CAST(SUM(CAST(round(abs(y - lasty), 9) + 0.0 AS DECIMAL(38,9))) " +
        "AS DOUBLE) / CAST(count(lasty) AS DOUBLE), 6) + 0.0 AS mae_naive, " +
        "round(sqrt(CAST(SUM(CAST(round((y - lasty) * (y - lasty), 9) + 0.0 " +
        "AS DECIMAL(38,9))) AS DOUBLE) / CAST(count(lasty) AS DOUBLE)), 6) " +
        "+ 0.0 AS rmse_naive, " +
        "round(CAST(SUM(CAST(round(2.0 * abs(y - lasty) / " +
        "(abs(y) + abs(lasty)), 9) + 0.0 AS DECIMAL(38,9))) AS DOUBLE) / " +
        "CAST(count(lasty) AS DOUBLE), 6) + 0.0 AS smape_naive, " +
        "CASE WHEN max(maen) > 0.0 THEN " +
        "round((CAST(SUM(CAST(round(abs(y - lasty), 9) + 0.0 " +
        "AS DECIMAL(38,9))) AS DOUBLE) / CAST(count(lasty) AS DOUBLE)) / " +
        "max(maen), 6) + 0.0 END AS mase_naive, " +
        "round(CAST(SUM(CAST(round(abs(y - ysn), 9) + 0.0 AS DECIMAL(38,9))) " +
        "AS DOUBLE) / CAST(count(ysn) AS DOUBLE), 6) + 0.0 AS mae_snaive, " +
        "round(sqrt(CAST(SUM(CAST(round((y - ysn) * (y - ysn), 9) + 0.0 " +
        "AS DECIMAL(38,9))) AS DOUBLE) / CAST(count(ysn) AS DOUBLE)), 6) " +
        "+ 0.0 AS rmse_snaive, " +
        "round(CAST(SUM(CAST(round(2.0 * abs(y - ysn) / " +
        "(abs(y) + abs(ysn)), 9) + 0.0 AS DECIMAL(38,9))) AS DOUBLE) / " +
        "CAST(count(ysn) AS DOUBLE), 6) + 0.0 AS smape_snaive, " +
        "CASE WHEN max(maen) > 0.0 THEN " +
        "round((CAST(SUM(CAST(round(abs(y - ysn), 9) + 0.0 " +
        "AS DECIMAL(38,9))) AS DOUBLE) / CAST(count(ysn) AS DOUBLE)) / " +
        "max(maen), 6) + 0.0 END AS mase_snaive FROM sc"),

    "q_gmm_doclen" -> gmmOracle,

    "q_gmm_diag_kernel" -> gmmDiagKernelOracle,

    "q_logistic_quality" -> logisticQualityOracle,

    "q_logistic_diag_kernel" -> logisticDiagKernelOracle,

    "q_quality_scores" -> qualityScoresOracle,

    "q_info_gain" -> infoGainOracle,

    // isodow shares Spark's weekday()+1 numbering (1 = Monday).
    "q_seasonal_index" ->
      ("WITH s AS (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS y " +
        "FROM orders GROUP BY 1), " +
        "dw AS (SELECT CAST(isodow(d) AS BIGINT) AS dow, count(*) AS n_days, " +
        "SUM(CAST(y AS DECIMAL(28,8))) AS sy FROM s GROUP BY 1), " +
        "o AS (SELECT CAST(SUM(CAST(y AS DECIMAL(28,8))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE) AS avg FROM s) " +
        "SELECT dow, n_days, " +
        "round(CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE), 6) AS avg_count, " +
        "round((CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE)) / avg, 6) " +
        "AS seasonal_index FROM dw CROSS JOIN o ORDER BY dow"),

    // Shares from exact DECIMAL per-entity totals; CR4 via ranked top-4.
    "q_hhi" ->
      ("WITH j AS (SELECT c_nationkey AS grp, o_custkey AS e, o_totalprice AS v " +
        "FROM orders JOIN customer ON o_custkey = c_custkey), " +
        "per AS (SELECT grp, e, SUM(CAST(v AS DECIMAL(18,2))) AS v FROM j GROUP BY 1, 2), " +
        "tot AS (SELECT grp, SUM(v) AS tot, count(*) AS n_entities FROM per GROUP BY 1), " +
        "t4 AS (SELECT grp, SUM(v) AS top4 FROM (SELECT grp, v, " +
        "row_number() OVER (PARTITION BY grp ORDER BY v DESC, e) AS rn FROM per) " +
        "WHERE rn <= 4 GROUP BY 1), " +
        "sh AS (SELECT p.grp, SUM(CAST((CAST(p.v AS DOUBLE) / CAST(t.tot AS DOUBLE)) * " +
        "(CAST(p.v AS DOUBLE) / CAST(t.tot AS DOUBLE)) AS DECIMAL(28,10))) AS hhi " +
        "FROM per p JOIN tot t ON p.grp = t.grp GROUP BY 1) " +
        "SELECT t.grp, t.n_entities, " +
        "round(CAST(s.hhi AS DOUBLE) * 10000.0, 6) AS hhi, " +
        "round(CAST(f.top4 AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS cr4 " +
        "FROM tot t JOIN sh s ON t.grp = s.grp JOIN t4 f ON t.grp = f.grp " +
        "ORDER BY t.grp"),

    // Directed pair counts over distinct order baskets; rule metrics on
    // the aggregated pair table.
    "q_assoc_rules" ->
      ("WITH items AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem), " +
        "nb AS (SELECT count(DISTINCT bk) AS n FROM items), " +
        "pi AS (SELECT it, count(*) AS cin FROM items GROUP BY 1), " +
        "pr AS (SELECT a.it AS antecedent, b.it AS consequent, count(*) AS pair_n " +
        "FROM items a JOIN items b ON a.bk = b.bk AND a.it <> b.it " +
        "GROUP BY 1, 2 HAVING count(*) >= 2) " +
        "SELECT antecedent, consequent, pair_n, " +
        "round(CAST(pair_n AS DOUBLE) / CAST(n AS DOUBLE), 6) AS support, " +
        "round(CAST(pair_n AS DOUBLE) / CAST(na.cin AS DOUBLE), 6) AS confidence, " +
        "round((CAST(pair_n AS DOUBLE) / CAST(n AS DOUBLE)) / " +
        "((CAST(na.cin AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "(CAST(nc.cin AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS lift, " +
        "round(CAST(pair_n AS DOUBLE) / CAST(n AS DOUBLE) - " +
        "(CAST(na.cin AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "(CAST(nc.cin AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS leverage " +
        "FROM pr JOIN pi na ON antecedent = na.it " +
        "JOIN pi nc ON consequent = nc.it CROSS JOIN nb " +
        "ORDER BY confidence DESC, pair_n DESC, antecedent, consequent LIMIT 50"),

    "q_kcore" -> kcoreOracle(2, 8),

    // Word/sentence/vowel-group regexp counts per doc, per-source means
    // of 6-dp-rounded per-doc scores.
    "q_readability" ->
      ("WITH d AS (SELECT source AS grp, " +
        "len(regexp_extract_all(text, '[A-Za-z]+')) AS w, " +
        "greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s, " +
        "len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y " +
        "FROM documents WHERE text IS NOT NULL), " +
        "f AS (SELECT grp, w, s, y, round(206.835 - " +
        "1.015 * CAST(w AS DOUBLE) / CAST(s AS DOUBLE) - " +
        "84.6 * CAST(y AS DOUBLE) / CAST(w AS DOUBLE), 6) AS fl FROM d WHERE w > 0) " +
        "SELECT grp, count(*) AS n_docs, " +
        "round(CAST(SUM(CAST(w AS DECIMAL(28,8))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) AS avg_words, " +
        "round(CAST(SUM(CAST(CAST(y AS DOUBLE) / CAST(w AS DOUBLE) " +
        "AS DECIMAL(28,10))) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) " +
        "AS avg_syll_per_word, " +
        "round(CAST(SUM(CAST(fl AS DECIMAL(28,10))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) AS avg_flesch, " +
        "CAST(SUM(CASE WHEN fl < 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_difficult " +
        "FROM f GROUP BY 1 ORDER BY 1"),

    // Character-class counts per doc at the scan, ratio-of-sums per source.
    "q_charset_profile" ->
      ("WITH d AS (SELECT source AS grp, length(text) AS nc, " +
        "len(regexp_extract_all(text, '[A-Za-z]')) AS l, " +
        "len(regexp_extract_all(text, '[0-9]')) AS dg, " +
        "len(regexp_extract_all(text, '[ \\t\\n\\x0B\\f\\r]')) AS w, " +
        "len(regexp_extract_all(text, '[^\\x00-\\x7F]')) AS na, " +
        "CASE WHEN contains(text, chr(65533)) THEN 1 ELSE 0 END AS repl, " +
        "CASE WHEN len(regexp_extract_all(text, " +
        "'[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]')) > 0 THEN 1 ELSE 0 END AS ctrl " +
        "FROM documents WHERE text IS NOT NULL AND length(text) > 0) " +
        "SELECT grp, count(*) AS n_docs, CAST(SUM(nc) AS BIGINT) AS n_chars, " +
        "round(CAST(SUM(CAST(l AS DECIMAL(28,8))) AS DOUBLE) / " +
        "CAST(SUM(CAST(nc AS DECIMAL(28,8))) AS DOUBLE), 6) AS letter_ratio, " +
        "round(CAST(SUM(CAST(dg AS DECIMAL(28,8))) AS DOUBLE) / " +
        "CAST(SUM(CAST(nc AS DECIMAL(28,8))) AS DOUBLE), 6) AS digit_ratio, " +
        "round(CAST(SUM(CAST(w AS DECIMAL(28,8))) AS DOUBLE) / " +
        "CAST(SUM(CAST(nc AS DECIMAL(28,8))) AS DOUBLE), 6) AS space_ratio, " +
        "round(CAST(SUM(CAST(na AS DECIMAL(28,8))) AS DOUBLE) / " +
        "CAST(SUM(CAST(nc AS DECIMAL(28,8))) AS DOUBLE), 6) AS non_ascii_ratio, " +
        "CAST(SUM(repl) AS BIGINT) AS n_replacement_docs, " +
        "CAST(SUM(ctrl) AS BIGINT) AS n_control_docs " +
        "FROM d GROUP BY 1 ORDER BY 1"),

    "q_kcore_weighted" -> kcoreWeightedOracle(1.0, 8),

    "q_communities" -> labelPropagationOracle(4),

    "q_edge_support" ->
      (s"WITH $mhPairsCtes, $edgeSupportCtes " +
        "SELECT e.a, e.b, CAST(coalesce(ts.s, 0) AS BIGINT) AS support " +
        "FROM e LEFT JOIN ts ON e.a = ts.a AND e.b = ts.b ORDER BY 1, 2"),

    "q_ktruss" -> ktrussOracle(3, 4),

    "q_ppr_trust" -> pprOracle(Seq("t:purchase"), 3),

    // Poisson-bootstrap mirror: same md5 draw (id:rep#0), same CDF
    // literals, same DECIMAL sums and rank picks (reps=100 → ranks 3/98).
    "q_bootstrap_ci" ->
      ("WITH b AS (SELECT CAST(o_orderkey AS VARCHAR) AS id, " +
        "CAST(o_totalprice AS DOUBLE) AS x FROM orders " +
        "WHERE o_totalprice IS NOT NULL), " +
        "r AS (SELECT id, x, unnest(range(100)) AS rep FROM b), " +
        "u AS (SELECT rep, x, ('0x' || substr(md5(id || ':' || " +
        "CAST(rep AS VARCHAR) || '#0'), 1, 8))::BIGINT / 4294967296.0 " +
        "AS uu FROM r), " +
        "w AS (SELECT rep, x, CASE " +
        "WHEN uu < 0.36787944117144233 THEN 0 " +
        "WHEN uu < 0.7357588823428847 THEN 1 " +
        "WHEN uu < 0.9196986029286058 THEN 2 " +
        "WHEN uu < 0.9810118431238463 THEN 3 " +
        "WHEN uu < 0.9963401531726563 THEN 4 " +
        "WHEN uu < 0.9994058151824183 THEN 5 ELSE 6 END AS w FROM u), " +
        "m AS (SELECT rep, round(CAST(SUM(CAST(w * x AS DECIMAL(38,10))) " +
        "AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 9) AS m FROM w " +
        "GROUP BY rep HAVING SUM(w) > 0), " +
        "rk AS (SELECT m, row_number() OVER (ORDER BY m, rep) AS rk FROM m), " +
        "ov AS (SELECT count(*) AS n, " +
        "round(CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) AS mean FROM b) " +
        "SELECT ov.n, ov.mean, " +
        "(SELECT round(m, 6) FROM rk WHERE rk = 3) AS ci_lo, " +
        "(SELECT round(m, 6) FROM rk WHERE rk = 98) AS ci_hi FROM ov"),

    "q_group_mode" ->
      ("WITH c AS (SELECT source, lang AS mode_value, count(*) AS mode_count " +
        "FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY source " +
        "ORDER BY mode_count DESC, mode_value) AS rn FROM c) " +
        "SELECT source, mode_value, mode_count FROM r WHERE rn = 1 " +
        "ORDER BY source"),

    "q_weighted_median" ->
      ("WITH g AS (SELECT l_returnflag, l_extendedprice AS v, " +
        "SUM(CAST(l_quantity AS DECIMAL(28,8))) AS w FROM lineitem " +
        "WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL " +
        "GROUP BY 1, 2), " +
        "c AS (SELECT l_returnflag, v, SUM(w) OVER (PARTITION BY l_returnflag " +
        "ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw, " +
        "SUM(w) OVER (PARTITION BY l_returnflag) AS tw FROM g) " +
        "SELECT l_returnflag, min(v) AS weighted_median FROM c " +
        "WHERE cw * 2 >= tw GROUP BY 1 ORDER BY 1"),

    // isodow shares Spark's weekday()+1 numbering; trend is 6-dp-pinned
    // before detrending on both sides so the subtraction is identical.
    "q_stl_decompose" ->
      ("WITH s AS MATERIALIZED (SELECT CAST(o_orderdate AS DATE) AS d, " +
        "CAST(count(*) AS DOUBLE) AS y FROM orders GROUP BY 1), " +
        "t AS MATERIALIZED (SELECT d, y, count(*) OVER w AS n, " +
        "round(CAST(SUM(CAST(y AS DECIMAL(28,8))) OVER w AS DOUBLE) / " +
        "CAST(count(*) OVER w AS DOUBLE), 6) AS trend FROM s " +
        "WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)), " +
        "f AS MATERIALIZED (SELECT d, y, trend, y - trend AS detr, " +
        "CAST(isodow(d) AS BIGINT) AS dow FROM t WHERE n = 7), " +
        "dm AS (SELECT dow, CAST(SUM(CAST(detr AS DECIMAL(28,8))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE) AS sm FROM f GROUP BY 1), " +
        "cc AS (SELECT CAST(SUM(CAST(sm AS DECIMAL(28,8))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE) AS c FROM dm), " +
        "se AS (SELECT dow, round(sm - c, 6) AS seasonal FROM dm CROSS JOIN cc) " +
        "SELECT f.d, f.y, f.trend, se.seasonal, " +
        "round(f.y - f.trend - se.seasonal, 6) AS remainder " +
        "FROM f JOIN se USING (dow) ORDER BY f.d"),

    "q_sax_symbols" ->
      ("WITH s AS MATERIALIZED (SELECT CAST(o_orderdate AS DATE) AS d, " +
        "CAST(count(*) AS DOUBLE) AS y FROM orders GROUP BY 1), " +
        "m AS (SELECT CAST(count(*) AS DOUBLE) AS n, " +
        "SUM(CAST(y AS DECIMAL(28,8))) AS s1, " +
        "SUM(CAST(y * y AS DECIMAL(28,8))) AS s2 FROM s), " +
        "z AS (SELECT d, round((y - CAST(s1 AS DOUBLE) / n) / " +
        "sqrt(CAST(s2 AS DOUBLE) / n - " +
        "(CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)), 6) AS z, " +
        "row_number() OVER (ORDER BY d) AS rn FROM s CROSS JOIN m) " +
        "SELECT CAST(floor((rn - 1) / 7) AS BIGINT) AS frame, " +
        "count(*) AS n_days, " +
        "round(CAST(SUM(CAST(z AS DECIMAL(28,8))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) AS paa, " +
        "CASE WHEN round(CAST(SUM(CAST(z AS DECIMAL(28,8))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) < -0.6745 THEN 'a' " +
        "WHEN round(CAST(SUM(CAST(z AS DECIMAL(28,8))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) < 0.0 THEN 'b' " +
        "WHEN round(CAST(SUM(CAST(z AS DECIMAL(28,8))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) < 0.6745 THEN 'c' ELSE 'd' END AS symbol " +
        "FROM z GROUP BY 1 ORDER BY 1"),

    "q_follows_pairs" ->
      ("WITH f AS (SELECT user_id, event_type AS t, min(ts) AS ts " +
        "FROM events GROUP BY 1, 2), " +
        "n AS (SELECT count(DISTINCT user_id) AS n FROM events), " +
        "p AS (SELECT fa.t AS a, fb.t AS b FROM f fa " +
        "JOIN f fb ON fa.user_id = fb.user_id AND fa.ts < fb.ts) " +
        "SELECT a, b, count(*) AS support, " +
        "round(CAST(count(*) AS DOUBLE) / CAST(n.n AS DOUBLE), 6) " +
        "AS support_ratio FROM p CROSS JOIN n GROUP BY a, b, n.n " +
        "ORDER BY support DESC, a, b"),

    "q_harmonic" -> harmonicOracle,

    "q_hll_distinct" -> hllOracle,

    "q_hll_rollup" -> hllRollupOracle,

    "q_rolling_distinct" ->
      ("WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id AS u " +
        "FROM events WHERE user_id IS NOT NULL), " +
        "days AS (SELECT DISTINCT d AS window_end FROM du) " +
        "SELECT e.window_end, count(DISTINCT du.u) AS active_7d " +
        "FROM days e JOIN du ON du.d <= e.window_end " +
        "AND du.d > e.window_end - 7 GROUP BY 1 ORDER BY 1"),

    // Same sessionize CTE as q_sessionize_batch (30-min gap, event_id
    // tie), then the +1/−1 sweep; the RANGE frame nets same-instant
    // transitions on both engines.
    "q_concurrency" ->
      ("WITH x AS (SELECT user_id, ts, event_id, " +
        "CASE WHEN lag(ts) OVER w IS NULL " +
        "OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1 ELSE 0 END AS brk " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "y AS (SELECT user_id, ts, CAST(sum(brk) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq " +
        "FROM x), " +
        "ss AS (SELECT user_id, session_seq, min(ts) AS s, max(ts) AS e " +
        "FROM y GROUP BY 1, 2), " +
        "dl AS (SELECT s AS t, CAST(1 AS BIGINT) AS delta FROM ss " +
        "UNION ALL SELECT e AS t, CAST(-1 AS BIGINT) AS delta FROM ss), " +
        "r AS (SELECT t, CAST(sum(delta) OVER (ORDER BY t " +
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run " +
        "FROM dl) " +
        "SELECT CAST(t AS DATE) AS d, max(run) AS peak_concurrent " +
        "FROM r GROUP BY 1 ORDER BY 1"),

    // q_bigram_logprob's CTEs with the JM mix; every arithmetic term is
    // CAST to DOUBLE before the mix so neither engine does DECIMAL
    // division.
    "q_interp_logprob" ->
      ("WITH a AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)), " +
        "i -> toks[i] || ' ' || toks[i+1])) AS big FROM a WHERE len(toks) >= 2), " +
        "bp AS (SELECT doc_id, string_split(big, ' ')[1] AS prev, " +
        "string_split(big, ' ')[2] AS w, big FROM bg), " +
        "cb AS (SELECT big, count(*) AS cb FROM bp GROUP BY 1), " +
        "cu AS (SELECT t, count(*) AS cu FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS t FROM documents) GROUP BY 1), " +
        "nn AS (SELECT CAST(sum(cu) AS BIGINT) AS n FROM cu) " +
        "SELECT bp.doc_id, round(CAST(sum(CAST(round(ln(" +
        "CAST(0.7 AS DOUBLE) * CAST(cb.cb AS DOUBLE) / CAST(cp.cu AS DOUBLE) + " +
        "(CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * CAST(cw.cu AS DOUBLE) / " +
        "CAST(nn.n AS DOUBLE)), 9) AS DECIMAL(28,14))) AS DOUBLE) / count(*), 6) " +
        "AS logprob FROM bp JOIN cb USING (big) " +
        "JOIN cu cp ON cp.t = bp.prev JOIN cu cw ON cw.t = bp.w " +
        "CROSS JOIN nn GROUP BY 1 ORDER BY 1"),

    // Mirrors TextAnalysis.kneserNeyLogProb (D=0.75): bigram-prefix
    // denominators, distinct-type continuation counts, DECIMAL sums.
    "q_kneser_ney" ->
      ("WITH a AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)), " +
        "i -> toks[i] || ' ' || toks[i+1])) AS big FROM a WHERE len(toks) >= 2), " +
        "bp AS (SELECT doc_id, string_split(big, ' ')[1] AS prev, " +
        "string_split(big, ' ')[2] AS w, big FROM bg), " +
        "cb AS (SELECT big, count(*) AS cb FROM bp GROUP BY 1), " +
        "cp AS (SELECT prev, count(*) AS cp FROM bp GROUP BY 1), " +
        "ty AS (SELECT DISTINCT big, prev, w FROM bp), " +
        "np AS (SELECT prev, count(*) AS n1p_prev FROM ty GROUP BY 1), " +
        "nw AS (SELECT w, count(*) AS n1p_w FROM ty GROUP BY 1), " +
        "nt AS (SELECT count(*) AS n1p_tot FROM ty) " +
        "SELECT bp.doc_id, round(CAST(sum(CAST(round(ln(" +
        "(CAST(cb.cb AS DOUBLE) - 0.75) / CAST(cp.cp AS DOUBLE) + " +
        "(0.75 * CAST(np.n1p_prev AS DOUBLE) / CAST(cp.cp AS DOUBLE)) * " +
        "(CAST(nw.n1p_w AS DOUBLE) / CAST(nt.n1p_tot AS DOUBLE))" +
        "), 9) AS DECIMAL(28,14))) AS DOUBLE) / count(*), 6) " +
        "AS logprob FROM bp JOIN cb USING (big) JOIN cp USING (prev) " +
        "JOIN np USING (prev) JOIN nw USING (w) " +
        "CROSS JOIN nt GROUP BY 1 ORDER BY 1"),

    "q_pr_curve" ->
      ("WITH b AS (SELECT round(value, 1) AS thr, " +
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y " +
        "FROM events WHERE value IS NOT NULL), " +
        "pt AS (SELECT thr, CAST(SUM(y) AS BIGINT) AS np, count(*) AS n " +
        "FROM b GROUP BY 1), " +
        "tot AS (SELECT CAST(SUM(np) AS BIGINT) AS p FROM pt), " +
        "c AS (SELECT thr, CAST(SUM(np) OVER w AS BIGINT) AS tp, " +
        "CAST(SUM(n) OVER w AS BIGINT) AS npred FROM pt " +
        "WINDOW w AS (ORDER BY thr DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
        "SELECT thr, round(CAST(tp AS DOUBLE) / CAST(npred AS DOUBLE), 6) " +
        "AS \"precision\", round(CASE WHEN p > 0 THEN " +
        "CAST(tp AS DOUBLE) / CAST(p AS DOUBLE) END, 6) AS recall " +
        "FROM c CROSS JOIN tot ORDER BY thr DESC"),

    "q_robust_zscore" ->
      ("WITH b AS (SELECT event_type, CAST(value AS DOUBLE) AS v " +
        "FROM events WHERE value IS NOT NULL), " +
        "m AS (SELECT event_type, quantile_cont(v, 0.5) AS med " +
        "FROM b GROUP BY 1), " +
        "d AS (SELECT b.event_type, b.v, m.med FROM b JOIN m USING (event_type)), " +
        "md AS (SELECT event_type, quantile_cont(abs(v - med), 0.5) AS mad " +
        "FROM d GROUP BY 1), " +
        "j AS (SELECT d.event_type, d.v, d.med, md.mad FROM d " +
        "JOIN md USING (event_type)) " +
        "SELECT event_type, count(*) AS n, round(min(med), 6) AS median, " +
        "round(min(mad), 6) AS mad, " +
        "CAST(SUM(CASE WHEN mad > 0 AND " +
        "abs(CAST(0.6745 AS DOUBLE) * (v - med) / mad) > 3.5 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers " +
        "FROM j GROUP BY 1 ORDER BY 1"),

    "q_stl_anomaly" -> stlAnomalyOracle,

    "q_link_predict" -> adamicAdarOracle,

    "q_dedup_keep_best" -> keepBestOracle,

    "q_did" ->
      ("WITH b AS (SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t, " +
        "CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS p, " +
        "CAST(value AS DOUBLE) AS v FROM events WHERE value IS NOT NULL), " +
        "a AS (SELECT " +
        "SUM(CASE WHEN t = 1 AND p = 0 THEN CAST(v AS DECIMAL(28,8)) END) AS s_tpre, " +
        "SUM(CASE WHEN t = 1 AND p = 0 THEN 1 ELSE 0 END) AS n_tpre, " +
        "SUM(CASE WHEN t = 1 AND p = 1 THEN CAST(v AS DECIMAL(28,8)) END) AS s_tpost, " +
        "SUM(CASE WHEN t = 1 AND p = 1 THEN 1 ELSE 0 END) AS n_tpost, " +
        "SUM(CASE WHEN t = 0 AND p = 0 THEN CAST(v AS DECIMAL(28,8)) END) AS s_cpre, " +
        "SUM(CASE WHEN t = 0 AND p = 0 THEN 1 ELSE 0 END) AS n_cpre, " +
        "SUM(CASE WHEN t = 0 AND p = 1 THEN CAST(v AS DECIMAL(28,8)) END) AS s_cpost, " +
        "SUM(CASE WHEN t = 0 AND p = 1 THEN 1 ELSE 0 END) AS n_cpost FROM b) " +
        "SELECT " +
        "round(CASE WHEN n_tpre > 0 THEN CAST(s_tpre AS DOUBLE) / CAST(n_tpre AS DOUBLE) END, 6) AS treated_pre, " +
        "round(CASE WHEN n_tpost > 0 THEN CAST(s_tpost AS DOUBLE) / CAST(n_tpost AS DOUBLE) END, 6) AS treated_post, " +
        "round(CASE WHEN n_cpre > 0 THEN CAST(s_cpre AS DOUBLE) / CAST(n_cpre AS DOUBLE) END, 6) AS control_pre, " +
        "round(CASE WHEN n_cpost > 0 THEN CAST(s_cpost AS DOUBLE) / CAST(n_cpost AS DOUBLE) END, 6) AS control_post, " +
        "round((CAST(s_tpost AS DOUBLE) / CAST(n_tpost AS DOUBLE) - " +
        "CAST(s_tpre AS DOUBLE) / CAST(n_tpre AS DOUBLE)) - " +
        "(CAST(s_cpost AS DOUBLE) / CAST(n_cpost AS DOUBLE) - " +
        "CAST(s_cpre AS DOUBLE) / CAST(n_cpre AS DOUBLE)), 6) AS did FROM a"),

    "q_cuped" -> cupedOracle,

    "q_modularity" -> modularityOracle(4),

    "q_assortativity" -> assortativityOracle,

    "q_item_cf" ->
      ("WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it " +
        "FROM lineitem), " +
        "pi AS (SELECT it, count(*) AS n FROM b GROUP BY 1), " +
        "p AS (SELECT a.it AS i1, b2.it AS i2, count(*) AS cooc FROM b a " +
        "JOIN b b2 ON a.bk = b2.bk AND a.it < b2.it GROUP BY 1, 2 " +
        "HAVING count(*) >= 2), " +
        "dd AS (SELECT i1 AS item, i2 AS recommended, cooc FROM p " +
        "UNION ALL SELECT i2, i1, cooc FROM p), " +
        "sc AS (SELECT dd.item, dd.recommended, dd.cooc, " +
        "round(CAST(dd.cooc AS DOUBLE) / " +
        "sqrt(CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE)), 6) AS score " +
        "FROM dd JOIN pi na ON na.it = dd.item " +
        "JOIN pi nb ON nb.it = dd.recommended) " +
        "SELECT item, recommended, cooc, score, CAST(rn AS BIGINT) AS rn " +
        "FROM (SELECT *, row_number() OVER (PARTITION BY item " +
        "ORDER BY score DESC, recommended) AS rn FROM sc) " +
        "WHERE rn <= 5 ORDER BY item, rn"),

    "q_vocab_coverage" ->
      ("WITH a AS (SELECT string_split(text, ' ') AS toks FROM documents), " +
        "bg AS (SELECT unnest(list_transform(range(1, len(toks)), " +
        "i -> toks[i] || ' ' || toks[i+1])) AS tok FROM a WHERE len(toks) >= 2), " +
        "c AS (SELECT tok, count(*) AS c FROM bg GROUP BY 1), " +
        "tt AS (SELECT CAST(SUM(c) AS BIGINT) AS tot FROM c), " +
        "r AS (SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok) AS rank, " +
        "SUM(c) OVER (ORDER BY c DESC, tok " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM c) " +
        "SELECT CAST(rank AS BIGINT) AS vocab_size, " +
        "CAST(cum AS BIGINT) AS occurrences_covered, " +
        "round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS coverage " +
        "FROM r CROSS JOIN tt WHERE rank IN (50, 100, 250, 500, 750, 900) " +
        "ORDER BY 1"),

    // z and its square CAST to DOUBLE before any arithmetic — DuckDB's
    // DECIMAL literal product (3.8416 exact) is NOT the IEEE product
    // the engine computes.
    "q_wilson_rank" ->
      ("WITH c AS (SELECT l_partkey, count(*) AS n, " +
        "CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS successes FROM lineitem GROUP BY 1 HAVING count(*) >= 20), " +
        "s AS (SELECT l_partkey, n, successes, " +
        "CAST(successes AS DOUBLE) / CAST(n AS DOUBLE) AS p, " +
        "CAST(n AS DOUBLE) AS nd, " +
        "CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) AS z2 FROM c) " +
        "SELECT l_partkey, n, successes, round(p, 6) AS rate, " +
        "round((p + z2 / (2.0 * nd) - CAST(1.96 AS DOUBLE) * " +
        "sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd))) / " +
        "(1.0 + z2 / nd), 6) AS wilson_lb " +
        "FROM s ORDER BY wilson_lb DESC, l_partkey LIMIT 20"),

    "q_lateness_profile" ->
      ("WITH l AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, " +
        "max(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax " +
        "FROM events), " +
        "f AS (SELECT greatest(CAST(0 AS BIGINT), prevmax - ms) AS late " +
        "FROM l WHERE prevmax IS NOT NULL) " +
        "SELECT count(*) AS n_events, " +
        "CAST(SUM(CASE WHEN late > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late, " +
        "max(late) AS max_lateness_ms, " +
        "round(quantile_cont(late, 0.5), 3) AS p50_lateness_ms, " +
        "round(quantile_cont(late, 0.95), 3) AS p95_lateness_ms, " +
        "round(quantile_cont(late, 0.99), 3) AS p99_lateness_ms FROM f"),

    "q_interval_union" ->
      ("WITH b AS (SELECT DISTINCT l_suppkey AS k, epoch_ms(l_shipdate) AS s, " +
        "epoch_ms(l_shipdate) + 604800000 AS e FROM lineitem " +
        "WHERE l_shipdate IS NOT NULL), " +
        "g AS (SELECT k, s, e, max(e) OVER (PARTITION BY k ORDER BY s, e " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM b), " +
        "f AS (SELECT k, s, e, CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END " +
        "AS nw FROM g), " +
        "h AS (SELECT k, s, e, CAST(SUM(nw) OVER (PARTITION BY k " +
        "ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS BIGINT) AS grp FROM f), " +
        "m AS (SELECT k, grp, min(s) AS gs, max(e) AS ge FROM h GROUP BY 1, 2) " +
        "SELECT k AS l_suppkey, count(*) AS n_merged, " +
        "CAST(SUM(ge - gs) AS BIGINT) AS covered_ms FROM m " +
        "GROUP BY 1 ORDER BY 1"),

    "q_growth_accounting" ->
      ("WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id AS u " +
        "FROM events WHERE user_id IS NOT NULL), " +
        "fs AS (SELECT u, min(d) AS fd FROM du GROUP BY 1), " +
        "p AS (SELECT d + 1 AS d, u, 1 AS was FROM du), " +
        "t AS (SELECT du.d, count(*) AS dau, " +
        "CAST(SUM(CASE WHEN fs.fd = du.d THEN 1 ELSE 0 END) AS BIGINT) AS n_new, " +
        "CAST(SUM(CASE WHEN p.was = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained, " +
        "CAST(SUM(CASE WHEN fs.fd < du.d AND p.was IS NULL THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_resurrected FROM du " +
        "JOIN fs ON fs.u = du.u " +
        "LEFT JOIN p ON p.d = du.d AND p.u = du.u GROUP BY 1), " +
        "c AS (SELECT y.d + 1 AS d, count(*) AS n_churned FROM du y " +
        "WHERE NOT EXISTS (SELECT 1 FROM du t2 WHERE t2.u = y.u " +
        "AND t2.d = y.d + 1) GROUP BY 1) " +
        "SELECT t.d, t.dau, t.n_new, t.n_retained, t.n_resurrected, " +
        "COALESCE(c.n_churned, 0) AS n_churned FROM t " +
        "LEFT JOIN c USING (d) ORDER BY t.d"),

    "q_order_consistency" ->
      ("WITH f AS (SELECT user_id, event_type AS t, min(ts) AS ts " +
        "FROM events GROUP BY 1, 2), " +
        "p AS (SELECT least(fa.t, fb.t) AS x, greatest(fa.t, fb.t) AS y, " +
        "CASE WHEN fa.t < fb.t THEN 1 ELSE 0 END AS fwd FROM f fa " +
        "JOIN f fb ON fa.user_id = fb.user_id AND fa.ts < fb.ts), " +
        "g AS (SELECT x, y, CAST(SUM(fwd) AS BIGINT) AS n_xy, " +
        "CAST(count(*) - SUM(fwd) AS BIGINT) AS n_yx FROM p GROUP BY 1, 2) " +
        "SELECT x, y, n_xy, n_yx, " +
        "round(CAST(greatest(n_xy, n_yx) AS DOUBLE) / " +
        "CAST(n_xy + n_yx AS DOUBLE), 6) AS consistency FROM g " +
        "ORDER BY n_xy + n_yx DESC, x, y"),

    "q_burstiness" ->
      ("WITH g AS (SELECT event_type, CAST(epoch_ms(ts) - " +
        "epoch_ms(lag(ts) OVER (PARTITION BY event_type, CAST(ts AS DATE) " +
        "ORDER BY ts, event_id)) AS DOUBLE) AS gp FROM events), " +
        "a AS (SELECT event_type, count(*) AS n_gaps, " +
        "SUM(CAST(gp AS DECIMAL(28,8))) AS s, " +
        "SUM(CAST(gp * gp AS DECIMAL(28,8))) AS s2 FROM g " +
        "WHERE gp IS NOT NULL GROUP BY 1), " +
        "m AS (SELECT event_type, n_gaps, " +
        "CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mu, " +
        "sqrt(CAST(s2 AS DOUBLE) / CAST(n_gaps AS DOUBLE) - " +
        "(CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)) * " +
        "(CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))) AS sd FROM a) " +
        "SELECT event_type, n_gaps, round(mu, 3) AS mean_gap_ms, " +
        "round(sd, 3) AS sd_gap_ms, " +
        "round((sd - mu) / (sd + mu), 6) AS burstiness FROM m ORDER BY 1"),

    "q_user_features" ->
      ("WITH h AS (SELECT max(CAST(ts AS DATE)) AS hd FROM events), " +
        "g AS (SELECT user_id, count(*) AS n_events, " +
        "count(DISTINCT CAST(ts AS DATE)) AS n_active_days, " +
        "min(CAST(ts AS DATE)) AS fd, max(CAST(ts AS DATE)) AS ld, " +
        "SUM(CAST(value AS DECIMAL(28,8))) AS sv, " +
        "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_purchases FROM events " +
        "WHERE user_id IS NOT NULL GROUP BY 1) " +
        "SELECT user_id, n_events, n_active_days, " +
        "CAST(ld - fd AS BIGINT) AS tenure_days, " +
        "CAST(h.hd - ld AS BIGINT) AS recency_days, " +
        "round(CAST(sv AS DOUBLE) / CAST(n_events AS DOUBLE), 6) AS avg_value, " +
        "n_purchases, " +
        "round(CAST(n_purchases AS DOUBLE) / CAST(n_events AS DOUBLE), 6) " +
        "AS purchase_share FROM g CROSS JOIN h ORDER BY user_id"),

    "q_lexical_richness" ->
      ("WITH c AS (SELECT source, t, count(*) AS c FROM " +
        "(SELECT source, unnest(string_split(text, ' ')) AS t FROM documents) " +
        "WHERE t <> '' GROUP BY 1, 2), " +
        "g AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens, " +
        "count(*) AS n_types, " +
        "CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax " +
        "FROM c GROUP BY 1) " +
        "SELECT source, n_tokens, n_types, " +
        "round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) " +
        "AS type_token_ratio, " +
        "round(CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE), 6) " +
        "AS hapax_share FROM g ORDER BY 1"),

    // Same (source, token) count collapse as q_lexical_richness; f^2
    // pre-widened through DECIMAL(19,0) so the product sums exactly in
    // DECIMAL(38,0); yule_k readout signed-zero-safe.
    "q_repeat_rate" ->
      ("WITH c AS (SELECT source, t, count(*) AS c FROM " +
        "(SELECT source, unnest(string_split(text, ' ')) AS t FROM documents) " +
        "WHERE t <> '' GROUP BY 1, 2), " +
        "g AS (SELECT source, count(*) AS n_types, " +
        "CAST(SUM(c) AS BIGINT) AS n_tokens, " +
        "SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS s2 " +
        "FROM c GROUP BY 1) " +
        "SELECT source, n_tokens, n_types, " +
        "round(1.0e4 * (CAST(s2 AS DOUBLE) - CAST(n_tokens AS DOUBLE)) / " +
        "(CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 6) + 0.0 AS yule_k, " +
        "CASE WHEN n_tokens > 1 THEN " +
        "round((CAST(s2 AS DOUBLE) - CAST(n_tokens AS DOUBLE)) / " +
        "(CAST(n_tokens AS DOUBLE) * (CAST(n_tokens AS DOUBLE) - 1.0)), 6) " +
        "END AS simpson_d FROM g ORDER BY source"),

    // Same row-local bigram construction as q_collocations (space join
    // is unambiguous: tokens cannot contain the separator); LEFT JOIN
    // mirrors the no-bigram-group NULL columns.
    "q_ngram_diversity" ->
      ("WITH toks AS (SELECT source, string_split(text, ' ') AS tk " +
        "FROM documents), " +
        "u AS (SELECT source, CAST(count(*) AS BIGINT) AS n_unigrams, " +
        "CAST(count(DISTINCT t) AS BIGINT) AS d_unigrams FROM " +
        "(SELECT source, unnest(tk) AS t FROM toks) WHERE t <> '' " +
        "GROUP BY source), " +
        "b AS (SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams, " +
        "CAST(count(DISTINCT bg) AS BIGINT) AS d_bigrams FROM " +
        "(SELECT source, tk[i] || ' ' || tk[i + 1] AS bg FROM toks, " +
        "unnest(generate_series(1, len(tk) - 1)) AS u(i) " +
        "WHERE len(tk) >= 2) GROUP BY source) " +
        "SELECT u.source, n_unigrams, d_unigrams, " +
        "round(CAST(d_unigrams AS DOUBLE) / CAST(n_unigrams AS DOUBLE), 6) " +
        "+ 0.0 AS distinct_1, n_bigrams, d_bigrams, " +
        "round(CAST(d_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 6) " +
        "+ 0.0 AS distinct_2 FROM u LEFT JOIN b ON u.source = b.source " +
        "ORDER BY u.source"),

    "q_graph_summary" -> graphSummaryOracle,

    "q_anova" ->
      ("WITH src AS (SELECT event_type, CAST(value AS DOUBLE) AS v " +
        "FROM events WHERE value IS NOT NULL), " +
        "pg AS (SELECT event_type, count(*) AS n, " +
        "SUM(CAST(v AS DECIMAL(28,8))) AS s, " +
        "SUM(CAST(v * v AS DECIMAL(28,8))) AS s2 FROM src GROUP BY 1), " +
        "pm AS (SELECT n, s, s2, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m " +
        "FROM pg), " +
        "red AS (SELECT count(*) AS k, CAST(SUM(n) AS BIGINT) AS n, " +
        "SUM(CAST(s AS DECIMAL(28,8))) AS gs, " +
        "SUM(CAST(m * m * CAST(n AS DOUBLE) AS DECIMAL(28,10))) AS snm2, " +
        "SUM(CAST(CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE) * m * m " +
        "AS DECIMAL(28,10))) AS ssw FROM pm), " +
        "fin AS (SELECT k, n, CAST(snm2 AS DOUBLE) - " +
        "(CAST(gs AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(gs AS DOUBLE) AS ssb, " +
        "CAST(ssw AS DOUBLE) AS sswd, k - 1 AS df1, n - k AS df2 FROM red) " +
        "SELECT k, n, CAST(df1 AS BIGINT) AS df1, CAST(df2 AS BIGINT) AS df2, " +
        "round(ssb, 6) AS ss_between, round(sswd, 6) AS ss_within, " +
        "round((ssb / CAST(df1 AS DOUBLE)) / (sswd / CAST(df2 AS DOUBLE)), 6) " +
        "AS f_stat, round(ssb / (ssb + sswd), 6) AS eta_squared FROM fin"),

    "q_effect_size" ->
      ("WITH b AS (SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t, " +
        "CAST(value AS DOUBLE) AS v FROM events WHERE value IS NOT NULL), " +
        "a AS (SELECT " +
        "CAST(SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0, " +
        "SUM(CASE WHEN t = 0 THEN CAST(v AS DECIMAL(28,8)) END) AS s0, " +
        "SUM(CASE WHEN t = 0 THEN CAST(v * v AS DECIMAL(28,8)) END) AS q0, " +
        "CAST(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1, " +
        "SUM(CASE WHEN t = 1 THEN CAST(v AS DECIMAL(28,8)) END) AS s1, " +
        "SUM(CASE WHEN t = 1 THEN CAST(v * v AS DECIMAL(28,8)) END) AS q1 " +
        "FROM b), " +
        "w AS (SELECT n0, n1, " +
        "CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m0, " +
        "CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1, " +
        "(CAST(q0 AS DOUBLE) - CAST(n0 AS DOUBLE) * " +
        "(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) * " +
        "(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))) / " +
        "(CAST(n0 AS DOUBLE) - 1.0) AS v0, " +
        "(CAST(q1 AS DOUBLE) - CAST(n1 AS DOUBLE) * " +
        "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) * " +
        "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))) / " +
        "(CAST(n1 AS DOUBLE) - 1.0) AS v1 FROM a), " +
        "w2 AS (SELECT n0, n1, m0, m1, " +
        "sqrt(((CAST(n1 AS DOUBLE) - 1.0) * v1 + " +
        "(CAST(n0 AS DOUBLE) - 1.0) * v0) / " +
        "(CAST(n0 + n1 AS DOUBLE) - 2.0)) AS pooled FROM w) " +
        "SELECT n0 AS n_control, n1 AS n_treated, " +
        "round(m0, 6) AS mean_control, round(m1, 6) AS mean_treated, " +
        "round(pooled, 6) AS pooled_sd, " +
        "round((m1 - m0) / pooled, 6) AS cohens_d, " +
        "round((m1 - m0) / pooled * (1.0 - 3.0 / " +
        "(4.0 * CAST(n0 + n1 AS DOUBLE) - 9.0)), 6) AS hedges_g FROM w2"),

    "q_follows_lag" ->
      ("WITH f AS (SELECT user_id, event_type AS t, min(ts) AS ts " +
        "FROM events GROUP BY 1, 2), " +
        "p AS (SELECT fa.t AS a, fb.t AS b, " +
        "epoch_ms(fb.ts) - epoch_ms(fa.ts) AS lag_ms FROM f fa " +
        "JOIN f fb ON fa.user_id = fb.user_id AND fa.ts < fb.ts) " +
        "SELECT a, b, count(*) AS support, " +
        "round(quantile_cont(lag_ms, 0.5), 3) AS p50_lag_ms, " +
        "round(quantile_cont(lag_ms, 0.9), 3) AS p90_lag_ms " +
        "FROM p GROUP BY 1, 2 ORDER BY support DESC, a, b"),

    "q_gap_profile" ->
      ("WITH g AS (SELECT (epoch_ms(ts) - epoch_ms(lag(ts) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id))) / 1000 AS gap_s " +
        "FROM events), " +
        "b AS (SELECT CASE WHEN gap_s < 60 THEN 0 WHEN gap_s < 300 THEN 1 " +
        "WHEN gap_s < 1800 THEN 2 WHEN gap_s < 7200 THEN 3 ELSE 4 END AS band " +
        "FROM g WHERE gap_s IS NOT NULL), " +
        "t AS (SELECT count(*) AS n FROM b) " +
        "SELECT CAST(band AS BIGINT) AS band, " +
        "['lt_1m', '1m_5m', '5m_30m', '30m_2h', 'ge_2h'][band + 1] AS band_label, " +
        "count(*) AS n_gaps, " +
        "round(CAST(count(*) AS DOUBLE) / CAST(t.n AS DOUBLE), 6) AS share " +
        "FROM b CROSS JOIN t GROUP BY band, t.n ORDER BY band"),

    "q_price_index" ->
      ("WITH base AS (SELECT l_partkey AS i, " +
        "CASE WHEN year(l_shipdate) = 1995 THEN 0 " +
        "WHEN year(l_shipdate) = 1996 THEN 1 END AS p, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS qd, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) / " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS price " +
        "FROM lineitem WHERE year(l_shipdate) IN (1995, 1996) GROUP BY 1, 2), " +
        "p0 AS (SELECT i, qd AS q0, price AS pr0 FROM base WHERE p = 0), " +
        "p1 AS (SELECT i, qd AS q1, price AS pr1 FROM base WHERE p = 1) " +
        "SELECT count(*) AS n_items, " +
        "round(CAST(SUM(CAST(pr1 * q0 AS DECIMAL(28,10))) AS DOUBLE) / " +
        "CAST(SUM(CAST(pr0 * q0 AS DECIMAL(28,10))) AS DOUBLE), 6) AS laspeyres, " +
        "round(CAST(SUM(CAST(pr1 * q1 AS DECIMAL(28,10))) AS DOUBLE) / " +
        "CAST(SUM(CAST(pr0 * q1 AS DECIMAL(28,10))) AS DOUBLE), 6) AS paasche " +
        "FROM p0 JOIN p1 USING (i)"),

    "q_filter_prefix_rlike" ->
      ("SELECT c_custkey, c_name FROM customer " +
        "WHERE regexp_matches(c_name, '^Customer#00000001') " +
        "ORDER BY c_custkey"),

    "q_stickiness" ->
      ("WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id AS u " +
        "FROM events WHERE user_id IS NOT NULL), " +
        "daily AS (SELECT d, count(DISTINCT u) AS dau FROM du GROUP BY 1), " +
        "days AS (SELECT DISTINCT d AS window_end FROM du), " +
        "wau AS (SELECT e.window_end, count(DISTINCT du.u) AS wau " +
        "FROM days e JOIN du ON du.d <= e.window_end " +
        "AND du.d > e.window_end - 7 GROUP BY 1) " +
        "SELECT daily.d, daily.dau, wau.wau, " +
        "round(CAST(daily.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE), 6) " +
        "AS stickiness FROM daily JOIN wau ON wau.window_end = daily.d " +
        "ORDER BY daily.d"),

    "q_k_anonymity" ->
      ("SELECT c_nationkey AS nation, " +
        "CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band, " +
        "count(*) AS n, count(DISTINCT c_mktsegment) AS l_distinct, " +
        "count(*) >= 5 AS k_anonymous, " +
        "count(DISTINCT c_mktsegment) >= 2 AS l_diverse " +
        "FROM customer GROUP BY 1, 2 ORDER BY 1, 2"),

    // Mirrors Constraints.entropyLDiversityReport (l=3): exact cell
    // counts, DECIMAL p*ln(p) sums, e^H effective-l, and the verdict
    // against the ENGINE's ln(3) literal (same IEEE constant both sides).
    "q_l_diversity" ->
      ("WITH cells AS (SELECT c_nationkey AS nation, " +
        "CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band, " +
        "c_mktsegment AS sv, count(*) AS c FROM customer GROUP BY 1, 2, 3), " +
        "tot AS (SELECT nation, bal_band, sum(c) AS n FROM cells GROUP BY 1, 2), " +
        "h AS (SELECT cells.nation, cells.bal_band, max(tot.n) AS n, " +
        "count(*) AS l_distinct, " +
        "-CAST(sum(CAST(round((CAST(c AS DOUBLE) / CAST(tot.n AS DOUBLE)) * " +
        "ln(CAST(c AS DOUBLE) / CAST(tot.n AS DOUBLE)), 9) AS DECIMAL(28,14))) " +
        "AS DOUBLE) AS hh FROM cells " +
        "JOIN tot USING (nation, bal_band) GROUP BY 1, 2) " +
        "SELECT nation, bal_band, CAST(n AS BIGINT) AS n, l_distinct, " +
        "round(hh, 6) + 0.0 AS entropy, round(exp(hh), 6) + 0.0 AS effective_l, " +
        s"hh >= ${math.log(3.0)} AS entropy_l_diverse " +
        "FROM h ORDER BY nation, bal_band"),

    "q_centroid_classify" ->
      ("WITH e AS MATERIALIZED (SELECT vec_id, label, " +
        "embedding::DOUBLE[] AS v FROM embeddings WHERE len(embedding) = 64), " +
        "cd AS (SELECT label, i AS pos, " +
        "CAST(sum(CAST(v[i + 1] AS DECIMAL(28,14))) AS DOUBLE) / count(*) AS cx " +
        "FROM e, unnest(generate_series(0, 63)) AS u(i) GROUP BY 1, 2), " +
        "cent AS MATERIALIZED (SELECT label AS clab, " +
        "list(round(cx, 9) ORDER BY pos) AS c FROM cd GROUP BY 1), " +
        "sc AS (SELECT e.vec_id, e.label, cent.clab, " +
        "round(list_dot_product(e.v, cent.c) / " +
        "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cent.c, cent.c))), 6) " +
        "AS cos FROM e CROSS JOIN cent), " +
        "best AS (SELECT vec_id, label, clab, " +
        "row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, clab) AS rn " +
        "FROM sc) " +
        "SELECT label, clab AS predicted, count(*) AS n FROM best " +
        "WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2"),
  )

  /** Shared triangle-support CTE block over an edge relation `e` (a, b
    * with a < b): `tri` (each triangle once as its sorted triple) and
    * `ts` (per-edge triangle count). Callers define `e`; MATERIALIZED
    * because `e` anchors three self-join arms and `tri` three unions. */
  private def edgeSupportCtes: String =
    "e AS MATERIALIZED (SELECT id1 AS a, id2 AS b FROM pairs), " +
      "tri AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z " +
      "FROM e e1 JOIN e e2 ON e1.b = e2.a " +
      "JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b), " +
      "ts AS (SELECT a, b, count(*) AS s FROM " +
      "(SELECT x AS a, y AS b FROM tri UNION ALL SELECT x, z FROM tri " +
      "UNION ALL SELECT y, z FROM tri) GROUP BY 1, 2)"

  /** Unrolled k-truss sweeps (Graph.kTruss): per round, recompute each
    * surviving edge's triangle support and keep support >= k-2; the
    * final round's support is the reported value. MATERIALIZED per
    * round (triple-referenced self-join arms, [[kcoreOracle]]'s reason). */
  private def ktrussOracle(k: Int, rounds: Int): String = {
    val sb = new StringBuilder(
      s"WITH $mhPairsCtes, " +
        "e0 AS MATERIALIZED (SELECT id1 AS a, id2 AS b FROM pairs)")
    def triSup(i: Int, src: String): Unit = {
      sb.append(s", tri$i AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, " +
        s"e2.b AS z FROM $src e1 JOIN $src e2 ON e1.b = e2.a " +
        s"JOIN $src e3 ON e3.a = e1.a AND e3.b = e2.b)")
      sb.append(s", ts$i AS MATERIALIZED (SELECT a, b, count(*) AS s FROM " +
        s"(SELECT x AS a, y AS b FROM tri$i UNION ALL SELECT x, z FROM tri$i " +
        s"UNION ALL SELECT y, z FROM tri$i) GROUP BY 1, 2)")
    }
    for (i <- 1 to rounds) {
      triSup(i, s"e${i - 1}")
      sb.append(s", e$i AS MATERIALIZED (SELECT e.a, e.b FROM e${i - 1} e " +
        s"JOIN ts$i t ON e.a = t.a AND e.b = t.b WHERE t.s >= ${k - 2})")
    }
    triSup(rounds + 1, s"e$rounds")
    sb.append(s" SELECT e.a, e.b, CAST(coalesce(t.s, 0) AS BIGINT) " +
      s"AS support FROM e$rounds e LEFT JOIN ts${rounds + 1} t " +
      "ON e.a = t.a AND e.b = t.b ORDER BY 1, 2")
    sb.toString
  }

  /** Unrolled personalized-PageRank iterations: [[pagerankOracle]]'s
    * DECIMAL/round(9) arithmetic with the teleport term replaced by the
    * seed indicator mass (1−d)·[v ∈ S]/|S|. */
  private def pprOracle(seeds: Seq[String], iters: Int): String = {
    val oneMinusD = (1.0 - 0.85).toString
    val seedRows = seeds.map(s => s"('$s')").mkString(", ")
    val sb = new StringBuilder
    sb ++= "WITH ue AS (SELECT user_id, event_type, count(*) AS w FROM events GROUP BY 1, 2), "
    sb ++= "ed AS (SELECT 'u:' || user_id AS src, 't:' || event_type AS dst, w FROM ue " +
      "UNION ALL SELECT 't:' || event_type AS src, 'u:' || user_id AS dst, w FROM ue), "
    sb ++= "nd AS (SELECT src AS node FROM ed UNION SELECT dst AS node FROM ed), "
    sb ++= s"sd(node) AS (VALUES $seedRows), "
    sb ++= "ns AS (SELECT count(DISTINCT node) AS n FROM sd), "
    sb ++= "base AS (SELECT nd.node, CASE WHEN nd.node IN (SELECT node FROM sd) " +
      "THEN CAST(1 AS DOUBLE) / ns.n ELSE CAST(0 AS DOUBLE) END AS b " +
      "FROM nd CROSS JOIN ns), "
    sb ++= "ow AS (SELECT src, sum(w) AS outw FROM ed GROUP BY 1), "
    sb ++= "r0 AS (SELECT node, b AS rank FROM base), "
    for (t <- 1 to iters) {
      sb ++= s"c$t AS (SELECT ed.dst AS node, CAST(r.rank * ed.w / ow.outw AS DECIMAL(28,14)) AS c " +
        s"FROM ed JOIN ow ON ed.src = ow.src JOIN r${t - 1} r ON r.node = ed.src), "
      sb ++= s"s$t AS (SELECT node, sum(c) AS cs FROM c$t GROUP BY 1), "
      sb ++= s"r$t AS (SELECT base.node, round($oneMinusD * base.b + " +
        s"0.85 * coalesce(CAST(s$t.cs AS DOUBLE), 0), 9) AS rank " +
        s"FROM base LEFT JOIN s$t ON base.node = s$t.node), "
    }
    sb.setLength(sb.length - 2)
    sb ++= s" SELECT node, round(rank, 6) AS rank FROM r$iters ORDER BY node"
    sb.toString
  }

  /** Per-feature entropy/conditional-entropy blocks UNION ALLed — one
    * generated block per (name, SQL expr), mirroring Stats.infoGain's
    * per-feature aggregations and its 0·log 0 = 0 convention. */
  private def infoGainOracle: String = {
    def h(p: String) =
      s"-(CASE WHEN $p > 0 THEN $p * log2($p) ELSE 0.0 END + " +
        s"CASE WHEN 1.0 - $p > 0 THEN (1.0 - $p) * log2(1.0 - $p) ELSE 0.0 END)"
    val features = Seq(
      ("hour", "hour(ts)"),
      ("dow", "CAST(isodow(ts) AS BIGINT)"),
      ("value_band", "CAST(least(floor(value / 50.0), 9.0) AS BIGINT)"))
    val blocks = features.map { case (name, expr) =>
      val hl = h("CAST(toty AS DOUBLE) / CAST(tot AS DOUBLE)")
      s"SELECT '$name' AS feature, n_values, round($hl, 6) AS h_label, " +
        "round(CAST(ch AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS h_cond, " +
        s"round($hl - CAST(ch AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS info_gain " +
        "FROM (SELECT CAST(SUM(n) AS BIGINT) AS tot, CAST(SUM(ny) AS BIGINT) AS toty, " +
        "count(*) AS n_values, SUM(CAST(n * hv AS DECIMAL(28,10))) AS ch " +
        "FROM (SELECT n, ny, " +
        // per-value entropy pinned to 9 dp (the op's cross-libm stance)
        "round(" + h("CAST(ny AS DOUBLE) / CAST(n AS DOUBLE)") + ", 9) AS hv " +
        s"FROM (SELECT $expr AS v, count(*) AS n, " +
        "SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ny " +
        "FROM events GROUP BY 1)))"
    }
    s"SELECT * FROM (${blocks.mkString(" UNION ALL ")}) ORDER BY feature"
  }

  /** Unrolled peel rounds over the minhash candidate edges — the fixed
    * round count is the operator definition (Graph.kCore). Every CTE is
    * MATERIALIZED: each e(i) is referenced three times by round i+1, so
    * DuckDB's default inlining would expand e0 ~3^rounds times and open
    * that many parquet handles (the round-7 "Too many open files"). */
  private def kcoreOracle(k: Int, rounds: Int): String = {
    val sb = new StringBuilder(
      s"WITH $mhPairsCtes, " +
        "e0 AS MATERIALIZED (SELECT id1 AS a, id2 AS b FROM pairs)")
    for (i <- 1 to rounds) {
      sb.append(s", d$i AS MATERIALIZED (SELECT node, count(*) AS deg FROM " +
        s"(SELECT a AS node FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1}) " +
        "GROUP BY 1)")
      sb.append(s", k$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg >= $k)")
      sb.append(s", e$i AS MATERIALIZED (SELECT a, b FROM e${i - 1} " +
        s"WHERE a IN (SELECT node FROM k$i) AND b IN (SELECT node FROM k$i))")
    }
    sb.append(s" SELECT node, count(*) AS core_degree FROM " +
      s"(SELECT a AS node FROM e$rounds UNION ALL SELECT b FROM e$rounds) " +
      "GROUP BY 1 ORDER BY node")
    sb.toString
  }

  /** Unrolled weighted peel rounds (Graph.kCoreWeighted): exact-Jaccard
    * weights as DECIMAL(18,6), DECIMAL sums, threshold compared in
    * DECIMAL — the engine's exact-weighted-degree stance. MATERIALIZED
    * CTEs for the same 3^rounds-inlining reason as [[kcoreOracle]]. */
  private def kcoreWeightedOracle(minW: Double, rounds: Int): String = {
    val sb = new StringBuilder(
      s"WITH $mhPairsCtes, " +
        "e0 AS MATERIALIZED (SELECT p.id1 AS a, p.id2 AS b, " +
        "CAST(round(CAST(len(list_intersect(x.toks, y.toks)) AS DOUBLE) / " +
        "len(list_distinct(list_concat(x.toks, y.toks))), 6) " +
        "AS DECIMAL(18,6)) AS w " +
        "FROM pairs p JOIN t x ON x.doc_id = p.id1 " +
        "JOIN t y ON y.doc_id = p.id2)")
    for (i <- 1 to rounds) {
      sb.append(s", d$i AS MATERIALIZED (SELECT node, SUM(w) AS wdeg FROM " +
        s"(SELECT a AS node, w FROM e${i - 1} " +
        s"UNION ALL SELECT b, w FROM e${i - 1}) GROUP BY 1)")
      sb.append(s", k$i AS MATERIALIZED (SELECT node FROM d$i " +
        s"WHERE wdeg >= CAST($minW AS DECIMAL(18,6)))")
      sb.append(s", e$i AS MATERIALIZED (SELECT a, b, w FROM e${i - 1} " +
        s"WHERE a IN (SELECT node FROM k$i) AND b IN (SELECT node FROM k$i))")
    }
    sb.append(s" SELECT node, round(CAST(SUM(w) AS DOUBLE), 6) " +
      "AS core_wdegree FROM " +
      s"(SELECT a AS node, w FROM e$rounds " +
      s"UNION ALL SELECT b, w FROM e$rounds) " +
      "GROUP BY 1 ORDER BY node")
    sb.toString
  }

  /** Unrolled synchronous label-propagation sweeps
    * (Graph.labelPropagation): per sweep, neighbor-label counts then the
    * (count DESC, label ASC) argmax via QUALIFY — the same strict total
    * order as the engine's min-of-struct tie-break. MATERIALIZED per
    * round (each labeling feeds the next sweep's join). */
  private def labelPropagationOracle(rounds: Int): String = {
    val sb = new StringBuilder(
      s"WITH $mhPairsCtes, " +
        "n0 AS MATERIALIZED (SELECT id1 AS u, id2 AS v FROM pairs " +
        "UNION ALL SELECT id2, id1 FROM pairs), " +
        "l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM n0)")
    for (i <- 1 to rounds) {
      sb.append(s", c$i AS MATERIALIZED (SELECT n.u AS u, l.label AS label, " +
        s"count(*) AS c FROM n0 n JOIN l${i - 1} l ON n.v = l.node " +
        "GROUP BY 1, 2)")
      sb.append(s", l$i AS MATERIALIZED (SELECT u AS node, label FROM c$i " +
        "QUALIFY row_number() OVER " +
        "(PARTITION BY u ORDER BY c DESC, label ASC) = 1)")
    }
    sb.append(s" SELECT node, label AS community FROM l$rounds ORDER BY node")
    sb.toString
  }

  /** Mirror of q_graph_summary: [[dedupClustersOracle]]'s recursive CC
    * over ALL documents (singletons included), then the one-row health
    * readout. */
  private def graphSummaryOracle: String =
    s"WITH RECURSIVE $mhPairsCtes, " +
      "e AS MATERIALIZED (SELECT DISTINCT least(id1, id2) AS id1, " +
      "greatest(id1, id2) AS id2 FROM pairs WHERE id1 <> id2), " +
      "edges AS (SELECT id1 AS src, id2 AS dst FROM e " +
      "UNION ALL SELECT id2, id1 FROM e), " +
      "cc AS (SELECT doc_id AS id, doc_id AS label FROM documents " +
      "UNION SELECT ed.dst, cc.label FROM cc JOIN edges ed ON cc.id = ed.src), " +
      "lab AS (SELECT id, min(label) AS label FROM cc GROUP BY 1), " +
      "comp AS (SELECT count(*) AS n_components, " +
      "CAST(max(sz) AS BIGINT) AS largest_component, " +
      "CAST(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_isolated " +
      "FROM (SELECT label, count(*) AS sz FROM lab GROUP BY 1)), " +
      "nn AS (SELECT count(*) AS n_nodes FROM documents), " +
      "ne AS (SELECT count(*) AS n_edges FROM e) " +
      "SELECT nn.n_nodes, ne.n_edges, comp.n_components, " +
      "comp.largest_component, comp.n_isolated, " +
      "round(CAST(comp.largest_component AS DOUBLE) / " +
      "CAST(nn.n_nodes AS DOUBLE), 6) AS largest_share " +
      "FROM nn CROSS JOIN ne CROSS JOIN comp"

  /** Mirror of q_modularity: [[labelPropagationOracle]]'s unrolled LPA
    * rounds, then the per-community m_c/m − (d_c/2m)² readout with the
    * engine's fixed double parenthesization. */
  private def modularityOracle(rounds: Int): String = {
    val sb = new StringBuilder(
      s"WITH $mhPairsCtes, " +
        "n0 AS MATERIALIZED (SELECT id1 AS u, id2 AS v FROM pairs " +
        "UNION ALL SELECT id2, id1 FROM pairs), " +
        "l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM n0)")
    for (i <- 1 to rounds) {
      sb.append(s", c$i AS MATERIALIZED (SELECT n.u AS u, l.label AS label, " +
        s"count(*) AS c FROM n0 n JOIN l${i - 1} l ON n.v = l.node " +
        "GROUP BY 1, 2)")
      sb.append(s", l$i AS MATERIALIZED (SELECT u AS node, label FROM c$i " +
        "QUALIFY row_number() OVER " +
        "(PARTITION BY u ORDER BY c DESC, label ASC) = 1)")
    }
    sb.append(s", lab AS MATERIALIZED (SELECT node, label AS community FROM l$rounds)")
    sb.append(", e AS MATERIALIZED (SELECT DISTINCT least(id1, id2) AS a, " +
      "greatest(id1, id2) AS b FROM pairs WHERE id1 <> id2)")
    sb.append(", m AS (SELECT count(*) AS m FROM e)")
    sb.append(", und AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e)")
    sb.append(", dc AS (SELECT lab.community, count(*) AS dc FROM und " +
      "JOIN lab ON lab.node = und.u GROUP BY 1)")
    sb.append(", mc AS (SELECT la.community AS community, count(*) AS mc " +
      "FROM e JOIN lab la ON la.node = e.a JOIN lab lb ON lb.node = e.b " +
      "WHERE la.community = lb.community GROUP BY 1)")
    sb.append(", nn AS (SELECT community, count(*) AS n_nodes FROM lab GROUP BY 1)")
    sb.append(" SELECT nn.community, nn.n_nodes, " +
      "CAST(COALESCE(mc.mc, 0) AS BIGINT) AS intra_edges, " +
      "CAST(COALESCE(dc.dc, 0) AS BIGINT) AS degree_sum, " +
      "round(CAST(COALESCE(mc.mc, 0) AS DOUBLE) / CAST(m.m AS DOUBLE) - " +
      "(CAST(COALESCE(dc.dc, 0) AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE))) * " +
      "(CAST(COALESCE(dc.dc, 0) AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE))), 6) + 0.0 " +
      "AS contribution FROM nn LEFT JOIN dc USING (community) " +
      "LEFT JOIN mc USING (community) CROSS JOIN m ORDER BY nn.community")
    sb.toString
  }

  /** Mirror of q_assortativity: normalized edges, both-direction ends
    * joined to degrees, DECIMAL moments, the Pearson assembly in the
    * identical double order. */
  private def assortativityOracle: String =
    s"WITH $mhPairsCtes, " +
      "e AS MATERIALIZED (SELECT DISTINCT least(id1, id2) AS a, " +
      "greatest(id1, id2) AS b FROM pairs WHERE id1 <> id2), " +
      "und AS MATERIALIZED (SELECT a AS u, b AS v FROM e " +
      "UNION ALL SELECT b, a FROM e), " +
      "deg AS (SELECT u AS node, count(*) AS deg FROM und GROUP BY 1), " +
      "ends AS (SELECT CAST(dx.deg AS DOUBLE) AS x, " +
      "CAST(dy.deg AS DOUBLE) AS y FROM und " +
      "JOIN deg dx ON dx.node = und.u JOIN deg dy ON dy.node = und.v), " +
      "mo AS (SELECT count(*) AS n, " +
      "SUM(CAST(x AS DECIMAL(28,10))) AS sx, " +
      "SUM(CAST(y AS DECIMAL(28,10))) AS sy, " +
      "SUM(CAST(x * y AS DECIMAL(28,10))) AS sxy, " +
      "SUM(CAST(x * x AS DECIMAL(28,10))) AS sxx, " +
      "SUM(CAST(y * y AS DECIMAL(28,10))) AS syy FROM ends) " +
      "SELECT n AS n_edge_ends, " +
      "round((CAST(sxy AS DOUBLE) / n - " +
      "(CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)) / " +
      "(sqrt(CAST(sxx AS DOUBLE) / n - " +
      "(CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) * " +
      "sqrt(CAST(syy AS DOUBLE) / n - " +
      "(CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))), 6) " +
      "AS assortativity FROM mo"

  /** Unrolled-CTE mirror of [[graft.ops.Attribution.markovAttribution]]
    * for the fixed events channel set: the fixed-K value iteration is an
    * operator DEFINITION, so the oracle replicates the identical
    * DECIMAL-truncated sweeps rather than solving the chain another way.
    * The event-derived CTEs and `tp` are MATERIALIZED: `tp` is referenced
    * by all 85 chain-iteration CTEs, so default inlining would expand the
    * events scan tree once per reference and exhaust the harness's fd
    * limit ([[kcoreOracle]]'s round-7 failure mode). */
  private lazy val markovAttributionOracle: String = {
    val chs = Seq("click", "error", "signup", "view")
    val iters = 16
    def pcol(s: String) = s"p${s.toLowerCase}"
    def tcol(src: String, dst: String) = s"t_${src.toLowerCase}_${dst.toLowerCase}"
    val tpCols = (for { src <- "S" +: chs; dst <- chs :+ "C" } yield
      s"COALESCE(MAX(CASE WHEN src = '$src' AND dst = '$dst' THEN t END), 0.0) " +
        s"AS ${tcol(src, dst)}").mkString(", ")
    def chainTag(removed: Option[String]) = removed.map(_.take(1)).getOrElse("f")
    def initCte(removed: Option[String]): String = {
      val states = ("S" +: chs).filterNot(removed.contains)
      s"i0${chainTag(removed)} AS (SELECT " +
        states.map(s => s"0.0 AS ${pcol(s)}").mkString(", ") + ")"
    }
    def iterCte(n: Int, removed: Option[String]): String = {
      val tag = chainTag(removed)
      val states = ("S" +: chs).filterNot(removed.contains)
      val body = states.map { src =>
        val terms = chs.filterNot(removed.contains).map(dst =>
          s"CAST(${tcol(src, dst)} * ${pcol(dst)} AS DECIMAL(28,14))") :+
          s"CAST(${tcol(src, "C")} * 1.0 AS DECIMAL(28,14))"
        s"CAST(${terms.mkString(" + ")} AS DOUBLE) AS ${pcol(src)}"
      }.mkString(", ")
      s"i$n$tag AS (SELECT $body FROM i${n - 1}$tag CROSS JOIN tp)"
    }
    val chains = None +: chs.map(Some(_))
    val chainCtes = chains.flatMap(r =>
      initCte(r) +: (1 to iters).map(i => iterCte(i, r))).mkString(", ")
    val resCols = chs.map(c =>
      s"greatest(1.0 - i$iters${c.take(1)}.ps / i${iters}f.ps, 0.0) AS re_$c")
      .mkString(", ")
    val resFrom = (s"i${iters}f" +: chs.map(c => s"i$iters${c.take(1)}"))
      .mkString(" CROSS JOIN ")
    val tot = chs.map(c => s"re_$c").mkString(" + ")
    val finalRows = chs.map(c =>
      s"SELECT '$c' AS channel, round(re_$c, 6) AS removal_effect, " +
        s"CASE WHEN tot > 0 THEN round(re_$c / tot, 6) END AS share FROM r2")
      .mkString(" UNION ALL ")
    "WITH e AS MATERIALIZED (SELECT user_id AS k, event_type AS ty, " +
      "epoch_us(ts) AS tus, event_id AS tie FROM events), " +
      "fp AS MATERIALIZED (SELECT k, tus, tie FROM (SELECT k, tus, tie, " +
      "row_number() OVER " +
      "(PARTITION BY k ORDER BY tus, tie) AS rn FROM e WHERE ty = 'purchase') " +
      "WHERE rn = 1), " +
      "tc AS MATERIALIZED (SELECT e.k, e.ty, e.tus, e.tie, " +
      "fp.k IS NOT NULL AS conv " +
      "FROM e LEFT JOIN fp ON e.k = fp.k WHERE e.ty <> 'purchase' " +
      "AND (fp.k IS NULL OR (e.tus, e.tie) < (fp.tus, fp.tie))), " +
      "st AS MATERIALIZED (SELECT k, ty, conv, lead(ty) OVER (PARTITION BY k " +
      "ORDER BY tus, tie) AS nxt, row_number() OVER (PARTITION BY k " +
      "ORDER BY tus, tie) AS rn FROM tc), " +
      "tr AS (SELECT ty AS src, COALESCE(nxt, CASE WHEN conv THEN 'C' " +
      "ELSE 'N' END) AS dst FROM st " +
      "UNION ALL SELECT 'S', ty FROM st WHERE rn = 1 " +
      "UNION ALL SELECT 'S', 'C' FROM fp WHERE k NOT IN (SELECT k FROM tc)), " +
      "ct AS MATERIALIZED (SELECT src, dst, count(*) AS cnt FROM tr " +
      "GROUP BY 1, 2), " +
      "tt AS (SELECT src, sum(cnt) AS tot FROM ct GROUP BY 1), " +
      s"tp AS MATERIALIZED (SELECT $tpCols FROM (SELECT ct.src, ct.dst, " +
      "CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE) AS t FROM ct " +
      "JOIN tt USING (src))), " +
      chainCtes + ", " +
      s"r1 AS (SELECT $resCols FROM $resFrom), " +
      s"r2 AS (SELECT re_click, re_error, re_signup, re_view, $tot AS tot FROM r1) " +
      s"SELECT channel, removal_effect, share FROM ($finalRows) ORDER BY channel"
  }

  /** Mirror of Sessionize.ewmaTrailing (decay 0.9, lookback 20): the
    * same newest-first frame list and the same left-associated weighted
    * sums, with the weight ladder injected as the IDENTICAL IEEE double
    * literals the Spark side uses (Sessionize.ewmaWeights). */
  private def ewmaOracle: String = {
    val weights = Sessionize.ewmaWeights(0.9, 20)
    val num = weights.zipWithIndex.map { case (wj, j) =>
      s"(CASE WHEN len(r) > $j THEN r[${j + 1}] * $wj ELSE 0.0 END)"
    }.mkString(" + ")
    val den = weights.zipWithIndex.map { case (wj, j) =>
      s"(CASE WHEN len(r) > $j THEN $wj ELSE 0.0 END)"
    }.mkString(" + ")
    "WITH f AS (SELECT user_id, event_id, list_reverse(list(value) OVER (" +
      "PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)) AS r " +
      "FROM events WHERE value IS NOT NULL) " +
      s"SELECT user_id, event_id, round(($num) / ($den), 6) AS ewma " +
      "FROM f ORDER BY user_id, event_id"
  }

  /** Mirrors Sessionize.bollinger (n=20, k=2): same DECIMAL(18,6) rolling
    * sums, population sigma clamped at 0, mean ± 2sigma bands and %B off
    * the UNROUNDED mean/sigma, every readout round(x,6)+0.0. */
  private def bollingerOracle: String =
    "WITH x AS (SELECT user_id, event_id, value, count(*) OVER w AS c, " +
      "CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sm, " +
      "CAST(sum(CAST(value * value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s2 " +
      "FROM events WHERE value IS NOT NULL " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)), " +
      "y AS (SELECT user_id, event_id, value, c, sm / c AS mean, " +
      "sqrt(greatest(s2 / c - (sm / c) * (sm / c), 0.0)) AS sd FROM x) " +
      "SELECT user_id, event_id, value, CAST(c AS BIGINT) AS n_win, " +
      "round(mean, 6) + 0.0 AS sma, round(sd, 6) + 0.0 AS sd, " +
      "round(mean + 2.0 * sd, 6) + 0.0 AS upper, " +
      "round(mean - 2.0 * sd, 6) + 0.0 AS lower, " +
      "CASE WHEN sd > 0 THEN round((value - (mean - 2.0 * sd)) / " +
      "((mean + 2.0 * sd) - (mean - 2.0 * sd)), 6) + 0.0 END AS pctb " +
      "FROM y ORDER BY user_id, event_id"

  /** Mirrors Sessionize.macd (spans 6/13/5, lookback 20): the engine's own
    * ewmaWeights ladders interpolated as literals (identical IEEE doubles
    * on both sides), two EWMA readouts off the reversed value frame, the
    * signal EWMA off the reversed macd frame, +0.0 after every round
    * (differences go negative → signed-zero class), crossovers via lag. */
  private def macdOracle: String = {
    def chain(r: String, weights: Array[Double]): (String, String) = {
      val num = weights.zipWithIndex.map { case (wj, j) =>
        s"(CASE WHEN len($r) > $j THEN $r[${j + 1}] * $wj ELSE 0.0 END)"
      }.mkString(" + ")
      val den = weights.zipWithIndex.map { case (wj, j) =>
        s"(CASE WHEN len($r) > $j THEN $wj ELSE 0.0 END)"
      }.mkString(" + ")
      (num, den)
    }
    def decay(span: Int) = 1.0 - 2.0 / (span + 1.0)
    val (nf, df) = chain("r", Sessionize.ewmaWeights(decay(6), 20))
    val (ns, ds) = chain("r", Sessionize.ewmaWeights(decay(13), 20))
    val (ng, dg) = chain("rm", Sessionize.ewmaWeights(decay(5), 20))
    "WITH f AS (SELECT user_id, event_id, ts, value, " +
      "list_reverse(list(value) OVER w) AS r FROM events " +
      "WHERE value IS NOT NULL " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)), " +
      s"m AS (SELECT user_id, event_id, ts, value, " +
      s"round(($nf) / ($df), 6) + 0.0 AS ema_fast, " +
      s"round(($ns) / ($ds), 6) + 0.0 AS ema_slow FROM f), " +
      "m2 AS (SELECT *, round(ema_fast - ema_slow, 6) + 0.0 AS macd FROM m), " +
      "g AS (SELECT *, list_reverse(list(macd) OVER w2) AS rm FROM m2 " +
      "WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)), " +
      s"h AS (SELECT user_id, event_id, ts, value, ema_fast, ema_slow, macd, " +
      s"round(($ng) / ($dg), 6) + 0.0 AS signal FROM g), " +
      "h2 AS (SELECT *, round(macd - signal, 6) + 0.0 AS hist FROM h), " +
      "h3 AS (SELECT *, lag(hist) OVER (PARTITION BY user_id " +
      "ORDER BY ts, event_id) AS ph FROM h2) " +
      "SELECT user_id, event_id, value, ema_fast, ema_slow, macd, signal, hist, " +
      "CASE WHEN ph IS NOT NULL AND ph <= 0 AND hist > 0 THEN 'bull' " +
      "WHEN ph IS NOT NULL AND ph >= 0 AND hist < 0 THEN 'bear' END AS cross_flag " +
      "FROM h3 ORDER BY user_id, event_id"
  }

  /** Mirrors Sessionize.holtForecast (alpha 0.3, lookback 20, horizon
    * 7): the engine's own ewmaWeights ladder interpolated as literals,
    * s1 rounded to 6 dp before the second smoothing window (both
    * engines smooth the identical series), and the alpha/(1-alpha)
    * slope factor interpolated from the SAME Scala double. */
  private def holtOracle: String = {
    def chain(r: String, weights: Array[Double]): (String, String) = {
      val num = weights.zipWithIndex.map { case (wj, j) =>
        s"(CASE WHEN len($r) > $j THEN $r[${j + 1}] * $wj ELSE 0.0 END)"
      }.mkString(" + ")
      val den = weights.zipWithIndex.map { case (wj, j) =>
        s"(CASE WHEN len($r) > $j THEN $wj ELSE 0.0 END)"
      }.mkString(" + ")
      (num, den)
    }
    val (n1, d1) = chain("r", Sessionize.ewmaWeights(0.7, 20))
    val (n2, d2) = chain("r2", Sessionize.ewmaWeights(0.7, 20))
    val slope = 0.3 / 0.7
    "WITH f AS (SELECT user_id, event_id, ts, value, " +
      "list_reverse(list(value) OVER w) AS r FROM events " +
      "WHERE value IS NOT NULL " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)), " +
      s"m AS (SELECT user_id, event_id, ts, value, " +
      s"round(($n1) / ($d1), 6) + 0.0 AS s1 FROM f), " +
      "g AS (SELECT *, list_reverse(list(s1) OVER w2) AS r2 FROM m " +
      "WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)), " +
      s"h AS (SELECT user_id, event_id, value, s1, " +
      s"round(($n2) / ($d2), 6) + 0.0 AS s2 FROM g) " +
      "SELECT user_id, event_id, value, s1, s2, " +
      "round(2.0 * s1 - s2, 6) + 0.0 AS level, " +
      s"round($slope * (s1 - s2), 6) + 0.0 AS trend, " +
      s"round(2.0 * s1 - s2 + 7.0 * ($slope * (s1 - s2)), 6) + 0.0 " +
      "AS forecast_7 FROM h ORDER BY user_id, event_id"
  }

  /** Mirror of q_graph_bfs: 3 unrolled min-distance relaxation rounds
    * over the same bipartite user↔event-type edge list, from the
    * lexicographically-first event-type node. */
  private def bfsOracle: String = {
    val sb = new StringBuilder
    sb ++= "WITH ue AS (SELECT DISTINCT user_id, event_type FROM events), "
    sb ++= "ed AS (SELECT 'u:' || user_id AS src, 't:' || event_type AS dst FROM ue " +
      "UNION ALL SELECT 't:' || event_type AS src, 'u:' || user_id AS dst FROM ue), "
    sb ++= "d0 AS (SELECT 't:' || min(event_type) AS node, CAST(0 AS BIGINT) AS dist FROM events), "
    for (t <- 1 to 3) {
      sb ++= s"d$t AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (" +
        s"SELECT node, dist FROM d${t - 1} " +
        s"UNION ALL SELECT ed.dst AS node, p.dist + 1 AS dist " +
        s"FROM d${t - 1} p JOIN ed ON p.node = ed.src) GROUP BY 1), "
    }
    sb.setLength(sb.length - 2)
    sb ++= " SELECT node, dist FROM d3 ORDER BY node"
    sb.toString
  }

  /** Mirror of q_pca_top (dim 64, 8 rounds): the same one-pass
    * DECIMAL(28,14) covariance sums, the same uniform start (the literal
    * is interpolated from the SAME Scala double the Spark side rounds
    * to), and 8 unrolled matrix-vector rounds with per-round 9-dp
    * normalization — the pagerank determinism pattern on a matrix.
    * `e` and `cov` are MATERIALIZED: `cov` is referenced by all 8
    * unrolled rounds, so default inlining would replicate the embeddings
    * scan per round and exhaust the harness's fd limit ([[kcoreOracle]]'s
    * round-7 failure mode). */
  private def pcaOracle: String = {
    val v0 = BigDecimal(1.0 / math.sqrt(64.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sb = new StringBuilder
    sb ++= "WITH e AS MATERIALIZED (SELECT embedding::DOUBLE[] AS v " +
      "FROM embeddings WHERE len(embedding) = 64), "
    sb ++= "nn AS (SELECT count(*) AS n FROM e), "
    sb ++= "xx AS (SELECT i, j, " +
      "sum(CAST(v[i + 1] * v[j + 1] AS DECIMAL(28,14))) AS sxx " +
      "FROM e, unnest(generate_series(0, 63)) AS ui(i), " +
      "unnest(generate_series(0, 63)) AS uj(j) GROUP BY 1, 2), "
    sb ++= "mu AS (SELECT i, CAST(sum(CAST(v[i + 1] AS DECIMAL(28,14))) AS DOUBLE) AS si " +
      "FROM e, unnest(generate_series(0, 63)) AS u(i) GROUP BY 1), "
    sb ++= "cov AS MATERIALIZED (SELECT s.i, s.j, CAST(s.sxx AS DOUBLE) / nn.n - " +
      "(a.si / nn.n) * (b.si / nn.n) AS c " +
      "FROM xx s JOIN mu a ON a.i = s.i JOIN mu b ON b.i = s.j CROSS JOIN nn), "
    sb ++= s"v0 AS (SELECT i AS j, CAST($v0 AS DOUBLE) AS vj " +
      "FROM (SELECT unnest(generate_series(0, 63)) AS i)), "
    for (t <- 1 to 8) {
      sb ++= s"w$t AS (SELECT cov.i, " +
        s"CAST(sum(CAST(cov.c * v.vj AS DECIMAL(28,14))) AS DOUBLE) AS wi " +
        s"FROM cov JOIN v${t - 1} v ON v.j = cov.j GROUP BY 1), "
      sb ++= s"n$t AS (SELECT sqrt(CAST(sum(CAST(wi * wi AS DECIMAL(28,14))) AS DOUBLE)) AS nrm FROM w$t), "
      sb ++= s"v$t AS MATERIALIZED (SELECT i AS j, round(wi / nrm, 9) AS vj " +
        s"FROM w$t CROSS JOIN n$t), "
    }
    sb.setLength(sb.length - 2)
    sb ++= " SELECT j AS dim_idx, round(vj, 6) AS loading FROM v8 ORDER BY dim_idx"
    sb.toString
  }

  /** Mirror of q_graph_sssp: 3 unrolled weighted min-distance relaxation
    * rounds (Bellman-Ford) over the weighted bipartite user↔event-type
    * edge list, from the lexicographically-first event-type node. */
  private def ssspOracle: String = {
    val sb = new StringBuilder
    sb ++= "WITH ue AS (SELECT user_id, event_type, count(*) AS w FROM events GROUP BY 1, 2), "
    sb ++= "ed AS (SELECT 'u:' || user_id AS src, 't:' || event_type AS dst, w FROM ue " +
      "UNION ALL SELECT 't:' || event_type AS src, 'u:' || user_id AS dst, w FROM ue), "
    sb ++= "d0 AS (SELECT 't:' || min(event_type) AS node, CAST(0 AS BIGINT) AS dist FROM events), "
    for (t <- 1 to 3) {
      sb ++= s"d$t AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (" +
        s"SELECT node, dist FROM d${t - 1} " +
        s"UNION ALL SELECT ed.dst AS node, p.dist + ed.w AS dist " +
        s"FROM d${t - 1} p JOIN ed ON p.node = ed.src) GROUP BY 1), "
    }
    sb.setLength(sb.length - 2)
    sb ++= " SELECT node, dist FROM d3 ORDER BY node"
    sb.toString
  }

  /** Mirror of q_harmonic: [[bfsOracle]]'s unrolled rounds with a seed
    * column carried through (multi-source labeled BFS), then Σ 1/d in
    * DECIMAL. `ed` is MATERIALIZED — every unrolled round joins it. */
  private def harmonicOracle: String = {
    val sb = new StringBuilder
    sb ++= "WITH ue AS (SELECT DISTINCT user_id, event_type FROM events), "
    sb ++= "ed AS MATERIALIZED (SELECT 'u:' || user_id AS src, " +
      "'t:' || event_type AS dst FROM ue " +
      "UNION ALL SELECT 't:' || event_type AS src, 'u:' || user_id AS dst FROM ue), "
    sb ++= "d0 AS (SELECT DISTINCT 't:' || event_type AS node, " +
      "'t:' || event_type AS seed, CAST(0 AS BIGINT) AS dist FROM events), "
    for (t <- 1 to 3) {
      sb ++= s"d$t AS MATERIALIZED (SELECT node, seed, " +
        s"CAST(min(dist) AS BIGINT) AS dist FROM (" +
        s"SELECT node, seed, dist FROM d${t - 1} " +
        s"UNION ALL SELECT ed.dst AS node, p.seed, p.dist + 1 AS dist " +
        s"FROM d${t - 1} p JOIN ed ON p.node = ed.src) GROUP BY 1, 2), "
    }
    sb.setLength(sb.length - 2)
    sb ++= " SELECT node, count(*) AS n_reached, " +
      "round(CAST(SUM(CAST(1.0 / dist AS DECIMAL(28,10))) AS DOUBLE), 6) " +
      "AS harmonic FROM d3 WHERE dist > 0 GROUP BY 1 ORDER BY 1"
    sb.toString
  }

  /** Mirror of q_dedup_keep_best: [[dedupClustersOracle]]'s clustering,
    * then the per-cluster argmax (n_chars DESC, doc_id) as a rank-1
    * window — min-of-struct's SQL spelling. */
  private def keepBestOracle: String =
    s"WITH RECURSIVE $mhPairsCtes, " +
      "edges AS (SELECT id1 AS src, id2 AS dst FROM pairs " +
      "UNION ALL SELECT id2, id1 FROM pairs), " +
      "cc AS (SELECT doc_id AS id, doc_id AS label FROM documents " +
      "UNION SELECT e.dst AS id, cc.label FROM cc JOIN edges e ON cc.id = e.src), " +
      "lab AS (SELECT id, min(label) AS cluster FROM cc GROUP BY id), " +
      "j AS (SELECT lab.cluster, d.doc_id, d.n_chars FROM lab " +
      "JOIN documents d ON d.doc_id = lab.id), " +
      "r AS (SELECT cluster, doc_id, row_number() OVER (PARTITION BY cluster " +
      "ORDER BY n_chars DESC, doc_id) AS rn, " +
      "count(*) OVER (PARTITION BY cluster) AS csize FROM j) " +
      "SELECT cluster, doc_id AS kept_id, CAST(csize AS BIGINT) AS cluster_size, " +
      "CAST(csize - 1 AS BIGINT) AS n_dropped FROM r WHERE rn = 1 ORDER BY cluster"

  /** Mirror of q_cuped: per-user period means, DECIMAL moments, θ and
    * the adjusted metric with the identical fixed-parenthesization
    * double arithmetic (lateral alias references reuse the same
    * computed values the Spark columns do). */
  private def cupedOracle: String =
    "WITH b AS (SELECT user_id, " +
      "CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t, " +
      "CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS p, " +
      "CAST(value AS DOUBLE) AS v FROM events WHERE value IS NOT NULL), " +
      "u AS (SELECT user_id AS uu, max(t) AS t, " +
      "SUM(CASE WHEN p = 0 THEN CAST(v AS DECIMAL(28,8)) END) AS sx, " +
      "SUM(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS nx, " +
      "SUM(CASE WHEN p = 1 THEN CAST(v AS DECIMAL(28,8)) END) AS sy, " +
      "SUM(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS ny FROM b GROUP BY 1), " +
      "pu AS (SELECT uu, t, CAST(sx AS DOUBLE) / CAST(nx AS DOUBLE) AS x, " +
      "CAST(sy AS DOUBLE) / CAST(ny AS DOUBLE) AS y FROM u " +
      "WHERE nx > 0 AND ny > 0), " +
      "m AS (SELECT count(*) AS n, " +
      "SUM(CAST(x AS DECIMAL(28,10))) AS sx, " +
      "SUM(CAST(y AS DECIMAL(28,10))) AS sy, " +
      "SUM(CAST(x * y AS DECIMAL(28,10))) AS sxy, " +
      "SUM(CAST(x * x AS DECIMAL(28,10))) AS sxx, " +
      "SUM(CAST(y * y AS DECIMAL(28,10))) AS syy FROM pu), " +
      "w AS (SELECT pu.uu, pu.t, pu.x, pu.y, " +
      "CAST(m.sx AS DOUBLE) / m.n AS xbar, " +
      "CAST(m.sy AS DOUBLE) / m.n AS ybar, " +
      "(CAST(m.sxy AS DOUBLE) / m.n - xbar * ybar) / " +
      "(CAST(m.sxx AS DOUBLE) / m.n - xbar * xbar) AS theta, " +
      "m.n AS n, m.syy AS syy FROM pu CROSS JOIN m), " +
      "w2 AS (SELECT w.*, y - theta * (x - xbar) AS yadj FROM w) " +
      "SELECT count(*) AS n_units, round(min(theta), 6) AS theta, " +
      "round(CAST(SUM(CASE WHEN t = 1 THEN CAST(y AS DECIMAL(28,10)) END) AS DOUBLE) / " +
      "SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) - " +
      "CAST(SUM(CASE WHEN t = 0 THEN CAST(y AS DECIMAL(28,10)) END) AS DOUBLE) / " +
      "SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END), 6) AS diff_raw, " +
      "round(CAST(SUM(CASE WHEN t = 1 THEN CAST(yadj AS DECIMAL(28,10)) END) AS DOUBLE) / " +
      "SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) - " +
      "CAST(SUM(CASE WHEN t = 0 THEN CAST(yadj AS DECIMAL(28,10)) END) AS DOUBLE) / " +
      "SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END), 6) AS diff_cuped, " +
      "round((CAST(SUM(CAST(yadj * yadj AS DECIMAL(28,10))) AS DOUBLE) / count(*) - " +
      "(CAST(SUM(CAST(yadj AS DECIMAL(28,10))) AS DOUBLE) / count(*)) * " +
      "(CAST(SUM(CAST(yadj AS DECIMAL(28,10))) AS DOUBLE) / count(*))) / " +
      "(CAST(min(syy) AS DOUBLE) / CAST(min(n) AS DOUBLE) - " +
      "min(ybar) * min(ybar)), 6) AS var_ratio FROM w2"

  /** Mirror of q_stl_anomaly: the q_stl_decompose CTE chain, a DECIMAL
    * moment pass over the remainder, and the 3σ screen with the same
    * fixed-parenthesization double arithmetic. */
  private def stlAnomalyOracle: String =
    "WITH s AS MATERIALIZED (SELECT CAST(o_orderdate AS DATE) AS d, " +
      "CAST(count(*) AS DOUBLE) AS y FROM orders GROUP BY 1), " +
      "t AS MATERIALIZED (SELECT d, y, count(*) OVER w AS n, " +
      "round(CAST(SUM(CAST(y AS DECIMAL(28,8))) OVER w AS DOUBLE) / " +
      "CAST(count(*) OVER w AS DOUBLE), 6) AS trend FROM s " +
      "WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)), " +
      "f AS MATERIALIZED (SELECT d, y, trend, y - trend AS detr, " +
      "CAST(isodow(d) AS BIGINT) AS dow FROM t WHERE n = 7), " +
      "dm AS (SELECT dow, CAST(SUM(CAST(detr AS DECIMAL(28,8))) AS DOUBLE) / " +
      "CAST(count(*) AS DOUBLE) AS sm FROM f GROUP BY 1), " +
      "cc AS (SELECT CAST(SUM(CAST(sm AS DECIMAL(28,8))) AS DOUBLE) / " +
      "CAST(count(*) AS DOUBLE) AS c FROM dm), " +
      "se AS (SELECT dow, round(sm - c, 6) AS seasonal FROM dm CROSS JOIN cc), " +
      "o AS MATERIALIZED (SELECT f.d, f.y, f.trend, se.seasonal, " +
      "round(f.y - f.trend - se.seasonal, 6) AS remainder " +
      "FROM f JOIN se USING (dow)), " +
      "mm AS (SELECT CAST(count(*) AS DOUBLE) AS n, " +
      "SUM(CAST(remainder AS DECIMAL(28,8))) AS s1, " +
      "SUM(CAST(remainder * remainder AS DECIMAL(28,8))) AS s2 FROM o) " +
      "SELECT d, y, trend, seasonal, remainder, " +
      "round((remainder - CAST(s1 AS DOUBLE) / n) / " +
      "sqrt(CAST(s2 AS DOUBLE) / n - " +
      "(CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)), 6) AS sigma " +
      "FROM o CROSS JOIN mm " +
      "WHERE abs(remainder - CAST(s1 AS DOUBLE) / n) > " +
      "3.0 * sqrt(CAST(s2 AS DOUBLE) / n - " +
      "(CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) ORDER BY d"

  /** Mirror of q_link_predict: the shared minhash candidate-pair CTEs,
    * wedge enumeration (x.u < y.v), NOT EXISTS edge exclusion, and the
    * per-value-rounded DECIMAL Σ 1/ln(deg) — [[kcoreOracle]]'s edge
    * normalization stance. */
  private def adamicAdarOracle: String =
    s"WITH $mhPairsCtes, " +
      "e AS MATERIALIZED (SELECT DISTINCT least(id1, id2) AS a, " +
      "greatest(id1, id2) AS b FROM pairs WHERE id1 <> id2), " +
      "und AS MATERIALIZED (SELECT a AS u, b AS v FROM e " +
      "UNION ALL SELECT b, a FROM e), " +
      "deg AS (SELECT u AS node, count(*) AS deg FROM und GROUP BY 1), " +
      "wd AS (SELECT x.u AS a, y.v AS b, x.v AS c FROM und x " +
      "JOIN und y ON x.v = y.u AND x.u < y.v), " +
      "cand AS (SELECT wd.a, wd.b, wd.c FROM wd WHERE NOT EXISTS " +
      "(SELECT 1 FROM e WHERE e.a = wd.a AND e.b = wd.b)), " +
      "sc AS (SELECT a, b, count(*) AS common, " +
      "round(CAST(SUM(CAST(round(1.0 / ln(CAST(deg.deg AS DOUBLE)), 9) " +
      "AS DECIMAL(28,14))) AS DOUBLE), 6) AS aa_score " +
      "FROM cand JOIN deg ON deg.node = cand.c GROUP BY 1, 2) " +
      "SELECT a, b, common, aa_score FROM sc " +
      "ORDER BY aa_score DESC, a, b LIMIT 50"

  /** Mirror of q_hll_rollup: [[hllOracle]] with a (type, day) register
    * level max-merged to per-type before estimating — the associativity
    * the rollup relies on, exercised rather than assumed. */
  private def hllRollupOracle: String =
    "WITH h AS MATERIALIZED (SELECT event_type, CAST(ts AS DATE) AS d, " +
      "md5(CAST(user_id AS VARCHAR)) AS hex FROM events " +
      "WHERE user_id IS NOT NULL), " +
      "rr AS (SELECT event_type, d, ('0x' || substr(hex, 1, 2))::BIGINT AS j, " +
      "substr(hex, 3, 10) AS rest, ltrim(substr(hex, 3, 10), '0') AS strip " +
      "FROM h), " +
      "rho AS (SELECT event_type, d, j, CASE WHEN strip = '' THEN 41 ELSE " +
      "(length(rest) - length(strip)) * 4 + " +
      "CASE WHEN substr(strip, 1, 1) = '1' THEN 3 " +
      "WHEN substr(strip, 1, 1) IN ('2', '3') THEN 2 " +
      "WHEN substr(strip, 1, 1) IN ('4', '5', '6', '7') THEN 1 " +
      "ELSE 0 END + 1 END AS rho FROM rr), " +
      "regs_fine AS (SELECT event_type, d, j, max(rho) AS mj " +
      "FROM rho GROUP BY 1, 2, 3), " +
      "regs AS (SELECT event_type, j, max(mj) AS mj FROM regs_fine " +
      "GROUP BY 1, 2), " +
      "pg AS (SELECT event_type, " +
      "SUM(CAST(power(2, 41 - mj) AS BIGINT)) AS sp, count(*) AS np " +
      "FROM regs GROUP BY 1), " +
      "est AS (SELECT event_type, " +
      "(0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0 * 2199023255552.0 / " +
      "CAST(sp + (256 - np) * 2199023255552 AS DOUBLE) AS raw, " +
      "256 - np AS v FROM pg) " +
      "SELECT event_type, round(CASE WHEN v > 0 AND raw <= 640.0 " +
      "THEN 256.0 * ln(256.0 / CAST(v AS DOUBLE)) ELSE raw END, 4) " +
      "AS hll_distinct FROM est ORDER BY event_type"

  /** Mirror of q_hll_distinct (p=8, m=256): the identical hex-string
    * register/rho computation — bucket = first 2 md5 hex chars, rho from
    * leading zeros of the remaining 10 (4·zero-chars + a CASE on the
    * first non-zero digit) — the exact-integer Σ 2^(41−M_j) harmonic
    * sum, and the same fixed-parenthesization α·m²·2^41/S division with
    * linear-counting correction. 2199023255552 = 2^41. */
  private def hllOracle: String =
    "WITH h AS MATERIALIZED (SELECT event_type, " +
      "md5(CAST(user_id AS VARCHAR)) AS hex FROM events " +
      "WHERE user_id IS NOT NULL), " +
      "rr AS (SELECT event_type, ('0x' || substr(hex, 1, 2))::BIGINT AS j, " +
      "substr(hex, 3, 10) AS rest, ltrim(substr(hex, 3, 10), '0') AS strip " +
      "FROM h), " +
      "rho AS (SELECT event_type, j, CASE WHEN strip = '' THEN 41 ELSE " +
      "(length(rest) - length(strip)) * 4 + " +
      "CASE WHEN substr(strip, 1, 1) = '1' THEN 3 " +
      "WHEN substr(strip, 1, 1) IN ('2', '3') THEN 2 " +
      "WHEN substr(strip, 1, 1) IN ('4', '5', '6', '7') THEN 1 " +
      "ELSE 0 END + 1 END AS rho FROM rr), " +
      "regs AS (SELECT event_type, j, max(rho) AS mj FROM rho GROUP BY 1, 2), " +
      "pg AS (SELECT event_type, " +
      "SUM(CAST(power(2, 41 - mj) AS BIGINT)) AS sp, count(*) AS np " +
      "FROM regs GROUP BY 1), " +
      "est AS (SELECT event_type, " +
      "(0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0 * 2199023255552.0 / " +
      "CAST(sp + (256 - np) * 2199023255552 AS DOUBLE) AS raw, " +
      "256 - np AS v FROM pg) " +
      "SELECT event_type, round(CASE WHEN v > 0 AND raw <= 640.0 " +
      "THEN 256.0 * ln(256.0 / CAST(v AS DOUBLE)) ELSE raw END, 4) " +
      "AS hll_distinct FROM est ORDER BY event_type"

  /** Mirror of Graph.pagerank (3 rounds, d=0.85) over the bipartite
    * user↔event-type graph: 3 unrolled power-iteration rounds with the
    * same DECIMAL(28,14) contribution sums and 9-dp per-round rank
    * rounding. Double constants are interpolated from the SAME Scala
    * doubles the Spark side uses (shortest-roundtrip repr → identical
    * IEEE values; `1 - 0.85` evaluated as SQL DECIMAL would differ from
    * Scala's `1.0 - 0.85` by an ulp). */
  /** Unrolled greedy MMR ([[graft.ops.Similarity.mmrSelect]]): top-20
    * relevance pool and poolSize² 6-dp pair cosines MATERIALIZED once,
    * then k=5 selection steps, each a (score desc, id asc) LIMIT 1 over
    * the not-yet-selected pool with the max-sim penalty against the
    * accumulated selection. */
  private def mmrOracle: String = {
    val sb = new StringBuilder
    sb ++= "WITH e AS MATERIALIZED (SELECT vec_id AS id, " +
      "embedding::DOUBLE[] AS v FROM embeddings), "
    sb ++= "q AS (SELECT v AS qv FROM e ORDER BY id LIMIT 1), "
    sb ++= "sc AS (SELECT e.id, e.v, round(list_dot_product(e.v, q.qv) / " +
      "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS rel " +
      "FROM e CROSS JOIN q), "
    sb ++= "pool AS MATERIALIZED (SELECT id, v, rel FROM sc " +
      "ORDER BY rel DESC, id LIMIT 20), "
    sb ++= "pairs AS MATERIALIZED (SELECT a.id AS id1, b.id AS id2, " +
      "round(list_dot_product(a.v, b.v) / " +
      "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim " +
      "FROM pool a JOIN pool b ON a.id <> b.id), "
    sb ++= "w1 AS (SELECT id, rel, round(0.75 * rel, 6) AS score FROM pool " +
      "ORDER BY score DESC, id LIMIT 1), "
    sb ++= "sel1 AS (SELECT id FROM w1), "
    for (t <- 2 to 5) {
      sb ++= s"sc$t AS (SELECT p.id, p.rel, " +
        s"round(0.75 * p.rel - 0.25 * mx.m, 6) AS score FROM pool p " +
        s"JOIN (SELECT id1 AS id, max(sim) AS m FROM pairs " +
        s"WHERE id2 IN (SELECT id FROM sel${t - 1}) GROUP BY 1) mx USING (id) " +
        s"WHERE p.id NOT IN (SELECT id FROM sel${t - 1})), "
      sb ++= s"w$t AS (SELECT id, rel, score FROM sc$t " +
        s"ORDER BY score DESC, id LIMIT 1), "
      sb ++= s"sel$t AS (SELECT id FROM sel${t - 1} UNION ALL SELECT id FROM w$t), "
    }
    sb.setLength(sb.length - 2)
    sb ++= " " + (1 to 5).map(t =>
      s"SELECT CAST($t AS BIGINT) AS rank, id, rel, score AS mmr_score FROM w$t")
      .mkString(" UNION ALL ")
    sb ++= " ORDER BY rank"
    sb.toString
  }

  /** Unrolled HITS: mirrors [[graft.ops.Graph.hits]]'s determinism recipe
    * exactly — per-edge contributions cast to DECIMAL(28,14) before the
    * grouped sum, per-node raw scores rounded to 9 dp, the L1 total
    * re-summed in DECIMAL(18,9) over the rounded values. Base CTEs are
    * MATERIALIZED so the 3×2 unrolled half-steps scan events once, not
    * 6^depth times ([[kcoreOracle]]'s fd lesson). */
  private def hitsOracle: String = {
    val sb = new StringBuilder
    sb ++= "WITH ed AS MATERIALIZED (SELECT 'u:' || user_id AS src, " +
      "'t:' || event_type AS dst, count(*) AS w FROM events GROUP BY 1, 2), "
    sb ++= "nd AS MATERIALIZED (SELECT src AS node FROM ed " +
      "UNION SELECT dst AS node FROM ed), "
    sb ++= "h0r AS (SELECT node, CAST(1.0 AS DOUBLE) AS s FROM nd), "
    def l1(from: String, out: String): Unit = {
      sb ++= s"${out}t AS (SELECT CAST(sum(CAST(s AS DECIMAL(18,9))) " +
        s"AS DOUBLE) AS tt FROM $from), "
      sb ++= s"$out AS (SELECT node, round(CASE WHEN tt > 0 THEN s / tt " +
        s"ELSE CAST(0 AS DOUBLE) END, 9) AS s FROM $from CROSS JOIN ${out}t), "
    }
    l1("h0r", "h0")
    for (t <- 1 to 3) {
      sb ++= s"a${t}r AS (SELECT nd.node, coalesce(x.r, CAST(0 AS DOUBLE)) AS s " +
        s"FROM nd LEFT JOIN (SELECT ed.dst AS node, " +
        s"round(CAST(sum(CAST(ed.w * h.s AS DECIMAL(28,14))) AS DOUBLE), 9) AS r " +
        s"FROM ed JOIN h${t - 1} h ON h.node = ed.src GROUP BY 1) x " +
        s"ON nd.node = x.node), "
      l1(s"a${t}r", s"a$t")
      sb ++= s"h${t}r AS (SELECT nd.node, coalesce(x.r, CAST(0 AS DOUBLE)) AS s " +
        s"FROM nd LEFT JOIN (SELECT ed.src AS node, " +
        s"round(CAST(sum(CAST(ed.w * a.s AS DECIMAL(28,14))) AS DOUBLE), 9) AS r " +
        s"FROM ed JOIN a$t a ON a.node = ed.dst GROUP BY 1) x " +
        s"ON nd.node = x.node), "
      l1(s"h${t}r", s"h$t")
    }
    sb.setLength(sb.length - 2)
    sb ++= " SELECT nd.node, round(h3.s, 6) AS hub, round(a3.s, 6) AS authority " +
      "FROM nd JOIN h3 ON nd.node = h3.node JOIN a3 ON nd.node = a3.node " +
      "ORDER BY nd.node"
    sb.toString
  }

  /** Unrolled TextRank: [[collocations]]-style bigram edges (both
    * directions) fed through the identical unrolled-PageRank rounds as
    * [[pagerankOracle]]. Base CTEs MATERIALIZED so the three rounds scan
    * documents once ([[kcoreOracle]]'s fd lesson). */
  private def textrankOracle: String = {
    val oneMinusD = (1.0 - 0.85).toString
    val sb = new StringBuilder
    sb ++= "WITH base AS MATERIALIZED (SELECT string_split(text, ' ') AS toks " +
      "FROM documents), "
    sb ++= "bg AS (SELECT toks[i] AS w1, toks[i + 1] AS w2 FROM base, " +
      "unnest(generate_series(1, len(toks) - 1)) AS u(i) " +
      "WHERE len(toks) >= 2 AND toks[i] <> toks[i + 1]), "
    sb ++= "cb AS MATERIALIZED (SELECT w1, w2, count(*) AS w FROM bg GROUP BY 1, 2), "
    sb ++= "ed AS MATERIALIZED (SELECT w1 AS src, w2 AS dst, w FROM cb " +
      "UNION ALL SELECT w2 AS src, w1 AS dst, w FROM cb), "
    sb ++= "nd AS MATERIALIZED (SELECT src AS node FROM ed UNION SELECT dst AS node FROM ed), "
    sb ++= "nn AS (SELECT count(*) AS n FROM nd), "
    sb ++= "ow AS (SELECT src, sum(w) AS outw FROM ed GROUP BY 1), "
    sb ++= "r0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank FROM nd CROSS JOIN nn), "
    for (t <- 1 to 3) {
      sb ++= s"c$t AS (SELECT ed.dst AS node, CAST(r.rank * ed.w / ow.outw AS DECIMAL(28,14)) AS c " +
        s"FROM ed JOIN ow ON ed.src = ow.src JOIN r${t - 1} r ON r.node = ed.src), "
      sb ++= s"s$t AS (SELECT node, sum(c) AS cs FROM c$t GROUP BY 1), "
      sb ++= s"r$t AS (SELECT nd.node, round($oneMinusD / CAST(nn.n AS DOUBLE) + " +
        s"0.85 * coalesce(CAST(s$t.cs AS DOUBLE), 0), 9) AS rank " +
        s"FROM nd CROSS JOIN nn LEFT JOIN s$t ON nd.node = s$t.node), "
    }
    sb.setLength(sb.length - 2)
    sb ++= " SELECT node AS token, round(rank, 6) AS rank FROM r3 " +
      "ORDER BY rank DESC, token LIMIT 30"
    sb.toString
  }

  private def pagerankOracle: String = {
    val oneMinusD = (1.0 - 0.85).toString
    val sb = new StringBuilder
    sb ++= "WITH ue AS (SELECT user_id, event_type, count(*) AS w FROM events GROUP BY 1, 2), "
    sb ++= "ed AS (SELECT 'u:' || user_id AS src, 't:' || event_type AS dst, w FROM ue " +
      "UNION ALL SELECT 't:' || event_type AS src, 'u:' || user_id AS dst, w FROM ue), "
    sb ++= "nd AS (SELECT src AS node FROM ed UNION SELECT dst AS node FROM ed), "
    sb ++= "nn AS (SELECT count(*) AS n FROM nd), "
    sb ++= "ow AS (SELECT src, sum(w) AS outw FROM ed GROUP BY 1), "
    sb ++= "r0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank FROM nd CROSS JOIN nn), "
    for (t <- 1 to 3) {
      sb ++= s"c$t AS (SELECT ed.dst AS node, CAST(r.rank * ed.w / ow.outw AS DECIMAL(28,14)) AS c " +
        s"FROM ed JOIN ow ON ed.src = ow.src JOIN r${t - 1} r ON r.node = ed.src), "
      sb ++= s"s$t AS (SELECT node, sum(c) AS cs FROM c$t GROUP BY 1), "
      sb ++= s"r$t AS (SELECT nd.node, round($oneMinusD / CAST(nn.n AS DOUBLE) + " +
        s"0.85 * coalesce(CAST(s$t.cs AS DOUBLE), 0), 9) AS rank " +
        s"FROM nd CROSS JOIN nn LEFT JOIN s$t ON nd.node = s$t.node), "
    }
    sb.setLength(sb.length - 2)
    sb ++= " SELECT node, round(rank, 6) AS rank FROM r3 ORDER BY node"
    sb.toString
  }

  /** Mirror of TextAnalysis.bm25TopK (k1=1.2, b=0.75, k=5): identical
    * arithmetic shape — idf·(tf·(k1+1))/(tf + k1·(1−b + b·dl/avgdl)) with
    * DECIMAL(28,14) contribution sums — so the 6-dp score matches Spark
    * bit-for-bit and the rank window ties break on doc_id identically. */
  /** Shared CTE chain for the BM25 retrieval queries (q_bm25_topk and
    * the q_rank_eval run it evaluates): query batch → token postings →
    * per-(query, doc) BM25 scores → `ranked` with the same
    * (score DESC, doc_id) tie order the Spark window uses. */
  private def bm25Ctes: String = {
    val values = Bm25Queries
      .map { case (id, t) => s"('$id', '$t')" }.mkString(", ")
    val k1p1 = (1.2 + 1.0).toString   // same double the Spark side uses
    s"q(query_id, qtext) AS (VALUES $values), " +
      "qt AS (SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS token FROM q), " +
      "qv AS (SELECT DISTINCT token FROM qt), " +
      "dlen AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents), " +
      "tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents), " +
      "tf AS (SELECT doc_id, token, count(*) AS tf FROM tok JOIN qv USING (token) GROUP BY 1, 2), " +
      "dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1), " +
      "stats AS (SELECT count(*) AS n_docs, avg(len(string_split(text, ' '))) AS avgdl FROM documents), " +
      "sc AS (SELECT qt.query_id, tf.doc_id, round(CAST(sum(CAST(" +
      // per-term contribution pinned to 9 dp (the op's cross-libm
      // transcendental-output stance; idf carries a libm ln)
      "round(ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)) * " +
      // CAST keeps the multiply in double domain: BIGINT×DECIMAL would be
      // exact decimal then one conversion — off Spark's double×double by
      // an ulp on some tf values
      s"(tf.tf * CAST($k1p1 AS DOUBLE)) / " +
      "(tf.tf + 1.2 * (0.25 + 0.75 * dlen.dl / stats.avgdl)), 9) " +
      "AS DECIMAL(28,14))) AS DOUBLE), 6) AS score " +
      "FROM tf JOIN qt USING (token) JOIN dfreq USING (token) " +
      "JOIN dlen ON dlen.doc_id = tf.doc_id CROSS JOIN stats GROUP BY 1, 2), " +
      "ranked AS (SELECT *, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn FROM sc)"
  }

  private def bm25Oracle: String =
    s"WITH $bm25Ctes SELECT query_id, doc_id, score, " +
      "CAST(rn AS BIGINT) AS rank FROM ranked " +
      "WHERE rn <= 5 ORDER BY query_id, rank"

  /** Mirror of TextAnalysis.rakeKeywords (topK=20, maxWords=3): the same
    * lowercase → break-marker → stopword-break normalization (RE2-safe,
    * global regexp_replace), the same degree/frequency word scores with
    * explicit DOUBLE division, DECIMAL(28,14) phrase-score sums, and the
    * (score DESC, phrase) cut order. */
  private def rakeOracle: String = {
    val stops = graft.ops.TextAnalysis.RakeStopwords
      .map(s => s"'$s'").mkString(", ")
    "WITH ph0 AS MATERIALIZED (SELECT trim(p) AS phrase FROM (" +
      "SELECT unnest(string_split_regex(array_to_string(list_transform(" +
      "list_filter(string_split_regex(" +
      // whitespace KEPT by the break-marker replace (it separates words
      // within a phrase); explicit class matching the Spark side
      "regexp_replace(lower(text), '[^a-z \\t\\n\\f\\r]+', ' 0 ', 'g'), " +
      "'[ \\t\\n\\f\\r]+'), " +
      "t -> len(t) > 0), " +
      s"t -> CASE WHEN t = '0' OR t IN ($stops) THEN '|' ELSE t END), " +
      "' '), '[ ]*\\|[ ]*')) AS p FROM documents) WHERE len(trim(p)) > 0), " +
      "ph AS MATERIALIZED (SELECT phrase FROM ph0 " +
      "WHERE len(string_split(phrase, ' ')) <= 3), " +
      "ws AS (SELECT word, CAST(sum(l) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS ws " +
      "FROM (SELECT unnest(string_split(phrase, ' ')) AS word, " +
      "len(string_split(phrase, ' ')) AS l FROM ph) GROUP BY 1), " +
      "cnt AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences " +
      "FROM ph GROUP BY 1), " +
      "pw AS (SELECT cnt.phrase, cnt.n_occurrences, u.word " +
      "FROM cnt, unnest(string_split(cnt.phrase, ' ')) AS u(word)), " +
      "sc AS (SELECT p.phrase, p.n_occurrences, " +
      "round(CAST(sum(CAST(w.ws AS DECIMAL(28,14))) AS DOUBLE), 6) AS score " +
      "FROM pw p JOIN ws w ON w.word = p.word GROUP BY 1, 2) " +
      "SELECT phrase, n_occurrences, score FROM sc " +
      "ORDER BY score DESC, phrase LIMIT 20"
  }

  /** Mirror of TextAnalysis.qlmTopK (μ=2000, k=5): same hit-postings
    * decomposition — Σ ln(1 + tf/(μ·cf/|C|)) over matching terms plus
    * n_q·ln(μ/(dl+μ)) — with the same DECIMAL(28,14) contribution sums,
    * 6-dp rounding before the rank window, and (score DESC, doc_id)
    * tie order. */
  private def qlmOracle: String = {
    val values = Bm25Queries
      .map { case (id, t) => s"('$id', '$t')" }.mkString(", ")
    val mu = 2000.0.toString   // same double literal the Spark side uses
    s"WITH q(query_id, qtext) AS (VALUES $values), " +
      "qt AS (SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS token FROM q), " +
      "qv AS (SELECT DISTINCT token FROM qt), " +
      "tok AS (SELECT doc_id, len(string_split(text, ' ')) AS dl, " +
      "unnest(string_split(text, ' ')) AS token FROM documents), " +
      "hits AS (SELECT doc_id, dl, token FROM tok JOIN qv USING (token)), " +
      "cf AS (SELECT token, count(*) AS cf FROM hits GROUP BY 1), " +
      "ctot AS (SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS c_len FROM documents), " +
      "nq AS (SELECT query_id, count(*) AS nq FROM qt JOIN cf USING (token) GROUP BY 1), " +
      "tf AS (SELECT doc_id, token, count(*) AS tf, max(dl) AS dl " +
      "FROM hits GROUP BY 1, 2), " +
      "sq AS (SELECT qt.query_id, tf.doc_id, CAST(sum(CAST(" +
      s"round(ln(1.0 + tf.tf::DOUBLE / ($mu * (cf.cf::DOUBLE / ctot.c_len::DOUBLE))), 9) " +
      "AS DECIMAL(28,14))) AS DOUBLE) AS s, max(tf.dl) AS dl " +
      "FROM tf JOIN qt USING (token) JOIN cf USING (token) " +
      "CROSS JOIN ctot GROUP BY 1, 2), " +
      "scored AS (SELECT sq.query_id, doc_id, " +
      s"round(s + nq.nq::DOUBLE * ln($mu / (dl::DOUBLE + $mu)), 6) AS score " +
      "FROM sq JOIN nq USING (query_id)) " +
      "SELECT query_id, doc_id, score, CAST(rn AS BIGINT) AS rank FROM " +
      "(SELECT *, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn FROM scored) " +
      "WHERE rn <= 5 ORDER BY query_id, rank"
  }

  /** Mirror of TextAnalysis.rankBiasedOverlap over the BM25 vs QLM runs:
    * [[bm25Ctes]]' `ranked` beside an l_-prefixed replay of [[qlmOracle]]
    * (shared q/qt/qv/tok/dlen CTEs), then prefix-overlap fan-out and the
    * SAME precomputed IEEE weight literals ([[graft.ops.Sessionize]]'s
    * ewmaWeights stance) with 12-dp term rounds into a DECIMAL sum. */
  private def rboOracle: String = {
    val weights = (1 to 5).map(d => (1 - 0.9) * math.pow(0.9, d - 1))
    val wcase = weights.zipWithIndex
      .map { case (w, i) => s"WHEN g.d = ${i + 1} THEN CAST('$w' AS DOUBLE)" }
      .mkString(" ")
    val mu = 2000.0.toString
    s"WITH $bm25Ctes, " +
      "l_hits AS (SELECT t.doc_id, d.dl, t.token FROM tok t " +
      "JOIN qv USING (token) JOIN dlen d ON d.doc_id = t.doc_id), " +
      "l_cf AS (SELECT token, count(*) AS cf FROM l_hits GROUP BY 1), " +
      "l_ctot AS (SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS c_len FROM documents), " +
      "l_nq AS (SELECT query_id, count(*) AS nq FROM qt JOIN l_cf USING (token) GROUP BY 1), " +
      "l_tf AS (SELECT doc_id, token, count(*) AS tf, max(dl) AS dl " +
      "FROM l_hits GROUP BY 1, 2), " +
      "l_sq AS (SELECT qt.query_id, l_tf.doc_id, CAST(sum(CAST(" +
      s"round(ln(1.0 + l_tf.tf::DOUBLE / ($mu * (l_cf.cf::DOUBLE / l_ctot.c_len::DOUBLE))), 9) " +
      "AS DECIMAL(28,14))) AS DOUBLE) AS s, max(l_tf.dl) AS dl " +
      "FROM l_tf JOIN qt USING (token) JOIN l_cf USING (token) " +
      "CROSS JOIN l_ctot GROUP BY 1, 2), " +
      "l_scored AS (SELECT l_sq.query_id, doc_id, " +
      s"round(s + l_nq.nq::DOUBLE * ln($mu / (dl::DOUBLE + $mu)), 6) AS score " +
      "FROM l_sq JOIN l_nq USING (query_id)), " +
      "l_ranked AS (SELECT *, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn FROM l_scored), " +
      "ra AS (SELECT query_id, doc_id, CAST(rn AS BIGINT) AS r1 FROM ranked WHERE rn <= 5), " +
      "rb AS (SELECT query_id, doc_id, CAST(rn AS BIGINT) AS r2 FROM l_ranked WHERE rn <= 5), " +
      "ov AS (SELECT ra.query_id, greatest(ra.r1, rb.r2) AS m " +
      "FROM ra JOIN rb USING (query_id, doc_id)), " +
      "xd AS (SELECT query_id, d, count(*) AS x FROM ov, " +
      "unnest(generate_series(m, 5)) AS u(d) GROUP BY 1, 2), " +
      "qs AS (SELECT query_id FROM ra UNION SELECT query_id FROM rb), " +
      "gd AS (SELECT query_id, d FROM qs, unnest(generate_series(1, 5)) AS u(d)), " +
      "tm AS (SELECT g.query_id, g.d, coalesce(x.x, 0) AS x, " +
      s"CASE $wcase END AS w " +
      "FROM gd g LEFT JOIN xd x ON g.query_id = x.query_id AND g.d = x.d) " +
      "SELECT query_id, CAST(max(CASE WHEN d = 5 THEN x END) AS BIGINT) AS overlap_at_k, " +
      "round(CAST(sum(CAST(round(w * (CAST(x AS DOUBLE) / CAST(d AS DOUBLE)), 12) " +
      "AS DECIMAL(28,12))) AS DOUBLE), 6) AS rbo " +
      "FROM tm GROUP BY 1 ORDER BY query_id"
  }

  /** Mirror of TextAnalysis.rankingEval over the BM25 run ([[bm25Ctes]]'
    * `ranked`, k=5) with graded relevance = count of distinct query terms
    * in the doc: same 2^rel−1 gains, log2 discounts, DECIMAL(28,14)
    * sums, (rel DESC, doc_id) ideal order, and the 0-not-NULL convention
    * for no-relevant-doc queries. */
  private def rankEvalOracle: String =
    s"WITH $bm25Ctes, " +
      "run AS (SELECT query_id, doc_id, rn AS rank FROM ranked WHERE rn <= 5), " +
      "relv AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS rel " +
      "FROM (SELECT DISTINCT qt.query_id, t.doc_id, t.token " +
      "FROM tok t JOIN qt USING (token)) GROUP BY 1, 2), " +
      "topk AS (SELECT r.query_id, r.doc_id, r.rank, " +
      "coalesce(v.rel, 0) AS rel FROM run r LEFT JOIN relv v " +
      "ON v.query_id = r.query_id AND v.doc_id = r.doc_id), " +
      "dcg AS (SELECT query_id, CAST(sum(CAST(" +
      "round((pow(2.0, rel::DOUBLE) - 1.0) / log2(rank::DOUBLE + 1.0), 9) " +
      "AS DECIMAL(28,14))) AS DOUBLE) AS dcg FROM topk GROUP BY 1), " +
      "ideal AS (SELECT query_id, rel, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY rel DESC, doc_id) AS irank " +
      "FROM relv WHERE rel > 0), " +
      "idcg AS (SELECT query_id, CAST(sum(CAST(" +
      "round((pow(2.0, rel::DOUBLE) - 1.0) / log2(irank::DOUBLE + 1.0), 9) " +
      "AS DECIMAL(28,14))) AS DOUBLE) AS idcg " +
      "FROM ideal WHERE irank <= 5 GROUP BY 1), " +
      "bin AS (SELECT query_id, rank, " +
      "CASE WHEN rel > 0 THEN 1 ELSE 0 END AS hit, " +
      "sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) OVER " +
      "(PARTITION BY query_id ORDER BY rank " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumhits " +
      "FROM topk), " +
      "bs AS (SELECT query_id, CAST(sum(CASE WHEN hit = 1 THEN " +
      "CAST(cumhits::DOUBLE / rank::DOUBLE AS DECIMAL(28,14)) END) " +
      "AS DOUBLE) AS sumprec, " +
      "min(CASE WHEN hit = 1 THEN rank END) AS firsthit " +
      "FROM bin GROUP BY 1), " +
      "rb AS (SELECT query_id, count(*) AS r FROM relv WHERE rel > 0 GROUP BY 1) " +
      "SELECT d.query_id, round(d.dcg, 6) AS dcg, " +
      "round(coalesce(i.idcg, 0.0), 6) AS idcg, " +
      "round(CASE WHEN coalesce(i.idcg, 0.0) > 0 THEN d.dcg / i.idcg " +
      "ELSE 0.0 END, 6) AS ndcg, " +
      "round(CASE WHEN rb.r IS NOT NULL THEN " +
      "coalesce(bs.sumprec, 0.0) / least(rb.r, 5)::DOUBLE " +
      "ELSE 0.0 END, 6) AS ap, " +
      "round(CASE WHEN bs.firsthit IS NOT NULL THEN " +
      "1.0 / bs.firsthit::DOUBLE ELSE 0.0 END, 6) AS rr " +
      "FROM dcg d LEFT JOIN idcg i USING (query_id) " +
      "LEFT JOIN bs USING (query_id) LEFT JOIN rb USING (query_id) " +
      "ORDER BY d.query_id"

  /** Mirror of the q_bh_fdr hypothesis sweep + Stats.bhAdjust: the same
    * per-hour pooled-share z (fixed parenthesization), the same
    * Gaussian-tail surrogate p = exp(−z²/2) computed from the ROUNDED z,
    * and the same step-up reverse running min with (p, hour) tie order. */
  private def bhFdrOracle: String =
    "WITH h AS (SELECT CAST(hour(ts) AS BIGINT) AS hour, " +
      "CAST(count(*) AS BIGINT) AS n, " +
      "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x " +
      "FROM events GROUP BY 1), " +
      "pool AS (SELECT SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::DOUBLE " +
      "/ count(*)::DOUBLE AS p0 FROM events), " +
      "hz AS (SELECT hour, n, x, round((x::DOUBLE / n::DOUBLE - p0) / " +
      "sqrt(p0 * (1.0 - p0) / n::DOUBLE), 6) AS z FROM h CROSS JOIN pool), " +
      "hp AS (SELECT *, round(exp(-0.5 * z * z), 6) AS p FROM hz), " +
      "m AS (SELECT count(*) AS m FROM hp), " +
      "rk AS (SELECT *, CAST(row_number() OVER (ORDER BY p ASC, hour ASC) AS BIGINT) AS rank FROM hp), " +
      "ad AS (SELECT *, round(least(1.0, min(m.m::DOUBLE * p / rank::DOUBLE) " +
      "OVER (ORDER BY rank ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)), 6) AS p_adj " +
      "FROM rk CROSS JOIN m) " +
      "SELECT hour, n, x, z, p, rank, p_adj, p_adj <= 0.05 AS signif " +
      "FROM ad ORDER BY rank"
}
