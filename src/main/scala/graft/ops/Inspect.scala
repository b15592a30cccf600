package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inspection / sampling / ordering — SURVEY.md §2 I1–I3.
  *
  * Reference: head/tail/sample/dtypes EDA loop
  * (exploratory_data_analysis.ipynb, §3.3).
  */
object Inspect {

  /** I1 — deterministic top-k: orderBy + limit compiles to
    * TakeOrderedAndProject (per-partition top-k, then k-merge on the
    * driver — no global sort even at 100 TB). Tiebreak columns make the
    * result unique. */
  def topK(df: DataFrame, k: Int, order: Seq[Column]): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Top-k WITHIN each group: row_number over (groups, order) filtered to
    * ≤ k. Catalyst rewrites the rank-filter into WindowGroupLimit, so
    * each map task forwards only its local top-k per group — the
    * exchange carries O(groups × k), never the full table (plan-asserted
    * in OpsSpec). `order` must total-order rows within a group or the
    * selection is nondeterministic. */
  def topKPerGroup(df: DataFrame, groups: Seq[String], k: Int,
                   order: Seq[Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groups.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** One-pass table profile: per column — rows, nulls, exact distinct
    * count, numeric min/max (null for non-numerics). The dataset-card
    * shape for relational tables; multiple exact COUNT(DISTINCT)s in one
    * aggregate compile to a single Expand-based pass, so adding a column
    * widens the plan rather than adding a scan. */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val numeric = cols.filter(c => df.schema(c).dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case _ => false
    }).toSet
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).alias(s"__nulls_$c"),
        countDistinct(col(c)).alias(s"__ndv_$c")) ++
        (if (numeric(c))
          Seq(min(col(c)).cast("double").alias(s"__min_$c"),
            max(col(c)).cast("double").alias(s"__max_$c"))
        else Nil)
    } :+ count(lit(1)).alias("__n")
    val agg = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).alias("column"), col("__n").alias("n_rows"),
        col(s"__nulls_$c").alias("n_null"), col(s"__ndv_$c").alias("n_distinct"),
        (if (numeric(c)) col(s"__min_$c") else lit(null).cast("double")).alias("min_v"),
        (if (numeric(c)) col(s"__max_$c") else lit(null).cast("double")).alias("max_v"))
    }
    agg.select(explode(array(rows: _*)).alias("r")).select(col("r.*"))
      .orderBy("column")
  }

  /** I2 — systematic deterministic sample: every row whose key ≡ 0 mod m.
    * Unlike `df.sample`, reproducible across engines (oracle-friendly) and
    * a pure pushed-down filter. */
  def systematicSample(df: DataFrame, keyCol: String, every: Long): DataFrame =
    df.filter(col(keyCol) % every === 0)

  /** I2 — random sample of EXACTLY n rows, seeded (pandas sample(n=5),
    * exploratory_data_analysis.ipynb:1498). rand(seed) is deterministic for
    * a fixed partitioning. */
  def exactRandomSample(df: DataFrame, n: Int, seed: Long = 42L): DataFrame =
    df.orderBy(rand(seed)).limit(n)

  /** I1 — offset+limit "slice" over an explicit order (pandas
    * `raw[3600:3605]`; positional slicing needs an order column in a
    * distributed engine).
    *
    * Planned as sort + OFFSET + LIMIT, which Spark compiles to
    * TakeOrderedAndProject(offset, limit): each partition keeps only its
    * top `end` rows, the driver k-merges and skips `start` — NO
    * single-partition exchange of the table (the previous global
    * row_number window's scale killer). Memory bound is O(end) rows, so
    * this is the right plan for head-region slices (the reference's use);
    * a deep slice (start ~ table size) is inherently a global-sort
    * problem in any engine. */
  def slice(df: DataFrame, order: Seq[Column], start: Long, end: Long): DataFrame = {
    // Spark's OFFSET/LIMIT take Int; a silent Long→Int narrowing would wrap
    // a >2^31 slice to a wrong/negative offset. Fail loudly instead — a
    // deeper slice is a global-sort problem the caller must opt into.
    require(start >= 0 && end >= start && end <= Int.MaxValue,
      s"slice bounds must satisfy 0 <= start <= end <= Int.MaxValue, got [$start, $end)")
    df.orderBy(order: _*).offset(start.toInt).limit((end - start).toInt)
  }

  /** Snapshot diff — the dataset-versioning audit between two corpus
    * versions: per id, 'added' (new only), 'removed' (old only), 'same'
    * (both, identical content fingerprint) or 'changed' (both,
    * different). Both sides reduce to (id, fingerprint) before the
    * full-outer join, so only 128-bit hashes shuffle — text never crosses
    * the wire, and the join is one id-keyed exchange per side at any
    * scale. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).alias("__ofp"))
    val n = newDf.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).alias("__nfp"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__ofp").isNull, lit("added"))
          .when(col("__nfp").isNull, lit("removed"))
          .when(col("__ofp") === col("__nfp"), lit("same"))
          .otherwise(lit("changed")).alias("status"))
  }

  /** Order-independent table checksum — the replication/migration
    * validation primitive: per `groupBy` group (empty = whole table),
    * `n_rows` and a commutative digest of the listed columns. Two copies
    * of a table agree iff every group's (n_rows, checksum) agrees,
    * regardless of row order, partitioning, or engine — so a 100 TB
    * copy validates with one aggregation pass per side and a tiny diff
    * join, instead of a sort-merge of the full tables.
    *
    * Row digest: md5 over the canonical strings joined on \\u0001 (nulls →
    * a \\u0002 sentinel — distinct from the separator, so ("a", null) ≠
    * ("a") and shifted splits like ("ab","c") vs ("a","bc") cannot
    * collide); the first 15 hex digits (60 bits) parse to a long, and
    * SUM as DECIMAL(38,0) is exact — overflow-free for any realistic row
    * count and commutative/associative, so partial aggregation
    * distributes freely. Callers must pass columns whose canonical
    * STRING form is engine-stable (strings, integers, decimals — cast
    * doubles to DECIMAL upstream; float formatting differs across
    * engines). */
  def tableChecksum(df: DataFrame, cols: Seq[String],
                    groupBy: Seq[String] = Nil): DataFrame = {
    val canon = cols.map(c => coalesce(col(c).cast("string"), lit("\u0002")))
    val digest = conv(substring(md5(concat_ws("\u0001", canon: _*)
      .cast("binary")), 1, 15), 16, 10).cast("decimal(38,0)")
    val aggs = Seq(count(lit(1)).alias("n_rows"),
      sum(digest).alias("checksum"))
    if (groupBy.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Skew diagnosis report — the pre-join/pre-agg audit that decides
    * whether a key needs salting or AQE skew handling: the `topN`
    * heaviest keys with count, share of all rows, and ratio to the mean
    * key load (ratio ≈ 1 everywhere → uniform; one key at ratio ≥
    * #partitions → that key alone fills a partition and salting is
    * warranted). One count shuffle (key-cardinality-sized output), the
    * global totals re-aggregate the tiny keyed table and broadcast back;
    * the top-N is TakeOrderedAndProject — no global sort. Shares are
    * 6-dp-rounded doubles (engine-exact at that precision). */
  def skewReport(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).alias("cnt"))
    val totals = counts.agg(sum(col("cnt")).alias("__total"),
      count(lit(1)).alias("__nkeys"))
    counts.crossJoin(broadcast(totals))
      .select(col(keyCol), col("cnt"),
        round(col("cnt") / col("__total").cast("double"), 6).alias("share"),
        round(col("cnt").cast("double") /
          (col("__total").cast("double") / col("__nkeys").cast("double")), 6)
          .alias("ratio_to_avg"))
      .orderBy(col("cnt").desc, col(keyCol))
      .limit(topN)
  }

  /** One skyline elimination pass within each `parts` partition: a row
    * survives unless some row in the same partition has strictly smaller
    * `__sk_min` and ≥ `__sk_max` (range frame ending 1 below the current
    * key), or the same `__sk_min` and strictly larger `__sk_max`. */
  private def skylineKeep(df: DataFrame, parts: Seq[Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val wCheap = w.partitionBy(parts: _*).orderBy(col("__sk_min"))
      .rangeBetween(Long.MinValue, -1)
    val wEq = w.partitionBy(parts :+ col("__sk_min"): _*)
    df.withColumn("__sk_cheap", max(col("__sk_max")).over(wCheap))
      .withColumn("__sk_eq", max(col("__sk_max")).over(wEq))
      .filter((col("__sk_cheap").isNull || col("__sk_cheap") < col("__sk_max")) &&
        col("__sk_eq") <= col("__sk_max"))
      .drop("__sk_cheap", "__sk_eq")
  }

  /** 2D skyline (Pareto frontier): rows not dominated on (minimize
    * `minKey`, maximize `maxVal`) — dominated means another row is ≤ on
    * the min axis and ≥ on the max axis with at least one strict.
    *
    * The naive formulation is a quadratic dominance self-join (the
    * oracle runs exactly that, NOT EXISTS — it defines the answer, it
    * doesn't scale). Here each elimination pass is ONE window over a
    * sort by the min axis: the running max of `maxVal` over strictly
    * cheaper rows decides dominance in O(n log n). Because the skyline
    * operator is distributive over unions — skyline(A ∪ B) ⊆
    * skyline(A) ∪ skyline(B) — a first pass partitioned by a hash bucket
    * prunes everything bucket-locally dominated in parallel, and only
    * the per-bucket survivors (skyline-sized, typically ≪ n) reach the
    * single-partition exact pass. Duplicated points (equal on both axes)
    * dominate nothing and all survive, matching SQL dominance semantics.
    *
    * `minKey` must be an exact integer-valued expression (cast to long —
    * e.g. price in cents): the strict-< window is a range frame ending 1
    * below the current key. */
  def skyline2D(df: DataFrame, minKey: Column, maxVal: Column,
                buckets: Int = 32): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val tagged = df.withColumn("__sk_min", minKey.cast("long"))
      .withColumn("__sk_max", maxVal)
    val local = skylineKeep(
      tagged.withColumn("__sk_b",
        pmod(hash(col("__sk_min"), col("__sk_max")), lit(buckets))),
      Seq(col("__sk_b"))).drop("__sk_b")
    skylineKeep(local, Nil).drop("__sk_min", "__sk_max")
  }
}
