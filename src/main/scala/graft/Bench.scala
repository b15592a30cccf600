package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main — runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract). The sink is the `noop` format:
  * full pipeline execution, no driver collect, no filesystem write skew.
  */
object Bench {
  // Headliners: one per performance-critical shape — scan+filter, hash agg,
  // pivot+join, multi-join, window, keep-first dedup, minhash, brute ANN,
  // text quality. q9/q10 (appended after the original 8 — BASELINE.md's
  // first table stays comparable) cover the LSH dedup pipeline: the capped
  // band self-join and the full iterative clustering on top of it — the
  // bulk-throughput story whose cost was previously untracked.
  val Headline: Seq[(String, String)] = Seq(
    "q1_pricing" -> "q_agg_pricing",
    "q2_pivot" -> "q_pivot_ratings",
    "q3_multijoin" -> "q_join_multi",
    "q4_window" -> "q_window_running",
    "q5_dedup_first" -> "q_dedup_keep_first",
    "q6_minhash" -> "q_minhash_sig",
    "q7_ann" -> "q_ann_cosine",
    "q8_quality" -> "q_text_quality",
    "q9_lsh_pairs" -> "q_minhash_pairs",
    "q10_clusters" -> "q_dedup_clusters",
    // q11/q12 (round 9): the flagship composites — the full fuzzy-dedup
    // pipeline (LSH → exact-Jaccard verify → CC → canonical) and the
    // multi-table warehouse rollup. Tracked so a regression in the
    // END-TO-END paths can't hide behind stable per-operator numbers.
    "q11_prep_fuzzy" -> "q_llm_prep_fuzzy",
    "q12_warehouse" -> "q_warehouse_flagship",
  )

  /** q13 (round 19): a CPU-dense embarrassingly-parallel scan PROBE whose
    * wall time actually separates 8 from 32 cores at sf0.1 — the existing
    * headliners are ≤ a few seconds and scan/overhead-bound there, so
    * every 8-vs-32 ratio read ≈ 1 and the driver's scaling check flagged
    * `suspect_cpus_ignored` even though the session demonstrably honors
    * `$SPARK_GRAFT_CPUS` (VERDICT r18 item 2 asked for exactly this
    * probe). Shape: one lineitem scan, a bounded ×REPS row amplification,
    * an md5 + base-16 parse per amplified row, one global LONG sum —
    * deterministic (integer sum is order-proof), zero shuffles beyond the
    * single-row aggregation, computed from the parquet inputs on every
    * invocation (nothing cached or precomputed). NOT a declared query —
    * it measures the ENGINE's parallel throughput, not an operator; it is
    * additive to the `queries` map per the bench contract (existing
    * entries unchanged). Sized at ×64 amplification: measured 3.6 s at 32
    * cores vs 9.5 s at 8 — a 2.6× ratio, clearly above host noise —
    * costing ~3.6 s on the 32-core bench total (documented in
    * OPTIMIZATION_r19.md; subtract q13 for a like-for-like total against
    * pre-round-19 artifacts). */
  private[graft] def scanProbe(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"))
      // sf0.1's lineitem is ONE ~50 MB parquet file = one scan task under
      // the default 128 MB split, which would serialize the whole probe
      // (measured 17.9 s on one core) and hide the core count it exists
      // to expose. One cheap round-robin shuffle of the narrow rows
      // spreads the md5 work across exactly the session's cores —
      // derived from the context, never a hard-coded constant.
      .repartition(s.sparkContext.defaultParallelism)
      .withColumn("__r", explode(sequence(lit(1), lit(64))))
      .select(sum(conv(substring(md5(concat_ws(",",
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("__r"))), 1, 15),
        16, 10).cast("long")).alias("probe"))

  /** Bench entries: the declared headliners plus the scaling probe. */
  val Entries: Seq[(String, (SparkSession, String) => DataFrame)] =
    Headline.map { case (label, name) =>
      label -> ((s: SparkSession, d: String) => SparkEntry.queries(name)(s, d))
    } :+ ("q13_scan_probe" -> ((s: SparkSession, d: String) => scanProbe(s, d)))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm pass over every headline query: whole-stage codegen
    // compiles + JIT warm so the timed pass measures steady-state engine
    // throughput (the 100 TB-relevant number), not first-call JIT cost.
    Entries.foreach { case (label, q) =>
      try q(spark, sfDir).write
        .format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[warm] $label: $e") }
    }
    // Three timed passes, min per query: GC pauses and compaction noise on
    // a shared box inflate single samples — the round-3 driver run showed
    // 0.1–0.4 s/query drift on UNCHANGED plans with min-of-2, so one more
    // pass buys the noise floor down (min-of-3 = steady-state cost).
    // Drift-immune metrics alongside wall time (round 18, VERDICT r17
    // #3): wall clock on a shared host swings ±20% at constant plans,
    // so the artifact also carries per-query SCHEDULED-JOB counts (the
    // driver round-trip cost a 1000-executor cluster actually pays) and
    // the CC fixpoint round total for the iterative composites — both
    // bit-stable across hosts at a fixed plan. Counting protocol shared
    // with ProfileQ via graft.JobCount (settled reads outside the timed
    // window, so the listener-bus race can't misattribute a job between
    // adjacent queries and the sleep never pollutes wall time). A query
    // that THROWS records jobs = -1 — a partially-failed run must not
    // read as a genuine plan improvement in the diffed artifact.
    val sc = spark.sparkContext
    TaskCount.ensureRegistered(sc)
    val jobCounts = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val taskCounts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val ccRounds = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def timedPass(record: Boolean): Seq[(String, Double)] =
      Entries.map { case (label, q) =>
        val j0 = if (record) JobCount.settledMaxJobId(sc) else 0
        val k0 = if (record) TaskCount.settledTaskCount else 0L
        graft.ops.ScaleDedup.fixpointRounds.set(0)
        var failed = false
        val t0 = System.nanoTime()
        try q(spark, sfDir).write
          .format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          failed = true
          System.err.println(s"[bench] $label: $e")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        if (record) {
          jobCounts(label) =
            if (failed) -1 else JobCount.settledMaxJobId(sc) - j0
          taskCounts(label) =
            if (failed) -1L else TaskCount.settledTaskCount - k0
          val r = graft.ops.ScaleDedup.fixpointRounds.get()
          if (r > 0 && !failed) ccRounds(label) = r
        }
        label -> dt
      }
    // job/task/round counts are recorded on the LAST pass (steady AQE plans)
    val passes = Seq(timedPass(false), timedPass(false), timedPass(true))
    val results = Entries.indices.map { i =>
      passes.head(i)._1 -> passes.map(_(i)._2).min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val js = jobCounts.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val ts = taskCounts.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val cc = ccRounds.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Label the launch protocol: BASELINE.md records 1.4-1.8x uniform
    // swings between sbt-forked JVMs and raw java on identical code, so
    // round-over-round deltas are only attributable within one protocol.
    // build.sbt stamps -Dgraft.launcher=sbt-fork on forked runs; a bare
    // `java -cp` carries no stamp and reports raw-java.
    val protocol = sys.props.getOrElse("graft.launcher", "raw-java")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"jobs":$js,"tasks":$ts,"cc_rounds":$cc,"sf":"$sfDir","protocol":"$protocol"}""")
    spark.stop()
  }
}
