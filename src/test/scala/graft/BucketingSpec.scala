package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

/** Bucketed layout must make the equi-join on the bucket key shuffle-free
  * and keep results identical to the plain join. */
class BucketingSpec extends AnyFunSuite with SparkSpec with AdaptiveSparkPlanHelper {

  test("join of two same-bucketed tables plans zero shuffles") {
    val o = Tables.orders(spark, sf0).select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables.lineitem(spark, sf0)
      .select(col("l_orderkey").alias("o_orderkey"), col("l_quantity"))
    Bucketing.writeBucketed(o, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(l, "b_lineitem", "o_orderkey", 4)

    val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem",
      Seq("o_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity").alias("q"))

    // force execution so AQE finalizes the plan, then walk it
    joined.write.format("noop").mode("overwrite").save()
    val plan = joined.queryExecution.executedPlan
    val shuffles = collectWithSubqueries(plan) { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty, s"expected shuffle-free plan, got:\n$plan")

    // result identity vs the unbucketed join
    val expect = o.join(l, Seq("o_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity").alias("q"))
      .orderBy("o_orderkey").collect().toSeq
    val got = joined.orderBy("o_orderkey").collect().toSeq
    assert(got === expect)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("persisted IVF index probes shuffle-free and matches the unindexed plan") {
    import graft.ops.Similarity
    val emb = Tables.embeddings(spark, sf0)
    val base = emb.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).alias("v"))
    val centroids = base.orderBy("vec_id").limit(8)
      .select(col("vec_id").alias("cid"), col("v").alias("cv"))
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", centroids,
      "b_ivf_index")
    val q = emb.orderBy("vec_id").limit(1)
      .select(Similarity.asDouble(col("embedding")).alias("qv"))
    val probe = Similarity.ivfTopKIndexed(spark, "b_ivf_index", "vec_id",
      q, k = 20, centroids)
    val got = probe.collect().toSeq
    // corpus side reads the pre-assigned index and flows straight into the
    // broadcast join: zero shuffle exchanges anywhere in the probe plan
    val shuffles = collectWithSubqueries(probe.queryExecution.executedPlan) {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty,
      s"expected shuffle-free probe, got:\n${probe.queryExecution.executedPlan}")
    // result identity vs the assignment-recomputing variant
    val expect = Similarity.ivfTopK(emb, "vec_id", "embedding", q,
      k = 20, nCells = 8).collect().toSeq
    assert(got === expect)
    spark.sql("DROP TABLE IF EXISTS b_ivf_index")
  }

  test("maintained fingerprint table: no exchange on the table side, results match dedupAgainst") {
    import graft.ops.ScaleDedup
    val docs = Tables.documents(spark, sf0)
    val existing = docs.filter(col("source") =!= "src0")
    val batch = docs.filter(col("source") === "src0")
    ScaleDedup.writeFingerprintTable(existing, "text", "b_fp_state")
    // disable broadcast so the anti-join exercises the bucketed SMJ path
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = ScaleDedup.dedupAgainstTable(spark, batch, "doc_id", "text",
        "b_fp_state")
      out.write.format("noop").mode("overwrite").save()
      val plan = out.queryExecution.executedPlan
      val shuffles = collectWithSubqueries(plan) {
        case s: ShuffleExchangeExec => s }
      // the batch side shuffles for its groupBy/join; the table side must
      // NOT — its scan feeds the join through the declared bucketing, so
      // no shuffle reads the fingerprint-table scan
      assert(shuffles.nonEmpty, "expected the batch side to shuffle")
      val tableScanShuffled = shuffles.exists(_.find {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.tableIdentifier.exists(_.table == "b_fp_state")
        case _ => false
      }.isDefined)
      assert(!tableScanShuffled,
        s"fingerprint-table scan must not sit under an exchange:\n$plan")
      // result identity vs the DataFrame-to-DataFrame variant
      val expect = ScaleDedup.dedupAgainst(batch, existing, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      assert(out.orderBy("doc_id").collect().toSeq === expect)
      // absorb the batch's new fingerprints; re-running admits nothing
      ScaleDedup.appendFingerprints(out, "b_fp_state")
      assert(ScaleDedup.dedupAgainstTable(spark, batch, "doc_id", "text",
        "b_fp_state").count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      spark.sql("DROP TABLE IF EXISTS b_fp_state")
    }
  }

  test("incremental IVF append: probe over old∪new matches a full rebuild, stays shuffle-free") {
    import graft.ops.Similarity
    val emb = Tables.embeddings(spark, sf0)
    val centroids = emb.orderBy("vec_id").limit(8)
      .select(col("vec_id").alias("cid"),
        Similarity.asDouble(col("embedding")).alias("cv"))
    // build from the first 80% of ids, append the rest as a late batch
    val cut = emb.selectExpr("percentile(vec_id, 0.8D) p").head().getDouble(0)
    Similarity.writeIvfIndex(emb.filter(col("vec_id") <= cut),
      "vec_id", "embedding", centroids, "b_ivf_inc")
    Similarity.appendToIvfIndex(emb.filter(col("vec_id") > cut),
      "vec_id", "embedding", centroids, "b_ivf_inc")
    val q = emb.orderBy(desc("vec_id")).limit(1)
      .select(Similarity.asDouble(col("embedding")).alias("qv"))
    val probe = Similarity.ivfTopKIndexed(spark, "b_ivf_inc", "vec_id",
      q, k = 20, centroids)
    val got = probe.collect().toSeq
    val shuffles = collectWithSubqueries(probe.queryExecution.executedPlan) {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty,
      s"expected shuffle-free probe after append, got:\n${probe.queryExecution.executedPlan}")
    // identity vs a from-scratch index over the full corpus
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", centroids, "b_ivf_full")
    val expect = Similarity.ivfTopKIndexed(spark, "b_ivf_full", "vec_id",
      q, k = 20, centroids).collect().toSeq
    assert(got === expect)
    spark.sql("DROP TABLE IF EXISTS b_ivf_inc")
    spark.sql("DROP TABLE IF EXISTS b_ivf_full")
  }
}
