package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the query vector +
  * one scan + TakeOrderedAndProject; linear in corpus size, embarrassingly
  * parallel, the right 100 TB baseline when k is small.
  *
  * Scale path: LSH bucketing via random-hyperplane signatures (signs of
  * dot products with deterministic pseudo-random planes) — candidates
  * share a bucket key, so the search becomes an equi-join on the bucket
  * instead of a full scan per query. An IVF variant would replace the
  * hyperplanes with k-means centroids; same join shape.
  */
object Similarity {

  /** Cast a float array to double (all math in double for determinism).
    * A plain array cast — codegen'd, unlike the `transform` HOF twin
    * (per-element interpreted eval) it replaced in round 19. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product via a sequential left fold — order-deterministic.
    * Compiled kernel (round 19): bit-identical twin of
    * `aggregate(zip_with(a,b,(x,y)=>x*y), 0.0, _+_)`, which as a
    * CodegenFallback HOF paid one interpreted lambda eval per element on
    * every ANN-family corpus scan (VecMathSpec pins the equivalence). */
  def dot(a: Column, b: Column): Column = graft.functions.VecMath.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, rounded to 6 dp (kills last-ulp divergence across
    * engines). */
  def cosine(a: Column, b: Column): Column = round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Brute-force top-k by cosine against ONE query vector (a single-row
    * DataFrame with column `qv`). The query side is broadcast; the plan is
    * scan → project → TakeOrderedAndProject (no shuffle of the corpus). */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     query: DataFrame, k: Int): DataFrame =
    corpus.select(col(idCol), asDouble(col(vecCol)).alias("v"))
      .crossJoin(broadcast(query))
      .select(col(idCol), cosine(col("v"), col("qv")).alias("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)

  /** kNN label prediction — the embedding-space weak-labeler: each probe
    * takes the majority label of its k nearest corpus vectors by cosine
    * (self-matches excluded; ties broken votes-desc then label-asc, so
    * the answer is total-order deterministic). `probes` must be a small
    * (qid, qlabel, qv) DataFrame: it is broadcast, the corpus is scanned
    * ONCE for all probes, and the per-probe top-k plans map-side
    * WindowGroupLimit — the exchange carries each task's local top-k,
    * never the scored cross product. The vote aggregation then runs on
    * probes×k rows (tiny). At 100 TB swap the scan for the IVF index
    * probe (`ivfTopKIndexed`) — the voting tail is unchanged. */
  def knnPredict(corpus: DataFrame, idCol: String, vecCol: String,
                 labelCol: String, probes: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("__sim"), col(idCol))
    val wVote = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("n_votes"), col("pred_label"))
    corpus
      .select(col(idCol), col(labelCol).alias("pred_label"),
        asDouble(col(vecCol)).alias("v"))
      .crossJoin(broadcast(probes))
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col("qlabel"), col(idCol), col("pred_label"),
        cosine(col("v"), col("qv")).alias("__sim"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col("qid"), col("qlabel"), col("pred_label"))
      .agg(count(lit(1)).alias("n_votes"))
      .withColumn("__r", row_number().over(wVote))
      .filter(col("__r") === 1)
      .select(col("qid"), col("qlabel").alias("true_label"),
        col("pred_label"), col("n_votes"))
  }

  /** Hard-negative mining — the contrastive-training data op: for each
    * probe, the k most cosine-similar corpus vectors whose label DIFFERS
    * (the near-misses a contrastive or reranker loss learns most from).
    * Same scale shape as [[knnPredict]]: `probes` (qid, qlabel, qv) is
    * small and broadcast, the corpus is scanned ONCE for all probes, the
    * label-mismatch filter runs before ranking, and the per-probe top-k
    * is a rank window Catalyst plans as map-side WindowGroupLimit — the
    * exchange carries each task's local top-k, never the scored corpus.
    * At 100 TB swap the scan for the IVF index probe and keep the tail.
    * Returns (key, qid, qlabel, vec_id, neg_label, sim) ranked per
    * probe, ties broken by corpus id. */
  def hardNegatives(corpus: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, probes: DataFrame,
                    k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("__sim"), col(idCol))
    corpus
      .select(col(idCol), col(labelCol).alias("neg_label"),
        asDouble(col(vecCol)).alias("v"))
      .crossJoin(broadcast(probes))
      .filter(col(idCol) =!= col("qid") && col("neg_label") =!= col("qlabel"))
      .select(col("qid"), col("qlabel"), col(idCol), col("neg_label"),
        cosine(col("v"), col("qv")).alias("__sim"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(concat(col("qid").cast("string"), lit("_"),
          col(idCol).cast("string")).alias("key"),
        col("qid"), col("qlabel"), col(idCol), col("neg_label"),
        col("__sim").alias("sim"))
  }

  /** Maximal-marginal-relevance diversified top-k — the redundancy-aware
    * retrieval selector (and the diverse-exemplar sampler for training
    * data): greedily pick k items maximizing
    *   λ·rel(i) − (1−λ)·max_{s∈selected} sim(i, s),
    * so near-duplicates of an already-chosen item are penalized out.
    *
    * Scale shape: ONE corpus scan ranks the `poolSize` most relevant
    * candidates (map-side WindowGroupLimit top-k — the [[knnPredict]]
    * stance); everything after runs on the pool (poolSize² pair sims,
    * poolSize ≤ 1024 enforced), so the greedy loop's k argmax rounds are
    * metadata-sized jobs — the driver collects ONE winner row per round
    * (bounded, the BPE-trainer stance), never the pool. rel and pair
    * sims are 6-dp cosines and each round's score re-rounds to 6 dp
    * before the (score desc, id asc) argmax, so the selection path is a
    * deterministic function both engines walk identically. Returns
    * (rank, id, rel, mmr_score); rank 1's score is λ·rel (empty-set
    * penalty 0). */
  def mmrSelect(corpus: DataFrame, idCol: String, vecCol: String,
                query: DataFrame, k: Int, poolSize: Int,
                lambda: Double): DataFrame = {
    require(k >= 1 && poolSize >= k && poolSize <= 1024,
      s"mmrSelect: need 1 <= k <= poolSize <= 1024, got k=$k pool=$poolSize")
    val spark = corpus.sparkSession
    import org.apache.spark.sql.expressions.Window
    val pool = corpus
      .select(col(idCol).alias("id"), asDouble(col(vecCol)).alias("v"))
      .crossJoin(broadcast(query))
      .select(col("id"), col("v"), cosine(col("v"), col("qv")).alias("rel"))
      .orderBy(desc("rel"), col("id"))
      .limit(poolSize)
      .cache()
    val pairs = pool.select(col("id").alias("id1"), col("v").alias("v1"))
      .join(pool.select(col("id").alias("id2"), col("v").alias("v2")),
        col("id1") =!= col("id2"))
      .select(col("id1"), col("id2"),
        cosine(col("v1"), col("v2")).alias("sim"))
      .cache()
    val rel = pool.select(col("id"), col("rel"))
    var selected = Vector.empty[(Long, Double, Double)] // (id, rel, score)
    for (rank <- 1 to k) {
      val selIds = selected.map(_._1)
      val scored =
        if (selIds.isEmpty)
          rel.select(col("id"), col("rel"),
            round(lit(lambda) * col("rel"), 6).alias("score"))
        else
          rel.filter(!col("id").isInCollection(selIds))
            .join(pairs.filter(col("id2").isInCollection(selIds))
              .groupBy(col("id1").alias("id"))
              .agg(max("sim").alias("__mx")), Seq("id"))
            .select(col("id"), col("rel"),
              round(lit(lambda) * col("rel") -
                lit(1.0 - lambda) * col("__mx"), 6).alias("score"))
      val w = scored.orderBy(desc("score"), col("id")).limit(1)
        .collect().head
      selected :+= ((w.getLong(0), w.getDouble(1), w.getDouble(2)))
    }
    pool.unpersist(); pairs.unpersist()
    import spark.implicits._
    selected.zipWithIndex
      .map { case ((id, r, s), i) => (i + 1L, id, r, s) }
      .toDF("rank", "id", "rel", "mmr_score")
  }

  /** Deterministic pseudo-random hyperplane component: unit-free ±1 grid
    * derived from md5 — reproducible everywhere, no RNG state. */
  private[graft] def planeSign(planeIdx: Int, dim: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane_${planeIdx}_$dim".getBytes("UTF-8"))
    if ((h(0) & 1) == 1) 1.0 else -1.0
  }

  /** Random-hyperplane LSH bucket key over `nPlanes` planes: bit i = sign
    * of dot(v, plane_i). Vectors in the same bucket are ANN candidates.
    * `planeOffset` selects an independent plane family — table t of a
    * multi-table index uses offset t·nPlanes (see `lshTopKMultiTable`). */
  def lshBucket(v: Column, dim: Int, nPlanes: Int = 8,
                planeOffset: Int = 0): Column = {
    // Compiled all-planes kernel (round 19): one pass over the vector
    // computes every plane projection and sums the sign bits — the HOF
    // form paid nPlanes interpreted aggregate/zip_with folds per row.
    // Same plane values (planeSign), same fold order, same null→bucket-0
    // and nan-safe `> 0` semantics (VecMathSpec pins the equivalence).
    val planes = new Array[Double](nPlanes * dim)
    for (i <- 0 until nPlanes; d <- 0 until dim)
      planes(i * dim + d) = planeSign(planeOffset + i, d)
    graft.functions.VecMath.lsh_bucket(v, planes, nPlanes, dim)
  }

  /** Squared L2 distance (no sqrt — monotone, cheaper, rank-identical).
    * Compiled kernel twin of the aggregate/zip_with fold (see [[dot]]). */
  def sqDist(a: Column, b: Column): Column =
    graft.functions.VecMath.sq_dist(a, b)

  /** IVF cell assignment: id of the nearest of `centroids` (ties broken by
    * centroid id — deterministic). `centroids` must be a small DataFrame
    * (cid, cv); it is packed into ONE array row and broadcast, and the
    * argmin is a pure array expression — `array_min` over (dist, cid)
    * structs, whose lexicographic ordering IS "smallest distance, then
    * smallest cid". Zero exchanges over the corpus: no replication, no
    * window on the unique id — one narrow codegen'd pass. */
  def ivfAssign(vectors: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame): DataFrame = {
    val packed = centroids.agg(
      collect_list(struct(col("cid"), col("cv"))).alias("__cents"))
    vectors.select(col(idCol), col(vecCol).alias("v"))
      .crossJoin(broadcast(packed))
      // Compiled argmin kernel (round 19): bit-identical twin of
      // array_min(transform(__cents, struct(sqDist(v, cv), cid))) — the
      // HOF pair was interpreted per centroid per element on the single
      // most compute-dense scan of the ANN family (VecMathSpec).
      .withColumn("__best",
        graft.functions.VecMath.nearest_centroid(col("v"), col("__cents")))
      // Empty `centroids` → collect_list yields one empty-array row and
      // array_min returns null; a NULL cell would silently drop/misroute
      // every vector in downstream grouping. Keep the degenerate case loud
      // without a driver-side isEmpty job: raise_error fires lazily, on the
      // executors, only if a null cell is actually produced.
      .select(col(idCol), col("v"),
        when(col("__best").isNull, raise_error(lit(
          "ivfAssign: nearest-centroid cell is null — empty centroids input?")))
          .otherwise(col("__best").getField("cid")).alias("cell"))
  }

  /** Distributed Lloyd k-means for IVF training, fully deterministic:
    * init = first `nCells` vectors by id, then `iters` rounds of
    * assign-to-nearest (the zero-exchange broadcast argmin of `ivfAssign`)
    * followed by a per-cell mean. Each round costs ONE scan of the corpus
    * plus ONE shuffle of (cell, 64 partial sums) — map-side partial
    * aggregation means executors ship one row of decimal sums per cell per
    * task, never vectors. Means go through DECIMAL(28,14) sums (exact, so
    * shuffle order can't flip low bits) and are rounded to 9 dp — both
    * properties are what make the training REPRODUCIBLE across engines
    * and cluster sizes, which a float-sum k-means is not.
    *
    * A cell that captures no vectors disappears (its centroid had no
    * mean) — standard Lloyd behavior; the cell count can only shrink,
    * and `ivfAssign`'s empty-centroid guard still fires if ALL vanish.
    * `vectors` must expose `idCol` and a double-array `vecCol`.
    *
    * Lineage is truncated per round (round 18): each round nests a
    * `dim`-column DECIMAL aggregation and a broadcast argmin over the
    * previous round's plan, and most consumers reference the trained
    * table several times (assign + pack + report joins) — un-truncated,
    * the composite callers' plans ran to thousands of operators and the
    * OPTIMIZER, not the 500-row fixture compute, was ~all of their
    * wall time (q_cluster_quality ~4.5 s steady at sf0.01, ~5 s of it
    * planning). The checkpointed table is ≤ nCells rows — metadata-
    * sized — so truncation is effectively free at any scale. */
  def kmeansCentroids(vectors: DataFrame, idCol: String, vecCol: String,
                      nCells: Int, iters: Int, dim: Int): DataFrame = {
    val ckpt = Iterate.checkpointer(vectors.sparkSession.sparkContext)
    val base = vectors.select(col(idCol).alias("__id"), col(vecCol).alias("v"))
    var centroids = base.orderBy("__id").limit(nCells)
      .select(col("__id").alias("cid"), col("v").alias("cv"))
    for (_ <- 1 to iters) {
      val assigned = ivfAssign(base, "__id", "v", centroids)
      val sums = (0 until dim).map(i =>
        sum(col("v").getItem(i).cast("decimal(28,14)")).alias(s"__s_$i"))
      val agged = assigned.groupBy(col("cell"))
        .agg(count(lit(1)).alias("__n"), sums: _*)
      centroids = ckpt(agged.select(col("cell").alias("cid"),
        array((0 until dim).map(i =>
          round(col(s"__s_$i").cast("double") / col("__n"), 9)): _*).alias("cv")))
    }
    centroids
  }

  /** IVF ANN against a caller-supplied centroid table (cid, cv): corpus
    * vectors are assigned to their nearest centroid's cell; a query probes
    * only its own cell — the search becomes an equi-join on `cell` instead
    * of a full scan, the same join shape as LSH but with data-dependent
    * (centroid) partitioning. */
  def ivfTopKWithCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                           query: DataFrame, k: Int,
                           centroids: DataFrame): DataFrame = {
    val base = corpus.select(col(idCol), asDouble(col(vecCol)).alias("v"))
    val assigned = ivfAssign(base, idCol, "v", centroids)
    val q = ivfAssign(
      query.select(lit(-1L).alias("__qid"), col("qv")), "__qid", "qv", centroids)
      .select(col("v").alias("qv"), col("cell"))
    assigned.join(broadcast(q), Seq("cell"))
      .select(col(idCol), cosine(col("v"), col("qv")).alias("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** IVF ANN with DETERMINISTIC first-n "training" — the first `nCells`
    * vectors by id serve as centroids (see `ivfTopKKMeans` for the
    * Lloyd-trained index; the query dataflow is identical). */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              query: DataFrame, k: Int, nCells: Int = 8): DataFrame = {
    val base = corpus.select(col(idCol), asDouble(col(vecCol)).alias("v"))
    val centroids = base.orderBy(idCol).limit(nCells)
      .select(col(idCol).alias("cid"), col("v").alias("cv"))
    ivfTopKWithCentroids(corpus, idCol, vecCol, query, k, centroids)
  }

  /** IVF ANN with Lloyd-trained centroids: `iters` k-means rounds over the
    * corpus (see `kmeansCentroids`), then the standard cell equi-join.
    * Same query shape as `ivfTopK`; the index quality is what improves —
    * centroids move to the data's actual density modes instead of being
    * whatever the first `nCells` rows happened to hold. */
  def ivfTopKKMeans(corpus: DataFrame, idCol: String, vecCol: String,
                    query: DataFrame, k: Int, nCells: Int, iters: Int,
                    dim: Int): DataFrame = {
    val base = corpus.select(col(idCol), asDouble(col(vecCol)).alias("v"))
    val centroids = kmeansCentroids(base, idCol, "v", nCells, iters, dim)
    ivfTopKWithCentroids(corpus, idCol, vecCol, query, k, centroids)
  }

  /** Persist an IVF index: assign every corpus vector to its centroid
    * cell ONCE and write (id, v, cell) as a parquet table bucketed (and
    * sorted) by cell — the index-survives-queries layout a real vector
    * store needs. At 100 TB the assignment argmin over the whole corpus
    * is the expensive pass; persisting it means each subsequent query
    * pays only its own broadcast probe, and the bucketed layout keeps
    * any future cell-keyed join/aggregation over the index shuffle-free
    * (the write pays the one exchange). */
  def writeIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame, table: String,
                    buckets: Int = 8): Unit = {
    val base = corpus.select(col(idCol), asDouble(col(vecCol)).alias("v"))
    graft.sources.Bucketing.writeBucketed(
      ivfAssign(base, idCol, "v", centroids), table, "cell", buckets)
  }

  /** Persist trained centroids as a (cid, cv) parquet model artifact —
    * the train-once / probe-everywhere loop (the `saveBpeMerges` analog
    * for the vector side; an IVF index is only usable with the exact
    * centroids it was built with, so they must travel together). */
  def saveCentroids(centroids: DataFrame, path: String): Unit =
    centroids.select(col("cid"), col("cv"))
      .repartition(1).write.mode("overwrite").parquet(path)

  /** Load a persisted centroid artifact (see `saveCentroids`). */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame =
    spark.read.parquet(path).select(col("cid"), col("cv"))

  /** Incrementally grow a persisted IVF index: assign ONLY the new batch
    * against the trained centroids (broadcast argmin, no existing-corpus
    * touch) and append it through the table's declared bucket layout —
    * the index absorbs arriving vectors at batch-sized cost, existing
    * rows never move, and `ivfTopKIndexed` probes stay shuffle-free.
    * Re-train centroids only when drift warrants a full rebuild. */
  def appendToIvfIndex(batch: DataFrame, idCol: String, vecCol: String,
                       centroids: DataFrame, table: String): Unit = {
    val base = batch.select(col(idCol), asDouble(col(vecCol)).alias("v"))
    graft.sources.Bucketing.appendBucketed(
      ivfAssign(base, idCol, "v", centroids), table)
  }

  /** Probe a persisted IVF index (see `writeIvfIndex`): the corpus side
    * is READ pre-assigned — no argmin recompute, no shuffle (the probe
    * side broadcasts, so the index scan flows straight into the join;
    * spec asserts the plan carries zero shuffle exchanges). Must be
    * probed with the SAME centroid table the index was built with. */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, table: String,
                     idCol: String, query: DataFrame, k: Int,
                     centroids: DataFrame): DataFrame = {
    val assigned = spark.table(table)
    val q = ivfAssign(
      query.select(lit(-1L).alias("__qid"), col("qv")), "__qid", "qv", centroids)
      .select(col("v").alias("qv"), col("cell"))
    assigned.join(broadcast(q), Seq("cell"))
      .select(col(idCol), cosine(col("v"), col("qv")).alias("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** IVF multi-probe ANN: the query probes its `nProbe` NEAREST cells
    * instead of only the argmin cell — the standard IVF recall lever
    * (recall lost at cell boundaries is recovered by probing the runner-up
    * centroids). The probe list is computed on the (single-row, broadcast)
    * query side: sort the (dist, cid) struct array, slice the first
    * `nProbe`, explode — the corpus is still assigned and scanned exactly
    * once, and the search stays an equi-join on `cell` with query-side
    * fan-out bounded at nProbe. Cells are distinct, so no candidate dedup
    * is needed. Recall superset of `ivfTopK` whenever its cell has < k
    * hits. */
  def ivfTopKMultiProbe(corpus: DataFrame, idCol: String, vecCol: String,
                        query: DataFrame, k: Int, nCells: Int = 8,
                        nProbe: Int = 2): DataFrame = {
    val base = corpus.select(col(idCol), asDouble(col(vecCol)).alias("v"))
    val centroids = base.orderBy(idCol).limit(nCells)
      .select(col(idCol).alias("cid"), col("v").alias("cv"))
    ivfTopKMultiProbeWithCentroids(corpus, idCol, vecCol, query, k,
      centroids, nProbe)
  }

  /** Multi-probe IVF against caller-supplied centroids — combine with
    * `kmeansCentroids` for the trained-index + recall-lever pairing
    * (measured the best ANN recall of every variant on the fixture). */
  def ivfTopKMultiProbeWithCentroids(corpus: DataFrame, idCol: String,
                                     vecCol: String, query: DataFrame, k: Int,
                                     centroids: DataFrame,
                                     nProbe: Int): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val base = corpus.select(col(idCol), asDouble(col(vecCol)).alias("v"))
    val assigned = ivfAssign(base, idCol, "v", centroids)
    val packed = centroids.agg(
      collect_list(struct(col("cid"), col("cv"))).alias("__cents"))
    val q = query.crossJoin(broadcast(packed))
      .withColumn("__ranked", array_sort(transform(col("__cents"),
        c => struct(sqDist(col("qv"), c.getField("cv")).alias("d"),
          c.getField("cid").alias("cid")))))
      .withColumn("cell", explode(transform(
        slice(col("__ranked"), 1, nProbe), s => s.getField("cid"))))
      .select(col("qv"), col("cell"))
    assigned.join(broadcast(q), Seq("cell"))
      .select(col(idCol), cosine(col("v"), col("qv")).alias("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** LSH-bucketed ANN: only compare vectors sharing the query's bucket.
    * Returns top-k within the bucket (a recall/latency tradeoff — see
    * `lshTopKMultiProbe` for the standard recall extension). */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              query: DataFrame, dim: Int, k: Int, nPlanes: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol), asDouble(col(vecCol)).alias("v"))
      .withColumn("bucket", lshBucket(col("v"), dim, nPlanes))
    val q = query.withColumn("qbucket", lshBucket(col("qv"), dim, nPlanes))
    c.join(broadcast(q), col("bucket") === col("qbucket"))
      .select(col(idCol), cosine(col("v"), col("qv")).alias("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Multi-TABLE LSH ANN — the standard recall lever when single-table
    * hyperplane LSH starves (measured 0.05–0.10 recall@20 on the fixture:
    * 8 planes over 500 vectors leaves near-singleton buckets): L
    * independent tables of FEWER planes each (coarser buckets), candidates
    * unioned across tables. Recall ≈ 1 − (1 − p^planes)^tables rises
    * steeply with L while per-table selectivity keeps candidate counts
    * bounded. The corpus is scanned ONCE; each vector fans out to exactly
    * `nTables` (table, bucket) rows — bounded ×L, no all-pairs anywhere —
    * and the join stays a broadcast equi-join on (table, bucket). A
    * candidate matching in several tables is deduplicated by id before
    * top-k (same cosine either way). */
  def lshTopKMultiTable(corpus: DataFrame, idCol: String, vecCol: String,
                        query: DataFrame, dim: Int, k: Int,
                        nPlanes: Int = 4, nTables: Int = 4): DataFrame = {
    require(nTables >= 1, s"nTables must be >= 1, got $nTables")
    def tableKeys(v: Column) = explode(array((0 until nTables).map(t =>
      struct(lit(t).alias("tbl"),
        lshBucket(v, dim, nPlanes, t * nPlanes).alias("bkt"))): _*))
    val c = corpus.select(col(idCol), asDouble(col(vecCol)).alias("v"))
      .withColumn("__tb", tableKeys(col("v")))
      .select(col(idCol), col("v"),
        col("__tb.tbl").alias("tbl"), col("__tb.bkt").alias("bkt"))
    val q = query.withColumn("__tb", tableKeys(col("qv")))
      .select(col("qv"), col("__tb.tbl").alias("tbl"), col("__tb.bkt").alias("bkt"))
    c.join(broadcast(q), Seq("tbl", "bkt"))
      .select(col(idCol), cosine(col("v"), col("qv")).alias("cos"))
      .distinct()
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Multi-probe LSH ANN: probe the query's bucket PLUS each Hamming-1
    * neighbor (one plane bit flipped) — the standard recall extension for
    * hyperplane LSH, since near neighbors most often differ on exactly one
    * marginal plane. The probe list is exploded on the QUERY side (tiny,
    * broadcast), so the corpus still sees a single equi-join on `bucket`
    * with fan-out bounded at nPlanes+1 probe keys; the corpus is scanned
    * and bucketed exactly once, same as `lshTopK`. Probe keys are pairwise
    * distinct and each corpus vector has exactly one bucket, so no
    * candidate dedup is needed. The result is a recall superset of
    * `lshTopK` at the same k whenever the exact-bucket hits are < k. */
  def lshTopKMultiProbe(corpus: DataFrame, idCol: String, vecCol: String,
                        query: DataFrame, dim: Int, k: Int,
                        nPlanes: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol), asDouble(col(vecCol)).alias("v"))
      .withColumn("bucket", lshBucket(col("v"), dim, nPlanes))
    val probes = col("qbucket") +:
      (0 until nPlanes).map(p => col("qbucket").bitwiseXOR(lit(1L << p)))
    val q = query.withColumn("qbucket", lshBucket(col("qv"), dim, nPlanes))
      .withColumn("probe", explode(array(probes: _*)))
    c.join(broadcast(q), col("bucket") === col("probe"))
      .select(col(idCol), cosine(col("v"), col("qv")).alias("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** SemDeDup — semantic near-duplicate pruning over an embedding column
    * (the embedding-space analog of MinHash dedup, after the published
    * SemDeDup recipe): assign every vector to its nearest centroid (the
    * zero-exchange broadcast argmin of `ivfAssign`), generate candidate
    * pairs only WITHIN a cell, and drop every vector that has a lower-id
    * neighbor at cosine ≥ tau. Keep-lowest-id is deterministic and
    * pairwise (a chain a~b~c with cos(a,c) < tau keeps a and c — the
    * per-cluster greedy sweep, not connected components; LSH→CC dedup
    * lives in ScaleDedup for the transitive variant).
    *
    * Scale: the pair step is an equi-join on `cell`, never all-pairs —
    * cost Σ|cell|², controlled by nCells (the reference recipe runs
    * k ≈ √N clusters). A cell above `maxCell` fails LOUDLY (raise_error
    * on the executors, no driver job) instead of silently absorbing a
    * quadratic blow-up: raise nCells and retrain. Norms are hoisted and
    * computed once per row, not per pair; cosines compare 6-dp-rounded
    * so the tau boundary is engine-exact.
    *
    * Returns the survivor set (idCol, cell). `centroids` = (cid, cv),
    * typically `kmeansCentroids` output. */
  def semDedup(vectors: DataFrame, idCol: String, vecCol: String,
               centroids: DataFrame, tau: Double,
               maxCell: Int = 4096): DataFrame = {
    val assigned = ivfAssign(vectors, idCol, vecCol, centroids)
    val counts = assigned.groupBy("cell").agg(count(lit(1)).alias("__cn"))
    val guarded = assigned.join(broadcast(counts), "cell")
      .select(col("cell"), col(idCol), col("v"),
        when(col("__cn") > maxCell, raise_error(concat(
          lit("semDedup: cell "), col("cell").cast("string"),
          lit(s" exceeds maxCell=$maxCell vectors - raise nCells"))))
          .otherwise(norm(col("v"))).alias("__n"))
    val a = guarded.select(col("cell"), col(idCol).alias("__id1"),
      col("v").alias("__v1"), col("__n").alias("__n1"))
    val b = guarded.select(col("cell"), col(idCol).alias("__id2"),
      col("v").alias("__v2"), col("__n").alias("__n2"))
    val drops = a.join(b, Seq("cell"))
      .filter(col("__id1") < col("__id2"))
      .filter(round(dot(col("__v1"), col("__v2")) /
        (col("__n1") * col("__n2")), 6) >= tau)
      .select(col("__id2").alias(idCol)).distinct()
    assigned.join(drops, Seq(idCol), "left_anti")
      .select(col(idCol), col("cell"))
  }

  /** Per-group embedding corpus diagnostics — the drift/anisotropy
    * profile a pretraining pipeline watches per source or per cluster:
    * n_vecs, mean L2 norm, the group centroid's norm, and the mean
    * cosine of each vector to its group centroid (high values = the
    * group points one way — the anisotropy that sinks cosine retrieval).
    * Two passes, both narrow: (1) a posexplode → (grp, dim) grouped
    * DECIMAL sum builds the centroid table (groups × dim rows —
    * metadata-sized, then broadcast); (2) one more scan computes
    * row-local norms/cosines against the broadcast centroid and
    * DECIMAL-sums them per group. Vectors never shuffle; only the
    * exploded (grp, dim, x) triples do, with map-side partial
    * aggregation collapsing them to groups × dim cells per task.
    * Determinism: centroid dims round to 9 dp off an exact DECIMAL sum;
    * per-row norm rounds to 9 dp and cosine to 6 dp before their own
    * DECIMAL mean — shuffle order cannot flip a bit ([[kmeansCentroids]]
    * stance). dot/cosine fold the array in element order on both
    * engines. */
  def embeddingProfile(emb: DataFrame, vecCol: String,
                       groupCol: String): DataFrame = {
    val v = emb.select(col(groupCol).alias("grp"),
      asDouble(col(vecCol)).alias("__v"))
    val cent = v
      .select(col("grp"), posexplode(col("__v")).as(Seq("__p", "__x")))
      .groupBy("grp", "__p")
      .agg(round(sum(col("__x").cast("decimal(28,12)")).cast("double") /
        count(lit(1)), 9).alias("__c"))
    val carr = cent.groupBy("grp")
      .agg(array_sort(collect_list(struct(col("__p"), col("__c"))))
        .alias("__s"))
      .select(col("grp"),
        transform(col("__s"), s => s.getField("__c")).alias("__cv"))
    v.join(broadcast(carr), "grp")
      .select(col("grp"),
        round(norm(col("__v")), 9).alias("__nrm"),
        // zero-norm guard: an all-zero vector or a perfectly-cancelling
        // centroid makes the ratio 0/0 — Spark (non-ANSI) says NULL,
        // DuckDB says NaN; pin the degenerate cosine to 0 on both sides
        when(dot(col("__v"), col("__v")) === 0 ||
            dot(col("__cv"), col("__cv")) === 0, lit(0.0))
          .otherwise(round(dot(col("__v"), col("__cv")) /
            (norm(col("__v")) * norm(col("__cv"))), 6)).alias("__cos"),
        round(norm(col("__cv")), 6).alias("__cnrm"))
      .groupBy("grp")
      .agg(count(lit(1)).alias("n_vecs"),
        round(sum(col("__nrm").cast("decimal(28,9)")).cast("double") /
          count(lit(1)), 6).alias("mean_norm"),
        first(col("__cnrm")).alias("centroid_norm"),
        round(sum(col("__cos").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).alias("mean_cos_centroid"))
      .orderBy("grp")
  }

  /** Embedding-space dispersion per group: the EXACT mean of all
    * n·(n−1) ordered pairwise cosines, computed WITHOUT the pairwise
    * join via the resultant-vector identity
    *   Σ_{i≠j} v̂ᵢ·v̂ⱼ = ‖Σᵢ v̂ᵢ‖² − n        (v̂ = v/‖v‖)
    * so mean_pairwise_cos = (‖S‖² − n)/(n·(n−1)) — the embedding-
    * collapse diagnostic (a healthy space sits near 0; a collapsed or
    * anisotropy-dominated one drifts toward 1) that a naive
    * implementation pays O(n²) for and this one pays one corpus pass.
    * Also reports the mean resultant norm ‖S‖/n (directional
    * concentration, the circular-statistics readout) and the mean raw
    * norm. Scale shape: vectors never shuffle — only exploded
    * (grp, dim, x̂) triples do, map-side-combined to groups × dim cells;
    * everything after is group-count-sized. Determinism: the per-dim
    * resultant sums and the ‖S‖² reduction accumulate in DECIMAL; the
    * normalization fold is element-order identical on both engines
    * ([[embeddingProfile]] stance). Zero-norm vectors are excluded (they
    * have no direction); singleton groups pin the pairwise mean to NULL
    * identically on both engines. */
  def dispersionReport(emb: DataFrame, vecCol: String,
                       groupCol: String): DataFrame = {
    val v = emb.select(col(groupCol).alias("grp"),
        asDouble(col(vecCol)).alias("__v"))
      .filter(dot(col("__v"), col("__v")) > 0)
      .select(col("grp"),
        round(norm(col("__v")), 9).alias("__nrm"),
        // Compiled normalize kernel (round 19): the transform lambda
        // re-evaluated the interpreted dot fold per ELEMENT — O(dim²)
        // per row; the kernel is the O(dim) bit-identical twin
        // (divide-by-zero-norm → null elements, as Spark's Divide).
        graft.functions.VecMath.l2_normalize(col("__v")).alias("__vh"))
    val res = v
      .select(col("grp"), col("__nrm"),
        posexplode(col("__vh")).as(Seq("__p", "__xh")))
      .groupBy("grp", "__p")
      .agg(sum(col("__xh").cast("decimal(28,14)")).cast("double").alias("__s"))
      .groupBy("grp")
      .agg(sum((col("__s") * col("__s")).cast("decimal(28,14)"))
        .cast("double").alias("__ssq"))
    val cnt = v.groupBy("grp")
      .agg(count(lit(1)).alias("n_vecs"),
        round(sum(col("__nrm").cast("decimal(28,9)")).cast("double") /
          count(lit(1)), 6).alias("mean_norm"))
    val n = col("n_vecs").cast("double")
    cnt.join(res, "grp")
      .select(col("grp"), col("n_vecs"), col("mean_norm"),
        when(col("n_vecs") < 2, lit(null).cast("double"))
          .otherwise(round((col("__ssq") - n) / (n * (n - lit(1.0))), 6))
          .alias("mean_pairwise_cos"),
        round(sqrt(col("__ssq")) / n, 6).alias("mean_resultant_norm"))
      .orderBy("grp")
  }

  /** Cluster-quality report over the deterministic [[kmeansCentroids]]
    * partition: per cell, the simplified (centroid-based) silhouette
    *   s = (b − a) / max(a, b)   (a = dist to own centroid, b = dist to
    * nearest OTHER centroid — Vendramin et al.'s simplified variant,
    * O(n·k) where the classic pairwise silhouette is O(n²)), the
    * intra-cluster dispersion, and the Davies–Bouldin component
    * max_{j≠i}(s_i + s_j)/d_ij. The partition-quality gate in front of
    * the IVF index build: a cell with silhouette ≈ 0 and a fat DB
    * component is a boundary-straddling cell that will leak recall at
    * probe time. Scale shape: centroids broadcast (k rows); a and b are
    * row-local argmins off the scan; per-cell rollups are k-sized; the
    * DB cross join is k². Determinism: per-row readouts round before
    * their DECIMAL means ([[embeddingProfile]] stance); centroid
    * coordinates are already 9-dp-pinned. */
  def clusterQualityReport(emb: DataFrame, idCol: String, vecCol: String,
                           nCells: Int, iters: Int, dim: Int): DataFrame = {
    val base = emb.select(col(idCol).alias("__id"),
        asDouble(col(vecCol)).alias("v"))
      .filter(size(col("v")) === dim)
    val centroids = kmeansCentroids(base, "__id", "v", nCells, iters, dim)
    val assigned = ivfAssign(base, "__id", "v", centroids)
    val packed = centroids.agg(
      collect_list(struct(col("cid"), col("cv"))).alias("__cents"))
    // Compiled one-pass own/nearest-other kernel (round 19): twin of the
    // filter/element_at + array_min(transform) HOF pair, which was
    // interpreted per centroid per element — and evaluated SIX times per
    // row (a and b appear in sil twice each plus the readouts). The
    // kernel runs once per row behind a named column (VecMathSpec).
    val a = sqrt(col("__oo").getField("own_sq"))
    val b = sqrt(col("__oo").getField("other_sq"))
    val sil = when(greatest(a, b) === 0.0, lit(0.0))
      .otherwise(round((b - a) / greatest(a, b), 6))
    val per = assigned.crossJoin(broadcast(packed))
      .withColumn("__oo", graft.functions.VecMath.own_other_sqdist(
        col("v"), col("__cents"), col("cell")))
      .select(col("cell"), sil.alias("__s"), round(a, 9).alias("__a"))
      .groupBy("cell")
      .agg(count(lit(1)).alias("n_vecs"),
        round(sum(col("__s").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).alias("mean_silhouette"),
        round(sum(col("__a").cast("decimal(28,9)")).cast("double") /
          count(lit(1)), 9).alias("__si"))
    val cj = per.select(col("cell"), col("__si"))
      .join(centroids.select(col("cid").alias("cell"), col("cv")), "cell")
    val db = cj.select(col("cell"), col("__si").alias("__s1"),
        col("cv").alias("__c1"))
      .join(cj.select(col("cell").alias("__o"), col("__si").alias("__s2"),
        col("cv").alias("__c2")), col("cell") =!= col("__o"))
      .groupBy("cell")
      .agg(round(max((col("__s1") + col("__s2")) /
        sqrt(sqDist(col("__c1"), col("__c2")))), 6).alias("db_component"))
    per.join(db, Seq("cell"), "left")
      .select(col("cell"), col("n_vecs"), col("mean_silhouette"),
        round(col("__si"), 6).alias("dispersion"), col("db_component"))
      .orderBy("cell")
  }

  /** Symmetric int8 quantization distortion report — "can we store the
    * embedding index at 4× compression": per-dimension absmax scales
    * s_j = max|x_j|/127, quantize-dequantize q = clamp(round(x/s)), and
    * per group report the mean original-vs-dequantized cosine plus the
    * global per-element mean absolute error — the measured go/no-go for
    * int8 ANN serving ([[pqTopK]]'s codebook path is the 8×/16×
    * alternative when this number is too lossy). Scale shape: one
    * posexplode aggregation for the 64-row scale table (broadcast back
    * as an array via the [[embeddingProfile]] sort-collect idiom), the
    * quantize-dequantize is a row-local zip (vectors never shuffle),
    * and both readouts are group-count-sized DECIMAL means of
    * per-row/per-element rounded values. Zero-scale dimensions (the
    * whole corpus is 0 there) dequantize to an exact 0; a vector that
    * quantizes to all-zero pins its cosine to 0 (the zero-norm stance). */
  def quantizationReport(emb: DataFrame, vecCol: String, groupCol: String,
                         dim: Int = 64): DataFrame = {
    require(dim >= 1 && dim <= 4096, s"quantizationReport: bad dim $dim")
    val base = emb.select(col(groupCol).alias("grp"),
        asDouble(col(vecCol)).alias("__v"))
      .filter(size(col("__v")) === dim && dot(col("__v"), col("__v")) > 0)
    val scales = base
      .select(posexplode(col("__v")).as(Seq("__p", "__x")))
      .groupBy("__p").agg((max(abs(col("__x"))) / lit(127.0)).alias("__s"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("__p"), col("__s"))))
        .alias("__ss"))
      .select(transform(col("__ss"), s => s.getField("__s")).alias("__sv"))
    // Compiled quantize/dequantize kernel (round 19): twin of the
    // zip_with when/round/least/greatest map, which was interpreted per
    // element on the corpus scan (VecMathSpec pins the equivalence).
    val withQ = base.crossJoin(broadcast(scales))
      .select(col("grp"), col("__v"),
        graft.functions.VecMath.quant_dequant(col("__v"), col("__sv"))
          .alias("__q"))
    val cosRow = when(dot(col("__q"), col("__q")) === 0, lit(0.0))
      .otherwise(round(dot(col("__v"), col("__q")) /
        (norm(col("__v")) * norm(col("__q"))), 6))
    val perGrp = withQ.select(col("grp"), cosRow.alias("__c"))
      .groupBy("grp")
      .agg(count(lit(1)).alias("n_vecs"),
        round(sum(col("__c").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).alias("mean_cos_quant"))
    val err = withQ
      .select(col("grp"), explode(arrays_zip(col("__v"), col("__q"))).alias("__e"))
      .groupBy("grp")
      .agg(round(sum(abs(col("__e.__v") - col("__e.__q"))
          .cast("decimal(28,14)")).cast("double") /
        count(lit(1)).cast("double"), 6).alias("mean_abs_err"))
    perGrp.join(err, "grp").orderBy("grp")
  }

  /** Empirical covariance of an embedding column as a (i, j, c) matrix
    * table, computed in ONE corpus pass: C(i,j) = Σxᵢxⱼ/n − μᵢμⱼ, with
    * both the cross-product and the mean sums accumulated as
    * DECIMAL(28,14) (shuffle order cannot flip low bits — the
    * `kmeansCentroids` determinism stance). Shape: each row expands to
    * its dim·(dim+1)/2 UPPER-TRIANGLE (i ≤ j) terms — the matrix is
    * symmetric, so the lower triangle is mirrored from the aggregated
    * dim²-sized table instead of being generated per row (halves the
    * fan-out, the dominant cost) — which partial-aggregate map-side down
    * to triangle-count cells per task BEFORE the one shuffle — vectors
    * never cross the wire, only the dim²-sized partial sums. The matrix
    * table is metadata-sized (dim² rows) by construction. */
  def covarianceMatrix(emb: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1 && dim <= 512, s"covarianceMatrix: bad dim $dim")
    val base = emb.select(asDouble(col(vecCol)).alias("__v"))
      .filter(size(col("__v")) === dim)
    val n = base.count()
    require(n > 0, "covarianceMatrix: empty corpus")
    val upper = base
      .select(col("__v"), posexplode(col("__v")).as(Seq("i", "xi")))
      // slice is 1-based: element i (0-based) starts the j >= i tail
      .select(col("i"), col("xi"),
        posexplode(slice(col("__v"), col("i") + 1, lit(dim) - col("i")))
          .as(Seq("j0", "xj")))
      .select(col("i"), (col("i") + col("j0")).alias("j"),
        col("xi"), col("xj"))
      .groupBy("i", "j")
      .agg(sum((col("xi") * col("xj")).cast("decimal(28,14)")).alias("__sxx"))
    val sums = upper.unionByName(
      upper.filter(col("i") < col("j"))
        .select(col("j").alias("i"), col("i").alias("j"), col("__sxx")))
    val mu = base
      .select(posexplode(col("__v")).as(Seq("i", "xi")))
      .groupBy("i")
      .agg(sum(col("xi").cast("decimal(28,14)")).cast("double").alias("__si"))
    sums
      .join(mu.select(col("i"), col("__si").alias("__sa")), "i")
      .join(mu.select(col("i").alias("j"), col("__si").alias("__sb")), "j")
      .select(col("i"), col("j"),
        (col("__sxx").cast("double") / lit(n.toDouble) -
          (col("__sa") / lit(n.toDouble)) * (col("__sb") / lit(n.toDouble)))
          .alias("c"))
  }

  /** Principal component by power iteration over the covariance table:
    * v ← round(Cv / ‖Cv‖, 9) for `iters` rounds from the uniform start
    * 1/√dim (9-dp rounded so both engines share the literal). Every
    * matrix-vector product is a join of the dim²-row matrix with the
    * dim-row vector — metadata-sized work after the single covariance
    * pass — with DECIMAL(28,14) contribution sums, so the whole
    * iteration chain is reproducible bit-for-bit on any engine or
    * partitioning (the `pagerank` determinism pattern). Fixed `iters`
    * keeps the op a finite declarative plan; the sign of the result is
    * itself deterministic because every engine runs the identical
    * arithmetic from the identical start. Returns (dim_idx, loading),
    * 6-dp. */
  def pcaPowerIteration(emb: DataFrame, vecCol: String, dim: Int,
                        iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 32, s"pcaPowerIteration: bad iters $iters")
    val spark = emb.sparkSession
    // Lineage control (Iterate.checkpointer): the covariance table is
    // checkpointed ONCE — the corpus is scanned exactly once no matter how
    // many rounds follow — and each round's matrix-vector product is
    // checkpointed because the normalize step references it TWICE (the
    // vector and its norm); without truncation the plan would double per
    // round and kill the driver in the optimizer long before 8 rounds.
    // Every checkpointed table is metadata-sized (dim² resp. dim rows).
    val ckpt = Iterate.checkpointer(spark.sparkContext)
    val cov = ckpt(covarianceMatrix(emb, vecCol, dim))
    val v0 = BigDecimal(1.0 / math.sqrt(dim.toDouble))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    var v = spark.range(dim)
      .select(col("id").cast("int").alias("j"), lit(v0).alias("vj"))
    for (_ <- 1 to iters) {
      val w = ckpt(cov.join(v, "j").groupBy("i")
        .agg(sum((col("c") * col("vj")).cast("decimal(28,14)"))
          .cast("double").alias("wi")))
      val nrm = w.agg(
        sqrt(sum((col("wi") * col("wi")).cast("decimal(28,14)"))
          .cast("double")).alias("__nrm"))
      v = w.crossJoin(broadcast(nrm))
        .select(col("i").alias("j"),
          round(col("wi") / col("__nrm"), 9).alias("vj"))
    }
    v.select(col("j").alias("dim_idx"), round(col("vj"), 6).alias("loading"))
  }

  /** Dimension-truncation recall study (the Matryoshka question): for
    * each prefix length in `dims`, run brute-force cosine top-k on the
    * TRUNCATED vectors and measure recall against the full-dimension
    * ground truth. At 100 TB, scoring on the first 16 of 64 dims reads
    * and multiplies 4× less — this query prices that cut in recall, per
    * corpus, instead of guessing. One corpus scan per prefix length,
    * each the same broadcast-query TakeOrderedAndProject shape as
    * [[bruteForceTopK]]; the union is |dims| × k rows. */
  def dimTradeoffRecall(corpus: DataFrame, idCol: String, vecCol: String,
                        query: DataFrame, k: Int, dims: Seq[Int],
                        fullDim: Int): DataFrame = {
    val base = corpus.select(col(idCol), asDouble(col(vecCol)).alias("v"))
    def topk(d: Int) = base
      .crossJoin(broadcast(query))
      .select(col(idCol),
        cosine(slice(col("v"), 1, d), slice(col("qv"), 1, d)).alias("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
    val gt = topk(fullDim).select(col(idCol))
    val hits = dims.map { d =>
      topk(d).select(lit(d).cast("long").alias("dims"), col(idCol))
    }.reduce(_ unionAll _)
      .join(gt, Seq(idCol), "left_semi")
      .groupBy("dims")
      .agg(count(lit(1)).alias("__hits"))
    // a prefix with ZERO hits must still report recall 0.0, not vanish
    val spark = corpus.sparkSession
    import spark.implicits._
    dims.map(_.toLong).toDF("dims")
      .join(hits, Seq("dims"), "left")
      .select(col("dims"),
        round(coalesce(col("__hits"), lit(0L)).cast("double") / k.toDouble, 6)
          .alias("recall"))
      .orderBy("dims")
  }

  /** Product-quantization codebooks: split `dim` into `m` contiguous
    * subspaces of dim/m and run the [[kmeansCentroids]] Lloyd recipe in
    * EACH subspace — but all `m` trainings share one dataflow (the corpus
    * explodes to (id, j, subvector) once per round; assignments are the
    * broadcast argmin of [[ivfAssign]] keyed by subspace; means are one
    * grouped aggregation over (j, cell)). Same determinism contract:
    * init = the `kPerSub` lowest ids' slices, ties break on centroid id,
    * means go through DECIMAL(28,14) sums and round to 9 dp, so the
    * trained codebooks are bit-reproducible across engines and cluster
    * sizes. Returns (j, cid, cv). Lineage is truncated per round
    * ([[kmeansCentroids]]' round-18 stance — the codebook table is
    * m·kPerSub metadata-sized rows; un-truncated, the nested rounds made
    * consumers optimizer-bound, not compute-bound). */
  def pqCodebooks(vectors: DataFrame, idCol: String, vecCol: String,
                  m: Int, kPerSub: Int, iters: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"pqCodebooks: dim $dim not divisible by m $m")
    val ckpt = Iterate.checkpointer(vectors.sparkSession.sparkContext)
    val subDim = dim / m
    val base = vectors.select(col(idCol).alias("__id"), col(vecCol).alias("v"))
    val sub = base.select(col("__id"),
      posexplode(array((0 until m).map(j =>
        slice(col("v"), j * subDim + 1, subDim)): _*)).as(Seq("j", "sv")))
    val seeds = base.orderBy("__id").limit(kPerSub).select(col("__id"))
    var cents = sub.join(broadcast(seeds), "__id")
      .select(col("j"), col("__id").alias("cid"), col("sv").alias("cv"))
    for (_ <- 1 to iters) {
      val packed = cents.groupBy("j")
        .agg(collect_list(struct(col("cid"), col("cv"))).alias("__cents"))
      val assigned = sub.join(broadcast(packed), "j")
        // same compiled argmin kernel as ivfAssign (round 19)
        .withColumn("__best",
          graft.functions.VecMath.nearest_centroid(col("sv"), col("__cents")))
        .select(col("j"), col("sv"), col("__best").getField("cid").alias("cell"))
      val sums = (0 until subDim).map(i =>
        sum(col("sv").getItem(i).cast("decimal(28,14)")).alias(s"__s_$i"))
      cents = ckpt(assigned.groupBy("j", "cell")
        .agg(count(lit(1)).alias("__n"), sums: _*)
        .select(col("j"), col("cell").alias("cid"),
          array((0 until subDim).map(i =>
            round(col(s"__s_$i").cast("double") / col("__n"), 9)): _*)
            .alias("cv")))
    }
    cents
  }

  /** PQ encoding: each vector → `m` centroid ids (its code word). The
    * codebooks (m × kPerSub tiny rows) pack into ONE broadcast row and
    * the per-subspace argmin is a pure array expression — encoding is a
    * zero-exchange codegen'd scan, exactly [[ivfAssign]]'s shape run m
    * times per row. At dim 64 float, the 8-code word is ~64× smaller
    * than the raw vector: THIS is the table ANN scans at 100 TB. */
  def pqEncode(vectors: DataFrame, idCol: String, vecCol: String,
               codebooks: DataFrame, m: Int, dim: Int): DataFrame = {
    val subDim = dim / m
    val packed = codebooks.groupBy("j")
      .agg(collect_list(struct(col("cid"), col("cv"))).alias("cs"))
      .agg(sort_array(collect_list(struct(col("j"), col("cs")))).alias("__cb"))
    vectors.select(col(idCol), col(vecCol).alias("v"))
      .crossJoin(broadcast(packed))
      // Compiled per-subspace argmin (round 19): `m` is a literal, so the
      // transform-over-sequence unrolls to a plain array of kernel calls —
      // value-identical (array(f(0)..f(m-1)) IS transform(sequence(0,m-1),f))
      // and the whole encode projection stays inside whole-stage codegen
      // where the nested HOFs were interpreted per element per centroid.
      .select(col(idCol),
        array((0 until m).map(j =>
          graft.functions.VecMath.nearest_centroid(
            slice(col("v"), j * subDim + 1, subDim),
            element_at(col("__cb"), j + 1).getField("cs"))
            .getField("cid")): _*)
          .alias("codes"))
  }

  /** PQ ANN with asymmetric-distance scoring and exact rerank — the
    * compressed-domain search that makes billion-vector ANN affordable:
    * train per-subspace codebooks, encode the corpus to m-byte codes,
    * score candidates WITHOUT touching raw vectors (per-subspace
    * query→centroid distance LUT, broadcast as one row; approximate
    * distance = Σ_j lut[j][code_j], a pure expression over the codes
    * column), then fetch raw vectors ONLY for the top-`rerank`
    * candidates and rank those by exact cosine.
    *
    * Scale shape: training and encoding scan the corpus a bounded number
    * of times with tiny shuffles (subspace-cell sums); the per-query
    * work is one scan of the CODES table (64× smaller than the vectors)
    * plus an exact pass over `rerank` rows. Nothing vector-sized ever
    * shuffles. ADC contributions accumulate in DECIMAL(28,14) (exact, so
    * fold order is irrelevant and any engine agrees); candidate and
    * final ranks tie-break on id. */
  def pqTopK(corpus: DataFrame, idCol: String, vecCol: String,
             query: DataFrame, k: Int, m: Int = 8, kPerSub: Int = 8,
             iters: Int = 3, dim: Int = 64, rerank: Int = 50): DataFrame = {
    val subDim = dim / m
    val base = corpus.select(col(idCol), asDouble(col(vecCol)).alias("v"))
    val cb = pqCodebooks(base, idCol, "v", m, kPerSub, iters, dim)
    val codes = pqEncode(base, idCol, "v", cb, m, dim)
    val lut = cb.crossJoin(broadcast(query))
      .select(col("j"), col("cid"),
        sqDist(slice(col("qv"), col("j") * lit(subDim) + 1, lit(subDim)),
          col("cv")).alias("d"))
    val lutPacked = lut.groupBy("j")
      .agg(map_from_entries(collect_list(struct(col("cid"), col("d"))))
        .alias("mm"))
      // sort_array can't order maps — array_sort with an explicit j
      // comparator packs the per-subspace LUTs in subspace order
      .agg(array_sort(collect_list(struct(col("j"), col("mm"))),
        (l, r) => when(l.getField("j") < r.getField("j"), -1)
          .when(l.getField("j") > r.getField("j"), 1).otherwise(0))
        .alias("__lut"))
    val adc = aggregate(sequence(lit(0), lit(m - 1)),
      lit(0).cast("decimal(28,14)"),
      (acc, j) => (acc +
        element_at(element_at(col("__lut"), j + 1).getField("mm"),
          element_at(col("codes"), j + 1)).cast("decimal(28,14)"))
        .cast("decimal(28,14)"))
    val cand = codes.crossJoin(broadcast(lutPacked))
      .select(col(idCol), adc.cast("double").alias("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(rerank)
    base.join(broadcast(cand.select(idCol)), Seq(idCol))
      .crossJoin(broadcast(query))
      .select(col(idCol), cosine(col("v"), col("qv")).alias("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Nearest-centroid (Rocchio) classifier over the embedding corpus,
    * reported as a confusion matrix: per-label centroids (per-dimension
    * DECIMAL means, 9-dp-pinned — the [[cosine]]/pca determinism
    * stance), then every vector is assigned the centroid of maximum
    * cosine. The centroid table is label-count-sized and broadcast, so
    * scoring is a projection off the corpus scan (labels× fan-out, no
    * corpus shuffle); the argmax is a min-of-struct aggregate keyed by
    * vector — map-side combinable, no window over scored rows. Ties
    * break toward the smallest label. The self-evaluation here is the
    * resubstitution readout (how separable are the labels); scoring a
    * held-out set is the same plan with a different scan. */
  /** Local Outlier Factor with the kNN search confined to IVF cells —
    * the embedding-space outlier score a data-quality pipeline runs to
    * surface mis-embedded / out-of-distribution vectors before training.
    * Same scale stance as [[semDedup]]: vectors are assigned to their
    * nearest centroid ([[ivfAssign]], zero corpus exchanges), all pair
    * math happens within a cell (equi-join on the cell key, maxCell
    * raise_error guard on the quadratic degenerate), so 100 TB cost is
    * Σ cell² bounded by maxCell·n, never n². Inside a cell: exact kNN
    * by 6-dp-rounded Euclidean distance with id tie-break (deterministic
    * across engines and shuffle orders), k-distance = the k-th rounded
    * distance, reachability reach(i,j) = max(kdist(j), d(i,j)), local
    * reachability density lrd(i) = |kNN(i)| / Σ reach (DECIMAL sum —
    * exact, order-proof), and LOF(i) = mean lrd(neighbor) / lrd(i),
    * rounded to 6 dp. Cells smaller than k+1 use every available
    * neighbor (nk < k), and a singleton cell reports nk=0 with NULL
    * kdist/lrd/lof — both conventions mirrored in the oracle. The
    * cell-confined kNN is the standard practical approximation (exact
    * global kNN would be the all-pairs this operator exists to avoid);
    * raise nCells to tighten cells, not k. */
  def lof(vectors: DataFrame, idCol: String, vecCol: String,
          centroids: DataFrame, k: Int, maxCell: Int = 4096): DataFrame = {
    val assigned = ivfAssign(vectors, idCol, vecCol, centroids)
    val counts = assigned.groupBy("cell").agg(count(lit(1)).alias("__cn"))
    val guarded = assigned.join(broadcast(counts), Seq("cell"))
      .select(col("cell"), col(idCol).alias("__id"),
        when(col("__cn") > maxCell, raise_error(lit(
          s"lof: a cell exceeds maxCell=$maxCell vectors - raise nCells")))
          .otherwise(col("v")).alias("v"))
    val a = guarded.select(col("cell"), col("__id").alias("i"),
      col("v").alias("__vi"))
    val b = guarded.select(col("cell"), col("__id").alias("j"),
      col("v").alias("__vj"))
    val pairs = a.join(b, Seq("cell"))
      .filter(col("i") =!= col("j"))
      .select(col("i"), col("j"),
        round(sqrt(sqDist(col("__vi"), col("__vj"))), 6).alias("d"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("i").orderBy(col("d"), col("j"))
    val knn = pairs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("i"), col("j"), col("d"))
    val kd = knn.groupBy("i")
      .agg(max("d").alias("kd"))
      .select(col("i").alias("__kdi"), col("kd"))
    val lrd = knn
      .join(kd.select(col("__kdi").alias("j"), col("kd").alias("__kdj")), Seq("j"))
      .select(col("i"), greatest(col("__kdj"), col("d")).alias("__reach"))
      .groupBy("i")
      .agg(count(lit(1)).alias("nk"),
        sum(col("__reach").cast("decimal(28,14)")).cast("double").alias("__sr"))
      .select(col("i"), col("nk"),
        round(col("nk").cast("double") / col("__sr"), 9).alias("lrd"))
    val lofScores = knn
      .join(lrd.select(col("i").alias("j"), col("lrd").alias("__lrdj")), Seq("j"))
      .groupBy("i")
      .agg(sum(col("__lrdj").cast("decimal(28,14)")).cast("double").alias("__sl"))
      .join(lrd, Seq("i"))
      .select(col("i"),
        round(col("__sl") / (col("nk") * col("lrd")), 6).alias("lof"))
    assigned.select(col(idCol), col("cell"))
      .join(lrd.select(col("i").alias(idCol), col("nk"), col("lrd")),
        Seq(idCol), "left")
      .join(kd.select(col("__kdi").alias(idCol), col("kd").alias("kdist")),
        Seq(idCol), "left")
      .join(lofScores.select(col("i").alias(idCol), col("lof")),
        Seq(idCol), "left")
      .select(col(idCol), col("cell"), coalesce(col("nk"), lit(0L)).alias("nk"),
        col("kdist"), col("lrd"), col("lof"))
  }

  /** Grid-bucketed DBSCAN over a 2-D projection of the embedding space
    * (dims `dimX`/`dimY`) — the spatial fixed-radius density clustering a
    * geo / sensor / page-layout pipeline runs (high-dimensional density
    * pruning is served by [[semDedup]]'s within-cell pass). Classic
    * ε-grid construction: each point lands in one ε-sized cell ("home")
    * and is replicated to its 3×3 cell neighborhood ("probe");
    * home ⋈ probe on the cell key yields every directed pair within ε
    * exactly once (d ≤ ε forces |Δcell| ≤ 1 per axis, and a point's 9
    * probe cells are distinct) — an equi-join shuffle on compact cell
    * keys, never all-pairs. ε-degree ≥ minPts−1 (neighbors excluding
    * self) marks cores; clusters are connected components over
    * core–core edges ([[graft.ops.ScaleDedup.connectedComponents]],
    * pointer-jumped with per-round checkpoints); a non-core point within
    * ε of a core joins that core's cluster (min core-neighbor label —
    * deterministic), everything else is noise with a NULL cluster. A
    * dense cell would turn the candidate join quadratic, so per-cell
    * counts are guarded by raise_error like [[semDedup]]'s maxCell — at
    * 100 TB you shrink ε (finer cells) instead of silently running an
    * n² stage. Determinism: the ε test compares the same IEEE
    * expression ((Δx)²+(Δy)² vs the precomputed ε² literal) on both
    * engines, and every readout is an id/label/count — no float leaves
    * the operator. FP-boundary caveat: cell assignment is
    * floor(coord/ε) in floating point, so a pair at distance
    * ESSENTIALLY EXACTLY ε with a coordinate within one ulp of a cell
    * boundary can round into cells 2 apart and miss the 3×3 probe —
    * measure-zero in practice and identical on any engine that shares
    * the floor(x/ε) doubles, but "every ε-pair exactly once" is exact
    * only for pairs strictly inside the ε ball. */
  def dbscan2d(emb: DataFrame, idCol: String, vecCol: String,
               eps: Double, minPts: Int,
               dimX: Int = 0, dimY: Int = 1,
               maxCell: Int = 4096): DataFrame = {
    val epsSq = eps * eps
    val pts = emb.select(col(idCol).alias("id"),
        col(vecCol).getItem(dimX).cast("double").alias("x"),
        col(vecCol).getItem(dimY).cast("double").alias("y"))
      .withColumn("cx", floor(col("x") / eps).cast("long"))
      .withColumn("cy", floor(col("y") / eps).cast("long"))
    // Lazy density guard (semDedup's maxCell idiom): fires on the
    // executors only if some ε-cell would fan the candidate join out
    // quadratically.
    val counts = pts.groupBy("cx", "cy").agg(count(lit(1)).alias("__cn"))
    val home = pts.join(broadcast(counts), Seq("cx", "cy"))
      .select(col("id"), col("x"), col("y"), col("cy"),
        when(col("__cn") > maxCell, raise_error(lit(
          s"dbscan2d: an eps-cell exceeds maxCell=$maxCell points - shrink eps")))
          .otherwise(col("cx")).alias("cx"))
    val probe = pts
      .select(col("id").alias("jid"), col("x").alias("jx"), col("y").alias("jy"),
        explode(array((-1 to 1).map(d => col("cx") + d): _*)).alias("cx"),
        col("cy"))
      .select(col("jid"), col("jx"), col("jy"), col("cx"),
        explode(array((-1 to 1).map(d => col("cy") + d): _*)).alias("cy"))
    // Every directed ε-pair appears exactly once: the 9 probe cells of j
    // are distinct and contain i's single home cell.
    val nbrs = home.join(probe, Seq("cx", "cy"))
      .filter(col("id") =!= col("jid"))
      .filter((col("x") - col("jx")) * (col("x") - col("jx")) +
        (col("y") - col("jy")) * (col("y") - col("jy")) <= lit(epsSq))
      .select(col("id"), col("jid"))
    val deg = nbrs.groupBy("id").agg(count(lit(1)).alias("__deg"))
    val core = deg.filter(col("__deg") >= minPts - 1).select(col("id"))
    val coreEdges = nbrs.filter(col("id") < col("jid"))
      .join(core, Seq("id"), "left_semi")
      .join(core.select(col("id").alias("jid")), Seq("jid"), "left_semi")
      .select(col("id").alias("id1"), col("jid").alias("id2"))
    val coreLab = ScaleDedup.connectedComponents(core, coreEdges)
    val borderLab = nbrs
      .join(core, Seq("id"), "left_anti")
      .join(coreLab.select(col("id").alias("jid"), col("label")), Seq("jid"))
      .groupBy("id").agg(min("label").alias("label"))
    val labeled = coreLab.select(col("id"), lit("core").alias("role"),
        col("label").alias("cluster"))
      .unionByName(borderLab.select(col("id"), lit("border").alias("role"),
        col("label").alias("cluster")))
    val noise = pts.select(col("id"))
      .join(labeled.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), lit("noise").alias("role"),
        lit(null).cast("long").alias("cluster"))
    labeled.unionByName(noise).select(col("id").alias(idCol),
      col("role"), col("cluster"))
  }

  def centroidClassify(emb: DataFrame, idCol: String, vecCol: String,
                       labelCol: String): DataFrame = {
    val e = emb.select(col(idCol).alias("__id"),
      col(labelCol).alias("__lab"), asDouble(col(vecCol)).alias("__v"))
    val cents = e.select(col("__lab"), posexplode(col("__v")).as(Seq("__pos", "__x")))
      .groupBy("__lab", "__pos")
      .agg((sum(col("__x").cast("decimal(28,14)")).cast("double") /
        count(lit(1))).alias("__cx"))
      .groupBy("__lab")
      .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__cx")))),
        s => round(s.getField("__cx"), 9)).alias("__c"))
      .select(col("__lab").alias("__clab"), col("__c"))
    val best = e.crossJoin(broadcast(cents))
      .select(col("__id"), col("__lab"),
        cosine(col("__v"), col("__c")).alias("__cos"), col("__clab"))
      .groupBy("__id", "__lab")
      .agg(min(struct((-col("__cos")).alias("nc"), col("__clab").alias("l")))
        .alias("__m"))
    best.groupBy(col("__lab").alias("label"),
        col("__m.l").alias("predicted"))
      .agg(count(lit(1)).alias("n"))
      .orderBy("label", "predicted")
  }
}
