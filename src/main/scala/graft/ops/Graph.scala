package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over plain edge tables (duplicate-cluster
  * connected components lives in ScaleDedup; this is the ranking side).
  * Corpus-curation use: link-graph authority scores (PageRank over a web
  * graph) are a standard document-quality prior at pretraining scale.
  */
object Graph {

  /** Per-node triangle participation over an undirected simple graph
    * (edges as (src, dst); direction, duplicates and self-loops are
    * normalized away). The node-iterator formulation as two equi-joins:
    * orient every edge low-id → high-id, build wedges a→b→c by joining
    * the oriented list to itself on the middle node, close each wedge
    * against the oriented list — every triangle materializes exactly once
    * as its sorted triple (a<b<c), then fans out to its three corners for
    * the per-node count. No all-pairs step anywhere; the joins shuffle
    * the edge list on its endpoints. On hub-skewed graphs the id
    * orientation should become degree orientation (direct each edge
    * toward the higher-degree endpoint — one extra degree join) to bound
    * wedge fan-out by arboricity; the join shape is unchanged.
    * Curation use: triangle density separates tight template families
    * from chains of coincidental LSH collisions in the near-dup graph.
    * Returns (node, n_triangles) for nodes in ≥1 triangle. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val norm = edges
      .select(least(col("src"), col("dst")).alias("a"),
        greatest(col("src"), col("dst")).alias("b"))
      .filter(col("a") =!= col("b")).distinct()
    val tri = norm.alias("e1")
      .join(norm.alias("e2"), col("e1.b") === col("e2.a"))
      .join(norm.alias("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a").alias("x"), col("e1.b").alias("y"),
        col("e2.b").alias("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).alias("node"))
      .groupBy("node").agg(count(lit(1)).alias("n_triangles"))
  }

  /** Triangle participation with DEGREE orientation — the hub-skew-proof
    * variant of `triangleCounts` (identical output, spec-checked). Each
    * undirected edge is directed toward its HIGHER-degree endpoint
    * (ties by id), so a node's wedge fan-out is bounded by its
    * out-degree ≤ O(√m) on any graph (arboricity bound) — a degree-10⁶
    * hub in the id-oriented version could anchor ~10¹² wedges from one
    * key; here it anchors only wedges toward even-higher-degree nodes.
    * Cost: one extra degree aggregation and a 2-key join versus the id
    * orientation; same two triangle joins. The wedge join keys on the
    * middle node and the close join checks the (low, high) canonical
    * pair, so each triangle still materializes exactly once regardless
    * of which corner anchors it. */
  def triangleCountsDegreeOriented(edges: DataFrame): DataFrame = {
    val norm = edges
      .select(least(col("src"), col("dst")).alias("a"),
        greatest(col("src"), col("dst")).alias("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = norm.select(col("a").alias("node"))
      .union(norm.select(col("b").alias("node")))
      .groupBy("node").agg(count(lit(1)).alias("__deg"))
    // orient u→v iff (deg(u), u) < (deg(v), v): a strict total order, so
    // exactly one direction survives per edge
    val oriented = norm
      .join(deg.select(col("node").alias("a"), col("__deg").alias("__da")), "a")
      .join(deg.select(col("node").alias("b"), col("__deg").alias("__db")), "b")
      .select(
        when(col("__da") < col("__db") ||
          (col("__da") === col("__db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).alias("u"),
        when(col("__da") < col("__db") ||
          (col("__da") === col("__db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).alias("v"))
    // wedge u→v, u→w anchored at the LOWEST-ordered corner u (v ≠ w kept
    // one way via <); close by checking v—w as its canonical sorted pair.
    val tri = oriented.alias("e1")
      .join(oriented.alias("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .join(norm.alias("e3"),
        least(col("e1.v"), col("e2.v")) === col("e3.a") &&
          greatest(col("e1.v"), col("e2.v")) === col("e3.b"))
      .select(col("e1.u").alias("x"), col("e1.v").alias("y"),
        col("e2.v").alias("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).alias("node"))
      .groupBy("node").agg(count(lit(1)).alias("n_triangles"))
  }

  /** Degree histogram of an undirected simple graph: (degree, n_nodes).
    * The one-line audit of a near-dup graph's shape — a fat high-degree
    * tail means template families / LSH mega-buckets, a mass at degree 1
    * means pairwise accidental collisions. Two tiny aggregations over the
    * edge list; nodes with no edges don't appear. */
  def degreeHistogram(edges: DataFrame): DataFrame = {
    val norm = edges
      .select(least(col("src"), col("dst")).alias("a"),
        greatest(col("src"), col("dst")).alias("b"))
      .filter(col("a") =!= col("b")).distinct()
    norm.select(col("a").alias("node"))
      .union(norm.select(col("b").alias("node")))
      .groupBy("node").agg(count(lit(1)).alias("degree"))
      .groupBy("degree").agg(count(lit(1)).alias("n_nodes"))
  }

  /** Local clustering coefficient per node:
    * c(v) = 2·tri(v) / (deg(v)·(deg(v)−1)), with the deg < 2 convention
    * pinned to 0 — the "are my neighbors also neighbors of each other"
    * readout that separates a template FAMILY (dense core, c → 1) from
    * a hub-and-spoke LSH accident (star center, c → 0) at equal degree,
    * the distinction [[degreeHistogram]] can't make. Triangles come
    * from [[triangleCountsDegreeOriented]] (the hub-skew-proof wedge
    * orientation — this op exists precisely for graphs with suspicious
    * hubs, so the skew-safe variant is the only sensible engine); the
    * degree table is two tiny aggregations; the final join is
    * node-count-sized on both sides. Exact integer inputs, one double
    * division, 6 dp. */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val norm = edges
      .select(least(col("src"), col("dst")).alias("a"),
        greatest(col("src"), col("dst")).alias("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = norm.select(col("a").alias("node"))
      .union(norm.select(col("b").alias("node")))
      .groupBy("node").agg(count(lit(1)).alias("degree"))
    val tri = triangleCountsDegreeOriented(edges)
    val d = col("degree").cast("double")
    deg.join(tri, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).alias("n_triangles"),
        when(col("degree") < 2, lit(0.0))
          .otherwise(round(lit(2.0) *
            coalesce(col("n_triangles"), lit(0L)).cast("double") /
            (d * (d - lit(1.0))), 6)).alias("clustering_coeff"))
  }

  /** Rich-club coefficient ladder: for each degree threshold k,
    *   φ(k) = 2·E_k / (N_k·(N_k − 1))
    * where N_k counts nodes of degree > k and E_k the edges BETWEEN
    * them — "do the hubs preferentially wire to each other", the
    * structural question [[degreeAssortativity]]'s one global number
    * blurs (a graph can be globally disassortative yet carry a tight
    * hub club). Scale shape: the edge list reduces to a degree
    * histogram and a min-endpoint-degree edge histogram (both
    * degree-distribution-sized) in two aggregations; the k-ladder is a
    * bounded crossJoin over those tiny tables. N_k < 2 pins φ to NULL
    * identically on both engines. */
  def richClub(edges: DataFrame, maxK: Int = 10): DataFrame = {
    require(maxK >= 1 && maxK <= 1000, s"richClub: bad maxK $maxK")
    val norm = edges
      .select(least(col("src"), col("dst")).alias("a"),
        greatest(col("src"), col("dst")).alias("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = norm.select(col("a").alias("node"))
      .union(norm.select(col("b").alias("node")))
      .groupBy("node").agg(count(lit(1)).alias("__deg"))
    val dh = deg.groupBy("__deg").agg(count(lit(1)).alias("__dn"))
    val em = norm
      .join(deg.select(col("node").alias("a"), col("__deg").alias("__da")), "a")
      .join(deg.select(col("node").alias("b"), col("__deg").alias("__db")), "b")
      .groupBy(least(col("__da"), col("__db")).alias("__m"))
      .agg(count(lit(1)).alias("__en"))
    val ladder = norm.sparkSession.range(1)
      .select(explode(sequence(lit(1), lit(maxK))).alias("k"))
    val nk = ladder.crossJoin(broadcast(dh))
      .groupBy("k")
      .agg(sum(when(col("__deg") > col("k"), col("__dn")).otherwise(0L))
        .alias("n_nodes"))
    val ek = ladder.crossJoin(broadcast(em))
      .groupBy("k")
      .agg(sum(when(col("__m") > col("k"), col("__en")).otherwise(0L))
        .alias("n_edges"))
    val n = col("n_nodes").cast("double")
    nk.join(ek, "k")
      .select(col("k"), col("n_nodes"), col("n_edges"),
        when(col("n_nodes") < 2, lit(null).cast("double"))
          .otherwise(round(lit(2.0) * col("n_edges").cast("double") /
            (n * (n - lit(1.0))), 6)).alias("phi"))
      .orderBy("k")
  }

  /** Weighted PageRank, deterministic across engines and cluster sizes.
    *
    * Each round is the standard power-iteration step
    *   rank'(v) = (1−d)/N + d · Σ_{(u,v,w)∈E} rank(u) · w / outw(u)
    * expressed as two equi-joins (edges⋈out-weights⋈ranks on src) and one
    * aggregation on dst — per round the rank table shuffles, never
    * anything bigger, and the groupBy gets map-side partial aggregation.
    * Determinism mirrors `Similarity.kmeansCentroids`: per-edge
    * contributions are cast to DECIMAL(28,14) before the sum (shuffle
    * order cannot flip low bits) and each round's rank is rounded to
    * 9 dp, so the iteration chain is reproducible bit-for-bit anywhere.
    *
    * `edges` must expose (src, dst, w≥0). Nodes without out-edges leak
    * their mass (the standard dangling simplification — totals then sum
    * to < 1); nodes without in-edges settle at (1−d)/N. The fixed,
    * caller-chosen `iters` keeps the op a finite declarative plan; rank
    * movement per round shrinks geometrically (d^t), so small iteration
    * counts already order nodes stably. Lineage grows linearly with
    * `iters` — for dozens of rounds pass pre-checkpointed edges and see
    * ScaleDedup.connectedComponents for the checkpoint pattern. */
  def pagerank(edges: DataFrame, iters: Int,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"pagerank: need iters >= 1, got $iters")
    val nodes = edges.select(col("src").alias("node"))
      .union(edges.select(col("dst").alias("node")))
      .distinct()
    val n = nodes.count()
    require(n > 0, "pagerank: empty edge set")
    val outw = edges.groupBy("src").agg(sum("w").alias("__outw"))
    var ranks = nodes.select(col("node"), lit(1.0 / n).alias("rank"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(outw, "src")
        .join(ranks.select(col("node").alias("src"), col("rank")), "src")
        .select(col("dst").alias("node"),
          (col("rank") * col("w") / col("__outw"))
            .cast("decimal(28,14)").alias("__c"))
      val sums = contrib.groupBy("node").agg(sum("__c").alias("__cs"))
      ranks = nodes.join(sums, Seq("node"), "left").select(col("node"),
        round(lit(1.0 - damping) / lit(n.toDouble) +
          lit(damping) * coalesce(col("__cs").cast("double"), lit(0.0)), 9)
          .alias("rank"))
    }
    ranks
  }

  /** Multi-level hierarchy explosion — the BOM (bill-of-materials) /
    * org-rollup recursion: for each root, every descendant reachable in
    * ≤ `maxDepth` edges with its TOTAL multiplied-out quantity,
    *   total(root, node) = Σ over paths root→node of Π edge qty
    * (one widget needs 3 assemblies × 4 bolts each ⇒ 12 bolts). The
    * recursive-CTE query warehouses run, expressed as `maxDepth` unrolled
    * frontier joins: each round extends only the CURRENT frontier
    * (paths of exactly t edges) through the edge list — one equi-join on
    * the parent key per level — and the final aggregation sums path
    * quantities per (root, node). DAGs are handled naturally (a node
    * reached by several paths contributes each path's product); cycles
    * are truncated by `maxDepth` — pass a depth ≥ the hierarchy's height,
    * which the caller knows (and a real catalog bounds by design).
    * Quantities stay LONG: integer Π/Σ is exact on any engine.
    * `edges`: (parent, child, qty); `roots`: (node).
    *
    * Lineage is truncated per level (round 18): each frontier is
    * referenced TWICE (by the next level's join and by the running
    * union), so un-truncated the accumulated plan re-derives the edge
    * subtree a quadratic-in-depth number of times — the declared BOM
    * query's plan held 544 `Scan parquet` nodes at maxDepth=16 (plan
    * file plans/r18/q_bom_rollup_before.txt), a full-table re-read per
    * copy at production scale. Edges are materialized ONCE
    * ([[Iterate.checkpointer]]) and the frontier is checkpointed every
    * 2nd level, so the final plan unions ≤ depth+1 frames that are each
    * at most one lazy join above a materialized frame, and storage is
    * scanned once. A drained frontier (all leaves) ends the loop early
    * — every later level is an empty join, and the union result is
    * unchanged by construction. */
  def explodeHierarchy(edges: DataFrame, roots: DataFrame,
                       maxDepth: Int): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 64,
      s"explodeHierarchy: need 1 <= maxDepth <= 64, got $maxDepth")
    val ckpt = Iterate.checkpointer(edges.sparkSession.sparkContext)
    val e = ckpt(edges.select(col("parent"), col("child"),
      col("qty").cast("long").alias("qty")))
    var frontier = ckpt(roots.select(col("node").alias("root"),
      col("node"), lit(1L).alias("qty")))
    var acc = frontier
    var depth = 0
    var sinceCkpt = 0
    var drained = false
    // Superstep batching (the connectedComponents ckptEvery stance):
    // truncating every 2nd level keeps the between-checkpoint plan
    // bounded (≤ 2 lazy levels ⇒ ≤ 3 copies of a one-join subtree over
    // materialized frames) at half the eager-job barriers; the drain
    // check rides the checkpoint, so an odd drain costs one empty level.
    while (depth < maxDepth && !drained) {
      frontier = frontier.alias("f")
        .join(e.alias("e"), col("f.node") === col("e.parent"))
        .select(col("f.root").alias("root"), col("e.child").alias("node"),
          (col("f.qty") * col("e.qty")).alias("qty"))
      depth += 1
      sinceCkpt += 1
      if (sinceCkpt == 2 || depth == maxDepth) {
        frontier = ckpt(frontier)
        sinceCkpt = 0
        if (frontier.isEmpty) drained = true else acc = acc.unionByName(frontier)
      } else acc = acc.unionByName(frontier)
    }
    acc.groupBy("root", "node").agg(sum("qty").alias("total_qty"))
  }

  /** Unweighted BFS distances from a source node set, `hops` relaxation
    * rounds unrolled: dist'(v) = min(dist(v), min over edges (u,v) of
    * dist(u)+1). Returns (node, dist) for every node reached within
    * `hops` — k-hop neighborhoods over the near-dup graph, blast-radius
    * queries over lineage edges, reachability tiers over link graphs.
    *
    * Per round, only the REACHED set joins the edge list and re-minimizes
    * — one edge-keyed join plus one node-keyed aggregation, both with
    * map-side partials; the frontier's dist values are exact after round
    * t for every node at distance ≤ t (standard BFS invariant), so a
    * fixed hop count is a complete answer for the k-hop question, not an
    * approximation. Directed as given — pass both orientations for an
    * undirected graph. Lineage is truncated per hop (round 18 — the
    * distance table is referenced twice per hop, union + relax join, so
    * the un-truncated plan doubled per hop; every-2 superstep batching
    * was tried and rejected with numbers in round 19, see
    * [[shortestPaths]]). */
  /** Weighted single-source shortest distances — Bellman-Ford with
    * `rounds` relaxation rounds unrolled:
    *   dist'(v) = min(dist(v), min over edges (u,v,w) of dist(u)+w).
    * The weighted generalization of `bfsDistances` (same join shape,
    * same per-round cost): exact for every node whose shortest path uses
    * ≤ `rounds` edges, an upper bound beyond that — with non-negative
    * integer weights the relaxation is monotone, so extra rounds only
    * tighten. Weights stay LONG end-to-end: integer min/plus is exact on
    * any engine and partitioning, no decimal chain needed. Directed as
    * given; pass both orientations for an undirected graph.
    *
    * Lineage is truncated per round ([[Iterate.checkpointer]], round
    * 18): the state table is referenced TWICE per round (the relax join
    * and the union), the exponential double-reference case Iterate.scala
    * warns about — un-truncated, the declared 3-round query's plan held
    * 2^rounds copies of the source subtree (44 `Scan parquet` nodes,
    * plans/r18/q_graph_sssp_before.txt), and the operator's documented
    * 64-round bound would be unplannable. Every-2nd-round superstep
    * batching was tried in round 19 and REJECTED with numbers (see the
    * loop comment). Same stance as [[harmonicCentrality]] (the identical
    * union+join shape). */
  def shortestPaths(edges: DataFrame, sources: DataFrame,
                    rounds: Int): DataFrame = {
    require(rounds >= 0 && rounds <= 64,
      s"shortestPaths: need 0 <= rounds <= 64, got $rounds")
    val ckpt = Iterate.checkpointer(edges.sparkSession.sparkContext)
    var dist = sources.select(col("node"), lit(0L).alias("dist"))
    // Checkpoint EVERY round — the every-2nd-round superstep batching
    // (round-18 ADVICE) was tried and REJECTED in round 19 with numbers:
    // the state table is referenced twice per round, so each skipped
    // checkpoint makes the next eager checkpoint re-execute the skipped
    // round's join 2× inside its double pass — measured q_graph_sssp
    // 1.2 → 1.9 s / q_graph_bfs 1.6 → 4.0 s steady at sf0.01 for a
    // saving of ONE scheduled job (21 → 20). Unlike explodeHierarchy
    // (whose checkpointed frontier is level-sized while the edges are
    // materialized once), the recompute here is a corpus-scaled join —
    // a full extra distributed pass costs more than the barrier it
    // saves at any cluster size.
    for (_ <- 1 to rounds) {
      val next = dist.alias("d")
        .join(edges.alias("e"), col("d.node") === col("e.src"))
        .select(col("e.dst").alias("node"),
          (col("d.dist") + col("e.w").cast("long")).alias("dist"))
      dist = ckpt(dist.unionByName(next)
        .groupBy("node").agg(min("dist").alias("dist")))
    }
    dist
  }

  def bfsDistances(edges: DataFrame, sources: DataFrame, hops: Int): DataFrame = {
    require(hops >= 0 && hops <= 64, s"bfsDistances: need 0 <= hops <= 64, got $hops")
    val ckpt = Iterate.checkpointer(edges.sparkSession.sparkContext)
    var dist = sources.select(col("node"), lit(0L).alias("dist"))
    // per-round checkpoint — every-2 batching rejected with numbers; see
    // shortestPaths (round 19)
    for (_ <- 1 to hops) {
      val next = dist.alias("d")
        .join(edges.alias("e"), col("d.node") === col("e.src"))
        .select(col("e.dst").alias("node"), (col("d.dist") + 1).alias("dist"))
      dist = ckpt(dist.unionByName(next)
        .groupBy("node").agg(min("dist").alias("dist")))
    }
    dist
  }

  /** Bounded-round k-core peeling: repeatedly delete nodes of degree
    * < k (and their edges) for exactly `rounds` sweeps, then report the
    * surviving nodes with their final core degrees. The density audit
    * of the near-dup graph — pairwise accidents and chains peel away,
    * while template families (whose members corroborate each other)
    * survive as cores. The FIXED round count is the operator definition
    * (the finite declarative plan, [[pagerank]]'s stance): each sweep
    * is one degree aggregation + one semi-join on both endpoints.
    * Each round references the previous edge set THREE times (the
    * degree union and both endpoint semi-joins), so lineage must be
    * truncated per round ([[Iterate.checkpointer]]) or the plan grows
    * 3^rounds. Edges are normalized to undirected distinct (a,b)
    * pairs first. */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 16,
      s"kCore: need k >= 1 and 1 <= rounds <= 16, got k=$k rounds=$rounds")
    val ckpt = Iterate.checkpointer(edges.sparkSession.sparkContext)
    var e = ckpt(edges
      .select(least(col("src"), col("dst")).alias("a"),
        greatest(col("src"), col("dst")).alias("b"))
      .filter(col("a") =!= col("b")).distinct())
    for (_ <- 1 to rounds) {
      val deg = e.select(col("a").alias("node"))
        .unionAll(e.select(col("b").alias("node")))
        .groupBy("node").agg(count(lit(1)).alias("deg"))
      val keep = deg.filter(col("deg") >= k).select("node")
      e = ckpt(e.join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi"))
    }
    e.select(col("a").alias("node"))
      .unionAll(e.select(col("b").alias("node")))
      .groupBy("node").agg(count(lit(1)).alias("core_degree"))
  }

  /** Weighted k-core peeling: delete nodes whose WEIGHTED degree (sum of
    * incident edge weights) is < `minWeight` for exactly `rounds` sweeps,
    * then report survivors with their final weighted core degree. The
    * similarity-aware density audit: where [[kCore]] counts neighbors,
    * this weighs them — three 0.9-Jaccard corroborators outrank nine
    * 0.1-accidents. Same join shape and checkpoint stance as [[kCore]]
    * (each round references the edge set three times → lineage truncated
    * per round). Weights are truncated to DECIMAL(18,6) on ingest and
    * summed as DECIMAL, so the peel threshold compares exact numbers on
    * any partitioning — a double-sum tie at the threshold could otherwise
    * flip membership between runs. Duplicate (a,b) rows (e.g. both
    * orientations of an undirected edge) collapse to their MAX weight.
    * Returns (node, core_wdegree DOUBLE, 6 dp). */
  def kCoreWeighted(edges: DataFrame, minWeight: Double,
                    rounds: Int): DataFrame = {
    require(minWeight > 0 && rounds >= 1 && rounds <= 16,
      s"kCoreWeighted: need minWeight > 0 and 1 <= rounds <= 16, " +
        s"got minWeight=$minWeight rounds=$rounds")
    val ckpt = Iterate.checkpointer(edges.sparkSession.sparkContext)
    var e = ckpt(edges
      .select(least(col("src"), col("dst")).alias("a"),
        greatest(col("src"), col("dst")).alias("b"),
        col("w").cast("decimal(18,6)").alias("w"))
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(max("w").alias("w")))
    val thr = lit(minWeight).cast("decimal(18,6)")
    for (_ <- 1 to rounds) {
      val wdeg = e.select(col("a").alias("node"), col("w"))
        .unionAll(e.select(col("b").alias("node"), col("w")))
        .groupBy("node").agg(sum("w").alias("__wd"))
      val keep = wdeg.filter(col("__wd") >= thr).select("node")
      e = ckpt(e.join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi"))
    }
    e.select(col("a").alias("node"), col("w"))
      .unionAll(e.select(col("b").alias("node"), col("w")))
      .groupBy("node")
      .agg(round(sum("w").cast("double"), 6).alias("core_wdegree"))
  }

  /** Per-EDGE triangle support: for every normalized (a < b) edge, how
    * many triangles contain it — the edge-level refinement of
    * [[triangleCounts]] and the building block of k-truss. An edge with
    * support 0 is a bridge no third document corroborates (the classic
    * accidental-LSH-collision signature); high support means the edge
    * sits inside a template family. Same two equi-joins as the node
    * variant (each triangle materializes once as its sorted triple),
    * then each triangle fans out to its three edges. Returns every
    * normalized edge: (a, b, support), support 0 included. */
  def edgeTriangleSupport(edges: DataFrame): DataFrame = {
    val norm = edges
      .select(least(col("src"), col("dst")).alias("a"),
        greatest(col("src"), col("dst")).alias("b"))
      .filter(col("a") =!= col("b")).distinct()
    val tri = norm.alias("e1")
      .join(norm.alias("e2"), col("e1.b") === col("e2.a"))
      .join(norm.alias("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a").alias("x"), col("e1.b").alias("y"),
        col("e2.b").alias("z"))
    val te = tri.select(col("x").alias("a"), col("y").alias("b"))
      .unionAll(tri.select(col("x").alias("a"), col("z").alias("b")))
      .unionAll(tri.select(col("y").alias("a"), col("z").alias("b")))
      .groupBy("a", "b").agg(count(lit(1)).alias("__s"))
    norm.join(te, Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        coalesce(col("__s"), lit(0L)).alias("support"))
  }

  /** Bounded-round k-truss peeling: repeatedly delete EDGES whose
    * triangle support is < k−2 for exactly `rounds` sweeps, then report
    * the surviving edges with their final support. The edge-granular
    * sibling of [[kCore]]: a node survives k-core by having enough
    * neighbors, an edge survives k-truss only if enough COMMON neighbors
    * corroborate it — so chains and stars peel even when their degrees
    * are high, and what remains is mutually-witnessed template structure.
    * Each sweep recomputes support (two equi-joins, [[edgeTriangleSupport]]'s
    * shape) and semi-joins the survivors; the edge set feeds back each
    * round, so lineage is checkpoint-truncated per round. The FIXED round
    * count is the operator definition ([[kCore]]'s stance). */
  def kTruss(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 3 && rounds >= 1 && rounds <= 8,
      s"kTruss: need k >= 3 and 1 <= rounds <= 8, got k=$k rounds=$rounds")
    val ckpt = Iterate.checkpointer(edges.sparkSession.sparkContext)
    var e = ckpt(edges
      .select(least(col("src"), col("dst")).alias("a"),
        greatest(col("src"), col("dst")).alias("b"))
      .filter(col("a") =!= col("b")).distinct())
    for (_ <- 1 to rounds) {
      val sup = edgeTriangleSupport(e.select(col("a").alias("src"),
        col("b").alias("dst")))
      e = ckpt(sup.filter(col("support") >= k - 2).select("a", "b"))
    }
    edgeTriangleSupport(e.select(col("a").alias("src"), col("b").alias("dst")))
  }

  /** Personalized PageRank: power iteration whose teleport mass returns
    * to a SEED set instead of spreading uniformly —
    *   rank'(v) = (1−d)·[v ∈ S]/|S| + d · Σ_{(u,v,w)} rank(u) · w/outw(u)
    * — so scores measure proximity to the seeds, not global authority.
    * Curation use: seed a small set of known-good documents/domains and
    * let trust flow through the link graph (the TrustRank shape); or
    * seed one user and rank the graph by relevance to them. Same
    * determinism contract as [[pagerank]]: DECIMAL(28,14) contribution
    * sums, 9-dp per-round rounding, dangling mass leaks. Nodes appear iff
    * they touch an edge; a seed absent from the edge set still counts in
    * |S| but its teleport share simply vanishes (mass leaks, as with
    * dangling nodes). */
  def personalizedPagerank(edges: DataFrame, seeds: DataFrame, iters: Int,
                           damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 16,
      s"personalizedPagerank: need 1 <= iters <= 16, got $iters")
    val nodes = edges.select(col("src").alias("node"))
      .union(edges.select(col("dst").alias("node")))
      .distinct()
    val seedSet = seeds.select("node").distinct()
    val ns = seedSet.count()
    require(ns > 0, "personalizedPagerank: empty seed set")
    val base = nodes
      .join(seedSet.withColumn("__s", lit(1)), Seq("node"), "left")
      .select(col("node"),
        (coalesce(col("__s"), lit(0)).cast("double") / lit(ns.toDouble))
          .alias("__base"))
    val outw = edges.groupBy("src").agg(sum("w").alias("__outw"))
    var ranks = base.select(col("node"), col("__base").alias("rank"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(outw, "src")
        .join(ranks.select(col("node").alias("src"), col("rank")), "src")
        .select(col("dst").alias("node"),
          (col("rank") * col("w") / col("__outw"))
            .cast("decimal(28,14)").alias("__c"))
      val sums = contrib.groupBy("node").agg(sum("__c").alias("__cs"))
      ranks = base.join(sums, Seq("node"), "left").select(col("node"),
        round(lit(1.0 - damping) * col("__base") +
          lit(damping) * coalesce(col("__cs").cast("double"), lit(0.0)), 9)
          .alias("rank"))
    }
    ranks
  }

  /** Synchronous label-propagation communities, `rounds` fixed sweeps:
    * every node starts labeled with its own id; each sweep every node
    * simultaneously adopts the most frequent label among its neighbors,
    * ties broken toward the SMALLEST label — a strict total order, so
    * each sweep is a deterministic function of the previous labeling on
    * any engine and partitioning (classic async LPA is run-order
    * dependent; this is the reproducible variant). Communities are finer
    * than connected components: a chain of weak LSH collisions bridging
    * two template families stays two communities where CC merges them.
    * Per sweep: one edge⋈labels equi-join, one (node, label) count
    * aggregation (map-side partials), one min-of-struct argmax — the
    * rank-free tie-break. The FIXED round count is the operator
    * definition ([[pagerank]]'s stance); labels feed back each round, so
    * lineage is truncated per round ([[Iterate.checkpointer]]). Isolated
    * nodes never appear (the node set derives from the edge list).
    * Returns (node, community). */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"labelPropagation: need 1 <= rounds <= 16, got $rounds")
    val ckpt = Iterate.checkpointer(edges.sparkSession.sparkContext)
    val norm = edges
      .select(least(col("src"), col("dst")).alias("a"),
        greatest(col("src"), col("dst")).alias("b"))
      .filter(col("a") =!= col("b")).distinct()
    val und = ckpt(norm.select(col("a").alias("u"), col("b").alias("v"))
      .unionAll(norm.select(col("b").alias("u"), col("a").alias("v"))))
    var labels = und.select(col("u").alias("node")).distinct()
      .select(col("node"), col("node").alias("label"))
    for (_ <- 1 to rounds) {
      val counts = und
        .join(labels.select(col("node").alias("v"), col("label")), "v")
        .groupBy(col("u"), col("label"))
        .agg(count(lit(1)).alias("__c"))
      labels = ckpt(counts.groupBy("u")
        .agg(min(struct((-col("__c")).alias("nc"), col("label").alias("l")))
          .alias("__m"))
        .select(col("u").alias("node"), col("__m.l").alias("label")))
    }
    labels.select(col("node"), col("label").alias("community"))
  }

  /** Harmonic centrality from a seed set, hop-bounded: per-seed BFS
    * distances tracked as (node, seed, dist) state — [[bfsDistances]]
    * generalized to carry the seed label — then
    * centrality(v) = Σ_seeds 1/d(seed, v) over reachable seeds (d ≥ 1;
    * seeds contribute nothing to themselves). The sampled-source
    * estimator (Eppstein-Wang): |seeds| BFS frontiers in one job, state
    * |nodes|·|seeds| at worst, never the all-pairs matrix. The 1/d terms
    * sum in DECIMAL (d is a small integer, so each term rounds
    * identically in both engines before the exact sum). State is
    * referenced twice per round (union + join), so lineage is truncated
    * per round ([[Iterate.checkpointer]]). */
  def harmonicCentrality(edges: DataFrame, seeds: DataFrame,
                         hops: Int): DataFrame = {
    require(hops >= 1 && hops <= 16,
      s"harmonicCentrality: need 1 <= hops <= 16, got $hops")
    val ckpt = Iterate.checkpointer(edges.sparkSession.sparkContext)
    var dist = seeds.select(col("node"), col("node").alias("seed"),
      lit(0L).alias("dist"))
    for (_ <- 1 to hops) {
      val next = dist.alias("d")
        .join(edges.alias("e"), col("d.node") === col("e.src"))
        .select(col("e.dst").alias("node"), col("d.seed").alias("seed"),
          (col("d.dist") + 1).alias("dist"))
      dist = ckpt(dist.unionByName(next)
        .groupBy("node", "seed").agg(min("dist").alias("dist")))
    }
    dist.filter(col("dist") > 0)
      .groupBy("node")
      .agg(count(lit(1)).alias("n_reached"),
        round(sum((lit(1.0) / col("dist").cast("double"))
          .cast("decimal(28,10)")).cast("double"), 6).alias("harmonic"))
      .orderBy("node")
  }

  /** Newman modularity of a node partition: per community c,
    * contribution = m_c/m − (d_c/2m)², summed over communities — the
    * standard "is this clustering better than a random rewiring with
    * the same degrees" score, the quality gate on [[labelPropagation]]'s
    * output before trusting its dedup families. Returns the
    * per-community table (nodes, intra-edges, degree mass,
    * contribution); the total is one more tiny aggregation away. All
    * inputs are exact integers; the two ratio terms are
    * fixed-parenthesization doubles, 6-dp-pinned. Unlabeled endpoints
    * fail loudly (inner join drops them — a partial labeling would
    * silently understate m_c, so labels must cover every edge node;
    * enforced by construction when labels come from the same edge
    * set). */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val norm = edges
      .select(least(col("src"), col("dst")).alias("a"),
        greatest(col("src"), col("dst")).alias("b"))
      .filter(col("a") =!= col("b")).distinct()
    val la = labels.select(col("node").alias("a"), col("community").alias("__ca"))
    val lb = labels.select(col("node").alias("b"), col("community").alias("__cb"))
    val tagged = norm.join(la, "a").join(lb, "b")
    val m = norm.agg(count(lit(1)).alias("__m"))
    val und = norm.select(col("a").alias("u"), col("b").alias("v"))
      .unionAll(norm.select(col("b").alias("u"), col("a").alias("v")))
    val dc = und.join(labels.select(col("node").alias("u"),
        col("community")), "u")
      .groupBy("community").agg(count(lit(1)).alias("__dc"))
    val mc = tagged.filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").alias("community"))
      .agg(count(lit(1)).alias("__mc"))
    val nNodes = labels.groupBy("community")
      .agg(count(lit(1)).alias("n_nodes"))
    nNodes
      .join(dc, Seq("community"), "left").na.fill(0L, Seq("__dc"))
      .join(mc, Seq("community"), "left").na.fill(0L, Seq("__mc"))
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_nodes"),
        col("__mc").alias("intra_edges"), col("__dc").alias("degree_sum"),
        round0(col("__mc").cast("double") / col("__m").cast("double") -
          (col("__dc").cast("double") /
            (lit(2.0) * col("__m").cast("double"))) *
          (col("__dc").cast("double") /
            (lit(2.0) * col("__m").cast("double"))), 6)
          .alias("contribution"))
      .orderBy("community")
  }

  /** Degree assortativity: Pearson correlation of endpoint degrees over
    * the directed edge-end pairs (both directions of each undirected
    * edge — Newman's convention). r > 0 = hubs link hubs; near-dup
    * graphs from template families are strongly assortative, while
    * accidental-collision stars are disassortative — a one-number
    * structure fingerprint. One degree aggregation, two broadcast-sized
    * joins back onto the edge list, DECIMAL moment sums. */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val norm = edges
      .select(least(col("src"), col("dst")).alias("a"),
        greatest(col("src"), col("dst")).alias("b"))
      .filter(col("a") =!= col("b")).distinct()
    val und = norm.select(col("a").alias("u"), col("b").alias("v"))
      .unionAll(norm.select(col("b").alias("u"), col("a").alias("v")))
    val deg = und.groupBy(col("u").alias("node"))
      .agg(count(lit(1)).alias("deg"))
    val ends = und
      .join(deg.select(col("node").alias("u"), col("deg").alias("__dx")), "u")
      .join(deg.select(col("node").alias("v"), col("deg").alias("__dy")), "v")
      .select(col("__dx").cast("double").alias("__x"),
        col("__dy").cast("double").alias("__y"))
    val mom = ends.agg(
      count(lit(1)).alias("__n"),
      sum(col("__x").cast("decimal(28,10)")).alias("__sx"),
      sum(col("__y").cast("decimal(28,10)")).alias("__sy"),
      sum((col("__x") * col("__y")).cast("decimal(28,10)")).alias("__sxy"),
      sum((col("__x") * col("__x")).cast("decimal(28,10)")).alias("__sxx"),
      sum((col("__y") * col("__y")).cast("decimal(28,10)")).alias("__syy"))
    mom.select(col("__n").alias("n_edge_ends"),
      round((col("__sxy").cast("double") / col("__n") -
        (col("__sx").cast("double") / col("__n")) *
          (col("__sy").cast("double") / col("__n"))) /
        (sqrt(col("__sxx").cast("double") / col("__n") -
          (col("__sx").cast("double") / col("__n")) *
            (col("__sx").cast("double") / col("__n"))) *
          sqrt(col("__syy").cast("double") / col("__n") -
            (col("__sy").cast("double") / col("__n")) *
              (col("__sy").cast("double") / col("__n")))), 6)
        .alias("assortativity"))
  }

  /** One-row graph health summary: nodes, normalized edges, connected
    * components ([[ScaleDedup.connectedComponents]] — the checkpointed
    * fixpoint, not a toy BFS), largest-component share, and isolated
    * nodes. The first thing to read on a near-dup graph: a largest
    * share near 1.0 means the banding collapsed (one giant component =
    * dedup would merge the corpus); healthy template families show many
    * small components over mostly-isolated nodes. */
  def graphSummary(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val norm = edges
      .select(least(col("src"), col("dst")).alias("id1"),
        greatest(col("src"), col("dst")).alias("id2"))
      .filter(col("id1") =!= col("id2")).distinct()
    val labels = graft.ops.ScaleDedup.connectedComponents(
      nodes.select(col("id")), norm)
    val comp = labels.groupBy("label").agg(count(lit(1)).alias("__sz"))
      .agg(count(lit(1)).alias("n_components"),
        max("__sz").alias("largest_component"),
        sum(when(col("__sz") === 1, 1L).otherwise(0L)).alias("n_isolated"))
    val nn = nodes.agg(count(lit(1)).alias("n_nodes"))
    val ne = norm.agg(count(lit(1)).alias("n_edges"))
    nn.crossJoin(broadcast(ne)).crossJoin(broadcast(comp))
      .select(col("n_nodes"), col("n_edges"), col("n_components"),
        col("largest_component"), col("n_isolated"),
        round(col("largest_component").cast("double") /
          col("n_nodes").cast("double"), 6).alias("largest_share"))
  }

  /** Adamic-Adar link prediction: score NON-edges (a,b) that share
    * neighbors by Σ_c 1/ln(deg(c)) over common neighbors c — rare
    * shared neighbors say more than hubs. The "which near-dup pair did
    * LSH miss" / "which docs will next be confirmed duplicates" ranking
    * over the candidate graph. Shape: the 2-hop pair enumeration is the
    * triangle-counting wedge join (two equi-joins on node keys, fan-out
    * bounded by degree², never node-pairs²); existing edges drop via one
    * anti-join; the 1/ln terms round to DECIMAL identically per value,
    * so the sum is shuffle-order-exact. A common neighbor is connected
    * to both endpoints, so deg(c) ≥ 2 and ln(deg) > 0 — no division
    * guard needed, the structure provides it. */
  def adamicAdar(edges: DataFrame, topN: Int): DataFrame = {
    require(topN >= 1 && topN <= 100000, s"adamicAdar: bad topN $topN")
    val norm = edges
      .select(least(col("src"), col("dst")).alias("a"),
        greatest(col("src"), col("dst")).alias("b"))
      .filter(col("a") =!= col("b")).distinct()
    val und = norm.select(col("a").alias("u"), col("b").alias("v"))
      .unionAll(norm.select(col("b").alias("u"), col("a").alias("v")))
    val deg = und.groupBy(col("u").alias("node"))
      .agg(count(lit(1)).alias("deg"))
    val wedges = und.alias("x")
      .join(und.alias("y"),
        col("x.v") === col("y.u") && col("x.u") < col("y.v"))
      .select(col("x.u").alias("a"), col("y.v").alias("b"),
        col("x.v").alias("c"))
    wedges.join(norm, Seq("a", "b"), "left_anti")
      .join(deg, col("c") === col("node"))
      .groupBy("a", "b")
      .agg(count(lit(1)).alias("common"),
        // 1/ln(deg) pins to 9 dp before the 14-dp DECIMAL cast (the
        // cross-libm transcendental-output stance); the 9-dp-exact
        // score keeps the (aa_score DESC, a, b) top-N engine-identical
        round(sum(round(lit(1.0) / log(col("deg").cast("double")), 9)
          .cast("decimal(28,14)")).cast("double"), 6).alias("aa_score"))
      .orderBy(desc("aa_score"), col("a"), col("b"))
      .limit(topN)
  }

  /** HITS hubs-and-authorities (Kleinberg) over a directed weighted
    * graph — [[pagerank]]'s mutual-reinforcement sibling: per round,
    *   auth(v) = Σ_{u→v} w · hub(u),  then L1-normalize;
    *   hub(u)  = Σ_{u→v} w · auth(v), then L1-normalize.
    * On the user→event bipartite graph this ranks users by how broadly
    * they touch authoritative event types and event types by the hub
    * mass pointing at them — the classic endorsement split PageRank's
    * single score conflates. Each half-step is one equi-join of the edge
    * list against a |nodes|-sized score table plus a grouped sum (map-
    * side combine); nothing wider than the edge list ever shuffles.
    * Determinism follows the [[pagerank]] recipe: per-edge contributions
    * cast to DECIMAL(28,14) before the sum, per-node scores rounded to
    * 9 dp, and the L1 total re-summed in DECIMAL(18,9) over the rounded
    * values so shuffle order cannot flip a bit on any engine. Nodes with
    * no out-edges keep hub 0; no in-edges, authority 0 (scores live on
    * the full node set, so both engines emit identical row sets).
    *
    * Lineage is truncated per HALF-STEP ([[Iterate.checkpointer]]) —
    * round 18. Unlike [[pagerank]] (one self-reference per round →
    * linear plan growth, no checkpoint needed at small iters), the L1
    * normalization references its input score table TWICE (the total
    * aggregate and the per-row divide), and each round nests two
    * normalizations — the exponential double-reference case
    * Iterate.scala warns about: un-truncated, iters=3 builds ~4³ copies
    * of the edge-join subtree (measured 27-36 s at sf0.01 in the
    * optimizer/recompute, vs ~1 s truncated; values identical).
    * Returns (node, hub, authority) rounded to 6 dp. */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 16, s"hits: need 1 <= iters <= 16, got $iters")
    val ckpt = Iterate.checkpointer(edges.sparkSession.sparkContext)
    val spark = edges.sparkSession
    val nodes = edges.select(col("src").alias("node"))
      .union(edges.select(col("dst").alias("node")))
      .distinct()
    // L1-normalize a (node, __s) score table: DECIMAL re-sum of the
    // already-rounded per-node values makes the total order-independent.
    def l1(scores: DataFrame): DataFrame = {
      val tot = scores.agg(
        sum(col("__s").cast("decimal(18,9)")).cast("double").alias("__t"))
      scores.crossJoin(broadcast(tot))
        .select(col("node"),
          round(when(col("__t") > 0, col("__s") / col("__t"))
            .otherwise(lit(0.0)), 9).alias("__s"))
    }
    var hub = nodes.select(col("node"), lit(1.0).alias("__s"))
    var auth = nodes.select(col("node"), lit(0.0).alias("__s"))
    hub = l1(hub)
    for (_ <- 1 to iters) {
      auth = ckpt(l1(nodes.join(
        edges.join(hub.select(col("node").alias("src"), col("__s")), "src")
          .select(col("dst").alias("node"),
            (col("w") * col("__s")).cast("decimal(28,14)").alias("__c"))
          .groupBy("node")
          .agg(round(sum("__c").cast("double"), 9).alias("__r")),
        Seq("node"), "left")
        .select(col("node"), coalesce(col("__r"), lit(0.0)).alias("__s"))))
      hub = ckpt(l1(nodes.join(
        edges.join(auth.select(col("node").alias("dst"), col("__s")), "dst")
          .select(col("src").alias("node"),
            (col("w") * col("__s")).cast("decimal(28,14)").alias("__c"))
          .groupBy("node")
          .agg(round(sum("__c").cast("double"), 9).alias("__r")),
        Seq("node"), "left")
        .select(col("node"), coalesce(col("__r"), lit(0.0)).alias("__s"))))
    }
    hub.select(col("node"), col("__s").alias("hub"))
      .join(auth.select(col("node"), col("__s").alias("authority")),
        Seq("node"))
      .select(col("node"), round(col("hub"), 6).alias("hub"),
        round(col("authority"), 6).alias("authority"))
  }
}
