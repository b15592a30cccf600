package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

/** Salted join must be result-identical to the plain join; two-phase
  * distinct must equal count(DISTINCT). */
class SkewSpec extends AnyFunSuite with SparkSpec {

  test("saltedJoin ≡ plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of big rows hit key 1 (the hot key)
    val big = (1 to 1000).map(i => (if (i % 10 == 0) i % 7 else 1, i.toLong))
      .toDF("k", "v")
    val small = (0 to 6).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).groupBy("name")
      .agg(count(lit(1)).alias("n"), sum("v").alias("s"))
      .orderBy("name").collect().toSeq
    val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 4,
        bigSaltFrom = Seq("k", "v"))
      .groupBy("name")
      .agg(count(lit(1)).alias("n"), sum("v").alias("s"))
      .orderBy("name").collect().toSeq
    assert(salted === plain)
  }

  test("connectedComponents finds min-label clusters incl. singletons and chains") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {7,8}, singleton {9}
    val verts = Seq(1L, 2L, 3L, 4L, 7L, 8L, 9L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L)).toDF("id1", "id2")
    val got = graft.ops.ScaleDedup.connectedComponents(verts, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 9L))
  }

  test("connectedComponents: ckptEvery superstep batching ≡ per-round") {
    import spark.implicits._
    // a mix of chain (deep), star (wide), and singletons: supersteps
    // (fewer checkpoints, change detection on the superstep's last round
    // only) must be label-for-label identical to per-round checkpointing
    val verts = (1L to 40L).toDF("id")
    val chain = (1L until 15L).map(i => (i, i + 1))
    val star = (17L to 25L).map(i => (16L, i))
    val edges = (chain ++ star ++ Seq((30L, 31L))).toDF("id1", "id2")
    def run(k: Int) = graft.ops.ScaleDedup
      .connectedComponents(verts, edges, ckptEvery = k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val per = run(1)
    assert(run(2) === per)
    assert(run(3) === per)
  }

  test("connectedComponents: isolated vertices bypass the fixpoint loop") {
    import spark.implicits._
    // Round 18: vertices that touch no edge are their own fixpoint from
    // round 0 and are split off BEFORE the loop (the label table the
    // loop shuffles and checkpoints per round is O(edge-touching
    // vertices), not O(corpus)). The split must be invisible in the
    // output: singletons labeled by their own id alongside the looped
    // clusters, and an empty edge set → every vertex a singleton.
    val verts = Seq(1L, 2L, 3L, 7L, 8L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("id1", "id2")
    val got = graft.ops.ScaleDedup.connectedComponents(verts, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 7L -> 7L, 8L -> 8L))
    val noEdges = Seq.empty[(Long, Long)].toDF("id1", "id2")
    val gotNone = graft.ops.ScaleDedup.connectedComponents(verts, noEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotNone === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 7L -> 7L, 8L -> 8L))
  }

  test("parseCkptEvery: knob failures report once, at the knob") {
    import graft.ops.ScaleDedup.parseCkptEvery
    // Round 18 (ADVICE r17): the env knob must validate the [1, 4]
    // range itself — a parseable out-of-range value previously slipped
    // through to connectedComponents' separate require with a
    // different message.
    assert(parseCkptEvery(None) === 1)
    assert(parseCkptEvery(Some(" 2 ")) === 2)
    assert(parseCkptEvery(Some("4")) === 4)
    for (bad <- Seq("0", "5", "9", "-1", "abc", "2.5", "")) {
      val e = intercept[IllegalArgumentException](parseCkptEvery(Some(bad)))
      assert(e.getMessage.contains("GRAFT_CC_CKPT_EVERY"), bad)
      assert(e.getMessage.contains("[1, 4]"), bad)
    }
  }

  test("connectedComponents: orphan edge endpoints converge correctly") {
    import spark.implicits._
    // Round 16 (VERDICT r15 #5): ids that appear as edge endpoints but
    // not in `vertices` enter the label table via neighbor propagation
    // with a NULL __old — before the coalesce fix, a round whose ONLY
    // change was such an orphan's label could declare fixpoint one
    // round early with a not-fully-propagated label. Semantics pinned
    // here (and in the scaladoc): an orphan is a CONNECTOR — it joins
    // the labeling and its component converges THROUGH it, but its own
    // id never competes as a label (canonical labels are drawn from
    // DECLARED vertices only). Orphan 1 anchors a chain (1-2-3): the
    // component labels to 2, the min declared vertex. Orphan 10
    // bridges two otherwise-unconnected vertices (9-10, 10-11): label
    // 9 must propagate THROUGH the orphan to 11 — exactly the path a
    // premature fixpoint would truncate.
    val vertsFull = Seq(1L, 2L, 3L, 9L, 10L, 11L).toDF("id")
    val vertsMissing = Seq(2L, 3L, 9L, 11L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (9L, 10L), (10L, 11L))
      .toDF("id1", "id2")
    def run(v: org.apache.spark.sql.DataFrame) =
      graft.ops.ScaleDedup.connectedComponents(v, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(vertsFull) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      9L -> 9L, 10L -> 9L, 11L -> 9L))
    assert(run(vertsMissing) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L,
      9L -> 9L, 10L -> 9L, 11L -> 9L))
    // Round 17 (ADVICE r16): the ISOLATED bridge — the cases above pass
    // even without the coalesce fix because some declared vertex also
    // changes label in every round. With ONLY {9, 11} declared and the
    // orphan 10 bridging them, round 1's sole change is the orphan's
    // NULL-__old first appearance (9 and 11 both keep their labels):
    // pre-fix the change tally was 0 and the loop declared fixpoint one
    // round early with 11 -> 11. This assertion makes the NULL-__old
    // coalesce load-bearing for the premature-fixpoint regression.
    val vertsIso = Seq(9L, 11L).toDF("id")
    val edgesIso = Seq((9L, 10L), (10L, 11L)).toDF("id1", "id2")
    val gotIso = graft.ops.ScaleDedup.connectedComponents(vertsIso, edgesIso)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotIso === Map(9L -> 9L, 10L -> 9L, 11L -> 9L))
  }

  test("twoPhaseDistinctCount ≡ countDistinct") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i % 3, i % 41)).toDF("g", "v")
    val expect = df.groupBy("g").agg(countDistinct("v").alias("n_distinct_v"))
      .orderBy("g").collect().toSeq
    val got = Skew.twoPhaseDistinctCount(df, Seq("g"), "v")
      .orderBy("g").collect().toSeq
    assert(got === expect)
  }

  test("skewReport quantifies a planted hot key") {
    import spark.implicits._
    // 9 uniform keys × 10 rows + one hot key × 910 rows
    val rows = (1 to 9).flatMap(k => Seq.fill(10)(k)) ++ Seq.fill(910)(0)
    val r = Skew.skewReport(rows.toDF("k"), Seq("k")).head()
    assert(r.getAs[Long]("n_keys") == 10L && r.getAs[Long]("n_rows") == 1000L)
    assert(r.getAs[Long]("max_cnt") == 910L)
    assert(r.getAs[Double]("mean_cnt") == 100.0)
    assert(r.getAs[Double]("skew") == 9.1)
    assert(r.getAs[Double]("p50_cnt") == 10.0)
  }
}
