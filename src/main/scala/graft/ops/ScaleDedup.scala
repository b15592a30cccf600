package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication at training-data scale: exact, MinHash+LSH, SimHash,
  * n-gram Jaccard.
  *
  * Design for 100 TB: every per-document signature is a pure Column
  * expression over the token array (no explode, no shuffle until the
  * candidate-pair join), hash functions are md5-derived (deterministic,
  * partitioning-independent, reproducible in any engine), and the LSH
  * band join is an equi-join on band keys — Spark shuffles each side once
  * on the band hash, never materializing the O(n²) pair space.
  */
object ScaleDedup {

  /** Deterministic 32-bit hash of a string, seeded: md5 prefix → long.
    * Engine-portable (md5 is standardized), unlike murmur3 `hash()`. */
  def hash32(c: Column, seed: Int): Column =
    conv(substring(md5(concat(c, lit("#" + seed)).cast("binary")), 1, 8), 16, 10).cast("long")

  /** Distinct whitespace tokens of a document. */
  def tokenSet(text: Column): Column = array_distinct(split(text, " "))

  /** Word k-shingles (k consecutive tokens, space-joined), distinct.
    * Array-expression only — no explode. */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(text, " ")
    val n = size(toks)
    array_distinct(
      transform(sequence(lit(0), greatest(n - k, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** Word bigrams of a token array as an array expression — one
    * `sep`-joined string per adjacent pair, EMPTY for single-token
    * inputs (the `n >= 2` guard is load-bearing: Spark's `sequence()`
    * DESCENDS when start > stop, so an unguarded `sequence(1, n-1)`
    * would fabricate a reversed pair). Shared by heapsLaw's bigram
    * binding ('_') and dsirImportance's feature set (' ') so the
    * idiom — and its guard — lives once. */
  def wordBigrams(toks: Column, sep: String): Column =
    // Compiled kernel (round 19): twin of the when/transform/sequence
    // form, whose interpreted lambdas re-evaluated `toks` per element_at
    // — QUADRATIC per document when callers pass the inline split(text)
    // (q_dsir_weights 62.7 s / q_heaps_law 23.9 s on the 10x stress
    // corpus). Same values, order, and n<2/null -> empty-array contract
    // (VecMathSpec pins the equivalence incl. the legacy size(null)=-1
    // branch).
    graft.functions.TextStats.word_bigrams(toks, sep)

  /** One MinHash value: min over the token set of hash32(token, seed). */
  def minhash(tokens: Column, seed: Int): Column =
    array_min(transform(tokens, t => hash32(t, seed)))

  /** Word-k-shingle signature as (n_shingles, mh_0..mh_{n-1}) columns —
    * native kernel (`functions/ShingleMinHashExpr`): shingles built with a
    * StringBuilder, only DISTINCT shingles hashed (duplicates can't move a
    * min), no intermediate shingle-array materialization. Value-identical
    * to `size(shingles(text,k))` + `minhashSignatureCols(shingles(...))`,
    * cross-validated in OpsSpec. */
  def shingleSignature(text: Column, k: Int, numHashes: Int): Seq[Column] = {
    val sig = graft.functions.MinHashSig.shingle_minhash_sig(split(text, " "), k, numHashes)
    sig.getItem(0).alias("n_shingles") +:
      (0 until numHashes).map(i => sig.getItem(i + 1).alias(s"mh_$i"))
  }

  /** MinHash signature as `numHashes` columns named `mh_0..mh_{n-1}`,
    * computed by the native codegen kernel (`functions/MinHashSigExpr`) —
    * one md5 per token per 4-hash group, direct byte slicing, no hex
    * string or base-16 parse. Value-identical to `minhashSignatureCols`
    * (cross-validated in OpsSpec); measured ~2× faster on the signature
    * projection at sf0.1. The single array expression is deterministic, so
    * whole-stage codegen's subexpression elimination evaluates it once per
    * row even though every output column slices it. */
  def minhashSignature(tokens: Column, numHashes: Int): Seq[Column] = {
    val sig = graft.functions.MinHashSig.minhash_sig(tokens, numHashes)
    (0 until numHashes).map(i => sig.getItem(i).alias(s"mh_$i"))
  }

  /** The pure Column-expression form of `minhashSignature` (same values,
    * built from md5/conv/substring built-ins).
    *
    * One md5 digest per token per GROUP of four hashes: a 128-bit digest
    * yields four independent 32-bit slices, so four hash functions need
    * one distinct digest (group g re-salts with "#g") instead of four
    * salted digests — a 4× cut in distinct hash computations whenever the
    * projection shares the digest subtree (the digest arrays are single
    * shared Column instances across the output columns). */
  def minhashSignatureCols(tokens: Column, numHashes: Int): Seq[Column] = {
    val digests = (0 to (numHashes - 1) / 4).map { g =>
      val salted = if (g == 0) tokens
        else transform(tokens, t => concat(t, lit("#" + g)))
      transform(salted, t => md5(t.cast("binary")))
    }
    (0 until numHashes).map { i =>
      val slice = (i % 4) * 8 + 1
      array_min(transform(digests(i / 4),
        m => conv(substring(m, slice, 8), 16, 10).cast("long"))).alias(s"mh_$i")
    }
  }

  /** LSH band key: concat of the band's minhashes — docs sharing a band
    * key are near-duplicate candidates. */
  def bandKey(bandIdx: Int, rowsPerBand: Int): Column =
    concat_ws("_",
      (bandIdx * rowsPerBand until (bandIdx + 1) * rowsPerBand).map(i => col(s"mh_$i")): _*)

  /** Full MinHash-LSH candidate-pair pipeline: signature → bands →
    * oversized-bucket guard → self-join per band → distinct pairs
    * (id1 < id2). `df` must expose `idCol` and `textCol`.
    *
    * Scale: the only shuffles are on the band key. The guard is the part
    * that makes the self-join survive 100 TB: ONE degenerate band key
    * (empty docs, boilerplate) otherwise goes O(n²) in a single reducer.
    * Buckets larger than `maxBucket` are dropped BEFORE the join (standard
    * LSH practice — a bucket that big is noise, not near-duplicates; its
    * members still pair up through their other, more selective bands).
    * The bucket count is a window over the same (band, bkey) key the join
    * shuffles on, so the guard adds no extra exchange on the probe side
    * (the exchange is reused across the window and both join inputs). */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                            numHashes: Int = 8, bands: Int = 4,
                            maxBucket: Int = 64): DataFrame =
    minhashCandidatePairsFromToks(
      df.select(col(idCol), tokenSet(col(textCol)).alias("__toks")),
      idCol, "__toks", numHashes, bands, maxBucket)

  /** [[minhashCandidatePairs]] from a PRECOMPUTED (id, token set) frame
    * — the carry-through entry point (round-13 VERDICT next-round #7):
    * a composite that also verifies candidates exactly
    * (q_llm_prep_fuzzy's Jaccard gate) tokenizes the corpus ONCE and
    * feeds both the signature stage and the verify join from the same
    * frame, instead of paying the scan + split twice. */
  def minhashCandidatePairsFromToks(toks: DataFrame, idCol: String,
                                    toksCol: String, numHashes: Int = 8,
                                    bands: Int = 4,
                                    maxBucket: Int = 64): DataFrame = {
    val rows = numHashes / bands
    // Band fan-out by posexplode over ONE signature projection (round 18):
    // the previous per-band UNION of sig-selects re-ran the scan AND the
    // signature kernel once per band (2 scans + 2 kernel passes at
    // bands=2; AQE exchange reuse only deduped the self-join's second
    // side, not the bands). One select evaluates the kernel once per row
    // (the __sig projection is its own boundary — CollapseProject keeps a
    // multiply-referenced non-cheap expression out of the consumer), and
    // posexplode's pos IS the band index, so (band, bkey) values — and
    // everything downstream: guard window, self-join, distinct — are
    // unchanged. Measured at sf0.1: q_minhash_pairs ~0.69 s → ~0.5 s
    // steady-state; q10/q11 inherit the same cut on their pair stage.
    val sig = toks.select(col(idCol),
      graft.functions.MinHashSig.minhash_sig(col(toksCol), numHashes).alias("__sig"))
    val bandKeys = array((0 until bands).map { b =>
      concat_ws("_", (b * rows until (b + 1) * rows)
        .map(i => col("__sig").getItem(i)): _*)
    }: _*)
    val banded = sig.select(col(idCol),
      posexplode(bandKeys).as(Seq("band", "bkey")))
    // Guard via a count window rather than groupBy-count + join: measured at
    // sf0.1 (ProfileQ, 6 reps) the window plan runs ~0.9 s steady-state vs
    // ~1.6 s for the aggregate+join variant — the window reuses the single
    // (band, bkey) exchange and its sort feeds the SMJ self-join, while the
    // aggregate adds a second exchange and join.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bkey")
    val guarded = banded.withColumn("__bn", count(lit(1)).over(w))
      .filter(col("__bn") <= maxBucket).drop("__bn")
    val l = guarded.select(col(idCol).alias("id1"), col("band"), col("bkey"))
    val r = guarded.select(col(idCol).alias("id2"), col("band"), col("bkey"))
    l.join(r, Seq("band", "bkey")).filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** SimHash from a precomputed array of token hashes, `bits` wide (≤ 32):
    * per bit, sum +1/-1 votes across token hashes; bit set iff the vote is
    * positive. Pure array expressions — one fold per bit, hashes computed
    * once. */
  def simhashFromHashes(hs: Column, bits: Int): Column = {
    val votes = (0 until bits).map { j =>
      aggregate(hs, lit(0),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1))
    }
    votes.zipWithIndex.map { case (v, j) =>
      when(v > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash over a token array (hashes each token with hash32 seed 0) —
    * native codegen kernel (`functions/SimHashExpr`): one md5 + one bit
    * pass per token, versus `bits` separate aggregate folds each
    * recomputing the hash transform in the expression form (measured ~5 s →
    * ~0.4 s at sf0.1). Value-identical to `simhashCols`, cross-validated in
    * OpsSpec. */
  def simhash(tokens: Column, bits: Int = 16): Column =
    graft.functions.SimHash.simhash(tokens, bits)

  /** The pure Column-expression form of `simhash` (same values). */
  def simhashCols(tokens: Column, bits: Int = 16): Column =
    simhashFromHashes(transform(tokens, t => hash32(t, 0)), bits)

  /** Hamming distance between two simhashes (≤ 64 bits). */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** Hamming near-dup pairs over any `bits`-wide hash column, banded so
    * the self-join never goes all-pairs: split the bits into `maxDist+1`
    * bands — by pigeonhole, two hashes within Hamming distance `maxDist`
    * agree EXACTLY on at least one band. The shared engine under text
    * SimHash pairing (`q_simhash_pairs`) and image dHash pairing
    * (`Multimodal.dhashNearDupPairs`).
    *
    * The banding runs over DISTINCT hash VALUES, not rows: perceptual
    * hashes concentrate (every member of a duplicate cluster shares one
    * value), so row-level banding would push the same quadratic
    * candidate block through every band — the degenerate-bucket trap.
    * Value-level banding keeps band buckets bounded by distinct-value
    * counts; ids expand back afterwards: same-value pairs directly
    * (distance 0, within a hash-value group), cross-value pairs through
    * the verified value pairs. Output: (id1 < id2, dist ≤ maxDist) —
    * complete by pigeonhole, identical to an all-pairs evaluation.
    *
    * `maxGroup` guards the one remaining quadratic edge: a hash-value
    * group of n identical hashes contributes n(n−1)/2 same-value pairs —
    * at 100 TB one boilerplate mega-cluster (n in the millions) must not
    * expand. Groups LARGER than `maxGroup` are routed to clustering
    * instead of expanded: they emit a hub STAR (the group's min id paired
    * with each other member, n−1 rows, dist 0) and are represented by the
    * hub alone in cross-value expansion — connected-components over the
    * output yields EXACTLY the same clusters as the full expansion
    * (property-tested), with output linear in group size. Groups at or
    * under the cap expand completely; the default cap is far above any
    * organic group in the fixtures, so capped and uncapped outputs are
    * identical there. Callers consuming raw pair lists (not clusters)
    * should treat a hub-star as "this group is one duplicate class". */
  def hammingNearDupPairs(hashes: DataFrame, idCol: String, hashCol: String,
                          bits: Int, maxDist: Int,
                          maxGroup: Int = 4096): DataFrame = {
    require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")
    require(maxDist >= 0 && maxDist < bits,
      s"maxDist must be in [0, $bits), got $maxDist")
    require(maxGroup >= 1, s"maxGroup must be >= 1, got $maxGroup")
    val nBands = maxDist + 1
    val hv = hashes.select(col(hashCol).alias("__h")).distinct()
    val banded = (0 until nBands).map { b =>
      val lo = b * bits / nBands
      val width = (b + 1) * bits / nBands - lo
      val mask = if (width == 64) lit(-1L) else lit((1L << width) - 1)
      hv.select(col("__h"), lit(b).alias("band"),
        shiftrightunsigned(col("__h"), lo).bitwiseAND(mask).alias("bkey"))
    }.reduce(_ unionAll _)
    val l = banded.select(col("__h").alias("__h1"), col("band"), col("bkey"))
    val r = banded.select(col("__h").alias("__h2"), col("band"), col("bkey"))
    val valuePairs = l.join(r, Seq("band", "bkey"))
      .filter(col("__h1") < col("__h2"))
      .select("__h1", "__h2").distinct()
      .withColumn("dist", hammingDistance(col("__h1"), col("__h2")))
      .filter(col("dist") <= maxDist)
    // Group size and hub come from ONE window over the same __h key the
    // same-value self-join shuffles on (exchange reused, no extra pass).
    val gw = org.apache.spark.sql.expressions.Window.partitionBy("__h")
    val ids = hashes.select(col(idCol), col(hashCol).alias("__h"))
      .withColumn("__n", count(lit(1)).over(gw))
      .withColumn("__hub", min(col(idCol)).over(gw))
    val small = ids.filter(col("__n") <= maxGroup)
    val same = small.select(col(idCol).alias("id1"), col("__h"))
      .join(small.select(col(idCol).alias("id2"), col("__h")), Seq("__h"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), lit(0L).alias("dist"))
    // oversized groups: hub star instead of the quadratic block
    val star = ids.filter(col("__n") > maxGroup && col(idCol) =!= col("__hub"))
      .select(col("__hub").alias("id1"), col(idCol).alias("id2"),
        lit(0L).alias("dist"))
    // cross-value expansion: an oversized group is represented by its hub
    val reps = ids.filter(col("__n") <= maxGroup || col(idCol) === col("__hub"))
    val a = reps.select(col(idCol).alias("__ida"), col("__h").alias("__h1"))
    val b = reps.select(col(idCol).alias("__idb"), col("__h").alias("__h2"))
    val cross = valuePairs.join(a, "__h1").join(b, "__h2")
      .select(least(col("__ida"), col("__idb")).alias("id1"),
        greatest(col("__ida"), col("__idb")).alias("id2"), col("dist"))
    same.unionAll(star).unionAll(cross)
  }

  /** n-gram Jaccard similarity of two documents' shingle sets. */
  /** Asymmetric CONTAINMENT |A∩B| / |A| — near 1.0 when A is quoted
    * inside a (possibly much larger) B, which Jaccard dilutes toward 0.
    * The quote/subset-detection measure, 6-dp rounded. */
  def containment(aTokens: Column, bTokens: Column): Column =
    round(size(array_intersect(aTokens, bTokens)).cast("double")
      / size(aTokens), 6)

  def jaccard(aTokens: Column, bTokens: Column): Column =
    round(size(array_intersect(aTokens, bTokens)).cast("double") /
      size(array_union(aTokens, bTokens)), 6)

  /** Deployment default for [[connectedComponents]]'s `ckptEvery`
    * superstep batching (round 16): the env knob `GRAFT_CC_CKPT_EVERY`
    * lets a long-round corpus deployment (or a ProfileQ A/B) set 2
    * WITHOUT a code edit — halving the O(V) replicated checkpoint
    * writes, the true 1000-executor term — while the unset default
    * stays 1 (bench-optimal at fixture scale; see the superstep note in
    * the loop body). Values are ckptEvery-invariant (spec-pinned
    * 1≡2≡3 in SkewSpec).
    *
    * Decision rule (round 18, VERDICT r17 #5, derived from the
    * BASELINE.md r15–r18 job-count tables): ckptEvery=2 removes
    * ~20-25% of scheduled jobs (q10 54→41, q11 92→76, incr 136→107 on
    * the r18 tree) and HALVES the replicated label-table checkpoint
    * writes, at the cost of a wider per-superstep plan (~constant
    * driver/optimizer overhead per round, visible only when rounds are
    * sub-second) and a 2-round recompute window on executor loss. Set
    * 2 when a round's wall time is dominated by the checkpoint
    * barrier+write rather than the driver — in practice: real
    * multi-executor clusters, or expected fixpoints ≳ 10 rounds.
    * Keep 1 when rounds are sub-second (local/bench scale) or
    * executor churn is high enough that the 2-round replay window
    * matters. 3-4 exist for measurement; the write savings beyond 2
    * are marginal against the widening replay window. */
  def defaultCkptEvery: Int = parseCkptEvery(sys.env.get("GRAFT_CC_CKPT_EVERY"))

  /** Pure parse+validate half of [[defaultCkptEvery]], split out so the
    * knob's failure contract is spec-testable without mutating the JVM
    * environment. Round 17 (ADVICE r16): name the knob in the failure —
    * a bare _.toInt threw an uncontextualized NumberFormatException from
    * deep inside query construction. Round 18 (ADVICE r17): validate the
    * [1, 4] range HERE too, so a parseable-but-out-of-range value ('0',
    * '9') fails at the knob with this one message instead of surfacing
    * later through connectedComponents' separate require with a
    * different one. */
  def parseCkptEvery(raw: Option[String]): Int =
    raw.map { s =>
      val parsed = scala.util.Try(s.trim.toInt).getOrElse(-1)
      if (parsed < 1 || parsed > 4) throw
        new IllegalArgumentException(
          s"GRAFT_CC_CKPT_EVERY must be an integer in [1, 4], got '$s'")
      parsed
    }.getOrElse(1)

  /** Connected components by min-label propagation WITH pointer jumping:
    * every vertex converges to the smallest id reachable through `edges` —
    * turning near-duplicate PAIRS into duplicate CLUSTERS (pick min id per
    * cluster as the canonical survivor).
    *
    * Per iteration: one neighbor-propagation shuffle (join + min-agg) plus
    * one label→label(label) "shortcut" join (path halving), so rounds
    * scale with log(diameter) rather than diameter — a chain of 1M docs
    * converges in ~20 rounds, not 1M. The previous label rides through the
    * aggregate as `__old`, so change detection is a cheap filter-count on
    * the already-checkpointed result instead of an extra full join per
    * iteration. Reliable `checkpoint` (not localCheckpoint) truncates
    * lineage AND survives executor loss — on a long iterative job at
    * 100 TB, losing one executor must not recompute the whole prefix.
    * Throws if the fixpoint is not reached within `maxIter` (a silently
    * partial clustering is worse than a loud failure).
    *
    * Checkpointing mode (reliable vs local, dir defaulting): see
    * [[Iterate.checkpointer]] — the shared policy for every iterative op.
    *
    * Driver round-trips (round 15 — the r14 VERDICT's endorsed perf
    * item: q10's cost is JOB COUNT, not data): fixpoint detection is
    * FUSED into the per-round eager checkpoint via
    * [[graft.functions.CountTrueExpr]] — the materialization job that
    * already runs tallies post-jump label changes into an accumulator
    * as a side effect, so the former `filter(changed).count()` actions
    * (one per `checkEvery` rounds) disappear entirely AND convergence
    * is now observed every round, trimming the surplus post-fixpoint
    * iterations the coarser cadence allowed. The accumulator value is
    * an overcount under retries / the reliable checkpoint's
    * compute+write double pass; the loop branches only on `== 0` vs
    * `> 0`, which is retry-safe.
    *
    * Orphan edge endpoints (round 16 — VERDICT r15 #5): an id appearing
    * in `edges` but not in `vertices` is a CONNECTOR — it joins the
    * label table in round 1 via neighbor propagation (so components
    * that touch only through it still merge, and it appears in the
    * output), but its own id never competes as a label: canonical
    * labels are drawn from DECLARED vertices only. Its first
    * appearance carries a NULL previous label, which the change flag
    * counts as changed via coalesce(…, true) — without that, a round
    * whose only change is an orphan's label could declare fixpoint one
    * round early. Pinned in SkewSpec ("orphan edge endpoints").
    *
    * Input contract: `vertices.id` must be unique (every caller passes a
    * key column) and its plan DETERMINISTIC. Since the round-18
    * active/isolated split, `vertices` is evaluated twice (once frozen
    * into the checkpointed active label table, once lazily for the
    * isolated complement): a duplicated isolated id would pass through
    * verbatim rather than being collapsed by the loop's first groupBy,
    * and a nondeterministic source (sampled ids,
    * monotonically_increasing_id) could land a vertex in both branches
    * or neither. All callers pass deterministic key projections. */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 20,
                          ckptEvery: Int = defaultCkptEvery): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    require(ckptEvery >= 1 && ckptEvery <= 4,
      s"ckptEvery must be in [1, 4], got $ckptEvery")
    val sc = vertices.sparkSession.sparkContext
    val ckpt = Iterate.checkpointer(sc)
    val reliable = Iterate.isReliable(sc)
    val idType = vertices.schema("id").dataType
    val sym = ckpt(edges.select(col("id1").alias("src"), col("id2").alias("dst"))
      .union(edges.select(col("id2").alias("src"), col("id1").alias("dst"))))

    // ACTIVE-VERTEX RESTRICTION (round 18): only vertices that touch an
    // edge can ever change label — an isolated vertex is its own
    // fixpoint from round 0. In a dedup corpus the isolated set is the
    // overwhelming majority (most documents are in NO near-dup pair),
    // yet it previously rode the label table through every
    // propagation/jump shuffle AND every reliable checkpoint write —
    // turning the per-round replicated-write term from O(corpus) into
    // O(near-dup docs) is the difference between checkpointing 100 TB
    // of ids 9 times and checkpointing the tiny candidate set 9 times.
    // Cost: one id-only left_semi/left_anti split of `vertices` against
    // the (checkpointed) symmetric edge list; the isolated side stays a
    // lazy narrow branch unioned into the result, never iterated.
    // Orphan endpoints are unaffected: they are not DECLARED vertices,
    // enter the loop via `nbr` exactly as before, and the canonical
    // labels the loop draws still come from declared (now: declared
    // active) vertices only.
    val srcs = sym.select(col("src").alias("id"))
    val active = vertices.join(srcs, Seq("id"), "left_semi")

    // One min-label round: neighbor-propagation (join + min-agg) then a
    // pointer jump label := label(label) — every label is itself a vertex
    // id and label(x) ≤ x, so the hop strictly accelerates convergence
    // (path halving). Double jumping (a second hop through the first
    // hop's own output) was A/B'd in round 15 and REJECTED: at sf0.1 the
    // LSH cluster graphs' rounds are driven by the neighbor-min
    // propagation, not pointer-chain depth, so the extra hop cut zero
    // rounds (6→6 on q_dedup_clusters) while its extra in-round exchange
    // raised the scheduled-job count 51→57 — the exact metric this loop
    // optimizes. Deep-chain inputs are already covered by single halving
    // (65536-path: ≤2·log₂ rounds). Re-tested in round 18 on the 9-round
    // q_llm_prep_fuzzy graph (the one CC input where extra hops COULD
    // have paid): rounds stayed 9, jobs rose ~90→101, wall 5.4→8.0 s —
    // the verified-pair graphs are propagation-bound at every fixture
    // scale, so the rejection stands. The change flag, when requested,
    // reads the POST-jump label vs the round's starting label: even a
    // vertex whose neighbor-min stood still changes when its
    // label-vertex's label dropped. __chg must ride in the materialized
    // schema (a pruned column's side effect is pruned with it).
    def labelRound(labels: DataFrame,
              flag: Option[org.apache.spark.util.LongAccumulator]): DataFrame = {
      val nbr = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").alias("id"), lit(null).cast(idType).alias("__old"),
          col("label"))
      val next = labels.select(col("id"), col("label").alias("__old"), col("label"))
        .unionByName(nbr)
        .groupBy("id").agg(min("label").alias("label"), max("__old").alias("__old"))
      val hop = next.select(col("id").alias("label"), col("label").alias("__l2"))
      val newLab = coalesce(col("__l2"), col("label"))
      val joined = next.join(hop, Seq("label"), "left")
      // Orphan endpoints (round 16 — VERDICT r15 #5): an id that appears
      // as an edge endpoint but not in `vertices` reaches `next` only via
      // nbr rows, whose __old is NULL — `newLab =!= __old` is then NULL
      // (not TRUE), which CountTrueExpr does not tally, so a round whose
      // ONLY change is an orphan's label could declare fixpoint one round
      // early. coalesce(…, true) counts a first-appearance id as changed
      // unconditionally (it IS a change: the id had no label before);
      // from its next round the id is in `labels` and __old is non-null,
      // so the flag semantics for complete vertex sets are untouched.
      // Note the __chg column must survive into the materialized schema
      // (ckpt) — re-select labels without it only AFTER the checkpoint.
      flag match {
        case Some(acc) => joined.select(col("id"), newLab.alias("label"),
          column(graft.functions.CountTrueExpr(
            expression(coalesce(newLab =!= col("__old"), lit(true))),
            acc)).alias("__chg"))
        case None => joined.select(col("id"), newLab.alias("label"))
      }
    }

    val init = ckpt(active.select(col("id"), col("id").alias("label")))
    // The isolated complement probes the already-materialized initial
    // label table (not `sym` again): one fewer exchange, and the probe
    // side is exactly the id set the loop owns. Unhinted join: at corpus
    // scale the active set is usually broadcastable but can't be
    // ASSUMED so (one viral boilerplate doc can make it huge) — AQE
    // decides per run.
    val isolated = vertices.join(init.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").alias("label"))
    var labels = init
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // Superstep = `ckptEvery` rounds per reliable checkpoint. Round-15
      // A/B at sf0.1 (back-to-back ProfileQ, q_dedup_clusters /
      // q_llm_prep_fuzzy): ckptEvery=2 cuts scheduled jobs a further
      // 51→42-46 / 87-88→71-72 and HALVES the O(V) replicated
      // label-table checkpoint writes — the genuine 1000-executor term,
      // where a checkpoint is a driver barrier plus a distributed-FS
      // write — but costs ~+0.3 s q10 wall at this SF (the wider 4×
      // plan per superstep is driver/optimizer overhead, constant in
      // data size, visible only when rounds are sub-second). Default
      // therefore stays 1 (bench-optimal locally); a long-round corpus
      // deployment sets 2. Change detection tallies the LAST round of
      // the superstep only, which is sufficient: labels are monotone
      // non-increasing, so zero changes in the final round alone proves
      // the fixpoint (the earlier rounds' activity is irrelevant to the
      // stop decision — the same bounded surplus the old every-2-rounds
      // count cadence allowed). Executor loss mid-superstep recomputes
      // from the previous checkpoint — a ckptEvery-round window.
      val steps = math.min(ckptEvery, maxIter - i)
      val acc = sc.longAccumulator(s"graft-cc-changed-$i")
      val stepped = (1 until steps).foldLeft(labels)((l, _) => labelRound(l, None))
      val jumped = ckpt(labelRound(stepped, Some(acc)))
      i += steps
      changed = acc.value // populated by the eager checkpoint's job(s)
      labels = jumped.select("id", "label")
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIter iterations " +
          s"(~$changed label-change observations in the last round) — " +
          "raise maxIter")
    System.err.println(
      s"[graft] connectedComponents: fixpoint within $i rounds " +
        s"(fused change detection, ckptEvery = $ckptEvery, " +
        s"reliable checkpoint = $reliable)")
    fixpointRounds.addAndGet(i)
    labels.unionByName(isolated)
  }

  /** ACCUMULATED [[connectedComponents]] fixpoint rounds in this JVM —
    * the drift-immune iterative-cost metric (driver round-trips scale
    * with it, wall clock does not transfer across hosts). Accumulating
    * (not last-write) so a query that runs CC more than once (the
    * incremental-dedup pattern) reports its TOTAL round-trip cost.
    * Bench resets to 0 before each recorded query and stamps the total
    * into `cc_rounds` (round 18, VERDICT r17 #3). */
  val fixpointRounds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Benchmark decontamination — drop corpus documents that share any
    * word n-gram with an evaluation set (the standard pretraining hygiene
    * stage: eval questions leaked into the training corpus inflate every
    * downstream benchmark; 13 consecutive tokens is the usual collision
    * width, wide enough that chance collisions are negligible).
    *
    * Scale shape: the EVAL side is the small one (benchmarks are KBs–MBs,
    * the corpus is the 100 TB side), so its distinct shingle hashes are
    * BROADCAST; corpus shingle hashes explode and probe them in a
    * broadcast LEFT-SEMI hash join (O(1) per probe — an `arrays_overlap`
    * against the packed eval array was measured 5× slower at sf0.1, its
    * per-doc cost being O(|eval|)). Only the matching doc ids — the
    * contaminated ones, a tiny set by construction — reach the distinct
    * shuffle, and the final anti-join carries them back against the
    * corpus (unhinted: AQE broadcasts when the set is small, which it
    * almost always is — but one leaked boilerplate doc can contaminate
    * unboundedly many corpus copies, so forcing a broadcast would be a
    * 100 TB OOM risk). Document text never shuffles: the hash side's
    * column-pruned scan reads (id, text) and ships only 32-bit hashes
    * into the probe, the output side's scan passes rows through the
    * id-keyed anti-join.
    *
    * An empty eval set broadcasts an empty build side: no probe matches,
    * everything survives — the correct degenerate case. Documents shorter
    * than n tokens hash their whole text as one shingle (`shingles` tail
    * semantics), so verbatim short leaks still collide. */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    evalSet: DataFrame, evalTextCol: String,
                    n: Int = 13): DataFrame = {
    // native kernel (ShingleHashesExpr): one StringBuilder pass, distinct
    // shingles hashed without hex-string round-trips; value-identical to
    // `shingleHashesCols` (cross-validated in OpsSpec)
    def shingleHashes(text: Column) =
      graft.functions.MinHashSig.shingle_hashes(split(text, " "), n)
    val evalHashes = evalSet
      .select(explode(shingleHashes(col(evalTextCol))).alias("__h"))
      .distinct()
    val contaminated = corpus
      .select(col(idCol), explode(shingleHashes(col(textCol))).alias("__h"))
      .join(broadcast(evalHashes), Seq("__h"), "left_semi")
      .select(idCol).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Expression twin of the decontamination shingle-hash key (same values
    * as the `ShingleHashesExpr` kernel; cross-validated in OpsSpec). */
  private[graft] def shingleHashesCols(text: Column, n: Int): Column =
    transform(shingles(text, n), sh => hash32(sh, 0))

  /** Incremental (append-only) dedup — the production shape once a corpus
    * is already deduplicated and a NEW batch arrives: dedup the batch
    * within itself (min-id canonical per fingerprint), then drop anything
    * whose fingerprint already exists in the corpus. Only fingerprints
    * cross the wire — the existing corpus reduces to its distinct
    * fingerprint set before the anti-join (at scale that set is what a
    * deployment maintains as a bucketed fingerprint table, making the
    * anti-join shuffle-free on the corpus side and the whole batch cost
    * independent of corpus size). Returns (idCol, fp) of the batch's
    * surviving canonical rows. */
  def dedupAgainst(batch: DataFrame, existing: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    val canon = batch
      .select(col(idCol), TextAnalysis.fingerprint(col(textCol)).alias("__fp"))
      .groupBy("__fp").agg(min(col(idCol)).alias(idCol))
    val exFp = existing
      .select(TextAnalysis.fingerprint(col(textCol)).alias("__fp")).distinct()
    canon.join(exFp, Seq("__fp"), "left_anti")
      .select(col(idCol), col("__fp").alias("fp"))
  }

  /** Materialize the corpus's distinct fingerprint set as a bucketed
    * table — the maintained state that makes `dedupAgainst` batch-cost
    * independent of corpus size. Bucketing by fp means the batch
    * anti-join reads the table pre-partitioned: only the (small) batch
    * side shuffles, ever. Absorb a deduped batch's new fingerprints with
    * `appendFingerprints` — appends route through the declared bucket
    * layout and never rewrite existing state. */
  def writeFingerprintTable(corpus: DataFrame, textCol: String,
                            table: String, buckets: Int = 8): Unit =
    graft.sources.Bucketing.writeBucketed(
      corpus.select(TextAnalysis.fingerprint(col(textCol)).alias("fp")).distinct(),
      table, "fp", buckets)

  /** Append newly-admitted fingerprints to the maintained table (see
    * `writeFingerprintTable`). */
  def appendFingerprints(batch: DataFrame, table: String): Unit =
    graft.sources.Bucketing.appendBucketed(batch.select("fp"), table)

  /** `dedupAgainst` with the existing side read from the maintained
    * bucketed fingerprint table: within-batch min-id canonical, then an
    * anti-join whose table side carries NO exchange (the bucketed layout
    * IS the join partitioning) — the true incremental-ingest shape where
    * per-batch cost never grows with the corpus. */
  def dedupAgainstTable(spark: org.apache.spark.sql.SparkSession,
                        batch: DataFrame, idCol: String, textCol: String,
                        table: String): DataFrame = {
    val canon = batch
      .select(col(idCol), TextAnalysis.fingerprint(col(textCol)).alias("__fp"))
      .groupBy("__fp").agg(min(col(idCol)).alias(idCol))
    canon.join(spark.table(table).select(col("fp").alias("__fp")),
        Seq("__fp"), "left_anti")
      .select(col(idCol), col("__fp").alias("fp"))
  }

  /** Exact dedup: group by content fingerprint, keep the smallest id.
    * One shuffle on the 128-bit hash — the canonical 100 TB exact-dedup
    * plan (hash, not raw text, crosses the wire ... group keys are
    * md5 strings). */
  def exactDedupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).alias("fp"))
      .agg(min(col(idCol)).alias("keep_id"), count(lit(1)).alias("n_copies"))

  /** k-gram occurrences of every document: one row per (id, __pos, __gh)
    * with `__gh` the md5 of the space-joined k consecutive tokens starting
    * at 0-based token position `__pos`. The shared fan-out of span-level
    * dedup and the novelty score: it rides the scan (narrow projection +
    * explode), and only the 128-bit hash plus an int position ever reach
    * a shuffle — never the gram text. Docs shorter than k tokens emit no
    * rows. */
  def gramOccurrences(df: DataFrame, idCol: String, textCol: String,
                      k: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    val gramStarts = when(size(toks) >= k, sequence(lit(0), size(toks) - k))
      .otherwise(array().cast("array<integer>"))
    df.select(col(idCol), toks.alias("__toks"), explode(gramStarts).alias("__pos"))
      .select(col(idCol), col("__pos"),
        md5(array_join(slice(col("__toks"), col("__pos") + 1, lit(k)), " "))
          .alias("__gh"))
  }

  /** Corpus-wide first-occurrence order for gram occurrences: one
    * hash-partitioned window per gram value, earliest (id, position)
    * first. */
  private def firstOccurrence(idCol: String) =
    org.apache.spark.sql.expressions.Window
      .partitionBy("__gh").orderBy(col(idCol), col("__pos"))

  /** Per-document NOVELTY score: the fraction of a doc's k-gram
    * occurrences whose gram value makes its corpus-wide first appearance
    * in this doc (by (id, position) order). 1.0 = all-new text; a
    * verbatim copy of an earlier doc scores 0.0. The curation signal for
    * "how much does this slice actually add" — the complement of the
    * span-dedup removal set, computed from the same gram fan-out and the
    * same single windowed shuffle, aggregated per doc instead of
    * rewritten. Docs shorter than k tokens report 0 grams and a NULL
    * novelty. */
  def docNovelty(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 8): DataFrame = {
    val agg = gramOccurrences(df, idCol, textCol, k)
      .withColumn("__rn", row_number().over(firstOccurrence(idCol)))
      .groupBy(idCol)
      .agg(count(lit(1)).alias("n_grams"),
        sum(when(col("__rn") === 1, 1L).otherwise(0L)).alias("n_novel"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).alias("n_grams"),
        coalesce(col("n_novel"), lit(0L)).alias("n_novel"),
        when(col("n_grams") > 0,
          round(col("n_novel").cast("double") / col("n_grams"), 6))
          .alias("novelty"))
  }

  /** SPAN-level (substring) dedup — remove duplicated k-token spans
    * corpus-wide, keeping each span's first occurrence (smallest
    * (id, position)). This is the within/across-document granularity of
    * "exact substring" dedup: document-level dedup misses a boilerplate
    * paragraph pasted into thousands of otherwise-distinct pages; this
    * pass cuts every repeat of the paragraph while leaving the rest of
    * each page intact.
    *
    * Shape, per the 100 TB target:
    *   1. each doc fans out to its k-gram occurrences `(id, pos, md5)` —
    *      the fan-out rides the scan (one narrow projection + explode);
    *      only the 128-bit gram hash and an int position shuffle, never
    *      the gram text. A corpus-tokens-sized shuffle is the inherent
    *      cost of substring-granularity dedup (suffix-array builds move
    *      the same volume); there is no smaller exact formulation.
    *   2. one hash-partitioned window over the gram hash marks every
    *      occurrence after the first (`row_number > 1`) — per-gram state
    *      is one counter, no group materialization.
    *   3. marked occurrences expand to covered token positions, dedup,
    *      and collect per doc (shuffle keyed by doc id; the collected set
    *      is bounded by the doc's own token count).
    *   4. the rebuild is a narrow per-row array filter over the original
    *      token array — text never shuffles.
    *
    * Overlapping duplicated spans union their covered positions, so a
    * doc that is a verbatim copy of an earlier one loses everything but
    * (k-1)-sized tail fragments shorter than any duplicated gram.
    * Returns (idCol, text_clean, n_removed) for every input row.
    */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                          k: Int = 8): DataFrame = {
    require(k >= 1, s"span length k must be >= 1, got $k")
    val emptyInts = array().cast("array<integer>")
    val covered = gramOccurrences(df, idCol, textCol, k)
      .withColumn("__rn", row_number().over(firstOccurrence(idCol)))
      .filter(col("__rn") > 1)
      .select(col(idCol),
        explode(sequence(col("__pos"), col("__pos") + (k - 1))).alias("__p"))
      .groupBy(idCol).agg(collect_set(col("__p")).alias("__cov"))
    val cov = coalesce(col("__cov"), emptyInts)
    df.join(covered, Seq(idCol), "left")
      .select(col(idCol),
        array_join(
          filter(
            transform(split(col(textCol), " "),
              (t, i) => when(array_contains(cov, i), lit(null)).otherwise(t)),
            t => t.isNotNull),
          " ").alias("text_clean"),
        size(cov).cast("long").alias("n_removed"))
  }

  /** Incremental connected components — extend an existing clustering
    * with a new batch WITHOUT replaying the old edge set. The prior
    * labeling IS the old graph, condensed: each labeled node contributes
    * one (id — label) star edge, which reproduces exactly the same
    * equivalence classes (labels are min-ids over components), so
    * CC(star(prev) ∪ newEdges) == CC(oldEdges ∪ newEdges) on the full
    * vertex set — incremental ≡ full recompute, oracle-checked. The win
    * at 100 TB: star edges give old components diameter ≤ 2, so the
    * iteration count is driven by the NEW structure only, and the daily
    * batch costs rounds ∝ log(batch), not log(corpus history).
    * `newEdges` must contain every candidate pair touching the new batch
    * (new–new and new–old — exactly what an LSH probe of the new batch
    * against the maintained signature table emits). */
  def ccIncremental(prevLabels: DataFrame, newVertices: DataFrame,
                    newEdges: DataFrame, maxIter: Int = 20): DataFrame = {
    val verts = prevLabels.select(col("id"))
      .unionByName(newVertices.select(col("id"))).distinct()
    val starEdges = prevLabels.filter(col("id") =!= col("label"))
      .select(col("id").alias("id1"), col("label").alias("id2"))
    connectedComponents(verts,
      starEdges.unionByName(newEdges.select(col("id1"), col("id2"))),
      maxIter)
  }

  /** Sorted-neighborhood blocking (the classic entity-resolution
    * windowing): totally order rows by a normalized sort key, pair each
    * row with its next `window` neighbors in that order, and let the
    * caller verify candidates with the real match predicate (levenshtein,
    * field-wise rules, a model). Near-identical records sort adjacently
    * under a well-chosen key, so candidate volume is n·window instead of
    * n² — the blocking alternative to q_token_typos' length-banding when
    * records are long and a lexicographic key is discriminative.
    *
    * The pairing is ONE equi-join: each row explodes its `window`
    * successor ranks and joins them against the rank column — no range
    * self-join, no per-row loop. The global rank window is
    * single-partition (same stance as dictEncode's vocabulary rank) —
    * fine for dimension-sized inputs; at fact scale, range-partition by
    * the sort key and overlap partition boundaries by `window` rows.
    * Returns (id1, id2, rank distance) with id-order normalized within
    * the sort-adjacency. */
  def sortedNeighborPairs(df: DataFrame, idCol: String, sortKey: Column,
                          window: Int): DataFrame = {
    require(window >= 1 && window <= 64,
      s"sortedNeighborPairs: need 1 <= window <= 64, got $window")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__k").asc, col("__id").asc)
    val ranked = df.select(col(idCol).alias("__id"), sortKey.alias("__k"))
      .withColumn("__rk", row_number().over(w))
    val probes = ranked
      .select(col("__id").alias("id1"),
        explode(sequence(col("__rk") + 1, col("__rk") + window)).alias("__tgt"))
    probes.join(ranked.select(col("__id").alias("id2"), col("__rk")),
        col("__tgt") === col("__rk"))
      .select(col("id1"), col("id2"))
  }

  /** EXACT set-similarity self-join via prefix filtering (AllPairs): all
    * pairs with token-set Jaccard ≥ `threshold`, with a NO-MISS guarantee
    * — the deterministic complement to the MinHash-LSH candidate path
    * (which trades recall for speed; see q_dedup_recall for the measured
    * gap). The pruning fact: order every document's tokens by one GLOBAL
    * rank (rarest first) — if two sets reach Jaccard t, they must share a
    * token within their first |x| − ⌈t·|x|⌉ + 1 tokens. So only those
    * prefix tokens are emitted to the candidate equi-join, and because
    * prefixes are rare-first, the heaviest join keys are the LEAST
    * frequent tokens — the fan-out inversion that makes the exact join
    * feasible where a plain token join explodes on stopwords.
    *
    * Shapes: the token-rank table is vocabulary-sized (Heaps-law small —
    * its rank window is deliberately single-partition, same stance as
    * dictEncode) and broadcasts onto the exploded prefix stream;
    * candidates are verified with exact integer intersection sizes over
    * the pair's token arrays. Verification cost is |candidates| — the
    * prefix bound keeps that near the true pair count, never n². */
  def jaccardJoinExact(df: DataFrame, idCol: String, textCol: String,
                       threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"jaccardJoinExact: need 0 < threshold <= 1, got $threshold")
    val w = org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).alias("__id"),
        array_distinct(split(col(textCol), " ")).alias("__ts"))
      .withColumn("__len", size(col("__ts")))
    val ranked = toks.select(explode(col("__ts")).alias("__tok"))
      .groupBy("__tok").agg(count(lit(1)).alias("__df"))
      .withColumn("__rk",
        row_number().over(w.orderBy(col("__df").asc, col("__tok").asc)))
      .select("__tok", "__rk")
    val wDoc = w.partitionBy(col("__id")).orderBy(col("__rk").asc)
    val prefix = toks
      .select(col("__id"), col("__len"), explode(col("__ts")).alias("__tok"))
      .join(broadcast(ranked), "__tok")
      .withColumn("__pos", row_number().over(wDoc))
      .filter(col("__pos") <=
        col("__len") - ceil(lit(threshold) * col("__len")) + 1)
      .select(col("__id"), col("__tok"))
    val cand = prefix.alias("a")
      .join(prefix.alias("b"),
        col("a.__tok") === col("b.__tok") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").alias("id1"), col("b.__id").alias("id2"))
      .distinct()
    cand
      .join(toks.select(col("__id").alias("id1"), col("__ts").alias("__ts1"),
        col("__len").alias("__l1")), "id1")
      .join(toks.select(col("__id").alias("id2"), col("__ts").alias("__ts2"),
        col("__len").alias("__l2")), "id2")
      .withColumn("__i", size(array_intersect(col("__ts1"), col("__ts2"))))
      .withColumn("__u", col("__l1") + col("__l2") - col("__i"))
      // float boundary shared verbatim with the oracle: i >= t·u on the
      // same IEEE doubles either side
      .filter(col("__i").cast("double") >= lit(threshold) * col("__u").cast("double"))
      .select(col("id1"), col("id2"),
        round(col("__i").cast("double") / col("__u").cast("double"), 6)
          .alias("jaccard"))
  }

  /** Keep-BEST-per-cluster canonical selection — what a training-data
    * pipeline actually does after clustering near-dups: keep the
    * highest-quality member (not the arbitrary first), drop the rest.
    * `labels` is a (id, label) clustering ([[connectedComponents]]);
    * `quality` ranks members (higher wins; ties break to the smallest
    * id). One join to tag cluster labels, one min-of-struct aggregate
    * per cluster — map-side combinable, no window over the corpus. */
  def keepBestPerCluster(docs: DataFrame, idCol: String, labels: DataFrame,
                         quality: Column): DataFrame =
    docs.join(labels.select(col("id").alias(idCol),
        col("label").alias("cluster")), idCol)
      .groupBy("cluster")
      .agg(count(lit(1)).alias("cluster_size"),
        min(struct((-quality).alias("q"), col(idCol).alias("id")))
          .alias("__m"))
      .select(col("cluster"), col("__m.id").alias("kept_id"),
        col("cluster_size"),
        (col("cluster_size") - 1).alias("n_dropped"))
      .orderBy("cluster")
}
