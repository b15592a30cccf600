package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: tokenization, language ID,
  * quality scoring, fingerprinting. All pure Column expressions
  * (codegen'd, shuffle-free, scale linearly with the scan).
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokenization: words, numbers, or single punctuation
    * marks as separate tokens (GPT-2-style pre-tokenizer shape). */
  def regexTokens(text: Column): Column = {
    // explicit whitespace class (not \s): keeps Java and RE2 in agreement
    // on U+000B so tokenization matches the oracle byte-for-byte
    val cleaned =
      regexp_replace(text, "([^ \t\n\f\rA-Za-z0-9]+)", " $1 ")
    filter(split(trim(cleaned), "[ \t\n\f\r]+"), t => length(t) > 0)
  }

  /** Token count (whitespace). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** PII scrub for training corpora: redact emails then URLs with typed
    * placeholder tokens. RE2-safe patterns (no lookarounds) so the same
    * regexes run in any engine. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>"),
      """https?://[^\s]+""", "<URL>")

  // A per-language tiny stopword table for the n-gram/stopword heuristic
  // language identifier. Public-knowledge stopword lists.
  val StopwordsByLang: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "a", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans"),
    "es" -> Seq("el", "los", "las", "es", "en", "una"),
  )

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Language-ID heuristic: score each language by stopword hits, pick the
    * argmax; 'und' (undetermined) when nothing matches. Deterministic
    * tie-break by language code order en < de < fr < es. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = Seq("en", "de", "fr", "es").map(l => l -> hits(toks, StopwordsByLang(l)))
    val maxScore = greatest(scored.map(_._2): _*)
    scored.reverse.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s > 0 && s === maxScore, lit(l)).otherwise(acc)
    }
  }

  /** Duplicate-line fraction — the Gopher repetition signal that catches
    * boilerplate (nav bars, cookie banners, SEO spam repeat lines):
    * (n_lines − n_distinct_lines) / n_lines. Pure array expression. */
  def dupLineFraction(text: Column): Column = {
    val lines = split(text, "\n")
    round((size(lines) - size(array_distinct(lines))).cast("double") /
      size(lines), 6)
  }

  /** Remediation counterpart of `dupLineFraction`: rewrite the document
    * keeping only the FIRST occurrence of each line, preserving order —
    * the within-document repetition removal production pipelines apply
    * where Gopher-style gates would throw the whole document away. Pure
    * array expression (indexed filter + first-occurrence position):
    * row-local, zero shuffle, the rewrite rides the scan. O(lines²) per
    * row — boilerplate runs are short; a book-length pathology would want
    * a one-pass kernel, same trade recorded on topNgramCharFraction. */
  def dedupLinesInDoc(text: Column): Column = {
    val lines = split(text, "\n")
    concat_ws("\n",
      filter(lines, (x, i) => array_position(lines, x) === i + 1))
  }

  /** Top word-n-gram character fraction (Gopher): characters covered by
    * the single most frequent word n-gram (count × n-gram length, spaces
    * included) over total characters. Catches keyword-stuffing pages a
    * stopword ratio misses. Note the counting pass is O(distinct-grams ×
    * grams) per ROW — fine for web-document lengths, and purely row-local
    * compute (no shuffle); a book-length corpus would swap in a one-pass
    * hash-count kernel like MinHashKernel. Can exceed 1.0 on degenerate
    * repeats ("a a a a"): count×len double-counts overlapping coverage,
    * faithful to the published heuristic. */
  def topNgramCharFraction(text: Column, n: Int = 2): Column =
    round(graft.functions.TextStats.top_ngram_best(text, n).cast("double") /
      length(text), 6)

  /** The pure Column-expression form of `topNgramCharFraction` (same
    * values, cross-validated in OpsSpec). Two performance cliffs the
    * kernel avoids, kept here as documentation: (1) the gram array MUST
    * be bound to a lambda variable via the 1-element-transform "let" —
    * referencing the construction tree inside the counting lambdas
    * re-evaluates it per distinct gram per element, O(n³) string
    * building, measured 235 s/query at sf0.1; (2) even bound, counting
    * is O(distinct × total) comparisons per row vs the kernel's one
    * HashMap pass. */
  def topNgramCharFractionCols(text: Column, n: Int = 2): Column = {
    val toks = tokens(text)
    val grams = transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    val best = get(transform(array(grams), gs =>
      array_max(transform(array_distinct(gs),
        g => length(g) * size(filter(gs, x => x === g))))), lit(0))
    round(best.cast("double") / length(text), 6)
  }

  /** Quality-scoring features: length, token count, mean token length,
    * punctuation ratio, stopword ratio, plus the Gopher repetition family
    * (duplicate-line fraction, top-2-gram character fraction) — the
    * standard pre-training corpus filters (C4/Gopher-style heuristics,
    * public literature). Returns a struct so one projection computes all
    * features. */
  def qualityFeatures(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks)
    val nChars = length(text)
    val nPunct = length(regexp_replace(text, """[^.,;:!?]""", ""))
    val stop = hits(tokens(lower(text)), StopwordsByLang("en"))
    struct(
      nChars.alias("n_chars"),
      nTok.alias("n_tokens"),
      round(nChars.cast("double") / nTok, 6).alias("mean_tok_len"),
      round(nPunct.cast("double") / nChars, 6).alias("punct_ratio"),
      round(stop.cast("double") / nTok, 6).alias("stopword_ratio"),
      dupLineFraction(text).alias("dup_line_ratio"),
      topNgramCharFraction(text, 2).alias("top2_char_ratio"))
  }

  /** Gopher-style keep/drop quality gate over the features. The repetition
    * bounds default to +∞ (inactive) so existing composites keep their
    * semantics; pass e.g. maxDupLineRatio = 0.3, maxTopNgramCharRatio = 0.2
    * to enable the boilerplate/spam filters. */
  def qualityKeep(text: Column, minTokens: Int = 5, maxTokens: Int = 100000,
                  minStopRatio: Double = 0.01,
                  maxDupLineRatio: Double = Double.PositiveInfinity,
                  maxTopNgramCharRatio: Double = Double.PositiveInfinity): Column = {
    val f = qualityFeatures(text)
    val base = f.getField("n_tokens").between(minTokens, maxTokens) &&
      f.getField("stopword_ratio") >= minStopRatio
    val withDup =
      if (maxDupLineRatio.isInfinity) base
      else base && f.getField("dup_line_ratio") <= maxDupLineRatio
    if (maxTopNgramCharRatio.isInfinity) withDup
    else withDup && f.getField("top2_char_ratio") <= maxTopNgramCharRatio
  }

  /** A small fixed merges table for `Bpe.bpe_tokens` — the model artifact
    * a production pipeline trains offline (see `bpeTrainMerges`) and
    * broadcasts; pinned here so token counts are deterministic and the
    * DuckDB oracle can replay the identical table. Common English pairs,
    * rank = position (lower merges first); includes chained merges
    * (t+h → th, th+e → the) to exercise multi-level merging. */
  val DefaultBpeMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"),
    ("o", "r"), ("in", "g"), ("o", "f"))

  /** Train a BPE merges table from a corpus — the public GPT-2 recipe:
    * `numMerges` rounds of "count adjacent symbol pairs under the current
    * merges, adopt the most frequent" (ties broken lexicographically for
    * determinism). Each round is ONE distributed pair-count aggregation
    * (explode words → kernel-tokenize under current merges → in-row
    * adjacent pairs → groupBy count → top-1 to the driver), so the driver
    * round-trips `numMerges` times with one small row each — the standard
    * offline-training shape; the APPLY path (`Bpe.bpe_tokens`) stays a
    * zero-shuffle projection. */
  def bpeTrainMerges(df: DataFrame, textCol: String,
                     numMerges: Int): Seq[(String, String)] = {
    val words = bpeWords(df, textCol)
    var merges = Vector.empty[(String, String)]
    var rounds = 0
    while (rounds < numMerges) {
      val top = bpePairCounts(words, merges).limit(1).collect()
      if (top.isEmpty) rounds = numMerges
      else {
        merges :+= ((top(0).getString(0), top(0).getString(1)))
        rounds += 1
      }
    }
    merges
  }

  private def bpeWords(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).alias("w"))
      .filter(col("w") =!= "")

  /** One round's (a, b, n) adjacent-pair counts under the current merge
    * table, ordered by the adoption rank (count desc, lex asc). */
  private def bpePairCounts(words: DataFrame,
                            merges: Seq[(String, String)]): DataFrame = {
    val syms =
      if (merges.isEmpty)
        // char split; drop the trailing empty piece the regex leaves
        filter(split(regexp_replace(col("w"), "(.)", "$1 "), " "),
          t => length(t) > 0)
      else graft.functions.Bpe.bpe_tokens(col("w"), merges)
    words.select(syms.alias("syms"))
      .filter(size(col("syms")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("syms")) - 2),
        i => struct(col("syms").getItem(i).alias("a"),
          col("syms").getItem(i + 1).alias("b")))).alias("p"))
      .groupBy(col("p.a").alias("a"), col("p.b").alias("b"))
      .agg(count(lit(1)).alias("n"))
      .orderBy(desc("n"), asc("a"), asc("b"))
  }

  /** BATCHED BPE training — the trainer that reaches production vocab
    * sizes: per round, ONE distributed pair-count aggregation, then up to
    * `batchSize` pairs adopted greedily in adoption rank (count desc, lex
    * asc) subject to pairwise SYMBOL-DISJOINTNESS — a pick must not share
    * a symbol with any earlier pick of the same round. Disjointness is
    * what makes the batch a faithful approximation of the sequential
    * trainer: merges over unrelated symbols commute, and no adopted
    * pair's count could have been changed by the other merges of its
    * round (a pair whose count WOULD change shares a symbol and is
    * deferred to the next round). The first pick of every round is
    * exactly the pair the one-job-per-merge trainer adopts, so the
    * batched list agrees with the sequential one on each round's head —
    * and with batchSize = 1 the two trainers are identical.
    *
    * A 32k-entry vocab thus costs ~vocabSize/batchSize Spark jobs
    * instead of vocabSize sequential jobs (measured: 256+ merges in <=
    * 10 rounds on a name-shaped corpus; spec-pinned). `maxCandidates`
    * bounds the driver-side candidate list per round — candidate rows
    * are (symbol, symbol, count) triples, KBs even at 4096.
    * Returns (merges, rounds actually run). */
  def bpeTrainMergesBatched(df: DataFrame, textCol: String, numMerges: Int,
                            batchSize: Int = 64,
                            maxCandidates: Int = 4096): (Seq[(String, String)], Int) = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val words = bpeWords(df, textCol)
    var merges = Vector.empty[(String, String)]
    var rounds = 0
    var exhausted = false
    while (!exhausted && merges.size < numMerges) {
      val cands = bpePairCounts(words, merges).limit(maxCandidates).collect()
      rounds += 1
      if (cands.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        var adopted = 0
        cands.iterator
          .takeWhile(_ => adopted < batchSize && merges.size < numMerges)
          .foreach { r =>
            val (a, b) = (r.getString(0), r.getString(1))
            if (!used(a) && !used(b)) {
              merges :+= ((a, b))
              used += a; used += b
              adopted += 1
            }
          }
      }
    }
    (merges, rounds)
  }

  /** Overlapping token-window chunks — the document chunker every
    * pretraining/retrieval pipeline carries: windows of `size` tokens
    * advancing by `size - overlap`, the last window clipped at the
    * document end. Pure array expressions (sequence → slice → join):
    * zero shuffle, the chunk fan-out rides the scan. Returns an array of
    * chunk strings; pair with posexplode for (chunk_id, chunk_text)
    * rows. */
  def chunkOverlap(text: Column, size: Int, overlap: Int): Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val toks = tokens(text)
    val nChunks = floor((greatest(org.apache.spark.sql.functions.size(toks)
      - overlap, lit(1)) + (stride - 1)) / stride).cast("int")
    transform(sequence(lit(0), nChunks - 1),
      i => concat_ws(" ", slice(toks, i * stride + 1, lit(size))))
  }

  /** Canonical text normalization — the ingest step that makes every
    * downstream fingerprint/dedup/token op see one representation:
    * 1. Unicode NFC composition (native kernel `NormalizeNfcExpr`;
    *    quick-check fast path, zero alloc for already-normal text),
    * 2. strip control characters (except \n, \t) and zero-width
    *    characters (ZWSP/ZWNJ/ZWJ/BOM — invisible dedup poison),
    * 3. collapse space/tab runs to one space and trim.
    * Pure narrow expressions, zero shuffle. The character classes are
    * spelled in RE2-compatible syntax (no Java `&&` intersections) so the
    * DuckDB oracle runs the very same patterns. */
  def normalizeText(text: Column): Column = {
    val nfc = graft.functions.NormalizeNfc.normalize_nfc(text)
    val stripped = regexp_replace(nfc,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x{200B}-\\x{200D}\\x{FEFF}]", "")
    trim(regexp_replace(stripped, "[ \\t]+", " "))
  }

  /** BM25 top-k retrieval: score every document against a small batch of
    * keyword queries and keep the k best per query — the lexical-search
    * baseline a corpus store ships next to its ANN index.
    *
    * Scale shape: the query vocabulary (a handful of terms) is broadcast
    * and FILTERS the exploded token stream map-side before anything
    * shuffles, so the only exchange is a groupBy on (doc, term) hits —
    * proportional to matching postings, not corpus size. Document
    * frequencies are computed on that filtered stream (df of a term =
    * count of docs containing it), never over the full vocabulary. The
    * per-query top-k window plans map-side WindowGroupLimit, so the final
    * exchange carries k rows per query per task.
    *
    * Scoring is Lucene-shape BM25: idf = ln(1 + (N − df + 0.5)/(df + 0.5))
    * (always positive), tf saturation k1, length normalization b. Per-doc
    * term contributions are summed through DECIMAL(28,14) so shuffle
    * order cannot flip low bits, and the score is rounded to 6 dp before
    * the rank window — ranking ties break on doc id, engine-exactly. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(String, String)], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(idCol).alias("doc_id"),
        split(col(textCol), " ").alias("__toks"))
      .select(col("doc_id"), size(col("__toks")).alias("dl"),
        explode(col("__toks")).alias("token"))
    val qtok = queries.toDF("query_id", "qtext")
      .select(col("query_id"),
        explode(split(col("qtext"), " ")).alias("token"))
      .distinct()
    val qvocab = qtok.select("token").distinct()
    val hits = toks.join(broadcast(qvocab), "token")
    val tf = hits.groupBy("doc_id", "token")
      .agg(count(lit(1)).alias("tf"), max("dl").alias("dl"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).alias("df"))
    val stats = docs.agg(count(lit(1)).alias("n_docs"),
      avg(size(split(col(textCol), " "))).alias("avgdl"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf") +
      lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    // per-term contribution pins to 9 dp before the 14-dp DECIMAL sum
    // (idf carries a libm ln; cross-libm transcendental-output stance)
    val contrib = round(idf * (col("tf") * lit(k1 + 1.0)) / denom, 9)
    val scored = tf.join(broadcast(qtok), "token")
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(contrib.cast("decimal(28,14)")).cast("double"), 6)
        .alias("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("score"), col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Multinomial Naive-Bayes bag-of-words classifier, trained and applied
    * in one pass — the shape of the fastText/CCNet-style quality
    * classifiers production pipelines gate on (a linear model over token
    * counts; NB is the closed-form member of that family, so training is
    * two aggregations instead of gradient descent).
    *
    * Train: per-token class counts (one token-keyed shuffle with map-side
    * combine) + Laplace smoothing give each token a log-likelihood ratio
    *   llr(t) = ln((c₁(t)+1)/(T₁+V)) − ln((c₀(t)+1)/(T₀+V));
    * class totals and the doc-count prior are single broadcast rows.
    * Score: tokens join the model and sum llr per doc through
    * DECIMAL(28,14) (shuffle-order-proof), plus the prior ln(N₁/N₀);
    * pred = score > 0. The model table is token-keyed like a term
    * dictionary; for scoring NEW corpora stream-side, pack top-K tokens
    * into a broadcast map as `unigramScoreFrozen` does.
    *
    * Returns (doc_id, score 6-dp, pred). `label` must be a boolean Column
    * over `docs`; docs with no tokens in the vocabulary are dropped (the
    * self-scoring case keeps every doc — its tokens ARE the vocabulary). */
  def naiveBayesScore(docs: DataFrame, idCol: String, textCol: String,
                      label: Column): DataFrame = {
    val lab = docs.select(col(idCol).alias("doc_id"),
      col(textCol).alias("__text"), label.alias("y"))
    val tok = lab.select(col("doc_id"), col("y"),
      explode(tokens(col("__text"))).alias("token"))
    val perTok = tok.groupBy("token").agg(
      sum(when(col("y"), 1L).otherwise(0L)).alias("c1"),
      sum(when(col("y"), 0L).otherwise(1L)).alias("c0"))
    val tot = perTok.agg(sum("c1").alias("t1"), sum("c0").alias("t0"),
      count(lit(1)).alias("v"))
    val pri = lab.agg(
      sum(when(col("y"), 1L).otherwise(0L)).alias("n1"),
      sum(when(col("y"), 0L).otherwise(1L)).alias("n0"))
    // per-token LLR pins to 9 dp before the 14-dp DECIMAL doc sums (the
    // cross-libm transcendental-output stance)
    val model = perTok.crossJoin(broadcast(tot)).select(col("token"),
      round(log((col("c1") + lit(1.0)) / (col("t1") + col("v"))) -
        log((col("c0") + lit(1.0)) / (col("t0") + col("v"))), 9).alias("llr"))
    tok.join(model, "token")
      .groupBy("doc_id")
      .agg(sum(col("llr").cast("decimal(28,14)")).alias("__s"))
      .crossJoin(broadcast(pri))
      .select(col("doc_id"),
        round(log(col("n1").cast("double") / col("n0")) +
          col("__s").cast("double"), 6).alias("score"))
      .withColumn("pred", col("score") > 0)
  }

  /** Persist a trained BPE merges table as the model artifact a pipeline
    * ships: (rank, a, b) parquet, rank = adoption order. The artifact is
    * what production broadcasts to every apply site — train once, apply
    * from storage everywhere (the trainers above; `Bpe.bpe_tokens` for
    * the apply side). */
  def saveBpeMerges(spark: org.apache.spark.sql.SparkSession,
                    merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("rank", "a", "b")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted merges artifact, restoring adoption order. The
    * table is vocabulary-sized — the one intentional driver collect. */
  def loadBpeMerges(spark: org.apache.spark.sql.SparkSession,
                    path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy("rank")
      .select("a", "b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** Corpus-wide boilerplate-line removal (the C4-family pass that strips
    * "subscribe to our newsletter"-style lines): a line counts as
    * boilerplate when it appears in at least `minDocs` DISTINCT documents
    * (per-doc distinct, so a line repeated inside one page doesn't
    * qualify); boilerplate lines are removed from every document.
    *
    * Scale: the boilerplate set is small BY DEFINITION (a line must recur
    * across ≥ minDocs docs), so it is collected into one broadcast array
    * row and the rewrite is a narrow per-row line filter — the corpus
    * never shuffles. The detection pass shuffles distinct (line, count)
    * pairs once; production would hash lines before that shuffle (text
    * kept here so the oracle mirror stays line-exact). */
  def stripBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
                            minDocs: Int, maxBoilerplate: Int = 100000): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val boiler = df
      .select(explode(array_distinct(split(col(textCol), "\n"))).alias("__line"))
      .groupBy("__line").agg(count(lit(1)).alias("__nd"))
      .filter(col("__nd") >= minDocs)
      .agg(collect_list(col("__line")).alias("__bl"))
      // The broadcast assumes the boilerplate set is small; if minDocs is
      // set low enough that it isn't, fail LOUDLY (on the executors,
      // before the array is packed into a driver-sized row) rather than
      // OOM the driver or silently degrade the rewrite.
      .select(when(size(col("__bl")) > maxBoilerplate,
        raise_error(lit(s"stripBoilerplateLines: boilerplate set exceeds " +
          s"$maxBoilerplate lines — raise minDocs or maxBoilerplate")))
        .otherwise(col("__bl")).alias("__bl"))
    df.crossJoin(broadcast(boiler))
      .withColumn(textCol,
        concat_ws("\n", filter(split(col(textCol), "\n"),
          l => !array_contains(col("__bl"), l))))
      .drop("__bl")
  }

  /** Unigram language-model log-probability score — the shape of
    * perplexity-based quality filtering (KenLM/fastText-style: score each
    * document under a reference LM, drop the tails). The "model" here is
    * the corpus's own unigram distribution; production swaps in reference
    * counts from a trusted corpus — the dataflow (freq table joined to
    * exploded tokens, one avg per doc) is identical.
    *
    * Scale: token explode → equi-join on token → per-doc avg. The join
    * shuffles (token, count) pairs, not text; the frequency table is
    * vocabulary-sized so AQE broadcasts it in practice. Returns
    * (idCol, logprob) with logprob = mean over tokens of
    * ln(count(token) / N), rounded 6 dp. */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).alias("__tok"))
    val freq = toks.groupBy("__tok").agg(count(lit(1)).alias("__tf"))
    val n = toks.agg(count(lit(1)).alias("__n"))
    // per-token ln pins to 9 dp and the per-doc mean runs through an
    // exact DECIMAL sum (a raw double avg would be combine-order-
    // dependent AND carry libm ulps into the readout)
    toks.join(freq, "__tok").crossJoin(broadcast(n))
      .groupBy(col(idCol))
      .agg(round0(sum(round(log(col("__tf").cast("double") / col("__n")), 9)
          .cast("decimal(28,9)")).cast("double") /
        count(lit(1)).cast("double"), 6).alias("logprob"))
  }

  /** Bigram LM quality score — the next rung of the perplexity-filter
    * ladder above `unigramLogProb`: per document, the mean add-1-smoothed
    * conditional log-probability ln((c(wᵢ₋₁wᵢ)+1)/(c(wᵢ₋₁)+V)) under the
    * corpus's own bigram counts. Repetitive/templated text scores high,
    * token salad scores low — and unlike the unigram score it penalizes
    * improbable TRANSITIONS, not just rare words.
    *
    * Shape: bigrams are built row-locally as array expressions (no
    * window, no self-join), then counted with one bigram-keyed shuffle —
    * same exchange class as a token frequency table, just a wider key.
    * Scoring joins each bigram instance to its count and its prefix's
    * unigram count; per-doc sums go through DECIMAL(28,14) and divide by
    * the doc's bigram count, rounded 6 dp. Documents with fewer than two
    * tokens have no bigrams and are dropped. */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol), tokens(col(textCol)).alias("__toks"))
      .filter(size(col("__toks")) >= 2)
    val bp = base.select(col(idCol),
        explode(transform(sequence(lit(1), size(col("__toks")) - 1),
          i => concat(element_at(col("__toks"), i), lit(" "),
            element_at(col("__toks"), i + 1)))).alias("big"))
      .withColumn("prev", element_at(split(col("big"), " "), 1))
    val cb = bp.groupBy("big").agg(count(lit(1)).alias("cb"))
    val cu = df.select(explode(tokens(col(textCol))).alias("t"))
      .groupBy("t").agg(count(lit(1)).alias("cu"))
    val vv = cu.agg(count(lit(1)).alias("v"))
    // 9-dp-pinned ln output ahead of the 14-dp DECIMAL doc sums
    val contrib = round(log((col("cb") + lit(1.0)) / (col("cu") + col("v"))), 9)
    bp.join(cb, "big").join(cu, col("prev") === col("t"))
      .crossJoin(broadcast(vv))
      .groupBy(col(idCol))
      .agg(round(sum(contrib.cast("decimal(28,14)")).cast("double") /
        count(lit(1)), 6).alias("logprob"))
  }

  /** Jelinek-Mercer interpolated bigram scorer — [[bigramLogProb]] with
    * the smoothing the LM literature actually ships: per bigram position,
    * log(λ·P_ML(w|prev) + (1−λ)·P_ML(w)), mixing the sharp conditional
    * with the unigram back-off so unseen continuations are graded by
    * their word frequency instead of flattened to one add-one floor.
    * Same scale shape as the add-one variant (row-local bigram arrays,
    * vocabulary-sized count joins, DECIMAL contribution sum); (1−λ) is
    * computed IN the expression (not pre-folded in Scala) so both
    * engines evaluate the identical IEEE subtraction. Bigrams are joined
    * to counts by string key; positions with an unseen bigram cannot
    * occur when scoring the training corpus itself (every instance was
    * counted), which is this operator's contract — scoring NEW text
    * against a frozen table is [[unigramScoreFrozen]]'s shape. */
  def interpolatedLogProb(df: DataFrame, idCol: String, textCol: String,
                          lambda: Double = 0.7): DataFrame = {
    require(lambda > 0 && lambda < 1,
      s"interpolatedLogProb: need 0 < lambda < 1, got $lambda")
    val base = df.select(col(idCol), tokens(col(textCol)).alias("__toks"))
      .filter(size(col("__toks")) >= 2)
    val bp = base.select(col(idCol),
        explode(transform(sequence(lit(1), size(col("__toks")) - 1),
          i => concat(element_at(col("__toks"), i), lit(" "),
            element_at(col("__toks"), i + 1)))).alias("big"))
      .withColumn("prev", element_at(split(col("big"), " "), 1))
      .withColumn("w", element_at(split(col("big"), " "), 2))
    val cb = bp.groupBy("big").agg(count(lit(1)).alias("cb"))
    val cu = df.select(explode(tokens(col(textCol))).alias("t"))
      .groupBy("t").agg(count(lit(1)).alias("cu"))
    val nn = cu.agg(sum(col("cu")).alias("__n"))
    val cup = cu.select(col("t").alias("__pt"), col("cu").alias("__cuprev"))
    val cuw = cu.select(col("t").alias("__wt"), col("cu").alias("__cuw"))
    // 9-dp-pinned ln output ahead of the 14-dp DECIMAL doc sums
    val contrib = round(log(
      lit(lambda) * col("cb").cast("double") / col("__cuprev").cast("double") +
        (lit(1.0) - lit(lambda)) * col("__cuw").cast("double") /
          col("__n").cast("double")), 9)
    bp.join(cb, "big")
      .join(cup, col("prev") === col("__pt"))
      .join(cuw, col("w") === col("__wt"))
      .crossJoin(broadcast(nn))
      .groupBy(col(idCol))
      .agg(round(sum(contrib.cast("decimal(28,14)")).cast("double") /
        count(lit(1)), 6).alias("logprob"))
  }

  /** Kneser-Ney interpolated bigram scorer — the top rung of the
    * perplexity-filter ladder ([[unigramLogProb]] → [[bigramLogProb]] →
    * [[interpolatedLogProb]] → here), and the smoothing n-gram LMs
    * actually ship: per position,
    * ln( (c(prev,w) − D)/c(prev·) + D·N1+(prev,·)/c(prev·) · P_cont(w) )
    * with absolute discount D and the CONTINUATION probability
    * P_cont(w) = N1+(·,w)/N1+(·,·) — "how many contexts does w follow"
    * rather than "how often does w occur", which is what stops
    * high-frequency-but-context-bound tokens from soaking up back-off
    * mass. Denominators are bigram-PREFIX instance counts (tokens that
    * start no bigram don't dilute the conditional). Scoring the training
    * corpus itself, every bigram is seen, so c−D ≥ 1−D > 0 and the log
    * is total.
    *
    * Scale: identical exchange classes to [[bigramLogProb]] — row-local
    * bigram arrays, one bigram-keyed count shuffle plus vocabulary-sized
    * type/prefix tables that AQE broadcasts; text never shuffles.
    * DECIMAL(28,14) contribution sums; 6-dp readout. */
  def kneserNeyLogProb(df: DataFrame, idCol: String, textCol: String,
                       discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1,
      s"kneserNeyLogProb: need 0 < discount < 1, got $discount")
    val base = df.select(col(idCol), tokens(col(textCol)).alias("__toks"))
      .filter(size(col("__toks")) >= 2)
    val bp = base.select(col(idCol),
        explode(transform(sequence(lit(1), size(col("__toks")) - 1),
          i => concat(element_at(col("__toks"), i), lit(" "),
            element_at(col("__toks"), i + 1)))).alias("big"))
      .withColumn("prev", element_at(split(col("big"), " "), 1))
      .withColumn("w", element_at(split(col("big"), " "), 2))
    val cb = bp.groupBy("big").agg(count(lit(1)).alias("cb"))
    val cp = bp.groupBy("prev").agg(count(lit(1)).alias("cp"))
    val types = bp.select("big", "prev", "w").distinct()
    val np = types.groupBy("prev").agg(count(lit(1)).alias("n1p_prev"))
    val nw = types.groupBy("w").agg(count(lit(1)).alias("n1p_w"))
    val nt = types.agg(count(lit(1)).alias("n1p_tot"))
    // 9-dp-pinned ln output ahead of the 14-dp DECIMAL doc sums
    val contrib = round(log(
      (col("cb").cast("double") - lit(discount)) / col("cp").cast("double") +
        (lit(discount) * col("n1p_prev").cast("double") /
          col("cp").cast("double")) *
        (col("n1p_w").cast("double") / col("n1p_tot").cast("double"))), 9)
    bp.join(cb, "big").join(cp, "prev").join(np, "prev").join(nw, "w")
      .crossJoin(broadcast(nt))
      .groupBy(col(idCol))
      .agg(round(sum(contrib.cast("decimal(28,14)")).cast("double") /
        count(lit(1)), 6).alias("logprob"))
  }

  /** Vocabulary coverage curve — the tokenizer-budget readout: what
    * fraction of all token OCCURRENCES does a top-k vocabulary cover,
    * for each checkpoint k. The curve that decides vocab size before
    * training a tokenizer (the knee is the budget; the tail past it is
    * what falls to UNK/byte-fallback). One token-count shuffle; the
    * rank and cumulative-DECIMAL windows run over the vocabulary-sized
    * count table only. Checkpoints beyond the vocabulary are not
    * emitted (coverage is already 1 there). Ties rank (count DESC,
    * token ASC) so the curve is engine-deterministic. */
  def vocabCoverage(tokens: DataFrame, tokenCol: String,
                    checkpoints: Seq[Int]): DataFrame = {
    require(checkpoints.nonEmpty && checkpoints.forall(_ >= 1),
      "vocabCoverage: checkpoints must be positive")
    val counts = tokens.filter(col(tokenCol).isNotNull)
      .groupBy(col(tokenCol).alias("__t"))
      .agg(count(lit(1)).alias("__c"))
    val tot = counts.agg(sum("__c").alias("__tot"))
    val w = Window.orderBy(desc("__c"), col("__t"))
    val cumW = Window.orderBy(desc("__c"), col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("__rank", row_number().over(w).cast("long"))
      .withColumn("__cum", sum("__c").over(cumW))
      .filter(col("__rank").isin(checkpoints.map(_.toLong): _*))
      .crossJoin(broadcast(tot))
      .select(col("__rank").alias("vocab_size"),
        col("__cum").alias("occurrences_covered"),
        round(col("__cum").cast("double") / col("__tot").cast("double"), 6)
          .alias("coverage"))
      .orderBy("vocab_size")
  }

  /** Lexical richness per group: token count, type count, type-token
    * ratio, and the hapax share (types seen exactly once / types) — the
    * fast template-detector: machine-generated or boilerplate-heavy
    * slices show collapsed TTR and hapax rates long before a human
    * reads one document. Two vocabulary-keyed aggregations. */
  def lexicalRichness(df: DataFrame, textCol: String,
                      groupCol: String): DataFrame = {
    val counts = df
      .select(col(groupCol), explode(tokens(col(textCol))).alias("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col(groupCol), col("__t"))
      .agg(count(lit(1)).alias("__c"))
    counts.groupBy(groupCol)
      .agg(sum("__c").alias("n_tokens"),
        count(lit(1)).alias("n_types"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).alias("n_hapax"))
      .select(col(groupCol), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens").cast("double"),
          6).alias("type_token_ratio"),
        round(col("n_hapax").cast("double") / col("n_types").cast("double"),
          6).alias("hapax_share"))
      .orderBy(groupCol)
  }

  /** Per-group token repeat-rate statistics — Yule's K =
    * 10⁴·(Σf²−N)/N² and Simpson's D = Σf(f−1)/(N(N−1)), the two
    * classic "probability a random token pair coincides" readouts (K is
    * length-robust, D is the literal collision probability) — the
    * template-spam detector that complements [[lexicalRichness]]'s
    * TTR/hapax view: TTR collapses on long documents, K does not.
    * Scale shape: the same one token-linear explode to the
    * (group, token) count table (vocabulary-sized) as lexicalRichness,
    * then one bounded group aggregation; Σf² accumulates in
    * DECIMAL(38,0) via pre-widened f (long·long would overflow past
    * f ≈ 3·10⁹ — integer-exact at any corpus size); every ratio divides
    * exact integers once, 6-dp readouts (yule_k signed-zero-safe: the
    * Σf²−N numerator is an exact 0 for all-hapax text and the division
    * can sign it). Single-token groups pin simpson_d NULL (0/0). */
  def repeatRate(df: DataFrame, groupCol: String, textCol: String)
      : DataFrame = {
    val tf = df
      .select(col(groupCol), explode(tokens(col(textCol))).alias("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col(groupCol), col("__t"))
      .agg(count(lit(1)).alias("__c"))
    val f = col("__c").cast("decimal(19,0)")
    val per = tf.groupBy(groupCol).agg(
      count(lit(1)).alias("n_types"),
      sum("__c").alias("n_tokens"),
      sum(f * f).alias("__s2"))
    val nD = col("n_tokens").cast("double")
    val s2 = col("__s2").cast("double")
    per.select(col(groupCol), col("n_tokens"), col("n_types"),
        round0(lit(1.0e4) * (s2 - nD) / (nD * nD), 6).alias("yule_k"),
        when(col("n_tokens") > 1,
          round((s2 - nD) / (nD * (nD - lit(1.0))), 6)).alias("simpson_d"))
      .orderBy(groupCol)
  }

  /** Distinct-n diversity per corpus slice — the text-generation
    * diversity readout (Li et al.'s distinct-1/distinct-2): unique
    * unigrams over total unigrams and unique ADJACENT bigrams over
    * total bigrams. Bigram diversity is the signal [[repeatRate]] and
    * TTR miss: template text that cycles a large vocabulary through the
    * same transitions scores high distinct-1 but low distinct-2.
    * Scale shape: bigrams are row-local array expressions (no window,
    * no self-join — [[collocations]]' construction, space-joined since
    * tokens cannot contain the separator); each arm is one
    * (group, gram)-collapsed count (vocabulary-sized two-phase
    * distinct), joined group-wise. Ratios divide exact longs once,
    * 6-dp readouts. A group with no 2-token document carries NULL
    * bigram columns (left join, mirrored). */
  def ngramDiversity(df: DataFrame, groupCol: String, textCol: String)
      : DataFrame = {
    val toks = df.select(col(groupCol), tokens(col(textCol)).alias("__toks"))
    val uni = toks.select(col(groupCol), explode(col("__toks")).alias("__t"))
      .filter(col("__t") =!= "")
      .groupBy(groupCol)
      .agg(count(lit(1)).alias("n_unigrams"),
        countDistinct("__t").alias("d_unigrams"))
    val bi = toks.filter(size(col("__toks")) >= 2)
      .select(col(groupCol),
        explode(transform(sequence(lit(1), size(col("__toks")) - 1),
          i => concat_ws(" ", element_at(col("__toks"), i),
            element_at(col("__toks"), i + 1)))).alias("__b"))
      .groupBy(groupCol)
      .agg(count(lit(1)).alias("n_bigrams"),
        countDistinct("__b").alias("d_bigrams"))
    uni.join(bi, Seq(groupCol), "left")
      .select(col(groupCol), col("n_unigrams"), col("d_unigrams"),
        round0(col("d_unigrams").cast("double") /
          col("n_unigrams").cast("double"), 6).alias("distinct_1"),
        col("n_bigrams"), col("d_bigrams"),
        round0(col("d_bigrams").cast("double") /
          col("n_bigrams").cast("double"), 6).alias("distinct_2"))
      .orderBy(groupCol)
  }

  /** PMI collocation mining — multi-word-expression extraction for
    * tokenizer/vocabulary curation: adjacent token pairs ranked by
    * pointwise mutual information ln(p(ab) / (p(a)·p(b))), the classic
    * collocation statistic (high PMI = the pair co-occurs far above
    * chance — "los angeles", not "of the"). `minCount` suppresses the
    * low-frequency noise PMI is notorious for (a pair seen once between
    * two rare words maxes the statistic).
    *
    * Shape: bigrams are row-local array expressions (no window, no
    * self-join) counted with one bigram-keyed shuffle; unigram counts are
    * one token-keyed shuffle. Both count tables are vocabulary-sized, so
    * the two count joins and the broadcast totals never touch corpus-scale
    * rows again; the final top-N is TakeOrderedAndProject. PMI is
    * computed in a fixed double parenthesization ((cb/m) / ((ca/n)·(cb2/n)))
    * and 6-dp-rounded so the statistic is engine-exact. */
  def collocations(df: DataFrame, textCol: String, minCount: Long = 5L,
                   topN: Int = 50): DataFrame = {
    val base = df.select(tokens(col(textCol)).alias("__toks"))
    val bigrams = base.filter(size(col("__toks")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__toks")) - 1),
        i => struct(element_at(col("__toks"), i).alias("w1"),
          element_at(col("__toks"), i + 1).alias("w2")))).alias("b"))
      .select(col("b.w1"), col("b.w2"))
    val cb = bigrams.groupBy("w1", "w2").agg(count(lit(1)).alias("cb"))
    val cu = base.select(explode(col("__toks")).alias("t"))
      .groupBy("t").agg(count(lit(1)).alias("cu"))
    val totals = cu.agg(sum(col("cu")).alias("__n")).crossJoin(
      cb.agg(sum(col("cb")).alias("__m")))
    val c1 = cu.select(col("t").alias("w1"), col("cu").alias("c1"))
    val c2 = cu.select(col("t").alias("w2"), col("cu").alias("c2"))
    val pmi = log((col("cb").cast("double") / col("__m").cast("double")) /
      ((col("c1").cast("double") / col("__n").cast("double")) *
        (col("c2").cast("double") / col("__n").cast("double"))))
    cb.filter(col("cb") >= minCount)
      .join(c1, "w1").join(c2, "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("cb").alias("pair_count"),
        round(pmi, 6).alias("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topN)
  }

  /** Rank-biased overlap (Webber et al.) between two per-query rankings,
    * truncated at depth k — the ranker-change diff metric: how much do
    * two runs agree, weighted toward the top?
    *   RBO@k = Σ_{d=1..k} (1−p)·p^(d−1) · |A_d ∩ B_d| / d.
    * Prefix-overlap sizes come from one equi-join of the two runs on
    * (query, doc): a shared doc counts toward every depth ≥ its worse
    * rank, so X_d is a bounded explode + count over runs-sized tables —
    * the corpus is never touched (feed this the OUTPUT of bm25TopK /
    * qlmTopK / an ANN run). Depth weights are precomputed IEEE literals
    * injected into both engines (the ewmaWeights stance — no cross-engine
    * pow), each term rounds to 12 dp before its DECIMAL sum. Queries in
    * either run with zero overlap still report (overlap 0, rbo 0).
    * Returns (query, overlap_at_k, rbo) with rbo 6-dp. */
  def rankBiasedOverlap(runA: DataFrame, runB: DataFrame, queryCol: String,
                        docCol: String, rankCol: String, k: Int,
                        p: Double): DataFrame = {
    require(k >= 1 && k <= 1000, s"rankBiasedOverlap: bad k $k")
    require(p > 0.0 && p < 1.0, s"rankBiasedOverlap: bad p $p")
    val weights = (1 to k).map(d => (1 - p) * math.pow(p, d - 1))
    val a = runA.select(col(queryCol).alias("__q"), col(docCol).alias("__doc"),
      col(rankCol).cast("long").alias("__ra")).filter(col("__ra") <= k)
    val b = runB.select(col(queryCol).alias("__q"), col(docCol).alias("__doc"),
      col(rankCol).cast("long").alias("__rb")).filter(col("__rb") <= k)
    val xd = a.join(b, Seq("__q", "__doc"))
      .select(col("__q"),
        explode(sequence(greatest(col("__ra"), col("__rb")), lit(k.toLong)))
          .alias("d"))
      .groupBy("__q", "d").agg(count(lit(1)).alias("__x"))
    val grid = a.select("__q").union(b.select("__q")).distinct()
      .select(col("__q"), explode(sequence(lit(1L), lit(k.toLong))).alias("d"))
    val wcol = weights.zipWithIndex.foldLeft(lit(0.0)) {
      case (acc, (w, i)) => when(col("d") === (i + 1), lit(w)).otherwise(acc)
    }
    grid.join(xd, Seq("__q", "d"), "left")
      .select(col("__q"), col("d"),
        coalesce(col("__x"), lit(0L)).alias("__x"), wcol.alias("__w"))
      .groupBy("__q")
      .agg(max(when(col("d") === k, col("__x"))).alias("overlap_at_k"),
        round(sum(round(col("__w") *
            (col("__x").cast("double") / col("d").cast("double")), 12)
          .cast("decimal(28,12)")).cast("double"), 6).alias("rbo"))
      .select(col("__q").alias(queryCol), col("overlap_at_k"), col("rbo"))
      .orderBy(queryCol)
  }

  /** Pairwise vocabulary overlap between sources — the sources×sources
    * Jaccard matrix ([[klDrift]]'s set-granularity sibling, and the
    * multi-way generalization of the two-corpus diff): for every source
    * pair, |V₁∩V₂| / |V₁∪V₂| over distinct-token vocabularies. The
    * duplicate-content / shared-template radar across a corpus's
    * ingestion feeds. Scale shape: the corpus collapses to the distinct
    * (source, token) table in one shuffle (map-side combined; bounded by
    * sources × vocabulary, never rows); the pair join is token-keyed
    * with fan-out ≤ sources² per token, and union sizes come from
    * inclusion-exclusion on the vocab-size table — text never shuffles.
    * Returns (source1, source2, n1, n2, n_common, jaccard) for
    * source1 < source2, jaccard 6-dp. */
  def sourceOverlap(df: DataFrame, keyCol: String,
                    textCol: String): DataFrame = {
    val vt = df.select(col(keyCol).alias("__k"),
      explode(ScaleDedup.tokenSet(col(textCol))).alias("__t")).distinct()
    val sizes = vt.groupBy("__k").agg(count(lit(1)).alias("__sz"))
    vt.alias("a")
      .join(vt.alias("b"),
        col("a.__t") === col("b.__t") && col("a.__k") < col("b.__k"))
      .groupBy(col("a.__k").alias("source1"), col("b.__k").alias("source2"))
      .agg(count(lit(1)).alias("n_common"))
      .join(broadcast(sizes.select(col("__k").alias("source1"),
        col("__sz").alias("n1"))), "source1")
      .join(broadcast(sizes.select(col("__k").alias("source2"),
        col("__sz").alias("n2"))), "source2")
      .select(col("source1"), col("source2"), col("n1"), col("n2"),
        col("n_common"),
        round(col("n_common").cast("double") /
          (col("n1") + col("n2") - col("n_common")).cast("double"), 6)
          .alias("jaccard"))
      .orderBy("source1", "source2")
  }

  /** TextRank keyword extraction (Mihalcea-Tarau): PageRank over the
    * adjacent-token co-occurrence graph. Bigrams are the same row-local
    * array expressions as [[collocations]] (no window, no self-join);
    * each direction of a pair becomes a weighted directed edge, so the
    * graph is symmetric and [[Graph.pagerank]]'s decimal-pinned rounds
    * apply unchanged. The edge table is vocabulary²-bounded (in practice
    * observed-bigram-sized, far smaller), so the iteration never touches
    * corpus-scale rows — at 100 TB the only corpus-wide work is the one
    * bigram-keyed counting shuffle. Self-loops (repeated tokens) are
    * dropped: they only feed a node's rank back to itself and differ
    * across stemming choices. Returns the top-N (token, rank) by rank,
    * rank rounded 6 dp, ties broken by token. */
  def textrankKeywords(df: DataFrame, textCol: String, iters: Int = 3,
                       topN: Int = 30): DataFrame = {
    val base = df.select(tokens(col(textCol)).alias("__toks"))
    val bigrams = base.filter(size(col("__toks")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__toks")) - 1),
        i => struct(element_at(col("__toks"), i).alias("w1"),
          element_at(col("__toks"), i + 1).alias("w2")))).alias("b"))
      .select(col("b.w1"), col("b.w2"))
      .filter(col("w1") =!= col("w2"))
    val cb = bigrams.groupBy("w1", "w2").agg(count(lit(1)).alias("w"))
    val edges = cb.select(col("w1").alias("src"), col("w2").alias("dst"),
        col("w"))
      .unionAll(cb.select(col("w2").alias("src"), col("w1").alias("dst"),
        col("w")))
    Graph.pagerank(edges, iters)
      .orderBy(desc("rank"), col("node"))
      .limit(topN)
      .select(col("node").alias("token"), round(col("rank"), 6).alias("rank"))
  }

  /** Frozen-vocabulary unigram scorer — the scale shape of
    * `unigramLogProb` for scoring NEW data: the model is a precomputed
    * (token, logp) table (trained offline, e.g. top-K tokens of a trusted
    * corpus), packed into ONE map row and broadcast; every document is
    * scored by a narrow per-row fold (map lookup per token, `oovLogProb`
    * floor for out-of-vocabulary tokens). The token stream never explodes
    * and never shuffles — at 100 TB the whole scoring pass is a
    * projection off the scan, unlike the corpus-self variant whose join
    * must shuffle the exploded tokens.
    *
    * `vocab` must expose (token, logp) and be vocabulary-sized (it is
    * collected into a single broadcast row — raise_error guards the cap).
    * Returns (idCol, score) with score = mean over the document's tokens
    * of logp(token) (floor for OOV), rounded 6 dp. */
  def unigramScoreFrozen(df: DataFrame, idCol: String, textCol: String,
                         vocab: DataFrame, oovLogProb: Double,
                         maxVocab: Int = 1000000): DataFrame = {
    val packed = vocab
      .agg(map_from_entries(collect_list(struct(col("token"), col("logp"))))
        .alias("__v"))
      .select(when(size(map_keys(col("__v"))) > maxVocab,
        raise_error(lit(s"unigramScoreFrozen: vocab exceeds $maxVocab " +
          "entries — trim the table or raise maxVocab")))
        .otherwise(col("__v")).alias("__v"))
    val toks = tokens(col(textCol))
    val total = aggregate(toks, lit(0.0),
      (acc, t) => acc + coalesce(element_at(col("__v"), t), lit(oovLogProb)))
    df.crossJoin(broadcast(packed))
      .select(col(idCol), round(total / size(toks), 6).alias("score"))
  }

  /** Per-source readability report: Flesch reading ease from word /
    * sentence / syllable counts, each a `regexp_count` over the doc (one
    * codegen'd scan, no tokenization shuffle — the raw text reduces to
    * three ints per doc at the scan, then one per-source aggregation).
    * Syllables use the standard vowel-group heuristic ([aeiouy]+ runs);
    * sentence count clamps at 1 so punctuation-free docs stay finite.
    * Per-doc scores are rounded to 6 dp BEFORE the per-source DECIMAL
    * mean so both engines average identical values. */
  def readabilityReport(df: DataFrame, textCol: String, groupCol: String)
      : DataFrame = {
    val words = regexp_count(col(textCol), lit("[A-Za-z]+"))
    val sents = greatest(regexp_count(col(textCol), lit("[.!?]+")), lit(1))
    val syll = regexp_count(lower(col(textCol)), lit("[aeiouy]+"))
    val flesch = round(lit(206.835) -
      lit(1.015) * words.cast("double") / sents.cast("double") -
      lit(84.6) * syll.cast("double") / words.cast("double"), 6)
    df.filter(col(textCol).isNotNull && words > 0)
      .select(col(groupCol).alias("grp"), words.alias("__w"),
        sents.alias("__s"), syll.alias("__y"), flesch.alias("__f"))
      .groupBy("grp")
      .agg(count(lit(1)).alias("n_docs"),
        round(sum(col("__w").cast("decimal(28,8)")).cast("double") /
          count(lit(1)).cast("double"), 6).alias("avg_words"),
        round(sum((col("__y").cast("double") / col("__w").cast("double"))
            .cast("decimal(28,10)")).cast("double") /
          count(lit(1)).cast("double"), 6).alias("avg_syll_per_word"),
        round(sum(col("__f").cast("decimal(28,10)")).cast("double") /
          count(lit(1)).cast("double"), 6).alias("avg_flesch"),
        sum(when(col("__f") < 30, 1L).otherwise(0L)).alias("n_difficult"))
      .orderBy("grp")
  }

  /** Per-source character-class / encoding-damage profile: ratios of
    * letters, digits, whitespace, punctuation and non-ASCII characters,
    * plus counts of docs carrying U+FFFD replacement chars or raw C0
    * control bytes — the mojibake detector a crawl pipeline runs before
    * any model sees the bytes. Each ratio is a `regexp_count` at the
    * scan (per-doc ints, one aggregation; text never shuffles). */
  def charsetProfile(df: DataFrame, textCol: String, groupCol: String)
      : DataFrame = {
    val t = col(textCol)
    val nc = length(t)
    def cnt(pat: String) = regexp_count(t, lit(pat))
    def ratio(c: Column) = sum(c.cast("decimal(28,8)")).cast("double") /
      sum(col("__nc").cast("decimal(28,8)")).cast("double")
    df.filter(t.isNotNull && nc > 0)
      .select(col(groupCol).alias("grp"), nc.alias("__nc"),
        cnt("[A-Za-z]").alias("__l"), cnt("[0-9]").alias("__d"),
        // explicit class, not \s: Java \s is [ \t\n\x0B\f\r] while RE2's
        // excludes \x0B — spell it out so engine and oracle agree on U+000B
        cnt("[ \\t\\n\\x0B\\f\\r]").alias("__w"),
        cnt("[^\\x00-\\x7F]").alias("__na"),
        when(t.contains("�"), 1L).otherwise(0L).alias("__repl"),
        when(cnt("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]") > 0, 1L).otherwise(0L)
          .alias("__ctrl"))
      .groupBy("grp")
      .agg(count(lit(1)).alias("n_docs"),
        sum(col("__nc").cast("bigint")).alias("n_chars"),
        round(ratio(col("__l")), 6).alias("letter_ratio"),
        round(ratio(col("__d")), 6).alias("digit_ratio"),
        round(ratio(col("__w")), 6).alias("space_ratio"),
        round(ratio(col("__na")), 6).alias("non_ascii_ratio"),
        sum("__repl").alias("n_replacement_docs"),
        sum("__ctrl").alias("n_control_docs"))
      .orderBy("grp")
  }

  /** Document fingerprint: 128-bit content hash (md5 of the normalized
    * text) plus a 32-bit numeric prefix for cheap bucketing. Normalization:
    * lowercase + whitespace collapse, the standard exact-dedup key. */
  def fingerprint(text: Column): Column =
    // explicit class, not \s: Java's includes U+000B, RE2's does not —
    // spelled out so the dedup key is identical in engine and oracle
    md5(regexp_replace(lower(trim(text)), "[ \t\n\f\r]+", " ")
      .cast("binary"))

  /** 32-bit numeric form of the fingerprint (hex prefix → long). */
  def fingerprint32(text: Column): Column =
    conv(substring(fingerprint(text), 1, 8), 16, 10).cast("long")

  /** Smoothed KL divergence KL(A‖B) between two corpus slices' unigram
    * token distributions — the text twin of [[Aggregates.psiDrift]]'s
    * numeric drift monitor (did this week's crawl shift vocabulary
    * against the reference corpus?). Add-1 (Laplace) smoothing over the
    * UNION vocabulary keeps every term finite; KL is asymmetric by
    * definition (A = candidate, B = reference).
    *
    * Scale shape: each side reduces to one token-count aggregation
    * (vocab-sized, Heaps-law-small), one full-outer vocab join, and a
    * broadcast totals row; the corpus text never shuffles. Terms are
    * truncated to DECIMAL(28,14) before the final sum (the psiDrift
    * determinism stance) so partitioning cannot flip low bits. */
  /** Jensen-Shannon divergence between two corpus slices' unigram
    * distributions — [[klDrift]]'s SYMMETRIC, bounded twin (JSD ∈
    * [0, ln 2]; KL blows up when the candidate has mass the reference
    * lacks, JSD never does, which makes it the better dashboard number
    * for two peers rather than candidate-vs-reference). Same smoothed
    * vocab-join shape: JSD = ½KL(P‖M) + ½KL(Q‖M), M = (P+Q)/2, both
    * terms from the one joined count table; text never shuffles. */
  def jsDivergence(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def counts(df: DataFrame, side: String) = df
      .select(explode(split(col(textCol), " ")).alias("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).alias(side))
    val j = counts(a, "__ca").join(counts(b, "__cb"), Seq("token"), "full_outer")
      .na.fill(0L, Seq("__ca", "__cb"))
    val totals = j.agg(sum("__ca").alias("__ta"), sum("__cb").alias("__tb"),
      count(lit(1)).alias("__v"))
    j.crossJoin(broadcast(totals))
      .withColumn("__pa", (col("__ca") + lit(1.0)) / (col("__ta") + col("__v")))
      .withColumn("__pb", (col("__cb") + lit(1.0)) / (col("__tb") + col("__v")))
      .withColumn("__m", (col("__pa") + col("__pb")) / lit(2.0))
      // p·ln-ratio pins to 9 dp before the 14-dp DECIMAL cast
      .withColumn("__term", round(
        col("__pa") * log(col("__pa") / col("__m")) / lit(2.0) +
        col("__pb") * log(col("__pb") / col("__m")) / lit(2.0), 9))
      .agg(round(sum(col("__term").cast("decimal(28,14)")).cast("double"), 6)
        .alias("jsd"), count(lit(1)).alias("vocab"))
  }

  def klDrift(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def counts(df: DataFrame, side: String) = df
      .select(explode(split(col(textCol), " ")).alias("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).alias(side))
    val j = counts(a, "__ca").join(counts(b, "__cb"), Seq("token"), "full_outer")
      .na.fill(0L, Seq("__ca", "__cb"))
    val totals = j.agg(sum("__ca").alias("__ta"), sum("__cb").alias("__tb"),
      count(lit(1)).alias("__v"))
    j.crossJoin(broadcast(totals))
      .withColumn("__pa", (col("__ca") + lit(1.0)) / (col("__ta") + col("__v")))
      .withColumn("__pb", (col("__cb") + lit(1.0)) / (col("__tb") + col("__v")))
      // p·ln-ratio pins to 9 dp before the 14-dp DECIMAL cast
      .withColumn("__term",
        round(col("__pa") * log(col("__pa") / col("__pb")), 9))
      .agg(round(sum(col("__term").cast("decimal(28,14)")).cast("double"), 6)
        .alias("kl_ab"), count(lit(1)).alias("vocab"))
  }

  /** Dunning log-likelihood keyness (G²): per token, how surprisingly
    * its frequency differs between two corpus slices,
    *   G² = 2·(a·ln(a/E_a) + b·ln(b/E_b)),  E = margin-proportional
    * expectation — the PER-TOKEN drill-down under the aggregate drift
    * monitors ([[klDrift]]/[[hellingerDrift]] say THAT the slices
    * differ; keyness says WHICH words carry it), signed toward the
    * enriched slice. The corpus-linguistics keyword standard (Dunning
    * 1993), robust at low counts where χ² is not. Same vocab-join shape
    * as the drift ops: two count tables, one full-outer join, broadcast
    * totals, 0·ln 0 = 0 by guard on both engines. Top-N by G². */
  def keyness(a: DataFrame, b: DataFrame, textCol: String,
              topN: Int = 40): DataFrame = {
    def counts(df: DataFrame, side: String) = df
      .select(explode(split(col(textCol), " ")).alias("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).alias(side))
    val j = counts(a, "__ca").join(counts(b, "__cb"), Seq("token"), "full_outer")
      .na.fill(0L, Seq("__ca", "__cb"))
    val totals = j.agg(sum("__ca").alias("__ta"), sum("__cb").alias("__tb"))
    val na = col("__ta").cast("double"); val nb = col("__tb").cast("double")
    val ca = col("__ca").cast("double"); val cb = col("__cb").cast("double")
    val ea = na * (ca + cb) / (na + nb)
    val eb = nb * (ca + cb) / (na + nb)
    val g2 = lit(2.0) * (when(col("__ca") > 0, ca * log(ca / ea))
      .otherwise(lit(0.0)) +
      when(col("__cb") > 0, cb * log(cb / eb)).otherwise(lit(0.0)))
    j.crossJoin(broadcast(totals))
      .select(col("token"), col("__ca").alias("n_a"), col("__cb").alias("n_b"),
        round(g2, 6).alias("g2"),
        when(ca / na >= cb / nb, lit("a")).otherwise(lit("b"))
          .alias("enriched_in"))
      .orderBy(desc("g2"), col("token"))
      .limit(topN)
  }

  /** Capture–recapture corpus-size estimate (Chapman's bias-corrected
    * Lincoln–Petersen): treat two crawls as captures of the same
    * underlying document population, match on the content
    * [[fingerprint]], and estimate
    *   N̂ = (n₁+1)(n₂+1)/(m+1) − 1,  SE = √((n₁+1)(n₂+1)(n₁−m)(n₂−m) /
    *                                       ((m+1)²(m+2)))
    * — "how many documents exist that NEITHER crawl has seen", the
    * coverage question a crawl planner actually asks and no per-corpus
    * profile can answer. Fingerprints deduplicate within each crawl
    * first (a capture is a distinct document). One scan to fingerprints
    * (text never shuffles), two distinct counts and one intersection
    * count via a full-outer fingerprint join. Zero overlap still yields
    * a finite Chapman estimate (the +1s are the point). */
  def captureRecapture(crawl1: DataFrame, crawl2: DataFrame,
                       textCol: String): DataFrame = {
    def fps(df: DataFrame, side: String) = df
      .filter(col(textCol).isNotNull)
      .select(fingerprint(col(textCol)).alias("__fp")).distinct()
      .withColumn(side, lit(1L))
    val j = fps(crawl1, "__a").join(fps(crawl2, "__b"), Seq("__fp"),
        "full_outer")
      .na.fill(0L, Seq("__a", "__b"))
    val m = j.agg(sum("__a").alias("n1"), sum("__b").alias("n2"),
      sum(col("__a") * col("__b")).alias("n_overlap"))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val mm = col("n_overlap").cast("double")
    val est = (n1 + lit(1.0)) * (n2 + lit(1.0)) / (mm + lit(1.0)) - lit(1.0)
    val se = sqrt((n1 + lit(1.0)) * (n2 + lit(1.0)) * (n1 - mm) * (n2 - mm) /
      ((mm + lit(1.0)) * (mm + lit(1.0)) * (mm + lit(2.0))))
    m.select(col("n1"), col("n2"), col("n_overlap"),
      round(est, 6).alias("n_estimated"),
      round(se, 6).alias("se"))
  }

  /** Vocabulary richness estimators off ONE count-of-counts pass:
    * observed types V, singletons N₁, doubletons N₂,
    *   Chao1 = V + N₁²/(2·N₂)      (estimated TRUE vocabulary size)
    *   Good–Turing unseen mass = N₁/N  (probability the next token is
    *                                    a new type)
    * — the pair that prices a tokenizer's OOV future: high unseen mass
    * says the corpus has not shown you its vocabulary yet ([[heapsLaw]]
    * says how fast it will). Token counts collapse to the
    * count-of-counts table (hundreds of rows, the [[Stats.zipfFit]]
    * compression); everything after is scalar. A zero-doubleton corpus
    * pins Chao1 to NULL rather than dividing engines apart. */
  def vocabRichness(df: DataFrame, textCol: String): DataFrame = {
    val counts = df.select(explode(split(col(textCol), " ")).alias("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).alias("__c"))
    val coc = counts.groupBy("__c").agg(count(lit(1)).alias("__m"))
    val m = coc.agg(sum("__m").alias("v_obs"),
      sum(col("__c") * col("__m")).alias("n_tokens"),
      sum(when(col("__c") === 1, col("__m")).otherwise(0L)).alias("singletons"),
      sum(when(col("__c") === 2, col("__m")).otherwise(0L)).alias("doubletons"))
    val n1 = col("singletons").cast("double")
    val n2 = col("doubletons").cast("double")
    m.select(col("v_obs"), col("n_tokens"), col("singletons"),
      col("doubletons"),
      when(col("doubletons") === 0, lit(null).cast("double"))
        .otherwise(round(col("v_obs").cast("double") +
          n1 * n1 / (lit(2.0) * n2), 6)).alias("chao1"),
      round(n1 / col("n_tokens").cast("double"), 6)
        .alias("unseen_mass"))
  }

  /** Heaps'-law vocabulary-growth fit: V(N) ≈ K·N^β estimated by
    * log-log OLS over `checkpoints` corpus prefixes — the companion to
    * [[Stats.zipfFit]]'s rank curve, and the capacity-planning answer to
    * "how much NEW vocabulary will the next 10× of corpus bring"
    * (natural language sits near β ≈ 0.5; β drifting toward 0 means the
    * crawl is exhausting its domain, toward 1 means id-like token
    * pollution). Prefixes are id-order cutoffs; the trick that avoids
    * any per-prefix rescan is the FIRST-SEEN table: V(cutoff) = #tokens
    * whose min doc id is within the cutoff, so one token aggregation
    * and one per-doc count aggregation answer every checkpoint via
    * conditional sums in a single pass each. The OLS runs over ≤
    * `checkpoints` scalar points with DECIMAL moments. */
  def heapsLaw(df: DataFrame, idCol: String, textCol: String,
               checkpoints: Int = 10): DataFrame = {
    require(checkpoints >= 3 && checkpoints <= 100,
      s"heapsLaw: need 3 <= checkpoints <= 100, got $checkpoints")
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(idCol).alias("__id"),
        explode(split(col(textCol), " ")).alias("token"))
      .filter(col("token") =!= "")
    val firstSeen = toks.groupBy("token").agg(min("__id").alias("__fd"))
    val perDoc = toks.groupBy("__id").agg(count(lit(1)).alias("__nt"))
    val maxId = perDoc.agg(max("__id").alias("__mx"))
    def cut(k: Int) =
      col("__mx").cast("double") * lit(k.toDouble / checkpoints)
    val nExprs = (1 to checkpoints).map(k =>
      sum(when(col("__id").cast("double") <= cut(k), col("__nt"))
        .otherwise(0L)).alias(s"__n_$k"))
    val vExprs = (1 to checkpoints).map(k =>
      sum(when(col("__fd").cast("double") <= cut(k), 1L)
        .otherwise(0L)).alias(s"__v_$k"))
    val nRow = perDoc.crossJoin(broadcast(maxId))
      .agg(nExprs.head, nExprs.tail: _*)
    val vRow = firstSeen.crossJoin(broadcast(maxId))
      .agg(vExprs.head, vExprs.tail: _*)
    val pts = nRow.crossJoin(vRow)
      .select(explode(array((1 to checkpoints).map(k =>
        struct(col(s"__n_$k").alias("nt"), col(s"__v_$k").alias("vt"))): _*))
        .alias("__p"))
      .select(col("__p.nt").alias("__nt"), col("__p.vt").alias("__vt"))
      .filter(col("__nt") > 0 && col("__vt") > 0)
      // 9-dp-pinned ln outputs ahead of the DECIMAL(28,10) OLS moments
      .select(round(log(col("__nt").cast("double")), 9).alias("__x"),
        round(log(col("__vt").cast("double")), 9).alias("__y"))
    val m = pts.agg(count(lit(1)).alias("n_checkpoints"),
      sum(col("__x").cast("decimal(28,10)")).alias("__sx"),
      sum(col("__y").cast("decimal(28,10)")).alias("__sy"),
      sum((col("__x") * col("__x")).cast("decimal(28,10)")).alias("__sxx"),
      sum((col("__y") * col("__y")).cast("decimal(28,10)")).alias("__syy"),
      sum((col("__x") * col("__y")).cast("decimal(28,10)")).alias("__sxy"))
    val n = col("n_checkpoints").cast("double")
    def d(c: String) = col(c).cast("double")
    val covn = n * d("__sxy") - d("__sx") * d("__sy")
    val varxn = n * d("__sxx") - d("__sx") * d("__sx")
    val varyn = n * d("__syy") - d("__sy") * d("__sy")
    val beta = covn / varxn
    m.select(col("n_checkpoints"),
      round0(beta, 6).alias("beta"),
      round0(exp((d("__sy") - beta * d("__sx")) / n), 6).alias("k_coef"),
      round0(covn * covn / (varxn * varyn), 6).alias("r2"))
  }

  /** Windowed token co-occurrence with GloVe's 1/d distance weighting:
    * for every ordered position pair within `window`, accumulate
    * weight 1/d for the (left, right) token pair — the co-occurrence
    * matrix an embedding trainer consumes, generalizing [[collocations]]
    * beyond adjacency. Top-N pairs by weighted count. Scale shape: the
    * pair expansion is a ROW-LOCAL array expression (×window fan-out at
    * the scan — no self-join, no explode-then-join), so the only
    * shuffle carries (w1, w2) pairs with map-side combine; weights are
    * exact 1/d doubles DECIMAL-summed, ties broken (weight DESC, w1,
    * w2). */
  def cooccurrence(df: DataFrame, textCol: String, window: Int = 4,
                   topN: Int = 50, maxPairs: Long = 200000000L): DataFrame = {
    require(window >= 1 && window <= 16,
      s"cooccurrence: need 1 <= window <= 16, got $window")
    val toks = filter(split(col(textCol), " "), x => x =!= "")
    // Compiled one-pass pair kernel (round 19): the nested-HOF form
    //   flatten(transform(sequence(1,n−1), i => transform(sequence(1,
    //     least(window, n−i)), d => struct(element_at(toks,i),
    //     element_at(toks,i+d), d))))
    // was QUADRATIC per document — the lambdas are interpreted and
    // `toks` is this inline filter(split(text)) subtree, so every
    // element_at re-ran the split+filter over the whole document,
    // O(n²·window) per doc. Same pair order/values (VecMathSpec-style
    // cross-validation in OpsSpec); measured 144 s → seconds on the
    // 10× stress corpus.
    val pairs = graft.functions.TextStats.cooc_pairs(toks, window)
    // maxBucket/maxCell stance for the ×window fan-out: the pair volume
    // (≤ window × Σ tokens) is data-dependent, so the static window cap
    // alone can't stop a 100 TB caller from fanning the scan stage into
    // the trillions. One row-local token-count pre-pass (text never
    // shuffles; the aggregate is a single long) guards BEFORE the explode.
    val nTok = df.filter(col(textCol).isNotNull)
      .agg(sum(size(toks).cast("long")).alias("__ntok"))
    df.filter(col(textCol).isNotNull)
      .filter(size(toks) >= 2)
      .crossJoin(broadcast(nTok))
      .select(explode(when(col("__ntok") * lit(window.toLong) > maxPairs,
        raise_error(lit(s"cooccurrence: window * total tokens exceeds " +
          s"$maxPairs pair rows — lower window, pre-filter the corpus, " +
          "or raise maxPairs")))
        .otherwise(pairs)).alias("p"))
      .select(col("p.w1"), col("p.w2"),
        (lit(1.0) / col("p.d").cast("double")).alias("__w"))
      .groupBy("w1", "w2")
      .agg(count(lit(1)).alias("n_pairs"),
        round(sum(col("__w").cast("decimal(28,10)")).cast("double"), 6)
          .alias("weight"))
      .orderBy(desc("weight"), col("w1"), col("w2"))
      .limit(topN)
  }

  /** Tokenizer fertility per source: BPE tokens emitted per whitespace
    * word — THE tokenizer-evaluation number (fertility ≈ 1 means the
    * vocabulary fits the corpus; ≫ 1 means the domain pays a context-
    * length tax, the readout that decides whether a tokenizer needs
    * domain merges before a training run). Composes the real
    * [[functions.Bpe]] kernel over the frozen [[DefaultBpeMerges]]
    * artifact with the corpus's own word counts: both counts are
    * row-local array expressions at the scan (text never shuffles), one
    * per-source DECIMAL aggregation. */
  def bpeFertility(df: DataFrame, textCol: String, groupCol: String)
      : DataFrame = {
    val words = size(filter(split(col(textCol), " "), x => x =!= ""))
    val bpe = size(graft.functions.Bpe.bpe_tokens(col(textCol),
      DefaultBpeMerges))
    df.filter(col(textCol).isNotNull)
      .select(col(groupCol).alias("grp"),
        words.cast("long").alias("__w"), bpe.cast("long").alias("__b"))
      .filter(col("__w") > 0)
      .groupBy("grp")
      .agg(count(lit(1)).alias("n_docs"),
        sum("__w").alias("n_words"), sum("__b").alias("n_bpe"),
        round(sum(col("__b").cast("decimal(28,8)")).cast("double") /
          sum(col("__w").cast("decimal(28,8)")).cast("double"), 6)
          .alias("fertility"))
      .orderBy("grp")
  }

  /** Deduplication savings report: what does exact keep-first dedup
    * ([[fingerprint]] on the normalized text, minimum id wins) buy, per
    * source, in DOCUMENTS and in TOKENS — the number that justifies (or
    * kills) a dedup stage in a training-data budget: a 30% doc-dup rate
    * that is only a 4% token saving is boilerplate short-docs, not
    * corpus bloat. Scale shape: one scan computes (fingerprint, token
    * count) per doc — text itself never shuffles; the keeper table is
    * one fingerprint-keyed min aggregation joined back fingerprint-
    * keyed; per-source rollup is group-count-sized. */
  def dedupSavings(df: DataFrame, idCol: String, textCol: String,
                   groupCol: String): DataFrame = {
    val base = df.filter(col(textCol).isNotNull)
      .select(col(groupCol).alias("grp"), col(idCol).alias("__id"),
        fingerprint(col(textCol)).alias("__fp"),
        size(filter(split(col(textCol), " "), x => x =!= ""))
          .cast("long").alias("__ntok"))
    val keepers = base.groupBy("__fp").agg(min("__id").alias("__keep"))
    base.join(keepers, "__fp")
      .withColumn("__kept", (col("__id") === col("__keep")).cast("long"))
      .groupBy("grp")
      .agg(count(lit(1)).alias("n_docs"), sum("__kept").alias("n_unique"),
        sum("__ntok").alias("tokens_total"),
        sum(col("__kept") * col("__ntok")).alias("tokens_unique"),
        round(lit(1.0) - sum(col("__kept") * col("__ntok")).cast("double") /
          sum("__ntok").cast("double"), 6).alias("token_savings"))
      .orderBy("grp")
  }

  /** Hellinger distance between two corpus slices' unigram token
    * distributions: BC = Σ √(p_i·q_i) (the Bhattacharyya coefficient)
    * and H = √(1 − BC) — the bounded, symmetric drift metric that
    * complements [[klDrift]]'s asymmetric divergence (H is a true metric
    * on distributions; a vocabulary a slice never uses simply
    * contributes 0, so no smoothing constant enters the definition).
    * Scale shape mirrors [[klDrift]]: each slice reduces to its
    * vocabulary-sized count table, one full-outer vocabulary join, one
    * broadcast totals row. Engine-exactness: p and q are doubles from
    * exact counts, √(p·q) is IEEE-exact, and the BC sum accumulates in
    * DECIMAL so addend order can't flip bits. */
  def hellingerDrift(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def counts(df: DataFrame, side: String) = df
      .select(explode(split(col(textCol), " ")).alias("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).alias(side))
    val j = counts(a, "__ca").join(counts(b, "__cb"), Seq("token"), "full_outer")
      .na.fill(0L, Seq("__ca", "__cb"))
    val totals = j.agg(sum("__ca").alias("__ta"), sum("__cb").alias("__tb"))
    j.crossJoin(broadcast(totals))
      .withColumn("__term", sqrt(
        (col("__ca").cast("double") / col("__ta").cast("double")) *
        (col("__cb").cast("double") / col("__tb").cast("double"))))
      .agg(count(lit(1)).alias("vocab"),
        sum(col("__term").cast("decimal(28,14)")).alias("__bc"))
      .select(col("vocab"),
        round(col("__bc").cast("double"), 6).alias("bhattacharyya"),
        round(sqrt(greatest(lit(1.0) - col("__bc").cast("double"), lit(0.0))),
          6).alias("hellinger"))
  }

  /** RAKE stopword list — deliberately small and FROZEN: it is part of
    * the operator definition (the oracle embeds the same list), not a
    * tunable. */
  private[graft] val RakeStopwords = Seq("the", "a", "an", "and", "of",
    "to", "in", "is", "are", "was", "were", "for", "on", "with", "as",
    "by", "at", "or", "be", "this", "that", "it", "from")

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    * maximal runs of content words between stopword/punctuation breaks;
    * word score = degree/frequency (degree = summed length of phrases
    * the word occurs in); phrase score = sum of its words' scores. The
    * cheap, model-free keyword extractor a corpus card runs per source.
    *
    * Everything is RE2-safe regex + array expressions at the scan (no
    * lookarounds, explicit whitespace classes): lowercase → non-letters
    * become a break marker → stopwords become breaks → remaining token
    * runs are the phrases. The only shuffles carry words and ≤`maxWords`-
    * word phrases (never documents); word scores are a vocabulary-sized
    * broadcast; per-phrase score sums run through DECIMAL(28,14) so
    * addend order can't flip bits. Ties: (score DESC, phrase ASC). */
  def rakeKeywords(df: DataFrame, textCol: String, topK: Int = 20,
                   maxWords: Int = 3): DataFrame = {
    val stops = RakeStopwords
    // punctuation/digits → ' 0 ' break marker ('0' can't collide with a
    // word: words are all-letter by construction). WHITESPACE IS KEPT —
    // spaces separate words WITHIN a phrase; only punctuation and
    // stopwords break phrases. Explicit whitespace class, not \s.
    val cleaned = regexp_replace(lower(col(textCol)),
      "[^a-z \t\n\f\r]+", " 0 ")
    val toks = filter(split(cleaned, "[ \t\n\f\r]+"), t => length(t) > 0)
    val marked = transform(toks,
      t => when(t === "0" || t.isInCollection(stops), lit("|")).otherwise(t))
    val phrases = filter(
      transform(split(array_join(marked, " "), "[ ]*\\|[ ]*"),
        p => trim(p)),
      p => length(p) > 0)
    val phrase = df.select(explode(phrases).alias("phrase"))
      .filter(size(split(col("phrase"), " ")) <= maxWords)
    // word degree/frequency over phrase INSTANCES (multiplicity counts)
    val words = phrase.select(col("phrase"),
        size(split(col("phrase"), " ")).alias("__len"))
      .select(explode(split(col("phrase"), " ")).alias("word"), col("__len"))
      .groupBy("word")
      .agg(count(lit(1)).alias("__freq"), sum("__len").alias("__deg"))
      .select(col("word"),
        (col("__deg").cast("double") / col("__freq").cast("double"))
          .alias("__ws"))
    // score each DISTINCT phrase once; occurrence counts ride along
    val counts = phrase.groupBy("phrase").agg(count(lit(1)).alias("n_occurrences"))
    counts
      .select(col("phrase"), col("n_occurrences"),
        explode(split(col("phrase"), " ")).alias("word"))
      .join(broadcast(words), "word")
      .groupBy("phrase", "n_occurrences")
      .agg(round(sum(col("__ws").cast("decimal(28,14)")).cast("double"), 6)
        .alias("score"))
      .orderBy(desc("score"), col("phrase"))
      .limit(topK)
  }

  /** Dirichlet-smoothed query-likelihood top-k retrieval — the language-
    * model twin of [[bm25TopK]] (same posting shape, different scoring
    * family; shipping both is how a retrieval stack A/Bs its ranker).
    *
    * Full QL scores every document, but the score decomposes into a
    * postings part plus a doc-length-only part:
    *   score(q,d) = Σ_{t∈q∩d} ln(1 + tf/(μ·cf_t/|C|)) + n_q·ln(μ/(dl+μ))
    * Ranking over documents that match ≥1 query term (the retrieval
    * contract) therefore needs only the hit postings, exactly like BM25.
    *
    * Scale shape mirrors [[bm25TopK]]: the query vocabulary is broadcast
    * and filters the exploded token stream map-side, so the one exchange
    * carries matching postings only; collection frequencies come from
    * that filtered stream; the per-query top-k window plans map-side
    * WindowGroupLimit. Query terms absent from the corpus (cf = 0) are
    * dropped from n_q — the standard OOV convention (with them the
    * smoothed probability is tf/(dl+μ), zero for every non-matching doc,
    * and the whole query scores −∞). Contributions accumulate through
    * DECIMAL(28,14) and the score is rounded to 6 dp before the rank
    * window; ties break on doc id, engine-exactly. */
  def qlmTopK(docs: DataFrame, idCol: String, textCol: String,
              queries: Seq[(String, String)], k: Int,
              mu: Double = 2000.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(idCol).alias("doc_id"),
        split(col(textCol), " ").alias("__toks"))
      .select(col("doc_id"), size(col("__toks")).alias("dl"),
        explode(col("__toks")).alias("token"))
    val qtok = queries.toDF("query_id", "qtext")
      .select(col("query_id"),
        explode(split(col("qtext"), " ")).alias("token"))
      .distinct()
    val qvocab = qtok.select("token").distinct()
    val hits = toks.join(broadcast(qvocab), "token")
    // collection frequency of each query term + total corpus token count
    val cf = hits.groupBy("token").agg(count(lit(1)).alias("cf"))
    val ctot = docs.agg(
      sum(size(split(col(textCol), " ")).cast("long")).alias("c_len"))
    // per-query count of in-vocabulary terms (cf > 0 by construction:
    // cf rows exist only for terms with at least one posting)
    val nq = qtok.join(cf, "token")
      .groupBy("query_id").agg(count(lit(1)).alias("nq"))
    val tf = hits.groupBy("doc_id", "token")
      .agg(count(lit(1)).alias("tf"), max("dl").alias("dl"))
    // 9-dp-pinned ln output ahead of the 14-dp DECIMAL query-doc sums
    val term = round(log(lit(1.0) + col("tf").cast("double") /
      (lit(mu) * (col("cf").cast("double") / col("c_len").cast("double")))), 9)
    val scored = tf.join(broadcast(qtok), "token")
      .join(broadcast(cf), "token")
      .crossJoin(broadcast(ctot))
      .groupBy("query_id", "doc_id")
      .agg(sum(term.cast("decimal(28,14)")).cast("double").alias("__s"),
        max("dl").alias("__dl"))
      .join(broadcast(nq), "query_id")
      .select(col("query_id"), col("doc_id"),
        round(col("__s") + col("nq").cast("double") *
          log(lit(mu) / (col("__dl").cast("double") + lit(mu))), 6)
          .alias("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("score"), col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Ranked-retrieval evaluation report: per query, DCG@k / ideal-DCG@k
    * / NDCG@k (graded, exponential gain), AP@k and reciprocal rank
    * (binary, rel > 0) — the offline eval harness every ranker change
    * runs before shipping.
    *
    * `run` is a ranking (query_id, doc_id, rank ascending from 1);
    * `rel` carries graded relevance (query_id, doc_id, rel ≥ 0) and may
    * cover docs the run missed (those feed the IDEAL ranking and the
    * AP denominator — an unreturned relevant doc must cost recall).
    *
    * Scale shape: everything is keyed by query_id; the run side is ≤k
    * rows per query by construction, and the ideal side reduces rel to
    * its top-k per query through a (rel desc, doc_id) window that plans
    * map-side WindowGroupLimit — no global window, no driver loop. Gains
    * (2^rel − 1) are exact integers for integer grades; discount sums
    * accumulate in DECIMAL(28,14); outputs round to 6 dp. Queries with
    * no relevant docs report ndcg/ap/rr = 0 (not NULL) so the macro
    * average over them is well-defined on both engines. */
  def rankingEval(run: DataFrame, rel: DataFrame, k: Int): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    def discount(rankC: Column) =
      log2(rankC.cast("double") + lit(1.0))
    def gain(relC: Column) =
      (pow(lit(2.0), relC.cast("double")) - lit(1.0))
    val topk = run.filter(col("rank") <= k)
      .join(rel.select(col("query_id"), col("doc_id"), col("rel")),
        Seq("query_id", "doc_id"), "left")
      .na.fill(0L, Seq("rel"))
    // gain/discount pins to 9 dp before the 14-dp DECIMAL cast — the
    // discount carries a libm log2 (cross-libm transcendental stance)
    val dcg = topk.groupBy("query_id")
      .agg(sum(round(gain(col("rel")) / discount(col("rank")), 9)
        .cast("decimal(28,14)")).cast("double").alias("__dcg"))
    val idealW = W.partitionBy("query_id").orderBy(desc("rel"), col("doc_id"))
    val idcg = rel.filter(col("rel") > 0)
      .withColumn("__irank", row_number().over(idealW))
      .filter(col("__irank") <= k)
      .groupBy("query_id")
      .agg(sum(round(gain(col("rel")) / discount(col("__irank")), 9)
        .cast("decimal(28,14)")).cast("double").alias("__idcg"))
    // binary metrics over the ≤k run rows: cumulative precision at each
    // relevant hit (per-query window over ≤k rows), recall base R from
    // the full rel table
    val hitW = W.partitionBy("query_id").orderBy("rank")
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val binary = topk
      .withColumn("__hit", when(col("rel") > 0, 1L).otherwise(0L))
      .withColumn("__cumhits", sum("__hit").over(hitW))
      .groupBy("query_id")
      .agg(sum(when(col("__hit") === 1L,
          (col("__cumhits").cast("double") / col("rank").cast("double"))
            .cast("decimal(28,14)")).otherwise(lit(null)))
          .cast("double").alias("__sumprec"),
        min(when(col("__hit") === 1L, col("rank"))).alias("__firsthit"))
    val rbase = rel.filter(col("rel") > 0)
      .groupBy("query_id").agg(count(lit(1)).alias("__r"))
    dcg.join(idcg, Seq("query_id"), "left")
      .join(binary, Seq("query_id"), "left")
      .join(rbase, Seq("query_id"), "left")
      .select(col("query_id"),
        round(col("__dcg"), 6).alias("dcg"),
        round(coalesce(col("__idcg"), lit(0.0)), 6).alias("idcg"),
        round(when(coalesce(col("__idcg"), lit(0.0)) > 0,
          col("__dcg") / col("__idcg")).otherwise(lit(0.0)), 6)
          .alias("ndcg"),
        round(when(col("__r").isNotNull,
          coalesce(col("__sumprec"), lit(0.0)) /
            least(col("__r"), lit(k.toLong)).cast("double"))
          .otherwise(lit(0.0)), 6).alias("ap"),
        round(when(col("__firsthit").isNotNull,
          lit(1.0) / col("__firsthit").cast("double"))
          .otherwise(lit(0.0)), 6).alias("rr"))
  }

  /** Per-source character-class (script) mix report — the corpus-QA
    * dashboard row that catches an ingest gone wrong (a "code" source
    * suddenly 40% punctuation, an "en" source full of digits): per doc,
    * the fraction of letter / digit / space / other characters (9-dp,
    * empty docs dropped), then per-group DECIMAL means. Entirely
    * row-local regex counting on the scan — text never shuffles, one
    * group-sized aggregation. Regexes are RE2-safe single classes;
    * lengths are exact integers so the per-doc ratios are
    * engine-identical doubles. */
  def scriptMix(df: DataFrame, groupCol: Column, textCol: String)
      : DataFrame = {
    val t = col(textCol)
    def frac(cls: String) =
      round(length(regexp_replace(t, cls, "")).cast("double") /
        length(t).cast("double"), 9)
    val base = df.filter(t.isNotNull && length(t) > 0)
      .select(groupCol.alias("grp"),
        frac("[^A-Za-z]").alias("__l"), frac("[^0-9]").alias("__d"),
        frac("[^ ]").alias("__s"),
        round(lit(1.0) -
          length(regexp_replace(t, "[^A-Za-z]", "")).cast("double") /
            length(t).cast("double") -
          length(regexp_replace(t, "[^0-9]", "")).cast("double") /
            length(t).cast("double") -
          length(regexp_replace(t, "[^ ]", "")).cast("double") /
            length(t).cast("double"), 9).alias("__o"))
    def m(c: String) = round0(
      sum(col(c).cast("decimal(28,9)")).cast("double") / count(lit(1)), 6)
    base.groupBy("grp").agg(count(lit(1)).alias("n_docs"),
        m("__l").alias("letter_frac"), m("__d").alias("digit_frac"),
        m("__s").alias("space_frac"), m("__o").alias("other_frac"))
      .orderBy("grp")
  }

  /** PII exposure audit per source — the governance readout BEFORE
    * [[scrubPii]] runs (how much is there to scrub, and where): per
    * group, docs scanned, docs containing at least one email / URL, and
    * total match counts, using scrubPii's exact RE2-safe patterns so the
    * audit counts precisely what the scrub would redact. Row-local
    * regexp_extract_all counting on the scan; one group-sized
    * aggregation; all-integer readouts plus a 6-dp affected-doc rate. */
  def piiAudit(df: DataFrame, groupCol: Column, textCol: String)
      : DataFrame = {
    val email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
    val url = """https?://[^\s]+"""
    val t = col(textCol)
    val base = df.filter(t.isNotNull)
      .select(groupCol.alias("grp"),
        size(regexp_extract_all(t, lit(email), lit(0)))
          .cast("long").alias("__e"),
        size(regexp_extract_all(t, lit(url), lit(0)))
          .cast("long").alias("__u"))
    base.groupBy("grp").agg(count(lit(1)).alias("n_docs"),
        sum(when(col("__e") > 0, 1L).otherwise(0L)).alias("docs_with_email"),
        sum(when(col("__u") > 0, 1L).otherwise(0L)).alias("docs_with_url"),
        sum("__e").alias("email_hits"), sum("__u").alias("url_hits"))
      .withColumn("affected_rate", round(
        (col("docs_with_email") + col("docs_with_url")).cast("double") /
          col("n_docs").cast("double"), 6))
      .orderBy("grp")
  }

  /** Zipf rank-frequency slope over the corpus head — the
    * frequency-side companion to [[heapsLaw]]'s vocabulary-growth fit
    * (the two exponents are duals): token counts from one map-side-
    * combined shuffle, the TOP `topN` tokens by (count DESC, token) —
    * orderBy+limit compiles to TakeOrderedAndProject, so every task
    * keeps a topN-row heap and no vocab-sized table is ever sorted
    * globally — then ln(freq) on ln(rank) through heapsLaw's exact OLS
    * (DECIMAL(28,10) moment sums over the topN-row table). A natural
    * corpus reads slope ≈ −1; machine-generated or templated text bends
    * it. Readout: head size, slope, ln-intercept, r². */
  def zipfSlope(df: DataFrame, textCol: String, topN: Int = 256)
      : DataFrame = {
    require(topN >= 8 && topN <= 65536, s"zipfSlope: bad topN=$topN")
    val counts = df.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).alias("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).alias("__c"))
    val head = counts.orderBy(desc("__c"), col("token")).limit(topN)
    val ranked = head.withColumn("__r",
      row_number().over(Window.orderBy(desc("__c"), col("token"))))
    // 9-dp-pinned ln outputs ahead of the DECIMAL(28,10) OLS moments
    val pts = ranked.select(
      round(log(col("__r").cast("double")), 9).alias("__x"),
      round(log(col("__c").cast("double")), 9).alias("__y"))
    val m = pts.agg(count(lit(1)).alias("n_head"),
      sum(col("__x").cast("decimal(28,10)")).alias("__sx"),
      sum(col("__y").cast("decimal(28,10)")).alias("__sy"),
      sum((col("__x") * col("__x")).cast("decimal(28,10)")).alias("__sxx"),
      sum((col("__y") * col("__y")).cast("decimal(28,10)")).alias("__syy"),
      sum((col("__x") * col("__y")).cast("decimal(28,10)")).alias("__sxy"))
    val n = col("n_head").cast("double")
    def d(c: String) = col(c).cast("double")
    val covn = n * d("__sxy") - d("__sx") * d("__sy")
    val varxn = n * d("__sxx") - d("__sx") * d("__sx")
    val varyn = n * d("__syy") - d("__sy") * d("__sy")
    val beta = covn / varxn
    m.select(col("n_head"),
      round0(beta, 6).alias("slope"),
      round0((d("__sy") - beta * d("__sx")) / n, 6).alias("intercept"),
      when(varyn > 0, round0(covn * covn / (varxn * varyn), 6)).alias("r2"))
  }
}
