package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernel for the Gopher top-n-gram repetition statistic: the
  * maximum over distinct word n-grams of (gram length in code points ×
  * occurrence count) — the numerator of `topNgramCharFraction`.
  *
  * Value-identical to the Column-expression twin
  * (`TextAnalysis.topNgramCharFractionCols` numerator, cross-validated in
  * OpsSpec): tokens are `split(text, " ")` with trailing empties kept,
  * gram i (i in 0..max(n_tok − n, 0)) joins tokens i..i+n−1 (fewer at the
  * tail) with single spaces, length counts code points (Spark `length` /
  * DuckDB `length` semantics). The expression form is O(distinct × total)
  * string comparisons per row even after binding the gram array once;
  * this kernel is one pass with a HashMap — O(total) — which is what
  * makes the statistic affordable on real web-document lengths (1k+
  * tokens), not just 60-token fixtures. */
object TextStatsKernel {

  def topNgramBest(text: UTF8String, n: Int): Long = {
    val toks = text.toString.split(" ", -1)
    val last = math.max(toks.length - n, 0)
    val counts = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i <= last) {
      val sb = new java.lang.StringBuilder()
      var j = i
      val end = math.min(i + n, toks.length)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      counts.merge(sb.toString, 1, (a, b) => a + b)
      i += 1
    }
    var best = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val g = e.getKey
      val v = g.codePointCount(0, g.length).toLong * e.getValue
      if (v > best) best = v
    }
    best
  }
}

/** Native Catalyst expression for `TextStatsKernel.topNgramBest`. */
case class TopNgramBestExpr(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n > 0, s"n-gram width must be positive, got $n")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "top_ngram_best"

  override def nullSafeEval(input: Any): Any =
    TextStatsKernel.topNgramBest(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextStatsKernel.topNgramBest($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): TopNgramBestExpr =
    copy(child = newChild)
}

/** One-pass windowed co-occurrence pair builder (round 19) — the compiled
  * twin of `TextAnalysis.cooccurrence`'s nested-HOF pair expression
  *   flatten(transform(sequence(1, n−1), i =>
  *     transform(sequence(1, least(window, n−i)), d =>
  *       struct(element_at(toks, i), element_at(toks, i+d), d))))
  * Same (i asc, d asc) order, same struct shape (w1, w2, d:int). The HOF
  * form was quadratic per document: the lambdas are interpreted, and
  * `toks` there was the INLINE filter(split(text)) subtree, so every
  * element_at re-ran the split+filter over the whole document — O(n²·w)
  * per doc (measured 144 s on the 10× stress corpus). Here the token
  * array is evaluated once by the surrounding projection and the kernel
  * walks it — O(n·w). Callers guard n ≥ 2 (the operator filters
  * `size(toks) >= 2` before the explode); for n < 2 this returns an
  * empty array. A null token array null-propagates — the HOF form would
  * instead hit legacy `size(null) = -1` and fabricate
  * descending-sequence (null, null, d) pairs, but the operator filters
  * `text IS NOT NULL` before building toks, so that input is
  * unreachable there. */
object CoocPairsKernel {
  def pairs(toks: ArrayData, window: Int): ArrayData = {
    val n = toks.numElements()
    if (n < 2) return new GenericArrayData(new Array[Any](0))
    var count = 0
    var i = 0
    while (i < n - 1) { count += math.min(window, n - 1 - i); i += 1 }
    val out = new Array[Any](count)
    var k = 0
    i = 0
    while (i < n - 1) {
      val lim = math.min(window, n - 1 - i)
      var d = 1
      while (d <= lim) {
        out(k) = new GenericInternalRow(Array[Any](
          if (toks.isNullAt(i)) null else toks.getUTF8String(i),
          if (toks.isNullAt(i + d)) null else toks.getUTF8String(i + d),
          java.lang.Integer.valueOf(d)))
        k += 1
        d += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression for [[CoocPairsKernel.pairs]]. */
case class CoocPairsExpr(child: Expression, window: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(window >= 1 && window <= 16,
    s"cooc_pairs: need 1 <= window <= 16, got $window")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w1", StringType, nullable = true),
    StructField("w2", StringType, nullable = true),
    StructField("d", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "cooc_pairs"

  override def nullSafeEval(input: Any): Any =
    CoocPairsKernel.pairs(input.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CoocPairsKernel.pairs($c, $window);")

  override protected def withNewChildInternal(newChild: Expression): CoocPairsExpr =
    copy(child = newChild)
}

/** One-pass adjacent-bigram builder (round 19) — the compiled twin of
  * `ScaleDedup.wordBigrams`'s
  *   when(n >= 2, transform(sequence(1, n−1), i =>
  *     concat_ws(sep, element_at(toks, i), element_at(toks, i+1))))
  *   .otherwise(array())
  * Same values and order; concat_ws semantics (null elements skipped,
  * all-null → ""). NOT null-propagating: a null token array yields the
  * EMPTY array exactly as the when-form does (legacy size(null) = -1
  * fails the n ≥ 2 test). The HOF form was quadratic per document when
  * callers passed the inline split(text) — interpreted lambdas re-ran
  * the split per element_at (the cooc_pairs disease; q_dsir_weights
  * 62.7 s / q_heaps_law 23.9 s on the 10× stress corpus). */
object WordBigramsKernel {
  def bigrams(toks: ArrayData, sep: UTF8String): ArrayData = {
    if (toks == null) return new GenericArrayData(new Array[Any](0))
    val n = toks.numElements()
    if (n < 2) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      val a = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      val b = if (toks.isNullAt(i + 1)) null else toks.getUTF8String(i + 1)
      out(i) =
        if (a == null && b == null) UTF8String.EMPTY_UTF8
        else if (a == null) b
        else if (b == null) a
        else UTF8String.concat(a, sep, b)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression for [[WordBigramsKernel.bigrams]]. */
case class WordBigramsExpr(child: Expression, sep: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_bigrams"

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_bigrams needs array<string>, got ${other.catalogString}")
  }

  @transient private lazy val sepU: UTF8String = UTF8String.fromString(sep)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    WordBigramsKernel.bigrams(v.asInstanceOf[ArrayData], sepU)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val sepRef = ctx.addReferenceObj("sep", sepU,
      "org.apache.spark.unsafe.types.UTF8String")
    val call = s"graft.functions.WordBigramsKernel.bigrams(" +
      s"${c.isNull} ? null : ${c.value}, $sepRef)"
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $call;
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordBigramsExpr =
    copy(child = newChild)
}

object TextStats {
  /** Column API: max over distinct word n-grams of length × count. */
  def top_ngram_best(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      TopNgramBestExpr(org.apache.spark.sql.GraftColumnBridge.expression(text), n))

  /** Column API: windowed (w1, w2, d) co-occurrence pairs in one pass. */
  def cooc_pairs(toks: Column, window: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CoocPairsExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(toks), window))

  /** Column API: adjacent sep-joined bigrams in one pass (empty for
    * n < 2 or a null array — the wordBigrams when-form contract). */
  def word_bigrams(toks: Column, sep: String): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      WordBigramsExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(toks), sep))
}
