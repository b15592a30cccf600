package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
}
