package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
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

object TextStats {
  /** Column API: max over distinct word n-grams of length × count. */
  def top_ngram_best(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      TopNgramBestExpr(org.apache.spark.sql.GraftColumnBridge.expression(text), n))
}
