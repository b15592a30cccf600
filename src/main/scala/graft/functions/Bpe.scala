package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernel for byte-pair-encoding tokenization against a fixed
  * merges table (the public GPT-2/SentencePiece algorithm family).
  *
  * Semantics — chosen to be EXACTLY reproducible in set-based SQL (the
  * DuckDB oracle replays it as a recursive CTE applying one merge per
  * step): per word, repeatedly merge the LEFTMOST occurrence of the
  * LOWEST-RANK adjacent symbol pair until no listed pair remains. This is
  * the SentencePiece priority-queue formulation of BPE (one best-scoring
  * occurrence at a time, rescan after each merge), which differs from
  * GPT-2's merge-all-occurrences-per-round only in exotic tie chains.
  *
  * The merges table is part of the MODEL, not the data: train it offline
  * (`TextAnalysis.bpeTrainMerges`), then broadcast it into this kernel —
  * at 100 TB the apply pass is a narrow per-row projection with zero
  * shuffle, the same shape as the MinHash kernels.
  */
object BpeKernel {

  /** Rank table: "a<NUL>b" → merge rank (lower merges first). */
  def buildTable(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + "\u0000" + b, i) }
    m
  }

  private def mergeWord(word: String, table: java.util.HashMap[String, Integer],
                        out: java.util.ArrayList[UTF8String]): Unit = {
    if (word.isEmpty) return
    val syms = new java.util.ArrayList[String](word.length)
    var ci = 0
    while (ci < word.length) {
      // code-point-safe char split (don't cut a surrogate pair)
      val n = Character.charCount(word.codePointAt(ci))
      syms.add(word.substring(ci, ci + n))
      ci += n
    }
    var done = false
    while (!done) {
      var bestRank = Integer.MAX_VALUE
      var bestPos = -1
      var i = 0
      while (i < syms.size - 1) {
        val r = table.get(syms.get(i) + "\u0000" + syms.get(i + 1))
        // strict < keeps the LEFTMOST occurrence of the minimal rank
        if (r != null && r < bestRank) { bestRank = r; bestPos = i }
        i += 1
      }
      if (bestPos < 0) done = true
      else {
        syms.set(bestPos, syms.get(bestPos) + syms.get(bestPos + 1))
        syms.remove(bestPos + 1)
      }
    }
    var j = 0
    while (j < syms.size) { out.add(UTF8String.fromString(syms.get(j))); j += 1 }
  }

  /** All BPE tokens of a space-separated document, in word order (empty
    * words contribute nothing). */
  def tokenize(text: UTF8String,
               table: java.util.HashMap[String, Integer]): GenericArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    val words = text.toString.split(" ", -1)
    var i = 0
    while (i < words.length) { mergeWord(words(i), table, out); i += 1 }
    new GenericArrayData(out.toArray)
  }
}

/** Native Catalyst expression: BPE tokens of a document against a fixed
  * merges table, one codegen'd kernel call per row (the rank table rides
  * along as a codegen reference object — built once, not per row). */
case class BpeTokensExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(merges.nonEmpty, "merges table must not be empty")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  @transient private lazy val table = BpeKernel.buildTable(merges)

  override def nullSafeEval(input: Any): Any =
    BpeKernel.tokenize(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeKernel.tokenize($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokensExpr =
    copy(child = newChild)
}

object Bpe {
  /** Column API: BPE tokens of a space-separated document. */
  def bpe_tokens(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BpeTokensExpr(org.apache.spark.sql.GraftColumnBridge.expression(text), merges))
}
