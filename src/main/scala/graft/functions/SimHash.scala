package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Scalar kernel for SimHash over a token array — one md5 per token, one
  * pass over the bits.
  *
  * Value-identical to `ScaleDedup.simhash` (the Column-expression form):
  * per token, hash32(t, 0) = the first 4 digest bytes of md5(t + "#0")
  * read as an unsigned 32-bit value; per bit j, the token votes +1 if bit
  * j of its hash is set, else −1 (a NULL token element votes −1 on every
  * bit, matching `when(...).otherwise(-1)` under a null hash); output bit
  * j is set iff its vote total is positive. The expression form folds the
  * hash ARRAY once per bit — `bits` aggregate traversals each recomputing
  * the md5 transform (subexpression elimination does not span separate
  * fold expressions) — which this kernel replaces with a single pass.
  */
object SimHashKernel {
  def simhash(tokens: ArrayData, bits: Int): Long = {
    // Per-thread digest (see MinHashKernel.Md5): skips the JCA provider
    // lookup that getInstance pays on every row.
    val md = MinHashKernel.Md5.get()
    val votes = new Array[Int](bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) {
        var j = 0
        while (j < bits) { votes(j) -= 1; j += 1 }
      } else {
        md.reset()
        val h = md.digest(
          (tokens.getUTF8String(i).toString + "#0").getBytes(StandardCharsets.UTF_8))
        val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
          ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
        var j = 0
        while (j < bits) {
          if (((v >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** Native Catalyst expression for SimHash (see `SimHashKernel`); stays in
  * whole-stage codegen via doGenCode. */
case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(bits > 0 && bits <= 32, s"bits must be in [1, 32], got $bits")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any =
    SimHashKernel.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashKernel.simhash($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHash {
  /** Column API: simhash of a token array as one codegen'd kernel call. */
  def simhash(tokens: Column, bits: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SimHashExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(tokens), bits))
}
