package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Scalar kernel for the md5 MinHash signature — one MessageDigest instance
  * per row (reset between tokens), direct byte slicing, no hex strings.
  *
  * Value-identical to `ScaleDedup.minhashSignature`'s Column-expression
  * form: for hash i, group g = i/4 salts the token with "#g" (g = 0
  * unsalted), md5 is taken over the token's UTF-8 bytes (what
  * `cast("binary")` yields), and slice i%4 of the 128-bit digest — bytes
  * 4j..4j+3 big-endian, i.e. hex chars 8j+1..8j+8 — is read as an unsigned
  * 32-bit value, exactly `conv(substring(hex, 8j+1, 8), 16, 10)`. The
  * expression-tree form materializes a hex string plus a `conv` string
  * parse per token per hash; this kernel does neither.
  */
object MinHashKernel {
  def sig(tokens: ArrayData, numHashes: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var seen = false
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        seen = true
        val t = tokens.getUTF8String(i)
        var g = 0
        while (g * 4 < numHashes) {
          md.reset()
          val bytes =
            if (g == 0) t.getBytes
            else (t.toString + "#" + g).getBytes(StandardCharsets.UTF_8)
          val h = md.digest(bytes)
          val lim = math.min(4, numHashes - g * 4)
          var j = 0
          while (j < lim) {
            val v = ((h(4 * j) & 0xffL) << 24) | ((h(4 * j + 1) & 0xffL) << 16) |
              ((h(4 * j + 2) & 0xffL) << 8) | (h(4 * j + 3) & 0xffL)
            if (v < mins(g * 4 + j)) mins(g * 4 + j) = v
            j += 1
          }
          g += 1
        }
      }
      i += 1
    }
    // array_min over an empty (or all-null) array is NULL — mirror that
    // per-hash so downstream band keys agree with the expression form
    if (!seen) new GenericArrayData(Array.fill[Any](numHashes)(null))
    else new GenericArrayData(mins.map(java.lang.Long.valueOf(_): Any))
  }
}

/** Native Catalyst expression computing ALL `numHashes` MinHash values of a
  * token array in one pass (SURVEY.md training-data extras; scale note in
  * `ScaleDedup.minhashSignature`).
  *
  * Versus the Column-expression form: one md5 per token per 4-hash group
  * either way, but no hex-string materialization, no `conv` base parsing,
  * no per-hash array traversal — and a ~40-node expression subtree per
  * signature collapses to a single codegen'd kernel call, which keeps the
  * surrounding projection comfortably inside whole-stage codegen. */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.sig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashKernel.sig($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSig {
  /** Column API: the full signature as ONE array column. */
  def minhash_sig(tokens: Column, numHashes: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MinHashSigExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(tokens), numHashes))
}
