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

  /** Per-thread MD5 instance shared by the kernel entry points: the JCA
    * provider lookup in `MessageDigest.getInstance` is measurable per-row
    * overhead on exactly the hot path these kernels exist to optimize.
    * MessageDigest is not thread-safe, so the hoist is a ThreadLocal (one
    * instance per executor task thread, reset between uses by `digest`). */
  private[functions] val Md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Update `mins` with one value's hash slices — the shared inner step of
    * both signature kernels (md5 per 4-hash group, salted "#g" for g>0,
    * big-endian 4-byte unsigned slices). */
  private def updateMins(md: MessageDigest, s: String, mins: Array[Long],
                         numHashes: Int): Unit = {
    var g = 0
    while (g * 4 < numHashes) {
      md.reset()
      val bytes =
        if (g == 0) s.getBytes(StandardCharsets.UTF_8)
        else (s + "#" + g).getBytes(StandardCharsets.UTF_8)
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

  /** Word k-shingle MinHash in one pass: emits
    * [n_distinct_shingles, mh_0, ..., mh_{numHashes-1}].
    *
    * Value-identical to `size(shingles(text,k))` + `minhashSignature` over
    * the shingle array: shingle i (for i in 0..max(n-k, 0)) is tokens
    * i..min(i+k,n)-1 joined with " " skipping nulls (concat_ws semantics;
    * the tail shingle of a short document keeps < k tokens, the empty
    * token array yields one "" shingle). Only DISTINCT shingles are hashed
    * — duplicates can't change a min — and the distinct count IS the
    * `n_shingles` output. Versus the expression form this skips the
    * sequence/slice/concat_ws array materialization AND array_distinct. */
  def shingleSig(tokens: ArrayData, k: Int, numHashes: Int): ArrayData = {
    val md = Md5.get()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val seen = new java.util.HashSet[String]()
    val n = tokens.numElements()
    val last = math.max(n - k, 0)
    var i = 0
    while (i <= last) {
      val sb = new java.lang.StringBuilder()
      var wrote = false
      var j = i
      val end = math.min(i + k, n)
      while (j < end) {
        if (!tokens.isNullAt(j)) {
          if (wrote) sb.append(' ')
          sb.append(tokens.getUTF8String(j).toString)
          wrote = true
        }
        j += 1
      }
      val sh = sb.toString
      if (seen.add(sh)) updateMins(md, sh, mins, numHashes)
      i += 1
    }
    val out = new Array[Any](numHashes + 1)
    out(0) = seen.size.toLong
    var m = 0
    while (m < numHashes) {
      out(m + 1) = if (mins(m) == Long.MaxValue) null
        else java.lang.Long.valueOf(mins(m))
      m += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct word-k-shingle hashes in first-occurrence order — the
    * decontamination key (`ScaleDedup.decontaminate`). Value-identical to
    * `transform(shingles(text, k), s -> hash32(s, 0))`: shingle building
    * matches `shingleSig` (space-joined token windows, tail keeps < k
    * tokens), and each DISTINCT shingle hashes as the first 4 bytes of
    * md5(shingle + "#0") read as an unsigned 32-bit value (the hash32
    * seed-0 salt), skipping the hex-string materialization and base-16
    * parse of the expression form. Cross-validated in OpsSpec. */
  def shingleHashes(tokens: ArrayData, k: Int): ArrayData = {
    val md = Md5.get()
    val seen = new java.util.HashSet[String]()
    val out = new java.util.ArrayList[Any]()
    val n = tokens.numElements()
    val last = math.max(n - k, 0)
    var i = 0
    while (i <= last) {
      val sb = new java.lang.StringBuilder()
      var wrote = false
      var j = i
      val end = math.min(i + k, n)
      while (j < end) {
        if (!tokens.isNullAt(j)) {
          if (wrote) sb.append(' ')
          sb.append(tokens.getUTF8String(j).toString)
          wrote = true
        }
        j += 1
      }
      val sh = sb.toString
      if (seen.add(sh)) {
        md.reset()
        val h = md.digest((sh + "#0").getBytes(StandardCharsets.UTF_8))
        out.add(java.lang.Long.valueOf(
          ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
            ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def sig(tokens: ArrayData, numHashes: Int): ArrayData = {
    val md = Md5.get()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var seen = false
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        seen = true
        updateMins(md, tokens.getUTF8String(i).toString, mins, numHashes)
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

/** Native word-k-shingle MinHash: [n_distinct_shingles, mh_0..] in one
  * codegen'd pass over the token array (see `MinHashKernel.shingleSig`). */
case class ShingleMinHashExpr(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k > 0, s"shingle width must be positive, got $k")
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.shingleSig(input.asInstanceOf[ArrayData], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashKernel.shingleSig($c, $k, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHashExpr =
    copy(child = newChild)
}

/** Native distinct word-k-shingle hash32 array (see
  * `MinHashKernel.shingleHashes`). */
case class ShingleHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k > 0, s"shingle width must be positive, got $k")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.shingleHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashKernel.shingleHashes($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

object MinHashSig {
  /** Column API: the full signature as ONE array column. */
  def minhash_sig(tokens: Column, numHashes: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MinHashSigExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(tokens), numHashes))

  /** Column API: [n_distinct_shingles, mh_0..] over word k-shingles. */
  def shingle_minhash_sig(tokens: Column, k: Int, numHashes: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ShingleMinHashExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(tokens), k, numHashes))

  /** Column API: distinct word-k-shingle hash32 values (seed 0). */
  def shingle_hashes(tokens: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ShingleHashesExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(tokens), k))
}
