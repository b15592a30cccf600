package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Scalar probe into a pre-built Bloom filter: `might_contain(hash)`.
  *
  * The filter itself ships as a serialized byte array captured in the
  * expression (a broadcast-sized artifact, NOT a per-row input), is
  * deserialized once per executor via the lazy val, and the generated
  * code calls straight into `BloomFilter.mightContainLong` — no
  * per-row deserialization, no UDF boxing, stays inside whole-stage
  * codegen.
  *
  * Used by `ops.BloomPrune` to cut a fact scan down to rows whose join
  * key MIGHT match the dimension side before the join shuffle: false
  * positives are removed by the real join; false negatives cannot occur,
  * so the composition is exactly the plain join. Same explicit-artifact
  * pattern as Spark's internal runtime bloom join filtering, but
  * reusable across stages/jobs (build once, prune many scans).
  */
case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainExpr {
  def apply(hash: Column, bloomBytes: Array[Byte]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BloomMightContainExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(hash), bloomBytes))

  /** Serialize a built filter to the byte-array form the expression
    * captures. */
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }
}
