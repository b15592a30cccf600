package graft.functions

import java.nio.ByteBuffer

import scala.collection.immutable.SortedSet

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bottom-k sketch aggregate (KMV): per group, the k smallest DISTINCT
  * values of a LongType child (typically a 32/64-bit content hash).
  *
  * The classic set-similarity sketch: for groups A and B,
  * |sketch(A) ∩ sketch(B) ∩ bottomK(sketch(A) ∪ sketch(B))| / k estimates
  * the Jaccard similarity of the underlying sets, and the k-th smallest
  * value estimates distinct cardinality (KMV estimator) — so one tiny
  * fixed-size state per group replaces shipping the raw value sets. A
  * `TypedImperativeAggregate`: the buffer is a bounded sorted set, merged
  * associatively across partials, O(k) serialized bytes per group
  * regardless of group size.
  */
case class BottomKSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SortedSet[Long]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottom_k_sketch"

  override def createAggregationBuffer(): SortedSet[Long] = SortedSet.empty[Long]

  private def bound(s: SortedSet[Long]): SortedSet[Long] =
    if (s.size <= k) s else s.take(k)

  override def update(buffer: SortedSet[Long], input: InternalRow): SortedSet[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val x = v.asInstanceOf[Long]
      // skip values already above the current k-th smallest
      if (buffer.size == k && x >= buffer.last) buffer
      else bound(buffer + x)
    }
  }

  override def merge(buffer: SortedSet[Long], other: SortedSet[Long]): SortedSet[Long] =
    bound(buffer ++ other)

  override def eval(buffer: SortedSet[Long]): Any =
    new GenericArrayData(buffer.toArray)

  override def serialize(buffer: SortedSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SortedSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    SortedSet((0 until n).map(_ => bb.getLong): _*)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKSketch =
    copy(child = newChildren.head)
}

object BottomKSketch {
  /** Column API: bottom-k distinct values of a LongType column. */
  def bottom_k_sketch(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BottomKSketch(org.apache.spark.sql.GraftColumnBridge.expression(c), k)
        .toAggregateExpression())
}
