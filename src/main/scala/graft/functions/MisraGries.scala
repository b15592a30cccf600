package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary: a bounded map of at most `k`
  * (item, counter) entries whose counters under-estimate true frequency by
  * at most n/(k+1) — so every item with true count > n/(k+1) is GUARANTEED
  * present in the summary (the candidate-superset property).
  *
  * This is the streaming half of the canonical two-pass exact heavy-hitters
  * query at scale: pass 1 runs this aggregate over the full stream (O(k)
  * state per group, one scan, map-side partials), pass 2 re-scans counting
  * ONLY the ≤ k candidates exactly and filters by the exact threshold. The
  * k-bounded candidate list is what makes the second pass a broadcast-sized
  * membership filter instead of a full-vocabulary shuffle.
  *
  * Merge follows the mergeable-summaries construction (Agarwal et al.,
  * PODS'12): sum counters over the key union, then subtract the (k+1)-th
  * largest counter from the survivors. Error bounds add across merges, so
  * the superset guarantee holds under ANY partial-aggregation tree — which
  * is exactly what Spark's partial/final plan produces. The summary itself
  * depends on partition order (counters are lower bounds, extra items may
  * appear); determinism comes from pass 2, never from this sketch.
  *
  * The decrement-all step is O(k) but amortized: each decrement pays back
  * one prior insert, so total work is O(stream + k·distinct-misses) — and
  * the buffer stores plain counts (no offset trick) because merge has to
  * materialize effective counts anyway.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buffer: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val item = v.asInstanceOf[UTF8String].toString
    buffer.get(item) match {
      case Some(c) => buffer.update(item, c + 1)
      case None if buffer.size < k => buffer.update(item, 1L)
      case None =>
        // full + miss: decrement every counter (the new item's implicit 1
        // cancels against the same decrement), dropping zeros
        val dead = mutable.ArrayBuffer.empty[String]
        buffer.keysIterator.foreach { key =>
          val c = buffer(key) - 1
          if (c == 0) dead += key else buffer.update(key, c)
        }
        dead.foreach(buffer.remove)
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) =>
      buffer.update(item, buffer.getOrElse(item, 0L) + c)
    }
    if (buffer.size > k) {
      // subtract the (k+1)-th largest counter; > k survivors impossible
      val counts = buffer.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      buffer.keysIterator.foreach { key =>
        val c = buffer(key) - cut
        if (c <= 0) dead += key else buffer.update(key, c)
      }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buffer.keysIterator.toArray.sorted.map(UTF8String.fromString(_): AnyRef))

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buffer.toArray
    val bytes = items.map { case (s, _) => s.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 12).sum)
    bb.putInt(items.length)
    items.zip(bytes).foreach { case ((_, c), b) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      m.update(new String(b, StandardCharsets.UTF_8), bb.getLong)
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {
  /** Column API: frequent-item candidates (sorted array of strings) with
    * the n/(k+1) under-count guarantee. */
  def misra_gries(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MisraGries(org.apache.spark.sql.GraftColumnBridge.expression(c), k)
        .toAggregateExpression())
}
