package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** §2.11 `udaf_typed_imperative` (SURVEY.md:308): a low-level
  * `TypedImperativeAggregate` with a custom binary-serialized buffer —
  * the Spark analogue of a Hive UDAF with an opaque
  * AbstractAggregationBuffer. Keeps the k (score-desc, key-asc)-best
  * (key, score) pairs per group in a bounded buffer (update and merge
  * both trim to k, so partial buffers stay O(k) — the property that
  * makes it safe to fan in from thousands of partitions at 100 TB)
  * and emits the keys as a CSV string, deterministically tie-broken.
  */
case class TopKKeys(
    key: Expression,
    score: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  private val ord: Ordering[(Double, Long)] =
    Ordering.by { case (s, id) => (-s, id) }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  private def trim(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    if (buf.length > k) {
      val best = buf.sorted(ord).take(k)
      buf.clear(); buf ++= best
    }
    buf
  }

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input); val v = key.eval(input)
    if (s != null && v != null) {
      buf += ((s.asInstanceOf[Double], v.asInstanceOf[Long]))
      trim(buf)
    } else buf
  }

  override def merge(b1: ArrayBuffer[(Double, Long)], b2: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    trim(b1 ++= b2)

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    UTF8String.fromString(buf.sorted(ord).take(k).map(_._2).mkString(","))

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (s, id) => bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(key, score)
  override def prettyName: String = "topk_keys"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKKeys =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKKeys =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKKeys =
    copy(key = newChildren(0), score = newChildren(1))
}
