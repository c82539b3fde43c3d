package graft.plans

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries heavy-hitters sketch (capacity k) as a one-pass
  * aggregate — the frequent-items member of the engine's mergeable-summary
  * family (HLL distinct: x39; histogram quantiles: x42; this: x46).
  *
  * Update keeps at most k counters: a hit increments its counter; a miss
  * inserts at 1 when a slot is free, otherwise decrements ALL counters by
  * one (dropping zeros) — the classic frequency-mass argument: every
  * decrement retires k+1 units of stream mass, so any counter
  * underestimates its item's true count by at most n/(k+1).
  *
  * Merge (Agarwal et al., "Mergeable Summaries", PODS'12): add counters
  * pointwise, then if more than k survive, subtract the (k+1)-th largest
  * count from all and drop the non-positives — the same error envelope
  * holds after ANY merge tree, which is what makes the sketch safe under
  * Spark's partial aggregation: each of 1000 executors summarizes its
  * partitions locally (constant-size state, map-side), and the final
  * reduce merges 1000 sketches of size k, never the raw stream.
  *
  * Guarantees (true count t, estimate e, stream size n):
  *   t - n/(k+1) <= e <= t, and every item with t > n/(k+1) is present.
  * With k >= |domain| no decrement ever fires and counts are EXACT — the
  * regime the oracle query pins; FreqItemsSpec pins the error bound in the
  * saturated regime.
  */
case class FreqItemsAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[mutable.LinkedHashMap[String, Long]] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean         = false
  override def dataType: DataType        = MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, Long] =
    mutable.LinkedHashMap.empty

  override def update(
      buf: mutable.LinkedHashMap[String, Long],
      input: InternalRow): mutable.LinkedHashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString // copy out of the reused row buffer
      buf.get(key) match {
        case Some(c)                     => buf(key) = c + 1
        case None if buf.size < capacity => buf(key) = 1L
        case None                        => // decrement-all: retires (k+1) units of mass
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      a: mutable.LinkedHashMap[String, Long],
      b: mutable.LinkedHashMap[String, Long]): mutable.LinkedHashMap[String, Long] = {
    b.foreach { case (k, c) => a(k) = a.getOrElse(k, 0L) + c }
    if (a.size > capacity) {
      // subtract the (k+1)-th largest count from everything, keep positives
      val counts = a.values.toArray.sortInPlace()(Ordering.Long.reverse)
      val cut    = counts(capacity)
      val dead   = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.LinkedHashMap[String, Long]): Any = {
    val keys = buf.keysIterator.map(k => UTF8String.fromString(k): Any).toArray
    val vals = buf.valuesIterator.map(v => v: Any).toArray
    ArrayBasedMapData(keys, vals)
  }

  override def serialize(buf: mutable.LinkedHashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val bytes = k.getBytes(StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, Long] = {
    val in  = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n   = in.readInt()
    val buf = mutable.LinkedHashMap.empty[String, Long]
    var i   = 0
    while (i < n) {
      val len = in.readInt()
      val b   = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, StandardCharsets.UTF_8)) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object FreqItemsAgg {
  /** Column form: mg_freq(item, k) — map<item, estimated count>. */
  def mg_freq(item: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      FreqItemsAgg(GraftColumnBridge.expression(item), capacity).toAggregateExpression())
}
