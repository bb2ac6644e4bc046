package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import scala.collection.mutable.ArrayBuffer

/** Uniform k-reservoir sample of a LONG column per group, as ONE
  * mergeable aggregate — the distributed sampling primitive Spark's
  * `sample`/`sampleBy` (fraction-based, whole-frame) don't provide:
  * "give me exactly k example ids per group in a single pass".
  * Callers sample compact ids, then semi-join to fetch full rows.
  *
  * State is O(k) per group at every stage: partials keep (seen,
  * reservoir) and merge by proportional draws — the standard
  * distributed-reservoir construction, uniform per partial, and
  * approximately uniform after merge (exact when one side's stream
  * dominates; bias is O(k/seen) otherwise).
  *
  * Randomness is a deterministic splitmix of (seed, seen-count), so
  * a given plan over a given partitioning reproduces its sample —
  * repartition the input and the sample legitimately changes (as any
  * parallel reservoir's does).
  */
case class ReservoirSample(
    value: Expression,
    k: Int,
    seed: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ReservoirSample.Buf] {

  require(k > 0, "reservoir_sample: k must be positive")

  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): ReservoirSample.Buf =
    new ReservoirSample.Buf(0L, ArrayBuffer.empty)

  private def mix(a: Long, b: Long): Long = {
    var z = a ^ (b * 0x9E3779B97F4A7C15L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override def update(buf: ReservoirSample.Buf,
                      input: InternalRow): ReservoirSample.Buf = {
    val v = value.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      buf.seen += 1
      if (buf.items.length < k) buf.items += x
      else {
        // algorithm R: replace a random slot with prob k/seen. The
        // element value feeds the hash so two groups scanning the
        // same stream positions do NOT make identical decisions
        // (seed+count alone position-correlates every group's sample)
        val j = math.floorMod(mix(seed ^ x, buf.seen), buf.seen)
        if (j < k) buf.items(j.toInt) = x
      }
    }
    buf
  }

  override def merge(a: ReservoirSample.Buf,
                     b: ReservoirSample.Buf): ReservoirSample.Buf = {
    if (b.seen == 0) return a
    if (a.seen == 0) { a.seen = b.seen; a.items.clear(); a.items ++= b.items; return a }
    // proportional draws: each output slot picks side A with
    // probability remaining_a / (remaining_a + remaining_b)
    val out = ArrayBuffer.empty[Long]
    var ra = a.seen
    var rb = b.seen
    var ia = 0
    var ib = 0
    var step = 0L
    val target = math.min(k, (a.items.length + b.items.length))
    while (out.length < target) {
      step += 1
      val total = ra + rb
      // candidate values enter the hash (same decorrelation as update)
      val aHead = if (ia < a.items.length) a.items(ia) else 0L
      val bHead = if (ib < b.items.length) b.items(ib) else 0L
      val pick = math.floorMod(
        mix(seed ^ aHead ^ java.lang.Long.rotateLeft(bHead, 17), step), total)
      val takeA = (pick < ra && ia < a.items.length) || ib >= b.items.length
      if (takeA) { out += a.items(ia); ia += 1; ra = math.max(ra - 1, 0) }
      else { out += b.items(ib); ib += 1; rb = math.max(rb - 1, 0) }
    }
    a.seen += b.seen
    a.items.clear()
    a.items ++= out
    a
  }

  override def eval(buf: ReservoirSample.Buf): Any =
    // sorted presentation: the SET is the sample; a stable order keeps
    // downstream hashing deterministic for a given sample
    new GenericArrayData(buf.items.sorted.toArray)

  override def serialize(buf: ReservoirSample.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + buf.items.length * 8)
    bb.putLong(buf.seen)
    bb.putInt(buf.items.length)
    buf.items.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ReservoirSample.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val seen = bb.getLong
    val n = bb.getInt
    val items = new ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { items += bb.getLong; i += 1 }
    new ReservoirSample.Buf(seen, items)
  }

  override def withNewMutableAggBufferOffset(offset: Int): ReservoirSample =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ReservoirSample =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ReservoirSample =
    copy(value = newChildren.head)
}

object ReservoirSample {
  final class Buf(var seen: Long, val items: ArrayBuffer[Long])

  def apply(value: Column, k: Int, seed: Long): Column =
    GraftBridge.column(
      ReservoirSample(GraftBridge.expression(value.cast("long")), k, seed)
        .toAggregateExpression())
}
