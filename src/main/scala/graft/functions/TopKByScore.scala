package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k by (score desc, id asc), as ONE mergeable
  * aggregate — the distributed alternative to the
  * `row_number().over(Window.partitionBy(g).orderBy(...)) <= k`
  * idiom. The window form must SORT every group's full candidate
  * set (even with WindowGroupLimit the per-partition sort of the
  * candidate fan-out dominates — the knn-graph seed carries 1536
  * candidates per vertex, so a 20M-vertex corpus sorts 30G rows to
  * keep 5 per vertex); this aggregate keeps an O(k) buffer per
  * group, combines MAP-SIDE, and shuffles only k rows per group.
  * That partial-combine shape is also skew-immune: a hot group costs
  * O(k) per map partition, never a single-reducer sort.
  *
  * Semantics pinned to the window idiom it replaces:
  *  - ordering is (score desc, id asc), NaN ordered ABOVE every
  *    double (java.lang.Double.compare — identical to Spark's
  *    descending-sort placement of NaN);
  *  - duplicate ids within a group collapse to ONE entry (callers
  *    feed exact re-scored candidates, so two sightings of an id
  *    carry the same score and dropping the second is lossless —
  *    this replaces the pre-window `groupBy(keys).agg(max(score))`
  *    dedup exchange);
  *  - eval returns array<struct<id, score>> sorted by the ordering,
  *    so `posexplode` positions are dense ranks.
  *
  * k is bounded (≤ 1024) because the buffer is O(k) PER GROUP in the
  * hash-aggregate map — this is a top-k primitive, not a sort
  * replacement. */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Buf] {

  require(k > 0 && k <= 1024, "topk_by_score: k must be in [1, 1024]")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByScore.outType

  override def createAggregationBuffer(): TopKByScore.Buf =
    new TopKByScore.Buf(new Array[Double](k), new Array[Long](k), 0)

  override def update(buf: TopKByScore.Buf,
                      input: InternalRow): TopKByScore.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long], k)
    buf
  }

  override def merge(a: TopKByScore.Buf, b: TopKByScore.Buf): TopKByScore.Buf = {
    var i = 0
    while (i < b.size) { a.insert(b.scores(i), b.ids(i), k); i += 1 }
    a
  }

  override def eval(buf: TopKByScore.Buf): Any = {
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = new GenericInternalRow(Array[Any](buf.ids(i), buf.scores(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKByScore.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKByScore.Buf(new Array[Double](k), new Array[Long](k), 0)
    var i = 0
    while (i < n) {
      val s = bb.getDouble; val id = bb.getLong
      buf.insert(s, id, k)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  val outType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  /** Sorted bounded buffer: parallel arrays ordered by (score desc,
    * id asc). Insert is an O(size) scan + shift — size ≤ k ≤ 1024
    * and callers use k ≈ 5..32, so this beats heap bookkeeping. */
  final class Buf(val scores: Array[Double], val ids: Array[Long],
                  var size: Int) {
    /** true if (s1,i1) orders strictly before (s2,i2). */
    private def before(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && i1 < i2)
    }

    def insert(s: Double, id: Long, k: Int): Unit = {
      // find insertion point; a duplicate id ordering BEFORE the new
      // entry carries a ≥ score — keep it (same id ⇒ same score for
      // every caller, so this dedup is lossless under the contract)
      var i = 0
      while (i < size && before(scores(i), ids(i), s, id)) {
        if (ids(i) == id) return
        i += 1
      }
      if (i >= k) return
      // a duplicate at/after the insertion point orders AFTER the new
      // entry (< score): REPLACE-IF-BETTER — remove the stale copy and
      // fall through to the insert. Under the equal-score contract
      // this is a no-op-equivalent; under a contract violation it
      // makes the result order-independent (max score survives)
      // instead of silently depending on partial-merge order.
      var j = i
      while (j < size) {
        if (ids(j) == id) {
          var m = j
          while (m + 1 < size) {
            scores(m) = scores(m + 1); ids(m) = ids(m + 1); m += 1
          }
          size -= 1
          j = size
        } else j += 1
      }
      val last = math.min(size, k - 1)
      var m = last
      while (m > i) { scores(m) = scores(m - 1); ids(m) = ids(m - 1); m -= 1 }
      scores(i) = s
      ids(i) = id
      if (size < k) size += 1
    }
  }

  def apply(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKByScore(GraftBridge.expression(score.cast("double")),
        GraftBridge.expression(id.cast("long")), k)
        .toAggregateExpression())
}
