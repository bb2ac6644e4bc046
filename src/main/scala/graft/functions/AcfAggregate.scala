package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

import scala.collection.mutable.ArrayBuffer

/** Autocorrelation as a single `TypedImperativeAggregate` — the
  * designated fallback formulation for D5 (SURVEY.md §2.8): collect
  * the (order, value) pairs of a group, sort once in `eval`, emit
  * r_1..r_nLags with the statsmodels full-series-mean formula.
  *
  * Trade-off vs the window-lag formulation in `graft.stats.Acf`:
  * this is ONE aggregation (one shuffle, partial-merge combinable,
  * no per-group sort exchange) but holds O(series) state per group —
  * right for many short series (the reference's per-engine cycles);
  * wrong for few long ones, where the window version's bounded state
  * wins. Callers pick per workload.
  */
case class AcfAggregate(
    ord: Expression,
    ord2: Expression,
    value: Expression,
    nLags: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Double, Double)]] {

  override def children: Seq[Expression] = Seq(ord, ord2, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Double, Double)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Double, Double, Double)],
                      input: InternalRow): ArrayBuffer[(Double, Double, Double)] = {
    val o = ord.eval(input)
    val o2 = ord2.eval(input)
    val v = value.eval(input)
    if (o != null && v != null)
      buf += ((toDouble(o), if (o2 == null) 0.0 else toDouble(o2), toDouble(v)))
    buf
  }

  private def toDouble(a: Any): Double = a match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalArgumentException(
      s"acf_agg: numeric input required, got ${other.getClass.getSimpleName}")
  }

  override def merge(a: ArrayBuffer[(Double, Double, Double)],
                     b: ArrayBuffer[(Double, Double, Double)]): ArrayBuffer[(Double, Double, Double)] =
    a ++= b

  override def eval(buf: ArrayBuffer[(Double, Double, Double)]): Any = {
    // (ord, ord2) total order — without the tiebreak, ties on ord sort
    // in partition-merge order and the lag products become
    // nondeterministic (and oracle-mismatched) on tied timestamps
    val xs = buf.sortBy(t => (t._1, t._2)).map(_._3).toArray
    val n = xs.length
    if (n == 0) return new GenericArrayData(Array.fill[Any](nLags)(null))
    val mu = xs.sum / n
    val d = xs.map(_ - mu)
    var denom = 0.0
    var i = 0
    while (i < n) { denom += d(i) * d(i); i += 1 }
    val out = new Array[Any](nLags)
    var k = 1
    while (k <= nLags) {
      if (denom == 0.0 || k >= n) out(k - 1) = null
      else {
        var num = 0.0
        var t = k
        while (t < n) { num += d(t) * d(t - k); t += 1 }
        out(k - 1) = num / denom
      }
      k += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: ArrayBuffer[(Double, Double, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 24)
    bb.putInt(buf.length)
    buf.foreach { case (o, o2, v) =>
      bb.putDouble(o); bb.putDouble(o2); bb.putDouble(v)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Double, Double)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Double, Double, Double)](n)
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getDouble, bb.getDouble)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): AcfAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): AcfAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AcfAggregate =
    copy(ord = newChildren(0), ord2 = newChildren(1), value = newChildren(2))
}

object AcfAggregate {
  def apply(ord: Column, ord2: Column, value: Column, nLags: Int): Column =
    GraftBridge.column(
      AcfAggregate(GraftBridge.expression(ord), GraftBridge.expression(ord2),
        GraftBridge.expression(value), nLags).toAggregateExpression())
}
