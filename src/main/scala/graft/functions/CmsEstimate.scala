package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point-estimate lookup in a Count–Min sketch built by Spark's own
  * `count_min_sketch` aggregate — the missing read half of the CMS
  * trio (the aggregate serializes a sketch Spark gives you no SQL
  * function to query). `cms_estimate(sketch, value)` returns the
  * estimated count of `value`, with the CMS guarantee
  * `exact ≤ estimate ≤ exact + ε·N` (w.p. ≥ confidence) — the
  * frequency twin of HLL-for-cardinality and KLL-for-quantiles.
  *
  * Interpreted eval by design: it runs on post-aggregation rows (one
  * sketch per group), so the per-call deserialization is O(groups),
  * never O(rows).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate needs (binary, bigint), got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override def nullSafeEval(sketch: Any, value: Any): Any = {
    val cms = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketch.asInstanceOf[Array[Byte]]))
    cms.estimateCount(value.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  def apply(sketch: Column, value: Column): Column =
    GraftBridge.column(CmsEstimate(
      GraftBridge.expression(sketch),
      GraftBridge.expression(value.cast("long"))))
}
