package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence counts of several marker-token sets over one token
  * array, in ONE codegen pass — the fused form of N
  * `size(filter(toks, isin(markers)))` columns.
  *
  * Each `filter` higher-order-function column is CodegenFallback
  * (interpreted, boxing every element per set); the language-ID +
  * stopword stack evaluated six of them per document and they
  * dominated docs_clean_pipeline's per-row cost at the sf1 soak
  * (~2.7 s of 8.2). This expression walks the token array once,
  * testing each token against per-set hash sets — semantics identical
  * to the legacy columns: null elements count for no set (isin(null)
  * is null → filter drops), null array → null. */
case class MarkerCountsExpr(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {

  @transient private lazy val setArr: Array[java.util.HashSet[UTF8String]] =
    MarkerCounts.toSets(sets)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "marker_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if sets.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"marker_counts needs array<string> and >= 1 marker set, got " +
        s"${child.dataType.simpleString}, sets=${sets.length}")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      MarkerCounts.countsOf(v.asInstanceOf[ArrayData], setArr))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("markersets", setArr,
      "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.MarkerCounts.countsOf($v, $sRef));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerCountsExpr =
    copy(child = newChild)
}

object MarkerCounts {

  private[functions] def toSets(
      sets: Seq[Seq[String]]): Array[java.util.HashSet[UTF8String]] =
    sets.map { s =>
      val hs = new java.util.HashSet[UTF8String](s.length * 2)
      s.foreach(m => hs.add(UTF8String.fromString(m)))
      hs
    }.toArray

  /** One pass over the token array; null tokens count for no set.
    * Called from generated code. */
  def countsOf(toks: ArrayData,
               sets: Array[java.util.HashSet[UTF8String]]): Array[Int] = {
    val out = new Array[Int](sets.length)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var s = 0
        while (s < sets.length) {
          if (sets(s).contains(t)) out(s) += 1
          s += 1
        }
      }
      i += 1
    }
    out
  }

  /** Column API: `array<int>` of per-set occurrence counts, in `sets`
    * order. */
  def of(toks: Column, sets: Seq[Seq[String]]): Column =
    GraftBridge.column(MarkerCountsExpr(GraftBridge.expression(toks),
      sets.map(_.toIndexedSeq).toIndexedSeq))
}
