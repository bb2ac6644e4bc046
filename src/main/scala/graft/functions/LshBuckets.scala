package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** ALL random-hyperplane LSH table buckets of one vector in ONE
  * codegen pass — the corpus-side kernel of every LSH tier
  * (near-dup pairs, knn, planted-twin certification).
  *
  * The r9 shape computed each table's bucket as a separate
  * `transform`/`zip_with`/`aggregate` higher-order-function column —
  * Spark evaluates HOF expressions INTERPRETED (CodegenFallback),
  * allocating boxed arrays per plane per row, and the per-table
  * explode re-ran the whole prefix; at the sf1 soak the interpreted
  * bucket columns were most of knn_lsh's 9.5 s. This expression is a
  * plain nested loop over a plan-time `double[]` plane matrix
  * (tables × planes × dim, ~2.7k doubles at the soak sizing — shipped
  * once via `addReferenceObj`), inlined into whole-stage codegen:
  * one corpus scan emits every table's bucket as an `array<long>` to
  * `posexplode`.
  *
  * Bucket arithmetic is BIT-IDENTICAL to the legacy
  * [[graft.scaleops.Similarity.lshBucket]] column (spec-pinned):
  * per-plane projection is the same left-assoc IEEE sum over array
  * order, and the bucket id sets bit p iff projection > 0 — exact
  * powers of two summed, i.e. the same integer.
  */
case class LshBucketsExpr(child: Expression, numTables: Int, numPlanes: Int,
                          dim: Int, planes: Seq[Double])
    extends UnaryExpression {

  @transient private lazy val planesArr: Array[Double] = planes.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "lsh_buckets"

  // the plane matrix must match tables×planes×dim EXACTLY: a matrix
  // built for the wrong dim would pass a multiple-of check and then
  // null-bucket every row at eval (the whole corpus silently dropping
  // out of every table). The runtime null stays reserved for
  // genuinely ragged/corrupt rows.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _)
        if numTables >= 1 && numPlanes >= 1 && numPlanes <= 50 &&
          dim >= 1 && planes.length == numTables * numPlanes * dim =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets needs array<double> and a tables×planes×dim plane " +
        s"matrix (planes in [1,50], matrix length exactly " +
        s"tables*planes*dim); got ${child.dataType.simpleString}, " +
        s"tables=$numTables, planes=$numPlanes, dim=$dim, " +
        s"matrix=${planes.length}")
  }

  override def nullSafeEval(v: Any): Any = {
    val out = Lsh.bucketsOf(v.asInstanceOf[ArrayData], planesArr,
      numTables, numPlanes)
    if (out == null) null else new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshplanes", planesArr, "double[]")
    val raw = ctx.freshName("raw")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |long[] $raw = graft.functions.Lsh.bucketsOf(
         |  $v, $pRef, $numTables, $numPlanes);
         |if ($raw == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($raw);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}

object Lsh {

  /** The seeded plane matrix, flattened table-major: table t's plane
    * p occupies `[(t·numPlanes + p)·dim, …+dim)`. Table t draws from
    * `Random(seed + t)` in plane-then-dim order — the exact gaussian
    * sequence the legacy per-table `lshBucket(seed = 42+t)` literals
    * used, so bucket ids (and every committed gate hash derived from
    * them) are unchanged. */
  def planesFor(numTables: Int, numPlanes: Int, dim: Int,
                seed: Long = 42L): Array[Double] = {
    val out = new Array[Double](numTables * numPlanes * dim)
    var t = 0
    while (t < numTables) {
      val rnd = new scala.util.Random(seed + t)
      var i = 0
      while (i < numPlanes * dim) {
        out(t * numPlanes * dim + i) = rnd.nextGaussian()
        i += 1
      }
      t += 1
    }
    out
  }

  /** All table buckets of one vector; null on a null element or a
    * dim mismatch (embeddings are fixed-dim; a ragged row is corrupt
    * input, not a bucketing decision). Called from generated code. */
  def bucketsOf(vec: ArrayData, planes: Array[Double],
                numTables: Int, numPlanes: Int): Array[Long] = {
    val dim = planes.length / (numTables * numPlanes)
    if (vec.numElements() != dim) return null
    val x = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      if (vec.isNullAt(d)) return null
      x(d) = vec.getDouble(d)
      d += 1
    }
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var p = 0
      while (p < numPlanes) {
        val off = (t * numPlanes + p) * dim
        var proj = 0.0
        var i = 0
        while (i < dim) { proj += x(i) * planes(off + i); i += 1 }
        if (proj > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }

  /** Column API: `array<long>` of per-table buckets (posexplode it to
    * (table, bucket) rows). Same seeding contract as the legacy
    * per-table form: table t ~ `Random(seed + t)`. */
  def buckets(vec: Column, numTables: Int, numPlanes: Int, dim: Int,
              seed: Long = 42L): Column =
    GraftBridge.column(LshBucketsExpr(GraftBridge.expression(vec),
      numTables, numPlanes, dim,
      planesFor(numTables, numPlanes, dim, seed).toIndexedSeq))
}
