package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the compression half of
  * the faiss `IVF<n>,PQ<m>` architecture. A d-dim vector splits into
  * `m` subvectors; each subvector is replaced by the index of its
  * nearest per-subspace centroid (`ks` centroids trained per
  * subspace), so a 64-dim float32 embedding (256 B) stores as m = 8
  * BYTES — 8× smaller than SQ8, 32× smaller than floats. Search uses
  * asymmetric distance computation (ADC): the query precomputes one
  * m×ks lookup table of exact subvector dots against every centroid,
  * and scoring a corpus code is `m` table lookups — no float vector
  * is touched until the exact re-rank of the survivors.
  *
  * The codebook rides on the expression as a constructor param (it is
  * plan-time constant — broadcast into codegen as a reference object,
  * never serialized per row). Layout is flat `[(s·ks + j)·dsub + t]`
  * for subspace s, centroid j, component t.
  *
  * All three kernels are codegen'd (generated code indexes plain
  * `double[]` / `byte[]` — no per-row expression-tree interpretation
  * in the corpus encode or the candidate-scan hot loop).
  */
case class PqEncodeExpr(child: Expression, m: Int, ks: Int, cb: Seq[Double])
    extends UnaryExpression {

  @transient private lazy val cbArr: Array[Double] = cb.toArray

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if ks >= 1 && ks <= 256 && m >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<double> (and 1 <= ks <= 256), got " +
        s"${child.dataType.simpleString}, m=$m, ks=$ks")
  }

  override def nullSafeEval(v: Any): Any =
    Pq.encodeBytes(v.asInstanceOf[ArrayData], cbArr, m, ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cbArr, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = graft.functions.Pq.encodeBytes($v, $cbRef, $m, $ks);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** The query-side ADC table: exact dots of each query subvector
  * against every per-subspace centroid — an m·ks double array
  * computed ONCE per query row, then shared by every candidate that
  * query scores. */
case class PqLutExpr(child: Expression, m: Int, ks: Int, cb: Seq[Double])
    extends UnaryExpression {

  @transient private lazy val cbArr: Array[Double] = cb.toArray

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"pq_lut needs array<double>, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val lut = Pq.lutDoubles(v.asInstanceOf[ArrayData], cbArr, m, ks)
    if (lut == null) null else new GenericArrayData(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cbArr, "double[]")
    val raw = ctx.freshName("raw")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |double[] $raw = graft.functions.Pq.lutDoubles($v, $cbRef, $m, $ks);
         |if ($raw == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($raw);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

/** ADC score of one corpus code against one query table:
  * `Σ_s lut[s·ks + code_s]` ≈ dot(query, reconstructed vector). The
  * candidate-scan hot kernel — a length-m loop of array lookups,
  * inlined into whole-stage codegen. */
case class PqAdcExpr(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"pq_adc needs (binary, array<double>), got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override def nullSafeEval(codes: Any, lut: Any): Any = {
    val c = codes.asInstanceOf[Array[Byte]]
    val l = lut.asInstanceOf[ArrayData]
    if (l.numElements() != c.length * ks) return null
    var s = 0.0
    var i = 0
    while (i < c.length) {
      s += l.getDouble(i * ks + (c(i) & 0xFF))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($l.numElements() != $c.length * $ks) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $c.length; $i++) {
         |    $s += $l.getDouble($i * $ks + ($c[$i] & 0xFF));
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

object Pq {

  /** Shared by interpreted eval and generated code (the codegen calls
    * this static helper with the plan-time codebook reference — one
    * JIT-compiled body instead of per-row expression interpretation).
    * Returns null on shape mismatch or null vector components. */
  def encodeBytes(vec: ArrayData, cb: Array[Double], m: Int, ks: Int): Array[Byte] = {
    val d = vec.numElements()
    if (d % m != 0) return null
    val dsub = d / m
    if (cb.length != m * ks * dsub) return null
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ks) {
        var d2 = 0.0
        var t = 0
        val base = (s * ks + j) * dsub
        while (t < dsub) {
          if (vec.isNullAt(s * dsub + t)) return null
          val diff = vec.getDouble(s * dsub + t) - cb(base + t)
          d2 += diff * diff
          t += 1
        }
        if (d2 < bestD) { bestD = d2; best = j } // strict < keeps lowest-j ties
        j += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  /** Raw LUT doubles — see [[PqLutExpr]]. Null on shape mismatch. */
  def lutDoubles(vec: ArrayData, cb: Array[Double], m: Int, ks: Int): Array[Double] = {
    val d = vec.numElements()
    if (d % m != 0) return null
    val dsub = d / m
    if (cb.length != m * ks * dsub) return null
    val out = new Array[Double](m * ks)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < ks) {
        var acc = 0.0
        var t = 0
        val base = (s * ks + j) * dsub
        while (t < dsub) {
          if (vec.isNullAt(s * dsub + t)) return null
          acc += vec.getDouble(s * dsub + t) * cb(base + t)
          t += 1
        }
        out(s * ks + j) = acc
        j += 1
      }
      s += 1
    }
    out
  }

  def encode(vec: Column, m: Int, ks: Int, cb: Seq[Double]): Column =
    GraftBridge.column(PqEncodeExpr(GraftBridge.expression(vec), m, ks, cb))

  def lut(vec: Column, m: Int, ks: Int, cb: Seq[Double]): Column =
    GraftBridge.column(PqLutExpr(GraftBridge.expression(vec), m, ks, cb))

  def adc(codes: Column, lut: Column, ks: Int): Column =
    GraftBridge.column(PqAdcExpr(
      GraftBridge.expression(codes), GraftBridge.expression(lut), ks))
}
