package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/** Scalar (int8) vector quantization — the storage/IO half of ANN at
  * 100 TB. A 64-dim float32 embedding is 256 B; its SQ8 code is 64 B
  * + one double scale. The candidate-generation scan (the pass that
  * touches EVERY corpus row) reads codes only — 4× less parquet IO
  * and shuffle — and exact float vectors are fetched by id for just
  * the k·refine survivors per query (a semi-join, not a corpus scan).
  *
  * Scheme: per-vector symmetric max-abs — `code_i = round(v_i /
  * scale)` clamped to [−127, 127] with `scale = max|v| / 127` (the
  * per-vector variant of faiss's SQ8). Approximate dot recovers as
  * `scale_a · scale_b · Σ code_a,i · code_b,i`; for cosine the scales
  * cancel entirely, so ranking needs only integer dots:
  * `côs = intdot(a,b) / (√intdot(a,a) · √intdot(b,b))`.
  *
  * Both expressions are codegen'd tight loops (no per-row array
  * allocation in the scoring pass), mirroring [[ArrayDot]].
  */
case class Sq8Encode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sq8_encode needs (array<double>, double), got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override def nullSafeEval(v: Any, s: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val scale = s.asInstanceOf[Double]
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val c = if (scale == 0.0) 0L else math.round(arr.getDouble(i) / scale)
      out(i) = math.max(-127L, math.min(127L, c)).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, s) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      s"""
         |int $n = $v.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $c = ($s == 0.0) ? 0L : Math.round($v.getDouble($i) / $s);
         |  $out[$i] = (byte) Math.max(-127L, Math.min(127L, $c));
         |}
         |if (!${ev.isNull}) ${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8Encode =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product over two SQ8 code arrays (BINARY). Mismatched
  * lengths → null, like [[ArrayDot]]. Max magnitude per term is
  * 127² < 2^14, so 2^49 dims before a long could overflow — safe. */
case class Sq8IntDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sq8_intdot needs (binary, binary), got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) return null
    var s = 0L
    var i = 0
    while (i < x.length) { s += x(i).toLong * y(i).toLong; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    $s += (long) $a[$i] * (long) $b[$i];
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8IntDot =
    copy(left = newLeft, right = newRight)
}

object Sq8 {
  import org.apache.spark.sql.functions.{abs, array_max, transform}

  def encode(vec: Column, scale: Column): Column =
    GraftBridge.column(Sq8Encode(
      GraftBridge.expression(vec), GraftBridge.expression(scale)))

  def intDot(a: Column, b: Column): Column =
    GraftBridge.column(Sq8IntDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** THE max-abs scale of the scheme — defined once so every encoder
    * call site quantizes identically (a drifted scale formula would
    * silently produce incompatible codes). */
  def scaleOf(vec: Column): Column =
    array_max(transform(vec, x => abs(x))) / 127.0

  /** Encode with the canonical scale. */
  def encodeMaxAbs(vec: Column): Column = encode(vec, scaleOf(vec))
}
