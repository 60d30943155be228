package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Row-at-a-time int8 symmetric quantization + integer dot product for
  * the quantized ANN candidate path (see Similarity.ivfTopKQ8).
  *
  * Quantization follows Similarity.quantizeSummary's engine-stable
  * floor scheme: per-vector scale = max|x| (zero-point 0),
  * q_i = floor(x_i * 127 / scale), and the published scale is the
  * fixed-point BIGINT max(floor(scale * 10^6), 1) — clamped so a
  * tiny-magnitude vector (max|x| < 1e-6) cannot zero every candidate
  * score it participates in. Everything downstream of
  * the float→double cast is integer arithmetic, so candidate scores
  * (qdot * scale6_a * scale6_b) compare BIT-IDENTICALLY in any engine
  * — no float ordering hazard in the top-R cut. Score magnitude is
  * bounded by dim * 127^2 * scale6^2 < 2^63 for |x| < 2.9; embedding
  * corpora are unit-scale (max|x| < 1 in the test tables), leaving
  * >800x headroom.
  */
object Q8Codec {

  def pack(e: ArrayData, isFloat: Boolean): InternalRow = {
    val n = e.numElements()
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(if (isFloat) e.getFloat(i).toDouble else e.getDouble(i))
      if (x > maxabs) maxabs = x
      i += 1
    }
    val q = new Array[Any](n)
    i = 0
    while (i < n) {
      val x = if (isFloat) e.getFloat(i).toDouble else e.getDouble(i)
      q(i) = if (maxabs == 0) 0L else math.floor(x * 127 / maxabs).toLong
      i += 1
    }
    // clamp the published scale to >= 1: floor(maxabs*1e6) is 0 for any
    // vector with max|x| < 1e-6, which collapses every candidate score
    // to 0 and degenerates the top-R cut to neighbor_id order — a
    // silent recall loss. With the clamp the integer scores stay
    // proportional to the true dot for tiny-magnitude vectors too
    // (mirrored in the oracle SQL: greatest(floor(maxabs*1e6), 1)).
    new GenericInternalRow(Array[Any](
      math.max(1L, math.floor(maxabs * 1000000).toLong), new GenericArrayData(q)))
  }

  def dotInt(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"dot_int: length mismatch $n vs ${b.numElements()}")
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }
}

/** `q8_pack(array<float|double>)` → struct(scale6 BIGINT, q array<BIGINT>). */
case class Q8Pack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("scale6", LongType, nullable = false),
    StructField("q", ArrayType(LongType, containsNull = false), nullable = false)))

  override def prettyName: String = "q8_pack"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"q8_pack requires array<float|double>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    Q8Codec.pack(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Q8Codec.pack($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): Q8Pack =
    copy(child = newChild)
}

/** `dot_int(array<bigint>, array<bigint>)` → BIGINT exact dot product. */
case class DotInt(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_int"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_int requires array<bigint> arguments, got $l and $r")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    Q8Codec.dotInt(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.Q8Codec.dotInt($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotInt =
    copy(left = newLeft, right = newRight)
}
