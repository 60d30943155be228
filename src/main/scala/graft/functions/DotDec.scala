package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Row-at-a-time exact-decimal dot product shared by interpreted eval
  * and generated code.
  *
  * Semantics are locked BIT-FOR-BIT to the SQL form used by the DuckDB
  * oracles (and previously by the interpreted higher-order-function
  * plan):
  * {{{
  * CAST(aggregate(zip_with(a, b,
  *   (x, y) -> CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(30,12))),
  *   CAST(0 AS DECIMAL(30,12)),
  *   (acc, v) -> CAST(acc + v AS DECIMAL(30,12))) AS DOUBLE)
  * }}}
  * i.e. each product is rounded to decimal scale 12 the way Spark's
  * double→decimal CAST rounds (via the double's shortest string
  * representation, HALF_UP — `BigDecimal.valueOf`), the sum is exact,
  * and one final decimal→double conversion closes it. Summation is
  * therefore order-independent, which is what makes results identical
  * across partitionings and engines.
  */
object VecCodec {

  def dotDec(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"dot_dec: length mismatch ${n} vs ${b.numElements()}")
    // Fast path: each product rounded to fix12 units ([[toFix12]] —
    // bit-identical to the BigDecimal setScale(12, HALF_UP) form by its
    // guard-band proof), summed exactly in a long. Unit-norm embedding
    // products are ≤ 1, so the sum stays far below Long.MaxValue; any
    // input large enough to overflow the units (|product| ≳ 9.2·10⁶) or
    // the running sum throws ArithmeticException and lands on the exact
    // BigDecimal path below — same rounding, arbitrary magnitude. The
    // per-element BigDecimal allocation this avoids dominated the
    // pairwise-cosine stages (3 allocations/element; the k-means
    // treeAggregate at Similarity.scala:311 already accumulates this
    // way).
    try {
      var acc = 0L
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i))
          throw new IllegalArgumentException(s"dot_dec: null element at $i")
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        acc = Math.addExact(acc, toFix12(x * y))
        i += 1
      }
      return java.math.BigDecimal.valueOf(acc, 12).doubleValue()
    } catch { case _: ArithmeticException => () }
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"dot_dec: null element at $i")
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc = acc.add(java.math.BigDecimal.valueOf(x * y)
        .setScale(12, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue()
  }

  /** [[dotDec]] of a CONTIGUOUS SLICE of a float/double array column
    * against a constant double vector — bit-identical to
    * `dot_dec(slice(a, off+1, c.length), c)`: same per-product
    * toFix12 rounding, same exact long accumulation, same
    * BigDecimal fallback on overflow (unreachable for unit-scale
    * embeddings, kept for strict parity). Shared by the fused PQ
    * kernel expressions (PqKernel.scala) so the subspace arithmetic
    * stays THIS audited chain. */
  def dotDecSliceConst(a: ArrayData, aFloat: Boolean, off: Int,
      c: Array[Double]): Double = {
    try {
      var acc = 0L
      var i = 0
      while (i < c.length) {
        if (a.isNullAt(off + i))
          throw new IllegalArgumentException(s"dot_dec: null element at ${off + i}")
        val x = if (aFloat) a.getFloat(off + i).toDouble else a.getDouble(off + i)
        acc = Math.addExact(acc, toFix12(x * c(i)))
        i += 1
      }
      return java.math.BigDecimal.valueOf(acc, 12).doubleValue()
    } catch { case _: ArithmeticException => () }
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < c.length) {
      if (a.isNullAt(off + i))
        throw new IllegalArgumentException(s"dot_dec: null element at ${off + i}")
      val x = if (aFloat) a.getFloat(off + i).toDouble else a.getDouble(off + i)
      acc = acc.add(java.math.BigDecimal.valueOf(x * c(i))
        .setScale(12, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue()
  }

  /** [[dotDec]] of a slice with ITSELF (the normDec(slice(...)) chain
    * before the sqrt) — bit-identical to `dot_dec(pe, pe)` on the
    * sliced column. */
  def dotDecSliceSelf(a: ArrayData, aFloat: Boolean, off: Int,
      len: Int): Double = {
    try {
      var acc = 0L
      var i = 0
      while (i < len) {
        if (a.isNullAt(off + i))
          throw new IllegalArgumentException(s"dot_dec: null element at ${off + i}")
        val x = if (aFloat) a.getFloat(off + i).toDouble else a.getDouble(off + i)
        acc = Math.addExact(acc, toFix12(x * x))
        i += 1
      }
      return java.math.BigDecimal.valueOf(acc, 12).doubleValue()
    } catch { case _: ArithmeticException => () }
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < len) {
      if (a.isNullAt(off + i))
        throw new IllegalArgumentException(s"dot_dec: null element at ${off + i}")
      val x = if (aFloat) a.getFloat(off + i).toDouble else a.getDouble(off + i)
      acc = acc.add(java.math.BigDecimal.valueOf(x * x)
        .setScale(12, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue()
  }

  /** Same accumulation over driver-side constant vectors (for norms of
    * plan-time model state — inlined as literals, not computed per
    * row). */
  def dotDecConst(a: Array[Double], b: Array[Double]): Double = {
    require(a.length == b.length, "dotDecConst: length mismatch")
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < a.length) {
      acc = acc.add(java.math.BigDecimal.valueOf(a(i) * b(i))
        .setScale(12, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue()
  }

  /** double → exact fixed-point units at scale 12, with the identical
    * HALF_UP-on-shortest-representation rounding as
    * `BigDecimal.valueOf(x).setScale(12, HALF_UP)` — the
    * SumMicro.toMicros guard-band construction at a different scale
    * (see its proof; the 8-ulp band argument is scale-independent).
    * Throws loudly via longValueExact when the units overflow a long
    * (|x| ≳ 9.2·10⁶ — far above any embedding product). Bit-parity is
    * property-locked in DotDecSpec. */
  def toFix12(x: Double): Long = {
    val a = Math.abs(x) * 1e12
    if (a < 4.5e15) {
      val fl = Math.floor(a)
      val frac = a - fl
      val tol = 8 * Math.ulp(a) + java.lang.Double.MIN_VALUE
      if (Math.abs(frac - 0.5) > tol) {
        val n = if (frac > 0.5) fl.toLong + 1L else fl.toLong
        return if (x < 0) -n else n
      }
    }
    java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)
      .movePointRight(12).longValueExact()
  }

  /** HALF_UP rounding to 4 decimals, bit-identical to
    * `BigDecimal.valueOf(x).setScale(4, HALF_UP).doubleValue()`: the
    * fast path computes the exact scaled integer n (< 2^53, exact in a
    * double) and divides by the exactly-representable 1e4 — one
    * correctly-rounded operation, the same nearest-double-to-n/10⁴ the
    * slow path produces. Guard band as in [[toFix12]]. */
  def round4(x: Double): Double = {
    val a = Math.abs(x) * 1e4
    if (a < 4.5e15) {
      val fl = Math.floor(a)
      val frac = a - fl
      val tol = 8 * Math.ulp(a) + java.lang.Double.MIN_VALUE
      if (Math.abs(frac - 0.5) > tol) {
        val n = if (frac > 0.5) fl + 1.0 else fl
        // n == 0: return +0.0 for either sign — BigDecimal has no
        // signed zero, so the slow path never produces -0.0
        return if (n == 0.0) 0.0 else (if (x < 0) -n else n) / 1e4
      }
    }
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }
}

/** Native Catalyst expression for the exact-decimal dot product of two
  * float/double array columns.
  *
  * Replaces the interpreted `aggregate(zip_with(...))` composition on
  * the similarity hot paths: higher-order-function lambdas do not
  * participate in whole-stage codegen and pay per-element interpreter
  * dispatch plus per-step Decimal boxing (measured ~3x on the IVF
  * k-means path at sf0.1 — the Shingles3 lesson again, docs/PLANS.md).
  * `doGenCode` emits one static call, keeping the projection inside
  * codegen. Length mismatches and null elements throw (the embedding
  * contract is fixed-dimension non-null vectors) instead of silently
  * diverging from the lambda form's null propagation.
  */
case class DotDec(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_dec"

  private def elemOk(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(FloatType, _) => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemOk(left.dataType), elemOk(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_dec requires array<float|double> arguments, got " +
          s"${left.dataType} and ${right.dataType}")
    }

  private lazy val leftFloat = elemOk(left.dataType).get
  private lazy val rightFloat = elemOk(right.dataType).get

  override def nullSafeEval(l: Any, r: Any): Any =
    VecCodec.dotDec(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.VecCodec.dotDec($l, $r, $leftFloat, $rightFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotDec =
    copy(left = newLeft, right = newRight)
}
