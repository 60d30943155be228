package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact decimal(30,6)-semantics sum of a double column at fixed-width
  * speed.
  *
  * `sum(CAST(x AS DECIMAL(30,6)))` is the engine-stable aggregation
  * this library uses everywhere (order-independent exact sums, see
  * COVERAGE.md determinism rules) — but above 18 digits Spark's
  * Decimal is BigDecimal-backed: every row pays the decimal wrap, a
  * precision-38 BigDecimal add, and a variable-width agg-buffer
  * update. Measured on the q1 aggregate at sf0.1: ~0.9 s vs ~0.25 s
  * for a plain double sum — and a long-backed DECIMAL(18,6) is no
  * faster, so the width is not the problem; the pathway is.
  *
  * The aggregate keeps the EXACT same arithmetic with a fixed-width
  * 3-long buffer: per row the double converts to exact micro-units
  * via the identical `BigDecimal.valueOf(x).setScale(6, HALF_UP)`
  * rounding Spark's double→decimal CAST uses (guarded arithmetic fast
  * path, [[MicroSumOps.toMicros]]), limb-split into (hi·10¹⁸ + lo),
  * and accumulated with carry — exact, order-independent, mergeable.
  * eval() reconstructs the full-precision BigDecimal and converts to
  * double exactly like CAST(dec AS DOUBLE), so results are
  * BIT-IDENTICAL to the decimal formulation (locked by SumMicroSpec
  * and every sumDec-based oracle gate).
  *
  * r4: reshaped from ImperativeAggregate to DECLARATIVE form. The
  * imperative update ran OUTSIDE whole-stage codegen: per row it paid
  * an interpreted `child.eval` (the q1 children are 3-op arithmetic
  * trees), a boxed Double, and a virtual update call — measured as
  * most of the remaining q1-class marginal gap vs the referent's
  * native int128 sums. Declarative update/merge expressions inline
  * into the generated aggregate loop; the only non-codegen'd piece is
  * one static call ([[MicroLimbs]] → `MicroSumOps.limbsOrNull`)
  * returning the per-row limb pair.
  *
  * Bounds: per-row micros are limb-split before accumulating (via
  * BigInteger division when |x| ≥ 9.2·10¹² — beyond single-long
  * micro-units — so the full per-row domain of the DECIMAL(30,6)
  * formulation stays exact, INCLUDING its ANSI overflow semantics:
  * rows at |x| ≥ 10²⁴ throw loudly, exactly like the ANSI-mode
  * decimal cast — and like the DuckDB oracle, which also errors on
  * decimal overflow; this session's engine runs ANSI-on, Spark 4's
  * default). The two-long accumulator is exact across its full
  * ±9.2·10³⁶ micro-unit span and fails LOUDLY beyond it — the hi-limb
  * adds are built as ANSI-mode Add expressions regardless of the
  * session's ansi setting. NaN/Infinity inputs are skipped like the
  * NULL their decimal cast produces.
  */
object MicroSumOps {

  val LIMB = 1000000000000000000L // 10^18

  // DECIMAL(30,6) capacity in micro-units: 10^30 (values at or beyond
  // 10^24 overflow the ANSI cast with an error — mirrored below)
  private val DEC30_MICROS = new java.math.BigInteger("1" + "0" * 30)

  /** double → exact micro-units with Spark's double→DECIMAL(_,6) cast
    * rounding: `BigDecimal.valueOf(x).setScale(6, HALF_UP)` — i.e.
    * HALF_UP (away from zero) applied to the double's SHORTEST decimal
    * representation.
    *
    * Fast path: the shortest representation s lies within ulp(x)/2 of
    * x, so round(s·10⁶) can only differ from arithmetic on x·10⁶ when
    * the value sits within a few ulps of a .5 boundary. We compute
    * y = |x|·10⁶ (one multiply, ≤ 0.5 ulp error), measure the distance
    * of its fractional part from 0.5, and when that distance clears an
    * 8-ulp guard band the away-from-zero rounding of y provably equals
    * the slow form — every boundary-adjacent value (and any |y| big
    * enough that ulp ≥ the band, incl. the overflow region) falls back
    * to the BigDecimal path, which also preserves the loud
    * `longValueExact` failure beyond ±9.2·10¹². Bit-parity across the
    * full double range is property-locked by SumMicroSpec.
    */
  def toMicros(x: Double): Long = {
    val a = Math.abs(x) * 1e6
    // 2^52: above this ulp(a) >= 1 and the guard band always trips;
    // staying below also keeps (long) casts exact
    if (a < 4.5e15) {
      val fl = Math.floor(a)
      val frac = a - fl // exact: Sterbenz subtraction
      val tol = 8 * Math.ulp(a) + java.lang.Double.MIN_VALUE
      if (Math.abs(frac - 0.5) > tol) {
        val n = if (frac > 0.5) fl.toLong + 1L else fl.toLong
        return if (x < 0) -n else n
      }
    }
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()
  }

  /** Per-row (hi, lo) micro-unit limbs of x under DECIMAL(30,6) cast
    * semantics, or null where the cast yields NULL (NaN/Infinity —
    * the row is skipped, exactly like the decimal sum). |lo| < LIMB
    * always (truncated division pair), the invariant the aggregate's
    * single-conditional carry requires. Called from generated code —
    * standalone object so the Janino call site binds a plain static
    * (the Q8Codec precedent). */
  def limbsOrNull(x: Double): InternalRow = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return null
    if (Math.abs(x) < 9.2e12) {
      val micros = toMicros(x)
      new GenericInternalRow(Array[Any](micros / LIMB, micros % LIMB))
    } else {
      // beyond long micro-units: limb-split the exact decimal directly
      // so the full DECIMAL(30,6) per-row domain stays exact —
      // including its loud ANSI overflow at |x| >= 1e24
      val bi = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).toBigIntegerExact
      if (bi.abs.compareTo(DEC30_MICROS) >= 0)
        throw new ArithmeticException(
          s"sum_micro: $x cannot be represented as DECIMAL(30,6)")
      val qr = bi.divideAndRemainder(java.math.BigInteger.valueOf(LIMB))
      new GenericInternalRow(Array[Any](qr(0).longValueExact, qr(1).longValue))
    }
  }

  /** Exact decimal reconstruction of the limb sum, then the same
    * BigDecimal→double conversion CAST(decimal AS DOUBLE) performs.
    * Once per group — cost irrelevant next to the update loop. */
  def evalSum(hi: Long, lo: Long): Double =
    java.math.BigDecimal.valueOf(hi).scaleByPowerOfTen(18)
      .add(java.math.BigDecimal.valueOf(lo))
      .scaleByPowerOfTen(-6).doubleValue()
}

/** `micro_limbs(double)` → struct(hi BIGINT, lo BIGINT), null for
  * NaN/Infinity (see [[MicroSumOps.limbsOrNull]]). The codegen'd
  * scalar feeding [[SumMicro]]'s declarative update. */
case class MicroLimbs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "micro_limbs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"micro_limbs requires a double argument, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    MicroSumOps.limbsOrNull(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MicroSumOps.limbsOrNull($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): MicroLimbs =
    copy(child = newChild)
}

/** `eval_micro_sum(hi, lo)` → double (see [[MicroSumOps.evalSum]]). */
case class EvalMicroSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "eval_micro_sum"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"eval_micro_sum requires bigint arguments, got $l and $r")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    MicroSumOps.evalSum(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.MicroSumOps.evalSum($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EvalMicroSum =
    copy(left = newLeft, right = newRight)
}

/** The `sum_micro` aggregate — see [[MicroSumOps]] for the contract.
  * Declarative so update/merge inline into whole-stage codegen. */
case class SumMicro(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  private val LIMB = MicroSumOps.LIMB

  override def prettyName: String = "sum_micro"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sum_micro requires a double argument, got $other")
  }

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, cnt)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L))

  /** hi-limb adds are ANSI regardless of session mode: a sum past the
    * ±9.2·10³⁶ micro-unit span must fail loudly, never wrap (the
    * imperative predecessor used Math.addExact). */
  private def addX(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.ANSI)

  /** Carry-add (hi2, lo2, cnt2) into (hiE, loE, cntE) — the expression
    * form of the Limbs.addPair invariant: |lo| and |lo2| < LIMB, so the
    * raw lo add cannot overflow and at most one carry adjusts hi. */
  private def carried(hiE: Expression, loE: Expression, cntE: Expression,
      hi2: Expression, lo2: Expression, cnt2: Expression): Seq[Expression] = {
    val rawLo = Add(loE, lo2) // bounded: |lo|+|lo2| < 2·10¹⁸ < Long.Max
    val adj = CaseWhen(Seq(
      (GreaterThanOrEqual(rawLo, Literal(LIMB)), Literal(1L)),
      (LessThanOrEqual(rawLo, Literal(-LIMB)), Literal(-1L))), Literal(0L))
    val newLo = Subtract(rawLo, Multiply(adj, Literal(LIMB)))
    val newHi = addX(addX(hiE, hi2), adj)
    Seq(newHi, newLo, Add(cntE, cnt2))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val limbs = MicroLimbs(child)
    val upd = carried(hi, lo, cnt,
      GetStructField(limbs, 0, Some("hi")),
      GetStructField(limbs, 1, Some("lo")), Literal(1L))
    // null limbs (null child, NaN, Infinity) → row skipped, buffer kept
    val skip = IsNull(limbs)
    Seq(If(skip, hi, upd(0)), If(skip, lo, upd(1)), If(skip, cnt, upd(2)))
  }

  override lazy val mergeExpressions: Seq[Expression] =
    carried(hi.left, lo.left, cnt.left, hi.right, lo.right, cnt.right)

  override lazy val evaluateExpression: Expression =
    If(EqualTo(cnt, Literal(0L)), Literal(null, DoubleType), EvalMicroSum(hi, lo))

  override protected def withNewChildInternal(newChild: Expression): SumMicro =
    copy(child = newChild)
}

/** `micros6(x)` — per-row exact micro-units of a double under the
  * SAME DECIMAL(30,6)-cast semantics as [[SumMicro]]'s per-row step
  * ([[MicroSumOps.toMicros]]: HALF_UP at scale 6, the guard-band
  * proof), restricted to the single-long domain |x| < 9.2e12 (beyond
  * it the exact conversion fails LOUDLY with ArithmeticException —
  * never a silent wrap; callers needing the full decimal domain use
  * [[SumMicro]] itself). NaN/Infinity yield NULL exactly like the
  * decimal cast, so `sum(micros6(x))` skips those rows the way
  * `sum(CAST(x AS DECIMAL))` does.
  *
  * Purpose: the mergeable LONG-state building block for incremental
  * partials — data-scale passes sum plain longs (codegen'd integer
  * adds, ANSI-loud on overflow) and only state-scale relations widen
  * back to decimal (see graft.ops.Incremental). */
case class Micros6(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "micros6"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"micros6 requires a double argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[Double]
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) null
    else MicroSumOps.toMicros(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if (java.lang.Double.isNaN($c) || java.lang.Double.isInfinite($c)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.MicroSumOps.toMicros($c);
      }
    """)

  override protected def withNewChildInternal(newChild: Expression): Micros6 =
    copy(child = newChild)
}
