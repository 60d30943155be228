package graft.functions

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
  * into the generated aggregate loop; the only non-codegen'd pieces
  * are two long-valued static calls ([[HiLimb]]/[[LoLimb]]) returning
  * the per-row limbs. (r11: those statics replaced a struct-returning
  * one — the GenericInternalRow + two boxed longs it allocated per
  * row per aggregate measured as ~3x of the whole q1-class
  * aggregation at 180M rows; the long form allocates nothing.)
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

  /** Rare-path limb (|x| ≥ 9.2·10¹² — beyond single-long micro-units):
    * limb-split the exact decimal directly so the full DECIMAL(30,6)
    * per-row domain stays exact, including its loud ANSI overflow at
    * |x| ≥ 10²⁴. Computed per limb (hi and lo each redo the split) —
    * the path is off the hot loop by construction. */
  private def bigLimb(x: Double, wantHi: Boolean): Long = {
    val bi = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .movePointRight(6).toBigIntegerExact
    if (bi.abs.compareTo(DEC30_MICROS) >= 0)
      throw new ArithmeticException(
        s"sum_micro: $x cannot be represented as DECIMAL(30,6)")
    val qr = bi.divideAndRemainder(java.math.BigInteger.valueOf(LIMB))
    if (wantHi) qr(0).longValueExact else qr(1).longValue
  }

  /** Per-row hi micro-unit limb of x under DECIMAL(30,6) cast
    * semantics. NaN/Infinity return 0 — callers (the aggregate's
    * update) guard those rows out with an explicit skip predicate, the
    * way the decimal cast yields NULL. (hi, lo) are the truncated
    * division pair so |lo| < LIMB always — the invariant the
    * aggregate's single-conditional carry requires. Plain longs from
    * standalone statics so the generated update loop stays
    * ALLOCATION-FREE: the struct-returning predecessor paid a
    * GenericInternalRow + two boxed longs per row per aggregate —
    * measured as most of the q1-class marginal gap (4.4 s vs 1.5 s for
    * the 5-sum q1 aggregate at 180M rows). */
  def hiLimb(x: Double): Long =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) 0L
    else if (Math.abs(x) < 9.2e12) toMicros(x) / LIMB
    else bigLimb(x, wantHi = true)

  /** Per-row lo micro-unit limb — see [[hiLimb]]. */
  def loLimb(x: Double): Long =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) 0L
    else if (Math.abs(x) < 9.2e12) toMicros(x) % LIMB
    else bigLimb(x, wantHi = false)

  /** Exact decimal reconstruction of the limb sum, then the same
    * BigDecimal→double conversion CAST(decimal AS DOUBLE) performs.
    * Once per group — cost irrelevant next to the update loop. */
  def evalSum(hi: Long, lo: Long): Double =
    java.math.BigDecimal.valueOf(hi).scaleByPowerOfTen(18)
      .add(java.math.BigDecimal.valueOf(lo))
      .scaleByPowerOfTen(-6).doubleValue()
}

/** `hi_limb(double)` → BIGINT (see [[MicroSumOps.hiLimb]]): the
  * codegen'd long-valued scalar feeding [[SumMicro]]'s declarative
  * update. Long-typed (not a struct) so the generated aggregate loop
  * allocates NOTHING per row — one static call, one long. NaN/Infinity
  * yield 0; the aggregate's skip predicate excludes those rows before
  * the value is used. */
case class HiLimb(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hi_limb"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hi_limb requires a double argument, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    MicroSumOps.hiLimb(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MicroSumOps.hiLimb($c)")

  override protected def withNewChildInternal(newChild: Expression): HiLimb =
    copy(child = newChild)
}

/** `lo_limb(double)` → BIGINT — the lo pair of [[HiLimb]]. */
case class LoLimb(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "lo_limb"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lo_limb requires a double argument, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    MicroSumOps.loLimb(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MicroSumOps.loLimb($c)")

  override protected def withNewChildInternal(newChild: Expression): LoLimb =
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
    // Zero-default single-conditional form: a skipped row (null / NaN
    // / Infinity child — exactly the rows whose decimal cast yields
    // NULL) contributes IDENTITY limbs instead of branching per slot.
    // The statics already return 0 for NaN/Infinity; Coalesce covers
    // the null child — so hi/lo update unconditionally (adding 0 is a
    // no-op through the carry: rawLo keeps |lo| < LIMB, adj = 0) and
    // only the count keeps a conditional. r11: the struct-returning
    // predecessor (GenericInternalRow + two boxed longs per row per
    // aggregate) measured ~3x of the whole q1 aggregation at 180M
    // rows; the three If-per-slot skips this form removes were most
    // of the residual vs the alloc-free floor. The per-row hi add is
    // ONE overflow-checked add: |hi2| ≤ 10¹² (per-row limb bound) and
    // |adj| ≤ 1, so hi2 + adj is a plain add — unlike merge, where
    // both sides are accumulator-scale and keep the two-ANSI form.
    val hi2 = Coalesce(Seq(HiLimb(child), Literal(0L)))
    val lo2 = Coalesce(Seq(LoLimb(child), Literal(0L)))
    val rawLo = Add(lo, lo2) // bounded: |lo| + |lo2| < 2·10¹⁸
    val adj = CaseWhen(Seq(
      (GreaterThanOrEqual(rawLo, Literal(LIMB)), Literal(1L)),
      (LessThanOrEqual(rawLo, Literal(-LIMB)), Literal(-1L))), Literal(0L))
    val newLo = Subtract(rawLo, Multiply(adj, Literal(LIMB)))
    val newHi = addX(hi, Add(hi2, adj))
    val live = Not(Or(IsNull(child), Or(IsNaN(child),
      Or(EqualTo(child, Literal(Double.PositiveInfinity)),
        EqualTo(child, Literal(Double.NegativeInfinity))))))
    Seq(newHi, newLo, Add(cnt, If(live, Literal(1L), Literal(0L))))
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
