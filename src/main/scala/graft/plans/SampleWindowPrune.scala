package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.LongType

/** Optimizer rule: derive scannable timestamp bounds from a range
  * predicate on a SAMPLE BY window LABEL.
  *
  * `SeriesOps.sampleBy` labels each tumbling window by its end
  * timestamp, `sample_ts = (t - pmod(t, i)) + i`. A consumer filtering
  * the aggregated result — `sampleBy(series, i).filter($"sample_ts"
  * between (a, b))` — gets Catalyst's own help only part of the way:
  * the label predicate is pushed below the aggregation with the window
  * arithmetic substituted inline, but a comparison on that DERIVED
  * expression can never become a parquet `PushedFilter` (only bare
  * attribute comparisons do), so the scan still reads the entire
  * series. At 100 TB that is the difference between scanning a day and
  * scanning the archive.
  *
  * This rule finds comparisons of the window expression against long
  * literals (`>= > <= < =`, either orientation, under AND) in any
  * Filter and conjoins the IMPLIED bare-timestamp bounds. The
  * timestamp operand may itself be a truncating unit projection
  * `raw div scale` (the micros-view-over-nanos-storage pattern,
  * Tables.eventSeries) — bounds are then translated to the RAW column,
  * which is the one with parquet statistics ("push filters in the
  * storage column's own unit", docs/PLANS.md).
  *
  * Soundness: rows of window s have t ∈ [s-i, s) and labels are
  * multiples of i, so `s ≥ A ⇔ s ≥ ceil_i(A) ⇒ t ≥ ceil_i(A) − i` and
  * `s ≤ B ⇒ t < floor_i(B)`; for a truncating projection t =
  * trunc(raw/scale) (either sign), `t ≥ X ⇒ raw ≥ (X−1)·scale + 1` and
  * `t < U ⇒ raw < U·scale`. Every translation step runs in
  * overflow-checked arithmetic and DROPS the bound when it cannot be
  * represented (never prunes on wrapped values). The added conjuncts
  * are implied row-by-row by the original predicate, which is KEPT, so
  * the rewrite can only prune work, never change results (locked
  * bit-for-bit by SampleWindowPruneSpec).
  *
  * Wiring: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (injectOptimizerRule) or [[SampleWindowPrune.enable]] on an
  * already-built session (experimental.extraOptimizations).
  */
object SampleWindowPrune extends Rule[LogicalPlan] with PredicateHelper {

  /** Fast-path marker for a Filter this rule already augmented. The
    * real idempotency guard is semantic: implied conjuncts already
    * present in the condition are never re-added, so the rule is a
    * no-op on its own output even when another rule rebuilds the
    * Filter node and drops the tag (tags do not survive node copies). */
  private val pruned = TreeNodeTag[Boolean]("graft.sampleWindowPruned")

  /** Idempotently append the rule to an existing session's optimizer
    * (the extension-injection path needs the config set before the
    * session is built; this one works on any live session). */
  def enable(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  /** The timestamp operand inside the window arithmetic: a bare column
    * (scale 1) or a truncating unit projection `raw div scale`. */
  private def tsOperand(e: Expression): Option[(AttributeReference, Long)] =
    e match {
      case a: AttributeReference => Some((a, 1L))
      // analysis coerces div operands to Long and folds the cast, so a
      // long literal divisor is the only shape that reaches the optimizer
      case IntegralDivide(a: AttributeReference,
          Literal(d: Long, LongType), _) if d > 0 => Some((a, d))
      case _ => None
    }

  /** Matches `(t - pmod(t, i)) + i` → (raw attribute, interval, scale). */
  private def windowShape(e: Expression)
      : Option[(AttributeReference, Long, Long)] = e match {
    case Add(Subtract(t1, Pmod(t2, Literal(i1: Long, LongType), _), _),
        Literal(i2: Long, LongType), _)
        if i1 == i2 && i1 > 0 && t1.semanticEquals(t2) =>
      tsOperand(t1).map { case (a, scale) => (a, i1, scale) }
    case _ => None
  }

  private def safe(f: => Long): Option[Long] =
    try Some(f) catch { case _: ArithmeticException => None }

  /** One conjunct as ((raw ts, interval, scale), (lower, upper))
    * inclusive label bounds, when it compares a window-shaped
    * expression to a long literal. Bound adjustments that overflow
    * yield None — no pruning from that conjunct. */
  private def exprBounds(conjunct: Expression): Option[
      ((AttributeReference, Long, Long), (Option[Long], Option[Long]))] = {
    def lo(e: Expression, v: Option[Long]) =
      v.flatMap(x => windowShape(e).map(w => (w, (Some(x), Option.empty[Long]))))
    def hi(e: Expression, v: Option[Long]) =
      v.flatMap(x => windowShape(e).map(w => (w, (Option.empty[Long], Some(x)))))
    def eq(e: Expression, v: Long) =
      windowShape(e).map(w => (w, (Some(v), Some(v))))
    conjunct match {
      case GreaterThanOrEqual(e, Literal(v: Long, LongType)) => lo(e, Some(v))
      case GreaterThan(e, Literal(v: Long, LongType)) => lo(e, safe(Math.addExact(v, 1L)))
      case LessThanOrEqual(e, Literal(v: Long, LongType)) => hi(e, Some(v))
      case LessThan(e, Literal(v: Long, LongType)) => hi(e, safe(Math.subtractExact(v, 1L)))
      case EqualTo(e, Literal(v: Long, LongType)) => eq(e, v)
      case GreaterThanOrEqual(Literal(v: Long, LongType), e) => hi(e, Some(v))
      case GreaterThan(Literal(v: Long, LongType), e) => hi(e, safe(Math.subtractExact(v, 1L)))
      case LessThanOrEqual(Literal(v: Long, LongType), e) => lo(e, Some(v))
      case LessThan(Literal(v: Long, LongType), e) => lo(e, safe(Math.addExact(v, 1L)))
      case EqualTo(Literal(v: Long, LongType), e) => eq(e, v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) if f.getTagValue(pruned).isEmpty =>
      val conjuncts = splitConjunctivePredicates(cond)
      val found = conjuncts.flatMap(exprBounds)
      if (found.isEmpty) f
      else {
        // per distinct (raw ts, interval, scale) window: tightest label
        // bounds → implied raw-timestamp conjuncts, overflow-checked
        val preds = found.groupBy { case ((ts, i, sc), _) => (ts.exprId, i, sc) }
          .values.toSeq.flatMap { group =>
            val (ts, i, scale) = group.head._1
            val lower = group.flatMap(_._2._1).maxOption
            val upper = group.flatMap(_._2._2).minOption
            def ceilMul(v: Long): Option[Long] = safe(
              Math.multiplyExact(Math.floorDiv(Math.addExact(v, i - 1), i), i))
            def floorMul(v: Long): Option[Long] = safe(
              Math.multiplyExact(Math.floorDiv(v, i), i))

            // WRAP ZONES: within one window of the Long extremes, the
            // label arithmetic itself overflows in non-ANSI mode —
            // t ≥ wHigh wraps its label negative (satisfying any upper
            // bound), t < wLow wraps it positive (satisfying any lower
            // bound). Those rows pass the ORIGINAL predicate with their
            // wrapped labels, so the added bounds must not prune them:
            // each bound ORs in its wrap zone when any raw value can
            // reach it (for scale > 1, |t| ≤ Long.Max/scale never
            // does; both thresholds are then unreachable and the
            // bounds stay bare).
            val wHigh = Math.floorDiv(Long.MaxValue - i, i) * i + i // first top-wrapping t
            val wLow = Math.floorDiv(Long.MinValue + i - 1, i) * i // first NON-wrapping t
            val topEscape: Option[Expression] =
              if (wHigh <= Long.MaxValue / scale)
                safe(Math.addExact(Math.multiplyExact(wHigh - 1, scale), 1L))
                  .map(v => GreaterThanOrEqual(ts, Literal(v, LongType)))
              else None
            val bottomEscape: Option[Expression] =
              if (wLow > Long.MinValue / scale)
                safe(Math.multiplyExact(wLow, scale))
                  .map(v => LessThan(ts, Literal(v, LongType)))
              else None

            // label ≥ A ⇒ t ≥ ceil_i(A) − i ⇒ raw ≥ (X−1)·scale + 1
            val loPred = lower.flatMap(ceilMul).flatMap(cm => safe {
              val x = Math.subtractExact(cm, i)
              Math.addExact(Math.multiplyExact(Math.subtractExact(x, 1L), scale), 1L)
            }).map(v => GreaterThanOrEqual(ts, Literal(v, LongType)): Expression)
              .map(p => bottomEscape.fold(p)(esc => Or(p, esc)))
            // label ≤ B ⇒ t < floor_i(B) ⇒ raw < U·scale
            val hiPred = upper.flatMap(floorMul).flatMap(fm =>
              safe(Math.multiplyExact(fm, scale)))
              .map(v => LessThan(ts, Literal(v, LongType)): Expression)
              .map(p => topEscape.fold(p)(esc => Or(p, esc)))
            loPred.toSeq ++ hiPred.toSeq
          }
        // semantic idempotency: never re-add a conjunct that is already
        // there (guards the fixpoint even if the tag is lost to a node
        // rebuild by another rule)
        val missing = preds.filterNot(p => conjuncts.exists(_.semanticEquals(p)))
        if (missing.isEmpty) f
        else {
          val nf = Filter(And(cond, missing.reduce(And)), child)
          nf.setTagValue(pruned, true)
          nf
        }
      }
  }
}
