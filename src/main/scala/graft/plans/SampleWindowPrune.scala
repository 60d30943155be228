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
  * Filter and conjoins the IMPLIED bare-timestamp bounds. Soundness:
  * rows of window s have t ∈ [s-i, s) and labels are multiples of i,
  * so `s ≥ A ⇔ s ≥ ceil_i(A) ⇒ t ≥ ceil_i(A) − i` and `s ≤ B ⇔
  * s ≤ floor_i(B) ⇒ t < floor_i(B)` — the added conjuncts are implied
  * row-by-row by the original predicate, which is KEPT, so the rewrite
  * can only prune work, never change results (locked bit-for-bit by
  * SampleWindowPruneSpec). The bare bounds then reach the parquet scan
  * as PushedFilters → row-group min/max pruning, and compose with
  * bucket-partition pruning on the series catalog layout.
  *
  * Wiring: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (injectOptimizerRule) or [[SampleWindowPrune.enable]] on an
  * already-built session (experimental.extraOptimizations).
  */
object SampleWindowPrune extends Rule[LogicalPlan] {

  /** Marks a Filter this rule already augmented (rule batches run to
    * fixpoint — without the tag it would keep conjoining copies). */
  private val pruned = TreeNodeTag[Boolean]("graft.sampleWindowPruned")

  /** Idempotently append the rule to an existing session's optimizer
    * (the extension-injection path needs the config set before the
    * session is built; this one works on any live session). */
  def enable(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  /** Matches `(t - pmod(t, i)) + i` → (timestamp attribute, interval). */
  private def windowShape(e: Expression): Option[(AttributeReference, Long)] =
    e match {
      case Add(Subtract(t1: AttributeReference,
            Pmod(t2: AttributeReference, Literal(i1: Long, LongType), _), _),
          Literal(i2: Long, LongType), _)
          if t1.exprId == t2.exprId && i1 == i2 && i1 > 0 =>
        Some((t1, i1))
      case _ => None
    }

  /** One conjunct as ((ts attribute, interval), (lower, upper)) label
    * bounds, when it compares a window-shaped expression to a long
    * literal. */
  private def exprBounds(conjunct: Expression)
      : Option[((AttributeReference, Long), (Option[Long], Option[Long]))] =
    conjunct match {
      case GreaterThanOrEqual(e, Literal(v: Long, LongType)) =>
        windowShape(e).map(w => (w, (Some(v), None)))
      case GreaterThan(e, Literal(v: Long, LongType)) =>
        windowShape(e).map(w => (w, (Some(v + 1), None)))
      case LessThanOrEqual(e, Literal(v: Long, LongType)) =>
        windowShape(e).map(w => (w, (None, Some(v))))
      case LessThan(e, Literal(v: Long, LongType)) =>
        windowShape(e).map(w => (w, (None, Some(v - 1))))
      case EqualTo(e, Literal(v: Long, LongType)) =>
        windowShape(e).map(w => (w, (Some(v), Some(v))))
      case GreaterThanOrEqual(Literal(v: Long, LongType), e) =>
        windowShape(e).map(w => (w, (None, Some(v))))
      case GreaterThan(Literal(v: Long, LongType), e) =>
        windowShape(e).map(w => (w, (None, Some(v - 1))))
      case LessThanOrEqual(Literal(v: Long, LongType), e) =>
        windowShape(e).map(w => (w, (Some(v), None)))
      case LessThan(Literal(v: Long, LongType), e) =>
        windowShape(e).map(w => (w, (Some(v + 1), None)))
      case EqualTo(Literal(v: Long, LongType), e) =>
        windowShape(e).map(w => (w, (Some(v), Some(v))))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) if f.getTagValue(pruned).isEmpty =>
      val found = splitConjunctivePredicates(cond).flatMap(exprBounds)
      if (found.isEmpty) f
      else {
        // per distinct (timestamp, interval) window: tightest label
        // bounds → implied raw-timestamp conjuncts
        val preds = found.groupBy { case ((ts, i), _) => (ts.exprId, i) }
          .values.toSeq.flatMap { group =>
            val (ts, i) = group.head._1
            val lower = group.flatMap(_._2._1).maxOption
            val upper = group.flatMap(_._2._2).minOption
            def ceilMul(v: Long): Long = Math.floorDiv(v + i - 1, i) * i
            def floorMul(v: Long): Long = Math.floorDiv(v, i) * i
            // rows of window s span t ∈ [s-i, s)
            lower.map(a => GreaterThanOrEqual(ts,
              Literal(ceilMul(a) - i, LongType)): Expression).toSeq ++
            upper.map(b => LessThan(ts,
              Literal(floorMul(b), LongType)): Expression).toSeq
          }
        if (preds.isEmpty) f
        else {
          val nf = Filter(And(cond, preds.reduce(And)), child)
          // tag the REPLACEMENT: a fresh Filter node would re-fire in
          // the fixpoint batch and keep stacking conjuncts
          nf.setTagValue(pruned, true)
          nf
        }
      }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }
}
