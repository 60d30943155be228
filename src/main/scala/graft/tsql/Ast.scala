package graft.tsql

/** Statement ADT for the reference's SQL dialect.
  *
  * Mirrors the statement tagged union of the reference
  * (src/statement_parse.h:144-315): CREATEDB/USE/CREATE/INSERT/SELECT/
  * DELETE + the `.databases`/`.timeseries` meta commands. Time values
  * are `TimeExpr` trees evaluated to epoch-nanos at plan time
  * (src/statement_parse.h:172-190, src/statement_execute.c:118-217).
  */
sealed trait TimeExpr
object TimeExpr {
  /** Raw integer literal — passes through as epoch-nanos
    * (reference src/statement_execute.c:182-183). */
  final case class Num(ns: Long) extends TimeExpr
  /** `'YYYY-MM-DD[ HH:MM:SS[.frac]]'` literal (reference src/timeutil.c:75-133).
    * Resolved in UTC (documented divergence from the reference's mktime
    * local time, SURVEY.md §2.2). */
  final case class DateLit(text: String) extends TimeExpr
  /** `now()` — wall clock in nanos (reference src/timeutil.c:13-20). */
  case object Now extends TimeExpr
  /** Span literal like `3d`/`15m`/`10ms` already scaled to nanos
    * (reference src/timeutil.c:50-73). */
  final case class Span(ns: Long) extends TimeExpr
  /** `+ - *` over time units, recursive
    * (reference src/statement_parse.c:821-877). */
  final case class BinOp(op: Char, lhs: TimeExpr, rhs: TimeExpr) extends TimeExpr
}

/** The 6 WHERE comparators (reference src/statement_parse.h:150-158).
  * `OR` exists in the reference enum but has no token there
  * (unparseable); this engine adds the token as a dialect extension —
  * AND binds tighter, so a WHERE clause is a disjunction of
  * AND-chains (see Statement.Select.where). */
object CmpOp extends Enumeration {
  val Eq, Ne, Lt, Le, Gt, Ge = Value
}

/** One `key op literal` predicate; WHERE is a conjunction of these
  * (reference parse_where, src/statement_parse.c:649-679).
  * `raw` preserves the literal text: epoch-nanos timestamps exceed
  * Double's 53-bit mantissa, so `timestamp` comparisons must re-parse
  * the raw text as a Long to avoid silent rounding. */
final case class WherePred(key: String, op: CmpOp.Value, value: Double,
    raw: String = "") {
  def longValue: Long =
    try raw.toLong catch { case _: NumberFormatException => value.toLong }
}

/** Aggregate selector functions (reference src/statement_parse.h:147:
  * FN_MIN/FN_MAX/FN_AVG/FN_LATEST; `earliest(col, n)` is declared in
  * the grammar doc at src/statement_parse.h:103; `delta`/`rate` are
  * dialect extensions — the counter-analytics selectors of monitoring
  * query languages, see SeriesOps.sampleByFn). */
sealed trait SelectFn
object SelectFn {
  case object Min extends SelectFn
  case object Max extends SelectFn
  case object Avg extends SelectFn
  case object Latest extends SelectFn
  final case class Earliest(n: Int) extends SelectFn
  case object Delta extends SelectFn
  case object Rate extends SelectFn
}

sealed trait Statement
object Statement {
  final case class CreateDb(name: String) extends Statement
  final case class UseDb(name: String) extends Statement
  /** retention + duplication policy options
    * (reference src/statement_parse.c:879-922, ts_opts_t src/timeseries.h:88-92). */
  final case class CreateTs(name: String, retention: Option[TimeExpr],
      dupPolicy: Option[String]) extends Statement
  /** Multi-row insert; a single-VALUE insert carries one row with
    * `TimeExpr.Now` (reference src/statement_parse.c:983-1021). */
  final case class Insert(ts: String, rows: Seq[(TimeExpr, Double)]) extends Statement
  final case class Select(
      ts: String,
      fn: Option[SelectFn],
      between: Option[(TimeExpr, TimeExpr)],
      /** Disjunctive normal form: outer Seq = OR groups, inner Seq =
        * AND-chain (AND binds tighter than OR). Empty = no WHERE. */
      where: Seq[Seq[WherePred]],
      sampleBy: Option[TimeExpr],
      limit: Option[Int],
      /** dialect extension: `FILL(prev|linear|null)` after SAMPLE BY —
        * gap buckets filled per SeriesOps.sampleByFill. */
      fill: Option[String] = None) extends Statement
  /** `DELETE ts FROM db` drops a series; bare `DELETE x` drops database x
    * (reference src/statement_parse.c:924-964). */
  final case class Delete(name: String, fromDb: Option[String]) extends Statement
  final case class Meta(cmd: String) extends Statement // "databases" | "timeseries"
}
