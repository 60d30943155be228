package graft.tsql

import java.time.{LocalDate, LocalDateTime, ZoneOffset}

/** Plan-time evaluation of TimeExpr trees to epoch-nanos Longs
  * (reference eval_op/extract_timestamp, src/statement_execute.c:118-217).
  *
  * Everything is constant-folded before the DataFrame plan is built, so
  * Catalyst only ever sees Long literals — range predicates stay
  * pushdown-able. `now()` is injectable for deterministic tests
  * (reference uses CLOCK_REALTIME, src/timeutil.c:13-20).
  *
  * Date literals `YYYY-MM-DD[ HH:MM:SS[.frac]]` resolve in UTC — a
  * documented divergence from the reference's local-time mktime
  * (src/timeutil.c:125, SURVEY.md §2.2); the fractional part is
  * right-padded to 9 digits, i.e. `.5` = 500ms (src/timeutil.c:88-100).
  */
object TimeEval {

  def nowNanos(): Long = {
    val inst = java.time.Instant.now()
    inst.getEpochSecond * 1000000000L + inst.getNano
  }

  def eval(e: TimeExpr, now: () => Long = nowNanos _): Either[String, Long] = e match {
    case TimeExpr.Num(ns) => Right(ns)
    case TimeExpr.Span(ns) => Right(ns)
    case TimeExpr.Now => Right(now())
    case TimeExpr.DateLit(text) => parseDate(text)
    case TimeExpr.BinOp(op, l, r) =>
      for {
        a <- eval(l, now)
        b <- eval(r, now)
        v <- op match {
          case '+' => Right(a + b)
          case '-' => Right(a - b)
          case '*' => Right(a * b)
          case other => Left(s"unknown time operator '$other'")
        }
      } yield v
  }

  /** `YYYY-MM-DD` or `YYYY-MM-DD HH:MM:SS[.frac]` → epoch-nanos UTC
    * (reference src/timeutil.c:75-133). */
  def parseDate(text: String): Either[String, Long] = {
    val t = text.trim
    try {
      if (t.length == 10) {
        val d = LocalDate.parse(t)
        Right(d.atStartOfDay(ZoneOffset.UTC).toEpochSecond * 1000000000L)
      } else {
        val (main, frac) = t.indexOf('.') match {
          case -1 => (t, 0L)
          case i =>
            // right-pad fractional digits to 9 (reference src/timeutil.c:88-100)
            val digits = t.substring(i + 1).padTo(9, '0').take(9)
            (t.substring(0, i), digits.toLong)
        }
        val dt = LocalDateTime.parse(main.replace(' ', 'T'))
        Right(dt.toEpochSecond(ZoneOffset.UTC) * 1000000000L + frac)
      }
    } catch {
      case e: Exception => Left(s"invalid date literal '$text': ${e.getMessage}")
    }
  }
}
