package graft.tsql

import org.scalatest.funsuite.AnyFunSuite

import TimeExpr._

/** TimeExpr → epoch-nanos evaluation (reference src/statement_execute.c:118-217,
  * src/timeutil.c). */
class TimeEvalSpec extends AnyFunSuite {

  private val fixedNow = 1700000000000000000L

  private def ev(e: TimeExpr): Long =
    TimeEval.eval(e, () => fixedNow).fold(err => fail(err), identity)

  test("integer literals pass through raw (statement_execute.c:182-183)") {
    assert(ev(Num(87829132377L)) == 87829132377L)
  }

  test("now() - 2d arithmetic (statement_execute.c:165-172)") {
    assert(ev(BinOp('-', Now, Span(2L * 86400L * 1000000000L))) ==
      fixedNow - 172800000000000L)
  }

  test("date-only literal resolves to UTC midnight nanos (timeutil.c:75-133)") {
    // 2024-01-01T00:00:00Z = 1704067200 epoch-seconds
    assert(ev(DateLit("2024-01-01")) == 1704067200000000000L)
  }

  test("datetime literal with fractional seconds right-padded to 9 digits (timeutil.c:88-100)") {
    assert(ev(DateLit("2024-01-01 00:00:01.5")) == 1704067201500000000L)
    assert(ev(DateLit("2024-01-01 12:30:15.000000001")) ==
      1704067200000000000L + (12L * 3600 + 30 * 60 + 15) * 1000000000L + 1L)
  }

  test("invalid dates error rather than default") {
    assert(TimeEval.parseDate("not-a-date").isLeft)
    assert(TimeEval.parseDate("2024-13-40").isLeft)
  }

  test("property: + and - are inverse over spans (100 seeded cases)") {
    val rnd = new scala.util.Random(47) // reference test seed, tests/timeseries_test.c:409
    for (_ <- 0 until 100) {
      val base = rnd.nextLong(1L << 62)
      val span = Span(rnd.nextLong(1L << 40))
      assert(ev(BinOp('-', BinOp('+', Num(base), span), span)) == base)
    }
  }
}
