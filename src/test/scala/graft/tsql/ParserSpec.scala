package graft.tsql

import org.scalatest.funsuite.AnyFunSuite

import Statement._
import TimeExpr._

/** Parser spec mirroring the reference's statement tests
  * (reference tests/statement_test.c:422-450, 16 cases) plus the
  * FIXTURES.md §2 statement corpus.
  */
class ParserSpec extends AnyFunSuite {

  private def ok(q: String): Statement =
    Parser.parse(q).fold(e => fail(s"parse failed for '$q': $e"), identity)

  test("CREATEDB (tests/statement_test.c:36)") {
    assert(ok("CREATEDB test-db") == CreateDb("test-db"))
  }

  test("USE") {
    assert(ok("USE metrics") == UseDb("metrics"))
  }

  test("CREATE bare") {
    assert(ok("CREATE ts-test") == CreateTs("ts-test", None, None))
  }

  test("CREATE with retention and duplication policy (statement_test.c:44-56)") {
    assert(ok("CREATE ts-test 3d 'ignore'") ==
      CreateTs("ts-test", Some(Span(3L * 86400L * 1000000000L)), Some("ignore")))
  }

  test("INSERT single row (statement_test.c:58)") {
    assert(ok("INSERT INTO test-ts VALUES (87829132377, 12.2344)") ==
      Insert("test-ts", Seq(Num(87829132377L) -> 12.2344)))
  }

  test("INSERT VALUE with server-assigned now() (statement_test.c:75)") {
    assert(ok("INSERT INTO test-ts VALUE 12.2344") ==
      Insert("test-ts", Seq(Now -> 12.2344)))
  }

  test("INSERT 20-row multi values (statement_test.c:92-146)") {
    val rows = (0 until 20).map(i => (1000000000L + i * 1000L, i + 0.5))
    val q = "INSERT INTO test-ts VALUES " +
      rows.map { case (t, v) => s"($t, $v)" }.mkString(", ")
    assert(ok(q) == Insert("test-ts", rows.map { case (t, v) => Num(t) -> v }))
  }

  test("INSERT with now() timestamp (statement_test.c:148-162)") {
    assert(ok("INSERT INTO test-ts VALUES (now(), 12.2344)") ==
      Insert("test-ts", Seq(Now -> 12.2344)))
  }

  test("DELETE database (statement_test.c:164)") {
    assert(ok("DELETE test-db") == Delete("test-db", None))
  }

  test("DELETE series FROM db (statement_test.c:178-191)") {
    assert(ok("DELETE ts-test FROM test-db") == Delete("ts-test", Some("test-db")))
  }

  test("SELECT with BETWEEN + WHERE + SAMPLE BY (statement_test.c:193-226)") {
    assert(ok("SELECT records FROM ts-test BETWEEN 2382913 AND 39238293 " +
        "WHERE test-value > 12.2 AND test-value < 16.2 SAMPLE BY 4d") ==
      Select("ts-test", None, Some((Num(2382913L), Num(39238293L))),
        Seq(Seq(WherePred("test-value", CmpOp.Gt, 12.2, "12.2"),
            WherePred("test-value", CmpOp.Lt, 16.2, "16.2"))),
        Some(Span(4L * 86400L * 1000000000L)), None))
  }

  test("SELECT min aggregate (statement_test.c:228-255)") {
    assert(ok("SELECT min(records) FROM ts-test BETWEEN 2382913 AND 39238293") ==
      Select("ts-test", Some(SelectFn.Min),
        Some((Num(2382913L), Num(39238293L))), Nil, None, None))
  }

  test("SELECT with now() in range (statement_test.c:257-284)") {
    assert(ok("SELECT min(records) FROM ts-test BETWEEN now() AND 39238293") ==
      Select("ts-test", Some(SelectFn.Min),
        Some((Now, Num(39238293L))), Nil, None, None))
  }

  test("SELECT with date literals (statement_test.c:286-313)") {
    assert(ok("SELECT latest(records) FROM ts-test BETWEEN '2025-03-01' AND '2025-05-01'") ==
      Select("ts-test", Some(SelectFn.Latest),
        Some((DateLit("2025-03-01"), DateLit("2025-05-01"))), Nil, None, None))
  }

  test("SELECT with LIMIT (statement_test.c:315-343)") {
    assert(ok("SELECT latest(records) FROM ts-test BETWEEN '2025-03-01' AND '2025-05-01' LIMIT 20") ==
      Select("ts-test", Some(SelectFn.Latest),
        Some((DateLit("2025-03-01"), DateLit("2025-05-01"))), Nil, None, Some(20)))
  }

  test("WHERE with floats and scientific notation (statement_test.c:345-376)") {
    assert(ok("SELECT avg(records) FROM ts-test WHERE value > 3.14159 AND timestamp < 2.5e-3") ==
      Select("ts-test", Some(SelectFn.Avg), None,
        Seq(Seq(WherePred("value", CmpOp.Gt, 3.14159, "3.14159"),
            WherePred("timestamp", CmpOp.Lt, 2.5e-3, "2.5e-3"))), None, None))
  }

  test("time arithmetic now() - 2d (statement_test.c:378-420)") {
    assert(ok("SELECT latest(records) FROM ts-test BETWEEN now() - 2d AND '2025-05-01' LIMIT 20") ==
      Select("ts-test", Some(SelectFn.Latest),
        Some((BinOp('-', Now, Span(2L * 86400L * 1000000000L)), DateLit("2025-05-01"))),
        Nil, None, Some(20)))
  }

  test("earliest(col, n) — declared-only surface (src/statement_parse.h:103)") {
    assert(ok("SELECT earliest(value, 5) FROM ts-test") ==
      Select("ts-test", Some(SelectFn.Earliest(5)), None, Nil, None, None))
  }

  test("meta commands (statement_parse.c:681-702)") {
    assert(ok(".databases") == Meta("databases"))
    assert(ok(".timeseries") == Meta("timeseries"))
  }

  test("all six WHERE comparators (statement_parse.h:150-158)") {
    val q = "SELECT value FROM t WHERE value = 1 AND value != 2 AND " +
      "value < 3 AND value <= 4 AND value > 5 AND value >= 6"
    assert(ok(q).asInstanceOf[Select].where ==
      Seq(Seq(CmpOp.Eq, CmpOp.Ne, CmpOp.Lt, CmpOp.Le, CmpOp.Gt, CmpOp.Ge)
        .zipWithIndex.map { case (op, i) =>
          WherePred("value", op, i + 1.0, s"${i + 1}")
        }))
  }

  test("WHERE OR: AND binds tighter, OR splits groups (extension; enum at statement_parse.h:161)") {
    val q = "SELECT value FROM t WHERE value > 1 AND value < 5 OR timestamp = 7"
    assert(ok(q).asInstanceOf[Select].where ==
      Seq(Seq(WherePred("value", CmpOp.Gt, 1.0, "1"),
              WherePred("value", CmpOp.Lt, 5.0, "5")),
          Seq(WherePred("timestamp", CmpOp.Eq, 7.0, "7"))))
    // OR chains of single predicates
    assert(ok("SELECT value FROM t WHERE value = 1 OR value = 2 OR value = 3")
      .asInstanceOf[Select].where ==
      Seq(Seq(WherePred("value", CmpOp.Eq, 1.0, "1")),
          Seq(WherePred("value", CmpOp.Eq, 2.0, "2")),
          Seq(WherePred("value", CmpOp.Eq, 3.0, "3"))))
    // trailing OR with nothing after it is a parse error
    assert(Parser.parse("SELECT value FROM t WHERE value = 1 OR").isLeft)
  }

  test("nested time arithmetic is left-associative") {
    assert(ok("SELECT value FROM t BETWEEN now() - 2d + 3h AND 5") ==
      Select("t", None,
        Some((BinOp('+', BinOp('-', Now, Span(172800000000000L)), Span(10800000000000L)),
          Num(5L))), Nil, None, None))
  }

  test("errors: malformed statements are rejected") {
    assert(Parser.parse("SELECT FROM t").isLeft)
    assert(Parser.parse("INSERT INTO t").isLeft)
    assert(Parser.parse("CREATE").isLeft)
    assert(Parser.parse("SELECT value FROM t BETWEEN 1").isLeft)
    assert(Parser.parse("bogus query").isLeft)
    assert(Parser.parse("SELECT value FROM t LIMIT 2.5").isLeft)
    // known selector with a spurious argument: the diagnostic must
    // name the arity problem, not claim the function is unknown
    Parser.parse("SELECT delta(value, 2) FROM t") match {
      case Left(err) => assert(err.contains("'delta' takes no argument"), err)
      case Right(s) => fail(s"should not parse: $s")
    }
    Parser.parse("SELECT min(value, 1) FROM t") match {
      case Left(err) => assert(err.contains("'min' takes no argument"), err)
      case Right(s) => fail(s"should not parse: $s")
    }
  }

  test("span units scale to nanos (src/timeutil.c:50-73)") {
    def span(q: String): Long =
      ok(s"SELECT value FROM t BETWEEN $q AND 1")
        .asInstanceOf[Select].between.get._1.asInstanceOf[Span].ns
    assert(span("7ns") == 7L)
    assert(span("5us") == 5000L)
    assert(span("10ms") == 10000000L)
    assert(span("30s") == 30000000000L)
    assert(span("15m") == 900000000000L)
    assert(span("2h") == 7200000000000L)
    assert(span("3d") == 259200000000000L)
  }

  test("FILL(prev|linear|null) parses after SAMPLE BY (dialect extension)") {
    assert(ok("SELECT avg(value) FROM t SAMPLE BY 1h FILL(prev)") ==
      Select("t", Some(SelectFn.Avg), None, Nil,
        Some(Span(3600L * 1000000000L)), None, Some("prev")))
    assert(ok("SELECT avg(value) FROM t SAMPLE BY 1h FILL(LINEAR) LIMIT 5") ==
      Select("t", Some(SelectFn.Avg), None, Nil,
        Some(Span(3600L * 1000000000L)), Some(5), Some("linear")))
    Parser.parse("SELECT avg(value) FROM t FILL(prev)") match {
      case Left(err) => assert(err.contains("FILL requires SAMPLE BY"), err)
      case Right(s) => fail(s"should not parse: $s")
    }
    Parser.parse("SELECT avg(value) FROM t SAMPLE BY 1h FILL(bogus)") match {
      case Left(err) => assert(err.contains("unknown FILL policy"), err)
      case Right(s) => fail(s"should not parse: $s")
    }
  }
}
