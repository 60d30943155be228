package graft.tsql

import Lexer._

/** Recursive-descent parser: token stream → Statement ADT
  * (reference src/statement_parse.c:472-1197, dispatch on first token at
  * :1156-1197).
  */
object Parser {

  def parse(input: String): Either[String, Statement] =
    Lexer.tokenize(input).flatMap(toks => new Parser(toks).parseStatement())

  private final class Parser(toks: Vector[Tok]) {
    private var pos = 0

    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Option[Tok] = { val t = peek; if (t.isDefined) pos += 1; t }
    private def expectKw(kw: String): Either[String, Unit] = next() match {
      case Some(Kw(`kw`)) => Right(())
      case other => Left(s"expected $kw, got $other")
    }
    private def expectSym(s: String): Either[String, Unit] = next() match {
      case Some(Sym(`s`)) => Right(())
      case other => Left(s"expected '$s', got $other")
    }
    /** Keywords double as identifiers in identifier position (the common
      * case is the column name `value`, which lexes as Kw(VALUE)). */
    private def ident(): Either[String, String] = next() match {
      case Some(Ident(s)) => Right(s)
      case Some(Kw(s)) => Right(s.toLowerCase)
      case other => Left(s"expected identifier, got $other")
    }
    private def atEnd: Boolean = pos >= toks.length

    def parseStatement(): Either[String, Statement] = {
      val stmt = next() match {
        case Some(Kw("CREATEDB")) => ident().map(Statement.CreateDb)
        case Some(Kw("USE")) => ident().map(Statement.UseDb)
        case Some(Kw("CREATE")) => parseCreateTs()
        case Some(Kw("INSERT")) => parseInsert()
        case Some(Kw("SELECT")) => parseSelect()
        case Some(Kw("DELETE")) => parseDelete()
        case Some(MetaTok(cmd)) if cmd == "databases" || cmd == "timeseries" =>
          Right(Statement.Meta(cmd))
        case other => Left(s"unexpected start of statement: $other")
      }
      stmt.flatMap { s =>
        if (atEnd) Right(s) else Left(s"trailing tokens after statement: ${toks.drop(pos)}")
      }
    }

    /** `CREATE name [retention-timeunit] ['policy']`
      * (reference src/statement_parse.c:879-922). */
    private def parseCreateTs(): Either[String, Statement] =
      ident().flatMap { name =>
        val retention = peek match {
          case Some(_: SpanTok) | Some(_: NumTok) =>
            parseTimeUnit().map(Some(_))
          case _ => Right(None)
        }
        retention.flatMap { ret =>
          val policy = peek match {
            case Some(StrLit(p)) => next(); Some(p)
            case _ => None
          }
          Right(Statement.CreateTs(name, ret, policy))
        }
      }

    /** `INSERT INTO ts VALUES (t, v), ...` | `INSERT INTO ts VALUE v`
      * (reference src/statement_parse.c:966-1021). */
    private def parseInsert(): Either[String, Statement] =
      for {
        _ <- expectKw("INTO")
        name <- ident()
        stmt <- next() match {
          case Some(Kw("VALUES")) => parseValueList().map(Statement.Insert(name, _))
          case Some(Kw("VALUE")) =>
            // single value, server-assigned now() timestamp
            // (reference src/statement_parse.c:983-996)
            number().map(v => Statement.Insert(name, Seq(TimeExpr.Now -> v)))
          case other => Left(s"expected VALUES or VALUE, got $other")
        }
      } yield stmt

    private def parseValueList(): Either[String, Seq[(TimeExpr, Double)]] = {
      val rows = Seq.newBuilder[(TimeExpr, Double)]
      var done = false
      var err: Option[String] = None
      while (!done && err.isEmpty) {
        val row = for {
          _ <- expectSym("(")
          t <- parseTimeUnit()
          _ <- expectSym(",")
          v <- number()
          _ <- expectSym(")")
        } yield (t, v)
        row match {
          case Left(e) => err = Some(e)
          case Right(r) =>
            rows += r
            peek match {
              case Some(Sym(",")) => next()
              case _ => done = true
            }
        }
      }
      err.toLeft(rows.result())
    }

    /** `SELECT col|fn(col[,n]) FROM ts [BETWEEN a AND b] [WHERE ...]
      * [SAMPLE BY tu] [LIMIT n]` (reference src/statement_parse.c:1023-1154).
      * The column name itself is consumed and discarded, as in the
      * reference (:1034-1043) — results always carry (timestamp, value).
      */
    private def parseSelect(): Either[String, Statement] =
      for {
        fn <- parseSelectColumn()
        _ <- expectKw("FROM")
        name <- ident()
        between <- peek match {
          case Some(Kw("BETWEEN")) =>
            next()
            for {
              a <- parseTimeUnit()
              _ <- expectKw("AND")
              b <- parseTimeUnit()
            } yield Some((a, b))
          case _ => Right(None)
        }
        where <- peek match {
          case Some(Kw("WHERE")) => next(); parseWhereChain()
          case _ => Right(Nil)
        }
        sample <- peek match {
          case Some(Kw("SAMPLE")) =>
            next()
            expectKw("BY").flatMap(_ => parseTimeUnit().map(Some(_)))
          case _ => Right(None)
        }
        // dialect extension: FILL(prev|linear|null) — gap policy for
        // the SAMPLE BY bucket axis (SeriesOps.sampleByFill)
        fill <- peek match {
          case Some(Kw("FILL")) =>
            if (sample.isEmpty) Left("FILL requires SAMPLE BY")
            else {
              next()
              expectSym("(").flatMap { _ =>
                (next() match {
                  case Some(Ident(p)) => Right(p.toLowerCase)
                  case Some(Kw(p)) => Right(p.toLowerCase)
                  case other => Left(s"expected FILL policy, got $other")
                }).flatMap { p =>
                  if (!Set("prev", "linear", "null").contains(p))
                    Left(s"unknown FILL policy '$p' (prev | linear | null)")
                  else expectSym(")").map(_ => Some(p))
                }
              }
            }
          case _ => Right(None)
        }
        limit <- peek match {
          case Some(Kw("LIMIT")) =>
            next()
            number().flatMap { v =>
              if (v == v.toInt.toDouble && v >= 0) Right(Some(v.toInt))
              else Left(s"LIMIT must be a non-negative integer, got $v")
            }
          case _ => Right(None)
        }
      } yield Statement.Select(name, fn, between, where, sample, limit, fill)

    private def parseSelectColumn(): Either[String, Option[SelectFn]] = next() match {
      case Some(Kw(_)) => Right(None) // bare keyword-as-column (`value`) — cosmetic
      case Some(Ident(fname)) =>
        peek match {
          case Some(Sym("(")) =>
            next()
            for {
              _ <- ident() // column name, discarded (reference :1034-1043)
              n <- peek match {
                case Some(Sym(",")) => next(); number().map(v => Some(v.toInt))
                case _ => Right(None)
              }
              _ <- expectSym(")")
              fn <- (fname.toLowerCase, n) match {
                case ("min", None) => Right(Some(SelectFn.Min))
                case ("max", None) => Right(Some(SelectFn.Max))
                case ("avg", None) => Right(Some(SelectFn.Avg))
                case ("latest", None) => Right(Some(SelectFn.Latest))
                case ("earliest", Some(k)) => Right(Some(SelectFn.Earliest(k)))
                case ("earliest", None) => Right(Some(SelectFn.Earliest(1)))
                case ("delta", None) => Right(Some(SelectFn.Delta))
                case ("rate", None) => Right(Some(SelectFn.Rate))
                // known selector, wrong arity: name the real problem —
                // the catch-all would misreport these as unknown
                case (known @ ("min" | "max" | "avg" | "latest" | "delta" | "rate"), Some(_)) =>
                  Left(s"'$known' takes no argument")
                case (other, _) => Left(s"unknown aggregate function '$other'")
              }
            } yield fn
          case _ => Right(None) // bare column name (value/records) — cosmetic
        }
      case other => Left(s"expected column or function, got $other")
    }

    /** WHERE clause in disjunctive normal form: AND-chains of
      * `key op number` separated by OR, with AND binding tighter
      * (reference parse_where src/statement_parse.c:649-679 parses only
      * the AND chain — the quirk `node->left = node` flattens it to a
      * conjunction, SURVEY §2.1 #15; OR is in the reference enum
      * statement_parse.h:161 but tokenless, added here as an
      * extension). */
    private def parseWhereChain(): Either[String, Seq[Seq[WherePred]]] = {
      val groups = Seq.newBuilder[Seq[WherePred]]
      var preds = Seq.newBuilder[WherePred]
      var done = false
      var err: Option[String] = None
      while (!done && err.isEmpty) {
        val p = for {
          key <- ident()
          op <- next() match {
            case Some(Sym("=")) => Right(CmpOp.Eq)
            case Some(Sym("!=")) => Right(CmpOp.Ne)
            case Some(Sym("<")) => Right(CmpOp.Lt)
            case Some(Sym("<=")) => Right(CmpOp.Le)
            case Some(Sym(">")) => Right(CmpOp.Gt)
            case Some(Sym(">=")) => Right(CmpOp.Ge)
            case other => Left(s"expected comparison operator, got $other")
          }
          v <- numberWithRaw()
        } yield WherePred(key, op, v._1, v._2)
        p match {
          case Left(e) => err = Some(e)
          case Right(pred) =>
            preds += pred
            peek match {
              case Some(Kw("AND")) => next()
              case Some(Kw("OR")) =>
                next()
                groups += preds.result()
                preds = Seq.newBuilder[WherePred]
              case _ => done = true
            }
        }
      }
      err.toLeft { groups += preds.result(); groups.result() }
    }

    /** `DELETE db` | `DELETE ts FROM db`
      * (reference src/statement_parse.c:924-964). */
    private def parseDelete(): Either[String, Statement] =
      ident().flatMap { name =>
        peek match {
          case Some(Kw("FROM")) => next(); ident().map(db => Statement.Delete(name, Some(db)))
          case _ => Right(Statement.Delete(name, None))
        }
      }

    /** Time-unit expression: primary (`now()` | span | date | int)
      * with left-associative `+ - *`
      * (reference src/statement_parse.c:754-877). */
    def parseTimeUnit(): Either[String, TimeExpr] =
      parseTimePrimary().flatMap(parseTimeBinOp)

    private def parseTimeBinOp(lhs: TimeExpr): Either[String, TimeExpr] =
      peek match {
        case Some(Sym(op)) if op == "+" || op == "-" || op == "*" =>
          next()
          parseTimePrimary().flatMap { rhs =>
            parseTimeBinOp(TimeExpr.BinOp(op.charAt(0), lhs, rhs))
          }
        case _ => Right(lhs)
      }

    private def parseTimePrimary(): Either[String, TimeExpr] = next() match {
      case Some(Kw("NOW")) =>
        for { _ <- expectSym("("); _ <- expectSym(")") } yield TimeExpr.Now
      case Some(SpanTok(ns)) => Right(TimeExpr.Span(ns))
      case Some(NumTok(text)) =>
        if (text.forall(c => c.isDigit || c == '-'))
          try Right(TimeExpr.Num(text.toLong))
          catch { case _: NumberFormatException =>
            Left(s"timestamp literal out of 64-bit range: '$text'")
          }
        else Left(s"expected integer timestamp, got '$text'")
      case Some(StrLit(s)) => Right(TimeExpr.DateLit(s))
      case other => Left(s"expected time-unit expression, got $other")
    }

    private def number(): Either[String, Double] = numberWithRaw().map(_._1)

    private def numberWithRaw(): Either[String, (Double, String)] = next() match {
      case Some(NumTok(text)) => Right((text.toDouble, text))
      case Some(SpanTok(_)) => Left("expected number, got time span")
      case other => Left(s"expected number, got $other")
    }
  }
}
