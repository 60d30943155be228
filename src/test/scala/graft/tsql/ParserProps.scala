package graft.tsql

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import Statement._
import TimeExpr._

/** Property-based parser spec: RENDER a random statement AST to dialect
  * text, parse it back, require the exact AST — the strongest grammar
  * lock short of exhaustive enumeration (reference parser tests pin 16
  * hand-picked cases; this pins the whole generated space). */
object ParserProps extends Properties("Parser") {

  private val genIdent: Gen[String] = for {
    head <- Gen.alphaChar
    tail <- Gen.listOfN(7, Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.const('-'), 1 -> Gen.const('_')))
  } yield (head :: tail).mkString

  private val genTs: Gen[Long] = Gen.chooseNum(0L, 4102444800000000000L)
  private val genValue: Gen[Double] = Gen.chooseNum(-1e6, 1e6)
    .map(v => math.rint(v * 10000) / 10000) // short decimal renderings

  private val spanUnits = Seq(
    ("ns", 1L), ("us", 1000L), ("ms", 1000000L), ("s", 1000000000L),
    ("m", 60L * 1000000000L), ("h", 3600L * 1000000000L),
    ("d", 86400L * 1000000000L))

  /** (render, expected AST) pairs for time-unit expressions. */
  private val genTimeUnit: Gen[(String, TimeExpr)] = Gen.oneOf(
    genTs.map(t => (t.toString, Num(t))),
    Gen.zip(Gen.chooseNum(1L, 999L), Gen.oneOf(spanUnits)).map {
      case (n, (suffix, ns)) => (s"$n$suffix", Span(n * ns))
    },
    Gen.const(("now()", Now)),
    Gen.zip(genTs, Gen.chooseNum(1L, 999L)).map { case (t, d) =>
      (s"$t - ${d}s", BinOp('-', Num(t), Span(d * 1000000000L)))
    })

  private val genCmp: Gen[(String, CmpOp.Value)] = Gen.oneOf(
    ("=", CmpOp.Eq), ("!=", CmpOp.Ne), ("<", CmpOp.Lt),
    ("<=", CmpOp.Le), (">", CmpOp.Gt), (">=", CmpOp.Ge))

  private val genPred: Gen[(String, WherePred)] = for {
    key <- Gen.oneOf("value", "timestamp")
    (opTxt, op) <- genCmp
    v <- genValue
  } yield (s"$key $opTxt $v", WherePred(key, op, v.toString.toDouble, v.toString))

  private val genWhere: Gen[(String, Seq[Seq[WherePred]])] = for {
    nGroups <- Gen.chooseNum(1, 3)
    groups <- Gen.listOfN(nGroups, Gen.chooseNum(1, 3).flatMap(Gen.listOfN(_, genPred)))
  } yield (
    groups.map(_.map(_._1).mkString(" AND ")).mkString(" OR "),
    groups.map(_.map(_._2)))

  property("CREATEDB / USE / DELETE round-trip") = forAll(genIdent) { name =>
    Parser.parse(s"CREATEDB $name") == Right(CreateDb(name)) &&
    Parser.parse(s"USE $name") == Right(UseDb(name)) &&
    Parser.parse(s"DELETE $name") == Right(Delete(name, None))
  }

  property("INSERT VALUES round-trips every row") =
    forAll(genIdent, Gen.nonEmptyListOf(Gen.zip(genTs, genValue))) { (name, rows) =>
      val txt = s"INSERT INTO $name VALUES " +
        rows.map { case (t, v) => s"($t, $v)" }.mkString(", ")
      Parser.parse(txt) == Right(Insert(name,
        rows.map { case (t, v) => (Num(t): TimeExpr) -> v.toString.toDouble }))
    }

  property("SELECT with BETWEEN/WHERE/SAMPLE BY/LIMIT round-trips") =
    forAll(genIdent, genTimeUnit, genTimeUnit, genWhere,
        Gen.option(Gen.chooseNum(1L, 999L)), Gen.option(Gen.chooseNum(0, 10000))) {
      (name, a, b, w, sample, limit) =>
        val sampleTxt = sample.map(s => s" SAMPLE BY ${s}s").getOrElse("")
        val limitTxt = limit.map(n => s" LIMIT $n").getOrElse("")
        val txt = s"SELECT value FROM $name BETWEEN ${a._1} AND ${b._1}" +
          s" WHERE ${w._1}$sampleTxt$limitTxt"
        Parser.parse(txt) == Right(Select(name, None, Some((a._2, b._2)), w._2,
          sample.map(s => Span(s * 1000000000L)), limit))
    }

  property("aggregate selectors parse to the right SelectFn") =
    forAll(genIdent, Gen.oneOf(
        ("min", SelectFn.Min: SelectFn), ("max", SelectFn.Max),
        ("avg", SelectFn.Avg), ("latest", SelectFn.Latest),
        ("delta", SelectFn.Delta), ("rate", SelectFn.Rate))) { (name, fnPair) =>
      Parser.parse(s"SELECT ${fnPair._1}(value) FROM $name") ==
        Right(Select(name, Some(fnPair._2), None, Nil, None, None))
    }

  property("garbage never throws — parse totality") =
    forAll(Gen.asciiPrintableStr) { s =>
      Prop(try { Parser.parse(s); true } catch { case _: Throwable => false })
    }
}
