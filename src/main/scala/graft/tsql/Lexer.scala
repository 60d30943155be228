package graft.tsql

/** Tokenizer for the dialect (two-phase like the reference:
  * src/statement_parse.c:69-470 tokenizes before parsing).
  *
  * Notable reference behaviors kept: identifiers may contain `-`
  * (is_identifier_char, src/statement_parse.c:275-279) — so `3d` minus
  * expressions need whitespace, exactly as in the reference grammar;
  * numbers accept scientific notation (src/statement_parse.c:204-229);
  * span literals are NUMBER+unit single tokens (`3d`, `10ms`,
  * src/statement_parse.c:330-346); keywords are case-insensitive.
  */
object Lexer {

  sealed trait Tok
  final case class Kw(s: String) extends Tok          // uppercased keyword
  final case class Ident(s: String) extends Tok
  final case class NumTok(text: String) extends Tok   // int or float literal
  final case class SpanTok(ns: Long) extends Tok      // 3d / 15m / 10ms ...
  final case class StrLit(s: String) extends Tok      // '...'
  final case class Sym(s: String) extends Tok         // ( ) , < <= > >= = != + - *
  final case class MetaTok(s: String) extends Tok     // .databases / .timeseries

  private val keywords = Set(
    "CREATEDB", "CREATE", "USE", "INSERT", "INTO", "VALUES", "VALUE",
    "SELECT", "FROM", "BETWEEN", "AND", "OR", "WHERE", "SAMPLE", "BY", "FILL",
    "LIMIT", "DELETE", "NOW")

  /** Span unit suffixes → nanos multiplier (reference src/timeutil.c:50-73:
    * despite "seconds" names everything scales to nanoseconds). */
  private val unitNs: Map[String, Long] = Map(
    "ns" -> 1L, "us" -> 1000L, "ms" -> 1000000L,
    "s" -> 1000000000L, "m" -> 60L * 1000000000L,
    "h" -> 3600L * 1000000000L, "d" -> 86400L * 1000000000L)

  private def isIdentChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_' || c == '-' || c == '.'

  def tokenize(input: String): Either[String, Vector[Tok]] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = input.length
    def peek(k: Int): Char = if (i + k < n) input.charAt(i + k) else '\u0000'
    while (i < n) {
      val c = input.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val end = input.indexOf('\'', i + 1)
        if (end < 0) return Left(s"unterminated string literal at $i")
        out += StrLit(input.substring(i + 1, end)); i = end + 1
      } else if (c == '.' && peek(1).isLetter) {
        var j = i + 1
        while (j < n && input.charAt(j).isLetter) j += 1
        out += MetaTok(input.substring(i + 1, j)); i = j
      } else if (c.isDigit ||
          (c == '-' && peek(1).isDigit && !lastIsValue(out.result()))) {
        // number: [-]digits[.digits][e[+-]digits], or span digits+unit
        var j = if (c == '-') i + 1 else i
        while (j < n && input.charAt(j).isDigit) j += 1
        // span literal? digits immediately followed by a unit suffix
        val unitStart = j
        var k = j
        while (k < n && input.charAt(k).isLetter) k += 1
        val unit = input.substring(unitStart, k).toLowerCase
        if (unit.nonEmpty && unitNs.contains(unit) && c != '-') {
          // overflow-checked: both the literal parse and the unit
          // scaling can exceed 64 bits and must surface as lex errors,
          // not exceptions (the tokenize contract is Either)
          try {
            val magnitude = input.substring(i, unitStart).toLong
            out += SpanTok(Math.multiplyExact(magnitude, unitNs(unit))); i = k
          } catch {
            case _: NumberFormatException | _: ArithmeticException =>
              return Left(s"time span out of 64-bit nanosecond range at $i")
          }
        } else if (unit.nonEmpty && c != '-' && !isFloatCont(input, j)) {
          return Left(s"unknown time unit '$unit' at $unitStart")
        } else {
          if (j < n && input.charAt(j) == '.') {
            j += 1
            while (j < n && input.charAt(j).isDigit) j += 1
          }
          if (j < n && (input.charAt(j) == 'e' || input.charAt(j) == 'E')) {
            var m = j + 1
            if (m < n && (input.charAt(m) == '+' || input.charAt(m) == '-')) m += 1
            if (m < n && input.charAt(m).isDigit) {
              while (m < n && input.charAt(m).isDigit) m += 1
              j = m
            }
          }
          out += NumTok(input.substring(i, j)); i = j
        }
      } else if (c.isLetter || c == '_') {
        var j = i
        while (j < n && isIdentChar(input.charAt(j))) j += 1
        val word = input.substring(i, j)
        val up = word.toUpperCase
        if (keywords.contains(up)) out += Kw(up) else out += Ident(word)
        i = j
      } else {
        val two = if (i + 1 < n) input.substring(i, i + 2) else ""
        if (two == "<=" || two == ">=" || two == "!=") { out += Sym(two); i += 2 }
        else if ("()<>=+-*,".indexOf(c) >= 0) { out += Sym(c.toString); i += 1 }
        else return Left(s"unexpected character '$c' at $i")
      }
    }
    Right(out.result())
  }

  private def isFloatCont(s: String, j: Int): Boolean =
    j < s.length && (s.charAt(j) == '.' || s.charAt(j) == 'e' || s.charAt(j) == 'E')

  /** A `-` right after a value token is the binary minus operator, not a
    * negative-number sign (time arithmetic, src/statement_parse.c:821-877). */
  private def lastIsValue(ts: Vector[Tok]): Boolean = ts.lastOption match {
    case Some(_: NumTok) | Some(_: SpanTok) | Some(_: Ident) | Some(Sym(")")) => true
    case _ => false
  }
}
