package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-at-a-time single-pass document statistics shared by interpreted
  * eval and generated code.
  *
  * Semantics are locked count-for-count to the regex composition the
  * query (and the DuckDB oracle) defines:
  *
  *  - n_chars  = length(text)                     — code points;
  *  - n_tokens = len(regexp_extract_all(text, '\S+'))
  *               — maximal runs of non-whitespace, where whitespace is
  *               the Java/RE2 ASCII class [ \t\n\v\f\r];
  *  - alpha    = length(regexp_replace(text, '[^A-Za-z]', ''));
  *  - digits   = length(regexp_replace(text, '[^0-9]', ''));
  *  - stop_hits = len(regexp_extract_all(lower(text),
  *               '\b(the|a|an|and|or|of|to|in|is|it)\b'))
  *               — since the alternation is whole words fenced by \b
  *               (Java/RE2 \w = [A-Za-z0-9_]), a match is exactly a
  *               maximal word-char run whose lowercase form equals one
  *               of the ten words.
  *
  * One scan instead of five regex passes (each of which re-walked the
  * full document): measured ~2x on the text_stats headline query.
  */
/** Java regex \b boundary class, shared by the scan codecs — NOT \w:
  * the JDK's Bound node tests `ch == '_' || isLetterOrDigit(ch)`
  * (Unicode, CODE-POINT aware), so CJK/accented/astral letters extend
  * word runs even though \w itself is ASCII (e.g. '文the中' is ONE
  * run, no stopword match). Known accepted divergence: characters
  * whose lower() expands (U+0130 'İ' → i + combining dot) change run
  * segmentation in the regex-over-lower(text) path but not here. */
private[functions] object BoundScan {
  def isBoundWordCp(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)
}

/** The Java regex ASCII whitespace class [ \t\n\v\f\r] — ONE
  * definition for every scan codec's `\S+` tokenizer (TextStats,
  * QualityScan, WordNgrams). The spec-locked contract, including the
  *  Java-vs-RE2 divergence note in QualityScanCodec, lives
  * here; a codec with its own copy could silently desynchronize. */
private[functions] object JavaWs {
  def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
}

object TextStatsCodec {

  import BoundScan.isBoundWordCp
  import JavaWs.isSpace

  /** The ten stopwords of the quality heuristic, lowercase. */
  private val STOPS: java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it").foreach(s.add)
    s
  }

  def eval(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    var nChars = 0L; var nTokens = 0L; var alpha = 0L; var digits = 0L
    var stopHits = 0L
    var inToken = false
    var wordStart = -1 // start of the current maximal word-char run
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      // code-point counting: skip low surrogate of a valid pair
      if (!Character.isLowSurrogate(c)) nChars += 1
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) alpha += 1
      if (c >= '0' && c <= '9') digits += 1
      if (isSpace(c)) inToken = false
      else if (!inToken) { inToken = true; nTokens += 1 }
      // word-run transitions are decided per CODE POINT (Java \b is
      // code-point aware); a low surrogate inherits its pair's decision
      if (!Character.isLowSurrogate(c) || i == 0 ||
          !Character.isHighSurrogate(s.charAt(i - 1))) {
        if (isBoundWordCp(s.codePointAt(i))) { if (wordStart < 0) wordStart = i }
        else if (wordStart >= 0) {
          if (i - wordStart <= 3 &&
            STOPS.contains(s.substring(wordStart, i).toLowerCase(java.util.Locale.ROOT)))
            stopHits += 1
          wordStart = -1
        }
      }
      i += 1
    }
    if (wordStart >= 0 && n - wordStart <= 3 &&
      STOPS.contains(s.substring(wordStart, n).toLowerCase(java.util.Locale.ROOT)))
      stopHits += 1
    new GenericInternalRow(Array[Any](nChars, nTokens, alpha, digits, stopHits))
  }
}

/** Native Catalyst expression: all five text_stats counts in one scan.
  * Returns struct(n_chars_raw, n_tokens, alpha, digits, stop_hits),
  * all BIGINT. Same builtin-beating rationale as [[Shingles3]]/
  * [[DotDec]]: `doGenCode` is one static call, the projection stays
  * inside whole-stage codegen. */
case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars_raw", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("alpha", LongType, nullable = false),
    StructField("digits", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false)))

  override def prettyName: String = "text_stats_scan"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stats_scan requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    TextStatsCodec.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsCodec.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}
