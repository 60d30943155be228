package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass language-marker counting — the langid analog of
  * [[TextStatsCodec]]: one scan replaces four marker-regex passes plus
  * a CJK regexp_replace. Count-for-count semantics of
  * `len(regexp_extract_all(lower(text), '\b(w1|w2|...)\b'))` per
  * language (a match is a maximal Java-\b word run — boundary class is
  * `'_' || Character.isLetterOrDigit`, see TextStats — whose lowercase
  * form is in the marker set) and
  * `length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', ''))` for the
  * CJK count. */
object LangScanCodec {

  private def mkSet(ws: String*): java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    ws.foreach(s.add)
    s
  }
  // marker sets mirror queries.TextSurface.langId and its oracle
  private val EN = mkSet("the", "and", "of", "is")
  private val DE = mkSet("der", "die", "das", "und", "ist")
  private val FR = mkSet("le", "la", "les", "et", "est")
  private val ES = mkSet("el", "los", "las", "es", "y")
  private val MAXLEN = 3

  import BoundScan.isBoundWordCp

  def eval(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    var en = 0L; var de = 0L; var fr = 0L; var es = 0L; var zh = 0L
    var wordStart = -1
    def endRun(endExcl: Int): Unit = if (wordStart >= 0) {
      if (endExcl - wordStart <= MAXLEN) {
        val w = s.substring(wordStart, endExcl).toLowerCase(java.util.Locale.ROOT)
        if (EN.contains(w)) en += 1
        if (DE.contains(w)) de += 1
        if (FR.contains(w)) fr += 1
        if (ES.contains(w)) es += 1
      }
      wordStart = -1
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c >= '\u4e00' && c <= '\u9fff') zh += 1
      // per-code-point boundary decisions (see BoundScan); a low
      // surrogate inherits its pair's decision
      if (!Character.isLowSurrogate(c) || i == 0 ||
          !Character.isHighSurrogate(s.charAt(i - 1))) {
        if (isBoundWordCp(s.codePointAt(i))) { if (wordStart < 0) wordStart = i }
        else endRun(i)
      }
      i += 1
    }
    endRun(n)
    new GenericInternalRow(Array[Any](en, de, fr, es, zh))
  }
}

/** `lang_scan(text)` → struct(en_hits, de_hits, fr_hits, es_hits,
  * zh_chars), all BIGINT — one scan inside whole-stage codegen. */
case class LangScan(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("en_hits", LongType, nullable = false),
    StructField("de_hits", LongType, nullable = false),
    StructField("fr_hits", LongType, nullable = false),
    StructField("es_hits", LongType, nullable = false),
    StructField("zh_chars", LongType, nullable = false)))

  override def prettyName: String = "lang_scan"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_scan requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    LangScanCodec.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangScanCodec.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): LangScan =
    copy(child = newChild)
}
