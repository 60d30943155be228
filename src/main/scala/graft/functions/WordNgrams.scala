package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-at-a-time distinct word n-grams over RAW `\S+` tokens (no
  * normalization — decontamination compares verbatim text, unlike the
  * shingle pipeline's normalized trigrams). Semantics locked to the
  * oracle form `list_distinct([t[i] || ' ' || ... FOR i IN ...])` over
  * `regexp_extract_all(text, '\S+')`: maximal non-whitespace runs
  * (Java ASCII whitespace class, same walk as [[QualityScanCodec]]),
  * space-joined, distinct in first-occurrence order. */
object WordNgramsCodec {

  import JavaWs.isSpace

  def eval(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val len = s.length
    val toks = new java.util.ArrayList[String]()
    var i = 0
    while (i < len) {
      while (i < len && isSpace(s.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isSpace(s.charAt(i))) i += 1
        toks.add(s.substring(start, i))
      }
    }
    val m = toks.size()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j <= m - n) {
      sb.setLength(0)
      var q = 0
      while (q < n) {
        if (q > 0) sb.append(' ')
        sb.append(toks.get(j + q))
        q += 1
      }
      seen.add(sb.toString)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: `word_ngrams(text, n)` with literal n.
  * Same builtin-beating rationale as [[Shingles3]] — the equivalent
  * `transform(sequence(...))` composition inlines the tokenizing
  * subtree into the lambda and re-tokenizes the document once PER
  * GRAM (docs/PLANS.md, the dot_dec finding); this walks the text
  * once and stays inside whole-stage codegen via one static call. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1 && n <= 64, s"word_ngrams n must be in [1, 64], got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    WordNgramsCodec.eval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNgramsCodec.eval($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}
