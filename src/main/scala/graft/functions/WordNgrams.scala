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

  /** Maximal non-whitespace runs, in order — the raw `\S+` token walk
    * shared by [[eval]] and [[WordBlocksCodec.eval]]. */
  private[functions] def wsTokens(s: String): java.util.ArrayList[String] = {
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
    toks
  }

  def eval(text: UTF8String, n: Int): ArrayData = {
    val toks = wsTokens(text.toString)
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

/** ALL sliding word n-grams (with repeats, in document order) over
  * raw `\S+` tokens — [[WordNgramsCodec]] without the distinct: n-gram
  * MULTIPLICITY is the signal for language-model counting
  * (Terms.bigramSurprisal), where the interpreted
  * `transform(sequence(...))` composition paid per-gram lambda
  * dispatch (~3x at sf1, the dot_dec lesson). Oracle form:
  * `list_transform(range(1, len(ts) - n + 2), i -> ts[i] || ' ' ||
  * ... || ts[i+n-1])`. */
object WordNgramsAllCodec {

  def eval(text: UTF8String, n: Int): ArrayData = {
    val toks = WordNgramsCodec.wsTokens(text.toString)
    val m = toks.size()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
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
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: `word_ngrams_all(text, n)` — the
  * non-distinct sibling of [[WordNgrams]], same codegen rationale. */
case class WordNgramsAll(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1 && n <= 64, s"word_ngrams_all n must be in [1, 64], got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams_all"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams_all requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    WordNgramsAllCodec.eval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNgramsAllCodec.eval($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramsAll =
    copy(child = newChild)
}

/** Non-overlapping n-token blocks over raw `\S+` tokens, in document
  * order, ragged tail dropped — the unit of the duplicated-block
  * fraction signal (the dup-line fraction of Gopher's repetition
  * rules, over token blocks since the corpus fixture has no line
  * structure). Oracle form: `array_to_string(toks[bi*n+1 : bi*n+n],
  * ' ')` for bi in `range(0, len(toks) // n)`. Unlike
  * [[WordNgramsCodec]] the output is NOT distinct: block positions and
  * within-doc repeats are part of the signal. */
object WordBlocksCodec {

  def eval(text: UTF8String, n: Int): ArrayData = {
    val toks = WordNgramsCodec.wsTokens(text.toString)
    val m = toks.size() / n
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder()
    var b = 0
    while (b < m) {
      sb.setLength(0)
      var q = 0
      while (q < n) {
        if (q > 0) sb.append(' ')
        sb.append(toks.get(b * n + q))
        q += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: `word_blocks(text, n)` with literal n —
  * one text walk inside whole-stage codegen, same rationale as
  * [[WordNgrams]]. */
case class WordBlocks(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1 && n <= 256, s"word_blocks n must be in [1, 256], got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_blocks"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_blocks requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    WordBlocksCodec.eval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordBlocksCodec.eval($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordBlocks =
    copy(child = newChild)
}
