package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term-frequency map in ONE text walk: `token_counts(s)`
  * over a space-separated token stream (the normText convention —
  * single spaces, no leading/trailing; runs of spaces tolerated) →
  * `map<string,bigint>` of token → occurrence count, first-occurrence
  * key order.
  *
  * Purpose: fuse `explode(split(...)) → groupBy(doc_id, term).count()`
  * into the scan. The explode+aggregate form materializes one row per
  * token OCCURRENCE and shuffles it into a (doc_id, term) hash
  * aggregate; this map pre-aggregates inside the row — one output row
  * per DISTINCT term per document and NO (doc_id, term) exchange at
  * all, which is the difference the LM-surprisal plan pays for twice
  * (model + scoring branches). Semantics identical to the aggregate
  * form: empty tokens never emitted, counts are exact multiplicities.
  */
object TokenCountsCodec {

  def eval(text: UTF8String): MapData = {
    val s = text.toString
    val len = s.length
    val counts = new java.util.LinkedHashMap[String, Long]()
    var i = 0
    while (i < len) {
      while (i < len && s.charAt(i) == ' ') i += 1
      if (i < len) {
        val start = i
        while (i < len && s.charAt(i) != ' ') i += 1
        val t = s.substring(start, i)
        counts.put(t, counts.getOrDefault(t, 0L) + 1L)
      }
    }
    val n = counts.size
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = UTF8String.fromString(e.getKey)
      vals(k) = e.getValue
      k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}

/** The normalized-token walk shared by the `norm_*` counting
  * expressions: tokens are maximal runs of `[a-z0-9]` after FULL
  * lowercasing — equivalent to the TextFns.normText regex chain
  * (`lower` → strip `[^a-z0-9 ]` → collapse spaces → trim → split)
  * WITHOUT materializing any intermediate string, because every
  * stripped character acts as a separator exactly like the space it
  * would have been replaced with. ASCII maps branch-free; non-ASCII
  * goes through String.toLowerCase of the char — the FULL case
  * mapping `lower()` applies (UTF8String.toLowerCaseSlow delegates to
  * String.toLowerCase), NOT Character.toLowerCase's simple mapping:
  * for the 1:M expansions (U+0130 → 'i' + combining U+0307) every
  * mapped char must enter the stream so the stripped combining mark
  * separates tokens exactly like the regex chain does. Surrogate
  * pairs lower as a unit. Context-sensitive mappings (final sigma)
  * produce only non-[a-z0-9] chars either way — separators under
  * both forms. TokenCountsSpec pins the U+0130/U+01F0 class against
  * the regex chain. */
object NormTokenWalk {

  def tokens(s: String): java.util.ArrayList[String] = {
    val len = s.length
    val toks = new java.util.ArrayList[String]()
    val sb = new java.lang.StringBuilder()
    def push(lc: Char): Unit =
      if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) sb.append(lc)
      else if (sb.length > 0) { toks.add(sb.toString); sb.setLength(0) }
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if (c < 128) {
        push(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        i += 1
      } else {
        val w = if (Character.isHighSurrogate(c) && i + 1 < len &&
          Character.isLowSurrogate(s.charAt(i + 1))) 2 else 1
        // default-locale toLowerCase, deliberately: it is the exact
        // call lower() bottoms out in — matching it beats pinning ROOT
        val lowered = s.substring(i, i + w).toLowerCase
        var q = 0
        while (q < lowered.length) { push(lowered.charAt(q)); q += 1 }
        i += w
      }
    }
    if (sb.length > 0) toks.add(sb.toString)
    toks
  }

  private[functions] def countsOf(
      toks: java.util.ArrayList[String], n: Int): MapData = {
    val m = toks.size()
    val counts = new java.util.LinkedHashMap[String, Long]()
    if (m >= n) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j <= m - n) {
        val g = if (n == 1) toks.get(j) else {
          sb.setLength(0)
          var q = 0
          while (q < n) {
            if (q > 0) sb.append(' ')
            sb.append(toks.get(j + q))
            q += 1
          }
          sb.toString
        }
        counts.put(g, counts.getOrDefault(g, 0L) + 1L)
        j += 1
      }
    }
    val sz = counts.size
    val keys = new Array[Any](sz)
    val vals = new Array[Any](sz)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = UTF8String.fromString(e.getKey)
      vals(k) = e.getValue
      k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  def evalCounts(text: UTF8String, n: Int): MapData =
    countsOf(tokens(text.toString), n)
}

/** Native Catalyst expression: `norm_ngram_counts(text, n)` — the
  * full LM-counting fusion: normalization, tokenization, n-gram
  * assembly and per-document counting in ONE text walk (n = 1 is the
  * unigram term-frequency map). The unfused form pays two regex
  * passes (strip + collapse) materializing two intermediate strings
  * per document before any token appears — measured ~2 s of a 4 s
  * sf1 query on the normalization alone. */
case class NormNgramCounts(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1 && n <= 64, s"norm_ngram_counts n must be in [1, 64], got $n")

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "norm_ngram_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"norm_ngram_counts requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    NormTokenWalk.evalCounts(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormTokenWalk.evalCounts($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NormNgramCounts =
    copy(child = newChild)
}

/** Sliding word n-gram multiplicities in ONE walk: `ngram_counts(s, n)`
  * → `map<string,bigint>` of space-joined n-gram → occurrence count
  * over the raw `\S+` token stream ([[WordNgramsCodec.wsTokens]] — the
  * same walk as `word_ngrams_all`, with the per-document counting
  * fused in). Same purpose as [[TokenCountsCodec]]: one output row per
  * DISTINCT n-gram per document, no (doc_id, gram) exchange. */
object NgramCountsCodec {

  def eval(text: UTF8String, n: Int): MapData = {
    val toks = WordNgramsCodec.wsTokens(text.toString)
    val m = toks.size()
    val counts = new java.util.LinkedHashMap[String, Long]()
    if (m >= n) {
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
        val g = sb.toString
        counts.put(g, counts.getOrDefault(g, 0L) + 1L)
        j += 1
      }
    }
    val sz = counts.size
    val keys = new Array[Any](sz)
    val vals = new Array[Any](sz)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = UTF8String.fromString(e.getKey)
      vals(k) = e.getValue
      k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}

/** Native Catalyst expression: `ngram_counts(text, n)` with literal n —
  * the counting sibling of `word_ngrams_all`. */
case class NgramCounts(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1 && n <= 64, s"ngram_counts n must be in [1, 64], got $n")

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "ngram_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_counts requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    NgramCountsCodec.eval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramCountsCodec.eval($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramCounts =
    copy(child = newChild)
}

/** Native Catalyst expression: `token_counts(text)` — one codegen'd
  * static call per row (the [[WordNgrams]] rationale: no per-token
  * lambda dispatch, no explode fan-out before aggregation). */
case class TokenCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "token_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_counts requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    TokenCountsCodec.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCountsCodec.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)
}
