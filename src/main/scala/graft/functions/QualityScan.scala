package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass document-shape statistics for Gopher/C4-class corpus
  * quality filtering (Rae et al. 2021 §A1.1 "repetitious text" and
  * "document shape" rules, re-expressed as exact integer counts so the
  * derived filter gates bit-identically against a SQL oracle):
  *
  *  - n_words = len(regexp_extract_all(text, '\S+')) — maximal runs of
  *    non-whitespace, whitespace being the Java ASCII class
  *    [ \t\n\v\f\r] (same tokenizer as [[TextStatsCodec]]);
  *  - sum_len = total CODE POINTS across tokens — equals
  *    length(regexp_replace(text, '\s', '', 'g')), the oracle form;
  *  - d2 / d3 = count of DISTINCT word 2-grams / 3-grams (token
  *    sequences compared exactly; the oracle's space-joined gram
  *    strings are unambiguous because tokens cannot contain spaces);
  *  - top_n = occurrence count of the most frequent token (0 when the
  *    document has no tokens).
  *
  * The quality query derives the published rules from these counts in
  * pure integer arithmetic: mean word length (`sum_len*10⁴ div
  * n_words`), duplicate-n-gram fractions (`(nGrams−dGrams)*10⁴ div
  * nGrams` — the repetition signal that catches boilerplate and
  * crawler loops), top-word mass (`top_n*10⁴ div n_words`). One scan
  * plus per-row hash sets, instead of explode → groupBy → count
  * aggregations per metric (which would shuffle the corpus three
  * times): the whole filter becomes Scan → Project, the same shape
  * that made text_stats 0.56x of DuckDB.
  *
  * Distinctness bookkeeping interns each token to a dense id and packs
  * gram ids into a long (21 bits each), so the per-row cost is two
  * primitive hash sets, no gram-string allocation. The id space bounds
  * documents to 2^21 distinct tokens (~2M — an order of magnitude past
  * any real single document; English corpora plateau near 10^6 total
  * vocabulary). A document past the bound throws loudly rather than
  * silently miscounting, matching the repo's fail-loud contract for
  * model-shape limits.
  */
object QualityScanCodec {

  // Known accepted divergence (same class as TextStatsCodec's U+0130
  // note): vertical tab U+000B is whitespace to Java regex/this codec
  // but a TOKEN character to DuckDB's RE2 (\s = [\t\n\f\r ]). A \v in
  // a document would shift token counts in every Java-tokenized gate
  // (text_stats included, long before this codec) against the oracle.
  // The fixtures are \v-free; the ENGINE side is internally consistent
  // (codec ≡ Spark \S+, spec-locked), which is the contract that
  // matters for composition.
  import JavaWs.isSpace

  /** Max distinct tokens per document (21-bit id packing, 3 ids/long). */
  val MaxDistinctTokens: Int = 1 << 21

  def eval(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    // pass 1: tokenize to interned ids, counting code points per token
    val ids = new java.util.HashMap[String, Integer]()
    var counts = new Array[Int](64)
    val tokens = new java.util.ArrayList[Integer]()
    var sumLen = 0L
    var i = 0
    while (i < n) {
      while (i < n && isSpace(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        var cp = 0L
        while (i < n && !isSpace(s.charAt(i))) {
          if (!Character.isLowSurrogate(s.charAt(i))) cp += 1
          i += 1
        }
        sumLen += cp
        val tok = s.substring(start, i)
        var id = ids.get(tok)
        if (id == null) {
          id = Integer.valueOf(ids.size())
          if (id >= MaxDistinctTokens) throw new IllegalArgumentException(
            s"quality_scan: document exceeds $MaxDistinctTokens distinct tokens")
          ids.put(tok, id)
          if (id >= counts.length) counts = java.util.Arrays.copyOf(counts, counts.length * 2)
        }
        counts(id) += 1
        tokens.add(id)
      }
    }
    val nWords = tokens.size()
    var topN = 0L
    var t = 0
    while (t < ids.size()) { if (counts(t) > topN) topN = counts(t); t += 1 }
    // pass 2: distinct grams over packed id tuples (21 bits per id)
    val g2 = new java.util.HashSet[java.lang.Long]()
    val g3 = new java.util.HashSet[java.lang.Long]()
    var j = 0
    while (j < nWords - 1) {
      val a = tokens.get(j).longValue(); val b = tokens.get(j + 1).longValue()
      g2.add((a << 21) | b)
      if (j < nWords - 2)
        g3.add((a << 42) | (b << 21) | tokens.get(j + 2).longValue())
      j += 1
    }
    new GenericInternalRow(Array[Any](
      nWords.toLong, sumLen, g2.size().toLong, g3.size().toLong, topN))
  }
}

/** Native Catalyst expression: all five quality-scan counts in one
  * pass. Returns struct(n_words, sum_len, d2, d3, top_n), all BIGINT.
  * `doGenCode` is one static call so the projection stays inside
  * whole-stage codegen — same pattern as [[TextStats]]/[[LangScan]]. */
case class QualityScan(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("d2", LongType, nullable = false),
    StructField("d3", LongType, nullable = false),
    StructField("top_n", LongType, nullable = false)))

  override def prettyName: String = "quality_scan"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quality_scan requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    QualityScanCodec.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QualityScanCodec.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): QualityScan =
    copy(child = newChild)
}
