package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A real (learned-merge-table) byte-pair-encoding tokenizer.
  *
  * The merge table is LEARNED driver-side from a fixed, hardcoded
  * word-frequency fixture (the [[planes]]-style constant-model
  * pattern: plan-time state inlined identically into the Spark plan
  * and the SQL oracle — never read from data at query time). Learning
  * is the classic Sennrich procedure: count adjacent symbol pairs
  * weighted by word frequency, merge the most frequent pair (ties →
  * lexicographically smallest, for determinism), repeat.
  *
  * Tokenization applies the merges IN LEARNED RANK ORDER, each merge
  * replacing every left-to-right non-overlapping occurrence — which is
  * exactly what a chain of SQL `replace(spaced, 'a b', 'ab')` calls
  * does over a char-spaced string, making the oracle closed-form (no
  * recursion). This rank-ordered sweep is equivalent to the canonical
  * iterative lowest-rank-first algorithm: a merge at rank r can only
  * CREATE pairs involving its output symbol, and any merge consuming
  * that symbol was necessarily learned later (rank > r), so when the
  * sweep reaches rank r no pair of rank < r can exist. BpeSpec locks
  * this equivalence against an independent iterative implementation.
  */
object BpeModel {

  /** Hardcoded training fixture: the synthetic corpus' vocabulary with
    * round frequency weights. A constant — NOT derived from the tables
    * (the oracle must be able to inline the same learned merges). */
  val TRAIN: Seq[(String, Int)] = Seq(
    "scan" -> 980, "column" -> 978, "window" -> 976, "order" -> 975,
    "sort" -> 974, "part" -> 963, "agg" -> 953, "value" -> 950,
    "line" -> 946, "key" -> 945, "join" -> 936, "merge" -> 935,
    "query" -> 934, "group" -> 934, "vector" -> 931, "hash" -> 923,
    "slow" -> 921, "stream" -> 919, "filter" -> 917, "fast" -> 913,
    "the" -> 910, "spark" -> 910, "batch" -> 910, "table" -> 903,
    "data" -> 900, "row" -> 890, "big" -> 880, "small" -> 875,
    "dup" -> 860, "customer" -> 850)

  val N_MERGES = 48

  /** Greedy BPE learning over (word, frequency) pairs. Deterministic:
    * ties on pair count break to the lexicographically smallest pair. */
  def learn(corpus: Seq[(String, Int)], nMerges: Int): Seq[(String, String)] = {
    var words: Seq[(List[String], Int)] =
      corpus.map { case (w, c) => (w.toList.map(_.toString), c) }
    val out = Seq.newBuilder[(String, String)]
    var done = false
    var n = 0
    while (n < nMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- words; Seq(a, b) <- syms.sliding(2) if syms.length > 1)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((a, b), _) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((a, b))
        words = words.map { case (syms, c) => (mergeAll(syms, a, b), c) }
        n += 1
      }
    }
    out.result()
  }

  /** One left-to-right non-overlapping sweep merging (a, b) → a+b —
    * the list form of `replace(spaced, "a b", "ab")`. */
  def mergeAll(syms: List[String], a: String, b: String): List[String] = {
    val out = List.newBuilder[String]
    var rest = syms
    while (rest.nonEmpty) rest match {
      case x :: y :: tail if x == a && y == b => out += (a + b); rest = tail
      case x :: tail => out += x; rest = tail
      case Nil => ()
    }
    out.result()
  }

  /** [[learn]] with the selected pair's frequency-weighted count
    * recorded per merge — the CORPUS-TRAINED variant the text_bpe_train
    * gate uses (the hardcoded [[TRAIN]] model stays the tokenizer's
    * fixture; this trains on real word frequencies). Same greedy rule:
    * max weighted adjacent-pair count (overlapping pairs each count,
    * the sliding(2) convention), ties to the lexicographically
    * smallest (a, b); merges applied with the left-to-right
    * non-overlapping [[mergeAll]] sweep. Returns (left, right, count)
    * in rank order; stops early when no pairs remain. */
  def learnWithCounts(corpus: Seq[(String, Long)],
      nMerges: Int): Seq[(String, String, Long)] = {
    var words: Seq[(List[String], Long)] =
      corpus.map { case (w, c) => (w.toList.map(_.toString), c) }
    val out = Seq.newBuilder[(String, String, Long)]
    var done = false
    var n = 0
    while (n < nMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- words; Seq(a, b) <- syms.sliding(2) if syms.length > 1)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((a, b, c))
        words = words.map { case (syms, w) => (mergeAll(syms, a, b), w) }
        n += 1
      }
    }
    out.result()
  }

  /** The learned merge table, in rank order. */
  lazy val merges: Seq[(String, String)] = learn(TRAIN, N_MERGES)

  /** Tokenize one normalized word via the rank-ordered sweep. */
  def tokenizeWord(word: String): List[String] = {
    var syms = word.toList.map(_.toString)
    for ((a, b) <- merges) syms = mergeAll(syms, a, b)
    syms
  }

  /** Canonical iterative BPE (always merge the LOWEST-rank pair
    * present) — the independent reference implementation BpeSpec uses
    * to prove the sweep is the real algorithm. */
  def tokenizeWordIterative(word: String): List[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.toList.map(_.toString)
    var go = true
    while (go && syms.length > 1) {
      val present = syms.zip(syms.tail).filter(rank.contains)
      if (present.isEmpty) go = false
      else {
        val (a, b) = present.minBy(rank)
        syms = mergeAll(syms, a, b)
      }
    }
    syms
  }

  // per-word token-count cache: the corpus vocabulary is tiny and words
  // repeat constantly; bounded so adversarial input can't grow it
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val CacheCap = 65536

  private def countWord(w: String): Int = {
    val hit = cache.get(w)
    if (hit != null) hit.intValue()
    else {
      val c = tokenizeWord(w).length
      if (cache.size < CacheCap) cache.put(w, c)
      c
    }
  }

  /** Total BPE token count of a document: normalize exactly like the
    * shingle/fingerprint path (lower → non-alnum to space → collapse),
    * then sum per-word symbol counts. Matches the oracle's char-space +
    * replace-chain + count form symbol for symbol. */
  def countTokens(text: UTF8String): Long = {
    val norm = text.toString.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
    if (norm.isEmpty) 0L
    else {
      var total = 0L
      var from = 0
      while (from < norm.length) {
        val sp = norm.indexOf(' ', from)
        val end = if (sp < 0) norm.length else sp
        total += countWord(norm.substring(from, end))
        from = end + 1
      }
      total
    }
  }
}

/** Native Catalyst expression: learned-merge-table BPE token count of
  * a document (`bpe_count(text)` → BIGINT). Same codegen rationale as
  * [[Shingles3]] — one static call inside whole-stage codegen. */
case class BpeCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_count requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    BpeModel.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeModel.countTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}
