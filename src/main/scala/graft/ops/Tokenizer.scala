package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer TRAINING over the corpus — the stage of an LLM data
  * pipeline that precedes token counting: learn a byte-pair-encoding
  * merge table from the documents themselves (Sennrich et al. 2016),
  * rather than applying a fixed one (that is [[graft.functions.BpeModel]]'s
  * hardcoded fixture, which text_bpe keeps using).
  *
  * Split of labor at 100 TB: the DATA-scale work is exactly one
  * distributed tokenize + word-frequency aggregation (a codegen'd
  * split/explode/groupBy — the text_stats class); everything after
  * operates on the VOCABULARY-scale (word, freq) table, which is
  * model state in the k-means/LTTB sense — bounded by `vocabCap`
  * (deterministic cut: freq desc, word asc), collected to the driver,
  * and folded by the greedy merge loop
  * ([[graft.functions.BpeModel.learnWithCounts]]: max
  * frequency-weighted adjacent-pair count, overlapping pairs each
  * count, ties to the lexicographically smallest pair, merges applied
  * as the left-to-right non-overlapping sweep). A 100 TB corpus and a
  * 100 GB one produce the same post-aggregation work.
  *
  * The oracle REPLAYS the whole loop in SQL (TextSurface's
  * text_bpe_train oracle): nMerges unrolled CTE stages — the
  * KMEANS_ITERS unrolling precedent — over a ' sym|'-encoded
  * segmentation string, where DuckDB's left-to-right non-overlapping
  * `replace` is exactly [[graft.functions.BpeModel.mergeAll]] (the
  * '|' terminator guards symbol boundaries, so 'b' can never match
  * inside 'bc'; the leading space guards the left edge). Every output
  * cell is exact-integer or a symbol string, so the gate hash-matches
  * with no float hazards.
  *
  * Output: (rank, left_sym, right_sym, pair_freq) in merge order,
  * stopping early if the vocabulary exhausts its pairs.
  */
object Tokenizer {

  def bpeTrain(docs: DataFrame, nMerges: Int = 16,
      vocabCap: Int = 100000): DataFrame = {
    require(nMerges >= 1 && vocabCap >= 1,
      s"nMerges/vocabCap must be positive: $nMerges, $vocabCap")
    val spark = docs.sparkSession
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      // The pinned training contract (r14 + ADVICE r15), applied at
      // VOCABULARY scale — the predicate is on the group key, so
      // filtering distinct words after the count is identical to
      // filtering every token before it, minus the per-token regex.
      // Excluded from training on BOTH sides (the practical analog:
      // BPE trainers routinely drop control bytes):
      //  - '|' — the oracle's segmentation guard byte; a symbol
      //    containing it blurs the encoding's boundaries;
      //  - control characters (C0 + DEL) — the oracle segments via
      //    RE2's '.', which silently skips '\n', so a newline-bearing
      //    word would train DIFFERENT pair counts on the two sides;
      //  - non-BMP code points and lone surrogates — Scala segments
      //    into UTF-16 code units while the oracle segments into code
      //    points, and the merge tie-break compares UTF-16 order vs
      //    UTF-8 byte order; both diverge only above U+FFFF. (The
      //    surrogate clause is Scala-only by construction: lone
      //    surrogates cannot exist in the oracle's valid UTF-8.)
      .filter(!col("word").contains("|") &&
        !col("word").rlike(
          "[\\x00-\\x1F\\x7F\\uD800-\\uDFFF]|[\\x{10000}-\\x{10FFFF}]"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(vocabCap)
      .collect() // bounded by vocabCap — model state at the driver
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    val merges = graft.functions.BpeModel.learnWithCounts(vocab, nMerges)
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b, c), i) => ((i + 1).toLong, a, b, c) }
      .toDF("rank", "left_sym", "right_sym", "pair_freq")
  }
}
