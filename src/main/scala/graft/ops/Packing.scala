package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-then-chunk step that turns a cleaned
  * corpus into fixed-length training sequences: documents are laid out
  * in doc_id order as one token stream, the stream is cut into
  * `seqLen`-token sequences, and each document maps to the span of
  * sequences it lands in (straddling a boundary is allowed, exactly
  * like GPT-style pretraining packing).
  *
  * The whole computation is one exclusive prefix-sum over token
  * counts. The naive formulation is a global `Window.orderBy(doc_id)`
  * — a SINGLE-PARTITION sort that serializes the entire corpus
  * through one task at 100 TB. This implements the scalable shape, a
  * TWO-LEVEL scan:
  *
  *  1. within-shard exclusive prefix (window partitioned by
  *     `shard = doc_id div shardSize` — parallel across shards);
  *  2. per-shard totals, prefix-scanned in a single-partition window
  *     over the SHARD relation (corpus/shardSize rows — thousands,
  *     not billions) and broadcast back;
  *  3. offset = shard prefix + within-shard prefix, one projection.
  *
  * PackingSpec locks the decomposition against the naive global
  * window bit-for-bit and asserts the only unpartitioned window in
  * the plan runs over the shard relation. Zero-token documents get
  * n_seqs = 0 at their stream position.
  */
object Packing {

  def sequenceSpans(docs: DataFrame, seqLen: Long,
      shardSize: Long = 1 << 20): DataFrame = {
    require(seqLen >= 1 && shardSize >= 1)
    val toks = docs.select(col("doc_id"),
      size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("tok"))
      .withColumn("shard", expr(s"doc_id div $shardSize"))
    val inShard = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = toks.withColumn("local_off",
      coalesce(sum("tok").over(inShard), lit(0L)))
    // shard relation: one row per shard — small enough that its
    // single-partition prefix window is a non-issue by construction
    val shardTotals = toks.groupBy("shard").agg(sum("tok").as("shard_tok"))
    val shardPrefix = shardTotals.withColumn("shard_off",
      coalesce(sum("shard_tok").over(
        Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("shard"), col("shard_off"))
    withLocal.join(broadcast(shardPrefix), "shard")
      .withColumn("tok_offset", col("shard_off") + col("local_off"))
      .select(col("doc_id"), col("tok").as("n_tokens"), col("tok_offset"),
        expr(s"tok_offset div $seqLen").as("start_seq"),
        expr(s"CASE WHEN tok > 0 THEN (tok_offset + tok - 1) div $seqLen " +
          s"ELSE tok_offset div $seqLen END").as("end_seq"),
        expr(s"CASE WHEN tok > 0 THEN (tok_offset + tok - 1) div $seqLen " +
          s"- tok_offset div $seqLen + 1 ELSE 0 END").as("n_seqs"))
  }

  /** Length-bucketed batching assignment: every document gets a bucket
    * id in [1, nBuckets] by token-count quantile — the pre-batching
    * step that keeps padding waste bounded (batching a 10-token doc
    * with a 10k-token doc pads the whole batch to 10k).
    *
    * Two-stage shape, deliberately: the bucket BOUNDARIES are model
    * state (nBuckets−1 interpolated quantiles of the token count —
    * [[Percentiles]]' exact bounded-memory rank selection over ONE
    * group), and the ASSIGNMENT is a stateless comparison map against
    * the broadcast one-row boundary relation — scan speed, no shuffle,
    * no global sort of the corpus. At 100 TB the exact boundary pass
    * (a single-group sort) is the part to swap for the GK sketch tier
    * ([[Approx.approxPercentiles]]) — the assignment stage is
    * unchanged; the gate runs the exact tier so the oracle
    * (quantile_cont) hash-matches.
    *
    * Integer token counts compare against 4dp-rounded boundary doubles
    * identically in both engines (the interpolation is bit-identical —
    * Percentiles object doc). Output: (doc_id, n_tokens, bucket). */
  def lengthBuckets(docs: DataFrame, nBuckets: Int = 4): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 100,
      s"nBuckets must be in [2, 100], got $nBuckets")
    // the token-count relation feeds the boundary computation (twice,
    // inside Percentiles.exact) AND the assignment join — persist so
    // the corpus tokenize scan runs once (caller releases via
    // clearCache, the shared-relation convention)
    val toks = docs.select(col("doc_id"),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("n_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pcts = (1 until nBuckets).map(i => (s"b$i", i.toDouble / nBuckets))
    val bounds = Percentiles.exact(
        toks.withColumn("g", lit(1)), "g", "n_tokens", pcts)
      .drop("g", "n")
    // one-row model relation: the broadcast NLJ here is a constant
    // attach, the sim_topk_brute pattern
    toks.join(broadcast(bounds))
      .withColumn("bucket",
        (1 until nBuckets).map(i =>
          (col("n_tokens") > col(s"b$i")).cast("long")).reduce(_ + _) + 1)
      .select("doc_id", "n_tokens", "bucket")
  }
}
