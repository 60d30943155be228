package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the subsampling tier of a
  * training-data pipeline. Everything here is HASH-gated, never
  * `rand()`-based: membership must be reproducible across runs,
  * retries, and executors (a lost task that re-rolls its random sample
  * ships different training data than the attempt it replaced), and
  * stable under corpus growth (whether a doc is sampled depends only on
  * its id, so yesterday's sample is a subset of today's at the same
  * rate). The hash is the shared 60-bit md5 prefix ([[TextFns.h60]]),
  * reproducible in any engine — the DuckDB oracles run the identical
  * predicate.
  *
  * Scale shape: a sampling predicate is a stateless row-local filter —
  * no shuffle, no state, applied at the scan. At 100 TB it is the
  * cheapest operator in the pipeline.
  */
object Sampling {

  /** The membership hash: uniform in [0, 100) per id, namespaced so
    * different sampling decisions on the same corpus are independent. */
  private def pct(idCol: Column, namespace: String): Column =
    pmod(TextFns.h60(concat(lit(s"$namespace:"), idCol.cast("string"))), lit(100L))

  /** The uniform membership predicate itself — reusable where a caller
    * needs BOTH sides of the split (e.g. Decontam's train/eval wiring
    * filters once with it and once with its negation, which partitions
    * exactly: the hash is deterministic per id). */
  def uniformHashPredicate(idCol: Column, percent: Int,
      namespace: String = "sample"): Column = {
    require(percent >= 0 && percent <= 100, s"percent in [0,100], got $percent")
    pct(idCol, namespace) < percent
  }

  /** Uniform deterministic percent-sample (the sample_corpus gate's
    * form, factored for reuse). */
  def uniformHash(df: DataFrame, idCol: String, percent: Int,
      namespace: String = "sample"): DataFrame =
    df.filter(uniformHashPredicate(col(idCol), percent, namespace))

  /** STRATIFIED deterministic sampling: each stratum (language, source,
    * quality band …) gets its own rate — the language-rebalancing
    * primitive of multilingual corpus construction (downsample the
    * dominant language instead of starving the rest). Rates are
    * percentages; strata not in the map use `defaultPct`. The rate map
    * is model configuration, not data — it inlines as a literal
    * when-chain, so the filter stays a stateless scan predicate (no
    * join against a rates table, nothing to shuffle or broadcast).
    */
  def stratifiedHash(df: DataFrame, stratumCol: String, idCol: String,
      pctByStratum: Map[String, Int], defaultPct: Int = 100,
      namespace: String = "sample"): DataFrame = {
    require((defaultPct +: pctByStratum.values.toSeq).forall(p => p >= 0 && p <= 100),
      s"all rates in [0,100]: $pctByStratum default $defaultPct")
    // sorted fold → deterministic when-chain order (strata are distinct
    // values, so order cannot change results — but stable plans make
    // stable canonicalized comparisons)
    val rate = pctByStratum.toSeq.sortBy(_._1).foldLeft(lit(defaultPct): Column) {
      case (acc, (stratum, p)) =>
        when(col(stratumCol) === stratum, lit(p)).otherwise(acc)
    }
    df.filter(pct(col(idCol), namespace) < rate)
  }

  /** WEIGHT-proportional Bernoulli sampling: row kept iff
    * h(id) mod 10000 < weight_bp, so P(keep) = weight_bp / 10000 per
    * row with any per-row weight expression (quality score, length
    * band, recency …) — the quality-weighted retention primitive.
    * Integer-exact where the classic weighted-reservoir key
    * u^(1/w) is not: pow/ln are libm transcendentals whose low bits
    * differ across engines, so an A-ES-style key cannot hash-gate;
    * the threshold form keeps all of [[uniformHash]]'s guarantees
    * (reproducible, retry-stable, growth-stable) and its monotone
    * law — lowering a row's weight can only remove it, never admit
    * it (spec-locked). Still a stateless scan predicate: the weight
    * is a per-row column expression, nothing joins or shuffles.
    *
    * Weights clamp to [0, 10000]: 0 never keeps, 10000 always keeps.
    */
  def weightedHash(df: DataFrame, idCol: String, weightBp: Column,
      namespace: String = "wsample"): DataFrame = {
    val w = greatest(lit(0L), least(lit(10000L), weightBp.cast("long")))
    df.filter(
      pmod(TextFns.h60(concat(lit(s"$namespace:"), col(idCol).cast("string"))),
        lit(10000L)) < w)
  }

  /** EXACT-k deterministic sampling per stratum — the fixed-size
    * eval/dev-split primitive (a Bernoulli rate gives a binomial
    * size; an eval set wants EXACTLY k rows per stratum, stable
    * across reruns). Rank = (h60(namespace:id), id) ascending — the
    * id tiebreak makes selection total-ordered and deterministic even
    * under (improbable) hash collisions; membership changes only for
    * ranks crossing k when the corpus grows (the bounded churn of
    * hash-ordered top-k, vs rate sampling's stable membership but
    * unstable size).
    *
    * Shape at scale: ONE window partitioned by the stratum — keyed,
    * never global (strata are languages/sources: bounded cardinality,
    * well-spread); a GLOBAL exact-k would need the pack_sequences
    * two-level rank selection instead and is deliberately not offered
    * here. Output: the selected rows + their rank (1..k).
    */
  def topKHash(df: DataFrame, idCol: String, stratumCol: String, k: Int,
      namespace: String = "evalk"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val h = TextFns.h60(concat(lit(s"$namespace:"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy(h.asc, col(idCol).asc)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Train/val/test SPLIT assignment: one namespaced hash, cumulative
    * percentage bands — every id lands in exactly ONE split (the bands
    * partition [0,100)), membership is stable under corpus growth, and
    * the train band at rate p is bit-identical to [[uniformHash]] at p
    * in the same namespace (so a split upgrade of an existing sample
    * never reshuffles rows between splits). Adds a `split` column;
    * still a stateless row-local projection — nothing shuffles.
    *
    * `splits` are (name, percent) in band order, totalling 100.
    */
  def assignSplits(df: DataFrame, idCol: String,
      splits: Seq[(String, Int)], namespace: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      s"split percents must total 100: $splits")
    val p = pct(col(idCol), namespace)
    val edges = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    val assign = splits.zip(edges).init
      .foldRight(lit(splits.last._1): Column) {
        case (((name, _), edge), els) => when(p < edge, lit(name)).otherwise(els)
      }
    df.withColumn("split", assign)
  }
}
