package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates — the sketch tier a 100 TB pipeline reaches
  * for when exact answers are not worth their shuffle/sort cost. The
  * reference engine has none of these (SURVEY §2.6); they complete the
  * percentile/distinct story next to their exact counterparts
  * (AnalyticsSurface.percentilesExact, Skew.twoPhaseCountDistinct):
  *
  *  - [[approxDistinct]]: HyperLogLog++ — O(1) memory per group, one
  *    map-side-combinable aggregation, relative error ~rsd. The exact
  *    two-phase form shuffles every distinct (key, value) pair; at
  *    corpus scale the sketch is 100-1000x less shuffle for a 2%-class
  *    answer.
  *  - [[approxPercentiles]]: Greenwald-Khanna-style quantile sketch
  *    (`percentile_approx`) — bounded buffer (`accuracy` controls the
  *    bound) and mergeable, vs the exact path's full per-group sort.
  *    Rank error <= 1/accuracy of the group size.
  *
  * No DuckDB oracle: sketch internals differ by engine, so these gate
  * rows-only (the driver's weaker check); ApproxSpec locks the error
  * bounds against the exact operators on real data instead.
  */
object Approx {

  /** Per-key approximate count-distinct via HLL++ (`rsd` = target
    * relative standard deviation, Spark default 0.05). */
  def approxDistinct(df: DataFrame, key: String, value: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(key)
      .agg(approx_count_distinct(col(value), rsd).as("n_approx"))

  /** Per-key approximate percentiles with a bounded-memory sketch.
    * Output matches percentilesExact's shape (key, p50, p90, p99, n)
    * so the two tiers are drop-in for each other. */
  def approxPercentiles(df: DataFrame, key: String, value: String,
      accuracy: Int = 10000): DataFrame =
    df.groupBy(key)
      .agg(
        percentile_approx(col(value), array(lit(0.5), lit(0.9), lit(0.99)),
          lit(accuracy)).as("q"),
        count(lit(1)).as("n"))
      .select(col(key),
        round(element_at(col("q"), 1), 4).as("p50"),
        round(element_at(col("q"), 2), 4).as("p90"),
        round(element_at(col("q"), 3), 4).as("p99"),
        col("n"))

  /** EXACT heavy hitters (items in more than 1/invSupport of all rows)
    * via the two-phase sketch-then-verify pattern: a single narrow
    * `freqItems` pass (lossy counting — guaranteed SUPERSET of every
    * item above the support threshold, bounded to ≤ invSupport
    * candidates) proposes candidates, then one exact count restricted
    * to candidate rows confirms them. The naive exact form shuffles
    * every distinct item; this shuffles only candidate-row counts —
    * at corpus scale the first pass discards the long tail before it
    * ever reaches an exchange. Because phase 2 is exact, the OUTPUT is
    * deterministic (sketch variance only affects how many false
    * candidates get disproven), so it gates against a plain
    * GROUP BY / HAVING oracle; the support comparison is kept in
    * integers (n · invSupport > total) for cross-engine exactness.
    * Output: (item, n), the item column named after `column`. */
  def heavyHitters(df: DataFrame, column: String, invSupport: Int): DataFrame = {
    // upper bound: Spark's freqItems rejects support < 1e-4 — fail fast
    // on the parameter the caller controls, not mid-job inside Spark
    require(invSupport >= 2 && invSupport <= 10000,
      s"invSupport must be in [2, 10000], got $invSupport")
    val total = df.count()
    // bounded driver-side model state: at most invSupport candidates
    val cand = df.stat.freqItems(Array(column), 1.0 / invSupport)
      .collect()(0).getSeq[Any](0)
    // null-safe candidate membership: isin() uses three-valued logic,
    // so a NULL heavy hitter (a GROUP BY group like any other, which
    // the oracle emits) would silently never match the filter
    val nonNull = cand.filter(_ != null)
    val candPred =
      if (cand.exists(_ == null)) col(column).isin(nonNull: _*) || col(column).isNull
      else col(column).isin(nonNull: _*)
    df.filter(candPred)
      .groupBy(column)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") * invSupport > total)
  }
}
