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
  * Sketch internals differ by engine, so the raw estimates cannot
  * hash-gate against a DuckDB oracle. The `*Verified` wrappers close
  * that gap with an in-plan verification harness: the SAME query
  * computes the exact answer and reduces the estimate to an integer
  * verdict column ("estimate within its error budget"), so the oracle
  * reproduces the exact side and the verdict gates as a constant —
  * a sketch drifting past its budget flips the verdict and fails the
  * hash. Both sketches are deterministic functions of the input set
  * (HLL register maxima / GK merge are order- and partitioning-
  * independent), so on fixed data the verdict is a fixed fact, not a
  * flaky assertion. ApproxSpec additionally bounds the raw estimates
  * against the exact tier.
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

  /** [[approxDistinct]] under the in-plan verification harness (object
    * doc): output is (key, exact_n, within_3rsd) where `within_3rsd`
    * is the BIGINT verdict |estimate − exact| · 100 ≤ exact · 15 —
    * integer arithmetic, no FP comparison hazard. 3·rsd (15% at the
    * default rsd=0.05) because rsd is a standard DEVIATION, not a
    * bound: measured error on the driver testdata is 0.7% at sf0.01
    * and 6.7% at sf0.1 (>1σ!), so a 1σ verdict would be red on real
    * data while 3σ still asserts the sketch tracks the exact count.
    * Cost: one extra exact count-distinct next to the sketch — the
    * gate's price, not the operator's ([[approxDistinct]] stays the
    * production entry point). Null-safe join: a NULL group is a group.
    */
  def approxDistinctVerified(df: DataFrame, key: String, value: String,
      rsd: Double = 0.05): DataFrame = {
    val approx = approxDistinct(df, key, value, rsd)
      .withColumnRenamed(key, "__ak")
    df.groupBy(key)
      .agg(count_distinct(col(value)).as("exact_n"))
      .join(approx, col(key) <=> col("__ak"))
      .select(col(key), col("exact_n"),
        (abs(col("n_approx") - col("exact_n")) * 100 <= col("exact_n") * 15)
          .cast("long").as("within_3rsd"))
  }

  /** [[approxPercentiles]]' verification harness: rank-checks each
    * returned quantile value v_q by re-counting r = |{x ≤ v_q}| and
    * asserting |r − q·nv| ≤ 2·nv/accuracy + 2 (twice the sketch's
    * eps·n rank guarantee, +2 for the ≤-count/tie discretization;
    * measured slack on the driver testdata is ≤1 rank at sf0.01 and
    * ≤2 at sf0.1 against a budget of 2.4/6). All comparisons are
    * scaled to integers (rank·10⁴ vs nv·q·10⁴) — exact in any engine.
    * Output (key, n, ok50, ok90, ok99); the oracle reproduces n and
    * asserts the verdicts constant-1. nv = non-null count (the
    * population the sketch ranks over); n = count(*) like the exact
    * tier. An all-null group has nv=0, null quantiles, r=0 → verdicts
    * trivially 1, matching the oracle's constant.
    */
  def approxPercentilesVerified(df: DataFrame, key: String, value: String,
      accuracy: Int = 10000): DataFrame = {
    val sk = df.groupBy(key)
      .agg(
        percentile_approx(col(value), array(lit(0.5), lit(0.9), lit(0.99)),
          lit(accuracy)).as("q"),
        count(lit(1)).as("n"), count(col(value)).as("nv"))
      .select(col(key).as("__pk"),
        element_at(col("q"), 1).as("v50"), element_at(col("q"), 2).as("v90"),
        element_at(col("q"), 3).as("v99"), col("n"), col("nv"))
    // tiny per-group sketch relation broadcast back onto the rows for
    // the rank recount — one shuffle-free pass over df
    val ranks = df.join(broadcast(sk), col(key) <=> col("__pk"))
      .groupBy(key)
      .agg(
        sum(when(col(value) <= col("v50"), 1L).otherwise(0L)).as("r50"),
        sum(when(col(value) <= col("v90"), 1L).otherwise(0L)).as("r90"),
        sum(when(col(value) <= col("v99"), 1L).otherwise(0L)).as("r99"),
        first("n").as("n"), first("nv").as("nv"))
    def ok(r: String, q10k: Long): Column =
      (abs(col(r) * 10000 - col("nv") * q10k) <=
        col("nv") * 20000L / accuracy + 20000L).cast("long")
    ranks.select(col(key), col("n"),
      ok("r50", 5000).as("ok50"), ok("r90", 9000).as("ok90"),
      ok("r99", 9900).as("ok99"))
  }

  /** Partition-partial HLL sketches + merge, under the in-plan
    * verification harness — the INCREMENTAL distinct story at 100 TB:
    * per-(key, day) DataSketches HLL sketches are the materialized
    * partial state a daily pipeline persists, and each new day UNIONS
    * in (register-max merge, associative and order-independent)
    * without rescanning history — where exact incremental
    * count-distinct must re-shuffle every (key, value) pair ever seen
    * (Skew.twoPhaseCountDistinct's cost, paid daily). The same
    * mergeability is what makes the sketch a partial aggregate across
    * executors rather than a per-partition estimate.
    *
    * Verdicts (the approxDistinctVerified 3σ discipline, DataSketches
    * default lgK=12 → rsd ≈ 1.6%, budget 15% ≫ 3σ): the day-merged
    * estimate AND the direct one-pass estimate must both sit within
    * budget of exact — so a broken union (double-counting, dropped
    * registers) or a broken sketch both flip a verdict and fail the
    * hash. n_partials (distinct days per key) is the content-bearing
    * column proving the merge actually spanned partitions.
    * Output: (key, exact_n, n_partials, merged_ok, direct_ok). */
  def sketchMergeVerified(ev: DataFrame, key: String = "event_type",
      value: String = "user_id", dayUs: Long = 86400000000L): DataFrame = {
    // ONE corpus pass (r13 rework): the r12 shape paid THREE — a
    // codegen'd exact fine aggregate plus TWO whole-corpus
    // interpreted HLL passes (hll_sketch_agg is a
    // TypedImperativeAggregate: ObjectHashAggregate, no whole-stage
    // codegen, ~20 ns/row — 27 s of the 8.1x paired ratio at 1B,
    // bench_pair_events_10000x_r13). HLL updates are
    // DUPLICATE-INSENSITIVE (register maxima of value hashes — the
    // same library call on the same value set yields the identical
    // sketch), so every sketch here is built from the fine
    // (key, day, value) DISTINCT relation the exact referent already
    // needs: the corpus is folded ONCE by a codegen'd hash aggregate,
    // and the per-row HLL cost moves to the state-scale fine rows
    // (days x value-cardinality x keys). The union/merge path — what
    // this operator verifies — still runs on real sketches.
    // In a PRODUCTION daily pipeline (no exact referent), the
    // per-day sketch would fold raw rows instead: when value
    // cardinality approaches row count the fine relation degenerates
    // to corpus size, and paying the exact referent at all is the
    // choice the verification harness makes, not the sketch.
    val fine = ev.select(col(key), expr(s"timestamp div $dayUs").as("day"),
        col(value))
      .distinct() // a bufferless hash aggregate — no counts needed
    // ONE grouping-sets pass over fine (optimization r17, guide §2.4
    // "remove shuffles outright"): the r13-r16 shape fed fine to THREE
    // independent branches (per-day partials → union-merge; direct
    // sketch; exact recount) joined back on the key — which forced an
    // eager persist (divergent column pruning defeated exchange reuse)
    // and put 18 Exchanges incl. AQE duplicates plus 2 joins in the
    // plan for a 5-row result. GROUPING SETS ((key, day), (key))
    // computes BOTH granularities in one Expand aggregation: day-level
    // rows are the real per-day partial sketches, key-level rows carry
    // the direct sketch and the exact distinct referent; one final
    // key-level aggregation then runs the genuine register-max merge
    // (hll_union_agg) over the day partials. Values identical:
    //  - n_partials = count of day-level groups ≡ count of the old
    //    partials rows (a NULL day is its own group in both shapes —
    //    grouping() separates data-NULL from rollup-NULL);
    //  - exact_n = count(DISTINCT value) at key level ≡ the old
    //    distinct-then-count-non-null two-phase (count_distinct skips
    //    NULLs);
    //  - the sketches fold the identical distinct (key, day, value) /
    //    (key, value) sets, so registers — and estimates — match.
    // 3 Exchanges total, no persist, no joins, one corpus pass.
    val gs = fine
      .groupingSets(Seq(Seq(col(key), col("day")), Seq(col(key))),
        col(key), col("day"))
      .agg(hll_sketch_agg(col(value)).as("sk"),
        count_distinct(col(value)).as("cd_value"),
        grouping(col("day")).as("g_day"))
    gs.groupBy(key)
      .agg(
        hll_sketch_estimate(
          hll_union_agg(when(col("g_day") === 0, col("sk")))).as("n_merged"),
        count(when(col("g_day") === 0, lit(1))).as("n_partials"),
        hll_sketch_estimate(
          first(when(col("g_day") === 1, col("sk")), ignoreNulls = true))
          .as("n_direct"),
        max(when(col("g_day") === 1, col("cd_value"))).as("exact_n"))
      .select(col(key), col("exact_n"), col("n_partials"),
        (abs(col("n_merged") - col("exact_n")) * 100 <= col("exact_n") * 15)
          .cast("long").as("merged_ok"),
        (abs(col("n_direct") - col("exact_n")) * 100 <= col("exact_n") * 15)
          .cast("long").as("direct_ok"))
  }

  /** PRODUCTION-shaped sketch-only rollup (r13 verdict #2) — the
    * like-for-like referent [[sketchMergeVerified]] deliberately is
    * not: per-key distinct-user ESTIMATE from day-partial HLL sketches
    * merged per key, with NO exact referent anywhere in the plan. The
    * paired DuckDB oracle runs ITS OWN sketch
    * (`approx_count_distinct`), so the bench pair measures "sketch
    * pipeline vs sketch pipeline" — the verified key keeps gating
    * correctness with its structurally-asymmetric exact referent.
    *
    * Plan: the corpus folds ONCE through a codegen'd hash DISTINCT on
    * (key, day, value) — legal for any duplicate-insensitive sketch
    * (HLL registers are maxima of value hashes; duplicates change
    * nothing), and measured 8.14x → 3.37x on the verified key at 1B
    * (BASELINE.md r13) vs folding raw rows through the interpreted
    * TypedImperativeAggregate. The per-(key, day) sketches and the
    * per-key union then run at state scale (days x cardinality).
    *
    * Gate hashing across engines: raw estimates cannot hash-match
    * (sketch internals differ), so the estimate surfaces as a RATIO
    * BAND — `floor(ln(est)/ln(1.25) + 0.5)`, i.e. est rounded to the
    * nearest power of 1.25 (±11.8% half-step against a ≲4% combined
    * cross-engine estimate gap at scale). At the gate scales the band
    * is exact-on-exact: both engines' sketches are in their exact
    * (sparse) range at 150 distinct users, so est is identical before
    * banding; the ln(1.25) divisor is embedded as the same IEEE
    * double literal in both plans. Output: (key, n_days, est_band);
    * n_days (exact distinct days per key) proves the merge spanned
    * partials. */
  def sketchRollup(ev: DataFrame, key: String = "event_type",
      value: String = "user_id", dayUs: Long = 86400000000L): DataFrame = {
    val fine = ev
      .select(col(key), expr(s"timestamp div $dayUs").as("day"), col(value))
      .distinct()
    val partials = fine.groupBy(col(key), col("day"))
      .agg(hll_sketch_agg(col(value)).as("sk"))
    partials.groupBy(key)
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .select(col(key), col("n_days"),
        floor(log(greatest(col("est"), lit(1L)).cast("double")) /
          lit(BandLn125) + lit(0.5)).cast("long").as("est_band"))
  }

  /** ln(1.25), pinned as ONE double literal shared by the Spark plan
    * and the oracle SQL text — a libm-vs-fdlibm 1-ulp divisor gap must
    * not move a band edge. */
  val BandLn125: Double = 0.22314355131420976

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
    // `total` rides the sketch pass: freqItems is a plain aggregation
    // over the observed child (CollectFrequentItems is a
    // TypedImperativeAggregate), so CollectMetrics fires on the same
    // scan — previously a separate df.count() job paid a third full
    // read of the input
    val obs = org.apache.spark.sql.Observation()
    // bounded driver-side model state: at most invSupport candidates
    val cand = df.observe(obs, count(lit(1)).as("total"))
      .stat.freqItems(Array(column), 1.0 / invSupport)
      .collect()(0).getSeq[Any](0)
    val total = obs.get("total").asInstanceOf[Long]
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
