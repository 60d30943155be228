package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles with BOUNDED memory: sort-rank the
  * values per group (sort-based window — spills to disk, never buffers
  * a group in an agg buffer) and select/interpolate the two ranks each
  * quantile needs. Spark's `percentile()` aggregate is a
  * TypedImperativeAggregate that materializes EVERY value of a group
  * in one reducer's buffer — a deterministic OOM on a hot group at
  * corpus scale, which is why it's not used here (it remains the
  * semantics reference: interpolation below is its
  * `(hi-pos)*v_lo + (pos-lo)*v_hi` formula over pos = q*(n-1),
  * identical to DuckDB's quantile_cont on the oracle side).
  *
  * BIT-equality of the interpolation across engines (not just
  * closeness): DuckDB combines as `(1-frac)*lo + frac*hi` while this
  * plan computes `(ceil(pos)-pos)*lo + (pos-floor(pos))*hi` — the
  * coefficient pairs are bit-identical doubles, because pos and
  * floor/ceil(pos) sit within a factor of 2 (Sterbenz: both
  * subtractions exact) and 1-frac is exactly representable whenever
  * frac is a multiple of ulp(pos) ≥ 2^-52, which q*(n-1) positions
  * always are; with identical coefficients the multiply/add chain is
  * the same FP expression in both engines. Verified empirically: 0
  * bit-mismatches over 4000 randomized lists (n∈[2,50], half seeded
  * with 4dp round-half-boundary values) against DuckDB quantile_cont
  * pre-rounding — the round(·,4) in the output never sees a 1-ulp
  * formula divergence.
  *
  * Null semantics match `percentile()`/`quantile_cont`: null values
  * are IGNORED for ranking/interpolation (positions use the non-null
  * count) while the output `n` counts every row, like the
  * count(*)-based form it sits next to.
  *
  * At scale the per-group sort is the only hot spot (k groups → k-way
  * parallelism ceiling); it trades the OOM for spillable disk, the
  * correct failure mode for an exact quantile. The sketch tier
  * ([[Approx.approxPercentiles]]) is the same shape without the sort.
  */
object Percentiles {

  def exact(df: DataFrame, key: String, value: String,
      pcts: Seq[(String, Double)]): DataFrame =
    exactImpl(df, key, value, pcts, round4 = true)

  /** Exact GLOBAL (one-group) percentiles with NO unpartitioned window
    * over the data: the degenerate case where [[exact]]'s per-group
    * sort would collapse to a single-partition corpus sort (Catalyst
    * folds a constant partition key away and Spark warns "No Partition
    * Defined for Window operation" — every row through one task).
    *
    * Two-level rank selection, the pack_sequences discipline
    * (graft.ops.Packing.sequenceSpans):
    *
    *  1. collapse rows to a DISTINCT-VALUE histogram — a plain
    *     map-side-combinable `groupBy(value).count()`, fully parallel;
    *  2. cumulative counts over the histogram via a two-level prefix
    *     scan: within-shard windows partitioned by `shard =
    *     value div shardSize` (parallel; for integral values each
    *     shard holds ≤ shardSize distinct values by construction),
    *     then a prefix over the one-row-per-shard relation — the only
    *     unpartitioned window, over value-range/shardSize rows;
    *  3. each quantile needs the values at ranks floor(pos)+1 and
    *     ceil(pos)+1 (pos = q·(nv−1)): a rank r is covered by the
    *     unique histogram row with cum−c < r ≤ cum, so at most
    *     2·|pcts| histogram rows survive the filter into a global
    *     aggregate; interpolation is [[exact]]'s formula verbatim
    *     (bit-identical to quantile_cont — object doc above).
    *
    * Equal values share one histogram row, so tie-rank arbitrariness
    * cannot change the picked values — same invariant as [[exact]].
    * Nulls are ignored for ranking (nv) while `n` counts all rows;
    * an all-null input emits null percentiles with its count, like
    * percentile(). Output: one row (pct columns…, n). */
  def exactGlobal(df: DataFrame, value: String,
      pcts: Seq[(String, Double)], shardSize: Long = 1024L): DataFrame = {
    require(shardSize >= 1)
    val totals = df.agg(count(lit(1)).as("n"), count(col(value)).as("nv"))
    val hist = df.filter(col(value).isNotNull)
      .groupBy(col(value).as("v")).agg(count(lit(1)).as("c"))
      // floor division is monotone in v, so shards are contiguous,
      // ordered value ranges — shard prefix + in-shard prefix is the
      // global cumulative count
      .withColumn("shard",
        floor(col("v").cast("double") / lit(shardSize.toDouble)).cast("long"))
    val inShard = Window.partitionBy("shard").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = hist.withColumn("local_cum", sum("c").over(inShard))
    val shardPrefix = hist.groupBy("shard").agg(sum("c").as("sc"))
      .withColumn("shard_off", coalesce(sum("sc").over(
        Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("shard"), col("shard_off"))
    val cum = withLocal.join(broadcast(shardPrefix), "shard")
      .withColumn("cum", col("shard_off") + col("local_cum"))
      .crossJoin(broadcast(totals.select(col("nv").as("__nv"))))
    def pos(q: Double): Column = lit(q) * (col("__nv") - 1).cast("double")
    def covers(r: Column): Column = col("cum") - col("c") < r && r <= col("cum")
    val needed = pcts.map { case (_, q) =>
      covers(floor(pos(q)) + 1) || covers(ceil(pos(q)) + 1) }.reduce(_ || _)
    val aggs = pcts.flatMap { case (name, q) => Seq(
      max(when(covers(floor(pos(q)) + 1), col("v"))).as(s"${name}_lo"),
      max(when(covers(ceil(pos(q)) + 1), col("v"))).as(s"${name}_hi")) }
    // global agg over the ≤ 2·|pcts| surviving rows; an empty input
    // still yields the one (all-null) row a global aggregate emits
    val picked = cum.filter(needed).agg(aggs.head, aggs.tail: _*)
    def interp(name: String, q: Double): Column = {
      val p = lit(q) * (col("nv") - 1).cast("double")
      val raw = when(floor(p) === ceil(p), col(s"${name}_lo"))
        .otherwise((ceil(p) - p) * col(s"${name}_lo") +
          (p - floor(p)) * col(s"${name}_hi"))
      round(raw, 4).as(name)
    }
    broadcast(totals).crossJoin(picked)
      .select(pcts.map { case (nm, q) => interp(nm, q) } :+ col("n"): _*)
  }

  /** Percentile-band CALIBRATION of any integer signal: boundaries
    * from [[exactGlobal]] (no corpus sort — the two-level rank
    * selection), broadcast back as a one-row model relation, band
    * assigned at scan speed. Rank-normalizing a raw score is what
    * makes a threshold transfer across corpora (a "keep the top 30%"
    * rule survives a distribution shift; "score ≥ 74000" does not) —
    * the Packing.lengthBuckets shape generalized to any (id, value)
    * relation. The input relation feeds both the boundary computation
    * and the assignment join, so it is persisted (caller releases via
    * clearCache — the shared-relation convention).
    * Output: (idCol, valueCol, band in 1..nBands). */
  def calibrateBands(rel: DataFrame, idCol: String, valueCol: String,
      nBands: Int): DataFrame = {
    require(nBands >= 2 && nBands <= 100,
      s"nBands must be in [2, 100], got $nBands")
    val r = rel.select(col(idCol), col(valueCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pcts = (1 until nBands).map(i => (s"b$i", i.toDouble / nBands))
    val bounds = exactGlobal(r, valueCol, pcts).drop("n")
    r.join(broadcast(bounds))
      .withColumn("band",
        (1 until nBands).map(i =>
          (col(valueCol) > col(s"b$i")).cast("long")).reduce(_ + _) + 1)
      .select(idCol, valueCol, "band")
  }

  /** [[exact]] without the 4dp gate rounding — the raw interpolated
    * doubles, used by PercentilesSpec's boundary-margin invariant
    * (which checks the rounding itself is cross-engine safe). */
  def exactUnrounded(df: DataFrame, key: String, value: String,
      pcts: Seq[(String, Double)]): DataFrame =
    exactImpl(df, key, value, pcts, round4 = false)

  private def exactImpl(df: DataFrame, key: String, value: String,
      pcts: Seq[(String, Double)], round4: Boolean): DataFrame = {
    // group-size relation: tiny (one row per group) — persisted so the
    // broadcast into the ranking join and the output-driving left join
    // share ONE evaluation instead of re-scanning the input
    val counts = df.groupBy(key)
      .agg(count(lit(1)).as("n"), count(col(value)).as("nv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = Window.partitionBy(key).orderBy(value)
    // rank ties are arbitrary among equal values — interpolation only
    // reads the VALUES at the picked ranks, which ties cannot change;
    // null rows never enter the window (they would rank first and
    // shift every pick). Joins are null-safe: a NULL group key is a
    // group like any other to percentile().
    val countsK = counts.withColumnRenamed(key, "__pk")
    val ranked = df.filter(col(value).isNotNull)
      .withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(countsK), col(key) <=> col("__pk"))
      .drop("__pk")
    def pos(q: Double): Column = lit(q) * (col("nv") - 1).cast("double")
    val needed = pcts.map { case (_, q) =>
      col("rn") === floor(pos(q)) + 1 || col("rn") === ceil(pos(q)) + 1
    }.reduce(_ || _)
    val aggs = pcts.flatMap { case (name, q) => Seq(
      max(when(col("rn") === floor(pos(q)) + 1, col(value))).as(s"${name}_lo"),
      max(when(col("rn") === ceil(pos(q)) + 1, col(value))).as(s"${name}_hi"))
    }
    def interp(name: String, q: Double): Column = {
      val p = pos(q)
      val raw = when(floor(p) === ceil(p), col(s"${name}_lo"))
        .otherwise((ceil(p) - p) * col(s"${name}_lo") +
          (p - floor(p)) * col(s"${name}_hi"))
      (if (round4) round(raw, 4) else raw).as(name)
    }
    // drive the output from `counts` (left join): a group whose values
    // are ALL null has no ranked rows but must still emit a row with
    // null percentiles and its count(*), exactly like percentile()
    val agged = ranked.filter(needed)
      .groupBy(key).agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed(key, "__pk")
    counts.join(agged, col(key) <=> col("__pk"), "left")
      .select(col(key) +: pcts.map { case (nm, q) => interp(nm, q) } :+ col("n"): _*)
  }
}
