package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over per-user event streams — the ordered
  * funnel and cohort-retention operators every product-analytics
  * deployment layers on a time-series store (ClickHouse ships them as
  * windowFunnel/retention; the reference's surface stops at per-series
  * aggregates, SURVEY §2.6 "no group-by keys other than time
  * windows").
  *
  * Both are compositions of equality-keyed aggregations and joins on
  * the user key — one shuffle family, co-partitioned end-to-end, no
  * windows, no cross products; AQE can broadcast the step frontiers
  * when they collapse (a funnel's step-k survivors only shrink).
  */
object Funnels {

  /** Ordered conversion funnel: for consecutive steps
    * (types(0) → types(1) → …), step k's frontier is the user's
    * EARLIEST types(k) event STRICTLY after their step-(k−1) time —
    * the standard windowFunnel(strict_order=false, strict ts) rule;
    * same-timestamp events do NOT chain (a purchase logged in the
    * same microsecond as the view that led to it is simultaneous, not
    * sequential — documented policy, the oracle replays it).
    *
    * Output: one row per step — (step 1-based, event_type, n_users),
    * n_users non-increasing by construction.
    *
    * Shape (r12 rework — the old per-step scan+join chain paid m full
    * scans and m−1 row shuffles and its paired ratio ROSE with scale):
    * m−1 event passes, ZERO event-row shuffles.
    *
    *  1. ONE pass computes per-user stats — f0 = min step-0 ts plus
    *     the LAST step's max ts (the only maximum any later stage
    *     reads) — as a map-side-combined aggregate (only
    *     user-count-sized partials reach the exchange).
    *  2. Each INTERMEDIATE step k (1 ≤ k ≤ m−2) refines its exact
    *     frontier with one filtered pass joined against the
    *     user-sized previous frontier — AQE broadcasts it while it
    *     fits, and at mega-user scale falls back to a shuffle join,
    *     which is the old chain's cost, never worse.
    *  3. The LAST step needs NO pass at all: a types(m−1) event
    *     strictly after f(m−2) exists iff the user's max types(m−1)
    *     ts — already in the stats — exceeds f(m−2).
    *
    * The stats relation feeds three consumers (step-1 count, frontier
    * seed, last-step maxima); it is persisted so divergent column
    * pruning can't split it back into per-consumer scans, and
    * registered in [[graft.core.EscapedCaches]] (it escapes inside
    * the returned plan — caller releases after materializing; Bench
    * clears caches per rep). */
  def funnel(events: DataFrame, types: Seq[String]): DataFrame = {
    require(types.nonEmpty && types.size == types.distinct.size,
      s"steps must be non-empty and distinct, got $types")
    val m = types.size
    def stepRow(i: Int, n: org.apache.spark.sql.Column) =
      struct(lit((i + 1).toLong).as("step"), lit(types(i)).as("event_type"),
        n.as("n_users"))
    // only TWO aggregates regardless of m: f0 (step-1 frontier seed)
    // and mx(m-1) (the last step's per-user maximum). Intermediate
    // steps recount from events against the previous frontier, so
    // their maxima were never read — computing them cost m−2
    // conditional-max branches per row and (m−2) cached longs per
    // user (r12 advice)
    val aggs =
      min(when(col("event_type") === types(0), col("timestamp"))).as("f0") +:
        (if (m >= 2)
          Seq(max(when(col("event_type") === types(m - 1), col("timestamp")))
            .as(s"mx${m - 1}"))
         else Nil)
    val statsRaw = events.filter(col("event_type").isin(types: _*))
      .groupBy("user_id").agg(aggs.head, aggs.tail: _*)
    if (m == 1)
      return statsRaw.agg(count("f0").as("n"))
        .select(explode(array(stepRow(0, col("n")))).as("r")).select("r.*")
    if (m == 2)
      // both counts from the single stats pass — one scan total
      return statsRaw.agg(count("f0").as("n1"),
          count(when(col("mx1") > col("f0"), 1L)).as("n2"))
        .select(explode(array(stepRow(0, col("n1")), stepRow(1, col("n2")))).as("r"))
        .select("r.*")
    // Materialize the cache EAGERLY (count() = one tiny job): the
    // returned union has three consumers of this relation, and letting
    // the FIRST materialization happen lazily means concurrent query
    // stages each compute the not-yet-populated partitions — measured
    // ~2x the whole query at 100M events. Batch-only operator, so the
    // eager action is safe. statsRaw already carries ONLY the two
    // consumed columns (see the aggs note above), so the cached
    // footprint is two longs per user.
    val stats = graft.core.EscapedCaches.persistTracked(statsRaw)
    stats.count()
    // intermediate frontiers f1..f(m-2): (user_id, t); each but the
    // last is consumed twice (its count + the next recount's build
    // side), so those persist too — all user-sized
    val seed = stats.filter(col("f0").isNotNull)
      .select(col("user_id"), col("f0").as("t"))
    val frontiers = (1 to m - 2).scanLeft(seed) { case (prev, k) =>
      val f = events.filter(col("event_type") === types(k))
        .select(col("user_id"), col("timestamp").as("ts"))
        .join(prev.select(col("user_id"), col("t").as("prev_t")), "user_id")
        .filter(col("ts") > col("prev_t"))
        .groupBy("user_id").agg(min("ts").as("t"))
      if (k < m - 2) {
        val p = graft.core.EscapedCaches.persistTracked(f)
        p.count() // same eager-materialization rule as stats
        p
      } else f
    }
    // EVERY step count from ONE aggregation over a user-keyed chain of
    // LEFT joins (optimization r17, guide §2.4): the r12 shape emitted
    // each count as its own branch (n1 / per-mid / lastTwo) and
    // union'd them — 3 independent actions' worth of plan (14
    // Exchanges incl. AQE duplicates at m=3) re-reading the stats
    // cache per branch. The frontiers are user-sized and only SHRINK
    // by step, so left-joining them all onto stats costs one
    // broadcast each and the counts fall out of a single global
    // aggregate: count(f0) = |s1|, count(t_k) = |frontier k| (left
    // join against a per-user-unique frame preserves stats rows), and
    // the last step recounts from the stats maxima exactly as before
    // (NULL frontier compares false, matching the old inner join).
    // Same values, ONE action, no union.
    val chain = (1 to m - 2).foldLeft(
        stats.select(col("user_id"), col("f0"), col(s"mx${m - 1}"))) {
      case (acc, k) =>
        acc.join(frontiers(k).select(col("user_id"), col("t").as(s"t$k")),
          Seq("user_id"), "left")
    }
    val counts =
      count(col("f0")).as("n0") +:
        (1 to m - 2).map(k => count(col(s"t$k")).as(s"n$k")) :+
        count(when(col(s"mx${m - 1}") > col(s"t${m - 2}"), 1L)).as(s"n${m - 1}")
    chain.agg(counts.head, counts.tail: _*)
      .select(explode(array(
        (0 until m).map(i => stepRow(i, col(s"n$i"))): _*)).as("r"))
      .select("r.*")
  }

  /** [[funnel]] with a conversion WINDOW (ClickHouse windowFunnel's
    * gap argument): step k must land strictly after step k−1 AND
    * within `windowUs` of the user's step-1 time — a signup only
    * "converts" if the later steps happen inside the attribution
    * window.
    *
    * Shape (r12, the [[funnel]] rework applied): the old chain paid m
    * full scans AND m−1 event-row shuffles; this pays the same m
    * scans (the upper window bound depends on t0, so unlike the plain
    * funnel even the LAST step needs its recount — per-user maxima
    * can't answer "exists in (f, t0+W]") but ZERO event-row shuffles:
    * every recount joins the user-sized previous frontier, which AQE
    * broadcasts while it fits. Frontier relations with two consumers
    * (their count + the next recount) persist eagerly through
    * [[graft.core.EscapedCaches]]. */
  def funnelWithin(events: DataFrame, types: Seq[String],
      windowUs: Long): DataFrame = {
    require(types.size >= 2 && types.size == types.distinct.size,
      s"need >= 2 distinct steps, got $types")
    require(windowUs >= 1, s"windowUs must be >= 1, got $windowUs")
    val m = types.size
    def stepRow(i: Int, n: org.apache.spark.sql.Column) =
      struct(lit((i + 1).toLong).as("step"), lit(types(i)).as("event_type"),
        n.as("n_users"))
    val seed = events.filter(col("event_type") === types(0))
      .groupBy("user_id").agg(min("timestamp").as("t"))
      .withColumn("t0", col("t"))
    val frontiers = (1 until m).scanLeft(seed) { case (prev, k) =>
      events.filter(col("event_type") === types(k))
        .select(col("user_id"), col("timestamp").as("ts"))
        .join(prev.select(col("user_id"), col("t").as("prev_t"), col("t0")),
          "user_id")
        .filter(col("ts") > col("prev_t") &&
          col("ts") <= col("t0") + windowUs)
        .groupBy("user_id", "t0").agg(min("ts").as("t"))
    }
    // every frontier but the LAST feeds two consumers (the next
    // recount's build side + the count chain below): persist +
    // materialize eagerly so the independent consumers can't
    // double-compute it
    val cached = frontiers.zipWithIndex.map { case (f, i) =>
      if (i < m - 1) {
        val p = graft.core.EscapedCaches.persistTracked(f)
        p.count()
        p
      } else f
    }
    // EVERY step count from ONE aggregation over a user-keyed chain
    // of LEFT joins (optimization r17, guide §2.4 — the funnel
    // treatment): the r12 shape counted each frontier as its own
    // branch and union'd m of them (26 Exchanges incl. AQE duplicates
    // at m=3). Frontiers are user-unique and shrink by step, so the
    // left joins preserve the seed's row-per-user and count(t_k) =
    // |frontier k| exactly as the per-branch counts did. Same values,
    // ONE action, no union.
    val chain = (1 until m).foldLeft(
        cached.head.select(col("user_id"), col("t").as("t0"))) {
      case (acc, k) =>
        acc.join(cached(k).select(col("user_id"), col("t").as(s"t$k")),
          Seq("user_id"), "left")
    }
    // n0 = count(lit(1)) — the old branch counted seed ROWS (count(*)
    // over s1, the oracle's contract), not non-null t; later steps'
    // t_k is never NULL when the frontier row exists (min over the
    // ts > prev_t filtered rows), so count(t_k) ≡ the old row count.
    chain.agg(count(lit(1)).as("n0"),
        (1 until m).map(k => count(col(s"t$k")).as(s"n$k")): _*)
      .select(explode(array(
        (0 until m).map(i => stepRow(i, col(s"n$i"))): _*)).as("r"))
      .select("r.*")
  }

  /** Cohort retention: users grouped by their FIRST-ACTIVITY period
    * (cohort), counted once per (cohort, offset) cell where offset =
    * active period − cohort period — the day-N/week-N retention
    * matrix. `periodUs` is the bucket width in the timestamp's unit
    * (epoch micros here).
    *
    * Output: (cohort_period, offset, n_users) — offset 0 is the cohort
    * size; every cell ≤ its cohort size.
    *
    * Shape: distinct (user, period) then a user-keyed min +
    * self-join — two aggregations and one equality join, all on the
    * user key; the cohort matrix itself is tiny (periods², not data). */
  def retention(events: DataFrame, periodUs: Long = 7L * 86400000000L): DataFrame = {
    require(periodUs >= 1, s"periodUs must be >= 1, got $periodUs")
    val act = events
      .select(col("user_id"), expr(s"timestamp div $periodUs").as("period"))
      .distinct()
    val first = act.groupBy("user_id").agg(min("period").as("cohort_period"))
    act.join(first, "user_id")
      .groupBy(col("cohort_period"), (col("period") - col("cohort_period")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
