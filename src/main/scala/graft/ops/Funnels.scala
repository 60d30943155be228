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
    * Shape: per step ONE filtered min-aggregation on user_id joined to
    * the previous frontier — all equality joins on the user key;
    * frontiers only shrink, so later steps get cheaper, and at scale
    * AQE broadcasts the shrunken frontier into the event scan. */
  def funnel(events: DataFrame, types: Seq[String]): DataFrame = {
    require(types.nonEmpty && types.size == types.distinct.size,
      s"steps must be non-empty and distinct, got $types")
    // ONE lazy plan, no driver-side count loop: the per-step frontiers
    // chain as subplans and the final result unions one count per
    // step — shared prefixes dedup via ReusedExchange, and nothing
    // executes until the caller acts
    val frontiers = types.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (tp, _)) =>
        val step = events.filter(col("event_type") === tp)
          .select(col("user_id"), col("timestamp").as("ts"))
        Some(prev match {
          case None => step.groupBy("user_id").agg(min("ts").as("t"))
          case Some(f) => step.join(f.withColumnRenamed("t", "prev_t"), "user_id")
            .filter(col("ts") > col("prev_t"))
            .groupBy("user_id").agg(min("ts").as("t"))
        })
    }.flatten
    frontiers.zip(types).zipWithIndex.map { case ((f, tp), i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit((i + 1).toLong).as("step"), lit(tp).as("event_type"),
          col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** [[funnel]] with a conversion WINDOW (ClickHouse windowFunnel's
    * gap argument): step k must land strictly after step k−1 AND
    * within `windowUs` of the user's step-1 time — a signup only
    * "converts" if the later steps happen inside the attribution
    * window. Same frontier chain with one extra bound carried from
    * the step-1 frontier; identical plan shape. */
  def funnelWithin(events: DataFrame, types: Seq[String],
      windowUs: Long): DataFrame = {
    require(types.size >= 2 && types.size == types.distinct.size,
      s"need >= 2 distinct steps, got $types")
    require(windowUs >= 1, s"windowUs must be >= 1, got $windowUs")
    val frontiers = types.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (tp, i)) =>
        val step = events.filter(col("event_type") === tp)
          .select(col("user_id"), col("timestamp").as("ts"))
        Some(prev match {
          case None => step.groupBy("user_id")
            .agg(min("ts").as("t")).withColumn("t0", col("t"))
          case Some(f) => step
            .join(f.select(col("user_id"), col("t").as("prev_t"), col("t0")), "user_id")
            .filter(col("ts") > col("prev_t") &&
              col("ts") <= col("t0") + windowUs)
            .groupBy("user_id", "t0").agg(min("ts").as("t"))
        })
    }.flatten
    frontiers.zip(types).zipWithIndex.map { case ((f, tp), i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit((i + 1).toLong).as("step"), lit(tp).as("event_type"),
          col("n_users"))
    }.reduce(_.unionByName(_))
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
