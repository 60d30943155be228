package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only decomposition of the two slowest remaining event-side
  * constants at 100M events (bench_pair_events_1000x_r11d.json:
  * agg_hourly_rollup 5.34x, agg_funnel 4.41x) — isolates which stage
  * carries each gap and measures the candidate rework shapes before
  * any query changes:
  *
  *  - funnel: the 3-scan + 2-join frontier chain vs a single-scan
  *    grouped sorted-fold automaton (the win_sessionize_agg twin
  *    pattern applied to the funnel).
  *  - hourly: the (long, STRING, long) fine-group key vs all-primitive
  *    key shapes — HashAggregateExec's generated fast hash map
  *    (twolevel) only engages for fixed-width key schemas, so the
  *    event_type string may be evicting the fine phase from the fast
  *    path on every one of the 100M rows.
  *
  * Run: sbt "runMain graft.tools.EventAggProfile <sfDir>"
  */
object EventAggProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/testdata/sf1000x")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("event-agg-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${32 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def time(name: String)(df: => DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save()
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[evprofile] $name%-28s ${reps.map(r => f"$r%.2f").mkString(" ")}")
    }

    val ev = graft.core.Tables.eventSeries(spark, dir)
    val hourUs = 3600000000L
    val steps = Seq("signup", "view", "purchase")

    // ---- funnel decomposition ----
    time("f_current")(graft.ops.Funnels.funnel(ev, steps))
    time("f_scan_filter3")(ev.filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("timestamp")))
    time("f_step1_frontier")(ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("timestamp").as("t")))
    // single-scan sorted-fold automaton (candidate twin)
    def foldFunnel: DataFrame = {
      val coded = ev.filter(col("event_type").isin(steps: _*))
        .select(col("user_id"),
          struct(col("timestamp").as("ts"),
            when(col("event_type") === steps(0), 1L)
              .when(col("event_type") === steps(1), 2L)
              .otherwise(3L).as("step")).as("e"))
      val reached = coded.groupBy("user_id")
        .agg(sort_array(collect_list(col("e"))).as("evs"))
        .select(expr(
          """aggregate(evs,
             named_struct('r', CAST(0 AS BIGINT), 'f', CAST(-1 AS BIGINT)),
             (acc, e) -> IF(e.step = acc.r + 1 AND e.ts > acc.f,
               named_struct('r', acc.r + 1, 'f', e.ts), acc),
             acc -> acc.r)""").as("reached"))
      val counts = reached.groupBy("reached").agg(count(lit(1)).as("c"))
      val stepRel = spark.range(1, steps.size + 1).select(col("id").as("step"))
      stepRel.join(counts, counts("reached") >= stepRel("step"))
        .groupBy("step").agg(sum("c").as("n_users"))
    }
    time("f_fold_twin")(foldFunnel)

    // ---- hourly decomposition ----
    def hourly(fineKey: Seq[org.apache.spark.sql.Column]): DataFrame =
      ev.groupBy(fineKey: _*)
        .agg(count(lit(1)).as("n_u"),
          call_function("sum_micro", col("value").cast("double")).as("s_u"))
    val hourTs = (col("timestamp") - pmod(col("timestamp"), lit(hourUs))).as("hour_ts")
    val typeCode = when(col("event_type") === "signup", 0)
      .when(col("event_type") === "purchase", 1)
      .when(col("event_type") === "view", 2)
      .when(col("event_type") === "click", 3)
      .otherwise(4).as("tc")
    time("h_current_fine")(hourly(Seq(hourTs, col("event_type"), col("user_id"))))
    time("h_fine_primitive")(hourly(Seq(hourTs, typeCode, col("user_id"))))
    time("h_fine_nostring_notype")(hourly(Seq(hourTs, col("user_id"))))
    time("h_fine_count_only")(
      ev.groupBy(hourTs, col("event_type"), col("user_id")).agg(count(lit(1)).as("n_u")))
    time("h_fine_prim_count_only")(
      ev.groupBy(hourTs, typeCode, col("user_id")).agg(count(lit(1)).as("n_u")))
    // full query, current vs primitive-code fine phase
    def hourlyFull(code: Boolean): DataFrame = {
      val fine =
        if (code) hourly(Seq(hourTs, typeCode, col("user_id")))
          .groupBy("hour_ts", "tc")
          .agg(sum("n_u").cast("long").as("n"), count(lit(1)).as("n_users"),
            round(call_function("sum_micro", col("s_u")), 4).as("sum_value"))
          .select(col("hour_ts"),
            element_at(array(lit("signup"), lit("purchase"), lit("view"),
              lit("click"), lit("error")), col("tc") + 1).as("event_type"),
            col("n"), col("n_users"), col("sum_value"))
        else hourly(Seq(hourTs, col("event_type"), col("user_id")))
          .groupBy("hour_ts", "event_type")
          .agg(sum("n_u").cast("long").as("n"), count(lit(1)).as("n_users"),
            round(call_function("sum_micro", col("s_u")), 4).as("sum_value"))
      fine.filter(col("n") >= 2)
    }
    time("h_full_current")(hourlyFull(code = false))
    time("h_full_primitive")(hourlyFull(code = true))

    // ---- string-key tax at SMALL group counts (5 groups) ----
    time("g_string_5grp")(ev.groupBy("event_type").agg(count(lit(1)).as("n")))
    time("g_code_5grp")(ev.groupBy(typeCode).agg(count(lit(1)).as("n")))
    time("g_hash_5grp")(ev.groupBy(xxhash64(col("event_type")).as("tc"))
      .agg(count(lit(1)).as("n")))
    // xxhash64 as the fine key (no when-chain; string recovered by a
    // state-sized join at finalize)
    time("h_fine_xxhash")(hourly(Seq(hourTs, xxhash64(col("event_type")).as("tc"),
      col("user_id"))))
    // funnel with the filtered projection persisted once (3 branches
    // filter the SAME projection differently — the persist-discipline
    // case) vs the 3-parquet-scan chain
    def funnelPersisted: DataFrame = {
      val base = ev.filter(col("event_type").isin(steps: _*))
        .select(col("user_id"), col("timestamp"), col("event_type"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = graft.ops.Funnels.funnel(base, steps)
      out
    }
    time("f_persisted")(funnelPersisted)

    spark.stop()
  }
}
