package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS): Spark's `TimestampType` is
  * micros-only and refuses the type, so we read it as `LongType`
  * epoch-nanos via `spark.sql.legacy.parquet.nanosAsLong` — which also
  * matches the reference engine's time model (uint64 nanoseconds since
  * epoch, reference src/timeseries.h:50-55).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Runtime-settable; only affects TIMESTAMP(NANOS) columns (events.ts).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // every query path goes through here — registering the native
    // function set at the chokepoint means no query can resolve-fail
    // on registration order (sum_micro in a sumDec-only query was
    // reachable without any other registering call having run first)
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** The `events` table as the canonical (timestamp, value) time series
    * of the reference's data model (reference src/timeseries.h:50-55).
    *
    * Timestamps are truncated to MICROS here: the driver's DuckDB oracle
    * reads parquet TIMESTAMP(NANOS) as micro-precision TIMESTAMP, so
    * oracle-comparable queries must live in the micros domain. The tsql
    * engine itself (graft.engine) keeps full nanos.
    */
  def eventSeries(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = load(spark, sfDir, "events")
    import org.apache.spark.sql.functions._
    ev.select(
      expr("ts div 1000").as("timestamp"), // epoch-micros
      col("value"),
      col("event_id"), col("user_id"), col("event_type"))
  }

  /** [[eventSeries]] pre-filtered to a closed MICROS range `[t0, t1]`.
    *
    * The range predicate is applied to the RAW `ts` column (nanos)
    * before the micros projection: a filter on the derived
    * `ts div 1000` cannot reach the parquet scan (observed
    * `PushedFilters: [IsNotNull(ts)]` only), while the equivalent
    * raw-column predicate `ts ∈ [t0*1000, (t1+1)*1000)` pushes down to
    * row-group min/max pruning — the difference between scanning the
    * range and scanning the table. */
  def eventSeriesRanged(spark: SparkSession, sfDir: String,
      t0Us: Long, t1Us: Long): DataFrame = {
    val ev = load(spark, sfDir, "events")
    import org.apache.spark.sql.functions._
    ev.filter(col("ts") >= t0Us * 1000 && col("ts") < (t1Us + 1) * 1000)
      .select(
        expr("ts div 1000").as("timestamp"),
        col("value"),
        col("event_id"), col("user_id"), col("event_type"))
  }
}
