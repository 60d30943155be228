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
}
