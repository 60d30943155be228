package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view merge
  * pattern: each batch reduces to PARTIAL aggregates in a mergeable
  * state (count + exact DECIMAL sum per key), and the standing stats
  * table absorbs a new batch with one key-equality merge. Updating a
  * corpus-stats rollup therefore costs one pass over the NEW batch
  * plus a merge sized by the key space — never a rescan of the
  * accumulated corpus, which is the difference between "recompute the
  * 100 TB rollup nightly" and "fold in today's partition".
  *
  * Exactness: DECIMAL addition is associative and commutative, so ANY
  * split of the corpus merges to the bit-identical total (the same
  * argument that makes Spark's own partial aggregation correct;
  * IncrementalSpec locks it across random splits). Double sums would
  * NOT survive this — FP addition order changes the result, which is
  * exactly why the mergeable state carries the decimal.
  */
object Incremental {

  /** Mergeable partial state per (event_type, hour): row count + exact
    * DECIMAL(30,6)-semantics value sum. Input needs (event_type,
    * timestamp micros, value). */
  def hourlyPartials(events: DataFrame): DataFrame =
    events.select(col("event_type"),
        (col("timestamp") - col("timestamp") % 3600000000L).as("hour_ts"),
        col("value"))
      .groupBy("event_type", "hour_ts")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,6)")).as("sv"))

  /** Merge partial-state relations into the final rollup: one
    * key-equality aggregation over the (tiny) state relations, then
    * the output rounding every gated sum takes. */
  def merge(partials: DataFrame*): DataFrame = {
    require(partials.nonEmpty, "merge needs at least one partial state")
    partials.reduce(_ unionByName _)
      .groupBy("event_type", "hour_ts")
      .agg(sum("n").as("n"), sum("sv").as("svm"))
      .select(col("event_type"), col("hour_ts"), col("n").cast("long").as("n"),
        round(col("svm").cast("double"), 4).as("sum_value"))
  }
}
