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
    partialsAgg(events.select(col("event_type"), hourTs, col("value"))
      .groupBy("event_type", "hour_ts"))

  /** [[hourlyPartials]] for several batches sharing ONE input scan:
    * `flag` tags each row's batch and becomes a leading `split`
    * column — filter + drop it to get each batch's partial state.
    * (Deriving batches as separate filtered scans would read the
    * corpus once per batch; the grouped flag reads it once.) */
  def hourlyPartialsBy(events: DataFrame, flag: org.apache.spark.sql.Column): DataFrame =
    partialsAgg(events.select(flag.as("split"), col("event_type"), hourTs, col("value"))
      .groupBy("split", "event_type", "hour_ts"))

  private def hourTs =
    (col("timestamp") - col("timestamp") % 3600000000L).as("hour_ts")

  private def micros6(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.Micros6(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))

  /** Data-scale partial aggregation in the agg_corr hi/lo long
    * discipline: per row the value converts once to exact micro-units
    * (micros6 — the SumMicro per-row step, loud beyond its |x|<9.2e12
    * single-long domain), split `div`/`%` 1e6 so BOTH running sums
    * stay inside int64 to ~10¹² rows per group (ANSI-loud beyond,
    * never silent) — pure codegen'd integer adds where the previous
    * `sum(CAST(value AS DECIMAL(30,6)))` paid a boxed BigDecimal
    * wrap + precision-38 add + variable-width buffer per row
    * (measured ~2x the whole agg_incremental_rollup pass at 100M
    * events). The STATE re-widens to the identical exact decimal —
    * (hi·10⁶ + lo)·10⁻⁶ in bounded-precision decimal arithmetic — so
    * the mergeable `sv` column carries the same exact value as
    * before, combine() still merges decimals at state scale (tiny
    * relations), and finalizeRollup's single decimal→double
    * conversion is bit-identical to the old formulation and the
    * oracle's. */
  private def partialsAgg(g: org.apache.spark.sql.RelationalGroupedDataset): DataFrame = {
    val m = micros6(col("value").cast("double"))
    g.agg(count(lit(1)).as("n"),
        sum(org.apache.spark.sql.graftbridge.ColumnBridge.column(
          org.apache.spark.sql.catalyst.expressions.IntegralDivide(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(m),
            org.apache.spark.sql.catalyst.expressions.Literal(1000000L)))).as("h6"),
        sum(m % 1000000L).as("l6"))
      .withColumn("sv",
        (col("h6").cast("decimal(20,0)") *
          lit(new java.math.BigDecimal(1000000)).cast("decimal(7,0)") +
          col("l6").cast("decimal(20,0)")) *
          lit(new java.math.BigDecimal("0.000001")))
      .drop("h6", "l6")
  }

  /** Combine partial-state relations into ONE partial state — closed
    * over the state shape (event_type, hour_ts, n, sv), so yesterday's
    * combined state absorbs today's batch directly: `state =
    * combine(state, hourlyPartials(batch))` is the O(batch) daily fold
    * the object doc describes. */
  def combine(partials: DataFrame*): DataFrame = {
    require(partials.nonEmpty, "combine needs at least one partial state")
    partials.reduce(_ unionByName _)
      .groupBy("event_type", "hour_ts")
      .agg(sum("n").cast("long").as("n"), sum("sv").as("sv"))
  }

  /** Render a partial state as the final rollup: the output rounding
    * every gated sum takes. Finalization is NOT mergeable — fold with
    * [[combine]], finalize once for serving. (Named to avoid
    * overloading Object.finalize.) */
  def finalizeRollup(state: DataFrame): DataFrame =
    state.select(col("event_type"), col("hour_ts"), col("n"),
      round(col("sv").cast("double"), 4).as("sum_value"))

  /** One-shot convenience: combine then finalize. */
  def merge(partials: DataFrame*): DataFrame =
    finalizeRollup(combine(partials: _*))

  /** Incremental JOIN maintenance — the view-delta identity
    * Δ(A ⋈ B) = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
    * (A, B = the materialized bases, ΔA/ΔB = the arriving batches):
    * the standing joined view absorbs a batch by appending exactly
    * these rows, never by re-joining the full bases.
    *
    * Shape at scale: every term has a delta on at least one side, so
    * each join is delta-sized — the deltas broadcast (their side of
    * each term is hinted) and the BASES are only scanned, never
    * shuffled; per-batch cost is ∝ |Δ| · match-rate plus two base
    * scans, while a naive refresh pays the full A ⋈ B shuffle again.
    * (With bucketed bases even the scan side prunes to matching
    * buckets — compose with TsCatalog bucketing where applicable.)
    * The three terms are disjoint by construction (a row pairs old-new,
    * new-old, or new-new), so the union needs no dedup.
    *
    * `keys`: equi-join columns. Column sets of A/B must be disjoint
    * apart from the keys (standard view schema). Output: the delta
    * rows of the joined view, schema = join output schema.
    */
  def joinDelta(aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame, keys: Seq[String]): DataFrame = {
    val t1 = broadcast(aDelta).join(bOld, keys)
    val t2 = aOld.join(broadcast(bDelta), keys)
    val t3 = broadcast(aDelta).join(bDelta, keys)
    t1.unionByName(t2).unionByName(t3)
  }
}
