package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score anomaly detection over per-key event series — the
  * monitoring primitive a time-series engine feeds (the reference's
  * surface stops at min/max/avg; this is the natural next operator a
  * user of those aggregates writes by hand).
  *
  * Each event is scored against the PRECEDING `lookback` events of its
  * own key: anomalous iff (x − mean)² > k² · variance of that trailing
  * window, with no verdict until `minPrev` points of history exist.
  * The trailing frame (never the current row) keeps the verdict causal
  * — a spike cannot mask itself by inflating its own baseline.
  *
  * Cross-engine exactness: window sums accumulate as exact 1e-4
  * fixed-point LONGS (order-independent integer adds — the r8 rework;
  * the original DECIMAL(18,6) sums boxed a BigDecimal per frame update
  * and dominated the 1M-event cost); the mean/variance/threshold
  * arithmetic then runs in DOUBLE with the identical operation order
  * as the oracle text, so every IEEE step is bit-equal and the
  * integer verdict hash-gates.
  *
  * Shape at scale: ONE window over (key, time-ordered) rows — a
  * single shuffle on the key, bounded per-row state (the frame is
  * `lookback` rows), no group buffering beyond the frame. Keys are
  * user-grain (well-spread); a global series would serialize behind
  * one partition and belongs in SAMPLE BY space instead.
  *
  * Output: one row per event — (user_id, ts_us, value, event_id,
  * n_prev, mean4, anomaly).
  */
object Anomaly {

  def rollingZScore(events: DataFrame, k2: Int = 9, minPrev: Int = 8,
      lookback: Int = 20): DataFrame = {
    require(k2 >= 1 && minPrev >= 2 && lookback >= minPrev,
      s"need k2>=1, minPrev>=2, lookback>=minPrev; got $k2/$minPrev/$lookback")
    val w = Window.partitionBy("user_id")
      .orderBy(col("timestamp"), col("event_id"))
      .rowsBetween(-lookback, -1)
    // fixed-point rework (r8, the agg_corr discipline): the original
    // DECIMAL(18,6) window sums carried a boxed BigDecimal per frame
    // update — ~2/3 of the query's 1M-event cost. Values quantize to
    // 1e-4 fixed point ONCE (declared operator precision — monitoring
    // metrics, not ledgers; round() HALF_UP matches DuckDB on the
    // never-half products of real doubles), then both window sums are
    // pure codegen'd long adds. Domain: |value| ≤ 50_000 keeps
    // vi² · lookback inside int64 — enforced, not assumed.
    val vi = round(col("value") * 10000).cast("long")
    val n = count(lit(1)).over(w)
    val sv = sum(vi).over(w).cast("double") / 10000.0
    val mean = sv / n
    val varr = (sum(vi * vi).over(w).cast("double") / 100000000.0) / n -
      mean * mean
    val dev = col("value") - mean
    // reported mean in floored MICROS — determinism rule 3: a small
    // exact rational must not go through float round(), which flipped
    // a half-boundary at the 4th decimal between engines on the real
    // data; floor of the identical IEEE chain is bit-stable (the
    // quantizeSummary convention — floor survives engine boundaries
    // where round does not). The verdict chain below is likewise pure
    // IEEE double ops on identical inputs.
    val mean6 = when(n > 0, floor(sv * lit(1000000) / n).cast("long"))
    // domain check rides the emitted value column (a pruned side
    // column would be optimized away): out-of-domain input fails the
    // job rather than silently overflowing the fixed-point square
    val valueChecked = when(abs(col("value")) > 50000,
      raise_error(concat(lit("rollingZScore domain: |value| > 50000: "),
        col("value").cast("string")))).otherwise(col("value"))
    events.select(col("user_id"), col("timestamp").as("ts_us"),
      valueChecked.as("value"),
      col("event_id"), n.cast("long").as("n_prev"),
      mean6.as("mean6"),
      when(n >= minPrev && dev * dev > lit(k2) * varr, 1L)
        .otherwise(0L).as("anomaly"))
  }
}
