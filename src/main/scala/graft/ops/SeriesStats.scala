package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Series diagnostics beyond point aggregates — the operators a
  * monitoring surface grows after SAMPLE BY and rolling windows:
  * autocorrelation (is this series periodic / how fast does it decay),
  * robust rolling MAD anomalies (median-based, so a level shift does
  * not poison the detector the way win_anomaly's mean/stddev ring is),
  * and Prometheus-class histogram quantiles (bucketed percentile
  * estimation — the only quantile shape that merges across scrapes).
  *
  * Hash-gate discipline (docs/PLANS.md "decimal moments → long sums"):
  * every cross-row accumulation is INTEGER (fixed-point quantization at
  * ingest, hi/lo split so products never overflow int64 at 100 TB row
  * counts), and the final floating chain is emitted from ONE shared SQL
  * text (`expr(...)` on the Spark side, embedded verbatim in the DuckDB
  * oracle) so both engines execute the identical IEEE op sequence.
  */
object SeriesStats {

  /** Sample autocorrelation per series at lags 1..maxLag, one output
    * row per user: lag products/sums accumulate as 1e-2 fixed-point
    * longs, then one shared double chain computes the formula below.
    *
    * INPUT CONTRACT: `value` must be NON-NEGATIVE with v ≤ 5e4 (the
    * events fixture is U[0,560)). Non-negativity is load-bearing, not
    * incidental: the hi/lo split uses Spark `div` (truncating) on one
    * side and DuckDB `//` (flooring) on the other, which agree ONLY
    * when every product vi·l_k ≥ 0 — a signed series would make the
    * two engines disagree on negative cross-products. The magnitude
    * bound then gives vi ≤ 5e6, vi² ≤ 2.5e13, and the div/mod-1e6
    * split keeps both partial sums under int64 past 1e11 rows per
    * series. Callers with signed series must re-center to ≥ 0 first
    * (acf is shift-invariant: acf(v+c) = acf(v)).
    *
    *   acf_k = (Σxy/n_k − x̄·Σx/n_k − x̄·Σy/n_k + x̄²) / var
    *
    * floored at 1e-6. ONE keyed window pass (maxLag lag columns) +
    * ONE grouped aggregation — no self-join, no collect. */
  def acf(ev: DataFrame, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 8, s"maxLag in [1,8], got $maxLag")
    val w = Window.partitionBy("user_id")
      .orderBy(col("timestamp").asc, col("event_id").asc)
    val base = ev.select(col("user_id"), col("timestamp"), col("event_id"),
      round(col("value") * 100).cast("long").as("vi"))
    val withLags = (1 to maxLag).foldLeft(base) { (d, k) =>
      d.withColumn(s"l$k", lag(col("vi"), k).over(w))
    }
    val aggs = Seq(
      count(lit(1)).as("n"), sum(col("vi")).as("sv"),
      sum(expr("(vi * vi) div 1000000")).as("hxx"),
      sum(expr("(vi * vi) % 1000000")).as("lxx")) ++
      (1 to maxLag).flatMap { k =>
        Seq(
          count(col(s"l$k")).as(s"n$k"),
          sum(expr(s"(vi * l$k) div 1000000")).as(s"h$k"),
          sum(expr(s"(vi * l$k) % 1000000")).as(s"lo$k"),
          sum(when(col(s"l$k").isNotNull, col("vi"))).as(s"sx$k"),
          sum(col(s"l$k")).as(s"sy$k"))
      }
    val g = withLags.groupBy("user_id").agg(aggs.head, aggs.tail: _*)
    val out = Seq(col("user_id"), col("n")) ++
      (1 to maxLag).flatMap { k =>
        Seq(col(s"n$k").cast("long").as(s"n$k"),
          expr(acfFormulaSql(k)).as(s"acf6_$k"))
      }
    g.select(out: _*)
  }

  /** The shared final chain for lag k — identical text runs in Spark's
    * `expr` and inside the DuckDB oracle, so every IEEE double step
    * matches bit-for-bit before the floor. */
  def acfFormulaSql(k: Int): String = {
    val mean = "(CAST(sv AS DOUBLE) / 100.0 / n)"
    val vr = s"((CAST(hxx AS DOUBLE) * 1000000.0 + CAST(lxx AS DOUBLE)) / 10000.0 / n - $mean * $mean)"
    val cov = s"((CAST(h$k AS DOUBLE) * 1000000.0 + CAST(lo$k AS DOUBLE)) / 10000.0 / n$k" +
      s" - $mean * (CAST(sx$k AS DOUBLE) / 100.0 / n$k)" +
      s" - $mean * (CAST(sy$k AS DOUBLE) / 100.0 / n$k)" +
      s" + $mean * $mean)"
    s"CASE WHEN n$k > 0 AND $vr > 0 THEN CAST(floor($cov / $vr * 1000000) AS BIGINT) END"
  }

  /** Oracle-side rendering of [[acf]]: the same integer accumulation
    * (`//` ≡ Spark `div` — equivalence REQUIRES the non-negative input
    * contract stated on [[acf]]; floor and truncate diverge on negative
    * products) and the same [[acfFormulaSql]] text verbatim. */
  def acfOracleSql(maxLag: Int = 3): String = {
    val lagCols = (1 to maxLag).map(k =>
      s"lag(vi, $k) OVER (PARTITION BY user_id ORDER BY timestamp, event_id) AS l$k")
      .mkString(",\n    ")
    val sums = (1 to maxLag).map(k =>
      s"""count(l$k) AS n$k, sum((vi * l$k) // 1000000) AS h$k,
         |    sum((vi * l$k) % 1000000) AS lo$k,
         |    sum(CASE WHEN l$k IS NOT NULL THEN vi END) AS sx$k, sum(l$k) AS sy$k""".stripMargin)
      .mkString(",\n    ")
    val out = (1 to maxLag).map(k =>
      s"CAST(n$k AS BIGINT) AS n$k, ${acfFormulaSql(k)} AS acf6_$k").mkString(",\n  ")
    s"""v AS (SELECT user_id, timestamp, event_id,
       |    CAST(round(value * 100) AS BIGINT) AS vi FROM ev),
       |lg AS (SELECT user_id, vi,
       |    $lagCols
       |  FROM v),
       |g AS (SELECT user_id, count(*) AS n, sum(vi) AS sv,
       |    sum((vi * vi) // 1000000) AS hxx, sum((vi * vi) % 1000000) AS lxx,
       |    $sums
       |  FROM lg GROUP BY 1)
       |SELECT user_id, n,
       |  $out
       |FROM g""".stripMargin
  }

  /** Rolling median/MAD robust anomaly over the trailing `frame`
    * observations (current row inclusive): med and mad are exact
    * order-statistics of the frame ((lo+hi)/2 — one IEEE add + halve,
    * identical both engines), the anomaly verdict is
    * |value − med| > k·mad once the frame has ≥ minN points.
    * Frame-bounded state (≤ frame doubles per row); ONE keyed window. */
  def rollingMad(ev: DataFrame, frame: Int = 20, k: Int = 3,
      minN: Int = 9): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("timestamp").asc, col("event_id").asc)
      .rowsBetween(-(frame - 1), Window.currentRow)
    ev.select(col("user_id"), col("timestamp"), col("event_id"), col("value"))
      .withColumn("vals", collect_list(col("value")).over(w))
      .withColumn("med", expr(
        "(element_at(array_sort(vals), cast((size(vals) + 1) div 2 as int)) + " +
          "element_at(array_sort(vals), cast(size(vals) div 2 + 1 as int))) / 2"))
      .withColumn("devs", expr("array_sort(transform(vals, v -> abs(v - med)))"))
      .withColumn("mad", expr(
        "(element_at(devs, cast((size(devs) + 1) div 2 as int)) + " +
          "element_at(devs, cast(size(devs) div 2 + 1 as int))) / 2"))
      .withColumn("anomaly", expr(
        s"CASE WHEN size(vals) >= $minN AND abs(value - med) > $k * mad " +
          "THEN 1 ELSE 0 END").cast("long"))
      .drop("vals", "devs")
  }

  /** Oracle twin of [[rollingMad]] in DuckDB's list dialect — same
    * sorted-frame order statistics, same |v−med| devs, same verdict. */
  def rollingMadOracleSql(frame: Int = 20, k: Int = 3, minN: Int = 9): String =
    s"""SELECT user_id, timestamp, event_id, value, med, mad,
       |  CAST(CASE WHEN len(ls) >= $minN AND abs(value - med) > $k * mad
       |    THEN 1 ELSE 0 END AS BIGINT) AS anomaly
       |FROM (SELECT user_id, timestamp, event_id, value, ls, med,
       |    (ds[(len(ds) + 1) // 2] + ds[len(ds) // 2 + 1]) / 2 AS mad
       |  FROM (SELECT user_id, timestamp, event_id, value, ls, med,
       |      list_sort([abs(v - med) FOR v IN ls]) AS ds
       |    FROM (SELECT user_id, timestamp, event_id, value, ls,
       |        (list_sort(ls)[(len(ls) + 1) // 2] + list_sort(ls)[len(ls) // 2 + 1]) / 2 AS med
       |      FROM (SELECT user_id, timestamp, event_id, value,
       |          list(value) OVER (PARTITION BY user_id ORDER BY timestamp, event_id
       |            ROWS BETWEEN ${frame - 1} PRECEDING AND CURRENT ROW) AS ls
       |        FROM ev))))""".stripMargin

  /** Prometheus-class bucket boundaries (upper bounds, `le`) for the
    * events value domain — ONE definition feeds the Spark CASE, the
    * oracle CASE and the interpolation bounds. */
  val HistBounds: Seq[Double] =
    Seq(1.0, 2.5, 5.0, 10.0, 25.0, 50.0, 100.0, 250.0, 500.0, 1000.0)

  /** `value → bucket index` as shared CASE text (first bound the value
    * is ≤; values past the last bound take the overflow index). */
  def bucketCaseSql: String =
    HistBounds.zipWithIndex
      .map { case (b, i) => s"WHEN value <= $b THEN $i" }
      .mkString("CASE ", " ", s" ELSE ${HistBounds.size} END")

  private def boundCase(sel: Int => Double): String =
    (0 to HistBounds.size).map(i => s"WHEN $i THEN ${sel(i)}")
      .mkString("CASE bucket ", " ", " END")

  /** histogram_quantile(0.9) interpolation over the winning bucket:
    * q = lo + (hi − lo) · (rank − cum_before)/cnt, rank the INTEGER
    * ceil(9·total/10) (no float quantile position). The overflow
    * bucket clamps hi = lo (Prometheus returns the highest finite
    * bound there). */
  def interpSql: String = {
    val lo = boundCase(i => if (i == 0) 0.0 else HistBounds(i - 1))
    val hi = boundCase(i => if (i == HistBounds.size) HistBounds.last else HistBounds(i))
    s"($lo) + (($hi) - ($lo)) * (CAST(rank - cb AS DOUBLE) / CAST(cnt AS DOUBLE))"
  }

  /** Per-hour p90 via bucketed histogram — the quantile shape that
    * MERGES: bucket counts are plain sums, so per-scrape partials
    * combine associatively at any fan-in (unlike exact order
    * statistics). Plan: one grouped count on (hour, bucket) — the only
    * data-sized shuffle, ≤ |buckets| rows per hour after it — then
    * windows over the tiny (hour, bucket) grid. */
  def histogramQuantile(ev: DataFrame): DataFrame =
    quantileFromGrid(histogramGrid(ev))

  /** The data-sized half: per-(hour, bucket) counts. This is the part
    * that runs EITHER as a batch aggregation or as streaming state —
    * bucket counts are plain sums, mergeable across micro-batches, ≤
    * |buckets| longs per open window. */
  def histogramGrid(ev: DataFrame): DataFrame = {
    val hourUs = 3600000000L
    ev.select(((col("timestamp") - pmod(col("timestamp"), lit(hourUs))))
        .as("hour_ts"),
      expr(bucketCaseSql).as("bucket"))
      .groupBy("hour_ts", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** The grid-sized half: rank selection + interpolation over the
    * (hour, bucket) grid — windows partition per hour, never
    * globally. */
  def quantileFromGrid(grid: DataFrame): DataFrame = {
    val wTot = Window.partitionBy("hour_ts")
    val wCum = Window.partitionBy("hour_ts").orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("total", sum(col("cnt")).over(wTot))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("rank", expr("(9 * total + 9) div 10"))
      .withColumn("cb", col("cum") - col("cnt"))
      .filter(col("cum") >= col("rank") && col("cb") < col("rank"))
      .select(col("hour_ts"), col("total"), col("bucket").cast("long").as("bucket"),
        expr(interpSql).as("p90"))
  }

  /** Oracle twin of [[histogramQuantile]] — same CASE texts, same
    * integer rank, same interpolation text. Expects an `ev` CTE. */
  def histogramQuantileOracleSql: String =
    s"""b AS (SELECT (timestamp - timestamp % 3600000000) AS hour_ts,
       |    $bucketCaseSql AS bucket FROM ev),
       |g AS (SELECT hour_ts, bucket, count(*) AS cnt FROM b GROUP BY 1, 2),
       |c AS (SELECT hour_ts, bucket, cnt,
       |    sum(cnt) OVER (PARTITION BY hour_ts) AS total,
       |    sum(cnt) OVER (PARTITION BY hour_ts ORDER BY bucket
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM g),
       |r AS (SELECT hour_ts, bucket, cnt, total, cum,
       |    (9 * total + 9) // 10 AS rank, cum - cnt AS cb FROM c)
       |SELECT hour_ts, CAST(total AS BIGINT) AS total,
       |  CAST(bucket AS BIGINT) AS bucket, $interpSql AS p90
       |FROM r WHERE cum >= rank AND cb < rank""".stripMargin
}
