package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.TsCatalog
import graft.engine.{ExecResult, StatementExecutor}
import graft.core.Tables

/** End-to-end dialect coverage for the correctness gate: each query is a
  * dialect STRING that runs through Lexer → Parser → StatementExecutor →
  * DataFrame plan against a series ingested from the driver's `events`
  * table, then hash-compares against DuckDB oracle SQL. This locks the
  * whole pipeline (grammar, plan building, catalog layout, bucket
  * pruning), not just the operators.
  *
  * The series is ingested in epoch-MICROS (the engine is unit-agnostic
  * over Long timestamps; micros is what the DuckDB oracle can see —
  * see RefSurface). Timestamps appear as integer literals in the
  * dialect text, which pass through raw (reference
  * src/statement_execute.c:182-183). Nanos-specific surface (date
  * literals, spans, now()) is locked by ExecutorSpec instead.
  */
object TsqlSurface {

  private val T0 = 1704500000000000L // epoch-micros
  private val T1 = 1705500000000000L
  private val HOUR_US = 3600000000L

  private val initialized = scala.collection.mutable.Set[String]()

  /** Ingest events into a tsql-engine series once per (JVM, sfDir). */
  private def executor(spark: SparkSession, sfDir: String): StatementExecutor = synchronized {
    val safe = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val root = sys.props("java.io.tmpdir") + s"/graft_tsql_$safe"
    // 1-DAY buckets in MICROS: the events table is a month of sparse
    // data (~3 points/900s), where chunk-width buckets would mean ~2900
    // partition dirs and a commit-protocol-bound write (measured 37s vs
    // ~2s for 100k rows). Bucket width is a per-series knob that must
    // match data density; range pruning still skips whole days.
    val catalog = new TsCatalog(spark, root, bucketNs = 86400L * 1000000L)
    val exec = new StatementExecutor(spark, catalog)
    if (!initialized.contains(root)) {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      exec.executeSql("CREATEDB metrics")
      exec.executeSql("USE metrics")
      exec.executeSql("CREATE ev")
      catalog.insert("metrics", "ev",
        Tables.eventSeries(spark, sfDir).select("timestamp", "value"))
      initialized += root
    } else {
      exec.executeSql("USE metrics")
    }
    exec
  }

  private val initializedNs = scala.collection.mutable.Set[String]()

  /** Second engine root with the series ingested at FULL NANOS (raw
    * `ts`, the reference's native time model) and 1-day buckets in the
    * nanos domain — the surface that exercises date literals, span
    * literals and plan-time `+` folding end-to-end (reference
    * tests/statement_test.c:257-313, timeutil.c:50-133). The micros
    * root above stays oracle-comparable on raw timestamps; THIS one is
    * gated through aggregate outputs only, because DuckDB truncates
    * TIMESTAMP(NANOS) to micros: range bounds that are multiples of
    * 1000 ns filter identically in both domains (floor division), so
    * avg/sample aggregates match exactly while raw nanos timestamps
    * could not. */
  private def executorNs(spark: SparkSession, sfDir: String): StatementExecutor = synchronized {
    val safe = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val root = sys.props("java.io.tmpdir") + s"/graft_tsql_ns_$safe"
    val catalog = new TsCatalog(spark, root, bucketNs = 86400L * 1000000000L)
    val exec = new StatementExecutor(spark, catalog)
    if (!initializedNs.contains(root)) {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      exec.executeSql("CREATEDB metrics")
      exec.executeSql("USE metrics")
      exec.executeSql("CREATE ev")
      val ev = Tables.load(spark, sfDir, "events")
      catalog.insert("metrics", "ev",
        ev.select(Tables.tsNanos(ev).as("timestamp"),
          org.apache.spark.sql.functions.col("value")))
      initializedNs += root
    } else {
      exec.executeSql("USE metrics")
    }
    exec
  }

  private def runOn(exec: StatementExecutor, sql: String): DataFrame =
    exec.executeSql(sql) match {
      case ExecResult.Rows(df) => df
      case ExecResult.Scalar(df) => df
      case other => throw new IllegalStateException(s"query '$sql' => $other")
    }

  private def q(sql: String): (SparkSession, String) => DataFrame =
    (s, dir) => runOn(executor(s, dir), sql)

  private def qNs(sql: String): (SparkSession, String) => DataFrame =
    (s, dir) => runOn(executorNs(s, dir), sql)

  private val EV =
    "WITH ev AS (SELECT epoch_us(ts) AS timestamp, value FROM events) "

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tsql_scan" -> q("SELECT value FROM ev"),
    "tsql_range" -> q(s"SELECT value FROM ev BETWEEN $T0 AND $T1"),
    "tsql_min" -> q(s"SELECT min(value) FROM ev BETWEEN $T0 AND $T1"),
    "tsql_max" -> q(s"SELECT max(value) FROM ev BETWEEN $T0 AND $T1"),
    "tsql_avg" -> q(s"SELECT avg(value) FROM ev BETWEEN $T0 AND $T1"),
    "tsql_latest" -> q(s"SELECT latest(value) FROM ev BETWEEN $T0 AND $T1"),
    "tsql_earliest" -> q("SELECT earliest(value, 20) FROM ev"),
    "tsql_sample_by" -> q(
      s"SELECT value FROM ev BETWEEN $T0 AND $T1 SAMPLE BY $HOUR_US"),
    "tsql_where" -> q(
      s"SELECT value FROM ev WHERE value > 50 AND value <= 150 AND timestamp > $T0"),
    "tsql_where_or" -> q(
      s"SELECT value FROM ev WHERE value > 240 AND timestamp > $T0 OR value < 3"),
    "tsql_limit" -> q("SELECT value FROM ev LIMIT 100"),
    "tsql_sample_min" -> q(
      s"SELECT min(value) FROM ev BETWEEN $T0 AND $T1 SAMPLE BY $HOUR_US"),
    "tsql_sample_latest" -> q(
      s"SELECT latest(value) FROM ev BETWEEN $T0 AND $T1 SAMPLE BY $HOUR_US"),
    // dialect-extension counter selectors, end-to-end through the
    // parser (SeriesOps.sampleByFn "delta"/"rate" under the hood)
    "tsql_sample_delta" -> q(
      s"SELECT delta(value) FROM ev BETWEEN $T0 AND $T1 SAMPLE BY $HOUR_US"),
    "tsql_sample_rate" -> q(
      s"SELECT rate(value) FROM ev BETWEEN $T0 AND $T1 SAMPLE BY $HOUR_US"),
    "tsql_delta" -> q(s"SELECT delta(value) FROM ev BETWEEN $T0 AND $T1"),
    // FILL dialect extension end-to-end: 5-minute buckets over the
    // ranged series leave real gaps for the axis to fill
    "tsql_sample_fill" -> q(
      s"SELECT avg(value) FROM ev BETWEEN $T0 AND $T1 SAMPLE BY 300000000 FILL(prev)"),
    // date-literal + span-literal + plan-time '+' folding, end-to-end
    // over the NANOS-ingested series (see executorNs)
    "tsql_date_avg" -> qNs(
      "SELECT avg(value) FROM ev BETWEEN '2024-01-06' AND '2024-01-06' + 12d"),
    "tsql_date_sample" -> qNs(
      "SELECT avg(value) FROM ev BETWEEN '2024-01-06' AND '2024-01-06' + 12d SAMPLE BY 1d"),
  )

  val oracleSql: Map[String, String] = Map(
    "tsql_scan" ->
      (EV + "SELECT timestamp, value FROM ev ORDER BY timestamp"),
    "tsql_range" ->
      (EV + s"SELECT timestamp, value FROM ev WHERE timestamp BETWEEN $T0 AND $T1 ORDER BY timestamp"),
    "tsql_min" ->
      (EV + s"SELECT timestamp, value FROM ev WHERE timestamp BETWEEN $T0 AND $T1 ORDER BY value ASC, timestamp ASC LIMIT 1"),
    "tsql_max" ->
      (EV + s"SELECT timestamp, value FROM ev WHERE timestamp BETWEEN $T0 AND $T1 ORDER BY value DESC, timestamp ASC LIMIT 1"),
    "tsql_avg" ->
      (EV + s"SELECT round(CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / count(*), 4) AS avg_value, count(*) AS n FROM ev WHERE timestamp BETWEEN $T0 AND $T1"),
    "tsql_latest" ->
      (EV + s"SELECT timestamp, value FROM ev WHERE timestamp BETWEEN $T0 AND $T1 ORDER BY timestamp DESC LIMIT 1"),
    "tsql_earliest" ->
      (EV + "SELECT timestamp, value FROM ev ORDER BY timestamp ASC LIMIT 20"),
    "tsql_sample_by" ->
      (EV + s"SELECT (timestamp - timestamp % $HOUR_US) + $HOUR_US AS sample_ts, round(CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / count(*), 4) AS avg_value, count(*) AS n_points FROM ev WHERE timestamp BETWEEN $T0 AND $T1 GROUP BY 1"),
    "tsql_where" ->
      (EV + s"SELECT timestamp, value FROM ev WHERE value > 50 AND value <= 150 AND timestamp > $T0 ORDER BY timestamp"),
    "tsql_where_or" ->
      (EV + s"SELECT timestamp, value FROM ev WHERE value > 240 AND timestamp > $T0 OR value < 3 ORDER BY timestamp"),
    "tsql_limit" ->
      (EV + "SELECT timestamp, value FROM ev ORDER BY timestamp ASC LIMIT 100"),
    "tsql_sample_min" ->
      (EV + s"SELECT (timestamp - timestamp % $HOUR_US) + $HOUR_US AS sample_ts, min(value) AS min_value, count(*) AS n_points FROM ev WHERE timestamp BETWEEN $T0 AND $T1 GROUP BY 1"),
    "tsql_sample_latest" ->
      (EV + s"SELECT (timestamp - timestamp % $HOUR_US) + $HOUR_US AS sample_ts, arg_max(value, timestamp) AS last_value, count(*) AS n_points FROM ev WHERE timestamp BETWEEN $T0 AND $T1 GROUP BY 1"),
    "tsql_sample_delta" ->
      (EV + s"SELECT (timestamp - timestamp % $HOUR_US) + $HOUR_US AS sample_ts, max({'t': timestamp, 'v': value}).v - min({'t': timestamp, 'v': value}).v AS delta_value, count(*) AS n_points FROM ev WHERE timestamp BETWEEN $T0 AND $T1 GROUP BY 1"),
    "tsql_sample_rate" ->
      (EV + s"SELECT (timestamp - timestamp % $HOUR_US) + $HOUR_US AS sample_ts, (max({'t': timestamp, 'v': value}).v - min({'t': timestamp, 'v': value}).v) * 1000000.0 / CAST(nullif(max(timestamp) - min(timestamp), 0) AS DOUBLE) AS rate_value, count(*) AS n_points FROM ev WHERE timestamp BETWEEN $T0 AND $T1 GROUP BY 1"),
    "tsql_delta" ->
      (EV + s"SELECT max({'t': timestamp, 'v': value}).v - min({'t': timestamp, 'v': value}).v AS delta_value, count(*) AS n FROM ev WHERE timestamp BETWEEN $T0 AND $T1"),
    "tsql_sample_fill" ->
      (EV + s""", agg AS (SELECT (timestamp - timestamp % 300000000) + 300000000 AS sample_ts,
         |    round(CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / count(*), 4) AS avg_value,
         |    count(*) AS n_points
         |  FROM ev WHERE timestamp BETWEEN $T0 AND $T1 GROUP BY 1),
         |b AS (SELECT min(sample_ts) AS lo, max(sample_ts) AS hi FROM agg),
         |axis AS (SELECT unnest(range(lo, hi + 1, 300000000)) AS sample_ts FROM b),
         |j AS (SELECT a.sample_ts, g.avg_value, coalesce(g.n_points, 0) AS n_points
         |  FROM axis a LEFT JOIN agg g USING (sample_ts))
         |SELECT sample_ts,
         |  last_value(avg_value IGNORE NULLS)
         |    OVER (ORDER BY sample_ts ROWS UNBOUNDED PRECEDING) AS fill_value,
         |  n_points FROM j""".stripMargin),
    // '2024-01-06' = 1704499200000000 epoch-micros (UTC); +12d. DuckDB
    // sees the TIMESTAMP(NANOS) column truncated to micros, but the
    // bounds are multiples of 1000 ns so the row set is identical to
    // the engine's nanos-domain filter (no event sits in the 999 ns
    // truncation window above the upper bound — checked in testdata);
    // day-bucket ends map exactly via *1000 since 1d_ns = 1000 * 1d_us.
    "tsql_date_avg" ->
      (EV + "SELECT round(CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / count(*), 4) AS avg_value, count(*) AS n FROM ev WHERE timestamp BETWEEN 1704499200000000 AND 1705536000000000"),
    "tsql_date_sample" ->
      (EV + "SELECT ((timestamp - timestamp % 86400000000) + 86400000000) * 1000 AS sample_ts, round(CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / count(*), 4) AS avg_value, count(*) AS n_points FROM ev WHERE timestamp BETWEEN 1704499200000000 AND 1705536000000000 GROUP BY 1"),
  )
}
