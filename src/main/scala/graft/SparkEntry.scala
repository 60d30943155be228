package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsSurface, RefSurface, SimilaritySurface, SourcesSurface, StreamSurface, TextSurface, TsqlSurface}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory lives in graft.queries.*; each module pairs Spark
  * DataFrame plans with DuckDB oracle SQL over the same parquet tables.
  */
object SparkEntry {

  private def modules = Seq(
    (RefSurface.queries, RefSurface.oracleSql),
    (TsqlSurface.queries, TsqlSurface.oracleSql),
    (TextSurface.queries, TextSurface.oracleSql),
    (SimilaritySurface.queries, SimilaritySurface.oracleSql),
    (AnalyticsSurface.queries, AnalyticsSurface.oracleSql),
    (StreamSurface.queries, StreamSurface.oracleSql),
    (SourcesSurface.queries, SourcesSurface.oracleSql),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("ts_sample_by")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.flatMap(_._1)
    require(all.size == all.map(_._1).distinct.size,
      "duplicate query keys across modules would silently drop gate queries: " +
        all.groupBy(_._1).collect { case (k, v) if v.size > 1 => k }.mkString(", "))
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_._2).toMap
}
