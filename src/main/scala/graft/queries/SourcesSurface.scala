package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sources.FileSources

/** Interchange-format surface: JSONL and CSV write→read round trips
  * over the real tables, gated against the source parquet — proving
  * the sink/source pair preserves every column bit-exactly (types
  * pinned by explicit read schemas, quoting/escaping exercised by the
  * JSON-string `props` column).
  */
object SourcesSurface {

  /** Scratch dir for the round-trip artifacts: per-sf-dir so runs at
    * different scale factors never collide, overwritten per run so the
    * gate is idempotent. */
  private def tmp(dir: String, fmt: String): String =
    new java.io.File(new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_rt_${Integer.toHexString(dir.hashCode)}"), fmt)
      .getAbsolutePath

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "jsonl_roundtrip" -> ((s, dir) =>
      FileSources.roundTripJsonl(
        Tables.load(s, dir, "documents")
          .select("doc_id", "text", "lang", "source", "n_chars"),
        tmp(dir, "jsonl"))),
    // events through CSV: the ns timestamp goes as epoch-micros LONG
    // (the oracle-facing convention for this column everywhere), the
    // double survives via the writer's shortest-round-trip rendering,
    // and props' embedded quotes exercise quote/escape handling
    "csv_roundtrip" -> ((s, dir) =>
      FileSources.roundTripCsv(
        Tables.load(s, dir, "events")
          .select(col("event_id"), expr("ts div 1000").as("ts_us"),
            col("user_id"), col("event_type"), col("value"), col("props")),
        tmp(dir, "csv"))),
  )

  val oracleSql: Map[String, String] = Map(
    "jsonl_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "csv_roundtrip" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
        |  value, props FROM events""".stripMargin,
  )
}
