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
    // events through CSV: the raw timestamp goes as epoch-micros LONG
    // (the oracle-facing convention for this column everywhere), the
    // double survives via the writer's shortest-round-trip rendering,
    // and props' embedded quotes exercise quote/escape handling
    "csv_roundtrip" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      FileSources.roundTripCsv(
        ev.select(col("event_id"), Tables.tsMicros(ev).as("ts_us"),
          col("user_id"), col("event_type"), col("value"), col("props")),
        tmp(dir, "csv"))
    }),
    // embeddings through ORC: the array<float> column proves nested
    // types survive the columnar binary round-trip — the shape neither
    // text format gates. The driver's compare hashes scalar cells, so
    // the array itself is gated through an order-sensitive per-row
    // fingerprint (fixed-point 1e-6 floor of every element — float→
    // double is exact and floor is engine-stable, the scale6/err6
    // convention) plus the element count; any byte corruption or
    // element reorder in the round trip changes the md5.
    "orc_roundtrip" -> ((s, dir) => {
      val rt = FileSources.roundTripOrc(
        Tables.load(s, dir, "embeddings")
          .select("vec_id", "embedding", "label"),
        tmp(dir, "orc"))
      rt.select(col("vec_id"), col("label"),
        size(col("embedding")).cast("long").as("n_dims"),
        md5(concat_ws(",", transform(col("embedding"),
          x => floor(x.cast("double") * 1000000).cast("long").cast("string"))))
          .as("emb_fp"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "jsonl_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "csv_roundtrip" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
        |  value, props FROM events""".stripMargin,
    "orc_roundtrip" ->
      """SELECT vec_id, label, len(embedding) AS n_dims,
        |  md5(array_to_string(list_transform(embedding,
        |    x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR)),
        |    ',')) AS emb_fp
        |FROM embeddings""".stripMargin,
  )
}
