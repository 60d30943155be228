package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sources.{FileSources, Warc}

/** Interchange-format surface: JSONL and CSV write→read round trips
  * over the real tables, gated against the source parquet — proving
  * the sink/source pair preserves every column bit-exactly (types
  * pinned by explicit read schemas, quoting/escaping exercised by the
  * JSON-string `props` column) — plus WARC crawl ingest
  * ([[graft.sources.Warc]]): the fixture builder shards `documents`
  * into deterministic crawl files (request+response records, gzip
  * members on odd files, a planted malformed tail on every 13th), and
  * the gates replay the generative arithmetic closed-form, mm_png
  * style — the parser's framing walk, gunzip, HTTP parse and byte
  * accounting must all reproduce the documents table exactly.
  */
object SourcesSurface {

  /** robots-noindex detector, byte-identical in both engines (the
    * stripHtml precedent: one regex, two engines, same body). */
  private val NoindexRe = "<meta[^>]*name=\"robots\"[^>]*noindex"

  private def warcRecords(s: SparkSession, dir: String): DataFrame =
    Warc.records(Warc.filesFromDocuments(Tables.load(s, dir, "documents")))

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
    // per-response-record extraction: url/status/mime/byte-accounting
    // and the exact UTF-8 body — the walk + gunzip + HTTP parse must
    // reproduce every document byte-for-byte
    "warc_extract" -> ((s, dir) =>
      warcRecords(s, dir).filter(col("rec_type") === "response")
        .select(substring_index(col("url"), "/", -1).cast("long").as("doc_id"),
          col("url"), col("http_status"), col("content_mime"),
          col("body_bytes"), col("body"))),
    // per-file record census incl. the planted malformed tails — locks
    // the record-type dispatch and the walk-stops-don't-fail contract
    "warc_stats" -> ((s, dir) =>
      warcRecords(s, dir).groupBy("file_id").agg(
        count(lit(1)).as("n_records"),
        sum(when(col("rec_type") === "response", 1L).otherwise(0L))
          .as("n_response"),
        sum(when(col("rec_type") === "request", 1L).otherwise(0L))
          .as("n_request"),
        sum(when(col("rec_type") === "malformed", 1L).otherwise(0L))
          .as("n_malformed"),
        sum(when(col("rec_type") === "revisit", 1L).otherwise(0L))
          .as("n_revisit"),
        sum(when(col("rec_type") === "response", col("body_bytes"))
          .otherwise(0L)).as("response_bytes"))),
    // the crawl→text head of the corpus pipeline: successful HTML
    // responses through the gated tag-stripper — both engines strip
    // the same reconstructed page
    "pipeline_warc_text" -> ((s, dir) =>
      warcRecords(s, dir)
        .filter(col("rec_type") === "response" &&
          col("http_status") === 200 && col("content_mime") === "text/html" &&
          !col("body").rlike(NoindexRe))
        .select(substring_index(col("url"), "/", -1).cast("long").as("doc_id"),
          graft.ops.Html.stripHtml(col("body")).as("text"))),
    // outlink extraction from the parsed pages: the same regexp +
    // canonical-url chain as text_html_links, fed by crawl bodies —
    // extracted provenance joins the url-grain dedup/mixing keys
    "warc_links" -> ((s, dir) =>
      warcRecords(s, dir)
        .filter(col("rec_type") === "response" &&
          col("content_mime") === "text/html")
        .select(substring_index(col("url"), "/", -1).cast("long").as("doc_id"),
          col("body"))
        .select(col("doc_id"), explode(expr(
          """regexp_extract_all(body, '<a[^>]*href="([^"]*)"', 1)""")).as("url"))
        .select(col("doc_id"), col("url"),
          graft.ops.UrlCanon.canonical(col("url")).as("url_canon"),
          graft.ops.UrlCanon.host(col("url")).as("host"))),
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
    "warc_extract" ->
      (warcBodyCte +
      """SELECT doc_id,
        |  'https://crawl.invalid/' || source || '/' || CAST(doc_id AS VARCHAR) AS url,
        |  CAST(status AS BIGINT) AS http_status, mime AS content_mime,
        |  body_bytes, body
        |FROM b""".stripMargin),
    "warc_stats" ->
      (warcBodyCte +
      """, g AS (SELECT doc_id % 32 AS file_id, count(*) AS n_docs,
        |  sum(CASE WHEN doc_id % 31 = 13 THEN 1 ELSE 0 END) AS n_rev,
        |  sum(body_bytes) AS rb
        |FROM b GROUP BY 1)
        |SELECT file_id,
        |  CAST(n_docs * 2 + n_rev + CASE WHEN file_id % 13 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_records,
        |  CAST(n_docs AS BIGINT) AS n_response,
        |  CAST(n_docs AS BIGINT) AS n_request,
        |  CAST(CASE WHEN file_id % 13 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_malformed,
        |  CAST(n_rev AS BIGINT) AS n_revisit,
        |  CAST(rb AS BIGINT) AS response_bytes
        |FROM g""".stripMargin),
    "pipeline_warc_text" ->
      (warcBodyCte + "SELECT doc_id, " +
        graft.ops.Html.stripHtmlSql("body") +
        " AS text FROM b WHERE status = 200 AND mime = 'text/html'" +
        s" AND NOT regexp_matches(body, '$NoindexRe')"),
    "warc_links" ->
      (warcBodyCte +
        """, lk AS (SELECT doc_id, unnest(regexp_extract_all(body,
          |    '<a[^>]*href="([^"]*)"', 1)) AS url
          |  FROM b WHERE mime = 'text/html'),
          |""".stripMargin +
        graft.ops.UrlCanon.canonChainSql("lk") +
        "\nSELECT doc_id, url, url_canon, host FROM canon"),
  )

  /** Closed-form replay of [[graft.sources.Warc]]'s fixture
    * arithmetic — the decoded response body, status, mime, and exact
    * raw byte count per doc. The latin-1 branch (doc_id % 19 = 5 over
    * pure-ASCII text: strlen = length) appends one non-ASCII char and
    * encodes single-byte, so its byte count is the CHARACTER count;
    * chunked transfer (doc_id % 23 = 7) is invisible here — the gate
    * passing IS the proof the parser de-chunked to the identity. */
  private def warcBodyCte: String =
    ("""WITH m AS (SELECT doc_id, source,
      |  doc_id % 19 = 5 AND strlen(text) = length(text) AS is_latin,
      |  doc_id % 11 = 3 AS is_plain,
      |  CASE WHEN doc_id % 19 = 5 AND strlen(text) = length(text)
      |       THEN text || '""".stripMargin + "\u00e9" + """' ELSE text END AS t2
      |FROM documents),
      |h AS (SELECT doc_id, source, is_latin, is_plain,
      |  CASE WHEN is_plain THEN t2
      |       ELSE '<html><head><title>Doc</title>'
      |         || CASE WHEN doc_id % 29 = 11
      |              THEN '<meta name="robots" content="noindex">' ELSE '' END
      |         || '</head><body><p>' || t2 || '</p><a href="https://crawl.invalid/'
      |         || source || '/' || CAST(doc_id + 17 AS VARCHAR)
      |         || '">next</a></body></html>' END AS body
      |FROM m),
      |b AS (SELECT doc_id, source, body,
      |  CAST(CASE WHEN is_latin THEN length(body)
      |            ELSE strlen(body) END AS BIGINT) AS body_bytes,
      |  CASE WHEN doc_id % 17 = 0 THEN 404 ELSE 200 END AS status,
      |  CASE WHEN is_plain THEN 'text/plain' ELSE 'text/html' END AS mime
      |FROM h)
      |""".stripMargin)
}
