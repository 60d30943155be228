package graft.sources

import java.io.ByteArrayInputStream
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC ingestion — the web-crawl container format (ISO 28500; the
  * layout Common Crawl distributes) that a web-scale text corpus
  * arrives in before any of the text/dedup/quality operators can run.
  * The reference's surface has no crawl ingest at all (its sources
  * stop at its own wire protocol, src/server.c); this is part of the
  * LLM-data extension tier, built like the multimodal decoders
  * (ops/Multimodal.scala): a real zero-dependency parser over opaque
  * binary payloads, row-local mapPartitions, zero shuffle, row-level
  * malformed tolerance.
  *
  * Supported: WARC/1.0 framing (version line, CRLF headers,
  * Content-Length-delimited block, CRLF CRLF separator), response and
  * request record types, `application/http` payload parsing (status
  * line, headers, entity body), and the Common Crawl compression
  * layout — each record its own gzip member, members concatenated
  * (one GZIPInputStream pass reads the whole file: Java's
  * implementation walks concatenated members natively).
  *
  * Malformed tolerance is per FILE TAIL, not per job: a record that
  * fails to frame (bad version line, missing/invalid Content-Length,
  * truncated body) ends that file's walk with one `malformed` row —
  * after a framing error there is no trustworthy resync point inside
  * the member stream — while every record already parsed stays. A
  * malformed file can never fail the task.
  *
  * Scale shape: one input row per crawl file, records exploded
  * row-locally (flatMap — no shuffle, no state); a 100 TB crawl
  * parallelizes per file exactly like the production readers. Memory
  * is bounded by one decompressed file per task (crawl files are
  * ~1 GiB by convention — the same per-task bound every WARC reader
  * carries).
  */
object Warc {

  /** One parsed record. `rec_type` is `response`/`request`/
    * `malformed`; non-response rows carry -1/null for the HTTP
    * fields (the multimodal -1 convention). `body` is the entity
    * body decoded as UTF-8; `body_bytes` its exact byte length. */
  final case class WarcRecord(
      file_id: Long,
      rec_type: String,
      url: String,
      http_status: Long,
      content_mime: String,
      body_bytes: Long,
      body: String)

  // ---- fixture builder (deterministic, from the documents table) ----

  /** Number of synthetic crawl files the fixture shards into. */
  val NFiles = 32L

  /** Deterministic WARC fixture: shard `documents` into [[NFiles]]
    * crawl files (`file_id = doc_id % NFiles`), one request + one
    * response record per doc in doc_id order. Odd files use the
    * Common Crawl layout (gzip member per record); even files are
    * plain. Every 13th file carries a trailing non-WARC garbage
    * record — the malformed-tail case, planted OUTSIDE the document
    * set so the closed-form oracle stays exact. The generative
    * arithmetic (status 404 on doc_id % 17 = 0, text/plain on
    * doc_id % 11 = 3, the HTML wrapper) is replayed by the gate
    * oracles, mm_png-style.
    *
    * Output: (file_id, payload binary). */
  def filesFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .groupByKey(_._1 % NFiles)
      .mapGroups { (fileId, it) =>
        val out = new ByteArrayOutputStream()
        val gz = fileId % 2 == 1
        // fixture files are small (docs/NFiles records); sorting the
        // group in memory is builder-side determinism, not an
        // operator-path collect
        it.toArray.sortBy(_._1).foreach { case (docId, text, source) =>
          writeMember(out, requestRecord(docId, source), gz)
          writeMember(out, responseRecord(docId, text, source), gz)
        }
        if (fileId % 13 == 0)
          writeMember(out, "NOT-A-WARC-RECORD\r\n".getBytes(UTF_8), gz)
        (fileId, out.toByteArray)
      }
      .toDF("file_id", "payload")
  }

  private[sources] def writeMember(out: ByteArrayOutputStream, rec: Array[Byte],
      gz: Boolean): Unit =
    if (gz) {
      val g = new GZIPOutputStream(out)
      g.write(rec); g.finish(); g.close()
    } else out.write(rec)

  private[sources] def urlOf(docId: Long, source: String): String =
    s"https://crawl.invalid/$source/$docId"

  private[sources] def htmlOf(text: String): String =
    s"<html><head><title>Doc</title></head><body><p>$text</p></body></html>"

  private[sources] def responseRecord(docId: Long, text: String,
      source: String): Array[Byte] = {
    val body =
      (if (docId % 11 == 3) text else htmlOf(text)).getBytes(UTF_8)
    val status = if (docId % 17 == 0) "404 Not Found" else "200 OK"
    val mime = if (docId % 11 == 3) "text/plain" else "text/html"
    val http = (s"HTTP/1.1 $status\r\n" +
      s"Content-Type: $mime; charset=utf-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8) ++ body
    record("response", docId, source, "application/http; msgtype=response",
      http)
  }

  private[sources] def requestRecord(docId: Long, source: String): Array[Byte] = {
    val http = (s"GET /$source/$docId HTTP/1.1\r\n" +
      "Host: crawl.invalid\r\n\r\n").getBytes(UTF_8)
    record("request", docId, source, "application/http; msgtype=request",
      http)
  }

  private def record(tpe: String, docId: Long, source: String,
      contentType: String, block: Array[Byte]): Array[Byte] =
    (s"WARC/1.0\r\n" +
      s"WARC-Type: $tpe\r\n" +
      f"WARC-Record-ID: <urn:uuid:$docId%032d>\r\n" +
      "WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      s"WARC-Target-URI: ${urlOf(docId, source)}\r\n" +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n").getBytes(UTF_8) ++
      block ++ "\r\n\r\n".getBytes(UTF_8)

  // ---- parser ----

  /** Parse every record of every crawl file: one flatMap, no shuffle.
    * Input must have (file_id long, payload binary). */
  def records(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("file_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (fileId, payload) => parseFile(fileId, payload) }
      .toDF()
  }

  /** Whole-file record walk; gunzips the member stream first when the
    * payload leads with the gzip magic. */
  private[sources] def parseFile(fileId: Long,
      payload: Array[Byte]): Seq[WarcRecord] = {
    val (bytes, gzError) =
      if (payload.length >= 2 && (payload(0) & 0xff) == 0x1f &&
          (payload(1) & 0xff) == 0x8b)
        gunzipAll(payload)
      else (payload, false)
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    var endedMalformed = false
    while (pos < bytes.length) {
      parseRecord(fileId, bytes, pos) match {
        case Some((rec, next)) => out += rec; pos = next
        case None =>
          out += malformed(fileId); endedMalformed = true; pos = bytes.length
      }
    }
    // a gzip stream error (corrupt header, truncated member) keeps
    // every record decompressed before it and records the tail loss as
    // one malformed row — unless the partial walk already did
    if (gzError && !endedMalformed) out += malformed(fileId)
    out.result()
  }

  private def malformed(fileId: Long): WarcRecord =
    WarcRecord(fileId, "malformed", null, -1L, null, -1L, null)

  /** Decompress the concatenated-member stream; on a stream error
    * (corrupt header, truncated member, bad CRC) returns everything
    * decompressed so far plus the error flag — a damaged tail must
    * not drop the file's intact leading records. */
  private def gunzipAll(payload: Array[Byte]): (Array[Byte], Boolean) = {
    val out = new ByteArrayOutputStream(payload.length * 4)
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(payload))
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      (out.toByteArray, false)
    } catch {
      case _: java.io.IOException => (out.toByteArray, true)
    }
  }

  /** One WARC record at `pos`: returns (record, next position) or None
    * on any framing failure (the walk stops — no resync point). */
  private def parseRecord(fileId: Long, b: Array[Byte],
      pos: Int): Option[(WarcRecord, Int)] = {
    val (version, afterVersion) = readLine(b, pos).getOrElse(return None)
    if (version != "WARC/1.0") return None
    val (headers, afterHeaders) =
      readHeaders(b, afterVersion).getOrElse(return None)
    val len = headers.get("content-length")
      .flatMap(v => v.toLongOption).getOrElse(return None)
    if (len < 0 || afterHeaders + len > b.length) return None
    val blockEnd = (afterHeaders + len).toInt
    // record separator: two CRLF after the block (tolerated absent at
    // end-of-stream)
    var next = blockEnd
    if (next + 4 <= b.length && b(next) == '\r' && b(next + 1) == '\n' &&
        b(next + 2) == '\r' && b(next + 3) == '\n') next += 4
    else if (next != b.length) return None
    val tpe = headers.getOrElse("warc-type", "")
    val uri = headers.getOrElse("warc-target-uri", null)
    val rec = tpe match {
      case "response" =>
        parseHttp(b, afterHeaders, blockEnd) match {
          case Some((status, mime, bodyOff)) =>
            WarcRecord(fileId, "response", uri, status, mime,
              (blockEnd - bodyOff).toLong,
              new String(b, bodyOff, blockEnd - bodyOff, UTF_8))
          case None => return None
        }
      case "request" =>
        WarcRecord(fileId, "request", uri, -1L, null, -1L, null)
      case _ => return None
    }
    Some((rec, next))
  }

  /** HTTP message inside [off, end): status code, base mime (before
    * any `;` parameter), and the entity-body offset. */
  private def parseHttp(b: Array[Byte], off: Int,
      end: Int): Option[(Long, String, Int)] = {
    val (statusLine, afterStatus) = readLine(b, off).getOrElse(return None)
    if (afterStatus > end) return None
    val parts = statusLine.split(" ", 3)
    if (parts.length < 2 || !parts(0).startsWith("HTTP/")) return None
    val status = parts(1).toLongOption.getOrElse(return None)
    val (headers, bodyOff) = readHeaders(b, afterStatus).getOrElse(return None)
    if (bodyOff > end) return None
    val mime = headers.get("content-type")
      .map(v => v.split(";")(0).trim).orNull
    Some((status, mime, bodyOff))
  }

  /** CRLF-terminated line as ISO-8859-1 (header bytes are ASCII by
    * spec); returns (line, position after CRLF). */
  private def readLine(b: Array[Byte], pos: Int): Option[(String, Int)] = {
    var i = pos
    while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
    if (i + 1 >= b.length) None
    else Some((new String(b, pos, i - pos, UTF_8), i + 2))
  }

  /** Header block until the blank line; keys lower-cased (header names
    * are case-insensitive in both WARC and HTTP). */
  private def readHeaders(b: Array[Byte],
      pos: Int): Option[(Map[String, String], Int)] = {
    val m = Map.newBuilder[String, String]
    var p = pos
    while (true) {
      val (line, next) = readLine(b, p).getOrElse(return None)
      if (line.isEmpty) return Some((m.result(), next))
      val i = line.indexOf(':')
      if (i <= 0) return None
      m += (line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim)
      p = next
    }
    None // unreachable
  }
}
