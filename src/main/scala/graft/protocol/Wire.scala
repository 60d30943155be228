package graft.protocol

/** Wire-protocol messages (reference src/encoding.h:16-67): a request
  * is a length-prefixed query string; a response is a string (success
  * `$` / error `!`), an array of records (`#`), or a stream of record
  * batches (`~` chunks, `~0` terminator). */
sealed trait WireResponse
object WireResponse {
  /** rc 0 encodes as `$` (success), anything else as `!` (error) —
    * reference src/encoding.c:245-246. */
  final case class Str(rc: Int, message: String) extends WireResponse
  final case class Arr(records: Seq[(Long, Double)]) extends WireResponse
  /** One stream chunk; `isFinal` appends the `~0` terminator
    * (reference src/encoding.c:225-229). */
  final case class StreamChunk(records: Seq[(Long, Double)],
      isFinal: Boolean) extends WireResponse
}

/** Text-protocol codec, byte-compatible with the reference
  * (src/encoding.c:33-567):
  *
  *  - request: `$<len>\r\n<query>\r\n` (encode_request :60-72,
  *    decode_request :74-123); length must be decimal digits, match the
  *    payload exactly, and stay under the 512-byte query bound
  *    (QUERYSIZE, src/encoding.h:10);
  *  - string response: `$`/`!` + `<len>\r\n<msg>\r\n`
  *    (encode :242-253, decode :269-333);
  *  - record: `:<timestamp>\r\n;<value>\r\n` with the value rendered
  *    `%lf`-style at 6 decimals (encode_record :125-159);
  *  - array: `#<n>\r\n` + n records (:161-194);
  *  - stream chunk: `~<n>\r\n` + n records + blank line, final chunk
  *    followed by `~0\r\n` (:196-232).
  *
  * Divergence (documented): the reference caps EVERY message at its
  * fixed 512-byte buffer, which bounds arrays to a handful of records —
  * an implementation limit, not protocol semantics. Here only request
  * and string-message payloads keep the 512 bound (mirroring the
  * overflow-rejection tests); arrays and stream chunks are sized by the
  * 1000-record batch limit instead (src/timeseries.c:1040).
  */
object Wire {

  /** Reference QUERYSIZE (src/encoding.h:10). */
  val MaxQuerySize = 512
  /** Reference result-stream batch bound (src/timeseries.c:1040). */
  val StreamBatchSize = 1000

  private val CRLF = "\r\n"

  /** `%lf`-equivalent rendering: fixed 6 decimals (src/encoding.c:150).
    * glibc printf rounds the EXACT binary value half-to-even, which
    * Java's %.6f (HALF_UP) diverges from on exact-half dyadics like
    * 2^-7 = 0.0078125 — so round via BigDecimal(exact) + HALF_EVEN to
    * stay byte-compatible with a C peer. Non-finite doubles and
    * negative zero take glibc's spellings ('nan'/'inf'/'-inf'/
    * '-0.000000') — BigDecimal would THROW on the former (killing a
    * connection mid-array when a catalog-level bulk insert carried a
    * NaN) and drops the sign of the latter. */
  private[protocol] def fmtValue(v: Double): String =
    if (v.isNaN) "nan"
    else if (v == Double.PositiveInfinity) "inf"
    else if (v == Double.NegativeInfinity) "-inf"
    else {
      val s = new java.math.BigDecimal(v)
        .setScale(6, java.math.RoundingMode.HALF_EVEN).toPlainString
      // glibc keeps the sign on anything negative that rounds to zero
      // (including -0.0); BigDecimal has no signed zero and drops it
      val negZero = s == "0.000000" &&
        (v < 0 || (v == 0.0 && 1.0 / v < 0))
      if (negZero) "-0.000000" else s
    }

  private def fmtRecord(r: (Long, Double)): String =
    s":${r._1}$CRLF;${fmtValue(r._2)}$CRLF"

  // ---- encode ----

  def encodeRequest(query: String): Either[String, Array[Byte]] = {
    val bytes = query.getBytes("UTF-8")
    if (bytes.length >= MaxQuerySize)
      Left(s"query exceeds $MaxQuerySize bytes")
    else Right((s"$$${bytes.length}$CRLF$query$CRLF").getBytes("UTF-8"))
  }

  def encodeResponse(r: WireResponse): Either[String, Array[Byte]] = r match {
    case WireResponse.Str(rc, msg) =>
      val bytes = msg.getBytes("UTF-8")
      if (bytes.length >= MaxQuerySize)
        Left(s"string response exceeds $MaxQuerySize bytes")
      else {
        val marker = if (rc == 0) '$' else '!'
        Right((s"$marker${bytes.length}$CRLF$msg$CRLF").getBytes("UTF-8"))
      }
    case WireResponse.Arr(records) =>
      Right((s"#${records.length}$CRLF" +
        records.map(fmtRecord).mkString).getBytes("UTF-8"))
    case WireResponse.StreamChunk(records, isFinal) =>
      if (records.length > StreamBatchSize)
        Left(s"stream chunk exceeds $StreamBatchSize records")
      else if (records.isEmpty && !isFinal)
        // an empty NON-final chunk encodes as '~0\r\n\r\n', whose first
        // four bytes are indistinguishable from a standalone stream
        // terminator to an incremental decoder that hasn't buffered the
        // blank line yet — reject at encode time instead of emitting a
        // frame a split TCP read can misparse as end-of-stream
        Left("empty non-final stream chunk is ambiguous with the terminator")
      else {
        val term = if (isFinal) s"~0$CRLF" else ""
        Right((s"~${records.length}$CRLF" +
          records.map(fmtRecord).mkString + CRLF + term).getBytes("UTF-8"))
      }
  }

  // ---- decode (cursor-based; returns value + bytes consumed) ----

  private final class Cursor(data: Array[Byte]) {
    var pos = 0
    def atEnd: Boolean = pos >= data.length
    def peek: Int = if (atEnd) -1 else data(pos) & 0xff
    def take(): Int = { val c = peek; if (c >= 0) pos += 1; c }
    def atCrlf: Boolean =
      pos + 1 < data.length && data(pos) == '\r' && data(pos + 1) == '\n'
    def skipCrlf(): Boolean = atCrlf && { pos += 2; true }
    /** Decimal digit run before a CRLF (reference rejects non-digits in
      * length fields, src/encoding.c:85-94). */
    def readDigits(): Either[String, Long] = {
      var v = 0L
      var n = 0
      while (!atEnd && !atCrlf) {
        val c = take()
        if (c < '0' || c > '9') return Left(s"non-digit in numeric field at ${pos - 1}")
        v = v * 10 + (c - '0')
        n += 1
        if (v > Int.MaxValue) return Left("numeric field out of range")
      }
      if (n == 0) Left("empty numeric field")
      else if (atEnd) Left("truncated message: missing CRLF after number")
      else Right(v)
    }
    /** Raw bytes up to the next CRLF. */
    def readUntilCrlf(): Either[String, String] = {
      val start = pos
      while (!atEnd && !atCrlf) pos += 1
      if (atEnd) Left("truncated message: missing CRLF")
      else Right(new String(data, start, pos - start, "UTF-8"))
    }
  }

  /** Decode a request; returns (query, bytesConsumed). */
  def decodeRequest(data: Array[Byte]): Either[String, (String, Int)] = {
    val c = new Cursor(data)
    if (c.take() != '$') return Left("request must start with '$'")
    for {
      len <- c.readDigits()
      _ <- if (len >= MaxQuerySize) Left(s"declared length $len exceeds bound")
           else if (!c.skipCrlf()) Left("missing CRLF after length")
           else Right(())
      q <- c.readUntilCrlf()
      _ <- if (q.getBytes("UTF-8").length != len)
             Left(s"declared length $len != actual ${q.getBytes("UTF-8").length}")
           else if (!c.skipCrlf()) Left("missing trailing CRLF")
           else Right(())
    } yield (q, c.pos)
  }

  private def decodeRecord(c: Cursor): Either[String, (Long, Double)] =
    for {
      _ <- if (c.take() != ':') Left("record must start with ':'") else Right(())
      tsText <- c.readUntilCrlf()
      ts <- try Right(java.lang.Long.parseLong(tsText))
            catch { case _: NumberFormatException => Left(s"bad timestamp '$tsText'") }
      _ <- if (!c.skipCrlf()) Left("missing CRLF after timestamp") else Right(())
      _ <- if (c.take() != ';') Left("value must start with ';'") else Right(())
      vText <- c.readUntilCrlf()
      // accept the glibc %lf spellings the encoder (and a C peer)
      // emits for non-finite values — Double.parseDouble only knows
      // Java's 'NaN'/'Infinity' forms
      v <- vText match {
        case "nan" | "-nan" => Right(Double.NaN)
        case "inf" => Right(Double.PositiveInfinity)
        case "-inf" => Right(Double.NegativeInfinity)
        case _ => try Right(vText.toDouble)
          catch { case _: NumberFormatException => Left(s"bad value '$vText'") }
      }
      _ <- if (!c.skipCrlf()) Left("missing CRLF after value") else Right(())
    } yield (ts, v)

  private def decodeRecords(c: Cursor, n: Int): Either[String, Seq[(Long, Double)]] = {
    val out = Seq.newBuilder[(Long, Double)]
    var i = 0
    while (i < n) {
      decodeRecord(c) match {
        case Left(e) => return Left(e)
        case Right(r) => out += r
      }
      i += 1
    }
    Right(out.result())
  }

  /** Decode one response message; returns (response, bytesConsumed).
    * A stream chunk consumes its `~0` terminator when present. */
  def decodeResponse(data: Array[Byte]): Either[String, (WireResponse, Int)] = {
    val c = new Cursor(data)
    c.peek match {
      case '$' | '!' =>
        val rc = if (c.take() == '$') 0 else 1
        for {
          len <- c.readDigits()
          _ <- if (len >= MaxQuerySize) Left(s"declared length $len exceeds bound")
               else if (!c.skipCrlf()) Left("missing CRLF after length")
               else Right(())
          msg <- c.readUntilCrlf()
          _ <- if (msg.getBytes("UTF-8").length != len)
                 Left(s"declared length $len != actual")
               else if (!c.skipCrlf()) Left("missing trailing CRLF")
               else Right(())
        } yield (WireResponse.Str(rc, msg), c.pos)
      case '#' =>
        c.take()
        for {
          n <- c.readDigits()
          _ <- if (!c.skipCrlf()) Left("missing CRLF after array length") else Right(())
          records <- decodeRecords(c, n.toInt)
        } yield (WireResponse.Arr(records), c.pos)
      case '~' =>
        c.take()
        c.readDigits().flatMap { n =>
          if (!c.skipCrlf()) Left("missing CRLF after chunk length")
          // A bare `~0\r\n` NOT followed by a blank line is the stream
          // TERMINATOR arriving standalone — TCP may deliver it in a
          // separate segment from the final record chunk (an empty
          // mid-stream chunk is `~0\r\n\r\n`, distinguished by its
          // blank line). Without this case a client that saw the final
          // chunk without its terminator bytes would wait forever: the
          // late terminator alone could never decode.
          else if (n == 0 && !c.atCrlf)
            Right((WireResponse.StreamChunk(Nil, isFinal = true), c.pos))
          else decodeRecords(c, n.toInt).flatMap { records =>
            if (!c.skipCrlf()) Left("missing blank line after chunk")
            else {
              // `~0\r\n` directly after the blank line terminates the stream
              val isFinal = c.pos + 4 <= data.length && data(c.pos) == '~' &&
                data(c.pos + 1) == '0' && data(c.pos + 2) == '\r' && data(c.pos + 3) == '\n'
              if (isFinal) c.pos += 4
              Right((WireResponse.StreamChunk(records, isFinal), c.pos))
            }
          }
        }
      case other => Left(s"unknown response marker ${other.toChar}")
    }
  }
}
