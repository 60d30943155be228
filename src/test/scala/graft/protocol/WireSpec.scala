package graft.protocol

import org.scalatest.funsuite.AnyFunSuite

import WireResponse._

/** Codec spec mirroring the reference's protocol round-trip tests
  * (reference tests/encoding_test.c:13-1010: request, string/error,
  * array, stream single/multi/final/empty/negative, malformed-input
  * rejection, overflow guard, full round-trips). */
class WireSpec extends AnyFunSuite {

  private def enc(r: WireResponse): Array[Byte] =
    Wire.encodeResponse(r).fold(e => fail(e), identity)
  private def dec(b: Array[Byte]): (WireResponse, Int) =
    Wire.decodeResponse(b).fold(e => fail(e), identity)
  private def s(b: Array[Byte]): String = new String(b, "UTF-8")

  test("request encode/decode round-trip (encoding_test.c request cases)") {
    val q = "SELECT value FROM cpu BETWEEN 1 AND 2"
    val bytes = Wire.encodeRequest(q).fold(e => fail(e), identity)
    assert(s(bytes) == s"$$${q.length}\r\n$q\r\n")
    val (decoded, n) = Wire.decodeRequest(bytes).fold(e => fail(e), identity)
    assert(decoded == q && n == bytes.length)
  }

  test("request rejection: bad marker, non-digit length, length mismatch, overflow") {
    assert(Wire.decodeRequest("#5\r\nhello\r\n".getBytes).isLeft)
    assert(Wire.decodeRequest("$5x\r\nhello\r\n".getBytes).isLeft)
    assert(Wire.decodeRequest("$4\r\nhello\r\n".getBytes).isLeft)  // declared < actual
    assert(Wire.decodeRequest("$6\r\nhello\r\n".getBytes).isLeft)  // declared > actual
    assert(Wire.encodeRequest("x" * Wire.MaxQuerySize).isLeft)     // QUERYSIZE bound
    assert(Wire.decodeRequest((s"$$999\r\n" + "x" * 999 + "\r\n").getBytes).isLeft)
  }

  test("string success and error responses (encoding_test.c string cases)") {
    assert(s(enc(Str(0, "ok"))) == "$2\r\nok\r\n")
    assert(s(enc(Str(1, "boom"))) == "!4\r\nboom\r\n")
    assert(dec("$2\r\nok\r\n".getBytes) == ((Str(0, "ok"), 8)))
    assert(dec("!4\r\nboom\r\n".getBytes)._1 == Str(1, "boom"))
    // overflow guard on encode
    assert(Wire.encodeResponse(Str(0, "x" * Wire.MaxQuerySize)).isLeft)
  }

  test("value rendering matches glibc %lf half-even rounding on exact halves") {
    // 2^-7 is exactly representable; its 7th decimal is an exact 5 —
    // glibc %lf gives 0.007812 (half-even), Java %.6f would give 0.007813
    assert(s(enc(Arr(Seq((1L, 0.0078125))))).contains(";0.007812\r\n"))
    assert(s(enc(Arr(Seq((1L, 0.0234375))))).contains(";0.023438\r\n")) // rounds up to even
  }

  test("non-finite and negative-zero values render with glibc spellings") {
    assert(s(enc(Arr(Seq((1L, Double.NaN))))).contains(";nan\r\n"))
    assert(s(enc(Arr(Seq((1L, Double.PositiveInfinity))))).contains(";inf\r\n"))
    assert(s(enc(Arr(Seq((1L, Double.NegativeInfinity))))).contains(";-inf\r\n"))
    assert(s(enc(Arr(Seq((1L, -0.0))))).contains(";-0.000000\r\n"))
    assert(s(enc(Arr(Seq((1L, 0.0))))).contains(";0.000000\r\n"))
  }

  test("empty non-final stream chunks are rejected at encode time") {
    // their bytes ('~0\r\n\r\n') are terminator-ambiguous on a split read
    assert(Wire.encodeResponse(StreamChunk(Nil, isFinal = false)).isLeft)
    assert(Wire.encodeResponse(StreamChunk(Nil, isFinal = true)).isRight)
  }

  test("standalone ~0 terminator (split TCP segment) decodes as an empty final chunk") {
    val (r, n) = dec("~0\r\n".getBytes)
    assert(r == StreamChunk(Nil, isFinal = true) && n == 4)
    // an empty NON-final chunk carries its blank line and stays non-final
    assert(dec("~0\r\n\r\n".getBytes)._1 == StreamChunk(Nil, isFinal = false))
  }

  test("array response: records as :ts/;value with %lf 6-decimal values") {
    val bytes = enc(Arr(Seq((1643673600000000000L, 78.5), (1643673660000000000L, -3.25))))
    assert(s(bytes) ==
      "#2\r\n:1643673600000000000\r\n;78.500000\r\n:1643673660000000000\r\n;-3.250000\r\n")
    val (r, n) = dec(bytes)
    assert(r == Arr(Seq((1643673600000000000L, 78.5), (1643673660000000000L, -3.25))))
    assert(n == bytes.length)
  }

  test("empty array") {
    val bytes = enc(Arr(Nil))
    assert(s(bytes) == "#0\r\n")
    assert(dec(bytes)._1 == Arr(Nil))
  }

  test("stream chunks: non-final, final with ~0 terminator (encoding_test.c stream cases)") {
    val mid = enc(StreamChunk(Seq((5L, 1.0)), isFinal = false))
    assert(s(mid) == "~1\r\n:5\r\n;1.000000\r\n\r\n")
    val fin = enc(StreamChunk(Seq((6L, -2.5)), isFinal = true))
    assert(s(fin) == "~1\r\n:6\r\n;-2.500000\r\n\r\n~0\r\n")
    assert(dec(mid)._1 == StreamChunk(Seq((5L, 1.0)), isFinal = false))
    val (r, n) = dec(fin)
    assert(r == StreamChunk(Seq((6L, -2.5)), isFinal = true))
    assert(n == fin.length) // terminator consumed
  }

  test("multi-chunk stream decodes sequentially from one buffer") {
    val buf = enc(StreamChunk(Seq((1L, 1.5), (2L, 2.5)), isFinal = false)) ++
      enc(StreamChunk(Seq((3L, 3.5)), isFinal = true))
    val (c1, n1) = dec(buf)
    assert(c1 == StreamChunk(Seq((1L, 1.5), (2L, 2.5)), isFinal = false))
    val (c2, n2) = dec(buf.drop(n1))
    assert(c2 == StreamChunk(Seq((3L, 3.5)), isFinal = true))
    assert(n1 + n2 == buf.length)
  }

  test("malformed responses are rejected, not mis-parsed") {
    assert(Wire.decodeResponse("@2\r\nok\r\n".getBytes).isLeft)        // unknown marker
    assert(Wire.decodeResponse("$2x\r\nok\r\n".getBytes).isLeft)       // digit run broken
    assert(Wire.decodeResponse("#2\r\n:1\r\n;2.0\r\n".getBytes).isLeft) // short array
    assert(Wire.decodeResponse("#1\r\n;1\r\n:2.0\r\n".getBytes).isLeft) // swapped markers
    assert(Wire.decodeResponse("#1\r\n:x\r\n;2.0\r\n".getBytes).isLeft) // bad timestamp
    assert(Wire.decodeResponse("~1\r\n:1\r\n;2.0\r\n".getBytes).isLeft) // missing blank line
    assert(Wire.decodeResponse("$999999999999999999999\r\n".getBytes).isLeft) // len overflow
  }

  test("full round-trip: every shape encodes then decodes to itself") {
    val shapes = Seq(
      Str(0, "database 'metrics' created"),
      Str(1, "TsNotFound: timeseries 'x' not found"),
      Arr((1L to 20L).map(i => (i * 1000000L, i / 8.0))),
      StreamChunk((1L to 999L).map(i => (i, i * 0.125)), isFinal = false),
      StreamChunk(Seq((42L, -0.875)), isFinal = true))
    for (shape <- shapes) {
      val bytes = enc(shape)
      val (decoded, n) = dec(bytes)
      assert(decoded == shape, s(bytes).take(100))
      assert(n == bytes.length)
    }
  }
}
