package graft.protocol

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based wire-codec fuzz beside WireSpec's hand-pinned
  * encoding_test.c mirror: round-trips over the generated space,
  * byte-exact re-encode fixpoints (values quantize to the %.6f wire
  * rendering ONCE and then stay stable), exact consumed-byte
  * accounting under trailing garbage, and the incremental-delivery
  * contract (every strict prefix of a length-framed response is
  * need-more, never a wrong parse) — the properties the streaming
  * socket reader in TsServer/ServerSpec actually relies on. */
object WireProps extends Properties("Wire") {

  // arbitrary unicode payload under the reference QUERYSIZE in UTF-8
  // bytes (multi-byte chars mean the char count is NOT the bound)
  private val genPayload: Gen[String] =
    Gen.chooseNum(0, 120).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        8 -> Gen.asciiPrintableChar,
        1 -> Gen.oneOf('é', '中', '€'),
        1 -> Gen.oneOf('\t', ' ', '\\'))).map(_.mkString))
      .suchThat(_.getBytes("UTF-8").length < Wire.MaxQuerySize)

  private val genValue: Gen[Double] = Gen.frequency(
    6 -> Gen.chooseNum(-1e9, 1e9),
    2 -> Gen.chooseNum(-1000000L, 1000000L).map(_ / 1e6), // 6dp exact-ish
    1 -> Gen.oneOf(0.0, -0.0, 0.0078125, -2.5e-7, 1e15),
    1 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity))

  private val genRecord: Gen[(Long, Double)] =
    Gen.zip(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2), genValue)

  private val genRecords: Gen[Seq[(Long, Double)]] =
    Gen.chooseNum(0, 30).flatMap(Gen.listOfN(_, genRecord))

  private def enc(r: WireResponse): Array[Byte] =
    Wire.encodeResponse(r).fold(e => sys.error(e), identity)

  property("request round-trip, exact consumed bytes") =
    forAll(genPayload) { q =>
      val bytes = Wire.encodeRequest(q).fold(e => sys.error(e), identity)
      Wire.decodeRequest(bytes) == Right((q, bytes.length))
    }

  property("Str round-trip for both markers") =
    forAll(genPayload, Gen.oneOf(0, 1)) { (msg, rc) =>
      val bytes = enc(WireResponse.Str(rc, msg))
      Wire.decodeResponse(bytes) ==
        Right((WireResponse.Str(rc, msg), bytes.length))
    }

  property("Arr decode/re-encode fixpoint, exact consumed bytes") =
    forAll(genRecords) { rs =>
      val bytes = enc(WireResponse.Arr(rs))
      Wire.decodeResponse(bytes) match {
        case Right((decoded: WireResponse.Arr, n)) =>
          // values quantize to the 6-decimal wire rendering once; the
          // re-encode of the decoded frame must be byte-identical
          n == bytes.length &&
            java.util.Arrays.equals(enc(decoded), bytes)
        case _ => false
      }
    }

  property("final StreamChunk round-trip preserves finality") =
    forAll(genRecords) { rs =>
      val bytes = enc(WireResponse.StreamChunk(rs, isFinal = true))
      Wire.decodeResponse(bytes) match {
        case Right((WireResponse.StreamChunk(decRs, fin), n)) =>
          fin && n == bytes.length && decRs.length == rs.length
        case _ => false
      }
    }

  property("non-empty non-final StreamChunk round-trip") =
    forAll(genRecords.suchThat(_.nonEmpty)) { rs =>
      val bytes = enc(WireResponse.StreamChunk(rs, isFinal = false))
      Wire.decodeResponse(bytes) match {
        case Right((WireResponse.StreamChunk(decRs, fin), n)) =>
          !fin && n == bytes.length && decRs.length == rs.length
        case _ => false
      }
    }

  property("empty non-final chunk is rejected at encode (terminator ambiguity)") =
    Prop(Wire.encodeResponse(
      WireResponse.StreamChunk(Nil, isFinal = false)).isLeft)

  property("every strict prefix of a length-framed frame is need-more") =
    forAll(genPayload, genRecords, Gen.chooseNum(0.0, 1.0)) { (msg, rs, f) =>
      val frames = Seq(enc(WireResponse.Str(1, msg)), enc(WireResponse.Arr(rs)))
      frames.forall { bytes =>
        val k = (f * (bytes.length - 1)).toInt // strictly shorter
        Wire.decodeResponse(bytes.take(k)).isLeft
      }
    }

  property("trailing garbage: exact consume, remainder decodes next frame") =
    forAll(genPayload, genRecords) { (msg, rs) =>
      val a = enc(WireResponse.Str(0, msg))
      val b = enc(WireResponse.Arr(rs))
      val buf = a ++ b
      Wire.decodeResponse(buf) match {
        case Right((WireResponse.Str(0, m2), n)) =>
          m2 == msg && n == a.length &&
            Wire.decodeResponse(buf.drop(n)).isRight
        case _ => false
      }
    }
}
