package graft.protocol

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import WireResponse._

/** Property-based codec spec: every encodable message round-trips
  * exactly, and NO byte sequence can make the decoder throw — the
  * server feeds it raw socket bytes. */
object WireProps extends Properties("Wire") {

  // %lf renders 6 decimals; values quantized to 2^-20 round-trip exactly
  private val genValue: Gen[Double] =
    Gen.chooseNum(-8e6.toLong, 8e6.toLong).map(_ / 64.0)

  private val genRecord: Gen[(Long, Double)] =
    Gen.zip(Gen.chooseNum(0L, Long.MaxValue / 2), genValue)

  private val genMsg: Gen[String] = Gen.listOfN(40,
    Gen.frequency(20 -> Gen.alphaNumChar, 3 -> Gen.const(' '),
      1 -> Gen.const('\''))).map(_.mkString)

  private val genResponse: Gen[WireResponse] = Gen.oneOf(
    Gen.zip(Gen.oneOf(0, 1), genMsg).map { case (rc, m) => Str(rc, m) },
    Gen.listOf(genRecord).map(Arr(_)),
    Gen.zip(Gen.resize(50, Gen.listOf(genRecord)), Gen.oneOf(true, false))
      // empty non-final chunks are rejected at encode time (terminator-
      // ambiguous on a split read) — the codec contract excludes them
      .map { case (rs, fin) => StreamChunk(rs, fin || rs.isEmpty) })

  property("encode/decode round-trip for every response shape") =
    forAll(genResponse) { r =>
      Wire.encodeResponse(r) match {
        case Left(_) => Prop(false)
        case Right(bytes) =>
          Prop(Wire.decodeResponse(bytes) == Right((r, bytes.length)))
      }
    }

  property("request round-trip for any sub-bound query text") =
    forAll(genMsg) { q =>
      Wire.encodeRequest(q) match {
        case Right(bytes) =>
          Prop(Wire.decodeRequest(bytes) == Right((q, bytes.length)))
        case Left(_) => Prop(q.getBytes("UTF-8").length >= Wire.MaxQuerySize)
      }
    }

  property("decoder totality: arbitrary bytes never throw") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      val arr = bs.toArray
      Prop(try { Wire.decodeResponse(arr); Wire.decodeRequest(arr); true }
        catch { case _: Throwable => false })
    }

  property("decoder totality on near-valid frames (mutated valid messages)") =
    forAll(genResponse, Gen.chooseNum(0, 1000), Gen.chooseNum(Byte.MinValue, Byte.MaxValue)) {
      (r, pos, b) =>
        Wire.encodeResponse(r) match {
          case Right(bytes) if bytes.nonEmpty =>
            val mutated = bytes.clone()
            mutated(pos % bytes.length) = b
            Prop(try { Wire.decodeResponse(mutated); true }
              catch { case _: Throwable => false })
          case _ => Prop(true)
        }
    }
}
