package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property fuzz for the WARC walk beside WarcSpec's pinned cases:
  * the framing is Content-Length-driven, so record splitting must be
  * immune to ANY body content — embedded CRLF runs, fake "WARC/1.0"
  * version lines, record separators, gzip magic, multi-byte UTF-8 —
  * and an arbitrary byte-prefix truncation must never throw, never
  * corrupt an intact earlier record, and end in at most one malformed
  * row. */
object WarcProps extends Properties("Warc") {

  // adversarial document text: heavy on the byte sequences a
  // separator-scanning (rather than length-driven) parser would trip
  // over
  private val genText: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, Gen.frequency(
      4 -> Gen.listOfN(6, Gen.asciiPrintableChar).map(_.mkString),
      2 -> Gen.const("\r\n"),
      2 -> Gen.const("\r\n\r\n"),
      2 -> Gen.const("WARC/1.0\r\n"),
      1 -> Gen.const("Content-Length: 4\r\n"),
      1 -> Gen.const("HTTP/1.1 200 OK"),
      1 -> Gen.const(""),
      1 -> Gen.const("caf\u00e9 \u4e16\u754c"))).map(_.mkString))

  private val genDoc: Gen[(Long, String)] =
    Gen.zip(Gen.chooseNum(0L, 10000L), genText)

  private case class Fixture(docs: List[(Long, String)], gz: Boolean,
      garbage: Boolean) {
    def bytes: Array[Byte] = {
      val out = new ByteArrayOutputStream()
      docs.foreach { case (id, text) =>
        Warc.writeMember(out, Warc.requestRecord(id, "s"), gz)
        Warc.writeMember(out, Warc.responseRecord(id, text, "s"), gz)
      }
      if (garbage) Warc.writeMember(out, "junk\r\n".getBytes(UTF_8), gz)
      out.toByteArray
    }
    def expectedBodies: List[String] =
      docs.map { case (id, text) => Warc.expectedBody(id, text, "s") }
    def expectedBytes: List[Long] =
      docs.map { case (id, text) => Warc.expectedBodyBytes(id, text, "s") }
  }

  private val genFixture: Gen[Fixture] = for {
    docs <- Gen.chooseNum(0, 8).flatMap(Gen.listOfN(_, genDoc))
    gz <- Gen.oneOf(true, false)
    garbage <- Gen.oneOf(true, false)
  } yield Fixture(docs, gz, garbage)

  property("roundTripExact") = forAll(genFixture) { f =>
    val recs = Warc.parseFile(1L, f.bytes)
    val resp = recs.filter(_.rec_type == "response")
    val req = recs.filter(_.rec_type == "request")
    val mal = recs.filter(_.rec_type == "malformed")
    Prop.all(
      Prop(resp.map(_.body) == f.expectedBodies) :| "bodies exact",
      Prop(resp.map(_.body_bytes) == f.expectedBytes) :| "bytes exact",
      Prop(req.size == f.docs.size) :| "one request per doc",
      Prop(mal.size == (if (f.garbage) 1 else 0)) :| "garbage -> 1 malformed",
      Prop(resp.forall(r => r.url != null && r.url.endsWith(
        "/" + r.url.split("/").last))) :| "urls present")
  }

  property("prefixTruncationSafe") = forAll(
    genFixture.suchThat(f => !f.gz && f.docs.nonEmpty), Gen.chooseNum(0, 1.0))
  { (f, frac) =>
    val full = f.bytes
    val cut = (full.length * frac).toInt.min(full.length - 1)
    val recs = Warc.parseFile(1L, full.take(cut)) // must not throw
    val resp = recs.filter(_.rec_type == "response")
    val exp = f.expectedBodies
    Prop.all(
      Prop(resp.size <= exp.size) :| "never invents records",
      Prop(resp.map(_.body).zip(exp).forall { case (a, b) => a == b })
        :| "intact prefix records parse exactly",
      Prop(recs.count(_.rec_type == "malformed") <= 1) :| "at most one tail")
  }

  property("gzipPrefixNeverThrows") = forAll(
    genFixture.suchThat(f => f.gz && f.docs.nonEmpty), Gen.chooseNum(0, 1.0))
  { (f, frac) =>
    val full = f.bytes
    val cut = (full.length * frac).toInt.min(full.length - 1)
    val recs = Warc.parseFile(1L, full.take(cut)) // must not throw
    val exp = f.expectedBodies
    val resp = recs.filter(_.rec_type == "response")
    Prop(resp.map(_.body).zip(exp).forall { case (a, b) => a == b }) :|
      "decoded prefix members parse exactly"
  }
}
