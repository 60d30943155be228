package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass top-level integer field extraction from a JSON object —
  * the sidecar-metadata hot path (`{"k": 42, ...}` provenance/stats
  * columns every curated corpus ships beside its payloads).
  *
  * `get_json_object` pays a full Jackson parse per row — measured
  * 15 s over 100M events for a one-key flat object, `from_json` the
  * same (CorrProfile events mode) — while the embedded referent's
  * vectorized JSON reader does the identical extraction in 0.6 s.
  * This expression closes that engine gap the Catalyst way (native
  * expression over UDF over nothing): one allocation-free byte scan
  * that understands real JSON structure — string escapes, nested
  * objects/arrays (skipped with a depth counter), whitespace — and
  * returns the value of the FIRST top-level occurrence of `key` as a
  * BIGINT.
  *
  * Contract (deliberately narrower than a JSONPath engine, and
  * documented rather than silently divergent):
  *  - NULL unless the input is a JSON object whose top-level `key`
  *    maps to an INTEGER number token (optional '-', digits only —
  *    a float/exponent/string/bool value yields NULL, where
  *    `CAST(get_json_object(..) AS LONG)` would throw under ANSI);
  *  - keys are matched byte-for-byte UNESCAPED; a key spelled with
  *    JSON escapes (`"k"`) does not match (it is still skipped
  *    structurally) — adversarial-escape corner, not a data shape;
  *  - malformed JSON yields NULL (get_json_object's behavior);
  *  - integer overflow past int64 yields NULL instead of wrapping.
  * JsonFastSpec locks parity against `get_json_object` over generated
  * objects (mixed value types, nesting, escapes, whitespace).
  */
object JsonLongCodec {

  /** @return boxed value, or null per the contract above. */
  def extract(json: UTF8String, key: UTF8String): java.lang.Long = {
    val b = json.getBytes
    val kb = key.getBytes
    var i = skipWs(b, 0)
    if (i >= b.length || b(i) != '{') return null
    i += 1
    var first = true
    while (i < b.length) {
      i = skipWs(b, i)
      if (i < b.length && b(i) == '}') return null // end, key absent
      if (!first) {
        if (i >= b.length || b(i) != ',') return null
        i = skipWs(b, i + 1)
      }
      first = false
      // key string
      if (i >= b.length || b(i) != '"') return null
      val keyStart = i + 1
      i = skipString(b, i)
      if (i < 0) return null
      val keyEnd = i - 1 // byte after last key byte is the closing quote
      i = skipWs(b, i)
      if (i >= b.length || b(i) != ':') return null
      i = skipWs(b, i + 1)
      if (matchesKey(b, keyStart, keyEnd, kb)) {
        return parseLong(b, i)
      }
      i = skipValue(b, i)
      if (i < 0) return null
    }
    null
  }

  private def skipWs(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length && (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r'))
      i += 1
    i
  }

  /** `from` points at the opening quote; returns the index AFTER the
    * closing quote, or -1 on malformed input. */
  private def skipString(b: Array[Byte], from: Int): Int = {
    var i = from + 1
    while (i < b.length) {
      val c = b(i)
      if (c == '\\') i += 2
      else if (c == '"') return i + 1
      else i += 1
    }
    -1
  }

  /** Byte-exact key match over [start, end) — escape-free keys only
    * (a backslash in the span simply fails the match; the span was
    * already consumed structurally by [[skipString]]). */
  private def matchesKey(b: Array[Byte], start: Int, end: Int,
      kb: Array[Byte]): Boolean = {
    if (end - start != kb.length) return false
    var i = 0
    while (i < kb.length) {
      if (b(start + i) != kb(i)) return false
      i += 1
    }
    true
  }

  /** Parse an integer number token at `from`; null per contract. */
  private def parseLong(b: Array[Byte], from: Int): java.lang.Long = {
    var i = from
    if (i >= b.length) return null
    var neg = false
    if (b(i) == '-') { neg = true; i += 1 }
    if (i >= b.length || b(i) < '0' || b(i) > '9') return null
    // Accumulate NEGATIVELY: |Long.MinValue| > Long.MaxValue, so a
    // positive accumulator cannot represent -9223372036854775808 —
    // the one in-range int64 get_json_object+CAST returns that a
    // positive-magnitude loop would null out.
    var v = 0L
    while (i < b.length && b(i) >= '0' && b(i) <= '9') {
      val d = b(i) - '0'
      if (v < (Long.MinValue + d) / 10) return null // would overflow
      v = v * 10 - d
      i += 1
    }
    if (!neg && v == Long.MinValue) return null // +9223372036854775808
    // a fraction/exponent marks a non-integer token: NULL by contract
    if (i < b.length && (b(i) == '.' || b(i) == 'e' || b(i) == 'E')) return null
    // the token must END the value position: ws then , or } (or EOF in
    // malformed input — get_json_object also nulls there)
    val j = skipWs(b, i)
    if (j < b.length && b(j) != ',' && b(j) != '}') return null
    java.lang.Long.valueOf(if (neg) v else -v)
  }

  /** Skip one JSON value generically; returns index after it, -1 on
    * malformed input. */
  private def skipValue(b: Array[Byte], from: Int): Int = {
    if (from >= b.length) return -1
    b(from) match {
      case '"' => skipString(b, from)
      case '{' | '[' =>
        var depth = 0
        var i = from
        while (i < b.length) {
          b(i) match {
            case '"' =>
              i = skipString(b, i)
              if (i < 0) return -1
            case '{' | '[' => depth += 1; i += 1
            case '}' | ']' =>
              depth -= 1; i += 1
              if (depth == 0) return i
            case _ => i += 1
          }
        }
        -1
      case _ =>
        // number / true / false / null literal: run to a delimiter
        var i = from
        while (i < b.length && b(i) != ',' && b(i) != '}' && b(i) != ']' &&
          b(i) != ' ' && b(i) != '\t' && b(i) != '\n' && b(i) != '\r')
          i += 1
        i
    }
  }
}

/** `json_long(json, key)` — see [[JsonLongCodec]]. */
case class JsonLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "json_long"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"json_long requires (string, string), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(json: Any, key: Any): Any =
    JsonLongCodec.extract(json.asInstanceOf[UTF8String],
      key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, k) => s"""
      java.lang.Long ${ev.value}_r = graft.functions.JsonLongCodec.extract($j, $k);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonLong =
    copy(left = newLeft, right = newRight)
}
