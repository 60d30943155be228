package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-at-a-time shingle computation shared by interpreted eval and
  * generated code. Semantics are locked to the DuckDB oracle form:
  * lower → non-alnum to space → collapse spaces → split → sliding word
  * trigrams → distinct (first-occurrence order). */
object ShingleCodec {

  def eval(text: UTF8String): ArrayData = {
    // normalization via the shared char-walk (NormTokenWalk): the same
    // token stream as the lower → strip → collapse regex chain, with
    // no regex and no intermediate strings (measured ~2x on the walk)
    val toks = NormTokenWalk.tokens(text.toString)
    val m = toks.size()
    if (m < 3) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i <= m - 3) {
        seen.add(toks.get(i) + " " + toks.get(i + 1) + " " + toks.get(i + 2))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    }
  }

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** 60-bit md5-prefix hash of a string — the TextFns.h60 value
    * (`conv(substring(md5(s),1,15),16,10)`) computed in-process: the
    * first 15 hex chars are the top 60 bits of the digest. */
  def h60(s: String): Long = {
    val d = md5Local.get()
    d.reset()
    val b = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var top = 0L
    var i = 0
    while (i < 8) { top = (top << 8) | (b(i) & 0xffL); i += 1 }
    top >>> 4
  }

  /** Distinct word-trigram shingles hashed to their h60 longs in ONE
    * walk — the candidate-key form [[graft.ops.Terms
    * .similarDocsByRareFeatures]] feeds its inverted index with:
    * downstream rows carry 8 bytes instead of shingle text, and the
    * per-shingle md5+conv projection disappears from the plan. Exactly
    * `transform(shingles3(text), h60)` by construction. */
  def evalHashes(text: UTF8String): ArrayData = {
    val toks = NormTokenWalk.tokens(text.toString)
    val m = toks.size()
    if (m < 3) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i <= m - 3) {
        seen.add(toks.get(i) + " " + toks.get(i + 1) + " " + toks.get(i + 2))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = Long.box(h60(it.next())); j += 1 }
      new GenericArrayData(out)
    }
  }
}

/** Native Catalyst expression: `shingle_hashes3(text)` → array<bigint>
  * of distinct word-trigram h60 hashes (see
  * [[ShingleCodec.evalHashes]]). */
case class ShingleHashes3(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes3"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes3 requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    ShingleCodec.evalHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleCodec.evalHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes3 =
    copy(child = newChild)
}

/** Native Catalyst expression for distinct word-3-gram shingles.
  *
  * Preferred over the equivalent Scala UDF (prompt preference order:
  * builtin composition > native Expression > UDF) because `doGenCode`
  * emits a direct static call, so the projection stays inside
  * whole-stage codegen (a UDF forces an encoder boundary). The builtin
  * `transform(sequence(...))` composition is NOT an option: Catalyst
  * inlines the tokenizing subtree into the lambda and re-runs it per
  * produced shingle (see docs/PLANS.md).
  */
case class Shingles3(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles3"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingles3 requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    ShingleCodec.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleCodec.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}
