package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Row-at-a-time MinHash signature computation shared by interpreted
  * eval and generated code.
  *
  * Semantics are locked BIT-FOR-BIT to the exploded groupBy formulation
  * (graft.ops.Dedup.minhashSignatures) and to the DuckDB oracle SQL:
  * permutation i of a shingle is (a_i * (h60(sh) % 2^30) + b_i) mod
  * (2^31 - 1) with h60 = the first 15 hex chars of md5 parsed base-16
  * (TextFns.h60), and the signature is the per-permutation minimum over
  * the document's distinct shingle set. Since the input array already
  * IS the distinct shingle set (Shingles3's contract), the min over
  * array elements equals the min over exploded rows — no shuffle
  * required to aggregate it.
  *
  * Bounds (shared with the oracle — DuckDB BIGINT errors on overflow):
  * a_i < 2^31, h < 2^30, so a_i * h + b_i < 2^61.
  */
object MinHashCodec {

  /** Mersenne prime 2^31 - 1 — the universal-hash modulus. */
  val P = 2147483647L
  /** Base-hash reduction modulus 2^30 (keeps a*h < 2^61). */
  val M = 1073741824L

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes) as a non-negative long — numerically
    * identical to `parseLong(hex(md5).substring(0, 15), 16)`
    * (TextFns.h60Scala; 15 hex chars = top 60 bits of the big-endian
    * digest — cross-checked by MinHashSigSpec). */
  def h60(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(bytes)
    (((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) | ((h(2) & 0xffL) << 40) |
      ((h(3) & 0xffL) << 32) | ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)) >>> 4
  }

  def h60String(s: String): Long = h60(s.getBytes("UTF-8"))

  /** Universal-hash family constants: a_i in [1, P-1], b_i in [0, P-1]
    * derived from the shared md5 scheme, so the identical values can be
    * inlined into DuckDB oracle SQL (graft.ops.Dedup.mhParams delegates
    * here — ONE derivation for expression, oracle, and legacy groupBy
    * path). */
  def params(k: Int): (Array[Long], Array[Long]) = {
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var i = 0
    while (i < k) {
      a(i) = h60String(s"mh:a:$i") % (P - 1) + 1
      b(i) = h60String(s"mh:b:$i") % P
      i += 1
    }
    (a, b)
  }

  /** k-permutation signature of one shingle array; null for an empty
    * array (a doc with < 3 tokens has no shingle set — the exploded
    * formulation emits no row for it, and this path mirrors that by
    * letting callers filter nulls). Null ELEMENTS throw loudly:
    * Shingles3 declares containsNull=false, so one can only appear if a
    * caller wires a foreign array in — silently skipping it would
    * diverge from the exploded form. */
  def sig(arr: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(s"minhash_sig: null shingle at $i")
      val h = h60(arr.getUTF8String(i).getBytes) % M
      var j = 0
      while (j < k) {
        val v = (a(j) * h + b(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

/** Native Catalyst expression: the full k-element MinHash signature of
  * a (distinct) shingle array in ONE row-local scan.
  *
  * This replaces the explode + groupBy(doc_id).agg(k mins) formulation
  * on the dedup hot path: signature computation becomes a stateless
  * per-row map — NO shuffle of the exploded (doc_id, shingle) relation
  * (at corpus scale that relation is ~50x the corpus row count and was
  * the largest exchange in dedup_minhash), and the same property makes
  * the operator usable in Structured Streaming, where a per-doc
  * signature must not require a mid-stream aggregation
  * (StreamSurface.stream_dedup_minhash). The exploded formulation is
  * kept as [[graft.ops.Dedup.minhashSignatures]] and locked equal by
  * MinHashSigSpec.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires k >= 1, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires an array<string> argument, got $other")
  }

  @transient private lazy val (aArr, bArr) = MinHashCodec.params(k)

  override def nullSafeEval(input: Any): Any =
    MinHashCodec.sig(input.asInstanceOf[ArrayData], aArr, bArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.MinHashCodec.sig($c, $aRef, $bRef);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
