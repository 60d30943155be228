package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Digest-direct h60: the first 60 bits of md5 as a BIGINT.
  *
  * Bit-identical to the composed column chain
  * `conv(substring(md5(c), 1, 15), 16, 10).cast("long")` (the shared
  * cross-engine hash discipline — the DuckDB oracle keeps spelling it
  * `('0x' || substr(md5(x),1,15))::BIGINT`), but WITHOUT materializing
  * the 32-char hex string, the substring copy, or conv's
  * string-base-conversion parse — the first 15 hex nibbles are read
  * straight off the digest bytes. The chain is the per-row cost of
  * EVERY deterministic hash-split operator (uniform/stratified
  * sampling, train/eval splits, incremental-state splits, blocklist
  * namespaces); measured at 100M events the composed chain costs
  * 5.8 s where this expression pays only the digest (~2 s) —
  * CorrProfile events mode, BASELINE.md r11.
  */
object H60Codec {
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def h60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    // value of the 15-hex-digit prefix parsed base-16: nibble-fold in
    // digest order (big-endian hex rendering)
    var v = 0L
    var i = 0
    while (i < 15) {
      val b = dig(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}

/** `h60_long(str)` — see [[H60Codec]]. One static call inside
  * whole-stage codegen (the [[BpeCount]] pattern). */
case class H60Long(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "h60_long"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"h60_long requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    H60Codec.h60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H60Codec.h60($c)")

  override protected def withNewChildInternal(newChild: Expression): H60Long =
    copy(child = newChild)
}
