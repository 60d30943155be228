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
    val norm = text.toString.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
    val toks = norm.split(" ")
    if (toks.length < 3) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i <= toks.length - 3) {
        seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    }
  }
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
