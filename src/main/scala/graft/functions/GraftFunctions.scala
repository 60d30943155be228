package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.expr

/** Registration for graft's native expressions.
  *
  * Two wiring paths, both standard:
  *  - [[register]]: per-session FunctionRegistry entry (used by the
  *    library itself — idempotent, works on any already-built session);
  *  - [[GraftExtensions]]: `SparkSessionExtensions` injection for
  *    spark configs that pass
  *    `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {

  private val fns: Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "shingles3" -> (exprs => Shingles3(exprs.head)),
    "dot_dec" -> (exprs => DotDec(exprs(0), exprs(1))),
    "text_stats_scan" -> (exprs => TextStats(exprs.head)),
    "q8_pack" -> (exprs => Q8Pack(exprs.head)),
    "dot_int" -> (exprs => DotInt(exprs(0), exprs(1))),
    "bpe_count" -> (exprs => BpeCount(exprs.head)))

  /** Idempotently register graft functions in the session's registry. */
  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  /** `shingles3(textCol)` as a Column (registers on the active session). */
  def shingles3(spark: SparkSession, textCol: String): Column = {
    register(spark)
    expr(s"shingles3($textCol)")
  }
}

/** Session-extension hook: inject graft functions at session build time
  * (`.withExtensions(new GraftExtensions)` or the spark.sql.extensions
  * conf). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("shingles3"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[Shingles3].getName, "shingles3"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          Shingles3(exprs.head)))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("dot_dec"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[DotDec].getName, "dot_dec"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          DotDec(exprs(0), exprs(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("text_stats_scan"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[TextStats].getName, "text_stats_scan"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          TextStats(exprs.head)))
  }
}
