package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** sum_micro must be BIT-IDENTICAL to the decimal(30,6) sum it
  * replaces — on random values, negative values, rounding-boundary
  * dyadics, nulls, and across repartitionings (order independence). */
class SumMicroSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def assertParity(df: org.apache.spark.sql.DataFrame): Unit = {
    GraftFunctions.register(spark)
    val both = df.groupBy("k").agg(
      call_function("sum_micro", col("v")).as("fast"),
      sum(col("v").cast("decimal(30,6)")).cast("double").as("ref"))
    val bad = both.filter(!(col("fast") <=> col("ref"))).collect()
    assert(bad.isEmpty, s"divergence: ${bad.take(5).mkString("; ")}")
  }

  test("random grouped doubles (incl. negatives and nulls) match bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 5000).map { _ =>
      val v: java.lang.Double =
        if (rnd.nextInt(20) == 0) null
        else java.lang.Double.valueOf((rnd.nextDouble() - 0.3) * math.pow(10, rnd.nextInt(8)))
      (s"g${rnd.nextInt(5)}", v)
    }
    assertParity(rows.toDF("k", "v"))
  }

  test("rounding-boundary dyadics and special shapes match") {
    assertParity(Seq(
      ("a", java.lang.Double.valueOf(0.0000005)), // exact decimal half at scale 6
      ("a", java.lang.Double.valueOf(-0.0000005)),
      ("a", java.lang.Double.valueOf(0.0078125)), // 2^-7
      ("b", java.lang.Double.valueOf(0.1)),
      ("b", java.lang.Double.valueOf(0.2)),
      ("b", java.lang.Double.valueOf(-0.30000000000000004)),
      ("c", null),
      ("d", java.lang.Double.valueOf(123456789012.654321)),
      ("d", java.lang.Double.valueOf(-123456789012.654321))).toDF("k", "v"))
  }

  test("per-row values beyond one limb (>=1e12) accumulate exactly") {
    // a per-row micros value can exceed 10^18; the limb-split in
    // update() must keep the two-long accumulator exact
    assertParity(Seq(
      ("a", java.lang.Double.valueOf(4.0e12)),
      ("a", java.lang.Double.valueOf(4.0e12)),
      ("a", java.lang.Double.valueOf(4.0e12)),
      ("a", java.lang.Double.valueOf(-2.5e12)),
      ("b", java.lang.Double.valueOf(9.0e12)),
      ("b", java.lang.Double.valueOf(-9.0e12))).toDF("k", "v"))
  }

  test("NaN and infinite inputs are skipped like their NULL decimal cast") {
    assertParity(Seq(
      ("a", java.lang.Double.valueOf(Double.NaN)),
      ("a", java.lang.Double.valueOf(1.5)),
      ("b", java.lang.Double.valueOf(Double.PositiveInfinity)),
      ("b", java.lang.Double.valueOf(Double.NegativeInfinity)),
      ("c", java.lang.Double.valueOf(Double.NaN))).toDF("k", "v"))
  }

  test("all-null group yields null, like the decimal sum") {
    GraftFunctions.register(spark)
    val r = Seq(("a", null: java.lang.Double))
      .toDF("k", "v").groupBy("k")
      .agg(call_function("sum_micro", col("v")).as("fast")).collect()(0)
    assert(r.isNullAt(1))
  }

  test("order independence: identical result under different partitionings") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(13)
    val rows = (0 until 3000).map(_ =>
      ("k", java.lang.Double.valueOf((rnd.nextDouble() - 0.5) * 1e6))).toDF("k", "v")
    val a = rows.repartition(1).groupBy("k")
      .agg(call_function("sum_micro", col("v"))).collect()(0).getDouble(1)
    val b = rows.repartition(16).groupBy("k")
      .agg(call_function("sum_micro", col("v"))).collect()(0).getDouble(1)
    assert(a == b)
  }
}
