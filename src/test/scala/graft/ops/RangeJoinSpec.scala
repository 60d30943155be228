package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binned range join: parity with the direct |diff| <= tol definition,
  * exact boundary behavior, no duplicate pairs, equality-join plan. */
class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("matches the brute-force tolerance join; boundary is inclusive; no dup pairs") {
    val rnd = new scala.util.Random(13)
    val l = (0 until 200).map(i => (rnd.nextInt(4).toLong, rnd.nextInt(5000).toLong, i.toDouble))
    val r = (0 until 200).map(i => (rnd.nextInt(4).toLong, rnd.nextInt(5000).toLong, i + 0.5))
    val tol = 100L
    val got = RangeJoin.withinTolerance(
        l.toDF("user_id", "timestamp", "value"),
        r.toDF("user_id", "timestamp", "value"),
        "user_id", tol, "value")
      .select("user_id", "timestamp", "value", "r_timestamp", "r_value")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3), x.getDouble(4)))
    val brute = for {
      (lk, lt, lv) <- l
      (rk, rt, rv) <- r
      if lk == rk && math.abs(lt - rt) <= tol
    } yield (lk, lt, lv, rt, rv)
    assert(got.sorted.toSeq == brute.sorted)
    assert(got.length == got.distinct.length) // multi-probe never duplicates
    // the fixture must actually contain an exactly-at-tolerance pair
    // crossing a bucket boundary for the boundary claim to be tested
    val exact = brute.filter(p => math.abs(p._2 - p._4) == tol)
    assert(exact.nonEmpty || {
      val g2 = RangeJoin.withinTolerance(
        Seq((1L, 0L, 1.0)).toDF("user_id", "timestamp", "value"),
        Seq((1L, tol, 2.0)).toDF("user_id", "timestamp", "value"),
        "user_id", tol, "value").count()
      g2 == 1
    })
  }

  test("candidates come from an equality join — no nested loop or cross product") {
    val l = Seq((1L, 10L, 1.0)).toDF("user_id", "timestamp", "value")
    val r = Seq((1L, 20L, 2.0)).toDF("user_id", "timestamp", "value")
    val plan = RangeJoin.withinTolerance(l, r, "user_id", 100L, "value")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(2000))
  }
}
