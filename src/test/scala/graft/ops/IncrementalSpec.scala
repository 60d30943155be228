package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental.merge: any split of the input merges to the
  * bit-identical single-pass rollup (decimal associativity), and an
  * empty batch is the identity. */
class IncrementalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private lazy val events = {
    val rnd = new scala.util.Random(7)
    (0 until 2000).map { i =>
      (i.toLong, s"t${i % 3}", 1700000000000000L + (i % 50) * 3600000000L +
        (rnd.nextLong() % 3600000000L).abs, rnd.nextDouble() * 1000 - 500)
    }.toDF("event_id", "event_type", "timestamp", "value")
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("event_type", "hour_ts")
      .collect().map(_.toSeq).toSeq

  test("merge of K random hash splits equals the single-pass rollup, bit-identical") {
    val single = canon(Incremental.merge(Incremental.hourlyPartials(events)))
    for (k <- Seq(2, 3, 7)) {
      val parts = (0 until k).map(i =>
        Incremental.hourlyPartials(events.filter(pmod(col("event_id"), lit(k)) === i)))
      assert(canon(Incremental.merge(parts: _*)) == single, s"k=$k")
    }
  }

  test("an empty batch is the merge identity") {
    val base = Incremental.hourlyPartials(events)
    val empty = Incremental.hourlyPartials(events.filter("event_id < 0"))
    assert(canon(Incremental.merge(base, empty)) ==
      canon(Incremental.merge(base)))
  }
}
