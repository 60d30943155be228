package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental combine/finalize: any hash split of the input merges to
  * the bit-identical single-pass rollup (decimal associativity), the
  * iterative state fold the scaladoc promises works without retaining
  * historical partials, and the shared-scan split variant equals
  * per-batch partials. */
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

  // the production membership hash (h60-derived, skewed bucket sizes)
  private def bucket(k: Int) =
    pmod(TextFns.h60(concat(lit("split:"), col("event_id").cast("string"))),
      lit(k.toLong))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("event_type", "hour_ts")
      .collect().map(_.toSeq).toSeq

  private lazy val single =
    canon(Incremental.merge(Incremental.hourlyPartials(events)))

  test("merge of K hash splits equals the single-pass rollup, bit-identical") {
    for (k <- Seq(2, 3, 7)) {
      val parts = (0 until k).map(i =>
        Incremental.hourlyPartials(events.filter(bucket(k) === i)))
      assert(canon(Incremental.merge(parts: _*)) == single, s"k=$k")
    }
  }

  test("iterative fold: standing state absorbs each batch, finalized once") {
    val k = 5
    var state = Incremental.hourlyPartials(events.filter(bucket(k) === 0))
    for (i <- 1 until k) // state stays mergeable — no historical partials kept
      state = Incremental.combine(state,
        Incremental.hourlyPartials(events.filter(bucket(k) === i)))
    assert(canon(Incremental.finalizeRollup(state)) == single)
  }

  test("hourlyPartialsBy shares one scan and equals per-batch partials") {
    val bySplit = Incremental.hourlyPartialsBy(events, bucket(2) === 0)
    for (flag <- Seq(true, false)) {
      val viaBy = Incremental.merge(
        bySplit.filter(col("split") === flag).drop("split"))
      val direct = Incremental.merge(
        Incremental.hourlyPartials(events.filter(bucket(2) === 0 === flag)))
      assert(canon(viaBy) == canon(direct), s"flag=$flag")
    }
  }

  test("an empty batch is the merge identity") {
    val base = Incremental.hourlyPartials(events)
    val empty = Incremental.hourlyPartials(events.filter("event_id < 0"))
    assert(canon(Incremental.merge(base, empty)) == single)
  }
}
