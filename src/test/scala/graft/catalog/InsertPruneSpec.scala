package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Ignore-policy insert pruning: the existing-side read must prune to
  * the batch's bucket span without ever inlining an unbounded literal
  * list into the plan (VERDICT r3 watch item — a years-long backfill
  * into fine buckets would otherwise put 10^5-10^6 literals in one
  * In()). Narrow batches keep the exact IN filter; wide batches
  * degrade to min/max range bounds on the ordered bucket column.
  */
class InsertPruneSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // 1 µs buckets make "thousands of buckets" cheap to span
  private def freshCatalog(): TsCatalog = new TsCatalog(
    spark, Files.createTempDirectory("graft-prune-spec").toString,
    bucketNs = 1000L)

  private def batchDf(tss: Seq[Long]) = {
    import spark.implicits._
    tss.map(t => (t, 1.0)).toDF("timestamp", "value")
  }

  test("narrow batch keeps the exact per-bucket IN filter") {
    val cat = freshCatalog()
    // 5 points in 3 distinct 1µs buckets
    val pred = cat.bucketPrunePredicate(
      batchDf(Seq(1000L, 1001L, 2000L, 3000L, 3999L)))
    val s = pred.toString
    assert(s.contains("in(bucket"), s"expected IN filter, got $s")
    assert(!s.contains(">="), s"expected no range bounds, got $s")
  }

  test("wide batch degrades to O(1) range bounds, never a huge IN list") {
    val cat = freshCatalog()
    // 1500 points in 1500 distinct buckets — over the 1000-literal cap
    val pred = cat.bucketPrunePredicate(
      batchDf((0 until 1500).map(i => i * 1000L + 7L)))
    val s = pred.toString
    assert(!s.contains("in(bucket"), s"expected no IN literal list, got $s")
    assert(s.contains(">=") && s.contains("<="), s"expected range bounds, got $s")
    // bounds are the batch's floorDiv bucket extremes
    assert(s.contains("0") && s.contains("1499"), s)
  }

  test("ignore-policy dedup stays exact across the wide-batch fallback") {
    val cat = freshCatalog()
    cat.createDb("db")
    cat.createSeries("db", "s", SeriesMeta(None, dupPolicy = "ignore"))
    // first ingest: 1200 points, one per bucket
    val first = (0 until 1200).map(i => i * 1000L)
    assert(cat.insert("db", "s", batchDf(first)) == 1200L)
    // second ingest overlaps 1100 of them and adds 400 new, again over
    // the literal cap — the range-bounded existing read must still feed
    // an exact timestamp anti-join
    val second = (100 until 1600).map(i => i * 1000L)
    assert(cat.insert("db", "s", batchDf(second)) == 400L)
    assert(cat.readSeries("db", "s").count() == 1600L)
  }
}
