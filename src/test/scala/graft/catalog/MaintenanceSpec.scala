package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide maintenance sweep (retention + compaction). */
class MaintenanceSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("sweep reaps expired buckets and compacts fragmented ones across all series") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-maint").toString
    try {
      val cat = new TsCatalog(spark, root)
      val now = 1700000000000000000L
      cat.createDb("m")
      // fragmented series: 10 single-point appends in one bucket
      cat.createSeries("m", "frag", SeriesMeta(None))
      for (i <- 0 until 10)
        cat.insert("m", "frag", Seq((now + i, i.toDouble)).toDF("timestamp", "value"))
      // expiring series: one stale bucket (1 h old), 30 min retention
      cat.createSeries("m", "exp", SeriesMeta(Some(1800L * 1000000000L)))
      cat.insert("m", "exp", Seq(
        (now - 3600L * 1000000000L, 1.0), (now, 2.0)).toDF("timestamp", "value"))

      val summary = Maintenance.run(cat, maxFilesPerBucket = 2, now = now)
        .map(t => t._2 -> (t._3, t._4)).toMap
      assert(summary("frag") == ((0, 1))) // nothing expired, 1 bucket compacted
      assert(summary("exp")._1 == 1)      // 1 stale bucket reaped

      // data intact after the sweep
      assert(cat.readSeries("m", "frag").count() == 10)
      assert(cat.readSeries("m", "exp").collect().map(_.getDouble(1)).toSeq == Seq(2.0))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }
}
