package graft.catalog

import org.apache.spark.sql.SparkSession

import graft.tsql.TimeEval

/** Maintenance entry point: retention enforcement + small-file
  * compaction across every series of a catalog — the scheduled-job
  * analog of the reference's inline flush/rotate
  * (src/timeseries.c:632-658), run out-of-band so the write path never
  * blocks on reorganization.
  *
  * Run: sbt "runMain graft.catalog.Maintenance <catalogRoot> [maxFilesPerBucket]"
  */
object Maintenance {

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      sys.error("usage: Maintenance <catalogRoot> [maxFilesPerBucket]"))
    val maxFiles = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-maintenance")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val summary = run(new TsCatalog(spark, root), maxFiles)
    summary.foreach { case (db, series, reaped, compacted) =>
      println(s"[maintenance] $db/$series: reaped $reaped bucket(s), compacted $compacted")
    }
    spark.stop()
  }

  /** Sweep all series: returns (db, series, reapedBuckets, compactedBuckets). */
  def run(catalog: TsCatalog, maxFilesPerBucket: Int = 8,
      nowNs: Long = TimeEval.nowNanos()): Seq[(String, String, Int, Int)] =
    for {
      db <- catalog.listDbs()
      series <- catalog.listSeries(db)
    } yield {
      val reaped = catalog.enforceRetention(db, series, nowNs)
      val compacted = catalog.compact(db, series, maxFilesPerBucket)
      (db, series, reaped, compacted)
    }
}
