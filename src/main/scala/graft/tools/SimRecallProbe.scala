package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only one-window runner of the staleness-pair falsification
  * triplet (r16, verdict #5): times the `pair` / `onearm` / `memo`
  * ablations of `SimilaritySurface.stalenessProbe` back-to-back in ONE
  * JVM with Bench's per-rep hygiene (cache drain, codebook-memo clear,
  * double GC), counting Spark jobs per rep — so the three modes'
  * deltas are same-window and the job-floor half of the r15
  * decomposition is measured, not narrated.
  *
  * Run: sbt "runMain graft.tools.SimRecallProbe [sfDir] [reps]".
  * Prints one JSON line: per-mode raw secs + medians + job counts,
  * plus a GRAFT_BOX_STATE stamp.
  */
object SimRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("sim-recall-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${32 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    // warm-up: parquet reader + the shared codegen paths, as in Bench
    spark.read.parquet(s"$dir/embeddings.parquet").count()

    def timeOnce(mode: String): (Double, Int) = {
      graft.core.EscapedCaches.release()
      spark.sharedState.cacheManager.clearCache()
      graft.ops.Similarity.clearCodebookMemo()
      System.gc(); Thread.sleep(150); System.gc()
      jobs.set(0)
      val t0 = System.nanoTime()
      graft.queries.SimilaritySurface.stalenessProbe(spark, dir, mode)
        .write.mode("overwrite").format("noop").save()
      ((System.nanoTime() - t0) / 1e9, jobs.get)
    }
    val modes = Seq("pair", "onearm", "memo")
    timeOnce("pair") // one warm rep: codegen/broadcast paths for all modes
    val out = modes.map(m => m -> (1 to reps).map(_ => timeOnce(m)))
    def med(xs: Seq[Double]): Double = { val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2 }
    val body = out.map { case (m, rs) =>
      val secs = rs.map(_._1)
      s""""$m":{"raw":${secs.map(x => f"$x%.3f").mkString("[", ",", "]")},""" +
        f""""median":${med(secs)}%.3f,"jobs":${rs.map(_._2).max}}"""
    }.mkString(",")
    val label = sys.env.getOrElse("GRAFT_BOX_STATE", "unspecified")
      .replace("\\", "\\\\").replace("\"", "\\\"")
    println(s"""{"probe":"sim_recall_staleness","sf":"$dir","reps":$reps,""" +
      s"""$body,"box_state":"$label"}""")
    spark.stop()
  }
}
