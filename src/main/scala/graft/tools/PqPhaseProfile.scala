package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only phase decomposition of a bench key's timed region (guide
  * §1: measure before changing): splits one rep of a declared query
  * into
  *
  *   build — `queries(key)(spark, dir)` returning the DataFrame; for
  *           the sim family this includes the driver-side k-means /
  *           PQ training jobs (collect + treeAggregate rounds);
  *   plan  — forcing `queryExecution.executedPlan` (analysis +
  *           optimization + physical planning, no execution);
  *   exec  — the noop write (codegen + run).
  *
  * Run: sbt "runMain graft.tools.PqPhaseProfile [sfDir] [reps] [k1,k2]"
  * Prints one JSON line with per-key phase medians + job counts.
  */
object PqPhaseProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val keys = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(Seq("sim_topk_ivf_pq", "sim_recall_pq"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("pq-phase-profile")
      .config("spark.sql.shuffle.partitions", cpus)
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
    spark.read.parquet(s"$dir/embeddings.parquet").count()

    def timeOnce(key: String): (Double, Double, Double, Int) = {
      graft.core.EscapedCaches.release()
      spark.sharedState.cacheManager.clearCache()
      graft.ops.Similarity.clearCodebookMemo()
      System.gc(); Thread.sleep(150); System.gc()
      jobs.set(0)
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(key)(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analyze+optimize+plan
      val t2 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t3 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9, jobs.get)
    }
    def med(xs: Seq[Double]): Double = { val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2 }
    keys.foreach(timeOnce) // warm rep per key: codegen caches
    val body = keys.map { k =>
      val rs = (1 to reps).map(_ => timeOnce(k))
      s""""$k":{"build":${f"${med(rs.map(_._1))}%.3f"},""" +
        s""""plan":${f"${med(rs.map(_._2))}%.3f"},""" +
        s""""exec":${f"${med(rs.map(_._3))}%.3f"},""" +
        s""""jobs":${rs.map(_._4).max}}"""
    }.mkString(",")
    println(s"""{"probe":"pq_phase","sf":"$dir","reps":$reps,$body}""")
    spark.stop()
  }
}
