package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

/** Dev-only job/stage census of a gate key — the "fewer jobs in the
  * plan audit" evidence for multi-job keys (r15 verdict #5): runs
  * `SparkEntry.queries(key)` once to warm (codegen, broadcast
  * thresholds), then counts Spark jobs and stages over a timed second
  * run. Run: sbt "runMain graft.tools.JobCount <key> [sfDir]". */
object JobCount {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("dedup_containment")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("job-count")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageSubmitted(ss: SparkListenerStageSubmitted): Unit =
        stages.incrementAndGet()
    })
    def run(): Unit = {
      graft.SparkEntry.queries(key)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      graft.core.EscapedCaches.release()
    }
    run() // warm
    jobs.set(0); stages.set(0)
    val t0 = System.nanoTime()
    run()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"key":"$key","jobs":${jobs.get},"stages":${stages.get},"sec":$sec%.2f}""")
    spark.stop()
  }
}
