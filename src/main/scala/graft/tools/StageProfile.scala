package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only per-stage attribution for one bench key (guide §7.1: find
  * WHICH stage is slow before touching anything): runs the key with
  * Bench's session config + per-rep hygiene and prints every completed
  * stage's wall time, task count, executor run/CPU time, shuffle
  * read/write bytes and records — the Stages-tab view, as text.
  *
  * Run: sbt "runMain graft.tools.StageProfile <key> [sfDir] [reps]"
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("dedup_containment")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("stage-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${32 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B knobs for the parallelism-floor experiment (guide §2.5/§6);
    // min-part floor defaults to Bench's so profiles match the fleet
    sys.env.get("GRAFT_OPEN_COST").foreach(v =>
      b.config("spark.sql.files.openCostInBytes", v))
    b.config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      sys.env.getOrElse("GRAFT_MIN_PART_SIZE", s"${256 * 1024}"))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class St(name: String, tasks: Int, wallMs: Long, runMs: Long,
        cpuMs: Long, srMB: Double, swMB: Double, inMB: Double, recs: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(-1L)
        stages += St(si.name.takeWhile(_ != '\n').take(90), si.numTasks,
          wall, m.executorRunTime, m.executorCpuTime / 1000000,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.inputMetrics.bytesRead / 1e6,
          m.inputMetrics.recordsRead)
      }
    })
    spark.read.parquet(s"$dir/region.parquet").count()

    def once(): Double = {
      graft.core.EscapedCaches.release()
      spark.sharedState.cacheManager.clearCache()
      graft.ops.Similarity.clearCodebookMemo()
      System.gc(); Thread.sleep(150); System.gc()
      stages.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(key)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm
    val secs = (1 to reps).map(_ => once())
    println(f"== $key: reps ${secs.map(s => f"$s%.3f").mkString(", ")} (last rep's stages below)")
    println(f"${"wall_ms"}%8s ${"run_ms"}%8s ${"cpu_ms"}%8s ${"tasks"}%6s " +
      f"${"in_MB"}%8s ${"sh_r_MB"}%8s ${"sh_w_MB"}%8s ${"in_recs"}%10s  name")
    stages.foreach { s =>
      println(f"${s.wallMs}%8d ${s.runMs}%8d ${s.cpuMs}%8d ${s.tasks}%6d " +
        f"${s.inMB}%8.1f ${s.srMB}%8.1f ${s.swMB}%8.1f ${s.recs}%10d  ${s.name}")
    }
    spark.stop()
  }
}
