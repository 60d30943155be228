package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for bench queries to one file per key —
  * the optimization-round evidence trail (plans/rN/<key>_before.txt /
  * _after.txt). Run:
  *
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> [k1,k2,...]"
  *
  * Uses the same session shape as graft.Bench (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus, AQE on, 32 MB splits) so the dumped plans
  * are the plans the bench actually runs. Queries that train driver-side
  * models (the sim family) execute their training jobs during plan
  * construction — that is part of the declared query and is dumped as-is.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r16")
    val suffix = args.lift(2).getOrElse("before")
    val keys: Seq[String] = args.lift(3) match {
      case Some(csv) => csv.split(",").toSeq
      case None => Bench.headlineKeys
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${32 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    keys.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown key: $name")
        case Some(fn) =>
          graft.core.EscapedCaches.release()
          spark.sharedState.cacheManager.clearCache()
          graft.ops.Similarity.clearCodebookMemo()
          val txt = try {
            val df = fn(spark, sfDir)
            val buf = new ByteArrayOutputStream()
            Console.withOut(new PrintStream(buf, true, "UTF-8")) {
              df.explain("formatted")
            }
            buf.toString("UTF-8")
          } catch {
            case scala.util.control.NonFatal(e) =>
              s"PLAN FAILED: ${e.getMessage}\n"
          }
          Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
            txt.getBytes(StandardCharsets.UTF_8))
          println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
      }
    }
    spark.stop()
  }
}
