package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev-only: verify the grouping-sets fine-state rework reads the
  * corpus ONCE and plans no Expand — from EXECUTED-PLAN METRICS, not
  * plan text (a textual "Scan parquet" count double-counts the scan
  * description embedded in cached/reused subtree printouts; r11: that
  * misled a persist experiment that then measured SLOWER than AQE's
  * own exchange reuse). Prints total rows actually emitted by parquet
  * scan nodes vs the table's row count.
  * Run: sbt "runMain graft.tools.RollupPlanCheck [sfDir]" */
object RollupPlanCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("rollup-plan-check")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val total = spark.read.parquet(s"$dir/events.parquet").count()

    // QueryStageExec and ReusedExchangeExec are LEAVES whose real
    // subtree hangs off `plan`/`child` fields — walk them explicitly,
    // but count a reused exchange's scan only once (skip Reused*)
    def scanRows(p: SparkPlan): Long = p match {
      case a: AdaptiveSparkPlanExec => scanRows(a.executedPlan)
      case s: FileSourceScanExec =>
        s.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scanRows(q.plan)
      case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => 0L
      case other => other.children.map(scanRows).sum
    }

    for (key <- Seq("agg_rollup_sets", "agg_cube")) {
      val df = graft.SparkEntry.queries(key)(spark, dir)
      // collect() executes THIS dataset's queryExecution (a noop write
      // plans a separate one whose metrics we'd never see); output is
      // the state-sized level union, driver-safe at any corpus scale
      df.collect()
      val plan = df.queryExecution.executedPlan
      val rows = scanRows(plan)
      val expands = "Expand".r.findAllIn(plan.toString).length
      println(s"[rollupplan] $key scanRows=$rows tableRows=$total " +
        s"ratio=${rows.toDouble / total} expands=$expands")
    }
    spark.stop()
  }
}
