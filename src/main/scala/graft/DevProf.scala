package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (dev only, not part of the driver contract). */
object DevProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
    li.count() // warm the scan
    for (rep <- 1 to 3) {
      println(s"== rep $rep ==")
      phase("q1_decimal30") {
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity").cast("decimal(30,6)")).as("a"),
            sum(col("l_extendedprice").cast("decimal(30,6)")).as("b"),
            sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(30,6)")).as("c"),
            sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).cast("decimal(30,6)")).as("d"),
            count(lit(1)).as("n"))
          .write.mode("overwrite").format("noop").save()
      }
      phase("q1_decimal18") {
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity").cast("decimal(18,6)")).as("a"),
            sum(col("l_extendedprice").cast("decimal(18,6)")).as("b"),
            sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)")).as("c"),
            sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).cast("decimal(18,6)")).as("d"),
            count(lit(1)).as("n"))
          .write.mode("overwrite").format("noop").save()
      }
      phase("q1_double") {
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity").as("a"), sum("l_extendedprice").as("b"),
            sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("c"),
            sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("d"),
            count(lit(1)).as("n"))
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
