package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Bucketed co-located joins — the repeated-join layout of the 100 TB
  * plan: write both fact tables bucketed (and sorted) on the join key
  * ONCE, and every subsequent join on that key reads bucket-aligned
  * files and merges them with NO shuffle exchange on either side —
  * Spark's SortMergeJoin recognizes the matching `bucketBy` output
  * partitioning. At corpus scale this converts every
  * orders⋈lineitem-class join from two full shuffles into a narrow
  * zipped read; the one-time bucketed write amortizes over every query
  * that joins on the key (the classic warehouse layout decision).
  *
  * Tables are EXTERNAL (explicit `path` under java.io.tmpdir) so the
  * session's default warehouse (./spark-warehouse in the calling
  * process' cwd) is never touched; registration is per-session and
  * idempotent per (session, sfDir).
  *
  * PlanSpec locks the exchange-free plan shape; the
  * `join_bucketed_revenue` gate key locks result parity against the
  * plain-join oracle.
  */
object Bucketed {

  val Buckets = 8

  /** Ensure orders+lineitem exist as bucketed tables for `dir`;
    * returns (ordersTable, lineitemTable). */
  def ensurePair(spark: SparkSession, dir: String): (String, String) = synchronized {
    val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
    val (ot, lt) = (s"orders_bkt_$safe", s"lineitem_bkt_$safe")
    val root = sys.props("java.io.tmpdir") + s"/graft_bucketed_$safe"
    if (!spark.catalog.tableExists(ot)) {
      Tables.load(spark, dir, "orders")
        .write.mode("overwrite").option("path", s"$root/$ot")
        .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ot)
    }
    if (!spark.catalog.tableExists(lt)) {
      Tables.load(spark, dir, "lineitem")
        .write.mode("overwrite").option("path", s"$root/$lt")
        .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(lt)
    }
    (ot, lt)
  }

  /** Revenue by order priority over the bucketed pair: the join runs
    * exchange-free on the bucket layout; only the tiny
    * priority-cardinality aggregate shuffles. */
  def revenueByPriority(spark: SparkSession, dir: String): DataFrame = {
    val (ot, lt) = ensurePair(spark, dir)
    spark.table(lt)
      .join(spark.table(ot), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(30,6)")).cast("double"), 4).as("revenue"),
        count(lit(1)).as("n"))
  }
}
