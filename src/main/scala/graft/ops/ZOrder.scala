package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-column layout — the file-clustering
  * primitive for multi-dimensional range queries at 100 TB (the
  * technique behind Delta's OPTIMIZE ZORDER BY and Hudi clustering):
  * interleave the bits of several bucketized columns into one key,
  * then range-partition + sort the write by that key. Rows close in
  * the z-key are close in EVERY interleaved dimension, so parquet
  * row-group min/max stats become tight rectangles and a selective
  * filter on ANY of the clustered columns prunes most files — a
  * single-column sort gives that for one column only.
  *
  * The key is pure bit arithmetic over longs (`shiftleft`/`&`/`|`
  * folds — no UDF, no allocation), so it rides whole-stage codegen
  * and costs one projection; the layout itself is one
  * `repartitionByRange` (a range shuffle with driver sampling) plus a
  * partition-local sort — exactly the cost of any clustered write, no
  * extra passes. ZOrderSpec proves the locality claim measurably:
  * per-partition bounding boxes of a z-clustered grid cover a small
  * fraction of what a single-column range layout covers on the
  * non-sorted dimension.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each column (already bucketized
    * to [0, 2^bits)) into one z-key: bit i of column j lands at
    * position i*d + j. d*bits must fit a long's sign-free range. */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    val d = cols.size
    require(d >= 2, s"z-order needs >= 2 columns, got $d")
    require(bits >= 1, s"bits must be >= 1, got $bits")
    require(d * bits <= 63, s"d*bits must be <= 63, got ${d * bits}")
    cols.zipWithIndex.foldLeft(lit(0L)) { case (acc, (c, j)) =>
      (0 until bits).foldLeft(acc) { (a, i) =>
        // c & (1<<i) keeps bit i in place; shifting by i*(d-1)+j moves
        // it from position i to position i*d + j
        a.bitwiseOR(shiftleft(c.bitwiseAND(lit(1L << i)), i * (d - 1) + j))
      }
    }
  }

  /** The same interleave as engine-portable SQL text (shared constant
    * generator for the DuckDB oracle — one derivation, two renderings,
    * the discipline every gated model constant in this repo follows). */
  def interleaveSql(cols: Seq[String], bits: Int): String = {
    val d = cols.size
    require(d >= 2 && bits >= 1 && d * bits <= 63)
    cols.zipWithIndex.flatMap { case (c, j) =>
      (0 until bits).map(i => s"(($c & ${1L << i}) << ${i * (d - 1) + j})")
    }.mkString("(", " | ", ")")
  }

  /** Cluster a dataframe for writing: range-partition on the z-key and
    * sort each partition by it. `numPartitions` sizes output files;
    * the caller writes the result with its usual writer. */
  def cluster(df: DataFrame, zKey: Column, numPartitions: Int): DataFrame = {
    val withZ = df.withColumn("__z", zKey)
    withZ.repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
