package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-tolerance range join — all (left, right) pairs of the same key
  * whose timestamps differ by at most `tol` units.
  *
  * The direct formulation (`l.key = r.key AND abs(l.ts - r.ts) <= tol`)
  * makes Spark fall back to a sort-merge join on the key with a
  * post-filter — every same-key pair is generated before the range
  * predicate prunes, quadratic in key hotness. This is the BINNED
  * range join instead: both sides bucket by `floor(ts / tol)`; a pair
  * within tolerance differs by at most one bucket, so the left side
  * explodes to its 3 candidate buckets (b-1, b, b+1 — a constant
  * fan-out) and candidates come from an EQUALITY join on
  * (key, bucket), then pay the exact |diff| <= tol filter. Work is
  * proportional to true-ish pairs (bucket co-residents), not all
  * same-key pairs — the standard interval-binning trick.
  *
  * Output: left row + right (timestamp, value) as (r_timestamp, r_<valueCol>).
  */
object RangeJoin {

  def withinTolerance(left: DataFrame, right: DataFrame, key: String,
      tol: Long, rightValCol: String): DataFrame = {
    require(tol > 0, "tolerance must be positive")
    // exact floorDiv in pure Long arithmetic (pmod >= 0, so the
    // subtraction yields an exact multiple and integer `div` == floor —
    // same discipline as TsCatalog.bucketExpr; double `/` would be
    // exact here too but only by a representability argument)
    def bucket = expr(s"(timestamp - pmod(timestamp, ${tol}L)) div ${tol}L")
    val l = left
      .withColumn("_b0", bucket)
      .withColumn("_probe", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_b", col("_b0") + col("_probe"))
      .drop("_b0", "_probe")
    val r = right.select(
      col(key), bucket.as("_b"),
      col("timestamp").as("r_timestamp"),
      col(rightValCol).as(s"r_$rightValCol"))
    l.join(r, Seq(key, "_b"))
      .filter(abs(col("timestamp") - col("r_timestamp")) <= tol)
      .drop("_b")
  }
}
