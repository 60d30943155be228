package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation aggregation patterns.
  *
  * A `groupBy` on a LOW-CARDINALITY key (event types, languages,
  * country codes) is a scale trap: with k distinct keys, at most k
  * reducer tasks do all the work no matter how many executors exist —
  * at 100 TB, five hot keys mean five straggler tasks holding the
  * stage. Spark's map-side partial aggregation already bounds the
  * shuffled VOLUME, but the final merge still lands on one task per
  * key; salting additionally spreads each key's merge work across
  * `nSalts` tasks at the cost of one extra (tiny) shuffle over
  * key-cardinality × nSalts rows.
  *
  * The salt is DETERMINISTIC (pmod of a hash of a caller-chosen
  * column), so results are reproducible and oracle-checkable — never
  * `rand()`, which would break retry idempotency (a re-run task would
  * re-salt differently mid-query).
  */
object Skew {

  /** Exact DECIMAL sum + count per key via salted two-phase
    * aggregation. Phase 1 groups by (key, salt) with partial
    * aggregation; phase 2 combines the nSalts partials per key.
    * DECIMAL addition is associative, so the result is bit-identical
    * to a direct single-phase groupBy (and to the SQL oracle's).
    * Output: (key, sum_value rounded to 4, n).
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      saltBy: String, nSalts: Int = 16): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val salted = df.withColumn("salt", pmod(hash(col(saltBy)), lit(nSalts)))
    val partial = salted.groupBy(col(key), col("salt"))
      .agg(sum(col(valueCol).cast("decimal(30,6)")).as("psum"),
        count(lit(1)).as("pn"))
    partial.groupBy(col(key))
      .agg(round(sum(col("psum")).cast("double"), 4).as("sum_value"),
        sum(col("pn")).as("n"))
  }

  /** Exact distinct count per key without a skewed single-phase
    * count(distinct): phase 1 dedups (key, dval) pairs — a shuffle on
    * the PAIR, which is high-cardinality and therefore balanced even
    * when the key alone is hot — phase 2 counts per key. */
  def twoPhaseCountDistinct(df: DataFrame, key: String, distinctCol: String): DataFrame =
    df.select(col(key), col(distinctCol))
      .distinct()
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_distinct"))
}
