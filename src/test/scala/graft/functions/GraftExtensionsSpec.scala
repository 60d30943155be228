package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions wiring path must expose the SAME function
  * surface as GraftFunctions.register — both derive from one list, and
  * this spec locks it (the round-3 review found the paths had drifted
  * by three functions). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("every native function resolves through the extensions path") {
    // getOrCreate would silently REUSE the suite-shared session and
    // never apply the extensions — clear, build fresh (same underlying
    // SparkContext), restore the prior sessions afterwards
    val priorDefault = SparkSession.getDefaultSession
    val priorActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession(); SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import spark.implicits._
      val row = Seq(("the quick brown fox jumps high", Array(1.0f, 2.0f)))
        .toDF("text", "vec")
        .selectExpr(
          "size(shingles3(text)) AS shingles",
          "dot_dec(vec, vec) AS dd",
          "text_stats_scan(text).n_tokens AS toks",
          "q8_pack(vec).scale6 AS s6",
          "dot_int(q8_pack(vec).q, q8_pack(vec).q) AS di",
          "bpe_count(text) AS bpe",
          "lang_scan(text).en_hits AS en")
        .collect()(0)
      assert(row.getAs[Int]("shingles") == 4)
      assert(row.getAs[Double]("dd") == 5.0)
      assert(row.getAs[Long]("toks") == 6L)
      assert(row.getAs[Long]("s6") == 2000000L)
      assert(row.getAs[Long]("di") > 0L)
      assert(row.getAs[Long]("bpe") > 0L)
      assert(row.getAs[Long]("en") == 1L)
      // tiny-magnitude vector: published scale clamps to 1 (not 0) so
      // integer candidate scores don't all collapse to zero
      val tiny = Seq(Tuple1(Array(1e-8f, -2e-8f))).toDF("vec")
        .selectExpr("q8_pack(vec).scale6 AS s6").collect()(0)
      assert(tiny.getAs[Long]("s6") == 1L)
      // the aggregate function needs a grouped context to resolve
      val agg = Seq(("k", 1.25), ("k", 2.25)).toDF("k", "v")
        .groupBy("k").agg(expr("sum_micro(v) AS s")).collect()(0)
      assert(agg.getAs[Double]("s") == 3.5)
    } finally {
      SparkSession.clearDefaultSession(); SparkSession.clearActiveSession()
      priorDefault.foreach(SparkSession.setDefaultSession)
      priorActive.foreach(SparkSession.setActiveSession)
    }
  }
}
