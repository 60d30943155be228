package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Decontam.overlap semantics on hand-built fixtures: known shared
  * n-grams, gram multiplicity, short docs, and the no-cross-product
  * plan guarantee. */
class DecontamSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val w8 = "q w e r t y u i"          // 8 words → exactly one 8-gram
  private val w9 = "q w e r t y u i o"        // 9 words → two 8-grams

  test("known overlaps: exact 8-gram sharing, counts and verdicts") {
    val bench = Seq((100L, w8)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, w9),                               // shares gram 1 of 2 → hit
      (2L, "a b c d e f g h"),                // disjoint → clean
      (3L, "short doc"),                      // <8 words → 0 grams, clean
      (4L, w8 + " " + w8)                     // contains the gram (17 words)
    ).toDF("doc_id", "text")
    val r = Decontam.overlap(corpus, bench, 8)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r(1L) == ((2L, 1L, 5000L, 1L)))    // 1 of 2 grams hit → 5000 bp
    assert(r(2L) == ((1L, 0L, 0L, 0L)))
    assert(r(3L) == ((0L, 0L, 0L, 0L)))
    // 17 words → 10 8-grams, distinct: the repeated window dedups some;
    // verify only the verdict + that the shared gram was found
    assert(r(4L)._2 >= 1L && r(4L)._4 == 1L)
    assert(r.size == 4)                       // every corpus doc reported
  }

  test("per-doc distinct grams: repetition does not inflate hit counts") {
    // one doc repeating the benchmark 8-gram three times still counts
    // the gram ONCE (list_distinct semantics on both engines)
    val bench = Seq((100L, w8)).toDF("doc_id", "text")
    val corpus = Seq((1L, s"$w8 $w8 $w8")).toDF("doc_id", "text")
    val r = Decontam.overlap(corpus, bench, 8).head()
    assert(r.getLong(2) >= 1L)
    // n_hit counts distinct matched grams, so it is bounded by n_grams
    assert(r.getLong(2) <= r.getLong(1))
  }

  test("trainEvalOverlap partitions the corpus: eval docs never appear") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Decontam.trainEvalOverlap(docs, 20, 8)
    val evalIds = Sampling.uniformHash(docs, "doc_id", 20)
      .select("doc_id").as[Long].collect().toSet
    val outIds = out.select("doc_id").as[Long].collect().toSet
    assert(outIds.intersect(evalIds).isEmpty)
    assert(outIds.size + evalIds.size ==
      docs.select("doc_id").distinct().count())
  }

  test("plan has no cartesian product") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Decontam.trainEvalOverlap(docs, 20, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"decontam plan must join on the gram hash, got:\n$plan")
  }
}
