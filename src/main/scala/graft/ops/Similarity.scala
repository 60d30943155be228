package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths (SURVEY.md §7.2 step 7 extension surface):
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small)
  *    query set against a full scan of the corpus; one pass, no
  *    shuffle except the final per-query top-k (TakeOrdered inside a
  *    window). The correctness baseline.
  *  - [[lshBucketTopK]]: sign-random-projection LSH — deterministic
  *    hyperplanes derived from the shared md5 hash, so buckets are
  *    reproducible in any engine. At scale: bucketing is a narrow map;
  *    candidate generation is an equality join on bucket id; only
  *    bucket-mates pay the exact cosine.
  *
  * Dot products fold left-to-right as exact DECIMAL(30,12) so results
  * are bit-identical across engines and partitionings (see
  * SeriesOps.exactAvg for the rationale).
  */
object Similarity {

  /** Exact decimal dot product of two float-array columns (as double). */
  def dotDec(a: String, b: String): Column = expr(
    s"""CAST(aggregate(zip_with($a, $b,
       |  (x, y) -> CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(30,12))),
       |  CAST(0 AS DECIMAL(30,12)),
       |  (acc, v) -> CAST(acc + v AS DECIMAL(30,12))) AS DOUBLE)""".stripMargin)

  /** L2 norm of a float-array column via the same exact accumulation. */
  def normDec(a: String): Column = sqrt(expr(
    s"""CAST(aggregate($a,
       |  CAST(0 AS DECIMAL(30,12)),
       |  (acc, x) -> CAST(acc + CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(30,12)) AS DECIMAL(30,12))) AS DOUBLE)""".stripMargin))

  def cosine(a: String, b: String, normA: Column, normB: Column): Column =
    round(dotDec(a, b) / (normA * normB), 4)

  /** Exact top-k cosine neighbors for each query vector.
    * `queryPred` selects the query rows (e.g. vec_id < 5).
    * Output: (query_id, neighbor_id, sim, rank).
    */
  def bruteForceTopK(embeddings: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val base = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", normDec("embedding"))
    val queries = base.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn"))
    val pairs = base.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine("qe", "embedding", col("qn"), col("nrm")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic hyperplanes: component d of plane p is
    * (h60("plane:p:d") mod 2001 - 1000) / 1000 ∈ [-1, 1]. Generated
    * driver-side from the shared hash so the oracle SQL can inline the
    * same constants. */
  def planes(nPlanes: Int, dim: Int): Seq[Array[Double]] =
    (0 until nPlanes).map { p =>
      Array.tabulate(dim) { d =>
        (TextFns.h60Scala(s"plane:$p:$d") % 2001 - 1000) / 1000.0
      }
    }

  /** Sign-LSH bucket id: bit p set iff dot(plane_p, v) >= 0. */
  def bucketId(embCol: String, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      val planeLit = plane.mkString("array(", "D,", "D)")
      val dot = expr(
        s"""CAST(aggregate(zip_with($embCol, $planeLit,
           |  (x, y) -> CAST(CAST(x AS DOUBLE) * y AS DECIMAL(30,12))),
           |  CAST(0 AS DECIMAL(30,12)),
           |  (acc, v) -> CAST(acc + v AS DECIMAL(30,12))) AS DOUBLE)""".stripMargin)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: only pairs sharing an LSH bucket are scored.
    * Output: (query_id, neighbor_id, sim, rank) — recall vs
    * [[bruteForceTopK]] is validated in SimilaritySpec. */
  def lshBucketTopK(embeddings: DataFrame, queryPred: Column, k: Int,
      nPlanes: Int = 6, dim: Int = 64): DataFrame = {
    val ps = planes(nPlanes, dim)
    val base = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", normDec("embedding"))
      .withColumn("bucket", bucketId("embedding", ps))
    val queries = base.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("bucket").as("qb"))
    val pairs = base.join(broadcast(queries),
        col("bucket") === col("qb") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine("qe", "embedding", col("qn"), col("nrm")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs within label blocks: all same-label
    * pairs with rounded cosine >= threshold. Blocking keys bound the
    * quadratic term; at 100 TB the label would be an LSH bucket id
    * instead (same plan shape). Output: (vec_a, vec_b, sim). */
  def embeddingDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val base = embeddings.select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("nrm", normDec("embedding"))
    base.as("a").join(base.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine("a.embedding", "b.embedding",
          col("a.nrm"), col("b.nrm")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
