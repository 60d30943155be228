package graft.ops

import org.apache.spark.sql.DataFrame

/** Distributed training of a LINEAR QUALITY PROBE — the distillation
  * step of a curation pipeline: the Gopher-class repetition/length
  * filter is the expensive verdict (regex walks, gram distincts), and
  * production corpora score every document with a cheap linear model
  * TRAINED to approximate it (the fastText-quality-classifier
  * pattern). The engine until now only CONSUMED such models
  * (text_classifier ships frozen weights); this operator produces one
  * on the cluster.
  *
  * Gradient descent over a surrogate logistic loss, engineered so the
  * trained weights are a CROSS-ENGINE INTEGER-EXACT fact the DuckDB
  * oracle reproduces bit-for-bit (no ML library, no RNG, no libm):
  *
  *  - features are the Gopher metrics themselves, each re-expressed
  *    as the signed distance from its hand-tuned band threshold (the
  *    distillation target: replace the hard band CONJUNCTION with a
  *    smooth learned score over the same evidence);
  *  - the sigmoid is a DETERMINISTIC PIECEWISE POLYNOMIAL
  *    ([[sigmoidSql]] — monotone on its clamp interval, σ̃(0)=0.5):
  *    IEEE `exp` is not reproducible across engines, polynomial
  *    arithmetic in a fixed shape is;
  *  - per-row gradient contributions quantize by FLOOR (binary-exact
  *    on identical doubles — `round` on doubles diverges between
  *    Spark's shortest-repr HALF_UP and binary rounding) at 1e-9,
  *    offset non-negative, and accumulate as hi/lo-split integer sums
  *    (order-independent, overflow-safe past 10¹⁵ rows — the acf
  *    discipline, including its non-negative `div`≡`//` requirement);
  *  - the weight update runs the identical IEEE double chain on both
  *    sides (driver scala vs unrolled SQL CTE rounds — the pagerank
  *    unrolling convention).
  *
  * Shape at scale: the featurized corpus persists once; each round is
  * ONE map-side-combining aggregation (10 long sums); weights are
  * driver model state (5 doubles). Exactly the IVF training shape.
  *
  * Output: one row per weight (feature, weight6 = floor(w·10⁶)) plus
  * the training accuracy of the final model (n_correct, n repeated on
  * every row — gate-friendly single relation).
  */
object Probe {

  /** Gradient fixed-point scale (1e-9 quantization). */
  val GQ = 1000000000L
  /** Per-row offset making quantized gradients non-negative: |d·f| ≤ 1
    * ⇒ |gq| ≤ GQ, so gq + OFF ∈ [0, 2·GQ] and truncating/floor integer
    * division agree on the split sums. */
  val OFF = 1000000000L
  val LR = "4.0"
  val Iters = 32

  /** (name, scaling text) over the Gopher metric relation — shared
    * verbatim by the Spark projection and the oracle CTE. Each feature
    * is the SIGNED DISTANCE from its hand-tuned band threshold (words
    * from 30, mean word length from the 3-10 char band center, dup
    * grams from their 6%/2% ceilings, top-word share from 15%),
    * clamped and scaled to ~[-1, 1]: centering at the decision
    * boundaries is what makes the verdict linearly learnable — the
    * first formulation scaled by corpus maxima, squashed the dominant
    * signal into a 0.05-wide band, and converged to the majority
    * class (r9 tuning note). */
  val FEATURES: Seq[(String, String)] = Seq(
    "f_words" -> "((CAST(least(n_words, 150) AS DOUBLE) - 30.0) / 120.0)",
    "f_mwl" -> "((CAST(greatest(least(mean_word_len_bp, 120000), 10000) AS DOUBLE) - 65000.0) / 55000.0)",
    "f_dup2" -> "((CAST(least(dup_2gram_bp, 2000) AS DOUBLE) - 600.0) / 1400.0)",
    "f_dup3" -> "((CAST(least(dup_3gram_bp, 400) AS DOUBLE) - 200.0) / 200.0)",
    "f_top" -> "((CAST(least(top_word_bp, 3000) AS DOUBLE) - 1500.0) / 1500.0)")

  val WeightNames: Seq[String] = "bias" +: FEATURES.map(_._1)

  /** σ̃(z): cubic logistic surrogate 0.5 + z(1/4 − z²/48), clamped at
    * |z| ≥ 2 (monotone on the interval: σ̃' = 1/4 − z²/16 ≥ 0). Fixed
    * expression shape — identical IEEE ops in any engine. */
  def sigmoidSql(z: String): String =
    s"(CASE WHEN ($z) <= -2.0 THEN 0.0 WHEN ($z) >= 2.0 THEN 1.0 " +
      s"ELSE 0.5 + ($z) * (0.25 - ($z) * ($z) * 0.020833333333333332) END)"

  /** Left-associated dot product text: ((((b + w1·f1) + w2·f2) + …). */
  def zSql(wRefs: Seq[String]): String =
    FEATURES.map(_._1).zip(wRefs.tail).foldLeft(wRefs.head) {
      case (acc, (f, w)) => s"($acc + $w * $f)"
    }

  /** The 2·|w| gradient aggregation texts for one round: per weight j,
    * hi/lo sums of the offset floor-quantized contribution. `divOp` is
    * the dialect's integer division (`div` Spark, `//` DuckDB) — the
    * operands are non-negative by the OFF shift, where the two agree. */
  def gradAggSqls(wRefs: Seq[String], divOp: String): Seq[String] = {
    val d = s"(${sigmoidSql(zSql(wRefs))} - y)"
    WeightNames.indices.flatMap { j =>
      val contrib = if (j == 0) d else s"($d * ${FEATURES(j - 1)._1})"
      val gq = s"(CAST(floor($contrib * 1000000000.0) AS BIGINT) + $OFF)"
      Seq(s"CAST(sum($gq $divOp 1000000) AS BIGINT) AS h$j",
        s"CAST(sum($gq % 1000000) AS BIGINT) AS l$j")
    }
  }

  /** w_j ← w_j − lr·((g_j/10⁹)/n), g_j reconstructed from the split
    * sums minus the offset mass — the exact double chain both the
    * driver loop and the oracle CTEs run. */
  def updateSql(wRef: String, j: Int, nRef: String): String =
    s"($wRef - $LR * ((CAST((h$j * 1000000 + l$j) - $nRef * $OFF AS DOUBLE) " +
      s"/ 1000000000.0) / CAST($nRef AS DOUBLE)))"

  /** Exact double → SQL text that parses back to the same double in
    * any engine (string→double parse is correctly rounded). */
  private def dbl(d: Double): String = s"CAST('${d.toString}' AS DOUBLE)"

  /** Train on a relation carrying the Gopher metric columns plus
    * `keep`: `iters` rounds of the shared-text gradient aggregation,
    * then one accuracy pass with the final weights.
    * Output: (feature, weight6, n_correct, n). At the fixture's 65%
    * keep rate the trained probe reaches ~78% accuracy — it learns
    * the band structure (weight on words-above-minimum comes out
    * POSITIVE, weights on the repetition ceilings NEGATIVE; ProbeSpec
    * locks the signs and the above-majority accuracy), it does not
    * memorize the verdict: a conjunction of hard cuts is not linearly
    * separable, and the probe's value is exactly its SMOOTH score for
    * ranking borderline documents where the bands say only yes/no. */
  /** The projection both train and score run on: label + features
    * (+ doc_id when the caller's relation carries one — scoring needs
    * it, the gradient aggregations ignore it). */
  private def featurize(statsWithLabel: DataFrame): DataFrame = {
    val id = if (statsWithLabel.columns.contains("doc_id")) Seq("doc_id") else Nil
    statsWithLabel.selectExpr(
      id ++ Seq("CAST(keep AS DOUBLE) AS y") ++
        FEATURES.map { case (n, t) => s"$t AS $n" }: _*)
  }

  /** The GD loop over a persisted featurized relation — the shared
    * core of train/score.
    *
    * Round shape (r10 rework, the trainIvfPqCodebooksOn convention):
    * ONE treeAggregate per round over a cached primitive RDD of the
    * featurized rows, weights broadcast in the task closure. The first
    * formulation re-planned a 12-aggregate selectExpr per round; with
    * fresh weight LITERALS each round the whole-stage source is new,
    * so Janino re-compiled every round — a measured ~180 ms/round
    * floor at sf0.1 of which ~10 ms was the actual 5k-row aggregation.
    * The treeAggregate round is the same map-side-combining 12-sum
    * job with zero planning/codegen (~20 ms/round; 5.3 s → ~2 s
    * headline).
    *
    * Bit-exactness is preserved because the per-row chain mirrors
    * [[gradAggSqls]] op for op in the same shape: the left-associated
    * z fold, the clamped cubic sigmoid polynomial with the same
    * coefficient doubles, contrib = (σ̃(z)−y)[·f_j], gq =
    * floor(contrib·10⁹)+OFF as a Long (gq ≥ 0 by the clamp invariant,
    * where Java's truncating `/`/`%` agree with SQL `div`/`//`), and
    * order-independent Long hi/lo sums. ProbeSpec locks weight
    * identity across partitionings; the oracle hash gate locks the
    * cross-engine replay. */
  private def fit(f: DataFrame, n: Long, iters: Int): Array[Double] = {
    var w = Array.fill(WeightNames.size)(0.0)
    if (iters == 0) return w
    val m = WeightNames.size
    val colNames = "y" +: FEATURES.map(_._1)
    val cols = colNames.map(org.apache.spark.sql.functions.col)
    // fail loudly on dirty stats: getDouble on a NULL would be a bare
    // NPE deep in a Spark task; the earlier selectExpr/sum formulation
    // silently skipped null contributions (while still counting the row
    // in n) — quietly divergent. A NULL label or feature is a data bug
    // the caller must fix upstream, so name the column in the error.
    val data = f.select(cols: _*)
      .rdd.map { r =>
        Array.tabulate(m) { i =>
          if (r.isNullAt(i)) throw new IllegalArgumentException(
            s"probe training: NULL in column '${colNames(i)}' — the label " +
              "and every Gopher stat must be non-null; filter or coalesce " +
              "the stats relation before trainQualityProbe/scoreQuality")
          r.getDouble(i)
        }
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      for (_ <- 1 to iters) {
        val wB = w
        val (hs, ls) = data.treeAggregate((new Array[Long](m), new Array[Long](m)))(
          seqOp = { case (acc, a) =>
            val y = a(0)
            // zSql's left-associated fold, then sigmoidSql's clamped cubic
            var z = wB(0)
            var j = 1
            while (j < m) { z = z + wB(j) * a(j); j += 1 }
            val s =
              if (z <= -2.0) 0.0
              else if (z >= 2.0) 1.0
              else 0.5 + z * (0.25 - z * z * 0.020833333333333332)
            val d = s - y
            var k = 0
            while (k < m) {
              val contrib = if (k == 0) d else d * a(k)
              val gq = math.floor(contrib * 1000000000.0).toLong + OFF
              acc._1(k) += gq / 1000000L
              acc._2(k) += gq % 1000000L
              k += 1
            }
            acc
          },
          combOp = { case ((h1, l1), (h2, l2)) =>
            var k = 0
            while (k < m) { h1(k) += h2(k); l1(k) += l2(k); k += 1 }
            (h1, l1)
          })
        w = w.zipWithIndex.map { case (wj, j) =>
          val g = (hs(j) * 1000000L + ls(j)) - n * OFF
          // the updateSql chain, in driver doubles: identical IEEE ops
          wj - 4.0 * ((g.toDouble / 1000000000.0) / n.toDouble)
        }
      }
      w
    } finally data.unpersist(false)
  }

  def trainQualityProbe(statsWithLabel: DataFrame,
      iters: Int = Iters): DataFrame = {
    val spark = statsWithLabel.sparkSession
    val f = featurize(statsWithLabel)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = f.count()
      require(n > 0, "probe training over an empty corpus")
      val w = fit(f, n, iters)
      val zF = zSql(w.map(dbl).toSeq)
      val acc = f.selectExpr(
        s"CAST(sum(CASE WHEN ($zF) >= 0.0 THEN CASE WHEN y = 1.0 THEN 1 ELSE 0 END " +
          s"ELSE CASE WHEN y = 1.0 THEN 0 ELSE 1 END END) AS BIGINT) AS n_correct",
        "CAST(count(*) AS BIGINT) AS n").collect()(0)
      import org.apache.spark.sql.types._
      val rows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList(WeightNames.indices.map { j =>
          org.apache.spark.sql.Row(WeightNames(j),
            math.floor(w(j) * 1000000.0).toLong, acc.getLong(0), acc.getLong(1))
        }: _*)
      spark.createDataFrame(rows, StructType(Seq(
        StructField("feature", StringType, nullable = false),
        StructField("weight6", LongType, nullable = false),
        StructField("n_correct", LongType, nullable = false),
        StructField("n", LongType, nullable = false))))
    } finally f.unpersist(false) // all jobs ran; result is driver-built
  }

  /** Train, then APPLY: every document scored with the trained probe —
    * the end-user operation the trainer exists for (rank borderline
    * docs by the smooth score where the bands give only yes/no).
    * Output: (doc_id, score6 = floor(z·10⁶), probe_keep, keep).
    *
    * Cache lifecycle contract (the Decontam.overlap convention): the
    * featurized relation is persisted — the fit loop's jobs read it,
    * and the RETURNED LAZY scoring plan reads it again — so this
    * method cannot unpersist; the caller owns release
    * (`spark.catalog.clearCache()` after materializing). */
  def scoreQualityProbe(statsWithLabel: DataFrame,
      iters: Int = Iters): DataFrame = {
    require(statsWithLabel.columns.contains("doc_id"),
      "scoring needs a doc_id column")
    val f = featurize(statsWithLabel)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = f.count()
    require(n > 0, "probe training over an empty corpus")
    val w = fit(f, n, iters)
    val zF = zSql(w.map(dbl).toSeq)
    f.selectExpr("doc_id",
      s"CAST(floor(($zF) * 1000000.0) AS BIGINT) AS score6",
      s"CAST(CASE WHEN ($zF) >= 0.0 THEN 1 ELSE 0 END AS BIGINT) AS probe_keep",
      "CAST(y AS BIGINT) AS keep")
  }

  /** Train on the `trainPredSql` slice only, score EVERY document —
    * the train/serve split hygiene every production probe needs: the
    * model must be judged on documents it never saw, and the scorer
    * is the serving path (new corpora score against weights trained
    * elsewhere). `trainPredSql` evaluates over the featurized relation
    * (doc_id, y, features), e.g. "doc_id % 2 = 0".
    * Output: (doc_id, score6, probe_keep, keep, is_train) — held-out
    * accuracy is a one-line aggregation over the is_train=0 rows, and
    * ProbeSpec locks it above the majority class (generalization, not
    * memorization). Same cache lifecycle contract as
    * [[scoreQualityProbe]]. */
  def scoreHoldoutProbe(statsWithLabel: DataFrame, trainPredSql: String,
      iters: Int = Iters): DataFrame = {
    require(statsWithLabel.columns.contains("doc_id"),
      "scoring needs a doc_id column")
    val f = featurize(statsWithLabel)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fTrain = f.filter(org.apache.spark.sql.functions.expr(trainPredSql))
    val n = fTrain.count()
    require(n > 0, "probe training over an empty train slice")
    val w = fit(fTrain, n, iters)
    val zF = zSql(w.map(dbl).toSeq)
    f.selectExpr("doc_id",
      s"CAST(floor(($zF) * 1000000.0) AS BIGINT) AS score6",
      s"CAST(CASE WHEN ($zF) >= 0.0 THEN 1 ELSE 0 END AS BIGINT) AS probe_keep",
      "CAST(y AS BIGINT) AS keep",
      s"CAST(CASE WHEN $trainPredSql THEN 1 ELSE 0 END AS BIGINT) AS is_train")
  }

  private def wCols(t: Int): Seq[String] =
    WeightNames.indices.map(j => s"w$t.c$j")

  /** The shared oracle prefix: featurized CTE (doc_id carried when the
    * source has one — the gradient sums ignore it), count, w0, and
    * `iters` unrolled MATERIALIZED GD rounds. When `trainWhere` is set
    * the rounds (and the count) read only the train slice `ft`, the
    * holdout convention — scoring still reads the full `f`. */
  private def oraclePrefix(featSql: String, iters: Int,
      withDocId: Boolean, trainWhere: Option[String] = None): String = {
    val trainRel = if (trainWhere.isDefined) "ft" else "f"
    val rounds = (1 to iters).map { t =>
      val aggs = gradAggSqls(wCols(t - 1), "//").mkString(",\n    ")
      val upd = WeightNames.indices.map { j =>
        s"${updateSql(s"w${t - 1}.c$j", j, "nn.c")} AS c$j"
      }.mkString(",\n    ")
      s"""g$t AS MATERIALIZED (SELECT $aggs FROM $trainRel, w${t - 1}),
         |w$t AS MATERIALIZED (SELECT $upd FROM g$t, w${t - 1}, nn)""".stripMargin
    }.mkString(",\n")
    val w0 = WeightNames.indices.map(j => s"CAST('0.0' AS DOUBLE) AS c$j")
      .mkString(", ")
    val id = if (withDocId) "doc_id, " else ""
    val ftCte = trainWhere
      .map(p => s"\nft AS MATERIALIZED (SELECT * FROM f WHERE $p),")
      .getOrElse("")
    s"""WITH f AS MATERIALIZED (SELECT ${id}CAST(keep AS DOUBLE) AS y,
       |    ${FEATURES.map { case (n, t) => s"$t AS $n" }.mkString(",\n    ")}
       |  FROM ($featSql)),$ftCte
       |nn AS (SELECT count(*) AS c FROM $trainRel),
       |w0 AS (SELECT $w0),
       |$rounds""".stripMargin
  }

  /** Oracle-side rendering of [[trainQualityProbe]]: the same `iters`
    * rounds as unrolled MATERIALIZED CTEs over `featSql` (a relation
    * with the Gopher metric columns + keep), every arithmetic fragment
    * from the same builders as the Spark loop. */
  def trainOracleSql(featSql: String, iters: Int = Iters): String = {
    val zF = zSql(wCols(iters))
    val outRows = WeightNames.indices.map { j =>
      s"SELECT '${WeightNames(j)}' AS feature, " +
        s"CAST(floor(w$iters.c$j * 1000000.0) AS BIGINT) AS weight6, " +
        s"acc.n_correct, acc.n FROM w$iters, acc"
    }.mkString("\nUNION ALL ")
    s"""${oraclePrefix(featSql, iters, withDocId = false)},
       |acc AS (SELECT
       |    CAST(sum(CASE WHEN ($zF) >= 0.0 THEN CASE WHEN y = 1.0 THEN 1 ELSE 0 END
       |      ELSE CASE WHEN y = 1.0 THEN 0 ELSE 1 END END) AS BIGINT) AS n_correct,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM f, w$iters)
       |$outRows""".stripMargin
  }

  /** Oracle-side rendering of [[scoreQualityProbe]]. */
  def scoreOracleSql(featSql: String, iters: Int = Iters): String = {
    val zF = zSql(wCols(iters))
    s"""${oraclePrefix(featSql, iters, withDocId = true)}
       |SELECT f.doc_id,
       |  CAST(floor(($zF) * 1000000.0) AS BIGINT) AS score6,
       |  CAST(CASE WHEN ($zF) >= 0.0 THEN 1 ELSE 0 END AS BIGINT) AS probe_keep,
       |  CAST(y AS BIGINT) AS keep
       |FROM f, w$iters""".stripMargin
  }

  /** Oracle-side rendering of [[scoreHoldoutProbe]]: the GD rounds
    * aggregate only the `trainPredSql` slice; scoring reads the full
    * corpus and flags the slice. */
  def scoreHoldoutOracleSql(featSql: String, trainPredSql: String,
      iters: Int = Iters): String = {
    val zF = zSql(wCols(iters))
    s"""${oraclePrefix(featSql, iters, withDocId = true, Some(trainPredSql))}
       |SELECT f.doc_id,
       |  CAST(floor(($zF) * 1000000.0) AS BIGINT) AS score6,
       |  CAST(CASE WHEN ($zF) >= 0.0 THEN 1 ELSE 0 END AS BIGINT) AS probe_keep,
       |  CAST(y AS BIGINT) AS keep,
       |  CAST(CASE WHEN $trainPredSql THEN 1 ELSE 0 END AS BIGINT) AS is_train
       |FROM f, w$iters""".stripMargin
  }
}
