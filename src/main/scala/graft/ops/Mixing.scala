package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus-mixture planning — given target proportions
  * per stratum (language, source, quality band …), compute the
  * largest achievable mixed corpus and the per-stratum sampling rates
  * that realize it. The multilingual-pretraining construction step:
  * targets come from the data recipe, the binding stratum (the one
  * with the least data relative to its target) caps the total, every
  * other stratum is downsampled to match — no stratum is ever
  * upsampled past its supply.
  *
  * All arithmetic is integer basis points, so the plan gates
  * bit-identically cross-engine:
  *
  *  - cap_s  = n_tokens_s · 10⁴ div target_bp_s   (total size if s binds)
  *  - B      = min_s cap_s                        (achievable total)
  *  - take_s = B · target_bp_s div 10⁴            (≤ n_tokens_s, proven
  *             by the div inequality chain in MixingSpec)
  *  - rate_bp_s = take_s · 10⁴ div n_tokens_s     (feed to
  *             [[Sampling.stratifiedHash]] as the per-stratum percent)
  *
  * Shape at scale: one groupBy over the corpus (map-side partial
  * count/sum), then arithmetic over a strata-sized relation — the
  * planning step costs ONE aggregation regardless of corpus size. The
  * budget min rides an unpartitioned window over that strata-sized
  * relation (grid-sized, never data-sized — the histogram_quantile
  * discipline): the earlier crossJoin(broadcast(min-subquery)) form
  * re-evaluated the whole corpus aggregation per consumer subtree,
  * measured 9.5 s vs 1.2 s at 150k docs (r9 probe). Strata with
  * target 0 are excluded from the min (they cap nothing) and emit
  * rate 0.
  */
object Mixing {

  /** Per-stratum mixing plan. `targetBp` maps stratum → basis points
    * (callers normally make them sum to 10⁴); strata not in the map
    * get `defaultBp`. Token counts use the `\S+` tokenizer like the
    * rest of the text tier. A declared stratum with NO corpus supply
    * binds the budget to 0 (unachievable recipe → empty plan), never
    * silently renormalizes. */
  def plan(docs: DataFrame, stratumCol: String,
      targetBp: Map[String, Int], defaultBp: Int = 0): DataFrame = {
    require((defaultBp +: targetBp.values.toSeq).forall(b => b >= 0 && b <= 10000),
      s"targets in [0, 10000] bp: $targetBp default $defaultBp")
    val target = targetBp.toSeq.sortBy(_._1).foldLeft(lit(defaultBp): Column) {
      case (acc, (s, b)) => when(col(stratumCol) === s, lit(b)).otherwise(acc)
    }
    val spark = docs.sparkSession
    import spark.implicits._
    // union the DECLARED strata in as zero-supply rows: a target
    // stratum the corpus lacks entirely must still enter the budget
    // min (cap 0 → B = 0 → every take 0) — the recipe is unachievable
    // and the plan says so, instead of silently renormalizing onto the
    // strata that happen to exist
    val declared = targetBp.keys.toSeq.sorted.toDF(stratumCol)
      .withColumn("n_docs", lit(0L)).withColumn("n_tokens", lit(0L))
    val per = docs
      .select(col(stratumCol),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("tok"))
      .groupBy(stratumCol)
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"))
      .unionByName(declared)
      .groupBy(stratumCol)
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"))
      .withColumn("target_bp", target.cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    per
      .withColumn("budget",
        min(when(col("target_bp") > 0, expr("n_tokens * 10000 div target_bp")))
          .over(w))
      .select(col(stratumCol), col("n_docs"), col("n_tokens"), col("target_bp"),
        expr("CASE WHEN target_bp > 0 THEN budget * target_bp div 10000 ELSE 0 END")
          .as("take_tokens"),
        expr("""CASE WHEN target_bp > 0 AND n_tokens > 0
               |  THEN (budget * target_bp div 10000) * 10000 div n_tokens
               |  ELSE 0 END""".stripMargin).as("rate_bp"))
  }

  /** Temperature-scaled mixture weights at τ = 2 (α = 1/2) — the
    * standard multilingual recipe when no hand-written target exists:
    * sample stratum s proportional to supply^(1/τ), which upweights
    * tail languages relative to their natural share without ever
    * inverting the order.
    *
    * INTEGER-EXACT cross-engine: α = 1/2 is deliberate — IEEE `sqrt`
    * is correctly rounded (unlike `pow(x, 0.3)`, whose libm rounding
    * may differ between engines), so w_s = floor(sqrt(n_tokens_s)) is
    * the same integer in Spark and DuckDB, and the shares reduce to
    * integer basis-point division. Same one-aggregation shape as
    * [[plan]]: the corpus is touched once, everything after is
    * strata-sized.
    *
    * Output: (stratum, n_docs, n_tokens, nat_bp, temp_bp) — natural vs
    * temperature share, both in basis points. */
  def temperaturePlan(docs: DataFrame, stratumCol: String): DataFrame = {
    val per = docs
      .select(col(stratumCol),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("tok"))
      .groupBy(stratumCol)
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"))
      .withColumn("w", expr("CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)"))
    val tot = per.select(sum("n_tokens").as("nt"), sum("w").as("wt"))
    per.crossJoin(broadcast(tot))
      .select(col(stratumCol), col("n_docs"), col("n_tokens"),
        expr("n_tokens * 10000 div nt").as("nat_bp"),
        expr("w * 10000 div wt").as("temp_bp"))
  }

  /** Fixed-BUDGET epoch planning — the complement of [[plan]]: where
    * plan shrinks the corpus until no stratum needs upsampling, the
    * epoch plan takes the training token budget as given and answers
    * how many PASSES (epochs) over each stratum the recipe implies —
    * the published practice when the recipe demands more of a stratum
    * than exists (repeat the high-quality tail rather than shrink the
    * run). Budget = total supply · budgetFactorPct / 100, so the knob
    * is scale-free and the gate needs no absolute constant.
    *
    * Integer basis-point arithmetic throughout ([[plan]]'s rules):
    *  - take_s        = budget · target_bp_s div 10⁴
    *  - epochs_centi  = ceil(take_s · 100 / supply_s)  (100 = one pass)
    *  - oversampled_s = epochs_centi > 100
    * A declared stratum with zero supply but nonzero take marks
    * epochs_centi = −1 (unachievable at any repeat count) instead of
    * silently renormalizing — the [[plan]] discipline.
    *
    * Same one-aggregation shape: corpus touched once, everything after
    * is strata-sized with the scalar budget broadcast back. */
  def epochPlan(docs: DataFrame, stratumCol: String,
      targetBp: Map[String, Int], budgetFactorPct: Int = 200,
      defaultBp: Int = 0): DataFrame = {
    require((defaultBp +: targetBp.values.toSeq).forall(b => b >= 0 && b <= 10000),
      s"targets in [0, 10000] bp: $targetBp default $defaultBp")
    require(budgetFactorPct > 0, s"budgetFactorPct > 0: $budgetFactorPct")
    val target = targetBp.toSeq.sortBy(_._1).foldLeft(lit(defaultBp): Column) {
      case (acc, (s, b)) => when(col(stratumCol) === s, lit(b)).otherwise(acc)
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val declared = targetBp.keys.toSeq.sorted.toDF(stratumCol)
      .withColumn("n_docs", lit(0L)).withColumn("n_tokens", lit(0L))
    val per = docs
      .select(col(stratumCol),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("tok"))
      .groupBy(stratumCol)
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"))
      .unionByName(declared)
      .groupBy(stratumCol)
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"))
      .withColumn("target_bp", target.cast("long"))
    val tot = per.select(
      expr(s"sum(n_tokens) * $budgetFactorPct div 100").as("budget"))
    per.crossJoin(broadcast(tot))
      .withColumn("take_tokens", expr("budget * target_bp div 10000"))
      .withColumn("epochs_centi", expr(
        """CASE WHEN take_tokens = 0 THEN 0
          |     WHEN n_tokens = 0 THEN -1
          |     ELSE (take_tokens * 100 + n_tokens - 1) div n_tokens
          |END""".stripMargin))
      .select(col(stratumCol), col("n_docs"), col("n_tokens"),
        col("target_bp"), col("take_tokens"), col("epochs_centi"),
        (col("epochs_centi") > 100).cast("long").as("oversampled"))
  }

  /** Oracle twin of [[epochPlan]] over the documents table (declared
    * strata inlined; DuckDB `//` matches Spark `div` on the
    * non-negative operands here). */
  def epochOracleSql(stratumCol: String, targetBp: Map[String, Int],
      budgetFactorPct: Int = 200): String = {
    val caseArms = targetBp.toSeq.sortBy(_._1)
      .map { case (s, b) => s"WHEN '$s' THEN $b" }.mkString(" ")
    val declList = targetBp.keys.toSeq.sorted.map(s => s"'$s'").mkString(", ")
    s"""WITH per0 AS (SELECT $stratumCol, count(*) AS n_docs,
       |    CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1),
       |decl AS (SELECT unnest([$declList]) AS $stratumCol),
       |per AS (SELECT $stratumCol,
       |    CAST(coalesce(n_docs, 0) AS BIGINT) AS n_docs,
       |    CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
       |    CAST(CASE $stratumCol $caseArms ELSE 0 END AS BIGINT) AS target_bp
       |  FROM decl FULL OUTER JOIN per0 USING ($stratumCol)),
       |b AS (SELECT sum(n_tokens) * $budgetFactorPct // 100 AS budget FROM per),
       |e AS (SELECT $stratumCol, n_docs, n_tokens, target_bp,
       |    budget * target_bp // 10000 AS take_tokens
       |  FROM per CROSS JOIN b)
       |SELECT $stratumCol, n_docs, n_tokens, target_bp,
       |  CAST(take_tokens AS BIGINT) AS take_tokens,
       |  CAST(CASE WHEN take_tokens = 0 THEN 0
       |            WHEN n_tokens = 0 THEN -1
       |            ELSE (take_tokens * 100 + n_tokens - 1) // n_tokens
       |       END AS BIGINT) AS epochs_centi,
       |  CAST(CASE WHEN (CASE WHEN take_tokens = 0 THEN 0
       |            WHEN n_tokens = 0 THEN -1
       |            ELSE (take_tokens * 100 + n_tokens - 1) // n_tokens END) > 100
       |       THEN 1 ELSE 0 END AS BIGINT) AS oversampled
       |FROM e""".stripMargin
  }

  /** Oracle twin of [[temperaturePlan]] over the documents table. */
  def temperatureOracleSql(stratumCol: String): String =
    s"""WITH per AS (SELECT $stratumCol, count(*) AS n_docs,
       |    CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1),
       |w AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w
       |  FROM per),
       |t AS (SELECT sum(n_tokens) AS nt, sum(w) AS wt FROM w)
       |SELECT $stratumCol, n_docs, n_tokens,
       |  CAST(n_tokens * 10000 // nt AS BIGINT) AS nat_bp,
       |  CAST(w * 10000 // wt AS BIGINT) AS temp_bp
       |FROM w CROSS JOIN t""".stripMargin
}
