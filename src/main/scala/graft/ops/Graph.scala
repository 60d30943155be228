package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over pair graphs — the authority signal on top of
  * the near-duplicate graph that [[Dedup.duplicateClusters]] labels:
  * min-id keeps an arbitrary cluster member, PageRank keeps the most
  * CONNECTED one (the canonical-copy election a curation pipeline
  * actually wants: the page every mirror points at, not the lowest id).
  *
  * INTEGER-EXACT fixed-point PageRank, so it hash-gates: ranks live at
  * scale S = 10¹², and one iteration is
  *
  *   pr'(v) = (S·15) div (100·N)  +  Σ_{u∈in(v)} (pr(u)·85) div (100·deg(u))
  *
  * — damping 0.85 decomposed into integer multiply-then-floor-divide,
  * identical in Spark (`div`) and DuckDB (`//`). No float ever enters,
  * so iteration T's ranks are a fixed integer fact both engines
  * reproduce bit-for-bit (the oracle unrolls T CTE rounds of the same
  * formula). Floor rounding loses mass (Σpr drifts a few units per
  * round below S) — deterministic, identical both sides, documented.
  *
  * Shape at scale: per iteration ONE equality join (edges ⋈ ranks on
  * the source key) + ONE grouped sum — the standard distributed
  * PageRank step; ranks are localCheckpointed per round (the
  * duplicateClusters lineage discipline). Edges are the near-dup pair
  * graph: bounded by the dedup candidate volume, not the corpus.
  */
object Graph {

  val Scale: Long = 1000000000000L

  /** PageRank over an undirected pair graph (columns doc_a, doc_b).
    * Output: (doc_id, deg, pr12) for every node in the graph.
    *
    * Small-graph fast path (the [[Dedup.duplicateClusters]] probe
    * convention): a near-dup pair graph is usually tiny relative to
    * its corpus, and the iterative loop pays 1-2 scheduler-floor jobs
    * PER ROUND for it (measured 5.1 s at sf0.1 for a 25-pair graph).
    * When the pair relation fits `smallGraphEdges` (decided by a
    * bounded COUNT — the big-graph path never collects edge rows) and
    * the key type passes [[Dedup.smallGraphOrdering]] (numeric/string,
    * where driver-side HashMap equality matches Spark's value
    * equality — a binary key would fragment nodes under reference
    * equality), the T rounds run driver-side with the IDENTICAL
    * integer formula — same truncating division on positive operands,
    * same self-loop and isolated-contribution semantics — and the
    * result is a driver-built relation (spec-locked distributed ≡
    * driver). Pass smallGraphEdges = 0 to force the distributed loop. */
  def pagerank(pairs: DataFrame, iters: Int = 10,
      smallGraphEdges: Int = 1000000): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    val pk = pairs.select(col("doc_a"), col("doc_b"))
    if (smallGraphEdges > 0 &&
        Dedup.smallGraphOrdering(pk.schema.head.dataType).isDefined) {
      val cached = pk.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        Dedup.boundedEdgeProbe(cached, smallGraphEdges) match {
          case Some(probe) =>
            return smallGraphPagerank(pairs.sparkSession, probe,
              pk.schema.head, iters)
          case None => distributedPagerank(cached, iters)
        }
      } finally cached.unpersist(false) // final pr is eagerly checkpointed
    } else distributedPagerank(pk, iters)
  }

  private def distributedPagerank(pairs: DataFrame, iters: Int): DataFrame = {
    val e = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("u").agg(count(lit(1)).as("deg"))
    // N is one scalar of bounded model state (node count), the same
    // collect class as the IVF centroid counts
    val n = deg.count()
    require(n > 0, "pagerank over an empty pair graph")
    val base = Scale * 15 / (100 * n)
    var pr = deg.select(col("u").as("node"), col("deg"),
      lit(Scale / n).as("pr")).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = e.join(pr, col("u") === col("node"))
        .select(col("v"), expr("(pr * 85) div (100 * deg)").as("c"))
        .groupBy("v").agg(sum("c").as("inc"))
      pr = deg.select(col("u").as("node"), col("deg"))
        .join(contrib, col("node") === col("v"), "left")
        .select(col("node"), col("deg"),
          (lit(base) + coalesce(col("inc"), lit(0L))).as("pr"))
        .localCheckpoint(true)
    }
    e.unpersist(false)
    pr.select(col("node").as("doc_id"), col("deg"), col("pr").as("pr12"))
  }

  /** Driver replica of the distributed loop for bounded pair graphs:
    * same directed-distinct edge set (a self-pair contributes ONE
    * directed edge and degree 1, exactly like the union+distinct), the
    * same truncating integer division (operands are non-negative, so
    * Java `/` ≡ Spark `div`), T rounds of the identical formula. */
  private def smallGraphPagerank(spark: org.apache.spark.sql.SparkSession,
      edges: Array[org.apache.spark.sql.Row],
      keyField: org.apache.spark.sql.types.StructField, iters: Int): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val idx = scala.collection.mutable.HashMap.empty[Any, Int]
    val nodes = scala.collection.mutable.ArrayBuffer.empty[Any]
    def id(x: Any): Int = idx.getOrElseUpdate(x, { nodes += x; nodes.size - 1 })
    val directed = scala.collection.mutable.HashSet.empty[(Int, Int)]
    edges.foreach { r =>
      val (a, b) = (id(r.get(0)), id(r.get(1)))
      directed += ((a, b)); directed += ((b, a))
    }
    val n = nodes.size
    require(n > 0, "pagerank over an empty pair graph")
    val adjOut = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
    directed.foreach { case (u, v) => adjOut(u) += v }
    val deg = adjOut.map(_.size.toLong)
    val base = Scale * 15 / (100 * n)
    var pr = Array.fill(n)(Scale / n)
    for (_ <- 1 to iters) {
      val inc = new Array[Long](n)
      var u = 0
      while (u < n) {
        val c = pr(u) * 85 / (100 * deg(u))
        adjOut(u).foreach(v => inc(v) += c)
        u += 1
      }
      pr = Array.tabulate(n)(v => base + inc(v))
    }
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(nodes.indices.map(i =>
        org.apache.spark.sql.Row(nodes(i), deg(i), pr(i))): _*)
    spark.createDataFrame(rows, StructType(Seq(
      StructField("doc_id", keyField.dataType, nullable = false),
      StructField("deg", LongType, nullable = false),
      StructField("pr12", LongType, nullable = false))))
  }

  /** The curation ACTION [[pagerank]] enables: per duplicate cluster,
    * keep the most CENTRAL member (highest rank; rank ties break to
    * the smaller doc_id — total order). Joins the cluster labels with
    * the ranks over the SAME pair graph — two equality joins and one
    * per-cluster argmax window (clusters are small by construction;
    * the window partitions by cluster, never globally).
    * Output: (cluster_id, keep_doc_id, pr12, n_members). */
  def canonicalByRank(clusters: DataFrame, pr: DataFrame): DataFrame = {
    val joined = clusters.join(pr, "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(col("pr12").desc, col("doc_id").asc)
    joined.withColumn("rn", row_number().over(w))
      .withColumn("n_members",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("cluster_id")))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("keep_doc_id"),
        col("pr12"), col("n_members").cast("long").as("n_members"))
  }

  /** Per-node triangle counts over the undirected pair graph — the
    * cohesion signal beside [[pagerank]]'s centrality (a duplicate
    * CLIQUE — mirror farm — is triangle-dense; a hub-and-spoke chain of
    * borderline matches is triangle-free, and a curation pipeline
    * treats the two very differently).
    *
    * Degree-ordered orientation (Schank/Wagner): every edge points from
    * its lower-(deg, id) endpoint to the higher, so each triangle is
    * enumerated EXACTLY once at its lowest-ranked vertex and — the
    * scale property — out-degrees are bounded by O(√m): the wedge
    * self-join on a Zipf hub explodes quadratically under plain id
    * ordering but stays √m-bounded under degree ordering. Three
    * equality joins + one grouped count; all-integer output, so the
    * gate hash-checks. The oracle enumerates the same triangle set by
    * plain id order — orientation changes the JOIN SHAPE, never the
    * triangle set.
    *
    * Cache lifecycle contract (the Decontam.overlap convention): the
    * distinct edge set `e` (read by deg + both orientation inputs) and
    * the oriented relation `o` (read by all three wedge-join sides)
    * are persisted, and the RESULT IS LAZY — this method cannot
    * unpersist either without un-materializing them before any action
    * runs. The caller owns release: `spark.catalog.clearCache()` after
    * materializing (the Verify/Bench convention), or track both via
    * `spark.sharedState.cacheManager`.
    *
    * Small-graph fast path (the [[pagerank]] probe convention): pair
    * graphs under `smallGraphEdges` with an ordering-supported key
    * type count driver-side — canonical min/max edges under the SAME
    * ordering Spark's least/greatest applies, per-edge common-neighbor
    * scan (each triangle increments each of its three nodes exactly
    * once). Pass 0 to force the join form.
    *
    * Degenerate SELF-pairs (doc_a = doc_b — which a near-dup pair
    * source never emits) are DROPPED up front in both paths: the
    * oriented wedge join would otherwise manufacture (x, x, y)
    * "triangles" through a self-loop's src row, r9's parity fuzzing
    * caught it, and a simple-graph contract is the only sane one for
    * a cohesion metric. */
  def triangles(pairs: DataFrame, smallGraphEdges: Int = 1000000): DataFrame = {
    val pk = pairs.select(col("doc_a"), col("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
    val keyOrd = Dedup.smallGraphOrdering(pk.schema.head.dataType)
    if (smallGraphEdges > 0 && keyOrd.isDefined) {
      val cached = pk.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Dedup.boundedEdgeProbe(cached, smallGraphEdges) match {
        case Some(probe) =>
          cached.unpersist(false)
          return smallGraphTriangles(pairs.sparkSession, probe,
            pk.schema.head, keyOrd.get)
        case None =>
          // big graph: fall through to the join form over the cached
          // pairs (the caller-owned release contract above covers this
          // persist); no edge rows ever reached the driver
          distributedTriangles(cached)
      }
    } else distributedTriangles(pk)
  }

  private def distributedTriangles(pairs: DataFrame): DataFrame = {
    val e = pairs
      .select(least(col("doc_a"), col("doc_b")).as("u"),
        greatest(col("doc_a"), col("doc_b")).as("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val ed = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val o = ed.select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("d"), col("dv").as("dd")))
          .otherwise(
            struct(col("v").as("s"), col("u").as("d"), col("du").as("dd")))
          .as("x"))
      .select(col("x.s").as("src"), col("x.d").as("dst"), col("x.dd").as("ddeg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wedges = o.select(col("src"), col("dst").as("d1"), col("ddeg").as("dd1"))
      .join(o.select(col("src"), col("dst").as("d2"), col("ddeg").as("dd2")), Seq("src"))
      .filter(col("dd1") < col("dd2") ||
        (col("dd1") === col("dd2") && col("d1") < col("d2")))
    val tris = wedges
      .join(o.select(col("src").as("d1"), col("dst").as("d2")), Seq("d1", "d2"))
      .select(col("src").as("x"), col("d1").as("y"), col("d2").as("z"))
    val cnt = tris.select(col("x").as("node"))
      .union(tris.select(col("y").as("node")))
      .union(tris.select(col("z").as("node")))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    deg.join(cnt, Seq("node"), "left")
      .select(col("node").as("doc_id"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
  }

  /** Driver replica of the oriented-join triangle count for bounded
    * pair graphs — same canonical distinct edge set (self-pairs are
    * filtered before either path), same degree semantics, same
    * once-per-triangle node counting (parity fuzz-locked vs the
    * distributed join in GraphSpec). */
  private def smallGraphTriangles(spark: org.apache.spark.sql.SparkSession,
      edges: Array[org.apache.spark.sql.Row],
      keyField: org.apache.spark.sql.types.StructField,
      ord: Ordering[Any]): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val idx = scala.collection.mutable.HashMap.empty[Any, Int]
    val nodes = scala.collection.mutable.ArrayBuffer.empty[Any]
    def id(x: Any): Int = idx.getOrElseUpdate(x, { nodes += x; nodes.size - 1 })
    val canon = scala.collection.mutable.HashSet.empty[(Int, Int)]
    edges.foreach { r =>
      val (a, b) = (r.get(0), r.get(1))
      val (lo, hi) = if (ord.lteq(a, b)) (a, b) else (b, a)
      canon += ((id(lo), id(hi)))
    }
    val n = nodes.size
    val deg = new Array[Long](n)
    val adj = Array.fill(n)(scala.collection.mutable.HashSet.empty[Int])
    canon.foreach { case (u, v) =>
      deg(u) += 1; deg(v) += 1
      if (u != v) { adj(u) += v; adj(v) += u }
    }
    val tri = new Array[Long](n)
    canon.foreach { case (u, v) =>
      if (u != v) {
        val (s, l) = if (adj(u).size <= adj(v).size) (u, v) else (v, u)
        adj(s).foreach { c =>
          if (c != u && c != v && adj(l).contains(c)) tri(c) += 1
        }
      }
    }
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(nodes.indices.map(i =>
        org.apache.spark.sql.Row(nodes(i), deg(i), tri(i))): _*)
    spark.createDataFrame(rows, StructType(Seq(
      StructField("doc_id", keyField.dataType, nullable = false),
      StructField("deg", LongType, nullable = false),
      StructField("tri", LongType, nullable = false))))
  }

  /** Oracle twin of [[triangles]]: plain id-ordered enumeration
    * (x < y < z via three equality joins) — same triangle set, no
    * orientation machinery. */
  def trianglesOracleSql(pairsSql: String): String =
    s"""WITH p AS MATERIALIZED ($pairsSql),
       |e AS MATERIALIZED (SELECT DISTINCT least(doc_a, doc_b) AS u,
       |  greatest(doc_a, doc_b) AS v FROM p),
       |t AS (SELECT a.u AS x, a.v AS y, b.v AS z
       |  FROM e a JOIN e b ON b.u = a.v
       |  JOIN e c ON c.u = a.u AND c.v = b.v),
       |r AS (SELECT x AS node FROM t
       |  UNION ALL SELECT y FROM t UNION ALL SELECT z FROM t),
       |cnt AS (SELECT node, count(*) AS tri FROM r GROUP BY 1),
       |deg AS (SELECT node, count(*) AS deg FROM
       |  (SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY 1)
       |SELECT deg.node AS doc_id, CAST(deg.deg AS BIGINT) AS deg,
       |  CAST(coalesce(cnt.tri, 0) AS BIGINT) AS tri
       |FROM deg LEFT JOIN cnt ON deg.node = cnt.node""".stripMargin

  /** Oracle-side rendering: `iters` unrolled CTE rounds of the same
    * integer formula over a pair subquery (recursive CTEs cannot
    * aggregate their recursive reference, so the rounds unroll —
    * the minhashSigCtes 64-column convention). */
  def pagerankOracleSql(pairsSql: String, iters: Int = 10): String = {
    // every CTE is MATERIALIZED: without the hint DuckDB inlines each
    // reference, so round t re-evaluates the (heavy) pair subquery
    // through the whole pr chain — observed as a runaway compare
    val rounds = (1 to iters).map { t =>
      s"""pr$t AS MATERIALIZED (SELECT d.u AS node, d.deg,
         |    (SELECT ($Scale * 15) // (100 * n) FROM nn) + coalesce(inc.s, 0) AS pr
         |  FROM deg d LEFT JOIN (
         |    SELECT e.v AS node, sum((pr.pr * 85) // (100 * pr.deg)) AS s
         |    FROM e JOIN pr${t - 1} pr ON e.u = pr.node GROUP BY 1) inc
         |  ON d.u = inc.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH p AS MATERIALIZED ($pairsSql),
       |e AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM p
       |  UNION SELECT doc_b, doc_a FROM p),
       |deg AS MATERIALIZED (SELECT u, count(*) AS deg FROM e GROUP BY 1),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM deg),
       |pr0 AS MATERIALIZED (SELECT u AS node, deg,
       |  (SELECT $Scale // n FROM nn) AS pr FROM deg),
       |$rounds
       |SELECT node AS doc_id, CAST(deg AS BIGINT) AS deg,
       |  CAST(pr AS BIGINT) AS pr12 FROM pr$iters""".stripMargin
  }
}
