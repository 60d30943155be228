package graft.catalog

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-series options (reference ts_opts_t, src/timeseries.h:88-92).
  * Both duplication policies are real write options here (the reference
  * parses but never applies them, src/statement_execute.c:102):
  * "insert" appends duplicates, "ignore" drops points whose timestamp
  * already exists (reference DP_IGNORE/DP_INSERT, src/timeseries.h:43).
  * Retention is enforced by [[TsCatalog.enforceRetention]] (parsed but
  * never enforced in the reference — no reaper exists there).
  *
  * `dictionary` (r13, beyond the reference's surface): an optional
  * DECLARED category dictionary — the closed set of values a series'
  * category/tag column may take, ordered; its index is the category's
  * integer code. Production catalogs carry exactly this (enum/dict
  * encodings); declaring it unlocks the all-primitive-key aggregation
  * plans that a string category key forces out of HashAggregate's
  * generated fast hash map (measured: the agg_hourly_rollup floor
  * decomposition, BASELINE.md r12). Consumers:
  * [[graft.queries.AnalyticsSurface.hourlyRollupWithDict]].
  */
final case class SeriesMeta(
    retentionNs: Option[Long],
    dupPolicy: String = "insert",
    dictionary: Option[Seq[String]] = None) {
  // dictionary entries round-trip through the catalog's minimal JSON
  // writer — no escaping layer, so the values must not need one.
  // Brackets are banned too: the reader's array capture is bracket-
  // bounded, so a ']' inside a value would write fine and silently
  // parse back as dictionary=None (round-trip data loss, no error)
  dictionary.foreach(d => require(
    d.nonEmpty && d.distinct.size == d.size &&
      d.forall(v => v.nonEmpty &&
        !v.exists(c => c == '"' || c == '\\' || c == '[' || c == ']')),
    s"dictionary must be non-empty, distinct, quote/backslash/bracket-free: $d"))
}

/** Filesystem-backed database/series catalog.
  *
  * Layout — the Spark-native analog of the reference's storage plane
  * (db dir + per-series chunk/partition files, src/timeseries.c:82-123,
  * src/partition.h:9-15):
  *
  * {{{
  * <root>/<db>/<series>/_series.json          series options
  * <root>/<db>/<series>/data/bucket=<n>/part-....parquet
  * }}}
  *
  * `bucket = timestamp div bucketNs` is the analog of the reference's
  * 900-second in-memory chunk window (TS_CHUNK_SIZE,
  * src/timeseries.h:13) promoted to a parquet partition column: range
  * queries prune whole buckets (partition pruning) and parquet
  * row-group min/max stats prune within a bucket — the same two-level
  * seek as the reference's chunk window + sparse index
  * (src/index.c:65-109) but handled entirely by Spark's scan planning.
  * At 100 TB the bucket width is the knob that keeps partition counts
  * sane; it is stored per-series so ingest jobs agree on it.
  */
final class TsCatalog(spark: SparkSession, val root: String,
    val bucketNs: Long = TsCatalog.DefaultBucketNs) {

  import TsCatalog._

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Session-scoped active database (reference `USE`,
    * src/dbcontext.c:153-167). */
  @volatile var activeDb: Option[String] = None

  // ---- database ops (reference src/dbcontext.c:85-167) ----

  def createDb(name: String): Boolean = {
    val created = fs.mkdirs(new Path(root, name))
    // first database created becomes active (reference src/dbcontext.c:112-118)
    if (activeDb.isEmpty) activeDb = Some(name)
    created
  }

  def dbExists(name: String): Boolean = fs.exists(new Path(root, name))

  def useDb(name: String): Boolean =
    dbExists(name) && { activeDb = Some(name); true }

  def listDbs(): Seq[String] =
    if (!fs.exists(new Path(root))) Nil
    else fs.listStatus(new Path(root)).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted

  def dropDb(name: String): Boolean = {
    val p = new Path(root, name)
    fs.exists(p) && fs.delete(p, true)
  }

  // ---- series ops (reference src/timeseries.c:173-208) ----

  private def seriesPath(db: String, name: String) = new Path(new Path(root, db), name)
  private def dataPath(db: String, name: String) = new Path(seriesPath(db, name), "data")

  def createSeries(db: String, name: String, meta: SeriesMeta): Boolean = {
    if (!dbExists(db)) return false
    val sp = seriesPath(db, name)
    if (fs.exists(sp)) return false
    fs.mkdirs(sp)
    writeMeta(db, name, meta)
    true
  }

  def seriesExists(db: String, name: String): Boolean =
    fs.exists(seriesPath(db, name))

  def listSeries(db: String): Seq[String] =
    if (!dbExists(db)) Nil
    else try fs.listStatus(new Path(root, db)).filter(_.isDirectory)
      .map(_.getPath.getName).toSeq.sorted
    catch { case _: java.io.FileNotFoundException => Nil } // raced dropDb

  def dropSeries(db: String, name: String): Boolean = {
    val p = seriesPath(db, name)
    fs.exists(p) && fs.delete(p, true)
  }

  def seriesMeta(db: String, name: String): Option[SeriesMeta] = {
    val p = new Path(seriesPath(db, name), "_series.json")
    if (!fs.exists(p)) return None
    // exists→open is a TOCTOU window against a concurrent dropSeries
    // (CatalogSoakSpec caught it): a series deleted in between reads
    // as absent, exactly like losing the exists() race
    val in =
      try fs.open(p)
      catch { case _: java.io.FileNotFoundException => return None }
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    // minimal JSON of our own writing: {"retentionNs":N|null,"dupPolicy":"s"}
    val ret = "\"retentionNs\"\\s*:\\s*(null|-?\\d+)".r.findFirstMatchIn(text)
      .map(_.group(1)).filter(_ != "null").map(_.toLong)
    val pol = "\"dupPolicy\"\\s*:\\s*\"([^\"]*)\"".r.findFirstMatchIn(text)
      .map(_.group(1)).getOrElse("insert")
    // entries are quote-free by SeriesMeta's contract, so a flat
    // quoted-string split parses the array exactly
    val dict = "\"dictionary\"\\s*:\\s*\\[([^\\]]*)\\]".r
      .findFirstMatchIn(text).map(_.group(1))
      .map("\"([^\"]*)\"".r.findAllMatchIn(_).map(_.group(1)).toSeq)
      .filter(_.nonEmpty)
    Some(SeriesMeta(ret, pol, dict))
  }

  private def writeMeta(db: String, name: String, meta: SeriesMeta): Unit = {
    val p = new Path(seriesPath(db, name), "_series.json")
    val out = fs.create(p, true)
    val retJson = meta.retentionNs.map(_.toString).getOrElse("null")
    val dictJson = meta.dictionary
      .map(_.mkString("[\"", "\",\"", "\"]")).getOrElse("null")
    try out.write(
      s"""{"retentionNs":$retJson,"dupPolicy":"${meta.dupPolicy}","dictionary":$dictJson,"bucketNs":$bucketNs}"""
        .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  // ---- read / write (reference ts_insert src/timeseries.c:621-682) ----

  /** All points of a series as (timestamp: Long nanos, value: Double).
    *
    * When a closed time range is given, a derived predicate on the
    * `bucket` PARTITION column is applied alongside the precise
    * timestamp filter: partition pruning skips whole buckets at plan
    * time (the analog of the reference's chunk-window skip,
    * src/timeseries.c:882-891), and parquet min/max stats prune row
    * groups within the surviving buckets (the sparse-index analog,
    * src/index.c:65-109). Without the bucket predicate Spark would list
    * and scan every partition.
    */
  def readSeries(db: String, name: String,
      range: Option[(Long, Long)] = None): DataFrame = {
    val dp = dataPath(db, name)
    if (!fs.exists(dp) || fs.listStatus(dp).isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], PointSchema)
    val full = spark.read.schema(PointSchemaWithBucket).parquet(dp.toString)
    val pruned = range match {
      case Some((t0, t1)) =>
        full.filter(col("bucket") >= Math.floorDiv(t0, bucketNs) &&
            col("bucket") <= Math.floorDiv(t1, bucketNs) &&
            col("timestamp") >= t0 && col("timestamp") <= t1)
      case None => full
    }
    pruned.select(col("timestamp"), col("value"))
  }

  /** Append a batch of points, honoring the series' duplication policy.
    *
    * "ignore": drop batch rows whose timestamp already exists — the
    * existing-side lookup reads ONLY the buckets the batch can collide
    * with ([[bucketPrunePredicate]]: exact IN pruning for narrow
    * batches, O(1) range bounds past the literal cap), so the cost
    * scales with the batch's time span, not series size.
    */
  def insert(db: String, name: String, points: DataFrame): Long = {
    val meta = seriesMeta(db, name).getOrElse(SeriesMeta(None))
    val batch = points.select(
      col("timestamp").cast(LongType).as("timestamp"),
      col("value").cast(DoubleType).as("value"))
    val deduped =
      if (meta.dupPolicy == "ignore") {
        val b = batch.dropDuplicates("timestamp")
        val dp = dataPath(db, name)
        if (fs.exists(dp) && fs.listStatus(dp).nonEmpty) {
          val existing = spark.read.schema(PointSchemaWithBucket)
            .parquet(dp.toString)
            .filter(bucketPrunePredicate(b))
            .select(col("timestamp"))
          b.join(existing, Seq("timestamp"), "left_anti")
        } else b
      } else batch
    val withBucket = deduped.withColumn("bucket", bucketExpr)
    // persist so the count and the write share one evaluation of the
    // (possibly anti-joined) batch plan instead of running it twice
    withBucket.persist()
    try {
      val n = withBucket.count()
      // sort within partitions by timestamp before writing: parquet
      // row-group min/max stats become tight, so intra-bucket range
      // seeks prune row groups (the sparse-index analog only works on
      // sorted data; the reference keeps chunks sorted for the same
      // reason, src/timeseries.c:357-395)
      withBucket.sortWithinPartitions("bucket", "timestamp")
        .write.mode("append").partitionBy("bucket")
        .parquet(dataPath(db, name).toString)
      n
    } finally withBucket.unpersist()
  }

  /** Partition-pruning predicate on the existing side of an
    * ignore-policy insert: which `bucket` partitions can contain
    * timestamps colliding with batch `b`?
    *
    * Dense/narrow batches (the PLANS.md norm — bucketNs is sized to
    * ingest density) get the tight form: the batch's distinct bucket
    * ids as an IN filter, pruning exactly the touched partitions. But
    * the literal list is driver-collected and inlined into the plan,
    * so a years-long backfill into fine buckets would put 10^5-10^6
    * literals in one In() — quadratic planning cost and a bloated
    * broadcast. Past [[InLiteralCap]] distinct buckets the predicate
    * degrades to min/max RANGE bounds on the ordered bucket column:
    * O(1) plan size, still partition-pruned at listing time, reading
    * at worst the untouched buckets inside the batch's span (which the
    * timestamp-level anti-join then ignores — correctness never
    * depends on the pruning being tight). The common case stays ONE
    * small driver job (distinct + limit), the wide case pays one extra
    * min/max aggregate.
    */
  private[graft] def bucketPrunePredicate(b: DataFrame): Column = {
    val sample = b.select(bucketExpr.as("b")).distinct()
      .limit(InLiteralCap + 1).collect().map(_.getLong(0))
    if (sample.length <= InLiteralCap)
      col("bucket").isin(sample.toIndexedSeq: _*)
    else {
      val mm = b.agg(min(bucketExpr).as("lo"), max(bucketExpr).as("hi"))
        .collect()(0)
      col("bucket") >= mm.getLong(0) && col("bucket") <= mm.getLong(1)
    }
  }

  /** Max inlined bucket literals before [[bucketPrunePredicate]] falls
    * back to range bounds. 1000 is far under any planner pain point
    * while covering weeks of per-hour buckets. */
  private val InLiteralCap = 1000

  /** Exact floor-division bucket of a timestamp column — MUST agree
    * with the Math.floorDiv pruning bounds in readSeries. Double
    * division + cast is wrong twice over: epoch-nanos exceed 2^53 (the
    * quotient can round UP across a bucket boundary, landing a point in
    * a bucket the pruner will skip — silent data loss), and the cast
    * truncates toward zero rather than flooring for negatives. `div`
    * truncates too, so correct it by one when a negative division has a
    * remainder. */
  private def bucketExpr: Column =
    // pmod(a, b) >= 0 for b > 0, so (a - pmod(a, b)) is an exact
    // multiple of b and integer `div` of exact multiples == floorDiv;
    // every step stays in Long arithmetic (no double rounding).
    expr(s"(timestamp - pmod(timestamp, ${bucketNs}L)) div ${bucketNs}L")

  /** Retention reaper: physically drops whole bucket partitions whose
    * entire window is older than `now - retention` — a metadata-only
    * delete (no rewrite), the scalable analog of retention enforcement
    * the reference declares but never runs (src/timeseries.h:88-92).
    *
    * CONCURRENT-INGEST CONTRACT (unlike [[compact]], which demands a
    * quiet window): the reaper IS safe against a concurrent
    * micro-batch append, by disjointness rather than locking. The
    * reaper touches only bucket dirs whose ENTIRE window predates
    * `now − retention`; an append touches only its own rows' buckets,
    * and its ignore-policy read side prunes to the batch's own bucket
    * span ([[bucketPrunePredicate]]). So as long as
    * `retention > ingest lateness + bucket width` — i.e. arriving rows
    * are never already expired — the two paths' directory sets are
    * DISJOINT, and a dir delete cannot interact with a rename-in
    * commit or a pruned-out listing entry on a different dir
    * (StreamingSpec races the two and locks the invariant). Ingesting
    * rows OLDER than the retention window concurrently with the reaper
    * is outside the contract: such an append can recreate a bucket dir
    * the reaper just dropped, resurrecting only the new rows until the
    * next reap.
    */
  def enforceRetention(db: String, name: String, nowNs: Long): Int = {
    val meta = seriesMeta(db, name).getOrElse(return 0)
    val cutoff = meta.retentionNs match {
      // retention <= 0 means "retention disabled", NOT "expire
      // everything" — `CREATE ts 0 'policy'` is the conventional way to
      // pass a duplication policy without retention
      case Some(r) if r > 0 => nowNs - r
      case _ => return 0
    }
    val dp = dataPath(db, name)
    if (!fs.exists(dp)) return 0
    // same TOCTOU hardening as seriesMeta: a series dropped between
    // the exists check and the listing reaps nothing
    val listed =
      try fs.listStatus(dp).toSeq
      catch { case _: java.io.FileNotFoundException => return 0 }
    val dropped = listed
      .filter(_.getPath.getName.startsWith("bucket="))
      .filter { st =>
        val b = st.getPath.getName.stripPrefix("bucket=").toLong
        (b + 1) * bucketNs <= cutoff // entire bucket window expired
      }
    dropped.foreach(st => fs.delete(st.getPath, true))
    dropped.size
  }

  /** Compact small files within each bucket (the analog of the
    * reference's chunk flush/merge, src/partition.c:62-125): rewrite
    * buckets whose file count exceeds `maxFilesPerBucket`.
    *
    * CONCURRENT-READER CONTRACT (this and [[enforceRetention]]):
    * maintenance is NOT safe to run under concurrent reads — schedule
    * it in the ingest pipeline's quiet window, exactly like the
    * reference's single-threaded flush. What a concurrent scan
    * actually observes, by when its FILE LISTING happened:
    *  - listed before the swap, opened files before the swap finished
    *    → complete pre-maintenance snapshot;
    *  - listed before the swap, opened after → loud FileNotFound
    *    (Spark's re-create-the-Dataset error) with default
    *    `spark.sql.files.ignoreMissingFiles=false` — never enable
    *    that flag on this catalog, it converts this case to silent
    *    row loss;
    *  - listed INSIDE the two-rename swap window (live dir renamed
    *    aside, replacement not yet installed) → the bucket is simply
    *    absent from the listing: a SILENTLY EMPTY bucket. The window
    *    is two renames wide (the rewrite itself happens into a temp
    *    dir beforehand), but it exists — which is WHY the quiet-window
    *    requirement is the contract and loud failure only the
    *    common-case safety net (MaintenanceSpec exercises the
    *    stale-index races; the listing-mid-swap race is inherently
    *    timing-dependent).
    * Snapshot-isolated reads under maintenance require a versioned
    * table format (the Delta/Iceberg class of layout), which this
    * bucket-directory catalog deliberately does not reimplement. */
  def compact(db: String, name: String, maxFilesPerBucket: Int = 8): Int = {
    val dp = dataPath(db, name)
    if (!fs.exists(dp)) return 0
    val toCompact =
      (try fs.listStatus(dp).toSeq
       catch { case _: java.io.FileNotFoundException => return 0 })
      .filter(_.getPath.getName.startsWith("bucket="))
      .filter(st => fs.listStatus(st.getPath)
        .count(f => f.getPath.getName.endsWith(".parquet")) > maxFilesPerBucket)
    toCompact.foreach { st =>
      val bucketDir = st.getPath
      val tmp = new Path(bucketDir.getParent, "._compact_" + bucketDir.getName)
      val old = new Path(bucketDir.getParent, "._old_" + bucketDir.getName)
      val df = spark.read.schema(PointSchema).parquet(bucketDir.toString)
      df.sort("timestamp").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      // swap via two renames so a crash at any point leaves the data
      // recoverable (either the live dir or ._old_ still holds it);
      // the live dir is never deleted before its replacement is in place
      fs.delete(old, true)
      if (!fs.rename(bucketDir, old))
        throw new java.io.IOException(s"compact: cannot move $bucketDir aside")
      if (!fs.rename(tmp, bucketDir)) {
        fs.rename(old, bucketDir) // roll back
        throw new java.io.IOException(s"compact: cannot install $tmp")
      }
      fs.delete(old, true)
    }
    toCompact.size
  }
}

object TsCatalog {
  /** 900 s in nanos — mirrors the reference's in-memory chunk window
    * (TS_CHUNK_SIZE, src/timeseries.h:13). */
  val DefaultBucketNs: Long = 900L * 1000000000L

  val PointSchema: StructType = StructType(Seq(
    StructField("timestamp", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val PointSchemaWithBucket: StructType = PointSchema.add(
    StructField("bucket", LongType, nullable = true))
}
