package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.engine.SeriesOps
import graft.ops.Multimodal

/** Streaming + multimodal entries for the correctness gate.
  *
  * `stream_sample_by` runs a REAL Structured Streaming query (parquet
  * file source → complete-mode tumbling aggregation → memory sink) and
  * returns the sink table; the oracle is the equivalent batch SQL —
  * this locks stream/batch semantic parity, Spark's core streaming
  * guarantee. `mm_features` exercises the multimodal partition-batch
  * decode plumbing (stub codec ⇒ rows-only check, no oracle).
  */
object StreamSurface {

  private val HOUR_US = 3600000000L

  private def streamSampleBy(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    // the streaming file source requires a DIRECTORY: stage the single
    // parquet file into a temp dir (idempotent per sfDir)
    val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
    val stageDir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_stream_src_$safe")
    stageDir.mkdirs()
    val staged = new java.io.File(stageDir, "events.parquet")
    if (!staged.exists())
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"), staged.toPath)
    val stream = s.readStream.schema(schema).parquet(stageDir.toString)
      .select(expr("ts div 1000").as("timestamp"), col("value"))
    val agg = SeriesOps.sampleBy(stream, HOUR_US)
    val sinkName = "stream_sample_by_sink_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(sinkName).start()
    try q.processAllAvailable() finally q.stop()
    s.table(sinkName)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_sample_by" -> streamSampleBy,
    "mm_features" -> ((s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents"))).toDF()),
  )

  val oracleSql: Map[String, String] = Map(
    "stream_sample_by" ->
      s"""WITH ev AS (SELECT epoch_us(ts) AS timestamp, value FROM events)
         |SELECT (timestamp - timestamp % $HOUR_US) + $HOUR_US AS sample_ts,
         |  round(CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / count(*), 4) AS avg_value,
         |  count(*) AS n_points
         |FROM ev GROUP BY 1""".stripMargin,
    // mm_features: stub codec → rows-only check (no SQL-expressible oracle).
  )
}
