package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only WARC parse throughput at volume (the Multimodal MB/s
  * table's sibling): replicates the sf documents into a large
  * deterministic crawl fixture (doc_id offsets keep the generative
  * arithmetic intact), builds the WARC files once, then times the
  * record walk + extraction alone — compressed and uncompressed bytes
  * reported separately since odd files are gzip-member files.
  * Run: sbt "runMain graft.tools.WarcProfile <sfDir> <replicas> [nFiles]"
  */
object WarcProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(64)
    val nFiles = args.lift(2).map(_.toLong)
      .getOrElse(graft.sources.Warc.NFiles)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("warc-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // whole-crawl-file binary rows: the default 4096-row columnar
      // batch would reserve rows x multi-MB of direct buffer per task
      // (measured: direct-memory OOM at 8.5 GB with 32 tasks on 4 MB
      // payloads); a handful of rows per batch is plenty at this width
      .config("spark.sql.parquet.columnarReaderBatchSize", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "source")
    val big = (0 until reps).map(k =>
        docs.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          col("text"), col("source")))
      .reduce(_ unionByName _)
    // stage as REAL crawl files on disk (odd ids are gzip-member
    // files): the production layout, read back through the binaryFile
    // source — staging them as parquet binary cells instead hits
    // multi-GB direct-buffer reservations in the vectorized reader at
    // this payload width
    val staged = sys.props("java.io.tmpdir") + "/graft_warc_profile"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(staged))
    new java.io.File(staged).mkdirs()
    graft.sources.Warc.filesFromDocuments(big, nFiles)
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        it.foreach { r =>
          val id = r.getLong(0)
          val ext = if (id % 2 == 1) "warc.gz" else "warc"
          java.nio.file.Files.write(
            java.nio.file.Paths.get(staged, f"crawl-$id%05d.$ext"),
            r.getAs[Array[Byte]](1))
        }
      }
    val inBytes = new java.io.File(staged).listFiles().map(_.length()).sum
    println(f"[warcprofile] files=${new java.io.File(staged).list().length} compressed+plain input ${inBytes / 1e6}%.1f MB")

    def time(name: String)(thunk: => Long): Unit = {
      thunk // warm
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val out = thunk
        ((System.nanoTime() - t0) / 1e9, out)
      }
      val mb = reps.map { case (s, b) => (b / 1e6) / s }
      println(f"[warcprofile] $name%-22s ${reps.map(r => f"${r._1}%.2f s").mkString(" ")}  ${mb.map(m => f"$m%.0f").mkString("/")} MB/s (decoded-body basis)")
    }

    val recs = graft.sources.Warc.recordsFromPath(spark, staged)
    time("walk_extract")(
      recs.filter(col("rec_type") === "response")
        .agg(sum("body_bytes")).collect()(0).getLong(0))

    spark.stop()
  }
}
