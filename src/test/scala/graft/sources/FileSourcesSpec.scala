package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** JSONL/CSV interchange: round-trip identity, corrupt-record
  * quarantine (PERMISSIVE) and FAILFAST rejection. */
class FileSourcesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("body", StringType)))

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(s"graft_fs_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("jsonl round trip preserves rows, types, and tricky strings") {
    val df = Seq(
      (1L, """quotes " and {"nested": "json"} braces"""),
      (2L, "commas, tabs\tand unicode émigré 中文"),
      (3L, "")).toDF("id", "body")
    val dir = tmpDir("jrt")
    val back = FileSources.roundTripJsonl(df, s"$dir/out")
    assert(back.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
  }

  test("csv round trip preserves quoted/escaped fields and edge whitespace") {
    val df = Seq(
      (1L, """a "quoted" value"""),
      (2L, "comma, inside"),
      (3L, "plain"),
      (4L, "  leading and trailing spaces  "), // default CSV options trim these
      (5L, "\ttab-edged\t"),
      (6L, "")).toDF("id", "body") // "" != NULL: default options lose this
    val dir = tmpDir("crt")
    val back = FileSources.roundTripCsv(df, s"$dir/out")
    assert(back.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
  }

  test("csv round trip keeps NULL and empty string distinct") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("body",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, null),
      org.apache.spark.sql.Row(2L, ""),
      org.apache.spark.sql.Row(3L, "x"))
    val df = spark.createDataFrame(rows, schema)
    val dir = tmpDir("crtnull")
    val got = FileSources.roundTripCsv(df, s"$dir/out")
      .orderBy("id").collect().map(r => r.getLong(0) -> Option(r.get(1)))
    assert(got.toSeq == Seq(1L -> None, 2L -> Some(""), 3L -> Some("x")))
  }

  test("permissive jsonl quarantines malformed lines instead of failing") {
    val dir = tmpDir("bad")
    Files.write(Paths.get(dir, "part.json"),
      ("""{"id": 1, "body": "good"}""" + "\n" +
        """{broken json line""" + "\n" +
        """{"id": 3, "body": "also good"}""" + "\n").getBytes("UTF-8"))
    // Spark refuses to filter on ONLY the corrupt column of a raw file
    // scan (the line would have to be re-parsed); cache materializes
    // the parsed rows first — the documented inspection pattern
    val read = FileSources.readJsonl(spark, dir, schema).cache()
    assert(read.count() == 3)
    val bad = read.filter(col(FileSources.CORRUPT_COL).isNotNull).collect()
    assert(bad.length == 1)
    assert(bad.head.getAs[String](FileSources.CORRUPT_COL).startsWith("{broken"))
    // schema columns of the quarantined row are null
    assert(bad.head.isNullAt(read.columns.indexOf("id")))
    // good rows decode with null quarantine
    assert(read.filter(col(FileSources.CORRUPT_COL).isNull).count() == 2)
  }

  test("jsonl schema evolution: a column added to the schema reads as null from old files") {
    // old files lack `extra`; reading them with the EVOLVED schema
    // null-fills instead of failing — the explicit-schema contract is
    // what makes corpus-wide schema evolution a metadata change
    val dir = tmpDir("evo")
    FileSources.writeJsonl(Seq((1L, "a"), (2L, "b")).toDF("id", "body"), s"$dir/out")
    val evolved = StructType(schema.fields :+
      StructField("extra", LongType, nullable = true))
    val read = FileSources.readJsonl(spark, s"$dir/out", evolved).cache()
    assert(read.count() == 2)
    assert(read.filter(col("extra").isNull).count() == 2)
    assert(read.filter(col(FileSources.CORRUPT_COL).isNotNull).count() == 0)
    // and rows written WITH the new column coexist in the same dir read
    FileSources.writeJsonl(Seq((3L, "c", 9L)).toDF("id", "body", "extra"),
      s"$dir/out2")
    val both = FileSources.readJsonl(spark, s"$dir/out*", evolved)
    assert(both.count() == 3)
    assert(both.filter(col("extra") === 9L).count() == 1)
  }

  test("failfast jsonl throws on the first malformed line") {
    val dir = tmpDir("ff")
    Files.write(Paths.get(dir, "part.json"),
      ("""{"id": 1, "body": "good"}""" + "\n" + "not json\n").getBytes("UTF-8"))
    intercept[org.apache.spark.SparkException] {
      FileSources.readJsonl(spark, dir, schema, failFast = true).collect()
    }
  }

  test("orc round trip preserves nested arrays, nulls, and empty strings") {
    val df = Seq(
      (1L, Seq(1.5f, -2.25f, 0f), Option("plain")),
      (2L, Seq.empty[Float], Option("")),   // empty array AND empty string
      (3L, Seq(Float.MinPositiveValue), Option.empty[String]))
      .toDF("id", "vals", "tag")
    val dir = tmpDir("ort")
    val back = FileSources.roundTripOrc(df, s"$dir/out")
    assert(back.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    // NULL and "" stay distinct (the CSV hazard ORC is immune to)
    val byId = back.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(2L).getString(2) == "")
    assert(byId(3L).isNullAt(2))
  }

  test("orc scans carry predicate pushdown and schema projection") {
    val df = (1L to 100L).map(i => (i, s"body$i", i % 7)).toDF("id", "body", "grp")
    val dir = tmpDir("opd")
    FileSources.writeOrc(df, s"$dir/out")
    val narrow = StructType(Seq(
      StructField("id", LongType), StructField("grp", LongType)))
    val q = FileSources.readOrc(spark, s"$dir/out", narrow)
      .filter(col("grp") === 3L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("grp"),
      s"filter not pushed to the ORC scan:\n$plan")
    // projection pruned to the requested schema — body never read
    assert(plan.contains("ReadSchema") && !plan.contains("body"),
      s"scan not pruned:\n$plan")
    assert(q.count() == df.filter(col("grp") === 3L).count())
  }
}
