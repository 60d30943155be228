package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SeriesMeta.dictionary round-trips through the catalog's JSON
  * sidecar and rejects values its minimal writer cannot encode. */
class DictionaryMetaSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("dictionary round-trips with retention and dup policy") {
    val root = Files.createTempDirectory("graft-dictmeta").toString
    val cat = new TsCatalog(spark, root)
    cat.createDb("d")
    val dict = Seq("signup", "purchase", "view", "click", "error")
    assert(cat.createSeries("d", "s",
      SeriesMeta(Some(86400L), "ignore", Some(dict))))
    assert(cat.seriesMeta("d", "s") ===
      Some(SeriesMeta(Some(86400L), "ignore", Some(dict))))
    // absent stays absent (and old sidecars without the field parse)
    assert(cat.createSeries("d", "plain", SeriesMeta(None)))
    assert(cat.seriesMeta("d", "plain") === Some(SeriesMeta(None)))
  }

  test("un-encodable or degenerate dictionaries are rejected at construction") {
    intercept[IllegalArgumentException](SeriesMeta(None, "insert", Some(Nil)))
    intercept[IllegalArgumentException](
      SeriesMeta(None, "insert", Some(Seq("a", "a"))))
    intercept[IllegalArgumentException](
      SeriesMeta(None, "insert", Some(Seq("a\"b"))))
    intercept[IllegalArgumentException](
      SeriesMeta(None, "insert", Some(Seq("a\\b"))))
    intercept[IllegalArgumentException](
      SeriesMeta(None, "insert", Some(Seq(""))))
    // brackets would WRITE fine but the reader's bracket-bounded array
    // capture stops at the first ']' — silent round-trip loss unless
    // rejected at construction (ADVICE r13)
    intercept[IllegalArgumentException](
      SeriesMeta(None, "insert", Some(Seq("[error]"))))
    intercept[IllegalArgumentException](
      SeriesMeta(None, "insert", Some(Seq("a]b"))))
    intercept[IllegalArgumentException](
      SeriesMeta(None, "insert", Some(Seq("a[b"))))
  }
}
