package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/provenance canonicalization + host-grain grouping — the
  * standard curation stage between raw crawl metadata and URL-keyed
  * dedup/mixing (C4 deduplicates at URL grain; CCNet buckets quality
  * strata by provenance). The fixture has no URL column, so a
  * deterministic MESSY url is planted per doc ([[augUrl]] — mixed-case
  * scheme/host, optional www, default and non-default ports,
  * index.html suffixes, tracking query, fragment; [[AUG_SQL]] is the
  * field-for-field oracle twin, the text_pii_redact convention), and
  * the OPERATOR is the canonicalization rule chain:
  *
  *  1. drop the fragment (`#…` — never identity-bearing)
  *  2. drop the query string (the C4/CCNet dedup-key choice: tracking
  *     params dominate real query strings; documented coarsening)
  *  3. lowercase scheme, host and path (dedup-key choice)
  *  4. strip a leading `www.`
  *  5. strip the scheme's DEFAULT port only (:80 http, :443 https —
  *     an explicit :8080, or :80 under https, is identity and stays)
  *  6. strip a trailing `/index.html`, then a trailing `/`
  *
  * Every rule is an anchored regexp_replace / lower / concat —
  * constructs with identical Java/RE2 semantics (the TextFns house
  * rule), rendered once for Spark here and once for DuckDB in
  * [[canonCteSql]]; the two must stay rule-for-rule identical.
  *
  * Shape at scale: canonicalization is a pure projection (scan speed,
  * zero shuffles); URL-grain dedup is one groupBy on the canonical
  * key; host-grain mixing reuses [[Mixing.plan]]'s one-aggregation
  * planning step with `host` as the stratum column.
  */
object UrlCanon {

  /** Deterministic messy-URL plant per doc_id (oracle twin: AUG_SQL). */
  def augUrl(docId: Column): Column = concat(
    when(docId % 3 === 0, lit("HTTP"))
      .when(docId % 3 === 1, lit("https")).otherwise(lit("http")),
    lit("://"),
    when(docId % 2 === 0, lit("WWW.")).otherwise(lit("")),
    lit("Site"), (docId % 7).cast("string"), lit(".Example.org"),
    when(docId % 5 === 0, lit(":80"))
      .when(docId % 5 === 1, lit(":443"))
      .when(docId % 5 === 2, lit(":8080")).otherwise(lit("")),
    lit("/Articles/"), (docId % 50).cast("string"),
    when(docId % 4 === 0, lit("/index.html"))
      .when(docId % 4 === 1, lit("/")).otherwise(lit("")),
    when(docId % 3 === 0,
      concat(lit("?utm_source=feed&id="), (docId % 10).cast("string")))
      .otherwise(lit("")),
    when(docId % 6 === 0, lit("#section2")).otherwise(lit("")))

  val AUG_SQL: String =
    "(CASE doc_id % 3 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https' ELSE 'http' END" +
      " || '://' || CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END" +
      " || 'Site' || CAST(doc_id % 7 AS VARCHAR) || '.Example.org'" +
      " || CASE doc_id % 5 WHEN 0 THEN ':80' WHEN 1 THEN ':443'" +
      " WHEN 2 THEN ':8080' ELSE '' END" +
      " || '/Articles/' || CAST(doc_id % 50 AS VARCHAR)" +
      " || CASE doc_id % 4 WHEN 0 THEN '/index.html' WHEN 1 THEN '/' ELSE '' END" +
      " || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&id=' ||" +
      " CAST(doc_id % 10 AS VARCHAR) ELSE '' END" +
      " || CASE WHEN doc_id % 6 = 0 THEN '#section2' ELSE '' END)"

  private def schemeOf(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Rules 1-2: scheme stripped, fragment and query dropped. */
  private def restOf(u: Column): Column =
    regexp_replace(regexp_replace(
      regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", ""),
      "#.*$", ""), "\\?.*$", "")

  /** Lowercased host[:port] with `www.` stripped (rules 3-4). */
  private def hostPortOf(rest: Column): Column =
    regexp_replace(lower(regexp_extract(rest, "^([^/]*)", 1)), "^www\\.", "")

  /** Bare host (no port) — the host-grain grouping key. */
  def host(u: Column): Column =
    regexp_replace(hostPortOf(restOf(u)), ":[0-9]+$", "")

  /** The full canonical URL under rules 1-6. */
  def canonical(u: Column): Column = {
    val sch = schemeOf(u)
    val rest = restOf(u)
    val hp1 = hostPortOf(rest)
    val hp = when(sch === "http", regexp_replace(hp1, ":80$", ""))
      .when(sch === "https", regexp_replace(hp1, ":443$", ""))
      .otherwise(hp1)
    val p = regexp_replace(regexp_replace(
      lower(regexp_replace(rest, "^[^/]*", "")),
      "/index\\.html$", ""), "/$", "")
    concat(sch, lit("://"), hp, p)
  }

  /** Per-doc canonicalization over the planted urls: (doc_id, url,
    * url_canon, host) — pure projection, scan speed. */
  def canonicalizeUrls(docs: DataFrame): DataFrame = {
    val u = augUrl(col("doc_id"))
    docs.select(col("doc_id"), u.as("url"),
      canonical(u).as("url_canon"), host(u).as("host"))
  }

  /** URL-grain exact dedup over the canonical key: one groupBy —
    * (url_canon, host, keep_doc_id = min, n_dups). The plant collapses
    * case/www/ports/suffix/query/fragment variants onto shared
    * canonical urls, so n_dups > 1 rows exist by construction. */
  def dedupByUrl(docs: DataFrame): DataFrame =
    canonicalizeUrls(docs)
      .groupBy("url_canon", "host")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_dups"))

  /** Host-grain mixing recipe — ONE definition feeds the Spark plan
    * AND the oracle's CASE arms (the MIX_TARGETS convention). */
  val HOST_TARGETS: Seq[(String, Int)] = Seq(
    "site0.example.org" -> 2000, "site1.example.org" -> 2000,
    "site2.example.org" -> 1500, "site3.example.org" -> 1500,
    "site4.example.org" -> 1000, "site5.example.org" -> 1000,
    "site6.example.org" -> 1000)

  /** Provenance-aware mixture planning: host strata (from the
    * canonicalized urls) drive [[Mixing.plan]]'s stratum budgets —
    * the composed curation step (canonicalize → group by provenance →
    * plan the mix). */
  def hostMixPlan(docs: DataFrame): DataFrame =
    Mixing.plan(
      docs.withColumn("host", host(augUrl(col("doc_id")))),
      "host", HOST_TARGETS.toMap)

  /** DuckDB CTE chain computing (doc_id, url, url_canon, host) from
    * ANY source CTE exposing (doc_id, url) — the oracle-side rendering
    * of rules 1-6, reusable wherever urls surface (the planted column
    * here, extracted hrefs in [[Html]]'s link gate). Ends in `canon`. */
  def canonChainSql(src: String): String =
    s"""r AS (SELECT doc_id, url,
       |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
       |    regexp_replace(regexp_replace(regexp_replace(url,
       |      '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '#.*$$', ''), '\\?.*$$', '') AS rest
       |  FROM $src),
       |pp AS (SELECT doc_id, url, sch,
       |    regexp_replace(lower(regexp_extract(rest, '^([^/]*)', 1)), '^www\\.', '') AS hp1,
       |    lower(regexp_replace(rest, '^[^/]*', '')) AS p0
       |  FROM r),
       |canon AS (SELECT doc_id, url,
       |    sch || '://' ||
       |      CASE WHEN sch = 'http' THEN regexp_replace(hp1, ':80$$', '')
       |           WHEN sch = 'https' THEN regexp_replace(hp1, ':443$$', '')
       |           ELSE hp1 END ||
       |      regexp_replace(regexp_replace(p0, '/index\\.html$$', ''), '/$$', '')
       |      AS url_canon,
       |    regexp_replace(hp1, ':[0-9]+$$', '') AS host
       |  FROM pp)""".stripMargin

  /** The original planted-url instance of the chain (gate oracles). */
  val canonCteSql: String =
    s"""u AS (SELECT doc_id, $AUG_SQL AS url FROM documents),
       |${canonChainSql("u")}""".stripMargin
}
