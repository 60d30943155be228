package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML boilerplate removal + link extraction — the main-content
  * extraction stage every web-crawl corpus passes through before any
  * text operator sees it (the trafilatura/jusText class, reduced to
  * its deterministic regex core). The fixture text carries no markup,
  * so the gates wrap each doc in a deterministic id-derived page
  * ([[augHtml]], the text_pii_redact augmentation convention) with a
  * title, script/style payloads that must vanish WITH their content,
  * entities, a comment, and one anchor whose href is the [[UrlCanon]]
  * planted url — so link extraction composes with the canonicalization
  * chain the url gates already lock.
  *
  * The strip chain (order is semantics and is shared with the oracle):
  *  1. `<script>…</script>` and `<style>…</style>` removed WITH
  *     content (dotall non-greedy — payload text is not content)
  *  2. comments `<!-- … -->` removed
  *  3. every remaining tag `<[^>]+>` becomes ONE space (block
  *     boundaries must not glue words together)
  *  4. entities decode in the fixed [[ENTITIES]] order — `&amp;` LAST,
  *     so `&amp;lt;` decodes to the literal `&lt;` and not `<`
  *  5. whitespace collapses, ends trim
  *
  * Every rule is a regexp_replace with identical Java/RE2 semantics
  * (non-greedy + `(?s)` are common to both). Pure projection: scan
  * speed, zero shuffles, stateless per row at any corpus size.
  */
object Html {

  /** Entity decode table — ONE definition for both engines; `&amp;`
    * must stay last (double-decode guard, see object doc). */
  val ENTITIES: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&amp;" -> "&")

  /** Deterministic page plant per doc (oracle twin: [[AUG_SQL]]). */
  def augHtml(text: Column, docId: Column): Column = concat(
    lit("<html><head><title>t"), docId.cast("string"),
    lit("</title><script>var x="), docId.cast("string"),
    lit(";</script><style>.c{color:red}</style></head><body><h1>Doc &amp; "),
    (docId % 9).cast("string"),
    lit("</h1><p class=\"main\">"), text,
    lit("</p><a href=\""), UrlCanon.augUrl(docId),
    lit("\">read &lt;more&gt;</a><!-- c"), docId.cast("string"),
    lit(" --></body></html>"))

  /** Oracle rendering of [[augHtml]] with any body expression. */
  def augSql(body: String): String =
    "('<html><head><title>t' || CAST(doc_id AS VARCHAR)" +
      " || '</title><script>var x=' || CAST(doc_id AS VARCHAR)" +
      " || ';</script><style>.c{color:red}</style></head><body><h1>Doc &amp; '" +
      " || CAST(doc_id % 9 AS VARCHAR)" +
      " || '</h1><p class=\"main\">' || " + body +
      " || '</p><a href=\"' || " + UrlCanon.AUG_SQL +
      " || '\">read &lt;more&gt;</a><!-- c' || CAST(doc_id AS VARCHAR)" +
      " || ' --></body></html>')"

  val AUG_SQL: String = augSql("text")

  /** The strip chain over any string column (rules 1-5). */
  def stripHtml(c: Column): Column = {
    val noPayload = regexp_replace(regexp_replace(c,
      "(?s)<script[^>]*>.*?</script>", " "),
      "(?s)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noPayload, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    // entities are literal strings — a literal replace chain, not
    // regex passes (the mojibake lesson: ~4x at sf1)
    val decoded = ENTITIES.foldLeft(noTags) { case (acc, (e, ch)) =>
      replace(acc, lit(e), lit(ch))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Oracle rendering of [[stripHtml]] over a SQL expression. */
  def stripHtmlSql(e: String): String = {
    val noPayload = s"regexp_replace(regexp_replace($e, " +
      "'(?s)<script[^>]*>.*?</script>', ' ', 'g'), " +
      "'(?s)<style[^>]*>.*?</style>', ' ', 'g')"
    val noComment = s"regexp_replace($noPayload, '(?s)<!--.*?-->', ' ', 'g')"
    val noTags = s"regexp_replace($noComment, '<[^>]+>', ' ', 'g')"
    val decoded = ENTITIES.foldLeft(noTags) { case (acc, (ent, ch)) =>
      val lit = ch.replace("'", "''")
      s"replace($acc, '$ent', '$lit')"
    }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }

  /** Main-content extraction gate projection: tag count on the raw
    * page, fingerprint + length of the stripped text. */
  def extractText(docs: DataFrame): DataFrame = {
    val aug = augHtml(col("text"), col("doc_id"))
    val clean = stripHtml(aug)
    docs.select(col("doc_id"),
      TextFns.countMatches(aug, "<[^>]+>").as("n_tags"),
      md5(clean).as("clean_fp"),
      length(clean).cast("long").as("clean_len"))
  }

  /** href extraction + canonicalization: one row per anchor, reusing
    * [[UrlCanon.canonical]]/[[UrlCanon.host]] — extracted provenance
    * flows into the same url-grain dedup/mixing keys as declared
    * provenance. Explode is per-doc-bounded (anchors per page). */
  def extractLinks(docs: DataFrame): DataFrame = {
    val aug = augHtml(col("text"), col("doc_id"))
    docs.select(col("doc_id"), aug.as("page"))
      .select(col("doc_id"), explode(expr(
        """regexp_extract_all(page, '<a[^>]*href="([^"]*)"', 1)""")).as("url"))
      .select(col("doc_id"), col("url"),
        UrlCanon.canonical(col("url")).as("url_canon"),
        UrlCanon.host(col("url")).as("host"))
  }
}
