package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Host/URL canonicalization for crawl curation (per-host caps,
  * domain-mix panels). Reference analogue: source-field precedence when
  * merging records from heterogeneous feeds
  * (`kafka_publisher.py:226-241`) — the engine generalizes it to the
  * standard crawl normalization: scheme/host case, `www.` prefix,
  * userinfo, explicit ports, query strings and fragments all collapse
  * to one canonical host key.
  *
  * Everything here is column algebra (regexp expressions inside
  * whole-stage codegen, no UDF), and every regex is kept inside the
  * Java-regex ∩ RE2 dialect intersection so the DuckDB oracles run the
  * SAME pattern.
  */
object UrlOps {

  /** Authority-extraction pattern: scheme `://` [userinfo `@`] host,
    * stopping at port, path, query or fragment. Dialect-portable
    * (no backrefs, no lookaround).
    */
  val HostRe = "^[a-zA-Z]+://(?:[^/?#@]*@)?([^/?#:]+)"

  /** Canonical host of a URL column: extracted authority host,
    * lowercased, `www.` prefix dropped. Empty string for unparseable
    * URLs (no scheme) — callers decide whether to keep or drop those.
    */
  def canonicalHost(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, HostRe, 1)), "^www\\.", "")

  /** The SQL rendering of [[canonicalHost]] (same regexes — DuckDB's
    * RE2 and Java agree on this dialect subset).
    */
  def canonicalHostSql(urlExpr: String): String =
    s"regexp_replace(lower(regexp_extract($urlExpr, '$HostRe', 1)), '^www\\.', '')"

  /** Deterministic messy-URL fixture over (doc_id, source): scheme case,
    * `www.` prefix, host case, explicit :443 port, userinfo, tracking
    * query + fragment all vary by doc_id residue so the canonicalizer
    * has real work on every variant class.
    */
  def urlFixture(docId: Column, source: Column): Column = {
    val host = concat(source, lit(".example.com"))
    concat(
      when(docId % 2 === 0, "https").otherwise("HTTP"), lit("://"),
      when(docId % 5 === 0, "crawler@").otherwise(""),
      when(docId % 4 === 0, concat(lit("www."), host))
        .when(docId % 4 === 1, upper(host))
        .when(docId % 4 === 2, concat(host, lit(":443")))
        .otherwise(host),
      lit("/p/"), docId.cast("string"),
      when(docId % 3 === 0, "?utm_source=feed&ref=rss#frag").otherwise(""))
  }

  /** The SQL rendering of [[urlFixture]]. */
  def urlFixtureSql(id: String, source: String): String =
    s"""CASE WHEN $id % 2 = 0 THEN 'https' ELSE 'HTTP' END || '://' ||
       |    CASE WHEN $id % 5 = 0 THEN 'crawler@' ELSE '' END ||
       |    CASE WHEN $id % 4 = 0 THEN 'www.' || $source || '.example.com'
       |         WHEN $id % 4 = 1 THEN UPPER($source || '.example.com')
       |         WHEN $id % 4 = 2 THEN $source || '.example.com:443'
       |         ELSE $source || '.example.com' END ||
       |    '/p/' || CAST($id AS VARCHAR) ||
       |    CASE WHEN $id % 3 = 0 THEN '?utm_source=feed&ref=rss#frag'
       |         ELSE '' END""".stripMargin
}
