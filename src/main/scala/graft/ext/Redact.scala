package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PII redaction — the scrubbing pass every LLM training-data pipeline
  * runs before text reaches a tokenizer: find emails / phone numbers by
  * regex, replace them with typed placeholder tags, and count what was
  * removed (the counts feed the pipeline's audit metrics).
  *
  * The synthetic corpus contains no organic PII, so the registered query
  * first SYNTHESIZES a contact line per customer row — deterministically,
  * from key columns only — and then redacts it. Both halves are mirrored
  * in the oracle, so the driver verifies the actual regex semantics
  * (match boundaries, global replacement, count extraction), not a
  * no-op pass over PII-free text.
  *
  * Regex subset note: patterns stick to character classes, `+` and
  * bounded repetition — the fragment of regex syntax that Java's engine
  * (Spark) and RE2 (DuckDB) treat identically; no backrefs, no
  * lookaround. Spark's `regexp_replace` is global by default; the DuckDB
  * mirror passes the `'g'` flag explicitly.
  *
  * Scale: pure per-row narrow transforms — projection + two
  * `regexp_replace` + two `regexp_extract_all`, all codegen'd, zero
  * shuffles before the presentation sort. The 100 TB plan is a scan →
  * map with nothing to tune.
  */
object Redact {

  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Registered query `x4_pii_redact`: synthesize a contact message per
    * customer, redact emails then phones, report redacted text + counts.
    */
  def piiRedact(spark: SparkSession, sfDir: String): DataFrame = {
    val msg = Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        concat(
          lit("contact "), col("c_name"),
          lit(" via "), lower(regexp_replace(col("c_name"), "Customer#", "user")),
          lit("@example.com or +1-919-555-"),
          lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
          lit(" re "), col("c_mktsegment")).as("msg"))
    msg.select(
        col("c_custkey"),
        regexp_replace(regexp_replace(col("msg"), EmailRe, "[EMAIL]"),
          PhoneRe, "[PHONE]").as("redacted"),
        size(regexp_extract_all(col("msg"), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("msg"), lit(PhoneRe), lit(0)))
          .cast("long").as("n_phones"))
      .orderBy(col("c_custkey"))
  }

  val piiRedactSql: String =
    """WITH m AS (
      |  SELECT c_custkey,
      |    'contact ' || c_name || ' via '
      |      || lower(replace(c_name, 'Customer#', 'user'))
      |      || '@example.com or +1-919-555-'
      |      || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
      |      || ' re ' || c_mktsegment AS msg
      |  FROM customer)
      |SELECT c_custkey,
      |  regexp_replace(regexp_replace(msg,
      |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
      |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS redacted,
      |  CAST(len(regexp_extract_all(msg,
      |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(msg,
      |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones
      |FROM m
      |ORDER BY c_custkey""".stripMargin

  // ---- web-scrape cleaning (HTML strip + link extraction) ----------------

  private val TagRe = "<[^>]*>"
  private val UrlRe = "https?://[a-z0-9./_-]+"

  /** Registered query `x4_web_clean`: the markup-removal front of a
    * web-crawl pipeline — strip HTML tags, extract+normalize outbound
    * link hosts, report cleaned length. Like [[piiRedact]], the corpus
    * has no organic markup, so a web-page wrapper is synthesized
    * deterministically per document first; both halves are mirrored in
    * the oracle so the driver verifies the regex semantics, not a
    * no-op. Per-row narrow transforms + one host rollup shuffle. */
  def webClean(spark: SparkSession, sfDir: String): DataFrame = {
    val page = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        concat(
          lit("<html><body><p class=\"main\">"),
          substring(col("text"), 1, 80),
          lit("</p><a href=\"https://"), col("source"),
          lit(".example.org/"), col("lang"), lit("/"), col("doc_id"),
          lit("\">ref</a><a href=\"https://mirror-"),
          (col("doc_id") % 3).cast("string"),
          lit(".example.net/x\">alt</a></body></html>")).as("html"))
    page.select(
        col("doc_id"), col("lang"),
        length(regexp_replace(col("html"), TagRe, "")).as("clean_len"),
        regexp_extract_all(col("html"), lit(UrlRe), lit(0)).as("urls"))
      .select(col("doc_id"), col("lang"), col("clean_len"),
        explode(col("urls")).as("url"))
      .select(col("doc_id"), col("lang"), col("clean_len"),
        regexp_extract(col("url"), "https?://([^/]+)", 1).as("host"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("clean_len")).cast("long").as("sum_clean_len"))
      .orderBy(col("host"))
  }

  val webCleanSql: String =
    """WITH page AS (
      |  SELECT doc_id, lang,
      |    '<html><body><p class="main">' || substr(text, 1, 80)
      |      || '</p><a href="https://' || source || '.example.org/'
      |      || lang || '/' || doc_id || '">ref</a><a href="https://mirror-'
      |      || CAST(doc_id % 3 AS VARCHAR)
      |      || '.example.net/x">alt</a></body></html>' AS html
      |  FROM documents),
      |links AS (
      |  SELECT doc_id, lang,
      |    length(regexp_replace(html, '<[^>]*>', '', 'g')) AS clean_len,
      |    unnest(regexp_extract_all(html, 'https?://[a-z0-9./_-]+')) AS url
      |  FROM page)
      |SELECT regexp_extract(url, 'https?://([^/]+)', 1) AS host,
      |  count(*) AS n_links,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  CAST(sum(clean_len) AS BIGINT) AS sum_clean_len
      |FROM links
      |GROUP BY 1
      |ORDER BY host""".stripMargin
}
