package graft.ops.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL extraction and canonicalization — the web-curation pass of a
  * CommonCrawl/C4-style pipeline: pull URLs out of document text, reduce
  * each to a canonical key, and aggregate on that key. URL-level dedup is
  * how a crawl corpus drops the same page fetched under `http://` vs
  * `https://`, `www.` vs bare host, with and without tracking query
  * params — before any content-level dedup ever runs.
  *
  * Canonicalization contract (each step a single anchored regexp, RE2-safe
  * and first-match-compatible so the DuckDB oracle mirrors it verbatim):
  *   1. strip the query string and fragment (`[?#].*`),
  *   2. strip the scheme (`http://` / `https://`, any case),
  *   3. lowercase the HOST only (path case is significant per RFC 3986),
  *   4. strip one leading `www.`,
  *   5. strip one trailing `/`.
  * Ports are kept (a non-default port is a different origin). This is the
  * standard normalization depth for crawl dedup; site-specific rules
  * (tracking-param allowlists, case-insensitive hosts' paths) layer on top
  * without changing the plan shape.
  *
  * Scale shape: extraction and canonicalization are per-row regexp chains —
  * map-side, scan-bound, full codegen. [[urlInventory]] adds exactly one
  * shuffle, partial-aggregated on the canonical key.
  */
object Web {

  /** RE2-safe URL matcher: scheme (any case), host, optional port, optional
    * non-whitespace path/query/fragment. Deliberately conservative about
    * host characters (letters, digits, dots, hyphens) — crawl-grade, not a
    * full RFC 3986 parser. */
  val urlPattern: String = "[Hh][Tt][Tt][Pp][Ss]?://[A-Za-z0-9.-]+(:[0-9]+)?(/[^\\s]*)?"

  /** All URLs in a text column, in document order. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(urlPattern), lit(0))

  /** The canonical dedup key for one URL (see object Scaladoc for the
    * contract). Every regexp here is anchored or end-consuming, so Spark's
    * replace-all and DuckDB's replace-first semantics coincide. */
  def canonicalUrl(url: Column): Column = {
    val rest = regexp_replace(
      regexp_replace(url, "[?#].*", ""),
      "^[Hh][Tt][Tt][Pp][Ss]?://", "")
    val host = regexp_extract(rest, "^[^/]*", 0)
    val path = regexp_replace(regexp_replace(rest, "^[^/]*", ""), "/$", "")
    concat(regexp_replace(lower(host), "^www\\.", ""), path)
  }

  /** Registered domain (last two host labels) of a canonical URL — the
    * rollup key for per-site statistics and domain blocklists. A heuristic
    * without a public-suffix list (`co.uk` comes out as `co.uk`), which is
    * the documented trade; a PSL lookup would swap in as a broadcast map
    * join without changing the plan. */
  def registeredDomain(canonical: Column): Column =
    regexp_extract(
      regexp_extract(canonical, "^[^/]*", 0),
      "[A-Za-z0-9-]+\\.[A-Za-z0-9-]+$", 0)

  /** Canonical-URL inventory over a corpus: one row per canonical key with
    * its reference count, how many distinct RAW spellings collapsed into
    * it (the dedup win), how many distinct documents cite it, the earliest
    * citing document, and the registered domain.
    *
    * One shuffle on the canonical key; the two distinct counts expand
    * map-side and partial-aggregate, so the reducer sees pre-deduped
    * (key, value) rows — the standard two-phase distinct-agg shape. */
  def urlInventory(docs: DataFrame, textCol: Column, idCol: String): DataFrame =
    docs.select(col(idCol), explode(extractUrls(textCol)).as("url"))
      .withColumn("canonical", canonicalUrl(col("url")))
      .groupBy(col("canonical"))
      .agg(
        count(lit(1)).as("n_refs"),
        countDistinct(col("url")).as("n_forms"),
        countDistinct(col(idCol)).as("n_docs"),
        min(col(idCol)).as("first_doc"))
      .withColumn("domain", registeredDomain(col("canonical")))
}
