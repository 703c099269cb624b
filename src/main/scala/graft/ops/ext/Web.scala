package graft.ops.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Crawl-grade HTML → text extraction (the WET-file step of a web
    * pipeline): drop script/style/comment blocks wholesale, strip the
    * remaining tags, decode the six entities that dominate real markup,
    * collapse whitespace. Every pattern is RE2-safe (inline `(?is)`
    * flags, non-greedy bodies, NO backreferences — script and style get
    * separate patterns because RE2 cannot express `</\1>`), so DuckDB
    * replays the identical chain with the `g` flag. Per-row codegen'd
    * regexp work; scan-bound. Not a sanitizer — malformed-markup edge
    * cases (unclosed script, tags inside attributes) degrade to extra
    * text, never to dropped content. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&" // amp LAST
    ).foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

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

  /** [[registeredDomain]] with a public-suffix list: when the last TWO
    * host labels are themselves a public suffix (`co.uk`, `com.au`, …),
    * the registered domain is the last THREE labels; when the last THREE
    * are (`pref.aichi.jp`), it is the last FOUR. This is the documented
    * fix for the two-label heuristic; `suffixes` is the caller's PSL
    * slice as a plan literal — at the full list's ~10k entries it stays
    * a literal `In` over a short string (or swaps to a broadcast join)
    * without changing the rollup's shape. Load a snapshot with
    * [[loadPublicSuffixes]] / [[bundledPublicSuffixes]]. A host that IS
    * a public suffix (no extra label) falls through the cascade and
    * reports its trailing labels — PSL semantics would say "no
    * registered domain"; crawl URLs virtually never hit it. */
  def registeredDomain(canonical: Column, suffixes: Seq[String]): Column = {
    require(suffixes.nonEmpty,
      "registeredDomain: empty suffix list — use the 1-arg overload")
    val host = regexp_extract(canonical, "^[^/]*", 0)
    val lab = "[A-Za-z0-9-]+"
    val last2 = regexp_extract(host, s"$lab\\.$lab$$", 0)
    val last3 = regexp_extract(host, s"$lab\\.$lab\\.$lab$$", 0)
    val last4 = regexp_extract(host, s"$lab\\.$lab\\.$lab\\.$lab$$", 0)
    when(last3.isInCollection(suffixes) && last4 =!= "", last4)
      .otherwise(when(last2.isInCollection(suffixes) && last3 =!= "", last3)
        .otherwise(last2))
  }

  /** A parsed public-suffix list: exact rules (`co.uk`), wildcard rule
    * BASES (`*.ck` → `"ck"` — any single label under the base is a
    * suffix), and exception rules (`!www.ck` → `www.ck` is NOT a suffix;
    * it is itself the registered domain for every host under it). All
    * three sets are plan literals — the full public list is ~10k short
    * strings. */
  final case class PslRules(
      exact: Set[String], wildcardBases: Set[String], exceptions: Set[String]) {
    require(exact.nonEmpty || wildcardBases.nonEmpty,
      "PslRules: no suffix rules — use the 1-arg registeredDomain")
  }

  /** Parse PSL-format lines (publicsuffix.org/list): blank lines and
    * `//` comments skipped, rules lowercased; `*.x` lines become
    * wildcard bases, `!x` lines exceptions, the rest exact rules. */
  private def parsePslRules(lines: Iterator[String]): PslRules = {
    val rules = lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map(_.toLowerCase(java.util.Locale.ROOT))
      .toSeq
    PslRules(
      exact = rules.filter(r => !r.startsWith("*") && !r.startsWith("!")).toSet,
      wildcardBases = rules.collect { case r if r.startsWith("*.") => r.drop(2) }.toSet,
      exceptions = rules.collect { case r if r.startsWith("!") => r.drop(1) }.toSet)
  }

  /** Load a public-suffix snapshot from any filesystem path (raw lines
    * through Hadoop FS, like the `_manifest.jsonl` read-back — an
    * underscore-prefixed snapshot would be invisible to Spark's path
    * readers). Driver-side: the list is plan-literal-sized by
    * contract (~10k short strings). */
  def loadPublicSuffixRules(spark: SparkSession, path: String): PslRules = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try parsePslRules(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** [[loadPublicSuffixRules]]' exact rules only — the `Seq` surface the
    * two-arg [[registeredDomain]] overload takes. */
  def loadPublicSuffixes(spark: SparkSession, path: String): Seq[String] =
    loadPublicSuffixRules(spark, path).exact.toSeq.sorted

  /** The checked-in snapshot (a small public-list subset including
    * 2- and 3-label exact rules plus the `*.ck` / `!www.ck` pair the
    * specs and q150 exercise), bundled as a classpath resource so every
    * entry point — tests, Verify, Bench — resolves it regardless of
    * working directory. */
  def bundledPublicSuffixRules(): PslRules = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_snapshot.dat")
    require(in != null, "bundled public-suffix snapshot missing from classpath")
    try parsePslRules(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** [[bundledPublicSuffixRules]]' exact rules only. */
  def bundledPublicSuffixes(): Seq[String] =
    bundledPublicSuffixRules().exact.toSeq.sorted

  /** [[registeredDomain]] under the FULL rule set — exact, wildcard, and
    * exception rules, the complete publicsuffix.org algorithm bounded at
    * 3-label suffixes (wildcard bases to 2 labels, exceptions to 3 — the
    * real list's depth for all but a handful of jp city blocks). The
    * cascade tests longest suffix first; an exception SHORT-CIRCUITS its
    * level (`!www.ck`: every host at or under `www.ck` registers as
    * `www.ck` even though `*.ck` would make `www.ck` a suffix). Still a
    * per-row regexp chain + literal `In`s — map-side, scan-bound, the
    * same plan shape as the exact-only overload. */
  def registeredDomain(canonical: Column, rules: PslRules): Column = {
    val host = regexp_extract(canonical, "^[^/]*", 0)
    val lab = "[A-Za-z0-9-]+"
    val last1 = regexp_extract(host, s"$lab$$", 0)
    val last2 = regexp_extract(host, s"$lab\\.$lab$$", 0)
    val last3 = regexp_extract(host, s"$lab\\.$lab\\.$lab$$", 0)
    val last4 = regexp_extract(host, s"$lab\\.$lab\\.$lab\\.$lab$$", 0)
    def in(c: Column, s: Set[String]): Column =
      if (s.isEmpty) lit(false) else c.isInCollection(s.toSeq.sorted)
    val suf3 = in(last3, rules.exact) || in(last2, rules.wildcardBases)
    val suf2 = in(last2, rules.exact) || in(last1, rules.wildcardBases)
    when(in(last3, rules.exceptions) && last3 =!= "", last3)
      .when(suf3 && last4 =!= "", last4)
      .when(in(last2, rules.exceptions) && last2 =!= "", last2)
      .when(suf2 && last3 =!= "", last3)
      .otherwise(last2)
  }

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

  /** URL-level dedup: keep exactly ONE document per canonical URL — the one
    * with the lowest `idCol` — returning surviving rows unchanged. This is
    * the first dedup pass of a crawl pipeline (the same page refetched
    * under scheme/www/query variants), run before any content-level dedup
    * because it needs no text comparison at all. Requires `idCol` unique
    * (the [[graft.ops.ext.Sampling]] contract).
    *
    * Scale shape: the election is `min(id)` grouped by the canonical key —
    * partial-aggregable, so the hottest URL (a page fetched a million
    * times) collapses map-side before the shuffle, the
    * [[Dedup.dropDuplicateLines]] skew precedent. Survivors come back via
    * a left-semi join on the 8-byte id; document text never shuffles. */
  def dedupByUrl(docs: DataFrame, urlCol: Column, idCol: String): DataFrame = {
    val winners = docs
      .select(canonicalUrl(urlCol).as("_canon"), col(idCol))
      .groupBy(col("_canon")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    docs.join(winners, Seq(idCol), "left_semi")
  }

  /** Domain blocklist — drop every document whose registered domain is on
    * the list (the C4 badwords-domain pass). Purely map-side: the list is
    * an `In` literal, the domain a per-row regexp chain; at PSL-scale list
    * sizes this becomes a broadcast anti join without changing callers. */
  def blockDomains(docs: DataFrame, urlCol: Column, blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "blockDomains: empty blocklist — nothing to do")
    docs.where(!registeredDomain(canonicalUrl(urlCol)).isInCollection(blocked))
  }

  /** Per-domain rollup: doc count, total chars, and alpha-ratio in integer
    * basis points as a RATIO OF SUMS (the [[TextStats.goodSources]]
    * precedent — per-doc averaging would let one long doc drown the
    * signal). This is the decision table a domain blocklist is built FROM:
    * rank domains by `alpha_bp`, eyeball the tail, feed [[blockDomains]].
    *
    * One shuffle, partial-aggregated on the domain key; per-row work is
    * the regexp chain + two lengths, scan-bound. `alpha_bp` is integer
    * division, engine-exact; an all-empty-text domain reports 0 rather
    * than dividing by zero. */
  def domainStats(docs: DataFrame, urlCol: Column, textCol: Column): DataFrame =
    domainStatsBy(docs, registeredDomain(canonicalUrl(urlCol)), textCol)

  /** [[domainStats]] with the public-suffix-aware rollup key — same plan,
    * the key regexps just cascade one more label (see the two-arg
    * `registeredDomain` overload). */
  def domainStats(
      docs: DataFrame, urlCol: Column, textCol: Column,
      suffixes: Seq[String]): DataFrame =
    domainStatsBy(docs, registeredDomain(canonicalUrl(urlCol), suffixes), textCol)

  /** [[domainStats]] under the full rule set (wildcards + exceptions). */
  def domainStats(
      docs: DataFrame, urlCol: Column, textCol: Column,
      rules: PslRules): DataFrame =
    domainStatsBy(docs, registeredDomain(canonicalUrl(urlCol), rules), textCol)

  private def domainStatsBy(
      docs: DataFrame, domain: Column, textCol: Column): DataFrame =
    docs.select(domain.as("domain"),
        length(textCol).cast("long").as("_nc"),
        graft.functions.AlphaCountExpr.alpha_count(textCol).cast("long").as("_na"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_nc")).as("sum_chars"),
        sum(col("_na")).as("_sum_alpha"))
      .select(col("domain"), col("n_docs"), col("sum_chars"),
        when(col("sum_chars") > 0, expr("_sum_alpha * 10000 div sum_chars"))
          .otherwise(lit(0L)).as("alpha_bp"))
}
