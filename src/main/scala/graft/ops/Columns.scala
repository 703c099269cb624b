package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable column functions of the triple-cleanup program. */
object Columns {

  /** Deterministic blank-node id from a URI: `_:<md5-hex>` (reference:
    * DbpediaDgraphSparkApp.scala:93). `md5` emits lower-case hex in both
    * Spark and the oracle engine, so blank nodes are byte-stable. */
  def blank(c: Column): Column = concat(lit("_:"), md5(c))

  def blank(name: String): Column = blank(col(name)).as(name)

  /** Strip a trailing `@xx` language tag from a literal (reference:
    * DbpediaDgraphSparkApp.scala:94). */
  def removeLangTag(c: Column): Column = regexp_replace(c, "@[a-z]+$", "")

  /** Language code of a dbpedia URI: host prefix before the first dot,
    * minus the 8-char `<http://` prefix — `<http://de.dbpedia.org/...>`
    * yields `de`, and English URIs (`<http://dbpedia.org/...>`) yield the
    * quirk value `dbpedia` which callers must account for (reference:
    * DbpediaDgraphSparkApp.scala:96-115).
    *
    * The reference uses a Scala UDF marked non-deterministic so Catalyst
    * evaluates it once per row; a native `regexp_extract` keeps codegen and
    * needs no such workaround (deterministic native expressions are cheap to
    * re-evaluate and never leave the generated code). */
  def nodeLang(c: Column): Column = substring(element_at(split(c, "\\."), 1), 9, 1 << 30)

  /** `en-xx` datasets carry English predicates: map their lang to `en` for
    * predicate matching (reference: DbpediaDgraphSparkApp.scala:134, 322). */
  def predicateLang(lang: Column): Column =
    when(lang.contains("-"), "en").otherwise(lang)

  /** Quoted xid literal: strip `<`/`>` from the URI and quote it
    * (reference: DbpediaDgraphSparkApp.scala:396). */
  def xidLiteral(c: Column): Column =
    concat(lit("\""), c.substr(lit(2), length(c) - 2), lit("\""))
}
