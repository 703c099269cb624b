package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External-id (xid) triple synthesis
  * (reference: DbpediaDgraphSparkApp.scala:374-398).
  *
  * Collects every URI that appears as a subject (and, for link datasets, as
  * an object) across all datasets, dedups, and emits one
  * `_:md5 <xid> "uri" .` triple per URI so the original identity survives
  * URI-to-blank-node rewriting.
  *
  * Scale: ONE global `.distinct()` over the raw union — no per-source
  * pre-distinct. Spark's distinct already runs a partial HashAggregate in
  * every input task before its Exchange, so each source gets map-side
  * deduplication for free; a per-source `.distinct()` (the shape the
  * reference's `def uris` implies, DbpediaDgraphSparkApp.scala:374-385)
  * would add one full Exchange + stage barrier PER SOURCE (12 extra
  * shuffles of the same bytes) and remove nothing the single distinct's
  * partial aggregation doesn't. The one shuffle carries `(s, lang)` pairs
  * only. Plan-asserted single-Exchange in ExternalIdsSpec.
  */
object ExternalIds {

  val SkosRelated = "<http://www.w3.org/2004/02/skos/core#related>"
  val SkosBroader = "<http://www.w3.org/2004/02/skos/core#broader>"
  val SkosConcept = "<http://www.w3.org/2004/02/skos/core#Concept>"

  /** Gather distinct `(s, lang)` URI occurrences from the datasets.
    * Mirrors the reference's source list: subjects of all datasets, objects
    * of the link datasets, skos objects only for related/broader, plus the
    * static skos Concept URI. */
  def uriOccurrences(
      spark: SparkSession,
      labels: DataFrame,
      infobox: DataFrame,
      interlang: DataFrame,
      pageLinks: DataFrame,
      categories: DataFrame,
      skos: DataFrame,
      geo: DataFrame): DataFrame = {
    import spark.implicits._
    val sources = Seq(
      labels.select(col("s"), col("lang")),
      infobox.select(col("s"), col("lang")),
      interlang.select(col("s"), col("lang")),
      interlang.select(col("o").as("s"), col("lang")),
      pageLinks.select(col("s"), col("lang")),
      pageLinks.select(col("o").as("s"), col("lang")),
      categories.select(col("s"), col("lang")),
      categories.select(col("o").as("s"), col("lang")),
      skos.select(col("s"), col("lang")),
      skos.where(col("p").isin(SkosRelated, SkosBroader)).select(col("o").as("s"), col("lang")),
      Seq((SkosConcept, "any")).toDF("s", "lang"),
      geo.select(col("s"), col("lang")))
    sources.reduce(_.unionByName(_)).distinct()
  }

  /** Project URI occurrences to xid triples:
    * `(_:md5(uri), <xid>, "uri-without-brackets", lang)`. */
  def xidTriples(uris: DataFrame): DataFrame =
    uris.select(
      Columns.blank("s"),
      lit("<xid>").as("p"),
      Columns.xidLiteral(col("s")).as("o"),
      col("lang"))
}
