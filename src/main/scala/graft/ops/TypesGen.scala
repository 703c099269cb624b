package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `<dgraph.type>` triple synthesis from the written RDF datasets
  * (reference: DbpediaDgraphSparkApp.scala:409-442).
  *
  * Runs over the *read-back* of the written RDF files (the deliberate
  * materialization boundary of [[graft.io.Rdf.write]]) so the type rows
  * reflect exactly what was written, without recomputing the cleanup DAG.
  */
object TypesGen {

  private def typed(df: DataFrame, typeName: String): DataFrame =
    df.withColumn("p", lit("<dgraph.type>"))
      .withColumn("o", lit("\"" + typeName + "\""))

  /** Article/Category/Concept type triples from the per-dataset RDF frames.
    *
    * One global `.distinct()` dedups everything (same single-Exchange
    * rationale as [[ExternalIds]]: the final distinct's partial
    * HashAggregate already dedups every source map-side, so per-source
    * pre-distincts — the reference's shape, DbpediaDgraphSparkApp.scala:
    * 409-433 — would add 8 redundant shuffles). The type literal is
    * attached BEFORE the distinct so an s that is both an Article source
    * and a Category object keeps both type rows, exactly as the
    * reference's union-of-distincts produces. */
  def types(
      labelsRdf: DataFrame,
      infoboxRdf: DataFrame,
      interlangRdf: DataFrame,
      pageLinksRdf: DataFrame,
      categoryRdf: DataFrame,
      skosRdf: DataFrame,
      geoRdf: DataFrame): DataFrame = {
    val articles = Seq(
      labelsRdf.select(col("s"), col("lang")),
      infoboxRdf.select(col("s"), col("lang")),
      interlangRdf.select(col("s"), col("lang")),
      interlangRdf.select(col("o").as("s"), col("lang")),
      pageLinksRdf.select(col("s"), col("lang")),
      categoryRdf.select(col("s"), col("lang")),
      geoRdf.select(col("s"), col("lang")))
      .reduce(_.unionByName(_))
    val articleTypes = typed(articles, "Article")
    val categoryTypes = typed(categoryRdf.select(col("o").as("s"), col("lang")), "Category")
    val skosTypes = typed(skosRdf.select(col("s"), col("lang")), "Concept")
    articleTypes
      .unionByName(categoryTypes)
      .unionByName(skosTypes)
      .distinct()
      .select(col("s"), col("p"), col("o"), col("lang"))
  }
}
