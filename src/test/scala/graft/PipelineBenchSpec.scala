package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.col

/** Smoke gate for the PipelineBench generator: the synthetic release tree
  * must stay discoverable and parseable by the real pipeline — a schema
  * drift in the generator (or the testdata lineitem) fails here instead of
  * silently producing an empty bench. */
class PipelineBenchSpec extends SparkSpec {

  test("generated ttl tree is discoverable and flows through stage 1") {
    val work = Files.createTempDirectory("graft-pb-spec").toString
    val ttlBase = s"$work/ttl"
    val bytes = PipelineBench.generate(
      spark, "/root/testdata/sf0.001", ttlBase, ttlMb = 1, parallelism = 4)
    assert(bytes > 100 * 1024, bytes) // ~1 MB requested; at least 100 KB out

    // discovery sees all four languages and all seven datasets
    val langs = graft.io.Discovery.languages(
      spark, ttlBase, PipelineBench.Release, "core")
    assert(langs === Seq("de", "en", "es", "fr"))
    val datasets = graft.io.Discovery.datasets(
      spark, ttlBase, PipelineBench.Release, "core")
    assert(datasets.toSet === Set("labels", "infobox_properties",
      "interlanguage_links", "page_links", "article_categories",
      "skos_categories", "geo_coordinates"))

    // one dataset end-to-end through the real stage-1 entry point
    val n = graft.pipeline.TtlToParquet.runDiscovered(
      spark, ttlBase, PipelineBench.Release, "core", "labels", s"$work/pq/labels.parquet")
    assert(n > 0)
    val back = spark.read.parquet(s"$work/pq/labels.parquet")
    assert(back.columns.sorted.toSeq === Seq("lang", "o", "p", "s"))
    // parse produced well-formed triples: uri subject, label predicate
    val row = back.where(col("lang") === "en").head()
    assert(row.getAs[String]("s").startsWith("<http://en.dbpedia.org/resource/R"))
    assert(row.getAs[String]("p") === "<http://www.w3.org/2000/01/rdf-schema#label>")
    assert(row.getAs[String]("o").endsWith("\"@en"))
  }
}
