package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** xid and type synthesis: result semantics plus the single-Exchange plan
  * contract (the 12-source union must dedup in ONE shuffle — per-source
  * pre-distincts would add an Exchange per source for nothing, since the
  * global distinct's partial HashAggregate already dedups map-side). */
class ExternalIdsSpec extends SparkSpec {

  private def hashExchanges(df: DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllMatchIn(df.queryExecution.executedPlan.toString).length

  private def triples(rows: Seq[(String, String, String, String)]): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("s", "p", "o", "lang")
  }

  test("uriOccurrences dedups across sources in a single Exchange") {
    val spark2 = spark
    import spark2.implicits._
    val labels = triples(Seq(("<a>", "<l>", "\"x\"@de", "de")))
    val links = triples(Seq(("<a>", "<w>", "<b>", "de"), ("<a>", "<w>", "<b>", "de")))
    val empty = triples(Seq.empty)
    val uris = ExternalIds.uriOccurrences(spark, labels, empty, empty,
      links, empty, empty, empty)
    val got = uris.as[(String, String)].collect().toSet
    // <a> appears as labels-subject and twice as links-subject: once
    assert(got === Set(("<a>", "de"), ("<b>", "de"), (ExternalIds.SkosConcept, "any")))
    assert(hashExchanges(uris) === 1, uris.queryExecution.executedPlan.toString)
  }

  test("xidTriples renders blank node + xid literal") {
    val spark2 = spark
    import spark2.implicits._
    val xid = ExternalIds.xidTriples(Seq(("<http://x/A>", "de")).toDF("s", "lang"))
      .as[(String, String, String, String)].head()
    val md5A = java.security.MessageDigest.getInstance("MD5")
      .digest("<http://x/A>".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(xid === ((s"_:$md5A", "<xid>", "\"http://x/A\"", "de")))
  }

  test("types keeps both roles of a dual-typed node, one Exchange total") {
    val spark2 = spark
    import spark2.implicits._
    // <c> is a category object AND a labels subject -> Article + Category
    val labels = triples(Seq(("<c>", "<l>", "\"x\"@de", "de")))
    val cats = triples(Seq(("<a>", "<s>", "<c>", "de"), ("<a>", "<s>", "<c>", "de")))
    val skos = triples(Seq(("<c2>", "<p>", "\"k\"@de", "de")))
    val empty = triples(Seq.empty)
    val types = TypesGen.types(labels, empty, empty, empty, cats, skos, empty)
    val got = types.select(col("s"), col("o")).as[(String, String)].collect().toSet
    assert(got === Set(
      ("<c>", "\"Article\""), ("<c>", "\"Category\""),
      ("<a>", "\"Article\""), ("<c2>", "\"Concept\"")))
    assert(hashExchanges(types) === 1, types.queryExecution.executedPlan.toString)
  }
}
