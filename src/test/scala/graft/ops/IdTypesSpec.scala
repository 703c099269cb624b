package graft.ops

import graft.SparkSpec
import graft.io.Rdf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IdTypesSpec extends SparkSpec {

  // fixture with one victim per divergence channel between the legacy
  // passes: an invalid predicate (dropped by the writer, so NOT typed but
  // still an xid) and an infobox datatype-disambiguation loser (in the xid
  // domain but not in the written file's Article domain)
  private def fixture = {
    val spark2 = spark
    import spark2.implicits._
    def t(rows: (String, String, String)*): DataFrame =
      rows.map { case (s, p, o) => (s, p, o, "de") }.toDF("s", "p", "o", "lang")
    val intT = "<http://www.w3.org/2001/XMLSchema#integer>"
    (
      t(("<A>", "<http://www.w3.org/2000/01/rdf-schema#label>", "\"Ah\"@de"),
        ("<B>", "<bad@pred>", "\"invalid predicate\"")),
      // propA's winning type is integer: <E>'s string row loses and is
      // dropped from the written infobox file
      t(("<A>", "<propA>", "\"1\"^^" + intT),
        ("<F>", "<propA>", "\"2\"^^" + intT),
        ("<E>", "<propA>", "\"abc\"")),
      t(("<A>", "<owl#sameAs>", "<X>")),
      t(("<A>", "<linksTo>", "<D>")),
      t(("<A>", "<subject>", "<Cat1>")),
      t(("<Cat1>", ExternalIds.SkosBroader, "<Cat2>"),
        ("<Cat1>", graft.ops.Cleanup.SkosPrefLabel, "\"lbl\"@de")),
      t(("<G>", "<http://www.georss.org/georss/point>", "\"1.0 2.0\"")))
  }

  private def collectSet(df: DataFrame): Set[(String, String, String, String)] = {
    val spark2 = spark
    import spark2.implicits._
    df.as[(String, String, String, String)].collect().toSet
  }

  test("fused xids equal the legacy uriOccurrences pass") {
    val (labels, infobox, interlang, pageLinks, categories, skos, geo) = fixture
    val withTypes = DataTypes.withDataTypeExact(infobox)
    val winning = DataTypes.mostFrequentTypePerPredicate(withTypes)
    val agg = IdTypes.rolesAggregate(spark, labels, infobox,
      DataTypes.disambiguate(withTypes, winning),
      interlang, pageLinks, categories, skos, geo)
    val legacy = ExternalIds.xidTriples(ExternalIds.uriOccurrences(spark,
      labels, infobox, interlang, pageLinks, categories, skos, geo))
    assert(collectSet(IdTypes.xids(agg)) === collectSet(legacy))
    // the invalid-predicate subject and the disambiguation loser ARE xids
    val ids = collectSet(IdTypes.xids(agg)).map(_._3)
    assert(ids.contains("\"B\"") && ids.contains("\"E\""), ids)
  }

  test("fused types equal TypesGen over the written files' read-back") {
    val (labels, infobox, interlang, pageLinks, categories, skos, geo) = fixture
    val withTypes = DataTypes.withDataTypeExact(infobox)
    val winning = DataTypes.mostFrequentTypePerPredicate(withTypes)
    val survivors = DataTypes.disambiguate(withTypes, winning)
    for (ext <- Seq(false, true)) {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-idtypes-$ext").toString
      // the legacy path: clean, WRITE, and read back every dataset — the
      // materialization boundary the fused pass must reproduce exactly
      val cleaned = Seq(
        "labels" -> Cleanup.labels(labels, ext, removeLanguageTags = false),
        "infobox" -> Cleanup.infoboxWith(withTypes, winning, ext),
        "interlang" -> Cleanup.uriPairs(interlang, ext),
        "pageLinks" -> Cleanup.uriPairs(pageLinks, ext),
        "categories" -> Cleanup.uriPairs(categories, ext),
        "skos" -> Cleanup.skos(skos, ext, removeLanguageTags = false),
        "geo" -> Cleanup.geo(geo, ext)
      ).map { case (name, df) => name -> Rdf.write(df, s"$tmp/$name.rdf") }.toMap
      val legacy = TypesGen.types(
        cleaned("labels"), cleaned("infobox"), cleaned("interlang"),
        cleaned("pageLinks"), cleaned("categories"), cleaned("skos"), cleaned("geo"))
      val agg = IdTypes.rolesAggregate(spark, labels, infobox, survivors,
        interlang, pageLinks, categories, skos, geo)
      val fused = collectSet(IdTypes.types(agg, ext))
      assert(fused === collectSet(legacy), s"externaliseUris=$ext")
      // divergence victims: B (invalid predicate) and E (disambiguation
      // loser) are absent from the type rows; the geo-only subject G is
      // typed Article
      def blankOf(u: String) = "_:" + java.security.MessageDigest.getInstance("MD5")
        .digest(u.getBytes("UTF-8")).map("%02x".format(_)).mkString
      def sub(u: String) = if (ext) blankOf(u) else u
      val subjects = fused.map(_._1)
      assert(!subjects.contains(sub("<B>")), subjects)
      assert(!subjects.contains(sub("<E>")), subjects)
      assert(fused.contains((sub("<G>"), "<dgraph.type>", "\"Article\"", "de")))
    }
  }
}
