package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ColumnsSpec extends SparkSpec {

  private def one(in: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String = {
    val spark2 = spark
    import spark2.implicits._
    Seq(in).toDF("c").select(c(col("c"))).as[String].head()
  }

  test("blank node id is _: plus lower-case md5 hex (golden)") {
    // md5("<http://ex/a>") — golden value pinned so output stays byte-stable
    assert(one("<http://ex/a>", Columns.blank) === "_:" + "ec3be69fd338bda935e63ba824a1372d")
  }

  test("removeLangTag strips a trailing @xx only") {
    assert(one("\"label\"@de", Columns.removeLangTag) === "\"label\"")
    assert(one("\"a@b.com\"", Columns.removeLangTag) === "\"a@b.com\"")
  }

  test("nodeLang extracts the dbpedia host language, with the dbpedia quirk") {
    assert(one("<http://de.dbpedia.org/resource/X>", Columns.nodeLang) === "de")
    assert(one("<http://dbpedia.org/resource/X>", Columns.nodeLang) === "dbpedia")
  }

  test("predicateLang maps en-xx to en") {
    val spark2 = spark
    import spark2.implicits._
    val out = Seq("en-de", "fr").toDF("lang")
      .select(Columns.predicateLang(col("lang"))).as[String].collect()
    assert(out === Array("en", "fr"))
  }

  test("xidLiteral strips brackets and quotes the uri") {
    assert(one("<http://ex/a>", Columns.xidLiteral) === "\"http://ex/a\"")
  }
}
