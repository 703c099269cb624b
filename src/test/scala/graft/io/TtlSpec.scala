package graft.io

import graft.SparkSpec
import graft.core.Triple

class TtlSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def parse(lines: String*): Seq[Triple] = {
    val spark2 = spark
    import spark2.implicits._
    Ttl.parse(lines.toDF("value")).collect().toSeq
  }

  test("parses subject, predicate, object from a ttl line") {
    assert(parse("<s> <p> <o> .") === Seq(Triple("<s>", "<p>", "<o>")))
  }

  test("object keeps embedded spaces (split at first two spaces only)") {
    assert(parse("""<s> <p> "a b c" .""") === Seq(Triple("<s>", "<p>", "\"a b c\"")))
  }

  test("drops comment lines") {
    assert(parse("# a comment", "<s> <p> <o> .") === Seq(Triple("<s>", "<p>", "<o>")))
  }

  test("typed and lang-tagged literals survive verbatim") {
    assert(parse("""<s> <p> "1"^^<http://t> .""") === Seq(Triple("<s>", "<p>", "\"1\"^^<http://t>")))
    assert(parse("""<s> <p> "x"@de .""") === Seq(Triple("<s>", "<p>", "\"x\"@de")))
  }

  test("rdf line render + read-back round-trips") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("<s>", "<p>", "\"a b\"", "de")).toDF("s", "p", "o", "lang")
    val line = Rdf.line(df).select("value").as[String].head()
    assert(line === "<s> <p> \"a b\" .")
  }
}
