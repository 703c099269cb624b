package graft.ops

import graft.SparkSpec

class LanguagesSpec extends SparkSpec {

  test("expand: en among languages adds en-<lang> dataset names") {
    assert(Languages.expand("de,en,fr") === Some(Seq("de", "en", "en-de", "en-fr", "fr")))
  }

  test("expand: empty means all languages") {
    assert(Languages.expand("") === None)
  }

  test("objectLanguages adds the dbpedia quirk host when en is selected") {
    val spark2 = spark
    import spark2.implicits._
    val all = spark.emptyDataset[String]
    assert(Languages.objectLanguages(Some(Seq("de", "en")), all) === Seq("de", "en", "dbpedia"))
    assert(Languages.objectLanguages(Some(Seq("de")), all) === Seq("de"))
  }
}
