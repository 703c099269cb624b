package graft.ops

import graft.SparkSpec

class GeoJsonSpec extends SparkSpec {

  test("malformed point literals survive as null coordinates (no ANSI crash)") {
    val spark2 = spark
    import spark2.implicits._
    val in = Seq(
      ("<s1>", "<p>", "\"12.5\"", "en"), // no space: one token
      ("<s2>", "<p>", "\"abc def\"", "en") // non-numeric
    ).toDF("s", "p", "o", "lang")
    val out = GeoJson.pointsToGeoJson(in).select("o").as[String].collect()
    assert(out.length === 2) // job completes; nulls render in the JSON
    assert(out(0).contains("coordinates"))
  }

  test("point literal becomes escaped GeoJSON with lon/lat swapped") {
    val spark2 = spark
    import spark2.implicits._
    val in = Seq(("<s>", "<http://www.georss.org/georss/point>", "\"51.5 -0.25\"", "en"))
      .toDF("s", "p", "o", "lang")
    val out = GeoJson.pointsToGeoJson(in).select("o").as[String].head()
    assert(out === "\"{\\\"type\\\":\\\"Point\\\",\\\"coordinates\\\":[-0.25,51.5]}\"^^<geo:geojson>")
  }
}
