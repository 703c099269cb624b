package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** GeoJSON synthesis from `"lat lon"` point literals
  * (reference: DbpediaDgraphSparkApp.scala:249-260).
  *
  * The source triples carry one predicate (`georss#point`) whose object is a
  * quoted `"lat lon"` literal. The output object is a quote-escaped GeoJSON
  * `{"type":"Point","coordinates":[lon,lat]}` literal typed `<geo:geojson>`
  * — note the lat/lon swap, and that quote-escaping happens *after*
  * `to_json` (so the embedded quotes of the JSON itself get escaped).
  *
  * All native expressions — one whole-stage-codegen pass, no UDFs.
  */
object GeoJson {

  /** Swap a 2-element array: `[lat, lon]` -> `[lon, lat]`. */
  def swap(c: Column): Column = array(c(1), c(0))

  /** `(s, p, o, lang)` with `o = "lat lon"` -> o rewritten to GeoJSON. */
  def pointsToGeoJson(geoTriples: DataFrame): DataFrame =
    geoTriples
      .withColumn("point", regexp_replace(col("o"), "\"", ""))
      .withColumn("coordinates", swap(split(col("point"), " ").cast(ArrayType(FloatType))))
      .withColumn("json", to_json(struct(lit("Point").as("type"), col("coordinates"))))
      .withColumn("o", regexp_replace(col("json"), "\"", "\\\\\""))
      .withColumn("o", concat(lit("\""), col("o"), lit("\"^^<geo:geojson>")))
      .drop("point", "coordinates", "json")
}
