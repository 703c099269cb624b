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

  /** Swap a 2-element array: `[lat, lon]` -> `[lon, lat]`. `get` (not
    * `apply`): under Spark 4's default ANSI mode an out-of-bounds index
    * would throw and kill the job on one malformed point; `get` yields
    * null like the reference's Spark 3 behavior. */
  def swap(c: Column): Column = array(get(c, lit(1)), get(c, lit(0)))

  /** `(s, p, o, lang)` with `o = "lat lon"` -> o rewritten to GeoJSON.
    * Non-numeric tokens survive as null coordinates (`try_cast`) instead
    * of failing the job under ANSI. */
  def pointsToGeoJson(geoTriples: DataFrame): DataFrame =
    geoTriples
      .withColumn("point", regexp_replace(col("o"), "\"", ""))
      .withColumn("coordinates", swap(split(col("point"), " ").try_cast(ArrayType(FloatType))))
      .withColumn("json", to_json(struct(lit("Point").as("type"), col("coordinates"))))
      .withColumn("o", regexp_replace(col("json"), "\"", "\\\\\""))
      .withColumn("o", concat(lit("\""), col("o"), lit("\"^^<geo:geojson>")))
      .drop("point", "coordinates", "json")
}
