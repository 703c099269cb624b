package graft.io

import graft.core.Triple
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Turtle (N-Triples-style) text source.
  *
  * Reference behavior (DbpediaToParquetSparkApp.scala:137-152): read lines,
  * drop `#` comments, strip the trailing ` .`, split at the first two spaces
  * into (s, p, o) — the object may contain spaces.
  *
  * Spark-first difference: the reference parses with a typed `Dataset.map`,
  * which deserializes every row to JVM objects and opts that stage out of
  * whole-stage codegen. We parse with native expressions (`substring` +
  * `split(col, " ", 3)`) so the scan-parse-project pipeline stays inside one
  * codegen stage — at 374 GB of input ttl (reference corpus) the per-row
  * object churn is the difference between scan-bound and CPU-bound.
  */
object Ttl {

  /** Read one or more .ttl files into a typed triple Dataset. */
  def read(spark: SparkSession, paths: Seq[String]): Dataset[Triple] =
    parse(spark.read.textFile(paths: _*).toDF("value"))

  /** Read the ttl files of one language, tagging the `lang` column. */
  def readLang(spark: SparkSession, lang: String, paths: Seq[String]): DataFrame =
    read(spark, paths).withColumn("lang", lit(lang))

  /** Parse a one-string-column ("value") DataFrame of ttl lines. */
  def parse(lines: DataFrame): Dataset[Triple] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines
      .where(!col("value").startsWith("#"))
      // drop trailing " ." (exactly two characters, like the reference's dropRight(2))
      .select(split(col("value").substr(lit(1), length(col("value")) - 2), " ", 3).as("spo"))
      .select(
        element_at(col("spo"), 1).as("s"),
        element_at(col("spo"), 2).as("p"),
        element_at(col("spo"), 3).as("o"))
      .as[Triple]
  }
}
