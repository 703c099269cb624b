package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-dataset / per-language statistics
  * (reference: DbpediaDgraphSparkApp.scala:140-179).
  *
  * The reference computes, per dataset: total triples, distinct subjects
  * ("nodes"), distinct predicates — then a wide per-language table by
  * full-outer-joining each dataset's `groupBy(lang).count` on `lang`, with
  * an `en-*` union rollup.
  *
  * Scale note (the dominant cost of the whole reference pipeline, SURVEY
  * §2.4): exact `select(c).distinct().count` is two full shuffles per
  * metric. [[summary]] therefore takes an `exact` flag — `false` uses
  * `approx_count_distinct` (HyperLogLog++, one map-side-combinable
  * aggregation, no shuffle of distinct values) which is the only sane
  * setting at 100 TB; `true` reproduces the reference's exact semantics
  * for parity checks at test scale.
  */
object Stats {

  /** (triples, nodes, predicates) of one dataset, in a single job: count +
    * two (approx) count-distincts fused into one aggregate instead of the
    * reference's three separate actions. */
  def summary(df: DataFrame, exact: Boolean = false): DataFrame = {
    val nodes =
      if (exact) count_distinct(col("s")) else approx_count_distinct(col("s"))
    val predicates =
      if (exact) count_distinct(col("p")) else approx_count_distinct(col("p"))
    df.agg(
      count(lit(1)).as("triples"),
      nodes.as("nodes"),
      predicates.as("predicates"))
  }

  /** Wide per-language stats: one row per lang, one column per dataset
    * (full-outer-join fold on `lang`, reference :154-158). All inputs are
    * tiny aggregates (≤ #languages rows) — the joins broadcast. */
  def perLanguage(spark: SparkSession, datasets: Seq[(String, DataFrame)]): DataFrame = {
    import spark.implicits._
    datasets
      .map { case (label, df) =>
        df.groupBy(col("lang")).count().withColumnRenamed("count", label)
      }
      .foldLeft(Seq.empty[String].toDF("lang")) { case (acc, df) =>
        acc.join(df, Seq("lang"), "full_outer")
      }
  }

  /** The `en-*` rollup view: all non-en-prefixed languages plus one summed
    * `en-*` row (reference :163-172). */
  def withEnRollup(langStats: DataFrame): DataFrame = {
    // both union branches consume the (N-aggregation, N-join) input plan —
    // cache it like the reference (:158) so it computes once
    val cached = langStats.cache()
    cached
      .where(!col("lang").startsWith("en-"))
      .union(
        cached
          .where(col("lang").startsWith("en-"))
          .withColumn("lang", lit("en-*"))
          .groupBy(col("lang"))
          .sum())
      .orderBy(col("lang"))
  }
}
