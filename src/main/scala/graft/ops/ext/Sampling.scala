package graft.ops.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `rand()`-based sampling is non-reproducible across runs, engines, and
  * partition layouts; hash sampling keys each row's fate to its IDENTITY:
  * the same row is in or out of the sample no matter how the data is
  * partitioned, re-run, or which engine evaluates it (md5 is the same
  * everywhere — the property every other graft kernel already leans on).
  * This also gives consistent sampling ACROSS tables: sampling two tables
  * by the same join key yields matching rows, which `rand()` cannot do.
  *
  * Scale shape: a per-row predicate over a scan — map-side only, no
  * shuffle, pushdown-friendly for everything else in the plan.
  */
object Sampling {

  /** Uniform hash of a key into [0, 1): the first 8 md5 hex chars as an
    * unsigned 32-bit integer over 2^32. */
  def hashFraction(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0)

  /** Keep rows whose key hashes under `rate`. */
  def sampleByHash(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.where(hashFraction(key) < rate)

  /** Stratified sample: per-stratum rates (e.g. per language/source),
    * with `defaultRate` for strata not in the map — the downsample-the-
    * overrepresented-language step of corpus curation. */
  def stratifiedSample(
      df: DataFrame,
      key: Column,
      stratum: Column,
      rates: Map[String, Double],
      defaultRate: Double): DataFrame = {
    val rateCol = coalesce(element_at(typedLit(rates), stratum), lit(defaultRate))
    df.where(hashFraction(key) < rateCol)
  }
}
