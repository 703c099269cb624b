package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins: key salting.
  *
  * AQE's skew-join handling (on by default) splits oversized sort-merge
  * partitions at runtime and is the first line of defense. Salting is the
  * explicit fallback for the cases AQE can't fix — e.g. a single hot key
  * that must co-locate for a non-SMJ plan, or deterministic layout needs.
  *
  * Shape: the large side gets a deterministic pseudo-random salt in
  * [0, factor); the small side is exploded `factor`× with every salt value;
  * the join key becomes (key, salt), spreading each hot key over `factor`
  * reducers. Cost: small side replicated `factor`× — choose factor ~ the
  * observed skew ratio, not larger.
  *
  * The salt is hash-derived (not `rand()`): deterministic retries, no
  * non-determinism constraints on the optimizer.
  */
object Skew {

  /** Deterministic salt in [0, factor) derived from the whole row of
    * unique columns `entropyCols`. */
  def salt(factor: Int, entropyCols: Seq[Column]): Column =
    pmod(hash(entropyCols: _*), lit(factor))

  /** Inner equi-join `large ⋈ small` on `key`, salted `factor` ways.
    * Both inputs must expose the join key under the same name. */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      factor: Int,
      entropyCols: Seq[String]): DataFrame = {
    val saltedLarge = large.withColumn("__salt", salt(factor, entropyCols.map(col)))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedLarge
      .join(explodedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }
}
