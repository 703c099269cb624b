package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntColsSpec extends SparkSpec {

  test("floorDiv equals Math.floorDiv for any numerator sign (divisor > 0)") {
    val spark2 = spark
    import spark2.implicits._
    // divisor is positive BY CONTRACT (see the scaladoc: pmod ceils on a
    // negative divisor; every fixed-point site divides by a count/width)
    val cases = Seq(
      (7L, 2L), (-7L, 2L), (-1L, 3L), (-999999L, 1000000L),
      (0L, 5L), (1000000L, 3L), (-1000000L, 3L), (Long.MinValue + 1, 7L))
    val out = cases.toDF("a", "b").repartition(2)
      .select(col("a"), col("b"), IntCols.floorDiv(col("a"), col("b")).as("q"))
      .as[(Long, Long, Long)].collect()
    for ((a, b, q) <- out)
      assert(q === Math.floorDiv(a, b), s"floorDiv($a, $b)")
  }

  test("floorDiv stays exact past 2^53 — where the double form rounds") {
    val spark2 = spark
    import spark2.implicits._
    // 2^53 + 1 is not representable as a double: the replaced
    // ((a - pmod(a, b)) / b).cast("long") form returns 2^53 here
    val big = (1L << 53) + 1L
    val out = Seq((big, 1L), (big, 3L), (-big, 3L))
      .toDF("a", "b").repartition(2)
      .select(IntCols.floorDiv(col("a"), col("b")))
      .as[Long].collect().toSet
    assert(out === Set(big, Math.floorDiv(big, 3L), Math.floorDiv(-big, 3L)))
    // and the double form is demonstrably wrong on the same input — the
    // regression this spec exists to prevent re-introducing
    val doubled = Seq((big, 1L)).toDF("a", "b").repartition(2)
      .select(((col("a") - pmod(col("a"), col("b"))) / col("b")).cast("long"))
      .as[Long].collect().head
    assert(doubled === (1L << 53), "the double path should round (else this spec is stale)")
  }
}
