package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  test("topKPerGroup keeps k rows per group with deterministic tie-break") {
    val spark2 = spark
    import spark2.implicits._
    // p1 and p2 tie on count in lang a — p1 must win rank 1 (value asc)
    val df = Seq(
      ("a", "p1"), ("a", "p1"), ("a", "p2"), ("a", "p2"), ("a", "p3"),
      ("b", "p9")).toDF("lang", "p")
    val top = TopK.topKPerGroup(df, Seq(col("lang")), Seq(col("p")), k = 2)
      .select("lang", "p", "k").as[(String, String, Int)].collect().sorted
    assert(top === Array(("a", "p1", 1), ("a", "p2", 2), ("b", "p9", 1)))
  }

  test("filterToTopK matches en-xx rows against the en ranking") {
    val spark2 = spark
    import spark2.implicits._
    val triples = Seq(
      ("<s1>", "<p>", "<o>", "en"),
      ("<s2>", "<p>", "<o>", "en-de"), // should match en's top-k
      ("<s3>", "<q>", "<o>", "en-de") // q not in en's top-k
    ).toDF("s", "p", "o", "lang")
    val topK = Seq(("<p>", "en")).toDF("p", "lang")
    val out = TopK.filterToTopK(triples, topK).select("s").as[String].collect().sorted
    assert(out === Array("<s1>", "<s2>"))
    assert(!out.contains("node-lang"))
  }

  test("argMaxPerGroup picks the most frequent value, ties to smallest") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("p1", "t1"), ("p1", "t1"), ("p1", "t2"), ("p2", "ta"), ("p2", "tb"))
      .toDF("p", "t")
    val out = TopK.argMaxPerGroup(df, col("p"), col("t"))
      .as[(String, String)].collect().sorted
    assert(out === Array(("p1", "t1"), ("p2", "ta")))
  }
}
