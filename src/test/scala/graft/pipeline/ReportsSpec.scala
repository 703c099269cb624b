package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReportsSpec extends SparkSpec {

  test("sourceReport rolls up dup, contamination, and alpha rates per source") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "w x y z a b c d", "s1"), // 8 tokens, 15 chars, 8 alpha
      (2L, "w x y z a b c d", "s1"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog", "s1"), // contaminated
      (4L, "mm nn oo pp", "s2") // clean, 4 tokens, 11 chars, 8 alpha
    ).toDF("doc_id", "text", "source")
    val bench = Seq("the quick brown fox jumps over the lazy dog").toDF("text")
    val out = Reports.sourceReport(docs, col("text"), "doc_id", "source",
        bench, col("text"), n = 8)
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      // s1: 3 docs, 25 tokens, 1 dup (3333 bp), 1 contaminated (3333 bp),
      // alpha = (8+8+35)*10000 div (15+15+43) = 510000 div 73 = 6986
      ("s1", 3L, 25L, 3333L, 3333L, 6986L),
      // s2: 1 doc, 4 tokens, clean, alpha = 80000 div 11 = 7272
      ("s2", 1L, 4L, 0L, 0L, 7272L)))
    // layout independence of the dup election and rollup
    val re = Reports.sourceReport(docs.repartition(5), col("text"), "doc_id",
        "source", bench, col("text"), n = 8)
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(re.toSeq === out.toSeq)
  }
}
