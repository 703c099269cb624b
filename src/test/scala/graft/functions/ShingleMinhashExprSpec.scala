package graft.functions

import graft.SparkSpec
import graft.ops.ext.Dedup
import org.apache.spark.sql.functions._

class ShingleMinhashExprSpec extends SparkSpec {

  // edge cases: empty, shorter-than-n, exactly-n, multi-byte UTF-8 (2-, 3-
  // and 4-byte code points shift the byte offsets of every later shingle),
  // repeated content, whitespace
  private val inputs: Seq[String] = Seq(
    "",
    "abcd",
    "abcde",
    "abcdef",
    "hello world, a perfectly ordinary document",
    "héllo wörld ünïcode",
    "日本語のテキストです",
    "emoji 😀 inside 🎉 text",
    "aaaaaaaaaaaaaaaaaaaa",
    "  leading and trailing  ",
    null)

  /** The composable interpreted reference form (round-1 q41 shape). */
  private def interpretedForm = {
    val mask = when(length(col("text")) >= 5, lit(""))
      .otherwise(lit(null).cast("string"))
    Seq(
      concat(Dedup.minhashPair(Dedup.shingles(col("text"), 5)).getField("a"), mask).as("a"),
      concat(Dedup.minhashPair(Dedup.shingles(col("text"), 5)).getField("b"), mask).as("b"))
  }

  test("matches the interpreted minhashPair∘shingles composition, nulls included") {
    val spark2 = spark
    import spark2.implicits._
    val df = inputs.toDF("text")
    val got = df
      .select(ShingleMinhashExpr.shingle_minhash(col("text"), 5).as("m"))
      .select(col("m.a"), col("m.b")).as[(Option[String], Option[String])].collect()
    val want = df.select(interpretedForm: _*)
      .as[(Option[String], Option[String])].collect()
    inputs.zip(got).zip(want).foreach { case ((in, g), w) =>
      assert(g === w, s"for input <$in>")
    }
  }

  test("matches on real documents at sf0.001") {
    val spark2 = spark
    import spark2.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = docs
      .select(col("doc_id"), ShingleMinhashExpr.shingle_minhash(col("text"), 5).as("m"))
      .select(col("doc_id"), col("m.a"), col("m.b"))
      .orderBy(col("doc_id"))
      .as[(Long, Option[String], Option[String])].collect()
    val want = docs.select((col("doc_id") +: interpretedForm): _*)
      .orderBy(col("doc_id"))
      .as[(Long, Option[String], Option[String])].collect()
    assert(got.length > 0)
    assert(got === want)
  }

  test("registered as a SQL function via SparkSessionExtensions") {
    val row = spark.sql(
      "SELECT graft_shingle_minhash('abcdef', 5) AS m")
      .selectExpr("m.a", "m.b").head()
    // md5(abcde)=ab56b4d92b40713acc5af89985d4b786
    // md5(bcdef)=0c4337fdf6d3c5f526f577dd63b87da3
    assert(row.getString(0) === "0c4337fdf6d3c5f5") // min of the two front halves
    assert(row.getString(1) === "26f577dd63b87da3") // min of the two back halves
  }

  test("rejects a non-foldable shingle size in SQL") {
    // a foldable call like length('xy') is fine (constant-folds to a
    // literal); rand() can never fold and must be rejected at build time
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingle_minhash('abc', CAST(rand() * 5 AS INT))").collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("integer literal"), messages(e))
  }

  test("stays inside whole-stage codegen") {
    val df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .select(ShingleMinhashExpr.shingle_minhash(col("n_name"), 3).as("m"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_shingle_minhash"), plan)
    assert(df.count() === 25)
  }
}
