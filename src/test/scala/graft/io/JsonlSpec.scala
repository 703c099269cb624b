package graft.io

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class JsonlSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("round-trip: write gzip'd partitioned JSONL, read back with explicit schema") {
    val spark2 = spark
    import spark2.implicits._
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val df = Seq(
      (1L, "hello", "en"), (2L, "hallo", "de"), (3L, "salut", "fr")
    ).toDF("doc_id", "text", "lang")
    Jsonl.write(df, s"$dir/out", partitionBy = Seq("lang"))
    val dirs = new java.io.File(s"$dir/out").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs === Array("lang=de", "lang=en", "lang=fr"))
    // gzip'd text parts, per the sink contract
    val parts = new java.io.File(s"$dir/out/lang=en").listFiles()
      .map(_.getName).filter(_.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.endsWith(".json.gz")), parts.toSeq)
    val back = Jsonl.read(spark, s"$dir/out", schema)
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(back === Array((1L, "hello", "en"), (2L, "hallo", "de"), (3L, "salut", "fr")))
  }

  test("corrupt lines: audit column when asked, clean drop otherwise") {
    val spark2 = spark
    import spark2.implicits._
    val dir = Files.createTempDirectory("graft-jsonl").toString
    // one good line, one truncated JSON, one junk line
    val lines = Seq(
      """{"doc_id": 1, "text": "ok", "lang": "en"}""",
      """{"doc_id": 2, "text": "trunca""",
      """not json at all""")
    Files.write(java.nio.file.Paths.get(dir, "data.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    // audit path: bad lines keep their raw text in _corrupt
    val audit = Jsonl.read(spark, s"$dir/data.jsonl", schema, keepCorrupt = true)
    assert(audit.columns.toSeq === Seq("doc_id", "text", "lang", "_corrupt"))
    // Spark disallows referencing ONLY the corrupt column in a query
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize full rows instead
    val rows = audit.collect()
    assert(rows.count(r => !r.isNullAt(r.fieldIndex("_corrupt"))) === 2)
    // clean path: schema-only columns, junk rows dropped by the id filter
    val clean = Jsonl.readClean(spark, s"$dir/data.jsonl", schema, idField = "doc_id")
    assert(clean.columns.toSeq === Seq("doc_id", "text", "lang"))
    assert(clean.as[(Long, String, String)].collect() === Array((1L, "ok", "en")))
    // and the id filter reaches the scan as a pushed IsNotNull
    val plan = clean.queryExecution.executedPlan.toString
    assert(plan.contains("isnotnull(doc_id"), plan)
  }
}
