package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ManifestSpec extends SparkSpec {

  test("manifest covers every data file with exact row counts and FS sizes") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest").toString
    (1L to 100L).map(i => (i, s"row $i", if (i % 2 == 0) "a" else "b"))
      .toDF("id", "payload", "part")
      .write.partitionBy("part").mode("overwrite").parquet(dir)
    val m = Manifest.forParquetDir(spark, dir)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    // one manifest row per data file, all partitions covered
    val files = Manifest.listDataFiles(spark, dir)
    assert(m.length === files.length)
    assert(m.exists(_._1.startsWith("part=a/")) && m.exists(_._1.startsWith("part=b/")))
    // row counts sum to the input; sizes match the FS byte-for-byte
    assert(m.map(_._3).sum === 100L)
    val sizeByPath = files.toMap
    m.foreach { case (rel, bytes, _, _) =>
      val abs = sizeByPath.keys.find(_.endsWith("/" + rel)).get
      assert(bytes === sizeByPath(abs) && bytes > 0)
    }
  }

  test("content_sum is row-order-insensitive but catches any changed row") {
    val spark2 = spark
    import spark2.implicits._
    val d1 = java.nio.file.Files.createTempDirectory("graft-man-a").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft-man-b").toString
    val d3 = java.nio.file.Files.createTempDirectory("graft-man-c").toString
    val rows = (1L to 50L).map(i => (i, s"v$i"))
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(d1)
    rows.reverse.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(d2)
    rows.map { case (i, v) => (i, if (i == 7) "TAMPERED" else v) }
      .toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(d3)
    def sum(dir: String): Long =
      Manifest.forParquetDir(spark, dir).agg(org.apache.spark.sql.functions.sum("content_sum"))
        .head().getLong(0)
    assert(sum(d1) === sum(d2)) // reordering leaves the checksum alone
    assert(sum(d1) !== sum(d3)) // one changed row flips it
  }

  test("writeForParquetDir lands _manifest.jsonl without breaking readers") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-man-w").toString
    (1L to 20L).map(i => (i, s"p$i")).toDF("id", "v")
      .write.mode("overwrite").parquet(dir)
    val m = Manifest.writeForParquetDir(spark, dir)
    assert(m.count() >= 1)
    // the manifest file exists and each line round-trips as JSON (read as
    // raw lines: the underscore prefix hides it from Spark's file readers,
    // which is exactly the point)
    val manifest = new java.io.File(s"$dir/_manifest.jsonl")
    assert(manifest.exists())
    val lines = java.nio.file.Files.readAllLines(manifest.toPath)
    val parsed = spark.read.json(spark.createDataset(lines.toArray.map(_.toString)))
    assert(parsed.count() === m.count())
    assert(parsed.columns.sorted === Array("bytes", "content_sum", "file", "n_rows"))
    // an underscore-prefixed file is invisible to the parquet reader
    assert(spark.read.parquet(dir).count() === 20L)
    m.unpersist()
  }
}
