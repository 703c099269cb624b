package graft.ops.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RedactPiiSpec extends SparkSpec {

  test("redactPii replaces each PII class with its typed placeholder") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "mail me at jo.doe+x@site.org today"),
      (2L, "server 192.168.0.1 and backup 10.0.0.2"),
      (3L, "call +1 555 0100 42 now"),
      (4L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = TextStats.redactPii(docs, col("text"), col("doc_id"))
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, 1L, "mail me at <EMAIL> today"),
      (2L, 2L, "server <IP> and backup <IP>"),
      (3L, 1L, "call <PHONE> now"),
      (4L, 0L, "nothing sensitive here")))
  }
}

class SnapshotsSpec extends SparkSpec {

  test("diffByContent classifies added/removed/changed/same") {
    val spark2 = spark
    import spark2.implicits._
    val oldSnap = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "beta"), (3L, "gamma EDITED"), (4L, "delta")).toDF("doc_id", "text")
    val out = Snapshots.diffByContent(oldSnap, newSnap, "doc_id", col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, "removed"), (2L, "same"), (3L, "changed"), (4L, "added")))
  }

  test("diff hashes below the join: no text column crosses the Exchange") {
    val spark2 = spark
    import spark2.implicits._
    // parquet-backed fixture: a LocalRelation would constant-fold the md5
    val dir = java.nio.file.Files.createTempDirectory("graft-snap").toString
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val snap = spark.read.parquet(dir)
    val plan = Snapshots.diffByContent(snap, snap, "doc_id", col("text"))
      .queryExecution.optimizedPlan.toString
    // md5 is applied in the projections under the join, not above it
    assert(plan.indexOf("md5") > plan.indexOf("Join"), plan)
  }
}
