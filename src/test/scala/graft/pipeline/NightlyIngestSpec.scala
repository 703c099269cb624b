package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composed consumer of the corpus-sig-table fast path (round-20
  * verdict item 2): nightly batches against standing bucketed tables,
  * with the accepted-survivor refresh between nights. */
class NightlyIngestSpec extends SparkSpec {

  private def drop(prefix: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_hashes")
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_bands")
  }

  test("runBatch(refresh=false) matches the per-call curateIncremental exactly") {
    val spark2 = spark
    import spark2.implicits._
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta", "good"),
      (101L, "iota kappa lambda mu nu xi omicron pi", "good")
    ).toDF("doc_id", "text", "source")
    val batch = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "good"),
      (2L, "theta eta zeta epsilon delta gamma beta alpha", "good"),
      (3L, "fresh words one two three four five six", "good"),
      (4L, "six five four three two one words fresh", "good"),
      (5L, "prefix the quick brown fox jumps over the lazy dog suffix", "good"),
      (6L, "totally novel content nothing shared anywhere at all", "good")
    ).toDF("doc_id", "text", "source")
    val bench = Seq("the quick brown fox jumps over the lazy dog").toDF("text")
    val expected = Curation.curateIncremental(batch, corpus, col("text"),
        "doc_id", "source", bench, minDocs = 1, minAlphaBp = 5000,
        numHashes = 2, maxBucketSize = 100, n = 8)
      .select(col("doc_id")).as[Long].collect().sorted
    val prefix = "nightly_spec_parity"
    try {
      val tables = NightlyIngest.buildTables(
        corpus, col("text"), prefix, numHashes = 2, buckets = 4)
      val out = NightlyIngest.runBatch(batch, tables, col("text"), "doc_id",
          "source", bench, minDocs = 1, minAlphaBp = 5000,
          maxBucketSize = 100, n = 8, refreshTables = false)
        .select(col("doc_id")).as[Long].collect().sorted
      assert(out === expected)
      assert(out === Array(3L, 6L))
    } finally drop(prefix)
  }

  test("refresh folds accepted survivors in: night 2 dedups against night 1's admissions") {
    val spark2 = spark
    import spark2.implicits._
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta", "good")
    ).toDF("doc_id", "text", "source")
    val batch1 = Seq(
      (1L, "fresh words one two three four five six", "good"),
      (2L, "totally novel content nothing shared anywhere at all", "good")
    ).toDF("doc_id", "text", "source")
    val batch2 = Seq(
      (10L, "fresh words one two three four five six", "good"), // exact copy of night-1 survivor 1
      (11L, "six five four three two one words fresh", "good"), // near-dup of night-1 survivor 1
      (12L, "completely different brand new sentence appears tonight", "good")
    ).toDF("doc_id", "text", "source")
    val bench = Seq("the quick brown fox jumps over the lazy dog").toDF("text")

    // WITH refresh: 10 falls to the exact-hash anti join, 11 to the
    // band-key anti join — both against night 1's appended signatures
    val p1 = "nightly_spec_refresh"
    try {
      val out = NightlyIngest.run(corpus, Seq(batch1, batch2), col("text"),
        "doc_id", "source", bench, p1, minDocs = 1, minAlphaBp = 5000,
        numHashes = 2, maxBucketSize = 100, n = 8, buckets = 4,
        refreshTables = true)
      assert(out.map(_.select(col("doc_id")).as[Long].collect().sorted.toSeq)
        === Seq(Seq(1L, 2L), Seq(12L)))
    } finally drop(p1)

    // WITHOUT refresh the corpus tables never learn night 1: 10 and 11
    // pass the corpus checks and only WITHIN-batch clustering dedups
    // them against each other (min-id 10 survives)
    val p2 = "nightly_spec_norefresh"
    try {
      val out = NightlyIngest.run(corpus, Seq(batch1, batch2), col("text"),
        "doc_id", "source", bench, p2, minDocs = 1, minAlphaBp = 5000,
        numHashes = 2, maxBucketSize = 100, n = 8, buckets = 4,
        refreshTables = false)
      assert(out.map(_.select(col("doc_id")).as[Long].collect().sorted.toSeq)
        === Seq(Seq(1L, 2L), Seq(10L, 12L)))
    } finally drop(p2)
  }
}
