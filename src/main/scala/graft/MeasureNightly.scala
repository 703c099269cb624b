package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement main (round 20, verdict item 2): the COMPOSED
  * nightly path (`NightlyIngest.runBatch` over persisted corpus sig
  * tables) vs the per-call `curateIncremental` shape, at the round-19
  * harness scale (sf0.1 documents replicated with disjoint ids and
  * per-replica text perturbation; batch = the %11 base slice; q139's
  * numHashes = 8). Min-of-3 with per-point steal; output parity
  * ((rows, id-sum) identical) asserted per run. Deleted after the
  * numbers land in PLANS.md (the MeasureCurate protocol). */
object MeasureNightly {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("GRAFT_REPS", "128").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "96g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    // disjoint ids + per-replica perturbation (an unperturbed replica
    // would collapse in the corpus distinct steps)
    val corpus = docs0.crossJoin(spark.range(reps.toLong).toDF("rep"))
      .select((col("doc_id") * reps + col("rep")).as("doc_id"),
        col("lang"), col("source"),
        concat(col("text"), lit(" rep"), col("rep")).as("text"))
    val batch = docs0.where(col("doc_id") % 11 === 0)
    val bench = docs0.where(col("doc_id") % 37 === 0)
    println(s"corpus=${corpus.count()} docs batch=${batch.count()} bench=${bench.count()}")

    def curateRun(f: => org.apache.spark.sql.DataFrame): (Double, Double, Long, Long) = {
      System.gc()
      val m = new graft.core.Steal.Meter
      val t0 = System.nanoTime()
      val out = f
      val r = out.agg(count(lit(1)), coalesce(sum(col("doc_id")), lit(0L))).head()
      val sec = (System.nanoTime() - t0) / 1e9
      val st = m.pct()
      graft.core.Checkpoints.release(out)
      (sec, st, r.getLong(0), r.getLong(1))
    }

    def report(label: String, runs: Seq[(Double, Double, Long, Long)]): Unit = {
      require(runs.map(r => (r._3, r._4)).distinct.size == 1,
        s"$label: output parity broke across runs: $runs")
      val best = runs.minBy(_._1)
      println(f"$label%-14s min=${best._1}%6.2f s (steal@min=${best._2}%4.1f%%) " +
        runs.map(r => f"${r._1}%.2f@${r._2}%.1f%%").mkString("[", " ", "]") +
        s" rows=${runs.head._3} idsum=${runs.head._4}")
    }

    // per-call shape: corpus legs derived in-plan every call
    val perCall = (1 to 3).map { _ =>
      curateRun(graft.pipeline.Curation.curateIncremental(
        batch, corpus, col("text"), "doc_id", "source", bench,
        minDocs = 2, minAlphaBp = 8100, numHashes = 8,
        maxBucketSize = 1000, n = 8))
    }
    report("per-call", perCall)

    // one-time table build (the amortized cost)
    val builds = (1 to 3).map { _ =>
      System.gc()
      val m = new graft.core.Steal.Meter
      val t0 = System.nanoTime()
      val t = graft.pipeline.NightlyIngest.buildTables(
        corpus, col("text"), "measure_nightly", numHashes = 8, buckets = 32)
      ((System.nanoTime() - t0) / 1e9, m.pct(), 0L, 0L)
    }
    println(f"build-tables   min=${builds.map(_._1).min}%6.2f s " +
      builds.map(r => f"${r._1}%.2f@${r._2}%.1f%%").mkString("[", " ", "]"))

    val tables = graft.pipeline.Curation.CorpusSigTables(
      "measure_nightly_hashes", "measure_nightly_bands", 8, 32)

    // composed nightly path, no refresh (the steady-state nightly cost)
    val nightly = (1 to 3).map { _ =>
      curateRun(graft.pipeline.NightlyIngest.runBatch(
        batch, tables, col("text"), "doc_id", "source", bench,
        minDocs = 2, minAlphaBp = 8100, maxBucketSize = 1000, n = 8,
        refreshTables = false))
    }
    report("nightly-table", nightly)
    require(nightly.head._3 == perCall.head._3 && nightly.head._4 == perCall.head._4,
      s"table-backed vs per-call parity broke: ${nightly.head} vs ${perCall.head}")

    // one refresh-inclusive night (append cost rides the same call)
    val withRefresh = (1 to 3).map { _ =>
      curateRun(graft.pipeline.NightlyIngest.runBatch(
        batch, tables, col("text"), "doc_id", "source", bench,
        minDocs = 2, minAlphaBp = 8100, maxBucketSize = 1000, n = 8,
        refreshTables = true))
    }
    // NOTE first refresh mutates the tables: later runs dedup against
    // the first run's admissions, so rows shrink — report, no parity req
    val bestR = withRefresh.minBy(_._1)
    println(f"with-refresh   min=${bestR._1}%6.2f s " +
      withRefresh.map(r => f"${r._1}%.2f@${r._2}%.1f%% rows=${r._3}").mkString("[", " ", "]"))

    spark.sql("DROP TABLE IF EXISTS measure_nightly_hashes")
    spark.sql("DROP TABLE IF EXISTS measure_nightly_bands")
    spark.stop()
  }
}
