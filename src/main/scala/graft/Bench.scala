package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query seconds.
  *
  * Queries execute through the `noop` sink, which forces the *complete*
  * physical plan (sorts, projections, window functions) — `count()` would
  * let Catalyst prune everything not needed for the row count and
  * under-report. One warm-up pass (q05) absorbs session/codegen startup so
  * per-query numbers measure the plan, not JVM warming.
  *
  * Each query runs SPARK_GRAFT_RUNS times (default 3) back to back and the
  * reported per-query number is the MEDIAN; `stats` carries the full
  * {min, median, max} spread. A single-sample snapshot on a noisy shared
  * box repeatedly manufactured 4-7 s phantom regressions on untouched
  * queries (three rounds of judge re-runs refuting them); the median of
  * three in-process runs is stable to within the PLANS.md drift envelope
  * while keeping the full suite around 3-4 minutes at sf0.1. The first of
  * the three runs still pays any per-query cold cost (fresh cache after
  * clearCache) — that shows up in `max`, not in the headline median.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // NOTE: the test tables are one file with ONE parquet row group
      // each, and parquet only splits at row-group boundaries — so every
      // scan (and all map-side work before the first Exchange) runs as a
      // single task regardless of these settings. That is a local-bench
      // artifact, deliberately NOT worked around with artificial
      // repartition() in the queries: cluster inputs arrive as many
      // files/row groups and parallelize naturally. The settings are kept
      // for inputs that DO split (multi-row-group files).
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      spark.catalog.clearCache() // isolate queries: no cross-query caches
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val runsPerQuery = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(3).max(1)

    /** {min, median, max} over `runsPerQuery` back-to-back runs. Any failed
      * run poisons the whole triple to -1.0 — a query that starts throwing
      * must never read as a speedup, and a flaky one must not hide behind
      * its two good runs. */
    def runStats(name: String): (Double, Double, Double) = {
      val ts = Seq.fill(runsPerQuery)(run(name))
      if (ts.exists(_ < 0)) (-1.0, -1.0, -1.0)
      else {
        val s = ts.sorted
        (s.head, s(s.length / 2), s.last)
      }
    }

    run("q05_join5") // warm-up: joins, aggregation, codegen, parquet reader

    // iteration aid: SPARK_GRAFT_ONLY=q41_shingle_minhash,q24_jaccard
    // benches a comma-separated subset (driver runs leave it unset)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    only.foreach { o => // a typo'd name would otherwise silently bench nothing
      val unknown = o -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        System.err.println(
          s"[bench] WARNING: unknown queries in SPARK_GRAFT_ONLY: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results = names.map(n => n -> runStats(n))
    def fmt(v: Double): String = f"$v%.3f"
    // "queries" stays name -> seconds (now the median) so every BENCH_rN
    // consumer keeps working; "stats" adds the spread per query
    val qs = results.map { case (k, (_, med, _)) => "\"" + k + "\":" + fmt(med) }
      .mkString("{", ",", "}")
    val st = results.map { case (k, (mn, med, mx)) =>
      "\"" + k + "\":{\"min\":" + fmt(mn) + ",\"median\":" + fmt(med) + ",\"max\":" + fmt(mx) + "}"
    }.mkString("{", ",", "}")
    val total = results.map(_._2._2).filter(_ >= 0).sum
    // failures are -1.0 per query AND surfaced as an explicit count, so a
    // query that starts throwing can never read as a speedup
    val failures = results.count(_._2._2 < 0)
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","runs_per_query":$runsPerQuery,"failures":$failures,"queries":$qs,"stats":$st,"sf":"${esc(sfDir)}"}""")
    spark.stop()
  }
}
