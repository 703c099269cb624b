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
    val results = names.map(n => n -> run(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // failures are -1.0 per query AND surfaced as an explicit count, so a
    // query that starts throwing can never read as a speedup
    val failures = results.count(_._2 < 0)
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }
    println(s"""{"metric":"total","value":$total,"unit":"sec","failures":$failures,"queries":$qs,"sf":"${esc(sfDir)}"}""")
    spark.stop()
  }
}
