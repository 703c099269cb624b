package graft

import graft.pipeline.{ParquetToRdf, RdfConfig, TtlToParquet}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end pipeline benchmark: the metric BASELINE.md actually reports.
  *
  * The reference publishes stage wall-clock (README.md:338-343): ttl ->
  * parquet over 374 GB in 35 min on 32 cores (~5.70 MB/s/core) and parquet
  * -> RDF over 42 GB in 30 min on 32 cores (~0.75 MB/s/core of parquet
  * input). The per-query `graft.Bench` suite never measures that shape, so
  * this main does, at a locally-feasible scale:
  *
  *  1. GENERATE a DBpedia-release-layout ttl tree
  *     (`base/<release>/core/<lang>/<name>_<lang>.ttl`) of
  *     `SPARK_GRAFT_TTL_MB` (default 1024) megabytes, derived from the
  *     lineitem table of `SPARK_GRAFT_SF_DIR` — realistic triple shapes per
  *     dataset (typed infobox literals with a ~10% minority-type noise
  *     floor mirroring the reference's ~90% disambiguation retention,
  *     SPARK.md:224; language skew en > de > fr > es; cross-language
  *     sameAs targets including out-of-corpus languages that the pipeline
  *     must drop).
  *  2. TIME stage 1: [[TtlToParquet.runDiscovered]] per dataset (language
  *     discovery + parse + range-partitioned parquet write + count-back).
  *  3. TIME stage 2: [[ParquetToRdf.run]] at the heaviest config
  *     (top-100 infobox, externalised uris, types file) — the full
  *     cleanup/disambiguation/schema/8-sink program.
  *  4. SCAN PROOF: the sf test tables are single-row-group files, so every
  *     kernel scan in `graft.Bench` runs as ONE task (PLANS.md "single row
  *     group" caveat). Here the documents table is replicated ~64x and
  *     written once as a single row group and once as 32 files; the same
  *     codegen minhash kernel is timed over both. The multi-file speedup
  *     is the measured evidence that kernel scans parallelize with cores
  *     once the input splits — the claim the caveat makes without proof.
  *
  *     The proof BRACKETS the whole run (round-17 protocol fix): one run
  *     FIRST — before even the ttl generation, whose 1+ GB write churns
  *     the page cache exactly like the stages do (measured: a pre-proof
  *     placed after generation read 4.5× in a session whose retry read
  *     9.8×/16.2×) — and one AFTER stage 2, certifying on the BETTER of
  *     the two speedups. Round 16 measured the flaw in the old
  *     proof-after-only ordering: all four 2× proofs collapsed (4.8–16.7×)
  *     in sessions whose stage times sat ON the historical clean curve —
  *     the stages' own shuffle churn leaves the page cache hostile to a
  *     proof sampled seconds later, so a healthy box read as contended.
  *     The first-thing proof samples the JVM-warm, churn-free box; the
  *     post-stage proof is kept because a box that DEGRADES mid-session
  *     shows up only there. External contention only
  *     ever lowers a speedup, so max-of-two never certifies a dirty
  *     session that neither single probe would.
  *
  *     Protocol v4 adds the DIRECT instrument the proof only infers:
  *     per-region hypervisor STEAL (see [[StealMeter]]). Each stage and
  *     each proof reports the percentage of demanded cpu the host denied
  *     during that exact region — a stage time adjudicates itself (steal
  *     under ~2% = the time is the box's own) instead of borrowing a
  *     proof sampled minutes away. The scan proof remains the
  *     PARALLELISM evidence (kernel scans split across cores once the
  *     input does); steal is the CONTENTION evidence. The two questions
  *     three rounds of wandering-box sessions conflated are now measured
  *     separately, each during the region it certifies.
  *
  * Prints ONE JSON line. Generation is NOT part of any timed stage.
  */
object PipelineBench {

  private val Rdfs = "<http://www.w3.org/2000/01/rdf-schema#label>"
  private val SameAs = "<http://www.w3.org/2002/07/owl#sameAs>"
  private val DcSubject = "<http://purl.org/dc/terms/subject>"
  private val WikiLink = "<http://dbpedia.org/ontology/wikiPageWikiLink>"
  private val PrefLabel = "<http://www.w3.org/2004/02/skos/core#prefLabel>"
  private val Broader = "<http://www.w3.org/2004/02/skos/core#broader>"
  private val GeoPoint = "<http://www.georss.org/georss/point>"
  private val XsdInt = "^^<http://www.w3.org/2001/XMLSchema#integer>"

  /** (language, relative volume share) — en-heavy, like the corpus. */
  private val langs = Seq("en" -> 8, "de" -> 4, "fr" -> 2, "es" -> 2)

  /** (dataset, share of total bytes) — page_links dominates, as in the
    * reference corpus (README.md:326 triple counts per dataset). */
  private val datasetShares = Seq(
    "page_links" -> 0.35, "infobox_properties" -> 0.25, "labels" -> 0.15,
    "article_categories" -> 0.10, "interlanguage_links" -> 0.08,
    "geo_coordinates" -> 0.04, "skos_categories" -> 0.03)

  private def node(lang: String, id: org.apache.spark.sql.Column) =
    concat(lit(s"<http://$lang.dbpedia.org/resource/R"), id, lit(">"))

  private def cat(lang: String, id: org.apache.spark.sql.Column) =
    concat(lit(s"<http://$lang.dbpedia.org/resource/Category:C"), id, lit(">"))

  /** One dataset/language slice of ttl lines (`value` column, " ."-
    * terminated). `base` carries (sid BIGINT dense-ish subject id, rep
    * replica index, partkey, suppkey, qty INT, words STRING). */
  private def ttlLines(name: String, lang: String, base: DataFrame): DataFrame = {
    val sid = col("sid")
    val s = node(lang, sid)
    val line = name match {
      case "labels" =>
        // unique subject per row: labels are one-per-resource
        concat(node(lang, concat(sid, lit("x"), col("rep"))),
          lit(s" $Rdfs "), lit("\""), col("words"), lit("\"@" + lang))
      case "page_links" =>
        concat(s, lit(s" $WikiLink "), node(lang, col("partkey")))
      case "infobox_properties" =>
        val pred = pmod(col("partkey"), lit(150))
        // dominant object type per predicate + ~10% minority noise: the
        // disambiguation stage keeps ~90%, like the reference corpus
        val t = pmod(pred + when(pmod(sid + col("rep"), lit(10)) === 0, 1).otherwise(0), lit(3))
        val obj = when(t === 0, concat(lit("\""), col("qty"), lit("\"" + XsdInt)))
          .when(t === 1, concat(lit("\""), col("words"), lit("\"")))
          .otherwise(node(lang, col("suppkey")))
        concat(s, lit(s" <http://$lang.dbpedia.org/property/p"), pred, lit("> "), obj)
      case "interlanguage_links" =>
        // cycle targets over the corpus languages plus one absent from it
        // ("pt") — those rows must be dropped by the object-language filter
        val others = (langs.map(_._1) :+ "pt").filter(_ != lang)
        // when-chain over pmod(sid, n) — every branch index is covered
        val target = others.zipWithIndex.tail.foldLeft(
          when(pmod(sid, lit(others.size)) === 0, node(others.head, sid))) {
          case (acc, (l2, i)) => acc.when(pmod(sid, lit(others.size)) === i, node(l2, sid))
        }
        concat(s, lit(s" $SameAs "), target)
      case "article_categories" =>
        concat(s, lit(s" $DcSubject "), cat(lang, pmod(col("partkey"), lit(1000))))
      case "skos_categories" =>
        val c = cat(lang, pmod(col("partkey"), lit(1000)))
        when(pmod(sid, lit(2)) === 0,
          concat(c, lit(s" $PrefLabel "), lit("\"C"), pmod(col("partkey"), lit(1000)), lit("\"@" + lang)))
          .otherwise(concat(c, lit(s" $Broader "), cat(lang, pmod(col("partkey"), lit(100)))))
      case "geo_coordinates" =>
        concat(s, lit(s" $GeoPoint "), lit("\""),
          pmod(col("partkey"), lit(90)), lit("."), pmod(col("suppkey"), lit(100)),
          lit(" "), pmod(col("suppkey"), lit(180)), lit("."), pmod(col("sid"), lit(100)),
          lit("\""))
    }
    base.select(concat(line, lit(" .")).as("value"))
  }

  /** Replicate the base relation to ~`rowsNeeded` rows: whole replicas via
    * explode plus a deterministic hash-modulo fraction filter — no
    * `limit()` (which would funnel the write through one partition). */
  private def replicate(base: DataFrame, baseRows: Long, rowsNeeded: Long): DataFrame = {
    val whole = (rowsNeeded / baseRows).toInt
    val fracPerMille = ((rowsNeeded % baseRows) * 1000 / baseRows).toInt
    base
      .withColumn("rep", explode(sequence(lit(0), lit(whole))))
      .where(col("rep") < whole ||
        pmod(hash(col("sid")), lit(1000)) < fracPerMille)
  }

  private def dirBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
  }

  val Release = "release-bench"

  /** Generate the release-layout ttl tree
    * (`ttlBase/<Release>/core/<lang>/<name>_<lang>.ttl`) of roughly
    * `ttlMb` megabytes from `sfDir`'s lineitem table. Returns actual
    * bytes written (measured from the filesystem). */
  def generate(spark: SparkSession, sfDir: String, ttlBase: String,
      ttlMb: Int, parallelism: Int): Long = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        (col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("sid"),
        col("l_partkey").cast("long").as("partkey"),
        col("l_suppkey").cast("long").as("suppkey"),
        col("l_quantity").cast("int").as("qty"),
        // label-ish text payload derived from row fields (the testdata
        // lineitem has no comment column); quote/backslash-free by
        // construction so it is safe inside a ttl string literal
        concat_ws(" ", lit("entity"), col("l_returnflag"), col("l_linestatus"),
          col("l_shipdate").cast("string"),
          substring(md5(concat(col("l_orderkey"), lit(":"), col("l_linenumber"))), 1, 12))
          .as("words"))
      .repartition(parallelism)
      .cache()
    val baseRows = li.count()
    val totalBytes = ttlMb.toLong * 1024 * 1024
    val avgLine = 115L // rough; actual bytes are measured from the FS below
    val langTotal = langs.map(_._2).sum
    for ((name, share) <- datasetShares; (lang, w) <- langs) {
      val sliceBytes = (totalBytes * share * w / langTotal).toLong
      val rows = math.max(1L, sliceBytes / avgLine)
      ttlLines(name, lang, replicate(li, baseRows, rows))
        .write.mode(SaveMode.Overwrite)
        .text(s"$ttlBase/$Release/core/$lang/${name}_$lang.ttl")
    }
    li.unpersist()
    dirBytes(spark, ttlBase)
  }

  /** Per-region hypervisor steal — [[graft.core.Steal.Meter]] (protocol
    * v4; motivation and formula documented there). Three sessions of
    * wandering-box measurements motivated it: healthy stages under
    * collapsed proofs (rounds 16–17) and, this session, the reverse. */
  private type StealMeter = graft.core.Steal.Meter

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ttlMb = sys.env.getOrElse("SPARK_GRAFT_TTL_MB", "1024").toInt
    val work = sys.env.getOrElse("SPARK_GRAFT_PIPE_DIR", "/tmp/graft_pipebench")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val release = Release
    val ttlBase = s"$work/ttl"
    val pq = s"$work/parquet"
    val out = s"$work/rdf"

    // ---- scan-proof fixtures + PRE proof: FIRST, before even generation
    // (the 1.1+ GB generation write churns the page cache the same way
    // the stages do — a pre-proof sampled after it reads the same
    // post-churn minute the old post-only proof did) ------------------
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("rep", explode(sequence(lit(0), lit(63))))
      .select((col("doc_id") * 64 + col("rep")).as("doc_id"), col("text"))
    docs.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$work/docs_1f")
    docs.repartition(32).write.mode(SaveMode.Overwrite).parquet(s"$work/docs_32f")
    // min-of-3 per scan — the suite's contention-immune estimator. The
    // multi-file scan is a ~1 s job: sampled once it is jitter-dominated
    // (2.4× spread measured across one session's probes, collapsing
    // proofs in runs whose stage times sat ON the clean curve); external
    // load only ever ADDS time, so the min is the honest clean estimate.
    def scanTime(path: String): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.read.parquet(path)
          .select(col("doc_id"),
            graft.functions.TokenMinhashExpr.token_minhash(col("text"), 8).as("mh"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    scanTime(s"$work/docs_32f") // warm the kernel + noop sink once
    val mPre = new StealMeter
    val scanPre1 = scanTime(s"$work/docs_1f")
    val scanPre32 = scanTime(s"$work/docs_32f")
    val stealPre = mPre.pct()
    println(f"[pipeline] scan proof PRE  ${scanPre1}%6.2f s / ${scanPre32}%5.2f s = ${scanPre1 / scanPre32}%5.1fx  steal $stealPre%4.1f%%")

    // ---- generation (untimed) -------------------------------------------
    val ttlBytes = generate(spark, sfDir, ttlBase, ttlMb, cpus.toInt)

    // ---- stage 1: ttl -> parquet (timed, includes discovery + count-back)
    val m1 = new StealMeter
    val t1 = System.nanoTime()
    val stage1 = datasetShares.map { case (name, _) =>
      val td = System.nanoTime()
      val count = TtlToParquet.runDiscovered(
        spark, ttlBase, release, "core", name, s"$pq/$name.parquet")
      (name, count, (System.nanoTime() - td) / 1e9)
    }
    val stage1Sec = (System.nanoTime() - t1) / 1e9
    val steal1 = m1.pct()
    // per-dataset input bytes listed OUTSIDE the timed region (a recursive
    // FS walk has no place inside the headline stage metric)
    stage1.foreach { case (name, count, sec) =>
      val mb = langs.map { case (lang, _) =>
        dirBytes(spark, s"$ttlBase/$release/core/$lang/${name}_$lang.ttl")
      }.sum / (1024.0 * 1024.0)
      println(f"[pipeline] stage1 $name%-22s $sec%6.1f s $mb%8.1f MB $count%,12d triples")
    }
    val triples = stage1.map { case (name, count, _) => name -> count }.toMap
    val parquetBytes = dirBytes(spark, pq)

    // ---- stage 2: parquet -> RDF + schema (timed, heaviest config) ------
    val m2 = new StealMeter
    val t2 = System.nanoTime()
    ParquetToRdf.run(spark, pq, out,
      RdfConfig(languages = None, topInfoboxPropertiesPerLang = Some(100),
        externaliseUris = true, writeTypes = true))
    val stage2Sec = (System.nanoTime() - t2) / 1e9
    val steal2 = m2.pct()
    val rdfBytes = dirBytes(spark, out)

    // ---- POST-stage scan proof (catches a box that degraded mid-session)
    val mPost = new StealMeter
    val scanPost1 = scanTime(s"$work/docs_1f")
    val scanPost32 = scanTime(s"$work/docs_32f")
    val stealPost = mPost.pct()
    println(f"[pipeline] scan proof POST ${scanPost1}%6.2f s / ${scanPost32}%5.2f s = ${scanPost1 / scanPost32}%5.1fx  steal $stealPost%4.1f%%")
    // certify on the better probe: contention only ever LOWERS a speedup,
    // so the max is the honest estimate of the box's scan parallelism
    val (scan1, scan32) =
      if (scanPre1 / scanPre32 >= scanPost1 / scanPost32) (scanPre1, scanPre32)
      else (scanPost1, scanPost32)

    val mb = 1024.0 * 1024.0
    val nCores = cpus.toInt
    def r3(x: Double) = math.rint(x * 1000) / 1000
    val json =
      s"""{"metric":"pipeline","unit":"sec","cpus":$nCores,""" +
        s""""ttl_mb":${r3(ttlBytes / mb)},"stage1_sec":${r3(stage1Sec)},""" +
        s""""stage1_mb_per_sec_per_core":${r3(ttlBytes / mb / stage1Sec / nCores)},""" +
        s""""parquet_mb":${r3(parquetBytes / mb)},"stage2_sec":${r3(stage2Sec)},""" +
        s""""stage2_mb_per_sec_per_core":${r3(parquetBytes / mb / stage2Sec / nCores)},""" +
        s""""rdf_gz_mb":${r3(rdfBytes / mb)},""" +
        s""""triples":${triples.values.sum},""" +
        s""""baseline_stage1_mb_per_sec_per_core":5.70,""" +
        s""""baseline_stage2_mb_per_sec_per_core":0.75,""" +
        s""""scan_single_file_sec":${r3(scan1)},"scan_multi_file_sec":${r3(scan32)},""" +
        s""""scan_speedup":${r3(scan1 / scan32)},""" +
        s""""scan_speedup_pre":${r3(scanPre1 / scanPre32)},""" +
        s""""scan_speedup_post":${r3(scanPost1 / scanPost32)},""" +
        s""""stage1_steal_pct":${r3(steal1)},"stage2_steal_pct":${r3(steal2)},""" +
        s""""proof_pre_steal_pct":${r3(stealPre)},"proof_post_steal_pct":${r3(stealPost)}}"""
    println(json)
    spark.stop()
  }
}
