package graft

import org.apache.spark.sql.functions._

/** ONE-OFF measurement main for the round-21 CorpusLmTables sidecar
  * (VERDICT_r20 item 2) — deleted after its numbers land in PLANS.md,
  * the MeasureNightly precedent. Protocol (the r20 rules): the standing
  * corpus is ON DISK (parquet written once, outside timing), parity is
  * asserted EXACT between shapes (score-sum + row count), min-of-3 with
  * per-run hypervisor steal.
  *
  * Shapes:
  *  - A  per-call in-plan `kneserNeyLogProb(corpus)` — what a nightly
  *       that re-derives the LM pays (3 corpus explodes);
  *  - A' per-call in-plan `bigramLogProb(corpus)`;
  *  - B  `writeCorpusLmTables(corpus)` — the one-time build;
  *  - C  table-backed `kneserNeyLogProb(corpus, tables)` — same scoring
  *       stream as A, corpus legs from bucketed parquet + stamped N_bi:
  *       output must be EXACTLY A's;
  *  - C' table-backed `bigramLogProb(corpus, tables)` vs A';
  *  - D  table-backed `kneserNeyLogProb(batch, tables)` — the true
  *       nightly marginal (batch-sized, zero corpus passes).
  */
object MeasureLm {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rep = sys.env.getOrElse("GRAFT_LM_REP", "32").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.ext.Importance

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // standing corpus: %11 != 0 slice replicated `rep` times with
    // disjoint ids; ON DISK — a real corpus leg pays a parquet scan
    val base = docs.where(col("doc_id") % 11 =!= 0)
    val corpusPath = "/tmp/measure_lm_corpus"
    val reps = spark.range(0, rep).select(col("id").as("_r"))
    base.crossJoin(reps)
      .select((col("doc_id") * rep + col("_r")).as("doc_id"), col("text"))
      .write.mode("overwrite").parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    val batch = docs.where(col("doc_id") % 11 === 0)
    println(s"corpus=${corpus.count()} docs on disk, batch=${batch.count()}")

    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(sum(col("n_bigrams")), sum(col("kn_logprob"))).head()
      (r.getLong(0), r.getLong(1))
    }
    def sigBi(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(sum(col("n_bigrams")), sum(col("lm_logprob"))).head()
      (r.getLong(0), r.getLong(1))
    }
    def time3(name: String)(body: => Unit): Unit = {
      val cells = (1 to 3).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val m = new graft.core.Steal.Meter
        val t0 = System.nanoTime()
        body
        val s = (System.nanoTime() - t0) / 1e9
        (s, m.pct())
      }
      val best = cells.minBy(_._1)
      println(f"$name%-40s min ${best._1}%.2f s @ ${best._2}%.1f%% steal   " +
        cells.map(c => f"${c._1}%.2f@${c._2}%.1f").mkString("all: ", " ", ""))
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // A / A': per-call in-plan over the on-disk corpus
    time3("A  kneserNey in-plan (corpus)") {
      noop(Importance.kneserNeyLogProb(corpus, col("text"), "doc_id")) }
    time3("A' bigramLogProb in-plan (corpus)") {
      noop(Importance.bigramLogProb(corpus, col("text"), "doc_id")) }

    // B: one-time table build
    var tables: Importance.CorpusLmTables = null
    time3("B  writeCorpusLmTables (once)") {
      tables = Importance.writeCorpusLmTables(
        corpus, col("text"), "measure_lm", buckets = cpus.toInt) }

    // parity: table-backed output EXACTLY equals in-plan on the corpus
    val pIn = sig(Importance.kneserNeyLogProb(corpus, col("text"), "doc_id"))
    val pTb = sig(Importance.kneserNeyLogProb(corpus, col("text"), "doc_id",
      tables, 1L << 20))
    require(pIn == pTb, s"KN parity broke: $pIn vs $pTb")
    val bIn = sigBi(Importance.bigramLogProb(corpus, col("text"), "doc_id"))
    val bTb = sigBi(Importance.bigramLogProb(corpus, col("text"), "doc_id", tables))
    require(bIn == bTb, s"bigram parity broke: $bIn vs $bTb")
    println(s"parity EXACT: kn=$pIn bigram=$bIn")

    // C / C': table-backed, same scoring stream
    time3("C  kneserNey table-backed (corpus)") {
      noop(Importance.kneserNeyLogProb(corpus, col("text"), "doc_id",
        tables, 1L << 20)) }
    time3("C' bigramLogProb table-backed (corpus)") {
      noop(Importance.bigramLogProb(corpus, col("text"), "doc_id", tables)) }

    // D: the true nightly marginal — batch scored, zero corpus passes
    time3("D  kneserNey table-backed (batch)") {
      noop(Importance.kneserNeyLogProb(batch, col("text"), "doc_id",
        tables, 1L << 20)) }

    spark.sql("DROP TABLE IF EXISTS measure_lm_unigrams")
    spark.sql("DROP TABLE IF EXISTS measure_lm_bigrams")
    spark.stop()
  }
}
