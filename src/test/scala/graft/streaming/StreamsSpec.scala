package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming tumbling agg emits finalized windows after watermark") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = Streams.tumblingAgg(events, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 00:10:00"), "click", 1.0),
        (ts("2024-01-01 00:20:00"), "click", 2.0))
      q.processAllAvailable()
      // advance watermark past window end
      input.addData((ts("2024-01-01 02:00:00"), "click", 9.0))
      q.processAllAvailable()
      val out = spark.table("tumbling")
        .select(col("window.start").cast("string"), col("n_events"), col("sum_value"))
        .as[(String, Long, Double)].collect()
      assert(out.toSeq === Seq(("2024-01-01 00:00:00", 2L, 3.0)))
    } finally q.stop()
  }

  test("streaming near-dup dedup drops band-colliding documents within the watermark") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val q = Streams.nearDupDedup(docs, "text", watermark = "1 hour")
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:00"), 1L, "alpha beta gamma"),
        (ts("2024-01-01 00:01:00"), 2L, "gamma beta alpha"), // same token set -> same band
        (ts("2024-01-01 00:02:00"), 3L, "completely different words"))
      q.processAllAvailable()
      val kept = spark.table("neardup").select("doc_id").as[Long].collect().sorted
      assert(kept.toSeq === Seq(1L, 3L)) // 2 suppressed as a near-dup of 1
    } finally q.stop()
  }

  test("streaming URL dedup suppresses canonical-key collisions, first arrival wins") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "url")
    val q = Streams.urlDedup(docs, "url", watermark = "1 hour")
      .writeStream.format("memory").queryName("urldedup")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:00"), 1L, "HTTPS://WWW.example.com/A?sid=9"),
        (ts("2024-01-01 00:01:00"), 2L, "http://example.com/A"), // same canonical page
        (ts("2024-01-01 00:02:00"), 3L, "http://example.com/B"))
      q.processAllAvailable()
      val kept = spark.table("urldedup").select("doc_id").as[Long].collect().sorted
      assert(kept.toSeq === Seq(1L, 3L)) // 2 suppressed: first arrival won
      // the state key never holds document payload — schema check that
      // the helper column is dropped from the output
      assert(!spark.table("urldedup").columns.contains("_canon"))
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits session summary when the gap passes") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    // the operator applies its own watermark (required for the timeout)
    val q = Streams.sessionizeWithState(input.toDS(), gapMs = 30 * 60 * 1000,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      input.addData(
        Streams.Event(1L, ts("2024-01-01 00:00:00"), "click", 1.0),
        Streams.Event(1L, ts("2024-01-01 00:10:00"), "click", 1.0))
      q.processAllAvailable()
      // an event far in the future closes user 1's session (new session in
      // same batch) and advances the watermark so the old state times out
      input.addData(Streams.Event(1L, ts("2024-01-01 03:00:00"), "click", 1.0))
      q.processAllAvailable()
      input.addData(Streams.Event(2L, ts("2024-01-01 06:00:00"), "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("sessions")
        .select(col("user_id"), col("n_events"), col("start").cast("string"))
        .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._3))
      assert(out.contains((1L, 2L, "2024-01-01 00:00:00")))
    } finally q.stop()
  }

  test("streaming dedup drops in-watermark duplicates") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "event_id")
    val q = Streams.dedup(events, "1 hour", Seq("event_id"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      input.addData((ts("2024-01-01 00:00:00"), 1L), (ts("2024-01-01 00:00:00"), 1L))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 00:05:00"), 2L), (ts("2024-01-01 00:00:00"), 1L))
      q.processAllAvailable()
      assert(spark.table("dedup").count() === 2) // 1L once, 2L once
    } finally q.stop()
  }

  test("funnelStream tracks per-user depth and matches the batch funnel in order") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    val q = Streams.funnelStream(input.toDS(), Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel")
      .outputMode("update").start()
    try {
      // batch 1: user 1 views+clicks; user 2 purchases before viewing
      input.addData(
        Streams.Event(1L, ts("2024-01-01 00:00:00"), "view", 0),
        Streams.Event(1L, ts("2024-01-01 00:01:00"), "click", 0),
        Streams.Event(2L, ts("2024-01-01 00:00:00"), "purchase", 0),
        Streams.Event(2L, ts("2024-01-01 00:01:00"), "view", 0))
      q.processAllAvailable()
      // batch 2: user 1 completes; user 2 clicks (still no valid purchase)
      input.addData(
        Streams.Event(1L, ts("2024-01-01 00:02:00"), "purchase", 0),
        Streams.Event(2L, ts("2024-01-01 00:02:00"), "click", 0))
      q.processAllAvailable()
      val live = spark.table("funnel").as[Streams.FunnelProgress].collect()
        .groupBy(_.user_id).map { case (u, rs) => u -> rs.map(_.depth).max }
      assert(live === Map(1L -> 3L, 2L -> 2L))
      // the batch operator agrees on the same (in-order) event set
      val batch = graft.ops.ext.Events.funnel(
          Seq((1L, "2024-01-01 00:00:00", "view"), (1L, "2024-01-01 00:01:00", "click"),
            (1L, "2024-01-01 00:02:00", "purchase"),
            (2L, "2024-01-01 00:00:00", "purchase"), (2L, "2024-01-01 00:01:00", "view"),
            (2L, "2024-01-01 00:02:00", "click"))
            .toDF("user_id", "ts_s", "event_type")
            .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"), col("event_type")),
          Seq("view", "click", "purchase"))
        .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._2).toMap
      assert(batch === Map(1L -> 3L, 2L -> 2L))
    } finally q.stop()
  }

  test("nbScoreStream scores arriving docs identically to the batch classifier") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val seeds = Seq(
      (1L, "good clean prose text", true, true),
      (2L, "spam junk noise click", true, false)
    ).toDF("doc_id", "text", "seed", "label")
    val model = graft.ops.ext.TextStats.trainNb(seeds, col("text"),
      col("seed"), col("label"), topV = 50)
    val input = MemoryStream[(Long, String)]
    val q = Streams.nbScoreStream(input.toDF().toDF("doc_id", "text"),
        "text", "doc_id", model)
      .writeStream.format("memory").queryName("nbscores")
      .outputMode("append").start()
    try {
      input.addData((10L, "clean prose here"), (11L, "spam click spam"))
      q.processAllAvailable()
      val streamed = spark.table("nbscores")
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      val batch = graft.ops.ext.TextStats.applyNb(
          Seq((10L, "clean prose here"), (11L, "spam click spam"))
            .toDF("doc_id", "text"), col("text"), "doc_id", model)
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      assert(streamed === batch)
      assert(streamed.find(_._1 == 10L).get._4 === true)
      assert(streamed.find(_._1 == 11L).get._4 === false)
    } finally q.stop()
  }

  test("applyChangelogStream maintains the last-writer-wins view across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.LogEntry]
    val q = Streams.applyChangelogStream(input.toDS())
      .writeStream.format("memory").queryName("changelog")
      .outputMode("update").start()
    try {
      // batch 1: two inserts
      input.addData(
        Streams.LogEntry(1L, 1L, "upsert", "one"),
        Streams.LogEntry(2L, 1L, "upsert", "two"))
      q.processAllAvailable()
      // batch 2: id 1 updated; id 2 deleted; id 3 gets a LATE lower
      // version after a higher one in the same batch (max wins)
      input.addData(
        Streams.LogEntry(1L, 2L, "upsert", "one v2"),
        Streams.LogEntry(2L, 2L, "delete", ""),
        Streams.LogEntry(3L, 5L, "upsert", "three v5"),
        Streams.LogEntry(3L, 4L, "upsert", "three v4"))
      q.processAllAvailable()
      // batch 3: a stale replay for id 1 must NOT regress the state; id 2
      // re-added after its delete
      input.addData(
        Streams.LogEntry(1L, 1L, "upsert", "one"),
        Streams.LogEntry(2L, 3L, "upsert", "two back"))
      q.processAllAvailable()
      val rows = spark.table("changelog")
        .as[Streams.LogEntry].collect()
      // memory sink in update mode appends each emitted update; the live
      // view per id is the winner under the operator's own total order
      // (don't rely on the sink preserving batch order)
      val live = rows.groupBy(_.doc_id)
        .map { case (id, es) => id -> es.maxBy(e => (e.version, e.op, e.text)) }
      assert(live(1L) === Streams.LogEntry(1L, 2L, "upsert", "one v2"))
      assert(live(2L) === Streams.LogEntry(2L, 3L, "upsert", "two back"))
      assert(live(3L) === Streams.LogEntry(3L, 5L, "upsert", "three v5"))
      // the delete WAS emitted as a tombstone in batch 2
      assert(rows.contains(Streams.LogEntry(2L, 2L, "delete", "")))
      // and the final view matches the batch operator replaying the log
      val base = Seq.empty[(Long, String)].toDF("doc_id", "text")
      val log = rows.map(e => (e.doc_id, e.version, e.op, e.text)).toSeq.distinct
        .toDF("doc_id", "version", "op", "text")
      val batch = graft.ops.ext.Snapshots
        .applyChangelog(base, log, "doc_id", "version", "op")
        .as[(Long, Long, String)].collect().sortBy(_._1)
      assert(batch.toSeq === Seq(
        (1L, 2L, "one v2"), (2L, 3L, "two back"), (3L, 5L, "three v5")))
    } finally q.stop()
  }

  test("applyChangelogStream tie-break matches batch UTF8String order on non-BMP payloads") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a malformed duplicate-version log where (version, op) tie and the
    // payloads differ in supplementary vs private-use characters: U+10000
    // (surrogate pair, UTF-16 units 0xD800 0xDC00) vs U+E000 (single unit
    // 0xE000). Scala's Ordering.String (code units) ranks U+E000 higher;
    // UTF8String bytes (code points) rank U+10000 higher — the stream must
    // agree with the batch operator's max(struct), i.e. pick U+10000.
    val supplementary = new String(Character.toChars(0x10000))
    val privateUse = "\uE000"
    val input = MemoryStream[Streams.LogEntry]
    val q = Streams.applyChangelogStream(input.toDS())
      .writeStream.format("memory").queryName("changelog_utf8")
      .outputMode("update").start()
    try {
      input.addData(
        Streams.LogEntry(1L, 1L, "upsert", privateUse),
        Streams.LogEntry(1L, 1L, "upsert", supplementary))
      q.processAllAvailable()
      val live = spark.table("changelog_utf8").as[Streams.LogEntry]
        .collect().last
      val base = Seq.empty[(Long, String)].toDF("doc_id", "text")
      val log = Seq((1L, 1L, "upsert", privateUse),
        (1L, 1L, "upsert", supplementary)).toDF("doc_id", "version", "op", "text")
      val batch = graft.ops.ext.Snapshots
        .applyChangelog(base, log, "doc_id", "version", "op")
        .as[(Long, Long, String)].collect().head
      assert(live.text === batch._3)
      assert(live.text === supplementary) // code-point order, both engines
    } finally q.stop()
  }

  test("heavyHittersStream keeps per-group majority tokens across batches, bounded state") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val docs = input.toDF().toDF("source", "text")
    val q = Streams.heavyHittersStream(docs, "text", "source", k = 3)
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode("update").start()
    try {
      // batch 1: source A skewed to "hot"; source B uniform noise
      input.addData(
        ("A", "hot hot hot cold1 cold2"),
        ("B", "n1 n2 n3"))
      q.processAllAvailable()
      // batch 2: A's majority persists through state; B gains "warm"
      input.addData(
        ("A", "hot hot filler3 filler4"),
        ("B", "warm warm warm warm"))
      q.processAllAvailable()
      val rows = spark.table("mg_stream").as[(String, Seq[String])].collect()
      val byG = rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2) }
      // the Misra-Gries superset guarantee per group: A's majority token
      // survives EVERY emitted update (it can never be evicted), B's
      // batch-2 flood evicts the uniform noise and leaves exactly it,
      // and candidates stay <= k everywhere
      assert(byG("A").forall(_.contains("hot")), byG("A"))
      assert(byG("B").exists(_ == Seq("warm")), byG("B"))
      assert(rows.forall(_._2.size <= 3))
    } finally q.stop()
  }

  test("c4CleanStream scrubs arriving documents identically to the batch filter") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "This is a proper sentence.\n- bullet nav\nAnother good one here!"),
      (2L, "please enable javascript to continue.\nshort"),
      (3L, "Only one valid sentence stays."))
    val expected = graft.ops.ext.TextStats.c4LineFilter(
        rows.toDF("doc_id", "text"), col("text"), minWords = 3, minLines = 1)
      .select("doc_id", "c4_kept", "c4_text", "c4_pass")
      .as[(Long, Long, String, Boolean)].collect().toSet
    val input = MemoryStream[(Long, String)]
    val q = Streams.c4CleanStream(input.toDF().toDF("doc_id", "text"), "text")
      .select("doc_id", "c4_kept", "c4_text", "c4_pass")
      .writeStream.format("memory").queryName("c4_stream")
      .outputMode("append").start()
    try {
      input.addData(rows.take(2): _*); q.processAllAvailable()
      input.addData(rows.drop(2): _*); q.processAllAvailable()
      assert(spark.table("c4_stream")
        .as[(Long, Long, String, Boolean)].collect().toSet === expected)
    } finally q.stop()
  }

  test("ivfAssignStream assigns arriving vectors identically to the batch build") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vecs = (0L until 20L).map(i =>
      (i, Seq.tabulate(8)(d => ((i * 31 + d * 17) % 13 - 6).toFloat)))
    val batchDf = vecs.toDF("id", "vec")
    val model = graft.ops.ext.Similarity.trainIvfSeed(batchDf, numCentroids = 4)
    val expected = graft.ops.ext.Similarity.assignCells(batchDf, model)
      .select("id", "cid").as[(Long, Long)].collect().toSet
    assert(expected.size === 20 && expected.map(_._2).size > 1)
    val input = MemoryStream[(Long, Seq[Float])]
    val q = Streams.ivfAssignStream(input.toDF().toDF("id", "vec"), model)
      .select("id", "cid")
      .writeStream.format("memory").queryName("ivf_stream")
      .outputMode("append").start()
    try {
      input.addData(vecs.take(10): _*); q.processAllAvailable()
      input.addData(vecs.drop(10): _*); q.processAllAvailable()
      assert(spark.table("ivf_stream").as[(Long, Long)].collect().toSet === expected)
    } finally q.stop()
  }

  test("weightedSampleStream: emitted picks equal the batch sampler over the prefix") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val b1 = (0L until 60L).map(i => (i, Seq("x", "y")((i % 2).toInt), i % 7 + 1))
    val b2 = (60L until 150L).map(i => (i, Seq("x", "y")((i % 2).toInt), i % 7 + 1))
    val input = MemoryStream[(Long, String, Long)]
    val docs = input.toDF().toDF("doc_id", "lang", "w")
    val q = Streams.weightedSampleStream(docs, "doc_id", "lang", col("w"),
        k = 8, seed = 7L)
      .writeStream.format("memory").queryName("ws_stream")
      .outputMode("update").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      // last update per stratum = the stream's current sample; it must
      // equal the batch aggregate sampler run on everything seen so far
      val updates = spark.table("ws_stream")
        .as[(String, Seq[(Long, Long, Long)])].collect()
      val last = updates.zipWithIndex.groupBy(_._1._1)
        .map { case (g, rs) => g -> rs.maxBy(_._2)._1._2 }
      val batch = graft.ops.ext.Sampling.weightedSampleStratifiedAgg(
          (b1 ++ b2).toDF("doc_id", "lang", "w"), "doc_id", "lang", col("w"),
          k = 8, seed = 7L)
        .as[(Long, String, Long, Long)].collect()
        .groupBy(_._2)
        .map { case (g, rs) => g -> rs.map(r => (r._4, r._1, r._3)).toSeq
          .sortBy(e => (e._1, e._2)) }
      assert(last === batch)
      assert(updates.forall(_._2.size <= 8))
    } finally q.stop()
  }

  test("streaming decontamination drops benchmark-overlapping documents statelessly") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq("the quick brown fox jumps over the lazy dog")
      .toDF("text")
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = Streams.decontaminate(docs, "text", bench, "text", n = 8)
      .writeStream.format("memory").queryName("decontam")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "prefix the quick brown fox jumps over the lazy dog suffix"), // contaminated
        (2L, "clean text with enough tokens to clear the eight gram bar easily"))
      q.processAllAvailable()
      val out = spark.table("decontam").select(col("doc_id")).as[Long].collect()
      assert(out.toSeq === Seq(2L))
    } finally q.stop()
  }

  test("bloom-prefiltered streaming decontamination equals the exact stream") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq("the quick brown fox jumps over the lazy dog").toDF("text")
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = Streams.decontaminateBloom(docs, "text", bench, "text", n = 8)
      .writeStream.format("memory").queryName("decontam_bloom")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "prefix the quick brown fox jumps over the lazy dog suffix"), // contaminated
        (2L, "clean text with enough tokens to clear the eight gram bar easily"),
        (3L, null.asInstanceOf[String])) // null text keeps the row, like the exact stream
      q.processAllAvailable()
      val out = spark.table("decontam_bloom").select(col("doc_id")).as[Long].collect().sorted
      assert(out.toSeq === Seq(2L, 3L))
    } finally q.stop()
  }

  test("streaming incremental dedup drops corpus band matches statelessly") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // same token set as corpus doc (minhash bands match under reordering);
    // novel doc passes
    val corpus = Seq("alpha beta gamma delta").toDF("text")
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = Streams.dedupAgainstCorpusStream(docs, "text", corpus, "text")
      .writeStream.format("memory").queryName("incdedup")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "delta gamma beta alpha"), // dup of the corpus doc's token set
        (2L, "entirely novel content here"))
      q.processAllAvailable()
      val out = spark.table("incdedup").select(col("doc_id")).as[Long].collect()
      assert(out.toSeq === Seq(2L))
    } finally q.stop()
  }

  test("streaming Hamming dedup drops near-signature docs, matches the batch filter") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "completely independent reference text about sailing ships").toDF("text")
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = Streams.simhashDedupStream(docs, "text", ref, "text", maxDist = 3)
      .writeStream.format("memory").queryName("hamdedup")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog again and once"), // near ref 1
        (2L, "astronomy telescopes observe distant galaxies and nebulae"), // novel
        (3L, "completely independent reference text about sailing ships")) // exact ref 2
      q.processAllAvailable()
      val out = spark.table("hamdedup").select(col("doc_id")).as[Long].collect().sorted
      // batch-filter parity: the same rows survive the batch popcount filter
      val batchDocs = Seq(
        (1L, "the quick brown fox jumps over the lazy dog again and once"),
        (2L, "astronomy telescopes observe distant galaxies and nebulae"),
        (3L, "completely independent reference text about sailing ships"))
        .toDF("doc_id", "text")
      val refSig = ref.select(graft.ops.ext.Dedup.simhashText(col("text")).as("rs"))
      val survivors = batchDocs
        .withColumn("s", graft.ops.ext.Dedup.simhashText(col("text")))
        .join(refSig, bit_count(col("s").bitwiseXOR(col("rs"))) <= 3, "left_anti")
        .select(col("doc_id")).as[Long].collect().sorted
      assert(out.toSeq === survivors.toSeq)
      assert(out.toSeq === Seq(2L))
    } finally q.stop()
  }

  test("curateStream composes PII gate, stream dedup, corpus dedup, decontamination") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq("already ingested corpus document").toDF("text")
    val bench = Seq("the quick brown fox jumps over the lazy dog").toDF("text")
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = Streams.curateStream(docs, "text", corpus, "text", bench, "text",
        watermark = "1 hour")
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    try {
      input.addData(
        (1L, t0, "a perfectly novel clean document"), // survives
        (2L, t0, "mail me at user@example.com please"), // PII gate
        (3L, t0, "clean document perfectly novel a"), // same token set as... not doc 1
        (4L, t0, "document corpus ingested already"), // corpus band match
        (5L, t0, "prefix the quick brown fox jumps over the lazy dog suffix")) // contaminated
      q.processAllAvailable()
      val out = spark.table("curated").select(col("doc_id")).as[Long].collect().sorted
      // docs 1 and 3 share a token SET (reordered) -> same minhash band ->
      // the within-stream dedup keeps exactly one of them (which one is
      // batch-internal order, not contract); 2/4/5 are dropped by their
      // stages
      assert(out.length === 1 && (out(0) === 1L || out(0) === 3L), out.toSeq)
    } finally q.stop()
  }

  test("stream-stream join matches keys within the time window") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]
    val q = Streams.streamStreamJoin(
        clicks.toDF().toDF("ts", "user_id"),
        buys.toDF().toDF("ts", "user_id"),
        "user_id", "1 hour", "10 MINUTES")
      .select("user_id", "ts", "r_ts")
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      clicks.addData((ts("2024-01-01 00:00:00"), 1L), (ts("2024-01-01 00:00:00"), 2L))
      buys.addData((ts("2024-01-01 00:05:00"), 1L)) // in window for user 1
      buys.addData((ts("2024-01-01 00:30:00"), 2L)) // outside 10min window
      q.processAllAvailable()
      val out = spark.table("ssj").select("user_id").as[Long].collect()
      assert(out.toSeq === Seq(1L))
    } finally q.stop()
  }

  test("streaming quality gate matches the batch gate verdict for verdict") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.ext.TextStats
    // same rows streamed and used as the static rarity corpus, so the
    // batch gate (rarity relative to its own input) and the stream gate
    // (rarity relative to the static corpus) score identical corpora
    val rows = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "a b"),
      (3L, "1234 5678 9012 3456"),
      (4L, "word word word word word"),
      (5L, "mail me at me@example.com now okay"),
      (6L, "alpha beta gamma zz9x qq8y delta"))
    val corpus = rows.toDF("doc_id", "text")
    val t = TextStats.QualityThresholds(
      minTokens = 3, maxTokens = 10, minAlphaBp = 7000, maxPii = 0,
      minDistinctBp = 8000, maxTopTokenBp = 3000,
      maxMeanRarity = Some(15000000L), rarityTopV = 5)
    val expected = TextStats.qualityGate(corpus, col("text"), "doc_id", t)
      .select(col("doc_id"), col("quality.len_ok"), col("quality.alpha_ok"),
        col("quality.pii_ok"), col("quality.rep_ok"), col("quality.rarity_ok"),
        col("quality.pass"))
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().sortBy(_._1)
    // sanity: the fixture exercises both rarity verdicts
    assert(expected.map(_._6).distinct.length === 2)
    val input = MemoryStream[(Long, String)]
    val q = Streams.qualityGateStream(
        input.toDF().toDF("doc_id", "text"), "text", t, Some(corpus))
      .select(col("doc_id"), col("quality.len_ok"), col("quality.alpha_ok"),
        col("quality.pii_ok"), col("quality.rep_ok"), col("quality.rarity_ok"),
        col("quality.pass"))
      .writeStream.format("memory").queryName("qgate").outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("qgate")
        .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
        .collect().sortBy(_._1)
      assert(got === expected)
    } finally q.stop()
  }

  test("streaming quality gate carries the optional gopher shape signal") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.ext.TextStats
    // shapeRules rides withScanSignals (pure per-row work), so the
    // stateless stream gate must surface shape_ok and agree with batch
    val rows = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, (1 to 10).map(i => s"- item number $i").mkString("\n")),
      (3L, "to be continued...\nmore coming soon..."))
    val t = TextStats.QualityThresholds(
      minTokens = 3, maxTokens = 100, minAlphaBp = 5000, maxPii = 0,
      minDistinctBp = 2000, maxTopTokenBp = 2600,
      shapeRules = Some(TextStats.GopherShapeThresholds()))
    val expected = TextStats.qualityGate(
        rows.toDF("doc_id", "text"), col("text"), "doc_id", t)
      .select(col("doc_id"), col("quality.shape_ok"), col("quality.pass"))
      .as[(Long, Boolean, Boolean)].collect().sortBy(_._1)
    assert(expected.map(_._2).toSeq === Seq(true, false, false))
    val input = MemoryStream[(Long, String)]
    val q = Streams.qualityGateStream(
        input.toDF().toDF("doc_id", "text"), "text", t)
      .select(col("doc_id"), col("quality.shape_ok"), col("quality.pass"))
      .writeStream.format("memory").queryName("qgate_shape")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("qgate_shape")
        .as[(Long, Boolean, Boolean)].collect().sortBy(_._1)
      assert(got === expected)
    } finally q.stop()
  }

  test("annTopKStream: exact form matches batch cosineTopK row for row") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.ext.Similarity
    // gapped, tie-free cosines by construction (no float-ordering luck)
    val corpus = Seq(
      (10L, Seq(1.0, 0.0, 0.0)),
      (11L, Seq(0.9, 0.1, 0.0)),
      (12L, Seq(0.0, 1.0, 0.0)),
      (13L, Seq(0.0, 0.0, 1.0)),
      (14L, Seq(0.5, 0.5, 0.0))).toDF("id", "vec")
    val qRows = Seq(
      (1L, Seq(1.0, 0.05, 0.0)),
      (2L, Seq(0.0, 0.0, 2.0)),
      (3L, Seq(0.0, 0.0, 0.0)), // zero-norm: every cosine pinned to -1
      (10L, Seq(1.0, 0.0, 0.0))) // id collision with corpus: self excluded
    val want = Similarity.cosineTopK(qRows.toDF("id", "vec"), corpus, k = 3)
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    // zero-norm query: all -1 ties broken by n_id asc
    assert(want.filter(_._1 == 3L).map(_._2).toSeq === Seq(10L, 11L, 12L))
    assert(!want.filter(_._1 == 10L).map(_._2).contains(10L))
    val input = MemoryStream[(Long, Seq[Double])]
    val q = Streams.annTopKStream(
        input.toDF().toDF("id", "vec"), corpus, k = 3)
      .writeStream.format("memory").queryName("ann_exact")
      .outputMode("append").start()
    try {
      input.addData(qRows: _*)
      q.processAllAvailable()
      val got = spark.table("ann_exact")
        .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
      assert(got === want)
    } finally q.stop()
  }

  test("annTopKStream: malformed rows never kill the query (null id / null vec)") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.ext.Similarity
    val corpus = Seq(
      (10L, Seq(1.0, 0.0, 0.0)),
      (11L, Seq(0.9, 0.1, 0.0)),
      (12L, Seq(0.0, 1.0, 0.0)),
      (13L, Seq(0.0, 0.0, 1.0))).toDF("id", "vec")
    val qRows: Seq[(Option[Long], Option[Seq[Double]])] = Seq(
      (Some(1L), Some(Seq(1.0, 0.05, 0.0))),
      (None, Some(Seq(1.0, 0.0, 0.0))), // null id: dropped, not an NPE
      (Some(4L), None))                 // null vec: cosine -1 everywhere
    // batch parity on the same rows: cosineTopK's =!= join drops the
    // null id, cosineSafe's coalesce pins the null vec to -1
    val want = Similarity.cosineTopK(qRows.toDF("id", "vec"), corpus, k = 3)
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    assert(want.map(_._1).toSet === Set(1L, 4L))
    assert(want.filter(_._1 == 4L).map(_._2).toSeq === Seq(10L, 11L, 12L))
    val input = MemoryStream[(Option[Long], Option[Seq[Double]])]
    val q = Streams.annTopKStream(
        input.toDF().toDF("id", "vec"), corpus, k = 3)
      .writeStream.format("memory").queryName("ann_null")
      .outputMode("append").start()
    try {
      input.addData(qRows: _*)
      q.processAllAvailable()
      val got = spark.table("ann_null")
        .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
      assert(got === want)
    } finally q.stop()
  }

  test("annTopKStream: SRP prefilter scores only same-bucket candidates") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.ext.Similarity
    import org.apache.spark.sql.expressions.Window
    val corpus = (0L until 40L).map { i =>
      (100L + i, Seq(math.cos(i * 0.3), math.sin(i * 0.3), (i % 7) * 0.2 - 0.6))
    }.toDF("id", "vec")
    val qRows = (0L until 10L).map { i =>
      (i, Seq(math.cos(i * 0.7 + 0.1), math.sin(i * 0.7 + 0.1), (i % 5) * 0.25 - 0.5))
    }
    val planes = 4
    // batch reference: bucket-equality join + windowed top-k — the
    // two-sided form of srpBucketedTopK, same kernel column both sides
    val c = corpus.select(col("id").as("n_id"), col("vec").as("n_vec"),
      Similarity.srpBucket(col("vec").cast("array<double>"), planes).as("bkt"))
    val qs = qRows.toDF("id", "vec").select(col("id").as("q_id"),
      col("vec").as("q_vec"),
      Similarity.srpBucket(col("vec").cast("array<double>"), planes).as("bkt"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    val want = qs.join(c, Seq("bkt"))
      .where(col("q_id") =!= col("n_id"))
      .withColumn("cos", Similarity.cosineSafe(col("q_vec"), col("n_vec")))
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 2)
      .select(col("q_id"), col("n_id"), col("rnk"))
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    assert(want.nonEmpty) // fixture must actually share buckets
    val input = MemoryStream[(Long, Seq[Double])]
    val q = Streams.annTopKStream(
        input.toDF().toDF("id", "vec"), corpus, k = 2, planes = planes)
      .writeStream.format("memory").queryName("ann_srp")
      .outputMode("append").start()
    try {
      input.addData(qRows: _*)
      q.processAllAvailable()
      val got = spark.table("ann_srp")
        .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
      assert(got === want)
    } finally q.stop()
  }

  test("connectedComponentsSink folds edge batches into a standing labeling") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.ext.Components
    val dir = java.nio.file.Files.createTempDirectory("graft-ccsink").toString
    // before any batch: no snapshot
    assert(Streams.latestCcLabels(spark, dir).isEmpty)
    val input = MemoryStream[(Long, Long)]
    val sink = Streams.connectedComponentsSink(dir)
    val q = input.toDF().toDF("id_a", "id_b")
      .writeStream.foreachBatch(sink).start()
    val batch1 = Seq((1L, 2L), (3L, 4L))
    // batch 2: cross-component merge (2-3), brand-new component (10-11)
    val batch2 = Seq((2L, 3L), (10L, 11L))
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      val after1 = Streams.latestCcLabels(spark, dir).get
        .as[(Long, Long)].collect().sortBy(_._1)
      assert(after1 === Array((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)))
      input.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = Streams.latestCcLabels(spark, dir).get
      .as[(Long, Long)].collect().sortBy(_._1)
    // parity with one batch CC over the union of all streamed edges
    val all = batch1 ++ batch2
    val want = Components.connectedComponents(
        all.flatMap(e => Seq(e._1, e._2)).distinct.toDF("id"),
        all.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got === want)
    assert(got === Array((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L)))
    // exactly-once: a REPLAYED batch id (same id, adversarially different
    // data) is skipped — the durable snapshot already has _SUCCESS
    sink(Seq((1L, 11L)).toDF("id_a", "id_b"), 1L)
    val replayed = Streams.latestCcLabels(spark, dir).get
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(replayed === got)
    // both snapshots remain (time travel); the bounded read sees only v0
    val v0 = Streams.latestCcLabels(spark, dir, before = Some(1L)).get
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(v0 === Array((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)))

    // retention: a torn write OLDER than the newest complete snapshot is
    // reclaimed, the newest `keep` complete snapshots survive, and an
    // incomplete dir NEWER than the newest complete (the current batch,
    // possibly mid-write) is never touched
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // torn write (no _SUCCESS) NEWER than the newest complete snapshot —
    // the current batch possibly mid-write, must never be touched
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir, "batch=2"))
    val pruned = Streams.pruneCcSnapshots(spark, dir, keep = 1)
    assert(pruned === Seq(0L))
    assert(Streams.latestCcLabels(spark, dir).get
      .as[(Long, Long)].collect().sortBy(_._1) === got)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "batch=0")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "batch=2")))
    // keep=1 again: nothing further to do (idempotent)
    assert(Streams.pruneCcSnapshots(spark, dir, keep = 1).isEmpty)
    // once a NEWER complete snapshot lands, the torn batch=2 is a
    // superseded leftover (a replay wrote past it) and is reclaimed
    // along with the now-old complete batch=1
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir, "batch=4"))
    fs.create(new org.apache.hadoop.fs.Path(dir, "batch=4/_SUCCESS")).close()
    assert(Streams.pruneCcSnapshots(spark, dir, keep = 1) === Seq(1L, 2L))
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "batch=4")))
  }

  test("connectedComponentsSink writeManifests: auditable snapshots, heal-on-replay") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ccsink-m").toString
    val sink = Streams.connectedComponentsSink(dir, writeManifests = true)
    sink(Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b"), 0L)
    sink(Seq((2L, 3L)).toDF("id_a", "id_b"), 1L)
    for (b <- Seq(0L, 1L)) {
      assert(new java.io.File(s"$dir/batch=$b/_manifest.jsonl").exists(), s"batch=$b")
      val bad = graft.io.Manifest.verifyParquetDir(spark, s"$dir/batch=$b")
        .where(col("status") =!= "ok").count()
      assert(bad === 0L, s"batch=$b")
    }
    val labels = Streams.latestCcLabels(spark, dir).get
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(labels === Array((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)))
    // crash between parquet commit and manifest write: _SUCCESS exists,
    // manifest missing — the replay heals the manifest WITHOUT rewriting
    // the data (adversarially different replay data must not change it)
    val m1 = new java.io.File(s"$dir/batch=1/_manifest.jsonl")
    assert(m1.delete())
    sink(Seq((10L, 11L)).toDF("id_a", "id_b"), 1L)
    assert(m1.exists())
    assert(graft.io.Manifest.verifyParquetDir(spark, s"$dir/batch=1")
      .where(col("status") =!= "ok").count() === 0L)
    assert(Streams.latestCcLabels(spark, dir).get
      .as[(Long, Long)].collect().sortBy(_._1) === labels)
  }

  test("dsirScoreStream scores arriving docs identically to the batch path") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // model trained offline on a reference corpus
    val corpus = (
      (1L to 6L).map(i => (i, "the quick brown fox", "en")) ++
      (7L to 12L).map(i => (i, "zzz qqq www vvv", "xx"))
    ).toDF("doc_id", "text", "lang")
    val model = graft.ops.ext.Importance.trainDsir(
      corpus, col("text"), col("lang") === "en", buckets = 64)
    // stream rows include vocabulary the model never saw (default path)
    val rows = Seq(
      (100L, "the quick brown fox"), (101L, "zzz qqq www vvv"),
      (102L, "totally unseen words here"), (103L, "solo"))
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = Streams.dsirScoreStream(docs, "text", "doc_id", model)
      .writeStream.format("memory").queryName("dsir").outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("dsir").as[(Long, Long, Long)].collect().sortBy(_._1)
      val want = graft.ops.ext.Importance.applyDsir(
          rows.toDF("doc_id", "text"), col("text"), "doc_id", model)
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      assert(got.toSeq === want.toSeq) // stream == batch, row for row
      val byId = got.map(r => r._1 -> r._3).toMap
      assert(byId(100L) > byId(101L)) // target-like beats off-target
      assert(byId(103L) === 0L) // featureless
    } finally q.stop()
  }

  test("file-source event stream reads the testdata schema incrementally") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val q = Streams.readEventStream(spark, dir.toString)
      .groupBy("event_type").count()
      .writeStream.format("memory").queryName("filestream").outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("filestream").count() === 5) // 5 event types
    } finally q.stop()
  }

  test("foreachBatch lands micro-batches as date-partitioned sorted parquet") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink")
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")
    val q = Streams.writePartitionedStream(events, s"$dir/out", s"$dir/ckpt")
    try {
      input.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-02 10:00:00"), 2L))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 11:00:00"), 3L))
      q.processAllAvailable()
      val batchDirs = new java.io.File(s"$dir/out").listFiles()
        .filter(_.isDirectory).map(_.getName).sorted
      assert(batchDirs === Array("batch_id=0", "batch_id=1"))
      val dateDirs = new java.io.File(s"$dir/out/batch_id=0").listFiles()
        .filter(_.isDirectory).map(_.getName).sorted
      assert(dateDirs === Array("event_date=2024-01-01", "event_date=2024-01-02"))
      assert(spark.read.parquet(s"$dir/out").count() === 3)
    } finally q.stop()
  }

  test("session_window groups events by gap") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")
    val q = Streams.sessionWindows(events, "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sesswin")
      .outputMode("append").start()
    try {
      input.addData((ts("2024-01-01 00:00:00"), 1L), (ts("2024-01-01 00:10:00"), 1L))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 05:00:00"), 1L))
      q.processAllAvailable()
      val out = spark.table("sesswin").select("user_id", "n_events")
        .as[(Long, Long)].collect()
      assert(out.toSeq === Seq((1L, 2L)))
    } finally q.stop()
  }

  test("semanticDecontaminateStream drops leaking vectors identically to batch") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq(Seq(1f, 0f, 0f, 0f)).toDF("embedding")
    val vecs = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),  // verbatim leak: dropped
      (2L, Seq(0f, 1f, 0f, 0f)),  // orthogonal: kept
      (3L, Seq(1f, 1f, 0f, 0f)))  // cos ~0.707 < 0.75: kept
    val expected = graft.ops.ext.Contamination.semanticDecontaminate(
        vecs.toDF("vec_id", "embedding"), col("embedding"),
        bench, col("embedding"), minCos = 0.75)
      .select("vec_id").as[Long].collect().toSet
    val input = MemoryStream[(Long, Seq[Float])]
    val q = Streams.semanticDecontaminateStream(
        input.toDF().toDF("vec_id", "embedding"), "embedding",
        bench, "embedding", minCos = 0.75)
      .select("vec_id")
      .writeStream.format("memory").queryName("semdecontam")
      .outputMode("append").start()
    try {
      input.addData(vecs.take(2): _*); q.processAllAvailable()
      input.addData(vecs.drop(2): _*); q.processAllAvailable()
      assert(spark.table("semdecontam").as[Long].collect().toSet === expected)
      assert(expected === Set(2L, 3L))
    } finally q.stop()
  }

  test("ksDriftStream: per-window KS vs baseline equals the shared fold over the prefix") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Reports
    // standing corpus: uniform over bins 0..3
    val corpus = (0L until 40L).map(i => Tuple1(i % 4)).toDF("v")
    val base = Reports.ksBaseline(corpus, col("v"), bins = 4, binWidth = 1L)
    assert(base.cdfPpm.toSeq === Seq(250000L, 500000L, 750000L, 1000000L))
    val input = MemoryStream[(Timestamp, Long)]
    val q = Streams.ksDriftStream(
        input.toDF().toDF("ts", "v"), "ts", col("v"), windowMs = 1000L, base)
      .writeStream.format("memory").queryName("ks_stream")
      .outputMode("update").start()
    def T(ms: Long) = new Timestamp(ms)
    try {
      input.addData(
        // window 0: all-zero skew (maximal low drift)
        (T(10), 0L), (T(20), 0L), (T(30), 0L), (T(990), 0L),
        // window 1: exactly the baseline distribution
        (T(1010), 0L), (T(1020), 1L), (T(1030), 2L), (T(1040), 3L))
      q.processAllAvailable()
      input.addData( // window 0 dilutes; 999 clamps into the last bin
        (T(500), 2L), (T(600), 3L), (T(700), 999L))
      q.processAllAvailable()
      val rows = spark.table("ks_stream").as[(Timestamp, Long, Long)].collect()
      val last = rows.zipWithIndex.groupBy(_._1._1.getTime)
        .map { case (w, rs) => w -> rs.maxBy(_._2)._1 }
      // a perfectly on-distribution window scores 0 drift
      assert((last(1000L)._2, last(1000L)._3) === ((4L, 0L)))
      // every emitted update equals the SHARED fold over that prefix
      val first0 = rows.zipWithIndex.filter(_._1._1.getTime == 0L).minBy(_._2)._1
      assert((first0._2, first0._3) === Reports.ksStat(Array(4L, 0L, 0L, 0L), base))
      assert((last(0L)._2, last(0L)._3) ===
        Reports.ksStat(Array(4L, 0L, 1L, 2L), base))
      // and the all-zero prefix really was maximal-low drift: |1e6 - 25e4|
      assert(first0._3 === 750000L)
    } finally q.stop()
  }

  test("ksDriftStream: malformed rows follow the family policy (null ts/value drop, negatives clamp)") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Reports
    val corpus = (0L until 40L).map(i => Tuple1(i % 4)).toDF("v")
    val base = Reports.ksBaseline(corpus, col("v"), bins = 4, binWidth = 1L)
    val input = MemoryStream[(Timestamp, java.lang.Long)]
    val q = Streams.ksDriftStream(
        input.toDF().toDF("ts", "v"), "ts", col("v"), windowMs = 1000L, base)
      .writeStream.format("memory").queryName("ks_malformed")
      .outputMode("update").start()
    def T(ms: Long) = new Timestamp(ms)
    try {
      input.addData(
        (T(10), -5L: java.lang.Long), // clamps to bin 0 (family policy)
        (T(20), 0L: java.lang.Long),
        (T(30), 1L: java.lang.Long),
        (null, 3L: java.lang.Long), // null ts: dropped, NOT an NPE kill
        (T(40), null)) // null value: dropped
      q.processAllAvailable()
      val rows = spark.table("ks_malformed").as[(Timestamp, Long, Long)].collect()
      // ONE window survives the drops; its histogram is the clamped
      // (2,1,0,0) and the emitted stat is the shared fold over it
      assert(rows.map(_._1.getTime).toSeq === Seq(0L))
      assert((rows.head._2, rows.head._3) === Reports.ksStat(Array(2L, 1L, 0L, 0L), base))
      assert((rows.head._2, rows.head._3) === ((3L, 500000L)))
      // batch parity on the SAME malformed slice: ksBaseline's clamped
      // CDF is exactly the window histogram's CDF (666666, 1e6, ...)
      val slice: Seq[java.lang.Long] = Seq(-5L: java.lang.Long, 0L: java.lang.Long,
        1L: java.lang.Long, null)
      val b = Reports.ksBaseline(slice.map(Tuple1(_)).toDF("v"), col("v"),
        bins = 4, binWidth = 1L)
      assert(b.cdfPpm.toSeq === Seq(666666L, 1000000L, 1000000L, 1000000L))
    } finally q.stop()
  }

  test("ksDriftStreamBounded: in-bound stragglers update, closed windows flush and free state") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Reports
    val corpus = (0L until 40L).map(i => Tuple1(i % 4)).toDF("v")
    val base = Reports.ksBaseline(corpus, col("v"), bins = 4, binWidth = 1L)
    val input = MemoryStream[(Timestamp, Long)]
    val q = Streams.ksDriftStreamBounded(
        input.toDF().toDF("ts", "v"), "ts", col("v"), windowMs = 1000L, base,
        lateness = "2 seconds")
      .writeStream.format("memory").queryName("ks_bounded")
      .outputMode("update").start()
    def T(ms: Long) = new Timestamp(ms)
    def rows() = spark.table("ks_bounded").as[(Timestamp, Long, Long)].collect().toSeq
    try {
      input.addData((T(10), 0L), (T(20), 1L)); q.processAllAvailable()
      // straggler INSIDE the lateness bound still updates its window
      input.addData((T(500), 2L)); q.processAllAvailable()
      assert(rows().filter(_._1.getTime == 0L).map(r => (r._2, r._3)) ===
        Seq((2L, 500000L), (3L, Reports.ksStat(Array(1L, 1L, 1L, 0L), base)._2)))
      // advance event time: watermark reaches 5000-2000=3000 > window-0
      // end, so window 0 times out -> exactly ONE final flush row (equal
      // to its last update), state freed
      input.addData((T(5000), 0L)); q.processAllAvailable()
      input.addData((T(5100), 1L)); q.processAllAvailable()
      val w0 = rows().filter(_._1.getTime == 0L).map(r => (r._2, r._3))
      assert(w0.size === 3, s"expected update,update,final-flush — got $w0")
      assert(w0.last === w0(1)) // the flush re-emits the immutable stat
      // total state is now the ONE live window (5000): bounded by the
      // lateness horizon, not stream lifetime
      val lastState = q.recentProgress.flatMap(_.stateOperators).last
      assert(lastState.numRowsTotal === 1L,
        s"closed window's histogram not freed: ${lastState.numRowsTotal} state rows")
      // straggler BEYOND the bound: dropped, never resurrects a closed
      // window (no 4th row for window 0, no fresh n=1 histogram)
      input.addData((T(100), 3L)); q.processAllAvailable()
      assert(rows().count(_._1.getTime == 0L) === 3)
    } finally q.stop()
  }

  test("mediaDedupAgainstCorpus: streaming media dedup drops corpus dups, keeps novel rows") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (0L, "image", "corpus-item-0".getBytes("UTF-8")),
      (1L, "image", "corpus-item-1".getBytes("UTF-8")))
      .toDF("media_id", "modality", "content")
    val input = MemoryStream[(Long, String, Array[Byte])]
    val media = input.toDF().toDF("media_id", "modality", "content")
    val q = Streams.mediaDedupAgainstCorpus(media, corpus)
      .writeStream.format("memory").queryName("media_dedup")
      .outputMode("append").start()
    try {
      input.addData(
        (100L, "image", "corpus-item-1".getBytes("UTF-8")), // exact corpus dup
        (101L, "image", "novel-a".getBytes("UTF-8")),
        (102L, "image", "novel-b".getBytes("UTF-8")))
      q.processAllAvailable()
      // a later batch: another dup + another novel (stateless per batch)
      input.addData(
        (103L, "image", "corpus-item-0".getBytes("UTF-8")),
        (104L, "image", "novel-c".getBytes("UTF-8")))
      q.processAllAvailable()
      val out = spark.table("media_dedup")
      assert(out.columns.toSeq ===
        Seq("media_id", "modality", "n_bytes", "embedding"),
        "novel rows must carry the MediaFeatures shape (embedding rides along)")
      val ids = out.select(col("media_id")).as[Long].collect().sorted
      assert(ids.toSeq === Seq(101L, 102L, 104L))
    } finally q.stop()
  }

  test("mediaDedupAgainstCorpus: batch parity with mediaNearDupAgainst on the same rows") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = (0L until 4L).map(i =>
      (i, "image", s"corpus-$i".getBytes("UTF-8"))).toDF("media_id", "modality", "content")
    val rows = Seq(
      (10L, "image", "corpus-2".getBytes("UTF-8")),
      (11L, "image", "fresh-x".getBytes("UTF-8")),
      (12L, "image", "fresh-y".getBytes("UTF-8")))
    val input = MemoryStream[(Long, String, Array[Byte])]
    val media = input.toDF().toDF("media_id", "modality", "content")
    val q = Streams.mediaDedupAgainstCorpus(media, corpus)
      .writeStream.format("memory").queryName("media_dedup_parity")
      .outputMode("append").start()
    val streamed = try {
      input.addData(rows: _*)
      q.processAllAvailable()
      spark.table("media_dedup_parity").select(col("media_id"))
        .as[Long].collect().sorted.toSeq
    } finally q.stop()
    val batch = graft.multimodal.Multimodal.mediaNearDupAgainst(
        rows.toDF("media_id", "modality", "content"), corpus)
      .select(col("media_id")).as[Long].collect().sorted.toSeq
    assert(streamed === batch, s"stream $streamed != batch $batch")
  }
}
