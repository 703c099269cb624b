package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Keyed session state for [[Streams.sessionizeWithState]] (top-level so
  * the state encoder codegen sees a plain public product type). */
case class SessionState(nEvents: Long, start: Long, last: Long)

/** Per-id winner state for [[Streams.applyChangelogStream]] (top-level
  * for the state encoder, like [[SessionState]]). */
case class LatestVersion(version: Long, op: String, text: String)

/** Per-user funnel progression state for [[Streams.funnelStream]]. */
case class FunnelState(depth: Int, reachedMs: Long)

/** Per-group Misra–Gries counter state for
  * [[Streams.heavyHittersStream]] — the bounded `<= k`-entry counter map
  * (plain Strings: state encoders need a public product of encodable
  * fields; the byte-order subtleties of the batch aggregate's UTF8String
  * keys don't matter here because candidates are an unordered SET). */
case class MgGroupState(counters: Map[String, Long])

/** Current per-stratum weighted-sample picks: (skey, id, weight),
  * ascending (skey, id) — ≤ k entries by construction. */
case class TopKState(picks: Seq[(Long, Long, Long)])

/** Per-window bin histogram for [[Streams.ksDriftStream]]: `bins` longs
  * per window — bounded by construction, never by stream volume. */
case class KsBinState(counts: Seq[Long])

/** Structured Streaming duals of the batch event ops
  * ([[graft.ops.ext.Events]]): tumbling-window aggregation with watermarked
  * late-data handling, session windows, and custom keyed state via
  * `flatMapGroupsWithState`.
  *
  * The reference has no streaming at all (SURVEY §2.10) — this is the
  * north-star extension surface. Everything here is incremental-state
  * hash aggregation: one shuffle on the grouping key per micro-batch,
  * state store partitioned the same way, so a 1000-executor cluster scales
  * by key cardinality, not stream volume.
  */
object Streams {

  /** Event row contract for the typed stateful ops. */
  case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  /** Per-user session summary emitted by [[sessionizeWithState]]. */
  case class SessionSummary(user_id: Long, n_events: Long, start: Timestamp, end: Timestamp)

  /** Tumbling-window count/sum per event type; late events beyond the
    * watermark are dropped instead of growing state forever. */
  def tumblingAgg(events: DataFrame, window: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Gap-based session windows (built-in `session_window`): sessions close
    * when no event arrives for `gap`; watermark bounds state. */
  def sessionWindows(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** Custom keyed state: per-user sessionization with explicit timeout —
    * the `flatMapGroupsWithState` shape for semantics `session_window`
    * can't express (e.g. emitting a summary exactly when a session closes).
    *
    * The event-time timeout REQUIRES a watermark on `ts`, so this operator
    * applies its own (`watermark`) instead of relying on the caller to
    * remember — an un-watermarked input would fail at query start. */
  def sessionizeWithState(
      events: Dataset[Event], gapMs: Long, watermark: String): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(userId, s.nEvents, new Timestamp(s.start), new Timestamp(s.last)))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionSummary]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(nEvents = s.nEvents + 1, last = t))
                case Some(s) =>
                  closed ::= SessionSummary(userId, s.nEvents, new Timestamp(s.start), new Timestamp(s.last))
                  cur = Some(SessionState(1, t, t))
                case None =>
                  cur = Some(SessionState(1, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // clamp: a timeout below the current watermark throws and
              // kills the query (possible when a user's late events trail
              // the global watermark by more than the gap)
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
  }

  /** Per-user funnel progress emitted by [[funnelStream]]. */
  case class FunnelProgress(user_id: Long, depth: Long, completed: Boolean)

  /** Streaming dual of [[graft.ops.ext.Events.funnel]]: per-user funnel
    * depth maintained in keyed state and re-emitted whenever it
    * advances (run in `update` mode). Each micro-batch's events are
    * processed in ts order per user; the state is `(depth, reach time)`
    * — one small row per user, the batch operator's exact per-user
    * bound.
    *
    * Ordering caveat (the honest streaming contract): within a batch
    * the ts sort reproduces batch semantics exactly, but an event
    * arriving in a LATER batch with an EARLIER timestamp than the
    * current reach time cannot retroactively advance a stalled funnel
    * the way a batch recompute would — streaming progression is
    * append-only. In-order streams match [[graft.ops.ext.Events.funnel]]
    * row for row (spec-held). */
  def funnelStream(
      events: Dataset[Event], steps: Seq[String]): Dataset[FunnelProgress] = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"funnelStream: steps must be non-empty and distinct, got $steps")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelProgress](GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            if (s.depth < steps.length && e.event_type == steps(s.depth) &&
                (s.depth == 0 || e.ts.getTime > s.reachedMs)) {
              s = FunnelState(s.depth + 1, e.ts.getTime)
            }
          }
          state.update(s)
          FunnelProgress(userId, s.depth.toLong, s.depth == steps.length)
      }
  }

  /** Changelog entry contract for [[applyChangelogStream]]. */
  case class LogEntry(doc_id: Long, version: Long, op: String, text: String)

  /** Streaming dual of [[graft.ops.ext.Snapshots.applyChangelog]]: a
    * live materialized view over an upsert/delete changelog stream. Each
    * micro-batch emits, for every id that received entries, the id's
    * CURRENT winner — last-writer-wins by version with the batch
    * operator's exact tie-break (max over `(version, op, text)`), kept in
    * keyed state so late, out-of-order, and re-delivered entries resolve
    * identically to a batch replay. A winning `delete` is emitted as a
    * tombstone row (`op = 'delete'`) for the sink to apply; a later
    * upsert re-emits the id.
    *
    * Run in `update` output mode. State is one small row per live id,
    * partitioned on the id like every keyed state op here — stream
    * volume only affects per-batch work, not state growth. No timeout:
    * a changelog's ids stay addressable forever (callers wanting
    * retention can clear state downstream of a snapshot compaction). */
  def applyChangelogStream(log: Dataset[LogEntry]): Dataset[LogEntry] = {
    val spark = log.sparkSession
    import spark.implicits._
    // the batch operator's max(struct) compares strings as UTF8String
    // BYTES (code-point order); Scala's Ordering.String compares UTF-16
    // code units, which disagrees when a (version, op) tie is broken by
    // payloads mixing supplementary and U+E000–U+FFFF characters
    // (round-9 advice). Compare through UTF8String so a malformed
    // duplicate-version log resolves identically to a batch replay.
    val utf8: Ordering[String] = (x: String, y: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y))
    implicit val ord: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering.Long, utf8, utf8)
    log.groupByKey(_.doc_id)
      .mapGroupsWithState[LatestVersion, LogEntry](GroupStateTimeout.NoTimeout()) {
        (id: Long, rows: Iterator[LogEntry], state: GroupState[LatestVersion]) =>
          val candidates = state.getOption.map(s =>
            LogEntry(id, s.version, s.op, s.text)).iterator ++ rows
          val w = candidates.maxBy(e => (e.version, e.op, e.text))
          state.update(LatestVersion(w.version, w.op, w.text))
          LogEntry(id, w.version, w.op, w.text)
      }
  }

  /** Streaming exact dedup: drop rows whose `idCols` were already seen,
    * with watermark-bounded state (late duplicates beyond the watermark are
    * not caught — that's the state/recall trade every streaming dedup
    * makes). The streaming dual of
    * [[graft.ops.ext.Dedup.exactDupGroups]]. */
  def dedup(events: DataFrame, watermark: String, idCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates(idCols :+ "ts")

  /** Streaming NEAR-duplicate dedup: drop documents whose MinHash band was
    * already seen inside the watermark window — the streaming dual of the
    * batch LSH candidate suppression
    * ([[graft.ops.ext.Dedup.lshCandidatePairs]]). The band is computed
    * map-side by the codegen'd [[graft.functions.TokenMinhashExpr]]
    * kernel, so state is keyed by a 32-byte hash — document text never
    * enters the state store. `dropDuplicatesWithinWatermark` evicts band
    * state once the watermark passes, bounding it by stream rate x window
    * (a plain `dropDuplicates` on the band would grow state forever).
    * Recall mirrors the batch operator: only single-band collisions are
    * suppressed.
    *
    * `tsCol` names the event-time column the watermark is applied to
    * (default `"ts"`, the events-table convention). Null `textCol` rows all
    * hash to the same null `_band`, so within one watermark window only the
    * first null-text row survives — filter nulls upstream if they must all
    * pass. */
  def nearDupDedup(
      docs: DataFrame, textCol: String,
      watermark: String, numHashes: Int = 2, tsCol: String = "ts"): DataFrame =
    docs
      .withColumn("_band", bandKey(col(textCol), numHashes))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("_band")
      .drop("_band")

  /** Streaming URL-level dedup: the streaming dual of
    * [[graft.ops.ext.Web.dedupByUrl]]. State is keyed by the canonical URL
    * (a short string, never the document text) and evicted once the
    * watermark passes. FIRST-ARRIVAL wins — processing order, not the
    * batch operator's min-id election; a replay in a different arrival
    * order may keep a different copy of the same page, the determinism
    * trade every streaming dedup here makes (see [[dedup]]). */
  def urlDedup(
      docs: DataFrame, urlCol: String,
      watermark: String, tsCol: String = "ts"): DataFrame =
    docs
      .withColumn("_canon", graft.ops.ext.Web.canonicalUrl(col(urlCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("_canon")
      .drop("_canon")

  /** The single-band MinHash key both streaming dedup ops join/dedup on —
    * one definition so within-stream and against-corpus dedup can never
    * key differently (and stay compatible with signature tables built
    * from the same kernel). */
  private def bandKey(c: Column, numHashes: Int): Column = md5(array_join(
    graft.functions.TokenMinhashExpr.token_minhash(c, numHashes), "|"))

  /** Streaming incremental dedup against a STANDING corpus: drop stream
    * documents whose MinHash band key matches the static corpus's key set
    * — the streaming dual of [[graft.ops.ext.Dedup.dedupAgainstCorpus]]
    * (ingestion-time novelty gate). The stream-static anti join is
    * STATELESS — no state store, no watermark needed; the corpus side
    * contributes only its DISTINCT band keys (at scale: read straight
    * from the bucketed signature tables, [[graft.io.Bucketing]]), never
    * text. Compose with [[nearDupDedup]] upstream to also suppress
    * within-stream duplicates. */
  def dedupAgainstCorpusStream(
      docs: DataFrame, textCol: String,
      corpus: DataFrame, corpusTextCol: String,
      numHashes: Int = 2): DataFrame = {
    val keys = corpus.select(bandKey(col(corpusTextCol), numHashes).as("_band")).distinct()
    docs
      .withColumn("_band", bandKey(col(textCol), numHashes))
      .join(broadcast(keys), Seq("_band"), "left_anti")
      .drop("_band")
  }

  /** Streaming Hamming near-dup filter: drop stream documents whose
    * simhash lands within `maxDist` bits of ANY signature in a STATIC
    * reference set — the streaming dual of
    * [[graft.ops.ext.Dedup.simhashHammingPairs]], for the ingestion-time
    * "don't admit near-copies of the golden/eval set" gate.
    *
    * Shape: the reference collapses map-side to its DISTINCT 8-byte
    * signatures (boilerplate families collapse to one row); the stream row
    * computes its signature with the same codegen kernel and a stateless
    * broadcast LEFT ANTI join confirms `bit_count(xor) <= maxDist` per
    * (row, reference signature) — no watermark, no state store. Like
    * [[decontaminate]], the probe is O(|reference signatures|) per stream
    * row: right for golden/eval-set-sized references (10^4-10^6 rows), NOT
    * for corpus-vs-corpus Hamming dedup — run the batch operator's block
    * banding for that. */
  def simhashDedupStream(
      docs: DataFrame, textCol: String,
      reference: DataFrame, referenceTextCol: String,
      maxDist: Int = 3, bits: Int = 32): DataFrame = {
    import graft.ops.ext.Dedup
    val sigs = reference
      .select(Dedup.simhashText(col(referenceTextCol), bits).as("_ref_sim"))
      .distinct()
    docs
      .withColumn("_sim", Dedup.simhashText(col(textCol), bits))
      .join(broadcast(sigs),
        bit_count(col("_sim").bitwiseXOR(col("_ref_sim"))) <= maxDist,
        "left_anti")
      .drop("_sim")
  }

  /** Streaming media dedup against a static corpus — the
    * [[graft.multimodal.Multimodal.mediaNearDupAgainst]] dual on an
    * append stream (the first thing a crawl ingest does with image
    * bytes). STATELESS: each stream row decodes once in the
    * `mapPartitions` batch (codec init amortized per partition —
    * exactly the batch plumbing), reduces to (features, SRP bucket)
    * map-side, and a stream-static LEFT ANTI join against the broadcast
    * corpus feature table — bucket equality plus the exact cosine
    * confirm in the join condition — drops near-dups. No watermark, no
    * state store. Emits the NOVEL rows'
    * [[graft.multimodal.Multimodal.MediaFeatures]] shape (id, modality,
    * n_bytes, embedding) — the embedding rides along for downstream
    * ANN/indexing instead of being recomputed. Corpus-vs-corpus media
    * dedup belongs to the batch ops (`mediaNearDupPairs` /
    * `mediaNearDupAgainst`), which cap degenerate buckets; the
    * broadcast probe here is the eval-set/standing-index trade. */
  def mediaDedupAgainstCorpus(
      media: DataFrame, corpus: DataFrame,
      dims: Int = 16, planes: Int = 8, threshold: Double = 0.9,
      codec: graft.multimodal.Multimodal.MediaCodec =
        graft.multimodal.Multimodal.StubCodec): DataFrame = {
    import graft.multimodal.Multimodal
    import graft.ops.ext.Similarity
    // the corpus features materialize ONCE at query build (eager
    // checkpoint): each microbatch reads the blocks, never re-decodes
    // the standing corpus — the decontaminateBloom static-side rule
    val corp = Multimodal.extractFeatures(corpus, dims, codec).toDF()
      .select(col("embedding").as("_c_vec"),
        Similarity.srpBucket(col("embedding"), planes).as("_c_bkt"))
      .localCheckpoint(true)
    val feats = Multimodal.extractFeatures(media, dims, codec).toDF()
      .withColumn("_bkt", Similarity.srpBucket(col("embedding"), planes))
    feats.join(broadcast(corp),
        col("_bkt") === col("_c_bkt") &&
          Similarity.cosineSafe(col("embedding"), col("_c_vec")) >= threshold,
        "left_anti")
      .drop("_bkt")
  }

  /** Streaming benchmark decontamination: drop stream documents sharing
    * any token n-gram with a STATIC benchmark set — the streaming dual of
    * [[graft.ops.ext.Contamination.decontaminate]].
    *
    * Shape: each stream row carries its n-gram hash ARRAY (computed
    * map-side, same 60-bit currency as the batch op); a stream-static
    * LEFT ANTI join on `array_contains` keeps document granularity with
    * zero streaming state — no watermark needed against a static side.
    * The contains-join broadcasts the benchmark and probes per (row,
    * benchmark n-gram), which is the right trade for eval-set-sized
    * benchmarks (~10^4-10^6 n-grams); it is NOT for corpus-vs-corpus
    * decontamination (run the batch op for that). */
  def decontaminate(
      docs: DataFrame, textCol: String,
      benchmark: DataFrame, benchmarkTextCol: String, n: Int = 8): DataFrame = {
    import graft.ops.ext.Contamination
    val bench = benchmark
      .select(explode(Contamination.tokenNgrams(col(benchmarkTextCol), n)).as("ng"))
      .select(Contamination.ngramHash(col("ng")).as("ngh"))
      .distinct()
    docs
      .withColumn("_nghs", Contamination.ngramHashes(col(textCol), n))
      .join(broadcast(bench), array_contains(col("_nghs"), col("ngh")), "left_anti")
      .drop("_nghs")
  }

  /** [[decontaminate]] with the batch path's Bloom prefilter
    * ([[graft.ops.ext.Contamination.decontaminateBloom]]'s bit test as a
    * per-ROW `exists` fold): the contains anti join probes per
    * (row × benchmark n-gram) — O(|benchmark|) per stream row — so on a
    * mostly-clean stream nearly all of that work is wasted. The Bloom
    * word array ships as a plan literal and each row tests its OWN
    * n-gram hashes against it (O(tokens) bit math, codegen'd); a Bloom
    * filter has no false negatives, so bloom-negative rows are PROVEN
    * clean and bypass the nested-loop probe entirely — only
    * bloom-positive rows (true hits + ~0.4% false positives) reach the
    * exact confirm join. Both branches are stateless; their union is the
    * same append stream [[decontaminate]] emits, row for row (NULL text
    * pins the fold to false via `coalesce`, keeping the row — the same
    * null-keeps-the-row contract as the contains join).
    *
    * The benchmark hash set is collected once at query BUILD (a static
    * side — same driver bound as [[decontaminate]]'s broadcast). */
  def decontaminateBloom(
      docs: DataFrame, textCol: String,
      benchmark: DataFrame, benchmarkTextCol: String, n: Int = 8): DataFrame = {
    import graft.ops.ext.Contamination
    val spark = benchmark.sparkSession
    import spark.implicits._
    val hashes = benchmark
      .select(explode(Contamination.ngramHashes(col(benchmarkTextCol), n)).as("ngh"))
      .distinct().collect().map(_.getLong(0))
    // sizing identical to the batch op: ~32 bits/element, power of two
    val target = math.min(1L << 29, math.max(64L, hashes.length.toLong * 32))
    val mBits = java.lang.Long.highestOneBit(target * 2 - 1).toInt
    val words = Contamination.bloomBuild(hashes, mBits)
    val bench = hashes.toSeq.toDF("ngh")
    val probed = docs
      .withColumn("_nghs", Contamination.ngramHashes(col(textCol), n))
      .withColumn("_maybe", coalesce(
        exists(col("_nghs"), h => Contamination.bloomMightContain(h, words, mBits)),
        lit(false)))
    val clean = probed.where(!col("_maybe"))
    val suspect = probed.where(col("_maybe"))
      .join(broadcast(bench), array_contains(col("_nghs"), col("ngh")), "left_anti")
    clean.unionByName(suspect).drop("_nghs", "_maybe")
  }

  /** The streaming slice of the curation pipeline
    * ([[graft.pipeline.Curation]]): the per-row and stream-safe stages —
    * PII gate, within-stream near-dup dedup (watermark-bounded band
    * state), standing-corpus dedup (stream-static anti join), benchmark
    * decontamination (stream-static anti join) — composed into one
    * ingestion stream. The corpus-LEVEL stages (source gating, global
    * exact dedup, cluster closure) need full-corpus aggregation and stay
    * batch: run them in the nightly pass, and feed the resulting corpus
    * signature table back in as `corpus` here.
    *
    * Stage order mirrors the batch pipeline's rationale: the stateless
    * per-row gate first, then the stateful within-stream dedup (smallest
    * state), then the two static anti joins. Decontamination is the
    * Bloom-prefiltered form ([[decontaminateBloom]]) — row-identical to
    * the exact stream, but proven-clean rows skip the nested-loop
    * benchmark probe. */
  def curateStream(
      docs: DataFrame, textCol: String,
      corpus: DataFrame, corpusTextCol: String,
      benchmark: DataFrame, benchmarkTextCol: String,
      watermark: String, numHashes: Int = 2, n: Int = 8,
      tsCol: String = "ts"): DataFrame = {
    import graft.ops.ext.TextStats
    val piiFree = docs.where(
      size(regexp_extract_all(col(textCol), lit(TextStats.EmailRe), lit(0))) === 0 &&
        size(regexp_extract_all(col(textCol), lit(TextStats.Ipv4Re), lit(0))) === 0 &&
        size(regexp_extract_all(col(textCol), lit(TextStats.PhoneRe), lit(0))) === 0)
    decontaminateBloom(
      dedupAgainstCorpusStream(
        nearDupDedup(piiFree, textCol, watermark, numHashes, tsCol),
        textCol, corpus, corpusTextCol, numHashes),
      textCol, benchmark, benchmarkTextCol, n)
  }

  /** Streaming dual of [[graft.ops.ext.TextStats.qualityGate]]: the same
    * composed Gopher/CCNet rule stack (length, alphabetic ratio, PII,
    * repetition, optional corpus-relative unigram rarity) over an
    * ingestion stream, emitting the same `quality` verdict struct. The
    * scan-bound signals are the IDENTICAL Column expressions (shared via
    * `withScanSignals` — the two forms cannot score differently); the
    * corpus-relative rarity signal scores against a STATIC reference
    * corpus (yesterday's curated corpus, the same pattern as
    * [[dedupAgainstCorpusStream]]'s standing signature set):
    *
    *  - at query BUILD the corpus's top-V vocabulary and token total are
    *    collected once (bounded by `rarityTopV` — the model bound, like
    *    [[decontaminateBloom]]'s bit words) and pre-divided into per-word
    *    rarity scores;
    *  - per stream row, tokens come from the SHARED Column tokenizer and
    *    are scored in a typed `mapPartitions` against the broadcast map —
    *    O(1) hash lookups per token. A pure-Column map literal would be
    *    a linear O(V) scan per lookup ([[graft.multimodal.Multimodal]]'s
    *    codec boundary is the same pattern: per-partition init, Scala hot
    *    loop, Column plumbing around it).
    *
    * Stateless end to end — no watermark, no state store; every verdict
    * is integer math, identical to the batch gate's. */
  /** Streaming DSIR scoring: every arriving document scored under a
    * model trained OFFLINE on a reference corpus
    * ([[graft.ops.ext.Importance.trainDsir]]) — the online half of
    * distribution-matched ingestion (keep crawl documents that resemble
    * the target as they arrive). Delegates to the SAME
    * [[graft.ops.ext.Importance.applyDsir]] projection the batch path
    * uses — one stateless map-side fold per row against the broadcast
    * literal weight table, so batch and stream can never score
    * differently; buckets the model never saw (unseen vocabulary is
    * routine on a live stream) take the model's smoothing default. */
  def dsirScoreStream(
      docs: DataFrame, textCol: String, idCol: String,
      model: graft.ops.ext.Importance.DsirModel): DataFrame =
    graft.ops.ext.Importance.applyDsir(docs, col(textCol), idCol, model)

  /** Streaming PER-GROUP heavy-hitter CANDIDATES — the live dual of the
    * [[graft.functions.MisraGriesAgg]] typed aggregate
    * ([[graft.ops.ext.TextStats.heavyHittersBy]]'s sketch phase): one
    * bounded `k`-counter Misra–Gries summary per group key, maintained in
    * keyed state across micro-batches by the classic streaming update
    * (count if tracked or free, else decrement all). Each batch emits the
    * group's CURRENT candidate array (sorted) — a SUPERSET of every token
    * above `1/(k+1)` of the group's stream so far, the same guarantee the
    * batch sketch gives (which extras survive is arrival-order-dependent,
    * there as here). Run in `update` mode; exact confirmation needs a
    * batch pass over stored data ([[graft.ops.ext.TextStats
    * .heavyHittersBy]]) — a stream cannot recount history it dropped.
    *
    * State is `<= k` short strings per group — bounded by construction,
    * never by stream volume; no timeout (a group's hitters stay
    * addressable; clear state downstream of a re-aggregation if
    * retention is needed). Tokenization matches [[graft.ops.ext
    * .TextStats.tokens]] (trim + split `\s+`). */
  def heavyHittersStream(
      docs: DataFrame, textCol: String, groupCol: String, k: Int): DataFrame = {
    require(k >= 1, s"heavyHittersStream: k must be >= 1, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(groupCol).cast("string").as("g"),
        col(textCol).cast("string").as("t"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[MgGroupState, (String, Seq[String])](
        GroupStateTimeout.NoTimeout()) {
        (g: String, rows: Iterator[(String, String)], state: GroupState[MgGroupState]) =>
          val sk = new graft.functions.MisraGriesAgg.Sketch(k)
          state.getOption.foreach(_.counters.foreach { case (w, c) =>
            sk.counters.update(
              org.apache.spark.unsafe.types.UTF8String.fromString(w), c)
          })
          // NULL text contributes no tokens — `explode(tokens(text))`
          // parity with the batch path (empty text still yields one ""
          // token, also matching the batch tokenizer)
          rows.foreach { case (_, t) =>
            if (t != null) t.trim.split("\\s+").foreach(w =>
              sk.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
          }
          state.update(MgGroupState(
            sk.counters.map { case (u, c) => u.toString -> c }.toMap))
          (g, sk.counters.keysIterator.map(_.toString).toSeq.sorted)
      }
      .toDF(groupCol, "candidates")
  }

  /** Streaming per-stratum weighted sampling — the live dual of
    * [[graft.ops.ext.Sampling.weightedSampleStratifiedAgg]]: maintain
    * the CURRENT k weighted picks per stratum as documents arrive
    * (sample maintenance over live ingestion — "a fresh quality-weighted
    * subsample of everything seen so far", the streaming sibling of the
    * batch sampler's one-shot cut).
    *
    * The A-Res keys come from the SHARED
    * [[graft.ops.ext.Sampling.withAresKey]] Column derivation and fold
    * into the SAME bounded heap ([[graft.functions.TopKByKeyAgg.Heap]])
    * kept in keyed state — so unlike the Misra–Gries dual this is EXACT:
    * the k smallest keys under a total order are arrival-order-
    * independent, and each batch's emitted picks equal the batch
    * sampler run over the stream's prefix (spec-asserted). Run in
    * `update` mode. State: 3·k longs per stratum — bounded by
    * construction, never by stream volume. */
  def weightedSampleStream(
      docs: DataFrame, idCol: String, stratumCol: String, weightCol: Column,
      k: Int, seed: Long): DataFrame = {
    require(k >= 1, s"weightedSampleStream: k must be >= 1, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    graft.ops.ext.Sampling.withAresKey(docs, idCol, weightCol, seed, "skey")
      .select(col(stratumCol).cast("string").as("g"), col("skey"),
        col(idCol).cast("long").as("id"), col("_w"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[TopKState, (String, Seq[(Long, Long, Long)])](
        GroupStateTimeout.NoTimeout()) {
        (g: String, rows: Iterator[(String, Long, Long, Long)],
            state: GroupState[TopKState]) =>
          val h = new graft.functions.TopKByKeyAgg.Heap(k)
          state.getOption.foreach(_.picks.foreach { case (s, i, w) => h.add(s, i, w) })
          rows.foreach { case (_, s, i, w) => h.add(s, i, w) }
          val picks = (0 until h.size)
            .map(j => (h.keys(j), h.ids(j), h.pays(j)))
            .sortBy(e => (e._1, e._2))
          state.update(TopKState(picks))
          (g, picks)
      }
      .toDF(stratumCol, "picks")
  }

  /** One [[ksDriftStream]] row: the window's CURRENT sample size and KS
    * distance (ppm) from the standing-corpus baseline. */
  case class KsWindow(window_start: Timestamp, n_values: Long, ks_ppm: Long)

  /** Streaming distribution-drift monitor — the live dual of
    * [[graft.pipeline.Reports.ksDistance]]: per tumbling window, the
    * binned two-sample KS distance between the window's value
    * distribution and a standing-corpus [[graft.pipeline.Reports
    * .KsBaseline]] trained offline. The ingestion alarm a crawl
    * pipeline wants: "this hour's documents are not drawn from the
    * distribution we trained the curation thresholds on".
    *
    * Keyed state per window is the `bins`-entry histogram — bounded by
    * construction, never by stream volume (the heavyHittersStream
    * shape). Each micro-batch re-emits the window's current
    * `(n, ks_ppm)` via the SHARED [[graft.pipeline.Reports.ksStat]]
    * fold (run in `update` mode), so after any prefix the emitted row
    * equals the batch statistic over that prefix exactly — KS over a
    * histogram is arrival-order-independent, making this dual EXACT
    * like the weighted sampler, not candidate-approximate like
    * Misra–Gries (spec-asserted batch parity). Values are non-negative
    * by the batch contract; stray negatives clamp to bin 0 rather than
    * crash a long-running query.
    *
    * Retention: PER-window state is bounded, but closed windows keep
    * their histogram (NoTimeout, the heavyHittersStream contract) so a
    * straggler can still update its window's statistic; a deployment
    * running for months should use [[ksDriftStreamBounded]], the
    * event-time-timeout fork that frees windows older than a
    * late-data bound. */
  def ksDriftStream(
      rows: DataFrame, tsCol: String, valueCol: Column,
      windowMs: Long, baseline: graft.pipeline.Reports.KsBaseline): Dataset[KsWindow] = {
    require(windowMs >= 1, s"ksDriftStream: windowMs must be >= 1, got $windowMs")
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .select(col(tsCol).cast("timestamp").as("ts"), valueCol.cast("long").as("v"))
      // family-wide malformed-row policy (clamp-or-drop, never crash a
      // long-running query): null VALUES drop, and so must null
      // TIMESTAMPS — one null ts used to NPE in `ts.getTime` inside
      // groupByKey and kill the query (round-12 ADVICE)
      .where(col("ts").isNotNull && col("v").isNotNull)
      .as[(Timestamp, Long)]
      .groupByKey { case (ts, _) =>
        Math.floorDiv(ts.getTime, windowMs) * windowMs
      }
      .mapGroupsWithState[KsBinState, KsWindow](GroupStateTimeout.NoTimeout()) {
        (wstart: Long, batch: Iterator[(Timestamp, Long)], state: GroupState[KsBinState]) =>
          val counts = state.getOption
            .map(_.counts.toArray)
            .getOrElse(new Array[Long](baseline.bins))
          batch.foreach { case (_, v) =>
            val b = math.min(baseline.bins - 1L,
              math.max(0L, Math.floorDiv(v, baseline.binWidth))).toInt
            counts(b) += 1L
          }
          state.update(KsBinState(counts.toSeq))
          val (n, ks) = graft.pipeline.Reports.ksStat(counts, baseline)
          KsWindow(new Timestamp(wstart), n, ks)
      }
  }

  /** [[ksDriftStream]] with BOUNDED total state — the event-time-timeout
    * fork the unbounded form's scaladoc prescribes for deployments that
    * run for months: a window's histogram is freed once the watermark
    * (event time minus `lateness`) passes the window end, instead of
    * being retained forever for arbitrarily-late stragglers.
    *
    * Semantics vs the unbounded form: identical for every row within
    * the lateness bound (same clamp-or-drop malformed-row policy, same
    * shared [[graft.pipeline.Reports.ksStat]] fold, update-mode
    * re-emission per micro-batch). At the timeout the window emits one
    * FINAL row (a closure marker equal to the last update — downstream
    * sees "this window's statistic is now immutable") and its state is
    * removed. A straggler arriving after its window closed is dropped
    * without resurrecting state: a fresh one-row histogram would
    * silently misreport an already-finalized window, the same
    * first-write-wins reasoning as the dedup streams. Total state is
    * therefore `bins` longs × only the windows inside the lateness
    * horizon — bounded by time, not stream lifetime. */
  def ksDriftStreamBounded(
      rows: DataFrame, tsCol: String, valueCol: Column, windowMs: Long,
      baseline: graft.pipeline.Reports.KsBaseline, lateness: String): Dataset[KsWindow] = {
    require(windowMs >= 1, s"ksDriftStreamBounded: windowMs must be >= 1, got $windowMs")
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .select(col(tsCol).cast("timestamp").as("ts"), valueCol.cast("long").as("v"))
      .where(col("ts").isNotNull && col("v").isNotNull)
      .withWatermark("ts", lateness)
      .as[(Timestamp, Long)]
      .groupByKey { case (ts, _) =>
        Math.floorDiv(ts.getTime, windowMs) * windowMs
      }
      .flatMapGroupsWithState[KsBinState, KsWindow](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (wstart: Long, batch: Iterator[(Timestamp, Long)], state: GroupState[KsBinState]) =>
          if (state.hasTimedOut) {
            // final flush: re-emit the closed window's immutable stat,
            // then free the histogram
            val counts = state.get.counts.toArray
            state.remove()
            val (n, ks) = graft.pipeline.Reports.ksStat(counts, baseline)
            Iterator.single(KsWindow(new Timestamp(wstart), n, ks))
          } else if (!state.exists &&
              wstart + windowMs <= math.max(0L, state.getCurrentWatermarkMs())) {
            // post-closure straggler: its window already emitted a final
            // row — do not resurrect a fresh (and wrong) one-row
            // histogram, independent of whether the exec-level late-data
            // filter caught it first
            Iterator.empty
          } else {
            val counts = state.getOption
              .map(_.counts.toArray)
              .getOrElse(new Array[Long](baseline.bins))
            batch.foreach { case (_, v) =>
              val b = math.min(baseline.bins - 1L,
                math.max(0L, Math.floorDiv(v, baseline.binWidth))).toInt
              counts(b) += 1L
            }
            state.update(KsBinState(counts.toSeq))
            // free the histogram when the watermark passes the window
            // end; clamped above the current watermark or the set throws
            // and kills the query (the sessionizer's clamp)
            state.setTimeoutTimestamp(
              math.max(wstart + windowMs, state.getCurrentWatermarkMs() + 1))
            val (n, ks) = graft.pipeline.Reports.ksStat(counts, baseline)
            Iterator.single(KsWindow(new Timestamp(wstart), n, ks))
          }
      }
  }

  /** Streaming C4 line cleaning — live page scrubbing as documents
    * arrive (the ingestion-side placement the batch operator's Scaladoc
    * prescribes: boilerplate lines die BEFORE anything downstream prices
    * them). Stateless map-side delegate to the SAME
    * [[graft.ops.ext.TextStats.c4LineFilter]] lambda, so batch and
    * stream can never clean differently. */
  def c4CleanStream(
      docs: DataFrame, textCol: String, minWords: Int = 3, minLines: Int = 1,
      badSubstrings: Seq[String] = Seq("javascript", "lorem ipsum", "{")): DataFrame =
    graft.ops.ext.TextStats.c4LineFilter(
      docs, col(textCol), minWords, minLines, badSubstrings)

  /** Streaming IVF cell assignment — the EMBEDDING-side sibling of
    * [[dsirScoreStream]]/[[nbScoreStream]]: every arriving vector is
    * assigned to its coarse cell under a quantizer trained OFFLINE
    * ([[graft.ops.ext.Similarity.trainIvfSeed]]). Live index routing
    * (which cell/shard an arriving embedding belongs to) and drift
    * monitoring (cell shares over time windows) both hang off this.
    * Stateless map-side fold against the plan-literal centroids;
    * delegates to the SAME [[graft.ops.ext.Similarity.assignCells]] the
    * batch index build uses, so batch and stream can never assign
    * differently. */
  def ivfAssignStream(
      embeds: DataFrame, model: graft.ops.ext.Similarity.IvfModel): DataFrame =
    graft.ops.ext.Similarity.assignCells(embeds, model)

  /** Streaming SEMANTIC decontamination — the embedding-side sibling of
    * [[decontaminate]]: arriving vectors within cosine `minCos` of any
    * benchmark embedding are dropped before they reach downstream state.
    * Stateless delegate to the SAME broadcast left-anti short-circuit
    * join ([[graft.ops.ext.Contamination.semanticDecontaminate]]), so
    * batch and stream can never disagree on what leaks. */
  def semanticDecontaminateStream(
      vectors: DataFrame, vecCol: String,
      benchmark: DataFrame, benchVecCol: String, minCos: Double): DataFrame =
    graft.ops.ext.Contamination.semanticDecontaminate(
      vectors, col(vecCol), benchmark, col(benchVecCol), minCos)

  /** Streaming NB classification: every arriving document scored under
    * a model trained OFFLINE ([[graft.ops.ext.TextStats.trainNb]]) —
    * the fastText-classifier half of live ingestion (route/drop crawl
    * documents by domain/quality class as they arrive). Delegates to
    * the map-side [[graft.ops.ext.TextStats.applyNb]] fold (no explode,
    * no join, no shuffle), so batch and stream can never score
    * differently; out-of-vocabulary tokens contribute nothing, exactly
    * as in the batch scorer. */
  def nbScoreStream(
      docs: DataFrame, textCol: String, idCol: String,
      model: graft.ops.ext.TextStats.NbModel): DataFrame =
    graft.ops.ext.TextStats.applyNb(docs, col(textCol), idCol, model)

  def qualityGateStream(
      docs: DataFrame, textCol: String,
      t: graft.ops.ext.TextStats.QualityThresholds,
      rarityCorpus: Option[DataFrame] = None,
      corpusTextCol: String = "text"): DataFrame = {
    import graft.ops.ext.TextStats
    val base = TextStats.withScanSignals(docs, col(textCol), t)
    t.maxMeanRarity match {
      case Some(mx) =>
        val corpus = rarityCorpus.getOrElse(throw new IllegalArgumentException(
          "qualityGateStream: maxMeanRarity set but no rarityCorpus given"))
        val spark = docs.sparkSession
        val ct = col(corpusTextCol)
        // corpus total via the byte-walk kernel (spec'd size(split)
        // parity; the q76 precedent) — not an interpreted corpus re-split
        val nTotal = corpus
          .agg(sum(TextStats.tokenCount(ct)).cast("long")).head().getLong(0)
        val maxRar = t.rarityScale * nTotal
        // per-word rarity pre-divided driver-side: (scale*N) div c — the
        // same integer arithmetic as the batch unigramRarity
        val vocab: Map[String, Long] = corpus
          .select(explode(TextStats.tokens(ct)).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("w")).limit(t.rarityTopV)
          .collect().map(r => r.getString(0) -> maxRar / r.getLong(1)).toMap
        val bv = spark.sparkContext.broadcast(vocab)
        val withToks = base.withColumn("_toks", TextStats.tokens(col(textCol)))
        val toksIdx = withToks.schema.fieldIndex("_toks")
        val outSchema = withToks.schema
          .add("_rsum", org.apache.spark.sql.types.LongType)
          .add("_rtok", org.apache.spark.sql.types.LongType)
        val scored = withToks.mapPartitions { rows =>
          val m = bv.value
          rows.map { r =>
            val toks = r.getSeq[String](toksIdx)
            var s = 0L
            toks.foreach(w => s += m.getOrElse(w, maxRar))
            org.apache.spark.sql.Row.fromSeq(r.toSeq :+ s :+ toks.length.toLong)
          }
        }(org.apache.spark.sql.Encoders.row(outSchema))
        TextStats.foldSignals(scored.drop("_toks"),
          col("_rsum") <= col("_rtok") * mx) // 0 <= 0 for token-free rows
      case None =>
        TextStats.foldSignals(
          base.withColumn("_rsum", lit(null).cast("long"))
            .withColumn("_rtok", lit(null).cast("long")),
          lit(true))
    }
  }

  /** Watermarked stream-stream inner join: events enriched with the other
    * stream's rows for the same key within `window` of event time. Both
    * sides carry watermarks so join state is bounded — the required shape
    * for unbounded stream-stream joins. */
  def streamStreamJoin(
      left: DataFrame, right: DataFrame,
      key: String, watermark: String, window: String): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r = right
      .withColumnRenamed("ts", "r_ts")
      .withColumnRenamed(key, s"r_$key")
      .withWatermark("r_ts", watermark)
    l.join(r,
      col(key) === col(s"r_$key") &&
        col("r_ts") >= col("ts") - expr(s"INTERVAL $window") &&
        col("r_ts") <= col("ts") + expr(s"INTERVAL $window"))
  }

  /** Streaming sink through the batch partitioned writer: each micro-batch
    * of the events stream lands as batch/date-partitioned sorted parquet
    * via `foreachBatch`.
    *
    * Replay-idempotent: the batchId is a partition column and the write is
    * a DYNAMIC partition overwrite, so a batch reprocessed after a failure
    * replaces its own partition instead of appending a duplicate copy
    * (plain append would give at-least-once duplication). */
  def writePartitionedStream(
      events: DataFrame,
      path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.io.PartitionedWrite._
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch
          .withColumn("batch_id", lit(batchId))
          .withColumn("event_date", to_date(col("ts")).cast("string"))
          .writePartitionedBy(Seq(col("batch_id"), col("event_date")),
            Seq(col("user_id")), Seq(col("ts")))
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .parquet(path)
      }
      .start()
  }

  /** File-source event stream over the testdata events table — the
    * readStream entry point mirroring the batch `spark.read.parquet`.
    * The table's `ts` encoding has varied across testdata generations
    * (TIMESTAMP(NANOS) → nanos long under the legacy flag; later
    * TIMESTAMP(MICROS, ntz) → TIMESTAMP_NTZ), so the stream schema is
    * sniffed from a one-off batch read of the existing files and `ts` is
    * normalized to a session-zone TIMESTAMP the same way the batch-side
    * `SparkEntry.events` does. */
  /** Streaming ANN retrieval — the online-serving dual of
    * [[graft.ops.ext.Similarity.cosineTopK]] (and, with `planes > 0`, of
    * its SRP-prefiltered form): each arriving query vector gets its
    * top-k nearest corpus neighbors as `(q_id, n_id, rnk)` rows, ranked
    * by `(cosine desc, n_id asc)` with the batch op's exact semantics
    * (self-match excluded; zero-norm cosine pinned to -1 below every
    * real score; NaN ordered greatest, as Spark orders doubles).
    *
    * Shape: STATELESS append — no watermark, no state store, no window
    * (rank windows are unsupported on append streams, and a streaming
    * groupBy would hold unbounded state). The standing index is
    * collected and broadcast ONCE at query build — the standing-index /
    * eval-set trade [[decontaminate]] and [[mediaDedupAgainstCorpus]]
    * document (right for 10^4–10^6 vectors; corpus-scale retrieval
    * belongs to the batch ops `ivfTopK`/`ivfPqTopK` on a persisted
    * index). Each stream row scores only its SRP bucket's candidates
    * when `planes > 0` (bucket computed by the SAME
    * [[graft.ops.ext.Similarity.srpBucket]] kernel COLUMN on both
    * sides, so stream and index can never bucket differently; a query
    * whose bucket is empty emits nothing — the same same-bucket-only
    * recall trade as `srpBucketedTopK`), or the whole index when
    * `planes = 0` (exact, `cosineTopK` parity spec-held).
    *
    * Ids are cast to long and vectors to `array<double>` on both sides
    * (floats widen losslessly). Malformed rows never kill the query:
    * a NULL id drops the row (both sides — a streaming Long id has no
    * null seat, and the batch op's null-id rank group is not a retrieval
    * contract anyone consumes), a NULL vec scores as the empty vector —
    * zero norm, cosine pinned to -1 below every real score, exactly
    * [[graft.ops.ext.Similarity.cosineSafe]]'s coalesce behavior. */
  def annTopKStream(
      queries: DataFrame, corpus: DataFrame, k: Int, planes: Int = 0,
      idOut: String = "q_id", nIdOut: String = "n_id"): DataFrame = {
    import graft.ops.ext.Similarity
    val spark = corpus.sparkSession
    import spark.implicits._
    require(k >= 1, s"annTopKStream: k must be >= 1, got $k")
    def prep(df: DataFrame, id: String) = {
      val vecD = coalesce(
        col("vec").cast("array<double>"), array().cast("array<double>"))
      df.where(col("id").isNotNull).select(
        col("id").cast("long").as(id),
        vecD.as("_v"),
        (if (planes > 0) Similarity.srpBucket(vecD, planes)
         else lit(0L)).as("_bkt"))
    }
    val index: Map[Long, Array[(Long, Array[Double])]] =
      prep(corpus, "id").as[(Long, Seq[Double], Long)].collect()
        .groupBy(_._3)
        .map { case (b, rows) => b -> rows.map(r => (r._1, r._2.toArray)) }
    val bv = spark.sparkContext.broadcast(index)
    // cosine desc (NaN greatest, like Spark's double ordering — cosines
    // are +0.0-normalized upstream so TotalOrdering's -0.0 < 0.0 split
    // can't diverge from SQL's -0.0 == 0.0), ties break n_id asc —
    // compared directly, never via negation (-Long.MinValue overflows)
    val ord = new Ordering[(Long, Double)] {
      def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = Ordering.Double.TotalOrdering.compare(b._2, a._2)
        if (c != 0) c else java.lang.Long.compare(a._1, b._1)
      }
    }
    prep(queries, idOut).as[(Long, Seq[Double], Long)]
      .flatMap { case (qId, qv, bkt) =>
        val q = qv.toArray
        var nq = 0.0
        var i = 0
        while (i < q.length) { nq += q(i) * q(i); i += 1 }
        val cands = bv.value.getOrElse(bkt, Array.empty[(Long, Array[Double])])
        cands.iterator
          .filter(_._1 != qId)
          .map { case (nId, nv) =>
            var d = 0.0; var nn = 0.0
            val len = math.min(q.length, nv.length)
            var j = 0
            while (j < len) { d += q(j) * nv(j); j += 1 }
            j = 0
            while (j < nv.length) { nn += nv(j) * nv(j); j += 1 }
            val denom = math.sqrt(nq) * math.sqrt(nn)
            // + 0.0 normalizes a -0.0 cosine to +0.0 (IEEE: -0.0 + 0.0
            // = 0.0) so the in-memory total order matches SQL's
            (nId, (if (denom == 0.0) -1.0 else d / denom) + 0.0)
          }
          .toArray.sorted(ord).iterator.take(k).zipWithIndex
          .map { case ((nId, _), r) => (qId, nId, r + 1) }
      }
      .toDF(idOut, nIdOut, "rnk")
  }

  /** Streaming incremental connected components — the
    * [[graft.ops.ext.Components.connectedComponentsIncremental]] dual on
    * an append stream of EDGES (near-dup pairs, entity-match pairs):
    * every micro-batch folds into a standing labeling. Connectivity is a
    * GLOBAL property — a new edge can merge any two components — so it
    * cannot live in Structured Streaming's keyed state stores; the
    * correct shape is `foreachBatch` over a versioned snapshot table,
    * which this sink provides: snapshots land as
    * `labelsDir/batch=<id>/` parquet `(id, comp)`, each derived from
    * the latest COMPLETE (`_SUCCESS`-marked) predecessor via the batch
    * operator.
    *
    * Exactly-once: a replayed batch id whose snapshot already carries
    * `_SUCCESS` is skipped (the engine only ever replays the last
    * uncommitted batch); a torn write has no `_SUCCESS`, is never read
    * back, and the replay overwrites it. Old snapshots become garbage
    * the moment a newer `_SUCCESS` exists — retention is the caller's
    * cadence (keep ≥1 prior for time travel / audit).
    *
    * Scale shape, per batch: ONE scan of the latest label snapshot
    * against the broadcast edge batch (the corpus-scale table never
    * shuffles — the batch operator's contract), a batch-bounded
    * contracted CC (driver-finish-sized by construction), and one
    * snapshot write. The full-snapshot rewrite is the parquet-table
    * trade: right for the minutes-to-nightly triggers entity resolution
    * runs at, and swap-in replaceable by a transactional table format's
    * MERGE where one is deployed.
    *
    * Usage:
    * {{{
    * edges.writeStream
    *   .option("checkpointLocation", cp)
    *   .foreachBatch(Streams.connectedComponentsSink(labelsDir))
    *   .start()
    * }}} */
  def connectedComponentsSink(
      labelsDir: String,
      srcCol: String = "id_a",
      dstCol: String = "id_b",
      maxIter: Int = 20,
      writeManifests: Boolean = false): (Dataset[org.apache.spark.sql.Row], Long) => Unit =
    (batch, batchId) => {
      val spark = batch.sparkSession
      val fs = new org.apache.hadoop.fs.Path(labelsDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val target = new org.apache.hadoop.fs.Path(labelsDir, s"batch=$batchId")
      if (!fs.exists(new org.apache.hadoop.fs.Path(target, "_SUCCESS"))) {
        val prior = latestCcLabels(spark, labelsDir, Some(batchId))
          .getOrElse {
            val idType = batch.schema(srcCol).dataType
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("id", idType),
                org.apache.spark.sql.types.StructField("comp", idType))))
          }
        // persist the micro-batch: the incremental operator counts it
        // for the broadcast-bound guard and then reads it for the
        // resolve + contraction joins — without this, every streaming
        // batch source is re-read once per consumer (the operator's
        // scaladoc asks exactly this of callers)
        val edges = batch.toDF().persist()
        try
          graft.ops.ext.Components
            .connectedComponentsIncremental(prior, edges,
              srcCol, dstCol, maxIter)
            .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .parquet(target.toString)
        finally edges.unpersist(false)
      }
      // optional per-snapshot audit manifest (graft.io.Manifest) — the
      // restore-boundary artifact. Written AFTER the parquet commit and
      // derived purely from the on-disk snapshot, so a crash between the
      // two heals on replay: `_SUCCESS` without `_manifest.jsonl` just
      // rewrites the manifest (one snapshot-sized scan), never the data.
      if (writeManifests &&
          fs.exists(new org.apache.hadoop.fs.Path(target, "_SUCCESS")) &&
          !fs.exists(new org.apache.hadoop.fs.Path(target, "_manifest.jsonl")))
        graft.io.Manifest.writeForParquetDir(spark, target.toString).unpersist()
    }

  /** The latest COMPLETE label snapshot under `labelsDir` (written by
    * [[connectedComponentsSink]]), or None before the first batch
    * commits. `before` bounds the search to batch ids strictly below it
    * (the sink passes its own id, so a torn write of the current batch
    * can never shadow its true predecessor). */
  def latestCcLabels(
      spark: SparkSession, labelsDir: String,
      before: Option[Long] = None): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(labelsDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    val done = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val name = st.getPath.getName
        if (name.startsWith("batch=")) scala.util.Try(
          name.stripPrefix("batch=").toLong).toOption else None
      }
      .filter(id => before.forall(id < _))
      .filter(id => fs.exists(new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(root, s"batch=$id"), "_SUCCESS")))
    // basePath pins the read to ONE snapshot dir without hive-partition
    // discovery swallowing the batch= segment
    done.sorted.lastOption.map(id => spark.read
      .option("basePath", s"$labelsDir/batch=$id")
      .parquet(s"$labelsDir/batch=$id"))
  }

  /** Retention for [[connectedComponentsSink]] snapshots: keeps the
    * newest `keep` COMPLETE snapshots, deletes every older complete one
    * plus any INCOMPLETE (torn-write) snapshot older than the newest
    * complete. Nothing at or newer than the newest complete snapshot is
    * ever touched EXCEPT by completeness: an incomplete dir newer than
    * it is the current batch possibly mid-write — left alone; the torn
    * leftovers a replay already superseded are the ones reclaimed.
    * Returns the deleted batch ids (sorted). Run it from the same
    * `foreachBatch` cadence or a nightly janitor — the sink itself never
    * deletes (time travel and audit are the caller's retention policy,
    * [[connectedComponentsSink]] scaladoc). */
  def pruneCcSnapshots(
      spark: SparkSession, labelsDir: String, keep: Int = 2): Seq[Long] = {
    require(keep >= 1, s"pruneCcSnapshots: keep must be >= 1, got $keep")
    val root = new org.apache.hadoop.fs.Path(labelsDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val snaps = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val name = st.getPath.getName
        if (name.startsWith("batch=")) scala.util.Try(
          name.stripPrefix("batch=").toLong).toOption.map(_ -> st.getPath)
        else None
      }
    val complete = snaps.collect {
      case (id, p) if fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")) => id
    }.sorted
    if (complete.isEmpty) return Seq.empty
    val newestComplete = complete.last
    val keepIds = complete.takeRight(keep).toSet
    val doomed = snaps.filter { case (id, p) =>
      val isComplete = complete.contains(id)
      (isComplete && !keepIds.contains(id)) ||
        (!isComplete && id < newestComplete)
    }.sortBy(_._1)
    doomed.foreach { case (_, p) => fs.delete(p, true) }
    doomed.map(_._1)
  }

  def readEventStream(spark: SparkSession, eventsDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchSchema = spark.read.parquet(eventsDir).schema
    val raw = spark.readStream
      .schema(batchSchema)
      .parquet(eventsDir) // file source requires a directory of parquet files
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
