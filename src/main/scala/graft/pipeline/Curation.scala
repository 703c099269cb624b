package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.ext.{Components, Contamination, Dedup, TextStats}

/** The composed end-to-end curation pass a training-data pipeline runs
  * over a raw corpus — the capstone proving the individual operators
  * compose into one multi-stage plan:
  *
  *  1. SOURCE GATE — drop whole sources failing corpus-level quality
  *     thresholds ([[TextStats.goodSources]]; C4's "bad domains" pass)
  *  2. PII GATE — drop documents containing any email/IPv4/phone match
  *     ([[TextStats]] patterns; count-free early filter)
  *  3. EXACT DEDUP — one keeper (min id) per identical-text group
  *     ([[Dedup.exactDupGroups]])
  *  4. NEAR-DUP CLUSTERS — MinHash-band candidate pairs under the
  *     degenerate-bucket guard, closed into components; keep each
  *     cluster's min-id canonical ([[Dedup.lshCandidatePairs]] +
  *     [[Components.dedupClusters]])
  *  5. DECONTAMINATE — drop documents sharing any token n-gram with the
  *     benchmark set ([[Contamination.decontaminate]])
  *
  * Returns the surviving documents (all input columns), EAGERLY
  * materialized (checkpoint-backed): the pipeline runs when `curate`
  * is called, which lets it release its internal stage-3 cache before
  * returning — no graft-owned cache entries outlive the call. Stage order
  * matters and is deliberate: cheap whole-source and per-row gates run
  * before the (shuffling) dedup stages so the pair machinery sees the
  * smallest possible corpus, and decontamination runs LAST so a dropped
  * near-duplicate can't shield its surviving canonical from the
  * benchmark check.
  *
  * Scale shape: stages 1-2 are scan-bound with one source-cardinality
  * aggregation; stage 3 shuffles 16-byte content hashes; stage 4 is the
  * guarded band join (pairs linear in corpus under the cap) plus the
  * endpoint-only component rounds; stage 5 explodes corpus n-grams
  * map-side into a broadcast. No stage materializes the corpus more than
  * its own shuffle requires.
  */
object Curation {

  def curate(
      docs: DataFrame,
      textCol: Column,
      idCol: String,
      sourceCol: String,
      benchmark: DataFrame,
      minDocs: Long = 20,
      minAlphaBp: Int = 8000,
      numHashes: Int = 2,
      maxBucketSize: Int = 1000,
      n: Int = 8,
      gate: Option[TextStats.QualityThresholds] = None,
      keepBest: Boolean = false): DataFrame = {

    // 1. source gate: survivor sources broadcast into a semi join
    val gated = docs.join(
      broadcast(TextStats.goodSources(docs, textCol, sourceCol, minDocs, minAlphaBp)),
      Seq(sourceCol), "left_semi")

    // 2. per-document gate: PII-only by default; with `gate` set, the
    // composed quality stack ([[TextStats.qualityFilter]] — length,
    // alpha ratio, PII, repetition, optional rarity) replaces it. Both
    // forms are per-row filters over the source-gated frame (the
    // composed gate's optional rarity pass aggregates over it once).
    val piiFree = gate match {
      case Some(th) => TextStats.qualityFilter(gated, textCol, idCol, th)
      case None => gated.where(
        size(regexp_extract_all(textCol, lit(TextStats.EmailRe), lit(0))) === 0 &&
          size(regexp_extract_all(textCol, lit(TextStats.Ipv4Re), lit(0))) === 0 &&
          size(regexp_extract_all(textCol, lit(TextStats.PhoneRe), lit(0))) === 0)
    }

    // 3. exact dedup: keep the min-id document of each identical-text group
    val keepers = Dedup.exactDupGroups(piiFree, col(idCol), textCol)
      .select(col("keeper").as(idCol))
    // cached: this is the reuse point — the signature kernel, the
    // component vertices, the near-dup semi join, and the decontamination
    // scan all read it; uncached, stages 1-3 re-execute once per consumer.
    // MEMORY_AND_DISK so an over-memory corpus degrades to spill, not OOM;
    // unpersisted deterministically below once the survivors materialize,
    // so repeated curate() calls in one session cannot accumulate cached
    // corpora.
    val exactDeduped = piiFree.join(keepers, Seq(idCol), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 4. near-dup clusters: guarded band pairs -> components -> keepers.
    // Default keeps each cluster's min-id canonical; `keepBest` instead
    // elects the highest-token-count member ([[Components.representatives]]
    // — keep the longest/cleanest copy, not whichever crawled first)
    val sig = Dedup.withMinhashSignature(exactDeduped, textCol, numHashes)
    val pairs = Dedup.lshCandidatePairs(sig, idCol,
      (0 until numHashes).map(i => s"mh$i"), maxBucketSize = Some(maxBucketSize))
    val clusters = Components.dedupClusters(exactDeduped, pairs, idCol)
    val canonical =
      if (keepBest) {
        val quality = exactDeduped.select(col(idCol),
          size(Dedup.tokens(textCol)).cast("long").as("score"))
        Components.representatives(clusters, quality, idCol)
          .where(col("kept") === 1L)
          .select(col(idCol))
      } else {
        clusters
          .where(col(idCol) === col("canonical_id"))
          .select(col(idCol))
      }
    val nearDeduped = exactDeduped.join(canonical, Seq(idCol), "left_semi")

    // 5. decontaminate against the benchmark.
    // The survivors are materialized eagerly (localCheckpoint — same
    // treatment Packing/ExactSubstr give their reuse points) so the
    // stage-3 cache can be released before returning: curate() owns the
    // persist, so curate() must own the unpersist — leaving it to the
    // session's next clearCache leaks one corpus-sized cache entry per
    // call in a long-lived session. The returned frame is checkpoint-
    // backed (survivor-sized, typically a small fraction of the corpus);
    // a caller that is fully done with it can free those blocks too via
    // [[graft.core.Checkpoints.release]].
    val lazySurvivors = Contamination.decontaminate(nearDeduped, textCol, idCol,
      benchmark, textCol, n)
    val survivors = lazySurvivors.localCheckpoint(true)
    // free the stage-3 cache AND the component loop's final-round
    // checkpoint (a LogicalRDD leaf inside the lazy plan) — with the
    // survivors materialized, nothing reads either again. Caller-supplied
    // frames are excluded: docs/benchmark may themselves be checkpoint-
    // backed (e.g. a previous curate's output), and those blocks are the
    // caller's only copy.
    graft.core.Checkpoints.releaseExcept(lazySurvivors, docs, benchmark)
    exactDeduped.unpersist(false)
    survivors
  }
}
