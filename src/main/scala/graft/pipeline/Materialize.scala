package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.io.Manifest
import graft.ops.ext.{Packing, TextStats}

/** The last mile of a training-data pipeline: turn a curated corpus into
  * on-disk training shards — deterministically shuffled, sequence-packed,
  * shard-partitioned, manifested. Everything upstream (dedup, gating,
  * decontamination) decides WHAT trains; this decides WHERE each document
  * lands, reproducibly: the same corpus, seed, and geometry always
  * produce byte-identical shard assignments (asserted in the spec via the
  * manifest's content checksums).
  *
  * Composition (each stage is an already-gated operator):
  *  1. [[Packing.shuffleOrder]] — seeded identity-hash global order, the
  *     corpus shuffle step (two-phase distributed rank, no global window);
  *  2. [[Packing.sequenceLayout]] — pack each stratum's token stream into
  *     `seqLen`-token sequences in that order (distributed prefix sum);
  *  3. shard id = `seq_first div seqsPerShard` — consecutive sequences
  *     form one shard, so a shard is a contiguous slice of the training
  *     stream and epoch ordering is just shard-id ordering;
  *  4. a `partitionBy(shard)` parquet write, rows sorted by position
  *     within each shard, plus [[Manifest.writeForParquetDir]].
  *
  * Scale shape: document text crosses exactly two exchanges — the join
  * attaching the shuffle order (id-keyed) and the shard-keyed write
  * repartition. The layout itself runs on narrow `(ord, stratum, n)`
  * rows; the manifest is one scan of the written output.
  */
object Materialize {

  /** Write `docs` as packed training shards under `outDir`; returns the
    * per-shard summary `(stratum, shard, n_docs, n_tokens)` ordered by
    * (stratum, shard). Shards are per-stratum: each stratum packs its
    * own token stream (the [[Packing.sequenceLayout]] contract), so a
    * multilingual corpus yields per-language shard sequences.
    *
    * `writeManifest` (default ON — the shards ARE the artifact a
    * transfer or restore touches) lands a `_manifest.jsonl` with
    * per-file row counts and order-insensitive content checksums;
    * [[Manifest.verifyParquetDir]] later audits a restored shard tree
    * per-file without re-reading row data. The manifest's per-shard-dir
    * row counts equal the returned summary's `n_docs` — spec-held
    * (MaterializeSpec), the same count-equivalence contract as the RDF
    * sinks' manifest audit. */
  def trainingShards(
      docs: DataFrame, textCol: Column, idCol: String, stratumCol: String,
      seqLen: Long, seqsPerShard: Long, seed: Long,
      outDir: String, writeManifest: Boolean = true): DataFrame = {
    require(seqsPerShard >= 1,
      s"trainingShards: seqsPerShard must be >= 1, got $seqsPerShard")
    val spark = docs.sparkSession
    val base = docs
      .withColumn("_text", textCol)
      .withColumn("_n", TextStats.tokenCount(textCol).cast("long"))
      .select(col(idCol).cast("long").as("id"),
        col(stratumCol).cast("string").as("stratum"),
        col("_text").as("text"), col("_n").as("n_tok"))
    val order = Packing.shuffleOrder(docs, idCol, seed).select(col("id"), col("ord"))
    val withOrd = base.join(order, Seq("id"))
    val layout = Packing.sequenceLayout(
        withOrd.select(col("ord").as("id"), col("stratum"), col("n_tok")),
        "id", "stratum", "n_tok", seqLen)
      .select(col("id").as("ord"), col("seq_first"), col("seq_last"),
        col("off_start"), col("n_seqs"))
    withOrd.join(layout, Seq("ord"))
      .withColumn("shard", expr(s"seq_first div ${seqsPerShard}L"))
      .repartition(col("stratum"), col("shard"))
      .sortWithinPartitions(col("stratum"), col("shard"), col("ord"))
      .write.mode("overwrite").partitionBy("stratum", "shard").parquet(outDir)
    // unpersist: the manifest frame registers a persist marker for its
    // own write-then-return contract; the summary below re-reads the
    // written files (it needs n_tok sums the manifest doesn't carry)
    if (writeManifest) Manifest.writeForParquetDir(spark, outDir).unpersist()
    spark.read.parquet(outDir)
      .groupBy(col("stratum"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .orderBy(col("stratum"), col("shard"))
  }
}
