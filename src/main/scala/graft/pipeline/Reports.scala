package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.ext.{Contamination, Dedup}

/** Corpus health reporting — the dashboard numbers a curation run is
  * steered by, computed as ONE composed query instead of five ad-hoc
  * scans. */
object Reports {

  /** Per-source corpus report card: document and token counts, exact-dup
    * rate, benchmark-contamination rate, and alphabetic ratio — each in
    * integer basis points (engine-exact). The at-a-glance table that
    * decides which sources get gated, re-crawled, or re-weighted.
    *
    * Scale shape: all per-doc signals (token count, char counts, content
    * hash, n-gram hashes) are map-side; the dup election shuffles 16-byte
    * content hashes and joins back on the SAME key (exchange reuse); the
    * contamination flag is [[Contamination.contaminationHits]]' broadcast-
    * benchmark probe; the final rollup partial-aggregates to one row per
    * source per task. Nothing shuffles document text.
    *
    * Output, one row per source: `(source, n_docs, n_tokens, dup_bp,
    * contam_bp, alpha_bp)`, all BIGINT. */
  def sourceReport(
      docs: DataFrame,
      textCol: Column,
      idCol: String,
      sourceCol: String,
      benchmark: DataFrame,
      benchmarkText: Column,
      n: Int = 8): DataFrame = {
    val base = docs.select(
      col(sourceCol).as("source"),
      col(idCol).as("_id"),
      size(Dedup.tokens(textCol)).cast("long").as("_ntok"),
      length(textCol).cast("long").as("_nchar"),
      graft.functions.AlphaCountExpr.alpha_count(textCol).cast("long").as("_nalpha"),
      md5(textCol).as("_h"))
    val firsts = base.groupBy(col("_h")).agg(min(col("_id")).as("_keep"))
    val hits = Contamination
      .contaminationHits(docs, textCol, idCol, benchmark, benchmarkText, n)
      .select(col(idCol).as("_id"), lit(1L).as("_contam"))
    base.join(firsts, Seq("_h"))
      .join(hits, Seq("_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_ntok")).as("n_tokens"),
        sum((col("_id") =!= col("_keep")).cast("long")).as("_ndup"),
        coalesce(sum(col("_contam")), lit(0L)).as("_ncontam"),
        sum(col("_nchar")).as("_nc"),
        sum(col("_nalpha")).as("_na"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("_ndup * 10000 div n_docs").as("dup_bp"),
        expr("_ncontam * 10000 div n_docs").as("contam_bp"),
        when(col("_nc") > 0, expr("_na * 10000 div _nc"))
          .otherwise(lit(0L)).as("alpha_bp"))
  }
}
