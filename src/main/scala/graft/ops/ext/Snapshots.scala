package graft.ops.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot reconciliation — the maintenance operator behind
  * incremental recrawls: given two snapshots of a document collection,
  * classify every id as `added` / `removed` / `changed` / `same`. The
  * diff drives which documents re-enter the dedup/curation pipeline
  * (added+changed) and which cluster memberships to retire (removed).
  *
  * Scale shape: each side collapses to (id, content-hash) BELOW the
  * full-outer join — 32-byte md5 rows, never document text — so the one
  * shuffle per side carries fixed-width rows and the join is a plain
  * id-keyed merge. At 100 TB both sides partition on id; with bucketed
  * snapshot tables the Exchanges vanish entirely.
  */
object Snapshots {

  /** (idCol, status) for every id present in either snapshot. */
  def diffByContent(
      oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: Column): DataFrame = {
    val o = oldSnap.select(col(idCol), md5(textCol).as("_h_old"))
    val n = newSnap.select(col(idCol), md5(textCol).as("_h_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_h_old").isNull, "added")
          .when(col("_h_new").isNull, "removed")
          .when(col("_h_old") === col("_h_new"), "same")
          .otherwise("changed").as("status"))
  }

  /** Apply a changelog to a base snapshot — the other half of the
    * incremental-recrawl loop ([[diffByContent]] classifies what changed;
    * this materializes the next snapshot from a base plus an
    * upsert/delete log): last-writer-wins per id by `version`, a winning
    * `delete` removes the id, a winning `upsert` (including one issued
    * AFTER a delete — re-adds) carries its payload into the result.
    *
    * Both inputs share the payload schema; base rows participate as
    * implicit `(version = 0, op = 'upsert')`, so every log version must
    * be `> 0`. Versions are the caller's total order per id (crawl
    * timestamp, commit sequence); if the same (id, version) appears twice
    * the winner is still deterministic — the max is taken over the whole
    * `(version, op, payload)` struct, compared lexicographically — but
    * such logs are malformed and the tie-break is not part of the
    * contract.
    *
    * Scale shape: ONE shuffle, on id, with map-side partial aggregation —
    * `max(struct(version, op, payload))` combines within each scan task
    * first, so a log with hot ids (a page re-crawled a million times)
    * collapses before the exchange instead of skewing it. No window, no
    * join: the union never materializes per-id groups on one task beyond
    * the aggregation's own combiner. */
  def applyChangelog(
      base: DataFrame, changelog: DataFrame,
      idCol: String, versionCol: String, opCol: String): DataFrame = {
    val payload = base.columns.filterNot(_ == idCol).toSeq
    val logPayload = changelog.columns.filterNot(
      Set(idCol, versionCol, opCol)).toSeq
    require(payload.sorted == logPayload.sorted,
      s"applyChangelog: base payload ${payload.sorted.mkString(",")} must match " +
        s"changelog payload ${logPayload.sorted.mkString(",")}")
    val b = base.select(col(idCol), lit(0L).as("_v"), lit("upsert").as("_op"),
      struct(payload.map(col): _*).as("_p"))
    val c = changelog.select(col(idCol), col(versionCol).cast("long").as("_v"),
      col(opCol).as("_op"), struct(payload.map(col): _*).as("_p"))
    b.unionByName(c)
      .groupBy(col(idCol))
      .agg(max(struct(col("_v"), col("_op"), col("_p"))).as("_w"))
      .where(col("_w._op") === "upsert")
      .select(col(idCol) +: col("_w._v").as("version") +:
        payload.map(f => col(s"_w._p.$f").as(f)): _*)
  }
}
