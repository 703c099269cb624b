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
}
