package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) source/sink — the interchange format
  * large text corpora actually ship in (one JSON document per line; The
  * Pile, C4, Dolma all distribute this way). Not a reference format (the
  * reference reads ttl and parquet); built because a 100 TB ingest
  * pipeline's first job is usually "read somebody else's JSONL".
  *
  * Design rules for the 100 TB case, enforced by the API:
  *
  *   - **Schema is EXPLICIT, never inferred.** `inferSchema`/`read.json`
  *     without a schema runs a full extra pass over the input to sample
  *     types — a second 100 TB scan before the first real job. Callers
  *     pass the `StructType` they expect; unknown fields are dropped by
  *     the parser (column pruning works: only the requested fields are
  *     even parsed).
  *   - **Corrupt lines are policy, not surprises.** PERMISSIVE mode lands
  *     bad lines in a `_corrupt` column (kept only when `keepCorrupt` —
  *     the audit path); otherwise they parse to all-null rows that
  *     [[readClean]] drops by requiring the id field non-null. A crawl
  *     shard with one truncated line must not kill a day-long job.
  *   - gzip output: JSONL is a text format — write it compressed, one
  *     file per partition, splittable-input concerns documented on
  *     [[write]] (gzip parts are NOT splittable; size partitions before
  *     writing, the same contract as the RDF sink).
  */
object Jsonl {

  /** Read JSONL with an explicit schema. With `keepCorrupt`, unparseable
    * lines surface in a `_corrupt` string column (null for good rows) and
    * parsed columns are null — the audit path; without it the frame has
    * exactly `schema`'s columns. */
  def read(
      spark: SparkSession, path: String, schema: StructType,
      keepCorrupt: Boolean = false): DataFrame = {
    val withCorrupt = if (keepCorrupt)
      schema.add("_corrupt", org.apache.spark.sql.types.StringType)
    else schema
    val df = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
    if (keepCorrupt) df else df.select(schema.fieldNames.map(col).toSeq: _*)
  }

  /** [[read]] then drop rows whose `idField` is null — the "parse failed
    * or the record is junk" filter a clean-ingest path wants. The filter
    * is a pushable IsNotNull, evaluated during the scan. */
  def readClean(
      spark: SparkSession, path: String, schema: StructType,
      idField: String): DataFrame = {
    require(schema.fieldNames.contains(idField),
      s"readClean: idField '$idField' not in schema ${schema.fieldNames.mkString(",")}")
    read(spark, path, schema).where(col(idField).isNotNull)
  }

  /** Write as gzip'd JSONL, optionally partitioned by columns (the
    * lang=/source= layout every other sink here uses). gzip parts are not
    * splittable on re-read — partition count IS the re-read parallelism,
    * so repartition to the intended shard count first (documented, not
    * hidden: this sink never repartitions behind the caller's back). */
  def write(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).option("compression", "gzip")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).json(path)
  }
}
