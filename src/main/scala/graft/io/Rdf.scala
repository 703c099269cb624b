package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import PartitionedWrite._

/** RDF text sink/source: lines `"s p o ."` in gzip'd, lang-partitioned,
  * sorted text files.
  *
  * Reference behavior (DbpediaDgraphSparkApp.scala:491-542): drop predicates
  * containing `@`/`~` (not allowed by Dgraph), range-partition by
  * `(lang, p, s)` so each part file holds a contiguous predicate/subject
  * range, sort files by `p, s, o`, project to the single text line, gzip.
  * `write` returns the *read-back* of the files just written, so downstream
  * consumers (type generation, coverage stats) read materialized data
  * instead of recomputing the whole lineage — a deliberate
  * common-subexpression boundary that we keep: at 100 TB, re-running the
  * cleanup DAG for each of the 4 downstream consumers would quadruple the
  * work, while the re-read is a cheap columnar-less text scan of the
  * (much smaller, gzip'd) output.
  */
object Rdf {

  /** Predicates containing '@' or '~' are invalid downstream. */
  def validPredicates(df: DataFrame): DataFrame =
    df.where(!col("p").contains("@") && !col("p").contains("~"))

  /** The `"s p o ."` line projection — single definition shared by
    * [[line]] and [[write]] so the format cannot diverge. */
  private def lineColumns: Seq[org.apache.spark.sql.Column] = Seq(
    concat(col("s"), lit(" "), col("p"), lit(" "), col("o"), lit(" .")).as("value"),
    col("lang"))

  /** Render one RDF line per triple: `s p o .` */
  def line(df: DataFrame): DataFrame = df.select(lineColumns: _*)

  /** Write triples as RDF text; returns the read-back of the written files.
    *
    * Empty input deletes any existing output at `path` (divergence from the
    * reference, which skips the write and would silently read back a
    * PREVIOUS run's files from the same path). */
  def write(df: DataFrame, path: String): DataFrame = {
    val spark = df.sparkSession
    val empty = df.isEmpty // one limit-1 job, not two
    if (empty) {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    } else {
      validPredicates(df)
        .writePartitionedBy(
          Seq(col("lang")),          // lang=<code> subdirectory per language
          Seq(col("p"), col("s")),   // one file per (p, s) range
          Seq(col("o")),             // files sorted by p, s, o
          None,
          Some(lineColumns))
        .option("compression", "gzip")
        .mode(SaveMode.Overwrite)
        .text(path)
    }
    read(spark, path)
  }

  /** [[write]] for MANY datasets in ONE Spark job — the stage-2 sink
    * fusion: the per-dataset form pays one job boundary + one
    * range-shuffle per dataset (seven of each in the reference program),
    * and small datasets underfill their tasks. Here every dataset's
    * cleaned triples union into a single range-shuffle on
    * `(dataset, lang, p, s)` (file sizes track the DATA distribution
    * across all datasets at once), gzip text lands under a staging dir
    * partitioned `dataset=<name>/lang=<code>`, and each `dataset=` dir is
    * FS-renamed (a metadata-only move) to the same `<name>.rdf` layout
    * [[write]] produces — per-file sort `(p, s, o)` and read-back
    * contract identical, equality spec-gated (RdfSpec).
    *
    * Per-dataset empty inputs mirror [[write]]: an absent staging dir
    * (no surviving rows) deletes any existing output for that name.
    * Returns the read-back per dataset. */
  def writeAll(
      named: Seq[(String, DataFrame)], outBase: String): Map[String, DataFrame] = {
    require(named.nonEmpty, "writeAll: no datasets given")
    require(named.map(_._1).distinct.size == named.size,
      "writeAll: dataset names must be unique")
    // names become `dataset=<name>` partition dirs and are renamed by
    // LITERAL path below — a name needing Hive escaping (space, '%', '=')
    // would be written escaped and missed by the rename
    named.foreach { case (name, _) =>
      require(name.matches("[A-Za-z0-9_.-]+"),
        s"writeAll: dataset name '$name' must be [A-Za-z0-9_.-]+")
    }
    val spark = named.head._2.sparkSession
    val tagged = named.map { case (name, df) =>
      validPredicates(df).select(
        lit(name).as("dataset"), col("s"), col("p"), col("o"), col("lang"))
    }.reduce(_.unionByName(_))
    val staging = new org.apache.hadoop.fs.Path(s"$outBase/.rdf_fused_staging")
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    tagged.writePartitionedBy(
        Seq(col("dataset"), col("lang")),
        Seq(col("p"), col("s")),
        Seq(col("o")),
        None,
        Some(lineColumns :+ col("dataset")))
      .option("compression", "gzip")
      .mode(SaveMode.Overwrite)
      .text(staging.toString)
    val out = named.map { case (name, _) =>
      val target = new org.apache.hadoop.fs.Path(s"$outBase/$name.rdf")
      val src = new org.apache.hadoop.fs.Path(staging, s"dataset=$name")
      // Pre-existing output is renamed ASIDE, not deleted, until the new
      // data is in place: deleting first meant a failed staging rename
      // destroyed the old output AND stranded the new one (the failure
      // mode the per-dataset write() path avoids via SaveMode.Overwrite's
      // commit protocol). rename reports several FS failure modes as
      // `false`, not an exception — silently reading back an empty or
      // stale dataset must not pass for success.
      val aside = new org.apache.hadoop.fs.Path(s"$outBase/.rdf_old_$name")
      if (fs.exists(aside)) fs.delete(aside, true) // remnant of a past crash
      val hadOld = fs.exists(target)
      if (hadOld)
        require(fs.rename(target, aside), s"writeAll: set-aside $target -> $aside failed")
      if (fs.exists(src) && !fs.rename(src, target)) {
        // restore: leave the OLD output intact — and if the restore ITSELF
        // fails, say where the only surviving copy is stranded so the data
        // stays recoverable by hand instead of hidden behind a dot-path
        val restored = !hadOld || fs.rename(aside, target)
        throw new IllegalArgumentException(
          s"writeAll: rename $src -> $target failed" +
            (if (restored) "" else s"; restore also failed — old output stranded at $aside"))
      }
      if (hadOld) fs.delete(aside, true)
      name -> read(spark, target.toString)
    }.toMap
    fs.delete(staging, true) // _SUCCESS + any empty remnants
    out
  }

  /** Read RDF text back into `(s, p, o, lang)`.
    *
    * Native-expression parse (same rationale as [[Ttl.parse]]): strip the
    * trailing ` .`, split at the first two spaces. The reference does this
    * with a typed map over `(String, String)` (DbpediaDgraphSparkApp.scala:535);
    * we stay in codegen.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    if (ParquetIO.exists(spark, path)) {
      val spo = split(col("value").substr(lit(1), length(col("value")) - 2), " ", 3)
      spark.read.text(path)
        .select(
          element_at(spo, 1).as("s"),
          element_at(spo, 2).as("p"),
          element_at(spo, 3).as("o"),
          col("lang"))
    } else {
      ParquetIO.emptyTriples(spark)
    }
}
