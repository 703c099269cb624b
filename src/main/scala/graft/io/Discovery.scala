package graft.io

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem auto-discovery of a DBpedia release layout
  * (`base/release/dataset/<lang>/<name>_<lang>.ttl`) — what a user gets by
  * pointing the engine at a release directory with no explicit language or
  * dataset lists.
  *
  * Hadoop-FS port of the reference's `java.io.File` listing
  * (DbpediaToParquetSparkApp.scala:113-135): works on any Hadoop
  * filesystem (HDFS, S3A, local), where the reference only worked on
  * local disk — the same portability fix as [[ParquetIO.exists]].
  * Deliberate divergences, each noted inline: results are sorted (the
  * reference inherits filesystem listing order for languages), files
  * without `_` are skipped (the reference throws on `substring(0, -1)`),
  * and missing per-language files are filtered out rather than failing
  * the whole read.
  */
object Discovery {

  private def list(spark: SparkSession, path: Path): Seq[FileStatus] = {
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.listStatus(path).toSeq else Seq.empty
  }

  private def exists(spark: SparkSession, path: Path): Boolean =
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)

  /** Language codes: the 2- or 3-char subdirectories of
    * `base/release/dataset` (reference :113-119). Sorted for a
    * deterministic processing order. Missing directory -> empty. */
  def languages(spark: SparkSession, base: String, release: String, dataset: String): Seq[String] =
    list(spark, new Path(new Path(base, release), dataset))
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => n.length == 2 || n.length == 3)
      .sorted

  /** Dataset names: `<name>_<lang>.ttl` entries inside the language
    * directories with the `_<lang>` suffix stripped, distinct and sorted.
    * `*_en_uris` companions are excluded (reference :121-135 — they are
    * loaded alongside their parent dataset, language-tagged `en-<lang>`,
    * not as datasets of their own). An entry may be a plain file (the
    * reference's download layout) OR a directory of part files — the shape
    * any Spark text sink produces, which `spark.read.text` consumes
    * transparently; the reference's `isFile` check would silently skip an
    * entire Spark-written release. */
  def datasets(spark: SparkSession, base: String, release: String, dataset: String): Seq[String] =
    list(spark, new Path(new Path(base, release), dataset))
      .filter(s => s.isDirectory && {
        val n = s.getPath.getName; n.length == 2 || n.length == 3
      })
      .flatMap(d => list(spark, d.getPath))
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".ttl") && n.contains("_"))
      .map(n => n.substring(0, n.lastIndexOf("_")))
      .filter(!_.endsWith("_en_uris"))
      .distinct
      .sorted

  /** Per-language ttl paths for one dataset `name` — the two path lists
    * [[graft.pipeline.TtlToParquet.run]] takes. The second list is the
    * `en_uris` companion files (`<name>_en_uris_<lang>.ttl`, tagged
    * `en-<lang>` downstream), read only when `en` is among the requested
    * languages — reference DbpediaToParquetSparkApp.scala:70-81. Only
    * files that exist are returned. */
  def langPaths(
      spark: SparkSession,
      base: String, release: String, dataset: String,
      name: String,
      langs: Seq[String]): (Seq[(String, Seq[String])], Seq[(String, Seq[String])]) = {
    val dsDir = new Path(new Path(base, release), dataset)
    val main = langs.flatMap { lang =>
      val p = new Path(new Path(dsDir, lang), s"${name}_$lang.ttl")
      if (exists(spark, p)) Some(lang -> Seq(p.toString)) else None
    }
    val enUris =
      if (langs.contains("en"))
        langs.flatMap { lang =>
          val p = new Path(new Path(dsDir, lang), s"${name}_en_uris_$lang.ttl")
          if (exists(spark, p)) Some(lang -> Seq(p.toString)) else None
        }
      else Seq.empty
    (main, enUris)
  }
}
