package graft.io

import java.nio.file.{Files, Path => JPath}

import graft.SparkSpec

class DiscoverySpec extends SparkSpec {

  /** Builds a release tree:
    *   base/rel/core/de:  labels_de.ttl, infobox_properties_de.ttl,
    *                      labels_en_uris_de.ttl, README, noext
    *   base/rel/core/en:  labels_en.ttl
    *   base/rel/core/xyz: labels_xyz.ttl            (3-char lang: valid)
    *   base/rel/core/toolong: labels_toolong.ttl    (dir name too long)
    */
  private def mkTree(): JPath = {
    val base = Files.createTempDirectory("graft_discovery")
    def write(rel: String, lines: String*): Unit = {
      val p = base.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, String.join("\n", lines: _*).getBytes("UTF-8"))
    }
    write("rel/core/de/labels_de.ttl", "<s1> <p> \"Labelde\" .")
    write("rel/core/de/infobox_properties_de.ttl", "<s1> <prop> \"v\" .")
    write("rel/core/de/labels_en_uris_de.ttl", "<s1en> <p> \"LabelEnUris\" .")
    write("rel/core/de/README", "not a ttl")
    write("rel/core/de/noext.ttl", "<s> <p> \"no underscore in name\" .")
    write("rel/core/en/labels_en.ttl", "<s2> <p> \"Labelen\" .")
    write("rel/core/xyz/labels_xyz.ttl", "<s3> <p> \"Labelxyz\" .")
    write("rel/core/toolong/labels_toolong.ttl", "<s4> <p> \"skip\" .")
    base
  }

  test("languages: 2-3 char subdirectories, sorted; missing dir is empty") {
    val base = mkTree().toString
    assert(Discovery.languages(spark, base, "rel", "core") === Seq("de", "en", "xyz"))
    assert(Discovery.languages(spark, base, "nope", "core") === Seq.empty)
  }

  test("datasets: ttl names minus lang suffix, en_uris companions excluded") {
    val base = mkTree().toString
    // "noext.ttl" has no '_' -> skipped (the reference would throw);
    // labels_en_uris_de.ttl strips to labels_en_uris -> excluded
    assert(Discovery.datasets(spark, base, "rel", "core")
      === Seq("infobox_properties", "labels"))
  }

  test("langPaths: existing files only; en_uris companion only when en requested") {
    val base = mkTree().toString
    val langs = Discovery.languages(spark, base, "rel", "core")
    val (main, enUris) = Discovery.langPaths(spark, base, "rel", "core", "labels", langs)
    assert(main.map(_._1) === Seq("de", "en", "xyz"))
    assert(main.forall { case (l, ps) => ps == Seq(s"$base/rel/core/$l/labels_$l.ttl") })
    assert(enUris.map(_._1) === Seq("de")) // only de has the companion file
    // without en among the languages the companion list is empty
    val (_, noEn) = Discovery.langPaths(spark, base, "rel", "core", "labels", Seq("de", "xyz"))
    assert(noEn === Seq.empty)
  }

  test("runDiscovered wires discovery into the ttl->parquet stage") {
    val base = mkTree().toString
    val out = Files.createTempDirectory("graft_discovery_out").resolve("labels.parquet").toString
    val n = graft.pipeline.TtlToParquet.runDiscovered(spark, base, "rel", "core", "labels", out)
    assert(n === 4) // de + en + xyz + the en-de companion row
    val langs = spark.read.parquet(out).select("lang").distinct()
      .collect().map(_.getString(0)).sorted
    assert(langs === Array("de", "en", "en-de", "xyz"))
  }
}
