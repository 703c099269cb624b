package graft.ops.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WebSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    val spark2 = spark
    import spark2.implicits._
    urls.toDF("url").select(Web.canonicalUrl(col("url"))).as[String].collect().toSeq
  }

  test("canonicalUrl collapses scheme/www/query/fragment/trailing-slash variants") {
    assert(canon(
      "HTTPS://WWW.Example.COM/Wiki/Page?utm_source=x#sec",
      "http://example.com/Wiki/Page/",
      "https://example.com/Wiki/Page"
    ).distinct === Seq("example.com/Wiki/Page"))
  }

  test("canonicalUrl keeps path case, ports, and bare hosts") {
    assert(canon("http://Example.com") === Seq("example.com"))
    assert(canon("https://Example.com:8080/A/b") === Seq("example.com:8080/A/b"))
    // only ONE trailing slash and ONE www. prefix are stripped
    assert(canon("http://www.www.example.com/a//") === Seq("www.example.com/a/"))
    // root path: "/" strips to the bare host, same as no path
    assert(canon("http://example.com/") === Seq("example.com"))
  }

  test("extractUrls finds every URL in document order, stopping at whitespace") {
    val spark2 = spark
    import spark2.implicits._
    val out = Seq("see http://a.com/x and HTTPS://B.org, plus ftp://no")
      .toDF("text").select(Web.extractUrls(col("text"))).as[Seq[String]].head()
    // ",", like any non-whitespace, is legal URL-path material — the
    // matcher is crawl-grade; here B.org has no path so the host regex
    // stops at the comma. ftp is not matched.
    assert(out === Seq("http://a.com/x", "HTTPS://B.org"))
  }

  test("registeredDomain takes the last two host labels") {
    val spark2 = spark
    import spark2.implicits._
    val out = Seq("sub.host.example.com/path", "example.org", "localhost")
      .toDF("c").select(Web.registeredDomain(col("c"))).as[String].collect()
    assert(out(0) === "example.com")
    assert(out(1) === "example.org")
    assert(out(2) === "") // single label: no registered domain
  }

  test("urlInventory aggregates refs, collapsed forms, docs, and first citer") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "x http://example.com/A?q=1 y https://WWW.example.com/A"),
      (2L, "z http://example.com/A"),
      (3L, "w http://other.net/B http://other.net/B")
    ).toDF("doc_id", "text")
    val out = Web.urlInventory(docs, col("text"), "doc_id")
      .select(col("canonical"), col("domain"), col("n_refs"), col("n_forms"),
        col("n_docs"), col("first_doc"))
      .as[(String, String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out === Array(
      // three spellings (query, www+scheme, plain) -> one canonical key
      ("example.com/A", "example.com", 3L, 3L, 2L, 1L),
      // same raw spelling twice in one doc: 2 refs, 1 form, 1 doc
      ("other.net/B", "other.net", 2L, 1L, 1L, 3L)))
  }
}
