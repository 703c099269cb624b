package graft.ops.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextStats.unigramLmVocab]] — the prune-based tokenizer trainer.
  * The expected output is computed by an independent plain-Scala
  * reference of the same contract (greedy longest-match under smoothed
  * Mitchell-log2 scores, two EM rounds), so the spec pins the SEMANTICS
  * — run parity, consumption, pruning — not engine incidentals.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala reference: one greedy segmentation pass. */
  private def segmentRef(
      vocab: Map[String, Long], cand: Map[String, Long]): Map[String, Long] = {
    val t = cand.values.sum
    val v = cand.size.toLong
    def score(p: String): Option[Long] =
      cand.get(p).map(c => Importance.flog2(c + 1))
    val norm = Importance.flog2(t + v)
    val counts = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, wc) <- vocab) {
      var i = 0
      while (i < w.length) {
        val bg = if (i + 1 < w.length) Some(w.substring(i, i + 2)) else None
        val beneficial = (for {
          b <- bg; sb <- score(b)
          s1 <- score(w.substring(i, i + 1))
          s2 <- score(w.substring(i + 1, i + 2))
        } yield sb + norm > s1 + s2).getOrElse(false)
        if (beneficial) { counts(bg.get) += wc; i += 2 }
        else { counts(w.substring(i, i + 1)) += wc; i += 1 }
      }
    }
    counts.toMap
  }

  /** Full reference: seed census, two rounds, final vocab rows. */
  private def referenceVocab(
      words: Seq[String], topBigrams: Int): Seq[(String, Long, Long, Long, Long, Long, Long)] = {
    val vocab = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val charCnt = vocab.toSeq.flatMap { case (w, wc) => w.map(c => c.toString -> wc) }
      .groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
    val bgCnt = vocab.toSeq.flatMap { case (w, wc) =>
        (0 until w.length - 1).map(i => w.substring(i, i + 2) -> wc) }
      .groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
    val bgTop = bgCnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(topBigrams)
    val cand0 = charCnt ++ bgTop
    val cnt1 = segmentRef(vocab, cand0)
    val cand1 = cand0.map { case (p, _) => p -> cnt1.getOrElse(p, 0L) }
    val cnt2 = segmentRef(vocab, cand1)
    val t2 = cnt2.values.sum
    val v = cand0.size.toLong
    cand0.toSeq.sortBy(_._1).map { case (p, c0) =>
      val c1 = cnt1.getOrElse(p, 0L)
      val c2 = cnt2.getOrElse(p, 0L)
      (p, p.length.toLong, c0, c1, c2,
        Importance.flog2(c2 + 1) - Importance.flog2(t2 + v),
        if (p.length == 1 || c2 >= 1) 1L else 0L)
    }
  }

  // repeated chars (run parity: "aaaa" -> [aa][aa], "aaa" -> [aa][a]),
  // 1-char words, a word mixing beneficial and non-beneficial positions,
  // and enough skew that some candidate bigrams lose round-2 usage
  private val words = Seq(
    "aaaa", "aaaa", "aaaa", "aaa", "aaa", "ab", "ab", "ab", "ab",
    "b", "c", "cab", "cab", "bc", "abab", "abab", "xy")
  private def docsDf = words.grouped(6).map(_.mkString(" ")).toSeq.toDF("text")
    .repartition(2) // keep kernels out of ConvertToLocalRelation

  test("matches the plain-Scala greedy-EM reference row for row") {
    val out = TextStats.unigramLmVocab(docsDf, col("text"), topBigrams = 4)
      .orderBy(col("piece"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSeq
    assert(out == referenceVocab(words, topBigrams = 4))
  }

  test("every emitted-position count conserves the corpus: sum cnt_r * len = total char positions") {
    val totalChars = words.map(_.length.toLong).sum
    val out = TextStats.unigramLmVocab(docsDf, col("text"), topBigrams = 4).collect()
    val used1 = out.map(r => r.getLong(3) * r.getLong(1)).sum
    val used2 = out.map(r => r.getLong(4) * r.getLong(1)).sum
    assert(used1 == totalChars, "round-1 segmentation must consume every position exactly once")
    assert(used2 == totalChars, "round-2 segmentation must consume every position exactly once")
  }

  test("chars are always kept; only bigrams can be pruned; prune = zero final usage") {
    val out = TextStats.unigramLmVocab(docsDf, col("text"), topBigrams = 4).collect()
    assert(out.filter(_.getLong(1) == 1L).forall(_.getLong(6) == 1L))
    out.filter(_.getLong(1) == 2L).foreach { r =>
      assert((r.getLong(6) == 1L) == (r.getLong(4) >= 1L),
        s"bigram ${r.getString(0)} kept flag must equal cnt2 >= 1")
    }
  }

  /** Plain-Scala reference of the APPLY pass: greedy piece count per word
    * under the served model — flog2(cnt2+1) scores over KEPT pieces, and
    * the normalizer flog2(T2+V) with V = the FULL candidate count (the
    * exact normalizer inside the trainer's logp_fp — kept-only V would
    * disagree with logp_fp-reconstructed scores on near-tie positions). */
  private def applyRef(words: Seq[String], topBigrams: Int): Map[String, Long] = {
    val all = referenceVocab(words, topBigrams)
    val vocab = all.filter(_._7 == 1L)
    val scores = vocab.map { case (p, _, _, _, c2, _, _) =>
      p -> Importance.flog2(c2 + 1) }.toMap
    val norm = Importance.flog2(vocab.map(_._5).sum + all.length)
    words.distinct.map { w =>
      var i = 0; var pieces = 0L
      while (i < w.length) {
        val ben = i + 1 < w.length && (for {
          sb <- scores.get(w.substring(i, i + 2))
          s1 <- scores.get(w.substring(i, i + 1))
          s2 <- scores.get(w.substring(i + 1, i + 2))
        } yield sb + norm > s1 + s2).getOrElse(false)
        pieces += 1
        i += (if (ben) 2 else 1)
      }
      w -> pieces
    }.toMap
  }

  test("unigramSegmentCounts matches the greedy reference per document") {
    val vocab = TextStats.unigramLmVocab(docsDf, col("text"), topBigrams = 4)
    val perWord = applyRef(words, topBigrams = 4)
    val docsWithId = words.grouped(6).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").repartition(2)
    val out = TextStats.unigramSegmentCounts(docsWithId, col("text"), "doc_id", vocab)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    docsWithId.collect().foreach { row =>
      val id = row.getLong(0)
      val ws = row.getString(1).split(" ").toSeq
      val expected = ws.map(perWord).sum
      assert(out(id) == ((ws.length.toLong, expected)),
        s"doc $id: got ${out(id)}, expected (${ws.length}, $expected)")
    }
  }

  test("unigram_pieces kernel == interpreted fold on degenerate and multi-byte inputs") {
    // the interpreted-vs-codegen discipline: same benefit set, nasty
    // inputs — empty, whitespace-only, runs, multi-byte (2/3/4-byte
    // UTF-8, so code-point walking is exercised), mixed boundaries
    val ben = Seq("aa", "ab", "éz", "日本", "aé", "😀x")
    val texts = Seq(
      "", "   ", "a", "aa", "aaa", "aaaa aaaaa", "ab ab ba",
      "caéz zéa ézéz", "日本語 語日本 日本日本", "aéa éa",
      "😀x y😀 😀😀x",
      " leading trailing ", "tab\tsep\nnl", "solo")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").repartition(2) // keep kernels out of ConvertToLocalRelation
    val both = df.select(col("id"),
        graft.functions.UnigramPiecesExpr.unigram_pieces(col("text"), ben).as("k"),
        TextStats.unigramPiecesInterpreted(col("text"), ben).as("f"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    both.foreach { case (id, k, f) =>
      assert(k === f, s"row $id (${texts(id.toInt)}): kernel $k != fold $f")
    }
    // and with an EMPTY benefit set: pieces = total characters
    val none = df.select(col("id"),
        graft.functions.UnigramPiecesExpr.unigram_pieces(col("text"), Nil).as("k"),
        TextStats.unigramPiecesInterpreted(col("text"), Nil).as("f"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    none.foreach { case (k, f) => assert(k === f) }
  }

  test("piece counts bound: n_chars/2 <= n_pieces <= n_chars per doc") {
    val vocab = TextStats.unigramLmVocab(docsDf, col("text"), topBigrams = 4)
    val withId = words.grouped(6).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").repartition(2)
    TextStats.unigramSegmentCounts(withId, col("text"), "doc_id", vocab)
      .collect().foreach { r =>
        val id = r.getLong(0)
        val chars = words.grouped(6).toSeq(id.toInt).map(_.length).sum.toLong
        val pieces = r.getLong(2)
        assert(pieces <= chars && 2 * pieces >= chars,
          s"doc $id: pieces $pieces out of [chars/2, chars] for $chars chars")
      }
  }
}
