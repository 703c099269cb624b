package graft.ops.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {

  test("flog2 is exact at powers of two, monotone, and matches its Column twin") {
    // exact at powers of two: flog2(2^k) = k·S
    (0 to 46).foreach { k =>
      assert(Importance.flog2(1L << k) === k * Importance.Scale)
    }
    // monotone over a dense small range + a sparse large range
    val xs = (1L to 2000L) ++ Seq(1L << 20, (1L << 20) + 7, 1L << 40,
      (1L << 40) + 12345, Importance.MaxFlog2Arg)
    xs.sliding(2).foreach { case Seq(a, b) =>
      assert(Importance.flog2(a) <= Importance.flog2(b), s"$a vs $b")
    }
    // Column twin agrees bit for bit
    val spark2 = spark
    import spark2.implicits._
    val got = xs.toDF("x")
      .select(col("x"), Importance.flog2Col(col("x")).as("f"))
      .as[(Long, Long)].collect().toMap
    xs.foreach(x => assert(got(x) === Importance.flog2(x), s"x=$x"))
  }

  test("bigramBuckets matches the interpreted md5 featureBucket form bit for bit") {
    val spark2 = spark
    import spark2.implicits._
    // adversarial text: multi-byte, emoji, mixed/odd whitespace, single
    // token (no bigrams), empty — the interpreted reference is the
    // md5-string chain the oracle replays
    val texts = Seq(
      "the quick brown fox", "  leading  and   multi  spaces ",
      "café naïve über", "emoji 😀 mix 🌍 end",
      "tab\tsep\nnewline mix", "solo", "", "a b")
    val df = texts.toDF("text").repartition(2)
    val ref = df.select(
      transform(Importance.bigrams(col("text")),
        f => Importance.featureBucket(f, 64)).as("b"))
      .as[Seq[Long]].collect().toSeq
    val got = df.select(Importance.bigramBuckets(col("text"), 64).as("b"))
      .as[Seq[Long]].collect().toSeq
    assert(got === ref)
  }

  test("dsirScores prefers documents resembling the target distribution") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (
      (1L to 8L).map(i => (i, "the quick brown fox jumps", "en")) ++
      (9L to 16L).map(i => (i, "zzz qqq www vvv kkk", "xx")) ++
      Seq((17L, "the quick brown fox jumps", "xx"), // target-like raw doc
          (18L, "solo", "xx")) // single token: no bigram features
    ).toDF("doc_id", "text", "lang")
    val out = Importance.dsirScores(docs, col("text"), "doc_id",
        isTarget = col("lang") === "en", buckets = 64)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.length === 18) // every input row scored
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(18L) === ((18L, 0L, 0L))) // featureless -> (0, 0)
    // the target-like raw doc outscores every off-target doc
    assert(byId(17L)._3 > byId(9L)._3)
    // identical text ⇒ identical score regardless of its own lang tag
    assert(byId(17L)._3 === byId(1L)._3)
    // off-target docs score strictly below target-distribution docs
    (9L to 16L).foreach(i => assert(byId(i)._3 < byId(1L)._3))
  }

  test("bigramLogProb matches the hand-computed add-one-smoothed model") {
    val spark2 = spark
    import spark2.implicits._
    // corpus: uni a:3 b:2 c:1 (V=3); bigrams "a b":2, "a c":1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "q"))
      .toDF("doc_id", "text")
    val out = Importance.bigramLogProb(docs, col("text"), "doc_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    import Importance.flog2
    val abLp = flog2(2 + 1) - flog2(3 + 4) // cnt2("a b")+1 over cnt1(a)+V
    val acLp = flog2(1 + 1) - flog2(3 + 4)
    assert(out.toSeq === Seq(
      (1L, 1L, abLp), (2L, 1L, abLp), (3L, 1L, acLp), (4L, 0L, 0L)))
    assert(abLp < 0 && acLp < abLp) // rarer transition = more surprising
  }

  test("perplexityBuckets cuts per-language NTILE groups monotone in mean NLL") {
    val spark2 = spark
    import spark2.implicits._
    // 12 docs per language; text repetition level varies the LM score
    val docs = (0L until 24L).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      // lower i -> more repeated (more probable) bigrams
      val body = (0 until 12).map(j => if (j <= i / 2) s"w$j" else "w0").mkString(" ")
      (i, lang, body)
    }.toDF("doc_id", "lang", "text")
    val out = Importance.perplexityBuckets(
        docs.repartition(5), col("text"), "doc_id", "lang", nBuckets = 3)
      .as[(Long, String, Long, Long, Long)].collect()
    // equal bucket sizes per language (12 docs / 3 = 4 each)
    val sizes = out.groupBy(r => (r._2, r._5)).view.mapValues(_.length).toMap
    assert(sizes.values.toSet === Set(4), sizes)
    // monotone: every head avg_nll <= every middle <= every tail, per lang
    for (lang <- Seq("en", "de")) {
      val byBucket = out.filter(_._2 == lang).groupBy(_._5)
        .view.mapValues(_.map(_._4)).toMap
      assert(byBucket(1L).max <= byBucket(2L).min)
      assert(byBucket(2L).max <= byBucket(3L).min)
    }
    // deterministic under a different layout
    val again = Importance.perplexityBuckets(
        docs.repartition(11), col("text"), "doc_id", "lang", nBuckets = 3)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(again === out.sortBy(_._1))
  }

  test("kneserNeyLogProb matches the hand-computed discounted model") {
    val spark2 = spark
    import spark2.implicits._
    // bigrams: "a b"x2, "a c"x1 -> types {ab, ac}, nb=2;
    // ctx a: c1=3, n1w1=2; pre: b->1, c->1; S=2^20, D=3/4
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "q"))
      .toDF("doc_id", "text")
    val out = Importance.kneserNeyLogProb(docs, col("text"), "doc_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    import Importance.flog2
    val S = 1L << 20
    def lp(c12: Long): Long = {
      val t1 = S * (4 * c12 - 3) / (4 * 3)
      val t2 = 3 * S * 2 * 1 / (4 * 3 * 2)
      flog2(t1 + t2 + 1) - flog2(S)
    }
    assert(out.toSeq === Seq(
      (1L, 1L, lp(2)), (2L, 1L, lp(2)), (3L, 1L, lp(1)), (4L, 0L, 0L)))
    // discounted probabilities over a context nearly sum to 1 (floor loss
    // only): P(b|a) + P(c|a) in scale units within 2 of S
    val mass = (S * 5 / 12 + S / 4) + (S / 12 + S / 4)
    assert(S - mass <= 2, s"mass $mass vs $S")
    // the more frequent transition is less surprising
    assert(lp(2) > lp(1) && lp(1) < 0)
  }

  test("editConfirmedPairs recalls band candidates and confirms by bounded distance") {
    val spark2 = spark
    import spark2.implicits._
    // 1/2: same token set (same band), tiny edit distance — confirmed.
    // 3/4: same token set, reordered beyond maxDist=2 — recalled, rejected.
    // 5: disjoint vocabulary — never a candidate.
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "one two three four five"), (4L, "five four three two one"),
      (5L, "unrelated words here")).toDF("doc_id", "text")
    val confirmed = Dedup.editConfirmedPairs(docs, col("text"), "doc_id",
        numHashes = 2, prefixLen = 80, maxDist = 2)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(confirmed.toSeq === Seq((1L, 2L, 0L)))
    // the banded 3-arg levenshtein is in the plan (not the O(n²) 2-arg)
    val plan = Dedup.editConfirmedPairs(docs, col("text"), "doc_id",
        numHashes = 2, prefixLen = 80, maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("levenshtein"), plan)
    assert(plan.contains("Some(2)"), plan) // threshold arg present
    // persistSignatures: identical output through the checkpointed
    // (band, id, prefix) projection (the q108 configuration)
    val persisted = Dedup.editConfirmedPairs(docs, col("text"), "doc_id",
        numHashes = 2, prefixLen = 80, maxDist = 2, persistSignatures = true)
    val got = persisted.as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === confirmed.toSeq)
    graft.core.Checkpoints.release(persisted)
  }

  test("contaminationFraction grades overlap in basis points, keeps clean docs") {
    val spark2 = spark
    import spark2.implicits._
    val corpus = Seq(
      (1L, "a b c"), // 2-grams {a b, b c}: one hits the benchmark -> 5000
      (2L, "b c d"), // {b c, c d}: both hit -> 10000
      (3L, "x y z"), // no hits -> 0
      (4L, "solo")).toDF("doc_id", "text") // < n tokens -> (0,0,0)
    val bench = Seq((100L, "b c d")).toDF("doc_id", "text")
    val out = Contamination.contaminationFraction(
        corpus, col("text"), "doc_id", bench, col("text"), n = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, 2L, 1L, 5000L), (2L, 2L, 2L, 10000L),
      (3L, 2L, 0L, 0L), (4L, 0L, 0L, 0L)))
  }

  test("assignToClusters routes new docs to the min matching band rep") {
    val spark2 = spark
    import spark2.implicits._
    val existing = Seq(
      (7L, "a b c"), (2L, "c b a"), // same token set -> one band, rep 2
      (5L, "p q r")).toDF("doc_id", "text")
    val fresh = Seq(
      (100L, "b a c"), // matches the {a,b,c} band -> rep 2
      (101L, "zz qq")).toDF("doc_id", "text") // no band match -> NULL
    val out = Dedup.assignToClusters(existing, fresh, col("text"), "doc_id")
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(out.toSeq === Seq((100L, Some(2L)), (101L, None)))
  }
}
