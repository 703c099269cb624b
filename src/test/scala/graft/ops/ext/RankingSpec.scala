package graft.ops.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RankingSpec extends SparkSpec {

  test("rrfFuse: floor-division scores, list membership, id tie-break") {
    val spark2 = spark
    import spark2.implicits._
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 40L, 3L))
      .toDF("query_id", "doc_id", "rnk")
    val b = Seq((1L, 20L, 1L), (1L, 30L, 2L), (1L, 50L, 3L))
      .toDF("query_id", "doc_id", "rnk")
    val out = Ranking.rrfFuse(Seq(a, b), "doc_id", topK = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // doc 20 appears in both lists: 1e9//62 + 1e9//61
    val s20 = 1000000000L / 62 + 1000000000L / 61
    val s10 = 1000000000L / 61
    val s30 = 1000000000L / 62
    val s3 = 1000000000L / 63 // docs 40 and 50: equal scores -> id order
    assert(out === Seq(
      (1L, 20L, s20, 2L, 1L),
      (1L, 10L, s10, 1L, 2L),
      (1L, 30L, s30, 1L, 3L),
      (1L, 40L, s3, 1L, 4L),
      (1L, 50L, s3, 1L, 5L)))
  }

  test("rrfFuse: topK truncates per query independently") {
    val spark2 = spark
    import spark2.implicits._
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L), (2L, 30L, 1L))
      .toDF("query_id", "doc_id", "rnk")
    val out = Ranking.rrfFuse(Seq(a), "doc_id", topK = 1)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L), (2L, 30L)))
  }

  test("rrfFuse: duplicate (query, doc) rows within ONE list dedup to best rank") {
    val spark2 = spark
    import spark2.implicits._
    // a hand-built (non-row_number) frame repeats doc 10 at ranks 1 and 3
    val a = Seq((1L, 10L, 1L), (1L, 10L, 3L), (1L, 20L, 2L))
      .toDF("query_id", "doc_id", "rnk")
    val b = Seq((1L, 10L, 2L)).toDF("query_id", "doc_id", "rnk")
    val out = Ranking.rrfFuse(Seq(a, b), "doc_id", topK = 5)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    // doc 10: list a counted ONCE at its best rank 1 (+ list b at rank 2),
    // n_lists counts lists, never rows
    assert(out(10L) === ((1000000000L / 61 + 1000000000L / 62, 2L)))
    assert(out(20L) === ((1000000000L / 62, 1L)))
  }

  test("coverageTopK: distinct-term counts, ties by id, literal query terms (no join)") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "alpha alpha gamma"), // 1 distinct query term
      (2L, "beta alpha x"),      // 2
      (3L, "beta beta"),         // 1 -> ties with doc 1, id order
      (4L, "nothing here")       // 0 -> absent
    ).toDF("doc_id", "text").repartition(2)
    val out = Ranking.coverageTopK(docs, col("text"), "doc_id",
        Seq((7L, "alpha beta")), k = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((7L, 2L, 2L, 1L), (7L, 1L, 1L, 2L), (7L, 3L, 1L, 3L)))
    val plan = Ranking.coverageTopK(docs, col("text"), "doc_id",
      Seq((7L, "alpha beta")), k = 10).queryExecution.executedPlan.toString
    // the round-19 literal-terms form: the query table is plan data
    // (typedLit), so there is NO join and NO (query, doc) aggregation —
    // coverage reads off one codegen'd array_intersect per (doc, query)
    assert(!plan.contains("Join"),
      s"query terms are plan literals — no join expected:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"coverage is a projection, not an aggregation:\n$plan")
  }

  test("ndcgAtK: perfect ranking scores 1e6; buried hits score less") {
    val spark2 = spark
    import spark2.implicits._
    // labels: A = {1, 2, 3, 6}, B = {4, 5}; query 1 has R = 3 relevant
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"),
      (5L, "B"), (6L, "A")).toDF("id", "label")
    val d = Ranking.ndcgDiscounts(3)
    assert(d.head === 1000000000L) // disc(1) = scale/log2(2)
    assert(d === d.sorted.reverse && d.distinct === d, "discounts strictly decrease")
    val idcg = d.sum // R = 3 >= k = 3 -> full prefix
    // perfect: all three hits at the top
    val perfect = Seq((1L, 2L, 1), (1L, 3L, 2), (1L, 6L, 3))
      .toDF("q_id", "n_id", "rnk")
    val p = Ranking.ndcgAtK(perfect, labels, k = 3)
      .as[(Long, Long, Long, Long)].collect().head
    assert(p === ((1L, idcg, idcg, 1000000L)))
    // buried: hits at ranks 1 and 3 only
    val partial = Seq((1L, 2L, 1), (1L, 4L, 2), (1L, 3L, 3))
      .toDF("q_id", "n_id", "rnk")
    val q = Ranking.ndcgAtK(partial, labels, k = 3)
      .as[(Long, Long, Long, Long)].collect().head
    val dcg = d(0) + d(2)
    assert(q === ((1L, dcg, idcg, Math.floorDiv(1000000L * dcg, idcg))))
  }

  test("ndcgAtK: R < k truncates IDCG; R = 0 yields NULL ndcg") {
    val spark2 = spark
    import spark2.implicits._
    // query 1's label C has population 2 -> R = 1; query 4's label D is
    // unique -> R = 0 (no other relevant document exists)
    val labels = Seq((1L, "C"), (2L, "C"), (3L, "E"), (4L, "D"))
      .toDF("id", "label")
    val d = Ranking.ndcgDiscounts(2)
    val ranking = Seq((1L, 3L, 1), (1L, 2L, 2), (4L, 2L, 1), (4L, 3L, 2))
      .toDF("q_id", "n_id", "rnk")
    val out = Ranking.ndcgAtK(ranking, labels, k = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    // q1: hit at rank 2, ideal = the single relevant at rank 1
    assert(out(1L) === ((d(1), d(0), Some(Math.floorDiv(1000000L * d(1), d(0))))))
    // q4: nothing relevant exists -> idcg 0, ndcg NULL (undefined)
    assert(out(4L) === ((0L, 0L, None)))
  }

  test("ndcgAtK truncates a deeper ranking to depth k (no ANSI array throw)") {
    val spark2 = spark
    import spark2.implicits._
    // nDCG@2 over a top-3 list: the rank-3 relevant hit must be DROPPED
    // by the @k truncation, not fed into the 2-entry discount table
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"))
      .toDF("id", "label")
    val deep = Seq((1L, 4L, 1), (1L, 2L, 2), (1L, 3L, 3))
      .toDF("q_id", "n_id", "rnk")
    val d = Ranking.ndcgDiscounts(2)
    val out = Ranking.ndcgAtK(deep, labels, k = 2)
      .as[(Long, Long, Long, Long)].collect().head
    // only the rank-2 hit counts; R = 2 -> full 2-deep ideal prefix
    assert(out === ((1L, d(1), d.sum, Math.floorDiv(1000000L * d(1), d.sum))))
  }

  test("rboAtK: a scale too small for any positive weight fails fast") {
    val spark2 = spark
    import spark2.implicits._
    val a = Seq((1L, 10L, 1L)).toDF("query_id", "doc_id", "rnk")
    val e = intercept[IllegalArgumentException] {
      Ranking.rboAtK(a, a, "doc_id", k = 3, pMilli = 900L, scale = 1L)
    }
    assert(e.getMessage.contains("suffix-weight total is 0"))
  }

  test("kendallTau: identical +1e6, reversed -1e6, floor on negatives") {
    val spark2 = spark
    import spark2.implicits._
    def rk(rows: (Long, Long, Long)*) =
      rows.toSeq.toDF("query_id", "doc_id", "rnk")
    val fwd = rk((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
    val rev = rk((1L, 10L, 3L), (1L, 20L, 2L), (1L, 30L, 1L))
    val same = Ranking.kendallTau(fwd, fwd, "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(same === ((1L, 3L, 3L, 0L, 1000000L)))
    val opp = Ranking.kendallTau(fwd, rev, "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(opp === ((1L, 3L, 0L, 3L, -1000000L)))
    // one swap among 3 common docs: C=2, D=1 -> floor(1e6/3) = 333333,
    // and the NEGATIVE mirror must floor DOWN (-333334), not truncate
    val oneSwap = rk((1L, 10L, 1L), (1L, 20L, 3L), (1L, 30L, 2L))
    val mixed = Ranking.kendallTau(fwd, oneSwap, "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(mixed === ((1L, 3L, 2L, 1L, Math.floorDiv(1000000L, 3L))))
    val negMixed = Ranking.kendallTau(rev, oneSwap, "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(negMixed === ((1L, 3L, 1L, 2L, Math.floorDiv(-1000000L, 3L))))
  }

  test("kendallTau: restricted to common docs; <2 common -> absent") {
    val spark2 = spark
    import spark2.implicits._
    // q1 shares docs {10, 20} (ranked oppositely among extras), q2
    // shares only doc 50 -> no pairs, q3 shares nothing
    val a = Seq((1L, 10L, 1L), (1L, 99L, 2L), (1L, 20L, 3L),
      (2L, 50L, 1L), (2L, 60L, 2L), (3L, 70L, 1L))
      .toDF("query_id", "doc_id", "rnk")
    val b = Seq((1L, 20L, 1L), (1L, 98L, 2L), (1L, 10L, 3L),
      (2L, 50L, 1L), (2L, 61L, 2L), (3L, 71L, 1L))
      .toDF("query_id", "doc_id", "rnk")
    val out = Ranking.kendallTau(a, b, "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L, 0L, 1L, -1000000L)))
  }

  test("rboAtK: identical lists 1e6; head agreement beats tail agreement") {
    val spark2 = spark
    import spark2.implicits._
    def rk(rows: (Long, Long, Long)*) =
      rows.toSeq.toDF("query_id", "doc_id", "rnk")
    val sw = Ranking.rboSuffixWeights(3)
    assert(sw === sw.sorted.reverse, "suffix sums must decrease")
    val fwd = rk((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
    val same = Ranking.rboAtK(fwd, fwd, "doc_id", k = 3)
      .as[(Long, Long, Long, Long)].collect().head
    assert(same === ((1L, 3L, sw.sum, 1000000L)))
    // sharing only the rank-1 doc scores higher than only the rank-3 doc
    val headOnly = rk((1L, 10L, 1L), (1L, 88L, 2L), (1L, 89L, 3L))
    val tailOnly = rk((1L, 86L, 1L), (1L, 87L, 2L), (1L, 30L, 3L))
    val h = Ranking.rboAtK(fwd, headOnly, "doc_id", k = 3)
      .as[(Long, Long, Long, Long)].collect().head
    val t = Ranking.rboAtK(fwd, tailOnly, "doc_id", k = 3)
      .as[(Long, Long, Long, Long)].collect().head
    assert(h === ((1L, 1L, sw(0), Math.floorDiv(1000000L * sw(0), sw.sum))))
    assert(t === ((1L, 1L, sw(2), Math.floorDiv(1000000L * sw(2), sw.sum))))
    assert(h._4 > t._4, s"head overlap ${h._4} must outscore tail ${t._4}")
    // disjoint lists -> absent (undefined-denominator never arises)
    val disjoint = rk((1L, 91L, 1L), (1L, 92L, 2L), (1L, 93L, 3L))
    assert(Ranking.rboAtK(fwd, disjoint, "doc_id", k = 3).count() === 0L)
    // deeper-than-k lists truncate: at k = 2 the shared rank-3 doc
    // carries zero RBO@2 mass (and stays inside the 2-entry table)
    val sw2 = Ranking.rboSuffixWeights(2)
    val trunc = Ranking.rboAtK(fwd, tailOnly, "doc_id", k = 2)
    assert(trunc.count() === 0L)
    val head2 = Ranking.rboAtK(fwd, headOnly, "doc_id", k = 2)
      .as[(Long, Long, Long, Long)].collect().head
    assert(head2 === ((1L, 1L, sw2(0), Math.floorDiv(1000000L * sw2(0), sw2.sum))))
  }

  test("rboAtK ppm tracks the real-valued RBO within floor error") {
    val spark2 = spark
    import spark2.implicits._
    // deterministic pseudo-random permutations of 10 docs, two queries
    val rng = new scala.util.Random(42)
    val docs = (1 to 10).map(_.toLong).toVector
    def perm(q: Long): Seq[(Long, Long, Long)] = rng.shuffle(docs).zipWithIndex
      .map { case (d, i) => (q, d, (i + 1).toLong) }
    val a = (perm(1L) ++ perm(2L)).toDF("query_id", "doc_id", "rnk")
    val b = (perm(1L) ++ perm(2L)).toDF("query_id", "doc_id", "rnk")
    val k = 10
    val got = Ranking.rboAtK(a, b, "doc_id", k)
      .select("query_id", "rbo_ppm").as[(Long, Long)].collect().toMap
    // real-valued reference: RBO@k = sum_d (1-p) p^(d-1) |A_d ^ B_d| / d,
    // normalized by the identical-lists truncated mass
    val la = a.as[(Long, Long, Long)].collect().groupBy(_._1)
    val lb = b.as[(Long, Long, Long)].collect().groupBy(_._1)
    val p = 0.9
    for (q <- Seq(1L, 2L)) {
      val ra = la(q).map(r => r._2 -> r._3).toMap
      val rb = lb(q).map(r => r._2 -> r._3).toMap
      val raw = (1 to k).map { d =>
        val inter = ra.keys.count(doc =>
          ra(doc) <= d && rb.get(doc).exists(_ <= d))
        (1 - p) * math.pow(p, d - 1.0) * inter / d
      }.sum
      val norm = (1 to k).map(d => (1 - p) * math.pow(p, d - 1.0)).sum
      val ref = 1e6 * raw / norm
      assert(math.abs(got(q) - ref) < 50,
        s"q$q: got ${got(q)} ppm vs real-valued $ref")
    }
  }

  test("driverTokens mirrors the ENGINE tokenizer on whitespace edges (tab/CR/newline, trailing empties)") {
    val spark2 = spark
    import spark2.implicits._
    // the round-19 ADVICE cases: Java String.trim strips every char
    // <= U+0020 and one-arg split drops trailing empties — both diverge
    // from Spark's trim (0x20 only) / split (limit -1) on these inputs
    val cases = Seq(
      "a b  c", "  a b ", "\ta b", "a b\n", "\r\na b\t", "a b",
      "", " ", "\t", "a", " \t a \t ", "x\ty\rz\nw")
    val engine = cases.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("i", "s")
      .repartition(2) // keep ConvertToLocalRelation from folding the kernel
      .select(col("i"), Dedup.tokens(col("s")).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    cases.zipWithIndex.foreach { case (s, i) =>
      assert(Ranking.driverTokens(s) === engine(i.toLong),
        s"case ${i}: ${s.map(_.toInt.toHexString).mkString(",")}")
    }
  }
}
