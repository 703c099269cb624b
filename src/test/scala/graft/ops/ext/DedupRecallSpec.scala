package graft.ops.ext

import graft.SparkSpec
import graft.functions.WinnowFingerprintExpr
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall/cost instrumentation for the guarded candidate-pair generators,
  * measured against the exact all-pairs Jaccard oracle on a deliberately
  * skewed fixture — the numbers that make the `maxBucketSize` cap
  * defensible to a user (recorded in README's scale-design section).
  *
  * Fixture (deterministic, no RNG):
  *  - one boilerplate family: 40 docs sharing a 30-token template plus 2
  *    doc-specific tokens each (pairwise Jaccard 30/34 ≈ 0.88) — the
  *    mega-bucket case; C(40,2) = 780 true near-dup pairs
  *  - 30 scattered near-dup pairs: 20-token docs differing in 2 tokens
  *    (Jaccard 18/22 ≈ 0.82)
  *  - 80 singleton docs with disjoint vocabularies (no true pairs)
  *
  * Truth = exact brute-force all-pairs token Jaccard >= 0.7 (810 pairs).
  * The fixture is 150 docs so the quadratic oracle is affordable in a
  * test; the generators under measurement are the exact production code
  * paths (same band/guard machinery as q22/q53/q55/q57).
  */
class DedupRecallSpec extends SparkSpec {

  private val Threshold = 0.7
  private val Cap = 20

  private lazy val docs: DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val template = (0 until 30).map(j => s"tmpl$j").mkString(" ")
    val boiler = (0 until 40).map { i =>
      (i.toLong, s"$template extra${i}a extra${i}b")
    }
    val pairs = (0 until 30).flatMap { p =>
      val base = (0 until 20).map(j => s"p${p}w$j")
      Seq(
        (100L + 2 * p, base.mkString(" ")),
        (101L + 2 * p, (base.dropRight(2) ++ Seq(s"p${p}x0", s"p${p}x1")).mkString(" ")))
    }
    val singles = (0 until 80).map { i =>
      (1000L + i, (0 until 15).map(j => s"s${i}w$j").mkString(" "))
    }
    (boiler ++ pairs ++ singles).toDF("doc_id", "text")
  }

  /** Exact all-pairs Jaccard >= Threshold — the ground truth. */
  private lazy val truth: Set[(Long, Long)] = {
    val spark2 = spark
    import spark2.implicits._
    val t = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
    val l = t.select(col("doc_id").as("id_a"), col("toks").as("ta"))
    val r = t.select(col("doc_id").as("id_b"), col("toks").as("tb"))
    l.crossJoin(r).where(col("id_a") < col("id_b"))
      .where(Dedup.jaccard(col("ta"), col("tb")) >= Threshold)
      .select(col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSet
  }

  private lazy val megaTruth = truth.filter { case (a, b) => a < 100 && b < 100 }
  private lazy val scatteredTruth = truth -- megaTruth

  private lazy val sig =
    Dedup.withMinhashSignature(docs, col("text"), numHashes = 8)
  private val bands =
    Seq(Seq("mh0", "mh1"), Seq("mh2", "mh3"), Seq("mh4", "mh5"), Seq("mh6", "mh7"))

  private def collectPairs(df: DataFrame): Set[(Long, Long)] = {
    val spark2 = spark
    import spark2.implicits._
    df.select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
  }

  private def recall(cand: Set[(Long, Long)], of: Set[(Long, Long)]): Double =
    if (of.isEmpty) 1.0 else cand.intersect(of).size.toDouble / of.size

  test("fixture sanity: truth is the 780 boilerplate + 30 scattered pairs") {
    assert(megaTruth.size === 40 * 39 / 2)
    assert(scatteredTruth.size === 30)
  }

  test("guarded LSH recall/cost trade vs the exact oracle") {
    val uncapped = collectPairs(
      Dedup.lshCandidatePairsMultiBand(sig, "doc_id", bands))
    val dropped = collectPairs(
      Dedup.lshCandidatePairsMultiBand(sig, "doc_id", bands, maxBucketSize = Some(Cap)))
    val salted = collectPairs(
      Dedup.lshCandidatePairsMultiBand(sig, "doc_id", bands,
        maxBucketSize = Some(Cap), saltOversized = true))

    for ((name, cand) <- Seq("uncapped" -> uncapped, "drop" -> dropped, "salt" -> salted))
      info(f"$name%-8s candidates=${cand.size}%5d recall_all=${recall(cand, truth)}%.3f " +
        f"recall_scattered=${recall(cand, scatteredTruth)}%.3f recall_mega=${recall(cand, megaTruth)}%.3f")

    // the full-recall baseline: near-identical docs collide in >=1 band
    assert(recall(uncapped, truth) >= 0.95)
    // the cap never invents pairs, and capped variants only lose them
    assert(dropped.subsetOf(uncapped) && salted.subsetOf(uncapped))
    // drop: mega-bucket pairs are sacrificed wholesale, scattered survive
    assert(recall(dropped, scatteredTruth) >= 0.95)
    assert(recall(dropped, megaTruth) === 0.0)
    // salt: bounded cost but PARTIAL mega recall — strictly better than drop
    assert(recall(salted, megaTruth) > 0.2)
    assert(recall(salted, scatteredTruth) >= 0.95)
    assert(recall(salted, truth) > recall(dropped, truth))
    // cost bound: per band, pairs <= n * cap / 2 (n = 150 docs)
    assert(dropped.size <= bands.size * 150 * Cap / 2)
    assert(salted.size <= bands.size * 150 * Cap / 2)
  }

  test("winnowing recall: substring guarantee on scattered pairs, guard on boilerplate") {
    val fp = WinnowFingerprintExpr.winnow(col("text"), k = 5, w = 8)
    val uncapped = collectPairs(Dedup.winnowCandidatePairs(docs, "doc_id", fp))
    val capped = collectPairs(
      Dedup.winnowCandidatePairs(docs, "doc_id", fp, maxBucketSize = Some(Cap)))

    for ((name, cand) <- Seq("uncapped" -> uncapped, "capped" -> capped))
      info(f"winnow-$name%-10s candidates=${cand.size}%5d recall_all=${recall(cand, truth)}%.3f " +
        f"recall_scattered=${recall(cand, scatteredTruth)}%.3f recall_mega=${recall(cand, megaTruth)}%.3f")

    // winnowing GUARANTEES a shared fingerprint for any >= w+k-1-char
    // common substring: every scattered pair (18 shared leading tokens)
    // and every boilerplate pair (shared 30-token template) is found
    assert(recall(uncapped, truth) === 1.0)
    // the cap drops the template's ubiquitous fingerprints (bucket size 40
    // > cap) but doc-pair-local fingerprints keep scattered recall perfect;
    // mega recall is NOT exactly zero — windows straddling the template/
    // suffix boundary yield minima shared by sub-cap subsets of the family
    assert(recall(capped, scatteredTruth) === 1.0)
    assert(recall(capped, megaTruth) < 0.2)
    assert(capped.subsetOf(uncapped))
  }

  test("SRP-prefiltered semantic dedup: precision 1, measured recall vs exact cosine") {
    val spark2 = spark
    import spark2.implicits._
    // deterministic embedding fixture (64 dims): 10 families x 5 members
    // (member k = one-hot base direction for family f plus a 0.01 bump on
    // coordinate f+1+k -> intra-family cosine ~0.99995), 50 singletons on
    // distinct two-coordinate directions (mutual |cosine| <= 0.5, far
    // below the 0.999 threshold)
    val dims = 64
    def family(f: Int, k: Int): Array[Float] = {
      val v = Array.fill(dims)(0.0f)
      v(f) = 1.0f
      v(f + 1 + k) += 0.01f
      v
    }
    val fams = for (f <- 0 until 10; k <- 0 until 5)
      yield ((f * 5 + k).toLong, family(f, k))
    val singles = for (i <- 0 until 50) yield {
      val v = Array.fill(dims)(0.0f)
      v(i % dims) = 1.0f
      v((i * 7 + 3) % dims) = -1.0f
      (1000L + i, v)
    }
    val vecs = (fams ++ singles).toDF("id", "vec")
    val threshold = 0.999

    // exact all-pairs truth (100 vectors -> affordable cross join)
    val l = vecs.select(col("id").as("id_a"), col("vec").as("va"))
    val r = vecs.select(col("id").as("id_b"), col("vec").as("vb"))
    val truthPairs = l.crossJoin(r).where(col("id_a") < col("id_b"))
      .where(Similarity.cosineSafe(col("va"), col("vb")) >= threshold)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(truthPairs.size === 10 * (5 * 4 / 2), truthPairs.size) // families only

    for (planes <- Seq(2, 4, 8)) {
      val cand = collectPairs(
        Similarity.embeddingNearDupPairs(vecs, planes, threshold))
      // the cosine filter is exact, so the SRP prefilter can only LOSE
      // pairs, never invent them: precision is structurally 1.0
      assert(cand.subsetOf(truthPairs), s"planes=$planes")
      info(f"srp planes=$planes%d candidates=${cand.size}%4d recall=${recall(cand, truthPairs)}%.3f")
    }
    // at the q66 setting (4 planes) the near-parallel family members
    // almost always share buckets — and dedup clusters recover the rest:
    // one straddling member links the bucket-split halves transitively
    val out = Similarity.semanticDedup(vecs, planes = 4, threshold = threshold)
      .as[(Long, Long, Long)].collect()
    val byCluster = out.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    val truthClusters = (0 until 10).map(f => (f * 5 until f * 5 + 5).map(_.toLong).toSet).toSet ++
      singles.map(s => Set(s._1)).toSet
    val agree = byCluster.intersect(truthClusters).size.toDouble / truthClusters.size
    info(f"semanticDedup cluster agreement with exact-cosine clusters: $agree%.3f")
    assert(agree >= 0.9, s"agreement $agree; clusters=${byCluster.size}")
    assert(out.count(_._3 == 1L) === byCluster.size) // one keeper per cluster
  }
}
