package graft.ops.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Similarity.nswTopK]] — the graph-ANN family (NSW-lite): recall
  * against the exact ranking at an IVF-comparable probe budget,
  * determinism, the structural degree bound, and the no-cartesian rule.
  *
  * Fixture: 8 clusters x 200 points in d=16, fully deterministic
  * (modular jitter, no RNG). Cluster centers form an overlapping CHAIN
  * (cluster g peaks at dims g and g+1, sharing dim g+1 with cluster
  * g+1, adjacent-center cosine 0.5) — real embedding spaces have such
  * gradients, and a greedy graph walk needs one; fully orthogonal
  * clusters are a plateau no greedy search (of any implementation) can
  * descend. Ids interleave clusters (id = i*8 + g) so IVF's first-K
  * seed covers every cluster — the budget comparison stays fair.
  */
class NswSpec extends SparkSpec {
  import spark.implicits._

  private val d = 16
  private val clusters = 8
  private val perCluster = 200

  private def point(g: Int, i: Int): Seq[Double] =
    (0 until d).map { j =>
      val base = if (j == g || j == g + 1) 1.0 else 0.0
      // jitter on 3 shared dims only: a low-intrinsic-dimension manifold,
      // the structure real embeddings have (and greedy graphs need)
      val jit = if (j >= 13) (((i * 2654435761L + j * 40503L + g * 9973L) % 2048L) - 1024L) / 1024.0 * 0.2 else 0.0
      base + jit
    }

  private lazy val corpus = (for {
    g <- 0 until clusters; i <- 0 until perCluster
  } yield ((i * clusters + g).toLong, point(g, i)))
    .toDF("id", "vec").repartition(4).cache()

  // one query per cluster: the cluster's i = 0 member (in-corpus ids,
  // both rankers exclude self)
  private lazy val queries = (0 until clusters)
    .map(g => (g.toLong, point(g, 0))).toDF("id", "vec")

  private def meanRecall(approx: org.apache.spark.sql.DataFrame): Double = {
    val exact = Similarity.cosineTopK(queries, corpus, 10)
    val r = Similarity.recallAtK(approx, exact, 10).collect()
    assert(r.length == clusters, "every query must have a recall row")
    r.map(_.getLong(2)).sum.toDouble / r.length
  }

  test("recall at an IVF-comparable budget: nsw >= ivf on the clustered fixture") {
    // budgets MEASURED, not assumed: the saturated-k run below asserts
    // nsw scores <= 250 vectors/query; ivf nprobe 2 of 16 first-K cells
    // scans ~1600/16*2 = 200 candidates/query — same order
    val nsw = Similarity.nswTopK(corpus, queries, k = 10,
      m = 6, beam = 8, hops = 8, planes = 8, numHubs = 16)
    val ivf = Similarity.ivfTopK(corpus, queries,
      numCentroids = 16, k = 10, nprobe = 2)
    val nswR = meanRecall(nsw)
    val ivfR = meanRecall(ivf)
    assert(nswR >= ivfR,
      s"nsw recall $nswR must be >= ivf recall $ivfR at equal budget")
    assert(nswR >= 9000.0, s"nsw mean recall_bp $nswR below the 0.90 floor")
    // the budget side of the claim: saturated k exposes the visited set
    val visited = Similarity.nswTopK(corpus, queries, k = 1600,
        m = 6, beam = 8, hops = 8, planes = 8, numHubs = 16)
      .groupBy(col("q_id")).agg(count(lit(1)).as("n")).collect()
    assert(visited.forall(_.getLong(1) <= 250),
      "nsw must stay within the IVF-comparable probe budget")
  }

  test("deterministic: two builds+searches return identical rows") {
    def run() = Similarity.nswTopK(corpus, queries, k = 5,
        m = 4, beam = 4, hops = 2, planes = 8, numHubs = 16)
      .orderBy(col("q_id"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(run() == run())
  }

  test("numHubs is capped at 256: the across clique is numHubs^2 driver pairs") {
    intercept[IllegalArgumentException] {
      Similarity.nswTopK(corpus, queries, k = 5, numHubs = 257)
    }
    intercept[IllegalArgumentException] {
      Similarity.nswBuildGraph(corpus, numHubs = 0)
    }
  }

  test("structural out-degree bound: <= 3m + 1 + (numHubs-1) + maxRegions") {
    // 2m local (forward + reverse) + m down + 1 up + hub clique + regions
    val m = 4; val numHubs = 16; val maxRegions = 32
    val maxDeg = Similarity.nswBuildGraph(corpus, m = m, planes = 8,
        numHubs = numHubs, maxRegions = maxRegions)
      .groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .agg(max(col("deg"))).collect()(0).getLong(0)
    assert(maxDeg <= 3 * m + 1 + (numHubs - 1) + maxRegions,
      s"out-degree $maxDeg exceeds the structural bound")
  }

  test("maxBucketSize bounds candidate targets; recall degrades gracefully") {
    // a tight cap (16 targets/bucket vs ~100-member coarse buckets)
    // keeps the build linear; hubs + regions keep the walk functional
    val capped = Similarity.nswTopK(corpus, queries, k = 10,
      m = 6, beam = 8, hops = 8, planes = 8, numHubs = 16,
      maxBucketSize = 16)
    val r = meanRecall(capped)
    assert(r >= 5000.0, s"capped-build recall $r collapsed below 0.50")
  }

  test("search plans no cartesian product and visits hops x beam x deg, not the corpus") {
    val out = Similarity.nswTopK(corpus, queries, k = 1600,
      m = 4, beam = 4, hops = 1, planes = 8, numHubs = 8)
    assert(!out.queryExecution.sparkPlan.toString.contains("CartesianProduct"))
    // k saturated: the output IS the visited set -> per-query bound =
    // beam entry + hops x beam x maxdeg (3m + 1 + (numHubs-1) + 32 = 52)
    val visitedBound = 4 + 1 * 4 * 52
    val perQuery = out.groupBy(col("q_id")).agg(count(lit(1)).as("n")).collect()
    assert(perQuery.forall(_.getLong(1) <= visitedBound))
  }
}
