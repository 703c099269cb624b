package graft.ops.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Ranking.pavPools]] / [[Ranking.isotonicCalibrate]] /
  * [[Ranking.calibratedFuse]] — exact isotonic score calibration (the
  * score-fusion complement of rank-only RRF). Spec-gated per the ledger:
  * the oracle roster is full, and the operator composes already-oracled
  * parts (calibrationBins is q168's fit table; the serve pass is the
  * q170 typedLit-literal shape).
  */
class IsotonicSpec extends SparkSpec {

  test("pavPools: textbook merge — a decreasing run pools to its weighted mean") {
    // rates .2, .5, .3, .8 -> (0), (1,2 pooled at 4/10), (3)
    val pools = Ranking.pavPools(Seq(
      (0L, 10L, 2L), (1L, 4L, 2L), (2L, 6L, 2L), (3L, 10L, 8L)))
    assert(pools.map(p => (p.bin_lo, p.bin_hi, p.n, p.pos, p.p_ppm)) === Seq(
      (0L, 0L, 10L, 2L, 200000L),
      (1L, 2L, 10L, 4L, 400000L),
      (3L, 3L, 10L, 8L, 800000L)))
  }

  test("pavPools: cascading merge reaches back past earlier pools") {
    // rates .9, .5, .1: (1,2) pool to .3, which then violates .9 -> one pool
    val pools = Ranking.pavPools(Seq(
      (0L, 10L, 9L), (1L, 10L, 5L), (2L, 10L, 1L)))
    assert(pools === Seq(Ranking.IsoPool(0L, 2L, 30L, 15L, 500000L)))
  }

  test("pavPools: monotone output, exact (n, pos) conservation, any input order") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 20) {
      val bins = (0L until 12L).map { b =>
        val n = 1L + rnd.nextInt(50)
        (b, n, rnd.nextInt(n.toInt + 1).toLong)
      }
      val pools = Ranking.pavPools(rnd.shuffle(bins))
      assert(pools.map(_.n).sum === bins.map(_._2).sum, s"trial $trial: n")
      assert(pools.map(_.pos).sum === bins.map(_._3).sum, s"trial $trial: pos")
      // rates monotone non-decreasing, exactly (cross-multiplied)
      pools.sliding(2).foreach {
        case Seq(a, b) =>
          assert(BigInt(a.pos) * b.n <= BigInt(b.pos) * a.n,
            s"trial $trial: pools invert: $a -> $b")
        case _ =>
      }
      // pool ranges tile [first bin, last bin] in order
      assert(pools.head.bin_lo === 0L && pools.last.bin_hi === 11L)
      pools.sliding(2).foreach {
        case Seq(a, b) => assert(b.bin_lo > a.bin_hi)
        case _ =>
      }
    }
  }

  test("pavPools: exact past 2^63 products (web-corpus bin counts)") {
    // n ~ 4e12 rows per bin: pos*n cross products overflow a Long
    // multiply; the BigInt compare must still merge the strict violation
    val big = 4_000_000_000_000L
    val pools = Ranking.pavPools(Seq(
      (0L, big, big / 2L), (1L, big, big / 2L - 1L)))
    assert(pools.length === 1, "the 1-count violation must still merge")
    assert(pools.head.p_ppm === ((BigInt(1000000) * (big - 1L)) / (2L * big)).toLong)
  }

  test("pavPools rejects malformed bins") {
    intercept[IllegalArgumentException] { Ranking.pavPools(Seq((0L, 0L, 0L))) }
    intercept[IllegalArgumentException] { Ranking.pavPools(Seq((0L, 5L, 6L))) }
  }

  test("isotonicCalibrate: calibrated probability is monotone in the raw score") {
    val spark2 = spark
    import spark2.implicits._
    // a noisy-but-rising relationship: label rate grows with conf except
    // one inverted band the fit must pool away
    val rows = (0 until 400).map { i =>
      val conf = i * 2500L // 0 .. 997500 ppm
      val rate = if (i >= 150 && i < 200) 0.9 else i / 400.0
      (conf, if ((i * 2654435761L % 1000) < (rate * 1000).toLong) 1L else 0L)
    }
    val df = rows.toDF("conf", "y").repartition(3)
    val out = Ranking.isotonicCalibrate(df, col("conf"), col("y"), bins = 10)
      .select(col("conf"), col("calib_ppm")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out.length === 400)
    out.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._2,
        s"calibration inverted between conf ${a._1} and ${b._1}")
      case _ =>
    }
    assert(out.map(_._2).distinct.length >= 2, "fit must not collapse to one rate")
  }

  test("isotonicCalibrate: fit on labeled data, serve unlabeled; gap bins step down") {
    val spark2 = spark
    import spark2.implicits._
    // fit observes only bins 2 (rate .5) and 7 (rate 1.0); serving rows
    // land in bins 0 (below the first pool -> first pool's rate),
    // 4 (gap -> nearest pooled bin below = bin 2's rate) and 9 (above
    // the last pool -> its rate)
    val fit = Seq((250000L, 0L), (250000L, 1L), (750000L, 1L), (750000L, 1L))
      .toDF("conf", "y")
    val serve = Seq(50000L, 450000L, 950000L).toDF("conf")
    val out = Ranking.isotonicCalibrate(serve, col("conf"), col("y"),
        bins = 10, fitOn = Some(fit))
      .select("conf", "calib_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(50000L -> 500000L, 450000L -> 500000L,
      950000L -> 1000000L))
    // in-sample serve reproduces the pool rates exactly
    val fitted = Ranking.isotonicCalibrate(fit, col("conf"), col("y"), bins = 10)
      .select("conf", "calib_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fitted(250000L) === 500000L && fitted(750000L) === 1000000L)
  }

  test("brierFromBins: Murphy decomposition — hand case, identity, and edge rows") {
    val spark2 = spark
    import spark2.implicits._
    // two bins, hand-computable: bin 0 (n=4, pos=1, conf .2), bin 1
    // (n=4, pos=3, conf .7). ybar = 4/8 = .5
    val bins = Seq(
      (0L, 4L, 1L, 200000L, 250000L, 50000L),
      (1L, 4L, 3L, 700000L, 750000L, 50000L))
      .toDF("bin", "n", "pos", "avg_conf_ppm", "acc_ppm", "gap_ppm")
    val r = TextStats.brierFromBins(bins).collect()(0)
    val (nd, rel, res, unc, brier) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nd === 8L)
    // REL = (4·50000² + 4·50000²) / (8·1e6) = 2500 ppm
    assert(rel === 2500L)
    // RES = (4·250000² + 4·250000²) / (8·1e6) = 62500 ppm
    assert(res === 62500L)
    // UNC = .5·.5 = 250000 ppm
    assert(unc === 250000L)
    assert(brier === rel - res + unc, "the Murphy identity holds by construction")
    // a perfectly calibrated table: REL = 0, brier = UNC - RES
    val perfect = Seq((0L, 10L, 2L, 200000L, 200000L, 0L),
        (1L, 10L, 8L, 800000L, 800000L, 0L))
      .toDF("bin", "n", "pos", "avg_conf_ppm", "acc_ppm", "gap_ppm")
    val p = TextStats.brierFromBins(perfect).collect()(0)
    assert(p.getLong(1) === 0L && p.getLong(4) === p.getLong(3) - p.getLong(2))
    // empty input -> the all-zeros row (the eceFromBins policy)
    val empty = TextStats.brierFromBins(bins.where(col("n") < 0)).collect()(0)
    assert((0 to 4).forall(i => empty.getLong(i) === 0L))
  }

  test("brierFromBins: exact past 2^63 intermediate products") {
    val spark2 = spark
    import spark2.implicits._
    // n = 4e12 per bin: n · gap² ≈ 4e12 · 1e12 = 4e24 — far past Long;
    // the BigInt fold must produce the exact floor
    val big = 4_000_000_000_000L
    val bins = Seq(
      (0L, big, 0L, 1000000L, 0L, 1000000L)) // worst-case gap 1e6
      .toDF("bin", "n", "pos", "avg_conf_ppm", "acc_ppm", "gap_ppm")
    val r = TextStats.brierFromBins(bins).collect()(0)
    // REL = n·(1e6)² / (n·1e6) = 1e6 exactly
    assert(r.getLong(1) === 1000000L)
    assert(r.getLong(3) === 0L) // ybar = 0 -> UNC 0
  }

  test("ece/brier end-to-end agreement: ece small iff rel small on a fitted stream") {
    val spark2 = spark
    import spark2.implicits._
    val rows = (0 until 400).map { i =>
      val conf = i * 2500L
      (conf, if ((i * 2654435761L % 1000) < (i * 1000L / 400)) 1L else 0L)
    }
    val df = rows.toDF("conf", "y").repartition(3)
    val bins = TextStats.calibrationBins(df, col("conf"), col("y"), 10)
    val e = TextStats.eceFromBins(bins).collect()(0)
    val b = TextStats.brierFromBins(bins).collect()(0)
    assert(e.getLong(0) === b.getLong(0), "both read the same N")
    // REL is ece's squared sibling: REL <= max_gap * ece / 1e6 + 1 slack
    assert(b.getLong(1) <= e.getLong(3) * e.getLong(2) / 1000000L + 1L,
      s"rel ${b.getLong(1)} vs mce*ece bound")
    assert(b.getLong(4) === b.getLong(1) - b.getLong(2) + b.getLong(3))
  }

  test("calibratedFuse: sums per-list probabilities, missing contributes nothing") {
    val spark2 = spark
    import spark2.implicits._
    val a = Seq((1L, 10L, 700000L), (1L, 20L, 400000L))
      .toDF("query_id", "doc_id", "calib_ppm")
    val b = Seq((1L, 20L, 500000L), (1L, 30L, 600000L))
      .toDF("query_id", "doc_id", "calib_ppm")
    val out = Ranking.calibratedFuse(Seq(a, b), "doc_id", topK = 5)
      .select("doc_id", "fused_ppm", "n_lists", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (20L, 900000L, 2L, 1L), // 400000 + 500000, two lists
      (10L, 700000L, 1L, 2L),
      (30L, 600000L, 1L, 3L)))
  }
}
