package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoSpec extends SparkSpec {

  test("pointMicro parses quoted georss literals, negatives, and nulls malformed") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      "\"37.250000 -100.500000\"",
      "\"-0.500000 0.000001\"",
      "90.000000 180.000000", // unquoted also accepted
      "\"not a point\"").toDF("o")
    val (la, lo) = Geo.pointMicro(col("o"))
    val out = df.select(la.as("la"), lo.as("lo"))
      .as[(Option[Long], Option[Long])].collect().toSeq
    assert(out === Seq(
      (Some(37250000L), Some(-100500000L)),
      (Some(-500000L), Some(1L)),
      (Some(90000000L), Some(180000000L)),
      (None, None)))
  }

  test("near matches a brute-force box + integer distance rank") {
    val spark2 = spark
    import spark2.implicits._
    // query point (10.0, 20.0), box 2 degrees, k = 3
    val qLat = 10000000L; val qLon = 20000000L; val box = 2000000L
    val pts = Seq(
      (1L, 10100000L, 20100000L), // close
      (2L, 10000000L, 20000000L), // exact hit, dist2 = 0
      (3L, 11900000L, 20000000L), // in box, far on lat
      (4L, 10000000L, 21900000L), // in box, far on lon (cos-shrunk)
      (5L, 13000000L, 20000000L), // outside box (lat)
      (6L, 10000000L, 23000000L), // outside box (lon)
      (7L, -10000000L, 20000000L) // nowhere near
    ).toDF("id", "latm", "lonm").repartition(3)
    val got = Geo.near(pts, "id", col("latm"), col("lonm"), qLat, qLon, box, k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // brute force with the same integer math
    val c = Geo.cosScale(qLat)
    val exp = Seq(
      (1L, 10100000L, 20100000L), (2L, 10000000L, 20000000L),
      (3L, 11900000L, 20000000L), (4L, 10000000L, 21900000L))
      .map { case (id, la, lo) =>
        val dlat = math.abs(la - qLat); val dlon = math.abs(lo - qLon)
        val dlc = (dlon * c) / (1L << Geo.CosShift)
        (id, la, lo, dlat * dlat + dlc * dlc)
      }.sortBy(r => (r._4, r._1)).take(3)
    assert(got === exp)
    // the cos correction must actually shrink lon distance at lat 10
    assert(c < (1L << Geo.CosShift) && c > (1L << Geo.CosShift) * 9 / 10)
  }

  test("nearJoin: per-query k nearest in-box points, heap-aggregate path") {
    val spark2 = spark
    import spark2.implicits._
    def gLat(i: Long) = (i * 96064793L) % 180000001L - 90000000L
    def gLon(i: Long) = (i * 144721393L) % 360000001L - 180000000L
    val pts = (1L to 400L).map(i => (i, gLat(i), gLon(i))).toDF("id", "latm", "lonm")
    val qids = Seq(50L, 150L)
    val qs = qids.map(i => (i, gLat(i), gLon(i), Geo.cosScale(gLat(i))))
      .toDF("qid", "qlatm", "qlonm", "coss")
    val box = 30000000L
    val got = Geo.nearJoin(pts, "id", col("latm"), col("lonm"), qs, box, k = 4)
      .as[(Long, Long, Long)].collect().toSet
    val exp = qids.flatMap { q =>
      val c = Geo.cosScale(gLat(q))
      (1L to 400L).map(i => (i, gLat(i), gLon(i)))
        .filter { case (_, la, lo) =>
          math.abs(la - gLat(q)) <= box && math.abs(lo - gLon(q)) <= box }
        .map { case (i, la, lo) =>
          val dlat = math.abs(la - gLat(q)); val dlon = math.abs(lo - gLon(q))
          val dlc = dlon * c / (1L << Geo.CosShift)
          (q, i, dlat * dlat + dlc * dlc)
        }.sortBy(r => (r._3, r._2)).take(4)
    }.toSet
    assert(got === exp)
    assert(exp.size === 8) // both queries found a full top-4
    // per-query top-k is the heap aggregate: no Sort/Window before it
    val plan = Geo.nearJoin(pts.repartition(3), "id", col("latm"), col("lonm"),
        qs, box, k = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("near plan over stored columns: box reaches PushedFilters, zero Exchanges") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("geo_near").toString
    (1L to 400L).map(i => (i, (i * 96064793) % 180000001L - 90000000L,
      (i * 144721393) % 360000001L - 180000000L)).toDF("id", "latm", "lonm")
      .repartition(4).write.mode("overwrite").parquet(dir)
    val pts = spark.read.parquet(dir)
    val df = Geo.near(pts, "id", col("latm"), col("lonm"),
      37250000L, -100500000L, 30000000L, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    // the RANGE form of the box lands in the parquet scan's pushed
    // filters (an abs() form would push nothing)
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(latm"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(df.count() === 5)
  }
}
