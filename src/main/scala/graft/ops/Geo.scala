package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Geo `near` queries over georss point literals — the last of the three
  * DQL acceptance semantics the produced data must support (reference
  * README.md:208-311: `eq(<xid>, …)` = external-id lookup, `@*` language
  * expansion = node/object languages, `near(geo…)` = this). The reference
  * delegates `near` to Dgraph's geo index; here it is a first-class query:
  * bounding-box prefilter + exact ranked distance.
  *
  * All coordinate math is integer micro-degrees (BIGINT), so every engine
  * ranks identically — a float haversine would be ulp-hazardous at the
  * radius boundary (the same argument as Sampling's integer A-Res keys).
  * The distance surrogate is the squared equirectangular approximation
  *
  *   dist2 = dLat² + ((dLon · cosScale(qLat)) div 2^20)²
  *
  * with `cosScale` a driver-computed literal — a monotone stand-in for
  * true distance at city/region radii (the regime a geo index serves),
  * exact in BIGINT. Both `div` operands are non-negative (`abs` first),
  * so truncating and flooring division agree across engines.
  *
  * Scale shape: the box filter is a RANGE conjunction on the coordinate
  * columns themselves (`lat BETWEEN q−box AND q+box` — not `abs(...)`,
  * which no source can push), so when the coordinates are stored columns
  * it reaches the parquet scan as `PushedFilters` and row groups whose
  * lat/lon stats miss the box are skipped. The top-k is
  * `orderBy().limit(k)` = TakeOrderedAndProject: per-task k-heaps, one
  * ≤k-row merge, ZERO Exchanges in the whole plan.
  */
object Geo {

  /** Fixed-point scale: 2^20 for the cos factor, 10^6 for degrees. */
  val CosShift = 20
  val MicroPerDeg = 1000000L

  /** `cos(qLat)` scaled to 2^20, rounded — the per-query literal both the
    * plan and any oracle bake in. */
  def cosScale(qLatMicro: Long): Long =
    math.round(math.cos(qLatMicro.toDouble / MicroPerDeg * math.Pi / 180.0) *
      (1L << CosShift))

  /** Parse a georss `"lat lon"` literal (optionally quoted, same shape
    * GeoJson.pointsToGeoJson consumes) into micro-degree BIGINTs.
    * Decimal-string → DECIMAL(16,6) → ×10^6 is exact in every engine;
    * malformed tokens become null (`try_cast`) instead of failing the
    * job under ANSI. Returns (latMicro, lonMicro) columns. */
  def pointMicro(o: Column): (Column, Column) = {
    val parts = split(regexp_replace(o, "\"", ""), " ")
    def micro(i: Int): Column =
      (get(parts, lit(i)).try_cast(DecimalType(16, 6)) * lit(MicroPerDeg))
        .cast("long")
    (micro(0), micro(1))
  }

  /** The `near(geo: [qLat, qLon], box)` query: rows whose point falls in
    * the ±`boxMicro` square around the query point, ranked by the exact
    * integer distance surrogate, top `k` (ties by `idCol` — total order).
    * Output: (id, latm, lonm, dist2). */
  def near(
      points: DataFrame, idCol: String, latMicro: Column, lonMicro: Column,
      qLatMicro: Long, qLonMicro: Long, boxMicro: Long, k: Int): DataFrame = {
    require(k >= 1, s"near: k must be >= 1, got $k")
    require(boxMicro >= 1, s"near: boxMicro must be >= 1, got $boxMicro")
    val c = cosScale(qLatMicro)
    points
      .withColumn("latm", latMicro)
      .withColumn("lonm", lonMicro)
      // range form, not abs(): pushable to the scan for stored columns
      .where(col("latm").between(qLatMicro - boxMicro, qLatMicro + boxMicro) &&
        col("lonm").between(qLonMicro - boxMicro, qLonMicro + boxMicro))
      .withColumn("_dlat", abs(col("latm") - lit(qLatMicro)))
      .withColumn("_dlon", abs(col("lonm") - lit(qLonMicro)))
      .withColumn("_dlc", expr(s"(_dlon * $c) div ${1L << CosShift}"))
      .withColumn("dist2", col("_dlat") * col("_dlat") + col("_dlc") * col("_dlc"))
      .orderBy(col("dist2"), col(idCol))
      .limit(k)
      .select(col(idCol), col("latm"), col("lonm"), col("dist2"))
  }

  /** Spatial kNN JOIN — the multi-query form of [[near]]: for EACH query
    * point, the `k` nearest corpus points inside its ±`boxMicro` square.
    *
    * `queries` is a SMALL frame (broadcast contract, like every ANN
    * query set) with columns `(qid: bigint, qlatm: bigint, qlonm:
    * bigint, coss: bigint)` — `coss` is the per-query [[cosScale]]
    * factor PRECOMPUTED by the caller: an in-plan float `cos()` would
    * differ in the last ulp across engines and flip boundary ranks,
    * exactly the hazard the integer surrogate exists to kill.
    *
    * Scale shape: the corpus side is box-filtered in the broadcast
    * nested-loop join (range conjunction — each corpus row tests Q
    * boxes, Q small); survivors ship ONLY `(qid, id, dist2)` short rows
    * into the per-query top-k, which is the
    * [[graft.functions.TopKByKeyAgg]] typed aggregate — partial k-heaps
    * per task, no sort, no window, ≤k rows per query cross the
    * shuffle. */
  def nearJoin(
      points: DataFrame, idCol: String, latMicro: Column, lonMicro: Column,
      queries: DataFrame, boxMicro: Long, k: Int): DataFrame = {
    require(k >= 1, s"nearJoin: k must be >= 1, got $k")
    require(boxMicro >= 1, s"nearJoin: boxMicro must be >= 1, got $boxMicro")
    val pts = points
      .withColumn("latm", latMicro)
      .withColumn("lonm", lonMicro)
      .select(col(idCol).cast("long").as("_pid"), col("latm"), col("lonm"))
    val joined = pts.join(broadcast(queries),
      col("latm").between(col("qlatm") - boxMicro, col("qlatm") + boxMicro) &&
        col("lonm").between(col("qlonm") - boxMicro, col("qlonm") + boxMicro))
      .withColumn("_dlat", abs(col("latm") - col("qlatm")))
      .withColumn("_dlon", abs(col("lonm") - col("qlonm")))
      .withColumn("_dlc", expr(s"(_dlon * coss) div ${1L << CosShift}"))
      .withColumn("dist2", col("_dlat") * col("_dlat") + col("_dlc") * col("_dlc"))
    joined
      .groupBy(col("qid"))
      .agg(graft.functions.TopKByKeyAgg.topKByKey(
        col("dist2"), col("_pid"), col("dist2"), k).as("picks"))
      .select(col("qid"), explode(col("picks")).as("e"))
      .select(col("qid"), col("e.id").as(idCol), col("e.skey").as("dist2"))
  }
}
