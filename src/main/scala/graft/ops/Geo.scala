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
}
