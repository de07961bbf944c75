package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C13 phase-2 — geo predicates over `gp_` point fields.
  *
  * The reference stores `gp_` geo_points (models/indexing.py:90-93) and
  * renders them client-side (`web/src/components/search/types.ts:103`);
  * no server-side geo predicate exists there. These are our additions,
  * all plain column math (codegen'd, pushdown-friendly):
  *
  * - [[inBBox]] / [[sqDegreeDist]] are pure arithmetic — deterministic
  *   across engines, used in the oracle-gated query.
  * - [[haversineKm]] uses trig, whose last-ulp behavior differs between
  *   libm implementations — spec-verified against a Scala reference
  *   instead of being hash-gated (same policy as BM25 scoring, SURVEY O3).
  */
object Geo {

  /** Bounding-box containment, inclusive; handles the antimeridian when
    * lonMin > lonMax (box wraps). */
  def inBBox(lat: Column, lon: Column, latMin: Double, latMax: Double,
      lonMin: Double, lonMax: Double): Column = {
    val latOk = lat.between(latMin, latMax)
    val lonOk =
      if (lonMin <= lonMax) lon.between(lonMin, lonMax)
      else lon >= lonMin || lon <= lonMax
    latOk && lonOk
  }

  /** Squared distance in degree space — monotone with true distance for
    * small extents; exact-arithmetic, so nearest-k rankings are
    * engine-stable. */
  def sqDegreeDist(lat: Column, lon: Column, lat0: Double, lon0: Double): Column =
    (lat - lat0) * (lat - lat0) + (lon - lon0) * (lon - lon0)

  /** Point-in-polygon via ray casting, for `gs_` geometry criteria:
    * counts edges crossed by the +x ray from the point; odd ⇒ inside.
    * Vertices are (lon, lat) in ring order (open ring — the closing
    * edge is added here); works for convex AND concave simple polygons.
    * The polygon is a plan-time literal, so the test expands to a fixed
    * sum of per-edge CASE terms — pure double arithmetic, identical in
    * any engine (the oracle reproduces it term by term), codegen'd, no
    * UDF. Points exactly ON an edge follow ray-casting's half-open
    * convention (deterministic, both engines identical). */
  def inPolygon(lat: Column, lon: Column, ring: Seq[(Double, Double)]): Column = {
    require(ring.size >= 3, "polygon needs >= 3 vertices")
    val edges = ring.zip(ring.tail :+ ring.head)
    val crossings = edges.map { case ((xi, yi), (xj, yj)) =>
      val straddles = (lit(yi) > lat) =!= (lit(yj) > lat)
      val xCross = (lit(xj - xi) * (lat - yi)) / lit(yj - yi) + lit(xi)
      when(straddles && (lon < xCross), 1).otherwise(0)
    }.reduce(_ + _)
    crossings % 2 === 1
  }

  val EarthRadiusKm = 6371.0088

  /** Great-circle distance (haversine), km. */
  def haversineKm(lat: Column, lon: Column, lat0: Double, lon0: Double): Column = {
    val dLat = radians(lat - lat0)
    val dLon = radians(lon - lon0)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lit(lat0))) * cos(radians(lat)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }
}
