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
