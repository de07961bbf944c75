package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def scalaHaversine(lat1: Double, lon1: Double,
      lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * Geo.EarthRadiusKm * math.asin(math.sqrt(a))
  }

  test("haversine matches a scala reference and known distances") {
    val pts = Seq((0.0, 0.0), (0.0, 1.0), (52.52, 13.405), (48.8566, 2.3522))
      .toDF("lat", "lon")
    val got = pts.select(col("lat"), col("lon"),
        Geo.haversineKm(col("lat"), col("lon"), 0.0, 0.0).as("d"))
      .as[(Double, Double, Double)].collect()
    got.foreach { case (lat, lon, d) =>
      assert(math.abs(d - scalaHaversine(lat, lon, 0.0, 0.0)) < 1e-6)
    }
    // one degree of longitude at the equator ≈ 111.19 km
    val oneDeg = got.find(r => r._1 == 0.0 && r._2 == 1.0).get._3
    assert(math.abs(oneDeg - 111.19) < 0.1)
  }

  test("inPolygon matches a scala ray-casting reference on a concave polygon") {
    import spark.implicits._
    val ring = Seq((-60.0, -30.0), (0.0, 45.0), (60.0, -30.0), (0.0, 0.0))
    def refInside(lat: Double, lon: Double): Boolean = {
      val edges = ring.zip(ring.tail :+ ring.head)
      edges.count { case ((xi, yi), (xj, yj)) =>
        ((yi > lat) != (yj > lat)) &&
          lon < (xj - xi) * (lat - yi) / (yj - yi) + xi
      } % 2 == 1
    }
    val pts = for { la <- -50 to 50 by 7; lo <- -80 to 80 by 9 }
      yield (la.toDouble + 0.1, lo.toDouble + 0.1)
    val df = pts.toDF("lat", "lon")
      .withColumn("in", Geo.inPolygon(col("lat"), col("lon"), ring))
    val got = df.select("lat", "lon", "in")
      .as[(Double, Double, Boolean)].collect()
    got.foreach { case (la, lo, in) =>
      assert(in == refInside(la, lo), s"($la,$lo)")
    }
    // sanity: the concave notch (just above D=(0,0), inside the hull
    // but outside the dart) is excluded; a clearly-inside point is kept
    assert(!refInside(-20.0, 0.0) || got.exists(p => p._1 == -20.0))
    assert(got.exists { case (la, _, in) => la == 20.1 && in })
  }

  test("bbox handles the antimeridian wrap") {
    val pts = Seq((0.0, 179.5), (0.0, -179.5), (0.0, 0.0)).toDF("lat", "lon")
    val in = pts.filter(Geo.inBBox(col("lat"), col("lon"), -10, 10, 170, -170))
      .as[(Double, Double)].collect().toSet
    assert(in == Set((0.0, 179.5), (0.0, -179.5)))
  }
}
