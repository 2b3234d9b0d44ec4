package graft

import org.apache.spark.sql.functions._
import graft.scale.Geo

/** Grid-blocked radius join vs brute force, including the antimeridian
  * seam and the cell-border cases the 3×3 probe must cover.
  */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Double, Double)],
      queries: Seq[Long], radiusKm: Double): Set[(Long, Long)] = {
    def hav(a: (Double, Double), b: (Double, Double)): Double = {
      val rad = math.Pi / 180.0
      val sLat = math.sin((b._1 - a._1) * rad / 2.0)
      val sLon = math.sin((b._2 - a._2) * rad / 2.0)
      val h = sLat * sLat +
        math.cos(a._1 * rad) * math.cos(b._1 * rad) * (sLon * sLon)
      math.asin(math.sqrt(math.min(1.0, h))) * 12742.0176
    }
    val byId = pts.map(p => p._1 -> (p._2, p._3)).toMap
    (for {
      q <- queries
      p <- pts.map(_._1) if p != q
      d = hav(byId(q), byId(p))
      if BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP) <=
        BigDecimal(radiusKm)
    } yield (q, p)).toSet
  }

  test("gridRadiusJoin matches brute force incl. antimeridian wrap") {
    // pairs straddling ±180°, a cell border at 1.5°, and isolated points
    val pts = Seq(
      (1L, 10.0, 179.9), (2L, 10.0, -179.9),   // ~22 km apart across seam
      (3L, 10.0, 178.6), (4L, 10.0, 179.4),    // cross the 178.5/180 border
      (5L, -29.9, 0.1), (6L, -29.2, 0.2),      // near the lat floor
      (7L, 20.0, 60.0),                        // isolated
      (8L, 1.49, 1.49), (9L, 1.51, 1.51))      // diagonal cell-corner hop
    val df = pts.toDF("id", "lat", "lon")
    val queries = df
    // 120 km ≤ 1.5° · 111.195 · cos(30°) = 144.4 km — precondition holds
    val got = Geo.gridRadiusJoin(queries, df, "id", "lat", "lon", 120.0, 1.5)
      .select("query_id", "point_id").as[(Long, Long)].collect().toSet
    val want = brute(pts, pts.map(_._1), 120.0)
    assert(got == want, s"grid=${got.toSeq.sorted} brute=${want.toSeq.sorted}")
    assert(got.contains((1L, 2L)) && got.contains((2L, 1L)),
      "antimeridian neighbors missed")
    assert(!got.exists(p => p._1 == 7L || p._2 == 7L))
  }

  test("gridRadiusJoin is symmetric when queries = points") {
    val pts = (0L until 60L).map(i =>
      (i + 1, (i % 20) * 0.3, (i / 20) * 0.3 - 179.8))
    val df = pts.toDF("id", "lat", "lon")
    val got = Geo.gridRadiusJoin(df, df, "id", "lat", "lon", 180.0, 2.0)
      .select("query_id", "point_id").as[(Long, Long)].collect().toSet
    assert(got.nonEmpty)
    assert(got.forall { case (a, b) => got.contains((b, a)) })
  }

  test("gridRadiusJoin rejects a cell grid that does not tile 360°") {
    intercept[IllegalArgumentException] {
      Geo.gridRadiusJoin(
        Seq((1L, 0.0, 0.0)).toDF("id", "lat", "lon"),
        Seq((2L, 0.0, 1.0)).toDF("id", "lat", "lon"),
        "id", "lat", "lon", 100.0, 1.7)
    }
  }
}
