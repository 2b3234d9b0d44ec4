package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-blocked geospatial operators.
  *
  * The scale problem: "all corpus points within R km of each query point"
  * is a θ-join on a distance predicate — materialized naively it is an
  * all-pairs cross join, the same quadratic trap as fixed-key entity-match
  * blocking. The standard fix (uniform grid spatial blocking, the planar
  * cousin of the banded-LSH trick the dedup family uses) converts it into
  * an EQUI-join: bucket every point into a lat/lon cell at least as wide
  * as the search radius, replicate each QUERY into its 3×3 cell
  * neighborhood, and equi-join on the cell key. Every candidate within R
  * of a query is in an adjacent cell by construction, so the grid phase
  * has no false negatives; the exact haversine predicate then verifies
  * candidates. Candidate mass tracks true spatial density, never corpus².
  */
object Geo {

  /** Haversine great-circle distance in km over degree coordinates — the
    * same constants as [[graft.transform.TransformProgram.HaversineKm]]
    * (mean Earth diameter 12742.0176 km) so the two geo families agree,
    * with the same h ≤ 1 clamp against FP rounding at antipodes.
    */
  def haversineKm(la1: Column, lo1: Column, la2: Column, lo2: Column): Column = {
    // π/180 as ONE precomputed double, sin bound once and squared by
    // self-multiplication (not pow, whose x² path is engine-specific) —
    // the DuckDB oracle mirrors this exact operation order so both
    // engines produce the identical IEEE double before the 3-decimal
    // round.
    val rad = lit(math.Pi / 180.0)
    val sLat = sin((la2 - la1) * rad / 2.0)
    val sLon = sin((lo2 - lo1) * rad / 2.0)
    val h = sLat * sLat + cos(la1 * rad) * cos(la2 * rad) * (sLon * sLon)
    asin(sqrt(least(lit(1.0), h))) * 12742.0176
  }

  /** All corpus points within `radiusKm` of each query point, via uniform
    * grid blocking. Both inputs need (`idCol`, `latCol`, `lonCol`).
    *
    * Correctness precondition (checked nowhere cheaper than the caller):
    * `cellDeg` degrees must span at least `radiusKm` km in BOTH axes over
    * the data's latitude range, i.e.
    * `cellDeg * 111.195 * cos(maxAbsLat) >= radiusKm` — otherwise a true
    * neighbor can sit 2 cells away and the 3×3 probe misses it. 360 must
    * divide evenly into longitude cells (`360 / cellDeg` integral) so the
    * antimeridian seam wraps onto a valid cell index; the modulo below
    * then makes ±180° adjacency work like any other cell border.
    *
    * Plan shape: queries replicate ×9 (explode over the fixed offset
    * array), corpus points bucket once; one equi-join on the (cellLat,
    * cellLon) pair; the haversine verify runs only on co-cell candidates.
    * Distances are compared 3-decimal-ROUNDED (both engines round the
    * same double, so the radius boundary cannot sit inside libm noise).
    */
  def gridRadiusJoin(
      queries: DataFrame,
      points: DataFrame,
      idCol: String,
      latCol: String,
      lonCol: String,
      radiusKm: Double,
      cellDeg: Double): DataFrame = {
    require(radiusKm > 0, "radius must be positive")
    require(cellDeg > 0, "cell size must be positive")
    val nLonCells = math.round(360.0 / cellDeg)
    require(math.abs(nLonCells * cellDeg - 360.0) < 1e-9,
      s"360 must be an integral number of cells, got 360/$cellDeg")
    def cellLat(lat: Column): Column = floor(lat / cellDeg).cast("long")
    def cellLon(lon: Column): Column =
      pmod(floor((lon + 180.0) / cellDeg).cast("long"), lit(nLonCells))
    val pts = points.select(
      col(idCol).as("point_id"),
      col(latCol).as("p_lat"), col(lonCol).as("p_lon"),
      cellLat(col(latCol)).as("cl"), cellLon(col(lonCol)).as("cn"))
    val offsets = array((-1 to 1).flatMap(dy => (-1 to 1).map(dx =>
      struct(lit(dy.toLong).as("dy"), lit(dx.toLong).as("dx")))): _*)
    val qs = queries.select(
        col(idCol).as("query_id"),
        col(latCol).as("q_lat"), col(lonCol).as("q_lon"),
        cellLat(col(latCol)).as("qcl"), cellLon(col(lonCol)).as("qcn"))
      .withColumn("__o", explode(offsets))
      .select(col("query_id"), col("q_lat"), col("q_lon"),
        (col("qcl") + col("__o.dy")).as("cl"),
        pmod(col("qcn") + col("__o.dx"), lit(nLonCells)).as("cn"))
    qs.join(pts, Seq("cl", "cn"))
      .filter(col("query_id") =!= col("point_id"))
      .withColumn("dist_km", round(haversineKm(
        col("q_lat"), col("q_lon"), col("p_lat"), col("p_lon")), 3))
      .filter(col("dist_km") <= radiusKm)
      .select(col("query_id"), col("point_id"), col("dist_km"))
  }
}
