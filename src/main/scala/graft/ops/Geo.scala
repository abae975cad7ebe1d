package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Spatial within-distance join on lat/lon points — the geo companion to
 * the equi-key blocking family (LSH bands, Jaro length blocks, interval
 * buckets): a naive "all points within D km" is a cross join, but
 * bucketing both sides into `cellDeg`-degree grid cells and exploding
 * ONE side into its 3×3 cell neighborhood turns it into an EQUI-join on
 * the cell key — provably lossless when a cell is at least as wide (in
 * km, at the worst latitude the data reaches) as the search radius, so
 * every true pair shares at least one of the 9 probed cells.
 *
 * Distances are great-circle haversine (R = 6371.0088 km, the IUGG mean
 * radius) built from codegen'd trig columns — no UDF; the DuckDB oracle
 * replays the identical formula and proves losslessness by brute-force
 * cross join at gate scale.
 *
 * Scale shape: one narrow cell projection per side, a 9× explode of the
 * LEFT side (metadata-cheap: 9 rows per point), one equi-join shuffle
 * on the cell key, then the exact distance filter. Each right-side point
 * lives in exactly one cell, so no pair is produced twice — no distinct
 * needed. Skewed cells (a city) are plain hot equi-join keys — AQE skew
 * split applies, and the salting lever composes if one cell dominates.
 */
object Geo {

  private val EarthRadiusKm = 6371.0088
  /** km per degree of latitude (2πR/360). */
  private val KmPerDeg = 2.0 * math.Pi * EarthRadiusKm / 360.0

  /** Great-circle distance in km between two (lat, lon) pairs given in
   * degrees — the standard haversine form, numerically stable for the
   * small distances blocking leaves behind. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column,
      lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2.0 * EarthRadiusKm) * asin(sqrt(a))
  }

  /**
   * All (left, right) pairs within `maxKm` great-circle km. `maxAbsLat`
   * is the caller's bound on |latitude| in EITHER input (degrees) — the
   * losslessness precondition is checked against it: a cell must span
   * ≥ maxKm of longitude at that latitude (longitude degrees shrink by
   * cos(lat), so near-polar data needs wider cells or a pre-split).
   * Output: left id, right id, dist_km (3dp).
   */
  def withinDistanceJoin(
      left: DataFrame, leftId: String, leftLat: String, leftLon: String,
      right: DataFrame, rightId: String, rightLat: String, rightLon: String,
      maxKm: Double, cellDeg: Double, maxAbsLat: Double): DataFrame = {
    require(maxKm > 0 && cellDeg > 0, "maxKm and cellDeg must be positive")
    require(maxAbsLat >= 0 && maxAbsLat < 90,
      s"maxAbsLat must be in [0, 90): $maxAbsLat")
    val lonKmPerDeg = KmPerDeg * math.cos(math.toRadians(maxAbsLat))
    require(cellDeg * lonKmPerDeg >= maxKm && cellDeg * KmPerDeg >= maxKm,
      f"cellDeg=$cellDeg%.3f spans ${cellDeg * lonKmPerDeg}%.1f km of " +
        f"longitude at lat $maxAbsLat%.1f — below maxKm=$maxKm%.1f km, " +
        "the 3x3 neighborhood would miss true pairs; widen cellDeg")
    def cellX(lon: Column) = floor(lon / cellDeg).cast("long")
    def cellY(lat: Column) = floor(lat / cellDeg).cast("long")
    val l = left.select(col(leftId).as("_lid"),
      col(leftLat).cast("double").as("_llat"),
      col(leftLon).cast("double").as("_llon"))
    val r = right.select(col(rightId).as("_rid"),
      col(rightLat).cast("double").as("_rlat"),
      col(rightLon).cast("double").as("_rlon"))
    // LEFT explodes to its 3x3 neighborhood; RIGHT keeps its single cell
    val lx = l.select(col("_lid"), col("_llat"), col("_llon"),
      explode(sequence(lit(-1), lit(1))).as("_dx"))
      .select(col("_lid"), col("_llat"), col("_llon"),
        (cellX(col("_llon")) + col("_dx")).as("_cx"),
        explode(sequence(lit(-1), lit(1))).as("_dy"))
      .select(col("_lid"), col("_llat"), col("_llon"), col("_cx"),
        (cellY(col("_llat")) + col("_dy")).as("_cy"))
    val rx = r.select(col("_rid"), col("_rlat"), col("_rlon"),
      cellX(col("_rlon")).as("_cx"), cellY(col("_rlat")).as("_cy"))
    lx.join(rx, Seq("_cx", "_cy"))
      .withColumn("_d", haversineKm(col("_llat"), col("_llon"),
        col("_rlat"), col("_rlon")))
      .filter(col("_d") <= maxKm)
      .select(col("_lid").as(leftId), col("_rid").as(rightId),
        round(col("_d"), 3).as("dist_km"))
  }
}
