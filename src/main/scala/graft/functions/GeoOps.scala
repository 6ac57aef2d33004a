package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial distance primitives as pure codegen'd column
  * expressions (no UDFs): haversine great-circle distance and a
  * degree-grid cell id for blocking radius joins.
  *
  * Scale pattern for "pairs within R km": never cross-join raw
  * tables — block both sides on [[gridCell]] (cell size ≥ R in
  * degrees), join each point to its 3×3 neighbor cells, THEN apply
  * the exact [[haversineKm]] filter. The candidate join is
  * equi-keyed (shuffle-bounded by cell population), the trig runs
  * map-side post-join.
  */
object GeoOps {

  /** Mean-earth radius (IUGG) in km. */
  val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2)
    * in degrees — the standard haversine form, numerically stable for
    * small distances (asin of a sqrt, no acos cancellation). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column,
      lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2.0 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Integer grid cell for blocking: floor(lat/size), floor(lon/size)
    * packed into one long. `sizeDeg` must be ≥ the search radius in
    * degrees at the highest latitude of interest. */
  def gridCell(lat: Column, lon: Column, sizeDeg: Double): Column =
    floor(lat / sizeDeg).cast("long") * 100000L +
      floor(lon / sizeDeg).cast("long")

  /** Radius join "all (a, b) pairs within R km" at scale — the
    * pattern this object's doc describes, as an operator: grid-cell
    * both sides, join each a-point to its 3×3 neighbor cells
    * (equi-keyed — shuffle bounded by cell population, never a
    * cross join), then keep pairs passing the exact [[haversineKm]]
    * filter. Every qualifying pair is found exactly once (one cell
    * per b-point, one (dx,dy) matches it).
    *
    * CALLER CONTRACT: `cellSizeDeg` must be ≥ the radius expressed
    * in degrees at the maximum |latitude| of the data —
    * R / (111.32 · cos(maxLat)) for longitude; violating it loses
    * pairs near cell corners. Input frames must not share column
    * names. Deterministic: cells are floors of identical double
    * expressions; the distance is the shared haversine form. */
  def radiusJoin(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame,
      latA: String, lonA: String, latB: String, lonB: String,
      radiusKm: Double, cellSizeDeg: Double):
      org.apache.spark.sql.DataFrame = {
    require(radiusKm > 0, s"radiusKm > 0, got $radiusKm")
    require(cellSizeDeg > 0, s"cellSizeDeg > 0, got $cellSizeDeg")
    val ca = a
      .withColumn("__o__", explode(expr(
        "transform(sequence(0, 8), " +
          "i -> struct(i div 3 - 1 AS dx, i % 3 - 1 AS dy))")))
      .withColumn("__jlat__",
        floor(col(latA) / cellSizeDeg).cast("long") +
          col("__o__.dx"))
      .withColumn("__jlon__",
        floor(col(lonA) / cellSizeDeg).cast("long") +
          col("__o__.dy"))
      .drop("__o__")
    val cb = b
      .withColumn("__jlat__",
        floor(col(latB) / cellSizeDeg).cast("long"))
      .withColumn("__jlon__",
        floor(col(lonB) / cellSizeDeg).cast("long"))
    ca.join(cb, Seq("__jlat__", "__jlon__"))
      .withColumn("distance_km",
        haversineKm(col(latA), col(lonA), col(latB), col(lonB)))
      .filter(col("distance_km") <= radiusKm)
      .drop("__jlat__", "__jlon__")
  }
}
