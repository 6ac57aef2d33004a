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
}
