package graft

// (radiusJoin specs appended below by round 7)

import org.apache.spark.sql.functions._
import graft.functions.GeoOps

/** Haversine + grid-cell blocking specs. */
class GeoOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def km(lat1: Double, lon1: Double, lat2: Double,
      lon2: Double): Double =
    Seq((lat1, lon1, lat2, lon2)).toDF("a", "b", "c", "d")
      .select(GeoOps.haversineKm(col("a"), col("b"), col("c"),
        col("d"))).as[Double].head()

  test("haversine known distances") {
    // London (51.5074, -0.1278) <-> Paris (48.8566, 2.3522) ≈ 343.6 km
    km(51.5074, -0.1278, 48.8566, 2.3522) shouldBe (343.6 +- 1.0)
    // one degree of longitude at the equator ≈ 111.19 km
    km(0, 0, 0, 1) shouldBe (111.19 +- 0.05)
    // zero distance
    km(42.0, 13.0, 42.0, 13.0) shouldBe 0.0
    // antipodal: half the earth circumference ≈ π·R
    km(0, 0, 0, 180) shouldBe (math.Pi * GeoOps.EarthRadiusKm +- 0.01)
  }

  test("grid-cell blocking: close pairs land in same or adjacent cells") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(300)((rnd.nextDouble() * 10 + 40,
      rnd.nextDouble() * 10))
    val sizeDeg = 1.0
    val df = pts.toDF("lat", "lon")
      .withColumn("cell", GeoOps.gridCell(col("lat"), col("lon"), sizeDeg))
    val rows = df.select("lat", "lon", "cell")
      .as[(Double, Double, Long)].collect()
    def localKm(la1: Double, lo1: Double, la2: Double,
        lo2: Double): Double = {
      val dLat = math.toRadians(la2 - la1) / 2
      val dLon = math.toRadians(lo2 - lo1) / 2
      val a = math.sin(dLat) * math.sin(dLat) +
        math.cos(math.toRadians(la1)) * math.cos(math.toRadians(la2)) *
          math.sin(dLon) * math.sin(dLon)
      2 * GeoOps.EarthRadiusKm * math.asin(math.sqrt(a))
    }
    // column path agrees with the local reference formula
    val (sla, slo, _) = rows.head
    km(sla, slo, rows(1)._1, rows(1)._2) shouldBe
      (localKm(sla, slo, rows(1)._1, rows(1)._2) +- 1e-9)
    for {
      (la1, lo1, c1) <- rows
      (la2, lo2, c2) <- rows
      if localKm(la1, lo1, la2, lo2) < 50.0 // well under 1 deg at lat 40-50
    } {
      val (r1, q1) = (c1 / 100000L, c1 % 100000L)
      val (r2, q2) = (c2 / 100000L, c2 % 100000L)
      math.abs(r1 - r2) should be <= 1L
      math.abs(q1 - q2) should be <= 1L
    }
  }

  test("radiusJoin finds exactly the brute-force pairs, " +
    "including across cell boundaries") {
    import spark.implicits._
    import graft.functions.GeoOps
    // points straddling the lat-cell boundary at 3.7deg multiples
    val a = Seq((1L, 3.69, 10.0), (2L, 40.0, 10.0), (3L, -10.0, 50.0))
      .toDF("aid", "alat", "alon")
    val b = Seq((10L, 3.72, 10.05), (20L, 40.4, 10.0),
      (30L, -10.0, 58.0), (40L, 3.70, 10.01))
      .toDF("bid", "blat", "blon")
    val got = GeoOps.radiusJoin(a, b, "alat", "alon", "blat",
      "blon", radiusKm = 60.0, cellSizeDeg = 3.7)
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force with the same haversine
    val want = (for {
      (ai, ala, alo) <- Seq((1L, 3.69, 10.0), (2L, 40.0, 10.0),
        (3L, -10.0, 50.0))
      (bi, bla, blo) <- Seq((10L, 3.72, 10.05), (20L, 40.4, 10.0),
        (30L, -10.0, 58.0), (40L, 3.70, 10.01))
      dLat = math.toRadians(bla - ala) / 2
      dLon = math.toRadians(blo - alo) / 2
      h = math.sin(dLat) * math.sin(dLat) +
        math.cos(math.toRadians(ala)) * math.cos(math.toRadians(bla)) *
          math.sin(dLon) * math.sin(dLon)
      if 2 * 6371.0088 * math.asin(math.sqrt(h)) <= 60.0
    } yield (ai, bi)).toSet
    got shouldBe want
    // the cross-boundary pair (1 -> 10/40) must be present
    got should contain((1L, 10L))
    got should contain((1L, 40L))
    // far pair excluded
    got should not contain ((3L, 30L))
  }
}
