package graft

import org.apache.spark.sql.functions._
import graft.stats.StatsOps

/** Closed-form linear-model Shapley attribution (q453). */
class LinearShapSpec extends SparkSpecBase {
  import spark.implicits._

  // exact linear process: y = 3 + 2*x1 - x2 (integer-valued, no noise)
  private lazy val exact = (0 until 500).map { i =>
    val x1 = (i * 7) % 23; val x2 = (i * 3) % 11
    (i.toLong, x1.toLong, x2.toLong, (3 + 2 * x1 - x2).toLong)
  }.toDF("id", "x1", "x2", "y")

  test("on an exact linear process the prediction reconstructs y " +
      "and phi_i = b_i(x_i - mean)") {
    val s = StatsOps.linearShap(exact, "y", "x1", "x2", Seq("id", "y"))
    val bad = s.filter(abs(col("prediction") - col("y")) > 1e-6).count()
    bad shouldBe 0L
    // phi1 of a row with x1 at the mean is 0
    val xb1 = exact.agg(avg("x1")).head().getDouble(0)
    val nearMean = s.filter(abs(col("x1") - xb1) < 1e-9)
    nearMean.filter(abs(col("phi1")) > 1e-6).count() shouldBe 0L
  }

  test("efficiency axiom: contributions sum to zero over the " +
      "dataset and baseline is the mean response") {
    val s = StatsOps.linearShap(exact, "y", "x1", "x2", Seq("id"))
    val agg = s.agg(sum("phi1"), sum("phi2"), first("baseline"),
      count(lit(1))).head()
    math.abs(agg.getDouble(0)) should be < 1e-3
    math.abs(agg.getDouble(1)) should be < 1e-3
    val ybar = exact.agg(avg("y")).head().getDouble(0)
    approx(agg.getDouble(2), math.rint(ybar * 1e6) / 1e6, 1e-6)
  }

  test("attributions agree with multipleRegression2 coefficients: " +
      "phi_i / (x_i - mean) recovers b_i") {
    val coefs = StatsOps.multipleRegression2(exact, "y", "x1", "x2")
      .collect().map(r => r.getAs[String]("term") ->
        r.getAs[Double]("coef")).toMap
    val s = StatsOps.linearShap(exact, "y", "x1", "x2", Seq("id"))
    val xb1 = exact.agg(avg("x1")).head().getDouble(0)
    val row = s.filter(col("x1") =!= math.round(xb1)).head()
    val b1hat = row.getAs[Double]("phi1") /
      (row.getAs[Long]("x1") - xb1)
    approx(b1hat, coefs("x1"), 1e-4)
  }
}
