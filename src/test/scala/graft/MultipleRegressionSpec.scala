package graft

import graft.stats.StatsOps

/** Two-predictor multiple regression with inference (§2.12, reference
  * src/stats/regression/mod.rs linear_regression). Expected values
  * computed independently with numpy.linalg.lstsq + normal-CDF
  * p-values on the same fixed dataset. */
class MultipleRegressionSpec extends SparkSpecBase {
  import spark.implicits._

  test("multipleRegression2 matches numpy on a fixed dataset") {
    val x1 = Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
    val x2 = Seq(2, 1, 4, 3, 6, 5, 8, 7, 10, 9)
    val y = Seq(5, 4, 11, 9, 17, 14, 23, 20, 29, 26)
    val df = x1.indices.map(i => (y(i).toLong, x1(i).toLong,
      x2(i).toLong)).toDF("y", "x1", "x2")
    val out = StatsOps.multipleRegression2(df, "y", "x1", "x2")
      .collect().map(r => r.getAs[String]("term") -> r).toMap
    val b0 = out("intercept"); val b1 = out("x1"); val b2 = out("x2")
    approx(b0.getAs[Double]("coef"), -0.0125, 1e-6)
    approx(b0.getAs[Double]("std_err"), 0.364955, 1e-6)
    approx(b0.getAs[Double]("t_stat"), -0.034251, 1e-6)
    approx(b0.getAs[Double]("p_value"), 0.972677, 1e-4)
    approx(b1.getAs[Double]("coef"), 0.2375, 1e-6)
    approx(b1.getAs[Double]("std_err"), 0.169492, 1e-6)
    approx(b1.getAs[Double]("t_stat"), 1.401243, 1e-6)
    approx(b1.getAs[Double]("p_value"), 0.161142, 1e-4)
    approx(b2.getAs[Double]("coef"), 2.6375, 1e-6)
    approx(b2.getAs[Double]("std_err"), 0.169492, 1e-6)
    approx(b2.getAs[Double]("t_stat"), 15.561168, 1e-6)
    approx(b2.getAs[Double]("p_value"), 0.0, 1e-6)
  }

  test("uncorrelated predictor gets ~zero coefficient") {
    // y depends only on x1; x2 cycles independently
    val df = (1 to 60).map(i =>
      ((7L * i + 3), i.toLong, (i % 5).toLong)).toDF("y", "x1", "x2")
    val out = StatsOps.multipleRegression2(df, "y", "x1", "x2")
      .collect().map(r => r.getAs[String]("term") -> r).toMap
    approx(out("x1").getAs[Double]("coef"), 7.0, 1e-6)
    approx(out("x2").getAs[Double]("coef"), 0.0, 1e-6)
    approx(out("intercept").getAs[Double]("coef"), 3.0, 1e-6)
  }
}
