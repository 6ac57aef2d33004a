package graft

import org.apache.spark.sql.functions._

/** Round-8 verdict follow-ups: portable oracle twins for the
  * rows-only ML gates (GLM-Poisson IRLS, exact-Gini stump forest),
  * forecaster-collect caps, AQE skew-join handling. */
class VerdictR8Spec extends SparkSpecBase {
  import spark.implicits._

  // planted log-linear Poisson-mean process: y = round(exp(η)) with
  // η = 1.2 + 0.8·x1 − 0.5·x2 — deterministic, no RNG state
  private lazy val planted = {
    val rng = new scala.util.Random(11)
    (0 until 4000).map { i =>
      val x1 = rng.nextDouble() * 2.0
      val x2 = rng.nextDouble() * 2.0
      val mu = math.exp(1.2 + 0.8 * x1 - 0.5 * x2)
      (math.round(mu).toDouble, x1, x2)
    }.toDF("y", "x1", "x2")
  }

  test("glmPoissonIrlsTwin: 3 unrolled rounds recover the planted " +
      "log-linear coefficients and agree with MLlib's converged GLM") {
    val twin = graft.ml.MlOps
      .glmPoissonIrlsTwin(planted, "x1", "x2", "y", rounds = 3)
      .head()
    val (b0, b1, b2) = (twin.getAs[Double]("b0"),
      twin.getAs[Double]("b1"), twin.getAs[Double]("b2"))
    // rounding the Poisson mean to an integer y biases the plant a
    // little; MLlib's converged fit on the SAME data is the referee
    val mllib = graft.ml.MlOps
      .glmSummary(planted, Seq("x1", "x2"), "y",
        family = "poisson", link = "log")
      .collect().map(r =>
        r.getAs[String]("term") -> r.getAs[Double]("coef")).toMap
    approx(b0, mllib("intercept"), 1e-2)
    approx(b1, mllib("x1"), 1e-2)
    approx(b2, mllib("x2"), 1e-2)
    // and the plant itself is recovered to first-digit accuracy
    approx(b0, 1.2, 0.05)
    approx(b1, 0.8, 0.05)
    approx(b2, -0.5, 0.05)
  }

  test("glmPoissonIrlsTwin: bit-identical under repartition(1) vs " +
      "repartition(32) — the decimal normal equations are order-free") {
    def bits(parts: Int) = {
      val r = graft.ml.MlOps.glmPoissonIrlsTwin(
        planted.repartition(parts), "x1", "x2", "y", rounds = 2).head()
      Seq("b0", "b1", "b2").map(c =>
        java.lang.Double.doubleToLongBits(r.getAs[Double](c)))
    }
    bits(1) shouldBe bits(32)
  }
}
