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

  // planted depth-2 rule on integer features: positive iff
  // (f0 <= 2 AND f1 <= 10) — every tree that sees f0 and f1 must
  // recover exactly that split pair by exact-Gini argmax
  private lazy val separable = (0 until 3000).map { i =>
    val f0 = i % 7
    val f1 = (i / 7) % 24
    val f2 = (i / 168) % 10
    val y = if (f0 <= 2 && f1 <= 10) 1L else 0L
    (i.toLong, f0.toLong, f1.toLong, f2.toLong, y)
  }.toDF("id", "f0", "f1", "f2", "y")

  test("giniStumpForestTwin: recovers the planted depth-2 rule on " +
      "every tree whose feature subset contains it") {
    val forest = graft.ml.ForestTwin.giniStumpForestTwin(
      separable, "id", Seq("f0", "f1", "f2"), "y",
      thresholds = Seq((0 to 5).toList, (0 to 22).toList,
        (0 to 8).toList), trees = 6).collect()
    // trees 0 and 3 see (f0, f1): root must split one of the planted
    // features at its planted threshold, children the other
    for (t <- Seq(0L, 3L)) {
      val root = forest.find(r => r.getAs[Long]("tree") == t &&
        r.getAs[String]("node") == "root").get
      val rf = root.getAs[Long]("feature")
      val rt = root.getAs[Long]("threshold")
      Set((0L, 2L), (1L, 10L)) should contain((rf, rt))
      // the child of the side that still mixes labels splits the
      // OTHER planted feature at its planted threshold
      val l = forest.find(r => r.getAs[Long]("tree") == t &&
        r.getAs[String]("node") == "l").get
      (l.getAs[Long]("feature"), l.getAs[Long]("threshold")) shouldBe
        (if (rf == 0L) (1L, 10L) else (0L, 2L))
      // all four leaves are PURE: majority vote == planted rule
      val leaves = forest.filter(r => r.getAs[Long]("tree") == t &&
        r.getAs[String]("node").length == 2)
      leaves should have size 4
      for (leaf <- leaves) {
        val pos = leaf.getAs[Long]("n_pos")
        val n = leaf.getAs[Long]("n")
        assert(pos == 0L || pos == n,
          s"leaf ${leaf.getAs[String]("node")} impure: $pos/$n")
      }
    }
  }

  test("giniStumpForestTwin: identical forest under repartition(1) " +
      "vs repartition(32)") {
    def run(parts: Int) = graft.ml.ForestTwin.giniStumpForestTwin(
      separable.repartition(parts), "id", Seq("f0", "f1", "f2"), "y",
      thresholds = Seq((0 to 5).toList, (0 to 22).toList,
        (0 to 8).toList), trees = 5)
      .orderBy("tree", "node").collect().map(_.toString).toSeq
    run(1) shouldBe run(32)
  }
}
