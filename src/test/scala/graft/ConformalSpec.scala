package graft

import graft.ml.Conformal

/** Split-conformal machinery pinned against hand-computed ranks,
  * quantiles and coverage. */
class ConformalSpec extends SparkSpecBase {
  import spark.implicits._

  // key a: 9 calibration residuals 1..9 (y=resid, yhat=0), rank =
  // ceil(10*9/10) = 9 -> qhat 9; tests with residuals 5, 9, 10
  // key b: 3 calibration rows, rank = ceil(4*9/10) = 4 > 3 -> null
  private def df = (
    (1 to 9).map(i => ("a", i.toDouble, 0.0, true)) ++
      Seq(("a", 5.0, 0.0, false), ("a", 9.0, 0.0, false),
        ("a", 10.0, 0.0, false)) ++
      (1 to 3).map(i => ("b", i.toDouble, 0.0, true)) ++
      Seq(("b", 1.0, 0.0, false))
    ).toDF("k", "y", "yhat", "cal")

  test("splitConformal: hand-computed qhat and coverage") {
    val out = Conformal.splitConformal(df, Seq("k"), "y", "yhat",
      "cal", 1, 10).orderBy("k").collect()
    out.length shouldBe 2
    val a = out(0)
    a.getAs[Long]("n_cal") shouldBe 9L
    a.getAs[Long]("rank") shouldBe 9L
    a.getAs[Double]("qhat") shouldBe 9.0 +- 1e-12
    a.getAs[Long]("n_test") shouldBe 3L
    a.getAs[Long]("n_covered") shouldBe 2L
    a.getAs[Double]("coverage") shouldBe (2.0 / 3) +- 1e-12
    val b = out(1)
    b.getAs[Long]("n_cal") shouldBe 3L
    b.getAs[Long]("rank") shouldBe 4L
    b.isNullAt(b.fieldIndex("qhat")) shouldBe true
    b.isNullAt(b.fieldIndex("n_covered")) shouldBe true
    b.isNullAt(b.fieldIndex("coverage")) shouldBe true
  }

  test("rank arithmetic is exact where doubles round wrong") {
    // ceil(100 * 0.9) must be 90; the double path gives 91 because
    // (1-0.1)*100 = 90.00000000000001
    val d99 = ((1 to 99).map(i => ("a", i.toDouble, 0.0, true)) :+
      (("a", 1.0, 0.0, false))).toDF("k", "y", "yhat", "cal")
    val r = Conformal.splitConformal(d99, Seq("k"), "y", "yhat",
      "cal", 1, 10).head()
    r.getAs[Long]("rank") shouldBe 90L
    r.getAs[Double]("qhat") shouldBe 90.0 +- 1e-12
  }

  test("conformalIntervals: lo/hi = yhat +- qhat on test rows") {
    val rows = Conformal.conformalIntervals(df, Seq("k"), "y", "yhat",
      "cal", 1, 10).filter($"k" === "a").collect()
    rows.length shouldBe 3
    for (r <- rows) {
      r.getAs[Double]("lo") shouldBe -9.0 +- 1e-12
      r.getAs[Double]("hi") shouldBe 9.0 +- 1e-12
    }
  }

  test("adaptiveConformal: hand-traced radius walk") {
    // residuals 5, 0.2, 10 with gamma=1, alpha=0.5, q0=0:
    // q: 0 -> 0.5 (miss) -> 0.0 (hit) -> 0.5 (miss)
    val df = Seq(("k", 1, 5.0), ("k", 2, 0.2), ("k", 3, 10.0))
      .map { case (k, t, r) => (k, t, r, 0.0) }
      .toDF("k", "t", "y", "yhat")
    val r = graft.ml.Conformal.adaptiveConformal(df, Seq("k"), "y",
      "yhat", "t", alpha = 0.5, gamma = 1.0).head()
    r.getAs[Long]("n") shouldBe 3L
    r.getAs[Long]("n_miss") shouldBe 2L
    r.getAs[Double]("q_final") shouldBe 0.5 +- 1e-12
  }

  test("adaptiveConformal drives miss rate toward alpha") {
    // deterministic saw-tooth residuals; long horizon
    val rows = (1 to 5000).map { i =>
      ("k", i, ((i.toLong * 2654435761L) % 1000).toDouble, 0.0)
    }
    val r = graft.ml.Conformal.adaptiveConformal(
      rows.toDF("k", "t", "y", "yhat"), Seq("k"), "y", "yhat", "t",
      alpha = 0.2, gamma = 25.0).head()
    r.getAs[Double]("miss_rate") shouldBe 0.2 +- 0.03
  }

  test("coverage >= 1-alpha on an exchangeable sample") {
    // deterministic pseudo-noise: resid_i = (i*2654435761 mod 1000);
    // cal/test split by parity of a second hash — exchangeable enough
    // that the finite-sample guarantee must hold
    val rows = (1 to 2000).map { i =>
      val h = (i.toLong * 2654435761L) % 1000
      val split = ((i.toLong * 40503L) % 7) != 0
      ("k", h.toDouble, 0.0, split)
    }
    val r = Conformal.splitConformal(rows.toDF("k", "y", "yhat", "cal"),
      Seq("k"), "y", "yhat", "cal", 1, 10).head()
    r.getAs[Double]("coverage") should be >= 0.9 - 0.03
  }
}
