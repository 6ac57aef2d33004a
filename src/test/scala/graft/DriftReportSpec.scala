package graft

/** One-pass multi-feature PSI drift report against the closed form. */
class DriftReportSpec extends SparkSpecBase {
  import spark.implicits._

  test("driftReport: per-feature PSI matches the hand formula") {
    val df = Seq(("a", 1.0, 5.0), ("a", 15.0, 9.0), ("b", 25.0, 1.0),
      ("b", 35.0, 2.0)).toDF("g", "x", "y")
    val out = graft.stats.StatsOps.driftReport(df, "g", "a", "b",
      Seq(("x", Seq(10.0, 20.0)), ("y", Seq(3.0))))
      .orderBy("feature").collect()
    out.map(_.getString(0)).toSeq shouldBe Seq("x", "y")
    val eps = 1e-6
    def psi(pa: Seq[Double], pb: Seq[Double]) =
      pa.zip(pb).map { case (a0, b0) =>
        val a = math.max(a0, eps); val b = math.max(b0, eps)
        (a - b) * math.log(a / b)
      }.sum
    // x bins: A (1,1,0)/2, B (0,0,2)/2
    out(0).getAs[Double]("psi") shouldBe
      psi(Seq(0.5, 0.5, 0.0), Seq(0.0, 0.0, 1.0)) +- 1e-9
    // y bins (break 3): A values 5,9 -> (0,2)/2; B values 1,2 -> (2,0)/2
    out(1).getAs[Double]("psi") shouldBe
      psi(Seq(0.0, 1.0), Seq(1.0, 0.0)) +- 1e-9
    out(0).getAs[Long]("n_a") shouldBe 2L
    out(0).getAs[Long]("n_b") shouldBe 2L
  }
}
