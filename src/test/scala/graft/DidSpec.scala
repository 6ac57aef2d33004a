package graft

import graft.stats.{Distributions, StatsOps}

/** 2×2 difference-in-differences: hand-computed cells, OLS-saturated
  * inference, and invariance to parallel shifts of the control
  * trend. */
class DidSpec extends SparkSpecBase {
  import spark.implicits._

  private def r6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand-computed 2x2 effect and saturated-OLS inference") {
    val rows = Seq(
      (false, false, 10L), (false, false, 12L),
      (false, true, 20L), (false, true, 22L),
      (true, false, 30L), (true, false, 34L),
      (true, true, 50L), (true, true, 58L))
      .toDF("t", "p", "y")
    val r = StatsOps.diffInDiffMeans(rows, "y", "t", "p").head()
    // m00=11 m01=21 m10=32 m11=54 -> eff = (54-32)-(21-11) = 12
    // RSS = 2+2+8+32 = 44; sigma2 = 11; invN = 2; se = sqrt(22)
    r.getAs[Long]("n") shouldBe 8L
    r.getAs[Double]("did_effect") shouldBe 12.0
    r.getAs[Double]("se") shouldBe r6(math.sqrt(22.0))
    val z = 12.0 / math.sqrt(22.0)
    r.getAs[Double]("z") shouldBe r6(z)
    r.getAs[Double]("p_value") shouldBe
      r6(2.0 * (1.0 - Distributions.normalCdf(z)))
  }

  test("adding a common post-period shift leaves the effect fixed") {
    val base = Seq(
      (false, false, 10L), (false, false, 14L),
      (false, true, 21L), (false, true, 25L),
      (true, false, 31L), (true, false, 35L),
      (true, true, 49L), (true, true, 53L))
    val shifted = base.map { case (t, p, y) =>
      (t, p, if (p) y + 100L else y) }
    val e0 = StatsOps.diffInDiffMeans(base.toDF("t", "p", "y"),
      "y", "t", "p").head().getAs[Double]("did_effect")
    val e1 = StatsOps.diffInDiffMeans(shifted.toDF("t", "p", "y"),
      "y", "t", "p").head().getAs[Double]("did_effect")
    e1 shouldBe e0
  }
}
