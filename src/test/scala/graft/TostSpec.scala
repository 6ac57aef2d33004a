package graft

import graft.stats.{Distributions, TwoSampleOps}

/** Schuirmann TOST equivalence: hand-computed z's and p, and the
  * two qualitative regimes (equivalent vs not). */
class TostSpec extends SparkSpecBase {
  import spark.implicits._

  private def r6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand-computed welch z TOST") {
    val df = (Seq(10L, 12L, 14L, 16L).map(("a", _)) ++
      Seq(11L, 13L, 15L, 17L).map(("b", _))).toDF("g", "v")
    val r = TwoSampleOps.tostEquivalence(df, "v", "g", "a", "b", 5.0)
      .head()
    // means 13 vs 14 -> d = -1; var = 20/3 each; se = sqrt(40/12)
    val se = math.sqrt(20.0 / 3.0 / 4.0 * 2.0)
    r.getAs[Double]("mean_diff") shouldBe -1.0
    r.getAs[Double]("se") shouldBe r6(se)
    r.getAs[Double]("z_lower") shouldBe r6((-1.0 + 5.0) / se)
    r.getAs[Double]("z_upper") shouldBe r6((-1.0 - 5.0) / se)
    val p = math.max(
      1.0 - Distributions.normalCdf((-1.0 + 5.0) / se),
      Distributions.normalCdf((-1.0 - 5.0) / se))
    r.getAs[Double]("p_tost") shouldBe r6(p)
  }

  test("tight same-mean groups are equivalent; shifted ones are not") {
    val same = ((1 to 200).map(i => ("a", 100L + i % 3)) ++
      (1 to 200).map(i => ("b", 100L + (i + 1) % 3))).toDF("g", "v")
    TwoSampleOps.tostEquivalence(same, "v", "g", "a", "b", 2.0)
      .head().getAs[Double]("p_tost") should be < 0.01
    val far = ((1 to 200).map(i => ("a", 100L + i % 3)) ++
      (1 to 200).map(i => ("b", 110L + i % 3))).toDF("g", "v")
    TwoSampleOps.tostEquivalence(far, "v", "g", "a", "b", 2.0)
      .head().getAs[Double]("p_tost") should be > 0.5
  }
}
