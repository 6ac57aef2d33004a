package graft

import org.apache.spark.sql.functions._
import graft.stats.TwoSampleOps
import graft.timeseries.TimeSeriesOps

class TwoSampleOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def two(a: Seq[Int], b: Seq[Int]) =
    (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")

  test("ksTwoSample: identical samples give D=0 p=1, disjoint D=1") {
    val same = two(1 to 50, 1 to 50)
    val r0 = TwoSampleOps.ksTwoSample(same, "v", "g", "a", "b").head()
    r0.getAs[Double]("d") shouldBe 0.0
    r0.getAs[Double]("p_value") shouldBe 1.0
    val apart = two(1 to 50, 101 to 150)
    val r1 = TwoSampleOps.ksTwoSample(apart, "v", "g", "a", "b").head()
    r1.getAs[Double]("d") shouldBe 1.0
    r1.getAs[Double]("p_value") should be < 1e-6
    // a real shift is detected with the expected D
    val shifted = two(1 to 100, 51 to 150)
    val r2 = TwoSampleOps.ksTwoSample(shifted, "v", "g", "a", "b").head()
    r2.getAs[Double]("d") shouldBe 0.5 +- 1e-9
  }

  test("jensenShannon: 0 for identical mixes, ln 2 for disjoint") {
    val same = (Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("g", "c")
    TwoSampleOps.jensenShannon(same, "c", "g", "a", "b")
      .head().getAs[Double]("jsd") shouldBe 0.0
    val disjoint = (Seq.fill(20)(("a", "x")) ++ Seq.fill(20)(("b", "y")))
      .toDF("g", "c")
    TwoSampleOps.jensenShannon(disjoint, "c", "g", "a", "b")
      .head().getAs[Double]("jsd") shouldBe math.log(2.0) +- 1e-6
  }

  test("pettitt finds the step in a mean-shifted series") {
    val series = ((1 to 20).map(t => (t, 10)) ++
      (21 to 40).map(t => (t, 50))).toDF("t", "v")
    val r = TimeSeriesOps.pettitt(series, "v", "t").head()
    r.getAs[Long]("n") shouldBe 40L
    r.getAs[Int]("change_at") shouldBe 20
    r.getAs[Double]("p_value") should be < 0.01
    // max U_t = 2*sum(midranks of the low half) - t(n+1) at t=20:
    // low half ranks average 10.5 -> S=210, |U| = |420 - 820| = 400
    r.getAs[Double]("k_stat") shouldBe 400.0
  }

  test("cliffsDelta: complete separation gives |delta| = 1") {
    val apart = two(11 to 20, 1 to 10)
    val r = TwoSampleOps.cliffsDelta(apart, "v", "g", "a", "b").head()
    r.getAs[Double]("delta") shouldBe 1.0
    r.getAs[String]("magnitude") shouldBe "large"
    // all-ties: U = n*n/2 -> delta = 0
    val tied = two(Seq.fill(10)(5), Seq.fill(10)(5))
    val r2 = TwoSampleOps.cliffsDelta(tied, "v", "g", "a", "b").head()
    r2.getAs[Double]("delta") shouldBe 0.0
    r2.getAs[String]("magnitude") shouldBe "negligible"
  }

  test("hodgesLehmannShift recovers a constant location shift") {
    val base = 1 to 25
    val df = two(base.map(_ + 7), base)
    val r = TwoSampleOps.hodgesLehmannShift(df, "v", "g", "a", "b")
      .head()
    r.getAs[Long]("n_pairs") shouldBe 625L
    r.getAs[Double]("median_diff") shouldBe 7.0
    // even pair count interpolates the two middle order statistics
    val r2 = TwoSampleOps.hodgesLehmannShift(
      two(Seq(1, 2), Seq(0)), "v", "g", "a", "b").head()
    r2.getAs[Double]("median_diff") shouldBe 1.5
  }
}
