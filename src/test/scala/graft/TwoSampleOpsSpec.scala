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

  test("cramerVonMises matches the direct rank-sum computation") {
    val a = Seq(1, 3, 3, 7, 20)
    val b = Seq(2, 3, 8, 8, 15, 30)
    val r = TwoSampleOps.cramerVonMises(two(a, b), "v", "g", "a", "b")
      .head()
    // direct Anderson form with midranks on the pooled sample
    val pooled = (a.map((_, 'a')) ++ b.map((_, 'b')))
    val mid = pooled.map(_._1).distinct.map { v =>
      val below = pooled.count(_._1 < v)
      val c = pooled.count(_._1 == v)
      v -> (below + (c + 1) / 2.0)
    }.toMap
    def s2(xs: Seq[Int]) = xs.sorted.zipWithIndex.map { case (v, i) =>
      math.pow(mid(v) - (i + 1), 2)
    }.sum
    val (n, m) = (a.size.toDouble, b.size.toDouble)
    val u = n * s2(a) + m * s2(b)
    val t = u / (n * m * (n + m)) - (4 * n * m - 1) / (6 * (n + m))
    r.getAs[Long]("n_a") shouldBe 5L
    r.getAs[Long]("n_b") shouldBe 6L
    r.getAs[Double]("t_stat") shouldBe t +- 1e-6
    // identical samples: T near its minimum, z negative-ish small
    val same = TwoSampleOps.cramerVonMises(
      two(1 to 20, 1 to 20), "v", "g", "a", "b").head()
    same.getAs[Double]("t_stat") should be < 0.1
    // disjoint samples: large T, large z
    val far = TwoSampleOps.cramerVonMises(
      two(1 to 20, 101 to 120), "v", "g", "a", "b").head()
    far.getAs[Double]("z") should be > 3.0
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
