package graft

import graft.llm.Privacy
import graft.ops.DataChecks

/** Privacy audit + DP release machinery and the skew profiler
  * against hand-computed values. */
class PrivacySpec extends SparkSpecBase {
  import spark.implicits._

  test("kAnonymity classes and profile, hand-computed") {
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 5), ("b", 6))
      .toDF("q", "s")
    val cls = Privacy.kAnonymityClasses(df, Seq("q"), "s", k = 3)
      .orderBy("q").collect()
    cls.map(_.getAs[Long]("n")).toSeq shouldBe Seq(3L, 2L)
    cls.map(_.getAs[Long]("l_diversity")).toSeq shouldBe Seq(2L, 2L)
    cls.map(_.getAs[Boolean]("below_k")).toSeq shouldBe
      Seq(false, true)
    val p = Privacy.kAnonymityProfile(df, Seq("q"), "s", k = 3).head()
    p.getAs[Long]("n_rows") shouldBe 5L
    p.getAs[Long]("n_classes") shouldBe 2L
    p.getAs[Long]("k_anonymity") shouldBe 2L
    p.getAs[Long]("l_diversity_min") shouldBe 2L
    p.getAs[Long]("rows_below_k") shouldBe 2L
    approx(p.getAs[Double]("pct_below_k"), 0.4, 1e-12)
  }

  test("dpGroupCount: reproducible draw, linear in 1/epsilon") {
    val df = (1 to 100).map(i => (if (i % 2 == 0) "x" else "y", i))
      .toDF("k", "v")
    def run(eps: Double) =
      Privacy.dpGroupCount(df, Seq("k"), eps, "s1")
        .orderBy("k").collect()
        .map(r => (r.getAs[Long]("n"), r.getAs[Double]("noise")))
    val a = run(1.0); val b = run(1.0); val half = run(0.5)
    a.toSeq shouldBe b.toSeq // same salt+key -> same draw
    a.map(_._1).toSeq shouldBe Seq(50L, 50L)
    // scale b = 1/eps: halving epsilon exactly doubles the noise
    for (((_, n1), (_, n2)) <- a.zip(half))
      approx(n2, 2.0 * n1, 1e-12)
    // a different salt gives a different draw
    val other = Privacy.dpGroupCount(df, Seq("k"), 1.0, "s2")
      .orderBy("k").collect().map(_.getAs[Double]("noise"))
    assert(other.toSeq != a.map(_._2).toSeq)
  }

  test("dpGroupSum clamps to the sensitivity bound") {
    val df = Seq(("g", 10L), ("g", 200L), ("g", -999L))
      .toDF("k", "v")
    val r = Privacy.dpGroupSum(df, Seq("k"), "v",
      sensitivity = 50.0, epsilon = 1.0, salt = "s").head()
    // 10 + 50 + (-50) = 10
    approx(r.getAs[Double]("sum_clamped"), 10.0, 1e-12)
    r.getAs[Long]("n") shouldBe 3L
    approx(r.getAs[Double]("sum_dp"),
      10.0 + r.getAs[Double]("noise"), 1e-12)
  }

  test("skewHeavyHitters + skewSummary, hand-computed") {
    val df = (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq("z"))
      .toDF("k")
    val top = DataChecks.skewHeavyHitters(df, Seq("k"), topK = 2)
      .collect()
    top.map(r => (r.getString(0), r.getAs[Long]("n"),
      r.getAs[Long]("share_ppm"))).toSeq shouldBe
      Seq(("x", 5L, 555555L), ("y", 3L, 333333L))
    val s = DataChecks.skewSummary(df, Seq("k")).head()
    s.getAs[Long]("n_rows") shouldBe 9L
    s.getAs[Long]("n_keys") shouldBe 3L
    s.getAs[Long]("max_key_rows") shouldBe 5L
    approx(s.getAs[Double]("skew_ratio"), 5.0 * 3 / 9, 1e-12)
    s.getAs[Long]("top1_ppm") shouldBe 555555L
  }
}
