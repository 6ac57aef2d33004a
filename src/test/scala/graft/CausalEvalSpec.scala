package graft

import org.apache.spark.sql.functions._
import graft.ml.MlMetrics
import graft.stats.StatsOps

/** Round-7 causal/eval additions: uplift Qini curve, group-fairness
  * audit, stratified IPW ATE, Poisson overdispersion test. */
class CausalEvalSpec extends SparkSpecBase {
  import spark.implicits._

  test("upliftCurve: hand-computed two-bucket example") {
    // bucket 0 (p=.95): 2 treated responders, 2 control
    // non-responders; bucket 1 (p=.85): 1 treated non-responder,
    // 1 control responder
    val df = Seq(
      (true, true, 0.95), (true, true, 0.95),
      (false, false, 0.95), (false, false, 0.95),
      (true, false, 0.85), (false, true, 0.85))
      .toDF("treat", "y", "p")
    val r = MlMetrics.upliftCurve(df, "treat", "y", "p", buckets = 10)
      .orderBy("bucket").collect()
    r.length shouldBe 2
    val b0 = r(0)
    b0.getInt(0) shouldBe 0
    (b0.getLong(1), b0.getLong(2), b0.getLong(3), b0.getLong(4)) shouldBe
      ((2L, 2L, 2L, 0L))
    approx(b0.getAs[Double]("uplift"), 1.0)
    approx(b0.getAs[Double]("qini"), 2.0)
    val b1 = r(1)
    b1.getInt(0) shouldBe 1
    // cumulative: Nt=3 Nc=3 Rt=2 Rc=1
    (b1.getAs[Long]("cum_nt"), b1.getAs[Long]("cum_nc"),
      b1.getAs[Long]("cum_rt"), b1.getAs[Long]("cum_rc")) shouldBe
      ((3L, 3L, 2L, 1L))
    approx(b1.getAs[Double]("uplift"), -1.0)
    approx(b1.getAs[Double]("cum_uplift"), 2.0 / 3 - 1.0 / 3)
    approx(b1.getAs[Double]("qini"), 2.0 - 1.0 * 3 / 3)
  }

  test("upliftCurve: random treatment with null effect has ~0 qini " +
    "tail when outcome is independent of score") {
    val n = 2000
    val df = (0 until n).map { i =>
      (i % 2 == 0, i % 5 == 0, (i % 100) / 100.0)
    }.toDF("treat", "y", "p")
    val last = MlMetrics.upliftCurve(df, "treat", "y", "p")
      .orderBy(desc("bucket")).limit(1).collect()(0)
    // both arms see the same outcome law -> total qini ~ 0
    math.abs(last.getAs[Double]("qini")) should be <= 1.0
    last.getAs[Long]("cum_nt") + last.getAs[Long]("cum_nc") shouldBe
      n.toLong
  }

  test("fairnessReport: hand-computed cells, ppm int-div, gaps") {
    val df = Seq(
      // group A: tp tp fp fn
      ("A", true, true), ("A", true, true), ("A", false, true),
      ("A", true, false),
      // group B: fn tn tn tn
      ("B", true, false), ("B", false, false), ("B", false, false),
      ("B", false, false))
      .toDF("grp", "y", "pred")
    val r = MlMetrics.fairnessReport(df, "grp", "y", "pred")
      .orderBy("grp").collect()
    val a = r(0)
    (a.getAs[Long]("tp"), a.getAs[Long]("fp"), a.getAs[Long]("fn"),
      a.getAs[Long]("tn")) shouldBe ((2L, 1L, 1L, 0L))
    a.getAs[Long]("pos_rate_ppm") shouldBe 750000L
    // integer div truncates: 2e6/3 = 666666, not 666667
    a.getAs[Long]("tpr_ppm") shouldBe 666666L
    a.getAs[Long]("fpr_ppm") shouldBe 1000000L
    // overall: ppr 3/8=375000, tpr 2/4=500000, fpr 1/4=250000
    a.getAs[Long]("dp_gap_ppm") shouldBe 375000L
    a.getAs[Long]("tpr_gap_ppm") shouldBe 166666L
    a.getAs[Long]("fpr_gap_ppm") shouldBe 750000L
    val b = r(1)
    b.getAs[Long]("pos_rate_ppm") shouldBe 0L
    b.getAs[Long]("dp_gap_ppm") shouldBe -375000L
    b.getAs[Long]("tpr_gap_ppm") shouldBe -500000L
  }

  test("ipwAte: stratified estimate with loud off-support drops") {
    val df = Seq(
      // stratum s1: treated 10,20; control 10 -> term 3*(15-10)=15
      ("s1", true, 10L), ("s1", true, 20L), ("s1", false, 10L),
      // stratum s2: treated 0; control 10 -> term 2*(0-10)=-20
      ("s2", true, 0L), ("s2", false, 10L),
      // stratum s3: treated only -> off-support, dropped loudly
      ("s3", true, 99L))
      .toDF("strat", "treat", "y")
    val r = StatsOps.ipwAte(df, "treat", "y", Seq("strat")).collect()(0)
    r.getAs[Long]("n_total") shouldBe 6L
    r.getAs[Long]("n_matched") shouldBe 5L
    r.getAs[Long]("n_off_support") shouldBe 1L
    r.getAs[Long]("n_strata") shouldBe 2L
    r.getAs[Long]("n_strata_dropped") shouldBe 1L
    approx(r.getAs[Double]("ate"), (15.0 - 20.0) / 5)
  }

  test("dispersionTest: hand-computed index and chi2; " +
    "repartition-invariant") {
    val df = Seq(("k", 1L), ("k", 2L), ("k", 3L), ("k", 6L))
      .toDF("key", "c")
    val r = StatsOps.dispersionTest(df, Seq("key"), "c").collect()(0)
    r.getAs[Long]("n") shouldBe 4L
    approx(r.getAs[Double]("mean"), 3.0)
    approx(r.getAs[Double]("variance"), 56.0 / 12)
    approx(r.getAs[Double]("dispersion"), 56.0 / 36)
    approx(r.getAs[Double]("chi2"), 3 * 56.0 / 36)
    r.getAs[Double]("p_over") should (be >= 0.0 and be <= 1.0)
    val a = StatsOps.dispersionTest(df.repartition(1), Seq("key"), "c")
      .collect()(0).toSeq
    val b = StatsOps.dispersionTest(df.repartition(5), Seq("key"), "c")
      .collect()(0).toSeq
    a shouldBe b
  }

  test("aalenJohansen: hand-computed competing-risk CIFs and the " +
    "telescoping identity") {
    // (dur, cause): cause 0 = censored, 1/2 = competing events
    val df = Seq((1L, 1L), (1L, 0L), (2L, 2L), (3L, 1L), (3L, 0L))
      .toDF("dur", "cause")
    val r = StatsOps.aalenJohansen(df, "dur", "cause")
      .orderBy("dur").collect()
    r.length shouldBe 3
    val t1 = r(0)
    (t1.getAs[Long]("d1"), t1.getAs[Long]("d2"), t1.getAs[Long]("c"),
      t1.getAs[Long]("n_risk")) shouldBe ((1L, 0L, 1L, 5L))
    approx(t1.getAs[Double]("survival"), 0.8, 1e-6)
    approx(t1.getAs[Double]("cif1"), 0.2, 1e-6)
    val t2 = r(1)
    t2.getAs[Long]("n_risk") shouldBe 3L
    approx(t2.getAs[Double]("survival"), 0.8 * 2 / 3, 1e-6)
    approx(t2.getAs[Double]("cif2"), 0.8 / 3, 1e-6)
    val t3 = r(2)
    t3.getAs[Long]("n_risk") shouldBe 2L
    approx(t3.getAs[Double]("cif1"), 0.2 + (0.8 * 2 / 3) / 2, 1e-6)
    // S(t) + CIF1(t) + CIF2(t) telescopes to exactly 1 at every time
    r.foreach { row =>
      approx(row.getAs[Double]("survival") +
        row.getAs[Double]("cif1") + row.getAs[Double]("cif2"),
        1.0, 1e-5)
    }
  }

  test("aalenJohansen: single cause reduces to 1 - KM") {
    val df = Seq((1L, 1L), (2L, 1L), (2L, 0L), (4L, 1L))
      .toDF("dur", "cause")
    val aj = StatsOps.aalenJohansen(df, "dur", "cause")
      .orderBy("dur").collect()
    val km = StatsOps.kaplanMeier(df.withColumnRenamed("cause", "ev"),
      "dur", "ev").orderBy("dur").collect()
    aj.zip(km).foreach { case (a, k) =>
      approx(a.getAs[Double]("cif1"),
        1.0 - k.getAs[Double]("survival"), 1e-5)
      a.getAs[Double]("cif2") shouldBe 0.0 +- 1e-12
    }
  }

  test("dispersionTest: equidispersed Poisson-ish counts sit near " +
    "D=1, overdispersed mixture flags high") {
    // deterministic pseudo-counts: equidispersed stream vs a
    // two-regime mixture with the same mean
    val eq = (0 until 500).map(i => ("eq", ((i * 2654435761L) >>> 13) % 7))
    val ov = (0 until 500).map(i => ("ov", if (i % 10 == 0) 30L else 0L))
    val df = (eq ++ ov).toDF("key", "c")
    val r = StatsOps.dispersionTest(df, Seq("key"), "c")
      .collect().map(x => x.getString(0) -> x.getAs[Double]("dispersion"))
      .toMap
    r("eq") should be < 3.0
    r("ov") should be > 10.0
  }
}
