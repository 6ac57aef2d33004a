package graft

import org.apache.spark.sql.functions._
import graft.ml.{MlMetrics, MlOps}
import graft.stats.StatsOps

/** Model-evaluation metrics + feature-engineering round-3 additions
  * (reference ml/metrics, ml/model_selection,
  * ml/feature_engineering): hand-computed small cases. */
class MlMetricsSpec extends SparkSpecBase {
  import spark.implicits._

  test("aucRoc is 1 for a perfect ranking and tie-aware otherwise") {
    val perfect = Seq((1, false), (2, false), (3, true), (4, true))
      .toDF("s", "y")
    val r = MlMetrics.aucRoc(perfect, "s", "y").collect().head
    r.getAs[Long]("n_pos") shouldBe 2L
    r.getAs[Long]("n_neg") shouldBe 2L
    approx(r.getAs[Double]("auc"), 1.0)
    // sorted 1,2,2,3 -> avg ranks 1, 2.5, 2.5, 4; R+ = 6.5
    // AUC = (6.5 - 3) / 4 = 0.875 (one tied pos-neg pair counts 1/2)
    val tied = Seq((1, false), (2, false), (2, true), (3, true))
      .toDF("s", "y")
    approx(MlMetrics.aucRoc(tied, "s", "y")
      .collect().head.getAs[Double]("auc"), 0.875)
  }

  test("logLossBrier matches closed forms") {
    val df = Seq((0.9, true), (0.1, false)).toDF("p", "y")
    val r = MlMetrics.logLossBrier(df, "p", "y").collect().head
    approx(r.getAs[Double]("log_loss"), -math.log(0.9), 1e-6)
    approx(r.getAs[Double]("brier"), 0.01, 1e-9)
  }

  test("kappaMcc on a hand confusion matrix") {
    // tp=20 fp=5 fn=10 tn=15: po=.7, pe=.5 -> kappa .4;
    // mcc = 250/sqrt(375000)
    val df = (Seq.fill(20)((true, true)) ++ Seq.fill(5)((false, true)) ++
      Seq.fill(10)((true, false)) ++ Seq.fill(15)((false, false)))
      .toDF("y", "p")
    val r = MlMetrics.kappaMcc(df, "y", "p").collect().head
    r.getAs[Long]("tp") shouldBe 20L
    approx(r.getAs[Double]("kappa"), 0.4, 1e-6)
    approx(r.getAs[Double]("mcc"), 250.0 / math.sqrt(375000.0), 1e-6)
  }

  test("targetEncode pulls rare categories toward the global mean") {
    val df = Seq(("a", 1L), ("a", 1L), ("b", 3L)).toDF("c", "t")
    val m = MlOps.targetEncode(df, "c", "t", smoothing = 1.0)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("encoded"))
      .toMap
    approx(m("a"), (2.0 + 5.0 / 3.0) / 3.0, 1e-6)
    approx(m("b"), (3.0 + 5.0 / 3.0) / 2.0, 1e-6)
  }

  test("liftTable top bucket concentrates the positives") {
    val df = (1 to 10).map(s => (s, s >= 9)).toDF("s", "y")
    val rs = MlMetrics.liftTable(df, "s", "y").collect()
      .map(r => r.getAs[Long]("bucket") -> r).toMap
    // bucket 0 = highest score (10): 1 row, 1 positive, lift = 5
    approx(rs(0L).getAs[Double]("lift"), 5.0, 1e-6)
    approx(rs(1L).getAs[Double]("cum_gain"), 1.0, 1e-6)
    rs(9L).getAs[Long]("pos") shouldBe 0L
  }

  test("lorenzDeciles ends at (1,1) with exact shares") {
    val df = (1 to 10).map(_.toLong).toDF("v")
    val rs = StatsOps.lorenzDeciles(df, "v").collect()
      .map(r => r.getAs[Long]("decile") -> r).toMap
    approx(rs(0L).getAs[Double]("cum_pop_share"), 0.1, 1e-6)
    approx(rs(0L).getAs[Double]("cum_value_share"), 1.0 / 55, 1e-6)
    approx(rs(9L).getAs[Double]("cum_pop_share"), 1.0, 1e-9)
    approx(rs(9L).getAs[Double]("cum_value_share"), 1.0, 1e-9)
  }

  test("quantileNormalize maps columns to the rank-mean reference") {
    val df = Seq((1L, 5L, 4L), (2L, 2L, 1L), (3L, 3L, 2L))
      .toDF("id", "x", "y")
    val m = MlOps.quantileNormalize(df, "id", Seq("x", "y"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("x_qn"), r.getAs[Double]("y_qn"))).toMap
    // ref dist: rank1 (2+1)/2=1.5, rank2 (3+2)/2=2.5, rank3 (5+4)/2=4.5
    m(1L) shouldBe ((4.5, 4.5))
    m(2L) shouldBe ((1.5, 1.5))
    m(3L) shouldBe ((2.5, 2.5))
  }

  test("calibrationBins bins probabilities with exact positive rates") {
    val df = Seq((0.05, false), (0.95, true), (0.95, false))
      .toDF("p", "y")
    val m = MlMetrics.calibrationBins(df, "p", "y").collect()
      .map(r => r.getAs[Long]("bin") -> r).toMap
    m(0L).getAs[Long]("n") shouldBe 1L
    approx(m(0L).getAs[Double]("frac_pos"), 0.0)
    m(9L).getAs[Long]("n") shouldBe 2L
    approx(m(9L).getAs[Double]("mean_p"), 0.95, 1e-9)
    approx(m(9L).getAs[Double]("frac_pos"), 0.5, 1e-9)
  }

  test("featureScores ranks the informative feature first") {
    // x1 == y -> r² = 1; x2: r² = 64/80 = 0.8 by hand
    val df = Seq((1L, 3L, true), (0L, 1L, false), (1L, 2L, true),
      (0L, 0L, false)).toDF("x1", "x2", "y")
    val rs = MlOps.featureScores(df, Seq("x1", "x2"), "y").collect()
    rs.map(_.getString(0)).toSeq shouldBe Seq("x1", "x2")
    approx(rs(0).getAs[Double]("score"), 1.0, 1e-6)
    approx(rs(1).getAs[Double]("score"), 0.8, 1e-6)
  }

  test("woeIv is antisymmetric for mirrored categories") {
    val df = Seq(("a", true), ("a", true), ("a", false),
      ("b", true), ("b", false), ("b", false)).toDF("c", "y")
    val m = MlOps.woeIv(df, "c", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    approx(m("a").getAs[Double]("woe"), math.log(2.0), 1e-6)
    approx(m("b").getAs[Double]("woe"), -math.log(2.0), 1e-6)
    approx(m("a").getAs[Double]("iv_contrib"),
      (1.0 / 3) * math.log(2.0), 1e-6)
  }

  test("tukeyHsd matches the hand-computed studentized range stat") {
    // a=[1,2,3] b=[4,5,6]: MSW = 1, q = 3/sqrt((1/2)(2/3)) = 3*sqrt(3)
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 4L), ("b", 5L), ("b", 6L)).toDF("g", "v")
    val r = StatsOps.tukeyHsd(df, "v", "g").collect().head
    approx(r.getAs[Double]("mean_diff"), -3.0, 1e-9)
    approx(r.getAs[Double]("q_stat"), 3.0 * math.sqrt(3.0), 1e-6)
  }

  test("cronbachAlpha on perfectly correlated items") {
    // x1=[1,2,3] x2=[2,4,6]: var 1 and 4, total var 9 -> 2(1-5/9)
    val df = Seq((1L, 2L), (2L, 4L), (3L, 6L)).toDF("x1", "x2")
    val r = StatsOps.cronbachAlpha(df, Seq("x1", "x2")).collect().head
    r.getAs[Long]("k") shouldBe 2L
    approx(r.getAs[Double]("alpha"), 2.0 * (1 - 5.0 / 9), 1e-6)
  }

  test("concordanceCcc is 1 on identity and penalizes location shift") {
    val same = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    approx(MlMetrics.concordanceCcc(same, "x", "y")
      .collect().head.getAs[Double]("ccc"), 1.0, 1e-9)
    // y = x + 1: ccc = 2*(2/3) / (4/3 + 1) = 4/7
    val shift = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("x", "y")
    approx(MlMetrics.concordanceCcc(shift, "x", "y")
      .collect().head.getAs[Double]("ccc"), 4.0 / 7, 1e-6)
  }

  test("hellinger is 0 for identical and 1 for disjoint mixes") {
    val same = Seq(("a", true), ("a", false), ("b", true),
      ("b", false)).toDF("c", "s")
    val r0 = StatsOps.hellinger(same, "c", "s").collect().head
    approx(r0.getAs[Double]("hellinger"), 0.0, 1e-9)
    val disjoint = Seq(("a", true), ("b", false)).toDF("c", "s")
    val r1 = StatsOps.hellinger(disjoint, "c", "s").collect().head
    approx(r1.getAs[Double]("hellinger"), 1.0, 1e-9)
  }

  test("emd1d equals the point-mass transport distance") {
    val df = Seq((0L, "a"), (0L, "a"), (2L, "b"), (2L, "b"))
      .toDF("v", "g")
    approx(StatsOps.emd1d(df, "v", "g", "a", "b")
      .collect().head.getAs[Double]("emd"), 2.0, 1e-9)
  }

  test("nelsonAalen accumulates d/n hazard increments") {
    // durs [1,2], both events: H(1) = 1/2, H(2) = 1/2 + 1 = 3/2;
    // var(2) = 1/4 + 1 = 5/4
    val df = Seq((1L, 1L), (2L, 1L)).toDF("dur", "ev")
    val rs = StatsOps.nelsonAalen(df, "dur", "ev").collect()
      .map(r => r.getLong(0) -> r).toMap
    approx(rs(1L).getAs[Double]("hazard"), 0.5, 1e-9)
    approx(rs(2L).getAs[Double]("hazard"), 1.5, 1e-9)
    approx(rs(2L).getAs[Double]("hazard_var"), 1.25, 1e-9)
  }

  test("woeIv continuity-adjusts zero cells to stay finite") {
    val df = Seq(("a", true), ("a", true), ("b", false))
      .toDF("c", "y")
    val rs = MlOps.woeIv(df, "c", "y").collect()
    rs.foreach { r =>
      assert(!r.getAs[Double]("woe").isInfinite)
      assert(!r.getAs[Double]("woe").isNaN)
    }
  }
}
