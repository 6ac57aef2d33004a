package graft

import graft.stats.{Distributions => D, StatsOps}
import org.apache.spark.sql.functions._

/** Distribution CDFs and the p-values they unlock. Anchors are exact
  * closed forms (Cauchy t₁, exponential χ²₂, F symmetry) plus
  * published critical-value tables.
  */
class DistributionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("normal cdf: symmetry and published values") {
    D.normalCdf(0.0) shouldBe 0.5 +- 1e-8 // A&S poly, |eps| <= 1.5e-7
    D.normalCdf(1.959963985) shouldBe 0.975 +- 1e-6
    D.normalCdf(-1.959963985) shouldBe 0.025 +- 1e-6
    D.normalCdf(1.0) shouldBe 0.8413447 +- 1e-6
    (D.normalCdf(2.5) + D.normalCdf(-2.5)) shouldBe 1.0 +- 1e-12
  }

  test("t cdf: exact closed forms for df=1 (Cauchy) and df=2") {
    D.tCdf(1.0, 1.0) shouldBe 0.75 +- 1e-10 // 0.5 + atan(1)/pi
    D.tCdf(-1.0, 1.0) shouldBe 0.25 +- 1e-10
    val t = 1.5
    D.tCdf(t, 2.0) shouldBe (0.5 + t / (2 * math.sqrt(2 + t * t))) +- 1e-10
    // published two-sided critical value: t(0.975, 10) = 2.228
    D.tTwoSidedP(2.228, 10.0) shouldBe 0.05 +- 2e-4
    // scipy: 2*(1-t.cdf(1, 8)) = 0.34659350708733416
    D.tTwoSidedP(1.0, 8.0) shouldBe 0.3465935 +- 1e-6
  }

  test("chi2 cdf: exact df=2 exponential form and published values") {
    D.chi2Cdf(3.0, 2.0) shouldBe (1.0 - math.exp(-1.5)) +- 1e-10
    // published: chi2(0.95, 1) = 3.841, chi2(0.95, 10) = 18.307
    D.chi2UpperP(3.841, 1.0) shouldBe 0.05 +- 2e-4
    D.chi2UpperP(18.307, 10.0) shouldBe 0.05 +- 2e-4
  }

  test("chi2 even-df closed form matches the incomplete gamma") {
    // df = 8: P(X > x) = exp(-x/2) * sum_{k<4} (x/2)^k / k!
    Seq(2.0, 7.5, 15.51, 26.12).foreach { x =>
      val h = x / 2
      val closed = math.exp(-h) * (1 + h + h * h / 2 + h * h * h / 6)
      D.chi2UpperP(x, 8.0) shouldBe closed +- 1e-12
    }
  }

  test("F cdf: reflection symmetry and published value") {
    val f = 2.5
    D.fCdf(f, 3.0, 7.0) shouldBe (1.0 - D.fCdf(1 / f, 7.0, 3.0)) +- 1e-10
    // published: F(0.95; 5, 10) = 3.326
    D.fUpperP(3.326, 5.0, 10.0) shouldBe 0.05 +- 5e-4
  }

  test("column normal cdf matches the scalar form") {
    val xs = Seq(-3.0, -1.2, 0.0, 0.7, 2.4).toDF("x")
    val got = xs.select(D.normalCdfCol($"x").as("p"))
      .as[Double].collect()
    got.zip(Seq(-3.0, -1.2, 0.0, 0.7, 2.4)).foreach { case (g, x) =>
      g shouldBe D.normalCdf(x) +- 1e-15
    }
  }

  test("welch t-test emits the p-value of its own t and df") {
    // A = 1..5, B = 2..6: t = -1, welch df = 8, p = 0.346593
    val df = (Seq.tabulate(5)(i => (i + 1.0, "a")) ++
      Seq.tabulate(5)(i => (i + 2.0, "b"))).toDF("v", "g")
    val r = StatsOps.ttestWelch(df, "v", "g", "a", "b").head()
    r.getAs[Double]("t_stat") shouldBe -1.0 +- 1e-12
    r.getAs[Double]("welch_df") shouldBe 8.0 +- 1e-12
    r.getAs[Double]("p_value") shouldBe 0.3465935 +- 1e-6
  }

  test("chi-square and anova emit p-values") {
    val df = Seq(
      ("x", "u"), ("x", "u"), ("x", "v"), ("y", "u"),
      ("y", "v"), ("y", "v"), ("x", "u"), ("y", "v")
    ).toDF("a", "b")
    val c = StatsOps.chiSquare(df, "a", "b").head()
    val p = D.chi2UpperP(c.getAs[Double]("chi2"),
      c.getAs[Long]("dof").toDouble)
    c.getAs[Double]("p_value") shouldBe p +- 1e-12

    val adf = Seq(("g1", 1.0), ("g1", 2.0), ("g1", 3.0),
      ("g2", 4.0), ("g2", 5.0), ("g2", 6.0)).toDF("g", "v")
    val a = StatsOps.anovaOneWay(adf, "v", "g").head()
    val pf = D.fUpperP(a.getAs[Double]("f_stat"),
      a.getAs[Long]("df_between").toDouble,
      a.getAs[Long]("df_within").toDouble)
    a.getAs[Double]("p_value") shouldBe pf +- 1e-12
    // scipy f_oneway([1,2,3],[4,5,6]): F = 13.5, p = 0.021312
    a.getAs[Double]("f_stat") shouldBe 13.5 +- 1e-9
    a.getAs[Double]("p_value") shouldBe 0.0213122 +- 1e-5
  }

  test("degenerate inputs yield NaN p-values instead of failing the job") {
    // one distinct category on each axis: dof = 0
    val c = StatsOps.chiSquare(Seq(("x", "u"), ("x", "u")).toDF("a", "b"),
      "a", "b").head()
    c.getAs[Long]("dof") shouldBe 0L
    c.getAs[Double]("p_value").isNaN shouldBe true
    // constant x: zero centered variance → null slope/r2/p, not a crash
    val r = StatsOps.linearRegression(
      Seq((1.0, 2.0), (1.0, 3.0), (1.0, 4.0)).toDF("x", "y"), "x", "y")
      .head()
    r.isNullAt(r.fieldIndex("slope")) shouldBe true
    r.isNullAt(r.fieldIndex("r2")) shouldBe true
    r.isNullAt(r.fieldIndex("p_value")) shouldBe true
  }

  test("linear regression emits slope t and p (df = n-2)") {
    // y = 2x + noise-free → r2 = 1 edge avoided; use a known set:
    // x = 1..5, y = (2, 4, 5, 4, 5): slope = 0.6, r = 0.7..
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 5.0), (4.0, 4.0),
      (5.0, 5.0)).toDF("x", "y")
    val r = StatsOps.linearRegression(df, "x", "y").head()
    r.getAs[Double]("slope") shouldBe 0.6 +- 1e-12
    val t = r.getAs[Double]("slope_t")
    // exact df=3 closed form: 2(1 − [0.5 + (atan(t/√3) + t√3/(t²+3))/π])
    val exact = 2 * (1 - (0.5 + (math.atan(t / math.sqrt(3)) +
      t * math.sqrt(3) / (t * t + 3)) / math.Pi))
    r.getAs[Double]("p_value") shouldBe exact +- 1e-10
    r.getAs[Double]("p_value") shouldBe D.tTwoSidedP(t, 3.0) +- 1e-12
  }

  test("mann-whitney z-test matches the hand-computed no-ties case") {
    // A = {1,2,3}, B = {4,5,6}: U_A = 0, z = -4.5/sqrt(5.25),
    // p = 2(1 - Phi(1.9639...)) = 0.049535 (scipy, no continuity corr)
    val df = Seq((1.0, "a"), (2.0, "a"), (3.0, "a"),
      (4.0, "b"), (5.0, "b"), (6.0, "b")).toDF("v", "g")
    val r = StatsOps.mannWhitneyUTest(df, "v", "g", "a", "b").head()
    r.getAs[Double]("u") shouldBe 0.0 +- 1e-12
    r.getAs[Double]("z") shouldBe (-4.5 / math.sqrt(5.25)) +- 1e-6
    r.getAs[Double]("p_value") shouldBe 0.049535 +- 1e-5
  }

  test("mann-whitney rank computation uses no single-partition window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = (1 to 200).map(i => ((i % 37).toDouble, // ties
      if (i % 2 == 0) "a" else "b")).toDF("v", "g")
    val out = StatsOps.mannWhitneyU(df, "v", "g", "a", "b")
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: LWindow => w
    }
    windows should not be empty
    windows.foreach(_.partitionSpec should not be empty)
    // and the ranks are still exactly the global-window ranks:
    // rank sums over both groups must total n(n+1)/2
    val sums = out.agg(sum($"rank_sum")).head().getDouble(0)
    sums shouldBe (200.0 * 201.0 / 2) +- 1e-9
  }

  test("normSInvCol matches the scalar Acklam form bit-for-bit") {
    // grid spanning all three branches, including the split points
    val ps = Seq(1e-6, 0.001, 0.02, 0.02425, 0.0243, 0.1, 0.25, 0.5,
      0.75, 0.9, 0.97575, 0.9758, 0.999, 1.0 - 1e-6)
    val out = ps.toDF("p")
      .withColumn("z", D.normSInvCol($"p"))
      .orderBy("p").select("p", "z").collect()
    out.foreach { r =>
      r.getDouble(1) shouldBe D.normSInv(r.getDouble(0))
    }
    // round trip through the normal CDF (both approximations ~1e-7)
    ps.foreach { p =>
      D.normalCdf(D.normSInv(p)) shouldBe p +- 1e-6
    }
  }
}
