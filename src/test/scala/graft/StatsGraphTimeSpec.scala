package graft

import org.apache.spark.sql.functions._
import graft.stats.StatsOps
import graft.graphops.GraphOps
import graft.timeseries.TimeSeriesOps

/** Stats / graph / time-series layers against closed-form expectations. */
class StatsGraphTimeSpec extends SparkSpecBase {
  import spark.implicits._

  test("linearRegression recovers an exact line") {
    val df = (1 to 20).map(x => (x.toDouble, 3.0 * x + 7.0))
      .toDF("x", "y")
    val r = StatsOps.linearRegression(df, "x", "y").head()
    approx(r.getDouble(0), 3.0, 1e-9)
    approx(r.getDouble(1), 7.0, 1e-9)
    approx(r.getDouble(2), 1.0, 1e-9)
  }

  test("ttestWelch on equal samples gives t≈0") {
    val df = ((1 to 10).map(i => ("a", i.toDouble)) ++
      (1 to 10).map(i => ("b", i.toDouble))).toDF("g", "v")
    val r = StatsOps.ttestWelch(df, "v", "g", "a", "b").head()
    approx(r.getAs[Double]("t_stat"), 0.0, 1e-9)
  }

  test("chiSquare of independent uniform vars is 0; dependence is large") {
    val indep = (0 until 400).map(i => (s"a${(i / 4) % 2}", s"b${i % 4}"))
      .toDF("x", "y")
    val r = StatsOps.chiSquare(indep, "x", "y").head()
    approx(r.getAs[Double]("chi2"), 0.0, 1e-9) // perfectly uniform
    r.getAs[Long]("dof") shouldBe 3L
    // full dependence incl. empty cells: chi2 = n * (k_min - 1) = 400
    val dep = (0 until 400).map(i => (s"a${i % 2}", s"b${i % 2}"))
      .toDF("x", "y")
    approx(StatsOps.chiSquare(dep, "x", "y").head()
      .getAs[Double]("chi2"), 400.0, 1e-9)
  }

  test("describeNum computes the pandas describe block") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val r = StatsOps.describeNum(df, "v").head()
    r.getAs[Long]("count") shouldBe 100L
    approx(r.getAs[Double]("mean"), 50.5)
    approx(r.getAs[Double]("median"), 50.5)
    approx(r.getAs[Double]("q1"), 25.75)
  }

  test("corrMatrix matches built-in corr per pair and guards types") {
    val df = (0 until 200).map { i =>
      (i.toLong, (3 * i + (i % 7)).toLong, (200 - i).toLong)
    }.toDF("a", "b", "c")
    val m = StatsOps.corrMatrix(df, Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    m.size shouldBe 3
    def builtin(x: String, y: String) = df
      .agg(org.apache.spark.sql.functions.corr(
        org.apache.spark.sql.functions.col(x),
        org.apache.spark.sql.functions.col(y))).head().getDouble(0)
    approx(m(("a", "b")), builtin("a", "b"), 1e-6)
    approx(m(("a", "c")), builtin("a", "c"), 1e-6)
    approx(m(("b", "c")), builtin("b", "c"), 1e-6)
    m(("a", "c")) shouldBe -1.0 +- 1e-9 // perfectly anti-correlated
    val bad = (0 until 10).map(i => (i.toDouble, i.toDouble))
      .toDF("x", "y")
    val ex = intercept[IllegalArgumentException] {
      StatsOps.corrMatrix(bad, Seq("x", "y"))
    }
    ex.getMessage should include("integer-typed")
    // the 21-bit limb sums must stay exact for NEGATIVE values
    // (arithmetic shift floors toward -inf; limbs stay in [0, 2^21))
    // and for large magnitudes near the Long-product boundary
    val neg = (0 until 300).map { i =>
      ((i - 150).toLong * 1000003L, (((i * 37) % 300) - 150).toLong *
        999983L)
    }.toDF("a", "b")
    val nm = StatsOps.corrMatrix(neg, Seq("a", "b")).head().getDouble(2)
    val nb = neg.agg(org.apache.spark.sql.functions.corr(
      org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b"))).head().getDouble(0)
    approx(nm, nb, 1e-6)
    // the fast double path agrees with the exact path
    val fast = StatsOps.corrMatrix(neg, Seq("a", "b"), exact = false)
      .head().getDouble(2)
    approx(fast, nm, 1e-6)
  }

  test("pacf: AR(1) has pacf(1) ~ phi and pacf(k>1) ~ 0") {
    import graft.timeseries.TimeSeriesOps
    import spark.implicits._
    // deterministic AR(1) with phi = 0.7 driven by splitmix-style
    // hash noise (white by construction, no RNG state)
    val n = 400
    val eps = (1 to n).map { i =>
      val h = i.toLong * 0x9E3779B97F4A7C15L
      val m = (h ^ (h >>> 31)) * 0xBF58476D1CE4E5B9L
      ((m >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }
    val xs = eps.scanLeft(0.0)((prev, e) => 0.7 * prev + e).tail
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i, x) }
      .toDF("g", "t", "v")
    val p = TimeSeriesOps.pacf(df, "v", "t", maxLag = 5, Seq("g"))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    p(1L) shouldBe 0.7 +- 0.1
    (2L to 5L).foreach(k => math.abs(p(k)) should be < 0.15)
  }

  test("acf: alternating series has acf(1) ~ -1, acf(2) ~ +1") {
    import graft.timeseries.TimeSeriesOps
    import spark.implicits._
    val alt = (1 to 40).map(i => ("k", i, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("g", "t", "v")
    val r = TimeSeriesOps.acf(alt, "v", "t", maxLag = 2, Seq("g"))
      .collect().map(x => x.getLong(1) -> x.getDouble(2)).toMap
    r(1L) shouldBe -0.975 +- 1e-3 // (n-1)/n edge effect at n=40
    r(2L) shouldBe 0.95 +- 1e-3
  }

  test("theilSen recovers a clean slope through outliers") {
    import graft.timeseries.TimeSeriesOps
    import spark.implicits._
    // y = 3t + 2 with two gross outliers: the median slope holds
    val pts = (1 to 20).map { t =>
      val y = if (t == 5 || t == 15) 1000.0 else 3.0 * t + 2.0
      ("k", t, y)
    }.toDF("g", "t", "v")
    val r = TimeSeriesOps.theilSen(pts, "t", "v", Seq("g")).head()
    r.getDouble(1) shouldBe 3.0 +- 1e-6
    r.getDouble(2) shouldBe 2.0 +- 1e-6
  }

  test("mannKendall: monotone, flat, and keyed series") {
    import graft.timeseries.TimeSeriesOps
    import spark.implicits._
    val up = (1 to 10).map(i => ("k", i, i.toDouble))
    val flat = (1 to 10).map(i => ("f", i, 7.0))
    val df = (up ++ flat).toDF("g", "t", "v")
    val r = TimeSeriesOps.mannKendall(df, "t", "v", Seq("g"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(3), x.getDouble(4))).toMap
    r("k")._1 shouldBe 45L // strictly increasing: n(n-1)/2 pairs
    r("k")._3 should be < 0.01 // strong trend -> tiny p
    r("f")._1 shouldBe 0L
    r("f")._2 shouldBe 0.0 +- 1e-9
    r("f")._3 shouldBe 1.0 +- 1e-9
  }

  test("pairedTTest: closed form and symmetric null") {
    import spark.implicits._
    // d = {1,2,3}: mean 2, sd 1, t = 2/(1/sqrt(3)) = 2*sqrt(3)
    val p = Seq((2.0, 1.0), (4.0, 2.0), (6.0, 3.0)).toDF("x", "y")
    val r = StatsOps.pairedTTest(p, "x", "y").head()
    r.getLong(0) shouldBe 3L
    r.getDouble(1) shouldBe 2.0 +- 1e-9
    r.getDouble(2) shouldBe 2.0 * math.sqrt(3.0) +- 1e-5
    r.getLong(3) shouldBe 2L
    // symmetric differences -> t = 0, p = 1
    val s = Seq((1.0, 2.0), (2.0, 1.0), (3.0, 5.0), (5.0, 3.0))
      .toDF("x", "y")
    val rs = StatsOps.pairedTTest(s, "x", "y").head()
    rs.getDouble(2) shouldBe 0.0 +- 1e-9
    rs.getDouble(4) shouldBe 1.0 +- 1e-6
  }

  test("twoProportionZTest and cohensD closed forms") {
    import spark.implicits._
    // A: 30/100 success, B: 20/100 -> pooled p=0.25,
    // z = 0.1/sqrt(0.25*0.75*0.02)
    val ab = ((1 to 100).map(i => (i <= 30, "A")) ++
      (1 to 100).map(i => (i <= 20, "B"))).toDF("s", "g")
    val r = StatsOps.twoProportionZTest(ab, "s", "g", "A", "B").head()
    r.getDouble(0) shouldBe 0.3 +- 1e-9
    r.getDouble(1) shouldBe 0.2 +- 1e-9
    r.getDouble(4) shouldBe 0.1 / math.sqrt(0.25 * 0.75 * 0.02) +- 1e-5
    // identical proportions -> z = 0, p = 1
    val eq = ((1 to 50).map(i => (i <= 10, "A")) ++
      (1 to 50).map(i => (i <= 10, "B"))).toDF("s", "g")
    val re = StatsOps.twoProportionZTest(eq, "s", "g", "A", "B").head()
    re.getDouble(4) shouldBe 0.0 +- 1e-9
    re.getDouble(5) shouldBe 1.0 +- 1e-6
    // Cohen's d: means 10 vs 8, both sd=1 (samples {9,10,11},{7,8,9})
    val cd = (Seq(9.0, 10.0, 11.0).map((_, "A")) ++
      Seq(7.0, 8.0, 9.0).map((_, "B"))).toDF("v", "g")
    StatsOps.cohensD(cd, "v", "g", "A", "B").head()
      .getDouble(0) shouldBe 2.0 +- 1e-9
  }

  test("kruskalWallis, bartlett, levene: closed-form small cases") {
    import spark.implicits._
    // KW on {1,2,3},{4,5,6},{7,8,9}: H = 7.2, p = e^-3.6 (dof 2)
    val kw = (Seq(1, 2, 3).map((_, "a")) ++ Seq(4, 5, 6).map((_, "b")) ++
      Seq(7, 8, 9).map((_, "c"))).toDF("v", "g")
    val rk = StatsOps.kruskalWallis(kw, "v", "g").head()
    rk.getDouble(0) shouldBe 7.2 +- 1e-9
    rk.getLong(1) shouldBe 2L
    rk.getDouble(2) shouldBe math.exp(-3.6) +- 1e-5
    // Bartlett: identical variances -> chi2 = 0, p = 1
    val bt = (Seq(1, 2, 3, 4).map((_, "a")) ++
      Seq(11, 12, 13, 14).map((_, "b"))).toDF("v", "g")
    val rb = StatsOps.bartlett(bt, "v", "g").head()
    rb.getDouble(0) shouldBe 0.0 +- 1e-9
    rb.getDouble(2) shouldBe 1.0 +- 1e-6
    // Levene/BF hand case: a={0,2,2} (z=2,0,0), b={0,4,4,8}
    // (z=4,0,0,4) -> W = 3.047619/3.733333 = 0.816327
    val lv = (Seq(0.0, 2.0, 2.0).map((_, "a")) ++
      Seq(0.0, 4.0, 4.0, 8.0).map((_, "b"))).toDF("v", "g")
    StatsOps.leveneBrownForsythe(lv, "v", "g").head()
      .getDouble(0) shouldBe 0.816327 +- 1e-5
    // zero within-spread -> null W, no ANSI throw
    val dz = (Seq(1.0, 3.0).map((_, "a")) ++
      Seq(11.0, 13.0).map((_, "b"))).toDF("v", "g")
    StatsOps.leveneBrownForsythe(dz, "v", "g").head()
      .isNullAt(0) shouldBe true
  }

  test("wilcoxonSignedRank: closed-form W+, tie correction, zeros drop") {
    import spark.implicits._
    // all differences positive and distinct: W+ = n(n+1)/2 = 15
    val pos = Seq((6.0, 5.0), (7.0, 5.0), (8.0, 5.0), (9.0, 5.0),
      (10.0, 5.0)).toDF("x", "y")
    val r = StatsOps.wilcoxonSignedRank(pos, "x", "y").head()
    r.getLong(0) shouldBe 5L
    r.getDouble(1) shouldBe 15.0 +- 1e-9
    r.getDouble(2) shouldBe (15.0 - 7.5) / math.sqrt(5 * 6 * 11 / 24.0) +- 1e-6
    // zero differences are dropped; perfect symmetry -> z = 0, p = 1
    val sym = Seq((1.0, 3.0), (3.0, 1.0), (2.0, 5.0), (5.0, 2.0),
      (4.0, 4.0)).toDF("x", "y")
    val rs = StatsOps.wilcoxonSignedRank(sym, "x", "y").head()
    rs.getLong(0) shouldBe 4L // the (4,4) pair dropped
    rs.getDouble(2) shouldBe 0.0 +- 1e-9
    rs.getDouble(3) shouldBe 1.0 +- 1e-6
  }

  test("ksTest: zero D for identical samples, D=1 for disjoint") {
    import spark.implicits._
    val same = (1 to 50).flatMap(i =>
      Seq((i.toLong, "A"), (i.toLong, "B"))).toDF("v", "g")
    val r0 = StatsOps.ksTest(same, "v", "g", "A", "B").head()
    r0.getDouble(0) shouldBe 0.0 +- 1e-12       // d_stat
    r0.getDouble(3) shouldBe 1.0 +- 1e-6        // p_value
    // disjoint supports: D = 1, p ~ 0
    val disj = ((1 to 40).map(i => (i.toLong, "A")) ++
      (100 to 140).map(i => (i.toLong, "B"))).toDF("v", "g")
    val r1 = StatsOps.ksTest(disj, "v", "g", "A", "B").head()
    r1.getDouble(0) shouldBe 1.0 +- 1e-12
    r1.getDouble(3) should be < 1e-6
    // a known half-shift: A = 1..40, B = 21..60 -> D = 0.5
    val shift = ((1 to 40).map(i => (i.toLong, "A")) ++
      (21 to 60).map(i => (i.toLong, "B"))).toDF("v", "g")
    StatsOps.ksTest(shift, "v", "g", "A", "B").head()
      .getDouble(0) shouldBe 0.5 +- 1e-12
  }

  test("distributionDivergence: zero for identical, known KL, JS finite") {
    import spark.implicits._
    // identical distributions -> all divergences 0
    val same = Seq(("x", "A"), ("y", "A"), ("x", "B"), ("y", "B"))
      .toDF("cat", "g")
    val r0 = StatsOps.distributionDivergence(same, "cat", "g", "A", "B")
      .head()
    r0.getDouble(0) shouldBe 0.0 +- 1e-9 // kl_ab
    r0.getDouble(2) shouldBe 0.0 +- 1e-9 // js
    r0.getDouble(3) shouldBe math.log(2.0) +- 1e-6 // uniform over 2
    // A = {x:3/4, y:1/4}, B = {x:1/4, y:3/4}: KL = (1/2)ln 3 both ways
    val skew = (Seq.fill(3)("x") :+ "y").map((_, "A")) ++
      (Seq.fill(3)("y") :+ "x").map((_, "B"))
    val r1 = StatsOps.distributionDivergence(skew.toDF("cat", "g"),
      "cat", "g", "A", "B").head()
    r1.getDouble(0) shouldBe 0.5 * math.log(3.0) +- 1e-6
    r1.getDouble(1) shouldBe 0.5 * math.log(3.0) +- 1e-6
    // category only in A: KL(A||B) infinite, JS still finite
    val disj = Seq(("x", "A"), ("z", "A"), ("x", "B"), ("x", "B"))
      .toDF("cat", "g")
    val r2 = StatsOps.distributionDivergence(disj, "cat", "g", "A", "B")
      .head()
    r2.getDouble(0).isPosInfinity shouldBe true
    r2.getDouble(2).isPosInfinity shouldBe false
  }

  test("resampleOhlc picks first/last by time with max/min between") {
    import graft.timeseries.TimeSeriesOps
    val df = Seq(
      (1L, "2024-01-01 10:05:00", 30L), // open of the 10:00 bucket
      (2L, "2024-01-01 10:20:00", 80L), // high
      (3L, "2024-01-01 10:40:00", 10L), // low
      (4L, "2024-01-01 10:55:00", 45L), // close
      (5L, "2024-01-01 11:10:00", 7L)   // next bucket
    ).toDF("id", "tss", "v").withColumn("ts", $"tss".cast("timestamp"))
    val r = TimeSeriesOps.resampleOhlc(df, "ts", "v", "hour", "id")
      .orderBy("bucket").collect()
    r.length shouldBe 2
    (r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
      r(0).getLong(4), r(0).getLong(5)) shouldBe ((30L, 80L, 10L, 45L, 4L))
    (r(1).getLong(1), r(1).getLong(4)) shouldBe ((7L, 7L))
  }

  test("mannWhitneyU rank sums are consistent") {
    val df = (Seq.fill(3)("a") zip Seq(1.0, 2.0, 3.0)) ++
      (Seq.fill(3)("b") zip Seq(4.0, 5.0, 6.0)) match {
      case s => s.toDF("g", "v")
    }
    val r = StatsOps.mannWhitneyU(df, "v", "g", "a", "b")
      .orderBy("g").collect()
    r(0).getAs[Double]("u") shouldBe 0.0 // a strictly below b
    r(1).getAs[Double]("u") shouldBe 9.0
  }

  test("degrees on a small directed graph") {
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val d = GraphOps.degrees(e).orderBy("id").collect()
      .map(r => (r.getString(0), r.getAs[Long]("out_degree"),
        r.getAs[Long]("in_degree"))).toSeq
    d shouldBe Seq(("a", 2L, 0L), ("b", 1L, 1L), ("c", 0L, 2L))
  }

  test("connectedComponents separates two triangles") {
    val e = Seq((1, 2), (2, 3), (3, 1), (10, 11), (11, 12))
      .toDF("src", "dst")
    val comps = GraphOps.connectedComponents(e)
      .as[(Int, Int)].collect().toMap
    comps(1) shouldBe comps(3)
    comps(10) shouldBe comps(12)
    comps(1) should not be comps(10)
    comps(1) shouldBe 1
    comps(10) shouldBe 10
  }

  test("boxCoxProfile: LL matches the closed form; log-normal picks 0") {
    val ys = Seq(1.0, 2.0, 4.0)
    val df = ys.toDF("y")
    val out = graft.stats.StatsOps.boxCoxProfile(df, "y")
      .orderBy("lambda").collect()
    def varN(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val slny = ys.map(math.log).sum
    // lambda = 1: t = y - 1, LL = -n/2 ln(var(y)) + 0
    val l1 = out.find(_.getDouble(0) == 1.0).get
    approx(l1.getAs[Double]("ll"),
      -1.5 * math.log(varN(ys)) + 0.0, 1e-9)
    // lambda = 0: t = ln y, LL = -n/2 ln(var(ln y)) - slny
    val l0 = out.find(_.getDouble(0) == 0.0).get
    approx(l0.getAs[Double]("ll"),
      -1.5 * math.log(varN(ys.map(math.log))) - slny, 1e-9)
    // geometric series is exactly log-symmetric -> lambda 0 wins
    l0.getAs[Boolean]("is_best") shouldBe true
    out.count(_.getAs[Boolean]("is_best")) shouldBe 1
  }

  test("rankInverseNormal: Blom scores with tie-averaged midranks") {
    import graft.stats.Distributions
    val df = Seq(("k", 1), ("k", 1), ("k", 2)).toDF("g", "v")
    val out = graft.stats.StatsOps
      .rankInverseNormal(df, "v", Seq("g")).orderBy("v").collect()
    approx(out(0).getAs[Double]("midrank"), 1.5, 1e-12)
    approx(out(1).getAs[Double]("midrank"), 3.0, 1e-12)
    approx(out(0).getAs[Double]("rint"),
      Distributions.normSInv((1.5 - 0.375) / 3.25), 1e-12)
    approx(out(1).getAs[Double]("rint"),
      Distributions.normSInv((3.0 - 0.375) / 3.25), 1e-12)
    // median of an odd tie-free series maps to exactly Phi^-1(.5)=0
    val odd = Seq(("k", 1), ("k", 2), ("k", 3)).toDF("g", "v")
    val mid = graft.stats.StatsOps.rankInverseNormal(odd, "v",
      Seq("g")).filter($"v" === 2).head()
    approx(mid.getAs[Double]("rint"), 0.0, 1e-12)
  }

  test("groupedBaselineForecasts: naive/snaive/drift picks") {
    // y = 10,20,30,40 with season 2: last=40, first=10
    val df = (1 to 4).map(i => ("k", i, i * 10.0)).toDF("k", "t", "v")
    val out = graft.timeseries.TimeSeriesOps
      .groupedBaselineForecasts(df, "v", "t", Seq("k"), season = 2,
        steps = 3).orderBy("h").collect()
    out.map(_.getAs[Double]("naive")).toSeq shouldBe
      Seq(40.0, 40.0, 40.0)
    // season 2: h=1 -> y3=30, h=2 -> y4=40, h=3 -> y3=30
    out.map(_.getAs[Double]("snaive")).toSeq shouldBe
      Seq(30.0, 40.0, 30.0)
    // drift slope = (40-10)/3 = 10 per step
    out.map(_.getAs[Double]("drift")).toSeq shouldBe
      Seq(50.0, 60.0, 70.0)
    // series shorter than the season -> null snaive
    val short = Seq(("k", 1, 5.0)).toDF("k", "t", "v")
    val r = graft.timeseries.TimeSeriesOps
      .groupedBaselineForecasts(short, "v", "t", Seq("k"),
        season = 2, steps = 1).head()
    r.isNullAt(r.fieldIndex("snaive")) shouldBe true
    r.isNullAt(r.fieldIndex("drift")) shouldBe true // n = 1
  }

  test("groupedThetaForecast: hand-computed SES + half-drift") {
    // y = 1,2,3 (slope exactly 1), alpha 0.5: levels 1, 1.5, 2.25;
    // w = 0.125; h=1 multiplier = 1-1+2-0.25 = 1.75 -> 2.25+0.875
    val df = Seq(("k", 1, 1.0), ("k", 2, 2.0), ("k", 3, 3.0))
      .toDF("k", "t", "v")
    val out = graft.timeseries.TimeSeriesOps
      .groupedThetaForecast(df, "v", "t", Seq("k"), alpha = 0.5,
        steps = 2).orderBy("h").collect()
    out(0).getAs[Long]("n") shouldBe 3L
    approx(out(0).getAs[Double]("forecast"), 3.125, 1e-12)
    // h=2 adds one more half-slope unit: +0.5
    approx(out(1).getAs[Double]("forecast"), 3.625, 1e-12)
  }

  test("groupedCroston: hand-computed size/interval EWMAs") {
    // series: 0, 4, 0, 0, 6, 0 (alpha 0.5)
    // first demand at t2: z=4, p=2 (interval incl.); next at t5:
    // z = .5*6+.5*4 = 5; p = .5*3+.5*2 = 2.5 -> croston 2, sba 1.5
    val df = Seq((1, 0.0), (2, 4.0), (3, 0.0), (4, 0.0), (5, 6.0),
      (6, 0.0)).map { case (t, v) => ("k", t, v) }
      .toDF("k", "t", "v")
    val r = graft.timeseries.TimeSeriesOps
      .groupedCroston(df, "v", "t", Seq("k"), alpha = 0.5).head()
    r.getAs[Long]("n_periods") shouldBe 6L
    r.getAs[Long]("n_demands") shouldBe 2L
    approx(r.getAs[Double]("size_ewma"), 5.0, 1e-12)
    approx(r.getAs[Double]("interval_ewma"), 2.5, 1e-12)
    approx(r.getAs[Double]("croston"), 2.0, 1e-12)
    approx(r.getAs[Double]("sba"), 0.75 * 2.0, 1e-12)
    // all-zero key -> null forecast
    val zero = Seq(("z", 1, 0.0), ("z", 2, 0.0)).toDF("k", "t", "v")
    val r2 = graft.timeseries.TimeSeriesOps
      .groupedCroston(zero, "v", "t", Seq("k"), alpha = 0.5).head()
    r2.isNullAt(r2.fieldIndex("croston")) shouldBe true
  }

  test("rmst: step integral of the KM curve, clipped at tau") {
    // events at t=1 and t=3 (n=2): S=1 on [0,1), 0.5 on [1,3), 0 after
    val ev = Seq((1L, 1L), (3L, 1L)).toDF("dur", "ev")
    val r = graft.stats.StatsOps.rmst(ev, "dur", "ev", tau = 5.0)
      .head()
    approx(r.getAs[Double]("rmst"), 1.0 + 0.5 * 2, 1e-9)
    r.getAs[Long]("n_steps") shouldBe 3L
    // censoring at t=3 keeps S=0.5 through tau
    val cz = Seq((1L, 1L), (3L, 0L)).toDF("dur", "ev")
    val r2 = graft.stats.StatsOps.rmst(cz, "dur", "ev", tau = 5.0)
      .head()
    approx(r2.getAs[Double]("rmst"), 1.0 + 0.5 * 2 + 0.5 * 2, 1e-9)
  }

  test("brunnerMunzel: hand-computed stats on {1,2,3} vs {2,3,4}") {
    // combined midranks: 1, 2.5, 2.5, 4.5, 4.5, 6
    // m1 = 8/3, m2 = 13/3; v1 = v2 = 7/12
    // W = 9*(5/3)/6/sqrt(3.5); df = 3.5^2 / (2*(1.75^2/2)) = 4
    val df = Seq(("a", 1), ("a", 2), ("a", 3),
      ("b", 2), ("b", 3), ("b", 4)).toDF("g", "v")
    val r = graft.stats.StatsOps
      .brunnerMunzel(df, "v", "g", "a", "b").head()
    r.getAs[Long]("n_a") shouldBe 3L
    approx(r.getAs[Double]("p_hat"), 7.0 / 9, 1e-12)
    approx(r.getAs[Double]("w_stat"), 2.5 / math.sqrt(3.5), 1e-9)
    approx(r.getAs[Double]("df"), 4.0, 1e-9)
    // degenerate: all values equal -> null W
    val same = Seq(("a", 1), ("a", 1), ("b", 1), ("b", 1))
      .toDF("g", "v")
    val r2 = graft.stats.StatsOps
      .brunnerMunzel(same, "v", "g", "a", "b").head()
    approx(r2.getAs[Double]("p_hat"), 0.5, 1e-12)
    r2.isNullAt(r2.fieldIndex("w_stat")) shouldBe true
  }

  test("iccOneWay: perfect within-agreement = 1, none = -1/(k0-1)") {
    val perfect = Seq(("a", 5L), ("a", 5L), ("b", 9L), ("b", 9L))
      .toDF("g", "x")
    val r1 = graft.stats.StatsOps.iccOneWay(perfect, "g", "x").head()
    approx(r1.getAs[Double]("k0"), 2.0, 1e-12)
    approx(r1.getAs[Double]("icc"), 1.0, 1e-12)
    val none = Seq(("a", 1L), ("a", 3L), ("b", 1L), ("b", 3L))
      .toDF("g", "x")
    val r2 = graft.stats.StatsOps.iccOneWay(none, "g", "x").head()
    approx(r2.getAs[Double]("msb"), 0.0, 1e-12)
    approx(r2.getAs[Double]("icc"), -1.0, 1e-12)
  }

  test("blandAltman: hand-computed bias, limits, within count") {
    import graft.stats.Distributions
    val df = Seq((10L, 10L), (12L, 10L), (14L, 10L), (16L, 10L))
      .toDF("x", "y") // diffs 0,2,4,6
    val r = graft.stats.StatsOps.blandAltman(df, "x", "y").head()
    r.getAs[Long]("n") shouldBe 4L
    approx(r.getAs[Double]("mean_diff"), 3.0, 1e-12)
    val sd = math.sqrt(20.0 / 3)
    approx(r.getAs[Double]("sd_diff"), sd, 1e-12)
    val z = Distributions.normSInv(0.975)
    approx(r.getAs[Double]("loa_lo"), 3.0 - z * sd, 1e-9)
    approx(r.getAs[Double]("loa_hi"), 3.0 + z * sd, 1e-9)
    r.getAs[Long]("n_within") shouldBe 4L
  }

  test("yuenTTest: hand-computed trim/winsor stats on 1..10 shift") {
    // a = 1..10, b = a + 10; trim 0.2 -> k=2, h=6
    // trimmed mean a = mean(3..8) = 5.5
    // winsorized a: {3,3,3,4,5,6,7,8,8,8}: sw2 = (345 - 302.5)/9
    // d = sw2*9/(6*5); same for b; df = (2d)^2/(2 d^2/5) = 10
    val df = ((1 to 10).map(v => ("a", v.toLong)) ++
      (1 to 10).map(v => ("b", v + 10L))).toDF("g", "x")
    val r = graft.stats.StatsOps
      .yuenTTest(df, "x", "g", "a", "b", trim = 0.2).head()
    r.getAs[Long]("n_a") shouldBe 10L
    r.getAs[Long]("h_a") shouldBe 6L
    approx(r.getAs[Double]("tmean_a"), 5.5, 1e-12)
    approx(r.getAs[Double]("tmean_b"), 15.5, 1e-12)
    val sw2 = (345.0 - 302.5) / 9
    val d = sw2 * 9 / (6.0 * 5)
    approx(r.getAs[Double]("t_stat"), -10.0 / math.sqrt(2 * d), 1e-9)
    approx(r.getAs[Double]("df"), 10.0, 1e-9)
    assert(r.getAs[Double]("p_norm") < 0.01)
  }

  test("sequentialLooks: cumulative Welch z + boundaries by style") {
    import graft.stats.Distributions
    val df = Seq(
      (1, "a", 0L), (1, "a", 2L), (1, "a", 4L), (1, "b", 1L),
      (1, "b", 3L), (2, "a", 6L), (2, "b", 5L), (2, "b", 7L))
      .toDF("look", "arm", "v")
    def welchZ(xs: Seq[Long], ys: Seq[Long]): Double = {
      def mv(s: Seq[Long]) = {
        val n = s.size.toDouble; val m = s.sum / n
        (m, s.map(x => (x - m) * (x - m)).sum / (n - 1), n)
      }
      val (ma, va, na) = mv(xs); val (mb, vb, nb) = mv(ys)
      (ma - mb) / math.sqrt(va / na + vb / nb)
    }
    val bon = graft.stats.StatsOps.sequentialLooks(df, "arm", "v",
      "look", "a", "b", alpha = 0.05, style = "bonferroni")
      .orderBy("look").collect()
    bon.length shouldBe 2
    approx(bon(0).getAs[Double]("z"),
      welchZ(Seq(0, 2, 4), Seq(1, 3)), 1e-9)
    approx(bon(1).getAs[Double]("z"),
      welchZ(Seq(0, 2, 4, 6), Seq(1, 3, 5, 7)), 1e-9)
    val zBon = Distributions.normSInv(1 - 0.05 / 4) // K = 2
    for (r <- bon) {
      approx(r.getAs[Double]("boundary"), zBon, 1e-9)
      r.getAs[Boolean]("crossed") shouldBe
        (math.abs(r.getAs[Double]("z")) >= zBon)
    }
    val hp = graft.stats.StatsOps.sequentialLooks(df, "arm", "v",
      "look", "a", "b", alpha = 0.05, style = "haybittle-peto")
      .orderBy("look").collect()
    approx(hp(0).getAs[Double]("boundary"), 3.0, 1e-12)
    approx(hp(1).getAs[Double]("boundary"),
      Distributions.normSInv(0.975), 1e-12)
  }

  test("cem: support pruning, strata cells, ATT share weights") {
    // s1: treated {10,20} vs ctrl {10} -> diff 5
    // s2: treated {30} vs ctrl {20,40} -> diff 0
    // s3: treated-only {99} -> pruned
    val df = Seq(("s1", true, 10L), ("s1", true, 20L),
      ("s1", false, 10L), ("s2", true, 30L), ("s2", false, 20L),
      ("s2", false, 40L), ("s3", true, 99L))
      .toDF("s", "treated", "y")
    val per = graft.stats.StatsOps.cem(df, "treated", "y", Seq("s"))
      .orderBy("s").collect()
    per.length shouldBe 2 // s3 pruned
    approx(per(0).getAs[Double]("att_contrib"), 2.0 / 3 * 5, 1e-12)
    approx(per(1).getAs[Double]("att_contrib"), 0.0, 1e-12)
    val att = graft.stats.StatsOps
      .cemAtt(df, "treated", "y", Seq("s")).head()
    att.getAs[Long]("n_strata") shouldBe 2L
    att.getAs[Long]("matched_treat") shouldBe 3L
    att.getAs[Long]("matched_ctrl") shouldBe 3L
    att.getAs[Long]("tot_treat") shouldBe 4L
    att.getAs[Long]("tot_ctrl") shouldBe 3L
    approx(att.getAs[Double]("att"), 10.0 / 3, 1e-12)
  }

  test("cuped: y = 2x exactly -> rho2 = 1, arm means equalized") {
    val df = Seq(("a", 1L, 2L), ("a", 2L, 4L),
      ("b", 3L, 6L), ("b", 4L, 8L)).toDF("arm", "x", "y")
    val out = graft.stats.StatsOps.cupedByArm(df, "arm", "y", "x")
      .orderBy("arm").collect()
    approx(out(0).getAs[Double]("theta"), 2.0, 1e-12)
    approx(out(0).getAs[Double]("var_reduction"), 1.0, 1e-12)
    approx(out(0).getAs[Double]("y_mean"), 3.0, 1e-12)
    approx(out(0).getAs[Double]("y_cuped_mean"), 5.0, 1e-12)
    approx(out(1).getAs[Double]("y_mean"), 7.0, 1e-12)
    approx(out(1).getAs[Double]("y_cuped_mean"), 5.0, 1e-12)
  }

  test("powerTwoSample: hand-computed dz, d, power, n_required") {
    import graft.stats.Distributions
    // x: 0,2,4 -> n=3, m=2, s2=4; y: 1,3,5,7 -> n=4, m=4, s2=20/3
    // se = sqrt(4/3 + 5/3) = sqrt(3); dz = 2/sqrt(3)
    // sp2 = (2*4 + 3*20/3)/5 = 5.6; d = 2/sqrt(5.6)
    val df = (Seq(0, 2, 4).map(v => ("x", v)) ++
      Seq(1, 3, 5, 7).map(v => ("y", v))).toDF("g", "v")
    val r = graft.stats.StatsOps.powerTwoSample(df, "v", "g", "x", "y")
      .head()
    r.getAs[Long]("n_a") shouldBe 3L
    r.getAs[Long]("n_b") shouldBe 4L
    val dz = 2.0 / math.sqrt(3.0)
    val d = 2.0 / math.sqrt(5.6)
    approx(r.getAs[Double]("z_effect"), dz, 1e-6)
    approx(r.getAs[Double]("effect_d"), d, 1e-6)
    val zc = Distributions.normSInv(0.975)
    val zp = Distributions.normSInv(0.8)
    approx(r.getAs[Double]("power"),
      Distributions.normalCdf(dz - zc) +
        Distributions.normalCdf(-dz - zc), 1e-6)
    r.getAs[Long]("n_required") shouldBe
      math.ceil(2.0 * math.pow((zc + zp) / d, 2)).toLong
    // sanity: requested power is modest here, so n_req > observed n
    r.getAs[Long]("n_required") should be > 4L
  }

  test("powerTwoSample saturates to 1 on a huge effect") {
    val df = ((1 to 50).map(v => ("x", v)) ++
      (1 to 50).map(v => ("y", v + 1000))).toDF("g", "v")
    val r = graft.stats.StatsOps.powerTwoSample(df, "v", "g", "x", "y")
      .head()
    approx(r.getAs[Double]("power"), 1.0, 1e-9)
    r.getAs[Long]("n_required") shouldBe 1L
  }

  test("mergeIntervals: touching merges, gaps break, per key") {
    val df = Seq(("a", 1, 3), ("a", 3, 4), ("a", 2, 4), ("a", 5, 6),
      ("a", 8, 9), ("b", 1, 10), ("b", 2, 3))
      .toDF("k", "s", "e")
    val out = graft.ops.PandasOps
      .mergeIntervals(df, Seq("k"), "s", "e")
      .orderBy("k", "island")
      .select("k", "start", "end", "n_intervals")
      .as[(String, Int, Int, Long)].collect().toSeq
    out shouldBe Seq(("a", 1, 4, 3L), ("a", 5, 6, 1L),
      ("a", 8, 9, 1L), ("b", 1, 10, 2L))
  }

  test("assortativity: star = -1, constant-degree cycle = null") {
    val star = Seq(("c", "a"), ("c", "b"), ("c", "d"))
      .toDF("src", "dst")
    val r = GraphOps.assortativity(star).head()
    r.getAs[Long]("m_edges") shouldBe 3L
    approx(r.getAs[Double]("assortativity"), -1.0, 1e-12)
    val cycle = Seq((1, 2), (2, 3), (3, 4), (4, 1)).toDF("src", "dst")
    val c = GraphOps.assortativity(cycle).head()
    c.isNullAt(c.fieldIndex("assortativity")) shouldBe true
  }

  test("modularity: two triangles + bridge, hand-computed") {
    // triangle {1,2,3} in A, triangle {4,5,6} in B, bridge 3-4;
    // m=7, d_A=d_B=7, internal=3 each:
    // dq = 3/7 - (7/14)^2 = 0.1785714...; Q = 2*dq
    val e = Seq((1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4),
      (3, 4)).toDF("src", "dst")
    val pm = Seq((1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "B"),
      (6, "B")).toDF("id", "comm")
    val rows = GraphOps.modularity(e, pm).orderBy("comm").collect()
    rows.length shouldBe 2
    for (r <- rows) {
      r.getAs[Long]("n_nodes") shouldBe 3L
      r.getAs[Long]("degree_sum") shouldBe 7L
      r.getAs[Long]("internal_edges") shouldBe 3L
      approx(r.getAs[Double]("dq"), 3.0 / 7 - 0.25, 1e-12)
    }
    val q = GraphOps.modularityScore(e, pm).head().getDouble(0)
    approx(q, 2 * (3.0 / 7 - 0.25), 1e-12)
  }

  test("modularity: single community scores 0; isolated counted") {
    val e = Seq((1, 2), (2, 3), (2, 1), (3, 2), (1, 1))
      .toDF("src", "dst") // dupes/reverses/self-loop normalize away
    val pm = Seq((1, "A"), (2, "A"), (3, "A"), (9, "A"))
      .toDF("id", "comm")
    val r = GraphOps.modularity(e, pm).head()
    r.getAs[Long]("n_nodes") shouldBe 4L // isolated 9 counted
    r.getAs[Long]("internal_edges") shouldBe 2L
    r.getAs[Long]("degree_sum") shouldBe 4L
    approx(r.getAs[Double]("dq"), 0.0, 1e-12)
  }

  test("connectedComponents includes isolated vertices when given") {
    val e = Seq((1, 2)).toDF("src", "dst")
    val v = Seq(1, 2, 7).toDF("id") // 7 has no incident edge
    val comps = GraphOps.connectedComponents(e, vertices = Some(v))
      .as[(Int, Int)].collect().toMap
    comps shouldBe Map(1 -> 1, 2 -> 1, 7 -> 7)
  }

  test("dfsOrder visits depth-first with ascending tie-break") {
    //   1 - 2 - 4
    //    \  |
    //     3-+        (3 connects to 1 and 2)
    val e = Seq(("1", "2"), ("1", "3"), ("2", "3"), ("2", "4"))
      .toDF("src", "dst")
    val order = GraphOps.dfsOrder(e, "1")
      .as[(String, Long)].collect().sortBy(_._2).map(_._1)
    // from 1: smallest neighbor 2 first, then its smallest unvisited 3,
    // 3's neighbors visited, backtrack to 2 -> 4
    order shouldBe Array("1", "2", "3", "4")
  }

  test("closeness centrality: exact on a path graph, sampled scales") {
    val e = Seq((1, 2), (2, 3), (3, 4), (4, 5)).toDF("src", "dst")
    val all = GraphOps.closenessCentrality(e, Seq(1, 2, 3, 4, 5), 5)
      .as[(Int, Double, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    // path a-b-c-d-e: c(center) = 4/(2+1+1+2) = 2/3; ends = 4/10
    approx(all(3), 4.0 / 6.0, 1e-9)
    approx(all(1), 4.0 / 10.0, 1e-9)
    approx(all(5), 4.0 / 10.0, 1e-9)
    // sampled from 3 sources: estimator stays in the right order
    val sampled = GraphOps.closenessCentrality(e, Seq(1, 3, 5), 5)
      .as[(Int, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    sampled(3) should be > sampled(1)
  }

  test("betweenness centrality: exact pair counts on path and star") {
    val path = Seq((1, 2), (2, 3), (3, 4), (4, 5)).toDF("src", "dst")
    val b = GraphOps.betweennessCentrality(path, Seq(1, 2, 3, 4, 5))
      .as[(Int, Double)].collect().toMap
    // pairs through each interior vertex: b2 = |{1}x{3,4,5}| = 3,
    // b3 = |{1,2}x{4,5}| = 4, b4 = 3; endpoints 0 (absent or 0)
    approx(b(3), 4.0, 1e-9)
    approx(b(2), 3.0, 1e-9)
    approx(b(4), 3.0, 1e-9)
    b.getOrElse(1, 0.0) shouldBe 0.0 +- 1e-9
    // star: center carries every pair = (n-1)(n-2)/2 = 6 for n = 5
    val star = Seq((0, 1), (0, 2), (0, 3), (0, 4)).toDF("src", "dst")
    val bs = GraphOps.betweennessCentrality(star, Seq(0, 1, 2, 3, 4))
      .as[(Int, Double)].collect().toMap
    approx(bs(0), 6.0, 1e-9)
    bs.getOrElse(1, 0.0) shouldBe 0.0 +- 1e-9
  }

  test("pageRank mass is conserved and sink handling works") {
    val e = Seq(("a", "b"), ("b", "c")).toDF("src", "dst") // c is a sink
    val pr = GraphOps.pageRank(e, iterations = 20)
      .as[(String, Double)].collect().toMap
    approx(pr.values.sum, 1.0, 1e-6)
    pr("c") should be > pr("a")
  }

  test("shortestPaths relaxes weighted edges (Dijkstra semantics)") {
    val e = Seq(("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 5.0),
      ("c", "d", 1.0)).toDF("src", "dst", "weight")
    val d = GraphOps.shortestPaths(e, "a")
      .collect().map(r => r.getString(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    d("a") shouldBe Some(0.0)
    d("b") shouldBe Some(1.0)
    d("c") shouldBe Some(2.0) // via b, not the direct 5.0 edge
    d("d") shouldBe Some(3.0)
  }

  test("bootstrap yields one stat per resample, centered near the estimate") {
    val df = (1 to 200).map(_.toDouble).toDF("v")
    val bs = StatsOps.bootstrap(df, 20, avg($"v"))
      .select("stat").as[Double].collect()
    bs.length shouldBe 20
    val m = bs.sum / bs.length
    m shouldBe 100.5 +- 10.0 // resample means cluster near the mean
    bs.distinct.length should be > 1 // different seeds → different draws
  }

  test("anovaOneWay: identical groups F≈0, separated groups F large") {
    val same = (0 until 60).map(i => (s"g${i % 3}", (i / 3 % 5).toDouble))
      .toDF("g", "v")
    StatsOps.anovaOneWay(same, "v", "g").head()
      .getAs[Double]("f_stat") shouldBe 0.0 +- 1e-9
    val sep = ((1 to 20).map(i => ("a", i / 100.0)) ++
      (1 to 20).map(i => ("b", 50.0 + i / 100.0))).toDF("g", "v")
    StatsOps.anovaOneWay(sep, "v", "g").head()
      .getAs[Double]("f_stat") should be > 1000.0
  }

  test("cramersV and NMI detect association strength") {
    val dep = (0 until 100).map(i => (s"a${i % 3}", s"b${i % 3}"))
      .toDF("x", "y") // perfect association
    approx(StatsOps.cramersV(dep, "x", "y").head().getDouble(0), 1.0, 1e-6)
    approx(StatsOps.normalizedMutualInfo(dep, "x", "y")
      .head().getDouble(0), 1.0, 1e-6)
    val indep = (0 until 90).map(i => (s"a${i % 3}", s"b${(i / 3) % 3}"))
      .toDF("x", "y")
    approx(StatsOps.cramersV(indep, "x", "y").head().getDouble(0), 0.0, 1e-6)
  }

  test("positional selection, head/tail/offset, concatCols, rollingAll") {
    import graft.ops.PandasOps._
    val df = Seq((1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0))
      .toDF("ord", "v")
    df.selectRowsByPosition(Seq(0L, 2L), Seq("ord"))
      .select("ord").as[Int].collect().sorted shouldBe Array(1, 3)
    df.headN(2, Seq("ord")).select("ord").as[Int].collect() shouldBe
      Array(1, 2)
    df.tailN(1, Seq("ord")).select("ord").as[Int].head() shouldBe 4
    df.offsetN(3, Seq("ord")).select("ord").as[Int].collect() shouldBe
      Array(4)
    val other = Seq((1, "x"), (9, "z")).toDF("ord", "s")
    df.concatCols(other, "ord").count() shouldBe 5
    val rolled = df.rollingAll(2, c => avg(c), Seq("ord"))
    rolled.columns should contain("v_roll2")
    rolled.orderBy("ord").select("v_roll2").as[Double]
      .collect() shouldBe Array(10.0, 15.0, 25.0, 35.0)
  }

  test("bfsDistances computes hop counts") {
    val e = Seq((1, 2), (2, 3), (3, 4)).toDF("src", "dst")
    val d = GraphOps.bfsDistances(e, Seq(1))
      .collect().map(r => r.getInt(0) -> r.getAs[Int]("dist")).toMap
    d shouldBe Map(1 -> 0, 2 -> 1, 3 -> 2, 4 -> 3)
  }

  test("dateRange generates the inclusive calendar") {
    val cal = TimeSeriesOps.dateRange(spark, "2024-01-01 00:00:00",
      "2024-01-02 00:00:00", "1 HOUR")
    cal.count() shouldBe 25
  }

  test("sessionize splits on the gap") {
    val df = Seq(("u", 0L), ("u", 100L), ("u", 5000L), ("u", 5100L))
      .toDF("k", "t").withColumn("ts", timestamp_seconds($"t"))
    val out = TimeSeriesOps.sessionize(df, "ts", "k", 1800)
      .orderBy("t").select("session_id").as[Long].collect()
    out shouldBe Array(1L, 1L, 2L, 2L)
  }

  test("decomposeAdditive recovers trend+seasonal on synthetic data") {
    val period = 4
    val data = (0 until 40).map { i =>
      val trend = 10.0 + i
      val seasonal = Seq(2.0, -1.0, -2.0, 1.0)(i % period)
      (i, trend + seasonal)
    }.toDF("t", "v").withColumn("ts", timestamp_seconds($"t"))
    val out = TimeSeriesOps.decomposeAdditive(data, "ts", "v", period)
    val r = out.filter($"trend".isNotNull)
      .select(abs($"resid")).as[Double].collect()
    all(r) should be < 0.2 // residuals vanish for an exact model
  }

  test("idxmax/idxmin, where/mask, compare") {
    import graft.ops.PandasOps._
    val df = Seq((1, 5.0), (2, 9.0), (3, 1.0)).toDF("id", "v")
    df.idxmax("v", "id").head().getInt(0) shouldBe 2
    df.idxmin("v", "id").head().getInt(0) shouldBe 3
    df.whereCond("v", $"v" > 4, -1.0).select("v").as[Double]
      .collect().sorted shouldBe Array(-1.0, 5.0, 9.0)
    df.maskCond("v", $"v" > 4, -1.0).select("v").as[Double]
      .collect().sorted shouldBe Array(-1.0, -1.0, 1.0)
    val other = Seq((1, 5.0), (2, 8.0), (3, 1.0)).toDF("id", "v")
    val diff = df.dfCompare(other, Seq("id"))
    diff.count() shouldBe 1
    diff.head().getAs[Int]("id") shouldBe 2
    df.dfEquals(df) shouldBe true
    df.dfEquals(other) shouldBe false
  }

  test("time-series diagnostics: Durbin-Watson, Jarque-Bera, Ljung-Box") {
    // alternating residuals → strong negative autocorrelation → DW ≈ 4
    val alt = (0 until 100).map(i => (i, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("t", "e")
    TimeSeriesOps.durbinWatson(alt, "e", "t") shouldBe 3.96 +- 0.05
    // symmetric two-point distribution: skew 0, negative excess kurtosis
    val jb = TimeSeriesOps.jarqueBera(alt, "e")
    jb should be > 0.0
    // white-noise-ish deterministic sequence → small Q; alternating → large
    val q = TimeSeriesOps.ljungBox(alt, "e", "t", 3)
    q should be > 50.0 // alternating series is maximally autocorrelated
  }

  test("adfStatistic: stationary noise strongly negative, random walk near zero") {
    // deterministic pseudo-noise (no RNG): mean-reverting alternation
    val stationary = (0 until 200)
      .map(i => (i, math.sin(i * 1.7) + 0.1 * math.sin(i * 13.3)))
      .toDF("t", "v")
    TimeSeriesOps.adfStatistic(stationary, "v", "t") should be < -5.0
    // genuine unit-root series: pseudo-iid increments (shader-hash,
    // mean-centered); offline ADF of this exact path ≈ -2.67
    val raw = (1 to 200).map(i =>
      (math.sin(i.toDouble) * 43758.5453) % 1.0)
    val mean = raw.sum / raw.size
    val walk = raw.map(_ - mean).scanLeft(0.0)(_ + _).zipWithIndex
      .map { case (v, i) => (i, v + 100.0) }.toDF("t", "v")
    TimeSeriesOps.adfStatistic(walk, "v", "t") should be > -3.0
  }

  test("kpssStatistic: stationary small, trending large") {
    val stationary = (0 until 200)
      .map(i => (i, math.sin(i * 1.7))).toDF("t", "v")
    TimeSeriesOps.kpssStatistic(stationary, "v", "t") should be < 0.3
    val trending = (0 until 200)
      .map(i => (i, i * 1.0 + math.sin(i * 1.7))).toDF("t", "v")
    TimeSeriesOps.kpssStatistic(trending, "v", "t") should be > 1.0
  }

  test("detrendLinear removes an exact linear trend") {
    val df = (1 to 50).map(i => (i, 3.0 * i + 10.0)).toDF("t", "v")
    val out = TimeSeriesOps.detrendLinear(df, "v", "t")
      .select(abs($"v_detrended")).as[Double].collect()
    all(out) should be < 1e-9
  }

  test("lagFeatures adds lag and rolling-mean columns per key") {
    val df = Seq(("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0))
      .toDF("k", "t", "v")
    val out = TimeSeriesOps.lagFeatures(df, "v", "t", Seq("k"),
      lags = Seq(1), rollWindows = Seq(2)).orderBy("t")
    out.columns should contain allOf ("v_lag1", "v_rollmean2")
    out.select("v_lag1").as[Option[Double]].collect() shouldBe
      Array(None, Some(1.0), Some(2.0))
    out.select("v_rollmean2").as[Double].collect() shouldBe
      Array(1.0, 1.5, 2.5)
  }

  test("rollupLevels decodes grouping depth") {
    import graft.ops.PandasOps._
    val df = Seq(("x", "p", 1.0), ("x", "q", 2.0), ("y", "p", 3.0))
      .toDF("a", "b", "v")
    val out = df.rollupLevels(Seq("a", "b"), sum($"v").as("s"))
    out.filter($"level" === 0).count() shouldBe 1 // grand total
    out.filter($"level" === 1).count() shouldBe 2 // per-a subtotals
    out.filter($"level" === 2).count() shouldBe 3 // leaves
    out.filter($"level" === 0).select("s").as[Double].head() shouldBe 6.0
  }

  test("smaForecast averages the trailing window") {
    val df = (1 to 6).map(i => (i, i * 10.0)).toDF("t", "v")
    val fc = TimeSeriesOps.smaForecast(df, "v", "t", window = 3, steps = 2)
    fc.head shouldBe 50.0 +- 1e-9 // mean of 40,50,60
    fc(1) shouldBe (50.0 + 50 + 60) / 3 +- 1e-9
  }

  test("holtForecast extrapolates a linear series") {
    val fc = TimeSeriesOps.holtForecast(
      (1 to 10).map(_.toDouble), alpha = 0.8, beta = 0.8, steps = 3)
    fc.zip(Seq(11.0, 12.0, 13.0)).foreach { case (got, exp) =>
      approx(got, exp, 0.3)
    }
  }

  test("ses and linear-trend forecasters") {
    // SES on a constant series is the constant, flat over horizon
    TimeSeriesOps.sesForecast(Seq(5.0, 5.0, 5.0), 0.3, 3) shouldBe
      Seq(5.0, 5.0, 5.0)
    // linear trend extrapolates exactly on a perfect line
    val fc = TimeSeriesOps.linearTrendForecast(
      (0 until 20).map(t => 2.0 * t + 3), 3)
    fc.zipWithIndex.foreach { case (v, h) =>
      approx(v, 2.0 * (20 + h) + 3, 1e-9)
    }
  }

  test("multiplicative decomposition recovers ratio seasonality") {
    val period = 4
    val season = Seq(1.2, 0.8, 0.9, 1.1) // mean 1
    val df = (0 until 32).map(t =>
      (t, (10.0 + 0.5 * t) * season(t % period))).toDF("t", "v")
    val dec = TimeSeriesOps.decomposeMultiplicative(df, "t", "v", period)
      .filter($"trend".isNotNull)
    val byPhase = dec.withColumn("ph", pmod($"t", lit(period)))
      .groupBy("ph").agg(avg($"seasonal").as("s"))
      .as[(Int, Double)].collect().toMap
    (0 until period).foreach { p =>
      byPhase(p) shouldBe season(p) +- 0.05
    }
    // residuals multiply back to ~1
    dec.agg(avg(abs($"resid" - 1.0))).head().getDouble(0) should be < 0.05
  }

  test("breusch-godfrey: white noise passes, AR(1) rejects") {
    val rng = new scala.util.Random(21)
    val wn = (0 until 300).map(i => (i, rng.nextDouble() - 0.5))
      .toDF("t", "v")
    val (_, pWn) = TimeSeriesOps.breuschGodfrey(wn, "v", "t", 3)
    pWn should be > 0.05
    var x = 0.0
    val ar = (0 until 300).map { i =>
      x = 0.8 * x + rng.nextDouble() - 0.5; (i, x)
    }.toDF("t", "v")
    val (lm, pAr) = TimeSeriesOps.breuschGodfrey(ar, "v", "t", 3)
    lm should be > 50.0
    pAr should be < 1e-9
  }

  test("chi-square goodness-of-fit: uniform passes, skewed rejects") {
    import graft.stats.StatsOps
    val uniform = (0 until 300).map(i => ("c" + (i % 3))).toDF("cat")
    val u = StatsOps.chiSquareGof(uniform, "cat").head()
    u.getAs[Double]("chi2") shouldBe 0.0 +- 1e-9
    u.getAs[Double]("p_value") shouldBe 1.0 +- 1e-9
    val skewed = (Seq.fill(250)("a") ++ Seq.fill(30)("b") ++
      Seq.fill(20)("c")).toDF("cat")
    val s = StatsOps.chiSquareGof(skewed, "cat").head()
    s.getAs[Double]("p_value") should be < 1e-9
    // explicit expected probabilities matching the data: passes
    val e = StatsOps.chiSquareGof(skewed, "cat",
      Map("a" -> 250.0 / 300, "b" -> 30.0 / 300, "c" -> 20.0 / 300))
      .head()
    e.getAs[Double]("chi2") shouldBe 0.0 +- 1e-9
  }

  test("holtWintersForecast recovers a seasonal + trend process") {
    val period = 4
    val season = Seq(3.0, -1.0, -4.0, 2.0) // sums to zero
    val series = (0 until 40).map(t => 10 + 0.5 * t + season(t % period))
    val fc = TimeSeriesOps.holtWintersForecast(series, period,
      alpha = 0.3, beta = 0.1, gamma = 0.2, steps = 8)
    fc.zipWithIndex.foreach { case (got, i) =>
      val t = 40 + i
      approx(got, 10 + 0.5 * t + season(t % period), 0.35)
    }
  }

  test("arima recovers an AR(1) process and forecasts toward its mean") {
    // deterministic pseudo-noise AR(1): x_t = 2 + 0.6 x_{t-1} + e_t
    var x = 5.0
    val rng = new scala.util.Random(7)
    val series = (0 until 400).map { _ =>
      x = 2.0 + 0.6 * x + (rng.nextDouble() - 0.5)
      x
    }
    val m = TimeSeriesOps.arimaFit(series, p = 1, d = 0, q = 0)
    m.ar(0) shouldBe 0.6 +- 0.08
    m.intercept shouldBe 2.0 +- 0.45
    // long-horizon forecast approaches the process mean 2/(1-0.6) = 5
    val fc = TimeSeriesOps.arimaForecast(m, 40)
    fc.last shouldBe 5.0 +- 0.5
  }

  test("arima d=1 integrates back: linear trend is extrapolated") {
    val series = (1 to 80).map(t => 3.0 * t + 1 +
      0.001 * math.sin(t.toDouble)) // near-perfect line
    val fc = TimeSeriesOps.arimaForecast(series, p = 1, d = 1, q = 0,
      steps = 3)
    fc.zipWithIndex.foreach { case (got, i) =>
      approx(got, 3.0 * (81 + i) + 1, 0.2)
    }
  }

  test("arima with q>0 fits an MA component without diverging") {
    val rng = new scala.util.Random(11)
    val eps = (0 until 300).map(_ => rng.nextDouble() - 0.5)
    val series = (1 until 300).map(t => 1.0 + eps(t) + 0.5 * eps(t - 1))
    val m = TimeSeriesOps.arimaFit(series, p = 0, d = 0, q = 1)
    m.ma(0) shouldBe 0.5 +- 0.25
    val fc = TimeSeriesOps.arimaForecast(m, 5)
    fc.foreach(v => approx(v, 1.0, 0.5)) // MA(1) mean
  }

  test("phillips-perron: near ADF on iid residuals, discriminates unit root") {
    val rng = new scala.util.Random(3)
    val stat = (0 until 300).map(_ => rng.nextDouble() - 0.5)
    val sdf = stat.zipWithIndex.map { case (v, i) => (i, v) }.toDF("t", "v")
    val pp = TimeSeriesOps.phillipsPerronStatistic(sdf, "v", "t")
    val adf = TimeSeriesOps.adfStatistic(sdf, "v", "t")
    math.abs(pp - adf) should be < 1.5 // iid: correction ~vanishes
    pp should be < -6.0 // stationary: strong rejection
    var acc = 0.0
    val walk = (0 until 300).map { _ =>
      acc += rng.nextDouble() - 0.5; acc
    }
    val wdf = walk.zipWithIndex.map { case (v, i) => (i, v) }.toDF("t", "v")
    TimeSeriesOps.phillipsPerronStatistic(wdf, "v", "t") should be > -2.5
  }

  test("box-pierce is the uncorrected ljung-box; both emit p-values") {
    val rng = new scala.util.Random(5)
    val df = (0 until 200).map(i => (i, rng.nextDouble() - 0.5))
      .toDF("t", "v")
    val (q, p) = TimeSeriesOps.boxPierce(df, "v", "t", 5)
    val (lb, lbp) = TimeSeriesOps.ljungBoxTest(df, "v", "t", 5)
    q should be < lb // finite-sample factor (n+2)/(n-k) > 1
    p should be > 0.05 // white noise: no autocorrelation
    lbp should be > 0.05
    // strongly autocorrelated series rejects
    val ar = { var x = 0.0; (0 until 200).map { _ =>
      x = 0.9 * x + rng.nextDouble() - 0.5; x } }
    val (q2, p2) = TimeSeriesOps.boxPierce(
      ar.zipWithIndex.map { case (v, i) => (i, v) }.toDF("t", "v"),
      "v", "t", 5)
    p2 should be < 1e-6
  }

  test("shapiro-wilk: normal-ish high W, skewed low W, affine invariant") {
    val rng = new scala.util.Random(9)
    // approx normal via sum of uniforms (Irwin-Hall)
    val normal = (0 until 80).map(_ =>
      (0 until 12).map(_ => rng.nextDouble()).sum - 6.0)
    val (wN, pN) = TimeSeriesOps.shapiroWilk(normal)
    wN should be > 0.97
    pN should be > 0.05
    val skewed = (0 until 80).map(_ => math.pow(rng.nextDouble(), 4))
    val (wS, pS) = TimeSeriesOps.shapiroWilk(skewed)
    wS should be < 0.8
    pS should be < 0.01
    val (wA, _) = TimeSeriesOps.shapiroWilk(normal.map(v => 3 * v + 17))
    wA shouldBe wN +- 1e-9
  }

  test("anderson-darling: normal small, uniform large") {
    val rng = new scala.util.Random(13)
    val normal = (0 until 300).map(_ =>
      (0 until 12).map(_ => rng.nextDouble()).sum - 6.0)
    val ad = TimeSeriesOps.andersonDarling(normal.toDF("v"), "v")
    ad should be < 0.752 // 5% critical value, params estimated
    val uniform = (0 until 300).map(_ => rng.nextDouble())
    TimeSeriesOps.andersonDarling(uniform.toDF("v"), "v") should
      be > 0.752
  }

  test("grubbs flags a planted outlier and passes clean data") {
    val clean = (1 to 40).map(i => (i, 50.0 + (i % 7) - 3)).toDF("t", "v")
    val (_, pClean, _) = TimeSeriesOps.grubbs(clean, "v")
    pClean should be > 0.1
    val dirty = ((1 to 40).map(i => (i, 50.0 + (i % 7) - 3)) :+
      (41, 250.0)).toDF("t", "v")
    val (g, pDirty, worst) = TimeSeriesOps.grubbs(dirty, "v")
    worst shouldBe 250.0
    pDirty should be < 0.001
    g should be > 5.0
  }

  test("runs test: alternating series too many runs, blocked too few") {
    val alternating = (0 until 100).map(i =>
      (i, if (i % 2 == 0) 1.0 else 9.0)).toDF("t", "v")
    val (_, zAlt, pAlt) = TimeSeriesOps.runsTest(alternating, "v", "t")
    zAlt should be > 5.0 // far more runs than random
    pAlt should be < 1e-6
    val blocked = (0 until 100).map(i =>
      (i, if (i < 50) 1.0 else 9.0)).toDF("t", "v")
    val (runs, zBlk, pBlk) = TimeSeriesOps.runsTest(blocked, "v", "t")
    runs shouldBe 2L
    zBlk should be < -5.0
    pBlk should be < 1e-6
  }

  test("variance ratio: ~1 for a random walk, small for mean reversion") {
    val rng = new scala.util.Random(17)
    var acc = 0.0
    val walk = (0 until 400).map { i =>
      acc += rng.nextDouble() - 0.5; (i, acc)
    }.toDF("t", "v")
    val (vrW, _, pW) = TimeSeriesOps.varianceRatio(walk, "v", "t", 4)
    vrW shouldBe 1.0 +- 0.35
    pW should be > 0.01
    // strongly mean-reverting: q-period variance collapses
    val rev = (0 until 400).map(i =>
      (i, if (i % 2 == 0) 1.0 else -1.0 + 0.001 * (i % 5))).toDF("t", "v")
    val (vrR, zR, _) = TimeSeriesOps.varianceRatio(rev, "v", "t", 4)
    vrR should be < 0.5
    zR should be < -2.0
  }

  test("decompose/detrend/upsample run per key with partitioned windows") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val period = 4
    val season = Seq(2.0, -1.0, -3.0, 2.0)
    val df = (for (k <- Seq("a", "b"); t <- 0 until 24) yield
      (k, t, (if (k == "a") 10 else 100) + 0.5 * t + season(t % period) *
        (if (k == "a") 1 else 2))).toDF("k", "t", "v")
    val dec = TimeSeriesOps.decomposeAdditive(df, "t", "v", period,
      keyCols = Seq("k"))
    dec.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      .foreach(_.partitionSpec should not be empty)
    // seasonal amplitude differs per key → per-key seasonal estimates
    val sA = dec.filter($"k" === "a" && $"trend".isNotNull)
      .agg(max(abs($"seasonal"))).head().getDouble(0)
    val sB = dec.filter($"k" === "b" && $"trend".isNotNull)
      .agg(max(abs($"seasonal"))).head().getDouble(0)
    (sB / sA) shouldBe 2.0 +- 0.2

    val det = TimeSeriesOps.detrendLinear(df, "v", "t", keyCols = Seq("k"))
    det.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      .foreach(_.partitionSpec should not be empty)
    // per-key residuals are the pure seasonal pattern: mean ~ 0 per key
    det.groupBy("k").agg(abs(avg($"v_detrended")).as("m"))
      .select("m").as[Double].collect().foreach(_ should be < 0.3)

    val cal = (0 until 48).map(t => t.toLong).toDF("ts")
    val sparse = Seq(("a", 0L, 1.0), ("a", 10L, 2.0), ("b", 0L, 9.0))
      .toDF("k", "ts", "x")
    val up = TimeSeriesOps.upsample(sparse, "ts", "x", cal,
      keyCols = Seq("k"))
    up.count() shouldBe 96
    up.filter($"k" === "a" && $"ts" === 5).head().getAs[Double]("x") shouldBe 1.0
    up.filter($"k" === "b" && $"ts" === 40).head().getAs[Double]("x") shouldBe 9.0
  }

  test("friedman recovers the hand-computed statistic, no ties") {
    // blocks 1-3 rank A<B<C; block 4 reverses: R_A=6 R_B=8 R_C=10
    // Q = 12/(4*3*4)*(36+64+100) - 3*4*4 = 50 - 48 = 2, df = 2,
    // p = exp(-1)
    val df = Seq(
      (1, "A", 10.0), (1, "B", 20.0), (1, "C", 30.0),
      (2, "A", 15.0), (2, "B", 25.0), (2, "C", 35.0),
      (3, "A", 12.0), (3, "B", 22.0), (3, "C", 32.0),
      (4, "A", 30.0), (4, "B", 20.0), (4, "C", 10.0))
      .toDF("blk", "treat", "v")
    val out = StatsOps.friedman(df, "blk", "treat", "v").head()
    out.getAs[Double]("chi2_stat") shouldBe 2.0 +- 1e-9
    out.getAs[Long]("dof") shouldBe 2L
    out.getAs[Double]("p_value") shouldBe math.exp(-1.0) +- 1e-5
  }

  test("friedman applies the tie correction") {
    // block 1 ties A=B at rank 1.5: R_A=6.5 R_B=7.5 R_C=10
    // Q = 12/48*198.5 - 48 = 1.625; C = 1 - 6/96 = 0.9375
    val df = Seq(
      (1, "A", 10.0), (1, "B", 10.0), (1, "C", 30.0),
      (2, "A", 15.0), (2, "B", 25.0), (2, "C", 35.0),
      (3, "A", 12.0), (3, "B", 22.0), (3, "C", 32.0),
      (4, "A", 30.0), (4, "B", 20.0), (4, "C", 10.0))
      .toDF("blk", "treat", "v")
    val out = StatsOps.friedman(df, "blk", "treat", "v").head()
    // output rounds at 6 dp
    out.getAs[Double]("chi2_stat") shouldBe (1.625 / 0.9375) +- 1e-6
  }

  test("page trend detects a monotone treatment ordering") {
    // three blocks, perfectly increasing A<B<C with order A=1,B=2,C=3:
    // L = 1*3 + 2*6 + 3*9 = 42, mean = 36, sd = sqrt(6)
    val df = (1 to 3).flatMap(b => Seq(
      (b, "A", b * 10.0), (b, "B", b * 10.0 + 1), (b, "C", b * 10.0 + 2)))
      .toDF("blk", "treat", "v")
    val out = StatsOps.pageTrend(df, "blk", "treat", "v",
      when($"treat" === "A", 1).when($"treat" === "B", 2).otherwise(3))
      .head()
    out.getAs[Double]("l_stat") shouldBe 42.0 +- 1e-9
    out.getAs[Double]("z") shouldBe (6.0 / math.sqrt(6.0)) +- 1e-6
    out.getAs[Double]("p_value") should be < 0.01
  }

  test("spearmanCorr: monotone = 1, inverse = -1, ties hand case") {
    val mono = (1 to 20).map(i => (i.toDouble, i * i.toDouble))
      .toDF("x", "y")
    StatsOps.spearmanCorr(mono, "x", "y").head()
      .getAs[Double]("rho_s") shouldBe 1.0 +- 1e-9
    val inv = (1 to 20).map(i => (i.toDouble, -i * i.toDouble))
      .toDF("x", "y")
    StatsOps.spearmanCorr(inv, "x", "y").head()
      .getAs[Double]("rho_s") shouldBe -1.0 +- 1e-9
    // closed form: x=(1,2,3,4,5), y=(2,1,4,3,5) -> Σd²=4,
    // rho = 1 - 6*4/(5*24) = 0.8
    val hand = Seq((1.0, 2.0), (2.0, 1.0), (3.0, 4.0), (4.0, 3.0),
      (5.0, 5.0)).toDF("x", "y")
    StatsOps.spearmanCorr(hand, "x", "y").head()
      .getAs[Double]("rho_s") shouldBe 0.8 +- 1e-9
    // spearmanP: strong monotone on n=20 is significant
    StatsOps.spearmanP(1.0 - 1e-12, 20) should be < 1e-6
  }

  test("kendallTauB hand cases with and without ties") {
    // x=1..4, y=(1,3,2,4): C=5, D=1, no ties -> tau = 4/6
    val noTies = Seq((1, 1), (2, 3), (3, 2), (4, 4)).toDF("x", "y")
    val r1 = StatsOps.kendallTauB(noTies, "x", "y").head()
    r1.getAs[Long]("cc") shouldBe 5L
    r1.getAs[Long]("dd") shouldBe 1L
    r1.getAs[Double]("tau_b") shouldBe (4.0 / 6.0) +- 1e-6
    // x=(1,1,2,3), y=(1,2,2,3): C=4, D=0, n1=n2=1 -> tau_b = 0.8
    val ties = Seq((1, 1), (1, 2), (2, 2), (3, 3)).toDF("x", "y")
    val r2 = StatsOps.kendallTauB(ties, "x", "y").head()
    r2.getAs[Long]("cc") shouldBe 4L
    r2.getAs[Long]("dd") shouldBe 0L
    r2.getAs[Double]("tau_b") shouldBe 0.8 +- 1e-9
    // perfect inverse order -> -1
    val rev = (1 to 10).map(i => (i, -i)).toDF("x", "y")
    StatsOps.kendallTauB(rev, "x", "y").head()
      .getAs[Double]("tau_b") shouldBe -1.0 +- 1e-9
  }

  test("ccf peaks at the planted shift; lag-0 self-ccf is 1") {
    // pseudo-random-ish x; y is x delayed by 2 -> ccf max at lag +2
    val xs = (0 until 120).map(i => ((i * 37 + 11) % 101).toLong)
    val rows = (2 until 120).map(i => (i.toLong, xs(i), xs(i - 2)))
      .toDF("ord", "x", "y")
    val out = TimeSeriesOps.ccf(rows, "x", "y", "ord", maxLag = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val best = out.maxBy(_._2)
    best._1 shouldBe 2L
    best._2 should be > 0.9
    // self-correlation at lag 0 is exactly 1
    val self = rows.select($"ord", $"x", $"x".as("y2"))
    TimeSeriesOps.ccf(self, "x", "y2", "ord", maxLag = 1)
      .filter($"lag" === 0).head().getDouble(1) shouldBe 1.0 +- 1e-6
  }

  test("grangerF detects a lagged driver and not an unrelated one") {
    val xs = (0 until 200).map(i => ((i * 53 + 7) % 97).toLong)
    // y is driven by x lagged once (plus small deterministic noise)
    val driven = (1 until 200).map(i =>
      (i.toLong, xs(i), 3 * xs(i - 1) + (i % 2)))
      .toDF("ord", "x", "y")
    val r1 = TimeSeriesOps.grangerF(driven, "x", "y", "ord").head()
    r1.getAs[Double]("f_stat") should be > 100.0
    r1.getAs[Double]("p_value") should be < 1e-6
    r1.getAs[Long]("df1") shouldBe 1L
    // y unrelated to x: weak statistic
    val unrel = (1 until 200).map(i =>
      (i.toLong, xs(i), ((i * 89 + 3) % 83).toLong))
      .toDF("ord", "x", "y")
    TimeSeriesOps.grangerF(unrel, "x", "y", "ord").head()
      .getAs[Double]("f_stat") should be < 5.0
  }

  test("dunnTest separates shifted groups and adjusts p-values") {
    // a << b << c with no overlap: every pairwise comparison extreme
    val df = ((1 to 30).map(i => ("a", i.toLong)) ++
      (1 to 30).map(i => ("b", i.toLong + 100)) ++
      (1 to 30).map(i => ("c", i.toLong + 200))).toDF("g", "v")
    val out = StatsOps.dunnTest(df, "v", "g").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    out.keySet shouldBe Set(("a", "b"), ("a", "c"), ("b", "c"))
    out(("a", "c")).getAs[Double]("z") should be < out(("a", "b"))
      .getAs[Double]("z") // more negative = larger rank gap
    out.values.foreach { r =>
      r.getAs[Double]("p_value") should be < 0.01
      r.getAs[Double]("p_adj") should be >=
        r.getAs[Double]("p_value") - 1e-9
    }
    // identical groups: z = 0, p = 1
    val same = (1 to 20).flatMap(i =>
      Seq(("a", i.toLong), ("b", i.toLong))).toDF("g", "v")
    val r0 = StatsOps.dunnTest(same, "v", "g").head()
    r0.getAs[Double]("z") shouldBe 0.0 +- 1e-9
    r0.getAs[Double]("p_value") shouldBe 1.0 +- 1e-6
  }

  test("chowTest flags a slope break and stays null without one") {
    // segment 1: y ~ 2x; segment 2: y ~ 10x (deterministic noise so
    // the within-segment residual variance is nonzero)
    val break_ = ((1 to 40).map(i => (i.toLong, 2L * i + (i % 3), 0)) ++
      (1 to 40).map(i => (i.toLong, 10L * i + (i % 5), 1)))
      .toDF("x", "y", "seg")
    val r1 = StatsOps.chowTest(break_, "x", "y", $"seg" === 0).head()
    r1.getAs[Double]("f_stat") should be > 50.0
    r1.getAs[Double]("p_value") should be < 0.001
    r1.getAs[Long]("df1") shouldBe 2L
    r1.getAs[Long]("df2") shouldBe 76L
    // one (noisy) line throughout: no break signal
    val line = (1 to 80).map(i => (i.toLong, 3L * i + (i % 3), i % 2))
      .toDF("x", "y", "seg")
    val r2 = StatsOps.chowTest(line, "x", "y", $"seg" === 0).head()
    r2.getAs[Double]("f_stat") should be < 3.0
    // perfect fits on both segments -> undefined (null), no 0-division
    val perfect = (1 to 40).map(i => (i.toLong, 3L * i, i % 2))
      .toDF("x", "y", "seg")
    val r3 = StatsOps.chowTest(perfect, "x", "y", $"seg" === 0).head()
    r3.isNullAt(r3.fieldIndex("f_stat")) shouldBe true
  }

  test("cusumChangepoint locates a planted level shift") {
    // 10,10,...(x10) then 20,20,...(x10): mean 15, S_i = -5i down to
    // -50 at the shift point, then back up; sigma_pop = 5
    val df = ((0 until 10).map(i => (i.toLong, 10L)) ++
      (10 until 20).map(i => (i.toLong, 20L))).toDF("ord", "v")
    val out = TimeSeriesOps.cusumChangepoint(df, "v", "ord").head()
    out.getAs[Double]("max_abs_s") shouldBe 50.0 +- 1e-9
    out.getAs[Long]("t_at_max") shouldBe 9L
    out.getAs[Double]("cusum_stat") shouldBe
      (50.0 / (5.0 * math.sqrt(20.0))) +- 1e-6
    // flat series -> zero statistic
    val flat = (0 until 10).map(i => (i.toLong, 7L)).toDF("ord", "v")
    val f = TimeSeriesOps.cusumChangepoint(flat, "v", "ord").head()
    f.getAs[Double]("max_abs_s") shouldBe 0.0 +- 1e-9
    f.isNullAt(f.fieldIndex("cusum_stat")) shouldBe true
    // per-key independence
    val two = ((0 until 10).map(i => ("a", i.toLong, 10L)) ++
      (0 until 10).map(i => ("a", (i + 10).toLong, 20L)) ++
      (0 until 10).map(i => ("b", i.toLong, 3L))).toDF("k", "ord", "v")
    val byKey = TimeSeriesOps.cusumChangepoint(two, "v", "ord",
      Seq("k")).collect().map(r => r.getString(0) -> r).toMap
    byKey("a").getAs[Double]("max_abs_s") shouldBe 50.0 +- 1e-9
    byKey("b").getAs[Double]("max_abs_s") shouldBe 0.0 +- 1e-9
  }

  test("kaplanMeier steps match hand computation, censoring included") {
    // all events at t=1,2,3: S = 2/3, 1/3, 0
    val all = Seq((1L, 1), (2L, 1), (3L, 1)).toDF("dur", "ev")
    val s1 = StatsOps.kaplanMeier(all, "dur", "ev").orderBy("dur")
      .select("n_risk", "survival").collect()
    s1.map(_.getLong(0)).toSeq shouldBe Seq(3L, 2L, 1L)
    s1(0).getDouble(1) shouldBe (2.0 / 3) +- 1e-6
    s1(1).getDouble(1) shouldBe (1.0 / 3) +- 1e-6
    s1(2).getDouble(1) shouldBe 0.0 +- 1e-9
    // censored at 1, event at 2: S(1)=1 (no event), S(2)=0
    val cen = Seq((1L, 0), (2L, 1)).toDF("dur", "ev")
    val s2 = StatsOps.kaplanMeier(cen, "dur", "ev").orderBy("dur")
      .select("d", "c", "survival").collect()
    s2(0).getLong(0) shouldBe 0L
    s2(0).getLong(1) shouldBe 1L
    s2(0).getDouble(2) shouldBe 1.0 +- 1e-9
    s2(1).getDouble(2) shouldBe 0.0 +- 1e-9
  }

  test("logRank: identical cohorts null, separated cohorts reject") {
    val same = (1 to 30).flatMap(i =>
      Seq(("a", i.toLong, 1), ("b", i.toLong, 1)))
      .toDF("g", "dur", "ev")
    val r0 = StatsOps.logRank(same, "dur", "ev", "g", "a", "b").head()
    r0.getAs[Double]("chi2_stat") shouldBe 0.0 +- 1e-6
    r0.getAs[Double]("p_value") shouldBe 1.0 +- 1e-4
    // group a all fails early, group b much later -> strong signal
    val sep = ((1 to 20).map(i => ("a", i.toLong, 1)) ++
      (1 to 20).map(i => ("b", i.toLong + 100, 1)))
      .toDF("g", "dur", "ev")
    val r1 = StatsOps.logRank(sep, "dur", "ev", "g", "a", "b").head()
    r1.getAs[Double]("chi2_stat") should be > 10.0
    r1.getAs[Double]("p_value") should be < 0.01
  }

  test("theilIndex: equality 0, concentration ln(n), hhi bounds") {
    val eq = Seq.fill(40)(5L).toDF("v")
    StatsOps.theilIndex(eq, "v").head()
      .getAs[Double]("theil_t") shouldBe 0.0 +- 1e-9
    // one holder owns everything except epsilon crumbs: T -> ln(n)
    val conc = (Seq.fill(9)(1L) :+ 1000000L).toDF("v")
    val t = StatsOps.theilIndex(conc, "v").head()
      .getAs[Double]("theil_t")
    t should be > 0.95 * math.log(10.0)
    t should be <= math.log(10.0) + 1e-6
    // HHI: uniform k=4 -> 0.25; monopoly -> 1
    val uni = (0 until 40).map(i => ("g" + (i % 4))).toDF("g")
    StatsOps.herfindahl(uni, "g").head()
      .getAs[Double]("hhi") shouldBe 0.25 +- 1e-9
    val mono = Seq.fill(17)("only").toDF("g")
    val m = StatsOps.herfindahl(mono, "g").head()
    m.getAs[Long]("k") shouldBe 1L
    m.getAs[Double]("hhi") shouldBe 1.0 +- 1e-9
  }

  test("flesch readability from hand-counted text") {
    import graft.functions.TextFunctions
    // 6 words, 2 sentences, 6 vowel-group syllables:
    // 206.835 - 1.015*3 - 84.6*1 = 119.19
    val df = Seq("The dog runs. The cat sleeps!").toDF("t")
    val r = df.select(
      TextFunctions.tokenCount($"t").as("w"),
      TextFunctions.sentenceCount($"t").as("s"),
      TextFunctions.syllableCount($"t").as("y"),
      TextFunctions.fleschReadingEase($"t").as("f")).head()
    r.getAs[Int]("w") shouldBe 6
    r.getAs[Int]("s") shouldBe 2
    r.getAs[Int]("y") shouldBe 6
    r.getAs[Double]("f") shouldBe 119.19 +- 1e-9
    // fragment floors at one sentence; empty text -> null score
    val frag = Seq("no terminal punctuation here").toDF("t")
    frag.select(TextFunctions.sentenceCount($"t")).head()
      .getInt(0) shouldBe 1
    val empty = Seq("   ").toDF("t")
    empty.select(TextFunctions.fleschReadingEase($"t")).head()
      .isNullAt(0) shouldBe true
  }

  test("corrMatrixSpearman agrees with pairwise spearmanCorr") {
    val df = (1 to 80).map { i =>
      (i.toLong, (i * i % 37).toLong, (80 - i + (i % 5)).toLong)
    }.toDF("a", "b", "c")
    val m = StatsOps.corrMatrixSpearman(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(2)).toMap
    for (Seq(x, y) <- Seq("a", "b", "c").combinations(2)) {
      val pw = StatsOps.spearmanCorr(df, x, y).head()
        .getAs[Double]("rho_s")
      m((x, y)) shouldBe pw +- 1e-6
    }
    // monotone pair pins the sign convention
    m(("a", "c")) should be < 0.0
  }

  test("jonckheereTerpstra: perfect ordering, reversal, tie halves") {
    // A=(1,2) < B=(3,4) < C=(5,6): every cross pair concordant,
    // J = 3 pairs * 4 = 12; E = 6, V = (36*15 - 84)/72
    val df = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L),
      ("C", 5L), ("C", 6L)).toDF("g", "v")
    val up = StatsOps.jonckheereTerpstra(df, "v", "g",
      Seq("A", "B", "C")).head()
    up.getAs[Double]("j_stat") shouldBe 12.0 +- 1e-9
    up.getAs[Double]("z") shouldBe
      (6.0 / math.sqrt((36 * 15 - 84) / 72.0)) +- 1e-6
    // reversed hypothesis -> J = 0, z symmetric negative
    val down = StatsOps.jonckheereTerpstra(df, "v", "g",
      Seq("C", "B", "A")).head()
    down.getAs[Double]("j_stat") shouldBe 0.0 +- 1e-9
    down.getAs[Double]("z") shouldBe -up.getAs[Double]("z") +- 1e-6
    // ties count half: A=(1,1), B=(1,2) -> U = 0.5+1+0.5+1 = 3
    val tied = Seq(("A", 1L), ("A", 1L), ("B", 1L), ("B", 2L))
      .toDF("g", "v")
    StatsOps.jonckheereTerpstra(tied, "v", "g", Seq("A", "B"))
      .head().getAs[Double]("j_stat") shouldBe 3.0 +- 1e-9
  }

  test("psi: zero for identical cohorts, positive under shift") {
    val same = (1 to 100).flatMap(i =>
      Seq(("a", i.toLong * 100), ("b", i.toLong * 100)))
      .toDF("g", "v")
    val br = Seq(2000.0, 5000.0, 8000.0)
    val out0 = StatsOps.psi(same, "v", "g", "a", "b", br)
    out0.select("psi").head().getDouble(0) shouldBe 0.0 +- 1e-9
    // cohort b shifted up two bins -> clear drift signal
    val shifted = ((1 to 100).map(i => ("a", i.toLong * 100)) ++
      (1 to 100).map(i => ("b", i.toLong * 100 + 5000)))
      .toDF("g", "v")
    val psi = StatsOps.psi(shifted, "v", "g", "a", "b", br)
      .select("psi").head().getDouble(0)
    psi should be > 0.25
    // empty bins stay finite via the eps clamp
    psi.isNaN shouldBe false; psi.isInfinite shouldBe false
  }

  test("gini: equality 0, max concentration (n-1)/n, hand case") {
    val eq = Seq.fill(50)(7L).toDF("v")
    StatsOps.gini(eq, "v").head().getAs[Double]("gini") shouldBe
      0.0 +- 1e-9
    val conc = (Seq.fill(9)(0L) :+ 100L).toDF("v")
    StatsOps.gini(conc, "v").head().getAs[Double]("gini") shouldBe
      0.9 +- 1e-9
    // x = (1,2,3,4): G = 2*30/(4*10) - 5/4 = 0.25
    StatsOps.gini(Seq(1L, 2L, 3L, 4L).toDF("v"), "v").head()
      .getAs[Double]("gini") shouldBe 0.25 +- 1e-9
    // ties handled: (1,1,3,3) -> S = 1*(1+2) + 3*(3+4)... positional
    // sum with average positions = 1*1+1*2+3*3+3*4 = 24,
    // G = 48/(4*8) - 5/4 = 0.25
    StatsOps.gini(Seq(1L, 1L, 3L, 3L).toDF("v"), "v").head()
      .getAs[Double]("gini") shouldBe 0.25 +- 1e-9
  }

  test("mantelHaenszel: one stratum = plain OR, pooling is stable") {
    val pairs = Seq.fill(8)((1, 1)) ++ Seq.fill(2)((1, 0)) ++
      Seq.fill(1)((0, 1)) ++ Seq.fill(5)((0, 0))
    val one = pairs.map { case (x, y) => (0L, x, y) }
      .toDF("st", "x", "y")
    val r1 = StatsOps.mantelHaenszel(one, "st", "x", "y").head()
    // ad/bc = 8*5/(2*1) = 20 — matches the unstratified odds ratio
    r1.getAs[Double]("or_mh") shouldBe 20.0 +- 1e-6
    // duplicating the same table into two strata leaves OR_MH fixed
    val two = (pairs.map { case (x, y) => (0L, x, y) } ++
      pairs.map { case (x, y) => (1L, x, y) }).toDF("st", "x", "y")
    StatsOps.mantelHaenszel(two, "st", "x", "y").head()
      .getAs[Double]("or_mh") shouldBe 20.0 +- 1e-6
    // chi2 grows with the doubled evidence
    val c1 = r1.getAs[Double]("chi2_mh")
    StatsOps.mantelHaenszel(two, "st", "x", "y").head()
      .getAs[Double]("chi2_mh") should be > c1
  }

  test("cuped recovers theta and reduces variance, mean preserved") {
    // y = 2x + deterministic noise
    val df = (0 until 200).map { i =>
      val x = (i % 20).toLong
      (i.toLong, x, 2 * x + (i % 3).toLong)
    }.toDF("id", "x", "y")
    val out = StatsOps.cuped(df, "y", "x").cache()
    val stats = out.agg(avg($"y").as("my"), avg($"y_cuped").as("ma"),
      var_samp($"y".cast("double")).as("vy"),
      var_samp($"y_cuped").as("va")).head()
    stats.getAs[Double]("ma") shouldBe
      stats.getAs[Double]("my") +- 1e-9
    stats.getAs[Double]("va") should be < stats.getAs[Double]("vy") / 10
    // adjusted metric is y minus ~2*(x - xbar)
    val row = out.filter($"id" === 0).head()
    row.getAs[Double]("y_cuped") shouldBe
      (row.getAs[Long]("y") - 2.0 * (row.getAs[Long]("x") - 9.5)) +- 0.1
  }

  test("partialCorr closed form: perfect xy survives, z=x nulls out") {
    // y = 2x -> r_xy = 1 and r_xz = r_yz, so r_xy.z = 1 for any
    // non-degenerate z
    val df = Seq((1L, 2L, 1L), (2L, 4L, 1L), (3L, 6L, 2L),
      (4L, 8L, 3L)).toDF("x", "y", "z")
    val out = StatsOps.partialCorr(df, "x", "y", "z").head()
    out.getAs[Double]("r_xy") shouldBe 1.0 +- 1e-6
    out.getAs[Double]("r_xy_z") shouldBe 1.0 +- 1e-6
    // controlling for z = x exactly -> denominator 0 -> null
    val degen = Seq((1L, 2L, 1L), (2L, 4L, 2L), (3L, 7L, 3L))
      .toDF("x", "y", "z")
    val r = StatsOps.partialCorr(degen, "x", "y", "z").head()
    r.isNullAt(r.fieldIndex("r_xy_z")) shouldBe true
    // x,y both driven by z: partial correlation collapses toward 0
    val driven = (0 until 60).map { i =>
      val z = i % 10
      (z.toLong * 10 + (i % 3), z.toLong * 10 + ((i + 1) % 3),
        z.toLong)
    }.toDF("x", "y", "z")
    val d = StatsOps.partialCorr(driven, "x", "y", "z").head()
    d.getAs[Double]("r_xy") should be > 0.9
    // the deterministic i%3 noise leaves exactly 0.5 residual here;
    // the point is the collapse from ~0.99 once z is controlled
    math.abs(d.getAs[Double]("r_xy_z")) should be <= 0.5
  }

  test("winsorize clips at exact interpolated percentiles") {
    val df = (1 to 100).map(_.toLong).toDF("v")
    val out = StatsOps.winsorize(df, "v").orderBy("v")
      .select("v", "v_wins").collect()
    // q05 = 1 + 0.05*99 = 5.95, q95 = 1 + 0.95*99 = 95.05
    out.filter(_.getLong(0) <= 5).foreach(
      _.getDouble(1) shouldBe 5.95 +- 1e-9)
    out.filter(_.getLong(0) >= 96).foreach(
      _.getDouble(1) shouldBe 95.05 +- 1e-9)
    out.filter(r => r.getLong(0) > 5 && r.getLong(0) < 96).foreach(r =>
      r.getDouble(1) shouldBe r.getLong(0).toDouble +- 1e-9)
  }

  test("benjaminiHochberg enforces suffix-min monotonicity") {
    // raw n*p/i = (0.03, 0.0165, 0.2): rank-1 absorbs rank-2's
    // smaller value
    val df = Seq((1L, 0.01), (2L, 0.011), (3L, 0.2)).toDF("id", "p")
    val out = StatsOps.benjaminiHochberg(df, "p")
      .orderBy("id").select("p_adj").collect().map(_.getDouble(0))
    out(0) shouldBe 0.0165 +- 1e-12
    out(1) shouldBe 0.0165 +- 1e-12
    out(2) shouldBe 0.2 +- 1e-12
    // classic 4-test case + cap at 1
    val df2 = Seq(0.005, 0.01, 0.03, 0.9).zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("id", "p")
    val out2 = StatsOps.benjaminiHochberg(df2, "p")
      .orderBy("id").select("p_adj").collect().map(_.getDouble(0))
    out2(0) shouldBe 0.02 +- 1e-12
    out2(1) shouldBe 0.02 +- 1e-12
    out2(2) shouldBe 0.04 +- 1e-12
    out2(3) shouldBe 0.9 +- 1e-12
    // ties get identical adjusted values
    val tied = Seq(0.05, 0.05, 0.5).zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("id", "p")
    StatsOps.benjaminiHochberg(tied, "p")
      .filter($"p" === 0.05).select("p_adj").collect()
      .map(_.getDouble(0)).distinct.length shouldBe 1
  }

  test("oddsRatio Wald CI and empty-cell null") {
    val pairs = Seq.fill(8)((1, 1)) ++ Seq.fill(2)((1, 0)) ++
      Seq.fill(1)((0, 1)) ++ Seq.fill(5)((0, 0))
    val out = StatsOps.oddsRatio(pairs.toDF("x", "y"), "x", "y").head()
    out.getAs[Double]("odds_ratio") shouldBe 20.0 +- 1e-6
    val se = math.sqrt(1.0 / 8 + 1.0 / 2 + 1.0 / 1 + 1.0 / 5)
    out.getAs[Double]("ci_lo") shouldBe
      math.exp(math.log(20.0) - 1.959963984540054 * se) +- 1e-5
    out.getAs[Double]("ci_hi") shouldBe
      math.exp(math.log(20.0) + 1.959963984540054 * se) +- 1e-4
    val degenerate = Seq((1, 1), (0, 0)).toDF("x", "y")
    val r = StatsOps.oddsRatio(degenerate, "x", "y").head()
    r.isNullAt(r.fieldIndex("odds_ratio")) shouldBe true
    r.isNullAt(r.fieldIndex("ci_lo")) shouldBe true
  }

  test("mcnemar: discordant-pair chi2, degenerate null") {
    // b=6 (1,0), c=2 (0,1): chi2 = 16/8 = 2
    val pairs = Seq.fill(6)((1, 0)) ++ Seq.fill(2)((0, 1)) ++
      Seq.fill(5)((1, 1)) ++ Seq.fill(3)((0, 0))
    val out = StatsOps.mcnemar(pairs.toDF("x", "y"), "x", "y").head()
    out.getAs[Long]("b") shouldBe 6L
    out.getAs[Long]("c") shouldBe 2L
    out.getAs[Double]("chi2_stat") shouldBe 2.0 +- 1e-9
    // p = 2(1 - Phi(sqrt(2))) ~ 0.1573
    out.getAs[Double]("p_value") shouldBe 0.157299 +- 1e-4
    // all concordant -> null statistic, not 0/0
    val conc = Seq((1, 1), (0, 0)).toDF("x", "y")
    val r = StatsOps.mcnemar(conc, "x", "y").head()
    r.isNullAt(r.fieldIndex("chi2_stat")) shouldBe true
  }

  test("cochranQ recovers the textbook statistic") {
    // Conover-style: 4 blocks x 3 treatments
    // rows (1,1,0),(1,0,0),(1,1,1),(0,1,0):
    // Cj = (3,3,1), N = 7, sumCj2 = 19, Ri = (2,1,3,1), sumRi2 = 15
    // Q = 2*(3*19 - 49)/(3*7 - 15) = 16/6
    val df = Seq(
      (1, "t1", 1), (1, "t2", 1), (1, "t3", 0),
      (2, "t1", 1), (2, "t2", 0), (2, "t3", 0),
      (3, "t1", 1), (3, "t2", 1), (3, "t3", 1),
      (4, "t1", 0), (4, "t2", 1), (4, "t3", 0))
      .toDF("blk", "treat", "x")
    val out = StatsOps.cochranQ(df, "blk", "treat", "x").head()
    out.getAs[Double]("q_stat") shouldBe (16.0 / 6.0) +- 1e-6
    out.getAs[Long]("dof") shouldBe 2L
    out.getAs[Double]("p_value") shouldBe
      math.exp(-16.0 / 12.0) +- 1e-4
  }

  test("fisherExact matches scipy two-sided p-values") {
    // scipy.stats.fisher_exact([[1,9],[11,3]]) -> p = 0.002759...
    def table(a: Int, b: Int, c: Int, d: Int) =
      (Seq.fill(a)((1, 1)) ++ Seq.fill(b)((1, 0)) ++
        Seq.fill(c)((0, 1)) ++ Seq.fill(d)((0, 0))).toDF("x", "y")
    val p1 = StatsOps.fisherExact(table(1, 9, 11, 3), "x", "y").head()
    p1.getAs[Long]("a") shouldBe 1L
    p1.getAs[Double]("p_value") shouldBe 0.002759 +- 1e-5
    // scipy.stats.fisher_exact([[8,2],[1,5]]) -> p = 0.034965...
    StatsOps.fisherExact(table(8, 2, 1, 5), "x", "y").head()
      .getAs[Double]("p_value") shouldBe 0.034965 +- 1e-5
    // independent-ish table -> p = 1
    StatsOps.fisherExact(table(5, 5, 5, 5), "x", "y").head()
      .getAs[Double]("p_value") shouldBe 1.0 +- 1e-9
  }

  test("benford per-digit shares, chi2 and absent-digit handling") {
    // uniform single occurrence of each digit 1..9 (multi-digit
    // values exercise the first-char extraction)
    val uni = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L).map(_ * 111)
      .toDF("v")
    val outU = StatsOps.benford(uni, "v").collect()
    outU.length shouldBe 9
    val expChi = (1 to 9).map { d =>
      val e = math.log10(1.0 + 1.0 / d)
      9.0 * (1.0 / 9 - e) * (1.0 / 9 - e) / e
    }.sum
    outU.head.getAs[Double]("chi2_stat") shouldBe expChi +- 1e-4
    // all values share digit 1 -> other digits appear with n=0 and
    // still contribute to chi2/MAD
    val ones = (10L to 19L).toDF("v")
    val outO = StatsOps.benford(ones, "v").collect()
    outO.length shouldBe 9
    outO.filter(_.getAs[Int]("digit") == 1).head.getAs[Long]("n") shouldBe 10L
    outO.filter(_.getAs[Int]("digit") == 2).head.getAs[Long]("n") shouldBe 0L
    val p1 = math.log10(2.0)
    val expChiOnes = 10.0 * ((1.0 - p1) * (1.0 - p1) / p1 +
      (2 to 9).map(d => math.log10(1.0 + 1.0 / d)).sum)
    outO.head.getAs[Double]("chi2_stat") shouldBe expChiOnes +- 1e-4
  }

  test("groupedLinearRegression recovers per-group exact lines") {
    import spark.implicits._
    // group a: y = 3x + 2 exactly; group b: constant x (degenerate)
    val rows = (1 to 10).map(x => ("a", x.toLong, 3L * x + 2)) ++
      Seq(("b", 5L, 1L), ("b", 5L, 9L))
    val out = graft.stats.StatsOps.groupedLinearRegression(
        rows.toDF("g", "x", "y"), "x", "y", Seq("g"))
      .collect().map(r => r.getString(0) -> r).toMap
    out("a").getAs[Double]("slope") shouldBe 3.0
    out("a").getAs[Double]("intercept") shouldBe 2.0
    out("a").getAs[Double]("r2") shouldBe 1.0
    out("a").getAs[Long]("n") shouldBe 10L
    out("b").isNullAt(out("b").fieldIndex("slope")) shouldBe true
    out("b").isNullAt(out("b").fieldIndex("r2")) shouldBe true
  }

  test("sarima recovers a planted seasonal AR(1)(1)_12 process") {
    // w_t = 1 + 0.5 w_{t-1} + 0.3 w_{t-12} + e_t, deterministic noise
    val rng = new scala.util.Random(13)
    val buf = scala.collection.mutable.ArrayBuffer.fill(12)(5.0)
    (12 until 600).foreach { t =>
      buf += 1.0 + 0.5 * buf(t - 1) + 0.3 * buf(t - 12) +
        (rng.nextDouble() - 0.5)
    }
    val m = TimeSeriesOps.sarimaFit(buf.toSeq, p = 1, d = 0, q = 0,
      sp = 1, sd = 0, sq = 0, period = 12)
    m.ar(0) shouldBe 0.5 +- 0.08
    m.sar(0) shouldBe 0.3 +- 0.08
    // long-run forecast approaches the process mean 1/(1-0.5-0.3)=5
    val fc = TimeSeriesOps.sarimaForecast(m, 120)
    fc.last shouldBe 5.0 +- 0.6
  }

  test("groupedSarimaForecast: per-key distributed fit matches the " +
      "driver-side fit per series and recovers planted processes") {
    import spark.implicits._
    // two keys with DIFFERENT planted seasonal AR processes
    def mk(key: Long, c: Double, phi: Double, sphi: Double,
        seed: Int): Seq[(Long, Long, Double)] = {
      val rng = new scala.util.Random(seed)
      val buf = scala.collection.mutable.ArrayBuffer
        .fill(12)(5.0 + rng.nextDouble())
      (12 until 200).foreach { t =>
        buf += c + phi * buf(t - 1) + sphi * buf(t - 12) +
          (rng.nextDouble() - 0.5) * 0.01
      }
      buf.toSeq.zipWithIndex.map { case (v, t) => (key, t.toLong, v) }
    }
    val s1 = mk(1L, 1.0, 0.5, 0.3, 7)
    val s2 = mk(2L, 2.0, 0.2, 0.6, 11)
    val df = (s1 ++ s2).toDF("k", "t", "v")
    val out = graft.timeseries.TimeSeriesOps.groupedSarimaForecast(
      df, "v", "t", "k", p = 1, d = 0, q = 0, sp = 1, sd = 0,
      sq = 0, period = 12, steps = 4)
      .orderBy("k", "h").collect()
    out.length shouldBe 8
    // bit-equal to the driver-side path on each key's own series —
    // the distributed operator runs the identical code per group
    for ((series, key) <- Seq((s1, "1"), (s2, "2"))) {
      val direct = graft.timeseries.TimeSeriesOps.sarimaForecast(
        series.map(_._3), 1, 0, 0, 1, 0, 0, 12, 4)
      val got = out.filter(_.getString(0) == key).map(_.getDouble(2))
      got.toSeq shouldBe direct
    }
    // tight noise -> fitted forecasts track each key's OWN process
    val f1 = out.filter(_.getString(0) == "1").map(_.getDouble(2))
    val t1 = {
      val h = s1.map(_._3).toBuffer
      (0 until 4).map { _ =>
        val f = 1.0 + 0.5 * h(h.size - 1) + 0.3 * h(h.size - 12)
        h += f; f
      }
    }
    f1.zip(t1).foreach { case (g, e) => g shouldBe e +- 0.05 }
  }

  test("groupedSarimaForecast accepts STRING keys (the q307 " +
      "per-key convention)") {
    import spark.implicits._
    val rows = (0 until 200).flatMap { t =>
      Seq(("click", t.toLong, math.sin(t / 6.0) * 5 + 10.0),
        ("view", t.toLong, math.cos(t / 9.0) * 3 + 20.0))
    }
    val out = graft.timeseries.TimeSeriesOps.groupedSarimaForecast(
      rows.toDF("k", "t", "v"), "v", "t", "k",
      p = 1, d = 0, q = 0, sp = 1, sd = 0, sq = 0, period = 12,
      steps = 3).collect()
    out.length shouldBe 6
    out.map(_.getString(0)).toSet shouldBe Set("click", "view")
  }

  test("groupedAutoArima selects per-key orders matching the " +
      "driver-side grid search and forecasts with the winner") {
    import spark.implicits._
    // key 1: strongly seasonal AR; key 2: plain AR(1), no
    // seasonality — selection must differ BETWEEN keys
    val rng1 = new scala.util.Random(3)
    val s1 = {
      val buf = scala.collection.mutable.ArrayBuffer
        .fill(12)(5.0 + rng1.nextDouble())
      (12 until 200).foreach(t => buf += 1.0 + 0.3 * buf(t - 1) +
        0.6 * buf(t - 12) + (rng1.nextDouble() - 0.5) * 0.2)
      buf.toSeq
    }
    val rng2 = new scala.util.Random(5)
    val s2 = {
      val buf = scala.collection.mutable.ArrayBuffer(10.0)
      (1 until 200).foreach(_ => buf += 2.0 + 0.8 * buf.last +
        (rng2.nextDouble() - 0.5) * 0.2)
      buf.toSeq
    }
    val df = (s1.zipWithIndex.map { case (v, t) => (1L, t.toLong, v) }
      ++ s2.zipWithIndex.map { case (v, t) => (2L, t.toLong, v) })
      .toDF("k", "t", "v")
    val out = graft.timeseries.TimeSeriesOps.groupedAutoArima(df,
      "v", "t", "k", maxP = 1, maxD = 0, maxQ = 0, period = 12,
      maxSp = 1, maxSd = 0, maxSq = 0, steps = 3)
      .orderBy("k", "h").collect()
    out.length shouldBe 6
    // per-key parity with the driver-side search
    for ((series, key) <- Seq((s1, "1"), (s2, "2"))) {
      val (best, _) = graft.timeseries.TimeSeriesOps.autoArima(
        series, maxP = 1, maxD = 0, maxQ = 0, period = 12,
        maxSp = 1, maxSd = 0, maxSq = 0)
      val m = best.get
      val rows = out.filter(_.getString(0) == key)
      rows.map(_.getLong(3)).toSet shouldBe Set(m.p.toLong)
      rows.map(_.getLong(6)).toSet shouldBe Set(m.sp.toLong)
      rows.map(_.getDouble(2)).toSeq shouldBe
        graft.timeseries.TimeSeriesOps.sarimaForecast(m, 3)
    }
    // the seasonal key selected a seasonal term; the plain-AR key
    // did not
    out.filter(_.getString(0) == "1").head.getLong(6) shouldBe 1L
    out.filter(_.getString(0) == "2").head.getLong(6) shouldBe 0L
  }

  test("groupedSarimaForecast fails loudly naming the key when a " +
      "series is too short") {
    import spark.implicits._
    val df = ((0 until 200).map(t => (1L, t.toLong,
        math.sin(t / 5.0) + t * 0.01)) ++
      (0 until 10).map(t => (99L, t.toLong, 1.0)))
      .toDF("k", "t", "v")
    val ex = intercept[org.apache.spark.SparkException] {
      graft.timeseries.TimeSeriesOps.groupedSarimaForecast(
        df, "v", "t", "k", 1, 0, 0, 1, 0, 0, 12, 3).collect()
    }
    ex.getMessage should include("key=99")
  }

  test("sarima seasonal differencing extrapolates trend + " +
      "seasonal pattern exactly") {
    val pat = Array(0.0, 4.0, -3.0, 7.0, 1.0, -2.0, 5.0)
    val series = (0 until 140).map(t => 2.0 * t + pat(t % 7))
    // after S_7 diff the series is the constant 14; AR(1) on it fits
    // exactly, and integration adds the pattern back
    val fc = TimeSeriesOps.sarimaForecast(series, p = 1, d = 0, q = 0,
      sp = 0, sd = 1, sq = 0, period = 7, steps = 21)
    fc.zipWithIndex.foreach { case (got, i) =>
      val t = 140 + i
      approx(got, 2.0 * t + pat(t % 7), 1e-3)
    }
  }

  test("autoArima selects a seasonal model on seasonal-AR data " +
      "and ranks it above the non-seasonal AR(1)") {
    val rng = new scala.util.Random(29)
    val buf = scala.collection.mutable.ArrayBuffer.fill(12)(0.0)
    (12 until 500).foreach { t =>
      buf += 0.3 * buf(t - 1) + 0.55 * buf(t - 12) +
        (rng.nextDouble() - 0.5)
    }
    val (best, table) = TimeSeriesOps.autoArima(buf.toSeq,
      maxP = 2, maxD = 1, maxQ = 1, period = 12)
    best.isDefined shouldBe true
    val b = best.get
    (b.sp + b.sq) should be >= 1
    // the table carries every candidate; the chosen AICc is the min
    val chosen = table.find(c => c.ok && c.p == b.p && c.d == b.d &&
      c.q == b.q && c.sp == b.sp && c.sd == b.sd && c.sq == b.sq).get
    val plainAr = table.find(c => c.ok && c.p == 1 && c.d == 0 &&
      c.q == 0 && c.sp == 0 && c.sd == 0 && c.sq == 0).get
    chosen.aicc should be <= plainAr.aicc
    table.filter(_.ok).map(_.aicc).min shouldBe chosen.aicc
  }

  test("sarima information criteria: aicc > aic, bic penalizes " +
      "harder at n > e^2") {
    val rng = new scala.util.Random(5)
    var x = 0.0
    val series = (0 until 300).map { _ =>
      x = 0.4 * x + (rng.nextDouble() - 0.5); x
    }
    val m = TimeSeriesOps.sarimaFit(series, p = 2, d = 0, q = 1,
      sp = 0, sd = 0, sq = 0, period = 0)
    m.aic.isFinite shouldBe true
    m.aicc should be > m.aic
    m.bic should be > m.aic // ln(n) > 2 for n ~ 290
    m.nParams shouldBe 4
  }
}
