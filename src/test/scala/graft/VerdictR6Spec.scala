package graft

import org.apache.spark.sql.functions._

/** Regression specs for the round-5 verdict findings (round-6
  * hardening): mmrSelect driver-pool cap. */
class VerdictR6Spec extends SparkSpecBase {
  import spark.implicits._

  private def embDf = (0L until 20L)
    .map(i => (i, Array.tabulate(4)(j =>
      (math.sin(i * 1.7 + j) * 100).toFloat)))
    .toDF("id", "vec")

  test("mmrSelect caps the driver-side candidate pool loudly") {
    val q = Seq(1f, 0f, 0f, 0f)
    val ex = intercept[IllegalArgumentException] {
      graft.llm.Similarity.mmrSelect(embDf, "vec", "id", q,
        k = 3, candidates = 1000000)
    }
    ex.getMessage should include("maxCandidates")
    // raising the cap explicitly is allowed
    val ok = graft.llm.Similarity.mmrSelect(embDf, "vec", "id", q,
      k = 3, candidates = 20, maxCandidates = 1000000)
    ok.count() shouldBe 3
  }

  test("krippendorffAlpha: hand-computed nominal agreement, " +
      "perfect-agreement convention, single-rating units dropped") {
    // u1: A,A  u2: A,B  u3: B,B  u4: B,B  (+ u5 rated once: dropped)
    // coincidences (w = 1/(m-1) = 1): o_AA=2, o_AB=o_BA=1, o_BB=4
    // n=8, n_A=3, n_B=5; D_o = 2/8 = 0.25
    // D_e = 2*3*5 / (8*7) = 30/56; alpha = 1 - .25/(30/56) = 8/15
    val df = Seq(
      (1, "r1", "A"), (1, "r2", "A"),
      (2, "r1", "A"), (2, "r2", "B"),
      (3, "r1", "B"), (3, "r2", "B"),
      (4, "r1", "B"), (4, "r2", "B"),
      (5, "r1", "A")).toDF("u", "r", "c")
    val out = graft.stats.StatsOps.krippendorffAlpha(df, "u", "r", "c")
      .head()
    out.getAs[Double]("n_ratings") shouldBe 8.0
    out.getAs[Double]("d_o") shouldBe 0.25 +- 1e-9
    out.getAs[Double]("d_e") shouldBe (30.0 / 56.0) +- 1e-6
    out.getAs[Double]("alpha") shouldBe (8.0 / 15.0) +- 1e-6
    // all raters agree everywhere -> D_e = 0 -> alpha = 1 by
    // convention
    val perfect = Seq((1, "r1", "X"), (1, "r2", "X"),
      (2, "r1", "X"), (2, "r2", "X")).toDF("u", "r", "c")
    graft.stats.StatsOps.krippendorffAlpha(perfect, "u", "r", "c")
      .head().getAs[Double]("alpha") shouldBe 1.0 +- 1e-12
    // systematic disagreement -> alpha below 0 (worse than chance)
    val anti = Seq((1, "r1", "A"), (1, "r2", "B"),
      (2, "r1", "B"), (2, "r2", "A")).toDF("u", "r", "c")
    (graft.stats.StatsOps.krippendorffAlpha(anti, "u", "r", "c")
      .head().getAs[Double]("alpha") < 0.0) shouldBe true
  }

  test("krippendorffAlpha interval metric: near misses disagree " +
      "less than far misses; reduces to nominal on 0/1 categories") {
    // same shape, two numeric rating sets: raters off by 1 vs off
    // by 9 — nominal alpha identical, interval alpha much lower for
    // the far-miss panel
    def ratings(offset: Int) = (1 to 8).flatMap(u =>
      Seq((u, "r1", 10), (u, "r2", if (u % 2 == 0) 10 else 10 + offset)))
      .toDF("u", "r", "c")
    val near = graft.stats.StatsOps.krippendorffAlpha(
      ratings(1), "u", "r", "c", metric = "interval")
      .head().getAs[Double]("alpha")
    val far = graft.stats.StatsOps.krippendorffAlpha(
      ratings(9), "u", "r", "c", metric = "interval")
      .head().getAs[Double]("alpha")
    val nomNear = graft.stats.StatsOps.krippendorffAlpha(
      ratings(1), "u", "r", "c").head().getAs[Double]("alpha")
    val nomFar = graft.stats.StatsOps.krippendorffAlpha(
      ratings(9), "u", "r", "c").head().getAs[Double]("alpha")
    nomNear shouldBe nomFar +- 1e-9 // nominal is metric-blind
    // interval: scale-invariant in a pure two-value design, so
    // compare via d_o which grows with the squared offset
    val dNear = graft.stats.StatsOps.krippendorffAlpha(
      ratings(1), "u", "r", "c", metric = "interval")
      .head().getAs[Double]("d_o")
    val dFar = graft.stats.StatsOps.krippendorffAlpha(
      ratings(9), "u", "r", "c", metric = "interval")
      .head().getAs[Double]("d_o")
    (dFar / dNear) shouldBe 81.0 +- 1e-3
    // with only two distinct values {0,1}, (c-c')^2 == the 0/1
    // nominal delta, so the two metrics coincide exactly
    val binary = (1 to 6).flatMap(u =>
      Seq((u, "r1", u % 2), (u, "r2", (u + u / 3) % 2)))
      .toDF("u", "r", "c")
    val ai = graft.stats.StatsOps.krippendorffAlpha(
      binary, "u", "r", "c", metric = "interval")
      .head().getAs[Double]("alpha")
    val an = graft.stats.StatsOps.krippendorffAlpha(
      binary, "u", "r", "c").head().getAs[Double]("alpha")
    ai shouldBe an +- 1e-9
    // suppress unused warnings for near/far (documented above)
    near should be <= 1.0
    far should be <= 1.0
  }

  test("mmrSelect k=1 returns the single most relevant candidate") {
    val q = Seq(1f, 0f, 0f, 0f)
    val top = graft.llm.Similarity.mmrSelect(embDf, "vec", "id", q,
      k = 1, candidates = 20).head()
    // with no selected set, MMR score = lambda * relevance, so the
    // winner must be the relevance argmax
    val rel = embDf.select(col("id"),
      graft.llm.Similarity.cosine(col("vec"),
        array(q.map(lit): _*)).as("rel"))
      .orderBy(desc("rel"), col("id")).head()
    top.getAs[Long]("id") shouldBe rel.getAs[Long]("id")
  }
}
