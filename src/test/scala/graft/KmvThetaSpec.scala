package graft

import org.apache.spark.sql.functions._
import graft.llm.PipelineOps

/** Theta-sketch set algebra over KMV sketches: exact regime,
  * estimator accuracy in the sampled regime, shard mergeability,
  * and the grouped-HLL sibling. */
class KmvThetaSpec extends SparkSpecBase {
  import spark.implicits._

  test("exact regime: sketches under k reproduce true set algebra") {
    val a = (1 to 60).map(i => s"u$i").toDF("v")
    val b = (41 to 110).map(i => s"u$i").toDF("v")
    val r = PipelineOps.kmvSetEstimate(
      PipelineOps.kmvSketchDf(a, "v", 128),
      PipelineOps.kmvSketchDf(b, "v", 128), 128).head()
    // theta = 1.0: the sample IS the set, estimates are exact
    r.getAs[Double]("theta") shouldBe 1.0
    r.getAs[Long]("n_inter") shouldBe 20L
    r.getAs[Long]("n_union") shouldBe 110L
    r.getAs[Double]("est_inter") shouldBe 20.0
    r.getAs[Double]("est_union") shouldBe 110.0
    r.getAs[Double]("est_jaccard") shouldBe
      BigDecimal(20.0 / 110.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("sampled regime: estimates land near truth (k=256, n=4000)") {
    val a = (1 to 4000).map(i => s"m$i").toDF("v")
    val b = (2001 to 6000).map(i => s"m$i").toDF("v")
    val r = PipelineOps.kmvSetEstimate(
      PipelineOps.kmvSketchDf(a, "v", 256),
      PipelineOps.kmvSketchDf(b, "v", 256), 256).head()
    r.getAs[Double]("theta") should be < 1.0
    // true inter 2000, union 6000; KMV rse ~1/sqrt(k-1) ≈ 6%, the
    // intersection inherits union-level absolute noise — allow wide
    math.abs(r.getAs[Double]("est_union") - 6000) / 6000.0 should
      be < 0.25
    math.abs(r.getAs[Double]("est_inter") - 2000) / 2000.0 should
      be < 0.5
  }

  test("sketch of a union == k-min merge of per-shard sketches") {
    val s1 = (1 to 3000).map(i => s"d$i").toDF("v")
    val s2 = (2500 to 5500).map(i => s"d$i").toDF("v")
    val whole = PipelineOps.kmvSketchDf(s1.union(s2), "v", 64)
    val merged = PipelineOps.kmvSketchDf(s1, "v", 64)
      .union(PipelineOps.kmvSketchDf(s2, "v", 64))
      .distinct().orderBy("h").limit(64)
    merged.exceptAll(whole).count() shouldBe 0
    whole.exceptAll(merged).count() shouldBe 0
  }

  test("grouped HLL matches per-group single-set HLL estimates") {
    val df = (1 to 900).map { i =>
      (s"g${i % 3}", s"user${i % (100 * (1 + i % 3))}")
    }.toDF("grp", "v")
    val grouped = PipelineOps.hllEstimateGrouped(
      PipelineOps.hllSketchGrouped(df, "grp", "v", 6), 6)
      .select("grp", "hll_estimate").as[(String, Double)]
      .collect().toMap
    Seq("g0", "g1", "g2").foreach { g =>
      val single = PipelineOps.hllEstimate(
        PipelineOps.hllSketch(df.filter(col("grp") === g), "v", 6), 6)
        .select("hll_estimate").head().getDouble(0)
      withClue(g) { grouped(g) shouldBe single }
    }
  }
}
