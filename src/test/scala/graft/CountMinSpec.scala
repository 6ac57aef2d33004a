package graft

import org.apache.spark.sql.functions._
import graft.llm.PipelineOps

/** Count-min sketch: the one-sided error guarantee and shard
  * mergeability (the two properties that make it THE streaming
  * frequency summary). */
class CountMinSpec extends SparkSpecBase {
  import spark.implicits._

  private def skewed = (1 to 2000).map { i =>
    // zipf-ish: key j appears ~2000/j times
    val j = 1 + (2000.0 / i).toInt
    s"key$j"
  }.toDF("k")

  test("estimates never underestimate and are exact for heavy keys") {
    val sk = PipelineOps.countMinSketch(skewed, "k",
      depth = 4, width = 32)
    val est = PipelineOps.cmsEstimate(sk, skewed, "k",
      depth = 4, width = 32)
    val joined = est.join(
      skewed.groupBy("k").agg(count(lit(1)).as("tc")), Seq("k"))
      .select("k", "cms_count", "tc")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    joined.foreach { case (k, e, t) =>
      withClue(k) { e should be >= t }
    }
    // the overestimate stays within the CMS error envelope: for the
    // heaviest key the min-bucket excess is residual collision mass,
    // far below e·N/width
    val (_, e1, t1) = joined.maxBy(_._3)
    val n = joined.map(_._3).sum
    (e1 - t1).toDouble should be < math.E * n / 32
  }

  test("sketches merge by summing counts (shard-parallel build)") {
    val a = skewed.limit(900)
    val b = skewed.exceptAll(a)
    val merged = PipelineOps.countMinSketch(a, "k", 4, 32)
      .unionAll(PipelineOps.countMinSketch(b, "k", 4, 32))
      .groupBy("r", "bucket").agg(sum("cnt").as("cnt"))
    val whole = PipelineOps.countMinSketch(skewed, "k", 4, 32)
    merged.exceptAll(whole).count() shouldBe 0
    whole.exceptAll(merged).count() shouldBe 0
  }

  test("unseen keys estimate from residual collisions only") {
    val sk = PipelineOps.countMinSketch(skewed, "k",
      depth = 4, width = 4096)
    val est = PipelineOps.cmsEstimate(sk,
      Seq("never-seen-key").toDF("k"), "k", depth = 4, width = 4096)
      .select("cms_count").as[Long].head()
    // wide sketch, 2000 rows in 4096 buckets x 4 rows: the min over
    // 4 nearly-empty buckets is tiny (usually 0)
    est should be <= 10L
  }
}
