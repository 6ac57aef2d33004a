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
