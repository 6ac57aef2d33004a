package graft

import org.apache.spark.sql.functions._
import graft.llm.PipelineOps

/** Held-out bigram-LM perplexity (q454). */
class LmPerplexitySpec extends SparkSpecBase {
  import spark.implicits._

  // corpus where most docs repeat one fluent pattern and a few are
  // token soup: enough docs that both hash-split sides see the
  // pattern
  private lazy val corpus = {
    val fluent = (0 until 60).map(i =>
      (i.toLong, "the cat sat on the mat and the dog sat on the rug"))
    val soup = (60 until 66).map(i =>
      (i.toLong, s"zx$i qq${i * 7} lw${i * 13} pf${i * 29} mn${i * 31}"))
    (fluent ++ soup).toDF("doc_id", "text")
  }

  test("held-out fluent docs score much lower perplexity than " +
      "held-out token soup; smoothing keeps everything finite") {
    val out = PipelineOps.lmPerplexity(corpus, "text", "doc_id")
      .filter(col("n_bigrams") > 0)
    val scored = out.collect()
    scored.length should be > 3
    // all log-probs <= 0, perplexity >= 1, nothing null/inf
    scored.foreach { r =>
      val lp = r.getAs[Double]("avg_logprob")
      val ppl = r.getAs[Double]("perplexity")
      lp should be <= 0.0
      ppl should be >= 1.0
      ppl.isInfinity shouldBe false
    }
    val byId = scored.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Double]("perplexity")).toMap
    val fluentP = byId.filter(_._1 < 60).values
    val soupP = byId.filter(_._1 >= 60).values
    fluentP should not be empty
    soupP should not be empty
    fluentP.max should be < soupP.min
  }

  test("train docs are excluded from the scored output and the " +
      "split fraction is respected") {
    val out = PipelineOps.lmPerplexity(corpus, "text", "doc_id")
    val scoredIds = out.select("doc_id").as[Long].collect().toSet
    val trainIds = corpus.select(col("doc_id"))
      .filter(PipelineOps.hash48Unit(
        concat(col("doc_id").cast("string"), lit("#lm"))) < 0.7)
      .as[Long].collect().toSet
    scoredIds.intersect(trainIds) shouldBe empty
    scoredIds.size + trainIds.size shouldBe 66
  }

  test("unseen-context bigrams get the 1/V floor, not a failure") {
    // one held-out doc of entirely novel tokens still scores
    val out = PipelineOps.lmPerplexity(corpus, "text", "doc_id")
      .filter(col("doc_id") >= 60 && col("n_bigrams") > 0)
    out.count() should be > 0L
  }

  test("Kneser-Ney: finite everywhere, fluent held-out docs still " +
      "beat token soup, and KN beats add-1 on the repeated pattern") {
    val kn = PipelineOps.lmPerplexityKn(corpus, "text", "doc_id")
      .filter(col("n_bigrams") > 0).collect()
    kn.foreach { r =>
      r.getAs[Double]("avg_logprob") should be <= 0.0
      r.getAs[Double]("perplexity").isInfinity shouldBe false
    }
    val byId = kn.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Double]("perplexity")).toMap
    val fluent = byId.filter(_._1 < 60)
    val soup = byId.filter(_._1 >= 60)
    fluent should not be empty
    soup should not be empty
    fluent.values.max should be < soup.values.min
    // on heavily repeated in-domain text, KN's discounted estimate
    // wastes less mass on the huge add-1 vocabulary prior
    val add1 = PipelineOps.lmPerplexity(corpus, "text", "doc_id")
      .filter(col("n_bigrams") > 0).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("perplexity")).toMap
    val knMeanFluent = fluent.values.sum / fluent.size
    val a1Fluent = add1.filter(_._1 < 60)
    val a1MeanFluent = a1Fluent.values.sum / a1Fluent.size
    knMeanFluent should be < a1MeanFluent
  }
}
