package graft

import graft.llm.RetrievalEval

/** trec_eval-family metrics pinned against hand-computed values. */
class RetrievalEvalSpec extends SparkSpecBase {
  import spark.implicits._

  // run q1: d1(rel2) d2(0) d3(rel1) d4(0) d5(0); q2: nothing judged
  private def run = Seq(
    (1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3), (1L, 4L, 4), (1L, 5L, 5),
    (2L, 1L, 1), (2L, 2L, 2)).toDF("qid", "did", "rank")
  // q1 judgments: d1=2, d3=1 retrieved; d9=3, d10=1 missed
  private def qrels = Seq(
    (1L, 1L, 2), (1L, 3L, 1), (1L, 9L, 3), (1L, 10L, 1))
    .toDF("qid", "did", "rel")

  test("rankEval: hand-computed P/R/MRR/AP/NDCG at k=5") {
    val out = RetrievalEval.rankEval(run, qrels, k = 5)
      .orderBy("qid").collect()
    out.length shouldBe 2
    val q1 = out(0)
    q1.getAs[Long]("n_ret") shouldBe 5L
    q1.getAs[Long]("n_rel") shouldBe 4L
    q1.getAs[Long]("hits") shouldBe 2L
    q1.getAs[Double]("p_at_k") shouldBe 0.4 +- 1e-9
    q1.getAs[Double]("r_at_k") shouldBe 0.5 +- 1e-9
    q1.getAs[Double]("rr") shouldBe 1.0 +- 1e-9
    // AP@5 = (1/1 + 2/3) / min(4,5) = 0.416667
    q1.getAs[Double]("ap_at_k") shouldBe 0.416667 +- 1e-6
    // DCG = 3/log2(2) + 1/log2(4) = 3.5
    // IDCG = 7 + 3/log2(3) + 1/log2(4) + 1/log2(5) = 9.8234658
    val idcg = 7.0 + 3.0 / (math.log(3) / math.log(2)) + 0.5 +
      1.0 / (math.log(5) / math.log(2))
    q1.getAs[Double]("ndcg_at_k") shouldBe (3.5 / idcg) +- 1e-6
    val q2 = out(1)
    q2.getAs[Long]("n_rel") shouldBe 0L
    q2.getAs[Double]("p_at_k") shouldBe 0.0 +- 1e-9
    q2.isNullAt(q2.fieldIndex("r_at_k")) shouldBe true
    q2.getAs[Double]("rr") shouldBe 0.0 +- 1e-9
    q2.isNullAt(q2.fieldIndex("ap_at_k")) shouldBe true
    q2.isNullAt(q2.fieldIndex("ndcg_at_k")) shouldBe true
  }

  test("rankEval: perfect ranking gives NDCG=AP=RR=1") {
    val r = Seq((1L, 9L, 1), (1L, 1L, 2), (1L, 3L, 3), (1L, 10L, 4))
      .toDF("qid", "did", "rank")
    val out = RetrievalEval.rankEval(r, qrels, k = 5).head()
    out.getAs[Double]("ndcg_at_k") shouldBe 1.0 +- 1e-9
    out.getAs[Double]("ap_at_k") shouldBe 1.0 +- 1e-9
    out.getAs[Double]("rr") shouldBe 1.0 +- 1e-9
    out.getAs[Double]("r_at_k") shouldBe 1.0 +- 1e-9
  }

  test("rankEval: ranks beyond k are ignored") {
    val r = Seq((1L, 1L, 6), (1L, 2L, 1)).toDF("qid", "did", "rank")
    val out = RetrievalEval.rankEval(r, qrels, k = 5).head()
    out.getAs[Long]("n_ret") shouldBe 1L
    out.getAs[Long]("hits") shouldBe 0L
  }

  test("annRecall: identical run and truth scores perfectly") {
    val topk = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7))
      .toDF("vec_id", "cosine")
    val r = graft.llm.Similarity.annRecall(topk, topk, "vec_id", 3)
      .head()
    r.getAs[Long]("hits") shouldBe 3L
    r.getAs[Double]("r_at_k") shouldBe 1.0 +- 1e-9
    r.getAs[Double]("ndcg_at_k") shouldBe 1.0 +- 1e-9
    // a run missing the top item loses recall and NDCG
    val worse = Seq((2L, 0.8), (3L, 0.7), (9L, 0.1))
      .toDF("vec_id", "cosine")
    val w = graft.llm.Similarity.annRecall(topk, worse, "vec_id", 3)
      .head()
    w.getAs[Long]("hits") shouldBe 2L
    assert(w.getAs[Double]("ndcg_at_k") < 1.0)
  }

  test("rankEvalMacro: means over queries, nulls excluded") {
    val m = RetrievalEval.rankEvalMacro(
      RetrievalEval.rankEval(run, qrels, k = 5)).head()
    m.getAs[Long]("n_queries") shouldBe 2L
    m.getAs[Double]("mean_p_at_k") shouldBe 0.2 +- 1e-9
    m.getAs[Double]("mean_r_at_k") shouldBe 0.5 +- 1e-9
    m.getAs[Double]("mrr") shouldBe 0.5 +- 1e-9
    m.getAs[Double]("map_at_k") shouldBe 0.416667 +- 1e-6
  }
}
