package graft

import graft.llm.PipelineOps

/** RAKE keyword extraction. */
class RakeSpec extends SparkSpecBase {
  import spark.implicits._

  test("rakeKeywords: hand-computed deg/freq scores") {
    // phrases: "deep learning" / "deep networks" (split at "of"):
    // freq(deep)=2 learning=1 networks=1; deg(deep)=4 others=2;
    // wscore deep=2 learning=2 networks=2 -> both phrases score 4
    val df = Seq((1L, "deep learning of deep networks"))
      .toDF("id", "text")
    val r = PipelineOps.rakeKeywords(df, "text", "id",
      Seq("of"), topN = 10, minPhraseCount = 1L).collect()
    val m = r.map(x => x.getString(0) ->
      (x.getLong(1), x.getAs[Double]("score"))).toMap
    m.keySet shouldBe Set("deep learning", "deep networks")
    m("deep learning") shouldBe ((1L, 4.0))
    m("deep networks") shouldBe ((1L, 4.0))
  }

  test("rakeKeywords: multi-word phrases beat single stop-adjacent words") {
    val docs = Seq(
      (1L, "linear regression, and linear regression again"),
      (2L, "the linear regression model"),
      (3L, "a simple model")).toDF("id", "text")
    val r = PipelineOps.rakeKeywords(docs, "text", "id",
      Seq("the", "and", "a", "again"), topN = 5, minPhraseCount = 2L)
      .collect()
    // doc1 contributes "linear regression" twice (", and" is one
    // break run); doc2's longer "linear regression model" and doc3's
    // "simple model" are singletons, filtered by minPhraseCount=2
    r.map(_.getString(0)).toSeq shouldBe Seq("linear regression")
    r.head.getLong(1) shouldBe 2L
  }

  test("word2vec places shared-context words closer than strangers") {
    // pets share contexts; "engine" lives in disjoint contexts
    val pets = Seq("cat", "dog").flatMap(w => (0 until 40).map(i =>
      s"the fluffy $w sat on the warm mat near the door $i"))
    val cars = (0 until 40).map(i =>
      s"the diesel engine roared on the open highway at dawn $i")
    val df = (pets ++ cars).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val vecs = graft.llm.CorpusOps.word2vec(df, "text", dim = 8,
      minCount = 2, maxIter = 4).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    vecs.contains("cat") shouldBe true
    cos(vecs("cat"), vecs("dog")) should be >
      cos(vecs("cat"), vecs("engine"))
  }

  test("budgetAllocation: water-filling with caps, hand-computed") {
    import graft.llm.PipelineOps
    val src = Seq(("A", 1L, 100L), ("B", 1L, 1000L), ("C", 0L, 50L))
      .toDF("k", "w", "c")
    // budget 600: A caps at 100, B absorbs lambda*1 = 500, C (zero
    // weight) gets 0
    val a1 = PipelineOps.budgetAllocation(src, "k", "w", "c", 600.0)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("allocation"), r.getAs[Boolean]("capped")))
      .toMap
    a1("A") shouldBe ((100.0, true))
    a1("B") shouldBe ((500.0, false))
    a1("C") shouldBe ((0.0, false))
    // surplus budget: everything caps
    val a2 = PipelineOps.budgetAllocation(src, "k", "w", "c", 5000.0)
      .collect().map(r => r.getString(0) ->
        r.getAs[Double]("allocation")).toMap
    a2 shouldBe Map("A" -> 100.0, "B" -> 1000.0, "C" -> 50.0)
    // allocations sum to min(budget, sum(cap)) when weights exist
    val tot = PipelineOps.budgetAllocation(src, "k", "w", "c", 600.0)
      .agg(org.apache.spark.sql.functions.sum("allocation"))
      .head().getDouble(0)
    tot shouldBe 600.0 +- 1e-6
  }

  test("rakeKeywords: stopword-only and empty docs yield nothing") {
    val df = Seq((1L, "the and of"), (2L, ""), (3L, "   "))
      .toDF("id", "text")
    PipelineOps.rakeKeywords(df, "text", "id",
      Seq("the", "and", "of"), topN = 5, minPhraseCount = 1L)
      .count() shouldBe 0L
  }
}
