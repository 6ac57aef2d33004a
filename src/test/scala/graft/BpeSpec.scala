package graft

import graft.llm.CorpusOps

/** BPE merge training: a fully hand-worked merge trace (counts, the
  * lexicographic tie-break, greedy non-overlapping application) and
  * the segmenter's order sensitivity. */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  test("hand-worked three-round trace with tie-break") {
    // corpus: aaab ×2, aab ×1
    //   r1: (a,a)=5 beats (a,b)=3          → merge (a,a)
    //       aaab→[aa,a,b] (greedy: no re-fuse), aab→[aa,b]
    //   r2: (aa,a)=2 ties (a,b)=2 → pair-asc tie-break picks (a,b)
    //       aaab→[aa,ab]
    //   r3: (aa,ab)=2 beats (aa,b)=1       → merge (aa,ab)
    val corpus = Seq("aaab aaab aab").toDF("text")
    val got = CorpusOps.bpeTrain(corpus, "text", merges = 3)
      .orderBy("merge_round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    got shouldBe Seq((1L, "a", "a", 5L), (2L, "a", "b", 2L),
      (3L, "aa", "ab", 2L))
  }

  test("training stops early when no pairs remain") {
    val got = CorpusOps.bpeTrain(Seq("ab ab").toDF("text"), "text",
      merges = 8).collect()
    // one merge exhausts every word to a single symbol
    got.length shouldBe 1
    (got(0).getString(1), got(0).getString(2)) shouldBe ("a", "b")
  }

  test("segmenter applies merges in order; order matters") {
    val seg = CorpusOps.bpeSegment(Seq("aaab").toDF("text"), "text",
      Seq(("a", "a"), ("a", "b")))
      .collect()(0).getSeq[String](1)
    seg shouldBe Seq("aa", "ab")
    val rev = CorpusOps.bpeSegment(Seq("aaab").toDF("text"), "text",
      Seq(("a", "b"), ("a", "a")))
      .collect()(0).getSeq[String](1)
    rev shouldBe Seq("aa", "ab") // (a,b) first: [a,a,ab]; then (a,a)
    // a trace where order genuinely flips the result
    val s1 = CorpusOps.bpeSegment(Seq("abc").toDF("text"), "text",
      Seq(("a", "b"), ("b", "c"))).collect()(0).getSeq[String](1)
    s1 shouldBe Seq("ab", "c") // (a,b) consumed b before (b,c)
    val s2 = CorpusOps.bpeSegment(Seq("abc").toDF("text"), "text",
      Seq(("b", "c"), ("a", "b"))).collect()(0).getSeq[String](1)
    s2 shouldBe Seq("a", "bc")
  }

  test("segmentation always reassembles to the original word") {
    val corpus = Seq("the quick brown fox jumps over the lazy dog " +
      "the quick brown fox").toDF("text")
    val merges = CorpusOps.bpeTrain(corpus, "text", merges = 6)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val segs = CorpusOps.bpeSegment(corpus, "text", merges).collect()
    segs.foreach { r =>
      r.getSeq[String](1).mkString shouldBe r.getString(0)
    }
  }
}
