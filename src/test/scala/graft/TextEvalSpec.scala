package graft

import org.apache.spark.sql.functions._
import graft.llm.TextEval

/** BLEU / ROUGE-N pinned against hand-computed values (Papineni et
  * al. 2002 definitions; ROUGE-N per Lin 2004). */
class TextEvalSpec extends SparkSpecBase {
  import spark.implicits._

  test("rougeN: clipped bigram overlap, hand-computed") {
    // cand: "the cat sat on the mat" bigrams:
    //   {the cat, cat sat, sat on, on the, the mat}
    // ref: "the cat lay on the mat" bigrams:
    //   {the cat, cat lay, lay on, on the, the mat}
    // overlap = {the cat, on the, the mat} -> m=3, c=5, r=5
    val df = Seq((1L, "the cat sat on the mat",
      "the cat lay on the mat")).toDF("id", "c", "r")
    val out = TextEval.rougeN(df, "id", "c", "r", n = 2).head()
    out.getAs[Long]("matches") shouldBe 3L
    out.getAs[Long]("cand_ngrams") shouldBe 5L
    out.getAs[Long]("ref_ngrams") shouldBe 5L
    out.getAs[Double]("precision") shouldBe 0.6 +- 1e-9
    out.getAs[Double]("recall") shouldBe 0.6 +- 1e-9
    out.getAs[Double]("f1") shouldBe 0.6 +- 1e-9
  }

  test("rougeN: clipping caps repeated candidate grams") {
    // cand repeats "a a" 4 times; ref has it twice -> clipped to 2
    val df = Seq((1L, "a a a a a", "a a b a a")).toDF("id", "c", "r")
    val out = TextEval.rougeN(df, "id", "c", "r", n = 2).head()
    // cand bigrams: [a a]x4; ref bigrams: {a a, a b, b a, a a}
    out.getAs[Long]("matches") shouldBe 2L
    out.getAs[Long]("cand_ngrams") shouldBe 4L
  }

  test("bleu: perfect match scores 1, disjoint scores 0, " +
      "short candidate is penalized") {
    val df = Seq(
      (1L, "a b c d e f", "a b c d e f"),
      (2L, "x y z w q v", "a b c d e f"),
      (3L, "a b c d", "a b c d e f g h")).toDF("id", "c", "r")
    val out = TextEval.bleu(df, "id", "c", "r").orderBy("id").collect()
    out(0).getAs[Double]("bleu") shouldBe 1.0 +- 1e-9
    out(0).getAs[Double]("bp") shouldBe 1.0 +- 1e-9
    out(1).getAs[Double]("bleu") shouldBe 0.0 +- 1e-12
    // id 3: p_n all 1 (every cand n-gram appears in ref) but
    // bp = exp(1 - 8/4) = e^-1
    out(2).getAs[Double]("bp") shouldBe math.exp(-1.0) +- 1e-6
    out(2).getAs[Double]("bleu") shouldBe math.exp(-1.0) +- 1e-6
  }

  test("bleu: candidate shorter than maxN yields null (undefined p4)") {
    val df = Seq((1L, "a b c", "a b c d")).toDF("id", "c", "r")
    val out = TextEval.bleu(df, "id", "c", "r").head()
    out.isNullAt(out.fieldIndex("bleu")) shouldBe true
    out.getAs[Double]("p1") shouldBe 1.0 +- 1e-9
  }

  test("bleu: hand-computed mixed case") {
    // cand "the cat sat on the mat" vs ref "the cat lay on the mat"
    // p1 = 5/6 (all but 'sat'), p2 = 3/5, p3: cand trigrams
    // {the cat sat, cat sat on, sat on the, on the mat} -> only
    // 'on the mat' in ref -> 1/4; p4: {the cat sat on, cat sat on
    // the, sat on the mat} -> 0/3 -> bleu = 0 (smoothing 0)
    val df = Seq((1L, "the cat sat on the mat",
      "the cat lay on the mat")).toDF("id", "c", "r")
    val out = TextEval.bleu(df, "id", "c", "r").head()
    out.getAs[Double]("p1") shouldBe (5.0 / 6.0) +- 1e-6
    out.getAs[Double]("p2") shouldBe 0.6 +- 1e-6
    out.getAs[Double]("p3") shouldBe 0.25 +- 1e-6
    out.getAs[Double]("p4") shouldBe 0.0 +- 1e-12
    out.getAs[Double]("bleu") shouldBe 0.0 +- 1e-12
  }
}
