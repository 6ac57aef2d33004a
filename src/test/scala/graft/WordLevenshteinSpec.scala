package graft

import org.apache.spark.sql.functions._
import graft.sqlext.WordLevenshtein

/** Token-level Levenshtein expression: hand-computed values,
  * null/empty handling, parity with a scalar reference DP, and the
  * WER wrapper semantics. */
class WordLevenshteinSpec extends SparkSpecBase {
  import spark.implicits._

  private def wl(a: Seq[String], b: Seq[String]): Int = {
    val df = Seq((a, b)).toDF("a", "b")
    df.select(WordLevenshtein.word_levenshtein($"a", $"b"))
      .as[Int].head()
  }

  test("hand-computed word distances") {
    wl(Seq("the", "cat", "sat"), Seq("the", "cat", "sat")) shouldBe 0
    wl(Seq("the", "cat", "sat"), Seq("the", "dog", "sat")) shouldBe 1
    wl(Seq("a", "b", "c"), Seq("b", "c")) shouldBe 1            // del
    wl(Seq("b", "c"), Seq("a", "b", "c")) shouldBe 1            // ins
    wl(Seq("a", "b"), Seq("b", "a")) shouldBe 2
    wl(Seq.empty, Seq("x", "y")) shouldBe 2
    wl(Seq("x", "y"), Seq.empty) shouldBe 2
    // char-level would give 1 here; word-level must give 1 too but
    // for a DIFFERENT reason (whole-token substitution)
    wl(Seq("kitten"), Seq("sitten")) shouldBe 1
    // tokens are atomic: no partial credit for shared prefixes
    wl(Seq("abcdef"), Seq("abcdeg", "x")) shouldBe 2
  }

  test("null array yields null; null elements equal only null") {
    val df = Seq((Some(Seq("a")), None: Option[Seq[String]]))
      .toDF("a", "b")
    df.select(WordLevenshtein.word_levenshtein($"a", $"b"))
      .collect()(0).isNullAt(0) shouldBe true
    val withNulls = Seq((Seq[String]("a", null), Seq[String]("a", null)),
      (Seq[String](null), Seq[String]("a")))
      .toDF("a", "b")
    withNulls.select(WordLevenshtein.word_levenshtein($"a", $"b"))
      .as[Int].collect().toSeq shouldBe Seq(0, 1)
  }

  test("codegen equals an independent scalar DP on random arrays") {
    val rnd = new scala.util.Random(11)
    def arr() = Seq.fill(rnd.nextInt(10))(
      Seq("a", "b", "c", "dd")(rnd.nextInt(4)))
    val rows = Seq.fill(300)((arr(), arr()))
    val got = rows.toDF("a", "b")
      .select(WordLevenshtein.word_levenshtein($"a", $"b"))
      .as[Int].collect().toSeq
    def ref(a: Seq[String], b: Seq[String]): Int = {
      val d = Array.tabulate(a.size + 1, b.size + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.size; j <- 1 to b.size)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.size)(b.size)
    }
    got shouldBe rows.map { case (a, b) => ref(a, b) }
  }

  test("wer wrapper: edits over reference length, null on empty ref") {
    val pairs = Seq(
      (1L, "The cat sat", "the cat sat down"),
      (2L, "hello", "")).toDF("pid", "cand", "ref")
    val out = graft.llm.TextEval.wer(pairs, "pid", "cand", "ref")
      .orderBy("pid").collect()
    out(0).getLong(1) shouldBe 1L      // one insertion
    out(0).getLong(2) shouldBe 4L
    approx(out(0).getDouble(3), 0.25)
    out(1).isNullAt(3) shouldBe true
  }
}
