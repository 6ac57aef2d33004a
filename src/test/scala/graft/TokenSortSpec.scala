package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** fuzzywuzzy-style token_sort_ratio (word-order-insensitive
  * normalized Levenshtein similarity). */
class TokenSortSpec extends SparkSpecBase {
  import spark.implicits._

  private def ratio(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(TextFunctions.tokenSortRatio(col("a"), col("b")))
      .collect()(0).getDouble(0)

  test("reordered words score a perfect 1.0") {
    ratio("new york mets", "mets york new") shouldBe 1.0
    ratio("fuzzy wuzzy was a bear", "wuzzy fuzzy bear a was") shouldBe 1.0
  }

  test("case and extra whitespace do not matter") {
    ratio("Hello   World", "world hello") shouldBe 1.0
  }

  test("duplicates are kept — multisets, not sets") {
    // "a a b" sorts to "a a b" vs "a b" -> distance 2 over len 5
    approx(ratio("a a b", "a b"), 1.0 - 2.0 / 5.0, 1e-9)
  }

  test("disjoint strings score low, similar strings high") {
    ratio("alpha beta", "gamma delta") should be < 0.5
    ratio("chocolate brown box", "brown chocolate boxx") should be > 0.9
  }
}
