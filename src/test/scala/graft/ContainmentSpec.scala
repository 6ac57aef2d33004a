package graft

import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Asymmetric containment dedup: the embedded-document case that
  * symmetric Jaccard structurally misses, hand-computed values, and
  * the maxDf lower-bound contract. */
class ContainmentSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    // B = A plus a long tail: containment(A in B) = 1.0, Jaccard small
    (1L, "alpha beta gamma delta epsilon", "w"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon", "w"),
    (3L, "totally different words entirely here now", "w"),
    // different block: never paired with 1/2 despite identical text
    (4L, "alpha beta gamma delta epsilon", "x")
  ).toDF("doc_id", "text", "src")

  test("embedded doc scores containment 1.0 where Jaccard fails") {
    val pairs = Dedup.containmentPairs(docs, "text", "doc_id", "src",
      n = 2, threshold = 0.9)
      .select("id_a", "id_b", "contain_a_in_b", "contain_b_in_a")
      .collect()
    pairs.length shouldBe 1
    val r = pairs.head
    (r.getLong(0), r.getLong(1)) shouldBe (1L, 2L)
    r.getDouble(2) shouldBe 1.0 // all 4 bigrams of A appear in B
    // B has 19 bigrams, 4 shared
    r.getDouble(3) shouldBe (math.rint(4.0 / 19.0 * 1e6) / 1e6)
    // the same pair under symmetric Jaccard: 4/19 — below any
    // near-dup threshold; containment is the only detector here
    Dedup.ngramJaccardPairs(docs, "text", "doc_id", "src",
      n = 2, threshold = 0.9).count() shouldBe 0
  }

  test("blocking key separates identical texts in different blocks") {
    val all = Dedup.containmentPairs(docs, "text", "doc_id", "src",
      n = 2, threshold = 0.5).collect()
    all.map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      Set((1L, 2L))
  }

  test("maxDf drops hot grams but containment stays a lower bound") {
    // a gram in every doc of the block is dropped from the join side;
    // sizes keep it, so scores can only shrink
    val hot = Seq(
      (1L, "common alpha beta", "w"),
      (2L, "common alpha beta gamma", "w"),
      (3L, "common other things", "w")).toDF("doc_id", "text", "src")
    val full = Dedup.containmentPairs(hot, "text", "doc_id", "src",
      n = 1, threshold = 0.0)
      .select("id_a", "id_b", "contain_a_in_b").as[(Long, Long, Double)]
      .collect().map { case (a, b, c) => ((a, b), c) }.toMap
    val capped = Dedup.containmentPairs(hot, "text", "doc_id", "src",
      n = 1, threshold = 0.0, maxDf = 2)
      .select("id_a", "id_b", "contain_a_in_b").as[(Long, Long, Double)]
      .collect().map { case (a, b, c) => ((a, b), c) }.toMap
    capped.foreach { case (k, c) => c should be <= full(k) }
  }
}
