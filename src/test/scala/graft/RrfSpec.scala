package graft

import graft.llm.Similarity

/** Reciprocal-rank fusion: hand-computed scores and rank derivation
  * from raw scores with the (score desc, id asc) tie-break. */
class RrfSpec extends SparkSpecBase {
  import spark.implicits._

  test("hand-computed fusion of two overlapping lists") {
    // list a scores rank x,y,z as 1,2,3; list b ranks y,w as 1,2
    val scores = Seq(
      ("a", "x", 0.9), ("a", "y", 0.8), ("a", "z", 0.7),
      ("b", "y", 0.95), ("b", "w", 0.5)).toDF("lst", "id", "s")
    val out = Similarity.rrfFuse(scores, "lst", "id", "s", k = 60)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2))).toMap
    approx(out("y")._1, 1.0 / 62 + 1.0 / 61)
    approx(out("x")._1, 1.0 / 61)
    approx(out("z")._1, 1.0 / 63)
    approx(out("w")._1, 1.0 / 62)
    out("y")._2 shouldBe 2L
    out("x")._2 shouldBe 1L
  }

  test("score ties rank by id ascending") {
    val scores = Seq(("a", "q", 0.5), ("a", "p", 0.5))
      .toDF("lst", "id", "s")
    val out = Similarity.rrfFuse(scores, "lst", "id", "s", k = 60)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    approx(out("p"), 1.0 / 61) // p before q on the tie
    approx(out("q"), 1.0 / 62)
  }
}
