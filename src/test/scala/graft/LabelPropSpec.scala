package graft

import graft.graphops.GraphOps

/** Label propagation: community semantics the q344 oracle replay
  * doesn't state explicitly. */
class LabelPropSpec extends SparkSpecBase {
  import spark.implicits._

  private def edges(es: (Long, Long)*) = es.toDF("src", "dst")

  test("disjoint cliques each converge to their min vertex id") {
    val g = edges((1L, 2L), (2L, 3L), (1L, 3L), // triangle {1,2,3}
      (10L, 11L), (11L, 12L), (10L, 12L))       // triangle {10,11,12}
    val out = GraphOps.labelPropagation(g, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1L, 2L, 3L).foreach(v => out(v) shouldBe 1L)
    Seq(10L, 11L, 12L).foreach(v => out(v) shouldBe 10L)
  }

  test("all-tie neighborhoods break to the smallest label") {
    // path 5-6-7: after round 1, vertex 6 sees labels {5,7} (tie) and
    // must pick 5; the endpoints see only their single neighbor
    val out = GraphOps.labelPropagation(edges((5L, 6L), (6L, 7L)),
      rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(6L) shouldBe 5L
    out(5L) shouldBe 6L
    out(7L) shouldBe 6L
  }

  test("deterministic across runs and symmetric in edge direction") {
    val g1 = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val g2 = edges((2L, 1L), (3L, 2L), (4L, 3L), (1L, 4L), (3L, 1L))
    val a = GraphOps.labelPropagation(g1, rounds = 3)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val b = GraphOps.labelPropagation(g2, rounds = 3)
      .orderBy("id").collect().map(_.toSeq).toSeq
    a shouldBe b
  }
}
