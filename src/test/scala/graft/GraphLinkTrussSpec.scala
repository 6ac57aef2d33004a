package graft

import org.apache.spark.sql.functions._
import graft.graphops.GraphOps

/** Round-7 graph additions: link-prediction scores, personalized
  * PageRank, edge triangle support, k-truss (bounded rounds and
  * fixpoint). */
class GraphLinkTrussSpec extends SparkSpecBase {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) =
    pairs.toDF("src", "dst")

  test("linkPredict: hand-computed scores on a 5-vertex graph") {
    // 1-2, 1-3, 2-3, 2-4, 3-4, 4-5 (undirected)
    val e = edges(1L -> 2L, 1L -> 3L, 2L -> 3L, 2L -> 4L,
      3L -> 4L, 4L -> 5L)
    val r = GraphOps.linkPredict(e)
      .collect().map(x => ((x.getLong(0), x.getLong(1)),
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5),
          x.getDouble(6), x.getLong(7)))).toMap
    // pair (1,4): common = {2,3} -> 2; deg(1)=2, deg(4)=3
    val (nc, d1, d4, jac, cosv, pa) = r((1L, 4L))
    nc shouldBe 2L
    d1 shouldBe 2L
    d4 shouldBe 3L
    approx(jac, 2.0 / (2 + 3 - 2))
    approx(cosv, 2.0 / math.sqrt(6.0))
    pa shouldBe 6L
    // pair (2,3): common = {1,4} -> 2, both deg 3
    r((2L, 3L))._1 shouldBe 2L
    // (1,5) share no neighbor -> absent
    r.contains((1L, 5L)) shouldBe false
    // (2,5), (3,5): common neighbor 4
    r((2L, 5L))._1 shouldBe 1L
    r((3L, 5L))._1 shouldBe 1L
  }

  test("linkPredict: maxDeg cap drops pairs through hubs") {
    // star: hub 0 connected to 1..5; also edge 1-2
    val star = (1L to 5L).map(i => 0L -> i) :+ (1L -> 2L)
    val full = GraphOps.linkPredict(edges(star: _*))
    // through the hub every leaf pair has a common neighbor
    full.count() should be >= 10L
    val capped = GraphOps.linkPredict(edges(star: _*), maxDeg = 4)
    // hub (deg 5) excluded as shared neighbor AND as endpoint
    capped.filter(col("src") === 0L || col("dst") === 0L)
      .count() shouldBe 0L
    // only (1,2)-style pairs via low-degree common neighbors remain
    capped.count() should be < full.count()
  }

  test("personalizedPageRank matches an exact scalar replay") {
    // path 1-2-3-4-5 (directed both ways)
    val adj = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L, 4L),
      4L -> Seq(3L, 5L), 5L -> Seq(4L))
    val und = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    val sym = und.union(und.select(col("dst").as("src"),
      col("src").as("dst")))
    val r = GraphOps.personalizedPageRank(sym, Seq(1L), rounds = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // exact integer replay of the documented recursion
    var m = Map(1L -> 1000000000000L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      5L -> 0L)
    for (_ <- 1 to 4) {
      val in = (1L to 5L).map { v =>
        v -> adj.filter(_._2.contains(v)).keys
          .map(u => m(u) / adj(u).length).sum
      }.toMap
      m = (1L to 5L).map { v =>
        v -> (85L * in(v) / 100 +
          (if (v == 1L) 150000000000L else 0L))
      }.toMap
    }
    r shouldBe m
    // restart keeps the source >= the restart floor; no mass created
    r(1L) should be >= 150000000000L
    r.values.sum should be <= 1000000000000L
  }

  test("personalizedPageRank is invariant under repartitioning") {
    val und = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L)
    val sym = und.union(und.select(col("dst").as("src"),
      col("src").as("dst")))
    val a = GraphOps.personalizedPageRank(sym.repartition(1),
      Seq(1L), rounds = 3).orderBy("id").collect().toSeq
    val b = GraphOps.personalizedPageRank(sym.repartition(7),
      Seq(1L), rounds = 3).orderBy("id").collect().toSeq
    a shouldBe b
  }

  test("pageRankExact: uniform restart is a fixpoint on a regular " +
    "graph, and repartition-invariant") {
    // 4-cycle (symmetric): every vertex deg 2 -> mass is invariant
    val und = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)
    val sym = und.union(und.select(col("dst").as("src"),
      col("src").as("dst")))
    val r = GraphOps.pageRankExact(sym, rounds = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    all(r.values) shouldBe 1000000000000L
    val a = GraphOps.pageRankExact(sym.repartition(1), rounds = 2)
      .orderBy("id").collect().toSeq
    val b = GraphOps.pageRankExact(sym.repartition(5), rounds = 2)
      .orderBy("id").collect().toSeq
    a shouldBe b
  }

  test("textRankKeywords ranks the most central word first and " +
    "honors stopwords") {
    import spark.implicits._
    val docs = Seq("alpha beta gamma", "beta gamma delta",
      "gamma delta epsilon", "zeta gamma beta").toDF("text")
    val top = graft.llm.CorpusOps
      .textRankKeywords(docs, "text", stops = Nil, topN = 3)
      .collect()
    top.head.getString(0) shouldBe "gamma"
    // stopping the central word removes it from the graph
    val stopped = graft.llm.CorpusOps
      .textRankKeywords(docs, "text", stops = Seq("gamma"), topN = 10)
      .collect().map(_.getString(0))
    stopped should not contain "gamma"
  }

  test("edgeSupport: triangle counts per edge on K4") {
    // complete graph on 4 vertices: every edge is in 2 triangles
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield i -> j
    val r = GraphOps.edgeSupport(edges(k4: _*)).collect()
    r.length shouldBe 6
    all(r.map(_.getLong(2))) shouldBe 2L
  }

  test("edgeSupport canonicalizes direction and drops self-loops") {
    val e = edges(2L -> 1L, 1L -> 3L, 3L -> 2L, 2L -> 2L)
    val r = GraphOps.edgeSupport(e).orderBy("u", "v")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    r.toSeq shouldBe Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L))
  }

  test("kTruss fixpoint: K4 plus a pendant triangle chain") {
    // K4 on {1,2,3,4}; triangle {4,5,6}; pendant edge 6-7
    val e = edges((for (i <- 1L to 4L; j <- (i + 1) to 4L)
      yield i -> j) ++ Seq(4L -> 5L, 4L -> 6L, 5L -> 6L, 6L -> 7L): _*)
    // 4-truss: every edge in >= 2 triangles within the subgraph ->
    // exactly the K4
    val t4 = GraphOps.kTruss(e, k = 4)
      .select("a", "b").orderBy("a", "b")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    t4.toSeq shouldBe (for (i <- 1L to 4L; j <- (i + 1) to 4L)
      yield (i, j)).toSeq
    // 3-truss keeps both triangles, drops only the pendant edge
    val t3 = GraphOps.kTruss(e, k = 3).select("a", "b").collect()
    t3.length shouldBe 9
  }

  test("kTruss: bounded rounds under-prune vs the fixpoint") {
    // chain of triangles where pruning cascades: removing the last
    // triangle's weak edge reduces support upstream round by round
    val e = edges(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 2L -> 4L,
      4L -> 5L, 3L -> 5L, 5L -> 6L, 4L -> 6L, 6L -> 7L, 5L -> 7L)
    val fix = GraphOps.kTruss(e, k = 4).count()
    val one = GraphOps.kTruss(e, k = 4, rounds = 1).count()
    one should be >= fix
    // and the fixpoint is stable: one more round changes nothing
    val again = GraphOps.kTruss(e, k = 4, maxIter = 60).count()
    again shouldBe fix
  }
}
