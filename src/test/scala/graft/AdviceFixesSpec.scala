package graft

import org.apache.spark.sql.functions._

/** Regression specs for the round-2 ADVICE findings: connected-
  * components convergence (pointer jumping + loud failure), dbscan on
  * long-diameter cluster graphs, chiSquareGof expected-map validation,
  * isolationForest null-safety/determinism, xlsx non-finite doubles
  * and boolean cells. */
class AdviceFixesSpec extends SparkSpecBase {
  import spark.implicits._

  test("connectedComponents converges on a long path via pointer jumping") {
    // a 150-hop path has diameter far beyond the old 20-superstep cap;
    // pointer jumping converges it in O(log n) rounds
    val edges = (0L until 150L).map(i => (i, i + 1)).toDF("src", "dst")
    val comps = graft.graphops.GraphOps.connectedComponents(edges)
    comps.count() shouldBe 151
    comps.agg(countDistinct("component")).as[Long].head() shouldBe 1L
    comps.agg(max("component")).as[Long].head() shouldBe 0L
  }

  test("connectedComponents throws loudly when the cap is hit unconverged") {
    val edges = (0L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalStateException] {
      graft.graphops.GraphOps.connectedComponents(edges, maxIter = 1)
    }
    ex.getMessage should include("did not converge")
  }

  test("dbscan labels a 60-point chain as one cluster (diameter > 20)") {
    // adjacent points 0.9 apart with eps=1.0: the core graph is a
    // 60-hop chain, which the pre-fix 20-superstep CC mislabeled
    val pts = (0 until 60).map(i => (i.toLong, i * 0.9)).toDF("id", "x")
    val out = graft.ml.Clustering.dbscan(pts, Seq("x"), "id",
      eps = 1.0, minPts = 2)
    out.agg(countDistinct("cluster")).as[Long].head() shouldBe 1L
    out.filter(col("cluster").isNull).count() shouldBe 0
  }

  test("chiSquareGof rejects incomplete or non-normalized expected maps") {
    import graft.stats.StatsOps
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c"))
      .toDF("cat")
    val missing = intercept[IllegalArgumentException] {
      StatsOps.chiSquareGof(df, "cat", Map("a" -> 0.6, "b" -> 0.4))
        .head()
    }
    missing.getMessage should include("missing observed categories")
    val badSum = intercept[IllegalArgumentException] {
      StatsOps.chiSquareGof(df, "cat",
        Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.3)).head()
    }
    badSum.getMessage should include("sum to 1")
    val nonPos = intercept[IllegalArgumentException] {
      StatsOps.chiSquareGof(df, "cat",
        Map("a" -> 1.2, "b" -> -0.1, "c" -> -0.1)).head()
    }
    nonPos.getMessage should include("positive")
  }

  test("isolationForest: null features score null, fit is deterministic") {
    val base = (0 until 200).map { i =>
      (i.toLong, (i % 20).toDouble, ((i * 7) % 20).toDouble)
    }
    val withNulls = base.map { case (id, x, y) =>
      (id, if (id % 50 == 3) None else Some(x), y)
    }.toDF("id", "x", "y")
    val scored = graft.ml.Anomaly.isolationForest(
      withNulls, Seq("x", "y"), nTrees = 20)
    scored.filter(col("x").isNull &&
      col("anomaly_score").isNotNull).count() shouldBe 0
    scored.filter(col("x").isNotNull &&
      col("anomaly_score").isNull).count() shouldBe 0
    // determinism: same seed, different partitioning -> same scores
    val df = base.map(t => (t._1, t._2, t._3)).toDF("id", "x", "y")
    def score(d: org.apache.spark.sql.DataFrame) =
      graft.ml.Anomaly.isolationForest(d, Seq("x", "y"), nTrees = 20)
        .select("id", "anomaly_score").as[(Long, Double)]
        .collect().toMap
    val s1 = score(df.repartition(1))
    val s2 = score(df.repartition(7, col("y")))
    s1 shouldBe s2
  }

  test("xlsx: non-finite doubles write as empty cells, booleans round-trip") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_xlsx_adv").toString + "/t.xlsx"
    val df = Seq(
      (1L, Double.NaN, true),
      (2L, Double.PositiveInfinity, false),
      (3L, 2.5, true)
    ).toDF("id", "x", "flag")
    graft.sources.Excel.writeXlsx(df, path)
    val back = graft.sources.Excel.readXlsx(spark, path).orderBy("id")
    back.schema("x").dataType shouldBe
      org.apache.spark.sql.types.DoubleType
    back.schema("flag").dataType shouldBe
      org.apache.spark.sql.types.BooleanType
    back.filter($"id" === 1.0).head().isNullAt(1) shouldBe true
    back.filter($"id" === 2.0).head().isNullAt(1) shouldBe true
    back.filter($"id" === 3.0).select("x").as[Double].head() shouldBe 2.5
    back.select("flag").as[Boolean].collect() shouldBe
      Array(true, false, true)
  }
}
