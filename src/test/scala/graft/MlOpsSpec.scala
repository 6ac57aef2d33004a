package graft

import graft.ml.Clustering

import org.apache.spark.sql.functions._
import graft.ml.MlOps

/** ML layer (§2.13): exact preprocessing expressions + MLlib fits. */
class MlOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("tree, forest, and gbt models separate a clean boundary") {
    val df = (1 to 40).map(i =>
      (i.toDouble, if (i <= 20) 0.0 else 1.0)).toDF("x", "label")
    Seq(
      MlOps.decisionTreeMl(df, Seq("x"), "label"),
      MlOps.randomForestMl(df, Seq("x"), "label", numTrees = 5),
      MlOps.gbtMl(df, Seq("x"), "label", maxIter = 5)
    ).foreach { out =>
      out.filter(col("prediction") =!= col("label")).count() shouldBe 0L
    }
  }

  test("fitPredictPipeline chains scale + model as one fitted pipeline") {
    val reg = (1 to 50).map(i => (i.toDouble, (i % 3).toDouble,
      4.0 * i + 1.0)).toDF("x1", "x2", "y")
    val out = MlOps.fitPredictPipeline(reg, Seq("x1", "x2"), "y")
    out.filter(abs(col("prediction") - col("y")) > 1e-6)
      .count() shouldBe 0L
    val cls = (1 to 40).map(i =>
      (i.toDouble, if (i <= 20) 0.0 else 1.0)).toDF("x", "label")
    val outC = MlOps.fitPredictPipeline(cls, Seq("x"), "label",
      classify = true)
    outC.filter(col("prediction") =!= col("label"))
      .count() shouldBe 0L
  }

  test("tree regression recovers a step function") {
    val df = (1 to 40).map(i =>
      (i.toDouble, if (i <= 20) 10.0 else 20.0)).toDF("x", "y")
    val out = MlOps.decisionTreeMl(df, Seq("x"), "y",
      regression = true)
    out.filter(abs(col("prediction") - col("y")) > 1e-9)
      .count() shouldBe 0L
  }

  test("mlpClassifierMl learns a separable boundary") {
    val df = (1 to 40).map(i =>
      (i.toDouble / 40, if (i <= 20) 0.0 else 1.0))
      .toDF("x", "label")
    val out = MlOps.mlpClassifierMl(df, Seq("x"), "label",
      layers = Seq(1, 4, 2))
    val err = out.filter(col("prediction") =!= col("label")).count()
    assert(err <= 2, s"mlp misclassified $err of 40")
  }

  test("standardScale produces zero-mean unit-variance output") {
    val df = Seq(2.0, 4.0, 6.0, 8.0).toDF("v")
    val out = MlOps.standardScale(df, "v")
      .select("v_scaled").as[Double].collect()
    approx(out.sum, 0.0, 1e-9)
    // sample std of [2,4,6,8] = sqrt(20/3); check largest z
    approx(out.max, (8.0 - 5.0) / math.sqrt(20.0 / 3.0), 1e-9)
  }

  test("standardScale per group centers within each group") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 30.0))
      .toDF("g", "v")
    val out = MlOps.standardScale(df, "v", Seq("g"))
      .groupBy("g").agg(sum("v_scaled").as("s"))
      .select("s").as[Double].collect()
    out.foreach(s => approx(s, 0.0, 1e-9))
  }

  test("minMaxScale maps to [0,1] and handles constant columns") {
    val df = Seq(10.0, 20.0, 30.0).toDF("v")
    MlOps.minMaxScale(df, "v").select("v_scaled").as[Double]
      .collect().sorted shouldBe Array(0.0, 0.5, 1.0)
    val const = Seq(5.0, 5.0).toDF("v")
    MlOps.minMaxScale(const, "v").select("v_scaled").as[Double]
      .collect() shouldBe Array(0.5, 0.5)
  }

  test("oneHot emits one indicator per category") {
    val df = Seq("x", "y", "x").toDF("c")
    val out = MlOps.oneHot(df, "c", Seq("x", "y", "z"))
    out.agg(sum("c_x"), sum("c_y"), sum("c_z")).head().toSeq shouldBe
      Seq(2L, 1L, 0L)
  }

  test("factorize assigns dense codes in sorted order") {
    val df = Seq("m", "k", "m", "z").toDF("c")
    val codes = MlOps.factorize(df, "c").select("c", "c_code")
      .distinct().as[(String, Long)].collect().toMap
    codes shouldBe Map("k" -> 0L, "m" -> 1L, "z" -> 2L)
  }

  test("kmeans separates two obvious blobs") {
    val pts = (Seq.fill(20)((0.0, 0.1)) ++ Seq.fill(20)((10.0, 9.9)))
      .zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "x", "y")
    val out = MlOps.kmeans(pts, Seq("x", "y"), 2)
    out.select("cluster").distinct().count() shouldBe 2
    // all points of one blob share a cluster
    out.filter($"x" < 5).select("cluster").distinct().count() shouldBe 1
  }

  test("linearRegressionMl fits a clean line") {
    val df = (1 to 50).map(i => (i.toDouble, 2.0 * i + 1.0))
      .toDF("x", "y")
    val out = MlOps.linearRegressionMl(df, Seq("x"), "y")
    val errs = out.select(abs($"prediction" - $"y")).as[Double].collect()
    all(errs) should be < 1e-6
  }

  test("logisticRegressionMl separates labeled blobs") {
    val df = ((1 to 20).map(i => (i / 100.0, 0.0)) ++
      (1 to 20).map(i => (5.0 + i / 100.0, 1.0))).toDF("x", "label")
    val out = MlOps.logisticRegressionMl(df, Seq("x"), "label")
    out.filter($"prediction" === $"label").count() shouldBe 40
  }

  test("dbscan clusters blobs, attaches borders, marks noise") {
    // blob A: 6 points around (0,0); blob B: 5 points around (10,10);
    // one border point near A; one far noise point
    val a = (1L to 6L).map(i => (i, i * 0.1, i * 0.05))
    val b = (11L to 15L).map(i => (i, 10.0 + (i - 11) * 0.1, 10.0))
    val border = Seq((7L, 1.3, 0.35)) // within eps of A's edge only
    val noise = Seq((99L, 50.0, -50.0))
    val df = (a ++ b ++ border ++ noise).toDF("id", "x", "y")
    val out = Clustering.dbscan(df, Seq("x", "y"), "id",
      eps = 0.8, minPts = 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)),
          r.getBoolean(2))).toMap
    // blob A all one cluster (id 1, the smallest core)
    val clusterA = out(1L)._1.get
    (1L to 6L).foreach(i => out(i)._1 shouldBe Some(clusterA))
    // blob B a different cluster
    val clusterB = out(11L)._1.get
    clusterB should not be clusterA
    (11L to 15L).foreach(i => out(i)._1 shouldBe Some(clusterB))
    // border point: in A's cluster but not core
    out(7L) shouldBe (Some(clusterA), false)
    // noise: no cluster
    out(99L)._1 shouldBe None
    out(99L)._2 shouldBe false
  }

  test("kmeansLloyd separates blobs and is run-to-run deterministic") {
    val df = ((1L to 20L).map(i => (i, i * 1.0, 0.0)) ++
      (21L to 40L).map(i => (i, 100.0 + i, 50.0))).toDF("id", "x", "y")
    val run1 = Clustering.kmeansLloyd(df, Seq("x", "y"), "id",
      k = 2, iters = 5).as[(Long, Long)].collect().toMap
    // the two blobs land in different clusters
    val blobA = (1L to 20L).map(run1).toSet
    val blobB = (21L to 40L).map(run1).toSet
    blobA.size shouldBe 1
    blobB.size shouldBe 1
    blobA should not be blobB
    val run2 = Clustering.kmeansLloyd(df, Seq("x", "y"), "id",
      k = 2, iters = 5).as[(Long, Long)].collect().toMap
    run2 shouldBe run1
  }

  test("agglomerative recovers separated blobs under every linkage") {
    val a = (1L to 8L).map(i => (i, i * 0.1, 0.0))
    val b = (11L to 18L).map(i => (i, 20.0 + (i - 11) * 0.1, 5.0))
    val df = (a ++ b).toDF("id", "x", "y")
    Seq("single", "complete", "average").foreach { lk =>
      val out = Clustering.agglomerative(df, Seq("x", "y"), "id",
        k = 2, linkage = lk)
        .as[(Long, Long)].collect().toMap
      (1L to 8L).foreach(i => out(i) shouldBe 1L) // min member id
      (11L to 18L).foreach(i => out(i) shouldBe 11L)
    }
    // k = n: every point its own cluster
    val singletons = Clustering.agglomerative(df, Seq("x", "y"), "id",
      k = 16).as[(Long, Long)].collect().toMap
    singletons.foreach { case (id, c) => c shouldBe id }
  }

  test("single vs complete linkage differ on a chain") {
    // a chain of close points bridging two groups: single linkage
    // follows the chain into ONE cluster + the far singleton;
    // complete linkage breaks the chain in the middle
    val pts = (0 to 9).map(i => (i.toLong, i * 1.0)) :+ (99L, 100.0)
    val df = pts.toDF("id", "x")
    val single = Clustering.agglomerative(df, Seq("x"), "id", k = 2,
      linkage = "single").as[(Long, Long)].collect().toMap
    (0L to 9L).foreach(i => single(i) shouldBe 0L)
    single(99L) shouldBe 99L
    val complete = Clustering.agglomerative(df, Seq("x"), "id", k = 3,
      linkage = "complete").as[(Long, Long)].collect().toMap
    complete.values.toSet.size shouldBe 3
  }

  test("isolation forest scores a planted outlier above the cluster") {
    val inliers = (1 to 200).map(i =>
      (i.toLong, (i % 20) * 0.05, ((i * 7) % 20) * 0.05))
    val outlier = (999L, 8.0, -8.0)
    val df = (inliers :+ outlier).toDF("id", "x", "y")
    val scored = graft.ml.Anomaly.isolationForest(df, Seq("x", "y"))
      .select("id", "anomaly_score").as[(Long, Double)].collect().toMap
    scored(999L) should be > 0.6
    val inlierMax = inliers.map(t => scored(t._1)).max
    scored(999L) should be > inlierMax
    inliers.map(t => scored(t._1)).sum / 200 should be < 0.55
  }

  test("classification and regression metrics match hand computation") {
    import graft.ml.MlMetrics
    // truth:  T T T F F ; pred: T F T T F  -> tp=2 fp=1 fn=1 tn=1
    val cls = Seq((true, true), (true, false), (true, true),
      (false, true), (false, false)).toDF("label", "pred")
    val c = MlMetrics.classificationMetrics(cls, "label", "pred").head()
    c.getAs[Long]("tp") shouldBe 2L
    c.getAs[Long]("fp") shouldBe 1L
    c.getAs[Long]("fn") shouldBe 1L
    c.getAs[Long]("tn") shouldBe 1L
    c.getAs[Double]("accuracy") shouldBe 0.6 +- 1e-9
    c.getAs[Double]("precision") shouldBe 2.0 / 3 +- 1e-6
    c.getAs[Double]("recall") shouldBe 2.0 / 3 +- 1e-6
    c.getAs[Double]("f1") shouldBe 2.0 / 3 +- 1e-6
    // y = 1..4, yhat = y+1 -> mse=1, mae=1, rmse=1; ss_tot=5, r2=1-4/5
    val reg = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("y", "yhat")
    val r = MlMetrics.regressionMetrics(reg, "y", "yhat").head()
    r.getAs[Long]("n") shouldBe 4L
    r.getAs[Double]("mse") shouldBe 1.0 +- 1e-9
    r.getAs[Double]("mae") shouldBe 1.0 +- 1e-9
    r.getAs[Double]("rmse") shouldBe 1.0 +- 1e-9
    r.getAs[Double]("r2") shouldBe 0.2 +- 1e-9
    // constant offset is fully "explained" by variance matching
    r.getAs[Double]("explained_variance") shouldBe 1.0 +- 1e-9
  }

  test("polynomialFeatures emits monomials; splits are deterministic partitions") {
    import graft.ml.MlOps
    val df = Seq((1L, 2.0, 3.0), (2L, 4.0, 5.0)).toDF("id", "x", "y")
    val poly = MlOps.polynomialFeatures(df, Seq("x", "y"), 2)
    poly.columns.toSet shouldBe Set("id", "x", "y", "x*x", "x*y", "y*y")
    val r = poly.filter($"id" === 1L).head()
    r.getAs[Double]("x*x") shouldBe 4.0
    r.getAs[Double]("x*y") shouldBe 6.0
    r.getAs[Double]("y*y") shouldBe 9.0
    val inter = MlOps.polynomialFeatures(df, Seq("x", "y"), 2,
      interactionOnly = true)
    inter.columns.toSet shouldBe Set("id", "x", "y", "x*y")

    val big = spark.range(2000).toDF("id")
    val (train, test) = MlOps.trainTestSplit(big, "id", 0.25)
    // exact partition: disjoint, exhaustive, reproducible
    (train.count() + test.count()) shouldBe 2000
    train.intersect(test).count() shouldBe 0
    val (_, test2) = MlOps.trainTestSplit(big, "id", 0.25)
    test2.exceptAll(test).count() shouldBe 0
    test.count().toDouble shouldBe 500.0 +- 3 * math.sqrt(2000 * .25 * .75)

    val folds = MlOps.kFoldAssign(big, "id", 4)
    folds.select("fold").distinct().count() shouldBe 4
    folds.groupBy("fold").count().select("count").as[Long].collect()
      .foreach(c => c.toDouble shouldBe 500.0 +- 3 * math.sqrt(2000 * .25 * .75))
  }

  test("dbscan with separated singletons yields all noise") {
    val df = Seq((1L, 0.0), (2L, 100.0), (3L, 200.0)).toDF("id", "x")
    val out = Clustering.dbscan(df, Seq("x"), "id", eps = 1.0,
      minPts = 2)
    out.filter($"cluster".isNotNull).count() shouldBe 0
  }

  test("tsne keeps well-separated blobs separated, deterministically") {
    import graft.ml.Manifold
    // two 3-D blobs, deterministic lattice jitter (no RNG anywhere)
    val pts = (0 until 20).map { i =>
      (i.toLong, (i % 5) * 0.1, (i / 5 % 4) * 0.1, (i % 3) * 0.1)
    } ++ (20 until 40).map { i =>
      (i.toLong, 10.0 + (i % 5) * 0.1, 10.0 + (i / 5 % 4) * 0.1,
        10.0 + (i % 3) * 0.1)
    }
    val df = pts.toDF("id", "x", "y", "z")
    val emb = Manifold.tsne(df, Seq("x", "y", "z"), "id",
        perplexity = 5.0, iters = 300)
      .select("id", "tsne_0", "tsne_1")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    emb.length shouldBe 40
    val (a, b) = emb.partition(_._1 < 20)
    def centroid(g: Array[(Long, Double, Double)]) =
      (g.map(_._2).sum / g.length, g.map(_._3).sum / g.length)
    val (cax, cay) = centroid(a); val (cbx, cby) = centroid(b)
    // perfect separation: every point sits closer to its own blob's
    // centroid than to the other blob's
    emb.foreach { case (id, px, py) =>
      val dOwn = if (id < 20) math.hypot(px - cax, py - cay)
        else math.hypot(px - cbx, py - cby)
      val dOther = if (id < 20) math.hypot(px - cbx, py - cby)
        else math.hypot(px - cax, py - cay)
      dOwn should be < dOther
    }
    // bit-reproducible across runs
    val emb2 = Manifold.tsne(df, Seq("x", "y", "z"), "id",
        perplexity = 5.0, iters = 300)
      .select("id", "tsne_0", "tsne_1")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    emb2 shouldBe emb
  }

  test("tsne rejects oversized and null inputs") {
    val df = spark.range(30).toDF("id")
      .withColumn("x", $"id".cast("double"))
    an[IllegalArgumentException] should be thrownBy
      graft.ml.Manifold.tsne(df, Seq("x"), "id", maxN = 10)
  }

  test("oneClassSvm scores planted outliers negative, inliers positive") {
    import graft.ml.Anomaly
    // ring of inliers around the origin + two far outliers
    val inliers = (0 until 200).map { i =>
      val t = 2 * math.Pi * i / 200
      (i.toLong, math.cos(t) + 0.01 * (i % 7),
        math.sin(t) + 0.01 * (i % 5))
    }
    val outliers = Seq((900L, 9.0, 9.0), (901L, -8.0, 7.0))
    val df = (inliers ++ outliers).toDF("id", "x", "y")
    val scored = Anomaly.oneClassSvm(df, Seq("x", "y"), nu = 0.05)
      .select("id", "score").as[(Long, Double)].collect().toMap
    val inScores = inliers.map(p => scored(p._1))
    scored(900L) should be < inScores.min
    scored(901L) should be < inScores.min
    // roughly (1 - nu) of the fit data should be inliers
    val posFrac = inScores.count(_ >= 0).toDouble / inScores.size
    posFrac should be > 0.8
    // null features score null
    val withNull = df.unionByName(
      Seq((950L, Option.empty[Double], Option(1.0)))
        .toDF("id", "x", "y"))
    val nullRow = Anomaly.oneClassSvm(withNull, Seq("x", "y"),
        nu = 0.05).filter($"id" === 950L).head()
    nullRow.isNullAt(nullRow.fieldIndex("score")) shouldBe true
  }

  test("rankGauss maps ranks onto N(0,1) quantiles") {
    // 99 distinct values: value i has rank i, p = i/100, z = Phi^-1(p)
    val df = (1 to 99).map(i => (i.toLong, i * 10.0)).toDF("id", "v")
    val out = MlOps.rankGauss(df, "v").orderBy("id")
      .select("v", "gauss_rank").collect()
    // median maps to exactly 0 (Acklam central branch at p = 0.5)
    out(49).getDouble(1) shouldBe 0.0
    // matches the scalar inverse CDF everywhere
    out.zipWithIndex.foreach { case (r, i) =>
      r.getDouble(1) shouldBe
        graft.stats.Distributions.normSInv((i + 1) / 100.0) +- 1e-12
    }
    // monotone in the input
    out.map(_.getDouble(1)).sliding(2).foreach(p => p(0) should be < p(1))
    // ties share one gauss value; nulls pass through
    val tied = Seq(Some(1.0), Some(1.0), Some(2.0), None).toDF("v")
    val tOut = MlOps.rankGauss(tied, "v").select("v", "gauss_rank")
      .collect()
    val g1 = tOut.filter(r => !r.isNullAt(0) && r.getDouble(0) == 1.0)
      .map(_.getDouble(1)).distinct
    g1.length shouldBe 1
    // avg rank of the pair = 1.5 -> p = 1.5/4
    g1.head shouldBe graft.stats.Distributions.normSInv(1.5 / 4.0) +- 1e-12
    tOut.filter(_.isNullAt(0)).head.isNullAt(1) shouldBe true
  }
}
