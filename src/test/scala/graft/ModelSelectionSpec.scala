package graft

import org.apache.spark.sql.functions._
import graft.ml.ModelSelection

/** Model selection (§2.13 / reference src/ml/model_selection.rs):
  * k-fold CV and ridge grid search from one sufficient-statistics
  * aggregate pass. */
class ModelSelectionSpec extends SparkSpecBase {
  import spark.implicits._

  // y = 3x + 7 exactly: every train split recovers the line, held-out
  // error is 0 on every fold.
  test("kFoldOlsCv recovers an exact linear relation with zero error") {
    val df = (1 to 400).map(i => (i.toString, i.toLong, 3L * i + 7L))
      .toDF("rk", "x", "y")
    val out = ModelSelection.kFoldOlsCv(df, "rk", "x", "y", k = 4)
      .collect()
    out.length shouldBe 4
    out.foreach { r =>
      approx(r.getAs[Double]("slope"), 3.0, 1e-6)
      approx(r.getAs[Double]("intercept"), 7.0, 1e-6)
      approx(r.getAs[Double]("test_rmse"), 0.0, 1e-6)
      approx(r.getAs[Double]("test_r2"), 1.0, 1e-6)
    }
    // folds partition the data: train+test = total on every row
    out.foreach(r => r.getAs[Long]("n_train") + r.getAs[Long]("n_test")
      shouldBe 400L)
  }

  test("fold assignment is deterministic and covers [0, k)") {
    val df = (1 to 1000).map(i => (i.toString, i.toLong, i.toLong))
      .toDF("rk", "x", "y")
    val folds = df.select(ModelSelection.foldOf(col("rk"), 5, "cv")
      .as("f")).distinct().collect().map(_.getInt(0)).sorted
    folds shouldBe Array(0, 1, 2, 3, 4)
    // same salt -> identical assignment on a rerun
    val a = df.select(col("rk"), ModelSelection.foldOf(col("rk"), 5,
      "cv").as("f")).collect().map(r => r.getString(0) -> r.getInt(1))
    val b = df.select(col("rk"), ModelSelection.foldOf(col("rk"), 5,
      "cv").as("f")).collect().map(r => r.getString(0) -> r.getInt(1))
    a.toMap shouldBe b.toMap
  }

  // On noisy data lambda=0 is plain OLS; an absurdly large lambda
  // shrinks the slope to ~0 and must score worse when x genuinely
  // predicts y.
  test("ridgeGridCv ranks OLS above total shrinkage on a real signal") {
    val df = (1 to 500).map { i =>
      val noise = (i * 2654435761L % 17) - 8 // deterministic, mean ~0
      (i.toString, i.toLong, 5L * i + noise)
    }.toDF("rk", "x", "y")
    val out = ModelSelection.ridgeGridCv(df, "rk", "x", "y",
      lambdas = Seq(0.0, 1e12), k = 5).collect()
      .map(r => r.getAs[Double]("lambda") ->
        (r.getAs[Double]("cv_rmse"), r.getAs[Int]("rank"))).toMap
    out(0.0)._2 shouldBe 1 // OLS wins
    out(1e12)._2 shouldBe 2
    out(1e12)._1 should be > out(0.0)._1 * 10 // shrinkage is much worse
  }

  test("autoMlRegression ranks the right model family first") {
    // pure linear signal -> linear_regression must win the leaderboard
    val lin = (1 to 300).map(i =>
      (i.toString, i.toDouble, (i % 7).toDouble, 3.0 * i + 11.0))
      .toDF("rk", "x1", "x2", "y")
    val lb = ModelSelection.autoMlRegression(lin, "rk",
      Seq("x1", "x2"), "y").collect()
    lb.length shouldBe 4
    val best = lb.find(_.getAs[Int]("rank") == 1).get
    best.getAs[String]("model") shouldBe "linear_regression"
    approx(best.getAs[Double]("rmse"), 0.0, 1e-6)
    approx(best.getAs[Double]("r2"), 1.0, 1e-6)
  }

  test("ridge slope shrinks monotonically in lambda") {
    val df = (1 to 300).map(i => (i.toString, i.toLong, 2L * i))
      .toDF("rk", "x", "y")
    // recover slopes by scoring each lambda on its own: reuse the CV
    // machinery, then check rmse is monotone (more shrinkage -> worse
    // fit on an exact line)
    val rmse = ModelSelection.ridgeGridCv(df, "rk", "x", "y",
      lambdas = Seq(0.0, 1e6, 1e9), k = 3).collect()
      .map(r => r.getAs[Double]("lambda") -> r.getAs[Double]("cv_rmse"))
      .toMap
    rmse(0.0) should be <= rmse(1e6)
    rmse(1e6) should be <= rmse(1e9)
  }
}
