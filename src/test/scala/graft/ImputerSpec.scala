package graft

import org.apache.spark.sql.functions._
import graft.ml.MlOps

/** Imputer strategies (§2.13, reference preprocessing/mod.rs:447). */
class ImputerSpec extends SparkSpecBase {
  import spark.implicits._

  private def df = Seq(Some(1L), Some(2L), None, Some(3L), None,
    Some(2L)).toDF("v")

  test("mean imputation fills with the exact mean of non-nulls") {
    val out = MlOps.impute(df, Seq("v"), "mean")
      .collect().map(_.getDouble(0)).sorted
    out shouldBe Array(1.0, 2.0, 2.0, 2.0, 2.0, 3.0) // mean = 8/4 = 2
  }

  test("median imputation uses the exact percentile") {
    val d = Seq(Some(1L), Some(10L), Some(100L), None).toDF("v")
    val out = MlOps.impute(d, Seq("v"), "median")
      .collect().map(_.getDouble(0)).sorted
    out shouldBe Array(1.0, 10.0, 10.0, 100.0)
  }

  test("most_frequent fills with the mode, ties to smallest value") {
    val d = Seq(Some(5L), Some(5L), Some(3L), Some(3L), Some(9L), None)
      .toDF("v")
    val out = MlOps.impute(d, Seq("v"), "most_frequent")
      .collect().map(_.getLong(0))
    out.count(_ == 3L) shouldBe 3 // two real 3s + the imputed tie-win
  }

  test("constant fills and preserves non-null values") {
    val out = MlOps.impute(df, Seq("v"), "constant", fillValue = -1.0)
      .collect().map(_.getDouble(0))
    out.count(_ == -1.0) shouldBe 2
  }

  test("imputeByGroup fills with the group mean, global for all-null") {
    val d = Seq(("a", Some(10L)), ("a", Some(20L)), ("a", None),
      ("b", Some(100L)), ("b", None), ("c", None))
      .toDF("k", "v")
    val out = MlOps.imputeByGroup(d, "v", Seq("k")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    out.filter(_._1 == "a").map(_._2).sorted shouldBe
      Array(10.0, 15.0, 20.0) // group-a mean 15
    out.filter(_._1 == "b").map(_._2).sorted shouldBe
      Array(100.0, 100.0)
    // group c has no observed values -> global mean (130/3)
    approx(out.filter(_._1 == "c").head._2, 130.0 / 3, 1e-9)
  }

  test("multi-column mean imputation fits each column independently") {
    val d = Seq((Some(2L), None: Option[Long]),
      (None, Some(10L)), (Some(4L), Some(30L))).toDF("a", "b")
    val out = MlOps.impute(d, Seq("a", "b"), "mean").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).sortBy(_._1)
    out.map(_._1) shouldBe Array(2.0, 3.0, 4.0) // a-mean 3
    out.map(_._2).sorted shouldBe Array(10.0, 20.0, 30.0) // b-mean 20
  }
}
