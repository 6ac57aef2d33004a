package graft

import graft.stats.StatsOps
import graft.ops.PandasOps._

/** Exact trimmed mean + pandas wide_to_long. */
class TrimmedWideSpec extends SparkSpecBase {
  import spark.implicits._

  test("trimmedMean drops k from each tail exactly") {
    // 1..10, frac 0.2 -> k=2: mean of 3..8 = 5.5
    val df = (1 to 10).map(_.toLong).toDF("v")
    val r = StatsOps.trimmedMean(df, "v", 0.2).collect()(0)
    r.getAs[Long]("n") shouldBe 10L
    r.getAs[Long]("k_each") shouldBe 2L
    approx(r.getAs[Double]("trimmed_mean"), 5.5, 1e-9)
  }

  test("trimmedMean splits ties straddling the cut") {
    // values: 1,1,1,9 with frac 0.25 -> k=1: drop ONE 1 and the 9,
    // keep 1,1 -> mean 1.0
    val df = Seq(1L, 1L, 1L, 9L).toDF("v")
    val r = StatsOps.trimmedMean(df, "v", 0.25).collect()(0)
    r.getAs[Long]("k_each") shouldBe 1L
    approx(r.getAs[Double]("trimmed_mean"), 1.0, 1e-9)
  }

  test("trimmedMean with frac 0 is the plain mean") {
    val df = Seq(2L, 4L, 9L).toDF("v")
    val r = StatsOps.trimmedMean(df, "v", 0.0).collect()(0)
    approx(r.getAs[Double]("trimmed_mean"), 5.0, 1e-9)
  }

  test("wideToLong reshapes stub columns into suffix rows") {
    val df = Seq((1L, 10.0, 20.0, 1.5, 2.5))
      .toDF("id", "A_1970", "A_1980", "B_1970", "B_1980")
    val out = df.wideToLong(Seq("A", "B"), Seq("id"), "year")
      .orderBy("year").collect()
    out.length shouldBe 2
    out(0).getAs[String]("year") shouldBe "1970"
    out(0).getAs[Double]("A") shouldBe 10.0
    out(0).getAs[Double]("B") shouldBe 1.5
    out(1).getAs[String]("year") shouldBe "1980"
    out(1).getAs[Double]("A") shouldBe 20.0
    out(1).getAs[Double]("B") shouldBe 2.5
  }

  test("nlargestPerGroup keeps top-n per key with deterministic ties") {
    val df = Seq(("a", 5L, 1L), ("a", 5L, 2L), ("a", 3L, 3L),
      ("b", 9L, 4L), ("b", 1L, 5L)).toDF("k", "v", "id")
    val out = df.nlargestPerGroup(2, "v", Seq("k"), "id")
      .orderBy("k", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.toSeq shouldBe Seq(("a", 5L, 1L), ("a", 5L, 2L),
      ("b", 9L, 4L), ("b", 1L, 5L))
    val small = df.nsmallestPerGroup(1, "v", Seq("k"), "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    small shouldBe Set(("a", 3L), ("b", 1L))
  }

  test("wideToLong rejects a missing stub-suffix combination") {
    val df = Seq((1L, 10.0, 1.5)).toDF("id", "A_1970", "B_1980")
    an[IllegalArgumentException] should be thrownBy
      df.wideToLong(Seq("A", "B"), Seq("id"), "year")
  }
}
