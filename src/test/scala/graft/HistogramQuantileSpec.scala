package graft

import org.apache.spark.sql.functions._
import graft.stats.StatsOps

/** Histogram-quantile sketch: hand-computed interpolation, shard
  * mergeability under shared bounds, error bounded by bin width, and
  * degenerate inputs. */
class HistogramQuantileSpec extends SparkSpecBase {
  import spark.implicits._

  test("hand-computed interpolation on a uniform ramp") {
    // 0,1,...,99 over 10 bins of width 9.9: each bin holds 10 values
    val df = (0 until 100).map(_.toDouble).toDF("x")
    val r = StatsOps.histogramQuantiles(df, "x", Seq(0.5), bins = 10)
      .head()
    // target = 50, cum hits 50 at bin 4 (values 39.6..49.5 by bound
    // arithmetic): est = 0 + 9.9 * (4 + (50-40)/10) = 49.5
    r.getLong(1) shouldBe 4L
    r.getDouble(2) shouldBe 49.5
  }

  test("per-shard histograms with shared bounds sum to the whole") {
    val a = (1 to 5000).map(i => (i % 997).toDouble).toDF("x")
    val b = (1 to 3000).map(i => ((i * 7) % 997).toDouble).toDF("x")
    val whole = StatsOps.histogramBins(a.union(b), "x", 32, 0.0, 997.0)
    val merged = StatsOps.histogramBins(a, "x", 32, 0.0, 997.0)
      .union(StatsOps.histogramBins(b, "x", 32, 0.0, 997.0))
      .groupBy("bin").agg(sum("cnt").as("cnt"))
    merged.exceptAll(whole).count() shouldBe 0
    whole.exceptAll(merged).count() shouldBe 0
  }

  test("estimates stay within one bin width of exact quantiles") {
    val df = (1 to 10000).map(i => math.pow(i.toDouble, 1.5)).toDF("x")
    val binW = (math.pow(10000, 1.5) - math.pow(1, 1.5)) / 128.0
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    val est = StatsOps.histogramQuantiles(df, "x", qs, bins = 128)
      .select("q", "quantile_est").as[(Double, Double)].collect().toMap
    val exact = df.stat.approxQuantile("x", qs.toArray, 0.0)
    qs.zipWithIndex.foreach { case (q, i) =>
      // est lies inside the containing bin; the exact order
      // statistic can sit at the edge of a neighbor — 2 widths
      withClue(s"q=$q") {
        math.abs(est(q) - exact(i)) should be <= 2 * binW
      }
    }
  }

  test("constant column degenerates to the constant") {
    val df = Seq.fill(50)(7.25).toDF("x")
    val r = StatsOps.histogramQuantiles(df, "x", Seq(0.5, 1.0), 16)
      .select("quantile_est").as[Double].collect()
    r.foreach(_ shouldBe 7.25)
  }
}
