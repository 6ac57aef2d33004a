package graft

import org.apache.spark.sql.functions._
import graft.timeseries.TimeSeriesOps

/** One-step-ahead Holt backtest: independent Scala replay of the
  * recurrence, exactness on a perfectly linear series, and the MASE
  * zero-scale guard. */
class HoltBacktestSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(series: Seq[Double], a: Double, b: Double) =
    TimeSeriesOps.holtBacktestOneStep(
      series.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
        .toDF("key", "t", "v"),
      "v", "t", Seq("key"), a, b).head()

  test("metrics match an independent Scala replay") {
    val ys = Seq(12.0, 15.0, 11.0, 18.0, 14.0, 20.0, 17.0)
    val (a, b) = (0.4, 0.3)
    // replay: level=y1; then level=y2, trend=y2-y1; then standard
    var level = ys.head; var trend = 0.0
    var fcs = Vector.empty[(Double, Double)] // (y, fc)
    ys.zipWithIndex.drop(1).foreach { case (y, i) =>
      if (i == 1) {
        val l1 = a * y + (1 - a) * (level + (y - level))
        trend = b * (l1 - level) + (1 - b) * (y - level)
        level = l1
      } else {
        fcs :+= (y, level + trend)
        val l1 = a * y + (1 - a) * (level + trend)
        val t1 = b * (l1 - level) + (1 - b) * trend
        level = l1; trend = t1
      }
    }
    val errs = fcs.map { case (y, f) => y - f }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mae = errs.map(math.abs).sum / errs.size
    val naive = ys.sliding(2).map(p => math.abs(p(1) - p(0))).toSeq
    val row = run(ys, a, b)
    row.getAs[Long]("n_eval") shouldBe errs.size.toLong
    row.getAs[Double]("mae") shouldBe r6(mae)
    row.getAs[Double]("rmse") shouldBe
      r6(math.sqrt(errs.map(e => e * e).sum / errs.size))
    row.getAs[Double]("mape") shouldBe r6(fcs.zip(errs).map {
      case ((y, _), e) => math.abs(e) / math.abs(y) }.sum / errs.size)
    row.getAs[Double]("mase") shouldBe
      r6(mae / (naive.sum / naive.size))
  }

  test("a perfectly linear series backtests with zero error") {
    val ys = (0 until 20).map(i => 10.0 + 2.0 * i)
    val row = run(ys, 0.4, 0.3)
    row.getAs[Double]("mae") shouldBe 0.0
    row.getAs[Double]("rmse") shouldBe 0.0
    row.getAs[Double]("smape") shouldBe 0.0
    row.getAs[Double]("mase") shouldBe 0.0
  }

  test("constant series yields null MASE (zero naive scale)") {
    val row = run(Seq.fill(10)(5.0), 0.4, 0.3)
    row.getAs[Double]("mae") shouldBe 0.0
    assert(row.isNullAt(row.fieldIndex("mase")))
  }
}
