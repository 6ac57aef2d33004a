package graft

import org.apache.spark.sql.functions._
import graft.timeseries.TechnicalOps

class TechnicalOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def series(vs: Seq[Long]) =
    vs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("g", "t", "v")

  test("maxDrawdown finds the deepest peak-to-trough fraction") {
    // peak 100 → trough 60 (dd 0.4), later peak 120 → 90 (dd 0.25)
    val df = series(Seq(100L, 80L, 60L, 120L, 90L))
    val r = TechnicalOps.maxDrawdown(df, "v", "t", Seq("g")).head()
    r.getAs[Long]("n") shouldBe 5L
    r.getAs[Long]("peak") shouldBe 120L
    r.getAs[Double]("max_drawdown") shouldBe 0.4 +- 1e-9
    // monotone series: zero drawdown
    val up = TechnicalOps.maxDrawdown(series(Seq(1L, 2L, 3L)), "v", "t",
      Seq("g")).head()
    up.getAs[Double]("max_drawdown") shouldBe 0.0
  }

  test("bollinger matches the direct SMA ± 2σ on a full window") {
    val vs = Seq(10L, 12L, 14L, 16L, 18L)
    val r = TechnicalOps.bollinger(series(vs), "v", "t", Seq("g"),
      n = 5, k = 2.0)
      .orderBy("t").collect()
    // first 4 rows: incomplete window → nulls
    r.take(4).foreach(_.isNullAt(r.head.fieldIndex("bb_mid")) shouldBe true)
    val last = r.last
    val m = vs.map(_.toDouble).sum / 5
    val sd = math.sqrt(vs.map(v => math.pow(v - m, 2)).sum / 4)
    last.getAs[Double]("bb_mid") shouldBe m +- 1e-9
    last.getAs[Double]("bb_up") shouldBe (m + 2 * sd) +- 1e-9
    last.getAs[Double]("bb_lo") shouldBe (m - 2 * sd) +- 1e-9
    last.getAs[Double]("bb_pctb") shouldBe
      ((18.0 - (m - 2 * sd)) / (4 * sd)) +- 1e-9
  }

  test("rsi is 100 for monotone gains, 0 for monotone losses, null flat") {
    val up = TechnicalOps.rsi(series((1L to 30L)), "v", "t", Seq("g"))
      .orderBy("t")
    up.select(min("rsi"), max("rsi")).head() match {
      case row =>
        row.getDouble(0) shouldBe 100.0
        row.getDouble(1) shouldBe 100.0
    }
    val down = TechnicalOps.rsi(series((30L to 1L by -1L)), "v", "t",
      Seq("g")).agg(max("rsi")).head()
    down.getDouble(0) shouldBe 0.0
    val flat = TechnicalOps.rsi(series(Seq.fill(5)(7L)), "v", "t",
      Seq("g"))
    flat.filter(col("rsi").isNotNull).count() shouldBe 0L
    // alternating ±1 stays strictly inside (0, 100) once both a gain
    // and a loss have entered the recurrence (the seed diff is a pure
    // gain, so rsi = 100 there by construction)
    val alt = TechnicalOps.rsi(
      series(Seq.tabulate(20)(i => 10L + (i % 2))), "v", "t", Seq("g"))
      .filter(col("rsi").isNotNull && col("t") >= 2)
    alt.filter(col("rsi") <= 0 || col("rsi") >= 100).count() shouldBe 0L
  }

  test("macd: constant series gives zero lines; step responds fast>slow") {
    val c = TechnicalOps.macd(series(Seq.fill(10)(50L)), "v", "t", Seq("g"))
    c.agg(max(abs(col("macd"))), max(abs(col("macd_signal"))),
      max(abs(col("macd_hist")))).head() match {
      case row =>
        row.getDouble(0) shouldBe 0.0
        row.getDouble(1) shouldBe 0.0
        row.getDouble(2) shouldBe 0.0
    }
    // upward step: fast EMA exceeds slow EMA right after the jump
    val step = TechnicalOps.macd(
      series(Seq.fill(10)(10L) ++ Seq.fill(10)(100L)), "v", "t", Seq("g"))
      .orderBy("t").collect()
    step(10).getAs[Double]("macd") should be > 0.0
    step(19).getAs[Double]("macd") should be > 0.0
    // hist = macd - signal by construction
    step.foreach { r =>
      r.getAs[Double]("macd_hist") shouldBe
        (r.getAs[Double]("macd") - r.getAs[Double]("macd_signal")) +- 1e-12
    }
  }
}
