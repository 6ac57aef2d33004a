package graft

import org.apache.spark.sql.functions._
import graft.timeseries.TimeSeriesOps

/** Kalman local-level filter/smoother: closed-form and reduction
  * properties that do NOT replay the recurrence (the q343 oracle does
  * that bit-exactly) — these pin the MODEL semantics instead.
  */
class KalmanSpec extends SparkSpecBase {
  import spark.implicits._

  private def series(n: Int, f: Int => Double) =
    (1 to n).map(i => ("k", i.toLong, f(i))).toDF("g", "o", "v")

  test("filter error variance converges to the Riccati fixpoint") {
    val q = 25.0; val r = 400.0
    // P* solves P = (P+q)r/(P+q+r)  =>  P² + qP − qr = 0
    val pStar = (-q + math.sqrt(q * q + 4 * q * r)) / 2
    val out = TimeSeriesOps.kalmanLocalLevel(
      series(200, i => math.sin(i * 0.3) * 50 + 100),
      "v", "o", Seq("g"), q, r, p0 = 1000.0)
      .orderBy(desc("o")).select("kf_var").as[Double].head()
    approx(out, pStar, 1e-9)
  }

  test("q=0 with p0=r reduces to the cumulative mean") {
    // with no process noise and the post-init variance set to r
    // (x₁=y₁, P₁=r) the gain is exactly K_t = 1/t and the filter is
    // the recursive sample mean — a classic identity
    val xs = Seq(3.0, 7.0, 1.0, 9.0, 5.0, 2.0)
    val out = TimeSeriesOps.kalmanLocalLevel(
      xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
        .toDF("g", "o", "v"),
      "v", "o", Seq("g"), q = 0.0, r = 1.0, p0 = 1.0)
      .orderBy("o").select("kf_level").as[Double].collect()
    val cummean = xs.scanLeft((0.0, 0)) { case ((s, n), v) =>
      (s + v, n + 1) }.tail.map { case (s, n) => s / n }
    out.zip(cummean).foreach { case (a, b) => approx(a, b, 1e-9) }
  }

  test("smoother equals filter on the last row and on constants") {
    val cst = TimeSeriesOps.kalmanSmoothLocalLevel(
      series(30, _ => 42.0), "v", "o", Seq("g"),
      q = 1.0, r = 4.0, p0 = 10.0)
      .select("kf_smooth").as[Double].collect()
    cst.foreach(approx(_, 42.0, 1e-9))
    val df = TimeSeriesOps.kalmanSmoothLocalLevel(
      series(40, i => i * 2.0 + math.cos(i.toDouble)),
      "v", "o", Seq("g"), q = 25.0, r = 400.0, p0 = 1000.0)
      .orderBy(desc("o"))
      .select("kf_level", "kf_smooth").as[(Double, Double)].head()
    approx(df._1, df._2, 0.0)
  }

  test("smoother tracks a level shift with less lag than the filter") {
    val step = TimeSeriesOps.kalmanSmoothLocalLevel(
      series(60, i => if (i <= 30) 0.0 else 100.0),
      "v", "o", Seq("g"), q = 5.0, r = 50.0, p0 = 100.0)
      .filter(col("o") === 31L)
      .select("kf_level", "kf_smooth").as[(Double, Double)].head()
    // right after the jump the causal filter lags; the smoother has
    // seen the future and sits closer to the new level
    assert(step._2 > step._1)
  }

  test("per-key isolation and 1:1 row preservation") {
    val two = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 1L, 5.0))
      .toDF("g", "o", "v")
    val out = TimeSeriesOps.kalmanLocalLevel(two, "v", "o", Seq("g"),
      q = 1.0, r = 1.0, p0 = 100.0)
    out.count() shouldBe 3
    out.filter(col("g") === "b").select("kf_level")
      .as[Double].head() shouldBe 5.0
  }
}
