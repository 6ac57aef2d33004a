package graft

import org.apache.spark.sql.functions._
import graft.window.RollingOps

/** rolling skew/kurt vs pandas-computed reference values
  * (pd.Series([...]).rolling(5).skew()/.kurt()). */
class RollingSkewKurtSpec extends SparkSpecBase {
  import spark.implicits._

  private val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L, 5L)
  private def df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    .toDF("i", "v")

  test("rollingSkew matches pandas rolling(5).skew()") {
    val got = RollingOps.rollingSkew(df, "v", 5, Seq("i"))
      .orderBy("i").select("rolling_skew")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    got.take(4).foreach(_ shouldBe None)
    val exp = Seq(0.052407843, 0.822303667, 0.933450961, 0.299487953,
      0.196042788, 0.608580619, -0.518420528)
    got.drop(4).zip(exp).foreach { case (g, e) =>
      g.get shouldBe (e +- 1e-8) }
  }

  test("rollingKurt matches pandas rolling(5).kurt()") {
    val got = RollingOps.rollingKurt(df, "v", 5, Seq("i"))
      .orderBy("i").select("rolling_kurt")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    got.take(4).foreach(_ shouldBe None)
    val exp = Seq(-2.32421875, 0.140495868, 0.762036348, -1.02083137,
      1.504157218, -0.133333333, -1.687242798)
    got.drop(4).zip(exp).foreach { case (g, e) =>
      g.get shouldBe (e +- 1e-8) }
  }

  test("zero-variance window yields null, and partitions are independent") {
    val d2 = Seq((1L, 0L, 7L), (1L, 1L, 7L), (1L, 2L, 7L),
      (2L, 0L, 1L), (2L, 1L, 2L), (2L, 2L, 4L))
      .toDF("g", "i", "v")
    val out = RollingOps.rollingSkew(d2, "v", 3, Seq("i"), Seq("g"))
      .filter(col("i") === 2)
    out.filter(col("g") === 1).select("rolling_skew")
      .collect().head.isNullAt(0) shouldBe true
    out.filter(col("g") === 2).select("rolling_skew")
      .collect().head.isNullAt(0) shouldBe false
  }
}
