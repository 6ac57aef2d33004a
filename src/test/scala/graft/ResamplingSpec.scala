package graft

import org.apache.spark.sql.functions._
import graft.stats.StatsOps

/** Deterministic resampling inference: md5-rank permutation test and
  * delete-one-group jackknife. */
class ResamplingSpec extends SparkSpecBase {
  import spark.implicits._

  test("perfect separation drives p to the add-one floor 1/(R+1)") {
    val df = ((1 to 100).map(i => (i.toLong, 1000L, "a")) ++
      (101 to 200).map(i => (i.toLong, 0L, "b")))
      .toDF("id", "v", "g")
    val r = StatsOps.permutationTestMeanDiff(df, "v", "g", "a", "id",
      reps = 199).head()
    r.getAs[Double]("obs_diff") shouldBe 1000.0
    // no hash permutation reproduces the exact original split
    r.getAs[Long]("n_ge") shouldBe 0L
    r.getAs[Double]("p_value") shouldBe 0.005
  }

  test("identical distributions give p = 1 (every |d_r| >= 0)") {
    val df = ((1 to 50).map(i => (i.toLong, 7L, "a")) ++
      (51 to 100).map(i => (i.toLong, 7L, "b")))
      .toDF("id", "v", "g")
    val r = StatsOps.permutationTestMeanDiff(df, "v", "g", "a", "id",
      reps = 99).head()
    r.getAs[Double]("obs_diff") shouldBe 0.0
    r.getAs[Long]("n_ge") shouldBe 99L
    r.getAs[Double]("p_value") shouldBe 1.0
  }

  test("the permutation set is a pure function of ids and reps") {
    val df = (1 to 60).map(i =>
      (i.toLong, (i * 37 % 11).toLong, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "v", "g")
    val r1 = StatsOps.permutationTestMeanDiff(df, "v", "g", "a", "id",
      reps = 49).head()
    val r2 = StatsOps.permutationTestMeanDiff(df, "v", "g", "a", "id",
      reps = 49).head()
    r1 shouldBe r2
  }

  test("jackknife matches a direct pseudo-value computation") {
    val df = Seq(
      ("x", 10L), ("x", 14L), ("y", 20L), ("y", 22L), ("z", 3L))
      .toDF("g", "v")
    val r = StatsOps.jackknifeMeanByGroup(df, "v", "g").head()
    r.getAs[Long]("g_count") shouldBe 3L
    // totals: s=69, n=5; theta_x=(69-24)/3=15, theta_y=(69-42)/3=9,
    // theta_z=(69-3)/4=16.5; mean=13.5; ss-dev=(1.5²+4.5²+3²)=31.5
    // se = sqrt(2/3 * 31.5) = sqrt(21)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    r.getAs[Double]("theta_bar") shouldBe 13.5
    r.getAs[Double]("se_jack") shouldBe r6(math.sqrt(21.0))
  }
}
