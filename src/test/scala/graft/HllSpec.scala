package graft

import org.apache.spark.sql.functions._
import graft.llm.PipelineOps

/** HyperLogLog: exact rank derivation (integer bit-length, no
  * floating log2), shard mergeability by register max, both estimate
  * branches (linear counting + raw), and accuracy within the
  * published 1.04/sqrt(m) envelope. */
class HllSpec extends SparkSpecBase {
  import spark.implicits._

  test("rho is the exact leading-zero rank of the 42 low bits") {
    // reconstruct rho independently from the md5 hex string in Scala
    // and compare against the sketch's register table
    val vals = (1 to 500).map(i => s"v$i").toDF("v")
    val sk = PipelineOps.hllSketch(vals, "v", p = 6)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expect = scala.collection.mutable.Map[Long, Int]()
    (1 to 500).foreach { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"v$i#hll".getBytes("UTF-8"))
        .take(6).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex, 16)
      val reg = h >>> 42
      val w = h & ((1L << 42) - 1)
      val rho =
        if (w == 0) 43 else 42 - (63 - java.lang.Long.numberOfLeadingZeros(w))
      expect(reg) = math.max(expect.getOrElse(reg, 0), rho)
    }
    sk shouldBe expect.toMap
  }

  test("sketches merge by register max (shard-parallel build)") {
    val all = (1 to 3000).map(i => s"doc$i").toDF("v")
    val a = (1 to 1700).map(i => s"doc$i").toDF("v")
    val b = (1500 to 3000).map(i => s"doc$i").toDF("v") // overlap ok
    val merged = PipelineOps.hllMerge(
      PipelineOps.hllSketch(a, "v", 6), PipelineOps.hllSketch(b, "v", 6))
    val whole = PipelineOps.hllSketch(all, "v", 6)
    merged.exceptAll(whole).count() shouldBe 0
    whole.exceptAll(merged).count() shouldBe 0
  }

  test("small cardinalities take the linear-counting branch exactly") {
    val vals = (1 to 8).map(i => s"x$i").toDF("v")
    val sk = PipelineOps.hllSketch(vals, "v", p = 6)
    val row = PipelineOps.hllEstimate(sk, p = 6)
      .select("v_zero", "hll_estimate").head()
    val vZero = row.getLong(0)
    vZero should be >= 56L // at most 8 registers touched
    // linear counting m·ln(m/V), same formula re-derived here
    val expected = 64.0 * math.log(64.0 / vZero)
    row.getDouble(1) shouldBe BigDecimal(expected)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("estimate is within the 1.04/sqrt(m) envelope at n >> m") {
    val n = 20000
    val vals = (1 to n).map(i => s"item$i").toDF("v")
    val est = PipelineOps.hllEstimate(
      PipelineOps.hllSketch(vals, "v", p = 10), p = 10)
      .select("hll_estimate").head().getDouble(0)
    // 1.04/sqrt(1024) ≈ 3.25%; allow 4 sigma
    math.abs(est - n) / n should be < 0.13
  }

  test("duplicates do not move the sketch (set semantics)") {
    val once = (1 to 400).map(i => s"k$i").toDF("v")
    val thrice = (1 to 1200).map(i => s"k${1 + (i - 1) % 400}").toDF("v")
    val s1 = PipelineOps.hllSketch(once, "v", 6)
    val s3 = PipelineOps.hllSketch(thrice, "v", 6)
    s1.exceptAll(s3).count() shouldBe 0
    s3.exceptAll(s1).count() shouldBe 0
  }
}
