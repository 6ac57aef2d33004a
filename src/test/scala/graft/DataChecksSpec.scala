package graft

import org.apache.spark.sql.functions._
import graft.ops.DataChecks

class DataChecksSpec extends SparkSpecBase {
  import spark.implicits._

  test("rowChecks counts violations per named predicate in one scan") {
    val df = Seq(
      (1, 10.0), (2, 20.0), (3, -5.0), (4, 200.0)
    ).toDF("id", "v")
    val rep = DataChecks.rowChecks(df, Seq(
        "v_pos" -> (col("v") > 0),
        "v_lt_100" -> (col("v") < 100)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rep("v_pos") shouldBe ((4L, 1L, 250000L))
    rep("v_lt_100") shouldBe ((4L, 1L, 250000L))
  }

  test("rowChecks: a NULL predicate result is a violation") {
    val df = Seq[(Int, Option[Double])](
      (1, Some(1.0)), (2, None), (3, Some(3.0))
    ).toDF("id", "v")
    val rep = DataChecks.rowChecks(df, Seq("v_pos" -> (col("v") > 0)))
      .head()
    rep.getLong(2) shouldBe 1L // the NULL row fails the expectation
  }

  test("uniqueCheck: violations = rows beyond the first per key") {
    val df = Seq("a", "a", "a", "b", "c", "c").toDF("k")
    val rep = DataChecks.uniqueCheck(df, Seq("k"), "k_unique").head()
    rep.getString(0) shouldBe "k_unique"
    rep.getLong(1) shouldBe 6L
    rep.getLong(2) shouldBe 3L // 2 extra 'a' + 1 extra 'c'
    rep.getLong(3) shouldBe 500000L
  }

  test("refIntegrityCheck: orphans and NULL keys are violations") {
    val child = Seq(Some(1), Some(2), Some(9), None).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    val rep = DataChecks.refIntegrityCheck(
      child, "fk", parent, "pk", "fk_ok").head()
    rep.getLong(1) shouldBe 4L
    rep.getLong(2) shouldBe 2L // 9 is orphan, NULL references nothing
    rep.getLong(3) shouldBe 500000L
  }
}
