package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Bucketed tables are the repeated-join co-location primitive:
  * writing both sides bucketed on the join key must make the join
  * (and a groupBy on the key) plan WITHOUT a ShuffleExchange. These
  * specs assert that mechanically from the executed plan. */
class BucketingSpec extends SparkSpecBase {
  import spark.implicits._

  private def shuffles(df: DataFrame): Int = {
    df.collect() // finalize AQE
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeExec => 1
        case _ => 0
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case other => other.children ++
          other.subqueries.map(_.asInstanceOf[
            org.apache.spark.sql.execution.SparkPlan])
      }
      self + kids.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  test("bucketed join and aggregation plan with zero shuffles; " +
    "results equal the unbucketed path") {
    val dir = Files.createTempDirectory("graft_buckets").toString
    val a = (1 to 1000).map(i => (i.toLong % 97, i.toLong))
      .toDF("k", "va")
    val b = (1 to 800).map(i => (i.toLong % 97, i.toLong * 2))
      .toDF("k", "vb")
    Sources.writeBucketed(a, "bspec_a", s"$dir/a", Seq("k"), 8,
      sortCols = Seq("k"))
    Sources.writeBucketed(b, "bspec_b", s"$dir/b", Seq("k"), 8,
      sortCols = Seq("k"))
    val ta = spark.table("bspec_a")
    val tb = spark.table("bspec_b")

    val joined = ta.join(tb, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
    shuffles(joined) shouldBe 0

    val agg = ta.groupBy("k").agg(sum("va").as("s"))
    shuffles(agg) shouldBe 0

    // correctness: bucketed results == raw results
    val got = joined.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq
    val want = a.join(b, Seq("k")).groupBy("k")
      .agg(count(lit(1)).as("n")).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    got shouldBe want
  }

  test("mismatched bucket counts still answer correctly") {
    val dir = Files.createTempDirectory("graft_buckets2").toString
    val a = (1 to 200).map(i => (i.toLong % 13, i.toLong)).toDF("k", "v")
    Sources.writeBucketed(a, "bspec_c", s"$dir/c", Seq("k"), 4)
    Sources.writeBucketed(a, "bspec_d", s"$dir/d", Seq("k"), 6)
    val j = spark.table("bspec_c").join(spark.table("bspec_d"), Seq("k"))
    j.count() shouldBe a.as("x").join(a.as("y"),
      col("x.k") === col("y.k")).count()
  }
}
