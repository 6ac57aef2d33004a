package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** IO round-trips (§2.1) and physical-plan properties that carry the
  * 100 TB story: predicate pushdown, column pruning, broadcast joins.
  * Plan assertions keep refactors honest — if a change stops filters
  * reaching the parquet scan, these fail. */
class SourcesAndPlanSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val df3 = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
    .toDF("id", "s", "v")

  test("csv round-trip with header and inferred schema") {
    val dir = tmp("graft_csv")
    Sources.writeCsv(df3, dir)
    val back = Sources.readCsv(spark, dir)
    back.columns shouldBe Array("id", "s", "v")
    back.count() shouldBe 3
    back.schema("id").dataType.typeName shouldBe "integer" // inferred
    back.filter($"s" === "b").select("v").as[Double].head() shouldBe 2.5
  }

  test("json-records round-trip") {
    val dir = tmp("graft_json")
    Sources.writeJsonRecords(df3, dir)
    val back = Sources.readJsonRecords(spark, dir)
    back.count() shouldBe 3
    back.filter($"id" === 3).select("s").as[String].head() shouldBe "c"
  }

  test("json-columns orientation round-trip") {
    val dir = tmp("graft_json_cols")
    val df = Seq((0L, 1.5, "a"), (1L, 2.5, "b"), (2L, 3.5, "c"))
      .toDF("idx", "x", "s")
    Sources.writeJsonColumns(df, dir, "idx", Seq("x", "s"))
    val back = Sources.readJsonColumns(spark, dir)
      .orderBy("__idx__")
    back.columns.sorted shouldBe Array("__idx__", "s", "x")
    back.count() shouldBe 3
    back.filter($"__idx__" === 1).select("x").as[Double].head() shouldBe 2.5
    back.filter($"__idx__" === 2).select("s").as[String].head() shouldBe "c"
  }

  test("parquet round-trip with compression codecs") {
    for (codec <- Seq("snappy", "gzip", "zstd")) {
      val dir = tmp(s"graft_pq_$codec")
      Sources.writeParquet(df3, dir, codec)
      Sources.readParquet(spark, dir).count() shouldBe 3
    }
  }

  test("parquetStats computes row count and column min/max/nulls") {
    val dir = tmp("graft_pqstats")
    Sources.writeParquet(df3, dir)
    val r = Sources.parquetStats(spark, dir, Seq("id", "v")).head()
    r.getAs[Long]("row_count") shouldBe 3L
    r.getAs[Long]("id_min") shouldBe 1L
    r.getAs[Long]("id_max") shouldBe 3L
    r.getAs[Long]("id_nulls") shouldBe 0L
  }

  test("filters and projections are pushed to the parquet scan") {
    val plan = queries.Q.t(spark, "/root/testdata/sf0.001", "lineitem")
      .filter($"l_quantity" < 10 && $"l_shipdate" > lit("1995-06-01"))
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan should include("LessThan(l_quantity,10.0)")
    // column pruning: scan schema limited to referenced columns
    plan should include("l_orderkey")
    (plan should not).include("l_extendedprice")
  }

  test("bucketed tables join without a shuffle exchange") {
    val a = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 3.0)).toDF("k", "vb")
    Sources.writeBucketed(a, "graft_bucket_a", Seq("k"), 8)
    Sources.writeBucketed(b, "graft_bucket_b", Seq("k"), 8)
    val joined = spark.table("graft_bucket_a")
      .join(spark.table("graft_bucket_b"), "k")
    // disable broadcast so the co-located path is what gets planned
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      (plan should not).include("Exchange hashpartitioning")
      joined.count() shouldBe 1000
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("small dimension joins plan as broadcast") {
    val plan = queries.QueriesCore
      .queries("q03_join_revenue_by_nation")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    import graft.ops.PandasOps._
    val plan = queries.Q.t(spark, "/root/testdata/sf0.001", "orders")
      .nlargest(10, "o_totalprice", "o_orderkey")
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
  }
}
