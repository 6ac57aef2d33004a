package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2 expressed as
  * runnable queries over the driver testdata; `oracleSql` carries the
  * DuckDB-equivalent SQL for the hash-match correctness gate.
  * Entries without oracle SQL (hash-based / iterative ops) get the
  * driver's rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (SURVEY §7.2 milestone
    * 0): revenue by customer nation — scan → filter → join ×3 →
    * agg → sort, with broadcast dims. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    QueriesCore.queries("q03_join_revenue_by_nation")(spark, d)
      .orderBy(col("revenue_c").desc)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.queries ++ QueriesWindow.queries ++
      QueriesText.queries ++ QueriesStats.queries ++
      QueriesExt.queries ++ QueriesPipeline.queries ++
      QueriesAnalytics.queries ++ QueriesTa.queries ++
      QueriesVersioning.queries

  def oracleSql: Map[String, String] =
    QueriesCore.oracle ++ QueriesWindow.oracle ++
      QueriesText.oracle ++ QueriesStats.oracle ++
      QueriesExt.oracle ++ QueriesPipeline.oracle ++
      QueriesAnalytics.oracle ++ QueriesTa.oracle ++
      QueriesVersioning.oracle
}
