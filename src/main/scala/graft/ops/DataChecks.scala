package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks producing a violations report —
  * the expectation-suite layer a 100 TB ingest pipeline runs before
  * publishing a table (pandrs has no dedicated module; this is the
  * standard great-expectations-style formulation expressed
  * Spark-first).
  *
  * Scale notes: all row predicates evaluate in ONE pass over the
  * table (a single hash-aggregate of conditional counts — no
  * per-check scans); uniqueness is one keyed aggregate; referential
  * integrity is one left-anti join (broadcast when the parent is a
  * dim). Nothing collects rows to the driver. */
object DataChecks {

  /** Evaluate named row-level predicates in a single scan. Returns
    * one row per check: (check, n_rows, n_violations, violation_ppm)
    * with ppm = floor(violations · 1e6 / rows) so the rate is exact
    * integer arithmetic, engine-independent. A NULL predicate result
    * counts as a violation (the expectation is not met). */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)]):
      DataFrame = {
    require(checks.nonEmpty, "rowChecks needs at least one check")
    val aggs = count(lit(1)).as("__n__") +:
      checks.map { case (name, pred) =>
        sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
          .as(s"__v_$name")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // `div` (integer floor division on longs) matches the oracle's
    // `//` exactly; double .divide then cast truncation can differ
    // by 1 when the true ratio sits one ulp under an integer
    checks.map { case (name, _) =>
      one.select(lit(name).as("check"), col("__n__").as("n_rows"),
        col(s"__v_$name").as("n_violations"),
        expr(s"`__v_$name` * 1000000 div `__n__`")
          .as("violation_ppm"))
    }.reduce(_ unionByName _)
  }

  /** Uniqueness check on a key tuple: a violation is every row beyond
    * the first of a duplicated key. Same report row shape as
    * [[rowChecks]]. */
  def uniqueCheck(df: DataFrame, cols: Seq[String], name: String):
      DataFrame = {
    val agg = df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("__c__"))
      .agg(sum(col("__c__")).as("__n__"),
        sum(col("__c__") - 1L).as("__v__"))
    agg.select(lit(name).as("check"), col("__n__").as("n_rows"),
      col("__v__").as("n_violations"),
      expr("`__v__` * 1000000 div `__n__`").as("violation_ppm"))
  }

  /** Key-skew heavy hitters — the pre-shuffle audit that says
    * whether a join/groupBy on `keyCols` will hot-spot: per-key
    * counts in ONE hash aggregate, top-`topK` keys by load
    * (deterministic tie-break on the key) with exact ppm load
    * shares. The classic 100 TB failure is a skewed key discovered
    * six hours into the job; this makes it a 30-second query. Plans
    * as TakeOrdered — no global sort materializes. */
  def skewHeavyHitters(df: DataFrame, keyCols: Seq[String],
      topK: Int = 20): DataFrame = {
    require(keyCols.nonEmpty && topK >= 1,
      "skewHeavyHitters needs keys and topK >= 1")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("__t__"))
    counts
      .orderBy(col("n").desc +: keyCols.map(col(_).asc): _*)
      .limit(topK)
      .crossJoin(broadcast(total))
      .select(keyCols.map(col) ++ Seq(col("n"),
        expr("n * 1000000 div __t__").as("share_ppm")): _*)
  }

  /** One-row skew summary over the same per-key counts: row/key
    * totals, the heaviest key's load, max/mean ratio and top-1 share
    * in exact ppm. `skew_ratio` ≈ 1 is uniform; ratios in the
    * hundreds mean the shuffle needs salting or AQE skew handling. */
  def skewSummary(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .agg(sum("n").as("n_rows"), count(lit(1)).as("n_keys"),
        max("n").as("max_key_rows"))
      .select(col("n_rows"), col("n_keys"), col("max_key_rows"),
        (col("max_key_rows").cast("double") * col("n_keys") /
          col("n_rows")).as("skew_ratio"),
        expr("max_key_rows * 1000000 div n_rows").as("top1_ppm"))

  /** Referential-integrity check: child rows whose `childKey` has no
    * match in `parent.parentKey` are violations (NULL child keys are
    * violations too — they reference nothing). One left-anti join. */
  def refIntegrityCheck(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame = {
    val totals = child.agg(count(lit(1)).as("__n__"))
    val orphans = child
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("__v__"))
    totals.crossJoin(orphans)
      .select(lit(name).as("check"), col("__n__").as("n_rows"),
        col("__v__").as("n_violations"),
        expr("`__v__` * 1000000 div `__n__`").as("violation_ppm"))
  }
}
