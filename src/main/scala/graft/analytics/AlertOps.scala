package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Metric alerting over event streams, Spark-first.
  *
  * Reference: `/root/reference/src/analytics/{metrics,alerts}.rs` — the
  * reference collects engine telemetry (counters/gauges/histograms in a
  * driver ring buffer) and fires threshold alerts over it. Re-expressed
  * as data operators: the metric store is a grouped aggregate over the
  * event table, thresholds are a broadcast rule join, and baseline
  * drift is a per-key trailing window — each shape survives 100 TB
  * (one keyed shuffle; windows partitioned by metric key, never
  * global).
  */
object AlertOps {

  /** Threshold alerts: aggregate `metric` per (keyCols, time bucket),
    * broadcast-join per-key rules (`warn` / `crit` columns), and label
    * severity where the bucket's metric breaches them. `agg` picks the
    * aggregate ("sum" | "avg" | "count"); avg is computed as exact
    * integer sum / count so the value is engine-reproducible when
    * `metric` is integral.
    *
    * Plan: one hash aggregate (partial+final) on (keys, bucket) + a
    * broadcast hash join against the small rule table — rules are per
    * metric key, inherently tiny. */
  def thresholdAlerts(df: DataFrame, keyCols: Seq[String],
      bucket: Column, metric: Column, rules: DataFrame,
      agg: String = "avg"): DataFrame = {
    val value = agg match {
      case "sum"   => sum(metric).cast("long").cast("double")
      case "count" => count(lit(1)).cast("double")
      case "avg"   => sum(metric).cast("long").cast("double") /
        count(metric).cast("double")
      case other   => throw new IllegalArgumentException(
        s"thresholdAlerts: unsupported agg '$other'")
    }
    df.groupBy(keyCols.map(col) :+ bucket.as("bucket"): _*)
      .agg(value.as("metric"))
      .join(broadcast(rules), keyCols)
      .withColumn("severity",
        when(col("metric") >= col("crit"), lit("critical"))
          .when(col("metric") >= col("warn"), lit("warning")))
      .filter(col("severity").isNotNull)
      .select(keyCols.map(col) ++
        Seq(col("bucket"), col("metric"), col("severity")): _*)
  }

  /** Trailing-baseline drift alerts: for each (key, bucket) metric
    * point (an integral column, e.g. daily cents), compare against the
    * mean/std of the previous `lookback` buckets for the same key and
    * emit buckets whose |z| >= `zThresh` with at least `minBaseline`
    * trailing points. Sums and sums-of-squares run over exact
    * DECIMAL(38,0) in a per-key window (rows between -lookback and
    * -1), so the baseline is bit-reproducible; mean/var/z derive from
    * those integers with a fixed formula.
    *
    * The window partitions by the metric key — parallel across keys,
    * sequential only within one key's bucket history (bounded: one row
    * per bucket), so it scales to any number of keys. */
  def driftAlerts(metrics: DataFrame, keyCols: Seq[String],
      bucketCol: String, metricCol: String, lookback: Int = 7,
      zThresh: Double = 2.0, minBaseline: Int = 3): DataFrame = {
    require(lookback >= minBaseline && minBaseline >= 2,
      "driftAlerts needs lookback >= minBaseline >= 2")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(bucketCol))
      .rowsBetween(-lookback.toLong, -1L)
    val m = col(metricCol).cast(DecimalType(38, 0))
    // one projection -> Catalyst collapses the three frames into a
    // single Window operator (one sort, one pass)
    val base = metrics.select(col("*"),
      count(m).over(w).cast("long").as("__n"),
      sum(m).over(w).as("__s"),
      sum(m * m).over(w).as("__s2"))
    val nD = col("__n").cast("double")
    val mean = col("__s").cast("double") / nD
    val variance = (col("__s2").cast("double") -
      col("__s").cast("double") * col("__s").cast("double") / nD) /
      (nD - 1.0)
    base
      .withColumn("baseline_mean", mean)
      .withColumn("__var", variance)
      .filter(col("__n") >= minBaseline && col("__var") > 0.0)
      .withColumn("z",
        (col(metricCol).cast("double") - col("baseline_mean")) /
          sqrt(col("__var")))
      .filter(abs(col("z")) >= zThresh)
      .select(keyCols.map(col) ++ Seq(col(bucketCol), col(metricCol),
        round(col("baseline_mean"), 6).as("baseline_mean"),
        round(col("z"), 6).as("z")): _*)
  }
}
