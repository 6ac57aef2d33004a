package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.PandasOps._
import graft.window.RollingOps
import Q._

/** Window functions (SQL family §2.5b + pandas moving windows §2.5a)
  * and missing-data / reshape surface (§2.9).
  */
object QueriesWindow {

  val queries: Map[String, QueryFn] = Map(

    // §2.5b ranking family
    "q25_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc)
      val wRn = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rnk", rank().over(w).cast("long"))
        .withColumn("drnk", dense_rank().over(w).cast("long"))
        .withColumn("rn", row_number().over(wRn).cast("long"))
        .withColumn("prnk", round(percent_rank().over(w), 6))
        .filter(col("rn") <= 5)
        .select("o_orderpriority", "o_orderkey", "o_totalprice",
          "rnk", "drnk", "rn", "prnk")
    }),

    // §2.5b lag/lead + diff/pct_change (§2.9)
    "q26_window_lag" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
        .withColumn("diff", col("o_totalprice") - col("prev_price"))
        .select("o_custkey", "o_orderkey", "o_totalprice",
          "prev_price", "next_price", "diff")
    }),

    // §2.5a rolling(7) mean via exact scaled ints
    "q27_window_rolling" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(-6, 0)
      t(s, d, "events")
        .withColumn("roll_sum_c", sum(cents(col("value"))).over(w))
        .withColumn("roll_n", count(lit(1)).over(w).cast("long"))
        .withColumn("roll_avg_c",
          round(dbl(col("roll_sum_c")) / dbl(col("roll_n")), 6))
        .select("event_id", "user_id", "roll_sum_c", "roll_n",
          "roll_avg_c")
    }),

    // §2.5a pandas rolling(20).corr + .cov between value cents and
    // user id, per event type (pairwise window statistics)
    // Hampel robust outlier filter: centered-7 window median ± 3
    // scaled MADs per user series
    "q298_hampel" -> ((s, d) =>
      graft.window.RollingOps.hampel(
        t(s, d, "events").withColumn("vc", cents(col("value"))),
        "vc", n = 7, orderCols = Seq("event_id"),
        partitionCols = Seq("user_id"), k = 3.0)
        .select("event_id", "user_id", "hampel_outlier",
          "hampel_filtered", "hampel_median", "hampel_mad")),

    // pandas expanding().nunique(): distinct event types seen so far
    // per user (first-occurrence flag + running sum)
    "q291_expanding_nunique" -> ((s, d) =>
      graft.ops.PandasOps.expandingNunique(
        t(s, d, "events"), "event_type", Seq("event_id"),
        Seq("user_id"))
        .select("event_id", "user_id", "expanding_nunique")),

    // statsmodels RollingOLS: trailing-20 slope/intercept/r² of
    // value-cents on user_id per event type (q136's frame)
    "q288_rolling_ols" -> ((s, d) =>
      graft.window.RollingOps.rollingOls(
        t(s, d, "events").withColumn("vc", cents(col("value"))),
        "user_id", "vc", n = 20, orderCols = Seq("ts", "event_id"),
        partitionCols = Seq("event_type"))
        .select("event_id", "event_type", "roll_slope",
          "roll_intercept", "roll_r2")),

    "q136_rolling_corr" -> ((s, d) => {
      val base = t(s, d, "events")
        .withColumn("vc", cents(col("value")))
      val c1 = graft.window.RollingOps.rollingCorr(base, "vc", "user_id",
        n = 20, orderCols = Seq("ts", "event_id"),
        partitionCols = Seq("event_type"))
      graft.window.RollingOps.rollingCov(c1, "vc", "user_id",
          n = 20, orderCols = Seq("ts", "event_id"),
          partitionCols = Seq("event_type"))
        .select(col("event_id"), col("event_type"),
          round(col("rolling_corr"), 6).as("rolling_corr"),
          round(col("rolling_cov"), 6).as("rolling_cov"))
    }),

    // §2.5a pandas rolling(15).median + .quantile(0.25) over cents,
    // per event type
    "q137_rolling_quantile" -> ((s, d) => {
      val base = t(s, d, "events")
        .withColumn("vc", cents(col("value")))
      val m = graft.window.RollingOps.rollingMedian(base, "vc", n = 15,
        orderCols = Seq("ts", "event_id"),
        partitionCols = Seq("event_type"))
      graft.window.RollingOps.rollingQuantile(m, "vc", n = 15, q = 0.25,
          orderCols = Seq("ts", "event_id"),
          partitionCols = Seq("event_type"), outName = "rolling_q25")
        .select(col("event_id"), col("event_type"),
          round(col("rolling_median"), 6).as("rolling_median"),
          round(col("rolling_q25"), 6).as("rolling_q25"))
    }),

    // §2.5a pandas expanding().quantile(0.25) over cents per
    // (event type, day) — the day key bounds the O(prefix) buffer the
    // exact expanding quantile inherently carries (see RollingOps
    // scaladoc), so the gate stays quadratic-in-hundreds at any sf
    "q160_expanding_quantile" -> ((s, d) =>
      graft.window.RollingOps.expandingQuantile(
        t(s, d, "events").withColumn("vc", cents(col("value")))
          .withColumn("day", date_trunc("day", col("ts"))),
        "vc", 0.25, Seq("ts", "event_id"), Seq("event_type", "day"))
        .select(col("event_id"), col("event_type"),
          round(col("expanding_q"), 6).as("eq"))),

    // §2.5a time-based rolling: trailing 1h range frame
    "q28_window_range_time" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").cast("long"))
        .rangeBetween(-3600, 0)
      t(s, d, "events")
        .withColumn("trail_1h_sum_c", sum(cents(col("value"))).over(w))
        .withColumn("trail_1h_n", count(lit(1)).over(w).cast("long"))
        .select("event_id", "user_id", "trail_1h_sum_c", "trail_1h_n")
    }),

    // §2.5b first/last/nth value over full frame
    "q29_first_last_nth" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val full = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("highest", first(col("o_totalprice")).over(full))
        .withColumn("lowest", last(col("o_totalprice")).over(full))
        .withColumn("second", nth_value(col("o_totalprice"), 2).over(full))
        .filter(col("rn") === 1)
        .select("o_orderpriority", "highest", "lowest", "second")
    }),

    // §2.9 qcut via ntile over deterministic total order
    "q30_ntile_qcut" -> ((s, d) => {
      val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("bucket", ntile(4).over(w).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min(cents(col("o_totalprice"))).as("min_c"),
          max(cents(col("o_totalprice"))).as("max_c"))
    }),

    // §2.9 ffill: forward-fill nullified values
    "q31_ffill" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("v", when(col("value") >= 50, cents(col("value"))))
        .ffill(Seq("v"), "event_id", Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("v").as("filled_c"))),

    // §2.9 drop_duplicates keep=first (by event_id)
    "q33_dropdup" -> ((s, d) =>
      t(s, d, "events")
        .dropDuplicatesKeep(Seq("user_id", "event_type"), "event_id")
        .select("user_id", "event_type", "event_id")),

    // §2.9 melt / wide-to-long over per-group sums
    "q32_melt" -> ((s, d) => {
      val wide = t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(sum("l_quantity").as("qty"),
          dbl(sum(cents(col("l_extendedprice")))).as("base_c"))
      wide.melt(Seq("l_returnflag"), Seq("qty", "base_c"))
    }),

    // §2.5a rolling with min_periods semantics (null until 5 rows)
    "q58_rolling_minperiods" -> ((s, d) =>
      RollingOps.rolling(
        t(s, d, "lineitem"), "l_quantity", 5,
        c => sum(c), Seq("l_linenumber", "l_quantity"), Seq("l_orderkey"),
        minPeriods = 5, outName = "roll5_sum")
        .select(col("l_orderkey"), col("l_linenumber").cast("long"),
          col("roll5_sum"))),

    // §2.9 cut: fixed-width histogram
    "q64_cut" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("bin",
          least(floor(col("o_totalprice") / 50000), lit(5)).cast("long"))
        .groupBy("bin").agg(count(lit(1)).as("n"))),

    // §2.5a expanding mean (exact ints)
    "q65_expanding" -> ((s, d) => {
      val w = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "lineitem")
        .withColumn("exp_sum", sum("l_quantity").over(w))
        .withColumn("exp_n", count(lit(1)).over(w).cast("long"))
        .withColumn("exp_mean",
          round(dbl(col("exp_sum")) / dbl(col("exp_n")), 6))
        .select(col("l_orderkey"), col("l_linenumber").cast("long"),
          col("exp_sum"), col("exp_n"), col("exp_mean"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q25_window_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  rnk, drnk, rn, prnk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS BIGINT) AS rnk,
        |    CAST(dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS BIGINT) AS drnk,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
        |    round(percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC), 6) AS prnk
        |  FROM orders) WHERE rn <= 5""".stripMargin,

    "q26_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  o_totalprice - lag(o_totalprice, 1) OVER w AS diff
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "q160_expanding_quantile" ->
      """WITH e AS (
        |  SELECT event_id, event_type, ts,
        |    date_trunc('day', ts) AS day,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS vc
        |  FROM events)
        |SELECT event_id, event_type,
        |  CASE WHEN count(vc) OVER w >= 1
        |    THEN round(quantile_cont(vc, 0.25) OVER w, 6)
        |  END AS eq
        |FROM e
        |WINDOW w AS (PARTITION BY event_type, day
        |  ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "q137_rolling_quantile" ->
      """WITH e AS (
        |  SELECT event_id, event_type, ts,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS vc
        |  FROM events)
        |SELECT event_id, event_type,
        |  CASE WHEN count(vc) OVER w >= 15
        |    THEN round(quantile_cont(vc, 0.5) OVER w, 6)
        |  END AS rolling_median,
        |  CASE WHEN count(vc) OVER w >= 15
        |    THEN round(quantile_cont(vc, 0.25) OVER w, 6)
        |  END AS rolling_q25
        |FROM e
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |  ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q298_hampel" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS v
        |  FROM events),
        |a AS (
        |  SELECT event_id, user_id, v,
        |    list_sort(list_filter(
        |      list(v) OVER (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING),
        |      x -> x IS NOT NULL)) AS arr
        |  FROM e),
        |m AS (
        |  SELECT event_id, user_id, v, arr,
        |    arr[CAST(floor((len(arr) - 1) * 0.5) AS INT) + 1] +
        |      ((len(arr) - 1) * 0.5 -
        |        CAST(CAST(floor((len(arr) - 1) * 0.5) AS INT) AS DOUBLE)) *
        |      (arr[least(CAST(floor((len(arr) - 1) * 0.5) AS INT) + 2,
        |          len(arr))] -
        |       arr[CAST(floor((len(arr) - 1) * 0.5) AS INT) + 1]) AS med
        |  FROM a),
        |d AS (
        |  SELECT event_id, user_id, v, med,
        |    list_sort(list_transform(arr, x -> abs(x - med))) AS dar
        |  FROM m),
        |m2 AS (
        |  SELECT event_id, user_id, v, med,
        |    dar[CAST(floor((len(dar) - 1) * 0.5) AS INT) + 1] +
        |      ((len(dar) - 1) * 0.5 -
        |        CAST(CAST(floor((len(dar) - 1) * 0.5) AS INT) AS DOUBLE)) *
        |      (dar[least(CAST(floor((len(dar) - 1) * 0.5) AS INT) + 2,
        |          len(dar))] -
        |       dar[CAST(floor((len(dar) - 1) * 0.5) AS INT) + 1]) AS mad
        |  FROM d),
        |f AS (
        |  SELECT event_id, user_id, v, med, mad,
        |    v IS NOT NULL AND abs(v - med) > 3.0 * 1.4826 * mad
        |      AS hampel_outlier
        |  FROM m2)
        |SELECT event_id, user_id, hampel_outlier,
        |  round(CASE WHEN hampel_outlier THEN med ELSE v END, 6)
        |    AS hampel_filtered,
        |  round(med, 6) AS hampel_median, round(mad, 6) AS hampel_mad
        |FROM f""".stripMargin,

    "q291_expanding_nunique" ->
      """WITH f AS (
        |  SELECT event_id, user_id, event_type,
        |    CASE WHEN event_type IS NOT NULL AND
        |      row_number() OVER (PARTITION BY user_id, event_type
        |        ORDER BY event_id) = 1
        |      THEN 1 ELSE 0 END AS fst
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(sum(fst) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS expanding_nunique
        |FROM f""".stripMargin,

    "q288_rolling_ols" ->
      """WITH e AS (
        |  SELECT event_id, event_type, ts, user_id,
        |    CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events),
        |s AS (
        |  SELECT event_id, event_type,
        |    CAST(count(CASE WHEN user_id IS NOT NULL AND vc IS NOT NULL
        |      THEN 1 END) OVER w AS DOUBLE) AS n,
        |    sum(CASE WHEN vc IS NOT NULL
        |      THEN CAST(user_id AS DOUBLE) END) OVER w AS sx,
        |    sum(CASE WHEN user_id IS NOT NULL
        |      THEN CAST(vc AS DOUBLE) END) OVER w AS sy,
        |    sum(CASE WHEN vc IS NOT NULL
        |      THEN CAST(user_id AS DOUBLE) * user_id END) OVER w AS sxx,
        |    sum(CASE WHEN user_id IS NOT NULL
        |      THEN CAST(vc AS DOUBLE) * vc END) OVER w AS syy,
        |    sum(CAST(user_id AS DOUBLE) * vc) OVER w AS sxy
        |  FROM e
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |f AS (
        |  SELECT event_id, event_type, n, sx, sy,
        |    n * sxx - sx * sx AS varx, n * syy - sy * sy AS vary,
        |    n * sxy - sx * sy AS covxy
        |  FROM s),
        |g AS (
        |  SELECT event_id, event_type, n, sx, sy, varx, vary, covxy,
        |    CASE WHEN varx <> 0 THEN covxy / varx END AS slope
        |  FROM f)
        |SELECT event_id, event_type,
        |  CASE WHEN n >= 20 THEN round(slope, 6) END AS roll_slope,
        |  CASE WHEN n >= 20 THEN round((sy - slope * sx) / n, 6) END
        |    AS roll_intercept,
        |  CASE WHEN n >= 20 AND varx <> 0 AND vary <> 0
        |    THEN round(covxy * covxy / (varx * vary), 6) END AS roll_r2
        |FROM g""".stripMargin,

    "q136_rolling_corr" ->
      """WITH e AS (
        |  SELECT event_id, event_type, ts, user_id,
        |    CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events),
        |s AS (
        |  SELECT event_id, event_type,
        |    CAST(count(CASE WHEN vc IS NOT NULL AND user_id IS NOT NULL
        |      THEN 1 END) OVER w AS DOUBLE) AS n,
        |    sum(CASE WHEN user_id IS NOT NULL
        |      THEN CAST(vc AS DOUBLE) END) OVER w AS sx,
        |    sum(CASE WHEN vc IS NOT NULL
        |      THEN CAST(user_id AS DOUBLE) END) OVER w AS sy,
        |    sum(CASE WHEN user_id IS NOT NULL
        |      THEN CAST(vc AS DOUBLE) * vc END) OVER w AS sxx,
        |    sum(CASE WHEN vc IS NOT NULL
        |      THEN CAST(user_id AS DOUBLE) * user_id END) OVER w AS syy,
        |    sum(CAST(vc AS DOUBLE) * user_id) OVER w AS sxy
        |  FROM e
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT event_id, event_type,
        |  CASE WHEN n >= 20 AND
        |      sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy) > 0
        |    THEN round((n * sxy - sx * sy) /
        |      (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
        |  END AS rolling_corr,
        |  CASE WHEN n >= 20 AND n > 1
        |    THEN round((sxy - sx * sy / n) / (n - 1), 6)
        |  END AS rolling_cov
        |FROM s""".stripMargin,

    "q27_window_rolling" ->
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS roll_sum_c,
        |  CAST(count(*) OVER w AS BIGINT) AS roll_n,
        |  round(CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE)
        |    / CAST(count(*) OVER w AS DOUBLE), 6) AS roll_avg_c
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q28_window_range_time" ->
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS trail_1h_sum_c,
        |  CAST(count(*) OVER w AS BIGINT) AS trail_1h_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q29_first_last_nth" ->
      """SELECT o_orderpriority, highest, lowest, second FROM (
        |  SELECT o_orderpriority,
        |    row_number() OVER w AS rn,
        |    first_value(o_totalprice) OVER wf AS highest,
        |    last_value(o_totalprice) OVER wf AS lowest,
        |    nth_value(o_totalprice, 2) OVER wf AS second
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey),
        |    wf AS (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |) WHERE rn = 1""".stripMargin,

    "q30_ntile_qcut" ->
      """SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS min_c,
        |  CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_c
        |FROM (SELECT o_totalprice,
        |    CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS bucket
        |  FROM orders)
        |GROUP BY 1""".stripMargin,

    "q31_ffill" ->
      """SELECT event_id, user_id,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_c
        |FROM (SELECT event_id, user_id,
        |    CASE WHEN value >= 50 THEN CAST(round(value * 100) AS BIGINT) END AS v
        |  FROM events)""".stripMargin,

    "q33_dropdup" ->
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,

    "q32_melt" ->
      """WITH wide AS (
        |  SELECT l_returnflag, sum(l_quantity) AS qty,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS base_c
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'qty' AS variable, qty AS value FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'base_c' AS variable, base_c AS value FROM wide""".stripMargin,

    "q58_rolling_minperiods" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CASE WHEN count(l_quantity) OVER w >= 5
        |    THEN sum(l_quantity) OVER w END AS roll5_sum
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_orderkey
        |  ORDER BY l_linenumber, l_quantity
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q64_cut" ->
      """SELECT CAST(least(floor(o_totalprice / 50000), 5) AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1""".stripMargin,

    "q65_expanding" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  sum(l_quantity) OVER w AS exp_sum,
        |  CAST(count(*) OVER w AS BIGINT) AS exp_n,
        |  round(CAST(sum(l_quantity) OVER w AS DOUBLE)
        |    / CAST(count(*) OVER w AS DOUBLE), 6) AS exp_mean
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_orderkey
        |  ORDER BY l_linenumber, l_quantity
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin
  )
}
