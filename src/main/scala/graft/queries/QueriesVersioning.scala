package graft.queries

import org.apache.spark.sql.functions._
import graft.analytics.AlertOps
import graft.versioning.VersionOps
import Q._

/** Versioning / lineage / alerting coverage (reference
  * `src/versioning`, `src/analytics/{metrics,alerts}.rs`):
  * snapshot diff, content fingerprint, change-log time travel, CDC
  * merge, and metric alerting — each derived deterministically from
  * the driver testdata so DuckDB replays it bit-for-bit. */
object QueriesVersioning {

  val queries: Map[String, QueryFn] = Map[String, QueryFn](

    // row-level snapshot diff: old = orders minus %13 keys with %7
    // prices bumped, new = orders minus %11 keys; emit non-unchanged
    "q265_version_diff" -> ((s, d) => {
      val base = t(s, d, "orders").select(col("o_orderkey"),
        cents(col("o_totalprice")).as("price_c"))
      val old = base.filter(pmod(col("o_orderkey"), lit(13)) =!= 0)
        .withColumn("price_c", col("price_c") +
          when(pmod(col("o_orderkey"), lit(7)) === 0, lit(500L))
            .otherwise(lit(0L)))
      val nw = base.filter(pmod(col("o_orderkey"), lit(11)) =!= 0)
      VersionOps.versionDiff(old, nw, Seq("o_orderkey"), Seq("price_c"))
        .filter(col("status") =!= "unchanged")
    }),

    // order/partitioning-insensitive table fingerprint of lineitem
    "q266_fingerprint" -> ((s, d) =>
      VersionOps.tableFingerprint(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          cents(col("l_quantity")).as("qty_c"), col("l_returnflag")),
        Seq("l_orderkey", "l_linenumber", "qty_c", "l_returnflag"))),

    // time travel over a synthetic 3-version change log of orders:
    // v1 base upserts, v2 price+10000 for %5 keys, v3 deletes %7 keys
    "q267_time_travel" -> ((s, d) => {
      val base = t(s, d, "orders").select(col("o_orderkey"),
        col("o_orderstatus"), cents(col("o_totalprice")).as("price_c"))
      val log = base
        .select(col("o_orderkey"), col("o_orderstatus"),
          lit(1).as("version"), lit("u").as("op"), col("price_c"))
        .unionByName(base.filter(pmod(col("o_orderkey"), lit(5)) === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            lit(2).as("version"), lit("u").as("op"),
            (col("price_c") + 10000L).as("price_c")))
        .unionByName(base.filter(pmod(col("o_orderkey"), lit(7)) === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            lit(3).as("version"), lit("d").as("op"),
            lit(null).cast("long").as("price_c")))
      VersionOps.asOfSnapshot(log, Seq("o_orderkey"), "version", "op",
          lit(3))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("price_c")).cast("long").as("sum_price_c"))
    }),

    // CDC merge into customer: %3 balance updates, %10 deletes,
    // %4 inserts under shifted keys; per-nation summary of the result
    "q268_cdc_merge" -> ((s, d) => {
      val base = t(s, d, "customer").select(col("c_custkey"),
        col("c_nationkey").cast("long").as("nation"),
        cents(col("c_acctbal")).as("bal_c"))
      val changes = base.filter(pmod(col("c_custkey"), lit(3)) === 0)
        .select(col("c_custkey"), col("nation"),
          (col("bal_c") + 777L).as("bal_c"), lit("u").as("op"))
        .unionByName(base.filter(pmod(col("c_custkey"), lit(10)) === 0)
          .select(col("c_custkey"), lit(null).cast("long").as("nation"),
            lit(null).cast("long").as("bal_c"), lit("d").as("op")))
        .unionByName(base.filter(pmod(col("c_custkey"), lit(4)) === 0)
          .select((col("c_custkey") + 10000000L).as("c_custkey"),
            lit(99L).as("nation"), lit(123456L).as("bal_c"),
            lit("i").as("op")))
      VersionOps.applyChanges(base, changes, Seq("c_custkey"), "op")
        .groupBy(col("nation"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("bal_c")).cast("long").as("sum_bal_c"))
    }),

    // threshold alerts on daily average event value (cents) per type,
    // per-type warn/crit rules broadcast-joined
    "q269_threshold_alerts" -> ((s, d) => {
      import s.implicits._
      val rules = Seq(
        ("view", 5500.0, 6500.0), ("click", 5500.0, 6500.0),
        ("purchase", 5200.0, 6200.0), ("signup", 5500.0, 6500.0),
        ("error", 5500.0, 6500.0)).toDF("event_type", "warn", "crit")
      AlertOps.thresholdAlerts(
        t(s, d, "events").select(col("event_type"), col("ts"),
          cents(col("value")).as("vc")),
        Seq("event_type"), to_date(col("ts")), col("vc"), rules)
        .select(col("event_type"), col("bucket"),
          round(col("metric"), 6).as("metric"), col("severity"))
    }),

    // trailing-7-day z-score drift alerts on daily value sums per type
    "q270_drift_alerts" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum(cents(col("value"))).cast("long").as("vc"))
      AlertOps.driftAlerts(daily, Seq("event_type"), "d", "vc",
        lookback = 7, zThresh = 2.0, minBaseline = 4)
    }))

  val oracle: Map[String, String] = Map(

    "q265_version_diff" ->
      """WITH base AS (SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        |  FROM orders),
        |o AS (SELECT o_orderkey, price_c +
        |    CASE WHEN o_orderkey % 7 = 0 THEN 500 ELSE 0 END
        |    AS old_price_c
        |  FROM base WHERE o_orderkey % 13 <> 0),
        |n AS (SELECT o_orderkey, price_c AS new_price_c
        |  FROM base WHERE o_orderkey % 11 <> 0)
        |SELECT * FROM (
        |  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |    CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |      WHEN n.o_orderkey IS NULL THEN 'removed'
        |      WHEN old_price_c IS DISTINCT FROM new_price_c
        |        THEN 'changed'
        |      ELSE 'unchanged' END AS status,
        |    old_price_c, new_price_c
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
        |WHERE status <> 'unchanged'""".stripMargin,

    "q266_fingerprint" ->
      """WITH h AS (SELECT CAST(list_sum(list_transform(range(1, 13),
        |    i -> (strpos('0123456789abcdef', substr(md5(
        |      concat_ws('|', CAST(l_orderkey AS VARCHAR),
        |        CAST(l_linenumber AS VARCHAR),
        |        CAST(CAST(round(l_quantity * 100) AS BIGINT) AS VARCHAR),
        |        l_returnflag)), i, 1)) - 1)
        |    * power(16, 12 - i))) AS BIGINT) AS h FROM lineitem)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(h) % 281474976710656 AS BIGINT) AS fingerprint
        |FROM h""".stripMargin,

    "q267_time_travel" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        |  FROM orders),
        |log AS (
        |  SELECT o_orderkey, o_orderstatus, 1 AS version, 'u' AS op,
        |    price_c FROM base
        |  UNION ALL SELECT o_orderkey, o_orderstatus, 2, 'u',
        |    price_c + 10000 FROM base WHERE o_orderkey % 5 = 0
        |  UNION ALL SELECT o_orderkey, o_orderstatus, 3, 'd',
        |    CAST(NULL AS BIGINT) FROM base WHERE o_orderkey % 7 = 0),
        |snap AS (
        |  SELECT * FROM log WHERE version <= 3
        |  QUALIFY row_number() OVER (PARTITION BY o_orderkey
        |    ORDER BY version DESC) = 1)
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(price_c) AS BIGINT) AS sum_price_c
        |FROM snap WHERE op <> 'd' GROUP BY 1""".stripMargin,

    "q268_cdc_merge" ->
      """WITH base AS (SELECT c_custkey,
        |    CAST(c_nationkey AS BIGINT) AS nation,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer),
        |changes AS (
        |  SELECT c_custkey, nation, bal_c + 777 AS bal_c, 'u' AS op
        |    FROM base WHERE c_custkey % 3 = 0
        |  UNION ALL SELECT c_custkey, CAST(NULL AS BIGINT),
        |    CAST(NULL AS BIGINT), 'd' FROM base WHERE c_custkey % 10 = 0
        |  UNION ALL SELECT c_custkey + 10000000, 99, 123456, 'i'
        |    FROM base WHERE c_custkey % 4 = 0),
        |merged AS (
        |  SELECT b.* FROM base b
        |  WHERE b.c_custkey NOT IN (SELECT c_custkey FROM changes)
        |  UNION ALL SELECT c_custkey, nation, bal_c
        |    FROM changes WHERE op <> 'd')
        |SELECT nation, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(bal_c) AS BIGINT) AS sum_bal_c
        |FROM merged GROUP BY 1""".stripMargin,

    "q269_threshold_alerts" ->
      """WITH m AS (SELECT event_type, CAST(ts AS DATE) AS bucket,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS s,
        |    CAST(count(value) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, bucket,
        |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS metric,
        |  CASE WHEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) >= crit
        |      THEN 'critical'
        |    WHEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) >= warn
        |      THEN 'warning' END AS severity
        |FROM m JOIN (VALUES
        |    ('view', 5500.0, 6500.0), ('click', 5500.0, 6500.0),
        |    ('purchase', 5200.0, 6200.0), ('signup', 5500.0, 6500.0),
        |    ('error', 5500.0, 6500.0)) r(event_type, warn, crit)
        |  USING (event_type)
        |WHERE CAST(s AS DOUBLE) / CAST(n AS DOUBLE) >= warn"""
        .stripMargin,

    "q270_drift_alerts" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS vc
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, d, vc,
        |    CAST(count(vc) OVER win AS BIGINT) AS n,
        |    CAST(sum(vc) OVER win AS BIGINT) AS s,
        |    CAST(sum(vc * vc) OVER win AS BIGINT) AS s2
        |  FROM daily WINDOW win AS (PARTITION BY event_type ORDER BY d
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT event_type, d, vc,
        |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |    (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS v
        |  FROM w WHERE n >= 4)
        |SELECT event_type, d, vc,
        |  round(mean, 6) AS baseline_mean,
        |  round((CAST(vc AS DOUBLE) - mean) / sqrt(v), 6) AS z
        |FROM z
        |WHERE v > 0.0
        |  AND abs((CAST(vc AS DOUBLE) - mean) / sqrt(v)) >= 2.0"""
        .stripMargin)
}
