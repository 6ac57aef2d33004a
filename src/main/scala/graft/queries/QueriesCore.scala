package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.PandasOps._
import Q._

/** Core relational surface: scans, filters, joins, aggregation,
  * sorting, set ops (SURVEY §2.1-2.4, 2.6, 2.7). Every query pairs
  * with a DuckDB oracle in `oracle`.
  */
object QueriesCore {

  val queries: Map[String, QueryFn] = Map(

    // §2.4 group-by aggregation (TPC-H Q1 flavor): full AggregateOp
    // set over exact-representable outputs.
    "q01_groupby_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_c"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc_c"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax")))).as("sum_charge_c"),
          min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"),
          count(lit(1)).as("count_order"),
          countDistinct(col("l_orderkey")).as("n_orders"))
    }),

    // §2.2 filter + projection (predicate pushdown to parquet scan)
    "q02_filter_project" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber").cast("long"),
          cents(col("l_extendedprice") * col("l_discount"))
            .as("disc_revenue_c"))),

    // §2.3 multi-way inner join + agg (broadcast dims)
    "q03_join_revenue_by_nation" -> ((s, d) => {
      val li = t(s, d, "lineitem"); val o = t(s, d, "orders")
      val c = t(s, d, "customer"); val n = t(s, d, "nation")
      // manual partial-aggregation pushdown: collapse lineitem to one
      // exact-cents revenue row per order BEFORE the join chain — the
      // fact table shrinks ~4× ahead of three joins, and the final
      // countDistinct degenerates to a plain count (one row per
      // order). Legal because orders→customer→nation is 1:1 per
      // orderkey and the cent sums are associative integers.
      val perOrder = li.groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("__rev_c__"))
      perOrder.join(o, perOrder("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(col("__rev_c__")).as("revenue_c"),
          count(lit(1)).as("n_orders"))
    }),

    // §2.3 left join with null-producing side
    "q04_join_left" -> ((s, d) => {
      val o = t(s, d, "orders")
      val li = t(s, d, "lineitem").select("l_orderkey").distinct()
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("l_orderkey").isNull, 1L).otherwise(0L))
            .as("n_childless"))
    }),

    // §2.3 semi join (EXISTS)
    "q05_join_semi" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 150000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    // §2.3 anti join (NOT EXISTS)
    "q06_join_anti" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // §2.3 cross join
    "q07_join_cross" -> ((s, d) =>
      t(s, d, "region").crossJoin(t(s, d, "nation"))
        .select("r_name", "n_name")),

    // §2.6 top-k (TakeOrderedAndProject, no global sort)
    "q08_topk" -> ((s, d) =>
      t(s, d, "orders").nlargest(10, "o_totalprice", "o_orderkey")
        .select("o_orderkey", "o_totalprice")),

    // §2.6 multi-key sort + limit, nulls handling
    "q09_sort_multi" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_orderstatus").asc, col("o_totalprice").desc,
          col("o_orderkey").asc)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(50)),

    // §2.7 set ops
    "q10_union" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").cast("long").as("nk"))
        .union(t(s, d, "supplier")
          .select(col("s_nationkey").cast("long").as("nk")))
        .distinct()),

    "q11_intersect" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").cast("long").as("nk"))
        .intersect(t(s, d, "supplier")
          .select(col("s_nationkey").cast("long").as("nk")))),

    "q12_except" -> ((s, d) =>
      t(s, d, "nation").select(col("n_nationkey").cast("long").as("nk"))
        .except(t(s, d, "supplier")
          .select(col("s_nationkey").cast("long").as("nk")))),

    "q13_distinct" -> ((s, d) =>
      t(s, d, "lineitem").select("l_returnflag", "l_linestatus")
        .distinct()),

    // §2.4 value_counts
    "q14_value_counts" -> ((s, d) =>
      t(s, d, "events").valueCounts("event_type")),

    // §2.4 nunique
    "q15_nunique" -> ((s, d) =>
      t(s, d, "lineitem").nunique("l_orderkey", "l_partkey", "l_suppkey")),

    // §2.4 pivot table (explicit pivot values → stable schema)
    "q16_pivot" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum("l_quantity"))),

    // §2.4 crosstab
    "q17_crosstab" -> ((s, d) =>
      t(s, d, "orders").groupBy("o_orderstatus")
        .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
          "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))),

    // §2.4 hierarchical groupby → rollup + grouping_id
    "q18_rollup" -> ((s, d) =>
      t(s, d, "lineitem").rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"),
          grouping_id().cast("long").as("gid"))),

    // §2.4 cube
    "q19_cube" -> ((s, d) =>
      t(s, d, "lineitem").cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          grouping_id().cast("long").as("gid"))),

    // §2.4 exact median / quartiles (percentile, not approx)
    "q20_median" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(percentile(col("l_quantity"), lit(0.25)).as("q1"),
          percentile(col("l_quantity"), lit(0.5)).as("median"),
          percentile(col("l_quantity"), lit(0.75)).as("q3"))),

    // §2.4 mode with deterministic tiebreak
    "q21_mode" -> ((s, d) => {
      val counts = t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("cnt").desc, col("l_quantity").asc)
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"))
    }),

    // §2.4 cumulative aggregates (running window)
    "q22_cumsum" -> ((s, d) => {
      // (l_orderkey, l_linenumber) is not unique in the testdata;
      // l_quantity in the ordering makes the running sum well-defined
      val w = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "lineitem")
        .withColumn("l_quantity_cumsum", sum("l_quantity").over(w))
        .select(col("l_orderkey"), col("l_linenumber").cast("long"),
          col("l_quantity_cumsum"))
    }),

    // §2.4 JIT group aggs: weighted mean from exact sums
    "q23_weighted_mean" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_suppkey")
        .agg(sum(cents(col("l_extendedprice")) *
            col("l_quantity").cast("long")).as("spq"),
          sum(col("l_quantity").cast("long")).as("sq"))
        .withColumn("weighted_price_c",
          round(dbl(col("spq")) / dbl(col("sq")), 6))),

    // §2.4 geometric/harmonic mean, range, coef-of-variation
    "q24_geo_harmonic" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(
          round(exp(sum(log(col("l_quantity"))) / count(lit(1))), 6)
            .as("geo_mean"),
          round(dbl(count(lit(1))) / sum(lit(1.0) / col("l_quantity")), 6)
            .as("harmonic_mean"),
          (max("l_quantity") - min("l_quantity")).as("range")))
  ,

    // §2.3/§2.2 TPC-H Q17 shape: correlated SCALAR subquery (avg
    // quantity per part) — expressed Spark-first as a pre-aggregated
    // join (what Catalyst decorrelates the subquery into anyway);
    // the oracle keeps the literal correlated form to prove
    // semantic equivalence. Exact: avg compare cross-multiplied on
    // integer quantities, revenue in cents.
    "q450_q17_small_qty" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val pa = t(s, d, "part")
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .select("p_partkey", "p_brand")
      val stats = li.groupBy(col("l_partkey").as("sp"))
        .agg(sum(col("l_quantity").cast("long")).as("qty_sum"),
          count(lit(1)).as("qty_n"))
      li.join(broadcast(pa), col("l_partkey") === col("p_partkey"))
        .join(stats, col("l_partkey") === col("sp"))
        .filter(col("l_quantity").cast("long") * 5 * col("qty_n") <
          col("qty_sum"))
        .groupBy("p_brand")
        .agg(sum(cents(col("l_extendedprice"))).as("revenue_cents"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q21 shape: EXISTS + NOT EXISTS chained on the same
    // fact table — suppliers who were the ONLY returning supplier
    // on a finished multi-supplier order. Spark-first: left_semi
    // for EXISTS, left_anti for NOT EXISTS (equi on the order key,
    // residual non-equi on the supplier).
    "q451_q21_sole_returner" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_returnflag")
      val fOrders = t(s, d, "orders")
        .filter(col("o_orderstatus") === "F").select("o_orderkey")
      val l1 = li.filter(col("l_returnflag") === "R")
        .join(fOrders, col("l_orderkey") === col("o_orderkey"))
        .drop("o_orderkey")
      val others = li.select(col("l_orderkey").as("o2"),
        col("l_suppkey").as("s2"))
      val othersR = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
      val kept = l1
        .join(others, col("l_orderkey") === col("o2") &&
          col("l_suppkey") =!= col("s2"), "left_semi")
        .join(othersR, col("l_orderkey") === col("o3") &&
          col("l_suppkey") =!= col("s3"), "left_anti")
      kept.join(broadcast(t(s, d, "supplier")
          .select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
    }),

    // TPC-H Q22 shape: scalar subquery threshold (above-average
    // positive balance) + NOT EXISTS anti join (customers with no
    // orders), rolled up by segment. Exact: the avg compare is
    // cross-multiplied on cent-integers.
    "q452_q22_idle_rich" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val pos = cust.filter(cents(col("c_acctbal")) > 0)
        .agg(sum(cents(col("c_acctbal"))).as("bal_sum"),
          count(lit(1)).as("bal_n"))
      cust.crossJoin(broadcast(pos))
        .filter(cents(col("c_acctbal")) * col("bal_n") >
          col("bal_sum"))
        .join(t(s, d, "orders").select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("numcust"),
          sum(cents(col("c_acctbal"))).as("acctbal_cents"))
    }),

    // TPC-H Q2 shape: correlated scalar MIN over a join — for each
    // small part, the supplier(s) achieving the minimum catalog cost
    // (min line price per (part, supplier) stands in for partsupp,
    // which the testdata lacks). Spark-first: ONE per-part min
    // aggregate joined back (the decorrelated plan Catalyst would
    // build); the oracle keeps the literal correlated subquery.
    // Exact: costs in integer cents.
    "q473_q2_min_cost" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val ps = li.groupBy(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey"))
        .agg(min(cents(col("l_extendedprice"))).as("cost_cents"))
      val minCost = ps.groupBy(col("ps_partkey").as("mp"))
        .agg(min(col("cost_cents")).as("min_cost"))
      val pa = t(s, d, "part").filter(col("p_size") < 15)
        .select("p_partkey", "p_brand")
      ps.join(minCost, col("ps_partkey") === col("mp") &&
          col("cost_cents") === col("min_cost"))
        .join(broadcast(pa), col("ps_partkey") === col("p_partkey"))
        .join(broadcast(t(s, d, "supplier")
            .select("s_suppkey", "s_name", "s_nationkey")),
          col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")
            .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("p_partkey"), col("p_brand"), col("s_name"),
          col("n_name"), col("cost_cents"))
    }),

    // TPC-H Q15 shape: scalar MAX over a grouped view — the
    // supplier(s) with the top revenue in 1996Q1. Spark-first: the
    // revenue aggregate + a broadcast 1-row max joined back; the
    // oracle keeps the literal `= (SELECT max(...) FROM view)` form.
    "q474_q15_top_supplier" -> ((s, d) => {
      val rev = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(cents(col("l_extendedprice") *
          (lit(1) - col("l_discount")))).as("total_revenue_c"))
      val mx = rev.agg(max(col("total_revenue_c")).as("__mx__"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_revenue_c") === col("__mx__"))
        .join(broadcast(t(s, d, "supplier")
            .select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_revenue_c"))
    }),

    // TPC-H Q20 shape: nested IN with a correlated scalar — the
    // suppliers who shipped more than half of some part's total
    // 1995 volume (per-(supplier,part) sum vs the correlated
    // per-part sum; partsupp availability stands in as shipped
    // volume). Spark-first: two aggregates over ONE filtered scan
    // lineage + a semi join; the oracle keeps the literal
    // IN (... HAVING ... > (SELECT ...)) form.
    "q475_q20_part_share" -> ((s, d) => {
      val li95 = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01"))
        .select(col("l_suppkey"), col("l_partkey"),
          col("l_quantity").cast("long").as("qty"))
      val perPair = li95.groupBy("l_suppkey", "l_partkey")
        .agg(sum(col("qty")).as("sq"))
      val perPart = li95.groupBy(col("l_partkey").as("pp"))
        .agg(sum(col("qty")).as("tq"))
      val qual = perPair
        .join(perPart, col("l_partkey") === col("pp"))
        .filter(col("sq") * 2 > col("tq"))
        .select(col("l_suppkey")).distinct()
      t(s, d, "supplier").select("s_suppkey", "s_name")
        .join(qual, col("s_suppkey") === col("l_suppkey"),
          "left_semi")
    }),

    // TPC-H Q11 shape: group HAVING against a global scalar fraction
    // — parts carrying more than 1/2000 of total line value.
    // Spark-first: one keyed agg + broadcast 1-row total, the
    // compare cross-multiplied on exact cents (value > T/2000 <=>
    // 2000*value > T); the oracle keeps the literal scalar subquery.
    "q480_q11_important_parts" -> ((s, d) => {
      val per = t(s, d, "lineitem").groupBy("l_partkey")
        .agg(sum(cents(col("l_extendedprice"))).as("value_c"))
      val tot = per.agg(sum(col("value_c")).as("__T__"))
      per.crossJoin(broadcast(tot))
        .filter(col("value_c") * 2000 > col("__T__"))
        .select(col("l_partkey"), col("value_c"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q01_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  CAST(count(*) AS BIGINT) AS count_order,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(round(l_extendedprice * l_discount * 100) AS BIGINT) AS disc_revenue_c
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q03_join_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,

    "q04_join_left" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_childless
        |FROM orders LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) li
        |  ON o_orderkey = l_orderkey
        |GROUP BY 1""".stripMargin,

    "q05_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 150000)""".stripMargin,

    "q06_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q07_join_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation",

    "q08_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q09_sort_multi" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
        |LIMIT 50""".stripMargin,

    "q10_union" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
        |UNION SELECT CAST(s_nationkey AS BIGINT) FROM supplier""".stripMargin,

    "q11_intersect" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
        |INTERSECT SELECT CAST(s_nationkey AS BIGINT) FROM supplier""".stripMargin,

    "q12_except" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS nk FROM nation
        |EXCEPT SELECT CAST(s_nationkey AS BIGINT) FROM supplier""".stripMargin,

    "q13_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "q14_value_counts" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS count FROM events
        |GROUP BY 1 ORDER BY 2 DESC, 1""".stripMargin,

    "q15_nunique" ->
      """SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS l_orderkey_nunique,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS l_partkey_nunique,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS l_suppkey_nunique
        |FROM lineitem""".stripMargin,

    "q16_pivot" ->
      """SELECT l_returnflag,
        |  sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS F,
        |  sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS O
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q17_crosstab" ->
      """SELECT o_orderstatus,
        |  CAST(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS "1-URGENT",
        |  CAST(count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT) AS "2-HIGH",
        |  CAST(count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS BIGINT) AS "3-MEDIUM",
        |  CAST(count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS BIGINT) AS "4-NOT SPECIFIED",
        |  CAST(count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS BIGINT) AS "5-LOW"
        |FROM orders GROUP BY 1""".stripMargin,

    "q18_rollup" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q19_cube" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,

    "q20_median" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS q1,
        |  quantile_cont(l_quantity, 0.5) AS median,
        |  quantile_cont(l_quantity, 0.75) AS q3
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q21_mode" ->
      """SELECT l_returnflag, l_quantity AS mode_qty FROM (
        |  SELECT l_returnflag, l_quantity,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY cnt DESC, l_quantity ASC) AS rn
        |  FROM (SELECT l_returnflag, l_quantity, count(*) AS cnt
        |        FROM lineitem GROUP BY 1, 2)
        |) WHERE rn = 1""".stripMargin,

    "q22_cumsum" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  sum(l_quantity) OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS l_quantity_cumsum
        |FROM lineitem""".stripMargin,

    "q23_weighted_mean" ->
      """SELECT l_suppkey,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS spq,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
        |  round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE)
        |    / CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE), 6) AS weighted_price_c
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q24_geo_harmonic" ->
      """SELECT l_returnflag,
        |  round(exp(sum(ln(l_quantity)) / count(*)), 6) AS geo_mean,
        |  round(CAST(count(*) AS DOUBLE) / sum(1.0 / l_quantity), 6) AS harmonic_mean,
        |  max(l_quantity) - min(l_quantity) AS range
        |FROM lineitem GROUP BY 1""".stripMargin,

    // literal correlated scalar subqueries — DuckDB decorrelates
    // them the same way the Spark side pre-aggregates
    "q450_q17_small_qty" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey
        |  AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        |  AND 5 * CAST(l_quantity AS BIGINT) *
        |    (SELECT count(*) FROM lineitem l2
        |     WHERE l2.l_partkey = p_partkey)
        |    < (SELECT sum(CAST(l_quantity AS BIGINT)) FROM lineitem l2
        |       WHERE l2.l_partkey = p_partkey)
        |GROUP BY 1""".stripMargin,

    "q451_q21_sole_returner" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY 1""".stripMargin,

    "q452_q22_idle_rich" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
        |FROM customer
        |WHERE CAST(round(c_acctbal * 100) AS BIGINT) *
        |    (SELECT count(*) FROM customer
        |     WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0)
        |  > (SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT))
        |     FROM customer
        |     WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey)
        |GROUP BY 1""".stripMargin,

    "q473_q2_min_cost" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |    CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS cost_cents
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT p_partkey, p_brand, s_name, n_name, cost_cents
        |FROM ps, part, supplier, nation
        |WHERE ps_partkey = p_partkey AND ps_suppkey = s_suppkey
        |  AND s_nationkey = n_nationkey AND p_size < 15
        |  AND cost_cents = (SELECT min(cost_cents) FROM ps ps2
        |    WHERE ps2.ps_partkey = ps.ps_partkey)""".stripMargin,

    "q474_q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |      * 100) AS BIGINT)) AS BIGINT) AS total_revenue_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue_c
        |FROM supplier, revenue
        |WHERE s_suppkey = l_suppkey
        |  AND total_revenue_c =
        |    (SELECT max(total_revenue_c) FROM revenue)""".stripMargin,

    "q475_q20_part_share" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem l1
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-01-01'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING 2 * sum(CAST(l_quantity AS BIGINT)) >
        |    (SELECT sum(CAST(l_quantity AS BIGINT)) FROM lineitem l2
        |     WHERE l2.l_partkey = l1.l_partkey
        |       AND l2.l_shipdate >= TIMESTAMP '1995-01-01'
        |       AND l2.l_shipdate < TIMESTAMP '1996-01-01'))""".stripMargin,

    "q480_q11_important_parts" ->
      """SELECT l_partkey,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |    AS BIGINT) AS value_c
        |FROM lineitem GROUP BY 1
        |HAVING sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |  * 2000 >
        |  (SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |   FROM lineitem)""".stripMargin
  )
}
