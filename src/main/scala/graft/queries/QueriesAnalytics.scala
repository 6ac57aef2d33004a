package graft.queries

import org.apache.spark.sql.functions._
import graft.analytics.EventOps
import Q._

/** Behavioral / event-stream analytics coverage: funnel conversion,
  * cohort retention, Markov transitions, RFM segmentation — the
  * groupby+window compositions an analytics user of the reference
  * builds by hand (pandrs `src/dataframe/group_by.rs`,
  * `src/series/window.rs`), shipped as first-class operators. */
object QueriesAnalytics {

  val queries: Map[String, QueryFn] = Map[String, QueryFn](

    // ordered funnel view -> click -> purchase over the events table;
    // conversion in exact integer ppm (engine-independent)
    "q215_funnel" -> ((s, d) =>
      EventOps.funnel(t(s, d, "events"), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))),

    // journey-string sequence mining (MATCH_RECOGNIZE-lite): per-user
    // chronological event-initial string + regex pattern counts
    // (browse->buy runs, error streaks, signup->view adjacency)
    "q463_event_journeys" -> ((s, d) =>
      EventOps.journeyPatterns(t(s, d, "events"), "user_id", "ts",
        "event_type", "event_id", Seq(
          "n_browse_buy" -> "v+p",
          "n_error_streak" -> "e{2,}",
          "n_signup_view" -> "sv"))),

    // monthly cohort retention on orders (cohort = month of first
    // order per customer, offset in months)
    "q216_retention" -> ((s, d) =>
      EventOps.retentionCohorts(t(s, d, "orders"), "o_custkey",
        "o_orderdate", "month")
        .select(col("cohort").cast("date").as("cohort"), col("offset"),
          col("n_users"))),

    // first-order Markov transition matrix over per-user event
    // sequences (ties broken by event_id)
    "q217_markov" -> ((s, d) =>
      EventOps.markovTransitions(t(s, d, "events"), "user_id", "ts",
        "event_type", "event_id")),

    // frequent contiguous event-type trigrams across user timelines
    // (sequential pattern mining; support >= 5)
    "q244_seq_trigrams" -> ((s, d) =>
      EventOps.sequenceNgrams(t(s, d, "events"), "user_id", "ts",
        "event_type", "event_id", n = 3, minCount = 5L)),

    // RFM per customer on orders with fixed threshold segments
    "q218_rfm" -> ((s, d) =>
      EventOps.rfm(t(s, d, "orders"), "o_custkey", "o_orderdate",
        "o_totalprice", recencyCut = 365, freqCut = 10,
        monetaryCutCents = 100000L * 100)),

    // fuzzy entity matching with the native codegen Jaro-Winkler
    // expression: within-brand blocked pairs (bounded block join, not
    // all-pairs) above 0.85 similarity. Bit-exact vs DuckDB's
    // jaro_winkler_similarity (verified on 2k real-name pairs).
    "q219_jaro_winkler" -> ((s, d) => {
      val p = t(s, d, "part")
        .select(col("p_partkey"), col("p_name"), col("p_brand"))
      t(s, d, "part").select(col("p_partkey"), col("p_name"),
          col("p_brand")).as("a")
        .join(p.as("b"),
          col("a.p_brand") === col("b.p_brand") &&
            col("a.p_partkey") < col("b.p_partkey"))
        .select(col("a.p_partkey").as("k1"),
          col("b.p_partkey").as("k2"),
          graft.sqlext.JaroWinkler.jaro_winkler(
            col("a.p_name"), col("b.p_name")).as("jw"))
        .filter(col("jw") >= 0.85)
        .select(col("k1"), col("k2"), round(col("jw"), 6).as("jw"))
    }),

    // weighted quartiles of price (cents) weighted by quantity, per
    // return flag — key-partitioned window cumsum, no global window
    "q220_weighted_quantile" -> ((s, d) =>
      graft.stats.StatsOps.weightedQuantiles(
        t(s, d, "lineitem").select(col("l_returnflag"),
          cents(col("l_extendedprice")).as("price_c"),
          col("l_quantity").cast("long").as("w"), col("l_orderkey")),
        "price_c", "w", Seq(0.25, 0.5, 0.75), Seq("l_returnflag"),
        "l_orderkey")),

    // pairwise sample covariance matrix (exact limb sums, one pass)
    "q221_cov_matrix" -> ((s, d) =>
      graft.stats.StatsOps.covMatrix(
        t(s, d, "lineitem").select(
          cents(col("l_quantity")).as("qty_c"),
          cents(col("l_extendedprice")).as("price_c"),
          cents(col("l_discount")).as("disc_c")),
        Seq("qty_c", "price_c", "disc_c"))),

    // Mahalanobis distance² outliers on (quantity, price cents) —
    // moment pass + map-side closed-form distance (d=2 path)
    "q222_mahalanobis" -> ((s, d) =>
      graft.stats.StatsOps.mahalanobis(
        t(s, d, "lineitem").select(col("l_orderkey"),
          col("l_linenumber"),
          col("l_quantity").cast("long").as("qty"),
          cents(col("l_extendedprice")).as("price_c")),
        Seq("qty", "price_c"))
        .filter(col("dist2") > 9.0)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("dist2"), 6).as("dist2"))),

    // nearest same-nation supplier by haversine distance on
    // deterministic derived coordinates — nation-blocked join (never
    // all-pairs), map-side trig, per-customer min
    "q223_haversine" -> ((s, d) => {
      def lat(c: org.apache.spark.sql.Column) =
        ((cents(c) % 18000 + 18000) % 18000).cast("double") / 100.0 - 90.0
      def lon(c: org.apache.spark.sql.Column) =
        ((cents(c) % 36000 + 36000) % 36000).cast("double") / 100.0 - 180.0
      val cust = t(s, d, "customer").select(col("c_custkey"),
        col("c_nationkey"), lat(col("c_acctbal")).as("clat"),
        lon(col("c_acctbal")).as("clon"))
      val supp = t(s, d, "supplier").select(col("s_nationkey"),
        lat(col("s_acctbal")).as("slat"),
        lon(col("s_acctbal")).as("slon"))
      cust.join(broadcast(supp),
          col("c_nationkey") === col("s_nationkey"))
        .select(col("c_custkey"),
          graft.functions.GeoOps.haversineKm(col("clat"), col("clon"),
            col("slat"), col("slon")).as("km"))
        .groupBy("c_custkey")
        .agg(round(min(col("km")), 6).as("nearest_km"))
    }),

    // grid-blocked radius join (all customer-supplier pairs within
    // 200 km): 3x3 neighbor-cell equi-join + exact haversine filter
    // — never a cross join. Lat band +-60 deg so the cell size
    // contract holds (200 km / (111.32 * cos 60) = 3.6 < 3.7)
    "q434_radius_join" -> ((s, d) => {
      def lat(c: org.apache.spark.sql.Column) =
        ((cents(c) % 12000 + 12000) % 12000).cast("double") / 100.0 - 60.0
      def lon(c: org.apache.spark.sql.Column) =
        ((cents(c) % 36000 + 36000) % 36000).cast("double") / 100.0 - 180.0
      val cust = t(s, d, "customer").select(col("c_custkey"),
        lat(col("c_acctbal")).as("clat"),
        lon(col("c_acctbal")).as("clon"))
      val supp = t(s, d, "supplier").select(col("s_suppkey"),
        lat(col("s_acctbal")).as("slat"),
        lon(col("s_acctbal")).as("slon"))
      graft.functions.GeoOps.radiusJoin(cust, supp,
          "clat", "clon", "slat", "slon",
          radiusKm = 200.0, cellSizeDeg = 3.7)
        .select(col("c_custkey"), col("s_suppkey"),
          round(col("distance_km"), 6).as("distance_km"))
        .orderBy("c_custkey", "s_suppkey")
    }),

    // pandas rolling(10).skew()/.kurt() per user over event values
    // (integer dollars -> exact window sums)
    "q224_rolling_skew_kurt" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_id"), col("user_id"),
        round(col("value")).cast("long").as("v"))
      val sk = graft.window.RollingOps.rollingSkew(ev, "v", 10,
        Seq("event_id"), Seq("user_id"))
      graft.window.RollingOps.rollingKurt(sk, "v", 10,
        Seq("event_id"), Seq("user_id"))
        .select(col("event_id"), col("user_id"),
          round(col("rolling_skew"), 6).as("skew"),
          round(col("rolling_kurt"), 6).as("kurt"))
    }),

    // SCD-2 history build: runs of equal order priority per customer
    // collapsed to [valid_from, valid_to) validity intervals
    "q225_scd2" -> ((s, d) =>
      EventOps.changeIntervals(t(s, d, "orders"), Seq("o_custkey"),
        "o_orderpriority", "o_orderdate", "o_orderkey")
        .select(col("o_custkey"), col("o_orderpriority"),
          col("valid_from").cast("date").as("valid_from"),
          col("valid_to").cast("date").as("valid_to"))),

    // pinball (quantile) loss of a crude linear price predictor at
    // dyadic quantiles — exact binary fractions, order-independent
    "q226_pinball" -> ((s, d) =>
      graft.ml.MlMetrics.pinballLoss(
        t(s, d, "lineitem").select(
          cents(col("l_extendedprice")).as("y"),
          (col("l_quantity").cast("long") * 3000L).as("yhat")),
        "y", "yhat", Seq(0.25, 0.5, 0.75))),

    // FP-Growth frequent event-type itemsets per user basket,
    // oracled by exhaustive bitmask enumeration over the small vocab
    "q227_freq_itemsets" -> ((s, d) =>
      graft.analytics.BasketOps.frequentItemsets(
        t(s, d, "events"), "user_id", "event_type",
        minSupport = 0.4)),

    // PrefixSpan sequential patterns (ordered, gap-tolerant) over
    // user event streams — maxLen 2 keeps it fully oracle-able
    "q295_seq_patterns" -> ((s, d) =>
      graft.analytics.BasketOps.sequentialPatterns(
        t(s, d, "events"), "user_id", "event_id", "event_type",
        minSupport = 0.3, maxLen = 2)
        .orderBy("pattern")),

    // AFT survival regression on per-user spans (rows-only gate —
    // L-BFGS internals; coefficient recovery spec'd)
    "q296_aft" -> ((s, d) =>
      graft.ml.MlOps.aftSurvival(
        t(s, d, "events").groupBy("user_id").agg(
          (datediff(max(col("ts")), min(col("ts"))) + 1).cast("double")
            .as("dur"),
          max(when(col("event_type") === "purchase", 1.0)
            .otherwise(0.0)).as("ev"),
          log(count(lit(1)).cast("double")).as("x1")),
        Seq("x1"), "dur", "ev")),

    // single-item association rules (confidence + lift) from the
    // same baskets
    "q228_assoc_rules" -> ((s, d) =>
      graft.analytics.BasketOps.pairRules(
        t(s, d, "events"), "user_id", "event_type",
        minSupport = 0.4)),

    // isotonic regression of price on quantity; oracled via the
    // minimax characterization fit(i) = max_{j<=i} min_{k>=i}
    // mean(y over levels j..k) over the ~50 distinct quantity levels
    "q229_isotonic" -> ((s, d) =>
      graft.ml.MlOps.isotonicRegression(
        t(s, d, "lineitem").select(
          col("l_quantity").cast("long").as("x"),
          cents(col("l_extendedprice")).cast("double").as("y")),
        "x", "y")
        .groupBy(col("x"))
        .agg(round(first(col("isotonic")) / 100.0, 2).as("fit"))),

    // Schuster periodogram of the daily order-count series: variance
    // fraction at the first 8 Fourier frequencies
    "q230_periodogram" -> ((s, d) =>
      graft.timeseries.TimeSeriesOps.periodogram(
        t(s, d, "orders").groupBy(col("o_orderdate").as("dd"))
          .agg(count(lit(1)).cast("double").as("y")),
        "y", "dd", maxK = 8)),

    // last-touch / first-touch / linear attribution of purchase value
    // to prior touch channels, per user event stream
    "q231_attribution" -> ((s, d) =>
      EventOps.attribution(t(s, d, "events"), "user_id", "ts",
        "event_type", "value", "purchase", "event_id")),

    // text-vis parity: ASCII histogram of quantity, integer-exact bar
    // scaling (reference vis/ascii)
    "q253_histogram" -> ((s, d) =>
      graft.vis.VisOps.histogram(t(s, d, "lineitem"), "l_quantity",
        lo = 0.0, hi = 50.0, nBins = 10, barWidth = 40)),

    // grouped box-plot table: five-number summary + Tukey outlier
    // count per return flag (reference vis grouped_box_plots as data)
    "q273_boxplot" -> ((s, d) =>
      graft.vis.VisOps.boxplotStats(
        t(s, d, "lineitem").select(col("l_returnflag"),
          cents(col("l_extendedprice")).as("price_c")),
        "price_c", Seq("l_returnflag"))),

    // Freedman-Diaconis auto-binned histogram of price cents
    // (reference optimal_bins): bin count derived from exact IQR
    "q274_histogram_fd" -> ((s, d) =>
      graft.vis.VisOps.histogramAuto(
        t(s, d, "lineitem").select(cents(col("l_extendedprice"))
          .as("price_c")),
        "price_c", maxBins = 200, barWidth = 40)),

    // pair-plot table: 2-D binned joint distributions for all pairs
    // of (quantity, price, discount) — reference pair_plot as data
    "q275_pair_counts" -> ((s, d) =>
      graft.vis.VisOps.pairCounts(t(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        Map("l_quantity" -> (0.0, 55.0),
          "l_extendedprice" -> (0.0, 120000.0),
          "l_discount" -> (0.0, 0.12)), nBins = 8)),

    // pandas is_monotonic per user: event values ordered by event_id
    "q276_monotonic" -> ((s, d) =>
      graft.ops.PandasOps.isMonotonic(
        t(s, d, "events").select(col("user_id"), col("event_id"),
          cents(col("value")).as("vc")),
        "vc", "event_id", Seq("user_id"))),

    // text-vis parity: per-event-type Unicode sparkline of daily mean
    // value-cents compressed to 20 time buckets (reference
    // vis/direct sparkline)
    "q254_sparkline" -> ((s, d) =>
      graft.vis.VisOps.sparkline(
        t(s, d, "events").select(col("event_type"), col("ts"),
          cents(col("value")).as("vc")),
        "event_type", "ts", "vc", width = 20)),

    // §2.13 Imputer: mean-fill of deterministically synthesized nulls
    // (testdata is complete, so nulls are planted where id % 7 = 0)
    "q256_impute" -> ((s, d) =>
      graft.ml.MlOps.impute(
        t(s, d, "events").select(col("event_id"),
          when(pmod(col("event_id"), lit(7)) === 0, lit(null))
            .otherwise(cents(col("value"))).as("vc")),
        Seq("vc"), "mean")
        .select(col("event_id"), round(col("vc"), 6).as("vc"))),

    // fuzzywuzzy token_sort_ratio over within-brand blocked part-name
    // pairs (word-order-insensitive entity resolution; bounded block
    // join like q219, never all-pairs)
    "q264_token_sort" -> ((s, d) => {
      val p = t(s, d, "part")
        .select(col("p_partkey"), col("p_name"), col("p_brand"))
      p.as("a").join(p.as("b"),
          col("a.p_brand") === col("b.p_brand") &&
            col("a.p_partkey") < col("b.p_partkey"))
        .select(col("a.p_partkey").as("k1"),
          col("b.p_partkey").as("k2"),
          round(graft.functions.TextFunctions.tokenSortRatio(
            col("a.p_name"), col("b.p_name")), 6).as("ratio"))
        .filter(col("ratio") >= 0.6)
    }),

    // §2.8 pandas between_time: trading-hours slice of the event
    // stream (time-of-day predicate, pure map-side)
    "q261_between_time" -> ((s, d) =>
      t(s, d, "events")
        .filter(graft.functions.DtOps.betweenTime(col("ts"),
          "09:30", "16:00"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("value"))).as("value_cents"))),

    // group-wise mean imputation: nulls take their event_type's mean
    // (pandas fillna(groupby.transform('mean')) parity)
    "q259_impute_group" -> ((s, d) =>
      graft.ml.MlOps.imputeByGroup(
        t(s, d, "events").select(col("event_id"), col("event_type"),
          when(pmod(col("event_id"), lit(7)) === 0, lit(null))
            .otherwise(cents(col("value"))).as("vc")),
        "vc", Seq("event_type"))
        .select(col("event_id"), col("event_type"),
          round(col("vc"), 6).as("vc"))))

  val oracle: Map[String, String] = Map(

    "q463_event_journeys" ->
      """WITH j AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    string_agg(substr(event_type, 1, 1), ''
        |      ORDER BY ts, event_id) AS journey
        |  FROM events GROUP BY 1)
        |SELECT user_id, n_events, journey,
        |  CAST(len(regexp_extract_all(journey, 'v+p')) AS BIGINT)
        |    AS n_browse_buy,
        |  CAST(len(regexp_extract_all(journey, 'e{2,}')) AS BIGINT)
        |    AS n_error_streak,
        |  CAST(len(regexp_extract_all(journey, 'sv')) AS BIGINT)
        |    AS n_signup_view
        |FROM j""".stripMargin,

    "q264_token_sort" ->
      """WITH p AS (
        |  SELECT p_partkey, p_brand,
        |    array_to_string(list_sort(list_filter(
        |      string_split(lower(p_name), ' '),
        |      w -> length(w) > 0)), ' ') AS s
        |  FROM part)
        |SELECT k1, k2, ratio FROM (
        |  SELECT a.p_partkey AS k1, b.p_partkey AS k2,
        |    round(1.0 - CAST(levenshtein(a.s, b.s) AS DOUBLE) /
        |      CAST(greatest(length(a.s), length(b.s)) AS DOUBLE), 6)
        |      AS ratio
        |  FROM p a JOIN p b
        |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey)
        |WHERE ratio >= 0.6""".stripMargin,

    "q261_between_time" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS value_cents
        |FROM events
        |WHERE (hour(ts) * 3600 + minute(ts) * 60 +
        |    CAST(date_part('second', ts) AS INT))
        |  BETWEEN 34200 AND 57600
        |GROUP BY 1""".stripMargin,

    "q259_impute_group" ->
      """WITH base AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN event_id % 7 = 0 THEN NULL
        |      ELSE CAST(round(value * 100) AS BIGINT) END AS vc
        |  FROM events),
        |g AS (SELECT event_type,
        |    CAST(CAST(sum(vc) AS BIGINT) AS DOUBLE) /
        |      CAST(CAST(count(vc) AS BIGINT) AS DOUBLE) AS gm
        |  FROM base GROUP BY 1),
        |m AS (SELECT CAST(CAST(sum(vc) AS BIGINT) AS DOUBLE) /
        |    CAST(CAST(count(vc) AS BIGINT) AS DOUBLE) AS mv
        |  FROM base)
        |SELECT b.event_id, b.event_type,
        |  round(coalesce(CAST(b.vc AS DOUBLE), g.gm, m.mv), 6) AS vc
        |FROM base b LEFT JOIN g USING (event_type), m""".stripMargin,

    "q256_impute" ->
      """WITH base AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 7 = 0 THEN NULL
        |      ELSE CAST(round(value * 100) AS BIGINT) END AS vc
        |  FROM events),
        |m AS (SELECT CAST(CAST(sum(vc) AS BIGINT) AS DOUBLE) /
        |    CAST(CAST(count(vc) AS BIGINT) AS DOUBLE) AS mv
        |  FROM base)
        |SELECT event_id,
        |  round(coalesce(CAST(vc AS DOUBLE), mv), 6) AS vc
        |FROM base, m""".stripMargin,

    "q275_pair_counts" ->
      """WITH base AS (SELECT l_quantity AS q, l_extendedprice AS p,
        |    l_discount AS d FROM lineitem),
        |bq AS (SELECT CASE WHEN q IS NOT NULL AND q >= 0.0 AND q < 55.0
        |    THEN CAST(floor((q - 0.0) / (55.0 / 8)) AS INT) END AS bq,
        |  CASE WHEN p IS NOT NULL AND p >= 0.0 AND p < 120000.0
        |    THEN CAST(floor((p - 0.0) / (120000.0 / 8)) AS INT)
        |    END AS bp,
        |  CASE WHEN d IS NOT NULL AND d >= 0.0 AND d < 0.12
        |    THEN CAST(floor((d - 0.0) / (0.12 / 8)) AS INT) END AS bd
        |  FROM base),
        |u AS (
        |  SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
        |    bq AS bx, bp AS by FROM bq
        |  UNION ALL SELECT 'l_quantity', 'l_discount', bq, bd FROM bq
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount', bp, bd
        |    FROM bq)
        |SELECT col_x, col_y, bx, by, CAST(count(*) AS BIGINT) AS cnt
        |FROM u WHERE bx IS NOT NULL AND by IS NOT NULL
        |GROUP BY 1, 2, 3, 4""".stripMargin,

    "q276_monotonic" ->
      """WITH b AS (SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |l AS (SELECT user_id, v, lag(v) OVER
        |    (PARTITION BY user_id ORDER BY event_id) AS p FROM b)
        |SELECT user_id,
        |  coalesce(bool_and(p IS NULL OR v >= p), true) AS increasing,
        |  coalesce(bool_and(p IS NULL OR v <= p), true) AS decreasing,
        |  coalesce(bool_and(p IS NULL OR v > p), true)
        |    AS strict_increasing,
        |  coalesce(bool_and(p IS NULL OR v < p), true)
        |    AS strict_decreasing
        |FROM l GROUP BY 1""".stripMargin,

    "q273_boxplot" ->
      """WITH c AS (SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |vc AS (SELECT l_returnflag, v, CAST(count(*) AS BIGINT) AS c
        |  FROM c GROUP BY 1, 2),
        |cum AS (SELECT l_returnflag, v, c,
        |    sum(c) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw,
        |    sum(c) OVER (PARTITION BY l_returnflag) AS n
        |  FROM vc),
        |st AS (SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
        |    CAST(min(v) AS BIGINT) AS min_v,
        |    CAST(min(CASE WHEN CAST(cw AS DOUBLE) >=
        |      0.25 * CAST(n AS DOUBLE) THEN v END) AS BIGINT) AS q1,
        |    CAST(min(CASE WHEN CAST(cw AS DOUBLE) >=
        |      0.5 * CAST(n AS DOUBLE) THEN v END) AS BIGINT) AS median,
        |    CAST(min(CASE WHEN CAST(cw AS DOUBLE) >=
        |      0.75 * CAST(n AS DOUBLE) THEN v END) AS BIGINT) AS q3,
        |    CAST(max(v) AS BIGINT) AS max_v
        |  FROM cum GROUP BY 1),
        |f AS (SELECT *,
        |    CAST(q1 AS DOUBLE) - 1.5 * CAST(q3 - q1 AS DOUBLE) AS lo_f,
        |    CAST(q3 AS DOUBLE) + 1.5 * CAST(q3 - q1 AS DOUBLE) AS hi_f
        |  FROM st),
        |o AS (SELECT vc.l_returnflag,
        |    CAST(sum(vc.c) AS BIGINT) AS n_outliers
        |  FROM vc JOIN f USING (l_returnflag)
        |  WHERE CAST(vc.v AS DOUBLE) < f.lo_f
        |    OR CAST(vc.v AS DOUBLE) > f.hi_f
        |  GROUP BY 1)
        |SELECT f.l_returnflag, n, min_v, q1, median, q3, max_v,
        |  coalesce(o.n_outliers, 0) AS n_outliers
        |FROM f LEFT JOIN o USING (l_returnflag)""".stripMargin,

    "q274_histogram_fd" ->
      """WITH c AS (SELECT
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |vc AS (SELECT v, CAST(count(*) AS BIGINT) AS c
        |  FROM c GROUP BY 1),
        |cum AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cw,
        |    sum(c) OVER () AS n FROM vc),
        |st AS (SELECT CAST(max(n) AS BIGINT) AS n,
        |    CAST(min(v) AS BIGINT) AS mn, CAST(max(v) AS BIGINT) AS mx,
        |    CAST(min(CASE WHEN CAST(cw AS DOUBLE) >=
        |      0.25 * CAST(n AS DOUBLE) THEN v END) AS BIGINT) AS q1,
        |    CAST(min(CASE WHEN CAST(cw AS DOUBLE) >=
        |      0.75 * CAST(n AS DOUBLE) THEN v END) AS BIGINT) AS q3
        |  FROM cum),
        |p AS (SELECT n, mn, mx,
        |    greatest(1, least(200, CASE WHEN q3 - q1 > 0 THEN
        |      CAST(ceil((CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE)) /
        |        (2.0 * CAST(q3 - q1 AS DOUBLE) *
        |          power(CAST(n AS DOUBLE), -1.0 / 3.0))) AS INT)
        |      ELSE CAST(ceil(ln(CAST(n AS DOUBLE)) / ln(2.0)) AS INT)
        |        + 1 END)) AS nb,
        |    CAST(mn AS DOUBLE) AS lo,
        |    CAST(mx AS DOUBLE) + greatest(abs(CAST(mx AS DOUBLE) -
        |      CAST(mn AS DOUBLE)), 1.0) * 1e-9 AS hi
        |  FROM st),
        |w AS (SELECT nb, lo, hi, (hi - lo) / nb AS width FROM p),
        |b AS (SELECT CAST(floor((CAST(c.v AS DOUBLE) - w.lo) / w.width)
        |      AS INT) AS bin,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM c, w
        |  WHERE CAST(c.v AS DOUBLE) >= w.lo AND CAST(c.v AS DOUBLE) < w.hi
        |  GROUP BY 1),
        |m AS (SELECT max(cnt) AS mxc FROM b)
        |SELECT bin,
        |  round(w.lo + bin * w.width, 6) AS lo_edge,
        |  round(w.lo + (bin + 1) * w.width, 6) AS hi_edge,
        |  cnt,
        |  repeat('#', CAST(cnt * 40 // mxc AS INT)) AS bar
        |FROM b, w, m""".stripMargin,

    "q253_histogram" ->
      """WITH b AS (
        |  SELECT CAST(floor((CAST(l_quantity AS DOUBLE) - 0.0) / 5.0)
        |      AS INT) AS bin,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_quantity >= 0
        |    AND l_quantity < 50
        |  GROUP BY 1),
        |m AS (SELECT max(c) AS mx FROM b)
        |SELECT bin,
        |  round(CAST(bin * 5 AS DOUBLE), 6) AS lo_edge,
        |  round(CAST((bin + 1) * 5 AS DOUBLE), 6) AS hi_edge,
        |  c AS cnt,
        |  repeat('#', CAST(c * 40 // mx AS INT)) AS bar
        |FROM b, m""".stripMargin,

    "q254_sparkline" ->
      """WITH base AS (
        |  SELECT event_type AS k,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL),
        |span AS (SELECT min(d) AS mind, max(d) AS maxd FROM base),
        |bk AS (
        |  SELECT k,
        |    CAST((d - mind) * 20 // (maxd - mind + 1) AS INT) AS bucket,
        |    CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) /
        |      CAST(CAST(count(*) AS BIGINT) AS DOUBLE) AS m
        |  FROM base, span GROUP BY 1, 2),
        |lv AS (SELECT k, bucket, m,
        |    min(m) OVER (PARTITION BY k) AS mn,
        |    max(m) OVER (PARTITION BY k) AS mx
        |  FROM bk),
        |ch AS (SELECT k, bucket,
        |    CASE WHEN mx = mn THEN 0
        |      ELSE least(7, CAST(floor((m - mn) / (mx - mn) * 8)
        |        AS INT)) END AS lvl
        |  FROM lv)
        |SELECT k AS event_type,
        |  string_agg(substring('▁▂▃▄▅▆▇█', lvl + 1, 1), ''
        |    ORDER BY bucket) AS spark
        |FROM ch GROUP BY 1""".stripMargin,

    "q215_funnel" ->
      """WITH e AS (
        |  SELECT user_id AS u, ts, event_type AS et FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IN ('view','click','purchase')),
        |s1 AS (SELECT u, min(ts) AS t FROM e WHERE et='view' GROUP BY u),
        |s2 AS (SELECT e.u, min(e.ts) AS t FROM e JOIN s1 ON e.u=s1.u
        |       WHERE e.et='click' AND e.ts > s1.t GROUP BY e.u),
        |s3 AS (SELECT e.u, min(e.ts) AS t FROM e JOIN s2 ON e.u=s2.u
        |       WHERE e.et='purchase' AND e.ts > s2.t GROUP BY e.u),
        |c AS (SELECT 1 AS step, 'view' AS event_type,
        |        (SELECT count(*) FROM s1) AS n_users
        |      UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |      UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        |SELECT CAST(step AS BIGINT) AS step, event_type,
        |  CAST(n_users AS BIGINT) AS n_users,
        |  CAST(CASE WHEN (SELECT count(*) FROM s1) = 0 THEN 0
        |    ELSE n_users * 1000000 // (SELECT count(*) FROM s1) END
        |    AS BIGINT) AS conversion_ppm
        |FROM c""".stripMargin,

    "q216_retention" ->
      """WITH ev AS (
        |  SELECT o_custkey AS u, date_trunc('month', o_orderdate) AS p
        |  FROM orders WHERE o_custkey IS NOT NULL),
        |fs AS (SELECT u, min(p) AS cohort FROM ev GROUP BY u)
        |SELECT CAST(cohort AS DATE) AS cohort,
        |  CAST(date_diff('month', cohort, p) AS BIGINT) AS offset,
        |  CAST(count(DISTINCT ev.u) AS BIGINT) AS n_users
        |FROM ev JOIN fs ON ev.u = fs.u
        |GROUP BY 1, 2""".stripMargin,

    "q217_markov" ->
      """WITH pairs AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events WHERE user_id IS NOT NULL
        |    AND event_type IS NOT NULL),
        |cnt AS (SELECT from_type, to_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS t
        |  FROM cnt GROUP BY 1)
        |SELECT cnt.from_type, cnt.to_type, cnt.n,
        |  round(CAST(cnt.n AS DOUBLE) / t, 6) AS p
        |FROM cnt JOIN tot ON cnt.from_type = tot.from_type""".stripMargin,

    "q244_seq_trigrams" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS g1,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS g2
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL)
        |SELECT event_type || '>' || g1 || '>' || g2 AS ngram,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM e WHERE g1 IS NOT NULL AND g2 IS NOT NULL
        |GROUP BY 1 HAVING count(*) >= 5""".stripMargin,

    "q218_rfm" ->
      """WITH agg AS (
        |  SELECT o_custkey, max(o_orderdate) AS last_d,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS monetary_cents
        |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
        |mx AS (SELECT max(last_d) AS maxd FROM agg)
        |SELECT o_custkey,
        |  CAST(date_diff('day', CAST(last_d AS DATE),
        |    CAST(maxd AS DATE)) AS BIGINT) AS recency_days,
        |  frequency, monetary_cents,
        |  CASE
        |    WHEN date_diff('day', CAST(last_d AS DATE),
        |        CAST(maxd AS DATE)) <= 365
        |      AND frequency >= 10
        |      AND monetary_cents >= 10000000 THEN 'champion'
        |    WHEN date_diff('day', CAST(last_d AS DATE),
        |        CAST(maxd AS DATE)) <= 365 THEN 'recent'
        |    WHEN frequency >= 10
        |      OR monetary_cents >= 10000000 THEN 'loyal_lapsed'
        |    ELSE 'hibernating' END AS segment
        |FROM agg, mx""".stripMargin,

    "q219_jaro_winkler" ->
      """SELECT a.p_partkey AS k1, b.p_partkey AS k2,
        |  round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.85
        |""".stripMargin,

    "q220_weighted_quantile" ->
      """WITH c AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
        |    CAST(l_quantity AS BIGINT) AS w, l_orderkey
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
        |cum AS (
        |  SELECT l_returnflag, price_c,
        |    sum(w) OVER (PARTITION BY l_returnflag
        |      ORDER BY price_c, l_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    sum(w) OVER (PARTITION BY l_returnflag) AS tw
        |  FROM c)
        |SELECT l_returnflag, q, CAST(min(price_c) AS BIGINT) AS wq
        |FROM cum CROSS JOIN
        |  (SELECT unnest([0.25, 0.5, 0.75]) AS q) qs
        |WHERE CAST(cw AS DOUBLE) >= q * CAST(tw AS DOUBLE)
        |GROUP BY 1, 2""".stripMargin,

    "q221_cov_matrix" ->
      """WITH c AS (
        |  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS q,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
        |    CAST(round(l_discount * 100) AS BIGINT) AS dd
        |  FROM lineitem),
        |s AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(q) AS DOUBLE) AS sq, CAST(sum(p) AS DOUBLE) AS sp,
        |    CAST(sum(dd) AS DOUBLE) AS sd,
        |    CAST(sum(q * p) AS DOUBLE) AS sqp,
        |    CAST(sum(q * dd) AS DOUBLE) AS sqd,
        |    CAST(sum(p * dd) AS DOUBLE) AS spd
        |  FROM c)
        |SELECT 'qty_c' AS col_a, 'price_c' AS col_b,
        |  round((n * sqp - sq * sp) / (n * (n - 1.0)), 6) AS cov FROM s
        |UNION ALL
        |SELECT 'qty_c', 'disc_c',
        |  round((n * sqd - sq * sd) / (n * (n - 1.0)), 6) FROM s
        |UNION ALL
        |SELECT 'price_c', 'disc_c',
        |  round((n * spd - sp * sd) / (n * (n - 1.0)), 6) FROM s
        |""".stripMargin,

    "q222_mahalanobis" ->
      """WITH c AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(CAST(l_quantity AS BIGINT) AS BIGINT) AS q,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS p
        |  FROM lineitem),
        |s AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(q) AS DOUBLE) AS sq, CAST(sum(p) AS DOUBLE) AS sp,
        |    CAST(sum(q * q) AS DOUBLE) AS sqq,
        |    CAST(sum(p * p) AS DOUBLE) AS spp,
        |    CAST(sum(q * p) AS DOUBLE) AS sqp
        |  FROM c WHERE q IS NOT NULL AND p IS NOT NULL),
        |k AS (
        |  SELECT n, sq, sp,
        |    (n * sqq - sq * sq) / (n * (n - 1.0)) AS aa,
        |    (n * sqp - sq * sp) / (n * (n - 1.0)) AS bb,
        |    (n * spp - sp * sp) / (n * (n - 1.0)) AS cc
        |  FROM s)
        |SELECT l_orderkey, l_linenumber,
        |  round((cc * (q - sq / n) * (q - sq / n)
        |    - 2.0 * bb * (q - sq / n) * (p - sp / n)
        |    + aa * (p - sp / n) * (p - sp / n))
        |    / (aa * cc - bb * bb), 6) AS dist2
        |FROM c, k
        |WHERE (cc * (q - sq / n) * (q - sq / n)
        |    - 2.0 * bb * (q - sq / n) * (p - sp / n)
        |    + aa * (p - sp / n) * (p - sp / n))
        |    / (aa * cc - bb * bb) > 9.0""".stripMargin,

    "q223_haversine" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST((CAST(round(c_acctbal * 100) AS BIGINT) % 18000
        |      + 18000) % 18000 AS DOUBLE) / 100.0 - 90.0 AS clat,
        |    CAST((CAST(round(c_acctbal * 100) AS BIGINT) % 36000
        |      + 36000) % 36000 AS DOUBLE) / 100.0 - 180.0 AS clon
        |  FROM customer),
        |supp AS (
        |  SELECT s_nationkey,
        |    CAST((CAST(round(s_acctbal * 100) AS BIGINT) % 18000
        |      + 18000) % 18000 AS DOUBLE) / 100.0 - 90.0 AS slat,
        |    CAST((CAST(round(s_acctbal * 100) AS BIGINT) % 36000
        |      + 36000) % 36000 AS DOUBLE) / 100.0 - 180.0 AS slon
        |  FROM supplier)
        |SELECT c_custkey, round(min(
        |  2.0 * 6371.0088 * asin(sqrt(
        |    sin(radians(slat - clat) / 2.0) *
        |      sin(radians(slat - clat) / 2.0) +
        |    cos(radians(clat)) * cos(radians(slat)) *
        |      sin(radians(slon - clon) / 2.0) *
        |      sin(radians(slon - clon) / 2.0)))), 6) AS nearest_km
        |FROM cust JOIN supp ON c_nationkey = s_nationkey
        |GROUP BY 1""".stripMargin,

    // identical derived coordinates, identical 3x3 neighbor-cell
    // equi-join and haversine filter
    "q434_radius_join" ->
      """WITH cust AS (
        |  SELECT c_custkey,
        |    CAST((CAST(round(c_acctbal * 100) AS BIGINT) % 12000
        |      + 12000) % 12000 AS DOUBLE) / 100.0 - 60.0 AS clat,
        |    CAST((CAST(round(c_acctbal * 100) AS BIGINT) % 36000
        |      + 36000) % 36000 AS DOUBLE) / 100.0 - 180.0 AS clon
        |  FROM customer),
        |supp AS (
        |  SELECT s_suppkey,
        |    CAST((CAST(round(s_acctbal * 100) AS BIGINT) % 12000
        |      + 12000) % 12000 AS DOUBLE) / 100.0 - 60.0 AS slat,
        |    CAST((CAST(round(s_acctbal * 100) AS BIGINT) % 36000
        |      + 36000) % 36000 AS DOUBLE) / 100.0 - 180.0 AS slon
        |  FROM supplier),
        |ca AS (
        |  SELECT c.*, CAST(floor(clat / 3.7) AS BIGINT) + dx.i
        |      AS jlat,
        |    CAST(floor(clon / 3.7) AS BIGINT) + dy.i AS jlon
        |  FROM cust c, generate_series(-1, 1) AS dx(i),
        |    generate_series(-1, 1) AS dy(i)),
        |cb AS (
        |  SELECT s.*, CAST(floor(slat / 3.7) AS BIGINT) AS jlat,
        |    CAST(floor(slon / 3.7) AS BIGINT) AS jlon
        |  FROM supp s),
        |pairs AS (
        |  SELECT c_custkey, s_suppkey,
        |    2.0 * 6371.0088 * asin(sqrt(
        |      sin(radians(slat - clat) / 2.0) *
        |        sin(radians(slat - clat) / 2.0) +
        |      cos(radians(clat)) * cos(radians(slat)) *
        |        sin(radians(slon - clon) / 2.0) *
        |        sin(radians(slon - clon) / 2.0))) AS km
        |  FROM ca JOIN cb USING (jlat, jlon))
        |SELECT c_custkey, s_suppkey, round(km, 6) AS distance_km
        |FROM pairs WHERE km <= 200.0""".stripMargin,

    "q224_rolling_skew_kurt" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(round(value) AS BIGINT) AS v
        |  FROM events),
        |s AS (
        |  SELECT event_id, user_id,
        |    CAST(count(v) OVER w AS DOUBLE) AS m,
        |    CAST(sum(v) OVER w AS DOUBLE) AS s1,
        |    CAST(sum(v * v) OVER w AS DOUBLE) AS s2,
        |    CAST(sum(v * v * v) OVER w AS DOUBLE) AS s3,
        |    CAST(sum(v * v * v * v) OVER w AS DOUBLE) AS s4
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        |  CASE WHEN m >= 10 AND (s2 - (s1 / m) * s1) > 0 AND m > 2
        |    THEN round((m * sqrt(m - 1.0) / (m - 2.0)) *
        |      ((s3 - 3.0 * (s1 / m) * s2
        |        + 2.0 * (s1 / m) * (s1 / m) * s1)
        |       / power(s2 - (s1 / m) * s1, 1.5)), 6) END AS skew,
        |  CASE WHEN m >= 10 AND (s2 - (s1 / m) * s1) > 0 AND m > 3
        |    THEN round(m * (m + 1.0) * (m - 1.0) *
        |      (s4 - 4.0 * (s1 / m) * s3
        |        + 6.0 * (s1 / m) * (s1 / m) * s2
        |        - 3.0 * (s1 / m) * (s1 / m) * (s1 / m) * s1)
        |      / ((m - 2.0) * (m - 3.0) * (s2 - (s1 / m) * s1)
        |        * (s2 - (s1 / m) * s1))
        |      - 3.0 * (m - 1.0) * (m - 1.0)
        |        / ((m - 2.0) * (m - 3.0)), 6) END AS kurt
        |FROM s""".stripMargin,

    "q225_scd2" ->
      """WITH f AS (
        |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
        |    CASE WHEN lag(o_orderpriority) OVER w
        |      IS NOT DISTINCT FROM o_orderpriority THEN 0 ELSE 1 END
        |      AS chg
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey)),
        |g AS (
        |  SELECT o_custkey, o_orderpriority, o_orderdate,
        |    sum(chg) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM f),
        |runs AS (
        |  SELECT o_custkey, grp, min(o_orderpriority) AS o_orderpriority,
        |    min(o_orderdate) AS valid_from
        |  FROM g GROUP BY 1, 2)
        |SELECT o_custkey, o_orderpriority,
        |  CAST(valid_from AS DATE) AS valid_from,
        |  CAST(lead(valid_from) OVER (PARTITION BY o_custkey
        |    ORDER BY grp) AS DATE) AS valid_to
        |FROM runs""".stripMargin,

    "q226_pinball" ->
      """WITH c AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
        |    CAST(l_quantity AS BIGINT) * 3000 AS yhat
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL)
        |SELECT q, round(sum(greatest(
        |    q * (CAST(y AS DOUBLE) - CAST(yhat AS DOUBLE)),
        |    (q - 1.0) * (CAST(y AS DOUBLE) - CAST(yhat AS DOUBLE))))
        |  / count(*), 6) AS pinball
        |FROM c CROSS JOIN (SELECT unnest([0.25, 0.5, 0.75]) AS q) qs
        |GROUP BY 1""".stripMargin,

    "q295_seq_patterns" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |nu AS (
        |  SELECT CAST(count(DISTINCT user_id) AS DOUBLE) AS n FROM e),
        |singles AS (
        |  SELECT event_type AS pattern,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS freq
        |  FROM e GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type || '>' || b.event_type AS pattern,
        |    CAST(count(DISTINCT a.user_id) AS BIGINT) AS freq
        |  FROM e a JOIN e b
        |    ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  GROUP BY 1),
        |allp AS (
        |  SELECT * FROM singles UNION ALL SELECT * FROM pairs)
        |SELECT pattern, freq FROM allp, nu
        |WHERE freq >= ceil(0.3 * n)
        |ORDER BY pattern""".stripMargin,

    "q227_freq_itemsets" ->
      """WITH types AS (
        |  SELECT it, row_number() OVER (ORDER BY it) - 1 AS b
        |  FROM (SELECT DISTINCT event_type AS it FROM events
        |        WHERE event_type IS NOT NULL)),
        |ut AS (SELECT DISTINCT user_id AS u, event_type AS it
        |  FROM events WHERE user_id IS NOT NULL
        |    AND event_type IS NOT NULL),
        |um AS (SELECT u, CAST(sum(1 << b) AS BIGINT) AS m
        |  FROM ut JOIN types USING (it) GROUP BY u),
        |masks AS (SELECT range AS mk FROM range(1, 1024)
        |  WHERE range < CAST(power(2,
        |    (SELECT count(*) FROM types)) AS BIGINT)),
        |scored AS (
        |  SELECT
        |    (SELECT string_agg(it, ',' ORDER BY it) FROM types
        |     WHERE (mk >> b) & 1 = 1) AS itemset,
        |    CAST((SELECT count(*) FROM um WHERE (m & mk) = mk)
        |      AS BIGINT) AS freq
        |  FROM masks)
        |SELECT itemset, freq FROM scored
        |WHERE freq >= CAST(ceil(0.4 * (SELECT count(*) FROM um))
        |  AS BIGINT)""".stripMargin,

    "q228_assoc_rules" ->
      """WITH ut AS (SELECT DISTINCT user_id AS u, event_type AS it
        |  FROM events WHERE user_id IS NOT NULL
        |    AND event_type IS NOT NULL),
        |nb AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n FROM ut),
        |mc AS (SELECT CAST(ceil(0.4 * n) AS BIGINT) AS t FROM nb),
        |singles AS (SELECT it, CAST(count(*) AS BIGINT) AS f
        |  FROM ut GROUP BY 1),
        |pairs AS (
        |  SELECT a.it AS i1, b.it AS i2,
        |    CAST(count(*) AS BIGINT) AS fab
        |  FROM ut a JOIN ut b ON a.u = b.u AND a.it < b.it
        |  GROUP BY 1, 2),
        |dirs AS (
        |  SELECT i1 AS antecedent, i2 AS consequent, fab FROM pairs
        |  UNION ALL
        |  SELECT i2, i1, fab FROM pairs)
        |SELECT antecedent, consequent, fab,
        |  round(CAST(fab AS DOUBLE) / fa, 6) AS confidence,
        |  round(CAST(fab AS DOUBLE) / fa /
        |    (CAST(fb AS DOUBLE) / n), 6) AS lift
        |FROM (
        |  SELECT b2.antecedent, b2.consequent, b2.fab,
        |    sa.f AS fa, sc.f AS fb
        |  FROM dirs b2
        |  JOIN singles sa ON sa.it = b2.antecedent
        |  JOIN singles sc ON sc.it = b2.consequent), nb, mc
        |WHERE fab >= t AND fa >= t AND fb >= t""".stripMargin,

    "q229_isotonic" ->
      """WITH lv AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    sum(CAST(l_extendedprice * 100 AS BIGINT)) AS s,
        |    CAST(count(*) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1),
        |iv AS (
        |  SELECT j.x AS jx, k.x AS kx,
        |    sum(m.s) * 1.0 / sum(m.w) AS a
        |  FROM lv j JOIN lv k ON j.x <= k.x
        |  JOIN lv m ON m.x BETWEEN j.x AND k.x
        |  GROUP BY 1, 2),
        |mn AS (
        |  SELECT iv.jx, i.x AS ix, min(iv.a) AS m
        |  FROM iv JOIN lv i ON iv.jx <= i.x AND i.x <= iv.kx
        |  GROUP BY 1, 2)
        |SELECT ix AS x, round(max(m) / 100.0, 2) AS fit
        |FROM mn GROUP BY 1""".stripMargin,

    "q230_periodogram" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS dd, CAST(count(*) AS DOUBLE) AS y
        |  FROM orders GROUP BY 1),
        |st AS (SELECT avg(y) AS m, CAST(count(*) AS DOUBLE) AS n
        |  FROM daily),
        |c AS (SELECT y - m AS cv,
        |    CAST(row_number() OVER (ORDER BY dd) - 1 AS DOUBLE) AS tt,
        |    n
        |  FROM daily, st),
        |e AS (SELECT k.range AS k, cv,
        |    2.0 * pi() * k.range * tt / n AS ang
        |  FROM c, range(1, 9) k)
        |SELECT CAST(k AS BIGINT) AS k,
        |  round((sum(cv * cos(ang)) * sum(cv * cos(ang)) +
        |         sum(cv * sin(ang)) * sum(cv * sin(ang)))
        |    / sum(cv * cv), 6) AS power
        |FROM e GROUP BY 1""".stripMargin,

    "q231_attribution" ->
      """WITH st AS (
        |  SELECT event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |      THEN event_type END IGNORE NULLS) OVER w AS lt,
        |    first_value(CASE WHEN event_type <> 'purchase'
        |      THEN event_type END IGNORE NULLS) OVER w AS ft,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      OVER w AS n_click,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      OVER w AS n_error,
        |    sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |      OVER w AS n_signup,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      OVER w AS n_view
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |conv AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
        |    lt, ft, n_click, n_error, n_signup, n_view,
        |    n_click + n_error + n_signup + n_view AS k
        |  FROM st WHERE event_type = 'purchase' AND lt IS NOT NULL),
        |per AS (
        |  SELECT 'click' AS channel,
        |    CASE WHEN lt = 'click' THEN cents ELSE 0 END AS l,
        |    CASE WHEN ft = 'click' THEN cents ELSE 0 END AS f,
        |    CAST(round(cents * n_click / k) AS BIGINT) AS lc
        |  FROM conv
        |  UNION ALL
        |  SELECT 'error',
        |    CASE WHEN lt = 'error' THEN cents ELSE 0 END,
        |    CASE WHEN ft = 'error' THEN cents ELSE 0 END,
        |    CAST(round(cents * n_error / k) AS BIGINT)
        |  FROM conv
        |  UNION ALL
        |  SELECT 'signup',
        |    CASE WHEN lt = 'signup' THEN cents ELSE 0 END,
        |    CASE WHEN ft = 'signup' THEN cents ELSE 0 END,
        |    CAST(round(cents * n_signup / k) AS BIGINT)
        |  FROM conv
        |  UNION ALL
        |  SELECT 'view',
        |    CASE WHEN lt = 'view' THEN cents ELSE 0 END,
        |    CASE WHEN ft = 'view' THEN cents ELSE 0 END,
        |    CAST(round(cents * n_view / k) AS BIGINT)
        |  FROM conv)
        |SELECT channel,
        |  CAST(sum(l) AS BIGINT) AS last_touch_cents,
        |  CAST(sum(f) AS BIGINT) AS first_touch_cents,
        |  CAST(sum(lc) AS BIGINT) AS linear_cents
        |FROM per GROUP BY 1""".stripMargin)
}
