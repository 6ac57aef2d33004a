package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.graphops.GraphOps
import graft.timeseries.TimeSeriesOps
import graft.stats.StatsOps
import Q._

/** Statistics (§2.12), time series (§2.11), graph (§2.14). Test
  * statistics are computed from exact integer sufficient statistics
  * with formulas mirrored verbatim in the oracle so doubles are
  * bit-deterministic.
  */
object QueriesStats {

  val queries: Map[String, QueryFn] = Map(

    // §2.12 two-sample Kolmogorov-Smirnov: click vs view value-cents
    // distributions, asymptotic p from Kolmogorov's series
    "q239_ks_test" -> ((s, d) =>
      graft.stats.TwoSampleOps.ksTwoSample(
        t(s, d, "events").select(col("event_type"),
          cents(col("value")).as("vc")),
        "vc", "event_type", "click", "view")),

    // Jensen-Shannon divergence between the event-type mixes of the
    // even- and odd-user cohorts (drift detection primitive)
    "q240_jensen_shannon" -> ((s, d) =>
      graft.stats.TwoSampleOps.jensenShannon(
        t(s, d, "events").filter(col("user_id").isNotNull)
          .select(col("event_type"),
            when(pmod(col("user_id"), lit(2)) === 0, "even")
              .otherwise("odd").as("cohort")),
        "event_type", "cohort", "even", "odd")),

    // Pettitt changepoint over the daily event-revenue series
    "q241_pettitt" -> ((s, d) =>
      graft.timeseries.TimeSeriesOps.pettitt(
        t(s, d, "events").groupBy(to_date(col("ts")).as("day"))
          .agg(sum(cents(col("value"))).as("vc")),
        "vc", "day")),

    // Cliff's delta ordinal effect size, click vs view value cents
    "q242_cliffs_delta" -> ((s, d) =>
      graft.stats.TwoSampleOps.cliffsDelta(
        t(s, d, "events").select(col("event_type"),
          cents(col("value")).as("vc")),
        "vc", "event_type", "click", "view")),

    // Hodges-Lehmann median pairwise account-balance shift between
    // two customer nations (weighted distinct-value pair table)
    "q243_hodges_lehmann" -> ((s, d) =>
      graft.stats.TwoSampleOps.hodgesLehmannShift(
        t(s, d, "customer").select(
          col("c_nationkey").cast("string").as("nk"),
          cents(col("c_acctbal")).as("ac")),
        "ac", "nk", "2", "7")),

    // per-group OLS: price-dollars ~ quantity slope per return flag,
    // one hash aggregate for every group (groupby().apply(ols) parity)
    "q245_grouped_ols" -> ((s, d) =>
      graft.stats.StatsOps.groupedLinearRegression(
        t(s, d, "lineitem").select(col("l_returnflag"),
          col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice")).cast("long").as("y")),
        "x", "y", Seq("l_returnflag"))),

    // §2.12 two-sample Cramér-von Mises criterion, click vs view
    // value-cents (exact scaled-integer rank-run sums)
    "q246_cramer_von_mises" -> ((s, d) =>
      graft.stats.TwoSampleOps.cramerVonMises(
        t(s, d, "events").select(col("event_type"),
          cents(col("value")).as("vc")),
        "vc", "event_type", "click", "view")),

    // §2.12 Tukey HSD post-hoc over event-type value cents
    "q205_tukey_hsd" -> ((s, d) =>
      StatsOps.tukeyHsd(
        t(s, d, "events").select(col("event_type"),
          cents(col("value")).as("vc")),
        "vc", "event_type")),

    // §2.12 Cronbach's alpha over per-user click/view/purchase cents
    "q206_cronbach" -> ((s, d) =>
      StatsOps.cronbachAlpha(
        t(s, d, "events").filter(col("user_id").isNotNull)
          .groupBy("user_id").agg(
            coalesce(sum(when(col("event_type") === "click",
              cents(col("value")))), lit(0L)).as("c"),
            coalesce(sum(when(col("event_type") === "view",
              cents(col("value")))), lit(0L)).as("v"),
            coalesce(sum(when(col("event_type") === "purchase",
              cents(col("value")))), lit(0L)).as("p")),
        Seq("c", "v", "p"))),

    // §2.12 Lin's CCC between hourly click and purchase cents
    "q207_ccc" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy((unix_timestamp(date_trunc("hour", col("ts"))) / 3600L)
          .cast("long").as("hr"))
        .agg(sum(when(col("event_type") === "click",
            cents(col("value")))).as("x"),
          sum(when(col("event_type") === "purchase",
            cents(col("value")))).as("y"))
      graft.ml.MlMetrics.concordanceCcc(hourly, "x", "y")
    }),

    // §2.12 Hellinger distance between the event-type mixes of even
    // and odd user cohorts
    "q208_hellinger" -> ((s, d) =>
      StatsOps.hellinger(
        t(s, d, "events").select(col("event_type"),
          (pmod(col("user_id"), lit(2)) === 0).as("side")),
        "event_type", "side")),

    // §2.12 1-D EMD between purchase and click value distributions
    // (dollar bins)
    "q209_emd" -> ((s, d) =>
      StatsOps.emd1d(
        t(s, d, "events").select(
          floor(col("value")).cast("long").as("vd"),
          col("event_type")),
        "vd", "event_type", "purchase", "click")),

    // §2.11 resample events to hourly buckets
    "q39_resample" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("value"))).as("sum_c"),
          min(cents(col("value"))).as("min_c"),
          max(cents(col("value"))).as("max_c"))),

    // §2.12 McNemar paired-binary test: per-user purchase-vs-click
    // high-value flags
    "q165_mcnemar" -> ((s, d) =>
      StatsOps.mcnemar(
        t(s, d, "events").groupBy("user_id").agg(
          max(when(col("event_type") === "purchase" &&
            col("value") >= 50.0, 1L).otherwise(0L)).as("x"),
          max(when(col("event_type") === "click" &&
            col("value") >= 50.0, 1L).otherwise(0L)).as("y")),
        "x", "y")),

    // §2.12 Cochran's Q over three binary treatments per user
    // (complete grid, absent cells = 0)
    "q166_cochran_q" -> ((s, d) => {
      val ev = t(s, d, "events")
        .filter(col("event_type").isin("click", "view", "purchase"))
      val cells = ev.groupBy(col("user_id"), col("event_type"))
        .agg(max(when(col("value") >= 60.0, 1L).otherwise(0L)).as("x"))
      val grid = ev.select("user_id").distinct()
        .withColumn("event_type", explode(array(
          lit("click"), lit("view"), lit("purchase"))))
      val full = grid.join(cells, Seq("user_id", "event_type"), "left")
        .na.fill(0L, Seq("x"))
      StatsOps.cochranQ(full, "user_id", "event_type", "x")
    }),

    // §2.12 Fisher's exact test: purchase-high vs error-high per user
    "q167_fisher" -> ((s, d) =>
      StatsOps.fisherExact(
        t(s, d, "events").groupBy("user_id").agg(
          max(when(col("event_type") === "purchase" &&
            col("value") >= 80.0, 1L).otherwise(0L)).as("x"),
          max(when(col("event_type") === "error" &&
            col("value") >= 80.0, 1L).otherwise(0L)).as("y")),
        "x", "y")),

    // §2.11 cross-correlation of hourly click vs purchase cents at
    // lags -6..6
    "q189_ccf" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy((unix_timestamp(date_trunc("hour", col("ts"))) / 3600L)
          .cast("long").as("hr"))
        .agg(sum(when(col("event_type") === "click",
            cents(col("value")))).as("x"),
          sum(when(col("event_type") === "purchase",
            cents(col("value")))).as("y"))
      TimeSeriesOps.ccf(hourly, "x", "y", "hr", maxLag = 6)
    }),

    // §2.11 order-1 Granger F: do click cents help predict purchase
    // cents next hour? (statistic + dfs mirrored; F p spec-anchored)
    "q190_granger" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy((unix_timestamp(date_trunc("hour", col("ts"))) / 3600L)
          .cast("long").as("hr"))
        .agg(sum(when(col("event_type") === "click",
            cents(col("value")))).as("x"),
          sum(when(col("event_type") === "purchase",
            cents(col("value")))).as("y"))
      TimeSeriesOps.grangerF(hourly, "x", "y", "hr")
        .select("f_stat", "df1", "df2")
    }),

    // §2.12 Dunn's post-hoc after KW: pairwise mean-rank z across
    // event types, BH-adjusted
    "q187_dunn" -> ((s, d) =>
      StatsOps.dunnTest(
        t(s, d, "events").withColumn("vc", cents(col("value"))),
        "vc", "event_type")),

    // §2.12 Chow structural-break test of price~quantity split at
    // ship-year 1997 (statistic + dfs mirrored; F p is driver-side,
    // spec-anchored — not part of the hash gate)
    "q188_chow" -> ((s, d) =>
      StatsOps.chowTest(
        t(s, d, "lineitem").select(
          col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice")).cast("long").as("y"),
          col("l_shipdate")),
        "x", "y", year(col("l_shipdate")) < 1997)
        .select("f_stat", "df1", "df2")),

    // §2.11 CUSUM changepoint scan per event type over the hourly
    // resampled cents series
    "q185_cusum" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .groupBy(col("event_type"),
          (unix_timestamp(date_trunc("hour", col("ts"))) / 3600L)
            .cast("long").as("hr"))
        .agg(sum(cents(col("value"))).as("v"))
      TimeSeriesOps.cusumChangepoint(hourly, "v", "hr",
        Seq("event_type"))
    }),

    // §2.12 Kaplan-Meier survival: per-user activity span in days,
    // event = made a purchase (else censored)
    "q183_kaplan_meier" -> ((s, d) =>
      StatsOps.kaplanMeier(
        t(s, d, "events").groupBy("user_id").agg(
          datediff(max(col("ts")), min(col("ts"))).cast("long").as("dur"),
          max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("ev")),
        "dur", "ev")),

    // §2.12 restricted mean survival time over the same survival
    // data: expected active days within the first 30 — the step
    // integral of the KM curve from its bounded distinct-duration
    // table
    "q378_rmst" -> ((s, d) =>
      StatsOps.rmst(
        t(s, d, "events").groupBy("user_id").agg(
          datediff(max(col("ts")), min(col("ts"))).cast("long")
            .as("dur"),
          max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("ev")),
        "dur", "ev", tau = 30.0)
        .select(col("tau"), round(col("rmst"), 6).as("rmst"),
          col("n_steps"))),

    // §2.12 Nelson-Aalen cumulative hazard over the same survival data
    "q213_nelson_aalen" -> ((s, d) =>
      StatsOps.nelsonAalen(
        t(s, d, "events").groupBy("user_id").agg(
          datediff(max(col("ts")), min(col("ts"))).cast("long").as("dur"),
          max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("ev")),
        "dur", "ev")),

    // §2.12 log-rank test between even and odd user cohorts on the
    // same survival data
    "q184_logrank" -> ((s, d) =>
      StatsOps.logRank(
        t(s, d, "events").groupBy("user_id").agg(
          datediff(max(col("ts")), min(col("ts"))).cast("long").as("dur"),
          max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("ev"))
          .withColumn("grp",
            when(pmod(col("user_id"), lit(2)) === 0, "even")
              .otherwise("odd")),
        "dur", "ev", "grp", "even", "odd")),

    // §2.12 Theil T inequality index over extended-price cents
    "q180_theil" -> ((s, d) =>
      StatsOps.theilIndex(
        t(s, d, "lineitem")
          .select(cents(col("l_extendedprice")).as("pc")),
        "pc")),

    // §2.12 Herfindahl concentration of documents across sources
    "q181_hhi" -> ((s, d) =>
      StatsOps.herfindahl(t(s, d, "documents"), "source")),

    // §2.12 Jonckheere-Terpstra ordered-alternative trend across
    // click < error < purchase value distributions
    "q177_jonckheere" -> ((s, d) =>
      StatsOps.jonckheereTerpstra(
        t(s, d, "events").withColumn("vc", cents(col("value"))),
        "vc", "event_type", Seq("click", "error", "purchase"))),

    // §2.12 PSI drift between purchase and click value distributions
    // over fixed cent breaks
    "q175_psi" -> ((s, d) =>
      StatsOps.psi(
        t(s, d, "events").withColumn("vc", cents(col("value"))),
        "vc", "event_type", "purchase", "click",
        breaks = Seq(1000.0, 2500.0, 4000.0, 5500.0, 7000.0, 8500.0))),

    // §2.12 exact tie-correct Gini over extended-price cents
    "q176_gini" -> ((s, d) =>
      StatsOps.gini(
        t(s, d, "lineitem")
          .select(cents(col("l_extendedprice")).as("pc")),
        "pc")),

    // §2.12 Mantel-Haenszel pooled odds ratio across user strata
    "q173_mantel_haenszel" -> ((s, d) =>
      StatsOps.mantelHaenszel(
        t(s, d, "events").groupBy("user_id").agg(
          max(when(col("event_type") === "purchase" &&
            col("value") >= 80.0, 1L).otherwise(0L)).as("x"),
          max(when(col("event_type") === "error" &&
            col("value") >= 80.0, 1L).otherwise(0L)).as("y"))
          .withColumn("stratum",
            pmod(col("user_id"), lit(5)).cast("long")),
        "stratum", "x", "y")),

    // §2.12 CUPED adjusted metric: per-user purchase cents adjusted
    // by the click-cents covariate
    "q174_cuped" -> ((s, d) =>
      StatsOps.cuped(
        t(s, d, "events").groupBy("user_id").agg(
          coalesce(sum(when(col("event_type") === "click",
            cents(col("value")))), lit(0L)).as("x"),
          coalesce(sum(when(col("event_type") === "purchase",
            cents(col("value")))), lit(0L)).as("y")),
        "y", "x")
        .select(col("user_id"), col("x"), col("y"),
          round(col("y_cuped"), 6).as("y_cuped"))),

    // §2.12 partial correlation of quantity and price controlling
    // for discount (q61's integer-sum regime)
    "q171_partial_corr" -> ((s, d) =>
      StatsOps.partialCorr(
        t(s, d, "lineitem").select(
          col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice")).cast("long").as("y"),
          cents(col("l_discount")).as("z")),
        "x", "y", "z")),

    // §2.12 winsorize extended-price cents at the exact 5th/95th
    // percentiles
    "q172_winsorize" -> ((s, d) =>
      StatsOps.winsorize(
        t(s, d, "lineitem").select(col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          cents(col("l_extendedprice")).as("pc")),
        "pc")
        .select(col("l_orderkey"), col("l_linenumber"), col("pc"),
          round(col("pc_wins"), 6).as("wins"))),

    // §2.12 odds ratio + Wald CI on the purchase/error 2×2 (A/B
    // effect-size companion to q167)
    "q170_odds_ratio" -> ((s, d) =>
      StatsOps.oddsRatio(
        t(s, d, "events").groupBy("user_id").agg(
          max(when(col("event_type") === "purchase" &&
            col("value") >= 80.0, 1L).otherwise(0L)).as("x"),
          max(when(col("event_type") === "error" &&
            col("value") >= 80.0, 1L).otherwise(0L)).as("y")),
        "x", "y")),

    // §2.12 Spearman rank correlation of quantity vs extended price
    // (pandas corr(method='spearman')) — exact doubled-rank sums
    "q162_spearman" -> ((s, d) =>
      StatsOps.spearmanCorr(
        t(s, d, "lineitem")
          .select(cents(col("l_quantity")).as("qc"),
            cents(col("l_extendedprice")).as("pc")),
        "qc", "pc")),

    // §2.12 Kendall τ-b of quantity vs discount cents (bounded
    // domains — distinct-cell self-join)
    "q163_kendall" -> ((s, d) =>
      StatsOps.kendallTauB(
        t(s, d, "lineitem")
          .select(cents(col("l_quantity")).as("qc"),
            cents(col("l_discount")).as("dc")),
        "qc", "dc")),

    // §2.12 Friedman repeated-measures test: blocks = hour-of-day,
    // treatments = event type, one summed-cents cell per pair
    "q157_friedman" -> ((s, d) =>
      StatsOps.friedman(
        t(s, d, "events")
          .groupBy(hour(col("ts")).as("blk"), col("event_type"))
          .agg(sum(cents(col("value"))).as("v")),
        "blk", "event_type", "v")),

    // §2.12 Page's L trend test on the same block design, treatments
    // hypothesized in alphabetical order
    "q158_page_trend" -> ((s, d) =>
      StatsOps.pageTrend(
        t(s, d, "events")
          .groupBy(hour(col("ts")).as("blk"), col("event_type"))
          .agg(sum(cents(col("value"))).as("v")),
        "blk", "event_type", "v",
        when(col("event_type") === "click", 1)
          .when(col("event_type") === "error", 2)
          .when(col("event_type") === "purchase", 3)
          .when(col("event_type") === "signup", 4)
          .otherwise(5))),

    // §2.12 Benford first-digit audit over extended-price cents
    "q161_benford" -> ((s, d) =>
      StatsOps.benford(
        t(s, d, "lineitem")
          .select(cents(col("l_extendedprice")).as("pc")),
        "pc")),

    // §2.11 autocorrelation function, lags 1-24, per event type over
    // the hourly resampled cents series
    "q156_acf" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("bucket"))
        .agg(sum(cents(col("value"))).cast("double").as("v"))
      TimeSeriesOps.acf(hourly, "v", "bucket", maxLag = 24,
        Seq("event_type"))
    }),

    // §2.11 Theil–Sen robust slope per event type over the hourly
    // resampled cents series (epoch-hour time axis)
    "q155_theil_sen" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .groupBy(col("event_type"),
          (unix_timestamp(date_trunc("hour", col("ts"))) / 3600L)
            .cast("long").as("hr"))
        .agg(sum(cents(col("value"))).as("v"))
      TimeSeriesOps.theilSen(hourly, "hr", "v", Seq("event_type"))
    }),

    // §2.11 Mann–Kendall trend per event type over the hourly
    // resampled cents series
    // per-user Shannon entropy of the event-type mix (behavioral
    // diversity profile)
    "q311_group_entropy" -> ((s, d) =>
      StatsOps.groupEntropy(t(s, d, "events"), "user_id",
        "event_type")
        .orderBy("user_id")),

    // §2.12 Cochran–Armitage dose-response trend: purchase share
    // across ordered user-residue buckets
    "q305_cochran_armitage" -> ((s, d) =>
      StatsOps.cochranArmitage(
        t(s, d, "events")
          .filter(col("user_id").isNotNull && col("event_type").isNotNull)
          .select(pmod(col("user_id"), lit(4)).as("dose"),
            (col("event_type") === "purchase").as("succ")),
        "dose", "succ")),

    // per-event-type binomial proportion CIs (Wald + Wilson score)
    // for the high-value share
    "q306_proportion_ci" -> ((s, d) =>
      StatsOps.proportionCi(
        t(s, d, "events").filter(col("value").isNotNull)
          .select(col("event_type"), (col("value") >= 50.0).as("hv")),
        "event_type", "hv")
        .orderBy("event_type")),

    // §2.12 Holm–Bonferroni step-down over the Dunn pair p-values
    // (FWER control; the BH sibling of q187)
    "q303_holm" -> ((s, d) => {
      val dunn = StatsOps.dunnTest(
        t(s, d, "events").withColumn("vc", cents(col("value"))),
        "vc", "event_type")
      StatsOps.holmBonferroni(
        dunn.select(col("group_a"), col("group_b"), col("p_value")),
        "p_value")
        .select(col("group_a"), col("group_b"), col("p_value"),
          round(col("p_value_holm"), 6).as("p_holm"),
          round(col("p_value_bonferroni"), 6).as("p_bonf"))
        .orderBy("group_a", "group_b")
    }),

    // §2.12 Mood's median test across event types (pooled-median
    // 2×k chi-square; robust sibling of Kruskal–Wallis). Gate =
    // statistic + dof + n only (the q277 convention): the p-value is
    // spec'd in Scala, not oracled, so the gate is not coupled to
    // the dataset's group count via a hardcoded-dof tail formula.
    "q304_moods_median" -> ((s, d) =>
      StatsOps.moodsMedianTest(
        t(s, d, "events").withColumn("vc", cents(col("value"))),
        "vc", "event_type")
        .select(col("chi2"), col("dof"), col("n"))),

    // Page–Hinkley sequential drift detection per event type
    // (running-mean deviation cumsum minus its running minimum)
    "q301_page_hinkley" -> ((s, d) =>
      graft.timeseries.TimeSeriesOps.pageHinkley(
        t(s, d, "events").withColumn("vc", cents(col("value"))),
        "vc", "event_id", delta = 0.0, lambda = 100000.0,
        keyCols = Seq("event_type"))
        .orderBy("event_type")),

    // Newey–West HAC standard error of the hourly-total mean
    // (Bartlett kernel, L = 4)
    "q302_newey_west" -> ((s, d) =>
      graft.timeseries.TimeSeriesOps.neweyWestMean(
        t(s, d, "events").filter(col("value").isNotNull)
          .groupBy(date_trunc("hour", col("ts")).as("bucket"))
          .agg(sum(cents(col("value"))).cast("double").as("v")),
        "v", "bucket", maxLag = 4)),

    // §2.11 seasonal Mann–Kendall (Hirsch–Slack) on hourly totals,
    // season = hour of day
    "q299_seasonal_mk" -> ((s, d) => {
      val h = t(s, d, "events").filter(col("value").isNotNull)
        .groupBy(date_trunc("hour", col("ts")).as("b"))
        .agg(sum(cents(col("value"))).cast("double").as("v"))
        .withColumn("season", hour(col("b")))
      graft.timeseries.TimeSeriesOps.seasonalMannKendall(
        h, "b", "v", "season")
    }),

    "q154_mann_kendall" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("bucket"))
        .agg(sum(cents(col("value"))).as("v"))
      TimeSeriesOps.mannKendall(hourly, "bucket", "v",
        Seq("event_type"))
    }),

    // §2.11 pandas resample().ohlc(): hourly open/high/low/close of
    // value cents per event type
    "q138_resample_ohlc" -> ((s, d) =>
      TimeSeriesOps.resampleOhlc(
        t(s, d, "events").withColumn("vc", cents(col("value"))),
        "ts", "vc", "hour", "event_id", Seq("event_type"))),

    // §2.11 sessionize: 30-min-gap sessions per user
    "q40_sessionize" -> ((s, d) =>
      TimeSeriesOps.sessionize(t(s, d, "events"), "ts", "user_id", 1800)
        .groupBy("user_id")
        .agg(max(col("session_id")).cast("long").as("n_sessions"),
          count(lit(1)).as("n_events"))),

    // §2.3 as-of semantics: last signup value at-or-before each event
    "q41_asof" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .withColumn("last_signup_c",
          last(when(col("event_type") === "signup", cents(col("value"))),
            ignoreNulls = true).over(w))
        .select("event_id", "user_id", "last_signup_c")
    }),

    // pandas merge_asof with tolerance: last signup value per user
    // at most 1h old (right side pre-aggregated per (user, ts) so the
    // pick at duplicate timestamps is well-defined in every engine)
    "q140_asof_tolerance" -> ((s, d) => {
      import graft.ops.PandasOps._
      val ev = t(s, d, "events")
      val sign = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts").as("sts"))
        .agg(max(cents(col("value"))).as("sv"))
      ev.asofJoin(sign, "user_id", "ts", "sts", "sv",
          direction = "backward", tolerance = Some(3600.0))
        .select("event_id", "user_id", "sv_asof")
    }),

    // §2.11 date_range generator vs generate_series
    "q121_date_range" -> ((s, d) =>
      TimeSeriesOps.dateRange(s,
        "2024-01-01", "2024-03-31", "6 hours")),

    // §2.12 Cramér's V from the q60 contingency arithmetic
    "q122_cramers_v" -> ((s, d) =>
      StatsOps.cramersV(
        t(s, d, "events")
          .withColumn("ub", pmod(col("user_id"), lit(5)).cast("long")),
        "event_type", "ub")
        .select(round(col("cramers_v"), 6).as("cramers_v"))),

    // §2.12 IQR outliers: both engines use the (n-1)p linear
    // interpolation quantile over exact integer cents
    "q123_outliers_iqr" -> ((s, d) =>
      StatsOps.outliersIqr(
        t(s, d, "lineitem").select(cents(col("l_quantity")).as("qc")),
        "qc", k = 1.0)
        .agg(sum(when(col("is_outlier"), 1L).otherwise(0L))
          .as("n_outliers"),
          count(lit(1)).as("n_rows"))),

    // §2.14 BFS distances from nation 0 over the same-region clique
    // graph (bounded recursive-CTE oracle; unreachable stay null)
    "q124_bfs" -> ((s, d) => {
      val n = t(s, d, "nation")
      val a = n.select(col("n_nationkey").as("src"),
        col("n_regionkey").as("r"))
      val b = n.select(col("n_nationkey").as("dst"),
        col("n_regionkey").as("r"))
      val edges = a.join(b, Seq("r"))
        .filter(col("src") =!= col("dst")).select("src", "dst")
      GraphOps.bfsDistances(edges, Seq(0))
        .select(col("id").cast("long"), col("dist").cast("long"))
    }),

    // §2.14 weighted shortest paths (distributed Bellman-Ford) from
    // nation 0 over same-region cliques with deterministic weights
    "q125_sssp" -> ((s, d) => {
      val n = t(s, d, "nation")
      val a = n.select(col("n_nationkey").cast("long").as("src"),
        col("n_regionkey").as("r"))
      val b = n.select(col("n_nationkey").cast("long").as("dst"),
        col("n_regionkey").as("r"))
      val edges = a.join(b, Seq("r"))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"),
          (lit(1) + pmod(col("src") + col("dst"), lit(3)))
            .cast("double").as("weight"))
      GraphOps.shortestPaths(edges, 0L)
        .select(col("id").cast("long"), col("dist"))
    }),

    // §2.11 classical additive decomposition (statsmodels 2×m MA
    // trend, re-centered per-phase seasonality) of the hourly
    // resampled per-type series — the resample→decompose pipeline
    "q127_decompose" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("bucket"))
        .agg(sum(cents(col("value"))).cast("double").as("v"))
      TimeSeriesOps.decomposeAdditive(hourly, "bucket", "v", 24,
          Seq("event_type"))
        .select(col("event_type"), col("bucket"),
          round(col("trend"), 6).as("trend"),
          round(col("seasonal"), 6).as("seasonal"),
          round(col("resid"), 6).as("resid"))
    }),

    // §2.11 PER-KEY distributed Holt forecasting over the hourly
    // series — every key's model fit in one shuffle, 3-step horizon
    // §2.11 SARIMA(1,0,0)(1,0,0)_24 forecast of the hourly value
    // total (reference advanced_forecasting.rs:19). The fit is
    // driver-side on the AGGREGATED series — bounded by the events
    // time range (~720 hourly buckets), like every forecaster here.
    // Two OLS solves have no SQL replay => rows-only gate; the
    // process-recovery specs pin the estimator.
    "q320_sarima" -> ((s, d) => {
      val series = TimeSeriesOps.collectSeries(
        t(s, d, "events")
          .filter(col("value").isNotNull)
          .groupBy(date_trunc("hour", col("ts")).as("b"))
          .agg(sum(cents(col("value"))).cast("double").as("v")),
        "v", "b")
      val fc = TimeSeriesOps.sarimaForecast(series, p = 1, d = 0,
        q = 0, sp = 1, sd = 0, sq = 0, period = 24, steps = 12)
      val rows = fc.zipWithIndex.map { case (v, i) =>
        (i + 1, math.rint(v * 1e6) / 1e6) }
      import s.implicits._
      rows.toDF("step", "forecast")
    }),

    // §2.11 AutoArima AICc model selection over the same hourly
    // series (reference advanced_forecasting.rs:584): the full
    // deterministic candidate table with the selected order flagged.
    "q321_auto_arima" -> ((s, d) => {
      val series = TimeSeriesOps.collectSeries(
        t(s, d, "events")
          .filter(col("value").isNotNull)
          .groupBy(date_trunc("hour", col("ts")).as("b"))
          .agg(sum(cents(col("value"))).cast("double").as("v")),
        "v", "b")
      val (best, table) = TimeSeriesOps.autoArima(series,
        maxP = 2, maxD = 1, maxQ = 1, period = 24,
        maxSp = 1, maxSd = 1, maxSq = 1)
      val b = best.map(m => (m.p, m.d, m.q, m.sp, m.sd, m.sq))
      val rows = table.map { c =>
        (c.p, c.d, c.q, c.sp, c.sd, c.sq, c.ok,
          b.contains((c.p, c.d, c.q, c.sp, c.sd, c.sq)))
      }
      import s.implicits._
      rows.toDF("p", "d", "q", "sp", "sd", "sq", "ok", "selected")
    }),

    // §2.11 PER-KEY distributed SARIMA(1,0,0)(1,0,0)_12 over each
    // region's monthly revenue series — every model fit inside an
    // executor after one key shuffle (groupedSarimaForecast; the
    // q307 per-key regime extended to seasonal orders). Driver OLS
    // has no SQL replay on organic data (normal-equation
    // conditioning at revenue scale exceeds the 1e-9 comparator) =>
    // rows-only; q335 is the oracle-checked planted twin and the
    // per-key recovery spec pins the estimator.
    "q334_sarima_perkey" -> ((s, d) => {
      val monthly = t(s, d, "orders")
        .join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_regionkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("m"))
        .agg(sum(cents(col("o_totalprice"))).cast("double").as("v"))
      TimeSeriesOps.groupedSarimaForecast(monthly, "v", "m",
        "n_regionkey", p = 1, d = 0, q = 0, sp = 1, sd = 0, sq = 0,
        period = 12, steps = 6)
        .withColumn("n_regionkey", col("n_regionkey").cast("long"))
    }),

    // the PORTABLE ORACLE TWIN of the SARIMA estimator (the q322
    // Lloyd-unroll precedent): a planted stationary seasonal AR
    // y_t = c + 0.6·y_{t-1} + 0.3·y_{t-12} generated per nation from
    // md5-seeded starts by the SAME double arithmetic in both
    // engines (bit-identical series), so the ridge-regularized joint
    // OLS (olsFit adds 1e-8·trace/d to the normal-equation diagonal
    // — replayed exactly) is solvable by Cramer's rule in SQL and
    // the 6-step forecast recurrence replays in a recursive CTE.
    // Worst cross-solver forecast divergence measured 9e-13,
    // comfortably inside the 1e-9 comparator.
    "q335_sarima_twin" -> ((s, d) => {
      val base = t(s, d, "nation")
        .select(col("n_nationkey").cast("long").as("nk"))
        .withColumn("c", expr("cast(1 + pmod(nk, 3) as double)"))
        .withColumn("seeds", expr(
          "transform(sequence(0, 11), t -> cast(5 + pmod(" +
            "cast(conv(substring(md5(concat(cast(nk as string), " +
            "'-', cast(t as string), 'sar6')), 1, 4), 16, 10) " +
            "as bigint), 20) as double))"))
        .withColumn("ys", expr(
          "aggregate(sequence(12, 59), seeds, (acc, t) -> " +
            "acc || array(c + 0.6d * element_at(acc, -1) + " +
            "0.3d * element_at(acc, -12)))"))
        .select(col("nk"),
          posexplode(col("ys")).as(Seq("t", "y")))
      TimeSeriesOps.groupedSarimaForecast(base, "y", "t", "nk",
        p = 1, d = 0, q = 0, sp = 1, sd = 0, sq = 0, period = 12,
        steps = 6)
        .select(col("nk").cast("long").as("n_nationkey"), col("h"),
          col("forecast"))
    }),

    // the SEASONAL-DIFFERENCING oracle twin (completes the q335
    // SARIMA twin, which covered only sd=0): planted SARIMA
    // (1,0,0)(1,1,0)_12 — the seasonally-DIFFERENCED series w_t =
    // y_t − y_{t−12} follows the stationary seasonal AR w_t = c +
    // 0.5·w_{t−1} + 0.25·w_{t−12}, generated per nation from
    // md5-seeded starts by the same double arithmetic in both
    // engines. The oracle replays the lag-12 differencing, the
    // ridge Cramer 3×3 joint OLS on w, the forecast recurrence AND
    // the seasonal integration chain (forecast_k = fw_k + y[59+k])
    // — the full sd=1 path of sarimaFit/sarimaForecast.
    "q501_sarima_sdiff_twin" -> ((s, d) => {
      val base = t(s, d, "nation")
        .select(col("n_nationkey").cast("long").as("nk"))
        .withColumn("c", expr("cast(1 + pmod(nk, 3) as double)"))
        .withColumn("seeds", expr(
          "transform(sequence(0, 23), t -> cast(50 + pmod(" +
            "cast(conv(substring(md5(concat(cast(nk as string), " +
            "'-', cast(t as string), 'sd10')), 1, 4), 16, 10) " +
            "as bigint), 40) as double))"))
        .withColumn("ys", expr(
          "aggregate(sequence(24, 71), seeds, (acc, t) -> " +
            "acc || array(element_at(acc, -12) + c + " +
            "0.5d * (element_at(acc, -1) - element_at(acc, -13)) + " +
            "0.25d * (element_at(acc, -12) - element_at(acc, -24))))"))
        .select(col("nk"),
          posexplode(col("ys")).as(Seq("t", "y")))
      TimeSeriesOps.groupedSarimaForecast(base, "y", "t", "nk",
        p = 1, d = 0, q = 0, sp = 1, sd = 1, sq = 0, period = 12,
        steps = 6)
        .select(col("nk").cast("long").as("n_nationkey"), col("h"),
          col("forecast"))
    }),

    // the HANNAN–RISSANEN (MA estimation) oracle twin — the q-path
    // of sarimaFit that q335/q501 (pure AR) never exercise: planted
    // ARMA(1,1) per nation (w_t = c + 0.5·w_{t−1} + s_t − 0.3·s_{t−1}
    // from md5 noise, bit-identical in both engines), series length
    // 19 so sarimaFit's stage-1 long-AR order is m = 4 and the
    // oracle can replay BOTH solves: the 5×5 ridge stage-1 OLS via
    // generated cofactor-expansion Cramer (Scala-generated SQL, the
    // q441 convention), the innovation estimates, the 3×3 stage-2
    // joint OLS on (w lag, eps lag), the recursive in-sample
    // residual recurrence and the MA-term forecast. Cross-solver
    // (Cramer vs partial-pivot Gauss) divergence is bounded by the
    // planted series' conditioning — inside the 1e-9 comparator.
    "q502_arima_hr_twin" -> ((s, d) => {
      val base = t(s, d, "nation")
        .select(col("n_nationkey").cast("long").as("nk"))
        .withColumn("c", expr("cast(5 + pmod(nk, 3) as double)"))
        .withColumn("seeds", expr(
          "transform(sequence(0, 18), t -> cast(pmod(" +
            "cast(conv(substring(md5(concat(cast(nk as string), " +
            "'-', cast(t as string), 'hr10')), 1, 4), 16, 10) " +
            "as bigint), 1000) as double) / 100.0d - 5.0d)"))
        .withColumn("ws", expr(
          "aggregate(sequence(4, 18), " +
            "transform(slice(seeds, 1, 4), s -> 20.0d + s), " +
            "(acc, t) -> acc || array(c + " +
            "0.5d * element_at(acc, -1) + " +
            "element_at(seeds, t + 1) - " +
            "0.3d * element_at(seeds, t)))"))
        .select(col("nk"),
          posexplode(col("ws")).as(Seq("t", "w")))
      TimeSeriesOps.groupedSarimaForecast(base, "w", "t", "nk",
        p = 1, d = 0, q = 1, sp = 0, sd = 0, sq = 0, period = 12,
        steps = 4)
        .select(col("nk").cast("long").as("n_nationkey"), col("h"),
          col("forecast"))
    }),

    // §2.12 Krippendorff's alpha — inter-annotator agreement over a
    // ratings table derived from events (unit = user, rater = event
    // type, category = 25-dollar bucket of the user-type mean spend;
    // the mean is an exact-cents Long sum so both engines bucket
    // identically). Annotation QA for labeling pipelines.
    "q339_krippendorff" -> ((s, d) => {
      val ratings = t(s, d, "events")
        .filter(col("value").isNotNull && col("event_type").isNotNull
          && col("user_id").isNotNull)
        .groupBy(col("user_id"), col("event_type"))
        .agg(floor(avg(cents(col("value"))) / 2500.0)
          .cast("long").as("cat"))
      graft.stats.StatsOps.krippendorffAlpha(ratings, "user_id",
        "event_type", "cat")
    }),

    // §2.12 Krippendorff's alpha with the INTERVAL metric — the
    // same ratings table as q339 but disagreement weighted (c−c')²,
    // the right metric when categories are ordered magnitudes
    // (spend buckets): near-miss raters disagree less than far-off
    // ones
    "q341_krippendorff_interval" -> ((s, d) => {
      val ratings = t(s, d, "events")
        .filter(col("value").isNotNull && col("event_type").isNotNull
          && col("user_id").isNotNull)
        .groupBy(col("user_id"), col("event_type"))
        .agg(floor(avg(cents(col("value"))) / 2500.0)
          .cast("long").as("cat"))
      graft.stats.StatsOps.krippendorffAlpha(ratings, "user_id",
        "event_type", "cat", metric = "interval")
    }),

    // the AUTO-ARIMA SELECTION oracle twin (extends the q335 SARIMA
    // twin): planted noisy seasonal AR per nation (md5 pseudo-noise
    // so both engines build bit-identical series); the grid
    // {(1,0,0)(0,0,0), (0,0,0)(1,0,0), (1,0,0)(1,0,0)}_12 is
    // replayed fit-by-fit in SQL — three ridge Cramer OLS solves,
    // in-sample SSE, Gaussian AICc, argmin selection (measured
    // margin ≥ 84 AICc units, so fp cannot flip it), then the
    // winner's forecast recurrence. Verifies order SELECTION, not
    // just a fixed fit.
    "q342_auto_arima_perkey" -> ((s, d) => {
      val base = t(s, d, "nation")
        .select(col("n_nationkey").cast("long").as("nk"))
        .withColumn("c", expr("cast(1 + pmod(nk, 3) as double)"))
        .withColumn("seeds", expr(
          "transform(sequence(0, 11), t -> cast(5 + pmod(" +
            "cast(conv(substring(md5(concat(cast(nk as string), " +
            "'-', cast(t as string), 'sar6')), 1, 4), 16, 10) " +
            "as bigint), 20) as double))"))
        .withColumn("ys", expr(
          "aggregate(sequence(12, 59), seeds, (acc, t) -> " +
            "acc || array(c + 0.55d * element_at(acc, -1) + " +
            "0.35d * element_at(acc, -12) + " +
            "(cast(pmod(cast(conv(substring(md5(concat(" +
            "cast(nk as string), '-', cast(t as string), 'nz')), " +
            "1, 4), 16, 10) as bigint), 1000) as double) / 1000.0d " +
            "- 0.5d)))"))
        .select(col("nk"),
          posexplode(col("ys")).as(Seq("t", "y")))
      TimeSeriesOps.groupedAutoArima(base, "y", "t", "nk",
        maxP = 1, maxD = 0, maxQ = 0, period = 12, maxSp = 1,
        maxSd = 0, maxSq = 0, steps = 4)
        .select(col("nk").cast("long").as("n_nationkey"), col("h"),
          col("forecast"), col("p"), col("sp"))
    }),

    // §2.11 per-key Kalman filter + RTS smoother for the local-level
    // state-space model over the hourly per-type series (the q307
    // shape). Forward recurrence Pp=P+q, K=Pp/(Pp+r), x+=K(y−x),
    // P=(1−K)Pp; backward RTS pass C=Pf/(Pf+q). All +,−,×,÷ doubles,
    // so the ascending+descending recursive-CTE oracle replays both
    // passes bit-exactly — no rounding (q319 convention).
    "q343_kalman" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("b"))
        .agg(sum(cents(col("value"))).cast("double").as("v"))
      val filt = TimeSeriesOps.kalmanLocalLevel(hourly, "v", "b",
        Seq("event_type"), q = 25.0, r = 400.0, p0 = 1000.0)
      TimeSeriesOps.kalmanSmoothLocalLevel(filt, "v", "b",
        Seq("event_type"), q = 25.0, r = 400.0, p0 = 1000.0,
        outName = "kf_smooth", filtName = "kf_filt")
        .select(col("event_type"), col("b"), col("kf_level"),
          col("kf_var"), col("kf_smooth"))
    }),

    "q307_grouped_holt" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("b"))
        .agg(sum(cents(col("value"))).cast("double").as("v"))
      TimeSeriesOps.groupedHoltForecast(hourly, "v", "b",
        Seq("event_type"), alpha = 0.4, beta = 0.3, steps = 3)
        .orderBy("event_type", "h")
    }),

    // TOST equivalence: are click and view mean values the SAME
    // within +-300 cents (Schuirmann two one-sided z tests)
    "q358_tost" -> ((s, d) =>
      graft.stats.TwoSampleOps.tostEquivalence(
        t(s, d, "events").select(col("event_type"),
          cents(col("value")).as("vc")),
        "vc", "event_type", "click", "view", margin = 300.0)),

    // 2x2 difference-in-differences (even-users x afternoon) with
    // saturated-OLS large-sample inference, one conditional-sum agg
    "q357_did" -> ((s, d) =>
      StatsOps.diffInDiffMeans(
        t(s, d, "events")
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
          .select(cents(col("value")).as("yc"),
            (pmod(col("user_id"), lit(2)) === 0).as("treated"),
            (hour(col("ts")) >= 12).as("post")),
        "yc", "treated", "post")),

    // deterministic Fisher permutation test (199 md5-rank label
    // permutations, add-one p): click-vs-view mean event value in
    // exact cents — every permutation and comparison replayed
    "q355_perm_test" -> ((s, d) =>
      StatsOps.permutationTestMeanDiff(
        t(s, d, "events")
          .filter(col("event_type").isin("click", "view") &&
            col("event_id").isNotNull)
          .select(col("event_id"), col("event_type"),
            cents(col("value")).as("vc")),
        "vc", "event_type", "click", "event_id", reps = 199)),

    // delete-one-group jackknife SE of the global mean event value
    // (the delete-a-partition estimator-variance shape)
    "q356_jackknife" -> ((s, d) =>
      StatsOps.jackknifeMeanByGroup(
        t(s, d, "events").select(col("event_type"),
          cents(col("value")).as("vc")),
        "vc", "event_type")),

    // per-key one-step-ahead Holt backtest over the q307 hourly
    // series: MAE/RMSE/MAPE/sMAPE/MASE per event type; recurrence
    // replayed bit-exactly by a recursive CTE, averages within the
    // comparator tolerance
    "q354_holt_backtest" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("b"))
        .agg(sum(cents(col("value"))).cast("double").as("v"))
      TimeSeriesOps.holtBacktestOneStep(hourly, "v", "b",
        Seq("event_type"), alpha = 0.4, beta = 0.3)
    }),

    // categorical feature screening: IG / Theil's U of event_type
    // from three derived features, ranked
    "q318_ig_screen" -> ((s, d) =>
      StatsOps.informationGainMulti(
        t(s, d, "events")
          .filter(col("user_id").isNotNull && col("event_type").isNotNull
            && col("value").isNotNull)
          .select(col("event_type"),
            pmod(col("user_id"), lit(5)).cast("long").as("ub"),
            hour(col("ts")).cast("long").as("hod"),
            (col("value") >= 50.0).cast("long").as("hv")),
        Seq("ub", "hod", "hv"), "event_type")),

    // importance-weighted mean + linearized SE + Kish n_eff of
    // quantity under linenumber weights (weighted-sample estimation)
    "q317_weighted_mean_se" -> ((s, d) =>
      StatsOps.weightedMeanSe(
        t(s, d, "lineitem").select(
          col("l_quantity").cast("long").as("x"),
          col("l_linenumber").cast("long").as("w")),
        "x", "w")),

    // information gain + Theil's U of event_type from the user
    // residue (asymmetric association; q126's NMI sibling)
    "q316_info_gain" -> ((s, d) =>
      StatsOps.informationGain(
        t(s, d, "events")
          .filter(col("user_id").isNotNull && col("event_type").isNotNull)
          .withColumn("ub", pmod(col("user_id"), lit(5)).cast("long")),
        "ub", "event_type")),

    // §2.11 per-key linear-trend forecast on an hour index
    "q314_trend_forecast" -> ((s, d) => {
      // small index + dollar scale keep every OLS sum inside 2^53
      // so the closed form replays exactly in the oracle
      val hourly = t(s, d, "events")
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("b"))
        .agg(sum(round(col("value")).cast("long")).cast("double")
          .as("v"))
        .withColumn("ti",
          (unix_timestamp(col("b")) / 3600).cast("long") - 438288)
      TimeSeriesOps.groupedTrendForecast(hourly, "v", "ti",
        Seq("event_type"), steps = 3)
        .orderBy("event_type", "h")
    }),

    // burstiness: Fano factor of hourly event counts per type
    "q315_fano" -> ((s, d) =>
      StatsOps.fanoFactor(
        t(s, d, "events").withColumn("hb",
          date_trunc("hour", col("ts"))),
        "event_type", "hb")
        .orderBy("event_type")),

    // §2.11 damped-trend (Gardner–McKenzie) grouped Holt, φ = 0.8
    "q312_damped_holt" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("b"))
        .agg(sum(cents(col("value"))).cast("double").as("v"))
      TimeSeriesOps.groupedHoltForecast(hourly, "v", "b",
        Seq("event_type"), alpha = 0.4, beta = 0.3, steps = 3,
        phi = 0.8)
        .orderBy("event_type", "h")
    }),

    // robust modified z-score outliers (Iglewicz–Hoaglin) on
    // price-dollars
    "q313_modified_z" -> ((s, d) =>
      StatsOps.modifiedZScore(
        t(s, d, "lineitem").select(col("l_orderkey"),
          col("l_linenumber"),
          round(col("l_extendedprice")).cast("long").as("y")),
        "y")
        .groupBy("outlier")
        .agg(count(lit(1)).as("n"),
          round(min(col("mod_z")), 6).as("min_z"),
          round(max(col("mod_z")), 6).as("max_z"))
        .orderBy("outlier")),

    // pandas merge(indicator=True): customer/order coverage audit
    "q308_merge_indicator" -> ((s, d) => {
      import graft.ops.PandasOps._
      val c = t(s, d, "customer")
        .select(col("c_custkey").as("custkey"))
      val o = t(s, d, "orders").groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_orders"))
      c.mergeIndicator(o, Seq("custkey"))
        .select("custkey", "n_orders", "_merge")
        .orderBy("custkey")
    }),

    // §2.11 classical MULTIPLICATIVE decomposition (ratio-to-MA,
    // seasonal indices normalized to mean 1) of the same pipeline
    "q300_decompose_mult" -> ((s, d) => {
      val hourly = t(s, d, "events").filter(col("value").isNotNull)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("bucket"))
        .agg(sum(cents(col("value"))).cast("double").as("v"))
      TimeSeriesOps.decomposeMultiplicative(hourly, "bucket", "v", 24,
          Seq("event_type"))
        .select(col("event_type"), col("bucket"),
          round(col("trend"), 6).as("trend"),
          round(col("seasonal"), 6).as("seasonal"),
          round(col("resid"), 6).as("resid"))
    }),

    // §2.12 paired t-test on the same user-level pairs as q146
    // (p_value omitted from the gate: the oracle mirrors the
    // statistic; the op's exact t-CDF p is spec-verified)
    "q153_paired_ttest" -> ((s, d) => {
      val ev = t(s, d, "events")
      def side(et: String, out: String) =
        ev.filter(col("event_type") === et)
          .groupBy("user_id").agg(sum(cents(col("value"))).as(out))
      StatsOps.pairedTTest(
          side("purchase", "sx").join(side("click", "sy"), "user_id"),
          "sx", "sy")
        .select("n", "mean_diff", "t_stat", "dof")
    }),

    // §2.12 two-proportion z-test: high-value-event rate, click vs
    // view (the A/B-test primitive)
    "q151_prop_ztest" -> ((s, d) =>
      StatsOps.twoProportionZTest(
        t(s, d, "events").withColumn("hi", col("value") >= 50.0),
        "hi", "event_type", "click", "view")),

    // §2.12 Cohen's d effect size, purchase vs click value cents
    "q152_cohens_d" -> ((s, d) =>
      StatsOps.cohensD(
        t(s, d, "events").withColumn("vc", cents(col("value"))),
        "vc", "event_type", "purchase", "click")),

    // §2.12 Bartlett variance homogeneity across event types (dof 4:
    // closed-form χ² tail in the oracle)
    "q148_bartlett" -> ((s, d) =>
      StatsOps.bartlett(
        t(s, d, "events").withColumn("vc", cents(col("value"))),
        "vc", "event_type")),

    // §2.12 Levene (Brown–Forsythe) robust variance test
    "q149_levene" -> ((s, d) =>
      StatsOps.leveneBrownForsythe(
        t(s, d, "events").withColumn("vc", cents(col("value"))),
        "vc", "event_type")),

    // §2.12 Kruskal–Wallis H across all five event types (dof = 4,
    // so the oracle's χ² tail has the even-dof closed form)
    "q147_kruskal" -> ((s, d) =>
      StatsOps.kruskalWallis(
        t(s, d, "events").withColumn("vc", cents(col("value"))),
        "vc", "event_type")),

    // §2.12 Wilcoxon signed-rank: per-user paired purchase-vs-click
    // spend totals (users present in both)
    "q146_wilcoxon" -> ((s, d) => {
      val ev = t(s, d, "events")
      def side(et: String, out: String) =
        ev.filter(col("event_type") === et)
          .groupBy("user_id").agg(sum(cents(col("value"))).as(out))
      StatsOps.wilcoxonSignedRank(
        side("purchase", "sx").join(side("click", "sy"), "user_id"),
        "sx", "sy")
    }),

    // §2.12 two-sample Kolmogorov–Smirnov: purchase vs click value
    // distributions (range-bucketed ECDFs, series p-value)
    "q145_ks_test" -> ((s, d) =>
      StatsOps.ksTest(
        t(s, d, "events").withColumn("vc", cents(col("value"))),
        "vc", "event_type", "purchase", "click")),

    // data-mixing drift: KL/JS divergence + entropies of the language
    // distribution, source src0 vs src1
    "q131_divergence" -> ((s, d) =>
      StatsOps.distributionDivergence(t(s, d, "documents"),
        "lang", "source", "src0", "src1")),

    // §2.12 normalized mutual information over the q60 contingency
    "q126_nmi" -> ((s, d) =>
      StatsOps.normalizedMutualInfo(
        t(s, d, "events")
          .withColumn("ub", pmod(col("user_id"), lit(5)).cast("long")),
        "event_type", "ub")
        .select(round(col("nmi"), 6).as("nmi"))),

    // §2.14 graph degree on the supplier→part bipartite graph
    "q52_graph_degree" -> ((s, d) => {
      val edges = t(s, d, "lineitem")
        .select(concat(lit("s"), col("l_suppkey")).as("src"),
          concat(lit("p"), col("l_partkey")).as("dst"))
        .distinct()
      GraphOps.degrees(edges)
        .filter(col("id").startsWith("s"))
        .select(col("id"), col("out_degree"), col("degree"))
    }),

    // §2.14 connected components (iterative label propagation);
    // oracle: components of the same-region nation graph are regions
    "q53_components" -> ((s, d) => {
      val n = t(s, d, "nation")
      val a = n.select(col("n_nationkey").as("src"),
        col("n_regionkey").as("r"))
      val b = n.select(col("n_nationkey").as("dst"),
        col("n_regionkey").as("r"))
      val edges = a.join(b, Seq("r"))
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      GraphOps.connectedComponents(edges)
        .select(col("id").cast("long"),
          col("component").cast("long"))
    }),

    // §2.14 closeness centrality on the same-region nation cliques:
    // with all 25 vertices as sources the estimator is EXACT, and a
    // clique member's closeness has the closed form 24/(m−1)
    "q88_closeness" -> ((s, d) => {
      val n = t(s, d, "nation")
      val a = n.select(col("n_nationkey").as("src"),
        col("n_regionkey").as("r"))
      val b = n.select(col("n_nationkey").as("dst"),
        col("n_regionkey").as("r"))
      val edges = a.join(b, Seq("r"))
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      GraphOps.closenessCentrality(edges, (0L to 24L), 25L)
        .select(col("id").cast("long").as("n_nationkey"),
          round(col("closeness"), 6).as("closeness"),
          col("n_reached"))
    }),

    // §2.14 betweenness centrality, exact all-sources run on the
    // same cliques: inside a clique every pair is adjacent, so no
    // shortest path passes through a third vertex — betweenness 0
    "q89_betweenness" -> ((s, d) => {
      val n = t(s, d, "nation")
      val a = n.select(col("n_nationkey").as("src"),
        col("n_regionkey").as("r"))
      val b = n.select(col("n_nationkey").as("dst"),
        col("n_regionkey").as("r"))
      val edges = a.join(b, Seq("r"))
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      GraphOps.betweennessCentrality(edges, (0L to 24L))
        .select(col("id").cast("long").as("n_nationkey"),
          round(col("betweenness"), 6).as("betweenness"))
    }),

    // §2.14 PageRank — oracle unrolls the 5 power iterations as plain
    // CTE aggregations (dangling mass folded back each step)
    "q54_pagerank" -> ((s, d) => {
      val edges = t(s, d, "lineitem")
        .select(concat(lit("s"), col("l_suppkey")).as("src"),
          concat(lit("p"), col("l_partkey")).as("dst"))
        .distinct()
      GraphOps.pageRank(edges, iterations = 5)
        .select(col("id"), round(col("rank"), 9).as("rank"))
    }),

    // §2.10 tumbling window batch-equivalent (window() API path)
    "q56_tumbling" -> ((s, d) =>
      graft.streaming.StreamOps.tumblingBatch(
        t(s, d, "events"), "ts", "1 hour", Seq("event_type"),
        Seq(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c")))
        .select(col("window.start").as("bucket"), col("event_type"),
          col("n"), col("sum_c"))),

    // §2.12 Welch t-test from exact cent sums
    "q59_ttest" -> ((s, d) => {
      val e = t(s, d, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .withColumn("vc", cents(col("value")))
      val g = e.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("vc")).as("s1"),
          sum(col("vc") * col("vc")).as("s2"))
        .select(col("event_type"), col("n"),
          (dbl(col("s1")) / dbl(col("n"))).as("m"),
          ((dbl(col("s2")) - dbl(col("s1")) * dbl(col("s1")) / dbl(col("n")))
            / (dbl(col("n")) - 1)).as("v"))
      val a = g.filter(col("event_type") === "click")
        .select(col("n").as("na"), col("m").as("ma"), col("v").as("va"))
      val b = g.filter(col("event_type") === "purchase")
        .select(col("n").as("nb"), col("m").as("mb"), col("v").as("vb"))
      a.crossJoin(b).select(
        col("na"), col("nb"),
        round(col("ma"), 6).as("mean_a_c"),
        round(col("mb"), 6).as("mean_b_c"),
        round((col("ma") - col("mb")) /
          sqrt(col("va") / dbl(col("na")) + col("vb") / dbl(col("nb"))), 6)
          .as("t_stat"))
    }),

    // §2.12 chi-square independence from exact counts
    "q60_chi2" -> ((s, d) => {
      val e = t(s, d, "events")
        .withColumn("ub", pmod(col("user_id"), lit(5)).cast("long"))
      val obs = e.groupBy("event_type", "ub").agg(count(lit(1)).as("o"))
      val ra = e.groupBy("event_type").agg(count(lit(1)).as("ra"))
      val rb = e.groupBy("ub").agg(count(lit(1)).as("rb"))
      val n = e.groupBy().agg(count(lit(1)).as("nn"))
      obs.join(ra, Seq("event_type")).join(rb, Seq("ub")).crossJoin(n)
        .select((dbl(col("o")) - dbl(col("ra")) * dbl(col("rb")) / dbl(col("nn")))
          .as("dev"),
          (dbl(col("ra")) * dbl(col("rb")) / dbl(col("nn"))).as("e"))
        .agg(round(sum(col("dev") * col("dev") / col("e")), 6).as("chi2"),
          count(lit(1)).as("n_cells"))
    }),

    // §2.12 chi-square WITH its p-value: df is 8 by construction
    // (3 fixed event types × 5 buckets), and the even-df upper tail
    // has the closed form exp(−x/2)·Σ_{k<4}(x/2)^k/k! — plain column
    // arithmetic mirrored in the oracle
    "q90_chi2_pvalue" -> ((s, d) => {
      val e = t(s, d, "events")
        .filter(col("event_type").isin("click", "view", "purchase"))
        .withColumn("ub", pmod(col("user_id"), lit(5)).cast("long"))
      val obs = e.groupBy("event_type", "ub").agg(count(lit(1)).as("o"))
      val ra = e.groupBy("event_type").agg(count(lit(1)).as("ra"))
      val rb = e.groupBy("ub").agg(count(lit(1)).as("rb"))
      val n = e.groupBy().agg(count(lit(1)).as("nn"))
      val s1 = obs.join(ra, Seq("event_type")).join(rb, Seq("ub"))
        .crossJoin(n)
        .select((dbl(col("o")) - dbl(col("ra")) * dbl(col("rb")) / dbl(col("nn")))
          .as("dev"),
          (dbl(col("ra")) * dbl(col("rb")) / dbl(col("nn"))).as("e"))
        .agg(sum(col("dev") * col("dev") / col("e")).as("chi2raw"))
      val x = col("chi2raw") / 2
      s1.select(round(col("chi2raw"), 6).as("chi2"),
        lit(8L).as("dof"),
        round(exp(-x) * (lit(1.0) + x + x * x / 2 + x * x * x / 6), 6)
          .as("p_value"))
    }),

    // §2.12 one-sample chi-square goodness-of-fit vs uniform over the
    // 3 order statuses: df = 2, so the p-value closed form is exactly
    // exp(−χ²/2) — computed as COLUMN arithmetic here so the oracle
    // mirrors it op-for-op (the UDF's incomplete gamma agrees only
    // analytically)
    "q92_chi2_gof" -> ((s, d) =>
      graft.stats.StatsOps.chiSquareGof(t(s, d, "orders"),
        "o_orderstatus")
        .select(round(col("chi2"), 6).as("chi2"), col("dof"),
          round(exp(-(col("chi2") / 2)), 6).as("p_value"))),

    // §2.12 OLS regression from exact sums (dollars to avoid overflow)
    "q61_linreg" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice")).cast("long").as("y"))
      li.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(
          round((dbl(col("n")) * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy"))) /
            (dbl(col("n")) * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx"))), 6)
            .as("slope"),
          round((dbl(col("sy")) - (dbl(col("n")) * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy"))) /
            (dbl(col("n")) * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx"))) * dbl(col("sx"))) /
            dbl(col("n")), 6).as("intercept"),
          round(
            ((dbl(col("n")) * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy"))) *
             (dbl(col("n")) * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy")))) /
            ((dbl(col("n")) * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx"))) *
             (dbl(col("n")) * dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy")))), 6)
            .as("r2"))
    }),

    // §2.12 skewness/kurtosis from exact raw moments
    "q62_skew_kurt" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").cast("long").as("x"))
      li.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("x").as("s1"),
          sum(col("x") * col("x")).as("s2"),
          sum(col("x") * col("x") * col("x")).as("s3"),
          sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
        .select(col("l_returnflag"),
          round({
            val n = dbl(col("n")); val m1 = dbl(col("s1")) / n
            val m2 = dbl(col("s2")) / n; val m3 = dbl(col("s3")) / n
            val v = m2 - m1 * m1
            (m3 - lit(3) * m1 * m2 + lit(2) * m1 * m1 * m1) / pow(v, 1.5)
          }, 6).as("skew"),
          round({
            val n = dbl(col("n")); val m1 = dbl(col("s1")) / n
            val m2 = dbl(col("s2")) / n; val m3 = dbl(col("s3")) / n
            val m4 = dbl(col("s4")) / n
            val v = m2 - m1 * m1
            (m4 - lit(4) * m1 * m3 + lit(6) * m1 * m1 * m2 -
              lit(3) * m1 * m1 * m1 * m1) / (v * v) - lit(3)
          }, 6).as("kurt_excess"))
    }),

    // §2.12 Mann-Whitney U via average ranks. Ranks come from the
    // distinct-value table through StatsOps.distinctValueRanks
    // (range-partitioned cumulative counts — NO single-partition
    // window even for continuous domains); results are identical to
    // rank()+(peers−1)/2.
    "q63_mannwhitney" -> ((s, d) =>
      graft.stats.StatsOps.mannWhitneyU(
        t(s, d, "events").withColumn("vc", cents(col("value"))),
        "vc", "event_type", "click", "view")),

    // §2.12 Mann-Whitney z-test with a REAL p-value: the normal-CDF
    // finalization (A&S 7.1.26 Φ) is plain column arithmetic mirrored
    // operation-for-operation in the oracle SQL.
    "q84_mwu_ztest" -> ((s, d) =>
      graft.stats.StatsOps.mannWhitneyUTest(
        t(s, d, "events").withColumn("vc", cents(col("value"))),
        "vc", "event_type", "click", "view")),

    // §2.12 describe from exact sums + exact percentiles
    // mergeable histogram-quantile sketch: two scans (bounds + 64
    // bin counts), interpolated P25/P50/P90/P99 — the no-global-sort
    // quantile read; every arithmetic step replayed by the oracle
    "q353_hist_quantiles" -> ((s, d) =>
      graft.stats.StatsOps.histogramQuantiles(
        t(s, d, "lineitem"), "l_extendedprice",
        Seq(0.25, 0.5, 0.9, 0.99), bins = 64)),

    "q66_describe" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_quantity").cast("long").as("x"))
        .agg(count(lit(1)).as("n"), sum("x").as("s1"),
          sum(col("x") * col("x")).as("s2"),
          min("x").as("min_x"), max("x").as("max_x"),
          percentile(col("x"), lit(0.5)).as("median"))
        .select(col("n"), col("min_x"), col("max_x"), col("median"),
          round(dbl(col("s1")) / dbl(col("n")), 6).as("mean"),
          round(sqrt((dbl(col("s2")) - dbl(col("s1")) * dbl(col("s1")) / dbl(col("n")))
            / (dbl(col("n")) - 1)), 6).as("std"))),

    // §2.13 model selection: 5-fold CV of OLS price-dollars ~ quantity
    // with deterministic hash folds; the whole CV is one aggregate
    // scan (train stats = totals − fold stats, held-out RMSE from the
    // fold's own sufficient statistics)
    "q251_kfold_cv" -> ((s, d) =>
      graft.ml.ModelSelection.kFoldOlsCv(
        t(s, d, "lineitem").select(
          concat(col("l_orderkey").cast("string"), lit("-"),
            col("l_linenumber").cast("string")).as("rk"),
          col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice")).cast("long").as("y")),
        "rk", "x", "y", k = 5, salt = "cv")),

    // §2.13 GridSearchCV parity: ridge lambda grid scored by pooled
    // 5-fold held-out RMSE — the entire grid reuses the same k
    // fold-stat rows, still one scan of lineitem
    "q252_ridge_cv" -> ((s, d) =>
      graft.ml.ModelSelection.ridgeGridCv(
        t(s, d, "lineitem").select(
          concat(col("l_orderkey").cast("string"), lit("-"),
            col("l_linenumber").cast("string")).as("rk"),
          col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice")).cast("long").as("y")),
        "rk", "x", "y",
        lambdas = Seq(0.0, 1e5, 1e6, 1e7, 1e8), k = 5, salt = "cv")),

    // §2.12 multiple regression with inference: price-dollars ~
    // quantity + discount-cents, coefficient/SE/t/p per term from one
    // ten-sum aggregate (closed-form 2-predictor normal equations)
    "q255_multi_ols" -> ((s, d) =>
      StatsOps.multipleRegression2(
        t(s, d, "lineitem").select(
          round(col("l_extendedprice")).cast("long").as("y"),
          col("l_quantity").cast("long").as("x1"),
          cents(col("l_discount")).as("x2")),
        "y", "x1", "x2")),

    // §2.13/§2.12 exact linear-SHAP: closed-form Shapley per-row
    // attribution φ_i = b_i(x_i − x̄_i) for the q255 OLS model —
    // one moment aggregate broadcast back, per-row pass is pure map
    "q453_linear_shap" -> ((s, d) =>
      StatsOps.linearShap(
        t(s, d, "lineitem").select(
          col("l_orderkey"),
          round(col("l_extendedprice")).cast("long").as("y"),
          col("l_quantity").cast("long").as("x1"),
          cents(col("l_discount")).as("x2")),
        "y", "x1", "x2", keepCols = Seq("l_orderkey"))),

    // §2.12 exact 5% trimmed mean of price-dollars (robust center;
    // partial tie inclusion at the cuts, range-bucketed ranks)
    "q260_trimmed_mean" -> ((s, d) =>
      StatsOps.trimmedMean(
        t(s, d, "lineitem").select(
          round(col("l_extendedprice")).cast("long").as("y")),
        "y", frac = 0.05)),

    // §2.13 AutoML-lite: seeded MLlib regressor search space ranked
    // by holdout RMSE (rows-only gate — MLlib fit internals are not
    // SQL-expressible; leaderboard shape + recovery behavior spec'd)
    "q258_automl" -> ((s, d) =>
      graft.ml.ModelSelection.autoMlRegression(
        t(s, d, "lineitem").select(
          concat(col("l_orderkey").cast("string"), lit("-"),
            col("l_linenumber").cast("string")).as("rk"),
          dbl(col("l_quantity")).as("x1"),
          dbl(col("l_discount")).as("x2"),
          round(col("l_extendedprice")).cast("double").as("y")),
        "rk", Seq("x1", "x2"), "y")),

    // §2.12 Welch's heteroscedastic one-way ANOVA across event
    // types (statistic + dofs gated; the F-tail p is spec-checked —
    // no F CDF in the oracle engine)
    "q277_welch_anova" -> ((s, d) =>
      StatsOps.welchAnova(
        t(s, d, "events").withColumn("vc", cents(col("value"))),
        "vc", "event_type")
        .select("f_stat", "df1", "df2")),

    // §2.12 variance inflation factors of the three lineitem
    // measures (closed-form 3-var auxiliary R²s from exact sums)
    "q278_vif" -> ((s, d) =>
      StatsOps.vif3(
        t(s, d, "lineitem").select(
          cents(col("l_quantity")).as("qty_c"),
          cents(col("l_extendedprice")).as("price_c"),
          cents(col("l_discount")).as("disc_c")),
        Seq("qty_c", "price_c", "disc_c"))
        .orderBy("column")),

    // §2.12 Breusch–Pagan / Koenker heteroscedasticity of
    // price-dollars ~ quantity (χ²(1) closed-form tail both engines)
    "q279_breusch_pagan" -> ((s, d) =>
      StatsOps.breuschPagan(
        t(s, d, "lineitem").select(
          col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice")).cast("long").as("y")),
        "x", "y")),

    // §2.12 OLS influence diagnostics: top-20 rows by Cook's
    // distance for price-dollars ~ quantity (fully deterministic —
    // closed forms over broadcast exact sums)
    "q280_ols_influence" -> ((s, d) =>
      StatsOps.olsInfluence(
        t(s, d, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice")).cast("long").as("y")),
        "x", "y", Seq("l_orderkey", "l_linenumber"), topK = 20)),

    // pandas corrwith parity: per-user purchase vs click behavior
    // frames aligned on user_id, column-wise correlations
    "q281_corrwith" -> ((s, d) => {
      def side(tpe: String) =
        t(s, d, "events").filter(col("event_type") === tpe &&
            col("value").isNotNull && col("user_id").isNotNull)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(cents(col("value"))).as("v_sum"),
            max(cents(col("value"))).as("v_max"))
      StatsOps.corrWith(side("purchase"), side("click"),
        Seq("user_id"), Seq("n_events", "v_sum", "v_max"))
        .orderBy("column")
    }),

    // pandas sem/mad parity per event type (exact sem, one-shuffle
    // window-reusing mad)
    "q282_sem_mad" -> ((s, d) =>
      StatsOps.semMad(
        t(s, d, "events").filter(col("event_type").isNotNull)
          .withColumn("vc", cents(col("value"))),
        "vc", Seq("event_type"))
        .orderBy("event_type")),

    // §2.12 Games–Howell post-hoc pairs after Welch's ANOVA
    // (statistic + Welch–Satterthwaite df; tukeyHsd convention)
    "q284_games_howell" -> ((s, d) =>
      StatsOps.gamesHowell(
        t(s, d, "events").withColumn("vc", cents(col("value"))),
        "vc", "event_type")
        .orderBy("group_a", "group_b")),

    // §2.12 chi-square cell post-hoc: standardized + Haberman
    // adjusted residuals over the q60 contingency pair
    "q285_chi2_residuals" -> ((s, d) =>
      StatsOps.chiSquareResiduals(
        t(s, d, "events")
          .filter(col("event_type").isNotNull && col("user_id").isNotNull)
          .withColumn("ub", pmod(col("user_id"), lit(5)).cast("long")),
        "event_type", "ub")
        .orderBy("event_type", "ub")),

    // causal-inference covariate balance: SMD purchase vs click over
    // value cents + a user-residue covariate, one aggregate pass
    "q286_smd_balance" -> ((s, d) =>
      StatsOps.smdBalance(
        t(s, d, "events")
          .filter(col("value").isNotNull && col("user_id").isNotNull)
          .select(col("event_type"), cents(col("value")).as("vc"),
            pmod(col("user_id"), lit(1000)).cast("long").as("um")),
        "event_type", "purchase", "click", Seq("vc", "um"))
        .orderBy("covariate")),

    // §2.13 GLM Poisson regression (MLlib IRLS — rows-only gate,
    // coefficient recovery spec'd on a synthetic log-linear process)
    "q292_glm_poisson" -> ((s, d) =>
      graft.ml.MlOps.glmSummary(
        t(s, d, "lineitem").select(
          dbl(col("l_quantity")).as("qty"),
          dbl(col("l_discount")).as("x1"),
          (dbl(col("l_extendedprice")) / 100000.0).as("x2")),
        Seq("x1", "x2"), "qty", family = "poisson", link = "log")),

    // the PORTABLE ORACLE TWIN of q292's Poisson/log IRLS (the
    // q322/q335 precedent): same design matrix, GLM init μ⁰ = y+½,
    // 2 unrolled IRLS rounds with order-free decimal normal
    // equations and a Cramer 3×3 ridge solve — every arithmetic
    // step replayed textually in the DuckDB oracle. Closes the
    // q292 no-oracle ledger row.
    "q441_glm_irls_twin" -> ((s, d) =>
      graft.ml.MlOps.glmPoissonIrlsTwin(
        t(s, d, "lineitem").select(
          dbl(col("l_quantity")).as("qty"),
          dbl(col("l_discount")).as("x1"),
          (dbl(col("l_extendedprice")) / 100000.0).as("x2")),
        "x1", "x2", "qty", rounds = 2)),

    // §2.12 ANOVA effect sizes η²/ω² over the q78 design
    "q293_anova_effect" -> ((s, d) =>
      StatsOps.anovaEffectSizes(
        t(s, d, "events").withColumn("vc", cents(col("value"))),
        "vc", "event_type")),

    // Bayesian A/B on purchase conversion, arms = user parity
    // (Beta(1,1) posteriors, normal-approx P(B>A))
    "q294_bayes_ab" -> ((s, d) =>
      StatsOps.bayesAb(
        t(s, d, "events")
          .filter(col("user_id").isNotNull && col("event_type").isNotNull)
          .select(
            when(pmod(col("user_id"), lit(2)) === 0, "a")
              .otherwise("b").as("arm"),
            (col("event_type") === "purchase").as("succ")),
        "arm", "a", "b", "succ")),

    // §2.14 68-core of the parts co-order graph — the ORACLED peel:
    // k = 68 makes the peel genuinely iterate (5 rounds at sf0.001,
    // 1 at sf0.01, both non-empty cores) and the DuckDB oracle
    // replays it as 12 unrolled survivor-filter rounds (idempotent
    // once converged, so the margin is safe). Closes the q309
    // no-oracle gap per the round-4 verdict; q309 keeps the k=3
    // fixpoint surface.
    "q324_kcore_peel" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"),
        col("l_partkey"))
      val edges = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"),
          col("y.l_partkey").as("dst"))
        // no .distinct() here: every graph op this feeds
        // (kCore/labelProp/PPR/triangles/assortativity/modularity/
        // edgeSupport/kTruss) canonicalizes AND dedups its edge input
        // internally, so a gate-side distinct was a second full
        // exchange of the pair table for the same result
      GraphOps.kCore(edges, k = 68).orderBy("id")
    }),

    // §2.14 label-propagation communities on the parts co-order
    // graph: 4 synchronous rounds, labels init to vertex ids, each
    // vertex adopts its neighborhood's most frequent label with
    // min-label tie-break — fully deterministic, so the DuckDB
    // oracle replays all 4 rounds as unrolled MATERIALIZED CTEs with
    // a row_number argmax (the q324 unroll precedent)
    "q344_label_prop" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"),
        col("l_partkey"))
      val edges = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"),
          col("y.l_partkey").as("dst"))
        // no .distinct() here: every graph op this feeds
        // (kCore/labelProp/PPR/triangles/assortativity/modularity/
        // edgeSupport/kTruss) canonicalizes AND dedups its edge input
        // internally, so a gate-side distinct was a second full
        // exchange of the pair table for the same result
      GraphOps.labelPropagation(edges, rounds = 4)
        .select(col("id").cast("long").as("id"),
          col("lbl").cast("long").as("lbl"))
        .orderBy("id")
    }),

    // §2.12 Box-Cox lambda profile over quantity: per-lambda profile
    // log-likelihood on the canonical half-integer grid (IEEE-exact
    // powers), argmax flagged
    "q387_boxcox" -> ((s, d) =>
      StatsOps.boxCoxProfile(
        t(s, d, "lineitem").select(col("l_quantity").as("qty")),
        "qty")
        .select(col("lambda"), col("n"), round(col("ll"), 6).as("ll"),
          col("is_best"))
        .orderBy("lambda")),

    // §2.12 rank-based inverse-normal transform (Blom RINT): the
    // per-flag quantity distribution forced onto a standard normal —
    // tie-averaged midranks from keyed windows, in-plan Acklam Φ⁻¹
    "q386_rint" -> ((s, d) =>
      StatsOps.rankInverseNormal(
        t(s, d, "lineitem").select(col("l_returnflag").as("g"),
          col("l_quantity").cast("long").as("qty")),
        "qty", Seq("g"))
        .select(col("g"), col("qty"), col("c").cast("long").as("c"),
          col("n").cast("long").as("n"),
          round(col("midrank"), 6).as("midrank"),
          round(col("rint"), 6).as("rint"))
        .orderBy("g", "qty")),

    // multi-feature drift report: per-feature PSI (explicit breaks)
    // between early (<=1994) and late shipping cohorts, ONE scan via
    // stack + one (feature, bin) aggregate
    "q384_drift_report" -> ((s, d) =>
      StatsOps.driftReport(
        t(s, d, "lineitem").select(
          when(year(col("l_shipdate")) <= 1994, "early")
            .otherwise("late").as("coh"),
          col("l_quantity").cast("double").as("qty"),
          round(col("l_extendedprice")).cast("double").as("usd"),
          round(col("l_discount") * 100).cast("double").as("disc")),
        "coh", "early", "late",
        Seq(("qty", Seq(10.0, 20.0, 30.0, 40.0)),
          ("usd", Seq(20000.0, 40000.0, 60000.0, 80000.0)),
          ("disc", Seq(2.0, 4.0, 6.0, 8.0))))
        .select(col("feature"), col("n_a"), col("n_b"),
          round(col("psi"), 6).as("psi"))
        .orderBy("feature")),

    // adaptive conformal radius tracking (Gibbs-Candès online
    // update, no exchangeability needed): per return flag, walk the
    // daily |actual - predicted| price series and drive the interval
    // radius q += gamma*(miss - alpha); emits final radius + realized
    // miss rate. Bounded per-day series -> recursive-CTE replay
    "q383_adaptive_conformal" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(
        col("l_returnflag").as("g"),
        col("l_shipdate").cast("date").as("day"),
        cents(col("l_extendedprice")).as("pc"),
        col("l_quantity").cast("long").as("qty"))
      val rate = li.groupBy("g")
        .agg((sum("pc").cast("double") / sum("qty").cast("double"))
          .as("rate"))
      val daily = li.groupBy(col("g"), col("day"))
        .agg(sum("pc").as("spc"), sum("qty").as("sqty"))
        .join(rate, Seq("g"))
        .select(col("g"), col("day"),
          col("spc").cast("double").as("y"),
          (col("sqty").cast("double") * col("rate")).as("yhat"))
      graft.ml.Conformal.adaptiveConformal(daily, Seq("g"), "y",
          "yhat", "day", alpha = 0.1, gamma = 1000.0)
        .select(col("g"), col("n"), col("n_miss"),
          round(col("miss_rate"), 6).as("miss_rate"),
          round(col("q_final"), 6).as("q_final"))
        .orderBy("g")
    }),

    // §2.11 the three standard forecast baselines (naive / seasonal
    // naive m=24 / drift) per event type over the hourly series —
    // the yardstick row every forecaster gate compares against
    "q381_baselines" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("b"))
        .agg(sum(cents(col("value"))).cast("double").as("v"))
      TimeSeriesOps.groupedBaselineForecasts(hourly, "v", "b",
          Seq("event_type"), season = 24, steps = 3)
        .select(col("event_type"), col("n"), col("h"),
          round(col("naive"), 6).as("naive"),
          round(col("snaive"), 6).as("snaive"),
          round(col("drift"), 6).as("drift"))
        .orderBy("event_type", "h")
    }),

    // §2.11 Theta-method forecast (M3 winner; Hyndman-Billah SES+
    // half-drift form) per event type over the hourly cents series:
    // SES fold with in-fold decay accumulation, exact-sum OLS slope
    "q380_theta" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("b"))
        .agg(sum(cents(col("value"))).cast("double").as("v"))
      TimeSeriesOps.groupedThetaForecast(hourly, "v", "b",
          Seq("event_type"), alpha = 0.4, steps = 3)
        .select(col("event_type"), col("n"), col("h"),
          round(col("forecast"), 6).as("forecast"))
        .orderBy("event_type", "h")
    }),

    // §2.11 Croston/SBA intermittent-demand forecast per nation:
    // daily urgent-order counts on a ZERO-FILLED calendar (absence
    // of demand is data), demand-size + interval EWMAs via the
    // grouped codegen fold, replayed by a recursive CTE
    "q379_croston" -> ((s, d) => {
      val cust = t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val dem = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("k"),
          col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      val bounds = t(s, d, "orders").agg(
        min(col("o_orderdate").cast("date")).as("d0"),
        max(col("o_orderdate").cast("date")).as("d1"))
      val cal = t(s, d, "nation").select(col("n_nationkey").as("k"))
        .crossJoin(broadcast(bounds))
        .select(col("k"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      val series = cal.join(dem, Seq("k", "day"), "left")
        .select(col("k"), col("day"),
          coalesce(col("cnt"), lit(0.0)).as("v"))
      TimeSeriesOps.groupedCroston(series, "v", "day", Seq("k"),
          alpha = 0.3)
        .select(col("k"), col("n_periods"), col("n_demands"),
          round(col("size_ewma"), 6).as("size_ewma"),
          round(col("interval_ewma"), 6).as("interval_ewma"),
          round(col("croston"), 6).as("croston"),
          round(col("sba"), 6).as("sba"))
        .orderBy("k")
    }),

    // §2.12 Brunner-Munzel nonparametric Behrens-Fisher test on
    // click-vs-view cents: range-bucketed combined + within-group
    // midrank maps, exact doubled-halfrank sums, Satterthwaite df,
    // common-language effect, A&S normal p
    "q377_brunner_munzel" -> ((s, d) =>
      StatsOps.brunnerMunzel(
        t(s, d, "events").filter(col("value").isNotNull)
          .select(col("event_type"), cents(col("value")).as("vc")),
        "vc", "event_type", "click", "view")
        .select(col("n_a"), col("n_b"),
          round(col("p_hat"), 6).as("p_hat"),
          round(col("w_stat"), 6).as("w_stat"),
          round(col("df"), 6).as("df"),
          round(col("p_norm"), 6).as("p_norm"))),

    // §2.12 ICC(1,1) one-way random-effects intraclass correlation
    // with unbalanced-design k0: line-price-dollar consistency
    // within orders (groups = orders)
    "q375_icc" -> ((s, d) =>
      StatsOps.iccOneWay(
        t(s, d, "lineitem").select(col("l_orderkey"),
          round(col("l_extendedprice")).cast("long").as("usd")),
        "l_orderkey", "usd")
        .select(col("n_groups"), col("n_obs"),
          round(col("msb"), 6).as("msb"),
          round(col("msw"), 6).as("msw"),
          round(col("k0"), 6).as("k0"),
          round(col("icc"), 6).as("icc"))),

    // §2.12 Bland-Altman agreement between the order-header total
    // and the summed line gross (both dollars): bias, SD of diffs,
    // 95% limits of agreement, share of orders within limits
    "q376_bland_altman" -> ((s, d) => {
      val lines = t(s, d, "lineitem")
        .groupBy(col("l_orderkey").as("ok"))
        .agg(sum(round(col("l_extendedprice")).cast("long"))
          .as("line_usd"))
      val paired = t(s, d, "orders").select(
          col("o_orderkey").as("ok"),
          round(col("o_totalprice")).cast("long").as("hdr_usd"))
        .join(lines, Seq("ok"))
      StatsOps.blandAltman(paired, "hdr_usd", "line_usd")
        .select(col("n"), round(col("mean_diff"), 6).as("mean_diff"),
          round(col("sd_diff"), 6).as("sd_diff"),
          round(col("loa_lo"), 6).as("loa_lo"),
          round(col("loa_hi"), 6).as("loa_hi"),
          col("n_within"),
          round(col("pct_within"), 6).as("pct_within"))
    }),

    // §2.12 Yuen trimmed-mean t-test (robust Welch) on A-vs-R price
    // dollars, 20% trim: per-group rank window, winsor-bound picks,
    // exact conditional sums, closed form + A&S normal p
    "q374_yuen" -> ((s, d) =>
      StatsOps.yuenTTest(
        t(s, d, "lineitem").select(col("l_returnflag").as("g"),
          round(col("l_extendedprice")).cast("long").as("usd")),
        "usd", "g", "A", "R", trim = 0.2)
        .select(col("n_a"), col("n_b"), col("h_a"), col("h_b"),
          round(col("tmean_a"), 6).as("tmean_a"),
          round(col("tmean_b"), 6).as("tmean_b"),
          round(col("t_stat"), 6).as("t_stat"),
          round(col("df"), 6).as("df"),
          round(col("p_norm"), 6).as("p_norm"))),

    // group-sequential monitoring: monthly interim looks at the
    // click-vs-view experiment, cumulative exact sums -> Welch z per
    // look vs the Bonferroni z_(1-α/2K) boundary with K read from
    // the data and the quantile via the in-plan Acklam Φ⁻¹
    "q373_sequential" -> ((s, d) =>
      StatsOps.sequentialLooks(
        t(s, d, "events").filter(col("value").isNotNull)
          .select(col("event_type"),
            date_trunc("month", col("ts")).cast("date").as("mo"),
            cents(col("value")).as("vc")),
        "event_type", "vc", "mo", "click", "view", alpha = 0.05)
        .select(col("look"), col("na"), col("nb"),
          round(col("z"), 6).as("z"),
          round(col("boundary"), 6).as("boundary"), col("crossed"))
        .orderBy("look")),

    // coarsened exact matching (Iacus-King-Porro): strata = order
    // status x order year, treatment = urgent/high priority, outcome
    // = order price cents. Per-stratum exact cells + ATT
    // contributions; strata without common support pruned
    "q364_cem" -> ((s, d) =>
      StatsOps.cem(
        t(s, d, "orders").select(
          col("o_orderstatus").as("status"),
          year(col("o_orderdate")).cast("long").as("yr"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            .as("treated"),
          cents(col("o_totalprice")).as("oc")),
        "treated", "oc", Seq("status", "yr"))
        .select(col("status"), col("yr"), col("n_treat"),
          col("n_ctrl"),
          round(col("mean_treat"), 6).as("mean_treat"),
          round(col("mean_ctrl"), 6).as("mean_ctrl"),
          round(col("att_contrib"), 9).as("att_contrib"))
        .orderBy("status", "yr")),

    // CUPED variance reduction (Deng et al. 2013): arms = orderkey
    // parity, metric = price DOLLARS (exact long sums — Σy² of cents
    // would overflow), covariate = quantity. Emits per-arm raw vs
    // adjusted means + pooled theta / rho^2
    "q365_cuped" -> ((s, d) =>
      StatsOps.cupedByArm(
        t(s, d, "lineitem").select(
          pmod(col("l_orderkey"), lit(2)).cast("long").as("arm"),
          round(col("l_extendedprice")).cast("long").as("usd"),
          col("l_quantity").cast("long").as("qty")),
        "arm", "usd", "qty")
        .select(col("arm"), col("n"),
          round(col("y_mean"), 6).as("y_mean"),
          round(col("y_cuped_mean"), 6).as("y_cuped_mean"),
          round(col("theta"), 6).as("theta"),
          round(col("var_reduction"), 6).as("var_reduction"))
        .orderBy("arm")),

    // §2.12 power analysis (statsmodels NormalIndPower family):
    // achieved power of the two-sided z test at the observed
    // click-vs-view effect + required per-group n for 0.8 power.
    // Exact sufficient sums; Φ is the shared A&S polynomial and the
    // z quantiles are Acklam constants interpolated into the oracle
    "q363_power_analysis" -> ((s, d) =>
      StatsOps.powerTwoSample(
        t(s, d, "events")
          .filter(col("event_type").isin("click", "view"))
          .select(col("event_type"), cents(col("value")).as("vc")),
        "vc", "event_type", "click", "view",
        alpha = 0.05, targetPower = 0.8)),

    // split-conformal prediction intervals (Lei et al. 2018) around
    // a per-flag unit-rate predictor of lineitem price: calibration =
    // even orderkeys fits rate = Σprice/Σqty and supplies the α=0.1
    // residual quantile at the EXACT integer rank ⌈(n+1)·9/10⌉; test
    // rows report empirical coverage of ŷ ± q̂. All inputs exact
    // cents/longs; the only doubles are two int ratios and |y−ŷ|,
    // replayed in the same association order
    "q361_conformal" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(
        col("l_returnflag").as("k"),
        cents(col("l_extendedprice")).as("pc"),
        col("l_quantity").cast("long").as("qty"),
        (pmod(col("l_orderkey"), lit(2)) === 0).as("cal"))
      val rate = li.filter(col("cal")).groupBy("k")
        .agg((sum("pc").cast("double") / sum("qty").cast("double"))
          .as("rate"))
      val scored = li.join(rate, Seq("k"))
        .withColumn("y", col("pc").cast("double"))
        .withColumn("yhat", col("qty").cast("double") * col("rate"))
      graft.ml.Conformal.splitConformal(scored, Seq("k"), "y", "yhat",
          "cal", alphaNum = 1, alphaDen = 10)
        .select(col("k"), col("n_cal"), col("rank"), col("n_test"),
          col("n_covered"), round(col("qhat"), 6).as("qhat"),
          round(col("coverage"), 6).as("coverage"))
        .orderBy("k")
    }),

    // interval merge (gaps-and-islands) per supplier: each shipment
    // opens a 7-day activity window [shipdate, shipdate+6]; merged
    // islands = the supplier's continuous activity spans. Touching
    // intervals merge; strict gaps break. Two per-key windows
    "q372_merge_intervals" -> ((s, d) =>
      graft.ops.PandasOps.mergeIntervals(
        t(s, d, "lineitem").select(col("l_suppkey"),
          col("l_shipdate").cast("date").as("s0"),
          date_add(col("l_shipdate").cast("date"), 6).as("e0")),
        Seq("l_suppkey"), "s0", "e0")
        .select(col("l_suppkey"), col("island").cast("long")
            .as("island"),
          col("start"), col("end"),
          col("n_intervals").cast("long").as("n_intervals"))
        .orderBy("l_suppkey", "island")),

    // §2.14 degree assortativity of the parts co-order graph
    // (Newman 2002): exact long edge-endpoint-degree sums, double
    // closed form — do popular parts co-occur with popular parts?
    "q371_assortativity" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"),
        col("l_partkey"))
      val edges = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"),
          col("y.l_partkey").as("dst"))
        // no .distinct() here: every graph op this feeds
        // (kCore/labelProp/PPR/triangles/assortativity/modularity/
        // edgeSupport/kTruss) canonicalizes AND dedups its edge input
        // internally, so a gate-side distinct was a second full
        // exchange of the pair table for the same result
      GraphOps.assortativity(edges)
        .select(col("m_edges"), col("sjk"), col("ssum"), col("ssq"),
          round(col("assortativity"), 6).as("assortativity"))
    }),

    // §2.14 Newman modularity of the p_brand partition over the
    // parts co-order graph — the partition-quality metric for any
    // community output. Exact integer counts (nodes, degree mass,
    // internal edges) per community; dq double in one fixed
    // association order; the graph-level Q is sum(dq)
    "q360_modularity" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"),
        col("l_partkey"))
      val edges = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"),
          col("y.l_partkey").as("dst"))
        // no .distinct() here: every graph op this feeds
        // (kCore/labelProp/PPR/triangles/assortativity/modularity/
        // edgeSupport/kTruss) canonicalizes AND dedups its edge input
        // internally, so a gate-side distinct was a second full
        // exchange of the pair table for the same result
      val brands = t(s, d, "part").select(
        col("p_partkey").as("id"), col("p_brand").as("comm"))
      GraphOps.modularity(edges, brands)
        .select(col("comm"),
          col("n_nodes").cast("long").as("n_nodes"),
          col("degree_sum").cast("long").as("degree_sum"),
          col("internal_edges").cast("long").as("internal_edges"),
          round(col("dq"), 6).as("dq"))
        .orderBy("comm")
    }),

    // §2.14 3-core of the parts co-order graph (iterative peel —
    // rows-only: fixpoint refinement has no SQL form; K4 spec)
    "q309_kcore" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"),
        col("l_partkey"))
      val edges = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"),
          col("y.l_partkey").as("dst"))
        // no .distinct() here: every graph op this feeds
        // (kCore/labelProp/PPR/triangles/assortativity/modularity/
        // edgeSupport/kTruss) canonicalizes AND dedups its edge input
        // internally, so a gate-side distinct was a second full
        // exchange of the pair table for the same result
      GraphOps.kCore(edges, k = 3).orderBy("id")
    }),

    // §2.14 triangle counts + local clustering on the parts-
    // co-ordered-together graph (degree-ordered orientation — the
    // hub-safe O(m^1.5) join shape)
    "q287_triangles" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"),
        col("l_partkey"))
      val edges = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"),
          col("y.l_partkey").as("dst"))
        // no .distinct() here: every graph op this feeds
        // (kCore/labelProp/PPR/triangles/assortativity/modularity/
        // edgeSupport/kTruss) canonicalizes AND dedups its edge input
        // internally, so a gate-side distinct was a second full
        // exchange of the pair table for the same result
      GraphOps.triangleCounts(edges)
        .select(col("id"), col("triangles"),
          round(col("clustering"), 6).as("clustering"))
        .orderBy("id")
    }),

    // §2.14+ link-prediction score suite (common neighbors, Jaccard,
    // cosine, preferential attachment) on the supplier co-purchase
    // graph — exact BIGINT counts/degrees, one final correctly-
    // rounded double per score (order-free by construction).
    // maxDeg = 300 binds the postings fan-out on denser organic
    // graphs (the q391 hub-cap argument; at sf0.1 the uncapped
    // postings join fans out ~deg² per hub and ran 10.6 s)
    "q401_link_predict" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"),
        col("l_suppkey"))
      val edges = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_suppkey") < col("y.l_suppkey"))
        .select(col("x.l_suppkey").as("src"),
          col("y.l_suppkey").as("dst"))
        .distinct()
      GraphOps.linkPredict(edges, maxDeg = 300)
        .select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"), col("n_common"),
          col("deg_src"), col("deg_dst"),
          round(col("jaccard"), 9).as("jaccard"),
          round(col("cosine"), 9).as("cosine"),
          col("pref_attach"))
        .orderBy("src", "dst")
    }),

    // §2.14+ personalized PageRank (random walk with restart) on
    // the parts-co-ordered graph from sources {1,2,3}: 3 rounds of
    // EXACT BIGINT mass propagation on a 1e12 lattice with integer
    // `div` replayed by the oracle's `//`; single final normalize
    "q402_ppr" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"),
        col("l_partkey"))
      val und = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"),
          col("y.l_partkey").as("dst"))
        // no .distinct() here: every graph op this feeds
        // (kCore/labelProp/PPR/triangles/assortativity/modularity/
        // edgeSupport/kTruss) canonicalizes AND dedups its edge input
        // internally, so a gate-side distinct was a second full
        // exchange of the pair table for the same result
      // PPR is directed (the pageRank/hits contract); symmetrize
      // the co-purchase graph here
      val edges = und.union(und.select(col("dst").as("src"),
        col("src").as("dst")))
      GraphOps.personalizedPageRank(edges,
          sources = Seq(1L, 2L, 3L), rounds = 3)
        .select(col("id").cast("long").as("id"), col("ppr"),
          round(col("ppr_norm"), 9).as("ppr_norm"))
        .orderBy("id")
    }),

    // §2.14+ per-edge triangle support (the k-truss building block)
    // on the parts-co-ordered graph: each triangle enumerated once
    // via the a<b<c orientation, exact BIGINT credit to its 3 edges
    "q403_edge_support" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"),
        col("l_partkey"))
      val edges = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"),
          col("y.l_partkey").as("dst"))
        // no .distinct() here: every graph op this feeds
        // (kCore/labelProp/PPR/triangles/assortativity/modularity/
        // edgeSupport/kTruss) canonicalizes AND dedups its edge input
        // internally, so a gate-side distinct was a second full
        // exchange of the pair table for the same result
      GraphOps.edgeSupport(edges)
        .select(col("u").cast("long").as("u"),
          col("v").cast("long").as("v"), col("support"))
        .orderBy("u", "v")
    }),

    // §2.14+ 12-truss after 3 synchronous prune rounds (the bounded-
    // unroll precedent of q344/q392; the fixpoint path rounds = -1
    // is spec'd in GraphLinkTrussSpec) — support recomputed on the
    // SURVIVING edge set each round, exact integer counts throughout
    "q404_ktruss" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"),
        col("l_partkey"))
      val edges = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"),
          col("y.l_partkey").as("dst"))
        // no .distinct() here: every graph op this feeds
        // (kCore/labelProp/PPR/triangles/assortativity/modularity/
        // edgeSupport/kTruss) canonicalizes AND dedups its edge input
        // internally, so a gate-side distinct was a second full
        // exchange of the pair table for the same result
      GraphOps.kTruss(edges, k = 12, rounds = 3)
        .select(col("a").cast("long").as("a"),
          col("b").cast("long").as("b"), col("support"))
        .orderBy("a", "b")
    })
  )

  /** q324 oracle: the k-core peel unrolled — e_{i+1} keeps edges
    * whose BOTH endpoints have degree >= k within e_i. 12 rounds
    * cover the observed 5-round worst case with margin; once the
    * peel converges further rounds are identity filters. */
  // 4 unrolled synchronous LPA rounds: per round, neighbor-label
  // counts then a row_number argmax (count DESC, label ASC) — the
  // exact SQL image of Spark's max(struct(c, −lbl)) tie-break
  private val labelPropOracle: String = {
    val rounds = (0 until 4).map { i =>
      s"""l${i + 1} AS MATERIALIZED (
         |  SELECT l.id, coalesce(w.nlbl, l.lbl) AS lbl
         |  FROM l$i l LEFT JOIN (
         |    SELECT vid AS id, lbl AS nlbl FROM (
         |      SELECT cc.vid, cc.lbl, row_number() OVER (
         |          PARTITION BY cc.vid
         |          ORDER BY cc.cnt DESC, cc.lbl ASC) AS rk
         |      FROM (SELECT e.src AS vid, x.lbl, count(*) AS cnt
         |            FROM e JOIN l$i x ON e.dst = x.id
         |            GROUP BY e.src, x.lbl) cc) rr
         |    WHERE rk = 1) w ON l.id = w.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH und AS (
       |  SELECT DISTINCT x.l_partkey AS src, y.l_partkey AS dst
       |  FROM lineitem x JOIN lineitem y
       |    ON x.l_orderkey = y.l_orderkey
       |   AND x.l_partkey < y.l_partkey),
       |e AS MATERIALIZED (SELECT src, dst FROM und
       |      UNION SELECT dst, src FROM und),
       |l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS lbl
       |      FROM e),
       |$rounds
       |SELECT CAST(id AS BIGINT) AS id, CAST(lbl AS BIGINT) AS lbl
       |FROM l4 ORDER BY id""".stripMargin
  }

  private val kcorePeelOracle: String = {
    val k = 68
    val rounds = (0 until 12).map { i =>
      s"""e${i + 1} AS MATERIALIZED (
         |  SELECT e.src, e.dst FROM e$i e
         |  JOIN (SELECT src FROM e$i GROUP BY 1
         |        HAVING count(*) >= $k) ka ON ka.src = e.src
         |  JOIN (SELECT src AS dst FROM e$i GROUP BY 1
         |        HAVING count(*) >= $k) kb ON kb.dst = e.dst)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH und AS (
       |  SELECT DISTINCT x.l_partkey AS src, y.l_partkey AS dst
       |  FROM lineitem x JOIN lineitem y
       |    ON x.l_orderkey = y.l_orderkey
       |   AND x.l_partkey < y.l_partkey),
       |e0 AS MATERIALIZED (SELECT src, dst FROM und
       |       UNION SELECT dst, src FROM und),
       |$rounds
       |SELECT src AS id, CAST(count(*) AS BIGINT) AS core_degree
       |FROM e12 GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // q441: the IRLS twin's normal-equation cells and Cramer solve,
  // generated once per round so the ridge/solve text cannot drift
  // between rounds (mirrors MlOps.glmPoissonIrlsTwin exactly)
  private val glmIrlsTwinOracle: String = {
    def cells(src: String) = {
      def c(term: String, name: String) =
        s"CAST(sum(CAST(round($term, 12) AS DECIMAL(38,12))) " +
          s"AS DOUBLE) AS $name"
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |    ${c("w", "a11")}, ${c("w * x1", "a12")},
         |    ${c("w * x2", "a13")}, ${c("w * x1 * x1", "a22")},
         |    ${c("w * x1 * x2", "a23")}, ${c("w * x2 * x2", "a33")},
         |    ${c("w * z", "c1")}, ${c("w * x1 * z", "c2")},
         |    ${c("w * x2 * z", "c3")}
         |  FROM $src""".stripMargin
    }
    val dt = "((a11 + 1e-6) * ((a22 + 1e-6) * (a33 + 1e-6) " +
      "- a23 * a23) - a12 * (a12 * (a33 + 1e-6) - a23 * a13) " +
      "+ a13 * (a12 * a23 - (a22 + 1e-6) * a13))"
    def solve(src: String) =
      s"""SELECT n,
         |    round((c1 * ((a22 + 1e-6) * (a33 + 1e-6) - a23 * a23) -
         |      a12 * (c2 * (a33 + 1e-6) - a23 * c3) +
         |      a13 * (c2 * a23 - (a22 + 1e-6) * c3)) / $dt, 12) AS b0,
         |    round(((a11 + 1e-6) * (c2 * (a33 + 1e-6) - a23 * c3) -
         |      c1 * (a12 * (a33 + 1e-6) - a23 * a13) +
         |      a13 * (a12 * c3 - c2 * a13)) / $dt, 12) AS b1,
         |    round(((a11 + 1e-6) * ((a22 + 1e-6) * c3 - c2 * a23) -
         |      a12 * (a12 * c3 - c2 * a13) +
         |      c1 * (a12 * a23 - (a22 + 1e-6) * a13)) / $dt, 12) AS b2
         |  FROM $src""".stripMargin
    s"""WITH base AS (
       |  SELECT CAST(l_quantity AS DOUBLE) AS y,
       |    CAST(l_discount AS DOUBLE) AS x1,
       |    CAST(l_extendedprice AS DOUBLE) / 100000.0 AS x2
       |  FROM lineitem
       |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
       |    AND l_extendedprice IS NOT NULL AND l_quantity >= 0),
       |r1 AS (
       |  SELECT y, x1, x2, y + 0.5 AS w,
       |    round(ln(y + 0.5), 9) - 0.5 / (y + 0.5) AS z
       |  FROM base),
       |n1 AS (${cells("r1")}),
       |b1 AS (${solve("n1")}),
       |r2a AS (
       |  SELECT y, x1, x2, t.b0 + t.b1 * x1 + t.b2 * x2 AS eta
       |  FROM base CROSS JOIN b1 t),
       |r2 AS (
       |  SELECT y, x1, x2,
       |    greatest(round(exp(eta), 9), 1e-6) AS w,
       |    eta + (y - greatest(round(exp(eta), 9), 1e-6)) /
       |      greatest(round(exp(eta), 9), 1e-6) AS z
       |  FROM r2a),
       |n2 AS (${cells("r2")}),
       |b2 AS (${solve("n2")})
       |SELECT CAST(2 AS BIGINT) AS n_rounds, n, b0, b1, b2
       |FROM b2""".stripMargin
  }

  // q501/q502 SARIMA twins: determinant cofactor expansion GENERATED
  // in Scala (the q441 convention — the solve text cannot drift from
  // the cell naming), used for the stage-1 5×5 and stage-2 3×3
  // ridge Cramer solves of the Hannan–Rissanen twin.
  private def detSql(m: Vector[Vector[String]]): String =
    if (m.size == 1) s"(${m(0)(0)})"
    else m(0).indices.map { j =>
      val minor = m.tail.map(_.patch(j, Vector.empty[String], 1))
      val sign = if (j % 2 == 0) "+" else "-"
      s"$sign (${m(0)(j)}) * ${detSql(minor)}"
    }.mkString("(", " ", ")")

  /** Cramer solve text: coefficient k = det(A with column k
    * replaced by b) / det(A). Returns (detA, Vector(numerators)). */
  private def cramerSql(a: Vector[Vector[String]],
      b: Vector[String]): (String, Vector[String]) = {
    val det = detSql(a)
    val nums = b.indices.toVector.map { k =>
      detSql(a.map(_.zipWithIndex.map { case (c, j) =>
        if (j == k) "§" else c }).zip(b)
        .map { case (row, bi) => row.map(c => if (c == "§") bi else c) })
    }
    (det, nums)
  }

  /** md5 16-bit-chunk integer in DuckDB — replays Spark's
    * conv(substring(md5(nk-t salt), 1, 4), 16, 10). */
  private def h16Sql(salt: String, tExpr: String): String =
    "CAST(list_sum(list_transform(range(1, 5), i -> " +
      "(strpos('0123456789abcdef', substr(md5(CAST(nk AS VARCHAR) " +
      s"|| '-' || CAST($tExpr AS VARCHAR) || '$salt'), i, 1)) - 1) " +
      "* power(16, 4 - i))) AS BIGINT)"

  // q501: seasonal-differencing SARIMA twin — lag-12 differencing,
  // the same ridge Cramer 3×3 as q335 on the DIFFERENCED series,
  // forecast recurrence, then the seasonal integration chain
  // (forecast_k = fw_k + y[60+k]); all double arithmetic written in
  // the Scala evaluation order.
  private val sarimaSdiffTwinOracle: String = {
    val h = h16Sql("sd10", "t")
    s"""WITH RECURSIVE n0 AS (
       |  SELECT CAST(n_nationkey AS BIGINT) AS nk,
       |    CAST(1 + n_nationkey % 3 AS DOUBLE) AS c
       |  FROM nation),
       |n1 AS (
       |  SELECT nk, c,
       |    list_transform(range(0, 24), t ->
       |      CAST(50 + $h % 40 AS DOUBLE)) AS seeds
       |  FROM n0),
       |gen AS (
       |  SELECT nk, c, 23 AS t, seeds AS ys FROM n1
       |  UNION ALL
       |  SELECT nk, c, t + 1,
       |    list_append(ys, ys[len(ys) - 11] + c
       |      + CAST(0.5 AS DOUBLE) * (ys[len(ys)] - ys[len(ys) - 12])
       |      + CAST(0.25 AS DOUBLE) *
       |        (ys[len(ys) - 11] - ys[len(ys) - 23]))
       |  FROM gen WHERE t < 71),
       |wd AS (
       |  SELECT nk, ys,
       |    list_transform(range(13, 73), i -> ys[i] - ys[i - 12])
       |      AS ws
       |  FROM gen WHERE t = 71),
       |fit AS (
       |  SELECT nk, ys, ws,
       |    list_sum(list_transform(range(13, 61),
       |      i -> ws[i - 1])) AS s1,
       |    list_sum(list_transform(range(13, 61),
       |      i -> ws[i - 12])) AS s2,
       |    list_sum(list_transform(range(13, 61),
       |      i -> ws[i])) AS sy,
       |    list_sum(list_transform(range(13, 61),
       |      i -> ws[i - 1] * ws[i - 1])) AS s11,
       |    list_sum(list_transform(range(13, 61),
       |      i -> ws[i - 1] * ws[i - 12])) AS s12,
       |    list_sum(list_transform(range(13, 61),
       |      i -> ws[i - 12] * ws[i - 12])) AS s22,
       |    list_sum(list_transform(range(13, 61),
       |      i -> ws[i - 1] * ws[i])) AS s1y,
       |    list_sum(list_transform(range(13, 61),
       |      i -> ws[i - 12] * ws[i])) AS s2y
       |  FROM wd),
       |rdg AS (
       |  SELECT *, 1e-8 * ((48.0 + s11) + s22) / 3 AS lam FROM fit),
       |sol AS (
       |  SELECT nk, ys, ws,
       |    (48.0 + lam) AS a00, s1 AS a01, s2 AS a02,
       |    (s11 + lam) AS a11, s12 AS a12, (s22 + lam) AS a22,
       |    sy, s1y, s2y
       |  FROM rdg),
       |coef AS (
       |  SELECT nk, ys, ws,
       |    (a00 * (a11 * a22 - a12 * a12)
       |      - a01 * (a01 * a22 - a12 * a02)
       |      + a02 * (a01 * a12 - a11 * a02)) AS det,
       |    (sy * (a11 * a22 - a12 * a12)
       |      - a01 * (s1y * a22 - a12 * s2y)
       |      + a02 * (s1y * a12 - a11 * s2y)) AS detc,
       |    (a00 * (s1y * a22 - a12 * s2y)
       |      - sy * (a01 * a22 - a12 * a02)
       |      + a02 * (a01 * s2y - s1y * a02)) AS detp,
       |    (a00 * (a11 * s2y - s1y * a12)
       |      - a01 * (a01 * s2y - s1y * a02)
       |      + sy * (a01 * a12 - a11 * a02)) AS dets
       |  FROM sol),
       |ch AS (
       |  SELECT nk, ys, ws, detc / det AS c_hat,
       |    detp / det AS phi_hat, dets / det AS sar_hat
       |  FROM coef),
       |f AS (
       |  SELECT nk, 0 AS h, ws[60] AS fv, c_hat, phi_hat, sar_hat,
       |    ws, ys
       |  FROM ch
       |  UNION ALL
       |  SELECT nk, h + 1,
       |    c_hat + phi_hat * fv + sar_hat * ws[49 + h],
       |    c_hat, phi_hat, sar_hat, ws, ys
       |  FROM f WHERE h < 6)
       |SELECT nk AS n_nationkey, CAST(h AS BIGINT) AS h,
       |  fv + ys[60 + h] AS forecast
       |FROM f WHERE h >= 1""".stripMargin
  }

  // q502: Hannan–Rissanen MA twin — stage-1 long-AR (m = 4) via the
  // GENERATED 5×5 ridge Cramer, innovation estimates, stage-2 joint
  // (AR lag, innovation lag) 3×3 ridge Cramer, the recursive
  // in-sample residual recurrence, and the MA-term forecast.
  private val arimaHrTwinOracle: String = {
    val h = h16Sql("hr10", "t")
    def lsum(lo: Int, hi: Int, term: String) =
      s"list_sum(list_transform(range($lo, $hi), i -> $term))"
    // stage 1 cells over i = 5..19 (15 obs): y = ws[i], x_j = ws[i-j]
    val s1Cells = (
      (1 to 4).map(j => s"${lsum(5, 20, s"ws[i - $j]")} AS c$j") ++
      (for (j <- 1 to 4; k <- j to 4) yield
        s"${lsum(5, 20, s"ws[i - $j] * ws[i - $k]")} AS c$j$k") ++
      Seq(s"${lsum(5, 20, "ws[i]")} AS d0") ++
      (1 to 4).map(j => s"${lsum(5, 20, s"ws[i - $j] * ws[i]")} AS d$j")
      ).mkString(",\n    ")
    val a5 = Vector(
      Vector("a00", "c1", "c2", "c3", "c4"),
      Vector("c1", "a11", "c12", "c13", "c14"),
      Vector("c2", "c12", "a22", "c23", "c24"),
      Vector("c3", "c13", "c23", "a33", "c34"),
      Vector("c4", "c14", "c24", "c34", "a44"))
    val (det5, nums5) = cramerSql(a5,
      Vector("d0", "d1", "d2", "d3", "d4"))
    val a3 = Vector(
      Vector("g00", "e1", "e2"),
      Vector("e1", "g11", "e12"),
      Vector("e2", "e12", "g22"))
    val (det3, nums3) = cramerSql(a3, Vector("f0", "f1", "f2"))
    s"""WITH RECURSIVE n0 AS (
       |  SELECT CAST(n_nationkey AS BIGINT) AS nk,
       |    CAST(5 + n_nationkey % 3 AS DOUBLE) AS c
       |  FROM nation),
       |n1 AS (
       |  SELECT nk, c,
       |    list_transform(range(0, 19), t ->
       |      CAST($h % 1000 AS DOUBLE) / 100.0 - 5.0) AS seeds
       |  FROM n0),
       |gen AS (
       |  SELECT nk, c, seeds, 3 AS t,
       |    list_transform(seeds[1:4], s -> 20.0 + s) AS ws
       |  FROM n1
       |  UNION ALL
       |  SELECT nk, c, seeds, t + 1,
       |    list_append(ws, c + CAST(0.5 AS DOUBLE) * ws[len(ws)]
       |      + seeds[t + 2] - CAST(0.3 AS DOUBLE) * seeds[t + 1])
       |  FROM gen WHERE t < 18),
       |wt AS MATERIALIZED (SELECT nk, ws FROM gen WHERE t = 18),
       |s1 AS (
       |  SELECT nk, ws,
       |    $s1Cells
       |  FROM wt),
       |s1r AS (
       |  SELECT *,
       |    1e-8 * ((((15.0 + c11) + c22) + c33) + c44) / 5 AS lam
       |  FROM s1),
       |s1m AS (
       |  SELECT nk, ws, c1, c2, c3, c4, c12, c13, c14, c23, c24,
       |    c34, d0, d1, d2, d3, d4,
       |    (15.0 + lam) AS a00, (c11 + lam) AS a11,
       |    (c22 + lam) AS a22, (c33 + lam) AS a33, (c44 + lam) AS a44
       |  FROM s1r),
       |s1k AS (
       |  SELECT nk, ws,
       |    ${nums5(0)} / $det5 AS ic1,
       |    ${nums5(1)} / $det5 AS p1,
       |    ${nums5(2)} / $det5 AS p2,
       |    ${nums5(3)} / $det5 AS p3,
       |    ${nums5(4)} / $det5 AS p4
       |  FROM s1m),
       |ep AS (
       |  SELECT nk, ws,
       |    list_transform(range(1, 20), i -> CASE WHEN i >= 5
       |      THEN ws[i] - (ic1 + p1 * ws[i - 1] + p2 * ws[i - 2]
       |        + p3 * ws[i - 3] + p4 * ws[i - 4])
       |      ELSE CAST(0.0 AS DOUBLE) END) AS epsl
       |  FROM s1k),
       |s2 AS (
       |  SELECT nk, ws, epsl,
       |    ${lsum(6, 20, "ws[i - 1]")} AS e1,
       |    ${lsum(6, 20, "epsl[i - 1]")} AS e2,
       |    ${lsum(6, 20, "ws[i - 1] * ws[i - 1]")} AS e11,
       |    ${lsum(6, 20, "ws[i - 1] * epsl[i - 1]")} AS e12,
       |    ${lsum(6, 20, "epsl[i - 1] * epsl[i - 1]")} AS e22,
       |    ${lsum(6, 20, "ws[i]")} AS f0,
       |    ${lsum(6, 20, "ws[i - 1] * ws[i]")} AS f1,
       |    ${lsum(6, 20, "epsl[i - 1] * ws[i]")} AS f2
       |  FROM ep),
       |s2r AS (
       |  SELECT *, 1e-8 * ((14.0 + e11) + e22) / 3 AS lam2 FROM s2),
       |s2m AS (
       |  SELECT nk, ws, e1, e2, e12, f0, f1, f2,
       |    (14.0 + lam2) AS g00, (e11 + lam2) AS g11,
       |    (e22 + lam2) AS g22
       |  FROM s2r),
       |fit2 AS MATERIALIZED (
       |  SELECT nk, ws,
       |    ${nums3(0)} / $det3 AS ic,
       |    ${nums3(1)} / $det3 AS ar,
       |    ${nums3(2)} / $det3 AS ma
       |  FROM s2m),
       |rres AS (
       |  SELECT nk, 5 AS i, CAST(0.0 AS DOUBLE) AS r FROM fit2
       |  UNION ALL
       |  SELECT f.nk, rr.i + 1,
       |    f.ws[rr.i + 1] - (f.ic + f.ar * f.ws[rr.i] + f.ma * rr.r)
       |  FROM fit2 f JOIN rres rr ON f.nk = rr.nk WHERE rr.i < 19),
       |r19 AS (SELECT nk, r FROM rres WHERE i = 19),
       |f AS (
       |  SELECT t.nk, 1 AS h,
       |    t.ic + t.ar * t.ws[19] + t.ma * r19.r AS fv, t.ic, t.ar
       |  FROM fit2 t JOIN r19 ON t.nk = r19.nk
       |  UNION ALL
       |  SELECT nk, h + 1, ic + ar * fv, ic, ar FROM f WHERE h < 4)
       |SELECT nk AS n_nationkey, CAST(h AS BIGINT) AS h,
       |  fv AS forecast
       |FROM f""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q501_sarima_sdiff_twin" -> sarimaSdiffTwinOracle,
    "q502_arima_hr_twin" -> arimaHrTwinOracle,


    "q324_kcore_peel" -> kcorePeelOracle,

    "q441_glm_irls_twin" -> glmIrlsTwinOracle,

    "q344_label_prop" -> labelPropOracle,

    // identical grid, IEEE-exact power cases, profile-LL formula and
    // unrounded argmax flag
    "q387_boxcox" ->
      """WITH y0 AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS y FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_quantity > 0),
        |s AS (SELECT sum(ln(y)) AS slny,
        |  CAST(count(*) AS DOUBLE) AS n FROM y0),
        |grid AS (SELECT unnest([-2.0, -1.0, -0.5, 0.0, 0.5, 1.0,
        |  2.0]) AS lambda),
        |tt AS (
        |  SELECT lambda,
        |    CASE WHEN lambda = 0.0 THEN ln(y)
        |      ELSE ((CASE WHEN lambda = 0.5 THEN sqrt(y)
        |        WHEN lambda = 2.0 THEN y * y
        |        WHEN lambda = -1.0 THEN 1.0 / y
        |        WHEN lambda = -0.5 THEN 1.0 / sqrt(y)
        |        WHEN lambda = -2.0 THEN 1.0 / (y * y)
        |        WHEN lambda = 1.0 THEN y
        |        ELSE power(y, lambda) END) - 1) / lambda END AS t
        |  FROM y0 CROSS JOIN grid),
        |p AS (
        |  SELECT lambda, count(*) AS nl, sum(t) AS st,
        |    sum(t * t) AS stt
        |  FROM tt GROUP BY 1),
        |f AS (
        |  SELECT lambda, nl,
        |    -0.5 * n * ln((stt - st * st / n) / n) +
        |      (lambda - 1) * slny AS ll
        |  FROM p CROSS JOIN s)
        |SELECT lambda, CAST(nl AS BIGINT) AS n, round(ll, 6) AS ll,
        |  ll = max(ll) OVER () AS is_best
        |FROM f""".stripMargin,

    // identical per-key midranks and the Acklam Φ⁻¹ replay on the
    // same Blom argument
    "q386_rint" -> {
      val inv = graft.stats.Distributions
        .normSInvSql("(midrank - 0.375) / (CAST(n AS DOUBLE) + 0.25)")
      s"""WITH counts AS (
         |  SELECT l_returnflag AS g,
         |    CAST(l_quantity AS BIGINT) AS qty, count(*) AS c
         |  FROM lineitem GROUP BY 1, 2),
         |mr AS (
         |  SELECT g, qty, CAST(c AS BIGINT) AS c,
         |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n,
         |    CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY qty
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) + 1 + (c - 1) / 2.0 AS midrank
         |  FROM counts)
         |SELECT g, qty, c, n, round(midrank, 6) AS midrank,
         |  round($inv, 6) AS rint
         |FROM mr""".stripMargin
    },

    // identical unpivot, per-feature break indicators, eps clamp,
    // and contribution sum
    "q384_drift_report" -> {
      def binSql(brs: Seq[Double]) = brs
        .map(b => s"(CASE WHEN v > $b THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH li AS (
         |  SELECT CASE WHEN year(l_shipdate) <= 1994 THEN 'early'
         |      ELSE 'late' END AS g,
         |    CAST(l_quantity AS DOUBLE) AS qty,
         |    CAST(round(l_extendedprice) AS DOUBLE) AS usd,
         |    CAST(round(l_discount * 100) AS DOUBLE) AS disc
         |  FROM lineitem),
         |st AS (
         |  SELECT g, 'qty' AS feature, qty AS v FROM li
         |  UNION ALL SELECT g, 'usd', usd FROM li
         |  UNION ALL SELECT g, 'disc', disc FROM li),
         |binned AS (
         |  SELECT feature, g,
         |    CASE feature
         |      WHEN 'qty' THEN ${binSql(Seq(10.0, 20.0, 30.0, 40.0))}
         |      WHEN 'usd' THEN
         |        ${binSql(Seq(20000.0, 40000.0, 60000.0, 80000.0))}
         |      ELSE ${binSql(Seq(2.0, 4.0, 6.0, 8.0))} END AS bin
         |  FROM st WHERE v IS NOT NULL),
         |counts AS (
         |  SELECT feature, bin,
         |    CAST(sum(CASE WHEN g = 'early' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS na,
         |    CAST(sum(CASE WHEN g = 'late' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS nb
         |  FROM binned GROUP BY 1, 2),
         |tot AS (
         |  SELECT feature, CAST(sum(na) AS DOUBLE) AS ta,
         |    CAST(sum(nb) AS DOUBLE) AS tb
         |  FROM counts GROUP BY 1),
         |terms AS (
         |  SELECT c.feature, c.na, c.nb,
         |    greatest(c.na / t.ta, 1.0e-6) AS pa,
         |    greatest(c.nb / t.tb, 1.0e-6) AS pb
         |  FROM counts c JOIN tot t ON t.feature = c.feature)
         |SELECT feature, CAST(sum(na) AS BIGINT) AS n_a,
         |  CAST(sum(nb) AS BIGINT) AS n_b,
         |  round(sum((pa - pb) * ln(pa / pb)), 6) AS psi
         |FROM terms GROUP BY feature""".stripMargin
    },

    // identical rate, daily residual series, and the fold replayed
    // as a per-key recursive CTE with the same gamma/alpha literals
    "q383_adaptive_conformal" ->
      """WITH RECURSIVE li AS (
        |  SELECT l_returnflag AS g, CAST(l_shipdate AS DATE) AS day,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem),
        |rate AS (
        |  SELECT g, CAST(sum(pc) AS DOUBLE) / CAST(sum(qty) AS DOUBLE)
        |    AS rate
        |  FROM li GROUP BY 1),
        |daily AS (
        |  SELECT li.g, day,
        |    CAST(sum(pc) AS DOUBLE) AS y,
        |    CAST(sum(qty) AS DOUBLE) * max(rate) AS yhat
        |  FROM li JOIN rate ON rate.g = li.g
        |  GROUP BY 1, 2),
        |base AS (
        |  SELECT g, abs(y - yhat) AS r,
        |    row_number() OVER (PARTITION BY g ORDER BY day) AS rn,
        |    count(*) OVER (PARTITION BY g) AS n
        |  FROM daily),
        |rec AS (
        |  SELECT g, rn,
        |    CAST(0.0 + 1000.0 *
        |      ((CASE WHEN r > 0.0 THEN 1.0 ELSE 0.0 END) - 0.1)
        |      AS DOUBLE) AS q,
        |    CASE WHEN r > 0.0 THEN 1 ELSE 0 END AS miss
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.g, b.rn,
        |    rec.q + 1000.0 *
        |      ((CASE WHEN b.r > rec.q THEN 1.0 ELSE 0.0 END) - 0.1),
        |    rec.miss + (CASE WHEN b.r > rec.q THEN 1 ELSE 0 END)
        |  FROM base b JOIN rec ON b.g = rec.g AND b.rn = rec.rn + 1),
        |fin AS (
        |  SELECT g, q, miss,
        |    row_number() OVER (PARTITION BY g ORDER BY rn DESC) AS rr
        |  FROM rec),
        |nn AS (SELECT g, CAST(max(n) AS BIGINT) AS n
        |  FROM base GROUP BY 1)
        |SELECT f.g, nn.n, CAST(f.miss AS BIGINT) AS n_miss,
        |  round(CAST(f.miss AS DOUBLE) / nn.n, 6) AS miss_rate,
        |  round(f.q, 6) AS q_final
        |FROM fin f JOIN nn ON nn.g = f.g
        |WHERE f.rr = 1""".stripMargin,

    // identical picks: last/first/last-season values by row number
    "q381_baselines" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS b,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
        |      AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |base AS (
        |  SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY b)
        |      AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM hourly),
        |hs AS (SELECT unnest([1, 2, 3]) AS h),
        |lasts AS (
        |  SELECT event_type, n, v AS lastv FROM base WHERE rn = n),
        |firsts AS (
        |  SELECT event_type, v AS firstv FROM base WHERE rn = 1),
        |sn AS (
        |  SELECT b.event_type, h.h, b.v AS snaive
        |  FROM base b JOIN hs h
        |    ON b.n >= 24 AND b.rn = b.n - 24 + 1 + ((h.h - 1) % 24))
        |SELECT l.event_type, CAST(l.n AS BIGINT) AS n,
        |  CAST(h.h AS BIGINT) AS h,
        |  round(l.lastv, 6) AS naive,
        |  round(sn.snaive, 6) AS snaive,
        |  CASE WHEN l.n >= 2 THEN
        |    round(l.lastv + CAST(h.h AS DOUBLE) *
        |      (l.lastv - f.firstv) / (CAST(l.n AS DOUBLE) - 1), 6)
        |  END AS drift
        |FROM lasts l
        |CROSS JOIN hs h
        |JOIN firsts f ON f.event_type = l.event_type
        |LEFT JOIN sn ON sn.event_type = l.event_type AND sn.h = h.h
        |ORDER BY l.event_type, h""".stripMargin,

    // identical SES recursion with accumulated decay, exact-sum
    // slope, and the same drift-multiplier association order
    "q380_theta" ->
      """WITH RECURSIVE hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS b,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
        |      AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |base AS (
        |  SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY b)
        |      AS rn
        |  FROM hourly),
        |agg AS (
        |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |    sum(v) AS sy, sum(rn * v) AS siy
        |  FROM base GROUP BY 1),
        |r AS (
        |  SELECT event_type, rn, CAST(v AS DOUBLE) AS level,
        |    CAST(1.0 - 0.4 AS DOUBLE) AS w
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.event_type, b.rn,
        |    0.4 * b.v + (1.0 - 0.4) * r.level,
        |    r.w * (1.0 - 0.4)
        |  FROM base b JOIN r
        |    ON b.event_type = r.event_type AND b.rn = r.rn + 1),
        |lastr AS (
        |  SELECT event_type, level, w,
        |    row_number() OVER (PARTITION BY event_type ORDER BY rn
        |      DESC) AS rr
        |  FROM r),
        |f AS (
        |  SELECT a.event_type, a.n, a.sy, a.siy, l.level, l.w,
        |    (a.n * a.siy - (a.n * (a.n + 1) / 2) * a.sy) /
        |    (a.n * (a.n * (a.n + 1) * (2.0 * a.n + 1) / 6) -
        |      (a.n * (a.n + 1) / 2) * (a.n * (a.n + 1) / 2)) AS slope
        |  FROM agg a JOIN lastr l
        |    ON l.event_type = a.event_type AND l.rr = 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST(h AS BIGINT) AS h,
        |  round(level + (CAST(h AS DOUBLE) - 1 + 1.0 / 0.4 - w / 0.4)
        |    * (slope / 2), 6) AS forecast
        |FROM f CROSS JOIN (SELECT unnest([1, 2, 3]) AS h) hs
        |ORDER BY event_type, h""".stripMargin,

    // identical zero-filled calendar, then the fold replayed as a
    // per-key recursive CTE (q307 precedent) with the same alpha
    // literals and first-demand initialization
    "q379_croston" ->
      """WITH RECURSIVE dem AS (
        |  SELECT c.c_nationkey AS k, CAST(o_orderdate AS DATE) AS day,
        |    CAST(count(*) AS DOUBLE) AS cnt
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  WHERE o.o_orderpriority = '1-URGENT'
        |  GROUP BY 1, 2),
        |bounds AS (
        |  SELECT CAST(min(o_orderdate) AS DATE) AS d0,
        |    CAST(max(o_orderdate) AS DATE) AS d1
        |  FROM orders),
        |cal AS (
        |  SELECT n_nationkey AS k,
        |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
        |      AS DATE) AS day
        |  FROM nation CROSS JOIN bounds),
        |series AS (
        |  SELECT cal.k, cal.day, coalesce(dem.cnt, 0.0) AS v
        |  FROM cal LEFT JOIN dem
        |    ON dem.k = cal.k AND dem.day = cal.day),
        |base AS (
        |  SELECT k, v,
        |    row_number() OVER (PARTITION BY k ORDER BY day) AS rn,
        |    count(*) OVER (PARTITION BY k) AS np
        |  FROM series),
        |r AS (
        |  SELECT k, rn,
        |    CASE WHEN v > 0 THEN 1 ELSE 0 END AS seen,
        |    CAST(CASE WHEN v > 0 THEN v ELSE 0.0 END AS DOUBLE) AS z,
        |    CAST(CASE WHEN v > 0 THEN 1.0 ELSE 0.0 END AS DOUBLE)
        |      AS p,
        |    CAST(CASE WHEN v > 0 THEN 0.0 ELSE 1.0 END AS DOUBLE)
        |      AS q,
        |    CASE WHEN v > 0 THEN 1 ELSE 0 END AS d
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.k, b.rn,
        |    CASE WHEN b.v > 0 THEN 1 ELSE r.seen END,
        |    CASE WHEN b.v > 0 AND r.seen = 0 THEN b.v
        |         WHEN b.v > 0 THEN 0.3 * b.v + (1.0 - 0.3) * r.z
        |         ELSE r.z END,
        |    CASE WHEN b.v > 0 AND r.seen = 0 THEN r.q + 1.0
        |         WHEN b.v > 0
        |           THEN 0.3 * (r.q + 1.0) + (1.0 - 0.3) * r.p
        |         ELSE r.p END,
        |    CASE WHEN b.v > 0 THEN 0.0 ELSE r.q + 1.0 END,
        |    CASE WHEN b.v > 0 THEN r.d + 1 ELSE r.d END
        |  FROM base b JOIN r ON b.k = r.k AND b.rn = r.rn + 1),
        |lastr AS (
        |  SELECT k, seen, z, p, d,
        |    row_number() OVER (PARTITION BY k ORDER BY rn DESC) AS rr
        |  FROM r),
        |np AS (SELECT k, CAST(max(np) AS BIGINT) AS n_periods
        |  FROM base GROUP BY 1)
        |SELECT f.k, np.n_periods, CAST(f.d AS BIGINT) AS n_demands,
        |  round(f.z, 6) AS size_ewma,
        |  round(f.p, 6) AS interval_ewma,
        |  CASE WHEN f.seen = 1 AND f.p > 0
        |    THEN round(f.z / f.p, 6) END AS croston,
        |  CASE WHEN f.seen = 1 AND f.p > 0
        |    THEN round(0.85 * (f.z / f.p), 6) END AS sba
        |FROM lastr f JOIN np ON np.k = f.k
        |WHERE f.rr = 1""".stripMargin,

    // identical midrank construction (combined + within), exact
    // doubled-rank sums, variance expansion and closed forms
    "q377_brunner_munzel" -> {
      val phi = graft.stats.Distributions.normalCdfSql("abs(w)")
      s"""WITH pooled AS (
         |  SELECT event_type AS g,
         |    CAST(round(value * 100) AS BIGINT) AS v
         |  FROM events
         |  WHERE event_type IN ('click', 'view')
         |    AND value IS NOT NULL),
         |rk AS (
         |  SELECT g, v,
         |    CAST(rank() OVER (ORDER BY v) AS DOUBLE) +
         |      (CAST(count(*) OVER (PARTITION BY v) AS DOUBLE) - 1.0)
         |        / 2.0 AS rall,
         |    CAST(rank() OVER (PARTITION BY g ORDER BY v) AS DOUBLE) +
         |      (CAST(count(*) OVER (PARTITION BY g, v) AS DOUBLE)
         |        - 1.0) / 2.0 AS rwin
         |  FROM pooled),
         |st AS (
         |  SELECT g, count(*) AS n,
         |    CAST(sum(CAST(rall * 2 AS BIGINT)) AS BIGINT) AS sr2,
         |    CAST(sum(CAST((rall - rwin) * 2 AS BIGINT)) AS BIGINT)
         |      AS sd2,
         |    sum(CAST(CAST((rall - rwin) * 2 AS BIGINT) AS HUGEINT) *
         |      CAST((rall - rwin) * 2 AS BIGINT)) AS sq4
         |  FROM rk GROUP BY 1),
         |f AS (
         |  SELECT g, n, CAST(sr2 AS DOUBLE) / (2.0 * n) AS m,
         |    CAST(sr2 AS DOUBLE) / (2.0 * n) -
         |      (CAST(n AS DOUBLE) + 1) / 2 AS cc,
         |    sd2, sq4
         |  FROM st),
         |f2 AS (
         |  SELECT g, n, m,
         |    (CAST(sq4 AS DOUBLE) / 4 -
         |      2.0 * cc * (CAST(sd2 AS DOUBLE) / 2) +
         |      n * cc * cc) / (n - 1) AS vv
         |  FROM f),
         |w0 AS (
         |  SELECT a.n AS n1, a.m AS m1, a.vv AS v1,
         |    b.n AS n2, b.m AS m2, b.vv AS v2
         |  FROM (SELECT * FROM f2 WHERE g = 'click') a,
         |       (SELECT * FROM f2 WHERE g = 'view') b),
         |z AS (
         |  SELECT n1, n2,
         |    (m2 - (CAST(n2 AS DOUBLE) + 1) / 2) / n1 AS phat,
         |    n1 * v1 + n2 * v2 AS vt,
         |    CAST(n1 AS DOUBLE) * n2 * (m2 - m1) / (n1 + n2) /
         |      sqrt(n1 * v1 + n2 * v2) AS w,
         |    (n1 * v1 + n2 * v2) * (n1 * v1 + n2 * v2) /
         |      ((n1 * v1) * (n1 * v1) / (n1 - 1) +
         |       (n2 * v2) * (n2 * v2) / (n2 - 1)) AS dfree
         |  FROM w0)
         |SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
         |  round(phat, 6) AS p_hat,
         |  CASE WHEN vt > 0 THEN round(w, 6) END AS w_stat,
         |  CASE WHEN vt > 0 THEN round(dfree, 6) END AS df,
         |  CASE WHEN vt > 0 THEN
         |    round(2.0 * (1.0 - $phi), 6) END AS p_norm
         |FROM z""".stripMargin
    },

    // identical per-group exact sums, ANOVA decomposition, k0 and
    // ICC closed form
    "q375_icc" ->
      """WITH per AS (
        |  SELECT l_orderkey,
        |    count(*) AS ni,
        |    sum(CAST(round(l_extendedprice) AS BIGINT)) AS si,
        |    sum(CAST(round(l_extendedprice) AS BIGINT) *
        |        CAST(round(l_extendedprice) AS BIGINT)) AS qi
        |  FROM lineitem GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS g,
        |    CAST(sum(ni) AS DOUBLE) AS n,
        |    CAST(sum(si) AS DOUBLE) AS s,
        |    CAST(sum(qi) AS DOUBLE) AS q,
        |    CAST(sum((si * si) // ni) AS DOUBLE) +
        |      sum(CAST((si * si) % ni AS DOUBLE) / ni) AS sg,
        |    CAST(sum(ni * ni) AS DOUBLE) AS nn2
        |  FROM per),
        |f AS (
        |  SELECT CAST(g AS BIGINT) AS n_groups,
        |    CAST(n AS BIGINT) AS n_obs,
        |    (sg - s * s / n) / (g - 1) AS msb,
        |    (q - sg) / (n - g) AS msw,
        |    (n - nn2 / n) / (g - 1) AS k0
        |  FROM tot)
        |SELECT n_groups, n_obs, round(msb, 6) AS msb,
        |  round(msw, 6) AS msw, round(k0, 6) AS k0,
        |  round((msb - msw) / (msb + (k0 - 1) * msw), 6) AS icc
        |FROM f""".stripMargin,

    // identical pairing, exact diff sums, Acklam z literal and
    // within-limits count
    "q376_bland_altman" -> {
      val z = graft.stats.Distributions.normSInv(0.975)
      s"""WITH lines AS (
         |  SELECT l_orderkey AS ok,
         |    sum(CAST(round(l_extendedprice) AS BIGINT)) AS line_usd
         |  FROM lineitem GROUP BY 1),
         |paired AS (
         |  SELECT CAST(round(o_totalprice) AS BIGINT) -
         |    CAST(line_usd AS BIGINT) AS d
         |  FROM orders JOIN lines ON lines.ok = o_orderkey),
         |s AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(d) AS DOUBLE) AS sd1,
         |    CAST(sum(d * d) AS DOUBLE) AS sd2
         |  FROM paired),
         |k AS (
         |  SELECT n, sd1 / n AS mean_diff,
         |    sqrt((sd2 - sd1 * sd1 / n) / (n - 1)) AS sd_diff
         |  FROM s),
         |k2 AS (
         |  SELECT n, mean_diff, sd_diff,
         |    mean_diff - $z * sd_diff AS loa_lo,
         |    mean_diff + $z * sd_diff AS loa_hi
         |  FROM k),
         |w AS (
         |  SELECT CAST(sum(CASE WHEN d >= loa_lo AND d <= loa_hi
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_within,
         |    max(n) AS n2
         |  FROM paired CROSS JOIN k2)
         |SELECT n, round(mean_diff, 6) AS mean_diff,
         |  round(sd_diff, 6) AS sd_diff,
         |  round(loa_lo, 6) AS loa_lo, round(loa_hi, 6) AS loa_hi,
         |  n_within,
         |  round(CAST(n_within AS DOUBLE) / n, 6) AS pct_within
         |FROM k2 CROSS JOIN w""".stripMargin
    },

    // identical rank window, winsor picks, exact sums, closed form
    // and Φ replay
    "q374_yuen" -> {
      val phi = graft.stats.Distributions.normalCdfSql("abs(t)")
      s"""WITH base AS (
         |  SELECT l_returnflag AS g,
         |    CAST(round(l_extendedprice) AS BIGINT) AS x
         |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
         |r AS (
         |  SELECT g, x,
         |    row_number() OVER (PARTITION BY g ORDER BY x) AS rk
         |  FROM base),
         |ns AS (
         |  SELECT g, count(*) AS n,
         |    CAST(floor(0.2 * count(*)) AS BIGINT) AS k
         |  FROM base GROUP BY 1),
         |j AS (SELECT r.g, x, rk, n, k FROM r JOIN ns ON ns.g = r.g),
         |lo AS (SELECT g, x AS xlo FROM j WHERE rk = k + 1),
         |hi AS (SELECT g, x AS xhi FROM j WHERE rk = n - k),
         |st AS (
         |  SELECT j.g, max(n) AS n, max(k) AS k,
         |    sum(CASE WHEN rk > k AND rk <= n - k THEN x END) AS stx,
         |    sum(CASE WHEN rk <= k THEN xlo
         |      WHEN rk > n - k THEN xhi ELSE x END) AS sw,
         |    sum((CASE WHEN rk <= k THEN xlo
         |        WHEN rk > n - k THEN xhi ELSE x END) *
         |      (CASE WHEN rk <= k THEN xlo
         |        WHEN rk > n - k THEN xhi ELSE x END)) AS qw
         |  FROM j JOIN lo ON lo.g = j.g JOIN hi ON hi.g = j.g
         |  GROUP BY 1),
         |f AS (
         |  SELECT g, n, k, n - 2 * k AS h,
         |    CAST(stx AS DOUBLE) / (n - 2 * k) AS mt,
         |    (CAST(qw AS DOUBLE)
         |      - CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / n)
         |      / (n - 1) AS sw2
         |  FROM st),
         |f2 AS (
         |  SELECT g, n, h, mt,
         |    sw2 * (n - 1) / (CAST(h AS DOUBLE) * (h - 1)) AS d
         |  FROM f),
         |w AS (
         |  SELECT a.n AS na, a.h AS ha, a.mt AS ma, a.d AS da,
         |    b.n AS nb, b.h AS hb, b.mt AS mb, b.d AS db
         |  FROM (SELECT * FROM f2 WHERE g = 'A') a,
         |       (SELECT * FROM f2 WHERE g = 'R') b),
         |z AS (
         |  SELECT na, nb, ha, hb, ma, mb,
         |    (ma - mb) / sqrt(da + db) AS t,
         |    (da + db) * (da + db) /
         |      (da * da / (ha - 1) + db * db / (hb - 1)) AS dfree
         |  FROM w)
         |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
         |  CAST(ha AS BIGINT) AS h_a, CAST(hb AS BIGINT) AS h_b,
         |  round(ma, 6) AS tmean_a, round(mb, 6) AS tmean_b,
         |  round(t, 6) AS t_stat, round(dfree, 6) AS df,
         |  round(2.0 * (1.0 - $phi), 6) AS p_norm
         |FROM z""".stripMargin
    },

    // identical cells, cumulative windows, Welch z and the Acklam
    // quantile replay with K from the same look table
    "q373_sequential" -> {
      val zq = graft.stats.Distributions
        .normSInvSql("1.0 - 0.05 / (2.0 * kk)")
      s"""WITH ev AS (
         |  SELECT event_type,
         |    CAST(date_trunc('month', ts) AS DATE) AS mo,
         |    CAST(round(value * 100) AS BIGINT) AS vc
         |  FROM events
         |  WHERE event_type IN ('click', 'view')
         |    AND value IS NOT NULL),
         |cells AS (
         |  SELECT mo AS look,
         |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS ka,
         |    sum(CASE WHEN event_type = 'click' THEN vc END) AS sa,
         |    sum(CASE WHEN event_type = 'click' THEN vc * vc END)
         |      AS qa,
         |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         |      AS kb,
         |    sum(CASE WHEN event_type = 'view' THEN vc END) AS sb,
         |    sum(CASE WHEN event_type = 'view' THEN vc * vc END)
         |      AS qb
         |  FROM ev GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS DOUBLE) AS kk FROM cells),
         |cum AS (
         |  SELECT look,
         |    CAST(sum(ka) OVER w AS BIGINT) AS na,
         |    CAST(sum(sa) OVER w AS DOUBLE) AS csa,
         |    CAST(sum(qa) OVER w AS DOUBLE) AS cqa,
         |    CAST(sum(kb) OVER w AS BIGINT) AS nb,
         |    CAST(sum(sb) OVER w AS DOUBLE) AS csb,
         |    CAST(sum(qb) OVER w AS DOUBLE) AS cqb
         |  FROM cells
         |  WINDOW w AS (ORDER BY look
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |f AS (
         |  SELECT look, na, nb,
         |    (csa / na - csb / nb) / sqrt(
         |      ((cqa - csa * csa / na) / (na - 1)) / na +
         |      ((cqb - csb * csb / nb) / (nb - 1)) / nb) AS z,
         |    $zq AS boundary
         |  FROM cum CROSS JOIN tot)
         |SELECT look, na, nb, round(z, 6) AS z,
         |  round(boundary, 6) AS boundary,
         |  abs(z) >= boundary AS crossed
         |FROM f""".stripMargin
    },

    // identical exact cells, support pruning and ATT share weights
    "q364_cem" ->
      """WITH base AS (
        |  SELECT o_orderstatus AS status,
        |    CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    o_orderpriority IN ('1-URGENT', '2-HIGH') AS treated,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS oc
        |  FROM orders),
        |per AS (
        |  SELECT status, yr,
        |    CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_treat,
        |    CAST(sum(CASE WHEN NOT treated THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_ctrl,
        |    CAST(sum(CASE WHEN treated THEN oc END) AS DOUBLE)
        |      AS sy_t,
        |    CAST(sum(CASE WHEN NOT treated THEN oc END) AS DOUBLE)
        |      AS sy_c
        |  FROM base GROUP BY 1, 2),
        |m AS (
        |  SELECT status, yr, n_treat, n_ctrl, sy_t, sy_c
        |  FROM per WHERE n_treat > 0 AND n_ctrl > 0),
        |mt AS (SELECT CAST(sum(n_treat) AS DOUBLE) AS mtr FROM m)
        |SELECT status, yr, n_treat, n_ctrl,
        |  round(sy_t / n_treat, 6) AS mean_treat,
        |  round(sy_c / n_ctrl, 6) AS mean_ctrl,
        |  round(CAST(n_treat AS DOUBLE) / mtr *
        |    (sy_t / n_treat - sy_c / n_ctrl), 9) AS att_contrib
        |FROM m CROSS JOIN mt""".stripMargin,

    // identical long sufficient sums (dollars), pooled theta/rho^2
    // and adjusted-mean association order
    "q365_cuped" ->
      """WITH li AS (
        |  SELECT CAST(l_orderkey % 2 AS BIGINT) AS arm,
        |    CAST(round(l_extendedprice) AS BIGINT) AS usd,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem),
        |per AS (
        |  SELECT arm, count(*) AS n, sum(usd) AS sy, sum(qty) AS sx,
        |    sum(qty * usd) AS sxy, sum(qty * qty) AS sxx,
        |    sum(usd * usd) AS syy
        |  FROM li GROUP BY 1),
        |pool AS (
        |  SELECT CAST(sum(n) AS DOUBLE) AS n,
        |    CAST(sum(sy) AS DOUBLE) AS sy,
        |    CAST(sum(sx) AS DOUBLE) AS sx,
        |    CAST(sum(sxy) AS DOUBLE) AS sxy,
        |    CAST(sum(sxx) AS DOUBLE) AS sxx,
        |    CAST(sum(syy) AS DOUBLE) AS syy
        |  FROM per),
        |k AS (
        |  SELECT sx / n AS xbar,
        |    (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta,
        |    ((sxy - sx * sy / n) * (sxy - sx * sy / n)) /
        |      ((sxx - sx * sx / n) * (syy - sy * sy / n)) AS rho2
        |  FROM pool)
        |SELECT arm, CAST(n AS BIGINT) AS n,
        |  round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS y_mean,
        |  round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) - theta *
        |    (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - xbar), 6)
        |    AS y_cuped_mean,
        |  round(theta, 6) AS theta,
        |  round(rho2, 6) AS var_reduction
        |FROM per CROSS JOIN k""".stripMargin,

    // identical sufficient sums, Welch/pooled effect formulas, the
    // same A&S Φ replay and Acklam z-quantile literals
    "q363_power_analysis" -> {
      val zc = graft.stats.Distributions.normSInv(0.975)
      val zp = graft.stats.Distributions.normSInv(0.8)
      val phiP = graft.stats.Distributions.normalCdfSql(s"dz - $zc")
      val phiM = graft.stats.Distributions.normalCdfSql(s"-dz - $zc")
      s"""WITH g AS (
         |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         |    sum(v) AS s1, sum(v * v) AS s2
         |  FROM (SELECT event_type,
         |      CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS v
         |    FROM events WHERE event_type IN ('click', 'view')
         |      AND value IS NOT NULL)
         |  GROUP BY 1),
         |gm AS (SELECT event_type, n, s1 / n AS m,
         |    (s2 - s1 * s1 / n) / (n - 1) AS s2v FROM g),
         |w AS (SELECT a.n AS na, a.m AS ma, a.s2v AS va,
         |    b.n AS nb, b.m AS mb, b.s2v AS vb
         |  FROM (SELECT * FROM gm WHERE event_type = 'click') a,
         |       (SELECT * FROM gm WHERE event_type = 'view') b),
         |f AS (SELECT na, nb, ma, mb,
         |    abs(ma - mb) / sqrt(va / na + vb / nb) AS dz,
         |    abs(ma - mb) /
         |      sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
         |      AS d
         |  FROM w)
         |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
         |  round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
         |  round(d, 6) AS effect_d, round(dz, 6) AS z_effect,
         |  round(($phiP) + ($phiM), 6) AS power,
         |  CASE WHEN d >= 1e-6 THEN
         |    CAST(ceil(2.0 * (($zc + $zp) / d) * (($zc + $zp) / d))
         |      AS BIGINT) END AS n_required
         |FROM f""".stripMargin
    },

    // identical split, rate ratio, residual formula, integer rank
    // arithmetic and coverage count
    "q361_conformal" ->
      """WITH li AS (
        |  SELECT l_returnflag AS k,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    (l_orderkey % 2 = 0) AS cal
        |  FROM lineitem),
        |rate AS (
        |  SELECT k, CAST(sum(pc) AS DOUBLE) / CAST(sum(qty) AS DOUBLE)
        |    AS rate
        |  FROM li WHERE cal GROUP BY 1),
        |scored AS (
        |  SELECT li.k, cal,
        |    abs(CAST(pc AS DOUBLE) - CAST(qty AS DOUBLE) * rate) AS r
        |  FROM li JOIN rate ON rate.k = li.k),
        |ncal AS (
        |  SELECT k, count(*) AS n_cal,
        |    CAST(floor(((count(*) + 1) * 9 + 9) / 10.0) AS BIGINT)
        |      AS rnk
        |  FROM scored WHERE cal GROUP BY 1),
        |ranked AS (
        |  SELECT k, r,
        |    row_number() OVER (PARTITION BY k ORDER BY r) AS rk
        |  FROM scored WHERE cal),
        |q AS (
        |  SELECT ncal.k, n_cal, rnk, r AS qhat
        |  FROM ranked JOIN ncal ON ncal.k = ranked.k
        |    AND ranked.rk = ncal.rnk),
        |cov AS (
        |  SELECT q.k, count(s.r) AS n_test,
        |    CAST(sum(CASE WHEN s.r <= qhat THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_covered
        |  FROM q LEFT JOIN scored s ON s.k = q.k AND NOT s.cal
        |  GROUP BY 1)
        |SELECT q.k, CAST(n_cal AS BIGINT) AS n_cal,
        |  rnk AS rank, CAST(n_test AS BIGINT) AS n_test, n_covered,
        |  round(qhat, 6) AS qhat,
        |  CASE WHEN n_test > 0 THEN
        |    round(CAST(n_covered AS DOUBLE) / n_test, 6) END
        |    AS coverage
        |FROM q JOIN cov ON cov.k = q.k""".stripMargin,

    // identical windows: running max end (rows to 1 preceding),
    // running break count, then the island aggregate
    "q372_merge_intervals" ->
      """WITH iv AS (
        |  SELECT l_suppkey AS k, CAST(l_shipdate AS DATE) AS s,
        |    CAST(l_shipdate AS DATE) + 6 AS e
        |  FROM lineitem
        |  WHERE l_shipdate IS NOT NULL),
        |x AS (
        |  SELECT k, s, e,
        |    max(e) OVER (PARTITION BY k ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS pmax
        |  FROM iv),
        |y AS (
        |  SELECT k, s, e,
        |    sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY k ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS island
        |  FROM x)
        |SELECT k AS l_suppkey, CAST(island AS BIGINT) AS island,
        |  min(s) AS start, max(e) AS "end",
        |  CAST(count(*) AS BIGINT) AS n_intervals
        |FROM y GROUP BY 1, 2""".stripMargin,

    // identical normalization, degree join, exact sums and closed form
    "q371_assortativity" ->
      """WITH e0 AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey
        |   AND x.l_partkey < y.l_partkey),
        |deg AS (
        |  SELECT id, count(*) AS d FROM (
        |    SELECT a AS id FROM e0 UNION ALL SELECT b AS id FROM e0)
        |  GROUP BY 1),
        |s AS (
        |  SELECT count(*) AS m_edges,
        |    CAST(sum(dj.d * dk.d) AS BIGINT) AS sjk,
        |    CAST(sum(dj.d + dk.d) AS BIGINT) AS ssum,
        |    CAST(sum(dj.d * dj.d + dk.d * dk.d) AS BIGINT) AS ssq
        |  FROM e0 JOIN deg dj ON dj.id = e0.a
        |    JOIN deg dk ON dk.id = e0.b)
        |SELECT CAST(m_edges AS BIGINT) AS m_edges, sjk, ssum, ssq,
        |  CASE WHEN CAST(ssq AS DOUBLE) / (2.0 * m_edges)
        |      - (CAST(ssum AS DOUBLE) / (2.0 * m_edges))
        |        * (CAST(ssum AS DOUBLE) / (2.0 * m_edges)) <> 0.0
        |    THEN round(
        |      (CAST(sjk AS DOUBLE) / m_edges
        |        - (CAST(ssum AS DOUBLE) / (2.0 * m_edges))
        |          * (CAST(ssum AS DOUBLE) / (2.0 * m_edges)))
        |      / (CAST(ssq AS DOUBLE) / (2.0 * m_edges)
        |        - (CAST(ssum AS DOUBLE) / (2.0 * m_edges))
        |          * (CAST(ssum AS DOUBLE) / (2.0 * m_edges))), 6)
        |  END AS assortativity
        |FROM s""".stripMargin,

    // identical edge normalization, degree mass, internal-edge count
    // and the same dq association order
    "q360_modularity" ->
      """WITH e0 AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey
        |   AND x.l_partkey < y.l_partkey),
        |m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM e0),
        |deg AS (
        |  SELECT id, count(*) AS d FROM (
        |    SELECT a AS id FROM e0 UNION ALL SELECT b AS id FROM e0)
        |  GROUP BY 1),
        |pm AS (SELECT p_partkey AS id, p_brand AS comm FROM part),
        |nodes AS (
        |  SELECT comm, count(*) AS n_nodes,
        |    CAST(sum(coalesce(d, 0)) AS BIGINT) AS degree_sum
        |  FROM pm LEFT JOIN deg USING (id) GROUP BY 1),
        |inte AS (
        |  SELECT pa.comm, count(*) AS internal_edges
        |  FROM e0
        |  JOIN pm pa ON pa.id = e0.a
        |  JOIN pm pb ON pb.id = e0.b
        |  WHERE pa.comm = pb.comm GROUP BY 1)
        |SELECT comm, CAST(n_nodes AS BIGINT) AS n_nodes,
        |  degree_sum,
        |  CAST(coalesce(internal_edges, 0) AS BIGINT)
        |    AS internal_edges,
        |  round(CAST(coalesce(internal_edges, 0) AS DOUBLE) / m
        |    - (CAST(degree_sum AS DOUBLE) / (2.0 * m))
        |      * (CAST(degree_sum AS DOUBLE) / (2.0 * m)), 6) AS dq
        |FROM nodes LEFT JOIN inte USING (comm) CROSS JOIN m""".stripMargin,

    "q260_trimmed_mean" ->
      """WITH c AS (
        |  SELECT CAST(round(l_extendedprice) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |  GROUP BY 1),
        |w AS (SELECT v, c,
        |    CAST(coalesce(sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS below
        |  FROM c),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
        |kk AS (SELECT n, CAST(floor(CAST(0.05 AS DOUBLE) * n)
        |    AS BIGINT) AS k FROM t),
        |kept AS (SELECT v,
        |    greatest(least(below + c, n - k) - greatest(below, k), 0)
        |      AS kc
        |  FROM w, kk)
        |SELECT n, k AS k_each,
        |  round(CAST(CAST(sum(kc * v) AS BIGINT) AS DOUBLE) /
        |    CAST(CAST(sum(kc) AS BIGINT) AS DOUBLE), 6) AS trimmed_mean
        |FROM kept, kk GROUP BY n, k""".stripMargin,

    "q255_multi_ols" -> {
      val phi = graft.stats.Distributions.normalCdfSql("abs(t)")
      s"""WITH raw AS (
         |  SELECT CAST(l_quantity AS BIGINT) AS x1,
         |    CAST(round(l_discount * 100) AS BIGINT) AS x2,
         |    CAST(round(l_extendedprice) AS BIGINT) AS y
         |  FROM lineitem
         |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
         |    AND l_extendedprice IS NOT NULL),
         |s AS (SELECT
         |    CAST(CAST(count(*) AS BIGINT) AS DOUBLE) AS n,
         |    CAST(CAST(sum(x1) AS BIGINT) AS DOUBLE) AS s1,
         |    CAST(CAST(sum(x2) AS BIGINT) AS DOUBLE) AS s2,
         |    CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy,
         |    CAST(CAST(sum(x1 * x1) AS BIGINT) AS DOUBLE) AS s11,
         |    CAST(CAST(sum(x2 * x2) AS BIGINT) AS DOUBLE) AS s22,
         |    CAST(CAST(sum(x1 * x2) AS BIGINT) AS DOUBLE) AS s12,
         |    CAST(CAST(sum(x1 * y) AS BIGINT) AS DOUBLE) AS s1y,
         |    CAST(CAST(sum(x2 * y) AS BIGINT) AS DOUBLE) AS s2y,
         |    CAST(CAST(sum(y * y) AS BIGINT) AS DOUBLE) AS syy
         |  FROM raw),
         |c AS (SELECT n, s1, s2, sy,
         |    s11 - s1 * s1 / n AS c11, s22 - s2 * s2 / n AS c22,
         |    s12 - s1 * s2 / n AS c12, s1y - s1 * sy / n AS c1y,
         |    s2y - s2 * sy / n AS c2y, syy - sy * sy / n AS cyy
         |  FROM s),
         |d AS (SELECT *, c11 * c22 - c12 * c12 AS det FROM c),
         |bb AS (SELECT *, (c1y * c22 - c2y * c12) / det AS b1,
         |    (c2y * c11 - c1y * c12) / det AS b2 FROM d),
         |b0t AS (SELECT *, (sy - b1 * s1 - b2 * s2) / n AS b0,
         |    cyy - b1 * c1y - b2 * c2y AS sse FROM bb),
         |v AS (SELECT *, sse / (n - 3) AS sig2 FROM b0t),
         |sev AS (SELECT *, sqrt(sig2 * c22 / det) AS se1,
         |    sqrt(sig2 * c11 / det) AS se2,
         |    sqrt(sig2 * (1.0 / n +
         |      (s1 / n * (s1 / n) * c22
         |        - 2.0 * (s1 / n) * (s2 / n) * c12
         |        + s2 / n * (s2 / n) * c11) / det)) AS se0
         |  FROM v),
         |terms AS (
         |  SELECT 'intercept' AS term, b0 AS coef, se0 AS sev FROM sev
         |  UNION ALL SELECT 'x1', b1, se1 FROM sev
         |  UNION ALL SELECT 'x2', b2, se2 FROM sev),
         |tt AS (SELECT term, coef, sev, coef / sev AS t FROM terms)
         |SELECT term, round(coef, 6) AS coef, round(sev, 6) AS std_err,
         |  round(t, 6) AS t_stat,
         |  round(2.0 * (1.0 - $phi), 6) AS p_value
         |FROM tt""".stripMargin
    },

    // the q255 Cramer fit replayed, then per-row φ_i = b_i(x_i−x̄_i)
    // with identical association order
    "q453_linear_shap" ->
      """WITH raw AS (
        |  SELECT l_orderkey,
        |    CAST(l_quantity AS BIGINT) AS x1,
        |    CAST(round(l_discount * 100) AS BIGINT) AS x2,
        |    CAST(round(l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        |    AND l_discount IS NOT NULL),
        |s AS (SELECT
        |    CAST(CAST(count(*) AS BIGINT) AS DOUBLE) AS n,
        |    CAST(CAST(sum(x1) AS BIGINT) AS DOUBLE) AS s1,
        |    CAST(CAST(sum(x2) AS BIGINT) AS DOUBLE) AS s2,
        |    CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(x1 * x1) AS BIGINT) AS DOUBLE) AS s11,
        |    CAST(CAST(sum(x2 * x2) AS BIGINT) AS DOUBLE) AS s22,
        |    CAST(CAST(sum(x1 * x2) AS BIGINT) AS DOUBLE) AS s12,
        |    CAST(CAST(sum(x1 * y) AS BIGINT) AS DOUBLE) AS s1y,
        |    CAST(CAST(sum(x2 * y) AS BIGINT) AS DOUBLE) AS s2y
        |  FROM raw),
        |c AS (SELECT n, s1, s2, sy,
        |    s11 - s1 * s1 / n AS c11, s22 - s2 * s2 / n AS c22,
        |    s12 - s1 * s2 / n AS c12, s1y - s1 * sy / n AS c1y,
        |    s2y - s2 * sy / n AS c2y
        |  FROM s),
        |d AS (SELECT *, c11 * c22 - c12 * c12 AS det FROM c),
        |fit AS (SELECT
        |    s1 / n AS xb1, s2 / n AS xb2, sy / n AS base,
        |    (c1y * c22 - c2y * c12) / det AS b1,
        |    (c2y * c11 - c1y * c12) / det AS b2
        |  FROM d)
        |SELECT r.l_orderkey, r.x1, r.x2,
        |  round(b1 * (r.x1 - xb1), 6) AS phi1,
        |  round(b2 * (r.x2 - xb2), 6) AS phi2,
        |  round(base, 6) AS baseline,
        |  round(base + b1 * (r.x1 - xb1) + b2 * (r.x2 - xb2), 6)
        |    AS prediction
        |FROM raw r CROSS JOIN fit""".stripMargin,

    "q251_kfold_cv" ->
      """WITH r AS (
        |  SELECT CAST(floor(list_sum(list_transform(range(1, 13),
        |      i -> (strpos('0123456789abcdef', substr(md5(
        |          CAST(l_orderkey AS VARCHAR) || '-' ||
        |          CAST(l_linenumber AS VARCHAR) || 'cv'), i, 1)) - 1)
        |        * power(16, 12 - i))) / 281474976710656.0 * 5)
        |      AS INT) AS fold,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |f AS (SELECT fold,
        |    CAST(CAST(count(*) AS BIGINT) AS DOUBLE) AS n,
        |    CAST(CAST(sum(x) AS BIGINT) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(x * x) AS BIGINT) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(y * y) AS BIGINT) AS DOUBLE) AS syy,
        |    CAST(CAST(sum(x * y) AS BIGINT) AS DOUBLE) AS sxy
        |  FROM r GROUP BY 1),
        |tt AS (SELECT sum(n) AS tn0, sum(sx) AS tsx0, sum(sy) AS tsy0,
        |    sum(sxx) AS tsxx0, sum(syy) AS tsyy0, sum(sxy) AS tsxy0
        |  FROM f),
        |c AS (SELECT f.*, tt.tn0 - f.n AS tn, tt.tsx0 - f.sx AS tsx,
        |    tt.tsy0 - f.sy AS tsy, tt.tsxx0 - f.sxx AS tsxx,
        |    tt.tsyy0 - f.syy AS tsyy, tt.tsxy0 - f.sxy AS tsxy
        |  FROM f, tt),
        |ab AS (SELECT *, (tn * tsxy - tsx * tsy) /
        |    (tn * tsxx - tsx * tsx) AS slope FROM c),
        |ab2 AS (SELECT *, (tsy - slope * tsx) / tn AS intercept FROM ab),
        |e AS (SELECT *,
        |    syy - 2.0 * intercept * sy - 2.0 * slope * sxy
        |      + 2.0 * intercept * slope * sx + intercept * intercept * n
        |      + slope * slope * sxx AS sse
        |  FROM ab2)
        |SELECT fold, CAST(tn AS BIGINT) AS n_train,
        |  CAST(n AS BIGINT) AS n_test,
        |  round(slope, 6) AS slope, round(intercept, 6) AS intercept,
        |  round(sqrt(sse / n), 6) AS test_rmse,
        |  round(1.0 - sse / (syy - sy * sy / n), 6) AS test_r2
        |FROM e""".stripMargin,

    "q252_ridge_cv" ->
      """WITH r AS (
        |  SELECT CAST(floor(list_sum(list_transform(range(1, 13),
        |      i -> (strpos('0123456789abcdef', substr(md5(
        |          CAST(l_orderkey AS VARCHAR) || '-' ||
        |          CAST(l_linenumber AS VARCHAR) || 'cv'), i, 1)) - 1)
        |        * power(16, 12 - i))) / 281474976710656.0 * 5)
        |      AS INT) AS fold,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |f AS (SELECT fold,
        |    CAST(CAST(count(*) AS BIGINT) AS DOUBLE) AS n,
        |    CAST(CAST(sum(x) AS BIGINT) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(x * x) AS BIGINT) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(y * y) AS BIGINT) AS DOUBLE) AS syy,
        |    CAST(CAST(sum(x * y) AS BIGINT) AS DOUBLE) AS sxy
        |  FROM r GROUP BY 1),
        |tt AS (SELECT sum(n) AS tn0, sum(sx) AS tsx0, sum(sy) AS tsy0,
        |    sum(sxx) AS tsxx0, sum(syy) AS tsyy0, sum(sxy) AS tsxy0
        |  FROM f),
        |c AS (SELECT f.*, tt.tn0 - f.n AS tn, tt.tsx0 - f.sx AS tsx,
        |    tt.tsy0 - f.sy AS tsy, tt.tsxx0 - f.sxx AS tsxx,
        |    tt.tsyy0 - f.syy AS tsyy, tt.tsxy0 - f.sxy AS tsxy
        |  FROM f, tt),
        |g AS (SELECT c.*, l.lambda FROM c, (SELECT CAST(x AS DOUBLE)
        |    AS lambda FROM (VALUES (0.0), (100000.0), (1000000.0),
        |      (10000000.0), (100000000.0)) v(x)) l),
        |ab AS (SELECT *, (tsxy - tsx * tsy / tn) /
        |    ((tsxx - tsx * tsx / tn) + lambda) AS slope FROM g),
        |ab2 AS (SELECT *, (tsy - slope * tsx) / tn AS intercept FROM ab),
        |e AS (SELECT *,
        |    syy - 2.0 * intercept * sy - 2.0 * slope * sxy
        |      + 2.0 * intercept * slope * sx + intercept * intercept * n
        |      + slope * slope * sxx AS sse
        |  FROM ab2),
        |p AS (SELECT lambda, round(sqrt(sum(sse) / sum(n)), 6)
        |    AS cv_rmse
        |  FROM e GROUP BY 1)
        |SELECT lambda, cv_rmse,
        |  CAST(rank() OVER (ORDER BY cv_rmse, lambda) AS INT) AS "rank"
        |FROM p""".stripMargin,

    "q246_cramer_von_mises" ->
      """WITH pooled AS (
        |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events
        |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
        |counts AS (SELECT v,
        |  CAST(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |  CAST(sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM pooled GROUP BY 1),
        |cum AS (SELECT v, ca, cb,
        |  CAST(coalesce(sum(ca) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS ba,
        |  CAST(coalesce(sum(cb) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS bb
        |  FROM counts),
        |terms AS (SELECT ca, cb,
        |    2 * (ba + bb) + ca + cb + 1 - 2 * ba AS a2,
        |    2 * (ba + bb) + ca + cb + 1 - 2 * bb AS b2
        |  FROM cum),
        |sums AS (SELECT
        |  CAST(CAST(sum(ca) AS BIGINT) AS DOUBLE) AS na,
        |  CAST(CAST(sum(cb) AS BIGINT) AS DOUBLE) AS nb,
        |  CAST(CAST(sum(ca * a2 * a2 - 2 * a2 * ca * (ca + 1) +
        |    (2 * ca * (ca + 1) * (2 * ca + 1)) // 3) AS BIGINT)
        |    AS DOUBLE) AS sa4,
        |  CAST(CAST(sum(cb * b2 * b2 - 2 * b2 * cb * (cb + 1) +
        |    (2 * cb * (cb + 1) * (2 * cb + 1)) // 3) AS BIGINT)
        |    AS DOUBLE) AS sb4
        |  FROM terms),
        |fin AS (SELECT na, nb, na + nb AS nn,
        |    (na * sa4 + nb * sb4) / 4.0 AS u FROM sums),
        |tt AS (SELECT na, nb, nn,
        |    u / (na * nb * nn) - (4.0 * na * nb - 1) / (6.0 * nn) AS t
        |  FROM fin)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  round(t, 6) AS t_stat,
        |  round((t - (1.0 + 1.0 / nn) / 6.0) /
        |    sqrt((nn + 1) / (45.0 * nn * nn) *
        |      (4.0 * na * nb * nn - 3.0 * (na * na + nb * nb) -
        |        2.0 * na * nb) / (4.0 * na * nb)), 6) AS z
        |FROM tt""".stripMargin,

    "q245_grouped_ols" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(count(*) AS BIGINT) AS DOUBLE) AS n,
        |    CAST(CAST(sum(x) AS BIGINT) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(x * x) AS BIGINT) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(y * y) AS BIGINT) AS DOUBLE) AS syy,
        |    CAST(CAST(sum(x * y) AS BIGINT) AS DOUBLE) AS sxy
        |  FROM (SELECT l_returnflag,
        |      CAST(l_quantity AS BIGINT) AS x,
        |      CAST(round(l_extendedprice) AS BIGINT) AS y
        |    FROM lineitem
        |    WHERE l_quantity IS NOT NULL
        |      AND l_extendedprice IS NOT NULL)
        |  GROUP BY 1),
        |d AS (SELECT l_returnflag, n, sx, sy,
        |    n * sxy - sx * sy AS covxy,
        |    n * sxx - sx * sx AS varx,
        |    n * syy - sy * sy AS vary
        |  FROM s),
        |sl AS (SELECT l_returnflag, n, sx, sy, varx, vary, covxy,
        |    CASE WHEN varx <> 0 THEN covxy / varx END AS slope
        |  FROM d)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  round(slope, 6) AS slope,
        |  round((sy - slope * sx) / n, 6) AS intercept,
        |  round(CASE WHEN varx <> 0 AND vary <> 0
        |    THEN covxy * covxy / (varx * vary) END, 6) AS r2
        |FROM sl""".stripMargin,

    "q239_ks_test" ->
      """WITH pooled AS (
        |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events
        |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
        |counts AS (SELECT v,
        |  CAST(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |  CAST(sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM pooled GROUP BY 1),
        |tot AS (SELECT CAST(CAST(sum(ca) AS BIGINT) AS DOUBLE) AS na,
        |  CAST(CAST(sum(cb) AS BIGINT) AS DOUBLE) AS nb FROM counts),
        |cums AS (SELECT
        |  CAST(sum(ca) OVER (ORDER BY v) AS DOUBLE) AS cuma,
        |  CAST(sum(cb) OVER (ORDER BY v) AS DOUBLE) AS cumb FROM counts),
        |dd AS (SELECT max(abs(cuma / na - cumb / nb)) AS d
        |  FROM cums, tot)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  round(d, 6) AS d,
        |  round(CASE WHEN d = 0 THEN 1.0 ELSE
        |    least(1.0, greatest(0.0,
        |      list_sum(list_transform(range(1, 101), k ->
        |        (CASE WHEN k % 2 = 1 THEN 2.0 ELSE -2.0 END) *
        |          exp(-2.0 * k * k * (na * nb / (na + nb)) * d * d)))))
        |    END, 6) AS p_value
        |FROM dd, tot""".stripMargin,

    "q240_jensen_shannon" ->
      """WITH pooled AS (
        |  SELECT event_type AS c,
        |    CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS g
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |counts AS (SELECT c,
        |  CAST(sum(CASE WHEN g = 'even' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |  CAST(sum(CASE WHEN g = 'odd' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM pooled GROUP BY 1),
        |tot AS (SELECT CAST(CAST(sum(ca) AS BIGINT) AS DOUBLE) AS na,
        |  CAST(CAST(sum(cb) AS BIGINT) AS DOUBLE) AS nb FROM counts),
        |j AS (SELECT sum(
        |  (CASE WHEN ca > 0 THEN (ca / na) *
        |     ln((ca / na) / ((ca / na + cb / nb) / 2)) / 2 ELSE 0 END) +
        |  (CASE WHEN cb > 0 THEN (cb / nb) *
        |     ln((cb / nb) / ((ca / na + cb / nb) / 2)) / 2 ELSE 0 END))
        |  AS jsd FROM counts, tot)
        |SELECT round(jsd, 6) AS jsd,
        |  round(sqrt(greatest(jsd, 0.0)), 6) AS jsd_distance FROM j""".stripMargin,

    "q241_pettitt" ->
      """WITH s AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vc
        |  FROM events GROUP BY 1
        |  HAVING sum(CAST(round(value * 100) AS BIGINT)) IS NOT NULL),
        |r AS (SELECT day,
        |    CAST(rank() OVER (ORDER BY vc) AS DOUBLE) +
        |      (CAST(count(*) OVER (PARTITION BY vc) AS DOUBLE) - 1.0) / 2.0
        |      AS rk,
        |    row_number() OVER (ORDER BY day) AS t,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM s),
        |u AS (SELECT day, n,
        |    2.0 * sum(rk) OVER (ORDER BY day) -
        |      CAST(t AS DOUBLE) * (CAST(n AS DOUBLE) + 1) AS uu
        |  FROM r),
        |m AS (SELECT n, max(abs(uu)) AS k FROM u GROUP BY 1),
        |c AS (SELECT min(day) AS change_at FROM u, m WHERE abs(uu) = k)
        |SELECT n, round(k, 6) AS k_stat, change_at,
        |  round(least(1.0, 2.0 * exp(-6.0 * k * k /
        |    (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n))), 6)
        |    AS p_value
        |FROM m, c""".stripMargin,

    "q242_cliffs_delta" ->
      """WITH ranked AS (
        |  SELECT event_type,
        |    CAST(rank() OVER (ORDER BY vc) AS DOUBLE) +
        |      (CAST(count(*) OVER (PARTITION BY vc) AS DOUBLE) - 1.0) / 2.0
        |      AS r
        |  FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
        |    FROM events WHERE event_type IN ('click', 'view'))),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(r) AS rs FROM ranked GROUP BY 1),
        |ab AS (SELECT
        |  (SELECT n FROM g WHERE event_type = 'click') AS n_a,
        |  (SELECT n FROM g WHERE event_type = 'view') AS n_b,
        |  (SELECT rs - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1) / 2
        |     FROM g WHERE event_type = 'click') AS u_a),
        |dd AS (SELECT n_a, n_b, u_a,
        |  round(2.0 * u_a / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
        |    - 1.0, 6) AS delta FROM ab)
        |SELECT n_a, n_b, u_a, delta,
        |  CASE WHEN abs(delta) < 0.147 THEN 'negligible'
        |       WHEN abs(delta) < 0.33 THEN 'small'
        |       WHEN abs(delta) < 0.474 THEN 'medium'
        |       ELSE 'large' END AS magnitude
        |FROM dd""".stripMargin,

    "q243_hodges_lehmann" ->
      """WITH a AS (SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS v
        |  FROM customer WHERE c_nationkey = 2 AND c_acctbal IS NOT NULL),
        |b AS (SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS v
        |  FROM customer WHERE c_nationkey = 7 AND c_acctbal IS NOT NULL)
        |SELECT CAST((SELECT count(*) FROM a) * (SELECT count(*) FROM b)
        |    AS BIGINT) AS n_pairs,
        |  quantile_cont(CAST(a.v - b.v AS DOUBLE), 0.5) AS median_diff
        |FROM a, b""".stripMargin,

    "q205_tukey_hsd" ->
      """WITH d AS (
        |  SELECT event_type AS g,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |gp AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |  sum(v) AS s1, sum(v * v) AS s2 FROM d GROUP BY 1),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |  CAST(sum(n) AS BIGINT) AS nn, sum(s2) AS ts2,
        |  sum(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) AS sgm
        |  FROM gp)
        |SELECT a.g AS group_a, b.g AS group_b,
        |  round(CAST(a.s1 AS DOUBLE) / a.n -
        |    CAST(b.s1 AS DOUBLE) / b.n, 6) AS mean_diff,
        |  round(abs(CAST(a.s1 AS DOUBLE) / a.n -
        |      CAST(b.s1 AS DOUBLE) / b.n) /
        |    sqrt((CAST(ts2 AS DOUBLE) - sgm) / (nn - k) / 2 *
        |      (1.0 / a.n + 1.0 / b.n)), 6) AS q_stat
        |FROM gp a JOIN gp b ON a.g < b.g, tt""".stripMargin,

    "q206_cronbach" ->
      """WITH it AS (
        |  SELECT user_id,
        |    coalesce(CAST(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT),
        |      0) AS c,
        |    coalesce(CAST(sum(CASE WHEN event_type = 'view'
        |      THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT),
        |      0) AS v,
        |    coalesce(CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT),
        |      0) AS p
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  sum(c + v + p) AS st, sum((c + v + p) * (c + v + p)) AS stt,
        |  sum(c) AS sx0, sum(c * c) AS sxx0,
        |  sum(v) AS sx1, sum(v * v) AS sxx1,
        |  sum(p) AS sx2, sum(p * p) AS sxx2 FROM it)
        |SELECT n, CAST(3 AS BIGINT) AS k,
        |  round(1.5 * (1.0 - (
        |    (CAST(sxx0 AS DOUBLE) -
        |      CAST(sx0 AS DOUBLE) * CAST(sx0 AS DOUBLE) / n) / (n - 1) +
        |    (CAST(sxx1 AS DOUBLE) -
        |      CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE) / n) / (n - 1) +
        |    (CAST(sxx2 AS DOUBLE) -
        |      CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE) / n) / (n - 1)) /
        |    ((CAST(stt AS DOUBLE) -
        |      CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / n) / (n - 1))),
        |    6) AS alpha
        |FROM a""".stripMargin,

    "q207_ccc" ->
      """WITH hourly AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT)
        |      AS hr,
        |    CAST(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
        |      AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
        |      AS y
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |f AS (SELECT x, y FROM hourly
        |  WHERE x IS NOT NULL AND y IS NOT NULL),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |  sum(x * x) AS sxx, sum(y * y) AS syy FROM f)
        |SELECT n,
        |  round(2.0 * (CAST(sxy AS DOUBLE) / n -
        |      (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)) /
        |    ((CAST(sxx AS DOUBLE) / n -
        |        (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) +
        |      (CAST(syy AS DOUBLE) / n -
        |        (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)) +
        |      (CAST(sx AS DOUBLE) / n - CAST(sy AS DOUBLE) / n) *
        |        (CAST(sx AS DOUBLE) / n - CAST(sy AS DOUBLE) / n)), 6)
        |    AS ccc
        |FROM a""".stripMargin,

    "q208_hellinger" ->
      """WITH d AS (
        |  SELECT event_type, user_id % 2 = 0 AS s FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |c AS (SELECT event_type,
        |  CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |  CAST(sum(CASE WHEN s THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |  CAST(sum(cb) AS BIGINT) AS nb FROM c),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_cats,
        |  sum(sqrt((CAST(ca AS DOUBLE) / na) *
        |    (CAST(cb AS DOUBLE) / nb))) AS bc FROM c, t)
        |SELECT n_cats, round(bc, 6) AS bc,
        |  round(sqrt(greatest(0.0, 1.0 - bc)), 6) AS hellinger
        |FROM a""".stripMargin,

    "q209_emd" ->
      """WITH d AS (
        |  SELECT CAST(floor(value) AS BIGINT) AS v, event_type AS g
        |  FROM events
        |  WHERE value IS NOT NULL
        |    AND event_type IN ('purchase', 'click')),
        |c AS (SELECT v,
        |  CAST(sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS ca,
        |  CAST(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS cb
        |  FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |  CAST(sum(cb) AS BIGINT) AS nb FROM c),
        |w AS (SELECT v,
        |  CAST(sum(ca) OVER (ORDER BY v ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / na AS fa,
        |  CAST(sum(cb) OVER (ORDER BY v ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / nb AS fb,
        |  lead(v, 1) OVER (ORDER BY v) - v AS gap FROM c, t)
        |SELECT round(sum(abs(fa - fb) * CAST(gap AS DOUBLE)), 6) AS emd
        |FROM w WHERE gap IS NOT NULL""".stripMargin,

    "q189_ccf" ->
      """WITH hourly AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT)
        |      AS hr,
        |    CAST(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
        |      AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
        |      AS y
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |p AS (
        |  SELECT hr, x, y FROM hourly
        |  WHERE x IS NOT NULL AND y IS NOT NULL),
        |m AS (SELECT avg(x) AS mx, avg(y) AS my FROM p),
        |c AS (
        |  SELECT x - mx AS cx, y - my AS cy,
        |    row_number() OVER (ORDER BY hr) AS rn
        |  FROM p, m),
        |dn AS (
        |  SELECT sqrt(sum(cx * cx) * sum(cy * cy)) AS den FROM c),
        |pr AS (
        |  SELECT a.cx, gs.l AS lag, a.rn + gs.l AS jrn
        |  FROM c a CROSS JOIN (SELECT unnest(range(-6, 7)) AS l) gs),
        |nm AS (
        |  SELECT pr.lag, sum(pr.cx * b.cy) AS num
        |  FROM pr JOIN c b ON pr.jrn = b.rn
        |  GROUP BY 1)
        |SELECT CAST(lag AS BIGINT) AS lag,
        |  round(num / den, 6) AS ccf
        |FROM nm, dn""".stripMargin,

    "q190_granger" ->
      """WITH hourly AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT)
        |      AS hr,
        |    CAST(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
        |      AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
        |      AS y
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |p AS (
        |  SELECT hr, x, y FROM hourly
        |  WHERE x IS NOT NULL AND y IS NOT NULL),
        |lg AS (
        |  SELECT y, lag(y, 1) OVER (ORDER BY hr) AS y1,
        |    lag(x, 1) OVER (ORDER BY hr) AS x1
        |  FROM p),
        |d AS (SELECT y, y1, x1 FROM lg
        |  WHERE y1 IS NOT NULL AND x1 IS NOT NULL),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(y1) AS BIGINT) AS sy1,
        |    CAST(sum(x1) AS BIGINT) AS sx1,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(y1 * y1) AS BIGINT) AS sy1y1,
        |    CAST(sum(x1 * x1) AS BIGINT) AS sx1x1,
        |    CAST(sum(y * y1) AS BIGINT) AS syy1,
        |    CAST(sum(y * x1) AS BIGINT) AS syx1,
        |    CAST(sum(y1 * x1) AS BIGINT) AS sy1x1
        |  FROM d),
        |cc AS (
        |  SELECT n,
        |    syy - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) /
        |      CAST(n AS DOUBLE) AS cyy,
        |    sy1y1 - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE) /
        |      CAST(n AS DOUBLE) AS cy1y1,
        |    sx1x1 - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE) /
        |      CAST(n AS DOUBLE) AS cx1x1,
        |    syy1 - CAST(sy AS DOUBLE) * CAST(sy1 AS DOUBLE) /
        |      CAST(n AS DOUBLE) AS cyy1,
        |    syx1 - CAST(sy AS DOUBLE) * CAST(sx1 AS DOUBLE) /
        |      CAST(n AS DOUBLE) AS cyx1,
        |    sy1x1 - CAST(sy1 AS DOUBLE) * CAST(sx1 AS DOUBLE) /
        |      CAST(n AS DOUBLE) AS cy1x1
        |  FROM s),
        |bb AS (
        |  SELECT n, cyy, cyy1, cyx1,
        |    (cyy1 * cx1x1 - cyx1 * cy1x1) /
        |      (CASE WHEN cy1y1 * cx1x1 - cy1x1 * cy1x1 <> 0
        |        THEN cy1y1 * cx1x1 - cy1x1 * cy1x1 END) AS b1,
        |    (cyx1 * cy1y1 - cyy1 * cy1x1) /
        |      (CASE WHEN cy1y1 * cx1x1 - cy1x1 * cy1x1 <> 0
        |        THEN cy1y1 * cx1x1 - cy1x1 * cy1x1 END) AS b2,
        |    cyy - cyy1 * cyy1 /
        |      (CASE WHEN cy1y1 > 0 THEN cy1y1 END) AS ssrr
        |  FROM cc),
        |ff AS (
        |  SELECT n, ssrr,
        |    cyy - b1 * cyy1 - b2 * cyx1 AS ssru
        |  FROM bb)
        |SELECT
        |  round((ssrr - ssru) /
        |    (CASE WHEN ssru / (CAST(n AS DOUBLE) - 3) > 0
        |      THEN ssru / (CAST(n AS DOUBLE) - 3) END), 6) AS f_stat,
        |  CAST(1 AS BIGINT) AS df1, n - 3 AS df2
        |FROM ff""".stripMargin,

    "q187_dunn" -> {
      val phi = graft.stats.Distributions.normalCdfSql("abs(z)")
      s"""WITH p AS (
         |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
         |  FROM events
         |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
         |r AS (
         |  SELECT event_type,
         |    CAST(rank() OVER (ORDER BY vc) AS DOUBLE) +
         |      (CAST(count(*) OVER (PARTITION BY vc) AS DOUBLE) - 1.0)
         |      / 2.0 AS r
         |  FROM p),
         |t AS (
         |  SELECT CAST(sum(c * c * c - c) AS DOUBLE) AS tie_t
         |  FROM (SELECT count(*) AS c FROM p GROUP BY vc)),
         |g AS (
         |  SELECT event_type, CAST(count(*) AS DOUBLE) AS gn,
         |    sum(r) AS rs
         |  FROM r GROUP BY 1),
         |tot AS (SELECT sum(gn) AS nn FROM g),
         |pr AS (
         |  SELECT a.event_type AS ga, b.event_type AS gb,
         |    a.gn AS na, a.rs AS ra, b.gn AS nb, b.rs AS rb, nn, tie_t
         |  FROM g a JOIN g b ON a.event_type < b.event_type, tot, t),
         |zz AS (
         |  SELECT ga, gb,
         |    (ra / na - rb / nb) /
         |      sqrt((nn * (nn + 1) / 12 - tie_t / (12.0 * (nn - 1))) *
         |        (1.0 / na + 1.0 / nb)) AS z
         |  FROM pr),
         |pp AS (
         |  SELECT ga AS group_a, gb AS group_b, round(z, 6) AS z,
         |    2.0 * (1.0 - $phi) AS p_raw
         |  FROM zz),
         |rk AS (
         |  SELECT group_a, group_b, z, p_raw,
         |    row_number() OVER (ORDER BY p_raw) AS i,
         |    count(*) OVER () AS m
         |  FROM pp),
         |adj AS (
         |  SELECT group_a, group_b, z, p_raw,
         |    min(p_raw * m / i) OVER (ORDER BY i
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         |      AS padj
         |  FROM rk)
         |SELECT group_a, group_b, z, round(p_raw, 6) AS p_value,
         |  round(least(1.0, padj), 6) AS p_adj
         |FROM adj""".stripMargin
    },

    "q188_chow" ->
      """WITH d AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_extendedprice) AS BIGINT) AS y,
        |    l_shipdate
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |sp AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM d),
        |s1 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM d WHERE year(l_shipdate) < 1997),
        |s2 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM d WHERE NOT (year(l_shipdate) < 1997)),
        |f AS (
        |  SELECT
        |    (sp.syy - CAST(sp.sy AS DOUBLE) * CAST(sp.sy AS DOUBLE) /
        |        CAST(sp.n AS DOUBLE) -
        |      (sp.sxy - CAST(sp.sx AS DOUBLE) * CAST(sp.sy AS DOUBLE) /
        |        CAST(sp.n AS DOUBLE)) *
        |      (sp.sxy - CAST(sp.sx AS DOUBLE) * CAST(sp.sy AS DOUBLE) /
        |        CAST(sp.n AS DOUBLE)) /
        |      (sp.sxx - CAST(sp.sx AS DOUBLE) * CAST(sp.sx AS DOUBLE) /
        |        CAST(sp.n AS DOUBLE))) AS ssrp,
        |    (s1.syy - CAST(s1.sy AS DOUBLE) * CAST(s1.sy AS DOUBLE) /
        |        CAST(s1.n AS DOUBLE) -
        |      (s1.sxy - CAST(s1.sx AS DOUBLE) * CAST(s1.sy AS DOUBLE) /
        |        CAST(s1.n AS DOUBLE)) *
        |      (s1.sxy - CAST(s1.sx AS DOUBLE) * CAST(s1.sy AS DOUBLE) /
        |        CAST(s1.n AS DOUBLE)) /
        |      (s1.sxx - CAST(s1.sx AS DOUBLE) * CAST(s1.sx AS DOUBLE) /
        |        CAST(s1.n AS DOUBLE))) AS ssr1,
        |    (s2.syy - CAST(s2.sy AS DOUBLE) * CAST(s2.sy AS DOUBLE) /
        |        CAST(s2.n AS DOUBLE) -
        |      (s2.sxy - CAST(s2.sx AS DOUBLE) * CAST(s2.sy AS DOUBLE) /
        |        CAST(s2.n AS DOUBLE)) *
        |      (s2.sxy - CAST(s2.sx AS DOUBLE) * CAST(s2.sy AS DOUBLE) /
        |        CAST(s2.n AS DOUBLE)) /
        |      (s2.sxx - CAST(s2.sx AS DOUBLE) * CAST(s2.sx AS DOUBLE) /
        |        CAST(s2.n AS DOUBLE))) AS ssr2,
        |    CAST(sp.n AS DOUBLE) AS nd, sp.n AS np
        |  FROM sp, s1, s2)
        |SELECT
        |  round(((ssrp - ssr1 - ssr2) / 2) /
        |    ((ssr1 + ssr2) / (nd - 4)), 6) AS f_stat,
        |  CAST(2 AS BIGINT) AS df1, np - 4 AS df2
        |FROM f""".stripMargin,

    "q185_cusum" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT)
        |      AS hr,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS v
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS sx,
        |    CAST(sum(v * v) AS BIGINT) AS sxx
        |  FROM hourly GROUP BY 1),
        |cum AS (
        |  SELECT h.event_type, h.hr, st.n, st.sx, st.sxx,
        |    CAST(sum(v) OVER (PARTITION BY h.event_type ORDER BY hr
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cx,
        |    CAST(row_number() OVER (PARTITION BY h.event_type
        |      ORDER BY hr) AS BIGINT) AS i
        |  FROM hourly h JOIN st USING (event_type)),
        |s AS (
        |  SELECT event_type, hr, n, sx, sxx,
        |    abs(CAST(cx AS DOUBLE) - CAST(i AS DOUBLE) *
        |      (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) AS a
        |  FROM cum),
        |mx AS (
        |  SELECT event_type, hr, n, sx, sxx, a,
        |    max(a) OVER (PARTITION BY event_type) AS m
        |  FROM s),
        |agg AS (
        |  SELECT event_type, n, sx, sxx, max(a) AS max_abs_s,
        |    min(CASE WHEN a = m THEN hr END) AS t_at_max
        |  FROM mx GROUP BY 1, 2, 3, 4),
        |f AS (
        |  SELECT event_type, n, max_abs_s, t_at_max,
        |    sqrt((sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) /
        |      CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) *
        |      sqrt(CAST(n AS DOUBLE)) AS den
        |  FROM agg)
        |SELECT event_type, n, round(max_abs_s, 6) AS max_abs_s,
        |  t_at_max,
        |  round(max_abs_s / (CASE WHEN den > 0 THEN den END), 6)
        |    AS cusum_stat
        |FROM f""".stripMargin,

    "q183_kaplan_meier" ->
      """WITH u AS (
        |  SELECT user_id,
        |    date_diff('day', CAST(min(ts) AS DATE),
        |      CAST(max(ts) AS DATE)) AS dur,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS ev
        |  FROM events GROUP BY 1),
        |t AS (
        |  SELECT dur,
        |    CAST(sum(CASE WHEN ev <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d,
        |    CAST(sum(CASE WHEN ev = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c
        |  FROM u GROUP BY 1),
        |w AS (
        |  SELECT dur, d, c,
        |    CAST(coalesce(sum(d + c) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS below,
        |    CAST(sum(d + c) OVER () AS BIGINT) AS nn
        |  FROM t),
        |s AS (
        |  SELECT dur, d, c, nn - below AS n_risk,
        |    exp(sum(ln(greatest(1.0 - CAST(d AS DOUBLE) /
        |      (CASE WHEN nn - below > 0 THEN nn - below END), 1e-300)))
        |      OVER (ORDER BY dur
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |      AS surv
        |  FROM w)
        |SELECT dur, d, c, n_risk, round(surv, 6) AS survival
        |FROM s""".stripMargin,

    // same KM replay as q183 + the virtual origin row, s-DESC
    // tiebreak, lead segments clipped at tau and one sum
    "q378_rmst" ->
      """WITH u AS (
        |  SELECT user_id,
        |    date_diff('day', CAST(min(ts) AS DATE),
        |      CAST(max(ts) AS DATE)) AS dur,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS ev
        |  FROM events GROUP BY 1),
        |t AS (
        |  SELECT dur,
        |    CAST(sum(CASE WHEN ev <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d,
        |    CAST(sum(CASE WHEN ev = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c
        |  FROM u GROUP BY 1),
        |w AS (
        |  SELECT dur, d, c,
        |    CAST(coalesce(sum(d + c) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS below,
        |    CAST(sum(d + c) OVER () AS BIGINT) AS nn
        |  FROM t),
        |s AS (
        |  SELECT dur,
        |    exp(sum(ln(greatest(1.0 - CAST(d AS DOUBLE) /
        |      (CASE WHEN nn - below > 0 THEN nn - below END), 1e-300)))
        |      OVER (ORDER BY dur
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |      AS surv
        |  FROM w),
        |km AS (
        |  SELECT CAST(dur AS DOUBLE) AS t, round(surv, 6) AS sv
        |  FROM s
        |  UNION ALL SELECT 0.0, 1.0),
        |a AS (
        |  SELECT sv * greatest(0.0,
        |    least(coalesce(lead(t) OVER (ORDER BY t, sv DESC), 30.0),
        |      30.0) - least(t, 30.0)) AS area
        |  FROM km)
        |SELECT 30.0 AS tau, round(sum(area), 6) AS rmst,
        |  CAST(count(*) AS BIGINT) AS n_steps
        |FROM a""".stripMargin,

    "q213_nelson_aalen" ->
      """WITH u AS (
        |  SELECT user_id,
        |    date_diff('day', CAST(min(ts) AS DATE),
        |      CAST(max(ts) AS DATE)) AS dur,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS ev
        |  FROM events GROUP BY 1),
        |t AS (
        |  SELECT dur,
        |    CAST(sum(CASE WHEN ev <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d,
        |    CAST(sum(CASE WHEN ev = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c
        |  FROM u GROUP BY 1),
        |w AS (
        |  SELECT dur, d, c,
        |    CAST(coalesce(sum(d + c) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS below,
        |    CAST(sum(d + c) OVER () AS BIGINT) AS nn
        |  FROM t)
        |SELECT dur, d, c, nn - below AS n_risk,
        |  round(sum(CAST(d AS DOUBLE) / (nn - below))
        |    OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |    AS hazard,
        |  round(sum(CAST(d AS DOUBLE) /
        |      (CAST(nn - below AS DOUBLE) * (nn - below)))
        |    OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |    AS hazard_var
        |FROM w""".stripMargin,

    "q184_logrank" -> {
      val phi = graft.stats.Distributions.normalCdfSql("sqrt(chi2)")
      s"""WITH u AS (
         |  SELECT user_id,
         |    date_diff('day', CAST(min(ts) AS DATE),
         |      CAST(max(ts) AS DATE)) AS dur,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS ev
         |  FROM events GROUP BY 1),
         |g AS (
         |  SELECT dur, ev,
         |    CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END
         |      AS grp
         |  FROM u),
         |t AS (
         |  SELECT dur,
         |    CAST(sum(CASE WHEN grp = 'even' AND ev <> 0 THEN 1
         |      ELSE 0 END) AS BIGINT) AS da,
         |    CAST(sum(CASE WHEN grp = 'even' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS alla,
         |    CAST(sum(CASE WHEN grp = 'odd' AND ev <> 0 THEN 1
         |      ELSE 0 END) AS BIGINT) AS db,
         |    CAST(sum(CASE WHEN grp = 'odd' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS allb
         |  FROM g GROUP BY 1),
         |w AS (
         |  SELECT dur, da, db,
         |    CAST(sum(alla) OVER () AS BIGINT) -
         |      CAST(coalesce(sum(alla) OVER (ORDER BY dur
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |        AS BIGINT) AS nai,
         |    CAST(sum(allb) OVER () AS BIGINT) -
         |      CAST(coalesce(sum(allb) OVER (ORDER BY dur
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |        AS BIGINT) AS nbi
         |  FROM t),
         |m AS (
         |  SELECT CAST(da AS DOUBLE) AS dad,
         |    CAST(nai AS DOUBLE) AS na, CAST(nbi AS DOUBLE) AS nb,
         |    CAST(da + db AS DOUBLE) AS dd,
         |    CAST(nai AS DOUBLE) + CAST(nbi AS DOUBLE) AS nn
         |  FROM w WHERE da + db > 0),
         |a AS (
         |  SELECT sum(dad) AS oa,
         |    sum(na * dd / nn) AS ea,
         |    sum(CASE WHEN nn > 1
         |      THEN na * nb * dd * (nn - dd) / (nn * nn * (nn - 1))
         |      ELSE 0.0 END) AS v
         |  FROM m),
         |r AS (
         |  SELECT oa, ea,
         |    (oa - ea) * (oa - ea) /
         |      (CASE WHEN v > 0 THEN v END) AS chi2
         |  FROM a)
         |SELECT round(oa, 6) AS observed_a, round(ea, 6) AS expected_a,
         |  round(chi2, 6) AS chi2_stat,
         |  round(2.0 * (1.0 - $phi), 6) AS p_value
         |FROM r""".stripMargin
    },

    "q180_theil" ->
      """WITH p AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL
        |    AND CAST(round(l_extendedprice * 100) AS BIGINT) > 0),
        |t AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(v) AS DOUBLE) AS x
        |  FROM p)
        |SELECT CAST(n AS BIGINT) AS n,
        |  round(sum(CAST(v AS DOUBLE) / x *
        |    ln(n * CAST(v AS DOUBLE) / x)), 6) AS theil_t
        |FROM p, t GROUP BY 1""".stripMargin,

    "q181_hhi" ->
      """WITH c AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS c
        |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM c)
        |SELECT CAST(count(*) AS BIGINT) AS k,
        |  round(sum(c / t * (c / t)), 6) AS hhi
        |FROM c, t""".stripMargin,

    "q177_jonckheere" -> {
      val phi = graft.stats.Distributions.normalCdfSql("abs(z)")
      s"""WITH p AS (
         |  SELECT CAST(round(value * 100) AS BIGINT) AS v, event_type
         |  FROM events
         |  WHERE event_type IN ('click', 'error', 'purchase')
         |    AND value IS NOT NULL),
         |c AS (
         |  SELECT v,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
         |      END) AS BIGINT) AS c0,
         |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
         |      END) AS BIGINT) AS c1,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
         |      END) AS BIGINT) AS c2
         |  FROM p GROUP BY 1),
         |cum AS (
         |  SELECT v, c0, c1, c2,
         |    CAST(coalesce(sum(c0) OVER w, 0) AS BIGINT) AS b0,
         |    CAST(coalesce(sum(c1) OVER w, 0) AS BIGINT) AS b1
         |  FROM c
         |  WINDOW w AS (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         |a AS (
         |  SELECT
         |    sum((c1 * b0 + c1 * c0 / 2.0) + (c2 * b0 + c2 * c0 / 2.0)
         |      + (c2 * b1 + c2 * c1 / 2.0)) AS j_raw,
         |    CAST(sum(c0) AS DOUBLE) AS n0,
         |    CAST(sum(c1) AS DOUBLE) AS n1,
         |    CAST(sum(c2) AS DOUBLE) AS n2
         |  FROM cum),
         |m AS (
         |  SELECT j_raw, n0 + n1 + n2 AS n,
         |    n0 * n0 + n1 * n1 + n2 * n2 AS sn2,
         |    n0 * n0 * (n0 * 2 + 3) + n1 * n1 * (n1 * 2 + 3) +
         |      n2 * n2 * (n2 * 2 + 3) AS sn23
         |  FROM a),
         |zz AS (
         |  SELECT j_raw,
         |    (j_raw - (n * n - sn2) / 4) /
         |      sqrt(CASE WHEN (n * n * (n * 2 + 3) - sn23) / 72 > 0
         |        THEN (n * n * (n * 2 + 3) - sn23) / 72 END) AS z
         |  FROM m)
         |SELECT round(j_raw, 6) AS j_stat, round(z, 6) AS z,
         |  round(2.0 * (1.0 - $phi), 6) AS p_value
         |FROM zz""".stripMargin
    },

    "q175_psi" -> {
      val breaks = Seq(1000.0, 2500.0, 4000.0, 5500.0, 7000.0, 8500.0)
      val binExpr = breaks.map(b =>
        s"(CASE WHEN CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE)" +
          s" > $b THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH p AS (
         |  SELECT ($binExpr) AS bin, event_type
         |  FROM events
         |  WHERE event_type IN ('purchase', 'click')
         |    AND value IS NOT NULL),
         |c AS (
         |  SELECT bin,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
         |      ELSE 0 END) AS BIGINT) AS na,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1
         |      ELSE 0 END) AS BIGINT) AS nb
         |  FROM p GROUP BY 1),
         |t AS (
         |  SELECT CAST(sum(na) AS DOUBLE) AS ta,
         |    CAST(sum(nb) AS DOUBLE) AS tb
         |  FROM c),
         |w AS (
         |  SELECT bin, na, nb,
         |    greatest(na / ta, 1e-6) AS pa,
         |    greatest(nb / tb, 1e-6) AS pb
         |  FROM c, t),
         |x AS (
         |  SELECT bin, na, nb, pa, pb,
         |    (pa - pb) * ln(pa / pb) AS contrib
         |  FROM w),
         |s AS (SELECT sum(contrib) AS psi FROM x)
         |SELECT bin, na, nb, round(pa, 6) AS p_a, round(pb, 6) AS p_b,
         |  round(contrib, 6) AS contrib, round(psi, 6) AS psi
         |FROM x, s""".stripMargin
    },

    "q176_gini" ->
      """WITH p AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL
        |    AND CAST(round(l_extendedprice * 100) AS BIGINT) >= 0),
        |c AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM p
        |  GROUP BY 1),
        |cum AS (
        |  SELECT v, c,
        |    CAST(coalesce(sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS b
        |  FROM c),
        |a AS (
        |  SELECT
        |    CAST(sum(v * (c * b + (c * (c + 1)) // 2)) AS BIGINT) AS s,
        |    CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(v * c) AS BIGINT) AS sx
        |  FROM cum)
        |SELECT n,
        |  round(2.0 * s / (CAST(n AS DOUBLE) * sx) -
        |    (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE), 6) AS gini
        |FROM a""".stripMargin,

    "q173_mantel_haenszel" -> {
      val phi = graft.stats.Distributions.normalCdfSql("sqrt(chi2)")
      s"""WITH u AS (
         |  SELECT user_id,
         |    max(CASE WHEN event_type = 'purchase' AND value >= 80.0
         |      THEN 1 ELSE 0 END) AS x,
         |    max(CASE WHEN event_type = 'error' AND value >= 80.0
         |      THEN 1 ELSE 0 END) AS y
         |  FROM events GROUP BY 1),
         |cells AS (
         |  SELECT user_id % 5 AS st,
         |    CAST(sum(CASE WHEN x <> 0 AND y <> 0 THEN 1 ELSE 0 END)
         |      AS DOUBLE) AS a,
         |    CAST(sum(CASE WHEN x <> 0 AND y = 0 THEN 1 ELSE 0 END)
         |      AS DOUBLE) AS b,
         |    CAST(sum(CASE WHEN x = 0 AND y <> 0 THEN 1 ELSE 0 END)
         |      AS DOUBLE) AS c,
         |    CAST(sum(CASE WHEN x = 0 AND y = 0 THEN 1 ELSE 0 END)
         |      AS DOUBLE) AS d
         |  FROM u GROUP BY 1),
         |f AS (SELECT * FROM cells WHERE a + b + c + d >= 2),
         |agg AS (
         |  SELECT
         |    sum(a * d / (a + b + c + d)) AS s_ad,
         |    sum(b * c / (a + b + c + d)) AS s_bc,
         |    sum(a) AS s_a,
         |    sum((a + b) * (a + c) / (a + b + c + d)) AS s_e,
         |    sum((a + b) * (c + d) * (a + c) * (b + d) /
         |      ((a + b + c + d) * (a + b + c + d) *
         |        (a + b + c + d - 1))) AS s_v
         |  FROM f),
         |r AS (
         |  SELECT
         |    CASE WHEN s_bc > 0 THEN s_ad / s_bc END AS or_mh,
         |    (s_a - s_e) * (s_a - s_e) /
         |      (CASE WHEN s_v > 0 THEN s_v END) AS chi2
         |  FROM agg)
         |SELECT round(or_mh, 6) AS or_mh, round(chi2, 6) AS chi2_mh,
         |  round(2.0 * (1.0 - $phi), 6) AS p_value
         |FROM r""".stripMargin
    },

    "q174_cuped" ->
      """WITH u AS (
        |  SELECT user_id,
        |    coalesce(CAST(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT),
        |      0) AS x,
        |    coalesce(CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT),
        |      0) AS y
        |  FROM events GROUP BY 1),
        |s AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM u),
        |t AS (
        |  SELECT
        |    CASE WHEN n * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |        > 0
        |      THEN (n * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |        (n * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    END AS theta,
        |    CAST(sx AS DOUBLE) / n AS xbar
        |  FROM s)
        |SELECT user_id, x, y,
        |  round(y - theta * (x - xbar), 6) AS y_cuped
        |FROM u, t""".stripMargin,

    "q171_partial_corr" ->
      """WITH p AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_extendedprice) AS BIGINT) AS y,
        |    CAST(round(l_discount * 100) AS BIGINT) AS z
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL),
        |s AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(z) AS BIGINT) AS sz,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(z * z) AS BIGINT) AS szz,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * z) AS BIGINT) AS sxz,
        |    CAST(sum(y * z) AS BIGINT) AS syz
        |  FROM p),
        |r AS (
        |  SELECT
        |    (n * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |      (sqrt(n * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |       sqrt(n * syy - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |      AS rxy,
        |    (n * sxz - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE)) /
        |      (sqrt(n * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |       sqrt(n * szz - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)))
        |      AS rxz,
        |    (n * syz - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE)) /
        |      (sqrt(n * syy - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) *
        |       sqrt(n * szz - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)))
        |      AS ryz
        |  FROM s)
        |SELECT round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz,
        |  round(ryz, 6) AS r_yz,
        |  round((rxy - rxz * ryz) /
        |    sqrt(CASE WHEN (1 - rxz * rxz) * (1 - ryz * ryz) > 0
        |      THEN (1 - rxz * rxz) * (1 - ryz * ryz) END), 6) AS r_xy_z
        |FROM r""".stripMargin,

    "q172_winsorize" ->
      """WITH p AS (
        |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT)
        |      AS l_linenumber,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
        |  FROM lineitem),
        |q AS (
        |  SELECT quantile_cont(pc, 0.05) AS qlo,
        |    quantile_cont(pc, 0.95) AS qhi
        |  FROM p)
        |SELECT l_orderkey, l_linenumber, pc,
        |  round(least(greatest(CAST(pc AS DOUBLE), qlo), qhi), 6)
        |    AS wins
        |FROM p, q""".stripMargin,

    "q170_odds_ratio" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value >= 80.0
        |      THEN 1 ELSE 0 END) AS x,
        |    max(CASE WHEN event_type = 'error' AND value >= 80.0
        |      THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY 1),
        |t AS (
        |  SELECT
        |    CAST(sum(CASE WHEN x <> 0 AND y <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN x <> 0 AND y = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN x = 0 AND y <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN x = 0 AND y = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d
        |  FROM u),
        |m AS (
        |  SELECT a, b, c, d,
        |    CAST(a AS DOUBLE) AS ad, CAST(b AS DOUBLE) AS bd,
        |    CAST(c AS DOUBLE) AS cd, CAST(d AS DOUBLE) AS dd,
        |    least(CAST(a AS DOUBLE), CAST(b AS DOUBLE),
        |      CAST(c AS DOUBLE), CAST(d AS DOUBLE)) > 0 AS ok
        |  FROM t),
        |s AS (
        |  SELECT a, b, c, d,
        |    CASE WHEN ok THEN ad * dd / (bd * cd) END AS orr,
        |    CASE WHEN ok THEN ln(ad * dd / (bd * cd)) END AS log_or,
        |    CASE WHEN ok THEN sqrt(1.0 / ad + 1.0 / bd + 1.0 / cd +
        |      1.0 / dd) END AS se
        |  FROM m)
        |SELECT a, b, c, d,
        |  round(orr, 6) AS odds_ratio, round(log_or, 6) AS log_or,
        |  round(exp(log_or - 1.959963984540054 * se), 6) AS ci_lo,
        |  round(exp(log_or + 1.959963984540054 * se), 6) AS ci_hi
        |FROM s""".stripMargin,

    "q165_mcnemar" -> {
      val phi = graft.stats.Distributions.normalCdfSql("sqrt(chi2)")
      s"""WITH u AS (
         |  SELECT user_id,
         |    max(CASE WHEN event_type = 'purchase' AND value >= 50.0
         |      THEN 1 ELSE 0 END) AS x,
         |    max(CASE WHEN event_type = 'click' AND value >= 50.0
         |      THEN 1 ELSE 0 END) AS y
         |  FROM events GROUP BY 1),
         |t AS (
         |  SELECT
         |    CAST(sum(CASE WHEN x <> 0 AND y = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN x = 0 AND y <> 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c
         |  FROM u),
         |s AS (
         |  SELECT b, c,
         |    (CAST(b AS DOUBLE) - c) * (CAST(b AS DOUBLE) - c) /
         |      (CASE WHEN CAST(b AS DOUBLE) + c > 0
         |        THEN CAST(b AS DOUBLE) + c END) AS chi2
         |  FROM t)
         |SELECT b, c, round(chi2, 6) AS chi2_stat,
         |  round(2.0 * (1.0 - $phi), 6) AS p_value
         |FROM s""".stripMargin
    },

    "q166_cochran_q" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, value FROM events
        |  WHERE event_type IN ('click', 'view', 'purchase')),
        |cells AS (
        |  SELECT user_id, event_type,
        |    max(CASE WHEN value >= 60.0 THEN 1 ELSE 0 END) AS x
        |  FROM ev GROUP BY 1, 2),
        |grid AS (
        |  SELECT u.user_id, t.event_type
        |  FROM (SELECT DISTINCT user_id FROM ev) u
        |  CROSS JOIN (VALUES ('click'), ('view'), ('purchase'))
        |    t(event_type)),
        |f AS (
        |  SELECT g.user_id, g.event_type, coalesce(c.x, 0) AS x
        |  FROM grid g LEFT JOIN cells c
        |    ON g.user_id = c.user_id AND g.event_type = c.event_type),
        |ct AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS k,
        |    CAST(sum(cj) AS BIGINT) AS n_tot,
        |    CAST(sum(cj * cj) AS BIGINT) AS sc2
        |  FROM (SELECT CAST(sum(x) AS BIGINT) AS cj
        |    FROM f GROUP BY event_type)),
        |rt AS (
        |  SELECT CAST(sum(ri * ri) AS BIGINT) AS sr2
        |  FROM (SELECT CAST(sum(x) AS BIGINT) AS ri
        |    FROM f GROUP BY user_id)),
        |qq AS (
        |  SELECT k,
        |    (k - 1) * (k * sc2 - n_tot * n_tot) /
        |      (CASE WHEN k * n_tot - sr2 > 0
        |        THEN k * n_tot - sr2 END) AS q
        |  FROM ct, rt)
        |SELECT round(q, 6) AS q_stat, CAST(k - 1 AS BIGINT) AS dof,
        |  round(exp(-q / 2), 6) AS p_value
        |FROM qq""".stripMargin,

    "q167_fisher" -> {
      import graft.stats.{Distributions => D}
      def lg(e: String) = D.lnGammaSql(e)
      def logP(i: String) =
        s"(${lg("r1 + 1")} - ${lg(s"$i + 1")} - ${lg(s"r1 - $i + 1")} + " +
          s"${lg("r2 + 1")} - ${lg(s"c1 - $i + 1")} - " +
          s"${lg(s"r2 - c1 + $i + 1")} - " +
          s"(${lg("nn + 1")} - ${lg("c1 + 1")} - ${lg("nn - c1 + 1")}))"
      s"""WITH u AS (
         |  SELECT user_id,
         |    max(CASE WHEN event_type = 'purchase' AND value >= 80.0
         |      THEN 1 ELSE 0 END) AS x,
         |    max(CASE WHEN event_type = 'error' AND value >= 80.0
         |      THEN 1 ELSE 0 END) AS y
         |  FROM events GROUP BY 1),
         |t AS (
         |  SELECT
         |    CAST(sum(CASE WHEN x <> 0 AND y <> 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS a,
         |    CAST(sum(CASE WHEN x <> 0 AND y = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN x = 0 AND y <> 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c,
         |    CAST(sum(CASE WHEN x = 0 AND y = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS d
         |  FROM u),
         |m AS (
         |  SELECT a, b, c, d,
         |    CAST(a + b AS DOUBLE) AS r1, CAST(c + d AS DOUBLE) AS r2,
         |    CAST(a + c AS DOUBLE) AS c1,
         |    CAST(a + b + c + d AS DOUBLE) AS nn
         |  FROM t),
         |g AS (
         |  SELECT *, CAST(unnest(range(
         |    CAST(greatest(0.0, c1 - r2) AS BIGINT),
         |    CAST(least(r1, c1) AS BIGINT) + 1)) AS DOUBLE) AS i
         |  FROM m),
         |lp AS (
         |  SELECT a, b, c, d,
         |    ${logP("i")} AS lp,
         |    ${logP("CAST(a AS DOUBLE)")} AS lpo
         |  FROM g)
         |SELECT a, b, c, d,
         |  round(least(1.0, sum(CASE WHEN lp <= lpo +
         |    ${math.log1p(1e-7)} THEN exp(lp) END)), 6) AS p_value
         |FROM lp GROUP BY 1, 2, 3, 4""".stripMargin
    },

    "q162_spearman" ->
      """WITH p AS (
        |  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS qc,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |r AS (
        |  SELECT
        |    2 * (rank() OVER (ORDER BY qc)) +
        |      (count(*) OVER (PARTITION BY qc)) - 1 AS ra,
        |    2 * (rank() OVER (ORDER BY pc)) +
        |      (count(*) OVER (PARTITION BY pc)) - 1 AS rb
        |  FROM p),
        |a AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(ra) AS BIGINT) AS sa, CAST(sum(rb) AS BIGINT) AS sb,
        |    CAST(sum(ra * ra) AS BIGINT) AS saa,
        |    CAST(sum(rb * rb) AS BIGINT) AS sbb,
        |    CAST(sum(ra * rb) AS BIGINT) AS sab
        |  FROM r)
        |SELECT
        |  round((CAST(n AS DOUBLE) * sab -
        |      CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)) /
        |    (sqrt(CAST(n AS DOUBLE) * saa -
        |      CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) *
        |     sqrt(CAST(n AS DOUBLE) * sbb -
        |      CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6) AS rho_s,
        |  n
        |FROM a""".stripMargin,

    "q163_kendall" ->
      """WITH p AS (
        |  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS qc,
        |    CAST(round(l_discount * 100) AS BIGINT) AS dc
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
        |cells AS (
        |  SELECT qc AS va, dc AS vb, count(*) AS c
        |  FROM p GROUP BY 1, 2),
        |pairs AS (
        |  SELECT
        |    CAST(coalesce(sum(CASE WHEN l.vb < r.vb
        |      THEN l.c * r.c END), 0) AS BIGINT) AS cc,
        |    CAST(coalesce(sum(CASE WHEN l.vb > r.vb
        |      THEN l.c * r.c END), 0) AS BIGINT) AS dd
        |  FROM cells l JOIN cells r ON l.va < r.va),
        |mx AS (
        |  SELECT CAST(coalesce(sum(tx * (tx - 1)), 0) AS BIGINT) AS t1x
        |  FROM (SELECT CAST(sum(c) AS BIGINT) AS tx
        |    FROM cells GROUP BY va)),
        |my AS (
        |  SELECT CAST(coalesce(sum(ty * (ty - 1)), 0) AS BIGINT) AS t1y
        |  FROM (SELECT CAST(sum(c) AS BIGINT) AS ty
        |    FROM cells GROUP BY vb)),
        |tt AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cells)
        |SELECT
        |  round(CAST(cc - dd AS DOUBLE) * 2 /
        |    (sqrt(CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1) - t1x) *
        |     sqrt(CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1) - t1y)),
        |    6) AS tau_b,
        |  cc, dd, nn AS n
        |FROM pairs, mx, my, tt""".stripMargin,

    "q157_friedman" ->
      """WITH cells0 AS (
        |  SELECT hour(ts) AS blk, event_type,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |cells AS (
        |  SELECT * FROM cells0
        |  WHERE blk IS NOT NULL AND event_type IS NOT NULL
        |    AND v IS NOT NULL),
        |r AS (
        |  SELECT event_type,
        |    CAST(rank() OVER (PARTITION BY blk ORDER BY v) AS DOUBLE) +
        |      (CAST(count(*) OVER (PARTITION BY blk, v) AS DOUBLE)
        |        - 1.0) / 2.0 AS r
        |  FROM cells),
        |tt AS (
        |  SELECT CAST(coalesce(sum(c * c * c - c), 0) AS DOUBLE)
        |    AS tie_t
        |  FROM (SELECT count(*) AS c FROM cells GROUP BY blk, v)),
        |g AS (SELECT event_type, sum(r) AS rs FROM r GROUP BY 1),
        |a AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS k, sum(rs * rs) AS s2
        |  FROM g),
        |nn AS (
        |  SELECT CAST(count(DISTINCT blk) AS DOUBLE) AS n FROM cells),
        |f AS (
        |  SELECT (12.0 / (n * k * (k + 1)) * s2 - 3.0 * n * (k + 1)) /
        |    (1.0 - tie_t / (n * k * (k * k - 1))) AS chi2, k
        |  FROM a, nn, tt)
        |SELECT round(chi2, 6) AS chi2_stat,
        |  CAST(k - 1 AS BIGINT) AS dof,
        |  round(exp(-chi2 / 2) * (1 + chi2 / 2), 6) AS p_value
        |FROM f""".stripMargin,

    "q158_page_trend" -> {
      val phi = graft.stats.Distributions.normalCdfSql("z")
      s"""WITH cells0 AS (
         |  SELECT hour(ts) AS blk, event_type,
         |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         |      AS v
         |  FROM events GROUP BY 1, 2),
         |cells AS (
         |  SELECT * FROM cells0
         |  WHERE blk IS NOT NULL AND event_type IS NOT NULL
         |    AND v IS NOT NULL),
         |r AS (
         |  SELECT event_type,
         |    CAST(rank() OVER (PARTITION BY blk ORDER BY v) AS DOUBLE) +
         |      (CAST(count(*) OVER (PARTITION BY blk, v) AS DOUBLE)
         |        - 1.0) / 2.0 AS r
         |  FROM cells),
         |g AS (SELECT event_type, sum(r) AS rs FROM r GROUP BY 1),
         |a AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS k,
         |    sum(CAST(CASE event_type WHEN 'click' THEN 1
         |      WHEN 'error' THEN 2 WHEN 'purchase' THEN 3
         |      WHEN 'signup' THEN 4 ELSE 5 END AS DOUBLE) * rs)
         |      AS l_stat
         |  FROM g),
         |nn AS (
         |  SELECT CAST(count(DISTINCT blk) AS DOUBLE) AS n FROM cells),
         |zz AS (
         |  SELECT l_stat,
         |    (l_stat - n * k * (k + 1) * (k + 1) / 4) /
         |      sqrt(n * k * k * (k + 1) * (k * k - 1) / 144) AS z
         |  FROM a, nn)
         |SELECT round(l_stat, 6) AS l_stat, round(z, 6) AS z,
         |  round(1.0 - $phi, 6) AS p_value
         |FROM zz""".stripMargin
    },

    "q161_benford" -> {
      val expCase = (1 to 9).map(dd =>
        s"WHEN $dd THEN ${math.log10(1.0 + 1.0 / dd)}").mkString(" ")
      s"""WITH v AS (
         |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
         |  FROM lineitem
         |  WHERE l_extendedprice IS NOT NULL
         |    AND CAST(round(l_extendedprice * 100) AS BIGINT) > 0),
         |d AS (
         |  SELECT CAST(substr(CAST(pc AS VARCHAR), 1, 1) AS INTEGER)
         |    AS digit, count(*) AS n
         |  FROM v GROUP BY 1),
         |tt AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM d),
         |sp AS (
         |  SELECT CAST(gs.g AS INTEGER) AS digit,
         |    coalesce(d.n, 0) AS n, total,
         |    coalesce(d.n, 0) / total AS obs_p,
         |    CASE CAST(gs.g AS INTEGER) $expCase END AS exp_p
         |  FROM range(1, 10) gs(g) CROSS JOIN tt
         |  LEFT JOIN d ON d.digit = CAST(gs.g AS INTEGER)),
         |s AS (
         |  SELECT
         |    sum(total * (obs_p - exp_p) * (obs_p - exp_p) / exp_p)
         |      AS chi2,
         |    sum(abs(obs_p - exp_p)) / 9.0 AS mad
         |  FROM sp)
         |SELECT digit, n, round(obs_p, 6) AS obs_p,
         |  round(exp_p, 6) AS exp_p, round(chi2, 6) AS chi2_stat,
         |  round(mad, 6) AS mad
         |FROM sp CROSS JOIN s""".stripMargin
    },

    "q125_sssp" ->
      """WITH RECURSIVE nn AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS id, n_regionkey AS r
        |  FROM nation),
        |e AS (
        |  SELECT a.id AS src, b.id AS dst,
        |    CAST(1 + (a.id + b.id) % 3 AS DOUBLE) AS w
        |  FROM nn a JOIN nn b ON a.r = b.r AND a.id <> b.id),
        |walk(id, dist, hops) AS (
        |  SELECT CAST(0 AS BIGINT) AS id, CAST(0 AS DOUBLE) AS dist,
        |    0 AS hops
        |  UNION
        |  SELECT e.dst, w.dist + e.w, w.hops + 1
        |  FROM walk w JOIN e ON e.src = w.id WHERE w.hops < 5),
        |md AS (SELECT id, min(dist) AS dist FROM walk GROUP BY 1)
        |SELECT v.id, md.dist
        |FROM nn v LEFT JOIN md USING (id)""".stripMargin,

    "q127_decompose" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, bucket, v,
        |    row_number() OVER pk - 1 AS rn,
        |    CASE WHEN count(v) OVER wa = 24 AND count(v) OVER wb = 24
        |      THEN (avg(v) OVER wa + avg(v) OVER wb) / 2 END AS trend
        |  FROM hourly
        |  WINDOW
        |    pk AS (PARTITION BY event_type ORDER BY bucket),
        |    wa AS (PARTITION BY event_type ORDER BY bucket
        |      ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING),
        |    wb AS (PARTITION BY event_type ORDER BY bucket
        |      ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)),
        |ph AS (SELECT *, rn % 24 AS phase FROM w),
        |raws AS (
        |  SELECT event_type, phase, avg(v - trend) AS rs
        |  FROM ph WHERE trend IS NOT NULL GROUP BY 1, 2),
        |ms AS (SELECT event_type, avg(rs) AS m FROM raws GROUP BY 1),
        |seas AS (
        |  SELECT r.event_type, r.phase, r.rs - ms.m AS seasonal
        |  FROM raws r JOIN ms USING (event_type))
        |SELECT p.event_type, p.bucket,
        |  round(p.trend, 6) AS trend,
        |  round(s.seasonal, 6) AS seasonal,
        |  round(p.v - p.trend - s.seasonal, 6) AS resid
        |FROM ph p LEFT JOIN seas s
        |  ON p.event_type = s.event_type AND p.phase = s.phase""".stripMargin,

    "q318_ig_screen" -> {
      def block(fexpr: String, fname: String) =
        s"""SELECT '$fname' AS feature, round(h_y, 6) AS h_y,
           |  round(h_y_given_x, 6) AS h_y_given_x,
           |  round(h_y - h_y_given_x, 6) AS info_gain,
           |  round(CASE WHEN h_y > 0
           |    THEN (h_y - h_y_given_x) / h_y ELSE 0.0 END, 6)
           |    AS uncertainty_coef
           |FROM (
           |  SELECT
           |    (SELECT -sum(nyv / n * ln(nyv / n)) FROM
           |      (SELECT event_type, sum(c) AS nyv FROM cells_$fname
           |       GROUP BY 1) yv,
           |      (SELECT sum(c) AS n FROM cells_$fname) nt) AS h_y,
           |    (SELECT -sum(c / n * ln(c / nxv)) FROM cells_$fname
           |      JOIN (SELECT fx, sum(c) AS nxv FROM cells_$fname
           |            GROUP BY 1) xv USING (fx),
           |      (SELECT sum(c) AS n FROM cells_$fname) nt) AS h_y_given_x
           |)""".stripMargin
      s"""WITH base AS (
         |  SELECT event_type, user_id % 5 AS ub, hour(ts) AS hod,
         |    CAST(value >= 50.0 AS BIGINT) AS hv
         |  FROM events
         |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
         |    AND value IS NOT NULL),
         |cells_ub AS (
         |  SELECT ub AS fx, event_type, CAST(count(*) AS DOUBLE) AS c
         |  FROM base WHERE ub IS NOT NULL GROUP BY 1, 2),
         |cells_hod AS (
         |  SELECT hod AS fx, event_type, CAST(count(*) AS DOUBLE) AS c
         |  FROM base WHERE hod IS NOT NULL GROUP BY 1, 2),
         |cells_hv AS (
         |  SELECT hv AS fx, event_type, CAST(count(*) AS DOUBLE) AS c
         |  FROM base WHERE hv IS NOT NULL GROUP BY 1, 2)
         |SELECT * FROM (
         |${block("ub", "ub")}
         |UNION ALL
         |${block("hod", "hod")}
         |UNION ALL
         |${block("hv", "hv")})
         |ORDER BY uncertainty_coef DESC, feature""".stripMargin
    },

    "q317_weighted_mean_se" ->
      """WITH c AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(l_linenumber AS BIGINT) AS w
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_linenumber IS NOT NULL
        |    AND l_linenumber > 0),
        |s AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(w) AS DOUBLE) AS sw,
        |    CAST(sum(w * x) AS DOUBLE) AS swx,
        |    CAST(sum(w * w) AS DOUBLE) AS sww,
        |    CAST(sum(w * w * x) AS DOUBLE) AS swwx,
        |    CAST(sum(w * w * x * x) AS DOUBLE) AS swwxx
        |  FROM c),
        |f AS (
        |  SELECT n, sw, sww, swx / sw AS m,
        |    swwxx - 2.0 * (swx / sw) * swwx +
        |      (swx / sw) * (swx / sw) * sww AS lin
        |  FROM s)
        |SELECT CAST(n AS BIGINT) AS n, round(m, 6) AS weighted_mean,
        |  round(sqrt(greatest(0.0, lin)) / sw, 6) AS se,
        |  round(sw * sw / sww, 6) AS n_eff
        |FROM f""".stripMargin,

    "q316_info_gain" ->
      """WITH p AS (
        |  SELECT user_id % 5 AS ub, event_type FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |cells AS (
        |  SELECT ub, event_type, CAST(count(*) AS DOUBLE) AS c
        |  FROM p GROUP BY 1, 2),
        |nt AS (SELECT sum(c) AS n FROM cells),
        |nx AS (SELECT ub, sum(c) AS nxv FROM cells GROUP BY 1),
        |ny AS (SELECT event_type, sum(c) AS nyv FROM cells GROUP BY 1),
        |hy AS (
        |  SELECT -sum(nyv / n * ln(nyv / n)) AS h_y FROM ny, nt),
        |hc AS (
        |  SELECT -sum(c / n * ln(c / nxv)) AS h_y_given_x
        |  FROM cells JOIN nx USING (ub), nt)
        |SELECT round(h_y, 6) AS h_y,
        |  round(h_y_given_x, 6) AS h_y_given_x,
        |  round(h_y - h_y_given_x, 6) AS info_gain,
        |  round(CASE WHEN h_y > 0
        |    THEN (h_y - h_y_given_x) / h_y ELSE 0.0 END, 6)
        |    AS uncertainty_coef
        |FROM hy, hc""".stripMargin,

    "q314_trend_forecast" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS b,
        |    CAST(sum(CAST(round(value) AS BIGINT)) AS DOUBLE) AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |ix AS (
        |  SELECT event_type,
        |    CAST(CAST(epoch(b) / 3600 AS BIGINT) - 438288 AS DOUBLE)
        |      AS x, v
        |  FROM hourly),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |    sum(x) AS sx, sum(v) AS sy, sum(x * x) AS sxx,
        |    sum(x * v) AS sxy, max(x) AS tmax
        |  FROM ix GROUP BY 1),
        |f AS (
        |  SELECT event_type, n, sx, sy, tmax,
        |    CASE WHEN n > 1 AND n * sxx - sx * sx <> 0
        |      THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS b
        |  FROM g),
        |f2 AS (
        |  SELECT event_type, tmax, b, (sy - b * sx) / n AS a FROM f)
        |SELECT event_type, CAST(h AS BIGINT) AS h,
        |  round(a + b * (tmax + CAST(h AS DOUBLE)), 6) AS forecast
        |FROM f2 CROSS JOIN (SELECT unnest([1, 2, 3]) AS h) hs
        |ORDER BY event_type, h""".stripMargin,

    "q315_fano" ->
      """WITH c AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hb,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS DOUBLE) AS k,
        |    CAST(sum(c) AS DOUBLE) AS s1,
        |    CAST(sum(c * c) AS DOUBLE) AS s2
        |  FROM c GROUP BY 1)
        |SELECT event_type, CAST(k AS BIGINT) AS n_buckets,
        |  round(s1 / k, 6) AS mean_count,
        |  round(((s2 - s1 * s1 / k) / (k - 1)) / (s1 / k), 6) AS fano
        |FROM g WHERE k > 1 ORDER BY event_type""".stripMargin,

    "q312_damped_holt" ->
      """WITH RECURSIVE hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS b,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |base AS (
        |  SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY b) AS rn
        |  FROM hourly),
        |r AS (
        |  SELECT event_type, rn, v AS level, CAST(0.0 AS DOUBLE) AS trend
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.event_type, b.rn,
        |    CASE WHEN b.rn = 2
        |      THEN 0.4 * b.v + (1.0 - 0.4) *
        |        (r.level + 0.8 * (b.v - r.level))
        |      ELSE 0.4 * b.v + (1.0 - 0.4) *
        |        (r.level + 0.8 * r.trend) END,
        |    CASE WHEN b.rn = 2
        |      THEN 0.3 * ((0.4 * b.v + (1.0 - 0.4) *
        |          (r.level + 0.8 * (b.v - r.level))) - r.level) +
        |        (1.0 - 0.3) * 0.8 * (b.v - r.level)
        |      ELSE 0.3 * ((0.4 * b.v + (1.0 - 0.4) *
        |          (r.level + 0.8 * r.trend)) - r.level) +
        |        (1.0 - 0.3) * 0.8 * r.trend END
        |  FROM base b JOIN r
        |    ON b.event_type = r.event_type AND b.rn = r.rn + 1),
        |lastr AS (
        |  SELECT event_type, level, trend,
        |    row_number() OVER (PARTITION BY event_type ORDER BY rn DESC)
        |      AS rr
        |  FROM r),
        |fin AS (SELECT event_type, level, trend FROM lastr WHERE rr = 1)
        |SELECT event_type, CAST(h AS BIGINT) AS h,
        |  round(level + 0.8 * (1.0 - power(0.8, CAST(h AS DOUBLE))) /
        |    (1.0 - 0.8) * trend, 6) AS forecast
        |FROM fin CROSS JOIN (SELECT unnest([1, 2, 3]) AS h) hs
        |ORDER BY event_type, h""".stripMargin,

    "q313_modified_z" ->
      """WITH c AS (
        |  SELECT CAST(round(l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |m AS (
        |  SELECT quantile_cont(CAST(y AS DOUBLE), 0.5) AS med FROM c),
        |d AS (SELECT CAST(y AS DOUBLE) AS yd, med FROM c, m),
        |md AS (
        |  SELECT quantile_cont(abs(yd - med), 0.5) AS mad FROM d),
        |z AS (
        |  SELECT yd, med, mad,
        |    CASE WHEN mad > 0
        |      THEN round(0.6745 * (yd - med) / mad, 6) END AS mod_z
        |  FROM d, md),
        |f AS (
        |  SELECT mod_z,
        |    CASE WHEN mad > 0 THEN abs(mod_z) > 3.5
        |      ELSE yd <> med END AS outlier
        |  FROM z)
        |SELECT outlier, CAST(count(*) AS BIGINT) AS n,
        |  round(min(mod_z), 6) AS min_z, round(max(mod_z), 6) AS max_z
        |FROM f GROUP BY 1 ORDER BY outlier""".stripMargin,

    "q339_krippendorff" ->
      """WITH ratings AS (
        |  SELECT user_id AS u, event_type AS r,
        |    CAST(floor(avg(CAST(round(value * 100) AS BIGINT))
        |      / 2500.0) AS BIGINT) AS c
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |    AND user_id IS NOT NULL
        |  GROUP BY 1, 2),
        |mu AS (SELECT u, count(*) AS m FROM ratings GROUP BY 1
        |  HAVING count(*) >= 2),
        |rr AS (SELECT ratings.*, m FROM ratings JOIN mu USING (u)),
        |o AS (
        |  SELECT a.c AS c1, b.c AS c2,
        |    sum(1.0 / (a.m - 1)) AS o
        |  FROM rr a JOIN rr b ON a.u = b.u AND a.r <> b.r
        |  GROUP BY 1, 2),
        |nn AS (SELECT sum(o) AS n FROM o),
        |dis AS (SELECT coalesce(sum(CASE WHEN c1 <> c2 THEN o END),
        |  0.0) AS dis FROM o),
        |sq AS (SELECT coalesce(sum(nc * nc), 0.0) AS sq
        |  FROM (SELECT c1, sum(o) AS nc FROM o GROUP BY 1))
        |SELECT CAST(nn.n AS DOUBLE) AS n_ratings,
        |  round(dis / nn.n, 6) AS d_o,
        |  round((nn.n * nn.n - sq) / (nn.n * (nn.n - 1)), 6) AS d_e,
        |  round(CASE WHEN nn.n * nn.n - sq = 0 THEN 1.0
        |    ELSE 1.0 - (dis / nn.n) /
        |      ((nn.n * nn.n - sq) / (nn.n * (nn.n - 1))) END, 6)
        |    AS alpha
        |FROM nn, dis, sq""".stripMargin,

    "q341_krippendorff_interval" ->
      """WITH ratings AS (
        |  SELECT user_id AS u, event_type AS r,
        |    CAST(CAST(floor(avg(CAST(round(value * 100) AS BIGINT))
        |      / 2500.0) AS BIGINT) AS DOUBLE) AS c
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |    AND user_id IS NOT NULL
        |  GROUP BY 1, 2),
        |mu AS (SELECT u, count(*) AS m FROM ratings GROUP BY 1
        |  HAVING count(*) >= 2),
        |rr AS (SELECT ratings.*, m FROM ratings JOIN mu USING (u)),
        |o AS (
        |  SELECT a.c AS c1, b.c AS c2,
        |    sum(1.0 / (a.m - 1)) AS o
        |  FROM rr a JOIN rr b ON a.u = b.u AND a.r <> b.r
        |  GROUP BY 1, 2),
        |nn AS (SELECT sum(o) AS n FROM o),
        |dis AS (SELECT coalesce(sum(o * (c1 - c2) * (c1 - c2)),
        |  0.0) AS dis FROM o),
        |st AS (SELECT coalesce(sum(nc), 0.0) AS s0,
        |    coalesce(sum(nc * v), 0.0) AS s1,
        |    coalesce(sum(nc * v * v), 0.0) AS s2
        |  FROM (SELECT c1 AS v, sum(o) AS nc FROM o GROUP BY 1))
        |SELECT CAST(nn.n AS DOUBLE) AS n_ratings,
        |  round(dis / nn.n, 6) AS d_o,
        |  round((2.0 * s0 * s2 - 2.0 * s1 * s1) /
        |    (nn.n * (nn.n - 1)), 6) AS d_e,
        |  round(CASE WHEN 2.0 * s0 * s2 - 2.0 * s1 * s1 = 0 THEN 1.0
        |    ELSE 1.0 - (dis / nn.n) /
        |      ((2.0 * s0 * s2 - 2.0 * s1 * s1) /
        |        (nn.n * (nn.n - 1))) END, 6) AS alpha
        |FROM nn, dis, st""".stripMargin,

    // AutoArima selection twin: regenerate the noisy planted series,
    // replay ALL THREE grid candidates (ridge Cramer OLS + SSE +
    // Gaussian AICc), argmin-select, forecast with the winner
    "q342_auto_arima_perkey" ->
      """WITH RECURSIVE n0 AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS nk,
        |    CAST(1 + n_nationkey % 3 AS DOUBLE) AS c
        |  FROM nation),
        |n1 AS (
        |  SELECT nk, c,
        |    list_transform(range(0, 12), t -> CAST(5 + CAST(list_sum(
        |      list_transform(range(1, 5), i ->
        |        (strpos('0123456789abcdef', substr(md5(
        |           CAST(nk AS VARCHAR) || '-' || CAST(t AS VARCHAR)
        |             || 'sar6'), i, 1)) - 1)
        |        * power(16, 4 - i))) AS BIGINT) % 20 AS DOUBLE))
        |      AS seeds
        |  FROM n0),
        |gen AS (
        |  SELECT nk, c, 11 AS t, seeds AS ys FROM n1
        |  UNION ALL
        |  SELECT nk, c, t + 1,
        |    list_append(ys, c + CAST(0.55 AS DOUBLE) * ys[len(ys)]
        |      + CAST(0.35 AS DOUBLE) * ys[len(ys) - 11]
        |      + (CAST(CAST(list_sum(list_transform(range(1, 5), i ->
        |          (strpos('0123456789abcdef', substr(md5(
        |             CAST(nk AS VARCHAR) || '-' ||
        |             CAST(t + 1 AS VARCHAR) || 'nz'), i, 1)) - 1)
        |          * power(16, 4 - i))) AS BIGINT) % 1000 AS DOUBLE)
        |        / CAST(1000.0 AS DOUBLE) - CAST(0.5 AS DOUBLE)))
        |  FROM gen WHERE t < 59),
        |f0 AS (SELECT nk, ys FROM gen WHERE t = 59),
        |fa AS (
        |  SELECT nk, ys,
        |    list_sum(list_transform(range(13, 61), i -> ys[i - 1]))
        |      AS s1,
        |    list_sum(list_transform(range(13, 61), i -> ys[i - 12]))
        |      AS s2,
        |    list_sum(list_transform(range(13, 61), i -> ys[i])) AS sy,
        |    list_sum(list_transform(range(13, 61),
        |      i -> ys[i - 1] * ys[i - 1])) AS s11,
        |    list_sum(list_transform(range(13, 61),
        |      i -> ys[i - 1] * ys[i - 12])) AS s12,
        |    list_sum(list_transform(range(13, 61),
        |      i -> ys[i - 12] * ys[i - 12])) AS s22,
        |    list_sum(list_transform(range(13, 61),
        |      i -> ys[i - 1] * ys[i])) AS s1y,
        |    list_sum(list_transform(range(13, 61),
        |      i -> ys[i - 12] * ys[i])) AS s2y,
        |    list_sum(list_transform(range(9, 61), i -> ys[i - 1]))
        |      AS b1,
        |    list_sum(list_transform(range(9, 61), i -> ys[i]))
        |      AS by_,
        |    list_sum(list_transform(range(9, 61),
        |      i -> ys[i - 1] * ys[i - 1])) AS b11,
        |    list_sum(list_transform(range(9, 61),
        |      i -> ys[i - 1] * ys[i])) AS b1y
        |  FROM f0),
        |sa AS (
        |  SELECT nk, ys, b1, by_, b11, b1y,
        |    (48.0 + lamA) AS a00, s1 AS a01, s2 AS a02,
        |    (s11 + lamA) AS a11, s12 AS a12, (s22 + lamA) AS a22,
        |    sy, s1y, s2y,
        |    1e-8 * ((52.0 + b11)) / 2 AS lamB
        |  FROM (SELECT *, 1e-8 * ((48.0 + s11) + s22) / 3 AS lamA
        |        FROM fa)),
        |ca AS (
        |  SELECT nk, ys, b1, by_, b11, b1y, lamB,
        |    (sy * (a11 * a22 - a12 * a12)
        |      - a01 * (s1y * a22 - a12 * s2y)
        |      + a02 * (s1y * a12 - a11 * s2y)) /
        |    (a00 * (a11 * a22 - a12 * a12)
        |      - a01 * (a01 * a22 - a12 * a02)
        |      + a02 * (a01 * a12 - a11 * a02)) AS ci,
        |    (a00 * (s1y * a22 - a12 * s2y)
        |      - sy * (a01 * a22 - a12 * a02)
        |      + a02 * (a01 * s2y - s1y * a02)) /
        |    (a00 * (a11 * a22 - a12 * a12)
        |      - a01 * (a01 * a22 - a12 * a02)
        |      + a02 * (a01 * a12 - a11 * a02)) AS phiA,
        |    (a00 * (a11 * s2y - s1y * a12)
        |      - a01 * (a01 * s2y - s1y * a02)
        |      + sy * (a01 * a12 - a11 * a02)) /
        |    (a00 * (a11 * a22 - a12 * a12)
        |      - a01 * (a01 * a22 - a12 * a02)
        |      + a02 * (a01 * a12 - a11 * a02)) AS sarA
        |  FROM sa),
        |cb AS (
        |  SELECT nk, ys, ci, phiA, sarA,
        |    (by_ * (b11 + lamB) - b1 * b1y) /
        |      ((52.0 + lamB) * (b11 + lamB) - b1 * b1) AS cB,
        |    ((52.0 + lamB) * b1y - b1 * by_) /
        |      ((52.0 + lamB) * (b11 + lamB) - b1 * b1) AS phiB
        |  FROM ca),
        |fc0 AS (
        |  SELECT nk, ys, ci, phiA, sarA, cB, phiB,
        |    list_sum(list_transform(range(13, 61), i -> ys[i - 12]))
        |      AS c2,
        |    list_sum(list_transform(range(13, 61), i -> ys[i]))
        |      AS cy,
        |    list_sum(list_transform(range(13, 61),
        |      i -> ys[i - 12] * ys[i - 12])) AS c22,
        |    list_sum(list_transform(range(13, 61),
        |      i -> ys[i - 12] * ys[i])) AS c2y
        |  FROM cb),
        |cc AS (
        |  SELECT nk, ys, ci, phiA, sarA, cB, phiB,
        |    (cy * (c22 + lamC) - c2 * c2y) /
        |      ((48.0 + lamC) * (c22 + lamC) - c2 * c2) AS cC,
        |    ((48.0 + lamC) * c2y - c2 * cy) /
        |      ((48.0 + lamC) * (c22 + lamC) - c2 * c2) AS sarC
        |  FROM (SELECT *, 1e-8 * ((48.0 + c22)) / 2 AS lamC
        |        FROM fc0)),
        |sse AS (
        |  SELECT nk, ys, ci, phiA, sarA, cB, phiB, cC, sarC,
        |    list_sum(list_transform(range(13, 61), i ->
        |      (ys[i] - (ci + phiA * ys[i - 1] + sarA * ys[i - 12])) *
        |      (ys[i] - (ci + phiA * ys[i - 1] + sarA * ys[i - 12]))))
        |      AS sseA,
        |    list_sum(list_transform(range(9, 61), i ->
        |      (ys[i] - (cB + phiB * ys[i - 1])) *
        |      (ys[i] - (cB + phiB * ys[i - 1])))) AS sseB,
        |    list_sum(list_transform(range(13, 61), i ->
        |      (ys[i] - (cC + sarC * ys[i - 12])) *
        |      (ys[i] - (cC + sarC * ys[i - 12])))) AS sseC
        |  FROM cc),
        |win AS (
        |  SELECT nk, ys, ci, phiA, sarA, cB, phiB, cC, sarC,
        |    CASE WHEN aB <= aA AND aB <= aC THEN 'B'
        |         WHEN aC <= aA THEN 'C' ELSE 'A' END AS w
        |  FROM (SELECT *,
        |    48.0 * (ln(2 * pi()) + ln(sseA / 48.0) + 1.0) + 6.0
        |      + 24.0 / 44.0 AS aA,
        |    52.0 * (ln(2 * pi()) + ln(sseB / 52.0) + 1.0) + 4.0
        |      + 12.0 / 49.0 AS aB,
        |    48.0 * (ln(2 * pi()) + ln(sseC / 48.0) + 1.0) + 4.0
        |      + 12.0 / 45.0 AS aC
        |    FROM sse)),
        |fwd AS (
        |  SELECT nk, 0 AS h, ys[60] AS fv, ci, phiA, sarA, cB, phiB,
        |    cC, sarC, w, ys
        |  FROM win
        |  UNION ALL
        |  SELECT nk, h + 1,
        |    CASE w WHEN 'A' THEN ci + phiA * fv + sarA * ys[49 + h]
        |           WHEN 'B' THEN cB + phiB * fv
        |           ELSE cC + sarC * ys[49 + h] END,
        |    ci, phiA, sarA, cB, phiB, cC, sarC, w, ys
        |  FROM fwd WHERE h < 4)
        |SELECT nk AS n_nationkey, CAST(h AS BIGINT) AS h,
        |  fv AS forecast,
        |  CAST(CASE w WHEN 'C' THEN 0 ELSE 1 END AS BIGINT) AS p,
        |  CAST(CASE w WHEN 'B' THEN 0 ELSE 1 END AS BIGINT) AS sp
        |FROM fwd WHERE h >= 1""".stripMargin,

    // planted seasonal-AR twin: regenerate the bit-identical series,
    // replay the ridge-regularized 3-parameter joint OLS by Cramer's
    // rule (lam mirrors olsFit's 1e-8 * trace / d exactly), then the
    // forecast recurrence in a recursive CTE
    "q335_sarima_twin" ->
      """WITH RECURSIVE n0 AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS nk,
        |    CAST(1 + n_nationkey % 3 AS DOUBLE) AS c
        |  FROM nation),
        |n1 AS (
        |  SELECT nk, c,
        |    list_transform(range(0, 12), t -> CAST(5 + CAST(list_sum(
        |      list_transform(range(1, 5), i ->
        |        (strpos('0123456789abcdef', substr(md5(
        |           CAST(nk AS VARCHAR) || '-' || CAST(t AS VARCHAR)
        |             || 'sar6'), i, 1)) - 1)
        |        * power(16, 4 - i))) AS BIGINT) % 20 AS DOUBLE))
        |      AS seeds
        |  FROM n0),
        |gen AS (
        |  SELECT nk, c, 11 AS t, seeds AS ys FROM n1
        |  UNION ALL
        |  SELECT nk, c, t + 1,
        |    list_append(ys, c + CAST(0.6 AS DOUBLE) * ys[len(ys)]
        |      + CAST(0.3 AS DOUBLE) * ys[len(ys) - 11])
        |  FROM gen WHERE t < 59),
        |fit AS (
        |  SELECT nk, c, ys,
        |    list_sum(list_transform(range(13, 61),
        |      i -> ys[i - 1])) AS s1,
        |    list_sum(list_transform(range(13, 61),
        |      i -> ys[i - 12])) AS s2,
        |    list_sum(list_transform(range(13, 61),
        |      i -> ys[i])) AS sy,
        |    list_sum(list_transform(range(13, 61),
        |      i -> ys[i - 1] * ys[i - 1])) AS s11,
        |    list_sum(list_transform(range(13, 61),
        |      i -> ys[i - 1] * ys[i - 12])) AS s12,
        |    list_sum(list_transform(range(13, 61),
        |      i -> ys[i - 12] * ys[i - 12])) AS s22,
        |    list_sum(list_transform(range(13, 61),
        |      i -> ys[i - 1] * ys[i])) AS s1y,
        |    list_sum(list_transform(range(13, 61),
        |      i -> ys[i - 12] * ys[i])) AS s2y
        |  FROM gen WHERE t = 59),
        |rdg AS (
        |  SELECT *, 1e-8 * ((48.0 + s11) + s22) / 3 AS lam FROM fit),
        |sol AS (
        |  SELECT nk, ys,
        |    (48.0 + lam) AS a00, s1 AS a01, s2 AS a02,
        |    (s11 + lam) AS a11, s12 AS a12, (s22 + lam) AS a22,
        |    sy, s1y, s2y
        |  FROM rdg),
        |coef AS (
        |  SELECT nk, ys,
        |    (a00 * (a11 * a22 - a12 * a12)
        |      - a01 * (a01 * a22 - a12 * a02)
        |      + a02 * (a01 * a12 - a11 * a02)) AS det,
        |    (sy * (a11 * a22 - a12 * a12)
        |      - a01 * (s1y * a22 - a12 * s2y)
        |      + a02 * (s1y * a12 - a11 * s2y)) AS detc,
        |    (a00 * (s1y * a22 - a12 * s2y)
        |      - sy * (a01 * a22 - a12 * a02)
        |      + a02 * (a01 * s2y - s1y * a02)) AS detp,
        |    (a00 * (a11 * s2y - s1y * a12)
        |      - a01 * (a01 * s2y - s1y * a02)
        |      + sy * (a01 * a12 - a11 * a02)) AS dets
        |  FROM sol),
        |ch AS (
        |  SELECT nk, ys, detc / det AS c_hat, detp / det AS phi_hat,
        |    dets / det AS sar_hat
        |  FROM coef),
        |f AS (
        |  SELECT nk, 0 AS h, ys[60] AS fv, c_hat, phi_hat, sar_hat,
        |    ys
        |  FROM ch
        |  UNION ALL
        |  SELECT nk, h + 1,
        |    c_hat + phi_hat * fv + sar_hat * ys[49 + h],
        |    c_hat, phi_hat, sar_hat, ys
        |  FROM f WHERE h < 6)
        |SELECT nk AS n_nationkey, CAST(h AS BIGINT) AS h,
        |  fv AS forecast
        |FROM f WHERE h >= 1""".stripMargin,

    // Kalman replay: the forward CTE walks rn ascending carrying
    // (x, p) through the predict/gain/update recurrence with every
    // compound term written EXACTLY as the Scala fold computes it
    // (each k reference recomputes the same division — IEEE
    // deterministic, so bit-equal, no rounding); the backward CTE
    // walks rn descending from nmax replaying the RTS pass over the
    // MATERIALIZED filter states.
    "q343_kalman" ->
      """WITH RECURSIVE hourly AS MATERIALIZED (
        |  SELECT event_type, date_trunc('hour', ts) AS b,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |base AS MATERIALIZED (
        |  SELECT event_type, b, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY b)
        |      AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS nmax
        |  FROM hourly),
        |r AS (
        |  SELECT event_type, b, rn, nmax, v AS x,
        |    CAST(1000.0 AS DOUBLE) AS p
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b2.event_type, b2.b, b2.rn, b2.nmax,
        |    r.x + ((r.p + 25.0) / ((r.p + 25.0) + 400.0)) *
        |      (b2.v - r.x),
        |    (1.0 - ((r.p + 25.0) / ((r.p + 25.0) + 400.0))) *
        |      (r.p + 25.0)
        |  FROM base b2 JOIN r
        |    ON b2.event_type = r.event_type AND b2.rn = r.rn + 1),
        |rf AS MATERIALIZED (SELECT * FROM r),
        |s AS (
        |  SELECT event_type, b, rn, x AS xs, p AS ps
        |  FROM rf WHERE rn = nmax
        |  UNION ALL
        |  SELECT f.event_type, f.b, f.rn,
        |    f.x + (f.p / (f.p + 25.0)) * (s.xs - f.x),
        |    f.p + (f.p / (f.p + 25.0)) * (f.p / (f.p + 25.0)) *
        |      (s.ps - (f.p + 25.0))
        |  FROM rf f JOIN s
        |    ON f.event_type = s.event_type AND f.rn = s.rn - 1)
        |SELECT rf.event_type, rf.b, rf.x AS kf_level, rf.p AS kf_var,
        |  s.xs AS kf_smooth
        |FROM rf JOIN s ON rf.event_type = s.event_type
        |  AND rf.rn = s.rn""".stripMargin,

    // Welch-z TOST replay: exact-integer moment sums + the shared
    // A&S normal CDF polynomial on both one-sided z's
    "q358_tost" -> {
      val phiLo = graft.stats.Distributions.normalCdfSql(
        "(d + 300.0) / se")
      val phiHi = graft.stats.Distributions.normalCdfSql(
        "(d - 300.0) / se")
      s"""WITH base AS (
         |  SELECT CAST(round(value * 100) AS BIGINT) AS y,
         |    (event_type = 'click') AS isa
         |  FROM events
         |  WHERE value IS NOT NULL
         |    AND event_type IN ('click', 'view')),
         |a AS (
         |  SELECT
         |    CAST(sum(CASE WHEN isa THEN y END) AS BIGINT) AS sa,
         |    CAST(sum(CASE WHEN isa THEN 1 END) AS BIGINT) AS na,
         |    CAST(sum(CASE WHEN isa THEN y * y END) AS BIGINT) AS qa,
         |    CAST(sum(CASE WHEN NOT isa THEN y END) AS BIGINT) AS sb,
         |    CAST(sum(CASE WHEN NOT isa THEN 1 END) AS BIGINT) AS nb,
         |    CAST(sum(CASE WHEN NOT isa THEN y * y END) AS BIGINT) AS qb
         |  FROM base),
         |f AS (
         |  SELECT
         |    CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb AS d,
         |    sqrt(
         |      (CAST(qa AS DOUBLE) -
         |        CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / na) /
         |        (na - 1.0) / na +
         |      (CAST(qb AS DOUBLE) -
         |        CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / nb) /
         |        (nb - 1.0) / nb) AS se
         |  FROM a)
         |SELECT round(d, 6) AS mean_diff, round(se, 6) AS se,
         |  round((d + 300.0) / se, 6) AS z_lower,
         |  round((d - 300.0) / se, 6) AS z_upper,
         |  round(greatest(1.0 - $phiLo, $phiHi), 6) AS p_tost
         |FROM f""".stripMargin
    },

    // identical conditional-sum algebra + the shared A&S normal CDF
    "q357_did" -> {
      val phi = graft.stats.Distributions.normalCdfSql("abs(eff / se)")
      s"""WITH base AS (
         |  SELECT CAST(round(value * 100) AS BIGINT) AS y,
         |    (user_id % 2 = 0) AS t, (hour(ts) >= 12) AS p
         |  FROM events
         |  WHERE value IS NOT NULL AND user_id IS NOT NULL
         |    AND ts IS NOT NULL),
         |a AS (
         |  SELECT count(*) AS n, CAST(sum(y * y) AS DOUBLE) AS ssq,
         |    CAST(sum(CASE WHEN NOT t AND NOT p THEN y END) AS BIGINT) AS s00,
         |    CAST(sum(CASE WHEN NOT t AND p THEN y END) AS BIGINT) AS s01,
         |    CAST(sum(CASE WHEN t AND NOT p THEN y END) AS BIGINT) AS s10,
         |    CAST(sum(CASE WHEN t AND p THEN y END) AS BIGINT) AS s11,
         |    CAST(sum(CASE WHEN NOT t AND NOT p THEN 1 END) AS BIGINT) AS n00,
         |    CAST(sum(CASE WHEN NOT t AND p THEN 1 END) AS BIGINT) AS n01,
         |    CAST(sum(CASE WHEN t AND NOT p THEN 1 END) AS BIGINT) AS n10,
         |    CAST(sum(CASE WHEN t AND p THEN 1 END) AS BIGINT) AS n11
         |  FROM base),
         |e AS (
         |  SELECT n, n00, n01, n10, n11,
         |    (CAST(s11 AS DOUBLE) / n11 - CAST(s10 AS DOUBLE) / n10) -
         |    (CAST(s01 AS DOUBLE) / n01 - CAST(s00 AS DOUBLE) / n00)
         |      AS eff,
         |    ssq - (CAST(s00 AS DOUBLE) * CAST(s00 AS DOUBLE) / n00 +
         |      CAST(s01 AS DOUBLE) * CAST(s01 AS DOUBLE) / n01 +
         |      CAST(s10 AS DOUBLE) * CAST(s10 AS DOUBLE) / n10 +
         |      CAST(s11 AS DOUBLE) * CAST(s11 AS DOUBLE) / n11) AS rss
         |  FROM a),
         |f AS (
         |  SELECT n, eff,
         |    sqrt(greatest(0.0, rss / (n - 4.0)) *
         |      (1.0 / n00 + 1.0 / n01 + 1.0 / n10 + 1.0 / n11)) AS se
         |  FROM e)
         |SELECT CAST(n AS BIGINT) AS n, round(eff, 6) AS did_effect,
         |  round(se, 6) AS se, round(eff / se, 6) AS z,
         |  round(2.0 * (1.0 - $phi), 6) AS p_value
         |FROM f""".stripMargin
    },

    // full randomization replay: the same 199 md5-rank permutations,
    // exact-cents group sums (so every d_r is the identical double
    // and no >= comparison can flip on summation ulps)
    "q355_perm_test" ->
      """WITH base AS (
        |  SELECT CAST(event_id AS VARCHAR) AS id,
        |    CAST(round(value * 100) AS BIGINT) AS v,
        |    (event_type = 'click') AS isa
        |  FROM events
        |  WHERE value IS NOT NULL
        |    AND event_type IN ('click', 'view')
        |    AND event_id IS NOT NULL),
        |obs AS (
        |  SELECT CAST(sum(CASE WHEN isa THEN v END) AS DOUBLE) /
        |      CAST(sum(CASE WHEN isa THEN 1 END) AS BIGINT) -
        |    CAST(sum(CASE WHEN NOT isa THEN v END) AS DOUBLE) /
        |      CAST(sum(CASE WHEN NOT isa THEN 1 END) AS BIGINT)
        |      AS obs_diff,
        |    CAST(sum(CASE WHEN isa THEN 1 END) AS BIGINT) AS n1
        |  FROM base),
        |reps AS (SELECT unnest(range(1, 200)) AS rep),
        |hh AS (
        |  SELECT b.id, b.v, r.rep,
        |    list_sum(list_transform(range(1, 13),
        |      i -> (strpos('0123456789abcdef', substr(md5(
        |        b.id || '#perm' || CAST(r.rep AS VARCHAR)), i, 1))
        |        - 1) * power(16, 12 - i))) / 281474976710656.0 AS h
        |  FROM base b CROSS JOIN reps r),
        |lab AS (
        |  SELECT rep, v,
        |    (row_number() OVER (PARTITION BY rep ORDER BY h, id) <=
        |      (SELECT n1 FROM obs)) AS lab
        |  FROM hh),
        |per AS (
        |  SELECT rep,
        |    CAST(sum(CASE WHEN lab THEN v END) AS DOUBLE) /
        |      CAST(sum(CASE WHEN lab THEN 1 END) AS BIGINT) -
        |    CAST(sum(CASE WHEN NOT lab THEN v END) AS DOUBLE) /
        |      CAST(sum(CASE WHEN NOT lab THEN 1 END) AS BIGINT) AS d
        |  FROM lab GROUP BY 1),
        |ge AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_ge
        |  FROM per, obs WHERE abs(per.d) >= abs(obs.obs_diff))
        |SELECT round(obs.obs_diff, 6) AS obs_diff, ge.n_ge,
        |  round((ge.n_ge + 1.0) / 200.0, 6) AS p_value
        |FROM obs, ge""".stripMargin,

    // exact-integer delete-one-group pseudo-values, then the
    // (G-1)/G jackknife moment
    "q356_jackknife" ->
      """WITH base AS (
        |  SELECT event_type AS g,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |tot AS (
        |  SELECT CAST(sum(v) AS BIGINT) AS s_all, count(*) AS n_all
        |  FROM base),
        |per AS (
        |  SELECT g, CAST(t.s_all - sum(v) AS DOUBLE) /
        |    (t.n_all - count(*)) AS theta_g
        |  FROM base, tot t GROUP BY g, t.s_all, t.n_all),
        |gs AS (
        |  SELECT count(*) AS gc, avg(theta_g) AS tb,
        |    sum(theta_g * theta_g) AS ss
        |  FROM per)
        |SELECT CAST(gc AS BIGINT) AS g_count, round(tb, 6) AS theta_bar,
        |  round(sqrt(greatest(0.0, (gc - 1.0) / gc *
        |    (ss - gc * tb * tb))), 6) AS se_jack
        |FROM gs""".stripMargin,

    "q354_holt_backtest" ->
      """WITH RECURSIVE hourly AS MATERIALIZED (
        |  SELECT event_type, date_trunc('hour', ts) AS b,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |base AS MATERIALIZED (
        |  SELECT event_type, b, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY b)
        |      AS rn
        |  FROM hourly),
        |r AS (
        |  SELECT event_type, rn, v, v AS level,
        |    CAST(0.0 AS DOUBLE) AS trend, CAST(NULL AS DOUBLE) AS fc
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b2.event_type, b2.rn, b2.v,
        |    CASE WHEN b2.rn = 2
        |      THEN (0.4 * b2.v + 0.6 * (r.level + (b2.v - r.level)))
        |      ELSE (0.4 * b2.v + 0.6 * (r.level + r.trend)) END,
        |    CASE WHEN b2.rn = 2
        |      THEN (0.3 * ((0.4 * b2.v + 0.6 * (r.level +
        |        (b2.v - r.level))) - r.level) + 0.7 *
        |        (b2.v - r.level))
        |      ELSE (0.3 * ((0.4 * b2.v + 0.6 * (r.level + r.trend))
        |        - r.level) + 0.7 * r.trend) END,
        |    CASE WHEN b2.rn >= 3 THEN r.level + r.trend END
        |  FROM base b2 JOIN r
        |    ON b2.event_type = r.event_type AND b2.rn = r.rn + 1),
        |e AS (
        |  SELECT event_type, v AS y, fc, v - fc AS err
        |  FROM r WHERE fc IS NOT NULL),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval,
        |    avg(abs(err)) AS mae_raw,
        |    sqrt(avg(err * err)) AS rmse_raw,
        |    avg(CASE WHEN abs(y) > 0 THEN abs(err) / abs(y) END)
        |      AS mape_raw,
        |    avg(CASE WHEN abs(y) + abs(fc) > 0
        |      THEN 2.0 * abs(err) / (abs(y) + abs(fc)) END)
        |      AS smape_raw
        |  FROM e GROUP BY 1),
        |nv AS (
        |  SELECT event_type, avg(abs(d)) AS naive_mae FROM (
        |    SELECT event_type, v - lag(v) OVER (
        |      PARTITION BY event_type ORDER BY b) AS d
        |    FROM base) dd
        |  WHERE d IS NOT NULL GROUP BY 1)
        |SELECT m.event_type, m.n_eval,
        |  round(mae_raw, 6) AS mae, round(rmse_raw, 6) AS rmse,
        |  round(mape_raw, 6) AS mape, round(smape_raw, 6) AS smape,
        |  CASE WHEN naive_mae > 0
        |    THEN round(mae_raw / naive_mae, 6) END AS mase
        |FROM m JOIN nv USING (event_type)""".stripMargin,

    "q307_grouped_holt" ->
      """WITH RECURSIVE hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS b,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |base AS (
        |  SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY b) AS rn
        |  FROM hourly),
        |r AS (
        |  SELECT event_type, rn, v AS level, CAST(0.0 AS DOUBLE) AS trend
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.event_type, b.rn,
        |    CASE WHEN b.rn = 2
        |      THEN 0.4 * b.v + (1.0 - 0.4) * (r.level + (b.v - r.level))
        |      ELSE 0.4 * b.v + (1.0 - 0.4) * (r.level + r.trend) END,
        |    CASE WHEN b.rn = 2
        |      THEN 0.3 * ((0.4 * b.v + (1.0 - 0.4) *
        |          (r.level + (b.v - r.level))) - r.level) +
        |        (1.0 - 0.3) * (b.v - r.level)
        |      ELSE 0.3 * ((0.4 * b.v + (1.0 - 0.4) *
        |          (r.level + r.trend)) - r.level) +
        |        (1.0 - 0.3) * r.trend END
        |  FROM base b JOIN r
        |    ON b.event_type = r.event_type AND b.rn = r.rn + 1),
        |lastr AS (
        |  SELECT event_type, level, trend,
        |    row_number() OVER (PARTITION BY event_type ORDER BY rn DESC)
        |      AS rr
        |  FROM r),
        |fin AS (SELECT event_type, level, trend FROM lastr WHERE rr = 1)
        |SELECT event_type, CAST(h AS BIGINT) AS h,
        |  round(level + CAST(h AS DOUBLE) * trend, 6) AS forecast
        |FROM fin CROSS JOIN (SELECT unnest([1, 2, 3]) AS h) hs
        |ORDER BY event_type, h""".stripMargin,

    "q308_merge_indicator" ->
      """WITH c AS (SELECT c_custkey AS custkey FROM customer),
        |o AS (
        |  SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT)
        |    AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT coalesce(c.custkey, o.custkey) AS custkey, o.n_orders,
        |  CASE WHEN c.custkey IS NOT NULL AND o.custkey IS NOT NULL
        |    THEN 'both'
        |    WHEN c.custkey IS NOT NULL THEN 'left_only'
        |    ELSE 'right_only' END AS _merge
        |FROM c FULL JOIN o ON c.custkey = o.custkey
        |ORDER BY custkey""".stripMargin,

    "q300_decompose_mult" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, bucket, v,
        |    row_number() OVER pk - 1 AS rn,
        |    CASE WHEN count(v) OVER wa = 24 AND count(v) OVER wb = 24
        |      THEN (avg(v) OVER wa + avg(v) OVER wb) / 2 END AS trend
        |  FROM hourly
        |  WINDOW
        |    pk AS (PARTITION BY event_type ORDER BY bucket),
        |    wa AS (PARTITION BY event_type ORDER BY bucket
        |      ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING),
        |    wb AS (PARTITION BY event_type ORDER BY bucket
        |      ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)),
        |ph AS (SELECT *, rn % 24 AS phase FROM w),
        |raws AS (
        |  SELECT event_type, phase, avg(v / trend) AS rs
        |  FROM ph WHERE trend IS NOT NULL AND trend <> 0
        |  GROUP BY 1, 2),
        |ms AS (SELECT event_type, avg(rs) AS m FROM raws GROUP BY 1),
        |seas AS (
        |  SELECT r.event_type, r.phase, r.rs / ms.m AS seasonal
        |  FROM raws r JOIN ms USING (event_type))
        |SELECT p.event_type, p.bucket,
        |  round(p.trend, 6) AS trend,
        |  round(s.seasonal, 6) AS seasonal,
        |  round(p.v / (p.trend * s.seasonal), 6) AS resid
        |FROM ph p LEFT JOIN seas s
        |  ON p.event_type = s.event_type AND p.phase = s.phase""".stripMargin,

    "q153_paired_ttest" ->
      """WITH ux AS (
        |  SELECT user_id,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS sx
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |uy AS (
        |  SELECT user_id,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS sy
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |p AS (
        |  SELECT CAST(sx - sy AS DOUBLE) AS dd
        |  FROM ux JOIN uy USING (user_id)),
        |a AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n, sum(dd) AS s1,
        |    sum(dd * dd) AS s2
        |  FROM p)
        |SELECT CAST(n AS BIGINT) AS n,
        |  round(s1 / n, 6) AS mean_diff,
        |  round((s1 / n) / sqrt(((s2 - s1 * s1 / n) / (n - 1)) / n), 6)
        |    AS t_stat,
        |  CAST(n - 1 AS BIGINT) AS dof
        |FROM a""".stripMargin,

    "q151_prop_ztest" -> {
      val phi = graft.stats.Distributions.normalCdfSql("abs(z)")
      s"""WITH a AS (
         |  SELECT
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS DOUBLE) AS na,
         |    CAST(sum(CASE WHEN event_type = 'click' AND value >= 50.0
         |      THEN 1 ELSE 0 END) AS DOUBLE) AS xa,
         |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         |      AS DOUBLE) AS nb,
         |    CAST(sum(CASE WHEN event_type = 'view' AND value >= 50.0
         |      THEN 1 ELSE 0 END) AS DOUBLE) AS xb
         |  FROM events
         |  WHERE event_type IN ('click', 'view')
         |    AND value IS NOT NULL),
         |zt AS (
         |  SELECT xa / na AS pa, xb / nb AS pb, na, nb,
         |    (xa / na - xb / nb) /
         |      sqrt((xa + xb) / (na + nb) * (1 - (xa + xb) / (na + nb))
         |        * (1 / na + 1 / nb)) AS z
         |  FROM a)
         |SELECT round(pa, 6) AS p_a, round(pb, 6) AS p_b,
         |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
         |  round(z, 6) AS z,
         |  round(2.0 * (1.0 - $phi), 6) AS p_value
         |FROM zt""".stripMargin
    },

    "q152_cohens_d" ->
      """WITH g AS (
        |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |    avg(CAST(round(value * 100) AS BIGINT)) AS m,
        |    var_samp(CAST(round(value * 100) AS BIGINT)) AS s2
        |  FROM events
        |  WHERE event_type IN ('purchase', 'click')
        |    AND value IS NOT NULL
        |  GROUP BY 1),
        |w AS (
        |  SELECT a.n AS na, a.m AS ma, a.s2 AS sa,
        |    b.n AS nb, b.m AS mb, b.s2 AS sb
        |  FROM (SELECT * FROM g WHERE event_type = 'purchase') a,
        |       (SELECT * FROM g WHERE event_type = 'click') b)
        |SELECT
        |  round((ma - mb) / sqrt(((na - 1) * sa + (nb - 1) * sb) /
        |    (na + nb - 2)), 6) AS d,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
        |FROM w""".stripMargin,

    "q148_bartlett" ->
      """WITH g AS (
        |  SELECT event_type, CAST(count(*) AS DOUBLE) AS gn,
        |    CAST(sum(vc) AS DOUBLE) AS s1,
        |    CAST(sum(vc * vc) AS DOUBLE) AS s2
        |  FROM (SELECT event_type,
        |      CAST(round(value * 100) AS BIGINT) AS vc
        |    FROM events
        |    WHERE value IS NOT NULL AND event_type IS NOT NULL)
        |  GROUP BY 1),
        |v AS (
        |  SELECT gn, (s2 - s1 * s1 / gn) / (gn - 1) AS vr FROM g),
        |a AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS k, sum(gn) AS nn,
        |    sum((gn - 1) * vr) AS ssw,
        |    sum((gn - 1) * ln(vr)) AS slv,
        |    sum(1.0 / (gn - 1)) AS sinv
        |  FROM v),
        |x AS (
        |  SELECT k,
        |    ((nn - k) * ln(ssw / (nn - k)) - slv) /
        |      (1.0 + (sinv - 1.0 / (nn - k)) / (3.0 * (k - 1))) AS chi2
        |  FROM a)
        |SELECT round(chi2, 6) AS chi2, CAST(k - 1 AS BIGINT) AS dof,
        |  round(exp(-chi2 / 2) * (1 + chi2 / 2), 6) AS p_value
        |FROM x""".stripMargin,

    "q149_levene" ->
      """WITH p AS (
        |  SELECT event_type,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS vc
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |m AS (
        |  SELECT event_type, quantile_cont(vc, 0.5) AS med
        |  FROM p GROUP BY 1),
        |z AS (
        |  SELECT p.event_type, abs(p.vc - m.med) AS z
        |  FROM p JOIN m USING (event_type)),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS DOUBLE) AS gn,
        |    sum(z) AS s1, sum(z * z) AS s2
        |  FROM z GROUP BY 1),
        |a AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS k, sum(gn) AS nn,
        |    sum(s1) AS ts1, sum(s2) AS ts2,
        |    sum(s1 * s1 / gn) AS sgm
        |  FROM g)
        |SELECT
        |  round(((sgm - ts1 * ts1 / nn) / (k - 1)) /
        |    ((ts2 - sgm) / (nn - k)), 6) AS w_stat,
        |  CAST(k - 1 AS BIGINT) AS df_between,
        |  CAST(nn - k AS BIGINT) AS df_within
        |FROM a""".stripMargin,

    "q147_kruskal" ->
      """WITH p AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |r AS (
        |  SELECT event_type,
        |    CAST(rank() OVER (ORDER BY vc) AS DOUBLE) +
        |      (CAST(count(*) OVER (PARTITION BY vc) AS DOUBLE) - 1.0)
        |      / 2.0 AS r
        |  FROM p),
        |t AS (
        |  SELECT CAST(sum(c * c * c - c) AS DOUBLE) AS tie_t
        |  FROM (SELECT count(*) AS c FROM p GROUP BY vc)),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS DOUBLE) AS gn,
        |    sum(r) AS rs
        |  FROM r GROUP BY 1),
        |a AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS k, sum(gn) AS nn,
        |    sum(rs * rs / gn) AS s
        |  FROM g),
        |hh AS (
        |  SELECT k, nn,
        |    (12.0 / (nn * (nn + 1)) * s - 3.0 * (nn + 1)) /
        |      (1.0 - tie_t / (nn * nn * nn - nn)) AS h
        |  FROM a, t)
        |SELECT round(h, 6) AS h_stat, CAST(k - 1 AS BIGINT) AS dof,
        |  round(exp(-h / 2) * (1 + h / 2), 6) AS p_value
        |FROM hh""".stripMargin,

    "q146_wilcoxon" -> {
      val phi = graft.stats.Distributions.normalCdfSql("abs(z)")
      s"""WITH ux AS (
         |  SELECT user_id,
         |    sum(CAST(round(value * 100) AS BIGINT)) AS sx
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
         |uy AS (
         |  SELECT user_id,
         |    sum(CAST(round(value * 100) AS BIGINT)) AS sy
         |  FROM events WHERE event_type = 'click' GROUP BY 1),
         |p AS (
         |  SELECT CAST(sx - sy AS DOUBLE) AS dd
         |  FROM ux JOIN uy USING (user_id) WHERE sx <> sy),
         |r AS (
         |  SELECT dd, CAST(rank() OVER (ORDER BY abs(dd)) AS DOUBLE) +
         |    (CAST(count(*) OVER (PARTITION BY abs(dd)) AS DOUBLE)
         |      - 1.0) / 2.0 AS r
         |  FROM p),
         |t AS (
         |  SELECT CAST(sum(c * c * c - c) AS DOUBLE) AS tie_t
         |  FROM (SELECT count(*) AS c FROM p GROUP BY abs(dd))),
         |a AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n,
         |    sum(CASE WHEN dd > 0 THEN r ELSE 0 END) AS w_plus
         |  FROM r),
         |zt AS (
         |  SELECT n, w_plus,
         |    (w_plus - n * (n + 1) / 4) /
         |      sqrt(n * (n + 1) * (2 * n + 1) / 24 - tie_t / 48) AS z
         |  FROM a, t)
         |SELECT CAST(n AS BIGINT) AS n, round(w_plus, 6) AS w_plus,
         |  round(z, 6) AS z, round(2.0 * (1.0 - $phi), 6) AS p_value
         |FROM zt""".stripMargin
    },

    "q145_ks_test" ->
      """WITH p AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS v, event_type
        |  FROM events
        |  WHERE event_type IN ('purchase', 'click')
        |    AND value IS NOT NULL),
        |c AS (
        |  SELECT v,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS ca,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS cb
        |  FROM p GROUP BY 1),
        |t AS (
        |  SELECT CAST(sum(ca) AS DOUBLE) AS na,
        |    CAST(sum(cb) AS DOUBLE) AS nb
        |  FROM c),
        |e AS (
        |  SELECT v, sum(ca) OVER (ORDER BY v) AS cuma,
        |    sum(cb) OVER (ORDER BY v) AS cumb
        |  FROM c),
        |d AS (
        |  SELECT max(abs(cuma / na - cumb / nb)) AS d_stat,
        |    any_value(na) AS na, any_value(nb) AS nb
        |  FROM e CROSS JOIN t),
        |s AS (
        |  SELECT d_stat, na, nb,
        |    (sqrt(na * nb / (na + nb)) + 0.12 +
        |      0.11 / sqrt(na * nb / (na + nb))) * d_stat AS lam
        |  FROM d),
        |ser AS (
        |  SELECT d_stat, na, nb, any_value(lam) AS lam,
        |    sum(2 * power(-1.0, k - 1) * exp(-2 * k * k * lam * lam))
        |      AS p
        |  FROM s, unnest(range(1, 101)) AS u(k)
        |  GROUP BY d_stat, na, nb)
        |SELECT round(d_stat, 9) AS d_stat,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  round(CASE WHEN lam < 0.03 THEN 1.0
        |    ELSE least(greatest(p, 0), 1) END, 6) AS p_value
        |FROM ser""".stripMargin,

    "q131_divergence" ->
      """WITH f AS (
        |  SELECT lang, source FROM documents
        |  WHERE source IN ('src0', 'src1') AND lang IS NOT NULL),
        |c AS (
        |  SELECT lang,
        |    sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cb
        |  FROM f GROUP BY 1),
        |t AS (
        |  SELECT CAST(sum(ca) AS DOUBLE) AS na,
        |    CAST(sum(cb) AS DOUBLE) AS nb
        |  FROM c),
        |p AS (
        |  SELECT ca, cb, ca / na AS pa, cb / nb AS pb,
        |    (ca / na + cb / nb) / 2.0 AS pm
        |  FROM c CROSS JOIN t)
        |SELECT
        |  round(sum(CASE WHEN ca > 0
        |    THEN pa * ln(pa / pb) ELSE 0 END), 6) AS kl_ab,
        |  round(sum(CASE WHEN cb > 0
        |    THEN pb * ln(pb / pa) ELSE 0 END), 6) AS kl_ba,
        |  round(sum(
        |    CASE WHEN ca > 0 THEN pa * ln(pa / pm) ELSE 0 END * 0.5 +
        |    CASE WHEN cb > 0 THEN pb * ln(pb / pm) ELSE 0 END * 0.5),
        |    6) AS js,
        |  round(-sum(CASE WHEN ca > 0
        |    THEN pa * ln(pa) ELSE 0 END), 6) AS entropy_a,
        |  round(-sum(CASE WHEN cb > 0
        |    THEN pb * ln(pb) ELSE 0 END), 6) AS entropy_b
        |FROM p""".stripMargin,

    "q126_nmi" ->
      """WITH e AS (SELECT event_type, user_id % 5 AS ub FROM events),
        |obs AS (SELECT event_type, ub, count(*) AS nxy FROM e GROUP BY 1, 2),
        |ma AS (SELECT event_type, count(*) AS nx FROM e GROUP BY 1),
        |mb AS (SELECT ub, count(*) AS ny FROM e GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM e),
        |mi AS (
        |  SELECT sum((nxy / nn) * ln((nxy * nn) / (CAST(nx AS DOUBLE)
        |    * CAST(ny AS DOUBLE)))) AS mi
        |  FROM obs JOIN ma USING (event_type) JOIN mb USING (ub), n),
        |hx AS (SELECT -sum((nx / nn) * ln(nx / nn)) AS hx FROM ma, n),
        |hy AS (SELECT -sum((ny / nn) * ln(ny / nn)) AS hy FROM mb, n)
        |SELECT round(mi / sqrt(hx * hy), 6) AS nmi
        |FROM mi, hx, hy""".stripMargin,

    "q121_date_range" ->
      """SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
        |  TIMESTAMP '2024-03-31', INTERVAL 6 HOUR)) AS ts""".stripMargin,

    "q122_cramers_v" ->
      """WITH e AS (SELECT event_type, user_id % 5 AS ub FROM events),
        |obs AS (SELECT event_type, ub, count(*) AS o FROM e GROUP BY 1, 2),
        |ra AS (SELECT event_type, count(*) AS ra FROM e GROUP BY 1),
        |rb AS (SELECT ub, count(*) AS rb FROM e GROUP BY 1),
        |n AS (SELECT count(*) AS nn FROM e),
        |k AS (SELECT least(count(DISTINCT event_type),
        |    count(DISTINCT ub)) AS kmin FROM e),
        |chi AS (
        |  SELECT sum(dev * dev / ex) AS chi2 FROM (
        |    SELECT (CAST(o AS DOUBLE) - CAST(ra.ra AS DOUBLE)
        |        * CAST(rb.rb AS DOUBLE) / CAST(nn AS DOUBLE)) AS dev,
        |      (CAST(ra.ra AS DOUBLE) * CAST(rb.rb AS DOUBLE)
        |        / CAST(nn AS DOUBLE)) AS ex
        |    FROM obs JOIN ra USING (event_type) JOIN rb USING (ub), n))
        |SELECT round(sqrt(chi2 / (CAST(nn AS DOUBLE) * (kmin - 1))), 6)
        |  AS cramers_v
        |FROM chi, n, k""".stripMargin,

    "q123_outliers_iqr" ->
      """WITH src AS (
        |  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS qc
        |  FROM lineitem),
        |q AS (SELECT quantile_cont(qc, 0.25) AS q1,
        |    quantile_cont(qc, 0.75) AS q3 FROM src)
        |SELECT CAST(sum(CASE WHEN qc < q1 - (q3 - q1) * 1.0
        |    OR qc > q3 + (q3 - q1) * 1.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM src, q""".stripMargin,

    "q124_bfs" ->
      """WITH RECURSIVE nn AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS id, n_regionkey AS r
        |  FROM nation),
        |e AS (
        |  SELECT a.id AS src, b.id AS dst
        |  FROM nn a JOIN nn b ON a.r = b.r AND a.id <> b.id),
        |walk(id, dist) AS (
        |  SELECT CAST(0 AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist
        |  UNION
        |  SELECT e.dst, w.dist + 1
        |  FROM walk w JOIN e ON e.src = w.id WHERE w.dist < 15),
        |md AS (SELECT id, min(dist) AS dist FROM walk GROUP BY 1)
        |SELECT v.id, md.dist
        |FROM (SELECT DISTINCT src AS id FROM e) v
        |LEFT JOIN md USING (id)""".stripMargin,
    "q39_resample" ->
      """SELECT date_trunc('hour', ts) AS bucket, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
        |  min(CAST(round(value * 100) AS BIGINT)) AS min_c,
        |  max(CAST(round(value * 100) AS BIGINT)) AS max_c
        |FROM events GROUP BY 1""".stripMargin,

    "q156_acf" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
        |      AS v
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, avg(v) AS mv FROM h GROUP BY 1),
        |c AS (
        |  SELECT h.event_type, v - mv AS c,
        |    row_number() OVER (PARTITION BY h.event_type
        |      ORDER BY bucket) AS rn
        |  FROM h JOIN m USING (event_type)),
        |c0 AS (
        |  SELECT event_type, sum(c * c) AS c0 FROM c GROUP BY 1),
        |ks AS (SELECT unnest(range(1, 25)) AS lag),
        |num AS (
        |  SELECT a.event_type, ks.lag, sum(a.c * b.c) AS num
        |  FROM c a CROSS JOIN ks
        |  JOIN c b ON b.event_type = a.event_type
        |    AND b.rn = a.rn + ks.lag
        |  GROUP BY 1, 2)
        |SELECT n.event_type, CAST(n.lag AS BIGINT) AS lag,
        |  round(n.num / c0.c0, 6) AS acf
        |FROM num n JOIN c0 USING (event_type)""".stripMargin,

    "q155_theil_sen" ->
      """WITH h AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('hour', ts)) / 3600 AS DOUBLE) AS hr,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
        |      AS v
        |  FROM events GROUP BY 1, 2),
        |sl AS (
        |  SELECT l.event_type,
        |    quantile_cont((r.v - l.v) / (r.hr - l.hr), 0.5) AS slope
        |  FROM h l JOIN h r
        |    ON l.event_type = r.event_type AND l.hr < r.hr
        |  GROUP BY 1),
        |res AS (
        |  SELECT h.event_type,
        |    quantile_cont(v - slope * hr, 0.5) AS ic
        |  FROM h JOIN sl USING (event_type) GROUP BY 1)
        |SELECT sl.event_type, round(slope, 9) AS slope,
        |  round(ic, 6) AS intercept
        |FROM sl JOIN res USING (event_type)""".stripMargin,

    "q311_group_entropy" ->
      """WITH cc AS (
        |  SELECT user_id, event_type, CAST(count(*) AS DOUBLE) AS c
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |tot AS (
        |  SELECT user_id, sum(c) AS n, CAST(count(*) AS BIGINT)
        |    AS k_cats
        |  FROM cc GROUP BY 1),
        |h AS (
        |  SELECT cc.user_id, any_value(n) AS n,
        |    any_value(k_cats) AS k_cats,
        |    -sum(c / n * ln(c / n)) AS hh
        |  FROM cc JOIN tot USING (user_id) GROUP BY 1)
        |SELECT user_id, CAST(n AS BIGINT) AS n, k_cats,
        |  round(hh, 6) AS entropy,
        |  round(CASE WHEN k_cats > 1
        |    THEN hh / ln(CAST(k_cats AS DOUBLE)) ELSE 0.0 END, 6)
        |    AS entropy_norm
        |FROM h ORDER BY user_id""".stripMargin,

    "q305_cochran_armitage" -> {
      val phi = graft.stats.Distributions.normalCdfSql("abs(z)")
      s"""WITH p AS (
         |  SELECT CAST(user_id % 4 AS DOUBLE) AS s,
         |    event_type = 'purchase' AS succ
         |  FROM events
         |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
         |g AS (
         |  SELECT s, CAST(count(*) AS DOUBLE) AS n,
         |    CAST(sum(CASE WHEN succ THEN 1 ELSE 0 END) AS DOUBLE) AS r
         |  FROM p GROUP BY 1),
         |tot AS (SELECT sum(n) AS nn, sum(r) AS rr FROM g),
         |e AS (SELECT g.s, g.n, g.r, nn, rr / nn AS pbar FROM g, tot),
         |a AS (
         |  SELECT any_value(nn) AS nn, any_value(pbar) AS pbar,
         |    sum(s * (r - n * pbar)) AS t,
         |    sum(n * s * s) AS snss, sum(n * s) AS sns,
         |    CAST(count(*) AS BIGINT) AS k
         |  FROM e),
         |f AS (
         |  SELECT k, nn, t,
         |    round(t / sqrt(pbar * (1.0 - pbar) *
         |      (snss - sns * sns / nn)), 6) AS z
         |  FROM a)
         |SELECT k, CAST(nn AS BIGINT) AS n, round(t, 6) AS t_stat,
         |  z, round(2.0 * (1.0 - $phi), 6) AS p_value
         |FROM f""".stripMargin
    },

    "q306_proportion_ci" ->
      """WITH p AS (
        |  SELECT event_type, value >= 50.0 AS hv
        |  FROM events WHERE value IS NOT NULL),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CASE WHEN hv THEN 1 ELSE 0 END) AS DOUBLE) AS r
        |  FROM p WHERE event_type IS NOT NULL
        |  GROUP BY 1),
        |f AS (
        |  SELECT event_type, n, r, r / n AS p,
        |    1.959964 * sqrt(r / n * (1.0 - r / n) / n) AS wh,
        |    1.959964 * 1.959964 / n AS z2n
        |  FROM g)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST(r AS BIGINT) AS successes,
        |  round(p, 6) AS p_hat,
        |  round(greatest(0.0, p - wh), 6) AS wald_lo,
        |  round(least(1.0, p + wh), 6) AS wald_hi,
        |  round((p + z2n / 2) / (1.0 + z2n) -
        |    1.959964 * sqrt(p * (1.0 - p) / n +
        |      1.959964 * 1.959964 / (4.0 * n * n)) / (1.0 + z2n), 6)
        |    AS wilson_lo,
        |  round((p + z2n / 2) / (1.0 + z2n) +
        |    1.959964 * sqrt(p * (1.0 - p) / n +
        |      1.959964 * 1.959964 / (4.0 * n * n)) / (1.0 + z2n), 6)
        |    AS wilson_hi
        |FROM f ORDER BY event_type""".stripMargin,

    "q303_holm" -> {
      val phi = graft.stats.Distributions.normalCdfSql("abs(z)")
      s"""WITH p AS (
         |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
         |  FROM events
         |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
         |r AS (
         |  SELECT event_type,
         |    CAST(rank() OVER (ORDER BY vc) AS DOUBLE) +
         |      (CAST(count(*) OVER (PARTITION BY vc) AS DOUBLE) - 1.0)
         |      / 2.0 AS r
         |  FROM p),
         |t AS (
         |  SELECT CAST(sum(c * c * c - c) AS DOUBLE) AS tie_t
         |  FROM (SELECT count(*) AS c FROM p GROUP BY vc)),
         |g AS (
         |  SELECT event_type, CAST(count(*) AS DOUBLE) AS gn,
         |    sum(r) AS rs
         |  FROM r GROUP BY 1),
         |tot AS (SELECT sum(gn) AS nn FROM g),
         |pr AS (
         |  SELECT a.event_type AS ga, b.event_type AS gb,
         |    a.gn AS na, a.rs AS ra, b.gn AS nb, b.rs AS rb, nn, tie_t
         |  FROM g a JOIN g b ON a.event_type < b.event_type, tot, t),
         |zz AS (
         |  SELECT ga, gb,
         |    (ra / na - rb / nb) /
         |      sqrt((nn * (nn + 1) / 12 - tie_t / (12.0 * (nn - 1))) *
         |        (1.0 / na + 1.0 / nb)) AS z
         |  FROM pr),
         |pp AS (
         |  SELECT ga AS group_a, gb AS group_b,
         |    round(2.0 * (1.0 - $phi), 6) AS p_value
         |  FROM zz),
         |rk AS (
         |  SELECT group_a, group_b, p_value,
         |    row_number() OVER (ORDER BY p_value) AS i,
         |    count(*) OVER () AS m
         |  FROM pp),
         |adj AS (
         |  SELECT group_a, group_b, p_value,
         |    max(least(1.0, p_value * (m - i + 1))) OVER (ORDER BY i
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS holm,
         |    least(1.0, p_value * m) AS bonf
         |  FROM rk)
         |SELECT group_a, group_b, p_value, round(holm, 6) AS p_holm,
         |  round(bonf, 6) AS p_bonf
         |FROM adj ORDER BY group_a, group_b""".stripMargin
    },

    "q304_moods_median" ->
      """WITH p AS (
        |  SELECT event_type,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS vc
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |md AS (SELECT quantile_cont(vc, 0.5) AS med FROM p),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CASE WHEN vc > med THEN 1 ELSE 0 END) AS DOUBLE)
        |      AS a
        |  FROM p, md GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS k, sum(n) AS nn,
        |    sum(a) AS aa
        |  FROM g),
        |cells AS (
        |  SELECT k, nn,
        |    (a - n * (aa / nn)) * (a - n * (aa / nn)) /
        |      (n * (aa / nn)) +
        |    ((n - a) - n * (1.0 - aa / nn)) *
        |      ((n - a) - n * (1.0 - aa / nn)) /
        |      (n * (1.0 - aa / nn)) AS cell
        |  FROM g, tot),
        |f AS (
        |  SELECT k, nn, round(sum(cell), 6) AS chi2
        |  FROM cells GROUP BY 1, 2)
        |SELECT chi2, CAST(k - 1 AS BIGINT) AS dof,
        |  CAST(nn AS BIGINT) AS n
        |FROM f""".stripMargin,

    "q301_page_hinkley" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL),
        |w AS (
        |  SELECT event_type, event_id, v,
        |    v - sum(v) OVER wc / count(*) OVER wc - 0.0 AS dev
        |  FROM e
        |  WINDOW wc AS (PARTITION BY event_type ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |mm AS (
        |  SELECT event_type, event_id,
        |    sum(dev) OVER wc AS m
        |  FROM w
        |  WINDOW wc AS (PARTITION BY event_type ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |ph AS (
        |  SELECT event_type, event_id,
        |    m - min(m) OVER wc AS ph
        |  FROM mm
        |  WINDOW wc AS (PARTITION BY event_type ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type, round(max(ph), 6) AS max_ph,
        |  min(CASE WHEN ph > 100000.0 THEN event_id END) AS drift_at,
        |  bool_or(ph > 100000.0) AS drift
        |FROM ph GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q302_newey_west" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS bucket,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |mt AS (
        |  SELECT avg(v) AS m, CAST(count(*) AS DOUBLE) AS n
        |  FROM hourly),
        |c AS (
        |  SELECT v - m AS c, bucket FROM hourly, mt),
        |l AS (
        |  SELECT c,
        |    lag(c, 1) OVER (ORDER BY bucket) AS c1,
        |    lag(c, 2) OVER (ORDER BY bucket) AS c2,
        |    lag(c, 3) OVER (ORDER BY bucket) AS c3,
        |    lag(c, 4) OVER (ORDER BY bucket) AS c4
        |  FROM c),
        |g AS (
        |  SELECT sum(c * c) AS g0, sum(c1 * c) AS g1,
        |    sum(c2 * c) AS g2, sum(c3 * c) AS g3, sum(c4 * c) AS g4
        |  FROM l),
        |f AS (
        |  SELECT m, n, g0,
        |    g0 + 2.0 * (1.0 - 1.0 / 5) * g1 + 2.0 * (1.0 - 2.0 / 5) * g2
        |      + 2.0 * (1.0 - 3.0 / 5) * g3 + 2.0 * (1.0 - 4.0 / 5) * g4
        |      AS lrv
        |  FROM g, mt)
        |SELECT round(m, 6) AS mean, CAST(n AS BIGINT) AS n,
        |  round(sqrt(g0 / (n - 1) / n), 6) AS se_iid,
        |  round(sqrt(lrv / n / n), 6) AS se_hac,
        |  round(m / sqrt(lrv / n / n), 6) AS t_hac
        |FROM f""".stripMargin,

    "q299_seasonal_mk" -> {
      val phi = graft.stats.Distributions.normalCdfSql("abs(z)")
      s"""WITH h AS (
         |  SELECT date_trunc('hour', ts) AS b,
         |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
         |      AS v,
         |    hour(date_trunc('hour', ts)) AS season
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 3),
         |st AS (
         |  SELECT l.season,
         |    sum(CASE WHEN r.v > l.v THEN 1
         |      WHEN r.v < l.v THEN -1 ELSE 0 END) AS s
         |  FROM h l JOIN h r ON l.season = r.season AND l.b < r.b
         |  GROUP BY 1),
         |nt AS (
         |  SELECT season, CAST(count(*) AS DOUBLE) AS n
         |  FROM h GROUP BY 1),
         |tt AS (
         |  SELECT season, sum(t * (t - 1) * (t * 2 + 5)) AS tsum
         |  FROM (SELECT season, v, CAST(count(*) AS DOUBLE) AS t
         |    FROM h GROUP BY 1, 2)
         |  GROUP BY 1),
         |per AS (
         |  SELECT CAST(st.s AS DOUBLE) AS s,
         |    (n * (n - 1) * (n * 2 + 5) - tsum) / 18.0 AS vs
         |  FROM st JOIN nt USING (season) JOIN tt USING (season)),
         |tot AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_seasons,
         |    sum(s) AS ss, sum(vs) AS vv
         |  FROM per),
         |zz AS (
         |  SELECT n_seasons, ss,
         |    CASE WHEN ss > 0 THEN (ss - 1) / sqrt(vv)
         |      WHEN ss < 0 THEN (ss + 1) / sqrt(vv) ELSE 0.0 END AS z
         |  FROM tot)
         |SELECT n_seasons, CAST(ss AS BIGINT) AS s_stat,
         |  round(z, 6) AS z, round(2.0 * (1.0 - $phi), 6) AS p_value
         |FROM zz""".stripMargin
    },

    "q154_mann_kendall" -> {
      val phi = graft.stats.Distributions.normalCdfSql("abs(z)")
      s"""WITH h AS (
         |  SELECT event_type, date_trunc('hour', ts) AS b,
         |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
         |      AS v
         |  FROM events GROUP BY 1, 2),
         |st AS (
         |  SELECT l.event_type,
         |    sum(CASE WHEN r.v > l.v THEN 1
         |      WHEN r.v < l.v THEN -1 ELSE 0 END) AS s
         |  FROM h l JOIN h r
         |    ON l.event_type = r.event_type AND l.b < r.b
         |  GROUP BY 1),
         |nt AS (
         |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n
         |  FROM h GROUP BY 1),
         |tt AS (
         |  SELECT event_type,
         |    sum(t * (t - 1) * (t * 2 + 5)) AS tsum
         |  FROM (SELECT event_type, v, CAST(count(*) AS DOUBLE) AS t
         |    FROM h GROUP BY 1, 2)
         |  GROUP BY 1),
         |j AS (
         |  SELECT st.event_type, CAST(s AS DOUBLE) AS s, n, tsum,
         |    sqrt((n * (n - 1) * (n * 2 + 5) - tsum) / 18.0) AS sd
         |  FROM st JOIN nt USING (event_type)
         |    JOIN tt USING (event_type)),
         |zz AS (
         |  SELECT event_type, s, n,
         |    CASE WHEN s > 0 THEN (s - 1) / sd
         |      WHEN s < 0 THEN (s + 1) / sd ELSE 0.0 END AS z
         |  FROM j)
         |SELECT event_type, CAST(s AS BIGINT) AS s_stat,
         |  CAST(n AS BIGINT) AS n, round(z, 6) AS z,
         |  round(2.0 * (1.0 - $phi), 6) AS p_value
         |FROM zz""".stripMargin
    },

    "q138_resample_ohlc" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    CAST(round(value * 100) AS BIGINT) AS vc,
        |    (epoch_us(ts) - epoch_us(date_trunc('hour', ts)))
        |      * 8388608 + event_id AS ord
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type, bucket,
        |  arg_min(vc, ord) AS open, max(vc) AS high, min(vc) AS low,
        |  arg_max(vc, ord) AS close, CAST(count(*) AS BIGINT) AS n
        |FROM e GROUP BY 1, 2""".stripMargin,

    "q40_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
        |      THEN 1 ELSE 0 END AS start
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, sum(start) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM sess GROUP BY 1""".stripMargin,

    "q140_asof_tolerance" ->
      """WITH r AS (
        |  SELECT user_id, ts AS sts,
        |    max(CAST(round(value * 100) AS BIGINT)) AS sv
        |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id,
        |  CASE WHEN r.sts IS NOT NULL
        |      AND epoch(e.ts) - epoch(r.sts) <= 3600.0
        |    THEN r.sv END AS sv_asof
        |FROM events e ASOF LEFT JOIN r
        |  ON e.user_id = r.user_id AND e.ts >= r.sts""".stripMargin,

    "q41_asof" ->
      """SELECT event_id, user_id,
        |  last_value(CASE WHEN event_type = 'signup'
        |      THEN CAST(round(value * 100) AS BIGINT) END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_signup_c
        |FROM events""".stripMargin,

    "q52_graph_degree" ->
      """SELECT 's' || l_suppkey AS id,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS out_degree,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS degree
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q53_components" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id,
        |  CAST(min(n_nationkey) OVER (PARTITION BY n_regionkey) AS BIGINT)
        |    AS component
        |FROM nation""".stripMargin,

    "q92_chi2_gof" ->
      """WITH counts AS (
        |  SELECT o_orderstatus AS c, CAST(count(*) AS DOUBLE) AS o
        |  FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY 1),
        |tot AS (SELECT sum(o) AS n, CAST(count(*) AS BIGINT) AS k
        |  FROM counts),
        |s AS (
        |  SELECT sum(power(o - (1.0 / k) * n, 2) / ((1.0 / k) * n))
        |      AS chi2,
        |    max(k) AS k
        |  FROM counts CROSS JOIN tot)
        |SELECT round(chi2, 6) AS chi2, k - 1 AS dof,
        |  round(exp(-(chi2 / 2)), 6) AS p_value
        |FROM s""".stripMargin,

    "q90_chi2_pvalue" ->
      """WITH e AS (
        |  SELECT event_type, CAST(user_id % 5 AS BIGINT) AS ub
        |  FROM events
        |  WHERE event_type IN ('click', 'view', 'purchase')),
        |obs AS (SELECT event_type, ub, CAST(count(*) AS DOUBLE) AS o
        |  FROM e GROUP BY 1, 2),
        |ra AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS ra
        |  FROM e GROUP BY 1),
        |rb AS (SELECT ub, CAST(count(*) AS DOUBLE) AS rb
        |  FROM e GROUP BY 1),
        |nt AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM e),
        |cells AS (
        |  SELECT o - ra.ra * rb.rb / nt.nn AS dev,
        |    ra.ra * rb.rb / nt.nn AS ex
        |  FROM obs JOIN ra USING (event_type) JOIN rb USING (ub)
        |  CROSS JOIN nt),
        |s AS (SELECT sum(dev * dev / ex) AS chi2raw FROM cells)
        |SELECT round(chi2raw, 6) AS chi2, CAST(8 AS BIGINT) AS dof,
        |  round(exp(-(chi2raw / 2)) * (1.0 + chi2raw / 2 +
        |    (chi2raw / 2) * (chi2raw / 2) / 2 +
        |    (chi2raw / 2) * (chi2raw / 2) * (chi2raw / 2) / 6), 6)
        |    AS p_value
        |FROM s""".stripMargin,

    "q88_closeness" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |  round(24.0 / (CAST(count(*) OVER (PARTITION BY n_regionkey)
        |    AS DOUBLE) - 1), 6) AS closeness,
        |  CAST(count(*) OVER (PARTITION BY n_regionkey) - 1 AS BIGINT)
        |    AS n_reached
        |FROM nation""".stripMargin,

    "q89_betweenness" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |  0.0 AS betweenness
        |FROM nation
        |WHERE (SELECT count(*) FROM nation n2
        |       WHERE n2.n_regionkey = nation.n_regionkey) > 1""".stripMargin,

    // 5 power iterations unrolled as plain CTEs (standard SQL cannot
    // aggregate over a recursive reference); arithmetic mirrors
    // GraphOps.pageRank op-for-op, dangling mass included
    "q54_pagerank" -> {
      val iters = (1 to 5).map { i =>
        val p = s"pr${i - 1}"
        s"""c$i AS (
           |  SELECT e.dst AS id, sum(p.rank / d.deg) AS c
           |  FROM edges e JOIN $p p ON p.id = e.src
           |  JOIN deg d ON d.src = e.src GROUP BY 1),
           |dm$i AS (
           |  SELECT coalesce(sum(rank), 0.0) AS dm FROM $p
           |  WHERE id NOT IN (SELECT src FROM deg)),
           |pr$i AS (
           |  SELECT v.id,
           |    (1 - 0.85) / n.nn + 0.85 * (coalesce(c.c, 0.0) + dm.dm / n.nn)
           |      AS rank
           |  FROM verts v CROSS JOIN n CROSS JOIN dm$i dm
           |  LEFT JOIN c$i c ON c.id = v.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH edges AS (
         |  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
         |    'p' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem),
         |verts AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
         |deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg
         |  FROM edges GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM verts),
         |pr0 AS (SELECT id, 1.0 / n.nn AS rank FROM verts CROSS JOIN n),
         |$iters
         |SELECT id, round(rank, 9) AS rank FROM pr5""".stripMargin
    },

    "q56_tumbling" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q59_ttest" ->
      """WITH g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(vc) AS DOUBLE) / count(*) AS m,
        |    (CAST(sum(vc * vc) AS DOUBLE)
        |      - CAST(sum(vc) AS DOUBLE) * CAST(sum(vc) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |      / (CAST(count(*) AS DOUBLE) - 1) AS v
        |  FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
        |    FROM events WHERE event_type IN ('click', 'purchase'))
        |  GROUP BY 1)
        |SELECT a.n AS na, b.n AS nb,
        |  round(a.m, 6) AS mean_a_c, round(b.m, 6) AS mean_b_c,
        |  round((a.m - b.m) / sqrt(a.v / CAST(a.n AS DOUBLE)
        |    + b.v / CAST(b.n AS DOUBLE)), 6) AS t_stat
        |FROM (SELECT * FROM g WHERE event_type = 'click') a,
        |     (SELECT * FROM g WHERE event_type = 'purchase') b""".stripMargin,

    "q60_chi2" ->
      """WITH e AS (SELECT event_type, user_id % 5 AS ub FROM events),
        |obs AS (SELECT event_type, ub, count(*) AS o FROM e GROUP BY 1, 2),
        |ra AS (SELECT event_type, count(*) AS ra FROM e GROUP BY 1),
        |rb AS (SELECT ub, count(*) AS rb FROM e GROUP BY 1),
        |n AS (SELECT count(*) AS nn FROM e)
        |SELECT round(sum(dev * dev / ex), 6) AS chi2,
        |  CAST(count(*) AS BIGINT) AS n_cells
        |FROM (
        |  SELECT (CAST(o AS DOUBLE) - CAST(ra.ra AS DOUBLE) * CAST(rb.rb AS DOUBLE)
        |      / CAST(nn AS DOUBLE)) AS dev,
        |    (CAST(ra.ra AS DOUBLE) * CAST(rb.rb AS DOUBLE) / CAST(nn AS DOUBLE)) AS ex
        |  FROM obs JOIN ra USING (event_type) JOIN rb USING (ub), n)""".stripMargin,

    "q61_linreg" ->
      """WITH s AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx,
        |    CAST(sum(y * y) AS DOUBLE) AS syy,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy
        |  FROM (SELECT CAST(l_quantity AS BIGINT) AS x,
        |      CAST(round(l_extendedprice) AS BIGINT) AS y FROM lineitem))
        |SELECT
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
        |    AS intercept,
        |  round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
        |    ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        |FROM s""".stripMargin,

    "q62_skew_kurt" ->
      """WITH s AS (
        |  SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x) AS DOUBLE) AS s1, CAST(sum(x * x) AS DOUBLE) AS s2,
        |    CAST(sum(x * x * x) AS DOUBLE) AS s3,
        |    CAST(sum(x * x * x * x) AS DOUBLE) AS s4
        |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x
        |    FROM lineitem)
        |  GROUP BY 1)
        |SELECT l_returnflag,
        |  round((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
        |    / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skew,
        |  round((s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n)
        |      - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
        |    / ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) - 3, 6)
        |    AS kurt_excess
        |FROM s""".stripMargin,

    "q84_mwu_ztest" -> {
      val phi = graft.stats.Distributions.normalCdfSql("abs(z)")
      s"""WITH pooled AS (
         |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
         |  FROM events WHERE event_type IN ('click', 'view')),
         |ranked AS (
         |  SELECT event_type, vc,
         |    CAST(rank() OVER (ORDER BY vc) AS DOUBLE) +
         |      (CAST(count(*) OVER (PARTITION BY vc) AS DOUBLE) - 1.0)
         |      / 2.0 AS r
         |  FROM pooled),
         |ties AS (
         |  SELECT CAST(sum(CAST(c * c * c - c AS BIGINT)) AS DOUBLE)
         |    AS tie_t
         |  FROM (SELECT count(*) AS c FROM pooled GROUP BY vc)),
         |g AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         |    sum(r) AS rs
         |  FROM ranked GROUP BY 1),
         |wide AS (
         |  SELECT a.n AS na, a.rs AS rsa, b.n AS nb, ties.tie_t
         |  FROM (SELECT * FROM g WHERE event_type = 'click') a,
         |       (SELECT * FROM g WHERE event_type = 'view') b, ties),
         |f AS (
         |  SELECT rsa - na * (na + 1) / 2 AS u, na, nb, tie_t,
         |    na + nb AS nn
         |  FROM wide),
         |zt AS (
         |  SELECT u,
         |    (u - na * nb / 2) /
         |      sqrt(na * nb / 12.0 *
         |        ((nn + 1) - tie_t / (nn * (nn - 1)))) AS z
         |  FROM f)
         |SELECT round(u, 6) AS u, round(z, 6) AS z,
         |  round(2.0 * (1.0 - $phi), 6) AS p_value
         |FROM zt""".stripMargin
    },

    "q63_mannwhitney" ->
      """WITH ranked AS (
        |  SELECT event_type,
        |    CAST(rank() OVER (ORDER BY vc) AS DOUBLE) +
        |      (CAST(count(*) OVER (PARTITION BY vc) AS DOUBLE) - 1.0) / 2.0 AS r
        |  FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
        |    FROM events WHERE event_type IN ('click', 'view')))
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  sum(r) AS rank_sum,
        |  sum(r) - CAST(count(*) AS DOUBLE) * (CAST(count(*) AS DOUBLE) + 1) / 2 AS u
        |FROM ranked GROUP BY 1""".stripMargin,

    "q353_hist_quantiles" ->
      """WITH b AS (
        |  SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
        |    CAST(max(l_extendedprice) AS DOUBLE) AS hi,
        |    count(*) AS n
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |bins AS (
        |  SELECT CASE WHEN b.hi = b.lo THEN 0 ELSE
        |    least(63, greatest(0, CAST(floor(
        |      (l_extendedprice - b.lo) * 64.0 / (b.hi - b.lo))
        |      AS INT))) END AS bin,
        |    count(*) AS cnt
        |  FROM lineitem, b WHERE l_extendedprice IS NOT NULL
        |  GROUP BY 1),
        |cum AS (
        |  SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM bins),
        |qs AS (SELECT unnest([CAST(0.25 AS DOUBLE),
        |  CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
        |  CAST(0.99 AS DOUBLE)]) AS q)
        |SELECT qs.q, CAST(cum.bin AS BIGINT) AS bin,
        |  round(b.lo + (b.hi - b.lo) / 64.0 *
        |    (cum.bin + (qs.q * b.n - (cum.cum - cum.cnt)) / cum.cnt),
        |    6) AS quantile_est
        |FROM qs CROSS JOIN b JOIN cum
        |  ON cum.cum >= qs.q * b.n
        |  AND cum.cum - cum.cnt < qs.q * b.n""".stripMargin,

    "q66_describe" ->
      """WITH s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS s1, CAST(sum(x * x) AS BIGINT) AS s2,
        |    min(x) AS min_x, max(x) AS max_x,
        |    quantile_cont(x, 0.5) AS median
        |  FROM (SELECT CAST(l_quantity AS BIGINT) AS x FROM lineitem))
        |SELECT n, min_x, max_x, median,
        |  round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
        |  round(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |    / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)), 6) AS std
        |FROM s""".stripMargin,

    "q277_welch_anova" ->
      """WITH p AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |g0 AS (
        |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(vc) AS DOUBLE) AS s1,
        |    CAST(sum(vc * vc) AS DOUBLE) AS s2
        |  FROM p GROUP BY 1),
        |g1 AS (
        |  SELECT n, s1 / n AS m,
        |    CASE WHEN n > 1 THEN (s2 - s1 * s1 / n) / (n - 1) END AS vr
        |  FROM g0),
        |g AS (SELECT n, m, n / vr AS w FROM g1 WHERE vr > 0),
        |t AS (SELECT sum(w) AS swt FROM g),
        |a AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS k, any_value(swt) AS sw,
        |    sum(w * m) AS swm, sum(w * m * m) AS swmm,
        |    sum((1.0 - w / swt) * (1.0 - w / swt) / (n - 1)) AS lam
        |  FROM g, t),
        |b AS (SELECT k, lam, (swmm - swm * swm / sw) / (k - 1) AS aa FROM a)
        |SELECT
        |  round(aa / (1.0 + 2.0 * (k - 2) / (k * k - 1) * lam), 6) AS f_stat,
        |  CAST(k - 1 AS BIGINT) AS df1,
        |  round((k * k - 1) / (3.0 * lam), 6) AS df2
        |FROM b""".stripMargin,

    "q278_vif" ->
      """WITH c AS (
        |  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS x1,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS x2,
        |    CAST(round(l_discount * 100) AS BIGINT) AS x3
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
        |s AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x1) AS DOUBLE) AS s1, CAST(sum(x2) AS DOUBLE) AS s2,
        |    CAST(sum(x3) AS DOUBLE) AS s3,
        |    CAST(sum(x1 * x1) AS DOUBLE) AS s11,
        |    CAST(sum(x2 * x2) AS DOUBLE) AS s22,
        |    CAST(sum(x3 * x3) AS DOUBLE) AS s33,
        |    CAST(sum(x1 * x2) AS DOUBLE) AS s12,
        |    CAST(sum(x1 * x3) AS DOUBLE) AS s13,
        |    CAST(sum(x2 * x3) AS DOUBLE) AS s23
        |  FROM c),
        |r AS (
        |  SELECT
        |    (n * s12 - s1 * s2) /
        |      (sqrt(n * s11 - s1 * s1) * sqrt(n * s22 - s2 * s2)) AS r12,
        |    (n * s13 - s1 * s3) /
        |      (sqrt(n * s11 - s1 * s1) * sqrt(n * s33 - s3 * s3)) AS r13,
        |    (n * s23 - s2 * s3) /
        |      (sqrt(n * s22 - s2 * s2) * sqrt(n * s33 - s3 * s3)) AS r23
        |  FROM s),
        |d AS (
        |  SELECT r12, r13, r23,
        |    1.0 + 2.0 * r12 * r13 * r23 - r12 * r12 - r13 * r13 -
        |      r23 * r23 AS det
        |  FROM r)
        |SELECT * FROM (
        |  SELECT 'qty_c' AS "column",
        |    round(CASE WHEN det > 0 THEN (1.0 - r23 * r23) / det END, 6)
        |      AS vif FROM d
        |  UNION ALL
        |  SELECT 'price_c',
        |    round(CASE WHEN det > 0 THEN (1.0 - r13 * r13) / det END, 6)
        |    FROM d
        |  UNION ALL
        |  SELECT 'disc_c',
        |    round(CASE WHEN det > 0 THEN (1.0 - r12 * r12) / det END, 6)
        |    FROM d)
        |ORDER BY "column"""".stripMargin,

    "q279_breusch_pagan" -> {
      val phiLm = graft.stats.Distributions.normalCdfSql("sqrt(lm_koenker)")
      val phiBp = graft.stats.Distributions.normalCdfSql("sqrt(bp_stat)")
      s"""WITH c AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |s1 AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy
        |  FROM c),
        |ab AS (
        |  SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b, n, sx, sy
        |  FROM s1),
        |ab2 AS (SELECT b, (sy - b * sx) / n AS a FROM ab),
        |r AS (
        |  SELECT CAST(x AS DOUBLE) AS xv,
        |    (CAST(y AS DOUBLE) - (a + b * CAST(x AS DOUBLE))) *
        |    (CAST(y AS DOUBLE) - (a + b * CAST(x AS DOUBLE))) AS u
        |  FROM c, ab2),
        |s2 AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n, sum(xv) AS sx,
        |    sum(xv * xv) AS sxx, sum(u) AS su, sum(u * u) AS suu,
        |    sum(xv * u) AS sxu
        |  FROM r),
        |f AS (
        |  SELECT n, su, n * sxx - sx * sx AS cxx,
        |    n * sxu - sx * su AS cxu, n * suu - su * su AS cuu
        |  FROM s2),
        |g AS (
        |  SELECT round(n * (cxu * cxu / (cxx * cuu)), 6) AS lm_koenker,
        |    round((cxu * cxu / (n * cxx)) /
        |      (2.0 * (su / n) * (su / n)), 6) AS bp_stat
        |  FROM f)
        |SELECT lm_koenker, bp_stat, CAST(1 AS BIGINT) AS dof,
        |  round(2.0 * (1.0 - $phiLm), 6) AS p_koenker,
        |  round(2.0 * (1.0 - $phiBp), 6) AS p_bp
        |FROM g""".stripMargin
    },

    "q280_ols_influence" ->
      """WITH c AS (
        |  SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |s AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx,
        |    CAST(sum(y * y) AS DOUBLE) AS syy,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy
        |  FROM c),
        |t AS (
        |  SELECT n, sx / n AS xbar,
        |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
        |    sxx - sx * sx / n AS cxx, sx, sy, syy, sxy
        |  FROM s),
        |t2 AS (
        |  SELECT n, xbar, b, cxx, (sy - b * sx) / n AS a,
        |    ((syy - sy * sy / n) - b * (sxy - sx * sy / n)) / (n - 2) AS s2
        |  FROM t),
        |r AS (
        |  SELECT l_orderkey, l_linenumber,
        |    1.0 / n + (CAST(x AS DOUBLE) - xbar) *
        |      (CAST(x AS DOUBLE) - xbar) / cxx AS h,
        |    CAST(y AS DOUBLE) - (a + b * CAST(x AS DOUBLE)) AS e, s2
        |  FROM c, t2),
        |r2 AS (
        |  SELECT l_orderkey, l_linenumber, h, e,
        |    e / sqrt(s2 * (1.0 - h)) AS rs
        |  FROM r)
        |SELECT l_orderkey, l_linenumber, round(h, 6) AS leverage,
        |  round(e, 6) AS resid, round(rs, 6) AS std_resid,
        |  round(rs * rs * h / (2.0 * (1.0 - h)), 9) AS cooks_d
        |FROM r2
        |ORDER BY cooks_d DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin,

    "q281_corrwith" ->
      """WITH pa AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS na,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS sa,
        |    max(CAST(round(value * 100) AS BIGINT)) AS ma
        |  FROM events
        |  WHERE event_type = 'purchase' AND value IS NOT NULL
        |    AND user_id IS NOT NULL
        |  GROUP BY 1),
        |pb AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS nb,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS sb,
        |    max(CAST(round(value * 100) AS BIGINT)) AS mb
        |  FROM events
        |  WHERE event_type = 'click' AND value IS NOT NULL
        |    AND user_id IS NOT NULL
        |  GROUP BY 1),
        |j AS (
        |  SELECT na, sa, ma, nb, sb, mb
        |  FROM pa JOIN pb USING (user_id)),
        |s AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(na) AS DOUBLE) AS s_na, CAST(sum(nb) AS DOUBLE) AS s_nb,
        |    CAST(sum(sa) AS DOUBLE) AS s_sa, CAST(sum(sb) AS DOUBLE) AS s_sb,
        |    CAST(sum(ma) AS DOUBLE) AS s_ma, CAST(sum(mb) AS DOUBLE) AS s_mb,
        |    CAST(sum(na * na) AS DOUBLE) AS ss_na,
        |    CAST(sum(nb * nb) AS DOUBLE) AS ss_nb,
        |    CAST(sum(sa * sa) AS DOUBLE) AS ss_sa,
        |    CAST(sum(sb * sb) AS DOUBLE) AS ss_sb,
        |    CAST(sum(ma * ma) AS DOUBLE) AS ss_ma,
        |    CAST(sum(mb * mb) AS DOUBLE) AS ss_mb,
        |    CAST(sum(na * nb) AS DOUBLE) AS sp_n,
        |    CAST(sum(sa * sb) AS DOUBLE) AS sp_s,
        |    CAST(sum(ma * mb) AS DOUBLE) AS sp_m
        |  FROM j)
        |SELECT * FROM (
        |  SELECT 'n_events' AS "column",
        |    round(CASE WHEN sqrt(n * ss_na - s_na * s_na) *
        |        sqrt(n * ss_nb - s_nb * s_nb) <> 0 THEN
        |      (n * sp_n - s_na * s_nb) /
        |        (sqrt(n * ss_na - s_na * s_na) *
        |         sqrt(n * ss_nb - s_nb * s_nb)) END, 6) AS corr FROM s
        |  UNION ALL
        |  SELECT 'v_sum',
        |    round(CASE WHEN sqrt(n * ss_sa - s_sa * s_sa) *
        |        sqrt(n * ss_sb - s_sb * s_sb) <> 0 THEN
        |      (n * sp_s - s_sa * s_sb) /
        |        (sqrt(n * ss_sa - s_sa * s_sa) *
        |         sqrt(n * ss_sb - s_sb * s_sb)) END, 6) FROM s
        |  UNION ALL
        |  SELECT 'v_max',
        |    round(CASE WHEN sqrt(n * ss_ma - s_ma * s_ma) *
        |        sqrt(n * ss_mb - s_mb * s_mb) <> 0 THEN
        |      (n * sp_m - s_ma * s_mb) /
        |        (sqrt(n * ss_ma - s_ma * s_ma) *
        |         sqrt(n * ss_mb - s_mb * s_mb)) END, 6) FROM s)
        |ORDER BY "column"""".stripMargin,

    "q282_sem_mad" ->
      """WITH p AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |m AS (
        |  SELECT event_type,
        |    CAST(sum(vc) AS DOUBLE) / count(*) AS mean_
        |  FROM p GROUP BY 1),
        |g AS (
        |  SELECT p.event_type, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(vc) AS DOUBLE) AS sx,
        |    CAST(sum(vc * vc) AS DOUBLE) AS sxx,
        |    sum(abs(CAST(vc AS DOUBLE) - m.mean_)) AS sad
        |  FROM p JOIN m USING (event_type) GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  round(sx / n, 6) AS mean,
        |  round(sqrt((n * sxx - sx * sx) / (n * (n - 1))) / sqrt(n), 6)
        |    AS sem,
        |  round(sad / n, 6) AS mad
        |FROM g ORDER BY event_type""".stripMargin,

    "q284_games_howell" ->
      """WITH p AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |g0 AS (
        |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(vc) AS DOUBLE) AS s1,
        |    CAST(sum(vc * vc) AS DOUBLE) AS s2
        |  FROM p GROUP BY 1),
        |g AS (
        |  SELECT CAST(event_type AS VARCHAR) AS grp, n, s1 / n AS m,
        |    CASE WHEN n > 1 THEN (s2 - s1 * s1 / n) / (n - 1) END AS vr
        |  FROM g0),
        |g1 AS (SELECT grp, n, m, vr FROM g WHERE vr IS NOT NULL)
        |SELECT a.grp AS group_a, b.grp AS group_b,
        |  round(a.m - b.m, 6) AS mean_diff,
        |  round(abs(a.m - b.m) /
        |    sqrt((a.vr / a.n + b.vr / b.n) / 2), 6) AS q_stat,
        |  round((a.vr / a.n + b.vr / b.n) * (a.vr / a.n + b.vr / b.n) /
        |    ((a.vr / a.n) * (a.vr / a.n) / (a.n - 1) +
        |     (b.vr / b.n) * (b.vr / b.n) / (b.n - 1)), 6) AS df
        |FROM g1 a JOIN g1 b ON a.grp < b.grp
        |ORDER BY group_a, group_b""".stripMargin,

    "q285_chi2_residuals" ->
      """WITH src0 AS (
        |  SELECT event_type, user_id % 5 AS ub FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |obs AS (
        |  SELECT event_type, ub, CAST(count(*) AS BIGINT) AS o
        |  FROM src0 GROUP BY 1, 2),
        |ra AS (SELECT event_type, CAST(count(*) AS BIGINT) AS ra
        |  FROM src0 GROUP BY 1),
        |rb AS (SELECT ub, CAST(count(*) AS BIGINT) AS rb
        |  FROM src0 GROUP BY 1),
        |nt AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM src0),
        |cells AS (
        |  SELECT g.event_type, g.ub,
        |    CAST(coalesce(obs.o, 0) AS BIGINT) AS o,
        |    CAST(g.ra AS DOUBLE) * CAST(g.rb AS DOUBLE) / nn AS ex,
        |    CAST(g.ra AS DOUBLE) AS rad, CAST(g.rb AS DOUBLE) AS rbd, nn
        |  FROM (SELECT ra.event_type, rb.ub, ra.ra, rb.rb
        |        FROM ra CROSS JOIN rb) g
        |  LEFT JOIN obs USING (event_type, ub), nt)
        |SELECT event_type, ub, o, round(ex, 6) AS e,
        |  round((o - ex) / sqrt(ex), 6) AS std_res,
        |  round((o - ex) /
        |    sqrt(ex * (1.0 - rad / nn) * (1.0 - rbd / nn)), 6)
        |    AS adj_res,
        |  abs((o - ex) /
        |    sqrt(ex * (1.0 - rad / nn) * (1.0 - rbd / nn))) > 2.0
        |    AS flagged
        |FROM cells ORDER BY event_type, ub""".stripMargin,

    "q286_smd_balance" ->
      """WITH p AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc,
        |    user_id % 1000 AS um
        |  FROM events
        |  WHERE value IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IN ('purchase', 'click')),
        |s AS (
        |  SELECT
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS nt,
        |    CAST(sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS nc,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN vc ELSE 0 END)
        |      AS DOUBLE) AS st_vc,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN vc * vc ELSE 0 END)
        |      AS DOUBLE) AS sst_vc,
        |    CAST(sum(CASE WHEN event_type <> 'purchase' THEN vc ELSE 0 END)
        |      AS DOUBLE) AS sc_vc,
        |    CAST(sum(CASE WHEN event_type <> 'purchase' THEN vc * vc ELSE 0 END)
        |      AS DOUBLE) AS ssc_vc,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN um ELSE 0 END)
        |      AS DOUBLE) AS st_um,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN um * um ELSE 0 END)
        |      AS DOUBLE) AS sst_um,
        |    CAST(sum(CASE WHEN event_type <> 'purchase' THEN um ELSE 0 END)
        |      AS DOUBLE) AS sc_um,
        |    CAST(sum(CASE WHEN event_type <> 'purchase' THEN um * um ELSE 0 END)
        |      AS DOUBLE) AS ssc_um
        |  FROM p),
        |calc AS (
        |  SELECT 'vc' AS covariate, st_vc / nt AS mt, sc_vc / nc AS mc,
        |    (sst_vc - st_vc * st_vc / nt) / (nt - 1) AS vt,
        |    (ssc_vc - sc_vc * sc_vc / nc) / (nc - 1) AS vcv
        |  FROM s
        |  UNION ALL
        |  SELECT 'um', st_um / nt, sc_um / nc,
        |    (sst_um - st_um * st_um / nt) / (nt - 1),
        |    (ssc_um - sc_um * sc_um / nc) / (nc - 1)
        |  FROM s)
        |SELECT covariate, round(mt, 6) AS mean_treated,
        |  round(mc, 6) AS mean_control,
        |  round((mt - mc) / sqrt((vt + vcv) / 2), 6) AS smd,
        |  abs((mt - mc) / sqrt((vt + vcv) / 2)) < 0.1 AS balanced
        |FROM calc ORDER BY covariate""".stripMargin,

    "q293_anova_effect" ->
      """WITH p AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(vc) AS DOUBLE) AS s1,
        |    CAST(sum(vc * vc) AS DOUBLE) AS s2
        |  FROM p GROUP BY 1),
        |a AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS k, sum(n) AS nn,
        |    sum(s1) AS ts1, sum(s2) AS ts2,
        |    sum(s1 * s1 / n) AS sgm
        |  FROM g),
        |b AS (
        |  SELECT k, nn, sgm - ts1 * ts1 / nn AS ssb,
        |    ts2 - ts1 * ts1 / nn AS sst, ts2 - sgm AS ssw
        |  FROM a)
        |SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
        |  round(ssb / sst, 6) AS eta2,
        |  round((ssb - (k - 1) * (ssw / (nn - k))) /
        |    (sst + ssw / (nn - k)), 6) AS omega2
        |FROM b""".stripMargin,

    "q294_bayes_ab" -> {
      val phi = graft.stats.Distributions.normalCdfSql("z")
      s"""WITH p AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
        |    event_type = 'purchase' AS succ
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |s AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 'a' AND succ THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS sa,
        |    CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS DOUBLE)
        |      AS na,
        |    CAST(sum(CASE WHEN arm <> 'a' AND succ THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS sb,
        |    CAST(sum(CASE WHEN arm <> 'a' THEN 1 ELSE 0 END) AS DOUBLE)
        |      AS nb
        |  FROM p),
        |c AS (
        |  SELECT sa, na, sb, nb,
        |    (1.0 + sa) / ((1.0 + sa) + (1.0 + (na - sa))) AS ma,
        |    (1.0 + sa) * (1.0 + (na - sa)) /
        |      (((1.0 + sa) + (1.0 + (na - sa))) *
        |       ((1.0 + sa) + (1.0 + (na - sa))) *
        |       ((1.0 + sa) + (1.0 + (na - sa)) + 1)) AS va,
        |    (1.0 + sb) / ((1.0 + sb) + (1.0 + (nb - sb))) AS mb,
        |    (1.0 + sb) * (1.0 + (nb - sb)) /
        |      (((1.0 + sb) + (1.0 + (nb - sb))) *
        |       ((1.0 + sb) + (1.0 + (nb - sb))) *
        |       ((1.0 + sb) + (1.0 + (nb - sb)) + 1)) AS vb
        |  FROM s),
        |zt AS (SELECT *, (mb - ma) / sqrt(va + vb) AS z FROM c)
        |SELECT CAST(sa AS BIGINT) AS conv_a, CAST(na AS BIGINT) AS n_a,
        |  CAST(sb AS BIGINT) AS conv_b, CAST(nb AS BIGINT) AS n_b,
        |  round(ma, 6) AS post_mean_a, round(mb, 6) AS post_mean_b,
        |  round(mb - ma, 6) AS abs_lift,
        |  round($phi, 6) AS prob_b_beats_a
        |FROM zt""".stripMargin
    },

    "q287_triangles" ->
      """WITH e AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |tri AS (
        |  SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
        |  FROM e e1
        |  JOIN e e2 ON e2.a = e1.b
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |corners AS (
        |  SELECT v1 AS id FROM tri
        |  UNION ALL SELECT v2 FROM tri
        |  UNION ALL SELECT v3 FROM tri),
        |t AS (SELECT id, CAST(count(*) AS BIGINT) AS triangles
        |  FROM corners GROUP BY 1),
        |deg AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS d
        |  FROM (SELECT a AS id FROM e UNION ALL SELECT b FROM e)
        |  GROUP BY 1)
        |SELECT deg.id, CAST(coalesce(t.triangles, 0) AS BIGINT)
        |    AS triangles,
        |  round(CASE WHEN deg.d > 1 THEN
        |    CAST(coalesce(t.triangles, 0) AS DOUBLE) * 2 /
        |      (CAST(deg.d AS DOUBLE) * (CAST(deg.d AS DOUBLE) - 1))
        |    ELSE 0.0 END, 6) AS clustering
        |FROM deg LEFT JOIN t USING (id) ORDER BY id""".stripMargin,

    // identical postings join (hub cap is a no-op at this scale but
    // mirrored), exact integer counts/degrees, same one-expression
    // double per score
    "q401_link_predict" ->
      """WITH und AS (
        |  SELECT DISTINCT x.l_suppkey AS src, y.l_suppkey AS dst
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey
        |   AND x.l_suppkey < y.l_suppkey),
        |sym AS (SELECT src, dst FROM und
        |        UNION SELECT dst, src FROM und),
        |deg AS (
        |  SELECT src AS w, CAST(count(*) AS BIGINT) AS d FROM sym
        |  GROUP BY 1 HAVING count(*) <= 300),
        |post AS (
        |  SELECT s.src AS w, s.dst AS u
        |  FROM sym s JOIN deg ON deg.w = s.src),
        |cm AS (
        |  SELECT a.u AS src, b.u AS dst,
        |    CAST(count(*) AS BIGINT) AS n_common
        |  FROM post a JOIN post b ON a.w = b.w AND a.u < b.u
        |  GROUP BY 1, 2)
        |SELECT CAST(cm.src AS BIGINT) AS src,
        |  CAST(cm.dst AS BIGINT) AS dst, cm.n_common,
        |  ds.d AS deg_src, dd.d AS deg_dst,
        |  round(CAST(cm.n_common AS DOUBLE) /
        |    (ds.d + dd.d - cm.n_common), 9) AS jaccard,
        |  round(CAST(cm.n_common AS DOUBLE) /
        |    sqrt(CAST(ds.d * dd.d AS DOUBLE)), 9) AS cosine,
        |  ds.d * dd.d AS pref_attach
        |FROM cm JOIN deg ds ON ds.w = cm.src
        |JOIN deg dd ON dd.w = cm.dst""".stripMargin,

    // identical exact-integer mass propagation: 3 unrolled rounds,
    // `//` floor-div on nonnegative masses == Spark's `div`
    "q402_ppr" -> {
      def rnd(i: Int): String =
        s"""r$i AS MATERIALIZED (
           |  SELECT v.id,
           |    CAST((85 * coalesce(s.c, 0)) // 100 AS BIGINT) +
           |    CASE WHEN v.id IN (1, 2, 3)
           |      THEN 150000000000 ELSE 0 END AS ppr
           |  FROM v LEFT JOIN (
           |    SELECT e.dst AS id, sum(r.ppr // d.deg) AS c
           |    FROM e JOIN r${i - 1} r ON r.id = e.src
           |    JOIN deg d ON d.id = e.src GROUP BY 1) s
           |    ON s.id = v.id)""".stripMargin
      s"""WITH und AS (
         |  SELECT DISTINCT x.l_partkey AS src, y.l_partkey AS dst
         |  FROM lineitem x JOIN lineitem y
         |    ON x.l_orderkey = y.l_orderkey
         |   AND x.l_partkey < y.l_partkey),
         |e AS (SELECT src, dst FROM und
         |      UNION ALL SELECT dst, src FROM und),
         |v AS (SELECT DISTINCT src AS id FROM e),
         |deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
         |        FROM e GROUP BY 1),
         |r0 AS (SELECT id, CASE WHEN id IN (1, 2, 3)
         |    THEN CAST(1000000000000 AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS ppr FROM v),
         |${rnd(1)},
         |${rnd(2)},
         |${rnd(3)},
         |t AS (SELECT CAST(sum(ppr) AS BIGINT) AS tot FROM r3)
         |SELECT CAST(id AS BIGINT) AS id, ppr,
         |  CASE WHEN tot > 0 THEN
         |    round(CAST(ppr AS DOUBLE) / tot, 9) END AS ppr_norm
         |FROM r3 CROSS JOIN t""".stripMargin
    },

    // identical a<b<c single-orientation triangle enumeration,
    // exact BIGINT 3-edge credit
    "q403_edge_support" ->
      """WITH e AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey
        |   AND x.l_partkey < y.l_partkey),
        |tri AS (
        |  SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
        |  FROM e e1
        |  JOIN e e2 ON e2.a = e1.b
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
        |  CAST(count(*) AS BIGINT) AS support
        |FROM (SELECT v1 AS u, v2 AS v FROM tri
        |      UNION ALL SELECT v1, v3 FROM tri
        |      UNION ALL SELECT v2, v3 FROM tri)
        |GROUP BY 1, 2""".stripMargin,

    // 3 unrolled prune rounds, support recomputed on each round's
    // surviving edges — the exact SQL image of kTruss(rounds = 3)
    "q404_ktruss" -> {
      def round(i: Int): String =
        s"""tri$i AS MATERIALIZED (
           |  SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
           |  FROM e${i - 1} e1
           |  JOIN e${i - 1} e2 ON e2.a = e1.b
           |  JOIN e${i - 1} e3 ON e3.a = e1.a AND e3.b = e2.b),
           |sup$i AS MATERIALIZED (
           |  SELECT u, v, CAST(count(*) AS BIGINT) AS support
           |  FROM (SELECT v1 AS u, v2 AS v FROM tri$i
           |        UNION ALL SELECT v1, v3 FROM tri$i
           |        UNION ALL SELECT v2, v3 FROM tri$i)
           |  GROUP BY 1, 2),
           |e$i AS MATERIALIZED (
           |  SELECT e.a, e.b, s.support
           |  FROM e${i - 1} e JOIN sup$i s
           |    ON s.u = e.a AND s.v = e.b
           |  WHERE s.support >= 10)""".stripMargin
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
         |  FROM lineitem x JOIN lineitem y
         |    ON x.l_orderkey = y.l_orderkey
         |   AND x.l_partkey < y.l_partkey),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
         |  support
         |FROM e3""".stripMargin
    }
  )
}
