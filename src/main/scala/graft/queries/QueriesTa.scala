package graft.queries

import org.apache.spark.sql.functions._
import graft.timeseries.TechnicalOps
import Q._

/** Technical-indicator windows (drawdown, Bollinger, RSI, MACD) —
  * rolling/EWM compositions over the reference's window surface
  * (pandrs `src/series/window.rs`), shipped as operators over the
  * events table keyed by user.
  *
  * Oracle determinism: values go through exact cents; Bollinger
  * moments are integer window sums; the EWM indicators replay the
  * identical IEEE recurrence in a recursive CTE with the SAME alpha
  * literal cast to DOUBLE on both sides (a bare decimal literal is
  * DECIMAL in both engines, and decimal-vs-double subtraction orders
  * would diverge by ULPs otherwise). */
object QueriesTa {

  // the exact alpha literals interpolated into BOTH engines' plans
  private val aRsi = (1.0 / 14.0).toString
  private val aFast = (2.0 / 13.0).toString
  private val aSlow = (2.0 / 27.0).toString
  private val aSig = (2.0 / 10.0).toString

  val queries: Map[String, QueryFn] = Map[String, QueryFn](

    // §2.5a running-peak max drawdown per user over event value cents
    "q247_drawdown" -> ((s, d) =>
      TechnicalOps.maxDrawdown(
        t(s, d, "events").select(col("user_id"), col("event_id"),
          cents(col("value")).as("vc")),
        "vc", "event_id", Seq("user_id"))
        .select(col("user_id"), col("n"), col("peak").as("peak_c"),
          col("max_drawdown"))),

    // §2.5a Bollinger bands (n=20, k=2) on event value cents
    "q248_bollinger" -> ((s, d) =>
      TechnicalOps.bollinger(
        t(s, d, "events").select(col("user_id"), col("event_id"),
          cents(col("value")).as("vc")),
        "vc", "event_id", Seq("user_id"), n = 20, k = 2.0)
        .select(col("user_id"), col("event_id"),
          round(col("bb_mid"), 6).as("bb_mid"),
          round(col("bb_up"), 6).as("bb_up"),
          round(col("bb_lo"), 6).as("bb_lo"),
          round(col("bb_pctb"), 6).as("bb_pctb"))),

    // §2.5a EWM RSI (period 14) on event value cents diffs
    "q249_rsi" -> ((s, d) =>
      TechnicalOps.rsi(
        t(s, d, "events").select(col("user_id"), col("event_id"),
          cents(col("value")).as("vc")),
        "vc", "event_id", Seq("user_id"), period = 14)
        .select(col("user_id"), col("event_id"),
          round(col("rsi"), 6).as("rsi"))),

    // §2.5a MACD(12,26,9) on event value cents
    "q250_macd" -> ((s, d) =>
      TechnicalOps.macd(
        t(s, d, "events").select(col("user_id"), col("event_id"),
          dbl(cents(col("value"))).as("vc")),
        "vc", "event_id", Seq("user_id"))
        .select(col("user_id"), col("event_id"),
          round(col("macd"), 6).as("macd"),
          round(col("macd_signal"), 6).as("macd_signal"),
          round(col("macd_hist"), 6).as("macd_hist"))))

  val oracle: Map[String, String] = Map(

    "q247_drawdown" ->
      """WITH s AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events WHERE value IS NOT NULL),
        |p AS (
        |  SELECT user_id, vc,
        |    max(vc) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM s)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |  CAST(max(vc) AS BIGINT) AS peak_c,
        |  round(max(CASE WHEN peak > 0 THEN
        |    CAST(peak - vc AS DOUBLE) / CAST(peak AS DOUBLE) END), 6)
        |    AS max_drawdown
        |FROM p GROUP BY 1""".stripMargin,

    "q248_bollinger" ->
      """WITH s AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events WHERE value IS NOT NULL),
        |wnd AS (
        |  SELECT user_id, event_id, vc,
        |    count(*) OVER w AS cnt,
        |    CAST(sum(vc) OVER w AS BIGINT) AS s1,
        |    CAST(sum(vc * vc) OVER w AS BIGINT) AS s2
        |  FROM s
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |m AS (
        |  SELECT user_id, event_id, vc, cnt,
        |    CAST(s1 AS DOUBLE) / 20 AS mid,
        |    sqrt(CAST(20 * s2 - s1 * s1 AS DOUBLE) / 380.0) AS sd
        |  FROM wnd)
        |SELECT user_id, event_id,
        |  round(CASE WHEN cnt = 20 THEN mid END, 6) AS bb_mid,
        |  round(CASE WHEN cnt = 20 THEN mid + 2.0 * sd END, 6) AS bb_up,
        |  round(CASE WHEN cnt = 20 THEN mid - 2.0 * sd END, 6) AS bb_lo,
        |  round(CASE WHEN cnt = 20 AND sd > 0 THEN
        |    (CAST(vc AS DOUBLE) - (mid - 2.0 * sd)) /
        |    ((mid + 2.0 * sd) - (mid - 2.0 * sd)) END, 6) AS bb_pctb
        |FROM m""".stripMargin,

    "q249_rsi" ->
      s"""WITH RECURSIVE s AS (
         |  SELECT user_id, event_id,
         |    CAST(round(value * 100) AS BIGINT) AS vc
         |  FROM events WHERE value IS NOT NULL),
         |d AS (
         |  SELECT user_id, event_id,
         |    row_number() OVER (PARTITION BY user_id ORDER BY event_id)
         |      AS rn,
         |    CAST(vc - lag(vc) OVER (PARTITION BY user_id
         |      ORDER BY event_id) AS DOUBLE) AS df
         |  FROM s),
         |g AS (
         |  SELECT user_id, event_id, rn,
         |    greatest(df, 0.0) AS gain, greatest(-df, 0.0) AS loss
         |  FROM d WHERE df IS NOT NULL),
         |r AS (
         |  SELECT user_id, event_id, rn, gain AS g, loss AS l
         |  FROM g WHERE rn = 2
         |  UNION ALL
         |  SELECT b.user_id, b.event_id, b.rn,
         |    (1.0 - CAST($aRsi AS DOUBLE)) * r.g +
         |      CAST($aRsi AS DOUBLE) * b.gain,
         |    (1.0 - CAST($aRsi AS DOUBLE)) * r.l +
         |      CAST($aRsi AS DOUBLE) * b.loss
         |  FROM g b JOIN r ON b.user_id = r.user_id AND b.rn = r.rn + 1)
         |SELECT user_id, event_id,
         |  round(CASE WHEN g + l > 0 THEN 100.0 * g / (g + l) END, 6)
         |    AS rsi
         |FROM r""".stripMargin,

    "q250_macd" ->
      s"""WITH RECURSIVE s AS (
         |  SELECT user_id, event_id,
         |    CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS x,
         |    row_number() OVER (PARTITION BY user_id ORDER BY event_id)
         |      AS rn
         |  FROM events WHERE value IS NOT NULL),
         |r AS (
         |  SELECT user_id, event_id, rn, x AS ef, x AS es,
         |    CAST(0.0 AS DOUBLE) AS sig
         |  FROM s WHERE rn = 1
         |  UNION ALL
         |  SELECT b.user_id, b.event_id, b.rn,
         |    (1.0 - CAST($aFast AS DOUBLE)) * r.ef +
         |      CAST($aFast AS DOUBLE) * b.x,
         |    (1.0 - CAST($aSlow AS DOUBLE)) * r.es +
         |      CAST($aSlow AS DOUBLE) * b.x,
         |    (1.0 - CAST($aSig AS DOUBLE)) * r.sig +
         |      CAST($aSig AS DOUBLE) *
         |      ((1.0 - CAST($aFast AS DOUBLE)) * r.ef +
         |         CAST($aFast AS DOUBLE) * b.x -
         |       ((1.0 - CAST($aSlow AS DOUBLE)) * r.es +
         |          CAST($aSlow AS DOUBLE) * b.x))
         |  FROM s b JOIN r ON b.user_id = r.user_id AND b.rn = r.rn + 1)
         |SELECT user_id, event_id, round(ef - es, 6) AS macd,
         |  round(sig, 6) AS macd_signal,
         |  round(ef - es - sig, 6) AS macd_hist
         |FROM r""".stripMargin)
}
