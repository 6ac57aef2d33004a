package graft.timeseries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series layer (reference src/time_series/core.rs,
  * src/temporal/): date ranges, resampling, sessionization, seasonal
  * decomposition — all as distributed DataFrame transforms. The
  * pandas DateTimeIndex becomes an explicit timestamp column
  * (SURVEY §1.1); frequencies map to date_trunc/window buckets.
  */
object TimeSeriesOps {

  /** date_range (reference src/time_series/core.rs:140,
    * src/temporal/date_range/) as sequence + explode — generated
    * distributed, not on the driver. */
  def dateRange(spark: SparkSession, start: String, end: String,
      intervalExpr: String): DataFrame =
    spark.range(1).select(explode(sequence(
      to_timestamp(lit(start)), to_timestamp(lit(end)),
      expr(s"INTERVAL $intervalExpr"))).as("ts"))

  /** resample/downsample (core.rs:387-513, temporal/resample/mod.rs:21):
    * truncate to the frequency bucket and aggregate. One shuffle on
    * the bucket — at 100 TB this is the canonical pre-aggregation. */
  def resample(df: DataFrame, tsCol: String, freq: String,
      aggs: Seq[Column]): DataFrame =
    df.groupBy(date_trunc(freq, col(tsCol)).as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("bucket")

  /** upsample to a regular grid with forward-fill: join the series
    * onto a generated calendar, then ffill. */
  def upsample(df: DataFrame, tsCol: String, valueCol: String,
      calendar: DataFrame): DataFrame = {
    val joined = calendar.join(
      df.select(col(tsCol).as("ts"), col(valueCol)), Seq("ts"), "left")
    val w = Window.orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.withColumn(valueCol,
      last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** sessionize: new session when the gap to the previous event of
    * the same key exceeds `gapSeconds`; session id = running count of
    * session starts. Single shuffle on the key. */
  def sessionize(df: DataFrame, tsCol: String, keyCol: String,
      gapSeconds: Long): DataFrame = {
    val wo = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val gap = col(tsCol).cast("double") -
      lag(col(tsCol), 1).over(wo).cast("double")
    val isStart = when(gap.isNull || gap > gapSeconds, 1).otherwise(0)
    df.withColumn("__start__", isStart)
      .withColumn("session_id", sum(col("__start__"))
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__start__")
  }

  /** Classical seasonal decomposition, additive
    * (reference src/time_series/decomposition.rs:62-552):
    * trend = centered moving average over one period;
    * seasonal = per-phase mean of detrended values;
    * resid = value − trend − seasonal. Two window passes + one
    * broadcastable per-phase aggregate. */
  def decomposeAdditive(df: DataFrame, tsCol: String, valueCol: String,
      period: Int): DataFrame = {
    val wAll = Window.orderBy(col(tsCol))
    val half = period / 2
    // classical trend filter: odd period → centered m-point MA;
    // even period → 2×m MA (mean of the two half-shifted m-point
    // averages ⇒ half-weight endpoints), as in statsmodels
    val trendCol =
      if (period % 2 == 1) {
        val wMa = wAll.rowsBetween(-half, half)
        when(count(col(valueCol)).over(wMa) === period,
          avg(col(valueCol)).over(wMa))
      } else {
        val wA = wAll.rowsBetween(-half, half - 1)
        val wB = wAll.rowsBetween(-(half - 1), half)
        when(count(col(valueCol)).over(wA) === period &&
          count(col(valueCol)).over(wB) === period,
          (avg(col(valueCol)).over(wA) + avg(col(valueCol)).over(wB)) / 2)
      }
    val trended = df
      .withColumn("__rn__", row_number().over(wAll))
      .withColumn("trend", trendCol)
      .withColumn("__phase__", pmod(col("__rn__") - 1, lit(period)))
    // per-phase means of detrended values, re-centered to sum to zero
    // so the level stays in the trend component
    val seasonal = trended
      .filter(col("trend").isNotNull)
      .groupBy("__phase__")
      .agg(avg(col(valueCol) - col("trend")).as("__raw_seasonal__"))
    val centered = seasonal.crossJoin(broadcast(
        seasonal.agg(avg("__raw_seasonal__").as("__mean_s__"))))
      .select(col("__phase__"),
        (col("__raw_seasonal__") - col("__mean_s__")).as("seasonal"))
    trended.join(broadcast(centered), Seq("__phase__"), "left")
      .withColumn("resid", col(valueCol) - col("trend") - col("seasonal"))
      .drop("__rn__", "__phase__")
      .orderBy(col(tsCol))
  }

  /** Lag/rolling feature extraction (reference
    * src/time_series/features.rs): adds lag_k and rolling-mean
    * columns per key in one window pass. */
  def lagFeatures(df: DataFrame, valueCol: String, orderCol: String,
      keyCols: Seq[String], lags: Seq[Int],
      rollWindows: Seq[Int]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol))
    val withLags = lags.foldLeft(df)((d, k) =>
      d.withColumn(s"${valueCol}_lag$k", lag(col(valueCol), k).over(w)))
    rollWindows.foldLeft(withLags)((d, n) =>
      d.withColumn(s"${valueCol}_rollmean$n",
        avg(col(valueCol)).over(w.rowsBetween(-(n - 1), 0))))
  }

  /** Linear detrend (reference src/time_series/preprocessing.rs):
    * residual of the OLS fit value ~ rownum, computed from sufficient
    * sums — two passes, no collect of rows. */
  def detrendLinear(df: DataFrame, valueCol: String,
      orderCol: String): DataFrame = {
    val wAll = Window.orderBy(col(orderCol))
    val withX = df.withColumn("__x__",
      row_number().over(wAll).cast("double"))
    val s = withX.agg(count(lit(1)).cast("double").as("n"),
      sum(col("__x__")).as("sx"),
      sum(col(valueCol)).as("sy"),
      sum(col("__x__") * col("__x__")).as("sxx"),
      sum(col("__x__") * col(valueCol)).as("sxy")).head()
    val (n, sx, sy, sxx, sxy) = (s.getDouble(0), s.getDouble(1),
      s.getDouble(2), s.getDouble(3), s.getDouble(4))
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    withX.withColumn(s"${valueCol}_detrended",
      col(valueCol) - (lit(icept) + lit(slope) * col("__x__")))
      .drop("__x__")
  }

  /** Augmented Dickey-Fuller test statistic, lag order 0 (reference
    * src/time_series/stats.rs ADF): Δy_t = α + γ·y_{t−1} + ε; the
    * statistic is γ̂/se(γ̂). Sufficient sums via one aggregate; the
    * 2×2 normal-equation solve happens on the driver. */
  def adfStatistic(df: DataFrame, valueCol: String,
      orderCol: String): Double = {
    val w = Window.orderBy(col(orderCol))
    val d = df
      .withColumn("__yl__", lag(col(valueCol), 1).over(w))
      .withColumn("__dy__", col(valueCol) - col("__yl__"))
      .filter(col("__yl__").isNotNull)
    val s = d.agg(count(lit(1)).cast("double").as("n"),
      sum(col("__yl__")).as("sx"), sum(col("__dy__")).as("sy"),
      sum(col("__yl__") * col("__yl__")).as("sxx"),
      sum(col("__yl__") * col("__dy__")).as("sxy"),
      sum(col("__dy__") * col("__dy__")).as("syy")).head()
    val (n, sx, sy, sxx, sxy, syy) = (s.getDouble(0), s.getDouble(1),
      s.getDouble(2), s.getDouble(3), s.getDouble(4), s.getDouble(5))
    val gamma = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val alpha = (sy - gamma * sx) / n
    // SSE = Σ(dy − α − γ·yl)² expanded in sums
    val sse = syy - 2 * alpha * sy - 2 * gamma * sxy + n * alpha * alpha +
      2 * alpha * gamma * sx + gamma * gamma * sxx
    val s2 = sse / (n - 2)
    val seGamma = math.sqrt(s2 * n / (n * sxx - sx * sx))
    gamma / seGamma
  }

  /** KPSS stationarity statistic (reference src/time_series/stats.rs
    * kpss, level case): η = Σ S_t² / (n²·σ̂²_lr) where S_t are
    * partial sums of demeaned values and σ̂²_lr uses Bartlett
    * weights up to `lags`. Window cumsum + lag-covariance aggregates;
    * scalar finish on the driver. */
  def kpssStatistic(df0: DataFrame, valueCol: String, orderCol: String,
      lags: Int = 4): Double = {
    val df = df0.filter(col(valueCol).isNotNull)
    val w = Window.orderBy(col(orderCol))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mean = df.agg(avg(col(valueCol))).head().getDouble(0)
    val centered = df.withColumn("__e__", col(valueCol) - mean)
      .withColumn("__s__", sum(col("__e__")).over(wCum))
    val lagged = (1 to lags).foldLeft(centered)((d, k) =>
      d.withColumn(s"__el${k}__", lag(col("__e__"), k).over(w)))
    val aggs = Seq(count(lit(1)).cast("double").as("n"),
      sum(col("__s__") * col("__s__")).as("ss"),
      sum(col("__e__") * col("__e__")).as("g0")) ++
      (1 to lags).map(k =>
        sum(col("__e__") * col(s"__el${k}__")).as(s"g$k"))
    val r = lagged.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getAs[Double]("n")
    val g0 = r.getAs[Double]("g0") / n
    val lrVar = g0 + 2.0 * (1 to lags).map { k =>
      (1.0 - k / (lags + 1.0)) * (r.getAs[Double](s"g$k") / n)
    }.sum
    r.getAs[Double]("ss") / (n * n * lrVar)
  }

  /** Durbin-Watson statistic (reference src/time_series/stats.rs
    * durbin_watson): Σ(e_t − e_{t−1})² / Σe_t² — one lag window +
    * one aggregate. */
  def durbinWatson(df: DataFrame, valueCol: String,
      orderCol: String): Double = {
    val w = Window.orderBy(col(orderCol))
    val d = df.withColumn("__lag__", lag(col(valueCol), 1).over(w))
      .agg(
        sum(pow(col(valueCol) - col("__lag__"), 2)).as("num"),
        sum(pow(col(valueCol), 2)).as("den"))
      .head()
    d.getDouble(0) / d.getDouble(1)
  }

  /** Jarque-Bera normality test statistic (stats.rs jarque_bera):
    * n/6 (S² + K²/4) from one moment aggregate. */
  def jarqueBera(df: DataFrame, valueCol: String): Double = {
    val r = df.agg(count(lit(1)).cast("double").as("n"),
      skewness(col(valueCol)).as("s"),
      kurtosis(col(valueCol)).as("k")).head()
    val (n, s, k) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    n / 6.0 * (s * s + k * k / 4.0)
  }

  /** Ljung-Box Q statistic up to maxLag (stats.rs ljung_box):
    * autocorrelations via lag windows, finalized on the driver. */
  def ljungBox(df: DataFrame, valueCol: String, orderCol: String,
      maxLag: Int): Double = {
    val w = Window.orderBy(col(orderCol))
    val mean = df.agg(avg(col(valueCol))).head().getDouble(0)
    val centered = df.withColumn("__c__", col(valueCol) - mean)
    val lagged = (1 to maxLag).foldLeft(centered)((d, k) =>
      d.withColumn(s"__l${k}__", lag(col("__c__"), k).over(w)))
    val aggs = sum(col("__c__") * col("__c__")).as("c0") +:
      (1 to maxLag).map(k =>
        sum(col("__c__") * col(s"__l${k}__")).as(s"c$k"))
    val r = lagged.agg(aggs.head, aggs.tail: _*).head()
    val n = df.count().toDouble
    val c0 = r.getAs[Double]("c0")
    (1 to maxLag).map { k =>
      val rho = r.getAs[Double](s"c$k") / c0
      rho * rho / (n - k)
    }.sum[Double] * n * (n + 2)
  }

  /** Simple-moving-average forecast (forecasting.rs:73): driver-side
    * finalization over an ALREADY AGGREGATED (small) series — the
    * only deliberate collect in the library (SURVEY §7.4.7). */
  def smaForecast(series: DataFrame, valueCol: String, orderCol: String,
      window: Int, steps: Int): Seq[Double] = {
    val tail = series.orderBy(col(orderCol).desc).limit(window)
      .collect().map(_.getAs[Double](valueCol))
    if (tail.isEmpty) Seq.empty
    else {
      val buf = scala.collection.mutable.ArrayBuffer(tail.reverse: _*)
      (0 until steps).map { _ =>
        val f = buf.takeRight(window).sum / math.min(window, buf.size)
        buf += f; f
      }
    }
  }

  /** Double (Holt) exponential smoothing forecast
    * (forecasting.rs:422-469) — driver-side on an aggregated series. */
  def holtForecast(values: Seq[Double], alpha: Double, beta: Double,
      steps: Int): Seq[Double] = {
    if (values.size < 2) return Seq.fill(steps)(values.headOption.getOrElse(0.0))
    var level = values.head
    var trend = values(1) - values.head
    values.tail.foreach { x =>
      val prevLevel = level
      level = alpha * x + (1 - alpha) * (level + trend)
      trend = beta * (level - prevLevel) + (1 - beta) * trend
    }
    (1 to steps).map(h => level + h * trend)
  }
}
