package graft.window

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** pandas-style moving windows (reference src/series/window.rs:111-756,
  * src/dataframe/groupby_window.rs:32-164) as Spark window specs.
  * All variants run in one window pass per aggregate — a single
  * shuffle on the partition keys, then sorted streaming within each
  * partition; scales linearly with data.
  */
object RollingOps {

  /** Frame for rolling(n): `center=false` → [-(n-1), 0];
    * `center=true` → pandas puts the extra element on the right for
    * even n: [-(n-1)/2 floor from left?] — pandas centers with
    * lo = -((n-1)/2), hi = n/2 (integer division). */
  private def frame(w: WindowSpec, n: Int, center: Boolean): WindowSpec =
    if (center) w.rowsBetween(-((n - 1) / 2), n / 2)
    else w.rowsBetween(-(n - 1), 0)

  private def base(orderCols: Seq[String],
      partitionCols: Seq[String]): WindowSpec =
    Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)

  /** rolling(n).agg with min_periods (src/series/window.rs:111-140):
    * result is null until the window holds >= minPeriods non-null
    * values. Pass enough orderCols to make the order deterministic —
    * running aggregates over an ambiguous order are undefined in any
    * engine. */
  def rolling(df: DataFrame, valueCol: String, n: Int,
      agg: Column => Column, orderCols: Seq[String],
      partitionCols: Seq[String] = Nil, minPeriods: Int = -1,
      center: Boolean = false,
      outName: String = "rolling"): DataFrame = {
    val mp = if (minPeriods < 0) n else minPeriods
    val w = frame(base(orderCols, partitionCols), n, center)
    val cnt = count(col(valueCol)).over(w)
    df.withColumn(outName,
      when(cnt >= mp, agg(col(valueCol)).over(w)))
  }

  /** pandas rolling(n).corr(other) / .cov(other) between two columns
    * (pairwise window statistics; reference rolling aggregates at
    * src/series/window.rs:111 stop at single-column aggs — this is
    * the pandas-parity extension). Pairwise-complete semantics: a row
    * contributes only when BOTH columns are non-null; result is null
    * until the window holds >= minPeriods complete pairs, and null
    * for zero-variance windows (corr) — matching pandas/SQL. One
    * partitioned window, five running sums, no extra shuffle. */
  def rollingCorr(df: DataFrame, xCol: String, yCol: String, n: Int,
      orderCols: Seq[String], partitionCols: Seq[String] = Nil,
      minPeriods: Int = -1, outName: String = "rolling_corr",
      sampleCov: Boolean = false, asCov: Boolean = false): DataFrame = {
    // n <= 0 = EXPANDING pairwise corr/cov (pandas expanding().corr)
    val mp = if (minPeriods >= 0) minPeriods else if (n > 0) n else 2
    val w =
      if (n > 0) frame(base(orderCols, partitionCols), n, center = false)
      else base(orderCols, partitionCols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bothOk = col(xCol).isNotNull && col(yCol).isNotNull
    val xm = when(bothOk, col(xCol).cast("double"))
    val ym = when(bothOk, col(yCol).cast("double"))
    val cnt = count(xm).over(w).cast("double")
    val sx = sum(xm).over(w); val sy = sum(ym).over(w)
    val sxx = sum(xm * xm).over(w); val syy = sum(ym * ym).over(w)
    val sxy = sum(xm * ym).over(w)
    val out =
      if (asCov) {
        // covariance: sample (n−1, pandas default) or population
        val denom = if (sampleCov) cnt - 1.0 else cnt
        when(denom > 0, (sxy - sx * sy / cnt) / denom)
      } else {
        val den = sqrt(cnt * sxx - sx * sx) * sqrt(cnt * syy - sy * sy)
        when(den > 0, (cnt * sxy - sx * sy) / den)
      }
    df.withColumn(outName, when(cnt >= mp, out))
  }

  def rollingCov(df: DataFrame, xCol: String, yCol: String, n: Int,
      orderCols: Seq[String], partitionCols: Seq[String] = Nil,
      minPeriods: Int = -1, outName: String = "rolling_cov"): DataFrame =
    rollingCorr(df, xCol, yCol, n, orderCols, partitionCols, minPeriods,
      outName, sampleCov = true, asCov = true)

  /** statsmodels RollingOLS parity: per-row trailing-window simple
    * regression y ~ x — slope, intercept, r² from the same five
    * running sums as [[rollingCorr]] (pairwise-complete, null until
    * minPeriods complete pairs, null slope/r² on zero-variance x).
    * All sums share one WindowSpec so Catalyst plans a single Window
    * operator — one partitioned sort, no extra shuffle. Feed
    * integral columns (cents pattern) and every window sum is exact,
    * so the finalized ratios replay identically in any engine. */
  def rollingOls(df: DataFrame, xCol: String, yCol: String, n: Int,
      orderCols: Seq[String], partitionCols: Seq[String] = Nil,
      minPeriods: Int = -1): DataFrame = {
    val mp = if (minPeriods >= 0) minPeriods else n
    val w = frame(base(orderCols, partitionCols), n, center = false)
    val bothOk = col(xCol).isNotNull && col(yCol).isNotNull
    val xm = when(bothOk, col(xCol).cast("double"))
    val ym = when(bothOk, col(yCol).cast("double"))
    val cnt = count(xm).over(w).cast("double")
    val sx = sum(xm).over(w); val sy = sum(ym).over(w)
    val sxx = sum(xm * xm).over(w); val syy = sum(ym * ym).over(w)
    val sxy = sum(xm * ym).over(w)
    val varx = cnt * sxx - sx * sx
    val vary = cnt * syy - sy * sy
    val covxy = cnt * sxy - sx * sy
    val slope = when(varx =!= 0, covxy / varx)
    df.withColumn("roll_slope", when(cnt >= mp, round(slope, 6)))
      .withColumn("roll_intercept",
        when(cnt >= mp, round((sy - slope * sx) / cnt, 6)))
      .withColumn("roll_r2",
        when(cnt >= mp && varx =!= 0 && vary =!= 0,
          round(covxy * covxy / (varx * vary), 6)))
  }

  /** pandas rolling(n).skew(): unbiased sample skewness
    * G1 = n·√(n−1)/(n−2) · Σ(x−μ)³ / (Σ(x−μ)²)^1.5 over each rows
    * window (pandas nanskew formula). `valueCol` must be
    * integer-valued (cents-scale upstream): the four running sums are
    * then exact Longs, so the finalized double replays identically in
    * any engine. Null until minPeriods non-null values, null on
    * zero-variance windows (pandas NaN semantics). One partitioned
    * window, no extra shuffle. */
  def rollingSkew(df: DataFrame, valueCol: String, n: Int,
      orderCols: Seq[String], partitionCols: Seq[String] = Nil,
      minPeriods: Int = -1, outName: String = "rolling_skew"):
      DataFrame = {
    val mp = if (minPeriods < 0) n else minPeriods
    val w = frame(base(orderCols, partitionCols), n, center = false)
    val v = col(valueCol).cast("long")
    val m = count(v).over(w).cast("double")
    val s1 = sum(v).over(w).cast("double")
    val s2 = sum(v * v).over(w).cast("double")
    val s3 = sum(v * v * v).over(w).cast("double")
    val mu = s1 / m
    val c2 = s2 - mu * s1                      // Σ(x−μ)² expanded
    val c3 = s3 - lit(3.0) * mu * s2 + lit(2.0) * mu * mu * s1
    df.withColumn(outName,
      when(count(v).over(w) >= mp && c2 > 0 && m > 2,
        (m * sqrt(m - lit(1.0)) / (m - lit(2.0))) *
          (c3 / pow(c2, 1.5))))
  }

  /** pandas rolling(n).kurt(): unbiased excess kurtosis
    * G2 = n(n+1)(n−1)·Σ(x−μ)⁴ / ((n−2)(n−3)·(Σ(x−μ)²)²)
    *      − 3(n−1)² / ((n−2)(n−3))
    * (pandas nankurt formula). Same exact-integer-sum contract as
    * [[rollingSkew]]; beware 4th-power magnitude — keep |x| ≤ ~50k so
    * x⁴·n fits a Long. */
  def rollingKurt(df: DataFrame, valueCol: String, n: Int,
      orderCols: Seq[String], partitionCols: Seq[String] = Nil,
      minPeriods: Int = -1, outName: String = "rolling_kurt"):
      DataFrame = {
    val mp = if (minPeriods < 0) n else minPeriods
    val w = frame(base(orderCols, partitionCols), n, center = false)
    val v = col(valueCol).cast("long")
    val m = count(v).over(w).cast("double")
    val s1 = sum(v).over(w).cast("double")
    val s2 = sum(v * v).over(w).cast("double")
    val s3 = sum(v * v * v).over(w).cast("double")
    val s4 = sum(v * v * v * v).over(w).cast("double")
    val mu = s1 / m
    val c2 = s2 - mu * s1
    val c4 = s4 - lit(4.0) * mu * s3 + lit(6.0) * mu * mu * s2 -
      lit(3.0) * mu * mu * mu * s1
    df.withColumn(outName,
      when(count(v).over(w) >= mp && c2 > 0 && m > 3,
        m * (m + lit(1.0)) * (m - lit(1.0)) * c4 /
          ((m - lit(2.0)) * (m - lit(3.0)) * c2 * c2) -
          lit(3.0) * (m - lit(1.0)) * (m - lit(1.0)) /
            ((m - lit(2.0)) * (m - lit(3.0)))))
  }

  /** pandas rolling(n).quantile(q, interpolation='linear') /
    * .median(): the window's non-null values are materialized as a
    * sorted array per row (collect_list over the rows frame — O(n)
    * state per row, so for the window sizes rolling stats are used at;
    * this is exactly the buffer any exact rolling quantile needs),
    * then linearly interpolated at rank h = (cnt−1)·q. Null until
    * minPeriods non-null values. */
  def rollingQuantile(df: DataFrame, valueCol: String, n: Int,
      q: Double, orderCols: Seq[String],
      partitionCols: Seq[String] = Nil, minPeriods: Int = -1,
      outName: String = "rolling_q"): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantile q=$q must be in [0,1]")
    val mp = if (minPeriods < 0) n else minPeriods
    val w = frame(base(orderCols, partitionCols), n, center = false)
    val arr = array_sort(collect_list(col(valueCol).cast("double")).over(w))
    val cnt = size(arr)
    val h = (cnt - 1).cast("double") * lit(q)
    val lo = floor(h).cast("int")
    val vLo = element_at(arr, lo + 1)
    val vHi = element_at(arr, least(lo + 2, cnt))
    df.withColumn(outName,
      when(cnt >= mp, vLo + (h - lo.cast("double")) * (vHi - vLo)))
  }

  def rollingMedian(df: DataFrame, valueCol: String, n: Int,
      orderCols: Seq[String], partitionCols: Seq[String] = Nil,
      minPeriods: Int = -1,
      outName: String = "rolling_median"): DataFrame =
    rollingQuantile(df, valueCol, n, 0.5, orderCols, partitionCols,
      minPeriods, outName)

  /** Hampel outlier filter: flag x_i when
    * |x_i − med_i| > k·1.4826·MAD_i, with med_i / MAD_i the median
    * and median-absolute-deviation of the CENTERED n-window (the
    * robust despiking standard; 1.4826 makes MAD a σ estimate under
    * normality). One collect_list window buffer per row (the same
    * exact-quantile state [[rollingQuantile]] uses); the filtered
    * column replaces flagged points with the window median. Nulls
    * pass through unflagged. */
  def hampel(df: DataFrame, valueCol: String, n: Int,
      orderCols: Seq[String], partitionCols: Seq[String] = Nil,
      k: Double = 3.0): DataFrame = {
    val w = frame(base(orderCols, partitionCols), n, center = true)
    val v = col(valueCol).cast("double")
    def medOf(a: Column) = {
      val c = size(a)
      val h = (c - 1).cast("double") * lit(0.5)
      val lo = floor(h).cast("int")
      val vLo = element_at(a, lo + 1)
      val vHi = element_at(a, least(lo + 2, c))
      // guard the empty window (all-null values in the span):
      // element_at(a, 1) on an empty array throws under ANSI mode;
      // emit null med/MAD so null-only windows pass through unflagged
      when(c > 0, vLo + (h - lo.cast("double")) * (vHi - vLo))
    }
    // window results land in intermediate columns first: lambda
    // bodies cannot nest window expressions, outer refs are fine
    val med = col("__hmed__"); val mad = col("__hmad__")
    val flag = v.isNotNull &&
      abs(v - med) > lit(k) * lit(1.4826) * mad
    df.withColumn("__harr__", array_sort(collect_list(v).over(w)))
      .withColumn("__hmed__", medOf(col("__harr__")))
      .withColumn("__hmad__",
        medOf(array_sort(transform(col("__harr__"),
          x => abs(x - col("__hmed__"))))))
      .withColumn("hampel_outlier", flag)
      .withColumn("hampel_filtered",
        round(when(flag, med).otherwise(v), 6))
      .withColumn("hampel_median", round(med, 6))
      .withColumn("hampel_mad", round(mad, 6))
      .drop("__harr__", "__hmed__", "__hmad__")
  }

  /** expanding(minPeriods) (src/series/window.rs:359). */
  def expanding(df: DataFrame, valueCol: String, agg: Column => Column,
      orderCols: Seq[String], partitionCols: Seq[String] = Nil,
      minPeriods: Int = 1, outName: String = "expanding"): DataFrame = {
    val w = base(orderCols, partitionCols)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cnt = count(col(valueCol)).over(w)
    df.withColumn(outName, when(cnt >= minPeriods,
      agg(col(valueCol)).over(w)))
  }

  /** expanding(minPeriods).quantile(q) / .median(): the
    * [[rollingQuantile]] sorted-buffer machinery with an unbounded-
    * preceding frame — exact linear interpolation at h = (cnt−1)·q.
    * NOTE the state is inherently O(rows-per-partition) per row (an
    * exact expanding quantile needs every prior value); for long
    * unbounded series at scale, pre-bin the values (cents-style) or
    * resample first — same regime as the reference's single-node
    * expanding windows. */
  def expandingQuantile(df: DataFrame, valueCol: String, q: Double,
      orderCols: Seq[String], partitionCols: Seq[String] = Nil,
      minPeriods: Int = 1, outName: String = "expanding_q"): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantile q=$q must be in [0,1]")
    val w = base(orderCols, partitionCols)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val arr = array_sort(collect_list(col(valueCol).cast("double")).over(w))
    val cnt = size(arr)
    val h = (cnt - 1).cast("double") * lit(q)
    val lo = floor(h).cast("int")
    val vLo = element_at(arr, lo + 1)
    val vHi = element_at(arr, least(lo + 2, cnt))
    df.withColumn(outName,
      when(cnt >= minPeriods, vLo + (h - lo.cast("double")) * (vHi - vLo)))
  }

  def expandingMedian(df: DataFrame, valueCol: String,
      orderCols: Seq[String], partitionCols: Seq[String] = Nil,
      minPeriods: Int = 1,
      outName: String = "expanding_median"): DataFrame =
    expandingQuantile(df, valueCol, 0.5, orderCols, partitionCols,
      minPeriods, outName)

  /** time-based rolling (src/dataframe/groupby_window.rs:100-164):
    * a range frame of `seconds` over the event-time ordering.
    * `closed` picks the window-edge semantics on the second-granular
    * range (reference WindowClosed, src/series/window.rs:140):
    * "both" = [t−w, t] (default), "right" = (t−w, t],
    * "left" = [t−w, t), "neither" = (t−w, t). */
  def rollingTime(df: DataFrame, valueCol: String, tsCol: String,
      seconds: Long, agg: Column => Column,
      partitionCols: Seq[String] = Nil,
      outName: String = "rolling", closed: String = "both"): DataFrame = {
    val (lo, hi) = closed match {
      case "both" => (-seconds, 0L)
      case "right" => (-seconds + 1, 0L)
      case "left" => (-seconds, -1L)
      case "neither" => (-seconds + 1, -1L)
      case other => throw new IllegalArgumentException(
        s"closed must be both/right/left/neither, got $other")
    }
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(tsCol).cast("long"))
      .rangeBetween(lo, hi)
    df.withColumn(outName, agg(col(valueCol)).over(w))
  }

  /** pandas/reference EWM decay parameterizations → alpha
    * (src/series/window.rs:567-596): span s → 2/(s+1), center of
    * mass c → 1/(1+c), half-life h → 1 − exp(ln(1/2)/h). */
  def alphaFromSpan(span: Double): Double = {
    require(span >= 1, "span >= 1"); 2.0 / (span + 1.0)
  }
  def alphaFromCom(com: Double): Double = {
    require(com >= 0, "com >= 0"); 1.0 / (1.0 + com)
  }
  def alphaFromHalflife(halflife: Double): Double = {
    require(halflife > 0, "halflife > 0")
    1.0 - math.exp(math.log(0.5) / halflife)
  }

  /** Time-decayed EWM mean — pandas `ewm(halflife=…, times=…)`
    * (exceeds the reference, whose EWM is positional only): an
    * observation's weight decays by 0.5^(Δt/halflife) per ELAPSED
    * TIME, so irregular sampling is handled exactly. `timeCol` is a
    * numeric time axis in the same unit as `halflife` (e.g.
    * unix_timestamp seconds); `orderCol` must uniquely key rows
    * within a partition (join-back key; also the tie-break for equal
    * times). pandas supports times with adjust=true mean only — same
    * here. Null values/times are skipped and emit null. Same
    * sorted-fold shape as [[ewmMean]] with the previous time carried
    * in the accumulator. */
  def ewmMeanTime(df: DataFrame, valueCol: String, timeCol: String,
      orderCol: String, partitionCols: Seq[String], halflife: Double,
      outName: String = "ewm_t"): DataFrame = {
    require(halflife > 0, "halflife > 0")
    val grouped = df
      .filter(col(valueCol).isNotNull && col(timeCol).isNotNull)
      .groupBy(partitionCols.map(col): _*)
      .agg(sort_array(collect_list(struct(
        col(timeCol).cast("double").as("t"),
        col(orderCol).as("o"),
        col(valueCol).cast("double").as("v")))).as("__pts__"))
    // compiled EwmFold kernel — bit-equal to the interpreted SQL
    // fold (see ewmMean note)
    val fold = graft.sqlext.EwmFold.ewm_fold(col("__pts__"),
      halflife, graft.sqlext.EwmFold.TimeMean)
    val exploded = grouped.withColumn("__ewm__", explode(fold))
      .select(partitionCols.map(col) :+
        col("__ewm__.o").as(orderCol) :+
        col("__ewm__.e").as(outName): _*)
    df.join(exploded, partitionCols :+ orderCol, "left")
  }

  /** Time-decayed EWM variance — the var sibling of [[ewmMeanTime]]
    * (pandas `ewm(halflife=…, times=…).var()`): weights decay by
    * 0.5^(Δt/halflife) per elapsed time, with the [[ewmVar]]
    * accumulator family (num, den, num2, den2) where den2 carries
    * SQUARED weights (decays by the square of the per-step factor).
    * Biased var = num2/den − (num/den)²; bias=false applies the
    * den²/(den²−den2) reliability debias (null while a single
    * effective observation). With REGULAR spacing Δ it reduces
    * exactly to [[ewmVar]] at α = 1 − 0.5^(Δ/halflife) (spec'd).
    * Same sorted-fold shape and null conventions as
    * [[ewmMeanTime]]. */
  def ewmVarTime(df: DataFrame, valueCol: String, timeCol: String,
      orderCol: String, partitionCols: Seq[String], halflife: Double,
      bias: Boolean = false,
      outName: String = "ewm_t_var"): DataFrame = {
    require(halflife > 0, "halflife > 0")
    val grouped = df
      .filter(col(valueCol).isNotNull && col(timeCol).isNotNull)
      .groupBy(partitionCols.map(col): _*)
      .agg(sort_array(collect_list(struct(
        col(timeCol).cast("double").as("t"),
        col(orderCol).as("o"),
        col(valueCol).cast("double").as("v")))).as("__pts__"))
    // compiled EwmFold kernel — bit-equal to the interpreted SQL
    // fold (see ewmMean note)
    val mode =
      if (bias) graft.sqlext.EwmFold.TimeVarBiased
      else graft.sqlext.EwmFold.TimeVar
    val fold =
      graft.sqlext.EwmFold.ewm_fold(col("__pts__"), halflife, mode)
    val exploded = grouped.withColumn("__ewm__", explode(fold))
      .select(partitionCols.map(col) :+
        col("__ewm__.o").as(orderCol) :+
        col("__ewm__.e").as(outName): _*)
    df.join(exploded, partitionCols :+ orderCol, "left")
  }

  /** Time-decayed EWM standard deviation: sqrt of [[ewmVarTime]]
    * (clamped at 0; nulls stay null — the [[ewmStd]] convention). */
  def ewmStdTime(df: DataFrame, valueCol: String, timeCol: String,
      orderCol: String, partitionCols: Seq[String], halflife: Double,
      bias: Boolean = false,
      outName: String = "ewm_t_std"): DataFrame =
    ewmVarTime(df, valueCol, timeCol, orderCol, partitionCols,
      halflife, bias, outName)
      .withColumn(outName, when(col(outName).isNotNull,
        sqrt(greatest(col(outName), lit(0.0)))))

  /** Time-decayed EWM covariance / correlation — the pairwise member
    * of the halflife-over-times family ([[ewmMeanTime]] /
    * [[ewmVarTime]]): weights decay by 0.5^(Δt/halflife) per elapsed
    * time, with the seven pairwise accumulators of [[ewmCov]] (den2
    * decays by the SQUARE of the per-step factor). Pairwise-complete:
    * only rows with both values and a time present enter the fold
    * (the [[ewmMeanTime]] null convention); others emit null. With
    * REGULAR spacing Δ it reduces exactly to [[ewmCov]] at
    * α = 1 − 0.5^(Δ/halflife) (spec'd). corr is the biased ratio —
    * the debias factors cancel, matching the positional form. */
  def ewmCovTime(df: DataFrame, xCol: String, yCol: String,
      timeCol: String, orderCol: String, partitionCols: Seq[String],
      halflife: Double, bias: Boolean = false, corr: Boolean = false,
      outName: String = "ewm_t_cov"): DataFrame = {
    require(halflife > 0, "halflife > 0")
    val grouped = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull &&
        col(timeCol).isNotNull)
      .groupBy(partitionCols.map(col): _*)
      .agg(sort_array(collect_list(struct(
        col(timeCol).cast("double").as("t"),
        col(orderCol).as("o"),
        col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y")))).as("__pts__"))
    // compiled EwmFold kernel — bit-equal to the interpreted SQL
    // fold (see ewmMean note)
    val mode =
      if (corr) graft.sqlext.EwmFold.TimeCorr
      else if (bias) graft.sqlext.EwmFold.TimeCovBiased
      else graft.sqlext.EwmFold.TimeCov
    val fold =
      graft.sqlext.EwmFold.ewm_fold(col("__pts__"), halflife, mode)
    val exploded = grouped.withColumn("__ewm__", explode(fold))
      .select(partitionCols.map(col) :+
        col("__ewm__.o").as(orderCol) :+
        col("__ewm__.e").as(outName): _*)
    df.join(exploded, partitionCols :+ orderCol, "left")
  }

  /** Scale-path EWM (adjust=true): weights below `tol` are truncated,
    * turning the sequential recurrence into a fixed-depth window of
    * K = ⌈ln(tol)/ln(1−α)⌉ lagged terms — an ordinary partitioned
    * window plan (one shuffle, streaming sort), no per-group
    * collect_list. Error is bounded by tol·max|x|; with the default
    * 1e-12 the result is indistinguishable from the exact form at
    * double precision. Use when series are long (the exact ewmMean
    * materializes each group in memory). */
  def ewmMeanTruncated(df: DataFrame, valueCol: String,
      orderCols: Seq[String], partitionCols: Seq[String], alpha: Double,
      tol: Double = 1e-12, outName: String = "ewm"): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    val k = math.ceil(math.log(tol) / math.log1p(-alpha)).toInt.max(1)
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val v = col(valueCol).cast("double")
    val terms = (0 until k).map { j =>
      val wj = math.pow(1.0 - alpha, j)
      val x = if (j == 0) v else lag(v, j).over(w)
      (when(x.isNotNull, lit(wj)).otherwise(lit(0.0)),
        when(x.isNotNull, x * wj).otherwise(lit(0.0)))
    }
    val num = terms.map(_._2).reduce(_ + _)
    val den = terms.map(_._1).reduce(_ + _)
    df.withColumn(outName, when(v.isNotNull, num / den))
  }

  /** Exponentially-weighted moving mean with exact pandas semantics
    * (reference src/series/window.rs:555-715): the one moving window
    * Spark lacks as a primitive. Computed per partition-key with a
    * sorted collect_list + higher-order aggregate fold — the
    * recurrence is inherently sequential in event order, so the
    * parallel unit is the group (fine at scale: groups are bounded
    * series, the fold is codegen'd, no driver involvement).
    *
    * adjust=true:  y_t = Σ w_i x_i / Σ w_i, w_i = (1-α)^(t-i)
    * adjust=false: y_t = (1-α) y_{t-1} + α x_t  (y_0 = x_0)
    *
    * ignoreNa=true (this library's historical default): nulls are
    * skipped entirely — a missing value neither poisons nor resets
    * the recurrence, and null rows emit null. ignoreNa=false is the
    * PANDAS DEFAULT (reference src/series/window.rs:555-602
    * `ignore_na`): weights decay by absolute POSITION, so a gap of g
    * missing rows multiplies every prior weight by (1-α)^g, and
    * missing rows emit the carried (last computed) value. */
  def ewmMean(df: DataFrame, valueCol: String, orderCol: String,
      partitionCols: Seq[String], alpha: Double,
      adjust: Boolean = true, ignoreNa: Boolean = true,
      outName: String = "ewm"): DataFrame = {
    // (partitionCols, orderCol) must uniquely identify rows: the
    // result is joined back on that key.
    val base = if (ignoreNa) df.filter(col(valueCol).isNotNull) else df
    val grouped = base
      .groupBy(partitionCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col(orderCol).as("o"),
        col(valueCol).cast("double").as("v")))).as("__pts__"))
    // fold over the ordered points with the compiled EwmFold kernel
    // (sqlext/EwmFold.scala): bit-equal accumulator updates and
    // emitted values in identical IEEE order to the interpreted
    // aggregate(...) SQL fold this replaced, but an O(n) compiled
    // loop instead of an interpreted per-element lambda with an
    // O(n²) outp-array append (see OPTIMIZATION_r10.md q319)
    val mode =
      if (adjust && ignoreNa) graft.sqlext.EwmFold.MeanAdj
      else if (adjust) graft.sqlext.EwmFold.MeanAdjKeepNa
      else if (ignoreNa) graft.sqlext.EwmFold.MeanRec
      else graft.sqlext.EwmFold.MeanRecKeepNa
    val fold =
      graft.sqlext.EwmFold.ewm_fold(col("__pts__"), alpha, mode)
    val exploded = grouped.withColumn("__ewm__", explode(fold))
      .select(partitionCols.map(col) :+
        col("__ewm__.o").as(orderCol) :+
        col("__ewm__.e").as(outName): _*)
    df.join(exploded, partitionCols :+ orderCol, "left")
  }

  /** Exponentially-weighted moving variance (reference
    * src/series/window.rs:640-715 implements mean+std+var; we mirror
    * pandas adjust=true semantics). Same sorted-fold shape as
    * [[ewmMean]] with four accumulators:
    *
    *   den  = Σ w_i,  num  = Σ w_i x_i,
    *   num2 = Σ w_i x_i², den2 = Σ w_i²,   w_i = (1−α)^(t−i)
    *
    * biased var = num2/den − (num/den)²; bias=false applies the
    * reliability debias den²/(den²−den2) (null while den² = den2,
    * i.e. a single effective observation — pandas NaN).
    * ignoreNa=false: positional weight decay across null rows, which
    * emit the carried value (see [[ewmMean]]). */
  def ewmVar(df: DataFrame, valueCol: String, orderCol: String,
      partitionCols: Seq[String], alpha: Double, bias: Boolean = false,
      ignoreNa: Boolean = true,
      outName: String = "ewm_var"): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    val base = if (ignoreNa) df.filter(col(valueCol).isNotNull) else df
    val grouped = base
      .groupBy(partitionCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col(orderCol).as("o"),
        col(valueCol).cast("double").as("v")))).as("__pts__"))
    // fold with the compiled EwmFold kernel — bit-equal to the
    // interpreted aggregate(...) SQL fold (see ewmMean note): four
    // accumulators (num/den/num2/den2), post-update emit, null
    // points under ignore_na=false decaying without adding
    val mode =
      if (bias && ignoreNa) graft.sqlext.EwmFold.VarBiased
      else if (bias) graft.sqlext.EwmFold.VarBiasedKeepNa
      else if (ignoreNa) graft.sqlext.EwmFold.Var
      else graft.sqlext.EwmFold.VarKeepNa
    val fold =
      graft.sqlext.EwmFold.ewm_fold(col("__pts__"), alpha, mode)
    val exploded = grouped.withColumn("__ewm__", explode(fold))
      .select(partitionCols.map(col) :+
        col("__ewm__.o").as(orderCol) :+
        col("__ewm__.e").as(outName): _*)
    df.join(exploded, partitionCols :+ orderCol, "left")
  }

  /** Exponentially-weighted moving covariance / correlation between
    * two columns (pandas ewm().cov()/.corr() — the pairwise
    * extension of [[ewmVar]], reference src/series/window.rs stops at
    * single-series EWM). Same sorted-fold shape with seven
    * accumulators (Σw, Σw², Σwx, Σwy, Σwxy, Σwx², Σwy²), pairwise-
    * complete: a row where either column is null adds no observation.
    * ignoreNa=true (historical default): such rows are dropped from
    * the fold entirely and emit null — pandas ignore_na=True
    * semantics. ignoreNa=false (the PANDAS DEFAULT): the gap still
    * decays every weight by (1-α) and the row emits the carried
    * value. cov applies the den²/(den²−den2) debias unless `bias`;
    * corr is the biased ratio cov_b/√(varx_b·vary_b) — the debias
    * factors cancel, matching pandas. */
  def ewmCov(df: DataFrame, xCol: String, yCol: String,
      orderCol: String, partitionCols: Seq[String], alpha: Double,
      bias: Boolean = false, corr: Boolean = false,
      ignoreNa: Boolean = true,
      outName: String = "ewm_cov"): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    val base =
      if (ignoreNa) df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      else df
    val grouped = base
      .groupBy(partitionCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col(orderCol).as("o"),
        col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y")))).as("__pts__"))
    // compiled EwmFold kernel — bit-equal to the interpreted SQL
    // fold (see ewmMean note), incl. Spark's NaN-is-largest CASE
    // guard semantics under a leading-null keepna prefix
    val mode =
      if (corr) (if (ignoreNa) graft.sqlext.EwmFold.CorrPos
                 else graft.sqlext.EwmFold.CorrPosKeepNa)
      else if (bias) (if (ignoreNa) graft.sqlext.EwmFold.CovPosBiased
                      else graft.sqlext.EwmFold.CovPosBiasedKeepNa)
      else (if (ignoreNa) graft.sqlext.EwmFold.CovPos
            else graft.sqlext.EwmFold.CovPosKeepNa)
    val fold =
      graft.sqlext.EwmFold.ewm_fold(col("__pts__"), alpha, mode)
    val exploded = grouped.withColumn("__ewm__", explode(fold))
      .select(partitionCols.map(col) :+
        col("__ewm__.o").as(orderCol) :+
        col("__ewm__.e").as(outName): _*)
    df.join(exploded, partitionCols :+ orderCol, "left")
  }

  /** pandas ewm().corr() — [[ewmCov]] with the biased-ratio
    * correlation output. */
  def ewmCorr(df: DataFrame, xCol: String, yCol: String,
      orderCol: String, partitionCols: Seq[String], alpha: Double,
      ignoreNa: Boolean = true,
      outName: String = "ewm_corr"): DataFrame =
    ewmCov(df, xCol, yCol, orderCol, partitionCols, alpha,
      corr = true, ignoreNa = ignoreNa, outName = outName)

  /** EWM standard deviation: sqrt of [[ewmVar]] (clamped at 0 so a
    * −1 ulp variance cannot produce NaN; nulls stay null — greatest()
    * alone would silently turn them into 0). */
  def ewmStd(df: DataFrame, valueCol: String, orderCol: String,
      partitionCols: Seq[String], alpha: Double, bias: Boolean = false,
      ignoreNa: Boolean = true,
      outName: String = "ewm_std"): DataFrame =
    ewmVar(df, valueCol, orderCol, partitionCols, alpha, bias,
      ignoreNa, outName)
      .withColumn(outName, when(col(outName).isNotNull,
        sqrt(greatest(col(outName), lit(0.0)))))

  /** Per-point EWM state machine — the ONE implementation of the
    * exact O(1)-per-row recurrence, shared by [[ewmScalable]] (batch
    * mapPartitions) and
    * [[graft.streaming.StreamOps.ewmStream]] (flatMapGroupsWithState
    * across micro-batches), so the two paths are bit-equal to each
    * other and to the fold forms by construction. Arithmetic is the
    * identical update order to [[ewmMean]]/[[ewmVar]]. */
  private[graft] final class EwmMachine(a: Double, stat: String,
      adjust: Boolean, bias: Boolean, ignoreNa: Boolean)
      extends Serializable {
    require(a > 0 && a < 1, "alpha in (0,1)")
    require(Seq("mean", "var", "std").contains(stat), s"stat=$stat")
    private val statMean = stat == "mean"
    private val statStd = stat == "std"
    var num = 0.0; var den = 0.0; var num2 = 0.0; var den2 = 0.0
    var prev = 0.0; var hasPrev = false // adjust=false mean state
    var prevOw = 0.0 // adjust=false ignore_na=false old_wt state
    def reset(): Unit = {
      num = 0.0; den = 0.0; num2 = 0.0; den2 = 0.0
      prev = 0.0; hasPrev = false; prevOw = 0.0
    }
    def restore(n: Double, d: Double, n2: Double, d2: Double,
        p: Double, hp: Boolean, ow: Double): Unit = {
      num = n; den = d; num2 = n2; den2 = d2
      prev = p; hasPrev = hp; prevOw = ow
    }
    /** Advance on one point (`isNull` = missing value; `x` ignored
      * then) and return the emitted statistic, or null. */
    def step(isNull: Boolean, x: Double): Any =
      if (isNull && ignoreNa) null
      else if (isNull) {
        // ignore_na=false (pandas default): the gap decays every
        // accumulator without adding an observation; emit the
        // carried value (identical to the fold forms)
        num *= (1.0 - a); den *= (1.0 - a)
        num2 *= (1.0 - a); den2 *= (1.0 - a) * (1.0 - a)
        prevOw *= (1.0 - a)
        if (statMean && adjust) {
          if (den > 0.0) num / den else null
        } else if (statMean) {
          if (hasPrev) prev else null
        } else {
          if (den > 0.0) {
            val biased = num2 / den - (num / den) * (num / den)
            val v: Any =
              if (bias) biased
              else if (den * den - den2 > 0.0)
                biased * (den * den) / (den * den - den2)
              else null
            if (statStd && v != null)
              math.sqrt(math.max(v.asInstanceOf[Double], 0.0))
            else v
          } else null
        }
      }
      else {
        if (statMean && adjust) {
          num = (1.0 - a) * num + x
          den = (1.0 - a) * den + 1.0
          num / den
        } else if (statMean && ignoreNa) {
          // boolean init flag, NOT a NaN sentinel: a NaN data value
          // must poison the recurrence exactly like the fold form
          prev = if (!hasPrev) x else (1.0 - a) * prev + a * x
          hasPrev = true
          prev
        } else if (statMean) {
          // pandas old_wt recursion (new_wt = alpha)
          if (!hasPrev) { prev = x; prevOw = 1.0 }
          else {
            val ow = (1.0 - a) * prevOw
            prev = (ow * prev + a * x) / (ow + a)
            prevOw = 1.0
          }
          hasPrev = true
          prev
        } else {
          num = (1.0 - a) * num + x
          den = (1.0 - a) * den + 1.0
          num2 = (1.0 - a) * num2 + x * x
          den2 = (1.0 - a) * (1.0 - a) * den2 + 1.0
          val biased = num2 / den - (num / den) * (num / den)
          val v: Any =
            if (bias) biased
            else if (den * den - den2 > 0.0)
              biased * (den * den) / (den * den - den2)
            else null
          if (statStd && v != null)
            math.sqrt(math.max(v.asInstanceOf[Double], 0.0))
          else v
        }
      }
  }

  /** Per-point PAIRWISE EWM state machine — cov/corr sibling of
    * [[EwmMachine]] with the seven accumulators of [[ewmCov]]
    * (Σw, Σw², Σwx, Σwy, Σwxy, Σwx², Σwy²), identical update order
    * so [[ewmCovScalable]] is bit-equal to the fold form. */
  private[graft] final class EwmPairMachine(a: Double, bias: Boolean,
      corr: Boolean, ignoreNa: Boolean) extends Serializable {
    require(a > 0 && a < 1, "alpha in (0,1)")
    var den = 0.0; var den2 = 0.0
    var sx = 0.0; var sy = 0.0; var sxy = 0.0
    var sxx = 0.0; var syy = 0.0
    def reset(): Unit = {
      den = 0.0; den2 = 0.0; sx = 0.0; sy = 0.0
      sxy = 0.0; sxx = 0.0; syy = 0.0
    }
    def restore(d: Double, d2: Double, x1: Double, y1: Double,
        xy: Double, xx: Double, yy: Double): Unit = {
      den = d; den2 = d2; sx = x1; sy = y1
      sxy = xy; sxx = xx; syy = yy
    }
    private def emit(corrOut: Boolean): Any =
      if (den > 0.0) {
        val covB = sxy / den - (sx / den) * (sy / den)
        val varxB = sxx / den - (sx / den) * (sx / den)
        val varyB = syy / den - (sy / den) * (sy / den)
        if (corrOut) {
          if (varxB * varyB > 0.0) covB / math.sqrt(varxB * varyB)
          else null
        } else if (bias) covB
        else if (den * den - den2 > 0.0)
          covB * (den * den) / (den * den - den2)
        else null
      } else null
    /** Advance the accumulators on one point without emitting. */
    private def advance(incomplete: Boolean, x: Double,
        y: Double): Unit =
      if (incomplete) {
        // pairwise-incomplete row under ignore_na=false: decay every
        // accumulator (den2 by (1-α)²) without adding, emit carried
        den *= (1.0 - a); den2 *= (1.0 - a) * (1.0 - a)
        sx *= (1.0 - a); sy *= (1.0 - a); sxy *= (1.0 - a)
        sxx *= (1.0 - a); syy *= (1.0 - a)
      } else {
        den = (1.0 - a) * den + 1.0
        den2 = (1.0 - a) * (1.0 - a) * den2 + 1.0
        sx = (1.0 - a) * sx + x
        sy = (1.0 - a) * sy + y
        sxy = (1.0 - a) * sxy + x * y
        sxx = (1.0 - a) * sxx + x * x
        syy = (1.0 - a) * syy + y * y
      }
    /** Advance on one point; `incomplete` = either side missing. */
    def step(incomplete: Boolean, x: Double, y: Double): Any =
      if (incomplete && ignoreNa) null
      else { advance(incomplete, x, y); emit(corr) }
    /** Advance ONCE, emit BOTH the cov (per `bias`) and the corr —
      * the two statistics share all seven accumulators, so a caller
      * needing both pays one pass instead of two (bit-equal by
      * construction: identical advance, identical emit formulas). */
    def stepBoth(incomplete: Boolean, x: Double,
        y: Double): (Any, Any) =
      if (incomplete && ignoreNa) (null, null)
      else {
        advance(incomplete, x, y)
        (emit(corrOut = false), emit(corrOut = true))
      }
  }

  /** EXACT streaming EWM at scale: repartition by key, secondary-sort
    * within partitions, one O(n) stateful pass per partition
    * (`mapPartitions` with group-change detection — constant memory,
    * no per-group array materialization, no O(n²) fold copying).
    * Arithmetic is the identical recurrence to [[ewmMean]]/[[ewmVar]],
    * so results are bit-equal to the fold forms. `stat`: "mean" |
    * "var" | "std"; var/std use adjust=true weights like [[ewmVar]].
    * Rows with null values emit null and do not advance the state.
    *
    * This is the long-series exact path (the truncated variants trade
    * a ≤tol error for an ordinary window plan; this one keeps exact
    * semantics at O(n) streaming cost). */
  def ewmScalable(df: DataFrame, valueCol: String, orderCol: String,
      partitionCols: Seq[String], alpha: Double, stat: String = "mean",
      adjust: Boolean = true, bias: Boolean = false,
      ignoreNa: Boolean = true,
      outName: String = "ewm"): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    require(Seq("mean", "var", "std").contains(stat), s"stat=$stat")
    require(partitionCols.nonEmpty, "partitionCols required")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val base = df.select(partitionCols.map(col) :+ col(orderCol) :+
      col(valueCol).cast("double").as("__v__"): _*)
    val sorted = base.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols :+ orderCol).map(col): _*)
    val schema = StructType(sorted.schema.fields.dropRight(1) :+
      StructField(outName, DoubleType, nullable = true))
    val nKeys = partitionCols.size
    val vIdx = nKeys + 1
    val a = alpha
    val out = sorted.mapPartitions { it =>
      var curKey: Array[Any] = null
      val m = new EwmMachine(a, stat, adjust, bias, ignoreNa)
      // deep element compare: BinaryType keys are Array[Byte], where
      // Seq equality would degrade to reference equality and reset
      // the state on every row
      def sameKey(r: Row): Boolean = {
        if (curKey == null) return false
        var i = 0
        while (i < nKeys) {
          if (!java.util.Objects.deepEquals(curKey(i), r.get(i)))
            return false
          i += 1
        }
        true
      }
      it.map { r =>
        if (!sameKey(r)) {
          curKey = Array.tabulate(nKeys)(r.get)
          m.reset()
        }
        val e: Any =
          m.step(r.isNullAt(vIdx),
            if (r.isNullAt(vIdx)) 0.0 else r.getDouble(vIdx))
        val outVals = new Array[Any](vIdx + 1)
        var i = 0
        while (i < vIdx) { outVals(i) = r.get(i); i += 1 }
        outVals(vIdx) = e
        Row.fromSeq(outVals.toIndexedSeq)
      }
    }(Encoders.row(schema))
    // output is (partitionCols…, orderCol, outName): join back on the
    // key + order columns if the remaining input columns are needed
    out
  }

  /** Per-point TIME-DECAYED EWM state machine — the halflife-over-
    * times analogue of [[EwmMachine]]: the decay factor is
    * 0.5^(Δt/halflife) per point instead of a constant (1−α), with
    * den2 decaying by its square. Identical update order to the
    * [[ewmMeanTime]]/[[ewmVarTime]] folds (power(0.5, x) is
    * java.lang.Math.pow in both Spark's Pow expression and here),
    * so [[ewmTimeScalable]] is bit-equal to the fold forms. */
  private[graft] final class EwmTimeMachine(halflife: Double,
      stat: String, bias: Boolean) extends Serializable {
    require(halflife > 0, "halflife > 0")
    require(Seq("mean", "var", "std").contains(stat), s"stat=$stat")
    private val statMean = stat == "mean"
    private val statStd = stat == "std"
    var num = 0.0; var den = 0.0; var num2 = 0.0; var den2 = 0.0
    var pt = 0.0; var hasPt = false
    def reset(): Unit = {
      num = 0.0; den = 0.0; num2 = 0.0; den2 = 0.0
      pt = 0.0; hasPt = false
    }
    def restore(n: Double, d: Double, n2: Double, d2: Double,
        t: Double, hp: Boolean): Unit = {
      num = n; den = d; num2 = n2; den2 = d2; pt = t; hasPt = hp
    }
    /** Advance on one VALID point (value and time present — the
      * fold drops others before the recurrence) and return the
      * emitted statistic, or null. StrictMath.pow, NOT Math.pow:
      * Spark's Pow expression evaluates java.lang.StrictMath.pow
      * (platform-deterministic), and the two differ by 1 ulp on
      * some inputs — Math.pow here would break bit-equality with
      * the fold forms. */
    def step(t: Double, x: Double): Any = {
      val dec =
        if (!hasPt) 1.0
        else java.lang.StrictMath.pow(0.5, (t - pt) / halflife)
      num = dec * num + x
      den = dec * den + 1.0
      num2 = dec * num2 + x * x
      den2 = dec * dec * den2 + 1.0
      pt = t; hasPt = true
      if (statMean) num / den
      else {
        val biased = num2 / den - (num / den) * (num / den)
        val v: Any =
          if (bias) biased
          else if (den * den - den2 > 0.0)
            biased * (den * den) / (den * den - den2)
          else null
        if (statStd && v != null)
          math.sqrt(math.max(v.asInstanceOf[Double], 0.0))
        else v
      }
    }
  }

  /** Per-point TIME-DECAYED PAIRWISE EWM state machine — the
    * cov/corr member of the time family, identical update order to
    * the [[ewmCovTime]] fold (StrictMath.pow: see
    * [[EwmTimeMachine]]). */
  private[graft] final class EwmTimePairMachine(halflife: Double,
      bias: Boolean, corr: Boolean) extends Serializable {
    require(halflife > 0, "halflife > 0")
    var den = 0.0; var den2 = 0.0
    var sx = 0.0; var sy = 0.0; var sxy = 0.0
    var sxx = 0.0; var syy = 0.0
    var pt = 0.0; var hasPt = false
    def reset(): Unit = {
      den = 0.0; den2 = 0.0; sx = 0.0; sy = 0.0
      sxy = 0.0; sxx = 0.0; syy = 0.0; pt = 0.0; hasPt = false
    }
    def restore(d: Double, d2: Double, x1: Double, y1: Double,
        xy: Double, xx: Double, yy: Double, t: Double,
        hp: Boolean): Unit = {
      den = d; den2 = d2; sx = x1; sy = y1
      sxy = xy; sxx = xx; syy = yy; pt = t; hasPt = hp
    }
    /** Advance on one COMPLETE point (x, y, t present — the fold
      * drops others) and return the emitted statistic, or null. */
    def step(t: Double, x: Double, y: Double): Any = {
      val dec =
        if (!hasPt) 1.0
        else java.lang.StrictMath.pow(0.5, (t - pt) / halflife)
      den = dec * den + 1.0
      den2 = dec * dec * den2 + 1.0
      sx = dec * sx + x
      sy = dec * sy + y
      sxy = dec * sxy + x * y
      sxx = dec * sxx + x * x
      syy = dec * syy + y * y
      pt = t; hasPt = true
      val covB = sxy / den - (sx / den) * (sy / den)
      val varxB = sxx / den - (sx / den) * (sx / den)
      val varyB = syy / den - (sy / den) * (sy / den)
      if (corr) {
        if (varxB * varyB > 0.0) covB / math.sqrt(varxB * varyB)
        else null
      } else if (bias) covB
      else if (den * den - den2 > 0.0)
        covB * (den * den) / (den * den - den2)
      else null
    }
  }

  /** EXACT time-decayed pairwise EWM at scale — the mapPartitions
    * O(n) path for [[ewmCovTime]] (same regime split as
    * [[ewmCovScalable]] vs [[ewmCov]]): repartition by key,
    * secondary-sort by (timeCol, orderCol), one stateful pass via
    * [[EwmTimePairMachine]], bit-equal to the fold (spec'd +
    * property-tested). Rows with a missing value or time emit null
    * and do not advance state. Output:
    * (partitionCols…, orderCol, outName). */
  def ewmCovTimeScalable(df: DataFrame, xCol: String, yCol: String,
      timeCol: String, orderCol: String, partitionCols: Seq[String],
      halflife: Double, bias: Boolean = false, corr: Boolean = false,
      outName: String = "ewm_t_cov"): DataFrame = {
    require(partitionCols.nonEmpty, "partitionCols required")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val base = df.select(partitionCols.map(col) :+ col(orderCol) :+
      col(timeCol).cast("double").as("__t__") :+
      col(xCol).cast("double").as("__x__") :+
      col(yCol).cast("double").as("__y__"): _*)
    val sorted = base.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(
        (partitionCols.map(col) :+ col("__t__") :+ col(orderCol)): _*)
    val schema = StructType(sorted.schema.fields.dropRight(3) :+
      StructField(outName, DoubleType, nullable = true))
    val nKeys = partitionCols.size
    val tIdx = nKeys + 1
    val xIdx = nKeys + 2
    val yIdx = nKeys + 3
    val h = halflife
    val out = sorted.mapPartitions { it =>
      var curKey: Array[Any] = null
      val m = new EwmTimePairMachine(h, bias, corr)
      def sameKey(r: Row): Boolean = {
        if (curKey == null) return false
        var i = 0
        while (i < nKeys) {
          if (!java.util.Objects.deepEquals(curKey(i), r.get(i)))
            return false
          i += 1
        }
        true
      }
      it.map { r =>
        if (!sameKey(r)) {
          curKey = Array.tabulate(nKeys)(r.get)
          m.reset()
        }
        val e: Any =
          if (r.isNullAt(xIdx) || r.isNullAt(yIdx) ||
            r.isNullAt(tIdx)) null
          else m.step(r.getDouble(tIdx), r.getDouble(xIdx),
            r.getDouble(yIdx))
        val outVals = new Array[Any](tIdx + 1)
        var i = 0
        while (i < nKeys) { outVals(i) = r.get(i); i += 1 }
        outVals(nKeys) = r.get(nKeys)
        outVals(tIdx) = e
        Row.fromSeq(outVals.toIndexedSeq)
      }
    }(Encoders.row(schema))
    out
  }

  /** EXACT time-decayed EWM at scale: the mapPartitions O(n) path
    * for [[ewmMeanTime]]/[[ewmVarTime]]/[[ewmStdTime]], whose
    * collect_list folds are O(n²) in group length (array append per
    * point) — the same regime split as [[ewmScalable]] vs
    * [[ewmMean]]. Repartition by key, secondary-sort by
    * (timeCol, orderCol) — the fold's sort_array order — then one
    * stateful pass per partition via [[EwmTimeMachine]], bit-equal
    * to the fold forms (spec'd). Rows with a null value or time
    * emit null and do not advance the state. Output:
    * (partitionCols…, orderCol, outName). */
  def ewmTimeScalable(df: DataFrame, valueCol: String,
      timeCol: String, orderCol: String, partitionCols: Seq[String],
      halflife: Double, stat: String = "mean", bias: Boolean = false,
      outName: String = "ewm_t"): DataFrame = {
    require(partitionCols.nonEmpty, "partitionCols required")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val base = df.select(partitionCols.map(col) :+ col(orderCol) :+
      col(timeCol).cast("double").as("__t__") :+
      col(valueCol).cast("double").as("__v__"): _*)
    val sorted = base.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(
        (partitionCols.map(col) :+ col("__t__") :+ col(orderCol)): _*)
    val schema = StructType(sorted.schema.fields.dropRight(2) :+
      StructField(outName, DoubleType, nullable = true))
    val nKeys = partitionCols.size
    val tIdx = nKeys + 1
    val vIdx = nKeys + 2
    val h = halflife
    val out = sorted.mapPartitions { it =>
      var curKey: Array[Any] = null
      val m = new EwmTimeMachine(h, stat, bias)
      def sameKey(r: Row): Boolean = {
        if (curKey == null) return false
        var i = 0
        while (i < nKeys) {
          if (!java.util.Objects.deepEquals(curKey(i), r.get(i)))
            return false
          i += 1
        }
        true
      }
      it.map { r =>
        if (!sameKey(r)) {
          curKey = Array.tabulate(nKeys)(r.get)
          m.reset()
        }
        val e: Any =
          if (r.isNullAt(vIdx) || r.isNullAt(tIdx)) null
          else m.step(r.getDouble(tIdx), r.getDouble(vIdx))
        val outVals = new Array[Any](tIdx + 1)
        var i = 0
        while (i < nKeys) { outVals(i) = r.get(i); i += 1 }
        outVals(nKeys) = r.get(nKeys)
        outVals(tIdx) = e
        Row.fromSeq(outVals.toIndexedSeq)
      }
    }(Encoders.row(schema))
    out
  }

  /** EXACT streaming EWM covariance / correlation at scale — the
    * pairwise sibling of [[ewmScalable]]: repartition by key,
    * secondary-sort, one O(n) stateful pass per partition via
    * [[EwmPairMachine]] (constant memory, no per-group array
    * materialization — the [[ewmCov]] fold's array append is O(n²)
    * in group length, so THIS is the long-series path). Identical
    * update order to the fold, hence bit-equal (spec'd on both
    * ignore_na variants). Rows where either column is null follow
    * pairwise-complete semantics: skipped under ignoreNa=true,
    * decay-and-carry under ignoreNa=false. Output columns:
    * (partitionCols…, orderCol, outName). */
  def ewmCovScalable(df: DataFrame, xCol: String, yCol: String,
      orderCol: String, partitionCols: Seq[String], alpha: Double,
      bias: Boolean = false, corr: Boolean = false,
      ignoreNa: Boolean = true,
      outName: String = "ewm_cov"): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    require(partitionCols.nonEmpty, "partitionCols required")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val base = df.select(partitionCols.map(col) :+ col(orderCol) :+
      col(xCol).cast("double").as("__x__") :+
      col(yCol).cast("double").as("__y__"): _*)
    val sorted = base.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols :+ orderCol).map(col): _*)
    val schema = StructType(sorted.schema.fields.dropRight(2) :+
      StructField(outName, DoubleType, nullable = true))
    val nKeys = partitionCols.size
    val xIdx = nKeys + 1
    val yIdx = nKeys + 2
    val a = alpha
    val out = sorted.mapPartitions { it =>
      var curKey: Array[Any] = null
      val m = new EwmPairMachine(a, bias, corr, ignoreNa)
      def sameKey(r: Row): Boolean = {
        if (curKey == null) return false
        var i = 0
        while (i < nKeys) {
          if (!java.util.Objects.deepEquals(curKey(i), r.get(i)))
            return false
          i += 1
        }
        true
      }
      it.map { r =>
        if (!sameKey(r)) {
          curKey = Array.tabulate(nKeys)(r.get)
          m.reset()
        }
        val incomplete = r.isNullAt(xIdx) || r.isNullAt(yIdx)
        val e: Any = m.step(incomplete,
          if (incomplete) 0.0 else r.getDouble(xIdx),
          if (incomplete) 0.0 else r.getDouble(yIdx))
        val outVals = new Array[Any](xIdx + 1)
        var i = 0
        while (i < xIdx) { outVals(i) = r.get(i); i += 1 }
        outVals(xIdx) = e
        Row.fromSeq(outVals.toIndexedSeq)
      }
    }(Encoders.row(schema))
    out
  }

  /** pandas ewm().corr() at scale — [[ewmCovScalable]] with the
    * biased-ratio correlation output. */
  def ewmCorrScalable(df: DataFrame, xCol: String, yCol: String,
      orderCol: String, partitionCols: Seq[String], alpha: Double,
      ignoreNa: Boolean = true,
      outName: String = "ewm_corr"): DataFrame =
    ewmCovScalable(df, xCol, yCol, orderCol, partitionCols, alpha,
      corr = true, ignoreNa = ignoreNa, outName = outName)

  /** ONE-PASS cov + corr at scale (round-11, guide §2.4): both
    * statistics share the seven [[EwmPairMachine]] accumulators, so
    * a caller that needs cov AND corr (the q333 shape: previously
    * two identical repartition+sort passes joined back on the key)
    * pays a single repartition + secondary sort + O(n) pass. Values
    * are bit-equal to [[ewmCovScalable]] / [[ewmCorrScalable]] run
    * separately — identical state advance, identical emit formulas.
    * Output columns: (partitionCols…, orderCol, covName, corrName). */
  def ewmCovCorrScalable(df: DataFrame, xCol: String, yCol: String,
      orderCol: String, partitionCols: Seq[String], alpha: Double,
      bias: Boolean = false, ignoreNa: Boolean = true,
      covName: String = "ewm_cov",
      corrName: String = "ewm_corr"): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    require(partitionCols.nonEmpty, "partitionCols required")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val base = df.select(partitionCols.map(col) :+ col(orderCol) :+
      col(xCol).cast("double").as("__x__") :+
      col(yCol).cast("double").as("__y__"): _*)
    val sorted = base.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols :+ orderCol).map(col): _*)
    val schema = StructType(sorted.schema.fields.dropRight(2) :+
      StructField(covName, DoubleType, nullable = true) :+
      StructField(corrName, DoubleType, nullable = true))
    val nKeys = partitionCols.size
    val xIdx = nKeys + 1
    val yIdx = nKeys + 2
    val a = alpha
    sorted.mapPartitions { it =>
      var curKey: Array[Any] = null
      val m = new EwmPairMachine(a, bias, corr = false, ignoreNa)
      def sameKey(r: Row): Boolean = {
        if (curKey == null) return false
        var i = 0
        while (i < nKeys) {
          if (!java.util.Objects.deepEquals(curKey(i), r.get(i)))
            return false
          i += 1
        }
        true
      }
      it.map { r =>
        if (!sameKey(r)) {
          curKey = Array.tabulate(nKeys)(r.get)
          m.reset()
        }
        val incomplete = r.isNullAt(xIdx) || r.isNullAt(yIdx)
        val (cv, cr) = m.stepBoth(incomplete,
          if (incomplete) 0.0 else r.getDouble(xIdx),
          if (incomplete) 0.0 else r.getDouble(yIdx))
        val outVals = new Array[Any](xIdx + 2)
        var i = 0
        while (i < xIdx) { outVals(i) = r.get(i); i += 1 }
        outVals(xIdx) = cv
        outVals(xIdx + 1) = cr
        Row.fromSeq(outVals.toIndexedSeq)
      }
    }(Encoders.row(schema))
  }

  /** Scale-path EWM variance: truncated weights like
    * [[ewmMeanTruncated]] — a fixed-depth lag window instead of the
    * sequential fold, bounded error tol·max|x|². */
  def ewmVarTruncated(df: DataFrame, valueCol: String,
      orderCols: Seq[String], partitionCols: Seq[String], alpha: Double,
      bias: Boolean = false, tol: Double = 1e-12,
      outName: String = "ewm_var"): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    val k = math.ceil(math.log(tol) / math.log1p(-alpha)).toInt.max(1)
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val v = col(valueCol).cast("double")
    val terms = (0 until k).map { j =>
      val wj = math.pow(1.0 - alpha, j)
      val x = if (j == 0) v else lag(v, j).over(w)
      (when(x.isNotNull, lit(wj)).otherwise(lit(0.0)),
        when(x.isNotNull, x * wj).otherwise(lit(0.0)),
        when(x.isNotNull, x * x * wj).otherwise(lit(0.0)),
        when(x.isNotNull, lit(wj * wj)).otherwise(lit(0.0)))
    }
    val den = terms.map(_._1).reduce(_ + _)
    val num = terms.map(_._2).reduce(_ + _)
    val num2 = terms.map(_._3).reduce(_ + _)
    val den2 = terms.map(_._4).reduce(_ + _)
    val biased = num2 / den - (num / den) * (num / den)
    val out =
      if (bias) biased
      else when(den * den - den2 > 0.0,
        biased * (den * den) / (den * den - den2))
    df.withColumn(outName, when(v.isNotNull, out))
  }
}
