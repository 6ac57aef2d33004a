package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model evaluation metrics (reference src/ml/metrics/
  * classification.rs:78-198, regression.rs:64-201). Every metric is
  * one aggregate pass over (truth, prediction) columns — sufficient
  * statistics shuffle one row, derived ratios are closed-form — so
  * they run unchanged over 100 TB of scored predictions.
  *
  * For cross-engine reproducibility the regression sums accumulate in
  * DECIMAL(38,0) when both columns are integer-typed (the cents
  * pattern), falling back to double sums otherwise.
  */
object MlMetrics {

  /** accuracy / precision / recall / F1 + the confusion counts, from
    * boolean truth/prediction columns. One aggregate; exact integer
    * counts; derived doubles by identical closed forms. */
  def classificationMetrics(df: DataFrame, labelCol: String,
      predCol: String): DataFrame = {
    val y = col(labelCol).cast("boolean")
    val p = col(predCol).cast("boolean")
    def cnt(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    df.filter(y.isNotNull && p.isNotNull)
      .agg(
        cnt(y && p).as("tp"), cnt(!y && p).as("fp"),
        cnt(y && !p).as("fn"), cnt(!y && !p).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        round((col("tp") + col("tn")).cast("double") /
          (col("tp") + col("fp") + col("fn") + col("tn")), 6)
          .as("accuracy"),
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6)
          .as("precision"),
        round(col("tp").cast("double") / (col("tp") + col("fn")), 6)
          .as("recall"),
        round(lit(2.0) * col("tp") /
          (lit(2.0) * col("tp") + col("fp") + col("fn")), 6)
          .as("f1"))
  }

  /** Multiclass one-vs-rest classification report: per class, exact
    * support/tp/fp/fn and precision/recall/F1 (sklearn
    * `classification_report` semantics; a class with zero
    * predictions gets null precision — feed [[multiclassMacro]],
    * which applies the zero_division=0 convention). Three
    * class-keyed aggregations joined on the class domain — exact
    * integers, scales as a groupBy. */
  def multiclassReport(df: DataFrame, labelCol: String,
      predCol: String): DataFrame = {
    val base = df.filter(col(labelCol).isNotNull &&
        col(predCol).isNotNull)
      .select(col(labelCol).as("y"), col(predCol).as("p"))
    val classes = base.select(col("y").as("cls"))
      .union(base.select(col("p").as("cls"))).distinct()
    val tp = base.filter(col("y") === col("p"))
      .groupBy(col("y").as("cls")).agg(count(lit(1)).as("tp"))
    val sup = base.groupBy(col("y").as("cls"))
      .agg(count(lit(1)).as("support"))
    val prd = base.groupBy(col("p").as("cls"))
      .agg(count(lit(1)).as("predicted"))
    classes
      .join(tp, Seq("cls"), "left")
      .join(sup, Seq("cls"), "left")
      .join(prd, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("predicted"), lit(0L)).as("predicted"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("fp", col("predicted") - col("tp"))
      .withColumn("fn", col("support") - col("tp"))
      .withColumn("precision", when(col("predicted") > 0,
        col("tp").cast("double") / col("predicted")))
      .withColumn("recall", when(col("support") > 0,
        col("tp").cast("double") / col("support")))
      .withColumn("f1", when(col("support") + col("predicted") > 0,
        lit(2.0) * col("tp") / (col("support") + col("predicted"))))
  }

  /** Macro/micro summary of [[multiclassReport]]: micro accuracy
    * (Σtp over n, exact ppm) and macro-averaged precision/recall/F1
    * with the sklearn zero_division=0 convention; per-class terms
    * rounded to 12 decimals and DECIMAL-summed (order-free). */
  def multiclassMacro(report: DataFrame): DataFrame = {
    def dsum(c: org.apache.spark.sql.Column) =
      sum(round(coalesce(c, lit(0.0)), 12).cast("decimal(38,12)"))
    report.agg(count(lit(1)).as("k"),
        sum(col("support")).as("n"), sum(col("tp")).as("tpsum"),
        dsum(col("precision")).as("ps"), dsum(col("recall")).as("rs"),
        dsum(col("f1")).as("fs"))
      .select(col("k").cast("long").as("n_classes"),
        col("n").cast("long").as("n"),
        expr("tpsum * 1000000 div n").as("accuracy_ppm"),
        (col("ps").cast("double") / col("k")).as("macro_precision"),
        (col("rs").cast("double") / col("k")).as("macro_recall"),
        (col("fs").cast("double") / col("k")).as("macro_f1"))
  }

  /** Multiclass Matthews correlation (Gorodkin 2004 R_K) from
    * [[multiclassReport]]'s exact cells:
    *   R_K = (c·s − Σ_k p_k·t_k) /
    *         (√(s² − Σp_k²) · √(s² − Σt_k²))
    * with c = Σtp (trace), s = n, p_k = predicted, t_k = support —
    * the chance-corrected single number that, unlike accuracy,
    * survives class imbalance. All sums exact BIGINTs; the two
    * √ factors are separate (each operand < 2⁶³ where the product
    * would overflow), identical tree in the oracle. Null when a
    * factor is 0 (a degenerate margin). */
  def multiclassMcc(report: DataFrame): DataFrame =
    report.agg(sum(col("support")).as("n"), sum(col("tp")).as("c"),
        sum(col("support") * col("predicted")).as("pt"),
        sum(col("predicted") * col("predicted")).as("p2"),
        sum(col("support") * col("support")).as("t2"))
      .select(col("n").cast("long").as("n"),
        col("c").cast("long").as("n_correct"),
        when(col("n") * col("n") - col("p2") > 0 &&
            col("n") * col("n") - col("t2") > 0,
          (col("c") * col("n") - col("pt")).cast("double") /
            (sqrt((col("n") * col("n") - col("p2")).cast("double")) *
              sqrt((col("n") * col("n") - col("t2"))
                .cast("double")))).as("mcc"))

  /** ROC operating-point table over the DISTINCT score values (the
    * thresholds "predict positive iff score ≥ t"), with Youden's
    * J = TPR − FPR and an expected-cost column, flagging the
    * J-optimal and cost-optimal thresholds — how a deployed binary
    * classifier's cutoff actually gets picked. Input scores should
    * be lattice-valued for engine replay. Distinct-score aggregate
    * (domain-bounded) + one ordered window over it. */
  def rocThresholds(df: DataFrame, scoreCol: String,
      labelCol: String, costFp: Double = 1.0,
      costFn: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val y = col(labelCol).cast("boolean")
    val s = col(scoreCol).cast("double")
    val per = df.filter(y.isNotNull && s.isNotNull)
      .groupBy(s.as("threshold"))
      .agg(sum(when(y, 1L).otherwise(0L)).as("posc"),
        sum(when(!y, 1L).otherwise(0L)).as("negc"))
    val tot = per.agg(sum("posc").as("np"), sum("negc").as("nn"))
    val w = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = per.crossJoin(broadcast(tot))
      .withColumn("tp", sum("posc").over(w))
      .withColumn("fp", sum("negc").over(w))
      .withColumn("fn", col("np") - col("tp"))
      .withColumn("tpr", when(col("np") > 0,
        col("tp").cast("double") / col("np")))
      .withColumn("fpr", when(col("nn") > 0,
        col("fp").cast("double") / col("nn")))
      .withColumn("youden_j", col("tpr") - col("fpr"))
      .withColumn("exp_cost", lit(costFp) * col("fp") +
        lit(costFn) * col("fn"))
    // ties break to the SMALLER threshold (max of (metric, -t))
    val best = cum.agg(
      max(struct(col("youden_j"), (col("threshold") * -1).as("nt")))
        .as("bj"),
      max(struct((col("exp_cost") * -1).as("nc"),
        (col("threshold") * -1).as("nt"))).as("bc"))
    cum.crossJoin(broadcast(best))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        col("tpr"), col("fpr"), col("youden_j"), col("exp_cost"),
        (struct(col("youden_j"), (col("threshold") * -1).as("nt"))
          === col("bj")).as("is_j_best"),
        (struct((col("exp_cost") * -1).as("nc"),
          (col("threshold") * -1).as("nt")) === col("bc"))
          .as("is_cost_best"))
  }

  /** MSE / MAE / RMSE / R² / explained variance from one aggregate of
    * sufficient sums. Integer-typed inputs accumulate exactly in
    * DECIMAL(38,0) (cross-engine reproducible); others in double. */
  def regressionMetrics(df: DataFrame, yCol: String,
      yhatCol: String): DataFrame = {
    val integral = Seq(yCol, yhatCol).forall(c =>
      df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case d: DecimalType => d.scale == 0
        case _ => false
      })
    val acc = (c: org.apache.spark.sql.Column) =>
      if (integral) c.cast("decimal(38,0)") else c.cast("double")
    val y = acc(col(yCol)); val yh = acc(col(yhatCol))
    val d = y - yh
    val agg = df.filter(col(yCol).isNotNull && col(yhatCol).isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(d).as("sd"), sum(d * d).as("sdd"),
        sum(abs(d)).as("sad"),
        sum(y).as("sy"), sum(y * y).as("syy"))
    val n = col("n").cast("double")
    val sd = col("sd").cast("double"); val sdd = col("sdd").cast("double")
    val sad = col("sad").cast("double")
    val sy = col("sy").cast("double"); val syy = col("syy").cast("double")
    val ssTot = syy - sy * sy / n
    agg.select(col("n").cast("long").as("n"),
      round(sdd / n, 6).as("mse"),
      round(sad / n, 6).as("mae"),
      round(sqrt(sdd / n), 6).as("rmse"),
      round(lit(1.0) - sdd / ssTot, 6).as("r2"),
      round(lit(1.0) - (sdd - sd * sd / n) / ssTot, 6)
        .as("explained_variance"))
  }

  /** ROC-AUC, tie-aware, via the rank-sum identity
    * AUC = (R₊ − n₊(n₊+1)/2) / (n₊ n₋) where R₊ is the sum of
    * AVERAGE ranks of the positives (the Mann-Whitney U scaled to
    * [0,1] — reference sklearn_compat / metrics family).
    *
    * Scale design: ranks come from the DISTINCT-SCORE table through
    * [[graft.stats.StatsOps.distinctValueCumCounts]] (range-bucketed
    * cumulative counts — no global window); the doubled rank sum
    * 2R₊ = Σ_v np_v·(2·below_v + c_v + 1) stays integral in
    * DECIMAL(38,0) so the final AUC is bit-deterministic across
    * engines and partitionings. The only full-data operation is one
    * groupBy(score). */
  def aucRoc(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val y = col(labelCol).cast("boolean")
    val pts = df.filter(col(scoreCol).isNotNull && y.isNotNull)
      .select(col(scoreCol).as("__s__"),
        when(y, 1L).otherwise(0L).as("__y__"))
    val counts = pts.groupBy(col("__s__"))
      .agg(count(lit(1)).as("__c__"), sum(col("__y__")).as("__np__"))
    val cum = graft.stats.StatsOps
      .distinctValueCumCounts(counts, "__s__", "__c__")
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val a = cum.join(counts.select(col("__s__"), col("__np__")), "__s__")
      .agg(
        sum(dec(col("__np__")) *
          (dec(col("__below__")) * 2 + dec(col("__c__")) + 1))
          .as("two_r"),
        sum(col("__np__")).as("n1"), sum(col("__c__")).as("n"))
    a.select(col("n1").cast("long").as("n_pos"),
        (col("n") - col("n1")).cast("long").as("n_neg"),
        round(
          (col("two_r") - dec(col("n1")) * (dec(col("n1")) + 1))
            .cast("double") /
          (dec(col("n1")) * (dec(col("n")) - dec(col("n1"))) * 2)
            .cast("double"), 6).as("auc"))
  }

  /** Log-loss and Brier score of a probability column against a
    * boolean label: −mean(y·ln p + (1−y)·ln(1−p)) and mean((p−y)²).
    * One aggregate pass, map-side partial sums — scales like a sum.
    * Probabilities are clamped to [1e-15, 1−1e-15] (sklearn's
    * convention) so a hard 0/1 never produces −∞. */
  def logLossBrier(df: DataFrame, pCol: String,
      labelCol: String): DataFrame = {
    val yb = col(labelCol).cast("boolean")
    val p0 = col(pCol).cast("double")
    val p = least(greatest(p0, lit(1e-15)), lit(1.0 - 1e-15))
    val y = when(yb, 1.0).otherwise(0.0)
    df.filter(p0.isNotNull && yb.isNotNull)
      .agg(count(lit(1)).cast("long").as("n"),
        round(-avg(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p)), 6)
          .as("log_loss"),
        round(avg((p - y) * (p - y)), 6).as("brier"))
  }

  /** Cohen's kappa and the Matthews correlation coefficient from the
    * same confusion counts as [[classificationMetrics]]. Counts are
    * exact longs; both statistics are closed forms evaluated in
    * double with products taken AFTER the double cast (the count
    * products exceed 2⁶³ long before 100 TB). */
  def kappaMcc(df: DataFrame, labelCol: String,
      predCol: String): DataFrame = {
    val y = col(labelCol).cast("boolean")
    val p = col(predCol).cast("boolean")
    def cnt(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    val base = df.filter(y.isNotNull && p.isNotNull)
      .agg(cnt(y && p).as("tp"), cnt(!y && p).as("fp"),
        cnt(y && !p).as("fn"), cnt(!y && !p).as("tn"))
    val tp = col("tp").cast("double"); val fp = col("fp").cast("double")
    val fn = col("fn").cast("double"); val tn = col("tn").cast("double")
    val n = tp + fp + fn + tn
    val po = (tp + tn) / n
    val pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / (n * n)
    val mccDen =
      sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    base.select(col("tp"), col("fp"), col("fn"), col("tn"),
      round((po - pe) / (lit(1.0) - pe), 6).as("kappa"),
      round((tp * tn - fp * fn) / mccDen, 6).as("mcc"))
  }

  /** Lin's concordance correlation coefficient — agreement between
    * two paired measurements: CCC = 2σ_xy / (σ_x² + σ_y² +
    * (μ_x − μ_y)²) with population moments from one aggregate of
    * exact integer sufficient sums (integral inputs — the cents
    * pattern). */
  def concordanceCcc(df0: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    val df = df0.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val x = dec(col(xCol)); val y = dec(col(yCol))
    val a = df.agg(count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
      sum(x * x).as("sxx"), sum(y * y).as("syy"))
    val n = col("n").cast("double")
    val mx = col("sx").cast("double") / n
    val my = col("sy").cast("double") / n
    val covP = col("sxy").cast("double") / n - mx * my
    val vxP = col("sxx").cast("double") / n - mx * mx
    val vyP = col("syy").cast("double") / n - my * my
    a.select(col("n").cast("long").as("n"),
      round(lit(2.0) * covP /
        (vxP + vyP + (mx - my) * (mx - my)), 6).as("ccc"))
  }

  /** Reliability (calibration) table: fixed-width bins of the
    * predicted probability vs the observed positive rate. The
    * positive fraction derives from exact integer counts; mean_p is
    * a round-6 double average (the theil-gate pattern). Pure
    * groupBy — scales like any aggregation. */
  def calibrationBins(df: DataFrame, pCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    val yb = col(labelCol).cast("boolean")
    val p = col(pCol).cast("double")
    val bin = least(floor(p * nBins), lit(nBins - 1)).cast("long")
    df.filter(p.isNotNull && yb.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).cast("long").as("n"),
        round(avg(p), 6).as("mean_p"),
        round(avg(when(yb, 1.0).otherwise(0.0)), 6).as("frac_pos"))
  }

  /** Lift / gain table over `nBuckets` score-descending buckets.
    * Bucket assignment is a pure function of the count of rows
    * strictly ABOVE each distinct score (floor(nB·above/N), capped) —
    * deterministic under ties and reproducible in any engine, unlike
    * ntile over a global window. Ranks come from the range-bucketed
    * distinct-score cumulative counts; per-bucket stats are one
    * groupBy; the cumulative-gain window runs over ≤ nBuckets rows. */
  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
      nBuckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val y = col(labelCol).cast("boolean")
    val pts = df.filter(col(scoreCol).isNotNull && y.isNotNull)
      .select(col(scoreCol).as("__s__"),
        when(y, 1L).otherwise(0L).as("__y__"))
    val counts = pts.groupBy(col("__s__"))
      .agg(count(lit(1)).as("__c__"), sum(col("__y__")).as("__np__"))
    val cum = graft.stats.StatsOps
      .distinctValueCumCounts(counts, "__s__", "__c__")
      .join(counts.select(col("__s__"), col("__np__")), "__s__")
    val tot = cum.agg(sum(col("__c__")).as("__n__"),
      sum(col("__np__")).as("__npos__"))
    val withTot = cum.crossJoin(broadcast(tot))
    val above = col("__n__") - col("__below__") - col("__c__")
    val bucket = least(
      floor(above.cast("double") * nBuckets / col("__n__")),
      lit(nBuckets - 1)).cast("long")
    val perBucket = withTot
      .groupBy(bucket.as("bucket"))
      .agg(sum(col("__c__")).cast("long").as("n"),
        sum(col("__np__")).cast("long").as("pos"),
        first(col("__n__")).as("__n__"),
        first(col("__npos__")).as("__npos__"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .withColumn("cum_pos", sum(col("pos")).over(w))
      .select(col("bucket"), col("n"), col("pos"),
        round(col("pos").cast("double") / col("n"), 6).as("rate"),
        round((col("pos").cast("double") * col("__n__")) /
          (col("n").cast("double") * col("__npos__")), 6).as("lift"),
        round(col("cum_pos").cast("double") / col("__npos__"), 6)
          .as("cum_gain"))
  }

  /** Pinball (quantile) loss at each q: mean of
    * max(q·(y−ŷ), (q−1)·(y−ŷ)) — the quantile-forecast evaluation
    * metric. One aggregate per call over a bounded q-explode. With
    * integer-valued y/ŷ and dyadic q (k/2^m, e.g. 0.25/0.5/0.75)
    * every per-row term is an exact binary fraction, so the sum — and
    * the hash gate — is order-independent across engines. */
  def pinballLoss(df: DataFrame, yCol: String, yhatCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1),
      "quantiles must be in (0, 1)")
    val d = col(yCol).cast("double") - col(yhatCol).cast("double")
    df.filter(col(yCol).isNotNull && col(yhatCol).isNotNull)
      .select(explode(array(qs.map(lit): _*)).as("q"), d.as("__d__"))
      .groupBy("q")
      .agg(round(sum(greatest(col("q") * col("__d__"),
        (col("q") - lit(1.0)) * col("__d__"))) / count(lit(1)), 6)
        .as("pinball"))
  }

  /** Temperature scaling (Guo et al. 2017) over an explicit
    * temperature grid — the standard one-parameter LLM-confidence
    * calibration: logits z = ln(p/(1−p)) are divided by each
    * candidate T, re-squashed, and the negative log-likelihood
    * profiled; the argmin T is flagged. Like the Box-Cox profile
    * this is a bounded-grid cross join + one per-T aggregate —
    * nothing iterative, nothing driver-side, and the whole profile
    * is engine-replayable. Per-row NLL terms are rounded to 12
    * decimals and summed as DECIMAL (order-free). Probabilities are
    * clamped to [1e-6, 1−1e-6] before the logit so hard 0/1 stay
    * finite (mirrored by the oracle). */
  def temperatureScaling(df: DataFrame, probCol: String,
      labelCol: String, temps: Seq[Double] =
        Seq(0.25, 0.5, 0.75, 1.0, 1.5, 2.0, 4.0)): DataFrame = {
    require(temps.nonEmpty && temps.forall(_ > 0),
      "temperatureScaling needs a positive temperature grid")
    val spark0 = df.sparkSession
    import spark0.implicits._
    val p0 = col(probCol).cast("double")
    val y = col(labelCol).cast("boolean")
    val p = least(greatest(p0, lit(1e-6)), lit(1.0 - 1e-6))
    val base = df.filter(p0.isNotNull && y.isNotNull)
      .select(log(p / (lit(1.0) - p)).as("z"),
        when(y, 1.0).otherwise(0.0).as("yy"))
    val grid = temps.toDF("temp")
    val pt = lit(1.0) / (lit(1.0) + exp(-col("z") / col("temp")))
    val nllTerm = -(col("yy") * log(pt) +
      (lit(1.0) - col("yy")) * log(lit(1.0) - pt))
    val prof = base.crossJoin(broadcast(grid))
      .select(col("temp"),
        round(nllTerm, 12).cast("decimal(30,12)").as("t"))
      .groupBy("temp")
      .agg(count(lit(1)).as("n"), sum("t").as("ts"))
      .withColumn("nll", col("ts").cast("double") / col("n"))
    prof.withColumn("is_best", col("nll") ===
        min("nll").over(org.apache.spark.sql.expressions.Window
          .partitionBy()))
      .select(col("temp"), col("n"), col("nll"), col("is_best"))
  }

  /** Murphy (1973) decomposition of the Brier score:
    * BS = reliability − resolution + uncertainty, with
    * REL = Σ_b n_b(p̄_b − ȳ_b)²/N, RES = Σ_b n_b(ȳ_b − ȳ)²/N,
    * UNC = ȳ(1 − ȳ). BS itself is Σ(p−y)²/N summed exactly on the
    * dyadic lattice; the ≤`bins` REL/RES terms are rounded to 12
    * decimals and summed as DECIMAL (order-free — a plain double
    * sum over shuffled bin rows would be partition-order-dependent).
    * One row out. */
  def brierDecomposition(df: DataFrame, probCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    val p = col(probCol).cast("double")
    val y = col(labelCol).cast("boolean")
    val base = df.filter(p.isNotNull && y.isNotNull && p >= 0 && p <= 1)
      .select(least(floor(p * bins), lit(bins - 1)).cast("int")
        .as("bin"), p.as("p"), when(y, 1L).otherwise(0L).as("y"))
    val tot = base.agg(count(lit(1)).as("nn"), sum("y").as("ny"),
      sum((col("p") - col("y")) * (col("p") - col("y"))).as("bs_sum"))
    val binAgg = base.groupBy("bin")
      .agg(count(lit(1)).as("nb"), sum("p").as("ps"),
        sum("y").as("ys"))
    val terms = binAgg.crossJoin(broadcast(tot))
      .select(
        round(col("nb") * (col("ps") / col("nb") -
          col("ys").cast("double") / col("nb")) *
          (col("ps") / col("nb") -
            col("ys").cast("double") / col("nb")), 12)
          .cast("decimal(30,12)").as("rel_t"),
        round(col("nb") * (col("ys").cast("double") / col("nb") -
          col("ny").cast("double") / col("nn")) *
          (col("ys").cast("double") / col("nb") -
            col("ny").cast("double") / col("nn")), 12)
          .cast("decimal(30,12)").as("res_t"))
      .agg(sum("rel_t").as("rel_s"), sum("res_t").as("res_s"))
    tot.crossJoin(broadcast(terms))
      .select(col("nn").cast("long").as("n"),
        (col("bs_sum") / col("nn")).as("brier"),
        (col("rel_s").cast("double") / col("nn")).as("reliability"),
        (col("res_s").cast("double") / col("nn")).as("resolution"),
        (col("ny").cast("double") / col("nn") *
          (lit(1.0) - col("ny").cast("double") / col("nn")))
          .as("uncertainty"))
  }

  /** Uplift-model evaluation (Radcliffe 2007 Qini): bucket by model
    * score (bucket 0 = highest scores), then per bucket and
    * cumulatively report treated/control sizes and responders, the
    * per-bucket and cumulative uplift, and the Qini value
    * Rt − Rc·Nt/Nc (incremental responders vs a control scaled to
    * the treated volume).
    *
    * Scale/determinism: ONE groupBy over the data; the cumulative
    * window runs over the ≤`buckets`-row aggregate (bounded by
    * construction). Counts are exact BIGINTs; uplift/qini are single
    * left-associated double expressions from exact integers —
    * order-free and engine-replayable. */
  def upliftCurve(df: DataFrame, treatCol: String,
      outcomeCol: String, scoreCol: String,
      buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 2 && buckets <= 1000,
      s"buckets in [2,1000], got $buckets")
    val tr = col(treatCol).cast("boolean")
    val y = col(outcomeCol).cast("boolean")
    val p = col(scoreCol).cast("double")
    val base = df
      .filter(tr.isNotNull && y.isNotNull && p.isNotNull &&
        p >= 0 && p <= 1)
      .select(least(floor(p * buckets), lit(buckets - 1))
        .cast("int").as("bin"),
        when(tr, 1L).otherwise(0L).as("t"),
        when(y, 1L).otherwise(0L).as("yy"))
    val agg = base.groupBy("bin").agg(
      sum("t").as("nt"),
      (count(lit(1)) - sum("t")).as("nc"),
      sum(col("t") * col("yy")).as("rt"),
      sum((lit(1L) - col("t")) * col("yy")).as("rc"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    agg.select((lit(buckets - 1) - col("bin")).as("bucket"),
        col("nt"), col("nc"), col("rt"), col("rc"))
      .withColumn("cum_nt", sum("nt").over(w))
      .withColumn("cum_nc", sum("nc").over(w))
      .withColumn("cum_rt", sum("rt").over(w))
      .withColumn("cum_rc", sum("rc").over(w))
      .select(col("bucket"), col("nt"), col("nc"), col("rt"),
        col("rc"), col("cum_nt"), col("cum_nc"), col("cum_rt"),
        col("cum_rc"),
        when(col("nt") > 0 && col("nc") > 0,
          col("rt").cast("double") / col("nt") -
            col("rc").cast("double") / col("nc")).as("uplift"),
        when(col("cum_nt") > 0 && col("cum_nc") > 0,
          col("cum_rt").cast("double") / col("cum_nt") -
            col("cum_rc").cast("double") / col("cum_nc"))
          .as("cum_uplift"),
        when(col("cum_nc") > 0,
          col("cum_rt").cast("double") -
            col("cum_rc").cast("double") * col("cum_nt") /
              col("cum_nc")).as("qini"))
  }

  /** Off-policy evaluation of a deterministic target policy from
    * logged bandit data (Horvitz-Thompson / self-normalized IPS —
    * Swaminathan & Joachims 2015): rows carry the logged action, its
    * logging propensity, the observed reward, and the action the
    * TARGET policy would take. Reports
    *   V_IPS   = (1/n) Σ 1{a = π(x)} · r / p
    *   V_SNIPS = Σ 1{a = π(x)} · r/p  /  Σ 1{a = π(x)} · 1/p
    * plus the effective sample size ESS = (Σw)²/Σw² of the matched
    * importance weights — the "how much data is really behind this
    * estimate" diagnostic.
    *
    * Determinism/scale: one aggregate; each w, w·r and w² term is
    * rounded to 12 decimals and DECIMAL-summed (order-free). Pass a
    * lattice-valued propensity (e.g. k/1024) and integer rewards for
    * exact per-row terms. */
  def ipsEvaluation(df: DataFrame, actionCol: String,
      propensityCol: String, rewardCol: String,
      targetActionCol: String): DataFrame = {
    val p = col(propensityCol).cast("double")
    val matchd = col(actionCol) === col(targetActionCol)
    val base = df.filter(col(actionCol).isNotNull && p.isNotNull &&
        p > 0 && p <= 1 && col(rewardCol).isNotNull &&
        col(targetActionCol).isNotNull)
      .select(when(matchd, 1L).otherwise(0L).as("m"),
        p.as("p"), col(rewardCol).cast("double").as("r"))
    val w = col("m") / col("p")
    def dsum(c: org.apache.spark.sql.Column) =
      sum(round(c, 12).cast("decimal(38,12)"))
    base.agg(count(lit(1)).as("n"), sum("m").as("n_matched"),
        dsum(w).as("wsum"), dsum(w * col("r")).as("wrsum"),
        dsum(w * w).as("w2sum"))
      .select(col("n").cast("long").as("n"),
        col("n_matched").cast("long").as("n_matched"),
        (col("wrsum").cast("double") / col("n")).as("v_ips"),
        when(col("wsum") > 0, col("wrsum").cast("double") /
          col("wsum").cast("double")).as("v_snips"),
        when(col("w2sum") > 0, col("wsum").cast("double") *
          col("wsum").cast("double") / col("w2sum").cast("double"))
          .as("ess"))
  }

  /** Confident-learning-style label-noise audit (Northcutt et al.
    * 2021, binary form): rows where the model is CONFIDENT
    * (p ≥ τ or p ≤ 1−τ) and disagrees with the recorded label are
    * the mislabel candidates a data-cleaning pass reviews first.
    * Per label value: n, confidently-scored count, flagged count and
    * exact-ppm flag rate. One groupBy; integer arithmetic. */
  def labelNoiseAudit(df: DataFrame, labelCol: String,
      probCol: String, tau: Double = 0.9): DataFrame = {
    require(tau > 0.5 && tau < 1.0, s"tau in (0.5,1), got $tau")
    val y = col(labelCol).cast("boolean")
    val p = col(probCol).cast("double")
    val confident = p >= tau || p <= 1 - tau
    val flagged = (y && p <= 1 - tau) || (!y && p >= tau)
    df.filter(y.isNotNull && p.isNotNull && p >= 0 && p <= 1)
      .groupBy(y.as("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(confident, 1L).otherwise(0L)).as("n_confident"),
        sum(when(flagged, 1L).otherwise(0L)).as("n_flagged"))
      .withColumn("flagged_ppm",
        expr("n_flagged * 1000000 div n"))
  }

  /** Doubly-robust off-policy value (Dudík, Langford & Li 2011):
    * augments [[ipsEvaluation]] with a direct reward model — here
    * the per-action empirical mean reward q̂(a) from the log itself
    * (the simplest context-free model; exact-ratio from integer
    * sums, broadcast back as a tiny action table):
    *   V_DR = (1/n) Σ [ q̂(π(x)) + 1{a = π(x)} · (r − q̂(a)) / p ]
    * Unbiased if EITHER the propensities or the reward model is
    * right; variance far below plain IPS when q̂ explains most of r.
    *
    * One aggregate for q̂, one broadcast join, one final aggregate;
    * per-row terms rounded to 12 decimals and DECIMAL-summed. */
  def drEvaluation(df: DataFrame, actionCol: String,
      propensityCol: String, rewardCol: String,
      targetActionCol: String): DataFrame = {
    val p = col(propensityCol).cast("double")
    val base = df.filter(col(actionCol).isNotNull && p.isNotNull &&
        p > 0 && p <= 1 && col(rewardCol).isNotNull &&
        col(targetActionCol).isNotNull)
      .select(col(actionCol).as("act"),
        col(targetActionCol).as("tgt"), p.as("p"),
        col(rewardCol).cast("double").as("r"),
        when(col(actionCol) === col(targetActionCol), 1L)
          .otherwise(0L).as("m"))
    val qhat = base.groupBy("act")
      .agg(count(lit(1)).as("na"), sum("r").as("sr"))
      .select(col("act"), (col("sr") / col("na")).as("q"))
    val joined = base
      .join(broadcast(qhat.select(col("act"), col("q").as("q_act"))),
        Seq("act"))
      .join(broadcast(qhat.select(col("act").as("tgt"),
        col("q").as("q_tgt"))), Seq("tgt"), "left")
    val term = coalesce(col("q_tgt"), lit(0.0)) +
      col("m") * (col("r") - col("q_act")) / col("p")
    joined.agg(count(lit(1)).as("n"), sum("m").as("n_matched"),
        sum(round(term, 12).cast("decimal(38,12)")).as("tsum"))
      .select(col("n").cast("long").as("n"),
        col("n_matched").cast("long").as("n_matched"),
        (col("tsum").cast("double") / col("n")).as("v_dr"))
  }

  /** Group-fairness audit of a binary classifier: per sensitive
    * group, exact counts (n, tp/fp/fn/tn), predicted-positive rate,
    * TPR and FPR in exact ppm (integer `div`, matching SQL `//` on
    * nonnegatives), plus each rate's signed ppm gap to the OVERALL
    * rate — demographic-parity and equalized-odds deltas.
    *
    * Scale: one groupBy over the data + a broadcast 1-row overall
    * aggregate. Entirely integer arithmetic — exact at any scale. */
  def fairnessReport(df: DataFrame, groupCol: String,
      labelCol: String, predCol: String): DataFrame = {
    val y = col(labelCol).cast("boolean")
    val yh = col(predCol).cast("boolean")
    val base = df.filter(y.isNotNull && yh.isNotNull &&
        col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"),
        when(y, 1L).otherwise(0L).as("y"),
        when(yh, 1L).otherwise(0L).as("p"))
    def cells(g: org.apache.spark.sql.RelationalGroupedDataset) =
      g.agg(
      count(lit(1)).as("n"),
      sum(col("p")).as("npp"),
      sum(col("y") * col("p")).as("tp"),
      sum((lit(1L) - col("y")) * col("p")).as("fp"),
      sum(col("y") * (lit(1L) - col("p"))).as("fn"),
      sum((lit(1L) - col("y")) * (lit(1L) - col("p"))).as("tn"))
    val per = cells(base.groupBy("grp"))
    val overall = cells(base.groupBy())
      .select(expr("npp * 1000000 div n").as("o_ppr"),
        expr("CASE WHEN tp + fn > 0 THEN tp * 1000000 div (tp + fn) END")
          .as("o_tpr"),
        expr("CASE WHEN fp + tn > 0 THEN fp * 1000000 div (fp + tn) END")
          .as("o_fpr"))
    per.crossJoin(broadcast(overall))
      .select(col("grp"), col("n"), col("tp"), col("fp"), col("fn"),
        col("tn"),
        expr("npp * 1000000 div n").as("pos_rate_ppm"),
        expr("CASE WHEN tp + fn > 0 THEN tp * 1000000 div (tp + fn) END")
          .as("tpr_ppm"),
        expr("CASE WHEN fp + tn > 0 THEN fp * 1000000 div (fp + tn) END")
          .as("fpr_ppm"),
        (expr("npp * 1000000 div n") - col("o_ppr"))
          .as("dp_gap_ppm"),
        (expr("CASE WHEN tp + fn > 0 THEN tp * 1000000 div (tp + fn) END") -
          col("o_tpr")).as("tpr_gap_ppm"),
        (expr("CASE WHEN fp + tn > 0 THEN fp * 1000000 div (fp + tn) END") -
          col("o_fpr")).as("fpr_gap_ppm"))
  }
}
