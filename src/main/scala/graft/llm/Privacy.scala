package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy auditing + release machinery for large corpora — the
  * layer next to PII redaction (PipelineOps.piiRedact q95): before a
  * 100 TB dataset ships, quasi-identifier re-identification risk is
  * measured (k-anonymity / l-diversity, Sweeney 2002; Machanavajjhala
  * et al. 2007) and released aggregates get Laplace-mechanism noise
  * (Dwork et al. 2006).
  *
  * Everything here is one or two hash aggregates keyed by the
  * quasi-identifier — map-side partials, no window, no driver loop.
  * The DP noise draws its entropy from the engine-portable 48-bit
  * md5 lottery ([[PipelineOps.hash48Unit]]) keyed by (salt, group):
  * runs are reproducible, independent releases vary the salt, and an
  * external engine can replay the exact noise — the property that
  * makes the mechanism testable at all. (A production release would
  * rotate the salt secretly; the MECHANISM is identical.)
  */
object Privacy {

  /** Per-equivalence-class k-anonymity audit: one row per
    * quasi-identifier class with its size, the count of distinct
    * sensitive values (the class's l-diversity), and whether it
    * violates `k`. Classes are the natural groupBy — bounded by the
    * quasi-identifier domain, not the data. */
  def kAnonymityClasses(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("l_diversity"))
      .withColumn("below_k", col("n") < k)
  }

  /** Dataset-level privacy summary: the k-anonymity (minimum class
    * size), minimum l-diversity, and the share of rows living in
    * classes below `k` — the numbers a privacy review leads with. */
  def kAnonymityProfile(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int): DataFrame =
    kAnonymityClasses(df, quasiCols, sensitiveCol, k)
      .agg(sum("n").as("n_rows"),
        count(lit(1)).as("n_classes"),
        min("n").as("k_anonymity"),
        min("l_diversity").as("l_diversity_min"),
        sum(when(col("below_k"), col("n")).otherwise(0L))
          .as("rows_below_k"))
      .withColumn("pct_below_k",
        col("rows_below_k").cast("double") / col("n_rows"))

  /** Entropy l-diversity + t-closeness audit per equivalence class
    * (Machanavajjhala et al. 2007; Li et al. 2007) — the stronger
    * follow-ups once [[kAnonymityClasses]] passes: distinct-count
    * l-diversity is gameable by skew (99 of 100 rows sharing one
    * sensitive value still "has 2 distinct values"), so report
    *  - entropy l-diversity: exp(−Σ p ln p) over the class's
    *    sensitive distribution ("effective number of values"), and
    *  - t-closeness as total-variation distance ½Σ|p_class − p_all|
    *    to the GLOBAL sensitive distribution (a class that leaks
    *    nothing sits at 0).
    * Two exact count aggregates + a broadcast of the (bounded)
    * sensitive-domain global counts; per-value terms rounded to 12
    * decimals and DECIMAL-summed — order-free, engine-replayable. */
  def diversityCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    val cell = df.filter(col(sensitiveCol).isNotNull)
      .groupBy((quasiCols.map(col) :+ col(sensitiveCol).as("__s__")): _*)
      .agg(count(lit(1)).as("ns"))
    val glob = df.filter(col(sensitiveCol).isNotNull)
      .groupBy(col(sensitiveCol).as("__s__"))
      .agg(count(lit(1)).as("gs"))
    val tot = glob.agg(sum("gs").as("g"))
    val p = col("ns").cast("double") / col("nc")
    val q = col("gs").cast("double") / col("g")
    val withN = cell
      .join(broadcast(glob), Seq("__s__"))
      .crossJoin(broadcast(tot))
    val perClass = withN
      .join(withN.groupBy(quasiCols.map(col): _*)
        .agg(sum("ns").as("nc")), quasiCols)
      .select((quasiCols.map(col) ++ Seq(col("nc"), col("ns"),
        round(-p * log(p), 12).cast("decimal(38,12)").as("__h__"),
        round(abs(p - q), 12).cast("decimal(38,12)").as("__d__"))): _*)
    perClass.groupBy(quasiCols.map(col): _*)
      .agg(first(col("nc")).as("n"),
        count(lit(1)).as("l_distinct"),
        sum(col("__h__")).as("hsum"),
        sum(col("__d__")).as("dsum"))
      .select((quasiCols.map(col) ++ Seq(
        col("n").cast("long").as("n"),
        col("l_distinct").cast("long").as("l_distinct"),
        col("hsum").cast("double").as("entropy_nats"),
        exp(col("hsum").cast("double")).as("entropy_l"),
        (col("dsum").cast("double") / 2).as("t_closeness"))): _*)
  }

  /** Laplace inverse-CDF noise at scale b from a uniform u:
    * −b·sgn(u−½)·ln(1−2|u−½|). u is clamped into
    * [2⁻⁴⁹, 1−2⁻⁴⁹] first — the 48-bit lattice can yield exactly 0
    * (probability 2⁻⁴⁸ per group), which would otherwise release an
    * infinite value. The clamp is mirrored in the oracle SQL. */
  private val uEps = math.pow(2.0, -49)
  private def laplaceNoise(u0: org.apache.spark.sql.Column,
      b: Double): org.apache.spark.sql.Column = {
    val u = greatest(lit(uEps), least(lit(1.0 - uEps), u0))
    lit(-b) * signum(u - lit(0.5)) *
      log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))
  }

  /** Injective, engine-portable encoding of one noise-key component:
    * NULL → "n", else length-prefixed "L:value" — so distinct key
    * tuples (("a",NULL) vs (NULL,"a"), values containing the
    * separator) can never collide onto one Laplace draw. Digits
    * always open a non-null component, so the "n" sentinel is
    * unambiguous and the concatenation of encodings is
    * self-delimiting. */
  private def encKeyPart(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    when(c.isNull, lit("n")).otherwise(concat(
      length(c.cast("string")).cast("string"), lit(":"),
      c.cast("string")))

  private def noiseKey(salt: String, keyCols: Seq[String])
      : org.apache.spark.sql.Column =
    concat((lit(salt) +: lit("|") +:
      keyCols.map(c => encKeyPart(col(c)))): _*)

  /** ε-DP noisy per-group counts (Laplace mechanism, sensitivity 1):
    * emits the true count, the replayable noise draw keyed by
    * (salt, group key), and the released noisy count. One hash
    * aggregate + map-side noise arithmetic. */
  def dpGroupCount(df: DataFrame, keyCols: Seq[String],
      epsilon: Double, salt: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    val u = PipelineOps.hash48Unit(noiseKey(salt, keyCols))
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("noise", laplaceNoise(u, 1.0 / epsilon))
      .withColumn("n_dp", col("n") + col("noise"))
  }

  /** ε-DP noisy per-group sums: caller supplies the value column and
    * its sensitivity bound c (values are clamped to [−c, c] first —
    * without the clamp the sensitivity claim is false). Scale is
    * c/ε. Exact-integer value columns keep the true sum
    * order-free/replayable. */
  def dpGroupSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      sensitivity: Double, epsilon: Double, salt: String): DataFrame = {
    require(epsilon > 0 && sensitivity > 0,
      s"need epsilon > 0 and sensitivity > 0")
    val clamped = greatest(lit(-sensitivity),
      least(lit(sensitivity), col(valueCol).cast("double")))
    val u = PipelineOps.hash48Unit(noiseKey(salt, keyCols))
    df.groupBy(keyCols.map(col): _*)
      .agg(sum(clamped).as("sum_clamped"),
        count(lit(1)).as("n"))
      .withColumn("noise", laplaceNoise(u, sensitivity / epsilon))
      .withColumn("sum_dp", col("sum_clamped") + col("noise"))
  }
}
