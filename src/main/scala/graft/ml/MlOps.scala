package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{PCA, VectorAssembler}
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ML layer (reference src/ml/: preprocessing/mod.rs:14-302,
  * clustering/mod.rs:46, dimension/mod.rs:17, models/linear.rs:16).
  * Scalers/encoders are pure DataFrame expressions (exact,
  * oracle-checkable); model fitting delegates to Spark MLlib — the
  * distributed implementations the reference's single-node ML layer
  * approximates. DBSCAN/agglomerative/TSNE/LOF have no MLlib
  * equivalent and are out of v1 scope (SURVEY §2.13).
  */
object MlOps {

  /** StandardScaler (preprocessing/mod.rs:14): per-group or global
    * z-score from exact sufficient statistics — one aggregate +
    * broadcast join, no MLlib fit round-trip. */
  def standardScale(df: DataFrame, valueCol: String,
      by: Seq[String] = Nil): DataFrame = {
    val v = col(valueCol).cast("double")
    val stats =
      (if (by.isEmpty) df.groupBy() else df.groupBy(by.map(col): _*))
        .agg(count(v).cast("double").as("__n__"), // count NON-NULL rows
          sum(v).as("__s1__"), sum(v * v).as("__s2__"))
    val joined = if (by.isEmpty) df.crossJoin(broadcast(stats))
      else df.join(broadcast(stats), by)
    joined
      .withColumn("__m__", col("__s1__") / col("__n__"))
      .withColumn("__sd__", sqrt((col("__s2__") -
        col("__s1__") * col("__s1__") / col("__n__")) / (col("__n__") - 1)))
      .withColumn(s"${valueCol}_scaled",
        (v - col("__m__")) / col("__sd__"))
      .drop("__n__", "__s1__", "__s2__", "__m__", "__sd__")
  }

  /** MinMaxScaler (preprocessing/mod.rs:146). */
  def minMaxScale(df: DataFrame, valueCol: String,
      by: Seq[String] = Nil): DataFrame = {
    val v = col(valueCol).cast("double")
    val stats =
      (if (by.isEmpty) df.groupBy() else df.groupBy(by.map(col): _*))
        .agg(min(v).as("__mn__"), max(v).as("__mx__"))
    val joined = if (by.isEmpty) df.crossJoin(broadcast(stats))
      else df.join(broadcast(stats), by)
    joined.withColumn(s"${valueCol}_scaled",
        when(col("__mx__") === col("__mn__"), 0.5)
          .otherwise((v - col("__mn__")) / (col("__mx__") - col("__mn__"))))
      .drop("__mn__", "__mx__")
  }

  /** RobustScaler (sklearn parity; reference preprocessing family):
    * (x − median) / IQR — outlier-insensitive where standard scaling
    * is dominated by extremes. Exact percentiles per (optional)
    * group; zero IQR scales to 0.0 (constant-ish column). */
  def robustScale(df: DataFrame, valueCol: String,
      by: Seq[String] = Nil): DataFrame = {
    val v = col(valueCol).cast("double")
    val stats =
      (if (by.isEmpty) df.groupBy() else df.groupBy(by.map(col): _*))
        .agg(percentile(v, lit(0.5)).as("__med__"),
          percentile(v, lit(0.25)).as("__q1__"),
          percentile(v, lit(0.75)).as("__q3__"))
    val joined = if (by.isEmpty) df.crossJoin(broadcast(stats))
      else df.join(broadcast(stats), by)
    joined.withColumn(s"${valueCol}_scaled",
        when(col("__q3__") === col("__q1__"), 0.0)
          .otherwise((v - col("__med__")) /
            (col("__q3__") - col("__q1__"))))
      .drop("__med__", "__q1__", "__q3__")
  }

  /** Rank-gauss (inverse-normal / van-der-Waerden) transform — the
    * tabular-ML normalizer that maps any distribution onto N(0,1):
    * average rank r per value, p = r/(n+1), z = Φ⁻¹(p) (Acklam,
    * [[graft.stats.Distributions.normSInvCol]] — pure Column
    * arithmetic, oracle-replayable).
    *
    * Scale shape: ranks come from the DISTINCT-value table via
    * [[graft.stats.StatsOps.distinctValueRanks]] (range-bucketed
    * cumulative counts — no global window), broadcast back; the
    * transform itself is map-side. Nulls pass through as null. */
  def rankGauss(df: DataFrame, valueCol: String,
      outName: String = "gauss_rank"): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol)).agg(count(lit(1)).as("__c__")).cache()
    val ranks = graft.stats.StatsOps.distinctValueRanks(
      counts, valueCol, "__c__")
    val tot = counts.agg(sum("__c__").cast("double").as("__n__"))
    df.join(broadcast(ranks), Seq(valueCol), "left")
      .crossJoin(broadcast(tot))
      .withColumn(outName, graft.stats.Distributions.normSInvCol(
        col("__r__") / (col("__n__") + 1)))
      .drop("__r__", "__n__")
  }

  /** OneHotEncoder (preprocessing/mod.rs:302): indicator columns for
    * an explicit (bounded) category list — schema stays static, which
    * is what a 100 TB pipeline needs anyway. */
  def oneHot(df: DataFrame, catCol: String,
      categories: Seq[String]): DataFrame =
    categories.foldLeft(df)((d, c) =>
      d.withColumn(s"${catCol}_$c",
        when(col(catCol) === c, 1L).otherwise(0L)))

  /** factorize (reference src/series/categorical.rs:197): dense
    * integer codes by sorted category order — a broadcastable
    * dictionary join, not a global window. */
  def factorize(df: DataFrame, catCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val codes = df.select(catCol).distinct()
      .withColumn(s"${catCol}_code",
        (dense_rank().over(Window.orderBy(col(catCol))) - 1).cast("long"))
    df.join(broadcast(codes), Seq(catCol))
  }

  private def assemble(df: DataFrame, features: Seq[String]): DataFrame =
    new VectorAssembler().setInputCols(features.toArray)
      .setOutputCol("features").transform(df)

  /** KMeans (clustering/mod.rs:46) via MLlib, deterministic seed. */
  def kmeans(df: DataFrame, features: Seq[String], k: Int,
      seed: Long = 42L): DataFrame = {
    val fitted = new KMeans().setK(k).setSeed(seed)
      .fit(assemble(df, features))
    fitted.transform(assemble(df, features))
      .withColumnRenamed("prediction", "cluster").drop("features")
  }

  /** PCA (dimension/mod.rs:17) via MLlib. */
  def pca(df: DataFrame, features: Seq[String], k: Int): DataFrame = {
    val assembled = assemble(df, features)
    new PCA().setInputCol("features").setOutputCol("pca")
      .setK(k).fit(assembled).transform(assembled).drop("features")
  }

  /** LinearRegression (models/linear.rs:16) via MLlib. */
  def linearRegressionMl(df: DataFrame, features: Seq[String],
      label: String): DataFrame = {
    val assembled = assemble(df, features)
    val m = new LinearRegression().setLabelCol(label)
      .setFeaturesCol("features").fit(assembled)
    m.transform(assembled).drop("features")
  }

  /** LogisticRegression (models/linear.rs:497) via MLlib. */
  def logisticRegressionMl(df: DataFrame, features: Seq[String],
      label: String): DataFrame = {
    val assembled = assemble(df, features)
    val m = new LogisticRegression().setLabelCol(label)
      .setFeaturesCol("features").fit(assembled)
    m.transform(assembled).select(df.columns.map(col) :+
      col("prediction"): _*)
  }

  /** PolynomialFeatures (preprocessing/mod.rs:348): every monomial of
    * the given columns up to `degree` as new columns (x1, x2, x1^2,
    * x1*x2, …), or only cross-terms with `interactionOnly`. Pure
    * map-side codegen'd expressions — no fitting, no shuffle. Column
    * naming: factors joined by '*', powers flattened (x1*x1). */
  def polynomialFeatures(df: DataFrame, cols: Seq[String],
      degree: Int, interactionOnly: Boolean = false): DataFrame = {
    require(degree >= 2 && degree <= 4,
      "polynomialFeatures supports degree 2-4")
    def combos(d: Int): Seq[Seq[String]] =
      if (d == 1) cols.map(Seq(_))
      else combos(d - 1).flatMap(c =>
        cols.filter(_ >= c.last).map(c :+ _))
    val terms = (2 to degree).flatMap(combos)
      .filter(t => !interactionOnly || t.distinct.size == t.size)
    terms.foldLeft(df)((d, t) =>
      d.withColumn(t.mkString("*"),
        t.map(c => col(c).cast("double")).reduce(_ * _)))
  }

  /** Deterministic train/test split (model_selection.rs train_test_
    * split): membership is a pure function of the id — reproducible
    * across runs, partitionings and cluster sizes, unlike
    * `randomSplit` (which is partition-order sensitive). Returns
    * (train, test). */
  def trainTestSplit(df: DataFrame, idCol: String, testFrac: Double,
      salt: String = ""): (DataFrame, DataFrame) = {
    require(testFrac > 0 && testFrac < 1, "testFrac in (0,1)")
    // null ids hash to null; coalesce to 1.0 so they land in TRAIN
    // rather than silently vanishing from both sides
    val h = coalesce(graft.llm.PipelineOps.hash48Unit(
      concat(col(idCol).cast("string"), lit(salt))), lit(1.0))
    (df.filter(h >= testFrac), df.filter(h < testFrac))
  }

  /** Deterministic k-fold assignment (model_selection.rs
    * CrossValidationStrategy::KFold): adds a `fold` column in [0, k)
    * as a pure hash of the id — every engine and run derives the same
    * folds, and fold i's train set is `fold =!= i`. */
  def kFoldAssign(df: DataFrame, idCol: String, k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 2, "kFoldAssign needs k >= 2")
    // null ids get fold 0 instead of a null fold
    val h = coalesce(graft.llm.PipelineOps.hash48Unit(
      concat(col(idCol).cast("string"), lit(salt))), lit(0.0))
    df.withColumn("fold", floor(h * k).cast("int"))
  }
}
