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
}
