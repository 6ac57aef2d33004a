package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom aggregation path (reference §2.15:
  * src/optimized/split_dataframe/group/types.rs:58-67 CustomAggregation,
  * src/dataframe/groupby.rs:108 CustomAggFn — user-supplied
  * Fn(&[f64])->f64). Spark equivalent: typed `Aggregator[IN,BUF,OUT]`
  * registered via `functions.udaf`, usable in DataFrame agg and SQL.
  * Two ready-made instances mirror the reference's JIT group aggs.
  */
object CustomAggregators {

  /** Geometric mean as a mergeable (sum-of-logs, count) aggregator —
    * the shape every custom f64 agg must take to distribute: a
    * commutative-monoid buffer, finalized once per group. */
  object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Coefficient of variation (std/mean) from moment sums
    * (reference src/optimized/jit/groupby.rs:423). */
  object CoefVariation
      extends Aggregator[Double, (Long, Double, Double), Double] {
    def zero: (Long, Double, Double) = (0L, 0.0, 0.0)
    def reduce(b: (Long, Double, Double), x: Double): (Long, Double, Double) =
      (b._1 + 1, b._2 + x, b._3 + x * x)
    def merge(a: (Long, Double, Double),
        b: (Long, Double, Double)): (Long, Double, Double) =
      (a._1 + b._1, a._2 + b._2, a._3 + b._3)
    def finish(b: (Long, Double, Double)): Double = {
      val n = b._1.toDouble
      if (n < 2 || b._2 == 0) Double.NaN
      else math.sqrt((b._3 - b._2 * b._2 / n) / (n - 1)) / (b._2 / n)
    }
    def bufferEncoder: Encoder[(Long, Double, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble,
        Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def geomMean(c: Column): Column = udaf(GeometricMean).apply(c)
  def coefVariation(c: Column): Column = udaf(CoefVariation).apply(c)

  /** SQL registration (reference add_function /
    * UdfDefinition.to_sql): SELECT geom_mean(v) FROM t GROUP BY k. */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("geom_mean", udaf(GeometricMean))
    spark.udf.register("coef_variation", udaf(CoefVariation))
  }
}
