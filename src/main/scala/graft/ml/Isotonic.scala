package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic regression by pool-adjacent-violators (Barlow et al.
  * 1972; the sklearn `IsotonicRegression` semantics), per key: the
  * non-decreasing step function minimizing weighted L2 error — the
  * standard monotone probability-calibration fit next to Platt/
  * temperature scaling, and the reference-free way to enforce a
  * known monotone relation (price vs quantity tiers, score vs rate).
  *
  * Scale shape: ONE shuffle on the key, then each key's series runs
  * PAV inside its task (`KeyValueGroupedDataset.flatMapGroups` — the
  * grouped-SARIMA precedent, same bounded-series-per-key contract:
  * millions of keys in parallel, each series must fit in a task).
  * Duplicate x within a key are pre-pooled (the sklearn convention),
  * which also makes the fit independent of input row order.
  *
  * Determinism: blocks carry EXACT (Σy, count) — never an
  * incremental mean — and violation tests cross-multiply
  * (s₁·c₂ > s₂·c₁), which is an exact integer comparison whenever y
  * is integer-valued (the cents convention; products stay < 2⁵³).
  * Each fitted value is then ONE correctly-rounded division of an
  * exact rational, so the fit is bit-identical to the closed
  * minimax form fitted(i) = max_{j≤i} min_{k≥i} mean(y[j..k]) that
  * a SQL oracle computes from exact prefix sums — PAV and minimax
  * are the same function (the classical identity), and rounding a
  * rational once commutes with max/min (rounding is monotone).
  */
object Isotonic {

  /** Fit per key: output (key, x, n_pooled, y_sum, fitted) — one
    * row per DISTINCT x in ascending order, `fitted` the
    * non-decreasing PAV value, `y_sum` the exact pooled Σy at x. */
  def isotonicFit(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(keyCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(keyCol).cast("string").as("k"),
        col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"))
      .as[(String, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val byX = scala.collection.mutable.TreeMap[Double, (Double, Long)]()
        it.foreach { case (_, x, y) =>
          val (s, c) = byX.getOrElse(x, (0.0, 0L))
          byX(x) = (s + y, c + 1)
        }
        val xs = byX.keys.toArray
        val sums = byX.values.map(_._1).toArray
        val cnts = byX.values.map(_._2).toArray
        // PAV stack of blocks as exact (sum, count, span)
        val bs = new Array[Double](xs.length)
        val bc = new Array[Long](xs.length)
        val span = new Array[Int](xs.length)
        var top = -1
        var i = 0
        while (i < xs.length) {
          top += 1
          bs(top) = sums(i); bc(top) = cnts(i); span(top) = 1
          // violation iff mean(top-1) > mean(top): cross-multiplied,
          // exact for integer-valued y
          while (top > 0 &&
              bs(top - 1) * bc(top) > bs(top) * bc(top - 1)) {
            bs(top - 1) += bs(top)
            bc(top - 1) += bc(top)
            span(top - 1) += span(top)
            top -= 1
          }
          i += 1
        }
        val fitted = new Array[Double](xs.length)
        var pos = 0
        var b = 0
        while (b <= top) {
          val m = bs(b) / bc(b)
          var j = 0
          while (j < span(b)) { fitted(pos) = m; pos += 1; j += 1 }
          b += 1
        }
        xs.indices.iterator.map(ix =>
          (k, xs(ix), cnts(ix), sums(ix), fitted(ix)))
      }
      .toDF(keyCol, xCol, "n_pooled", "y_sum", "fitted")
  }
}
