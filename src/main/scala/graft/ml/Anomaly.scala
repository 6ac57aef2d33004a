package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.util.Random

/** Anomaly detection (reference src/ml/anomaly/mod.rs:19
  * IsolationForest; LOF lives in graft.llm.Similarity).
  *
  * Isolation forest splits: trees are FIT on a driver-side sample
  * (the standard formulation subsamples ~256 rows per tree — fitting
  * is small-data by design), then SCORING is fully distributed: the
  * fitted trees are a broadcast closure and each row's average path
  * length is a per-row map — no shuffle at all.
  */
object Anomaly {

  private final case class Node(feature: Int, split: Double,
      left: Node, right: Node, size: Int)

  /** average unsuccessful-search path length in a BST of n nodes. */
  private def cFactor(n: Int): Double =
    if (n <= 1) 0.0
    else 2.0 * (math.log(n - 1.0) + 0.5772156649015329) -
      2.0 * (n - 1.0) / n

  private def buildTree(data: Array[Array[Double]], depth: Int,
      maxDepth: Int, rng: Random): Node = {
    if (depth >= maxDepth || data.length <= 1)
      Node(-1, 0.0, null, null, data.length)
    else {
      val nf = data.head.length
      // try a few features in case some are constant in this node
      var attempt = 0
      var f = -1; var mn = 0.0; var mx = 0.0
      while (attempt < nf && f < 0) {
        val cand = rng.nextInt(nf)
        val vals = data.map(_(cand))
        val lo = vals.min; val hi = vals.max
        if (hi > lo) { f = cand; mn = lo; mx = hi }
        attempt += 1
      }
      if (f < 0) Node(-1, 0.0, null, null, data.length)
      else {
        val sp = mn + rng.nextDouble() * (mx - mn)
        val (l, r) = data.partition(_(f) < sp)
        Node(f, sp, buildTree(l, depth + 1, maxDepth, rng),
          buildTree(r, depth + 1, maxDepth, rng), data.length)
      }
    }
  }

  private def pathLength(root: Node, x: Seq[Double]): Double = {
    var node = root; var depth = 0.0
    while (node.feature >= 0) {
      node = if (x(node.feature) < node.split) node.left else node.right
      depth += 1.0
    }
    depth + cFactor(node.size)
  }

  /** Fit on (up to) nTrees·sampleSize collected rows, score every row
    * distributed. Scores are in (0, 1): ≳0.6 anomalous, ≲0.5 normal
    * (the standard 2^(−E[h]/c(ψ)) normalization). For very large
    * inputs pre-sample the FIT data yourself (`fitOn`) — scoring is
    * unaffected.
    *
    * Rows with a null feature are excluded from the fit, and score
    * null (they carry no isolation-depth information). The fit sample
    * is drawn deterministically BUT unbiased: rows are ordered by a
    * hash of their feature vector (TakeOrdered, no full sort), so the
    * same data reproduces the same forest across runs and
    * partitionings without the value-skew a feature-sorted bottom-k
    * would introduce. */
  def isolationForest(df: DataFrame, featureCols: Seq[String],
      nTrees: Int = 100, sampleSize: Int = 256, seed: Long = 42L,
      outName: String = "anomaly_score",
      fitOn: Option[DataFrame] = None): DataFrame = {
    val fitDf = fitOn.getOrElse(df)
    val feats = featureCols.map(c => col(c).cast("double").as(c))
    val rows = fitDf
      .select(feats: _*).na.drop()
      // hash-ordered top-k: deterministic yet spread uniformly over
      // the feature space (a plain feature sort would fit the forest
      // on the bottom-k values only — maximally biased)
      .sort((xxhash64(featureCols.map(col): _*) +:
        featureCols.map(col)): _*)
      .limit(nTrees * sampleSize).collect()
      .map(r => Array.tabulate(featureCols.size)(r.getDouble))
    require(rows.nonEmpty, "isolationForest: empty fit data")
    val rng = new Random(seed)
    val shuffled = rng.shuffle(rows.toVector).toArray
    val psi = math.min(sampleSize, shuffled.length)
    val maxDepth = math.ceil(
      math.log(psi.toDouble) / math.log(2.0)).toInt.max(1)
    val trees = (0 until nTrees).map { t =>
      val sub = Array.tabulate(psi)(i =>
        shuffled((t * psi + i) % shuffled.length))
      buildTree(sub, 0, maxDepth, rng)
    }
    val cPsi = cFactor(psi)
    val scoreUdf = udf((xs: Seq[Double]) => {
      val avg = trees.map(pathLength(_, xs)).sum / trees.length
      math.pow(2.0, -avg / cPsi)
    })
    val anyNull = featureCols
      .map(c => col(c).cast("double").isNull).reduce(_ || _)
    df.withColumn(outName,
      when(anyNull, lit(null).cast("double"))
        .otherwise(scoreUdf(
          array(featureCols.map(c => col(c).cast("double")): _*))))
  }

  /** ν-one-class SVM (reference src/ml/svm one-class), fit in the
    * SVDD formulation (Tax & Duin minimal enclosing soft sphere):
    *
    *   min_{c,u}  u + 1/(νn) Σ max(0, ‖xᵢ−c‖² − u)
    *
    * which is the known equivalent of Schölkopf's kernel OC-SVM for
    * stationary kernels — and, unlike the raw LINEAR hyperplane
    * variant (separate the data from the origin), gives a meaningful
    * boundary for standardized data, where the origin sits INSIDE the
    * cloud and no hyperplane through feature space can enclose it.
    *
    * Same split as [[isolationForest]]: the FIT is small-data by
    * design — deterministic hash-ordered sample of ≤ `fitSample`
    * rows, full-batch subgradient descent (no shuffling order, so
    * bit-reproducible) on the convex objective — and SCORING is fully
    * distributed: the learned center, radius and standardization
    * moments are literals folded into a map-side column expression —
    * no shuffle, no UDF.
    *
    * Output adds `score` = u − ‖x̃−c‖² (negative ⇒ anomalous; at the
    * solution ≈ ν of the fit data lies outside) and `is_inlier`.
    * Rows with a null feature score null. */
  def oneClassSvm(df: DataFrame, featureCols: Seq[String],
      nu: Double = 0.1, epochs: Int = 300, fitSample: Int = 4096,
      outName: String = "score",
      fitOn: Option[DataFrame] = None): DataFrame = {
    require(nu > 0.0 && nu <= 1.0, s"nu=$nu must be in (0, 1]")
    val fitDf = fitOn.getOrElse(df)
    val d = featureCols.size
    val xs = fitDf
      .select(featureCols.map(c => col(c).cast("double").as(c)): _*)
      .na.drop()
      .sort((xxhash64(featureCols.map(col): _*) +:
        featureCols.map(col)): _*)
      .limit(fitSample).collect()
      .map(r => Array.tabulate(d)(r.getDouble))
    val n = xs.length
    require(n >= 2, s"oneClassSvm: need >= 2 complete fit rows, got $n")
    // standardize (isotropic sphere needs comparable scales; moments
    // come from the fit sample and are reused verbatim at scoring)
    val mean = Array.tabulate(d)(j => xs.map(_(j)).sum / n)
    val std = Array.tabulate(d) { j =>
      val v = xs.map(r => (r(j) - mean(j)) * (r(j) - mean(j))).sum / n
      val s = math.sqrt(v); if (s > 0) s else 1.0
    }
    val z = xs.map(r => Array.tabulate(d)(j => (r(j) - mean(j)) / std(j)))
    val invNuN = 1.0 / (nu * n)
    // init: center at the standardized mean (0), radius² = max dist²
    val c = Array.fill(d)(0.0)
    def dist2(i: Int): Double = {
      var s = 0.0; var j = 0
      while (j < d) {
        val dd = z(i)(j) - c(j); s += dd * dd; j += 1
      }
      s
    }
    var u = (0 until n).map(dist2).max
    var t = 1
    while (t <= epochs) {
      val eta = 1.0 / math.sqrt(t.toDouble)
      var gU = 1.0
      val gC = Array.fill(d)(0.0)
      var i = 0
      while (i < n) {
        if (dist2(i) > u) { // outside the sphere: hinge active
          gU -= invNuN
          var j = 0
          while (j < d) { gC(j) += invNuN * 2.0 * (c(j) - z(i)(j)); j += 1 }
        }
        i += 1
      }
      var j = 0
      while (j < d) { c(j) -= eta * gC(j); j += 1 }
      u = math.max(0.0, u - eta * gU)
      t += 1
    }
    // distributed scoring: pure column expression over the literals
    val d2Expr = featureCols.zipWithIndex.map { case (cn, j) =>
      val zc = (col(cn).cast("double") - lit(mean(j))) / lit(std(j)) -
        lit(c(j))
      zc * zc
    }.reduce(_ + _)
    val anyNull = featureCols
      .map(cn => col(cn).cast("double").isNull).reduce(_ || _)
    df.withColumn(outName,
        when(anyNull, lit(null).cast("double"))
          .otherwise(lit(u) - d2Expr))
      .withColumn("is_inlier",
        when(col(outName).isNull, lit(null).cast("boolean"))
          .otherwise(col(outName) >= 0.0))
  }
}
