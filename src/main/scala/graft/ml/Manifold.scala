package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manifold embedding (reference src/ml/dimension/mod.rs:150 TSNE).
  *
  * t-SNE is an inherently sequential gradient optimization over the
  * full pairwise affinity matrix — O(n²) time and memory with a
  * per-iteration global dependency, so it runs DRIVER-SIDE on
  * collected points behind a hard `maxN` guard (the same regime as
  * `Clustering.agglomerative` and the reference's single-node impl).
  * Embed a sample or cluster-representatives at scale; the collect
  * is the documented, guarded exception to the no-driver-loops rule.
  *
  * Everything is deterministic — no RNG anywhere:
  *  - init is the PCA projection (Jacobi eigen of the d×d feature
  *    covariance; eigenvector sign fixed by its largest component)
  *    scaled to std 1e-4, the init modern implementations prefer for
  *    stability and reproducibility;
  *  - gradient descent is the reference van-der-Maaten schedule:
  *    early exaggeration ×12 for the first quarter of the iterations,
  *    momentum 0.5 → 0.8, per-coordinate adaptive gains.
  */
object Manifold {

  /** Jacobi eigendecomposition of a symmetric d×d matrix. Returns
    * (eigenvalues, eigenvectors as columns) sorted descending. */
  private[ml] def jacobiEigen(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = Array.tabulate(d, d)((r, c) => v(r)(order(c)))
    (evals, evecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** PCA projection of centered rows onto the top `dims` components,
    * deterministic sign (largest-|.| component of each eigenvector is
    * positive). Missing rank pads with zero coordinates. */
  private[ml] def pcaProject(x: Array[Array[Double]],
      dims: Int): Array[Array[Double]] = {
    val n = x.length
    val d = x.head.length
    val mean = Array.tabulate(d)(j => x.map(_(j)).sum / n)
    val c = x.map(r => Array.tabulate(d)(j => r(j) - mean(j)))
    val cov = Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < n) { s += c(k)(i) * c(k)(j); k += 1 }
      s / math.max(1, n - 1)
    }
    val (_, evecs) = jacobiEigen(cov)
    Array.tabulate(n, dims) { (i, k) =>
      if (k >= d) 0.0
      else {
        val colK = Array.tabulate(d)(r => evecs(r)(k))
        val maxIdx = colK.indices.maxBy(r => (math.abs(colK(r)), -r))
        val sign = if (colK(maxIdx) < 0) -1.0 else 1.0
        var s = 0.0; var j = 0
        while (j < d) { s += c(i)(j) * colK(j) * sign; j += 1 }
        s
      }
    }
  }

  /** Binary-search the per-point Gaussian bandwidth so each row of P
    * has entropy log(perplexity); returns the symmetrized, normalized
    * joint affinity matrix. */
  private def affinities(d2: Array[Array[Double]],
      perplexity: Double): Array[Array[Double]] = {
    val n = d2.length
    val logU = math.log(perplexity)
    val p = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var beta = 1.0; var betaMin = 0.0; var betaMax = Double.PositiveInfinity
      var tries = 0
      var done = false
      while (!done && tries < 50) {
        var sum = 0.0; var hBeta = 0.0
        var j = 0
        while (j < n) {
          if (j != i) {
            val e = math.exp(-d2(i)(j) * beta)
            p(i)(j) = e; sum += e; hBeta += d2(i)(j) * beta * e
          }
          j += 1
        }
        val h = if (sum > 0) math.log(sum) + hBeta / sum else 0.0
        val diff = h - logU
        if (math.abs(diff) < 1e-5 || sum == 0.0) done = true
        else if (diff > 0) { // entropy too high -> narrower kernel
          betaMin = beta
          beta = if (betaMax.isInfinity) beta * 2 else (beta + betaMax) / 2
        } else {
          betaMax = beta
          beta = (beta + betaMin) / 2
        }
        tries += 1
      }
      val rowSum = {
        var s = 0.0; var j = 0
        while (j < n) { s += p(i)(j); j += 1 }
        math.max(s, 1e-300)
      }
      var j = 0
      while (j < n) { p(i)(j) /= rowSum; j += 1 }
      i += 1
    }
    // symmetrize to the joint distribution, floored for stability
    Array.tabulate(n, n)((i2, j2) =>
      math.max((p(i2)(j2) + p(j2)(i2)) / (2.0 * n), 1e-12))
  }

  /** Embed `featureCols` into `dims` coordinates. Returns
    * (id, tsne_0 … tsne_{dims-1}). Null features are rejected (embed
    * only complete rows — filter or impute upstream). */
  def tsne(df: DataFrame, featureCols: Seq[String], idCol: String,
      dims: Int = 2, perplexity: Double = 30.0, iters: Int = 500,
      learningRate: Double = 200.0, maxN: Int = 2000): DataFrame = {
    require(dims >= 1, "dims must be >= 1")
    val rows = df.select(col(idCol).cast("long") +:
        featureCols.map(c => col(c).cast("double")): _*)
      .collect()
    val n = rows.length
    require(n <= maxN, s"tsne is O(n²) single-node; n=$n > maxN=$maxN" +
      " — embed a sample or cluster representatives instead")
    require(n >= 4, s"tsne needs at least 4 rows, got $n")
    // clamp to the usable range — the classic n/3 upper bound — so one
    // call works across scale factors of the same pipeline
    val perp = math.max(1.0, math.min(perplexity, (n - 1) / 3.0))
    val ids = rows.map(_.getLong(0))
    val x = rows.map { r =>
      featureCols.indices.map { j =>
        require(!r.isNullAt(j + 1),
          s"tsne: null feature ${featureCols(j)} for id ${r.getLong(0)}")
        r.getDouble(j + 1)
      }.toArray
    }
    // pairwise squared distances in input space
    val d2 = Array.tabulate(n, n) { (i, j) =>
      var s = 0.0; var f = 0
      while (f < x(i).length) {
        val d0 = x(i)(f) - x(j)(f); s += d0 * d0; f += 1
      }
      s
    }
    val pBase = affinities(d2, perp)
    // deterministic PCA init scaled to std 1e-4
    val y = pcaProject(x, dims)
    val initStd = {
      var s = 0.0; var cnt = 0
      for (r <- y; v <- r) { s += v * v; cnt += 1 }
      math.sqrt(s / math.max(1, cnt))
    }
    val scale = if (initStd > 0) 1e-4 / initStd else 0.0
    for (i <- 0 until n; k <- 0 until dims) y(i)(k) *= scale
    val gains = Array.fill(n, dims)(1.0)
    val update = Array.fill(n, dims)(0.0)
    val exagEnd = iters / 4
    var iter = 0
    while (iter < iters) {
      val exag = if (iter < exagEnd) 12.0 else 1.0
      val momentum = if (iter < iters / 2) 0.5 else 0.8
      // student-t low-dim affinities
      val num = Array.ofDim[Double](n, n)
      var qSum = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          var s = 0.0; var k = 0
          while (k < dims) {
            val d0 = y(i)(k) - y(j)(k); s += d0 * d0; k += 1
          }
          val v = 1.0 / (1.0 + s)
          num(i)(j) = v; num(j)(i) = v; qSum += 2.0 * v
          j += 1
        }
        i += 1
      }
      val qInv = 1.0 / math.max(qSum, 1e-300)
      // all gradients from the same (y, num) snapshot, then one
      // simultaneous update — in-place (Gauss-Seidel) updates mix
      // stale affinities with moved points and pump energy in
      val grads = Array.ofDim[Double](n, dims)
      i = 0
      while (i < n) {
        var j = 0
        while (j < n) {
          if (j != i) {
            val q = math.max(num(i)(j) * qInv, 1e-12)
            val mult = (exag * pBase(i)(j) - q) * num(i)(j)
            var k = 0
            while (k < dims) {
              grads(i)(k) += 4.0 * mult * (y(i)(k) - y(j)(k)); k += 1
            }
          }
          j += 1
        }
        i += 1
      }
      i = 0
      while (i < n) {
        var k = 0
        while (k < dims) {
          val sameSign =
            math.signum(grads(i)(k)) == math.signum(update(i)(k))
          gains(i)(k) = math.max(0.01,
            if (sameSign) gains(i)(k) * 0.8 else gains(i)(k) + 0.2)
          update(i)(k) = momentum * update(i)(k) -
            learningRate * gains(i)(k) * grads(i)(k)
          y(i)(k) += update(i)(k)
          k += 1
        }
        i += 1
      }
      // re-center
      var k = 0
      while (k < dims) {
        var m = 0.0; var r = 0
        while (r < n) { m += y(r)(k); r += 1 }
        m /= n
        r = 0
        while (r < n) { y(r)(k) -= m; r += 1 }
        k += 1
      }
      iter += 1
    }
    val spark = df.sparkSession
    import spark.implicits._
    val out = ids.indices.map(i => (ids(i), y(i).toSeq))
      .toSeq.toDF("id", "__y__")
    out.select(col("id") +:
      (0 until dims).map(k => col("__y__")(k).as(s"tsne_$k")): _*)
  }
}
