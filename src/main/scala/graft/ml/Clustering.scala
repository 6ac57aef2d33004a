package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density clustering (reference src/ml/clustering/mod.rs:535 DBSCAN).
  *
  * Distributed DBSCAN via grid-cell blocking: each point lands in the
  * cell `floor(f_i/eps)` per dimension, and any eps-neighbor must lie
  * in one of the 3^d adjacent cells — so the candidate join is
  * cell-key-equi, never all-pairs. Pipeline:
  *
  *  1. explode each point to its 3^d probe cells, equi-join against
  *     points keyed by home cell, keep pairs with ‖a−b‖ ≤ eps;
  *  2. core points: ≥ minPts − 1 neighbors (the point itself counts);
  *  3. clusters: connected components over CORE-CORE edges
  *     (min-label propagation — cluster id = smallest core id);
  *  4. border points attach to the smallest adjacent core cluster;
  *     everything else is noise (cluster null).
  *
  * The 3^d probe fan-out limits this to low-dimensional feature
  * spaces (d ≲ 8) — the classical DBSCAN regime. For high-dim
  * embeddings compose the same steps 2-4 over
  * `Dedup.embeddingNearDupPairs` (cosine-LSH candidates) instead.
  */
object Clustering {

  def dbscan(df: DataFrame, featureCols: Seq[String], idCol: String,
      eps: Double, minPts: Int): DataFrame = {
    require(featureCols.nonEmpty && featureCols.size <= 8,
      "dbscan grid blocking needs 1-8 feature columns")
    val d = featureCols.size
    val feats = featureCols.zipWithIndex.map { case (c, i) =>
      col(c).cast("double").as(s"__f$i")
    }
    val pts = df.select(col(idCol).as("id") +: feats: _*)
    val cell = array(featureCols.indices.map(i =>
      floor(col(s"__f$i") / eps).cast("long")): _*)
    val home = pts.withColumn("__cell__", cell)
    val offsets = featureCols.indices.foldLeft(Seq(Seq.empty[Long]))(
      (acc, _) => for (a <- acc; v <- Seq(-1L, 0L, 1L)) yield a :+ v)
    val probe = home.withColumn("__pcell__",
      explode(array(offsets.map(o =>
        zip_with(col("__cell__"), array(o.map(lit): _*), _ + _)): _*)))
    val distSq = featureCols.indices.map(i =>
      (col(s"a.__f$i") - col(s"b.__f$i")) *
        (col(s"a.__f$i") - col(s"b.__f$i"))).reduce(_ + _)
    val pairs = probe.as("a").join(home.as("b"),
        col("a.__pcell__") === col("b.__cell__") &&
        col("a.id") =!= col("b.id") && distSq <= lit(eps * eps))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val degrees = pairs.groupBy(col("id_a").as("id"))
      .agg(count(lit(1)).as("__deg__"))
    val core = degrees.filter(col("__deg__") >= minPts - 1)
      .select(col("id"))
    val coreEdges = pairs
      .join(core.withColumnRenamed("id", "id_a"), "id_a")
      .join(core.withColumnRenamed("id", "id_b"), "id_b")
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val comps = graft.graphops.GraphOps.connectedComponents(coreEdges,
        vertices = Some(core))
      .withColumnRenamed("component", "__cluster__")
    val coreLabeled = core.join(comps, "id")
      .withColumn("is_core", lit(true))
    // border: non-core with >=1 core neighbor -> smallest such cluster
    val border = pairs.join(core.withColumnRenamed("id", "id_a"),
        Seq("id_a"), "left_anti") // id_a not core
      .join(comps.withColumnRenamed("id", "id_b"), "id_b")
      .groupBy(col("id_a").as("id"))
      .agg(min(col("__cluster__")).as("__cluster__"))
      .withColumn("is_core", lit(false))
    val labeled = coreLabeled.select("id", "__cluster__", "is_core")
      .unionByName(border.select("id", "__cluster__", "is_core"))
    pts.select("id").join(labeled, Seq("id"), "left")
      .select(col("id"), col("__cluster__").as("cluster"),
        coalesce(col("is_core"), lit(false)).as("is_core"))
  }
}
