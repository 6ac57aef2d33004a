package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PORTABLE ORACLE TWIN of [[MlOps.randomForestMl]] (the q322/q335/
  * q441 precedent): a depth-2 random forest where every source of
  * MLlib randomness is replaced by a deterministic, engine-replayable
  * rule, and every split decision is computed from exact BIGINT
  * count aggregates:
  *
  *  - bagging       → md5-48 lottery on (row id, tree, salt) — the
  *    q323 sample-twin device, a pure map-side filter;
  *  - feature subsetting → tree t sees 2 of the 3 features, subset
  *    t mod 3 (a fixed public schedule, not an RNG draw);
  *  - split search  → exact-Gini over a FIXED threshold grid per
  *    feature (the features are small non-negative integer
  *    encodings, so the full grid is the full candidate set; no
  *    histogram approximation). The weighted-Gini argmax maximizes
  *    (posL²+negL²)/nL + (posR²+negR²)/nR — all numerators exact
  *    BIGINTs, the two divisions the only doubles — with the total
  *    (score desc, feature asc, threshold asc) tiebreak.
  *
  * Everything is aggregate-shaped: one explode for the tree
  * replicas, one (tree, f0, f1, f2) cell aggregation (the cube of
  * small integer domains — a few thousand cells per tree regardless
  * of row count), and candidate scoring as an equi-join of that
  * cell table against a LocalRelation candidate grid. At 100 TB the
  * only data-sized stages are the map-side lottery and the cell
  * aggregation; the tree search runs on cells.
  *
  * Emits the trained forest in long form — one row per node:
  * 'root' and child 'l'/'r' rows carry (feature, threshold, score,
  * n, n_pos) of the split; leaf rows 'll'/'lr'/'rl'/'rr' carry the
  * leaf counts and the majority vote `pred` (2·pos > n). */
object ForestTwin {

  def giniStumpForestTwin(df: DataFrame, idCol: String,
      featCols: Seq[String], labelCol: String,
      thresholds: Seq[Seq[Int]], trees: Int = 5,
      bagRate: Double = 0.7): DataFrame = {
    require(featCols.length == 3 && thresholds.length == 3,
      s"exactly 3 integer features (3x3 fixed-subset schedule), " +
        s"got ${featCols.length}")
    require(trees >= 1 && trees <= 16, s"trees in [1,16], got $trees")
    val spark = df.sparkSession
    import spark.implicits._

    val base0 = df
      .filter(col(idCol).isNotNull && col(labelCol).isNotNull &&
        featCols.map(col(_).isNotNull).reduce(_ && _))
      .select(col(idCol).cast("string").as("id"),
        col(featCols(0)).cast("long").as("f0"),
        col(featCols(1)).cast("long").as("f1"),
        col(featCols(2)).cast("long").as("f2"),
        col(labelCol).cast("long").as("y"))
    // the tree-replica explode + per-row md5 bag lottery below is the
    // expensive map side; a small parquet input arrives as ONE scan
    // split and would run it single-threaded. Repartition UP to the
    // core count (never down); the downstream cube aggregation is
    // partitioning-invariant. Small-input check via the optimizer's
    // size estimate, not .rdd.getNumPartitions (which under AQE
    // finalizes the plan and eagerly runs upstream stages —
    // round-10 advice).
    val par = spark.sparkContext.defaultParallelism
    val smallInput = base0.queryExecution.optimizedPlan.stats
      .sizeInBytes < BigInt(par.toLong) * (16L << 20)
    val base = if (smallInput) base0.repartition(par) else base0

    // tree replicas + deterministic bag lottery (map-side only)
    val bags = base
      .withColumn("tree",
        explode(sequence(lit(0L), lit((trees - 1).toLong))))
      .filter(graft.llm.PipelineOps.hash48Unit(concat(
        col("id"), lit("-"), col("tree").cast("string"),
        lit("bf8"))) < bagRate)

    // the ONLY data-sized aggregation: cells of the integer cube.
    // localCheckpoint: the cube table (trees x |f0| x |f1| x |f2|,
    // domain-bounded) feeds root, sided, child AND leaves — without
    // the cut, each downstream branch replays the full scan + 5x
    // tree-replica md5 lottery (the data-sized part of the whole
    // twin). Eager per invocation, so every run still computes it
    // exactly once from parquet.
    val cells = bags.groupBy("tree", "f0", "f1", "f2")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      .localCheckpoint(true)

    // fixed candidate grid: tree t mod 3 -> feature subset
    // {0:(f0,f1), 1:(f1,f2), 2:(f0,f2)}; thresholds(f) per feature
    val candRows = for {
      t <- 0 until trees
      f <- Seq(Seq(0, 1), Seq(1, 2), Seq(0, 2))(t % 3)
      thr <- thresholds(f)
    } yield (t.toLong, f.toLong, thr.toLong)
    val cand = candRows.toDF("tree", "feat", "thr")

    def fval: Column = when(col("feat") === 0, col("f0"))
      .when(col("feat") === 1, col("f1")).otherwise(col("f2"))

    // exact-Gini candidate scoring from BIGINT cells
    def score(grouped: DataFrame): DataFrame = grouped
      .filter(col("nl") > 0 && col("nr") > 0)
      .withColumn("score",
        round((col("pl") * col("pl") +
            (col("nl") - col("pl")) * (col("nl") - col("pl")))
            .cast("double") / col("nl") +
          (col("pr") * col("pr") +
            (col("nr") - col("pr")) * (col("nr") - col("pr")))
            .cast("double") / col("nr"), 9))

    def splitAgg(cc: DataFrame, keys: Seq[String]): DataFrame =
      score(cc
        .groupBy((keys :+ "feat" :+ "thr").map(col): _*)
        .agg(sum(when(fval <= col("thr"), col("n"))
            .otherwise(0L)).as("nl"),
          sum(when(fval <= col("thr"), col("pos"))
            .otherwise(0L)).as("pl"),
          sum(when(fval > col("thr"), col("n"))
            .otherwise(0L)).as("nr"),
          sum(when(fval > col("thr"), col("pos"))
            .otherwise(0L)).as("pr")))

    def argmax(scored: DataFrame, keys: Seq[String]): DataFrame = {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(col("score").desc, col("feat").asc, col("thr").asc)
      scored.withColumn("__rn__", row_number().over(w))
        .filter(col("__rn__") === 1).drop("__rn__")
    }

    val root = argmax(splitAgg(cells.join(cand, "tree"),
      Seq("tree")), Seq("tree"))
      .select(col("tree"), col("feat").as("rfeat"),
        col("thr").as("rthr"), col("score").as("rscore"),
        (col("nl") + col("nr")).as("rn"),
        (col("pl") + col("pr")).as("rpos"))

    // cells tagged with their root side
    val sided = cells.join(root, "tree")
      .withColumn("side",
        when(when(col("rfeat") === 0, col("f0"))
          .when(col("rfeat") === 1, col("f1"))
          .otherwise(col("f2")) <= col("rthr"), "l").otherwise("r"))

    val child = argmax(splitAgg(sided.join(cand, "tree"),
      Seq("tree", "side")), Seq("tree", "side"))

    val leaves = sided
      .join(child.select(col("tree"), col("side"),
        col("feat").as("cfeat"), col("thr").as("cthr")),
        Seq("tree", "side"))
      .withColumn("leaf", concat(col("side"),
        when(when(col("cfeat") === 0, col("f0"))
          .when(col("cfeat") === 1, col("f1"))
          .otherwise(col("f2")) <= col("cthr"), "l").otherwise("r")))
      .groupBy("tree", "leaf")
      .agg(sum(col("n")).as("n"), sum(col("pos")).as("n_pos"))

    val rootRows = root.select(col("tree"), lit("root").as("node"),
      col("rfeat").as("feature"), col("rthr").as("threshold"),
      col("rscore").as("score"), col("rn").as("n"),
      col("rpos").as("n_pos"), lit(null).cast("boolean").as("pred"))
    val childRows = child.select(col("tree"), col("side").as("node"),
      col("feat").as("feature"), col("thr").as("threshold"),
      col("score"), (col("nl") + col("nr")).as("n"),
      (col("pl") + col("pr")).as("n_pos"),
      lit(null).cast("boolean").as("pred"))
    val leafRows = leaves.select(col("tree"), col("leaf").as("node"),
      lit(null).cast("long").as("feature"),
      lit(null).cast("long").as("threshold"),
      lit(null).cast("double").as("score"), col("n"), col("n_pos"),
      (col("n_pos") * 2 > col("n")).as("pred"))
    rootRows.unionByName(childRows).unionByName(leafRows)
  }
}
