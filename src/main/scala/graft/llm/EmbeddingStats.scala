package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-quality analytics over an `Array[Float]` column —
  * the "is this embedding space any good for these labels" audit a
  * training-data pipeline runs before spending GPU time (reference
  * exposes raw vector kernels only; this is the analysis layer).
  *
  * Scale/determinism: per-dimension ANOVA decomposition from ONE
  * posexplode + two keyed aggregations; every per-element term is
  * rounded to a fixed decimal scale and DECIMAL-summed (order-free,
  * the repo's engine-replay convention), so the report hash-matches
  * across engines and cluster layouts. */
object EmbeddingStats {

  /** Per-dimension one-way ANOVA class separability: for each
    * embedding dimension, SSB/SSW and the F statistic across the
    * label classes — dimensions with high F carry label signal;
    * a flat report means the space won't linearly separate the
    * classes. `dim` is 1-based.
    *
    * Uses the moment identities SSB = Σ_l s_l²/n_l − G²/n and
    * SSW = Σ_l ss_l − Σ_l s_l²/n_l, with s/ss kept as exact DECIMAL
    * sums of round-9 per-element terms and each label's s_l²/n_l
    * term rounded to 12 decimals before the (bounded, per-label)
    * DECIMAL sum. */
  def classSeparability(df: DataFrame, vecCol: String,
      labelCol: String): DataFrame = {
    val base = df
      .filter(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).as("lbl"),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col("lbl"), (col("pos") + 1).as("dim"),
        col("v").cast("double").as("vd"))
    val perLabel = base.groupBy("dim", "lbl")
      .agg(count(lit(1)).as("nl"),
        sum(round(col("vd"), 9).cast("decimal(28,9)")).as("sl"),
        sum(round(col("vd") * col("vd"), 9).cast("decimal(28,9)"))
          .as("ssl"))
    val u = col("sl").cast("double") * col("sl").cast("double") /
      col("nl")
    val perDim = perLabel.groupBy("dim")
      .agg(sum("nl").as("n"), count(lit(1)).as("k"),
        sum(col("sl")).as("g"),
        sum(col("ssl")).as("sstot"),
        sum(round(u, 12).cast("decimal(38,12)")).as("usum"))
    perDim
      .filter(col("k") > 1 && col("n") > col("k"))
      .select(col("dim"), col("n").cast("long").as("n"),
        col("k").cast("long").as("k"),
        (col("usum").cast("double") -
          col("g").cast("double") * col("g").cast("double") /
            col("n")).as("ssb"),
        (col("sstot").cast("double") - col("usum").cast("double"))
          .as("ssw"),
        // SSW can be exactly 0 (a dimension constant within every
        // class) -> F undefined; emit null rather than ANSI-throw
        when(col("sstot").cast("double") - col("usum").cast("double")
            > 0,
          (col("usum").cast("double") -
            col("g").cast("double") * col("g").cast("double") /
              col("n")) / (col("k") - 1) /
            ((col("sstot").cast("double") -
              col("usum").cast("double")) / (col("n") - col("k"))))
          .as("f_stat"))
  }

  /** Per-label centroid table: exact DECIMAL mean of round-9
    * elements per (label, dim) — the broadcastable summary used for
    * drift checks between embedding versions. */
  def labelCentroids(df: DataFrame, vecCol: String,
      labelCol: String): DataFrame =
    df.filter(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).as("lbl"),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("lbl"), (col("pos") + 1).as("dim"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("v").cast("double"), 9).cast("decimal(28,9)"))
          .as("s"))
      .select(col("lbl"), col("dim"), col("n"),
        (col("s").cast("double") / col("n")).as("centroid"))
}
