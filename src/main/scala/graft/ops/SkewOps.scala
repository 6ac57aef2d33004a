package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY §7.6 scale notes).
  *
  * First-line tool at runtime is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default). Explicit
  * salting below is for the cases AQE can't fix: a key so hot it
  * overwhelms a single task even after splitting, deterministic plan
  * requirements, or non-AQE engines. Aggregation skew needs no
  * helper — Spark's partial aggregation already combines hot keys
  * map-side before the exchange.
  */
object SkewOps {

  /** Skew-safe equi-join: the fact side derives a deterministic salt
    * in [0, salts) from `saltFrom` (any well-distributed fact column,
    * e.g. a row id), the dim side is replicated `salts`× — so a hot
    * join key's rows spread over `salts` tasks instead of one. The
    * join result is EXACTLY the plain join's (each fact row still
    * meets each matching dim row exactly once, at its own salt).
    * Cost: dim shuffle volume × salts — size `salts` to the observed
    * hot-key factor, not higher. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltFrom: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    // only fact-preserving types: a right/full join would emit each
    // unmatched dim row `salts` times (one per replica)
    require(Seq("inner", "left", "left_outer", "leftouter", "left_semi",
        "leftsemi", "left_anti", "leftanti")
        .contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports fact-preserving join types only, got " +
        joinType)
    val sf = fact.withColumn("__salt__",
      pmod(xxhash64(col(saltFrom)), lit(salts.toLong)).cast("int"))
    val sd = dim.withColumn("__salt__",
      explode(sequence(lit(0), lit(salts - 1))))
    sf.join(sd,
        sf(factKey) === sd(dimKey) && sf("__salt__") === sd("__salt__"),
        joinType)
      .drop(sf("__salt__")).drop(sd("__salt__"))
  }

  /** Interval-overlap join without a theta join: both sides explode
    * their [start, end] span (closed intervals, integer domain — cast
    * timestamps to epoch days/seconds first) into coarse buckets of
    * `bucketWidth`, candidates meet by bucket EQUI-join, and a pair is
    * emitted only in the canonical bucket containing max(startA,
    * startB) — so the output carries no duplicates and needs no
    * dedup shuffle. The final overlap predicate discards same-bucket
    * non-overlaps. A plain theta join degenerates to
    * broadcast-nested-loop (every-row-×-every-row) — this plan is an
    * ordinary shuffled equi-join that scales with overlap density;
    * fan-out per row is interval_length/bucketWidth + 1, so pick
    * `bucketWidth` near the typical interval length. Rows with
    * end < start are dropped. Both inputs must have disjoint column
    * names. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      startA: String, endA: String, startB: String, endB: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be > 0")
    def bucketize(df: DataFrame, s: String, e: String) =
      df.filter(col(e) >= col(s))
        .withColumn("__bkt__", explode(sequence(
          floor(col(s).cast("long") / lit(bucketWidth)).cast("long"),
          floor(col(e).cast("long") / lit(bucketWidth)).cast("long"))))
    val l = bucketize(left, startA, endA)
    val r = bucketize(right, startB, endB)
      .withColumnRenamed("__bkt__", "__bktr__")
    val canon = floor(greatest(col(startA), col(startB)).cast("long") /
      lit(bucketWidth)).cast("long")
    l.join(r,
        col("__bkt__") === col("__bktr__") &&
        col(startA) <= col(endB) && col(startB) <= col(endA) &&
        col("__bkt__") === canon)
      .drop("__bkt__", "__bktr__")
  }
}
