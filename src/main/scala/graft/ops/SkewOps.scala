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
}
