package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus deduplication pipeline — the composition a
  * training-data run actually executes, staged cheap-to-expensive:
  *
  *  1. exact dedup on content hash (one shuffle);
  *  2. MinHash-LSH candidate pairs on the survivors;
  *  3. exact word-set Jaccard verification of candidates only;
  *  4. connected components over confirmed-duplicate pairs so
  *     transitive duplicates collapse to one keeper (smallest id).
  *
  * Every stage is a bounded-key shuffle; nothing is all-pairs and
  * nothing lands on the driver. Returns the corpus with `keep`
  * boolean and `dup_group` (the group representative's id).
  */
object DedupPipeline {

  /** @param fast choose the candidate-generation kernel: `true`
    *   (default) = the codegen xxhash64 kernel (80× over the HOF md5
    *   recipe at sf0.1, SCALE.md round 9); `false` = the portable
    *   md5 kernel that replays in any engine. RECALL SENSITIVITY:
    *   the two kernels draw DIFFERENT minhash permutations, so at
    *   identical (numHashes, bands) a borderline near-dup pair can
    *   land in candidates under one kernel and not the other (the
    *   round-9 switch needed bands 6→12 to keep a known near-dup in
    *   LlmOpsSpec). When migrating callers between kernels, re-tune
    *   bands — more bands = higher recall, more candidate volume;
    *   precision is unaffected either way because stage 3 verifies
    *   candidates with exact Jaccard. */
  def dedupCorpus(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 12, bands: Int = 4, shingleSize: Int = 3,
      jaccardThreshold: Double = 0.8,
      fast: Boolean = true): DataFrame = {
    // 1. exact: representative = min id per identical text
    val withHash = df.withColumn("__md5__", md5(col(textCol)))
    val exactRep = withHash.groupBy("__md5__")
      .agg(min(col(idCol)).as("__exact_rep__"))
    val exact = withHash.join(exactRep, "__md5__")
    val survivors = exact.filter(col(idCol) === col("__exact_rep__"))

    // 2.+3. near-dup pairs among exact representatives, verified.
    // Kernel per `fast` (see scaladoc); candidate recall differences
    // between kernels wash out in the exact-Jaccard verification
    // below ONLY for pairs both kernels surface — band tuning decides
    // which pairs are surfaced at all.
    val candidates =
      if (fast) Dedup.minhashLshPairsFast(survivors, textCol,
        idCol, numHashes, bands, shingleSize)
      else Dedup.minhashLshPairs(survivors, textCol,
        idCol, numHashes, bands, shingleSize)
    val sets = survivors.select(col(idCol).as("__sid__"),
      graft.functions.TextFunctions.wordSet(col(textCol)).as("__ws__"))
    val confirmed = candidates
      .join(sets.withColumnRenamed("__sid__", "id_a")
        .withColumnRenamed("__ws__", "__wa__"), "id_a")
      .join(sets.withColumnRenamed("__sid__", "id_b")
        .withColumnRenamed("__ws__", "__wb__"), "id_b")
      .withColumn("__j__",
        size(array_intersect(col("__wa__"), col("__wb__"))).cast("double") /
          size(array_union(col("__wa__"), col("__wb__"))))
      .filter(col("__j__") >= jaccardThreshold)
      .select(col("id_a").as("src"), col("id_b").as("dst"))

    // 4. transitive closure → near-dup group representative
    val comps = graft.graphops.GraphOps.connectedComponents(confirmed)
      .withColumnRenamed("id", "__exact_rep__")
      .withColumnRenamed("component", "__near_rep__")

    exact.join(comps, Seq("__exact_rep__"), "left")
      .withColumn("dup_group",
        coalesce(col("__near_rep__"), col("__exact_rep__")))
      .withColumn("keep", col(idCol) === col("dup_group"))
      .drop("__md5__", "__exact_rep__", "__near_rep__")
  }
}
