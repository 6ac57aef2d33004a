package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked-retrieval evaluation (the trec_eval metric family):
  * P@k, R@k, MRR, AP@k and NDCG@k per query from a ranked run and
  * graded relevance judgments.
  *
  * This is the measurement layer for the similarity-search stack
  * (brute-force cosine q47, hyperplane-LSH q48, IVF q77, int8 q283,
  * RRF fusion q346): an ANN index is only as good as its ranked
  * output scored against ground truth. The reference leaves this to
  * user-side loops over collected results
  * (pandrs `src/ml/metrics/` has classification/regression metrics
  * but no ranked-list metrics); here the whole evaluation is two
  * bounded shuffles on the cluster.
  *
  * Scale shape (100 TB): the run is Q×k rows by construction (rows
  * with rank > k are dropped before the shuffle) and judgments are
  * per-query bounded; both windows are PARTITIONED by query id —
  * never a global sort. One left join run↔qrels on (qid, did), one
  * per-query window each side, one aggregate.
  *
  * Conventions (documented because every engine pair differs):
  *  - unjudged retrieved documents count as rel = 0 (trec_eval);
  *  - P@k divides by k even when fewer than k were retrieved;
  *  - MRR is 1/rank of the first retrieved rel>0 doc, 0.0 if none;
  *  - AP@k = (Σ_{hit at rank i≤k} hits_cum(i)/i) / min(n_rel, k),
  *    null when the query has no relevant documents;
  *  - NDCG@k uses exponential gain (2^rel − 1)/log2(rank + 1)
  *    (Burges et al. 2005), ideal DCG from the top-k judgments by
  *    rel desc; null when IDCG = 0.
  * Doubles are rounded to 6 dp from exact integer counts with a
  * fixed association order so a DuckDB replay hash-matches.
  */
object RetrievalEval {

  /** Score a ranked `run` (qidCol, didCol, rankCol with 1-based
    * ranks) against `qrels` (qidCol, didCol, relCol graded >= 0).
    * Emits one row per query present in the run. */
  def rankEval(run: DataFrame, qrels: DataFrame, k: Int,
      qidCol: String = "qid", didCol: String = "did",
      rankCol: String = "rank", relCol: String = "rel"): DataFrame = {
    require(k >= 1, s"rankEval: k must be >= 1, got $k")
    val judged = qrels.select(col(qidCol), col(didCol),
      col(relCol).cast("double").as("__rel__"))
    val r = run.filter(col(rankCol) >= 1 && col(rankCol) <= k)
      .select(col(qidCol), col(didCol), col(rankCol).as("__rnk__"))
      .join(judged, Seq(qidCol, didCol), "left")
      .withColumn("__rel__", coalesce(col("__rel__"), lit(0.0)))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("__rnk__"))
    val isRel = (col("__rel__") > 0).cast("long")
    val gain = (pow(lit(2.0), col("__rel__")) - lit(1.0)) /
      log2(col("__rnk__") + lit(1.0))
    val perQ = r
      .withColumn("__hc__", sum(isRel).over(w))
      .withColumn("__ap_t__", when(col("__rel__") > 0,
        col("__hc__").cast("double") / col("__rnk__"))
        .otherwise(lit(0.0)))
      .groupBy(col(qidCol))
      .agg(count(lit(1)).as("__n_ret__"),
        sum(isRel).as("__hits__"),
        sum(gain).as("__dcg__"),
        sum(col("__ap_t__")).as("__ap_num__"),
        min(when(col("__rel__") > 0, col("__rnk__")))
          .as("__first__"))
    // ideal ranking: judgments sorted rel desc (ties by doc id; the
    // positional gains of equal rels are equal, so the tiebreak
    // cannot change the IDCG value, only make the plan deterministic)
    val wi = Window.partitionBy(col(qidCol))
      .orderBy(col("__rel__").desc, col(didCol))
    val ideal = judged.filter(col("__rel__") > 0)
      .withColumn("__pos__", row_number().over(wi))
      .groupBy(col(qidCol))
      .agg(count(lit(1)).as("__n_rel__"),
        sum(when(col("__pos__") <= k,
          (pow(lit(2.0), col("__rel__")) - lit(1.0)) /
            log2(col("__pos__") + lit(1.0)))).as("__idcg__"))
    val nRel = coalesce(col("__n_rel__"), lit(0L))
    perQ.join(ideal, Seq(qidCol), "left")
      .select(col(qidCol),
        col("__n_ret__").cast("long").as("n_ret"),
        nRel.cast("long").as("n_rel"),
        col("__hits__").cast("long").as("hits"),
        round(col("__hits__").cast("double") / lit(k), 6)
          .as("p_at_k"),
        when(nRel > 0,
          round(col("__hits__").cast("double") / nRel, 6))
          .as("r_at_k"),
        round(coalesce(lit(1.0) / col("__first__"), lit(0.0)), 6)
          .as("rr"),
        when(nRel > 0,
          round(col("__ap_num__") / least(nRel, lit(k.toLong)), 6))
          .as("ap_at_k"),
        when(col("__idcg__") > 0,
          round(col("__dcg__") / col("__idcg__"), 6))
          .as("ndcg_at_k"))
  }

  /** Rank-biased overlap (Webber, Moffat & Zobel 2010) between two
    * rankings of the same id space, truncated at depth k — the
    * top-weighted "how much did my retrieval change" number for
    * comparing ranker versions / ANN vs exact / A-B rank lists,
    * robust to non-conjoint tails (unlike Kendall's τ):
    *   RBO@k = (1−p) Σ_{d=1..k} p^{d−1} · |A_d ∩ B_d| / d
    *
    * Ranks derive per list by (score desc, id asc) — a PARTITIONED
    * window over per-list candidate sets. Overlap-at-depth counts
    * are exact integers; the geometric weights are computed ONCE in
    * Scala by repeated multiplication and inlined as the same
    * double literals in the oracle (the Fellegi-Sunter inline-
    * literal convention), each depth term rounded to 12 decimals
    * and DECIMAL-summed. Emits one row per depth (overlap,
    * agreement, cumulative rbo@d) — the last row is RBO@k. */
  def rbo(scores: DataFrame, listCol: String, idCol: String,
      scoreCol: String, listA: String, listB: String,
      p: Double = 0.9, k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 100, s"k in [1,100], got $k")
    require(p > 0 && p < 1, s"p in (0,1), got $p")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__l__"))
      .orderBy(col("__s__").desc, col("__i__").asc)
    val ranked = scores
      .filter(col(listCol).isin(listA, listB))
      .select(col(listCol).as("__l__"), col(idCol).as("__i__"),
        col(scoreCol).as("__s__"))
      .withColumn("__r__", row_number().over(w))
      .filter(col("__r__") <= k)
    val a = ranked.filter(col("__l__") === listA)
      .select(col("__i__"), col("__r__").as("ra"))
    val b = ranked.filter(col("__l__") === listB)
      .select(col("__i__"), col("__r__").as("rb"))
    // overlap at depth d = ids with max(ra, rb) <= d: a histogram
    // of that entry depth + a cumulative sum over the k-row depth
    // table (LocalRelation equi-join — no nested-loop anywhere)
    val hist = a.join(b, Seq("__i__"))
      .select(greatest(col("ra"), col("rb")).as("d0"))
      .groupBy("d0").agg(count(lit(1)).as("__c__"))
    val session = scores.sparkSession
    import session.implicits._
    val depths = (1 to k).toDF("d")
    val weights = Array.iterate(1.0, k)(_ * p)
    val wCol = (1 until k).foldLeft(
      when(col("d") === 1, weights(0))) { (acc, i) =>
      acc.when(col("d") === i + 1, weights(i))
    }
    val wd = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withOverlap = depths
      .join(hist, col("d") === col("d0"), "left")
      .select(col("d"), coalesce(col("__c__"), lit(0L)).as("__c__"))
      .withColumn("overlap", sum(col("__c__")).over(wd))
    // drop depth rows only when the rankings share nothing at all
    // (the SQL image groups an empty intersection to zero rows)
    withOverlap
      .select(col("d"), col("overlap"),
        (col("overlap").cast("double") / col("d")).as("agreement"),
        round(wCol * col("overlap") / col("d"), 12)
          .cast("decimal(38,12)").as("__t__"))
      .withColumn("rbo",
        (lit(1.0) - p) * sum(col("__t__")).over(wd).cast("double"))
      .drop("__t__")
  }

  /** Macro (mean-over-queries) summary of `rankEval` output: the
    * corpus-level numbers a leaderboard reports. Null per-query
    * cells (no relevant docs / zero IDCG) are excluded from their
    * mean, matching trec_eval's handling. */
  def rankEvalMacro(perQuery: DataFrame): DataFrame =
    perQuery.agg(count(lit(1)).cast("long").as("n_queries"),
      round(avg("p_at_k"), 6).as("mean_p_at_k"),
      round(avg("r_at_k"), 6).as("mean_r_at_k"),
      round(avg("rr"), 6).as("mrr"),
      round(avg("ap_at_k"), 6).as("map_at_k"),
      round(avg("ndcg_at_k"), 6).as("mean_ndcg_at_k"))
}
