package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Text-generation evaluation metrics over (candidate, reference)
  * pairs — BLEU and ROUGE-N, the standard eval half of a training
  * pipeline (exceeds the reference, which has no eval metrics).
  *
  * Scale shape: the clipped n-gram overlap is computed DISTRIBUTED —
  * explode per-side n-gram counts, join on (pair id, gram), one
  * hash shuffle bounded by total n-gram volume; never a per-row
  * quadratic scan. Everything is deterministic counting + closed
  * arithmetic, so both metrics are DuckDB-oracle-checkable. */
object TextEval {

  private def toks(c: Column): Column = TextFunctions.tokens(lower(c))

  /** Word error rate per pair: token-level Levenshtein distance
    * between candidate and reference (via the codegen'd
    * [[graft.sqlext.WordLevenshtein]] expression — Spark's built-in
    * levenshtein is char-level) divided by the reference token
    * count. Case-folded whitespace tokens (the TextEval convention).
    * Emits (id, n_edits, n_ref, wer); null wer on empty references.
    * Pure map-side — no shuffle at any scale. */
  def wer(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String): DataFrame = {
    val d = graft.sqlext.WordLevenshtein.word_levenshtein(
      toks(col(candCol)), toks(col(refCol)))
    pairs.select(col(idCol), d.cast("long").as("n_edits"),
      size(toks(col(refCol))).cast("long").as("n_ref"))
      .withColumn("wer",
        when(col("n_ref") > 0,
          col("n_edits").cast("double") / col("n_ref")))
  }

  /** ROUGE-L per pair (Lin 2004, rouge-score F1 convention): LCS
    * length over token sequences via the native [[graft.sqlext
    * .WordLcs]] codegen kernel, precision lcs/|cand|, recall
    * lcs/|ref|, F1 = 2·lcs/(|cand|+|ref|) (the harmonic mean's
    * closed form). Rewards in-order coverage at any gap — what the
    * contiguous-n-gram [[rougeN]] can't see. Pure map per pair. */
  def rougeL(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String): DataFrame = {
    val lcs = graft.sqlext.WordLcs.word_lcs(
      toks(col(candCol)), toks(col(refCol)))
    pairs.select(col(idCol), lcs.cast("long").as("lcs"),
        size(toks(col(candCol))).cast("long").as("n_cand"),
        size(toks(col(refCol))).cast("long").as("n_ref"))
      .withColumn("rouge_l_p", when(col("n_cand") > 0,
        col("lcs").cast("double") / col("n_cand")))
      .withColumn("rouge_l_r", when(col("n_ref") > 0,
        col("lcs").cast("double") / col("n_ref")))
      .withColumn("rouge_l_f",
        when(col("n_cand") + col("n_ref") > 0,
          lit(2.0) * col("lcs") / (col("n_cand") + col("n_ref"))))
  }

  /** CIDEr-D per pair (Vedantam et al. 2015, single-reference
    * form): consensus-weighted n-gram similarity — each n-gram
    * weighted by its corpus idf = ln(N / df) over the REFERENCE
    * side, per-n score the length-penalized clipped cosine
    *   exp(−(lc−lr)²/72) · Σ_g min(c_g, r_g)·r_g·idf_g² /
    *     (‖c‖·‖r‖)
    * and the final score 10 · mean over n = 1..`maxN`. Uniform
    * per-sentence TF scaling cancels inside the cosine, so raw
    * counts · idf are the vectors (the pycocoevalcap identity).
    *
    * Scale/determinism: n-gram counts and dfs are exact integer
    * aggregates (df bounded by vocabulary); every dot/norm term is
    * rounded to 12 decimals and DECIMAL-summed — order-free and
    * engine-replayable. */
  def ciderD(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 6, s"maxN in [1,6], got $maxN")
    val base = pairs.select(col(idCol).as("id"),
      toks(col(candCol)).as("ctk"), toks(col(refCol)).as("rtk"))
    val nTbl = base.select(col("id"), col("ctk"), col("rtk"),
      explode(sequence(lit(1), lit(maxN))).as("n"))
    val grams = nTbl.select(col("id"), col("n"),
      ngramArr(col("ctk"), col("n")).as("cg"),
      ngramArr(col("rtk"), col("n")).as("rg"))
    val cc = grams.select(col("id"), col("n"),
        explode(col("cg")).as("g"))
      .groupBy("id", "n", "g").agg(count(lit(1)).as("c"))
    val rc = grams.select(col("id"), col("n"),
        explode(col("rg")).as("g"))
      .groupBy("id", "n", "g").agg(count(lit(1)).as("r"))
    // idf over the reference corpus: df = #refs containing the gram
    val nRefs = base.agg(count(lit(1)).as("nn"))
    val df = rc.select(col("n"), col("g")).groupBy("n", "g")
      .agg(count(lit(1)).as("df"))
    val idf = df.crossJoin(broadcast(nRefs))
      .select(col("n"), col("g"),
        log(col("nn").cast("double") / col("df")).as("idf"))
    // join candidate and reference count vectors per (id, n, gram);
    // grams absent from every reference carry idf 0 (df would be 0
    // only for candidate-exclusive grams -> they contribute 0 to
    // the clipped dot AND to ||c|| with weight... CIDEr assigns
    // idf = ln(N) to unseen grams via the +0 df convention of the
    // reference corpus; pycocoevalcap uses df = max(1, df) ONLY for
    // grams present somewhere. Candidate grams unseen in ANY ref
    // get df undefined -> we follow the single-ref simplification:
    // weight them ln(N/1) (they still add to ||c||).
    val full = cc.join(rc, Seq("id", "n", "g"), "full")
      .select(col("id"), col("n"), col("g"),
        coalesce(col("c"), lit(0L)).as("c"),
        coalesce(col("r"), lit(0L)).as("r"))
      .join(idf, Seq("n", "g"), "left")
      .crossJoin(broadcast(nRefs))
      .withColumn("w",
        coalesce(col("idf"), log(col("nn").cast("double"))))
    def dsum(c: org.apache.spark.sql.Column) =
      sum(round(c, 12).cast("decimal(38,12)"))
    val perN = full.groupBy("id", "n")
      .agg(dsum(least(col("c"), col("r")).cast("double") *
          col("r") * col("w") * col("w")).as("dot"),
        dsum(col("c").cast("double") * col("c") * col("w") *
          col("w")).as("c2"),
        dsum(col("r").cast("double") * col("r") * col("w") *
          col("w")).as("r2"))
    val lens = base.select(col("id"),
      size(col("ctk")).cast("long").as("lc"),
      size(col("rtk")).cast("long").as("lr"))
    val scored = perN.join(lens, Seq("id"))
      .withColumn("pen", exp(
        (col("lc") - col("lr")).cast("double") *
          (col("lc") - col("lr")) * lit(-1.0 / 72)))
      .withColumn("score_n",
        when(col("c2") > 0 && col("r2") > 0,
          col("pen") * col("dot").cast("double") /
            (sqrt(col("c2").cast("double")) *
              sqrt(col("r2").cast("double"))))
          .otherwise(lit(0.0)))
    scored.groupBy("id")
      .agg(dsum(col("score_n")).as("ssum"))
      .join(lens, Seq("id"))
      .select(col("id"), col("lc"), col("lr"),
        // divide by maxN, not rows present: an n with no grams on
        // a side contributes score 0 (the pycocoevalcap behavior)
        (lit(10.0) * col("ssum").cast("double") / maxN)
          .as("cider_d"))
  }

  /** Overlapping word n-grams of a token array as space-joined
    * strings (empty when the text has fewer than n tokens). */
  def ngramArr(t: Column, n: Column): Column =
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - n + 1),
        i => concat_ws(" ", slice(t, i, n))))
      .otherwise(array().cast("array<string>"))

  /** ROUGE-N per pair: clipped n-gram matches m, candidate/reference
    * n-gram totals, precision m/c, recall m/r and F1 = 2m/(c+r)
    * (the harmonic mean collapses to this closed form). Pairs with
    * fewer than n tokens on a side emit 0-total and null scores. */
  def rougeN(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, n: Int): DataFrame = {
    val base = pairs.select(col(idCol).as("id"),
      ngramArr(toks(col(candCol)), lit(n)).as("cg"),
      ngramArr(toks(col(refCol)), lit(n)).as("rg"))
    val totals = base.select(col("id"),
      size(col("cg")).cast("long").as("c_tot"),
      size(col("rg")).cast("long").as("r_tot"))
    def counts(c: String, out: String) = base
      .select(col("id"), explode(col(c)).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as(out))
    val clip = counts("cg", "cc").join(counts("rg", "rc"),
        Seq("id", "g"))
      .groupBy("id").agg(sum(least(col("cc"), col("rc"))).as("m"))
    val j = totals.join(clip, Seq("id"), "left")
      .withColumn("m", coalesce(col("m"), lit(0L)))
    j.select(col("id"), col("m").as("matches"),
      col("c_tot").as("cand_ngrams"), col("r_tot").as("ref_ngrams"),
      when(col("c_tot") > 0,
        round(col("m").cast("double") / col("c_tot"), 6))
        .as("precision"),
      when(col("r_tot") > 0,
        round(col("m").cast("double") / col("r_tot"), 6))
        .as("recall"),
      when(col("c_tot") + col("r_tot") > 0,
        round(lit(2.0) * col("m") / (col("c_tot") + col("r_tot")), 6))
        .as("f1"))
  }

  /** Character n-grams of a string as substrings (empty when the
    * string is shorter than n). */
  def charNgramArr(s: Column, n: Column): Column =
    when(length(s) >= n,
      transform(sequence(lit(1), length(s) - n + 1),
        i => s.substr(i, n)))
      .otherwise(array().cast("array<string>"))

  /** chrF per pair (Popović 2015; sacrebleu's chrF with
    * word_order=0): character n-gram F-score over n = 1..maxN on
    * WHITESPACE-STRIPPED lowercased text. chrP/chrR are the
    * arithmetic means over the orders where BOTH sides have at
    * least one n-gram; chrF = (1+β²)·P·R / (β²·P + R) with β = 2
    * (recall weighted double) — 0 when the denominator is 0, null
    * when no order is defined. Same distributed (pair, n, gram)
    * clipped-count shape as [[bleu]]. */
  def chrF(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, maxN: Int = 6, beta: Double = 2.0): DataFrame = {
    require(maxN >= 1 && beta > 0, "maxN >= 1, beta > 0")
    def strip(c: Column) =
      regexp_replace(lower(trim(c)), "\\s+", "")
    val base = pairs.select(col(idCol).as("id"),
      strip(col(candCol)).as("cs"), strip(col(refCol)).as("rs"))
    val byN = base
      .withColumn("n", explode(sequence(lit(1), lit(maxN))))
      .select(col("id"), col("n"),
        charNgramArr(col("cs"), col("n")).as("cg"),
        charNgramArr(col("rs"), col("n")).as("rg"))
    val totals = byN.select(col("id"), col("n"),
      size(col("cg")).cast("long").as("c_tot"),
      size(col("rg")).cast("long").as("r_tot"))
    def counts(c: String, out: String) = byN
      .select(col("id"), col("n"), explode(col(c)).as("g"))
      .groupBy("id", "n", "g").agg(count(lit(1)).as(out))
    val clip = counts("cg", "cc").join(counts("rg", "rc"),
        Seq("id", "n", "g"))
      .groupBy("id", "n").agg(sum(least(col("cc"), col("rc"))).as("m"))
    val pn = totals.join(clip, Seq("id", "n"), "left")
      .withColumn("m", coalesce(col("m"), lit(0L)))
      .filter(col("c_tot") > 0 && col("r_tot") > 0)
      .withColumn("p", col("m").cast("double") / col("c_tot"))
      .withColumn("r", col("m").cast("double") / col("r_tot"))
    val agg = pn.groupBy("id").agg(
      avg(col("p")).as("chrp"), avg(col("r")).as("chrr"))
    val b2 = beta * beta
    base.select(col("id")).join(agg, Seq("id"), "left")
      .select(col("id"),
        round(col("chrp"), 6).as("chrp"),
        round(col("chrr"), 6).as("chrr"),
        when(col("chrp").isNull, lit(null).cast("double"))
          .when(lit(b2) * col("chrp") + col("chrr") === 0.0, lit(0.0))
          .otherwise(round(lit(1.0 + b2) * col("chrp") * col("chrr") /
            (lit(b2) * col("chrp") + col("chrr")), 6)).as("chrf"))
  }

  /** CORPUS-level BLEU (the sacrebleu default): clipped counts and
    * candidate totals are SUMMED over all pairs before the
    * precision ratio — p_n = Σ_pairs m_n / Σ_pairs c_n — and the
    * brevity penalty uses corpus totals bp = min(1, e^(1−Σr/Σc)).
    * One row out. Same distributed (pair, gram) clipped-count
    * shape as [[bleu]]; the final reduce is a single global
    * aggregate over maxN partial rows. Null when any p_n has a zero
    * denominator (no candidate reached n tokens); 0 when any
    * summed m_n is 0. */
  def corpusBleu(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, maxN: Int = 4): DataFrame = {
    val base = pairs.select(col(idCol).as("id"),
      toks(col(candCol)).as("ct"), toks(col(refCol)).as("rt"))
    val lens = base.agg(
      sum(size(col("ct"))).cast("double").as("clen"),
      sum(size(col("rt"))).cast("double").as("rlen"))
    val byN = base
      .withColumn("n", explode(sequence(lit(1), lit(maxN))))
      .select(col("id"), col("n"),
        ngramArr(col("ct"), col("n")).as("cg"),
        ngramArr(col("rt"), col("n")).as("rg"))
    val totals = byN.groupBy("n")
      .agg(sum(size(col("cg"))).cast("long").as("c_tot"))
    def counts(c: String, out: String) = byN
      .select(col("id"), col("n"), explode(col(c)).as("g"))
      .groupBy("id", "n", "g").agg(count(lit(1)).as(out))
    val clip = counts("cg", "cc").join(counts("rg", "rc"),
        Seq("id", "n", "g"))
      .groupBy("n").agg(sum(least(col("cc"), col("rc"))).as("m"))
    val pn = totals.join(clip, Seq("n"), "left")
      .withColumn("m", coalesce(col("m"), lit(0L)))
      .withColumn("p",
        when(col("c_tot") > 0, col("m").cast("double") / col("c_tot")))
    val agg = pn.agg(
      count(when(col("p").isNotNull, 1)).as("n_defined"),
      count(when(col("p") === 0.0, 1)).as("n_zero"),
      sum(when(col("p") > 0, log(col("p")))).as("sum_ln"),
      max(when(col("n") === 1, col("p"))).as("p1"),
      max(when(col("n") === 2, col("p"))).as("p2"),
      max(when(col("n") === 3, col("p"))).as("p3"),
      max(when(col("n") === 4, col("p"))).as("p4"))
    lens.crossJoin(broadcast(agg))
      .withColumn("bp",
        when(col("clen") >= col("rlen"), lit(1.0))
          .otherwise(exp(lit(1.0) - col("rlen") / col("clen"))))
      .select(
        round(col("p1"), 6).as("p1"), round(col("p2"), 6).as("p2"),
        round(col("p3"), 6).as("p3"), round(col("p4"), 6).as("p4"),
        round(col("bp"), 6).as("bp"),
        when(col("n_defined") < maxN, lit(null).cast("double"))
          .when(col("n_zero") > 0, lit(0.0))
          .otherwise(round(col("bp") *
            exp(col("sum_ln") / maxN), 6)).as("bleu"))
  }

  /** MULTI-REFERENCE sentence BLEU (Papineni et al. 2002 §2.1):
    * input has ONE ROW PER (candidate, reference) — several rows per
    * id — and the clipped count for a gram is
    * min(cand_count, max over references of ref_count). The brevity
    * penalty uses the reference length CLOSEST to the candidate
    * (ties toward the shorter — the sacrebleu convention), selected
    * via a single packed min (|Δlen|·10⁶ + len, lengths < 10⁶).
    * The candidate text must be identical across an id's rows.
    * Output per id: p1..p4, bp, bleu (null when the candidate has
    * fewer than maxN tokens; 0 when any pooled p_n is 0). */
  def multiRefBleu(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, maxN: Int = 4): DataFrame = {
    val base = pairs.select(col(idCol).as("id"),
      toks(col(candCol)).as("ct"), toks(col(refCol)).as("rt"),
      col(refCol).as("rk"))
    val lens = base.groupBy("id").agg(
      first(size(col("ct"))).cast("double").as("clen"),
      min(abs(size(col("rt")) - size(col("ct"))).cast("long") *
        1000000L + size(col("rt"))).as("__rm__"))
      .select(col("id"), col("clen"),
        (col("__rm__") % 1000000L).cast("double").as("rlen"))
    val cand = base.groupBy("id").agg(first(col("ct")).as("ct"))
    val byN = cand
      .withColumn("n", explode(sequence(lit(1), lit(maxN))))
      .select(col("id"), col("n"),
        ngramArr(col("ct"), col("n")).as("cg"))
    val totals = byN.select(col("id"), col("n"),
      size(col("cg")).cast("long").as("c_tot"))
    val cc = byN
      .select(col("id"), col("n"), explode(col("cg")).as("g"))
      .groupBy("id", "n", "g").agg(count(lit(1)).as("cc"))
    // per-reference counts, then the max across references
    val mrc = base
      .withColumn("n", explode(sequence(lit(1), lit(maxN))))
      .select(col("id"), col("rk"), col("n"),
        explode(ngramArr(col("rt"), col("n"))).as("g"))
      .groupBy("id", "rk", "n", "g").agg(count(lit(1)).as("c"))
      .groupBy("id", "n", "g").agg(max(col("c")).as("mrc"))
    val clip = cc.join(mrc, Seq("id", "n", "g"))
      .groupBy("id", "n")
      .agg(sum(least(col("cc"), col("mrc"))).as("m"))
    val pn = totals.join(clip, Seq("id", "n"), "left")
      .withColumn("m", coalesce(col("m"), lit(0L)))
      .withColumn("p",
        when(col("c_tot") > 0, col("m").cast("double") / col("c_tot")))
    val agg = pn.groupBy("id").agg(
      count(when(col("p").isNotNull, 1)).as("n_defined"),
      count(when(col("p") === 0.0, 1)).as("n_zero"),
      sum(when(col("p") > 0, log(col("p")))).as("sum_ln"),
      max(when(col("n") === 1, col("p"))).as("p1"),
      max(when(col("n") === 2, col("p"))).as("p2"),
      max(when(col("n") === 3, col("p"))).as("p3"),
      max(when(col("n") === 4, col("p"))).as("p4"))
    lens.join(agg, Seq("id"), "left")
      .withColumn("bp",
        when(col("clen") >= col("rlen"), lit(1.0))
          .otherwise(exp(lit(1.0) - col("rlen") / col("clen"))))
      .select(col("id"),
        round(col("p1"), 6).as("p1"), round(col("p2"), 6).as("p2"),
        round(col("p3"), 6).as("p3"), round(col("p4"), 6).as("p4"),
        round(col("bp"), 6).as("bp"),
        when(col("n_defined") < maxN, lit(null).cast("double"))
          .when(col("n_zero") > 0, lit(0.0))
          .otherwise(round(col("bp") *
            exp(col("sum_ln") / maxN), 6)).as("bleu"))
  }

  /** Self-BLEU (Zhu et al. 2018) — the standard DIVERSITY metric for
    * a (generated) corpus: each document scored as a multi-reference
    * BLEU candidate against `k` OTHER documents (the deterministic
    * neighbors id+1..id+k — no RNG, fully SQL-replayable); high
    * Self-BLEU = low diversity. Returns one row per document that
    * has at least one neighbor; aggregate the `bleu` column for the
    * corpus score. */
  def selfBleu(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, maxN: Int = 4): DataFrame = {
    require(k >= 1, "k >= 1")
    val a = docs.select(col(idCol).cast("long").as("__i__"),
      col(textCol).as("__c__"))
    val b = docs.select(col(idCol).cast("long").as("__j__"),
      col(textCol).as("__r__"))
    val pairs = a
      .withColumn("__d__", explode(sequence(lit(1), lit(k))))
      .join(b, col("__j__") === col("__i__") + col("__d__"))
    multiRefBleu(pairs, "__i__", "__c__", "__r__", maxN)
      .withColumnRenamed("id", idCol)
  }

  /** Sentence BLEU per pair (Papineni et al. 2002): modified
    * (clipped) n-gram precisions p_1..p_maxN, brevity penalty
    * bp = min(1, e^(1−r/c)), and bleu = bp·exp(Σ ln p_n / maxN).
    * Null when the candidate has fewer than maxN tokens (p_maxN
    * undefined).
    *
    * `smoothing` = 0 (default): no smoothing — bleu is 0 when any
    * p_n is 0 (the raw Papineni definition). `smoothing` = 1:
    * Chen–Cherry (2014) method 1 / NLTK `method1` — a zero clipped
    * count is replaced by `epsilon` before dividing, so
    * p_n = ε / c_tot when m_n = 0; short candidates no longer
    * collapse to 0 (what sacrebleu users expect). `smoothing` = 2:
    * Chen–Cherry method 2 — add one to both the clipped count and
    * the total for every order n ≥ 2: p_n = (m_n+1)/(c_n+1).
    * `smoothing` = 3: Chen–Cherry method 3 / NLTK `method3` /
    * sacrebleu's `exp` family — the k-th zero precision (in n
    * order) becomes 1/(2^k · c_n), an exponentially decaying floor.
    * `smoothing` = 4: Chen–Cherry method 4 / NLTK `method4` —
    * method 3's floor scaled by candidate length,
    * ln(clen)/(2^k · 5 · c_n) (NLTK's K = 5), so SHORT candidates
    * get proportionally smaller smoothed counts; a 1-token
    * candidate keeps its raw zero (NLTK's hyp_len > 1 guard).
    * The reported p1..p4 columns are the smoothed precisions. */
  def bleu(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, maxN: Int = 4, smoothing: Int = 0,
      epsilon: Double = 0.1): DataFrame = {
    require(smoothing >= 0 && smoothing <= 4,
      s"smoothing method $smoothing not implemented (0..4)")
    require(epsilon > 0, "epsilon > 0")
    val base = pairs.select(col(idCol).as("id"),
      toks(col(candCol)).as("ct"), toks(col(refCol)).as("rt"))
    val lens = base.select(col("id"),
      size(col("ct")).cast("double").as("clen"),
      size(col("rt")).cast("double").as("rlen"))
    val byN = base
      .withColumn("n", explode(sequence(lit(1), lit(maxN))))
      .select(col("id"), col("n"),
        ngramArr(col("ct"), col("n")).as("cg"),
        ngramArr(col("rt"), col("n")).as("rg"))
    val totals = byN.select(col("id"), col("n"),
      size(col("cg")).cast("long").as("c_tot"))
    def counts(c: String, out: String) = byN
      .select(col("id"), col("n"), explode(col(c)).as("g"))
      .groupBy("id", "n", "g").agg(count(lit(1)).as(out))
    val clip = counts("cg", "cc").join(counts("rg", "rc"),
        Seq("id", "n", "g"))
      .groupBy("id", "n").agg(sum(least(col("cc"), col("rc"))).as("m"))
    val pn0 = totals.join(clip, Seq("id", "n"), "left")
      .withColumn("m", coalesce(col("m"), lit(0L)))
      .withColumn("p",
        when(col("c_tot") > 0, col("m").cast("double") / col("c_tot")))
    // methods 1/3 rewrite zero precisions to a positive floor and
    // method 2 shifts the ratio, so downstream the n_zero counter is
    // 0 (or counts a genuinely-zero smoothed p1 for method 2) and
    // the generic ln-sum path applies as-is
    val pn = smoothing match {
      case 1 =>
        pn0.withColumn("p", when(col("p") === 0.0,
          lit(epsilon) / col("c_tot")).otherwise(col("p")))
      case 2 =>
        pn0.withColumn("p", when(col("c_tot") > 0 && col("n") > 1,
          (col("m") + lit(1)).cast("double") / (col("c_tot") + lit(1)))
          .otherwise(col("p")))
      case 3 =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy("n")
        pn0.withColumn("__kz__",
          sum(when(col("p") === 0.0, 1).otherwise(0)).over(w))
          .withColumn("p", when(col("p") === 0.0,
            lit(1.0) / (pow(lit(2.0), col("__kz__")) * col("c_tot")))
            .otherwise(col("p")))
          .drop("__kz__")
      case 4 =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy("n")
        pn0.join(lens.select(col("id"), col("clen")), Seq("id"))
          .withColumn("__kz__",
            sum(when(col("p") === 0.0, 1).otherwise(0)).over(w))
          .withColumn("p",
            when(col("p") === 0.0 && col("clen") > 1.0,
              log(col("clen")) / (pow(lit(2.0), col("__kz__")) *
                lit(5.0) * col("c_tot")))
            .otherwise(col("p")))
          .drop("__kz__", "clen")
      case _ => pn0
    }
    val agg = pn.groupBy("id").agg(
      count(when(col("p").isNotNull, 1)).as("n_defined"),
      count(when(col("p") === 0.0, 1)).as("n_zero"),
      sum(when(col("p") > 0, log(col("p")))).as("sum_ln"),
      max(when(col("n") === 1, col("p"))).as("p1"),
      max(when(col("n") === 2, col("p"))).as("p2"),
      max(when(col("n") === 3, col("p"))).as("p3"),
      max(when(col("n") === 4, col("p"))).as("p4"))
    lens.join(agg, Seq("id"), "left")
      .withColumn("bp",
        when(col("clen") >= col("rlen"), lit(1.0))
          .otherwise(exp(lit(1.0) - col("rlen") / col("clen"))))
      .select(col("id"),
        round(col("p1"), 6).as("p1"), round(col("p2"), 6).as("p2"),
        round(col("p3"), 6).as("p3"), round(col("p4"), 6).as("p4"),
        round(col("bp"), 6).as("bp"),
        when(col("n_defined") < maxN, lit(null).cast("double"))
          .when(col("n_zero") > 0, lit(0.0))
          .otherwise(round(col("bp") *
            exp(col("sum_ln") / maxN), 6)).as("bleu"))
  }
}
