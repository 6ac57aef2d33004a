package graft

import org.apache.spark.sql.functions._
import graft.llm.{PipelineOps, Similarity}
import graft.ml.MlMetrics

/** Round-7 pipeline-guard additions: leakage-safe group split,
  * label-noise audit, script-mix audit, Gopher rules, hard-negative
  * mining. */
class PipelineGuardSpec extends SparkSpecBase {
  import spark.implicits._

  test("groupSplit: no group straddles the split, assignment is " +
    "append-stable") {
    val df = (1 to 500).map(i => (i % 50, i)).toDF("grp", "x")
    val sp = PipelineOps.groupSplit(df, "grp", testPermille = 300,
      salt = "s")
    sp.groupBy("grp").agg(countDistinct("split").as("k"))
      .agg(max("k")).collect()(0).getLong(0) shouldBe 1L
    // appending rows never flips an existing group's side
    val bigger = (1 to 1000).map(i => (i % 50, i)).toDF("grp", "x")
    val a = sp.select("grp", "split").distinct().collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val b = PipelineOps.groupSplit(bigger, "grp", 300, "s")
      .select("grp", "split").distinct().collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    a shouldBe b
    // permille 0 -> everything trains
    PipelineOps.groupSplit(df, "grp", 0, "s")
      .filter(col("split") === "test").count() shouldBe 0L
  }

  test("labelNoiseAudit: hand-computed confident disagreements") {
    val df = Seq(
      (true, 0.95), // confident agree
      (true, 0.05), // confident DISAGREE -> flagged
      (true, 0.60), // not confident
      (false, 0.95), // confident DISAGREE -> flagged
      (false, 0.05), // confident agree
      (false, 0.40)) // not confident
      .toDF("y", "p")
    val r = MlMetrics.labelNoiseAudit(df, "y", "p", tau = 0.9)
      .orderBy("label").collect()
    val neg = r(0) // label = false
    (neg.getAs[Long]("n"), neg.getAs[Long]("n_confident"),
      neg.getAs[Long]("n_flagged")) shouldBe ((3L, 2L, 1L))
    val pos = r(1)
    (pos.getAs[Long]("n"), pos.getAs[Long]("n_confident"),
      pos.getAs[Long]("n_flagged")) shouldBe ((3L, 2L, 1L))
    pos.getAs[Long]("flagged_ppm") shouldBe 333333L
  }

  test("scriptMix: exact char-class counts") {
    val df = Seq((1L, "ab1 c!")).toDF("id", "text")
    val r = PipelineOps.scriptMix(df, "id", "text").collect()(0)
    r.getAs[Long]("n_chars") shouldBe 6L
    r.getAs[Long]("n_alpha") shouldBe 3L
    r.getAs[Long]("n_digit") shouldBe 1L
    r.getAs[Long]("n_space") shouldBe 1L
    r.getAs[Long]("n_other") shouldBe 1L
    r.getAs[Long]("alpha_ppm") shouldBe 500000L
  }

  test("gopherRules: crafted docs hit the intended rules") {
    val good = (("the be to of and that have with " * 5) +
      ("sound words here " * 10)).trim
    val tooShort = "tiny doc"
    val symbolHeavy = "# # # # # the be of and few words"
    val df = Seq(good, tooShort, symbolHeavy).toDF("text")
    val r = PipelineOps.gopherRules(df, "text", minWords = 30)
      .collect().map(x => x.getString(1) ->
        (x.getAs[Long]("n_pass"), x.getAs[Long]("n_docs"))).toMap
    r("word_count")._2 shouldBe 3L
    r("word_count")._1 shouldBe 1L // only `good` has >= 30 words
    r("symbol_ratio")._1 shouldBe 2L // symbolHeavy: 5 symbols * 10 > 11 words
    r("stop_words")._1 shouldBe 2L // good + symbolHeavy
    r("all_rules")._1 shouldBe 1L
  }

  test("fleissKappa: perfect agreement = 1, independent-looking " +
    "split near the textbook value, deviating units dropped loudly") {
    import graft.stats.StatsOps
    // 4 units, 3 raters each, all agree -> kappa 1
    val perfect = (1 to 4).flatMap(u => (1 to 3).map(r =>
      (u.toLong, (u % 2).toLong))).toDF("u", "rating")
    val p = StatsOps.fleissKappa(perfect, "u", "rating").collect()(0)
    p.getAs[Long]("n_raters") shouldBe 3L
    approx(p.getAs[Double]("kappa"), 1.0, 1e-9)
    // one unit with an extra rater is excluded and counted
    val uneven = perfect.union(Seq((1L, 0L)).toDF("u", "rating"))
    val q = StatsOps.fleissKappa(uneven, "u", "rating").collect()(0)
    q.getAs[Long]("units_dropped") shouldBe 1L
    q.getAs[Long]("n_units") shouldBe 3L
    // textbook disagreement: 2 raters always split across 2 cats
    val split = (1 to 10).map(u => (u.toLong, 0L)) ++
      (1 to 10).map(u => (u.toLong, 1L))
    val s = StatsOps.fleissKappa(split.toDF("u", "rating"),
      "u", "rating").collect()(0)
    // P_bar = 0 (never agree), P_e = 0.5 -> kappa = -1
    approx(s.getAs[Double]("kappa"), -1.0, 1e-9)
  }

  test("bradleyTerry: dominant player converges to the top " +
    "strength; symmetric duels tie") {
    import graft.analytics.PairwiseRank
    // a beats b 9:1, b beats c 9:1, a beats c 9:1 -> a > b > c
    val duels = Seq(
      ("a", "b", 9L), ("b", "a", 1L),
      ("b", "c", 9L), ("c", "b", 1L),
      ("a", "c", 9L), ("c", "a", 1L)).toDF("w", "l", "k")
    val r = PairwiseRank.bradleyTerry(duels, "w", "l", "k",
      rounds = 5).collect()
      .map(x => x.getString(0) -> x.getAs[Double]("strength")).toMap
    r("a") should be > r("b")
    r("b") should be > r("c")
    // perfectly symmetric duels -> equal strengths
    val sym = Seq(("x", "y", 5L), ("y", "x", 5L)).toDF("w", "l", "k")
    val s = PairwiseRank.bradleyTerry(sym, "w", "l", "k")
      .collect().map(_.getAs[Double]("share"))
    approx(s(0), 0.5, 1e-9)
    approx(s(1), 0.5, 1e-9)
  }

  test("bradleyTerry: zero-win player pinned at strength 0, " +
    "repartition-invariant") {
    import graft.analytics.PairwiseRank
    val duels = Seq(("a", "z", 3L), ("b", "z", 2L), ("a", "b", 1L),
      ("b", "a", 1L)).toDF("w", "l", "k")
    val r = PairwiseRank.bradleyTerry(duels, "w", "l", "k")
      .collect().map(x => x.getString(0) ->
        x.getAs[Double]("strength")).toMap
    r("z") shouldBe 0.0
    val p1 = PairwiseRank.bradleyTerry(duels.repartition(1),
      "w", "l", "k").orderBy("id").collect().toSeq
    val p7 = PairwiseRank.bradleyTerry(duels.repartition(7),
      "w", "l", "k").orderBy("id").collect().toSeq
    p1 shouldBe p7
  }

  test("canonicalByQuality keeps the best copy, ties to the " +
    "smallest id, skips singletons") {
    import graft.llm.Dedup
    val df = Seq(
      (1L, "same text", 10L), (2L, "same text", 25L),
      (3L, "same text", 25L), // ties with 2 on score -> 2 wins
      (4L, "unique doc", 99L))
      .toDF("doc_id", "text", "q")
    val r = Dedup.canonicalByQuality(df, "text", "doc_id", "q")
      .orderBy("doc_id").collect()
    r.length shouldBe 3 // singleton 4 excluded
    all(r.map(_.getAs[Long]("canonical_id"))) shouldBe 2L
    r.map(x => x.getAs[Long]("doc_id") ->
      x.getAs[Boolean]("is_canonical")).toMap shouldBe
      Map(1L -> false, 2L -> true, 3L -> false)
  }

  test("diversityCloseness: skewed class flagged by entropy, " +
    "uniform class sits at global distribution") {
    import graft.llm.Privacy
    // class A: 9x 's1', 1x 's2' (distinct-l = 2 but entropy-l low)
    // class B: 5x 's1', 5x 's2' (balanced)
    val rows = Seq.fill(9)(("A", "s1")) ++ Seq(("A", "s2")) ++
      Seq.fill(5)(("B", "s1")) ++ Seq.fill(5)(("B", "s2"))
    val df = rows.toDF("q", "sv")
    val r = Privacy.diversityCloseness(df, Seq("q"), "sv")
      .orderBy("q").collect()
    val a = r(0)
    a.getAs[Long]("l_distinct") shouldBe 2L
    // entropy-l of (0.9, 0.1) = exp(0.325) ~ 1.384 << 2
    a.getAs[Double]("entropy_l") should be < 1.5
    val b = r(1)
    approx(b.getAs[Double]("entropy_l"), 2.0, 1e-6)
    // global = (14/20, 6/20); TVD(B) = |.5-.7|/2 + |.5-.3|/2 = 0.2
    approx(b.getAs[Double]("t_closeness"), 0.2, 1e-9)
    a.getAs[Double]("t_closeness") should be > 0.0
  }

  test("datasetCard: exact metrics on a crafted corpus") {
    val df = Seq(
      (1L, "alpha beta", "en", "s1"),
      (2L, "alpha beta", "en", "s1"), // exact dup
      (3L, "gamma delta epsilon", "fr", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val m = PipelineOps.datasetCard(df, "text", "lang", "source")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    m("n_docs") shouldBe 3.0
    m("n_tokens") shouldBe 7.0
    m("exact_dup_ppm") shouldBe 333333.0
    // hapax: alpha/beta appear twice; gamma/delta/epsilon once
    m("hapax_share_ppm") shouldBe 600000.0
    // lang entropy of (2/3, 1/3)
    approx(m("lang_entropy_nats"),
      -(2.0 / 3) * math.log(2.0 / 3) - (1.0 / 3) * math.log(1.0 / 3),
      1e-9)
  }

  test("codeScore flags code-like text and not prose") {
    val df = Seq(
      (1L, "def f(x): return [x for x in range(10)]; import os"),
      (2L, "the quiet afternoon light settled over the garden"))
      .toDF("id", "text")
    val r = PipelineOps.codeScore(df, "id", "text")
      .orderBy("id").collect()
    r(0).getAs[Boolean]("is_code") shouldBe true
    r(1).getAs[Boolean]("is_code") shouldBe false
    r(1).getAs[Long]("n_codechar") shouldBe 0L
  }

  test("lshPlan: curve is monotone, s_half calibrated, and the " +
    "16x8 q44 config detects ~always above 0.9 similarity") {
    val p = graft.llm.Dedup.lshPlan(spark, bands = 16,
      rowsPerBand = 8).orderBy("i").collect()
    val ps = p.map(_.getAs[Double]("p_detect"))
    ps.zip(ps.tail).foreach { case (a, b) => a should be <= b }
    // s* = (1/16)^(1/8); p(s*) should be near 1 - (1-1/16)^16 ~ .644
    val sHalf = p.head.getAs[Double]("s_half")
    approx(sHalf, math.pow(1.0 / 16, 1.0 / 8), 1e-12)
    ps.last should be >= 0.999 // s = 0.95
    p.count(_.getAs[Boolean]("above_half")) should be >= 1
  }

  test("hillTailIndex: Pareto-ish data recovers the tail exponent") {
    // x_i = floor(1e6 / i^(1/2)) has tail index ~2
    val df = (1 to 5000).map { i =>
      ("k", math.floor(1e6 / math.sqrt(i.toDouble)).toLong)
    }.toDF("key", "v")
    val r = graft.stats.StatsOps.hillTailIndex(df, Seq("key"), "v",
      k = 200).collect()(0)
    r.getAs[Long]("k_used") shouldBe 200L
    val alpha = r.getAs[Double]("alpha")
    alpha should (be >= 1.5 and be <= 2.5)
    // light-tail control: uniform-ish values -> alpha far larger
    val light = (1 to 5000).map(i => ("k", 1000000L + i))
      .toDF("key", "v")
    graft.stats.StatsOps.hillTailIndex(light, Seq("key"), "v",
      k = 200).collect()(0).getAs[Double]("alpha") should be >= 100.0
  }

  test("multiclassReport + macro: hand-computed 3-class cells") {
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"), // a: tp 2, fn 1
      ("b", "b"), ("b", "c"), // b: tp 1, fn 1; pred b gets fp 1
      ("c", "c")) // c: tp 1, fp 1 (from b)
      .toDF("y", "p")
    val rep = MlMetrics.multiclassReport(df, "y", "p")
      .orderBy("cls").collect()
    val a = rep(0)
    (a.getAs[Long]("support"), a.getAs[Long]("tp"),
      a.getAs[Long]("fp"), a.getAs[Long]("fn")) shouldBe
      ((3L, 2L, 0L, 1L))
    approx(a.getAs[Double]("precision"), 1.0)
    approx(a.getAs[Double]("recall"), 2.0 / 3)
    approx(a.getAs[Double]("f1"), 4.0 / 5)
    val m = MlMetrics.multiclassMacro(
      MlMetrics.multiclassReport(df, "y", "p")).collect()(0)
    m.getAs[Long]("n_classes") shouldBe 3L
    m.getAs[Long]("accuracy_ppm") shouldBe (4L * 1000000 / 6)
    // macro precision = (1 + 1/2 + 1/2)/3
    approx(m.getAs[Double]("macro_precision"), 2.0 / 3, 1e-9)
  }

  test("multiclassMcc: perfect = 1, binary case matches the " +
    "textbook MCC, degenerate margin -> null") {
    def mcc(rows: Seq[(String, String)]): org.apache.spark.sql.Row =
      MlMetrics.multiclassMcc(MlMetrics.multiclassReport(
        rows.toDF("y", "p"), "y", "p")).collect()(0)
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c"),
      ("a", "a"))
    approx(mcc(perfect).getAs[Double]("mcc"), 1.0, 1e-9)
    // binary confusion tp=2 fp=1 fn=1 tn=2: MCC = (4-1)/sqrt(3*3*3*3)
    val bin = Seq(("p", "p"), ("p", "p"), ("p", "n"),
      ("n", "p"), ("n", "n"), ("n", "n"))
    approx(mcc(bin).getAs[Double]("mcc"), 3.0 / 9, 1e-9)
    // all predictions the same class -> p-margin degenerate -> null
    val degen = Seq(("a", "a"), ("b", "a"), ("a", "a"))
    val d = mcc(degen)
    d.isNullAt(d.fieldIndex("mcc")) shouldBe true
  }

  test("multiclassReport: class predicted but never labeled gets " +
    "null recall and support 0") {
    val df = Seq(("a", "a"), ("a", "z")).toDF("y", "p")
    val z = MlMetrics.multiclassReport(df, "y", "p")
      .filter(col("cls") === "z").collect()(0)
    z.getAs[Long]("support") shouldBe 0L
    z.getAs[Long]("fp") shouldBe 1L
    z.isNullAt(z.fieldIndex("recall")) shouldBe true
  }

  test("rocThresholds: hand-computed operating points and best " +
    "flags") {
    // pos scores: .9 .7 ; neg scores: .7 .3
    val df = Seq((true, 0.9), (true, 0.7), (false, 0.7),
      (false, 0.3)).toDF("y", "p")
    val r = MlMetrics.rocThresholds(df, "p", "y", costFp = 1.0,
      costFn = 4.0).orderBy(desc("threshold")).collect()
    r.length shouldBe 3
    // t=.9: tp1 fp0 -> J=.5; t=.7: tp2 fp1 -> J=1-.5=.5; t=.3: J=0
    approx(r(0).getAs[Double]("youden_j"), 0.5)
    approx(r(1).getAs[Double]("youden_j"), 0.5)
    // J tie between .9 and .7 -> smaller threshold wins
    r(1).getAs[Boolean]("is_j_best") shouldBe true
    r(0).getAs[Boolean]("is_j_best") shouldBe false
    // costs: t=.9 -> 0+4*1=4; t=.7 -> 1+0=1; t=.3 -> 2
    r.map(_.getAs[Double]("exp_cost")).toSeq shouldBe
      Seq(4.0, 1.0, 2.0)
    r(1).getAs[Boolean]("is_cost_best") shouldBe true
  }

  test("rbo: identical rankings score 1 - p^k; disjoint score 0") {
    import graft.llm.RetrievalEval
    val same = (1 to 10).flatMap(i => Seq(
      ("qa", i.toLong, 100.0 - i), ("qb", i.toLong, 100.0 - i)))
      .toDF("list", "id", "score")
    val r = RetrievalEval.rbo(same, "list", "id", "score",
      "qa", "qb", p = 0.9, k = 10).orderBy("d").collect()
    r.length shouldBe 10
    all(r.map(x => x.getAs[Double]("agreement"))) shouldBe 1.0
    approx(r.last.getAs[Double]("rbo"), 1.0 - math.pow(0.9, 10), 1e-9)
    val disjoint = ((1 to 10).map(i => ("qa", i.toLong, 100.0 - i)) ++
      (11 to 20).map(i => ("qb", i.toLong, 100.0 - i)))
      .toDF("list", "id", "score")
    val d = RetrievalEval.rbo(disjoint, "list", "id", "score",
      "qa", "qb").collect()
    d.length shouldBe 10
    all(d.map(_.getAs[Long]("overlap"))) shouldBe 0L
    all(d.map(_.getAs[Double]("rbo"))) shouldBe 0.0
  }

  test("rbo: hand-computed partial overlap") {
    import graft.llm.RetrievalEval
    // qa: 1,2,3 ; qb: 1,3,2 at k=3 -> overlaps 1,1,3
    val df = Seq(("qa", 1L, 3.0), ("qa", 2L, 2.0), ("qa", 3L, 1.0),
      ("qb", 1L, 3.0), ("qb", 3L, 2.0), ("qb", 2L, 1.0))
      .toDF("list", "id", "score")
    val r = RetrievalEval.rbo(df, "list", "id", "score",
      "qa", "qb", p = 0.5, k = 3).orderBy("d").collect()
    r.map(_.getAs[Long]("overlap")).toSeq shouldBe Seq(1L, 1L, 3L)
    // rbo@3 = 0.5 * (1*1/1 + 0.5*1/2 + 0.25*3/3)
    approx(r.last.getAs[Double]("rbo"),
      0.5 * (1.0 + 0.25 + 0.25), 1e-9)
  }

  test("goodTuringCoverage: exact hapax arithmetic") {
    import graft.llm.CorpusOps
    val df = Seq(("s", "a a a b b c"), ("s", "d"))
      .toDF("src", "text")
    val r = CorpusOps.goodTuringCoverage(df, "text", "src")
      .collect()(0)
    r.getAs[Long]("n_tokens") shouldBe 7L
    r.getAs[Long]("vocab") shouldBe 4L
    r.getAs[Long]("n1") shouldBe 2L // c, d
    r.getAs[Long]("n2") shouldBe 1L // b
    r.getAs[Long]("unseen_ppm") shouldBe (2L * 1000000 / 7)
  }

  test("bpeFertility: fixed merges, hand-counted pieces") {
    import graft.llm.CorpusOps
    val df = Seq(("s", "the in zz the")).toDF("src", "text")
    val r = CorpusOps.bpeFertility(df, "text", "src",
      Seq(("t", "h"), ("th", "e"), ("i", "n")))
      .collect()(0)
    // the->1 piece (x2), in->1, zz->2 : words 4, tokens 5
    r.getAs[Long]("n_words") shouldBe 4L
    r.getAs[Long]("n_tokens") shouldBe 5L
    r.getAs[Long]("n_single") shouldBe 3L
    r.getAs[Long]("fertility_ppm") shouldBe 1250000L
  }

  test("hardNegatives: nearest different-label candidates, " +
    "self and same-label excluded") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.1f), 0), // same label — never a negative
      (3L, Array(0.9f, 0.4f), 1), // closest different-label
      (4L, Array(0.0f, 1.0f), 1), // orthogonal
      (5L, Array(-1.0f, 0.0f), 2)) // opposite
      .toDF("vec_id", "embedding", "label")
    val q = df.filter(col("vec_id") === 1L)
    val r = Similarity.hardNegatives(q, df, "vec_id", "embedding",
      "label", k = 3).orderBy("rank").collect()
    r.map(_.getAs[Long]("neg_id")).toSeq shouldBe Seq(3L, 4L, 5L)
    r.map(_.getAs[Int]("rank")).toSeq shouldBe Seq(1, 2, 3)
    all(r.map(_.getAs[Int]("neg_label"))) should not be 0
  }
}
