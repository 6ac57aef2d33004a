package graft

import org.apache.spark.sql.functions._
import graft.llm.TextEval

/** BLEU / ROUGE-N pinned against hand-computed values (Papineni et
  * al. 2002 definitions; ROUGE-N per Lin 2004). */
class TextEvalSpec extends SparkSpecBase {
  import spark.implicits._

  test("rougeN: clipped bigram overlap, hand-computed") {
    // cand: "the cat sat on the mat" bigrams:
    //   {the cat, cat sat, sat on, on the, the mat}
    // ref: "the cat lay on the mat" bigrams:
    //   {the cat, cat lay, lay on, on the, the mat}
    // overlap = {the cat, on the, the mat} -> m=3, c=5, r=5
    val df = Seq((1L, "the cat sat on the mat",
      "the cat lay on the mat")).toDF("id", "c", "r")
    val out = TextEval.rougeN(df, "id", "c", "r", n = 2).head()
    out.getAs[Long]("matches") shouldBe 3L
    out.getAs[Long]("cand_ngrams") shouldBe 5L
    out.getAs[Long]("ref_ngrams") shouldBe 5L
    out.getAs[Double]("precision") shouldBe 0.6 +- 1e-9
    out.getAs[Double]("recall") shouldBe 0.6 +- 1e-9
    out.getAs[Double]("f1") shouldBe 0.6 +- 1e-9
  }

  test("rougeN: clipping caps repeated candidate grams") {
    // cand repeats "a a" 4 times; ref has it twice -> clipped to 2
    val df = Seq((1L, "a a a a a", "a a b a a")).toDF("id", "c", "r")
    val out = TextEval.rougeN(df, "id", "c", "r", n = 2).head()
    // cand bigrams: [a a]x4; ref bigrams: {a a, a b, b a, a a}
    out.getAs[Long]("matches") shouldBe 2L
    out.getAs[Long]("cand_ngrams") shouldBe 4L
  }

  test("bleu: perfect match scores 1, disjoint scores 0, " +
      "short candidate is penalized") {
    val df = Seq(
      (1L, "a b c d e f", "a b c d e f"),
      (2L, "x y z w q v", "a b c d e f"),
      (3L, "a b c d", "a b c d e f g h")).toDF("id", "c", "r")
    val out = TextEval.bleu(df, "id", "c", "r").orderBy("id").collect()
    out(0).getAs[Double]("bleu") shouldBe 1.0 +- 1e-9
    out(0).getAs[Double]("bp") shouldBe 1.0 +- 1e-9
    out(1).getAs[Double]("bleu") shouldBe 0.0 +- 1e-12
    // id 3: p_n all 1 (every cand n-gram appears in ref) but
    // bp = exp(1 - 8/4) = e^-1
    out(2).getAs[Double]("bp") shouldBe math.exp(-1.0) +- 1e-6
    out(2).getAs[Double]("bleu") shouldBe math.exp(-1.0) +- 1e-6
  }

  test("bleu: candidate shorter than maxN yields null (undefined p4)") {
    val df = Seq((1L, "a b c", "a b c d")).toDF("id", "c", "r")
    val out = TextEval.bleu(df, "id", "c", "r").head()
    out.isNullAt(out.fieldIndex("bleu")) shouldBe true
    out.getAs[Double]("p1") shouldBe 1.0 +- 1e-9
  }

  test("bleu: hand-computed mixed case") {
    // cand "the cat sat on the mat" vs ref "the cat lay on the mat"
    // p1 = 5/6 (all but 'sat'), p2 = 3/5, p3: cand trigrams
    // {the cat sat, cat sat on, sat on the, on the mat} -> only
    // 'on the mat' in ref -> 1/4; p4: {the cat sat on, cat sat on
    // the, sat on the mat} -> 0/3 -> bleu = 0 (smoothing 0)
    val df = Seq((1L, "the cat sat on the mat",
      "the cat lay on the mat")).toDF("id", "c", "r")
    val out = TextEval.bleu(df, "id", "c", "r").head()
    out.getAs[Double]("p1") shouldBe (5.0 / 6.0) +- 1e-6
    out.getAs[Double]("p2") shouldBe 0.6 +- 1e-6
    out.getAs[Double]("p3") shouldBe 0.25 +- 1e-6
    out.getAs[Double]("p4") shouldBe 0.0 +- 1e-12
    out.getAs[Double]("bleu") shouldBe 0.0 +- 1e-12
  }

  test("bleu smoothing 1 (Chen–Cherry / NLTK method1): zero counts " +
      "become eps/c_tot, hand-computed") {
    // cand "the the the the" (4 tokens) vs ref "the cat":
    // p1: clipped count of 'the' = 1 (ref has it once) / 4 = 0.25
    // p2: 3 x 'the the', none in ref -> m=0 -> 0.1/3
    // p3: 2 trigrams, m=0 -> 0.1/2;  p4: 1 fourgram, m=0 -> 0.1/1
    // bp = 1 (clen 4 >= rlen 2)
    // bleu = exp((ln .25 + ln(.1/3) + ln .05 + ln .1) / 4)
    val df = Seq((1L, "the the the the", "the cat")).toDF("id", "c", "r")
    val out = TextEval.bleu(df, "id", "c", "r", smoothing = 1).head()
    out.getAs[Double]("p1") shouldBe 0.25 +- 1e-6
    out.getAs[Double]("p2") shouldBe (0.1 / 3) +- 1e-6
    out.getAs[Double]("p3") shouldBe 0.05 +- 1e-6
    out.getAs[Double]("p4") shouldBe 0.1 +- 1e-6
    val expected = math.exp((math.log(0.25) + math.log(0.1 / 3) +
      math.log(0.05) + math.log(0.1)) / 4)
    out.getAs[Double]("bleu") shouldBe expected +- 1e-6
    // smoothing 0 on the same pair collapses to 0
    TextEval.bleu(df, "id", "c", "r").head()
      .getAs[Double]("bleu") shouldBe 0.0 +- 1e-12
  }

  test("bleu smoothing 1 equals smoothing 0 when no precision is zero") {
    val df = Seq(
      (1L, "a b c d e f", "a b c d e f"),
      (2L, "the cat sat on the mat x", "sat on the mat the cat y"))
      .toDF("id", "c", "r")
    val s0 = TextEval.bleu(df, "id", "c", "r").orderBy("id").collect()
    val s1 = TextEval.bleu(df, "id", "c", "r", smoothing = 1)
      .orderBy("id").collect()
    s0.zip(s1).foreach { case (a, b) =>
      // bit-equal: no precision was zero, so no rewrite happened
      a.getAs[Double]("bleu") shouldBe b.getAs[Double]("bleu")
    }
    // an unknown smoothing method fails loudly
    intercept[IllegalArgumentException] {
      TextEval.bleu(df, "id", "c", "r", smoothing = 5)
    }
  }

  test("bleu smoothing 4 (Chen–Cherry / NLTK method4, K=5): the " +
      "k-th zero precision becomes ln(clen)/(2^k * 5 * c_n), " +
      "hand-computed against NLTK") {
    // cand "a b c d e" (5 tokens) vs ref "a b x y z" (5 tokens):
    // p1 = 2/5, p2 = 1/4 ('a b'), p3: m=0, 1st zero ->
    //   ln(5)/(2^1 * 5 * 3); p4: m=0, 2nd zero -> ln(5)/(2^2 * 5 * 2)
    // bp = 1 (clen = rlen); bleu = exp(mean ln p_n)
    val df = Seq((1L, "a b c d e", "a b x y z")).toDF("id", "c", "r")
    val out = TextEval.bleu(df, "id", "c", "r", smoothing = 4).head()
    val p3 = math.log(5.0) / (2.0 * 5.0 * 3.0)
    val p4 = math.log(5.0) / (4.0 * 5.0 * 2.0)
    out.getAs[Double]("p1") shouldBe 0.4 +- 1e-6
    out.getAs[Double]("p2") shouldBe 0.25 +- 1e-6
    out.getAs[Double]("p3") shouldBe p3 +- 1e-6
    out.getAs[Double]("p4") shouldBe p4 +- 1e-6
    val expected = math.exp((math.log(0.4) + math.log(0.25) +
      math.log(p3) + math.log(p4)) / 4)
    out.getAs[Double]("bleu") shouldBe expected +- 1e-6
    // NLTK's hyp_len > 1 guard: a 1-token candidate keeps raw zeros
    // (p2..p4 undefined -> bleu null; p1 zero stays zero if unmatched)
    val one = Seq((1L, "q", "a b c d")).toDF("id", "c", "r")
    val o1 = TextEval.bleu(one, "id", "c", "r", smoothing = 4).head()
    o1.getAs[Double]("p1") shouldBe 0.0 +- 1e-12
    assert(o1.isNullAt(o1.fieldIndex("bleu")))
  }

  test("bleu smoothing 4 equals smoothing 3 scaled: shorter " +
      "candidates get smaller floors than longer ones at the same " +
      "zero position") {
    // p1 > 0 on both (shared token 'a', no shared bigram), so p2 is
    // the FIRST zero in both candidates
    val short = Seq((1L, "a b c", "a y z")).toDF("id", "c", "r")
    val long = Seq((1L, "a b c d e f g h i j k l m n o p",
      "a y z w v u t s r q p2 o2 n2 m2 l2 k2")).toDF("id", "c", "r")
    def p2of(df: org.apache.spark.sql.DataFrame) =
      TextEval.bleu(df, "id", "c", "r", smoothing = 4).head()
        .getAs[Double]("p2")
    // method 3 would give equal LENGTH-NORMALIZED floors
    // (p2 * c_tot = 1/2 for both); method 4 scales by ln(clen):
    // p2 * c_tot = ln(clen)/(2 * 5)
    val shortFloor = p2of(short) * 2.0   // c_tot = 2 bigrams
    val longFloor = p2of(long) * 15.0    // c_tot = 15 bigrams
    shortFloor shouldBe math.log(3.0) / 10.0 +- 1e-5
    longFloor shouldBe math.log(16.0) / 10.0 +- 1e-5
    shortFloor should be < longFloor
  }

  test("corpusBleu sums clipped counts across pairs before the " +
      "ratio (hand-computed) and differs from mean sentence BLEU") {
    // pair 1 perfect: m_n = c_n = (4,3,2,1)
    // pair 2 "x y z w" vs "x y q w": m = (3,1,0,0), c = (4,3,2,1)
    // corpus: p1=7/8, p2=4/6, p3=2/4, p4=1/2, bp=1 (clen=rlen=8)
    val df = Seq((1L, "a b c d", "a b c d"),
      (2L, "x y z w", "x y q w")).toDF("id", "c", "r")
    val out = TextEval.corpusBleu(df, "id", "c", "r").head()
    out.getAs[Double]("p1") shouldBe 0.875 +- 1e-6
    out.getAs[Double]("p2") shouldBe (4.0 / 6.0) +- 1e-6
    out.getAs[Double]("p3") shouldBe 0.5 +- 1e-6
    out.getAs[Double]("p4") shouldBe 0.5 +- 1e-6
    out.getAs[Double]("bp") shouldBe 1.0 +- 1e-9
    val expected = math.exp((math.log(0.875) + math.log(4.0 / 6.0) +
      math.log(0.5) + math.log(0.5)) / 4)
    out.getAs[Double]("bleu") shouldBe expected +- 1e-6
    // sentence BLEU of pair 2 alone is 0 (p3 = p4 = 0); the corpus
    // pooling is what keeps the score positive — the reason
    // sacrebleu reports corpus BLEU
    val sent = TextEval.bleu(df, "id", "c", "r").orderBy("id")
      .collect()
    sent(1).getAs[Double]("bleu") shouldBe 0.0 +- 1e-12
  }

  test("multiRefBleu pools clipped counts via max-over-references " +
      "and picks the closest reference length for bp") {
    // cand "the cat" vs refs {"the dog", "a cat"}: each unigram is
    // in SOME ref -> p1 = 1 (single-ref would give 1/2); p2 = 0
    val df = Seq((1L, "the cat", "the dog"), (1L, "the cat", "a cat"))
      .toDF("id", "c", "r")
    val out = TextEval.multiRefBleu(df, "id", "c", "r", maxN = 2)
      .head()
    out.getAs[Double]("p1") shouldBe 1.0 +- 1e-9
    out.getAs[Double]("p2") shouldBe 0.0 +- 1e-12
    out.getAs[Double]("bp") shouldBe 1.0 +- 1e-9
    out.getAs[Double]("bleu") shouldBe 0.0 +- 1e-12
    // bp reference length: closest wins (refs of len 5 and 6 vs
    // cand len 4 -> rlen 5 -> bp = exp(1 - 5/4))
    val df2 = Seq((1L, "a b c d", "a b c d e"),
      (1L, "a b c d", "a b c d e f")).toDF("id", "c", "r")
    TextEval.multiRefBleu(df2, "id", "c", "r", maxN = 2).head()
      .getAs[Double]("bp") shouldBe math.exp(1.0 - 5.0 / 4.0) +- 1e-6
    // tie (refs len 3 and 5, cand 4) -> shorter wins -> bp = 1
    val df3 = Seq((1L, "a b c d", "a b c"),
      (1L, "a b c d", "a b c d e")).toDF("id", "c", "r")
    TextEval.multiRefBleu(df3, "id", "c", "r", maxN = 2).head()
      .getAs[Double]("bp") shouldBe 1.0 +- 1e-9
  }

  test("selfBleu: identical corpus scores 1, diverse corpus scores " +
      "low, last doc (no neighbor) excluded") {
    val same = (0L until 6L).map(i => (i, "the quick brown fox " +
      "jumps over the lazy dog")).toDF("doc_id", "text")
    val s1 = TextEval.selfBleu(same, "doc_id", "text", k = 2)
    s1.count() shouldBe 5 // doc 5 has no neighbor
    s1.select("bleu").as[Double].collect()
      .foreach(_ shouldBe 1.0 +- 1e-9)
    val diverse = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "one two three four five six"),
      (2L, "red green blue cyan magenta yellow"),
      (3L, "north south east west up down"))
      .toDF("doc_id", "text")
    val s2 = TextEval.selfBleu(diverse, "doc_id", "text", k = 2)
      .select("bleu").as[Double].collect()
    s2.foreach(_ shouldBe 0.0 +- 1e-12) // fully diverse
  }

  test("chrF: hand-computed char n-gram F-score, beta weighting, " +
      "whitespace stripping") {
    // "abc" vs "abd", maxN=2: n=1 m=2 -> P1=R1=2/3; n=2 cand
    // {ab,bc} ref {ab,bd} m=1 -> P2=R2=1/2. chrP=chrR=7/12 and with
    // P=R the F collapses to P for ANY beta.
    val df = Seq((1L, "a b c", "ab d")).toDF("id", "c", "r")
    // whitespace stripped -> "abc" vs "abd"
    val out = TextEval.chrF(df, "id", "c", "r", maxN = 2).head()
    out.getAs[Double]("chrp") shouldBe (7.0 / 12.0) +- 1e-6
    out.getAs[Double]("chrr") shouldBe (7.0 / 12.0) +- 1e-6
    out.getAs[Double]("chrf") shouldBe (7.0 / 12.0) +- 1e-6
    // beta=2 weights recall: cand "ab" vs ref "abcd" at maxN=1:
    // P=1, R=1/2 -> chrF2 = 5*0.5/(4+0.5) = 5/9; beta=1 -> 2/3
    val df2 = Seq((1L, "ab", "abcd")).toDF("id", "c", "r")
    TextEval.chrF(df2, "id", "c", "r", maxN = 1).head()
      .getAs[Double]("chrf") shouldBe (5.0 / 9.0) +- 1e-6
    TextEval.chrF(df2, "id", "c", "r", maxN = 1, beta = 1.0).head()
      .getAs[Double]("chrf") shouldBe (2.0 / 3.0) +- 1e-6
    // orders where a side has no n-gram are EXCLUDED from the mean,
    // not counted as zero: len-2 cand at maxN=6 only uses n=1..2
    val df3 = Seq((1L, "ab", "ab")).toDF("id", "c", "r")
    TextEval.chrF(df3, "id", "c", "r", maxN = 6).head()
      .getAs[Double]("chrf") shouldBe 1.0 +- 1e-9
  }

  test("WordLcs expression matches the quadratic reference on " +
    "deterministic pseudo-random token sequences") {
    import graft.sqlext.WordLcs
    val vocab = Vector("a", "b", "c", "d", "e")
    def seqOf(seed: Int, len: Int): Seq[String] =
      (0 until len).map(i =>
        vocab(math.abs((seed * 2654435761L + i * 40503L).toInt) %
          vocab.length))
    val cases = for (s <- 1 to 30) yield
      (s.toLong, seqOf(s, 5 + s % 20), seqOf(s + 99, 3 + (s * 7) % 22))
    val df = cases.toDF("id", "a", "b")
    val got = df.select(col("id"),
        WordLcs.word_lcs(col("a"), col("b")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    cases.foreach { case (id, a, b) =>
      got(id) shouldBe WordLcs.lcsOf(a, b)
    }
  }

  test("ciderD: identical pair scores high, disjoint scores 0, " +
    "length penalty bites") {
    // idf over a 3-ref corpus so weights are non-degenerate
    val df = Seq(
      (1L, "the red fox jumps", "the red fox jumps"),
      (2L, "aa bb cc dd", "xx yy zz ww"),
      (3L, "the red fox jumps over everything else here now",
        "the red fox jumps"))
      .toDF("id", "c", "r")
    val r = TextEval.ciderD(df, "id", "c", "r")
      .collect().map(x => x.getLong(0) ->
        x.getAs[Double]("cider_d")).toMap
    // identical candidate/reference: cosine 1 and penalty 1 per n
    // (where grams exist) -> score near 10 (all 4 n-levels present)
    r(1L) should be >= 9.9
    r(2L) shouldBe 0.0 +- 1e-12
    // same content + extra length -> penalized below the identical
    r(3L) should (be > 0.0 and be < r(1L))
  }

  test("rougeL: hand-computed P/R/F and empty-side behavior") {
    // cand: "the cat sat on mat", ref: "the dog sat on the mat"
    // LCS = the sat on mat = 4
    val df = Seq((1L, "the cat sat on mat",
      "the dog sat on the mat")).toDF("id", "c", "r")
    val x = TextEval.rougeL(df, "id", "c", "r").head()
    x.getAs[Long]("lcs") shouldBe 4L
    x.getAs[Double]("rouge_l_p") shouldBe (4.0 / 5) +- 1e-9
    x.getAs[Double]("rouge_l_r") shouldBe (4.0 / 6) +- 1e-9
    x.getAs[Double]("rouge_l_f") shouldBe (8.0 / 11) +- 1e-9
    // identical texts -> F = 1; disjoint -> 0
    TextEval.rougeL(Seq((1L, "x y z", "x y z")).toDF("id", "c", "r"),
      "id", "c", "r").head().getAs[Double]("rouge_l_f") shouldBe
      1.0 +- 1e-9
    TextEval.rougeL(Seq((1L, "a b", "z w")).toDF("id", "c", "r"),
      "id", "c", "r").head().getAs[Long]("lcs") shouldBe 0L
  }
}
