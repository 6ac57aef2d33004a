package graft

import org.apache.spark.sql.functions._
import graft.llm.CorpusOps

/** Corpus analytics (round-3 additions): DSIR importance weights,
  * source overlap, Zipf fit, lexical diversity. */
class CorpusOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("dsirWeights scores target-like docs above source-like docs") {
    // target slice speaks "alpha beta", source slice "gamma delta";
    // doc 5 (source) echoes the target phrase, doc 6 the source one
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta", true),
      (2L, "alpha beta alpha beta", true),
      (3L, "gamma delta gamma delta gamma delta", false),
      (4L, "gamma delta gamma delta", false),
      (5L, "alpha beta alpha beta", false),
      (6L, "gamma delta gamma delta", false)
    ).toDF("id", "text", "is_t")
    val w = CorpusOps.dsirWeights(docs, "text", "id", "is_t")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    w(5L) should be > w(6L)
  }

  test("dsirWeights gives empty docs zero weight and zero grams") {
    val docs = Seq((1L, "one token", true), (2L, "solo", false))
      .toDF("id", "text", "is_t")
    val r = CorpusOps.dsirWeights(docs, "text", "id", "is_t")
      .filter(col("doc_id") === 2L).collect().head
    r.getLong(1) shouldBe 0L
    r.getDouble(2) shouldBe 0.0
  }

  test("sourceNgramOverlap computes exact pairwise Jaccard") {
    // a: {x y z, y z w}; b: {y z w, z w v} -> inter 1, union 3
    val docs = Seq(("a", "x y z w"), ("b", "y z w v"))
      .toDF("source", "text")
    val r = CorpusOps.sourceNgramOverlap(docs, "text", "source", n = 3)
      .collect().head
    r.getAs[Long]("n_common") shouldBe 1L
    approx(r.getAs[Double]("jaccard"), 1.0 / 3, 1e-6)
  }

  test("zipfFit recovers alpha=1 from an exact 1/r law") {
    // counts 12, 6, 4, 3 = 12/r for r=1..4 -> slope -1, r2 = 1
    val text = (Seq.fill(12)("w1") ++ Seq.fill(6)("w2") ++
      Seq.fill(4)("w3") ++ Seq.fill(3)("w4")).mkString(" ")
    val r = CorpusOps.zipfFit(Seq(text).toDF("text"), "text",
      topK = 4).collect().head
    r.getAs[Long]("n_terms") shouldBe 4L
    approx(r.getAs[Double]("alpha"), 1.0, 1e-6)
    approx(r.getAs[Double]("r2"), 1.0, 1e-6)
  }

  test("temperatureMix: quotas sum to total (when corpora suffice), " +
      "alpha<1 flattens toward small keys, alpha=64 is proportional") {
    // 80 docs of 'big', 20 of 'small'
    val docs = (0 until 80).map(i => (i.toLong, "big")) ++
      (100 until 120).map(i => (i.toLong, "small"))
    val df = docs.toDF("doc_id", "dom")
    val mixed = CorpusOps.temperatureMix(df, "dom", "doc_id", 50L,
      alphaNum = 32) // alpha = 0.5
    val per = mixed.groupBy("key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (per("big") + per("small")) shouldBe 50L
    // proportional would give small 10/50; sqrt flattening gives
    // small 50·√20/(√80+√20) ≈ 17
    per("small") should be > 12L
    per("small") should be < 25L
    // alpha = 1 (alphaNum=64): proportional shares
    val prop = CorpusOps.temperatureMix(df, "dom", "doc_id", 50L,
        alphaNum = 64)
      .groupBy("key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    prop("big") shouldBe 40L
    prop("small") shouldBe 10L
    // determinism: same call, same selection
    val a = mixed.select("id").as[Long].collect().sorted
    val b = CorpusOps.temperatureMix(df, "dom", "doc_id", 50L,
      alphaNum = 32).select("id").as[Long].collect().sorted
    a shouldBe b
  }

  test("temperatureMix: a key smaller than its quota contributes all " +
      "its docs and the shortfall is visible as alloc > n_key") {
    // 'tiny' has 2 docs but sqrt-weighting may hand it more slots
    val docs = (0 until 200).map(i => (i.toLong, "big")) ++
      Seq((900L, "tiny"), (901L, "tiny"))
    val out = CorpusOps.temperatureMix(docs.toDF("doc_id", "dom"),
      "dom", "doc_id", 100L, alphaNum = 16) // alpha = 0.25
    val tiny = out.filter($"key" === "tiny")
      .select("id", "alloc", "n_key").collect()
    tiny.map(_.getLong(0)).sorted shouldBe Array(900L, 901L)
    tiny.head.getLong(1) should be > 2L  // quota exceeds corpus
    tiny.head.getLong(2) shouldBe 2L
  }

  test("temperatureMixRepeats: per-key repeats sum to the quota " +
      "exactly, and repeats>=1 equals the temperatureMix selection " +
      "when the quota fits the corpus") {
    val docs = (0 until 80).map(i => (i.toLong, "big")) ++
      (100 until 120).map(i => (i.toLong, "small"))
    val df = docs.toDF("doc_id", "dom")
    // total 300 > 100 docs: multi-epoch regime
    val rep = CorpusOps.temperatureMixRepeats(df, "dom", "doc_id",
      300L, alphaNum = 32)
    rep.count() shouldBe 100L // every doc has a row
    val sums = rep.groupBy("key")
      .agg(sum("repeats").as("s"), first("alloc").as("a"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    sums.foreach { case (s, a) => s shouldBe a }
    sums.map(_._1).sum shouldBe 300L
    // sub-corpus regime: repeats>=1 == the selection
    val rep2 = CorpusOps.temperatureMixRepeats(df, "dom", "doc_id",
      50L, alphaNum = 32)
    val sel = CorpusOps.temperatureMix(df, "dom", "doc_id", 50L,
      alphaNum = 32)
    rep2.filter($"repeats" >= 1).select("id").as[Long].collect()
      .sorted.toSeq shouldBe
      sel.select("id").as[Long].collect().sorted.toSeq
  }

  test("lexicalStats computes TTR, hapax fraction and Heaps beta") {
    val r = CorpusOps.lexicalStats(
      Seq(("s", "a a b c")).toDF("src0", "text"), "text", "src0")
      .collect().head
    r.getAs[Long]("n_tokens") shouldBe 4L
    r.getAs[Long]("vocab") shouldBe 3L
    approx(r.getAs[Double]("ttr"), 0.75, 1e-6)
    approx(r.getAs[Double]("hapax_frac"), 2.0 / 3, 1e-6)
    approx(r.getAs[Double]("heaps_beta"),
      math.log(3.0) / math.log(4.0), 1e-6)
  }
}
