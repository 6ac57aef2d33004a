package graft

import org.apache.spark.sql.functions._
import graft.llm.PipelineOps
import graft.functions.TextFunctions

class PipelineOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("hashSample is deterministic, salt-independent, and near-rate") {
    val df = spark.range(10000).toDF("id")
    val s1 = PipelineOps.hashSample(df, "id", 0.2, "a")
      .select("id").as[Long].collect().toSet
    val s1b = PipelineOps.hashSample(df, "id", 0.2, "a")
      .select("id").as[Long].collect().toSet
    s1 shouldBe s1b
    // rate within 3 sigma of binomial(10000, 0.2)
    s1.size.toDouble shouldBe 2000.0 +- 3 * math.sqrt(10000 * 0.2 * 0.8)
    // a different salt draws a (near) independent sample
    val s2 = PipelineOps.hashSample(df, "id", 0.2, "b")
      .select("id").as[Long].collect().toSet
    s2 should not be s1
    // nested property: rate 0.1 with same salt is a subset of rate 0.2
    val s3 = PipelineOps.hashSample(df, "id", 0.1, "a")
      .select("id").as[Long].collect().toSet
    s3.subsetOf(s1) shouldBe true
  }

  test("kmvDistinct: exact below k, within error bounds above k") {
    val small = spark.range(100).toDF("v")
    val r1 = PipelineOps.kmvDistinct(small, "v", k = 256).head()
    r1.getAs[Long]("k_seen") shouldBe 100L
    r1.getAs[Double]("distinct_estimate") shouldBe 100.0 +- 1e-9
    // 20k distinct values, k=256 -> se ~ 1/sqrt(254) ~ 6.3%; allow 5 se
    val big = spark.range(20000).toDF("v")
    val r2 = PipelineOps.kmvDistinct(big, "v", k = 256).head()
    r2.getAs[Long]("k_seen") shouldBe 256L
    val est = r2.getAs[Double]("distinct_estimate")
    math.abs(est - 20000.0) / 20000.0 should be < 0.32
    // duplicates don't change the estimate (it's a set function)
    val dup = big.union(big).union(big)
    PipelineOps.kmvDistinct(dup, "v", k = 256).head()
      .getAs[Double]("distinct_estimate") shouldBe est +- 1e-9
  }

  test("tfidfTopTerms ranks rare terms above ubiquitous ones") {
    // unique terms at tf=2 outrank "common" (smoothed idf = 1) at tf=1
    val docs = Seq(
      (1L, "apple apple banana common"),
      (2L, "cherry cherry common"),
      (3L, "durian durian common")).toDF("doc_id", "text")
    val out = PipelineOps.tfidfTopTerms(docs, "text", "doc_id", topN = 1)
    // every doc's top term is its repeated unique word, never "common"
    out.count() shouldBe 3
    out.filter($"term" === "common").count() shouldBe 0
    out.filter($"doc_id" === 1L).select("term").as[String]
      .head() shouldBe "apple"
    // df of the unique words is 1, of common is 3
    out.filter($"doc_id" === 2L).head().getAs[Long]("df") shouldBe 1L
  }

  test("boilerplateFraction flags shared n-grams only") {
    val boiler = "all rights reserved"
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler"),
      (2L, s"delta epsilon zeta $boiler"),
      (3L, s"eta theta iota $boiler"),
      (4L, "unique words only here"),
      (5L, "ab")).toDF("doc_id", "text") // too short for 3-grams
    val out = PipelineOps.boilerplateFraction(docs, "text", "doc_id",
      n = 3, minDocs = 3L)
    val byId = out.collect().map(r =>
      r.getAs[Long]("doc_id") -> r).toMap
    // docs 1-3 share exactly the one 3-gram "all rights reserved"
    (1L to 3L).foreach { id =>
      byId(id).getAs[Long]("n_boiler") shouldBe 1L
      byId(id).getAs[Double]("boiler_frac") should be > 0.0
    }
    byId(4L).getAs[Long]("n_boiler") shouldBe 0L
    byId(4L).getAs[Double]("boiler_frac") shouldBe 0.0
    byId(5L).getAs[Long]("n_shingles") shouldBe 0L
    byId(5L).getAs[Double]("boiler_frac") shouldBe 0.0
  }

  test("bloomPrefilterJoin equals the plain join") {
    val fact = spark.range(5000)
      .select(($"id" % 500).as("k"), $"id".as("v"))
    val dim = spark.range(100).select(($"id" * 3).as("dk"))
    val bloomed = PipelineOps.bloomPrefilterJoin(fact, dim, "k", "dk",
        expectedItems = 1000L)
      .select("k", "v", "dk")
    val plain = fact.join(dim, $"k" === $"dk").select("k", "v", "dk")
    bloomed.count() shouldBe plain.count()
    bloomed.exceptAll(plain).count() shouldBe 0
    plain.exceptAll(bloomed).count() shouldBe 0
  }

  test("heavyHitters is exact; freqItems sketch is a superset of it") {
    // 1000 rows: value 0 appears 500x, 1 appears 300x, others 1x each
    val vals = Seq.fill(500)(0L) ++ Seq.fill(300)(1L) ++
      (2L until 202L)
    val df = vals.toDF("v")
    // support > 1000/5 = 200 -> exactly {0, 1}
    val hh = PipelineOps.heavyHitters(df, "v", 5)
      .select("v").as[Long].collect().toSet
    hh shouldBe Set(0L, 1L)
    val sketch = PipelineOps.frequentItemsSketch(df, "v", 0.2)
      .map(_.asInstanceOf[Long]).toSet
    hh.subsetOf(sketch) shouldBe true
  }

  test("pipeline op plans: no shuffle in sampling, partial agg in heavy hitters, bloom filter below the join") {
    val df = spark.range(10000).toDF("id")
    // hashSample is a pure map-side filter: zero exchanges
    val sampled = PipelineOps.hashSample(df, "id", 0.5)
    (sampled.queryExecution.executedPlan.toString should not)
      .include("Exchange")
    // ...and so is its stratified variant (rates fold into literals)
    val strat = PipelineOps.stratifiedHashSample(
      df.select($"id", concat(lit("s"), pmod($"id", lit(3))).as("src")),
      "id", "src", Map("s0" -> 0.5), defaultRate = 0.1)
    (strat.queryExecution.executedPlan.toString should not)
      .include("Exchange")
    // one-class SVM scoring is a pure column expression: after the
    // driver-side fit, scoring the full table plans with no exchange
    // and no ScalaUDF
    val pts = df.select($"id", ($"id" % 17).cast("double").as("x"),
      ($"id" % 23).cast("double").as("y"))
    val scoredPlan = graft.ml.Anomaly.oneClassSvm(pts, Seq("x", "y"))
      .queryExecution.executedPlan.toString
    (scoredPlan should not).include("Exchange")
    (scoredPlan should not).include("ScalaUDF")
    // heavyHitters: partial + final HashAggregate around one exchange
    val hh = PipelineOps.heavyHitters(
      df.select(($"id" % 10).as("v")), "v", 5)
    val hhPlan = hh.queryExecution.executedPlan.toString
    hhPlan should include("partial_count")
    // bloom prefilter: the mightContain filter sits on the fact side
    // BELOW the join, so filtered rows never reach the join exchange
    val fact = spark.range(5000).select(($"id" % 100).as("k"))
    val dim = spark.range(50).select(($"id" * 2).as("dk"))
    val joined = PipelineOps.bloomPrefilterJoin(fact, dim, "k", "dk",
      expectedItems = 100L)
    val opt = joined.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    // find the Filter with a ScalaUDF condition; it must be a
    // descendant of the Join's left (fact) side, not above the join
    val join = opt.collectFirst { case j: Join => j }.get
    val udfFilterUnderFact = join.left.collect {
      case f: Filter if f.condition.toString.contains("UDF") => f
    }
    udfFilterUnderFact should not be empty
  }

  test("intervalJoin equals the theta join, emits no duplicates") {
    import graft.ops.SkewOps
    // adversarial widths: intervals much longer and much shorter than
    // the bucket, negative coordinates, touching endpoints
    val a = (0L until 80L).map { i =>
      val s = (i * 13 % 101) - 50; (i, s, s + (i % 3) * 40 + 1)
    }.toDF("a_id", "sa", "ea")
    val b = (0L until 90L).map { i =>
      val s = (i * 29 % 97) - 40; (i, s, s + (i % 5) * 11)
    }.toDF("b_id", "sb", "eb")
    for (w <- Seq(7L, 32L, 1000L)) {
      val got = SkewOps.intervalJoin(a, b, "sa", "ea", "sb", "eb", w)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      val want = a.join(b, $"sa" <= $"eb" && $"sb" <= $"ea")
        .select("a_id", "b_id").as[(Long, Long)].collect()
      got.length shouldBe got.toSet.size // no duplicate pairs
      got.toSet shouldBe want.toSet
    }
    // touching endpoints overlap (closed intervals)
    val ta = Seq((1L, 0L, 10L)).toDF("a_id", "sa", "ea")
    val tb = Seq((2L, 10L, 20L)).toDF("b_id", "sb", "eb")
    SkewOps.intervalJoin(ta, tb, "sa", "ea", "sb", "eb", 8L)
      .count() shouldBe 1
  }

  test("percentRankScalable equals the SQL percent_rank window") {
    import graft.ops.PandasOps._
    val df = (0L until 400L)
      .map(i => (i, if (i % 37 == 0) null else (i * 7 % 23).toString))
      .toDF("id", "vs")
      .withColumn("v", $"vs".cast("long")).drop("vs")
    val got = df.percentRankScalable("v")
      .select($"id", $"pct_rank").as[(Long, Option[Double])]
      .collect().toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy($"v")
    val want = df.filter($"v".isNotNull)
      .withColumn("pr", percent_rank().over(w))
      .select($"id", $"pr").as[(Long, Double)].collect().toMap
    df.count() shouldBe got.size
    want.foreach { case (id, pr) =>
      got(id).get shouldBe pr +- 1e-12
    }
    got.filter(_._2.isEmpty).keys.toSet shouldBe
      (0L until 400L).filter(_ % 37 == 0).toSet
  }

  test("saltedJoin equals the plain join for inner and left joins") {
    import graft.ops.SkewOps
    // a pathologically hot key: 90% of fact rows share k=7
    val fact = spark.range(2000).select(
      when($"id" % 10 === 0, $"id" % 5).otherwise(7L).as("k"),
      $"id".as("rid"))
    val dim = spark.range(10).select($"id".as("dk"),
      concat(lit("n"), $"id").as("name"))
    val salted = SkewOps.saltedJoin(fact, dim, "k", "dk", "rid", 8)
      .select("rid", "dk", "name")
    val plain = fact.join(dim, $"k" === $"dk").select("rid", "dk", "name")
    salted.exceptAll(plain).count() shouldBe 0
    plain.exceptAll(salted).count() shouldBe 0
    // left join keeps unmatched fact rows exactly once
    val factMiss = fact.withColumn("k",
      when($"rid" === 0, 99L).otherwise($"k"))
    val saltedL = SkewOps.saltedJoin(factMiss, dim, "k", "dk", "rid", 8,
      "left").select("rid", "dk")
    val plainL = factMiss.join(dim, $"k" === $"dk", "left")
      .select("rid", "dk")
    saltedL.exceptAll(plainL).count() shouldBe 0
    plainL.exceptAll(saltedL).count() shouldBe 0
  }

  test("decontaminate flags verbatim n-gram overlap only") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // contains bench 5-gram
      (2L, "one two three four five six seven"),   // clean
      (3L, "alpha beta gamma delta epsilon"),      // exactly the bench doc
      (4L, "beta gamma delta")                     // too short for 5-grams
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val out = PipelineOps.decontaminate(corpus, bench, "text", "doc_id",
        n = 5, minOverlap = 1L)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    out.map(r => r._1 -> r._3).toMap shouldBe
      Map(1L -> true, 2L -> false, 3L -> true, 4L -> false)
    // doc 1 shares exactly one 5-gram, doc 3 shares its single 5-gram
    out.find(_._1 == 1L).get._2 shouldBe 1L
    out.find(_._1 == 3L).get._2 shouldBe 1L
  }

  test("repetitionFlags computes duplicate-line and top-word fractions") {
    val df = Seq(
      (1L, "aa bb\ncc dd\naa bb\n\n  "), // 3 non-blank lines, 1 dup
      (2L, "x x x x y"),                 // top word 4/5
      (3L, "")                           // degenerate: everything 0
    ).toDF("doc_id", "text")
    val out = PipelineOps.repetitionFlags(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Long]("n_lines") shouldBe 3L
    out(1L).getAs[Double]("dup_line_frac") shouldBe 1.0 / 3 +- 1e-6
    // dup chars: one extra "aa bb" (5 chars) of 15 total line chars
    out(1L).getAs[Double]("dup_line_char_frac") shouldBe 5.0 / 15 +- 1e-6
    out(1L).getAs[Boolean]("keep") shouldBe false // char frac > 0.2
    out(2L).getAs[Double]("top_word_frac") shouldBe 0.8 +- 1e-6
    out(2L).getAs[Boolean]("keep") shouldBe false
    out(3L).getAs[Long]("n_lines") shouldBe 0L
    out(3L).getAs[Long]("n_words") shouldBe 0L
    out(3L).getAs[Boolean]("keep") shouldBe true
  }

  test("stratifiedSample draws exactly n per stratum, deterministically") {
    val df = spark.range(1000)
      .select(col("id"), (col("id") % 3).cast("string").as("g"))
    val out = PipelineOps.stratifiedSample(df, "g", "id", 10, "s")
    val sizes = out.groupBy("g").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes shouldBe Map("0" -> 10L, "1" -> 10L, "2" -> 10L)
    // deterministic: same call selects the identical ids
    val a = out.select("id").as[Long].collect().toSet
    val b = PipelineOps.stratifiedSample(df, "g", "id", 10, "s")
      .select("id").as[Long].collect().toSet
    a shouldBe b
    // a stratum smaller than n is kept whole
    val tiny = spark.range(4)
      .select(col("id"), lit("x").as("g"))
    PipelineOps.stratifiedSample(tiny, "g", "id", 10, "s")
      .count() shouldBe 4L
  }

  test("stratifiedHashSample applies per-stratum rates deterministically") {
    val df = spark.range(30000)
      .select($"id", concat(lit("s"), pmod($"id", lit(3))).as("src"))
    val out = PipelineOps.stratifiedHashSample(df, "id", "src",
      Map("s0" -> 1.0, "s1" -> 0.2), defaultRate = 0.0, salt = "t")
    val bySrc = out.groupBy("src").count()
      .as[(String, Long)].collect().toMap
    bySrc("s0") shouldBe 10000L // rate 1.0 keeps everything
    bySrc.getOrElse("s2", 0L) shouldBe 0L // defaultRate 0 drops all
    bySrc("s1").toDouble shouldBe 2000.0 +-
      3 * math.sqrt(10000 * 0.2 * 0.8)
    // same stratum + salt ⇒ consistent with plain hashSample
    val plain = PipelineOps.hashSample(
      df.filter($"src" === "s1"), "id", 0.2, "t")
      .select("id").as[Long].collect().toSet
    out.filter($"src" === "s1").select("id").as[Long].collect()
      .toSet shouldBe plain
  }

  test("paragraphDedup keeps first occurrence and reassembles in order") {
    val docs = Seq(
      (1L, "a b\nc d\na b"), // "a b" repeats within the doc
      (2L, "c d\ne f"),      // "c d" already seen in doc 1
      (3L, "c d"),           // every line seen -> null text_clean
      (4L, "  \nx y")        // blank line is not a paragraph
    ).toDF("doc_id", "text")
    val out = PipelineOps.paragraphDedup(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.getString(3)))).toMap
    out(1L) shouldBe ((3L, 2L, Some("a b\nc d")))
    out(2L) shouldBe ((2L, 1L, Some("e f")))
    out(3L) shouldBe ((1L, 0L, None))
    out(4L) shouldBe ((1L, 1L, Some("x y")))
  }

  test("bigramLmScore is the corpus-fit conditional MLE") {
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "z")
    ).toDF("doc_id", "text")
    // c(a b)=2, c(a c)=1, c(a .)=3
    val out = PipelineOps.bigramLmScore(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.toString.toDouble))).toMap
    out(1L)._1 shouldBe 1L
    out(1L)._2.get shouldBe math.log(2.0 / 3.0) +- 1e-5
    out(3L)._2.get shouldBe math.log(1.0 / 3.0) +- 1e-5
    out(4L) shouldBe ((0L, None)) // single token: no bigram
  }

  test("packSequences: contiguous offsets, correct pack ids, stable") {
    val docs = (0L until 200L)
      .map(i => (i, ("w " * (1 + (i % 7).toInt)).trim))
      .toDF("doc_id", "text")
    val out = PipelineOps.packSequences(docs, "text", "doc_id",
      capacity = 10, buckets = 4, salt = "t")
    out.count() shouldBe 200
    val rows = out.collect().map(r => (r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(0)))
    // within a bucket, sorted by start_tok: offsets are contiguous
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._3)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        b._3 shouldBe a._3 + a._4 // next start = prev start + n_tokens
      }
      sorted.foreach { r =>
        r._2 shouldBe math.floor(r._3.toDouble / 10).toLong
      }
    }
    // deterministic across runs
    val again = PipelineOps.packSequences(docs, "text", "doc_id",
      capacity = 10, buckets = 4, salt = "t")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    rows.map(r => r._5 -> r._2).toMap shouldBe again
  }

  test("paragraphDedup is idempotent and preserves the distinct-line set") {
    val docs = (0L until 120L).map { i =>
      // deliberately collide lines across docs
      (i, s"line ${i % 10}\nline ${i % 25}\nuniq $i tail")
    }.toDF("doc_id", "text")
    val once = PipelineOps.paragraphDedup(docs, "text", "doc_id")
    val survivors = once.filter($"text_clean".isNotNull)
      .select($"doc_id", $"text_clean".as("text"))
    // the surviving corpus has zero cross-document duplicate lines,
    // so deduping it again removes nothing
    val twice = PipelineOps.paragraphDedup(survivors, "text", "doc_id")
    twice.filter($"n_kept" =!= $"n_lines").count() shouldBe 0
    // the distinct-line set is exactly preserved
    def lineSet(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(explode(split(col(c), "\n")).as("l"))
        .filter($"l" =!= "").distinct()
        .as[String].collect().toSet
    lineSet(docs, "text") shouldBe lineSet(survivors, "text")
    // line budget: kept lines across the corpus = distinct lines
    assert(once.agg(sum("n_kept")).head().getLong(0) ==
      lineSet(docs, "text").size.toLong)
  }

  test("packSequences plan: one shuffle on bucket, no global sort") {
    val docs = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    val out = PipelineOps.packSequences(docs, "text", "doc_id",
      capacity = 4, buckets = 2)
    val plan = out.queryExecution.executedPlan.toString
    // window runs per-bucket: hash-partitioned exchange, never a
    // single-partition global window
    plan should include("hashpartitioning(bucket")
    (plan should not).include("SinglePartition")
  }

  test("weightedHashSample: deterministic, k-sized, weight-biased") {
    val df = spark.range(2000).toDF("id")
      .withColumn("w", when($"id" < 100, 1000.0).otherwise(1.0))
    val s1 = PipelineOps.weightedHashSample(df, "id", "w", 200, "a")
      .select("id").as[Long].collect().toSet
    s1.size shouldBe 200
    // deterministic
    PipelineOps.weightedHashSample(df, "id", "w", 200, "a")
      .select("id").as[Long].collect().toSet shouldBe s1
    // the 100 weight-1000 rows are (essentially) always selected:
    // P(skip) per heavy row is astronomically small at this ratio
    (0L until 100L).toSet.subsetOf(s1) shouldBe true
    // zero/negative/null weights are excluded
    val wz = df.withColumn("w",
      when($"id" === 0, lit(null).cast("double"))
        .when($"id" === 1, -5.0).when($"id" === 2, 0.0)
        .otherwise(1.0))
    val sz = PipelineOps.weightedHashSample(wz, "id", "w", 2000)
      .select("id").as[Long].collect().toSet
    sz.intersect(Set(0L, 1L, 2L)) shouldBe Set.empty
    sz.size shouldBe 1997
  }

  test("takeByBudget equals the global-window cut, no global window") {
    val df = (0L until 500L).map { i =>
      (i, (i * 37 % 97).toDouble, 1 + (i % 13))
    }.toDF("id", "score", "tok")
    val got = PipelineOps.takeByBudget(df, "score", "tok", "id", 800L)
    // reference: plain global window on small data
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"score".desc, $"id")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val ref = df.withColumn("start",
        sum($"tok".cast("long")).over(w) - $"tok")
      .filter($"start" < 800L)
      .select($"id", $"start").as[(Long, Long)].collect().toMap
    val gotMap = got.select($"id", $"start_tok").as[(Long, Long)]
      .collect().toMap
    gotMap shouldBe ref
    // budget boundary: total kept tokens covers the budget exactly
    // (the last kept doc STARTS inside the budget)
    val kept = got.agg(sum("n_tokens")).head().getLong(0)
    assert(kept >= 800L)
    assert(kept - got.orderBy($"start_tok".desc).limit(1)
      .select("n_tokens").head().getLong(0) < 800L)
    // scale shape: the window is per-bucket, never single-partition
    val plan = got.queryExecution.executedPlan.toString
    plan should include("hashpartitioning(__bkt__")
    (plan should not).include("SinglePartition")
  }

  test("zValue2 interleaves bits; z-ordered write clusters BOTH dims") {
    import graft.sources.Sources
    // hand-checked interleavings
    val z = Seq((3L, 0L), (0L, 3L), (5L, 6L)).toDF("a", "b")
      .select(Sources.zValue2($"a", $"b")).as[Long].collect()
    z(0) shouldBe 0x5L  // a=0b11 -> even bits 0101
    z(1) shouldBe 0xAL  // b=0b11 -> odd bits 1010
    // a=101 even bits, b=110 odd bits -> 0b101_1_0_0_1 = interleave
    z(2) shouldBe ((1L << 0) | (0L << 2) | (1L << 4) |
      (0L << 1) | (1L << 3) | (1L << 5))
    // a 64x64 grid written z-ordered into 16 files: every file's
    // bounding rectangle covers a SMALL fraction of the domain in
    // BOTH dimensions (a 1-D sort leaves the other dim full-span)
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x, y)))
      .toDF("x", "y")
    val dir = s"/tmp/graft_zorder_${System.nanoTime()}"
    Sources.writeZOrdered(grid, "x", "y", dir, numFiles = 16)
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max($"x") - min($"x")).as("dx"), (max($"y") - min($"y")).as("dy"))
      .select("dx", "dy").as[(Int, Int)].collect()
    spans.length shouldBe 16
    // each file's rectangle: at most a quarter-span in each dimension
    spans.foreach { case (dx, dy) =>
      dx should be <= 16
      dy should be <= 16
    }
  }

  test("new ops tolerate empty and degenerate inputs") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    PipelineOps.paragraphDedup(emptyDocs, "text", "doc_id")
      .count() shouldBe 0
    PipelineOps.bigramLmScore(emptyDocs, "text", "doc_id")
      .count() shouldBe 0
    PipelineOps.packSequences(emptyDocs, "text", "doc_id", 10, 2)
      .count() shouldBe 0
    PipelineOps.weightedHashSample(
      Seq.empty[(Long, Double)].toDF("id", "w"), "id", "w", 5)
      .count() shouldBe 0
    PipelineOps.takeByBudget(
      Seq.empty[(Long, Double, Long)].toDF("id", "s", "tok"),
      "s", "tok", "id", 100L).count() shouldBe 0
    graft.ops.SkewOps.intervalJoin(
      Seq.empty[(Long, Long, Long)].toDF("a", "sa", "ea"),
      Seq((1L, 0L, 5L)).toDF("b", "sb", "eb"),
      "sa", "ea", "sb", "eb", 10L).count() shouldBe 0
    // degenerate: single row, zero-variance, single group
    import graft.ops.PandasOps._
    val one = Seq((1L, 5L)).toDF("id", "v")
    one.percentRankScalable("v").select("pct_rank")
      .head().getDouble(0) shouldBe 0.0 // n=1: below/(max(n-1,1)) = 0
    graft.stats.StatsOps.distributionDivergence(
        Seq(("x", "A")).toDF("cat", "g"), "cat", "g", "A", "B")
      .head().getDouble(2).isNaN shouldBe false // js finite-ish, no throw
    graft.timeseries.TimeSeriesOps.resampleOhlc(
      Seq.empty[(Long, java.sql.Timestamp, Long)].toDF("id", "ts", "v"),
      "ts", "v", "hour", "id").count() shouldBe 0
  }

  test("redactPii replaces emails, IPs and phone numbers") {
    val df = Seq(
      "mail bob.smith+x@sub.example.org end",
      "server at 192.168.0.1 port",
      "call 555-123-4567 now",
      "clean text stays").toDF("t")
    val out = df.select(TextFunctions.redactPii($"t").as("r"))
      .as[String].collect()
    out(0) shouldBe "mail <EMAIL> end"
    out(1) shouldBe "server at <IP> port"
    out(2) shouldBe "call <PHONE> now"
    out(3) shouldBe "clean text stays"
  }

  test("fuzzyMatch pairs words within the edit budget only") {
    val a = Seq("cat", "dog", "zebra").toDF("wa")
    val b = Seq("cats", "dig", "elephant", "cat").toDF("wb")
    val m1 = PipelineOps.fuzzyMatch(a, b, "wa", "wb", 1)
      .select("wa", "wb", "edit_dist")
      .as[(String, String, Long)].collect().toSet
    m1 shouldBe Set(("cat", "cats", 1L), ("cat", "cat", 0L),
      ("dog", "dig", 1L))
    // widening the budget admits 2-edit pairs ("cats"/"dog" stays out)
    val m2 = PipelineOps.fuzzyMatch(a, b, "wa", "wb", 2)
    m2.count() should be >= 3L
    m2.filter($"wa" === "zebra").count() shouldBe 0L
    // length prefilter alone cannot admit a long mismatch
    m2.filter($"wb" === "elephant").count() shouldBe 0L
  }
}
