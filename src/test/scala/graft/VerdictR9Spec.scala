package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.llm.UrlOps
import graft.sources.Sources

/** Round-9 verdict/advice closures:
  *   - writeCompacted: target-file-size writes (files bounded, no
  *     tiny-file fragmentation, fidelity round-trip)
  *   - RFC 9309 robots: precedence property vs an independent
  *     brute-force reference matcher
  *   - journeyStream poison-pill guard (''/null event types)
  *   - apportion zero-total-weight guard
  *   - registeredDomain/parseUrl port+userinfo+case hardening
  *   - cdc_cuts SQL registration argument validation
  *   - EventOps attribution type-domain loud cap
  *   - streaming checkpoint recovery (stop/restart state equality)
  */
class VerdictR9Spec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // ---------------------------------------------------------- writeCompacted

  private def parquetFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  test("writeCompacted partitioned: file counts track ceil(rows/rowsPerFile), " +
      "small partitions get ONE file, data round-trips") {
    val dir = tmp("graft_compact")
    // skewed partition column: big=900, small=60, tiny=5; values are
    // distinct md5 pairs so parquet can't dictionary-collapse them
    val df = ((1 to 900).map(i => ("big", i.toLong)) ++
        (1 to 60).map(i => ("small", i.toLong)) ++
        (1 to 5).map(i => ("tiny", i.toLong)))
      .toDF("p", "i")
      .withColumn("v", concat(md5(col("i").cast("string")),
        md5(concat(col("p"), col("i").cast("string")))))
    val rpf = Sources.writeCompacted(df, dir, Seq("p"),
      targetBytes = 4096, sampleRows = 500)
    rpf should be >= 1L
    def nFiles(p: String): Long =
      parquetFiles(new java.io.File(s"$dir/p=$p")).size.toLong
    for ((p, cnt) <- Seq(("big", 900L), ("small", 60L), ("tiny", 5L))) {
      val buckets = (cnt + rpf - 1) / rpf
      nFiles(p) should be >= buckets
      nFiles(p) should be <= 2 * buckets // salt-bucket unevenness cap
    }
    // the tiny-file fix itself: a 5-row partition must be ONE file,
    // not one-per-shuffle-task
    if (rpf >= 5L) nFiles("tiny") shouldBe 1L
    // fidelity
    val back = spark.read.parquet(dir)
    back.count() shouldBe 965
    back.select(sum(col("i"))).as[Long].head() shouldBe
      df.select(sum(col("i"))).as[Long].head()
  }

  test("writeCompacted unpartitioned: file count == ceil(n/rowsPerFile) (+split slack)") {
    val dir = tmp("graft_compact_flat")
    val df = (1 to 1000).toDF("i")
      .withColumn("v", md5(col("i").cast("string")))
    val rpf = Sources.writeCompacted(df, dir, Seq.empty,
      targetBytes = 4096, sampleRows = 400)
    val want = (1000 + rpf - 1) / rpf
    val got = parquetFiles(new java.io.File(dir)).size.toLong
    got should be >= want
    got should be <= want + 2
    spark.read.parquet(dir).count() shouldBe 1000
  }

  test("fileReport audits every written file with per-file rows + bytes " +
      "(the detector writeCompacted fixes)") {
    val dir = tmp("graft_filereport")
    val df = (1 to 500).toDF("i")
      .withColumn("v", md5(col("i").cast("string")))
    val rpf = Sources.writeCompacted(df, dir, Seq.empty,
      targetBytes = 4096, sampleRows = 200)
    val rep = Sources.fileReport(spark, dir)
      .select("file", "rows", "bytes")
      .as[(String, Long, Long)].collect()
    rep.map(_._2).sum shouldBe 500L
    rep.foreach { case (f, r, b) =>
      withClue(s"file $f: ") {
        r should be <= rpf
        b should be > 0L
      }
    }
    rep.length.toLong shouldBe
      parquetFiles(new java.io.File(dir)).size.toLong
  }

  test("writeCompacted on an empty frame writes an empty dataset and returns 0") {
    val dir = tmp("graft_compact_empty")
    val df = Seq.empty[(Long, String)].toDF("i", "v")
    Sources.writeCompacted(df, dir, Seq.empty) shouldBe 0L
    spark.read.parquet(dir).count() shouldBe 0
  }

  // ------------------------------------------------------------ RFC 9309 REP

  /** Independent reference matcher: split-on-'*' + Pattern.quote —
    * a different mechanism than the production escape-class chain,
    * so agreement is evidence, not tautology. */
  private def refAllowed(rules: Seq[(Boolean, String)],
      target: String): Boolean = {
    val matched = rules.filter { case (_, pat) =>
      val anchored = pat.endsWith("$")
      val core = if (anchored) pat.dropRight(1) else pat
      val rx = "^" + core.split("\\*", -1)
        .map(java.util.regex.Pattern.quote)
        .mkString(".*") + (if (anchored) "$" else "")
      rx.r.findFirstIn(target).isDefined
    }
    if (matched.isEmpty) true
    else {
      // longest pattern wins; Allow wins exact-length ties
      val best = matched.map { case (allow, pat) =>
        (pat.length.toLong * 2 + (if (allow) 1 else 0), allow)
      }.maxBy(_._1)
      best._2
    }
  }

  test("robotsAllowedRep agrees with a brute-force RFC 9309 reference " +
      "on randomized wildcard/anchor rule sets") {
    val rnd = new scala.util.Random(1909)
    val patAtoms = Seq("/", "a", "b", "doc", "*", ".", "7")
    def randPattern(): String =
      "/" + Seq.fill(1 + rnd.nextInt(4))(
        patAtoms(rnd.nextInt(patAtoms.size))).mkString +
        (if (rnd.nextBoolean()) "$" else "")
    val domains = (1 to 12).map(i => s"site$i.com")
    val ruleMap: Map[String, Seq[(Boolean, String)]] =
      domains.map { d =>
        d -> Seq.fill(rnd.nextInt(5))(
          (rnd.nextBoolean(), randPattern()))
      }.toMap
    val robotsBodies = ruleMap.toSeq.map { case (d, rs) =>
      (d, "User-agent: *\r\n" + rs.map { case (a, p) =>
        (if (a) "Allow: " else "Disallow: ") + p + "\r\n"
      }.mkString)
    }
    val pathAtoms = Seq("/a", "/b", "/doc", "/ab7", "/a.b", "/x")
    val urls = (1 to 150).map { i =>
      val d = domains(rnd.nextInt(domains.size))
      val path = Seq.fill(1 + rnd.nextInt(3))(
        pathAtoms(rnd.nextInt(pathAtoms.size))).mkString
      val q = if (rnd.nextBoolean()) "?ref=" + i else ""
      s"https://w.$d$path$q"
    }.distinct
    val rules = UrlOps.robotsRulesRep(
      robotsBodies.toDF("domain", "robots_txt"), "domain",
      "robots_txt")
    val got = UrlOps.robotsAllowedRep(urls.toDF("url"), "url", rules)
      .select("url", "match_target", "url_domain", "allowed")
      .collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getBoolean(3))).toMap
    got.size shouldBe urls.size
    urls.foreach { u =>
      val (target, dom, allowed) = got(u)
      withClue(s"url=$u target=$target rules=${ruleMap(dom)}: ") {
        allowed shouldBe refAllowed(ruleMap(dom), target)
      }
    }
  }

  test("robotsAllowedRep: longest match wins, Allow wins ties, default allow, " +
      "CRLF + query-in-target semantics") {
    val robots = Seq(("ex.com",
      "User-agent: *\r\nDisallow: /en\r\nAllow: /en/doc\r\n" +
        "Disallow: /*/doc/*7$\r\n")).toDF("domain", "robots_txt")
    val rules = UrlOps.robotsRulesRep(robots, "domain", "robots_txt")
    val urls = Seq(
      "https://w.ex.com/en",           // /en disallow only
      "https://w.ex.com/en/doc/12",    // Allow /en/doc (7) beats /en (3)
      "https://w.ex.com/en/doc/17",    // anchored wildcard (len 11) beats Allow
      "https://w.ex.com/en/doc/17?x=1", // query breaks the $ anchor -> allowed
      "https://w.ex.com/fr/doc/9"      // no match -> allowed
    ).toDF("url")
    val got = UrlOps.robotsAllowedRep(urls, "url", rules)
      .select("url", "allowed").as[(String, Boolean)].collect().toMap
    got("https://w.ex.com/en") shouldBe false
    got("https://w.ex.com/en/doc/12") shouldBe true
    got("https://w.ex.com/en/doc/17") shouldBe false
    got("https://w.ex.com/en/doc/17?x=1") shouldBe true
    got("https://w.ex.com/fr/doc/9") shouldBe true
  }

  test("robotsRulesRepAgent: exact agent group governs, * fallback, " +
      "case-insensitive token, otherbot never leaks") {
    val body =
      "User-agent: GraftBot\r\nDisallow: /en\r\nAllow: /en/doc\r\n" +
        "User-agent: *\r\nDisallow: /de\r\n" +
        "User-agent: otherbot\r\nDisallow: /\r\n"
    val starOnly = "User-agent: *\r\nDisallow: /de\r\n" +
      "User-agent: otherbot\r\nDisallow: /\r\n"
    val robots = Seq(("ex.com", body), ("st.com", starOnly))
      .toDF("domain", "robots_txt")
    val rules = UrlOps.robotsRulesRepAgent(robots, "domain",
      "robots_txt", "graftbot")
    val got = rules.select("domain", "is_allow", "pattern")
      .as[(String, Boolean, String)].collect().toSet
    // exact group only for ex.com (NOT the * group, NOT otherbot)
    got shouldBe Set(
      ("ex.com", false, "/en"), ("ex.com", true, "/en/doc"),
      ("st.com", false, "/de"))
    // end-to-end: the * fallback domain blocks /de, exact domain
    // follows its own group
    val urls = Seq("https://a.ex.com/de/x", "https://a.st.com/de/x",
      "https://a.st.com/en/x").toDF("url")
    val allowed = UrlOps.robotsAllowedRep(urls, "url", rules)
      .select("url", "allowed").as[(String, Boolean)].collect().toMap
    allowed("https://a.ex.com/de/x") shouldBe true // exact group has no /de
    allowed("https://a.st.com/de/x") shouldBe false
    allowed("https://a.st.com/en/x") shouldBe true
  }

  test("registeredDomainPsl: longest-suffix match, fallback heuristic, " +
      "agrees with the fixed two-level rule on its domain") {
    val sufs = (UrlOps.TwoLevelSuffixes ++
      Seq("com", "org", "uk", "static.example.com"))
      .map(Tuple1(_)).toDF("suffix")
    val hosts = Seq(
      "a.b.example.co.uk",       // 2-level suffix -> example.co.uk
      "x.static.example.com",    // 3-level suffix -> x.static.example.com
      "w.example.com:8080",      // port stripped -> example.com
      "user@W.EXAMPLE.ORG",      // userinfo+case -> example.org
      "noc.example.xyz",         // no suffix match -> last-2 fallback
      "single").toDF("host")
    val got = UrlOps.registeredDomainPsl(hosts, "host", sufs)
      .select("host", "reg_domain").as[(String, String)]
      .collect().toMap
    got("a.b.example.co.uk") shouldBe "example.co.uk"
    got("x.static.example.com") shouldBe "x.static.example.com"
    got("w.example.com:8080") shouldBe "example.com"
    got("user@W.EXAMPLE.ORG") shouldBe "example.org"
    got("noc.example.xyz") shouldBe "example.xyz"
    got("single") shouldBe "single"
    // equivalence with the fixed rule wherever only 1/2-level
    // suffixes apply
    val twoLevel = hosts.filter(!col("host").contains("static"))
      .select(col("host"),
        UrlOps.registeredDomain(col("host")).as("rd"))
      .as[(String, String)].collect().toMap
    twoLevel.foreach { case (h, rd) => got(h) shouldBe rd }
  }

  test("crawlSchedule spaces per-domain fetches by crawl-delay with " +
      "priority order and a default for absent domains") {
    val urls = Seq(
      ("https://a.ex.com/big", 100L), ("https://a.ex.com/mid", 50L),
      ("https://a.ex.com/sml", 10L), ("https://b.other.org/x", 7L),
      ("https://b.other.org/y", 9L)).toDF("url", "prio")
    val delays = Seq(("ex.com", 5L)).toDF("domain", "crawl_delay_s")
    val got = UrlOps.crawlSchedule(urls, "url", "prio", delays,
        defaultDelayS = 2L)
      .select("url", "slot", "fetch_offset_s")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    got("https://a.ex.com/big") shouldBe ((0L, 0L))
    got("https://a.ex.com/mid") shouldBe ((1L, 5L))
    got("https://a.ex.com/sml") shouldBe ((2L, 10L))
    // no directive -> default 2s; higher priority first
    got("https://b.other.org/y") shouldBe ((0L, 0L))
    got("https://b.other.org/x") shouldBe ((1L, 2L))
  }

  test("robotsCrawlDelay takes the minimum of multiple directives; " +
      "robotsSitemaps extracts file-wide seeds") {
    val robots = Seq(("ex.com",
      "User-agent: *\r\nCrawl-delay: 7\r\nSitemap: https://ex.com/s.xml\r\n" +
        "User-agent: fast\r\nCrawl-delay: 3\r\n")).toDF("domain", "robots_txt")
    UrlOps.robotsCrawlDelay(robots, "domain", "robots_txt")
      .as[(String, Long)].collect().toMap apply "ex.com" shouldBe 3L
    UrlOps.robotsSitemaps(robots, "domain", "robots_txt")
      .as[(String, String)].collect().toSeq shouldBe
      Seq(("ex.com", "https://ex.com/s.xml"))
  }

  test("incremental LSH: fast (xxhash64) and portable (md5) variants " +
      "both recover planted cross-corpus duplicates") {
    import graft.llm.Dedup
    val corpus = (1 to 40).map(i => (i.toLong,
      s"alpha beta gamma delta epsilon zeta eta theta doc $i " +
        s"unique tokens ${i * 7} ${i * 13}"))
    val fresh = (1 to 10).map(i => (100L + i, corpus(i - 1)._2)) ++
      (11 to 20).map(i => (100L + i,
        s"totally different content row $i nothing shared " +
          s"${i * 31} ${i * 37} lorem ipsum dolor sit amet"))
    val cDf = corpus.toDF("doc_id", "text")
    val nDf = fresh.toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("new_id", "corpus_id").as[(Long, Long)]
        .collect().toSet
    val slow = pairs(Dedup.minhashLshAgainst(nDf, cDf, "text", "doc_id"))
    val fast = pairs(Dedup.minhashLshAgainstFast(nDf, cDf, "text", "doc_id"))
    val planted = (1 to 10).map(i => (100L + i, i.toLong)).toSet
    assert(planted.subsetOf(slow),
      s"portable variant missed ${planted -- slow}")
    assert(planted.subsetOf(fast),
      s"fast variant missed ${planted -- fast}")
    // the self-join production kernel recovers planted dups too:
    // every (corpus doc, its copy) must pair within the combined set
    val selfPairs = Dedup.minhashLshPairsFast(
        cDf.union(nDf), "text", "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val plantedSelf = (1 to 10).map(i => (i.toLong, 100L + i)).toSet
    assert(plantedSelf.subsetOf(selfPairs),
      s"self-join kernel missed ${plantedSelf -- selfPairs}")
  }

  // ------------------------------------------------- journeyStream guard

  test("journeyStream survives ''/null event types (batch-equal empty initial)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, String)]
    val out = graft.streaming.StreamOps.journeyStream(input.toDS(),
      Seq("nv" -> "v+"))
    val q = out.writeStream.format("memory").queryName("jrn_guard")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(("u1", 1L, ""), ("u1", 2L, null),
        ("u1", 3L, "view"))
      q.processAllAvailable()
    } finally q.stop()
    import graft.streaming.StreamOps.JourneyStreamOut
    val r = spark.table("jrn_guard").as[JourneyStreamOut].collect()
      .maxBy(_.nEvents)
    r.nEvents shouldBe 3L
    r.journey shouldBe "v" // '' and null contribute empty initials
    r.patternCounts("nv") shouldBe 1L
  }

  // ------------------------------------------------------- apportion W = 0

  test("apportion with zero total weight allocates 0 everywhere (no div-by-zero)") {
    val df = Seq(("a", 0L), ("b", -5L), ("c", 0L)).toDF("k", "w")
    val out = UrlOps.apportion(df, "k", "w", 100L)
      .select("key", "alloc").as[(String, Long)].collect().toMap
    out.values.sum shouldBe 0L
    out.keySet shouldBe Set("a", "b", "c")
  }

  // ------------------------------------------- URL parse hardening

  test("parseUrl strips userinfo + port, lowercases scheme/host; " +
      "registeredDomain groups hostile authorities correctly") {
    val df = Seq(
      "HTTP://user:pw@Sub.Example.co.uk:8080/Path/X?x=1",
      "https://example.com:8080/a",
      "Ftp://MIRROR-SITE.NET/z").toDF("url")
    val got = UrlOps.parseUrl(df, "url")
      .select("url", "url_scheme", "url_host", "url_domain",
        "url_path", "url_query")
      .collect().map(r => r.getString(0) -> (r.getString(1),
        r.getString(2), r.getString(3), r.getString(4),
        r.getString(5))).toMap
    got("HTTP://user:pw@Sub.Example.co.uk:8080/Path/X?x=1") shouldBe
      (("http", "sub.example.co.uk", "example.co.uk", "/Path/X", "x=1"))
    got("https://example.com:8080/a") shouldBe
      (("https", "example.com", "example.com", "/a", ""))
    got("Ftp://MIRROR-SITE.NET/z") shouldBe
      (("ftp", "mirror-site.net", "mirror-site.net", "/z", ""))
  }

  // ------------------------------------ cdc_cuts SQL argument validation

  test("cdc_cuts SQL registration: BIGINT literal accepted, non-literal " +
      "rejected with a descriptive message") {
    // BIGINT literal within Int range: converted, works
    val ok = spark.sql(
      "SELECT cdc_cuts('abcdefghijabcdefghij', CAST(8 AS BIGINT), 6, 256) AS c")
      .collect()
    ok.length shouldBe 1
    // non-foldable argument: descriptive error, not a ClassCastException
    val err = intercept[Throwable] {
      spark.sql("SELECT cdc_cuts(v, k, 6, 256) FROM " +
        "(SELECT 'abc' AS v, 8 AS k)").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("must be an integer literal")),
      s"got: ${messages(err).mkString(" | ")}")
  }

  // ------------------------------------------- attribution type-domain cap

  test("attribution refuses an oversized touch-type domain loudly") {
    val df = (1 to 50).map(i =>
        (s"u${i % 5}", i.toLong, s"ch$i", 1.0, i.toLong))
      .toDF("user", "ts", "ty", "value", "id")
    val e = intercept[IllegalArgumentException] {
      graft.analytics.EventOps.attribution(df, "user", "ts", "ty",
        "value", "conv", "id", maxTypes = 10)
    }
    e.getMessage should include("distinct touch types")
  }

  // --------------------------------------------- checkpoint recovery

  test("journeyStream recovers flatMapGroupsWithState state from a " +
      "checkpoint across stop/restart (equals uninterrupted run)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamOps
    import graft.streaming.StreamOps.JourneyStreamOut
    val patterns = Seq("np" -> "ab", "nr" -> "a+")
    val b1 = Seq(("u1", 1L, "add"), ("u1", 2L, "buy"),
      ("u2", 1L, "add"))
    val b2 = Seq(("u1", 3L, "add"), ("u2", 2L, "buy"))
    val b3 = Seq(("u1", 4L, "buy"), ("u2", 3L, "add"))

    // uninterrupted reference
    val inRef = MemoryStream[(String, Long, String)]
    val qRef = StreamOps.journeyStream(inRef.toDS(), patterns)
      .writeStream.format("memory").queryName("jr_ref")
      .outputMode(OutputMode.Append()).start()
    try {
      inRef.addData(b1: _*); qRef.processAllAvailable()
      inRef.addData(b2: _*); qRef.processAllAvailable()
      inRef.addData(b3: _*); qRef.processAllAvailable()
    } finally qRef.stop()
    val ref = spark.table("jr_ref").as[JourneyStreamOut].collect()
      .groupBy(_.key).map { case (k, rs) => k -> rs.maxBy(_.nEvents) }

    // interrupted run: stop after batch 2, restart from the
    // checkpoint, feed batch 3 — the state store must restore the
    // accumulated journeys. Sink is foreachBatch (fault-tolerant,
    // unlike the memory sink, so checkpoint recovery is supported).
    val ckpt = tmp("graft_ckpt")
    val in = MemoryStream[(String, Long, String)]
    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[
      JourneyStreamOut]()
    def start() =
      StreamOps.journeyStream(in.toDS(), patterns)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[JourneyStreamOut],
           _: Long) => batch.collect().foreach(sunk.add)
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try {
      in.addData(b1: _*); q1.processAllAvailable()
      in.addData(b2: _*); q1.processAllAvailable()
    } finally q1.stop() // simulated failure between micro-batches
    in.addData(b3: _*)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    import scala.jdk.CollectionConverters._
    val rec = sunk.asScala.toSeq
      .groupBy(_.key).map { case (k, rs) => k -> rs.maxBy(_.nEvents) }

    rec.keySet shouldBe ref.keySet
    rec.foreach { case (k, r) =>
      r.nEvents shouldBe ref(k).nEvents
      r.journey shouldBe ref(k).journey
      r.patternCounts shouldBe ref(k).patternCounts
    }
  }
}
