package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.llm.UrlOps
import graft.sources.Sources

/** Round-10 verdict/advice closures:
  *   - RFC 9309 §2.1 case-insensitive directive keys: a property
  *     test over RANDOM casing of every directive keyword — the
  *     round-9 bug was lowercase `disallow:` files parsing to zero
  *     rules and default-allowing forbidden crawls
  *   - writeCompacted null-partition round trip (the silent-drop
  *     advice item: equi-join on partition cols lost null rows)
  *   - fileReport full-path keying (duplicate part-file basenames
  *     across partition directories merged/multiplied before)
  *   - compactPartitions: in-place selective compaction — healthy
  *     partitions byte-untouched, fragmented ones rewritten to the
  *     size bound, dataset round-trips identically
  *   - hostOfAuthority bracketed-IPv6 authorities
  *   - registeredDomainPsl single-label host guard (no descending
  *     sequence(1,0) candidates)
  *   - dedupCorpus portable-kernel parameter (fast = false)
  */
class VerdictR10Spec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // -------------------------------------- robots key case-insensitivity

  /** Deterministically "random" per-character casing: character i of
    * key k in body b is uppercased iff a hash bit says so — covers
    * mixed cases no hand fixture would. */
  private def scramble(key: String, salt: Int): String =
    key.zipWithIndex.map { case (ch, i) =>
      if (((key + salt).hashCode >> (i % 28) & 1) == 1)
        ch.toUpper else ch.toLower
    }.mkString

  test("RFC 9309 directive keys are case-insensitive: randomly-cased " +
      "bodies parse to the same rules as canonically-cased ones") {
    val domains = (1 to 24).map(i => s"site$i.example")
    def body(dom: String, cased: Boolean): String = {
      val salt = dom.hashCode
      def k(key: String) = if (cased) scramble(key, salt) else key
      s"""${k("User-agent")}: *
         |${k("Disallow")}: /private
         |${k("Allow")}: /private/ok
         |${k("Disallow")}: /tmp/*$$
         |${k("Crawl-delay")}: ${math.abs(salt % 7) + 1}
         |${k("Sitemap")}: https://$dom/sitemap.xml
         |""".stripMargin.replace("\n", "\r\n")
    }
    def frame(cased: Boolean) =
      domains.map(d => (d, body(d, cased))).toDF("domain", "robots")

    // REP rules: identical (domain, is_allow, pattern) sets
    def ruleSet(cased: Boolean) =
      UrlOps.robotsRulesRep(frame(cased), "domain", "robots")
        .select("domain", "is_allow", "pattern")
        .as[(String, Boolean, String)].collect().toSet
    val canon = ruleSet(cased = false)
    canon.size shouldBe domains.size * 3
    ruleSet(cased = true) shouldBe canon

    // v1 Disallow-prefix rules
    def v1(cased: Boolean) =
      UrlOps.robotsRules(frame(cased), "domain", "robots")
        .as[(String, String)].collect().toSet
    v1(cased = true) shouldBe v1(cased = false)
    v1(cased = false).size shouldBe domains.size * 2

    // crawl delays
    def delays(cased: Boolean) =
      UrlOps.robotsCrawlDelay(frame(cased), "domain", "robots")
        .as[(String, Long)].collect().toSet
    delays(cased = true) shouldBe delays(cased = false)
    delays(cased = false).size shouldBe domains.size

    // sitemaps
    def maps(cased: Boolean) =
      UrlOps.robotsSitemaps(frame(cased), "domain", "robots")
        .as[(String, String)].collect().toSet
    maps(cased = true) shouldBe maps(cased = false)
    maps(cased = false).size shouldBe domains.size

    // multi-agent group selection: scrambled User-agent keys still
    // bind their groups; exact group wins over *
    def agentBody(cased: Boolean): String = {
      def k(key: String) = if (cased) scramble(key, 99) else key
      s"""${k("User-agent")}: GraftBot
         |${k("Disallow")}: /bot-only
         |${k("User-agent")}: *
         |${k("Disallow")}: /everyone
         |""".stripMargin
    }
    def agentRules(cased: Boolean) =
      UrlOps.robotsRulesRepAgent(
        Seq(("d.example", agentBody(cased))).toDF("domain", "robots"),
        "domain", "robots", "graftbot")
        .select("pattern").as[String].collect().toSet
    agentRules(cased = false) shouldBe Set("/bot-only")
    agentRules(cased = true) shouldBe Set("/bot-only")
  }

  test("lowercase-only robots body (the round-9 silent default-allow " +
      "bug shape) now blocks the forbidden path") {
    val robots = Seq(("ex.com",
      "user-agent: *\ndisallow: /secret\n")).toDF("domain", "robots")
    val rules = UrlOps.robotsRulesRep(robots, "domain", "robots")
    rules.count() shouldBe 1
    val urls = Seq("https://ex.com/secret/x", "https://ex.com/open")
      .toDF("url")
    val verdicts = UrlOps.robotsAllowedRep(urls, "url", rules)
      .select("url", "allowed").as[(String, Boolean)]
      .collect().toMap
    verdicts("https://ex.com/secret/x") shouldBe false
    verdicts("https://ex.com/open") shouldBe true
  }

  // ------------------------------------------- writeCompacted null keys

  test("writeCompacted keeps rows whose partition value is NULL " +
      "(null-safe join; they land in __HIVE_DEFAULT_PARTITION__)") {
    val dir = tmp("graft_compact_null")
    val df = ((1 to 40).map(i => (Some(s"p${i % 2}"), i.toLong)) ++
        (1 to 7).map(i => (None: Option[String], (100 + i).toLong)))
      .toDF("p", "i")
      .withColumn("v", md5(col("i").cast("string")))
    Sources.writeCompacted(df, dir, Seq("p"),
      targetBytes = 1 << 20, sampleRows = 50)
    val back = spark.read.parquet(dir)
    back.count() shouldBe 47
    back.filter(col("p").isNull).count() shouldBe 7
    back.select(sum(col("i"))).as[Long].head() shouldBe
      df.select(sum(col("i"))).as[Long].head()
  }

  // ------------------------------------------ fileReport full-path keys

  test("fileReport keys by full path: duplicate part-file basenames " +
      "across partition dirs stay distinct rows with exact counts") {
    val dir = tmp("graft_filereport_dup")
    // one shuffle task writing two partition values reuses the same
    // part-00000-<uuid> basename in BOTH partition directories —
    // the basename-keyed report merged them
    (1 to 30).map(i => (s"p${i % 2}", i.toLong)).toDF("p", "i")
      .repartition(1)
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    val names = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet")).map(_.getName)
    names.distinct.length shouldBe 1 // the collision fixture is real
    names.length shouldBe 2
    val rep = Sources.fileReport(spark, dir)
      .as[(String, Long, Long)].collect()
    rep.length shouldBe 2
    rep.map(_._2).sum shouldBe 30L
    rep.map(_._1).distinct.length shouldBe 2
    all(rep.map(_._3)) should be > 0L
  }

  // ---------------------------------------------------- compactPartitions

  test("compactPartitions rewrites ONLY fragmented partitions: healthy " +
      "files byte-untouched, rewritten ones bounded, data identical") {
    val dir = tmp("graft_selective")
    val healthy = (1 to 50).map(i => ("ok", i.toLong)).toDF("p", "i")
      .withColumn("v", md5(col("i").cast("string")))
    val fragged = (1 to 400).map(i => ("frag", (1000 + i).toLong))
      .toDF("p", "i")
      .withColumn("v", md5(col("i").cast("string")))
    // healthy partition: ONE file; fragmented partition: 8 files
    healthy.repartition(1).write.mode("overwrite")
      .partitionBy("p").parquet(dir)
    fragged.repartition(8).write.mode("append")
      .partitionBy("p").parquet(dir)
    def listing(p: String): Map[String, Long] =
      new java.io.File(s"$dir/p=$p").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    val okBefore = listing("ok")
    listing("frag").size shouldBe 8
    val sumBefore = spark.read.parquet(dir)
      .select(sum(col("i"))).as[Long].head()

    val report = Sources.compactPartitions(spark, dir,
        targetBytes = 1 << 20)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    report("p=ok")._5 shouldBe false
    report("p=frag")._5 shouldBe true
    report("p=frag")._4 shouldBe 1L // 8 tiny files -> 1 target file

    // untouched partition: same files, same mtimes
    listing("ok") shouldBe okBefore
    listing("frag").size shouldBe 1
    // fidelity
    val back = spark.read.parquet(dir)
    back.count() shouldBe 450
    back.select(sum(col("i"))).as[Long].head() shouldBe sumBefore
    back.filter(col("p") === "frag").count() shouldBe 400
  }

  // ------------------------------------------------- IPv6 authorities

  test("hostOfAuthority keeps bracketed IPv6 literals intact " +
      "(strips port + userinfo, lowercases)") {
    val got = Seq("[::1]:8080", "[2001:DB8::1]", "user@[::1]:443",
        "EXAMPLE.com:8080", "plain.org")
      .toDF("a")
      .select(UrlOps.hostOfAuthority(col("a"))).as[String].collect()
    got shouldBe Array("[::1]", "[2001:db8::1]", "[::1]",
      "example.com", "plain.org")
    // end-to-end: parseUrl on a bracketed-IPv6 URL
    val p = UrlOps.parseUrl(
      Seq("http://[::1]:8080/a/b?x=1").toDF("url"), "url")
      .select("url_host", "url_path", "url_query")
      .as[(String, String, String)].head()
    p shouldBe (("[::1]", "/a/b", "x=1"))
  }

  // --------------------------------------- PSL single-label host guard

  test("registeredDomainPsl: single-label hosts generate no suffix " +
      "candidates and fall back to themselves") {
    val sufs = Seq("com", "co.uk").toDF("suffix")
    val hosts = Seq("localhost", "a", "shop.example.com",
      "x.co.uk").toDF("host")
    val got = UrlOps.registeredDomainPsl(hosts, "host", sufs)
      .select("host", "reg_domain").as[(String, String)]
      .collect().toMap
    got("localhost") shouldBe "localhost"
    got("a") shouldBe "a"
    got("shop.example.com") shouldBe "example.com"
    got("x.co.uk") shouldBe "x.co.uk"
  }

  // ------------------------------------- streaming frontier planner

  test("crawlSchedule consumed as an unbounded frontier feed: file " +
      "source + foreachBatch + checkpoint, restart loses no batch " +
      "and double-schedules none (the q482 deployment shape)") {
    import org.apache.spark.sql.types._
    val inDir = tmp("graft_frontier_in")
    val ckpt = tmp("graft_frontier_ckpt")
    val delays = Seq(("sitea.example", 3L), ("siteb.example", 1L))
      .toDF("domain", "crawl_delay_s")
    val schema = StructType(Seq(
      StructField("url", StringType), StructField("prio", LongType)))
    def batchUrls(b: Int): Seq[(String, Long)] =
      (1 to 6).map(i =>
        (s"https://site${if (i % 2 == 0) "a" else "b"}.example" +
          s"/b$b/p$i", (b * 10 + i).toLong))
    def writeBatch(b: Int): Unit =
      batchUrls(b).toDF("url", "prio").coalesce(1)
        .write.mode("append").parquet(inDir)
    // reference: the per-micro-batch schedule each file batch gets
    def ref(b: Int): Set[(String, String, Long, Long)] =
      graft.llm.UrlOps.crawlSchedule(
        batchUrls(b).toDF("url", "prio"), "url", "prio", delays)
        .as[(String, String, Long, Long)].collect().toSet

    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, String, Long, Long)]()
    def start() = spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          graft.llm.UrlOps.crawlSchedule(batch, "url", "prio", delays)
            .as[(String, String, Long, Long)]
            .collect().foreach(sunk.add)
      }
      .option("checkpointLocation", ckpt)
      .start()

    writeBatch(1)
    val q1 = start()
    try {
      q1.processAllAvailable()
      writeBatch(2)
      q1.processAllAvailable()
    } finally q1.stop() // simulated failure between micro-batches
    writeBatch(3)       // lands while the planner is down
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    import scala.jdk.CollectionConverters._
    val got = sunk.asScala.toSeq
    // no batch lost, none double-scheduled (file-source offsets
    // recovered from the checkpoint), per-batch politeness intact
    got.size shouldBe 18
    got.toSet shouldBe (ref(1) ++ ref(2) ++ ref(3))
    // politeness within every batch: per-domain slots spaced by the
    // domain's crawl delay
    got.groupBy(r => (r._2, r._1.split("/b")(1).take(1)))
      .foreach { case ((dom, _), rows) =>
        val d = if (dom == "sitea.example") 3L else 1L
        rows.sortBy(_._3).map(_._4) shouldBe
          rows.indices.map(_ * d).toSeq
      }
  }

  // --------------------------------- canonical-URL identity property

  test("canonicalizeUrl is IDEMPOTENT: canon(canon(u)) == canon(u) " +
      "for hostile case/port/tracking/fragment variants") {
    // identity functions must be stable under re-application or
    // incremental URL dedup (q505) would mis-flag already-canonical
    // corpus entries on a second pass
    val urls = Seq(
      "HTTPS://Ex.COM:443/A/b?utm_source=x&z=1&a=2#frag",
      "http://ex.com:80/",
      "https://user@ex.com/p?fbclid=1",
      "https://ex.com/p?b=2&a=1",
      "ftp://EX.com/Q",
      "https://ex.com/p").toDF("u")
    val once = urls.select(
      graft.llm.UrlOps.canonicalizeUrl(col("u")).as("c1"))
    val twice = once.select(col("c1"),
      graft.llm.UrlOps.canonicalizeUrl(col("c1")).as("c2"))
      .as[(String, String)].collect()
    twice.foreach { case (c1, c2) =>
      withClue(s"canon not idempotent on $c1: ") { c2 shouldBe c1 }
    }
  }

  // ------------------------------------- bloom-pruned exact dedup

  test("exactAgainstBloom returns the EXACT same verdicts as " +
      "exactAgainst (bloom only prunes the verifying join)") {
    val corpus = (1 to 300).map(i => (i.toLong, s"corpus doc $i"))
      .toDF("doc_id", "text")
    val fresh = ((1 to 40).map(i =>
        (1000L + i, s"corpus doc ${i * 7}")) ++ // 40 known
      (1 to 60).map(i => (2000L + i, s"fresh doc $i")))
      .toDF("doc_id", "text")
    val ref = graft.llm.Dedup.exactAgainst(fresh, corpus,
      "text", "doc_id").as[(Long, String, Boolean)].collect().toSet
    val got = graft.llm.Dedup.exactAgainstBloom(fresh, corpus,
      "text", "doc_id", expectedItems = 300L, fpp = 0.01)
      .as[(Long, String, Boolean)].collect().toSet
    got shouldBe ref
    got.count(_._3) shouldBe 40
    // an UNDERSIZED filter (worst case) still yields exact output —
    // only the pruning ratio degrades
    val tiny = graft.llm.Dedup.exactAgainstBloom(fresh, corpus,
      "text", "doc_id", expectedItems = 10L, fpp = 0.5)
      .as[(Long, String, Boolean)].collect().toSet
    tiny shouldBe ref
  }

  // --------------------------------------------- dedupCorpus kernels

  test("dedupCorpus fast=false (portable md5 kernel) still collapses " +
      "exact and near duplicates to one keeper") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "the quick brown fox jumps over the lazy dog tonight"),
      (4L, "completely different content about spark partitions here"))
      .toDF("id", "text")
    val out = graft.llm.DedupPipeline.dedupCorpus(docs, "text", "id",
        numHashes = 12, bands = 12, shingleSize = 3,
        jaccardThreshold = 0.5, fast = false)
      .select("id", "dup_group", "keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    out.map(_._2).take(3).toSet shouldBe Set(1L) // 1,2,3 one group
    out(3)._2 shouldBe 4L
    out.filter(_._3).map(_._1).toSet shouldBe Set(1L, 4L)
  }
}
