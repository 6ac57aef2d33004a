package graft

import org.apache.spark.sql.functions._
import graft.llm.UrlOps

/** URL provenance ops: portable parsing, registered-domain suffix
  * logic, per-domain rollup, and the mod-vs-interval shard planner
  * (q447–q449). */
class UrlOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val urls = Seq(
    (1L, "https://www.bbc.co.uk/news/uk-12345?src=rss", 100L),
    (2L, "http://example.com/", 200L),
    (3L, "https://a.b.archive.gov.uk/path/x", 300L),
    (4L, "ftp://files.example.com/pub?x=1", 50L),
    (5L, "https://localhost/health", 10L),
    (6L, "https://example.com/a#frag", 70L)
  ).toDF("doc_id", "url", "n_chars")

  test("parseUrl extracts scheme/host/path/query (empty when absent)" +
      " and the registered domain honors two-level suffixes") {
    val p = UrlOps.parseUrl(urls, "url")
      .select("doc_id", "url_scheme", "url_host", "url_domain",
        "url_path", "url_query")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getString(3),
          r.getString(4), r.getString(5))).toMap
    p(1L) shouldBe ("https", "www.bbc.co.uk", "bbc.co.uk",
      "/news/uk-12345", "src=rss")
    p(2L) shouldBe ("http", "example.com", "example.com", "/", "")
    p(3L) shouldBe ("https", "a.b.archive.gov.uk", "archive.gov.uk",
      "/path/x", "")
    p(4L) shouldBe ("ftp", "files.example.com", "example.com",
      "/pub", "x=1")
    p(5L) shouldBe ("https", "localhost", "localhost", "/health", "")
    // fragment is not part of path or query
    p(6L) shouldBe ("https", "example.com", "example.com", "/a", "")
  }

  test("registeredDomain is total on degenerate hosts") {
    val d = Seq("x", "co.uk", "a.b.c.d.com").toDF("h")
      .select(UrlOps.registeredDomain(col("h")).as("d"))
      .as[String].collect()
    // single label returns itself; a bare two-level suffix has no
    // third label so the last-2 slice is the whole string
    d shouldBe Array("x", "co.uk", "d.com")
  }

  test("domainRollup counts docs/chars per registered domain with " +
      "exact ppm shares that sum to <= 1e6") {
    val r = UrlOps.domainRollup(urls, "url", "n_chars")
      .orderBy("url_domain").collect()
    val byDom = r.map(x => x.getString(0) ->
      (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    byDom("example.com") shouldBe ((3L, 320L, 500000L))
    byDom("bbc.co.uk") shouldBe ((1L, 100L, 166666L))
    r.map(_.getLong(3)).sum should be <= 1000000L
    r.map(_.getLong(1)).sum shouldBe urls.count()
  }

  test("shardAssign lands every key in [0, n) under both schemes") {
    val a = UrlOps.shardAssign(urls, "doc_id", 7)
      .select("shard_mod", "shard_hrw").collect()
    all(a.map(_.getLong(0))) should (be >= 0L and be < 7L)
    all(a.map(_.getLong(1))) should (be >= 0L and be < 7L)
  }

  test("shardMoveReport: rendezvous moves ~1/m of keys when shards " +
      "grow 10 -> 11 while mod moves ~(m-1)/m, matching brute force") {
    val keys = (0L until 5000L).toDF("k")
    val rep = UrlOps.shardMoveReport(keys, "k", 10, 11).head()
    val nKeys = rep.getAs[Long]("n_keys")
    nKeys shouldBe 5000L
    val mod = rep.getAs[Long]("moved_mod")
    val hrw = rep.getAs[Long]("moved_hrw")
    // brute-force recompute from the same shardAssign definition
    val h = UrlOps.shardAssign(keys, "k", 10)
      .withColumnRenamed("shard_mod", "m10")
      .withColumnRenamed("shard_hrw", "h10")
    val h2 = UrlOps.shardAssign(h, "k", 11)
    val brute = h2.agg(
      sum(when(col("m10") =!= col("shard_mod"), 1L).otherwise(0L)),
      sum(when(col("h10") =!= col("shard_hrw"), 1L).otherwise(0L)))
      .head()
    mod shouldBe brute.getLong(0)
    hrw shouldBe brute.getLong(1)
    // theory: mod keeps only h≡ same (mod 110) keys (1/11); hrw
    // moves only keys the NEW shard wins (1/11 in expectation)
    mod.toDouble / nKeys should be > 0.8
    hrw.toDouble / nKeys should be < 0.15
    hrw should be < mod
  }

  test("stripHtml removes tags, decodes entities in the standard " +
      "order, and collapses whitespace") {
    val html = Seq(
      "<html><body><h1>Hi</h1><p>a &amp; b &lt;c&gt;</p></body></html>",
      "no tags &quot;quoted&quot; &#39;x&#39;",
      "double-encoded: &amp;lt; stays literal",
      "  <br/>  spaced   <b>words</b>  "
    ).toDF("h").select(UrlOps.stripHtml(col("h")).as("t"))
      .as[String].collect()
    html(0) shouldBe "Hi a & b <c>"
    html(1) shouldBe "no tags \"quoted\" 'x'"
    // &amp; decoded LAST: &amp;lt; -> &lt; literal, not <
    html(2) shouldBe "double-encoded: &lt; stays literal"
    html(3) shouldBe "spaced words"
  }

  test("extractLinks returns hrefs in document order; linkGraph " +
      "aggregates domain-level edges") {
    val df = Seq(
      (1L, "https://a.example.com/p",
        """<a href="https://x.data.co.uk/1">1</a><a href="https://y.example.com/2">2</a>"""),
      (2L, "https://b.data.co.uk/q",
        """<a href="https://z.example.com/3">3</a>""")
    ).toDF("id", "url", "html")
    val links = df.select(UrlOps.extractLinks(col("html")).as("l"))
      .as[Seq[String]].collect()
    links(0) shouldBe Seq("https://x.data.co.uk/1",
      "https://y.example.com/2")
    val edges = UrlOps.linkGraph(df, "url", "html")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).toSet
    edges shouldBe Set(
      ("example.com", "data.co.uk", 1L),
      ("example.com", "example.com", 1L),
      ("data.co.uk", "example.com", 1L))
  }

  test("canonicalizeUrl lowercases scheme/host, strips default " +
      "ports and tracking params, sorts the rest, keeps path case") {
    val c = Seq(
      "HTTPS://WWW.Example.COM:443/Path/X?b=2&utm_source=x&a=1",
      "https://www.example.com/Path/X?a=1&b=2",
      "http://site.org:80/",
      "http://site.org/",
      "https://t.co/x?utm_campaign=z&fbclid=abc&ref=rss"
    ).toDF("u").select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .as[String].collect()
    c(0) shouldBe "https://www.example.com/Path/X?a=1&b=2"
    c(0) shouldBe c(1)
    c(2) shouldBe "http://site.org/"
    c(2) shouldBe c(3)
    // all params were tracking -> no '?'
    c(4) shouldBe "https://t.co/x"
  }

  test("urlDedupGroups collapses raw variants onto one canonical " +
      "with a deterministic keeper") {
    val raw = Seq(
      "https://a.com/p?x=1&utm_source=s",
      "HTTPS://A.COM:443/p?x=1",
      "https://a.com/p?x=1",
      "https://b.com/q").toDF("url")
    val g = UrlOps.urlDedupGroups(raw, "url").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    g("https://a.com/p?x=1")._1 shouldBe 3L
    // keeper is the lexicographic min raw variant
    g("https://a.com/p?x=1")._2 shouldBe "HTTPS://A.COM:443/p?x=1"
    g("https://b.com/q")._1 shouldBe 1L
  }

  test("anchorText counts (target domain, anchor) pairs") {
    val df = Seq(
      """<a href="https://x.example.com/1">Example Site</a>
        |<a href="https://y.data.co.uk/2" rel="nofollow">Data</a>
        |<a href="https://z.example.com/3">Example Site</a>"""
        .stripMargin).toDF("html")
    val a = UrlOps.anchorText(df, "html").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    a(("example.com", "Example Site")) shouldBe 2L
    a(("data.co.uk", "Data")) shouldBe 1L
  }

  test("robotsRules parses Disallow lines (ignoring other " +
      "directives and empty disallows) and robotsAllowed gates by " +
      "path prefix per registered domain") {
    val robots = Seq(
      ("example.com",
        "User-agent: *\nDisallow: /private\nDisallow: /tmp\n" +
          "Crawl-delay: 5\nDisallow:\n"),
      ("data.co.uk", "User-agent: *\nDisallow: /\n")
    ).toDF("domain", "robots_txt")
    val rules = UrlOps.robotsRules(robots, "domain", "robots_txt")
    rules.collect().map(r => (r.getString(0), r.getString(1)))
      .toSet shouldBe Set(
        ("example.com", "/private"), ("example.com", "/tmp"),
        ("data.co.uk", "/"))
    val urls = Seq(
      "https://www.example.com/private/x",
      "https://www.example.com/public/x",
      "https://a.data.co.uk/anything",
      "https://other.org/free").toDF("url")
    val gated = UrlOps.robotsAllowed(urls, "url", rules)
      .collect().map(r => r.getAs[String]("url") ->
        (r.getAs[Long]("n_rules_matched"),
          r.getAs[Boolean]("allowed"))).toMap
    gated("https://www.example.com/private/x") shouldBe ((1L, false))
    gated("https://www.example.com/public/x") shouldBe ((0L, true))
    gated("https://a.data.co.uk/anything") shouldBe ((1L, false))
    // domains with no robots rules are allowed
    gated("https://other.org/free") shouldBe ((0L, true))
  }

  test("rendezvous consistency: every key that moves 10 -> 11 moves " +
      "TO the new shard (old winners never reshuffle among themselves)") {
    val keys = (0L until 2000L).toDF("k")
    val h = UrlOps.shardAssign(keys, "k", 10)
      .withColumnRenamed("shard_hrw", "h10").drop("shard_mod")
    val moved = UrlOps.shardAssign(h, "k", 11)
      .filter(col("h10") =!= col("shard_hrw"))
      .select("shard_hrw").distinct().collect()
    moved.map(_.getLong(0)).toSeq shouldBe Seq(10L)
  }
}
