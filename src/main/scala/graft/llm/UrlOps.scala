package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / web-provenance operators for crawl-scale corpus curation
  * (the CommonCrawl pipeline shape: every document carries a source
  * URL; curation groups, caps and audits by registered domain).
  * Mirrors the reference's text-pipeline provenance handling
  * (reference src/text_pipeline, src/dataframe string ops) expressed
  * as pure Spark expressions — every function here is a map-side
  * Column expression (no UDF, no shuffle) so it pushes through
  * whole-stage codegen and scales linearly to a 100 TB crawl.
  *
  * Determinism: parsing is regexp_extract with patterns valid in
  * both Java regex and RE2/DuckDB (character classes only — no
  * lookaround, no backreferences), so the DuckDB oracle replays the
  * exact same extraction; registered-domain suffix logic is pure
  * list arithmetic replayable as SQL.
  */
object UrlOps {

  /** Scheme: letters+digits+`+.-` before `://`. */
  val SchemeRe = "^([a-z][a-z0-9+.-]*)://"

  /** Host (authority): everything after `://` up to `/?#`. */
  val HostRe = "^[a-z][a-z0-9+.-]*://([^/?#]*)"

  /** Path: after the authority, up to `?` or `#` (may be empty). */
  val PathRe = "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"

  /** Query string: after the first `?`, up to `#`. */
  val QueryRe = "\\?([^#]*)"

  /** Two-level public suffixes recognized by [[registeredDomain]].
    * A deliberately small, fixed, documented subset of the public
    * suffix list (the full Mozilla PSL is a data file a production
    * deployment would broadcast-join instead; the operator's shape
    * is identical — this list keeps the oracle self-contained). */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "co.in", "co.kr", "com.mx", "co.nz",
    "com.sg", "co.za")

  /** Parse `urlCol` into url_scheme / url_host / url_path /
    * url_query columns (empty string where the component is absent,
    * matching regexp_extract semantics in both engines) and
    * url_domain, the registered domain of the host. Pure map. */
  def parseUrl(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    df.withColumn("url_scheme", regexp_extract(u, SchemeRe, 1))
      .withColumn("url_host", regexp_extract(u, HostRe, 1))
      .withColumn("url_path", regexp_extract(u, PathRe, 1))
      .withColumn("url_query", regexp_extract(u, QueryRe, 1))
      .withColumn("url_domain", registeredDomain(col("url_host")))
  }

  /** Registered domain (site identity) of a hostname: the last two
    * labels, or the last three when the trailing two form a known
    * two-level public suffix (`bbc.co.uk`, not `co.uk`). Total on
    * any input: a host with a single label returns itself. */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    // positive-index slices guarded by greatest() so the expression
    // is total (ANSI mode: element_at(-k) past the front throws)
    val last2 = concat_ws(".", slice(labels, greatest(n - 1, lit(1)), lit(2)))
    val last3 = concat_ws(".", slice(labels, greatest(n - 2, lit(1)), lit(3)))
    when(n >= 3 && last2.isin(TwoLevelSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** Per-registered-domain corpus rollup — the first audit any
    * crawl curation runs: documents, bytes and corpus share by
    * site. One groupBy shuffle on the domain plus a broadcast 1-row
    * total; share in exact ppm (integer div, replayable). */
  def domainRollup(df: DataFrame, urlCol: String,
      charsCol: String): DataFrame = {
    val parsed = parseUrl(df, urlCol)
      .select(col("url_domain"), col(charsCol).cast("long").as("__c__"))
    val per = parsed.groupBy("url_domain").agg(
      count(lit(1)).as("n_docs"),
      sum(col("__c__")).as("n_chars_total"))
    val tot = per.agg(sum(col("n_docs")).as("__t__"))
    per.crossJoin(broadcast(tot))
      .select(col("url_domain"), col("n_docs"), col("n_chars_total"),
        expr("n_docs * 1000000 div __t__").as("docs_ppm"))
  }

  /** HTML entity decode order — `&amp;` LAST so `&amp;lt;` decodes
    * to the literal `&lt;`, not `<` (the standard single-pass rule).
    * Shared with the oracle SQL, which replays the same sequence. */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Strip HTML to text: remove tags (each replaced by a space so
    * adjacent words don't fuse), decode the common entities in the
    * fixed [[HtmlEntities]] order, collapse whitespace. Pure
    * regexp_replace chain — map-side, codegen'd, and replayable by
    * any engine with the same patterns. A crawl-cleaning primitive,
    * not a full parser: script/style CONTENT survives tag removal
    * (the boilerplate scorer downstream handles that). */
  def stripHtml(c: Column): Column = {
    val noTags = regexp_replace(c, "<[^>]*>", " ")
    val decoded = HtmlEntities.foldLeft(noTags) {
      case (acc, (from, to)) => regexp_replace(acc, from, to)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** All href link targets in an HTML column (double-quoted form),
    * in document order — the edge generator for crawl web graphs. */
  def extractLinks(c: Column): Column =
    regexp_extract_all(c, lit("href=\"([^\"]*)\""), lit(1))

  /** Domain-level web graph from an HTML corpus: one edge
    * (src_domain → dst_domain, count) per link, where src is the
    * registered domain of the page's own URL and dst of each href
    * target. One explode + one groupBy — the PageRank/HITS input
    * builder at crawl scale. */
  def linkGraph(df: DataFrame, urlCol: String,
      htmlCol: String): DataFrame = {
    val srcHost = regexp_extract(col(urlCol), HostRe, 1)
    val dstHost = regexp_extract(col("__link__"), HostRe, 1)
    df.select(registeredDomain(srcHost).as("src_domain"),
        explode(extractLinks(col(htmlCol))).as("__link__"))
      .select(col("src_domain"),
        registeredDomain(dstHost).as("dst_domain"))
      .groupBy("src_domain", "dst_domain")
      .agg(count(lit(1)).as("n_links"))
  }

  /** Parse robots.txt bodies into (domain, disallow_prefix) rules:
    * split lines, keep `Disallow:` directives, drop empty prefixes
    * (an empty Disallow means allow-all in the robots protocol).
    * Simplified single-agent form — production adds per-agent
    * sections; the parse/explode/join shape is identical. */
  def robotsRules(df: DataFrame, domainCol: String,
      robotsTextCol: String): DataFrame =
    df.select(col(domainCol).as("domain"),
        explode(split(col(robotsTextCol), "\n")).as("__line__"))
      .select(col("domain"),
        regexp_extract(col("__line__"), "^Disallow: (.+)$", 1)
          .as("disallow_prefix"))
      .filter(col("disallow_prefix") =!= "")

  /** Robots gate over a URL table: a URL is allowed iff NO
    * disallow prefix of its registered domain prefixes its path
    * (simplified longest-match-free semantics — prefix match only,
    * like the original 1994 protocol). One domain-keyed left join +
    * one groupBy; emits the matched-rule count for auditability
    * (the q388 loud-drop convention). */
  def robotsAllowed(urls: DataFrame, urlCol: String,
      rules: DataFrame): DataFrame = {
    val host = regexp_extract(col(urlCol), HostRe, 1)
    val path = regexp_extract(col(urlCol), PathRe, 1)
    val u = urls.select(col("*"),
      registeredDomain(host).as("__dom__"), path.as("__path__"))
    u.join(rules.select(col("domain").as("__dom__"),
          col("disallow_prefix")), Seq("__dom__"), "left")
      .groupBy(col(urlCol).as("url"), col("__dom__").as("url_domain"),
        col("__path__").as("url_path"))
      .agg(sum(when(col("disallow_prefix").isNotNull &&
          col("__path__").startsWith(col("disallow_prefix")), 1L)
          .otherwise(0L)).as("n_rules_matched"))
      .withColumn("allowed", col("n_rules_matched") === 0L)
  }

  /** Largest-remainder (Hamilton) apportionment — allocate an
    * integer budget of `total` slots across keys proportionally to
    * integer weights, exactly: base = floor(total·w/W) per key, the
    * leftover slots go to the largest fractional remainders
    * (tie: key order). The crawl-budget / sampling-quota / shard-
    * sizing primitive; entirely integer arithmetic (remainders
    * compared as total·w mod W — no floats), so any engine replays
    * it bit-for-bit. One aggregate + one ranking window over the
    * KEY table (not the data). Keys with weight ≤ 0 get 0. */
  def apportion(df: DataFrame, keyCol: String, weightCol: String,
      total: Long): DataFrame = {
    require(total >= 0, s"total >= 0, got $total")
    val w = when(col(weightCol).cast("long") > 0,
      col(weightCol).cast("long")).otherwise(lit(0L))
    val keys = df.select(col(keyCol).as("key"), w.as("__w__"))
      .groupBy("key").agg(sum(col("__w__")).as("w"))
    val tot = keys.agg(sum(col("w")).as("__W__"))
    val q = keys.crossJoin(broadcast(tot))
      .withColumn("__num__", col("w") * total)
      .withColumn("base", expr("__num__ div __W__"))
      .withColumn("__rem__", expr("__num__ % __W__"))
    val wnd = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem__").desc, col("key").asc)
    // the ranking window runs over the KEY table (bounded — domains
    // /shards/strata), not the data rows; PlanLint's global-window
    // rule is about row-scale windows
    val ranked = q.withColumn("__rk__", row_number().over(wnd))
      .crossJoin(broadcast(
        q.agg(sum(col("base")).as("__B__"))))
    ranked.select(col("key"), col("w"),
        col("base"),
        when(col("__rk__") <= lit(total) - col("__B__"), 1L)
          .otherwise(0L).as("bonus"))
      .withColumn("alloc", col("base") + col("bonus"))
  }

  /** D'Hondt (Jefferson) divisor apportionment — the proportional
    * allocation sibling of [[apportion]] that slightly favors large
    * weights (the PR-election method): the `total` slots go to the
    * `total` largest quotients w/d over d = 1..total, ties broken
    * (key asc, d asc). Explodes total divisors per key — use for
    * bounded key tables and budgets (domains × fetch slots), where
    * keys·total stays small; Hamilton [[apportion]] is the O(keys)
    * form. Quotients are IEEE doubles computed identically in any
    * engine, so the ranking replays exactly. */
  def apportionDHondt(df: DataFrame, keyCol: String,
      weightCol: String, total: Int): DataFrame = {
    require(total >= 1 && total <= 100000,
      s"total in [1,100000], got $total")
    val w = when(col(weightCol).cast("long") > 0,
      col(weightCol).cast("long")).otherwise(lit(0L))
    val keys = df.select(col(keyCol).as("key"), w.as("__w__"))
      .groupBy("key").agg(sum(col("__w__")).as("w"))
      .filter(col("w") > 0)
    val quo = keys
      .withColumn("d", explode(sequence(lit(1), lit(total))))
      .withColumn("__q__", col("w").cast("double") / col("d"))
    val wnd = org.apache.spark.sql.expressions.Window
      .orderBy(col("__q__").desc, col("key").asc, col("d").asc)
    quo.withColumn("__rk__", row_number().over(wnd))
      .filter(col("__rk__") <= total)
      .groupBy("key").agg(first(col("w")).as("w"),
        count(lit(1)).as("seats"))
  }

  /** Tracking query parameters dropped by [[canonicalizeUrl]] —
    * the common cross-site analytics keys. Shared with the oracle. */
  val TrackingParamRe = "^(utm_[^=]*|fbclid|gclid|ref|mc_cid|mc_eid)="

  /** URL canonicalization — the dedup-by-URL primitive a crawl runs
    * BEFORE content dedup (two fetches of the same page differ only
    * in tracking params / case / default ports): lowercase scheme
    * and host, drop default :80/:443 ports, drop the fragment, drop
    * tracking params ([[TrackingParamRe]]), sort the surviving query
    * params, omit the '?' when nothing survives. Pure expression
    * chain (split / filter / array_sort / concat) — map-side and
    * engine-replayable. Paths keep their case (they are
    * case-sensitive); empty path stays empty (host-only URLs compare
    * equal with or without the trailing slash convention upstream). */
  def canonicalizeUrl(u: Column): Column = {
    // scheme/host are case-insensitive: extract them from the
    // lowercased URL (the lowercase-only parse regexes would miss
    // 'HTTPS://'); path and query keep their original case
    val lu = lower(u)
    val scheme = regexp_extract(lu, SchemeRe, 1)
    val hostPort = regexp_extract(lu, HostRe, 1)
    val host = regexp_replace(hostPort, ":(80|443)$", "")
    val path = regexp_extract(u,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(u, QueryRe, 1)
    val kept = array_sort(filter(split(query, "&"),
      p => length(p) > 0 && !p.rlike(TrackingParamRe)))
    val qs = when(size(kept) > 0,
      concat(lit("?"), concat_ws("&", kept))).otherwise(lit(""))
    concat(scheme, lit("://"), host, path, qs)
  }

  /** URL-level dedup groups: canonicalize, group, and report every
    * canonical URL with more than one raw variant plus the keeper
    * (min raw URL — a deterministic survivor rule). One groupBy. */
  def urlDedupGroups(df: DataFrame, urlCol: String): DataFrame =
    df.select(canonicalizeUrl(col(urlCol)).as("url_canonical"),
        col(urlCol).as("__raw__"))
      .groupBy("url_canonical")
      .agg(count(lit(1)).as("n_variants"),
        min(col("__raw__")).as("keeper"))

  /** Anchor texts with their link targets: one row per
    * `<a href="...">text</a>` in document order. */
  def extractAnchors(c: Column): Column =
    regexp_extract_all(c,
      lit("<a href=\"([^\"]*)\"[^>]*>([^<]*)</a>"), lit(0))

  /** Robots/meta crawl directives from raw HTML — the keep/drop and
    * canonical-identity signals a crawler must honor before any
    * content processing: noindex / nofollow flags (robots meta) and
    * the `<link rel="canonical">` target ('' when absent, the
    * regexp_extract no-match convention). Pure map. Feed
    * url_canonical from [[canonicalizeUrl]] with the canonical-link
    * override for the full dedup-identity story. */
  def metaDirectives(df: DataFrame, htmlCol: String): DataFrame = {
    val h = col(htmlCol)
    df.withColumn("meta_noindex",
        h.rlike("<meta name=\"robots\" content=\"[^\"]*noindex"))
      .withColumn("meta_nofollow",
        h.rlike("<meta name=\"robots\" content=\"[^\"]*nofollow"))
      .withColumn("canonical_href", regexp_extract(h,
        "<link rel=\"canonical\" href=\"([^\"]*)\"", 1))
  }

  /** Per-target-domain anchor-text table — anchor text is the
    * classic off-page relevance signal (what OTHER pages call this
    * site): counts each (dst_domain, anchor text) pair. One explode
    * + one groupBy. */
  def anchorText(df: DataFrame, htmlCol: String): DataFrame = {
    val a = col("__a__")
    val href = regexp_extract(a, "<a href=\"([^\"]*)\"", 1)
    val txt = regexp_extract(a, ">([^<]*)</a>", 1)
    val dstHost = regexp_extract(href, HostRe, 1)
    df.select(explode(extractAnchors(col(htmlCol))).as("__a__"))
      .select(registeredDomain(dstHost).as("dst_domain"),
        txt.as("anchor"))
      .groupBy("dst_domain", "anchor")
      .agg(count(lit(1)).as("n"))
  }

  /** 48-bit md5 key hash (the repo's portable lottery primitive,
    * integer form — see PipelineOps.hash48Unit). */
  def h48Long(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long")

  /** Per-key rendezvous weights h(key, shard) for shards 0..n-1
    * (Thaler & Ravishankar 1998 highest-random-weight hashing). */
  private def hrwWeights(keyCol: String, n: Int): Column =
    array((0 until n).map(sIdx => h48Long(
      concat(col(keyCol).cast("string"), lit("#shard"),
        lit(sIdx.toString)))): _*)

  /** Deterministic shard assignment for writing an N-shard corpus:
    * `mod` scheme (h % n — one hash, but reshuffles ~(m−1)/m of keys
    * when the count changes) and `hrw` scheme (rendezvous hashing —
    * argmax over per-shard weights; growing n → m moves exactly the
    * keys whose new shards win, ~(m−n)/m, the consistent-hashing
    * property). Pure map, O(n) hashes per key under hrw — the right
    * trade when re-bucketing a 100 TB corpus costs days of IO.
    * Replayable anywhere (md5 arithmetic only). */
  def shardAssign(df: DataFrame, keyCol: String, n: Int): DataFrame = {
    require(n >= 1, s"shardAssign needs n >= 1, got $n")
    val h = h48Long(col(keyCol))
    val w = hrwWeights(keyCol, n)
    df.withColumn("shard_mod", pmod(h, lit(n.toLong)))
      .withColumn("shard_hrw",
        (array_position(w, array_max(w)) - 1).cast("long"))
  }

  /** Resharding audit: how many keys move when the shard count grows
    * n → m, under both schemes — the quantified argument for
    * rendezvous sharding at re-bucket time. One aggregate over the
    * distinct keys; exact ppm. */
  def shardMoveReport(df: DataFrame, keyCol: String, n: Int,
      m: Int): DataFrame = {
    require(n >= 1 && m >= 1 && n != m,
      s"shardMoveReport needs distinct shard counts >= 1, got $n -> $m")
    val h = h48Long(col(keyCol))
    val wN = hrwWeights(keyCol, n)
    val wM = hrwWeights(keyCol, m)
    val keys = df.select(col(keyCol)).distinct().select(
      h.as("__h__"),
      (array_position(wN, array_max(wN)) - 1).as("__hrw_n__"),
      (array_position(wM, array_max(wM)) - 1).as("__hrw_m__"))
    val agg = keys.agg(
      count(lit(1)).as("n_keys"),
      sum(when(pmod(col("__h__"), lit(n.toLong)) =!=
        pmod(col("__h__"), lit(m.toLong)), 1L).otherwise(0L))
        .as("moved_mod"),
      sum(when(col("__hrw_n__") =!= col("__hrw_m__"), 1L)
        .otherwise(0L)).as("moved_hrw"))
    agg.select(lit(n).cast("long").as("n_from"),
      lit(m).cast("long").as("n_to"), col("n_keys"),
      col("moved_mod"),
      expr("moved_mod * 1000000 div n_keys").as("moved_mod_ppm"),
      col("moved_hrw"),
      expr("moved_hrw * 1000000 div n_keys").as("moved_hrw_ppm"))
  }
}
