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

  /** Scheme: letters+digits+`+.-` before `://` (schemes are
    * case-insensitive per RFC 3986 — the class accepts both cases;
    * consumers lowercase the extraction). */
  val SchemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"

  /** Authority: everything after `://` up to `/?#` — may still carry
    * `user@` and `:port`; [[registeredDomain]] strips both. */
  val HostRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"

  /** Path: after the authority, up to `?` or `#` (may be empty). */
  val PathRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"

  /** Bare lowercase hostname from an authority component: drop
    * `user@` userinfo (everything up to the LAST `@` — the RFC 3986
    * delimiter), drop `:port` (everything from the first `:`),
    * lowercase (hostnames are case-insensitive; RFC 3986 §3.2.2).
    * Bracketed IPv6 literals (`[::1]:8080`) keep their bracketed
    * host `[::1]` — the first-colon port strip would otherwise
    * collapse them to `[` (RFC 3986 §3.2.2 IP-literal form).
    * Plain substring_index scans, NOT regexes: registeredDomain
    * replicates this subtree several times per call site (Column
    * composition has no let-binding and conditional branches defeat
    * codegen subexpression elimination), so per-copy cost is what
    * the link-graph gates pay per exploded href — regexes here
    * measured ~1.8× on the q457/q459/q460 family. DuckDB replays
    * with split_part (same last-@/first-: semantics; the IPv6
    * branch replays as a starts_with CASE). */
  def hostOfAuthority(auth: Column): Column = {
    val noUser = substring_index(auth, "@", -1)
    when(noUser.startsWith("["),
      lower(concat(substring_index(noUser, "]", 1), lit("]"))))
      .otherwise(lower(substring_index(noUser, ":", 1)))
  }

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
    df.withColumn("url_scheme",
        lower(regexp_extract(u, SchemeRe, 1)))
      .withColumn("url_host",
        hostOfAuthority(regexp_extract(u, HostRe, 1)))
      .withColumn("url_path", regexp_extract(u, PathRe, 1))
      .withColumn("url_query", regexp_extract(u, QueryRe, 1))
      .withColumn("url_domain", registeredDomain(col("url_host")))
  }

  /** Registered domain (site identity) of a hostname: the last two
    * labels, or the last three when the trailing two form a known
    * two-level public suffix (`bbc.co.uk`, not `co.uk`). Total on
    * any input: a host with a single label returns itself. Input may
    * be a raw authority — `user@` and `:port` are stripped and the
    * host lowercased first ([[hostOfAuthority]]), so every call path
    * (domainRollup, linkGraph, robotsAllowed, anchorText) groups
    * `example.com:8080` and `EXAMPLE.com` with `example.com`. */
  def registeredDomain(authority: Column): Column = {
    val labels = split(hostOfAuthority(authority), "\\.")
    val n = size(labels)
    // positive-index slices guarded by greatest() so the expression
    // is total (ANSI mode: element_at(-k) past the front throws)
    val last2 = concat_ws(".", slice(labels, greatest(n - 1, lit(1)), lit(2)))
    val last3 = concat_ws(".", slice(labels, greatest(n - 2, lit(1)), lit(3)))
    when(n >= 3 && last2.isin(TwoLevelSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** Registered domain against a FULL public-suffix table — the
    * production form [[registeredDomain]]'s fixed two-level list
    * stands in for, implementing the complete publicsuffix.org
    * algorithm: plain rules (`co.uk`), WILDCARD rules (`*.ck` —
    * leftmost label matches anything) and EXCEPTION rules
    * (`!www.ck` — beats every other match; its effective suffix is
    * the rule minus the leftmost label). Explode each host's
    * candidate suffixes (its last 1..`maxDepth` label runs) in the
    * three match forms, broadcast-join the rule table, and keep the
    * prevailing rule: exceptions first, then most labels (the PSL
    * precedence). Hosts matching no rule fall back to the
    * last-two-labels heuristic (= the PSL default `*` rule); a host
    * that IS a bare suffix (or single label) returns itself. Adds
    * `reg_domain` to `df`. One bounded explode (≤ 3·maxDepth
    * rows/host) + one broadcast join + one max aggregate — pure
    * map-side at crawl scale. Suffix table: one `suffix` string
    * column (lowercase; `*.`/`!` markers as on publicsuffix.org). */
  def registeredDomainPsl(df: DataFrame, hostCol: String,
      suffixes: DataFrame, maxDepth: Int = 4): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 8,
      s"registeredDomainPsl: maxDepth in [1,8], got $maxDepth")
    val host = hostOfAuthority(col(hostCol))
    val n = size(split(host, "\\."))
    // candidate suffix of depth k = last k labels (k < label count:
    // the whole host is never its own suffix+1)
    val withId = df.withColumn("__host__", host)
      .withColumn("__n__", n)
    val lab = split(col("__host__"), "\\.")
    val nn = size(lab)
    val candK = concat_ws(".",
      slice(lab, greatest(nn - col("__k__") + 1, lit(1)), col("__k__")))
    // wildcard form: leftmost candidate label replaced by '*'
    // (wildcard rules have >= 2 labels, so k = 1 has no form)
    val wildK = when(col("__k__") >= 2, concat(lit("*."),
      concat_ws(".", slice(lab, nn - col("__k__") + 2,
        col("__k__") - 1))))
    val excK = concat(lit("!"), candK)
    // single-label hosts generate NO candidates (sequence(1, 0)
    // would emit a DESCENDING [1, 0] — a k=0 empty suffix — rather
    // than an empty array; the filter keeps the 'k < label count'
    // invariant honest and such hosts fall through to the
    // last-two-labels fallback = the host itself)
    val cand = withId
      .filter(col("__n__") > 1)
      .select(col("__host__"),
        explode(sequence(lit(1),
          least(col("__n__") - 1, lit(maxDepth)))).as("__k__"))
      .select(col("__host__"), col("__k__"),
        explode(array(
          struct(lit(false).as("__exc__"), candK.as("__key__")),
          struct(lit(false).as("__exc__"), wildK.as("__key__")),
          struct(lit(true).as("__exc__"), excK.as("__key__"))))
          .as("__m__"))
      .select(col("__host__"), col("__k__"),
        col("__m__.__exc__").as("__exc__"),
        col("__m__.__key__").as("__key__"))
      .filter(col("__key__").isNotNull)
    // precedence as one integer: exception rules (+1000) beat any
    // label count (k <= 8); among non-exceptions, longest wins
    val matched = cand.join(broadcast(
        suffixes.select(lower(col("suffix")).as("__key__"))),
        Seq("__key__"), "left_semi")
      .groupBy("__host__")
      .agg(max(when(col("__exc__"), col("__k__") + 1000)
        .otherwise(col("__k__"))).as("__best__"))
    // effective suffix length: an exception rule's suffix drops the
    // rule's leftmost label (PSL: "the prevailing exception rule,
    // minus the leftmost label, is the public suffix")
    val slen = when(col("__best__") >= 1000, col("__best__") - 1001)
      .otherwise(col("__best__"))
    withId.join(matched, Seq("__host__"), "left")
      .withColumn("reg_domain",
        when(col("__best__").isNotNull,
          concat_ws(".", slice(split(col("__host__"), "\\."),
            greatest(col("__n__") - slen, lit(1)), slen + 1)))
          .otherwise(concat_ws(".", slice(split(col("__host__"), "\\."),
            greatest(col("__n__") - 1, lit(1)), lit(2)))))
      .drop("__host__", "__n__", "__best__")
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
    * Directive keys match case-insensitively (`(?i)` — RFC 9309 §2.1;
    * real-world files overwhelmingly write `disallow:` lowercase).
    * Simplified single-agent form — production adds per-agent
    * sections; the parse/explode/join shape is identical. */
  def robotsRules(df: DataFrame, domainCol: String,
      robotsTextCol: String): DataFrame =
    // CRLF bodies: normalize \r away BEFORE splitting — Java regex
    // '$' would silently drop a trailing \r that DuckDB RE2 keeps,
    // diverging the extracted prefixes across engines
    df.select(col(domainCol).as("domain"),
        explode(split(regexp_replace(col(robotsTextCol), "\r", ""),
          "\n")).as("__line__"))
      .select(col("domain"),
        regexp_extract(col("__line__"), "(?i)^Disallow: (.+)$", 1)
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

  /** RFC 9309 (Robots Exclusion Protocol) rule parser — the REP-
    * complete sibling of the v1 [[robotsRules]]: both `Allow:` and
    * `Disallow:` directives (keys case-insensitive per §2.1 — the
    * wild writes `disallow:` lowercase), `*` wildcards and the `$`
    * end anchor.
    * Still single-agent (per-agent group selection is a split the
    * same parse applies to). Emits one rule row per directive:
    * (domain, is_allow, pattern, pattern_len, pattern_re) where
    * pattern_re is the portable regex compiled from the REP pattern
    * — metachars escaped (except `*`), `*` → `.*`, a trailing `$`
    * kept as the end anchor, `^` prepended. Character-class-only
    * regex work, identical in Java regex and RE2/DuckDB; empty
    * patterns are dropped (an empty Disallow means allow-all). */
  def robotsRulesRep(df: DataFrame, domainCol: String,
      robotsTextCol: String): DataFrame = {
    val lines = df.select(col(domainCol).as("domain"),
      explode(split(regexp_replace(col(robotsTextCol), "\r", ""),
        "\n")).as("__line__"))
    val dirRe = "(?i)^(Allow|Disallow): *(.*)$"
    val rules = lines.select(col("domain"),
        regexp_extract(col("__line__"), dirRe, 1).as("__dir__"),
        regexp_extract(col("__line__"), dirRe, 2).as("pattern"))
      .filter(col("__dir__") =!= "" && col("pattern") =!= "")
    compileRepPatterns(rules)
  }

  /** RFC 9309 §2.2.1 group selection — the multi-agent completion of
    * [[robotsRulesRep]]: robots bodies carry GROUPS (one or more
    * consecutive `User-agent:` lines followed by their rules); a
    * crawler obeys the groups whose agent token case-insensitively
    * equals its own product token, falling back to the `*` groups
    * when no exact group exists in that file. Returns the same rule
    * schema as [[robotsRulesRep]] (composes with
    * [[robotsAllowedRep]]), already filtered to the rules governing
    * `agent`.
    *
    * Plan: group islands via one per-domain position window (a group
    * starts at a User-agent line not preceded by another User-agent
    * line — robots bodies are KB-bounded per domain, so the window
    * partition is tiny), one (domain, group) flag aggregate, one
    * domain-level any-exact aggregate, joined back. All expression
    * work is the portable regex subset. */
  def robotsRulesRepAgent(df: DataFrame, domainCol: String,
      robotsTextCol: String, agent: String): DataFrame = {
    require(agent.nonEmpty, "robotsRulesRepAgent: agent required")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("domain").orderBy("__pos__")
    val uaRe = "(?i)^User-agent: *(.*)$"
    val dirRe = "(?i)^(Allow|Disallow): *(.*)$"
    val lines = df.select(col(domainCol).as("domain"),
        posexplode(split(regexp_replace(col(robotsTextCol), "\r", ""),
          "\n")).as(Seq("__pos__", "__line__")))
      .withColumn("__ua__",
        lower(trim(regexp_extract(col("__line__"), uaRe, 1))))
      .withColumn("__is_ua__", col("__ua__") =!= "")
    val grouped = lines
      .withColumn("__new_grp__",
        (col("__is_ua__") &&
          !coalesce(lag(col("__is_ua__"), 1).over(w), lit(false)))
          .cast("long"))
      .withColumn("__grp__", sum(col("__new_grp__")).over(w))
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val flags = grouped.filter(col("__is_ua__"))
      .groupBy("domain", "__grp__")
      .agg(max((col("__ua__") === agentLc).cast("long"))
          .as("__exact__"),
        max((col("__ua__") === "*").cast("long")).as("__star__"))
    val anyExact = flags.groupBy("domain")
      .agg(max(col("__exact__")).as("__any_exact__"))
    val govern = flags.join(anyExact, "domain")
      .filter(when(col("__any_exact__") === 1L,
        col("__exact__") === 1L).otherwise(col("__star__") === 1L))
      .select("domain", "__grp__")
    val rules = grouped
      .join(govern, Seq("domain", "__grp__"), "left_semi")
      .select(col("domain"),
        regexp_extract(col("__line__"), dirRe, 1).as("__dir__"),
        regexp_extract(col("__line__"), dirRe, 2).as("pattern"))
      .filter(col("__dir__") =!= "" && col("pattern") =!= "")
    compileRepPatterns(rules)
  }

  /** Shared REP pattern→regex compilation (see [[robotsRulesRep]]):
    * takes (domain, __dir__, pattern) rule rows, emits the full rule
    * schema with pattern_len + pattern_re. */
  private def compileRepPatterns(rules: DataFrame): DataFrame = {
    val anchored = col("pattern").endsWith("$")
    val core = when(anchored,
      expr("substring(pattern, 1, length(pattern) - 1)"))
      .otherwise(col("pattern"))
    val esc = regexp_replace(core, "([.^$+?(){}|\\[\\]\\\\])",
      "\\\\$1")
    val starred = regexp_replace(esc, "\\*", ".*")
    rules.select(col("domain"),
      // directive keys are case-insensitive (RFC 9309 §2.1) — the
      // capture preserves input casing, so compare lowercased
      (lower(col("__dir__")) === "allow").as("is_allow"),
      col("pattern"),
      length(col("pattern")).cast("long").as("pattern_len"),
      concat(lit("^"), starred,
        when(anchored, lit("$")).otherwise(lit(""))).as("pattern_re"))
  }

  /** RFC 9309 robots gate — longest-match precedence over
    * [[robotsRulesRep]] rules: the matched rule with the longest
    * original pattern decides; Allow wins exact-length ties; no
    * match means allowed. The match target is the URL path PLUS the
    * query (`?q=...`) when present, empty path treated as `/` — the
    * REP matching unit. Precedence is encoded as one integer score
    * `2·pattern_len + is_allow` (lexicographic (len, allow) order),
    * so the verdict is `max(score)` parity — pure integer arithmetic
    * any engine replays bit-for-bit. One domain-keyed left join +
    * one groupBy; emits match counts + best_score (-1 = no match)
    * for auditability. */
  def robotsAllowedRep(urls: DataFrame, urlCol: String,
      rules: DataFrame): DataFrame = {
    val path = regexp_extract(col(urlCol), PathRe, 1)
    val query = regexp_extract(col(urlCol), QueryRe, 1)
    val target = concat(
      when(path === "", lit("/")).otherwise(path),
      when(query =!= "", concat(lit("?"), query)).otherwise(lit("")))
    val u = urls.select(col("*"),
      registeredDomain(regexp_extract(col(urlCol), HostRe, 1))
        .as("__dom__"),
      target.as("__target__"))
    val j = u.join(rules.select(col("domain").as("__dom__"),
        col("is_allow"), col("pattern_len"), col("pattern_re")),
      Seq("__dom__"), "left")
    val matched = col("pattern_re").isNotNull &&
      regexp_like(col("__target__"), col("pattern_re"))
    j.groupBy(col(urlCol).as("url"), col("__dom__").as("url_domain"),
        col("__target__").as("match_target"))
      .agg(
        coalesce(max(when(matched, col("pattern_len") * 2 +
          when(col("is_allow"), 1L).otherwise(0L))), lit(-1L))
          .as("best_score"),
        sum(when(matched, 1L).otherwise(0L)).as("n_rules_matched"))
      .withColumn("allowed",
        col("best_score") === -1L || pmod(col("best_score"), lit(2L)) === 1L)
  }

  /** Sitemap directives from robots.txt bodies — `Sitemap:` lines
    * are file-wide (outside any agent group, RFC 9309 §2.4 / the
    * sitemaps.org protocol): one (domain, sitemap_url) row per
    * directive. The crawl-seed discovery primitive. Pure
    * split+extract map. */
  def robotsSitemaps(df: DataFrame, domainCol: String,
      robotsTextCol: String): DataFrame =
    df.select(col(domainCol).as("domain"),
        explode(split(regexp_replace(col(robotsTextCol), "\r", ""),
          "\n")).as("__line__"))
      .select(col("domain"),
        trim(regexp_extract(col("__line__"),
          "(?i)^Sitemap: *(.*)$", 1)).as("sitemap_url"))
      .filter(col("sitemap_url") =!= "")

  /** Parse sitemap XML bodies (sitemaps.org protocol) into one row
    * per `<url>` entry: (domain, loc, lastmod) — the step after
    * [[robotsSitemaps]] discovers the sitemap URLs and the fetcher
    * retrieves them; `loc` feeds the frontier, `lastmod` ('' when
    * absent, the regexp_extract no-match convention) feeds recrawl
    * freshness. Split on `</url>` + per-entry extraction — pure
    * map, character-class-only regex, engine-replayable. Index
    * files (`<sitemapindex>` with `<sitemap><loc>` children) parse
    * with the same extraction (their entries lack `<url>` tags but
    * carry `<loc>` — run the output back through the fetcher). */
  def sitemapUrls(df: DataFrame, domainCol: String,
      xmlCol: String): DataFrame =
    df.select(col(domainCol).as("domain"),
        explode(split(col(xmlCol), "</url>")).as("__e__"))
      .select(col("domain"),
        regexp_extract(col("__e__"), "<loc>([^<]*)</loc>", 1)
          .as("loc"),
        regexp_extract(col("__e__"), "<lastmod>([^<]*)</lastmod>", 1)
          .as("lastmod"))
      .filter(col("loc") =!= "")

  /** Per-domain crawl delay from robots.txt bodies — the de-facto
    * `Crawl-delay:` extension most crawlers honor. Seconds as
    * integers; several directives in one file (per-agent groups in
    * the wild) resolve to the MINIMUM (the conservative bound a
    * polite fetcher obeys). Domains with no directive are absent —
    * left-join and coalesce a default downstream. */
  def robotsCrawlDelay(df: DataFrame, domainCol: String,
      robotsTextCol: String): DataFrame =
    df.select(col(domainCol).as("domain"),
        explode(split(regexp_replace(col(robotsTextCol), "\r", ""),
          "\n")).as("__line__"))
      .select(col("domain"),
        regexp_extract(col("__line__"),
          "(?i)^Crawl-delay: *([0-9]+)$", 1).as("__d__"))
      .filter(col("__d__") =!= "")
      .groupBy("domain")
      .agg(min(col("__d__").cast("long")).as("crawl_delay_s"))

  /** Politeness-constrained fetch schedule — the step between "which
    * URLs may I fetch" (robots gate) and "when do I fetch them":
    * within each registered domain, order URLs by priority (desc,
    * URL asc tiebreak) and space them `crawl_delay_s` apart, so slot
    * k fetches at offset k·delay. `delays` is the
    * [[robotsCrawlDelay]] table; domains without a directive get
    * `defaultDelayS`. One window over the per-domain frontier (a
    * crawl schedules one politeness queue per domain by definition —
    * the partition is the unit of sequential work, never global) +
    * one broadcast-size join. Pure integer output: (url, domain,
    * slot, fetch_offset_s). */
  def crawlSchedule(urls: DataFrame, urlCol: String,
      priorityCol: String, delays: DataFrame,
      defaultDelayS: Long = 2L): DataFrame = {
    require(defaultDelayS >= 0,
      s"defaultDelayS >= 0, got $defaultDelayS")
    val dom = registeredDomain(
      regexp_extract(col(urlCol), HostRe, 1))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("url_domain")
      .orderBy(col(priorityCol).desc, col(urlCol).asc)
    urls.withColumn("url_domain", dom)
      .join(broadcast(delays.select(col("domain").as("url_domain"),
        col("crawl_delay_s"))), Seq("url_domain"), "left")
      .withColumn("slot", row_number().over(w).cast("long") - 1)
      .withColumn("fetch_offset_s", col("slot") *
        coalesce(col("crawl_delay_s"), lit(defaultDelayS)))
      .select(col(urlCol).as("url"), col("url_domain"), col("slot"),
        col("fetch_offset_s"))
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
    // W = 0 (all weights <= 0, or an empty key table): every key
    // gets alloc 0 — guarded explicitly because `div` by zero throws
    // under ANSI mode (and the bonus rank would otherwise hand the
    // whole budget to arbitrary keys)
    val q = keys.crossJoin(broadcast(tot))
      .withColumn("__num__", col("w") * total)
      .withColumn("base", expr(
        "CASE WHEN __W__ > 0 THEN __num__ div __W__ ELSE 0 END"))
      .withColumn("__rem__", expr(
        "CASE WHEN __W__ > 0 THEN __num__ % __W__ ELSE 0 END"))
      .withColumn("__tot_eff__", expr(
        "CASE WHEN __W__ > 0 THEN " + total + "L ELSE 0L END"))
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
        when(col("__rk__") <= col("__tot_eff__") - col("__B__"), 1L)
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

  /** Incremental URL-identity dedup — the URL sibling of
    * Dedup.exactAgainst, run BEFORE any content fetch: every URL in
    * the new frontier batch is flagged `known` when its CANONICAL
    * form ([[canonicalizeUrl]] — tracking params, case, default
    * ports stripped) already exists in the crawled corpus, so a
    * messy refetch link (HTTPS://HOST:443/...?utm_source=...) of an
    * already-crawled page never reaches the fetcher. One
    * canonical-keyed join; the corpus side reduces to its distinct
    * canonical set (persist that table once — every future frontier
    * batch joins against it). Pure map + one bounded shuffle. */
  def urlDedupAgainst(newUrls: DataFrame, corpus: DataFrame,
      urlCol: String): DataFrame = {
    val ck = corpus
      .select(canonicalizeUrl(col(urlCol)).as("url_canonical"))
      .distinct().withColumn("__known__", lit(true))
    newUrls.select(col(urlCol).as("url"),
        canonicalizeUrl(col(urlCol)).as("url_canonical"))
      .join(ck, Seq("url_canonical"), "left")
      .select(col("url"), col("url_canonical"),
        coalesce(col("__known__"), lit(false)).as("known"))
  }

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
