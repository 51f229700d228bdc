"""URL canonicalization and domain operators for crawl pipelines.

Every large-scale corpus pipeline keys on URLs long before it keys on
content: exact URL dedup across crawl generations, per-domain mixing
quotas, domain blocklists, and "same page, different tracking params"
collapse (C4 dedupes by URL; CCNet buckets by domain).  These are the
scan-level expression versions:

- :func:`url_parts` — scheme/host/port/path/query plus the registered
  domain and TLD;
- :func:`normalize_url_expr` / :func:`normalize_urls` — the canonical
  form (lowercased scheme+host, default ports and fragments stripped,
  tracking parameters dropped, remaining query params sorted);
- :func:`domain_stats` — docs per registered domain with corpus share.

Everything is built-in column expressions (regexp + array HOFs, zero
UDFs, zero shuffles except ``domain_stats``'s one groupBy), and every
rule is engine-portable so a DuckDB twin replays it verbatim — the
deliberate alternative to ``F.parse_url`` (java.net.URI semantics
differ from any SQL replay on malformed input; one regexp definition
on both sides can never diverge).

Registered-domain note: the real public-suffix list is a large,
changing data file; this module uses the standard two-label heuristic
plus the common second-level set (co/com/net/org/ac/gov/edu under
two-letter country TLDs — co.uk, com.au, ...), documented as such.
Pipelines needing the full PSL should join one in as a table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query parameters stripped by normalization: click/campaign tracking
#: identifiers that fragment URL-dedup keys without changing content
TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "msclkid", "mc_eid",
                   "igshid")

#: second-level labels that act as TLD extensions under two-letter
#: country codes (the high-frequency public-suffix subset)
SECOND_LEVEL = ("co", "com", "net", "org", "ac", "gov", "edu")

_AUTH = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"


def _host_expr(url: Column) -> Column:
    """Lowercased host: authority minus userinfo and port, trailing
    dot stripped."""
    auth = F.regexp_extract(url, _AUTH, 1)
    no_user = F.regexp_replace(auth, r"^.*@", "")
    no_port = F.regexp_replace(no_user, r":\d*$", "")
    return F.regexp_replace(F.lower(no_port), r"\.$", "")


def registered_domain_expr(host: Column) -> Column:
    """Registered domain from a (lowercased) host: the last two labels,
    or three when the second-to-last is a :data:`SECOND_LEVEL` label
    under a two-letter TLD (``a.b.co.uk`` -> ``b.co.uk``)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    tld = F.element_at(labels, -1)
    second = F.when(n >= 2, F.element_at(labels, -2))
    take3 = ((n >= 3) & (F.length(tld) == 2)
             & second.isin(*SECOND_LEVEL))
    return (F.when(n <= 1, host)
            .when(take3, F.concat_ws(".", F.element_at(labels, -3),
                                     second, tld))
            .otherwise(F.concat_ws(".", second, tld)))


def url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``scheme, host, port, path, query, registered_domain, tld``
    parsed from ``url_col`` — scan-level regexp extraction, no UDF, no
    shuffle.  ``port`` is NULL when absent; ``path`` defaults to ``/``
    for authority-only URLs; unparseable rows get NULL host."""
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(
        url, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1))
    host = _host_expr(url)
    port = F.nullif(F.regexp_extract(
        F.regexp_replace(F.regexp_extract(url, _AUTH, 1), r"^.*@", ""),
        r":(\d+)$", 1), F.lit("")).cast("int")
    after = F.regexp_replace(url, _AUTH, "")     # strip scheme://auth
    path = F.regexp_extract(after, r"^([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(after, r"\?([^#]*)", 1)
    nn = F.nullif(host, F.lit(""))
    return (df.withColumn("scheme", F.nullif(scheme, F.lit("")))
            .withColumn("host", nn)
            .withColumn("port", port)
            .withColumn("path", F.when(nn.isNotNull(), path))
            .withColumn("query", F.when(nn.isNotNull(), query))
            .withColumn("registered_domain",
                        F.when(nn.isNotNull(),
                               registered_domain_expr(nn)))
            .withColumn("tld", F.when(
                nn.isNotNull(),
                F.element_at(F.split(nn, r"\."), -1))))


def normalize_url_expr(url_col: str = "url",
                       strip_params: tuple[str, ...] = TRACKING_PARAMS
                       ) -> Column:
    """Canonical URL as one expression: lowercase scheme and host, drop
    userinfo, strip the scheme's default port (80/http, 443/https),
    drop the fragment, remove :data:`TRACKING_PARAMS` query parameters
    (prefix match for ``utm_``-style families, exact key match
    otherwise), sort the surviving parameters byte-wise, and default an
    empty path to ``/``.  Two crawl records of the same page with
    different click-tracking decorations collapse to one key."""
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(
        url, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1))
    host = _host_expr(url)
    auth = F.regexp_replace(F.regexp_extract(url, _AUTH, 1), r"^.*@", "")
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    keep_port = ((port != "")
                 & ~((scheme == "http") & (port == "80"))
                 & ~((scheme == "https") & (port == "443")))
    after = F.regexp_replace(url, _AUTH, "")
    path = F.regexp_extract(after, r"^([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(after, r"\?([^#]*)", 1)
    params = F.filter(F.split(query, "&"), lambda p: p != F.lit(""))

    def _tracked(p: Column) -> Column:
        cond = F.lit(False)
        for t in strip_params:
            if t.endswith("_"):
                cond = cond | p.startswith(t)
            else:
                cond = cond | (p == t) | p.startswith(t + "=")
        return cond

    kept = F.array_sort(F.filter(params, lambda p: ~_tracked(p)))
    qs = F.when(F.size(kept) > 0,
                F.concat(F.lit("?"), F.array_join(kept, "&"))) \
        .otherwise(F.lit(""))
    # unparseable input (no scheme://host) canonicalizes to NULL, not
    # to a half-built string that would collide dedup keys
    return F.when((scheme != "") & (host != ""),
                  F.concat(scheme, F.lit("://"), host,
                           F.when(keep_port,
                                  F.concat(F.lit(":"), port))
                           .otherwise(F.lit("")),
                           path, qs))


def normalize_urls(df: DataFrame, url_col: str = "url",
                   out_col: str = "url_norm",
                   strip_params: tuple[str, ...] = TRACKING_PARAMS
                   ) -> DataFrame:
    """Frame form of :func:`normalize_url_expr`."""
    return df.withColumn(out_col, normalize_url_expr(url_col,
                                                     strip_params))


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Docs per registered domain with corpus share — the domain-mixing
    / blocklist audit table.  One groupBy on the domain (map-side
    combinable); the total joins back as a broadcast 1-row aggregate,
    never a corpus-wide window."""
    host = F.nullif(_host_expr(F.col(url_col)), F.lit(""))
    dom = F.when(host.isNotNull(), registered_domain_expr(host))
    per = (df.select(dom.alias("registered_domain"))
           .groupBy("registered_domain")
           .agg(F.count("*").alias("n_docs")))
    total = per.agg(F.sum("n_docs").alias("__t"))
    return (per.crossJoin(F.broadcast(total))
            .select("registered_domain", "n_docs",
                    F.round(F.col("n_docs") / F.col("__t"), 6)
                    .alias("share")))


# ---------------------------------------------------------------------------
# robots.txt (Robots Exclusion Protocol, RFC 9309)
# ---------------------------------------------------------------------------

def parse_robots(df: DataFrame, robots_col: str = "robots_txt",
                 host_col: str = "host") -> DataFrame:
    """Parse robots.txt bodies into one row per (host, agent, rule).

    RFC 9309 grammar, scan-level expressions only: lines split, comments
    stripped, ``user-agent`` / ``allow`` / ``disallow`` keys matched
    case-insensitively; CONSECUTIVE user-agent lines share the group of
    rules that follows them (a user-agent line preceded by a non-UA line
    starts a new group).  Output columns: ``host, agent`` (lowercased
    token), ``rule`` (allow|disallow), ``pattern``, ``line_no``.

    A group with UA lines but NO rules still emits one row with NULL
    rule/pattern — group EXISTENCE must survive, because RFC group
    selection says a matched specific group (even an empty one,
    meaning "everything allowed") shadows the ``*`` group.

    Empty-value rules (``Disallow:`` with nothing after the colon) are
    RFC no-ops and are dropped; ``sitemap``/``crawl-delay`` and other
    non-group keys are ignored here.

    Scale: one window per host over the parsed LINES of that host's
    robots.txt (a few hundred rows each — the partition is the file,
    never the corpus); everything else is scan-level.
    """
    from pyspark.sql import Window

    host = F.lower(F.col(host_col))
    lines = (df.select(host.alias("host"),
                       F.posexplode(F.split(F.col(robots_col),
                                            r"\r?\n"))
                       .alias("line_no", "line"))
             .withColumn("clean",
                         F.trim(F.regexp_replace("line", r"#.*$", "")))
             .withColumn("key", F.lower(F.regexp_extract(
                 "clean", r"^([A-Za-z-]+)\s*:", 1)))
             .withColumn("value", F.trim(F.regexp_replace(
                 "clean", r"^[A-Za-z-]+\s*:", ""))))
    sig = lines.where(F.col("key").isin("user-agent", "allow",
                                        "disallow"))
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = F.col("key") == "user-agent"
    new_group = is_ua & (~F.coalesce(F.lag(is_ua).over(w),
                                     F.lit(False)))
    grouped = sig.withColumn(
        "group_id",
        F.sum(new_group.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    # agent×rule expansion WITHOUT the old agents⋈rules self-join
    # (r15): the join re-exchanged both sides of an already
    # host-partitioned frame by (host, group_id) — two extra
    # exchanges of stage latency per consumer for a per-host frame.
    # A whole-group window (clustering (host, group_id) is satisfied
    # by the host partitioning — no new exchange) collects the
    # group's agent list once; each rule row then explodes it, and a
    # UA row of a RULELESS group explodes just itself with NULL
    # rule/pattern/line_no — exactly the old LEFT join's row multiset
    # (duplicate UA lines kept by collect_list, list order
    # irrelevant: the output is one row per (UA line × rule)).
    wg = Window.partitionBy("host", "group_id")
    is_rule = ~is_ua & (F.col("value") != "")
    aug = grouped.select(
        "host", "key", "value", "line_no", is_rule.alias("__is_rule"),
        F.collect_list(F.when(is_ua, F.lower(F.col("value"))))
        .over(wg).alias("__agents"),
        F.count(F.when(is_rule, 1)).over(wg).alias("__n_rules"))
    arr = (F.when(F.col("__is_rule"), F.col("__agents"))
           .when(is_ua & (F.col("__n_rules") == 0),
                 F.array(F.lower(F.col("value"))))
           .otherwise(F.array().cast("array<string>")))
    keep = F.col("__is_rule")
    return (aug.select(
        "host", F.explode(arr).alias("agent"),
        F.when(keep, F.col("key")).alias("rule"),
        F.when(keep, F.col("value")).alias("pattern"),
        F.when(keep, F.col("line_no")).alias("line_no")))


def _rep_like_pattern(pattern: Column) -> Column:
    """REP path pattern -> SQL LIKE pattern with ESCAPE '!'.

    REP wildcards are glob-shaped: ``*`` matches any run, a TRAILING
    ``$`` anchors the end, everything else is literal, and a pattern
    without ``$`` matches any path it PREFIXES.  LIKE replays that
    exactly — escape ``!``/``%``/``_``, map ``*`` to ``%``, and append
    ``%`` unless $-anchored — and, unlike a regex translation, the
    escape rules are byte-identical in Spark and DuckDB (no
    backslash-literal divergence).
    """
    anchored = pattern.endswith("$")
    core = F.when(anchored,
                  pattern.substr(F.lit(1), F.length(pattern) - 1)) \
        .otherwise(pattern)
    esc = F.replace(F.replace(F.replace(core, F.lit("!"), F.lit("!!")),
                              F.lit("%"), F.lit("!%")),
                    F.lit("_"), F.lit("!_"))
    globd = F.replace(esc, F.lit("*"), F.lit("%"))
    return F.when(anchored, globd).otherwise(F.concat(globd,
                                                      F.lit("%")))


def select_robots_group(rules: DataFrame, agent: str) -> DataFrame:
    """RFC 9309 group selection: keep only the rules of the MOST
    SPECIFIC matching user-agent per host.

    A group matches when its agent token is ``*`` or is a substring of
    the crawler's product token (case-insensitive — the
    ``urllib.robotparser`` convention); specificity is the token
    length, with ``*`` at 0, so any specific match shadows the ``*``
    group — including an EMPTY specific group (its NULL-pattern row
    carries the specificity and imposes no rules = everything
    allowed).  One tiny groupBy over the RULES frame (rows ~ robots
    lines, never the URL corpus).
    """
    from pyspark.sql import Window

    tok = F.lit(agent.lower())
    matched = rules.where((F.col("agent") == "*")
                          | (F.instr(tok, F.col("agent")) > 0))
    spec = F.when(F.col("agent") == "*", F.lit(0)) \
        .otherwise(F.length("agent"))
    # per-host max as an unordered window (one shuffle, no self-join);
    # the partition is one host's robots lines, never the corpus
    best = F.max(spec).over(Window.partitionBy("host"))
    return (matched.withColumn("__best", best)
            .where(spec == F.col("__best"))
            .drop("__best"))


def robots_filter(df: DataFrame, rules: DataFrame, agent: str = "*",
                  url_col: str = "url",
                  out_col: str = "robots_allowed",
                  broadcast_rules: bool = True) -> DataFrame:
    """Add ``out_col``: may ``agent`` fetch each row's URL under the
    corpus's robots rules?  The crawl-frontier / corpus-compliance
    filter (licensing audits re-check robots AFTER the crawl too).

    RFC 9309 decision: among the selected group's rules whose pattern
    matches the URL's path+query, the LONGEST pattern wins, allow
    winning length ties; no matching rule, no matching group, or no
    robots.txt for the host means allowed.

    Scale shape: group selection is one per-host window over the rules
    frame; the match itself runs on the DISTINCT (host, path) keys —
    one distinct + one join back, so a billion-URL corpus with the
    usual heavy URL duplication pays the rule fan-out once per
    distinct path.  The selected-rules side is robots-corpus-sized
    (lines x hosts, orders of magnitude below the URL corpus) and is
    broadcast by default; pass ``broadcast_rules=False`` when the
    robots corpus itself is too large to ship to every executor.
    """
    url = F.col(url_col)
    host = F.nullif(_host_expr(url), F.lit(""))
    after = F.regexp_replace(url, _AUTH, "")
    path = F.regexp_extract(after, r"^([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(after, r"\?([^#]*)", 1)
    mpath = F.concat(path, F.when(query != "",
                                  F.concat(F.lit("?"), query))
                     .otherwise(F.lit("")))

    sel = (select_robots_group(rules, agent)
           .where(F.col("pattern").isNotNull())
           .select(F.col("host").alias("__rhost"),
                   F.col("rule"), F.col("pattern"),
                   _rep_like_pattern(F.col("pattern"))
                   .alias("__like")))
    if broadcast_rules:
        sel = F.broadcast(sel)
    keys = (df.select(host.alias("__host"), mpath.alias("__mpath"))
            .where(F.col("__host").isNotNull()).distinct())
    # longest-pattern-wins with allow breaking ties, encoded as ONE
    # long (length*2 + allow) so the aggregate is a plain max: a
    # struct-keyed max_by is immutable-buffered and forces the whole
    # corpus-keyed aggregate into SortAggregate (sort per exchange
    # side) where max(long) hash-aggregates with map-side combine
    rank = (F.length("pattern").cast("long") * 2
            + (F.col("rule") == "allow").cast("long"))
    hits = (keys.join(sel, keys["__host"] == sel["__rhost"])
            .where(F.expr("__mpath LIKE __like ESCAPE '!'"))
            .groupBy("__host", "__mpath")
            .agg((F.max(rank) % 2 == 1).alias("__allowed")))
    out = (df.withColumn("__host", host).withColumn("__mpath", mpath)
           .join(hits, ["__host", "__mpath"], "left")
           .withColumn(out_col, F.coalesce("__allowed", F.lit(True)))
           .drop("__host", "__mpath", "__allowed"))
    return out


# ---------------------------------------------------------------------------
# link extraction, sitemaps, link graph
# ---------------------------------------------------------------------------

_HREF_RE = r"""(?i)<a[^>]*\shref\s*=\s*["']?([^"'#>\s]+)"""


def extract_links(df: DataFrame, html_col: str = "html",
                  base_col: str = "url") -> DataFrame:
    """One row per ``<a href>`` link: raw ``href`` plus ``link_url``
    resolved against the row's base URL — the crawl-frontier /
    link-graph extraction step.

    Resolution is the scan-level subset of RFC 3986 a link graph
    needs: absolute http(s) kept, protocol-relative ``//host/..``
    gets the base scheme, root-relative ``/path`` gets scheme://host,
    other relative paths resolve against the base URL's directory
    (no ``..`` normalization — graph keys tolerate it);
    ``javascript:``/``mailto:``/``data:``/``tel:`` and
    fragment-only hrefs are dropped by the extraction regex or the
    scheme filter.  Pure regexp + explode, zero UDFs, zero shuffles.

    The base-URL derivations (scheme, origin-with-port, directory)
    are materialized as columns BEFORE the explode — inlined into the
    resolution ``when`` chain they would re-run their regexps per
    LINK instead of per page (measured 1.5x on the sf0.1 row when the
    r12 port rule landed inlined).
    """
    base = F.col(base_col)
    scheme = F.lower(F.regexp_extract(
        base, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1))
    after = F.regexp_replace(base, _AUTH, "")
    path = F.regexp_extract(after, r"^([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # an explicit non-default port in the base authority must survive
    # into resolved relative links (https://h:8080/a + /x ->
    # https://h:8080/x) — same keep_port rule as normalize_url_expr
    auth = F.regexp_replace(F.regexp_extract(base, _AUTH, 1),
                            r"^.*@", "")
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    keep_port = ((port != "")
                 & ~((scheme == "http") & (port == "80"))
                 & ~((scheme == "https") & (port == "443")))
    origin = F.concat(scheme, F.lit("://"), _host_expr(base),
                      F.when(keep_port, F.concat(F.lit(":"), port))
                      .otherwise(F.lit("")))

    out = (df.withColumn("__scheme", scheme)
           .withColumn("__origin", origin)
           .withColumn("__dirp", F.regexp_replace(path, r"[^/]*$", ""))
           .withColumn("href",
                       F.explode(F.regexp_extract_all(
                           F.col(html_col), F.lit(_HREF_RE), 1))))
    href = F.col("href")
    is_abs = href.rlike(r"(?i)^https?://")
    has_scheme = href.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")
    resolved = (F.when(is_abs, href)
                .when(has_scheme, F.lit(None))     # mailto:, tel:, ...
                .when(href.startswith("//"),
                      F.concat(F.col("__scheme"), F.lit(":"), href))
                .when(href.startswith("/"),
                      F.concat(F.col("__origin"), href))
                .otherwise(F.concat(F.col("__origin"),
                                    F.col("__dirp"), href)))
    return (out.withColumn("link_url", resolved)
            .where(F.col("link_url").isNotNull())
            .drop(html_col, "__scheme", "__origin", "__dirp"))


def sitemap_urls(df: DataFrame, xml_col: str = "sitemap_xml",
                 id_col: str = "doc_id") -> DataFrame:
    """``<loc>`` (+ optional ``<lastmod>`` — the incremental-crawl
    change key) entries of a sitemap / sitemap-index document
    (sitemaps.org protocol): one output row per location, with
    ``is_index`` true when the entry is a ``<sitemap>`` (an index
    pointing at further sitemap files) rather than a ``<url>``.
    Tempered-dot regexp captures each ENTRY body (element content
    before <loc> cannot break pairing), then per-entry extraction
    pulls loc and lastmod from the same match — explode + HOFs, no
    XML parser dependency, zero UDFs."""
    def parse(tag: str, is_index: bool) -> Column:
        pat = (rf"(?is)<{tag}\b[^>]*>((?:(?!</{tag}>).)*?)</{tag}>")
        return F.transform(
            F.regexp_extract_all(F.col(xml_col), F.lit(pat), 1),
            lambda e: F.struct(
                F.regexp_extract(
                    e, r"(?is)<loc>\s*([^<\s][^<]*?)\s*</loc>", 1)
                .alias("loc"),
                F.nullif(F.regexp_extract(
                    e, r"(?is)<lastmod>\s*([^<]*?)\s*</lastmod>", 1),
                    F.lit("")).alias("lastmod"),
                F.lit(is_index).alias("is_index")))

    return (df.select(
        F.col(id_col),
        F.explode(F.concat(parse("url", False),
                           parse("sitemap", True))).alias("e"))
        .select(id_col, F.col("e.loc").alias("loc"),
                F.col("e.lastmod").alias("lastmod"),
                F.col("e.is_index").alias("is_index"))
        .where(F.col("loc") != ""))


def robots_sitemaps(df: DataFrame, robots_col: str = "robots_txt",
                    host_col: str = "host") -> DataFrame:
    """``Sitemap:`` lines of robots.txt (RFC 9309 §2.3 allows them
    anywhere in the file, outside group structure): one row per
    (host, sitemap URL).  Scan-level split + regexp, no window."""
    host = F.lower(F.col(host_col))
    return (df.select(host.alias("host"),
                      F.explode(F.split(F.col(robots_col), r"\r?\n"))
                      .alias("line"))
            .withColumn("clean",
                        F.trim(F.regexp_replace("line", r"#.*$", "")))
            .where(F.lower("clean").rlike(r"^sitemap\s*:"))
            .select("host",
                    F.trim(F.regexp_replace(
                        "clean", r"(?i)^sitemap\s*:", ""))
                    .alias("sitemap_url"))
            .where(F.col("sitemap_url") != ""))


def link_graph(df: DataFrame, src_col: str = "url",
               dst_col: str = "link_url") -> DataFrame:
    """Registered-domain edge list with weights from resolved links:
    ``(src_domain, dst_domain, n_links)``, self-edges dropped — the
    input to :func:`pagerank` and to domain-authority audits.  One
    groupBy (map-side combinable)."""
    def dom(c: Column) -> Column:
        h = F.nullif(_host_expr(c), F.lit(""))
        return F.when(h.isNotNull(), registered_domain_expr(h))

    src, dst = dom(F.col(src_col)), dom(F.col(dst_col))
    return (df.select(src.alias("src_domain"), dst.alias("dst_domain"))
            .where(F.col("src_domain").isNotNull()
                   & F.col("dst_domain").isNotNull()
                   & (F.col("src_domain") != F.col("dst_domain")))
            .groupBy("src_domain", "dst_domain")
            .agg(F.count("*").alias("n_links")))


def pagerank(edges: DataFrame, iters: int = 3, damping: float = 0.85,
             src_col: str = "src_domain", dst_col: str = "dst_domain",
             cache_static: bool = True) -> DataFrame:
    """Fixed-iteration PageRank over an edge list — domain authority
    for crawl prioritization and quality priors.

    The classic un-normalized recurrence ``pr = (1-d) + d * sum(
    pr_in / outdeg_in)`` from ``pr = 1``, run for exactly ``iters``
    rounds (deterministic, SQL-replayable — the oracle unrolls the
    same CTE chain).  Dangling nodes keep rank but redistribute none
    (the standard simplification; add a sink edge per dangling node
    upstream if mass conservation matters).

    Scale shape per iteration: one join of edges to the current rank
    vector on the src key + one groupBy on dst — both shuffles carry
    the edge list, never materializing anything denser.  Spark reuses
    the edge-side shuffle across iterations (same key), so N
    iterations cost ~N rank-vector shuffles.  Lineage is kept shallow
    for ARBITRARY ``iters``: the rank vector is ``localCheckpoint``-ed
    every ``checkpoint_every`` rounds (truncates the unrolled plan so
    10 or 50 iterations optimize/run per-round flat instead of
    re-deriving an ever-deeper tree); the persisted static frames are
    unpersisted before returning — the final select is checkpointed,
    so the result does not depend on them and repeated calls in a
    long session leak no executor storage.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    checkpoint_every = 5
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst"))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select("dst")).distinct())
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ew = e.join(outdeg, "src")
    if cache_static:
        # the edge and node frames are re-read every round — without
        # persisting them each iteration replays the distinct/degree
        # lineage from the scan (pass False for one-shot tiny graphs)
        nodes = nodes.persist()
        ew = ew.persist()
    pr = nodes.withColumn("pr", F.lit(1.0))
    for i in range(iters):
        contrib = (ew.join(pr, ew["src"] == pr["node"])
                   .groupBy("dst")
                   .agg(F.sum(F.col("pr") / F.col("deg"))
                        .alias("c")))
        pr = (nodes.join(contrib, nodes["node"] == contrib["dst"],
                         "left")
              .select("node",
                      (F.lit(1.0 - damping)
                       + F.lit(damping) * F.coalesce("c", F.lit(0.0)))
                      .alias("pr")))
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            # truncate lineage mid-run; eager so the cut is real
            pr = pr.localCheckpoint(eager=True)
    out = pr.select("node", F.col("pr").alias("pagerank"))
    if cache_static:
        # materialize the result off the persisted frames, then drop
        # them — callers get a plan with no dangling cache deps
        out = out.localCheckpoint(eager=True)
        ew.unpersist()
        nodes.unpersist()
    return out


def robots_crawl_delays(df: DataFrame, robots_col: str = "robots_txt",
                        host_col: str = "host") -> DataFrame:
    """``Crawl-delay:`` per (host, agent) — the politeness budget a
    crawl scheduler joins against its frontier.  Same RFC 9309 group
    machinery as :func:`parse_robots` (consecutive-UA sharing, per-host
    window); non-numeric values are dropped, several delays in one
    group keep the largest (the conservative read).  Output: ``host,
    agent, crawl_delay`` (double, seconds)."""
    from pyspark.sql import Window

    host = F.lower(F.col(host_col))
    lines = (df.select(host.alias("host"),
                       F.posexplode(F.split(F.col(robots_col),
                                            r"\r?\n"))
                       .alias("line_no", "line"))
             .withColumn("clean",
                         F.trim(F.regexp_replace("line", r"#.*$", "")))
             .withColumn("key", F.lower(F.regexp_extract(
                 "clean", r"^([A-Za-z-]+)\s*:", 1)))
             .withColumn("value", F.trim(F.regexp_replace(
                 "clean", r"^[A-Za-z-]+\s*:", ""))))
    # allow/disallow lines MUST stay in the boundary signal even though
    # no delay is read from them: a rule line terminates a UA run, so
    # "UA a / Disallow / UA b / Crawl-delay" puts the delay on b only
    # (exactly parse_robots's grouping; filtering them out first would
    # merge a and b and leak the delay onto a)
    sig = lines.where(F.col("key").isin("user-agent", "allow",
                                        "disallow", "crawl-delay"))
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = F.col("key") == "user-agent"
    new_group = is_ua & (~F.coalesce(F.lag(is_ua).over(w),
                                     F.lit(False)))
    grouped = sig.withColumn(
        "group_id",
        F.sum(new_group.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    agents = (grouped.where(is_ua)
              .select("host", "group_id",
                      F.lower(F.col("value")).alias("agent")))
    delays = (grouped.where(F.col("key") == "crawl-delay")
              .select("host", "group_id",
                      F.col("value").try_cast("double")
                      .alias("crawl_delay"))
              .where(F.col("crawl_delay").isNotNull()))
    return (agents.join(delays, ["host", "group_id"])
            .groupBy("host", "agent")
            .agg(F.max("crawl_delay").alias("crawl_delay")))
