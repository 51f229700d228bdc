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
