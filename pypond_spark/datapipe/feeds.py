"""RSS / Atom feed extraction — the news-and-blog slice of a crawl.

Feeds are the highest-signal discovery surface a crawler has (every
CMS publishes one), and their entries carry clean titles, canonical
links and timestamps long before the HTML is fetched.  This module
parses both wire formats with Spark's built-in ``from_xml`` — JVM
StaxXmlParser, zero Python, zero shuffle — and normalizes them into
one entry frame:

- RSS 2.0: ``<rss><channel><item>`` with ``title/link/pubDate/guid/
  description`` children;
- Atom (RFC 4287): ``<feed><entry>`` with ``title/link@href/updated/
  id/summary`` — note the link is an ATTRIBUTE, surfaced by the
  parser as the ``_href`` field.

Dispatch needs no sniffing pass: each blob is parsed under BOTH
schemas and the one whose entry array materialized wins (the other
parse yields NULL — ``from_xml`` is permissive).  Junk blobs fail
both and contribute zero rows through ``posexplode``, the same
triage law as :mod:`pypond_spark.datapipe.notebook`.

Timestamps are kept as RAW strings: RFC-822 / RFC-3339 parsing is a
downstream ``to_timestamp`` one-liner and a lossy one (feeds lie),
so the extractor stays exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["feed_entries", "sitemap_urls", "RSS_SCHEMA",
           "ATOM_SCHEMA", "SITEMAP_SCHEMA", "SITEMAP_INDEX_SCHEMA"]

#: spark DDL schema for the RSS 2.0 subset (channel + items)
RSS_SCHEMA = ("struct<channel: struct<title: string, link: string, "
              "item: array<struct<title: string, link: string, "
              "pubDate: string, guid: string, "
              "description: string>>>>")

#: spark DDL schema for the Atom subset; ``_href`` is the parser's
#: spelling of the ``href`` attribute on ``<link/>``
ATOM_SCHEMA = ("struct<title: string, entry: array<struct<"
               "title: string, link: struct<_href: string>, "
               "updated: string, id: string, summary: string>>>")


#: sitemaps.org urlset — the page-level sitemap
SITEMAP_SCHEMA = ("struct<url: array<struct<loc: string, "
                  "lastmod: string, changefreq: string, "
                  "priority: string>>>")

#: sitemaps.org sitemapindex — the shard-of-sitemaps layer big sites
#: publish (the crawler recurses one level through it)
SITEMAP_INDEX_SCHEMA = ("struct<sitemap: array<struct<loc: string, "
                        "lastmod: string>>>")


def sitemap_urls(df: DataFrame, content_col: str = "content",
                 id_col: str = "doc_id") -> DataFrame:
    """One row per sitemap entry: ``(id, kind, entry_idx, loc,
    lastmod, changefreq, priority)`` — the crawl-frontier seed
    surface (sitemaps.org protocol).  ``kind`` is ``urlset`` for
    page sitemaps and ``index`` for sitemap-index shards (whose
    ``loc`` values are themselves sitemaps — the crawler recurses);
    the dispatch law is the same parse-both-and-the-materialized-
    array-wins as :func:`feed_entries`."""
    u = F.from_xml(F.col(content_col), SITEMAP_SCHEMA)
    i = F.from_xml(F.col(content_col), SITEMAP_INDEX_SCHEMA)
    urls = u["url"]
    shards = i["sitemap"]
    norm = (
        F.when(urls.isNotNull(), F.transform(urls, lambda e: F.struct(
            e["loc"].alias("loc"),
            e["lastmod"].alias("lastmod"),
            e["changefreq"].alias("changefreq"),
            e["priority"].alias("priority"))))
        .when(shards.isNotNull(), F.transform(
            shards, lambda e: F.struct(
                e["loc"].alias("loc"),
                e["lastmod"].alias("lastmod"),
                F.lit(None).cast("string").alias("changefreq"),
                F.lit(None).cast("string").alias("priority")))))
    base = df.select(
        F.col(id_col),
        F.when(urls.isNotNull(), F.lit("urlset"))
         .when(shards.isNotNull(), F.lit("index")).alias("kind"),
        norm.alias("entries"))
    ex = base.select(id_col, "kind",
                     F.posexplode("entries").alias("entry_idx", "e"))
    return ex.select(
        id_col, "kind", "entry_idx",
        F.col("e")["loc"].alias("loc"),
        F.col("e")["lastmod"].alias("lastmod"),
        F.col("e")["changefreq"].alias("changefreq"),
        F.col("e")["priority"].alias("priority"))


def feed_entries(df: DataFrame, content_col: str = "content",
                 id_col: str = "doc_id") -> DataFrame:
    """One row per feed entry: ``(id, feed_type, feed_title,
    entry_idx, title, link, published, entry_id, summary)`` —
    document order preserved, both wire formats normalized onto the
    same columns, junk blobs contributing zero rows."""
    r = F.from_xml(F.col(content_col), RSS_SCHEMA)
    a = F.from_xml(F.col(content_col), ATOM_SCHEMA)
    rss_items = r["channel"]["item"]
    atom_items = a["entry"]
    is_rss = rss_items.isNotNull()
    is_atom = atom_items.isNotNull()

    norm = (
        F.when(is_rss, F.transform(rss_items, lambda i: F.struct(
            i["title"].alias("title"),
            i["link"].alias("link"),
            i["pubDate"].alias("published"),
            i["guid"].alias("entry_id"),
            i["description"].alias("summary"))))
        .when(is_atom, F.transform(atom_items, lambda e: F.struct(
            e["title"].alias("title"),
            e["link"]["_href"].alias("link"),
            e["updated"].alias("published"),
            e["id"].alias("entry_id"),
            e["summary"].alias("summary")))))

    base = df.select(
        F.col(id_col),
        F.when(is_rss, F.lit("rss"))
         .when(is_atom, F.lit("atom")).alias("feed_type"),
        F.when(is_rss, r["channel"]["title"])
         .when(is_atom, a["title"]).alias("feed_title"),
        norm.alias("entries"))
    ex = base.select(
        id_col, "feed_type", "feed_title",
        F.posexplode("entries").alias("entry_idx", "e"))
    return ex.select(
        id_col, "feed_type", "feed_title", "entry_idx",
        F.col("e")["title"].alias("title"),
        F.col("e")["link"].alias("link"),
        F.col("e")["published"].alias("published"),
        F.col("e")["entry_id"].alias("entry_id"),
        F.col("e")["summary"].alias("summary"))
