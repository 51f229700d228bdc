"""End-to-end training-corpus filtering: quality rules + dedup + decontam
composed into one kept/culled verdict per document.

This is the shape of a real pretraining data pipeline (C4, Gopher/MassiveText,
RefinedWeb all chain the same stages): document-level quality heuristics,
then duplicate removal, then benchmark decontamination, with a recorded
reason for every culled document so the pipeline is auditable.

Scale design: every quality signal is a pure column expression, so all of
them are computed in ONE projection over the scan — composing filters adds
zero shuffles. The only shuffles are the ones the semantics force: a
hash-partition on the content digest for exact dedup (window min, one
exchange) and, when a benchmark is supplied, the slim (doc_id, hits) join
from :mod:`decontam` (benchmark side broadcast). No metric-table joins, no
per-stage passes over the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pypond_spark.datapipe import textstats
from pypond_spark.datapipe._util import spread
from pypond_spark.datapipe.decontam import decontaminate


def filter_corpus(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", *,
                  gopher: dict | None | bool = None,
                  repetition: dict | None | bool = None,
                  c4: dict | None | bool = False,
                  pii: bool = False,
                  dedup: bool = True,
                  bench_grams: DataFrame | None = None,
                  decontam_n: int = 13,
                  decontam_min_hits: int = 1) -> DataFrame:
    """One row per document: pass flags per stage, ``kept``, ``cull_reason``.

    Stage toggles: ``gopher`` / ``repetition`` / ``c4`` take a threshold
    dict (``{}``/None for published defaults, ``False`` to skip the stage);
    ``pii=True`` culls documents with any PII match (pipelines that scrub
    instead of cull compose :func:`privacy.redact_pii` upstream and leave
    this off); ``dedup`` keeps only the min-id document per exact content
    digest; ``bench_grams`` (from :func:`decontam.benchmark_grams`)
    enables decontamination. ``cull_reason`` is the first failing stage in
    precedence order duplicate > contaminated > pii > gopher > repetition
    > c4, NULL for kept documents.
    """
    from pypond_spark.datapipe import privacy

    flags: list[str] = []
    cols = [F.col(id_col)]
    src = spread(docs)
    if gopher is not False:
        # stage the token/line arrays (plus the whitespace-stripped
        # length, which the verdict's `between` references twice)
        # behind a 1:1 Generate so the Gopher verdict's ~10 metric
        # references cost ONE split of each kind per row instead of
        # one per reference (see textstats._staged_arrays)
        src = src.select(
            F.col(id_col), F.col(text_col),
            F.inline(F.array(F.struct(
                *textstats._staged_arrays(text_col),
                F.length(F.regexp_replace(text_col, r"\s+", ""))
                .alias("__nospace_len")))))
        gm = textstats._gopher_metrics(
            text_col, F.col("__toks"), F.col("__mtoks"),
            F.col("__lines"), nospace_len=F.col("__nospace_len"))
        cols.append(textstats._gopher_pass(
            gm, **{**textstats.GOPHER_DEFAULTS, **(gopher or {})})
            .alias("gopher_pass"))
        flags.append("gopher_pass")
    rep_cfg = None
    if repetition is not False:
        # the repetition fold struct rides a 1:1 Generate
        # (inline(array(struct)), flat columns) so its O(g log g)
        # interpreted fold is evaluated once per row; emitting
        # repetition_pass directly in this projection would inline the
        # fold per reference (see textstats._repetition_struct)
        rep_cfg = textstats._rep_params(**(repetition or {}))
        cols.append(F.inline(F.array(textstats._repetition_struct(
            text_col, rep_cfg[0]))))
        flags.append("repetition_pass")
    if c4 is not False:
        cols.append(textstats.c4_exprs(text_col, **(c4 or {}))[-1])
        flags.append("c4_pass")
    if pii:
        cols.append((~privacy.pii_exprs(text_col)[-1]).alias("pii_pass"))
        flags.append("pii_pass")
    if dedup:
        cols.append(F.md5(F.col(text_col)).alias("__digest"))
    base = src.select(*cols)
    if rep_cfg is not None:
        ns, dup, top = rep_cfg
        gen_cols = {c for n in ns for c in (f"f{n}", f"t{n}")}
        r = F.struct(*[F.col(c).alias(c) for n in ns
                       for c in (f"f{n}", f"t{n}")])
        rep_pass = textstats._repetition_cols(r, ns, dup, top)[-1]
        # repetition_pass lands exactly where the inlined fold columns
        # sat, preserving the output column order of the old
        # single-projection form
        out_cols, inserted = [], False
        for c in base.columns:
            if c in gen_cols:
                if not inserted:
                    out_cols.append(rep_pass)
                    inserted = True
            else:
                out_cols.append(F.col(c))
        base = base.select(*out_cols)

    if dedup:
        keep = F.min(id_col).over(Window.partitionBy("__digest"))
        base = (base.withColumn("is_canonical", F.col(id_col) == keep)
                .drop("__digest"))
        flags.append("is_canonical")
    if bench_grams is not None:
        hits = decontaminate(docs, bench_grams, text_col, decontam_n,
                             decontam_min_hits, id_col) \
            .select(id_col, "contaminated")
        base = base.join(hits, id_col, "left") \
            .withColumn("contaminated",
                        F.coalesce("contaminated", F.lit(False)))

    kept = F.lit(True)
    for f in flags:
        kept = kept & F.col(f)
    reason = F.lit(None).cast("string")
    # build the when-chain in reverse so the first condition wins
    precedence = [("c4_pass", "c4"), ("repetition_pass", "repetition"),
                  ("gopher_pass", "gopher"), ("pii_pass", "pii")]
    for f, label in precedence:
        if f in flags:
            reason = F.when(~F.col(f), F.lit(label)).otherwise(reason)
    if bench_grams is not None:
        kept = kept & ~F.col("contaminated")
        reason = F.when(F.col("contaminated"),
                        F.lit("contaminated")).otherwise(reason)
    if dedup:
        reason = F.when(~F.col("is_canonical"),
                        F.lit("duplicate")).otherwise(reason)
    return base.withColumn("kept", kept) \
        .withColumn("cull_reason", reason)


def corpus_report(df, text_col: str = "text", lang_col: str = "lang"):
    """Per-language corpus card: document counts, char/token volume, and
    share of the corpus — the summary table a dataset datasheet starts
    with.

    One partial-aggregated shuffle bounded by the number of languages;
    the share denominator is a window over the already-tiny per-language
    frame, so nothing corpus-sized moves twice.
    """
    per = (df.groupBy(lang_col)
           .agg(F.count("*").alias("n_docs"),
                F.sum(F.length(text_col)).alias("total_chars"),
                F.sum(textstats.token_count(text_col)).alias("total_tokens")))
    total = F.sum("n_docs").over(Window.partitionBy())
    return per.withColumn(
        "pct_docs", F.round(F.col("n_docs") / total * 100, 6))


def corpus_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                text_col: str = "text",
                group_col: str | None = "source") -> DataFrame:
    """Snapshot diff between two corpus versions: per group, how many
    documents were added, removed, changed (same id, different content
    digest) or unchanged — the audit a pipeline runs before promoting a
    new crawl (an unexpected 'removed' spike means an upstream source
    vanished; a 'changed' spike means re-crawls are rewriting text).

    Content compare is an md5 digest computed at the scan (never the
    raw text through the join); the FULL OUTER join runs on the uniform
    id key. Cost: two scans + one id-keyed shuffle, independent of
    document size.
    """
    gcols = [group_col] if group_col else []
    # explicit presence markers: digest NULL-ness is NOT an existence
    # proxy (a present document with NULL text would otherwise read as
    # added/removed — review fix, advice r4)
    o = old.select(F.col(id_col).alias("__id"),
                   *[F.col(g).alias(f"__og_{g}") for g in gcols],
                   F.md5(F.col(text_col)).alias("__od"),
                   F.lit(1).alias("__op"))
    n = new.select(F.col(id_col).alias("__id"),
                   *[F.col(g).alias(f"__ng_{g}") for g in gcols],
                   F.md5(F.col(text_col)).alias("__nd"),
                   F.lit(1).alias("__np"))
    j = o.join(n, "__id", "full_outer")
    status = (F.when(F.col("__op").isNull(), F.lit("added"))
              .when(F.col("__np").isNull(), F.lit("removed"))
              .when(F.col("__od").eqNullSafe(F.col("__nd")),
                    F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    sel = [F.coalesce(F.col(f"__ng_{g}"), F.col(f"__og_{g}")).alias(g)
           for g in gcols]
    return (j.select(*sel, status.alias("status"))
            .groupBy(*gcols, "status")
            .agg(F.count("*").alias("n_docs")))


def preprocess_corpus(docs: DataFrame, bench: DataFrame,
                      lang: str = "en", jaccard_threshold: float = 0.8,
                      decontam_n: int = 3, decontam_min_hits: int = 3,
                      id_col: str = "doc_id",
                      extract_html: bool = False) -> DataFrame:
    """End-to-end training-corpus preprocessing — the composed pipeline
    a 100-TB ingest actually runs, one audit row per document:

    0. (``extract_html=True``) main-content extraction
       (``textstats.extract_content`` — jusText block rules); every
       later stage then scores the CONTENT, not page chrome
    1. language gate (``textstats.language_id`` == ``lang``)
    2. Gopher quality rules (``textstats.gopher_quality``)
    3. exact dedup (min-id keeper per text digest — one window)
    4. MinHash/LSH near-dedup keeper (``dedup.dedup_documents``)
    5. benchmark decontamination (``decontam`` vs ``bench``'s n-grams)

    ``kept`` is the AND of all five.  Per-stage flags are kept so the
    output doubles as the funnel report (how many docs each stage
    drops).  Every stage is the library's own verified operator; the
    joins are all on the id key, so at scale they co-partition into one
    exchange family.
    """
    from pypond_spark.datapipe import decontam as dc
    from pypond_spark.datapipe import dedup as dd
    from pypond_spark.datapipe import textstats as tx

    if extract_html:
        docs = tx.extract_content(docs, id_col=id_col)

    # language gate, Gopher verdict and the exact-dedup digest are all
    # scan-level expressions over the same text column: compute the
    # three in ONE pass instead of three scans joined back on the id
    # (guide §2.4 — two joins and two corpus scans removed; per-stage
    # outputs are bit-identical to the standalone operators).  The
    # token/line ARRAYS stage behind the first Generate (one split per
    # row; the digest rides its child projection), then the Gopher
    # verdict and the per-language scores read the materialized arrays
    # behind the second (the verdict references each metric once, the
    # argmax chain reads staged score attributes).
    lang_pred, _ = tx._language_id_pred()
    gm = tx._gopher_metrics("text", F.col("__toks"), F.col("__mtoks"),
                            F.col("__lines"))
    gattrs = {k: F.col(f"__{k}") for k in gm}
    flags = (spread(docs)
             .select(F.col(id_col), F.col("text"),
                     F.md5("text").alias("__digest"),
                     F.inline(F.array(F.struct(
                         *tx._staged_arrays("text")))))
             .select(F.col(id_col), F.col("__digest"),
                     F.inline(F.array(F.struct(
                         *[gm[k].alias(f"__{k}") for k in gm],
                         *tx._language_id_fields("text")))))
             .select(id_col, "__digest",
                     tx._gopher_pass(gattrs, **tx.GOPHER_DEFAULTS)
                     .alias("quality_ok"),
                     (lang_pred == lang).alias("lang_ok")))
    w = Window.partitionBy("__digest")
    exact = (flags.select(
        id_col, "lang_ok", "quality_ok",
        (F.col(id_col) == F.min(id_col).over(w)).alias("exact_keeper")))
    near = dd.dedup_documents(
        docs, jaccard_threshold=jaccard_threshold, id_col=id_col).select(
        id_col, F.col("is_keeper").alias("near_keeper"))
    grams = dc.benchmark_grams(bench, n=decontam_n)
    decon = dc.decontaminate(docs, grams, n=decontam_n,
                             min_hits=decontam_min_hits).select(
        id_col, "contaminated")
    out = exact.join(near, id_col).join(decon, id_col)
    kept = (F.col("lang_ok") & F.col("quality_ok")
            & F.col("exact_keeper") & F.col("near_keeper")
            & ~F.col("contaminated"))
    return out.select(id_col, "lang_ok", "quality_ok", "exact_keeper",
                      "near_keeper", "contaminated", kept.alias("kept"))
