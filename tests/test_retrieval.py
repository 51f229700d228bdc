"""Okapi BM25 retrieval (datapipe/retrieval.py — r14)."""

import math

import pytest
from pyspark.sql import functions as F

from pypond_spark.datapipe.retrieval import bm25_topk, hard_negatives_bm25


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [(0, "the cat sat on the mat", "en"),
         (1, "the dog sat", "en"),
         (2, "cats and dogs play", "fr"),
         (3, "mat weaving with cat fur", "fr"),
         (4, "unrelated text entirely", "de")],
        "doc_id long, text string, lang string")


def _hand_bm25(tf, df, dl, n=5, avgdl=None, k1=1.2, b=0.75):
    avgdl = avgdl if avgdl is not None else 21 / 5
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_matches_hand_computation(corpus, spark):
    qs = spark.createDataFrame([(100, "cat mat"), (101, "dog")],
                               "query_id long, query string")
    rows = {(r.query_id, r.doc_id): r for r in
            bm25_topk(corpus, qs, k=10).collect()}
    # doc 0: cat tf=1 df=2 dl=6; mat tf=1 df=2 dl=6
    want = round(_hand_bm25(1, 2, 6) * 2, 6)
    assert rows[(100, 0)].bm25 == pytest.approx(want, abs=1e-9)
    assert rows[(100, 0)].n_matched == 2
    # doc 3 matches cat+mat at dl=5 -> higher than doc 0
    assert rows[(100, 3)].rank == 1 and rows[(100, 0)].rank == 2
    # 'dog' (not 'dogs' — exact term) only matches doc 1
    assert [(q, d) for (q, d) in rows if q == 101] == [(101, 1)]


def test_bm25_rank_ties_break_by_doc_id(spark):
    docs = spark.createDataFrame(
        [(7, "alpha beta"), (3, "alpha beta"), (5, "alpha beta")],
        "doc_id long, text string")
    qs = spark.createDataFrame([(1, "alpha")],
                               "query_id long, query string")
    got = [(r.rank, r.doc_id) for r in
           bm25_topk(docs, qs, k=2).orderBy("rank").collect()]
    assert got == [(1, 3), (2, 5)]            # equal scores -> id asc


def test_bm25_query_term_dedup_and_stopword_cap(corpus, spark):
    # repeated query term counts once
    qs = spark.createDataFrame([(1, "cat cat cat")],
                               "query_id long, query string")
    one = bm25_topk(corpus, qs, k=10).collect()
    qs2 = spark.createDataFrame([(1, "cat")],
                                "query_id long, query string")
    two = bm25_topk(corpus, qs2, k=10).collect()
    assert sorted((r.doc_id, r.bm25) for r in one) \
        == sorted((r.doc_id, r.bm25) for r in two)
    # stopword cap: 'the' rides 4/4 docs, 'zebra' 1/4 — at ratio 0.5
    # only zebra survives, so the stopword's near-universal postings
    # never shuffle and doc 40 (no zebra) drops out entirely
    stop = spark.createDataFrame(
        [(10, "the zebra runs"), (20, "the lion sleeps"),
         (30, "the zebra and the lion"), (40, "the end")],
        "doc_id long, text string")
    qs3 = spark.createDataFrame([(1, "the zebra")],
                                "query_id long, query string")
    capped = bm25_topk(stop, qs3, k=10, max_df_ratio=0.5).collect()
    assert sorted(r.doc_id for r in capped) == [10, 30]
    assert all(r.n_matched == 1 for r in capped)
    # a cap that kills every query term is loud, never a silent empty
    with pytest.raises(ValueError, match="dropped every query term"):
        bm25_topk(stop, qs3, k=10, max_df_ratio=0.1).collect()


def test_hard_negatives_excludes_self_and_same_label(corpus):
    rows = hard_negatives_bm25(
        corpus, k=3, label_col="lang",
        anchor_filter=F.col("doc_id") == 0).collect()
    assert rows, "anchor 0 should mine negatives"
    ids = {r.neg_id for r in rows}
    assert 0 not in ids                       # never the anchor
    assert 1 not in ids                       # same label 'en'
    assert all(r.anchor_id == 0 for r in rows)
    ranks = sorted(r.neg_rank for r in rows)
    assert ranks == list(range(1, len(ranks) + 1))


def test_bm25_empty_corpus_raises(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    qs = spark.createDataFrame([(1, "x")],
                               "query_id long, query string")
    with pytest.raises(ValueError, match="empty corpus"):
        bm25_topk(docs, qs)


def test_decontam_retrieval_threshold_and_grouping(corpus, spark):
    from pypond_spark.datapipe.retrieval import decontam_retrieval

    qs = spark.createDataFrame([(100, "cat mat"), (101, "cat fur")],
                               "query_id long, query string")
    rows = {r.doc_id: r for r in
            decontam_retrieval(corpus, qs, k=3).collect()}
    # doc 3 matches both queries; its strongest hit is 101 (fur+cat+mat)
    assert rows[3].n_queries_hit == 2
    assert rows[3].top_query_id == 101
    assert rows[3].max_bm25 > rows[0].max_bm25
    # doc 4 never ranks
    assert 4 not in rows
    # a threshold above every score empties the frame, silently
    # (decontam semantics: nothing contaminated is a fine answer)
    assert decontam_retrieval(corpus, qs, k=3,
                              min_score=99.0).count() == 0
