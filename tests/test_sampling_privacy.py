"""Deterministic sampling/mixing/packing and PII detection/redaction."""

import os

import pytest
from pyspark.sql import functions as F

from pypond_spark.datapipe import privacy, sampling

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


# ---------------------------------------------------------------------------
# privacy
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (0, "mail me at john.doe+x@example.co.uk or admin@test.io thanks"),
        (1, "call +1 555-123-4567; ip 192.168.0.1 ssn 123-45-6789"),
        (2, "no pii in this one at all"),
        (3, "edge a@b.cd 999.999.999.999 and 4111 1111 1111 1111"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pii_counts(pii_df):
    out = {r["doc_id"]: r for r in privacy.pii_stats(pii_df).collect()}
    assert out[0]["n_email"] == 2 and out[0]["has_pii"]
    assert out[1]["n_ipv4"] == 1 and out[1]["n_ssn"] == 1
    assert out[1]["n_phone"] >= 1
    assert out[2]["n_email"] == out[2]["n_phone"] == 0
    assert not out[2]["has_pii"]
    # 999.999... is not a valid ipv4; the card number matches phone
    assert out[3]["n_ipv4"] == 0 and out[3]["n_phone"] >= 1


def test_redact_order_and_placeholders(pii_df):
    out = {r["doc_id"]: r["redacted"]
           for r in privacy.redact_pii(pii_df).collect()}
    assert out[0] == "mail me at <email> or <email> thanks"
    # ipv4 and ssn must be redacted as themselves, not eaten by phone
    assert "<ipv4>" in out[1] and "<ssn>" in out[1] and "<phone>" in out[1]
    assert out[2] == "no pii in this one at all"


def test_redact_idempotent_on_clean_text(docs):
    # synthetic corpus text has no PII: redaction must be the identity
    changed = privacy.redact_pii(docs.limit(50)) \
        .join(docs.limit(50), "doc_id") \
        .where(F.col("redacted") != F.col("text")).count()
    assert changed == 0


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def test_sample_uniform_deterministic_and_sized(docs):
    a = sampling.sample_uniform(docs, 0.3, seed=7)
    b = sampling.sample_uniform(docs.repartition(13), 0.3, seed=7)
    ids_a = {r["doc_id"] for r in a.select("doc_id").collect()}
    ids_b = {r["doc_id"] for r in b.select("doc_id").collect()}
    assert ids_a == ids_b  # stable under repartitioning
    n = docs.count()
    assert 0.15 * n < len(ids_a) < 0.45 * n
    # nested: a 0.1 sample is a subset of the same-seed 0.3 sample
    ids_c = {r["doc_id"] for r in
             sampling.sample_uniform(docs, 0.1, seed=7).collect()}
    assert ids_c <= ids_a


def test_sample_stratified_rates(docs):
    fr = {"en": 1.0, "de": 0.0}
    out = sampling.sample_stratified(docs, fr, strata_col="lang")
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}  # de sampled at 0, others default 0
    n_en = docs.where(F.col("lang") == "en").count()
    assert out.count() == n_en


def test_token_budget_mix_budget_met(docs):
    # src0/src1 totals are ~1.5k tokens at sf0.001, so 700/300 force the
    # partial path; src2's huge budget covers domain exhaustion
    budgets = {"src0": 700, "src1": 300, "src2": 10_000_000}
    out = sampling.token_budget_mix(docs, budgets).collect()
    assert out  # domains must exist in the corpus or the test is vacuous
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["source"], []).append(r)
    assert set(by_dom) <= set(budgets)
    for dom, rows in by_dom.items():
        b = budgets[dom]
        top = max(r["cum_tokens"] for r in rows)
        for r in rows:  # every kept row started under budget
            assert r["cum_tokens"] - r["n_tokens"] < b
        # budget met (last kept row crosses it) unless domain exhausted
        n_dom = docs.where(F.col("source") == dom).count()
        if len(rows) < n_dom:
            assert top >= b
    # partial-selection and exhaustion paths must both be exercised
    n_src2 = docs.where(F.col("source") == "src2").count()
    assert len(by_dom["src2"]) == n_src2  # huge budget keeps the domain
    assert len(by_dom["src0"]) < docs.where(F.col("source") == "src0").count()
    assert len(by_dom["src1"]) < docs.where(F.col("source") == "src1").count()


def test_sample_weighted_monotone(docs, spark):
    # weight 0 keeps nothing, weight 1 keeps everything; a doc kept at
    # weight w stays kept at any higher weight (same hash, same seed)
    zero = sampling.sample_weighted(docs, F.lit(0.0), seed=3)
    one = sampling.sample_weighted(docs, F.lit(1.0), seed=3)
    assert zero.count() == 0 and one.count() == docs.count()
    lo = {r["doc_id"] for r in
          sampling.sample_weighted(docs, F.lit(0.2), seed=3).collect()}
    hi = {r["doc_id"] for r in
          sampling.sample_weighted(docs, F.lit(0.6), seed=3).collect()}
    assert lo <= hi
    # column weights: score docs by length, long docs kept more often
    scored = docs.withColumn(
        "w", F.when(F.col("n_chars") > 500, 0.9).otherwise(0.1))
    kept = sampling.sample_weighted(scored, "w", seed=3)
    n_long = scored.where("n_chars > 500").count()
    k_long = kept.where("n_chars > 500").count()
    k_short = kept.where("n_chars <= 500").count()
    n_short = scored.where("n_chars <= 500").count()
    if n_long and n_short:
        assert k_long / n_long > k_short / n_short


def test_write_training_shards(docs, tmp_path):
    from pypond_spark.datapipe.io import write_training_shards
    out = str(tmp_path / "shards")
    tasks = write_training_shards(docs, out, records_per_shard=100,
                                  order_col="doc_id")
    assert tasks == 5  # 500 docs / 100
    back = docs.sparkSession.read.parquet(out)
    assert back.count() == docs.count()
    import glob
    files = glob.glob(f"{out}/part-*")
    assert len(files) >= 5
    # no shard exceeds the cap
    for f in files:
        n = docs.sparkSession.read.parquet(f).count()
        assert n <= 100


def test_chunk_documents_slices(spark):
    rows = [(1, " ".join(f"w{i}" for i in range(10))),  # 10 tokens
            (2, "a b"),                                  # shorter than chunk
            (3, "")]                                     # empty doc
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sampling.chunk_documents(df, chunk_tokens=4, overlap=1)
    got = {(r["doc_id"], r["chunk_idx"]): (r["chunk_text"],
                                           r["chunk_n_tokens"])
           for r in out.collect()}
    # step=3: ceil((10-1)/3)=3 chunks cover tokens [0:4), [3:7), [6:10) —
    # every token appears, the last chunk ends exactly at n
    assert got[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert got[(1, 1)] == ("w3 w4 w5 w6", 4)
    assert got[(1, 2)] == ("w6 w7 w8 w9", 4)
    assert got[(2, 0)] == ("a b", 2)
    assert got[(3, 0)] == ("", 0)
    assert len(got) == 5
    # overlap tokens appear in consecutive chunks
    with pytest.raises(ValueError):
        sampling.chunk_documents(df, chunk_tokens=4, overlap=4)


def test_unigram_logprob_orders_fluency(spark):
    from pypond_spark.datapipe.textstats import unigram_logprob
    common = "the cat sat on the mat " * 5
    rows = [(1, common), (2, common), (3, common),
            (4, "zxqj vvkw pplm qqrs ttuv")]  # all-rare tokens
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["mean_logprob"]
           for r in unigram_logprob(df).collect()}
    # the rare-token doc must score strictly lower than the common docs
    assert got[4] < got[1]
    assert abs(got[1] - got[2]) < 1e-12  # identical docs, identical score


def test_tfidf_top_terms(spark):
    from pypond_spark.datapipe.textstats import tfidf_top_terms
    rows = [(1, "apple apple apple banana common common"),
            (2, "banana banana cherry common common"),
            (3, "common words only common words")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tfidf_top_terms(df, k=2).collect()
    top = {r["doc_id"]: r["term"] for r in out if r["rank"] == 1}
    # the doc-specific repeated term must outrank the everywhere-term
    assert top[1] == "apple"
    assert top[2] == "banana"
    # ranks are dense 1..k per doc and scores non-increasing
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rs in by_doc.values():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert all(rs[i]["tfidf"] >= rs[i + 1]["tfidf"]
                   for i in range(len(rs) - 1))


def test_pack_sequences_offsets_consistent(docs):
    max_t = 512
    out = sampling.pack_sequences(docs, max_tokens=max_t, n_shards=4)
    rows = out.collect()
    assert len(rows) == docs.count()  # every doc packed
    # per shard: offsets advance by n_tokens modulo max_tokens, seqs with it
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(r["shard"] for r in rows) == set(range(4))
    for shard, srows in by_shard.items():
        srows.sort(key=lambda r: (r["seq"], r["offset"]))
        pos = 0
        for r in srows:
            assert r["seq"] * max_t + r["offset"] == pos
            pos += r["n_tokens"]
    # deterministic under repartitioning
    again = sampling.pack_sequences(docs.repartition(9), max_tokens=max_t,
                                    n_shards=4)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_shuffle_shards_deterministic_partition(docs):
    out = sampling.shuffle_shards(docs, n_shards=8, seed=3)
    rows = out.select("doc_id", "shard", "pos").collect()
    n = docs.count()
    assert len(rows) == n                       # a permutation, not a sample
    assert {r["shard"] for r in rows} <= set(range(8))
    # per-shard positions are exactly 1..|shard|
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # deterministic under repartitioning; different seed reorders
    again = {(r["doc_id"], r["shard"], r["pos"])
             for r in sampling.shuffle_shards(
                 docs.repartition(13), n_shards=8, seed=3)
             .select("doc_id", "shard", "pos").collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}
    other = {(r["doc_id"], r["shard"], r["pos"])
             for r in sampling.shuffle_shards(docs, n_shards=8, seed=4)
             .select("doc_id", "shard", "pos").collect()}
    assert other != again
    with pytest.raises(ValueError):
        sampling.shuffle_shards(docs, n_shards=0)


def test_upsample_repeats_and_drops(spark):
    df = spark.createDataFrame(
        [(1, 3), (2, 1), (3, 0), (4, -2)], ["doc_id", "epochs"])
    out = sampling.upsample(df, "epochs").collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(r["copy"])
    assert got == {1: [1, 2, 3], 2: [1]}        # 0/negative repeats drop


def test_ccnet_buckets(spark):
    from pypond_spark.datapipe.textstats import ccnet_buckets
    # 9 docs: 3 of common tokens (fluent), 3 mixed, 3 rare-token garbage
    common = "the cat sat on the mat " * 5
    mixed = "the cat zqx on vbn mat " * 5
    rare = "zzq qxv bnm wvx qqq jjj " * 5
    rows = ([(i, common) for i in range(3)]
            + [(i + 3, mixed + f"u{i}") for i in range(3)]
            + [(i + 6, rare + f"w{i}") for i in range(3)])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(df).collect()}
    assert len(out) == 9
    assert all(out[i] == "head" for i in range(3))
    assert all(out[i + 6] == "tail" for i in range(3))
    assert set(out.values()) == {"head", "middle", "tail"}


def test_assign_splits(spark):
    from pypond_spark.datapipe.sampling import assign_splits
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    out = assign_splits(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["count"]
              for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 1450 < counts["train"] < 1750        # ~80% of 2000
    # stable under repartition AND under corpus growth (ids keep splits)
    again = assign_splits(df.repartition(7),
                          {"train": 0.8, "val": 0.1, "test": 0.1})
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, again.collect()))
    small = assign_splits(df.where("doc_id < 100"),
                          {"train": 0.8, "val": 0.1, "test": 0.1})
    sub = {r["doc_id"]: r["split"] for r in small.collect()}
    full = {r["doc_id"]: r["split"] for r in out.collect()}
    assert all(full[k] == v for k, v in sub.items())
    import pytest as _pt
    with _pt.raises(ValueError):
        assign_splits(df, {"train": 0.5, "val": 0.1})


def test_bigram_logprob(spark):
    from pypond_spark.datapipe.textstats import bigram_logprob
    # "a b" appears in every doc; doc 3's "zq xv" bigram is unique -> lower
    rows = [(0, "a b a b a b"), (1, "a b a b"), (2, "a b"),
            (3, "zq xv a b"), (4, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    assert 4 not in out                      # single-token doc: no bigrams
    assert out[2]["n_bigrams"] == 1
    assert out[0]["n_bigrams"] == 5          # a-b, b-a, a-b, b-a, a-b
    assert out[3]["mean_logprob"] < out[2]["mean_logprob"]


def test_kn3_logprob_hand_computed(spark):
    """Interpolated KN on the 3-doc micro-corpus, worked by hand with
    D=0.75: trigram types (a,b,c) c=2 and (a,b,d) c=1 give
    p(c|ab)=2/3, p(d|ab)=1/3 — and they sum to exactly 1 (the proper-
    normalization property of marginal denominators)."""
    from pypond_spark.datapipe.textstats import kn3_logprob
    import math
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "a b d"), (3, "a b")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in kn3_logprob(df).collect()}
    assert 3 not in out                      # <3 tokens: no trigrams
    assert out[0]["n_trigrams"] == 1
    # p2(c|b) = (1-.75)/2 + (.75*2/2)*(1/2) = .5 (same for d);
    # p3(c|ab) = (2-.75)/3 + (.75*2/3)*.5 = 2/3; p3(d|ab) = 1/3
    exp_c = round(round(math.log2(2 / 3) * 1e6) / 1e6, 6)
    exp_d = round(round(math.log2(1 / 3) * 1e6) / 1e6, 6)
    assert out[0]["mean_logprob"] == pytest.approx(exp_c, abs=2e-6)
    assert out[1]["mean_logprob"] == out[0]["mean_logprob"]
    assert out[2]["mean_logprob"] == pytest.approx(exp_d, abs=2e-6)
    with pytest.raises(ValueError, match="discount"):
        kn3_logprob(df, discount=1.5)


def test_kn3_logprob_min_count_pruning(spark):
    """min_count forwarded to the SELF-scored form (r10): singleton
    trigram types drop before the marginals AND the scoring join — on
    the micro-corpus only (a,b,c) c=2 survives min_count=2, so its
    whole probability mass concentrates (p3 = (2-.75)/2 +
    (.75*1/2)*((1-.75)/1 + .75*1) = exactly 1 -> logprob 0), the doc
    whose only trigram was pruned is ABSENT (no backoff ladder to
    route mass through), and n_trigrams counts scored trigrams."""
    from pypond_spark.datapipe.textstats import kn3_logprob
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "a b d"), (3, "a b")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           kn3_logprob(df, min_count=2).collect()}
    assert set(out) == {0, 1}              # doc 2's trigram pruned
    assert out[0]["n_trigrams"] == 1
    assert out[0]["mean_logprob"] == 0.0   # p = exactly 1
    assert out[1]["mean_logprob"] == 0.0
    with pytest.raises(ValueError, match="min_count"):
        kn3_logprob(df, min_count=0)


def test_kn3_beats_bigram_on_fluent_vs_garbage(spark):
    """The point of the trigram KN filter: with bigram-level coverage
    engineered equal (every GARBAGE bigram also appears in fluent
    docs), the bigram LM cannot separate the shuffled doc from the
    fluent one, while trigram KN — seeing the third-order structure —
    still can."""
    from pypond_spark.datapipe.textstats import (bigram_logprob,
                                                 kn3_logprob)
    # every bigram of the spliced doc (p q / q r / r s) is FREQUENT —
    # each appears in 8 fluent docs — but its trigrams (p q r, q r s)
    # occur nowhere else in the corpus
    rows = ([(i, "p q u") for i in range(8)]
            + [(10 + i, "v q r w") for i in range(8)]
            + [(20 + i, "x r s") for i in range(8)]
            + [(100, "p q r s")])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kn = {r["doc_id"]: r["mean_logprob"] for r in kn3_logprob(df).collect()}
    bg = {r["doc_id"]: r["mean_logprob"]
          for r in bigram_logprob(df).collect()}
    # bigram coverage alone CANNOT flag the splice (its bigrams are as
    # frequent as any fluent doc's)...
    assert bg[100] >= bg[10]
    # ...while trigram KN separates it decisively
    assert kn[10] > kn[100]
    assert (kn[10] - kn[100]) > (bg[10] - bg[100])


def test_kn3_score_heldout_backoff_ladder(spark):
    """Held-out KN with the full backoff ladder, hand-computed on the
    micro-corpus (train: 'a b c' x2 + 'a b d'; NT=2 bigram types, E=2
    continuation types, V=4): a fully-seen trigram, an unseen-w3
    trigram (backs off through the discounted continuation + uniform
    OOV mass), and an all-unseen trigram (bottoms out at the
    continuation floor) all score the worked values."""
    import math
    from pypond_spark.datapipe.textstats import kn3_score
    train = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "a b d")],
        "doc_id long, text string")
    score = spark.createDataFrame(
        [(10, "a b c"), (11, "a b x"), (12, "x y z")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in kn3_score(score, train).collect()}

    def pin(p):
        return round(math.log2(p) * 1e6) / 1e6

    # seen: pc(c)=.275, p2=.33125, p3=(2-.75)/3 + .5*.33125
    assert out[10]["n_unseen"] == 0
    assert out[10]["mean_logprob"] == pytest.approx(
        pin(1.25 / 3 + 0.5 * 0.33125), abs=2e-6)
    # unseen w3: pc(x)=.15 (pure OOV mass), p2=.75*.15, p3=.5*p2
    assert out[11]["n_unseen"] == 1
    assert out[11]["mean_logprob"] == pytest.approx(
        pin(0.5 * 0.75 * 0.15), abs=2e-6)
    # all unseen: bottoms out at pc(z)=.15
    assert out[12]["n_unseen"] == 1
    assert out[12]["mean_logprob"] == pytest.approx(pin(0.15), abs=2e-6)
    # the seen trigram outscores both backoff paths (note the partial
    # path can land BELOW the bare continuation floor — two discount
    # multipliers compound — so no total order is asserted between
    # the two unseen shapes)
    assert out[10]["mean_logprob"] > out[11]["mean_logprob"]
    assert out[10]["mean_logprob"] > out[12]["mean_logprob"]
    # min_count pruning: dropping the singleton type (a,b,d) routes its
    # mass through the backoff ladder — hand-worked: pc(d) has no
    # continuation mass left (0.15 pure OOV), p = .375 * .75 * .15
    pruned = {r["doc_id"]: r for r in
              kn3_score(score, train, min_count=2).collect()}
    assert pruned[11]["n_unseen"] == 1
    assert pruned[10]["mean_logprob"] == pytest.approx(
        pin(0.625 + 0.375 * 0.55), abs=2e-6)
    probe = spark.createDataFrame([(13, "a b d")],
                                  "doc_id long, text string")
    pd_ = kn3_score(probe, train, min_count=2).first()
    assert pd_["n_unseen"] == 1
    assert pd_["mean_logprob"] == pytest.approx(
        pin(0.375 * 0.75 * 0.15), abs=2e-6)
    with pytest.raises(ValueError, match="discount"):
        kn3_score(score, train, discount=0)
    with pytest.raises(ValueError, match="min_count"):
        kn3_score(score, train, min_count=0)
    with pytest.raises(ValueError, match="trigram"):
        kn3_score(score, spark.createDataFrame(
            [(0, "a b")], "doc_id long, text string"))


def test_weighted_take_per_group_quota_and_bias(spark):
    from pypond_spark.datapipe.sampling import weighted_take_per_group
    rows = [(i, "a" if i < 200 else "b",
             1000.0 if i % 10 == 0 else 1.0) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, src string, w double")
    out = weighted_take_per_group(df, k=10, weight="w", group_col="src",
                                  seed=3).collect()
    by = {}
    for r in out:
        by.setdefault(r["src"], []).append(r)
    # exact quota per group
    assert {g: len(v) for g, v in by.items()} == {"a": 10, "b": 10}
    # heavy weights (1000x) dominate the sample
    heavy = sum(1 for r in out if r["w"] == 1000.0)
    assert heavy >= 15
    # deterministic under rerun
    again = weighted_take_per_group(df, k=10, weight="w", group_col="src",
                                    seed=3).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in out}
    # zero/negative weights never selected
    df2 = spark.createDataFrame(
        [(1, "a", 0.0), (2, "a", -5.0), (3, "a", 1.0)],
        "doc_id long, src string, w double")
    sel = weighted_take_per_group(df2, k=3, weight="w", group_col="src")
    assert [r["doc_id"] for r in sel.collect()] == [3]


def test_lexical_stats_and_zipf(spark):
    from pypond_spark.datapipe.textstats import lexical_stats, zipf_slope
    rows = [(1, "the cat and the dog and the bird"),
            (2, "aa bb cc dd")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    st = {r["doc_id"]: r for r in lexical_stats(df).collect()}
    # doc 1: 8 tokens, types {the:3, cat, and:2, dog, bird} = 5 types,
    # hapax = {cat, dog, bird} = 3
    assert (st[1]["n_tokens"], st[1]["n_types"]) == (8, 5)
    assert st[1]["ttr"] == 5 / 8 and st[1]["hapax_share"] == 3 / 5
    assert (st[2]["n_tokens"], st[2]["n_types"]) == (4, 4)
    z = zipf_slope(df).collect()[0]
    assert z["vocab"] == 9 and z["n_tokens"] == 12
    assert z["slope"] < 0  # frequencies fall with rank


def test_temperature_mix(spark):
    """n^alpha source re-weighting (mC4/XLM-R): shares normalize to 1,
    budgets scale with sqrt(n) at alpha=0.5 (tail sources upsampled vs
    their natural share), the crossing doc is kept, and alpha=1 gives
    proportional budgets."""
    import pyspark.sql.functions as F

    from pypond_spark.datapipe.sampling import temperature_mix
    rows = ([(i, "big", "w " * 100) for i in range(40)]
            + [(100 + i, "small", "w " * 100) for i in range(10)])
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    out = temperature_mix(df, total_tokens=2000, alpha=0.5).toPandas()
    shares = dict(out.groupby("source")["mix_share"].first())
    assert abs(sum(shares.values()) - 1.0) < 1e-5
    # natural shares are 0.8/0.2; sqrt-weighting pulls toward 2:1
    assert abs(shares["big"] - (2 / 3)) < 1e-6
    assert abs(shares["small"] - (1 / 3)) < 1e-6
    budgets = dict(out.groupby("source")["budget_tokens"].first())
    assert budgets["big"] == 1333 and budgets["small"] == 666
    # greedy prefix: crossing doc kept, so cum may exceed budget once
    per = out.groupby("source")["cum_tokens"].max()
    assert per["big"] >= 1333 and per["small"] >= 666
    # every doc has 100 tokens -> kept counts are ceil(budget/100)
    kept = out.groupby("source")["doc_id"].count()
    assert kept["big"] == 14 and kept["small"] == 7

    # alpha=1: proportional to token mass
    prop = temperature_mix(df, total_tokens=2000, alpha=1.0).toPandas()
    pshares = dict(prop.groupby("source")["mix_share"].first())
    assert abs(pshares["big"] - 0.8) < 1e-6


def test_dsir_weights(spark):
    """DSIR (arXiv:2302.03169): docs made of target-corpus vocabulary
    must outscore docs of foreign vocabulary, and log-weights accumulate
    as exact micro-nat integers (value = multiple of 1e-6)."""
    from pypond_spark.datapipe.sampling import dsir_weights
    target_rows = [(i, "alpha beta gamma delta " * 5) for i in range(8)]
    raw_rows = ([(100, "alpha beta gamma delta alpha beta"),
                 (101, "zork quux blorp frobnitz zork quux")])
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dsir_weights(raw, target, n_buckets=256).collect()}
    assert out[100]["log_weight"] > out[101]["log_weight"]
    assert out[100]["log_weight"] > 0 > out[101]["log_weight"]
    for r in out.values():
        micro = r["log_weight"] * 1e6
        assert abs(micro - round(micro)) < 1e-6
    # unigrams + bigrams: 6 tokens -> 11 grams
    assert out[100]["n_grams"] == 11


def test_dsir_empty_target_and_temperature_token_col(spark):
    """Edge cases: DSIR with an EMPTY target degrades to the uniform
    smoothing prior (all-bucket ratios identical, weights negative for
    every doc since raw mass > prior); temperature_mix accepts a
    precomputed token column."""
    import pyspark.sql.functions as F

    from pypond_spark.datapipe.sampling import dsir_weights, temperature_mix
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string")
    out = dsir_weights(docs, docs.where(F.lit(False)),
                       n_buckets=64).collect()
    assert len(out) == 2
    assert all(r["log_weight"] < 0 for r in out)

    pre = docs.withColumn("toks", F.lit(10))
    mixed = temperature_mix(pre, total_tokens=100, alpha=0.5,
                            domain_col="doc_id", token_col="toks")
    rows = mixed.collect()
    assert rows and all(r["n_tokens"] == 10 for r in rows)


def test_rrf_fusion_goldens(spark):
    """Hand-computed RRF (k=60): competition ranks (ties share min rank),
    NULL/NaN signals contribute 0, higher_is_better=False flips order,
    and the result is repartition-invariant (no physical-order term)."""
    rows = [
        # (id, quality, length)
        (1, 0.9, 100),
        (2, 0.9, 50),     # quality tie with 1 -> both rank 1
        (3, 0.5, 200),
        (4, None, 10),    # missing quality -> contributes 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, q double, l long")
    out = sampling.rrf_fusion(df, ["q", "l"], k=60)
    got = {r["doc_id"]: (r["__rank_q"], r["__rank_l"], round(r["rrf"], 9))
           for r in out.collect()}
    # q ranks: 0.9 -> 1 (x2), 0.5 -> 3 ; l ranks: 200->1, 100->2, 50->3, 10->4
    assert got[1] == (1, 2, round(1 / 61 + 1 / 62, 9))
    assert got[2] == (1, 3, round(1 / 61 + 1 / 63, 9))
    assert got[3] == (3, 1, round(1 / 63 + 1 / 61, 9))
    assert got[4] == (None, 4, round(0.0 + 1 / 64, 9))

    # lower-is-better: rank order flips
    out2 = sampling.rrf_fusion(df.where("q IS NOT NULL"), ["q"], k=60,
                               higher_is_better=False)
    got2 = {r["doc_id"]: r["__rank_q"] for r in out2.collect()}
    assert got2 == {3: 1, 1: 2, 2: 2}

    # partition-invariance
    out3 = sampling.rrf_fusion(df.repartition(7), ["q", "l"], k=60)
    got3 = {r["doc_id"]: round(r["rrf"], 9) for r in out3.collect()}
    assert got3 == {i: v[2] for i, v in got.items()}

    import pytest as _pt
    with _pt.raises(ValueError):
        sampling.rrf_fusion(df, [])


def test_pack_bins_ffd_goldens(spark):
    """Hand-computed first-fit-decreasing: sorted (50,40,30,20,10) at
    cap 60 packs as [50+10][40+20][30]; an over-cap doc gets its own
    overflow bin; determinism across repartitioning; validation."""
    rows = [(i, "w " * n) for i, n in
            [(1, 50), (2, 40), (3, 30), (4, 20), (5, 10), (6, 70)]]
    df = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string")
    out = sampling.pack_bins_ffd(df, max_tokens=60, n_shards=1)
    got = {r["doc_id"]: (r["bin"], r["overflow"], r["n_tokens"])
           for r in out.collect()}
    # order: 70, 50, 40, 30, 20, 10
    assert got[6] == (1, True, 70)    # overflow singleton opens bin 1
    assert got[1] == (2, False, 50)   # 50 -> new bin 2 (can't join 70)
    assert got[2] == (3, False, 40)   # 40 -> new bin 3
    assert got[3] == (4, False, 30)   # 30 -> new bin 4
    assert got[4] == (3, False, 20)   # 20 -> first fit: bin 3 (40+20)
    assert got[5] == (2, False, 10)   # 10 -> first fit: bin 2 (50+10)

    # bin loads respect capacity for non-overflow bins
    import collections
    loads = collections.Counter()
    for _, (b, over, t) in got.items():
        loads[b] += t
    assert all(load <= 60 for b, load in loads.items() if b != 1)

    got2 = {r["doc_id"]: r["bin"]
            for r in sampling.pack_bins_ffd(
                df.repartition(5), max_tokens=60, n_shards=1).collect()}
    assert got2 == {i: v[0] for i, v in got.items()}

    import pytest as _pt
    with _pt.raises(ValueError):
        sampling.pack_bins_ffd(df, max_tokens=0)

    # string doc ids are first-class: schema derives the id type from
    # the input frame instead of hardcoding long
    sdf = spark.createDataFrame(
        [(f"doc-{i}", t) for (i, t) in
         [(1, "w " * 50), (2, "w " * 40), (3, "w " * 30),
          (4, "w " * 20), (5, "w " * 10), (6, "w " * 70)]],
        "doc_id string, text string")
    sout = sampling.pack_bins_ffd(sdf, max_tokens=60, n_shards=1)
    assert dict(sout.dtypes)["doc_id"] == "string"
    sgot = {r["doc_id"]: (r["bin"], r["overflow"])
            for r in sout.collect()}
    assert sgot == {f"doc-{i}": (b, o)
                    for i, (b, o, _) in got.items()}


def test_packing_report(spark):
    """Report over the hand-computed FFD packing: cap-60 bins [70][50+10]
    [40+20][30] -> 4 bins, 1 overflow, fill = 180/180... no: non-overflow
    loads are 60, 60, 30 -> fill 150/180."""
    rows = [(i, "w " * n) for i, n in
            [(1, 50), (2, 40), (3, 30), (4, 20), (5, 10), (6, 70)]]
    df = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string")
    packed = sampling.pack_bins_ffd(df, max_tokens=60, n_shards=1)
    rep = sampling.packing_report(packed, max_tokens=60).first()
    assert rep["n_docs"] == 6
    assert rep["n_bins"] == 4
    assert rep["n_overflow_bins"] == 1
    assert rep["total_tokens"] == 220
    assert rep["fill_frac"] == round(150 / 180, 6)
    assert rep["min_load"] == 30
    assert rep["max_load"] == 60
    assert rep["docs_per_bin"] == 1.5


def test_leakage_safe_splits_cluster_consistent(spark):
    from pypond_spark.datapipe import sampling
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # plant near-dup pairs: clone 10 docs under new ids
    planted = docs.select("doc_id", "text").unionByName(
        docs.limit(10).select((F.col("doc_id") + 100000).alias("doc_id"),
                              "text"))
    out = sampling.leakage_safe_splits(
        planted, {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == planted.count()
    for i in list(rows)[:]:
        if i >= 100000:
            twin = rows[i - 100000]
            # clone pairs share a cluster, hence a split
            assert rows[i]["cluster_id"] == twin["cluster_id"]
            assert rows[i]["split"] == twin["split"]
    assert set(r["split"] for r in rows.values()) <= {"train", "val", "test"}
    # determinism: rerun gives the identical assignment
    again = {r["doc_id"]: r["split"] for r in sampling.leakage_safe_splits(
        planted, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert again == {k: v["split"] for k, v in rows.items()}


def test_k_anonymity(spark):
    from pypond_spark.datapipe import privacy
    rows = ([("a", "x", 1)] * 5 + [("a", "y", 1)] * 2
            + [("b", "x", 1), ("b", "x", 2), ("b", "x", 3)])
    df = spark.createDataFrame(rows, "qi1 string, qi2 string, s int")
    got = {(r["qi1"], r["qi2"]):
           (r["group_size"], r["l_diversity"], r["at_risk"],
            r["l_at_risk"])
           for r in privacy.k_anonymity(df, ["qi1", "qi2"], k=5,
                                        sensitive_col="s").collect()}
    # (a,x): size 5 not at risk, but ONE sensitive value -> homogeneity
    assert got[("a", "x")] == (5, 1, False, True)
    # (a,y): tiny group, homogeneous
    assert got[("a", "y")] == (2, 1, True, True)
    # (b,x): small but diverse
    assert got[("b", "x")] == (3, 3, True, False)
    # NULL QI values form their own (linkable) group
    ndf = spark.createDataFrame([(None, "x", 1)] * 2,
                                "qi1 string, qi2 string, s int")
    nrow = privacy.k_anonymity(ndf, ["qi1", "qi2"], k=5).first()
    assert nrow["group_size"] == 2 and nrow["at_risk"]
    import pytest as _pt
    with _pt.raises(ValueError, match="quasi_cols"):
        privacy.k_anonymity(df, [], k=5)
    with _pt.raises(ValueError, match="k must"):
        privacy.k_anonymity(df, ["qi1"], k=1)
