"""Tour of the training-data pipeline operators, end to end on sf0.001.

Run: python examples/datapipe_tour.py

Every stage below is deterministic (hash-driven, never rand()) and has a
DuckDB-verifiable twin in __spark_entry__.py; this script just strings
them together the way a corpus build would.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from pypond_spark import get_spark  # noqa: E402
from pypond_spark.datapipe import (corpus, dedup, privacy, sampling,  # noqa: E402
                                   similarity, textstats)

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("datapipe_tour", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n0 = docs.count()
    print(f"corpus: {n0} docs")

    # 1. quality + dedup + verdicts in one pass
    verdicts = corpus.filter_corpus(docs)
    kept = verdicts.where("kept")
    print("kept after quality+dedup:", kept.count(),
          "| cull reasons:", {r["cull_reason"]: r["count"] for r in
                              verdicts.where("NOT kept")
                              .groupBy("cull_reason").count().collect()})

    # 2. near-duplicate clusters (MinHash -> LSH -> Jaccard -> components)
    clusters = dedup.dedup_documents(docs)
    n_canon = clusters.where("is_keeper").count()
    print("near-dup canonical docs:", n_canon)

    # 3. PII scrub
    redacted = privacy.redact_pii(docs)
    print("docs with PII:", redacted.where("has_pii").count())

    # 4. fluency + keywords
    flu = textstats.unigram_logprob(docs)
    lo = flu.orderBy("mean_logprob").first()
    print(f"least fluent doc: {lo['doc_id']} "
          f"(mean log2 p = {lo['mean_logprob']:.2f})")
    kw = textstats.tfidf_top_terms(docs.limit(50), k=3)
    print("sample keywords:", [r["term"] for r in
                               kw.where("doc_id = 0").collect()])

    # 5. mix + pack for training
    mixed = sampling.sample_stratified(
        docs, {"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 0.5})
    packed = sampling.pack_sequences(mixed, max_tokens=2048, n_shards=4)
    n_seqs = packed.groupBy("shard", "seq").count().count()
    print(f"mixed {mixed.count()} docs -> {n_seqs} training sequences")

    # 6. embedding near-dups via the Arrow/BLAS bucket path
    pairs = similarity.embedding_near_dups_arrow(
        embs, dim=64, threshold=0.9, nbits=4)
    print("high-cosine embedding pairs:", pairs.count())

    # 7. chunk-level dedup (C4/CCNet line dedup on word windows)
    cd = dedup.chunk_dedup(docs, chunk_words=20)
    print("docs surviving chunk dedup:", cd.count(), "of", n0)

    # 8. CCNet head/middle/tail quality split
    buckets = textstats.ccnet_buckets(docs)
    print("quality buckets:", {r["bucket"]: r["count"] for r in
                               buckets.groupBy("bucket").count().collect()})

    # 9. SemDeDup on the embedding table
    sem = similarity.semantic_dedup(embs, n_cells=8, threshold=0.9)
    print("semantic survivors:", sem.where("kept = 1").count(),
          "of", sem.count())

    # 9b. product quantization: 64-dim floats -> 8 one-byte codes;
    # ADC top-k scores codes, not vectors
    books = similarity.pq_build(embs, n_blocks=8, n_codes=16, dim=64)
    q = [float(x) for x in embs.where("vec_id = 1").first()["embedding"]]
    pq_top = similarity.pq_topk(embs, q, books, k=3).collect()
    print("PQ ADC top-3:", [(r["vec_id"], r["adc"]) for r in pq_top])

    # 10. deterministic train/val/test assignment + corpus card
    splits = sampling.assign_splits(
        docs, {"train": 0.98, "val": 0.01, "test": 0.01})
    print("splits:", {r["split"]: r["count"] for r in
                      splits.groupBy("split").count().collect()})
    corpus.corpus_report(docs).show()

    # 10b. pipeline audits: split leakage, estimator accuracy, drift
    from pypond_spark.datapipe.decontam import split_leakage
    leak = split_leakage(docs, {"train": 0.98, "val": 0.01, "test": 0.01})
    worst = leak.orderBy(F.desc("leak_share")).first()
    print(f"worst test-split leakage: doc {worst['doc_id']} "
          f"{worst['leak_share']:.1%}")
    pairs = dedup.lsh_candidate_pairs(docs).select("id_a", "id_b")
    est = dedup.minhash_jaccard_estimate(docs, pairs)
    print("minhash estimator mean |err|:",
          round(est.agg(F.avg("abs_err")).first()[0] or 0.0, 4))
    from pypond_spark.datapipe.similarity import embedding_drift
    drift = embedding_drift(embs.where("vec_id % 2 = 0"),
                            embs.where("vec_id % 2 = 1"), n_cells=8)
    print("embedding PSI:",
          round(drift.agg(F.sum("psi_term")).first()[0], 4))

    # 11. exact substring dedup: find + strip cross-doc repeated spans
    spans = dedup.repeated_spans(docs, k=30)
    stripped = dedup.strip_spans(docs, spans)
    cut = stripped.agg(F.sum("n_cut")).first()[0] or 0
    print(f"substring dedup: {spans.count()} spans, {cut} chars removed")

    # 12. exactly-k weighted selection per source (A-ES, fixed quota)
    best = sampling.weighted_take_per_group(
        docs, k=10, weight="n_chars", group_col="source")
    print("A-ES quota per source:", {r["source"]: r["count"] for r in
                                     best.groupBy("source").count()
                                     .collect()})

    # 13. temperature-weighted mixing (n^alpha source budgets, mC4/XLM-R)
    tmix = sampling.temperature_mix(docs, total_tokens=10_000, alpha=0.5)
    print("temperature mix shares:",
          {r["source"]: r["mix_share"] for r in
           tmix.select("source", "mix_share").distinct().collect()})

    # 14. DSIR: importance-resample the corpus toward src0's distribution
    target = docs.where(F.col("source") == "src0")
    dsir = sampling.dsir_weights(docs, target, n_buckets=1024)
    top = dsir.orderBy(F.desc("log_weight")).limit(3).collect()
    print("DSIR top target-like docs:",
          [(r["doc_id"], round(r["log_weight"], 2)) for r in top])

    # 15. cluster-balanced coreset: equal quotas per embedding cell
    core = similarity.cluster_balanced_sample(embs, k_per_cell=10,
                                              n_cells=4, quantize=6)
    print("cluster-balanced sample:",
          {int(r["cell"]): r["count"] for r in
           core.groupBy("cell").count().collect()})

    # 16. keeper policy: each near-dup cluster keeps its LONGEST member
    kept = dedup.dedup_documents(docs, keeper="longest")
    print("longest-keeper dedup:",
          kept.where("is_keeper").count(), "of", kept.count(), "kept")

    # 17. character entropy: the cheap degeneracy filter
    from pypond_spark.datapipe.textstats import char_entropy
    ent = char_entropy(docs)
    lo = ent.orderBy("char_entropy").first()
    print(f"lowest-entropy doc: {lo['doc_id']} "
          f"({lo['char_entropy']:.2f} bits/char-distribution)")

    # 18. reciprocal-rank fusion: ensemble scale-incompatible signals
    fused = sampling.rrf_fusion(
        docs.select("doc_id", "n_chars").join(ent, "doc_id"),
        ["n_chars", "char_entropy"], k=60)
    best = fused.orderBy(F.desc("rrf")).first()
    print(f"RRF top doc: {best['doc_id']} (rrf={best['rrf']:.4f})")

    # 19. Naive-Bayes quality classifier (train on src0 vs rest, score all)
    nb = textstats.nb_quality_classifier(docs, docs,
                                         F.col("source") == "src0")
    n_pos = nb.where("log_odds > 0").count()
    print(f"NB classifier: {n_pos}/{nb.count()} docs score src0-like")

    # 20. BPE: learn merges from the corpus, tokenize with them
    from pypond_spark.datapipe import tokenize
    learned = tokenize.bpe_train(docs, n_merges=6)
    print("BPE merges:", [(l, r) for l, r, _ in learned])
    toks = tokenize.bpe_apply(docs, [(l, r) for l, r, _ in learned])
    print("mean tokens/doc after BPE:",
          round(toks.agg(F.avg("n_tokens")).first()[0], 1))

    # 21. OOV audit for a frequency-built vocab
    oov = textstats.oov_stats(docs, min_count=3)
    print("max OOV rate:", oov.agg(F.max("oov_rate")).first()[0])

    # 22. JL projection + sign sketch + Hamming prefilter
    proj = similarity.random_projection(embs, dim=64, out_dim=16)
    print("JL 64->16 projected rows:", proj.count())
    ham = similarity.embedding_hamming_near_dups(
        embs.select("vec_id", "embedding").unionByName(
            embs.limit(5).select((F.col("vec_id") + 10000).alias("vec_id"),
                                 "embedding")),
        dim=64, max_hamming=3)
    print("hamming near-dup pairs (5 planted):", ham.count())

    # 23. hard negatives for contrastive training
    hn = similarity.hard_negatives(embs, k=1, n_cells=4, quantize=6)
    print("hard-negative pairs mined:", hn.count())

    # 24. leakage-safe splits (cluster-keyed)
    safe = sampling.leakage_safe_splits(
        docs, {"train": 0.9, "val": 0.05, "test": 0.05})
    print("cluster-keyed splits:", {r["split"]: r["count"] for r in
                                    safe.groupBy("split").count().collect()})

    # 25. count-min sketch audit
    from pypond_spark.datapipe import sketch
    aud = sketch.cms_audit(docs, width=8, depth=3)
    over = aud.agg(F.max("overestimate"), F.count("*")).first()
    print(f"CMS audit: {over[1]} tokens, max overestimate {over[0]}")

    # 26. the other two classic sketches: Bloom membership + HLL count
    keyed = docs.select("doc_id", F.md5("text").alias("digest"))
    bloom = sketch.bloom_build(keyed, m_bits=2048, k=3)
    seen = sketch.bloom_check(bloom, keyed, m_bits=2048, k=3)
    print("bloom self-check (must be all true):",
          seen.agg(F.min("maybe_seen")).first()[0])
    est = sketch.hll_estimate(sketch.hll_registers(keyed, "digest", m=64),
                              m=64).first()["hll_est"]
    print(f"HLL distinct estimate: {est:.1f} "
          f"(exact {keyed.select('digest').distinct().count()})")

    # 27. exact heavy hitters without shuffling the vocabulary
    hh = textstats.heavy_hitters(docs, phi_inv=64)
    print("heavy hitters (count*64 >= N):", hh.count())

    # 28. IVF recall audit for a query set
    cents = similarity.ivf_build(embs, n_cells=8, n_iters=2, quantize=6)
    qs = embs.limit(4).select(F.col("vec_id").alias("q_id"),
                              F.col("embedding").alias("q_vec"))
    exact_nn = similarity.knn_join(embs, qs, k=10, round_to=6)
    approx_nn = similarity.ivf_knn_join(embs, qs, cents, k=10, nprobe=2,
                                        round_to=6)
    hits = (exact_nn.select("q_id", "vec_id")
            .join(approx_nn.select("q_id", "vec_id"), ["q_id", "vec_id"])
            .count())
    print(f"IVF recall@10 over 4 queries: {hits / 40:.2f}")

    # 29. the whole preprocessing pipeline in one call
    from pypond_spark.datapipe import corpus as corpus_mod
    bench = docs.where(F.col("doc_id") < 25)
    body = docs.where(F.col("doc_id") >= 25)
    audit = corpus_mod.preprocess_corpus(body, bench)
    funnel = audit.agg(
        F.count("*").alias("docs"),
        F.sum(F.col("lang_ok").cast("int")).alias("lang"),
        F.sum(F.col("quality_ok").cast("int")).alias("quality"),
        F.sum(F.col("near_keeper").cast("int")).alias("near_keep"),
        F.sum((~F.col("contaminated")).cast("int")).alias("clean"),
        F.sum(F.col("kept").cast("int")).alias("kept")).first()
    print("preprocess funnel:", funnel.asDict())

    # 30. round-8 tier: tokenizers, calibration, novelty, privacy
    from pypond_spark.datapipe.tokenize import (unigram_apply,
                                                unigram_train,
                                                wordpiece_apply)
    vocab = unigram_train(docs, vocab_size=32, max_piece_len=3, iters=2)
    toks = unigram_apply(docs, vocab)
    print("unigram tokens/doc:",
          toks.agg(F.avg("n_tokens")).first()[0])
    wp = wordpiece_apply(docs, ["table", "key", "scan", "value",
                                "hash", "tab", "##le"]
                         + list("abcdefghijklmnopqrstuvwxyz")
                         + ["##" + c for c in
                            "abcdefghijklmnopqrstuvwxyz"])
    print("wordpiece tokens/doc:",
          wp.agg(F.avg("n_tokens")).first()[0])

    from pypond_spark.datapipe.validate import (calibrate_scores,
                                                isotonic_calibration)
    scored = docs.select(
        "doc_id", F.col("n_chars").cast("double").alias("score"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0)
        .alias("target"))
    fit = isotonic_calibration(scored, "score", "target", bins=6)
    cal = calibrate_scores(scored.select("doc_id", "score"), fit,
                           "score")
    print("calibrated rate range:",
          cal.agg(F.min("rate_calibrated"),
                  F.max("rate_calibrated")).first())

    from pypond_spark.datapipe.textstats import ngram_novelty
    nov = ngram_novelty(docs)
    print("mean novelty:", nov.agg(F.round(F.avg("novelty"), 3))
          .first()[0])

    from pypond_spark.datapipe.privacy import k_anonymity
    risky = k_anonymity(docs, ["lang", "source"], k=5).where("at_risk")
    print("at-risk (lang, source) groups:", risky.count())

    # 31. round-9 tier: byte-level BPE, KN trigram fluency, PNG decode
    from pypond_spark.datapipe.tokenize import (bpe_bytes_apply,
                                                bytes_detokenize)
    g = "\u0120"  # the GPT-2 mapped space byte
    bb = bpe_bytes_apply(docs, [("t", "h"), ("th", "e"), (g, "the")])
    print("byte-BPE tokens/doc:",
          bb.agg(F.avg("n_tokens")).first()[0])
    sample = bb.where(F.col("doc_id") == 0).first()
    roundtrip = bytes_detokenize(sample["tokens"])
    print("byte-BPE roundtrip lossless:",
          roundtrip == docs.where("doc_id = 0").first()["text"])

    from pypond_spark.datapipe.textstats import kn3_logprob
    kn = kn3_logprob(docs)
    print("KN trigram mean logprob (corpus):",
          kn.agg(F.round(F.avg("mean_logprob"), 3)).first()[0])

    from pypond_spark.datapipe.multimodal import (decode_image,
                                                  encode_png)
    px = bytes(range(12))
    assert decode_image(encode_png(2, 2, px,
                                   filters=(0, 1, 2, 3, 4)))["pixels"] == px
    print("PNG encode->decode roundtrip: OK")

    # 32. round-10 tier: persisted near-dup index, trained language ID,
    # unicode normalization, palette/16-bit PNG
    import tempfile

    from pypond_spark.datapipe.dedup import (dedup_against_neardup,
                                             write_neardup_index)
    idx = tempfile.mkdtemp(prefix="tour_ndidx_")
    corpus_half = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    write_neardup_index(corpus_half, idx)
    kept = dedup_against_neardup(batch, idx, threshold=0.8)
    print("incremental near-dup ingest:",
          batch.count() - kept.count(), "dropped against the index")

    from pypond_spark.datapipe.textstats import (langid_ngram,
                                                 normalize_unicode)
    pred = langid_ngram(corpus_half, batch)
    print("trained language-ID predictions:",
          pred.groupBy("lang_pred").count().orderBy(
              F.desc("count")).first())

    messy = spark.createDataFrame(
        [(1, "café me​nu"), (2, "café menu")],
        "doc_id long, text string")
    norm = normalize_unicode(messy)
    print("NFD + zero-width clones collapse:",
          norm.select("text").distinct().count() == 1)

    from pypond_spark.datapipe.multimodal import (encode_png16,
                                                  encode_png_indexed)
    pal = encode_png_indexed(2, 2, bytes(range(4)), px)
    assert decode_image(pal)["pixels"] == px
    assert decode_image(encode_png16(2, 2, px))["pixels"] == px
    print("palette + 16-bit PNG decode: OK")

    # r11: baseline JPEG — block-constant + all-ones quant table is
    # the pixel-exact regime (DC-only blocks survive quantization)
    from pypond_spark.datapipe.jpeg import decode_jpeg, encode_jpeg
    gray = bytes([40] * 64 + [200] * 64)         # two constant blocks
    jpg = encode_jpeg(8, 16, gray, gray=True, qtable=[1] * 64)
    out = decode_jpeg(jpg)
    assert out["pixels"][0::3] == gray
    print("baseline JPEG decode (exact DC-only roundtrip): OK")

    # r11: main-content extraction — nav/footer chrome dropped
    from pypond_spark.datapipe.textstats import extract_content
    page = spark.createDataFrame(
        [(1, '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
             '<p>The quick brown fox jumps over the lazy dog and it '
             'is a fine day in the meadow for all of the animals.</p>'
             '<footer><a href="/p">Privacy</a> | <a>Terms</a></footer>')],
        "doc_id long, text string")
    got = extract_content(page).select("text").first()[0]
    assert "fox" in got and "Privacy" not in got
    print("jusText-class content extraction: OK")

    # r11 second batch: the crawl-discovery half — robots + links +
    # PageRank — plus video frames feeding the image tier
    from pypond_spark.datapipe.urls import (extract_links, link_graph,
                                            pagerank, parse_robots,
                                            robots_filter)
    robots = spark.createDataFrame(
        [("example.com", "User-agent: *\nDisallow: /private/")],
        "host string, robots_txt string")
    pages = spark.createDataFrame(
        [(1, "https://example.com/a",
          '<a href="/private/x">s</a><a href="/pub/y">p</a>'
          '<a href="https://other.org/z">o</a>')],
        "doc_id long, url string, html string")
    frontier = robots_filter(extract_links(pages),
                             parse_robots(robots),
                             url_col="link_url")
    kept = {r["link_url"] for r in
            frontier.where("robots_allowed").collect()}
    assert kept == {"https://example.com/pub/y",
                    "https://other.org/z"}
    print("robots-gated link frontier: OK")

    edges = link_graph(spark.createDataFrame(
        [("http://a.com/", "http://b.com/"),
         ("http://b.com/", "http://c.com/"),
         ("http://c.com/", "http://a.com/")],
        "url string, link_url string"))
    pr = pagerank(edges, iters=3).collect()
    assert len(pr) == 3                      # a ring: equal ranks
    print("domain PageRank over the link graph: OK")

    from pypond_spark.datapipe.y4m import (encode_y4m,
                                           sample_video_frames)
    vid = spark.createDataFrame(
        [(1, encode_y4m(8, 8, [bytes(range(64))] * 3))],
        "media_id long, content binary")
    frames = sample_video_frames(vid, every_n=2)
    assert frames.count() == 2               # frames 0 and 2
    assert decode_image(bytes(frames.first()["content"]))["width"] == 8
    print("Y4M frame sampling into the image tier: OK")

    spark.stop()


if __name__ == "__main__":
    main()
