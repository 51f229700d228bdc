"""BPE tokenization: merge-table inference and training."""

import os

import pytest
from pyspark.sql import functions as F

from pypond_spark.datapipe import tokenize

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _apply(spark, rows, merges):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: (r["tokens"], r["n_tokens"])
            for r in tokenize.bpe_apply(df, merges).collect()}


def test_bpe_apply_hand_computed(spark):
    out = _apply(spark, [(1, "the table"), (2, "that  th")],
                 [("t", "h"), ("th", "e"), ("a", "b")])
    assert out[1] == (["the", "t", "ab", "l", "e"], 5)
    assert out[2] == (["th", "a", "t", "th"], 4)


def test_bpe_apply_left_to_right_non_overlapping(spark):
    # "aaa" + (a,a): greedy pass pairs (1,2), leaves the third alone
    out = _apply(spark, [(1, "aaa"), (2, "aaaa")], [("a", "a")])
    assert out[1] == (["aa", "a"], 2)
    assert out[2] == (["aa", "aa"], 2)
    # a later rank can merge what an earlier rank produced
    out2 = _apply(spark, [(1, "aaaa")], [("a", "a"), ("aa", "aa")])
    assert out2[1] == (["aaaa"], 1)


def test_bpe_apply_never_crosses_words(spark):
    # (e,t) must not merge across "the table"'s word boundary
    out = _apply(spark, [(1, "e t")], [("e", "t")])
    assert out[1] == (["e", "t"], 2)
    out2 = _apply(spark, [(1, "et e t")], [("e", "t")])
    assert out2[1] == (["et", "e", "t"], 3)


def test_bpe_apply_edge_docs(spark):
    out = _apply(spark, [(1, ""), (2, "x"), (3, "   ")], [("x", "y")])
    assert out[1] == ([], 0)
    assert out[2] == (["x"], 1)
    assert out[3] == ([], 0)


def test_bpe_apply_validates_merges(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="invalid merge"):
        tokenize.bpe_apply(df, [("a", "")])
    with pytest.raises(ValueError, match="invalid merge"):
        tokenize.bpe_apply(df, [("a", "b", "c")])


def test_bpe_train_counts_and_tiebreak(spark):
    df = spark.createDataFrame([(1, "the table"), (2, "that  th")],
                               ["doc_id", "text"])
    merges = tokenize.bpe_train(df, n_merges=3)
    # (t,h) appears 3x; then all pairs tie at 1 -> lexicographic (l, r)
    assert merges == [("t", "h", 3), ("a", "b", 1), ("a", "t", 1)]
    with pytest.raises(ValueError, match="positive"):
        tokenize.bpe_train(df, n_merges=0)


def test_bpe_train_then_apply_compresses(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    learned = [(l, r) for l, r, _ in tokenize.bpe_train(docs, n_merges=6)]
    base = tokenize.bpe_apply(docs, learned[:1])
    full = tokenize.bpe_apply(docs, learned)
    n_base = base.agg(F.sum("n_tokens")).first()[0]
    n_full = full.agg(F.sum("n_tokens")).first()[0]
    # each extra rank can only merge more: strictly fewer tokens here
    assert n_full < n_base


def test_unigram_apply_viterbi_goldens(spark):
    """Hand-checked Viterbi: piece scores chosen so the best path is
    unambiguous, plus the unk fallback and empty-doc contract."""
    vocab = {"ab": -100, "a": -300, "b": -400, "c": -500, "abc": -250}
    df = spark.createDataFrame(
        [(1, "abc ab cab zb"), (2, "")], "doc_id long, text string")
    out = {r["doc_id"]: (r["tokens"], r["n_tokens"])
           for r in tokenize.unigram_apply(df, vocab).collect()}
    # abc(-250) beats ab+c(-600); cab -> c+ab(-600); z is unk
    assert out[1] == (["abc", "ab", "c", "ab", "z", "b"], 6)
    assert out[2] == ([], 0)
    with pytest.raises(ValueError, match="non-empty"):
        tokenize.unigram_apply(df, {})


def test_unigram_tie_prefers_longer_piece(spark):
    # aa(-600) exactly ties a+a(-600): the longer piece wins
    df = spark.createDataFrame([(1, "aa")], "doc_id long, text string")
    t = tokenize.unigram_apply(df, {"aa": -600, "a": -300}) \
        .first()["tokens"]
    assert t == ["aa"]


def test_unigram_train_then_apply_compresses(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    vocab = tokenize.unigram_train(docs, vocab_size=40, max_piece_len=3,
                                   iters=2)
    rows = vocab.collect()
    assert 0 < len(rows) <= 40
    # scores are negative micro-nat log-probs; counts positive
    assert all(r["score"] < 0 and r["count"] > 0 for r in rows)
    trained = {r["piece"]: r["score"] for r in rows}
    out = tokenize.unigram_apply(docs, trained)
    n_tok = out.agg(F.sum("n_tokens")).first()[0]
    # char-level baseline: every non-space char its own token
    n_char = docs.select(
        F.sum(F.length(F.regexp_replace("text", r"\s+", "")))).first()[0]
    assert 0 < n_tok < n_char
    with pytest.raises(ValueError, match="vocab_size"):
        tokenize.unigram_train(docs, vocab_size=0)


def test_wordpiece_apply_goldens(spark):
    """BERT greedy longest-match-first: multi-piece split with ##
    continuations, whole-word [UNK] on any unmatchable position,
    empty-doc contract, validation."""
    vocab = ["un", "##aff", "##able", "##ff", "aff", "table", "tab",
             "##le", "##a", "##b", "a", "b", "t"]
    df = spark.createDataFrame(
        [(1, "unaffable table tab atb zzz"), (2, "")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["tokens"], r["n_tokens"])
           for r in tokenize.wordpiece_apply(df, vocab).collect()}
    # greedy: un + ##aff + ##able (not aff/##ff splits); atb fails at
    # '##t' (absent) -> whole-word [UNK]; zzz has no 'z' at all
    assert out[1] == (["un", "##aff", "##able", "table", "tab",
                       "[UNK]", "[UNK]"], 7)
    assert out[2] == ([], 0)
    with pytest.raises(ValueError, match="non-empty"):
        tokenize.wordpiece_apply(df, [])


def _bapply(spark, rows, merges):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: (r["tokens"], r["n_tokens"])
            for r in tokenize.bpe_bytes_apply(df, merges).collect()}


def test_bpe_bytes_hand_computed(spark):
    # chunks: "the" / " the" / " them"; merge chain th -> the; the
    # mapped space (0x20 -> 'Ġ' per the GPT-2 table) is a real symbol
    g = tokenize.BYTE_UNICODE[0x20]
    out = _bapply(spark, [(1, "the the them")],
                  [("t", "h"), ("th", "e")])
    assert out[1] == (["the", g, "the", g, "the", "m"], 6)
    # a space-inclusive merge glues the leading space to the word —
    # the whole point of byte-level space handling
    out2 = _bapply(spark, [(1, "the the")],
                   [("t", "h"), ("th", "e"), (g, "the")])
    assert out2[1] == (["the", g + "the"], 2)


def test_bpe_bytes_never_crosses_chunks(spark):
    # ('e', mapped-space) can never fire: the space starts the NEXT
    # chunk, so the pair is never adjacent inside one chunk
    g = tokenize.BYTE_UNICODE[0x20]
    out = _bapply(spark, [(1, "be to")], [("e", g)])
    assert out[1] == (["b", "e", g, "t", "o"], 5)
    assert all(g not in t or t == g for t in out[1][0])


def test_bpe_bytes_multibyte_roundtrip(spark):
    """The byte-level family's reason to exist: emoji/multibyte input
    that char-level bpe_apply can only emit as out-of-vocabulary raw
    characters tokenizes into in-vocabulary byte symbols and roundtrips
    LOSSLESSLY back to the original text."""
    text = "héllo 🚀 naïve"
    out = _bapply(spark, [(1, text)], [])
    toks, n = out[1]
    # every emitted symbol is inside the fixed 256-char byte alphabet
    assert all(c in tokenize.BYTE_ALPHABET for t in toks for c in t)
    # 🚀 is 4 UTF-8 bytes -> 4 byte symbols; é/ï are 2 each
    assert n == len(text.encode("utf-8"))
    assert tokenize.bytes_detokenize(toks) == text
    # char-level contrast: its token for the emoji IS the raw char,
    # which no byte-level vocabulary contains
    char_out = {r["doc_id"]: r["tokens"] for r in tokenize.bpe_apply(
        spark.createDataFrame([(1, text)], ["doc_id", "text"]),
        [("h", "e")]).collect()}
    assert "🚀" in char_out[1]
    assert "🚀" not in tokenize.BYTE_ALPHABET


def test_bpe_bytes_edge_docs(spark):
    out = _bapply(spark, [(1, ""), (2, "  "), (3, "a")],
                  [("a", "b")])
    assert out[1] == ([], 0)
    # pure-whitespace doc: one \s+ chunk of two mapped space symbols
    g = tokenize.BYTE_UNICODE[0x20]
    assert out[2] == ([g, g], 2)
    assert out[3] == (["a"], 1)
    with pytest.raises(ValueError, match="non-empty"):
        tokenize.bpe_bytes_apply(
            spark.createDataFrame([(1, "x")], ["doc_id", "text"]),
            [("a", "")])


def test_byte_unicode_table_is_the_gpt2_bijection():
    t = tokenize.BYTE_UNICODE
    assert len(t) == 256 and len(set(t.values())) == 256
    # printable latin maps to itself
    assert t[ord("a")] == "a" and t[ord("!")] == "!"
    # the classic anchors: space -> Ġ, newline -> Ċ
    assert t[0x20] == "Ġ" and t[0x0A] == "Ċ"
    assert tokenize.BYTE_ALPHABET[0x41] == "A"


def test_bpe_bytes_train_hand_computed(spark):
    """Weighted byte-level training on a 2-doc corpus: chunk counts
    weight the pair counts ('the' x2 + ' the' x1), ties break
    lexicographically in mapped space, and learned merges feed
    bpe_bytes_apply directly."""
    g = tokenize.BYTE_UNICODE[0x20]
    df = spark.createDataFrame([(1, "the the"), (2, "the")],
                               ["doc_id", "text"])
    merges = tokenize.bpe_bytes_train(df, n_merges=3)
    # (t,h) and (h,e) both weigh 3; 'h' < 't' wins the tie
    assert merges == [("h", "e", 3), ("t", "he", 3), (g, "the", 1)]
    toks = {r["doc_id"]: r["tokens"] for r in tokenize.bpe_bytes_apply(
        df, [(l, r) for l, r, _ in merges]).collect()}
    assert toks[1] == ["the", g + "the"]
    assert toks[2] == ["the"]
    with pytest.raises(ValueError, match="n_merges"):
        tokenize.bpe_bytes_train(df, n_merges=0)


def test_wordpiece_train_likelihood_objective(spark):
    """WordPiece training maximizes count(xy)/(count(x)count(y)), not
    the raw pair count: on 'aa aa aa ab' BPE would merge (a,a) (count
    3) but WordPiece merges (a, ##b): pair counts 3 vs 1, yet the
    ratios are 3/(4*5) vs 1/(4*1) — rare but perfectly cohesive
    wins."""
    df = spark.createDataFrame([(1, "aa aa aa ba ba ab")],
                               ["doc_id", "text"])
    merges = tokenize.wordpiece_train(df, n_merges=1)
    assert merges[0][:3] == ("a", "##b", "ab")
    assert merges[0][3:] == (1, 4, 1)     # pair, left, right counts
    bpe_pick = tokenize.bpe_train(df, n_merges=1)[0]
    assert (bpe_pick[0], bpe_pick[1]) == ("a", "a")   # the contrast


def test_wordpiece_train_hand_computed_and_feeds_apply(spark):
    """Three hand-walked ranks on 'the the th' (incl. two exact ratio
    ties broken lexicographically), and the learned pieces drive
    wordpiece_apply directly."""
    df = spark.createDataFrame([(1, "the the th")], ["doc_id", "text"])
    merges = tokenize.wordpiece_train(df, n_merges=3)
    assert merges == [("##h", "##e", "##he", 2, 3, 2),
                      ("t", "##h", "th", 1, 3, 1),
                      ("t", "##he", "the", 2, 2, 2)]
    vocab = (["t", "h", "e"] + ["##h", "##e"]
             + [m[2] for m in merges])
    toks = tokenize.wordpiece_apply(df, vocab).first()["tokens"]
    assert toks == ["the", "the", "th"]
    with pytest.raises(ValueError, match="n_merges"):
        tokenize.wordpiece_train(df, n_merges=0)
