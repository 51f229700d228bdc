"""RTF text extraction (datapipe/rtf.py — r14)."""

import pytest

from pypond_spark.datapipe.rtf import encode_rtf, extract_rtf_text, rtf_text


def test_roundtrip_escapes_and_breaks():
    paras = ["hello world", "naïve café — ünïcode", "tab\there",
             "break\nline", "braces {x} \\ back", "日本語テキスト",
             "emoji 🚀 astral"]
    data = encode_rtf(paras)
    text, n = rtf_text(data)
    assert text == "\n".join(paras)
    assert n == 8                             # internal \line adds one
    assert data == encode_rtf(paras)
    # chrome groups (fonttbl/colortbl/info/\*generator) strip to nothing
    bare, _ = rtf_text(encode_rtf(["x"], with_chrome=False))
    assert bare == "x"


def test_hand_written_features():
    # group-scoped \ucN, negative \u surrogate pair, \~ nbsp, \emdash
    s = (rb"{\rtf1\ansi{\fonttbl{\f0 X;}}\uc2 A\u-10179 ??\u-8704 ??"
         rb" B\~C\emdash D\par }")
    t, n = rtf_text(s)
    assert t == "A\U0001f600 B C—D"
    assert n == 1
    # \uc is group-scoped: uc2 inside a group, uc1 restored outside
    s = rb"{\rtf1\uc1 {\uc2 \u233 xx}\u233 x tail\par }"
    t, _ = rtf_text(s)
    assert t == "\xe9\xe9 tail"
    # codepage switch: \'e9 through cp1251 is Cyrillic
    s = rb"{\rtf1\ansi\ansicpg1251 \'e9\par }"
    assert rtf_text(s)[0] == "й"         # CYRILLIC SMALL I KRATKOYE
    # quote/dash words
    s = rb"{\rtf1 \ldblquote q\rdblquote \endash \bullet\par }"
    assert rtf_text(s)[0] == "“q”–•"


def test_destination_skipping():
    # pict payload and field instructions never surface
    s = (rb"{\rtf1 before {\pict 0011aabb}{\field{\*\fldinst HYPERLINK"
         rb" http://x}{\fldrslt shown}} after\par }")
    t, _ = rtf_text(s)
    assert t == "before shown after"


def test_errors():
    with pytest.raises(ValueError, match="rtf header"):
        rtf_text(b"plain text")
    with pytest.raises(ValueError, match="unbalanced '{'"):
        rtf_text(rb"{\rtf1 {group never closes\par ")
    with pytest.raises(ValueError, match="unbalanced '}'"):
        rtf_text(rb"{\rtf1 x}}")
    with pytest.raises(ValueError, match="truncated"):
        rtf_text(rb"{\rtf1 \'a")
    with pytest.raises(ValueError, match="truncated RTF control"):
        rtf_text(b"{\\rtf1 x\\")


def test_spark_tier(spark):
    docs = spark.createDataFrame(
        [(1, encode_rtf(["p one", "p two"])),
         (2, encode_rtf(["solo é €"])),
         (3, None)],
        "doc_id long, content binary")
    rows = extract_rtf_text(docs).orderBy("doc_id").collect()
    assert [(r.doc_id, r.text, r.n_paragraphs) for r in rows] == [
        (1, "p one\np two", 2), (2, "solo é €", 1)]
