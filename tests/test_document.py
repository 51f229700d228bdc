"""Document router (datapipe/document.py — r14)."""

import pytest

from pypond_spark.datapipe.document import extract_documents, route_document
from pypond_spark.datapipe.pdf import encode_pdf
from pypond_spark.datapipe.rtf import encode_rtf
from pypond_spark.datapipe.tarshard import encode_zip_shard
from pypond_spark.datapipe.zipdoc import encode_docx, encode_epub, encode_odt


def test_routes_every_format_by_content():
    assert route_document(encode_pdf(["p1", "p2"])) == \
        ("pdf", "p1\np2", 2)
    assert route_document(encode_docx(["a", "b"])) == \
        ("docx", "a\nb", 2)
    assert route_document(encode_epub(
        [("T", ["x"]), ("U", ["y"])])) == ("epub", "T\nx\nU\ny", 2)
    assert route_document(encode_odt(["a"], heading="H")) == \
        ("odt", "H\na", 2)
    assert route_document(encode_rtf(["r one", "r two"])) == \
        ("rtf", "r one\nr two", 2)
    fmt, text, n = route_document(b"<!DOCTYPE html><html><body>x")
    assert fmt == "html" and "x" in text and n == 1
    assert route_document(b"just plain words") == \
        ("text", "just plain words", 1)


def test_junk_labels_unknown_but_bad_known_formats_raise():
    # undecodable binary: labeled, never raised
    assert route_document(b"\x00\xff\xfegarbage")[0] == "unknown"
    # a zip that is none of the known document layouts
    z = encode_zip_shard([("a", {"txt": b"x"})])
    assert route_document(z) == ("unknown", None, 0)
    # but structural corruption INSIDE a recognized format stays loud
    with pytest.raises(ValueError):
        route_document(b"%PDF-1.4\nnot really a pdf")
    with pytest.raises(ValueError):
        route_document(b"{\\rtf1 {never closed")


def test_spark_tier(spark):
    blobs = spark.createDataFrame(
        [(1, encode_pdf(["pg"])), (2, encode_rtf(["rt"])),
         (3, b"plain"), (4, b"\x00\xff"), (5, None)],
        "doc_id long, content binary")
    rows = extract_documents(blobs).orderBy("doc_id").collect()
    assert [(r.doc_id, r.format, r.text, r.n_units) for r in rows] \
        == [(1, "pdf", "pg", 1), (2, "rtf", "rt", 1),
            (3, "text", "plain", 1), (4, "unknown", None, 0)]
