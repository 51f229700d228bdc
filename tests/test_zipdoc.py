"""ZIP-container documents: DOCX/EPUB extraction + zip shards
(datapipe/zipdoc.py, datapipe/tarshard.py zip half — r14)."""

import pytest
from pyspark.sql import functions as F

from pypond_spark.datapipe import tarshard, zipdoc


SAMPLES = [
    ("00000001", {"txt": b"caption one", "json": b'{"a":1}',
                  "img.bin": b"\x00\x01\xff"}),
    ("00000002", {"txt": b"caption two"}),
    ("sub/dir/00000003", {"txt": b"nested", "cls": b"7"}),
]


# ------------------------------------------------------- zip shards

def test_zip_roundtrip_members_and_determinism():
    data = tarshard.encode_zip_shard(SAMPLES)
    members = tarshard.parse_zip_members(data)
    assert [n for n, _ in members] == [
        "00000001.img.bin", "00000001.json", "00000001.txt",
        "00000002.txt", "sub/dir/00000003.cls",
        "sub/dir/00000003.txt"]
    assert dict(members)["00000001.img.bin"] == b"\x00\x01\xff"
    assert data == tarshard.encode_zip_shard(SAMPLES)
    stored = tarshard.encode_zip_shard(SAMPLES, compress=False)
    assert tarshard.parse_zip_members(stored) == members
    assert stored == tarshard.encode_zip_shard(SAMPLES,
                                               compress=False)


def test_zip_corrupt_raises():
    with pytest.raises(ValueError, match="corrupt zip"):
        tarshard.parse_zip_members(b"PK\x03\x04not really a zip")
    with pytest.raises(ValueError, match="corrupt zip"):
        tarshard.parse_zip_members(b"")
    # truncated central directory
    good = tarshard.encode_zip_shard(SAMPLES)
    with pytest.raises(ValueError, match="corrupt zip"):
        tarshard.parse_zip_members(good[:len(good) - 7])


def test_zip_members_spark(spark):
    shards = spark.createDataFrame(
        [(1, tarshard.encode_zip_shard(SAMPLES)),
         (2, tarshard.encode_zip_shard(SAMPLES, compress=False)),
         (3, None)],
        "shard_id long, content binary")
    rows = (tarshard.read_zip_members(shards)
            .orderBy("shard_id", "member_name").collect())
    assert len(rows) == 12                    # null shard skipped
    r = rows[0]
    assert (r.shard_id, r.member_name, r.sample_key, r.ext) \
        == (1, "00000001.img.bin", "00000001", "img.bin")
    assert bytes(r.data) == b"\x00\x01\xff"
    assert r.n_bytes == 3


# ------------------------------------------------------------- DOCX

def test_docx_roundtrip_runs_tabs_breaks_table():
    paras = ["hello world", "a\tb", "x\ny", "  spaced  ", ""]
    data = zipdoc.encode_docx(paras, table_cells=["c0", "c&1"])
    text, n = zipdoc.docx_text(data)
    assert text == "hello world\na\tb\nx\ny\n  spaced  \n\nc0\nc&1"
    assert n == 7
    assert data == zipdoc.encode_docx(paras,
                                      table_cells=["c0", "c&1"])


def test_docx_xml_escaping_and_unicode():
    paras = ["<tag> & 'quote' \"dq\"", "naïve café — ünïcode 字"]
    text, n = zipdoc.docx_text(zipdoc.encode_docx(paras))
    assert text == "\n".join(paras)
    assert n == 2


def test_docx_malformed_raises():
    with pytest.raises(ValueError, match="corrupt zip"):
        zipdoc.docx_text(b"PK\x03\x04junk")
    with pytest.raises(ValueError, match="without word/document"):
        zipdoc.docx_text(tarshard.zip_bytes([("other.xml", b"<x/>")]))
    with pytest.raises(ValueError, match="malformed"):
        zipdoc.docx_text(tarshard.zip_bytes(
            [("word/document.xml", b"<w:document>unclosed")]))


def test_docx_spark(spark):
    docs = spark.createDataFrame(
        [(1, zipdoc.encode_docx(["p one", "p two"])),
         (2, zipdoc.encode_docx(["solo\twith tab"])),
         (3, None)],
        "doc_id long, content binary")
    rows = (zipdoc.extract_docx_text(docs)
            .orderBy("doc_id").collect())
    assert [(r.doc_id, r.text, r.n_paragraphs) for r in rows] == [
        (1, "p one\np two", 2), (2, "solo\twith tab", 1)]


# ------------------------------------------------------------- EPUB

def test_epub_spine_order_beats_storage_order():
    chapters = [("First", ["alpha", "beta"]),
                ("Second", ["gamma"]),
                ("Third", ["delta", "epsilon"])]
    fwd = zipdoc.encode_epub(chapters)
    rev = zipdoc.encode_epub(chapters, reverse_storage=True)
    assert fwd != rev                        # storage really differs
    want = [(0, "First\nalpha\nbeta"), (1, "Second\ngamma"),
            (2, "Third\ndelta\nepsilon")]
    assert zipdoc.epub_chapters(fwd) == want
    assert zipdoc.epub_chapters(rev) == want  # spine order wins
    assert fwd == zipdoc.encode_epub(chapters)


def test_epub_xhtml_text_blocks_and_whitespace():
    # inline elements glue, block elements split, whitespace collapses
    xhtml = (b'<html xmlns="http://www.w3.org/1999/xhtml">'
             b"<head><title>skip me</title></head><body>"
             b"<p>a <b>bold</b> word</p><div>  two\n  spaces </div>"
             b"<script>ignore()</script><p></p><p>last</p>"
             b"</body></html>")
    assert zipdoc.xhtml_text(xhtml) == "a bold word\ntwo spaces\nlast"


def test_epub_malformed_raises():
    with pytest.raises(ValueError, match="container.xml"):
        zipdoc.epub_chapters(tarshard.zip_bytes(
            [("mimetype", b"application/epub+zip")]))
    # spine idref pointing nowhere
    bad_opf = (b'<?xml version="1.0"?>'
               b'<package xmlns="http://www.idpf.org/2007/opf">'
               b'<manifest/><spine><itemref idref="ghost"/></spine>'
               b"</package>")
    container = (b'<?xml version="1.0"?><container xmlns="urn:oasis:'
                 b'names:tc:opendocument:xmlns:container">'
                 b'<rootfiles><rootfile full-path="content.opf"/>'
                 b"</rootfiles></container>")
    data = tarshard.zip_bytes([("META-INF/container.xml", container),
                               ("content.opf", bad_opf)])
    with pytest.raises(ValueError, match="not in manifest"):
        zipdoc.epub_chapters(data)
    # missing rootfile member
    data = tarshard.zip_bytes([("META-INF/container.xml", container)])
    with pytest.raises(ValueError, match="missing"):
        zipdoc.epub_chapters(data)


def test_epub_spark(spark):
    docs = spark.createDataFrame(
        [(1, zipdoc.encode_epub([("T1", ["a"]), ("T2", ["b"])],
                                reverse_storage=True)),
         (2, zipdoc.encode_epub([("Solo", ["only"])]))],
        "doc_id long, content binary")
    rows = (zipdoc.extract_epub_text(docs)
            .orderBy("doc_id", "chapter_no").collect())
    assert [(r.doc_id, r.chapter_no, r.text) for r in rows] == [
        (1, 0, "T1\na"), (1, 1, "T2\nb"), (2, 0, "Solo\nonly")]


def test_docx_feeds_quality_pipeline(spark):
    """Composition: extracted DOCX text flows into gopher_quality
    unchanged (the corpus-build path the driver row verifies)."""
    from pypond_spark.datapipe import textstats

    words = " ".join(["the to of and that have with be"] * 8)
    docs = spark.createDataFrame(
        [(1, zipdoc.encode_docx([words]))],
        "doc_id long, content binary")
    ex = zipdoc.extract_docx_text(docs).drop("n_paragraphs")
    row = textstats.gopher_quality(ex).collect()[0]
    assert row.n_words == 64
    assert row.gopher_pass


# -------------------------------------------------------------- ODT

def test_odt_roundtrip_tabs_breaks_spaces_heading():
    paras = ["hello world", "a\tb", "x\ny", "two  spaces",
             "tri   ple", "end space "]
    data = zipdoc.encode_odt(paras, heading="Head & <Title>")
    text, n = zipdoc.odt_text(data)
    assert text == ("Head & <Title>\nhello world\na\tb\nx\ny\n"
                    "two  spaces\ntri   ple\nend space ")
    assert n == 7
    assert data == zipdoc.encode_odt(paras, heading="Head & <Title>")
    # mimetype member is FIRST and STORED (ODF package rule)
    import zipfile, io
    zf = zipfile.ZipFile(io.BytesIO(data))
    first = zf.infolist()[0]
    assert first.filename == "mimetype"
    assert first.compress_type == zipfile.ZIP_STORED


def test_odt_malformed_raises():
    with pytest.raises(ValueError, match="corrupt zip"):
        zipdoc.odt_text(b"PK\x03\x04junk")
    with pytest.raises(ValueError, match="without content.xml"):
        zipdoc.odt_text(tarshard.zip_bytes([("styles.xml", b"<x/>")]))
    with pytest.raises(ValueError, match="malformed"):
        zipdoc.odt_text(tarshard.zip_bytes(
            [("content.xml", b"<office:document-content>")]))


def test_odt_spark(spark):
    docs = spark.createDataFrame(
        [(1, zipdoc.encode_odt(["p one", "p two"])),
         (2, zipdoc.encode_odt(["solo"], heading="H")),
         (3, None)],
        "doc_id long, content binary")
    rows = (zipdoc.extract_odt_text(docs)
            .orderBy("doc_id").collect())
    assert [(r.doc_id, r.text, r.n_paragraphs) for r in rows] == [
        (1, "p one\np two", 2), (2, "H\nsolo", 2)]


def test_zip_samples_pairing_spark(spark):
    shards = spark.createDataFrame(
        [(1, tarshard.encode_zip_shard(SAMPLES))],
        "shard_id long, content binary")
    rows = (tarshard.read_zip_samples(shards)
            .orderBy("sample_key").collect())
    assert [(r.sample_key, r.n_parts) for r in rows] == [
        ("00000001", 3), ("00000002", 1), ("sub/dir/00000003", 2)]
    assert bytes(rows[0].parts["img.bin"]) == b"\x00\x01\xff"
