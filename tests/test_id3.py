"""ID3v2 tag parsing (datapipe/id3.py — r14)."""

import pytest

from pypond_spark.datapipe.id3 import (audio_id3_tags, encode_id3v2,
                                       parse_id3v2)


FIELDS = {"title": "Söng Tïtle", "artist": "art & co",
          "album": "alb", "track": "3", "year": "2001",
          "length_ms": 123456}


@pytest.mark.parametrize("version", [2, 3, 4])
@pytest.mark.parametrize("encoding", ["latin1", "utf16", "utf8"])
def test_roundtrip_matrix(version, encoding):
    if encoding == "utf8" and version != 4:
        with pytest.raises(ValueError, match="2.4-only"):
            encode_id3v2(FIELDS, version=version, encoding=encoding)
        return
    tag = encode_id3v2(FIELDS, version=version, encoding=encoding,
                       padding=5)
    # audio follows the tag; syncsafe size must find the frames
    d = parse_id3v2(tag + b"\xff\xfb\x90\x00" + bytes(64))
    assert d["version"] == f"2.{version}"
    assert d["title"] == FIELDS["title"]
    assert d["artist"] == FIELDS["artist"]
    assert d["album"] == FIELDS["album"]
    assert d["track"] == "3" and d["year"] == "2001"
    assert d["length_ms"] == 123456
    assert d["tag_bytes"] == len(tag)
    assert tag == encode_id3v2(FIELDS, version=version,
                               encoding=encoding, padding=5)


def test_utf16_surrogate_free_bmp_text():
    tag = encode_id3v2({"title": "日本語のタイトル"}, version=3,
                       encoding="utf16")
    assert parse_id3v2(tag)["title"] == "日本語のタイトル"


def test_missing_fields_are_none():
    d = parse_id3v2(encode_id3v2({"title": "only"}, version=4))
    assert d["title"] == "only"
    assert d["artist"] is None and d["album"] is None
    assert d["length_ms"] is None


def test_v24_syncsafe_frame_size_disambiguates():
    """A >127-byte payload: v2.4 stores it syncsafe, v2.3 plain —
    both must parse their own framing."""
    long_title = "x" * 200
    for v in (3, 4):
        d = parse_id3v2(encode_id3v2({"title": long_title,
                                      "artist": "a"}, version=v))
        assert d["title"] == long_title and d["artist"] == "a"


def test_errors():
    with pytest.raises(ValueError, match="magic"):
        parse_id3v2(b"RIFFnot an id3")
    with pytest.raises(ValueError, match="truncated"):
        parse_id3v2(b"ID3\x03\x00")
    with pytest.raises(ValueError, match="version"):
        parse_id3v2(b"ID3\x07\x00\x00\x00\x00\x00\x00")
    with pytest.raises(NotImplementedError, match="unsynchronisation"):
        parse_id3v2(b"ID3\x03\x00\x80\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="bit 7"):
        parse_id3v2(b"ID3\x03\x00\x00\x80\x00\x00\x00")
    # tag claims more bytes than the file holds
    good = encode_id3v2({"title": "t"}, version=3)
    with pytest.raises(ValueError, match="overruns"):
        parse_id3v2(good[:len(good) - 2])
    # compressed/encrypted frame flags are an honest raise
    tag = bytearray(encode_id3v2({"title": "t"}, version=3))
    tag[10 + 8 + 1] = 0xC0                   # frame format flags
    with pytest.raises(NotImplementedError, match="compressed"):
        parse_id3v2(bytes(tag))


def test_spark_tier(spark):
    blobs = spark.createDataFrame(
        [(1, encode_id3v2({"title": "a", "length_ms": 42},
                          version=2) + b"\xff\xfb"),
         (2, encode_id3v2({"title": "b", "artist": "bb"},
                          version=4, encoding="utf8")),
         (3, None)],
        "doc_id long, content binary")
    rows = audio_id3_tags(blobs).orderBy("doc_id").collect()
    assert [(r.doc_id, r.version, r.title, r.artist, r.length_ms)
            for r in rows] == [(1, "2.2", "a", None, 42),
                               (2, "2.4", "b", "bb", None)]


def test_pdf_encrypted_triage(spark):
    """r14: /Encrypt flags instead of raising in pdf_info; text
    extraction keeps its honest raise; strings never surface."""
    from pypond_spark.datapipe import pdf

    data = pdf.encode_pdf(["one", "two"], title="secret",
                          encrypt=True)
    d = pdf.pdf_info(data)
    assert d["encrypted"] is True and d["n_pages"] == 2
    assert d["title"] is None                # never ciphertext/plain
    with pytest.raises(NotImplementedError, match="encrypted"):
        pdf.pdf_text_pages(data)
    plain = pdf.encode_pdf(["one"], title="open")
    d2 = pdf.pdf_info(plain)
    assert d2["encrypted"] is False and d2["title"] == "open"
    df = spark.createDataFrame([(5, data)],
                               "doc_id long, content binary")
    [r] = pdf.extract_pdf_info(df).collect()
    assert (r.encrypted, r.n_pages, r.title) == (True, 2, None)
