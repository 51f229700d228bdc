"""PDF text extraction (datapipe/pdf.py) — object grammar, stream
filters, document walk, content-stream text ops, ToUnicode CMaps,
the deterministic encoder, and the Spark tier."""

import base64
import binascii
import struct
import zlib

import pytest

from pypond_spark.datapipe import pdf


def test_roundtrip_all_show_forms():
    pages = ["hello world\nsecond line (with) \\ parens\tand tab",
             "page two\nmore text here",
             ""]
    for form in ("literal", "hex", "tj"):
        for comp in (True, False):
            data = pdf.encode_pdf(pages, compress=comp,
                                  string_form=form)
            assert pdf.pdf_text_pages(data) == pages, (form, comp)


def test_encoder_is_deterministic_and_valid():
    pages = ["alpha\nbeta", "gamma"]
    a = pdf.encode_pdf(pages)
    b = pdf.encode_pdf(pages)
    assert a == b
    assert a.startswith(b"%PDF-1.4")
    assert a.rstrip().endswith(b"%%EOF")
    # the classic xref offsets actually point at the objects
    xref_at = int(a[a.rindex(b"startxref") + 9:a.rindex(b"%%EOF")])
    assert a[xref_at:xref_at + 4] == b"xref"
    lines = a[xref_at:].split(b"\n")
    for num, ln in enumerate(lines[2:2 + 7]):      # 7 objects
        off = int(ln.split()[0])
        if num == 0:
            continue                                # free head
        assert a[off:].startswith(b"%d 0 obj" % num)


def test_string_escapes_and_octal():
    # hand-built content: octal escapes, line continuation, nested
    # parens, \r\n normalization inside strings
    content = (b"BT /F1 12 Tf 72 720 Td "
               b"(A\\101\\x(nest)\\\n cont) Tj ET")
    data = _one_page_pdf(content)
    [text] = pdf.pdf_text_pages(data)
    # \101 = 'A'; \x -> literal x; \<newline> -> dropped
    assert text == "AAx(nest) cont"


def _one_page_pdf(content: bytes, extra_objs: bytes = b"",
                  fonts: bytes = b"", filters: bytes = b"",
                  contents_ref: bytes = b"4 0 R") -> bytes:
    """Minimal hand-assembled single-page PDF (no xref needed — the
    parser brute-scans objects)."""
    res = b"<< /Font << " + (fonts or b"/F1 9 0 R") + b" >> >>"
    return (b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> "
            b"endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /Resources "
            + res + b" /Contents " + contents_ref + b" >> endobj\n"
            b"4 0 obj << /Length " + str(len(content)).encode()
            + filters + b" >>\nstream\n" + content
            + b"\nendstream endobj\n"
            b"9 0 obj << /Type /Font /Subtype /Type1 /BaseFont "
            b"/Helvetica >> endobj\n"
            b"trailer << /Size 10 /Root 1 0 R >>\n%%EOF\n")


def test_contents_array_concatenation():
    c1 = b"BT /F1 12 Tf 72 720 Td (part one ) Tj"
    c2 = b"(part two) Tj ET"
    data = (b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> "
            b"endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /Contents "
            b"[4 0 R 5 0 R] >> endobj\n"
            b"4 0 obj << /Length " + str(len(c1)).encode()
            + b" >>\nstream\n" + c1 + b"\nendstream endobj\n"
            b"5 0 obj << /Length " + str(len(c2)).encode()
            + b" >>\nstream\n" + c2 + b"\nendstream endobj\n"
            b"trailer << /Size 6 /Root 1 0 R >>\n%%EOF\n")
    assert pdf.pdf_text_pages(data) == ["part one part two"]


def test_indirect_length_and_missing_xref():
    c = b"BT /F1 12 Tf 72 720 Td (indirect) Tj ET"
    data = (b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> "
            b"endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b">> endobj\n"
            b"4 0 obj << /Length 7 0 R >>\nstream\n" + c
            + b"\nendstream endobj\n"
            b"7 0 obj " + str(len(c)).encode() + b" endobj\n"
            b"trailer << /Size 8 /Root 1 0 R >>\n%%EOF\n")
    assert pdf.pdf_text_pages(data) == ["indirect"]


def test_object_stream_expansion():
    # page + catalog dicts live inside a Flate-compressed /ObjStm —
    # the PDF 1.5+ layout; no classic trailer at all (the /Root comes
    # from the XRef stream dict)
    c = b"BT /F1 12 Tf 72 720 Td (from objstm) Tj ET"
    inner = (b"<< /Type /Catalog /Pages 2 0 R >>"
             b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
             b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    o1 = b"<< /Type /Catalog /Pages 2 0 R >>"
    o2 = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    o3 = b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    header = b"1 0 2 %d 3 %d " % (len(o1), len(o1) + len(o2))
    payload = header + o1 + o2 + o3
    comp = zlib.compress(payload, 9)
    objstm_hdr = (b"5 0 obj << /Type /ObjStm /N 3 /First %d "
                  b"/Length %d /Filter /FlateDecode >>\nstream\n"
                  % (len(header), len(comp)))
    data = (b"%PDF-1.5\n" + objstm_hdr
            + comp + b"\nendstream endobj\n"
            b"4 0 obj << /Length " + str(len(c)).encode()
            + b" >>\nstream\n" + c + b"\nendstream endobj\n"
            b"6 0 obj << /Type /XRef /Size 7 /Root 1 0 R /Length 1 "
            b">>\nstream\n\x00\nendstream endobj\n"
            b"%%EOF\n")
    assert pdf.pdf_text_pages(data) == ["from objstm"]
    assert inner  # silence unused warning


def test_tounicode_cmap_two_byte():
    # Identity-H-style 2-byte codes mapped to CJK + BMP text via
    # bfchar and bfrange
    cmap = (b"/CIDInit /ProcSet findresource begin\n"
            b"1 begincodespacerange\n<0000> <FFFF>\n"
            b"endcodespacerange\n"
            b"2 beginbfchar\n"
            b"<0001> <4F60>\n"                      # U+4F60
            b"<0002> <597D>\n"                      # U+597D
            b"endbfchar\n"
            b"1 beginbfrange\n"
            b"<0010> <0012> <0041>\n"               # A B C
            b"endbfrange\nendcmap\n")
    comp = zlib.compress(cmap, 9)
    fonts = (b"/F1 9 0 R")
    content = (b"BT /F1 12 Tf 72 720 Td "
               b"<00010002> Tj (=) Tj <001000110012> Tj ET")
    data = (b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> "
            b"endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << " + fonts + b" >> >> /Contents 4 0 R >> "
            b"endobj\n"
            b"4 0 obj << /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream endobj\n"
            b"9 0 obj << /Type /Font /Subtype /Type0 /BaseFont "
            b"/Fake /ToUnicode 10 0 R >> endobj\n"
            b"10 0 obj << /Length %d /Filter /FlateDecode >>"
            b"\nstream\n" % len(comp) + comp
            + b"\nendstream endobj\n"
            b"trailer << /Size 11 /Root 1 0 R >>\n%%EOF\n")
    assert pdf.pdf_text_pages(data) == ["你好=ABC"]


def test_bfrange_array_destination():
    cmap = (b"1 begincodespacerange <00> <FF> endcodespacerange\n"
            b"1 beginbfrange <41> <43> [<0058> <0059> <005A>] "
            b"endbfrange\n")
    dec = pdf._cmap_decoder(cmap)
    assert dec(b"ABC") == "XYZ"
    # unmapped bytes fall back to latin-1
    assert dec(b"A!/") == "X!/"


def test_filter_chains():
    text = b"BT /F1 12 Tf 72 720 Td (filtered) Tj ET"
    fl = zlib.compress(text, 9)
    cases = [
        (b" /Filter /ASCIIHexDecode",
         binascii.hexlify(text) + b">"),
        (b" /Filter /ASCII85Decode",
         base64.a85encode(text) + b"~>"),
        (b" /Filter [/ASCIIHexDecode /FlateDecode]",
         binascii.hexlify(fl) + b">"),
        (b" /Filter [/ASCII85Decode /FlateDecode]",
         base64.a85encode(fl) + b"~>"),
        (b" /Filter /RunLengthDecode", _rle_encode(text)),
        (b" /Filter /LZWDecode", _lzw_encode_trivial(text)),
    ]
    for filt, payload in cases:
        data = _one_page_pdf(payload, filters=filt)
        assert pdf.pdf_text_pages(data) == ["filtered"], filt


def _rle_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        chunk = data[i:i + 100]
        out.append(len(chunk) - 1)
        out += chunk
        i += len(chunk)
    out.append(128)
    return bytes(out)


def _lzw_encode_trivial(data: bytes) -> bytes:
    """Degenerate TIFF-LZW: clear-code before every literal keeps the
    table fixed at 258 entries and the width at 9 bits."""
    acc = nbits = 0
    out = bytearray()

    def put(code):
        nonlocal acc, nbits
        acc = (acc << 9) | code
        nbits += 9
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    put(256)
    for b in data:
        put(b)
        put(256)
    put(257)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_png_predictor_up():
    # predictor 2 (Up) rows over a Flate stream, via the filter layer
    rows = [bytes([1, 2, 3, 4]), bytes([5, 6, 7, 8])]
    enc = bytearray()
    prev = bytes(4)
    for r in rows:
        enc.append(2)
        enc += bytes((a - b) & 0xFF for a, b in zip(r, prev))
        prev = r
    sdict = {"Filter": "FlateDecode",
             "DecodeParms": {"Predictor": 12, "Columns": 4}}
    got = pdf._decode_stream(sdict, zlib.compress(bytes(enc)),
                             lambda x: x)
    assert got == b"".join(rows)


def test_tj_word_gap_and_newlines():
    content = (b"BT /F1 12 Tf 72 720 Td "
               b"[(big) -250 (gap)] TJ "
               b"[(no) -50 (gap)] TJ "
               b"T* (next) Tj "
               b"(quoted) ' "
               b"1 2 (dquoted) \" ET")
    [text] = pdf.pdf_text_pages(_one_page_pdf(content))
    assert text == "big gapnogap\nnext\nquoted\ndquoted"


def test_inline_image_skipped():
    img = bytes(range(256))                        # arbitrary binary
    content = (b"BT /F1 12 Tf 72 720 Td (before) Tj ET\n"
               b"BI /W 16 /H 16 /BPC 8 /CS /G ID " + img
               + b" EI\nBT 72 700 Td (after) Tj ET")
    [text] = pdf.pdf_text_pages(_one_page_pdf(content))
    assert text == "before\nafter"


def test_nested_pages_tree_and_inherited_resources():
    c1 = b"BT /F1 12 Tf 72 720 Td (leaf one) Tj ET"
    c2 = b"BT /F1 12 Tf 72 720 Td (leaf two) Tj ET"
    data = (b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [10 0 R 3 0 R] /Count 2 "
            b"/Resources << /Font << /F1 9 0 R >> >> >> endobj\n"
            b"10 0 obj << /Type /Pages /Kids [11 0 R] /Count 1 >> "
            b"endobj\n"
            b"11 0 obj << /Type /Page /Parent 10 0 R /Contents "
            b"4 0 R >> endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R "
            b">> endobj\n"
            b"4 0 obj << /Length " + str(len(c1)).encode()
            + b" >>\nstream\n" + c1 + b"\nendstream endobj\n"
            b"5 0 obj << /Length " + str(len(c2)).encode()
            + b" >>\nstream\n" + c2 + b"\nendstream endobj\n"
            b"9 0 obj << /Type /Font >> endobj\n"
            b"trailer << /Size 12 /Root 1 0 R >>\n%%EOF\n")
    assert pdf.pdf_text_pages(data) == ["leaf one", "leaf two"]


def test_errors():
    with pytest.raises(ValueError, match="%PDF-"):
        pdf.pdf_text_pages(b"GIF89a not a pdf at all" + bytes(2000))
    with pytest.raises(NotImplementedError, match="encrypted"):
        pdf.pdf_text_pages(
            b"%PDF-1.4\n1 0 obj << /Type /Catalog >> endobj\n"
            b"trailer << /Root 1 0 R /Encrypt 5 0 R >>\n%%EOF\n")
    with pytest.raises(NotImplementedError, match="filter"):
        pdf.pdf_text_pages(_one_page_pdf(
            b"x", filters=b" /Filter /DCTDecode"))
    with pytest.raises(ValueError, match="catalog"):
        pdf.pdf_text_pages(b"%PDF-1.4\n1 0 obj 42 endobj\n%%EOF\n")
    with pytest.raises(ValueError):
        pdf.encode_pdf(["你"])                  # not Latin-1
    with pytest.raises(ValueError, match="string_form"):
        pdf.encode_pdf(["x"], string_form="bogus")
    # corrupt Flate payload is loud, not silently empty
    with pytest.raises(ValueError, match="Flate"):
        pdf.pdf_text_pages(_one_page_pdf(
            b"\x78\x9c\xff\xff\xff", filters=b" /Filter /FlateDecode"))


def test_spark_extract_pdf_text(spark):
    pages_by_doc = {
        1: ["doc one page one\nline two", "doc one page two"],
        2: ["solo page"],
        3: ["", "x"],
    }
    rows = [(did, pdf.encode_pdf(pgs,
                                 compress=bool(did % 2),
                                 string_form=["literal", "hex",
                                              "tj"][did % 3]))
            for did, pgs in pages_by_doc.items()]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {(r["doc_id"], r["page_no"]): r["text"]
           for r in pdf.extract_pdf_text(df).collect()}
    want = {(did, i): t for did, pgs in pages_by_doc.items()
            for i, t in enumerate(pgs)}
    assert got == want


def test_pdf_info_and_spark_tier(spark):
    """r13 follow-up: /Info metadata + page count, header-only."""
    data = pdf.encode_pdf(["a", "b", "c"], title="T (x)",
                          author="Au\\thor")
    info = pdf.pdf_info(data)
    assert (info["title"], info["author"], info["n_pages"]) \
        == ("T (x)", "Au\\thor", 3)
    assert info["subject"] is None
    assert pdf.pdf_info(pdf.encode_pdf(["x"]))["title"] is None
    with pytest.raises(ValueError, match="Latin-1"):
        pdf.encode_pdf(["x"], title="你")
    df = spark.createDataFrame(
        [(7, pdf.encode_pdf(["p"], title="t7"))],
        "doc_id long, content binary")
    [r] = pdf.extract_pdf_info(df).collect()
    assert (r["doc_id"], r["title"], r["n_pages"]) == (7, "t7", 1)


def test_lzw_encoder_and_lzw_streams():
    """r13 follow-up: a real TIFF-variant LZW ENCODER (width growth
    one entry behind the decoder's table, CLEAR before 12-bit
    overflow) upgrades the LZWDecode path from hand-vector-only to
    roundtrip-tested, and encode_pdf can emit /LZWDecode streams."""
    import numpy as np

    rng = np.random.default_rng(9)
    for n in (0, 1, 253, 254, 255, 509, 510, 1021, 5000, 20000):
        x = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        assert pdf._lzw_decode(pdf.lzw_encode(x)) == x, n
    rep = b"the same phrase over and over " * 300
    enc = pdf.lzw_encode(rep)
    assert pdf._lzw_decode(enc) == rep
    assert len(enc) < len(rep) // 4
    pages = ["lzw page\nsecond line", "page two"]
    data = pdf.encode_pdf(pages, compress="lzw")
    assert b"/LZWDecode" in data
    assert pdf.pdf_text_pages(data) == pages


def test_form_xobject_extraction():
    """r13 follow-up: text inside Form XObjects (Do) — the layout
    template renderers emit; nested forms recurse with layered
    /Resources, image XObjects and reference cycles are inert."""
    pages = ["form page\nline two", "second"]
    for comp in (True, False, "lzw"):
        data = pdf.encode_pdf(pages, compress=comp, via_form=True)
        assert pdf.pdf_text_pages(data) == pages, comp
    # hand-built: page -> form -> nested form with its own font
    c_outer = b"/FmA Do"
    c_inner = b"BT /F1 10 Tf 72 720 Td (deep text) Tj ET"
    data = (b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> "
            b"endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /Resources "
            b"<< /XObject << /Fm0 5 0 R >> >> /Contents 4 0 R >> "
            b"endobj\n"
            b"4 0 obj << /Length 7 >>\nstream\n/Fm0 Do\nendstream "
            b"endobj\n"
            b"5 0 obj << /Type /XObject /Subtype /Form /Resources "
            b"<< /XObject << /FmA 6 0 R >> >> /Length "
            + str(len(c_outer)).encode() + b" >>\nstream\n" + c_outer
            + b"\nendstream endobj\n"
            b"6 0 obj << /Type /XObject /Subtype /Form /Length "
            + str(len(c_inner)).encode() + b" >>\nstream\n" + c_inner
            + b"\nendstream endobj\n"
            b"trailer << /Size 7 /Root 1 0 R >>\n%%EOF\n")
    assert pdf.pdf_text_pages(data) == ["deep text"]
    # a self-referential form terminates via the depth cap
    cyc = data.replace(b"/FmA 6 0 R", b"/FmA 5 0 R")
    assert pdf.pdf_text_pages(cyc) == [""]


def test_short_decodeparms_array_does_not_truncate_filters():
    """r13 review finding: a DecodeParms array shorter than the
    Filter array must pad, not zip-truncate the filter CHAIN."""
    text = b"BT /F1 12 Tf 72 720 Td (padded) Tj ET"
    payload = binascii.hexlify(zlib.compress(text, 9)) + b">"
    data = _one_page_pdf(
        payload,
        filters=b" /Filter [/ASCIIHexDecode /FlateDecode] "
                b"/DecodeParms [null]")
    assert pdf.pdf_text_pages(data) == ["padded"]


def test_indirect_length_payload_cannot_pollute_objmap():
    """r13 review finding: junk 'N 0 obj' text inside the payload of
    a stream with an INDIRECT /Length (whose terminator guess lands
    early on an embedded 'endstream') must not overwrite real
    objects — the re-scan with the true extent wins."""
    # the CONTENT stream has an indirect /Length and its payload
    # embeds both a fake early 'endstream' and a fake catalog
    # redefinition — the first-pass mis-slice must not stick
    body = (b"BT /F1 12 Tf 72 720 Td (good) Tj ET\n"
            b"endstream junk\n"
            b"1 0 obj << /Type /Catalog /Pages 99 0 R >> endobj\n"
            b"% trailing filler so the fake catalog parses\n")
    data = (b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> "
            b"endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b">> endobj\n"
            b"4 0 obj << /Length 7 0 R >>\nstream\n" + body
            + b"\nendstream endobj\n"
            b"7 0 obj " + str(len(body)).encode() + b" endobj\n"
            b"trailer << /Size 8 /Root 1 0 R >>\n%%EOF\n")
    # without the re-scan the fake '1 0 obj' (pointing /Pages at the
    # missing object 99) overwrites the real catalog and extraction
    # dies; with it the page decodes from the full stream
    pages = pdf.pdf_text_pages(data)
    assert len(pages) == 1
    assert "good" in pages[0]


def test_lzw_earlychange_null_treated_as_default():
    """r13 ADVICE: a PDF `null` for /EarlyChange (resolves to None)
    must fall back to the spec default 1, not raise TypeError; an
    explicit 0 stays honored as 'no early change'."""
    text = b"BT /F1 12 Tf 72 700 Td (filtered) Tj ET"
    data = _one_page_pdf(
        _lzw_encode_trivial(text),
        filters=b" /Filter /LZWDecode /DecodeParms "
                b"<< /EarlyChange null >>")
    assert pdf.pdf_text_pages(data) == ["filtered"]
    # explicit 0 uses the late-change table (encoder twin agrees)
    data = _one_page_pdf(
        pdf.lzw_encode(text, early_change=0),
        filters=b" /Filter /LZWDecode /DecodeParms "
                b"<< /EarlyChange 0 >>")
    assert pdf.pdf_text_pages(data) == ["filtered"]
