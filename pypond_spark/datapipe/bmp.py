"""Pure-Python BMP (Windows DIB) codec — no external libraries.

The fourth real crawl image format behind ``multimodal.decode_image``
(after PNG, baseline JPEG and GIF): uncompressed (BI_RGB) 24-bit
truecolor and 8-bit palette bitmaps with the 40-byte
``BITMAPINFOHEADER`` (and its 52/56/108/124-byte extensions, which
only append fields), bottom-up or top-down row order, 4-byte row
padding.  BMP is LOSSLESS, so like PNG/GIF the encode->decode
roundtrip is bit-exact and the perceptual-hash driver row can reuse
the chained-md5 PPM oracle verbatim.

Compressed variants (RLE4/RLE8, BI_BITFIELDS beyond the identity
masks), 1/4/16/32-bpp and the legacy BITMAPCOREHEADER raise
``NotImplementedError`` — honest gaps, same contract as the other
codecs in this tier.

Scale: decode runs per image inside Arrow ``mapInPandas`` batches
(multimodal.py plan shape — zero shuffle, scan-parallel); rows are
numpy-sliced, not per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HEADER = struct.Struct("<2sIHHI")   # magic, size, res1, res2, offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")


def decode_bmp(content: bytes) -> dict:
    """Decode an uncompressed 24-bpp truecolor or 8-bpp palette BMP.

    Returns the ``decode_image`` contract: ``{"format": "bmp",
    "width", "height", "maxval": 255, "pixels"}`` with pixels as raw
    interleaved RGB bytes, top-down row order regardless of the file's
    stored orientation.
    """
    if len(content) < _FILE_HEADER.size + _INFO_HEADER.size:
        raise ValueError("truncated BMP: missing headers")
    magic, _fsize, _r1, _r2, data_off = _FILE_HEADER.unpack_from(content, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP (magic {magic!r})")
    (hsize, width, height, planes, bpp, compression, _isize,
     _xppm, _yppm, clr_used, _clr_imp) = _INFO_HEADER.unpack_from(
        content, _FILE_HEADER.size)
    if hsize < 40:
        raise NotImplementedError(
            f"only BITMAPINFOHEADER-family BMPs decode (header size "
            f"{hsize}; the 12-byte BITMAPCOREHEADER does not)")
    if planes != 1:
        raise ValueError(f"BMP planes must be 1, got {planes}")
    # BI_RGB only; BI_BITFIELDS et al. are the compressed/remapped tier
    if compression != 0:
        raise NotImplementedError(
            f"only uncompressed BI_RGB BMPs decode (compression "
            f"{compression})")
    if bpp not in (8, 24):
        raise NotImplementedError(
            f"only 8-bpp palette and 24-bpp truecolor BMPs decode "
            f"(bpp {bpp})")
    if width < 1 or height == 0:
        raise ValueError(f"bad BMP dimensions {width}x{height}")
    top_down = height < 0
    height = abs(height)

    palette = None
    if bpp == 8:
        n_colors = clr_used or 256
        if not 0 < n_colors <= 256:
            raise ValueError(f"bad BMP palette size {n_colors}")
        pal_off = _FILE_HEADER.size + hsize
        raw = content[pal_off:pal_off + 4 * n_colors]
        if len(raw) != 4 * n_colors:
            raise ValueError("truncated BMP palette")
        # stored BGRA; we want RGB triples
        pal = np.frombuffer(raw, np.uint8).reshape(n_colors, 4)
        palette = pal[:, [2, 1, 0]].copy()

    row_bytes = (width * bpp // 8 + 3) & ~3
    need = row_bytes * height
    data = content[data_off:data_off + need]
    if len(data) != need:
        raise ValueError(
            f"truncated BMP pixel data: expected {need} bytes, "
            f"got {len(data)}")
    rows = np.frombuffer(data, np.uint8).reshape(height, row_bytes)
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        bgr = rows[:, :width * 3].reshape(height, width, 3)
        rgb = bgr[:, :, ::-1]
    else:
        idx = rows[:, :width]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("BMP palette index out of range")
        rgb = palette[idx]
    return {"format": "bmp", "width": width, "height": height,
            "maxval": 255, "pixels": np.ascontiguousarray(rgb).tobytes()}


def encode_bmp(width: int, height: int, pixels: bytes,
               top_down: bool = False) -> bytes:
    """Minimal 24-bpp BI_RGB BMP encoder (the synthesis half of
    :func:`decode_bmp`): interleaved RGB in, classic bottom-up BGR
    rows with 4-byte padding out (``top_down=True`` writes a
    negative-height top-down file — both orientations decode to the
    same pixels).  Lossless: ``decode_bmp(encode_bmp(px))["pixels"]
    == px`` bit-for-bit."""
    if width < 1 or height < 1:
        raise ValueError(
            f"image dimensions must be >= 1, got {width}x{height}")
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, "
                         f"got {len(pixels)}")
    rgb = np.frombuffer(pixels, np.uint8).reshape(height, width, 3)
    bgr = rgb[:, :, ::-1]
    row_bytes = (width * 3 + 3) & ~3
    rows = np.zeros((height, row_bytes), np.uint8)
    rows[:, :width * 3] = bgr.reshape(height, width * 3)
    if not top_down:
        rows = rows[::-1]
    data = rows.tobytes()
    data_off = _FILE_HEADER.size + 40
    info = _INFO_HEADER.pack(40, width,
                             -height if top_down else height,
                             1, 24, 0, len(data), 2835, 2835, 0, 0)
    head = _FILE_HEADER.pack(b"BM", data_off + len(data), 0, 0, data_off)
    return head + info + data
