"""Pure-Python BMP (Windows DIB) codec — no external libraries.

The fourth real crawl image format behind ``multimodal.decode_image``
(after PNG, baseline JPEG and GIF): uncompressed (BI_RGB) 1/4/8-bpp
palette, 24-bpp truecolor and 32-bpp BGRA bitmaps, plus the RLE8 and
RLE4 run-length compressions (r12 — runs, absolute mode with word
padding, end-of-line / end-of-bitmap / delta escapes; skipped pixels
take palette entry 0 per the common renderer convention), with the
40-byte ``BITMAPINFOHEADER`` (and its 52/56/108/124-byte extensions,
which only append fields), bottom-up or top-down row order, 4-byte
row padding.  BMP is LOSSLESS, so like PNG/GIF the encode->decode
roundtrip is bit-exact and the perceptual-hash driver row can reuse
the chained-md5 PPM oracle verbatim.

16-bpp RGB555 and BI_BITFIELDS mask remapping (16/32-bpp, any
contiguous masks — channels scale to 8 bits round-half-up, identical
to the classic bit replication for 5/6-bit channels) and the legacy
12-byte OS/2 BITMAPCOREHEADER (RGB-triple palettes) decode too (r12);
only BI_JPEG/BI_PNG embeddings and unknown header sizes raise
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


def _decode_rle(data: bytes, width: int, height: int,
                four_bit: bool) -> np.ndarray:
    """RLE8/RLE4 -> (height, width) palette-index grid, BOTTOM-UP row
    order as stored (the caller flips).  Escapes per the DIB spec:
    00 00 = end of line, 00 01 = end of bitmap, 00 02 dx dy = cursor
    delta, 00 n>=3 = absolute run of n pixels (word-aligned); pixels
    never written stay 0."""
    idx = np.zeros((height, width), np.uint8)
    x = y = 0
    i = 0
    n = len(data)
    while i + 1 < n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:                               # encoded run
            if y >= height:
                raise ValueError("BMP RLE run outside bitmap")
            end = min(x + cnt, width)
            if four_bit:
                pair = (val >> 4, val & 0x0F)
                for j in range(x, end):
                    idx[y, j] = pair[(j - x) & 1]
            else:
                idx[y, x:end] = val
            x += cnt
            continue
        if val == 0:                              # end of line
            x, y = 0, y + 1
        elif val == 1:                            # end of bitmap
            return idx
        elif val == 2:                            # delta
            if i + 2 > n:
                raise ValueError("truncated BMP RLE delta")
            x += data[i]
            y += data[i + 1]
            i += 2
        else:                                     # absolute mode
            if y >= height:
                raise ValueError("BMP RLE absolute run outside bitmap")
            nbytes = (val + 1) // 2 if four_bit else val
            nbytes += nbytes & 1                  # word alignment
            if i + nbytes > n:
                raise ValueError("truncated BMP RLE absolute run")
            end = min(x + val, width)
            if four_bit:
                for j in range(x, end):
                    b = data[i + (j - x) // 2]
                    idx[y, j] = (b >> 4) if (j - x) % 2 == 0 \
                        else (b & 0x0F)
            else:
                m = end - x
                idx[y, x:end] = np.frombuffer(
                    data[i:i + m], np.uint8)
            x += val
            i += nbytes
    raise ValueError("BMP RLE data ended without end-of-bitmap escape")


def _decode_bmp_core(content: bytes, data_off: int) -> dict:
    """Legacy 12-byte OS/2 BITMAPCOREHEADER (r12): u16 dimensions,
    always bottom-up, palette entries are RGB TRIPLES (not BGRA
    quads), 1/4/8-bpp palette or 24-bpp BGR — always BI_RGB."""
    width, height, planes, bpp = struct.unpack_from(
        "<HHHH", content, _FILE_HEADER.size + 4)
    if planes != 1:
        raise ValueError(f"BMP planes must be 1, got {planes}")
    if bpp not in (1, 4, 8, 24):
        raise ValueError(f"BITMAPCOREHEADER bpp must be 1/4/8/24, "
                         f"got {bpp}")
    if width < 1 or height < 1:
        raise ValueError(f"bad BMP dimensions {width}x{height}")
    palette = None
    if bpp <= 8:
        pal_off = _FILE_HEADER.size + 12
        n_colors = min((data_off - pal_off) // 3, 1 << bpp)
        if n_colors < 1:
            raise ValueError("truncated BMP core palette")
        raw = content[pal_off:pal_off + 3 * n_colors]
        if len(raw) != 3 * n_colors:
            raise ValueError("truncated BMP core palette")
        pal = np.frombuffer(raw, np.uint8).reshape(n_colors, 3)
        palette = pal[:, ::-1].copy()             # BGR -> RGB
    row_bytes = ((width * bpp + 7) // 8 + 3) & ~3
    need = row_bytes * height
    data = content[data_off:data_off + need]
    if len(data) != need:
        raise ValueError(
            f"truncated BMP pixel data: expected {need} bytes, "
            f"got {len(data)}")
    rows = np.frombuffer(data, np.uint8).reshape(height, row_bytes)
    rows = rows[::-1]                             # always bottom-up
    if bpp == 24:
        rgb = rows[:, :width * 3].reshape(height, width, 3)[:, :, ::-1]
    else:
        if bpp == 8:
            idx = rows[:, :width]
        elif bpp == 4:
            nib = np.empty((height, row_bytes * 2), np.uint8)
            nib[:, 0::2] = rows >> 4
            nib[:, 1::2] = rows & 0x0F
            idx = nib[:, :width]
        else:
            idx = np.unpackbits(rows, axis=1)[:, :width]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("BMP palette index out of range")
        rgb = palette[idx]
    return {"format": "bmp", "width": width, "height": height,
            "maxval": 255, "pixels": np.ascontiguousarray(rgb).tobytes()}


def decode_bmp(content: bytes) -> dict:
    """Decode a BI_RGB 1/4/8-bpp palette, 16-bpp RGB555, 24-bpp
    truecolor or 32-bpp BGRA BMP, an RLE8/RLE4 compressed palette BMP,
    or a BI_BITFIELDS 16/32-bpp mask-remapped BMP.

    Returns the ``decode_image`` contract: ``{"format": "bmp",
    "width", "height", "maxval": 255, "pixels"}`` with pixels as raw
    interleaved RGB bytes, top-down row order regardless of the file's
    stored orientation.
    """
    if len(content) < _FILE_HEADER.size + 12:
        raise ValueError("truncated BMP: missing headers")
    magic, _fsize, _r1, _r2, data_off = _FILE_HEADER.unpack_from(content, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP (magic {magic!r})")
    (hsize,) = struct.unpack_from("<I", content, _FILE_HEADER.size)
    if hsize == 12:                               # OS/2 BITMAPCOREHEADER
        return _decode_bmp_core(content, data_off)
    if hsize < 40:
        raise NotImplementedError(
            f"BMP header size {hsize} is neither BITMAPCOREHEADER (12)"
            f" nor BITMAPINFOHEADER-family (>= 40)")
    if len(content) < _FILE_HEADER.size + _INFO_HEADER.size:
        raise ValueError("truncated BMP: missing headers")
    (hsize, width, height, planes, bpp, compression, isize,
     _xppm, _yppm, clr_used, _clr_imp) = _INFO_HEADER.unpack_from(
        content, _FILE_HEADER.size)
    if planes != 1:
        raise ValueError(f"BMP planes must be 1, got {planes}")
    if compression not in (0, 1, 2, 3):
        raise NotImplementedError(
            f"only BI_RGB / BI_RLE8 / BI_RLE4 / BI_BITFIELDS BMPs "
            f"decode (compression {compression})")
    if compression == 0 and bpp not in (1, 4, 8, 16, 24, 32):
        raise NotImplementedError(
            f"only 1/4/8-bpp palette, 16/24/32-bpp BI_RGB BMPs "
            f"decode (bpp {bpp})")
    if (compression == 1 and bpp != 8) or (compression == 2
                                           and bpp != 4):
        raise ValueError(
            f"BMP RLE{8 if compression == 1 else 4} requires "
            f"{8 if compression == 1 else 4}-bpp, got {bpp}")
    masks = None
    if compression == 3:
        if bpp not in (16, 32):
            raise ValueError(
                f"BMP BI_BITFIELDS requires 16/32-bpp, got {bpp}")
        # the three channel masks sit right after the 40-byte header
        # core (inside the header for the 52+-byte extensions, as a
        # separate block for hsize 40 — same file offset either way)
        moff = _FILE_HEADER.size + 40
        if len(content) < moff + 12:
            raise ValueError("truncated BMP: missing bitfields masks")
        masks = struct.unpack("<III", content[moff:moff + 12])
        if any(m == 0 for m in masks):
            raise ValueError("BMP bitfields mask is zero")
    elif bpp == 16:
        masks = (0x7C00, 0x03E0, 0x001F)          # BI_RGB default: 555
    if width < 1 or height == 0:
        raise ValueError(f"bad BMP dimensions {width}x{height}")
    top_down = height < 0
    if top_down and compression in (1, 2):
        raise ValueError("top-down BMPs cannot be RLE-compressed")
    height = abs(height)

    palette = None
    if bpp <= 8:
        n_colors = clr_used or (1 << bpp)
        if not 0 < n_colors <= 256:
            raise ValueError(f"bad BMP palette size {n_colors}")
        pal_off = _FILE_HEADER.size + hsize
        raw = content[pal_off:pal_off + 4 * n_colors]
        if len(raw) != 4 * n_colors:
            raise ValueError("truncated BMP palette")
        # stored BGRA; we want RGB triples
        pal = np.frombuffer(raw, np.uint8).reshape(n_colors, 4)
        palette = pal[:, [2, 1, 0]].copy()

    if compression in (1, 2):                     # RLE8 / RLE4
        end = data_off + isize if isize else len(content)
        grid = _decode_rle(content[data_off:end], width, height,
                           four_bit=compression == 2)
        grid = grid[::-1]                         # stored bottom-up
        if int(grid.max(initial=0)) >= len(palette):
            raise ValueError("BMP palette index out of range")
        rgb = palette[grid]
        return {"format": "bmp", "width": width, "height": height,
                "maxval": 255,
                "pixels": np.ascontiguousarray(rgb).tobytes()}

    row_bytes = ((width * bpp + 7) // 8 + 3) & ~3
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
    elif bpp in (16, 32) and masks is not None:
        # mask-extracted channels, scaled to 8 bits with round-half-up
        # (identical to the classic (v<<3)|(v>>2) bit replication for
        # 5/6-bit channels)
        step = bpp // 8
        words = np.ascontiguousarray(rows[:, :width * step]) \
            .view("<u2" if bpp == 16 else "<u4") \
            .reshape(height, width).astype(np.int64)
        chans = []
        for m in masks:
            shift = (m & -m).bit_length() - 1
            maxv = m >> shift
            ch = (words & m) >> shift
            if maxv != 255:
                ch = (ch * 255 + maxv // 2) // maxv
            chans.append(ch.astype(np.uint8))
        rgb = np.stack(chans, axis=-1)
    elif bpp == 32:
        bgra = rows[:, :width * 4].reshape(height, width, 4)
        rgb = bgra[:, :, [2, 1, 0]]               # drop alpha
    else:
        if bpp == 8:
            idx = rows[:, :width]
        elif bpp == 4:
            nib = np.empty((height, row_bytes * 2), np.uint8)
            nib[:, 0::2] = rows >> 4
            nib[:, 1::2] = rows & 0x0F
            idx = nib[:, :width]
        else:                                     # 1-bpp, MSB first
            bits = np.unpackbits(rows, axis=1)
            idx = bits[:, :width]
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


def encode_bmp_rle8(width: int, height: int, indices: bytes,
                    palette_rgb: bytes) -> bytes:
    """Minimal RLE8 BMP encoder (the synthesis half of the r12 RLE
    decode path): one palette index per pixel in TOP-DOWN row order
    plus RGB palette triples in; encoded runs (<= 255) with
    end-of-line after every stored (bottom-up) row and end-of-bitmap
    last.  Lossless: ``decode_bmp`` returns exactly
    ``palette_rgb[indices]``."""
    if width < 1 or height < 1:
        raise ValueError(
            f"image dimensions must be >= 1, got {width}x{height}")
    if len(indices) != width * height:
        raise ValueError(f"need {width * height} index bytes, "
                         f"got {len(indices)}")
    if len(palette_rgb) % 3 or not 0 < len(palette_rgb) // 3 <= 256:
        raise ValueError("palette must be 1..256 RGB triples")
    n_colors = len(palette_rgb) // 3
    if max(indices) >= n_colors:
        raise ValueError("palette index out of range")
    grid = np.frombuffer(indices, np.uint8).reshape(height, width)
    out = bytearray()
    for row in grid[::-1]:                        # stored bottom-up
        x = 0
        while x < width:
            v = row[x]
            run = 1
            while x + run < width and run < 255 and row[x + run] == v:
                run += 1
            out += bytes([run, int(v)])
            x += run
        out += b"\x00\x00"                        # end of line
    out[-2:] = b"\x00\x01"                        # end of bitmap
    # palette stored BGRA
    pal = np.frombuffer(palette_rgb, np.uint8).reshape(n_colors, 3)
    bgra = np.zeros((n_colors, 4), np.uint8)
    bgra[:, :3] = pal[:, ::-1]
    data_off = _FILE_HEADER.size + 40 + 4 * n_colors
    info = _INFO_HEADER.pack(40, width, height, 1, 8, 1, len(out),
                             2835, 2835, n_colors, 0)
    head = _FILE_HEADER.pack(b"BM", data_off + len(out), 0, 0,
                             data_off)
    return head + info + bgra.tobytes() + bytes(out)
