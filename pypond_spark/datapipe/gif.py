"""GIF87a/89a codec, pure Python — the third real crawl image format
(after PNG and baseline JPEG) behind ``decode_image``.

Implements the public GIF specification: logical screen descriptor,
global/local color tables, extension blocks (graphic control, comment,
plain text, application — skipped via their sub-block chains), the
variable-width LSB-first LZW decoder (code widths 3..12, CLEAR/EOI
handling, dictionary reset), and 4-pass interlace reordering.
``decode_gif`` returns the FIRST frame (the thumbnail/phash contract);
``decode_gif_frames`` (r12) decodes ANIMATIONS to the video-tier dict
shape, compositing per the GIF89a graphic-control rules — sub-rect
placement, transparency, disposal leave / restore-to-background /
restore-to-previous — with ``encode_gif_anim`` as its synthesis twin.
A matching :func:`encode_gif` (real LZW compression, optional interlace)
lets tests and driver rows synthesize GIF bytes without any imaging
library; GIF is LOSSLESS for paletted content, so decoded pixels equal
the palette bytes exactly and the PNG driver-row oracle recipe carries
over unchanged.

Structural corruption raises ``ValueError``; there is no unsupported
process to raise ``NotImplementedError`` for (87a and 89a cover the
format).
"""

from __future__ import annotations

import struct

_GIF_SIGS = (b"GIF87a", b"GIF89a")

# 4-pass interlace row schedule: (first row, step) per pass
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain starting at ``pos``; returns
    (payload, position after the 0x00 terminator)."""
    out = bytearray()
    n = len(data)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF: unterminated sub-blocks")
        size = data[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        if pos + size > n:
            raise ValueError("truncated GIF sub-block")
        out += data[pos:pos + size]
        pos += size


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """Variable-width LSB-first GIF LZW decode."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF: LZW stream ran out")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF: first LZW code not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):        # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF: LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise ValueError(
            f"truncated GIF: {len(out)}/{n_pixels} pixels decoded")
    return bytes(out[:n_pixels])


def decode_gif(content: bytes) -> dict:
    """Decode the first frame of a GIF to interleaved 8-bit RGB —
    the :func:`~pypond_spark.datapipe.multimodal.decode_image` dict
    shape.  Transparency is ignored (our pixel model is opaque RGB, the
    same contract as the PNG alpha drop); interlaced frames are
    reordered; frames smaller than the logical screen are returned at
    their own size (the frame IS the image for single-frame GIFs)."""
    if content[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF: missing GIF87a/GIF89a signature")
    if len(content) < 13:
        raise ValueError("truncated GIF header")
    _, _, flags, _, _ = struct.unpack("<HHBBB", content[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = content[pos:pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated GIF global color table")
        pos += 3 * n
    while True:
        if pos >= len(content):
            raise ValueError("truncated GIF: no image descriptor")
        block = content[pos]
        pos += 1
        if block == 0x3B:               # trailer before any image
            raise ValueError("GIF contains no image data")
        if block == 0x21:               # extension: label + sub-blocks
            if pos >= len(content):
                raise ValueError("truncated GIF extension")
            pos += 1                    # label byte
            _, pos = _sub_blocks(content, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")
        fr, pos = _parse_frame(content, pos, gct)
        w, h, idx, ct = fr["w"], fr["h"], fr["idx"], fr["ct"]
        n_colors = len(ct) // 3
        out = bytearray(w * h * 3)
        for i, ix in enumerate(idx):
            if ix >= n_colors:
                raise ValueError(
                    f"GIF palette index {ix} >= table size {n_colors}")
            out[3 * i:3 * i + 3] = ct[3 * ix:3 * ix + 3]
        return {"format": "gif", "width": w, "height": h,
                "maxval": 255, "pixels": bytes(out)}


def _parse_frame(content: bytes, pos: int, gct) -> tuple[dict, int]:
    """Parse one image descriptor (``pos`` just past the 0x2C): local
    color table, LZW indices, interlace reorder.  Returns
    ``({"left","top","w","h","idx","ct"}, next_pos)``."""
    if pos + 9 > len(content):
        raise ValueError("truncated GIF image descriptor")
    left, top, w, h, iflags = struct.unpack("<HHHHB",
                                            content[pos:pos + 9])
    pos += 9
    if w < 1 or h < 1:
        raise ValueError(f"bad GIF frame dimensions {w}x{h}")
    ct = gct
    if iflags & 0x80:                   # local color table wins
        n = 2 << (iflags & 0x07)
        ct = content[pos:pos + 3 * n]
        if len(ct) < 3 * n:
            raise ValueError("truncated GIF local color table")
        pos += 3 * n
    if ct is None:
        raise ValueError("GIF frame without any color table")
    if pos >= len(content):
        raise ValueError("truncated GIF: missing LZW code size")
    mcs = content[pos]
    pos += 1
    data, pos = _sub_blocks(content, pos)
    idx = _lzw_decode(data, mcs, w * h)
    if iflags & 0x40:                   # interlaced: reorder rows
        order = []
        for first, step in _INTERLACE:
            order.extend(range(first, h, step))
        rows = [b""] * h
        src = 0
        for y in order:
            rows[y] = idx[src * w:(src + 1) * w]
            src += 1
        idx = b"".join(rows)
    return ({"left": left, "top": top, "w": w, "h": h,
             "idx": idx, "ct": ct}, pos)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Variable-width LSB-first GIF LZW encode (real compression,
    dictionary reset at 4096 codes — the decoder's exact dual)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        # widen when the NEXT code would not fit (decoder-symmetric)
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(width: int, height: int, indices: bytes, palette: bytes,
               interlace: bool = False) -> bytes:
    """Single-frame GIF89a encoder: one index byte per pixel mapped
    through ``palette`` (RGB triples, padded to the next power of two
    as the spec requires).  Like ``encode_png_indexed``, choosing
    palette = the target pixel bytes and indices = 0..n-1 makes the
    decoded image any RGB content at all — the oracle-replayable
    synthesis path for a LOSSLESS format."""
    if width < 1 or height < 1:
        raise ValueError(
            f"image dimensions must be >= 1, got {width}x{height}")
    if len(indices) != width * height:
        raise ValueError(f"need {width * height} indices, "
                         f"got {len(indices)}")
    if len(palette) % 3 or not 0 < len(palette) // 3 <= 256:
        raise ValueError(f"palette must be 1..256 RGB triples, "
                         f"got {len(palette)} bytes")
    n_colors = len(palette) // 3
    if indices and max(indices) >= n_colors:
        raise ValueError("palette index out of range")
    depth = max(2, (n_colors - 1).bit_length())   # GIF min table = 4
    ct = palette + bytes(3 * ((1 << depth) - n_colors))
    if interlace:
        order = []
        for first, step in _INTERLACE:
            order.extend(range(first, height, step))
        indices = b"".join(indices[y * width:(y + 1) * width]
                           for y in order)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height,
                       0x80 | (depth - 1), 0, 0)
    out += ct
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height,
                       0x40 if interlace else 0x00)
    mcs = depth
    out.append(mcs)
    lzw = _lzw_encode(indices, mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)                       # sub-block terminator
    out.append(0x3B)                    # trailer
    return bytes(out)


def decode_gif_frames(content: bytes) -> dict:
    """Decode an ANIMATED GIF to the video-tier dict shape (r12 —
    the :func:`~pypond_spark.datapipe.y4m.decode_y4m` contract):
    frames composite onto the logical-screen canvas per the GIF89a
    graphic-control rules — sub-rectangle placement, transparency
    (transparent pixels leave the canvas unchanged), and the three
    disposal methods (1 leave, 2 restore-to-background, 3
    restore-to-previous).  The canvas starts at the global background
    color (black without a GCT); per-frame luma is BT.601
    integer-rounded (gray-valued palettes recover exactly).  fps comes
    from the first nonzero frame delay (100/delay_cs), defaulting to
    10 fps — the browser convention for delay 0.
    """
    import numpy as np

    if content[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF: missing GIF87a/GIF89a signature")
    if len(content) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, flags, bg, _ = struct.unpack("<HHBBB", content[6:13])
    if sw < 1 or sh < 1:
        raise ValueError(f"bad GIF logical screen {sw}x{sh}")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = content[pos:pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated GIF global color table")
        pos += 3 * n
    if gct is not None and bg < len(gct) // 3:
        bg_rgb = np.frombuffer(gct[3 * bg:3 * bg + 3], np.uint8)
    else:
        bg_rgb = np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()

    frames = []
    delay_cs = 0
    disposal = 0
    transparent = None
    while True:
        if pos >= len(content):
            raise ValueError("truncated GIF: missing trailer")
        block = content[pos]
        pos += 1
        if block == 0x3B:               # trailer
            break
        if block == 0x21:               # extension
            if pos >= len(content):
                raise ValueError("truncated GIF extension")
            label = content[pos]
            pos += 1
            data, pos = _sub_blocks(content, pos)
            if label == 0xF9 and len(data) >= 4:   # graphic control
                gflags, d = struct.unpack("<BH", data[:3])
                disposal = (gflags >> 2) & 0x07
                transparent = data[3] if gflags & 0x01 else None
                if d and not delay_cs:
                    delay_cs = d
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")
        fr, pos = _parse_frame(content, pos, gct)
        left, top, w, h = fr["left"], fr["top"], fr["w"], fr["h"]
        if left + w > sw or top + h > sh:
            raise ValueError(
                f"GIF frame rect {w}x{h}+{left}+{top} outside the "
                f"{sw}x{sh} logical screen")
        ct = np.frombuffer(fr["ct"], np.uint8).reshape(-1, 3)
        idx = np.frombuffer(fr["idx"], np.uint8).reshape(h, w)
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF palette index out of range")
        before = canvas[top:top + h, left:left + w].copy()
        rgb = ct[idx]
        if transparent is not None:
            keep = idx == transparent
            rgb = np.where(keep[..., None],
                           canvas[top:top + h, left:left + w], rgb)
        canvas[top:top + h, left:left + w] = rgb
        r_, g_, b_ = (canvas[..., 0].astype(np.float64),
                      canvas[..., 1].astype(np.float64),
                      canvas[..., 2].astype(np.float64))
        if (canvas[..., 0] == canvas[..., 1]).all() \
                and (canvas[..., 1] == canvas[..., 2]).all():
            y = canvas[..., 0].copy()
        else:
            y = np.clip(np.floor(0.299 * r_ + 0.587 * g_
                                 + 0.114 * b_ + 0.5),
                        0, 255).astype(np.uint8)
        frames.append({"y": y.tobytes(), "u": None, "v": None})
        if disposal == 2:               # restore to background
            canvas[top:top + h, left:left + w] = bg_rgb
        elif disposal == 3:             # restore to previous
            canvas[top:top + h, left:left + w] = before
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError("GIF contains no image data")
    fps = (100, delay_cs) if delay_cs else (10, 1)
    return {"format": "gif-anim", "width": sw, "height": sh,
            "fps_num": fps[0], "fps_den": fps[1], "chroma": "mono",
            "n_frames": len(frames), "frames": frames}


def encode_gif_anim(width: int, height: int, frames: list,
                    delay_cs: int = 10) -> bytes:
    """Multi-frame GIF89a encoder (the synthesis half of
    :func:`decode_gif_frames`): ``frames`` is a list of dicts
    ``{"indices": bytes, "palette": RGB bytes, "left": 0, "top": 0,
    "w": width, "h": height, "disposal": 1, "transparent": None}``
    (rect/disposal/transparent optional) — each frame gets its own
    LOCAL color table, a graphic-control extension, and real LZW
    data.  Lossless per the GIF contract."""
    if width < 1 or height < 1:
        raise ValueError(
            f"image dimensions must be >= 1, got {width}x{height}")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0, 0, 0)  # no GCT
    for i, fr in enumerate(frames):
        idx = fr["indices"]
        pal = fr["palette"]
        left, top = fr.get("left", 0), fr.get("top", 0)
        w, h = fr.get("w", width), fr.get("h", height)
        disposal = fr.get("disposal", 1)
        trans = fr.get("transparent")
        if len(idx) != w * h:
            raise ValueError(f"frame {i}: need {w * h} indices, "
                             f"got {len(idx)}")
        if len(pal) % 3 or not 0 < len(pal) // 3 <= 256:
            raise ValueError(f"frame {i}: palette must be 1..256 "
                             "RGB triples")
        n_colors = len(pal) // 3
        # every non-transparent index must be < n_colors (the
        # transparent index alone may sit past the palette)
        if any(b >= n_colors and b != trans for b in set(idx)):
            raise ValueError(f"frame {i}: palette index out of range")
        gflags = (disposal & 0x07) << 2
        if trans is not None:
            gflags |= 0x01
        out += bytes([0x21, 0xF9, 4, gflags])
        out += struct.pack("<H", delay_cs)
        out += bytes([trans or 0, 0])
        depth = max(2, (max(n_colors - 1,
                            trans or 0)).bit_length())
        ct = pal + bytes(3 * ((1 << depth) - n_colors))
        out += struct.pack("<BHHHHB", 0x2C, left, top, w, h,
                           0x80 | (depth - 1))
        out += ct
        out.append(depth)
        lzw = _lzw_encode(idx, depth)
        for j in range(0, len(lzw), 255):
            chunk = lzw[j:j + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
