"""TIFF decode + encode — pure-Python TIFF 6.0 (the public Adobe
spec), no external libraries.

Camera originals, scans, and fax archives carry TIFF; the EXIF walker
(:func:`multimodal._exif_orientation`) already parsed TIFF IFD
structure header-only, and this module completes the step to pixels:

- **decoder**: both byte orders (``II``/``MM``), IFD0 tag walk with
  inline-or-offset values, strip AND tile layouts, chunky and planar
  configurations, compressions 1 (none), 5 (LZW — the same TIFF-
  variant decoder the PDF filter layer uses), 8/32946 (Deflate via
  stdlib zlib), 32773 (PackBits), bits
  per sample 1/4/8/16 (16-bit downsamples to the high byte, the
  PNG-16 contract), photometric WhiteIsZero / BlackIsZero / RGB /
  Palette (16-bit ColorMap scaled >>8), optional alpha stripped, and
  the Orientation tag surfaced (raw pixels are NOT rotated — upright
  normalization composes via ``multimodal.orient_image``, same as
  JPEG/EXIF).  Structural corruption raises ``ValueError``; exotic
  compressions (JPEG-in-TIFF, CCITT G3/G4) raise
  ``NotImplementedError``.
- **encoder** (synthesis half): deterministic gray/RGB 8-bit TIFF,
  none / PackBits / Deflate / LZW compression, strip layout with a
  RowsPerStrip, either byte order, optional Orientation tag — so
  driver rows can rotate every decode path under oracle
  verification.

Output follows the ``decode_image`` contract: interleaved RGB bytes,
``maxval`` 255.

Scale shape: per-image decode inside Arrow ``mapInPandas`` batches —
zero shuffle, partition-local (the decoder is dispatched from
``multimodal.decode_image`` on the TIFF magic).
"""

from __future__ import annotations

import struct

import numpy as np

from pypond_spark.datapipe.pdf import _lzw_decode

__all__ = ["decode_tiff", "encode_tiff"]

_COMP_NONE = 1
_COMP_LZW = 5
_COMP_DEFLATE = 8
_COMP_PACKBITS = 32773
_COMP_DEFLATE_OLD = 32946          # pre-TIFF-6 "Deflate" code


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expect:
        b = data[i]
        i += 1
        if b == 128:                         # noop
            continue
        if b < 128:
            if i + b + 1 > n:
                raise ValueError("truncated PackBits literal run")
            out += data[i:i + b + 1]
            i += b + 1
        else:
            if i >= n:
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - b)
            i += 1
    if len(out) < expect:
        raise ValueError(
            f"short PackBits strip: {len(out)}/{expect} bytes")
    return bytes(out[:expect])


def _packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: runs >= 3 repeat-coded, rest literal."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        chunk = data[lit_start:min(i, lit_start + 128)]
        i = lit_start + len(chunk)
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2,
              9: 4, 10: 8}


def _read_ifd(content: bytes, end: str, ifd: int) -> dict[int, list]:
    if ifd + 2 > len(content):
        raise ValueError("TIFF IFD offset past end of file")
    (n,) = struct.unpack(end + "H", content[ifd:ifd + 2])
    tags: dict[int, list] = {}
    for i in range(n):
        e = ifd + 2 + 12 * i
        if e + 12 > len(content):
            raise ValueError("truncated TIFF IFD")
        tag, typ, count = struct.unpack(end + "HHI",
                                        content[e:e + 8])
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue                         # unknown type: skip tag
        total = size * count
        if total <= 4:
            raw = content[e + 8:e + 8 + total]
        else:
            (off,) = struct.unpack(end + "I", content[e + 8:e + 12])
            if off + total > len(content):
                raise ValueError(
                    f"TIFF tag {tag} value past end of file")
            raw = content[off:off + total]
        if typ in (1, 6, 7):
            vals = list(raw)
        elif typ == 3:
            vals = list(struct.unpack(end + f"{count}H", raw))
        elif typ in (4, 9):
            vals = list(struct.unpack(
                end + f"{count}{'i' if typ == 9 else 'I'}", raw))
        elif typ in (5, 10):
            parts = struct.unpack(
                end + f"{2 * count}{'i' if typ == 10 else 'I'}", raw)
            vals = [parts[2 * k] / parts[2 * k + 1]
                    if parts[2 * k + 1] else 0.0
                    for k in range(count)]
        elif typ == 8:
            vals = list(struct.unpack(end + f"{count}h", raw))
        else:                                # ASCII
            vals = [raw]
        tags[tag] = vals
    return tags


def _unpack_bits(row: bytes, width: int, bits: int,
                 spp: int, hi16: int = 0) -> np.ndarray:
    """One padded row -> uint8 samples at native depth (per TIFF 6.0
    rows pad to whole bytes for sub-byte depths).  ``hi16`` is the
    byte offset of the HIGH byte within a 16-bit sample (0 for MM,
    1 for II) — the standard high-byte downsample."""
    if bits == 8:
        return np.frombuffer(row[:width * spp], np.uint8)
    if bits == 16:
        return np.frombuffer(row[:width * spp * 2],
                             np.uint8)[hi16::2]
    a = np.frombuffer(row, np.uint8)
    if bits == 1:
        out = np.unpackbits(a)[:width * spp]
        return out
    if bits == 4:
        hi = a >> 4
        lo = a & 0x0F
        out = np.empty(a.size * 2, np.uint8)
        out[0::2] = hi
        out[1::2] = lo
        return out[:width * spp]
    raise NotImplementedError(f"TIFF bits per sample {bits}")


def decode_tiff(content: bytes) -> dict:
    """TIFF bytes -> the :func:`multimodal.decode_image` dict (raw
    interleaved RGB, maxval 255) plus ``orientation`` when the tag is
    present."""
    if content[:4] == b"II*\x00":
        end = "<"
    elif content[:4] == b"MM\x00*":
        end = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order/magic header")
    if len(content) < 8:
        raise ValueError("truncated TIFF: no IFD offset")
    (ifd0,) = struct.unpack(end + "I", content[4:8])
    tags = _read_ifd(content, end, ifd0)

    def one(tag, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    width = one(256)
    height = one(257)
    if not width or not height:
        raise ValueError("TIFF without ImageWidth/ImageLength")
    spp = one(277, 1)
    bits_list = tags.get(258, [1])
    bits = bits_list[0]
    if any(b != bits for b in bits_list):
        raise NotImplementedError("TIFF with mixed bits per sample")
    comp = one(259, _COMP_NONE)
    photo = one(262, 1)
    planar = one(284, 1)
    orientation = one(274)

    if comp not in (_COMP_NONE, _COMP_LZW, _COMP_PACKBITS,
                    _COMP_DEFLATE, _COMP_DEFLATE_OLD):
        names = {2: "CCITT G3 1D", 3: "CCITT G3", 4: "CCITT G4",
                 6: "old JPEG", 7: "JPEG"}
        raise NotImplementedError(
            f"TIFF compression {comp} "
            f"({names.get(comp, 'unknown')}) — only none/LZW/"
            "PackBits/Deflate decode without codec libraries")
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(
            f"TIFF photometric interpretation {photo}")
    hi16 = 1 if end == "<" else 0      # high byte of a 16-bit sample
    if photo == 2 and spp < 3:
        raise ValueError("RGB TIFF with fewer than 3 samples")
    if photo == 3 and spp != 1:
        raise ValueError("palette TIFF must have 1 sample per pixel")

    # gather pixel payload: strips or tiles
    planes_needed = spp if planar == 2 else 1
    samples_per_plane = 1 if planar == 2 else spp

    def decode_chunk(raw: bytes, expect: int) -> bytes:
        if comp == _COMP_PACKBITS:
            return _packbits_decode(raw, expect)
        if comp in (_COMP_DEFLATE, _COMP_DEFLATE_OLD):
            import zlib
            try:
                out = zlib.decompress(raw)
            except zlib.error as exc:
                raise ValueError(
                    f"corrupt TIFF Deflate chunk: {exc}") from exc
            if len(out) < expect:
                raise ValueError(
                    f"short TIFF Deflate chunk: {len(out)}/{expect}")
            return out[:expect]
        if comp == _COMP_LZW:
            out = _lzw_decode(raw)
            if len(out) < expect:
                raise ValueError(
                    f"short TIFF LZW chunk: {len(out)}/{expect}")
            return out[:expect]
        if len(raw) < expect:
            raise ValueError(
                f"short TIFF strip: {len(raw)}/{expect} bytes")
        return raw[:expect]

    def row_bytes(w, nsamp):
        return (w * nsamp * bits + 7) // 8

    if 322 in tags or 324 in tags:           # tiled layout
        tw = one(322)
        th = one(323)
        offs = tags.get(324, [])
        cnts = tags.get(325, [len(content)] * len(offs))
        if not tw or not th or not offs:
            raise ValueError("TIFF tile tags incomplete")
        if len(cnts) < len(offs):
            raise ValueError("TIFF TileByteCounts shorter than "
                             "TileOffsets")
        tiles_across = (width + tw - 1) // tw
        tiles_down = (height + th - 1) // th
        per_plane = tiles_across * tiles_down
        if len(offs) < per_plane * planes_needed:
            raise ValueError("TIFF has fewer tiles than the grid")
        planes = []
        trow = row_bytes(tw, samples_per_plane)
        for p in range(planes_needed):
            plane = np.zeros((height, width * samples_per_plane),
                             np.uint8)
            for t in range(per_plane):
                ty, tx = divmod(t, tiles_across)
                raw = content[offs[p * per_plane + t]:
                              offs[p * per_plane + t]
                              + cnts[p * per_plane + t]]
                data = decode_chunk(raw, trow * th)
                for r in range(th):
                    y = ty * th + r
                    if y >= height:
                        break
                    rowv = _unpack_bits(
                        data[r * trow:(r + 1) * trow], tw,
                        bits, samples_per_plane, hi16)
                    x0 = tx * tw * samples_per_plane
                    take = min(tw, width - tx * tw) \
                        * samples_per_plane
                    plane[y, x0:x0 + take] = rowv[:take]
            planes.append(plane.reshape(height, width,
                                        samples_per_plane))
    else:                                    # strip layout
        offs = tags.get(273)
        if not offs:
            raise ValueError("TIFF without StripOffsets")
        rps = one(278, height)
        cnts = tags.get(279, [len(content)] * len(offs))
        if len(cnts) < len(offs):
            raise ValueError("TIFF StripByteCounts shorter than "
                             "StripOffsets")
        strips_per_plane = (height + rps - 1) // rps
        if len(offs) < strips_per_plane * planes_needed:
            raise ValueError("TIFF has fewer strips than needed")
        rb = row_bytes(width, samples_per_plane)
        planes = []
        for p in range(planes_needed):
            rows = []
            for s in range(strips_per_plane):
                k = p * strips_per_plane + s
                nrows = min(rps, height - s * rps)
                raw = content[offs[k]:offs[k] + cnts[k]]
                data = decode_chunk(raw, rb * nrows)
                for r in range(nrows):
                    rows.append(_unpack_bits(
                        data[r * rb:(r + 1) * rb], width,
                        bits, samples_per_plane, hi16))
            planes.append(np.stack(rows).reshape(
                height, width, samples_per_plane))

    if planar == 2:
        img = np.concatenate(planes, axis=2)
    else:
        img = planes[0]

    if bits == 16:
        # _unpack_bits kept the high byte of each sample, either
        # byte order — the PNG-16 downsample contract
        maxnative = 255
    elif bits == 1:
        maxnative = 1
    elif bits == 4:
        maxnative = 15
    else:
        maxnative = 255

    if photo == 3:                           # palette
        cmap = tags.get(320)
        ncolors = 1 << bits
        if not cmap or len(cmap) < 3 * ncolors:
            raise ValueError("palette TIFF without a full ColorMap")
        lut = (np.array(cmap[:3 * ncolors], np.uint32)
               .reshape(3, ncolors) >> 8).astype(np.uint8)
        idx = img[..., 0]
        if int(idx.max()) >= ncolors:
            raise ValueError("TIFF palette index out of range")
        rgb = np.stack([lut[0][idx], lut[1][idx], lut[2][idx]],
                       axis=-1)
    else:
        gray_or_rgb = img[..., :3] if photo == 2 else img[..., :1]
        v = gray_or_rgb.astype(np.uint32)
        if maxnative != 255:
            v = (v * 255 + maxnative // 2) // maxnative
        if photo == 0:                       # WhiteIsZero
            v = 255 - v
        v = v.astype(np.uint8)
        rgb = np.repeat(v, 3, axis=2) if photo != 2 else v

    out = {"format": "tiff", "width": int(width),
           "height": int(height), "maxval": 255,
           "pixels": rgb.tobytes()}
    if orientation is not None:
        out["orientation"] = int(orientation)
    return out


def encode_tiff(width: int, height: int, pixels: bytes,
                gray: bool = False, compression: str = "none",
                rows_per_strip: int | None = None,
                byte_order: str = "II",
                orientation: int | None = None) -> bytes:
    """Deterministic 8-bit TIFF writer (the synthesis half): chunky
    gray/RGB, strip layout, ``none``/``packbits``/``deflate``/
    ``lzw`` compression, either byte order, optional Orientation
    tag.  Lossless, so
    ``decode_tiff(encode_tiff(px))["pixels"]`` replays the input
    (gray replicates to RGB per the decode contract)."""
    if byte_order not in ("II", "MM"):
        raise ValueError(f"byte_order must be II|MM, got {byte_order}")
    if compression not in ("none", "packbits", "deflate", "lzw"):
        raise ValueError(
            f"compression must be none|packbits|deflate|lzw, "
            f"got {compression}")
    spp = 1 if gray else 3
    need = width * height * spp
    if width < 1 or height < 1:
        raise ValueError(f"bad TIFF dimensions {width}x{height}")
    if len(pixels) != need:
        raise ValueError(f"need {need} pixel bytes, got {len(pixels)}")
    if orientation is not None and not 1 <= orientation <= 8:
        raise ValueError(f"orientation must be 1..8, got {orientation}")
    end = "<" if byte_order == "II" else ">"
    rps = rows_per_strip or height
    rb = width * spp
    import zlib as _zlib

    from pypond_spark.datapipe.pdf import lzw_encode

    strips = []
    for y0 in range(0, height, rps):
        raw = pixels[y0 * rb:min(y0 + rps, height) * rb]
        strips.append(_packbits_encode(raw)
                      if compression == "packbits"
                      else _zlib.compress(raw, 9)
                      if compression == "deflate"
                      else lzw_encode(raw)
                      if compression == "lzw" else raw)

    entries = []                             # (tag, type, count, vals)
    entries.append((256, 4, 1, [width]))
    entries.append((257, 4, 1, [height]))
    entries.append((258, 3, spp, [8] * spp))
    entries.append((259, 3, 1,
                    [32773 if compression == "packbits"
                     else 8 if compression == "deflate"
                     else 5 if compression == "lzw" else 1]))
    entries.append((262, 3, 1, [2 if not gray else 1]))
    if orientation is not None:
        entries.append((274, 3, 1, [orientation]))
    entries.append((277, 3, 1, [spp]))
    entries.append((278, 4, 1, [rps]))
    # 273/279 filled after layout
    entries.append((273, 4, len(strips), None))
    entries.append((279, 4, len(strips), [len(s) for s in strips]))
    entries.sort(key=lambda e: e[0])

    n = len(entries)
    ifd0 = 8
    ifd_size = 2 + 12 * n + 4
    # overflow area right after the IFD, then strip data
    over_at = ifd0 + ifd_size
    over = bytearray()
    fixed = []
    for tag, typ, count, vals in entries:
        fixed.append([tag, typ, count, vals, None])
    # first pass: compute overflow for >4-byte values except 273
    for ent in fixed:
        tag, typ, count, vals, _ = ent
        size = _TYPE_SIZE[typ] * count
        if tag == 273:
            continue
        if size > 4:
            ent[4] = over_at + len(over)
            for v in vals:
                over += struct.pack(
                    end + ("H" if typ == 3 else "I"), v)
    strip_area = over_at + len(over) + (
        4 * len(strips) if 4 * len(strips) > 4 else 0)
    strip_offsets = []
    pos = strip_area
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    for ent in fixed:
        if ent[0] == 273:
            ent[3] = strip_offsets
            if 4 * len(strips) > 4:
                ent[4] = over_at + len(over)
                for v in strip_offsets:
                    over += struct.pack(end + "I", v)

    out = bytearray()
    out += (b"II*\x00" if byte_order == "II" else b"MM\x00*")
    out += struct.pack(end + "I", ifd0)
    out += struct.pack(end + "H", n)
    for tag, typ, count, vals, off in fixed:
        out += struct.pack(end + "HHI", tag, typ, count)
        if off is not None:
            out += struct.pack(end + "I", off)
        else:
            cell = b"".join(struct.pack(
                end + ("H" if typ == 3 else "I"), v) for v in vals)
            out += cell + bytes(4 - len(cell))
    out += struct.pack(end + "I", 0)         # no next IFD
    out += over
    for s in strips:
        out += s
    return bytes(out)
