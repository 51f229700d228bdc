"""Baseline-sequential + progressive JPEG (JFIF) codec, pure Python
+ numpy.

The single most common image format in any real crawl; without it every
JPEG in a 100-TB ingest is dropped at ``decode_image``.  This module
implements the baseline AND progressive DCT processes of the public
ITU-T T.81 spec — marker parse, DQT/DHT/DRI/SOF0/SOF2/SOS, Huffman
entropy decode with byte unstuffing and restart markers, progressive
scan accumulation (spectral selection + successive approximation, DC
and AC first/refinement passes, EOB runs), dequantization, 8x8 inverse
DCT (numpy-batched), nearest-neighbor chroma upsampling, and
YCbCr->RGB — plus matching encoders (baseline and progressive with a
configurable scan script) so tests and driver rows can synthesize real
JPEG bytes without any imaging library.

Lossless (SOF3) decodes and encodes too (r12): Annex-H predictive
Huffman coding — all seven predictors, point transform, restart
markers, direct-RGB components (no color transform), any precision
2..16 on decode — bit-exact for ANY content at Pt=0.

Honest scope limits (each raises, never silently wrong):

- differential (SOF5..7) and arithmetic-coded (SOF9..15) processes ->
  ``NotImplementedError``;
- 12-bit DCT precision and CMYK/4-component scans -> ``NotImplementedError``;
- structural corruption (truncation, bad marker stream, Huffman
  overrun) -> ``ValueError``.

Determinism contract (what makes driver rows oracle-replayable): JPEG
is lossy, but an 8x8 block whose pixels are all equal is DC-ONLY — its
AC coefficients are exactly zero after quantization, and with a
quantization table of all ones the decoded block equals the source
block EXACTLY (DC = 8*(v-128) survives quantize/dequantize unchanged
and the inverse DCT of a DC-only block is the constant DC/8, a dyadic
product whose float error ~1e-13 never moves an integer across the
round boundary).  Synthesizing images from block-constant md5-derived
values therefore gives a pixel-exact encode->decode roundtrip that a
SQL oracle replays straight from the hex digest — the PNG driver-row
recipe carried over to a lossy codec.

Rounding is ``floor(x + 0.5)`` (half away from zero for the positive
pixel domain) everywhere a float meets an integer, so decode results
are reproducible bit-for-bit across platforms for a given file.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# zigzag index k -> natural (row-major) position in the 8x8 block
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

_SOF_UNSUPPORTED = {
    0xC5: "differential sequential JPEG (SOF5)",
    0xC6: "differential progressive JPEG (SOF6)",
    0xC7: "differential lossless JPEG (SOF7)",
    0xC9: "arithmetic-coded sequential JPEG (SOF9)",
    0xCA: "arithmetic-coded progressive JPEG (SOF10)",
    0xCB: "arithmetic-coded lossless JPEG (SOF11)",
    0xCD: "differential arithmetic sequential JPEG (SOF13)",
    0xCE: "differential arithmetic progressive JPEG (SOF14)",
    0xCF: "differential arithmetic lossless JPEG (SOF15)",
}

# orthonormal 8-point DCT-II matrix: A[u, x] = c_u/2 * cos((2x+1)u pi/16)
_A = np.array([[(math.sqrt(0.5) if u == 0 else 1.0) / 2.0
                * math.cos((2 * x + 1) * u * math.pi / 16.0)
                for x in range(8)] for u in range(8)])


def _idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """Batched 2-D inverse DCT: (n, 8, 8) dequantized coefficients ->
    (n, 8, 8) float samples (before +128 level shift)."""
    return np.einsum("vy,nvu,ux->nyx", _A, coeffs, _A)


def _fdct_blocks(samples: np.ndarray) -> np.ndarray:
    """Batched 2-D forward DCT of (n, 8, 8) level-shifted samples."""
    return np.einsum("vy,nyx,ux->nvu", _A, samples, _A)


class _BitReader:
    """MSB-first bit reader over a byte-unstuffed entropy segment.

    Accumulator-based (r12): bytes fold into a small int as needed, so
    a ``read_bits(n)`` is a few Python ops instead of n per-bit loop
    iterations — the Huffman walk is the dominant decode cost for both
    baseline and progressive scans and this is its hot path."""

    __slots__ = ("data", "n", "bytepos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.bytepos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if not self.nbits:
            if self.bytepos >= self.n:
                raise ValueError(
                    "JPEG entropy data overrun (truncated scan)")
            self.acc = self.data[self.bytepos]
            self.bytepos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        while self.nbits < n:
            if self.bytepos >= self.n:
                raise ValueError(
                    "JPEG entropy data overrun (truncated scan)")
            self.acc = ((self.acc << 8) | self.data[self.bytepos]) \
                & 0xFFFFFFFFFF
            self.bytepos += 1
            self.nbits += 8
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)


def _build_decode_table(bits: list[int], vals: bytes) -> dict:
    """Canonical JPEG Huffman decode table: (length, code) -> symbol."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | r.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code (corrupt scan data)")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit received value to its signed level."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _entropy_segments(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Split the scan's entropy-coded bytes at restart markers.

    Returns (segments, position-of-terminating-marker).  Stuffed 0x00
    bytes after 0xFF are removed; RST0..7 delimit segments (DC
    predictors reset per segment); any other marker terminates."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError("truncated JPEG: scan ends inside a marker")
        m = data[i + 1]
        if m == 0x00:             # stuffed literal 0xFF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:   # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif m == 0xFF:           # fill byte
            i += 1
        else:
            segs.append(bytes(cur))
            return segs, i
    raise ValueError("truncated JPEG: no terminating marker after scan")


def _decode_block(r: _BitReader, dc_tab: dict, ac_tab: dict,
                  pred: int) -> tuple[np.ndarray, int]:
    """Decode one 8x8 block's quantized coefficients (zigzag order)."""
    zz = np.zeros(64, dtype=np.int32)
    t = _huff_decode(r, dc_tab)
    diff = _extend(r.read_bits(t), t) if t else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _huff_decode(r, ac_tab)
        rr, s = rs >> 4, rs & 0x0F
        if s == 0:
            if rr == 15:          # ZRL: sixteen zeros
                k += 16
                continue
            break                 # EOB
        k += rr
        if k > 63:
            raise ValueError("JPEG AC run past end of block")
        zz[k] = _extend(r.read_bits(s), s)
        k += 1
    return zz, pred


def decode_jpeg(content: bytes) -> dict:
    """Decode a baseline-sequential or progressive JFIF/JPEG to
    interleaved 8-bit RGB.

    Returns the :func:`~pypond_spark.datapipe.multimodal.decode_image`
    dict shape: ``{"format": "jpeg", "width", "height", "maxval": 255,
    "pixels"}`` with grayscale replicated across channels, exactly like
    the PNG path.  Chroma subsampling is handled by nearest-neighbor
    (replication) upsampling.  Progressive (SOF2) streams accumulate
    coefficients across their scans — spectral selection, successive
    approximation (DC and AC first + refinement passes), EOB runs and
    restart markers all handled — then run the SAME dequant/IDCT
    finish as baseline: scan organization never changes the decoded
    pixels.  Unsupported processes raise ``NotImplementedError``;
    corrupt structure raises ``ValueError``.
    """
    if content[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG: missing SOI marker")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}   # (class, id) -> decode table
    restart_interval = 0
    frame = None
    scans_done = 0
    i = 2
    n = len(content)
    while True:
        if i + 2 > n:
            raise ValueError("truncated JPEG: ran out of markers")
        if content[i] != 0xFF:
            raise ValueError(f"bad JPEG marker stream at byte {i}")
        marker = content[i + 1]
        if marker == 0xD9:                      # EOI
            if frame is not None and frame.get("progressive") \
                    and scans_done:
                return _finish_frame(frame, qt)
            raise ValueError("JPEG EOI before any scan")
        if i + 4 > n:
            raise ValueError("truncated JPEG: ran out of markers")
        seglen = struct.unpack(">H", content[i + 2:i + 4])[0]
        seg = content[i + 4:i + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"{_SOF_UNSUPPORTED[marker]} — only baseline sequential "
                "(SOF0/SOF1) and progressive (SOF2) Huffman processes "
                "are supported")
        if marker == 0xDB:                      # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p:p + 64], dtype=np.uint8)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p:p + 128],
                                        dtype=">u2")
                    p += 128
                qt[tq] = tbl.astype(np.int32)
        elif marker == 0xC4:                    # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = seg[p + 17:p + 17 + nv]
                huff[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:                    # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0/1/2/3
            prec, height, width, nc = struct.unpack(">BHHB", seg[:6])
            if marker == 0xC3:
                if not 2 <= prec <= 16:
                    raise ValueError(
                        f"lossless JPEG precision {prec} out of range")
            elif prec != 8:
                raise NotImplementedError(
                    f"{prec}-bit JPEG precision (only 8-bit DCT)")
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"{nc}-component JPEG (only grayscale and "
                    "YCbCr/RGB)")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"w": width, "h": height, "comps": comps,
                     "progressive": marker == 0xC2,
                     "lossless": marker == 0xC3, "prec": prec}
        elif marker == 0xDA:                    # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            sel = {}
            order = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cs] = (tt >> 4, tt & 0x0F)
                order.append(cs)
            if frame.get("lossless"):
                psv, _se, ahl = seg[1 + 2 * ns:4 + 2 * ns]
                return _lossless_scan(content, i + 2 + seglen, frame,
                                      order, sel, huff,
                                      restart_interval, psv,
                                      ahl & 0x0F)
            if not frame["progressive"]:
                if ns == len(frame["comps"]):
                    # the common single-interleaved-scan file
                    return _decode_scan(content, i + 2 + seglen, frame,
                                        sel, qt, huff, restart_interval)
                # multi-scan sequential (r12): each scan carries a
                # SUBSET of the components; accumulate until EOI
                i = _sequential_scan(content, i + 2 + seglen, frame,
                                     order, sel, huff, restart_interval)
                seen = frame.setdefault("__seen", set())
                seen.update(order)
                if seen == {c["id"] for c in frame["comps"]}:
                    return _finish_frame(frame, qt)
                continue
            ss, se, ahl = seg[1 + 2 * ns:4 + 2 * ns]
            i = _progressive_scan(content, i + 2 + seglen, frame,
                                  order, sel, huff, restart_interval,
                                  ss, se, ahl >> 4, ahl & 0x0F)
            scans_done += 1
            continue
        # APPn / COM / anything else: skip
        i += 2 + seglen


def _decode_scan(content: bytes, start: int, frame: dict, sel: dict,
                 qt: dict, huff: dict, restart_interval: int) -> dict:
    comps = frame["comps"]
    _alloc_blocks(frame)
    mcux, mcuy = frame["mcux"], frame["mcuy"]
    for c in comps:
        if c["id"] not in sel:
            # ns == n_comps but the ids don't line up with the frame
            raise ValueError(
                f"JPEG scan component ids {sorted(sel)} do not match "
                f"the frame's")
        if c["tq"] not in qt:
            raise ValueError(f"JPEG missing quant table {c['tq']}")
        dc_id, ac_id = sel[c["id"]]
        if (0, dc_id) not in huff or (1, ac_id) not in huff:
            raise ValueError("JPEG missing Huffman table for scan")
        c["dc"] = huff[(0, dc_id)]
        c["ac"] = huff[(1, ac_id)]
    segs, _ = _entropy_segments(content, start)
    total_mcus = mcux * mcuy
    per_seg = restart_interval if restart_interval else total_mcus
    mcu = 0
    for seg in segs:
        if mcu >= total_mcus:
            break
        r = _BitReader(seg)
        preds = {c["id"]: 0 for c in comps}
        for _ in range(min(per_seg, total_mcus - mcu)):
            my, mx = divmod(mcu, mcux)
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz, preds[c["id"]] = _decode_block(
                            r, c["dc"], c["ac"], preds[c["id"]])
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["blocks"][row * c["bw"] + col] = zz
            mcu += 1
    if mcu < total_mcus:
        raise ValueError(
            f"truncated JPEG scan: {mcu}/{total_mcus} MCUs decoded")
    return _finish_frame(frame, qt)


def _sequential_scan(content: bytes, start: int, frame: dict,
                     order: list, sel: dict, huff: dict,
                     restart_interval: int) -> int:
    """One scan of a MULTI-SCAN sequential (SOF0/SOF1) frame — T.81
    lets a baseline file carry each component in its own scan (some
    encoders emit Y, then Cb, then Cr).  Ordinary full-band Huffman
    block decode over this scan's data units (the same interleaved /
    single-component geometry as progressive scans); returns the
    terminating-marker position."""
    if "mcux" not in frame:
        _alloc_blocks(frame)
    units = _scan_units(frame, order, sel)
    tabs = {}
    for cid in order:
        dc_id, ac_id = sel[cid]
        if (0, dc_id) not in huff or (1, ac_id) not in huff:
            raise ValueError("JPEG missing Huffman table for scan")
        tabs[cid] = (huff[(0, dc_id)], huff[(1, ac_id)])
    segs, end = _entropy_segments(content, start)
    per_seg = restart_interval if restart_interval else len(units)
    unit_no = 0
    for seg in segs:
        if unit_no >= len(units):
            break
        r = _BitReader(seg)
        preds = {cid: 0 for cid in order}
        for _ in range(min(per_seg, len(units) - unit_no)):
            for c, idx in units[unit_no]:
                dc_tab, ac_tab = tabs[c["id"]]
                zz, preds[c["id"]] = _decode_block(
                    r, dc_tab, ac_tab, preds[c["id"]])
                c["blocks"][idx] = zz
            unit_no += 1
    if unit_no < len(units):
        raise ValueError(f"truncated JPEG sequential scan: "
                         f"{unit_no}/{len(units)} units decoded")
    return end


def _alloc_blocks(frame: dict) -> None:
    """Size per-component coefficient storage on the interleaved MCU grid
    (shared by the baseline single scan and progressive multi-scan
    paths) and precompute the single-component (non-interleaved) block
    grid progressive AC scans iterate over."""
    width, height, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        raise ValueError("JPEG component with zero sampling factor")
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    frame["mcux"], frame["mcuy"] = mcux, mcuy
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["blocks"] = np.zeros((c["bw"] * c["bh"], 64), dtype=np.int32)
        # real (unpadded-to-MCU) block grid for non-interleaved scans
        cw = (width * c["h"] + hmax - 1) // hmax
        ch = (height * c["v"] + vmax - 1) // vmax
        c["wb_ni"] = (cw + 7) // 8
        c["hb_ni"] = (ch + 7) // 8


def _finish_frame(frame: dict, qt: dict) -> dict:
    """Dequantize + inverse DCT + stitch + upsample + color-convert the
    accumulated coefficient blocks — identical for baseline and
    progressive frames (scan organization only changes HOW the
    coefficients arrived, never their values)."""
    width, height, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError(f"JPEG missing quant table {c['tq']}")
        deq = (c["blocks"] * qt[c["tq"]][None, :]).astype(np.float64)
        nat = np.zeros_like(deq)
        nat[:, list(ZIGZAG)] = deq
        sam = _idct_blocks(nat.reshape(-1, 8, 8)) + 128.0
        sam = np.clip(np.floor(sam + 0.5), 0, 255).astype(np.uint8)
        # stitch blocks into the component plane
        plane = (sam.reshape(c["bh"], c["bw"], 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(c["bh"] * 8, c["bw"] * 8))
        # nearest-neighbor upsample to full resolution
        ys = (np.arange(height) * c["v"]) // vmax
        xs = (np.arange(width) * c["h"]) // hmax
        planes.append(plane[np.ix_(ys, xs)].astype(np.int32))
    if len(planes) == 1:
        g = planes[0].astype(np.uint8)
        rgb = np.stack([g, g, g], axis=-1)
    else:
        y, cb, cr = (p.astype(np.float64) for p in planes)
        r_ = y + 1.402 * (cr - 128.0)
        g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b_ = y + 1.772 * (cb - 128.0)
        rgb = np.stack([
            np.clip(np.floor(ch + 0.5), 0, 255).astype(np.uint8)
            for ch in (r_, g_, b_)], axis=-1)
    return {"format": "jpeg", "width": width, "height": height,
            "maxval": 255, "pixels": rgb.tobytes()}


# ----------------------------------------------------- progressive decode

def _scan_units(frame: dict, order: list, sel: dict) -> list:
    """The data units (blocks) of one progressive scan in transmission
    order: ``[(comp, block_index), ...]`` grouped per restart unit.

    Interleaved scans (ns > 1) walk MCUs of the frame grid; a
    single-component scan walks that component's REAL block raster
    (``wb_ni x hb_ni`` — T.81 A.2.2, no MCU padding), one block per
    restart-counted unit."""
    comps = {c["id"]: c for c in frame["comps"]}
    scomps = []
    for cid in order:
        if cid not in comps:
            raise ValueError(f"JPEG scan names unknown component {cid}")
        scomps.append(comps[cid])
    units = []
    if len(scomps) == 1:
        c = scomps[0]
        for row in range(c["hb_ni"]):
            for col in range(c["wb_ni"]):
                units.append([(c, row * c["bw"] + col)])
    else:
        mcux, mcuy = frame["mcux"], frame["mcuy"]
        for mcu in range(mcux * mcuy):
            my, mx = divmod(mcu, mcux)
            unit = []
            for c in scomps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        unit.append((c, (my * c["v"] + by) * c["bw"]
                                     + (mx * c["h"] + bx)))
            units.append(unit)
    return units


def _progressive_scan(content: bytes, start: int, frame: dict,
                      order: list, sel: dict, huff: dict,
                      restart_interval: int, ss: int, se: int,
                      ah: int, al: int) -> int:
    """Decode ONE progressive scan into the frame's coefficient
    arrays and return the position of the terminating marker.

    The four scan kinds of T.81 G.2: DC first (Huffman diffs scaled
    by ``<< Al``), DC refinement (one raw bit per block appended at
    bit ``Al``), AC first (run-length + EOB-run, single component
    only), AC refinement (newly-significant coefficients at
    ``±1 << Al`` interleaved with correction bits for the already-
    significant — the jdphuff.c walk re-derived from the spec).
    Restart markers reset DC predictors AND the EOB run."""
    if "mcux" not in frame:
        _alloc_blocks(frame)
    if ss == 0 and se != 0:
        raise ValueError("JPEG progressive DC scan must have Se = 0")
    if ss > 0 and len(order) != 1:
        raise ValueError("JPEG progressive AC scan must be single-"
                         "component (T.81 B.2.3)")
    if not 0 <= ss <= se <= 63 or al > 13:
        raise ValueError(f"bad JPEG scan band Ss={ss} Se={se} Al={al}")
    units = _scan_units(frame, order, sel)
    tabs = {}
    for cid in order:
        dc_id, ac_id = sel[cid]
        if ss == 0 and ah == 0:            # DC first needs a DC table
            if (0, dc_id) not in huff:
                raise ValueError("JPEG missing DC Huffman table")
            tabs[cid] = huff[(0, dc_id)]
        elif ss > 0:                       # AC scans need an AC table
            if (1, ac_id) not in huff:
                raise ValueError("JPEG missing AC Huffman table")
            tabs[cid] = huff[(1, ac_id)]
    segs, end = _entropy_segments(content, start)
    per_seg = restart_interval if restart_interval else len(units)
    unit_no = 0
    for seg in segs:
        if unit_no >= len(units):
            break
        r = _BitReader(seg)
        preds = {cid: 0 for cid in order}
        eobrun = 0
        for _ in range(min(per_seg, len(units) - unit_no)):
            for c, idx in units[unit_no]:
                zz = c["blocks"][idx]
                if ss == 0 and ah == 0:
                    t = _huff_decode(r, tabs[c["id"]])
                    diff = _extend(r.read_bits(t), t) if t else 0
                    preds[c["id"]] += diff
                    zz[0] = preds[c["id"]] << al
                elif ss == 0:
                    if r.read_bit():
                        zz[0] |= (1 << al)
                elif ah == 0:
                    eobrun = _ac_first_block(r, tabs[c["id"]], zz,
                                             ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine_block(r, tabs[c["id"]], zz,
                                              ss, se, al, eobrun)
            unit_no += 1
    if unit_no < len(units):
        raise ValueError(f"truncated JPEG progressive scan: "
                         f"{unit_no}/{len(units)} units decoded")
    return end


def _ac_first_block(r: _BitReader, ac_tab: dict, zz: np.ndarray,
                    ss: int, se: int, al: int, eobrun: int) -> int:
    """First AC pass of one block: coefficient values ``v << Al``;
    an (r, 0) symbol with r < 15 starts an EOB run of
    ``(1 << r) - 1 + extra`` FURTHER blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(r, ac_tab)
        rr, s = rs >> 4, rs & 0x0F
        if s == 0:
            if rr == 15:                  # ZRL
                k += 16
                continue
            return (1 << rr) - 1 + (r.read_bits(rr) if rr else 0)
        k += rr
        if k > se:
            raise ValueError("JPEG AC run past end of band")
        zz[k] = _extend(r.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(r: _BitReader, ac_tab: dict, zz: np.ndarray,
                     ss: int, se: int, al: int, eobrun: int) -> int:
    """Refinement AC pass of one block: each already-significant
    coefficient reads one correction bit as the walk passes it; a
    symbol ``(r, 1)`` plants a newly-significant ``±1 << Al`` after r
    zero-HISTORY positions; inside an EOB run only correction bits
    are read."""
    p1 = 1 << al
    m1 = -(1 << al)

    def refine(k: int) -> None:
        if r.read_bit() and (zz[k] & p1) == 0:
            zz[k] += p1 if zz[k] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(r, ac_tab)
            rr, s = rs >> 4, rs & 0x0F
            if s:
                if s != 1:
                    raise ValueError(
                        "JPEG AC refinement symbol with size != 1")
                newval = p1 if r.read_bit() else m1
            else:
                if rr != 15:
                    eobrun = ((1 << rr)
                              + (r.read_bits(rr) if rr else 0))
                    break
                newval = 0                # ZRL: skip 16 zero-history
            while k <= se:
                if zz[k] != 0:
                    refine(k)
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("JPEG AC refinement run past band")
                zz[k] = newval
            k += 1
    if eobrun > 0:
        # EOB-run tail: every remaining significant coefficient reads
        # one correction bit.  flatnonzero replaces the per-position
        # numpy-scalar walk — the all-zero band (the overwhelmingly
        # common case) costs one C pass instead of 63 getitems
        for off in np.flatnonzero(zz[k:se + 1]):
            refine(k + int(off))
        return eobrun - 1
    return 0


# ---------------------------------------------------------------- encoder

class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)     # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


def _huff_table_from_freqs(freqs: dict[int, int]) -> tuple[list[int],
                                                           list[int]]:
    """JPEG-legal optimal Huffman table from symbol frequencies — the
    T.81 Annex K.2 code-length derivation (CODE_SIZE / COUNT_BITS /
    ADJUST_BITS / SORT_INPUT), with the reserved extra symbol that
    guarantees no real symbol is assigned the all-ones code.  Returns
    (BITS[16], HUFFVAL) ready for a DHT segment."""
    freq = [0] * 257
    for s, c in freqs.items():
        freq[s] = c
    freq[256] = 1                         # reserved: claims all-ones code
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        c1 = min((f, -v) for v, f in enumerate(freq) if f > 0)
        v1 = -c1[1]
        rest = [(f, -v) for v, f in enumerate(freq)
                if f > 0 and v != v1]
        if not rest:
            break
        v2 = -min(rest)[1]
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for v in range(257):
        if codesize[v]:
            bits[codesize[v]] += 1
    # ADJUST_BITS: fold code lengths > 16 back into the tree
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 1
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    # drop the reserved symbol's code (the longest one)
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1
    huffval = [v for _, v in sorted(
        (codesize[v], v) for v in range(256) if codesize[v])]
    return bits[1:17], huffval


def _encode_table(bits: list[int], huffval: list[int]) -> dict[int,
                                                               tuple]:
    """(BITS, HUFFVAL) -> symbol -> (code, length) map."""
    enc: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _block_symbols(zz: np.ndarray, pred: int) -> tuple[list, int]:
    """One quantized zigzag block -> [(is_dc, symbol, value, nbits)]."""
    syms = []
    diff = int(zz[0]) - pred
    s = _category(diff)
    syms.append((True, s, diff, s))
    k = 63
    while k >= 1 and zz[k] == 0:
        k -= 1
    run = 0
    for j in range(1, k + 1):
        v = int(zz[j])
        if v == 0:
            run += 1
            continue
        while run > 15:
            syms.append((False, 0xF0, 0, 0))      # ZRL
            run -= 16
        s = _category(v)
        syms.append((False, (run << 4) | s, v, s))
        run = 0
    if k < 63:
        syms.append((False, 0x00, 0, 0))          # EOB
    return syms, int(zz[0])


def _quantize(coeffs: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Round-half-away-from-zero quantization of natural-order blocks,
    returned in zigzag order (n, 64)."""
    nat = coeffs.reshape(-1, 64)
    zz = nat[:, list(ZIGZAG)]
    return np.sign(zz) * np.floor(np.abs(zz) / q[None, :] + 0.5)


def _component_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane (H, W multiples of 8) -> (n, 8, 8) float
    level-shifted blocks in row-major block order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8).astype(np.float64) - 128.0)


def _pad_edge(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate a plane up to (bh*8, bw*8)."""
    h, w = plane.shape
    return np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")


_STD_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)

_STD_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """The public libjpeg quality scaling: 50 -> base table, 100 -> all
    ones, 1 -> 50x base; clamped to [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _prep_components(width: int, height: int, pixels: bytes,
                     gray: bool, subsampling: str, quality: int,
                     qtable) -> tuple:
    """Pixels -> quantized zigzag coefficient blocks per component
    (shared by the baseline and progressive encoders, which differ
    ONLY in how they entropy-code the identical coefficients).
    Returns (comp_zz [(zz int64 (n,64), bw, h, v)], hmax, vmax, mcux,
    mcuy, qt_l, qt_c)."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be 444|420, got {subsampling}")
    if width < 1 or height < 1:
        raise ValueError(f"bad JPEG dimensions {width}x{height}")
    need = width * height * (1 if gray else 3)
    if len(pixels) != need:
        raise ValueError(f"need {need} pixel bytes, got {len(pixels)}")
    if qtable is not None:
        qt_l = np.asarray(qtable, dtype=np.int32).reshape(64)
        qt_c = qt_l
    else:
        qt_l = _scaled_qt(_STD_QT_LUMA, quality)
        qt_c = _scaled_qt(_STD_QT_CHROMA, quality)
    zz_l = qt_l[list(ZIGZAG)]
    zz_c = qt_c[list(ZIGZAG)]

    if gray:
        y = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
        planes = [(y.astype(np.float64), zz_l, 1, 1)]
        hmax = vmax = 1
    else:
        rgb = np.frombuffer(pixels, dtype=np.uint8) \
            .reshape(height, width, 3).astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        yy, cb, cr = (np.clip(np.floor(p + 0.5), 0, 255)
                      for p in (yy, cb, cr))
        if subsampling == "420":
            he, we = (height + 1) // 2 * 2, (width + 1) // 2 * 2
            cbp = _pad_edge(cb, (he + 7) // 8, (we + 7) // 8)[:he, :we]
            crp = _pad_edge(cr, (he + 7) // 8, (we + 7) // 8)[:he, :we]
            cb = np.floor(
                (cbp[0::2, 0::2] + cbp[0::2, 1::2]
                 + cbp[1::2, 0::2] + cbp[1::2, 1::2]) / 4.0 + 0.5)
            cr = np.floor(
                (crp[0::2, 0::2] + crp[0::2, 1::2]
                 + crp[1::2, 0::2] + crp[1::2, 1::2]) / 4.0 + 0.5)
            hmax = vmax = 2
            planes = [(yy, zz_l, 2, 2), (cb, zz_c, 1, 1),
                      (cr, zz_c, 1, 1)]
        else:
            hmax = vmax = 1
            planes = [(yy, zz_l, 1, 1), (cb, zz_c, 1, 1),
                      (cr, zz_c, 1, 1)]

    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    comp_zz = []
    for plane, zzq, h, v in planes:
        bw, bh = mcux * h, mcuy * v
        padded = _pad_edge(plane.astype(np.uint8), bh, bw)
        blocks = _component_blocks(padded)
        comp_zz.append((_quantize(_fdct_blocks(blocks), zzq)
                        .astype(np.int64), bw, h, v))
    return comp_zz, hmax, vmax, mcux, mcuy, qt_l, qt_c


def encode_jpeg(width: int, height: int, pixels: bytes,
                quality: int = 90, gray: bool = False,
                qtable: np.ndarray | list[int] | None = None,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Baseline-sequential JFIF encoder (the synthesis half of
    :func:`decode_jpeg`): forward DCT, quality-scaled (or caller-fixed
    ``qtable``, NATURAL order, e.g. all ones for the exact DC-only
    driver-row recipe) quantization, optimal per-image Huffman tables
    derived with the T.81 Annex K.2 procedure, byte stuffing, optional
    restart markers.  ``gray=True`` takes ``width*height`` single-
    channel bytes; otherwise interleaved RGB with ``subsampling`` in
    {'444', '420'} (4:2:0 box-averages each 2x2 chroma neighborhood).
    """
    comp_zz, hmax, vmax, mcux, mcuy, qt_l, qt_c = _prep_components(
        width, height, pixels, gray, subsampling, quality, qtable)

    # walk the MCU order once, yielding (component-class, symbol,
    # value, nbits) plus restart boundaries; consumed twice — counting
    # symbol frequencies, then writing bits
    total = mcux * mcuy
    per_seg = restart_interval if restart_interval else total

    def walk():
        preds = [0] * len(comp_zz)
        for mcu in range(total):
            if mcu and mcu % per_seg == 0:
                yield ("rst",)
                preds = [0] * len(comp_zz)
            my, mx = divmod(mcu, mcux)
            for ci, (zzb, bw, h, v) in enumerate(comp_zz):
                cls = 0 if ci == 0 else 1      # luma vs chroma tables
                for by in range(v):
                    for bx in range(h):
                        idx = (my * v + by) * bw + (mx * h + bx)
                        syms, preds[ci] = _block_symbols(
                            zzb[idx], preds[ci])
                        for is_dc, sym, val, nbits in syms:
                            yield ("sym", cls, is_dc, sym, val, nbits)

    # pass 1: symbol frequencies (luma tables vs chroma tables)
    freqs = {(0, True): {}, (0, False): {},
             (1, True): {}, (1, False): {}}
    for item in walk():
        if item[0] == "sym":
            _, cls, is_dc, sym, _, _ = item
            t = freqs[(cls, is_dc)]
            t[sym] = t.get(sym, 0) + 1
    tables = [(0, 0, *_huff_table_from_freqs(freqs[(0, True)])),
              (1, 0, *_huff_table_from_freqs(freqs[(0, False)]))]
    if not gray:
        tables += [(0, 1, *_huff_table_from_freqs(freqs[(1, True)])),
                   (1, 1, *_huff_table_from_freqs(freqs[(1, False)]))]
    enc = {(tc, th): _encode_table(bits, vals)
           for tc, th, bits, vals in tables}

    # pass 2: entropy-coded scan with restart markers
    scan = bytearray()
    w = _BitWriter()
    rst = 0
    for item in walk():
        if item[0] == "rst":
            scan.extend(w.flush())
            scan.extend(bytes([0xFF, 0xD0 + (rst & 7)]))
            rst += 1
            w = _BitWriter()
            continue
        _, cls, is_dc, sym, val, nbits = item
        th = 0 if gray else cls
        code, length = enc[(0 if is_dc else 1, th)][sym]
        w.write(code, length)
        if nbits:
            if val < 0:
                val += (1 << nbits) - 1
            w.write(val, nbits)
    scan.extend(w.flush())

    out = bytearray(b"\xFF\xD8")                      # SOI
    out += (b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
            + bytes([0, 0]))                          # APP0
    out += (b"\xFF\xDB" + struct.pack(">H", 67) + bytes([0x00])
            + bytes(int(x) for x in qt_l[list(ZIGZAG)]))
    if not gray:
        out += (b"\xFF\xDB" + struct.pack(">H", 67) + bytes([0x01])
                + bytes(int(x) for x in qt_c[list(ZIGZAG)]))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, height, width, nc)
    samp = [(hmax, vmax), (1, 1), (1, 1)]
    for c in range(nc):
        h, v = samp[c] if not gray else (1, 1)
        sof += bytes([c + 1, (h << 4) | v, 0 if c == 0 else 1])
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, th, bits, vals in tables:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for c in range(nc):
        tid = 0 if c == 0 else 1 if not gray else 0
        sos += bytes([c + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos
    out += scan
    out += b"\xFF\xD9"                                # EOI
    return bytes(out)


# ----------------------------------------------------- progressive encoder

# libjpeg's standard progressive scan scripts (public knowledge): DC
# first at Al=1, low-frequency luma band early, chroma before luma
# detail, successive-approximation refinements last.  Every (band, Al)
# ladder ends at Al=0, so the decoded coefficients equal the baseline
# encoder's exactly — scan organization is presentation order only.
_DEFAULT_SCRIPT_GRAY = (
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
)
_DEFAULT_SCRIPT_COLOR = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
)


def _prog_units(comp_ids: tuple, comp_zz: list, ni: list,
                mcux: int, mcuy: int) -> list:
    """Encoder twin of the decoder's ``_scan_units``: the (comp-index,
    block-index) groups of one scan in transmission order, one group
    per restart-counted unit."""
    units = []
    if len(comp_ids) == 1:
        ci = comp_ids[0]
        _, bw, _, _ = comp_zz[ci]
        wb, hb = ni[ci]
        for row in range(hb):
            for col in range(wb):
                units.append([(ci, row * bw + col)])
    else:
        for mcu in range(mcux * mcuy):
            my, mx = divmod(mcu, mcux)
            unit = []
            for ci in comp_ids:
                _, bw, h, v = comp_zz[ci]
                for by in range(v):
                    for bx in range(h):
                        unit.append((ci, (my * v + by) * bw
                                     + (mx * h + bx)))
            units.append(unit)
    return units


def _prog_scan_events(scan: tuple, comp_zz: list, ni: list, mcux: int,
                      mcuy: int, restart_interval: int) -> list:
    """Entropy events of ONE progressive scan: ``("s", tid, symbol)``
    Huffman symbols, ``("b", value, nbits)`` raw/extra bits (negative
    values get the T.81 adjustment at write time), ``("r",)`` restart
    boundaries.  Consumed twice — frequency counting, then writing.

    The AC-refinement walk mirrors the decoder (and jcphuff.c's
    published structure): correction bits for already-significant
    coefficients buffer up and flush in POSITIONAL order — after each
    ZRL, after each newly-significant symbol's sign bit, and after a
    flushed EOB run — exactly where the decoder's walks read them."""
    comp_ids, ss, se, ah, al = scan
    units = _prog_units(comp_ids, comp_zz, ni, mcux, mcuy)
    per_seg = restart_interval if restart_interval else len(units)
    events: list = []

    if ss == 0 and ah == 0:                       # DC first
        for seg0 in range(0, len(units), per_seg):
            if seg0:
                events.append(("r",))
            preds = {ci: 0 for ci in comp_ids}
            for unit in units[seg0:seg0 + per_seg]:
                for ci, idx in unit:
                    tid = 0 if ci == 0 else 1
                    temp = int(comp_zz[ci][0][idx][0]) >> al
                    diff = temp - preds[ci]
                    preds[ci] = temp
                    s = _category(diff)
                    events.append(("s", tid, s))
                    if s:
                        events.append(("b", diff, s))
        return events

    if ss == 0:                                    # DC refinement
        for seg0 in range(0, len(units), per_seg):
            if seg0:
                events.append(("r",))
            for unit in units[seg0:seg0 + per_seg]:
                for ci, idx in unit:
                    events.append(
                        ("b", (int(comp_zz[ci][0][idx][0]) >> al) & 1,
                         1))
        return events

    ci = comp_ids[0]
    tid = 0 if ci == 0 else 1
    zzb = comp_zz[ci][0]
    eobrun = 0
    pending: list = []                             # EOB-run correction bits

    def flush_eob() -> None:
        nonlocal eobrun, pending
        if eobrun:
            nbits = eobrun.bit_length() - 1
            events.append(("s", tid, nbits << 4))
            if nbits:
                events.append(("b", eobrun - (1 << nbits), nbits))
            eobrun = 0
        for b in pending:
            events.append(("b", b, 1))
        pending = []

    if ah == 0:                                    # AC first
        for seg0 in range(0, len(units), per_seg):
            if seg0:
                flush_eob()
                events.append(("r",))
            for unit in units[seg0:seg0 + per_seg]:
                zz = zzb[unit[0][1]]
                r_ = 0
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    mag = (v if v >= 0 else -v) >> al
                    if mag == 0:
                        r_ += 1
                        continue
                    while r_ > 15:
                        flush_eob()
                        events.append(("s", tid, 0xF0))
                        r_ -= 16
                    flush_eob()
                    s = mag.bit_length()
                    events.append(("s", tid, (r_ << 4) | s))
                    events.append(("b", mag if v >= 0 else -mag, s))
                    r_ = 0
                if r_ > 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        return events

    if ah != al + 1:                               # AC refinement
        raise ValueError(
            f"successive approximation must step one bit (Ah={ah}, "
            f"Al={al})")
    for seg0 in range(0, len(units), per_seg):
        if seg0:
            flush_eob()
            events.append(("r",))
        for unit in units[seg0:seg0 + per_seg]:
            zz = zzb[unit[0][1]]
            mags = [(int(zz[k]) if int(zz[k]) >= 0
                     else -int(zz[k])) >> al
                    for k in range(ss, se + 1)]
            eob_idx = ss - 1
            for j, m in enumerate(mags):
                if m == 1:
                    eob_idx = ss + j
            r_ = 0
            br: list = []
            for k in range(ss, se + 1):
                mag = mags[k - ss]
                if mag == 0:
                    r_ += 1
                    continue
                while r_ > 15 and k <= eob_idx:
                    flush_eob()
                    events.append(("s", tid, 0xF0))
                    r_ -= 16
                    for b in br:
                        events.append(("b", b, 1))
                    br = []
                if mag > 1:
                    br.append(mag & 1)
                    continue
                flush_eob()
                events.append(("s", tid, (r_ << 4) | 1))
                events.append(("b", 1 if int(zz[k]) >= 0 else 0, 1))
                for b in br:
                    events.append(("b", b, 1))
                br = []
                r_ = 0
            if r_ > 0 or br:
                eobrun += 1
                pending.extend(br)
                if eobrun == 0x7FFF:
                    flush_eob()
    flush_eob()
    return events


def encode_jpeg_progressive(width: int, height: int, pixels: bytes,
                            quality: int = 90, gray: bool = False,
                            qtable: np.ndarray | list[int] | None = None,
                            subsampling: str = "444",
                            restart_interval: int = 0,
                            scan_script: tuple | None = None) -> bytes:
    """Progressive (SOF2) JFIF encoder — the synthesis half of the
    progressive decode path, sharing :func:`_prep_components` with
    :func:`encode_jpeg` so the QUANTIZED COEFFICIENTS are identical to
    a baseline encode of the same pixels: decoding either stream gives
    byte-identical output (the invariant the roundtrip tests pin).

    ``scan_script`` is a tuple of ``(component_indices, Ss, Se, Ah,
    Al)`` scans (default: libjpeg's standard script).  Each scan gets
    optimal per-scan Huffman tables (T.81 Annex K.2); DC refinement
    scans are raw bits and define none.  Every band's approximation
    ladder must reach Al=0 and cover 1..63 for a faithful image; the
    default scripts do."""
    comp_zz, hmax, vmax, mcux, mcuy, qt_l, qt_c = _prep_components(
        width, height, pixels, gray, subsampling, quality, qtable)
    nc = 1 if gray else 3
    if scan_script is None:
        scan_script = (_DEFAULT_SCRIPT_GRAY if gray
                       else _DEFAULT_SCRIPT_COLOR)
    for comp_ids, ss, se, ah, al in scan_script:
        if any(ci >= nc for ci in comp_ids):
            raise ValueError(f"scan names component >= {nc}")
        if ss == 0 and se != 0:
            raise ValueError("DC scan must have Se = 0")
        if ss > 0 and len(comp_ids) != 1:
            raise ValueError("AC scans must be single-component")
        if not 0 <= ss <= se <= 63 or al > 13 or (ah and ah != al + 1):
            raise ValueError(f"bad scan ({ss},{se},{ah},{al})")

    ni = []
    for _, _, h, v in comp_zz:
        cw = (width * h + hmax - 1) // hmax
        ch = (height * v + vmax - 1) // vmax
        ni.append(((cw + 7) // 8, (ch + 7) // 8))

    out = bytearray(b"\xFF\xD8")                      # SOI
    out += (b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
            + bytes([0, 0]))                          # APP0
    out += (b"\xFF\xDB" + struct.pack(">H", 67) + bytes([0x00])
            + bytes(int(x) for x in qt_l[list(ZIGZAG)]))
    if not gray:
        out += (b"\xFF\xDB" + struct.pack(">H", 67) + bytes([0x01])
                + bytes(int(x) for x in qt_c[list(ZIGZAG)]))
    sof = struct.pack(">BHHB", 8, height, width, nc)
    samp = [(hmax, vmax), (1, 1), (1, 1)]
    for c in range(nc):
        h, v = samp[c] if not gray else (1, 1)
        sof += bytes([c + 1, (h << 4) | v, 0 if c == 0 else 1])
    out += b"\xFF\xC2" + struct.pack(">H", 2 + len(sof)) + sof
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)

    for scan in scan_script:
        comp_ids, ss, se, ah, al = scan
        events = _prog_scan_events(scan, comp_zz, ni, mcux, mcuy,
                                   restart_interval)
        freqs: dict[int, dict[int, int]] = {}
        for ev in events:
            if ev[0] == "s":
                t = freqs.setdefault(ev[1], {})
                t[ev[2]] = t.get(ev[2], 0) + 1
        cls = 0 if ss == 0 else 1
        enc = {}
        for tid in sorted(freqs):
            bits, vals = _huff_table_from_freqs(freqs[tid])
            body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
            out += b"\xFF\xC4" + struct.pack(">H", 2 + len(body)) + body
            enc[tid] = _encode_table(bits, vals)
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            tid = 0 if ci == 0 else 1
            sos += bytes([ci + 1,
                          (tid << 4) if ss == 0 else tid])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos
        w = _BitWriter()
        rst = 0
        for ev in events:
            if ev[0] == "r":
                out += w.flush()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                w = _BitWriter()
            elif ev[0] == "s":
                code, length = enc[ev[1]][ev[2]]
                w.write(code, length)
            else:
                _, val, nbits = ev
                if val < 0:
                    val += (1 << nbits) - 1
                w.write(val, nbits)
        out += w.flush()
    out += b"\xFF\xD9"                                # EOI
    return bytes(out)


def encode_jpeg_multiscan(width: int, height: int, pixels: bytes,
                          quality: int = 90, gray: bool = False,
                          qtable: np.ndarray | list[int] | None = None,
                          subsampling: str = "444",
                          restart_interval: int = 0) -> bytes:
    """Multi-scan SEQUENTIAL (SOF0) encoder: one scan per component
    (Y, then Cb, then Cr — the layout some hardware encoders emit),
    each walking that component's real block raster with full-band
    Huffman coding and per-scan optimal tables.  Shares
    :func:`_prep_components` with the other encoders, so decoding this
    stream equals decoding the interleaved :func:`encode_jpeg` stream
    byte-for-byte — the r12 multi-scan sequential decode path's test
    invariant."""
    comp_zz, hmax, vmax, mcux, mcuy, qt_l, qt_c = _prep_components(
        width, height, pixels, gray, subsampling, quality, qtable)
    nc = 1 if gray else 3

    out = bytearray(b"\xFF\xD8")
    out += (b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
            + bytes([0, 0]))
    out += (b"\xFF\xDB" + struct.pack(">H", 67) + bytes([0x00])
            + bytes(int(x) for x in qt_l[list(ZIGZAG)]))
    if not gray:
        out += (b"\xFF\xDB" + struct.pack(">H", 67) + bytes([0x01])
                + bytes(int(x) for x in qt_c[list(ZIGZAG)]))
    sof = struct.pack(">BHHB", 8, height, width, nc)
    samp = [(hmax, vmax), (1, 1), (1, 1)]
    for c in range(nc):
        h, v = samp[c] if not gray else (1, 1)
        sof += bytes([c + 1, (h << 4) | v, 0 if c == 0 else 1])
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)

    for ci in range(nc):
        zzb, bw, h, v = comp_zz[ci]
        cw = (width * h + hmax - 1) // hmax
        ch = (height * v + vmax - 1) // vmax
        wb, hb = (cw + 7) // 8, (ch + 7) // 8
        idxs = [row * bw + col for row in range(hb)
                for col in range(wb)]
        per_seg = restart_interval if restart_interval else len(idxs)

        def walk():
            pred = 0
            for u, idx in enumerate(idxs):
                if u and u % per_seg == 0:
                    yield ("rst",)
                    pred = 0
                syms, pred = _block_symbols(zzb[idx], pred)
                for is_dc, sym, val, nbits in syms:
                    yield ("sym", is_dc, sym, val, nbits)

        freqs = {True: {}, False: {}}
        for item in walk():
            if item[0] == "sym":
                _, is_dc, sym, _, _ = item
                t = freqs[is_dc]
                t[sym] = t.get(sym, 0) + 1
        tid = 0 if ci == 0 else 1
        enc = {}
        for is_dc in (True, False):
            bits, vals = _huff_table_from_freqs(freqs[is_dc])
            body = (bytes([((0 if is_dc else 1) << 4) | tid])
                    + bytes(bits) + bytes(vals))
            out += b"\xFF\xC4" + struct.pack(">H", 2 + len(body)) + body
            enc[is_dc] = _encode_table(bits, vals)
        sos = bytes([1, ci + 1, (tid << 4) | tid, 0, 63, 0])
        out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos
        w = _BitWriter()
        rst = 0
        for item in walk():
            if item[0] == "rst":
                out += w.flush()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                w = _BitWriter()
                continue
            _, is_dc, sym, val, nbits = item
            code, length = enc[is_dc][sym]
            w.write(code, length)
            if nbits:
                if val < 0:
                    val += (1 << nbits) - 1
                w.write(val, nbits)
        out += w.flush()
    out += b"\xFF\xD9"
    return bytes(out)


# ------------------------------------------------------------- lossless

def _lossless_predict(plane: np.ndarray, x: int, y: int, psv: int,
                      default: int) -> int:
    """T.81 Annex H sample prediction for steady state.  First
    column -> Rb; otherwise predictor ``psv`` in 1..7.  The H.1.1
    first-line rule (first sample of the scan OR of a restart
    interval -> ``default`` = 2^(P-Pt-1); rest of that line -> the
    1-D Ra predictor) is applied by the callers, which know where
    restart intervals begin; the y==0 branch here is a safety net
    for direct calls."""
    if y == 0:
        return int(plane[0, x - 1])              # Ra
    if x == 0:
        return int(plane[y - 1, 0])              # Rb
    ra = int(plane[y, x - 1])
    rb = int(plane[y - 1, x])
    rc = int(plane[y - 1, x - 1])
    if psv == 1:
        return ra
    if psv == 2:
        return rb
    if psv == 3:
        return rc
    if psv == 4:
        return ra + rb - rc
    if psv == 5:
        return ra + ((rb - rc) >> 1)
    if psv == 6:
        return rb + ((ra - rc) >> 1)
    if psv == 7:
        return (ra + rb) >> 1
    raise ValueError(f"bad lossless predictor selector {psv}")


def _lossless_scan(content: bytes, start: int, frame: dict,
                   order: list, sel: dict, huff: dict,
                   restart_interval: int, psv: int, pt: int) -> dict:
    """Decode a LOSSLESS (SOF3) scan: per-sample Huffman SSSS
    categories + extra bits give differences from the Annex-H
    prediction, accumulated modulo 2^16; samples shift back by the
    point transform.  Components must be unsubsampled (h=v=1 — the
    universal layout for lossless: no DCT means no chroma planes to
    shrink); three components are direct RGB (T.81 lossless applies
    NO color transform).  Output normalized to the decode_image RGB
    contract (high byte for precision > 8, like 16-bit PNG)."""
    width, height, comps = frame["w"], frame["h"], frame["comps"]
    prec = frame["prec"]
    if not 1 <= psv <= 7:
        raise ValueError(f"bad lossless predictor selector {psv}")
    if pt >= prec:
        raise ValueError(f"point transform {pt} >= precision {prec}")
    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
        raise NotImplementedError(
            "subsampled lossless JPEG components")
    if [c["id"] for c in comps] != order:
        raise NotImplementedError(
            "lossless JPEG scans must carry all components in frame "
            "order (interleaved single scan)")
    tabs = {}
    for cid in order:
        dc_id, _ = sel[cid]
        if (0, dc_id) not in huff:
            raise ValueError("JPEG missing Huffman table for scan")
        tabs[cid] = huff[(0, dc_id)]
    planes = {cid: np.zeros((height, width), np.int32)
              for cid in order}
    default = 1 << (prec - pt - 1)
    total = width * height
    per_seg = restart_interval if restart_interval else total
    segs, _ = _entropy_segments(content, start)
    sample = 0
    for seg in segs:
        if sample >= total:
            break
        r = _BitReader(seg)
        # T.81 H.1.1: at the start of the scan and of each restart
        # interval, the first sample predicts from ``default`` and
        # the remainder of that sample line uses the 1-D Ra
        # predictor; the selected 2-D predictor resumes at the next
        # line (matches libjpeg-turbo's lossless codec).
        seg_start = sample
        line_end = (seg_start // width + 1) * width
        for _ in range(min(per_seg, total - sample)):
            y, x = divmod(sample, width)
            for cid in order:
                s = _huff_decode(r, tabs[cid])
                if s == 16:
                    diff = 32768
                elif s:
                    diff = _extend(r.read_bits(s), s)
                else:
                    diff = 0
                if sample == seg_start:
                    pred = default
                elif sample < line_end:
                    pred = int(planes[cid][y, x - 1])    # Ra
                else:
                    pred = _lossless_predict(planes[cid], x, y, psv,
                                             default)
                planes[cid][y, x] = (pred + diff) & 0xFFFF
            sample += 1
    if sample < total:
        raise ValueError(f"truncated JPEG lossless scan: "
                         f"{sample}/{total} samples decoded")
    chans = []
    for cid in order:
        v = planes[cid] << pt
        if prec > 8:
            v = v >> (prec - 8)
        elif prec < 8:
            # round-half-up max-scaling (matches the BMP bitfields
            # channel expansion): full scale maps to 255, not 255>>k
            maxv = (1 << prec) - 1
            v = (v * 255 + maxv // 2) // maxv
        chans.append(v.astype(np.uint8))
    if len(chans) == 1:
        rgb = np.stack([chans[0]] * 3, axis=-1)
    else:
        rgb = np.stack(chans, axis=-1)
    return {"format": "jpeg", "width": width, "height": height,
            "maxval": 255, "pixels": rgb.tobytes()}


def encode_jpeg_lossless(width: int, height: int, pixels: bytes,
                         gray: bool = False, predictor: int = 1,
                         point_transform: int = 0,
                         restart_interval: int = 0) -> bytes:
    """Lossless (SOF3) encoder: 8-bit samples, predictor 1..7,
    optional point transform (samples code as ``v >> Pt``; decode
    returns ``(v >> Pt) << Pt`` — exact when Pt=0), per-component
    optimal SSSS Huffman tables, restart markers.  Gray in ->
    1-component; RGB in -> 3 DIRECT components (no color transform),
    so ``decode_jpeg(encode_jpeg_lossless(px)) == px`` bit-for-bit
    for ANY content at Pt=0 — the property the driver row pins with
    full-entropy digest pixels."""
    if not 1 <= predictor <= 7:
        raise ValueError(f"predictor must be 1..7, got {predictor}")
    if not 0 <= point_transform <= 7:
        raise ValueError(
            f"point transform must be 0..7, got {point_transform}")
    nc = 1 if gray else 3
    need = width * height * nc
    if width < 1 or height < 1:
        raise ValueError(f"bad JPEG dimensions {width}x{height}")
    if len(pixels) != need:
        raise ValueError(f"need {need} pixel bytes, got {len(pixels)}")
    arr = np.frombuffer(pixels, np.uint8).reshape(height, width, nc) \
        .astype(np.int32) >> point_transform
    default = 1 << (8 - point_transform - 1)
    total = width * height
    per_seg = restart_interval if restart_interval else total

    def walk(ci):
        plane = arr[:, :, ci]
        for sample in range(total):
            y, x = divmod(sample, width)
            # T.81 H.1.1 (mirrors _lossless_scan): first sample of
            # each restart interval -> default; remainder of that
            # line -> Ra; selected predictor from the next line on.
            seg_start = sample - sample % per_seg
            line_end = (seg_start // width + 1) * width
            if sample == seg_start:
                pred = default
            elif sample < line_end:
                pred = int(plane[y, x - 1])          # Ra
            else:
                pred = _lossless_predict(plane, x, y, predictor,
                                         default)
            diff = (int(plane[y, x]) - pred) & 0xFFFF
            if diff > 32767:
                diff -= 65536
            s = 16 if diff == 32768 else _category(diff)
            yield sample, s, diff

    freqs = [{} for _ in range(nc)]
    for ci in range(nc):
        for _, s, _ in walk(ci):
            freqs[ci][s] = freqs[ci].get(s, 0) + 1

    out = bytearray(b"\xFF\xD8")
    out += (b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
            + bytes([0, 0]))
    sof = struct.pack(">BHHB", 8, height, width, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])
    out += b"\xFF\xC3" + struct.pack(">H", 2 + len(sof)) + sof
    enc = []
    for ci in range(nc):
        bits, vals = _huff_table_from_freqs(freqs[ci])
        body = bytes([ci]) + bytes(bits) + bytes(vals)   # class 0, id ci
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(body)) + body
        enc.append(_encode_table(bits, vals))
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, c << 4])
    sos += bytes([predictor, 0, point_transform])
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos

    walks = [walk(ci) for ci in range(nc)]
    w = _BitWriter()
    rst = 0
    for sample in range(total):
        if sample and sample % per_seg == 0:
            out += w.flush()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            w = _BitWriter()
        for ci in range(nc):
            _, s, diff = next(walks[ci])
            code, length = enc[ci][s]
            w.write(code, length)
            if s and s != 16:
                if diff < 0:
                    diff += (1 << s) - 1
                w.write(diff, s)
    out += w.flush()
    out += b"\xFF\xD9"
    return bytes(out)
