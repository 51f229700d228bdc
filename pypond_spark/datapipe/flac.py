"""FLAC audio codec — pure-Python decode + encode of the public
xiph.org FLAC format (RFC 9639), no external libraries.

FLAC is integer-exact lossless compression, so the hash-exact oracle
recipe that certified the r12 lossless JPEG applies verbatim: a
driver row synthesizes deterministic PCM from md5 chains, round-trips
it through REAL FLAC bytes, and the DuckDB oracle replays the samples
from the same chains.  This closes the r12 boundary "compressed audio
== header-only triage" (``multimodal.decode_audio`` handled WAV PCM
only; MP3 frame decode remains a documented raise — psychoacoustic
float transforms are not hash-exactable and need codec libraries).

Decoder coverage (everything a real FLAC corpus carries):

- STREAMINFO + all metadata blocks (skipped except STREAMINFO);
- frame headers: sync, both blocking strategies, all block-size and
  sample-rate codes, UTF-8-style coded frame/sample numbers, CRC-8
  verified;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized coefficients, signed shift), wasted bits;
- residuals: Rice codes (4- and 5-bit parameter variants), partition
  orders 0-15, escape partitions (raw n-bit residuals);
- stereo decorrelation: independent, left-side, right-side,
  mid-side (the ``(mid<<1 | side&1) ± side >> 1`` exact integer
  reconstruction);
- 8/16/24/32-bit sample sizes; frame CRC-16 verified (corruption is
  loud, never silently wrong samples).

Encoder (the synthesis half): 4-100 kHz, 1-8 channels, 8/16/24-bit,
CONSTANT / VERBATIM / FIXED(0-4) subframes with single-partition Rice
residuals (parameter chosen by mean absolute residual), correct
CRC-8/CRC-16, so repo-encoded streams decode in any conformant tool
and ``decode_flac(encode_flac(pcm)) == pcm`` bit-for-bit for ANY
content.

Scale shape: like every codec here, decode runs per clip inside
Arrow ``mapInPandas`` batches — zero shuffle, partition-local.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_flac", "encode_flac"]


# ------------------------------------------------------------ bit I/O

class _BitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0

    def byte_pos(self) -> int:
        return self.pos - (self.nbits + 7) // 8


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
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        return bytes(self.out)


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _read_coded_number(r: _BitReader) -> int:
    """The UTF-8-style frame/sample number coding (up to 36 bits /
    7 bytes)."""
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError(f"bad FLAC coded-number lead byte {b0:#x}")
    v = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad FLAC coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


_BLOCKSIZE_TABLE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_TABLE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_SSIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                4: [4, -6, 4, -1]}


def _decode_residual(r: _BitReader, blocksize: int,
                     order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    plen = 4 + method                       # rice parameter width
    escape = (1 << plen) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("FLAC partition order does not divide "
                         "the block size")
    out: list[int] = []
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        param = r.read(plen)
        if param == escape:
            nbits = r.read(5)
            for _ in range(n):
                out.append(r.read_signed(nbits) if nbits else 0)
        else:
            for _ in range(n):
                q = r.read_unary()
                v = (q << param) | r.read(param)
                out.append((v >> 1) ^ -(v & 1))    # unzigzag
    return out


def _decode_subframe(r: _BitReader, blocksize: int,
                     bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("FLAC subframe padding bit is not zero")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
        bps -= wasted
    if ftype == 0:                           # CONSTANT
        out = [r.read_signed(bps)] * blocksize
    elif ftype == 1:                         # VERBATIM
        out = [r.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:                   # FIXED order 0..4
        order = ftype - 8
        if order > blocksize:
            raise ValueError("FLAC predictor order exceeds block")
        out = [r.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(r, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for e in resid:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append(e + pred)
    elif ftype >= 32:                        # LPC order 1..32
        order = ftype - 31
        if order > blocksize:
            raise ValueError("FLAC predictor order exceeds block")
        out = [r.read_signed(bps) for _ in range(order)]
        prec = r.read(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC precision code 15")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(r, blocksize, order)
        for e in resid:
            acc = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append(e + (acc >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(content: bytes) -> dict:
    """Decode FLAC bytes to the ``decode_audio`` dict shape:
    ``{"format", "sample_rate", "channels", "bits_per_sample",
    "n_samples", "samples"}`` with ``samples`` a channels-major list
    of int lists (exact integers, no normalization)."""
    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC stream: missing fLaC magic")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(content):
            raise ValueError("truncated FLAC metadata")
        hdr = content[pos]
        last = hdr >> 7
        btype = hdr & 0x7F
        size = int.from_bytes(content[pos + 1:pos + 4], "big")
        body = content[pos + 4:pos + 4 + size]
        if btype == 0:                       # STREAMINFO
            # check the bytes actually present, not the claimed size
            if size < 34 or len(body) < 34:
                raise ValueError("short FLAC STREAMINFO")
            rate = int.from_bytes(body[10:13], "big") >> 4
            channels = ((body[12] >> 1) & 0x07) + 1
            bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            total = ((body[13] & 0x0F) << 32) \
                | int.from_bytes(body[14:18], "big")
            info = (rate, channels, bps, total)
        elif btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        pos += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream without STREAMINFO")
    rate, channels, bps, total = info

    chans: list[list[int]] = [[] for _ in range(channels)]
    n = len(content)
    while pos < n:
        if total > 0 and all(len(c) >= total for c in chans):
            # STREAMINFO's sample count is satisfied: tolerate
            # trailing padding / appended tags (e.g. ID3v1); the
            # strict sync raise below stays for mid-stream garbage
            break
        frame_start = pos
        r = _BitReader(content, pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError(
                f"bad FLAC frame sync at byte {frame_start}")
        if r.read(1):
            raise ValueError("reserved FLAC frame bit set")
        r.read(1)                            # blocking strategy
        bs_code = r.read(4)
        rate_code = r.read(4)
        chan_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("reserved FLAC frame header bit set")
        _read_coded_number(r)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code 0")
        elif bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
        if rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        elif rate_code == 15:
            raise ValueError("invalid FLAC sample rate code 15")
        fbps = bps if ss_code == 0 else _SSIZE_TABLE.get(ss_code)
        if fbps is None:
            raise ValueError(f"reserved FLAC sample size {ss_code}")
        hdr_end = r.byte_pos()
        crc8 = r.read(8)
        if _crc8(content[frame_start:hdr_end]) != crc8:
            raise ValueError(
                f"FLAC frame header CRC-8 mismatch at {frame_start}")

        if chan_code < 8:
            nch = chan_code + 1
            if nch != channels:
                raise ValueError("FLAC frame channel count differs "
                                 "from STREAMINFO")
            subs = [_decode_subframe(r, blocksize, fbps)
                    for _ in range(nch)]
        elif chan_code == 8:                 # left-side
            left = _decode_subframe(r, blocksize, fbps)
            side = _decode_subframe(r, blocksize, fbps + 1)
            subs = [left, [a - b for a, b in zip(left, side)]]
        elif chan_code == 9:                 # right-side
            side = _decode_subframe(r, blocksize, fbps + 1)
            right = _decode_subframe(r, blocksize, fbps)
            subs = [[a + b for a, b in zip(right, side)], right]
        elif chan_code == 10:                # mid-side
            mid = _decode_subframe(r, blocksize, fbps)
            side = _decode_subframe(r, blocksize, fbps + 1)
            left, right = [], []
            for m, s in zip(mid, side):
                m = (m << 1) | (s & 1)
                left.append((m + s) >> 1)
                right.append((m - s) >> 1)
            subs = [left, right]
        else:
            raise ValueError(
                f"reserved FLAC channel assignment {chan_code}")
        if chan_code >= 8 and channels != 2:
            raise ValueError("FLAC stereo decorrelation in a "
                             "non-stereo stream")
        r.align()
        body_end = r.byte_pos()
        (crc16,) = struct.unpack(">H",
                                 content[body_end:body_end + 2])
        if _crc16(content[frame_start:body_end]) != crc16:
            raise ValueError(
                f"FLAC frame CRC-16 mismatch at {frame_start}")
        for c in range(channels):
            chans[c].extend(subs[c])
        pos = body_end + 2

    if total and any(len(c) < total for c in chans):
        raise ValueError(
            f"truncated FLAC: {len(chans[0])}/{total} samples")
    if total:
        chans = [c[:total] for c in chans]
    return {"format": "flac", "sample_rate": rate,
            "channels": channels, "bits_per_sample": bps,
            "n_samples": len(chans[0]), "samples": chans}


# ------------------------------------------------------------ encoder

def _write_coded_number(w: _BitWriter, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    chunks = []
    nbits = v.bit_length()
    n = 2
    while (7 - n) + 6 * (n - 1) < nbits:
        n += 1
    for i in range(n - 1):
        chunks.append(0x80 | (v & 0x3F))
        v >>= 6
    w.write((0xFF00 >> n) & 0xFF | v, 8)
    for c in reversed(chunks):
        w.write(c, 8)


def _rice_param_for(resid: list[int]) -> int:
    if not resid:
        return 0
    mean = sum(abs(e) for e in resid) / len(resid)
    k = 0
    while (1 << k) < mean + 1 and k < 14:
        k += 1
    return k


def _write_residual(w: _BitWriter, resid: list[int]) -> None:
    """Single-partition (order 0) 4-bit Rice coding; escapes to raw
    if the parameter would exceed 14."""
    w.write(0, 2)                            # method 0: 4-bit rice
    w.write(0, 4)                            # partition order 0
    param = _rice_param_for(resid)
    w.write(param, 4)
    for e in resid:
        z = (e << 1) if e >= 0 else ((-e) << 1) - 1   # zigzag
        q = z >> param
        w.write(1, q + 1)         # unary: q zeros followed by a one
        w.write(z & ((1 << param) - 1), param)


def _fixed_residual(samples: list[int], order: int) -> list[int]:
    coefs = _FIXED_COEFS[order]
    out = []
    for i in range(order, len(samples)):
        pred = sum(c * samples[i - j - 1]
                   for j, c in enumerate(coefs))
        out.append(samples[i] - pred)
    return out


def _write_subframe(w: _BitWriter, samples: list[int], bps: int,
                    subframe: str) -> None:
    w.write(0, 1)                            # padding
    if subframe == "constant":
        w.write(0, 6)
        w.write(0, 1)                        # no wasted bits
        w.write(samples[0], bps)
        return
    if subframe == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for s in samples:
            w.write(s, bps)
        return
    order = int(subframe.split("fixed")[1])
    if not 0 <= order <= 4 or order > len(samples):
        raise ValueError(f"bad FLAC fixed order for {subframe!r}")
    w.write(8 + order, 6)
    w.write(0, 1)
    for s in samples[:order]:
        w.write(s, bps)
    _write_residual(w, _fixed_residual(samples, order))


def encode_flac(sample_rate: int, channels: int, bps: int,
                samples: list[list[int]], blocksize: int = 4096,
                subframe: str = "auto") -> bytes:
    """Encode channels-major integer PCM as a valid FLAC stream.

    ``subframe``: ``auto`` picks per block the cheapest of constant
    (when the block is constant) and fixed orders 0-2; or force
    ``constant`` / ``verbatim`` / ``fixed0`` .. ``fixed4``.  Always
    independent channels (no decorrelation — exactness needs no help
    and independent frames decode everywhere)."""
    if not 1 <= channels <= 8:
        raise ValueError(f"channels must be 1..8, got {channels}")
    if bps not in (8, 16, 24):
        raise ValueError(f"bits_per_sample must be 8/16/24, got {bps}")
    if len(samples) != channels:
        raise ValueError(f"need {channels} channel lists, "
                         f"got {len(samples)}")
    n = len(samples[0])
    if any(len(c) != n for c in samples):
        raise ValueError("FLAC channels must be equal length")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    for c in samples:
        for v in c:
            if not lo <= v <= hi:
                raise ValueError(
                    f"sample {v} out of {bps}-bit range")

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + bytes(16)            # md5 zeroed (unset)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, n, blocksize):
        block = [c[start:start + blocksize] for c in samples]
        bs = len(block[0])
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)                        # fixed blocksize strategy
        w.write(7, 4)                        # blocksize: 16-bit follows
        w.write(0, 4)                        # rate: from STREAMINFO
        w.write(channels - 1, 4)
        w.write({8: 1, 16: 4, 24: 6}[bps], 3)
        w.write(0, 1)
        _write_coded_number(w, frame_no)
        w.write(bs - 1, 16)
        hdr = w.bytes()
        assert w.nbits == 0
        w.write(_crc8(hdr), 8)
        for ch in block:
            sf = subframe
            if sf == "auto":
                if all(v == ch[0] for v in ch):
                    sf = "constant"
                else:
                    best, best_cost = "fixed0", None
                    for o in (0, 1, 2):
                        if o > len(ch):
                            continue
                        res = _fixed_residual(ch, o)
                        cost = sum(abs(e) for e in res)
                        if best_cost is None or cost < best_cost:
                            best, best_cost = f"fixed{o}", cost
                    sf = best
            _write_subframe(w, ch, bps, sf)
        w.pad_to_byte()
        frame = w.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
        frame_no += 1
    return bytes(out)
