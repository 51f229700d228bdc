"""AIFF / AIFF-C audio codec — pure Python, integer-exact.

The Audio Interchange File Format (Apple, 1989; the EA-IFF-85 chunk
grammar) is the big-endian sibling of RIFF/WAV and still common in
archival and pro-audio corpora.  This module decodes and encodes the
PCM subset that is integer-exact:

- container: ``FORM`` size ``AIFF``/``AIFC`` with ``COMM`` + ``SSND``
  chunks (chunks pad to even length; unknown chunks are skipped);
- ``COMM``: channels, frame count, sample size, and the sample rate
  as an 80-bit IEEE 754 extended float (parsed and written with
  integer shifts — exact for every integer rate);
- samples: signed big-endian PCM at 8/16/24/32 bits (AIFF 8-bit is
  SIGNED, unlike WAV), plus the AIFC ``sowt`` little-endian 16-bit
  byte order used by classic Mac software.  AIFC ``NONE`` is
  accepted as plain big-endian.

Compressed AIFC variants (``ulaw``/``alaw``/``fl32``/...) raise
``NotImplementedError`` — honest capability boundaries, same law as
the MP3/MP4 raises in :mod:`pypond_spark.datapipe.multimodal`.
Structural corruption raises ``ValueError``.

Scale shape: one clip = one row through Arrow ``mapInPandas`` via
``multimodal.decode_audio`` — zero shuffle, partition-local.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_aiff", "encode_aiff"]


def _read_ext80(b: bytes) -> int:
    """80-bit extended float -> nearest integer sample rate (sign
    ignored: rates are positive)."""
    if len(b) != 10:
        raise ValueError("bad extended-float field")
    exp = struct.unpack(">H", b[:2])[0] & 0x7FFF
    mant = struct.unpack(">Q", b[2:])[0]
    if exp == 0 and mant == 0:
        return 0
    shift = 63 - (exp - 16383)
    if shift >= 64 or shift < -8:
        raise ValueError("sample rate out of range")
    if shift >= 0:
        half = (1 << (shift - 1)) if shift else 0
        return (mant + half) >> shift
    return mant << -shift


def _write_ext80(rate: int) -> bytes:
    if rate == 0:
        return b"\x00" * 10
    if rate < 0:
        raise ValueError("negative sample rate")
    e = rate.bit_length() - 1
    return struct.pack(">HQ", 16383 + e, rate << (63 - e))


def _unpack_pcm(raw: bytes, bits: int, little: bool) -> list[int]:
    if bits == 8:
        return np.frombuffer(raw, dtype=np.int8).tolist()
    if bits == 16:
        dt = "<i2" if little else ">i2"
        return np.frombuffer(raw, dtype=dt).tolist()
    if bits == 32:
        dt = "<i4" if little else ">i4"
        return np.frombuffer(raw, dtype=dt).tolist()
    if bits == 24:
        u = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        if little:
            v = (u[:, 2].astype(np.int64) << 16) | \
                (u[:, 1].astype(np.int64) << 8) | u[:, 0]
        else:
            v = (u[:, 0].astype(np.int64) << 16) | \
                (u[:, 1].astype(np.int64) << 8) | u[:, 2]
        return np.where(v >= 1 << 23, v - (1 << 24), v).tolist()
    raise NotImplementedError(f"AIFF sample size {bits} unsupported")


def _pack_pcm(samples, bits: int, little: bool) -> bytes:
    if bits not in (8, 16, 24, 32):
        raise NotImplementedError(
            f"AIFF sample size {bits} unsupported")
    a = np.asarray(samples, dtype=np.int64)
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if a.size and (a.min() < lo or a.max() > hi):
        raise ValueError(f"sample out of {bits}-bit range")
    if bits == 8:
        return a.astype(np.int8).tobytes()
    if bits == 16:
        return a.astype("<i2" if little else ">i2").tobytes()
    if bits == 32:
        return a.astype("<i4" if little else ">i4").tobytes()
    if bits == 24:
        u = (a & 0xFFFFFF).astype(np.uint32)
        out = np.empty((a.size, 3), dtype=np.uint8)
        b0, b1, b2 = (u >> 16) & 0xFF, (u >> 8) & 0xFF, u & 0xFF
        if little:
            out[:, 0], out[:, 1], out[:, 2] = b2, b1, b0
        else:
            out[:, 0], out[:, 1], out[:, 2] = b0, b1, b2
        return out.tobytes()
    raise NotImplementedError(f"AIFF sample size {bits} unsupported")


def decode_aiff(content: bytes) -> dict:
    """Decode AIFF / AIFF-C PCM.  Returns ``{"channels",
    "sample_rate", "sample_size", "n_frames", "samples"}`` with
    samples as interleaved signed ints at the file's native width."""
    if content[:4] != b"FORM" or len(content) < 12:
        raise ValueError("not an AIFF: missing FORM header")
    form_size = struct.unpack(">I", content[4:8])[0]
    kind = content[8:12]
    if kind not in (b"AIFF", b"AIFC"):
        raise ValueError(f"not an AIFF form: {kind!r}")
    end = min(len(content), 8 + form_size)
    pos, comm, ssnd = 12, None, None
    while pos + 8 <= end:
        cid = content[pos:pos + 4]
        sz = struct.unpack(">I", content[pos + 4:pos + 8])[0]
        data = content[pos + 8:pos + 8 + sz]
        if len(data) < sz:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"COMM":
            comm = data
        elif cid == b"SSND":
            ssnd = data
        pos += 8 + sz + (sz & 1)
    if comm is None or ssnd is None:
        raise ValueError("missing COMM or SSND chunk")
    if len(comm) < 18:
        raise ValueError("short COMM chunk")
    channels, n_frames, bits = struct.unpack(">HIH", comm[:8])
    rate = _read_ext80(comm[8:18])
    comp = b"NONE"
    if kind == b"AIFC":
        if len(comm) < 22:
            raise ValueError("AIFC COMM missing compression type")
        comp = comm[18:22]
        if comp not in (b"NONE", b"sowt"):
            raise NotImplementedError(
                f"AIFC compression {comp!r} unsupported")
    if channels < 1:
        raise ValueError("bad channel count")
    if bits not in (8, 16, 24, 32):
        raise NotImplementedError(
            f"AIFF sample size {bits} unsupported")
    if comp == b"sowt" and bits != 16:
        raise NotImplementedError("sowt is 16-bit only")
    offset = struct.unpack(">I", ssnd[:4])[0]
    raw = ssnd[8 + offset:]
    need = n_frames * channels * (bits // 8)
    if len(raw) < need:
        raise ValueError("SSND shorter than COMM frame count")
    samples = _unpack_pcm(raw[:need], bits, comp == b"sowt")
    return {"channels": channels, "sample_rate": rate,
            "sample_size": bits, "n_frames": n_frames,
            "samples": samples}


def encode_aiff(sample_rate: int, channels: int, bits: int, samples,
                compression: str | None = None) -> bytes:
    """Deterministic writer twin of :func:`decode_aiff`.  ``samples``
    is the interleaved signed-int list; ``compression`` is ``None``
    (plain AIFF), ``"NONE"`` (AIFC big-endian) or ``"sowt"`` (AIFC
    16-bit little-endian)."""
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channels")
    if compression not in (None, "NONE", "sowt"):
        raise NotImplementedError(
            f"AIFC compression {compression!r} unsupported")
    if compression == "sowt" and bits != 16:
        raise NotImplementedError("sowt is 16-bit only")
    n_frames = len(samples) // channels
    body = _pack_pcm(samples, bits, compression == "sowt")
    comm = struct.pack(">HIH", channels, n_frames, bits) \
        + _write_ext80(sample_rate)
    if compression is not None:
        # pstring: count byte + text, padded so the TOTAL is even
        name = b"not compressed" if compression == "NONE" \
            else b"SOWT little-endian"
        ps = bytes([len(name)]) + name
        if len(ps) & 1:
            ps += b"\x00"
        comm += compression.encode("ascii") + ps
    chunks = b""
    for cid, data in ((b"COMM", comm),
                      (b"SSND", struct.pack(">II", 0, 0) + body)):
        chunks += cid + struct.pack(">I", len(data)) + data
        if len(data) & 1:
            chunks += b"\x00"
    kind = b"AIFF" if compression is None else b"AIFC"
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + kind \
        + chunks
