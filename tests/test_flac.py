"""FLAC codec (datapipe/flac.py) — encoder/decoder roundtrips plus
hand-built frames for the decode-only features the repo encoder never
emits (stereo decorrelation, LPC, Rice escapes, partition orders,
wasted bits, the 5-bit Rice method)."""

import struct

import numpy as np
import pytest

from pypond_spark.datapipe import flac


def _rand(n, bits, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(-(1 << (bits - 1)), 1 << (bits - 1),
                        size=n).tolist()


def test_roundtrip_all_subframes_and_widths():
    for sub in ("auto", "constant", "verbatim", "fixed0", "fixed1",
                "fixed2", "fixed3", "fixed4"):
        s = ([5] * 200 if sub == "constant"
             else _rand(200, 16, hash(sub) % 1000))
        d = flac.decode_flac(flac.encode_flac(
            44100, 1, 16, [s], blocksize=64, subframe=sub))
        assert d["samples"] == [s], sub
    for bits in (8, 16, 24):
        for nch in (1, 2, 3):
            chans = [_rand(257, bits, 10 * bits + c)
                     for c in range(nch)]
            d = flac.decode_flac(flac.encode_flac(
                48000, nch, bits, chans, blocksize=100))
            assert d["samples"] == chans, (bits, nch)
            assert d["bits_per_sample"] == bits
            assert d["sample_rate"] == 48000
            assert d["n_samples"] == 257


def test_fixed_predictors_compress_smooth_signals():
    import math
    sm = [int(10000 * math.sin(i / 30)) for i in range(4096)]
    enc = flac.encode_flac(44100, 1, 16, [sm], subframe="auto")
    assert flac.decode_flac(enc)["samples"] == [sm]
    assert len(enc) < 0.5 * 2 * len(sm)     # beats raw PCM 2x+


def _hand_stream(channels, bps, chan_code, build_subframes,
                 blocksize):
    """STREAMINFO + one hand-built frame (the decode-only paths)."""
    si = flac._BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(blocksize, 36)
    body = si.bytes() + bytes(16)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body
    w = flac._BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(7, 4)                            # 16-bit blocksize follows
    w.write(0, 4)
    w.write(chan_code, 4)
    w.write({8: 1, 16: 4, 24: 6}[bps], 3)
    w.write(0, 1)
    w.write(0, 8)                            # frame number 0
    w.write(blocksize - 1, 16)
    w.write(flac._crc8(w.bytes()), 8)
    build_subframes(w)
    w.pad_to_byte()
    frame = w.bytes()
    out += frame + struct.pack(">H", flac._crc16(frame))
    return bytes(out)


def _verbatim(w, samples, bps):
    w.write(0, 1)
    w.write(1, 6)
    w.write(0, 1)
    for s in samples:
        w.write(s, bps)


def test_stereo_decorrelation_modes():
    l = _rand(64, 12, 1)
    r = _rand(64, 12, 2)
    # left-side
    data = _hand_stream(2, 16, 8, lambda w: (
        _verbatim(w, l, 16),
        _verbatim(w, [a - b for a, b in zip(l, r)], 17)), 64)
    assert flac.decode_flac(data)["samples"] == [l, r]
    # right-side
    data = _hand_stream(2, 16, 9, lambda w: (
        _verbatim(w, [a - b for a, b in zip(l, r)], 17),
        _verbatim(w, r, 16)), 64)
    assert flac.decode_flac(data)["samples"] == [l, r]
    # mid-side
    mid = [(a + b) >> 1 for a, b in zip(l, r)]
    side = [a - b for a, b in zip(l, r)]
    data = _hand_stream(2, 16, 10, lambda w: (
        _verbatim(w, mid, 16), _verbatim(w, side, 17)), 64)
    assert flac.decode_flac(data)["samples"] == [l, r]


def test_lpc_subframe():
    # order-2 LPC, coefs [3, -1], shift 1: s[i] = e + ((3*s[i-1]
    # - s[i-2]) >> 1)
    samples = _rand(80, 12, 3)
    order, coefs, shift, prec = 2, [3, -1], 1, 4

    def build(w):
        w.write(0, 1)
        w.write(32 + order - 1, 6)
        w.write(0, 1)
        for s in samples[:order]:
            w.write(s, 16)
        w.write(prec - 1, 4)
        w.write(shift, 5)
        for c in coefs:
            w.write(c & ((1 << prec) - 1), prec)
        resid = []
        for i in range(order, len(samples)):
            pred = (coefs[0] * samples[i - 1]
                    + coefs[1] * samples[i - 2]) >> shift
            resid.append(samples[i] - pred)
        flac._write_residual(w, resid)

    data = _hand_stream(1, 16, 0, build, 80)
    assert flac.decode_flac(data)["samples"] == [samples]


def test_rice_escape_partitions_and_5bit_method():
    samples = _rand(64, 14, 4)

    def build_escape(w):
        w.write(0, 1)
        w.write(8, 6)                        # fixed order 0
        w.write(0, 1)
        w.write(0, 2)                        # 4-bit rice method
        w.write(1, 4)                        # partition order 1
        for half in (samples[:32], samples[32:]):
            w.write(15, 4)                   # escape
            w.write(15, 5)                   # raw 15-bit residuals
            for s in half:
                w.write(s & 0x7FFF, 15)

    data = _hand_stream(1, 16, 0, build_escape, 64)
    assert flac.decode_flac(data)["samples"] == [samples]

    def build_5bit(w):
        w.write(0, 1)
        w.write(8, 6)
        w.write(0, 1)
        w.write(1, 2)                        # 5-bit rice method
        w.write(0, 4)
        w.write(7, 5)                        # param 7
        for s in samples:
            z = (s << 1) if s >= 0 else ((-s) << 1) - 1
            w.write(1, (z >> 7) + 1)
            w.write(z & 127, 7)

    data = _hand_stream(1, 16, 0, build_5bit, 64)
    assert flac.decode_flac(data)["samples"] == [samples]


def test_wasted_bits():
    samples = [v * 4 for v in _rand(48, 10, 5)]   # 2 wasted bits

    def build(w):
        w.write(0, 1)
        w.write(1, 6)                        # verbatim
        w.write(1, 1)                        # wasted flag
        w.write(1, 2)                        # unary 1 -> wasted = 2
        for s in samples:
            w.write(s >> 2, 14)

    data = _hand_stream(1, 16, 0, build, 48)
    assert flac.decode_flac(data)["samples"] == [samples]


def test_errors():
    good = flac.encode_flac(8000, 1, 16, [_rand(100, 16, 6)],
                            blocksize=50)
    with pytest.raises(ValueError, match="fLaC magic"):
        flac.decode_flac(b"RIFFxxxx" + good)
    bad = bytearray(good)
    bad[-3] ^= 0xFF                          # flip a sample byte
    with pytest.raises(ValueError, match="CRC-16|truncated"):
        flac.decode_flac(bytes(bad))
    bad = bytearray(good)
    i = 4 + 4 + 34                           # first frame header byte
    bad[i + 1] ^= 0x04                       # corrupt header field
    with pytest.raises(ValueError, match="CRC-8|sync|reserved"):
        flac.decode_flac(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        flac.decode_flac(good[:len(good) - 10])
    with pytest.raises(ValueError, match="range"):
        flac.encode_flac(8000, 1, 8, [[300]])
    with pytest.raises(ValueError, match="channel"):
        flac.encode_flac(8000, 2, 16, [[1]])


def test_decode_audio_dispatch_and_sniff():
    from pypond_spark.datapipe import multimodal as mm

    l = _rand(300, 16, 7)
    r = _rand(300, 16, 8)
    data = flac.encode_flac(22050, 2, 16, [l, r], blocksize=128)
    d = mm.decode_audio(data)
    assert d["n_channels"] == 2
    assert d["sample_rate"] == 22050
    assert d["n_samples"] == 300
    assert d["samples"][0::2] == l and d["samples"][1::2] == r
    fmt, nch, rate, kbps, bits, dur = mm._sniff_audio(data)
    assert (fmt, nch, rate, bits) == ("flac", 2, 22050, 16)
    assert dur == 300 * 1000 // 22050


def test_truncated_streaminfo_is_valueerror():
    """r13 review finding: a STREAMINFO block whose claimed size
    exceeds the bytes present must raise ValueError, not IndexError
    (and never silently parse garbage rate/channel fields)."""
    data = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") \
        + bytes(12)
    with pytest.raises(ValueError, match="STREAMINFO|truncated"):
        flac.decode_flac(data)


def test_trailing_bytes_after_last_frame_tolerated():
    """r13 ADVICE: padding or an appended ID3v1 tag AFTER the frame
    carrying STREAMINFO's final sample must not raise 'bad FLAC frame
    sync'; mid-stream garbage (total not yet satisfied) stays loud."""
    samples = _rand(200, 16, 9)
    good = flac.encode_flac(8000, 1, 16, [samples], blocksize=100)
    id3v1 = b"TAG" + bytes(125)
    d = flac.decode_flac(good + id3v1)
    assert d["samples"] == [samples]
    d = flac.decode_flac(good + bytes(16))   # zero padding
    assert d["samples"] == [samples]
    # mid-stream garbage is still a loud failure: truncate the last
    # frame and append junk so total is NOT satisfied at the junk
    head = good[: 4 + 4 + 34 + 40]           # into the first frame
    with pytest.raises(ValueError):
        flac.decode_flac(head + b"\x00\x01garbage!")
