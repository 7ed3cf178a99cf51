"""Streaming FLAC codec: bit-exact round-trip, real compression, and the
frame/stream structure invariants the web UI streaming path relies on
(the reference streams compressed mp3 chunks, ``seed_vc_wrapper.py:201-286``;
FLAC is this environment's built-in compressed equivalent)."""

import numpy as np
import pytest

from seedvc_tpu.dsp.flac import (StreamingFlacEncoder, _utf8_coded_number,
                                 decode_flac)


def speechlike(n, sr=22050, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    sig = 0.3 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 2 * t))
    sig += np.convolve(rng.standard_normal(n) * 0.05, np.ones(8) / 8, "same")
    return (np.clip(sig, -1, 1) * 32767).astype(np.int16)


def test_coded_number_matches_utf8():
    # FLAC's coded numbers extend UTF-8; the <=3-byte forms ARE UTF-8
    assert _utf8_coded_number(0x41) == "A".encode()
    assert _utf8_coded_number(0xE9) == "é".encode()
    assert _utf8_coded_number(0x20AC) == "€".encode()
    # 36-bit max uses the 7-byte extended form
    assert _utf8_coded_number((1 << 36) - 1) == bytes([0xFE] + [0xBF] * 6)
    with pytest.raises(ValueError):
        _utf8_coded_number(1 << 36)


def test_round_trip_lossless_and_compressed():
    sr = 22050
    pcm = speechlike(3 * sr)
    pcm[:1000] = 0          # constant subframe path
    pcm[5000:5100] = 12345  # another constant run
    enc = StreamingFlacEncoder(sr)
    blob = enc.header() + enc.encode(pcm)
    assert blob[:4] == b"fLaC"
    assert len(blob) < len(pcm) * 2 * 0.8  # genuinely compressed
    dsr, dec = decode_flac(blob)
    assert dsr == sr
    np.testing.assert_array_equal(dec[:, 0], pcm)


def test_streaming_chunked_encode_equals_whole():
    """Arbitrary chunk boundaries (the pipeline's crossfaded pieces) decode
    to the same PCM as one-shot encoding — variable-blocksize frames carry
    their own sample positions."""
    sr = 22050
    pcm = speechlike(50000, seed=1)
    enc = StreamingFlacEncoder(sr)
    parts = [enc.header()]
    for lo, hi in ((0, 7000), (7000, 23384), (23384, 43384), (43384, 50000)):
        parts.append(enc.encode(pcm[lo:hi]))
    _, dec = decode_flac(b"".join(parts))
    np.testing.assert_array_equal(dec[:, 0], pcm)


def test_noise_falls_back_verbatim_losslessly():
    rng = np.random.default_rng(0)
    noise = (rng.standard_normal(3000) * 20000).clip(-32768, 32767).astype(np.int16)
    enc = StreamingFlacEncoder(22050)
    _, dec = decode_flac(enc.header() + enc.encode(noise))
    np.testing.assert_array_equal(dec[:, 0], noise)


def test_float_input_and_long_blocks():
    """Float [-1,1] input is accepted; blocks above MAX_BLOCK are split into
    multiple frames (FLAC's blocksize field is 16-bit)."""
    sr = 44100
    n = 3 * StreamingFlacEncoder.MAX_BLOCK + 123
    wave = 0.25 * np.sin(2 * np.pi * 440 * np.arange(n) / sr).astype(np.float32)
    enc = StreamingFlacEncoder(sr)
    blob = enc.header() + enc.encode(wave)
    dsr, dec = decode_flac(blob)
    assert dsr == sr and dec.shape[0] == n
    np.testing.assert_array_equal(
        dec[:, 0], (np.clip(wave, -1, 1) * 32767).astype(np.int16))
