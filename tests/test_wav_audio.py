"""Real WAV PCM codec + audio DSP kernel: chunk-walk decode, closed-form
square-wave features, and failure rows for malformed payloads."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ocr_endpoint_project_spark.extraction_core.wav_pcm import (
    decode_wav_pcm16,
    encode_wav_pcm16,
    square_wave,
)


def test_wav_roundtrip_canonical():
    s = square_wave(257, 900, 4)  # odd sample count -> odd data length? (2 bytes each: even)
    payload = encode_wav_pcm16(s, 16000)
    out, sr = decode_wav_pcm16(payload)
    assert sr == 16000 and (out == s).all()


def test_wav_decoder_walks_chunks_not_offsets():
    """Extra chunks (odd-length, forcing pad bytes) before data must not
    confuse the decoder — proves a real RIFF walk, not offset 44."""
    s = square_wave(64, 123, 2)
    payload = encode_wav_pcm16(
        s, 8000, extra_chunks=((b"LIST", b"INFOabc"), (b"fact", b"\x40\x00\x00\x00\x00"))
    )
    # the canonical fixed offset 44 does NOT hold for this payload
    assert payload[36:40] != b"data"
    out, sr = decode_wav_pcm16(payload)
    assert sr == 8000 and (out == s).all()


def test_wav_decoder_rejects_malformed():
    s = square_wave(16, 100, 2)
    good = encode_wav_pcm16(s, 8000)
    bad_fmt = bytearray(good)
    bad_fmt[20] = 7  # format tag != PCM
    for payload in (b"", b"RIFF\x00\x00\x00\x00WAVA", good[:25], bytes(bad_fmt)):
        with pytest.raises(ValueError):
            decode_wav_pcm16(payload)


def test_square_wave_closed_forms():
    """The three DSP features the oracle predicts have exact closed
    forms on a square wave."""
    for n, a, h in ((100, 700, 3), (9, 5, 1), (50, 1000, 7)):
        s = square_wave(n, a, h).astype(np.int64)
        assert int(np.abs(s).max()) == a
        assert int((s**2).sum() // n) == a * a
        assert int(np.count_nonzero(s[1:] * s[:-1] < 0)) == (n - 1) // h


def test_audio_dsp_query_matches_oracle_shape(spark):
    """media_audio_dsp end-to-end: encode real WAVs, chunk-walk decode,
    numpy DSP — every value matches the closed-form prediction."""
    from ocr_endpoint_project_spark.operators.multimodal import q_media_audio_dsp

    rows = q_media_audio_dsp(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    n_failed = 0
    for r in rows:
        if r["asset_id"] % 13 == 5:  # deterministically corrupted payload
            n_failed += 1
            assert r["status"] == "failed" and r["peak"] is None
            continue
        a = 500 + r["asset_id"] % 1000
        h = 2 + r["asset_id"] % 6
        n = r["n_samples"]
        assert r["status"] == "succeeded"
        assert r["peak"] == a
        assert r["mean_square"] == a * a
        assert r["n_zero_crossings"] == (n - 1) // h
    assert n_failed > 0  # the quarantine leg is exercised
