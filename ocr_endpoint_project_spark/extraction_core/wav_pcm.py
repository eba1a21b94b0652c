"""Real RIFF/WAVE PCM16 codec — pure stdlib + numpy, no audio library.

Round 5 closes the audio half of the multimodal layer's honest-stub list
the same way round 4's ``png_pixels`` closed the image half: the
environment ships no audio library, so the engine brings a from-scratch
codec for the one container format that needs none. The decoder is a
genuine CHUNK WALK (RIFF id/size framing, word-aligned pad bytes, fmt
validation), not fixed offsets — payloads carrying extra chunks (LIST,
fact, ...) in any order decode correctly, and malformed payloads raise
instead of yielding garbage samples.

Reference parity: the reference treats non-document media as typed
uploads with validated metadata (``cv_api/main.py:322-348``); here the
validation goes all the way down to samples so audio feature extraction
(``operators/multimodal.audio_dsp``) is real DSP over real bytes.

Scope (documented, validated): PCM (format tag 1), mono, 16-bit. That is
the training-pipeline normal form; anything else raises ValueError and
becomes a failed row in the kernels.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1


def encode_wav_pcm16(
    samples: np.ndarray, sample_rate: int, extra_chunks: tuple[tuple[bytes, bytes], ...] = ()
) -> bytes:
    """Mono int16 samples -> canonical RIFF/WAVE bytes.

    ``extra_chunks``: optional (chunk_id, body) pairs written between fmt
    and data — lets tests prove the decoder walks chunks instead of
    assuming the 44-byte canonical layout."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt_body = struct.pack(
        "<HHIIHH", _FMT_PCM, 1, sample_rate, sample_rate * 2, 2, 16
    )
    chunks = bytearray()
    chunks += b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    for cid, body in extra_chunks:
        if len(cid) != 4:
            raise ValueError("chunk id must be exactly 4 bytes")
        chunks += cid + struct.pack("<I", len(body)) + body
        if len(body) % 2:  # RIFF chunks are word-aligned
            chunks += b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + bytes(chunks)


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> (mono int16 sample array, sample_rate).

    Real chunk walk: unknown chunks are skipped by their declared size
    (plus the word-alignment pad byte), fmt is validated before data is
    interpreted, and truncated/malformed framing raises ValueError."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            raise ValueError(f"truncated {cid!r} chunk: {len(body)} < {ln}")
        if cid == b"fmt ":
            if ln < 16:
                raise ValueError("fmt chunk shorter than PCM minimum")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_fmt != _FMT_PCM or channels != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV shape: fmt={audio_fmt} ch={channels} bits={bits} "
            "(PCM mono 16-bit only)"
        )
    usable = len(data) - (len(data) % 2)
    return np.frombuffer(data[:usable], dtype="<i2"), int(sample_rate)


def square_wave(n_samples: int, amplitude: int, half_period: int) -> np.ndarray:
    """Deterministic test signal: +A for ``half_period`` samples, then
    -A, alternating. Every DSP feature has a closed form (peak = A,
    mean_square = A^2, zero crossings = (n-1) // half_period), so a SQL
    oracle can predict the decoded-sample math exactly."""
    if half_period < 1:
        raise ValueError("half_period must be >= 1")
    i = np.arange(n_samples, dtype=np.int64)
    return np.where((i // half_period) % 2 == 0, amplitude, -amplitude).astype(np.int16)
