"""The baseline-JPEG codec: gray roundtrip under the Q_SCAN error
bound, glyph-scan OCR byte-identity through the lossy path, restart
markers, 3-component YCbCr luma decode, subsampling, byte stuffing,
and malformed-stream errors (progressive, truncation, bad prefixes).

Reference analog: the reference's jpg/jpeg upload path
(``cv_api/main.py:38-40`` -> ``ocr_common.py:233-249``); here the
decoder it delegates to PIL for is implemented from scratch.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ocr_endpoint_project_spark.extraction_core.jpeg_pixels import (
    _AC_BITS,
    _AC_VALS,
    _DC_BITS,
    _DC_VALS,
    JPEG_MAGIC,
    Q_SCAN,
    decode_jpeg_gray,
    encode_jpeg_gray,
)
from ocr_endpoint_project_spark.extraction_core.png_stub import (
    extract_jpeg_text,
    make_jpeg_glyph_scan,
)
from ocr_endpoint_project_spark.extraction_core.sniff import (
    KIND_JPEG,
    sniff_doc_kind,
)


def test_error_bound_on_adversarial_bilevel_noise():
    """Worst-case-ish input for the DCT (uncorrelated 0/255 noise):
    every pixel must still re-binarize exactly at threshold 127."""
    rng = np.random.RandomState(0)
    px = (rng.rand(96, 168) > 0.5).astype(np.uint8) * 255
    dec = decode_jpeg_gray(encode_jpeg_gray(px))
    assert dec.shape == px.shape
    err = np.abs(dec.astype(int) - px.astype(int)).max()
    assert err < 128, f"reconstruction error {err} crosses the threshold"
    assert np.array_equal(np.where(dec > 127, 255, 0), px)


def test_checkerboard_and_flat_extremes():
    cb = np.indices((40, 56)).sum(axis=0) % 2 * 255
    dec = decode_jpeg_gray(encode_jpeg_gray(cb.astype(np.uint8)))
    assert np.array_equal(np.where(dec > 127, 255, 0), cb)
    for v in (0, 255):
        flat = np.full((17, 23), v, dtype=np.uint8)  # non-multiple-of-8 dims
        dec = decode_jpeg_gray(encode_jpeg_gray(flat))
        assert dec.shape == flat.shape
        assert np.abs(dec.astype(int) - v).max() <= Q_SCAN // 2


def test_smooth_gradient_near_lossless():
    """A smooth ramp concentrates energy in low frequencies: error must
    stay within a few quantization steps (sanity on dequant + IDCT)."""
    x = np.linspace(0, 255, 128)
    px = np.round(np.add.outer(x, x) / 2).astype(np.uint8)
    dec = decode_jpeg_gray(encode_jpeg_gray(px))
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 3 * Q_SCAN


def test_glyph_scan_roundtrip_byte_identical():
    pages = [
        "The quick brown fox jumps over the lazy dog 0123456789",
        "Deuxième page: café, naïve, über!\nLigne deux.",
        "مرحبا بالعالم ٠١٢٣",
    ]
    blob = make_jpeg_glyph_scan(pages)
    assert sniff_doc_kind(blob) == KIND_JPEG
    text, spans, n_pages = extract_jpeg_text(blob)
    assert n_pages == 3
    assert text == "\n\n".join(pages)
    assert spans[0][2] == "page_1" and len(spans) == 3


def test_byte_stuffing_roundtrip():
    """Force 0xFF bytes into the entropy stream (dense random content
    reliably produces them) and check the destuffer inverts exactly."""
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (64, 64)).astype(np.uint8)
    enc = encode_jpeg_gray(px)
    # the scan section must contain at least one stuffed 0xFF00
    sos = enc.index(b"\xff\xda")
    assert b"\xff\x00" in enc[sos:], "test vector produced no stuffing"
    dec = decode_jpeg_gray(enc)
    assert np.abs(dec.astype(int) - px.astype(int)).max() < 128


def _encode_with_restarts(px: np.ndarray, restart: int) -> bytes:
    """Re-frame the module encoder's output with DRI + RSTn markers by
    re-encoding each restart interval independently (DC prediction and
    bit phase legally reset at each marker)."""
    h, w = px.shape
    assert h == 8, "helper keeps MCU rows trivial: one block row"
    n_mcus = w // 8
    segments = []
    for s in range(0, n_mcus, restart):
        chunk = px[:, s * 8 : (s + restart) * 8]
        enc = encode_jpeg_gray(chunk)
        sos = enc.index(b"\xff\xda") + 2 + 8  # marker + seglen(=8) header
        segments.append(enc[sos : enc.index(b"\xff\xd9")])
    head = encode_jpeg_gray(px)
    sos_at = head.index(b"\xff\xda")
    out = [head[:sos_at]]
    out.append(b"\xff\xdd" + struct.pack(">HH", 4, restart))  # DRI
    out.append(head[sos_at : sos_at + 2 + 8])
    for i, seg in enumerate(segments):
        if i:
            out.append(bytes([0xFF, 0xD0 + ((i - 1) % 8)]))
        out.append(seg)
    out.append(b"\xff\xd9")
    return b"".join(out)


def test_restart_markers_reset_dc_and_bit_phase():
    rng = np.random.RandomState(11)
    px = (rng.rand(8, 64) > 0.5).astype(np.uint8) * 255
    enc = _encode_with_restarts(px, restart=2)
    assert b"\xff\xdd" in enc and b"\xff\xd0" in enc
    dec = decode_jpeg_gray(enc)
    assert np.array_equal(np.where(dec > 127, 255, 0), px)


def _encode_ycbcr(px: np.ndarray, sub: int = 1) -> bytes:
    """Hand-build a 3-component YCbCr stream: luma = the gray encoder's
    entropy data re-planned per MCU, chroma = all-EOB blocks. ``sub``=2
    emits 4:2:0 (luma 2x2 per MCU). Exercises the decoder's multi
    -component plan, interleaving, and chroma-drop."""
    from ocr_endpoint_project_spark.extraction_core.jpeg_pixels import (
        _DCT,
        _ENC_AC,
        _ENC_DC,
        _pack_bitstream,
        _value_bits,
        ZIGZAG,
    )

    h, w = px.shape
    bh, bw = h // 8, w // 8
    blocks = px.astype(np.float64).reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    coeffs = np.einsum("ij,rcjk,lk->rcil", _DCT, blocks - 128.0, _DCT)
    zz = np.round(coeffs / Q_SCAN).astype(np.int64).reshape(bh, bw, 64)[..., ZIGZAG]

    bits, lens = [], []

    def put(code, length):
        bits.append(code)
        lens.append(length)

    def put_block(vec, pred):
        diff = int(vec[0]) - pred
        s = int(abs(diff)).bit_length()
        c, l = _ENC_DC[s]
        put((c << s) | int(_value_bits(np.array([diff]), np.array([s]))[0]), l + s)
        run = 0
        for k in range(1, 64):
            v = int(vec[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, l = _ENC_AC[0xF0]
                put(c, l)
                run -= 16
            s = int(abs(v)).bit_length()
            c, l = _ENC_AC[(run << 4) | s]
            put((c << s) | int(_value_bits(np.array([v]), np.array([s]))[0]), l + s)
            run = 0
        if run:
            c, l = _ENC_AC[0x00]
            put(c, l)
        return int(vec[0])

    eob_c, eob_l = _ENC_AC[0x00]
    zero_dc_c, zero_dc_l = _ENC_DC[0]
    preds = [0, 0, 0]
    mcus_y, mcus_x = bh // sub, bw // sub
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(sub):
                for bx in range(sub):
                    preds[0] = put_block(zz[my * sub + by, mx * sub + bx], preds[0])
            for _c in (1, 2):  # Cb, Cr: zero DC + EOB
                put(zero_dc_c, zero_dc_l)
                put(eob_c, eob_l)
    scan = _pack_bitstream(np.array(bits, dtype=np.int64), np.array(lens, dtype=np.int64))

    qtab = np.full(64, Q_SCAN, dtype=np.uint8)
    hv_luma = (sub << 4) | sub
    return b"".join([
        b"\xff\xd8",
        b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qtab.tobytes(),
        b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
        + bytes([1, hv_luma, 0, 2, 0x11, 0, 3, 0x11, 0]),
        b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(_DC_VALS))
        + b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS),
        b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(_AC_VALS))
        + b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS),
        b"\xff\xda" + struct.pack(">H", 12) + bytes([3, 1, 0, 2, 0, 3, 0, 0, 0x3F, 0]),
        scan,
        b"\xff\xd9",
    ])


def test_ycbcr_444_decodes_luma_plane():
    rng = np.random.RandomState(5)
    px = (rng.rand(16, 24) > 0.5).astype(np.uint8) * 255
    dec = decode_jpeg_gray(_encode_ycbcr(px, sub=1))
    assert dec.shape == px.shape
    assert np.array_equal(np.where(dec > 127, 255, 0), px)


def test_ycbcr_420_subsampled_luma():
    rng = np.random.RandomState(6)
    px = (rng.rand(16, 32) > 0.5).astype(np.uint8) * 255
    dec = decode_jpeg_gray(_encode_ycbcr(px, sub=2))
    assert dec.shape == px.shape
    assert np.array_equal(np.where(dec > 127, 255, 0), px)


def test_progressive_rejected():
    px = np.zeros((8, 8), dtype=np.uint8)
    enc = bytearray(encode_jpeg_gray(px))
    enc[enc.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg_gray(bytes(enc))


def test_truncated_scan_errors():
    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    enc = encode_jpeg_gray(px)
    sos_end = enc.index(b"\xff\xda") + 10
    with pytest.raises(ValueError):
        decode_jpeg_gray(enc[: sos_end + 4])  # scan cut after a few bytes


def test_not_jpeg_and_missing_tables_error():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg_gray(b"\x89PNG\r\n\x1a\nnope")
    px = np.zeros((8, 8), dtype=np.uint8)
    enc = encode_jpeg_gray(px)
    # strip both DHT segments: SOS must then fail loudly
    out = bytearray()
    i = 0
    while i < len(enc):
        if enc[i] == 0xFF and enc[i + 1] == 0xC4:
            (seglen,) = struct.unpack(">H", enc[i + 2 : i + 4])
            i += 2 + seglen
            continue
        out.append(enc[i])
        i += 1
    with pytest.raises(ValueError, match="Huffman"):
        decode_jpeg_gray(bytes(out))


def test_sniff_and_ingest_accept_jpeg():
    assert sniff_doc_kind(JPEG_MAGIC + b"\xe0rest") == KIND_JPEG
    from ocr_endpoint_project_spark.extraction_core.document import extract_document

    pages = ["One page only, sniffed end to end."]
    res = extract_document(make_jpeg_glyph_scan(pages))
    assert res.error is None
    assert res.extracted_text == pages[0]
    assert res.n_pages == 1


def test_encoder_rejects_unencodable_categories():
    """Regression (r6 ADVICE): magnitude categories beyond the fixed
    Annex-K tables (AC > 10, DC > 11) used to read a zero-length code
    and emit a corrupt bitstream; they must raise instead.  Reachable
    only with out-of-range input or a tiny q — normal uint8 rasters at
    Q_SCAN are unaffected."""
    # zero-mean checkerboard with huge amplitude: DC stays small, the
    # high-frequency AC coefficient blows past category 10
    ac_bomb = np.zeros((8, 8))
    ac_bomb[::2, ::2] = 128 + 3000.0
    ac_bomb[1::2, 1::2] = 128 + 3000.0
    ac_bomb[::2, 1::2] = 128 - 3000.0
    ac_bomb[1::2, ::2] = 128 - 3000.0
    with pytest.raises(ValueError, match="AC category"):
        encode_jpeg_gray(ac_bomb, q=1)
    # a flat out-of-range raster overflows the DC category instead
    with pytest.raises(ValueError, match="DC category"):
        encode_jpeg_gray(np.full((8, 8), 50000.0), q=1)
    # sane inputs still round-trip at the smallest q
    px = (np.arange(64, dtype=np.float64).reshape(8, 8) * 3) % 256
    assert decode_jpeg_gray(encode_jpeg_gray(px, q=1)).shape == (8, 8)
