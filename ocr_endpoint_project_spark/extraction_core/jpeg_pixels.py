"""Baseline-sequential JPEG codec (pure stdlib + numpy): DCT, uniform
quantization, canonical Huffman entropy coding, byte stuffing, restart
markers — the real format end to end.

Reference analog: the reference accepts ``jpg``/``jpeg`` uploads
(``cv_api/main.py:38-40``) and feeds them through its image→PDF→OCR
path (``ocr_common.py:233-249``); this module brings the decoder that
path delegates to PIL for, in the same from-scratch stdlib+numpy
discipline as ``png_pixels.py``.

What is real here: SOI/APPn/DQT/SOF0/DHT/DRI/SOS/RSTn/EOI marker
parsing, canonical Huffman table construction from the (BITS, HUFFVAL)
wire form, a 16-bit-window table-driven entropy decoder, dequantization,
batched 8x8 IDCT via one einsum, DC prediction with restart resets, and
byte-destuffing — i.e. everything a baseline decoder does. Grayscale
(1-component) images decode to their raster; 3-component YCbCr images
(4:4:4 or subsampled) decode to their LUMA plane — chroma blocks are
entropy-decoded (the bitstream demands it) and dropped, since every
consumer downstream of this module is a grayscale OCR path, matching the
reference's own grayscale conversion before OCR. Progressive JPEG is
rejected with a clear error.

Lossy-but-exact contract for the scan corpus: with the uniform
quantization step ``Q_SCAN`` = 16, the worst-case reconstruction error
of ANY image is bounded by (q/2) * sum over the 64 basis functions of
their max amplitude = 8 * 12.91 ~ 103 gray levels < 128. A bilevel
(0/255) glyph raster therefore re-binarizes EXACTLY at threshold 127
after a JPEG round trip — recognition rides a genuinely lossy DCT
codec, yet the byte-identity oracle still holds. The bound is a
worst-case over all inputs, not a statistical claim; asserted in tests
over adversarial rasters.
"""

from __future__ import annotations

import struct

import numpy as np

class ProgressiveJpegError(ValueError):
    """Progressive (SOF2) stream hit the baseline-only decoder.

    Typed so the pipeline can route these to quarantine with a DISTINCT
    error code (telemetry for whether a progressive decoder is worth
    building — real crawl JPEGs are often progressive) instead of a
    generic decode failure."""


JPEG_MAGIC = b"\xff\xd8\xff"

# uniform quantization step for corpus scan pages: the largest power of
# two whose worst-case reconstruction error (q/2 * 12.91 ~ 103) stays
# strictly below the 0/255 binarization threshold distance of 128
Q_SCAN = 16

# ---------------------------------------------------------------------------
# shared constant tables
# ---------------------------------------------------------------------------


def _zigzag() -> np.ndarray:
    """Zigzag index -> raster index (row*8+col) for an 8x8 block."""
    order = []
    for s in range(15):
        diag = [(r, s - r) for r in range(8) if 0 <= s - r < 8]
        if s % 2 == 0:
            diag.reverse()  # even diagonals run bottom-left -> top-right
        order.extend(r * 8 + c for r, c in diag)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag()
_UNZIGZAG = np.argsort(ZIGZAG)  # raster index -> zigzag index


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    k = n[:, None]
    d = np.cos((2 * n[None, :] + 1) * k * np.pi / 16)
    d *= np.where(k == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))
    return d


_DCT = _dct_matrix()

# Annex-K-style example Huffman tables (the classic luminance pair).
# Correctness does NOT depend on these matching any external file: the
# decoder always rebuilds its tables from the DHT segments in the
# stream, so encoder and decoder agree by construction.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """(BITS, HUFFVAL) wire form -> {symbol: (code, length)}."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return codes


def _window_table(codes: dict[int, tuple[int, int]]) -> list[int]:
    """65536-entry table: 16-bit window -> (symbol << 5) | code_length.

    One list lookup decodes any code in one step (baseline codes are
    <= 16 bits). Entry 0 marks an invalid prefix (no code has length 0).
    """
    table = [0] * 65536
    for sym, (code, length) in codes.items():
        start = code << (16 - length)
        end = (code + 1) << (16 - length)
        table[start:end] = [(sym << 5) | length] * (end - start)
    return table


# ---------------------------------------------------------------------------
# encoder (vectorized: one numpy pass per image, no per-pixel Python)
# ---------------------------------------------------------------------------

_ENC_DC = _canonical_codes(_DC_BITS, _DC_VALS)
_ENC_AC = _canonical_codes(_AC_BITS, _AC_VALS)
# symbol-indexed code/length arrays for vectorized lookup
_DC_CODE = np.zeros(12, dtype=np.int64)
_DC_LEN = np.zeros(12, dtype=np.int64)
for _s, (_c, _l) in _ENC_DC.items():
    _DC_CODE[_s], _DC_LEN[_s] = _c, _l
_AC_CODE = np.zeros(256, dtype=np.int64)
_AC_LEN = np.zeros(256, dtype=np.int64)
for _s, (_c, _l) in _ENC_AC.items():
    _AC_CODE[_s], _AC_LEN[_s] = _c, _l


def _bit_size(v: np.ndarray) -> np.ndarray:
    """JPEG magnitude category: bit length of |v| (0 for 0). Exact for
    |v| < 2**53 via frexp (the DCT range here is +-1024)."""
    return np.where(v == 0, 0, np.frexp(np.abs(v).astype(np.float64))[1]).astype(
        np.int64
    )


def _value_bits(v: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Signed value -> its `size` magnitude bits (negative: v + 2^s - 1)."""
    return np.where(v >= 0, v, v + (np.int64(1) << size) - 1).astype(np.int64)


def _pack_bitstream(bits: np.ndarray, lens: np.ndarray) -> bytes:
    """(value, length) records -> byte-stuffed entropy bytes.

    Scatters each record's bits into one flat bit array, grouped by
    record length so no (n x maxlen) rectangle is ever materialized
    (the earlier broadcast form allocated sum(n)*maxlen int64 — hundreds
    of MB and a page-fault storm on dense rasters). Packs with
    np.packbits (1-padded tail per the spec) and stuffs 0x00 after every
    0xFF.
    """
    if not len(lens):
        return b""
    total = int(lens.sum())
    ends = np.cumsum(lens)
    offs = ends - lens
    flat = np.zeros(total, dtype=np.uint8)
    for length in np.unique(lens):
        sel = lens == length
        b = bits[sel]
        shifts = np.arange(length - 1, -1, -1)
        pos = offs[sel][:, None] + np.arange(length)[None, :]
        flat[pos.ravel()] = ((b[:, None] >> shifts[None, :]) & 1).astype(np.uint8).ravel()
    pad = (-total) % 8
    if pad:
        flat = np.concatenate([flat, np.ones(pad, dtype=np.uint8)])
    packed = np.packbits(flat)
    ff = np.nonzero(packed == 0xFF)[0]
    if len(ff):
        packed = np.insert(packed, ff + 1, 0)
    return packed.tobytes()


def encode_jpeg_gray(pixels: np.ndarray, q: int = Q_SCAN) -> bytes:
    """Grayscale uint8 raster -> baseline-sequential JFIF bytes.

    Single component, uniform quantization step ``q``, the module's
    canonical Huffman pair written as DHT segments. Fully vectorized:
    batched DCT (one einsum), vectorized run-length/magnitude symbol
    construction, one packbits for the whole entropy stream.
    """
    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim != 2:
        raise ValueError("encode_jpeg_gray expects a 2-D grayscale array")
    h, w = px.shape
    if h == 0 or w == 0:
        raise ValueError("empty raster")
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = px
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coeffs = np.einsum("ij,njk,lk->nil", _DCT, blocks - 128.0, _DCT)
    zz = np.round(coeffs / q).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]

    nblocks = zz.shape[0]
    dc_diff = np.diff(zz[:, 0], prepend=np.int64(0))
    dc_size = _bit_size(dc_diff)
    # the fixed Annex-K tables encode DC categories 0..11 and AC
    # categories 1..10 only; a small enough q can produce magnitudes
    # beyond that, and _DC_CODE/_AC_CODE would silently read a
    # zero-length code and emit a corrupt bitstream — reject instead
    if dc_size.size and int(dc_size.max()) > 11:
        raise ValueError(
            f"quantization step q={q} yields DC category {int(dc_size.max())} > 11 "
            "(not encodable with the baseline Annex-K DC table); raise q"
        )
    # record layout: sort key b*260 + pos (DC=0, ZRL/AC 4..255, EOB=259)
    dc_keys = np.arange(nblocks, dtype=np.int64) * 260
    dc_bits = (_DC_CODE[dc_size] << dc_size) | _value_bits(dc_diff, dc_size)
    dc_lens = _DC_LEN[dc_size] + dc_size

    ac = zz[:, 1:]
    rows, cols = np.nonzero(ac)
    vals = ac[rows, cols]
    first = np.ones(len(rows), dtype=bool)
    if len(rows) > 1:
        first[1:] = rows[1:] != rows[:-1]
    prev = np.where(first, np.int64(-1), np.roll(cols, 1))
    run = cols - prev - 1
    n_zrl = run >> 4
    rem = run & 15
    size = _bit_size(vals)
    if size.size and int(size.max()) > 10:
        raise ValueError(
            f"quantization step q={q} yields AC category {int(size.max())} > 10 "
            "(not encodable with the baseline Annex-K AC table); raise q"
        )
    sym = (rem << 4) | size
    ac_keys = rows * 260 + 4 * (cols + 1) + 3
    ac_bits = (_AC_CODE[sym] << size) | _value_bits(vals, size)
    ac_lens = _AC_LEN[sym] + size
    # ZRL (0xF0) records: up to 3 per coefficient, keyed just before it
    zsrc = np.repeat(np.arange(len(rows)), n_zrl)
    if len(zsrc):
        zoff = np.concatenate([np.arange(c) for c in n_zrl[n_zrl > 0]])
        zrl_keys = rows[zsrc] * 260 + 4 * (cols[zsrc] + 1) + zoff
        zrl_bits = np.full(len(zsrc), _AC_CODE[0xF0], dtype=np.int64)
        zrl_lens = np.full(len(zsrc), _AC_LEN[0xF0], dtype=np.int64)
    else:
        zrl_keys = zrl_bits = zrl_lens = np.zeros(0, dtype=np.int64)
    # EOB (0x00) for every block whose last nonzero is before position 63
    last = np.full(nblocks, -1, dtype=np.int64)
    last[rows] = cols  # rows ascending: final write per block wins
    need_eob = np.nonzero(last < 62)[0]
    eob_keys = need_eob * 260 + 259
    eob_bits = np.full(len(need_eob), _AC_CODE[0x00], dtype=np.int64)
    eob_lens = np.full(len(need_eob), _AC_LEN[0x00], dtype=np.int64)

    keys = np.concatenate([dc_keys, ac_keys, zrl_keys, eob_keys])
    bits = np.concatenate([dc_bits, ac_bits, zrl_bits, eob_bits])
    lens = np.concatenate([dc_lens, ac_lens, zrl_lens, eob_lens])
    order = np.argsort(keys, kind="stable")
    scan = _pack_bitstream(bits[order], lens[order])

    qtab = np.full(64, q, dtype=np.uint8)
    out = [
        b"\xff\xd8",  # SOI
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00",
        b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qtab.tobytes(),
        b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00",
        b"\xff\xc4"
        + struct.pack(">H", 3 + 16 + len(_DC_VALS))
        + b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS),
        b"\xff\xc4"
        + struct.pack(">H", 3 + 16 + len(_AC_VALS))
        + b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS),
        b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00",
        scan,
        b"\xff\xd9",  # EOI
    ]
    return b"".join(out)


# ---------------------------------------------------------------------------
# decoder (general baseline: tables from the stream, restart markers,
# 1-component grayscale or 3-component YCbCr -> luma)
# ---------------------------------------------------------------------------


def _decode_entropy(
    data: bytes,
    plan: list,
    boundaries: list[int],
    restart: int,
    mcus_x: int,
    mcus_y: int,
    lw: int,
    lv: int,
) -> list[int]:
    """Entropy-decode the whole scan in ONE flat loop (the hot path).

    All state lives in locals: a lazily-masked big-int bit buffer fed
    from the destuffed byte string, a 65536-entry window table per
    Huffman table, and the luma coefficient list written in place.
    ``data`` is padded with 0xFF so the refill never needs an
    end-of-stream branch (1-bits ARE the spec's padding). ~0.5 us per
    coefficient, which is what makes JPEG scan pages affordable in the
    extraction kernel.
    """
    ybw = mcus_x * lw
    ycoef = [0] * (ybw * mcus_y * lv * 64)
    real_len = len(data)
    # 1-bit padding per the spec; 16 bytes so 4-byte refills never slice
    # short on a well-formed stream (short slices would zero-fill the
    # buffer and silently decode garbage instead of erroring)
    data = data + b"\xff" * 16
    pos = 0
    buf = 0
    nb = 0
    preds = [0] * len(plan)
    nmcu = mcus_x * mcus_y
    for m in range(nmcu):
        if restart and m and m % restart == 0:
            ri = (m // restart) - 1
            if ri >= len(boundaries):
                raise ValueError("missing restart marker")
            pos = boundaries[ri]
            buf = 0
            nb = 0
            for c in range(len(preds)):
                preds[c] = 0
        my, mx = divmod(m, mcus_x)
        for idx, hi, vi, dc_tab, ac_tab in plan:
            luma = idx == 0
            for by in range(vi):
                for bx in range(hi):
                    base = ((my * lv + by) * ybw + (mx * lw + bx)) * 64 if luma else 0
                    # --- DC ---
                    if nb < 27:
                        buf = (buf << 32) | int.from_bytes(data[pos : pos + 4], 'big')
                        pos += 4
                        nb += 32
                        buf &= (1 << nb) - 1
                    e = dc_tab[(buf >> (nb - 16)) & 0xFFFF]
                    if e == 0:
                        raise ValueError("invalid Huffman prefix in scan (DC)")
                    nb -= e & 31
                    s = e >> 5
                    if s:
                        if nb < s:
                            buf = (buf << 32) | int.from_bytes(data[pos : pos + 4], 'big')
                            pos += 4
                            nb += 32
                            buf &= (1 << nb) - 1
                        v = (buf >> (nb - s)) & ((1 << s) - 1)
                        nb -= s
                        preds[idx] += v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                    if luma:
                        ycoef[base] = preds[0]
                    # --- AC ---
                    k = 0
                    while k < 63:
                        if nb < 27:
                            buf = (buf << 32) | int.from_bytes(data[pos : pos + 4], 'big')
                            pos += 4
                            nb += 32
                            buf &= (1 << nb) - 1
                        e = ac_tab[(buf >> (nb - 16)) & 0xFFFF]
                        if e == 0:
                            raise ValueError("invalid Huffman prefix in scan (AC)")
                        nb -= e & 31
                        sym = e >> 5
                        s = sym & 15
                        if s == 0:
                            if sym == 0xF0:  # ZRL: sixteen zeros
                                k += 16
                                continue
                            break  # EOB
                        k += (sym >> 4) + 1
                        if k > 63:
                            raise ValueError("AC run past end of block")
                        if nb < s:
                            buf = (buf << 32) | int.from_bytes(data[pos : pos + 4], 'big')
                            pos += 4
                            nb += 32
                            buf &= (1 << nb) - 1
                        v = (buf >> (nb - s)) & ((1 << s) - 1)
                        nb -= s
                        if luma:
                            ycoef[base + k] = (
                                v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                            )
    if pos > real_len + 16:
        raise ValueError("JPEG scan data exhausted before the last MCU")
    return ycoef


def _idct_blocks(zz: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(N, 64) zigzag coefficients -> (N, 8, 8) pixel blocks (uint8)."""
    deq = zz.astype(np.float64) * qtab[None, :]
    raster = deq[:, _UNZIGZAG].reshape(-1, 8, 8)
    px = np.einsum("ji,njk,kl->nil", _DCT, raster, _DCT) + 128.0
    return np.clip(np.round(px), 0, 255).astype(np.uint8)


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> grayscale uint8 raster (luma plane).

    General decoder: quantization and Huffman tables are read from the
    stream (never assumed), restart markers reset bit phase and DC
    prediction, 3-component scans are fully entropy-decoded with chroma
    dropped. Raises ValueError on progressive/arithmetic/hierarchical
    frames and malformed streams.
    """
    if not payload.startswith(JPEG_MAGIC):
        raise ValueError("not a JPEG payload")
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], list[int]] = {}
    frame = None  # (h, w, [(comp_id, hi, vi, tq)])
    restart = 0
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        while payload[i + 1] == 0xFF:  # optional fill bytes before a marker
            i += 1
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI before SOS
            break
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        body = payload[i + 4 : i + 2 + seglen]
        i += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                p += 1
                if pq:
                    tab = np.frombuffer(body[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    tab = np.frombuffer(body[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                qtabs[tq] = tab
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(body[p + 17 : p + 17 + nv])
                p += 17 + nv
                huff[(tc, th)] = _window_table(_canonical_codes(bits, vals))
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec, fh, fw, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + c * 3 : 9 + c * 3]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (fh, fw, comps)
        elif marker == 0xC2:
            raise ProgressiveJpegError(
                "progressive JPEG not supported (baseline only)"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported frame type 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_tabs = {}
            for c in range(ns):
                cid, tt = body[1 + c * 2 : 3 + c * 2]
                scan_tabs[cid] = (tt >> 4, tt & 15)
            return _decode_scan(
                payload, i, frame, scan_tabs, qtabs, huff, restart
            )
        # APPn / COM / others: skipped
    raise ValueError("no SOS marker found")


def _destuff(payload: bytes, start: int) -> tuple[bytes, list[int]]:
    """Strip 0xFF00 stuffing from the entropy segment starting at
    ``start``; returns (destuffed bytes, restart-boundary offsets into
    the destuffed stream). Stops at the first non-RST marker."""
    arr = np.frombuffer(payload, dtype=np.uint8)[start:]
    ff = np.nonzero(arr == 0xFF)[0]
    keep = np.ones(len(arr), dtype=bool)
    boundaries: list[int] = []
    end = len(arr)
    drop_before = np.zeros(len(ff), dtype=np.int64)
    removed = 0
    for j, f in enumerate(ff):
        if f + 1 >= len(arr):
            end = f
            break
        nxt = arr[f + 1]
        if nxt == 0x00:
            keep[f + 1] = False
            removed += 1
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: marks a restart boundary
            keep[f] = False
            keep[f + 1] = False
            boundaries.append(int(f) - removed)
            removed += 2
        else:  # real marker (EOI, next SOS, ...): scan ends here
            end = f
            break
    keep[end:] = False
    return arr[keep].tobytes(), boundaries


def _decode_scan(payload, start, frame, scan_tabs, qtabs, huff, restart):
    fh, fw, comps = frame
    if len(comps) not in (1, 3):
        raise ValueError(f"unsupported component count {len(comps)}")
    data, boundaries = _destuff(payload, start)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    # luma (first component) block grid, padded to whole MCUs
    c0 = comps[0]
    lw, lv = c0[1], c0[2]
    ybw, ybh = mcus_x * lw, mcus_y * lv
    # per-component decode order inside an MCU
    plan = []
    for idx, (cid, hi, vi, tq) in enumerate(comps):
        if cid not in scan_tabs:
            raise ValueError(f"component {cid} missing from SOS")
        td, ta = scan_tabs[cid]
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("SOS references an undefined Huffman table")
        plan.append((idx, hi, vi, huff[(0, td)], huff[(1, ta)]))
    try:
        ycoef = _decode_entropy(
            data, plan, boundaries, restart, mcus_x, mcus_y, lw, lv
        )
    except IndexError:
        raise ValueError("truncated JPEG scan") from None
    tq = c0[3]
    if tq not in qtabs:
        raise ValueError(f"quantization table {tq} undefined")
    zz = np.array(ycoef, dtype=np.int64).reshape(-1, 64)
    blocks = _idct_blocks(zz, qtabs[tq])
    grid = blocks.reshape(ybh, ybw, 8, 8).transpose(0, 2, 1, 3).reshape(ybh * 8, ybw * 8)
    # luma plane dims (for 3-component frames the luma grid may be
    # sampled at hmax/vmax; with h0==hmax, v0==vmax it is full-size)
    ph = -(-fh * lv // vmax)
    pw = -(-fw * lw // hmax)
    return grid[:ph, :pw]
