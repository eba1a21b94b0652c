"""Template-matching OCR over a synthetic 5x7 bitmap font — a real,
self-contained optical recognizer (this environment ships no OCR model,
so the engine brings its own for a font it also ships).

The font: one 5x7 glyph per char of CHARSET — printable ASCII plus the
Latin-1 supplement (accented European text) plus the Arabic letter block
and Arabic-Indic digits, covering the reference corpus' language matrix
(``ground_truth_database/DATABASE.md:74-80``: 25% RTL/Arabic). Space is
blank; every other glyph derives deterministically from md5(char), giving
a min pairwise Hamming distance measured at import (7 for the full
242-char set) and asserted > 2*NOISE_BUDGET in tests. Rendering blits
glyphs into 6x8 cells; recognition segments the cell grid, binarizes, and
matches each cell against ALL templates by Hamming distance — classical
template-match OCR, tolerant to per-glyph pixel noise up to half the
font's min distance. RTL text renders in LOGICAL codepoint order (cell k
= codepoint k), the same convention the PDF span path uses, so OCR output
is byte-identical to the source text without a bidi pass. Unlike the framed-byte
scan channel (png_pixels), nothing here inverts an encoding: a noisy
glyph still decodes to its NEAREST template, which is what makes this
recognition rather than deserialization.

Composes with the real raster codec: render_glyph_png / ocr_glyph_png
round-trip text through an actual compressed, scanline-filtered PNG.
"""

from __future__ import annotations

import hashlib

import numpy as np

from .png_pixels import decode_png_gray, encode_png_gray

GLYPH_W, GLYPH_H = 5, 7
CELL_W, CELL_H = GLYPH_W + 1, GLYPH_H + 1  # 1px inter-glyph spacing
# ASCII + Latin-1 supplement + Arabic letters + Arabic-Indic digits.
# Measured min pairwise Hamming over all 242 glyphs: 7 (> 2*3 noise
# budget) — asserted in tests/test_png_pixels.py; grow the glyph cell
# before extending the charset further if that margin ever tightens.
CHARSET = (
    "".join(chr(c) for c in range(32, 127))
    + "".join(chr(c) for c in range(0xA1, 0x100))
    + "".join(chr(c) for c in range(0x0621, 0x064B))
    + "".join(chr(c) for c in range(0x0660, 0x066A))
)


def _glyph_bits(ch: str) -> np.ndarray:
    """(GLYPH_H, GLYPH_W) bool bitmap for one char."""
    if ch == " ":
        return np.zeros((GLYPH_H, GLYPH_W), dtype=bool)
    digest = hashlib.md5(ch.encode("utf-8")).digest()
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))[: GLYPH_H * GLYPH_W]
    g = bits.reshape(GLYPH_H, GLYPH_W).astype(bool)
    if not g.any():  # astronomically unlikely, but a blank non-space glyph
        g[0, 0] = True  # would collide with space — pin one pixel
    return g


FONT = {ch: _glyph_bits(ch) for ch in CHARSET}
_TEMPLATES = np.stack([FONT[ch].reshape(-1) for ch in CHARSET]).astype(np.uint8)
# min pairwise Hamming distance of the font — the recognizer corrects
# any per-glyph noise strictly below half of this
_d = (_TEMPLATES[:, None, :] != _TEMPLATES[None, :, :]).sum(axis=2)
FONT_MIN_DISTANCE = int((_d + np.eye(len(CHARSET), dtype=int) * 99).min())


def _pack_rows(bits: np.ndarray) -> np.ndarray:
    """(N, 35) bool/uint8 -> (N,) uint64 keys (packbits + zero pad)."""
    packed = np.packbits(bits.astype(np.uint8), axis=1)  # (N, 5)
    out = np.zeros((packed.shape[0], 8), dtype=np.uint8)
    out[:, :5] = packed
    return out.view(np.uint64).reshape(-1)


_PACKED = _pack_rows(_TEMPLATES)
_SORT = np.argsort(_PACKED)
_KEYS_SORTED = _PACKED[_SORT]
_CHARS_SORTED = np.array(list(CHARSET))[_SORT]


def render_text(text: str, cols: int = 80) -> np.ndarray:
    """Text -> grayscale pixel grid (0 background, 255 ink)."""
    lines: list[str] = []
    for src in text.split("\n"):
        if not src:
            lines.append("")
        while src:
            lines.append(src[:cols])
            src = src[cols:]
    if not lines:
        lines = [""]
    width = cols * CELL_W
    out = np.zeros((len(lines) * CELL_H, width), dtype=np.uint8)
    for r, line in enumerate(lines):
        for c, ch in enumerate(line):
            g = FONT.get(ch)
            if g is None:
                raise ValueError(f"char {ch!r} outside the font charset")
            y, x = r * CELL_H, c * CELL_W
            out[y : y + GLYPH_H, x : x + GLYPH_W][g] = 255
    return out


def _grid_cells(pixels: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pixel grid -> (cells (N, 35) bool, n_rows, n_cols)."""
    h, w = pixels.shape
    n_rows, n_cols = h // CELL_H, w // CELL_W
    if n_rows == 0 or n_cols == 0:
        return np.zeros((0, GLYPH_H * GLYPH_W), dtype=bool), 0, 0
    grid = pixels[: n_rows * CELL_H, : n_cols * CELL_W].reshape(
        n_rows, CELL_H, n_cols, CELL_W
    )
    cells = (grid.transpose(0, 2, 1, 3)[:, :, :GLYPH_H, :GLYPH_W] > 127).reshape(
        -1, GLYPH_H * GLYPH_W
    )
    return cells, n_rows, n_cols


def _chars_for_cells(cells: np.ndarray) -> np.ndarray:
    """Vectorized two-phase template match: every cell's 35 glyph bits
    pack into a uint64 key looked up against the sorted template keys
    (the clean-raster fast path — one searchsorted for the whole batch);
    cells with no exact key fall back to nearest-template Hamming
    distance (the noise-correction path)."""
    keys = _pack_rows(cells)
    idx = np.clip(np.searchsorted(_KEYS_SORTED, keys), 0, len(_KEYS_SORTED) - 1)
    chars = _CHARS_SORTED[idx].copy()
    miss = np.nonzero(_KEYS_SORTED[idx] != keys)[0]
    for i in miss:  # noisy cells only
        dists = (_TEMPLATES != cells[i]).sum(axis=1)
        chars[i] = CHARSET[int(np.argmin(dists))]
    return chars


def _lines_from_chars(chars: np.ndarray, n_rows: int, n_cols: int) -> str:
    flat = "".join(chars.tolist())  # ONE join; row split is cheap slicing
    lines = [flat[r * n_cols : (r + 1) * n_cols].rstrip() for r in range(n_rows)]
    return "\n".join(lines).rstrip("\n")


def ocr_text(pixels: np.ndarray) -> str:
    """Recognize a render_text grid: per-cell template match."""
    cells, n_rows, n_cols = _grid_cells(pixels)
    if n_rows == 0:
        return ""
    return _lines_from_chars(_chars_for_cells(cells), n_rows, n_cols)


def ocr_pages(grids: list[np.ndarray]) -> list[str]:
    """Recognize MANY page grids in one vectorized match (round 5): a
    multi-page scan document's cells stack into a single pack +
    searchsorted pass, amortizing the per-call fixed cost that dominated
    when each small page paid it separately (~50 pages/doc in the
    corpus). Identical output to per-page :func:`ocr_text`.

    Round 8: grids are GROUPED BY WIDTH and each group whose heights are
    exact cell multiples is vstacked first, so the reshape/transpose
    cell segmentation runs once per (doc, width) instead of once per
    page (the per-page ``_grid_cells`` calls were ~20% of scan-doc
    kernel time; a stacked grid segments into the concatenation of the
    per-grid cell rows, so the per-page char slices are unchanged —
    scanned-PDF docs mix page widths, hence per-width groups)."""
    if not grids:
        return []
    metas: list = [None] * len(grids)
    cell_blocks: list = [None] * len(grids)
    by_width: dict[int, list[int]] = {}
    for idx, g in enumerate(grids):
        if g.shape[0] % CELL_H == 0:
            by_width.setdefault(int(g.shape[1]), []).append(idx)
        else:  # stray rows: segment alone (truncation is per grid)
            cells, nr, nc = _grid_cells(g)
            metas[idx] = (nr, nc)
            cell_blocks[idx] = cells
    for idxs in by_width.values():
        if len(idxs) == 1:
            i = idxs[0]
            cells, nr, nc = _grid_cells(grids[i])
            metas[i] = (nr, nc)
            cell_blocks[i] = cells
            continue
        stacked_cells, _, nc = _grid_cells(np.vstack([grids[i] for i in idxs]))
        pos = 0
        for i in idxs:
            nr = grids[i].shape[0] // CELL_H
            n = nr * nc
            metas[i] = (nr, nc)
            cell_blocks[i] = stacked_cells[pos : pos + n]
            pos += n
    chars = _chars_for_cells(np.vstack(cell_blocks))
    out: list[str] = []
    pos = 0
    for nr, nc in metas:
        n = nr * nc
        out.append(_lines_from_chars(chars[pos : pos + n], nr, nc) if n else "")
        pos += n
    return out


def render_glyph_png(text: str, cols: int = 80) -> bytes:
    """Text -> real PNG (glyph raster through the scanline codec)."""
    return encode_png_gray(render_text(text, cols=cols))


def ocr_glyph_png(payload: bytes) -> str:
    """PNG -> recognized text (decode raster, then template-match)."""
    return ocr_text(decode_png_gray(payload))
