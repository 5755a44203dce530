"""Line-grid detection + cell assembly kernel (SURVEY.md M2/M3).

Generalizes the reference's fixed-layout table reading (crop → OCR of grid
drawings, pdor/pdor_unit.py:187-260) into a deterministic raster-grid decoder,
per BASELINE.json:north_star: binarize → row/col projection profiles →
candidate rule lines → merge collinear/nearby segments (Hough-style buckets) →
cell bboxes → interval-sorted y-bands → per-cell bbox sort (row-major) →
tab/newline row assembly.

Payload encoding (shared with fixtures/gen_pages.py, which imports these
constants — the encoder and decoder must agree, and both are ours):

- white (255) background, black (0) rule lines of thickness LINE_PX spanning
  the full image, forming an (R+1) x (C+1) line lattice;
- inside each cell, text is drawn as one bit-glyph COLUMN per character:
  8 vertical bit blocks of BIT_PX x BIT_PX, MSB at top; block black iff bit
  set; chars are ASCII 1..126 so the MSB block is always white;
- a zero byte (all-white column) terminates the cell's text.

Decoded cell texts are assembled row-major, cells joined by TAB and rows by
NEWLINE — this raw string then flows through the retry/parse machinery
(kernel/parse.py) exactly like the reference's LLM reply would
(pdor/pdor_unit.py:226-260).
"""

from __future__ import annotations

import numpy as np

LINE_PX = 2          # rule-line thickness
BIT_PX = 3           # bit-block edge length
CHAR_BITS = 8        # bits per character glyph column
CELL_PAD = 2         # white padding inside each cell before glyphs
BIN_THRESHOLD = 128  # binarize: pixel < 128 → ink
LINE_FRACTION = 0.98 # a projection row/col is a rule line iff ≥98% ink
GLYPH_H = CHAR_BITS * BIT_PX


def binarize(gray: np.ndarray) -> np.ndarray:
    """uint8 grayscale → boolean ink mask."""
    return gray < BIN_THRESHOLD


def detect_rule_lines(ink: np.ndarray, axis: int) -> list[tuple[int, int]]:
    """Projection-profile rule-line detection along *axis*.

    axis=1 projects across columns → horizontal lines (returns (y_start, y_end)
    half-open spans); axis=0 → vertical lines.  Candidate indices are those
    whose ink fraction ≥ LINE_FRACTION; consecutive/nearby candidates (gap ≤ 1)
    are merged into one segment — the Hough-style bucket merge of the north
    star, reduced to axis-aligned form.
    """
    profile = ink.sum(axis=axis) if axis == 1 else ink.sum(axis=0)
    extent = ink.shape[1] if axis == 1 else ink.shape[0]
    candidates = np.flatnonzero(profile >= LINE_FRACTION * extent)
    segments: list[tuple[int, int]] = []
    for idx in candidates:
        if segments and idx - segments[-1][1] <= 1:
            segments[-1] = (segments[-1][0], idx + 1)
        else:
            segments.append((idx, idx + 1))
    return segments


def cell_bboxes(ink: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Detected rule lines → interior cell bounding boxes (y1, y2, x1, x2)."""
    h_lines = detect_rule_lines(ink, axis=1)
    v_lines = detect_rule_lines(ink, axis=0)
    boxes = []
    for (ys, ye), (ys2, _ye2) in zip(h_lines, h_lines[1:]):
        for (xs, xe), (xs2, _xe2) in zip(v_lines, v_lines[1:]):
            boxes.append((ye, ys2, xe, xs2))
    return boxes


def assemble_cells(boxes: list[tuple[int, int, int, int]]) -> list[list[tuple[int, int, int, int]]]:
    """Row-major assembly of UNORDERED cell bboxes.

    Interval-sorts boxes into y-bands (a box joins the current band when its
    vertical span overlaps the band's span — the interval-tree grouping of the
    north star), then sorts within each band by x.  This is the kernel twin of
    the relational variant ``Window.orderBy(cell_y, cell_x)`` + ``row_number``.
    """
    if not boxes:
        return []
    by_y = sorted(boxes, key=lambda b: (b[0], b[2]))
    bands: list[list[tuple[int, int, int, int]]] = []
    band_end = -1
    for box in by_y:
        y1, y2 = box[0], box[1]
        if not bands or y1 >= band_end:
            bands.append([box])
            band_end = y2
        else:
            bands[-1].append(box)
            band_end = max(band_end, y2)
    return [sorted(band, key=lambda b: b[2]) for band in bands]


def decode_cell_text(ink: np.ndarray, box: tuple[int, int, int, int]) -> str:
    """Decode one cell's bit-glyph columns back to its ASCII text.

    Vectorized: samples every glyph-block center at once (8 x max_chars
    matrix), packs bit columns to bytes, cuts at the first zero byte.
    """
    y1, y2, x1, x2 = box
    top = y1 + CELL_PAD
    left = x1 + CELL_PAD
    max_chars = max(0, (x2 - left - CELL_PAD) // BIT_PX)
    if max_chars == 0:
        return ""
    # glyph-block centers form a regular lattice → strided views, no copies
    sub = ink[top + BIT_PX // 2 : y2 : BIT_PX, left + BIT_PX // 2 : x2 : BIT_PX]
    bits = sub[:CHAR_BITS, :max_chars]
    if bits.shape[0] == 0 or bits.shape[1] == 0:
        return ""
    if bits.shape[0] < CHAR_BITS:  # clipped cell: pad missing bit rows
        bits = np.vstack(
            [bits, np.zeros((CHAR_BITS - bits.shape[0], bits.shape[1]), bool)]
        )
    codes = np.packbits(bits, axis=0)[0]
    end = np.flatnonzero(codes == 0)
    if end.size:
        codes = codes[: end[0]]
    return "".join(chr(c) for c in codes)


def decode_grid_image(gray: np.ndarray) -> str:
    """Full sub-image decode: binarize → lines → cells → row-major text.

    Returns the raw assembled string: cells tab-joined within a row, rows
    newline-joined (SURVEY.md M3).  The detected boxes are deliberately
    re-ordered column-major first so that ``assemble_cells`` provably performs
    the row-major restoration rather than inheriting scan order.
    """
    ink = binarize(gray)
    boxes = cell_bboxes(ink)
    shuffled = sorted(boxes, key=lambda b: (b[2], b[0]))  # column-major scramble
    rows = assemble_cells(shuffled)
    return "\n".join(
        "\t".join(decode_cell_text(ink, box) for box in band) for band in rows
    )


def decode_grid_payload(png_bytes: bytes) -> str:
    """PNG page payload → raw assembled string (decode + grid decode)."""
    from .png import decode_png

    return decode_grid_image(decode_png(png_bytes))
