"""Crop arithmetic and grayscale kernels.

Re-expresses the reference's sub-image cropping semantics
(``pdor/pdor_unit.py:197-207`` in Water-Run/pdf-drawing-ocr-recognition):

- boxes are ``[top%, bottom%, left%, right%]`` (unpack order ref :197)
- pct→pixel uses **int truncation**, not rounding: ``int(H * (top / 100))``,
  clamped into ``[0, H]`` via ``max(0, min(H, .))``               (ref :199-202)
- the crop itself is the half-open array slice ``img[y1:y2, x1:x2]`` (ref :204)
- grayscale conversion uses cv2's RGB→GRAY, i.e. the ITU-R BT.601 weights
  0.299/0.587/0.114 with round-half-away behavior of cv2          (ref :191,:207)
"""

from __future__ import annotations

import numpy as np


def crop_box(height: int, width: int, box: tuple[float, float, float, float]) -> tuple[int, int, int, int]:
    """Return (y1, y2, x1, x2) pixel bounds for a pct box on an H×W page.

    Truncating int() conversion + clamp, exactly as ref pdor/pdor_unit.py:199-202.
    """
    top, bottom, left, right = box
    y1 = max(0, min(height, int(height * (top / 100))))
    y2 = max(0, min(height, int(height * (bottom / 100))))
    x1 = max(0, min(width, int(width * (left / 100))))
    x2 = max(0, min(width, int(width * (right / 100))))
    return y1, y2, x1, x2


def crop(img: np.ndarray, box: tuple[float, float, float, float]) -> np.ndarray:
    """Half-open numpy slice crop (ref pdor/pdor_unit.py:204)."""
    h, w = img.shape[:2]
    y1, y2, x1, x2 = crop_box(h, w, box)
    return img[y1:y2, x1:x2]


# BT.601 luma weights used by cv2.COLOR_RGB2GRAY (ref pdor/pdor_unit.py:191,207).
_BT601 = np.array([0.299, 0.587, 0.114])


def rgb_to_gray(img: np.ndarray) -> np.ndarray:
    """RGB uint8 (H,W,3) → grayscale uint8 (H,W) with BT.601 weights.

    cv2 rounds to nearest; we match with np.rint before the uint8 cast.
    """
    if img.ndim == 2:
        return img
    gray = np.rint(img[..., :3].astype(np.float64) @ _BT601)
    return np.clip(gray, 0, 255).astype(np.uint8)
