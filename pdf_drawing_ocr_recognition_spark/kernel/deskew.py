"""Deskew kernel (north-star stage: page render → deskew/binarize → grid).

Scanned/rendered drawings arrive slightly rotated; rule-line detection by
projection profile needs axis alignment.  This kernel:

1. ``rotate_nn``: deterministic nearest-neighbor rotation about the image
   center (inverse mapping, white background) — used both by the fixture
   generator (to skew pages) and by the decoder (to unskew);
2. ``estimate_skew``: grid search over candidate angles maximizing the
   variance of the binarized row-projection profile — the classic
   projection-profile deskew (Baird '87 family); horizontal rule lines make
   the profile maximally spiky exactly at the true deskew angle;
3. ``deskew``: estimate + rotate back.

Everything is numpy-deterministic: same bytes in → same bytes out, on the
oracle and on every executor.
"""

from __future__ import annotations

import numpy as np

# candidate angles: ±3° in 0.25° steps — generation draws from this same set,
# so the argmax recovers the exact angle (determinism by construction)
ANGLE_STEP = 0.25
MAX_ANGLE = 3.0
CANDIDATE_ANGLES = [
    round(a * ANGLE_STEP, 2) for a in range(-int(MAX_ANGLE / ANGLE_STEP), int(MAX_ANGLE / ANGLE_STEP) + 1)
]


def rotate_nn(img: np.ndarray, degrees: float, fill: int = 255) -> np.ndarray:
    """Rotate by *degrees* (CCW positive) with nearest-neighbor inverse mapping."""
    if degrees == 0.0:
        return img.copy()
    h, w = img.shape
    theta = np.deg2rad(degrees)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # inverse rotation: destination (y,x) samples source coords
    cos_t, sin_t = np.cos(theta), np.sin(theta)
    ys = cos_t * (yy - cy) + sin_t * (xx - cx) + cy
    xs = -sin_t * (yy - cy) + cos_t * (xx - cx) + cx
    ysr = np.rint(ys).astype(np.int64)
    xsr = np.rint(xs).astype(np.int64)
    ok = (ysr >= 0) & (ysr < h) & (xsr >= 0) & (xsr < w)
    out = np.full((h, w), fill, dtype=img.dtype)
    out[ok] = img[ysr[ok], xsr[ok]]
    return out


def estimate_skew(gray: np.ndarray) -> float:
    """Angle (degrees) whose correction maximizes row-profile variance.

    Sparse shear formulation: only the ink-pixel coordinates are rotated per
    candidate (no image materialization), profile via bincount.  Ties resolve
    to the smallest |angle| (then the negative one) — fully deterministic.
    """
    ink = gray < 128
    ys, xs = np.nonzero(ink)
    if len(ys) == 0:
        return 0.0
    h, w = gray.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yf = ys - cy
    xf = xs - cx
    best = (-1.0, 0.0)
    for ang in sorted(CANDIDATE_ANGLES, key=lambda a: (abs(a), a)):
        theta = np.deg2rad(-ang)
        rot_y = np.rint(np.cos(theta) * yf - np.sin(theta) * xf + cy).astype(np.int64)
        prof = np.bincount(np.clip(rot_y, 0, h - 1), minlength=h).astype(np.float64)
        var = float(prof.var())
        if var > best[0]:
            best = (var, ang)
    return best[1]


def deskew(gray: np.ndarray) -> tuple[np.ndarray, float]:
    """Return (deskewed image, detected angle in degrees)."""
    ang = estimate_skew(gray)
    if ang == 0.0:
        return gray, 0.0
    return rotate_nn(gray, -ang), ang
