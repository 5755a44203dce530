"""Multimodal column plumbing — binary payloads → typed metadata/features.

Treats image/audio/video as opaque ``binary`` columns with typed metadata
(task brief: multimodal columns are first-class).  The Spark-side plumbing —
schema, Arrow batch shape, partitioning, UDF signatures — is real and tested;
the actual media *decode* is stubbed deterministically because no codec
libraries (PIL/cv2/ffmpeg) exist in this container.  Swapping the stub for a
real decoder changes only ``_decode_stub`` below.

PNG payloads produced by our own codec (kernel/png.py) ARE genuinely decoded —
so the grid-page rasters double as the real-image path.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

META_SCHEMA = (
    "doc_id LONG, media_kind STRING, n_bytes LONG, width INT, height INT, "
    "sha1 STRING, feature_norm DOUBLE"
)


def _decode_stub(payload: bytes) -> tuple[str, int, int, float]:
    """Deterministic stand-in for image/audio decode.

    Real PNGs (our codec) are decoded for true dimensions; other payloads get
    a deterministic fake decode keyed on content (NOT random): width/height
    derived from the digest, feature_norm from byte statistics.  A production
    build would replace this body with PIL/ffmpeg calls.
    """
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from ..kernel.png import decode_png

        img = decode_png(payload)
        h, w = img.shape
        return "png", w, h, float(img.mean())
    digest = hashlib.sha1(payload).digest()
    w = 64 + digest[0] % 192
    h = 64 + digest[1] % 192
    norm = sum(payload[:256]) / max(1, min(len(payload), 256)) / 255.0
    return "opaque", w, h, round(norm, 6)


def decode_metadata(blobs: DataFrame) -> DataFrame:
    """(doc_id, payload BINARY) → typed media metadata via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    rows.append(
                        {"doc_id": doc_id, "media_kind": "empty", "n_bytes": 0,
                         "width": 0, "height": 0, "sha1": "", "feature_norm": 0.0}
                    )
                    continue
                kind, w, h, norm = _decode_stub(bytes(payload))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media_kind": kind,
                        "n_bytes": len(payload),
                        "width": w,
                        "height": h,
                        "sha1": hashlib.sha1(bytes(payload)).hexdigest(),
                        "feature_norm": norm,
                    }
                )
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(run, META_SCHEMA)
