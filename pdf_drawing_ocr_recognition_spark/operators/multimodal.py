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


RESIZE_SCHEMA = (
    "doc_id LONG, orig_w INT, orig_h INT, new_w INT, new_h INT, payload BINARY"
)


def resize_images(blobs: DataFrame, max_side: int = 64) -> DataFrame:
    """(doc_id, payload) → nearest-neighbor-downsampled PNG payloads.

    REAL image processing (no stub): payloads from our PNG codec are decoded,
    NN-resampled so the longer side is ≤ *max_side* (aspect preserved,
    deterministic integer grid), and re-encoded.  Non-PNG payloads pass
    through unchanged with zero new dims — the caller filters on them.
    Arrow-batched mapInPandas; at scale this is the classic narrow
    media-preprocessing stage (no shuffle, output smaller than input).
    """
    if max_side < 1:
        raise ValueError(f"max_side must be >= 1, got {max_side}")
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.png import decode_png, encode_png

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or bytes(payload[:8]) != b"\x89PNG\r\n\x1a\n":
                    rows.append({"doc_id": doc_id, "orig_w": 0, "orig_h": 0,
                                 "new_w": 0, "new_h": 0, "payload": payload})
                    continue
                img = decode_png(bytes(payload))
                h, w = img.shape
                scale = max(h, w) / max_side
                if scale <= 1:
                    nh, nw = h, w
                    small = img
                else:
                    nh = max(1, int(h / scale))
                    nw = max(1, int(w / scale))
                    ys = (np.arange(nh) * (h / nh)).astype(int)
                    xs = (np.arange(nw) * (w / nw)).astype(int)
                    small = img[np.ix_(ys, xs)]
                rows.append({"doc_id": doc_id, "orig_w": w, "orig_h": h,
                             "new_w": nw, "new_h": nh,
                             "payload": encode_png(small)})
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id LONG, frame_idx INT, width INT, height INT, frame BINARY"


def sample_frames(containers: DataFrame, every_n: int = 2) -> DataFrame:
    """(doc_id, payload GRIDDOC) → every n-th page/frame as its own row.

    Frame sampling over our multi-page container format (the video-keyframe
    analogue): parse the container, keep frames 0, n, 2n, ..., emit one row
    per kept frame with true dimensions.  Non-container payloads yield no
    rows.  This is the explode-shaped multimodal stage — row counts grow, so
    it runs before any keyed shuffle.
    """
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.page import is_grid_payload, parse_grid_container
        from ..kernel.png import decode_png

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or not is_grid_payload(bytes(payload)):
                    continue
                try:
                    _, frames = parse_grid_container(bytes(payload))
                except Exception:
                    continue
                for idx in range(0, len(frames), every_n):
                    img = decode_png(frames[idx])
                    h, w = img.shape
                    rows.append({"doc_id": doc_id, "frame_idx": idx,
                                 "width": w, "height": h, "frame": frames[idx]})
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "width", "height", "frame"],
            )

    return containers.mapInPandas(run, FRAME_SCHEMA)


FEATURE_SCHEMA = "doc_id LONG, media_kind STRING, embedding ARRAY<DOUBLE>"


def image_feature_vectors(blobs: DataFrame, bins: int = 16) -> DataFrame:
    """(doc_id, payload) → an 18-dim feature embedding per image: [mean/255,
    std/255, normalized *bins*-bin intensity histogram].

    REAL feature extraction for our PNG codec's payloads (decode → NumPy
    stats); opaque payloads get a deterministic digest-derived vector (the
    stub contract of this module).  The output column plugs straight into the
    similarity stack — ``embedding_near_dupe_pairs`` / ``ann_topk`` /
    ``brute_force_topk_arrow`` — giving image near-dup detection over the
    same bucketed-join machinery as text embeddings.  Narrow Arrow stage,
    no shuffle.
    """
    import hashlib

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.png import decode_png

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    rows.append({"doc_id": doc_id, "media_kind": "empty",
                                 "embedding": [0.0] * (2 + bins)})
                    continue
                payload = bytes(payload)
                if payload[:8] == b"\x89PNG\r\n\x1a\n":
                    img = decode_png(payload).astype(np.float64)
                    hist, _ = np.histogram(img, bins=bins, range=(0, 256))
                    hist = hist / img.size
                    vec = [float(img.mean() / 255.0), float(img.std() / 255.0)]
                    vec += [float(round(x, 8)) for x in hist]
                    rows.append({"doc_id": doc_id, "media_kind": "png",
                                 "embedding": vec})
                else:
                    d = hashlib.sha1(payload).digest()
                    vec = [round(b / 255.0, 6) for b in d[: 2 + bins]]
                    rows.append({"doc_id": doc_id, "media_kind": "opaque",
                                 "embedding": vec})
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(run, FEATURE_SCHEMA)


DHASH_SCHEMA = "doc_id LONG, media_kind STRING, dhash LONG, n_bits INT"


def image_dhash(blobs: DataFrame) -> DataFrame:
    """(doc_id, payload) → 56-bit difference hash (dHash) per image — the
    standard perceptual fingerprint for image near-dup detection (gradient
    sign between horizontally adjacent pixels, Krawetz's dHash): bit
    b = r·(W−1)+c is 1 iff px[r,c] > px[r,c+1], packed MSB-first into a
    BIGINT.  Identical images hash equal; small brightness/compression
    perturbations flip only the few bits whose local gradient they cross —
    which is what makes Hamming-ball search (``hamming_near_dupe_pairs``)
    the right join key, where exact digests (T1) see unrelated bytes.

    Real decode for our PNG codec's payloads; opaque payloads get the first
    7 digest bytes (deterministic stub contract of this module); empty → 0.
    Requires H·(W−1) ≤ 62 (BIGINT packing) — 8×8 pages give 56 bits.
    Narrow Arrow stage, no shuffle.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.png import decode_png

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    rows.append({"doc_id": doc_id, "media_kind": "empty",
                                 "dhash": 0, "n_bits": 0})
                    continue
                payload = bytes(payload)
                if payload[:8] == b"\x89PNG\r\n\x1a\n":
                    img = decode_png(payload).astype(np.int32)
                    h, w = img.shape
                    n_bits = h * (w - 1)
                    if n_bits > 62:
                        raise ValueError(
                            f"dhash needs H*(W-1) <= 62 bits, got {n_bits} "
                            f"for {h}x{w} — downsample first"
                        )
                    bits = (img[:, :-1] > img[:, 1:]).ravel()
                    val = 0
                    for bit in bits:
                        val = (val << 1) | int(bit)
                    rows.append({"doc_id": doc_id, "media_kind": "png",
                                 "dhash": val, "n_bits": n_bits})
                else:
                    d = hashlib.sha1(payload).digest()
                    val = int.from_bytes(d[:7], "big")
                    rows.append({"doc_id": doc_id, "media_kind": "opaque",
                                 "dhash": val, "n_bits": 56})
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(run, DHASH_SCHEMA)


def _hamming_banded(
    hashes: DataFrame,
    n_bits: int,
    max_distance: int,
    id_col: str,
    hash_col: str,
) -> DataFrame:
    """(_id, _h, b) rows — one per (hash, pigeonhole band), shared by the
    pair join and the hot-band report so both see identical banding."""
    from pyspark.sql import functions as F

    n_bands = max_distance + 1
    widths = [
        n_bits // n_bands + (1 if i < n_bits % n_bands else 0)
        for i in range(n_bands)
    ]
    src = hashes.select(F.col(id_col).alias("_id"), F.col(hash_col).alias("_h"))
    band_cols = []
    shift = n_bits
    for i, w in enumerate(widths):
        shift -= w
        band_cols.append(
            F.struct(
                F.lit(i).alias("bi"),
                F.shiftright("_h", shift).bitwiseAND(F.lit((1 << w) - 1)).alias("bv"),
            )
        )
    return src.select("_id", "_h", F.explode(F.array(*band_cols)).alias("b"))


def hamming_hot_bands(
    hashes: DataFrame,
    n_bits: int = 56,
    max_distance: int = 2,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    max_band: int = 1000,
) -> DataFrame:
    """The band values :func:`hamming_near_dupe_pairs` SUPPRESSES at the
    same *max_band* — (band_index, band_value, n_members), the capped-
    bucket report of the T3 MinHash path (dedup.py near-dupe family).
    Run it alongside the pair join: a hot value here means a degenerate
    hash mass (uniform thumbnails, empty pages) whose members should be
    deduped by EXACT hash equality instead of pairwise expansion."""
    from pyspark.sql import functions as F

    banded = _hamming_banded(hashes, n_bits, max_distance, id_col, hash_col)
    return (
        banded.groupBy(
            F.col("b.bi").alias("band_index"), F.col("b.bv").alias("band_value")
        )
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > max_band)
    )


def hamming_near_dupe_pairs(
    hashes: DataFrame,
    n_bits: int = 56,
    max_distance: int = 2,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    max_band: int = 1000,
) -> DataFrame:
    """All pairs within Hamming distance *max_distance* — EXACTLY, without
    an all-pairs join: pigeonhole multi-index (the mod-p banding of
    Manku/Jain/Sarma's SimHash dedup, WWW 2007).  The hash is split into
    ``max_distance+1`` disjoint bit bands; two hashes within distance d
    differ in at most d bands, so at least one band matches exactly —
    band-equality join gives a candidate superset (same shape/cost as the
    T3 MinHash band join: one shuffle keyed by (band, value)), then ONE
    codegen ``bit_count(xor)`` filter confirms.  Recall is structural
    (pigeonhole), not probabilistic.  Returns (key_a, key_b, hamming),
    key_a < key_b.

    Hot-band cap: a band VALUE shared by more than *max_band* hashes is
    suppressed from the join (the same discipline as the T3 MinHash
    ``max_bucket`` — real image corpora put millions of uniform
    thumbnails on one dhash band value, and an uncapped equi-self-join
    would emit ~n²/2 rows from that single value).  Suppression costs
    recall only for pairs whose EVERY matching band is hot — report and
    handle those masses with :func:`hamming_hot_bands` (exact-equality
    dedup, not pairwise).  The frequency count is one map-side-combinable
    hash agg on the same (band, value) key the join shuffles on.
    """
    from pyspark.sql import functions as F

    banded = _hamming_banded(hashes, n_bits, max_distance, id_col, hash_col)
    hot = (
        banded.groupBy("b")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_band)
        .select("b")
    )
    cold = banded.join(hot, "b", "left_anti")
    a = cold.select(
        F.col("b").alias("ba"), F.col("_id").alias("key_a"), F.col("_h").alias("ha")
    )
    b = cold.select(
        F.col("b").alias("bb"), F.col("_id").alias("key_b"), F.col("_h").alias("hb")
    )
    return (
        a.join(b, (a["ba"] == b["bb"]) & (a["key_a"] < b["key_b"]))
        .select(
            "key_a",
            "key_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_distance)
        .distinct()
    )


IMAGE_REF_SCHEMA = (
    "url STRING, img_idx INT, src STRING, alt STRING, "
    "title STRING, caption STRING, from_srcset INT"
)


def extract_page_images(pages: DataFrame) -> DataFrame:
    """(url, html[, …]) → one row per followable <img> with its alt/title
    and figure caption (kernel/images.py) — the image-text-pair miner
    feeding this module's fetch/decode/feature stack.  Same ONE-narrow-
    Arrow-stage contract as the other extractors."""
    import pandas as pd

    def run(batches):
        from ..kernel.images import extract_images

        cols = [
            "url", "img_idx", "src", "alt", "title", "caption", "from_srcset",
        ]
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = (
                    html.decode("utf-8", "replace")
                    if isinstance(html, (bytes, bytearray))
                    else html
                )
                for r in extract_images(text, url):
                    rows.append(
                        (
                            url, r["idx"], r["src"], r["alt"], r["title"],
                            r["caption"], r["from_srcset"],
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return pages.select("url", "html").mapInPandas(run, IMAGE_REF_SCHEMA)
