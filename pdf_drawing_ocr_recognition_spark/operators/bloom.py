"""Bloom-filter prefilter for membership-style joins (T51).

The 100-TB decontamination problem: the contamination list (benchmark
shingles, blocklist digests, seen-URL sets) eventually outgrows what a raw
broadcast set can hold — 10⁸ distinct 5-gram shingles is ~8 GB of strings —
while its *Bloom filter* stays megabytes at a fixed false-positive rate.
The standard plan is therefore

    1. build a Bloom filter over the filter side (one pass, distributed),
    2. prefilter the 100-TB probe side MAP-SIDE with the broadcast bloom
       (no shuffle; drops the overwhelming majority of rows), and
    3. run the EXACT join only on the tiny surviving fraction to erase the
       bloom's false positives.

Because Bloom filters have no false negatives, step 3's output is exactly
the plain join's output — which is what makes the whole path DuckDB-
oracle-able: the oracle is the exact join, the bloom is invisible in the
result and only visible in the plan (an Arrow prefilter stage ahead of the
join, asserted in tests).

Implementation notes
--------------------
* Bit positions are computed JVM-side: ``pmod(xxhash64(value, seed_i), m)``
  for k seeds — whole-stage-codegen arithmetic, no Python in the hashing.
  The Arrow stage only does k vectorized bitmap lookups per row against the
  broadcast bitmap (``numpy`` byte indexing), the cheapest possible Python
  surface.
* ``bloom_build`` aggregates the bitmap DISTRIBUTIVELY: positions fold into
  64-bit words via a whole-stage-codegen ``bit_or`` hash aggregate (map-side
  partial combine — a position set 10⁶ times sends one partial per map
  task), words pack into fixed-size binary chunks in one small Arrow stage,
  and the driver collects only those packed chunks — exactly m/8 BYTES of
  transfer (+ ~16 bytes/chunk of row overhead at 128 KiB per chunk), never
  per-position rows.  A 10⁸-element filter at the ln2 optimum (m ≈ 10⁹)
  therefore costs the driver ~120 MB, not tens of GB.  (Spark's own
  ``BloomFilterAggregate`` is not exposed to PySpark; this keeps the same
  merge-by-OR structure with an explicit, testable bitmap.)
* Sizing: m_bits ≈ -n·ln(p)/(ln2)² and k ≈ (m/n)·ln2 for target fp-rate p;
  ``bloom_params`` computes both.  Under-sized blooms degrade to pass-
  through (fp-rate → 1) — still CORRECT (step 3 confirms exactly), just no
  longer a useful prefilter, so ``bloom_build`` warns loudly when the
  observed fill fraction exceeds ~50 %.

No reference analogue — the reference processes one document at a time and
has no joins (pdor/pdor_unit.py); this operator exists for the corpus-scale
regime the north rule targets.
"""

from __future__ import annotations

import math
import warnings

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def bloom_params(n_items: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """(m_bits, k_hashes) for an *n_items* bloom at target *fp_rate*.

    Standard optimum: m = -n·ln(p)/(ln2)², k = (m/n)·ln2, clamped to
    practical bounds (m a multiple of 8, 1 <= k <= 16).
    """
    if n_items < 1:
        raise ValueError(f"n_items must be >= 1, got {n_items}")
    if not (0.0 < fp_rate < 1.0):
        raise ValueError(f"fp_rate must be in (0, 1), got {fp_rate}")
    m = int(math.ceil(-n_items * math.log(fp_rate) / (math.log(2) ** 2)))
    m = max(64, (m + 7) // 8 * 8)
    k = max(1, min(16, int(round(m / n_items * math.log(2)))))
    return m, k


def _bit_positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """k JVM-side bit positions for *col*: pmod(xxhash64(col, seed), m)."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)).cast("long")
        for i in range(k)
    ]


# 2^14 little-endian int64 words = 2^20 bits = 128 KiB of bitmap per chunk:
# small enough that one applyInPandas group is ~8 MB of word rows worst-case,
# large enough that a 10^9-bit bloom is under 1,000 collected chunk rows.
_CHUNK_WORDS_SHIFT = 14
_CHUNK_WORDS = 1 << _CHUNK_WORDS_SHIFT
_CHUNK_BYTES = _CHUNK_WORDS * 8

_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def bloom_bitmap_chunks(df: DataFrame, col: str, m_bits: int, k: int) -> DataFrame:
    """Distributed bloom bitmap over ``df[col]`` as (chunk_id, 128 KiB binary).

    Plan shape (the part that must survive 100 TB):

    1. k JVM-side positions per value (codegen ``pmod(xxhash64)``),
    2. fold positions into 64-bit words with a ``bit_or`` HASH AGGREGATE —
       whole-stage codegen with map-side partial combine, so shuffle volume
       is bounded by min(rows·k, m/64) words per map task, and
    3. one tiny Arrow stage packs each chunk's words into little-endian
       bitmap bytes (bit i of the filter = byte i>>3, mask 1<<(i&7); an
       int64 word w covers bits [64w, 64w+64) so ``<i8`` byte order IS the
       filter's bit layout).

    Only packed binary chunks leave this frame — m/8 bytes total.
    """
    words = (
        df.select(F.explode(F.array(*_bit_positions(F.col(col), m_bits, k))).alias("p"))
        .select(
            F.shiftright(F.col("p"), 6).alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p & 63 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        .withColumn("chunk_id", F.shiftright(F.col("w"), _CHUNK_WORDS_SHIFT))
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        cid = int(pdf["chunk_id"].iloc[0])
        arr = np.zeros(_CHUNK_WORDS, dtype="<i8")
        idx = pdf["w"].to_numpy(dtype=np.int64) - cid * _CHUNK_WORDS
        arr[idx] = pdf["bits"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"chunk_id": [cid], "bitmap": [arr.tobytes()]})

    return words.groupBy("chunk_id").applyInPandas(
        _pack, "chunk_id long, bitmap binary"
    )


def bloom_build(df: DataFrame, col: str, m_bits: int, k: int) -> bytes:
    """One-pass distributed bloom build over ``df[col]`` → bitmap bytes.

    Each value contributes k bit positions (JVM-side hashing); the bitmap is
    aggregated distributively (``bloom_bitmap_chunks``) and the driver
    collects only packed binary chunks — exactly m/8 bytes regardless of
    ``df``'s row count, fixing the earlier per-position-row collect whose
    Row overhead was ~50–100 bytes per set bit.
    """
    if m_bits % 8 != 0 or m_bits < 64:
        raise ValueError(f"m_bits must be a multiple of 8 and >= 64, got {m_bits}")
    if not (1 <= k <= 16):
        raise ValueError(f"k must be in [1, 16], got {k}")
    n_bytes = m_bits // 8
    bitmap = np.zeros(n_bytes, dtype=np.uint8)
    for row in bloom_bitmap_chunks(df, col, m_bits, k).collect():
        off = row[0] * _CHUNK_BYTES
        seg = np.frombuffer(row[1], dtype=np.uint8)
        end = min(off + seg.size, n_bytes)
        bitmap[off:end] |= seg[: end - off]
    # an optimally sized bloom fills to exactly 1/2 (the ln2 optimum), so
    # 0.5 is HEALTHY; 0.75 means the input is ~2x past design capacity and
    # the fp-rate has left the design regime
    fill = int(_POPCOUNT8[bitmap].sum(dtype=np.int64)) / m_bits
    if fill > 0.75:
        warnings.warn(
            f"bloom_build: fill fraction {fill:.2f} > 0.75 — the filter is "
            f"under-sized for its input (fp-rate degrades toward 1 and the "
            f"prefilter stops pruning); resize with bloom_params(n, p)",
            stacklevel=2,
        )
    return bitmap.tobytes()


def bloom_might_contain(
    df: DataFrame,
    col: str,
    bloom: bytes,
    m_bits: int,
    k: int,
    out: str = "maybe",
) -> DataFrame:
    """Add boolean *out*: bloom membership test for ``df[col]``.

    Hashing stays JVM-side (k position columns); the Arrow stage does only
    vectorized bitmap lookups against the task-broadcast bitmap.  False
    positives possible (rate set by m/k sizing), false negatives never.
    """
    if len(bloom) * 8 != m_bits:
        raise ValueError(f"bitmap is {len(bloom)} bytes but m_bits={m_bits}")
    sc = df.sparkSession.sparkContext
    b_bloom = sc.broadcast(bloom)

    @F.pandas_udf(BooleanType())
    def _probe(*pos_cols: pd.Series) -> pd.Series:
        bitmap = np.frombuffer(b_bloom.value, dtype=np.uint8)
        ok = np.ones(len(pos_cols[0]), dtype=bool)
        for p in pos_cols:
            pos = p.to_numpy(dtype=np.int64)
            ok &= (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 == 1
        return pd.Series(ok)

    return df.withColumn(out, _probe(*_bit_positions(F.col(col), m_bits, k)))


def bloom_semi_join(
    probe: DataFrame,
    filt: DataFrame,
    on: str,
    fp_rate: float = 0.01,
    n_items: int | None = None,
) -> DataFrame:
    """Exact LEFT SEMI ``probe ⋉ filt`` on *on*, bloom-prefiltered.

    Result is row-identical to ``probe.join(filt, on, "left_semi")`` — the
    bloom only prunes rows BEFORE the exact confirm join, so at 100 TB the
    shuffle/broadcast-probe volume is the (tiny) maybe-contaminated slice,
    not the whole corpus.  ``n_items`` sizes the bloom; when omitted it is
    counted with one cheap aggregate over *filt* (distinct-ish upper bound:
    plain count — an over-sized bloom is only wasted bytes, never wrong).
    """
    if n_items is None:
        n_items = max(1, filt.count())
    m_bits, k = bloom_params(n_items, fp_rate)
    bloom = bloom_build(filt, on, m_bits, k)
    pruned = (
        bloom_might_contain(probe, on, bloom, m_bits, k, out="_maybe")
        .filter(F.col("_maybe"))
        .drop("_maybe")
    )
    # exact confirm join erases false positives; filter side reaches here
    # only for confirmation, so broadcast stays correct for small filt and
    # a shuffled semi-join of the pruned slice is the large-filt fallback.
    return pruned.join(F.broadcast(filt.select(on).distinct()), on, "left_semi")
