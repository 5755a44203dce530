"""Compression-ratio quality signal (Gopher/FineWeb-class spam proxy).

Highly repetitive or templated text compresses far better than natural
prose, so ``deflate_bytes/raw_bytes`` is a cheap single-pass quality signal
used by public corpus pipelines alongside the relational repetition
fractions (T12, ``q_repetition_signals``).  zlib with a FIXED level and
strategy is bit-deterministic for identical input bytes (same library,
same settings), so the signal is rerun-stable.

Spark posture: zlib has no JVM Column twin, so this is an Arrow-batched
scalar ``pandas_udf`` — batch transfer, no per-row Python round trips —
and it is NOT placed in whole-stage-codegen hot paths (see
memory: HOF/JIT pollution); callers compute it once in the same narrow
stage as other kernel scoring.  No DuckDB oracle by contract (zlib is not
SQL-expressible); correctness is pinned by pure-Python twin tests.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

LEVEL = 6  # zlib default; pinned explicitly so reruns are bit-identical


def compression_ratio_py(text: str) -> float:
    """Pure-Python twin (the oracle for tests): deflate_len/raw_len over
    UTF-8 bytes, 4 decimals; empty text → 0.0."""
    raw = text.encode("utf-8")
    if not raw:
        return 0.0
    return round(len(zlib.compress(raw, LEVEL)) / len(raw), 4)


def _ratio_batch(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: compression_ratio_py(t if t is not None else ""))


def compression_ratio(col: Column | str) -> Column:
    """Column form: per-row deflate/raw byte ratio (lower = more redundant).

    The pandas_udf is built lazily (DDL return-type parsing needs an active
    session, so a module-level decorator would break import-time tooling)."""
    c = F.col(col) if isinstance(col, str) else col
    return pandas_udf(_ratio_batch, "double")(c)
