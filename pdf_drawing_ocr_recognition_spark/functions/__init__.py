"""Column-expression builders — JVM-side, codegen-friendly, UDF-free.

Everything here compiles to built-in Catalyst expressions (SURVEY.md D3: no
per-row Python).  Each builder has a DuckDB-SQL twin in ``__spark_entry__.py``
oracles; semantics are deliberately restricted to the portable intersection
(md5 for hashing, strpos/substr bit tricks, exact integer "cents" sums).
"""

from .strings import (
    count_char,
    brace_balanced,
    brace_span,
    is_error_prefixed,
    sub_key,
)
from .croppct import crop_bounds
from .text import (
    word_count,
    token_count_bpe,
    punct_ratio,
    stopword_ratio,
    quality_score,
    lang_guess,
    fingerprint,
)
from .dedup import shingles, minhash_signature, lsh_band_keys, simhash16
from .vectors import dot, l2_norm, cosine

__all__ = [
    "count_char",
    "brace_balanced",
    "brace_span",
    "is_error_prefixed",
    "sub_key",
    "crop_bounds",
    "word_count",
    "token_count_bpe",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_guess",
    "fingerprint",
    "shingles",
    "minhash_signature",
    "lsh_band_keys",
    "simhash16",
    "dot",
    "l2_norm",
    "cosine",
]
