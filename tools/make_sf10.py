"""Derive an sf10-scale documents table (100 shifted copies of the
driver's sf0.1 data = 500k docs) for the heavy-query scale gate — the
same derivation discipline as tools/make_sf1.py (never synthesizing new
content, only shifting doc_id so distributional properties are the
driver's own).  Other tables copy through unchanged.

    python tools/make_sf10.py [out_dir]   # default fixtures_data/sf10
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 100
STRIDE = 10_000_000
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "fixtures_data/sf10"
    os.makedirs(out, exist_ok=True)
    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    shifted = []
    for k in range(COPIES):
        t = docs.set_column(
            docs.schema.get_field_index("doc_id"),
            "doc_id",
            pa.compute.add(docs.column("doc_id"), k * STRIDE),
        )
        shifted.append(t)
    big = pa.concat_tables(shifted)
    pq.write_table(big, os.path.join(out, "documents.parquet"))
    for t in TABLES:
        if t == "documents":
            continue
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(os.path.join(SRC, f"{t}.parquet"), dst)
    print(f"sf10 derived: documents={big.num_rows} rows -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
