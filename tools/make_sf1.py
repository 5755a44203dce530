"""Derive an sf1-scale table set from the driver's sf0.1 testdata.

The sandbox ships driver-generated parquet at sf0.001/0.01/0.1 only; the
round-3 verdict asks the 10 most shuffle-intensive oracles to be proven once
at sf1.  This tool derives sf1 *from the provided data* (never synthesizing
an unrelated distribution): ``documents`` becomes 10 deterministic shifted
copies of the sf0.1 table (copy k: doc_id += k * 10_000_000 — far above any
query's doc_id constant, so copy 0 behaves exactly like sf0.1), and every
other table is carried over unchanged (none of the 10 target queries reads
them at scale).  Identical text across copies is intentional: it makes the
dedup-family queries do 10× the matching work, which is the point of the
exercise — and the DuckDB oracle replays the same files, so the gate stays
exact.

    python tools/make_sf1.py [out_dir]     # default /root/repo/fixtures_data/sf1
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10
STRIDE = 10_000_000
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "fixtures_data/sf1"
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
    print(f"sf1 derived: documents={big.num_rows} rows -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
