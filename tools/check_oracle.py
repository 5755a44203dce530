"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, column names, and order-insensitive values.  Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df):
    """pandas frame → canonical sorted list of stringified rows."""
    df = df[sorted(df.columns)]

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 2**53:
                return str(int(v))
            return repr(v)
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if hasattr(v, "item") and not isinstance(v, str):
            return cell(v.item())
        return str(v)

    rows = ["\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from pdf_drawing_ocr_recognition_spark.plans.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # local[8] is plenty at sf0.01; the sf1/sf10 scale gates override with
    # CHECK_ORACLE_CPUS to use the idle cores (gate runs are not timed)
    cpus = int(os.environ.get("CHECK_ORACLE_CPUS", "8"))
    spark = build_session(
        app="oracle-check", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    con = duckdb.connect()
    # the sf10 twins (500k docs) exceed RAM headroom when the Spark JVM is
    # resident: an IN-MEMORY duckdb connection has no temp spill by default,
    # so big string_agg/join twins die with bad_alloc instead of spilling.
    # Give it a spill dir and a hard limit so the gate degrades to disk.
    os.makedirs("/tmp/pdor_duckdb_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/pdor_duckdb_spill'")
    con.execute(
        "SET memory_limit='"
        + os.environ.get("CHECK_ORACLE_DUCKDB_MEM", "48GB")
        + "'"
    )
    threads = os.environ.get("CHECK_ORACLE_DUCKDB_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    results: dict[str, dict] = {}

    def record(name, sdf=None, ddf=None, err=None, hash_match=False):
        results[name] = {
            "rows_match": sdf is not None and ddf is not None and len(sdf) == len(ddf),
            "schema_match": (
                sdf is not None
                and ddf is not None
                and sorted(sdf.columns) == sorted(ddf.columns)
            ),
            "hash_match": hash_match,
            "spark_rows": None if sdf is None else len(sdf),
            "oracle_rows": None if ddf is None else len(ddf),
            "err": err,
        }

    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            record(name, err=f"spark: {str(e)[:200]}")
            print(f"FAIL  {name}: spark error {str(e)[:300]}")
            continue
        if sql is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle — rows-only)")
            continue
        try:
            ddf = con.execute(sql).fetchdf()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            record(name, sdf, err=f"duckdb: {str(e)[:200]}")
            print(f"FAIL  {name}: duckdb error {str(e)[:300]}")
            continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            failures.append((name, f"schema {sorted(sdf.columns)} vs {sorted(ddf.columns)}"))
            record(name, sdf, ddf, err="schema mismatch")
            print(f"FAIL  {name}: schema mismatch {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
            continue
        if len(sdf) != len(ddf):
            failures.append((name, f"rowcount {len(sdf)} vs {len(ddf)}"))
            record(name, sdf, ddf, err="rowcount mismatch")
            print(f"FAIL  {name}: rowcount {len(sdf)} vs {len(ddf)}")
            continue
        # Driver-hash hazard: DuckDB widens integer SUMs to HUGEINT (int128),
        # which pandas fetches as float64/object while Spark gives int64 — the
        # driver's value hash (unlike normalize() below) does NOT bridge that.
        # Flag any column whose dtype *kind* differs between the two engines.
        hazards = [
            c
            for c in sdf.columns
            if sdf[c].dtype.kind in "iu" and ddf[c].dtype.kind not in "iu"
        ]
        if hazards:
            failures.append((name, f"dtype hazard {hazards}"))
            record(name, sdf, ddf, err=f"dtype hazard {hazards}")
            print(
                f"FAIL  {name}: int-vs-{[str(ddf[c].dtype) for c in hazards]} dtype "
                f"hazard on {hazards} (likely uncast DuckDB HUGEINT sum — wrap the "
                f"outer aggregate in CAST(... AS BIGINT))"
            )
            continue
        a, b = normalize(sdf), normalize(ddf)
        if a != b:
            diff = next((i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y)
            failures.append((name, f"values differ at {diff[0]}"))
            record(name, sdf, ddf, err=f"values differ at {diff[0]}")
            print(f"FAIL  {name}: first diff row {diff[0]}:\n  spark={diff[1][:250]}\n  duck ={diff[2][:250]}")
            continue
        record(name, sdf, ddf, hash_match=True)
        print(f"OK    {name}: {len(sdf)} rows match")

    missing = set(oracles) - set(queries)
    if missing:
        print(f"WARN: oracle_sql keys without queries(): {missing}")
    json_out = os.environ.get("CHECK_ORACLE_JSON")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"results JSON -> {json_out}")
    print(f"\n{len(failures)} failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
