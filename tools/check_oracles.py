"""Local stand-in for the driver's correctness gate: run every
queries() entry at sf0.01 and diff against oracle_sql() via DuckDB
(row count + column names + order-insensitive values).

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from geococo_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, int):
        return int(v)
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = sorted(
                tuple(norm(r[c]) for c in scols) for r in sdf.collect()
            )
        except Exception as exc:
            failures.append((name, f"SPARK ERROR: {exc}"))
            print(f"[FAIL] {name}: spark error {str(exc)[:200]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            odf = con.sql(oracles[name]).fetchdf()
        except Exception as exc:
            failures.append((name, f"DUCKDB ERROR: {exc}"))
            print(f"[FAIL] {name}: duckdb error {str(exc)[:200]}")
            continue
        ocols = sorted(odf.columns.tolist())
        orows = sorted(
            tuple(norm(v) for v in row)
            for row in odf[ocols].itertuples(index=False, name=None)
        )
        if scols != ocols:
            failures.append((name, f"SCHEMA: spark={scols} duck={ocols}"))
            print(f"[FAIL] {name}: schema spark={scols} duck={ocols}")
            continue
        if len(srows) != len(orows):
            failures.append((name, f"COUNT: spark={len(srows)} duck={len(orows)}"))
            print(f"[FAIL] {name}: count spark={len(srows)} duck={len(orows)}")
            continue
        bad = None
        for a, b in zip(srows, orows):
            if a != b:
                bad = (a, b)
                break
        if bad:
            failures.append((name, f"VALUES: {bad[0]} != {bad[1]}"))
            print(f"[FAIL] {name}: first diff\n  spark: {bad[0]}\n  duck : {bad[1]}")
        else:
            print(f"[ OK ] {name}: {len(srows)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
