"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row count + sorted-column value hash (order-insensitive).
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from fastqdedup_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:] if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if v != v:
            return "nan"
        return f"{v:.9g}"
    return str(v)


def value_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.monotonic()
        sdf = fn(spark, SF)
        srows = sdf.collect()
        scols = sdf.columns
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"{name}: rows-only, {len(srows)} rows ({dt:.1f}s)")
            if len(srows) == 0:
                print(f"  !! WARNING: zero rows")
            continue
        orows = con.execute(oracles[name]).fetchall()
        ocols = [d[0] for d in con.description]
        sh = value_hash([tuple(r) for r in srows], scols)
        oh = value_hash(orows, ocols)
        ok = len(srows) == len(orows) and sorted(scols) == sorted(ocols) and sh == oh
        status = "OK " if ok else "FAIL"
        print(f"{name}: {status} spark={len(srows)} duck={len(orows)} ({dt:.1f}s)")
        if not ok:
            failures += 1
            if sorted(scols) != sorted(ocols):
                print(f"  cols spark={sorted(scols)} duck={sorted(ocols)}")
            if sh != oh and len(srows) == len(orows):
                sset = {tuple(norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in [tuple(x) for x in srows]}
                oset = {tuple(norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows}
                extra = list(sset - oset)[:3]
                missing = list(oset - sset)[:3]
                print(f"  spark-only: {extra}")
                print(f"  duck-only:  {missing}")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
