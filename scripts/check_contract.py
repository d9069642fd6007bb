"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row count + sorted-column value hash (order-insensitive).

--typed additionally replays the DRIVER's read path: the oracle result
is ALSO fetched as a pandas frame (`con.execute(...).df()`) and any
cell whose typed representation diverges from the fetchall one is a
failure. This catches the HUGEINT class VERDICT r5 root-caused: an
un-cast DuckDB windowed SUM(BIGINT) returns HUGEINT, which fetchall
yields as a Python int (hashes equal) but a pandas-typed read maps to
float64 ("3.0" vs "3") — exactly a driver-side hash-only mismatch the
plain gate cannot see. KNOWN inherited divergence: q29/q31's `shard`
column (oracle SQL is frozen this round; the engine side is typed long
and judge-verified correct — VERDICT r5 "what's wrong" #1).
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from fastqdedup_spark.session import get_spark

ARGS = [a for a in sys.argv[1:] if a != "--typed"]
TYPED = "--typed" in sys.argv[1:]
SF = ARGS[0] if ARGS else "/root/testdata/sf0.01"
ONLY = ARGS[1:] if len(ARGS) > 1 else None

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
        typed_ok = True
        typed_msgs = []
        if TYPED:
            # the driver's read path: pandas-typed frame. Dtype
            # assertion per VERDICT r5 #3 (value-level %.9g formatting
            # HIDES the class): a Spark-integral column whose oracle
            # frame comes back floating WITHOUT any nulls is an un-cast
            # aggregate (HUGEINT -> float64; "3.0" vs 3 at the driver).
            # Null-bearing columns are skipped — pandas legitimately
            # promotes nullable ints to float64.
            import pandas as _pd

            tdf = con.execute(oracles[name]).df()
            spark_int_cols = {
                f.name
                for f in sdf.schema.fields
                if f.dataType.simpleString() in ("int", "bigint", "smallint", "tinyint")
            }
            for c in tdf.columns:
                if c in spark_int_cols and _pd.api.types.is_float_dtype(tdf[c]):
                    if not tdf[c].isna().any():
                        typed_ok = False
                        typed_msgs.append(
                            f"  column {c!r}: spark integral but oracle "
                            f"pandas dtype {tdf[c].dtype} with no nulls — "
                            "un-cast aggregate output (VERDICT r5 HUGEINT class)"
                        )
        ok = (
            len(srows) == len(orows)
            and sorted(scols) == sorted(ocols)
            and sh == oh
            and typed_ok
        )
        status = "OK " if ok else "FAIL"
        print(f"{name}: {status} spark={len(srows)} duck={len(orows)} ({dt:.1f}s)")
        if not ok:
            failures += 1
            for m in typed_msgs:
                print(m)
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
