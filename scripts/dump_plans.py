"""Dump .explain('formatted') for every declared query (plus bench
pipeline variants) into plans/<tag>/<query>_<suffix>.txt.

Usage: python scripts/dump_plans.py <tag> <suffix> [query ...]
(default: all queries at sf0.1; q24 executes its index build during
construction -- skipped unless named explicitly)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from fastqdedup_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
tag, suffix = sys.argv[1], sys.argv[2]
only = sys.argv[3:]
outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
os.makedirs(outdir, exist_ok=True)

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
qs = entrymod.queries()
names = only or [n for n in qs if n != "q24_incremental_near_dup"]
for name in names:
    try:
        df = qs[name](spark, SF)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    except Exception as e:  # noqa: BLE001
        txt = f"ERROR building plan: {e!r}"
    with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(txt)
    print(name, "ok")
spark.stop()
