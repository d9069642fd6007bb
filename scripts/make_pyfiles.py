"""Build the spark-submit --py-files artifact (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Deterministic zip of the fastqdedup_spark package: fixed timestamps and
sorted entries, so the artifact hash is stable for a given tree —
re-shipping an unchanged pipeline never invalidates executor-side
file caches keyed by checksum.

Usage: python scripts/make_pyfiles.py [out.zip]   (default dist/fastqdedup_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "fastqdedup_spark")


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    entries = []
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, REPO), full))
    entries.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in entries:
            with open(full, "rb") as fh:
                info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
                info.compress_type = zipfile.ZIP_DEFLATED
                z.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "fastqdedup_spark.zip"
    )
    print(build(out))
