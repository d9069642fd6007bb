"""spark-submit driver (SURVEY.md O17).

Mirrors the reference's argparse surface
(/root/reference/src/fastqdedup/__init__.py:305-361) re-keyed for the
code domain: input table, distance/threshold knobs, dissection method,
plus the graft's shingle/signature/band and checkpoint knobs.

Usage:
    spark-submit --py-files fastqdedup_spark.zip -m fastqdedup_spark.cli \
        --input /data/files --output /data/deduped \
        --shingle-k 7 --num-perm 128 --bands 32 --threshold 0.8 \
        --cluster-dissection canonical --checkpoint-dir /data/ck
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

from fastqdedup_spark.config import DedupConfig
from fastqdedup_spark.pipeline import dedup_files
from fastqdedup_spark.session import get_spark
from fastqdedup_spark.sources import read_files_table, write_table

logger = logging.getLogger("fastqdedup_spark")


def argument_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="fastqdedup-spark")
    p.add_argument("--input", required=True, help="Iceberg table or parquet path")
    p.add_argument("--output", required=True)
    p.add_argument("--shingle-k", type=int, default=7)
    p.add_argument("--num-perm", type=int, default=128)
    p.add_argument("--bands", type=int, default=32)
    p.add_argument("--threshold", type=float, default=0.8,
                   help="exact-Jaccard verify cutoff")
    p.add_argument("-d", "--max-distance", type=int, default=1)
    p.add_argument("--edit", action="store_true", dest="use_edit_distance")
    p.add_argument("-c", "--cluster-dissection", default="canonical",
                   choices=["canonical", "highest_count", "adjacency", "directional"])
    p.add_argument("--band-freq-cap", type=int, default=2000)
    p.add_argument("--strip-boilerplate", type=float, default=0.0, metavar="FRAC",
                   help="strip lines present in more than FRAC of files before shingling")
    p.add_argument("--checkpoint-dir", default="")
    p.add_argument("--master", default=None)
    p.add_argument("-q", "--quiet", action="store_true")
    return p


def main(argv: list[str] | None = None) -> None:
    args = argument_parser().parse_args(argv)
    logging.basicConfig(level=logging.WARNING if args.quiet else logging.INFO)
    cfg = DedupConfig(
        shingle_k=args.shingle_k,
        num_perm=args.num_perm,
        bands=args.bands,
        jaccard_threshold=args.threshold,
        max_distance=args.max_distance,
        use_edit_distance=args.use_edit_distance,
        dissection=args.cluster_dissection,
        band_freq_cap=args.band_freq_cap,
        strip_boilerplate_frac=args.strip_boilerplate,
        checkpoint_dir=args.checkpoint_dir,
    )
    spark = get_spark(master=args.master)
    t0 = time.monotonic()
    files = read_files_table(spark, args.input)
    result = dedup_files(spark, files, cfg)
    write_table(result.deduped, args.output)
    dt = time.monotonic() - t0
    n = result.metrics.get("output.files", 0)
    logger.info("deduped to %s rows in %.1fs; metrics: %s", n, dt, result.metrics)


if __name__ == "__main__":
    main(sys.argv[1:])
