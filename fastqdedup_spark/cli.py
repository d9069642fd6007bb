"""spark-submit driver (SURVEY.md O17).

Mirrors the reference's argparse surface
(/root/reference/src/fastqdedup/__init__.py:305-361) re-keyed for the
code domain: input table, distance/threshold knobs, dissection method,
plus the graft's shingle/signature/band and checkpoint knobs.

Usage (zip built by scripts/make_pyfiles.py; smoke-tested end-to-end in
tests/test_spark_submit.py):
    spark-submit --master <cluster> --py-files dist/fastqdedup_spark.zip \
        scripts/submit_main.py \
        --input /data/files --output /data/deduped \
        --shingle-k 7 --num-perm 256 --bands 32 --threshold 0.8 \
        --cluster-dissection canonical --checkpoint-dir /data/ck
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from dataclasses import replace

from fastqdedup_spark.config import DedupConfig
from fastqdedup_spark.pipeline import dedup_files
from fastqdedup_spark.session import get_spark
from fastqdedup_spark.sources import input_fingerprint, read_files_table, write_table

logger = logging.getLogger("fastqdedup_spark")


def argument_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="fastqdedup-spark")
    p.add_argument("--input", required=True, help="Iceberg table or parquet path")
    p.add_argument("--output", required=True)
    p.add_argument("--shingle-k", type=int, default=7)
    p.add_argument("--num-perm", type=int, default=256)
    p.add_argument("--bands", type=int, default=32)
    p.add_argument("--band-bins", type=int, default=128,
                   help="leading signature bins folded into band hashes "
                        "(0 = all num-perm); the default 256/128 split "
                        "keeps 128-bin banding recall while the est "
                        "prefilter reads the tighter 256-bin sketch")
    p.add_argument("--est-margin", type=float, default=0.141,
                   help="JVM est-Jaccard prefilter keeps est >= threshold"
                        " - margin (0 disables); scale ~1/sqrt(num-perm)")
    p.add_argument("--threshold", type=float, default=0.8,
                   help="exact-Jaccard verify cutoff")
    p.add_argument("-d", "--max-distance", type=int, default=1)
    p.add_argument("--edit", action="store_true", dest="use_edit_distance")
    p.add_argument("-c", "--cluster-dissection", default="canonical",
                   choices=["canonical", "highest_count", "adjacency", "directional"])
    p.add_argument("--band-freq-cap", type=int, default=2000)
    p.add_argument("--max-cluster-size", type=int, default=5_000,
                   help="clusters with more members fall back from "
                        "adjacency/directional dissection to canonical "
                        "(counted in metrics, warned on)")
    p.add_argument("--max-cluster-bytes", type=int, default=256 << 20,
                   help="byte-size analog of --max-cluster-size")
    p.add_argument("--strip-boilerplate", type=float, default=0.0, metavar="FRAC",
                   help="strip lines present in more than FRAC of files before shingling")
    p.add_argument("--est-autoaccept", action="store_true",
                   help="accept sketch-certain candidate pairs without exact "
                        "verification (~3e-3 per-pair false-accept, amplified "
                        "transitively by clustering; off = verify every edge)")
    p.add_argument("--est-transport", default="carry", choices=["probe", "carry"],
                   help="how candidate pairs meet their est sketches: probe "
                        "per-id sketch tables, or carry sig_packed through "
                        "the band shuffle (zero per-pair hash probes)")
    p.add_argument("--copartition-pairs", action="store_true",
                   help="capped band self-joins reuse ONE band_hash "
                        "exchange for both sides (halves the pair "
                        "stage's shuffle bytes; for multi-node clusters "
                        "where the exchange crosses a network — measured "
                        "~30%% slower on a single box, so off by default)")
    p.add_argument("--est-broadcast", default="auto",
                   choices=["auto", "on", "off"],
                   help="broadcast sketch/size metadata tables into the "
                        "candidate/verify joins; auto resolves from the "
                        "resumed distinct-contents count (off past 50M)")
    p.add_argument("--python-stage-partitions", type=int, default=0,
                   help="Arrow/python stage task count (0 = auto: half the "
                        "task slots — each Arrow task is a python worker plus "
                        "a JVM serialization thread)")
    p.add_argument("--index", default="",
                   help="persisted dedup-index directory (incremental mode): "
                        "when empty it is seeded with this run's retained "
                        "state (full batch dedup); when it already holds "
                        "batches, the input is deduped AGAINST it — exact "
                        "tier vs every sha ever seen, near tier vs index "
                        "survivors, then a within-batch recluster — and only "
                        "the kept files are written to --output")
    p.add_argument("--index-batch-id", default="",
                   help="explicit batch id for the --index append (default: "
                        "derived from the input fingerprint; re-running the "
                        "same id is an idempotent no-op append)")
    p.add_argument("--no-update-index", action="store_false", dest="update_index",
                   help="with --index on a non-empty index: dedup against it "
                        "without appending this batch's retained state")
    p.add_argument("--checkpoint-dir", default="")
    p.add_argument("--no-lineage", action="store_false", dest="lineage",
                   help="skip per-partition-file lineage fingerprints on "
                        "durable stages (saves one scan per stage write; "
                        "resumes are no longer content-verified)")
    p.add_argument("--master", default=None)
    p.add_argument("-q", "--quiet", action="store_true")
    return p


def parity_argument_parser() -> argparse.ArgumentParser:
    """The reference's exact CLI surface (argument_parser,
    /root/reference/src/fastqdedup/__init__.py:305-361), Spark-backed."""
    p = argparse.ArgumentParser(prog="fastqdedup-parity")
    p.add_argument(
        "fastq", metavar="FASTQ", nargs="+",
        help="Forward FASTQ and optional reverse and UMI FASTQ files.",
    )
    p.add_argument(
        "-l", "--check-lengths",
        help="Comma-separated lengths/slices per file, e.g. '16,8' or '4:8'.",
    )
    p.add_argument(
        "-o", "--output", action="append",
        help="Output file; repeat once per input file.",
    )
    p.add_argument("-p", "--prefix", default="fastqdedup_R",
                   help="Prefix for default output names.")
    p.add_argument("-d", "--max-distance", type=int, default=1)
    p.add_argument("-e", "--max-average-error-rate", type=float, default=0.001)
    p.add_argument("-E", "--no-average-error-rate-filter",
                   action="store_const", dest="max_average_error_rate", const=1.0,
                   help="Do not filter on average per base error rate.")
    p.add_argument("--edit", action="store_true",
                   help="Use edit (Levenshtein) distance instead of Hamming.")
    p.add_argument("-c", "--cluster-dissection-method",
                   choices=["highest_count", "adjacency", "directional"],
                   default="directional")
    p.add_argument("-v", "--verbose", action="count", default=0)
    p.add_argument("-q", "--quiet", action="count", default=0)
    p.add_argument("--master", default=None, help="Spark master (graft-only).")
    return p


def parity_main(argv: list[str] | None = None) -> None:
    """Reference CLI end-to-end on Spark: read FASTQ file(s) -> zip ->
    quality filter -> exact-radius cluster -> dissect -> first-wins ->
    gzipped FASTQ outputs (deduplicate_cluster + main,
    /root/reference/src/fastqdedup/__init__.py:209-288, 378-412)."""
    from fastqdedup_spark.functions.slices import length_string_to_slices
    from fastqdedup_spark.sources.fastq import (
        deduplicate_fastq,
        read_fastq,
        write_fastq,
    )

    args = parity_argument_parser().parse_args(argv)
    level = logging.INFO - 10 * (args.verbose - args.quiet)
    logging.basicConfig(level=level)
    input_files: list[str] = args.fastq
    check_slices = (
        length_string_to_slices(args.check_lengths) if args.check_lengths else None
    )
    if check_slices and len(input_files) != len(check_slices):
        raise ValueError(
            f"Amount of check lengths ({len(check_slices)}) must be equal to "
            f"the amount of input files ({len(input_files)}). "
        )
    output_files = args.output or [
        f"{args.prefix}{x}.fastq.gz" for x in range(1, len(input_files) + 1)
    ]
    if len(input_files) != len(output_files):
        raise ValueError(
            f"Amount of output files ({len(output_files)}) must be equal to "
            f"the amount of input files ({len(input_files)}). "
        )
    cfg = DedupConfig(
        max_distance=args.max_distance,
        use_edit_distance=args.edit,
        dissection=args.cluster_dissection_method,
    )
    spark = get_spark(master=args.master)
    t0 = time.monotonic()
    tables = [read_fastq(spark, f) for f in input_files]
    surviving = deduplicate_fastq(
        spark, tables, cfg, check_slices, args.max_average_error_rate
    )
    n = write_fastq(surviving, output_files)
    logger.info(
        "wrote %d surviving record tuples to %s in %.1fs",
        n, ", ".join(output_files), time.monotonic() - t0,
    )


def main(argv: list[str] | None = None) -> None:
    args = argument_parser().parse_args(argv)
    logging.basicConfig(level=logging.WARNING if args.quiet else logging.INFO)
    spark = get_spark(master=args.master)
    cfg = DedupConfig(
        shingle_k=args.shingle_k,
        num_perm=args.num_perm,
        bands=args.bands,
        band_bins=args.band_bins,
        est_margin=args.est_margin,
        jaccard_threshold=args.threshold,
        max_distance=args.max_distance,
        use_edit_distance=args.use_edit_distance,
        dissection=args.cluster_dissection,
        band_freq_cap=args.band_freq_cap,
        max_cluster_size=args.max_cluster_size,
        max_cluster_bytes=args.max_cluster_bytes,
        strip_boilerplate_frac=args.strip_boilerplate,
        est_autoaccept=args.est_autoaccept,
        est_transport=args.est_transport,
        copartition_pairs=args.copartition_pairs,
        est_broadcast={"auto": None, "on": True, "off": False}[args.est_broadcast],
        python_stage_partitions=args.python_stage_partitions,
        checkpoint_dir=args.checkpoint_dir,
        lineage=args.lineage,
        # bind checkpoints to THIS input: same knobs + different data
        # must never resume from a previous dataset's stages; --index
        # batch ids derive from the same fingerprint (idempotent appends)
        input_id=(
            input_fingerprint(args.input, spark)
            if (args.checkpoint_dir or args.index)
            else ""
        ),
    )
    t0 = time.monotonic()
    files = read_files_table(spark, args.input)
    if args.index:
        from fastqdedup_spark.incremental import (
            DedupIndex,
            build_index,
            dedup_files_incremental,
            derived_batch_id,
        )

        index = DedupIndex(spark, args.index, cfg)
        # the SAME id the increment path would derive (--index always
        # sets cfg.input_id), so a re-run of the seed-build command is
        # recognized below instead of deduping the input against its
        # own previous append (which returned an empty batch and
        # overwrote --output with it)
        try:
            bid = args.index_batch_id or derived_batch_id(cfg)
        except ValueError:
            # remote input whose listing failed: input_fingerprint fell
            # back to a TIMESTAMPED marker, which derived_batch_id
            # refuses (a per-run id breaks every rerun/resume dispatch
            # below). Derive a content-stable id from the batch itself,
            # under the same preprocessing the incremental path applies.
            from fastqdedup_spark.functions.quality import (
                content_quality_filter,
            )
            from fastqdedup_spark.operators.exact_dedup import with_sha256

            bid = derived_batch_id(
                replace(cfg, input_id=""),
                with_sha256(content_quality_filter(files)),
            )
        if index.is_empty or index.batch_ids() == [bid]:
            if not args.update_index:
                raise SystemExit(
                    "--no-update-index requires an existing index: an empty "
                    f"--index {args.index} has nothing to dedup against"
                )
            result, _ = build_index(
                spark, files, cfg, args.index,
                batch_id=bid, collect_metrics=True,
            )
            deduped, metrics = result.deduped, result.metrics
            mode = "index-build"
        else:
            inc = dedup_files_incremental(
                spark, files, cfg, index,
                update_index=args.update_index, batch_id=bid,
                collect_metrics=True,
            )
            deduped, metrics = inc.deduped, inc.metrics
            mode = "index-increment"
    else:
        result = dedup_files(spark, files, cfg)
        deduped, metrics = result.deduped, result.metrics
        mode = "batch"
    write_table(deduped, args.output)
    dt = time.monotonic() - t0
    n = metrics.get("output.files", metrics.get("incremental.kept", 0))
    n_fallback = metrics.get(
        "dissect.fallback_clusters", metrics.get("batch.dissect.fallback_clusters", 0)
    )
    if n_fallback:
        logger.warning(
            "%d cluster(s) exceeded --max-cluster-size/--max-cluster-bytes "
            "and used canonical (min-sha) survivor selection instead of %s",
            int(n_fallback), cfg.dissection,
        )
    logger.info(
        "[%s] deduped to %s rows in %.1fs; metrics: %s", mode, n, dt, metrics
    )


if __name__ == "__main__":
    main(sys.argv[1:])
