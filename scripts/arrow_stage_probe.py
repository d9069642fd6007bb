"""Isolate the two python/Arrow-bound stages (OPH signer, exact-Jaccard
verify) at a given core count and python-stage task cap — the VERDICT
r4 #2 instrument: both stages ran SLOWER at 32 cores than at 8 (10.8 ->
13.4 s and 13.4 -> 22.8 s at 192k), mechanism = JVM+python
oversubscription (each Arrow task is a python worker plus a JVM
serialization thread).

Usage: taskset -c 0-<n-1> python scripts/arrow_stage_probe.py \
         <cores> <python_stage_partitions> [n_files]
Prints one JSON line per stage with wall + REST cpu totals.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from scripts.stage_probe import get_spark_ui, rest


def main():
    cores = int(sys.argv[1])
    cap = int(sys.argv[2])
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 192_000

    from fastqdedup_spark.config import DedupConfig
    from fastqdedup_spark.corpus import generate_files
    from fastqdedup_spark.functions.minhash import (
        add_signature_columns,
        normalize_content,
    )
    from fastqdedup_spark.operators.exact_dedup import with_sha256
    from fastqdedup_spark.operators.lsh import minhash_candidate_pairs
    from fastqdedup_spark.operators.verify import verify_pairs_jaccard

    spark = get_spark_ui(cores)
    spark.sparkContext.setLogLevel("ERROR")
    # shipped defaults (256-bin sketch over 128-bin banding) with only
    # the task cap overridden — the knob under test
    cfg = DedupConfig(
        shingle_k=7, jaccard_threshold=0.6, python_stage_partitions=cap,
    )
    files = generate_files(spark, n_files, seed=42).localCheckpoint(eager=True)
    distinct = (
        with_sha256(files)
        .groupBy("sha")
        .agg(F.first("content").alias("content"), F.count(F.lit(1)).alias("cnt"))
        .withColumn("content_norm", normalize_content("content"))
        .select("sha", "cnt", "content_norm")
        .localCheckpoint(eager=True)
    )
    distinct.count()

    def timed(name, build):
        l0 = os.getloadavg()[0]
        app_id = rest("/applications")[0]["id"]
        before = {s["stageId"] for s in rest(f"/applications/{app_id}/stages")}
        t0 = time.monotonic()
        df = build()
        n = df.count()
        wall = time.monotonic() - t0
        cpu = run = 0.0
        for s in rest(f"/applications/{app_id}/stages?status=complete"):
            if s["stageId"] not in before:
                cpu += s["executorCpuTime"] / 1e9
                run += s["executorRunTime"] / 1e3
        print(json.dumps({
            "stage": name, "cores": cores, "cap": cap, "rows": n,
            "wall": round(wall, 2), "cpuT": round(cpu, 1),
            "runT": round(run, 1), "load": round(l0, 1),
            "load_after": round(os.getloadavg()[0], 1),
        }), flush=True)
        return df

    # rep 0 is the cold pass (janino + HotSpot + python-worker spin-up
    # land there); rep 1 is the steady state a long job runs at
    for rep in range(2):
        signed = timed(
            f"signatures_r{rep}",
            lambda: add_signature_columns(distinct, cfg)
            .withColumn("nid", F.unhex(F.substring("sha", 1, 32)))
            .localCheckpoint(eager=True),
        )
    pairs, _ = minhash_candidate_pairs(signed, cfg, id_col="nid")
    pairs = pairs.localCheckpoint(eager=True)
    pairs.count()
    # interleaved same-JVM A/B of the verify partitioning mode (legacy
    # vs degree-oriented) — same load window, same warm python workers
    import dataclasses

    for rep in range(3):
        for orient in (False, True):
            c = dataclasses.replace(cfg, verify_orient=orient)
            timed(
                f"edges_orient{int(orient)}_r{rep}",
                lambda: verify_pairs_jaccard(
                    pairs,
                    signed.select("nid", "content_norm", "n_shingles", "sig_packed"),
                    c,
                    id_col="nid",
                    skip_est=True,
                ),
            )
    spark.stop()


if __name__ == "__main__":
    main()
