"""Isolate the candidate-pair stage (band join + est + distinct) at a
given core count: wall, REST stage metrics, executed plan.
Usage: taskset -c 0-<n-1> python scripts/pair_probe.py <cores> [n_files]
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
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 192_000

    from fastqdedup_spark.config import DedupConfig
    from fastqdedup_spark.corpus import generate_files
    from fastqdedup_spark.functions.minhash import add_signature_columns, normalize_content
    from fastqdedup_spark.operators.exact_dedup import with_sha256
    from fastqdedup_spark.operators.lsh import minhash_candidate_pairs

    spark = get_spark_ui(cores)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = DedupConfig(
        shingle_k=7, bands=32, jaccard_threshold=0.6,
        # shipped sketch size by default (256 bins / 8 carried longs per
        # side); the round-5 published probes predate the 256 adoption
        # and ran with FASTQDEDUP_NUM_PERM=128
        num_perm=int(os.environ.get("FASTQDEDUP_NUM_PERM", "256")),
        est_transport=os.environ.get("FASTQDEDUP_EST_TRANSPORT", "carry"),
        copartition_pairs=os.environ.get("FASTQDEDUP_COPART", "1") == "1",
    )
    files = generate_files(spark, n_files, seed=42).localCheckpoint(eager=True)
    base = with_sha256(files)
    distinct = (
        base.groupBy("sha")
        .agg(F.first("content").alias("content"), F.count(F.lit(1)).alias("cnt"))
        .withColumn("content_norm", normalize_content("content"))
        .select("sha", "cnt", "content_norm")
    )
    signed = add_signature_columns(distinct, cfg).withColumn(
        "nid", F.unhex(F.substring("sha", 1, 32))
    ).localCheckpoint(eager=True)
    signed.count()
    pairs_lazy, _ = minhash_candidate_pairs(signed, cfg, id_col="nid")

    app_id = rest("/applications")[0]["id"]
    before = {s["stageId"] for s in rest(f"/applications/{app_id}/stages")}
    l0 = os.getloadavg()[0]
    t0 = time.monotonic()
    n_pairs = pairs_lazy.count()
    wall = time.monotonic() - t0
    print(json.dumps({"cores": cores, "n_pairs": n_pairs,
                      "pair_wall": round(wall, 2), "load": round(l0, 1),
                      "load_after": round(os.getloadavg()[0], 1),
                      "heap": os.environ.get("SPARK_DRIVER_MEMORY", "default"),
                      "num_perm": cfg.num_perm,
                      "copart": cfg.copartition_pairs,
                      "transport": cfg.est_transport}), flush=True)
    for s in rest(f"/applications/{app_id}/stages?status=complete"):
        if s["stageId"] in before:
            continue
        print(json.dumps({
            "id": s["stageId"], "tasks": s["numCompleteTasks"],
            "runT": round(s["executorRunTime"] / 1e3, 1),
            "cpuT": round(s["executorCpuTime"] / 1e9, 1),
            "gcT": round(s["jvmGcTime"] / 1e3, 1),
            "shW_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
            "shR_mb": round(s["shuffleReadBytes"] / 1e6, 1),
        }), flush=True)
    pairs_lazy.explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
