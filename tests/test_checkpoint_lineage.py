"""Per-partition lineage on stage checkpoints (north_rule: "resumable
from checkpoint with per-partition lineage + metrics ... resumes
idempotently"). The lineage table pins each parquet part file's row
count and content fingerprint at write time; a resume re-derives them
from the bytes it is about to trust."""

import pyspark.sql.functions as F
import pytest

from fastqdedup_spark.checkpoint import StageCheckpointer
from fastqdedup_spark.config import DedupConfig


def _ck(spark, tmp_path):
    return StageCheckpointer(
        spark, DedupConfig(checkpoint_dir=str(tmp_path / "ck"))
    )


def test_lineage_written_and_verified_on_resume(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("row-"), F.col("id")).alias("content"),
    )
    ck1 = _ck(spark, tmp_path)
    out1 = ck1.stage("stage_a", lambda: df.repartition(4))
    lin = ck1.read_lineage("stage_a")
    assert lin is not None
    lrows = lin.collect()
    assert sum(r["rows"] for r in lrows) == 1000
    assert len(lrows) == len({r["file"] for r in lrows})  # one row per part
    assert ck1.metrics.as_dict()["stage_a.lineage_files"] == len(lrows)

    ck2 = _ck(spark, tmp_path)
    out2 = ck2.stage("stage_a", lambda: (_ for _ in ()).throw(AssertionError))
    assert out2.count() == out1.count()
    m = ck2.metrics.as_dict()
    assert m["stage_a.resumed"] == 1
    assert m["stage_a.lineage_verified"] == 1


def test_lineage_mismatch_fails_loudly(spark, tmp_path):
    """A stage directory whose bytes no longer match the lineage written
    with it (half-overwritten run, manual tampering) must refuse to
    resume instead of flowing stale data downstream."""
    ck1 = _ck(spark, tmp_path)
    ck1.stage("stage_b", lambda: spark.range(0, 100).repartition(2))
    # overwrite the stage data bypassing the checkpointer: _SUCCESS is
    # present and valid parquet, but the lineage fingerprints are stale
    spark.range(500, 600).repartition(2).write.mode("overwrite").parquet(
        ck1._path("stage_b")
    )
    ck2 = _ck(spark, tmp_path)
    with pytest.raises(RuntimeError, match="lineage mismatch"):
        ck2.stage("stage_b", lambda: spark.range(0, 100))


def test_pre_lineage_checkpoints_still_resume(spark, tmp_path):
    """Checkpoints written before lineage existed (no _lineage dir)
    resume with lineage_verified=0, not an error."""
    ck1 = _ck(spark, tmp_path)
    ck1.stage("stage_c", lambda: spark.range(0, 50))
    import shutil

    shutil.rmtree(ck1._lineage_path("stage_c"))
    ck2 = _ck(spark, tmp_path)
    out = ck2.stage("stage_c", lambda: spark.range(0, 50))
    assert out.count() == 50
    assert ck2.metrics.as_dict()["stage_c.lineage_verified"] == 0


def test_persisted_metrics_stable_across_resume_chain(spark, tmp_path):
    """Three resume generations must not grow the persisted _metrics
    table: reloaded counters + freshly re-emitted ones (resumed,
    lineage_verified) dedupe last-wins per (stage, metric) at write
    time, and the fresh-each-resume metrics are never re-added from
    the persisted copy."""
    import os

    df = spark.range(0, 50).withColumn("v", F.col("id") * 2)
    ck1 = _ck(spark, tmp_path)
    ck1.stage("stage_m", lambda: df.repartition(2))
    ck1.metrics.add("stage_m", "custom_counter", 7)
    ck1.write_metrics()

    counts = []
    for _ in range(3):
        ck = _ck(spark, tmp_path)
        ck.stage("stage_m", lambda: (_ for _ in ()).throw(AssertionError))
        ck.write_metrics()
        rows = spark.read.parquet(os.path.join(ck.base, "_metrics")).collect()
        keys = [(r["stage"], r["metric"]) for r in rows]
        assert len(keys) == len(set(keys)), keys  # no duplicate counters
        counts.append(len(keys))
        # the reloaded custom counter survives every generation
        assert ("stage_m", "custom_counter") in keys
    assert counts[0] == counts[1] == counts[2]


def test_resumed_stage_reemits_seconds(spark, tmp_path):
    """Per-stage timings must survive resume chains: the resume path
    excludes the persisted `seconds` copy (it would compound across
    generations) and emits THIS run's load time fresh — before the fix
    it did neither and stage timings vanished from _metrics after the
    first resume."""
    df = spark.range(0, 100).select("id")
    ck1 = _ck(spark, tmp_path)
    ck1.stage("stage_t", lambda: df)
    assert "stage_t.seconds" in ck1.metrics.as_dict()
    ck1.write_metrics()
    ck2 = _ck(spark, tmp_path)
    ck2.stage("stage_t", lambda: df)
    m = ck2.metrics.as_dict()
    assert m.get("stage_t.resumed") == 1
    assert "stage_t.seconds" in m  # fresh load-time, not the old copy
    ck2.write_metrics()
    # persisted metrics keep exactly one seconds row per stage
    ck3 = _ck(spark, tmp_path)
    rows = [
        (m_, v) for m_, v in ck3._persisted_stage_metrics("stage_t")
        if m_ == "seconds"
    ]
    assert len(rows) == 1
