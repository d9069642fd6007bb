"""Size-adaptive bucket-pair salting correctness: the salted self-join
must produce exactly the same pair set as a plain self-join, for any
pairs_per_task (granule size), with uniform per-granule work."""

import pyspark.sql.functions as F

from fastqdedup_spark.config import DedupConfig
from fastqdedup_spark.operators.lsh import _pairs_from_bands


def _band_rows(spark, groups):
    rows = [(f"id{g}_{i}", g * 1000) for g, n in groups for i in range(n)]
    return spark.createDataFrame(rows, "key string, band_hash long")


def test_salted_pairs_equal_plain_pairs(spark):
    # one medium band (150), one small (3), one above the freq cap (500)
    bands = _band_rows(spark, [(1, 150), (2, 3), (3, 500)])
    plain_cfg = DedupConfig(pairs_per_task=10**9, band_freq_cap=200)  # S=1 everywhere
    salted_cfg = DedupConfig(pairs_per_task=500, band_freq_cap=200)   # S=45 for band 1
    plain, _ = _pairs_from_bands(bands, "key", plain_cfg, cap=plain_cfg.band_freq_cap)
    salted, _ = _pairs_from_bands(bands, "key", salted_cfg, cap=salted_cfg.band_freq_cap)
    p = {(r.id_a, r.id_b) for r in plain.collect()}
    q = {(r.id_a, r.id_b) for r in salted.collect()}
    assert p == q
    # band 3 (500 members) above the freq cap: contributes nothing
    assert not any(a.startswith("id3") for a, _ in p)
    # band 1: 150 members -> C(150,2) pairs; band 2: C(3,2)
    assert len(p) == 150 * 149 // 2 + 3


def test_salting_handles_all_pairs_across_buckets(spark):
    """Every unordered pair appears exactly once (no dupes before the
    final distinct, no losses) even when bucket(a) > bucket(b)."""
    bands = _band_rows(spark, [(7, 80)])
    cfg = DedupConfig(pairs_per_task=1000, band_freq_cap=100)  # S=7
    pairs, _ = _pairs_from_bands(bands, "key", cfg, cap=cfg.band_freq_cap)
    rows = pairs.collect()
    assert len(rows) == 80 * 79 // 2
    assert len({(r.id_a, r.id_b) for r in rows}) == len(rows)


def test_copartitioned_band_join_single_exchange(spark):
    """Capped schemes join CO-PARTITIONED on band_hash with the bucket
    salt _v in the JOIN KEY only: the executed plan must contain NO
    exchange keyed on _v (the payload-fat band table crosses the wire
    once; sizes travel on a thin band_hash-only shuffle), no sort (the
    windowless sizes join replaced the window), and the second side
    must reuse the first side's exchanges. The legacy path
    (copartition_pairs=False) must produce the identical pair set
    through its two explicit salt repartitions."""
    bands = _band_rows(spark, [(1, 60), (2, 3), (4, 40)])
    cfg = DedupConfig(
        pairs_per_task=300, band_freq_cap=100, copartition_pairs=True
    )  # S>1 for bands 1,4; copart opted in (cluster-scale knob, off by default)
    legacy_cfg = DedupConfig(
        pairs_per_task=300, band_freq_cap=100, copartition_pairs=False
    )
    pairs, _ = _pairs_from_bands(bands, "key", cfg, cap=cfg.band_freq_cap)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    legacy, _ = _pairs_from_bands(
        bands, "key", legacy_cfg, cap=legacy_cfg.band_freq_cap
    )
    assert got == {(r.id_a, r.id_b) for r in legacy.collect()}
    assert len(got) == 60 * 59 // 2 + 3 + 40 * 39 // 2

    plan = pairs._jdf.queryExecution().executedPlan().toString()
    # the adaptive dump appends the pre-execution "Initial Plan" (which
    # always shows both exchanges) — assert on the executed Final Plan
    plan = plan.split("== Initial Plan ==")[0]
    import re

    assert not re.search(r"Exchange hashpartitioning\([^)]*_v", plan), plan
    assert plan.count("ReusedExchange") >= 2, plan
    assert "Window" not in plan and not re.search(r"\bSort\b", plan), plan


def test_default_band_join_uses_salted_exchanges(spark):
    """The DEFAULT capped-scheme plan is the legacy shape: both sides
    repartitioned explicitly on the salted (band_hash, _v) key — the
    measured single-box winner (scripts/knob_ab.py, BASELINE.md round
    5: co-partitioning was ~30% slower end-to-end at 768k/32c). This
    pins the default so a future copart re-adoption must be explicit
    (and re-measured)."""
    bands = _band_rows(spark, [(1, 60), (4, 40)])
    cfg = DedupConfig(pairs_per_task=300, band_freq_cap=100)
    assert not cfg.copartition_pairs
    pairs, _ = _pairs_from_bands(bands, "key", cfg, cap=cfg.band_freq_cap)
    pairs.collect()
    import re

    plan = pairs._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert re.search(r"Exchange hashpartitioning\([^)]*_v", plan), plan


def test_exact_schemes_never_capped(spark):
    """ADVICE r1 (high): pigeonhole/deletion banding documents recall
    1.0 — a band above band_freq_cap must be SALTED, not dropped. With
    no cap (the exact-scheme default), every pair of the oversized band
    survives."""
    bands = _band_rows(spark, [(3, 500)])  # 500 members >> cap of 200
    cfg = DedupConfig(pairs_per_task=20_000, band_freq_cap=200)  # S=13
    pairs, metrics = _pairs_from_bands(bands, "key", cfg)  # cap=None default
    assert pairs.count() == 500 * 499 // 2
    assert metrics.collect()[0].capped_bands == 0


def test_pigeonhole_recall_above_cap(spark):
    """End-to-end: keys whose pigeonhole chunks all collide in bands
    larger than band_freq_cap still produce every true Hamming-<=d pair."""
    from fastqdedup_spark.operators.lsh import pigeonhole_candidate_pairs

    # 12 keys, all within Hamming 1 of "AAAA" -> every band has >= 4
    # members while the cap is 3; dropping any band loses true pairs
    keys = ["AAAA", "CAAA", "GAAA", "TAAA", "ACAA", "AGAA",
            "ATAA", "AACA", "AAGA", "AATA", "AAAC", "AAAG"]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    cfg = DedupConfig(max_distance=1, band_freq_cap=3, pairs_per_task=10)
    pairs, _ = pigeonhole_candidate_pairs(df, cfg)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # candidate recall: every true Hamming<=1 pair must be present
    from fastqdedup_spark.oracle import oracle_pairs

    truth = {
        tuple(sorted((keys[i], keys[j])))
        for i, j in oracle_pairs(keys, max_distance=1)
    }
    assert truth <= got
