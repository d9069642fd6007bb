"""2-bit est-sketch prefilter: packing, the Catalyst matching-bin
expression, threshold mapping, and recall-neutrality of the filter.

The est expression must stay O(num_perm/32) nodes — the byte-packed
128-term ancestor overflowed janino's 64 KB method limit inside the
broadcast-join consume function and the whole pair stage silently ran
without whole-stage codegen (VERDICT r3 #1; scripts/codegen_lab.py has
the measured post-mortem).
"""

import numpy as np
import pyspark.sql.functions as F
import pytest

from fastqdedup_spark.config import DedupConfig
from fastqdedup_spark.functions.minhash import minhash_batch
from fastqdedup_spark.operators.verify import (
    est_bin_match_prob,
    est_jaccard_matches,
    est_min_matches,
    est_prefilter,
)


def _pack_2bit(sig: np.ndarray, num_perm: int) -> np.ndarray:
    bits = (sig.view(np.uint64) & np.uint64(3)).reshape(len(sig), num_perm // 32, 32)
    shifts = (np.uint64(2) * np.arange(32, dtype=np.uint64))[None, None, :]
    return np.bitwise_or.reduce(bits << shifts, axis=2).view(np.int64)


@pytest.mark.parametrize("num_perm", [64, 128])
def test_est_expression_matches_numpy(spark, num_perm):
    rng = np.random.default_rng(7)
    n = 50
    sig = rng.integers(0, 2**63 - 1, size=(n, num_perm), dtype=np.uint64).view(np.int64)
    # plant high-agreement rows: row i and i+1 share 90% of bins
    for i in range(0, n - 1, 2):
        mask = rng.random(num_perm) < 0.9
        sig[i + 1, mask] = sig[i, mask]
    packed = _pack_2bit(sig, num_perm)
    rows = [(i, packed[i].tolist()) for i in range(n)]
    sigs = spark.createDataFrame(rows, "id long, sig_packed array<bigint>")
    pairs = spark.createDataFrame(
        [(a, b) for a in range(n) for b in range(a + 1, min(a + 4, n))],
        "id_a long, id_b long",
    )
    cfg = DedupConfig(num_perm=num_perm)
    ga = sigs.select(F.col("id").alias("id_a"), F.col("sig_packed").alias("sig_a"))
    gb = sigs.select(F.col("id").alias("id_b"), F.col("sig_packed").alias("sig_b"))
    got = {
        (r["id_a"], r["id_b"]): r["m"]
        for r in pairs.join(ga, "id_a").join(gb, "id_b")
        .withColumn("m", est_jaccard_matches(cfg))
        .collect()
    }
    low = sig.view(np.uint64) & np.uint64(3)
    for (a, b), m in got.items():
        assert m == int(np.count_nonzero(low[a] == low[b])), (a, b)


def test_threshold_mapping_corrects_quarter_bias():
    cfg = DedupConfig(num_perm=128, jaccard_threshold=0.8, est_margin=0.2)
    # est-jaccard >= 0.6 maps to bin-match prob 0.6 + 0.4/4 = 0.7
    assert est_bin_match_prob(0.6) == pytest.approx(0.7)
    assert est_min_matches(cfg, 0.6) == 89  # floor(0.7 * 128)
    assert est_min_matches(cfg, 1.0) == 128


def test_prefilter_keeps_true_pairs_drops_background(spark):
    """End-to-end through real signatures: planted near-dups (j ~ 0.9)
    survive; unrelated texts (j ~ 0) are dropped."""
    cfg = DedupConfig(shingle_k=5, num_perm=128, jaccard_threshold=0.8, est_margin=0.2)
    rng = np.random.default_rng(11)
    base = [
        " ".join(rng.choice(list("abcdefghij"), size=200).tolist()) for _ in range(20)
    ]
    near = [t[:-10] + "zzzzzzzzzz" for t in base]  # tiny mutation, j >> 0.8
    texts = base + near
    sig = minhash_batch(texts, cfg.shingle_k, cfg.num_perm, cfg.seed)
    packed = _pack_2bit(sig, cfg.num_perm)
    sigs = spark.createDataFrame(
        [(i, packed[i].tolist()) for i in range(len(texts))],
        "id long, sig_packed array<bigint>",
    )
    true_pairs = [(i, i + 20) for i in range(20)]
    bg_pairs = [(i, j) for i in range(20) for j in range(i + 1, 20)]
    pairs = spark.createDataFrame(true_pairs + bg_pairs, "id_a long, id_b long")
    kept = {
        (r["id_a"], r["id_b"])
        for r in est_prefilter(pairs, sigs, cfg, "id").collect()
    }
    assert set(true_pairs) <= kept
    assert not (set(bg_pairs) & kept)


def test_est_broadcast_auto_resolution():
    """AUTO (None) broadcasts only while the known distinct count fits
    est_broadcast_max_rows; unknown count broadcasts; an explicit
    True/False always wins (VERDICT r4 #7)."""
    auto = DedupConfig()
    assert auto.est_broadcast is None
    assert auto.resolved_est_broadcast() is True                  # unknown
    assert auto.resolved_est_broadcast(1_000_000) is True
    assert auto.resolved_est_broadcast(60_000_000) is False       # > 50M
    pinned_on = DedupConfig(est_broadcast=True)
    assert pinned_on.resolved_est_broadcast(60_000_000) is True
    pinned_off = DedupConfig(est_broadcast=False)
    assert pinned_off.resolved_est_broadcast(10) is False


def test_est_broadcast_off_plans_shuffled_joins(spark):
    """est_broadcast=False must remove every BroadcastExchange from the
    prefilter plan (the >50M-distinct-contents shape: sketch joins run
    as shuffled equi-joins instead of a driver-OOM broadcast)."""
    rows = [(i, [0, 0, 0, 0]) for i in range(8)]
    sigs = spark.createDataFrame(rows, "id long, sig_packed array<bigint>")
    pairs = spark.createDataFrame(
        [(a, a + 1) for a in range(7)], "id_a long, id_b long"
    )
    # disable the size-based auto-broadcast so the plan shows only the
    # EXPLICIT hint decision (tiny test tables would otherwise
    # broadcast either way; at >50M rows the statistics do this)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        on = est_prefilter(pairs, sigs, DedupConfig(est_broadcast=True), "id")
        off = est_prefilter(pairs, sigs, DedupConfig(est_broadcast=False), "id")
        on_plan = on._jdf.queryExecution().executedPlan().toString()
        off_plan = off._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastExchange" in on_plan
    assert "BroadcastExchange" not in off_plan


def test_carry_transport_matches_probe(spark):
    """est_transport="carry" (sketch rides the band shuffle) must yield
    the IDENTICAL candidate pair set and est_matches values as "probe"
    (sketch joined per id) — transport is a physical choice only."""
    from fastqdedup_spark.corpus import generate_files
    from fastqdedup_spark.functions.minhash import (
        add_signature_columns,
        normalize_content,
    )
    from fastqdedup_spark.operators.exact_dedup import with_sha256
    from fastqdedup_spark.operators.lsh import minhash_candidate_pairs

    files = generate_files(spark, 800, seed=11)
    distinct = (
        with_sha256(files)
        .groupBy("sha")
        .agg(F.first("content").alias("content"))
        .withColumn("content_norm", normalize_content("content"))
        .select("sha", "content_norm")
    )
    base = DedupConfig(shingle_k=7, num_perm=128, bands=32, jaccard_threshold=0.6)
    signed = add_signature_columns(distinct, base).localCheckpoint(eager=True)
    got = {}
    for mode in ("probe", "carry"):
        cfg = DedupConfig(
            shingle_k=7, num_perm=128, bands=32, jaccard_threshold=0.6,
            est_transport=mode,
        )
        pairs, _ = minhash_candidate_pairs(signed, cfg, id_col="sha", keep_est=True)
        got[mode] = sorted(
            (r.id_a, r.id_b, r.est_matches) for r in pairs.collect()
        )
    assert len(got["probe"]) > 0
    assert got["probe"] == got["carry"]


def test_decoupled_band_bins_keeps_recall_and_shrinks_margin(spark):
    """num_perm=256 + band_bins=128 (the np256_b32 design point): the
    banding structure stays 32 bands x 4 rows -> same candidate-recall
    math as np128, while the est sketch doubles to 256 bins so the
    prefilter margin can shrink to 0.141 at the same false-drop
    probability. The tightened prefilter must still keep every
    candidate whose TRUE jaccard clears the threshold."""
    from fastqdedup_spark.corpus import generate_files
    from fastqdedup_spark.functions.minhash import (
        add_signature_columns,
        normalize_content,
        shingle_set,
    )
    from fastqdedup_spark.operators.exact_dedup import with_sha256
    from fastqdedup_spark.operators.lsh import minhash_candidate_pairs

    cfg = DedupConfig(
        shingle_k=7, num_perm=256, bands=32, band_bins=128,
        jaccard_threshold=0.6, est_margin=0.141,
    )
    assert cfg.rows_per_band == 4  # np128's structure, not 256/32=8
    files = generate_files(spark, 800, seed=13)
    distinct = (
        with_sha256(files)
        .groupBy("sha")
        .agg(F.first("content").alias("content"))
        .withColumn("content_norm", normalize_content("content"))
        .select("sha", "content_norm")
    )
    signed = add_signature_columns(distinct, cfg).localCheckpoint(eager=True)
    row = signed.select("band_hash", "sig_packed").first()
    assert len(row["band_hash"]) == 32
    assert len(row["sig_packed"]) == 256 // 32
    unfiltered_cfg = DedupConfig(
        shingle_k=7, num_perm=256, bands=32, band_bins=128,
        jaccard_threshold=0.6, est_margin=0.0,
    )
    kept, _ = minhash_candidate_pairs(signed, cfg, id_col="sha")
    raw, _ = minhash_candidate_pairs(signed, unfiltered_cfg, id_col="sha")
    kept_set = {(r.id_a, r.id_b) for r in kept.collect()}
    raw_rows = raw.collect()
    assert kept_set <= {(r.id_a, r.id_b) for r in raw_rows}
    texts = {r["sha"]: r["content_norm"] for r in signed.collect()}
    shingles = {s: shingle_set(t, 7) for s, t in texts.items()}
    dropped_true = [
        (r.id_a, r.id_b)
        for r in raw_rows
        if (r.id_a, r.id_b) not in kept_set
        and len(shingles[r.id_a] & shingles[r.id_b])
        / max(1, len(shingles[r.id_a] | shingles[r.id_b]))
        >= cfg.jaccard_threshold
    ]
    assert dropped_true == []


def test_margin_zero_drops_carried_sketch_from_band_plan(spark):
    """est_margin=0 disables the prefilter, so the carry transport must
    NOT ship the 8-long sketch through the band exchange (a ~2.3x
    fattening nothing reads). The executed plan's band explode should
    carry sig_packed only when the prefilter will consume it."""
    from fastqdedup_spark.corpus import generate_files
    from fastqdedup_spark.functions.minhash import (
        add_signature_columns,
        normalize_content,
    )
    from fastqdedup_spark.operators.exact_dedup import with_sha256
    from fastqdedup_spark.operators.lsh import minhash_candidate_pairs

    files = generate_files(spark, 200, seed=13)
    distinct = (
        with_sha256(files)
        .groupBy("sha")
        .agg(F.first("content").alias("content"))
        .withColumn("content_norm", normalize_content("content"))
        .select("sha", "content_norm")
    )

    def band_plan(margin):
        cfg = DedupConfig(
            shingle_k=7, num_perm=128, bands=32, jaccard_threshold=0.6,
            est_transport="carry", est_margin=margin,
        )
        signed = add_signature_columns(distinct, cfg)
        pairs, _ = minhash_candidate_pairs(signed, cfg, id_col="sha")
        # optimized plan: column pruning has run, so an unread
        # sig_packed survives only in the signer's FIXED MapInPandas
        # output schema (a UDF's schema cannot be pruned) — any other
        # line carrying it means the payload rides the band exchange
        plan = pairs._jdf.queryExecution().optimizedPlan().toString()
        return [
            l for l in plan.splitlines()
            if "sig_packed" in l and "MapInPandas" not in l
        ]

    assert band_plan(0.2)       # prefilter consumes it downstream
    assert not band_plan(0.0), "dead sketch payload rides the band plan"
