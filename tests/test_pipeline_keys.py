"""Spark pipeline vs the reference's golden trie fixtures
(/root/reference/tests/test_trie.py:75-136) — the clustering gate.

The Spark `dedup_keys` path must produce the exact single-linkage
partition the reference's `pop_cluster` extracts, for both Hamming and
edit distance, and the dissected survivors must match the pure-Python
oracle (which is itself pinned to the reference's fixtures in
test_oracle.py)."""

import pytest

from fastqdedup_spark.config import DedupConfig
from fastqdedup_spark.oracle import oracle_survivors
from fastqdedup_spark.pipeline import dedup_keys

TRIE_KEYS = [
    "AAAA", "AAAA", "AAAC", "AAGC", "AGGC", "CCCG",
    "CCCG", "TTCA", "TTCC", "TTTA", "TTT", "TTC",
]


def _partition(clusters_df):
    rows = clusters_df.select("cluster_id", "key", "cnt").collect()
    out = {}
    for r in rows:
        out.setdefault(r.cluster_id, set()).add((r.cnt, r.key))
    return set(frozenset(s) for s in out.values())


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


def test_hamming_golden_partition(spark):
    cfg = DedupConfig(max_distance=1, use_edit_distance=False)
    res = dedup_keys(spark, _keys_df(spark, TRIE_KEYS), cfg)
    expected = {
        frozenset({(2, "AAAA"), (1, "AAGC"), (1, "AAAC"), (1, "AGGC")}),
        frozenset({(2, "CCCG")}),
        frozenset({(1, "TTCA"), (1, "TTCC"), (1, "TTTA")}),
        frozenset({(1, "TTT"), (1, "TTC")}),
    }
    assert _partition(res.clusters) == expected


def test_edit_golden_partition(spark):
    cfg = DedupConfig(max_distance=1, use_edit_distance=True)
    res = dedup_keys(spark, _keys_df(spark, TRIE_KEYS), cfg)
    expected = {
        frozenset({(2, "AAAA"), (1, "AAGC"), (1, "AAAC"), (1, "AGGC")}),
        frozenset({(2, "CCCG")}),
        frozenset({(1, "TTCA"), (1, "TTCC"), (1, "TTTA"), (1, "TTT"), (1, "TTC")}),
    }
    assert _partition(res.clusters) == expected


@pytest.mark.parametrize("method", ["directional", "adjacency", "highest_count"])
@pytest.mark.parametrize("use_edit", [False, True])
def test_survivors_match_oracle(spark, method, use_edit):
    cfg = DedupConfig(max_distance=1, use_edit_distance=use_edit, dissection=method)
    res = dedup_keys(spark, _keys_df(spark, TRIE_KEYS), cfg)
    got = {r.key for r in res.survivors.collect()}
    counted = [(TRIE_KEYS.count(k), k) for k in sorted(set(TRIE_KEYS))]
    want = oracle_survivors(counted, method, 1, use_edit)
    assert got == want


def test_dissection_cluster_fixture_through_spark(spark):
    """FIXTURES.md F2: the 6-member TEST_CLUSTER with planted counts,
    run as raw occurrences through the whole Spark path."""
    cluster = [
        (3, "AAAGT"), (10, "AAAAT"), (50, "AACAA"),
        (60, "AAAAA"), (10, "CAAAA"), (30, "CTAAA"),
    ]
    occurrences = [(k,) for cnt, k in cluster for _ in range(cnt)]
    df = spark.createDataFrame(occurrences, "key string")
    expected = {
        "directional": {"AACAA", "AAAAA", "CTAAA"},
        "adjacency": {"AAAAA", "CTAAA", "AAAGT"},
        "highest_count": {"AAAAA"},
    }
    for method, want in expected.items():
        cfg = DedupConfig(max_distance=1, dissection=method)
        res = dedup_keys(spark, df, cfg)
        assert {r.key for r in res.survivors.collect()} == want, method
        # first-wins emission: every occurrence of a surviving key kept
        assert res.deduped.count() == sum(
            cnt for cnt, k in cluster if k in want
        )


def test_deletion_banding_d2(spark):
    """edit distance d=2 via 2-deletion neighborhood."""
    keys = ["ABCDEF", "ABDF", "XYZQRS", "AXCDEF"]  # ABCDEF<->ABDF d=2, ABCDEF<->AXCDEF d=1
    cfg = DedupConfig(max_distance=2, use_edit_distance=True, dissection="canonical")
    res = dedup_keys(spark, _keys_df(spark, keys), cfg)
    part = {frozenset(kv[1] for kv in c) for c in _partition(res.clusters)}
    assert part == {frozenset({"ABCDEF", "ABDF", "AXCDEF"}), frozenset({"XYZQRS"})}
