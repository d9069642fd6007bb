"""Property-based tests (hypothesis) for the pure kernels."""

import numpy as np
from hypothesis import given, settings, strategies as st

from fastqdedup_spark.functions.distances import (
    within_edit_distance,
    within_hamming_distance,
)
from fastqdedup_spark.functions.minhash import minhash_batch, shingle_set
from fastqdedup_spark.functions.simhash import simhash_batch
from fastqdedup_spark.oracle import connected_components_oracle

short = st.text(alphabet="ACGT", min_size=0, max_size=12)
texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    min_size=0, max_size=300,
)


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(short, short, st.integers(0, 6))
@settings(max_examples=300, deadline=None)
def test_edit_distance_matches_full_dp(a, b, d):
    assert within_edit_distance(a, b, d) == (_lev(a, b) <= d)


@given(short, short, st.integers(0, 6))
@settings(max_examples=200, deadline=None)
def test_distance_predicates_symmetric_and_consistent(a, b, d):
    assert within_edit_distance(a, b, d) == within_edit_distance(b, a, d)
    assert within_hamming_distance(a, b, d) == within_hamming_distance(b, a, d)
    # edit distance never exceeds Hamming distance (equal lengths)
    if within_hamming_distance(a, b, d):
        assert within_edit_distance(a, b, d)


@given(st.lists(texts, min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_minhash_batch_split_invariance(batch):
    joint = minhash_batch(batch, 5, 32, 7)
    for i, t in enumerate(batch):
        solo = minhash_batch([t], 5, 32, 7)
        assert (joint[i] == solo[0]).all()


@given(st.lists(texts, min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_simhash_batch_split_invariance(batch):
    joint = simhash_batch(batch, 7)
    for i, t in enumerate(batch):
        assert joint[i] == simhash_batch([t], 7)[0]


@given(texts, texts)
@settings(max_examples=60, deadline=None)
def test_shingle_sets_reflect_equality(a, b):
    sa, sb = shingle_set(a, 5), shingle_set(b, 5)
    if a == b:
        assert sa == sb
    # k-gram count bound: |set| <= max(len-4, 0) in utf-8 bytes
    assert len(sa) <= max(len(a.encode("utf-8", "surrogatepass")) - 4, 0)


@given(st.lists(short, min_size=1, max_size=10), st.integers(0, 2), st.booleans())
@settings(max_examples=100, deadline=None)
def test_cc_oracle_is_a_partition(keys, d, edit):
    labels = connected_components_oracle(keys, d, edit)
    # same key -> same label; labels are representatives (fixpoints)
    for i, k in enumerate(keys):
        for j, k2 in enumerate(keys):
            if k == k2:
                assert labels[i] == labels[j]
    assert all(labels[l] == l for l in set(labels))


def test_simhash_chunk_dispatch_matches_single_chunk():
    """The 32 KB cache-residency chunking (simhash._SIMHASH_CHUNK_BYTES)
    must be invisible: a batch spanning several chunk boundaries — with
    empty rows and an oversized single row AT a boundary — hashes
    byte-identically to the unchunked kernel."""
    from fastqdedup_spark.functions.portable import (
        _portable_simhash_chunk,
        portable_simhash_batch,
    )
    from fastqdedup_spark.functions.simhash import _simhash_chunk

    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "x1", "yy", ""]
    batch = []
    for i in range(90):  # ~90 x ~2.4 KB = ~220 KB >> 32 KB: many chunks
        batch.append(" ".join(rng.choice(words, size=400).tolist()))
        if i % 30 == 10:
            batch.append("")  # empty rows land inside chunks
        if i == 45:
            batch.append("big " * 20_000)  # 80 KB row: gets its own chunk
    assert np.array_equal(simhash_batch(batch, 7), _simhash_chunk(batch, 7))
    assert np.array_equal(
        portable_simhash_batch(batch), _portable_simhash_chunk(batch)
    )
