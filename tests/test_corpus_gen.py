"""Byte-identity pins for the synthetic corpus generator.

Round-6 sped `_gen_batch` up ~3.4x (integers-for-choice, per-batch
family-base memo, bytes-hex commit). Every one of those is a pure
recomputation/overhead removal, so the generated table must stay
byte-identical — the 768k scaling record and the bench's corpus
pipeline both compare against outputs of the historical byte stream.
"""

from __future__ import annotations

import hashlib

import numpy as np

from fastqdedup_spark.corpus import _gen_batch

# sha256 over the content / commit columns of _gen_batch(arange(64), 42),
# computed on the pre-optimization (round-start) code and re-verified
# identical on the optimized code. 64 ids = 8 whole families: covers
# base/exact/near/unrelated members, the 1/3 license-header branch and
# every lang bucket.
_GOLDEN_CONTENT = "28d75d812342f71667045a491014b1711a050cd75f534ef26f0649d78f32f2f4"
_GOLDEN_COMMIT = "17c1585a4c6bb2e4794020e1f007940f198302552e8a4e1519c383f8af129baa"


def _digest(col) -> str:
    return hashlib.sha256("\x1f".join(col).encode()).hexdigest()


def test_gen_batch_golden_digest():
    df = _gen_batch(np.arange(64), 42)
    assert _digest(df["content"]) == _GOLDEN_CONTENT
    assert _digest(df["commit"]) == _GOLDEN_COMMIT


def test_gen_batch_split_invariant():
    """Partition boundaries (including ones that cut a family in half)
    must not change any row: the family-base memo is per-batch, so a
    split family recomputes the base — byte-identically."""
    whole = _gen_batch(np.arange(40), 7)
    parts = [_gen_batch(np.arange(0, 13), 7), _gen_batch(np.arange(13, 40), 7)]
    import pandas as pd

    rejoined = pd.concat(parts, ignore_index=True)
    pd.testing.assert_frame_equal(whole, rejoined)


def test_integers_matches_choice_stream():
    """The numpy contract the round-6 rewrite relies on: for p=None,
    replace=True, Generator.choice(n, size) consumes the identical
    underlying stream as Generator.integers(0, n, size)."""
    for seed in (0, 1, 42):
        r1 = np.random.default_rng(np.random.SeedSequence([seed, 3, 1]))
        r2 = np.random.default_rng(np.random.SeedSequence([seed, 3, 1]))
        for size in (1, 4, 8, 20):
            a = r1.choice(57, size=size)
            b = r2.integers(0, 57, size=size)
            assert a.dtype == b.dtype and (a == b).all()
