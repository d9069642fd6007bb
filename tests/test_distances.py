"""Scalar distance-kernel parity with the reference test matrix
(/root/reference/tests/test__distance.py:22-60)."""

import pytest

from fastqdedup_spark import within_distance
from fastqdedup_spark.functions.distances import (
    within_edit_distance,
    within_hamming_distance,
)

HAMMING_CASES = [
    ("AAAA", "AAAA", 0, True),
    ("AAAA", "AAAT", 0, False),
    ("AAAA", "AAAT", 1, True),
    ("AAAA", "TTTT", 3, False),
    ("AAAA", "TTTT", 4, True),
    ("AAAA", "AAA", 4, False),  # unequal length: never Hamming-equal
    ("", "", 0, True),
]

EDIT_CASES = [
    ("AAAA", "AAAA", 0, True),
    ("AAAA", "AAAT", 0, False),
    ("AAAA", "AAAT", 1, True),
    ("AAAA", "AAA", 1, True),     # deletion
    ("AAAA", "AAAAA", 1, True),   # insertion
    ("AAAA", "AAA", 0, False),
    ("AAAA", "TAAAT", 2, True),
    ("AAAA", "TAAAT", 1, False),
    ("GC", "AAAGC", 3, True),
    ("GC", "AAAGC", 2, False),
    ("GATTACA", "GACCACA", 2, True),
    ("GATTACA", "GACCACA", 1, False),
    ("GATTACA", "GATTAA", 1, True),
    ("GATTACA", "ATTAC", 2, True),
    ("UU", "GATTA", 5, True),
    ("UU", "GATTA", 4, False),
    ("kitten", "sitting", 3, True),
    ("kitten", "sitting", 2, False),
]


@pytest.mark.parametrize("s1,s2,d,expected", HAMMING_CASES)
def test_hamming(s1, s2, d, expected):
    assert within_hamming_distance(s1, s2, d) is expected
    assert within_distance(s1, s2, d, use_edit_distance=False) is expected


@pytest.mark.parametrize("s1,s2,d,expected", EDIT_CASES)
def test_edit(s1, s2, d, expected):
    assert within_edit_distance(s1, s2, d) is expected
    assert within_edit_distance(s2, s1, d) is expected  # symmetric


def test_edit_exhaustive_vs_dp():
    """Cross-check the banded DP against a plain full Levenshtein."""
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    alphabet = "AB"
    strings = [
        "".join(p)
        for n in range(0, 4)
        for p in itertools.product(alphabet, repeat=n)
    ]
    for a in strings:
        for b in strings:
            for d in range(0, 4):
                assert within_edit_distance(a, b, d) == (lev(a, b) <= d), (a, b, d)
