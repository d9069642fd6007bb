"""C4-style segment dedup (operators/segment_dedup.py) vs a
pure-Python oracle: window segmentation, corpus-wide removal at the
min_docs threshold, in-order re-assembly, exact/hash key-mode
equivalence."""

import pyspark.sql.functions as F
import pytest

from fastqdedup_spark.operators.segment_dedup import (
    segment_dedup,
    segment_windows,
)


def _oracle(rows, window_words, min_docs):
    per, where = {}, {}
    for did, text in rows:
        words = text.split(" ")
        segs = [
            " ".join(words[i : i + window_words])
            for i in range(0, len(words), window_words)
        ]
        per[did] = segs
        for s in set(segs):
            where.setdefault(s, set()).add(did)
    return {
        did: (
            len(segs),
            sum(1 for s in segs if len(where[s]) >= min_docs),
            " ".join(s for s in segs if len(where[s]) < min_docs),
        )
        for did, segs in per.items()
    }


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_segments"], r["n_dup_segments"], r["cleaned_text"])
        for r in segment_dedup(df, **kw).collect()
    }


CORPUS = [
    # docs 1/2 share their first 4-word window; doc 3 shares its
    # SECOND window with doc 1's second; doc 4 is unique; doc 5 is all
    # shared material (cleaned to ''); short tail windows everywhere
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox sat on a mat"),
    (3, "completely unrelated words here jumps over the lazy dog"),
    (4, "nothing here repeats anywhere at all"),
    (5, "the quick brown fox jumps over the lazy dog"),
]


def test_matches_oracle_and_kept_order(spark):
    for w in (4, 3, 100):
        got = _run(spark, CORPUS, window_words=w, min_docs=2)
        assert got == _oracle(CORPUS, w, 2), f"window_words={w}"
    # w=100: whole docs are one segment -> exact doc dedup semantics
    whole = _run(spark, CORPUS, window_words=100, min_docs=2)
    assert whole[1] == (1, 1, "")  # doc 1 == doc 5
    assert whole[4][1] == 0


def test_min_docs_threshold(spark):
    # the shared window appears in 3 docs: survives min_docs=4,
    # removed at min_docs=3 and 2
    rows = [(i, "alpha beta gamma delta tail" + str(i)) for i in range(3)]
    for md, ndup in ((4, 0), (3, 1), (2, 1)):
        got = _run(spark, rows, window_words=4, min_docs=md)
        assert got == _oracle(rows, 4, md)
        assert got[0][1] == ndup
    with pytest.raises(ValueError):
        _run(spark, rows, min_docs=1)  # would delete every segment


def test_hash_mode_equals_exact_mode(spark):
    exact = _run(spark, CORPUS, window_words=4, mode="exact")
    hashed = _run(spark, CORPUS, window_words=4, mode="hash")
    assert exact == hashed
    with pytest.raises(ValueError):
        _run(spark, CORPUS, mode="fnv")


def test_partition_count_invariance(spark):
    rows = [
        (i, " ".join(f"w{(i * j) % 7}" for j in range(1, 30)))
        for i in range(40)
    ]
    want = _oracle(rows, 5, 2)
    for npart in (1, 3, 32):
        assert _run(spark, rows, window_words=5, npart=npart) == want


def test_seeded_fuzz_corpus_matches_oracle(spark):
    """320-doc seeded random corpus over a 30-word vocabulary (dense
    natural cross-doc window collisions) + 20 planted exact copies —
    one Spark run against the pure-Python oracle."""
    import random

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 60))))
        for i in range(300)
    ]
    rows += [(1000 + i, rows[i][1]) for i in range(20)]
    assert _run(spark, rows, window_words=8) == _oracle(rows, 8, 2)


def test_content_crosses_one_detection_exchange(spark):
    """In hash key mode the raw segment strings must cross exactly ONE
    exchange (the join side's key repartition): the frequency branch
    column-prunes to (key, doc) before its exchange, and the
    re-assembly exchange carries map-side-packed aggregation buffers,
    not a raw seg column. A second raw-content exchange (e.g. the
    count-distinct losing the subset-clustering satisfaction, or the
    pruning regressing) is what this pins against."""
    import re

    from fastqdedup_spark.plans import formatted_plan

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    plan = formatted_plan(segment_dedup(df, window_words=4, mode="hash", npart=4))
    blocks = [
        b
        for b in plan.split("\n\n")
        if re.match(r"\(\d+\) Exchange", b.strip())
    ]
    assert blocks, "no exchange detail blocks found"
    content_bearing = [b for b in blocks if re.search(r"\bseg#\d", b)]
    assert len(content_bearing) == 1, plan


def test_segment_windows_expression(spark):
    df = spark.createDataFrame([("a b c d e",), ("x",), ("",)], "t string")
    got = [r[0] for r in df.select(segment_windows("t", 2)).collect()]
    assert got == [["a b", "c d", "e"], ["x"], [""]]
    with pytest.raises(ValueError):
        segment_windows("t", 0)
