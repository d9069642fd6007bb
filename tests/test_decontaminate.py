"""Benchmark decontamination (operators/decontaminate.py)."""

import pyspark.sql.functions as F

from fastqdedup_spark.operators.decontaminate import decontaminate, word_ngrams


def test_word_ngrams_basics(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("",), ("x x x",)], "t string"
    )
    got = [r[0] for r in df.select(word_ngrams("t", 3)).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []  # shorter than n -> empty, not a descending range
    assert got[2] == []
    assert got[3] == ["x x x"]  # distinct


def test_decontaminate_flags_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a totally different sentence with no overlap at all"),
            (3, "prefix words then the quick brown fox jumps again"),
            (4, "tiny"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "we saw the quick brown fox jumps yesterday")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["n_contaminated"], r["contaminated"])
        for r in decontaminate(docs, bench, n=5).collect()
    }
    # doc 1 shares "the quick brown fox jumps" and "quick brown fox
    # jumps over"? bench has "the quick brown fox jumps" and "quick
    # brown fox jumps yesterday" ... only the first is shared
    assert rows[1] == (1, True)
    assert rows[2] == (0, False)
    assert rows[3] == (1, True)
    assert rows[4] == (0, False)


def test_bench_side_is_broadcast(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(2, "a b c d e")], "doc_id long, text string")
    plan = (
        decontaminate(docs, bench, n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the corpus side must meet the benchmark grams in a broadcast
    # hash join — a sort-merge join THERE would shuffle every (doc,
    # gram) row of the full corpus. (The final doc_id left join against
    # the tiny hits table is planned SMJ pre-execution and converted by
    # AQE at runtime; only the gram join shape is load-bearing.)
    assert "BroadcastHashJoin [g#" in plan
    assert "SortMergeJoin [g#" not in plan
