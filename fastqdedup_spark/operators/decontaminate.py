"""Benchmark decontamination for training-data pipelines.

Before training, any document sharing a long-enough word n-gram with
an evaluation benchmark must be flagged/dropped (GPT-3 appendix C,
Llama 2 A.6 both use 8-13-gram overlap). The reference engine has no
analog — this extends the graft's LLM-pipeline operator set.

Scale design: the benchmark side is SMALL (eval suites are thousands
of documents; the corpus is the 100 TB side), so the distinct
benchmark n-grams are broadcast and the corpus side never shuffles:

    corpus -> per-row n-gram array (one codegen projection)
           -> explode (no exchange)
           -> broadcast hash join against bench n-grams
           -> partial-agg count per doc (the only shuffle, and it
              carries ONLY contaminated (doc, gram) hits - at real
              contamination rates that is ~0 rows, not the corpus)

The n-gram array is built entirely with Catalyst higher-order
functions (sequence + transform + slice + concat_ws): no Python in
either path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Column


def word_ngrams(col: "str | Column", n: int) -> Column:
    """Array of space-joined word n-grams of the lowercased text;
    empty array when the doc has fewer than n words. Distinct grams
    (matching the oracle's set semantics)."""
    from fastqdedup_spark.functions import as_column

    c = as_column(col)
    words = F.filter(
        F.split(F.lower(F.coalesce(c, F.lit(""))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    m = F.size(words)
    grams = F.when(
        m >= n,
        F.transform(
            # sequence(1, 0) would flip to a DESCENDING range, so the
            # short-doc case must be guarded out before sequence runs
            F.sequence(F.lit(1), m - n + 1),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """(id_col, n_contaminated, contaminated) per corpus document:
    n_contaminated = distinct word n-grams shared with ANY benchmark
    document. Benchmark docs present in the corpus flag themselves —
    exactly the point (their dup family is contamination too)."""
    from fastqdedup_spark.functions.partitioning import widen_small_input

    bgrams = (
        bench.select(
            F.explode(word_ngrams(bench_text_col or text_col, n)).alias("g")
        )
        .distinct()
    )
    # the corpus-side gram build + broadcast join + partial agg ALL ride
    # the scan stage (the broadcast join adds no exchange): widen a tiny
    # single-row-group scan so that work runs at session width instead
    # of 1-2 partitions (no-op at real scale)
    dgrams = widen_small_input(docs).select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("g")
    )
    hits = (
        dgrams.join(F.broadcast(bgrams), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_contaminated", F.lit(0)).cast("long").alias(
                "n_contaminated"
            ),
            (F.coalesce("n_contaminated", F.lit(0)) > 0).alias("contaminated"),
        )
    )
