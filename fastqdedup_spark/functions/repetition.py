"""Repetition / degenerate-text filters for training-data pipelines.

Gopher-style repetition gates (Rae et al. 2021, "Scaling Language
Models: ... Gopher", table A1): documents dominated by a few repeated
words or n-grams are low-quality training text even when they pass
length/alphabetic checks. The reference engine has no analog — this is
part of the graft's LLM-pipeline operator set alongside
functions/text.py (token count / lang-id / quality score).

Scale design: every metric here is a PER-ROW column expression built
from higher-order array functions — `array_sort` + a run-length
`aggregate` lambda over the sorted words. No explode, no groupBy, no
shuffle, no Python: the whole thing is one whole-stage-codegen
projection over the scan, so at 100 TB it runs at scan speed with
column pruning down to (id, text). The alternative explode +
groupBy(doc, word) shape shuffles one row per distinct (doc, word) —
strictly worse for a per-document statistic.

Per-word-run cost is O(n log n) (the sort) in words-per-doc, not the
O(n^2) a naive `filter(words, w -> w == x)` count-in-place would pay.

Metrics (all word-level; the synthetic corpus is single-line, so the
line/paragraph variants of the Gopher table would be degenerate here —
the word/bigram forms carry the same signal for code-ish content):

- n_words            total whitespace tokens (lowercased)
- dup_word_frac      1 - distinct/total   (Gopher "duplicate fraction")
- dup_char_frac      chars inside words occurring >1x / total word chars
- top_word_count     occurrences of the most frequent word
- top_bigram_frac    chars covered by the most frequent word bigram /
                     total word chars (ties -> lexicographically
                     smallest bigram, deterministic)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _words(col: Column) -> Column:
    """Sorted lowercased whitespace tokens; empties filtered."""
    return F.array_sort(
        F.filter(
            F.split(F.lower(F.coalesce(col, F.lit(""))), r"\s+"),
            lambda x: x != F.lit(""),
        )
    )


def _long(x) -> Column:
    return F.lit(x).cast("long") if not isinstance(x, Column) else x.cast("long")


def _run_length_stats(sorted_arr: Column) -> Column:
    """struct(dup_chars, top_run) via one pass over a sorted array.

    dup_chars = sum over runs with length r>1 of r*len(word);
    top_run   = max run length. Runs are contiguous in the sorted
    array, so a single aggregate with (prev, run) state suffices.
    """

    def step(acc: Column, w: Column) -> Column:
        same = acc["prev"] == w
        run2 = F.when(same, acc["run"] + 1).otherwise(_long(1))
        # a run's chars enter dup_chars exactly when it reaches 2
        # (r*len once) and then +len per further repeat — equivalent
        # to r*len at finalize, but needs no end-of-array epilogue
        add = F.when(run2 == 2, 2 * F.length(w)).otherwise(
            F.when(run2 > 2, F.length(w)).otherwise(F.lit(0))
        )
        return F.struct(
            w.alias("prev"),
            run2.alias("run"),
            (acc["dup_chars"] + add.cast("long")).alias("dup_chars"),
            F.greatest(acc["top"], run2).alias("top"),
        )

    zero = F.struct(
        F.lit("").alias("prev"),
        _long(0).alias("run"),
        _long(0).alias("dup_chars"),
        _long(0).alias("top"),
    )
    return F.aggregate(
        sorted_arr,
        zero,
        step,
        lambda acc: F.struct(
            acc["dup_chars"].alias("dup_chars"), acc["top"].alias("top")
        ),
    )


def _top_bigram(sorted_bigrams: Column) -> Column:
    """struct(best_run, best_len) for the most frequent bigram.

    best_len = len(w1)+len(w2) of the winning bigram (the joining
    space excluded). Strict `>` keeps the FIRST bigram to reach the
    max run — the array is sorted ascending, so ties resolve to the
    lexicographically smallest bigram, matching the SQL oracle's
    ORDER BY count DESC, bigram ASC.
    """

    def step(acc: Column, w: Column) -> Column:
        run2 = F.when(acc["prev"] == w, acc["run"] + 1).otherwise(_long(1))
        better = run2 > acc["best_run"]
        return F.struct(
            w.alias("prev"),
            run2.alias("run"),
            F.when(better, run2).otherwise(acc["best_run"]).alias("best_run"),
            F.when(better, (F.length(w) - 1).cast("long"))
            .otherwise(acc["best_len"])
            .alias("best_len"),
        )

    zero = F.struct(
        F.lit("").alias("prev"),
        _long(0).alias("run"),
        _long(0).alias("best_run"),
        _long(0).alias("best_len"),
    )
    return F.aggregate(
        sorted_bigrams,
        zero,
        step,
        lambda acc: F.struct(
            acc["best_run"].alias("best_run"), acc["best_len"].alias("best_len")
        ),
    )


def word_repetition_stats(col: "str | Column") -> Column:
    """struct(n_words, dup_word_frac, dup_char_frac, top_word_count,
    top_bigram_frac) — see module docstring. Fractions rounded to 6
    places (the repo-wide double-hashing convention)."""
    from fastqdedup_spark.functions import as_column

    c = as_column(col)
    words = _words(c)
    n = F.size(words).cast("long")
    n_distinct = F.size(F.array_distinct(words)).cast("long")
    total_chars = F.length(F.concat_ws("", words)).cast("long")
    rl = _run_length_stats(words)
    # adjacent word pairs of the ORIGINAL order would be the textual
    # bigrams; repetition doesn't care about position, but the bigram
    # stream must be built pre-sort. Rebuild unsorted words once.
    raw = F.filter(
        F.split(F.lower(F.coalesce(c, F.lit(""))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    m = F.size(raw)
    bigrams = F.array_sort(
        F.zip_with(
            F.slice(raw, 1, F.greatest(m - 1, F.lit(0))),
            F.slice(raw, 2, F.greatest(m - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    )
    bg = _top_bigram(bigrams)
    frac = lambda num, den: F.round(
        F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)), 6
    )
    return F.struct(
        n.alias("n_words"),
        frac((n - n_distinct), n).alias("dup_word_frac"),
        frac(rl["dup_chars"], total_chars).alias("dup_char_frac"),
        rl["top"].alias("top_word_count"),
        frac(bg["best_run"] * bg["best_len"], total_chars).alias(
            "top_bigram_frac"
        ),
    )
