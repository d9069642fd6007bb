"""Gopher-style repetition gates (functions/repetition.py).

Hand-computed fixtures pin every metric; a brute-force Python
recompute cross-checks the run-length `aggregate` expressions on
randomized word streams (the sorted-array run-length trick must agree
with a plain Counter).
"""

import random
from collections import Counter

import pyspark.sql.functions as F

from fastqdedup_spark.functions.repetition import word_repetition_stats


def _stats(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    rows = df.select(word_repetition_stats("t").alias("r")).select("r.*").collect()
    return [r.asDict() for r in rows]


def test_hand_computed_cases(spark):
    got = _stats(
        spark,
        [
            "",  # empty -> all zeros
            "   ",  # whitespace only
            "Hello hello HELLO",  # case-folds to one word x3
            "the cat sat on the mat the cat",
            "a b c",  # all unique
        ],
    )
    assert got[0] == got[1] == {
        "n_words": 0,
        "dup_word_frac": 0.0,
        "dup_char_frac": 0.0,
        "top_word_count": 0,
        "top_bigram_frac": 0.0,
    }
    # 3x "hello": dup 2/3; all 15 chars duplicated; bigram "hello hello"
    # occurs twice, covering 2*10/15 chars counting overlaps (the
    # metric deliberately double-counts overlap — a repetition score,
    # not a strict fraction, so degenerate docs can exceed 1.0)
    assert got[2] == {
        "n_words": 3,
        "dup_word_frac": round(2 / 3, 6),
        "dup_char_frac": 1.0,
        "top_word_count": 3,
        "top_bigram_frac": round(20 / 15, 6),
    }
    # the(x3,3ch) cat(x2,3ch) sat on mat -> dup_chars 15 / total 23;
    # top bigram "the cat" x2, 6 chars
    assert got[3] == {
        "n_words": 8,
        "dup_word_frac": round(3 / 8, 6),
        "dup_char_frac": round(15 / 23, 6),
        "top_word_count": 3,
        "top_bigram_frac": round(12 / 23, 6),
    }
    assert got[4] == {
        "n_words": 3,
        "dup_word_frac": 0.0,
        "dup_char_frac": 0.0,
        "top_word_count": 1,
        # every bigram unique -> the lexicographically smallest ("a b",
        # 2 chars) wins the tie at count 1
        "top_bigram_frac": round(2 / 3, 6),
    }


def test_bigram_tiebreak_is_lexicographic(spark):
    # "b b", "b a", "a a" all occur once; smallest ("a a") must win on
    # both the Spark side (strict-> over the ascending sort) and the
    # SQL oracle (ORDER BY c DESC, b ASC) — len("a a")-1 = 2 chars
    (row,) = _stats(spark, ["b b a a"])
    assert row["top_bigram_frac"] == round(1 * 2 / 4, 6)


def test_matches_bruteforce_counter(spark):
    rng = random.Random(42)
    vocab = ["x", "yy", "zzz", "wwww", "q"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40)))
        for _ in range(50)
    ]
    got = _stats(spark, texts)
    for text, r in zip(texts, got):
        words = [w for w in text.lower().split() if w]
        wc = Counter(words)
        total_chars = sum(len(w) for w in words)
        bigrams = Counter(
            f"{a} {b}" for a, b in zip(words, words[1:])
        )
        assert r["n_words"] == len(words)
        if words:
            assert r["dup_word_frac"] == round(1 - len(wc) / len(words), 6)
            dup_chars = sum(c * len(w) for w, c in wc.items() if c > 1)
            assert r["dup_char_frac"] == round(dup_chars / total_chars, 6)
            assert r["top_word_count"] == max(wc.values())
        if bigrams:
            best = min(bigrams, key=lambda b: (-bigrams[b], b))
            assert r["top_bigram_frac"] == round(
                bigrams[best] * (len(best) - 1) / total_chars, 6
            )
        elif words:
            assert r["top_bigram_frac"] == 0.0


def test_plan_is_single_projection_no_shuffle(spark):
    # the 100 TB property: one projection over the scan — no Exchange,
    # no Python nodes (BatchEvalPython/ArrowEvalPython), pruned scan
    df = spark.createDataFrame([("a a b",)], "t string").select(
        word_repetition_stats("t").alias("r")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
