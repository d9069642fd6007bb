"""Text-analysis functions for large-scale training-data pipelines.

All hot-path functions are pure Catalyst column expressions (JVM-side,
whole-stage-codegen friendly, portable to an ANSI-SQL oracle); nothing
here ships rows through Python.

- token counting      (whitespace + a BPE-ish word/punct regex)
- language ID         (stopword-occurrence n-gram heuristic)
- quality scoring     (length / alphabetic ratio / stopword ratio)
- document fingerprint (md5 of normalized content; rolling-hash
  winnowing fingerprints live in operators/fingerprint.py)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


from fastqdedup_spark.functions import as_column as _c


def token_count(col: "str | Column") -> Column:
    """Whitespace token count; NULL/empty/blank -> 0 (the coalesce
    matters: without it NULL text propagates NULL through the length
    arithmetic and silently falls out of BOTH sides of any
    token_count(c) >= k filter). Portable formula: non-space char runs
    = spaces-collapsed length arithmetic."""
    trimmed = F.trim(F.coalesce(_c(col), F.lit("")))
    collapsed = F.regexp_replace(trimmed, r"\s+", " ")
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.length(collapsed) - F.length(F.replace(collapsed, F.lit(" "), F.lit(""))) + 1
    )


def bpe_ish_token_count(col: "str | Column") -> Column:
    """Sub-word-ish token count: splits letter runs, digit runs, and
    individual punctuation (a cheap proxy for BPE pre-tokenization)."""
    s = _c(col)
    # count boundaries: each match of (letters+|digits+|single non-space punct)
    return F.size(
        F.filter(
            F.split(
                F.regexp_replace(s, r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])", "$1\x1f"),
                "\x1f",
            ),
            lambda t: F.trim(t) != "",
        )
    )


_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que"],
    "es": ["el", "la", "los", "que", "es", "una", "por", "con"],
}


def _stopword_hits(col: Column, words: list[str]) -> Column:
    """Total occurrences of ` word ` in the space-padded lowered text.
    Portable: (len(s) - len(replace(s, kw))) / len(kw), summed.

    Whitespace runs collapse to TWO spaces so each token gets its own
    surrounding pads: with single spaces, consecutive occurrences of
    the same stopword ("the the") share the middle space, replace()
    only removes non-overlapping matches, and exactly the degenerate
    repetitive documents this heuristic must judge undercounted their
    stopword density. The q09/q10 oracle SQL pads identically."""
    padded = F.concat(
        F.lit(" "), F.regexp_replace(F.lower(col), r"\s+", "  "), F.lit(" ")
    )
    hits = F.lit(0)
    for w in words:
        kw = f" {w} "
        hits = hits + (F.length(padded) - F.length(F.replace(padded, F.lit(kw)))) / len(kw)
    return hits.cast("int")


def lang_id(col: "str | Column") -> Column:
    """Heuristic language ID over the stopword table; 'und' when no
    stopword hits at all. Deterministic argmax with fixed tie order
    en > de > fr > es (expressible identically in ANSI SQL)."""
    s = _c(col)
    sc = {lang: _stopword_hits(s, ws) for lang, ws in _STOPWORDS.items()}
    return (
        F.when(
            (sc["en"] >= sc["de"]) & (sc["en"] >= sc["fr"]) & (sc["en"] >= sc["es"]) & (sc["en"] > 0),
            F.lit("en"),
        )
        .when((sc["de"] >= sc["fr"]) & (sc["de"] >= sc["es"]) & (sc["de"] > 0), F.lit("de"))
        .when((sc["fr"] >= sc["es"]) & (sc["fr"] > 0), F.lit("fr"))
        .when(sc["es"] > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )


def quality_score(col: "str | Column") -> Column:
    """[0,1] quality heuristic: alphabetic ratio x length factor x
    stopword presence. Deterministic, portable arithmetic only."""
    s = _c(col)
    n = F.length(s)
    alpha = F.length(F.regexp_replace(s, r"[^A-Za-z]", ""))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    len_factor = F.least(n / F.lit(200.0), F.lit(1.0))
    stop_ratio = F.least(
        _stopword_hits(s, _STOPWORDS["en"]) / F.greatest(token_count(s), F.lit(1)),
        F.lit(1.0),
    )
    return F.round(alpha_ratio * 0.5 + len_factor * 0.3 + stop_ratio * 0.2, 6)


def doc_fingerprint(col: "str | Column") -> Column:
    """Whole-document fingerprint: md5 of whitespace-normalized lowered
    content (md5 exists in both Spark and DuckDB — oracle-checkable)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " ")))
