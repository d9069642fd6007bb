"""Quality-filter predicates.

Reference: `average_error_rate(phred_scores, phred_offset)` C kernel
(/root/reference/src/fastqdedup/_fastqmodule.c:38-76) backed by a
`10**(-q/10)` lookup table (/root/reference/score_to_error_rate.py:6-8),
applied as a filter at __init__.py:235,247-250.

Here the lookup table is a numpy array and the kernel is a vectorized
pandas UDF; the graft's code-domain analogs (content size caps, binary
detection, lang whitelist) are pure Spark SQL expressions in
`content_quality_filter`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column, DataFrame

# phred q -> error probability, q in [0, 126] (covers all printable ASCII)
_SCORE_TO_ERROR_RATE = 10.0 ** -(np.arange(127) / 10.0)


def average_error_rate(phred_scores: str, phred_offset: int = 33) -> float:
    """Scalar parity kernel: mean per-base error probability."""
    codes = np.frombuffer(phred_scores.encode("ascii"), dtype=np.uint8)
    qs = codes.astype(np.int64) - phred_offset
    if len(qs) and (qs.min() < 0 or qs.max() > 93):
        raise ValueError(
            f"Character outside of valid phred range found: {phred_scores!r}"
        )
    if not len(qs):
        return 0.0
    return float(_SCORE_TO_ERROR_RATE[qs].mean())


@F.pandas_udf(T.DoubleType())
def average_error_rate_udf(scores: pd.Series) -> pd.Series:
    """Vectorized over a whole Arrow batch: one bytes-concat, one
    reduceat — no per-row Python."""
    offset = 33
    lens = scores.str.len().to_numpy()
    blob = np.frombuffer("".join(scores).encode("ascii"), dtype=np.uint8)
    qs = blob.astype(np.int64) - offset
    # same range check as the scalar kernel (and the reference C
    # kernel, _fastqmodule.c:56-63): without it a below-offset char
    # (q < 0) would numpy-NEGATIVE-INDEX-wrap into the high end of the
    # lookup table and score a corrupt read ~error-free instead of
    # raising — the two kernels must agree on invalid data too
    if len(qs) and (qs.min() < 0 or qs.max() > 93):
        raise ValueError("Character outside of valid phred range found")
    rates = _SCORE_TO_ERROR_RATE[qs]
    starts = np.zeros(len(scores), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    # reduceat only over non-empty rows (a trailing empty row's offset
    # equals len(rates) and would raise; interior ones corrupt nothing
    # but keep the handling uniform)
    sums = np.zeros(len(scores), dtype=np.float64)
    nonempty = np.nonzero(lens > 0)[0]
    if len(nonempty):
        sums[nonempty] = np.add.reduceat(rates, starts[nonempty])
    return pd.Series(sums / np.maximum(lens, 1))


def content_quality_filter(
    df: DataFrame,
    max_bytes: int = 1_000_000,
    min_chars: int = 1,
    langs: list[str] | None = None,
    content_col: str = "content",
) -> DataFrame:
    """Graft analog of the reference's error-rate filter (O3): drop
    oversized, empty, binary-looking, or non-whitelisted-language files.
    Pure Catalyst expressions — pushed into the scan where possible.
    """
    cond: Column = (F.length(content_col) >= min_chars) & (
        F.octet_length(content_col) <= max_bytes
    )
    # binary heuristic: NUL byte present
    cond = cond & ~F.col(content_col).contains("\x00")
    if langs:
        cond = cond & F.col("lang").isin(langs)
    return df.filter(cond)
