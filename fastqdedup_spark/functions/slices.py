"""Dedup-key projection from slice specs (reference O4).

Re-implements `length_string_to_slices` and `joinfunc_from_check_slices`
(/root/reference/src/fastqdedup/__init__.py:364-375, 160-167): the CLI
`--check-lengths` syntax ("8", "8,8", "5:8,3,-5:3:-1", "::16") parses to
Python slices; the dedup key is the concatenation of each input
column's slice.

Spark-side projection is a vectorized pandas UDF using pandas
`.str.slice` (NumPy-level, full Python slice semantics incl. negative
indices and steps); simple prefix slices (stop-only) compile to pure
Catalyst `substring` instead.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column


def length_string_to_slices(check_lengths: str) -> list[slice]:
    """"5:8,3,-5:3:-1" -> [slice(5,8), slice(3), slice(-5,3,-1)].
    Same grammar as the reference: comma-separated items, each either a
    stop integer or a colon slice with optional/None parts."""
    slices = []
    for part in check_lengths.split(","):
        if ":" not in part:
            slices.append(slice(int(part)))
            continue
        fields = part.split(":")
        if len(fields) > 3:
            raise ValueError(f"invalid slice spec: {part!r}")
        vals = [None if f in ("", "None") else int(f) for f in fields]
        vals += [None] * (3 - len(vals))
        slices.append(slice(*vals))
    return slices


def key_projection(columns: list[str], slices: list[slice] | None) -> Column:
    """Dedup-key column: concat of (optionally sliced) input columns.

    slices[i] applies to columns[i] (extra columns pass through whole,
    mirroring zip_longest semantics in the reference's joinfunc). All
    stop-only slices compile to JVM `substring`; anything fancier runs
    in one Arrow-vectorized pandas UDF."""
    if not slices:
        return F.concat(*[F.col(c) for c in columns])
    padded: list[slice | None] = list(slices) + [None] * (len(columns) - len(slices))
    simple = all(
        s is None or (s.start is None and s.step is None and (s.stop or 0) >= 0)
        for s in padded
    )
    if simple:
        # a stop-less slice (":" / "::" in the spec -> slice(None)) is
        # a whole-column pass-through — substring(col, 1, None) is a
        # plan-build type error, not "to the end"
        parts = [
            F.col(c) if s is None or s.stop is None
            else F.substring(F.col(c), 1, s.stop)
            for c, s in zip(columns, padded)
        ]
        return F.concat(*parts)

    @F.pandas_udf(T.StringType())
    def project(*cols: pd.Series) -> pd.Series:
        out = None
        for series, s in zip(cols, padded):
            piece = series if s is None else series.str.slice(s.start, s.stop, s.step)
            out = piece if out is None else out + piece
        return out

    return project(*[F.col(c) for c in columns])
