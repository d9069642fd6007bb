"""Boilerplate detection & stripping — attacking semantic skew at the
source instead of managing it downstream.

The hot-band problem (north_rule) exists because license headers and
generated preambles appear verbatim in a large fraction of files,
dragging pairwise Jaccard of UNRELATED files up to ~0.2 and flooding
LSH bands with quadratic junk candidates. The est-prefilter makes that
flood cheap; this pass makes it small: lines occurring in more than
`doc_frac` of documents are identified with one aggregation and removed
from the normalized content before shingling.

Shape: explode lines -> per-line distinct-doc counts (one shuffle,
partial-aggregated) -> broadcast the (tiny) common-line set -> filter
each document's lines JVM-side (split + filter + array_join, no UDF).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame


def common_lines(
    df: DataFrame, content_col: str = "content", doc_frac: float = 0.2,
    min_line_chars: int = 8, max_lines: int = 1000,
) -> DataFrame:
    """Lines (trimmed) present in more than `doc_frac` of documents.
    Returns a small DataFrame (line string, n_docs long)."""
    n_docs = df.count()
    lines = df.select(
        F.monotonically_increasing_id().alias("_doc"),
        F.explode(F.split(F.col(content_col), "\n")).alias("line"),
    ).select("_doc", F.trim("line").alias("line")).filter(
        F.length("line") >= min_line_chars
    )
    return (
        lines.distinct()  # count each line once per doc
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > int(doc_frac * n_docs))
        # `line` tiebreak: a license header's lines all share one
        # n_docs, so a bare desc(n_docs) limit would cut inside the tie
        # group ARBITRARILY per run — two reruns would strip different
        # line sets and the pipeline's rerun-stability contract breaks
        # at the shingle level
        .orderBy(F.desc("n_docs"), "line")
        .limit(max_lines)
    )


def strip_boilerplate(
    df: DataFrame, boiler: DataFrame, content_col: str = "content",
    out_col: str = "content_stripped",
) -> DataFrame:
    """Removes every boilerplate line from `content_col` (whole-line,
    trim-matched). The line set (bounded by common_lines' max_lines) is
    a broadcast variable probed as a hash set inside one Arrow-batched
    UDF — O(1) per line and zero plan bloat, vs. the previous literal
    F.array in the plan that codegen linear-scanned per line and that
    grew the plan itself with the cap. Map-side: no shuffle, no join."""
    lines = frozenset(r.line for r in boiler.collect())
    if not lines:
        return df.withColumn(out_col, F.col(content_col))
    bc = df.sparkSession.sparkContext.broadcast(lines)

    @F.pandas_udf(T.StringType())
    def strip(col: pd.Series) -> pd.Series:
        s = bc.value
        return col.map(
            lambda t: "\n".join(
                ln for ln in (t or "").split("\n") if ln.strip() not in s
            )
        )

    return df.withColumn(out_col, strip(F.col(content_col)))
