"""Candidate-pair verification (SURVEY.md M4) — keeps precision exact.

Re-grounds the reference's per-pair distance kernels
(/root/reference/src/fastqdedup/distances.h:8-88, exposed as
`within_distance`, _distancemodule.c:46-93) as Arrow-vectorized pandas
UDFs over candidate-pair DataFrames. Cheap-to-expensive ordering
mirrors the reference's fast-fail style: length prune, then vectorized
Hamming, then banded DP / shingle intersection only for survivors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from fastqdedup_spark.config import DedupConfig
from fastqdedup_spark.functions.distances import make_within_distance_udf
from fastqdedup_spark.functions.minhash import shingle_window_hashes


def _attach_pair_values(
    pairs: DataFrame, values: DataFrame, id_col: str, value_col: str
) -> DataFrame:
    """(id_a, id_b) + (id, value) -> (id_a, id_b, value_a, value_b).
    Two equi-joins on the id; at scale both sides hash-partition on the
    join key and AQE broadcasts `values` when it is small."""
    va = values.select(F.col(id_col).alias("id_a"), F.col(value_col).alias("value_a"))
    vb = values.select(F.col(id_col).alias("id_b"), F.col(value_col).alias("value_b"))
    return pairs.join(va, "id_a").join(vb, "id_b")


def verify_pairs_distance(
    pairs: DataFrame, keys: DataFrame, cfg: DedupConfig,
    id_col: str = "key", key_col: str = "key",
) -> DataFrame:
    """Reference-parity verification: keep pairs within
    Hamming/Levenshtein radius. Returns (id_a, id_b)."""
    udf = make_within_distance_udf(cfg.max_distance, cfg.use_edit_distance)
    withv = _attach_pair_values(pairs, keys, id_col, key_col)
    return withv.filter(udf("value_a", "value_b")).select("id_a", "id_b")


def make_jaccard_udf(k: int):
    """Exact Jaccard over char-k-gram shingle sets of two text columns.

    Shingle hashing is batch-vectorized (one buffer pass per column via
    functions.minhash.shingle_window_hashes); the per-pair set
    intersection uses numpy set ops on the hashed shingles.
    """

    @F.pandas_udf(T.DoubleType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        ha, sa, ca = shingle_window_hashes(a.fillna(""), k)
        hb, sb, cb = shingle_window_hashes(b.fillna(""), k)
        out = np.zeros(len(a), dtype=np.float64)
        for i in range(len(a)):
            xs = np.unique(ha[sa[i] : sa[i] + ca[i]])
            ys = np.unique(hb[sb[i] : sb[i] + cb[i]])
            if not len(xs) and not len(ys):
                out[i] = 1.0  # both empty: identical
                continue
            inter = len(np.intersect1d(xs, ys, assume_unique=True))
            out[i] = inter / (len(xs) + len(ys) - inter)
        return pd.Series(out)

    return _udf


def verify_pairs_jaccard(
    pairs: DataFrame, contents: DataFrame, cfg: DedupConfig,
    id_col: str = "sha", content_col: str = "content_norm",
) -> DataFrame:
    """Code-domain verification: exact Jaccard >= threshold on
    normalized content. Returns (id_a, id_b, jaccard)."""
    jac = make_jaccard_udf(cfg.shingle_k)
    withv = _attach_pair_values(pairs, contents, id_col, content_col)
    return (
        withv.withColumn("jaccard", jac("value_a", "value_b"))
        .filter(F.col("jaccard") >= cfg.jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
