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

    Batch optimizations (hub documents appear in MANY candidate pairs —
    the hot-band skew shape):
    - texts are factorized per Arrow batch, so each distinct document's
      shingle set is hashed and uniqued ONCE per batch, not once per pair;
    - intersections run via searchsorted on the pre-sorted unique arrays
      (no allocation, no re-sort) — the vectorized analog of the
      reference's fast-fail compare loop (distances.h:24-27).
    """

    @F.pandas_udf(T.DoubleType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        both = pd.concat([a.fillna(""), b.fillna("")], ignore_index=True)
        codes, uniques = pd.factorize(both)
        H, starts, counts = shingle_window_hashes(list(uniques), k)
        sets = [
            np.unique(H[starts[i] : starts[i] + counts[i]])
            for i in range(len(uniques))
        ]
        n = len(a)
        ca, cb = codes[:n], codes[n:]
        out = np.zeros(n, dtype=np.float64)
        for i in range(n):
            xs, ys = sets[ca[i]], sets[cb[i]]
            nx, ny = len(xs), len(ys)
            if not nx and not ny:
                out[i] = 1.0  # both empty: identical
                continue
            if not nx or not ny:
                continue
            if nx > ny:
                xs, ys, nx, ny = ys, xs, ny, nx
            idx = np.searchsorted(ys, xs)
            idx[idx == ny] = ny - 1
            inter = int(np.count_nonzero(ys[idx] == xs))
            out[i] = inter / (nx + ny - inter)
        return pd.Series(out)

    return _udf


def est_jaccard_matches(
    cfg: DedupConfig, sig_a: str = "sig_a", sig_b: str = "sig_b"
) -> "F.Column":
    """Matching-bin count between `sig_a`/`sig_b` packed-sketch columns
    via per-byte shift-compare on the packed longs: a flat codegen
    expression, no overflow-sensitive bit tricks (ANSI-safe).

    Perf note (measured, Spark 4.1, 5M rows x local[8]): this flat
    128-comparison chain runs at ~0.65 us/row inside whole-stage
    codegen. Do NOT "optimize" it into SWAR zero-byte collapses
    (masked OR-shift pyramids + bit_count): every such variant fell
    out of codegen and ran 20-30x SLOWER interpreted (57-75 s on the
    same input). Flat chains of simple comparisons are what Catalyst
    splits and compiles well.

    The terms MUST be summed as a BALANCED tree (depth log2(n), not a
    left-deep n-deep chain): janino compiles expression trees
    recursively, and a 128-level nested Add inside a broadcast-join
    consume function overflows its compiler stack — codegen fails for
    the WHOLE pair stage and Spark silently falls back to the
    interpreted path (measured: the full docs pipeline regressed 1.4x
    with the failure buried in the executor log)."""
    n_words = cfg.num_perm // 8
    terms = []
    for w in range(n_words):
        xa = F.element_at(sig_a, w + 1)
        xb = F.element_at(sig_b, w + 1)
        for byte in range(8):
            sh = 8 * byte
            terms.append(
                (
                    F.shiftrightunsigned(xa, sh).bitwiseAND(F.lit(255))
                    == F.shiftrightunsigned(xb, sh).bitwiseAND(F.lit(255))
                ).cast("int")
            )
    # pairwise-reduce to a balanced Add tree
    while len(terms) > 1:
        terms = [
            terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def est_prefilter(
    pairs: DataFrame, sigs: DataFrame, cfg: DedupConfig, id_col: str,
    keep_est: bool = False,
) -> DataFrame:
    """Estimated-Jaccard pre-filter (JVM-side): the semantic-skew pair
    flood (boilerplate headers -> quadratically many j~0.2 candidates)
    dies here before any shuffle, content, or Python is touched. The
    margin makes false drops statistically negligible (~4.6 sigma at
    j == threshold with 128 bins, P ~ 2e-6); the exact verify UDF keeps
    precision exact. `sigs` must carry (id_col, sig_packed).

    Map-side-ness is the point: with cfg.est_broadcast (default) the
    sketch table broadcasts EXPLICITLY, so the quadratic raw pair
    stream is filtered inside the same stage that produced it — it
    never hits an exchange. The knob is static configuration, not a
    mid-plan count() (no action, no barrier); beyond ~50M distinct
    contents flip it off and the joins run shuffled."""
    hint = F.broadcast if cfg.est_broadcast else (lambda df: df)
    ga = sigs.select(F.col(id_col).alias("id_a"), F.col("sig_packed").alias("sig_a"))
    gb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig_packed").alias("sig_b"))
    min_matches = int((cfg.jaccard_threshold - cfg.est_margin) * cfg.num_perm)
    # The zero-valued NON-DETERMINISTIC term pins the filter ABOVE the
    # est projection: Catalyst never pushes non-deterministic predicates
    # (and this one is a single comparison, so conjunct-splitting can't
    # peel a deterministic part off), so the 128-term expression is
    # evaluated in a Project — where whole-stage codegen
    # subexpression-splits it into small methods — instead of being
    # alias-substituted into the broadcast join CONDITION. A join
    # condition is generated as ONE inline blob: measured, it made
    # bhj_doConsume 57 KB of bytecode, which HotSpot refuses to JIT
    # ("Generated method too long to be JIT compiled"), and the whole
    # pair stage ran interpreted, 15x slower.
    nondet_zero = (F.rand(cfg.seed) * F.lit(0.0)).cast("int")
    out = (
        pairs.join(hint(ga), "id_a")
        .join(hint(gb), "id_b")
        .withColumn("est_matches", est_jaccard_matches(cfg))
        .filter((F.col("est_matches") + nondet_zero) >= min_matches)
    )
    cols = ["id_a", "id_b"] + (["est_matches"] if keep_est else [])
    return out.select(*cols)


def verify_pairs_jaccard(
    pairs: DataFrame, contents: DataFrame, cfg: DedupConfig,
    id_col: str = "sha", content_col: str = "content_norm",
    size_col: str | None = "n_shingles",
    skip_est: bool = False,
) -> DataFrame:
    """Code-domain verification: exact Jaccard >= threshold on
    normalized content. Returns (id_a, id_b, jaccard).

    When `size_col` (distinct-shingle counts from the signature stage)
    is available, pairs are pruned JVM-side BEFORE content ships to
    Python using the exact bound jaccard(A,B) <= min(|A|,|B|) /
    max(|A|,|B|) — a true upper bound, so the surviving pair set is
    identical, but skewed candidate floods (boilerplate bands) shrink
    inside whole-stage codegen."""
    jac = make_jaccard_udf(cfg.shingle_k)
    # Small per-doc METADATA (sketches, shingle sizes) broadcasts
    # explicitly under cfg.est_broadcast so pruning happens map-side.
    # The CONTENT table never broadcasts — it exceeds any broadcast
    # budget at real scale and building the broadcast is driver-serial;
    # its join stays a shuffled equi-join on id (the scan-shaped plan
    # that survives 100x data).
    hint = F.broadcast if cfg.est_broadcast else (lambda df: df)
    if not skip_est and "sig_packed" in contents.columns and cfg.est_margin > 0:
        pairs = est_prefilter(
            pairs, contents.select(id_col, "sig_packed"), cfg, id_col
        )
    # The size bound jaccard(A,B) <= min(|A|,|B|)/max(|A|,|B|) is EXACT
    # and cheap (two broadcast probes inside codegen), so it runs even
    # when the est prefilter already did (skip_est=True, the pipeline
    # path): the est margin keeps pairs down to est >= (thr-margin)*n,
    # many of which the size bound kills before content ships to the
    # Python kernel.
    have_sizes = size_col is not None and size_col in contents.columns
    if have_sizes:
        sa = contents.select(
            F.col(id_col).alias("id_a"), F.col(size_col).alias("sz_a")
        )
        sb = contents.select(
            F.col(id_col).alias("id_b"), F.col(size_col).alias("sz_b")
        )
        pairs = (
            pairs.join(hint(sa), "id_a")
            .join(hint(sb), "id_b")
            .filter(
                (F.greatest("sz_a", "sz_b") == 0)
                | (
                    F.least("sz_a", "sz_b")
                    >= cfg.jaccard_threshold * F.greatest("sz_a", "sz_b")
                )
            )
            .select("id_a", "id_b")
        )
    withv = _attach_pair_values(
        pairs, contents.select(id_col, content_col), id_col, content_col
    )
    # CPU-bound verify: fan out to full parallelism (AQE's byte-based
    # coalescing would run the pair kernel on a handful of cores)
    withv = withv.repartition(withv.sparkSession.sparkContext.defaultParallelism)
    return (
        withv.withColumn("jaccard", jac("value_a", "value_b"))
        .filter(F.col("jaccard") >= cfg.jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
