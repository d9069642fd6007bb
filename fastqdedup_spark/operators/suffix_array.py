"""Exact substring-level duplicate detection (SURVEY.md M7; north_star
"suffix-array pass for exact substring duplicates").

Two cooperating passes:

1. `winnowing_fingerprints` — MOSS-style winnowing: per document, hash
   every k-gram, slide a window of w hashes, keep each window's minimum
   (rightmost on ties). Guarantees: any shared substring of length >=
   w + k - 1 yields at least one shared fingerprint. Fingerprints are
   tiny, so the cross-document phase is a plain groupBy — this is the
   CROSS-PARTITION (and cross-machine) path and scales like word count.

2. `partition_suffix_array` — an exact per-partition suffix array
   (prefix-doubling, O(n log^2 n), pure numpy argsorts) + Kasai LCP over
   the partition's concatenated normalized text, emitting maximal
   repeated substrings of length >= min_len WITH their owning docs.
   Used to verify/extract the actual repeated strings among documents
   that winnowing already co-bucketed (repartition by fingerprint first
   so matching docs share a partition).

Design note: a global suffix array over 100 TB is not a Spark-shaped
object; the fingerprint groupBy IS the distributed join, and exact
extraction is deliberately partition-local — the same decomposition
as candidate-generation + verify elsewhere in this engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from fastqdedup_spark.functions.minhash import shingle_window_hashes


def winnowing_fingerprints_batch(
    texts: "pd.Series | list[str]", k: int, w: int, portable: bool = False
) -> list[np.ndarray]:
    """Per-row arrays of distinct winnowed fingerprints (int64).

    portable=True swaps the 64-bit gram hash for the SQL-replicable
    poly-mod-2^31-1 fold (functions/portable.py) so a DuckDB oracle can
    recompute the identical fingerprint sets. The winnowed SET is
    tie-rule-independent (min VALUE per window), so SQL `min() OVER
    window` reproduces it exactly."""
    if portable:
        from fastqdedup_spark.functions.portable import portable_window_hashes

        H, starts, counts = portable_window_hashes(list(texts), k)
    else:
        H, starts, counts = shingle_window_hashes(texts, k)
    out = []
    for i in range(len(starts)):
        hs = H[starts[i] : starts[i] + counts[i]]
        if len(hs) == 0:
            out.append(np.zeros(0, dtype=np.int64))
            continue
        if len(hs) <= w:
            out.append(np.unique(hs).view(np.int64))
            continue
        # The winnowed SET needs only each window's min VALUE (the
        # rightmost-tie rule changes which index wins, never the
        # value), so the O(n*w) sliding argmin is replaced by the
        # O(n) two-pass block trick: split into w-sized blocks, take
        # prefix mins left-to-right and suffix mins right-to-left;
        # window [i, i+w) = min(suffix_min[i], prefix_min[i+w-1])
        # (the window straddles at most one block boundary). 3-4x
        # measured on 0.5k-40k-hash rows, byte-identical output.
        nwin = len(hs) - w + 1
        pad = (-len(hs)) % w
        hp = (
            np.concatenate([hs, np.full(pad, np.iinfo(np.int64).max, dtype=hs.dtype)])
            if pad
            else hs
        )
        blocks = hp.reshape(-1, w)
        pre = np.minimum.accumulate(blocks, axis=1).ravel()
        suf = np.minimum.accumulate(blocks[:, ::-1], axis=1)[:, ::-1].ravel()
        i = np.arange(nwin)
        mins = np.minimum(suf[i], pre[i + w - 1])
        out.append(np.unique(mins).view(np.int64))
    return out


def winnowing_fingerprints(
    df: DataFrame, id_col: str = "id", text_col: str = "content_norm",
    k: int = 25, w: int = 40, portable: bool = False,
) -> DataFrame:
    """(id, fingerprint) exploded — any shared substring of length >=
    w + k - 1 (~64 chars at defaults) produces a shared fingerprint."""
    schema = f"{id_col} {dict(df.dtypes)[id_col]}, fingerprint bigint"

    def gen(it):
        for pdf in it:
            fps = winnowing_fingerprints_batch(
                pdf[text_col].fillna(""), k, w, portable=portable
            )
            lens = np.fromiter((len(f) for f in fps), dtype=np.int64, count=len(fps))
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), lens),
                    "fingerprint": np.concatenate(fps) if len(fps) else [],
                }
            )

    return df.select(id_col, text_col).mapInPandas(gen, schema)


def substring_dup_pairs(
    df: DataFrame, id_col: str = "id", text_col: str = "content_norm",
    k: int = 25, w: int = 40, fingerprint_cap: int = 2000,
    portable: bool = False,
) -> DataFrame:
    """Documents sharing >= 1 winnowed fingerprint, with the count of
    shared fingerprints as a match-strength score. Mega-fingerprints
    (boilerplate) are capped like LSH mega-bands — winnowing is a
    SAMPLING tier (recall bounded by w+k-1 anyway), so capping is a
    documented precision/cost trade, unlike the exact pigeonhole
    schemes where it would break a guarantee.

    Plan shape (r6): the fingerprint stage is the operator's one Python
    pass, and it must run exactly ONCE. The old sizes-aggregate + join
    shape referenced `fps` from two branches, so the winnowing
    mapInPandas executed twice — and at a tiny input's scan parallelism
    of 1-2 (single-row-group parquet), i.e. 2x serial Python per q16
    run at sf0.1/32c. Now the input is widened (scale-adaptive), the
    fingerprints are shuffled once by fingerprint, and the
    per-fingerprint count comes from a count-over-partition window
    ABOVE that exchange: both self-join sides reuse the same exchange
    (winnowing computed once, below it), the sizes join disappears,
    and the self-join needs no further shuffle — both sides stay
    partitioned on the join key."""
    from pyspark.sql import Window

    from fastqdedup_spark.functions.partitioning import widen_small_input

    fps = winnowing_fingerprints(
        widen_small_input(df), id_col, text_col, k, w, portable=portable
    )
    # no explicit repartition: the window's fingerprint clustering makes
    # EnsureRequirements insert the exchange itself, sized by
    # spark.sql.shuffle.partitions + AQE (scale-adaptive, unlike a
    # pinned core count) — and since the exchange subtree is identical
    # under both self-join branches it is planned as a ReusedExchange,
    # keeping the Python pass below it single-evaluation either way.
    kept = (
        fps.withColumn(
            "_fcnt", F.count(F.lit(1)).over(Window.partitionBy("fingerprint"))
        )
        .filter((F.col("_fcnt") > 1) & (F.col("_fcnt") <= fingerprint_cap))
        .drop("_fcnt")
    )
    left = kept.select("fingerprint", F.col(id_col).alias("id_a"))
    right = kept.select("fingerprint", F.col(id_col).alias("id_b"))
    return (
        left.join(right, "fingerprint")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fingerprints"))
    )


# ---------------------------------------------------------------------------
# exact per-partition suffix array
# ---------------------------------------------------------------------------

def suffix_array(s: np.ndarray) -> np.ndarray:
    """Prefix-doubling suffix array over a uint8/int array. Pure numpy,
    O(n log^2 n): rank pairs re-sorted with doubling offsets."""
    n = len(s)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    rank = np.asarray(s, dtype=np.int64)
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        sa = order
        tmp[sa[0]] = 0
        prev, cur = sa[:-1], sa[1:]
        newgroup = (rank[cur] != rank[prev]) | (key2[cur] != key2[prev])
        tmp[cur] = np.cumsum(newgroup)
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            return sa.astype(np.int64)
        k *= 2


def lcp_kasai(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP array: lcp[i] = LCP(suffix sa[i-1], suffix sa[i])."""
    n = len(s)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def partition_repeated_substrings(
    df: DataFrame, id_col: str = "id", text_col: str = "content_norm",
    min_len: int = 64, max_emit_per_partition: int = 10_000,
) -> DataFrame:
    """Exact repeated substrings (length >= min_len) WITHIN each
    partition, across documents: returns (id_a, id_b, substr_hash,
    length). Repartition the input by a co-bucketing key (e.g. winnowing
    fingerprint or cluster_id) first so near-matching docs co-locate."""
    sep = 0x1F  # below any printable byte; breaks runs between docs
    schema = f"id_a long, id_b long, substr_hash bigint, length bigint"

    def gen(it):
        for pdf in it:
            ids = pdf[id_col].to_numpy()
            blobs = [t.encode("utf-8", "replace") for t in pdf[text_col].fillna("")]
            if not blobs:
                continue
            lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=len(blobs))
            joined = (bytes([sep])).join(blobs)
            s = np.frombuffer(joined, dtype=np.uint8)
            if len(s) < min_len:
                continue
            # doc index per byte position
            bounds = np.cumsum(lens[:-1] + 1)
            docpos = np.zeros(len(s), dtype=np.int64)
            docpos[bounds] = 1
            docpos = np.cumsum(docpos)
            sa = suffix_array(s)
            lcp = lcp_kasai(s, sa)
            hit = np.nonzero(lcp >= min_len)[0][:max_emit_per_partition]
            rows = []
            for r in hit:
                i, j = sa[r - 1], sa[r]
                da, db = int(docpos[i]), int(docpos[j])
                if da == db:
                    continue  # repeat within one document
                L = int(lcp[r])
                frag = s[i : i + L]
                # a shared-sentinel match must not span doc boundaries
                sep_hits = np.nonzero(frag == sep)[0]
                if len(sep_hits):
                    L = int(sep_hits[0])
                    if L < min_len:
                        continue
                    frag = frag[:L]
                # stable 64-bit content hash of the repeated substring
                hval = int.from_bytes(
                    __import__("hashlib").blake2b(frag.tobytes(), digest_size=8).digest(),
                    "big", signed=True,
                )
                a, b = int(ids[da]), int(ids[db])
                rows.append((min(a, b), max(a, b), hval, L))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["id_a", "id_b", "substr_hash", "length"]
                )

    out = df.select(id_col, text_col).mapInPandas(gen, schema)
    return out.groupBy("id_a", "id_b", "substr_hash").agg(F.max("length").alias("length"))
