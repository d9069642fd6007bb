"""Stateful streaming near-duplicate detection.

Incremental analog of the batch SimHash tier: documents arrive on a
stream, each group (a pigeonhole chunk of the 64-bit SimHash — same
banding as functions/simhash.py) keeps the signatures it has seen in
group state, and every incoming document is emitted with the id of the
first earlier document within `max_hamming`, or null if it is novel.

Custom stateful operator via `applyInPandasWithState`: state is a
bounded ring of (id, simhash) pairs per band group, so memory is capped
regardless of stream length; duplicates beyond the horizon degrade to
"novel" (the batch tier catches them — same contract as the watermarked
exact-dedup in streaming/dedup.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from fastqdedup_spark.functions.simhash import simhash64

# 16-bit popcount lookup: popcount(x64) = sum of 4 table probes.
# numpy<2 has no bitwise_count; this keeps the state scan fully
# vectorized (one XOR + 4 gathers per incoming doc over the whole
# state array) instead of a per-entry Python loop.
_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    x = x.view(np.uint64)
    return (
        _POP16[(x & 0xFFFF).astype(np.int64)]
        + _POP16[((x >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.int64)]
        + _POP16[((x >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.int64)]
        + _POP16[(x >> np.uint64(48)).astype(np.int64)]
    ).astype(np.int64)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("simhash", T.LongType()),
        T.StructField("dup_of", T.LongType()),  # null -> novel
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("sigs", T.ArrayType(T.LongType())),
    ]
)


def _make_fn(max_hamming: int, max_state: int):
    def fn(key, pdfs, state: GroupState):
        if state.exists:
            prev_ids, prev_sigs = state.get
            n = len(prev_ids)
        else:
            prev_ids, prev_sigs = (), ()
            n = 0
        # geometric-growth buffers: novel docs append in amortized O(1)
        # (np.append reallocated the full state per novel doc — O(n^2)
        # over a novel-heavy batch)
        cap = max(16, n)
        ids = np.empty(cap, dtype=np.int64)
        sigs = np.empty(cap, dtype=np.int64)
        ids[:n] = prev_ids
        sigs[:n] = prev_sigs
        out_frames = []
        for pdf in pdfs:
            batch_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            batch_sigs = pdf["simhash"].to_numpy(dtype=np.int64)
            # matches tracked as POSITIONS into the state (int64, -1 =
            # novel) and mapped to ids at the end: a float64 staging
            # array would silently round ids >= 2^53
            dup_pos = np.full(len(batch_ids), -1, dtype=np.int64)
            # sequential by necessity (each novel doc extends the state
            # the NEXT doc scans), but the per-doc scan is one
            # vectorized XOR + popcount over the whole state array
            for i in range(len(batch_ids)):
                if n:
                    d = _popcount64(sigs[:n] ^ batch_sigs[i])
                    hits = np.nonzero(d <= max_hamming)[0]
                else:
                    hits = ()
                if len(hits):
                    dup_pos[i] = hits[0]
                else:
                    if n == cap:
                        cap *= 2
                        ids = np.resize(ids, cap)
                        sigs = np.resize(sigs, cap)
                    ids[n] = batch_ids[i]
                    sigs[n] = batch_sigs[i]
                    n += 1
            dup_of = pd.array(ids[dup_pos], dtype="Int64")
            dup_of[dup_pos < 0] = pd.NA  # novel
            out_frames.append(
                pd.DataFrame(
                    {
                        "doc_id": batch_ids,
                        "simhash": batch_sigs,
                        "dup_of": dup_of,
                    }
                )
            )
            if n > max_state:  # bounded ring
                keep = n - max_state
                ids[:max_state] = ids[keep:n]
                sigs[:max_state] = sigs[keep:n]
                n = max_state
        state.update((ids[:n].tolist(), sigs[:n].tolist()))
        yield pd.concat(out_frames, ignore_index=True)

    return fn


def streaming_near_dup(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_state_per_group: int = 10_000,
    n_chunks: int = 4,
) -> DataFrame:
    """stream(doc_id, text, ...) -> stream(doc_id, simhash, dup_of).

    Grouping key = the first 16-bit SimHash chunk: any pair within
    Hamming distance <= n_chunks-1 shares at least one chunk, and using
    a fixed chunk keeps each doc in exactly ONE group (single-emit);
    recall is partial per chunk — run the batch tier for completeness.
    """
    width = 64 // n_chunks
    mask = (1 << width) - 1
    signed = stream.select(
        F.col(id_col).alias("doc_id"), simhash64(F.col(text_col)).alias("simhash")
    ).withColumn("band", F.col("simhash").bitwiseAND(F.lit(mask)))
    return signed.groupBy("band").applyInPandasWithState(
        _make_fn(max_hamming, max_state_per_group),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
