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

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from fastqdedup_spark.functions.simhash import simhash64

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
            ids, sigs = state.get
            ids, sigs = list(ids), list(sigs)
        else:
            ids, sigs = [], []
        out = []
        for pdf in pdfs:
            for doc_id, sig in zip(pdf["doc_id"], pdf["simhash"]):
                doc_id, sig = int(doc_id), int(sig)
                dup_of = None
                for j in range(len(ids)):
                    if bin((sigs[j] ^ sig) & 0xFFFFFFFFFFFFFFFF).count("1") <= max_hamming:
                        dup_of = ids[j]
                        break
                if dup_of is None:
                    ids.append(doc_id)
                    sigs.append(sig)
                    if len(ids) > max_state:  # bounded ring
                        ids.pop(0)
                        sigs.pop(0)
                out.append((doc_id, sig, dup_of))
        state.update((ids, sigs))
        yield pd.DataFrame(out, columns=["doc_id", "simhash", "dup_of"])

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
