"""C4-style sub-document (segment) deduplication — remove repeated
spans from every document, corpus-wide.

Training pipelines dedup below the document level too: C4 (Raffel et
al. 2020) drops any three-sentence span that occurs more than once in
the corpus; CCNet dedups hashed paragraphs. The reference has no
counterpart (it dedups whole keys only, /root/reference/src/
fastqdedup/__init__.py:234-288); this is a graft-only training-
pipeline operator in the mix/scrub/decontaminate family.

Unit of dedup: documents are segmented into fixed W-word windows
(corpora without line structure, like the synthetic test corpus; for
real corpora with paragraph breaks, split on the separator first and
feed one paragraph per row). A segment that appears in >= `min_docs`
DISTINCT documents is removed from ALL of them; each document is
re-assembled from its surviving segments in order.

Scale design (10^12-row regime):
- Segmentation is pure Catalyst (split + sequence + transform +
  slice): zero Python, one codegen projection over the scan.
- Duplicate detection groups by a SEGMENT KEY. mode="exact" groups by
  the raw segment string — byte-exact semantics, replayable by any
  SQL engine (the oracle), but the exchange carries content.
  mode="hash" groups by a (xxhash64(seg), xxhash64(seed=1, seg),
  length) triple — the exchange carries ~20 bytes per segment and the
  >=128-bit composite keeps the false-merge probability ~1e-14 at
  10^12 segments (a false merge here deletes a unique segment, the
  same failure class the pipeline's 128-bit pair ids guard against).
- One content exchange for detection: the explicit repartition on
  the key pins the join side's single full-row exchange, and the
  frequency branch COLUMN-PRUNES to (key, doc) before its own
  exchange — in hash mode that exchange carries ~28 bytes/row, no
  content. The explicit key partitioning also satisfies the
  distinct-doc count's (key, doc) clustering via the subset rule, so
  the count-distinct plans as ONE exchange, not the default two.
  (NOT localCheckpoint/pinned like pack.py: a LogicalRDD forgets its
  outputPartitioning — the plan degrades to UnknownPartitioning and
  every consumer re-shuffles full rows; and unlike pack.py's range
  sampling, the segment table is a pure deterministic function of
  the input, so evaluating the subtree per consumer is safe.)
- Total content movement is the algorithm's floor: detection
  co-locates by segment (one full-row exchange), re-assembly
  co-locates kept segments by doc (partial collect_list packs them
  map-side). Pinned by test_segment_dedup.py::
  test_content_crosses_one_detection_exchange.
- Re-assembly is a groupBy(doc) of sorted (seg_idx, seg) structs —
  one shuffle of the KEPT segments only; aggregation-atomic like the
  dissection packer (a document's segments cannot straddle reducers).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def segment_windows(text: "str | Column", window_words: int) -> Column:
    """Array of W-word window segments of `text` (single-space word
    separation; the last window may be short, and is kept — C4 keeps
    short lines too). Pure Catalyst expression."""
    if window_words < 1:
        raise ValueError(f"window_words must be >= 1, got {window_words}")
    w = F.split(text if isinstance(text, Column) else F.col(text), " ")
    nseg = F.ceil(F.size(w) / F.lit(float(window_words))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), nseg - F.lit(1)),
        lambda i: F.concat_ws(
            " ", F.slice(w, i * window_words + 1, window_words)
        ),
    )


def _segment_key(mode: str) -> Column:
    if mode == "exact":
        return F.col("seg")
    if mode == "hash":
        return F.struct(
            F.xxhash64("seg").alias("h1"),
            F.xxhash64(F.lit(1), F.col("seg")).alias("h2"),
            F.length("seg").alias("ln"),
        )
    raise ValueError(f"mode must be 'exact' or 'hash', got {mode!r}")


def segment_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_words: int = 12,
    min_docs: int = 2,
    mode: str = "exact",
    npart: int | None = None,
) -> DataFrame:
    """Per input document: `n_segments`, `n_dup_segments` (segments
    present in >= min_docs distinct documents, removed everywhere),
    and `cleaned_text` (surviving segments re-joined in order; ''
    when nothing survives). Output has one row per input row with a
    non-null text; rows are keyed by `id_col`."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    from fastqdedup_spark.functions.partitioning import widen_small_input

    spark = docs.sparkSession
    npart = npart or spark.sparkContext.defaultParallelism
    # segment construction (split + transform + slice over every doc)
    # rides the scan and `segs` is evaluated by BOTH consumers below:
    # widen a tiny single-row-group scan first so the heavy projection
    # runs at session width instead of 1-2 scan partitions (no-op at
    # real scale; the widening exchange is reused across consumers)
    docs = widen_small_input(docs)
    segs = (
        docs.select(
            F.col(id_col),
            F.posexplode(segment_windows(text_col, window_words)).alias(
                "seg_idx", "seg"
            ),
        )
        .withColumn("_k", _segment_key(mode))
        .repartition(npart, "_k")
    )
    freq = segs.groupBy("_k").agg(
        F.count_distinct(F.col(id_col)).alias("_ndocs")
    )
    is_dup = F.col("_ndocs") >= min_docs
    flagged = segs.join(freq, "_k")
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(is_dup.cast("long")).alias("n_dup_segments"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~is_dup, F.struct("seg_idx", "seg"))
                    )
                ),
                lambda x: x["seg"],
            ),
        ).alias("cleaned_text"),
    )
