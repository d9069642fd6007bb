"""Scale-adaptive input widening (guide: shuffles/partitioning §2).

The sf test tables are single parquet files with ONE row group, so a
scan plans as 1-2 partitions regardless of session width (a byte-range
split cannot cut a row group) — and every expensive projection,
explode, or Arrow stage that rides the scan runs serially on a 32-core
box. Measured at sf0.1: the q15 signer, q16 winnowing, q11 bigram
explode and q27 gram explode all executed at parallelism 1-2.

`widen_small_input` inserts ONE round-robin repartition to default
parallelism — but only when the optimizer's size estimate says the
whole input is small (below `bytes_per_core` per core). At real scale
the scan already yields enough splits, the estimate exceeds the
threshold, and the call is a no-op: no exchange is added, so the
100 TB plan shape is untouched. The decision reads
`optimizedPlan().stats()` (pure planning, no job) rather than
`df.rdd.getNumPartitions()`, which forces physical planning and can
execute AQE stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# 8 MB/core: well above every sf test table (a widened shuffle of the
# whole input is trivial at that size) and far below any real corpus
# slice, where splits are plentiful and a keyless repartition would be
# a pointless full shuffle of the payload.
_DEFAULT_BYTES_PER_CORE = 8 << 20


def plan_size_bytes(df: DataFrame) -> int | None:
    """The optimizer's sizeInBytes estimate for the plan, or None when
    it cannot be read (e.g. Connect). LogicalRDD inputs (localCheckpoint
    results) report the conservative default (huge), which correctly
    disables widening — checkpointed pipeline stages are already
    partitioned."""
    try:
        return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:  # noqa: BLE001 — any introspection failure: stay lazy
        return None


def widen_small_input(
    df: DataFrame, bytes_per_core: int = _DEFAULT_BYTES_PER_CORE
) -> DataFrame:
    """Fan a tiny input out to the box before heavy per-row compute;
    identity at scale (see module docstring). Round-robin keeps values
    identical (row order is irrelevant to every caller: downstream
    aggregations, joins and sorts are order-insensitive), and Spark's
    sort-before-repartition default keeps the assignment deterministic
    under task retries."""
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    size = plan_size_bytes(df)
    if size is not None and 0 <= size < cores * bytes_per_core:
        return df.repartition(cores)
    return df
