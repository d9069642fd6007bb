"""Structured-Streaming incremental dedup.

The reference is strictly batch (one process, three passes,
/root/reference/src/fastqdedup/__init__.py:209-288); a 100 TB ingest
pipeline wants the exact-dup tier to run incrementally as files arrive.

- `streaming_exact_dedup` — `readStream -> sha2 ->
  dropDuplicatesWithinWatermark` with a watermark on the ingest
  timestamp so state is BOUNDED: duplicates arriving within the
  watermark horizon are dropped exactly, the state store evicts keys
  once the watermark passes them, and older re-arrivals fall to the
  batch tier. (Plain `dropDuplicates(["sha"])` under a watermark is a
  trap: the event-time column is not part of the dedup key, so Spark
  never evicts — state grows forever and the batch-tier hand-off the
  docstring promises never happens.)
- `foreach_batch_merge` — idempotent first-wins emission: each
  micro-batch anti-joins the already-seen sha set and emits only novel
  contents, the streaming analog of the reference's
  remove-from-survivor-set trick (__init__.py:203-204). Replay-safe
  via epoch_id: both sinks write `epoch=<id>` directories with
  overwrite, and the seen read excludes the CURRENT epoch — a replayed
  batch sees the seen set as-of the previous epochs (exactly its
  first-run view) and overwrites its own partial output instead of
  appending duplicates. Readers of `out_path` see an extra `epoch`
  partition column.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def streaming_exact_dedup(
    stream: DataFrame,
    ts_col: str = "ingest_ts",
    watermark: str = "10 minutes",
    content_col: str = "content",
) -> DataFrame:
    """stream must carry an event-time column `ts_col`."""
    return (
        stream.withColumn("sha", F.sha2(F.col(content_col), 256))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["sha"])
    )


def _has_epochs(spark: SparkSession, path: str) -> bool:
    """True when `path` holds at least one committed epoch directory.
    Goes through the Hadoop FileSystem API, not os.path: `path` may be
    hdfs:// or s3a:// on a real deployment, where a driver-local
    os.path.exists is always False and the seen set would be silently
    ignored (cross-batch dedup degrading to per-batch)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return False
    glob = jvm.org.apache.hadoop.fs.Path(os.path.join(path, "epoch=*", "_SUCCESS"))
    statuses = fs.globStatus(glob)
    return statuses is not None and len(statuses) > 0


def _migrate_legacy_seen(spark: SparkSession, seen_path: str) -> None:
    """One-time upgrade of a PRE-EPOCH seen set (flat parquet files at
    the root, the layout the previous code wrote): without this, an
    existing stream upgraded across the epoch=<id> layout change
    silently forgot every previously-seen sha and re-emitted them as
    novel (ADVICE r5, medium). The flat files are rewritten into an
    `epoch=-1` directory (-1 never collides with a real epoch id, so
    the exclude-current-epoch read always includes it) and then
    removed; a mixed flat+epoch root would otherwise break partition
    discovery. Idempotent: gated on flat files existing; the epoch=-1
    overwrite is repeatable, and a crash between write and delete
    leaves the flat files for the next run to re-fold."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(seen_path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return
    root_files = [
        st.getPath()
        for st in fs.listStatus(p)
        if not st.isDirectory()
    ]
    if not any(f.getName().endswith(".parquet") for f in root_files):
        return
    flat = spark.read.parquet(os.path.join(seen_path, "*.parquet"))
    flat.select("sha").write.mode("overwrite").parquet(
        os.path.join(seen_path, "epoch=-1")
    )
    for f in root_files:
        fs.delete(f, False)


def foreach_batch_merge(seen_path: str, out_path: str):
    """Returns a foreachBatch function implementing first-wins append:
    batch rows whose sha already exists in `seen_path` are dropped;
    within a batch, one row per sha survives (min (repo,path,commit)).

    Idempotent under micro-batch replay: a crash between the two sink
    writes (or before the streaming checkpoint commits) makes Spark
    re-run the same epoch — the epoch=<id> overwrite plus the
    exclude-current-epoch seen read reproduce the first attempt
    bit-for-bit instead of double-appending."""

    def fn(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.withColumn("sha", F.sha2(F.col("content"), 256))
        one_per_sha = (
            batch.groupBy("sha")
            .agg(F.min(F.struct(*[c for c in batch.columns if c != "sha"])).alias("r"))
            .select("sha", "r.*")
        )
        _migrate_legacy_seen(spark, seen_path)
        if _has_epochs(spark, seen_path):
            # exclude THIS epoch: a replay must see the seen set as-of
            # the previous epochs, or its own partial first attempt
            # would mark every row non-novel and the overwrite below
            # would erase the epoch's output
            seen = (
                spark.read.parquet(seen_path)
                .filter(F.col("epoch") != F.lit(epoch_id))
                .select("sha")
            )
            novel = one_per_sha.join(seen, "sha", "left_anti")
        else:
            novel = one_per_sha
        # pin: both sinks write the SAME novel set (an unpinned plan
        # would re-run the anti-join per write)
        novel = novel.localCheckpoint(eager=True)
        novel.write.mode("overwrite").parquet(
            os.path.join(out_path, f"epoch={epoch_id}")
        )
        novel.select("sha").write.mode("overwrite").parquet(
            os.path.join(seen_path, f"epoch={epoch_id}")
        )

    return fn


def run_streaming_dedup(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    out_path: str,
    seen_path: str,
    checkpoint: str,
) -> StreamingQuery:
    """File-source streaming dedup, replay-idempotent via foreachBatch."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return (
        stream.writeStream.foreachBatch(foreach_batch_merge(seen_path, out_path))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
