"""Structured-Streaming incremental dedup.

The reference is strictly batch (one process, three passes,
/root/reference/src/fastqdedup/__init__.py:209-288); a 100 TB ingest
pipeline wants the exact-dup tier to run incrementally as files arrive.

- `streaming_exact_dedup` — `readStream -> sha2 -> dropDuplicates` with
  a watermark on the ingest timestamp so state is bounded: duplicates
  arriving within the watermark horizon are dropped exactly; older
  re-arrivals fall to the batch tier.
- `foreach_batch_merge` — the exactly-once sink pattern: each
  micro-batch anti-joins the already-seen sha set (a parquet "seen"
  table) and appends only novel contents — an idempotent first-wins
  emission, the streaming analog of the reference's
  remove-from-survivor-set trick (__init__.py:203-204).
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
        .dropDuplicates(["sha"])
    )


def foreach_batch_merge(seen_path: str, out_path: str):
    """Returns a foreachBatch function implementing first-wins append:
    batch rows whose sha already exists in `seen_path` are dropped;
    within a batch, one row per sha survives (min (repo,path,commit))."""

    def fn(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.withColumn("sha", F.sha2(F.col("content"), 256))
        one_per_sha = (
            batch.groupBy("sha")
            .agg(F.min(F.struct(*[c for c in batch.columns if c != "sha"])).alias("r"))
            .select("sha", "r.*")
        )
        if os.path.exists(os.path.join(seen_path, "_SUCCESS")):
            seen = spark.read.parquet(seen_path).select("sha")
            novel = one_per_sha.join(seen, "sha", "left_anti")
        else:
            novel = one_per_sha
        novel.write.mode("append").parquet(out_path)
        novel.select("sha").write.mode("append").parquet(seen_path)

    return fn


def run_streaming_dedup(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    out_path: str,
    seen_path: str,
    checkpoint: str,
) -> StreamingQuery:
    """File-source streaming dedup, exactly-once via foreachBatch."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return (
        stream.writeStream.foreachBatch(foreach_batch_merge(seen_path, out_path))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
