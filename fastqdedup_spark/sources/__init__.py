"""Source/sink helpers.

The north_rule input is an Iceberg table of source-code files; the
Iceberg runtime jars are not in this image, so `read_files_table`
degrades gracefully: try the Iceberg catalog format first, fall back to
parquet-at-path (same schema contract either way). Writers mirror that.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

FILES_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def input_fingerprint(location: str, spark: "SparkSession | None" = None) -> str:
    """Cheap dataset identity for checkpoint keying: the path plus file
    count and total bytes (metadata only, no data read). Folded into
    DedupConfig.input_id so a rerun with the same knobs but a DIFFERENT
    input never resumes another dataset's checkpoints.

    Non-local locations (hdfs://, s3a://, ...) go through the Hadoop
    FileSystem ContentSummary API; if no session/filesystem can resolve
    them, the fingerprint folds in a nanosecond timestamp so the run
    NEVER silently resumes a prior (possibly overwritten) dataset's
    checkpoints — resume is refused rather than wrong."""
    if "://" in location and not location.startswith("file://"):
        spark = spark or SparkSession.getActiveSession()
        if spark is not None:
            try:
                jvm = spark._jvm
                p = jvm.org.apache.hadoop.fs.Path(location)
                fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
                cs = fs.getContentSummary(p)
                return f"{location}|{cs.getFileCount()}|{cs.getLength()}"
            except Exception:
                pass
        import time

        return f"{location}|unfingerprintable|{time.time_ns()}"
    path = location[len("file://"):] if location.startswith("file://") else location
    n, total = 0, 0
    if os.path.isdir(path):
        for root, _, names in os.walk(path):
            for name in names:
                try:
                    total += os.path.getsize(os.path.join(root, name))
                    n += 1
                except OSError:
                    pass
    elif os.path.exists(path):
        n, total = 1, os.path.getsize(path)
    return f"{location}|{n}|{total}"


def read_files_table(spark: SparkSession, location: str) -> DataFrame:
    """Iceberg table name or parquet path -> files DataFrame."""
    try:
        df = spark.read.format("iceberg").load(location)
    except Exception:
        df = spark.read.parquet(location)
    missing = set(FILES_COLUMNS) - set(df.columns)
    if missing:
        raise ValueError(f"files table at {location} missing columns: {missing}")
    if "id" not in df.columns:
        df = df.withColumn("id", F.xxhash64("repo", "path", "commit"))
    return df


def write_table(df: DataFrame, location: str, mode: str = "overwrite") -> None:
    """`mode` must hold on BOTH paths: the Iceberg writeTo API has no
    mode() — createOrReplace() always replaces, so an "append" request
    routed through it would silently drop the table's existing rows."""
    try:
        if mode == "append":
            df.writeTo(location).append()
        else:
            df.writeTo(location).createOrReplace()
    except Exception:
        df.write.mode(mode).parquet(location)


def read_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
