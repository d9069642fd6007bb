"""FASTQ source + mate zip (reference O1/O2) and the full
reference-equivalent dedup pipeline over real FASTQ files.

- O1 scan: `read_fastq` parses (possibly gzipped) FASTQ into a
  DataFrame (record_idx, name, sequence, qualities). Files are the unit
  of parallelism (one task per file via binaryFiles) — the natural
  Spark shape, since FASTQ has no splittable record boundaries when
  gzipped. Ref: file_to_fastq_reader, __init__.py:54-57.
- O2 zip + mate validation: `zip_fastq` joins R1/R2/UMI tables on
  record_idx and validates mate names (same name up to a trailing
  /1 /2 or read-number field). Ref: fastq_files_to_records,
  __init__.py:170-186 (raises on non-mates).
- `deduplicate_fastq` = the whole reference CLI pipeline
  (__init__.py:209-288): quality filter -> key projection -> cluster ->
  dissect -> survivor first-wins emission, returning surviving records.
"""

from __future__ import annotations

import gzip
import io

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fastqdedup_spark.config import DedupConfig
from fastqdedup_spark.functions.quality import average_error_rate_udf
from fastqdedup_spark.functions.slices import key_projection
from fastqdedup_spark.pipeline import dedup_keys

FASTQ_SCHEMA = "record_idx long, name string, sequence string, qualities string"


def _parse_fastq_bytes(blob: bytes) -> pd.DataFrame:
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)
    names, seqs, quals = [], [], []
    lines = io.BytesIO(blob).read().decode("ascii").splitlines()
    if len(lines) % 4:
        raise ValueError("truncated FASTQ: line count not a multiple of 4")
    for i in range(0, len(lines), 4):
        header, seq, plus, qual = lines[i : i + 4]
        if not header.startswith("@") or not plus.startswith("+"):
            raise ValueError(f"malformed FASTQ record at line {i + 1}")
        if len(seq) != len(qual):
            raise ValueError(f"sequence/quality length mismatch at line {i + 1}")
        names.append(header[1:])
        seqs.append(seq)
        quals.append(qual)
    return pd.DataFrame(
        {
            "record_idx": range(len(names)),
            "name": names,
            "sequence": seqs,
            "qualities": quals,
        }
    )


def read_fastq(spark: SparkSession, path: str) -> DataFrame:
    """One task per file; record_idx is the position within its file."""
    rdd = spark.sparkContext.binaryFiles(path)

    def parse(kv):
        _, blob = kv
        pdf = _parse_fastq_bytes(bytes(blob))
        return list(pdf.itertuples(index=False, name=None))

    return spark.createDataFrame(rdd.flatMap(parse), FASTQ_SCHEMA)


def _mate_root(name_col: str) -> F.Column:
    """Mate identity: the name up to the first whitespace, with a
    trailing /1 /2 /3 stripped (dnaio's convention)."""
    first = F.split(F.col(name_col), r"\s+").getItem(0)
    return F.regexp_replace(first, r"/[123]$", "")


def zip_fastq(tables: list[DataFrame], validate: bool = True) -> DataFrame:
    """Positional zip of parallel FASTQ tables -> one row per record
    tuple with columns name_i/sequence_i/qualities_i. Raises ValueError
    if any tuple's names are not mates (ref __init__.py:181-185)."""
    out = None
    for i, df in enumerate(tables):
        renamed = df.select(
            "record_idx",
            F.col("name").alias(f"name_{i}"),
            F.col("sequence").alias(f"sequence_{i}"),
            F.col("qualities").alias(f"qualities_{i}"),
        )
        out = renamed if out is None else out.join(renamed, "record_idx", "inner")
    assert out is not None
    if validate and len(tables) > 1:
        mism = out
        for i in range(1, len(tables)):
            mism = mism.filter(_mate_root("name_0") != _mate_root(f"name_{i}"))
        bad = mism.select("record_idx", "name_0").limit(1).collect()
        if bad:
            raise ValueError(
                f"records at index {bad[0].record_idx} are not mates: {bad[0].name_0!r}"
            )
    return out


def deduplicate_fastq(
    spark: SparkSession,
    tables: list[DataFrame],
    cfg: DedupConfig,
    check_slices: list[slice] | None = None,
    max_average_error_rate: float | None = 0.001,
) -> DataFrame:
    """The reference CLI pipeline end-to-end (deduplicate_cluster,
    __init__.py:209-288): returns the surviving record tuples.

    1. zip + validate (O2)
    2. quality filter on the FIRST file's qualities (O3; the reference
       filters on the R1 error rate by default, __init__.py:247-250)
    3. dedup key = concat of sliced sequences (O4)
    4. exact-radius cluster + dissect (O5-O11) via dedup_keys
    5. survivor semi-join, first occurrence per key wins (O13)
    """
    zipped = zip_fastq(tables)
    if max_average_error_rate is not None:
        zipped = zipped.filter(
            average_error_rate_udf(F.col("qualities_0")) <= max_average_error_rate
        )
    seq_cols = [c for c in zipped.columns if c.startswith("sequence_")]
    zipped = zipped.withColumn("dedup_key", key_projection(seq_cols, check_slices))
    result = dedup_keys(spark, zipped.select(F.col("dedup_key").alias("key")), cfg)
    survivors = result.survivors.select(F.col("key").alias("dedup_key")).distinct()
    kept = zipped.join(F.broadcast(survivors), "dedup_key")
    # first-wins: exactly one record tuple per surviving key
    best = kept.groupBy("dedup_key").agg(F.min("record_idx").alias("record_idx"))
    return kept.join(best, ["dedup_key", "record_idx"], "inner").drop("dedup_key")
