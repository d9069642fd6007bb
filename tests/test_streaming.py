"""Structured-Streaming incremental exact-dedup smoke tests."""

import pyspark.sql.functions as F

from fastqdedup_spark.streaming.dedup import run_streaming_dedup, streaming_exact_dedup


def test_streaming_exact_dedup_memory_sink(spark, tmp_path):
    src = str(tmp_path / "in")
    rows = [
        ("r1", "a.py", "c1", "py", "print(1)"),
        ("r1", "b.py", "c1", "py", "print(1)"),   # exact dup
        ("r2", "c.py", "c2", "py", "print(2)"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ).withColumn("ingest_ts", F.current_timestamp())
    df.write.parquet(src)
    schema = "repo string, path string, commit string, lang string, content string, ingest_ts timestamp"
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from dedup_out").collect()
    assert len(out) == 2
    assert {r.content for r in out} == {"print(1)", "print(2)"}


def test_foreach_batch_first_wins(spark, tmp_path):
    src = str(tmp_path / "in2")
    out = str(tmp_path / "out2")
    seen = str(tmp_path / "seen2")
    ck = str(tmp_path / "ck2")
    schema = "repo string, path string, commit string, lang string, content string"
    batch1 = [("r1", "a.py", "c1", "py", "x = 1"), ("r1", "b.py", "c1", "py", "x = 1")]
    spark.createDataFrame(batch1, schema).write.mode("append").parquet(src)
    q = run_streaming_dedup(spark, src, schema, out, seen, ck)
    q.awaitTermination(120)
    # second arrival of the same content later: must NOT re-emit
    spark.createDataFrame(
        [("r9", "z.py", "c9", "py", "x = 1"), ("r9", "n.py", "c9", "py", "new!")], schema
    ).write.mode("append").parquet(src)
    q = run_streaming_dedup(spark, src, schema, out, seen, ck)
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2
    assert {r.content for r in rows} == {"x = 1", "new!"}
    # first-wins: the surviving 'x = 1' row is the (repo,path) minimum of batch 1
    first = [r for r in rows if r.content == "x = 1"][0]
    assert (first.repo, first.path) == ("r1", "a.py")


def test_foreach_batch_replay_is_idempotent(spark, tmp_path):
    """A crashed-and-replayed micro-batch must not double-emit: the
    epoch=<id> overwrite plus the exclude-current-epoch seen read make
    a replay reproduce its first attempt instead of appending dupes —
    including the nasty half-failure where the out write committed but
    the seen write did not."""
    from fastqdedup_spark.streaming.dedup import foreach_batch_merge

    out = str(tmp_path / "out")
    seen = str(tmp_path / "seen")
    schema = "repo string, path string, commit string, lang string, content string"
    fn = foreach_batch_merge(seen, out)

    b0 = spark.createDataFrame(
        [("r1", "a.py", "c1", "py", "x = 1")], schema
    )
    fn(b0, 0)
    # full replay of epoch 0 (checkpoint never committed)
    fn(b0, 0)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0].content == "x = 1"

    # epoch 1 carries one dup of epoch 0 and one novel row; replay it too
    b1 = spark.createDataFrame(
        [("r2", "b.py", "c2", "py", "x = 1"), ("r2", "c.py", "c2", "py", "y = 2")],
        schema,
    )
    fn(b1, 1)
    fn(b1, 1)
    rows = spark.read.parquet(out).collect()
    assert sorted(r.content for r in rows) == ["x = 1", "y = 2"]


def test_streaming_dedup_state_is_watermark_bounded(spark):
    """streaming_exact_dedup must plan the watermark-evicting dedup
    operator (dropDuplicatesWithinWatermark), not the unbounded
    dropDuplicates: with only sha in the key subset the watermark never
    evicts and state grows for every sha ever seen."""
    import pyspark.sql.functions as F

    stream = (
        spark.readStream.format("rate").load()
        .select(F.col("timestamp").alias("ingest_ts"),
                F.col("value").cast("string").alias("content"))
    )
    q = streaming_exact_dedup(stream)
    plan = q._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" in plan


def test_legacy_flat_seen_set_is_migrated_and_honored(spark, tmp_path):
    """ADVICE r5 (medium): a seen set written by the pre-epoch code
    (flat parquet at the root) must keep suppressing its shas after the
    epoch=<id> layout upgrade — folded into epoch=-1, not forgotten."""
    import os

    import pyspark.sql.functions as F

    from fastqdedup_spark.streaming.dedup import foreach_batch_merge

    seen = str(tmp_path / "seen_legacy")
    out = str(tmp_path / "out_legacy")
    schema = "repo string, path string, commit string, lang string, content string"
    # the OLD layout: flat sha table at the root
    old = spark.createDataFrame(
        [("r0", "a.py", "c0", "py", "old content")], schema
    ).withColumn("sha", F.sha2("content", 256))
    old.select("sha").write.parquet(seen)
    assert any(f.endswith(".parquet") for f in os.listdir(seen))

    batch = spark.createDataFrame(
        [
            ("r1", "b.py", "c1", "py", "old content"),   # seen pre-upgrade
            ("r1", "c.py", "c1", "py", "fresh content"),
        ],
        schema,
    )
    foreach_batch_merge(seen, out)(batch, 0)

    emitted = {r.content for r in spark.read.parquet(out).collect()}
    assert emitted == {"fresh content"}  # legacy sha suppressed
    # layout migrated: no flat parquet left at the root, epoch=-1 exists
    assert not any(f.endswith(".parquet") for f in os.listdir(seen))
    assert os.path.isdir(os.path.join(seen, "epoch=-1"))
    # and a second batch still sees both old and new shas
    batch2 = spark.createDataFrame(
        [
            ("r2", "d.py", "c2", "py", "fresh content"),  # now seen
            ("r2", "e.py", "c2", "py", "newest"),
        ],
        schema,
    )
    foreach_batch_merge(seen, out)(batch2, 1)
    emitted = {r.content for r in spark.read.parquet(out).collect()}
    assert emitted == {"fresh content", "newest"}
