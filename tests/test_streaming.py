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
