"""Stateful streaming near-dup: state persists across restarts (the
memory sink can't recover state checkpoints, so output goes to parquet
via foreachBatch)."""

import numpy as np

from fastqdedup_spark.streaming.near_dup import streaming_near_dup


def _docs(rng, n, start_id):
    words = [f"word{i}" for i in range(300)]
    return [(start_id + i, " ".join(rng.choice(words, 200))) for i in range(n)]


def _run_once(spark, src, ck, out_dir):
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    result = streaming_near_dup(stream, max_hamming=6)
    q = (
        result.writeStream.foreachBatch(
            lambda df, _eid: df.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return {
        r.doc_id: r.dup_of for r in spark.read.parquet(out_dir).collect()
    }


def test_streaming_near_dup_across_restarts(spark, tmp_path):
    src = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    rng = np.random.default_rng(4)
    batch1 = _docs(rng, 5, 0)
    spark.createDataFrame(batch1, "doc_id long, text string").write.mode(
        "append"
    ).parquet(src)
    first = _run_once(spark, src, ck, out)
    assert len(first) == 5
    assert all(v is None for v in first.values())  # batch 1: all novel

    # restart with new data: a near-dup of doc 0 (one-token edit) and a
    # novel doc — recovered state must recognize the dup
    near = batch1[0][1].replace(" word5 ", " swapped ", 1)
    batch2 = [(100, near)] + _docs(rng, 1, 200)
    spark.createDataFrame(batch2, "doc_id long, text string").write.mode(
        "append"
    ).parquet(src)
    second = _run_once(spark, src, ck, out)
    assert second.get(100) == 0, f"near-dup not recognized across restart: {second}"
    assert 200 in second and second[200] is None
    assert len(second) == 7


class _FakeState:
    """Minimal GroupState stand-in for kernel-level unit tests."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_streaming_kernel_exact_for_large_ids():
    """ADVICE r2: dup_of must be exact for int64 ids >= 2^53 (a float64
    staging array silently rounded them)."""
    import pandas as pd

    from fastqdedup_spark.streaming.near_dup import _make_fn

    fn = _make_fn(max_hamming=3, max_state=100)
    big = (1 << 62) + 12345  # not representable in float64
    pdf = pd.DataFrame(
        {"doc_id": [big, big + 1], "simhash": [42, 43]}  # hamming(42,43)=1
    )
    out = next(fn(None, iter([pdf]), _FakeState()))
    assert out["dup_of"].iloc[0] is pd.NA
    assert int(out["dup_of"].iloc[1]) == big  # exact, no rounding


def test_streaming_kernel_state_growth_and_ring():
    """Novel-heavy batches append in amortized O(1) and the ring bound
    keeps only the newest max_state entries."""
    import pandas as pd

    from fastqdedup_spark.streaming.near_dup import _make_fn

    fn = _make_fn(max_hamming=0, max_state=10)
    st = _FakeState()
    # 25 novel docs (distinct simhashes far apart)
    pdf = pd.DataFrame(
        {"doc_id": list(range(25)), "simhash": [i << 8 for i in range(25)]}
    )
    out = next(fn(None, iter([pdf]), st))
    assert out["dup_of"].isna().all()
    ids, sigs = st.get
    assert ids == list(range(15, 25))  # newest 10 kept
    assert sigs == [i << 8 for i in range(15, 25)]
    # a dup of a retained entry is still recognized after restart
    pdf2 = pd.DataFrame({"doc_id": [99], "simhash": [20 << 8]})
    out2 = next(fn(None, iter([pdf2]), st))
    assert int(out2["dup_of"].iloc[0]) == 20
