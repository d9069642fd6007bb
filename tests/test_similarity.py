"""Similarity search + suffix-array/winnowing + multimodal tests."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from fastqdedup_spark.operators.similarity import brute_force_topk, lsh_topk
from fastqdedup_spark.operators.suffix_array import (
    lcp_kasai,
    partition_repeated_substrings,
    substring_dup_pairs,
    suffix_array,
)
from fastqdedup_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_media_features,
    frame_sample_plan,
    synth_media,
)


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(1)
    rows = [(i, rng.standard_normal(16).astype(float).tolist()) for i in range(200)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def test_brute_force_topk_exact(spark, vectors):
    queries = vectors.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = brute_force_topk(vectors, queries, k=5, vec_col="embedding")
    rows = res.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    # verify against numpy ground truth
    data = {r.vec_id: np.array(r.embedding) for r in vectors.collect()}
    for qid, got in by_q.items():
        q = data[qid] / np.linalg.norm(data[qid])
        scores = {
            vid: float(v @ q / np.linalg.norm(v)) for vid, v in data.items()
        }
        want = sorted(scores, key=lambda v: (-scores[v], v))[:5]
        assert [r.vec_id for r in sorted(got, key=lambda r: r.rank)] == want
        assert got[0].query_id == qid
    # self-match is always rank 1 with score 1
    assert all(
        r.score == pytest.approx(1.0) for r in rows if r.rank == 1 and r.vec_id == r.query_id
    )


def test_lsh_topk_recall(spark, vectors):
    queries = vectors.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = brute_force_topk(vectors, queries, k=3)
    approx = lsh_topk(vectors, queries, dim=16, k=3, n_bits=4)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    # bucketed ANN must at least find every query's own vector
    assert all((q, q) in a for q in [r.query_id for r in queries.collect()])
    assert len(e & a) / len(e) > 0.3  # loose: 4-bit buckets prune hard


def test_lsh_topk_multi_probe_recall(spark):
    """VERDICT r1 #9: multi-probe lifts bucket-LSH recall. On a corpus
    with genuine near neighbors (clustered families — the regime ANN is
    for), probing the Hamming-<=2 neighborhood at 8 bits must reach
    >= 0.95 recall of the exact top-3, where the single-bucket probe
    does not."""
    rng = np.random.default_rng(11)
    rows = []
    for fam in range(40):
        center = rng.standard_normal(16)
        for j in range(4):  # 4 noisy members per family, cosine ~0.99
            v = center + rng.standard_normal(16) * 0.05
            rows.append((fam * 10 + j, v.tolist()))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.filter(F.col("vec_id") % 10 == 0).limit(15).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(corpus, queries, k=3)
    probed = lsh_topk(corpus, queries, dim=16, k=3, n_bits=8, multi_probe=2)
    single = lsh_topk(corpus, queries, dim=16, k=3, n_bits=8, multi_probe=0)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    p = {(r.query_id, r.vec_id) for r in probed.collect()}
    s = {(r.query_id, r.vec_id) for r in single.collect()}
    assert len(e & p) / len(e) >= 0.95
    assert len(e & p) > len(e & s)  # the probe knob actually adds recall
    # ranks stay unique per query even though probes overlap
    ranks = {}
    for r in probed.collect():
        ranks.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in ranks.values())


def test_ivf_topk_exhaustive_matches_brute_force(spark, vectors):
    """n_probe = n_list probes every inverted list, so IVF must equal
    the exact brute-force top-k — neighbor ids AND ranks."""
    from fastqdedup_spark.operators.similarity import ivf_topk

    queries = vectors.limit(4).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = brute_force_topk(vectors, queries, k=5)
    ivf = ivf_topk(vectors, queries, k=5, n_list=8, n_probe=8)
    e = {(r.query_id, r.vec_id, r.rank) for r in exact.collect()}
    i = {(r.query_id, r.vec_id, r.rank) for r in ivf.collect()}
    assert i == e


def test_ivf_topk_probe_knob_recall(spark):
    """On a clustered-family corpus (the ANN regime), n_probe is the
    recall knob: 4-of-16 lists reaches >= 0.9 recall of the exact
    top-3, 1-of-16 strictly less; a vector lands in exactly ONE list
    (disjoint inverted lists -> no dedup pass), and the whole operator
    is deterministic across runs (sample centroids, no k-means)."""
    from fastqdedup_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(23)
    rows = []
    for fam in range(40):
        center = rng.standard_normal(16)
        for j in range(4):
            v = center + rng.standard_normal(16) * 0.05
            rows.append((fam * 10 + j, v.tolist()))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.filter(F.col("vec_id") % 10 == 0).limit(15).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r.query_id, r.vec_id) for r in brute_force_topk(corpus, queries, k=3).collect()}
    wide_rows = ivf_topk(corpus, queries, k=3, n_list=16, n_probe=4).collect()
    wide = {(r.query_id, r.vec_id) for r in wide_rows}
    narrow = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(corpus, queries, k=3, n_list=16, n_probe=1).collect()
    }
    assert len(exact & wide) / len(exact) >= 0.9
    assert len(exact & wide) > len(exact & narrow)
    # a neighbor's list assignment is query-independent: the same
    # vec_id always reports the same list_id
    lists = {}
    for r in wide_rows:
        assert lists.setdefault(r.vec_id, r.list_id) == r.list_id
    # deterministic across runs
    rerun = {
        (r.query_id, r.vec_id, r.list_id, r.rank)
        for r in ivf_topk(corpus, queries, k=3, n_list=16, n_probe=4).collect()
    }
    assert rerun == {(r.query_id, r.vec_id, r.list_id, r.rank) for r in wide_rows}


def test_cosine_dup_pairs_bucketed_matches_exact(spark):
    """VERDICT r1 #2: the default (bucketed, no driver collect) path
    must find the same pair set as the exact broadcast matmul on a
    corpus with planted near-dup families."""
    from fastqdedup_spark.operators.similarity import cosine_dup_pairs

    rng = np.random.default_rng(7)
    rows = []
    for i in range(150):
        v = rng.standard_normal(32)
        rows.append((i, v.tolist()))
        if i % 3 == 0:  # planted near-dup: tiny perturbation
            rows.append((i + 10_000, (v * 1.01 + 0.001).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = cosine_dup_pairs(df, threshold=0.99, method="broadcast")
    bucketed = cosine_dup_pairs(df, threshold=0.99)  # default: bucketed
    e = {(r.id_a, r.id_b) for r in exact.collect()}
    b = {(r.id_a, r.id_b) for r in bucketed.collect()}
    assert len(e) >= 50  # the planted families are actually there
    assert b == e


def test_suffix_array_known():
    s = np.frombuffer(b"banana", dtype=np.uint8)
    sa = suffix_array(s)
    assert sa.tolist() == [5, 3, 1, 0, 4, 2]
    lcp = lcp_kasai(s, sa)
    assert lcp.tolist() == [0, 1, 3, 0, 0, 2]


def test_partition_repeated_substrings(spark):
    shared = "x = compute_the_common_helper_function(alpha, beta, gamma); " * 3
    rows = [
        (0, "prefix zero " + shared + " suffix zero"),
        (1, "prefix one one " + shared + " tail one"),
        (2, "nothing in common here at all with the others truly"),
    ]
    df = spark.createDataFrame(rows, "id long, content_norm string").coalesce(1)
    got = partition_repeated_substrings(df, min_len=40).collect()
    pairs = {(r.id_a, r.id_b) for r in got}
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)
    assert all(r.length >= 40 for r in got)


def test_winnowing_substring_pairs(spark):
    shared = "def shared_helper(a, b):\n    return normalize(a) + normalize(b)\n" * 4
    rows = [
        (0, "import os\n" + shared + "print('zero')"),
        (1, "import sys\n" + shared + "print('one')"),
        (2, "class Unrelated:\n    pass\n" * 10),
        (3, "other text entirely, no shared blocks at all " * 6),
    ]
    df = spark.createDataFrame(rows, "id long, content_norm string")
    got = substring_dup_pairs(df, k=25, w=40).collect()
    pairs = {(r.id_a, r.id_b) for r in got}
    assert (0, 1) in pairs
    assert not any(2 in p or 3 in p for p in pairs)


def test_media_features_deterministic(spark):
    media = synth_media(spark, 30)
    feats = extract_media_features(media, dim=16)
    rows = feats.select("media_id", "mime", "n_bytes", "features").collect()
    assert len(rows) == 30
    assert all(len(r.features) == 16 for r in rows)
    by_id = {r.media_id: r for r in rows}
    # planted dup: media 7 is a byte-copy of media 4 -> identical features
    assert by_id[7].features == by_id[4].features
    mimes = {r.mime for r in rows}
    assert {"image/png", "audio/wav", "video/mp4"} <= mimes


def test_media_decode_stub_raises(spark):
    media = synth_media(spark, 2)
    with pytest.raises(NotImplementedError):
        extract_media_features(media, decode=True)


def test_frame_sample_plan(spark):
    media = synth_media(spark, 9).filter(F.col("kind") == "video")
    frames = frame_sample_plan(media, every_ms=1000)
    counts = frames.groupBy("media_id").count().collect()
    durations = {r.media_id: r.duration_ms for r in media.collect()}
    for r in counts:
        expected = (durations[r.media_id] - 1) // 1000 + 1
        assert r["count"] == expected


def test_cosine_dup_pairs_boundary_recall(spark):
    """VERDICT r2 #10: recall of the bucketed (multi-table sign-LSH)
    path measured against the broadcast-exact path on a corpus planted
    AT the threshold boundary (pairs at cosine ~0.992 vs threshold
    0.99 — the worst case for hyperplane LSH). Deterministic seeds, so
    the measured recall is stable run-to-run."""
    from fastqdedup_spark.operators.similarity import cosine_dup_pairs

    rng = np.random.default_rng(7)
    dim, n = 32, 150
    base = rng.standard_normal((n, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # partner at an exact angle: v2 = cos(t) v + sin(t) u, u ⟂ v
    t = np.arccos(0.992)
    raw = rng.standard_normal((n, dim))
    u = raw - (raw * base).sum(axis=1, keepdims=True) * base
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    partners = np.cos(t) * base + np.sin(t) * u
    rows = [(i, base[i].tolist()) for i in range(n)]
    rows += [(n + i, partners[i].tolist()) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {
        (r.id_a, r.id_b)
        for r in cosine_dup_pairs(df, 0.99, method="broadcast").collect()
    }
    assert len(exact) >= n  # every planted pair clears the threshold
    bucketed = {
        (r.id_a, r.id_b)
        for r in cosine_dup_pairs(df, 0.99, method="bucketed").collect()
    }
    assert bucketed <= exact  # exact verify: precision 1.0
    recall = len(bucketed & exact) / len(exact)
    assert recall >= 0.99, f"boundary recall {recall:.4f} < 0.99"


def test_media_decode_with_pil(spark):
    """Real-codec decode path: only runs where Pillow is installed."""
    pytest.importorskip("PIL")
    media = synth_media(spark, n=6)
    out = extract_media_features(media, dim=16, decode=True)
    rows = out.collect()
    assert len(rows) == 6
    # synth payloads are not valid images -> null features, but the
    # plumbing (schema, batch shape) must hold
    assert all(len(r.features) == 16 for r in rows if r.features is not None)


def test_media_decode_without_pil_raises(spark):
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed; the no-codec path is not reachable")
    except ImportError:
        pass
    media = synth_media(spark, n=2)
    with pytest.raises(NotImplementedError, match="Pillow"):
        extract_media_features(media, decode=True)


def test_audio_kernel_decodes_pcm_wav():
    """Pure-kernel matrix (no Spark): valid PCM -> normalized spectral
    histogram concentrated at the sine's band; corrupt -> None."""
    from fastqdedup_spark.operators.multimodal import (
        decode_wav_samples,
        spectral_histogram,
        synth_wav,
    )

    low, high = synth_wav(200.0), synth_wav(3500.0)
    xl, xh = decode_wav_samples(low), decode_wav_samples(high)
    assert xl is not None and len(xl) == 2000 and abs(float(xl.max()) - 0.5) < 0.01
    fl, fh = spectral_histogram(xl, 16), spectral_histogram(xh, 16)
    assert abs(float(fl.sum()) - 1.0) < 1e-5
    # 200 Hz at 8 kHz rate -> first of 16 bands; 3500 Hz -> bin 875 of
    # 1001, band 13 under array_split's uneven 63/62-bin bands
    assert int(np.argmax(fl)) == 0 and int(np.argmax(fh)) == 13
    assert decode_wav_samples(b"RIFF" + b"\x00" * 40) is None
    assert decode_wav_samples(b"not audio at all") is None


def test_audio_decode_matrix(spark):
    """Spark-side matrix mirroring the image decode tests (VERDICT r3
    #8): valid wavs -> real features, dup payloads -> identical
    features, non-audio payloads -> null features, schema holds."""
    from fastqdedup_spark.operators.multimodal import (
        extract_audio_features,
        synth_wav,
    )

    wav_a, wav_b = synth_wav(440.0), synth_wav(1200.0)
    rows = [
        (0, "audio", bytearray(wav_a), "", 0, 0, 250),
        (1, "audio", bytearray(wav_b), "", 0, 0, 250),
        (2, "audio", bytearray(wav_a), "", 0, 0, 250),   # dup of 0
        (3, "video", bytearray(b"\x00\x00\x00junk"), "", 0, 0, 1000),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in extract_audio_features(media, dim=16).collect()}
    assert len(out) == 4
    assert out[0].mime == "audio/wav" and out[0].n_bytes == len(wav_a)
    assert out[0].features is not None and len(out[0].features) == 16
    assert out[0].features == out[2].features          # dup -> identical
    assert out[0].features != out[1].features          # different tone
    assert out[3].features is None                     # no video codec


def test_video_kernel_decodes_y4m():
    """Pure-kernel matrix (no Spark), mirroring the audio kernel test:
    valid y4m -> ordered constant-luma planes; corrupt / truncated /
    compressed-container-without-pyav -> None."""
    from fastqdedup_spark.operators.multimodal import (
        _parse_y4m,
        decode_video_frames,
        synth_y4m,
    )

    p = synth_y4m([32, 100, 200])
    assert len(p) == 37 + 3 * (6 + 16 * 16 * 3 // 2)  # closed-form bytes
    frames, fps = decode_video_frames(p)
    assert fps == 10.0 and len(frames) == 3
    assert [int(f[0, 0]) for f in frames] == [32, 100, 200]  # order holds
    assert all(f.shape == (16, 16) and (f == f[0, 0]).all() for f in frames)
    assert decode_video_frames(b"\x00\x00\x00junk") is None  # mp4, no codec
    assert decode_video_frames(b"not video at all") is None
    assert _parse_y4m(p[:-10]) is None                 # truncated frame
    assert _parse_y4m(b"YUV4MPEG2 W16 H16") is None    # header only


def test_video_decode_matrix(spark):
    """Spark-side matrix mirroring the audio decode tests (VERDICT r4
    #6): valid y4m -> per-sampled-frame histograms in timestamp order,
    dup payloads -> identical features, non-video payloads -> null
    features, schema holds."""
    from fastqdedup_spark.operators.multimodal import (
        extract_video_features,
        synth_y4m,
    )

    vid_a = synth_y4m([40, 40, 200])   # 3 frames @10fps = 300 ms
    vid_b = synth_y4m([90, 90, 10])
    rows = [
        (0, "video", bytearray(vid_a), "", 16, 16, 300),
        (1, "video", bytearray(vid_b), "", 16, 16, 300),
        (2, "video", bytearray(vid_a), "", 16, 16, 300),   # dup of 0
        (3, "audio", bytearray(b"RIFFjunk"), "", 0, 0, 250),
        (4, "video", bytearray(b"\x00\x00\x00junk"), "", 0, 0, 1000),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r.media_id: r
        for r in extract_video_features(media, dim=16, every_ms=100).collect()
    }
    assert len(out) == 5
    assert out[0].mime == "video/x-yuv4mpeg" and out[0].n_bytes == len(vid_a)
    assert out[0].n_frames == 3 and len(out[0].frame_feats) == 3
    # constant-luma frames -> one-hot histograms at luma//16, in order
    assert [ff.index(max(ff)) for ff in out[0].frame_feats] == [2, 2, 12]
    # mean of [2/3 @ bin2, 1/3 @ bin12]
    assert abs(out[0].features[2] - 2 / 3) < 1e-6
    assert out[0].features == out[2].features          # dup -> identical
    assert out[0].features != out[1].features
    assert out[3].features is None                     # audio payload
    assert out[4].features is None                     # mp4 without pyav
    assert out[4].mime == "video/mp4"                  # sniff still real


def test_audio_decode_fake_path_matches_image_contract(spark):
    """decode=False: deterministic-fake features, same as the image
    operator's default path."""
    from fastqdedup_spark.operators.multimodal import extract_audio_features

    media = synth_media(spark, n=6)
    rows = extract_audio_features(media, dim=8, decode=False).collect()
    assert all(len(r.features) == 8 for r in rows)


def test_sniff_riff_disambiguation_and_video_codec_guard():
    """RIFF is a container family: WAVE -> audio, 'AVI ' -> video,
    anything else unknown (a bare RIFF->wav mapping mislabeled AVI
    payloads as audio). And payloads that positively sniff as
    image/audio must never reach the video codec: pyav's image2
    demuxer happily decodes a PNG as a 1-frame video, which would give
    images video features in pyav-present environments and break q21's
    NULL-features-for-images contract."""
    from fastqdedup_spark.operators.multimodal import (
        decode_video_frames,
        sniff_mime,
        synth_wav,
    )

    wav = synth_wav(440.0)
    assert sniff_mime(wav) == "audio/wav"
    avi = b"RIFF" + (1234).to_bytes(4, "little") + b"AVI " + b"\x00" * 16
    assert sniff_mime(avi) == "video/x-msvideo"
    assert sniff_mime(b"RIFFjunk") == "application/octet-stream"
    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
    assert decode_video_frames(png) is None
    assert decode_video_frames(wav) is None
