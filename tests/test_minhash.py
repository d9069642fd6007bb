"""MinHash/OPH signer unit tests (no Spark needed)."""

import numpy as np
import pytest

from fastqdedup_spark.functions.minhash import (
    band_hashes_from_sig,
    kperm_signatures,
    minhash_batch,
    oph_signatures,
    shingle_set,
    shingle_window_hashes,
)

T1 = "the quick brown fox jumps over the lazy dog " * 10
T2 = T1.replace("lazy", "hazy")
T3 = "completely different content about spark shuffles and parquet " * 8


def true_jaccard(a, b, k=7):
    sa, sb = shingle_set(a, k), shingle_set(b, k)
    return len(sa & sb) / len(sa | sb)


def test_identical_texts_identical_signatures():
    sig = minhash_batch([T1, T2, T1], 7, 128, 42)
    assert (sig[0] == sig[2]).all()
    assert not (sig[0] == sig[1]).all()


def test_batch_split_invariance():
    joint = minhash_batch([T1, T2, T3], 7, 128, 42)
    for i, t in enumerate([T1, T2, T3]):
        solo = minhash_batch([t], 7, 128, 42)
        assert (joint[i] == solo[0]).all()


def test_estimate_tracks_true_jaccard():
    sig = minhash_batch([T1, T2, T3], 7, 128, 42)
    est12 = (sig[0] == sig[1]).mean()
    est13 = (sig[0] == sig[2]).mean()
    assert abs(est12 - true_jaccard(T1, T2)) < 0.2
    assert est13 < 0.05 and true_jaccard(T1, T3) < 0.05


def test_oph_vs_kperm_consistency():
    """Both schemes must agree on extremes: identical -> all-equal,
    disjoint -> (almost) none equal."""
    H, s, c = shingle_window_hashes([T1, T1, T3], 7)
    for fn in (oph_signatures, kperm_signatures):
        sig = fn(H, s, c, 128, 42)
        assert (sig[0] == sig[1]).all()
        assert (sig[0] == sig[2]).mean() < 0.05


def test_empty_and_short_rows():
    sig = minhash_batch(["", "abc", T1], 7, 128, 42)  # "abc" shorter than k
    u = sig.view(np.uint64)
    assert (u[0] == 0xFFFFFFFFFFFFFFFF).all()
    assert (u[1] == 0xFFFFFFFFFFFFFFFF).all()
    assert not (u[2] == 0xFFFFFFFFFFFFFFFF).all()


def test_band_hashes_deterministic_and_band_salted():
    sig = minhash_batch([T1, T1], 7, 128, 42)
    bh = band_hashes_from_sig(sig, 32, 42)
    assert (bh[0] == bh[1]).all()
    # identical values in different band positions must not collide
    assert len(np.unique(bh[0])) == 32


def test_shingle_set_excludes_boundary_junk():
    s1 = shingle_set("abcdefghij", 7)
    assert len(s1) == 4  # 10 - 7 + 1
    joint_H, starts, counts = shingle_window_hashes(["abcdefghij", "zzzzzzzzzz"], 7)
    assert counts.tolist() == [4, 4]
    # row 0's shingles unchanged by the following row
    assert set(joint_H[:4].tolist()) == s1


def test_content_chunk_bounds_scale_with_bytes_not_rows():
    """Regression: thresholds must track TOTAL PAYLOAD, not row count.
    The original np.arange(1, n)*target thresholds ran out once total
    bytes exceeded (n-1)*target and dumped the tail into one full-width
    chunk — exactly the DRAM-sweeping shape chunking exists to avoid."""
    from fastqdedup_spark.functions.minhash import content_chunk_bounds

    T = 256 * 1024
    big = np.full(100, 1_000_000, dtype=np.int64)  # 100 MB total
    chunks = list(content_chunk_bounds(big, T))
    assert max(int(big[lo:hi].sum()) for lo, hi in chunks) <= 1_000_000
    # a row longer than the target gets its own chunk (docstring)
    assert list(content_chunk_bounds(np.array([10 * T, 1, 1], dtype=np.int64), T)) == [
        (0, 1),
        (1, 3),
    ]
    # chunks partition [0, n) exactly, under any length mix
    for lens in (
        big,
        np.full(10, 100_000, dtype=np.int64),
        np.array([0, 0, 5, 0], dtype=np.int64),
        np.zeros(5, dtype=np.int64),
        np.zeros(0, dtype=np.int64),
    ):
        got = [i for lo, hi in content_chunk_bounds(lens, T) for i in range(lo, hi)]
        assert got == list(range(len(lens)))


def test_byte_gram_oracle_parity_on_non_ascii():
    """The engine shingles UTF-8 BYTE k-grams; the q14/q24 oracles
    replicate them via hex(encode(norm)) two-chars-per-byte windows.
    Pin the equivalence on NON-ASCII content (the fixtures are all
    ASCII, so a char-gram oracle regression would otherwise stay
    latent until the first multi-byte corpus)."""
    import duckdb

    from fastqdedup_spark.functions.minhash import shingle_window_hashes

    k = 7
    texts = [
        "héllo wörld héllo wörld",
        "héllo wörld héllo wold",
        "完全不同的文本内容",
    ]
    con = duckdb.connect()
    for t in texts:
        # engine: distinct byte-gram count (hashes are splitmix64 of
        # exact byte windows; distinct-count equality on these tiny
        # inputs means the window sets agree)
        H, starts, counts = shingle_window_hashes([t], k)
        engine_n = len(set(H[: counts[0]].tolist()))
        oracle_n = con.execute(
            """
            SELECT count(DISTINCT substr(hex(encode(?1)), 2*i - 1, 14))
            FROM unnest(range(1, octet_length(encode(?1)) - 5)) t(i)
            """,
            [t],
        ).fetchone()[0]
        assert engine_n == oracle_n, t
        assert counts[0] == len(t.encode()) - k + 1
        # a CHAR-gram oracle would disagree on these strings
        char_n = con.execute(
            "SELECT count(DISTINCT substr(?1, i, 7)) FROM unnest(range(1, length(?1) - 5)) t(i)",
            [t],
        ).fetchone()[0]
        assert char_n != oracle_n, t


def test_simhash_tokenizer_matches_re2_class():
    """Engine tokenization must match the q15 oracle's RE2 whitespace
    class ([\\t\\n\\f\\r ]) exactly: \\v and Unicode spaces (NBSP, NEL)
    are NOT separators in RE2 but ARE in python's str.split()."""
    from fastqdedup_spark.functions.simhash import _ws_tokens

    assert _ws_tokens("A\tb\nc\fd\re f") == ["a", "b", "c", "d", "e", "f"]
    assert _ws_tokens("a\x0bb") == ["a\x0bb"]          # \v: not RE2 \s
    assert _ws_tokens("a\xa0b") == ["a\xa0b"]          # NBSP
    assert _ws_tokens("a\x85b") == ["a\x85b"]          # NEL
