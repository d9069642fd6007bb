"""Golden-fixture parity for the pure-Python oracle (FIXTURES.md F2/F3;
reference: tests/test_fastqdedup.py:38-97, tests/test_trie.py:75-136)."""

from fastqdedup_spark.oracle import (
    CLUSTER_DISSECTION_METHODS,
    cluster_dissection_adjacency,
    cluster_dissection_directional,
    cluster_dissection_highest_count,
    connected_components_oracle,
    oracle_survivors,
)

TEST_CLUSTER = [
    (3, "AAAGT"),
    (10, "AAAAT"),
    (50, "AACAA"),
    (60, "AAAAA"),
    (10, "CAAAA"),
    (30, "CTAAA"),
]

TRIE_KEYS = [
    "AAAA", "AAAA", "AAAC", "AAGC", "AGGC", "CCCG",
    "CCCG", "TTCA", "TTCC", "TTTA", "TTT", "TTC",
]


def _clusters(keys, labels):
    out = {}
    for k, l in zip(keys, labels):
        out.setdefault(l, []).append(k)
    return {frozenset((ks.count(k), k) for k in set(ks)) for ks in out.values()}


def test_cc_hamming_golden():
    labels = connected_components_oracle(TRIE_KEYS, 1, False)
    expected = {
        frozenset({(2, "AAAA"), (1, "AAGC"), (1, "AAAC"), (1, "AGGC")}),
        frozenset({(2, "CCCG")}),
        frozenset({(1, "TTCA"), (1, "TTCC"), (1, "TTTA")}),
        frozenset({(1, "TTT"), (1, "TTC")}),
    }
    assert _clusters(TRIE_KEYS, labels) == expected


def test_cc_edit_golden():
    labels = connected_components_oracle(TRIE_KEYS, 1, True)
    expected = {
        frozenset({(2, "AAAA"), (1, "AAGC"), (1, "AAAC"), (1, "AGGC")}),
        frozenset({(2, "CCCG")}),
        frozenset({(1, "TTCA"), (1, "TTCC"), (1, "TTTA"), (1, "TTT"), (1, "TTC")}),
    }
    assert _clusters(TRIE_KEYS, labels) == expected


def test_highest_count():
    assert list(cluster_dissection_highest_count(TEST_CLUSTER)) == ["AAAAA"]


def test_adjacency():
    assert set(cluster_dissection_adjacency(TEST_CLUSTER)) == {
        "AAAAA", "CTAAA", "AAAGT",
    }


def test_directional():
    assert set(cluster_dissection_directional(TEST_CLUSTER)) == {
        "AACAA", "AAAAA", "CTAAA",
    }


def test_directional_long_chain():
    cluster = [
        (100, "GGGGGG"),
        (1, "GGGTGG"),
        (1, "GGGTTG"),
        (1, "GGCTTG"),
        (1, "GACTTG"),
        (2, "AACTTG"),
    ]
    assert set(cluster_dissection_directional(cluster)) == {"GGGGGG", "AACTTG"}


def test_all_same_cluster_every_method():
    cluster = [(7, "AAAA"), (1, "AAAT"), (1, "CAAA")]
    for name in ("highest_count", "adjacency", "directional"):
        fn = CLUSTER_DISSECTION_METHODS[name]
        assert set(fn(cluster)) == {"AAAA"}, name


def test_no_input_mutation():
    cluster = TEST_CLUSTER[:]
    snapshot = [tuple(t) for t in cluster]
    for fn in CLUSTER_DISSECTION_METHODS.values():
        list(fn(cluster))
        assert [tuple(t) for t in cluster] == snapshot


def test_oracle_survivors_end_to_end():
    counted = [(TRIE_KEYS.count(k), k) for k in sorted(set(TRIE_KEYS))]
    got = oracle_survivors(counted, "highest_count", 1, False)
    # one survivor per golden Hamming cluster, each the (count,key) max
    assert got == {"AAAA", "CCCG", "TTTA", "TTT"}


def test_canonical():
    assert set(CLUSTER_DISSECTION_METHODS["canonical"](TEST_CLUSTER)) == {"AAAAA"}
