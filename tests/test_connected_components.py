"""Connected-components operator tests — including the deep-chain case
a plain O(diameter) hash-min would silently mislabel under the
iteration cap."""

import pyspark.sql.functions as F

from fastqdedup_spark.operators.connected_components import connected_components


def _labels(df):
    return {r.id: r.cluster_id for r in df.collect()}


def test_path_graph_converges_in_log_rounds(spark):
    """300-node path: diameter 299 >> the 50-round cap. Pointer doubling
    must still converge, in O(log n) rounds, to one component."""
    n = 300
    edges = spark.createDataFrame(
        [(f"n{i:04d}", f"n{i + 1:04d}") for i in range(n - 1)], "id_a string, id_b string"
    )
    labels, rounds = connected_components(edges, max_iterations=50)
    got = _labels(labels)
    assert len(got) == n
    assert set(got.values()) == {"n0000"}
    assert rounds <= 12, f"expected O(log n) rounds, took {rounds}"


def test_disjoint_components_and_determinism(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "y"), ("z", "y"), ("p", "q")],
        "id_a string, id_b string",
    )
    labels, _ = connected_components(edges)
    got = _labels(labels)
    assert got == {
        "a": "a", "b": "a", "c": "a",
        "x": "x", "y": "x", "z": "x",
        "p": "p", "q": "p",
    }


def test_star_graph_one_round_ish(spark):
    edges = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(50)], "id_a string, id_b string"
    )
    labels, rounds = connected_components(edges)
    got = _labels(labels)
    assert set(got.values()) == {"hub"}
    assert rounds <= 3
