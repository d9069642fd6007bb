"""fastqdedup_spark — a from-scratch PySpark-native near-duplicate
detection & clustering engine with the capabilities of
rhpvorderman/fastqdedup (reference at /root/reference, read-only).

The reference clusters fixed-length keys by Hamming/Levenshtein radius
with an in-memory C prefix trie (``_triemodule.c``) and dissects each
cluster with the UMI-tools directional method (``__init__.py:60-91``).
This engine re-grounds the same semantics Spark-first:

- exact dedup      = groupBy(sha256)                (ref: trie count, _triemodule.c:233-239)
- radius search    = LSH band / pigeonhole banding  (ref: TrieNode_FindNearest, _triemodule.c:380-495)
- clustering       = DataFrame connected components (ref: pop_cluster, _triemodule.c:760-897)
- dissection       = applyInPandas per cluster      (ref: __init__.py:60-130)
- survivor output  = left-semi + first-wins window  (ref: filter_fastq_files_on_set, __init__.py:189-206)

Everything is DataFrame API + Arrow-vectorized pandas UDFs; no per-row
Python in any hot path.
"""

from fastqdedup_spark.functions.distances import (
    within_distance,
    within_hamming_distance,
    within_edit_distance,
)
from fastqdedup_spark.functions.quality import average_error_rate
from fastqdedup_spark.oracle import (
    cluster_dissection_adjacency,
    cluster_dissection_directional,
    cluster_dissection_highest_count,
    CLUSTER_DISSECTION_METHODS,
    connected_components_oracle,
)
from fastqdedup_spark.session import get_spark
from fastqdedup_spark.config import DedupConfig

__version__ = "0.1.0"

__all__ = [
    "within_distance",
    "within_hamming_distance",
    "within_edit_distance",
    "average_error_rate",
    "cluster_dissection_adjacency",
    "cluster_dissection_directional",
    "cluster_dissection_highest_count",
    "CLUSTER_DISSECTION_METHODS",
    "connected_components_oracle",
    "get_spark",
    "DedupConfig",
]
