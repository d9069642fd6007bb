"""Pure-Python reference oracle.

Computes ground truth for the Spark pipeline at small scale: exact
pairwise similarity graph -> single-linkage connected components ->
cluster dissection. Semantics pinned by the reference:

- connected components == the transitive closure `Trie.pop_cluster`
  extracts by BFS over radius probes
  (/root/reference/src/fastqdedup/_triemodule.c:778-897); single-linkage
  partitions are order-independent, so union-find reproduces them.
- dissection methods match /root/reference/src/fastqdedup/__init__.py:
  directional (2n-1 rule, lines 60-91), highest_count (94-102),
  adjacency (105-122). Tie-breaks follow the reference exactly: tuples
  (count, key) are sorted, so ties go to the lexicographically greatest
  key.

These functions are ALSO the per-cluster kernels the Spark pipeline
ships into `applyInPandas` (operators/dissect.py) — one implementation,
tested once against the reference's golden fixtures
(/root/reference/tests/test_fastqdedup.py:38-97,
/root/reference/tests/test_trie.py:75-136).

The implementations are written fresh for batch use (index-based
worklists over parallel arrays rather than the reference's
list-popping generators), but produce identical survivor sets.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Iterator, List, Sequence, Tuple

from fastqdedup_spark.functions.distances import within_distance


# ---------------------------------------------------------------------------
# union-find connected components
# ---------------------------------------------------------------------------

class _UnionFind:
    def __init__(self, n: int) -> None:
        self.parent = list(range(n))

    def find(self, x: int) -> int:
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def connected_components_oracle(
    keys: Sequence[str],
    max_distance: int = 1,
    use_edit_distance: bool = False,
) -> List[int]:
    """O(n^2) exact single-linkage labels. labels[i] == labels[j] iff
    keys i and j are connected through pairs within max_distance."""
    n = len(keys)
    uf = _UnionFind(n)
    for i in range(n):
        for j in range(i + 1, n):
            if within_distance(keys[i], keys[j], max_distance, use_edit_distance):
                uf.union(i, j)
    return [uf.find(i) for i in range(n)]


def oracle_pairs(
    keys: Sequence[str],
    max_distance: int = 1,
    use_edit_distance: bool = False,
) -> List[Tuple[int, int]]:
    """All (i, j) index pairs within the radius — the recall denominator."""
    return [
        (i, j)
        for i in range(len(keys))
        for j in range(i + 1, len(keys))
        if within_distance(keys[i], keys[j], max_distance, use_edit_distance)
    ]


def oracle_jaccard_pairs(
    shingle_sets: Sequence[set], threshold: float
) -> List[Tuple[int, int]]:
    """Exact Jaccard >= threshold pairs over shingle sets (MinHash truth)."""
    out = []
    for i in range(len(shingle_sets)):
        for j in range(i + 1, len(shingle_sets)):
            a, b = shingle_sets[i], shingle_sets[j]
            if not a and not b:
                continue
            inter = len(a & b)
            if inter / (len(a) + len(b) - inter) >= threshold:
                out.append((i, j))
    return out


# ---------------------------------------------------------------------------
# cluster dissection kernels (shared with operators/dissect.py)
# ---------------------------------------------------------------------------

Cluster = List[Tuple[int, str]]
WithinFn = Callable[[str, str], bool]


def _make_within(
    max_distance: int, use_edit_distance: bool, within: WithinFn | None
) -> WithinFn:
    """Comparison predicate: the reference's Hamming/edit radius by
    default; the code domain passes a Jaccard predicate instead (the
    `cmp` values are then normalized contents, not short keys)."""
    if within is not None:
        return within
    return lambda a, b: within_distance(a, b, max_distance, use_edit_distance)


def jaccard_within(threshold: float, k: int) -> WithinFn:
    """Code-domain predicate: exact char-k-gram Jaccard >= threshold.

    Dissection calls the predicate O(cluster^2) times; re-shingling both
    texts per call made it O(n^2) re-encoding. The attached `.prepare`
    hook lets the dissection kernel shingle each member ONCE (the `cmp`
    values become frozensets); the predicate accepts either raw strings
    or pre-shingled sets."""
    from fastqdedup_spark.functions.minhash import shingle_set

    def _set(x) -> frozenset:
        return x if isinstance(x, (set, frozenset)) else shingle_set(x, k)

    def fn(a, b) -> bool:
        sa, sb = _set(a), _set(b)
        if not sa and not sb:
            return True
        inter = len(sa & sb)
        return inter / (len(sa) + len(sb) - inter) >= threshold

    fn.prepare = lambda values: [_set(v) for v in values]  # type: ignore[attr-defined]
    return fn


def cluster_dissection_highest_count(
    cluster: Cluster, max_distance: int = 1, use_edit_distance: bool = False,
    cmp: Sequence[str] | None = None, within: WithinFn | None = None,
) -> Iterator[str]:
    """Survivor = the (count, key)-max member; ties -> greatest key.
    Ref: __init__.py:94-102."""
    yield max(cluster)[1]


def cluster_dissection_adjacency(
    cluster: Cluster, max_distance: int = 1, use_edit_distance: bool = False,
    cmp: Sequence[str] | None = None, within: WithinFn | None = None,
) -> Iterator[str]:
    """Repeatedly: survivor = current (count, key)-max; drop everything
    within radius of it; recurse on the remainder. Ref: __init__.py:105-122.

    `cmp[i]` (default: the key itself) is what the predicate compares —
    the code domain passes normalized contents while keys stay shas."""
    wfn = _make_within(max_distance, use_edit_distance, within)
    cmp = list(cmp) if cmp is not None else [k for _, k in cluster]
    order = sorted(range(len(cluster)), key=lambda i: cluster[i], reverse=True)
    remaining = order
    while remaining:
        t = remaining[0]
        yield cluster[t][1]
        remaining = [m for m in remaining[1:] if not wfn(cmp[t], cmp[m])]


def cluster_dissection_directional(
    cluster: Cluster, max_distance: int = 1, use_edit_distance: bool = False,
    cmp: Sequence[str] | None = None, within: WithinFn | None = None,
) -> Iterator[str]:
    """UMI-tools directional method. Survivor = highest-(count, key)
    member ("origin"); grow its chain: member m is absorbed by any chain
    template t when 2*count(m) - 1 <= count(t) AND within radius;
    absorbed members become templates themselves; repeat on leftovers.
    Ref: __init__.py:60-91 (the 2n-1 rule is line 84).

    Implemented as an explicit frontier queue over an index worklist
    (the reference mutates Python lists in a generator loop)."""
    wfn = _make_within(max_distance, use_edit_distance, within)
    cmp = list(cmp) if cmp is not None else [k for _, k in cluster]
    order = sorted(range(len(cluster)), key=lambda i: cluster[i], reverse=True)
    counts = [cluster[i][0] for i in order]
    keys = [cluster[i][1] for i in order]
    cmps = [cmp[i] for i in order]
    alive = [True] * len(order)
    for start in range(len(order)):
        if not alive[start]:
            continue
        alive[start] = False
        yield keys[start]
        frontier = [start]
        while frontier:
            t = frontier.pop()
            for m in range(len(order)):
                if not alive[m]:
                    continue
                if 2 * counts[m] - 1 <= counts[t] and wfn(cmps[t], cmps[m]):
                    alive[m] = False
                    frontier.append(m)


def cluster_dissection_canonical(
    cluster: Cluster, max_distance: int = 1, use_edit_distance: bool = False,
    cmp: Sequence[str] | None = None, within: WithinFn | None = None,
) -> Iterator[str]:
    """Graft-only 'keep-canonical-file' method for the code domain
    (BASELINE.json north_star): exactly one deterministic survivor per
    cluster — the lexicographically smallest key. No reference
    counterpart; count-agnostic so resilient to ingestion order."""
    yield min(key for _, key in cluster)


CLUSTER_DISSECTION_METHODS: Dict[str, Callable[..., Iterator[str]]] = {
    "highest_count": cluster_dissection_highest_count,
    "adjacency": cluster_dissection_adjacency,
    "directional": cluster_dissection_directional,
    "canonical": cluster_dissection_canonical,
}


def oracle_survivors(
    counted_keys: Iterable[Tuple[int, str]],
    method: str = "directional",
    max_distance: int = 1,
    use_edit_distance: bool = False,
) -> set:
    """Full oracle: counted keys -> CC -> dissect -> survivor key set."""
    items = list(counted_keys)
    keys = [k for _, k in items]
    labels = connected_components_oracle(keys, max_distance, use_edit_distance)
    clusters: Dict[int, Cluster] = {}
    for item, label in zip(items, labels):
        clusters.setdefault(label, []).append(item)
    fn = CLUSTER_DISSECTION_METHODS[method]
    survivors: set = set()
    for cluster in clusters.values():
        survivors.update(fn(cluster, max_distance, use_edit_distance))
    return survivors
