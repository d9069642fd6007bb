"""Candidate-pair verification (SURVEY.md M4) — keeps precision exact.

Re-grounds the reference's per-pair distance kernels
(/root/reference/src/fastqdedup/distances.h:8-88, exposed as
`within_distance`, _distancemodule.c:46-93) as Arrow-vectorized pandas
UDFs over candidate-pair DataFrames. Cheap-to-expensive ordering
mirrors the reference's fast-fail style: length prune, then vectorized
Hamming, then banded DP / shingle intersection only for survivors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from fastqdedup_spark.config import DedupConfig
from fastqdedup_spark.functions.distances import make_within_distance_udf
from fastqdedup_spark.functions.minhash import (
    content_chunk_bounds,
    shingle_window_hashes,
)


def _attach_pair_values(
    pairs: DataFrame, values: DataFrame, id_col: str, value_col: str
) -> DataFrame:
    """(id_a, id_b) + (id, value) -> (id_a, id_b, value_a, value_b).
    Two equi-joins on the id; at scale both sides hash-partition on the
    join key and AQE broadcasts `values` when it is small."""
    va = values.select(F.col(id_col).alias("id_a"), F.col(value_col).alias("value_a"))
    vb = values.select(F.col(id_col).alias("id_b"), F.col(value_col).alias("value_b"))
    return pairs.join(va, "id_a").join(vb, "id_b")


def verify_pairs_distance(
    pairs: DataFrame, keys: DataFrame, cfg: DedupConfig,
    id_col: str = "key", key_col: str = "key",
) -> DataFrame:
    """Reference-parity verification: keep pairs within
    Hamming/Levenshtein radius. Returns (id_a, id_b)."""
    udf = make_within_distance_udf(cfg.max_distance, cfg.use_edit_distance)
    withv = _attach_pair_values(pairs, keys, id_col, key_col)
    return withv.filter(udf("value_a", "value_b")).select("id_a", "id_b")


def make_jaccard_udf(k: int, cache_cap_bytes: int = 512 << 20):
    """Exact Jaccard over char-k-gram shingle sets of two text columns.

    Batch optimizations (hub documents appear in MANY candidate pairs —
    the hot-band skew shape):
    - texts are factorized per Arrow batch, so each distinct document's
      shingle set is hashed and uniqued ONCE per batch, not once per pair;
    - a per-TASK cache carries shingle sets ACROSS batches, so a
      document is shingled once per task, not once per batch. Measured
      without it (192k files): per-partition re-shingling made the
      verify stage's python work grow ~linearly with the partition
      count — 1135 executor-core-seconds at 32 partitions, flat wall
      8->32 cores. Callers co-partition pairs by id_a so each document's
      pairs concentrate in few tasks (verify_pairs_jaccard below);
    - intersections run via searchsorted on the pre-sorted unique arrays
      (no allocation, no re-sort) — the vectorized analog of the
      reference's fast-fail compare loop (distances.h:24-27).
    """

    # captured by the UDF closure: pickled empty with the task binary,
    # deserialized per task, and MUTATED across that task's batches.
    # Eviction is LRU-half (python dicts are insertion-ordered; hits
    # refresh recency via pop+reinsert) with incremental byte
    # accounting — the earlier clear-all-at-cap design THRASHED when a
    # task's distinct-doc footprint sat near the cap (768k files: the
    # verify stage burned ~5,000 executor-core-seconds re-shingling in
    # cycles, its wall identical at 8 and 32 cores).
    cache: dict = {}
    cache_bytes = [0]

    @F.pandas_udf(T.DoubleType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        import os as _os
        import time as _time

        _prof = _os.environ.get("FASTQDEDUP_VERIFY_PROF")
        _t0 = _time.monotonic()
        both = pd.concat([a.fillna(""), b.fillna("")], ignore_index=True)
        codes, uniques = pd.factorize(both)
        _t1 = _time.monotonic()
        missing = []
        for u in uniques:
            v = cache.pop(u, None)
            if v is None:
                missing.append(u)
            else:
                cache[u] = v  # reinsert: most-recently-used at the end
        if missing:
            # cache-resident chunks (see content_chunk_bounds): a cold
            # task's first batches shingle thousands of uncached docs
            # at once, and the whole-batch kernel call pays ~120 MB of
            # fresh-temporary allocation + DRAM sweep per numpy op
            mlens = np.fromiter(
                (len(u) for u in missing), dtype=np.int64, count=len(missing)
            )
            for lo, hi in content_chunk_bounds(mlens):
                H, starts, counts = shingle_window_hashes(missing[lo:hi], k)
                for i in range(hi - lo):
                    arr = np.unique(H[starts[i] : starts[i] + counts[i]])
                    cache[missing[lo + i]] = arr
                    cache_bytes[0] += arr.nbytes
        _t2 = _time.monotonic()
        sets = [cache[u] for u in uniques]
        n = len(a)
        ca, cb = codes[:n], codes[n:]
        out = np.zeros(n, dtype=np.float64)
        for i in range(n):
            xs, ys = sets[ca[i]], sets[cb[i]]
            nx, ny = len(xs), len(ys)
            if not nx and not ny:
                out[i] = 1.0  # both empty: identical
                continue
            if not nx or not ny:
                continue
            if nx > ny:
                xs, ys, nx, ny = ys, xs, ny, nx
            idx = np.searchsorted(ys, xs)
            idx[idx == ny] = ny - 1
            inter = int(np.count_nonzero(ys[idx] == xs))
            out[i] = inter / (nx + ny - inter)
        # evict AFTER the batch (this batch's entries sit at the MRU end
        # and `sets` holds its arrays regardless): LRU-half keeps hot
        # documents across the cap boundary
        if cache_bytes[0] > cache_cap_bytes:
            for key in list(cache)[: max(len(cache) // 2, 1)]:
                cache_bytes[0] -= cache[key].nbytes
                del cache[key]
        if _prof:
            _t3 = _time.monotonic()
            with open(_prof, "a") as f:
                f.write(
                    f"{_os.getpid()} n={n} uniq={len(uniques)} "
                    f"miss={len(missing)} fact={_t1 - _t0:.3f} "
                    f"shingle={_t2 - _t1:.3f} inter={_t3 - _t2:.3f}\n"
                )
        return pd.Series(out)

    # asNondeterministic = "evaluate exactly once, where declared".
    # Without it, Catalyst pushed the jaccard filter BELOW the locality
    # repartition — the UDF ran over the full pair stream on the
    # band-ordered pre-exchange partitioning (no locality, so the
    # per-task shingle cache never hit) and then re-ran a SECOND time
    # above the exchange for the output projection. Observed as two
    # ArrowEvalPython nodes straddling the Exchange in the verify plan.
    return _udf.asNondeterministic()


# Design note (measured, do not relearn): pre-serializing each doc's
# sorted shingle set in the signer and shipping it to verify instead of
# content ("packed kernel") removes ALL python-side shingling — but the
# payload is ~7x the normalized content (5.7 KB vs 0.8 KB per doc on
# the synthetic corpus), and the attach-join + repartition shuffle plus
# Arrow transfer of the fatter rows cost far more than the shingling
# saved: verify wall 94 s vs 18 s at 32 cores under comparable load.
# The text kernel + per-task cache + id_a co-partitioning is the
# winning combination; revisit packing only for corpora whose contents
# are much larger than their shingle sets.


_PAIR_MASK = 0x5555555555555555  # low bit of every 2-bit lane


def est_bin_match_prob(j: float) -> float:
    """P[a 2-bit sketch bin agrees] for true jaccard j: the bin carries
    the low 2 bits of the per-bin min-hash, so it agrees when the mins
    are equal (prob j) or collide in the low 2 bits (prob 1/4)."""
    return j + (1.0 - j) / 4.0


def est_min_matches(cfg: DedupConfig, j: float) -> int:
    """Matching-bin threshold equivalent to estimated-jaccard >= j
    (floor: the conservative direction for a keep-if-above filter)."""
    return int(est_bin_match_prob(j) * cfg.num_perm)


def est_jaccard_matches(
    cfg: DedupConfig, sig_a: str = "sig_a", sig_b: str = "sig_b"
) -> "F.Column":
    """Matching-bin count between `sig_a`/`sig_b` packed-sketch columns
    (2 bits per bin, 32 bins per long): XOR the words, OR-collapse each
    2-bit lane into its low bit, mask, and subtract the popcount — a
    2-bit lane is zero iff the bin agreed.

    Codegen history (do not relearn — measured, Spark 4.1, 20M pairs x
    local[8], scripts/codegen_lab.py):
    - byte-packed sketch, flat 128 comparison terms: the expression
      inlines into the host consume method (bhj_doConsume /
      hashAgg_doAggregateWithoutKey), ~20k generated lines -> janino
      "Code grows beyond 64 KB" -> whole stage falls back to the
      row-codegen operator path (5.9 s / 20M);
    - SWAR OR-pyramids per word: janino compiles (~10k lines) but the
      method exceeds HotSpot's 8 KB JIT limit -> interpreted BYTECODE,
      236 s / 20M — the worst mode, and it looks like a success in the
      logs;
    - per-word subexpression-duplication tricks do NOT shrink the host
      method (Spark hoists leaf pieces, not the big terms);
    - THIS form (~25 expression nodes, bit_count is a JIT intrinsic):
      936-line host method, fully JIT'd, 1.33 s / 20M — 4.4x the
      fallback, 177x the un-JITed SWAR.
    Keep the expression node count O(num_perm / 32); never reintroduce
    a per-bin comparison chain."""
    n_words = (cfg.num_perm + 31) // 32
    pad_bins = 32 * n_words - cfg.num_perm  # zero lanes in both sigs
    terms = []
    for w in range(n_words):
        x = F.element_at(sig_a, w + 1).bitwiseXOR(F.element_at(sig_b, w + 1))
        lane = x.bitwiseOR(F.shiftrightunsigned(x, 1)).bitwiseAND(F.lit(_PAIR_MASK))
        terms.append(F.lit(32) - F.bit_count(lane))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return (out - F.lit(pad_bins)).cast("int")


def est_prefilter(
    pairs: DataFrame, sigs: DataFrame, cfg: DedupConfig, id_col: str,
    keep_est: bool = False,
) -> DataFrame:
    """Estimated-Jaccard pre-filter (JVM-side): the semantic-skew pair
    flood (boilerplate headers -> quadratically many j~0.2 candidates)
    dies here before any shuffle, content, or Python is touched. The
    margin makes false drops statistically negligible (~4.6 sigma at
    j == threshold with 128 bins, P ~ 2e-6); the exact verify UDF keeps
    precision exact. `sigs` must carry (id_col, sig_packed).

    Map-side-ness is the point: with cfg.est_broadcast (default) the
    sketch table broadcasts EXPLICITLY, so the quadratic raw pair
    stream is filtered inside the same stage that produced it — it
    never hits an exchange. The knob is static configuration, not a
    mid-plan count() (no action, no barrier); beyond ~50M distinct
    contents flip it off and the joins run shuffled."""
    hint = F.broadcast if cfg.resolved_est_broadcast() else (lambda df: df)
    ga = sigs.select(F.col(id_col).alias("id_a"), F.col("sig_packed").alias("sig_a"))
    gb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig_packed").alias("sig_b"))
    min_matches = est_min_matches(cfg, cfg.jaccard_threshold - cfg.est_margin)
    # The zero-valued NON-DETERMINISTIC term pins the filter ABOVE the
    # est projection: Catalyst never pushes non-deterministic predicates
    # (and this one is a single comparison, so conjunct-splitting can't
    # peel a deterministic part off), so the est expression is evaluated
    # in a Project instead of being alias-substituted into the broadcast
    # join CONDITION (a join condition is generated as ONE inline blob).
    # With the 2-bit sketch the expression is small enough that either
    # placement compiles and JITs; the pin stays as cheap insurance
    # against the blob regrowing (e.g. a num_perm bump).
    nondet_zero = (F.rand(cfg.seed) * F.lit(0.0)).cast("int")
    out = (
        pairs.join(hint(ga), "id_a")
        .join(hint(gb), "id_b")
        .withColumn("est_matches", est_jaccard_matches(cfg))
        .filter((F.col("est_matches") + nondet_zero) >= min_matches)
    )
    cols = ["id_a", "id_b"] + (["est_matches"] if keep_est else [])
    return out.select(*cols)


def est_filter_carried(
    raw: DataFrame, cfg: DedupConfig, keep_est: bool = False,
) -> DataFrame:
    """est prefilter for cfg.est_transport == "carry": `raw` already
    carries `sig_packed_a`/`sig_packed_b` as band-join payload columns,
    so the filter is a pure streamed-row expression — zero hash probes
    per raw pair (the probe variant pays two random lookups into the
    sketch relations for every one of the ~60M raw pairs). Same
    threshold math and the same non-deterministic pushdown pin as
    est_prefilter."""
    min_matches = est_min_matches(cfg, cfg.jaccard_threshold - cfg.est_margin)
    nondet_zero = (F.rand(cfg.seed) * F.lit(0.0)).cast("int")
    out = raw.withColumn(
        "est_matches", est_jaccard_matches(cfg, "sig_packed_a", "sig_packed_b")
    ).filter((F.col("est_matches") + nondet_zero) >= min_matches)
    cols = ["id_a", "id_b"] + (["est_matches"] if keep_est else [])
    return out.select(*cols)


def mega_key_salt(pairs_per_key: int):
    """Subtask salt for hash-min cluster keys whose pair count exceeds
    the per-task budget (`_kcnt` > pairs_per_key): splits the key into
    ceil(_kcnt / budget) granules so one mega-component cannot park its
    whole pair list on a single python task.

    Salts on BOTH endpoints: near-dup components are not always
    cliques — band candidates are not transitive, so a boilerplate hub
    can form a star whose stored pairs all share id_a (hub = the
    component minimum). A single-endpoint salt is CONSTANT there and
    the split silently collapses back into one task; hashing the
    (id_a, id_b) pair always varies because the pair set is distinct.
    Mega-key subtasks trade shingle-cache locality for spread —
    straggler insurance is the point here.
    """
    budget = F.lit(pairs_per_key)
    return F.when(
        F.col("_kcnt") > budget,
        F.pmod(
            F.xxhash64("id_a", "id_b"),
            F.ceil(F.col("_kcnt") / budget).cast("long"),
        ),
    ).otherwise(F.lit(0))


def verify_pairs_jaccard(
    pairs: DataFrame, contents: DataFrame, cfg: DedupConfig,
    id_col: str = "sha", content_col: str = "content_norm",
    size_col: str | None = "n_shingles",
    skip_est: bool = False,
    approx_rows: float | None = None,
    metadata_broadcast: bool | None = None,
) -> DataFrame:
    """Code-domain verification: exact Jaccard >= threshold on
    normalized content. Returns (id_a, id_b, jaccard).

    `metadata_broadcast` overrides cfg.resolved_est_broadcast() for the
    sketch/size relations derived from `contents`: pass False when the
    caller cannot bound that table (the incremental path's contents
    include index survivors hit by the band join — unbounded by the
    increment's size), so AQE picks the join strategy from the REAL
    runtime size instead of a forced broadcast hint overriding Spark's
    own size guard. None keeps the batch pipeline's static resolution.

    When `size_col` (distinct-shingle counts from the signature stage)
    is available, pairs are pruned JVM-side BEFORE content ships to
    Python using the exact bound jaccard(A,B) <= min(|A|,|B|) /
    max(|A|,|B|) — a true upper bound, so the surviving pair set is
    identical, but skewed candidate floods (boilerplate bands) shrink
    inside whole-stage codegen.

    The kernel re-shingles content per batch with a per-task cache and
    id_a co-partitioning (see make_jaccard_udf and the packed-kernel
    design note above)."""
    jac = make_jaccard_udf(cfg.shingle_k)
    # Small per-doc METADATA (sketches, shingle sizes) broadcasts
    # explicitly under cfg.est_broadcast so pruning happens map-side.
    # The CONTENT table never broadcasts — it exceeds any broadcast
    # budget at real scale and building the broadcast is driver-serial;
    # its join stays a shuffled equi-join on id (the scan-shaped plan
    # that survives 100x data).
    use_bcast = (
        cfg.resolved_est_broadcast()
        if metadata_broadcast is None
        else metadata_broadcast
    )
    hint = F.broadcast if use_bcast else (lambda df: df)
    est_ran = skip_est  # upstream candidate generation already filtered
    if not skip_est and "sig_packed" in contents.columns and cfg.est_margin > 0:
        pairs = est_prefilter(
            pairs, contents.select(id_col, "sig_packed"), cfg, id_col
        )
        est_ran = True
    # The size bound jaccard(A,B) <= min(|A|,|B|)/max(|A|,|B|) is EXACT,
    # but it only runs when NO est prefilter did: measured at sf0.1 with
    # the JIT'd 2-bit est in place (scripts/ab_size_prune.py, best-of-2,
    # prune_off arm under HIGHER external load), its two extra joins
    # cost ~25-30% of the whole q14/docs-pipeline wall (4.18 -> 3.08 s,
    # 7.39 -> 5.68 s) while the est margin already keeps the survivor
    # stream too clean for the bound to earn its joins back.
    have_sizes = (
        not est_ran and size_col is not None and size_col in contents.columns
    )
    if have_sizes:
        sa = contents.select(
            F.col(id_col).alias("id_a"), F.col(size_col).alias("sz_a")
        )
        sb = contents.select(
            F.col(id_col).alias("id_b"), F.col(size_col).alias("sz_b")
        )
        pairs = (
            pairs.join(hint(sa), "id_a")
            .join(hint(sb), "id_b")
            .filter(
                (F.greatest("sz_a", "sz_b") == 0)
                | (
                    F.least("sz_a", "sz_b")
                    >= cfg.jaccard_threshold * F.greatest("sz_a", "sz_b")
                )
            )
            .select("id_a", "id_b")
        )
    # CPU-bound verify: fan out to full parallelism (AQE's byte-based
    # coalescing would run the pair kernel on a handful of cores) — but
    # partition by DOCUMENT, not round-robin: near-dup pairs are
    # clustered, so grouping a document's pairs into the same task lets
    # the UDF's per-task shingle cache amortize each document's
    # shingling across its pairs. Round-robin scattered every hot
    # document into every partition and the python re-shingling work
    # grew ~linearly with the partition count (the stage's 8->32-core
    # scaling was FLAT).
    #
    # Cluster orientation (cfg.verify_orient): key each pair by a
    # one-round hash-min label so each near-dup COMPONENT's pairs land
    # on one key (components are cliques; a clique's labels collapse to
    # its min id). The legacy (id_a, 4-way id_b salt) key measured a
    # 90% per-task cache MISS rate at 768k files — 1.01M misses for
    # 387k distinct docs — and shingling misses are 90% of verify's
    # python time (398 of 444 core-s, FASTQDEDUP_VERIFY_PROF). Degree
    # orientation (higher-degree endpoint as key) was measured first
    # and is NOT it: -18% misses, wall a wash — cliques have no hubs.
    # Hash-min keying predicts 397k misses, 2.6% off the ideal. The
    # labels come from the verified pair set itself; the ids-only lazy
    # localCheckpoint pins the upstream band join to a single
    # evaluation when `pairs` arrives unmaterialized (q14-style
    # callers). Keys above cfg.verify_pairs_per_key pairs split into
    # id_a-salted subtasks (mega-clique straggler insurance; skew costs
    # the most exactly where parallelism is widest: 53 -> 94 s at 192k
    # when one hot task landed at full width).
    sc = pairs.sparkSession.sparkContext
    ptasks = cfg.python_stage_tasks(sc, approx_rows)
    orient = cfg.resolved_verify_orient(sc, approx_rows)
    if orient:
        pairs = pairs.select("id_a", "id_b").localCheckpoint(eager=False)
        nb = pairs.select(
            F.col("id_a").alias("_v"), F.col("id_b").alias("_n")
        ).unionByName(pairs.select(F.col("id_b").alias("_v"), F.col("id_a").alias("_n")))
        lab = nb.groupBy("_v").agg(F.min("_n").alias("_mn"))
        lab = lab.select("_v", F.least("_mn", "_v").alias("_l"))
        pairs = (
            pairs.join(
                hint(lab.select(F.col("_v").alias("id_a"), F.col("_l").alias("_la"))),
                "id_a",
            )
            .join(
                hint(lab.select(F.col("_v").alias("id_b"), F.col("_l").alias("_lb"))),
                "id_b",
            )
            .withColumn("_key", F.least("_la", "_lb"))
            # _la/_lb are dead once _key exists; dropping them keeps
            # two 16-byte binaries per pair out of the content joins
            # and the verify exchange (only _key/_kcnt steer the
            # repartition below)
            .drop("_la", "_lb")
        )
        kcnt = pairs.groupBy("_key").agg(F.count(F.lit(1)).alias("_kcnt"))
        pairs = pairs.join(hint(kcnt), "_key")
    withv = _attach_pair_values(
        pairs, contents.select(id_col, content_col), id_col, content_col
    )
    if orient:
        withv = withv.repartition(
            ptasks, F.col("_key"), mega_key_salt(cfg.verify_pairs_per_key)
        )
    else:
        withv = withv.repartition(
            ptasks, "id_a", F.pmod(F.xxhash64("id_b"), F.lit(4))
        )
    return (
        withv.withColumn("jaccard", jac("value_a", "value_b"))
        .filter(F.col("jaccard") >= cfg.jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
