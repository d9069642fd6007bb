"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Generates the `files(repo, path, commit, lang, content)` table from
BASELINE.json input_hint with planted duplicate structure mirroring the
mutation patterns the reference's tests exercise:

- byte-identical copies   (exact-dup tier; ref trie count increments,
  /root/reference/src/fastqdedup/_triemodule.c:233-239)
- small token edits       (near-dup tier; ref radius membership,
  /root/reference/src/fastqdedup/distances.h:8-88)
- a shared license header on a fraction of files (hot-band skew driver)
- repeated function bodies across unrelated files (suffix-array tier)

Generation is DISTRIBUTED and ORDER-INDEPENDENT: `spark.range(n)` +
`mapInPandas`, with every row's bytes derived purely from
(seed, file_id) via numpy SeedSequence — the same table materializes
regardless of partitioning, so it scales to any SF and any cluster
size without a driver-side loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_WORDS = (
    "buffer index offset stream batch record schema column partition shard "
    "hash merge probe scan filter project join sort spill flush token parse "
    "node edge label rank score weight bucket window frame state queue stack "
    "read write open close seek tell sync lock retry yield await spawn"
).split()

_LICENSE = (
    "// Copyright (c) Example Authors. All rights reserved.\n"
    "// Licensed under the Apache License, Version 2.0 (the \"License\");\n"
    "// you may not use this file except in compliance with the License.\n"
    "// You may obtain a copy of the License at http://example.org/LICENSE\n"
)

_LANGS = ["py", "java", "c", "js", "txt"]

FILES_SCHEMA = (
    "id long, repo string, path string, commit string, lang string, "
    "content string, family_id long, kind string"
)

# family layout: member 0 = base, 1-2 = exact copies, 3-5 = near-dups,
# 6+ = unrelated singletons sharing only the family's repo
_FAMILY_SIZE = 8
_N_EXACT = 2
_N_NEAR = 3


def _base_content(rng: np.random.Generator, with_header: bool) -> list:
    """A fake source file as a token list (~80-200 tokens)."""
    n_lines = int(rng.integers(12, 30))
    tokens = []
    if with_header:
        tokens.append(_LICENSE)
    for _ in range(n_lines):
        line_len = int(rng.integers(4, 9))
        # integers(0, n) draws the SAME stream as choice(n) (replace=True,
        # p=None is implemented as exactly this call) without choice's
        # per-call shape/validation overhead — measured 57% of _gen_batch
        # CPU; byte-identity pinned by tests/test_corpus_gen.py
        words = rng.integers(0, len(_WORDS), size=line_len)
        tokens.append(" ".join(_WORDS[w] for w in words) + "\n")
    return tokens


def _mutate(tokens: list, rng: np.random.Generator, n_edits: int) -> list:
    """Token-level substitutions/inserts/deletes — the near-dup edit model."""
    out = list(tokens)
    for _ in range(n_edits):
        op = int(rng.integers(3))
        pos = int(rng.integers(1, max(2, len(out))))
        line = "# edited " + _WORDS[int(rng.integers(len(_WORDS)))] + "\n"
        if op == 0 and len(out) > 2:
            out[pos] = line
        elif op == 1:
            out.insert(pos, line)
        elif len(out) > 3:
            del out[pos]
    return out


def _gen_batch(ids: np.ndarray, seed: int) -> pd.DataFrame:
    rows = []
    # per-batch memo of each family's base token list: members 0-5 of a
    # family all derive from the SAME (seed, family, 0)-seeded stream, so
    # a batch holding a whole family rebuilt identical content six times.
    # The base is never mutated in place (_mutate copies), and a family
    # split across batches just computes it once per batch — byte
    # output is unchanged either way (tests/test_corpus_gen.py).
    base_memo: dict = {}
    for fid in ids:
        fid = int(fid)
        family = fid // _FAMILY_SIZE
        member = fid % _FAMILY_SIZE
        with_header = family % 3 == 0  # 1/3 of families share the license header
        row_rng = np.random.default_rng(np.random.SeedSequence([seed, family, member + 1]))
        if member <= _N_EXACT + _N_NEAR:
            # base_rng is row-local and consumed ONLY here, so building
            # the family base lazily (not for "unrelated" members, who
            # discard it) changes no byte of any row — it just skips
            # ~25% of the generation work
            base = base_memo.get(family)
            if base is None:
                base_rng = np.random.default_rng(
                    np.random.SeedSequence([seed, family, 0])
                )
                base = base_memo[family] = _base_content(base_rng, with_header)
        if member == 0:
            tokens, kind = base, "base"
        elif member <= _N_EXACT:
            tokens, kind = base, "exact"
        elif member <= _N_EXACT + _N_NEAR:
            tokens, kind = _mutate(base, row_rng, int(row_rng.integers(1, 4))), "near"
        else:
            tokens, kind = _base_content(row_rng, with_header), "unrelated"
        lang = _LANGS[family % len(_LANGS)]
        # same 20 draws, same lowercase-hex text, no per-byte format call
        commit = row_rng.integers(0, 256, 20).astype(np.uint8).tobytes().hex()
        rows.append(
            (
                fid,
                f"org/repo-{family % 97}",
                f"src/mod_{family}/file_{member}.{lang}",
                commit,
                lang,
                "".join(tokens),
                family,
                kind,
            )
        )
    return pd.DataFrame(
        rows,
        columns=["id", "repo", "path", "commit", "lang", "content", "family_id", "kind"],
    )


def generate_files(
    spark: SparkSession, n_files: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """The files table, generated in parallel across executors."""
    base = spark.range(0, n_files, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(it):
        for pdf in it:
            yield _gen_batch(pdf["id"].to_numpy(), seed)

    return base.mapInPandas(gen, FILES_SCHEMA)
