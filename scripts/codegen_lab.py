"""Codegen lab for the est-Jaccard prefilter expression (VERDICT r3 #1).

The 128-term byte-compare expression lands inside the broadcast-join
consume method (`bhj_doConsume_0`) and overflows janino's hard 64 KB
per-method limit, so the whole pair stage silently runs without
whole-stage codegen.  This lab reproduces the exact plan shape (raw pair
stream -> two broadcast sig joins -> est Project -> filter -> agg) with
MATERIALIZED sig columns (localCheckpoint — synthetic F.array columns
inline the array build into every element_at and fake the failure) and
measures each candidate fix for (a) codegen compile errors, (b) wall
time, (c) result equality.

Run: python scripts/codegen_lab.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyspark.sql.functions as F

from fastqdedup_spark.session import get_spark

N_WORDS = 16  # 128 bins / 8 per long
_BYTE_MASK = 0x0101010101010101


def est_flat(sig_a, sig_b):
    """Round-3 shipped code: flat 128 byte-compares, balanced Add tree."""
    terms = []
    for w in range(N_WORDS):
        xa = F.element_at(sig_a, w + 1)
        xb = F.element_at(sig_b, w + 1)
        for byte in range(8):
            sh = 8 * byte
            terms.append(
                (
                    F.shiftrightunsigned(xa, sh).bitwiseAND(F.lit(255))
                    == F.shiftrightunsigned(xb, sh).bitwiseAND(F.lit(255))
                ).cast("int")
            )
    while len(terms) > 1:
        terms = [
            terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def est_xor_flat(sig_a, sig_b):
    """Half the operand traffic: one XOR per word, 8 zero-byte tests."""
    terms = []
    for w in range(N_WORDS):
        x = F.element_at(sig_a, w + 1).bitwiseXOR(F.element_at(sig_b, w + 1))
        for byte in range(8):
            terms.append(
                (F.shiftrightunsigned(x, 8 * byte).bitwiseAND(F.lit(255)) == 0)
                .cast("int")
            )
    while len(terms) > 1:
        terms = [
            terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def est_swar(sig_a, sig_b):
    """Per-word zero-byte count via OR-collapse + bit_count:
    x = xa^xb; t = x|x>>1; t|=t>>2; t|=t>>4; matched = 8 - bit_count(t & 0x0101..).
    ~7 long ops + one bit_count per word -> 16 small terms summed."""
    words = []
    for w in range(N_WORDS):
        x = F.element_at(sig_a, w + 1).bitwiseXOR(F.element_at(sig_b, w + 1))
        t = x.bitwiseOR(F.shiftrightunsigned(x, 1))
        t = t.bitwiseOR(F.shiftrightunsigned(t, 2))
        t = t.bitwiseOR(F.shiftrightunsigned(t, 4))
        words.append(
            F.lit(8) - F.bit_count(t.bitwiseAND(F.lit(_BYTE_MASK)))
        )
    while len(words) > 1:
        words = [
            words[i] + words[i + 1] if i + 1 < len(words) else words[i]
            for i in range(0, len(words), 2)
        ]
    return words[0].cast("int")


def _word_flat(sig_a, sig_b, w):
    """Word w's byte-match count: flat 8 byte-compares (shipped semantics)."""
    xa = F.element_at(sig_a, w + 1)
    xb = F.element_at(sig_b, w + 1)
    terms = [
        (
            F.shiftrightunsigned(xa, 8 * byte).bitwiseAND(F.lit(255))
            == F.shiftrightunsigned(xb, 8 * byte).bitwiseAND(F.lit(255))
        ).cast("int")
        for byte in range(8)
    ]
    while len(terms) > 1:
        terms = [
            terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def _word_swar(sig_a, sig_b, w):
    x = F.element_at(sig_a, w + 1).bitwiseXOR(F.element_at(sig_b, w + 1))
    t = x.bitwiseOR(F.shiftrightunsigned(x, 1))
    t = t.bitwiseOR(F.shiftrightunsigned(t, 2))
    t = t.bitwiseOR(F.shiftrightunsigned(t, 4))
    return (F.lit(8) - F.bit_count(t.bitwiseAND(F.lit(_BYTE_MASK)))).cast("int")


def _split_sum(words):
    """Sum per-word terms, each duplicated as (w+w)>>1 so subexpression
    elimination hoists every word into its own generated method (small,
    JIT-able) instead of inlining 16 words into the host consume fn."""
    dup = [F.shiftright(w + w, 1) for w in words]
    while len(dup) > 1:
        dup = [
            dup[i] + dup[i + 1] if i + 1 < len(dup) else dup[i]
            for i in range(0, len(dup), 2)
        ]
    return dup[0]


def est_flat_split(sig_a, sig_b):
    return _split_sum([_word_flat(sig_a, sig_b, w) for w in range(N_WORDS)])


def est_swar_split(sig_a, sig_b):
    return _split_sum([_word_swar(sig_a, sig_b, w) for w in range(N_WORDS)])


_PAIR_MASK = 0x5555555555555555


def est_2bit(sig_a, sig_b):
    """2-bit-per-bin sketch (4 longs = 128 bins x 2 bits): matched bins =
    128 - popcount of per-pair OR-collapsed XOR. ~25 expression nodes."""
    terms = []
    for w in range(4):
        x = F.element_at(sig_a, w + 1).bitwiseXOR(F.element_at(sig_b, w + 1))
        t = x.bitwiseOR(F.shiftrightunsigned(x, 1)).bitwiseAND(F.lit(_PAIR_MASK))
        terms.append(F.lit(32) - F.bit_count(t))
    return (terms[0] + terms[1] + terms[2] + terms[3]).cast("int")


VARIANTS = {
    "flat128": est_flat,
    "xor_flat": est_xor_flat,
    "swar_bitcount": est_swar,
    "flat_split": est_flat_split,
    "swar_split": est_swar_split,
    "est_2bit": est_2bit,
}


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_docs = 50_000
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # materialized sig table: 16 longs per row (realistic distribution:
    # random bytes, so est ~ 0.4% false byte-match rate between rows)
    sigs = (
        spark.range(n_docs)
        .withColumn(
            "sig_packed",
            F.array(*[F.xxhash64("id", F.lit(w)) for w in range(N_WORDS)]),
        )
        .localCheckpoint(eager=True)
    )
    pairs = (
        spark.range(n_pairs)
        .select(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_docs)).alias("id_a"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_docs)).alias("id_b"),
        )
        .localCheckpoint(eager=True)
    )
    ga = sigs.select(F.col("id").alias("id_a"), F.col("sig_packed").alias("sig_a"))
    gb = sigs.select(F.col("id").alias("id_b"), F.col("sig_packed").alias("sig_b"))

    nondet_zero = (F.rand(42) * F.lit(0.0)).cast("int")
    results = {}
    for name, fn in VARIANTS.items():
        df = (
            pairs.join(F.broadcast(ga), "id_a")
            .join(F.broadcast(gb), "id_b")
            .withColumn("est_matches", fn(F.col("sig_a"), F.col("sig_b")))
            .filter((F.col("est_matches") + nondet_zero) >= 0)
            .groupBy()
            .agg(F.sum("est_matches").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        t0 = time.monotonic()
        row = df.collect()[0]
        dt = time.monotonic() - t0
        # second run (warm)
        t0 = time.monotonic()
        df.collect()
        dt2 = time.monotonic() - t0
        results[name] = (row["s"], row["n"], dt, dt2)
        print(f"{name:16s} sum={row['s']} n={row['n']} cold={dt:.2f}s warm={dt2:.2f}s", flush=True)

    sums = {r[0] for r in results.values()}
    print(f"AGREE={len(sums) == 1}")
    spark.stop()


if __name__ == "__main__":
    main()
