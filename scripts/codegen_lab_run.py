"""Steady-state runner for one est variant (fresh JVM per variant).

Job A (2M pairs) pays janino + JIT warm-up; job B (20M pairs, separate
localCheckpoint so no shuffle-stage reuse) gives the steady-state wall.
Usage: python scripts/codegen_lab_run.py <variant>
"""
import sys, os, time, io, re, contextlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pyspark.sql.functions as F
from fastqdedup_spark.session import get_spark
import importlib.util

spec = importlib.util.spec_from_file_location(
    "lab", os.path.join(os.path.dirname(os.path.abspath(__file__)), "codegen_lab.py"))
lab = importlib.util.module_from_spec(spec)
spec.loader.exec_module(lab)

variant = sys.argv[1]
fn = lab.VARIANTS[variant]
spark = get_spark(master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
n_docs = 50_000
sigs = (
    spark.range(n_docs)
    .withColumn("sig_packed", F.array(*[F.xxhash64("id", F.lit(w)) for w in range(16)]))
    .localCheckpoint(eager=True)
)
ga = sigs.select(F.col("id").alias("id_a"), F.col("sig_packed").alias("sig_a"))
gb = sigs.select(F.col("id").alias("id_b"), F.col("sig_packed").alias("sig_b"))
nz = (F.rand(42) * F.lit(0.0)).cast("int")


def run(n_pairs, salt):
    pairs = (
        spark.range(n_pairs)
        .select(
            F.pmod(F.xxhash64("id", F.lit(salt)), F.lit(n_docs)).alias("id_a"),
            F.pmod(F.xxhash64("id", F.lit(salt + 1)), F.lit(n_docs)).alias("id_b"),
        )
        .localCheckpoint(eager=True)
    )
    df = (
        pairs.join(F.broadcast(ga), "id_a")
        .join(F.broadcast(gb), "id_b")
        .withColumn("est_matches", fn(F.col("sig_a"), F.col("sig_b")))
        .filter((F.col("est_matches") + nz) >= 0)
        .groupBy()
        .agg(F.sum("est_matches").alias("s"))
    )
    t0 = time.monotonic()
    s = df.collect()[0]["s"]
    return time.monotonic() - t0, s, df


dt_a, s_a, df = run(2_000_000, 1)
dt_b, s_b, _ = run(20_000_000, 7)
# host-method size from the codegen dump (AQE off clone of the plan)
spark.conf.set("spark.sql.adaptive.enabled", "false")
_, _, df2 = run(1_000, 99)
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    df2.explain("codegen")
lines = buf.getvalue().split("\n")
meths = [
    (i, l.strip()) for i, l in enumerate(lines)
    if re.search(r"(private|protected|public)\s+[\w\[\]<>.]+\s+\w+\(", l)
]
maxlen, maxsig = 0, ""
for i, (ln, sig) in enumerate(meths):
    end = meths[i + 1][0] if i + 1 < len(meths) else len(lines)
    if end - ln > maxlen:
        maxlen, maxsig = end - ln, sig
print(
    f"RESULT {variant} warm2M={dt_a:.2f}s steady20M={dt_b:.2f}s sum={s_b} "
    f"biggest_method~{maxlen}L [{maxsig[:80]}]",
    flush=True,
)
spark.stop()
