"""Interleaved two-cluster-size scaling protocol (the BASELINE gate).

The sandbox's external load arrives in ~10-minute waves, so nesting all
of one width's trials inside one window biases the comparison. This
runner interleaves widths ACROSS waves — rep 1: [wide, narrow], rep 2:
[narrow, wide], ... — each cell a fresh pinned JVM running
scaling_bench's child (best-of-trials inside), and reports per-width
best-of-all-reps with the load stamp of the winning run.

Usage: python scripts/scaling_matrix.py [n_files] [narrow] [wide] [reps]
Defaults: 192000 8 32 2.
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))


def run_child(cores: int, n_files: int) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEMORY",
                   "8g" if n_files <= 400_000 else "24g")  # BASELINE.md r5: oversized heap taxes width
    # stamp BEFORE launching: load1m after a wide child is mostly the
    # child's own decaying load, not the ambient level it ran under
    load_at_launch = round(os.getloadavg()[0], 1)
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable,
         os.path.join(HERE, "scaling_bench.py"), "--child", str(cores), str(n_files)],
        capture_output=True, text=True, check=True, env=env,
    )
    json_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not json_lines:
        # a bare [-1] here died with IndexError and no hint of which
        # child failed or what it printed
        raise RuntimeError(
            f"scaling child (cores={cores}) exited 0 without a JSON "
            f"line.\nstdout:\n{out.stdout[-2000:]}\nstderr:\n{out.stderr[-2000:]}"
        )
    rec = json.loads(json_lines[-1])
    rec["load_at_launch"] = load_at_launch
    print(json.dumps(rec), flush=True)
    return rec


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 192_000
    narrow = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    wide = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    if narrow >= wide:
        raise SystemExit(f"narrow ({narrow}) must be < wide ({wide})")
    best = {narrow: None, wide: None}
    order = [wide, narrow]
    for rep in range(reps):
        for cores in order:
            rec = run_child(cores, n_files)
            if best[cores] is None or rec["sec"] < best[cores]["sec"]:
                best[cores] = rec
        order.reverse()
    tp_n = best[narrow]["files_per_sec"]
    tp_w = best[wide]["files_per_sec"]
    # true division: wide // narrow floor-rounded non-multiple width
    # pairs (e.g. 12 -> 32 read as 2x instead of 2.67x), overstating
    # efficiency and potentially flipping the 0.8 gate
    ratio = wide / narrow
    eff = tp_w / (ratio * tp_n)
    print(json.dumps({
        "n_files": n_files,
        f"throughput_local{narrow}": tp_n,
        f"throughput_local{wide}": tp_w,
        f"scaling_efficiency_{narrow}_to_{wide}": round(eff, 3),
        "loads": {str(c): best[c]["load1m"] for c in (narrow, wide)},
        "target": 0.8,
        "pass": eff >= 0.8,
    }), flush=True)


if __name__ == "__main__":
    main()
