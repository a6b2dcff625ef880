#!/usr/bin/env python
"""Weak-scaling companion to run_scaling.py (BASELINE.md §weak-scaling).

Strong scaling (run_scaling.py) holds the input FIXED and grows cores —
the sandbox proxy for "same job, bigger cluster". Weak scaling holds the
PER-CORE input fixed and grows cores with the data — the proxy that
matches the north-rule deployment story more closely: at 10^12-image
scale a 4N-executor cluster is given 4x the data per wall-clock window,
and the question is whether wall time stays flat.

Protocol: the replicate knobs scale the fixture Spark-side (entity
cardinality scales with rows, so per-core group structure is identical
at every level — scaling_job._replicate). Levels:

    local[8]  --replicate-text  4 --replicate-img 2   (R/4 rows)
    local[32] --replicate-text 16 --replicate-img 8   (R rows)

Weak-scaling efficiency = T_N / T_4N (ideal 1.0: 4x cores chew 4x data
in the same time). Reported alongside the strong numbers in
BENCH/BASELINE.md; raw output in BENCH/weak_scaling.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import BENCH, build_zip, spark_submit_bin  # noqa: E402

import subprocess


def run_level(cores: int, rep_text: int, rep_img: int, zpath: str,
              runs: int) -> dict:
    cmd = [
        spark_submit_bin(),
        "--master", f"local[{cores}]",
        "--driver-memory", "16g",
        "--py-files", zpath,
        os.path.join(BENCH, "scaling_job.py"),
        "--cores", str(cores), "--runs", str(runs),
        "--replicate-text", str(rep_text), "--replicate-img", str(rep_img),
    ]
    print("+", " ".join(cmd), file=sys.stderr)
    # the 0.705/0.769 passes ran with a single-thread BLAS pin; pin the
    # launcher env too (scaling_job.py also sets it in-process) so the
    # measured regime never depends on the invoking shell
    env = dict(os.environ,
               OPENBLAS_NUM_THREADS="1", OMP_NUM_THREADS="1",
               MKL_NUM_THREADS="1", NUMEXPR_NUM_THREADS="1")
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                         env=env)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if out.returncode != 0 or not lines:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"level local[{cores}] failed rc={out.returncode}")
    rec = json.loads(lines[-1])
    rec["cmd"] = " ".join(cmd)
    return rec


def main() -> None:
    runs = int(os.environ.get("SCALING_RUNS", "3"))
    # --out guards the committed per-round records: an unnamed rerun once
    # clobbered the richer two-pair history (round-3 incident)
    out_name = sys.argv[sys.argv.index("--out") + 1] \
        if "--out" in sys.argv else "weak_scaling.json"
    zpath = build_zip()
    lo = run_level(8, 4, 2, zpath, runs)
    hi = run_level(32, 16, 8, zpath, runs)
    t_lo, t_hi = min(lo["runs"]), min(hi["runs"])
    result = {
        "protocol": "per-core-constant rows; efficiency = T_N/T_4N (ideal 1.0)",
        "levels": {"8": lo, "32": hi},
        "rows_ratio": round(hi["rows"] / lo["rows"], 3),
        "t_min_8": t_lo,
        "t_min_32": t_hi,
        "weak_efficiency_8_to_32": round(t_lo / t_hi, 3),
    }
    with open(os.path.join(BENCH, out_name), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
