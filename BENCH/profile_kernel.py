"""Per-family DRAM-scaling profile of the caption descriptor kernel.

Times each family of `_compute_from_flat` (functions/text_descriptors.py)
in isolation at 1 and P worker PROCESSES (separate address spaces — the
same concurrency shape as P Spark Python workers on one box), on the
SAME deterministic fixture captions the scaling job uses.  The per-family
1→P aggregate-throughput ratio localizes which pass hits the box's
shared-DRAM ceiling first — the evidence VERDICT round-3 item 9 asks for
("a profile proving the remaining traffic is irreducible", or a target
for the next traffic cut).

Run:  python BENCH/profile_kernel.py [--procs 32] [--rows 1024] [--iters N]
Writes one JSON to stdout; raw per-proc timings included.
"""
from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from profet_spark import fixtures  # noqa: E402
from profet_spark.functions import text_descriptors as td  # noqa: E402


def make_captions(nrows: int) -> pd.Series:
    return pd.Series(
        [fixtures.caption_for(f"img{k % 4096:08d}", k // 4096) for k in range(nrows)]
    )


def family_timers(caps: pd.Series):
    """(name, thunk) pairs; shared inputs precomputed ONCE (not timed) so
    each thunk measures only its own family's passes."""
    codes, row, lens, starts = td._flatten(caps)
    nrows = len(caps)
    letter = codes - np.uint8(65)
    cnt26 = np.bincount(row * 26 + letter, minlength=nrows * 26).reshape(nrows, 26)
    cnt26f = cnt26.astype(np.float64)
    pv = td._pairs(row)
    pair_feats = td._pair_features(letter, row, pv, nrows, lens)
    pos = np.arange(len(codes), dtype=np.int32) - starts[row]
    lens_row = lens[row]
    hyd = td._HYD[codes]
    flx = td._FLX[codes]

    def t_flatten():
        td._flatten(caps)

    def t_cnt26():
        np.bincount(row * 26 + letter, minlength=nrows * 26).reshape(nrows, 26)

    def t_pairs():
        td._pair_features(letter, row, pv, nrows, lens)

    def t_gathers():
        td._HYD[codes]
        td._FLX[codes]
        np.arange(len(codes), dtype=np.int32) - starts[row]
        lens[row]

    def t_comp():
        td._composition(cnt26, lens, nrows, {})

    def t_k2():
        td._kmer2_from_pairs(pair_feats, lens, {})

    def t_k3():
        td._kmer3(codes, row, lens, nrows, {})

    def t_ctd():
        td._ctd(codes, row, lens, starts, nrows, cnt26f, pair_feats, {})

    def t_scalars():
        td._scalars(hyd, flx, row, lens, nrows, cnt26f, pv, {})

    def t_prof():
        td._profile(hyd, lens, nrows, pos, lens_row, 9, "prof_hyd", {})
        td._profile(flx, lens, nrows, pos, lens_row, 5, "prof_flex", {})

    def t_pseaac():
        td._pseaac(hyd, row, lens, nrows, 5, {})

    def t_term():
        td._terminal(codes, row, lens, nrows, pos, lens_row, 15, {})

    def t_full():
        td._compute_from_flat(codes, row, lens, starts, nrows)

    return len(codes), [
        ("flatten", t_flatten), ("cnt26", t_cnt26), ("pair_feats", t_pairs),
        ("gathers", t_gathers), ("composition", t_comp), ("kmer2", t_k2),
        ("kmer3", t_k3), ("ctd", t_ctd), ("scalars", t_scalars),
        ("profiles", t_prof), ("pseaac", t_pseaac), ("terminal", t_term),
        ("FULL", t_full),
    ]


def worker(nrows: int, iters: int, barrier, q) -> None:
    caps = make_captions(nrows)
    nchars, fams = family_timers(caps)
    # warm every family once before the barrier so all procs time hot code
    for _, fn in fams:
        fn()
    res = {}
    for name, fn in fams:
        barrier.wait()
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        res[name] = time.perf_counter() - t0
    q.put((nchars, res))


def run_level(procs: int, nrows: int, iters: int):
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(procs)
    q = ctx.Queue()
    ps = [ctx.Process(target=worker, args=(nrows, iters, barrier, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    outs = [q.get() for _ in ps]
    for p in ps:
        p.join()
    nchars = outs[0][0]
    agg = {}
    for name in outs[0][1]:
        worst = max(o[1][name] for o in outs)  # barrier-aligned: wall = slowest proc
        agg[name] = {
            "mchar_s": round(procs * nchars * iters / worst / 1e6, 2),
            "wall_s": round(worst, 4),
        }
    return nchars, agg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=32)
    ap.add_argument("--rows", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    nchars, one = run_level(1, args.rows, args.iters)
    _, many = run_level(args.procs, args.rows, args.iters)
    table = {}
    for name in one:
        r = many[name]["mchar_s"] / one[name]["mchar_s"] / args.procs
        table[name] = {
            "mchar_s_1p": one[name]["mchar_s"],
            f"mchar_s_{args.procs}p": many[name]["mchar_s"],
            "scaling_eff": round(r, 3),
            "share_1p_pct": 0.0,  # filled below
        }
    full_1p = one["FULL"]["wall_s"]
    for name in one:
        if name != "FULL":
            table[name]["share_1p_pct"] = round(100 * one[name]["wall_s"] / full_1p, 1)
    print(json.dumps({
        "rows": args.rows, "chars_per_batch": nchars, "iters": args.iters,
        "procs": args.procs, "families": table,
    }, indent=2))


if __name__ == "__main__":
    main()
