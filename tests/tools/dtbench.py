"""dtrace microbenchmark: time the device traceback walk on a
realistic 128 x 20 kb batch (the production dtrace dispatch shape).

Usage:  python tests/tools/dtbench.py [L] [B] [reps]

Timing discipline per PERF_NOTES.md: materialize with np.asarray
(block_until_ready returns early on tunneled backends), min-of-N.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from minialign_tpu.dp import band, dtrace
from minialign_tpu.dp.pallas_fill import make_fill_pallas
from minialign_tpu.params import ScoreParams


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    p = ScoreParams(matrix=tuple(2 if (i & 3) == (i >> 2) else -4
                                 for i in range(16)),
                    gi=4, ge=2, gfa=3, gfb=3, xdrop=60)
    W = 64
    rng = np.random.default_rng(7)
    seqs_a, seqs_b = [], []
    for _ in range(B):
        a = rng.integers(0, 4, L)
        b = a.copy()
        mut = rng.random(L) < 0.10
        b[mut] = rng.integers(0, 4, int(mut.sum()))
        for _ in range(12):                      # structural indels
            pos = int(rng.integers(0, len(b)))
            b = np.concatenate([b[:pos], rng.integers(0, 4, 5), b[pos:]])
        seqs_a.append(a)
        seqs_b.append(b[:L])
    ab, alen = band.pad_codes(seqs_a)
    bb, blen = band.pad_codes(seqs_b)
    max_blocks = -(-(2 * L + 128) // 32)
    t0 = time.perf_counter()
    fill = make_fill_pallas(p, W, max_blocks=max_blocks, trace=True)
    res, bufs = fill(ab, alen, bb, blen)
    res = type(res)(*(np.asarray(x) for x in res))
    print(f"fill done in {time.perf_counter() - t0:.1f}s  "
          f"median score {np.median(res.max_score):.0f}")

    dt = dtrace.make_device_traceback(p, W)
    t0 = time.perf_counter()
    rle, head, summary = dt(bufs.masks, bufs.dirs, bufs.iheads,
                      res.max_score, res.max_i, res.max_j)
    s = np.asarray(summary)
    print(f"dtrace compile+run {time.perf_counter() - t0:.1f}s  "
          f"bad={s[2].sum()} n_ops median {np.median(s[0]):.0f}")
    best = best_w = best_h = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        rle, head, summary = dt(bufs.masks, bufs.dirs, bufs.iheads,
                                res.max_score, res.max_i, res.max_j)
        if hasattr(summary, "copy_to_host_async"):
            summary.copy_to_host_async()
            head.copy_to_host_async()
        sm = np.asarray(summary)
        t1 = time.perf_counter()
        best_w = min(best_w, t1 - t0)
        tmax = int(sm[1].max())
        np.asarray(head)[:tmax]
        t2 = time.perf_counter()
        best_h = min(best_h, t2 - t0)
        np.asarray(rle[:tmax])
        best = min(best, time.perf_counter() - t0)
    print(f"dtrace walk: {best_w * 1e3:.1f} ms; +head "
          f"{best_h * 1e3:.1f} ms; +slice rle[:{tmax}] "
          f"{best * 1e3:.1f} ms  (B={B}, L={L}, CHAIN={dtrace.CHAIN}, "
          f"t_fin={sm[dtrace.SUMMARY_ROWS.index('t_fin')][0]})")


if __name__ == "__main__":
    main()
