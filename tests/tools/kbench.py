"""Quick fill-kernel timing harness: ns per 64-lane step, GCUPS.

Usage: python tests/tools/kbench.py [trace|notrace|both] [B] [L]
Measures the production make_fill_pallas on the attached chip with
min-of-N timing (PERF_NOTES.md: per-point noise on the tunneled
backend is additive spikes; min-of-3+ per point).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", ".."))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from minialign_tpu.dp import band  # noqa: E402
from minialign_tpu.params import ScoreParams  # noqa: E402


def workload(B, L, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 4, (B, L)).astype(np.int8)
    b = a.copy()
    mut = rng.random((B, L)) < 0.12
    b[mut] = rng.integers(0, 4, int(mut.sum()))
    la = -(-(L + band.TAIL_N + 128) // 128) * 128
    ab = np.full((B, la), band.NCODE, np.int8)
    bb = np.full((B, la), band.NCODE, np.int8)
    ab[:, :L] = a
    bb[:, :L] = b
    alen = np.full(B, L, np.int32)
    blen = np.full(B, L, np.int32)
    return ab, alen, bb, blen


def measure(trace, B=128, L=20480, runs=6, **mk_kw):
    from minialign_tpu.dp.pallas_fill import make_fill_pallas
    p = ScoreParams(matrix=tuple(2 if (i & 3) == (i >> 2) else -4
                                 for i in range(16)),
                    gi=4, ge=2, gfa=3, gfb=3, xdrop=50)
    ab, alen, bb, blen = workload(B, L)
    max_blocks = (2 * L + 2 * band.TAIL_N) // band.BLK + 2
    fill = make_fill_pallas(p, 64, max_blocks=max_blocks, trace=trace,
                            **mk_kw)
    ab_d, bb_d = jax.device_put(ab), jax.device_put(bb)
    alen_d, blen_d = jax.device_put(alen), jax.device_put(blen)

    t0 = time.perf_counter()
    r = fill(ab_d, alen_d, bb_d, blen_d)
    np.asarray((r[0] if trace else r).max_score)
    compile_s = time.perf_counter() - t0

    # enqueue all runs back-to-back, sync once: per-dispatch RPC on the
    # tunneled backend (~30 ms) overlaps with device compute this way
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        rs = [fill(ab_d, alen_d, bb_d, blen_d) for _ in range(runs)]
        for r in rs:
            np.asarray((r[0] if trace else r).max_score)
        best = min(best, (time.perf_counter() - t0) / runs)
    res = rs[-1][0] if trace else rs[-1]
    n_steps = int(np.asarray(res.n_steps).sum())
    # device-executed vector steps: chunks run sequentially, all lanes
    # of a chunk in lockstep (per-chunk steps = max over its problems,
    # = per-problem steps here since the workload is uniform)
    nchunk = -(-B // 128)
    dev_steps = n_steps / B * nchunk
    ns_step = best * 1e9 / dev_steps
    gcups = n_steps * 64 / best / 1e9
    return dict(ns_step=round(ns_step, 1), gcups=round(gcups, 2),
                wall_ms=round(best * 1e3, 2), compile_s=round(compile_s, 1),
                n_steps=n_steps)


def measure_R(trace, B=128, L=20480, R=4, runs=4, **mk_kw):
    """Wall time for R chained fills inside ONE jit (one dispatch):
    per-dispatch overhead is paid once regardless of R, so
    (t(R2) - t(R1)) / (R2 - R1) is pure device compute. The chain
    (result feeds a 0-contribution into the next call's lengths)
    defeats CSE and forces sequential execution."""
    from minialign_tpu.dp.pallas_fill import make_fill_pallas
    p = ScoreParams(matrix=tuple(2 if (i & 3) == (i >> 2) else -4
                                 for i in range(16)),
                    gi=4, ge=2, gfa=3, gfb=3, xdrop=50)
    ab, alen, bb, blen = workload(B, L)
    max_blocks = (2 * L + 2 * band.TAIL_N) // band.BLK + 2
    fill = make_fill_pallas(p, 64, max_blocks=max_blocks, trace=trace,
                            **mk_kw)
    import jax.numpy as jnp

    def chain(a, al, b, bl):
        tot = jnp.int32(0)
        for _ in range(R):
            # data-dependent no-op (tot is always >= 0, but XLA cannot
            # prove it): defeats CSE across the R chained calls
            r = fill(a, jnp.where(tot >= 0, al, al - 1), b, bl)
            res = r[0] if trace else r
            tot = tot + jnp.max(res.n_steps)
        return tot

    g = jax.jit(chain)
    args = [jax.device_put(x) for x in (ab, alen, bb, blen)]
    np.asarray(g(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        rs = [g(*args) for _ in range(runs)]
        for r in rs:
            np.asarray(r)   # block_until_ready lies on this backend
        best = min(best, (time.perf_counter() - t0) / runs)
    return best


def slope_R(trace, B=128, L=20480, R1=1, R2=5, **mk_kw):
    t1 = measure_R(trace, B, L, R1, **mk_kw)
    t2 = measure_R(trace, B, L, R2, **mk_kw)
    nchunk = -(-B // 128)
    steps = (2 * L + 2 * band.TAIL_N - 2) * nchunk  # plim-bound steps
    ns = (t2 - t1) * 1e9 / ((R2 - R1) * steps)
    return dict(ns_step_compute=round(ns, 1),
                gcups_compute=round(64 * 128 / ns, 2),
                t_R1_ms=round(t1 * 1e3, 2), t_R2_ms=round(t2 * 1e3, 2))


def slope(trace, B1=128, B2=512, L=20480, runs=6, **mk_kw):
    """Per-step COMPUTE time via same-process two-size slope: the
    tunneled backend adds a per-dispatch floor (~26 ms round 3) that
    drifts across processes, so raw wall numbers are overhead-bound at
    small B. (t(B2) - t(B1)) / (extra device steps) cancels it."""
    r1 = measure(trace, B1, L, runs, **mk_kw)
    r2 = measure(trace, B2, L, runs, **mk_kw)
    steps1 = r1["n_steps"] / B1 * (-(-B1 // 128))
    steps2 = r2["n_steps"] / B2 * (-(-B2 // 128))
    ns = (r2["wall_ms"] - r1["wall_ms"]) * 1e6 / (steps2 - steps1)
    return dict(ns_step_compute=round(ns, 1),
                gcups_compute=round(64 * 128 / ns, 2),
                raw_B1=r1, raw_B2=r2)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 20480
    if mode == "slope":
        for tr in (False, True):
            r = slope(tr, L=L)
            print(("trace:  " if tr else "notrace:"),
                  {k: r[k] for k in ("ns_step_compute", "gcups_compute")},
                  "raw512:", r["raw_B2"]["wall_ms"], "ms")
        sys.exit(0)
    if mode == "slopeR":
        for tr in (False, True):
            r = slope_R(tr, B=B, L=L)
            print(("trace:  " if tr else "notrace:"), r)
        sys.exit(0)
    if mode in ("notrace", "both"):
        print("notrace:", measure(False, B, L))
    if mode in ("trace", "both"):
        print("trace:  ", measure(True, B, L))
