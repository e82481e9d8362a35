"""Interleaved A/B kernel timing: builds each config's fill ONCE, then
interleaves timing rounds config-by-config so pool-chip contention
noise (the tunneled backend swings 2-5x across minutes) hits every
config equally. Reports min and median of per-round marginal rates.

Usage: python tests/tools/kbench_ab.py '[{"J":"8"},{"J":"32"}]' \
           [trace|notrace] [B] [L]
Each dict is env overrides applied before (re)importing pallas_fill.
B > 128 exercises the multi-chunk grid path (B=512 -> 4 chunks).
"""
import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from minialign_tpu.dp import band  # noqa: E402
from minialign_tpu.params import ScoreParams  # noqa: E402


def build(cfg, trace, B, L, max_blocks, p):
    for k, v in cfg.items():
        if not k.startswith("_"):
            os.environ["MINIALIGN_FILL_" + k] = str(v)
    import minialign_tpu.dp.pallas_fill as pf
    importlib.reload(pf)
    fill = pf.make_fill_pallas(p, 64, max_blocks=max_blocks, trace=trace)

    def chain(R):
        def f(a, al, b, bl):
            tot = jnp.int32(0)
            for _ in range(R):
                r = fill(a, jnp.where(tot >= 0, al, al - 1), b, bl)
                res = r[0] if trace else r
                tot = tot + jnp.max(res.n_steps)
            return tot
        return jax.jit(f)
    return fill, chain(1), chain(5)


def main():
    cfgs = json.loads(sys.argv[1]) if len(sys.argv) > 1 else \
        [{"J": "8"}, {"J": "32"}]
    trace = len(sys.argv) > 2 and sys.argv[2] == "trace"
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    L = int(sys.argv[4]) if len(sys.argv) > 4 else 20480
    p = ScoreParams(matrix=tuple(2 if (i & 3) == (i >> 2) else -4
                                 for i in range(16)),
                    gi=4, ge=2, gfa=3, gfb=3, xdrop=50)
    rng = np.random.default_rng(0)
    a = rng.integers(0, 4, (B, L)).astype(np.int8)
    b = a.copy()
    mut = rng.random((B, L)) < 0.12
    b[mut] = rng.integers(0, 4, int(mut.sum()))
    la = -(-(L + band.TAIL_N + 128) // 128) * 128
    ab = np.full((B, la), band.NCODE, np.int8)
    bb = np.full((B, la), band.NCODE, np.int8)
    ab[:, :L] = a
    bb[:, :L] = b
    args = [jax.device_put(x) for x in
            (ab, np.full(B, L, np.int32), bb, np.full(B, L, np.int32))]
    max_blocks = (2 * L + 2 * band.TAIL_N) // band.BLK + 2

    built = []
    for cfg in cfgs:
        # per-config batch override: {"_B": 128} times the same
        # workload truncated to the first _B problems (interleaved
        # single- vs multi-chunk comparison within one process)
        cb = int(cfg.get("_B", B))
        cargs = args if cb == B else [
            x[:cb] if x.ndim else x for x in
            (jax.device_put(np.asarray(y)[:cb]) for y in args)]
        t0 = time.perf_counter()
        fill, g1, g5 = build(cfg, trace, cb, L, max_blocks, p)
        np.asarray(g1(*cargs))
        np.asarray(g5(*cargs))
        print(f"built {cfg} in {time.perf_counter()-t0:.0f}s",
              flush=True)
        r = fill(*cargs)
        n_steps = int(np.asarray((r[0] if trace else r).n_steps).sum())
        built.append((cfg, g1, g5, n_steps, cargs))

    rates = {json.dumps(c[0]): [] for c in built}
    ROUNDS = 6
    for rnd in range(ROUNDS):
        for cfg, g1, g5, n_steps, cargs in built:
            ts = []
            for g in (g1, g5):
                t0 = time.perf_counter()
                rs = [g(*cargs) for _ in range(4)]
                for r_ in rs:
                    np.asarray(r_)
                ts.append((time.perf_counter() - t0) / 4)
            dt = (ts[1] - ts[0]) / 4
            if dt > 0:
                rates[json.dumps(cfg)].append(n_steps * 64 / dt / 1e9)
        print(f"round {rnd}: " + "  ".join(
            f"{k}={v[-1]:.0f}" if v else f"{k}=?"
            for k, v in rates.items()), flush=True)

    print("\n== summary (GCUPS, higher better) ==")
    for k, v in rates.items():
        if v:
            v = sorted(v)
            print(f"{k}: median {v[len(v)//2]:.1f}  max {v[-1]:.1f}  "
                  f"n={len(v)}")


if __name__ == "__main__":
    main()
