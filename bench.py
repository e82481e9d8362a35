"""Benchmark: banded-DP fill throughput on the default device.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: a batch of long-read extension problems (20 kb reads at ~88%
identity, the PBSIM profile of the reference benchmarks) through the
W=64 no-trace fill — the hot kernel of the aligner.

Baseline: the reference maps hg38 x3 (9.2 Gb reads) in 648 s on 4
Skylake threads (README.md:51) = 14.2 Mbases/s; with ~2 extensions per
base at band width 64 that is ~3.6 GCUPS of effective banded-DP
throughput (BASELINE.md derived sizing). vs_baseline = GCUPS / 3.6.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_GCUPS = 3.6


def main():
    import jax

    from minialign_tpu.dp import band
    from minialign_tpu.params import ScoreParams

    p = ScoreParams(matrix=tuple(2 if (i & 3) == (i >> 2) else -4
                                 for i in range(16)),
                    gi=4, ge=2, gfa=3, gfb=3, xdrop=50)  # -xpacbio scoring

    B = int(os.environ.get("BENCH_B", "512"))
    L = int(os.environ.get("BENCH_L", "20480"))
    rng = np.random.default_rng(0)

    # ~88% identity mutated pairs (PBSIM accuracy profile)
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

    max_blocks = (2 * L + 2 * band.TAIL_N) // band.BLK + 2
    # anything but plain CPU is a TPU-like backend (incl. tunneled
    # platforms that report their own name, e.g. "axon")
    fill = None
    if jax.default_backend() != "cpu":
        from minialign_tpu.dp.pallas_fill import make_fill_pallas
        fill = make_fill_pallas(p, 64, max_blocks=max_blocks, trace=False)

    ab_d, bb_d = jax.device_put(ab), jax.device_put(bb)
    alen_d, blen_d = jax.device_put(alen), jax.device_put(blen)

    # warmup / compile (materialize to host: on tunneled backends
    # block_until_ready does not guarantee completion)
    try:
        res = fill(ab_d, alen_d, bb_d, blen_d)
        np.asarray(res.max_score)
    except Exception as e:
        # never leave the driver without a metric: fall back to the
        # (bit-identical, slower) XLA fill
        print(f"[bench] pallas path failed ({type(e).__name__}), "
              "falling back to the XLA fill", file=sys.stderr)
        fill = band.make_fill(p, 64, max_blocks=max_blocks, trace=False)
        res = fill(ab_d, alen_d, bb_d, blen_d)
        np.asarray(res.max_score)

    # sustained throughput: dispatch all runs, then sync once — a
    # tunneled backend adds ~30 ms of RPC latency per host round-trip,
    # which pipelined dispatches overlap (the production pipeline also
    # keeps many fills in flight)
    runs = 8
    t0 = time.perf_counter()
    results = [fill(ab_d, alen_d, bb_d, blen_d) for _ in range(runs)]
    for r in results:
        np.asarray(r.max_score)
    dt = (time.perf_counter() - t0) / runs
    res = results[-1]

    n_steps = int(np.asarray(res.n_steps).sum())
    cells = n_steps * 64
    gcups = cells / dt / 1e9
    print(json.dumps({
        "metric": "band_dp_gcups",
        "value": round(gcups, 3),
        "unit": "GCUPS (banded-DP cell updates/s, W=64)",
        "vs_baseline": round(gcups / REF_GCUPS, 3),
    }))


if __name__ == "__main__":
    main()
