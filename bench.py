"""Benchmark driver: one JSON line with the round's headline metric —
end-to-end CLI mapping throughput (Mbases/s) — plus the banded-DP
kernel rates (no-trace AND trace mode) as companion fields.

Baselines (/root/reference/README.md:48-53, BASELINE.md):
  * E2E: the reference maps hg38 x3 (9.2 Gb reads) in 648 s on 4
    Skylake threads = 14.2 Mbases/s; vs_baseline = ours / 14.2.
  * kernel: the same workload implies ~3.6 GCUPS of effective
    banded-DP throughput on the reference host.

Workloads:
  * kernel: B x 20 kb PBSIM-profile (88% identity) extension pairs
    through the W=64 fill, slope-free sustained-rate measurement.
  * e2e: bench_e2e.py's CLI run (5 Mb genome, 500 x 20 kb reads,
    -xpacbio) — BENCH_E2E_READS et al. override.

Note: on tunneled single-chip dev backends the E2E number is dominated
by per-dispatch RPC (~30 ms) and a ~MB/s host link; neither cost
exists on directly-attached hardware. The kernel rates measure the
chip itself.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_MBPS = 14.2
REF_GCUPS = 3.6


def kernel_rates():
    import jax

    from minialign_tpu.dp import band
    from minialign_tpu.params import ScoreParams

    p = ScoreParams(matrix=tuple(2 if (i & 3) == (i >> 2) else -4
                                 for i in range(16)),
                    gi=4, ge=2, gfa=3, gfb=3, xdrop=50)  # -xpacbio

    # one 128-lane grid chunk = the kernel's native width (the
    # multi-chunk per-step penalty at long sources is a separate,
    # documented scheduling artifact — PERF_NOTES.md)
    B = int(os.environ.get("BENCH_B", "128"))
    L = int(os.environ.get("BENCH_L", "20480"))
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
    alen = np.full(B, L, np.int32)
    blen = np.full(B, L, np.int32)
    max_blocks = (2 * L + 2 * band.TAIL_N) // band.BLK + 2

    use_pallas = jax.default_backend() != "cpu"
    ab_d, bb_d = jax.device_put(ab), jax.device_put(bb)
    alen_d, blen_d = jax.device_put(alen), jax.device_put(blen)

    out = {}
    for trace in (False, True):
        fill = None
        if use_pallas:
            from minialign_tpu.dp.pallas_fill import make_fill_pallas
            fill = make_fill_pallas(p, 64, max_blocks=max_blocks,
                                    trace=trace)
        try:
            r = fill(ab_d, alen_d, bb_d, blen_d)
            np.asarray((r[0] if trace else r).max_score)
        except Exception as e:
            print(f"[bench] pallas trace={trace} failed "
                  f"({type(e).__name__}); falling back to XLA fill",
                  file=sys.stderr)
            fill = band.make_fill(p, 64, max_blocks=max_blocks,
                                  trace=trace)
            r = fill(ab_d, alen_d, bb_d, blen_d)
            np.asarray((r[0] if trace else r).max_score)

        # sustained DEVICE rate via the marginal cost of R chained
        # fills inside ONE jit (tests/tools/kbench.py slope_R): a
        # python-dispatched call pays ~20-35 ms tunnel RPC that does
        # not exist on direct-attached hardware and would understate
        # the chip 2-3x. The data dependency between chained calls
        # defeats CSE and forces sequential execution.
        import jax.numpy as jnp

        def chain(R):
            def f(a, al, b, bl):
                tot = jnp.int32(0)
                for _ in range(R):
                    r = fill(a, jnp.where(tot >= 0, al, al - 1), b, bl)
                    res = r[0] if trace else r
                    tot = tot + jnp.max(res.n_steps)
                return tot
            return jax.jit(f)

        g1, g5 = chain(1), chain(5)
        np.asarray(g1(ab_d, alen_d, bb_d, blen_d))
        np.asarray(g5(ab_d, alen_d, bb_d, blen_d))
        best = [1e9, 1e9]
        for _ in range(3):
            for gi_, g in enumerate((g1, g5)):
                # 4 calls per point: single calls jitter by +-3 ms on
                # the tunnel, comparable to the marginal cost itself
                t0 = time.perf_counter()
                rs = [g(ab_d, alen_d, bb_d, blen_d) for _ in range(4)]
                for r_ in rs:
                    np.asarray(r_)
                best[gi_] = min(best[gi_],
                                (time.perf_counter() - t0) / 4)
        r = fill(ab_d, alen_d, bb_d, blen_d)
        n_steps = int(np.asarray((r[0] if trace else r).n_steps).sum())
        dt = (best[1] - best[0]) / 4
        gcups = n_steps * 64 / dt / 1e9
        out["trace" if trace else "notrace"] = round(gcups, 3)
    return out


def e2e_rate():
    """Run bench_e2e.py in a subprocess (its own workload cache) and
    parse the JSON line. Prebuilt index: the baseline numbers exclude
    index-build time ('Index-build time excluded from timings',
    BASELINE.md), so the comparison does too."""
    env = dict(os.environ, BENCH_E2E_PREBUILT="1")
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "bench_e2e.py")],
        capture_output=True, timeout=5400, env=env)
    line = r.stdout.decode().strip().splitlines()[-1]
    return json.loads(line)


def scaling_rate():
    """1 vs 2 jax.distributed CPU processes on a fixed workload
    (bench_scaling.py); None on failure. The dev VM has 1 core, so
    the recorded number demonstrates the harness (ceiling ~0.5), not
    multi-host hardware."""
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "bench_scaling.py")],
        capture_output=True, timeout=1800)
    line = r.stdout.decode().strip().splitlines()[-1]
    return json.loads(line)


def device_axis_rate():
    """8-device virtual CPU mesh vs 1 device on a fixed workload
    (bench_scaling.py --device-axis); None on failure. Same 1-core
    caveat as the host axis (ceiling 1.0, not 8)."""
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "bench_scaling.py"), "--device-axis"],
        capture_output=True, timeout=1800)
    line = r.stdout.decode().strip().splitlines()[-1]
    return json.loads(line)


def main():
    from minialign_tpu.native import tune_malloc
    tune_malloc()
    try:
        k = kernel_rates()
    except Exception as exc:   # e.g. mid-flight libtpu upgrade on the
        # tunnel (observed round 5): never leave the driver metric-less
        print(f"[bench] kernel rates failed: {exc}", file=sys.stderr)
        k = {}
    try:
        e = e2e_rate()
    except Exception as exc:   # never leave the driver metric-less
        print(f"[bench] e2e failed: {exc}", file=sys.stderr)
        e = None
    try:
        s = scaling_rate()
    except Exception as exc:
        print(f"[bench] scaling failed: {exc}", file=sys.stderr)
        s = None
    try:
        d = device_axis_rate()
    except Exception as exc:
        print(f"[bench] device-axis failed: {exc}", file=sys.stderr)
        d = None

    if e is not None:
        out = {
            "metric": "e2e_mbases_per_s",
            "value": e["value"],
            "unit": "Mbases/s end-to-end (CLI -xpacbio, 20 kb reads; "
                    "kernel GCUPS in companion fields)",
            "vs_baseline": e["vs_baseline"],
            "reads_per_s": e.get("reads_per_s"),
            "e2e_wall_s": e.get("wall_s"),
            "kernel_gcups_notrace": k.get("notrace"),
            "kernel_gcups_trace": k.get("trace"),
            "kernel_vs_ref_gcups": round(
                (k.get("notrace") or 0) / REF_GCUPS, 3),
        }
        if s is not None:
            out["scaling_1to2_efficiency"] = s["value"]
            out["scaling_note"] = (
                "mapping-phase busy-time efficiency "
                f"(map1={s.get('map1_busy_s')}s cpu, per-host "
                f"{s.get('map2_busy_s')}s cpu); wall ratio "
                f"{s.get('wall_efficiency')} is confounded on "
                f"{s['host_cores']} core(s) (two procs share the "
                "core, wall ceiling ~0.5)")
        if d is not None:
            out["device_axis_8dev_ratio"] = d["value"]
            out["device_axis_note"] = (
                f"wall 1dev {d.get('wall_1dev_s')}s vs 8-dev mesh "
                f"{d.get('wall_8dev_s')}s, busy ratio "
                f"{d.get('busy_ratio_8_over_1')}, byte_identical="
                f"{d.get('byte_identical')}; 8 virtual devices on "
                f"{d.get('host_cores')} core(s): ceiling 1.0, the "
                "row measures mesh-path overhead at equal silicon")
        # real-size acceptance row (bench_accept.py, BASELINE row 1:
        # E.coli-scale x100 = 464 Mb reads, byte-compared vs the
        # reference binary) — embedded when the artifact exists so the
        # driver's BENCH file carries the headline config
        try:
            import glob
            arts = sorted(glob.glob(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_ACCEPT_r*.json")))
            if arts:
                with open(arts[-1]) as f:
                    acc = json.load(f)
                out["accept_config1"] = {
                    k_: acc.get(k_) for k_ in
                    ("read_mbases", "parity", "our_wall_s",
                     "ref_wall_s_this_host", "ref_published_wall_s",
                     "our_mbases_per_s")}
        except Exception:
            pass
    else:
        g = k.get("notrace") or 0.0
        out = {
            "metric": "band_dp_gcups",
            "value": g,
            "unit": "GCUPS (banded-DP cell updates/s, W=64)",
            "vs_baseline": round(g / REF_GCUPS, 3),
            "kernel_gcups_trace": k.get("trace"),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
