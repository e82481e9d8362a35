"""Multi-host scaling benchmark (BASELINE north star: >=80% reads/s
efficiency from 1 host to >=2): wall-clock for a fixed mapping
workload with ONE process vs TWO real jax.distributed CPU processes
(round-robin batch shares, merged byte-identically — the same path
tests/test_distributed.py proves correct).

Efficiency = t1 / (n_hosts * t_n). NOTE the honest caveat: on a
single-core dev VM two CPU processes share one core, so the ceiling
here is ~0.5 regardless of the framework — the number demonstrates
the harness, not the hardware. On real multi-host TPU pods each
process owns its chips/cores and the per-host work is embarrassingly
parallel until the ordered merge.

Prints one JSON line; bench.py embeds it as a companion field.
"""

import io
import json
import os

# everything here is a host-side harness: pin this process (and the
# merge step's index load) to CPU. The axon sitecustomize sets
# jax_platforms at interpreter start, so the env var alone is ignored
# — the config update after import is the one that counts (same
# pattern as tests/conftest.py and tests/tools/dist_host.py).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "tests", "data")
TOOLS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "tests", "tools")
REPS = int(os.environ.get("BENCH_SCALING_REPS", "8"))


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    return env


def main():
    with tempfile.TemporaryDirectory() as td:
        reads = os.path.join(td, "reads.fq")
        with open(reads, "w") as f:
            f.write(open(f"{DATA}/treads.fq").read() * REPS)
        args = ["-t1", "-165537", f"{DATA}/tref.fa", reads]

        # single process (subprocess so both sides pay interpreter +
        # compile-cache startup the same way)
        one = os.path.join(td, "one.sam")
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-c",
             "import os, sys; sys.path.insert(0, %r); "
             "os.environ['JAX_PLATFORMS'] = 'cpu'; "
             "import jax; jax.config.update('jax_platforms', 'cpu'); "
             "from minialign_tpu import cli; "
             "sys.stdout = open(%r, 'w'); "
             "raise SystemExit(cli.main(%r))"
             % (os.path.dirname(os.path.abspath(__file__)), one, args)],
            env=_env(), capture_output=True, timeout=3600)
        t1 = time.time() - t0
        assert r.returncode == 0, r.stderr.decode()[-2000:]

        # two jax.distributed processes
        port = 12421
        outs = [os.path.join(td, f"h{h}.out") for h in (0, 1)]
        t0 = time.time()
        procs = [subprocess.Popen(
            [sys.executable, os.path.join(TOOLS, "dist_host.py"),
             str(h), "2", f"localhost:{port}", outs[h]] + args,
            env=_env(), stdout=subprocess.DEVNULL,
            stderr=subprocess.PIPE) for h in (0, 1)]
        errs = [p.communicate(timeout=3600)[1] for p in procs]
        t2 = time.time() - t0
        for p, e in zip(procs, errs):
            assert p.returncode == 0, e.decode()[-2000:]

        # merged two-host output must equal the single-process bytes
        from minialign_tpu.parallel import distributed
        buf = io.StringIO()
        distributed.merge_host_outputs(args, outs, buf)
        ok = buf.getvalue() == open(one).read()

    eff = t1 / (2 * t2) if t2 > 0 else 0.0
    print(json.dumps({
        "metric": "scaling_1to2_efficiency",
        "value": round(eff, 4),
        "unit": "t1 / (2 * t2), jax.distributed CPU processes",
        "t1_s": round(t1, 2),
        "t2_s": round(t2, 2),
        "host_cores": os.cpu_count(),
        "byte_identical_merge": bool(ok),
        "note": "on a 1-core VM two processes share the core; "
                "ceiling ~0.5 independent of the framework",
    }))


if __name__ == "__main__":
    main()
