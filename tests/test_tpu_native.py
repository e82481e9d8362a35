"""Real-accelerator kernel parity (VERDICT round-1 item 8): the
non-interpret Pallas fill and the device traceback must match the XLA
fill / host walker bit-for-bit ON THE REAL BACKEND. pytest itself is
pinned to CPU (conftest), so the check runs in a subprocess with the
environment's default platform; it skips cleanly when only CPU
hardware is available."""

import os
import subprocess
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "tools")


@pytest.mark.tpu
@pytest.mark.slow
def test_tpu_kernel_parity_subprocess():
    # strip the CPU pin AND the backend-derived vars the parent's
    # sitecustomize computed (they can hold stale/warning values when
    # the parent ran pinned to CPU) so the child re-derives them
    # a minimal launch environment, NOT the pytest process env: the
    # parent's backend bootstrap (pinned to CPU by conftest) leaves
    # derived platform vars in states that break a child's fresh
    # registration on tunneled backends; children of a plain shell
    # initialize fine with just the base vars
    base = ("PATH", "HOME", "PYTHONPATH", "LD_LIBRARY_PATH", "TMPDIR",
            "AXON_LOOPBACK_RELAY", "TPU_SKIP_MDS_QUERY",
            "PALLAS_AXON_TPU_GEN", "PALLAS_AXON_POOL_IPS",
            "PALLAS_AXON_REMOTE_COMPILE")
    env = {k: os.environ[k] for k in base if k in os.environ}
    # per-round artifact: the parity run records what it compared
    # (TPU_PARITY_r*.json at the repo root, VERDICT round-2 item 8).
    # The round number is one past the newest committed BENCH_r*.json
    # so `pytest -m tpu` keeps producing the right artifact each round.
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import glob
    import re
    rounds = [int(m.group(1)) for f in glob.glob(
        os.path.join(root, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", f))]
    rnum = (max(rounds) + 1) if rounds else 1
    env["TPU_PARITY_ARTIFACT"] = os.path.join(
        root, f"TPU_PARITY_r{rnum:02d}.json")
    r = None
    for attempt in range(3):   # tunneled backends flake under load
        r = subprocess.run(
            [sys.executable, os.path.join(TOOLS, "tpu_parity.py")],
            env=env, capture_output=True, timeout=1200)
        if r.returncode in (0, 3):
            break
        import time
        time.sleep(20)
    if r.returncode == 3:
        pytest.skip("no non-CPU backend available")
    err = r.stderr.decode()
    if r.returncode != 0 and (
            "could not determine TPU" in err
            or "unexpected worker hostname" in err):
        # tunneled-backend bootstrap quirk: children of a process whose
        # backend was pinned to CPU cannot re-register the tunnel on
        # some images. The same script passes when launched from a
        # plain shell — run `python tests/tools/tpu_parity.py`
        # directly on such machines.
        pytest.skip("accelerator tunnel not initializable from the "
                    "test harness; run tests/tools/tpu_parity.py "
                    "directly")
    assert r.returncode == 0, err[-3000:]
    assert b"TPU_PARITY_OK" in r.stdout
