"""Real-backend kernel parity: run the NON-interpret Pallas fill and
the device traceback against the XLA fill + host walker on whatever
accelerator the default environment provides (the axon sitecustomize
pins the platform before interpreter start, so this must run OUTSIDE
the pytest process, which forces CPU).

Exit 0 + "TPU_PARITY_OK" on success; exit 3 when only CPU is
available (callers skip)."""

import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

import jax  # noqa: E402

if jax.default_backend() == "cpu":
    print("TPU_PARITY_SKIP: cpu backend only")
    sys.exit(3)

from minialign_tpu.dp import band, dtrace, pallas_fill, traceback  # noqa: E402
from minialign_tpu.params import ScoreParams  # noqa: E402


def mutate(rng, a, wband):
    out = []
    drift = 0
    lim = wband // 2 - 6
    for ch in a:
        r = rng.random()
        if r < 0.10:
            out.append(rng.integers(0, 4))
        elif r < 0.15 and drift < lim:
            out.append(rng.integers(0, 4))
            out.append(ch)
            drift += 1
        elif r < 0.20 and drift > -lim:
            drift -= 1
        else:
            out.append(ch)
    return np.asarray(out, np.int64)


def main():
    p = ScoreParams(matrix=tuple(2 if (i & 3) == (i >> 2) else -4
                                 for i in range(16)),
                    gi=4, ge=2, gfa=3, gfb=3, xdrop=60)
    W = 64
    rng = np.random.default_rng(77)
    # the kernel's lane chunk is 128 problems (FillEngine pads real
    # batches to that grain; narrower chunks break the trace-DMA tile
    # alignment) — replicate the padded-batch shape here
    B = 128
    seqs_a = [rng.integers(0, 4, int(rng.integers(80, 400)))
              for _ in range(B)]
    seqs_b = [mutate(rng, a, W) for a in seqs_a]
    ab, alen = band.pad_codes(seqs_a)
    bb, blen = band.pad_codes(seqs_b)

    nb = 36
    ref_fill = band.make_fill(p, W, max_blocks=nb, trace=True)
    pal_fill = pallas_fill.make_fill_pallas(p, W, max_blocks=nb,
                                            trace=True)
    r1, b1 = ref_fill(ab, alen, bb, blen)
    r2, b2 = pal_fill(ab, alen, bb, blen)
    for name, x, y in (("score", r1.max_score, r2.max_score),
                       ("mi", r1.max_i, r2.max_i),
                       ("mj", r1.max_j, r2.max_j)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)
    nbl = int(np.asarray(r1.n_blocks))
    np.testing.assert_array_equal(np.asarray(b1.dirs)[:, :nbl],
                                  np.asarray(b2.dirs)[:, :nbl])
    np.testing.assert_array_equal(np.asarray(b1.masks)[:, :nbl],
                                  np.asarray(b2.masks)[:, :nbl])

    # device traceback (on the accelerator) vs the host walker
    dt = dtrace.make_device_traceback(p, W)
    rle, _head, summary = dt(
        b2.masks, b2.dirs, b2.iheads,
        r2.max_score, r2.max_i, r2.max_j)
    rle = np.asarray(rle).view(np.uint8).astype(np.int32)
    row = dict(zip(dtrace.SUMMARY_ROWS, np.asarray(summary)))
    n_ent, bad = row["n_ent"], row["bad"]
    masks = np.asarray(b2.masks)
    dirs = np.asarray(b2.dirs)
    iheads = np.asarray(b2.iheads)
    for k in range(B):
        want = traceback.traceback_one(
            p, W, masks[k], dirs[k], iheads[k],
            int(np.asarray(r2.max_score)[k]),
            int(np.asarray(r2.max_i)[k]),
            int(np.asarray(r2.max_j)[k]))
        if want is None:
            assert bad[k] == 1, k
            continue
        ent = rle[:n_ent[k], k]
        ops = np.repeat(ent & 3, ent >> 2)
        fwd = "".join("D" if o == dtrace.OP_D else
                      "R" if o == dtrace.OP_R else "RD"
                      for o in ops)[::-1]
        assert fwd == want.path, k

    # Pallas DMA gather vs direct slicing (dp/pallas_gather.py): the
    # device-resident store path every mapping dispatch rides on
    from minialign_tpu.dp import pallas_gather
    flat = rng.integers(0, 4, 300_000).astype(np.int8)
    st2 = jax.device_put(pallas_gather.pad_store(flat))
    Lg, Bg = 2048, 64
    off = rng.integers(0, len(flat), Bg).astype(np.int32)
    ln = np.minimum(rng.integers(0, Lg + 1, Bg),
                    len(flat) - off).astype(np.int32)
    got = np.asarray(pallas_gather.make_gather(Lg, Bg)(
        st2, jax.device_put(off), jax.device_put(ln)))
    exp = np.full((Bg, Lg), band.NCODE, np.int8)
    for t in range(Bg):
        exp[t, :ln[t]] = flat[off[t]:off[t] + ln[t]]
    np.testing.assert_array_equal(got, exp)

    # fused down+up dispatch vs the two-step path: identical regs
    # (the duo path only runs on accelerator backends, so pytest-on-
    # CPU never exercises it — this per-round check does)
    import os as _os

    from minialign_tpu.index.build import build_index
    from minialign_tpu.params import IndexParams, MapParams
    from minialign_tpu.pipeline import align_batch

    g_rng = np.random.default_rng(11)
    genome = g_rng.integers(0, 4, 60_000).astype(np.int8)
    midx = build_index(IndexParams(k=15, w=10), ["c"], [genome])
    qreads = []
    for t in range(8):
        ln = int(g_rng.integers(1500, 6000))
        st0 = int(g_rng.integers(0, len(genome) - ln))
        qq = mutate(g_rng, genome[st0:st0 + ln].astype(np.int64), W)
        qreads.append(np.asarray(qq, np.int8))
    mp_ = MapParams(score=ScoreParams())

    def regs_sig(duo_env):
        _os.environ["MINIALIGN_DUO"] = duo_env
        try:
            regs = align_batch(mp_, midx, qreads)
        finally:
            _os.environ.pop("MINIALIGN_DUO", None)
        sig = []
        for rg in regs:
            if rg is None:
                sig.append(None)
                continue
            sig.append([(ra.aln.rid, ra.aln.rev, ra.aln.as0,
                         ra.aln.ae, ra.aln.bs0, ra.aln.be,
                         ra.aln.score, ra.aln.path, ra.mapq)
                        for ra in rg.alns])
        return sig

    assert regs_sig("1") == regs_sig("0"), "duo != two-step"

    # ultralong source staging (round-5 guard refresh): a 150 kb
    # extension pair rides the word-packed Pallas path (the stale
    # int8-row VMEM formula bounced anything past ~131 kb to the XLA
    # fill). Lane 0 carries the long pair, the rest terminate early at
    # their own p-limits; the XLA fill re-runs just the long pair for
    # the bit-exact comparison. trace=False: the score/max-pos state
    # crosses every staging seam, which is what the guard gates.
    from minialign_tpu.extend import FillEngine
    LU = 150_000
    assert FillEngine._pallas_vmem_ok(LU, LU)
    a_u = rng.integers(0, 4, LU)
    b_u = mutate(rng, a_u, W)
    ab_u, alen_u = band.pad_codes(
        [a_u] + [a_u[:256] for _ in range(B - 1)])
    bb_u, blen_u = band.pad_codes(
        [b_u] + [mutate(rng, a_u[:256], W) for _ in range(B - 1)])
    nb_u = (ab_u.shape[1] + bb_u.shape[1]) // band.BLK + 8
    ru_p = pallas_fill.make_fill_pallas(p, W, max_blocks=nb_u,
                                        trace=False)(
        ab_u, alen_u, bb_u, blen_u)
    ru_x = band.make_fill(p, W, max_blocks=nb_u, trace=False)(
        ab_u[:2], alen_u[:2], bb_u[:2], blen_u[:2])
    for name in ("max_score", "max_i", "max_j", "n_steps"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ru_p, name))[:2],
            np.asarray(getattr(ru_x, name)), err_msg="ultralong " + name)

    # round artifact (VERDICT round-2 item 8): record what was
    # compared so the per-round parity claim is checkable without
    # rerunning the tunnel
    import json
    art = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "jax": jax.__version__,
        "n_problems": int(B),
        "checks": ["fill score/max-pos pallas==xla",
                   "dirs byte-equal", "cell-code masks byte-equal",
                   "device-RLE trace == host walker path, all lanes",
                   "pallas DMA gather == host slicing (64 windows)",
                   "fused duo dispatch == two-step regs (8 reads)",
                   "150 kb ultralong fill pallas==xla (word-packed "
                   "VMEM guard, round 5)"],
        "n_trace_lanes_compared": int(B),
        "status": "ok",
    }
    out_path = os.environ.get("TPU_PARITY_ARTIFACT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(art, f, indent=1)
    print("TPU_PARITY_OK")


if __name__ == "__main__":
    main()
