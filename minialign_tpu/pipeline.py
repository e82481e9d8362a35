"""Alignment pipeline: drives per-read extension generators against the
batched device fill engine, then post-processes into printable regs.

The reference's mtmap pipeline (minialign.c:4535-4732) uses a thread
pool with one read per worker; here a single host thread coordinates
many in-flight reads and the device executes their extension requests
in lockstep batches (see extend.py docstring).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .extend import Aln, FillEngine, extend_read
from .index.build import MMIndex
from .params import MapParams
from .post import post_map, prune_regs


@dataclasses.dataclass
class RegAln:
    aln: Aln
    mapq: int      # x16 fixed point (printed >> 4)
    aid: int


@dataclasses.dataclass
class Reg:
    """mm_reg_t equivalent."""
    alns: list     # [RegAln], primary first
    n_uniq: int


def _postprocess(mp: MapParams, out) -> Reg | None:
    if out is None:
        return None
    res, slots = out
    # sort by accumulated score desc, stable (radix_sort_64x on the
    # offsetted score, minialign.c:4452)
    res = sorted(res, key=lambda r: -r[0])
    res = prune_regs(res, mp.min_ratio)
    n_uniq_bins = post_map(mp, res, slots)

    alns = []
    n_uniq = 0
    for i, (sc, bin_) in enumerate(res):
        for j in bin_.slot_idx:
            alns.append(RegAln(aln=slots[j], mapq=bin_.mapq, aid=i))
        if i == n_uniq_bins - 1:
            n_uniq = len(alns)
    if n_uniq == 0:
        n_uniq = len(alns)
    return Reg(alns=alns, n_uniq=n_uniq)


def align_batch(mp: MapParams, mi: MMIndex, reads: list,
                engine: FillEngine | None = None,
                base_qid: int = 0) -> list:
    """Map a batch of reads (list of 2-bit code arrays). Returns a Reg
    (or None for unmapped) per read, in input order."""
    engine = engine or FillEngine(mp.score)
    # device-resident sequence store: avoids per-dispatch sequence
    # uploads by building band inputs with on-device gathers. Measured
    # SLOWER on v5e (XLA gather ~8 ns/elem >> the upload cost even over
    # a tunnel), so off by default; revisit on hardware where host
    # links are the bottleneck (PERF_NOTES.md).
    import os
    use_store = hasattr(engine, "set_index") and \
        bool(os.environ.get("MINIALIGN_DEVICE_SEQS"))
    if use_store:
        engine.set_index(mi)
        engine.set_queries([np.asarray(c, np.int8) for c in reads])
    results = {}
    active = {}
    for i, codes in enumerate(reads):
        g = extend_read(mp, mi, np.asarray(codes), base_qid + i,
                        qidx=i if use_store else None)
        if g is None:
            results[i] = None
            continue
        try:
            req = g.send(None)
            active[i] = (g, req)
        except StopIteration as e:
            results[i] = e.value

    while active:
        idxs = list(active.keys())
        reqs = [active[i][1] for i in idxs]
        outs = engine.run(reqs)
        nxt = {}
        for i, out in zip(idxs, outs):
            g = active[i][0]
            try:
                req = g.send(out)
                nxt[i] = (g, req)
            except StopIteration as e:
                results[i] = e.value
        active = nxt

    return [_postprocess(mp, results.get(i)) for i in range(len(reads))]
