"""Batched extension driver.

The reference extends one chain at a time per thread (mm_extend,
minialign.c:4118-4173): downward fill from a seed, max search, dedup
test, upward fill from the max, traceback, record, then rescue-seed
retries. The control flow is inherently sequential per read, so the
TPU design batches ACROSS reads: each read runs as a generator that
yields extension requests; the scheduler gathers requests from all
active reads, executes them as one padded device batch per shape
bucket, and feeds results back. Device utilization scales with the
number of in-flight reads, not with per-read parallelism.

Semantic notes (all mirrored from the reference):
  * trial budgets crem=50000 per run / srem=8 per chain
    (MM_CREM/MM_SREM, minialign.c:3777-3778).
  * band narrowing on duplicate collisions: W 64 -> 32 -> 16
    (minialign.c:4122-4126, st.narrow).
  * the dedup hash stores extension end/head/tail positions keyed by
    _key(pos, ids) (minialign.c:3362, 3953-3994). The reference's
    test_dup reads the just-overwritten hash slot when deciding
    chain-termination (minialign.c:3985 consults t after *t = ...), so
    the "contained in previous result" early-exit never fires; the
    observable behavior (narrow bump only) is replicated.
  * record() accumulates the res score as aln score plus a query-
    coverage bonus 2*ovl*identity (minialign.c:4041-4046), with the
    release-build bin-init semantics (lb=0; see Bin docstring).
  * the upward-extension min-score test uses the global min_score
    (minialign.c:4149); the ratcheted st.min_score is written but
    never read in the reference — not carried here.
"""

from __future__ import annotations

import dataclasses
import os as _os

import numpy as np

from .chain import _u, _v, chain_seeds, collect_seeds, coords_to_xy, seed_round
from .dp import band
from .dp.traceback import traceback_one
from .index.build import MMIndex
from .params import MapParams, ScoreParams

MM_CREM = 50000
MM_SREM = 8
# Pallas-path shape-bucket floor: merging the small rescue-probe
# shapes into one bucket saves a ~30 ms dispatch RPC per round per
# extra bucket on tunneled backends and shrinks the compile lattice;
# padded problems terminate at their own p-limit so device steps
# don't grow. A/B'd vs the 512 floor (one process, alternating):
# medians 2.9 vs 3.4 s on the warm 100 x 20 kb workload.
_MIN_BUCKET = int(_os.environ.get("MINIALIGN_MIN_BUCKET", "4096"))
_REF_STORE_CACHE: dict = {}
WIDTHS = (64, 32, 16)      # indexed by st.narrow


def _key(x: int, y: int) -> int:
    """_key position-hash fold (minialign.c:3362)."""
    x &= (1 << 64) - 1
    y &= (1 << 64) - 1
    swap = ((y & 0xFFFFFFFF) << 32) | (y >> 32)
    return (x ^ (x >> 29) ^ y ^ swap) & ((1 << 64) - 1)


def _poskey(apos: int, bpos: int, rid: int, qid: int) -> int:
    return _key((apos & 0xFFFFFFFF) | ((bpos & 0xFFFFFFFF) << 32),
                (rid & 0xFFFFFFFF) | ((qid & 0xFFFFFFFF) << 32))


@dataclasses.dataclass
class Seg:
    """One gaba_path_section_t-equivalent: a piece of an alignment
    lying within a single pass over the reference (alignments on
    circular references split at the origin; gaba.c:2862
    trace_push_segment). Coordinates are mod-rlen on the ref side."""
    as0: int
    ae: int
    bs0: int
    be: int
    path: str
    po: int = 0            # start offset within the full forward path
                           # (display order); maps to the up-space bit
                           # position for the printers' reverse parse


@dataclasses.dataclass
class Aln:
    rid: int
    rev: int
    as0: int               # head-segment ref start (forward, mod coords)
    ae: int                # tail-segment ref end (mod coords)
    bs0: int               # query start (strand space)
    be: int                # query end (strand space)
    score: int
    path: str              # forward-space ops: D=query base, R=ref base
    identity: float
    dcnt: int
    agcnt: int
    bgcnt: int
    segs: list = None      # [Seg] head-to-tail; None -> single segment
    upath: str = ""        # up-space bit path (gaba's aln->path order);
                           # the printers reverse-parse this
                           # (gaba_dump_cigar_reverse, minialign.c:5173)

    def __post_init__(self):
        if self.segs is None:
            self.segs = [Seg(self.as0, self.ae, self.bs0, self.be,
                             self.path, po=0)]

    @property
    def plen(self) -> int:
        return len(self.path)

    @property
    def slen(self) -> int:
        return len(self.segs)


def split_segments(as0_u: int, bs0: int, path: str, rlen: int,
                   ops: list | None = None) -> list:
    """Split a (possibly origin-wrapping) alignment into per-pass
    segments. as0_u is the unwrapped ref start (negative when the
    alignment began before the origin of the final pass); the split
    points are the multiples of rlen crossed by the ref walk."""
    # walk the WALKER's pop tokens (ops: 'X' diagonal pair / 'R' /
    # 'D'), not raw path chars: gaba pushes the segment boundary when a
    # pop's section test fires, and only h-gap and diagonal pops test
    # the a-side index (_trace_tail_h/d_test_index, gaba.c:2935-2937).
    # A v-gap pop checks bgidx alone, so insertions that follow the
    # origin-crossing DIAGONAL stay in the current segment, while a
    # lone crossing R (gap pop, returning to d_head) splits at once.
    if ops is None:
        ops = []                   # derive pair tokens from the chars
        i = 0
        while i < len(path):
            if path[i] == "D" and i + 1 < len(path) \
                    and path[i + 1] == "R":
                ops.append("X")
                i += 2
            else:
                ops.append(path[i])
                i += 1
    segs = []
    seg_a0, seg_b0, start = as0_u, bs0, 0
    apos, bpos = as0_u, bs0
    pos = 0                        # char position in path
    k, n = 0, len(ops)
    while k < n:
        t = ops[k]
        if t == "X" or t[0] == "R":
            w = len(t) if t[0] == "R" else 1
            crossed = False
            for _ in range(w):     # boundary drains are multi-R tokens
                apos += 1
                if apos % rlen == 0:
                    crossed = True
            if t == "X":
                bpos += 1
            pos += 2 if t == "X" else len(t)
            k += 1
            if crossed:
                if t == "X":
                    # absorb following v pops into this segment
                    while k < n and ops[k][0] == "D":
                        bpos += len(ops[k])
                        pos += len(ops[k])
                        k += 1
                if k < n:
                    segs.append(Seg(seg_a0 % rlen,
                                    ((apos - 1) % rlen) + 1,
                                    seg_b0, bpos, path[start:pos],
                                    po=start))
                    seg_a0, seg_b0, start = apos, bpos, pos
        else:
            bpos += len(t)
            pos += len(t)
            k += 1
    segs.append(Seg(seg_a0 % rlen, ((apos - 1) % rlen) + 1, seg_b0, bpos,
                    path[start:], po=start))
    return segs


@dataclasses.dataclass
class Bin:
    """mm_bin_t. lb/ub init note: the source (minialign.c:3855) writes
    `.lb = UINT32_MAX` through a compound literal pushed as void**, a
    strict-aliasing violation that gcc -O3 (the release build, and the
    build behind every published benchmark and our golden files) elides
    — the released binary runs with lb = 0, so ovl degenerates to
    `be - min(ub, be)` and lb stays 0 forever. We match the release
    binary (PARITY.md item 5)."""
    n_aln: int = 0
    plen: int = 0
    lb: int = 0
    ub: int = 0
    slot_idx: list = dataclasses.field(default_factory=list)
    mapq: int = 0


def revcomp_codes(c: np.ndarray) -> np.ndarray:
    c = np.asarray(c)
    out = (3 - c[::-1]).astype(np.int8)
    out[np.asarray(c[::-1]) > 3] = band.NCODE
    return out


def ref_revcomp(mi, rid: int) -> np.ndarray:
    """Cached reverse complement of reference sequence `rid` — the
    root loader needs it per chain, and recomputing a multi-Mb
    revcomp per chain dominated host time (measured 5.3 s of a 21 s
    E2E run). The cache lives on the index object (works through the
    ShardedIndex facade too)."""
    cache = getattr(mi, "_codes_rev", None)
    if cache is None:
        cache = {}
        try:
            object.__setattr__(mi, "_codes_rev", cache)
        except (AttributeError, TypeError):
            return revcomp_codes(np.asarray(mi.codes[rid], np.int8))
    if rid not in cache:
        cache[rid] = revcomp_codes(np.asarray(mi.codes[rid], np.int8))
    return cache[rid]


# ---------------------------------------------------------------------------
# device batch engine
# ---------------------------------------------------------------------------

# process-wide jitted-kernel cache shared by every engine with the
# same scoring params: without it each CLI invocation / FillEngine
# instance re-traces and re-compiles every shape bucket (measured
# ~105 s of a 204 s "warm" bench_e2e run on the tunneled backend,
# whose remote compile bypasses JAX's persistent cache)
_FN_CACHE: dict = {}
_BUF_POOL: dict = {}


# byte LUTs for op-code -> path-string builds (op 3 = diagonal is
# two chars: "RD" backward / "DR" in rev-token order)
_LUT_FWD1 = np.frombuffer(b"\0DRR", np.uint8)
_LUT_REV1 = np.frombuffer(b"\0DRD", np.uint8)
_LUT_TOK = np.frombuffer(b"\0DRX", np.uint8)


def rle_paths_py(ent: np.ndarray):
    """Pure-numpy fallback for native.rle_paths: expand bit-packed
    (op | len << 2) RLE entries into (path, path_rev, ops_rev)
    strings. Parity with the native implementation is enforced by
    tests/test_native.py::test_rle_paths_parity. Byte-LUT builds: a
    join of 10k 1-2 char strings per alignment measured 7.5 s/500
    reads."""
    ent = np.asarray(ent)
    col = np.repeat(ent & 3, ent >> 2)
    widths = np.where(col == 3, 2, 1)
    starts = np.cumsum(widths) - widths
    total = int(starts[-1] + widths[-1]) if len(col) else 0
    bf = np.empty(total, np.uint8)
    bf[starts] = _LUT_FWD1[col]
    bf[starts[col == 3] + 1] = ord("D")
    path = bytes(bf[::-1]).decode()
    bf[starts] = _LUT_REV1[col]
    bf[starts[col == 3] + 1] = ord("R")
    path_rev = bytes(bf).decode()
    ops_rev = bytes(_LUT_TOK[col]).decode()
    return path, path_rev, ops_rev


def _score_key(p: ScoreParams):
    return (tuple(p.matrix), p.gi, p.ge, p.gfa, p.gfb, p.xdrop)


class FillEngine:
    """Shape-bucketed jitted fill executor.

    Uses the Pallas TPU kernel on TPU backends and the XLA reference
    fill elsewhere (CPU tests); both are bit-identical
    (tests/test_pallas_fill.py)."""

    def __init__(self, score: ScoreParams, batch: int | None = None,
                 use_pallas: bool | None = None):
        import jax
        self.p = score
        if use_pallas is None:
            # anything but plain CPU runs the Pallas TPU kernel (a
            # tunneled TPU may report its own platform name)
            use_pallas = jax.default_backend() != "cpu"
        self.use_pallas = use_pallas
        # max problems per dispatch; the pallas kernel grids over
        # 128-lane chunks inside ONE launch, so big batches amortize
        # the per-dispatch cost (~30 ms RPC on tunneled backends)
        # NOTE multi-chunk grids run ~2.3x slower PER STEP at 20 kb
        # sources (kbench slopeR B=512 147 ns vs B=128 64 ns — the
        # extra chunks' input-block copies/extractions serialize with
        # compute), but E2E A/B shows splitting dispatches at 128
        # doesn't pay on the tunneled host (dispatch overhead eats the
        # win); keep 512 and revisit on direct-attached hardware via
        # MINIALIGN_DISPATCH_B.
        self.batch = batch if batch is not None else \
            (int(_os.environ.get("MINIALIGN_DISPATCH_B", "512"))
             if use_pallas else 32)
        self._fns = _FN_CACHE.setdefault(
            (_score_key(score), use_pallas), {})
        # fused down+up+trace dispatch (see _duo_fn); requires the
        # pallas path + device store
        self.supports_duo = bool(use_pallas)
        # dispatch-shape statistics (MINIALIGN_STATS=1 prints at exit):
        # (kind, n_real, B_padded) per device dispatch. None when the
        # flag is unset so long-lived processes don't grow the list
        # unboundedly (the atexit dump is the only consumer).
        self.stats = None
        if _os.environ.get("MINIALIGN_STATS"):
            import atexit

            self.stats = []

            def _dump(st=self.stats):
                import collections
                import sys
                c = collections.Counter(st)
                for k, n in sorted(c.items()):
                    print(f"[stats] {k[0]} nreal={k[1]} B={k[2]} "
                          f"x{n}", file=sys.stderr)
            atexit.register(_dump)

    def _bucket(self, n: int) -> int:
        # Pallas path: 4096 minimum merges the small rescue-probe
        # shapes into one bucket — padded problems terminate at their
        # own p-limit so device steps don't grow, while each distinct
        # bucket costs a ~30 ms dispatch RPC per round on tunneled
        # backends and a one-time kernel compile (the cold-start
        # lattice). XLA path keeps the tight 512 floor.
        b = _MIN_BUCKET if self.use_pallas else 512
        while b < n:
            b *= 2
        return b

    @staticmethod
    def _pallas_vmem_ok(la, lb) -> bool:
        """Ultralong-read guard, mirroring make_fill_pallas's actual
        per-chunk VMEM allocation under the round-4 word-packed layout
        (10 chars/int32 — ~10x smaller sources than the int8 formula
        this replaces, so the Pallas ceiling moves from ~131 kb to the
        word path's own offset-exactness cap: source lengths up to
        2**18 chars per side, ~262 kb reads). Two hard limits:
          * PA/PB <= 18 — segment offsets are floor-divided by 10 as
            an f32 multiply, exhaustively exact below 2**19
            (dp/pallas_fill._div10); the kernel asserts the same.
          * total VMEM rows (sources + cascade scratch + band state +
            per-block trace outputs + mask staging) within the 100 MB
            compiler budget, with margin.
        Beyond either, the XLA fill (HBM-resident) takes over — the
        reference's unbounded-length path is gaba.c:2057-2103."""
        import os as _os
        SL = 4 * band.BLK                      # K=4 in make_fill_pallas
        PA = max((la + SL - 1).bit_length(), 3)
        PB = max((lb + SL - 1).bit_length(), 3)
        if PA > 18 or PB > 18:
            return False
        J = max(1, int(_os.environ.get("MINIALIGN_FILL_J", "8")))
        PSEG = max(((SL + 9) // 10).bit_length(), 1)
        SEGW = (1 << PSEG) + 5
        PSUP = max(((J * SL + 9) // 10).bit_length(), PSEG)
        SUPW = (1 << PSUP) + SEGW

        def psrc(P):
            return max(((1 << P) // 10 + 1).bit_length(), 1)
        PSRCA, PSRCB = psrc(PA), psrc(PB)
        LWAp = (1 << PSRCA) + SUPW             # assume two-level (max)
        LWBp = (1 << PSRCB) + SUPW
        scrlen = max(SEGW + (1 << max(PSUP - 1, 0)),
                     SUPW + (1 << max(PSRCA - 1, 0)),
                     SUPW + (1 << max(PSRCB - 1, 0)))
        nb = (la + lb + 2 * band.TAIL_N) // band.BLK + 2
        rows = (LWAp + LWBp                        # word sources (in)
                + 2 * scrlen + 40 + 2 * SEGW + 8
                + 2 * SUPW                         # cascade scratch
                + 2 * (4 * 64 + 32 + 16)           # band state in+out
                + 3 * nb                           # dirs/iheads/rprevs
                + 2 * 4 * band.BLK * 16)           # mask staging
        return rows * 128 * 4 < 88 * 1024 * 1024

    def _dispatch_buf(self, side, shape) -> np.ndarray:
        """NCODE-filled host staging buffer for one dispatch, pooled
        per (side, shape) on accelerator backends: a fresh np.full per
        dispatch repaid the lazily-backed-VM page-fault cost every time
        (measured ~60 ms per 33 MB buffer, see native.tune_malloc).
        Safe to reuse because accelerator backends copy the host array
        at dispatch; the CPU backend may alias numpy memory, so it
        keeps fresh allocations. The side key keeps the a/b buffers of
        one dispatch distinct when their shapes coincide."""
        if not self.use_pallas:
            return np.full(shape, band.NCODE, np.int8)
        # process-global like _FN_CACHE: engines are per-CLI-call and a
        # per-engine pool would re-pay the first-touch faults each run
        buf = _BUF_POOL.get((side, shape))
        if buf is None:
            buf = _BUF_POOL[(side, shape)] = np.empty(shape, np.int8)
        buf.fill(band.NCODE)
        return buf

    def _fn(self, W, la, lb, trace):
        """Returns (fill_fn, packed_io): packed_io means the fn takes
        4-bit-packed char inputs (the pallas path; halves the
        host->device argument upload, a dominant dispatch cost on
        tunneled backends)."""
        nb = (la + lb + 2 * band.TAIL_N) // band.BLK + 2
        key = (W, la, lb, trace)
        if key not in self._fns:
            if self.use_pallas and self._pallas_vmem_ok(la, lb):
                from .dp.pallas_fill import make_fill_pallas
                self._fns[key] = (make_fill_pallas(self.p, W,
                                                   max_blocks=nb,
                                                   trace=trace,
                                                   packed_io=True),
                                  True)
            else:
                self._fns[key] = (band.make_fill(self.p, W,
                                                 max_blocks=nb,
                                                 trace=trace), False)
        return self._fns[key]

    # ------------------------------------------------------------------
    # device-resident sequence store: the reference genome and the
    # current read batch are uploaded ONCE; per-request band inputs are
    # built by on-device gathers from per-problem (base, start, cap)
    # rows, so no sequence bytes cross the host->device link per
    # dispatch (the reference's immutable shared index, device-resident)
    # ------------------------------------------------------------------

    def set_index(self, mi) -> None:
        if getattr(self, "_ref_src", None) is getattr(mi, "codes", None):
            return
        # process-global store cache: engines are per-CLI-call, but the
        # uploaded reference store (revcomp + pad + device_put, ~0.8 s
        # per Gb-scale call) is reusable across calls on the same index
        # object (the cache holds a strong codes reference so the id
        # key cannot be recycled)
        cached = _REF_STORE_CACHE.get(id(mi.codes))
        if cached is not None and cached[0] is mi.codes:
            (_, self._ref_store2, self._ref_flat, self._ref_fw,
             self._ref_rv, self._ref_len) = cached
            self._ref_src = mi.codes
            return
        import jax
        fw_bases, rv_bases, lens = [], [], []
        parts = []
        off = 0
        for c in mi.codes:
            c = np.asarray(c, np.int8)
            r = revcomp_codes(c)
            fw_bases.append(off)
            parts.append(c)
            off += len(c)
            rv_bases.append(off)
            parts.append(r)
            off += len(r)
            lens.append(len(c))
        flat = np.concatenate(parts) if parts else np.zeros(1, np.int8)
        from .dp import pallas_gather
        # one padded (rows, 128) upload serves both the Pallas DMA
        # gather (row-aligned windows) and the XLA fallback (1D view)
        self._ref_store2 = jax.device_put(
            pallas_gather.pad_store(flat, pool="ref"))
        # pooled staging: the next set_index refills the same pages,
        # so the upload must complete before this call returns
        self._ref_store2.block_until_ready()
        self._ref_flat = self._ref_store2.reshape(-1)
        self._ref_fw = fw_bases
        self._ref_rv = rv_bases
        self._ref_len = lens
        self._ref_src = mi.codes
        _REF_STORE_CACHE.clear()      # bound: one live index store
        _REF_STORE_CACHE[id(mi.codes)] = (
            mi.codes, self._ref_store2, self._ref_flat, fw_bases,
            rv_bases, lens)

    def set_queries(self, reads) -> None:
        import jax
        bases, lens, parts = [], [], []
        off = 0
        for c in reads:
            c = np.asarray(c, np.int8)
            r = revcomp_codes(c)
            bases.append((off, off + len(c)))
            parts.append(c)
            parts.append(r)
            off += 2 * len(c)
            lens.append(len(c))
        flat = np.concatenate(parts) if parts else np.zeros(1, np.int8)
        from .dp import pallas_gather
        self._q_store2 = jax.device_put(
            pallas_gather.pad_store(flat, pool="q"))
        self._q_store2.block_until_ready()
        self._q_flat = self._q_store2.reshape(-1)
        self._q_bases = bases
        self._q_len = lens

    def _gather_fn(self, L, packed=False):
        key = ("gather", L, packed)
        if key not in self._fns:
            import jax
            import jax.numpy as jnp

            @jax.jit
            def g(flat, base, start, cap, seglen, wrap):
                col = jnp.arange(L, dtype=jnp.int32)
                idx = start[:, None] + col[None, :]
                idxw = jnp.where(wrap[:, None] > 0,
                                 idx % jnp.maximum(wrap[:, None], 1),
                                 idx)
                safe = jnp.clip(idxw, 0, (seglen - 1)[:, None])
                vals = jnp.take(flat, base[:, None] + safe)
                ok = (col[None, :] < cap[:, None]) & \
                    ((wrap[:, None] > 0) | (idx < seglen[:, None]))
                out = jnp.where(ok, vals,
                                 jnp.int8(band.NCODE)).astype(jnp.int8)
                if packed:
                    out = out[:, 0::2] | (out[:, 1::2] << 4)
                return out

            self._fns[key] = g
        return self._fns[key]

    def _side_meta(self, specs, L, B):
        """Per-problem (base, start, cap, seglen, wrap, elen) rows for
        a side plus the backing store handles and whether the Pallas
        DMA-gather fast path applies. Spec forms:
          ("ref", rid, rev, start, cap, wrap)   wrap>0 = circular mod
          ("q", qidx, which, start)             which 1 = revcomp
        """
        base = np.zeros(B, np.int32)
        start = np.zeros(B, np.int32)
        cap = np.zeros(B, np.int32)
        seglen = np.zeros(B, np.int32)
        wrap = np.zeros(B, np.int32)
        flat = None
        store2 = None
        elen = np.zeros(B, np.int32)
        for s, spec in enumerate(specs):
            if spec[0] == "ref":
                _, rid, rev, st0, cp, wr = spec
                flat = self._ref_flat
                store2 = self._ref_store2
                base[s] = self._ref_rv[rid] if rev else self._ref_fw[rid]
                start[s] = st0
                rlen = self._ref_len[rid]
                seglen[s] = rlen
                wrap[s] = wr
                cap[s] = cp
                elen[s] = cp if wr else max(0, min(cp, rlen - st0))
            else:
                _, qidx, which, st0 = spec
                flat = self._q_flat
                store2 = self._q_store2
                b0, b1 = self._q_bases[qidx]
                base[s] = b1 if which else b0
                start[s] = st0
                qlen = self._q_len[qidx]
                seglen[s] = qlen
                cap[s] = max(0, qlen - st0)
                elen[s] = cap[s]
        from .dp import pallas_gather
        ok_pg = (self.use_pallas and store2 is not None
                 and not wrap.any() and (start >= 0).all()
                 and L % 1024 == 0 and L <= pallas_gather.LMAX)
        return dict(base=base, start=start, cap=cap, seglen=seglen,
                    wrap=wrap, elen=elen, flat=flat, store2=store2,
                    ok_pg=ok_pg)

    def _build_side(self, specs, L, B, packed=False):
        """(B, L) device array + effective lengths for a side."""
        m = self._side_meta(specs, L, B)
        from .dp import pallas_gather
        if m["ok_pg"]:
            # Pallas DMA gather: row-aligned window copies from the
            # resident store; the XLA take() path costs ~8 ns/element
            # (the reason MINIALIGN_DEVICE_SEQS lost in round 2).
            # Clamp the offset to the segment end so padded problems
            # with start past the data still DMA in-bounds.
            off = np.minimum(m["base"] + m["start"],
                             m["base"] + m["seglen"])
            arr = pallas_gather.make_gather(L, B, packed)(
                m["store2"], off, m["elen"])
        else:
            arr = self._gather_fn(L, packed)(
                m["flat"], m["base"], m["start"], m["cap"],
                m["seglen"], m["wrap"])
        return arr, m["elen"]

    def _prewarm(self, need: list) -> None:
        """Compile this round's missing fused kernels CONCURRENTLY:
        the remote-compile backend parallelizes across threads (4
        fresh 20 kb-bucket kernels compile in ~19 s together vs
        ~20-40 s EACH serially), so a cold round pays max() instead of
        sum() of its compile times. Dummy length-0 calls both compile
        and execute-warm the jit caches; the device-trace walker for
        each trace bucket warms in the same thread."""
        import threading

        missing = [key for key in need if key not in self._fns]
        if len(missing) < 2:
            return

        def warm(key):
            try:
                z = np.zeros(key[-1], np.int32)
                one = np.ones(key[-1], np.int32)
                if key[0] == "duo":
                    _, W, la, lb, lau, lbu, B = key
                    f = self._duo_fn(W, la, lb, lau, lbu, B)
                    r = f(self._ref_store2, z, z,
                          self._q_store2, z, z,
                          z, z, one, one, z, z)
                    np.asarray(r[1][:1, :1])
                    return
                _, W, la, lb, trace, B = key
                f = self._fused_fn(W, la, lb, trace, B)
                r = f(self._ref_store2, z, z, self._q_store2, z, z)
                if trace:
                    res_d, bufs = r
                    from .dp.dtrace import make_device_traceback
                    dkey = ("dtrace", W)
                    with self._warm_lock:
                        if dkey not in self._fns:
                            self._fns[dkey] = \
                                make_device_traceback(self.p, W)
                    dt = self._fns[dkey]
                    rle, _head, summ = dt(
                        bufs.masks, bufs.dirs, bufs.iheads,
                        res_d.max_score, res_d.max_i, res_d.max_j)
                    np.asarray(summ[:1, :1])
                else:
                    np.asarray(r.max_score[:1])
            except Exception as e:
                # the real dispatch surfaces any error; log so an API
                # drift that silently skips execute-warming is visible
                import sys
                print(f"[minialign] prewarm {key}: "
                      f"{type(e).__name__}: {e}", file=sys.stderr)

        if not hasattr(self, "_warm_lock"):
            self._warm_lock = threading.Lock()
        ths = [threading.Thread(target=warm, args=(k,), daemon=True)
               for k in missing]
        for t in ths:
            t.start()
        for t in ths:
            t.join()

    def _fused_fn(self, W, la, lb, trace, B):
        """gather(a) + gather(b) + 4-bit pack + fill as ONE jit: every
        separate jit call from Python pays dispatch + tunnel-RPC
        overhead, and the per-dispatch count (2 gathers + 1 fill per
        bucket) dominated the warm E2E wall after the transfers were
        eliminated."""
        key = ("fused", W, la, lb, trace, B)
        if key not in self._fns:
            import jax

            from .dp import pallas_gather
            fill, packed_io = self._fn(W, la, lb, trace)
            ga = pallas_gather.make_gather(la, B, packed_io)
            gb = pallas_gather.make_gather(lb, B, packed_io)

            @jax.jit
            def f(sa, offa, lna, sb, offb, lnb):
                return fill(ga(sa, offa, lna), lna,
                            gb(sb, offb, lnb), lnb)

            self._fns[key] = f
        return self._fns[key]


    def _duo_fn(self, W, la, lb, lau, lbu, B):
        """Fused down-fill -> up-window math -> up-fill -> device
        trace, ONE dispatch per extension trial (the reference's
        mm_extend_core down/up pair, minialign.c:4075-4147, runs two
        host round trips here otherwise). The up window offsets are
        pure arithmetic on the down max and per-problem geometry, so
        they move onto the device; the host dedup test between down
        and up (mm_search_test_dup) is applied at harvest — a dup
        simply discards the speculative up result, which is byte-
        neutral. Circular references stay on the two-step path."""
        key = ("duo", W, la, lb, lau, lbu, B)
        if key not in self._fns:
            import jax
            import jax.numpy as jnp

            from .dp import pallas_gather
            from .dp.dtrace import make_device_traceback

            fill_d, pk = self._fn(W, la, lb, False)
            fill_u, pku = self._fn(64, lau, lbu, True)
            ga = pallas_gather.make_gather(la, B, pk)
            gb = pallas_gather.make_gather(lb, B, pk)
            gau = pallas_gather.make_gather(lau, B, pku)
            gbu = pallas_gather.make_gather(lbu, B, pku)
            dkey = ("dtrace", 64)
            if dkey not in self._fns:
                self._fns[dkey] = make_device_traceback(self.p, 64)
            dt = self._fns[dkey]
            capu_add = 4 * 64 + 2 * band.TAIL_N + 64  # _slice_cap(.., 64)

            @jax.jit
            def f(sa, offa, lna, sb, offb, lnb,
                  rvbase, qub, rlen_r, qlen_r, cp0_r, cp1_r):
                down = fill_d(ga(sa, offa, lna), lna,
                              gb(sb, offb, lnb), lnb)
                ae = cp0_r + down.max_i
                be = cp1_r + down.max_j
                tp0 = jnp.clip(ae, 1, rlen_r)
                tp1 = jnp.clip(be, 1, qlen_r)
                # a failed down (score 0) would otherwise trace a
                # full-length garbage alignment and stretch the whole
                # trace batch's walk; zero-length inputs terminate its
                # up fill immediately
                ok = (down.max_score > 0).astype(jnp.int32)
                lna_u = jnp.minimum(2 * tp1 + capu_add, tp0) * ok
                offa_u = rvbase + (rlen_r - tp0)
                lnb_u = tp1 * ok
                offb_u = qub + (qlen_r - tp1)
                upres, bufs = fill_u(gau(sa, offa_u, lna_u), lna_u,
                                     gbu(sb, offb_u, lnb_u), lnb_u)
                rle, head, summ = dt(bufs.masks, bufs.dirs,
                                     bufs.iheads,
                                     upres.max_score, upres.max_i,
                                     upres.max_j)
                # down results ride as 3 extra summary rows: ONE
                # device->host array per harvest
                dsum = jnp.stack([down.max_score, down.max_i,
                                  down.max_j])
                return rle, head, jnp.concatenate([summ, dsum],
                                                  axis=0)

            self._fns[key] = f
        return self._fns[key]

    def _trace_device_dispatch(self, sub, W, res_d, bufs):
        """TPU trace path, dispatch half: the mask walk runs ON DEVICE
        (dp/dtrace) so the big mask buffers never cross the
        device->host link; only backward op codes + counters transfer
        (~50x less). No host sync happens here — callers harvest later
        so dispatches across buckets pipeline through the link."""
        from .dp.dtrace import make_device_traceback

        key = ("dtrace", W)
        if key not in self._fns:
            self._fns[key] = make_device_traceback(self.p, W)
        dt = self._fns[key]
        rle_d, head_d, summary_d = dt(
            bufs.masks, bufs.dirs, bufs.iheads,
            res_d.max_score, res_d.max_i, res_d.max_j)
        return (sub, W, rle_d, head_d, summary_d)

    def _trace_device_harvest(self, out, pend):
        from . import native as _nat
        from .dp.dtrace import SUMMARY_ROWS
        from .dp.traceback import TraceResult, _identity

        sub, W, rle_d, head_d, summary_d = pend
        p = self.p
        nreal = len(sub)
        # ONE transfer for every per-problem scalar (each separate
        # materialization pays a full RPC on tunneled links)
        summ = np.asarray(summary_d)[:, :nreal]
        row = dict(zip(SUMMARY_ROWS, summ))
        ms, mi, mj = row["score"], row["ai"], row["bj"]
        n_ent, bad = row["n_ent"], row["bad"]
        counts = row
        # RLE entries: only max(n_ent) rows of int8 cross the link
        # (~5x fewer rows at 1/2-1/4 the bytes of the one-op-per-row
        # encoding — the transfer dominated E2E on tunneled backends)
        tmax = int(n_ent.max()) if nreal else 0
        # uint8 view first: entries are bit-packed (op | len << 2)
        # and wrap negative as int8 for len >= 32.
        # Typical walks finish inside the static head slice, whose
        # transfer needs NO eager device slice (an eager slice is a
        # dispatch: ~30 ms RPC on tunneled links, measured in
        # tests/tools/dtbench.py — walk 95 ms vs +36 ms for the slice)
        if head_d is not None and int(summ[SUMMARY_ROWS.index(
                "t_fin"), 0] if nreal else 0) <= head_d.shape[0]:
            rle = np.asarray(head_d)[:tmax, :nreal]
        else:
            rle = np.asarray(rle_d[:tmax, :nreal])
        rle = rle.view(np.uint8).astype(np.int32)

        for s, i in enumerate(sub):
            score = int(ms[s])
            ai, bj = int(mi[s]), int(mj[s])
            if score <= 0 or (ai == 0 and bj == 0):
                tr = TraceResult(score=max(score, 0), alen=0, blen=0,
                                 path="", path_rev="", dcnt=0, agcnt=0,
                                 bgcnt=0, identity=0.0, gap_penalty=0)
            elif bad[s]:
                tr = None
            else:
                ent = rle[:n_ent[s], s]
                r3 = _nat.rle_paths(ent.astype(np.uint8))
                if r3 is None:
                    r3 = rle_paths_py(ent)
                path, path_rev, ops_rev = r3
                dcnt = int(counts["dcnt"][s])
                gap_penalty = (int(counts["n_open"][s]) * p.gi
                               + int(counts["n_ext"][s]) * p.ge
                               + int(counts["gf_pen"][s]))
                tr = TraceResult(
                    score=score, alen=ai, blen=bj, path=path,
                    path_rev=path_rev, dcnt=dcnt,
                    agcnt=int(counts["agcnt"][s]),
                    bgcnt=int(counts["bgcnt"][s]),
                    identity=_identity(p, score, dcnt,
                                       int(counts["e_pen"][s])),
                    gap_penalty=gap_penalty, ops_rev=ops_rev)
            out[i] = (score, ai, bj, tr)

    def _req_lens(self, a, b):
        la = len(a) if isinstance(a, np.ndarray) else (
            a[4] if a[0] == "ref" else 0)
        if not isinstance(a, np.ndarray) and a[0] == "ref":
            _, rid, rev, st0, cp, wr = a
            la = cp if wr else max(0, min(cp, self._ref_len[rid] - st0))
        lb = len(b) if isinstance(b, np.ndarray) else             max(0, self._q_len[b[1]] - b[3])
        return la, lb

    def _duo_slow(self, reqs, sub, out) -> None:
        """Two-step fallback for duo requests whose sides can't take
        the device-store fast path: down, host-side up-window math
        (identical to the fused jit's), then up+trace — all through
        the regular run() machinery."""
        downs = self.run([("down", reqs[i][1], reqs[i][2],
                           reqs[i][3]) for i in sub])
        CAPU_ADD = 4 * 64 + 2 * band.TAIL_N + 64
        ureqs = []
        for d, i in zip(downs, sub):
            rid, rev, qidx, rlen, qlen, cp0, cp1 = reqs[i][4]
            sc, mi_, mj_, _ = d
            tp0 = min(max(cp0 + mi_, 1), rlen)
            tp1 = min(max(cp1 + mj_, 1), qlen)
            au = ("ref", rid, 1, rlen - tp0, 2 * tp1 + CAPU_ADD, 0)
            bu = ("q", qidx, 1 - rev, qlen - tp1)
            ureqs.append(("up", au, bu, 64))
        ups = self.run(ureqs)
        for d, u, i in zip(downs, ups, sub):
            out[i] = (d[0], d[1], d[2], u[0], u[1], u[2], u[3])

    def run(self, reqs: list) -> list:
        """reqs: list of (kind, a, b, W) with kind 'down' or 'up'; a/b
        are either raw code arrays or device-store slice specs (see
        _build_side). Returns per-request (score, mi, mj, trace|None)."""
        out = [None] * len(reqs)
        pending = []            # deferred device-trace harvests
        pending_duo = []        # deferred fused down+up harvests
        pending_plain = []      # deferred no-trace materializations
        groups = {}
        duo_groups = {}
        CAPU_ADD = 4 * 64 + 2 * band.TAIL_N + 64
        for i, req in enumerate(reqs):
            kind, a, b, W = req[0], req[1], req[2], req[3]
            ra, rb = self._req_lens(a, b)
            la = self._bucket(ra + band.TAIL_N + 128)
            lb = self._bucket(rb + band.TAIL_N + 128)
            if kind == "duo":
                rlen, qlen = req[4][3], req[4][4]
                lau = self._bucket(min(2 * qlen + CAPU_ADD, rlen)
                                   + band.TAIL_N + 128)
                lbu = self._bucket(qlen + band.TAIL_N + 128)
                duo_groups.setdefault((W, la, lb, lau, lbu),
                                      []).append(i)
            else:
                groups.setdefault((kind == "up", W, la, lb),
                                  []).append(i)
        if self.use_pallas and getattr(self, "_ref_store2",
                                       None) is not None and \
                getattr(self, "_q_store2", None) is not None:
            need = [
                ("fused", W, la, lb, trace,
                 max(128, -(-min(len(idxs), self.batch) // 128) * 128))
                for (trace, W, la, lb), idxs in groups.items()]
            need += [
                ("duo",) + gk
                + (max(128,
                       -(-min(len(idxs), self.batch) // 128) * 128),)
                for gk, idxs in duo_groups.items()]
            self._prewarm(need)
        for (trace, W, la, lb), idxs in groups.items():
            fn, packed_io = self._fn(W, la, lb, trace)
            for base in range(0, len(idxs), self.batch):
                sub = idxs[base:base + self.batch]
                # pad to the kernel's chunk granularity, not the full
                # cap (padded problems cost nothing: they hit their p
                # limit within the first segments)
                gran = 128 if self.use_pallas else self.batch
                B = max(gran, -(-len(sub) // gran) * gran)
                pooled = False
                if sub and not isinstance(reqs[sub[0]][1], np.ndarray):
                    aspecs = [reqs[i][1] for i in sub]
                    bspecs = [reqs[i][2] for i in sub]
                    zpad_a = ("ref", 0, 0, 0, 0, 0)
                    zpad_b = ("q", 0, 0, 10**9)
                    aspecs += [zpad_a] * (B - len(sub))
                    bspecs += [zpad_b] * (B - len(sub))
                    ma = self._side_meta(aspecs, la, B)
                    mb = self._side_meta(bspecs, lb, B)
                    alen = np.asarray(ma["elen"], np.int32)
                    blen = np.asarray(mb["elen"], np.int32)
                    if ma["ok_pg"] and mb["ok_pg"]:
                        # gather + pack + fill as ONE jit call (each
                        # separate call pays dispatch/RPC overhead)
                        f = self._fused_fn(W, la, lb, trace, B)
                        offa = np.minimum(ma["base"] + ma["start"],
                                          ma["base"] + ma["seglen"])
                        offb = np.minimum(mb["base"] + mb["start"],
                                          mb["base"] + mb["seglen"])
                        fn_call = lambda: f(  # noqa: E731
                            ma["store2"], offa, alen,
                            mb["store2"], offb, blen)
                    else:
                        # the 4-bit pack rides inside the gather jit:
                        # eager strided slicing on device arrays costs
                        # ~5 ms/dispatch of op-by-op overhead
                        ab = self._gather_fn(la, packed_io)(
                            ma["flat"], ma["base"], ma["start"],
                            ma["cap"], ma["seglen"], ma["wrap"])
                        bb = self._gather_fn(lb, packed_io)(
                            mb["flat"], mb["base"], mb["start"],
                            mb["cap"], mb["seglen"], mb["wrap"])
                        fn_call = None
                    spec_packed = True
                else:
                    fn_call = None
                    spec_packed = False
                    pooled = True
                    ab = self._dispatch_buf("a", (B, la))
                    bb = self._dispatch_buf("b", (B, lb))
                    alen = np.zeros(B, np.int32)
                    blen = np.zeros(B, np.int32)
                    for s, i in enumerate(sub):
                        _, a, b, _ = reqs[i]
                        ab[s, :len(a)] = a
                        bb[s, :len(b)] = b
                        alen[s] = len(a)
                        blen[s] = len(b)
                if packed_io and not spec_packed:
                    # 4-bit pack: nibbles are codes 0-4, lossless
                    ab = ab[:, 0::2] | (ab[:, 1::2] << 4)
                    bb = bb[:, 0::2] | (bb[:, 1::2] << 4)
                elif pooled and self.use_pallas:
                    # XLA-fallback dispatch of a pooled staging buffer:
                    # detach so a later in-place refill can never
                    # corrupt an in-flight batch if the backend defers
                    # the host->device copy (the packed branch above
                    # makes fresh arrays implicitly)
                    ab = ab.copy()
                    bb = bb.copy()
                if fn_call is None:
                    fn_call = lambda: fn(ab, alen, bb, blen)  # noqa: B023,E731
                if trace:
                    import os
                    res_d, bufs = fn_call()
                    if self.use_pallas and \
                            not os.environ.get("MINIALIGN_HOST_TRACE"):
                        pending.append(self._trace_device_dispatch(
                            sub, W, res_d, bufs))
                        if self.stats is not None:
                            self.stats.append(
                                ("trace", -(-len(sub) // 16) * 16, B))
                        continue
                    res = type(res_d)(*(np.asarray(x) for x in res_d))
                    # the traceback walks backward from the max and
                    # never past it: ship only the reachable blocks
                    # (the full buffers are 10-100x larger and the
                    # device->host link is the E2E bottleneck)
                    nreal = len(sub)
                    nblk = int((res.max_i[:nreal]
                                + res.max_j[:nreal]).max()) \
                        // band.BLK + 2
                    nblk = min(-(-nblk // 32) * 32, bufs.dirs.shape[1])
                    masks = np.asarray(bufs.masks[:nreal, :nblk])
                    dirs = np.asarray(bufs.dirs[:nreal, :nblk])
                    iheads = np.asarray(bufs.iheads[:nreal])
                    for s, i in enumerate(sub):
                        tr = traceback_one(
                            self.p, W, masks[s], dirs[s], iheads[s],
                            int(res.max_score[s]), int(res.max_i[s]),
                            int(res.max_j[s]))
                        out[i] = (int(res.max_score[s]), int(res.max_i[s]),
                                  int(res.max_j[s]), tr)
                else:
                    res = fn_call()
                    pending_plain.append((sub, res))
        for gkey, idxs in duo_groups.items():
            W, la, lb, lau, lbu = gkey
            zpad_a = ("ref", 0, 0, 0, 0, 0)
            zpad_b = ("q", 0, 0, 10**9)
            for base in range(0, len(idxs), self.batch):
                sub = idxs[base:base + self.batch]
                B = max(128, -(-len(sub) // 128) * 128)
                aspecs = [reqs[i][1] for i in sub] \
                    + [zpad_a] * (B - len(sub))
                bspecs = [reqs[i][2] for i in sub] \
                    + [zpad_b] * (B - len(sub))
                ma = self._side_meta(aspecs, la, B)
                mb = self._side_meta(bspecs, lb, B)
                if not (ma["ok_pg"] and mb["ok_pg"]):
                    self._duo_slow(reqs, sub, out)
                    continue
                offa = np.minimum(ma["base"] + ma["start"],
                                  ma["base"] + ma["seglen"])
                offb = np.minimum(mb["base"] + mb["start"],
                                  mb["base"] + mb["seglen"])
                rvbase = np.zeros(B, np.int32)
                qub = np.zeros(B, np.int32)
                rlen_r = np.ones(B, np.int32)
                qlen_r = np.ones(B, np.int32)
                cp0_r = np.zeros(B, np.int32)
                cp1_r = np.zeros(B, np.int32)
                for s, i in enumerate(sub):
                    rid, rev, qidx, rlen, qlen, cp0, cp1 = reqs[i][4]
                    rvbase[s] = self._ref_rv[rid]
                    b0, b1 = self._q_bases[qidx]
                    qub[s] = b1 if (1 - rev) else b0
                    rlen_r[s] = rlen
                    qlen_r[s] = qlen
                    cp0_r[s] = cp0
                    cp1_r[s] = cp1
                f = self._duo_fn(W, la, lb, lau, lbu, B)
                rle_d, head_d, s16_d = f(
                    ma["store2"], offa, ma["elen"],
                    mb["store2"], offb, mb["elen"],
                    rvbase, qub, rlen_r, qlen_r, cp0_r, cp1_r)
                pending_duo.append((sub, rle_d, head_d, s16_d))
                if self.stats is not None:
                    self.stats.append(
                        ("duo", -(-len(sub) // 16) * 16, B))
        # start all device->host copies before any blocking harvest:
        # summaries and rle heads of later batches stream over the
        # link while earlier walks are still materializing
        from .dp.dtrace import SUMMARY_ROWS as _SR
        for pend in pending:
            for x in (pend[3], pend[4]):
                if hasattr(x, "copy_to_host_async"):
                    x.copy_to_host_async()
        for _, _, head_d, s16_d in pending_duo:
            for x in (head_d, s16_d):
                if hasattr(x, "copy_to_host_async"):
                    x.copy_to_host_async()
        for pend in pending:
            self._trace_device_harvest(out, pend)
        nsr = len(_SR)
        for sub, rle_d, head_d, s16_d in pending_duo:
            s16 = np.asarray(s16_d)[:, :len(sub)]
            dsum = s16[nsr:nsr + 3]
            ups = [None] * len(sub)
            self._trace_device_harvest(ups, (list(range(len(sub))),
                                             64, rle_d, head_d,
                                             s16[:nsr]))
            for s, i in enumerate(sub):
                usc, uai, ubj, tr = ups[s]
                out[i] = (int(dsum[0, s]), int(dsum[1, s]),
                          int(dsum[2, s]), usc, uai, ubj, tr)
        for sub, res in pending_plain:
            # one stacked transfer: separate materializations each pay
            # a full RPC on tunneled links
            import jax.numpy as jnp
            smm = np.asarray(jnp.stack(
                [res.max_score, res.max_i, res.max_j]))
            ms, mi, mj = smm[0], smm[1], smm[2]
            for s, i in enumerate(sub):
                out[i] = (int(ms[s]), int(mi[s]), int(mj[s]), None)
        return out


# ---------------------------------------------------------------------------
# per-read extension task
# ---------------------------------------------------------------------------

def _slice_cap(brem: int, W: int) -> int:
    return 2 * brem + 4 * W + 2 * band.TAIL_N + 64


def _slice_a(codes: np.ndarray, start: int, brem: int, W: int,
             circ: bool = False) -> np.ndarray:
    cap = _slice_cap(brem, W)
    if circ:
        # circular section re-feed (rtp, minialign.c:3753): the same
        # ref section is fed again past its end, i.e. codes[pos % len]
        return np.take(codes, np.arange(start, start + cap), mode="wrap")
    return codes[start:start + cap]


@dataclasses.dataclass
class _SearchState:
    """mm_search_t equivalent (minialign.c:3216-3227)."""
    cp: tuple
    tp: tuple
    rev: int
    prem: int
    pacc: int = 0
    srem: int = MM_SREM
    narrow: int = 0
    sid: int = 0
    next_arr: list = dataclasses.field(default_factory=list)


def _load_next(st: _SearchState, seeds, tglen: int, rid: int, qlen: int,
               rlen: int = 1 << 62, kk: int = 0):
    """mm_search_load_next (minialign.c:3888-3948): pick a rescue seed
    within the tglen window behind the current head."""
    if st.srem == 0:
        return False
    st.srem -= 1

    bx = st.cp[1] - (qlen if st.rev else 0)
    fu = int(_u(st.cp[0], bx))
    fv = int(_v(st.cp[0], bx))

    ofs2 = 2 * tglen
    plim = ofs2 - st.pacc
    if st.pacc > ofs2:
        st.next_arr = []
    kept = []
    for pd, sid in st.next_arr:
        if pd >= plim:
            break
        kept.append((pd + st.pacc, sid))
    st.next_arr = kept

    rcnt = 2 * st.srem
    sid = st.sid
    while sid > 0 and rcnt > 0:
        su = int(seeds[sid - 1, 0])
        sr = int(seeds[sid - 1, 1])
        sv = int(seeds[sid - 1, 2])
        if sr < rid or su + tglen < fu:
            break
        inside = (fv > sv) and (fv <= sv + tglen) and (sr == rid)
        near = (fv > sv) and (fv <= sv + 128) and (fu <= su + 128) \
            and (sr == rid)
        if inside and not near:
            pdiff = (su + tglen - fu) + (sv + tglen - fv)
            st.next_arr.append((pdiff, sid - 1))
            rcnt -= 1
        sid -= 1
    st.sid = sid
    if not st.next_arr:
        st.pacc = 0
        st.srem = 0
        return False
    # radix_sort_64x keyed on pdiff ONLY (minialign.c:3931): equal
    # pdiffs keep ksort's permutation, and the reference pops the
    # LAST element after the sort
    from .ksort import ks_radix64
    keys = np.asarray([pd & 0xFFFFFFFF for pd, _ in st.next_arr],
                      np.uint32)
    order = ks_radix64(keys)
    st.next_arr = [st.next_arr[i] for i in order]
    pdiff, nsid = st.next_arr.pop()
    st.pacc = ofs2 - pdiff

    x, y = coords_to_xy(seeds[nsid, 0], seeds[nsid, 2])
    st.rev = 1 if y < 0 else 0
    apos = x
    bpos = y + (qlen if y < 0 else 0)
    # mm_search_load_pos over-end adjustment also runs on rescue
    # loads (minialign.c:3937); rlen is current here (mm_init_ref ran
    # at the root load)
    if apos >= rlen or bpos >= qlen:
        apos -= min(apos, kk)
        bpos -= min(bpos, kk)
    st.cp = (apos, bpos)
    return st.srem > 0


def extend_read(mp: MapParams, mi: MMIndex, qcodes: np.ndarray, qid: int,
                qidx: int | None = None, tbuf: dict | None = None,
                duo: bool = False):
    """Generator: yields ('down'|'up', a, b, W) requests, receives
    (score, mi, mj, trace) via .send(). Returns (res, slots, rec) where
    res is a list of [accumulated_score, Bin] and slots the global
    aln-slot list (mm_align_seq up to the extend stage,
    minialign.c:4427-4450).

    tbuf carries the reference's per-thread-buffer state: the root
    bounds test in mm_search_load_pos (minialign.c:3828) reads
    self->rlen BEFORE mm_init_ref updates it (minialign.c:3865-3873),
    so it sees the ref length of the PREVIOUSLY loaded root — of an
    earlier chain, an earlier read, or 0 (calloc) for the very first
    root of the buffer's lifetime (one mm_align_init per index block).
    tbuf = {"rlen": <stale value>, "spec": bool}; with spec=True the
    first root of this read uses the current ref length as a guess and
    the caller replays the read if the guess disagrees with the true
    sequential value (see pipeline.align_batch). rec reports what this
    read did: its first root's raw position and fired flag, and the
    rlen it leaves behind."""
    score_p = mp.score
    qlen = len(qcodes)
    rec = {"first": None, "fired": False, "out_rlen": None}
    if tbuf is None:
        tbuf = {"rlen": 0, "spec": False}
    if qlen < mi.k or qlen * score_p.mcoef < mp.min_score:
        return None

    qf = np.ascontiguousarray(np.asarray(qcodes, np.int8))
    qr = revcomp_codes(qf)
    qrc = {0: qf, 1: qr}
    twlen = mp.wlen              # _ud(wlen, wlen) == wlen
    tglen = mp.glen

    st_seed = None
    res = []                     # [accumulated_score, Bin]
    slots = []                   # global aln slots (self->bin array)
    pos_hash = {}                # _key -> [eid, nid]
    crem = MM_CREM

    for rnd in range(len(mi.occ)):
        if rnd == 0:
            st_seed = collect_seeds(mi, qf)
        seeds = seed_round(mi, st_seed, rnd)
        if seeds is None or len(seeds) == 0:
            continue
        chains = chain_seeds(seeds, twlen, lens=mi.lens,
                             circular=mi.circular)
        if not chains:
            continue

        for ch in chains:
            if ch.plen * score_p.mcoef < 2.0 * mp.min_score:
                break
            # ---- load root (minialign.c:3839-3885)
            rsid = ch.root_sid
            x, y = coords_to_xy(seeds[rsid, 0], seeds[rsid, 2])
            rid = int(seeds[rsid, 1])
            rcodes = np.asarray(mi.codes[rid], np.int8)
            rrev = ref_revcomp(mi, rid)
            rlen = int(mi.lens[rid])
            circ = bool(mi.circular[rid])
            apos = x
            bpos = y + (qlen if y < 0 else 0)
            if rec["first"] is None:
                rec["first"] = (apos, bpos)
                fired = (apos >= (rlen if tbuf["spec"] else tbuf["rlen"])
                         or bpos >= qlen)
                rec["fired"] = fired
            else:
                fired = apos >= tbuf["rlen"] or bpos >= qlen
            if fired:
                apos -= min(apos, mi.k)
                bpos -= min(bpos, mi.k)
            tbuf["rlen"] = rlen
            rec["out_rlen"] = rlen
            st = _SearchState(cp=(apos, bpos), tp=(apos, bpos),
                              rev=1 if y < 0 else 0, prem=ch.plen,
                              sid=rsid)
            eid = len(res)
            bin_ = Bin()
            res.append([0, bin_])
            slots_mark = len(slots)

            first = True
            while st.srem > 0 and st.prem > 0:
                if not first:
                    if not _load_next(st, seeds, tglen, rid, qlen,
                                      rlen=rlen, kk=mi.k):
                        break
                first = False
                W = WIDTHS[st.narrow]
                qdir = qrc[st.rev]

                # ---- downward extension (+ fused speculative up:
                # one device round per trial when the store path and
                # non-circular geometry allow — mm_extend_core's
                # down/up pair, minialign.c:4075-4147)
                cap = _slice_cap(qlen - st.cp[1], W)
                use_duo = (duo and qidx is not None and not circ
                           and st.cp[0] >= 0 and st.cp[1] >= 0)
                if use_duo:
                    a = ("ref", rid, 0, st.cp[0], cap, 0)
                    b = ("q", qidx, st.rev, st.cp[1])
                    meta = (rid, st.rev, qidx, rlen, qlen,
                            st.cp[0], st.cp[1])
                    sc, mi_, mj_, usc, umi, umj, tr = yield (
                        "duo", a, b, W, meta)
                else:
                    if qidx is not None:
                        a = ("ref", rid, 0, st.cp[0], cap,
                             rlen if circ else 0)
                        b = ("q", qidx, st.rev, st.cp[1])
                    else:
                        a = _slice_a(rcodes, st.cp[0], qlen - st.cp[1],
                                     W, circ)
                        b = qdir[st.cp[1]:]
                    sc, mi_, mj_, _ = yield ("down", a, b, W)
                if sc == 0:
                    continue
                ae, be = st.cp[0] + mi_, st.cp[1] + mj_
                if circ and ae > rlen:
                    # gaba reports the max within the re-fed section;
                    # fold the unwrapped end back (pos in (0, rlen])
                    ae = ((ae - 1) % rlen) + 1
                # test_dup (minialign.c:3953-3994), clip to [1, len]
                st.tp = (min(max(ae, 1), rlen), min(max(be, 1), qlen))
                k = _poskey(ae, be, rid, qid)
                dup = k in pos_hash
                pos_hash[k] = [eid, -1]
                if dup:
                    # the fused path's speculative up result is simply
                    # discarded — byte-neutral vs the two-step skip
                    st.narrow = min(st.narrow + 1, 2)
                    continue

                if not use_duo:
                    # ---- upward extension on reversed sequences
                    W0 = WIDTHS[0]
                    capu = _slice_cap(st.tp[1], W0)
                    if qidx is not None:
                        au = ("ref", rid, 1, rlen - st.tp[0], capu,
                              rlen if circ else 0)
                        # revcomp(qdir) is just the OTHER strand copy
                        bu = ("q", qidx, 1 - st.rev, qlen - st.tp[1])
                    else:
                        au = _slice_a(rrev, rlen - st.tp[0], st.tp[1],
                                      W0, circ)
                        bu = revcomp_codes(qdir)[qlen - st.tp[1]:]
                    usc, umi, umj, tr = yield ("up", au, bu, W0)
                if usc < mp.min_score or tr is None:
                    continue

                ae, be = st.tp
                as0_u, bs0 = ae - umi, be - umj
                segs = split_segments(as0_u, bs0, tr.path_rev, rlen,
                                      ops=list(tr.ops_rev) or None) \
                    if (circ and as0_u < 0) else None
                as0 = segs[0].as0 if segs else as0_u
                aln = Aln(rid=rid, rev=st.rev, as0=as0, ae=ae,
                          bs0=bs0, be=be, score=usc, path=tr.path_rev,
                          identity=tr.identity, dcnt=tr.dcnt,
                          agcnt=tr.agcnt, bgcnt=tr.bgcnt, segs=segs,
                          upath=tr.path)

                # ---- record (minialign.c:4018-4067)
                st.cp = (as0, bs0)
                st.prem -= aln.plen
                st.pacc = aln.plen
                hk = _poskey(as0, bs0, rid, qid)
                tk = _poskey(ae, be, rid, qid)
                hent = pos_hash.get(hk)
                new = hent is None or hent[1] == -1 \
                    or hent[1] >= len(slots)        # stale after rollback
                if new:
                    nid = len(slots)
                    slots.append(aln)
                    bin_.slot_idx.append(nid)
                else:
                    nid = hent[1]
                ovl = ((max(bin_.lb, bs0) - min(bin_.ub, be)
                        - bs0 + be) & 0xFFFFFFFF)
                res[eid][0] += aln.score + int((ovl * 2) * aln.identity)
                bin_.n_aln += 1 if new else 0
                bin_.plen += aln.plen
                bin_.lb = min(bin_.lb, bs0)
                bin_.ub = max(bin_.ub, be)
                if (not new) and slots[nid].score > aln.score:
                    pos_hash[tk] = [eid, -1]
                else:
                    if not new:
                        slots[nid] = aln
                    pos_hash[hk] = [eid, nid]
                    pos_hash[tk] = [eid, nid]
                st.srem, st.narrow = MM_SREM, 0
                if (not new) or st.prem <= 0:
                    break

            # ---- finish root (minialign.c:3795-3811)
            if bin_.n_aln == 0 or res[eid][0] < mp.min_score:
                res.pop()
                del slots[slots_mark:]
                crem -= 1
            else:
                crem = MM_CREM if crem != 0 else 0
            if crem == 0:
                break
        if res:
            break

    if not res:
        return None, None, rec
    return res, slots, rec
