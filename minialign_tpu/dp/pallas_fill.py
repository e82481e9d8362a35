"""Pallas TPU kernel for the adaptive-banded DP fill.

Same semantics as dp/band.py (the XLA reference implementation), with
the hardware-fit layout: the band lives in SUBLANES (W rows), the
problem batch in LANES (128 columns per grid chunk), so each vector op
processes W x 128 cells.

The ENTIRE fill — every 32-step block of every problem to termination
— runs as ONE pallas launch (grid = batch chunks of 128):

  per segment of K blocks (in-kernel while_loop, early exit when all
  problems hit X-drop or their p limit):
    1. _extract_window gathers each problem's next K*32 chars at its
       own (data-dependent) offset — per-lane binary-shift selects
       over the pre-transposed (L, B) char arrays in VMEM, because
       Mosaic has no per-lane dynamic slicing and DMA slices need
       8-row tile alignment.
    2. K*32 band steps with the whole state in vector registers:
       4 int32 (W,B) score arrays, char arrays, int8 char slabs
       consumed by conditional rolls, and (1,B) tracking rows.
    3. trace mode: per-step mask words staged in VMEM, DMA'd to the
       HBM mask buffer per segment.

Hard-won Mosaic/v5e performance rules baked in here (each measured):
  * NO scalar (SMEM) operand may flow into the vector step math
    (~35x slowdown) — per-problem scalars ride as broadcast rows.
  * the fori carry must fit the vector register file; spills cost
    ~10x. One launch per fill instead of one per K blocks matters
    most on tunneled backends (~30 ms RPC per dispatch).
  * int8 values may be rolled/selected but not compared (layout
    inference fails); chars convert to int32 at slab consumption.

The reference equivalent of a segment is fill_bulk_k_blocks
(gaba.c:1873): fetch 32+32 bases, 32 vector steps, store masks/state.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import ScoreParams
from . import band
from .band import BLK, NCODE, TAIL_N, FillResult, TraceBuffers, score_floor

# scalar-row indices in the (16, B) int32 state block. Per-problem
# "scalars" travel as broadcast VMEM rows, NOT SMEM scalars: a scalar
# SMEM operand flowing into the step math makes Mosaic emit
# catastrophically slow code (~35x, measured on v5e).
(R_IHEAD, R_RPREV, R_TERM, R_GMAX, R_GI, R_GJ, R_NSTEPS, R_PLIM,
 R_NSEG, R_CDROP) = range(10)
NROWS = 16

# Step-math compute dtype. float32 on v5e: the VPU's fp path runs the
# add/max mix ~1.6x faster than int32 (integer max is emulated;
# tests/tools/probe_bf16ops.py, round 4: 31 vs 49 ns/step on the
# 6-array mix). Every band value is an integer with |v| <= ~2^17
# (scores bounded by plim * max_match, floor at about -2^15), exactly
# representable in f32's 24-bit mantissa — adds/maxes/compares are
# bit-exact, so parity is unaffected. int32 remains selectable for
# A/B: MINIALIGN_FILL_DTYPE=int32.
import os as _os

FDT = jnp.int32 if _os.environ.get(
    "MINIALIGN_FILL_DTYPE") == "int32" else jnp.float32

# Chunk-major grid layout (round 5). With a multi-chunk grid the old
# lane-sliced BlockSpecs (block (rows, BC) at lane offset chunk*BC of a
# (rows, B) array) make every per-chunk stage a column slice — which
# the DMA engine executes as `rows` small strided row copies. That is
# the exact stall mode round 3 measured for the mask destinations
# (~1.5k strided copies, ~60 ns/step) and fixed with chunk-major
# layout; the word sources (~4.3k rows/side at L=20k) and the NB-sized
# trace outputs never got the same treatment, which is the measured
# multi-chunk penalty (PERF_NOTES: 48->96->122 ns/chunk-step at 1/2/4
# chunks, L=20480, flat at L=4096). Chunk-major hosts every grid
# block contiguously: (nchunk, rows, BC). 0 = round-4 layout (A/B).
CMAJ = _os.environ.get("MINIALIGN_FILL_CMAJ", "1") != "0"

# Split multi-chunk batches into SEPARATE single-chunk pallas calls
# inside one jit (one XLA custom call per 128-lane chunk, identical
# Mosaic binary) instead of a grid=(nchunk,) launch. Probes whether
# the multi-chunk penalty is the grid machinery itself (revolving
# VMEM buffer addressing) rather than data layout.
SPLIT = _os.environ.get("MINIALIGN_FILL_SPLIT", "0") != "0"

# Diagnostic: skip the pallas call and return dummy results built
# from the prepped inputs (word packs + init band state). Isolates
# host-graph prep cost from kernel cost in kbench_ab A/Bs. Never set
# in production (results are wrong by construction).
PREPONLY = _os.environ.get("MINIALIGN_FILL_PREPONLY", "0") != "0"


def _step_t(p: ScoreParams, W: int, B: int, carry, anext, bnext, pp,
            bulk: bool = False, trace: bool = True):
    """One anti-diagonal step on (W, B)-transposed arrays. Mirrors
    band._step; see there for the lane algebra and boundary rules.
    With bulk=True the i/j boundary handling is omitted entirely — the
    caller guarantees no lane can touch i==0 / j==0 / negative during
    the launch (the reference's fill_bulk_block vs fill_cap split,
    gaba.c:1821/1925), making bulk bit-identical where selected.

    Band characters ride PACKED as one (W/2, B) int32 array: row r
    carries lane r's (ach << 3 | bch) in bits[5:0] and lane (r+W/2)'s
    in bits[21:16] (codes are 3-bit: 0-3 bases + 4 = N/pad). That is
    a quarter of the register footprint of two (W, B) int32 char
    arrays — the fori carry sits at the v5e vector-register-file
    boundary, where every array matters (round-2 ablations)."""
    floor = score_floor(p)
    gi, ge = p.gi, p.ge
    gfa, gfb = p.gfa_eff, p.gfb_eff

    S, Sp, E, F, P, ihead, rprev = carry

    # down flag kept as int32 0/1 (Mosaic dislikes i1-valued selects)
    if bulk:
        down_i = (S[W - 1:W] > S[0:1]).astype(jnp.int32)          # (1, B)
    else:
        edge_ok = (ihead - (W - 1) >= 0) & ((pp + 2) - ihead >= 0)
        down_i = jnp.where(edge_ok,
                           (S[W - 1:W] > S[0:1]).astype(jnp.int32),
                           (pp + 1) & 1)                          # (1, B)
    d = down_i == 1                                               # (1, B)

    def roll_q(x, delta, fill):
        if delta == 1:
            return jnp.concatenate(
                [x[1:], jnp.full((1, B), fill, x.dtype)], axis=0)
        return jnp.concatenate(
            [jnp.full((1, B), fill, x.dtype), x[:-1]], axis=0)

    SsrcE = jnp.where(d, roll_q(S, 1, floor), S)
    EsrcE = jnp.where(d, roll_q(E, 1, floor), E)
    SsrcF = jnp.where(d, S, roll_q(S, -1, floor))
    FsrcF = jnp.where(d, F, roll_q(F, -1, floor))

    E_new = jnp.maximum(SsrcE - gi, EsrcE) - ge
    F_new = jnp.maximum(SsrcF - gi, FsrcF) - ge

    sh = down_i - rprev                                           # (1, B)
    Sdiag = jnp.where(sh == 1, roll_q(Sp, 1, floor),
                      jnp.where(sh == -1, roll_q(Sp, -1, floor), Sp))

    # Chars ride 2-lanes-per-int32: row r of the (W/2, B) array P
    # holds lane r in bits[5:0] and lane r+W/2 in bits[21:16] (each
    # field (ach << 3) | bch). Both per-step char movements stay pure
    # ROW rolls in this layout — only the seam row (the lane-W/2
    # boundary) needs a (1, B) fix — and the unpack for the
    # substitution score is a cheap aligned sublane concat. Halves the
    # char register footprint and roll traffic vs a (W, B) array.
    H = W // 2
    ACH_M = (56 << 16) | 56           # ach fields of both halves
    BCH_M = (7 << 16) | 7             # bch fields
    # down: b-chars roll up one lane; lane H-1 takes lane H's bch
    # (= row 0's high field), lane W-1 takes bnext
    seam_dn = ((P[0:1] >> 16) & 7) | (bnext << 16)
    P_up = jnp.concatenate([P[1:], seam_dn], axis=0)
    P_dn_v = (P & ACH_M) | (P_up & BCH_M)
    # right: a-chars roll down; lane 0 takes anext, lane H takes lane
    # H-1's ach (= row H-1's low field)
    seam_up = (anext << 3) | ((P[H - 1:H] & 56) << 16)
    P_dnr = jnp.concatenate([seam_up, P[:-1]], axis=0)
    P_rt_v = (P & BCH_M) | (P_dnr & ACH_M)
    P_new = jnp.where(d, P_dn_v, P_rt_v)

    # substitution score without a table gather (no pshufb on TPU):
    # computed per packed half, then one aligned concat to (W, B).
    # Uniform matrices (every preset) need 2 selects per half;
    # -e-modified matrices fall back to a 16-term select chain.
    mat = p.matrix44()
    n_sub = -2 * (gi + ge)
    al, bl = (P_new >> 3) & 7, P_new & 7
    ah, bh = (P_new >> 19) & 7, (P_new >> 16) & 7
    # code 4 (N/pad) has bit 2 set: field tests are single mask-cmps
    n_l = (P_new & 0x24) != 0
    n_h = (P_new & 0x240000) != 0
    # substitution scores are produced directly in FDT (the char field
    # tests stay int32; only the selected VALUES are FDT constants)
    cst = functools.partial(jnp.asarray, dtype=FDT)
    if len(set(np.diag(mat).tolist())) == 1 and \
            len(set(mat[~np.eye(4, dtype=bool)].tolist())) == 1:
        m_, x_ = int(mat[0, 0]), int(mat[0, 1])
        sub_l = jnp.where(al == bl, cst(m_), cst(x_))
        sub_h = jnp.where(ah == bh, cst(m_), cst(x_))
    else:
        sub_l = jnp.zeros(al.shape, FDT)
        sub_h = jnp.zeros(ah.shape, FDT)
        for y in range(4):
            for x in range(4):
                sub_l = jnp.where((al == x) & (bl == y),
                                  cst(int(mat[y, x])), sub_l)
                sub_h = jnp.where((ah == x) & (bh == y),
                                  cst(int(mat[y, x])), sub_h)
    sub_l = jnp.where(n_l, cst(n_sub), sub_l)
    sub_h = jnp.where(n_h, cst(n_sub), sub_h)
    subsc = jnp.concatenate([sub_l, sub_h], axis=0)

    S_new = jnp.maximum(
        Sdiag + subsc,
        jnp.maximum(jnp.maximum(E_new, SsrcE - gfb),
                    jnp.maximum(F_new, SsrcF - gfa)))
    S_new = jnp.maximum(S_new, floor)

    if trace:
        # slots 4-5 are gaba's e.all/f.all open components (the NEXT
        # cell's E/F opens from this cell's S; ties open — gaba.c:1631
        # te = max(de, t), bit = te == t); must match dp/band.py
        masks = (
            S_new == SsrcF - gfa,
            S_new == F_new,
            S_new == SsrcE - gfb,
            S_new == E_new,
            S_new - gi >= F_new,
            S_new - gi >= E_new,
        )
    else:
        masks = ()

    ihead_new = ihead + (1 - down_i)
    p_new = pp + 1
    q = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)

    if not bulk:
        i_lane = ihead_new - q                                    # (W, B)
        j_lane = (p_new + 2) - i_lane

        if p.model == 2:
            gap_a_j = jnp.maximum(-gi * (j_lane > 0) - ge * j_lane,
                                  -p.gfa * j_lane)
            gap_b_i = jnp.maximum(-gi * (i_lane > 0) - ge * i_lane,
                                  -p.gfb * i_lane)
        else:
            gap_a_j = -gi * (j_lane > 0) - ge * j_lane
            gap_b_i = -gi * (i_lane > 0) - ge * i_lane
        # computed in int32 from the lane iotas, consumed in FDT; the
        # ladders are bounded by ge * plim (< 2^17), exact in f32
        gap_a_j = jnp.maximum(gap_a_j, floor).astype(FDT)
        gap_b_i = jnp.maximum(gap_b_i, floor).astype(FDT)

        on_i0 = (i_lane == 0) & (j_lane >= 0)
        on_j0 = (j_lane == 0) & (i_lane >= 0)
        invalid = (i_lane < 0) | (j_lane < 0)

        S_new = jnp.where(on_i0, gap_a_j, S_new)
        S_new = jnp.where(on_j0, gap_b_i, S_new)
        S_new = jnp.where(invalid, floor, S_new)
        E_new = jnp.where(on_j0, gap_b_i, E_new)
        E_new = jnp.where(on_i0 | invalid, floor, E_new)
        F_new = jnp.where(on_i0, gap_a_j, F_new)
        F_new = jnp.where(on_j0 | invalid, floor, F_new)

        cand = jnp.where(on_i0 | on_j0 | invalid, floor, S_new)
    else:
        cand = S_new
    step_max = jnp.max(cand, axis=0, keepdims=True)               # (1, B)
    # first-max lane (Mosaic lacks integer argmax): min index where
    # cand equals the max
    step_arg = jnp.min(jnp.where(cand == step_max, q, W),
                       axis=0, keepdims=True).astype(jnp.int32)   # (1, B)

    new_carry = (S_new, S, E_new, F_new, P_new,
                 ihead_new, 1 - down_i)
    return new_carry, down_i, masks, step_max, step_arg




def _div10(x):
    """Exact floor(x / 10) for int32 x in [0, 2**19), as vector ops
    (Mosaic has no integer vector divide): f32 multiply by fl(0.1)
    then truncate. Verified exhaustively over the full range in
    tests/test_pallas_fill.py::test_div10_exhaustive."""
    return (x.astype(jnp.float32) * 0.1).astype(jnp.int32)


def _extract_window(src_ref, off, SL: int, P: int, B: int,
                    scr0_ref, scr1_ref):
    """Per-problem window gather without DMA: returns the (SL, B)
    window with row r = src[off_b + r, b] for each lane b.

    src_ref is (2**P + SL, B) (sentinel-padded past the data) and
    off is a (1, B) int32 in [0, 2**P]. The per-lane offset is removed
    one binary digit at a time, top-down: level k selects, per lane,
    between the slice shifted by 2**k and the unshifted slice
    (vector selects only — Mosaic has no per-lane dynamic slicing, and
    DMA slices would need 8-row tile alignment). Total traffic is
    ~2 * len(src) elements, amortized over a whole segment."""
    cur, nxt = scr0_ref, scr1_ref
    src = src_ref
    for k in range(P - 1, -1, -1):
        ln = SL + (1 << k)
        bit = ((off >> k) & 1) == 1
        sel = jnp.where(bit, src[(1 << k):(1 << k) + ln], src[0:ln])
        # always round-trip through the scratch ref: values built from
        # sublane-unaligned slices carry layouts Mosaic cannot feed
        # into later selects/compares (relayout error); a ref store +
        # aligned reload normalizes the layout
        nxt[0:ln] = sel
        if k == 0:
            return nxt[0:SL]
        src = nxt
        cur, nxt = nxt, cur
    return src[0:SL]        # P == 0: off is identically 0


def _make_fill_kernel(p: ScoreParams, W: int, B: int, trace: bool,
                      K: int, n_seg: int, PA: int, PB: int,
                      PSRCA: int, PSRCB: int,
                      tlA: bool = False, tlB: bool = False,
                      J: int = 8, PSUP: int = 7, PSEG: int = 4):
    """Whole-fill kernel: ONE pallas launch runs every 32-step block of
    every problem to completion (per-launch dispatch costs ~300us on
    tunneled backends — the multi-launch design spent 6x more time
    launching than filling). Segments of K blocks alternate:
      extract char windows (per-problem offsets, word-packed cascade)
      -> 32*K register-resident band steps (the fori carry fits the
         vector register file: 4 f32 (W,B) + packed chars + 2 int8
         slabs + a few rows)
      -> stage out masks (trace) via aligned DMA to HBM.
    An in-kernel while_loop exits early when every problem has hit
    X-drop or its p limit. The reference equivalent of one segment is
    fill_bulk_k_blocks (gaba.c:1873).

    Char sourcing (round 4): sources arrive PACKED 10 chars per int32
    (3-bit fields), so every per-lane-offset cascade runs over ~10x
    fewer rows than the round-3 int8 design (the cascades were ~40% of
    step time at L=20k). Hierarchy, all offsets in WORD units:
      source (2**PSRC + win rows)
        -> [tl only] super window, refreshed every J segments
        -> segment window (SEGW = 2**PSEG + 5 rows), per segment
        -> 5-row block window -> phase-align -> 32-row int8 slab
           (broadcast-row + static per-sublane shifts).
    The reference analogue is fill_fetch's constant 32+32 bases per
    block (gaba.c:958-1144)."""
    floor = score_floor(p)
    c = W // 2
    SL = K * BLK
    SEGW = (1 << PSEG) + 5
    SUPW = (1 << PSUP) + SEGW

    def kernel(*refs):
        # signature: 9 inputs, then outputs, then scratch. The state
        # outputs are NOT aliased to the inputs (aliasing + grid
        # blocking miscompiles: chunks past the first come back
        # uninitialized); instead the state is copied in explicitly at
        # the start of each grid step.
        wa_ref, wb_ref = refs[0], refs[1]
        ins = refs[2:8]
        rest = list(refs[8:])
        if trace:
            (S_ref, Sp_ref, E_ref, F_ref, P_ref, sc_ref,
             masks_ref, dirs_ref, iheads_ref, rprevs_ref) = rest[:10]
            rest = rest[10:]
        else:
            (S_ref, Sp_ref, E_ref, F_ref, P_ref, sc_ref) = rest[:6]
            rest = rest[6:]
        scr0, scr1, scrW, segwa_ref, segwb_ref = rest[:5]
        rest = rest[5:]
        supa_ref = supb_ref = basesc = None
        if tlA or tlB:
            basesc = rest[0]
            rest = rest[1:]
        if tlA:
            supa_ref = rest[0]
            rest = rest[1:]
        if tlB:
            supb_ref = rest[0]
            rest = rest[1:]
        if trace:
            mstage_ref, sem = rest[0], rest[1]
        for src, dst in zip(ins, (S_ref, Sp_ref, E_ref, F_ref,
                                  P_ref, sc_ref)):
            dst[:] = src[:]

        nrow = jnp.full((1, B), NCODE, jnp.int8)
        # program_id is unavailable inside while_loop bodies (interpret
        # lowering lacks the grid env there) — read it at kernel level
        chunk = pl.program_id(0)

        if trace:
            # the mask staging buffer is double-buffered: segment s
            # writes buffer s%2 and starts its DMA without waiting;
            # the wait happens two segments later, just before the
            # buffer is reused, overlapping the HBM write with a full
            # segment (K*BLK steps) of compute. A synchronous
            # start+wait stalled ~60 ns/step on v5e (round-3 ablation).
            # destination is (nchunk, NB, BLK, 16, B): each chunk owns
            # a contiguous leading-dim block, so the per-segment DMA is
            # one 0.8 MB burst. Slicing lanes of a wider array instead
            # (chunk*B:chunk*B+B on the last dim) degenerates to ~1.5k
            # small strided row copies and stalls ~60 ns/step.
            def _mask_dma(seg, par):
                return pltpu.make_async_copy(
                    mstage_ref.at[par],
                    masks_ref.at[chunk, pl.ds(seg * K, K)],
                    sem.at[par])

        def seg_body(carry_in):
            seg, _ = carry_in
            if trace:
                par = jax.lax.rem(seg, 2)

                @pl.when(seg >= 2)
                def _():
                    _mask_dma(seg - 2, par).wait()
            nseg_row = sc_ref[R_NSEG:R_NSEG + 1]
            p0 = nseg_row * SL - 1                       # (1, B)
            ihead0 = sc_ref[R_IHEAD:R_IHEAD + 1]
            jhead0 = (p0 + 2) - ihead0 + (W - 1)
            offa = jnp.clip(ihead0, 0, 1 << PA)
            offb = jnp.clip(jhead0, 0, 1 << PB)
            # word-packed windows (all offsets below in WORD units;
            # offa/offb stay in chars): the a-side has consumed
            # (ihead - ihead0) chars since the segment head and the
            # b-side the complementary count, so every window is
            # positioned from the segment-start clipped offset plus
            # that advance — bit-identical chars by construction.
            # Offsets advance <= SL chars per segment, so the segment
            # window (SEGW rows) covers a whole segment and, when tl,
            # J segments stay inside the super window (PSUP bits).
            sgb_a = _div10(offa)
            sgb_b = _div10(offb)
            if tlA or tlB:
                refresh = (seg % J) == 0

                @pl.when(refresh)
                def _():
                    if tlA:
                        supa_ref[...] = _extract_window(
                            wa_ref, sgb_a, SUPW, PSRCA, B, scr0, scr1)
                        basesc[0:1] = sgb_a
                    if tlB:
                        supb_ref[...] = _extract_window(
                            wb_ref, sgb_b, SUPW, PSRCB, B, scr0, scr1)
                        basesc[1:2] = sgb_b
            if tlA:
                segwa_ref[...] = _extract_window(
                    supa_ref, sgb_a - basesc[0:1], SEGW, PSUP, B,
                    scr0, scr1)
            else:
                segwa_ref[...] = _extract_window(
                    wa_ref, sgb_a, SEGW, PSRCA, B, scr0, scr1)
            if tlB:
                segwb_ref[...] = _extract_window(
                    supb_ref, sgb_b - basesc[1:2], SEGW, PSUP, B,
                    scr0, scr1)
            else:
                segwb_ref[...] = _extract_window(
                    wb_ref, sgb_b, SEGW, PSRCB, B, scr0, scr1)

            if trace:
                iheads_ref[pl.ds(seg * K, 1)] = ihead0
                rprevs_ref[pl.ds(seg * K, 1)] = \
                    sc_ref[R_RPREV:R_RPREV + 1]

            carry0 = (S_ref[:], Sp_ref[:], E_ref[:], F_ref[:],
                      P_ref[:],
                      ihead0, sc_ref[R_RPREV:R_RPREV + 1])
            # gmax/cdrop ride FDT inside the loop (the step math's
            # dtype); the sc rows stay int32 and round-trip exactly
            track0 = (sc_ref[R_GMAX:R_GMAX + 1].astype(FDT),
                      sc_ref[R_GI:R_GI + 1],
                      sc_ref[R_GJ:R_GJ + 1],
                      sc_ref[R_CDROP:R_CDROP + 1].astype(FDT),
                      S_ref[c:c + 1], p0)
            term0 = sc_ref[R_TERM:R_TERM + 1]
            nsteps0 = sc_ref[R_NSTEPS:R_NSTEPS + 1]

            def make_block_body(bulk):
              def block_body(blk, bstate):
                carry, track, term, nsteps = bstate
                ihead_b = carry[5]
                pp_b = track[5]
                # live mask is constant within a block (term only
                # changes at block boundaries, gaba.c:1738); int32 so
                # the closure value crossing the fori boundary never
                # carries an i1 vector layout
                live32 = (term == 0).astype(jnp.int32)

                # per-block 32-row char slabs (1 vreg each in the
                # step carry). Offsets replicate the segment-slab
                # roll sequence: a-side advance = ihead - ihead0,
                # b-side advance = steps - a-advance. The slab is
                # built from the word-packed segment window: a 5-row
                # word window at the per-lane word offset, phase-
                # aligned (2 shifts + or), then unpacked via
                # broadcast-row + static per-sublane shifts — constant
                # cost per block regardless of source length.
                adv_a = ihead_b - ihead0
                adv_b = (pp_b - p0) - adv_a
                shv10 = 3 * jax.lax.broadcasted_iota(
                    jnp.int32, (10, 1), 0)

                def mkslab(segw_ref, t):
                    # t = chars consumed past the segment word base;
                    # t <= 9 + (K-1)*BLK < 2**PSEG * 10 by design
                    wq = _div10(t)
                    wph = t - 10 * wq
                    w5 = _extract_window(segw_ref, wq, 5, PSEG, B,
                                         scr0, scr1)
                    aw = (w5[0:4] >> (3 * wph)) \
                        | (w5[1:5] << (30 - 3 * wph))
                    for j in range(4):
                        scrW[10 * j:10 * j + 10] = (pltpu.repeat(
                            aw[j:j + 1], 10, axis=0) >> shv10) & 7
                    # value read materializes before the next mkslab
                    # overwrites scrW (ref effects are program-ordered)
                    return scrW[0:BLK].astype(jnp.int8)

                aslab = mkslab(segwa_ref, offa + adv_a - 10 * sgb_a)
                bslab = mkslab(segwb_ref, offb + adv_b - 10 * sgb_b)

                def step_body(t, state):
                    if trace:
                        carry, track, aslab, bslab, dirbits = state
                    else:
                        carry, track, aslab, bslab = state
                    # chars ride as int32 in the band state (packed,
                    # see _step_t): int8 values threading through the
                    # where/concat carry chain make Mosaic's layout
                    # inference fail (i1 relayout error); the slabs
                    # stay int8 and convert on consumption
                    anext = aslab[0:1].astype(jnp.int32)
                    bnext = bslab[0:1].astype(jnp.int32)
                    pp = track[5]

                    carry, down_i, masks, step_max, step_arg = _step_t(
                        p, W, B, carry, anext, bnext, pp, bulk=bulk,
                        trace=trace)
                    d = down_i == 1

                    # consume: roll the used side down by one row
                    aslab = jnp.where(d, aslab, jnp.concatenate(
                        [aslab[1:], nrow], axis=0))
                    bslab = jnp.where(d, jnp.concatenate(
                        [bslab[1:], nrow], axis=0), bslab)

                    gmax, gi_, gj_, cdrop, s_c, _ = track
                    upd = (step_max > gmax) & (live32 > 0)
                    ihead_new = carry[5]
                    gmax = jnp.where(upd, step_max, gmax)
                    gi_ = jnp.where(upd, ihead_new - step_arg, gi_)
                    gj_ = jnp.where(upd,
                                    (pp + 3) - (ihead_new - step_arg),
                                    gj_)
                    # gaba's saturating center-lane drop accumulator
                    # (gaba.c:1650; see dp/band.py); the previous
                    # center value rides in the carry so only one lane
                    # extract runs per step
                    s_c_new = carry[0][c:c + 1]
                    cdrop = jnp.clip(cdrop - (s_c_new - s_c),
                                     -128, 127)

                    if trace:
                        dirbits = dirbits | (down_i << t)
                        # per-CELL code pack (dp/band.py _pack_codes):
                        # 6 shifted selects + ORs + an aligned-slice
                        # field merge — no 32-way bit reduction (the
                        # former word layout cost ~70 ns/step; this is
                        # ~half) and the device walker gathers ONE
                        # element per probed cell with no repack pass
                        zero = jnp.zeros((W, B), jnp.int32)
                        code = None
                        for mi, m in enumerate(masks):
                            t_ = jnp.where(m, jnp.int32(1 << mi), zero)
                            code = t_ if code is None else (code | t_)
                        g = code[0:16]
                        for fld in range(1, W // 16):
                            g = g | (code[16 * fld:16 * (fld + 1)]
                                     << (8 * fld))
                        mstage_ref[par, blk, t] = g

                    track = (gmax, gi_, gj_, cdrop, s_c_new, pp + 1)
                    if trace:
                        return (carry, track, aslab, bslab, dirbits)
                    return (carry, track, aslab, bslab)

                if trace:
                    st0 = (carry, track, aslab, bslab,
                           jnp.zeros((1, B), jnp.int32))
                else:
                    st0 = (carry, track, aslab, bslab)
                st = jax.lax.fori_loop(0, BLK, step_body, st0)
                carry, track = st[0], st[1]

                if trace:
                    dirs_ref[pl.ds(seg * K + blk, 1)] = st[4]

                # block end: X-drop test (gaba.c:1738) + step count
                xdrop_hit = (track[3]
                             > (p.xdrop - 128)).astype(jnp.int32)
                term = term | xdrop_hit
                nsteps = nsteps + BLK * live32
                return (carry, track, term, nsteps)
              return block_body

            # a segment is "bulk" (boundary handling compiled out, the
            # reference's fill_bulk_block vs fill_cap split) when no
            # lane of any problem can touch i==0/j==0 within it: ihead
            # only grows and j_min = p0+2-ihead0 grows (bit-identical)
            p0s = seg * SL - 1
            can_bulk = (jnp.min(ihead0) >= W) & \
                (jnp.max(ihead0) <= p0s + 1)
            bstate0 = (carry0, track0, term0, nsteps0)
            bstate = jax.lax.cond(
                can_bulk,
                lambda st: jax.lax.fori_loop(0, K,
                                             make_block_body(True), st),
                lambda st: jax.lax.fori_loop(0, K,
                                             make_block_body(False),
                                             st),
                bstate0)
            carry, track, term, nsteps = bstate
            S, Sp, E, F, P, ihead, rprev = carry

            # p-limit termination for the NEXT segment
            pend = (nseg_row + 1) * SL - 1
            term = term | (pend >= sc_ref[R_PLIM:R_PLIM + 1]).astype(
                jnp.int32)

            S_ref[:], Sp_ref[:], E_ref[:], F_ref[:] = S, Sp, E, F
            P_ref[:] = P
            sc_ref[R_IHEAD:R_IHEAD + 1] = ihead
            sc_ref[R_RPREV:R_RPREV + 1] = rprev
            sc_ref[R_TERM:R_TERM + 1] = term
            sc_ref[R_GMAX:R_GMAX + 1] = track[0].astype(jnp.int32)
            sc_ref[R_GI:R_GI + 1] = track[1]
            sc_ref[R_GJ:R_GJ + 1] = track[2]
            sc_ref[R_NSTEPS:R_NSTEPS + 1] = nsteps
            sc_ref[R_CDROP:R_CDROP + 1] = track[3].astype(jnp.int32)
            sc_ref[R_NSEG:R_NSEG + 1] = nseg_row + 1

            if trace:
                _mask_dma(seg, par).start()

            done = jnp.min(term) > 0
            return (seg + 1, done)

        def seg_cond(carry_in):
            seg, done = carry_in
            return (seg < n_seg) & jnp.logical_not(done)

        final_seg, _ = jax.lax.while_loop(seg_cond, seg_body,
                                          (jnp.int32(0),
                                           jnp.bool_(False)))
        if trace:
            # drain the (up to two) in-flight mask DMAs
            for k in (2, 1):
                @pl.when(final_seg >= k)
                def _(k=k):
                    _mask_dma(final_seg - k,
                              jax.lax.rem(final_seg - k, 2)).wait()

    return kernel


def make_fill_pallas(p: ScoreParams, W: int, max_blocks: int, trace: bool,
                     interpret: bool = False, K: int = 4,
                     packed_io: bool = False):
    """Pallas-backed drop-in for band.make_fill: same signature and
    semantics, (B, LA)/(B, LB) int8 inputs. The entire adaptive-banded
    fill runs as ONE kernel launch (see _make_fill_kernel).

    With packed_io=True the char inputs arrive 4-bit packed (two codes
    per byte, (B, L/2) int8) and are unpacked on device: host->device
    argument upload is a dominant dispatch cost on tunneled backends,
    and codes only need 3 bits."""
    p.check()
    K = max(1, min(K, max_blocks))
    n_seg = -(-max_blocks // K)
    max_blocks = n_seg * K
    SL = K * BLK

    def fill(a, alen, b, blen):
        if packed_io:
            # low nibble = even position, high nibble = odd (packed
            # nibbles are 0-4, so the int8 byte stays non-negative and
            # the arithmetic shift is exact)
            a = jnp.stack([a & 15, a >> 4], axis=-1) \
                .reshape(a.shape[0], 2 * a.shape[1])
            b = jnp.stack([b & 15, b >> 4], axis=-1) \
                .reshape(b.shape[0], 2 * b.shape[1])
        B0, LA = a.shape
        LB = b.shape[1]
        # batch chunking: the kernel runs one 128-lane chunk per grid
        # step inside a single launch (sequential on one core, but one
        # dispatch amortizes the per-launch/RPC cost over the batch)
        BC = min(B0, 128)
        nchunk = -(-B0 // BC)
        B = nchunk * BC
        if B != B0:
            a = jnp.pad(a, ((0, B - B0), (0, 0)), constant_values=NCODE)
            b = jnp.pad(b, ((0, B - B0), (0, 0)), constant_values=NCODE)
            alen = jnp.pad(jnp.asarray(alen), (0, B - B0))
            blen = jnp.pad(jnp.asarray(blen), (0, B - B0))
        # sources ship 10-chars-per-int32 word-packed (3-bit fields,
        # NCODE sentinel past the data): every per-lane cascade runs
        # over ~10x fewer rows than the int8 layout. Segment-offset
        # clips stay in CHAR units [0, 2**PA] to keep the round-3
        # boundary semantics bit-identical.
        PA = max((LA + SL - 1).bit_length(), 3)
        PB = max((LB + SL - 1).bit_length(), 3)
        # _div10 is exhaustively exact below 2**19
        assert PA <= 18 and PB <= 18, "source too long for word path"
        # clamp: J=0 would divide by zero in _ctl and break the seg%J
        # refresh; J<0 would break super-window coverage
        J = max(1, int(_os.environ.get("MINIALIGN_FILL_J", "8")))
        PSEG = max(((SL + 9) // 10).bit_length(), 1)
        SEGW = (1 << PSEG) + 5
        PSUP = max(((J * SL + 9) // 10).bit_length(), PSEG)
        SUPW = (1 << PSUP) + SEGW
        PSRCA = max(((1 << PA) // 10 + 1).bit_length(), 1)
        PSRCB = max(((1 << PB) // 10 + 1).bit_length(), 1)

        # two-level iff the J-amortized super refresh beats cascading
        # each segment window against the full source range
        def _cntl(P):
            return sum(SEGW + (1 << k) for k in range(P))

        def _ctl(P):
            return _cntl(PSUP) + \
                sum(SUPW + (1 << k) for k in range(P)) // J
        tlA = _ctl(PSRCA) < _cntl(PSRCA)
        tlB = _ctl(PSRCB) < _cntl(PSRCB)
        LWAp = (1 << PSRCA) + (SUPW if tlA else SEGW)
        LWBp = (1 << PSRCB) + (SUPW if tlB else SEGW)

        def pack_words(x, LWp):
            need = LWp * 10
            x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])),
                        constant_values=NCODE)
            xw = x.reshape(x.shape[0], LWp, 10).astype(jnp.int32)
            w = xw[..., 0]
            for k in range(1, 10):
                w = w | (xw[..., k] << (3 * k))
            return w.T                                 # (LWp, B) int32

        wa = pack_words(a, LWAp)
        wb = pack_words(b, LWBp)
        st0 = band._init_band(p, W, B, a, b)

        S = st0["S"].T.astype(FDT)
        Sp = st0["Sp"].T.astype(FDT)
        E = st0["E"].T.astype(FDT)
        F = st0["F"].T.astype(FDT)
        # band chars packed 2-lanes-per-int32 — see _step_t
        H = W // 2
        pk_full = (st0["achar"].T.astype(jnp.int32) << 3) \
            | st0["bchar"].T.astype(jnp.int32)
        P = pk_full[:H] | (pk_full[H:] << 16)
        sc = jnp.zeros((NROWS, B), jnp.int32)
        sc = sc.at[R_IHEAD].set(st0["ihead"])
        plim = jnp.minimum(alen + blen + 2 * TAIL_N,
                           jnp.int32(max_blocks * BLK - 2))
        sc = sc.at[R_PLIM].set(plim)
        sc = sc.at[R_CDROP].set(jnp.full((B,), -128, jnp.int32))

        NB = max_blocks
        kernel = _make_fill_kernel(p, W, BC, trace, K, n_seg, PA, PB,
                                   PSRCA, PSRCB, tlA=tlA, tlB=tlB,
                                   J=J, PSUP=PSUP, PSEG=PSEG)

        if CMAJ:
            # chunk-major (see module comment): array (nchunk, rows,
            # BC), grid step i owns the contiguous [i] block. The
            # leading None squeezes the dim, so the kernel-side ref
            # shape is (rows, BC) — identical to the lane-sliced
            # layout; the kernel body is unchanged.
            def chunked(shape):
                blk = (None,) + shape[:-1] + (BC,)
                idx = tuple([0] * len(shape))
                return pl.BlockSpec(blk, lambda i, _i=idx: (i,) + _i,
                                    memory_space=pltpu.VMEM)

            def to_cm(x):
                r = x.reshape(x.shape[:-1] + (nchunk, BC))
                return jnp.moveaxis(r, -2, 0)

            def from_cm(x):
                r = jnp.moveaxis(x, 0, -2)
                return r.reshape(r.shape[:-2] + (B,))

            def oshape(blk, dtype):
                # blk is the per-chunk block shape (rows..., BC)
                return jax.ShapeDtypeStruct((nchunk,) + blk, dtype)
        else:
            def chunked(shape):
                blk = shape[:-1] + (BC,)
                idx = tuple([0] * (len(shape) - 1))
                return pl.BlockSpec(blk, lambda i, _i=idx: _i + (i,),
                                    memory_space=pltpu.VMEM)

            def to_cm(x):
                return x

            def from_cm(x):
                return x

            def oshape(blk, dtype):
                return jax.ShapeDtypeStruct(blk[:-1] + (B,), dtype)

        anys = pl.BlockSpec(memory_space=pltpu.ANY)
        state_shapes = [
            oshape((W, BC), FDT),                      # S
            oshape((W, BC), FDT),                      # Sp
            oshape((W, BC), FDT),                      # E
            oshape((W, BC), FDT),                      # F
            oshape((W // 2, BC), jnp.int32),           # P (chars)
            oshape((NROWS, BC), jnp.int32),            # scalar rows
        ]
        state_specs = [chunked((W, B))] * 4 \
            + [chunked((W // 2, B)), chunked((NROWS, B))]
        in_specs = [chunked((LWAp, B)), chunked((LWBp, B))] \
            + state_specs

        # scr0/scr1 must fit the largest cascade intermediate
        def _cmax(win, P):
            return win + (1 << max(P - 1, 0))
        scrlen = max(
            _cmax(5, PSEG),
            _cmax(SEGW, PSUP if tlA else PSRCA),
            _cmax(SEGW, PSUP if tlB else PSRCB),
            _cmax(SUPW, PSRCA) if tlA else 0,
            _cmax(SUPW, PSRCB) if tlB else 0)
        scratch = [
            pltpu.VMEM((scrlen, BC), jnp.int32),
            pltpu.VMEM((scrlen, BC), jnp.int32),
            pltpu.VMEM((40, BC), jnp.int32),     # slab40 unpack
            pltpu.VMEM((SEGW, BC), jnp.int32),   # segment window a
            pltpu.VMEM((SEGW, BC), jnp.int32),   # segment window b
        ]
        if tlA or tlB:
            scratch.append(pltpu.VMEM((8, BC), jnp.int32))   # bases
        if tlA:
            scratch.append(pltpu.VMEM((SUPW, BC), jnp.int32))
        if tlB:
            scratch.append(pltpu.VMEM((SUPW, BC), jnp.int32))
        if trace:
            out_shape = state_shapes + [
                jax.ShapeDtypeStruct((nchunk, NB, BLK, 16, BC),
                                     jnp.int32),
                oshape((NB, BC), jnp.int32),                # dirs
                oshape((NB, BC), jnp.int32),                # iheads
                oshape((NB, BC), jnp.int32),                # rprevs
            ]
            out_specs = state_specs + [anys] + [chunked((NB, B))] * 3
            scratch = scratch + [
                pltpu.VMEM((2, K, BLK, 16, BC), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            out_shape = state_shapes
            out_specs = state_specs

        if PREPONLY:
            # checksum the prepped operands so nothing is DCE'd
            chk = (jnp.sum(wa, axis=0) + jnp.sum(wb, axis=0)
                   + jnp.sum(S.astype(jnp.int32), axis=0)
                   + sc[R_PLIM])[:B0].astype(jnp.int32)
            res = FillResult(max_score=chk, max_i=chk, max_j=chk,
                             n_steps=plim[:B0], n_blocks=jnp.int32(NB))
            if trace:
                z = jnp.zeros((B0, NB), jnp.int32)
                bufs = TraceBuffers(
                    masks=jnp.zeros((B0, NB, BLK, 16), jnp.uint32),
                    dirs=z.view(jnp.uint32), iheads=z, rprevs=z)
                return res, bufs
            return res

        call = pl.pallas_call(
            kernel,
            grid=(nchunk,),
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )
        outs = call(*[to_cm(x) for x in
                      (wa, wb, S, Sp, E, F, P, sc)])
        sc = from_cm(outs[5])[:, :B0]

        res = FillResult(max_score=sc[R_GMAX], max_i=sc[R_GI],
                         max_j=sc[R_GJ], n_steps=sc[R_NSTEPS],
                         n_blocks=jnp.max(sc[R_NSEG]) * K)
        if trace:
            masks = outs[6]
            dirs, iheads, rprevs = (from_cm(o) for o in outs[7:10])
            mk = jnp.transpose(masks, (0, 4, 1, 2, 3)).reshape(
                B, NB, BLK, 16)[:B0]
            bufs = TraceBuffers(
                masks=mk.view(jnp.uint32),
                dirs=dirs[:, :B0].T.view(jnp.uint32),
                iheads=iheads[:, :B0].T, rprevs=rprevs[:, :B0].T)
            return res, bufs
        return res

    def fill_outer(a, alen, b, blen):
        B0 = a.shape[0]
        if not SPLIT or B0 <= 128:
            return fill(a, alen, b, blen)
        BC = 128
        nchunk = -(-B0 // BC)
        B = nchunk * BC
        alen = jnp.asarray(alen)
        blen = jnp.asarray(blen)
        if B != B0:
            a = jnp.pad(a, ((0, B - B0), (0, 0)), constant_values=NCODE)
            b = jnp.pad(b, ((0, B - B0), (0, 0)), constant_values=NCODE)
            alen = jnp.pad(alen, (0, B - B0))
            blen = jnp.pad(blen, (0, B - B0))
        parts = [fill(a[i * BC:(i + 1) * BC], alen[i * BC:(i + 1) * BC],
                      b[i * BC:(i + 1) * BC], blen[i * BC:(i + 1) * BC])
                 for i in range(nchunk)]
        if trace:
            ress = [pr[0] for pr in parts]
            res = FillResult(
                *[jnp.concatenate([getattr(r, f) for r in ress])[:B0]
                  for f in ("max_score", "max_i", "max_j", "n_steps")],
                n_blocks=functools.reduce(
                    jnp.maximum, [r.n_blocks for r in ress]))
            bufs = TraceBuffers(*[
                jnp.concatenate([getattr(pr[1], f) for pr in parts],
                                axis=0)[:B0]
                for f in TraceBuffers._fields])
            return res, bufs
        return FillResult(
            *[jnp.concatenate([getattr(r, f) for r in parts])[:B0]
              for f in ("max_score", "max_i", "max_j", "n_steps")],
            n_blocks=functools.reduce(
                jnp.maximum, [r.n_blocks for r in parts]))

    return jax.jit(fill_outer)
