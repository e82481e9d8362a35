"""Pallas TPU kernel for the banded-DP block fill.

Same semantics as dp/band.py (the XLA reference implementation), with
the hardware-fit layout: the band lives in SUBLANES (W rows), the
problem batch in LANES (B = 128 columns), so each vector op processes
W x B cells. One kernel invocation advances all B bands by one 32-step
block entirely in VMEM:

  HBM: per-block char slabs (gathered by XLA between blocks), mask
       output buffers.
  VMEM: band state (S, Sprev, E, F), band chars, per-problem scalar
       rows, the 32-char lookahead slabs.

The data-dependent per-problem sequence fetch (the part that does not
map to dense TPU ops) is solved by the slab trick: XLA gathers 32
chars per side per problem between blocks, and the kernel picks each
step's char with a one-hot row-select over the slab — O(BLK x B) VPU
work per step, the same order as the band update itself.

The reference equivalent is fill_bulk_block (gaba.c:1821-1860: fetch
32+32 bases, 32 vector steps, store masks + state).
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

# scalar-row indices in the (8, B) int32 state block
R_IHEAD, R_RPREV, R_TERM, R_GMAX, R_GI, R_GJ, R_NSTEPS, R_PAD = range(8)


def _step_t(p: ScoreParams, W: int, B: int, carry, anext, bnext, pp,
            force_dir_parity):
    """One anti-diagonal step on (W, B)-transposed arrays. Mirrors
    band._step; see there for the lane algebra and boundary rules."""
    floor = score_floor(p)
    gi, ge = p.gi, p.ge
    gfa, gfb = p.gfa_eff, p.gfb_eff

    S, Sp, E, F, ach, bch, ihead, rprev = carry

    # down flag kept as int32 0/1 (Mosaic dislikes i1-valued selects)
    edge_ok = (ihead - (W - 1) >= 0) & ((pp + 2) - ihead >= 0)   # (1, B)
    down_i = jnp.where(edge_ok,
                       (S[W - 1:W] > S[0:1]).astype(jnp.int32),
                       (pp + 1) & 1)                              # (1, B)
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

    ach_new = jnp.where(d, ach,
                        jnp.concatenate([anext, ach[:-1]], axis=0))
    bch_new = jnp.where(d, jnp.concatenate([bch[1:], bnext], axis=0),
                        bch)

    # substitution score without a table gather (no pshufb on TPU):
    # uniform matrices (every preset) need 3 selects; -e-modified
    # matrices fall back to a 16-term select chain.
    mat = p.matrix44()
    n_sub = -2 * (gi + ge)
    is_n = (ach_new >= 4) | (bch_new >= 4)
    if len(set(np.diag(mat).tolist())) == 1 and \
            len(set(mat[~np.eye(4, dtype=bool)].tolist())) == 1:
        m_, x_ = int(mat[0, 0]), int(mat[0, 1])
        subsc = jnp.where(ach_new == bch_new, m_, x_)
    else:
        subsc = jnp.zeros_like(S)
        for y in range(4):
            for x in range(4):
                subsc = jnp.where((ach_new == x) & (bch_new == y),
                                  int(mat[y, x]), subsc)
    subsc = jnp.where(is_n, n_sub, subsc)

    S_new = jnp.maximum(
        Sdiag + subsc,
        jnp.maximum(jnp.maximum(E_new, SsrcE - gfb),
                    jnp.maximum(F_new, SsrcF - gfa)))
    S_new = jnp.maximum(S_new, floor)

    masks = (
        S_new == SsrcF - gfa,
        S_new == F_new,
        S_new == SsrcE - gfb,
        S_new == E_new,
        F_new == SsrcF - gi - ge,
        E_new == SsrcE - gi - ge,
    )

    ihead_new = ihead + (1 - down_i)
    p_new = pp + 1
    q = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
    i_lane = ihead_new - q                                        # (W, B)
    j_lane = (p_new + 2) - i_lane

    if p.model == 2:
        gap_a_j = jnp.maximum(-gi * (j_lane > 0) - ge * j_lane,
                              -p.gfa * j_lane)
        gap_b_i = jnp.maximum(-gi * (i_lane > 0) - ge * i_lane,
                              -p.gfb * i_lane)
    else:
        gap_a_j = -gi * (j_lane > 0) - ge * j_lane
        gap_b_i = -gi * (i_lane > 0) - ge * i_lane
    gap_a_j = jnp.maximum(gap_a_j, floor)
    gap_b_i = jnp.maximum(gap_b_i, floor)

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
    step_max = jnp.max(cand, axis=0, keepdims=True)               # (1, B)
    # first-max lane (Mosaic lacks integer argmax): min index where
    # cand equals the max
    step_arg = jnp.min(jnp.where(cand == step_max, q, W),
                       axis=0, keepdims=True).astype(jnp.int32)   # (1, B)

    new_carry = (S_new, S, E_new, F_new, ach_new, bch_new,
                 ihead_new, 1 - down_i)
    return new_carry, down_i, masks, step_max, step_arg


def _make_block_kernel(p: ScoreParams, W: int, B: int, trace: bool,
                       K: int):
    """Kernel processing K consecutive 32-step blocks per launch. The
    char slabs hold K*BLK lookahead rows per side and are consumed by
    per-problem conditional rolls (the next char is always slab row 0
    for each problem), so no dynamic indexing is needed."""
    floor = score_floor(p)
    c = W // 2
    SL = K * BLK            # slab rows

    def kernel(p0_ref,                       # (1, 1) SMEM: block start p
               S_ref, Sp_ref, E_ref, F_ref,  # (W, B) i32 state (aliased)
               ach_ref, bch_ref,             # (W, B) i32 chars (aliased)
               sc_ref,                       # (8, B) i32 scalars (aliased)
               aslabT_ref, bslabT_ref,       # (B, SL) i8 slabs
               So_ref, Spo_ref, Eo_ref, Fo_ref,
               acho_ref, bcho_ref, sco_ref,  # outputs (aliased to inputs)
               masks_ref, dirs_ref):         # (K,BLK,6,2,B), (K,B) i32
        p0 = p0_ref[0, 0]
        term0 = sc_ref[R_TERM:R_TERM + 1]

        # (B, SL) int8 slabs arrive gathered by the outer step (vmapped
        # dynamic_slice); transpose to the (rows, lanes) compute layout
        aslab0 = aslabT_ref[:].astype(jnp.int32).T      # (SL, B)
        bslab0 = bslabT_ref[:].astype(jnp.int32).T

        carry0 = (S_ref[:], Sp_ref[:], E_ref[:], F_ref[:],
                  ach_ref[:], bch_ref[:],
                  sc_ref[R_IHEAD:R_IHEAD + 1], sc_ref[R_RPREV:R_RPREV + 1])
        track0 = (sc_ref[R_GMAX:R_GMAX + 1], sc_ref[R_GI:R_GI + 1],
                  sc_ref[R_GJ:R_GJ + 1], sc_ref[R_NSTEPS:R_NSTEPS + 1])

        nrow = jnp.full((1, B), NCODE, jnp.int32)

        def step_body(t, state):
            carry, track, term, aslab, bslab, dirbits = state
            S, Sp, E, F, ach, bch, ihead, rprev = carry
            pp = p0 + t
            anext = aslab[0:1]
            bnext = bslab[0:1]

            carry, down_i, masks, step_max, step_arg = _step_t(
                p, W, B, carry, anext, bnext, pp, None)
            d = down_i == 1

            # consume: roll the used side down by one row
            aslab = jnp.where(d, aslab,
                              jnp.concatenate([aslab[1:], nrow], axis=0))
            bslab = jnp.where(d,
                              jnp.concatenate([bslab[1:], nrow], axis=0),
                              bslab)

            gmax, gi_, gj_, nsteps = track
            upd = (step_max > gmax) & (term == 0)
            ihead_new = carry[6]
            gmax = jnp.where(upd, step_max, gmax)
            gi_ = jnp.where(upd, ihead_new - step_arg, gi_)
            gj_ = jnp.where(upd, (pp + 3) - (ihead_new - step_arg), gj_)
            nsteps = nsteps + (term == 0).astype(jnp.int32)
            dirbits = dirbits | (down_i << (t % BLK))

            if trace:
                # int32 packing: sums of distinct powers of two wrap to
                # the same bit pattern as the uint32 OR would
                w32 = (jnp.int32(1) << (jax.lax.broadcasted_iota(
                    jnp.int32, (W, B), 0) % 32))
                zero_row = jnp.zeros((1, B), jnp.int32)
                for mi, m in enumerate(masks):
                    mw = m.astype(jnp.int32) * w32
                    lo = jnp.sum(mw[:min(32, W)], axis=0, keepdims=True)
                    hi = jnp.sum(mw[32:], axis=0, keepdims=True) \
                        if W > 32 else zero_row
                    masks_ref[t // BLK, t % BLK, mi] = \
                        jnp.concatenate([lo, hi], axis=0)

            # block boundary: save dir bits, X-drop test (gaba.c:1738)
            at_blk_end = ((t + 1) % BLK) == 0

            @pl.when(at_blk_end)
            def _():
                dirs_ref[t // BLK] = dirbits[0]

            xdrop_hit = ((gmax - carry[0][c:c + 1])
                         > p.xdrop).astype(jnp.int32)
            term_new = jnp.where(at_blk_end, term | xdrop_hit, term)
            dirbits = jnp.where(at_blk_end,
                                jnp.zeros((1, B), jnp.int32), dirbits)

            return (carry, (gmax, gi_, gj_, nsteps), term_new,
                    aslab, bslab, dirbits)

        state = (carry0, track0, term0, aslab0, bslab0,
                 jnp.zeros((1, B), jnp.int32))
        state = jax.lax.fori_loop(0, K * BLK, step_body, state)
        carry, track, term, _, _, _ = state
        S, Sp, E, F, ach, bch, ihead, rprev = carry
        gmax, gi_, gj_, nsteps = track

        So_ref[:] = S
        Spo_ref[:] = Sp
        Eo_ref[:] = E
        Fo_ref[:] = F
        acho_ref[:] = ach
        bcho_ref[:] = bch
        sco_ref[R_IHEAD:R_IHEAD + 1] = ihead
        sco_ref[R_RPREV:R_RPREV + 1] = rprev
        sco_ref[R_TERM:R_TERM + 1] = term
        sco_ref[R_GMAX:R_GMAX + 1] = gmax
        sco_ref[R_GI:R_GI + 1] = gi_
        sco_ref[R_GJ:R_GJ + 1] = gj_
        sco_ref[R_NSTEPS:R_NSTEPS + 1] = nsteps
        sco_ref[R_PAD:R_PAD + 1] = sc_ref[R_PAD:R_PAD + 1]

    return kernel


def make_fill_pallas(p: ScoreParams, W: int, max_blocks: int, trace: bool,
                     interpret: bool = False, K: int = 8):
    """Pallas-backed drop-in for band.make_fill: same signature and
    semantics, (B, LA)/(B, LB) int8 inputs. K = 32-step blocks per
    kernel launch (slab gathers and launches amortize over K)."""
    p.check()
    K = max(1, min(K, max_blocks))
    n_launch = -(-max_blocks // K)
    max_blocks = n_launch * K
    SL = K * BLK

    def fill(a, alen, b, blen):
        B, LA = a.shape
        LB = b.shape[1]
        # pad with N so clamped slab windows always read sentinel bases
        a_pad = jnp.pad(a, ((0, 0), (0, 2 * SL)), constant_values=NCODE)
        b_pad = jnp.pad(b, ((0, 0), (0, 2 * SL)), constant_values=NCODE)
        LAp, LBp = LA + 2 * SL, LB + 2 * SL
        st0 = band._init_band(p, W, B, a, b)

        S = st0["S"].T
        Sp = st0["Sp"].T
        E = st0["E"].T
        F = st0["F"].T
        ach = st0["achar"].T.astype(jnp.int32)
        bch = st0["bchar"].T.astype(jnp.int32)
        sc = jnp.zeros((8, B), jnp.int32)
        sc = sc.at[R_IHEAD].set(st0["ihead"])
        plim = jnp.minimum(alen + blen + 2 * TAIL_N,
                           jnp.int32(max_blocks * BLK - 2))

        kernel = _make_block_kernel(p, W, B, trace, K)
        out_shape = [
            jax.ShapeDtypeStruct((W, B), jnp.int32),   # S
            jax.ShapeDtypeStruct((W, B), jnp.int32),   # Sp
            jax.ShapeDtypeStruct((W, B), jnp.int32),   # E
            jax.ShapeDtypeStruct((W, B), jnp.int32),   # F
            jax.ShapeDtypeStruct((W, B), jnp.int32),   # ach
            jax.ShapeDtypeStruct((W, B), jnp.int32),   # bch
            jax.ShapeDtypeStruct((8, B), jnp.int32),   # scalars
            jax.ShapeDtypeStruct((K, BLK, 6, 2, B), jnp.int32),  # masks
            jax.ShapeDtypeStruct((K, B), jnp.int32),   # dirs
        ]
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem11 = pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)
        call = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[smem11] + [vmem] * 9,
            out_specs=[vmem] * 9,
            input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5,
                                  7: 6},
            interpret=interpret,
        )

        if trace:
            bufs = TraceBuffers(
                masks=jnp.zeros((max_blocks, BLK, 6, 2, B), jnp.int32),
                dirs=jnp.zeros((max_blocks, B), jnp.int32),
                iheads=jnp.zeros((max_blocks, B), jnp.int32),
                rprevs=jnp.zeros((max_blocks, B), jnp.int32),
            )
        else:
            bufs = ()

        def launch_body(state):
            (S, Sp, E, F, ach, bch, sc, bufs, lch) = state
            ihead0 = sc[R_IHEAD]
            p0 = lch * SL - 1                     # p of current band
            jhead0 = (p0 + 2) - ihead0 + (W - 1)
            offa = jnp.clip(ihead0, 0, LAp - SL)
            offb = jnp.clip(jhead0, 0, LBp - SL)
            aslab = jax.vmap(
                lambda row, o: jax.lax.dynamic_slice(row, (o,), (SL,))
            )(a_pad, offa)
            bslab = jax.vmap(
                lambda row, o: jax.lax.dynamic_slice(row, (o,), (SL,))
            )(b_pad, offb)

            if trace:
                bufs_ = bufs._replace(
                    iheads=bufs.iheads.at[lch * K].set(sc[R_IHEAD]),
                    rprevs=bufs.rprevs.at[lch * K].set(sc[R_RPREV]))
            else:
                bufs_ = bufs

            p0s = jnp.full((1, 1), p0, jnp.int32)
            outs = call(p0s, S, Sp, E, F, ach, bch, sc, aslab, bslab)
            S, Sp, E, F, ach, bch, sc, masks, dirs = outs

            if trace:
                bufs_ = bufs_._replace(
                    masks=jax.lax.dynamic_update_slice(
                        bufs_.masks, masks, (lch * K, 0, 0, 0, 0)),
                    dirs=jax.lax.dynamic_update_slice(
                        bufs_.dirs, dirs, (lch * K, 0)))

            # p-limit termination
            sc = sc.at[R_TERM].set(
                sc[R_TERM] | (jnp.int32(lch * SL + SL - 1)
                              >= plim).astype(jnp.int32))
            return (S, Sp, E, F, ach, bch, sc, bufs_, lch + 1)

        def launch_cond(state):
            sc = state[6]
            lch = state[8]
            return (~jnp.all(sc[R_TERM] > 0)) & (lch < n_launch)

        state = (S, Sp, E, F, ach, bch, sc, bufs, jnp.int32(0))
        state = jax.lax.while_loop(launch_cond, launch_body, state)
        sc = state[6]
        bufs = state[7]
        nblk = state[8] * K

        res = FillResult(max_score=sc[R_GMAX], max_i=sc[R_GI],
                         max_j=sc[R_GJ], n_steps=sc[R_NSTEPS],
                         n_blocks=nblk)
        if trace:
            bufs = TraceBuffers(
                masks=jnp.moveaxis(bufs.masks, 4, 0).view(jnp.uint32),
                dirs=bufs.dirs.T.view(jnp.uint32), iheads=bufs.iheads.T,
                rprevs=bufs.rprevs.T)
            return res, bufs
        return res

    return jax.jit(fill)
