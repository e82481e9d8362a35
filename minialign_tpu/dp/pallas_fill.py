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
    sub55 = jnp.asarray(p.matrix55(), jnp.int32)

    S, Sp, E, F, ach, bch, ihead, rprev = carry

    edge_ok = (ihead - (W - 1) >= 0) & ((pp + 2) - ihead >= 0)   # (1, B)
    down = jnp.where(edge_ok, S[W - 1:W] > S[0:1],
                     ((pp + 1) & 1) == 1)                         # (1, B)
    d = down                                                      # (1, B)

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

    sh = down.astype(jnp.int32) - rprev                           # (1, B)
    Sdiag = jnp.where(sh == 1, roll_q(Sp, 1, floor),
                      jnp.where(sh == -1, roll_q(Sp, -1, floor), Sp))

    ach_new = jnp.where(d, ach,
                        jnp.concatenate([anext, ach[:-1]], axis=0))
    bch_new = jnp.where(d, jnp.concatenate([bch[1:], bnext], axis=0),
                        bch)

    subsc = sub55[bch_new, ach_new]

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

    ihead_new = ihead + (~down).astype(jnp.int32)
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
    step_arg = jnp.argmax(cand, axis=0).astype(jnp.int32)[None]   # (1, B)

    new_carry = (S_new, S, E_new, F_new, ach_new, bch_new,
                 ihead_new, (~down).astype(jnp.int32))
    return new_carry, down, masks, step_max, step_arg


def _make_block_kernel(p: ScoreParams, W: int, B: int, trace: bool):
    floor = score_floor(p)
    c = W // 2

    def kernel(p0_ref,                       # (1, 1) SMEM: block start p
               S_ref, Sp_ref, E_ref, F_ref,  # (W, B) i32 state (aliased)
               ach_ref, bch_ref,             # (W, B) i32 chars (aliased)
               sc_ref,                       # (8, B) i32 scalars (aliased)
               aslab_ref, bslab_ref,         # (BLK, B) i32 lookahead
               So_ref, Spo_ref, Eo_ref, Fo_ref,
               acho_ref, bcho_ref, sco_ref,  # outputs (aliased to inputs)
               masks_ref, dirs_ref):         # (BLK,6,2,B) u32, (1,B) u32
        p0 = p0_ref[0, 0]
        ihead0 = sc_ref[R_IHEAD:R_IHEAD + 1]                     # (1, B)
        jhead0 = (p0 + 2) - ihead0 + (W - 1)  # j index base at block
        term = sc_ref[R_TERM:R_TERM + 1]
        riota = jax.lax.broadcasted_iota(jnp.int32, (BLK, B), 0)

        carry0 = (S_ref[:], Sp_ref[:], E_ref[:], F_ref[:],
                  ach_ref[:], bch_ref[:],
                  sc_ref[R_IHEAD:R_IHEAD + 1], sc_ref[R_RPREV:R_RPREV + 1])
        track0 = (sc_ref[R_GMAX:R_GMAX + 1], sc_ref[R_GI:R_GI + 1],
                  sc_ref[R_GJ:R_GJ + 1], sc_ref[R_NSTEPS:R_NSTEPS + 1],
                  jnp.zeros((1, B), jnp.uint32))

        aslab = aslab_ref[:]
        bslab = bslab_ref[:]

        def body(t, state):
            carry, track = state
            S, Sp, E, F, ach, bch, ihead, rprev = carry
            pp = p0 + t
            # one-hot slab select for the next chars
            arel = ihead - ihead0                                # (1, B)
            anext = jnp.sum(jnp.where(riota == arel, aslab, 0),
                            axis=0, keepdims=True)
            jpos = (pp + 2) - ihead + (W - 1)
            brel = jpos - jhead0
            bnext = jnp.sum(jnp.where(riota == brel, bslab, 0),
                            axis=0, keepdims=True)

            carry, down, masks, step_max, step_arg = _step_t(
                p, W, B, carry, anext, bnext, pp, None)

            gmax, gi_, gj_, nsteps, dirbits = track
            upd = (step_max > gmax) & (term == 0)
            ihead_new = carry[6]
            gmax = jnp.where(upd, step_max, gmax)
            gi_ = jnp.where(upd, ihead_new - step_arg, gi_)
            gj_ = jnp.where(upd, (pp + 3) - (ihead_new - step_arg), gj_)
            nsteps = nsteps + (term == 0).astype(jnp.int32)
            dirbits = dirbits | (down.astype(jnp.uint32)
                                 << t.astype(jnp.uint32))

            if trace:
                w32 = (jnp.uint32(1) << (jax.lax.broadcasted_iota(
                    jnp.uint32, (W, B), 0) % 32))
                for mi, m in enumerate(masks):
                    packed = jnp.sum(
                        (m.astype(jnp.uint32) * w32).reshape(
                            W // 32 if W >= 32 else 1, 32
                            if W >= 32 else W, B),
                        axis=1)                                   # (w, B)
                    if W < 64:
                        packed = jnp.concatenate(
                            [packed, jnp.zeros((2 - packed.shape[0], B),
                                               jnp.uint32)], axis=0)
                    masks_ref[t, mi] = packed

            return (carry, (gmax, gi_, gj_, nsteps, dirbits))

        carry, track = jax.lax.fori_loop(0, BLK, body, (carry0, track0))
        S, Sp, E, F, ach, bch, ihead, rprev = carry
        gmax, gi_, gj_, nsteps, dirbits = track

        So_ref[:] = S
        Spo_ref[:] = Sp
        Eo_ref[:] = E
        Fo_ref[:] = F
        acho_ref[:] = ach
        bcho_ref[:] = bch
        sco_ref[R_IHEAD:R_IHEAD + 1] = ihead
        sco_ref[R_RPREV:R_RPREV + 1] = rprev
        # X-drop test at block end (gaba.c:1738)
        xdrop_hit = (gmax - S[c:c + 1]) > p.xdrop
        sco_ref[R_TERM:R_TERM + 1] = (term | xdrop_hit.astype(jnp.int32))
        sco_ref[R_GMAX:R_GMAX + 1] = gmax
        sco_ref[R_GI:R_GI + 1] = gi_
        sco_ref[R_GJ:R_GJ + 1] = gj_
        sco_ref[R_NSTEPS:R_NSTEPS + 1] = nsteps
        sco_ref[R_PAD:R_PAD + 1] = sc_ref[R_PAD:R_PAD + 1]
        dirs_ref[:] = dirbits

    return kernel


def make_fill_pallas(p: ScoreParams, W: int, max_blocks: int, trace: bool,
                     interpret: bool = False):
    """Pallas-backed drop-in for band.make_fill: same signature and
    semantics, (B, LA)/(B, LB) int8 inputs."""
    p.check()
    floor = score_floor(p)
    c = W // 2

    def fill(a, alen, b, blen):
        B, LA = a.shape
        LB = b.shape[1]
        a32 = a.astype(jnp.int32)
        b32 = b.astype(jnp.int32)
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

        kernel = _make_block_kernel(p, W, B, trace)
        n_state = 7
        out_shape = [
            jax.ShapeDtypeStruct((W, B), jnp.int32),   # S
            jax.ShapeDtypeStruct((W, B), jnp.int32),   # Sp
            jax.ShapeDtypeStruct((W, B), jnp.int32),   # E
            jax.ShapeDtypeStruct((W, B), jnp.int32),   # F
            jax.ShapeDtypeStruct((W, B), jnp.int32),   # ach
            jax.ShapeDtypeStruct((W, B), jnp.int32),   # bch
            jax.ShapeDtypeStruct((8, B), jnp.int32),   # scalars
            jax.ShapeDtypeStruct((BLK, 6, 2, B), jnp.uint32),  # masks
            jax.ShapeDtypeStruct((1, B), jnp.uint32),  # dirs
        ]
        vmem = pl.BlockSpec(memory_space=pltpu.ANY) if False else \
            pl.BlockSpec(memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)]
            + [vmem] * (n_state + 2),
            out_specs=[vmem] * 9,
            input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5,
                                  7: 6},
            interpret=interpret,
        )

        if trace:
            bufs = TraceBuffers(
                masks=jnp.zeros((max_blocks, BLK, 6, 2, B), jnp.uint32),
                dirs=jnp.zeros((max_blocks, B), jnp.uint32),
                iheads=jnp.zeros((max_blocks, B), jnp.int32),
                rprevs=jnp.zeros((max_blocks, B), jnp.int32),
            )
        else:
            bufs = ()

        def block_body(state):
            (S, Sp, E, F, ach, bch, sc, bufs, blk) = state
            ihead0 = sc[R_IHEAD]
            p0 = blk * BLK - 1                    # p of current band
            jhead0 = (p0 + 2) - ihead0 + (W - 1)
            ar = ihead0[:, None] + jnp.arange(BLK)[None, :]
            aslab = jnp.where(ar < LA, jnp.take_along_axis(
                a32, jnp.clip(ar, 0, LA - 1), axis=1), NCODE).T
            br = jhead0[:, None] + jnp.arange(BLK)[None, :]
            bslab = jnp.where((br >= 0) & (br < LB), jnp.take_along_axis(
                b32, jnp.clip(br, 0, LB - 1), axis=1), NCODE).T

            if trace:
                bufs_ = bufs._replace(
                    iheads=bufs.iheads.at[blk].set(sc[R_IHEAD]),
                    rprevs=bufs.rprevs.at[blk].set(sc[R_RPREV]))
            else:
                bufs_ = bufs

            p0s = jnp.full((1, 1), p0, jnp.int32)
            outs = call(p0s, S, Sp, E, F, ach, bch, sc, aslab, bslab)
            S, Sp, E, F, ach, bch, sc, masks, dirs = outs

            if trace:
                bufs_ = bufs_._replace(
                    masks=jax.lax.dynamic_update_slice(
                        bufs_.masks, masks[None], (blk, 0, 0, 0, 0)),
                    dirs=bufs_.dirs.at[blk].set(dirs[0]))

            # p-limit termination
            sc = sc.at[R_TERM].set(
                sc[R_TERM] | (jnp.int32(blk * BLK + BLK - 1)
                              >= plim).astype(jnp.int32))
            return (S, Sp, E, F, ach, bch, sc, bufs_, blk + 1)

        def block_cond(state):
            sc = state[6]
            blk = state[8]
            return (~jnp.all(sc[R_TERM] > 0)) & (blk < max_blocks)

        state = (S, Sp, E, F, ach, bch, sc, bufs, jnp.int32(0))
        state = jax.lax.while_loop(block_cond, block_body, state)
        sc = state[6]
        bufs = state[7]
        nblk = state[8]

        res = FillResult(max_score=sc[R_GMAX], max_i=sc[R_GI],
                         max_j=sc[R_GJ], n_steps=sc[R_NSTEPS],
                         n_blocks=nblk)
        if trace:
            bufs = TraceBuffers(
                masks=jnp.moveaxis(bufs.masks, 4, 0),
                dirs=bufs.dirs.T, iheads=bufs.iheads.T,
                rprevs=bufs.rprevs.T)
            return res, bufs
        return res

    return jax.jit(fill)
