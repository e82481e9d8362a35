"""Device-side traceback: the per-alignment mask walk as a batched XLA
state machine, so the (large) mask buffers never leave the device —
only the op codes and counters transfer to the host (~50x less than
shipping masks; the device->host link dominates E2E mapping time on
tunneled backends).

Semantics are EXACTLY dp/traceback.traceback_one's walk — gaba's
trace_core state machine (gaba.c:3123-3207): horizontal (R) gaps are
tested in the d_head state, vertical (D) gaps only in the d_tail state
(after a diagonal or a v-gap); a gap head takes the one-base gf branch
when the folded bit (gh & ~gfh) | open_next is clear, else an affine
run continuing while NOT (h == 0 and e == 1) at each arrived cell.
Re-expressed as one op per loop iteration with a phase register for
the affine runs and a head/tail state bit:

  phase 0: normal dispatch (head: h-gap or diagonal; tail: v-gap,
           else h-gap, else diagonal)
  phase 1: inside an F (query gap, 'D') run
  phase 2: inside an E (ref gap, 'R') run
  phase 3: boundary drain on i==0 (emit D until j==0)
  phase 4: boundary drain on j==0 (emit R until i==0)

Each live problem emits exactly one op code per iteration (0 pad,
1 'D', 2 'R', 3 diagonal = "DR"), written to a static row of the ops
buffer — no scatters. Equality with the host walker is enforced by
tests/test_dtrace.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import ScoreParams
from .band import BLK, M_E, M_EO, M_F, M_FO, M_GFA, M_GFB

OP_PAD, OP_D, OP_R, OP_X = 0, 1, 2, 3


def make_device_traceback(p: ScoreParams, W: int):
    """Returns jit fn(masks, dirs, iheads0, score, ai, bj) ->
    (ops (T, B) int8 backward-op codes, n_ops (B,), counts dict,
    status (B,) 0 ok / 1 out-of-band). masks: (B, NB, BLK, 6, 2)
    uint32, dirs: (B, NB) uint32, as produced by the fill (already
    moveaxis'd); T = NB*BLK + 2."""
    gi, ge = p.gi, p.ge
    gfa_eff, gfb_eff = p.gfa_eff, p.gfb_eff
    model = p.model

    @jax.jit
    def run(masks, dirs, iheads0, score, ai, bj):
        B, NB = dirs.shape
        T = NB * BLK + 2
        mflat = masks.reshape(B, -1).view(jnp.uint32)   # (B, NB*BLK*12)

        def dir_at(pp):
            """direction bit of band step pp (>=0); p=-1 counts as
            down (dp/traceback.py dir_at)."""
            word = jnp.take_along_axis(
                dirs, jnp.clip(pp, 0, None)[:, None] // BLK,
                axis=1)[:, 0]
            bit = (word >> (jnp.clip(pp, 0, None) % BLK).astype(
                jnp.uint32)) & 1
            return jnp.where(pp >= 0, bit.astype(jnp.int32), 0)

        def mwords(pp):
            """the 12 mask words of band step pp: (B, 12) uint32."""
            base = (jnp.clip(pp, 0, None) * 12)[:, None] + \
                jnp.arange(12, dtype=jnp.int32)[None, :]
            return jnp.take_along_axis(mflat, base, axis=1)

        def mbit(mw, mi, q):
            qc = jnp.clip(q, 0, W - 1)
            w = mw[:, 2 * mi] * (qc < 32) + mw[:, 2 * mi + 1] * (qc >= 32)
            return ((w >> (qc % 32).astype(jnp.uint32)) & 1).astype(
                jnp.int32)

        # ---- init (mirrors traceback_one's prologue)
        i0 = ai.astype(jnp.int32)
        j0 = bj.astype(jnp.int32)
        empty = (score <= 0) | ((i0 == 0) & (j0 == 0))
        pp0 = i0 + j0 - 2
        # ihead at band p = pp0: iheads0 + number of rights in steps
        # [0, pp0]; count via cumulative popcount over dir words
        full = jnp.cumsum(
            BLK - jax.lax.population_count(dirs).astype(jnp.int32),
            axis=1)                                       # (B, NB)
        blk0 = jnp.clip(pp0, 0, None) // BLK
        infull = jnp.where(blk0 > 0,
                           jnp.take_along_axis(
                               full, jnp.clip(blk0 - 1, 0, None)[:, None],
                               axis=1)[:, 0], 0)
        lastw = jnp.take_along_axis(dirs, blk0[:, None], axis=1)[:, 0]
        rem = jnp.clip(pp0, 0, None) % BLK + 1
        lastmask = jnp.where(rem >= BLK, jnp.uint32(0xFFFFFFFF),
                             (jnp.uint32(1) << rem.astype(jnp.uint32))
                             - 1)
        inlast = rem - jax.lax.population_count(
            lastw & lastmask).astype(jnp.int32)
        ihead_pp0 = iheads0.astype(jnp.int32) + \
            jnp.where(pp0 >= 0, infull + inlast, 0)
        q0 = ihead_pp0 - i0
        bad0 = (~empty) & ((q0 < 0) | (q0 >= W))

        ops0 = jnp.zeros((T, B), jnp.int8)
        counts0 = {k: jnp.zeros(B, jnp.int32) for k in
                   ("dcnt", "agcnt", "bgcnt", "n_open", "n_ext",
                    "gf_pen", "e_pen")}

        state0 = dict(i=i0, j=j0, pp=pp0, q=q0,
                      phase=jnp.zeros(B, jnp.int32),
                      head=jnp.ones(B, bool),   # gaba starts at d_head
                      done=empty | bad0, bad=bad0,
                      t=jnp.int32(0), ops=ops0, **counts0)

        def cond(st):
            return (~jnp.all(st["done"])) & (st["t"] < T)

        def body(st):
            i, j, pp, q = st["i"], st["j"], st["pp"], st["q"]
            phase = st["phase"]
            head = st["head"]
            done = st["done"]
            bad = st["bad"]
            live = ~done

            mw = mwords(pp)
            d_pp = dir_at(pp)
            d_pp1 = dir_at(pp - 1)

            at_i0 = live & (i == 0)
            at_j0 = live & (j == 0) & ~at_i0
            inband = (q >= 0) & (q < W)
            # out-of-band abort only applies in the normal/run phases
            oob = live & ~at_i0 & ~at_j0 & (phase <= 2) & ~inband

            norm = live & ~at_i0 & ~at_j0 & ~oob & (phase == 0)
            in_f = live & ~at_i0 & ~at_j0 & ~oob & (phase == 1)
            in_e = live & ~at_i0 & ~at_j0 & ~oob & (phase == 2)

            # gaba mask algebra at the current cell
            m_e = mbit(mw, M_E, q)
            m_gfb = mbit(mw, M_GFB, q)
            m_f = mbit(mw, M_F, q)
            m_gfa = mbit(mw, M_GFA, q)
            hb = (m_e | m_gfb) == 1
            vb = (m_f | m_gfa) == 1
            eb = ((m_e & (1 - m_gfb)) | mbit(mw, M_EO, q)) == 1
            fb = ((m_f & (1 - m_gfa)) | mbit(mw, M_FO, q)) == 1

            # dispatch: head tests the h side only; tail tests v first,
            # then falls through to the head dispatch at the same cell
            h_disp = norm & (head | (~head & ~vb))
            v_disp = norm & ~head & vb
            b_hgf = h_disp & hb & ~eb
            b_e = h_disp & hb & eb
            b_dg = h_disp & ~hb
            b_vgf = v_disp & ~fb
            b_f = v_disp & fb

            # boundary entry: price the whole remaining run up front
            # (traceback_one's i==0 / j==0 blocks)
            ent_i0 = at_i0 & (phase != 3)
            ent_j0 = at_j0 & (phase != 4)
            if model == 2:
                gfa_win = p.gfa * j < gi + j * ge
                gfb_win = p.gfb * i < gi + i * ge
            else:
                gfa_win = jnp.zeros_like(done)
                gfb_win = jnp.zeros_like(done)

            # ---- op selection
            emit_d = at_i0 | b_vgf | b_f | in_f
            emit_r = at_j0 | b_hgf | b_e | in_e
            emit_x = b_dg
            op = jnp.where(emit_d, OP_D,
                           jnp.where(emit_r, OP_R,
                                     jnp.where(emit_x, OP_X, OP_PAD)))
            op = jnp.where(live, op, OP_PAD).astype(jnp.int8)
            ops = jax.lax.dynamic_update_index_in_dim(
                st["ops"], op, st["t"], axis=0)

            # ---- counters
            c = {k: st[k] for k in ("dcnt", "agcnt", "bgcnt", "n_open",
                                    "n_ext", "gf_pen", "e_pen")}
            c["dcnt"] += b_dg
            c["bgcnt"] += jnp.where(ent_i0, j,
                                    (b_vgf | b_f | in_f).astype(
                                        jnp.int32))
            c["agcnt"] += jnp.where(ent_j0, i,
                                    (b_hgf | b_e | in_e).astype(
                                        jnp.int32))
            c["n_open"] += (b_f | b_e
                            | (ent_i0 & ~gfa_win)
                            | (ent_j0 & ~gfb_win)).astype(jnp.int32)
            c["n_ext"] += (b_f | in_f | b_e | in_e).astype(jnp.int32) \
                + jnp.where(ent_i0 & ~gfa_win, j, 0) \
                + jnp.where(ent_j0 & ~gfb_win, i, 0)
            c["gf_pen"] += jnp.where(b_vgf, gfa_eff, 0) \
                + jnp.where(b_hgf, gfb_eff, 0) \
                + jnp.where(ent_i0 & gfa_win, p.gfa * j, 0) \
                + jnp.where(ent_j0 & gfb_win, p.gfb * i, 0)
            c["e_pen"] += jnp.where(b_hgf, gfb_eff, 0) \
                + jnp.where(b_e, gi, 0) \
                + jnp.where(b_e | in_e, ge, 0) \
                + jnp.where(ent_j0 & gfb_win, p.gfb * i, 0) \
                + jnp.where(ent_j0 & ~gfb_win, gi + i * ge, 0)

            # ---- moves (gap runs move within the band; boundary
            # drains just count down)
            mv_f = b_vgf | b_f | in_f
            mv_e = b_hgf | b_e | in_e
            q_n = jnp.where(mv_f, q - (1 - d_pp),
                            jnp.where(mv_e, q + d_pp,
                                      jnp.where(b_dg,
                                                q + d_pp - (1 - d_pp1),
                                                q)))
            pp_n = pp - (mv_f | mv_e).astype(jnp.int32) \
                - 2 * b_dg.astype(jnp.int32)
            i_n = i - (mv_e | b_dg | at_j0).astype(jnp.int32)
            j_n = j - (mv_f | b_dg | at_i0).astype(jnp.int32)

            # ---- run continuation: stop iff the ARRIVED cell has
            # (h == 0 and e == 1) (gaba's _trace_test_gap), else keep
            # popping
            mw1 = mwords(pp_n)
            m_e1 = mbit(mw1, M_E, q_n)
            m_gfb1 = mbit(mw1, M_GFB, q_n)
            m_f1 = mbit(mw1, M_F, q_n)
            m_gfa1 = mbit(mw1, M_GFA, q_n)
            hb1 = (m_e1 | m_gfb1) == 1
            vb1 = (m_f1 | m_gfa1) == 1
            eb1 = ((m_e1 & (1 - m_gfb1)) | mbit(mw1, M_EO, q_n)) == 1
            fb1 = ((m_f1 & (1 - m_gfa1)) | mbit(mw1, M_FO, q_n)) == 1
            e_stop = ~hb1 & eb1
            f_stop = ~vb1 & fb1
            e_cont = (b_e | in_e) & ~e_stop & (i_n > 0)
            f_cont = (b_f | in_f) & ~f_stop & (j_n > 0)

            phase_n = jnp.where(f_cont, 1,
                                jnp.where(e_cont, 2,
                                          jnp.where(at_i0, 3,
                                                    jnp.where(at_j0, 4,
                                                              0))))
            phase_n = jnp.where(live, phase_n, phase)
            # h-gaps return to d_head; diagonals and v-gaps to d_tail
            head_n = jnp.where(live & (b_hgf | b_e | in_e), True,
                               jnp.where(live & (b_dg | b_vgf | b_f
                                                 | in_f), False, head))

            # run continuation out-of-band abort (checked on entry to
            # the next iteration via oob; the -1 <= q <= W post-check)
            post_bad = live & ~at_i0 & ~at_j0 & ~oob & \
                ((q_n < -1) | (q_n > W))
            bad_n = bad | oob | post_bad
            done_n = done | oob | post_bad | \
                (live & (i_n == 0) & (j_n == 0))

            i = jnp.where(live, i_n, i)
            j = jnp.where(live, j_n, j)
            pp = jnp.where(live, pp_n, pp)
            q = jnp.where(live, q_n, q)

            return dict(i=i, j=j, pp=pp, q=q, phase=phase_n,
                        head=head_n, done=done_n, bad=bad_n,
                        t=st["t"] + 1, ops=ops, **c)

        st = jax.lax.while_loop(cond, body, state0)
        counts = {k: st[k] for k in ("dcnt", "agcnt", "bgcnt", "n_open",
                                     "n_ext", "gf_pen", "e_pen")}
        n_ops = jnp.sum(st["ops"] != OP_PAD, axis=0).astype(jnp.int32)
        return st["ops"], n_ops, counts, st["bad"].astype(jnp.int32)

    return run
