"""Pallas DMA gather: build per-problem band-input rows from the
device-resident flat sequence store without any per-dispatch sequence
upload and without XLA's per-element gather cost.

The reference keeps the genome mapped read-only and fetches extension
windows by pointer (fill_fetch_seq_*, gaba.c:958-1264). The TPU
equivalent: the 2-bit code stream lives in HBM as a (rows, 128) int8
array; one kernel instance per problem

  1. DMAs the 8-row (1024-byte) aligned window covering [off, off+L)
     into VMEM — Mosaic requires dynamic leading-dim DMA offsets to be
     provably 8-row aligned (pl.multiple_of), hence the coarse grain;
  2. removes the residual off % 1024 with 3 row-shift selects
     (residual // 128) and a 7-level binary lane-roll with one-row
     carry (residual % 128) — pltpu.roll only rotates 32-bit data, so
     the staged bytes widen to int32 once after the DMA;
  3. masks everything past the problem's effective length to NCODE
     and writes the (L/128, 128) row block (narrowed back to int8 by
     the caller in XLA).

XLA's take() measured ~8 ns/element on v5e (PERF_NOTES.md) = ~100 ms
for a 128 x 96 kb batch; this kernel is DMA-bound plus a few hundred
vector ops per problem. The circular-wrap case (rare: circular
references only) stays on the XLA fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .band import NCODE

# largest row window a single instance may stage in VMEM (131072 bytes
# + alignment rows); longer requests fall back to the XLA gather
LMAX = 1 << 17
# extra NCODE rows appended to the store so the aligned window DMA of
# any off <= N never reads past the buffer
PAD_ROWS = LMAX // 128 + 16


# grow-only host staging buffers per pool key: np.full over tens of
# MB costs ~0.6 s on lazily-backed VMs (first-touch page faults,
# PERF_NOTES.md) — reuse pages and fill only the NCODE pad tail
_STORE_POOL: dict = {}


def pad_store(flat, pool: str | None = None):
    """Host-side: 1D int8 code stream -> (rows, 128) padded store.

    The row count is quantized UP to a coarse grid (1 MB = 8192 rows):
    every jit consuming the store (the gather fns, duo dispatch)
    specializes on the store SHAPE, so an exact-length store gives
    every new read batch a novel shape and forces a full recompile
    per batch — measured round 5 as THE at-scale E2E cliff (fresh
    reads mapped at ~10 reads/s while the same batch re-mapped warm
    at ~92; a 464 Mb run spent ~40 min in per-batch recompiles).
    Quantized, all production batches collapse onto a handful of
    shapes. The pad tail is NCODE; gathers never index past the data
    (make_gather's off+L+1024 bound), so output bytes are unchanged."""
    import numpy as np
    n = len(flat)
    rows = -(-n // 128) + PAD_ROWS
    rows = -(-rows // 8192) * 8192
    if pool is not None:
        buf = _STORE_POOL.get(pool)
        if buf is None or buf.shape[0] < rows:
            buf = _STORE_POOL[pool] = np.empty((rows, 128), np.int8)
        out = buf[:rows]
    else:
        out = np.empty((rows, 128), np.int8)
    f = out.reshape(-1)
    f[:n] = flat
    f[n:] = NCODE
    return out


@functools.lru_cache(maxsize=None)
def make_gather(L: int, B: int, packed: bool = False):
    """Returns jit fn(store2d, off, ln) -> (B, L) int8 with row b =
    store[off_b : off_b + ln_b] then NCODE. off in elements, any
    alignment; ln <= L; off + L + 1024 must stay inside the padded
    store (pad_store guarantees it for off <= N). With packed=True the
    result is 4-bit packed to (B, L/2) inside the same jit — eager
    strided slicing on device arrays costs ~5 ms per dispatch in
    op-by-op overhead (round-3 profile)."""
    assert L % 1024 == 0 and L <= LMAX
    R = L // 128
    R1 = R + 8

    def kernel(r0_ref, rr_ref, ln_ref, flat_ref, o_ref, stage, sem):
        b = pl.program_id(0)
        cp = pltpu.make_async_copy(
            flat_ref.at[pl.ds(pl.multiple_of(r0_ref[b], 8), R1)],
            stage, sem)
        cp.start()
        cp.wait()
        # pltpu.roll rejects non-32-bit data: widen once after the DMA
        # (the caller narrows back in XLA)
        x = stage[:].astype(jnp.int32)
        rr = rr_ref[b]
        # flattened left-shift by rr in [0, 1024). Scalar-into-vector
        # selects are fine here: a few hundred vector ops per problem,
        # not a million-step fill loop.
        # coarse bits: whole-row shifts by residual // 128
        for k in (2, 1, 0):
            s = 1 << k
            xs = jnp.concatenate([x[s:], x[:s]], axis=0)
            x = jnp.where(((rr >> (7 + k)) & 1) == 1, xs, x)
        # fine bits: lane-roll by 2**k with a one-row carry for the
        # lanes that wrapped
        lane = jax.lax.broadcasted_iota(jnp.int32, (R1, 128), 1)
        for k in range(6, -1, -1):
            s = 1 << k
            rolled = pltpu.roll(x, 128 - s, axis=1)
            up = jnp.concatenate([x[1:], x[:1]], axis=0)
            rolled_up = pltpu.roll(up, 128 - s, axis=1)
            xs = jnp.where(lane < 128 - s, rolled, rolled_up)
            x = jnp.where(((rr >> k) & 1) == 1, xs, x)
        # fresh (R, 128) iotas: slicing the (R1, 128) lane iota makes
        # Mosaic's layout check abort at R > 8 (probed round 3)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        keep = (row * 128 + lane_r) < ln_ref[b]
        o_ref[0] = jnp.where(keep, x[:R], NCODE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, R, 128), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R1, 128), jnp.int8),
                        pltpu.SemaphoreType.DMA],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, R, 128), jnp.int32),
    )

    @jax.jit
    def g(store2d, off, ln):
        off = jnp.clip(off.astype(jnp.int32), 0, None)
        r0 = (off // 1024) * 8
        rr = off % 1024
        ln = jnp.clip(ln.astype(jnp.int32), 0, L)
        out = call(r0, rr, ln, store2d).astype(jnp.int8).reshape(B, L)
        if packed:
            out = out[:, 0::2] | (out[:, 1::2] << 4)
        return out

    return g
