"""Device (JAX) variant of the (w,k)-minimizer sketch — bit-compatible
with index/sketch.py (which mirrors mm_sketch, minialign.c:2349-2448).

Used for on-device index construction / query sketching at scale: the
whole pipeline (k-mer roll, CRC32-C hash, windowed min, emission mask)
is expressed as vectorized array ops over all positions, so it jits
and shards over a mesh.

JAX runs without x64 here, so the reference's packed 64-bit comparable
word (hash<<8 | idx | strand<<7) is carried as a two-word (hi = hash,
lo = idx|strand<<7) pair with lexicographic window-min — requiring the
hash to fit 32 bits, i.e. k <= 16 (the reference default is 15 and no
preset exceeds it; larger k falls back to the host sketch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .sketch import _CRC_TABLE


def _crc32c_u32pair(lo: jnp.ndarray, hi32: jnp.ndarray) -> jnp.ndarray:
    """_mm_crc32_u64(kx, kx) with kx = hi32<<32 | lo (each uint32):
    accumulator = lo, folded with the 8 bytes LSB-first."""
    tbl = jnp.asarray(_CRC_TABLE)
    r = lo
    for i in range(4):
        byte = (lo >> jnp.uint32(8 * i)) & jnp.uint32(0xFF)
        r = (r >> jnp.uint32(8)) ^ tbl[(r ^ byte) & jnp.uint32(0xFF)]
    for i in range(4):
        byte = (hi32 >> jnp.uint32(8 * i)) & jnp.uint32(0xFF)
        r = (r >> jnp.uint32(8)) ^ tbl[(r ^ byte) & jnp.uint32(0xFF)]
    return r


def sketch_device(codes: jnp.ndarray, k: int, w: int):
    """codes: (L,) 2-bit codes, k <= 16. Returns (hash, pos, strand,
    emit) arrays over all k-mer positions; occurrences are the rows
    where emit is set (compacted by the host wrapper)."""
    if k > 16:
        raise ValueError("device sketch supports k <= 16")
    codes = jnp.asarray(codes, jnp.uint32) & jnp.uint32(3)
    L = codes.shape[0]
    n = L - k + 1
    mask = jnp.uint32((1 << (2 * k)) - 1)

    k0 = jnp.zeros(n, jnp.uint32)
    k1 = jnp.zeros(n, jnp.uint32)
    for i in range(k):
        c = jax.lax.dynamic_slice(codes, (i,), (n,))
        k0 = k0 | (c << jnp.uint32(2 * (k - 1 - i)))
        k1 = k1 | ((jnp.uint32(3) ^ c) << jnp.uint32(2 * i))
    strand = k1 <= k0
    km = jnp.where(strand, k1, k0)
    kx = jnp.where(strand, k0, k1)
    h = (_crc32c_u32pair(kx, jnp.zeros_like(kx)) ^ km) & mask

    idx = (jnp.arange(n) % w).astype(jnp.uint32)
    lo = idx | (strand.astype(jnp.uint32) << jnp.uint32(7))

    # trailing-w windowed lexicographic min over (hi=h, lo), with
    # last-occurrence tie priority: fold shifted copies oldest-to-
    # newest preferring the newer on full ties
    bigh = jnp.uint32(0xFFFFFFFF)
    mh = jnp.full(n, bigh, jnp.uint32)
    ml = jnp.full(n, bigh, jnp.uint32)
    ap = jnp.zeros(n, jnp.int32)
    pos_iota = jnp.arange(n, dtype=jnp.int32)
    for d in range(w - 1, -1, -1):
        valid = pos_iota - d >= 0
        sh = jnp.where(valid, jnp.roll(h, d), bigh)
        sl = jnp.where(valid, jnp.roll(lo, d), bigh)
        upd = (sh < mh) | ((sh == mh) & (sl <= ml))
        mh = jnp.where(upd, sh, mh)
        ml = jnp.where(upd, sl, ml)
        ap = jnp.where(upd, pos_iota - d, ap)

    same_prev = jnp.concatenate([
        jnp.zeros(1, bool),
        (mh[1:] == mh[:-1]) & (ml[1:] == ml[:-1])])
    is_self = (mh == h) & (ml == lo)
    emit = ~same_prev | is_self
    pos = jnp.where(is_self, pos_iota, ap)
    return mh, pos, (ml >> jnp.uint32(7)) & jnp.uint32(1), emit


def sketch_jax(codes, k: int, w: int):
    """Host-facing wrapper returning compacted (hash, pos, strand)
    arrays, same contract as index/sketch.sketch."""
    codes = np.asarray(codes)
    if len(codes) - k + 1 <= 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64),
                np.empty(0, np.uint8))
    h, pos, strand, emit = sketch_device(jnp.asarray(codes), k, w)
    emit = np.asarray(emit)
    return (np.asarray(h)[emit].astype(np.uint64),
            np.asarray(pos)[emit].astype(np.int64),
            np.asarray(strand)[emit].astype(np.uint8))
