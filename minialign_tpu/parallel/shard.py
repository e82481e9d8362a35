"""Multi-chip sharding for the mapping pipeline.

The reference is single-node pthreads (minialign.c:780-1133); the
parallel axes here are designed for TPU meshes (SURVEY.md section 2.6):

  * data parallelism: extension-problem batches sharded over the mesh
    ('dp' axis) — each device fills its own band batch; no collectives
    on the hot path.
  * index sharding: the minimizer key/value table is sharded by sorted
    hash range ('dp' axis reused); query hashes are replicated, each
    shard answers lookups falling into its range, and per-shard hit
    counts are merged with an all_gather (cross-host hit merge of
    BASELINE config 5).

Everything compiles and runs on a virtual CPU mesh
(xla_force_host_platform_device_count) — see tests/test_shard.py and
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dp import band
from ..params import ScoreParams


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return jax.make_mesh(
        (len(devs),), ("dp",),
        axis_types=(jax.sharding.AxisType.Auto,), devices=devs)


# ---------------------------------------------------------------------------
# data-parallel band fill
# ---------------------------------------------------------------------------

def make_sharded_fill(p: ScoreParams, W: int, max_blocks: int, mesh: Mesh,
                      trace: bool = False):
    """Batched fill with the problem axis sharded over the mesh. The
    band kernel is embarrassingly parallel over problems, so sharding
    the batch dimension is enough — XLA partitions the whole while-loop
    without collectives."""
    fill = band.make_fill(p, W, max_blocks=max_blocks, trace=trace)
    bsh = NamedSharding(mesh, P("dp", None))
    vsh = NamedSharding(mesh, P("dp"))

    def sharded(a, alen, b, blen):
        a = jax.device_put(a, bsh)
        b = jax.device_put(b, bsh)
        alen = jax.device_put(alen, vsh)
        blen = jax.device_put(blen, vsh)
        return fill(a, alen, b, blen)

    return sharded


# ---------------------------------------------------------------------------
# sharded index lookup
# ---------------------------------------------------------------------------

def shard_index_arrays(keys: np.ndarray, offsets: np.ndarray,
                       n_shards: int):
    """Split the sorted key table into n_shards contiguous hash ranges,
    padded to a common size. Returns (keys_sh, starts_sh, counts_sh,
    shard_base) stacked as (n_shards, K_pad) arrays."""
    K = len(keys)
    # bucket-major indexes (round 3) are only per-bucket sorted; the
    # shard tables need global order for the per-shard searchsorted,
    # so sort once at shard build (starts/counts ride along)
    kord = np.argsort(keys, kind="stable")
    keys = np.asarray(keys, np.uint64)[kord]
    st_all = np.asarray(offsets[:-1], np.int64)[kord]
    cn_all = (np.asarray(offsets[1:], np.int64)
              - np.asarray(offsets[:-1], np.int64))[kord]
    per = -(-K // n_shards) if K else 1
    kpad = per * n_shards
    keys_p = np.full(kpad, np.iinfo(np.uint64).max, np.uint64)
    keys_p[:K] = keys
    starts = np.zeros(kpad, np.int64)
    counts = np.zeros(kpad, np.int64)
    starts[:K] = st_all
    counts[:K] = cn_all
    return (keys_p.reshape(n_shards, per),
            starts.reshape(n_shards, per),
            counts.reshape(n_shards, per))


def make_sharded_lookup(mesh: Mesh):
    """Build a jitted lookup: query hashes (replicated) against the
    hash-range-sharded key table; per-shard hits merged with psum
    across the mesh (each hash lives in exactly one shard)."""

    def _local(keys, starts, counts, q):
        idx = jnp.searchsorted(keys, q)
        idx_c = jnp.minimum(idx, keys.shape[0] - 1)
        found = keys[idx_c] == q
        st = jnp.where(found, starts[idx_c], 0)
        cn = jnp.where(found, counts[idx_c], 0)
        return st, cn

    def lookup(keys_sh, starts_sh, counts_sh, q):
        # keys_sh: (n_shards, K) sharded on axis 0; q: (Q,) replicated
        def body(keys, starts, counts, q):
            st, cn = _local(keys[0], starts[0], counts[0], q)
            # merge across shards: each key matches exactly one shard
            st = jax.lax.psum(st, "dp")
            cn = jax.lax.psum(cn, "dp")
            return st, cn

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("dp", None), P("dp", None), P("dp", None), P()),
            out_specs=(P(), P()),
        )(keys_sh, starts_sh, counts_sh, q)

    return jax.jit(lookup)


# ---------------------------------------------------------------------------
# distributed mapping driver
# ---------------------------------------------------------------------------

class ShardedFillEngine:
    """FillEngine-compatible executor whose device batches are sharded
    over the mesh's 'dp' axis (batch data parallelism of SURVEY.md
    section 2.6: the pt_stream worker pool becomes extension-problem
    batches split across chips). Same request/result contract as
    extend.FillEngine; results are bit-identical to the single-device
    engine (tests/test_shard.py)."""

    def __init__(self, score: ScoreParams, mesh: Mesh,
                 batch: int | None = None):
        from ..extend import _FN_CACHE, _score_key, FillEngine

        self.mesh = mesh
        ndev = mesh.devices.size
        self._inner = FillEngine(score, batch=batch or 16 * ndev,
                                 use_pallas=False)
        # swap the fill-builder for the mesh-sharded one, with a cache
        # partition of its own (same keys as the single-device fills,
        # different kernels)
        eng = self._inner
        eng._fns = _FN_CACHE.setdefault(
            (_score_key(score), "sharded", id(mesh)), {})
        score_p = score

        def _fn(W, la, lb, trace):
            nb = (la + lb + 2 * band.TAIL_N) // band.BLK + 2
            key = (W, la, lb, trace)
            if key not in eng._fns:
                eng._fns[key] = make_sharded_fill(
                    score_p, W, max_blocks=nb, mesh=mesh, trace=trace)
            return eng._fns[key], False    # unpacked char inputs

        eng._fn = _fn

    @property
    def p(self):
        return self._inner.p

    def set_index(self, mi):
        self._inner.set_index(mi)

    def set_queries(self, reads):
        self._inner.set_queries(reads)

    def run(self, reqs: list) -> list:
        return self._inner.run(reqs)


class ShardedIndex:
    """MMIndex facade whose minimizer lookups run on device against a
    hash-range-sharded key table with cross-shard psum merge (the
    BASELINE config-5 layout: per-host index shards, query hashes
    replicated, hits merged over the mesh). Sequence data and metadata
    stay replicated; only the (keys, offsets) table is sharded."""

    def __init__(self, mi, mesh: Mesh):
        self._mi = mi
        self.mesh = mesh
        n = mesh.devices.size
        keys_sh, starts_sh, counts_sh = shard_index_arrays(
            mi.keys, mi.offsets, n)
        sh = NamedSharding(mesh, P("dp", None))
        self._keys = jax.device_put(jnp.asarray(keys_sh), sh)
        self._starts = jax.device_put(jnp.asarray(starts_sh), sh)
        self._counts = jax.device_put(jnp.asarray(counts_sh), sh)
        self._lookup = make_sharded_lookup(mesh)

    def __getattr__(self, name):
        return getattr(self._mi, name)

    def lookup(self, h):
        h = np.asarray(h, np.uint64)
        if len(h) == 0:
            return (np.empty(0, np.int64), np.empty(0, np.int64))
        st, cn = self._lookup(self._keys, self._starts, self._counts,
                              jnp.asarray(h))
        return np.asarray(st, np.int64), np.asarray(cn, np.int64)


def align_batch_sharded(mp, mi, reads, mesh: Mesh, base_qid: int = 0,
                        tbuf: dict | None = None):
    """pipeline.align_batch with both parallel axes on the mesh:
    extension problems data-parallel ('dp') and index lookups against
    the hash-range-sharded table. Output order and content match the
    single-device pipeline exactly."""
    from ..pipeline import align_batch

    smi = ShardedIndex(mi, mesh)
    engine = ShardedFillEngine(mp.score, mesh)
    return align_batch(mp, smi, reads, engine, base_qid=base_qid,
                       tbuf=tbuf)
