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

def make_sharded_fill(p: ScoreParams, W: int, max_blocks: int, mesh: Mesh):
    """Batched fill with the problem axis sharded over the mesh. The
    band kernel is embarrassingly parallel over problems, so sharding
    the batch dimension is enough — XLA partitions the whole while-loop
    without collectives."""
    fill = band.make_fill(p, W, max_blocks=max_blocks, trace=False)
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
    per = -(-K // n_shards) if K else 1
    kpad = per * n_shards
    keys_p = np.full(kpad, np.iinfo(np.uint64).max, np.uint64)
    keys_p[:K] = keys
    starts = np.zeros(kpad, np.int64)
    counts = np.zeros(kpad, np.int64)
    starts[:K] = offsets[:-1]
    counts[:K] = offsets[1:] - offsets[:-1]
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
