"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from minialign_tpu.dp import band
from minialign_tpu.index.build import build_index
from minialign_tpu.index.sketch import sketch
from minialign_tpu.params import IndexParams, ScoreParams
from minialign_tpu.parallel import shard


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    return shard.make_mesh()


def test_sharded_fill_matches_single(mesh):
    p = ScoreParams()
    rng = np.random.default_rng(3)
    n = len(jax.devices())
    B, L = 2 * n, 200
    a = rng.integers(0, 4, (B, L)).astype(np.int8)
    b = a.copy()
    ab, alen = band.pad_codes(list(a))
    bb, blen = band.pad_codes(list(b))

    single = band.make_fill(p, 64, max_blocks=20, trace=False)
    r1 = single(ab, alen, bb, blen)
    sharded = shard.make_sharded_fill(p, 64, max_blocks=20, mesh=mesh)
    r2 = sharded(ab, alen, bb, blen)
    np.testing.assert_array_equal(np.asarray(r1.max_score),
                                  np.asarray(r2.max_score))
    np.testing.assert_array_equal(np.asarray(r1.max_i),
                                  np.asarray(r2.max_i))


def test_sharded_lookup_matches_host(mesh):
    rng = np.random.default_rng(5)
    g = rng.integers(0, 4, 3000).astype(np.int8)
    mi = build_index(IndexParams(k=11, w=6), ["c"], [g])
    n = len(jax.devices())
    keys_sh, starts_sh, counts_sh = shard.shard_index_arrays(
        mi.keys, mi.offsets, n)
    lookup = shard.make_sharded_lookup(mesh)

    qh, _, _ = sketch(g[100:800].astype(np.int64), 11, 6)
    st_d, cn_d = lookup(keys_sh, starts_sh, counts_sh, qh)
    st_h, cn_h = mi.lookup(qh)
    np.testing.assert_array_equal(np.asarray(cn_d), cn_h)
    np.testing.assert_array_equal(np.asarray(st_d), st_h)

    # absent keys return zero counts
    miss = np.asarray([0xDEADBEEF], np.uint64)
    _, cn0 = lookup(keys_sh, starts_sh, counts_sh, miss)
    assert int(np.asarray(cn0)[0]) == 0
