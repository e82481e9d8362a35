"""Sketch + index tests: CRC32c against hardware vectors, the
vectorized sketch against a literal step-by-step port of the reference
sketch loop (minialign.c:2383-2434), and index build/lookup/IO."""

import numpy as np

from minialign_tpu.index.build import MMIndex, build_index
from minialign_tpu.index.sketch import crc32c_u64, hash64, sketch
from minialign_tpu.params import IndexParams

# vectors captured from _mm_crc32_u64(x, x) on SSE4.2 hardware
CRC_VECTORS = [
    (0x0000000000000000, 0x0000000000000000),
    (0x0000000000000001, 0x0000000000000000),
    (0x00000000deadbeef, 0x0000000000000000),
    (0x123456789abcdef0, 0x00000000fa745634),
    (0xffffffffffffffff, 0x00000000b798b438),
    (0x0f0f0f0f0f0f0f0f, 0x000000001a8fb759),
]


def test_crc32c_hardware_vectors():
    xs = np.asarray([v[0] for v in CRC_VECTORS], np.uint64)
    expect = np.asarray([v[1] for v in CRC_VECTORS], np.uint64)
    got = crc32c_u64(xs, xs)
    np.testing.assert_array_equal(got, expect)


def sketch_direct(codes, k, w):
    """Literal port of the reference sketch loop semantics: sliding
    window min with the push rule (v == h) | (v != u), u0 = 0."""
    mask = (1 << (2 * k)) - 1
    n = len(codes) - k + 1
    if n <= 0:
        return []
    hs = []
    k0 = k1 = 0
    shift1 = 2 * (k - 1)
    for t, c in enumerate(codes):
        k0 = ((k0 << 2) | int(c)) & mask
        k1 = (k1 >> 2) | ((3 ^ int(c)) << shift1)
        if t >= k - 1:
            i = (t - (k - 1)) % w
            km, kx, m = (k0, k1, 0) if k0 < k1 else (k1, k0, 0x80)
            h = int(hash64(np.uint64(km), np.uint64(kx), mask))
            hs.append((h << 8) | i | m)
    out = []
    u = 0
    for t in range(len(hs)):
        lo = max(0, t - w + 1)
        win = hs[lo:t + 1]
        v = min(win)
        if v == hs[t] or v != u:
            if v == hs[t]:
                pos = t
            else:
                # last occurrence of the min in the window
                pos = lo + max(i for i, x in enumerate(win) if x == v)
            out.append((v >> 8, pos, (v >> 7) & 1))
        u = v
    return out


def test_sketch_matches_direct_port():
    rng = np.random.default_rng(5)
    for k, w, L in [(5, 3, 64), (15, 10, 500), (8, 5, 200), (3, 2, 30)]:
        codes = rng.integers(0, 4, L).astype(np.int64)
        h, pos, strand = sketch(codes, k, w)
        expect = sketch_direct(codes, k, w)
        got = list(zip(h.tolist(), pos.tolist(), strand.tolist()))
        assert got == expect, (k, w, got[:5], expect[:5])


def test_index_build_and_lookup():
    rng = np.random.default_rng(9)
    g = rng.integers(0, 4, 2000).astype(np.int8)
    ip = IndexParams(k=15, w=10)
    mi = build_index(ip, ["s1"], [g])
    # every reference minimizer must be findable
    h, pos, strand = sketch(g.astype(np.int64), 15, 10)
    start, cnt = mi.lookup(h)
    assert (cnt > 0).all()
    # spot-check positions round-trip
    for t in range(0, len(h), 37):
        vals = mi.vals_pos[start[t]:start[t] + cnt[t]]
        assert pos[t] in vals


def test_index_save_load(tmp_path):
    rng = np.random.default_rng(1)
    g = rng.integers(0, 4, 1000).astype(np.int8)
    mi = build_index(IndexParams(k=12, w=8), ["c"], [g])
    p = str(tmp_path / "t.mai.npz")
    mi.save(p)
    mi2 = MMIndex.load(p)
    np.testing.assert_array_equal(mi.keys, mi2.keys)
    np.testing.assert_array_equal(mi.vals_pos, mi2.vals_pos)
    np.testing.assert_array_equal(mi.occ, mi2.occ)
    assert mi2.names == ["c"]


def test_occ_thresholds_monotone():
    rng = np.random.default_rng(2)
    g = np.tile(rng.integers(0, 4, 100), 20).astype(np.int8)  # repetitive
    mi = build_index(IndexParams(k=11, w=5), ["rep"], [g])
    assert mi.occ[0] >= mi.occ[1] >= mi.occ[2] >= 1


def test_sketch_jax_matches_host():
    """Device (JAX) sketch vs the host implementation: identical
    minimizer streams across (k, w)."""
    import numpy as np

    from minialign_tpu.index.sketch import sketch
    from minialign_tpu.index.sketch_jax import sketch_jax

    rng = np.random.default_rng(31)
    for _ in range(12):
        L = int(rng.integers(30, 1200))
        k = int(rng.choice([7, 11, 15]))
        w = int(rng.choice([2, 5, 10, 16]))
        codes = rng.integers(0, 4, L).astype(np.int64)
        got = sketch_jax(codes, k, w)
        want = sketch(codes, k, w)
        for g, wv in zip(got, want):
            np.testing.assert_array_equal(g, wv)


def test_bucket_major_layout_invariants():
    """Round-3 layout (native streaming build): keys are bucket-major
    — bkt_off partitions them by low b bits, keys ascend within a
    bucket, offsets are a valid CSR, and every key looks itself up."""
    rng = np.random.default_rng(5)
    codes = [rng.integers(0, 4, 40000, dtype=np.int8),
             rng.integers(0, 4, 7000, dtype=np.int8)]
    mi = build_index(IndexParams(k=15, w=10), ["a", "b"], codes)
    assert mi.bkt_off is not None
    nb = 1 << mi.b
    assert len(mi.bkt_off) == nb + 1
    assert mi.bkt_off[0] == 0 and mi.bkt_off[-1] == len(mi.keys)
    mask = np.uint64(nb - 1)
    for j in (0, 1, nb // 3, nb - 1):
        lo, hi = int(mi.bkt_off[j]), int(mi.bkt_off[j + 1])
        ks = mi.keys[lo:hi]
        assert ((ks & mask) == j).all()
        assert (np.diff(ks.astype(np.int64)) > 0).all()
    off = np.asarray(mi.offsets, np.int64)
    assert off[0] == 0 and off[-1] == len(mi.vals_pos)
    assert (np.diff(off) > 0).all()
    st, cnt = mi.lookup(mi.keys)
    np.testing.assert_array_equal(st, off[:-1])
    np.testing.assert_array_equal(cnt, np.diff(off))


def test_legacy_global_layout_lookup():
    """Old .mai files (globally sorted keys, no bkt_off) must keep
    working through the legacy lookup path."""
    rng = np.random.default_rng(6)
    codes = [rng.integers(0, 4, 30000, dtype=np.int8)]
    mi = build_index(IndexParams(k=15, w=10), ["a"], codes)
    ksort_order = np.argsort(mi.keys, kind="stable")
    off = np.asarray(mi.offsets, np.int64)
    legacy = MMIndex(
        k=mi.k, w=mi.w, occ=mi.occ, frq=mi.frq, names=mi.names,
        lens=mi.lens, circular=mi.circular, codes=mi.codes,
        keys=mi.keys[ksort_order],
        offsets=np.concatenate(
            [off[:-1][ksort_order],
             [off[-1]]]),   # starts permuted; counts via next-start
        vals_pos=mi.vals_pos, vals_rid=mi.vals_rid,
        b=mi.b, bkt_off=None)
    # counts in the legacy CSR must follow the permuted order, so
    # rebuild a consistent legacy index by re-laying the values out
    order = np.concatenate(
        [np.arange(off[i], off[i + 1]) for i in ksort_order])
    legacy.vals_pos = mi.vals_pos[order]
    legacy.vals_rid = mi.vals_rid[order]
    cnts = np.diff(off)[ksort_order]
    legacy.offsets = np.concatenate(
        [[0], np.cumsum(cnts)]).astype(np.int64)
    h = mi.keys[rng.integers(0, len(mi.keys), 500)]
    s1, c1 = mi.lookup(h)
    s2, c2 = legacy.lookup(h)
    np.testing.assert_array_equal(c1, c2)
    for t in range(len(h)):
        np.testing.assert_array_equal(
            mi.vals_pos[s1[t]:s1[t] + c1[t]],
            legacy.vals_pos[s2[t]:s2[t] + c2[t]])


def test_build_thread_count_invariant(monkeypatch):
    """MINIALIGN_BUILD_THREADS partitions the per-bucket sorts across
    worker threads; every index array must be byte-identical for any
    thread count (the buckets are independent and sorted in place)."""
    import os

    import numpy as np

    from minialign_tpu.index.build import build_index
    from minialign_tpu.params import IndexParams

    rng = np.random.default_rng(23)
    g = rng.integers(0, 4, 200_000).astype(np.int8)
    outs = {}
    for t in ("1", "3"):
        monkeypatch.setenv("MINIALIGN_BUILD_THREADS", t)
        mi = build_index(IndexParams(), ["g"], [g])
        outs[t] = (mi.keys, mi.offsets, mi.vals_pos, mi.vals_rid,
                   mi.bkt_off)
    for a, b in zip(outs["1"], outs["3"]):
        np.testing.assert_array_equal(a, b)
