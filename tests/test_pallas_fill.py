"""Pallas kernel vs the XLA reference fill: identical results required
(scores, max positions, masks, dirs). Runs in interpreter mode on CPU;
the same kernel compiles natively on TPU."""

import numpy as np
import pytest

from minialign_tpu.dp import band, pallas_fill
from minialign_tpu.params import ScoreParams


def simple(m, x, gi, ge, **kw):
    mat = tuple(m if (i & 3) == (i >> 2) else -x for i in range(16))
    return ScoreParams(matrix=mat, gi=gi, ge=ge, xdrop=80, **kw)


def mutate(rng, a, wband):
    out = []
    drift = 0
    lim = wband // 2 - 6
    for ch in a:
        r = rng.random()
        if r < 0.10:
            out.append(rng.integers(0, 4))
        elif r < 0.15 and drift < lim:
            out.append(rng.integers(0, 4))
            out.append(ch)
            drift += 1
        elif r < 0.20 and drift > -lim:
            drift -= 1
        else:
            out.append(ch)
    return np.asarray(out, np.int64)


@pytest.mark.parametrize("pname,W", [("affine", 64), ("combined", 32),
                                     ("linear", 16)])
def test_pallas_matches_xla(pname, W):
    p = {"affine": simple(2, 3, 5, 1),
         "combined": simple(2, 4, 4, 2, gfa=3, gfb=3),
         "linear": simple(1, 2, 0, 1)}[pname]
    rng = np.random.default_rng(13)
    B = 8
    seqs_a = [rng.integers(0, 4, int(rng.integers(40, 250)))
              for _ in range(B)]
    seqs_b = [mutate(rng, a, W) for a in seqs_a]
    ab, alen = band.pad_codes(seqs_a)
    bb, blen = band.pad_codes(seqs_b)

    nb = 24
    ref_fill = band.make_fill(p, W, max_blocks=nb, trace=True)
    pal_fill = pallas_fill.make_fill_pallas(p, W, max_blocks=nb,
                                            trace=True, interpret=True)
    r1, b1 = ref_fill(ab, alen, bb, blen)
    r2, b2 = pal_fill(ab, alen, bb, blen)

    np.testing.assert_array_equal(np.asarray(r1.max_score),
                                  np.asarray(r2.max_score))
    np.testing.assert_array_equal(np.asarray(r1.max_i),
                                  np.asarray(r2.max_i))
    np.testing.assert_array_equal(np.asarray(r1.max_j),
                                  np.asarray(r2.max_j))
    # the pallas path rounds block counts up to K per launch; all
    # traceback-relevant content in the common prefix must be identical
    n1, n2 = int(np.asarray(r1.n_blocks)), int(np.asarray(r2.n_blocks))
    n = min(n1, n2)
    assert n2 >= n1
    np.testing.assert_array_equal(np.asarray(b1.dirs)[:, :n],
                                  np.asarray(b2.dirs)[:, :n])
    np.testing.assert_array_equal(np.asarray(b1.iheads)[:, :1],
                                  np.asarray(b2.iheads)[:, :1])
    np.testing.assert_array_equal(np.asarray(b1.masks)[:, :n],
                                  np.asarray(b2.masks)[:, :n])


@pytest.mark.slow
def test_pallas_two_level_extraction_matches_xla():
    """Long sources route through the two-level (super-window)
    extraction path (tlA/tlB in _make_fill_kernel); bit-parity with
    the XLA fill must hold across super-window refreshes. K=1 keeps
    the threshold low enough to exercise on CPU interpret."""
    p = simple(2, 3, 5, 1)
    W = 64
    rng = np.random.default_rng(99)
    a = rng.integers(0, 4, 2200)
    b = mutate(rng, a, W)
    ab, alen = band.pad_codes([a])
    bb, blen = band.pad_codes([b])

    nb = (2 * 2300) // band.BLK + 2
    ref_fill = band.make_fill(p, W, max_blocks=nb, trace=True)
    pal_fill = pallas_fill.make_fill_pallas(p, W, max_blocks=nb,
                                            trace=True, interpret=True,
                                            K=1)
    r1, b1 = ref_fill(ab, alen, bb, blen)
    r2, b2 = pal_fill(ab, alen, bb, blen)
    np.testing.assert_array_equal(np.asarray(r1.max_score),
                                  np.asarray(r2.max_score))
    np.testing.assert_array_equal(np.asarray(r1.max_i),
                                  np.asarray(r2.max_i))
    np.testing.assert_array_equal(np.asarray(r1.max_j),
                                  np.asarray(r2.max_j))
    nbl = int(np.asarray(r1.n_blocks))
    np.testing.assert_array_equal(np.asarray(b1.dirs)[:, :nbl],
                                  np.asarray(b2.dirs)[:, :nbl])
    np.testing.assert_array_equal(np.asarray(b1.masks)[:, :nbl],
                                  np.asarray(b2.masks)[:, :nbl])


def test_packed_io_matches_unpacked():
    """4-bit packed char inputs (FillEngine's upload format) must give
    identical results to the plain inputs."""
    p = simple(2, 3, 5, 1)
    W = 64
    rng = np.random.default_rng(5)
    seqs_a = [rng.integers(0, 4, 180) for _ in range(4)]
    seqs_b = [mutate(rng, a, W) for a in seqs_a]
    ab, alen = band.pad_codes(seqs_a)
    bb, blen = band.pad_codes(seqs_b)
    ab = np.asarray(ab)
    bb = np.asarray(bb)
    if ab.shape[1] % 2:
        ab = np.pad(ab, ((0, 0), (0, 1)), constant_values=band.NCODE)
    if bb.shape[1] % 2:
        bb = np.pad(bb, ((0, 0), (0, 1)), constant_values=band.NCODE)

    nb = 24
    plain = pallas_fill.make_fill_pallas(p, W, max_blocks=nb,
                                         trace=True, interpret=True)
    packed = pallas_fill.make_fill_pallas(p, W, max_blocks=nb,
                                          trace=True, interpret=True,
                                          packed_io=True)
    r1, b1 = plain(ab, alen, bb, blen)
    pa = ab[:, 0::2] | (ab[:, 1::2] << 4)
    pb = bb[:, 0::2] | (bb[:, 1::2] << 4)
    r2, b2 = packed(pa, alen, pb, blen)
    np.testing.assert_array_equal(np.asarray(r1.max_score),
                                  np.asarray(r2.max_score))
    np.testing.assert_array_equal(np.asarray(r1.max_i),
                                  np.asarray(r2.max_i))
    np.testing.assert_array_equal(np.asarray(b1.masks),
                                  np.asarray(b2.masks))


def test_div10_exhaustive():
    """The kernel's floor-div-by-10 (f32 multiply by fl(0.1), then
    truncate — Mosaic has no integer vector divide) must be exact for
    every value the word hierarchy can produce (offsets < 2**19;
    pallas_fill asserts PA/PB <= 18). IEEE f32 multiplication is
    deterministic, so the numpy check covers the TPU semantics."""
    x = np.arange(0, 1 << 19, dtype=np.int32)
    q = (x.astype(np.float32) * np.float32(0.1)).astype(np.int32)
    np.testing.assert_array_equal(q, x // 10)


def test_wordstream_boundary_shapes():
    """Round-4 word-packed sourcing edge cases vs the XLA fill:
    lengths straddling the two-level threshold, word-boundary lengths
    (multiples of 10 +/- 1), tiny sources, and problems that run far
    into the NCODE sentinel region (b much shorter than a)."""
    p = simple(2, 3, 5, 1)
    W = 64
    rng = np.random.default_rng(17)
    cases = []
    for L in (9, 10, 11, 79, 80, 81, 255, 640, 1999, 2000):
        a = rng.integers(0, 4, L)
        cases.append((a, mutate(rng, a, W)))
    # deep sentinel run: a long, b short -> fill consumes NCODE rows
    a = rng.integers(0, 4, 700)
    cases.append((a, a[:60]))
    seqs_a = [c[0] for c in cases]
    seqs_b = [np.asarray(c[1], np.int64) for c in cases]
    ab, alen = band.pad_codes(seqs_a)
    bb, blen = band.pad_codes(seqs_b)
    nb = (2 * 2100) // band.BLK + 2
    ref_fill = band.make_fill(p, W, max_blocks=nb, trace=True)
    pal_fill = pallas_fill.make_fill_pallas(p, W, max_blocks=nb,
                                            trace=True, interpret=True,
                                            K=1)
    r1, b1 = ref_fill(ab, alen, bb, blen)
    r2, b2 = pal_fill(ab, alen, bb, blen)
    np.testing.assert_array_equal(np.asarray(r1.max_score),
                                  np.asarray(r2.max_score))
    np.testing.assert_array_equal(np.asarray(r1.max_i),
                                  np.asarray(r2.max_i))
    np.testing.assert_array_equal(np.asarray(r1.max_j),
                                  np.asarray(r2.max_j))
    n = int(np.asarray(r1.n_blocks))
    np.testing.assert_array_equal(np.asarray(b1.dirs)[:, :n],
                                  np.asarray(b2.dirs)[:, :n])
    np.testing.assert_array_equal(np.asarray(b1.masks)[:, :n],
                                  np.asarray(b2.masks)[:, :n])
