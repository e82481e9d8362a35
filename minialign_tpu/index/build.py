"""Minimizer reference index.

TPU-first redesign of the reference's two-stage Robinhood hash
(minialign.c:2450-2997): instead of 2^b buckets of open-addressing
tables with pointer-linked value arrays, the index is a flat sorted
key array + CSR offsets + a value array — directly usable on device
(lookup = vectorized binary search / gather) and trivially shardable
by hash range across hosts.

Equivalences kept:
  * same minimizer set (index/sketch.py is bit-compatible).
  * values are (pos, rid<<1|strand) pairs like mm_mini_t
    (minialign.c:2661-2664).
  * occurrence thresholds occ[i] = (k-th smallest of per-key counts at
    quantile 1-frq[i]) + 1 (minialign.c:2984-2988).
  * keys with count > occ[-1] are dropped from lookups (the reference
    drops them at build, minialign.c:2927; we keep them stored but
    filtered, which is observationally equal and keeps the array
    shardable without re-counting).

Hit ordering within a key is (pos, rid) ascending; the reference's
order is its radix sort's equal-key order (insertion order for the
stable insertion-sorted small buckets). Divergence only affects seed
tie-breaking order; tracked for the SAM-parity pass.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from ..params import IndexParams
from .sketch import sketch


@dataclasses.dataclass
class MMIndex:
    k: int
    w: int
    occ: np.ndarray          # (n_frq,) uint32 occurrence thresholds
    frq: tuple
    # reference sequences
    names: list
    lens: np.ndarray         # (n_seq,) int64
    circular: np.ndarray     # (n_seq,) uint8
    codes: list              # list of (L,) int8 2-bit code arrays
    # minimizer table
    keys: np.ndarray         # (K,) uint64 sorted distinct hashes
    offsets: np.ndarray      # (K+1,) int64 CSR offsets
    vals_pos: np.ndarray     # (V,) uint32 k-mer start positions
    vals_rid: np.ndarray     # (V,) uint32 (sid<<1 | strand)

    @property
    def n_seq(self) -> int:
        return len(self.names)

    @property
    def max_occ(self) -> int:
        return int(self.occ[-1])

    def _dir_table(self):
        """First-stage direct-indexed bucket table (the reference's
        2^b bucket split, minialign.c:2953, rebuilt as CSR heads over
        the sorted keys): narrows each query to a handful of keys so a
        lookup pays ~2 cache misses instead of a 20-level binary
        search over the full key array (3 ms -> ~0.4 ms per read on
        1M-key indexes)."""
        t = getattr(self, "_dir", None)
        if t is None:
            nk = len(self.keys)
            kb = int(self.keys[-1]).bit_length() if nk else 1
            b = min(max(nk.bit_length(), 10), 22, kb)
            s = max(kb - b, 0)
            heads = np.bincount((self.keys >> np.uint64(s)).astype(
                np.int64), minlength=(1 << b) + 1)
            heads = np.concatenate(
                [[0], np.cumsum(heads, dtype=np.int64)])
            t = self._dir = (np.uint64(s), heads, (1 << b) - 1)
        return t

    def lookup(self, h: np.ndarray):
        """Batched lookup: returns (start, count) per query hash; count=0
        for missing keys."""
        h = np.asarray(h, np.uint64)
        if len(self.keys) and len(h):
            s, heads, jmask = self._dir_table()
            j = np.minimum((h >> s).astype(np.int64), jmask)
            lo = heads[j]
            hi = heads[j + 1]
            # vectorized lower_bound within each bucket
            while True:
                live = lo < hi
                if not live.any():
                    break
                mid = (lo + hi) >> 1
                less = self.keys[np.minimum(mid, len(self.keys) - 1)] < h
                lo = np.where(live & less, mid + 1, lo)
                hi = np.where(live & ~less, mid, hi)
            idx = lo
        else:
            idx = np.searchsorted(self.keys, h)
        idx_c = np.minimum(idx, len(self.keys) - 1) if len(self.keys) else idx
        found = np.zeros(len(h), bool) if len(self.keys) == 0 else \
            (self.keys[idx_c] == h) & (idx < len(self.keys))
        start = np.where(found, self.offsets[np.minimum(idx, len(self.offsets) - 2)], 0)
        cnt = np.where(found,
                       self.offsets[np.minimum(idx + 1, len(self.offsets) - 1)]
                       - start, 0)
        return start.astype(np.int64), cnt.astype(np.int64)

    def _arrays(self, prefix: str = "") -> dict:
        d = {
            "meta": np.asarray([self.k, self.w, len(self.occ)], np.int64),
            "occ": self.occ, "frq": np.asarray(self.frq, np.float64),
            "names": np.asarray(self.names, dtype=object),
            "lens": self.lens, "circular": self.circular,
            "keys": self.keys, "offsets": self.offsets,
            "vals_pos": self.vals_pos, "vals_rid": self.vals_rid,
        }
        d.update({f"seq{i}": c for i, c in enumerate(self.codes)})
        return {prefix + k: v for k, v in d.items()}

    @classmethod
    def _from_arrays(cls, z, prefix: str = "") -> "MMIndex":
        meta = z[prefix + "meta"]
        n_seq = len(z[prefix + "lens"])
        return cls(
            k=int(meta[0]), w=int(meta[1]),
            occ=z[prefix + "occ"], frq=tuple(z[prefix + "frq"]),
            names=list(z[prefix + "names"]), lens=z[prefix + "lens"],
            circular=z[prefix + "circular"],
            codes=[z[f"{prefix}seq{i}"] for i in range(n_seq)],
            keys=z[prefix + "keys"], offsets=z[prefix + "offsets"],
            vals_pos=z[prefix + "vals_pos"],
            vals_rid=z[prefix + "vals_rid"],
        )

    def save(self, path: str) -> None:
        """Serialize as a flat array bundle (.mai.npz — the reference's
        .mai role: minialign.c:3040-3169)."""
        save_blocks(path, [self])

    @classmethod
    def load(cls, path: str) -> "MMIndex":
        return load_blocks(path)[0]


def save_blocks(path: str, blocks: list) -> None:
    """Serialize a multi-block index file: the reference's main_index
    appends one mm_idx_dump blob per positional file into one .mai
    (minialign.c:6308-6336); here one npz holds b{j}_-prefixed array
    bundles."""
    d = {"n_blocks": np.asarray([len(blocks)], np.int64)}
    for j, mi in enumerate(blocks):
        d.update(mi._arrays(prefix=f"b{j}_"))
    np.savez_compressed(path, **d)


def load_blocks(path: str) -> list:
    z = np.load(path, allow_pickle=True)
    if "n_blocks" not in z:            # legacy single-block file
        return [MMIndex._from_arrays(z)]
    return [MMIndex._from_arrays(z, prefix=f"b{j}_")
            for j in range(int(z["n_blocks"][0]))]


def build_index(params: IndexParams, names: Sequence[str],
                codes: Sequence[np.ndarray],
                circular: Sequence[bool] | None = None) -> MMIndex:
    """Build the index from 2-bit-coded reference sequences."""
    k, w = params.k, params.w
    circ = np.asarray(
        [params.circular_all or (n in set(params.circular))
         for n in names] if circular is None else list(circular), np.uint8)

    hs, ps, rs = [], [], []
    for sid, c in enumerate(codes):
        # int8 all the way to the sketcher: the int64 widening cost 8x
        # the bytes for nothing (the native sketch takes int8; the
        # numpy fallback widens internally)
        arr = np.asarray(c, np.int8) & 3
        if circ[sid]:
            # circular "nori-shiro" tail wrap (mm_sketch_cap,
            # minialign.c:2436-2443 via mm_idx_worker:2795-2797): the
            # sketch state machine is fed min(len, w) more bases from
            # the sequence head, which equals sketching the extended
            # stream seq + seq[:min(len, w)]; emitted positions
            # continue past len (handled by mm_search_load_pos's
            # over-end adjustment on the query side)
            arr = np.concatenate([arr, arr[:min(len(arr), w)]])
        h, pos, strand = sketch(arr, k, w)
        hs.append(h)
        ps.append(pos.astype(np.uint32))
        rs.append(((sid << 1) | strand.astype(np.uint32)).astype(np.uint32))
    h = np.concatenate(hs) if hs else np.empty(0, np.uint64)
    pos = np.concatenate(ps) if ps else np.empty(0, np.uint32)
    rid = np.concatenate(rs) if rs else np.empty(0, np.uint32)

    # per-bucket ksort ordering (mm_idx_drain pushes each minimizer
    # into bucket h & mask in sequence order, then radix_sort_128x
    # keys each bucket on hrem = h >> b alone, minialign.c:2837+2882):
    # the multi-hit list order of every hash is ksort's equal-key
    # permutation of the push order, which seed collection (and thus
    # chaining and output order) observe. Buckets of <= 64 entries
    # reduce to a stable insertion sort on hrem.
    from .. import native
    b = int(getattr(params, "b", 14))
    order = native.idx_bucket_sort(h, b) if native.available() else None
    if order is None:
        from ..ksort import ks_radix128
        mask = np.uint64((1 << b) - 1)
        bucket = (h & mask).astype(np.int64)
        border = np.argsort(bucket, kind="stable")
        hb = h[border]
        bsorted = bucket[border]
        starts = np.flatnonzero(np.diff(bsorted)) + 1
        starts = np.concatenate([[0], starts, [len(h)]])
        final = np.empty(len(h), np.int64)
        for bi in range(len(starts) - 1):
            s0, s1 = int(starts[bi]), int(starts[bi + 1])
            hrem = (hb[s0:s1] >> np.uint64(b))
            final[s0:s1] = s0 + ks_radix128(hrem)
        order = border[final] if len(h) else final

    # equal-h runs are contiguous within a bucket; re-lay the runs out
    # in key-ascending order (each run keeps its internal ksort order)
    # so the CSR binary-search lookup applies unchanged. All gathers
    # compose into ONE permutation per payload array (bucket order ∘
    # run re-layout) — each avoided materialization is ~GBs at genome
    # scale.
    if len(h):
        hb2 = h[order]
        runs = np.flatnonzero(hb2[1:] != hb2[:-1]) + 1
        run_start = np.concatenate([[0], runs]).astype(np.int64)
        run_len = np.diff(np.concatenate(
            [run_start, [len(h)]])).astype(np.int64)
        run_h = hb2[run_start]
        del hb2
        korder = np.argsort(run_h, kind="stable")
        # vectorized run re-layout (a per-run Python comprehension here
        # allocated ~1 small array per distinct k-mer — hours at Gb
        # scale): gather = each reordered run's start + within-run iota
        st2 = run_start[korder]
        ln2 = run_len[korder]
        tot = int(ln2.sum())
        gather = np.repeat(st2, ln2) + (
            np.arange(tot, dtype=np.int64)
            - np.repeat(np.cumsum(ln2) - ln2, ln2))
        final_perm = order[gather]
        del gather
        h, pos, rid = h[final_perm], pos[final_perm], rid[final_perm]
        del final_perm
        keys = run_h[korder]
        counts = ln2
        offsets = np.zeros(len(keys) + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
    else:
        keys = np.empty(0, np.uint64)
        counts = np.empty(0, np.int64)
        offsets = np.zeros(1, np.int64)

    # occurrence thresholds (minialign.c:2984-2988)
    occ = np.empty(len(params.frq), np.uint32)
    if len(counts):
        cs = np.sort(counts)
        for i, f in enumerate(params.frq):
            if f <= 0.0:
                occ[i] = np.uint32(0xFFFFFFFF)
            else:
                occ[i] = cs[min(int((1.0 - f) * len(cs)), len(cs) - 1)] + 1
    else:
        occ[:] = 1

    return MMIndex(
        k=k, w=w, occ=occ, frq=tuple(params.frq),
        names=list(names),
        lens=np.asarray([len(c) for c in codes], np.int64),
        circular=circ,
        codes=[np.asarray(c, np.int8) for c in codes],
        keys=keys, offsets=offsets, vals_pos=pos, vals_rid=rid,
    )
