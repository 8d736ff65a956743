"""Device-resident k-mer count table: open addressing in HBM, batched lookups.

Design departure from the reference (SURVEY §2 C15): KmerInfo re-streams the .yak
file from disk for every query batch (kmer.rs:132-170) because resident RAM was
its constraint. Here each table is packed ONCE into a power-of-two open-addressing
array resident in device HBM; queries are vectorized gathers (linear probing with
a static probe bound enforced at build time). u64 hashes are stored as two i32
planes (TPU has no native 64-bit words).

Sharding (parallel/sharded_kmer.py) splits the array across a mesh axis; each
device probes its local shard and the hit is combined with a psum.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import numpy as np

MAX_PROBES = 32
# Probe scheme: DOUBLE HASHING — probe i lands at (slot + i*stride) & mask
# with stride = ((hash >> 10) | 1) & mask (odd, so the cycle covers every
# slot of the power-of-two table). Linear probing's primary clustering made
# the longest chain exceed any practical bound at useful load factors
# (64M keys packed at ~6% load = 16x HBM waste, round-5 capacity run);
# with double hashing the longest chain is ~log2(n) at load 0.5, so a
# 1G-key table fits in ~2G slots (20 GB) instead of ~200 GB. The stride is
# derived from the query planes inside the lookup kernels, so call sites
# still ship only (hi, lo, slot).
# Empty sentinel = hash 0xFFFFFFFF_FFFFFFFE. For k < 32 real hashes are < 2^(2k)
# and can never collide; for k >= 32 a collision has probability 2^-64 per key
# (the reference's k>=32 path conflates hash collisions anyway, kmer.rs:246-249).
EMPTY_HI = np.int32(-1)          # 0xFFFFFFFF
EMPTY_LO = np.int32(-2)          # 0xFFFFFFFE


@dataclass
class DeviceKmerTable:
    """Host-side build product; arrays are handed to jnp on first use."""

    ksize: int
    size: int            # power of two
    key_hi: np.ndarray   # i32 [size]  (hash >> 32, 31 bits used)
    key_lo: np.ndarray   # i32 [size]  (hash & 0xFFFFFFFF, bit-cast)
    counts: np.ndarray   # i32 [size]
    kmask: int
    # longest probe chain actually used at build time: lookups may stop
    # there (probes past it can never hit — exactness preserved); each probe
    # round is a [Q]-sized gather, so this directly scales lookup cost
    n_probes: int = MAX_PROBES

    @classmethod
    def build(cls, hashes: np.ndarray, counts: np.ndarray, ksize: int,
              load_factor: float = 0.5) -> "DeviceKmerTable":
        """Pack (hash, count) pairs; grows until every key probes <= MAX_PROBES."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        counts = np.asarray(counts, dtype=np.int32)
        size = 1 << max(10, int(np.ceil(np.log2(max(len(hashes), 1) / load_factor))))
        while True:
            ok, hi, lo, cnt, n_probes = cls._try_pack(hashes, counts, size)
            if ok:
                break
            size *= 2
        kmask = (1 << (2 * ksize)) - 1 if ksize < 32 else (1 << 64) - 1
        return cls(ksize=ksize, size=size, key_hi=hi, key_lo=lo, counts=cnt,
                   kmask=kmask, n_probes=n_probes)

    @staticmethod
    def _try_pack(hashes, counts, size):
        mask = np.uint64(size - 1)
        hi = np.full(size, EMPTY_HI, dtype=np.int32)
        lo = np.full(size, EMPTY_LO, dtype=np.int32)
        cnt = np.zeros(size, dtype=np.int32)
        # mix so slot bits differ from the yak prefix-bin bits
        slot = ((hashes >> np.uint64(10)) ^ (hashes << np.uint64(7))) & mask
        order = np.argsort(slot, kind="stable")
        occupied = np.zeros(size, dtype=bool)
        pending = hashes[order]
        pcnts = counts[order]
        pslots = slot[order].astype(np.int64)
        # double-hashing stride (see MAX_PROBES comment); odd -> full cycle
        pstride = (((hashes[order] >> np.uint64(10)) | np.uint64(1))
                   & mask).astype(np.int64)
        # vectorized cascade: place keys; collisions retry at +stride
        for probe in range(MAX_PROBES):
            if len(pending) == 0:
                return True, hi, lo, cnt, probe
            s = (pslots + probe * pstride) & (size - 1)
            # first pending key per free slot wins this round
            free = ~occupied[s]
            idx_sorted = np.argsort(s[free], kind="stable")
            sf = s[free][idx_sorted]
            first = np.ones(len(sf), dtype=bool)
            first[1:] = sf[1:] != sf[:-1]
            winners_local = np.nonzero(free)[0][idx_sorted[first]]
            win_slots = s[winners_local]
            occupied[win_slots] = True
            h = pending[winners_local]
            hi[win_slots] = (h >> np.uint64(32)).astype(np.uint32).view(np.int32)
            lo[win_slots] = (h & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
            cnt[win_slots] = pcnts[winners_local]
            keep = np.ones(len(pending), dtype=bool)
            keep[winners_local] = False
            pending, pcnts = pending[keep], pcnts[keep]
            pslots, pstride = pslots[keep], pstride[keep]
        return len(pending) == 0, hi, lo, cnt, MAX_PROBES

    def query_host_arrays(self, hashes: np.ndarray):
        """Split u64 query hashes into device-friendly i32 planes + start slots."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        q_hi = (hashes >> np.uint64(32)).astype(np.uint32).view(np.int32)
        q_lo = (hashes & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
        slot = (((hashes >> np.uint64(10)) ^ (hashes << np.uint64(7)))
                & np.uint64(self.size - 1)).astype(np.int32)
        return q_hi, q_lo, slot


def lookup(key_hi, key_lo, counts, q_hi, q_lo, q_slot, min_count: int,
           n_probes: int = MAX_PROBES):
    """Device lookup: [Q] queries -> [Q] counts (0 if absent or < min_count).

    jnp function; jit at the call site (shapes: table [S], queries [Q]).
    n_probes: the table's build-time longest probe chain (each round is a
    [Q]-sized gather; rounds past the chain can never hit, so stopping at it
    is exact)."""
    import jax.numpy as jnp

    size = key_hi.shape[0]
    # double-hashing stride, derived from the query planes (call sites ship
    # only hi/lo/slot): low 32 bits of (hash >> 10), forced odd
    qh = jax.lax.bitcast_convert_type(q_hi, jnp.uint32)
    ql = jax.lax.bitcast_convert_type(q_lo, jnp.uint32)
    s10l = (ql >> jnp.uint32(10)) | (qh << jnp.uint32(22))
    stride = jax.lax.bitcast_convert_type(
        (s10l | jnp.uint32(1)) & jnp.uint32(size - 1), jnp.int32)
    out = jnp.zeros(q_hi.shape, dtype=jnp.int32)
    found = jnp.zeros(q_hi.shape, dtype=bool)
    for probe in range(n_probes):
        idx = (q_slot + probe * stride) & (size - 1)
        khi = key_hi[idx]
        klo = key_lo[idx]
        hit = (khi == q_hi) & (klo == q_lo) & ~found
        out = jnp.where(hit, counts[idx], out)
        found = found | hit
    return jnp.where(out >= min_count, out, 0)


@functools.partial(jax.jit, static_argnames=("min_count", "n_probes"))
def lookup_jit(key_hi, key_lo, counts, q_hi, q_lo, q_slot, min_count: int,
               n_probes: int = MAX_PROBES):
    return lookup(key_hi, key_lo, counts, q_hi, q_lo, q_slot, min_count,
                  n_probes)
