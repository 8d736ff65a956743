"""Sharded k-mer table: independent open-addressing shards across a mesh axis.

Keys are routed to shards by hash bits (mirroring yak's prefix binning idea,
kmer.rs:96-98, but over mesh devices instead of file bins). Lookups run under
shard_map: queries are replicated, each device probes its local shard for the
queries it owns, and a psum combines the (disjoint) hits. For human-scale tables
(tens of GB) shards live in different devices' HBM — the reference's
re-scan-the-file-per-contig design (kmer.rs:132) becomes a single resident,
distributed structure.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops.kmer_table import DeviceKmerTable, lookup

SHARD_BITS_SHIFT = 21  # shard id bits: (hash >> 21), away from slot-index bits


@dataclass
class ShardedKmerTable:
    ksize: int
    n_shards: int
    shard_size: int
    # stacked arrays [n_shards, shard_size]; put() shards them over 'kmer'
    key_hi: np.ndarray
    key_lo: np.ndarray
    counts: np.ndarray

    @classmethod
    def build(cls, hashes: np.ndarray, counts: np.ndarray, ksize: int,
              n_shards: int) -> "ShardedKmerTable":
        hashes = np.asarray(hashes, dtype=np.uint64)
        counts = np.asarray(counts, dtype=np.int64)
        shard_of = ((hashes >> np.uint64(SHARD_BITS_SHIFT))
                    % np.uint64(n_shards)).astype(np.int64)
        subtables = []
        for s in range(n_shards):
            sel = shard_of == s
            subtables.append(DeviceKmerTable.build(hashes[sel], counts[sel], ksize))
        size = max(t.size for t in subtables)
        # rebuild smaller shards at the common size for a rectangular stack
        for i, t in enumerate(subtables):
            if t.size != size:
                sel = shard_of == i
                ok, hi, lo, cnt, n_probes = DeviceKmerTable._try_pack(
                    hashes[sel], counts[sel], size)
                assert ok
                subtables[i] = DeviceKmerTable(ksize=t.ksize, size=size,
                                               key_hi=hi, key_lo=lo, counts=cnt,
                                               kmask=t.kmask,
                                               n_probes=n_probes)
        return cls(
            ksize=ksize, n_shards=n_shards, shard_size=size,
            key_hi=np.stack([t.key_hi for t in subtables]),
            key_lo=np.stack([t.key_lo for t in subtables]),
            counts=np.stack([t.counts for t in subtables]),
        )

    def query_host_arrays(self, hashes: np.ndarray):
        hashes = np.asarray(hashes, dtype=np.uint64)
        q_hi = (hashes >> np.uint64(32)).astype(np.uint32).view(np.int32)
        q_lo = (hashes & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
        slot = (((hashes >> np.uint64(10)) ^ (hashes << np.uint64(7)))
                & np.uint64(self.shard_size - 1)).astype(np.int32)
        shard = ((hashes >> np.uint64(SHARD_BITS_SHIFT))
                 % np.uint64(self.n_shards)).astype(np.int32)
        return q_hi, q_lo, slot, shard


def make_sharded_lookup(mesh: Mesh, axis: str = "kmer", min_count: int = 5):
    """Build a jitted sharded lookup fn(key_hi, key_lo, counts, q...) -> counts.

    Table args are sharded [n_shards, S] over `axis`; query args replicated [Q].
    """
    table_spec = P(axis)
    repl = P()

    def _local(key_hi, key_lo, counts, q_hi, q_lo, q_slot, q_shard):
        # local shapes: key_* [1, S]; queries [Q]
        my = jax.lax.axis_index(axis)
        mine = q_shard == my
        out = lookup(key_hi[0], key_lo[0], counts[0], q_hi, q_lo, q_slot,
                     min_count)
        out = jnp.where(mine, out, 0)
        return jax.lax.psum(out, axis)

    fn = shard_map(
        _local, mesh=mesh,
        in_specs=(table_spec, table_spec, table_spec, repl, repl, repl, repl),
        out_specs=repl,
    )
    return jax.jit(fn)
