"""Device mesh setup and sharding helpers.

The polishing workload shards two ways (SURVEY §2 parallelism table):
  - 'win'  axis: window batches stream data-parallel (contig windows are the
    intra-contig parallel unit, replacing the reference's one-thread-per-contig);
  - 'kmer' axis: large yak tables shard across devices; lookups combine with a
    psum (small tables replicate instead).
Multi-host extends the same mesh over jax.distributed; ICI carries the psum.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_win: Optional[int] = None, n_kmer: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_win is None:
        n_win = n // n_kmer
    assert n_win * n_kmer == n, f"mesh {n_win}x{n_kmer} != {n} devices"
    arr = np.array(devices).reshape(n_win, n_kmer)
    return Mesh(arr, axis_names=("win", "kmer"))


def window_sharding(mesh: Mesh) -> NamedSharding:
    """Window-batch tensors: leading (batch) dim over the 'win' axis."""
    return NamedSharding(mesh, P("win"))


def kmer_sharding(mesh: Mesh) -> NamedSharding:
    """Stacked k-mer table shards: leading (shard) dim over the 'kmer' axis."""
    return NamedSharding(mesh, P("kmer"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---- active mesh: opt-in multi-chip for the production engine ----
# When set, pipeline/engine.py shards window chunks over 'win' and io/yak.py
# routes batched k-mer lookups through the 'kmer'-sharded table.

_active_mesh: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    global _active_mesh
    _active_mesh = mesh


def get_active_mesh() -> Optional[Mesh]:
    return _active_mesh


def axis_size(mesh: Optional[Mesh], axis: str) -> int:
    if mesh is None or axis not in mesh.axis_names:
        return 1
    return int(mesh.shape[axis])


def auto_mesh(n_kmer: int = 0, yak_bytes: int = 0) -> Optional[Mesh]:
    """Mesh over all visible devices (None if single-device).

    n_kmer = 0 picks the kmer-axis width automatically from the loaded
    table footprint (VERDICT r4 item 7/9): a replicated table must fit every
    device's HBM budget (NP2_KMER_DEVICE_BUDGET_GB, default 8 — half a v5e's
    16 GB, leaving room for DP batches), so the axis doubles until the
    per-device shard fits. yak_bytes is the summed .yak FILE size — resident
    cost is ~1.25x (u64 keys + u16 counts per 8-byte dump entry). With
    yak_bytes = 0 (unknown) the kmer axis stays 1, matching the pre-r5
    behavior."""
    import os

    n = len(jax.devices())
    if n <= 1:
        return None
    if n_kmer <= 0:
        n_kmer = 1
        if yak_bytes:
            budget = float(os.environ.get("NP2_KMER_DEVICE_BUDGET_GB", "8"))
            budget *= 1e9
            need = yak_bytes * 1.25
            while n_kmer < n and need / n_kmer > budget:
                n_kmer *= 2
    if n % n_kmer:
        n_kmer = 1
    return make_mesh(n_win=n // n_kmer, n_kmer=n_kmer)
