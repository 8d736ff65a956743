"""ctypes bindings for the native IO/extraction module (io/_native/np2native.cc).

Provides `extract_contig_native`, the fused BAM-decode + filter + CIGAR-expand +
trim + 3-mer-stream path — the reference's htslib C layer plus its per-read host
hot loops in one native pass. Falls back to the pure-Python path when the shared
library is absent (`build()` compiles it with g++).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_SO = os.path.join(_DIR, "libnp2native.so")
_lib = None


def build() -> bool:
    try:
        subprocess.run(["sh", os.path.join(_DIR, "build.sh")], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.np2_extract_contig.restype = ctypes.c_int
    lib.np2_extract_contig_h.restype = ctypes.c_int
    lib.np2_bam_refs.restype = ctypes.c_int
    lib.np2_open.restype = ctypes.c_void_p
    lib.np2_aggregate.restype = ctypes.c_int
    _lib = lib
    return lib


def aggregate_native(packed: np.ndarray, B: int, W: int, K: int):
    """Native pileup aggregation (np2_aggregate): packed (win<<45|col<<32|key)
    stream -> slot tables; None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, dtype=np.uint64)
    key_tab = np.empty(B * W * K, dtype=np.int32)
    cnt_tab = np.empty(B * W * K, dtype=np.int32)
    coverage = np.empty(B * W, dtype=np.int32)
    n_slots = np.empty(B * W, dtype=np.int32)
    overflow = np.empty(B, dtype=np.uint8)
    rc = lib.np2_aggregate(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_int64(len(packed)), ctypes.c_int64(B), ctypes.c_int64(W),
        ctypes.c_int64(K),
        key_tab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cnt_tab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        coverage.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_slots.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        overflow.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise RuntimeError(f"np2_aggregate failed rc={rc}")
    return (key_tab.reshape(B, W, K), cnt_tab.reshape(B, W, K),
            coverage.reshape(B, W), n_slots.reshape(B, W),
            overflow.astype(bool))


_handles: dict = {}


def _handle_for(bam_path: str):
    """Cache the decompressed BAM across per-contig calls (one open per path)."""
    lib = load()
    h = _handles.get(bam_path)
    if h is None:
        h = lib.np2_open(bam_path.encode())
        if not h:
            raise RuntimeError(f"np2_open failed for {bam_path}")
        _handles[bam_path] = h
    return h


def close_handles() -> None:
    lib = load()
    for h in _handles.values():
        lib.np2_close(ctypes.c_void_p(h))
    _handles.clear()


def available() -> bool:
    return load() is not None


def bam_refs_native(bam_path: str) -> List[Tuple[str, int]]:
    lib = load()
    assert lib is not None
    names = ctypes.create_string_buffer(1 << 20)
    lens = np.zeros(65536, dtype=np.int64)
    n = ctypes.c_int64(0)
    rc = lib.np2_bam_refs(
        bam_path.encode(), names, ctypes.c_int64(len(names)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(lens)), ctypes.byref(n))
    if rc != 0:
        raise RuntimeError(f"np2_bam_refs failed rc={rc}")
    out = []
    raw = names.raw
    pos = 0
    for i in range(n.value):
        end = raw.index(b"\x00", pos)
        out.append((raw[pos:end].decode(), int(lens[i])))
        pos = end + 1
    return out


def extract_contig_native(bam_path: str, tid: int, tseq_codes: np.ndarray,
                          cfg) -> Optional[tuple]:
    """Native per-contig extraction -> (t_pos, key, read_start, aln_bounds,
    clip_flags) flat arrays, or None if the library is unavailable.

    Matches build_alignseqs + kmer_stream for the read alignments (the ref
    pseudo-alignment alignseqs[0] is added by the caller)."""
    lib = load()
    if lib is None:
        return None
    handle = _handle_for(bam_path)
    size = os.path.getsize(bam_path)
    stream_cap = max(1 << 20, size * 6)  # decompressed ~4x, 1 entry/base
    reads_cap = 1 << 20
    while True:
        t_pos = np.zeros(stream_cap, dtype=np.int64)
        key = np.zeros(stream_cap, dtype=np.int32)
        read_start = np.zeros(reads_cap, dtype=np.int32)
        aln_bounds = np.zeros(2 * reads_cap, dtype=np.int64)
        clip_flags = np.zeros(reads_cap, dtype=np.uint8)
        stream_n = ctypes.c_int64(0)
        reads_n = ctypes.c_int64(0)
        rc = lib.np2_extract_contig_h(
            ctypes.c_void_p(handle), ctypes.c_int32(tid),
            tseq_codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(len(tseq_codes)),
            ctypes.c_int64(cfg.min_map_qual), ctypes.c_int64(cfg.min_read_len),
            ctypes.c_int64(cfg.min_map_len), ctypes.c_double(cfg.min_map_fra),
            ctypes.c_int64(cfg.max_clip_len),
            ctypes.c_int64(1 if cfg.use_secondary else 0),
            ctypes.c_int64(1 if cfg.use_supplementary else 0),
            ctypes.c_int64(cfg.trim_len), ctypes.c_int64(cfg.short_ref_len),
            t_pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            key.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(stream_cap), ctypes.byref(stream_n),
            read_start.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            aln_bounds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            clip_flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(reads_cap), ctypes.byref(reads_n),
        )
        if rc == 1:
            stream_cap *= 2
            reads_cap *= 2
            continue
        if rc != 0:
            raise RuntimeError(f"np2_extract_contig failed rc={rc}")
        ns, nr = stream_n.value, reads_n.value
        return (t_pos[:ns], key[:ns], read_start[:nr],
                aln_bounds[: 2 * nr].reshape(nr, 2), clip_flags[:nr])
