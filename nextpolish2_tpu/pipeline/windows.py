"""Window planner: split a contig into anchor-bounded windows for device DP.

The reference runs one global Viterbi per contig (main.rs:1645-1687). We split at
ANCHOR columns — positions where every covering read agrees exactly with zero
insertions over a 3-column context and no read starts nearby — so the optimal path
is forced through the single surviving 3-mer and the DP decomposes exactly:
window-local DP + anchor-pinned boundary == whole-contig DP (additive scores).

This windowing is the TPU-native replacement for one-thread-per-contig parallelism
(SURVEY §2 'Intra-contig parallelism: none'): windows are the batched device unit.

Data layout: ONE t-sorted (t_pos, key) stream per contig; windows are [lo, hi)
ranges into it (adjacent windows overlap by their 3 shared columns). No
window-major copy is ever materialized — on the target VMs fresh memory is the
scarce resource (see np2native.cc header), so the planner is O(stream) with a
single counting sort.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..models.oracle_align import AlignTags
from ..models.oracle_msa import kmer_stream


class WindowOverflow(Exception):
    """A window exceeded static device bounds; caller falls back to the oracle."""


class SegmentCutError(Exception):
    """No valid cut anchor found in the requested plan range (segmented
    engine, pipeline/segmented.py): the caller extends the ingest range and
    retries."""


@dataclass
class WindowPlan:
    starts: np.ndarray        # absolute first column of each window (anchor or 0)
    ends: np.ndarray          # absolute last column (inclusive; anchor or n-1)
    anchors: np.ndarray       # bool per column


@dataclass
class WindowBatch:
    """Anchor-bounded windows as [lo, hi) ranges into the t-sorted stream."""

    plan: WindowPlan
    n_windows: int
    width: int                       # max columns per window (incl. 2 lead cols)
    stream_len: int                  # T: max per-window stream length
    t_sorted: np.ndarray             # int32 [N] target positions, nondecreasing
    k_sorted: np.ndarray             # int32 [N] packed kmer keys
    lo: np.ndarray                   # int64 [nw] stream range per window
    hi: np.ndarray                   # int64 [nw]
    lead: np.ndarray                 # int64 [nw] = max(window_start - 2, 0)
    window_start: np.ndarray         # int64 [nw] absolute start col
    window_len: np.ndarray           # int32 [nw] = end - start + 1

    @property
    def n_tags(self) -> np.ndarray:
        return self.hi - self.lo

    def padded(self) -> tuple[np.ndarray, np.ndarray]:
        """[n_windows, T] (cols, keys) with pad col == width (device-agg path)."""
        nw, T = self.n_windows, self.stream_len
        cols = np.full((nw, T), self.width, dtype=np.int32)
        keys = np.zeros((nw, T), dtype=np.int32)
        for w in range(nw):
            l, h = int(self.lo[w]), int(self.hi[w])
            cols[w, : h - l] = self.t_sorted[l:h] - np.int32(self.lead[w])
            keys[w, : h - l] = self.k_sorted[l:h]
        return cols, keys

    def window_stream(self, w: int) -> tuple[np.ndarray, np.ndarray]:
        l, h = int(self.lo[w]), int(self.hi[w])
        cols = (self.t_sorted[l:h].astype(np.int64) - int(self.lead[w]))
        return cols.astype(np.int32), self.k_sorted[l:h]


def find_anchors_stream(t_all: np.ndarray, k_all: np.ndarray,
                        startcnt: np.ndarray, n_pos: int,
                        ref_codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Anchor mask from the flat (t, key) stream (any order): columns t where
    cols t-2..t are pure (every tag matches ref with delta 0, coverage >= 2)
    and no alignment starts at t-1 or t. Returns (anchors, per-column count)."""
    colcnt = np.bincount(t_all, minlength=n_pos)
    # b3-delta == 0 iff flags bit0 is clear (the b3d>0 cases all set it), so the
    # delta-0 test is a single bit test — no wide temporaries at 137M entries
    k = k_all.view(np.uint32)
    ok = (k & np.uint32(0x1000) == 0) & \
        ((k & np.uint32(0xF)).astype(np.uint8) == ref_codes[t_all])
    matchcnt = np.bincount(t_all[ok], minlength=n_pos)
    pure = (colcnt >= 2) & (matchcnt == colcnt)
    anchors = np.zeros(n_pos, dtype=bool)
    if n_pos >= 3:
        anchors[2:] = pure[2:] & pure[1:-1] & pure[:-2]
        anchors[2:] &= (startcnt[2:] == 0) & (startcnt[1:-1] == 0)
    return anchors, colcnt


def find_anchors(alignseqs: List[AlignTags], n_pos: int,
                 ref_codes: np.ndarray) -> np.ndarray:
    """Anchor mask from alignments (wrapper over find_anchors_stream)."""
    t_all, k_all, _ = _collect_stream(alignseqs)
    startcnt = _start_counts(alignseqs, n_pos)
    if not len(t_all):
        return np.zeros(n_pos, dtype=bool)
    anchors, _ = find_anchors_stream(t_all, k_all, startcnt, n_pos, ref_codes)
    return anchors


def _start_counts(alignseqs: List[AlignTags], n_pos: int) -> np.ndarray:
    starts = [a.aln_t_s for a in alignseqs if not (a.dropped or len(a) == 0)]
    return np.bincount(np.asarray(starts, dtype=np.int64), minlength=n_pos) \
        if starts else np.zeros(n_pos, dtype=np.int64)


def _collect_stream(alignseqs: List[AlignTags]
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate per-alignment (t, key) streams (+ rid) in alignment order."""
    t_parts, k_parts, rid_parts = [], [], []
    for rid, a in enumerate(alignseqs):
        if a.dropped or len(a) == 0:
            continue
        t, k = kmer_stream(a, raw=True)
        t_parts.append(t.astype(np.int32, copy=False))
        k_parts.append(k)
        rid_parts.append(np.full(len(t), rid, dtype=np.int32))
    if not t_parts:
        z = np.zeros(0, np.int32)
        return z, z.copy(), z.copy()
    return (np.concatenate(t_parts), np.concatenate(k_parts),
            np.concatenate(rid_parts))


def plan_windows(anchors: np.ndarray, n_pos: int, target: int = 1024) -> WindowPlan:
    """Greedy split: each window ends at the last anchor within `target` columns
    of its start (or stretches to the next anchor / contig end).

    Dispatches to the native pass (np2_plan_windows) when available — the
    Python while-loop below is the spec and costs O(n_windows) interpreter
    work (~3M windows on human T2T); differential test in test_windows.py."""
    from ..io.native import plan_windows_native

    res = plan_windows_native(anchors, n_pos, target)
    if res is not None:
        return WindowPlan(starts=res[0], ends=res[1], anchors=anchors)
    starts = [0]
    ends: List[int] = []
    anchor_idx = np.nonzero(anchors)[0]
    while True:
        s = starts[-1]
        if s + target >= n_pos:
            ends.append(n_pos - 1)
            break
        # last anchor <= s + target, but > s
        j = np.searchsorted(anchor_idx, s + target, side="right") - 1
        if j >= 0 and anchor_idx[j] > s:
            e = int(anchor_idx[j])
        else:
            # no anchor in range: take the next anchor beyond, else contig end
            j2 = np.searchsorted(anchor_idx, s + 1, side="left")
            e = int(anchor_idx[j2]) if j2 < len(anchor_idx) else n_pos - 1
        ends.append(e)
        if e >= n_pos - 1:
            break
        starts.append(e)
    return WindowPlan(
        starts=np.array(starts, dtype=np.int64),
        ends=np.array(ends, dtype=np.int64),
        anchors=anchors,
    )


def aggregate_host(wb: "WindowBatch", K: int, width: int | None = None,
                   n_windows: int | None = None,
                   win_lo: int = 0, win_hi: int | None = None,
                   use_native: bool = True,
                   win_idx: np.ndarray | None = None):
    """Host pileup aggregation: per-window (col, key) stream ranges ->
    [B, width, K] slot tables + coverage, in the reference's slot order
    (stable by (b3-delta, first occurrence); Msa::push + Msa::sort semantics).

    Same result as ops.consensus.aggregate_windows; exists because XLA's TPU sort
    compile blows up for streams >~100k entries. win_lo/win_hi select a window
    subrange (fixed-size device chunks); window w maps to row w - win_lo.
    win_idx instead selects an ARBITRARY window subset (row i = window
    win_idx[i]) — the K-tier regrouping path (engine.py).
    Returns (key_tab, cnt_tab, coverage, n_slots, overflow)."""
    if win_idx is not None:
        win_idx = np.asarray(win_idx, dtype=np.int64)
        B = n_windows if n_windows is not None else len(win_idx)
        W = width if width is not None else wb.width
        lo = wb.lo[win_idx]
        hi = wb.hi[win_idx]
        lead = wb.lead[win_idx]
        win_hi = win_lo = None
    else:
        if win_hi is None:
            win_hi = wb.n_windows
        B = n_windows if n_windows is not None else (win_hi - win_lo)
        W = width if width is not None else wb.width
        lo = wb.lo[win_lo:win_hi]
        hi = wb.hi[win_lo:win_hi]
        lead = wb.lead[win_lo:win_hi]
    if use_native:
        from ..io.native import aggregate3_native

        res = aggregate3_native(wb.t_sorted, wb.k_sorted, lo, hi, lead,
                                B, W, K)
        if res is not None:
            key_tab, cnt_tab, coverage, n_slots, overflow = res
            # the device backtrack emits count/coverage as u16; send the
            # (pathological) >65535-coverage windows to the host fallback
            if coverage.size and int(coverage.max()) > 0xFFFF:
                overflow = overflow | (coverage.max(axis=1) > 0xFFFF)
            return key_tab, cnt_tab, coverage, n_slots, overflow
    # numpy fallback: materialize this chunk's flat (win, col, key) triples
    nw = len(lo)
    counts = (hi - lo).astype(np.int64)
    idx = np.concatenate([np.arange(lo[w], hi[w]) for w in range(nw)]) if nw \
        else np.zeros(0, dtype=np.int64)
    w_flat = np.repeat(np.arange(nw, dtype=np.int64), counts)
    c_flat = wb.t_sorted[idx].astype(np.int64) - lead[w_flat]
    k_flat = wb.k_sorted[idx].astype(np.int64) & 0xFFFFFFFF
    # out-of-tier columns only need the overflow flag; clamp so the 13-bit
    # packed col field cannot overflow for pathologically wide windows
    c_flat = np.minimum(c_flat, W)
    # pack (win, col, key): win<2^19, col<2^13, key<2^32
    packed = (w_flat << 45) | (c_flat << 32) | k_flat
    uniq, first_idx, counts_u = np.unique(packed, return_index=True,
                                          return_counts=True)
    uw = uniq >> 45
    uc = (uniq >> 32) & 0x1FFF
    uk = uniq & 0xFFFFFFFF
    uflag = (uk >> 12) & 0xF
    udelta = (uk >> 16) & 0xFFFF
    ub3d = np.where(uflag & 0b0101 == 0b0101, udelta + 2,
                    np.where(uflag & 1 == 1, 1, 0))
    order = np.lexsort((first_idx, ub3d, uc, uw))
    uw, uc, uk, ub3d = uw[order], uc[order], uk[order], ub3d[order]
    counts_u = counts_u[order]
    # rank within (win, col)
    grp = (uw << 13) | uc
    new_grp = np.concatenate([[True], grp[1:] != grp[:-1]])
    gidx = np.arange(len(grp))
    gstart = np.maximum.accumulate(np.where(new_grp, gidx, -1))
    rank = gidx - gstart

    overflow = np.zeros(B, dtype=bool)
    over = rank >= K
    # windows wider than the device tensor (anchor-poor stretches) are flagged
    # for the host fallback; their out-of-range columns are dropped here
    over |= uc >= W
    if over.any():
        overflow[np.unique(uw[over])] = True
    keep = ~over
    kw, kc, kr = uw[keep], uc[keep], rank[keep]
    key_tab = np.full((B, W, K), -1, dtype=np.int32)
    cnt_tab = np.zeros((B, W, K), dtype=np.int32)
    key_tab[kw, kc, kr] = uk[keep].astype(np.int32)
    cnt_tab[kw, kc, kr] = counts_u[keep].astype(np.int32)
    coverage = np.zeros((B, W), dtype=np.int32)
    d0 = keep & (ub3d == 0)
    np.add.at(coverage, (uw[d0], uc[d0]), counts_u[d0].astype(np.int32))
    n_slots = np.zeros((B, W), dtype=np.int32)
    np.add.at(n_slots, (kw, kc), 1)
    if coverage.size and int(coverage.max()) > 0xFFFF:  # u16 emission guard
        overflow = overflow | (coverage.max(axis=1) > 0xFFFF)
    return key_tab, cnt_tab, coverage, n_slots, overflow


def split_sparse(key_tab: np.ndarray, cnt_tab: np.ndarray,
                 n_slots: np.ndarray, k_small: int,
                 e_bucket: int = 4096) -> tuple:
    """Split a fat chunk's dense [B, W, K] tables into the [B, W, k_small]
    dense part + padded exception arrays for slots >= k_small (rare columns).
    The device scatters the exceptions back into the full table
    (ops.consensus.dp_backtrack_sparse) — ~10x less tunnel upload per fat
    chunk than dense-K. Used by the mesh-sharded dispatch (its arrays all
    shard over the batch dim); single-device chunks use split_csr below.
    Padding rows use eb == B, dropped by the scatter."""
    from ..utils.jaxcfg import bucket_pow2

    B, W, K = key_tab.shape
    fb, fw = np.nonzero(n_slots > k_small)
    nf = (n_slots[fb, fw] - k_small).astype(np.int64)
    E = int(nf.sum())
    off = np.repeat(np.cumsum(nf) - nf, nf)
    eb = np.repeat(fb, nf).astype(np.int32)
    ew = np.repeat(fw, nf).astype(np.int32)
    ek = (k_small + np.arange(E) - off).astype(np.int32)
    ekey = key_tab[eb, ew, ek]
    ecnt = cnt_tab[eb, ew, ek]
    P = bucket_pow2(max(E, 1), e_bucket)
    pad = P - E
    if pad:
        eb = np.concatenate([eb, np.full(pad, B, np.int32)])
        ew = np.concatenate([ew, np.zeros(pad, np.int32)])
        ek = np.concatenate([ek, np.zeros(pad, np.int32)])
        ekey = np.concatenate([ekey, np.zeros(pad, ekey.dtype)])
        ecnt = np.concatenate([ecnt, np.zeros(pad, ecnt.dtype)])
    return (np.ascontiguousarray(key_tab[:, :, :k_small]),
            np.ascontiguousarray(cnt_tab[:, :, :k_small]),
            eb, ew, ek, ekey, ecnt)


def split_csr(key_tab: np.ndarray, cnt_tab: np.ndarray,
              n_slots: np.ndarray, e_bucket: int = 1024,
              p_bucket: int = 32768, d_bucket: int = 4096) -> tuple:
    """Dense [B, W, K] tables -> the flat CSR upload (the production format
    for single-device dispatch): per-column slot counts ns (u8 [B, W]) + one
    entry stream ordered by (window, column, slot) carrying key_lo (u16, the
    flag|q1|q2|q3 bits) and count (u8) — 3 bytes per REAL slot instead of 6
    dense bytes per (column x K_DENSE) slot, and real HiFi columns average
    well under 2 slots. Deltas are NOT in the main stream: only ~3-11% of
    real entries have delta != 0 (insertion levels), so those ride a sparse
    sidecar (entry index i32 + delta byte) OR-ed into the keys on device.
    Entries whose delta or count exceeds a byte ride a tiny exception list
    (flat entry index + full i32 key/count) scattered over the stream on
    device (ops.consensus.dp_backtrack_csr, which also recomputes coverage
    on device so it is not uploaded at all).

    Entry-stream padding rows (up to the pow2 bucket) resolve to column id
    B*W on device and are dropped; delta/exception padding uses index P (out
    of range, dropped). Bit-exact: the device-assembled table equals the
    dense one; device coverage equals the host's for every non-overflow
    window (the native aggregator counts beyond-K slots into coverage on
    OVERFLOW windows, but those are host-fallback lanes whose device output
    is discarded)."""
    from ..utils.jaxcfg import bucket_pow2

    B, W, K = key_tab.shape
    nsf = np.minimum(n_slots, K).reshape(-1).astype(np.int64)  # [B*W]
    E = int(nsf.sum())
    cum = np.cumsum(nsf)
    start = cum - nsf
    colid = np.repeat(np.arange(B * W, dtype=np.int64), nsf)
    slot = np.arange(E, dtype=np.int64) - np.repeat(start, nsf)
    flat_idx = colid * K + slot
    ekey = key_tab.reshape(-1)[flat_idx].view(np.uint32)
    ecnt = cnt_tab.reshape(-1)[flat_idx]
    delta = ekey >> 16
    exc = (delta > 0xFF) | (ecnt > 0xFF)
    eidx = np.nonzero(exc)[0].astype(np.int32)
    xkey = ekey[eidx].view(np.int32)
    xcnt = ecnt[eidx].astype(np.int32)
    didx = np.nonzero(delta != 0)[0].astype(np.int32)
    dval = np.minimum(delta[didx], 0xFF).astype(np.uint8)  # exc. overwrite
    keylo = ekey.astype(np.uint16)
    clo = np.minimum(ecnt, 0xFF).astype(np.uint8)
    ns_u8 = np.minimum(n_slots, K).astype(np.uint8)
    return (ns_u8,) + _pad_csr(keylo, clo, didx, dval, eidx, xkey, xcnt,
                               e_bucket, p_bucket, d_bucket)


def encode_dgap(didx: np.ndarray, dval: np.ndarray) -> tuple:
    """Gap-encode the sorted-unique delta index list as u16 gaps (the i32
    didx was 4 bytes/entry of pure upload weight — ~6% of a fat K-tier
    chunk's blob): device-side `didx = cumsum(dgap) - 1`. Gaps > 0xFFFF are
    escape-walked with (gap=0xFFFF, dval=0) no-op entries. Real entries
    always carry dval >= 1 — didx indexes NONZERO deltas by construction
    (split_csr / aggregate_csr_parts) — so the device separates escapes and
    bucket padding (dval == 0 -> remapped past the entry stream, dropped)
    from real deltas without a flag bit. Returns (dgap u16, dval u8),
    unpadded."""
    n = len(didx)
    if n == 0:
        return np.zeros(0, np.uint16), np.zeros(0, np.uint8)
    gaps = np.diff(didx.astype(np.int64), prepend=-1)  # first = didx[0] + 1
    n_esc = (gaps - 1) // 0xFFFF  # per-entry escapes; 0 when gap <= 0xFFFF
    total = n + int(n_esc.sum())
    out_g = np.full(total, 0xFFFF, np.uint16)
    out_v = np.zeros(total, np.uint8)
    at = (np.cumsum(n_esc + 1) - 1).astype(np.int64)  # real entries' slots
    out_g[at] = (gaps - n_esc * 0xFFFF).astype(np.uint16)
    out_v[at] = dval
    return out_g, out_v


def _pad_csr(keylo, clo, didx, dval, eidx, xkey, xcnt,
             e_bucket: int, p_bucket: int, d_bucket: int) -> tuple:
    """Bucket-pad the CSR streams to pow2 static shapes (each distinct
    (P, Pd, Pe) is one more device compile) and gap-encode the delta index
    list (encode_dgap — the SINGLE choke point between aggregation and
    dispatch, so split_csr, the native CSR-direct path and the batcher's
    part merge all ship the same u16-gap format). Entry padding is dropped
    on device by resolving to column id B*W; exception index padding points
    past the entry stream (index P) and drops in the scatter; dgap padding
    is (0, 0) — dval == 0 marks it dropped on device (see encode_dgap)."""
    from ..utils.jaxcfg import bucket_pow2

    E = len(keylo)
    P = bucket_pow2(max(E, 1), p_bucket)
    if P > E:
        pad = P - E
        keylo = np.concatenate([keylo, np.zeros(pad, np.uint16)])
        clo = np.concatenate([clo, np.zeros(pad, np.uint8)])
    dgap, dval = encode_dgap(didx, dval)
    Pd = bucket_pow2(max(len(dgap), 1), d_bucket)
    if Pd > len(dgap):
        pad = Pd - len(dgap)
        dgap = np.concatenate([dgap, np.zeros(pad, np.uint16)])
        dval = np.concatenate([dval, np.zeros(pad, np.uint8)])
    didx = dgap
    Pe = bucket_pow2(max(len(eidx), 1), e_bucket)
    if Pe > len(eidx):
        pad = Pe - len(eidx)
        eidx = np.concatenate([eidx,
                               P + np.arange(pad, dtype=np.int32)])
        xkey = np.concatenate([xkey, np.zeros(pad, np.int32)])
        xcnt = np.concatenate([xcnt, np.zeros(pad, np.int32)])
    return keylo, clo, didx, dval, eidx, xkey, xcnt


def aggregate_csr_host(wb: "WindowBatch", K: int, width: int,
                       n_windows: int, win_idx: np.ndarray,
                       e_bucket: int = 1024, p_bucket: int = 32768,
                       d_bucket: int = 4096):
    """CSR-DIRECT chunk aggregation: the native pass (np2_aggregate_csr)
    emits the flat upload stream straight off the t-sorted contig stream,
    never materializing the dense [B, W, K] host tables (tens of MB per
    chunk) that aggregate_host + split_csr would build and rescan. Returns
    (ns_u8, keylo, clo, didx, dval, eidx, xkey, xcnt, overflow) with the
    same bucket padding as split_csr — the device-assembled tables are
    bit-identical (exception-list order may differ; the scatter indices are
    unique) — or None when the native library is unavailable (callers fall
    back to aggregate_host + split_csr).

    The >0xFFFF-coverage host-fallback flag of aggregate_host is NOT set
    here: it exists for the mesh-sharded dense dispatch's u16 coverage
    upload; the CSR path recomputes coverage on device in i32, so those
    windows stay exact on the device lane."""
    parts = aggregate_csr_parts(wb, K, width, n_windows, win_idx)
    if parts is None:
        return None
    ns_u8, keylo, clo, didx, dval, eidx, xkey, xcnt, overflow = parts
    return (ns_u8,) + _pad_csr(keylo, clo, didx, dval, eidx, xkey, xcnt,
                               e_bucket, p_bucket, d_bucket) + (overflow,)


def aggregate_csr_parts(wb: "WindowBatch", K: int, width: int,
                        n_windows: int, win_idx: np.ndarray):
    """UNPADDED CSR-direct aggregation for an arbitrary window subset:
    (ns_u8 [B, W], keylo, clo, didx, dval, eidx, xkey, xcnt, overflow) with
    exact-size streams, or None when the native pass is unavailable. The
    cross-contig batcher merges several requests' parts into one packed
    batch (entry/exception indices offset by the entry-stream prefix) before
    a single _pad_csr."""
    from ..io.native import aggregate_csr_native

    win_idx = np.asarray(win_idx, dtype=np.int64)
    res = aggregate_csr_native(wb.t_sorted, wb.k_sorted, wb.lo[win_idx],
                               wb.hi[win_idx], wb.lead[win_idx],
                               n_windows, width, K)
    if res is None:
        return None
    ns_u8, keylo, dlo, clo, eidx, xkey, xcnt, overflow = res
    didx = np.nonzero(dlo)[0].astype(np.int32)
    dval = dlo[didx]
    return ns_u8, keylo, clo, didx, dval, eidx, xkey, xcnt, overflow


def pack_csr_blob(ns_u8: np.ndarray, keylo: np.ndarray, clo: np.ndarray,
                  dgap: np.ndarray, dval: np.ndarray, eidx: np.ndarray,
                  xkey: np.ndarray, xcnt: np.ndarray, lead: np.ndarray,
                  seed: np.ndarray, last_col: np.ndarray,
                  nibble_ns: bool = False) -> np.ndarray:
    """Concatenate the CSR upload + per-window scalars into ONE little-endian
    uint8 buffer: the tunneled device_put pays a fixed per-array cost that
    dominated the chunk upload (7+ transfers of a few MB total), so the whole
    dispatch ships as a single host->device copy and is sliced/recombined on
    device (ops.consensus.dp_backtrack_csr_blob). Layout, all sizes static
    given (B, W, P, Pd, Pe): ns u8[B*W] (or nibble-packed u8[B*W/2] when
    nibble_ns — slot counts <= K < 16 fit a nibble, the dominant K=8 tier) |
    keylo u16[P] | clo u8[P] | dgap u16[Pd] | dval u8[Pd] | eidx i32[Pe] |
    xkey i32[Pe] | xcnt i32[Pe] | lead i32[B] | seed u8[B] | last_col i32[B].
    The host overflow flags are NOT shipped — the device never reads them
    (harvest consumes the host copy)."""
    ns_flat = np.ascontiguousarray(ns_u8).reshape(-1).view(np.uint8)
    if nibble_ns:
        ns_flat = (ns_flat[0::2] | (ns_flat[1::2] << 4)).astype(np.uint8)
    return np.concatenate([
        ns_flat,
        np.ascontiguousarray(keylo).view(np.uint8),
        clo.view(np.uint8),
        np.ascontiguousarray(dgap).view(np.uint8),
        dval.view(np.uint8),
        np.ascontiguousarray(eidx).view(np.uint8),
        np.ascontiguousarray(xkey).view(np.uint8),
        np.ascontiguousarray(xcnt).view(np.uint8),
        np.ascontiguousarray(lead.astype(np.int32)).view(np.uint8),
        seed.astype(np.uint8),
        np.ascontiguousarray(last_col.astype(np.int32)).view(np.uint8)])


def col_slot_counts(t_sorted: np.ndarray, k_sorted: np.ndarray,
                    n_pos: int) -> np.ndarray:
    """Distinct-key count per absolute column (saturating), the per-window
    max-slot bound for K tiering. A column's distinct (t, key) set is
    window-independent — keys pack per-column deltas, not window offsets —
    so one stream pass bounds every window."""
    from ..io.native import col_slots_native

    res = col_slots_native(t_sorted, k_sorted, n_pos)
    if res is not None:
        return res
    if not len(t_sorted):
        return np.zeros(n_pos, dtype=np.int32)
    packed = (t_sorted.astype(np.int64) << 32) | \
        k_sorted.view(np.uint32).astype(np.int64)
    cols = (np.unique(packed) >> 32).astype(np.int64)
    return np.minimum(np.bincount(cols, minlength=n_pos), 0x7FFF) \
        .astype(np.int32)


def window_max_slots(colslots: np.ndarray, lead: np.ndarray,
                     ends: np.ndarray) -> np.ndarray:
    """Per-window max column slot count over [lead, end] (inclusive).
    Native pass (np2_window_max) when available; the per-window numpy
    slice-max below is the spec/fallback."""
    from ..io.native import window_max_native

    res = window_max_native(colslots, lead, ends)
    if res is not None:
        return res
    out = np.empty(len(lead), dtype=np.int32)
    for i in range(len(lead)):
        out[i] = colslots[lead[i] : ends[i] + 1].max(initial=0)
    return out


def build_window_batch(alignseqs: List[AlignTags], n_pos: int,
                       ref_codes: np.ndarray,
                       target: int = 1024,
                       stream_cache: Optional[dict] = None,
                       flat_stream: Optional[tuple] = None,
                       consume_cache: bool = False,
                       plan_start: int = 0,
                       plan_end: Optional[int] = None,
                       plan_end_nominal: Optional[int] = None,
                       plan_end_max: Optional[int] = None,
                       on_plan=None) -> WindowBatch:
    """Plan windows over the t-sorted contig stream.

    Window w's range holds observations with t_pos in [start-2, end]; kmers at
    relative cols 0,1 (= start-2, start-1) exist only to be discarded on device,
    col 2 (= the anchor) is replaced by the synthesized anchor kmer.

    stream_cache: dict persisted across phasing iterations — the sorted global
    stream is computed once; later iterations mask out dropped reads' entries
    (stable-sorted order is preserved by filtering).
    flat_stream: optional precollected (t_all i32, k_all i32, rid_all i32) in
    alignment order (native ingest hands these straight through).
    consume_cache: this is the LAST use of the cached sorted stream (the
    final phasing iteration): the drop filter may compact it IN PLACE
    instead of copying 8 B/entry, and the sorted-stream cache keys are
    invalidated — lowers the per-contig working-set high-water the
    prefault must provision.

    Segmented plan range (pipeline/segmented.py): plan_start is the first
    window's start column (the previous segment's cut anchor, 0 for the
    first segment). Either plan_end is given explicitly (the last segment
    ends at the contig's final column) or plan_end_nominal asks for a cut:
    the last anchor <= nominal in (plan_start, plan_end_max], else the
    first anchor past it, else SegmentCutError. Any anchor-bounded plan
    yields the exact whole-contig DP, so cut choice is free."""
    from ..io.native import sort_stream_native
    from ..utils.timing import stage

    def _filter_cached(consume: bool = False):
        """Drop-mask filter of the cached sorted stream (stable; used by
        every iteration after the first sort when the cache holds reads the
        current iteration excludes). Returns (t, k, kept_max_b1d) where the
        max is None when nothing was dropped (the caller's unfiltered max
        applies)."""
        from ..io.native import filter_stream_native

        drop = np.array([a.dropped or len(a) == 0 for a in alignseqs])
        if not drop.any():
            return (stream_cache["t_sorted"], stream_cache["k_sorted"],
                    None)
        res = filter_stream_native(stream_cache["t_sorted"],
                                   stream_cache["k_sorted"],
                                   stream_cache["rid_sorted"], drop,
                                   in_place=consume)
        if res is None:
            keep = ~drop[stream_cache["rid_sorted"]]
            k_kept = stream_cache["k_sorted"][keep]
            maxd = int((k_kept.view(np.uint32)
                        >> np.uint32(16)).max()) if len(k_kept) else 0
            res = (stream_cache["t_sorted"][keep], k_kept, maxd)
        if consume:
            # the cached arrays are consumed (compacted in place when the
            # native path ran): no later iteration may reuse them
            for k in ("t_sorted", "k_sorted", "rid_sorted"):
                stream_cache.pop(k, None)
        return res

    def _fused_sort():
        """Fused drop-filter + stable sort off the RESIDENT flat ingest
        stream (np2_sort_stream_runs): every iteration re-sorts the pristine
        flat (t, k) runs with the iteration's cumulative drop mask fused
        into the counting sort's passes, writing full-capacity output
        buffers reused across iterations. No rid plane, no filter copies:
        sort-time working set = the already-resident flat stream + the two
        output buffers (16 B/entry, was ~32 with rid_all/rid_sorted/filter
        outputs) — it is the provisioning high-water the prefault must
        cover, not CPU, that bounds ≥50 Mb runs. A stable sort of the kept
        subsequence is byte-identical to filtering the stable sort (the
        legacy iter-2 path), so all golden gates hold. Returns
        (t, k, kept_max_b1d) with max None on a drop-signature cache hit,
        or None without the native lib."""
        from ..io.native import sort_stream_runs_native

        fa = stream_cache["flat_all"]
        drop = np.array([a.dropped or len(a) == 0 for a in alignseqs],
                        dtype=np.uint8)
        sig = drop.tobytes()
        if (stream_cache.get("sorted_dropsig") == sig
                and "t_sorted" in stream_cache):
            # same drop set as the previous iteration (e.g. phasing found
            # nothing new): the cached sorted prefix is still exact
            return (stream_cache["t_sorted"], stream_cache["k_sorted"], None)
        t_buf, k_buf = stream_cache.get("sort_bufs", (None, None))
        with stage("stream_sort"):
            res = sort_stream_runs_native(fa["t"], fa["k"], fa["aoff"],
                                          drop, n_pos, t_buf, k_buf)
        if res is None:
            return None
        t_s, k_s, maxd = res
        stream_cache["sort_bufs"] = (
            t_s.base if t_s.base is not None else t_s,
            k_s.base if k_s.base is not None else k_s)
        stream_cache["t_sorted"] = t_s
        stream_cache["k_sorted"] = k_s
        stream_cache["sorted_dropsig"] = sig
        return t_s, k_s, maxd

    fused = None
    sorted_future = (stream_cache.pop("sorted_future", None)
                     if stream_cache is not None else None)
    if sorted_future is not None:
        # segmented lookahead: anchors were precomputed from the UNSORTED
        # run stream (io.native.find_anchors_runs_native — bit-identical,
        # order-independent aggregates) and the sort still runs on its own
        # worker; the plan fires on_plan, THEN we block on the sort. The
        # next segment's scan therefore overlaps this segment's sort.
        t_sorted = k_sorted = None
    elif stream_cache is not None and "flat_all" in stream_cache:
        fused = _fused_sort()
    if sorted_future is not None:
        pass
    elif fused is not None:
        t_sorted, k_sorted, fmaxd = fused
        if fmaxd is not None and fmaxd >= (1 << 14):
            raise WindowOverflow(
                "delta overflow: insertion run >= 16384 columns")
    elif stream_cache is not None and "t_sorted" in stream_cache:
        with stage("stream_filter_iter2"):
            # no overflow re-check here: a later iteration's stream is a
            # subset of iteration 1's filtered stream, so its max delta can
            # only be <= the one already checked
            t_sorted, k_sorted = _filter_cached(consume=consume_cache)[:2]
    else:
        from_flat_all = False
        with stage("stream_collect"):
            if stream_cache is not None and "flat_all" in stream_cache:
                # zero-copy whole-contig stream from the native ingest (ref
                # pseudo-alignment first, every read in BAM order INCLUDING
                # clip-dropped ones — the post-sort filter below removes
                # them, exactly like iteration 2 removes phased-out reads)
                fa = stream_cache["flat_all"]
                t_all, k_all = fa["t"], fa["k"]
                lens = np.diff(fa["aoff"])
                rid_all = np.repeat(
                    np.arange(len(lens), dtype=np.int32), lens)
                from_flat_all = True
            elif flat_stream is not None:
                t_all, k_all, rid_all = flat_stream
            else:
                t_all, k_all, rid_all = _collect_stream(alignseqs)
        with stage("stream_sort"):
            sorted_res = sort_stream_native(t_all, k_all, rid_all, n_pos) \
                if len(t_all) else None
            if sorted_res is not None:
                t_sorted, k_sorted, rid_sorted, max_b1d = sorted_res
            else:
                k64 = k_all.view(np.uint32).astype(np.uint64)
                max_b1d = int((k64 >> np.uint64(16)).max()) if len(k64) else 0
                order = np.argsort(t_all, kind="stable")  # keeps per-col order
                t_sorted = t_all[order].astype(np.int32, copy=False)
                k_sorted = k_all[order]
                rid_sorted = rid_all[order]
        del t_all, k_all, rid_all  # release the unsorted copies before anchors
        if stream_cache is not None:
            stream_cache["t_sorted"] = t_sorted
            stream_cache["k_sorted"] = k_sorted
            stream_cache["rid_sorted"] = rid_sorted
        if from_flat_all:
            # the cache includes clip-dropped reads: filter them out for
            # THIS iteration too (stable, so slot order is unchanged). The
            # delta-overflow guard below uses the KEPT entries' max — a
            # clip-dropped read's pathological insertion run must not force
            # a whole-contig oracle fallback (it contributes nothing).
            with stage("stream_filter_iter1"):
                t_sorted, k_sorted, fmaxd = _filter_cached()
            if fmaxd is not None:
                max_b1d = fmaxd
        if max_b1d >= (1 << 14):
            # insertion runs >= 2^14 columns would overflow the i32 key packing;
            # absurd input — let the engine fall back to the oracle
            raise WindowOverflow("delta overflow: insertion run >= 16384 columns")

    with stage("find_anchors"):
        from ..io.native import find_anchors_native

        cached_anchors = (stream_cache or {}).pop("anchors", None)
        if sorted_future is not None and cached_anchors is None:
            raise AssertionError(
                "sorted_future requires precomputed anchors in the cache")
        if cached_anchors is not None:
            # precomputed by a segmented lookahead worker off the same
            # stream + drop mask (sorted or unsorted-runs form — both are
            # bit-identical; pipeline/segmented.py ingest task)
            anchors, colcnt = cached_anchors
        elif not len(t_sorted):
            anchors = np.zeros(n_pos, dtype=bool)
            colcnt = np.zeros(n_pos, dtype=np.int64)
        else:
            startcnt = _start_counts(alignseqs, n_pos)
            res = find_anchors_native(t_sorted, k_sorted, n_pos,
                                      ref_codes, startcnt)
            if res is not None:
                anchors, colcnt = res
            else:
                anchors, colcnt = find_anchors_stream(
                    t_sorted, k_sorted, startcnt, n_pos, ref_codes)
    if plan_end is None and plan_end_nominal is not None:
        amax = plan_end_max if plan_end_max is not None else n_pos - 1
        cand = np.nonzero(anchors[plan_start + 1 : amax + 1])[0] + plan_start + 1
        below = cand[cand <= plan_end_nominal]
        if len(below):
            plan_end = int(below[-1])
        elif len(cand):
            plan_end = int(cand[0])
        else:
            raise SegmentCutError(
                f"no cut anchor in ({plan_start}, {amax}]")
    with stage("plan_windows_greedy"):
        if plan_start or (plan_end is not None and plan_end != n_pos - 1):
            pe = n_pos - 1 if plan_end is None else plan_end
            sub = plan_windows(np.ascontiguousarray(anchors[plan_start:pe + 1]),
                               pe + 1 - plan_start, target)
            plan = WindowPlan(starts=sub.starts + plan_start,
                              ends=sub.ends + plan_start, anchors=anchors)
        else:
            plan = plan_windows(anchors, n_pos, target)
    nw = len(plan.starts)
    if on_plan is not None and nw:
        # the realized plan end (segment cut) is final — a segmented caller
        # can kick the next segment's scan NOW, before this segment's sort
        # (below) or aggregation/DP (engine) have finished
        on_plan(int(plan.ends[-1]))
    if sorted_future is not None:
        t_sorted, k_sorted = sorted_future.result()

    starts = plan.starts
    ends = plan.ends
    lead = np.maximum(starts - 2, 0)
    lo = np.searchsorted(t_sorted, lead.astype(np.int32)).astype(np.int64)
    hi = np.searchsorted(t_sorted, (ends + 1).astype(np.int32)).astype(np.int64)
    counts = hi - lo
    T = int(counts.max()) if nw else 0
    width = int((ends - starts).max()) + 3 if nw else 0  # +2 lead +1 inclusive

    return WindowBatch(
        plan=plan, n_windows=nw, width=width, stream_len=T,
        t_sorted=t_sorted, k_sorted=k_sorted, lo=lo, hi=hi,
        lead=lead.astype(np.int64),
        window_start=starts.astype(np.int64),
        window_len=(ends - starts + 1).astype(np.int32),
    )
