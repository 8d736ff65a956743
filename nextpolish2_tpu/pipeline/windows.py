"""Window planner: split a contig into anchor-bounded windows for device DP.

The reference runs one global Viterbi per contig (main.rs:1645-1687). We split at
ANCHOR columns — positions where every covering read agrees exactly with zero
insertions over a 3-column context and no read starts nearby — so the optimal path
is forced through the single surviving 3-mer and the DP decomposes exactly:
window-local DP + anchor-pinned boundary == whole-contig DP (additive scores).

This windowing is the TPU-native replacement for one-thread-per-contig parallelism
(SURVEY §2 'Intra-contig parallelism: none'): windows are the batched device unit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..models.oracle_align import AlignTags
from ..models.oracle_msa import kmer_stream


class WindowOverflow(Exception):
    """A window exceeded static device bounds; caller falls back to the oracle."""


@dataclass
class WindowPlan:
    starts: np.ndarray        # absolute first column of each window (anchor or 0)
    ends: np.ndarray          # absolute last column (inclusive; anchor or n-1)
    anchors: np.ndarray       # bool per column


@dataclass
class WindowBatch:
    """Per-window kmer streams: flat (win, col, key) arrays + window metadata.

    Flat layout avoids materializing [n_windows, T_max] padded copies on the
    throttled host; the padded view (needed by the device-sort aggregation path)
    is built lazily via `padded()`.
    """

    plan: WindowPlan
    n_windows: int
    width: int                       # max columns per window (incl. 2 lead cols)
    stream_len: int                  # T: max per-window stream length
    flat_win: np.ndarray             # int32 [N] window id per stream entry
    flat_col: np.ndarray             # int32 [N] relative col (0 = window_start-2)
    flat_key: np.ndarray             # int32 [N] packed kmer key
    n_tags: np.ndarray               # int64 [n_windows]
    window_start: np.ndarray         # int64 [n_windows] absolute start col
    window_len: np.ndarray           # int32 [n_windows] = end - start + 1
    anchor_key: np.ndarray           # int32 [n_windows] synthesized anchor kmer key
    anchor_count: np.ndarray         # int32 [n_windows]

    def padded(self) -> tuple[np.ndarray, np.ndarray]:
        """[n_windows, T] (cols, keys) with pad col == width (device-agg path)."""
        nw, T = self.n_windows, self.stream_len
        cols = np.full((nw, T), self.width, dtype=np.int32)
        keys = np.zeros((nw, T), dtype=np.int32)
        off = np.concatenate([[0], np.cumsum(self.n_tags)])
        for w in range(nw):
            n = int(self.n_tags[w])
            cols[w, :n] = self.flat_col[off[w] : off[w] + n]
            keys[w, :n] = self.flat_key[off[w] : off[w] + n]
        return cols, keys

    def window_stream(self, w: int) -> tuple[np.ndarray, np.ndarray]:
        off = int(np.sum(self.n_tags[:w]))
        n = int(self.n_tags[w])
        return self.flat_col[off : off + n], self.flat_key[off : off + n]


def find_anchors(alignseqs: List[AlignTags], n_pos: int,
                 ref_codes: np.ndarray) -> np.ndarray:
    """Anchor mask: columns t where cols t-2..t are pure (all tags match ref with
    delta 0, coverage >= 2) and no alignment starts at t-1 or t."""
    startcnt = np.zeros(n_pos, dtype=np.int64)
    t_parts = []
    ok_parts = []
    for a in alignseqs:
        if a.dropped or len(a) == 0:
            continue
        t_parts.append(a.t_pos)
        ok_parts.append((a.delta == 0) & (a.q_base == ref_codes[a.t_pos]))
        startcnt[a.aln_t_s] += 1
    if not t_parts:
        return np.zeros(n_pos, dtype=bool)
    t_all = np.concatenate(t_parts)
    ok_all = np.concatenate(ok_parts)
    colcnt = np.bincount(t_all, minlength=n_pos)
    matchcnt = np.bincount(t_all[ok_all], minlength=n_pos)
    pure = (colcnt >= 2) & (matchcnt == colcnt)
    anchors = np.zeros(n_pos, dtype=bool)
    if n_pos >= 3:
        anchors[2:] = pure[2:] & pure[1:-1] & pure[:-2]
        anchors[2:] &= (startcnt[2:] == 0) & (startcnt[1:-1] == 0)
    return anchors


def plan_windows(anchors: np.ndarray, n_pos: int, target: int = 1024) -> WindowPlan:
    """Greedy split: each window ends at the last anchor within `target` columns
    of its start (or stretches to the next anchor / contig end)."""
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
                   use_native: bool = True):
    """Host (numpy) pileup aggregation: per-window (col, key) streams ->
    [B, width, K] slot tables + coverage, in the reference's slot order
    (stable by (b3-delta, first occurrence); Msa::push + Msa::sort semantics).

    Same result as ops.consensus.aggregate_windows; exists because XLA's TPU sort
    compile blows up for streams >~100k entries, while this is a single numpy
    sort over the concatenated streams. Also the template for the future C++
    pileup extractor. Returns (key_tab, cnt_tab, coverage, n_slots, overflow).

    win_lo/win_hi select a window subrange (fixed-size device chunks); window w
    maps to row w - win_lo.
    """
    if win_hi is None:
        win_hi = wb.n_windows
    B = n_windows if n_windows is not None else (win_hi - win_lo)
    W = width if width is not None else wb.width
    # flat arrays are window-major (build_window_batch concatenates in window
    # order), so a chunk is a contiguous slice
    lo = int(np.searchsorted(wb.flat_win, win_lo, side="left"))
    hi = int(np.searchsorted(wb.flat_win, win_hi - 1, side="right"))
    if use_native:
        from ..io.native import aggregate2_native

        # the flat stream is already grouped by (win, col) with in-column
        # first-occurrence order, so no packing or sorting is needed
        res = aggregate2_native(wb.flat_win[lo:hi], wb.flat_col[lo:hi],
                                wb.flat_key[lo:hi], win_lo, B, W, K)
        if res is not None:
            return res
    w_flat = wb.flat_win[lo:hi].astype(np.int64) - win_lo
    c_flat = wb.flat_col[lo:hi].astype(np.int64)
    k_flat = wb.flat_key[lo:hi].astype(np.int64) & 0xFFFFFFFF
    # pack (win, col, key): win<2^19, col<2^13, key<2^32
    packed = (w_flat << 45) | (c_flat << 32) | k_flat
    uniq, first_idx, counts = np.unique(packed, return_index=True,
                                        return_counts=True)
    uw = uniq >> 45
    uc = (uniq >> 32) & 0x1FFF
    uk = uniq & 0xFFFFFFFF
    uflag = (uk >> 12) & 0xF
    udelta = (uk >> 16) & 0xFFFF
    ub3d = np.where(uflag & 0b0101 == 0b0101, udelta + 2,
                    np.where(uflag & 1 == 1, 1, 0))
    order = np.lexsort((first_idx, ub3d, uc, uw))
    uw, uc, uk, ub3d, counts = uw[order], uc[order], uk[order], ub3d[order], counts[order]
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
    cnt_tab[kw, kc, kr] = counts[keep].astype(np.int32)
    coverage = np.zeros((B, W), dtype=np.int32)
    d0 = keep & (ub3d == 0)
    np.add.at(coverage, (uw[d0], uc[d0]), counts[d0].astype(np.int32))
    n_slots = np.zeros((B, W), dtype=np.int32)
    np.add.at(n_slots, (kw, kc), 1)
    return key_tab, cnt_tab, coverage, n_slots, overflow


def build_window_batch(alignseqs: List[AlignTags], n_pos: int,
                       ref_codes: np.ndarray,
                       target: int = 1024,
                       stream_cache: Optional[dict] = None) -> WindowBatch:
    """Plan windows and extract padded per-window (col, key) streams.

    Window w's stream holds observations with t_pos in [start-2, end]; kmers at
    relative cols 0,1 (= start-2, start-1) exist only to be discarded on device,
    col 2 (= the anchor) is replaced by the synthesized anchor kmer.

    stream_cache: dict persisted across phasing iterations — the sorted global
    stream is computed once; later iterations mask out dropped reads' entries
    (stable-sorted order is preserved by filtering).
    """
    anchors = find_anchors(alignseqs, n_pos, ref_codes)
    plan = plan_windows(anchors, n_pos, target)
    nw = len(plan.starts)

    from ..io.native import sort_stream_native, window_stream_native

    if stream_cache is not None and "t_sorted" in stream_cache:
        drop = np.array([a.dropped or len(a) == 0 for a in alignseqs])
        keep = ~drop[stream_cache["rid_sorted"]]
        t_sorted = stream_cache["t_sorted"][keep]
        k_sorted = stream_cache["k_sorted"][keep]
    else:
        # full streams once; windows slice them
        t_all_parts = []
        k_all_parts = []
        rid_parts = []
        for rid, a in enumerate(alignseqs):
            if a.dropped or len(a) == 0:
                continue
            t, k = kmer_stream(a, raw=True)
            t_all_parts.append(t)
            k_all_parts.append(k)
            rid_parts.append(np.full(len(t), rid, dtype=np.int32))
        t_all = np.concatenate(t_all_parts) if t_all_parts else np.zeros(0, np.int64)
        k_all = np.concatenate(k_all_parts) if k_all_parts else np.zeros(0, np.int32)
        rid_all = np.concatenate(rid_parts) if rid_parts else np.zeros(0, np.int32)
        sorted_res = sort_stream_native(t_all, k_all, rid_all, n_pos) \
            if len(t_all) else None
        if sorted_res is not None:
            t_sorted, k_sorted, rid_sorted, max_b1d = sorted_res
        else:
            k64 = k_all.view(np.uint32).astype(np.uint64)
            max_b1d = int((k64 >> np.uint64(16)).max()) if len(k64) else 0
            order = np.argsort(t_all, kind="stable")  # stable: keeps per-col order
            t_sorted = t_all[order]
            k_sorted = k_all[order]
            rid_sorted = rid_all[order]
        if max_b1d >= (1 << 14):
            # insertion runs >= 2^14 columns would overflow the i32 key packing;
            # absurd input — let the engine fall back to the oracle
            raise WindowOverflow("delta overflow: insertion run >= 16384 columns")
        if stream_cache is not None:
            stream_cache["t_sorted"] = t_sorted
            stream_cache["k_sorted"] = k_sorted
            stream_cache["rid_sorted"] = rid_sorted

    starts = plan.starts
    ends = plan.ends
    lead = np.maximum(starts - 2, 0)
    lo = np.searchsorted(t_sorted, lead)
    hi = np.searchsorted(t_sorted, ends + 1)
    counts = (hi - lo).astype(np.int64)
    T = int(counts.max()) if nw else 0
    width = int((ends - starts).max()) + 3 if nw else 0  # +2 lead +1 inclusive

    # flat (win, col, key) arrays; adjacent windows duplicate their 3 shared
    # columns' entries (different relative cols), a negligible overhead
    native_ws = window_stream_native(t_sorted, k_sorted, lo, hi, lead) if nw \
        else None
    if native_ws is not None:
        flat_win, flat_col, flat_key = native_ws
    else:
        idx = np.concatenate([np.arange(lo[w], hi[w]) for w in range(nw)]) if nw \
            else np.zeros(0, dtype=np.int64)
        flat_win = np.repeat(np.arange(nw, dtype=np.int32), counts)
        flat_col = (t_sorted[idx] - lead[flat_win]).astype(np.int32)
        flat_key = k_sorted[idx].astype(np.int32)

    # anchor kmer: (ref[t-2], ref[t-1], ref[t]) with deltas 0 -> flags 0,
    # b1.delta 0; count = column coverage at the anchor
    colcnt = np.bincount(t_sorted, minlength=n_pos)
    anchor_key = np.zeros(nw, dtype=np.int32)
    anchor_count = np.zeros(nw, dtype=np.int32)
    interior = starts > 0
    sidx = starts[interior]
    anchor_key[interior] = (
        (ref_codes[sidx - 2].astype(np.int32) << 8)
        | (ref_codes[sidx - 1].astype(np.int32) << 4)
        | ref_codes[sidx].astype(np.int32))
    anchor_count[interior] = colcnt[sidx]
    return WindowBatch(
        plan=plan, n_windows=nw, width=width, stream_len=T,
        flat_win=flat_win, flat_col=flat_col, flat_key=flat_key,
        n_tags=counts,
        window_start=starts.astype(np.int64),
        window_len=(ends - starts + 1).astype(np.int32),
        anchor_key=anchor_key, anchor_count=anchor_count,
    )
