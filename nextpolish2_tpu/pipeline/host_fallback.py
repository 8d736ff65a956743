"""Per-window host DP fallback for windows exceeding device static bounds.

A handful of columns per genome are pathological (structural-variant pileups with
thousands of distinct 3-mers and kilobase insertion runs — e.g. 7k slots observed
on the bundled test contig). The dense [W, K] device layout cannot cover them
economically; windows containing them run here instead, with identical semantics:
variable-length slot lists, no delta-level cap, anchor seeding, same tie rules.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

NEG_INF = -(1 << 40)  # int64 host scores; larger margin than the device's i32
HEAD_Q = 15


def _decode(key: int, col: int):
    """(b1key, b2key, b2q, q3) with bkey = (t, delta, q) tuples."""
    flags = (key >> 12) & 0xF
    delta = (key >> 16) & 0xFFFF
    q1 = (key >> 8) & 0xF
    q2 = (key >> 4) & 0xF
    q3 = key & 0xF
    if flags & 0b0101 == 0b0101:
        b1 = (col, delta, q1)
        b2 = (col, delta + 1, q2)
    elif flags & 0b0001:
        b1 = (col - 1, delta, q1)
        b2 = (col, 0, q2)
    elif flags & 0b0100:
        b1 = (col - 1, delta, q1)
        b2 = (col - 1, delta + 1, q2)
    else:
        b1 = (col - 2, delta, q1)
        b2 = (col - 1, 0, q2)
    return b1, b2, q2, q3


def _b3d(key: int) -> int:
    flags = (key >> 12) & 0xF
    if flags & 0b0101 == 0b0101:
        return ((key >> 16) & 0xFFFF) + 2
    return 1 if flags & 1 else 0


def host_window_dp(cols: np.ndarray, keys: np.ndarray, width: int,
                   lead_abs: int, last_col: int, seed_anchor: bool,
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One window's stream -> reversed emission arrays (col, q3, count,
    coverage) + best score.

    The native twin (np2_host_window_dp, hash-bucketed predecessor lookup)
    handles the hot path; host_window_dp_py below is the executable spec and
    the fallback for windows outside native bounds. Differential-tested in
    tests/test_native.py.
    """
    from ..io.native import host_window_dp_native

    res = host_window_dp_native(cols, keys, width, lead_abs, last_col,
                                seed_anchor)
    if res is not None:
        return res
    return host_window_dp_py(cols, keys, width, lead_abs, last_col,
                             seed_anchor)


def host_window_dp_py(cols: np.ndarray, keys: np.ndarray, width: int,
                      lead_abs: int, last_col: int, seed_anchor: bool,
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pure-Python spec: mirrors ops.consensus.{aggregate_windows,
    consensus_dp, backtrack} without static slot/level caps. cols/keys: the
    window's valid stream entries.
    """
    packed = (cols.astype(np.int64) << 32) | keys.astype(np.int64)
    uniq, first_idx, counts = np.unique(packed, return_index=True,
                                        return_counts=True)
    ucol = (uniq >> 32).astype(np.int64)
    ukey = (uniq & 0xFFFFFFFF).astype(np.int64)
    ub3d = np.array([_b3d(int(k)) for k in ukey])
    order = np.lexsort((first_idx, ub3d, ucol))
    ucol, ukey, ub3d, counts = ucol[order], ukey[order], ub3d[order], counts[order]

    # per-column slot lists
    col_slots: List[List[int]] = [[] for _ in range(width)]
    for i in range(len(ucol)):
        col_slots[int(ucol[i])].append(i)
    coverage = np.zeros(width, dtype=np.int64)
    np.add.at(coverage, ucol[ub3d == 0], counts[ub3d == 0])

    n = len(ucol)
    score = np.full(n, NEG_INF, dtype=np.int64)
    besti = np.zeros(n, dtype=np.int64)  # local slot index within pred column
    dec = [_decode(int(ukey[i]), int(ucol[i])) for i in range(n)]

    for c in range(width):
        slots = col_slots[c]
        if not slots:
            continue
        cov = int(coverage[c])
        for si, i in enumerate(slots):
            b1, b2, q2, _ = dec[i]
            gain = 10 * int(counts[i]) - 4 * cov
            if q2 == HEAD_Q:
                score[i] = gain
                continue
            pt = b2[0]
            if pt < 0 or pt >= width:
                continue  # stays NEG_INF
            best = NEG_INF
            bj = 0
            pool = col_slots[pt]
            for j_local, j in enumerate(pool):
                vb1, vb2, _, vq3 = dec[j]
                # predecessor's (b2, b3) must equal our (b1, b2)
                if vb2 != b1:
                    continue
                if (pt, _b3d(int(ukey[j])), vq3) != b2:
                    continue
                if pt + lead_abs >= 3 and vb1[2] == HEAD_Q:
                    continue
                cand = int(score[j]) + gain
                if cand > best or (cand == best and vb1[2] != 4):
                    best = cand
                    bj = j_local
            score[i] = best
            besti[i] = bj
        if seed_anchor and c == 2:
            for i in slots:
                score[i] = 0

    # backtrack: last-max slot at last_col
    slots = col_slots[last_col]
    assert slots, "empty final column"
    vals = [int(score[i]) for i in slots]
    mx = max(vals)
    si = max(k for k, v in enumerate(vals) if v == mx)
    c, i = last_col, slots[si]
    out_col, out_q3, out_cnt, out_cov = [], [], [], []
    while True:
        b1, b2, q2, q3 = dec[i]
        if q3 != 4:
            out_col.append(c)
            out_q3.append(q3)
            out_cnt.append(int(counts[i]))
            out_cov.append(int(coverage[c]))
        if q2 == HEAD_Q or (seed_anchor and c == 2):
            break
        nc = b2[0]
        if nc < 0:
            break
        i = col_slots[nc][int(besti[i])]
        c = nc
    return (np.array(out_col, dtype=np.int64), np.array(out_q3, dtype=np.int64),
            np.array(out_cnt, dtype=np.int64), np.array(out_cov, dtype=np.int64),
            mx)
