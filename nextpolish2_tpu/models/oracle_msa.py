"""Oracle MSA pileup + consensus DP + backtrack/LQ detection.

Faithful reimplementation of the reference 3-mer MSA graph and Viterbi consensus
(src/main.rs:33-268 Kmer/Msa, main.rs:576-589 update_msas, main.rs:1645-1687 DP,
main.rs:1555-1643 backtrack + LQ regions).

A 3-mer is keyed by (delta, bases) where bases packs two t_pos-equality flag bits
and three 4-bit base codes (main.rs:55-101). Per reference position the distinct
3-mers are kept in first-occurrence order, then stably sorted by the delta of their
third base (Msa::sort, main.rs:227-229) — this ordering is semantically load-bearing
for DP tie-breaking and in-position dependency order.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from .oracle_align import AlignTags

NEG_INF = -(2**62)  # i64::MIN >> 1 equivalent guard (main.rs:1661)
HEAD_Q = 15


def _b3_delta(flags: int, delta: int) -> int:
    """delta of the third base, used as the Msa sort key (Kmer::bases, main.rs:105-184)."""
    if flags & 0b0101 == 0b0101:
        return delta + 2
    if flags & 0b0001:
        return 1
    return 0


def _decode(flags: int, delta: int, q1: int, q2: int, q3: int, p: int):
    """Kmer::bases(p): the three (t_pos, delta, q_base) bases (main.rs:105-184)."""
    if flags & 0b0101 == 0b0101:  # A--
        return (p, delta, q1), (p, delta + 1, q2), (p, delta + 2, q3)
    if flags & 0b0001:  # AA-
        return (p - 1, delta, q1), (p, 0, q2), (p, 1, q3)
    if flags & 0b0100:  # A-A
        return (p - 1, delta, q1), (p - 1, delta + 1, q2), (p, 0, q3)
    return (p - 2, delta, q1), (p - 1, 0, q2), (p, 0, q3)  # AAA


@dataclass
class Msas:
    """Column-major MSA: for each reference position, its distinct 3-mers."""

    n_pos: int
    # per position: parallel lists (sorted per Msa::sort order)
    deltas: List[np.ndarray]
    flags: List[np.ndarray]
    q1: List[np.ndarray]
    q2: List[np.ndarray]
    q3: List[np.ndarray]
    counts: List[np.ndarray]
    coverage: np.ndarray  # int64 per position (Msa::coverage, main.rs:232-241)


def kmer_stream(a: AlignTags, raw: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """One alignment -> its (t_pos, key) 3-mer observation stream.

    key packs (b1.delta:u16 | flags:4 | q1:4 | q2:4 | q3:4) exactly like Kmer::new
    (main.rs:84-101); the stream is what update_msas pushes (main.rs:576-589).
    Shared by the oracle MSA builder and the TPU window planner.

    raw=True returns int32 keys (the u32 bit pattern; zero-copy for the
    native-cached path) instead of uint64.
    """
    if a.kkey is not None:  # native extraction cached the keys
        if raw:
            return a.t_pos, a.kkey
        return a.t_pos, a.kkey.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    n = len(a)
    t = a.t_pos
    d = a.delta
    q = a.q_base.astype(np.uint32)
    head_t = a.aln_t_s - 1
    # b1/b2 shifted streams with two virtual heads (update_msas, main.rs:579-581)
    b1_t = np.empty(n, dtype=np.int64)
    b1_d = np.empty(n, dtype=np.int64)
    b1_q = np.empty(n, dtype=np.uint32)
    b2_t = np.empty(n, dtype=np.int64)
    b2_q = np.empty(n, dtype=np.uint32)
    b1_t[2:] = t[:-2]
    b1_d[2:] = d[:-2]
    b1_q[2:] = q[:-2]
    b2_t[1:] = t[:-1]
    b2_q[1:] = q[:-1]
    b1_t[0] = head_t
    b1_d[0] = 0
    b1_q[0] = HEAD_Q
    if n > 1:
        b1_t[1] = head_t
        b1_d[1] = 1
        b1_q[1] = HEAD_Q
    b2_t[0] = head_t
    b2_q[0] = HEAD_Q
    flag = ((b2_t == b1_t).astype(np.uint32) << 2) | (b2_t == t).astype(np.uint32)
    key = (
        (b1_d.astype(np.uint64) << np.uint64(16))
        | (flag.astype(np.uint64) << np.uint64(12))
        | (b1_q.astype(np.uint64) << np.uint64(8))
        | (b2_q.astype(np.uint64) << np.uint64(4))
        | q.astype(np.uint64)
    )
    if raw:
        # saturate the u16 delta field so the >=2^14 overflow guard still fires
        # after truncation to 32 bits
        key = np.where(b1_d > 0xFFFF,
                       key | np.uint64(0xFFFF0000), key)
        return t, key.astype(np.uint32).view(np.int32)
    return t, key


def build_msas(alignseqs: List[AlignTags], n_pos: int) -> Msas:
    """update_msas over all non-dropped alignments (main.rs:576-589), vectorized.

    Produces per-position kmer lists in first-occurrence order stably sorted by
    b3-delta, with occurrence counts.
    """
    pos_chunks = []
    key_chunks = []
    for a in alignseqs:
        if a.dropped or len(a) == 0:
            continue
        t, key = kmer_stream(a)
        pos_chunks.append(t)
        key_chunks.append(key)

    if not pos_chunks:
        empty = [np.zeros(0, dtype=np.int64) for _ in range(n_pos)]
        z = lambda: [np.zeros(0, dtype=np.int64) for _ in range(n_pos)]  # noqa: E731
        return Msas(n_pos, z(), z(), z(), z(), z(), z(), np.zeros(n_pos, dtype=np.int64))

    pos_all = np.concatenate(pos_chunks)
    key_all = np.concatenate(key_chunks)
    comb = (pos_all.astype(np.uint64) << np.uint64(32)) | key_all
    uniq, first_idx, counts = np.unique(comb, return_index=True, return_counts=True)
    upos = (uniq >> np.uint64(32)).astype(np.int64)
    ukey = uniq & np.uint64(0xFFFFFFFF)
    udelta = (ukey >> np.uint64(16)).astype(np.int64)
    uflag = ((ukey >> np.uint64(12)) & np.uint64(0xF)).astype(np.int64)
    uq1 = ((ukey >> np.uint64(8)) & np.uint64(0xF)).astype(np.int64)
    uq2 = ((ukey >> np.uint64(4)) & np.uint64(0xF)).astype(np.int64)
    uq3 = (ukey & np.uint64(0xF)).astype(np.int64)
    b3d = np.where(uflag & 0b0101 == 0b0101, udelta + 2, np.where(uflag & 1 == 1, 1, 0))
    # order: position, then b3-delta, then first occurrence (stable Msa::sort)
    order = np.lexsort((first_idx, b3d, upos))
    upos = upos[order]
    udelta = udelta[order]
    uflag = uflag[order]
    uq1, uq2, uq3 = uq1[order], uq2[order], uq3[order]
    counts = counts[order].astype(np.int64)
    b3d = b3d[order]

    bounds = np.searchsorted(upos, np.arange(n_pos + 1))
    deltas, flags_l, q1l, q2l, q3l, cl = [], [], [], [], [], []
    coverage = np.zeros(n_pos, dtype=np.int64)
    cov_all = np.where(b3d == 0, counts, 0)
    cov_sums = np.concatenate([[0], np.cumsum(cov_all)])
    for p in range(n_pos):
        lo, hi = bounds[p], bounds[p + 1]
        deltas.append(udelta[lo:hi])
        flags_l.append(uflag[lo:hi])
        q1l.append(uq1[lo:hi])
        q2l.append(uq2[lo:hi])
        q3l.append(uq3[lo:hi])
        cl.append(counts[lo:hi])
        coverage[p] = cov_sums[hi] - cov_sums[lo]
    return Msas(n_pos, deltas, flags_l, q1l, q2l, q3l, cl, coverage)


@dataclass
class Consensus:
    """Array-based consensus: parallel (pos, base) arrays in genome order.

    Replaces the reference's per-base `Vec<ConsensusBase>` (main.rs:591-596)
    — the array form makes splicing/flank extraction O(segments) numpy ops
    instead of per-object Python (the round-1 scale blocker).

    Invariant: pos is nondecreasing (insertions repeat a position)."""

    pos: np.ndarray   # int64 genome positions, nondecreasing
    base: np.ndarray  # uint8 ASCII bytes

    def __len__(self) -> int:
        return len(self.pos)

    def to_bytes(self) -> bytes:
        return self.base.tobytes()


@dataclass
class LqRegion:
    """An LQ interval (LqSeqs coordinates): start <= end genome positions."""

    start: int
    end: int
    label: int = 0
    sudoseed: bytes = b""
    seqs: list = None  # List[LqSeq], filled by allele extraction

    def __post_init__(self):
        if self.seqs is None:
            self.seqs = []


def consensus_dp(msas: Msas) -> tuple[List[np.ndarray], List[np.ndarray], Tuple[int, int]]:
    """Forward Viterbi over the 3-mer graph (get_cns_from_align_tags, main.rs:1645-1687).

    Returns (scores per position, besti per position, global best (pos, kmer_idx)).
    """
    n = msas.n_pos
    scores: List[np.ndarray] = [None] * n  # type: ignore[list-item]
    bestis: List[np.ndarray] = [None] * n  # type: ignore[list-item]
    gb_score = 0  # Default Kmer has score 0 (main.rs:1651)
    gb = (-1, -1)
    for p in range(n):
        kd = msas.deltas[p]
        kf = msas.flags[p]
        k1 = msas.q1[p]
        k2 = msas.q2[p]
        k3 = msas.q3[p]
        kc = msas.counts[p]
        m = len(kd)
        sc = np.empty(m, dtype=np.int64)
        bi = np.zeros(m, dtype=np.int64)
        # publish before filling: in-position predecessors (insertion chains) read
        # scores of earlier-sorted kmers at this same position (Cell in reference)
        scores[p] = sc
        bestis[p] = bi
        cov = msas.coverage[p]
        for i in range(m):
            b1, b2, _b3 = _decode(int(kf[i]), int(kd[i]), int(k1[i]), int(k2[i]), int(k3[i]), p)
            gain = 10 * int(kc[i]) - 4 * int(cov)
            if b2[2] == HEAD_Q:
                s = gain
            else:
                s = NEG_INF
                besti = 0
                pt = b2[0]
                pd_, pf_, p1_, p2_, p3_ = (
                    msas.deltas[pt], msas.flags[pt], msas.q1[pt], msas.q2[pt], msas.q3[pt],
                )
                psc = scores[pt]
                low8 = (b1[2] << 4) | b2[2]
                d23 = 1 if b1[0] == b2[0] else 0
                for j in range(len(pd_)):
                    # prefilter then full check (Msa::get, main.rs:209-225)
                    if (int(p2_[j]) << 4 | int(p3_[j])) != low8:
                        continue
                    if int(pf_[j]) & 1 != d23:
                        continue
                    v1, v2, v3 = _decode(
                        int(pf_[j]), int(pd_[j]), int(p1_[j]), int(p2_[j]), int(p3_[j]), pt
                    )
                    if v2 != b1 or v3 != b2:
                        continue
                    if pt >= 3 and v1[2] == HEAD_Q:
                        # prevent backtracking into a read-start head (main.rs:1664-1668)
                        continue
                    cand = int(psc[j]) + gain
                    if cand > s or (cand == s and v1[2] != 4):
                        s = cand
                        besti = j
                bi[i] = besti
            sc[i] = s
            if p == n - 1 and s >= gb_score:
                gb_score = s
                gb = (p, i)
    return scores, bestis, gb


def lq_from_stream(pos: np.ndarray, base: np.ndarray, cnt: np.ndarray,
                   cov: np.ndarray, hq_min_qv: int = 95, lq_min_length: int = 2,
                   ) -> tuple[Consensus, List[LqRegion]]:
    """LQ-region detection over the REVERSED backtrack stream
    (generate_cns_from_best_score_lq inline state machine, main.rs:1573-1637).

    pos/base/cnt/cov are parallel arrays in reverse genome order (the order the
    backtrack walk emits). Returns (genome-order Consensus, LQ regions in
    DESCENDING genome order).
    """
    qv = np.where(cov > 0,
                  cnt.astype(np.int64) * 100 // np.maximum(cov, 1), 0)
    lowcov = cov < 2
    return lq_from_qv_stream(pos, base, qv, lowcov, hq_min_qv, lq_min_length)


def lq_from_qv_stream(pos: np.ndarray, base: np.ndarray, qv: np.ndarray,
                      lowcov: np.ndarray, hq_min_qv: int = 95,
                      lq_min_length: int = 2,
                      ) -> tuple[Consensus, List[LqRegion]]:
    """lq_from_stream over precomputed per-position qv + coverage<2 flags.

    The TPU engine emits qv (= count*100 // coverage, <= 100, u8) and the
    lowcov bit straight from the device backtrack — the only two facts the
    LQ state machine reads — instead of pulling 2x u16 count/coverage
    columns over the tunnel (engine.py / ops.consensus.backtrack).

    Event-driven equivalent of the reference's per-base scan: state only
    changes at low-coverage / low-qv positions and at the first qualifying
    close position after an LQ run, so the loop jumps between those events
    (all precomputed vectorized) instead of walking every base.
    """
    n = len(pos)
    lqseqs: List[LqRegion] = []
    if n:
        L = lq_min_length
        lowcov = np.asarray(lowcov, dtype=bool)
        lowqv = ~lowcov & (qv < hq_min_qv)
        ev_i = np.nonzero(lowcov | lowqv)[0]
        ev_low = lowqv[ev_i]
        # diff[i]: entries i and i+1 differ in BOTH pos and base
        diff = (pos[1:] != pos[:-1]) & (base[1:] != base[:-1])
        # close candidates: p >= 2 with cb[p-1] != cb[p-2] (both fields)
        close_idx = np.nonzero(diff)[0] + 2
        # backscan stop: largest j <= x with j <= 1 or diff[j-1]
        goodmask = np.empty(n, dtype=bool)
        goodmask[:2] = True
        if n > 2:
            goodmask[2:] = diff[1:]
        lastgood = np.maximum.accumulate(
            np.where(goodmask, np.arange(n, dtype=np.int64), 0))

        lq_s: Optional[int] = None
        lq_e = 0
        n_ev = len(ev_i)
        k = 0
        while k <= n_ev:
            nxt = int(ev_i[k]) if k < n_ev else n
            if lq_s is not None:
                # first HQ position after the run that closes it (main.rs:1586)
                lo = lq_e + 2 * L + 1
                j = int(np.searchsorted(close_idx, lo))
                if j < len(close_idx) and close_idx[j] < nxt:
                    pc = int(close_idx[j])
                    ce = pc - 2
                    cs = lq_s - L if lq_s > L else 1
                    cs = int(lastgood[cs])
                    # regions accumulate in descending genome order;
                    # overlapping ones merge (main.rs:1612-1622)
                    if lqseqs and pos[cs] >= lqseqs[-1].start:
                        lqseqs[-1].start = int(pos[ce])
                    else:
                        lqseqs.append(LqRegion(start=int(pos[ce]),
                                               end=int(pos[cs])))
                    lq_s = None
            if k == n_ev:
                break
            if ev_low[k]:
                if lq_s is None:
                    lq_s = int(ev_i[k])
                lq_e = int(ev_i[k])
            else:  # coverage < 2 resets the run (main.rs:1578-1580)
                lq_s = None
            k += 1

    return Consensus(pos=pos[::-1].copy(),
                     base=base[::-1].astype(np.uint8)), lqseqs


def backtrack_lq(msas: Msas, bestis: List[np.ndarray], gb: Tuple[int, int],
                 hq_min_qv: int = 95, lq_min_length: int = 2,
                 ) -> tuple[Consensus, List[LqRegion]]:
    """Backtrack emitting consensus bases + detect LQ regions
    (generate_cns_from_best_score_lq, main.rs:1555-1643).

    Returns (genome-order Consensus, LQ regions in DESCENDING genome order).
    """
    from ..utils.seqcodes import CODE2ASCII as _C2A

    if gb[0] < 0:
        z64 = np.zeros(0, dtype=np.int64)
        return Consensus(pos=z64, base=np.zeros(0, dtype=np.uint8)), []
    cur_pos, ki = gb
    s_pos: List[int] = []
    s_base: List[int] = []
    s_cnt: List[int] = []
    s_cov: List[int] = []

    def kmer_fields(pos, i):
        return (
            int(msas.flags[pos][i]), int(msas.deltas[pos][i]),
            int(msas.q1[pos][i]), int(msas.q2[pos][i]), int(msas.q3[pos][i]),
            int(msas.counts[pos][i]),
        )

    kf, kd, kq1, kq2, kq3, kc = kmer_fields(cur_pos, ki)
    _, base2, base3 = _decode(kf, kd, kq1, kq2, kq3, cur_pos)
    while True:
        if base3[2] != 4:  # gaps are skipped (main.rs:1575)
            s_pos.append(base3[0])
            s_base.append(int(_C2A[base3[2]]))
            s_cnt.append(kc)
            s_cov.append(int(msas.coverage[base3[0]]))

        if base2[2] == HEAD_Q:
            break
        # step to best predecessor: besti indexes msas[base2.t_pos] (main.rs:1632-1633)
        nxt_pos = base2[0]
        nxt_ki = int(bestis[cur_pos][ki])
        kf, kd, kq1, kq2, kq3, kc = kmer_fields(nxt_pos, nxt_ki)
        _, base2, base3 = _decode(kf, kd, kq1, kq2, kq3, nxt_pos)
        cur_pos, ki = nxt_pos, nxt_ki

    return lq_from_stream(
        np.array(s_pos, dtype=np.int64), np.array(s_base, dtype=np.uint8),
        np.array(s_cnt, dtype=np.int64), np.array(s_cov, dtype=np.int64),
        hq_min_qv, lq_min_length)
