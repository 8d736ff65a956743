"""Device consensus engine: batched window pileup aggregation + Viterbi DP +
backtrack (XLA/jnp implementation; the Pallas fast path lives in ops/consensus_pallas).

Replaces the reference's two hottest loops (SURVEY §3 hot loops 1-2: update_msas
main.rs:576-589 and the consensus DP main.rs:1645-1687) with batched device compute
over anchor-bounded windows:

  1. aggregate: sort-based dedup of (col, key) 3-mer observations into [B, W, K]
     slot tables with counts, preserving the reference's exact slot ordering
     (stable by (b3-delta, first occurrence)) — the order is load-bearing for DP
     tie-breaks.
  2. dp: per column, masked max-plus over candidate predecessors with the
     reference's tie rule (score strictly greater, or equal and predecessor's
     first base is a non-gap — main.rs:1670).
  3. backtrack: batched pointer walk emitting (col, base, count, coverage).

Scores are int32 (window-local sums fit comfortably; the reference uses i64 only
because its sums span whole contigs).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -(1 << 30)
HEAD_Q = 15


class SlotTables(NamedTuple):
    key: jnp.ndarray        # i32 [B, W, K] packed kmer key (-1 = empty slot)
    count: jnp.ndarray      # i32 [B, W, K]
    coverage: jnp.ndarray   # i32 [B, W]
    n_slots: jnp.ndarray    # i32 [B, W]
    overflow: jnp.ndarray   # bool [B]  (slot overflow or delta-level overflow)


def _b3d_from_key(key):
    flags = (key >> 12) & 0xF
    delta = (key >> 16) & 0xFFFF
    return jnp.where((flags & 0b0101) == 0b0101, delta + 2,
                     jnp.where((flags & 1) == 1, 1, 0))


@functools.partial(jax.jit, static_argnames=("width", "K"))
def aggregate_windows(cols: jnp.ndarray, keys: jnp.ndarray, width: int, K: int
                      ) -> SlotTables:
    """[B, T] (col, key) streams -> per-column slot tables.

    Padding convention: col == width marks padded stream entries.
    """
    B, T = cols.shape
    idx = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    scol, skey, sidx = jax.lax.sort((cols, keys, idx), num_keys=2, is_stable=True)

    prev_col = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), scol[:, :-1]], axis=1)
    prev_key = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), skey[:, :-1]], axis=1)
    head = (scol != prev_col) | (skey != prev_key)
    head = head & (scol < width)  # padded tail is not a segment
    seg_id = jnp.cumsum(head.astype(jnp.int32), axis=1) - 1  # -1 for pre-first pad

    ones = (scol < width).astype(jnp.int32)
    seg_ok = seg_id >= 0
    seg_idx = jnp.where(seg_ok, seg_id, T - 1)

    seg_count = jnp.zeros((B, T), jnp.int32).at[
        jnp.arange(B)[:, None], seg_idx].add(jnp.where(seg_ok, ones, 0))
    # first occurrence: stable sort kept original order; head rows carry it
    seg_col = jnp.full((B, T), width, jnp.int32).at[
        jnp.arange(B)[:, None], seg_idx].min(jnp.where(seg_ok & head, scol, width))
    seg_key = jnp.zeros((B, T), jnp.int32).at[
        jnp.arange(B)[:, None], seg_idx].max(jnp.where(seg_ok & head, skey, 0))
    seg_first = jnp.full((B, T), T, jnp.int32).at[
        jnp.arange(B)[:, None], seg_idx].min(jnp.where(seg_ok & head, sidx, T))

    seg_b3d = _b3d_from_key(seg_key)
    # order segments by (col, b3d, first occurrence)
    ocol, ob3d, ofirst, okey, ocount = jax.lax.sort(
        (seg_col, seg_b3d, seg_first, seg_key, seg_count), num_keys=3)
    # rank within column
    t_iota = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    col_change = jnp.concatenate(
        [jnp.ones((B, 1), bool), ocol[:, 1:] != ocol[:, :-1]], axis=1)
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(col_change, t_iota, -1), axis=1)
    rank = t_iota - run_start

    valid = ocol < width
    overflow_slots = jnp.any(valid & (rank >= K), axis=1)

    bidx = jnp.arange(B)[:, None]
    ccol = jnp.where(valid & (rank < K), ocol, width)      # drop via clamp-free scatter
    crank = jnp.where(valid & (rank < K), rank, K - 1)
    key_tab = jnp.full((B, width, K), -1, jnp.int32).at[
        bidx, ccol, crank].max(jnp.where(ccol < width, okey, -1), mode="drop")
    cnt_tab = jnp.zeros((B, width, K), jnp.int32).at[
        bidx, ccol, crank].max(jnp.where(ccol < width, ocount, 0), mode="drop")
    coverage = jnp.zeros((B, width), jnp.int32).at[bidx, ccol].add(
        jnp.where((ccol < width) & (ob3d == 0), ocount, 0), mode="drop")
    n_slots = jnp.zeros((B, width), jnp.int32).at[bidx, ccol].add(
        jnp.where(ccol < width, 1, 0), mode="drop")
    return SlotTables(key=key_tab, count=cnt_tab, coverage=coverage,
                      n_slots=n_slots, overflow=overflow_slots)


def _decode_keys(key, col):
    """Vectorized Kmer::bases: packed key + its column -> decoded base triples.

    Returns (b1key, b2key, b3q, b2q, b1q, b2_col_same) where bNkey packs
    (t<<24 | delta<<4 | q) with t relative to the window, and b2_col_same is True
    when the predecessor column equals the kmer's own column (flags bit 0).
    """
    flags = (key >> 12) & 0xF
    delta = (key >> 16) & 0xFFFF
    q1 = (key >> 8) & 0xF
    q2 = (key >> 4) & 0xF
    q3 = key & 0xF
    both = (flags & 0b0101) == 0b0101
    f23 = (flags & 0b0001) != 0
    f12 = (flags & 0b0100) != 0
    # b1
    b1_t = jnp.where(both, col, jnp.where(f23 | f12, col - 1, col - 2))
    b1_d = delta
    # b2
    b2_t = jnp.where(both | f23, col, col - 1)
    b2_d = jnp.where(both, delta + 1, jnp.where(f23, 0, jnp.where(f12, delta + 1, 0)))

    def pack(t, d, q):
        # t < 2^13 (window width cap), d < 2^14 (host-validated), q 4 bits
        return (t << 18) | (d << 4) | q

    b1key = pack(b1_t, b1_d, q1)
    b2key = pack(b2_t, b2_d, q2)
    b3key = pack(col, _b3d_from_key(key), q3)
    return b1key, b2key, b3key, q1, q2, q3, f23


@functools.partial(jax.jit, static_argnames=("max_lvl",))
def consensus_dp(tables: SlotTables, lead_abs: jnp.ndarray,
                 seed_anchor: jnp.ndarray, max_lvl: int = 6):
    """Batched windowed Viterbi (reference main.rs:1645-1687).

    lead_abs: [B] absolute contig position of relative column 0 (for the
    `base2.t_pos >= 3` head-backtrack guard, main.rs:1666).
    seed_anchor: [B] bool — windows starting at an interior anchor get their
    (single) anchor slot at relative column 2 seeded with score 0: the global
    path is forced through it, so window-local scores become true partial sums
    from the anchor (whole-contig best = sum of window maxima).
    Returns (scores [B,W,K] i32, besti [B,W,K] i8, lvl_overflow [B] bool).
    """
    key = tables.key
    B, W, K = key.shape
    col = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :, None], (B, W, K))
    b1key, b2key, b3key, q1, q2, q3, f23 = _decode_keys(key, col)
    valid = key >= 0
    # invalid slots: poison keys so they never match as predecessors
    b2key_m = jnp.where(valid, b2key, -7)
    b3key_m = jnp.where(valid, b3key, -8)
    b1_is_head = q1 == HEAD_Q
    b2_is_head = q2 == HEAD_Q
    b1_nongap = q1 != 4
    gains = 10 * tables.count - 4 * tables.coverage[:, :, None]
    b3d = _b3d_from_key(jnp.where(valid, key, 0))
    lvl_overflow = jnp.any(valid & (b3d > max_lvl), axis=(1, 2))

    guard_abs = lead_abs[:, None]  # [B,1]

    def match_and_pick(i_b1key, i_b2key, p_b2key, p_b3key, p_scores, p_b1head,
                       p_b1nongap, p_col_abs_ge3):
        """For each i: best predecessor among pool j (reference tie rule)."""
        # [B, K_i, K_j]
        m = (p_b2key[:, None, :] == i_b1key[:, :, None]) & (
            p_b3key[:, None, :] == i_b2key[:, :, None])
        m = m & ~(p_b1head[:, None, :] & p_col_abs_ge3[:, None, None])
        cand = jnp.where(m, p_scores[:, None, :], NEG_INF - 1)
        maxv = jnp.max(cand, axis=2)
        ismax = cand == maxv[:, :, None]
        nongapmax = ismax & p_b1nongap[:, None, :]
        anynon = jnp.any(nongapmax, axis=2)
        jfirst = jnp.argmax(ismax, axis=2)
        jlast = (K - 1) - jnp.argmax(nongapmax[:, :, ::-1], axis=2)
        j = jnp.where(anynon, jlast, jfirst)
        has = jnp.any(m, axis=2)
        j = jnp.where(has, j, 0)  # reference besti init (main.rs:1657)
        return jnp.where(has, maxv, NEG_INF), j.astype(jnp.int8), has

    def step(prev, xs):
        (p_scores, p_b2key, p_b3key, p_b1head, p_b1nongap, p_colge3) = prev
        (c_key, c_gain, c_b1key, c_b2key, c_b2keym, c_b3keym, c_b1head,
         c_b1nongap, c_b2head, c_b3d, c_colge3, c_valid, c_is_anchor) = xs
        # level 0: predecessors in the previous column
        best0, j0, has0 = match_and_pick(
            c_b1key, c_b2key, p_b2key, p_b3key, p_scores, p_b1head, p_b1nongap,
            p_colge3)
        sc = jnp.where(c_b2head, c_gain,
                       jnp.where(has0, best0 + c_gain, NEG_INF))
        bi = j0
        sc = jnp.where(c_valid & (c_b3d == 0), sc, NEG_INF)
        # levels 1..max_lvl: predecessors in this column at the previous level
        cur_colge3 = c_colge3
        for lvl in range(1, max_lvl + 1):
            bestl, jl, hasl = match_and_pick(
                c_b1key, c_b2key, c_b2keym, c_b3keym, sc, c_b1head, c_b1nongap,
                cur_colge3)
            sl = jnp.where(c_b2head, c_gain,
                           jnp.where(hasl, bestl + c_gain, NEG_INF))
            is_lvl = c_valid & (c_b3d == lvl)
            sc = jnp.where(is_lvl, sl, sc)
            bi = jnp.where(is_lvl, jl, bi)
        # anchor seeding: score 0 for the forced single slot at relative col 2
        sc = jnp.where(c_is_anchor[:, None] & c_valid, 0, sc)
        carry = (sc, c_b2keym, c_b3keym, c_b1head, c_b1nongap, c_colge3)
        return carry, (sc, bi)

    colge3 = (jnp.arange(W, dtype=jnp.int32)[None, :] + guard_abs) >= 3  # [B, W]
    is_anchor = seed_anchor[:, None] & (
        jnp.arange(W, dtype=jnp.int32)[None, :] == 2)  # [B, W]
    xs = (
        jnp.moveaxis(key, 1, 0), jnp.moveaxis(gains, 1, 0),
        jnp.moveaxis(b1key, 1, 0), jnp.moveaxis(b2key, 1, 0),
        jnp.moveaxis(b2key_m, 1, 0), jnp.moveaxis(b3key_m, 1, 0),
        jnp.moveaxis(b1_is_head, 1, 0), jnp.moveaxis(b1_nongap, 1, 0),
        jnp.moveaxis(b2_is_head, 1, 0), jnp.moveaxis(b3d, 1, 0),
        jnp.moveaxis(colge3, 1, 0), jnp.moveaxis(valid, 1, 0),
        jnp.moveaxis(is_anchor, 1, 0),
    )
    init = (
        jnp.full((B, K), NEG_INF, jnp.int32),
        jnp.full((B, K), -7, jnp.int32),
        jnp.full((B, K), -8, jnp.int32),
        jnp.zeros((B, K), bool),
        jnp.zeros((B, K), bool),
        jnp.zeros((B,), bool),
    )
    _, (sc_all, bi_all) = jax.lax.scan(step, init, xs)
    return (jnp.moveaxis(sc_all, 0, 1), jnp.moveaxis(bi_all, 0, 1), lvl_overflow)


@functools.partial(jax.jit, static_argnames=("max_steps",))
def backtrack(tables: SlotTables, scores: jnp.ndarray, besti: jnp.ndarray,
              last_col: jnp.ndarray, seed_anchor: jnp.ndarray, max_steps: int):
    """Batched backtrack dispatcher: the PACKED scan (_backtrack_scan_packed,
    one gather + one emitted i32 per step) by default — on chip the
    sequential scan's ~1400 steps of per-step overhead dominate the resident
    chunk time while the DP kernel itself costs ~5 ms, so the scan body is
    minimized. NP2_BT_SCAN=1 forces the 4-gather spec scan
    (_backtrack_scan); NP2_BT_JUMP=1 the pointer-doubling variant (measured
    16x SLOWER on chip — take_along_axis row gathers lower badly on TPU;
    kept for the record). All three are bit-exact (differential test in
    tests/test_tpu_engine.py)."""
    import os

    if os.environ.get("NP2_BT_SCAN"):
        return _backtrack_scan(tables, scores, besti, last_col, seed_anchor,
                               max_steps)
    if os.environ.get("NP2_BT_JUMP"):
        return _backtrack_jump(tables, scores, besti, last_col, seed_anchor,
                               max_steps)
    return _backtrack_scan_packed(tables, scores, besti, last_col,
                                  seed_anchor, max_steps)


def _backtrack_state_tables(tables: SlotTables, besti: jnp.ndarray,
                            seed_anchor: jnp.ndarray):
    """Per-state (col*K + slot) successor + emission word, shared by the
    packed scan and the jump variant. Terminal states self-loop (the walk
    never otherwise repeats a state: in-column predecessors occupy earlier
    slots, cross-column ones a smaller column). word = qv<<7 | dec<<6 |
    covlow<<5 | nongap<<4 | q3; the per-STEP valid bit is word bit4 masked by
    aliveness at emission time. Packed as ONE uint32 (succ<<15 | word):
    NS <= 2560*48 < 2^17 and word < 2^15, so the whole scan step needs a
    single gather."""
    key = tables.key
    B, W, K = key.shape
    col = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :, None],
                           (B, W, K))
    flags = (key >> 12) & 0xF
    q2 = (key >> 4) & 0xF
    q3 = key & 0xF
    cov = tables.coverage[:, :, None]
    qv = jnp.where(cov > 0,
                   tables.count * 100 // jnp.maximum(cov, 1), 0)
    qv = jnp.minimum(qv, 255)
    both = (flags & 0b0101) == 0b0101
    f23 = (flags & 1) != 0
    b2_same = both | f23
    is_head = q2 == HEAD_Q
    at_anchor = seed_anchor[:, None, None] & (col == 2)
    nxt_c = jnp.where(b2_same, col, col - 1)
    nxt_s = besti.astype(jnp.int32)
    alive_nxt = ~is_head & ~at_anchor & (nxt_c >= 0)
    self_state = col * K + jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, None, :], (B, W, K))
    succ = jnp.where(alive_nxt, nxt_c * K + nxt_s, self_state)  # [B, W, K]
    dec = alive_nxt & ~b2_same
    word = (qv.astype(jnp.int32) << 7) | q3 \
        | ((q3 != 4).astype(jnp.int32) << 4) \
        | ((cov < 2).astype(jnp.int32) << 5) \
        | (dec.astype(jnp.int32) << 6)
    info = (succ.astype(jnp.uint32) << 15) | word.astype(jnp.uint32)
    return info.reshape(B, W * K)


def _backtrack_start(scores, besti, last_col, K):
    B = scores.shape[0]
    bidx = jnp.arange(B)
    sc_last = scores[bidx, last_col]  # [B, K]
    maxv = jnp.max(sc_last, axis=1)
    ismax = sc_last == maxv[:, None]
    start_slot = (K - 1) - jnp.argmax(ismax[:, ::-1], axis=1)
    start = last_col.astype(jnp.int32) * K + start_slot.astype(jnp.int32)
    return start, maxv


def _backtrack_scan_packed(tables: SlotTables, scores: jnp.ndarray,
                           besti: jnp.ndarray, last_col: jnp.ndarray,
                           seed_anchor: jnp.ndarray, max_steps: int):
    """Sequential scan over the precomputed packed state table: ONE gather
    and ONE emitted i32 per step (out = alive<<15 | word; the spec scan
    emits state/word/alive separately = 4 gathers + 3 output writes). The
    scan body is the chunk's critical path on chip, so it carries the
    absolute minimum: columns are reconstructed AFTER the scan from the dec
    bits, exactly like the host transport decode (decode_backtrack_words) —
    col_i = last_col - #dec before step i. That is bit-identical to
    emitting s//K: a walk decrements its column precisely when the emitted
    word's dec bit is set, and after death the state self-loops on a
    terminal whose table dec == 0 (main.rs:1680 walk semantics).
    NP2_BT_UNROLL (default 2) emissions per scan iteration halve the
    remaining loop/output bookkeeping; bit-exact at any factor
    (differential tests vs _backtrack_scan and _backtrack_jump)."""
    import os

    key = tables.key
    B, W, K = key.shape
    info_tab = _backtrack_state_tables(tables, besti, seed_anchor)
    start, maxv = _backtrack_start(scores, besti, last_col, K)

    def one(state):
        s, alive = state
        info = jnp.take_along_axis(info_tab, s[:, None], axis=1)[:, 0]
        word = (info & 0x7FFF).astype(jnp.int32)
        nxt = (info >> 15).astype(jnp.int32)
        word = jnp.where(alive, word, word & ~0x10)
        out = word | (alive.astype(jnp.int32) << 15)
        return (nxt, alive & (nxt != s)), out

    # NOTE: read at TRACE time — like NP2_BT_SCAN/JUMP, the jit cache is
    # keyed only on shapes, so changing the env after a shape has compiled
    # in-process is a silent no-op (results are bit-exact at any factor;
    # perf-only knob for fresh processes / bench tooling).
    unroll = int(os.environ.get("NP2_BT_UNROLL", "2"))
    if unroll > 1 and max_steps % unroll == 0:
        def step(state, _):
            outs = []
            for _i in range(unroll):
                state, o = one(state)
                outs.append(o)
            return state, tuple(outs)

        (fs, still_alive), outs = jax.lax.scan(
            step, (start, jnp.ones(B, bool)), None,
            length=max_steps // unroll)
        out_r = jnp.stack(outs, axis=1).reshape(max_steps, B)
    else:
        (fs, still_alive), out_r = jax.lax.scan(
            lambda st, _: one(st), (start, jnp.ones(B, bool)), None,
            length=max_steps)

    out_r = jnp.moveaxis(out_r, 0, 1)  # [B, max_steps]
    word_r = out_r & 0x7FFF
    alive_r = out_r >> 15
    dec = (word_r >> 6) & 1
    cum = jnp.cumsum(dec, axis=1)
    cols = (last_col.astype(jnp.int32)[:, None] - (cum - dec)).astype(jnp.int16)
    packed_r = (word_r & 0x7F).astype(jnp.uint8)
    qv_r = (word_r >> 7).astype(jnp.uint8)
    n_steps = jnp.sum(alive_r, axis=1)
    return (cols, packed_r, qv_r, maxv, n_steps, still_alive)


def _backtrack_jump(tables: SlotTables, scores: jnp.ndarray,
                    besti: jnp.ndarray, last_col: jnp.ndarray,
                    seed_anchor: jnp.ndarray, max_steps: int):
    """Pointer-doubling backtrack: identical outputs to _backtrack_scan in
    O(log max_steps) sequential ops instead of max_steps scan steps.

    Every state (col, slot) has a static successor (terminal states
    self-loop: the walk provably never repeats a state otherwise — an
    in-column predecessor occupies an earlier slot and a cross-column one a
    smaller column — so S[t+1] == S[t] iff the walk has ended, which is also
    how per-step aliveness is recovered). The full step sequence comes from
    functional squaring: with f = successor and S = steps 0..m-1,
    steps m..2m-1 = f^m[S]; f^{2m} = f^m ∘ f^m. Emissions are per-state
    values gathered along the sequence; only the `valid` bit is per-step
    (alive & non-gap), exactly like the scan's."""
    key = tables.key
    B, W, K = key.shape
    NS = W * K
    bidx = jnp.arange(B)

    # start: last-max slot at the final column (reference >= scan, main.rs:1680)
    sc_last = scores[bidx, last_col]  # [B, K]
    maxv = jnp.max(sc_last, axis=1)
    ismax = sc_last == maxv[:, None]
    start_slot = (K - 1) - jnp.argmax(ismax[:, ::-1], axis=1)
    start_state = last_col.astype(jnp.int32) * K + start_slot.astype(jnp.int32)

    # dense per-state successor + emission word
    col = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :, None],
                           (B, W, K))
    flags = (key >> 12) & 0xF
    q2 = (key >> 4) & 0xF
    q3 = key & 0xF
    cov = tables.coverage[:, :, None]
    qv = jnp.where(cov > 0,
                   tables.count * 100 // jnp.maximum(cov, 1), 0)
    qv = jnp.minimum(qv, 255)
    both = (flags & 0b0101) == 0b0101
    f23 = (flags & 1) != 0
    b2_same = both | f23
    is_head = q2 == HEAD_Q
    at_anchor = seed_anchor[:, None, None] & (col == 2)
    nxt_c = jnp.where(b2_same, col, col - 1)
    nxt_s = besti.astype(jnp.int32)
    alive_nxt = ~is_head & ~at_anchor & (nxt_c >= 0)
    self_state = col * K + jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, None, :], (B, W, K))
    succ = jnp.where(alive_nxt, nxt_c * K + nxt_s, self_state)  # [B, W, K]
    succ = succ.reshape(B, NS)
    dec = alive_nxt & ~b2_same
    # per-state emission word: qv<<7 | q3 | nongap<<4 | covlow<<5 | dec<<6;
    # bit 4 is masked per step by aliveness below
    wstate = (qv.astype(jnp.int32) << 7) | q3 \
        | ((q3 != 4).astype(jnp.int32) << 4) \
        | ((cov < 2).astype(jnp.int32) << 5) \
        | (dec.astype(jnp.int32) << 6)
    wstate = wstate.reshape(B, NS)

    # functional squaring: S grows 1 -> 2 -> 4 ... -> max_steps
    S = start_state[:, None]
    f = succ
    while S.shape[1] < max_steps:
        S2 = jnp.take_along_axis(f, S, axis=1)
        S = jnp.concatenate([S, S2], axis=1)
        if S.shape[1] < max_steps:
            f = jnp.take_along_axis(f, f, axis=1)
    S = S[:, :max_steps]

    words = jnp.take_along_axis(wstate, S, axis=1)      # [B, steps]
    alive = jnp.concatenate(
        [jnp.ones((B, 1), bool), S[:, 1:] != S[:, :-1]], axis=1)
    words = jnp.where(alive, words, words & ~0x10)
    cols = (S // K).astype(jnp.int16)
    packed_r = (words & 0x7F).astype(jnp.uint8)
    qv_r = (words >> 7).astype(jnp.uint8)
    n_steps = jnp.sum(alive, axis=1)
    last_state = S[:, -1]
    still_alive = jnp.take_along_axis(
        succ, last_state[:, None], axis=1)[:, 0] != last_state
    return (cols, packed_r, qv_r, maxv, n_steps, still_alive)


def _backtrack_scan(tables: SlotTables, scores: jnp.ndarray,
                    besti: jnp.ndarray, last_col: jnp.ndarray,
                    seed_anchor: jnp.ndarray, max_steps: int):
    """Batched backtrack (generate_cns_from_best_score_lq walk, main.rs:1573-1634).

    last_col: [B] relative column of each window's final position.
    seed_anchor: [B] — anchor-seeded windows stop the walk after emitting the
    anchor column (relative col 2); the previous window emits everything below.
    Emits per step (col:i16, packed:u8, qv:u8) in REVERSE genome order, where
    packed = q3 | valid<<4 | (coverage<2)<<5 | dec<<6 and qv = count*100 //
    coverage (0 when coverage is 0; <= 100 so it fits u8) — exactly the two
    facts the host LQ state machine consumes
    (models.oracle_msa.lq_from_qv_stream), at half the device->host pull of
    shipping u16 count/coverage columns. The dec bit records whether the walk
    moves to col-1 AFTER this emission (vs staying in the same column or
    freezing dead): cols[i+1] = cols[i] - dec[i] with cols[0] = last_col, so
    the packed u16 transport (pack_backtrack_out) need not ship columns at
    all — the host rebuilds them with one cumsum
    (decode_backtrack_words).
    Also returns best_score [B] (window-local max at the final column; the
    host sums these for the reference's whole-contig `>= 0` default-kmer
    check, main.rs:1651,1680), n_steps, and a truncation flag.
    """
    key = tables.key
    B, W, K = key.shape
    bidx = jnp.arange(B)

    # start: last-max slot at the final column (reference >= scan, main.rs:1680)
    sc_last = scores[bidx, last_col]  # [B, K]
    maxv = jnp.max(sc_last, axis=1)
    ismax = sc_last == maxv[:, None]
    start_slot = (K - 1) - jnp.argmax(ismax[:, ::-1], axis=1)

    def step(state, _):
        c, s, alive = state
        k = key[bidx, c, s]
        flags = (k >> 12) & 0xF
        q2 = (k >> 4) & 0xF
        q3 = k & 0xF
        cnt = tables.count[bidx, c, s]
        cov = tables.coverage[bidx, c]
        emit_valid = alive & (q3 != 4)
        # small emission dtypes: the tunneled device->host pull costs real
        # wall time, so ship only what lq_from_qv_stream reads — qv (<= 100,
        # u8; count <= coverage because every read contributes exactly one
        # b3-delta-0 kmer per covered column) and the coverage<2 bit, packed
        # with q3 (4 bits incl HEAD_Q=15) + the valid flag
        qv = jnp.where(cov > 0, cnt * 100 // jnp.maximum(cov, 1), 0)
        # b2 column: same col if flags bit0 or both-bits, else col-1
        both = (flags & 0b0101) == 0b0101
        f23 = (flags & 1) != 0
        b2_same = both | f23
        is_head = q2 == HEAD_Q
        at_anchor = seed_anchor & (c == 2)
        nxt_c = jnp.where(b2_same, c, c - 1)
        nxt_s = besti[bidx, c, s].astype(jnp.int32)
        alive_nxt = alive & ~is_head & ~at_anchor & (nxt_c >= 0)
        dec = alive_nxt & ~b2_same  # the walk leaves this column after emitting
        packed = (q3 | (emit_valid.astype(jnp.int32) << 4)
                  | ((cov < 2).astype(jnp.int32) << 5)
                  | (dec.astype(jnp.int32) << 6)).astype(jnp.uint8)
        out = (c.astype(jnp.int16), packed,
               jnp.minimum(qv, 255).astype(jnp.uint8), alive)
        return (jnp.where(alive_nxt, nxt_c, c), jnp.where(alive_nxt, nxt_s, s),
                alive_nxt), out

    init = (last_col.astype(jnp.int32), start_slot.astype(jnp.int32),
            jnp.ones(B, bool))
    (fc, fs, still_alive), outs = jax.lax.scan(step, init, None, length=max_steps)
    cols_r, packed_r, qv_r, alive_r = outs
    # [steps, B] -> [B, steps]
    tr = lambda x: jnp.moveaxis(x, 0, 1)  # noqa: E731
    n_steps = jnp.sum(tr(alive_r), axis=1)
    return (tr(cols_r), tr(packed_r), tr(qv_r), maxv, n_steps, still_alive)


@functools.partial(jax.jit, static_argnames=("K", "max_steps", "use_pallas"))
def dp_backtrack_sparse(dense_key, dense_cnt, coverage, overflow,
                        eb, ew, ek, ekey, ecnt,
                        lead_abs, seed_anchor, last_col,
                        K: int, max_steps: int, use_pallas: bool = False):
    """Fused DP + backtrack from a dense-K_DENSE SPARSE upload: dense
    [B, W, K_DENSE] tables hold the first K_DENSE slots per column (real
    HiFi columns average < 2 slots) and the exception arrays scatter the
    rare deeper slots into the full [B, W, K] table ON DEVICE. This is the
    MESH-SHARDED dispatch format (engine.dispatch_chunk sharded=True): every
    per-window array shards over the 'win' axis, unlike the CSR entry stream
    (dp_backtrack_csr, the single-device production format, ~4x less
    transfer again). Dense counts/coverage travel as u16 (counts <=
    coverage, and coverage > 0xFFFF windows are host-fallback-flagged by
    aggregate_host) and widen on device. Exception padding rows use eb == B
    and are dropped by the scatter. Bit-exact: the assembled table equals
    the host aggregation's."""
    B, W, KD = dense_key.shape
    key = jnp.full((B, W, K), -1, jnp.int32).at[:, :, :KD].set(dense_key)
    cnt = jnp.zeros((B, W, K), jnp.int32).at[:, :, :KD].set(
        dense_cnt.astype(jnp.int32))
    key = key.at[eb, ew, ek].set(ekey, mode="drop")
    cnt = cnt.at[eb, ew, ek].set(ecnt.astype(jnp.int32), mode="drop")
    tables = SlotTables(key=key, count=cnt,
                        coverage=coverage.astype(jnp.int32),
                        n_slots=None, overflow=overflow)
    return dp_backtrack(tables, lead_abs, seed_anchor, last_col, max_steps,
                        use_pallas=use_pallas)


def assemble_csr(ns_u8, keylo, clo, dgap, dval, eidx, xkey, xcnt,
                 B: int, W: int, K: int, win_lo=None, Bl: int = 0):
    """Rebuild the dense key/count tables + per-column coverage from the flat
    CSR upload (see dp_backtrack_csr). Trace-time code — called inside the
    jitted dispatch; factored out so tests can bit-compare the assembled
    tables against the host aggregation's. Deltas arrive as a sparse sidecar
    scattered over the 3-byte main stream — GAP-ENCODED (dgap u16,
    pipeline.windows.encode_dgap: didx = cumsum(dgap) - 1; entries with
    dval == 0 are escapes/padding, remapped past the stream and dropped) —
    full exceptions overwrite afterwards, so a byte-clamped sidecar delta on
    an exception entry is harmless.

    win_lo/Bl: assemble only the LOCAL window range [win_lo, win_lo + Bl)
    into [Bl, W, K] tables (the mesh-sharded dispatch; win_lo is traced).
    Scatter hints: the entry stream is (window, column, slot)-ordered, so
    indices are unique and — in the global case, where padding maps past the
    end — sorted; decoded didx is unique (real deltas strictly increase;
    escape/pad remap targets are distinct past-the-end) but NOT sorted after
    the remap; eidx unique (the native exception list is thread-interleaved,
    so not sorted)."""
    P = keylo.shape[0]
    Pd = dgap.shape[0]
    didx = jnp.where(
        dval > 0,
        jnp.cumsum(dgap.astype(jnp.int32)) - 1,
        P + jnp.arange(Pd, dtype=jnp.int32))
    local = win_lo is not None
    if not local:
        win_lo, Bl = 0, B
    variant = os.environ.get("NP2_ASM_VARIANT", "fused1")
    if variant == "narrow" or os.environ.get("NP2_ASM_NARROW", "0") == "1":
        variant = "narrow"
    elif os.environ.get("NP2_ASM_PAIRED", "0") == "1":
        variant = "paired"
    narrow = variant == "narrow"
    if variant == "fused1":
        # ONE u32 per entry: keylo | delta << 16 | cnt << 24. Real keylo
        # never sets bit 15 (flags live in bits 12-14, oracle_msa key
        # layout) so 0xFFFFFFFF is a safe empty-slot sentinel; counts > 255
        # and key overflows already ride the exception list, which lands on
        # the DENSE planes after the decode. Halves the big-scatter work vs
        # two i32 scatters (the TPU scatter lowering charges per index list
        # AND per payload byte — tools/bench_asm.py).
        packed_e = (keylo.astype(jnp.uint32)
                    | (clo.astype(jnp.uint32) << 24))
        packed_e = packed_e.at[didx].add(dval.astype(jnp.uint32) << 16,
                                         mode="drop",
                                         unique_indices=True)
    elif not narrow:
        # entry-stream prep for the i32 formulations: deltas + exceptions
        # applied to the P-stream BEFORE the big scatter
        key_e = keylo.astype(jnp.int32)
        cnt_e = clo.astype(jnp.int32)
        key_e = key_e.at[didx].add(dval.astype(jnp.int32) << 16, mode="drop",
                                   unique_indices=True)
        key_e = key_e.at[eidx].set(xkey, mode="drop", unique_indices=True)
        cnt_e = cnt_e.at[eidx].set(xcnt, mode="drop", unique_indices=True)
    # SCATTER formulation (a gather formulation — slot (c, k) reading entry
    # start[c]+k — measured 4x SLOWER on chip: TPU arbitrary-index gathers
    # lower worse than this sorted scatter)
    nb = ns_u8.astype(jnp.int32).reshape(-1)            # [B*W]
    cum = jnp.cumsum(nb)
    start = cum - nb
    # flat[e] = colid*K + slot = e + (colid*K - start[colid]). The per-column
    # base c*K - start[c] is NON-DECREASING in c (K >= nb[c] by K-tier
    # construction), and among columns sharing a start (empties) the max —
    # the one the entries actually belong to — wins the scatter-max; so one
    # scatter-max + cummax replaces the old ends-scatter + second cumsum +
    # 1M-element start[colid] gather (~13 ms of the ~25 ms assembly real
    # time on chip, tools/bench_asm_ablate.py).
    base_c = jnp.arange(B * W, dtype=jnp.int32) * K - start
    base = jnp.full((P,), jnp.iinfo(jnp.int32).min, jnp.int32).at[start].max(
        base_c, mode="drop", indices_are_sorted=True)
    base = jax.lax.cummax(base)
    e_idx = jnp.arange(P, dtype=jnp.int32)
    gflat = e_idx + base - win_lo * W * K
    in_rng = (e_idx < cum[-1]) & (gflat >= 0) & (gflat < Bl * W * K)
    # out-of-range entries get DISTINCT past-the-end indices (all dropped):
    # unique_indices=True must hold over the whole index array
    flat = jnp.where(in_rng, gflat, Bl * W * K + e_idx)
    if variant == "fused1":
        npad = Bl * W * K
        packed_d = jnp.full((npad,), 0xFFFFFFFF, jnp.uint32).at[flat].set(
            packed_e, mode="drop", unique_indices=True,
            indices_are_sorted=not local)
        empty = packed_d == jnp.uint32(0xFFFFFFFF)
        key = jnp.where(empty, jnp.int32(-1),
                        (packed_d & jnp.uint32(0xFFFFFF)).astype(jnp.int32))
        cnt = jnp.where(empty, jnp.uint32(0),
                        packed_d >> jnp.uint32(24)).astype(jnp.int32)
        # full exceptions overwrite the dense planes (tiny): real eidx map
        # through flat; pads keep distinct past-the-end drop targets
        fe = jnp.where(eidx < P, flat[jnp.minimum(eidx, P - 1)],
                       npad + jnp.arange(eidx.shape[0], dtype=jnp.int32))
        key = key.at[fe].set(xkey, mode="drop", unique_indices=True)
        cnt = cnt.at[fe].set(xcnt, mode="drop", unique_indices=True)
        key = key.reshape(Bl, W, K)
        cnt = cnt.reshape(Bl, W, K)
    elif narrow:
        # NARROW scatters: 3 scattered bytes per entry (u16 keylo + u8 cnt)
        # instead of 8 (two i32 streams with deltas/exceptions pre-applied).
        # The delta sidecar and full exceptions land on the DENSE table via
        # tiny flat[didx]/flat[eidx] gathers instead of on the entry stream.
        # keylo bit 15 is 0 for every real key (flags occupy bits 12-14,
        # oracle_msa key layout), so 0xFFFF is a safe empty-slot sentinel.
        # A/B: tools/bench_asm.py.
        npad = Bl * W * K
        klo_d = jnp.full((npad,), 0xFFFF, jnp.uint16).at[flat].set(
            keylo.astype(jnp.uint16), mode="drop", unique_indices=True,
            indices_are_sorted=not local)
        c_d = jnp.zeros((npad,), jnp.uint8).at[flat].set(
            clo.astype(jnp.uint8), mode="drop", unique_indices=True,
            indices_are_sorted=not local)
        # index-list pads (>= P) must keep DISTINCT drop targets so
        # unique_indices holds; real didx/eidx map through flat
        fd = jnp.where(didx < P, flat[jnp.minimum(didx, P - 1)],
                       npad + jnp.arange(didx.shape[0], dtype=jnp.int32))
        d_d = jnp.zeros((npad,), jnp.uint8).at[fd].set(
            dval, mode="drop", unique_indices=True,
            indices_are_sorted=not local)
        key = jnp.where(klo_d == jnp.uint16(0xFFFF), jnp.int32(-1),
                        klo_d.astype(jnp.int32)
                        | (d_d.astype(jnp.int32) << 16))
        cnt = c_d.astype(jnp.int32)
        fe = jnp.where(eidx < P, flat[jnp.minimum(eidx, P - 1)],
                       npad + jnp.arange(eidx.shape[0], dtype=jnp.int32))
        key = key.at[fe].set(xkey, mode="drop", unique_indices=True)
        cnt = cnt.at[fe].set(xcnt, mode="drop", unique_indices=True)
        key = key.reshape(Bl, W, K)
        cnt = cnt.reshape(Bl, W, K)
    elif variant == "paired":
        # ONE scatter of (key, cnt) row pairs instead of two scalar scatters
        # over the same index list (A/B candidate: halves the per-index
        # scatter overhead if the lowering is index-bound, tools/bench_asm.py)
        vals = jnp.stack([key_e, cnt_e], axis=1)
        init = jnp.broadcast_to(jnp.array([-1, 0], jnp.int32),
                                (Bl * W * K, 2))
        out = init.at[flat].set(vals, mode="drop", unique_indices=True,
                                indices_are_sorted=not local)
        key = out[:, 0].reshape(Bl, W, K)
        cnt = out[:, 1].reshape(Bl, W, K)
    else:
        key = jnp.full((Bl * W * K,), -1, jnp.int32).at[flat].set(
            key_e, mode="drop", unique_indices=True,
            indices_are_sorted=not local).reshape(Bl, W, K)
        cnt = jnp.zeros((Bl * W * K,), jnp.int32).at[flat].set(
            cnt_e, mode="drop", unique_indices=True,
            indices_are_sorted=not local).reshape(Bl, W, K)
    coverage = jnp.sum(jnp.where(((key >> 12) & 1) == 0, cnt, 0), axis=-1)
    return key, cnt, coverage


@functools.partial(jax.jit,
                   static_argnames=("B", "W", "K", "max_steps", "use_pallas"))
def dp_backtrack_csr(ns_u8, keylo, clo, dgap, dval, eidx, xkey, xcnt,
                     overflow, lead_abs, seed_anchor, last_col,
                     B: int, W: int, K: int, max_steps: int,
                     use_pallas: bool = False):
    """Fused DP + backtrack from the flat CSR upload (pipeline.windows.
    split_csr): ONE entry stream of real slots (3 bytes each: key_lo u16 +
    count u8; nonzero deltas ride the sparse gap-encoded dgap/dval sidecar)
    ordered by (window, column, slot), plus per-column slot counts (u8) — no
    dense planes, no coverage upload (recomputed here from the assembled
    table: coverage = sum of counts whose key flag bit0 is clear, i.e.
    b3-delta == 0; kmer.rs coverage semantics / main.rs:241).

    Assembly is pure vectorized XLA: the entry->column mapping inverts the
    cumsum of slot counts with one scatter-add + cumsum (colid[e] = #{columns
    j with cum[j] <= e}), then two scatters place keys/counts into the
    [B, W, K] table. Entry padding resolves to colid == B*W and
    delta/exception padding to index P; both drop. Bit-exact vs the dense
    dispatch."""
    key, cnt, coverage = assemble_csr(ns_u8, keylo, clo, dgap, dval, eidx,
                                      xkey, xcnt, B, W, K)
    tables = SlotTables(key=key, count=cnt, coverage=coverage,
                        n_slots=None, overflow=overflow)
    return dp_backtrack(tables, lead_abs, seed_anchor, last_col, max_steps,
                        use_pallas=use_pallas)


def _le16u(b: jnp.ndarray) -> jnp.ndarray:
    """u8[2n] little-endian pairs -> u16[n] (arithmetic combine: TPU-safe,
    fuses into the consumer; avoids width-changing bitcasts)."""
    b = b.reshape(-1, 2).astype(jnp.uint16)
    return b[:, 0] | (b[:, 1] << 8)


def _le32i(b: jnp.ndarray) -> jnp.ndarray:
    """u8[4n] little-endian quads -> i32[n]."""
    b = b.reshape(-1, 4).astype(jnp.uint32)
    u = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
    return jax.lax.bitcast_convert_type(u, jnp.int32)


def pack_backtrack_out(out: tuple, lvl_over: jnp.ndarray):
    """Pack the backtrack emission + per-window scalars into ONE u16 array
    [B, max_steps + 8] so the device->host pull is a single transfer (each
    tunneled device_get pays a ~25 ms fixed per-array cost that dominated
    the pull — two arrays was two round trips):
    cols 0..max_steps-1: u16 word = qv<<7 | packed   (packed carries the dec
      bit, bit 6, so columns are NOT shipped — the host rebuilds them from
      last_col with one cumsum; halves the pull vs u32 col-carrying words)
    cols max_steps..+7:  the old i32 meta (best_score, n_steps, truncated,
      lvl_over) as lo/hi u16 pairs [lo0,hi0,lo1,hi1,...].
    Host decode: ops.consensus.decode_backtrack_words."""
    cols, packed, qv, best, n_steps, trunc = out
    words = ((qv.astype(jnp.uint16) << 7) | packed.astype(jnp.uint16))
    meta = jnp.stack([best.astype(jnp.int32), n_steps.astype(jnp.int32),
                      trunc.astype(jnp.int32), lvl_over.astype(jnp.int32)],
                     axis=1)
    u = jax.lax.bitcast_convert_type(meta, jnp.uint32)
    mlohi = jnp.stack([(u & 0xFFFF).astype(jnp.uint16),
                       (u >> 16).astype(jnp.uint16)], axis=-1)
    return jnp.concatenate([words, mlohi.reshape(words.shape[0], 8)], axis=1)


def decode_backtrack_words(arr, last_col) -> tuple:
    """Host-side inverse of pack_backtrack_out (numpy, vectorized):
    returns (cols u16, packed u8, qv u8, best i32, truncated bool,
    lvl_over bool). Columns are reconstructed from last_col (the walk's
    start column, which the host chose at dispatch time) minus the running
    count of dec bits: cols[i] = last_col - sum(dec[0:i])."""
    import numpy as np

    arr = np.asarray(arr)
    words = arr[:, :-8]
    m = arr[:, -8:].astype(np.uint32)
    meta = np.ascontiguousarray(m[:, 0::2] | (m[:, 1::2] << 16)).view(np.int32)
    packed_r = (words & 0x7F).astype(np.uint8)
    qv_r = ((words >> 7) & 0xFF).astype(np.uint8)
    dec = ((words >> 6) & 1).astype(np.int32)
    cum = np.cumsum(dec, axis=1, dtype=np.int32)
    cols_r = (np.asarray(last_col, dtype=np.int32)[:, None]
              - (cum - dec)).astype(np.uint16)
    return (cols_r, packed_r, qv_r, meta[:, 0],
            meta[:, 2].astype(bool), meta[:, 3].astype(bool))


def nibble_ns_for(B: int, W: int, K: int) -> bool:
    """Single source of truth for the ns nibble-packing decision — the packer
    (pipeline.windows.pack_csr_blob callers) and the blob parser below MUST
    agree or every later blob field parses as garbage."""
    return K < 16 and (B * W) % 2 == 0


def _parse_csr_blob(blob, B: int, W: int, K: int, P: int, Pd: int, Pe: int):
    """THE blob parser (single- and mesh-sharded dispatch share it; layout:
    pipeline.windows.pack_csr_blob). Returns (ns_u8 [B, W], keylo, clo, dgap,
    dval, eidx, xkey, xcnt, lead, seed, last_col); trace-time. dgap is the
    RAW u16 gap stream (encode_dgap) — assemble_csr decodes it."""
    o = [0]

    def take(n: int):
        sl = jax.lax.slice_in_dim(blob, o[0], o[0] + n)
        o[0] += n
        return sl

    if nibble_ns_for(B, W, K):
        ns4 = take(B * W // 2)
        ns_u8 = jnp.stack([ns4 & 0xF, ns4 >> 4], axis=-1).reshape(B, W)
    else:
        ns_u8 = take(B * W).reshape(B, W)
    keylo = _le16u(take(2 * P))
    clo = take(P)
    dgap = _le16u(take(2 * Pd))
    dval = take(Pd)
    eidx = _le32i(take(4 * Pe))
    xkey = _le32i(take(4 * Pe))
    xcnt = _le32i(take(4 * Pe))
    lead = _le32i(take(4 * B))
    seed = take(B).astype(bool)
    last_col = _le32i(take(4 * B))
    # trace-time layout check: a packer/parser drift would otherwise shift
    # every field silently
    assert o[0] == blob.shape[0],         f"CSR blob layout mismatch: parsed {o[0]} of {blob.shape[0]} bytes"
    return (ns_u8, keylo, clo, dgap, dval, eidx, xkey, xcnt,
            lead, seed, last_col)


@functools.partial(jax.jit,
                   static_argnames=("B", "W", "K", "P", "Pd", "Pe",
                                    "max_steps", "use_pallas"))
def dp_backtrack_csr_blob(blob, B: int, W: int, K: int, P: int, Pd: int,
                          Pe: int, max_steps: int, use_pallas: bool = False):
    """Production single-device dispatch: the WHOLE chunk rides ONE uint8
    host->device buffer (pipeline.windows.pack_csr_blob layout) and the
    result comes back as the ONE packed array of pack_backtrack_out. The
    tunneled transport pays a fixed cost per array in each direction, which
    at CSR sizes dominated the actual bytes; slicing/recombining the blob is
    fused elementwise work on device. For K < 16 tiers the per-column slot
    counts arrive nibble-packed (two columns per byte). Bit-exact vs
    dp_backtrack_csr."""
    (ns_u8, keylo, clo, dgap, dval, eidx, xkey, xcnt,
     lead, seed, last_col) = _parse_csr_blob(blob, B, W, K, P, Pd, Pe)
    out, lvl = dp_backtrack_csr(
        ns_u8, keylo, clo, dgap, dval, eidx, xkey, xcnt,
        jnp.zeros(B, bool), lead, seed, last_col,
        B=B, W=W, K=K, max_steps=max_steps, use_pallas=use_pallas)
    return pack_backtrack_out(out, lvl)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "B", "W", "K", "P", "Pd", "Pe",
                                    "max_steps", "use_pallas"))
def dp_backtrack_csr_blob_sharded(blob, mesh, B: int, W: int, K: int,
                                  P: int, Pd: int, Pe: int, max_steps: int,
                                  use_pallas: bool = False):
    """Mesh-sharded dispatch from the SAME one-blob CSR upload as the
    single-device path (P4 unification: transfer optimizations land once).
    The blob is replicated — it is small by construction, and replication
    rides ICI — while the WORK shards: under shard_map each device slices
    its own window range of the per-window scalars, assembles only its
    local [B/n, W, K] table (the global entry->column inversion is cheap
    elementwise/cumsum work; the big scatters and the DP are local), and
    runs DP + backtrack on its lanes. Outputs come back 'win'-sharded on
    the batch dim, bit-exact vs dp_backtrack_csr_blob."""
    from jax.sharding import PartitionSpec as PS

    # check_vma off: the DP scan's carry init is unvarying constants while
    # the scanned inputs are shard-local, which trips the varying-manual-axes
    # type check; semantics are per-lane (no cross-shard communication at all)
    try:
        from jax import shard_map as _shard_map

        def shmap(f, in_specs, out_specs):
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False)
    except (ImportError, TypeError):  # older jax
        from jax.experimental.shard_map import shard_map as _shard_map

        def shmap(f, in_specs, out_specs):
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)

    n_win = mesh.shape["win"]
    assert B % n_win == 0, (B, n_win)
    Bl = B // n_win

    def shard_fn(blob):
        (ns_u8, keylo, clo, dgap, dval, eidx, xkey, xcnt,
         lead, seed, last_col) = _parse_csr_blob(blob, B, W, K, P, Pd, Pe)
        win_lo = jax.lax.axis_index("win").astype(jnp.int32) * Bl
        # local assembly: only this shard's window range lands in the table
        key, cnt, coverage = assemble_csr(ns_u8, keylo, clo, dgap, dval,
                                          eidx, xkey, xcnt, B=B, W=W, K=K,
                                          win_lo=win_lo, Bl=Bl)
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, win_lo, Bl)  # noqa: E731
        tables = SlotTables(key=key, count=cnt, coverage=coverage,
                            n_slots=None,
                            overflow=jnp.zeros(Bl, bool))
        out, lvl = dp_backtrack(tables, sl(lead), sl(seed), sl(last_col),
                                max_steps, use_pallas=use_pallas)
        return pack_backtrack_out(out, lvl)

    spec_rep = PS()
    spec_win = PS("win")
    return shmap(shard_fn, in_specs=(spec_rep,), out_specs=spec_win)(blob)


@functools.partial(jax.jit, static_argnames=("K", "max_steps", "use_pallas"))
def dp_backtrack_sparse_packed(dense_key, dense_cnt, coverage, overflow,
                               eb, ew, ek, ekey, ecnt,
                               lead_abs, seed_anchor, last_col,
                               K: int, max_steps: int,
                               use_pallas: bool = False):
    """Mesh-sharded dispatch with the packed one-array output (the gather
    back to host pays the same per-array cost as single-device pulls)."""
    out, lvl = dp_backtrack_sparse(
        dense_key, dense_cnt, coverage, overflow, eb, ew, ek, ekey, ecnt,
        lead_abs, seed_anchor, last_col,
        K=K, max_steps=max_steps, use_pallas=use_pallas)
    return pack_backtrack_out(out, lvl)


@functools.partial(jax.jit,
                   static_argnames=("max_steps", "use_pallas", "dynamic_k"))
def dp_backtrack_packed(tables: SlotTables, lead_abs, seed_anchor, last_col,
                        max_steps: int, use_pallas: bool = False,
                        dynamic_k: bool = False):
    """Dense-table dispatch (dynamic-K opt-in path) with packed output."""
    out, lvl = dp_backtrack(tables, lead_abs, seed_anchor, last_col,
                            max_steps, use_pallas=use_pallas,
                            dynamic_k=dynamic_k)
    return pack_backtrack_out(out, lvl)


@functools.partial(jax.jit,
                   static_argnames=("max_steps", "use_pallas", "dynamic_k"))
def dp_backtrack(tables: SlotTables, lead_abs: jnp.ndarray,
                 seed_anchor: jnp.ndarray, last_col: jnp.ndarray,
                 max_steps: int, use_pallas: bool = False,
                 dynamic_k: bool = False):
    """Fused DP + backtrack: one device program per chunk instead of two.

    On the tunneled TPU each dispatch pays round-trip latency, so the engine,
    the cross-contig batcher, and bench.py all call this single jitted
    program (one compile per (B, width) shape; intermediates never leave the
    device). dynamic_k selects the Pallas kernel whose per-column slot loop
    stops at the column's real max slot count. Returns (backtrack outputs,
    lvl_over)."""
    if use_pallas:
        import os

        from .consensus_pallas import consensus_dp_pallas

        variant = "base" if os.environ.get("NP2_DP_BASE") else "v2"
        scores, besti, lvl_over = consensus_dp_pallas(
            tables.key, tables.count, tables.coverage, lead_abs, seed_anchor,
            n_slots_bw=tables.n_slots if dynamic_k else None,
            dynamic_k=dynamic_k, variant=variant,
            span=None if (dynamic_k or variant != "v2")
            else last_col.astype(jnp.int32) + 1)
        besti = besti.astype(jnp.int8)
    else:
        scores, besti, lvl_over = consensus_dp(tables, lead_abs, seed_anchor)
    out = backtrack(tables, scores, besti, last_col, seed_anchor, max_steps)
    return out, lvl_over
