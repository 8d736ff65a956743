"""Pallas TPU kernel for the windowed consensus Viterbi DP.

Layout: windows ride the 128 VPU lanes (one tile = 128 windows), candidate slots
ride sublanes; the kernel scans columns sequentially with the DP carry held in
VMEM scratch, streaming [CHUNK_W, K, 128] blocks of the column-major tensors via
the sequential grid (state persists across W-chunks of the same window tile).

Semantics match ops/consensus.consensus_dp exactly (masked max-plus with the
reference tie rule, in-column insertion levels, anchor seeding); tests compare
bit-for-bit. The XLA scan version pays ~0.3 ms of per-step overhead per column;
here a column costs a few hundred VPU cycles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -(1 << 30)
HEAD_Q = 15
LANES = 128


def _decode_tile(key, col):
    """key [K, L] + scalar col -> decoded fields (same packing as ops.consensus)."""
    flags = (key >> 12) & 0xF
    delta = (key >> 16) & 0xFFFF
    q1 = (key >> 8) & 0xF
    q2 = (key >> 4) & 0xF
    q3 = key & 0xF
    both = (flags & 0b0101) == 0b0101
    f23 = (flags & 0b0001) != 0
    f12 = (flags & 0b0100) != 0
    b1_t = jnp.where(both, col, jnp.where(f23 | f12, col - 1, col - 2))
    b2_t = jnp.where(both | f23, col, col - 1)
    b2_d = jnp.where(both, delta + 1, jnp.where(f23, 0, jnp.where(f12, delta + 1, 0)))
    b3d = jnp.where(both, delta + 2, jnp.where(f23, 1, 0))

    def pack(t, d, q):
        return (t << 18) | (d << 4) | q

    b1key = pack(b1_t, delta, q1)
    b2key = pack(b2_t, b2_d, q2)
    b3key = pack(col, b3d, q3)
    return b1key, b2key, b3key, q1, q2, q3, b3d


def _pick(cand_has, cand_scores, nongap_j, K):
    """Reference tie rule over axis 0 (j): strict max, ties prefer the LAST j
    whose predecessor's first base is a non-gap, else the FIRST max
    (main.rs:1670). Returns (best [1,L], j* [1,L], any [1,L])."""
    maxv = jnp.max(cand_scores, axis=0, keepdims=True)
    ismax = cand_has & (cand_scores == maxv)
    jidx = jax.lax.broadcasted_iota(jnp.int32, cand_scores.shape, 0)
    jfirst = jnp.min(jnp.where(ismax, jidx, K), axis=0, keepdims=True)
    jlastn = jnp.max(jnp.where(ismax & nongap_j, jidx, -1), axis=0, keepdims=True)
    j = jnp.where(jlastn >= 0, jlastn, jfirst)
    # int32 (not bool): Mosaic cannot select between i1 vectors
    has = jnp.max(jnp.where(ismax, 1, 0), axis=0, keepdims=True)
    j = jnp.where(has != 0, j, 0)  # reference besti init (main.rs:1657)
    return maxv, j, has


def _dp_kernel(K, chunk_w, n_chunks,
               key_ref, cnt_ref, cov_ref, lead_ref, seed_ref,
               scores_out, besti_out,
               p_scores, p_b2key, p_b3key, p_b1head, p_b1nongap):
    wchunk = pl.program_id(1)

    @pl.when(wchunk == 0)
    def _init():
        p_scores[:] = jnp.full((K, LANES), NEG_INF, jnp.int32)
        p_b2key[:] = jnp.full((K, LANES), -7, jnp.int32)
        p_b3key[:] = jnp.full((K, LANES), -8, jnp.int32)
        p_b1head[:] = jnp.zeros((K, LANES), jnp.int32)
        p_b1nongap[:] = jnp.zeros((K, LANES), jnp.int32)

    lead = lead_ref[0, :]          # [L]
    seed = seed_ref[0, :] != 0     # [L]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (K, LANES), 0)

    def col_body(c, _):
        abs_col = wchunk * chunk_w + c
        key = key_ref[c]           # [K, L]
        cnt = cnt_ref[c]
        cov = cov_ref[c]           # [L]
        valid = key >= 0
        b1key, b2key, b3key, q1, q2, _q3, _b3d = _decode_tile(key, abs_col)
        b2key_m = jnp.where(valid, b2key, -7)
        b3key_m = jnp.where(valid, b3key, -8)
        b1head = (q1 == HEAD_Q).astype(jnp.int32)
        b1nongap = (q1 != 4).astype(jnp.int32)
        b2head = q2 == HEAD_Q
        same_col = (key >> 12) & 0b0001 != 0  # flag bit 0: pred pool is this col
        gains = 10 * cnt - 4 * cov[None, :]
        colge3 = (lead[None, :] + abs_col) >= 3  # [1, L]

        pv_scores = p_scores[:]
        pv_b2key = p_b2key[:]
        pv_b3key = p_b3key[:]
        pv_guard = (p_b1head[:] != 0) & colge3
        pv_nongap = p_b1nongap[:] != 0
        cur_guard = (b1head != 0) & colge3
        cur_nongap = b1nongap != 0

        # Slots are sorted by delta-level, so a slot's in-column predecessors
        # always occupy earlier slots: one static unroll in slot order computes
        # both prev-column and same-column transitions with no level passes and
        # no delta-level cap.
        sc = jnp.full((K, LANES), NEG_INF, jnp.int32)
        bi = jnp.zeros((K, LANES), jnp.int32)
        for i in range(K):
            i_b1 = b1key[i : i + 1, :]
            i_b2 = b2key[i : i + 1, :]
            m_p = (pv_b2key == i_b1) & (pv_b3key == i_b2) & ~pv_guard
            cand_p = jnp.where(m_p, pv_scores, NEG_INF - 1)
            best_p, j_p, has_p = _pick(m_p, cand_p, pv_nongap, K)
            m_c = (b2key_m == i_b1) & (b3key_m == i_b2) & ~cur_guard
            cand_c = jnp.where(m_c, sc, NEG_INF - 1)
            best_c, j_c, has_c = _pick(m_c, cand_c, cur_nongap, K)
            use_c = same_col[i : i + 1, :]
            best = jnp.where(use_c, best_c, best_p)
            j = jnp.where(use_c, j_c, j_p)
            has = jnp.where(use_c, has_c, has_p)
            i_gain = gains[i : i + 1, :]
            s_new = jnp.where(b2head[i : i + 1, :], i_gain,
                              jnp.where(has != 0, best + i_gain, NEG_INF))
            s_new = jnp.where(valid[i : i + 1, :], s_new, NEG_INF)
            is_row = row_iota == i
            sc = jnp.where(is_row, s_new, sc)
            bi = jnp.where(is_row, j, bi)
        # anchor seeding (relative col 2 of seeded windows)
        sc = jnp.where((seed[None, :]) & (abs_col == 2) & valid, 0, sc)

        scores_out[c] = sc
        besti_out[c] = bi.astype(jnp.int8)
        p_scores[:] = sc
        p_b2key[:] = b2key_m
        p_b3key[:] = b3key_m
        p_b1head[:] = b1head
        p_b1nongap[:] = b1nongap
        return 0

    jax.lax.fori_loop(0, chunk_w, col_body, 0)


def _dp_kernel_v2(K, chunk_w, n_chunks, use_span, *refs):
    """Reduction-free DP kernel (the production default; _dp_kernel kept as
    the reference formulation). Profiling on chip showed the per-column cost
    of _dp_kernel is ~20 us regardless of K — dominated by the ~6 cross-
    sublane reductions per slot inside _pick (min/max over the sublane axis
    lower to rotate chains on the VPU). This variant replaces every reduction
    with a RUNNING elementwise pick over predecessor rows j (ascending):

      take = match & (cand > best  |  (cand == best & pred_nongap))

    which reproduces the reference tie rule exactly (strict max; among ties
    prefer the LAST non-gap predecessor, else the FIRST maximum —
    main.rs:1670): a strict improvement resets the winner (first max), a tie
    replaces it only for non-gap j (last non-gap).

    Same-column (in-column insertion level) transitions exploit the slot
    order: slots are sorted by b3-delta, so a slot's in-column predecessors
    (level l-1) always occupy EARLIER slots. One ascending pass finalizes
    slot i from the running same-col state, then broadcasts its final score
    into the running state for later slots. Bit-exact vs _dp_kernel
    (tests/test_pallas_dp.py runs both).

    use_span: inner column loop stops at this tile's max window span (pad
    columns of every lane are invalid ⇒ scores NEG_INF, besti 0 — written by
    a block memset up front, so outputs stay bit-identical)."""
    if use_span:
        (key_ref, cnt_ref, cov_ref, lead_ref, seed_ref, span_ref,
         scores_out, besti_out,
         p_scores, p_b2key, p_b3key, p_b1head, p_b1nongap) = refs
    else:
        (key_ref, cnt_ref, cov_ref, lead_ref, seed_ref,
         scores_out, besti_out,
         p_scores, p_b2key, p_b3key, p_b1head, p_b1nongap) = refs
        span_ref = None
    wchunk = pl.program_id(1)

    @pl.when(wchunk == 0)
    def _init():
        p_scores[:] = jnp.full((K, LANES), NEG_INF, jnp.int32)
        p_b2key[:] = jnp.full((K, LANES), -7, jnp.int32)
        p_b3key[:] = jnp.full((K, LANES), -8, jnp.int32)
        p_b1head[:] = jnp.zeros((K, LANES), jnp.int32)
        p_b1nongap[:] = jnp.zeros((K, LANES), jnp.int32)

    lead = lead_ref[0, :]          # [L]
    seed = seed_ref[0, :] != 0     # [L]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (K, LANES), 0)
    NEG1 = NEG_INF - 1

    def col_body(c, _):
        abs_col = wchunk * chunk_w + c
        key = key_ref[c]           # [K, L]
        cnt = cnt_ref[c]
        cov = cov_ref[c]           # [L]
        valid = key >= 0
        b1key, b2key, b3key, q1, q2, _q3, _b3d = _decode_tile(key, abs_col)
        b2key_m = jnp.where(valid, b2key, -7)
        b3key_m = jnp.where(valid, b3key, -8)
        b1head = (q1 == HEAD_Q).astype(jnp.int32)
        b1nongap = (q1 != 4).astype(jnp.int32)
        b2head = q2 == HEAD_Q
        same_col = (key >> 12) & 0b0001 != 0  # flag bit 0: pred pool is this col
        gains = 10 * cnt - 4 * cov[None, :]
        colge3 = (lead[None, :] + abs_col) >= 3  # [1, L]

        pv_scores = p_scores[:]
        pv_b2key = p_b2key[:]
        pv_b3key = p_b3key[:]
        pv_guard = (p_b1head[:] != 0) & colge3
        pv_nongap = p_b1nongap[:] != 0
        cur_guard = (b1head != 0) & colge3
        cur_nongap = b1nongap != 0

        # phase 1: prev-column predecessors for ALL slots at once — loop over
        # predecessor rows j, elementwise running pick on [K, L] tiles
        rbest_p = jnp.full((K, LANES), NEG1, jnp.int32)
        rj_p = jnp.zeros((K, LANES), jnp.int32)
        rhas_p = jnp.zeros((K, LANES), jnp.int32)
        for j in range(K):
            m = ((pv_b2key[j : j + 1, :] == b1key)
                 & (pv_b3key[j : j + 1, :] == b2key)
                 & ~pv_guard[j : j + 1, :])
            cand = pv_scores[j : j + 1, :]
            take = m & ((cand > rbest_p)
                        | ((cand == rbest_p) & pv_nongap[j : j + 1, :]))
            rbest_p = jnp.where(take, cand, rbest_p)
            rj_p = jnp.where(take, j, rj_p)
            rhas_p = jnp.where(m, 1, rhas_p)

        # phase 2: finalize slots in order; after each, fold its final score
        # into the running same-column pick for later (deeper-level) slots
        sc = jnp.full((K, LANES), NEG_INF, jnp.int32)
        bi = jnp.zeros((K, LANES), jnp.int32)
        rbest_c = jnp.full((K, LANES), NEG1, jnp.int32)
        rj_c = jnp.zeros((K, LANES), jnp.int32)
        rhas_c = jnp.zeros((K, LANES), jnp.int32)
        for i in range(K):
            use_c = same_col[i : i + 1, :]
            best = jnp.where(use_c, rbest_c[i : i + 1, :], rbest_p[i : i + 1, :])
            j = jnp.where(use_c, rj_c[i : i + 1, :], rj_p[i : i + 1, :])
            has = jnp.where(use_c, rhas_c[i : i + 1, :], rhas_p[i : i + 1, :])
            j = jnp.where(has != 0, j, 0)  # reference besti init (main.rs:1657)
            i_gain = gains[i : i + 1, :]
            s_new = jnp.where(b2head[i : i + 1, :], i_gain,
                              jnp.where(has != 0, best + i_gain, NEG_INF))
            s_new = jnp.where(valid[i : i + 1, :], s_new, NEG_INF)
            is_row = row_iota == i
            sc = jnp.where(is_row, s_new, sc)
            bi = jnp.where(is_row, j, bi)
            if i + 1 < K:  # slot i as same-col predecessor of deeper slots
                m = ((b2key_m[i : i + 1, :] == b1key)
                     & (b3key_m[i : i + 1, :] == b2key)
                     & ~cur_guard[i : i + 1, :])
                take = m & ((s_new > rbest_c)
                            | ((s_new == rbest_c) & cur_nongap[i : i + 1, :]))
                rbest_c = jnp.where(take, s_new, rbest_c)
                rj_c = jnp.where(take, i, rj_c)
                rhas_c = jnp.where(m, 1, rhas_c)
        # anchor seeding (relative col 2 of seeded windows)
        sc = jnp.where((seed[None, :]) & (abs_col == 2) & valid, 0, sc)

        scores_out[c] = sc
        besti_out[c] = bi.astype(jnp.int8)
        p_scores[:] = sc
        p_b2key[:] = b2key_m
        p_b3key[:] = b3key_m
        p_b1head[:] = b1head
        p_b1nongap[:] = b1nongap
        return 0

    if use_span:
        # pad columns are all-invalid in every lane: memset the exact values
        # the kernel would compute for them, then scan only real columns
        scores_out[:] = jnp.full((chunk_w, K, LANES), NEG_INF, jnp.int32)
        besti_out[:] = jnp.zeros((chunk_w, K, LANES), jnp.int8)
        span_max = jnp.max(span_ref[0, :])
        hi = jnp.clip(span_max - wchunk * chunk_w, 0, chunk_w)
        jax.lax.fori_loop(0, hi, col_body, 0)
    else:
        jax.lax.fori_loop(0, chunk_w, col_body, 0)


def _dp_kernel_dynk(K, chunk_w, n_chunks,
                    key_ref, cnt_ref, cov_ref, ns_ref, lead_ref, seed_ref,
                    scores_out, besti_out,
                    p_scores, p_b2key, p_b3key, p_b1head, p_b1nongap):
    """Dynamic-K variant of _dp_kernel: the per-column slot unroll runs only
    up to this column's max active slot count across the 128 lanes (mean ~6 of
    K=16 on real 74x HiFi pileups), with per-slot queries re-decoded from a
    dynamically indexed row instead of a static slice. Rows past the bound
    keep their init (scores NEG_INF, besti 0) — exactly what the static
    kernel computes for them, since invalid slots score NEG_INF and their
    besti is never followed by the backtrack."""
    wchunk = pl.program_id(1)

    @pl.when(wchunk == 0)
    def _init():
        p_scores[:] = jnp.full((K, LANES), NEG_INF, jnp.int32)
        p_b2key[:] = jnp.full((K, LANES), -7, jnp.int32)
        p_b3key[:] = jnp.full((K, LANES), -8, jnp.int32)
        p_b1head[:] = jnp.zeros((K, LANES), jnp.int32)
        p_b1nongap[:] = jnp.zeros((K, LANES), jnp.int32)

    lead = lead_ref[0, :]          # [L]
    seed = seed_ref[0, :] != 0     # [L]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (K, LANES), 0)

    def col_body(c, _):
        abs_col = wchunk * chunk_w + c
        key = key_ref[c]           # [K, L]
        cov = cov_ref[c]           # [L]
        valid = key >= 0
        # match TARGETS still need the full tile decode
        _b1key, b2key, b3key, q1, _q2, _q3, _b3d = _decode_tile(key, abs_col)
        b2key_m = jnp.where(valid, b2key, -7)
        b3key_m = jnp.where(valid, b3key, -8)
        b1head = (q1 == HEAD_Q).astype(jnp.int32)
        b1nongap = (q1 != 4).astype(jnp.int32)
        colge3 = (lead[None, :] + abs_col) >= 3  # [1, L]

        pv_scores = p_scores[:]
        pv_b2key = p_b2key[:]
        pv_b3key = p_b3key[:]
        pv_guard = (p_b1head[:] != 0) & colge3
        pv_nongap = p_b1nongap[:] != 0
        cur_guard = (b1head != 0) & colge3
        cur_nongap = b1nongap != 0
        cov_row = cov[None, :]

        kmax = jnp.minimum(jnp.max(ns_ref[c]), K)

        def slot_body(i, carry):
            sc, bi = carry
            k_i = key_ref[c, pl.ds(i, 1), :]     # [1, L] dynamic row read
            cnt_i = cnt_ref[c, pl.ds(i, 1), :]
            flags = (k_i >> 12) & 0xF
            delta = (k_i >> 16) & 0xFFFF
            iq1 = (k_i >> 8) & 0xF
            iq2 = (k_i >> 4) & 0xF
            both = (flags & 0b0101) == 0b0101
            f23 = (flags & 0b0001) != 0
            f12 = (flags & 0b0100) != 0
            b1_t = jnp.where(both, abs_col,
                             jnp.where(f23 | f12, abs_col - 1, abs_col - 2))
            b2_t = jnp.where(both | f23, abs_col, abs_col - 1)
            b2_d = jnp.where(both, delta + 1,
                             jnp.where(f23, 0, jnp.where(f12, delta + 1, 0)))
            i_b1 = (b1_t << 18) | (delta << 4) | iq1
            i_b2 = (b2_t << 18) | (b2_d << 4) | iq2
            m_p = (pv_b2key == i_b1) & (pv_b3key == i_b2) & ~pv_guard
            cand_p = jnp.where(m_p, pv_scores, NEG_INF - 1)
            best_p, j_p, has_p = _pick(m_p, cand_p, pv_nongap, K)
            m_c = (b2key_m == i_b1) & (b3key_m == i_b2) & ~cur_guard
            cand_c = jnp.where(m_c, sc, NEG_INF - 1)
            best_c, j_c, has_c = _pick(m_c, cand_c, cur_nongap, K)
            use_c = f23  # flag bit 0: pred pool is this column
            best = jnp.where(use_c, best_c, best_p)
            j = jnp.where(use_c, j_c, j_p)
            has = jnp.where(use_c, has_c, has_p)
            i_gain = 10 * cnt_i - 4 * cov_row
            s_new = jnp.where(iq2 == HEAD_Q, i_gain,
                              jnp.where(has != 0, best + i_gain, NEG_INF))
            s_new = jnp.where(k_i >= 0, s_new, NEG_INF)
            is_row = row_iota == i
            sc = jnp.where(is_row, s_new, sc)
            bi = jnp.where(is_row, j, bi)
            return sc, bi

        sc0 = jnp.full((K, LANES), NEG_INF, jnp.int32)
        bi0 = jnp.zeros((K, LANES), jnp.int32)
        sc, bi = jax.lax.fori_loop(0, kmax, slot_body, (sc0, bi0))
        # anchor seeding (relative col 2 of seeded windows)
        sc = jnp.where((seed[None, :]) & (abs_col == 2) & valid, 0, sc)

        scores_out[c] = sc
        besti_out[c] = bi.astype(jnp.int8)
        p_scores[:] = sc
        p_b2key[:] = b2key_m
        p_b3key[:] = b3key_m
        p_b1head[:] = b1head
        p_b1nongap[:] = b1nongap
        return 0

    jax.lax.fori_loop(0, chunk_w, col_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("chunk_w", "interpret", "dynamic_k",
                                    "variant"))
def consensus_dp_pallas(key_bwk, cnt_bwk, cov_bw, lead, seed,
                        chunk_w: int = 32, interpret: bool = False,
                        n_slots_bw=None, dynamic_k: bool = False,
                        variant: str = "v2", span=None):
    """Drop-in DP replacement: [B, W, K] tables -> (scores, besti, lvl_overflow).

    B is padded to a multiple of 128 internally; W to a multiple of chunk_w.
    The kernel has no delta-level cap (slot ordering covers arbitrary insertion
    depth), so lvl_overflow is always False here.

    variant: "v2" (reduction-free running pick, the fast default) or "base"
    (the reference formulation with cross-sublane reductions). span ([B] i32,
    last_col + 1) optionally bounds the column scan per 128-window tile at
    its max real span — pad columns get their exact all-invalid values from
    a block memset.
    """
    B, W, K = key_bwk.shape
    Bp = ((B + LANES - 1) // LANES) * LANES
    Wp = ((W + chunk_w - 1) // chunk_w) * chunk_w
    key_p = jnp.full((Bp, Wp, K), -1, jnp.int32).at[:B, :W].set(key_bwk)
    cnt_p = jnp.zeros((Bp, Wp, K), jnp.int32).at[:B, :W].set(cnt_bwk)
    cov_p = jnp.zeros((Bp, Wp), jnp.int32).at[:B, :W].set(cov_bw)
    lead_p = jnp.zeros((Bp,), jnp.int32).at[:B].set(lead.astype(jnp.int32))
    seed_p = jnp.zeros((Bp,), jnp.int32).at[:B].set(seed.astype(jnp.int32))

    # column-major: [W, K, B] so windows ride lanes
    key_wkb = jnp.transpose(key_p, (1, 2, 0))
    cnt_wkb = jnp.transpose(cnt_p, (1, 2, 0))
    cov_wb = jnp.transpose(cov_p, (1, 0))
    lead_2d = lead_p[None, :]
    seed_2d = seed_p[None, :]

    lvl_overflow = jnp.zeros((B,), bool)

    n_btiles = Bp // LANES
    n_chunks = Wp // chunk_w
    grid = (n_btiles, n_chunks)

    if dynamic_k:
        assert n_slots_bw is not None, "dynamic_k requires n_slots"
        ns_p = jnp.zeros((Bp, Wp), jnp.int32).at[:B, :W].set(
            n_slots_bw.astype(jnp.int32))
        ns_wb = jnp.transpose(ns_p, (1, 0))
        kernel = functools.partial(_dp_kernel_dynk, K, chunk_w, n_chunks)
        scores, besti = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((chunk_w, K, LANES), lambda b, w: (w, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk_w, K, LANES), lambda b, w: (w, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk_w, LANES), lambda b, w: (w, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk_w, LANES), lambda b, w: (w, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda b, w: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda b, w: (0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((chunk_w, K, LANES), lambda b, w: (w, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk_w, K, LANES), lambda b, w: (w, 0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Wp, K, Bp), jnp.int32),
                jax.ShapeDtypeStruct((Wp, K, Bp), jnp.int8),
            ],
            scratch_shapes=[
                pltpu.VMEM((K, LANES), jnp.int32),
                pltpu.VMEM((K, LANES), jnp.int32),
                pltpu.VMEM((K, LANES), jnp.int32),
                pltpu.VMEM((K, LANES), jnp.int32),
                pltpu.VMEM((K, LANES), jnp.int32),
            ],
            interpret=interpret,
        )(key_wkb, cnt_wkb, cov_wb, ns_wb, lead_2d, seed_2d)
        scores_bwk = jnp.transpose(scores, (2, 0, 1))[:B, :W]
        besti_bwk = jnp.transpose(besti, (2, 0, 1))[:B, :W]
        return scores_bwk, besti_bwk, lvl_overflow

    use_span = span is not None
    if variant == "v2":
        kernel = functools.partial(_dp_kernel_v2, K, chunk_w, n_chunks,
                                   use_span)
    else:
        assert not use_span, "span bounding requires the v2 kernel"
        kernel = functools.partial(_dp_kernel, K, chunk_w, n_chunks)
    operands = [key_wkb, cnt_wkb, cov_wb, lead_2d, seed_2d]
    in_specs = [
            pl.BlockSpec((chunk_w, K, LANES), lambda b, w: (w, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_w, K, LANES), lambda b, w: (w, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_w, LANES), lambda b, w: (w, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda b, w: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda b, w: (0, b),
                         memory_space=pltpu.VMEM),
    ]
    if use_span:
        span_p = jnp.zeros((Bp,), jnp.int32).at[:B].set(span.astype(jnp.int32))
        operands.append(span_p[None, :])
        in_specs.append(pl.BlockSpec((1, LANES), lambda b, w: (0, b),
                                     memory_space=pltpu.VMEM))
    scores, besti = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((chunk_w, K, LANES), lambda b, w: (w, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_w, K, LANES), lambda b, w: (w, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Wp, K, Bp), jnp.int32),
            jax.ShapeDtypeStruct((Wp, K, Bp), jnp.int8),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, LANES), jnp.int32),
            pltpu.VMEM((K, LANES), jnp.int32),
            pltpu.VMEM((K, LANES), jnp.int32),
            pltpu.VMEM((K, LANES), jnp.int32),
            pltpu.VMEM((K, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(*operands)

    scores_bwk = jnp.transpose(scores, (2, 0, 1))[:B, :W]
    besti_bwk = jnp.transpose(besti, (2, 0, 1))[:B, :W]
    return scores_bwk, besti_bwk, lvl_overflow
