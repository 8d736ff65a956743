"""Pallas TPU kernel for the consensus backtrack walk — NOT wired in.

One window per grid step: dynamic sublane row loads + lane-select reductions for
the data-dependent (col, slot) walk, emissions packed into two outputs via
dynamic sublane stores. Bit-exact vs ops.consensus.backtrack (tests), but
MEASURED SLOWER on v5e: 44.9 ms/batch vs the XLA scan's 12.9 ms (104 windows,
W~2400) — per-step scalar-ish work on the VPU beats nobody; the XLA scan's
batched gathers win. Kept as a documented negative result; revisit only with a
lane-parallel walk formulation (e.g. pointer-jumping).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HEAD_Q = 15


def _bt_kernel(K, W, max_steps,
               key_ref, cnt_ref, cov_ref, besti_ref, scln_ref, meta_ref,
               pk_out, cov_out, state_out):
    last_col = meta_ref[0, 0, 0]
    seeded = meta_ref[0, 0, 1] != 0

    # start slot: last-max over the final column (main.rs:1680 >= scan)
    sc = scln_ref[0, :, 0]  # [K]
    maxv = jnp.max(sc)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)[0]
    start_slot = jnp.max(jnp.where(sc == maxv, kidx, -1))

    def lane(vec, s):
        return jnp.sum(jnp.where(kidx == s, vec, 0))

    def put(ref, i, val):
        ref[0, pl.ds(i, 1), :] = jnp.full((1, 1), val, jnp.int32)

    def step(i, state):
        c, s, alive = state
        krow = key_ref[0, pl.ds(c, 1), :][0]     # [K]
        k = lane(krow, s)
        flags = (k >> 12) & 0xF
        q2 = (k >> 4) & 0xF
        q3 = k & 0xF
        cnt = lane(cnt_ref[0, pl.ds(c, 1), :][0], s)
        cov = cov_ref[0, c, 0]
        emit = (alive != 0) & (q3 != 4)
        # pack (col:13 | q3:4 | ok:1 | cnt:13); cnt clamped at 8191 (counts are
        # bounded by coverage; K-slot overflow trips far earlier than this)
        packed = (c << 18) | (q3 << 14) | (emit.astype(jnp.int32) << 13) | \
                 jnp.minimum(cnt, 8191)
        put(pk_out, i, packed)
        put(cov_out, i, cov)
        both = (flags & 0b0101) == 0b0101
        f23 = (flags & 1) != 0
        b2_same = both | f23
        is_head = q2 == HEAD_Q
        at_anchor = seeded & (c == 2)
        nxt_c = jnp.where(b2_same, c, c - 1)
        nxt_s = lane(besti_ref[0, pl.ds(c, 1), :][0], s)
        alive_n = (alive != 0) & ~is_head & ~at_anchor & (nxt_c >= 0)
        return (jnp.where(alive_n, nxt_c, c), jnp.where(alive_n, nxt_s, s),
                alive_n.astype(jnp.int32))

    final = jax.lax.fori_loop(0, max_steps, step,
                              (last_col, start_slot, jnp.int32(1)))
    state_out[0, 0, 0] = maxv      # window best score
    state_out[0, 0, 1] = final[2]  # still alive at bound -> truncated
    state_out[0, 0, 2] = 0
    state_out[0, 0, 3] = 0


@functools.partial(jax.jit, static_argnames=("max_steps", "interpret"))
def backtrack_pallas(key_bwk, cnt_bwk, cov_bw, scores_bwk, besti_bwk,
                     last_col, seed, max_steps: int, interpret: bool = False):
    """Drop-in for ops.consensus.backtrack (same output tuple)."""
    B, W, K = key_bwk.shape
    bidx = jnp.arange(B)
    sc_last = scores_bwk[bidx, last_col]  # [B, K]
    meta = jnp.stack([last_col.astype(jnp.int32),
                      seed.astype(jnp.int32),
                      jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32)], axis=1)

    kernel = functools.partial(_bt_kernel, K, W, max_steps)
    ms = max_steps
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, W, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ms, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ms, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, ms, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, ms, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 4), jnp.int32),
        ],
        interpret=interpret,
    )(key_bwk, cnt_bwk, cov_bw[:, :, None], besti_bwk.astype(jnp.int32),
      sc_last[:, :, None], meta[:, None, :])
    pk_t, cov_t, state = outs
    pk = pk_t[:, :, 0]
    cols_r = pk >> 18
    base_r = (pk >> 14) & 0xF
    cnt_r = pk & 0x1FFF
    cov_r = cov_t[:, :, 0]
    ok_r = ((pk >> 13) & 1) != 0
    best = state[:, 0, 0]
    truncated = state[:, 0, 1] != 0
    n_steps = jnp.sum(ok_r, axis=1)
    return (cols_r, base_r, cnt_r, cov_r, ok_r, best, n_steps, truncated)
