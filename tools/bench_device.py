#!/usr/bin/env python3
"""Decompose per-chunk device time on the real chip: DP kernel, backtrack,
transfers, dispatch round-trips — the roofline evidence for the DP/backtrack
budget (VERDICT #6). Run on the TPU; CPU works but numbers mean little.

Usage: python3 tools/bench_device.py [n_iter]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def timeit(label, fn, n, sync):
    fn()  # warmup / compile
    sync()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    sync(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    import jax.numpy as jnp

    from bench import build_real_windows
    from nextpolish2_tpu.ops.consensus import (SlotTables, backtrack,
                                               consensus_dp, dp_backtrack)
    from nextpolish2_tpu.pipeline.windows import aggregate_host
    from nextpolish2_tpu.utils.jaxcfg import bucket, configure_jax

    configure_jax()
    use_pallas = jax.default_backend() not in ("cpu",)
    print(f"backend={jax.default_backend()} pallas={use_pallas}", flush=True)

    wb, cfg, _ = build_real_windows()
    K = cfg.max_kmers_per_col
    nw = wb.n_windows
    tiers = [bucket(cfg.window_len + 256, 128), bucket(2 * cfg.window_len + 512, 128)]
    width = tiers[0] if wb.width <= tiers[0] else tiers[1]
    B = 128
    key_tab, cnt_tab, coverage, n_slots, overflow = aggregate_host(
        wb, K, width=width, n_windows=B, win_lo=0, win_hi=min(nw, B))
    lead = np.zeros(B, dtype=np.int64)
    lead[:nw] = np.maximum(wb.window_start - 2, 0)
    seed = np.zeros(B, dtype=bool)
    seed[:nw] = wb.window_start > 0
    last_col = np.zeros(B, dtype=np.int32)
    last_col[:nw] = (wb.window_start + wb.window_len - 1 - lead[:nw]).astype(np.int32)
    tables = SlotTables(key=jnp.asarray(key_tab), count=jnp.asarray(cnt_tab),
                        coverage=jnp.asarray(coverage), n_slots=jnp.asarray(n_slots),
                        overflow=jnp.asarray(overflow))
    jlead, jseed, jlast = jnp.asarray(lead), jnp.asarray(seed), jnp.asarray(last_col)
    max_steps = int(width + 128)
    print(f"B={B} width={width} K={K} max_steps={max_steps}", flush=True)

    @jax.jit
    def chk1(x):
        return x.sum(dtype=jnp.int64)

    def sync(*a):
        # device-side checksum + scalar pull (block_until_ready is a no-op on
        # the tunneled backend)
        if a and a[0] is not None:
            x = a[0]
            int(chk1(x if hasattr(x, "sum") else x[0]))

    # 0. dispatch round trip: trivial program + scalar pull
    tiny = jnp.zeros((8,), jnp.int32)
    timeit("rtt: tiny program + scalar pull", lambda: chk1(tiny),
           n_iter, lambda *a: None)

    # 1. engine dispatch: fused dp_backtrack + FULL device_get (what the
    #    engine pays per chunk today)
    def eng():
        out, lvl = dp_backtrack(tables, jlead, jseed, jlast, max_steps,
                                use_pallas=use_pallas)
        return jax.device_get((out, lvl))
    eng()
    t0 = time.perf_counter()
    for _ in range(n_iter):
        eng()
    dt_eng = (time.perf_counter() - t0) / n_iter
    print(f"{'engine: fused dp_backtrack + device_get':44s} {dt_eng*1e3:9.2f} ms"
          f"  -> {B/dt_eng:8.0f} w/s", flush=True)

    # 2. DP kernel alone (device-side checksum, no big transfer)
    if use_pallas:
        from nextpolish2_tpu.ops.consensus_pallas import consensus_dp_pallas

        @jax.jit
        def dp_only():
            s, b, _ = consensus_dp_pallas(tables.key, tables.count,
                                          tables.coverage, jlead, jseed)
            return s.sum(dtype=jnp.int64) + b.sum(dtype=jnp.int64)
        timeit("dp: pallas kernel (chk only)", dp_only, n_iter, sync)
    else:
        @jax.jit
        def dp_only():
            s, b, _ = consensus_dp(tables, jlead, jseed)
            return s.sum(dtype=jnp.int64) + b.sum(dtype=jnp.int64)
        timeit("dp: xla scan (chk only)", dp_only, n_iter, sync)

    # 3. DP + backtrack fused, checksum only (device compute incl. backtrack)
    @jax.jit
    def dpbt_chk():
        out, _ = dp_backtrack(tables, jlead, jseed, jlast, max_steps,
                              use_pallas=use_pallas)
        return (out[0].sum(dtype=jnp.int64) + out[1].sum(dtype=jnp.int64)
                + out[2].sum(dtype=jnp.int64) + out[3].sum(dtype=jnp.int64)
                + out[4].sum(dtype=jnp.int64))
    timeit("dp+backtrack: fused (chk only)", dpbt_chk, n_iter, sync)

    # 4. forward-only program: besti + last-col scores (the native-backtrack
    #    device side), full device_get
    @jax.jit
    def fwd():
        if use_pallas:
            from nextpolish2_tpu.ops.consensus_pallas import consensus_dp_pallas

            scores, besti, lvl = consensus_dp_pallas(
                tables.key, tables.count, tables.coverage, jlead, jseed)
            besti = besti.astype(jnp.int8)
        else:
            scores, besti, lvl = consensus_dp(tables, jlead, jseed)
        sc_last = scores[jnp.arange(scores.shape[0]), jlast]
        return besti, sc_last, lvl

    def fwd_get():
        return jax.device_get(fwd())
    fwd_get()
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fwd_get()
    dt_fwd = (time.perf_counter() - t0) / n_iter
    print(f"{'forward-only: besti+sc_last + device_get':44s} {dt_fwd*1e3:9.2f} ms"
          f"  -> {B/dt_fwd:8.0f} w/s", flush=True)

    # 5. pure transfer: device_get of a besti-sized i8 array
    blob = jnp.zeros((B, width, K), jnp.int8)
    int(chk1(blob))

    def pull():
        return jax.device_get(blob)
    pull()
    t0 = time.perf_counter()
    for _ in range(n_iter):
        pull()
    dt_pull = (time.perf_counter() - t0) / n_iter
    mb = B * width * K / 1e6
    print(f"{'transfer: device_get %.1f MB i8' % mb:44s} {dt_pull*1e3:9.2f} ms"
          f"  -> {mb/dt_pull:6.0f} MB/s", flush=True)

    # 6. pipelined engine dispatch, depth 2 (dispatch i+1 before get i)
    def eng_async():
        return dp_backtrack(tables, jlead, jseed, jlast, max_steps,
                            use_pallas=use_pallas)
    pend = eng_async()
    t0 = time.perf_counter()
    for _ in range(n_iter):
        nxt = eng_async()
        jax.device_get(pend)
        pend = nxt
    jax.device_get(pend)
    dt_pipe = (time.perf_counter() - t0) / n_iter
    print(f"{'engine pipelined depth-2 + device_get':44s} {dt_pipe*1e3:9.2f} ms"
          f"  -> {B/dt_pipe:8.0f} w/s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
