#!/usr/bin/env python3
"""Decompose the K=8 chunk's resident device time on the real chip:
Pallas DP alone, fused DP+backtrack (checksum only), + full output pull —
decides whether the next kernel target is the DP grid, the backtrack scan,
or the device->host pull.

Usage: python3 tools/bench_k8parts.py [n_iter] [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    import jax
    import jax.numpy as jnp

    from bench import build_real_windows
    from nextpolish2_tpu.ops.consensus import (SlotTables, backtrack,
                                               dp_backtrack)
    from nextpolish2_tpu.ops.consensus_pallas import consensus_dp_pallas
    from nextpolish2_tpu.pipeline.engine import (plan_tiered_chunks,
                                                 window_ktiers)
    from nextpolish2_tpu.pipeline.windows import aggregate_host
    from nextpolish2_tpu.utils.jaxcfg import bucket, configure_jax

    configure_jax()
    print(f"backend={jax.default_backend()}", flush=True)
    wb, cfg, n_pos = build_real_windows()
    K = cfg.max_kmers_per_col
    nw = wb.n_windows
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    tiers = [bucket(cfg.window_len + 256, 128), bucket(2 * cfg.window_len + 512, 128)]
    lead_all = np.maximum(wb.window_start - 2, 0)
    seed_all = wb.window_start > 0
    last_all = (wb.window_start + wb.window_len - 1 - lead_all).astype(np.int32)
    span_all = last_all + 1
    ktier_all = window_ktiers(wb, n_pos, K)
    tiled = np.tile(np.arange(nw), 32)
    chunks = plan_tiered_chunks(span_all[tiled], ktier_all[tiled], tiers, B)
    tids, cwidth, ck, _ = next(c for c in chunks if c[2] == 8 and len(c[0]) == B)
    ids = tiled[tids]
    agg = aggregate_host(wb, ck, width=cwidth, n_windows=B, win_idx=ids)
    key_tab, cnt_tab, coverage, n_slots, overflow = agg
    lead = lead_all[ids]
    seed = seed_all[ids]
    last = last_all[ids]
    max_steps = int(cwidth + 128)
    print(f"chunk width={cwidth} K={ck} max_steps={max_steps}", flush=True)

    jt = SlotTables(key=jnp.asarray(key_tab), count=jnp.asarray(cnt_tab),
                    coverage=jnp.asarray(coverage), n_slots=None,
                    overflow=jnp.asarray(overflow))
    jl, js, jc = jnp.asarray(lead), jnp.asarray(seed), jnp.asarray(last)

    @jax.jit
    def chk(x):
        return x.sum(dtype=jnp.int64)

    def sync(x):
        int(chk(x if hasattr(x, "sum") else x[0]))

    @jax.jit
    def dp_only():
        s, b, _ = consensus_dp_pallas(jt.key, jt.count, jt.coverage, jl, js)
        return s.sum(dtype=jnp.int64) + b.sum(dtype=jnp.int64)

    @jax.jit
    def dp_bt_chk():
        out, _ = dp_backtrack(jt, jl, js, jc, max_steps, use_pallas=True)
        return (out[0].sum(dtype=jnp.int64) + out[1].sum(dtype=jnp.int64)
                + out[3].sum(dtype=jnp.int64))

    @jax.jit
    def bt_only():
        # backtrack over precomputed DP outputs (measures the scan alone)
        s, b, _ = consensus_dp_pallas(jt.key, jt.count, jt.coverage, jl, js)
        s = jax.lax.stop_gradient(s)
        out = backtrack(jt, s, b.astype(jnp.int8), jc, js, max_steps)
        return out[0].sum(dtype=jnp.int64) + out[3].sum(dtype=jnp.int64)

    def full_pull():
        out, lvl = dp_backtrack(jt, jl, js, jc, max_steps, use_pallas=True)
        return jax.device_get((out, lvl))

    for name, fn, syncer in (
            ("dp only (chk)", dp_only, sync),
            ("dp+backtrack (chk)", dp_bt_chk, sync),
            ("dp+backtrack+pull", full_pull, lambda *a: None)):
        fn()
        ts = []
        for _ in range(n_iter):
            t0 = time.perf_counter()
            r = fn()
            syncer(r)
            ts.append(time.perf_counter() - t0)
        ts = np.array(ts)
        print(f"  {name:22s} min {ts.min()*1e3:8.2f} ms  "
              f"mean {ts.mean()*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
