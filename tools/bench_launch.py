#!/usr/bin/env python3
"""Isolate axon per-dispatch overhead vs real kernel compute: time (a) a
trivial jitted scalar op, (b) the v2 DP at B=128, (c) B=256, (d) B=512 —
all resident inputs, interleaved min-of-N. If (a) is ~20 ms, the chunk time
is launch-dominated and the win is more windows per dispatch, not kernel
micro-optimization.

Usage: python3 tools/bench_launch.py [n_iter]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    import jax
    import jax.numpy as jnp

    from bench import build_real_windows
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
    tiers = [bucket(cfg.window_len + 256, 128),
             bucket(2 * cfg.window_len + 512, 128)]
    lead_all = np.maximum(wb.window_start - 2, 0)
    seed_all = wb.window_start > 0
    last_all = (wb.window_start + wb.window_len - 1 - lead_all).astype(np.int32)
    span_all = last_all + 1
    ktier_all = window_ktiers(wb, n_pos, K)
    tiled = np.tile(np.arange(nw), 48)

    def chunk_of(Bc):
        chunks = plan_tiered_chunks(span_all[tiled], ktier_all[tiled], tiers, Bc)
        tids, cwidth, ck, _ = next(c for c in chunks
                                   if c[2] == 8 and len(c[0]) == Bc)
        ids = tiled[tids]
        agg = aggregate_host(wb, ck, width=cwidth, n_windows=Bc, win_idx=ids)
        return (jnp.asarray(agg[0]), jnp.asarray(agg[1]), jnp.asarray(agg[2]),
                jnp.asarray(lead_all[ids]), jnp.asarray(seed_all[ids]),
                jnp.asarray(span_all[ids].astype(np.int32)))

    tiny = jnp.asarray(np.arange(128, dtype=np.int32))

    def mk_dp(Bc):
        jk, jc, jv, jl, js, jsp = chunk_of(Bc)

        @jax.jit
        def f():
            sc, bi, _ = consensus_dp_pallas(jk, jc, jv, jl, js, span=jsp)
            return (jnp.sum(sc.astype(jnp.uint32) * np.uint32(2654435761))
                    + jnp.sum(bi.astype(jnp.uint32)))
        return f

    variants = {
        "trivial": jax.jit(lambda: jnp.sum(tiny * tiny)),
        "dp B=128": mk_dp(128),
        "dp B=256": mk_dp(256),
        "dp B=512": mk_dp(512),
    }
    for name, fn in variants.items():
        t0 = time.time()
        _ = float(fn())
        print(f"  {name}: compile+run {time.time()-t0:.1f} s", flush=True)
    times = {n: [] for n in variants}
    for it in range(n_iter):
        for name, fn in variants.items():
            t0 = time.time()
            _ = float(fn())
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        ts = np.array(ts[1:])
        print(f"  {name:9s} min {ts.min()*1e3:8.2f} ms  "
              f"mean {ts.mean()*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
