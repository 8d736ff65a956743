#!/usr/bin/env python3
"""A/B the reduction-free v2 DP kernel vs the base Pallas kernel on the real
chip, on the production K=8 chunk (128 windows x W=1280): base, v2, v2+span
bound, v2+span at chunk_w=128. Interleaved min-of-N (the hypervisor swings
hour to hour); bit-compares every variant's output against base first.

Usage: python3 tools/bench_dpv2.py [n_iter] [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    want_k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
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
    B = 128
    tiers = [bucket(cfg.window_len + 256, 128),
             bucket(2 * cfg.window_len + 512, 128)]
    lead_all = np.maximum(wb.window_start - 2, 0)
    seed_all = wb.window_start > 0
    last_all = (wb.window_start + wb.window_len - 1 - lead_all).astype(np.int32)
    span_all = last_all + 1
    ktier_all = window_ktiers(wb, n_pos, K)
    tiled = np.tile(np.arange(nw), 8)
    chunks = plan_tiered_chunks(span_all[tiled], ktier_all[tiled], tiers, B)
    tids, cwidth, ck, _ = next(c for c in chunks
                               if c[2] == want_k and len(c[0]) == B)
    ids = tiled[tids]
    agg = aggregate_host(wb, ck, width=cwidth, n_windows=B, win_idx=ids)
    key_tab, cnt_tab, coverage, n_slots, overflow = agg
    lead = lead_all[ids]
    seed = seed_all[ids]
    span = span_all[ids].astype(np.int32)
    print(f"chunk width={cwidth} K={ck} span max={span.max()} "
          f"mean={span.mean():.0f}", flush=True)

    jk = jnp.asarray(key_tab)
    jc = jnp.asarray(cnt_tab)
    jv = jnp.asarray(coverage)
    jl = jnp.asarray(lead)
    js = jnp.asarray(seed)
    jsp = jnp.asarray(span)

    def checksum(out):
        sc, bi, _ = out
        return (jnp.sum(sc.astype(jnp.uint32) * np.uint32(2654435761))
                + jnp.sum(bi.astype(jnp.uint32)))

    variants = {
        "base cw=32": lambda: consensus_dp_pallas(jk, jc, jv, jl, js,
                                                  variant="base"),
        "v2   cw=32": lambda: consensus_dp_pallas(jk, jc, jv, jl, js,
                                                  variant="v2"),
        "v2sp cw=32": lambda: consensus_dp_pallas(jk, jc, jv, jl, js,
                                                  variant="v2", span=jsp),
        "v2sp cw=128": lambda: consensus_dp_pallas(jk, jc, jv, jl, js,
                                                   variant="v2", span=jsp,
                                                   chunk_w=128),
    }

    # one compile per variant (checksum epilogue fused in); checksum equality
    # across variants re-checks on-chip agreement (bit-exactness is proven in
    # interpret mode by tests/test_pallas_dp.py)
    csums = {n: jax.jit(lambda f=f: checksum(f())) for n, f in variants.items()}
    vals = {}
    for name in variants:
        t0 = time.time()
        vals[name] = float(csums[name]())
        print(f"  {name}: compile+run {time.time()-t0:.1f} s "
              f"csum={vals[name]}", flush=True)
    assert len(set(vals.values())) == 1, f"checksum mismatch: {vals}"
    times = {n: [] for n in variants}
    for it in range(n_iter):
        for name in variants:
            t0 = time.time()
            v = csums[name]()
            _ = float(v)  # scalar pull forces execution on axon
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        ts = np.array(ts[1:])
        print(f"  {name:13s} min {ts.min()*1e3:8.2f} ms  "
              f"mean {ts.mean()*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
