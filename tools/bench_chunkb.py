#!/usr/bin/env python3
"""A/B the device chunk batch size (CHUNK_B = 128 vs 256 vs 512) for K=8
chunks on the real chip, production dispatch path (sparse upload included).
Fixed per-dispatch costs (tunnel round trip, backtrack scan step overhead,
output pull latency) amortize across lane tiles; transfer bytes scale
linearly, so the win saturates where transfer dominates.

Usage: python3 tools/bench_chunkb.py [n_iter] [B,B,...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    bs = ([int(b) for b in sys.argv[2].split(",")]
          if len(sys.argv) > 2 else [128, 256, 512])
    import jax

    from bench import build_real_windows
    from nextpolish2_tpu.pipeline.engine import (dispatch_chunk,
                                                 plan_tiered_chunks,
                                                 window_ktiers)
    from nextpolish2_tpu.pipeline.windows import aggregate_host
    from nextpolish2_tpu.utils.jaxcfg import bucket, configure_jax

    configure_jax()
    print(f"backend={jax.default_backend()}", flush=True)
    wb, cfg, n_pos = build_real_windows()
    K = cfg.max_kmers_per_col
    nw = wb.n_windows
    tiers = [bucket(cfg.window_len + 256, 128), bucket(2 * cfg.window_len + 512, 128)]
    lead_all = np.maximum(wb.window_start - 2, 0)
    seed_all = wb.window_start > 0
    last_all = (wb.window_start + wb.window_len - 1 - lead_all).astype(np.int32)
    span_all = last_all + 1
    ktier_all = window_ktiers(wb, n_pos, K)
    tiled = np.tile(np.arange(nw), 32)  # plenty of K=8 windows

    for B in bs:
        chunks = plan_tiered_chunks(span_all[tiled], ktier_all[tiled],
                                    tiers, B)
        # first full K=8 chunk only
        sel = next((ids, w, k) for ids, w, k, _ in chunks
                   if k == 8 and len(ids) == B)
        tids, cwidth, ck = sel
        ids = tiled[tids]
        agg = aggregate_host(wb, ck, width=cwidth, n_windows=B, win_idx=ids)
        lead = lead_all[ids]
        seed = seed_all[ids]
        last = last_all[ids]

        def run():
            return jax.device_get(
                dispatch_chunk(agg, lead, seed, last, cwidth, ck))
        t0 = time.perf_counter()
        run()
        print(f"B={B:4d} compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        ts = []
        for _ in range(n_iter):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        ts = np.array(ts)
        print(f"B={B:4d} min {ts.min()*1e3:8.2f} ms  mean {ts.mean()*1e3:8.2f}"
              f" ms  -> {B/ts.min():8.0f} w/s (min)", flush=True)


if __name__ == "__main__":
    main()
