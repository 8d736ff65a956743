#!/usr/bin/env python3
"""Production-faithful pipelined sweep A/B over CHUNK_B_K8 variants.

Replicates bench.py's step(): the tiered chunk plan over 32 copies of the
real window set, dispatch_chunk_csr per chunk fully async, ONE device-side
checksum materialized per sweep group — i.e. the engine's software pipeline
at its best. Variants differ only in the K=8 tier's full-chunk lane count.
Also prints each variant's per-chunk serial times (sync per chunk, so each
includes the ~25 ms RTT) to show where the sweep time goes per (W, K, B).

Usage: python3 tools/bench_sweep.py [n_groups] [variant,variant,...]
where variant = K8_B or K8_B/K48_B (fat-tier lane count; default 128).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    n_groups = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    raw = sys.argv[2].split(",") if len(sys.argv) > 2 else ["512", "1024"]
    k8bs = []
    for v in raw:
        k8b, _, k48b = v.partition("/")
        k8bs.append((int(k8b), int(k48b or 128)))
    import jax
    import jax.numpy as jnp

    from bench import build_real_windows
    from nextpolish2_tpu.pipeline.engine import (dispatch_chunk_csr,
                                                 plan_tiered_chunks,
                                                 window_ktiers)
    from nextpolish2_tpu.pipeline.windows import aggregate_csr_host
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
    ktier_all = window_ktiers(wb, n_pos, K)
    tiled = np.tile(np.arange(nw), 32)

    @jax.jit
    def _chk(packed):
        return packed.sum(dtype=jnp.int64)

    variants = {}
    for k8b, k48b in k8bs:
        chunks = plan_tiered_chunks((last_all + 1)[tiled], ktier_all[tiled],
                                    tiers, 128, tier_b={8: k8b, 48: k48b})
        hc, n_real = [], 0
        for tids, cwidth, ck, pad_b in chunks:
            ids = tiled[tids]
            n_real += len(ids)
            csr = aggregate_csr_host(wb, ck, width=cwidth, n_windows=pad_b,
                                     win_idx=ids)[:-1]
            lead = np.zeros(pad_b, np.int64)
            lead[: len(ids)] = lead_all[ids]
            seed = np.zeros(pad_b, bool)
            seed[: len(ids)] = seed_all[ids]
            last = np.zeros(pad_b, np.int32)
            last[: len(ids)] = last_all[ids]
            hc.append((csr, lead, seed, last, int(cwidth), int(ck), pad_b,
                       len(ids)))
        variants[(k8b, k48b)] = (hc, n_real)
        shapes = {}
        for c in hc:
            shapes[(c[4], c[5], c[6])] = shapes.get((c[4], c[5], c[6]), 0) + 1
        print(f"b={k8b}/{k48b}: {n_real} real windows, chunks "
              + ", ".join(f"{n}x(W={w},K={k},B={b})"
                          for (w, k, b), n in sorted(shapes.items())),
              flush=True)

    def sweep(hc):
        c = None
        for csr, lead, seed, last, cwidth, ck, pad_b, _n in hc:
            s = _chk(dispatch_chunk_csr(csr, lead, seed, last, cwidth, ck))
            c = s if c is None else c + s
        return c

    # compile + warm every shape, then per-chunk serial times
    for vb, (hc, n_real) in variants.items():
        int(sweep(hc))
        seen = set()
        for csr, lead, seed, last, cwidth, ck, pad_b, n in hc:
            sh = (cwidth, ck, pad_b)
            if sh in seen:
                continue
            seen.add(sh)
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                int(_chk(dispatch_chunk_csr(csr, lead, seed, last,
                                            cwidth, ck)))
                ts.append(time.perf_counter() - t0)
            print(f"b={vb[0]}/{vb[1]} chunk W={cwidth} K={ck} B={pad_b}: "
                  f"min {min(ts)*1e3:7.1f} ms serial (incl RTT), "
                  f"{n} real lanes", flush=True)

    for vb, (hc, n_real) in variants.items():
        wps = []
        for _ in range(n_groups):
            t0 = time.perf_counter()
            c = None
            for _ in range(5):
                s = sweep(hc)
                c = s if c is None else c + s
            int(c)
            wps.append(n_real * 5 / (time.perf_counter() - t0))
        print(f"b={vb[0]}/{vb[1]}: pipelined {max(wps):8.0f} w/s (best group), "
              f"mean {np.mean(wps):8.0f}", flush=True)


if __name__ == "__main__":
    main()
