#!/usr/bin/env python3
"""A/B: upload/compute overlap strategies for the production CSR dispatch
(VERDICT r4 item 6 — the ~2x gap between production dispatch and resident
compute is transfer-bound on the tunneled backend).

Arms (interleaved min-of-N, same chunks):
  serial    upload + dispatch + harvest per chunk, no lookahead
  pipeline  the production engine's software pipeline (dispatch ahead,
            harvest later; NP2_PIPELINE_DEPTH chunks in flight)
  prefetch  a helper thread issues device_put for chunk i+1 while the main
            thread dispatches compute on chunk i's resident blob
  resident  pre-uploaded blobs (upper bound; no transfer at all)

Usage: bench_overlap.py [--iters 4] [--groups 3]
"""
import argparse
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--groups", type=int, default=3)
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import bench
    from nextpolish2_tpu.ops.consensus import (dp_backtrack_csr_blob,
                                               nibble_ns_for)
    from nextpolish2_tpu.pipeline.windows import (aggregate_csr_host,
                                                  pack_csr_blob)
    from nextpolish2_tpu.utils.jaxcfg import bucket, configure_jax

    configure_jax()
    use_pallas = jax.default_backend() not in ("cpu",)
    wb, cfg, contig_bp = bench.build_real_windows()
    from nextpolish2_tpu.pipeline.engine import (CHUNK_B_TIERS,
                                                 plan_tiered_chunks,
                                                 window_ktiers)

    K = cfg.max_kmers_per_col
    nw = wb.n_windows
    tiers = [bucket(cfg.window_len + 256, 128),
             bucket(2 * cfg.window_len + 512, 128)]
    lead_all = np.maximum(wb.window_start - 2, 0)
    seed_all = wb.window_start > 0
    last_all = (wb.window_start + wb.window_len - 1 - lead_all).astype(np.int32)
    span_all = last_all + 1
    ktier_all = window_ktiers(wb, contig_bp, K)
    REP = 32
    tiled = np.tile(np.arange(nw), REP)
    chunks = plan_tiered_chunks(span_all[tiled], ktier_all[tiled], tiers, 128,
                                tier_b=CHUNK_B_TIERS)
    blobs = []
    n_real = 0
    for tids, cwidth, ck, pad_b in chunks:
        ids = tiled[tids]
        n_real += len(ids)
        csr = aggregate_csr_host(wb, ck, width=cwidth, n_windows=pad_b,
                                 win_idx=ids)
        assert csr is not None
        parts = csr[:-1]
        ns_u8 = parts[0]
        B, W = ns_u8.shape
        lead = np.zeros(pad_b, dtype=np.int64)
        lead[: len(ids)] = lead_all[ids]
        seed = np.zeros(pad_b, dtype=bool)
        seed[: len(ids)] = seed_all[ids]
        last = np.zeros(pad_b, dtype=np.int32)
        last[: len(ids)] = last_all[ids]
        blob = pack_csr_blob(*parts, lead, seed, last,
                             nibble_ns=nibble_ns_for(B, W, ck))
        blobs.append((blob, dict(B=B, W=W, K=ck, P=len(parts[1]),
                                 Pd=len(parts[3]), Pe=len(parts[5]),
                                 max_steps=int(cwidth + 128),
                                 use_pallas=use_pallas)))

    @jax.jit
    def _chk(packed):
        return packed.sum(dtype=jnp.int64)

    def arm_serial():
        c = None
        for blob, kw in blobs:
            s = _chk(dp_backtrack_csr_blob(jnp.asarray(blob), **kw))
            c = int(s) if c is None else c + int(s)  # harvest per chunk
        return c

    def arm_pipeline():
        from collections import deque

        pend = deque()
        c = 0
        for blob, kw in blobs:
            pend.append(_chk(dp_backtrack_csr_blob(jnp.asarray(blob), **kw)))
            if len(pend) >= 3:
                c += int(pend.popleft())
        while pend:
            c += int(pend.popleft())
        return c

    def arm_prefetch():
        from collections import deque

        pool = ThreadPoolExecutor(max_workers=1)
        futs = deque()
        futs.append(pool.submit(jnp.asarray, blobs[0][0]))
        c = 0
        pend = deque()
        for i, (blob, kw) in enumerate(blobs):
            if i + 1 < len(blobs):
                futs.append(pool.submit(jnp.asarray, blobs[i + 1][0]))
            dev = futs.popleft().result()
            pend.append(_chk(dp_backtrack_csr_blob(dev, **kw)))
            if len(pend) >= 3:
                c += int(pend.popleft())
        while pend:
            c += int(pend.popleft())
        pool.shutdown(wait=False)
        return c

    resident = [(jnp.asarray(blob), kw) for blob, kw in blobs]

    def arm_resident():
        c = 0
        from collections import deque

        pend = deque()
        for dev, kw in resident:
            pend.append(_chk(dp_backtrack_csr_blob(dev, **kw)))
            if len(pend) >= 3:
                c += int(pend.popleft())
        while pend:
            c += int(pend.popleft())
        return c

    arms = [("serial", arm_serial), ("pipeline", arm_pipeline),
            ("prefetch", arm_prefetch), ("resident", arm_resident)]
    for name, fn in arms:
        fn()  # warm/compile
    results = {name: [] for name, _ in arms}
    for g in range(a.groups):
        for name, fn in arms:  # interleaved
            t0 = time.time()
            for _ in range(a.iters):
                fn()
            results[name].append(time.time() - t0)
    print(f"n_real={n_real} windows/sweep, iters={a.iters}")
    for name, _ in arms:
        best = min(results[name])
        print(f"{name:9s} {n_real * a.iters / best:8.0f} w/s "
              f"(group times {[round(t, 2) for t in results[name]]})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
