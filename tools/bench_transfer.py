#!/usr/bin/env python3
"""Isolate per-chunk HtoD input transfer cost vs DP compute on the real chip:
times the engine's fused dispatch with (a) device-resident tables and (b)
tables re-uploaded from host numpy each iteration (what the production
engine pays), at both K tiers.

Usage: python3 tools/bench_transfer.py [n_iter]
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
    from nextpolish2_tpu.ops.consensus import SlotTables, dp_backtrack
    from nextpolish2_tpu.pipeline.engine import plan_tiered_chunks, window_ktiers
    from nextpolish2_tpu.pipeline.windows import aggregate_host
    from nextpolish2_tpu.utils.jaxcfg import bucket, configure_jax

    configure_jax()
    print(f"backend={jax.default_backend()}", flush=True)
    wb, cfg, n_pos = build_real_windows()
    K = cfg.max_kmers_per_col
    nw = wb.n_windows
    B = 128
    tiers = [bucket(cfg.window_len + 256, 128), bucket(2 * cfg.window_len + 512, 128)]
    lead_all = np.maximum(wb.window_start - 2, 0)
    seed_all = wb.window_start > 0
    last_all = (wb.window_start + wb.window_len - 1 - lead_all).astype(np.int32)
    span_all = last_all + 1
    ktier_all = window_ktiers(wb, n_pos, K)
    tiled = np.tile(np.arange(nw), 8)
    chunks = plan_tiered_chunks(span_all[tiled], ktier_all[tiled], tiers, B)

    for tids, cwidth, ck, _ in chunks[:1] + chunks[-1:]:
        ids = tiled[tids]
        n = len(ids)
        host = aggregate_host(wb, ck, width=cwidth, n_windows=B, win_idx=ids)
        key_tab, cnt_tab, coverage, n_slots, overflow = host
        lead = np.zeros(B, dtype=np.int64)
        lead[:n] = lead_all[ids]
        seed = np.zeros(B, dtype=bool)
        seed[:n] = seed_all[ids]
        last_col = np.zeros(B, dtype=np.int32)
        last_col[:n] = last_all[ids]
        max_steps = int(cwidth + 128)
        in_mb = (key_tab.nbytes + cnt_tab.nbytes + coverage.nbytes
                 + n_slots.nbytes) / 1e6
        print(f"chunk width={cwidth} K={ck} n={n} inputs={in_mb:.1f} MB",
              flush=True)

        jt = SlotTables(key=jnp.asarray(key_tab), count=jnp.asarray(cnt_tab),
                        coverage=jnp.asarray(coverage),
                        n_slots=jnp.asarray(n_slots),
                        overflow=jnp.asarray(overflow))
        jl, js, jc = (jnp.asarray(lead), jnp.asarray(seed),
                      jnp.asarray(last_col))

        def run_resident():
            out, lvl = dp_backtrack(jt, jl, js, jc, max_steps,
                                    use_pallas=True)
            return jax.device_get((out, lvl))

        def run_upload():
            t = SlotTables(key=jnp.asarray(key_tab), count=jnp.asarray(cnt_tab),
                           coverage=jnp.asarray(coverage),
                           n_slots=jnp.asarray(n_slots),
                           overflow=jnp.asarray(overflow))
            out, lvl = dp_backtrack(t, jnp.asarray(lead), jnp.asarray(seed),
                                    jnp.asarray(last_col), max_steps,
                                    use_pallas=True)
            return jax.device_get((out, lvl))

        from nextpolish2_tpu.ops.consensus import dp_backtrack_sparse
        from nextpolish2_tpu.pipeline.engine import K_DENSE
        from nextpolish2_tpu.pipeline.windows import split_sparse

        dk, dc, eb, ew, ek, ekey, ecnt = split_sparse(key_tab, cnt_tab,
                                                      n_slots, K_DENSE)
        dc16 = dc.astype(np.uint16)
        cov16 = coverage.astype(np.uint16)
        sp_mb = (dk.nbytes + dc16.nbytes + cov16.nbytes + eb.nbytes * 3
                 + ekey.nbytes + ecnt.nbytes) / 1e6
        print(f"  sparse inputs={sp_mb:.1f} MB E={len(eb)}", flush=True)
        sjt = tuple(jnp.asarray(a) for a in
                    (dk, dc16, cov16, overflow, eb, ew, ek, ekey, ecnt))

        def run_sparse_resident():
            out, lvl = dp_backtrack_sparse(*sjt, jl, js, jc, K=ck,
                                           max_steps=max_steps,
                                           use_pallas=True)
            return jax.device_get((out, lvl))

        def run_sparse_upload():
            t = tuple(jnp.asarray(a) for a in
                      (dk, dc16, cov16, overflow, eb, ew, ek, ekey, ecnt))
            out, lvl = dp_backtrack_sparse(*t, jnp.asarray(lead),
                                           jnp.asarray(seed),
                                           jnp.asarray(last_col), K=ck,
                                           max_steps=max_steps,
                                           use_pallas=True)
            return jax.device_get((out, lvl))

        for name, run in (("resident", run_resident), ("upload", run_upload),
                          ("sp-resident", run_sparse_resident),
                          ("sp-upload", run_sparse_upload)):
            run()
            ts = []
            for _ in range(n_iter):
                t0 = time.perf_counter()
                run()
                ts.append(time.perf_counter() - t0)
            ts = np.array(ts)
            print(f"  {name:9s} min {ts.min()*1e3:8.2f} ms  "
                  f"mean {ts.mean()*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
