#!/usr/bin/env python3
"""A/B the static-K vs dynamic-K Pallas DP kernels on the real chip, on the
real bundled windows, at both width tiers. Decides whether NP2_DP_DYNK
becomes the default (CLAUDE.md round-2 open item).

Usage: python3 tools/bench_dynk.py [n_iter]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    import jax.numpy as jnp

    from bench import build_real_windows
    from nextpolish2_tpu.ops.consensus import SlotTables, dp_backtrack
    from nextpolish2_tpu.pipeline.windows import aggregate_host
    from nextpolish2_tpu.utils.jaxcfg import bucket, configure_jax

    configure_jax()
    print(f"backend={jax.default_backend()}", flush=True)

    wb, cfg, _ = build_real_windows()
    K = cfg.max_kmers_per_col
    nw = wb.n_windows
    B = 128

    tier1 = bucket(cfg.window_len + 256, 128)
    lead_all = np.maximum(wb.window_start - 2, 0)
    seed_all = wb.window_start > 0
    last_all = (wb.window_start + wb.window_len - 1 - lead_all).astype(np.int32)
    span_all = last_all + 1

    # pick a chunk of tier-1 windows (the production common case)
    fits = np.nonzero(span_all[: nw] <= tier1)[0]
    sel = fits[:B] if len(fits) >= B else np.arange(min(nw, B))
    lo, hi = int(sel[0]), int(sel[0]) + min(B, len(sel))
    for width in (tier1,):
        key_tab, cnt_tab, coverage, n_slots, overflow = aggregate_host(
            wb, K, width=width, n_windows=B, win_lo=lo, win_hi=hi)
        n = hi - lo
        lead = np.zeros(B, dtype=np.int64)
        lead[:n] = lead_all[lo:hi]
        seed = np.zeros(B, dtype=bool)
        seed[:n] = seed_all[lo:hi]
        last_col = np.zeros(B, dtype=np.int32)
        last_col[:n] = last_all[lo:hi]
        max_steps = int(width + 128)
        print(f"chunk windows [{lo},{hi}) width={width} K={K} "
              f"mean_nslots={n_slots[n_slots > 0].mean():.1f} "
              f"max_nslots={n_slots.max()}", flush=True)
        tables = SlotTables(key=jnp.asarray(key_tab), count=jnp.asarray(cnt_tab),
                            coverage=jnp.asarray(coverage),
                            n_slots=jnp.asarray(n_slots),
                            overflow=jnp.asarray(overflow))
        jl, js, jc = jnp.asarray(lead), jnp.asarray(seed), jnp.asarray(last_col)

        def make_run(dyn):
            def run():
                out, lvl = dp_backtrack(tables, jl, js, jc, max_steps,
                                        use_pallas=True, dynamic_k=dyn)
                return jax.device_get((out, lvl))
            return run

        runs = {"static": make_run(False), "dynk": make_run(True)}
        outs = {}
        for name, run in runs.items():
            t0 = time.perf_counter()
            outs[name] = run()  # compile
            print(f"  {name}: compile+run {time.perf_counter()-t0:.1f}s",
                  flush=True)
        # interleaved rounds: tunnel/hypervisor throttling hits both arms
        # equally; report min (unthrottled) and mean
        times = {"static": [], "dynk": []}
        for _ in range(n_iter):
            for name, run in runs.items():
                t0 = time.perf_counter()
                run()
                times[name].append(time.perf_counter() - t0)
        for name, ts in times.items():
            ts = np.array(ts)
            print(f"  {name:8s} min {ts.min()*1e3:8.2f} ms  "
                  f"mean {ts.mean()*1e3:8.2f} ms  -> {B/ts.min():8.0f} w/s (min)",
                  flush=True)
        a, b = outs["static"], outs["dynk"]
        for i in range(5):
            assert np.array_equal(a[0][i], b[0][i]), f"mismatch field {i}"
        print(f"  bit-exact: True  min-speedup "
              f"{min(times['static'])/min(times['dynk']):.2f}x", flush=True)


if __name__ == "__main__":
    main()
