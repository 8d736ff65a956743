#!/usr/bin/env python3
"""Interleaved on-chip A/B of the backtrack variants on the dominant
production chunk (resident inputs, min-of-N per variant, variants
round-robined within each iteration so hypervisor hour-noise hits all arms
equally):

  spec     4-gather scan (_backtrack_scan, NP2_BT_SCAN path)
  packed1  single-emission packed scan, NP2_BT_UNROLL=1
  packed2  ... unroll 2 (default)
  packed4  ... unroll 4

Each arm is the full production bt stage (backtrack + pack_backtrack_out,
so the packed arms' cols reconstruction is DCE'd exactly like production).
Usage: python3 tools/bench_bt.py [n_iter]
"""

import functools
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
    from nextpolish2_tpu.ops import consensus as C
    from nextpolish2_tpu.ops.consensus_pallas import consensus_dp_pallas
    from nextpolish2_tpu.pipeline.engine import (CHUNK_B_TIERS, _use_pallas,
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
    chunks = plan_tiered_chunks((last_all + 1)[tiled], ktier_all[tiled],
                                tiers, 128, tier_b=CHUNK_B_TIERS)
    tids, cwidth, ck, pad_b = max(chunks, key=lambda c: len(c[0]))
    ids = tiled[tids]
    csr = aggregate_csr_host(wb, ck, width=cwidth, n_windows=pad_b,
                             win_idx=ids)
    if csr is None:
        raise SystemExit("bench_bt: native library required "
                         "(aggregate_csr_host returned None) — run "
                         "sh nextpolish2_tpu/io/_native/build.sh")
    csr = csr[:-1]
    lead = np.zeros(pad_b, np.int64)
    lead[: len(ids)] = lead_all[ids]
    seed = np.zeros(pad_b, bool)
    seed[: len(ids)] = seed_all[ids]
    last = np.zeros(pad_b, np.int32)
    last[: len(ids)] = last_all[ids]
    B, W = csr[0].shape
    max_steps = int(cwidth + 128)
    print(f"dominant chunk: W={cwidth} K={ck} B={B} max_steps={max_steps} "
          f"use_pallas={_use_pallas()}", flush=True)

    # resident dense tables + DP results (assembly/DP excluded from the A/B)
    asm = jax.jit(functools.partial(C.assemble_csr, B=B, W=W, K=ck))
    key_d, cnt_d, cov_d = asm(*(jnp.asarray(x) for x in csr))
    dp = jax.jit(functools.partial(consensus_dp_pallas, variant="v2")) \
        if _use_pallas() else None
    lead_j, seed_j, last_j = (jnp.asarray(lead), jnp.asarray(seed),
                              jnp.asarray(last))
    if dp is not None:
        sc, bi, _ = dp(key_d, cnt_d, cov_d, lead_j, seed_j,
                       span=last_j.astype(jnp.int32) + 1)
    else:
        tables0 = C.SlotTables(key=key_d, count=cnt_d, coverage=cov_d,
                               n_slots=None,
                               overflow=jnp.zeros(B, bool))
        sc, bi, _ = jax.jit(C.consensus_dp)(tables0, lead_j, seed_j)
    sc = jnp.asarray(np.asarray(sc))
    bi = jnp.asarray(np.asarray(bi))

    @jax.jit
    def chk(*xs):
        return sum(x.sum(dtype=jnp.int64) for x in xs)

    def make_bt(fn):
        @functools.partial(jax.jit, static_argnames=("max_steps",))
        def bt(key, cnt, cov, sc, bi, lead, seed, last, max_steps):
            tables = C.SlotTables(key=key, count=cnt, coverage=cov,
                                  n_slots=None,
                                  overflow=jnp.zeros(key.shape[0], bool))
            out = fn(tables, sc, bi, last, seed, max_steps)
            return C.pack_backtrack_out(out, jnp.zeros(key.shape[0], bool))
        return bt

    arms = []
    ref = None
    for name, unroll in (("spec", None), ("packed1", "1"),
                         ("packed2", "2"), ("packed4", "4")):
        if unroll is None:
            fn = C._backtrack_scan
        else:
            os.environ["NP2_BT_UNROLL"] = unroll
            fn = C._backtrack_scan_packed
        bt = make_bt(fn)  # traced lazily at first call (env read then)
        w = bt(key_d, cnt_d, cov_d, sc, bi, lead_j, seed_j, last_j,
               max_steps)  # compile + parity
        got = np.asarray(w)
        if ref is None:
            ref = got
        else:
            assert np.array_equal(ref, got), f"{name}: packed words differ"
        arms.append((name, bt, unroll))
        print(f"{name}: compiled, parity ok", flush=True)

    ts = {name: [] for name, _, _ in arms}
    for _ in range(n_iter):
        for name, bt, unroll in arms:
            if unroll is not None:
                os.environ["NP2_BT_UNROLL"] = unroll
            t0 = time.perf_counter()
            w = bt(key_d, cnt_d, cov_d, sc, bi, lead_j, seed_j, last_j,
                   max_steps)
            int(chk(w))
            ts[name].append(time.perf_counter() - t0)
    for name in ts:
        v = np.array(ts[name]) * 1e3
        print(f"{name:8s} min {v.min():7.1f} ms  med {np.median(v):7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
