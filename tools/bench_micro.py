#!/usr/bin/env python3
"""Micro-decompose the resident device chunk time (dp_backtrack_csr_blob) into
its stages, each as its own jitted call on RESIDENT inputs, min-of-N:

  parse+assemble (blob -> dense tables, the scatter-heavy part)
  pallas DP      (consensus_dp_pallas on resident dense tables)
  backtrack      (XLA scan walk + output pack)

The stage sums vs the fused time show what to attack to raise the kernel
ceiling (VERDICT r3 item 4). Usage: python3 tools/bench_micro.py [n_iter]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import functools

    import jax
    import jax.numpy as jnp

    from bench import build_real_windows
    from nextpolish2_tpu.ops import consensus as C
    from nextpolish2_tpu.pipeline.engine import (CHUNK_B_TIERS, _use_pallas,
                                                 plan_tiered_chunks,
                                                 window_ktiers)
    from nextpolish2_tpu.pipeline.windows import (aggregate_csr_host,
                                                  pack_csr_blob)
    from nextpolish2_tpu.utils.jaxcfg import bucket, configure_jax

    configure_jax()
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
    # dominant shape only
    tids, cwidth, ck, pad_b = max(chunks, key=lambda c: len(c[0]))
    ids = tiled[tids]
    csr = aggregate_csr_host(wb, ck, width=cwidth, n_windows=pad_b,
                             win_idx=ids)
    lead = np.zeros(pad_b, dtype=np.int64)
    lead[: len(ids)] = lead_all[ids]
    seed = np.zeros(pad_b, dtype=bool)
    seed[: len(ids)] = seed_all[ids]
    last = np.zeros(pad_b, dtype=np.int32)
    last[: len(ids)] = last_all[ids]
    csr = csr[:-1]
    ns_u8, keylo, clo, didx, dval, eidx, xkey, xcnt = csr
    B, W = ns_u8.shape
    blob = pack_csr_blob(*csr, lead, seed, last,
                         nibble_ns=C.nibble_ns_for(B, W, ck))
    max_steps = int(cwidth + 128)
    print(f"dominant chunk: W={cwidth} K={ck} B={B} blob {blob.nbytes/1e6:.2f} MB "
          f"use_pallas={_use_pallas()}")

    dev = {
        "blob": jnp.asarray(blob),
        "ns": jnp.asarray(ns_u8), "keylo": jnp.asarray(keylo),
        "clo": jnp.asarray(clo), "didx": jnp.asarray(didx),
        "dval": jnp.asarray(dval), "eidx": jnp.asarray(eidx),
        "xkey": jnp.asarray(xkey), "xcnt": jnp.asarray(xcnt),
        "lead": jnp.asarray(lead), "seed": jnp.asarray(seed),
        "last": jnp.asarray(last),
    }

    @jax.jit
    def chk(*xs):
        return sum(x.sum(dtype=jnp.int64) for x in xs)

    def force(*xs):
        return int(chk(*xs))

    asm = jax.jit(functools.partial(C.assemble_csr, B=B, W=W, K=ck))
    key_d, cnt_d, cov_d = asm(dev["ns"], dev["keylo"], dev["clo"],
                              dev["didx"], dev["dval"], dev["eidx"],
                              dev["xkey"], dev["xcnt"])
    force(key_d, cnt_d, cov_d)
    key_d, cnt_d, cov_d = (jnp.asarray(np.asarray(key_d)),
                           jnp.asarray(np.asarray(cnt_d)),
                           jnp.asarray(np.asarray(cov_d)))

    from nextpolish2_tpu.ops.consensus_pallas import consensus_dp_pallas

    dp = jax.jit(functools.partial(consensus_dp_pallas, variant="v2"))
    sc, bi, lvl = dp(key_d, cnt_d, cov_d, dev["lead"], dev["seed"],
                     span=dev["last"].astype(jnp.int32) + 1)
    force(sc, bi)
    sc, bi = jnp.asarray(np.asarray(sc)), jnp.asarray(np.asarray(bi))

    @functools.partial(jax.jit, static_argnames=("max_steps",))
    def bt(key, cnt, cov, sc, bi, lead, seed, last, max_steps):
        tables = C.SlotTables(key=key, count=cnt, coverage=cov, n_slots=None,
                              overflow=jnp.zeros(key.shape[0], bool))
        out = C.backtrack(tables, sc, bi, last, seed, max_steps)
        return C.pack_backtrack_out(out, jnp.zeros(key.shape[0], bool))

    w_, m_ = bt(key_d, cnt_d, cov_d, sc, bi, dev["lead"], dev["seed"],
                dev["last"], max_steps)
    force(w_, m_)

    fused = jax.jit(functools.partial(
        C.dp_backtrack_csr_blob, B=B, W=W, K=ck, P=len(keylo), Pd=len(didx),
        Pe=len(eidx), max_steps=max_steps, use_pallas=_use_pallas()))
    fw, fm = fused(dev["blob"])
    force(fw, fm)

    t_asm, t_dp, t_bt, t_fused = [], [], [], []
    for _ in range(n_iter):
        t0 = time.time()
        a, b, c = asm(dev["ns"], dev["keylo"], dev["clo"], dev["didx"],
                      dev["dval"], dev["eidx"], dev["xkey"], dev["xcnt"])
        force(a, b, c)
        t_asm.append(time.time() - t0)

        t0 = time.time()
        s2, b2, _ = dp(key_d, cnt_d, cov_d, dev["lead"], dev["seed"],
                       span=dev["last"].astype(jnp.int32) + 1)
        force(s2, b2)
        t_dp.append(time.time() - t0)

        t0 = time.time()
        w2, m2 = bt(key_d, cnt_d, cov_d, sc, bi, dev["lead"], dev["seed"],
                    dev["last"], max_steps)
        force(w2, m2)
        t_bt.append(time.time() - t0)

        t0 = time.time()
        fw, fm = fused(dev["blob"])
        force(fw, fm)
        t_fused.append(time.time() - t0)

    def ms(v):
        return f"{min(v)*1e3:.1f} ms"

    print(f"assemble {ms(t_asm)} | pallas-dp {ms(t_dp)} | backtrack {ms(t_bt)}"
          f" | fused(all) {ms(t_fused)}  (each incl ~1 dispatch RTT)")
    print(f"fused -> {B/min(t_fused):.0f} w/s resident ceiling")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
