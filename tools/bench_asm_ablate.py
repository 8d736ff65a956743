#!/usr/bin/env python3
"""Ablate assemble_csr stage-by-stage on chip to locate the real cost.

bench_asm.py showed dropping one of the two 5.2M-slot scatters (fused1)
saves only ~5 ms of the ~53 ms assembly — so the big scatter is NOT the
wall. Arms isolate each piece on the dominant production chunk (K=8 B=512,
P~1M). Interleaved min-of-N; each arm returns a scalar checksum so only
that crosses the tunnel. Usage: python3 tools/bench_asm_ablate.py [n_iter]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    import jax
    import jax.numpy as jnp

    from bench import build_real_windows
    from nextpolish2_tpu.pipeline.engine import (CHUNK_B_TIERS,
                                                 plan_tiered_chunks,
                                                 window_ktiers)
    from nextpolish2_tpu.pipeline.windows import aggregate_csr_host
    from nextpolish2_tpu.utils.jaxcfg import bucket, configure_jax

    configure_jax()
    print(f"backend={jax.default_backend()}", flush=True)
    wb, cfg, n_pos = build_real_windows()
    K = cfg.max_kmers_per_col
    tiers = [bucket(cfg.window_len + 256, 128),
             bucket(2 * cfg.window_len + 512, 128)]
    lead_all = np.maximum(wb.window_start - 2, 0)
    last_all = (wb.window_start + wb.window_len - 1 - lead_all).astype(np.int32)
    ktier_all = window_ktiers(wb, n_pos, K)
    tiled = np.tile(np.arange(wb.n_windows), 32)
    chunks = plan_tiered_chunks((last_all + 1)[tiled], ktier_all[tiled],
                                tiers, 128, tier_b=CHUNK_B_TIERS)
    tids, cwidth, ck, pad_b = max(chunks, key=lambda c: len(c[0]))
    ids = tiled[tids]
    csr = aggregate_csr_host(wb, ck, width=cwidth, n_windows=pad_b,
                             win_idx=ids)[:-1]
    ns_u8, keylo, clo, didx, dval, eidx, xkey, xcnt = csr
    B, W = ns_u8.shape
    P = len(keylo)
    N = B * W * ck
    print(f"chunk: W={cwidth} K={ck} B={B} P={P} slots={N}")
    dev = {k: jnp.asarray(v) for k, v in zip(
        "ns keylo clo didx dval eidx xkey xcnt".split(), csr)}
    # host-precomputed flat indices (to isolate the colid machinery)
    nb_h = ns_u8.astype(np.int64).reshape(-1)
    start_h = np.concatenate([[0], np.cumsum(nb_h)])[:-1]
    colid_h = np.repeat(np.arange(B * W), nb_h)
    slot_h = np.arange(len(colid_h)) - start_h[colid_h]
    flat_h = (colid_h * ck + slot_h).astype(np.int32)
    flat_h = np.concatenate([flat_h, N + np.arange(P - len(flat_h),
                                                   dtype=np.int32)])
    dev["flat"] = jnp.asarray(flat_h)

    U32 = jnp.uint32

    def colid_machinery(d):
        nb = d["ns"].astype(jnp.int32).reshape(-1)
        cum = jnp.cumsum(nb)
        ends = jnp.zeros(P + 1, jnp.int32).at[cum].add(
            1, mode="drop", indices_are_sorted=True)
        colid = jnp.cumsum(ends)[:P]
        start = cum - nb
        slot = (jnp.arange(P, dtype=jnp.int32)
                - start[jnp.minimum(colid, B * W - 1)])
        in_rng = colid < B * W
        return jnp.where(in_rng, colid * ck + slot,
                         N + jnp.arange(P, dtype=jnp.int32))

    def packed_entries(d):
        p = d["keylo"].astype(U32) | (d["clo"].astype(U32) << 24)
        return p.at[d["didx"]].add(d["dval"].astype(U32) << 16, mode="drop",
                                   indices_are_sorted=True,
                                   unique_indices=True)

    def scatter_only(d):
        return jnp.full((N,), 0xFFFFFFFF, U32).at[d["flat"]].set(
            packed_entries(d), mode="drop", unique_indices=True,
            indices_are_sorted=True)

    def decode(pk, d):
        empty = pk == U32(0xFFFFFFFF)
        key = jnp.where(empty, jnp.int32(-1),
                        (pk & U32(0xFFFFFF)).astype(jnp.int32))
        cnt = jnp.where(empty, U32(0), pk >> U32(24)).astype(jnp.int32)
        fe = jnp.where(d["eidx"] < P,
                       d["flat"][jnp.minimum(d["eidx"], P - 1)],
                       N + jnp.arange(d["eidx"].shape[0], dtype=jnp.int32))
        key = key.at[fe].set(d["xkey"], mode="drop", unique_indices=True)
        cnt = cnt.at[fe].set(d["xcnt"], mode="drop", unique_indices=True)
        return key.reshape(B, W, ck), cnt.reshape(B, W, ck)

    def cov_of(key, cnt):
        return jnp.sum(jnp.where(((key >> 12) & 1) == 0, cnt, 0), axis=-1)

    arms = {
        "colid_only": lambda d: colid_machinery(d).sum(dtype=jnp.int64),
        "pack_only": lambda d: packed_entries(d).sum(dtype=jnp.int64),
        "scatter_only": lambda d: scatter_only(d).sum(dtype=jnp.int64),
        "scatter+decode": lambda d: sum(
            x.sum(dtype=jnp.int64) for x in decode(scatter_only(d), d)),
        "full_hostflat": lambda d: (lambda kc: kc[0].sum(dtype=jnp.int64)
                                    + kc[1].sum(dtype=jnp.int64)
                                    + cov_of(*kc).sum(dtype=jnp.int64))(
            decode(scatter_only(d), d)),
        "init_only": lambda d: jnp.full((N,), 0xFFFFFFFF, U32)
        .sum(dtype=jnp.int64),
    }
    fns = {}
    for name, f in arms.items():
        jf = jax.jit(f)
        int(jf(dev))  # compile + warm
        fns[name] = jf
        print(f"compiled {name}", flush=True)
    times = {k: [] for k in fns}
    for _ in range(n_iter):
        for name, f in fns.items():
            t0 = time.time()
            int(f(dev))
            times[name].append(time.time() - t0)
    for name, v in times.items():
        print(f"{name:16s} min {min(v)*1e3:7.1f} ms  med "
              f"{sorted(v)[len(v)//2]*1e3:7.1f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
