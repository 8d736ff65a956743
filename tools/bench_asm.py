#!/usr/bin/env python3
"""A/B the CSR assembly formulations on chip (resident inputs, interleaved
min-of-N so hypervisor hour-swings can't bias one arm):

  two-scatter   (default): key and cnt scattered separately over `flat`
  paired        (NP2_ASM_PAIRED=1): ONE scatter of [P, 2] (key, cnt) rows

Assembly is ~70% of real device time on the dominant K=8 B=512 chunk
(README round-3 decomposition), so any scatter-lowering win lands directly
on the fused dispatch. Usage: python3 tools/bench_asm.py [n_iter]
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
    from nextpolish2_tpu.ops import consensus as C
    from nextpolish2_tpu.pipeline.engine import (CHUNK_B_TIERS,
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
    last_all = (wb.window_start + wb.window_len - 1 - lead_all).astype(np.int32)
    ktier_all = window_ktiers(wb, n_pos, K)
    tiled = np.tile(np.arange(nw), 32)
    chunks = plan_tiered_chunks((last_all + 1)[tiled], ktier_all[tiled],
                                tiers, 128, tier_b=CHUNK_B_TIERS)
    tids, cwidth, ck, pad_b = max(chunks, key=lambda c: len(c[0]))
    ids = tiled[tids]
    csr = aggregate_csr_host(wb, ck, width=cwidth, n_windows=pad_b,
                             win_idx=ids)[:-1]
    ns_u8, keylo, clo, didx, dval, eidx, xkey, xcnt = csr
    B, W = ns_u8.shape
    print(f"dominant chunk: W={cwidth} K={ck} B={B} P={len(keylo)}")
    dev = [jnp.asarray(x) for x in csr]

    @jax.jit
    def chk(*xs):
        return sum(x.sum(dtype=jnp.int64) for x in xs)

    def make(variant: str):
        os.environ["NP2_ASM_VARIANT"] = variant
        f = jax.jit(functools.partial(C.assemble_csr, B=B, W=W, K=ck))
        out = f(*dev)          # trace now, while the env var is set
        int(chk(*out))
        return f

    arms = {v: make(v) for v in ("two", "paired", "narrow", "fused1")}
    os.environ.pop("NP2_ASM_VARIANT", None)
    times = {k: [] for k in arms}
    for _ in range(n_iter):
        for name, f in arms.items():   # interleaved
            t0 = time.time()
            out = f(*dev)
            int(chk(*out))
            times[name].append(time.time() - t0)
    for name, v in times.items():
        print(f"{name:12s} min {min(v)*1e3:7.1f} ms  med "
              f"{sorted(v)[len(v)//2]*1e3:7.1f} ms")
    base = min(times["two"])
    for name in arms:
        if name != "two":
            print(f"{name} speedup x{base / min(times[name]):.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
