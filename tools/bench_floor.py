#!/usr/bin/env python3
"""Decompose the production dispatch into its cost floor on the real chip:
host blob pack | host->device upload | resident DP+backtrack | output pull |
full path — per chunk tier, interleaved min-of-N (hypervisor noise swings
hour to hour; mins of interleaved samples are the only comparable numbers).

The sum of the stage floors vs the full-path time shows how much pipelining
hides, and which stage bounds windows/s (VERDICT r3 item 4: push past 10k w/s
or prove the floor).

Usage: python3 tools/bench_floor.py [n_iter]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    import jax
    import jax.numpy as jnp

    from bench import build_real_windows
    from nextpolish2_tpu.ops.consensus import (dp_backtrack_csr_blob,
                                               nibble_ns_for)
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
    span_all = last_all + 1
    ktier_all = window_ktiers(wb, n_pos, K)
    tiled = np.tile(np.arange(nw), 32)
    chunks = plan_tiered_chunks(span_all[tiled], ktier_all[tiled], tiers, 128,
                                tier_b=CHUNK_B_TIERS)

    # one representative chunk per (width, K, B) shape + counts
    by_shape = {}
    shape_n = {}
    for tids, cwidth, ck, pad_b in chunks:
        key = (int(cwidth), int(ck), int(pad_b))
        shape_n[key] = shape_n.get(key, 0) + len(tids)
        if key in by_shape:
            continue
        ids = tiled[tids]
        csr = aggregate_csr_host(wb, ck, width=cwidth, n_windows=pad_b,
                                 win_idx=ids)
        assert csr is not None
        lead = np.zeros(pad_b, dtype=np.int64)
        lead[: len(ids)] = lead_all[ids]
        seed = np.zeros(pad_b, dtype=bool)
        seed[: len(ids)] = seed_all[ids]
        last = np.zeros(pad_b, dtype=np.int32)
        last[: len(ids)] = last_all[ids]
        by_shape[key] = (csr[:-1], lead, seed, last)

    @jax.jit
    def _chk(words, meta):
        return words.sum(dtype=jnp.int64) + meta.sum(dtype=jnp.int64)

    @jax.jit
    def _chk1(x):
        return x.astype(jnp.int64).sum()

    def force(x):
        return int(_chk1(x)) if not isinstance(x, tuple) else int(_chk(*x))

    print(f"{len(chunks)} chunks over {len(by_shape)} shapes; "
          f"n_iter={n_iter} interleaved, reporting min")
    for key, (csr, lead, seed, last) in by_shape.items():
        cwidth, ck, B = key
        ns_u8, keylo, clo, didx, dval, eidx, xkey, xcnt = csr
        W = ns_u8.shape[1]
        blob = pack_csr_blob(*csr, lead, seed, last,
                             nibble_ns=nibble_ns_for(B, W, ck))
        mb = blob.nbytes / 1e6
        args = dict(B=B, W=W, K=ck, P=len(keylo), Pd=len(didx),
                    Pe=len(eidx), max_steps=int(cwidth + 128),
                    use_pallas=_use_pallas())
        # warm compile
        dev_blob = jnp.asarray(blob)
        force(dev_blob)
        out = dp_backtrack_csr_blob(dev_blob, **args)
        force(out)
        t_pack, t_up, t_dp, t_pull, t_full = [], [], [], [], []
        for _ in range(n_iter):
            t0 = time.time()
            b2 = pack_csr_blob(*csr, lead, seed, last,
                               nibble_ns=nibble_ns_for(B, W, ck))
            t_pack.append(time.time() - t0)

            t0 = time.time()
            db = jnp.asarray(b2)
            force(db)
            t_up.append(time.time() - t0)

            t0 = time.time()
            out = dp_backtrack_csr_blob(db, **args)
            force(out)
            t_dp.append(time.time() - t0)

            t0 = time.time()
            w = jax.device_get(out)   # ONE packed u16 array (pack_backtrack_out)
            t_pull.append(time.time() - t0)

            t0 = time.time()
            db = jnp.asarray(pack_csr_blob(*csr, lead, seed, last,
                                           nibble_ns=nibble_ns_for(B, W, ck)))
            w = jax.device_get(dp_backtrack_csr_blob(db, **args))
            t_full.append(time.time() - t0)
        pull_mb = w.nbytes / 1e6
        n_ch = shape_n[key]
        print(f"W={cwidth} K={ck} B={B} x{n_ch} chunks | blob {mb:.2f} MB "
              f"pull {pull_mb:.2f} MB | pack {min(t_pack)*1e3:.0f} ms "
              f"upload {min(t_up)*1e3:.0f} ms dp {min(t_dp)*1e3:.0f} ms "
              f"pull {min(t_pull)*1e3:.0f} ms | full {min(t_full)*1e3:.0f} ms "
              f"-> {B/min(t_full):.0f} w/s/chunk")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
