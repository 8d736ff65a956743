#!/usr/bin/env python3
"""Benchmark: device consensus engine throughput (windows/s/chip).

Times the hot kernel pair (batched windowed Viterbi DP + backtrack,
ops/consensus.py) on realistic window slot-tables built from the bundled
reference test data (100 kb contig, 575 real HiFi reads at ~74x), steady-state
over the real chip.

vs_baseline: ratio against the same DP executed by the single-thread host
implementation (pipeline/host_fallback.py) on identical windows — i.e. device
speedup over this machine's host path with identical semantics. (The reference
Rust binary cannot be built in this environment — no cargo; BASELINE.json's
64-thread-Rust comparison is approximated by this single-host ratio.)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def build_real_windows():
    from nextpolish2_tpu.config import PolishConfig
    from nextpolish2_tpu.io.bam import BamReader
    from nextpolish2_tpu.io.fastx import read_fastx
    from nextpolish2_tpu.models.oracle import build_alignseqs
    from nextpolish2_tpu.pipeline.windows import build_window_batch
    from nextpolish2_tpu.utils.seqcodes import ASCII2CODE

    base = os.path.join(os.path.dirname(os.path.abspath(__file__)), "testdata")
    bam = os.path.join(base, "hifi.map.sort.bam")
    asm = dict(read_fastx("/root/reference/test/asm.fa.gz"))
    tseq = list(asm.values())[0]
    recs = next(BamReader(bam).by_contig())[1]
    cfg = PolishConfig(min_ctg_len=1000)
    aligns = build_alignseqs(tseq, recs, cfg)
    ref_codes = ASCII2CODE[np.frombuffer(tseq, dtype=np.uint8)]
    wb = build_window_batch(aligns, len(tseq), ref_codes, target=cfg.window_len)
    return wb, cfg


def main() -> int:
    t_setup = time.time()
    import jax
    import jax.numpy as jnp

    from nextpolish2_tpu.ops.consensus import SlotTables, backtrack, consensus_dp
    from nextpolish2_tpu.pipeline.host_fallback import host_window_dp
    from nextpolish2_tpu.pipeline.windows import aggregate_host
    from nextpolish2_tpu.utils.jaxcfg import bucket, configure_jax

    configure_jax()
    wb, cfg = build_real_windows()
    K = cfg.max_kmers_per_col
    nw = wb.n_windows
    # same fixed shapes as the engine: one width tier, B = 128-window chunks
    tiers = [bucket(cfg.window_len + 256, 128), bucket(2 * cfg.window_len + 512, 128)]
    width = tiers[0] if wb.width <= tiers[0] else tiers[1]
    B = 128
    key_tab, cnt_tab, coverage, n_slots, overflow = aggregate_host(
        wb, K, width=width, n_windows=B, win_lo=0, win_hi=min(nw, B))
    lead = np.zeros(B, dtype=np.int64)
    lead[:nw] = np.maximum(wb.window_start - 2, 0)
    seed = np.zeros(B, dtype=bool)
    seed[:nw] = wb.window_start > 0
    last_col = np.zeros(B, dtype=np.int32)
    last_col[:nw] = (wb.window_start + wb.window_len - 1 - lead[:nw]).astype(np.int32)

    tables = SlotTables(
        key=jnp.asarray(key_tab), count=jnp.asarray(cnt_tab),
        coverage=jnp.asarray(coverage), n_slots=jnp.asarray(n_slots),
        overflow=jnp.asarray(overflow))
    jlead, jseed, jlast = jnp.asarray(lead), jnp.asarray(seed), jnp.asarray(last_col)
    max_steps = int(width + 128)
    use_pallas = jax.default_backend() not in ("cpu",)

    @jax.jit
    def step(tables, jlead, jseed, jlast):
        if use_pallas:
            from nextpolish2_tpu.ops.consensus_pallas import consensus_dp_pallas

            scores, besti, lvl = consensus_dp_pallas(
                tables.key, tables.count, tables.coverage, jlead, jseed)
            besti = besti.astype(jnp.int8)
        else:
            scores, besti, lvl = consensus_dp(tables, jlead, jseed)
        out = backtrack(tables, scores, besti, jlast, jseed, max_steps)
        # device-side checksum: forces full execution; only a scalar crosses the
        # tunnel (block_until_ready does NOT block on the axon backend)
        chk = (scores.sum(dtype=jnp.int64) + out[1].sum(dtype=jnp.int64)
               + out[5].sum(dtype=jnp.int64))
        return chk

    float(step(tables, jlead, jseed, jlast))  # warmup/compile
    n_iter = 10
    t0 = time.time()
    for _ in range(n_iter):
        c = step(tables, jlead, jseed, jlast)
    c = int(c)  # materialize the last checksum (chain is sequential on device)
    dt = time.time() - t0
    n_real = min(nw, B)  # count real windows, not chunk padding
    windows_per_s = n_real * n_iter / dt
    bases_per_s = windows_per_s * float(np.mean(wb.window_len))

    # host baseline: same DP semantics, single thread, on a median-size window
    order = np.argsort(wb.n_tags)
    wmid = int(order[nw // 2])
    hcols, hkeys = wb.window_stream(wmid)
    t0 = time.time()
    host_window_dp(hcols, hkeys, wb.width, int(lead[wmid]),
                   int(last_col[wmid]), bool(seed[wmid]))
    host_dt = time.time() - t0
    host_windows_per_s = 1.0 / host_dt
    vs_baseline = windows_per_s / host_windows_per_s

    print(json.dumps({
        "metric": "consensus_windows_per_s_per_chip",
        "value": round(windows_per_s, 2),
        "unit": f"windows/s (W~{int(np.mean(wb.window_len))} cols, ~74x real HiFi; "
                f"~{bases_per_s/1e6:.1f} Mbases/s DP throughput)",
        "vs_baseline": round(vs_baseline, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
