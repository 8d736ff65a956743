#!/usr/bin/env python3
"""Profile the host-pipeline stages on the 4.6 Mb E. coli fixture.

Times each stage independently (no device DP) to locate host costs at Mb scale
(round-1: plan_windows 4,950 s, ingest 1,046 s, aggregate 67 s/chunk; all were
page-fault provisioning artifacts — see np2native.cc header).
Run: python3 tools/profile_scale.py [n_chunks] [prefault_GB]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def t(label, fn, *a, **kw):
    t0 = time.perf_counter()
    out = fn(*a, **kw)
    dt = time.perf_counter() - t0
    print(f"{label:40s} {dt:10.2f}s", flush=True)
    return out


def main():
    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    prefault_gb = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
    from nextpolish2_tpu.config import PolishConfig
    from nextpolish2_tpu.io.fastx import read_fastx
    from nextpolish2_tpu.io import native
    from nextpolish2_tpu.models.oracle import build_alignseqs_native
    from nextpolish2_tpu.pipeline.windows import aggregate_host, build_window_batch
    from nextpolish2_tpu.utils.seqcodes import ASCII2CODE
    from nextpolish2_tpu.utils.jaxcfg import bucket
    from nextpolish2_tpu.utils import timing

    timing.enable(True)

    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "testdata")
    bam = os.path.join(base, "ecoli.bam")
    cfg = PolishConfig(min_ctg_len=1000)

    if prefault_gb:
        t(f"prefault {prefault_gb} GB", native.prefault,
          int(prefault_gb * (1 << 30)))

    name, tseq = t("read_fasta", lambda: next(read_fastx(
        os.path.join(base, "ecoli.fa"))))
    print(f"contig: {name} {len(tseq)} bp", flush=True)
    tseq_codes = ASCII2CODE[np.frombuffer(tseq, dtype=np.uint8)]

    t("np2_open (decompress+header)", native._handle_for, bam)
    aligns = t("build_alignseqs_native (extract+numpy)",
               build_alignseqs_native, bam, 0, tseq, cfg)
    print(f"  alignseqs: {len(aligns)}", flush=True)

    ref_codes = tseq_codes
    wb = t("build_window_batch (anchors+plan+sort)", build_window_batch,
           aligns, len(tseq), ref_codes, cfg.window_len)
    print(f"  n_windows={wb.n_windows} width={wb.width} "
          f"stream={len(wb.t_sorted)}", flush=True)

    K = cfg.max_kmers_per_col
    tiers = [bucket(cfg.window_len + 256, 128), bucket(2 * cfg.window_len + 512, 128)]
    width = tiers[0] if wb.width <= tiers[0] else tiers[1]
    CHUNK_B = 128
    for ci in range(n_chunks):
        c0 = ci * CHUNK_B
        if c0 >= wb.n_windows:
            break
        c1 = min(c0 + CHUNK_B, wb.n_windows)
        t(f"aggregate chunk {ci} [{c0}:{c1}]", aggregate_host, wb, K,
          width=width, n_windows=CHUNK_B, win_lo=c0, win_hi=c1)
    # a late chunk to detect position-dependent cost
    late0 = (wb.n_windows // CHUNK_B - 1) * CHUNK_B
    if late0 > n_chunks * CHUNK_B:
        t(f"aggregate LATE chunk [{late0}:{late0+CHUNK_B}]", aggregate_host,
          wb, K, width=width, n_windows=CHUNK_B, win_lo=late0,
          win_hi=min(late0 + CHUNK_B, wb.n_windows))
    timing.report()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
