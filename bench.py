#!/usr/bin/env python3
"""Benchmark: device consensus engine throughput + honest host baselines.

Measures, on the bundled real data (100 kb contig, 575 real HiFi reads, ~74x):
  1. value / "windows/s/chip": the hot kernel pair (batched windowed Viterbi
     DP + backtrack) steady-state on the real chip, via the SAME jitted
     callables the production engine dispatches (no bench-only fusion).
  2. vs_host_1t: ratio against the single-thread host DP with identical
     semantics (pipeline/host_fallback.py) on a window sample.
  3. vs_host_mt: ratio against an nproc-process host pool over the same
     sample — the strongest host configuration this VM offers.
  4. e2e_gbp_per_hr: wall-clock of a full steady-state polish() of the 100 kb
     contig (ingest -> windows -> device DP -> k-mer/phasing -> FASTA),
     compiles excluded by running the pipeline twice and timing the second.

vs_baseline stays = vs_host_1t for continuity with BENCH_r01. BASELINE.json's
north star is >=10x over a 64-thread Rust build on human T2T at v5p-16; no
Rust toolchain exists here, but the host DP is now the native C++
np2_host_window_dp (identical semantics, hash-bucketed — a true
single-thread Rust-parity proxy), so vs_host_1t/64 lower-bounds the
single-chip multiple of that target (multi-chip 'win'-axis sharding,
engine.py, is the intended path to >=10x at pod scale).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "testdata")
ASM = "/root/reference/test/asm.fa.gz"


def build_real_windows():
    from nextpolish2_tpu.config import PolishConfig
    from nextpolish2_tpu.io.bam import BamReader
    from nextpolish2_tpu.io.fastx import read_fastx
    from nextpolish2_tpu.models.oracle import build_alignseqs
    from nextpolish2_tpu.pipeline.windows import build_window_batch
    from nextpolish2_tpu.utils.seqcodes import ASCII2CODE

    bam = os.path.join(BASE, "hifi.map.sort.bam")
    asm = dict(read_fastx(ASM))
    tseq = list(asm.values())[0]
    recs = next(BamReader(bam).by_contig())[1]
    cfg = PolishConfig(min_ctg_len=1000)
    aligns = build_alignseqs(tseq, recs, cfg)
    ref_codes = ASCII2CODE[np.frombuffer(tseq, dtype=np.uint8)]
    wb = build_window_batch(aligns, len(tseq), ref_codes, target=cfg.window_len)
    return wb, cfg, len(tseq)


def _host_task(args):
    from nextpolish2_tpu.pipeline.host_fallback import host_window_dp

    cols, keys, width, lead, last, seed = args
    host_window_dp(cols, keys, width, lead, last, seed)
    return 0


def e2e_polish_seconds(n_runs: int = 2):
    """Full-pipeline wall time on the 100 kb contig; run n_runs times and
    return (last run's seconds, stage->seconds table of that run, the REAL
    long-allele scoring jobs recorded during the steady run — the honest
    input for the device k-mer scorer A/B below). The stage table is the
    regression guard for the NON-DP stages (k-mer scoring, allele extract,
    splice/recheck, phasing) that the headline windows/s metric does not
    cover."""
    import io

    import nextpolish2_tpu.models.oracle_lq as olq
    from nextpolish2_tpu.config import PolishConfig
    from nextpolish2_tpu.pipeline.orchestrator import polish
    from nextpolish2_tpu.utils import timing

    bam = os.path.join(BASE, "hifi.map.sort.bam")
    yaks = [os.path.join(BASE, "k21.yak"), os.path.join(BASE, "k31.yak")]
    cfg = PolishConfig(min_ctg_len=1000)
    stages = {}
    jobs: list = []
    orig = olq.batch_min_kscores

    def record(seqs, table, minc):
        if table.ksize < 32:
            jobs.extend(seqs)
        return orig(seqs, table, minc)

    n_runs = max(n_runs, 3)  # min over steady runs (hour-noise robustness)
    dts = []
    for i in range(n_runs):
        if i == n_runs - 1:           # time stages on the final run
            timing.reset()
            timing.enable(True)
            olq.batch_min_kscores = record
        sink = io.BytesIO()
        t0 = time.time()
        try:
            polish(ASM, bam, yaks, cfg, out=sink)
        finally:
            olq.batch_min_kscores = orig
        dts.append(time.time() - t0)
    stages = timing.snapshot()
    timing.enable(False)
    timing.reset()
    return min(dts[1:]), stages, jobs


def kscore_device_ab(jobs, use_pallas: bool):
    """Device fused k-mer scorer vs the host composite on the REAL allele
    jobs of the 100 kb polish, tiled to a multi-Mb batch (the routing
    threshold's regime — VERDICT r3 item 6: the path must be load-bearing
    and its win/loss recorded at real batch sizes). Returns
    (speedup, batch_mb, n_alleles) or None off-chip / without jobs.
    Interleaved min-of-3 per arm (hypervisor noise)."""
    if not use_pallas or not jobs:
        return None
    import nextpolish2_tpu.models.oracle_lq as olq
    from nextpolish2_tpu.io.yak import load_yak
    from nextpolish2_tpu.ops.kmer_score import device_min_kscores

    table = load_yak(os.path.join(BASE, "k21.yak"))
    base_bytes = sum(len(s) for s in jobs)
    reps = max(1, (8 << 20) // max(1, base_bytes))
    batch = jobs * reps
    mb = sum(len(s) for s in batch) / 1e6
    table.use_device = True
    dev = device_min_kscores(table, batch, 5)       # compile + table build
    if dev is None:
        return None
    table.use_device = False
    host = olq.batch_min_kscores(batch, table, 5)   # host composite
    if not np.array_equal(np.asarray(dev, dtype=np.int64), host):
        raise AssertionError("device k-mer scorer != host composite")
    t_dev, t_host = [], []
    table.use_device = True
    for _ in range(3):
        t0 = time.time()
        device_min_kscores(table, batch, 5)
        t_dev.append(time.time() - t0)
        table.use_device = False
        t0 = time.time()
        olq.batch_min_kscores(batch, table, 5)
        t_host.append(time.time() - t0)
        table.use_device = True
    return min(t_host) / min(t_dev), mb, len(batch)


def e2e_single_large(n_runs: int = 2):
    """Steady-state polish of the 4.6 Mb SINGLE-contig E. coli fixture at
    -t 1: the few-large-contig regime VERDICT r3 item 8 tracks (a lone
    contig must not be the slow case; cross-contig batching can't help it).
    Returns (seconds, bases, stage table) or None when the fixture is
    absent."""
    import io

    from nextpolish2_tpu.config import PolishConfig
    from nextpolish2_tpu.pipeline.orchestrator import PolishStats, polish
    from nextpolish2_tpu.utils import timing

    bam = os.path.join(BASE, "ecoli.bam")
    fa = os.path.join(BASE, "ecoli.fa")
    yaks = [os.path.join(BASE, "ecoli.k21.yak")]
    if not (os.path.exists(bam) and os.path.exists(fa)):
        return None
    cfg = PolishConfig(min_ctg_len=1000)
    bases = 0
    dts = []
    for i in range(n_runs):
        timing.reset()
        timing.enable(i == n_runs - 1)
        sink = io.BytesIO()
        stats = PolishStats()
        t0 = time.time()
        polish(fa, bam, yaks, cfg, out=sink, stats=stats)
        dts.append(time.time() - t0)
        bases = stats.in_bases
    stages = timing.snapshot()
    timing.enable(False)
    timing.reset()
    # run 0 pays compiles; min over the rest (hour-noise robustness)
    return min(dts[1:]) if len(dts) > 1 else dts[0], bases, stages


def e2e_multi_seconds(n_runs: int = 2):
    """Steady-state multi-contig polish (testdata/m20: 20 contigs, ~1 Mb,
    ~30x) through the production cross-contig batcher (threads=8). Returns
    (seconds of the last run, total bases, batch fill, csr share)."""
    import io

    from nextpolish2_tpu.config import PolishConfig
    from nextpolish2_tpu.pipeline.orchestrator import PolishStats, polish

    bam = os.path.join(BASE, "m20.bam")
    fa = os.path.join(BASE, "m20.fa")
    yaks = [os.path.join(BASE, "m20.k21.yak")]
    if not (os.path.exists(bam) and os.path.exists(fa)):
        return None
    cfg = PolishConfig(min_ctg_len=1000, threads=8)
    # the batcher's flush shapes are timing-dependent, so a later run can
    # still hit a fresh (multi-minute) axon compile: run 3x, report the MIN
    # of the last two (the steady-state number)
    from nextpolish2_tpu.utils import timing

    times, bases, stats, stage_tabs = [], 0, None, []
    for _ in range(max(n_runs, 3)):
        timing.reset()
        timing.enable(True)
        sink = io.BytesIO()
        stats = PolishStats()
        t0 = time.time()
        polish(fa, bam, yaks, cfg, out=sink, stats=stats)
        times.append(time.time() - t0)
        stage_tabs.append(timing.snapshot())
        bases = stats.in_bases
    timing.enable(False)
    timing.reset()
    best = 1 + int(np.argmin(times[1:]))
    dt = times[best]
    csr_share = stats.csr_batches / max(1, stats.batches)
    return dt, bases, stats.batch_fill, csr_share, stage_tabs[best]


def provisioning_gb_s(budget_s: float = 3.0, chunk_mb: int = 64) -> float:
    """Observed hypervisor page-provisioning rate (GB/s): touch fresh
    anonymous mappings (one byte per 4 KB page) until the time budget is
    spent. This is the quantity that swings ~1000x hour to hour on these
    VMs (CLAUDE.md) and silently dominates ingest-heavy stages — recording
    it with every bench makes round-over-round regressions attributable
    (VERDICT r4 item 3)."""
    import mmap

    total = 0
    t0 = time.time()
    while time.time() - t0 < budget_s:
        m = mmap.mmap(-1, chunk_mb << 20)
        step = 4096
        for off in range(0, len(m), step):
            m[off] = 1
        total += len(m)
        m.close()
    dt = time.time() - t0
    return total / dt / 1e9


def dispatch_rtt_ms(n: int = 10) -> float:
    """Min round-trip of a tiny device dispatch + scalar pull (the fixed
    per-dispatch floor every chunk pays on the tunneled backend)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x.sum())
    x = jnp.ones(8, dtype=jnp.int32)
    int(f(x))  # compile
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        int(f(x))
        best = min(best, time.time() - t0)
    return best * 1e3


def main() -> int:
    import jax
    import jax.numpy as jnp

    from nextpolish2_tpu.pipeline.windows import aggregate_host
    from nextpolish2_tpu.utils.jaxcfg import bucket, configure_jax

    configure_jax()
    use_pallas = jax.default_backend() not in ("cpu",)
    noise_gb_s = provisioning_gb_s()

    # ---- end-to-end first: pays every in-process compile exactly once, and
    # the kernel loop below reuses those caches (same jitted callables)
    e2e_s, e2e_stages, kscore_jobs = e2e_polish_seconds(2)
    contig_bp = 100_000
    e2e_gbp_per_hr = (contig_bp / 1e9) / (e2e_s / 3600.0)
    # regression guard for the stages the windows/s metric does not cover
    # (k-mer scoring, allele extract, splice/recheck, phasing): top stages of
    # the steady-state e2e run, seconds
    stage_s = {k: round(v, 2) for k, v in sorted(
        e2e_stages.items(), key=lambda kv: -kv[1])[:8]}

    # ---- single-large-contig regime (4.6 Mb E. coli at -t 1)
    single = e2e_single_large(2)
    if single is not None:
        sl_s, sl_bases, sl_stages = single
        e2e_ecoli_gbp_per_hr = (sl_bases / 1e9) / (sl_s / 3600.0)
        ecoli_stage_s = {k: round(v, 2) for k, v in sorted(
            sl_stages.items(), key=lambda kv: -kv[1])[:8]}
    else:
        sl_s, e2e_ecoli_gbp_per_hr = -1.0, -1.0
        ecoli_stage_s = {}

    # ---- fused device k-mer scorer vs host composite on the REAL allele
    # jobs (multi-Mb tiled batch = the routing threshold's regime)
    kab = kscore_device_ab(kscore_jobs, use_pallas)
    kscore_dev_speedup, kscore_mb = (round(kab[0], 2), round(kab[1], 1)) \
        if kab else (-1.0, -1.0)

    # ---- multi-contig production mode (threads=8 through the batcher):
    # the figure that projects to a real assembly (BENCH r3 item 3)
    multi = e2e_multi_seconds(2)
    if multi is not None:
        multi_s, multi_bases, multi_fill, multi_csr, multi_stages = multi
        e2e_multi_gbp_per_hr = (multi_bases / 1e9) / (multi_s / 3600.0)
        multi_stage_s = {k: round(v, 2) for k, v in sorted(
            multi_stages.items(), key=lambda kv: -kv[1])[:8]}
    else:
        multi_s = multi_fill = multi_csr = e2e_multi_gbp_per_hr = -1.0
        multi_stage_s = {}

    wb, cfg, contig_bp = build_real_windows()
    K = cfg.max_kmers_per_col
    nw = wb.n_windows
    # same fixed shapes + tiered chunk plan as the engine (one width tier on
    # this contig; windows regrouped into K=8 / K=48 chunks, engine.py)
    from nextpolish2_tpu.pipeline.engine import (CHUNK_B_TIERS,
                                                 plan_tiered_chunks,
                                                 window_ktiers)

    tiers = [bucket(cfg.window_len + 256, 128), bucket(2 * cfg.window_len + 512, 128)]
    B = 128
    lead_all = np.maximum(wb.window_start - 2, 0)
    seed_all = wb.window_start > 0
    last_all = (wb.window_start + wb.window_len - 1 - lead_all).astype(np.int32)
    span_all = last_all + 1
    ktier_all = window_ktiers(wb, contig_bp, K)
    # steady-state sweep: 32 copies of the contig's window set, so the tiered
    # plan fills whole chunks (incl. the K=8 tier's 512-lane chunks) like a
    # multi-Mb assembly does (a single 100 kb contig alone underfills the
    # tiles and measures padding, not DP)
    REP = 32
    tiled = np.tile(np.arange(nw), REP)
    chunks = plan_tiered_chunks(span_all[tiled], ktier_all[tiled], tiers, B,
                                tier_b=CHUNK_B_TIERS)

    from nextpolish2_tpu.pipeline.engine import (dispatch_chunk,
                                                 dispatch_chunk_csr)
    from nextpolish2_tpu.pipeline.windows import aggregate_csr_host

    hostchunks = []
    n_real = 0
    for tids, cwidth, ck, pad_b in chunks:
        ids = tiled[tids]
        n = len(ids)
        n_real += n
        # the EXACT production chunk inputs: CSR-direct native aggregation
        # (engine.device_consensus_stream); dense tables only as fallback
        csr = aggregate_csr_host(wb, ck, width=cwidth, n_windows=pad_b,
                                 win_idx=ids)
        agg = None
        if csr is None:
            agg = aggregate_host(wb, ck, width=cwidth, n_windows=pad_b,
                                 win_idx=ids)
        lead = np.zeros(pad_b, dtype=np.int64)
        lead[:n] = lead_all[ids]
        seed = np.zeros(pad_b, dtype=bool)
        seed[:n] = seed_all[ids]
        last_col = np.zeros(pad_b, dtype=np.int32)
        last_col[:n] = last_all[ids]
        hostchunks.append((csr, agg, lead, seed, last_col, int(cwidth),
                           int(ck)))

    @jax.jit
    def _chk(packed):
        # device-side checksum: forces full execution; only a scalar crosses
        # the tunnel (block_until_ready does NOT block on the axon backend)
        return packed.sum(dtype=jnp.int64)

    from nextpolish2_tpu.pipeline.engine import upload_pool

    def step():
        # the EXACT production dispatch (engine loop + batcher both submit
        # pack + upload + compute to engine.upload_pool's worker — the H2D
        # transfer of chunk i+1 overlaps compute of chunk i); one checksum
        # pull per sweep forces the whole chain
        futs = []
        for csr, agg, lead, seed, last_col, cwidth, ck in hostchunks:
            if csr is not None:
                futs.append(upload_pool().submit(
                    dispatch_chunk_csr, csr[:-1], lead, seed, last_col,
                    cwidth, ck))
            else:
                futs.append(upload_pool().submit(
                    dispatch_chunk, agg, lead, seed, last_col, cwidth, ck))
        c = None
        for f in futs:
            s = _chk(f.result())
            c = s if c is None else c + s
        return c

    # ---- device-resident arm: same jitted programs on PRE-UPLOADED blobs
    # (pack + host->device upload excluded). Separates "the tunnel is
    # congested this hour" from "the device program regressed": the
    # production value above is transfer-bound on the tunneled backend.
    from nextpolish2_tpu.ops.consensus import (dp_backtrack_csr_blob,
                                               nibble_ns_for)
    from nextpolish2_tpu.pipeline.windows import pack_csr_blob

    resident = []
    for csr, agg, lead, seed, last_col, cwidth, ck in hostchunks:
        if csr is None:
            continue
        parts = csr[:-1]  # strip the host-side overflow flags
        ns_u8 = parts[0]
        Bc, Wc = ns_u8.shape
        blob = pack_csr_blob(*parts, lead, seed, last_col,
                             nibble_ns=nibble_ns_for(Bc, Wc, ck))
        resident.append((jnp.asarray(blob),
                         dict(B=Bc, W=Wc, K=ck, P=len(parts[1]),
                              Pd=len(parts[3]), Pe=len(parts[5]),
                              max_steps=int(cwidth + 128),
                              use_pallas=use_pallas)))

    def step_resident():
        c = None
        for db, kw in resident:
            s = _chk(dp_backtrack_csr_blob(db, **kw))
            c = s if c is None else c + s
        return c

    # INTERLEAVED A/B groups (VERDICT r4 item 3): the hypervisor/tunnel rate
    # swings 2-10x hour to hour, so the dispatch and resident arms alternate
    # within the same minutes — a cross-arm ratio from one hour is then
    # attributable to code, not the clock. Headline = mean of the dispatch
    # groups (continuity with r1-r4); peak + min-of-N also recorded.
    int(step())  # warmup (compile cache should already be hot from e2e)
    if resident:
        int(step_resident())
    n_groups, iters_per_group = 3, 5
    group_dt, res_dt = [], []
    for _ in range(n_groups):
        t0 = time.time()
        for _ in range(iters_per_group):
            c = step()
        c = int(c)  # materialize: forces the whole group's device chain
        group_dt.append(time.time() - t0)
        if resident:
            t0 = time.time()
            for _ in range(iters_per_group):
                c = step_resident()
            c = int(c)
            res_dt.append(time.time() - t0)
    value_resident = (float(n_real * iters_per_group / min(res_dt))
                      if res_dt else -1.0)

    rtt_ms = dispatch_rtt_ms()
    # n_real = all real windows across the tiered chunks (padding excluded)
    per_group_wps = [n_real * iters_per_group / dt for dt in group_dt]
    windows_per_s = float(np.mean(per_group_wps))
    cv = float(np.std(per_group_wps) / np.mean(per_group_wps))
    # peak sustained group: the tunneled hypervisor stalls 2-10x hour to
    # hour (CLAUDE.md); the max group is the least-stalled observation of
    # the SAME fixed work (each group = 5 full sweeps), reported alongside
    # the mean so a noisy hour is visible rather than silently low
    windows_per_s_peak = float(np.max(per_group_wps))
    bases_per_s = windows_per_s * float(np.mean(wb.window_len))

    # ---- host baselines: same DP semantics, sampled at size quantiles of
    # the SAME window set the device timing covers (mean-cost match)
    order = np.argsort(wb.n_tags[:nw])
    qs = np.clip((np.array([0.1, 0.3, 0.5, 0.65, 0.8, 0.9, 0.95, 0.99])
                  * nw).astype(int), 0, nw - 1)
    sample = [int(order[q]) for q in qs]
    tasks = []
    for w in sample:
        hcols, hkeys = wb.window_stream(w)
        tasks.append((hcols, hkeys, wb.width, int(lead_all[w]),
                      int(last_all[w]), bool(seed_all[w])))
    t0 = time.time()
    for t in tasks:
        _host_task(t)
    host_1t_wps = len(tasks) / (time.time() - t0)

    import concurrent.futures as cf
    import multiprocessing as mp
    nproc = os.cpu_count() or 1
    # enough repeats that per-task IPC doesn't dominate the (fast, native)
    # window DP; whole-sample chunks keep the mix identical per dispatch
    reps = max(nproc, int(np.ceil(2.0 * host_1t_wps / len(tasks))))
    mt_tasks = tasks * reps
    # spawn (not fork): the parent holds live jax/axon tunnel threads
    with cf.ProcessPoolExecutor(max_workers=nproc,
                                mp_context=mp.get_context("spawn")) as pool:
        # spawn + import EVERY worker outside the clock (chunksize=1 fans the
        # warmup tasks across all nproc workers)
        list(pool.map(_host_task, tasks[:1] * nproc * 2, chunksize=1))
        t0 = time.time()
        list(pool.map(_host_task, mt_tasks, chunksize=len(tasks)))
        host_mt_wps = len(mt_tasks) / (time.time() - t0)

    vs_1t = windows_per_s / host_1t_wps
    vs_mt = windows_per_s / host_mt_wps
    print(json.dumps({
        "metric": "consensus_windows_per_s_per_chip",
        "value": round(windows_per_s, 2),
        "unit": f"windows/s (W~{int(np.mean(wb.window_len))} cols, ~74x real "
                f"HiFi; ~{bases_per_s/1e6:.1f} Mbases/s DP throughput)",
        "vs_baseline": round(vs_1t, 2),
        "vs_host_1t": round(vs_1t, 2),
        "vs_host_mt": round(vs_mt, 2),
        "host_threads": nproc,
        "device_cv": round(cv, 3),
        "value_peak_group": round(windows_per_s_peak, 2),
        "value_resident": round(value_resident, 2),
        "noise": {
            # hour metadata: cross-round comparisons are only meaningful at
            # similar provisioning rates / RTTs (CLAUDE.md; SCALE_r04 run6)
            "provision_gb_s": round(noise_gb_s, 3),
            "dispatch_rtt_ms": round(rtt_ms, 2),
            "interleaved_ab": True,
            "value_min_group": round(float(np.min(per_group_wps)), 2),
        },
        "scale_run": "SCALE_r05.json: 112.7 Mb SINGLE-CONTIG (segmented "
                     "engine) at -t4 on chip, 1932->1255 s over round 5, "
                     "peak RSS 41.7-45.5 GB = O(segment), 3/3 byte-identical "
                     "to truth + oracle spots; SCALE_r04.json: 92.5 Mb / 18 "
                     "contigs, 307.5 s = 1.08 Gbp/hr, 18/18 byte-identical",
        "r4_r5_comparison": "r5 production dispatch adds the upload pool "
                            "(pack+upload+compute on a helper worker): "
                            "measured 4.6k -> 6.2k w/s interleaved on chip "
                            "vs an 8.9k resident ceiling in the same "
                            "minutes (tools/bench_overlap.py); compare "
                            "BENCH_r04 value 7381 / resident 14635 only "
                            "via the noise block's provision_gb_s + "
                            "dispatch_rtt_ms at similar hours",
        "e2e_s_100kb": round(e2e_s, 1),
        "e2e_stage_s": stage_s,
        "e2e_gbp_per_hr": round(e2e_gbp_per_hr, 4),
        "e2e_multi_s": round(multi_s, 1),
        "e2e_multi_stage_s": multi_stage_s,
        "e2e_multi_gbp_per_hr": round(e2e_multi_gbp_per_hr, 4),
        "multi_batch_fill": round(multi_fill, 3),
        "multi_csr_share": round(multi_csr, 3),
        "e2e_ecoli_s": round(sl_s, 1),
        "e2e_ecoli_stage_s": ecoli_stage_s,
        "e2e_ecoli_gbp_per_hr": round(e2e_ecoli_gbp_per_hr, 4),
        "kscore_device_speedup": kscore_dev_speedup,
        "kscore_batch_mb": kscore_mb,
        "baseline_note": "host baseline is the native C++ window DP "
                         "(np2_host_window_dp) = a true single-thread "
                         "Rust-parity proxy; a 64-thread Rust build "
                         "(BASELINE.json, not buildable here) is <=64x that, "
                         f"so single-chip is >=~{vs_1t/64:.2f}x it; >=10x "
                         "comes from win-axis multi-chip sharding",
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
