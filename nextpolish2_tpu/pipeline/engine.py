"""TPU polishing engine: device windowed consensus + shared host LQ machinery.

Per contig: host builds alignment tag streams and plans anchor-bounded windows
(pipeline/windows.py); the device aggregates pileups and runs the batched Viterbi
(ops/consensus.py); the host stitches window emissions into the exact global
backtrack stream, runs the reference LQ state machine over it, then the shared
allele-extraction/phasing/recheck path (models/oracle_lq.py).

Exactness: anchor-forced windowing makes windowed DP equal to the reference's
whole-contig DP (see pipeline/windows.py); every device result is bit-compared
against oracle semantics in tests. Windows that overflow static bounds (slots,
delta levels, path steps) trigger a whole-contig oracle fallback.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..config import PolishConfig
from ..io.bam import BamRecord
from ..io.yak import KmerTable
from ..models.oracle import build_alignseqs, passthrough_consensus
from ..models.oracle_align import AlignTags
from ..models.oracle_lq import (
    L_SUCC,
    extract_alleles,
    fill_seed_lqseqs,
    mark_hete_lqseqs,
    phase_reads_by_lqseqs,
    retrieve_kmer_count,
    reupdate_consensus_with_lqseqs,
    update_consensus_with_lqseqs,
)
from ..models.oracle_msa import Consensus, LqRegion, lq_from_qv_stream
from ..utils.seqcodes import ASCII2CODE, CODE2ASCII
from ..utils.timing import stage
from .host_fallback import host_window_dp
from .windows import (WindowOverflow, aggregate_csr_host, aggregate_csr_parts,
                      aggregate_host, build_window_batch)


def _use_pallas() -> bool:
    """Pallas DP on real TPU; XLA scan elsewhere (CPU tests lack Mosaic)."""
    import os

    if os.environ.get("NP2_NO_PALLAS"):
        return False
    import jax

    return jax.default_backend() not in ("cpu",)


def _dynamic_k() -> bool:
    """Opt-in dynamic-K Pallas kernel (NP2_DP_DYNK=1): per-column slot loop
    bounded by the column's real max slot count instead of K. Bit-exact to
    the static kernel (tests/test_pallas_dp.py); off by default until its
    on-chip speedup is confirmed."""
    import os

    return bool(os.environ.get("NP2_DP_DYNK"))


K_SMALL = 8   # small DP-kernel slot tier (K tier regrouping)
K_DENSE = 4   # dense upload width; deeper slots ride the exception scatter

def _chunk_b_k8() -> int:
    """Full-chunk batch for the K=8 tier (most real windows). Production
    throughput is bounded by the per-dispatch axon round trip (~25 ms
    regardless of chunk size once the CSR upload made transfer cheap), so
    the dominant tier ships 512-lane chunks. Overridable for A/B tooling."""
    import os

    return int(os.environ.get("NP2_CHUNK_B_K8", "512"))


def _chunk_b_k48() -> int:
    """Full-chunk batch for the fat K tier. Historically pinned at 128 to
    bound the dense host aggregation buffers; CSR-direct aggregation removed
    that constraint, so this is now a pure RTT-amortization / compile-cost
    trade measured by tools/bench_sweep.py."""
    import os

    return int(os.environ.get("NP2_CHUNK_B_K48", "128"))


CHUNK_B_TIERS = {K_SMALL: _chunk_b_k8(), 48: _chunk_b_k48()}

_UPLOAD_POOL = None


def upload_pool():
    """Single-worker pool that runs chunk pack + host->device upload +
    compute dispatch OFF the aggregation thread. The H2D transfer of chunk
    i+1 then overlaps both the host aggregation of chunk i+2 and the device
    compute of chunk i (tools/bench_overlap.py, chip, interleaved min-of-N:
    serial 3.5k / in-order pipeline 4.6k / this 6.2k / resident-ceiling
    8.9k w/s). ONE worker on purpose: uploads share one tunnel, and a
    single thread keeps dispatch order deterministic."""
    global _UPLOAD_POOL
    if _UPLOAD_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _UPLOAD_POOL = ThreadPoolExecutor(max_workers=1,
                                          thread_name_prefix="np2upload")
    return _UPLOAD_POOL


def chunk_b_tiers(fat_k: int) -> dict:
    """CHUNK_B_TIERS with the fat tier guaranteed at the ACTUAL
    cfg.max_kmers_per_col (window_ktiers returns {K_SMALL, K}); without
    this, the NP2_CHUNK_B_K48 knob silently no-ops for K != 48 configs."""
    t = dict(CHUNK_B_TIERS)
    t.setdefault(int(fat_k), _chunk_b_k48())
    return t


def dispatch_chunk(agg: tuple, lead: np.ndarray, seed: np.ndarray,
                   last_col: np.ndarray, cwidth: int, ck: int, jput=None,
                   sharded: bool = False):
    """ONE fused device dispatch for an aggregated chunk (the engine, the
    cross-contig batcher and bench.py all go through here). The tunneled
    TRANSPORT, not the DP, is the production bottleneck — and it charges a
    fixed cost per array in each direction — so single-device chunks ship
    the whole dispatch as ONE uint8 blob (flat CSR stream + per-window
    scalars; windows.pack_csr_blob) and every path returns the ONE-array
    packed output (u16 [B, steps + 8] words plus trailing meta;
    ops.consensus.pack_backtrack_out). Mesh-sharded chunks (sharded=True)
    fall back to the dense K_DENSE + exception-scatter format HERE only when
    the CSR-direct native aggregation was unavailable — the production
    sharded path rides the same CSR blob via dispatch_chunk_csr(mesh=...).
    agg = (key_tab, cnt_tab, coverage, n_slots, overflow);
    returns the pending device packed-output array."""
    import jax.numpy as jnp

    from ..ops.consensus import (SlotTables, dp_backtrack_csr_blob,
                                 dp_backtrack_packed,
                                 dp_backtrack_sparse_packed, nibble_ns_for)

    if jput is None:
        jput = jnp.asarray
    key_tab, cnt_tab, coverage, n_slots, overflow = agg
    max_steps = int(cwidth + 128)
    dyn = _dynamic_k()
    if not dyn and not sharded:
        from .windows import pack_csr_blob, split_csr

        B, W, K = key_tab.shape
        ns_u8, keylo, clo, didx, dval, eidx, xkey, xcnt = split_csr(
            key_tab, cnt_tab, n_slots)
        blob = pack_csr_blob(ns_u8, keylo, clo, didx, dval, eidx, xkey, xcnt,
                             lead, seed, last_col,
                             nibble_ns=nibble_ns_for(B, W, ck))
        return dp_backtrack_csr_blob(
            jput(blob), B=B, W=W, K=ck, P=len(keylo), Pd=len(didx),
            Pe=len(eidx), max_steps=max_steps, use_pallas=_use_pallas())
    if not dyn:
        from .windows import split_sparse

        dense_key, dense_cnt, eb, ew, ek, ekey, ecnt = split_sparse(
            key_tab, cnt_tab, n_slots, K_DENSE)
        # exception arrays stay replicated (small); dense tables shard
        return dp_backtrack_sparse_packed(
            jput(dense_key), jput(dense_cnt.astype(np.uint16)),
            jput(coverage.astype(np.uint16)), jput(overflow),
            jnp.asarray(eb), jnp.asarray(ew), jnp.asarray(ek),
            jnp.asarray(ekey), jnp.asarray(ecnt),
            jput(lead), jput(seed), jput(last_col),
            K=ck, max_steps=max_steps, use_pallas=_use_pallas())
    tables = SlotTables(
        key=jput(key_tab), count=jput(cnt_tab), coverage=jput(coverage),
        n_slots=jput(n_slots), overflow=jput(overflow))
    return dp_backtrack_packed(tables, jput(lead), jput(seed),
                               jput(last_col), max_steps,
                               use_pallas=_use_pallas(), dynamic_k=dyn)


def dispatch_chunk_csr(csr: tuple, lead: np.ndarray, seed: np.ndarray,
                       last_col: np.ndarray, cwidth: int, ck: int,
                       jput=None, mesh=None):
    """Dispatch from an ALREADY-CSR chunk (the native CSR-direct
    aggregation, windows.aggregate_csr_host): identical device program +
    upload bytes as dispatch_chunk's split_csr path, minus the dense host
    tables. csr = (ns_u8, keylo, clo, didx, dval, eidx, xkey, xcnt).
    With `mesh`, the SAME blob dispatches 'win'-sharded over the mesh
    (ops.consensus.dp_backtrack_csr_blob_sharded) — one upload format for
    both paths (P4 unification)."""
    import jax.numpy as jnp

    from ..ops.consensus import (dp_backtrack_csr_blob,
                                 dp_backtrack_csr_blob_sharded, nibble_ns_for)
    from .windows import pack_csr_blob

    if jput is None:
        jput = jnp.asarray
    ns_u8, keylo, clo, didx, dval, eidx, xkey, xcnt = csr
    B, W = ns_u8.shape
    blob = pack_csr_blob(ns_u8, keylo, clo, didx, dval, eidx, xkey, xcnt,
                         lead, seed, last_col,
                         nibble_ns=nibble_ns_for(B, W, ck))
    if mesh is not None:
        return dp_backtrack_csr_blob_sharded(
            jnp.asarray(blob), mesh, B=B, W=W, K=ck, P=len(keylo),
            Pd=len(didx), Pe=len(eidx), max_steps=int(cwidth + 128),
            use_pallas=_use_pallas())
    return dp_backtrack_csr_blob(
        jput(blob), B=B, W=W, K=ck, P=len(keylo), Pd=len(didx),
        Pe=len(eidx), max_steps=int(cwidth + 128), use_pallas=_use_pallas())


def plan_tiered_chunks(span_all: np.ndarray, ktier_all: np.ndarray,
                       tiers: List[int], chunk_b: int,
                       tier_b: Optional[dict] = None) -> List[tuple]:
    """Group windows by (width tier, K tier) into device chunks:
    (ids, width, K, pad_b) tuples, where pad_b is the chunk's static batch
    shape. Regrouping is exact: DP/backtrack lanes are independent, and a
    window's slot tables are identical at any K >= its max column slot count
    (slots are per-column; K only truncates; width only pads).

    tier_b maps a K tier to a LARGER full-chunk batch (production: the K=8
    tier rides 512-lane chunks — the axon dispatch round trip is a fixed
    ~25 ms floor per chunk, so fewer/bigger dispatches win; the fat K tier
    can too via NP2_CHUNK_B_K48 / chunk_b_tiers(), since CSR-direct
    aggregation removed the dense-host-buffer bound that once pinned it).

    Only FULL chunks are emitted per tier; a K tier's leftovers first form
    full chunk_b chunks of their own (so a tier whose full_b is large, e.g.
    K=8 at 512, still ships cheap same-K 128-chunks instead of dragging
    hundreds of windows into fat-K tails), then the final sub-chunk_b rests
    merge into combined tail chunks at their members' max (width, K). The
    kernel pads every batch to 128 lanes, so an underfull small-K chunk
    costs as much as a full one — splitting a small contig's windows across
    tiers would only add dispatches.
    """
    tier_b = tier_b or {}
    wtier_all = np.where(span_all <= tiers[0], tiers[0], tiers[1])
    chunks = []
    by_kt: dict = {}
    for wt in tiers:
        for kt in sorted(set(ktier_all.tolist())):
            ids_g = np.nonzero((wtier_all == wt) & (ktier_all == kt))[0]
            full_b = int(tier_b.get(int(kt), chunk_b))
            n_full = len(ids_g) // full_b * full_b
            for c0 in range(0, n_full, full_b):
                chunks.append((ids_g[c0 : c0 + full_b], int(wt), int(kt),
                               full_b))
            if len(ids_g) > n_full:
                by_kt.setdefault(int(kt), []).append(ids_g[n_full:])
    leftover: List[np.ndarray] = []
    for kt, parts in sorted(by_kt.items()):
        rest_k = np.sort(np.concatenate(parts))
        n_full = len(rest_k) // chunk_b * chunk_b
        for c0 in range(0, n_full, chunk_b):
            ids = rest_k[c0 : c0 + chunk_b]
            chunks.append((ids, int(wtier_all[ids].max()), kt, chunk_b))
        if len(rest_k) > n_full:
            leftover.append(rest_k[n_full:])
    if leftover:
        rest = np.concatenate(leftover)
        for c0 in range(0, len(rest), chunk_b):
            ids = np.sort(rest[c0 : c0 + chunk_b])
            chunks.append((ids, int(wtier_all[ids].max()),
                           int(ktier_all[ids].max()), chunk_b))
    return chunks


def window_ktiers(wb, n_pos: int, K: int, k_small: int = 8) -> np.ndarray:
    """Per-window K tier: k_small where no column exceeds k_small slots
    (one stream pass, window-independent), else the full K."""
    from .windows import col_slot_counts, window_max_slots

    if K <= k_small:
        return np.full(wb.n_windows, K, dtype=np.int64)
    lead_all = np.maximum(wb.window_start - 2, 0)
    ends_all = wb.window_start + wb.window_len - 1
    colslots = col_slot_counts(wb.t_sorted, wb.k_sorted, n_pos)
    wmax_slots = window_max_slots(colslots, lead_all, ends_all)
    return np.where(wmax_slots <= k_small, k_small, K)


def device_consensus_stream(alignseqs: List[AlignTags], n_pos: int,
                            ref_codes: np.ndarray, cfg: PolishConfig,
                            stream_cache: Optional[dict] = None,
                            final_iter: bool = False,
                            plan_start: int = 0,
                            plan_end: Optional[int] = None,
                            plan_end_nominal: Optional[int] = None,
                            plan_end_max: Optional[int] = None,
                            first_keep_ge: bool = True,
                            out_info: Optional[dict] = None,
                            on_plan=None,
                            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Run the device engine; return the global REVERSED backtrack stream as
    (pos, base_ascii, qv, lowcov) arrays — the exact stream the reference
    walk produces (genome-descending), with count/coverage already reduced
    to the two facts the LQ state machine reads (qv = count*100 // coverage
    and coverage < 2; models.oracle_msa.lq_from_qv_stream).

    Segmented use (pipeline/segmented.py): plan_start/plan_end[_nominal/_max]
    bound the window plan (see build_window_batch); first_keep_ge=False makes
    the FIRST window keep only pos > its start (a mid-contig segment whose
    opening anchor column belongs to the previous segment's last window);
    out_info (when given) receives {"cut", "best_sum"} and DEFERS the
    negative-global-best check to the caller (it is a whole-contig sum)."""
    import jax.numpy as jnp

    from ..utils.jaxcfg import bucket, configure_jax

    configure_jax()
    with stage("plan_windows"):
        # final_iter only matters on the LEGACY (no flat_all) path: its last
        # phasing iteration's drop filter may compact the cached sorted
        # stream in place (no 8 B/entry copy). The flat_all production path
        # re-sorts from the pristine flat stream with the drop mask fused
        # into the counting sort (np2_sort_stream_runs) — zero per-iteration
        # allocations, so there is nothing to compact
        # on_plan fires INSIDE build_window_batch the moment the plan (and
        # with it the segment cut) is realized — before the sort future is
        # resolved and before aggregation/DP below, so a segmented caller's
        # next-segment scan overlaps both
        wb = build_window_batch(alignseqs, n_pos, ref_codes, target=cfg.window_len,
                                stream_cache=stream_cache,
                                consume_cache=final_iter,
                                plan_start=plan_start, plan_end=plan_end,
                                plan_end_nominal=plan_end_nominal,
                                plan_end_max=plan_end_max, on_plan=on_plan)
    if wb.n_windows == 0:
        raise WindowOverflow("no windows")
    K = cfg.max_kmers_per_col
    nw = wb.n_windows

    # Fixed device shapes: B is always CHUNK_B windows and width one of two
    # tiers, so a whole multi-contig assembly compiles at most two DP shapes
    # (compiles on the tunneled TPU cost minutes each). The tier is chosen PER
    # CHUNK from that chunk's widest window: a handful of anchor-poor outlier
    # windows must not double the DP width of every chunk in the contig.
    # Windows wider than tier 2 are flagged by aggregate_host and take the
    # host fallback.
    CHUNK_B = 16 if nw <= 16 else 128
    tiers = [bucket(cfg.window_len + 256, 128), bucket(2 * cfg.window_len + 512, 128)]

    def tier_for(span: int) -> int:
        return tiers[0] if span <= tiers[0] else tiers[1]

    # multi-chip: shard each chunk's batch dim over the mesh's 'win' axis
    # (SURVEY §2 parallelism table; the DP/backtrack are per-window, so GSPMD
    # splits them with no cross-device traffic until the host gather)
    from ..parallel.mesh import axis_size, get_active_mesh

    mesh = get_active_mesh()
    n_win_axis = axis_size(mesh, "win")
    sharded = mesh is not None and n_win_axis > 1 and CHUNK_B % n_win_axis == 0
    if sharded:
        from jax.sharding import NamedSharding, PartitionSpec as P

        _win_sharding = NamedSharding(mesh, P("win"))

        def jput(x):
            import jax as _jax

            return _jax.device_put(jnp.asarray(x), _win_sharding)
    else:
        jput = jnp.asarray

    lead_all = np.maximum(wb.window_start - 2, 0)
    seed_all = wb.window_start > 0
    last_all = (wb.window_start + wb.window_len - 1 - lead_all).astype(np.int32)
    span_all = last_all + 1  # columns each window needs

    # K tier per window: the DP kernel's slot unroll costs O(K^2) per column,
    # and most real HiFi windows never exceed 8 slots in any column (79% on
    # the bundled 74x data) while K=48 covers pathological pileups. One stream
    # pass bounds every window; windows are REGROUPED by (width, K) tier so
    # fat windows don't drag whole chunks to K=48.
    with stage("plan_ktiers"):
        ktier_all = window_ktiers(wb, n_pos, K)

    import jax

    host_results = {}
    best_all = np.zeros(nw, dtype=np.int64)
    # per-window device rows: win_rows[w] = (cols_r, packed_r, qv_r)
    win_rows: List[Optional[tuple]] = [None] * nw

    def run_host_fallback(w: int) -> None:
        # windows exceeding device static bounds re-run on the host with
        # identical semantics and no caps (pathological pileup columns or
        # anchor-poor stretches; see host_fallback.py)
        with stage("host_fallback"):
            hcols, hkeys = wb.window_stream(w)
            hcol, hq3, hcnt, hcov, hbest = host_window_dp(
                hcols, hkeys, wb.width,
                int(lead_all[w]), int(last_all[w]), bool(seed_all[w]))
        host_results[w] = (hcol, hq3, hcnt, hcov)
        best_all[w] = hbest

    from .batcher import get_active_batcher

    batcher = get_active_batcher()
    if batcher is not None:
        # cross-contig batching: hand window subsets (aggregation deferred) to
        # the shared DeviceBatcher, which packs full 128-lane batches across
        # concurrently-polished contigs per (width, K) tier (pipeline/batcher.py)
        SUB = 32
        futs = []
        for c0 in range(0, nw, SUB):
            c1 = min(c0 + SUB, nw)
            swidth = tier_for(int(span_all[c0:c1].max()))
            for kt in sorted(set(ktier_all[c0:c1].tolist())):
                ids = c0 + np.nonzero(ktier_all[c0:c1] == kt)[0]

                def agg(ids=ids, swidth=swidth, kt=kt):
                    with stage("aggregate_pileup"):
                        return aggregate_host(wb, kt, width=swidth,
                                              n_windows=len(ids),
                                              win_idx=ids)

                def agg_csr(lo, hi, ids=ids, swidth=swidth, kt=kt):
                    # CSR-direct range aggregation for the packed batch: no
                    # dense [B, W, K] host tables (windows.aggregate_csr_parts)
                    with stage("aggregate_pileup"):
                        return aggregate_csr_parts(wb, kt, width=swidth,
                                                   n_windows=hi - lo,
                                                   win_idx=ids[lo:hi])

                futs.append((ids, batcher.submit(
                    (swidth, kt), len(ids), agg, lead_all[ids],
                    seed_all[ids], last_all[ids], aggregate_csr=agg_csr)))
        for ids, fut in futs:
            for i, (cols_r, packed_r, qv_r, best_sc, truncated,
                    lvl_over, overflow) in enumerate(fut.result()):
                w = int(ids[i])
                win_rows[w] = (cols_r, packed_r, qv_r)
                best_all[w] = best_sc
                if overflow or lvl_over or truncated:
                    run_host_fallback(w)
    else:
        def harvest(pend) -> None:
            from ..ops.consensus import decode_backtrack_words

            ids, overflow, dev, last_col = pend
            n = len(ids)
            # ONE device->host transfer per chunk (words + meta packed into
            # a single u16 array; per-array tunnel cost dominates,
            # pack_backtrack_out)
            with stage("device_dp_backtrack"):
                cols_r, packed_r, qv_r, best_sc, truncated, lvl_over = \
                    decode_backtrack_words(jax.device_get(dev.result()),
                                           last_col)
            best_all[ids] = best_sc[:n].astype(np.int64)
            needs_host = overflow[:n] | lvl_over[:n] | truncated[:n]
            for wl in range(n):
                w = int(ids[wl])
                win_rows[w] = (cols_r[wl], packed_r[wl], qv_r[wl])
                if needs_host[wl]:
                    run_host_fallback(w)

        chunks = plan_tiered_chunks(span_all, ktier_all, tiers, CHUNK_B,
                                    tier_b=chunk_b_tiers(K) if CHUNK_B >= 128
                                    else None)

        # software pipeline: aggregate + dispatch chunks ahead BEFORE
        # pulling, so host pileup prep overlaps device DP + the tunnel round
        # trip (same overlap the cross-contig batcher does). Depth 3 keeps
        # TWO chunks in flight — the axon dispatch RTT (~25 ms) and the DP
        # then overlap across chunks instead of serializing.
        # CSR-direct native aggregation skips the dense [B, W, K] host
        # tables entirely; single-device AND mesh-sharded dispatch ride the
        # same one-blob upload (only the opt-in dynamic-K format differs)
        import os as _os

        use_csr_direct = not _dynamic_k()
        from collections import deque

        depth = int(_os.environ.get("NP2_PIPELINE_DEPTH", "3"))
        pending = deque()
        for ids, cwidth, ck, pad_b in chunks:
            n = len(ids)
            csr = None
            if use_csr_direct:
                with stage("aggregate_pileup"):
                    csr = aggregate_csr_host(wb, ck, width=cwidth,
                                             n_windows=pad_b, win_idx=ids)
            if csr is None:
                with stage("aggregate_pileup"):
                    agg = aggregate_host(wb, ck, width=cwidth,
                                         n_windows=pad_b, win_idx=ids)
                overflow = agg[4]
            else:
                overflow = csr[-1]
            lead = np.zeros(pad_b, dtype=np.int64)
            lead[:n] = lead_all[ids]
            seed = np.zeros(pad_b, dtype=bool)
            seed[:n] = seed_all[ids]
            last_col = np.zeros(pad_b, dtype=np.int32)
            last_col[:n] = last_all[ids]

            # pack + upload + dispatch run on the upload pool's worker so
            # the next chunk's aggregation (this thread) overlaps the H2D
            # transfer; harvest() resolves the future
            if csr is not None:
                dev = upload_pool().submit(
                    dispatch_chunk_csr, csr[:-1], lead, seed, last_col,
                    cwidth, ck, jput=jput, mesh=mesh if sharded else None)
            else:
                dev = upload_pool().submit(
                    dispatch_chunk, agg, lead, seed, last_col, cwidth, ck,
                    jput=jput, sharded=sharded)
            pending.append((ids, overflow, dev, last_col))
            if len(pending) >= depth:
                harvest(pending.popleft())
        while pending:
            harvest(pending.popleft())

    # whole-contig default-kmer check (main.rs:1651): window-local maxima are
    # partial sums from each anchor, so their sum is the true global best score
    # (segmented callers accumulate across segments instead — out_info)
    if out_info is not None:
        out_info["cut"] = int(wb.plan.ends[-1])
        out_info["best_sum"] = int(best_all.sum())
    elif int(best_all.sum()) < 0:
        raise WindowOverflow("global best score < 0 (degenerate default kmer)")

    # stitch in global reverse order: last window first; window w keeps
    # emissions with abs pos > window_start (w>0) / >= 0 (w==0)
    pos_parts, base_parts, qv_parts, low_parts = [], [], [], []
    for w in range(wb.n_windows - 1, -1, -1):
        if w in host_results:
            hcol, hq3, hcnt, hcov = host_results[w]
            abs_pos = hcol + lead_all[w]
            emit_base = CODE2ASCII[hq3 & 0x7]
            emit_qv = np.minimum(
                np.where(hcov > 0, hcnt.astype(np.int64) * 100
                         // np.maximum(hcov, 1), 0), 255).astype(np.uint8)
            emit_low = hcov < 2
            keep = np.ones(len(abs_pos), dtype=bool)
        else:
            cols_r, packed_r, qv_r = win_rows[w]
            keep = (packed_r & 0x10) != 0
            abs_pos = cols_r.astype(np.int64) + lead_all[w]
            emit_base = CODE2ASCII[packed_r & 0x7]
            emit_qv = qv_r
            emit_low = (packed_r & 0x20) != 0
        if w > 0 or not first_keep_ge:
            keep = keep & (abs_pos > wb.window_start[w])
        else:
            keep = keep & (abs_pos >= 0)
        pos_parts.append(abs_pos[keep])
        base_parts.append(emit_base[keep])
        qv_parts.append(emit_qv[keep])
        low_parts.append(emit_low[keep])
    return (np.concatenate(pos_parts), np.concatenate(base_parts),
            np.concatenate(qv_parts), np.concatenate(low_parts))


def polish_contig_tpu(tseq: bytes, records: Sequence[BamRecord],
                      tables: Sequence[KmerTable],
                      cfg: Optional[PolishConfig] = None,
                      fallback: bool = True,
                      native: Optional[tuple] = None,
                      pre_ingest=None) -> Consensus:
    """TPU-path per-contig polish; output matches models.oracle.polish_contig.

    native: optional (bam_path, tid) to ingest via the C++ fast path
    (io/_native) instead of the `records` list.
    pre_ingest: optional Future (or plain tuple) carrying an ALREADY-RUN
    build_alignseqs_native_flat result for this contig — the orchestrator's
    one-contig lookahead overlaps the next contig's BAM ingest with the
    current contig's device work (reference input-thread prefetch,
    main.rs:1703-1715).
    """
    cfg = cfg or PolishConfig()
    if len(tseq) < cfg.min_ctg_len:
        return passthrough_consensus(tseq)
    if native is not None and pre_ingest is None:
        from ..io.native import available as native_available
        from .segmented import polish_contig_tpu_segmented, use_segmented

        if use_segmented(len(tseq)) and native_available():
            # chromosome-scale: bounded-memory segmented engine (no oracle
            # fallback — a WindowOverflow there means degenerate input)
            return polish_contig_tpu_segmented(tseq, tables, cfg,
                                               native[0], native[1])
    tables = sorted(tables, key=lambda t: t.ksize)
    ref_codes = ASCII2CODE[np.frombuffer(tseq, dtype=np.uint8)]
    alignseqs = None
    flat = None
    with stage("ingest_alignseqs"):
        if pre_ingest is not None:
            res = (pre_ingest.result() if hasattr(pre_ingest, "result")
                   else pre_ingest)
            if res is not None:
                alignseqs, flat = res
        if alignseqs is None and native is not None:
            from ..models.oracle import build_alignseqs_native_flat

            res = build_alignseqs_native_flat(native[0], native[1], tseq, cfg)
            if res is not None:
                alignseqs, flat = res
        if alignseqs is None:
            alignseqs = build_alignseqs(tseq, records, cfg)

    saved_drops = [a.dropped for a in alignseqs]
    try:
        stream_cache: dict = {}
        if flat is not None:
            # whole-contig flat stream (ref first): the window planner sorts
            # it directly and allele extraction reuses it as ea_concat —
            # no per-read re-concatenation (oracle.build_alignseqs_native_flat)
            stream_cache["flat_all"] = flat
            stream_cache["ea_concat"] = (flat["t"], flat["q"], flat["aoff"])
        for i in range(cfg.iter_count):
            out_cns = i + 1 == cfg.iter_count
            pos, base, qv, lowcov = device_consensus_stream(
                alignseqs, len(tseq), ref_codes, cfg, stream_cache,
                final_iter=out_cns)
            with stage("lq_detect"):
                cb, lqseqs = lq_from_qv_stream(pos, base, qv, lowcov,
                                               cfg.hq_min_qv,
                                               cfg.lq_min_length)
            if not lqseqs:
                if out_cns:
                    return cb
                continue
            with stage("extract_alleles"):
                extract_alleles(alignseqs, lqseqs, tables[0],
                                cfg.lqseq_max_can_count, cache=stream_cache)
            with stage("kmer_scoring"):
                retrieve_kmer_count(lqseqs, tables[0], cfg.min_kmer_count)
            if out_cns:
                with stage("splice_recheck"):
                    fill_seed_lqseqs(lqseqs, cfg.max_indel_len,
                                     cfg.lqseq_max_can_count)
                    consensus = update_consensus_with_lqseqs(lqseqs, cb, L_SUCC)
                    for p, table in enumerate(tables):
                        consensus = reupdate_consensus_with_lqseqs(
                            lqseqs, consensus, table, cfg.min_kmer_count, p + 1,
                            cfg.lqseq_max_can_count)
                return consensus
            with stage("phasing"):
                mark_hete_lqseqs(lqseqs, cfg.lqseq_max_can_count)
                invalid = phase_reads_by_lqseqs(lqseqs, cfg.model == "ref",
                                                cfg.use_all_reads)
            for order in invalid:
                alignseqs[order].dropped = True
        raise AssertionError("unreachable")
    except WindowOverflow:
        if not fallback:
            raise
        from ..models.oracle import polish_contig

        # restart from the pre-phasing state (native mode has no records list,
        # so the prebuilt alignseqs are handed to the oracle directly)
        for a, d in zip(alignseqs, saved_drops):
            a.dropped = d
        return polish_contig(tseq, records, tables, cfg, alignseqs=alignseqs)
