"""Cross-contig device batching (pipeline/batcher.py): byte-exactness vs the
unbatched engine, cross-contig packing, and the small-tier tail flush."""

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from nextpolish2_tpu.config import PolishConfig
from nextpolish2_tpu.io.bam import BamRecord
from nextpolish2_tpu.io.yak import count_kmers, load_yak, write_yak
from nextpolish2_tpu.models.oracle import consensus_to_bytes
from nextpolish2_tpu.pipeline.batcher import (DeviceBatcher, LANE_SMALL,
                                              get_active_batcher,
                                              set_active_batcher)
from nextpolish2_tpu.pipeline.engine import polish_contig_tpu


def rand_seq(rng, n):
    return bytes(rng.choice(list(b"ACGT"), size=n).astype(np.uint8))


def rec(pos, cigar, seq, qname=b"r"):
    return BamRecord(qname=qname, flag=0, tid=0, pos=pos, mapq=60,
                     cigar=cigar, seq=seq)


def tiled(seq, length=800, step=300):
    return [(s, seq[s: s + length])
            for s in range(0, max(1, len(seq) - length + 1), step)]


def make_case(rng, tmp_path, i, n=4000):
    t = rand_seq(rng, n)
    asm = bytearray(t)
    asm[n // 2] = b"T"[0] if t[n // 2: n // 2 + 1] != b"T" else b"A"[0]
    reads = [rec(s, [(0, len(r))], r, qname=f"c{i}r{s}".encode())
             for s, r in tiled(t)]
    h, c = count_kmers([t] * 6, 21)
    path = str(tmp_path / f"b{i}.yak")
    write_yak(path, 21, h, c)
    return bytes(asm), reads, load_yak(path)


def test_batched_polish_matches_unbatched(tmp_path):
    """6 contigs polished concurrently through one DeviceBatcher must be
    byte-identical to the per-contig engine, and must share device batches
    (fewer dispatches than contigs)."""
    rng = np.random.default_rng(77)
    cfg = PolishConfig(min_ctg_len=0, min_read_len=100, min_map_len=50,
                       min_map_fra=0.5, window_len=512)
    cases = [make_case(rng, tmp_path, i) for i in range(6)]
    base = [consensus_to_bytes(polish_contig_tpu(t, rd, [tb], cfg,
                                                 fallback=False))
            for t, rd, tb in cases]
    assert get_active_batcher() is None
    b = DeviceBatcher(idle_flush_s=1.0)  # long grace: all contigs pack
    set_active_batcher(b)
    try:
        with ThreadPoolExecutor(max_workers=6) as ex:
            outs = list(ex.map(
                lambda c: consensus_to_bytes(
                    polish_contig_tpu(c[0], c[1], [c[2]], cfg,
                                      fallback=False)), cases))
    finally:
        set_active_batcher(None)
        b.shutdown()
    assert outs == base
    # ~8 windows/contig over >=1 DP iterations: cross-contig packing must
    # beat one-dispatch-per-contig-per-iteration
    assert b.stats.batches < 6, f"no packing: {b.stats.batches} batches"
    assert b.stats.lanes_real <= b.stats.lanes_dispatched


def test_small_tail_uses_small_tier():
    """A <=16-lane flush dispatches at the small-B tier (bounded padding)."""
    from nextpolish2_tpu.utils.jaxcfg import bucket

    width = bucket(512 + 256, 128)
    K = 16
    n = 3

    def agg():
        key_tab = np.full((n, width, K), -1, dtype=np.int32)
        cnt_tab = np.zeros((n, width, K), dtype=np.int32)
        coverage = np.zeros((n, width), dtype=np.int32)
        n_slots = np.zeros((n, width), dtype=np.int32)
        overflow = np.zeros(n, dtype=bool)
        return key_tab, cnt_tab, coverage, n_slots, overflow

    b = DeviceBatcher(idle_flush_s=0.01)
    try:
        fut = b.submit(width, n, agg, np.zeros(n, dtype=np.int64),
                       np.zeros(n, dtype=bool), np.zeros(n, dtype=np.int32))
        out = fut.result(timeout=120)
    finally:
        b.shutdown()
    assert len(out) == n
    # empty windows: no overflow flags, no truncation
    for cols_r, packed_r, qv_r, best, trunc, lvl, ovf in out:
        assert not trunc and not lvl and not ovf
    assert b.stats.lanes_dispatched == LANE_SMALL
    assert b.stats.batches == 1


def test_batcher_error_propagates():
    """An aggregation closure that raises must fail the submitting future."""
    def bad_agg():
        raise ValueError("boom")

    b = DeviceBatcher(idle_flush_s=0.01)
    try:
        fut = b.submit(768, 2, bad_agg, np.zeros(2, dtype=np.int64),
                       np.zeros(2, dtype=bool), np.zeros(2, dtype=np.int32))
        import pytest

        with pytest.raises(ValueError, match="boom"):
            fut.result(timeout=60)
    finally:
        b.shutdown()


def test_batched_polish_uses_csr_direct(tmp_path):
    """With the native library available, every cross-contig batch must ship
    the CSR blob (no dense [B, W, K] host tables) and stay byte-identical."""
    import pytest

    from nextpolish2_tpu.io.native import available

    if not available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(79)
    cfg = PolishConfig(min_ctg_len=0, min_read_len=100, min_map_len=50,
                       min_map_fra=0.5, window_len=512)
    cases = [make_case(rng, tmp_path, i) for i in range(4)]
    base = [consensus_to_bytes(polish_contig_tpu(t, rd, [tb], cfg,
                                                 fallback=False))
            for t, rd, tb in cases]
    b = DeviceBatcher(idle_flush_s=1.0)
    set_active_batcher(b)
    try:
        with ThreadPoolExecutor(max_workers=4) as ex:
            outs = list(ex.map(
                lambda c: consensus_to_bytes(
                    polish_contig_tpu(c[0], c[1], [c[2]], cfg,
                                      fallback=False)), cases))
    finally:
        set_active_batcher(None)
        b.shutdown()
    assert outs == base
    assert b.stats.batches > 0
    assert b.stats.csr_batches == b.stats.batches, \
        f"{b.stats.csr_batches}/{b.stats.batches} batches were CSR-direct"


def test_batched_polish_csr_under_mesh(tmp_path):
    """Cross-contig batches must ride the SAME sharded CSR blob as the
    engine when a 'win' mesh is active: byte-identical, all CSR-direct."""
    import pytest

    from nextpolish2_tpu.io.native import available
    from nextpolish2_tpu.parallel.mesh import make_mesh, set_active_mesh

    if not available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(81)
    cfg = PolishConfig(min_ctg_len=0, min_read_len=100, min_map_len=50,
                       min_map_fra=0.5, window_len=512)
    cases = [make_case(rng, tmp_path, i) for i in range(3)]
    base = [consensus_to_bytes(polish_contig_tpu(t, rd, [tb], cfg,
                                                 fallback=False))
            for t, rd, tb in cases]
    mesh = make_mesh(n_win=4, n_kmer=2)
    set_active_mesh(mesh)
    b = DeviceBatcher(idle_flush_s=1.0)
    set_active_batcher(b)
    try:
        with ThreadPoolExecutor(max_workers=3) as ex:
            outs = list(ex.map(
                lambda c: consensus_to_bytes(
                    polish_contig_tpu(c[0], c[1], [c[2]], cfg,
                                      fallback=False)), cases))
    finally:
        set_active_batcher(None)
        set_active_mesh(None)
        b.shutdown()
    assert outs == base
    assert b.stats.batches > 0
    assert b.stats.csr_batches == b.stats.batches


def test_dense_fallback_reason_accounting():
    """A request without a CSR closure ships dense and the batcher records
    WHY (VERDICT r3: silent CSR-eligibility degradation must be visible)."""
    from nextpolish2_tpu.pipeline.batcher import _Request

    b = DeviceBatcher(idle_flush_s=1.0)
    try:
        width, K, n = 256, 8, 4

        def agg():
            return (np.full((n, width, K), -1, np.int32),
                    np.zeros((n, width, K), np.int32),
                    np.zeros((n, width), np.int32),
                    np.zeros((n, width), np.int32),
                    np.zeros(n, bool))

        req = _Request(n=n, aggregate=agg,
                       lead=np.zeros(n, np.int64),
                       seed=np.zeros(n, bool),
                       last=np.full(n, width - 1, np.int32),
                       aggregate_csr=None)
        kind, *_ = b._aggregate((width, K), [(req, 0, n)])
        assert kind == "dense"
        assert b.stats.dense_reasons == {"no_csr_closure": 1}

        def agg_csr(lo, hi):
            return None  # native pass bailed

        req2 = _Request(n=n, aggregate=agg,
                        lead=np.zeros(n, np.int64),
                        seed=np.zeros(n, bool),
                        last=np.full(n, width - 1, np.int32),
                        aggregate_csr=agg_csr)
        kind, *_ = b._aggregate((width, K), [(req2, 0, n)])
        assert kind == "dense"
        assert b.stats.dense_reasons == {"no_csr_closure": 1, "csr_bailed": 1}
    finally:
        b.shutdown()
