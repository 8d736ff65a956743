"""Per-tier chunk batches (engine.plan_tiered_chunks tier_b).

Production ships the K=8 tier in 512-lane full chunks (the axon dispatch
round trip is a fixed floor per chunk) while the fat K tier stays at 128.
These tests pin the plan invariants and prove the polish output is invariant
to the chunk regrouping (lanes are independent; padding lanes are discarded).
"""

import os

import numpy as np
import pytest

from nextpolish2_tpu.pipeline import engine as eng

BASE = "/root/repo/testdata"
NEEDED = ["slice.fa", "slice.bam", "slice.golden.fa", "k21.yak", "k31.yak"]


def test_plan_partition_pad_and_tiers():
    rng = np.random.default_rng(0)
    n = 2000
    tiers = [768, 1536]
    span = rng.integers(100, 1500, size=n)
    ktier = np.where(rng.random(n) < 0.8, 8, 48)
    chunks = eng.plan_tiered_chunks(span, ktier, tiers, 128, tier_b={8: 512})
    seen = np.concatenate([ids for ids, *_ in chunks])
    assert sorted(seen.tolist()) == list(range(n))  # exact partition
    for ids, w, k, pad_b in chunks:
        assert 0 < len(ids) <= pad_b
        assert int(ktier[ids].max()) <= k
        wmax = int(np.where(span[ids] <= tiers[0], tiers[0], tiers[1]).max())
        assert wmax <= w
        if len(ids) == pad_b and pad_b == 512:
            assert k == 8  # only the small-K tier rides big chunks
    # the dominant tier must actually produce full 512 chunks here
    assert any(pad_b == 512 and len(ids) == 512
               for ids, _, _, pad_b in chunks)
    # fat-tier full chunks stay at chunk_b
    assert all(pad_b == 128 for ids, _, k, pad_b in chunks
               if k != 8 and len(ids) == pad_b)


def test_plan_leftovers_keep_k_tier():
    """A K=8 tier with >= chunk_b leftover windows (e.g. a 300 kb contig)
    must ship them as K=8 128-chunks, not drag them into fat-K tails."""
    tiers = [768, 1536]
    span = np.full(350, 500)
    ktier = np.concatenate([np.full(300, 8), np.full(50, 48)])
    chunks = eng.plan_tiered_chunks(span, ktier, tiers, 128, tier_b={8: 512})
    k8_chunks = [c for c in chunks if c[2] == 8]
    assert sum(len(c[0]) for c in k8_chunks) >= 256  # 2 full 128s stay K=8
    assert all(c[3] == 128 for c in k8_chunks)  # no underfull 512 pads
    # every window still appears exactly once
    seen = np.concatenate([ids for ids, *_ in chunks])
    assert sorted(seen.tolist()) == list(range(350))


def test_plan_fat_tier_b():
    """CSR-direct aggregation removed the dense-buffer bound that pinned the
    fat tier at 128 lanes; tier_b may now raise it (NP2_CHUNK_B_K48)."""
    rng = np.random.default_rng(2)
    n = 3000
    tiers = [768, 1536]
    span = rng.integers(100, 700, size=n)  # one width tier
    ktier = np.where(rng.random(n) < 0.5, 8, 48)
    chunks = eng.plan_tiered_chunks(span, ktier, tiers, 128,
                                    tier_b={8: 512, 48: 256})
    seen = np.concatenate([ids for ids, *_ in chunks])
    assert sorted(seen.tolist()) == list(range(n))  # exact partition
    fat_full = [c for c in chunks if c[2] == 48 and len(c[0]) == c[3]]
    assert any(c[3] == 256 for c in fat_full)  # fat tier rides 256 chunks
    for ids, w, k, pad_b in chunks:
        assert int(ktier[ids].max()) <= k and 0 < len(ids) <= pad_b


def test_plan_int_chunk_b_unchanged():
    rng = np.random.default_rng(1)
    n = 700
    tiers = [768, 1536]
    span = rng.integers(100, 1500, size=n)
    ktier = np.where(rng.random(n) < 0.7, 8, 48)
    a = eng.plan_tiered_chunks(span, ktier, tiers, 128)
    b = eng.plan_tiered_chunks(span, ktier, tiers, 128, tier_b={})
    assert len(a) == len(b)
    for (ia, wa, ka, pa), (ib, wb_, kb, pb) in zip(a, b):
        assert np.array_equal(ia, ib) and (wa, ka, pa) == (wb_, kb, pb)
        assert pa == 128


@pytest.mark.skipif(
    not all(os.path.exists(os.path.join(BASE, f)) for f in NEEDED),
    reason="real-data fixtures not generated")
def test_mixed_chunk_b_bit_exact(monkeypatch):
    """Polishing with a tiny K=8 full-chunk size (8) must byte-match the
    golden: regrouping windows into differently-sized dispatches cannot
    change any lane's DP/backtrack."""
    from nextpolish2_tpu.config import PolishConfig
    from nextpolish2_tpu.io.bam import BamReader
    from nextpolish2_tpu.io.fastx import read_fastx
    from nextpolish2_tpu.io.yak import load_yak
    from nextpolish2_tpu.models.oracle import consensus_to_bytes

    monkeypatch.setattr(eng, "CHUNK_B_TIERS", {eng.K_SMALL: 8, 48: 16})
    tseq = next(iter(read_fastx(f"{BASE}/slice.fa")))[1]
    recs = next(BamReader(f"{BASE}/slice.bam").by_contig())[1]
    tables = [load_yak(f"{BASE}/k21.yak"), load_yak(f"{BASE}/k31.yak")]
    cfg = PolishConfig(min_ctg_len=1000)
    cb = eng.polish_contig_tpu(tseq, recs, tables, cfg, fallback=False)
    golden = next(iter(read_fastx(f"{BASE}/slice.golden.fa")))[1]
    assert consensus_to_bytes(cb) == golden
