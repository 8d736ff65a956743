"""TPU engine vs oracle: bit-exact consensus equality on synthetic data."""

import numpy as np
import pytest

from nextpolish2_tpu.config import PolishConfig
from nextpolish2_tpu.io.bam import BamRecord
from nextpolish2_tpu.io.yak import count_kmers, load_yak, write_yak
from nextpolish2_tpu.models.oracle import consensus_to_bytes, polish_contig
from nextpolish2_tpu.pipeline.engine import polish_contig_tpu


def rand_seq(rng, n):
    return bytes(rng.choice(list(b"ACGT"), size=n).astype(np.uint8))


def mutate(rng, seq, sub=0.002, ins=0.001, dele=0.001):
    out = bytearray()
    bases = b"ACGT"
    for ch in seq:
        r = rng.random()
        if r < sub:
            out.append(bases[rng.integers(4)])
        elif r < sub + ins:
            out.append(ch)
            out.append(bases[rng.integers(4)])
        elif r < sub + ins + dele:
            continue
        else:
            out.append(ch)
    return bytes(out)


def cfg_small(**kw):
    d = dict(min_ctg_len=0, min_read_len=100, min_map_len=50, min_map_fra=0.5,
             window_len=512)
    d.update(kw)
    return PolishConfig(**d)


def make_table(tmp_path, seqs, k=21, copies=6, name="t"):
    h, c = count_kmers(list(seqs) * copies, k)
    path = str(tmp_path / f"{name}{k}.yak")
    write_yak(path, k, h, c)
    return load_yak(path)


def tiled(seq, length=800, step=300):
    return [(s, seq[s : s + length])
            for s in range(0, max(1, len(seq) - length + 1), step)]


def rec(pos, cigar, seq, qname=b"r"):
    return BamRecord(qname=qname, flag=0, tid=0, pos=pos, mapq=60,
                     cigar=cigar, seq=seq)


def _assert_same(cb_a, cb_b):
    assert len(cb_a) == len(cb_b), f"lengths differ: {len(cb_a)} vs {len(cb_b)}"
    assert np.array_equal(cb_a.pos, cb_b.pos), "positions differ"
    assert np.array_equal(cb_a.base, cb_b.base), "bases differ"


def test_tpu_equals_oracle_clean(tmp_path):
    rng = np.random.default_rng(30)
    t = rand_seq(rng, 4000)
    table = make_table(tmp_path, [t])
    reads = [rec(s, [(0, len(r))], r, qname=f"r{s}".encode()) for s, r in tiled(t)]
    cfg = cfg_small()
    a = polish_contig(t, reads, [table], cfg)
    b = polish_contig_tpu(t, reads, [table], cfg, fallback=False)
    _assert_same(a, b)
    assert consensus_to_bytes(b) == t


def test_tpu_equals_oracle_with_errors(tmp_path):
    """Assembly has sub+indel errors; noisy reads; full LQ/recheck path."""
    rng = np.random.default_rng(31)
    t = rand_seq(rng, 4000)
    asm = bytearray(t)
    asm[1001] = ord("A") if t[1001] != ord("A") else ord("C")
    asm = bytes(asm[:2000]) + bytes(asm[2001:])  # deletion at 2000
    table = make_table(tmp_path, [t])
    reads = []
    for s, r in tiled(t, length=900, step=180):
        rr = mutate(rng, r)
        # align read to asm via the aligner (exact cigar not needed: use hifi_align)
        reads.append((s, rr))
    from nextpolish2_tpu.pipeline.hifi_align import TargetIndex, align_read
    idx = TargetIndex.build(asm)
    recs = []
    for s, rr in reads:
        res = align_read(idx, asm, rr)
        if res is None:
            continue
        recs.append(rec(res.pos, res.cigar, rr, qname=f"r{s}".encode()))
    recs.sort(key=lambda r: r.pos)
    cfg = cfg_small()
    a = polish_contig(asm, recs, [table], cfg)
    b = polish_contig_tpu(asm, recs, [table], cfg, fallback=False)
    _assert_same(a, b)
    assert consensus_to_bytes(b) == t


def test_tpu_equals_oracle_het_phasing(tmp_path):
    rng = np.random.default_rng(32)
    hap1 = bytearray(rand_seq(rng, 4000))
    hap2 = bytearray(hap1)
    for sp in (1400, 1450, 1500, 1550, 1600, 2500, 2550):
        old = hap2[sp]
        for nb in b"ACGT":
            if nb != old:
                hap2[sp] = nb
                break
    hap1, hap2 = bytes(hap1), bytes(hap2)
    table = make_table(tmp_path, [hap1, hap2])
    recs = []
    for s, r in tiled(hap1, length=900, step=450):
        recs.append(rec(s, [(0, len(r))], r, qname=f"h1_{s}".encode()))
    for s, r in tiled(hap2, length=900, step=450):
        recs.append(rec(s, [(0, len(r))], r, qname=f"h2_{s}".encode()))
    recs.sort(key=lambda r: r.pos)
    cfg = cfg_small()
    a = polish_contig(hap1, recs, [table], cfg)
    b = polish_contig_tpu(hap1, recs, [table], cfg, fallback=False)
    _assert_same(a, b)
    assert consensus_to_bytes(b) == hap1


def test_tpu_mixed_width_tiers(tmp_path):
    """Chunks in ONE contig pick different width tiers (engine.tier_for):
    an uncovered stretch has no anchors (pure columns need >= 2 entries and
    only the reference row spans it), forcing one window to exceed tier 1
    while neighboring windows stay narrow."""
    rng = np.random.default_rng(33)
    t = rand_seq(rng, 6000)
    table = make_table(tmp_path, [t])
    gap_lo, gap_hi = 2200, 3400
    recs = []
    for s, r in tiled(t, length=800, step=300):
        # leave [gap_lo, gap_hi) read-free: only the reference row remains
        if s + 800 > gap_lo and s < gap_hi:
            continue
        recs.append(rec(s, [(0, len(r))], r, qname=f"r{s}".encode()))
    recs.sort(key=lambda r: r.pos)
    cfg = cfg_small(window_len=256)

    # confirm the construction really yields mixed tiers
    from nextpolish2_tpu.models.oracle import build_alignseqs
    from nextpolish2_tpu.pipeline.windows import build_window_batch
    from nextpolish2_tpu.utils.jaxcfg import bucket
    from nextpolish2_tpu.utils.seqcodes import ASCII2CODE

    aligns = build_alignseqs(t, recs, cfg)
    ref_codes = ASCII2CODE[np.frombuffer(t, dtype=np.uint8)]
    wb = build_window_batch(aligns, len(t), ref_codes, target=cfg.window_len)
    lead = np.maximum(wb.window_start - 2, 0)
    spans = wb.window_start + wb.window_len - lead
    tier1 = bucket(cfg.window_len + 256, 128)
    assert spans.max() > tier1, "construction must exceed tier 1"
    assert spans.min() <= tier1, "construction must also use tier 1"

    a = polish_contig(t, recs, [table], cfg)
    b = polish_contig_tpu(t, recs, [table], cfg, fallback=False)
    _assert_same(a, b)


def test_backtrack_jump_matches_scan(monkeypatch):
    """Pointer-doubling + packed-scan backtracks must be bit-identical to the
    sequential scan spec on real window batches (all outputs, incl
    frozen-tail steps and the packed scan's cumsum-reconstructed columns),
    at every NP2_BT_UNROLL factor (incl. factors that don't divide
    max_steps, which take the single-step path)."""
    import jax
    import jax.numpy as jnp

    from nextpolish2_tpu.models.oracle import build_alignseqs
    from nextpolish2_tpu.ops.consensus import (SlotTables, _backtrack_jump,
                                               _backtrack_scan,
                                               _backtrack_scan_packed,
                                               consensus_dp)
    from nextpolish2_tpu.pipeline.windows import (aggregate_host,
                                                  build_window_batch)
    from nextpolish2_tpu.utils.seqcodes import ASCII2CODE

    rng = np.random.default_rng(510)
    t = bytes(rng.choice(list(b"ACGT"), size=4000).astype(np.uint8))
    reads = []
    for s in range(0, 3100, 140):
        ins = bytes(rng.choice(list(b"ACGT"),
                               size=int(rng.integers(1, 9))).astype(np.uint8))
        seq = bytearray(t[s : s + 400]) + bytearray(ins) + \
            bytearray(t[s + 400 : s + 800])
        for _ in range(8):
            i = int(rng.integers(len(seq)))
            seq[i] = int(rng.choice(list(b"ACGT")))
        reads.append(BamRecord(qname=f"r{s}".encode(), flag=0, tid=0, pos=s,
                               mapq=60,
                               cigar=[(0, 400), (1, len(ins)), (0, 400)],
                               seq=bytes(seq)))
    cfg = PolishConfig(min_ctg_len=0, min_read_len=100, min_map_len=50,
                       window_len=512)
    aligns = build_alignseqs(t, reads, cfg)
    ref_codes = ASCII2CODE[np.frombuffer(t, dtype=np.uint8)]
    wb = build_window_batch(aligns, len(t), ref_codes, target=512)
    K = 16
    key, cnt, cov, ns, over = aggregate_host(wb, K)
    lead = np.maximum(wb.window_start - 2, 0)
    seed = wb.window_start > 0
    last = (wb.window_start + wb.window_len - 1 - lead).astype(np.int32)
    tables = SlotTables(key=jnp.asarray(key), count=jnp.asarray(cnt),
                        coverage=jnp.asarray(cov), n_slots=jnp.asarray(ns),
                        overflow=jnp.asarray(over))
    sc, bi, _ = jax.jit(consensus_dp)(tables, jnp.asarray(lead),
                                      jnp.asarray(seed))
    for max_steps in (wb.width + 128, 37, 1):
        a = jax.device_get(jax.jit(_backtrack_scan,
                                   static_argnames=("max_steps",))(
            tables, sc, bi, jnp.asarray(last), jnp.asarray(seed),
            max_steps=max_steps))
        variants = [(_backtrack_jump, None)] + \
            [(_backtrack_scan_packed, u) for u in ("1", "2", "4")]
        for variant, unroll in variants:
            if unroll is not None:
                monkeypatch.setenv("NP2_BT_UNROLL", unroll)
            b = jax.device_get(jax.jit(variant,
                                       static_argnames=("max_steps",))(
                tables, sc, bi, jnp.asarray(last), jnp.asarray(seed),
                max_steps=max_steps))
            for xa, xb in zip(a, b):
                np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
