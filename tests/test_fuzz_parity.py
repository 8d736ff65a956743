"""Differential fuzz: random error/coverage scenarios, TPU engine == oracle.

Catches rare-path divergences (DP tie-breaks, LQ region growth/merge, recheck
chains) that targeted tests can miss. Shapes are shared across seeds so the CPU
XLA path compiles once.
"""

import numpy as np
import pytest

from nextpolish2_tpu.config import PolishConfig
from nextpolish2_tpu.io.bam import BamRecord
from nextpolish2_tpu.io.yak import count_kmers, load_yak, write_yak
from nextpolish2_tpu.models.oracle import consensus_to_bytes, polish_contig
from nextpolish2_tpu.pipeline.engine import polish_contig_tpu
from nextpolish2_tpu.pipeline.hifi_align import TargetIndex, align_read


def scenario(seed, n=2000, coverage=8, err=0.01):
    rng = np.random.default_rng(seed)
    t = bytes(rng.choice(list(b"ACGT"), size=n).astype(np.uint8))
    # assembly with random errors
    asm = bytearray(t)
    for _ in range(int(rng.integers(1, 6))):
        p = int(rng.integers(100, n - 100))
        kind = rng.integers(3)
        if kind == 0:
            asm[p] = int(rng.choice([b for b in b"ACGT" if b != asm[p]]))
        elif kind == 1:
            del asm[p]
        else:
            asm.insert(p, int(rng.choice(list(b"ACGT"))))
    asm = bytes(asm)
    # noisy reads from the truth
    idx = TargetIndex.build(asm)
    recs = []
    length = 700
    step = max(1, (n - length) * 2 // (coverage * 3))
    for s in range(0, n - length, step):
        read = bytearray(t[s : s + length])
        out = bytearray()
        for ch in read:
            r = rng.random()
            if r < err / 3:
                out.append(int(rng.choice(list(b"ACGT"))))
            elif r < 2 * err / 3:
                out.append(ch)
                out.append(int(rng.choice(list(b"ACGT"))))
            elif r < err:
                continue
            else:
                out.append(ch)
        res = align_read(idx, asm, bytes(out))
        if res is None:
            continue
        recs.append(BamRecord(qname=f"r{s}".encode(), flag=0, tid=0,
                              pos=res.pos, mapq=60, cigar=res.cigar,
                              seq=bytes(out)))
    recs.sort(key=lambda r: r.pos)
    return t, asm, recs


@pytest.mark.parametrize("seed", range(120, 128))
def test_fuzz_tpu_equals_oracle(tmp_path, seed):
    t, asm, recs = scenario(seed)
    h, c = count_kmers([t] * 6, 21)
    path = str(tmp_path / "f.yak")
    write_yak(path, 21, h, c)
    table = load_yak(path)
    cfg = PolishConfig(min_ctg_len=0, min_read_len=100, min_map_len=50,
                       window_len=512)
    a = polish_contig(asm, recs, [table], cfg)
    b = polish_contig_tpu(asm, recs, [table], cfg, fallback=False)
    assert consensus_to_bytes(a) == consensus_to_bytes(b)


@pytest.mark.parametrize("seed", range(200, 204))
def test_fuzz_het_phasing_parity(tmp_path, seed):
    """Random heterozygous scenarios: both haplotypes' reads + SR tables."""
    rng = np.random.default_rng(seed)
    n = 2500
    h1 = bytearray(rng.choice(list(b"ACGT"), size=n).astype(np.uint8))
    h2 = bytearray(h1)
    base = int(rng.integers(400, n - 1000))
    for off in sorted(rng.choice(np.arange(0, 800, 25), size=6, replace=False)):
        p = base + int(off)
        h2[p] = int(rng.choice([b for b in b"ACGT" if b != h2[p]]))
    h1, h2 = bytes(h1), bytes(h2)
    hmm, c = count_kmers([h1, h2] * 6, 21)
    path = str(tmp_path / "h.yak")
    write_yak(path, 21, hmm, c)
    table = load_yak(path)
    recs = []
    for hap in (h1, h2):
        for s in range(0, n - 800, 300):
            recs.append(BamRecord(qname=f"{id(hap)}_{s}".encode(), flag=0,
                                  tid=0, pos=s, mapq=60, cigar=[(0, 800)],
                                  seq=hap[s : s + 800]))
    recs.sort(key=lambda r: r.pos)
    cfg = PolishConfig(min_ctg_len=0, min_read_len=100, min_map_len=50,
                       window_len=512)
    a = polish_contig(h1, recs, [table], cfg)
    b = polish_contig_tpu(h1, recs, [table], cfg, fallback=False)
    assert consensus_to_bytes(a) == consensus_to_bytes(b)
    # no switch errors: output equals hap1 exactly
    assert consensus_to_bytes(b) == h1
