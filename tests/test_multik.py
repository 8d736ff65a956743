"""Three-table recheck cascade (k21 + k31 + k41) incl a k>=32 table, TPU==oracle."""

import numpy as np
import pytest

from nextpolish2_tpu.config import PolishConfig
from nextpolish2_tpu.io.bam import BamRecord
from nextpolish2_tpu.io.yak import count_kmers, load_yak, write_yak
from nextpolish2_tpu.models.oracle import consensus_to_bytes, polish_contig
from nextpolish2_tpu.pipeline.engine import polish_contig_tpu


def test_k21_k31_k41_cascade(tmp_path):
    rng = np.random.default_rng(110)
    t = bytes(rng.choice(list(b"ACGT"), size=4000).astype(np.uint8))
    asm = bytearray(t)
    asm[2001] = ord("A") if t[2001] != ord("A") else ord("C")
    asm = bytes(asm)
    tables = []
    for k in (21, 31, 41):
        h, c = count_kmers([t] * 6, k)
        path = str(tmp_path / f"t{k}.yak")
        write_yak(path, k, h, c)
        tables.append(load_yak(path))
    assert tables[2].ksize == 41  # k>=32 4-plane hash path
    recs = [BamRecord(qname=f"r{s}".encode(), flag=0, tid=0, pos=s, mapq=60,
                      cigar=[(0, 900)], seq=t[s : s + 900])
            for s in range(0, 3100, 600)]
    cfg = PolishConfig(min_ctg_len=0, min_read_len=100, min_map_len=50,
                       window_len=512)
    a = polish_contig(asm, recs, tables, cfg)
    b = polish_contig_tpu(asm, recs, tables, cfg, fallback=False)
    assert consensus_to_bytes(a) == consensus_to_bytes(b) == t


def test_k32_only_runs_with_wrapped_semantics(tmp_path):
    """A k>=32-only table set RUNS, mirroring a release Rust build: the
    reference's 2-bit allele rolling (main.rs:1433-1434, 1488-1492) is
    executed unconditionally and Rust `<<` masks shift amounts mod 64
    (RFC 560), so k-mer values wrap rather than panic. Oracle and TPU engine
    must agree under those wrapped semantics."""
    rng = np.random.default_rng(111)
    t = bytes(rng.choice(list(b"ACGT"), size=3000).astype(np.uint8))
    h, c = count_kmers([t] * 6, 41)
    path = str(tmp_path / "t41.yak")
    write_yak(path, 41, h, c)
    table = load_yak(path)
    recs = [BamRecord(qname=f"r{s}".encode(), flag=0, tid=0, pos=s, mapq=60,
                      cigar=[(0, 1500)], seq=t[s : s + 1500])
            for s in range(0, 1600, 300)]
    # inject an error so the LQ machinery (and the wrapped rolling) is reached
    asm = bytearray(t)
    asm[1000] = ord("A") if t[1000] != ord("A") else ord("C")
    cfg = PolishConfig(min_ctg_len=0, min_read_len=100, min_map_len=50,
                       window_len=512)
    a = polish_contig(bytes(asm), recs, [table], cfg)
    b = polish_contig_tpu(bytes(asm), recs, [table], cfg, fallback=False)
    assert consensus_to_bytes(a) == consensus_to_bytes(b)


def test_k32_wrapped_rolling_values():
    """extract_alleles' wrapped k>=32 rolling matches an independent model of
    Rust release shl semantics: for k = 32, mask = (1 << (64 & 63)) - 1 = 0
    pins the forward k-mer at 0, and the reverse k-mer rolls normally
    (shift = 62); kmer = min(0, rev) = 0, passed through to_hash unhashed
    (kmer.rs:102-110)."""
    from nextpolish2_tpu.io.yak import KmerTable
    from nextpolish2_tpu.models.oracle_align import AlignTags
    from nextpolish2_tpu.models.oracle_lq import extract_alleles
    from nextpolish2_tpu.models.oracle_msa import LqRegion
    from nextpolish2_tpu.utils.seqcodes import ASCII2CODE

    ksize = 32
    table = KmerTable(ksize=ksize, pre=1,
                      keys=np.zeros(0, np.uint64), counts=np.zeros(0, np.uint16),
                      bin_off=np.zeros(3, np.int64))
    n = 80
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, size=n).astype(np.int64)
    t_pos = np.arange(n, dtype=np.int64)
    # order-0 reference pseudo-alignment + one read
    ats = [AlignTags(0, n - 1, t_pos, q_base=codes.copy()),
           AlignTags(0, n - 1, t_pos, q_base=codes.copy())]
    lq = LqRegion(start=10, end=20)
    extract_alleles(ats, [lq], table)
    assert len(lq.seqs) == 2
    # independent wrapped-semantics model
    fwd, rev = 0, 0
    for qb in codes[10 : 10 + ksize].tolist():
        fwd = ((fwd << 2) | qb) & 0  # mask wraps to 0 at k = 32
        rev = ((rev >> 2) | ((3 ^ qb) << 62)) & 0xFFFFFFFFFFFFFFFF
    expect = min(fwd, rev)
    assert expect == 0  # fwd pinned at 0
    from nextpolish2_tpu.utils.seqcodes import CODE2ASCII
    for s in lq.seqs:
        assert s.kmer == expect
        assert s.seq == CODE2ASCII[codes[10:21]].tobytes()
