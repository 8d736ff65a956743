"""Oracle engine tests on synthetic data with known ground truth.

Builds a 'true' sequence T, an assembly A with injected errors, exact reads from T,
and a yak table from T's k-mers — the polished consensus must recover T.
"""

import numpy as np
import pytest

from nextpolish2_tpu.config import PolishConfig
from nextpolish2_tpu.io.bam import BamRecord
from nextpolish2_tpu.io.yak import KmerTable, count_kmers, write_yak, load_yak
from nextpolish2_tpu.models.oracle import consensus_to_bytes, polish_contig
from nextpolish2_tpu.models.oracle_align import ref_as_tags, to_tags, record_to_tags
from nextpolish2_tpu.models.oracle_msa import build_msas, consensus_dp, backtrack_lq
from nextpolish2_tpu.utils.seqcodes import ASCII2CODE


def rand_seq(rng, n):
    return bytes(rng.choice(list(b"ACGT"), size=n).astype(np.uint8))


def cfg_small(**kw):
    defaults = dict(min_ctg_len=0, min_read_len=100, min_map_len=50,
                    min_map_fra=0.5, min_map_qual=1)
    defaults.update(kw)
    return PolishConfig(**defaults)


def make_table(tmp_path, seqs, k=21, copies=6):
    h, c = count_kmers(list(seqs) * copies, k)
    path = str(tmp_path / f"t{k}.yak")
    write_yak(path, k, h, c)
    return load_yak(path)


def tiled_reads(seq, length=800, step=300):
    """Exact reads tiling seq."""
    out = []
    for s in range(0, max(1, len(seq) - length + 1), step):
        out.append((s, seq[s : s + length]))
    return out


def rec(pos, cigar, seq, qname=b"r", mapq=60, flag=0):
    return BamRecord(qname=qname, flag=flag, tid=0, pos=pos, mapq=mapq,
                     cigar=cigar, seq=seq)


def test_msa_counts_tiny():
    """Hand-checked MSA pileup: 3 identical exact reads over a 10bp ref."""
    t = b"ACGTACGTAC"
    codes = ASCII2CODE[np.frombuffer(t, dtype=np.uint8)]
    aligns = [ref_as_tags(codes)]
    for _ in range(3):
        r = rec(0, [(0, 10)], t)
        tags = record_to_tags(r, codes, 10, cfg_small(min_read_len=5, min_map_len=4,
                                                      trim_len=2))
        assert tags is not None
        aligns.append(tags)
    msas = build_msas(aligns, 10)
    # every position: single kmer, count = 4 (ref + 3 reads) except near read start
    # (trim/head effects make distinct head kmers at the first two columns)
    assert msas.coverage.tolist() == [4] * 10
    for p in range(2, 10):
        assert len(msas.counts[p]) == 1 and msas.counts[p][0] == 4


def test_perfect_reads_identity(tmp_path):
    rng = np.random.default_rng(10)
    t = rand_seq(rng, 3000)
    table = make_table(tmp_path, [t])
    reads = [rec(s, [(0, len(r))], r, qname=f"r{s}".encode())
             for s, r in tiled_reads(t)]
    cb = polish_contig(t, reads, [table], cfg_small())
    assert consensus_to_bytes(cb) == t


def test_substitution_corrected_high_cov(tmp_path):
    """20x coverage: DP alone fixes a substitution error in the assembly."""
    rng = np.random.default_rng(11)
    t = rand_seq(rng, 3000)
    err = 1500
    bad = b"A" if t[err : err + 1] != b"A" else b"C"
    asm = t[:err] + bad + t[err + 1 :]
    table = make_table(tmp_path, [t])
    reads = [rec(s, [(0, len(r))], r, qname=f"r{s}".encode())
             for s, r in tiled_reads(t, length=900, step=150)]
    cb = polish_contig(asm, reads, [table], cfg_small())
    assert consensus_to_bytes(cb) == t


def test_substitution_corrected_low_cov_kmer_path(tmp_path):
    """~5x coverage: qv < 95 opens an LQ region; the yak recheck fixes it."""
    rng = np.random.default_rng(12)
    t = rand_seq(rng, 3000)
    err = 1501
    bad = b"G" if t[err : err + 1] != b"G" else b"T"
    asm = t[:err] + bad + t[err + 1 :]
    table = make_table(tmp_path, [t])
    reads = [rec(s, [(0, len(r))], r, qname=f"r{s}".encode())
             for s, r in tiled_reads(t, length=900, step=600)]
    cb = polish_contig(asm, reads, [table], cfg_small())
    assert consensus_to_bytes(cb) == t


def test_deletion_in_assembly_corrected(tmp_path):
    """Assembly lost one base; reads carry an insertion relative to it."""
    rng = np.random.default_rng(13)
    t = rand_seq(rng, 3000)
    dpos = 1499
    asm = t[:dpos] + t[dpos + 1 :]
    table = make_table(tmp_path, [t])
    reads = []
    for s, r in tiled_reads(t, length=900, step=200):
        e = s + len(r)
        if s < dpos < e - 1:
            cigar = [(0, dpos - s), (1, 1), (0, e - dpos - 1)]
        elif e <= dpos + 1:
            cigar = [(0, len(r))]
        else:  # s >= dpos
            cigar = [(0, len(r))]
            s = s - 1  # positions shift in asm coordinates
        reads.append(rec(s if s < dpos else s, cigar, r, qname=f"r{s}".encode()))
    cb = polish_contig(asm, reads, [table], cfg_small())
    assert consensus_to_bytes(cb) == t


def test_insertion_in_assembly_corrected(tmp_path):
    """Assembly gained one junk base; reads carry a deletion relative to it."""
    rng = np.random.default_rng(14)
    t = rand_seq(rng, 3000)
    ipos = 1500
    asm = t[:ipos] + b"A" + t[ipos:]
    if t[ipos - 1 : ipos] == b"A" or t[ipos : ipos + 1] == b"A":
        asm = t[:ipos] + b"C" + t[ipos:]
        if t[ipos - 1 : ipos] == b"C" or t[ipos : ipos + 1] == b"C":
            asm = t[:ipos] + b"G" + t[ipos:]
    table = make_table(tmp_path, [t])
    reads = []
    for s, r in tiled_reads(t, length=900, step=200):
        e = s + len(r)
        if s < ipos < e:
            cigar = [(0, ipos - s), (2, 1), (0, e - ipos)]
            reads.append(rec(s, cigar, r, qname=f"r{s}".encode()))
        elif e <= ipos:
            reads.append(rec(s, [(0, len(r))], r, qname=f"r{s}".encode()))
        else:
            reads.append(rec(s + 1, [(0, len(r))], r, qname=f"r{s}".encode()))
    cb = polish_contig(asm, reads, [table], cfg_small())
    assert consensus_to_bytes(cb) == t


def test_passthrough_short_contig(tmp_path):
    t = b"ACGTACGTAAccGTACGT"
    cb = polish_contig(t, [], [], PolishConfig(min_ctg_len=1000))
    assert consensus_to_bytes(cb) == t  # case preserved, untouched


def test_het_site_phasing_keeps_ref_haplotype(tmp_path):
    """Two haplotypes; assembly = hap1. Reads from hap2 must be phased out so the
    consensus keeps hap1 alleles (no switch error)."""
    rng = np.random.default_rng(15)
    hap1 = bytearray(rand_seq(rng, 3000))
    hap2 = bytearray(hap1)
    # several het SNPs clustered so reads span >= 2 (phasing needs shared intervals)
    snp_pos = [1400, 1450, 1500, 1550, 1600]
    for sp in snp_pos:
        old = hap2[sp]
        for nb in b"ACGT":
            if nb != old:
                hap2[sp] = nb
                break
    hap1, hap2 = bytes(hap1), bytes(hap2)
    table = make_table(tmp_path, [hap1, hap2])  # short reads from both haplotypes
    reads = []
    for s, r in tiled_reads(hap1, length=900, step=450):
        reads.append(rec(s, [(0, len(r))], r, qname=f"h1_{s}".encode()))
    for s, r in tiled_reads(hap2, length=900, step=450):
        reads.append(rec(s, [(0, len(r))], r, qname=f"h2_{s}".encode()))
    cb = polish_contig(hap1, reads, [table], cfg_small())
    out = consensus_to_bytes(cb)
    assert out == hap1, "switch error: hap2 alleles leaked into consensus"
