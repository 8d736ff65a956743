"""BAM round-trip and HiFi aligner tests on synthetic data."""

import gzip

import numpy as np
import pytest

from nextpolish2_tpu.io.bam import BamReader, BamRecord, BamWriter
from nextpolish2_tpu.io.fastx import read_fastx
from nextpolish2_tpu.pipeline.hifi_align import TargetIndex, _edit_align, align_read, align_to_bam
from nextpolish2_tpu.utils.seqcodes import revcomp


def rand_seq(rng, n):
    return bytes(rng.choice(list(b"ACGT"), size=n).astype(np.uint8))


def mutate(rng, seq, sub=0.001, ins=0.0005, dele=0.0005):
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


def test_bam_roundtrip(tmp_path):
    path = str(tmp_path / "t.bam")
    recs = [
        BamRecord(qname=b"r1", flag=0, tid=0, pos=5, mapq=60,
                  cigar=[(4, 3), (0, 10), (1, 2), (0, 5), (2, 4), (0, 6)],
                  seq=b"ACGTACGTACGTACGTACGTACGTAC"),
        BamRecord(qname=b"r2", flag=16, tid=0, pos=50, mapq=13,
                  cigar=[(0, 8)], seq=b"ACGTACGT"),
    ]
    with BamWriter(path, [("ctg1", 1000), ("ctg2", 500)]) as w:
        for r in recs:
            w.write(r)
    rd = BamReader(path)
    assert rd.references == [("ctg1", 1000), ("ctg2", 500)]
    got = list(rd)
    assert len(got) == 2
    for a, b in zip(recs, got):
        assert a.qname == b.qname and a.flag == b.flag and a.pos == b.pos
        assert a.cigar == b.cigar and a.seq == b.seq and a.mapq == b.mapq
    assert got[0].reference_end() == 5 + 10 + 5 + 4 + 6
    assert got[0].seq_len_from_cigar(True) == 26
    assert got[1].is_reverse and not got[0].is_reverse


def test_fastx_reads_reference_bundle():
    recs = list(read_fastx("/root/reference/test/asm.fa.gz"))
    assert len(recs) == 1
    name, seq = recs[0]
    assert name == "ptg000005l:21113231-21213230"
    assert len(seq) == 100000


def test_edit_align_simple():
    assert _edit_align(b"ACGT", b"ACGT")[0] == [(0, 4)]
    assert sum(l for op, l in _edit_align(b"ACGT", b"ACT")[0] if op == 1) == 1
    ops, _ = _edit_align(b"AT", b"ACGT")
    assert sum(l for op, l in ops if op == 2) == 2  # two deletions
    # semi-global: free target end consumes only what's needed
    ops, _ = _edit_align(b"ACG", b"ACGTTTTT", free_t_end=True)
    assert ops == [(0, 3)]
    # free target start finds the offset (alignment still ends at t's end)
    ops, j0 = _edit_align(b"GTT", b"AAACGTT", free_t_start=True)
    assert ops == [(0, 3)] and j0 == 4


def test_align_read_exact_and_mutated():
    rng = np.random.default_rng(7)
    t = rand_seq(rng, 20000)
    idx = TargetIndex.build(t)
    # exact slice
    r = align_read(idx, t, t[3000:8000])
    assert r is not None and not r.reverse and r.pos == 3000
    assert r.cigar == [(0, 5000)]
    # reverse strand, with errors
    read = mutate(rng, revcomp(t[4000:12000]))
    r = align_read(idx, t, read)
    assert r is not None and r.reverse
    assert abs(r.pos - 4000) < 30
    span = sum(l for op, l in r.cigar if op in (0, 2, 7, 8))
    assert abs(span - 8000) < 60
    # unmappable garbage
    assert align_read(idx, t, rand_seq(rng, 3000)) is None


def test_align_to_bam_sorted(tmp_path):
    rng = np.random.default_rng(8)
    t = rand_seq(rng, 30000)
    reads = []
    for i in range(20):
        s = int(rng.integers(0, 20000))
        ln = int(rng.integers(4000, 9000))
        seq = mutate(rng, t[s : s + ln])
        if rng.random() < 0.5:
            seq = revcomp(seq)
        reads.append((f"read{i}", seq))
    path = str(tmp_path / "a.bam")
    n = align_to_bam([("ctg", t)], reads, path)
    assert n == 20
    rd = BamReader(path)
    poss = [r.pos for r in rd]
    assert poss == sorted(poss)


def test_cg_tag_long_cigar_both_readers(tmp_path):
    """BAM long-CIGAR convention (SAMv1 4.2.2): records whose CIGAR is stored
    as a "<l_seq>S <ref_len>N" placeholder + CG:B,I aux tag must decode to
    the real CIGAR in BOTH readers (Python BamReader and the native record
    walk) — silently mis-expanding them is a data-corruption class."""
    import numpy as np

    from nextpolish2_tpu.config import PolishConfig
    from nextpolish2_tpu.io.bam import BamReader, BamRecord, BamWriter
    from nextpolish2_tpu.utils.seqcodes import ASCII2CODE

    rng = np.random.default_rng(401)
    t = bytes(rng.choice(list(b"ACGT"), size=3000).astype(np.uint8))
    reads = []
    for s in range(0, 2000, 400):
        ins = bytes(rng.choice(list(b"ACGT"), size=5).astype(np.uint8))
        seq = t[s : s + 300] + ins + t[s + 310 : s + 600]
        cig = [(0, 300), (1, 5), (2, 10), (0, 290)]
        reads.append(BamRecord(qname=f"r{s}".encode(), flag=0, tid=0, pos=s,
                               mapq=60, cigar=cig, seq=seq))
    refs = [("ctg", len(t))]
    normal = str(tmp_path / "normal.bam")
    cgbam = str(tmp_path / "cg.bam")
    with BamWriter(normal, refs) as w:
        for r in reads:
            w.write(r)
    with BamWriter(cgbam, refs, cg_threshold=2) as w:  # force CG form
        for r in reads:
            w.write(r)

    recs_a = list(BamReader(normal))
    recs_b = list(BamReader(cgbam))
    assert len(recs_a) == len(recs_b) == len(reads)
    for ra, rb, orig in zip(recs_a, recs_b, reads):
        assert rb.cigar == ra.cigar == orig.cigar
        assert rb.seq == ra.seq

    # native record walk: identical tag streams from both files
    from nextpolish2_tpu.io.native import available, extract_contig_native

    if available():
        cfg = PolishConfig(min_ctg_len=0, min_read_len=100, min_map_len=50)
        codes = np.ascontiguousarray(ASCII2CODE[np.frombuffer(t, np.uint8)])
        ea = extract_contig_native(normal, 0, codes, cfg)
        eb = extract_contig_native(cgbam, 0, codes, cfg)
        assert ea is not None and eb is not None
        for xa, xb in zip(ea, eb):
            np.testing.assert_array_equal(xa, xb)
        assert len(ea[0]) > 0  # streams are non-trivial
