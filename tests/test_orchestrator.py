"""Orchestrator: multi-contig polish, output formats, secondary alignments."""

import io

import numpy as np
import pytest

from nextpolish2_tpu.config import PolishConfig
from nextpolish2_tpu.io.bam import (BamReader, BamRecord, BamWriter,
                                    fill_secondary_seq, retrieve_secondary_seqs)
from nextpolish2_tpu.io.yak import count_kmers, load_yak, write_yak
from nextpolish2_tpu.pipeline.orchestrator import PolishStats, polish
from nextpolish2_tpu.utils.seqcodes import revcomp


def rand_seq(rng, n):
    return bytes(rng.choice(list(b"ACGT"), size=n).astype(np.uint8))


def setup_two_contigs(tmp_path, rng):
    t1 = rand_seq(rng, 3000)
    t2 = rand_seq(rng, 2500)
    # contig 2 has an error; reads carry the truth
    asm2 = bytearray(t2)
    asm2[1200] = ord("A") if t2[1200] != ord("A") else ord("C")
    asm2 = bytes(asm2)
    fa = tmp_path / "asm.fa"
    with open(fa, "wb") as f:
        f.write(b">c1\n" + t1 + b"\n>c2\n" + asm2 + b"\n")
    recs = []
    for tid, t in ((0, t1), (1, t2)):
        for s in range(0, len(t) - 800, 300):
            recs.append(BamRecord(qname=f"r{tid}_{s}".encode(), flag=0, tid=tid,
                                  pos=s, mapq=60, cigar=[(0, 800)],
                                  seq=t[s : s + 800]))
    bam = tmp_path / "r.bam"
    with BamWriter(str(bam), [("c1", len(t1)), ("c2", len(asm2))]) as w:
        for r in sorted(recs, key=lambda r: (r.tid, r.pos)):
            w.write(r)
    h, c = count_kmers([t1, t2] * 6, 21)
    yak = tmp_path / "t.yak"
    write_yak(str(yak), 21, h, c)
    return fa, bam, yak, t1, t2


def test_polish_multi_contig_order_and_fix(tmp_path):
    rng = np.random.default_rng(80)
    fa, bam, yak, t1, t2 = setup_two_contigs(tmp_path, rng)
    cfg = PolishConfig(min_ctg_len=0, min_read_len=100, min_map_len=50,
                       window_len=512)
    stats = PolishStats()
    out = polish(str(fa), str(bam), [str(yak)], cfg, engine="tpu", stats=stats)
    assert [p.name for p in out] == ["c1", "c2"]  # deterministic input order
    assert out[0].seq == t1
    assert out[1].seq == t2  # error fixed
    assert stats.contigs == 2 and stats.polished == 2


def test_polish_out_pos_and_uppercase(tmp_path):
    rng = np.random.default_rng(81)
    t1 = rand_seq(rng, 500).lower()
    fa = tmp_path / "a.fa"
    fa.write_bytes(b">c1\n" + t1 + b"\n")
    bam = tmp_path / "e.bam"
    with BamWriter(str(bam), [("c1", len(t1))]) as w:
        pass
    h, c = count_kmers([t1], 21)
    yak = tmp_path / "t.yak"
    write_yak(str(yak), 21, h, c)
    buf = io.BytesIO()
    cfg = PolishConfig(min_ctg_len=10**6, out_pos=True, uppercase=True)
    polish(str(fa), str(bam), [str(yak)], cfg, out=buf)
    lines = buf.getvalue().splitlines()
    assert len(lines) == 500
    assert lines[0].split(b"\t") == [b"c1", t1[:1].upper(), b"0"]


def test_secondary_seq_retrieval(tmp_path):
    rng = np.random.default_rng(82)
    read = rand_seq(rng, 300)
    bam = tmp_path / "s.bam"
    with BamWriter(str(bam), [("c1", 1000), ("c2", 1000)]) as w:
        # primary on c1, forward
        w.write(BamRecord(qname=b"q1", flag=0, tid=0, pos=10, mapq=60,
                          cigar=[(0, 300)], seq=read))
        # secondary on c2, reverse, no SEQ
        w.write(BamRecord(qname=b"q1", flag=0x110, tid=1, pos=20, mapq=0,
                          cigar=[(0, 300)], seq=b""))
    seqs = retrieve_secondary_seqs(str(bam))
    assert seqs == {b"q1": read}
    recs = [r for r in BamReader(str(bam))]
    sec = [r for r in recs if r.is_secondary][0]
    filled = fill_secondary_seq(sec, seqs)
    assert filled.seq == revcomp(read)  # reverse-mapped secondary
