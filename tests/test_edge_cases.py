"""Engine edge cases: iter_count=1, model=len, -r, tiny contigs, no anchors."""

import numpy as np
import pytest

from nextpolish2_tpu.config import PolishConfig
from nextpolish2_tpu.io.bam import BamRecord
from nextpolish2_tpu.io.yak import count_kmers, load_yak, write_yak
from nextpolish2_tpu.models.oracle import consensus_to_bytes, polish_contig
from nextpolish2_tpu.pipeline.engine import polish_contig_tpu


def rand_seq(rng, n):
    return bytes(rng.choice(list(b"ACGT"), size=n).astype(np.uint8))


def make_table(tmp_path, seqs, k=21, copies=6):
    h, c = count_kmers(list(seqs) * copies, k)
    path = str(tmp_path / "t.yak")
    write_yak(path, k, h, c)
    return load_yak(path)


def cfg_small(**kw):
    d = dict(min_ctg_len=0, min_read_len=100, min_map_len=50, window_len=512)
    d.update(kw)
    return PolishConfig(**d)


def hap_pair(rng, n=3000, snps=(1400, 1450, 1500, 1550, 1600)):
    h1 = bytearray(rand_seq(rng, n))
    h2 = bytearray(h1)
    for sp in snps:
        for nb in b"ACGT":
            if nb != h2[sp]:
                h2[sp] = nb
                break
    return bytes(h1), bytes(h2)


def reads_for(seqs, length=900, step=450, tag=""):
    out = []
    for hi, t in enumerate(seqs):
        for s in range(0, len(t) - length + 1, step):
            out.append(BamRecord(qname=f"{tag}h{hi}_{s}".encode(), flag=0,
                                 tid=0, pos=s, mapq=60,
                                 cigar=[(0, length)], seq=t[s : s + length]))
    out.sort(key=lambda r: r.pos)
    return out


@pytest.mark.parametrize("kw", [
    dict(iter_count=1),                      # -i 1: no phasing pass
    dict(model="len"),                       # -m len: weight-sorted communities
    dict(use_all_reads=True),                # -r
    dict(model="len", use_all_reads=True),
])
def test_variants_tpu_equals_oracle(tmp_path, kw):
    rng = np.random.default_rng(100)
    h1, h2 = hap_pair(rng)
    table = make_table(tmp_path, [h1, h2])
    recs = reads_for([h1, h2])
    cfg = cfg_small(**kw)
    a = polish_contig(h1, recs, [table], cfg)
    b = polish_contig_tpu(h1, recs, [table], cfg, fallback=False)
    assert consensus_to_bytes(a) == consensus_to_bytes(b)


def test_tiny_contig_single_window(tmp_path):
    rng = np.random.default_rng(101)
    t = rand_seq(rng, 300)
    table = make_table(tmp_path, [t])
    recs = [BamRecord(qname=b"r", flag=0, tid=0, pos=0, mapq=60,
                      cigar=[(0, 300)], seq=t)]
    cfg = cfg_small(min_read_len=100, window_len=512)
    a = polish_contig(t, recs, [table], cfg)
    b = polish_contig_tpu(t, recs, [table], cfg, fallback=False)
    assert consensus_to_bytes(a) == consensus_to_bytes(b) == t


def test_window_larger_than_contig(tmp_path):
    rng = np.random.default_rng(102)
    t = rand_seq(rng, 900)
    table = make_table(tmp_path, [t])
    recs = [BamRecord(qname=f"r{s}".encode(), flag=0, tid=0, pos=s, mapq=60,
                      cigar=[(0, 400)], seq=t[s : s + 400])
            for s in range(0, 500, 100)]
    cfg = cfg_small(min_read_len=100, window_len=4096)
    a = polish_contig(t, recs, [table], cfg)
    b = polish_contig_tpu(t, recs, [table], cfg, fallback=False)
    assert consensus_to_bytes(a) == consensus_to_bytes(b)
