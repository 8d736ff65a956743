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


def test_k32_only_rejected(tmp_path):
    """A k>=32-only table set is rejected with a clear error (the reference's
    2-bit allele rolling cannot represent it; main.rs:1488-1492)."""
    rng = np.random.default_rng(111)
    t = bytes(rng.choice(list(b"ACGT"), size=3000).astype(np.uint8))
    h, c = count_kmers([t] * 6, 41)
    path = str(tmp_path / "t41.yak")
    write_yak(path, 41, h, c)
    table = load_yak(path)
    recs = [BamRecord(qname=b"r0", flag=0, tid=0, pos=0, mapq=60,
                      cigar=[(0, 2000)], seq=t[:2000])]
    # inject an error so LQ machinery (and the guard) is reached
    asm = bytearray(t)
    asm[1000] = ord("A") if t[1000] != ord("A") else ord("C")
    cfg = PolishConfig(min_ctg_len=0, min_read_len=100, min_map_len=50,
                       window_len=512)
    with pytest.raises(ValueError, match="k < 32"):
        polish_contig(bytes(asm), recs, [table], cfg)
