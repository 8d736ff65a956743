"""Native (C++) extraction vs the pure-Python path: exact equality on real data."""

import os

import numpy as np
import pytest

from nextpolish2_tpu.config import PolishConfig
from nextpolish2_tpu.io.bam import BamReader
from nextpolish2_tpu.io.fastx import read_fastx
from nextpolish2_tpu.io.native import available, bam_refs_native
from nextpolish2_tpu.models.oracle import build_alignseqs, build_alignseqs_native
from nextpolish2_tpu.models.oracle_msa import kmer_stream

BAM = "/root/repo/testdata/hifi.map.sort.bam"
ASM = "/root/reference/test/asm.fa.gz"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(BAM) and available()),
    reason="needs real test BAM + native library")


def test_native_refs_match_python():
    py = BamReader(BAM).references
    assert bam_refs_native(BAM) == py


def test_native_extraction_equals_python():
    tseq = next(iter(read_fastx(ASM)))[1]
    recs = next(BamReader(BAM).by_contig())[1]
    cfg = PolishConfig(min_ctg_len=1000)
    a_py = build_alignseqs(tseq, recs, cfg)
    a_nat = build_alignseqs_native(BAM, 0, tseq, cfg)
    assert a_nat is not None
    assert len(a_py) == len(a_nat)
    for i, (p, q) in enumerate(zip(a_py, a_nat)):
        assert (p.aln_t_s, p.aln_t_e) == (q.aln_t_s, q.aln_t_e), i
        assert p.clip_label == q.clip_label and p.dropped == q.dropped, i
        np.testing.assert_array_equal(p.t_pos, q.t_pos, err_msg=f"aln {i}")
        np.testing.assert_array_equal(p.delta, q.delta, err_msg=f"aln {i}")
        np.testing.assert_array_equal(p.q_base, q.q_base, err_msg=f"aln {i}")
        tp, kp = kmer_stream(p)
        tq, kq = kmer_stream(q)
        np.testing.assert_array_equal(kp, kq, err_msg=f"aln {i} kmer keys")
