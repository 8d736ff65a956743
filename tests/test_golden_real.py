"""Golden end-to-end gate on REAL data: a 20 kb slice of the bundled contig with
its real HiFi alignments and short-read k-mer tables. The stored golden was
produced by the oracle engine; the TPU windowed path must match byte-for-byte.

(The full 100 kb contig is validated the same way outside pytest — see
testdata/asm.np2.oracle.fa and the verify skill.)
"""

import os

import pytest

from nextpolish2_tpu.config import PolishConfig
from nextpolish2_tpu.io.bam import BamReader
from nextpolish2_tpu.io.fastx import read_fastx
from nextpolish2_tpu.io.yak import load_yak
from nextpolish2_tpu.models.oracle import consensus_to_bytes

BASE = "/root/repo/testdata"
NEEDED = ["slice.fa", "slice.bam", "slice.golden.fa", "k21.yak", "k31.yak"]

pytestmark = pytest.mark.skipif(
    not all(os.path.exists(os.path.join(BASE, f)) for f in NEEDED),
    reason="real-data fixtures not generated")


def test_tpu_engine_matches_golden_slice():
    from nextpolish2_tpu.pipeline.engine import polish_contig_tpu

    tseq = next(iter(read_fastx(f"{BASE}/slice.fa")))[1]
    recs = next(BamReader(f"{BASE}/slice.bam").by_contig())[1]
    tables = [load_yak(f"{BASE}/k21.yak"), load_yak(f"{BASE}/k31.yak")]
    cfg = PolishConfig(min_ctg_len=1000)
    cb = polish_contig_tpu(tseq, recs, tables, cfg, fallback=False)
    out = consensus_to_bytes(cb)
    golden = next(iter(read_fastx(f"{BASE}/slice.golden.fa")))[1]
    assert out == golden


def test_native_ingest_matches_golden_slice():
    from nextpolish2_tpu.io.native import available
    from nextpolish2_tpu.pipeline.engine import polish_contig_tpu

    if not available():
        pytest.skip("native library unavailable")
    tseq = next(iter(read_fastx(f"{BASE}/slice.fa")))[1]
    tables = [load_yak(f"{BASE}/k21.yak"), load_yak(f"{BASE}/k31.yak")]
    cfg = PolishConfig(min_ctg_len=1000)
    cb = polish_contig_tpu(tseq, [], tables, cfg, fallback=False,
                           native=(f"{BASE}/slice.bam", 0))
    out = consensus_to_bytes(cb)
    golden = next(iter(read_fastx(f"{BASE}/slice.golden.fa")))[1]
    assert out == golden
