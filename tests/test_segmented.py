"""Segmented chromosome-scale engine: byte-exactness vs the whole-contig
engine, and RangeScanner unit behavior (pipeline/segmented.py,
np2_range_open/next/fetch)."""

import os

import numpy as np
import pytest

from nextpolish2_tpu.config import PolishConfig
from nextpolish2_tpu.io.fastx import read_fastx
from nextpolish2_tpu.io.native import RangeScanner, available
from nextpolish2_tpu.io.yak import load_yak
from nextpolish2_tpu.models.oracle import build_alignseqs_native_flat
from nextpolish2_tpu.utils.seqcodes import ASCII2CODE

BASE = os.path.join(os.path.dirname(__file__), "..", "testdata")
ASM = "/root/reference/test/asm.fa.gz"
BAM = os.path.join(BASE, "hifi.map.sort.bam")

pytestmark = pytest.mark.skipif(not available(),
                                reason="native library unavailable")


def _fixture():
    asm = dict(read_fastx(ASM))
    tseq = list(asm.values())[0]
    cfg = PolishConfig(min_ctg_len=1000)
    return tseq, cfg


def test_scanner_one_range_equals_full_ingest():
    tseq, cfg = _fixture()
    codes = ASCII2CODE[np.frombuffer(tseq, dtype=np.uint8)]
    aligns, _ = build_alignseqs_native_flat(BAM, 0, tseq, cfg)
    reads = aligns[1:]
    with RangeScanner(BAM, 0, codes, cfg) as sc:
        r = sc.next(0, len(tseq))
    assert len(r["orders"]) == len(reads)
    assert list(r["orders"]) == list(range(1, len(reads) + 1))
    ends = np.append(r["read_start"][1:], len(r["t"]))
    for i, a in enumerate(reads):
        s, e = int(r["read_start"][i]), int(ends[i])
        assert np.array_equal(r["t"][s:e] + r["base"], a.t_pos)
        assert np.array_equal(r["k"][s:e], a.kkey)
        assert r["bounds"][i, 0] + r["base"] == a.aln_t_s
        assert r["bounds"][i, 1] + r["base"] == a.aln_t_e
        assert bool(r["clip_drop"][i]) == a.dropped


def test_scanner_multi_range_covers_and_matches():
    tseq, cfg = _fixture()
    codes = ASCII2CODE[np.frombuffer(tseq, dtype=np.uint8)]
    aligns, _ = build_alignseqs_native_flat(BAM, 0, tseq, cfg)
    reads = aligns[1:]
    seen = set()
    lo = 0
    with RangeScanner(BAM, 0, codes, cfg) as sc:
        for hi in (20000, 35000, 60000, len(tseq)):
            r = sc.next(max(0, lo - 2), hi)
            ends = np.append(r["read_start"][1:], len(r["t"]))
            for i, o in enumerate(r["orders"]):
                a = reads[int(o) - 1]
                s, e = int(r["read_start"][i]), int(ends[i])
                assert np.array_equal(r["t"][s:e] + r["base"], a.t_pos)
                assert r["bounds"][i, 0] + r["base"] == a.aln_t_s
                assert bool(r["clip_drop"][i]) == a.dropped
                # set membership: overlap by trimmed bounds
                assert a.aln_t_s < hi and a.aln_t_e >= max(0, lo - 2)
                seen.add(int(o))
            lo = hi
    assert len(seen) == len(reads)


def test_scanner_same_lo_extension():
    """Re-calling next() with the same t_lo and a larger t_hi extends the
    set (the SegmentCutError retry path)."""
    tseq, cfg = _fixture()
    codes = ASCII2CODE[np.frombuffer(tseq, dtype=np.uint8)]
    with RangeScanner(BAM, 0, codes, cfg) as sc:
        r1 = sc.next(0, 10000)
        r2 = sc.next(0, 30000)
    assert len(r2["orders"]) >= len(r1["orders"])
    assert set(r1["orders"].tolist()) <= set(r2["orders"].tolist())


def test_segmented_byte_identical_100kb(monkeypatch):
    """The headline gate: forced 20 kb segments over the bundled real 100 kb
    contig (5+ segments, 2 iterations, phasing + multi-k recheck) must be
    byte-identical to the whole-contig engine."""
    from nextpolish2_tpu.pipeline.engine import polish_contig_tpu
    from nextpolish2_tpu.pipeline.segmented import polish_contig_tpu_segmented

    tseq, cfg = _fixture()
    tables = [load_yak(os.path.join(BASE, "k21.yak")),
              load_yak(os.path.join(BASE, "k31.yak"))]
    monkeypatch.setenv("NP2_SEG_LEN", "20000")
    cb_seg = polish_contig_tpu_segmented(tseq, tables, cfg, BAM, 0)
    cb_ref = polish_contig_tpu(tseq, [], tables, cfg, native=(BAM, 0))
    assert cb_seg.to_bytes() == cb_ref.to_bytes()
    assert np.array_equal(cb_seg.pos, cb_ref.pos)


def test_segmented_tiny_segments_byte_identical(monkeypatch):
    """Pathologically small segments (5 kb nominal) stress cut selection,
    carry eviction and cross-boundary LQ routing."""
    from nextpolish2_tpu.pipeline.engine import polish_contig_tpu
    from nextpolish2_tpu.pipeline.segmented import polish_contig_tpu_segmented

    tseq, cfg = _fixture()
    tables = [load_yak(os.path.join(BASE, "k21.yak"))]
    monkeypatch.setenv("NP2_SEG_LEN", "5000")
    cb_seg = polish_contig_tpu_segmented(tseq, tables, cfg, BAM, 0)
    cb_ref = polish_contig_tpu(tseq, [], tables, cfg, native=(BAM, 0))
    assert cb_seg.to_bytes() == cb_ref.to_bytes()


def test_segmented_routing_in_polish_contig_tpu(monkeypatch):
    """polish_contig_tpu routes to the segmented engine when the contig
    crosses the threshold (NP2_SEG_FORCE) and matches the direct call."""
    from nextpolish2_tpu.pipeline.engine import polish_contig_tpu

    tseq, cfg = _fixture()
    tables = [load_yak(os.path.join(BASE, "k21.yak"))]
    ref = polish_contig_tpu(tseq, [], tables, cfg, native=(BAM, 0))
    monkeypatch.setenv("NP2_SEG_FORCE", "1")
    monkeypatch.setenv("NP2_SEG_LEN", "30000")
    seg = polish_contig_tpu(tseq, [], tables, cfg, native=(BAM, 0))
    assert seg.to_bytes() == ref.to_bytes()
