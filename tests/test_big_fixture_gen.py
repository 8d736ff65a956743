"""tools/make_big_fixture.py: aligner-free fixture synthesis.

The generator composes read-vs-assembly CIGARs analytically from the known
assembly edit list (sub -> M, assembly-ins -> D, assembly-del -> I, boundary
dels -> soft clips). These tests pin (1) the CIGAR composition against a
brute-force column expansion and (2) a tiny end-to-end polish restoring the
truth byte-exactly — the same property the recorded >=50 Mb run relies on.
"""

import io
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(ROOT, "tools"))


def _expand(ops, read, asm, pos0):
    """Expand CIGAR into (q_col, t_col) gapped arrays (like fill_with_cigar)."""
    q, t = [], []
    qi, ti = 0, pos0
    for op, ln in ops:
        if op == 4:
            qi += ln
        elif op == 0:
            q.extend(read[qi:qi + ln]); t.extend(asm[ti:ti + ln])
            qi += ln; ti += ln
        elif op == 1:
            q.extend(read[qi:qi + ln]); t.extend([45] * ln)
            qi += ln
        elif op == 2:
            q.extend([45] * ln); t.extend(asm[ti:ti + ln])
            ti += ln
        else:
            raise AssertionError(op)
    return np.array(q, np.uint8), np.array(t, np.uint8), qi, ti


def test_compose_cigar_columns():
    from make_big_fixture import (apply_edits, asm_coord_fn, compose_cigar,
                                  make_edits, rand_seq)

    rng = np.random.default_rng(3)
    for trial in range(20):
        n = 4000
        truth = rand_seq(rng, n)
        pos, kind, base = make_edits(rng, n, 400)
        asm = apply_edits(truth, pos, kind, base)
        coord = asm_coord_fn(pos, kind)
        for _ in range(10):
            a = int(rng.integers(0, n - 1600))
            b = a + int(rng.integers(1500, min(3000, n - a)))
            ops, a2, head, tail = compose_cigar(a, b, pos, kind)
            read = truth[a:b]
            qcols, tcols, qlen, tend = _expand(ops, read, asm, coord(a2))
            # query fully consumed, reference span inside the contig
            assert qlen == len(read)
            assert tend <= len(asm)
            # every non-edit column matches exactly; total mismatches == #subs
            # inside the aligned range (reads here carry no sequencing errors)
            sub_in = int(np.sum((pos >= a2) & (pos < b - tail)
                                & (kind == 0)))
            mism = int(np.sum((qcols != tcols) & (qcols != 45) & (tcols != 45)))
            assert mism == sub_in, (trial, a, b, mism, sub_in)


def test_tiny_bigfixture_polish_restores_truth(tmp_path):
    prefix = str(tmp_path / "b")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "make_big_fixture.py"),
         prefix, "--contigs", "1", "--size", "40000", "--small", "0",
         "--err-bp", "2500", "--cov", "30", "--seed", "5"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr

    from nextpolish2_tpu.config import PolishConfig
    from nextpolish2_tpu.io.fastx import read_fastx
    from nextpolish2_tpu.pipeline.orchestrator import polish

    out = io.BytesIO()
    polish(prefix + ".fa", prefix + ".bam", [prefix + ".k21.yak"],
           PolishConfig(min_ctg_len=1000), out=out)
    out_path = str(tmp_path / "out.fa")
    with open(out_path, "wb") as f:
        f.write(out.getvalue())
    polished = {n.split()[0]: s for n, s in read_fastx(out_path)}
    truth = {n: s for n, s in read_fastx(prefix + ".truth.fa")}
    for name, t in truth.items():
        assert polished[name] == t, name
