"""Diploid end-to-end: polish a het-bearing fixture without switch errors
(BASELINE 'S. cerevisiae diploid' config mechanism, CI scale).

make_fixture --het-rate draws reads 50/50 from two haplotypes; the assembly
is haplotype 1 with injected errors. Polishing must fix the errors while the
phasing stage (models/oracle_lq.py mark_hete_lqseqs + Louvain) keeps every
het site on haplotype 1 — evaluated with tools/switch_eval.py's context
check (the reference's yak-trioeval analogue)."""

import io
import os
import subprocess
import sys


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_diploid_fixture_polish_no_switches(tmp_path):
    prefix = str(tmp_path / "d")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "make_fixture.py"),
         prefix, "--contigs", "1", "--size", "30000", "--cov", "36",
         "--het-rate", "0.001", "--errors-per-contig", "8", "--seed", "13"],
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

    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "switch_eval.py"),
         out_path, prefix + ".truth.fa", prefix + ".het.tsv"],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, f"switch errors or lost sites: {r.stdout}"
    assert "switch errors (hap2): 0" in r.stdout

    # and the polished contig equals haplotype 1 exactly
    truth = dict(read_fastx(prefix + ".truth.fa"))
    polished = dict(read_fastx(out_path))
    for name, t in truth.items():
        assert polished[name] == t
