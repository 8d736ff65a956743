#!/usr/bin/env python3
"""Assembly QV estimation against a short-read yak table (merqury-style).

Usage: qv.py assembly.fa[.gz] short.reads.yak [-k MIN_COUNT]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextpolish2_tpu.eval.qv import estimate_qv  # noqa: E402
from nextpolish2_tpu.io.fastx import read_fastx  # noqa: E402
from nextpolish2_tpu.io.yak import load_yak  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("fa")
    p.add_argument("yak")
    p.add_argument("-k", "--min_kmer_count", type=int, default=5)
    a = p.parse_args(argv)
    table = load_yak(a.yak)
    seqs = [s for _, s in read_fastx(a.fa)]
    r = estimate_qv(seqs, table, a.min_kmer_count)
    print(r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
