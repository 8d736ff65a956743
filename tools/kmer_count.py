#!/usr/bin/env python3
"""yak-equivalent k-mer counter: FASTQ/FASTA -> .yak dump.

Usage: kmer_count.py -k 21 [-k 31 ...] -o PREFIX reads1.fq.gz [reads2.fq.gz ...]
Writes PREFIX.k{K}.yak per requested K (data-prep; reference README.md:74-77
uses the external `yak count`).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextpolish2_tpu.io.fastx import read_fastx  # noqa: E402
from nextpolish2_tpu.io.yak import count_kmers, write_yak  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-k", type=int, action="append", required=True,
                   help="k-mer size (repeatable)")
    p.add_argument("-o", required=True, help="output prefix")
    p.add_argument("reads", nargs="+", help="FASTA/FASTQ[.gz] read files")
    a = p.parse_args(argv)
    seqs = []
    for path in a.reads:
        seqs.extend(seq for _, seq in read_fastx(path))
    print(f"read {len(seqs)} sequences, {sum(map(len, seqs)):,} bases",
          file=sys.stderr)
    for k in a.k:
        hashes, counts = count_kmers(seqs, k)
        out = f"{a.o}.k{k}.yak"
        write_yak(out, k, hashes, counts)
        print(f"{out}: {len(hashes):,} distinct {k}-mers", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
