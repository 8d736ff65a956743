#!/usr/bin/env python3
"""HiFi read aligner: reads + assembly -> coordinate-sorted BAM.

Usage: align.py asm.fa[.gz] hifi.fa[.gz] out.bam
Data-prep equivalent of `minimap2 -ax map-hifi | samtools sort` (reference
README.md:55-77, test/hh.sh:8-9).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextpolish2_tpu.io.fastx import read_fastx  # noqa: E402
from nextpolish2_tpu.pipeline.hifi_align import align_to_bam  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("fa", help="assembly FASTA[.gz]")
    p.add_argument("reads", help="HiFi reads FASTA/FASTQ[.gz]")
    p.add_argument("out", help="output BAM path")
    p.add_argument("-k", type=int, default=15, help="seed k-mer size")
    a = p.parse_args(argv)
    targets = list(read_fastx(a.fa))
    reads = list(read_fastx(a.reads))
    n = align_to_bam(targets, reads, a.out, k=a.k)
    print(f"mapped {n}/{len(reads)} reads -> {a.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
