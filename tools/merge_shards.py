#!/usr/bin/env python3
"""Merge multi-host output shards (OUT.shard<h>) into OUT in input contig order.

Usage: merge_shards.py OUT N_HOSTS assembly.fa[.gz] [--out_pos]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextpolish2_tpu.io.fastx import read_fastx  # noqa: E402
from nextpolish2_tpu.parallel.distributed import merge_shards  # noqa: E402


def main(argv=None) -> int:
    out, n_hosts, fa = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    names = [n for n, _ in read_fastx(fa)]
    merge_shards(out, n_hosts, names, out_pos="--out_pos" in sys.argv[4:])
    print(f"merged {n_hosts} shards -> {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
