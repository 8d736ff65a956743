"""Host-sharded contig assignment + shard merging."""

import numpy as np

from nextpolish2_tpu.config import PolishConfig
from nextpolish2_tpu.io.bam import BamWriter
from nextpolish2_tpu.io.yak import count_kmers, write_yak
from nextpolish2_tpu.parallel.distributed import HostShard, merge_shards
from nextpolish2_tpu.pipeline.orchestrator import polish


def test_host_shard_partition():
    shards = [HostShard(h, 3) for h in range(3)]
    owned = [[i for i in range(10) if s.owns(i)] for s in shards]
    assert owned == [[0, 3, 6, 9], [1, 4, 7], [2, 5, 8]]
    assert HostShard(0, 1).shard_path("/x/out.fa") == "/x/out.fa"
    assert HostShard(2, 3).shard_path("/x/out.fa") == "/x/out.fa.shard2"


def test_sharded_polish_and_merge(tmp_path):
    rng = np.random.default_rng(90)
    contigs = [(f"c{i}", bytes(rng.choice(list(b"ACGT"), size=400).astype(np.uint8)))
               for i in range(5)]
    fa = tmp_path / "a.fa"
    with open(fa, "wb") as f:
        for n, s in contigs:
            f.write(b">" + n.encode() + b"\n" + s + b"\n")
    bam = tmp_path / "e.bam"
    with BamWriter(str(bam), [(n, len(s)) for n, s in contigs]) as w:
        pass
    h, c = count_kmers([s for _, s in contigs], 21)
    yak = tmp_path / "t.yak"
    write_yak(str(yak), 21, h, c)
    out = str(tmp_path / "out.fa")
    cfg = PolishConfig(min_ctg_len=10**6)  # passthrough for speed
    for hid in range(2):
        shard = HostShard(hid, 2)
        with open(shard.shard_path(out), "wb") as f:
            polish(str(fa), str(bam), [str(yak)], cfg, out=f, host_shard=shard)
    merge_shards(out, 2, [n for n, _ in contigs])
    from nextpolish2_tpu.io.fastx import read_fastx
    merged = list(read_fastx(out))
    assert [n for n, _ in merged] == [n for n, _ in contigs]  # input order
    assert all(m[1] == c[1] for m, c in zip(merged, contigs))
