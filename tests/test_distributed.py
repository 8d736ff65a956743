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
    """Multi-host round-robin contig sharding runs the REAL polishing engine
    (not the passthrough branch) on every shard, and merge restores order."""
    from nextpolish2_tpu.io.bam import BamRecord

    rng = np.random.default_rng(90)
    contigs = [(f"c{i}", bytes(rng.choice(list(b"ACGT"), size=400).astype(np.uint8)))
               for i in range(5)]
    fa = tmp_path / "a.fa"
    with open(fa, "wb") as f:
        for n, s in contigs:
            f.write(b">" + n.encode() + b"\n" + s + b"\n")
    bam = tmp_path / "e.bam"
    with BamWriter(str(bam), [(n, len(s)) for n, s in contigs]) as w:
        for tid, (n, s) in enumerate(contigs):
            for r in range(3):  # error-free coverage: polish() must return s
                w.write(BamRecord(qname=f"{n}r{r}".encode(), flag=0, tid=tid,
                                  pos=0, mapq=60, cigar=[(0, len(s))], seq=s))
    h, c = count_kmers([s for _, s in contigs], 21)
    yak = tmp_path / "t.yak"
    write_yak(str(yak), 21, h, c)
    out = str(tmp_path / "out.fa")
    cfg = PolishConfig(min_ctg_len=100, min_read_len=100, min_map_len=50)
    stats = []
    for hid in range(2):
        shard = HostShard(hid, 2)
        from nextpolish2_tpu.pipeline.orchestrator import PolishStats

        st = PolishStats()
        with open(shard.shard_path(out), "wb") as f:
            polish(str(fa), str(bam), [str(yak)], cfg, out=f, host_shard=shard,
                   stats=st)
        stats.append(st)
    assert [s.polished for s in stats] == [3, 2]  # engine ran on every contig
    merge_shards(out, 2, [n for n, _ in contigs])
    from nextpolish2_tpu.io.fastx import read_fastx
    merged = list(read_fastx(out))
    assert [n for n, _ in merged] == [n for n, _ in contigs]  # input order
    assert all(m[1] == c[1] for m, c in zip(merged, contigs))


def test_merge_shards_missing_is_error(tmp_path):
    out = str(tmp_path / "o.fa")
    with open(out + ".shard0", "wb") as f:
        f.write(b">c0 start:0 end:3\nACGT\n")
    import pytest

    with pytest.raises(FileNotFoundError):
        merge_shards(out, 2, ["c0", "c1"])
    with pytest.raises(ValueError):
        merge_shards(out, 1, ["c0", "c1"])  # c1 absent from shards


def test_merge_shards_out_pos(tmp_path):
    out = str(tmp_path / "o.pos")
    with open(out + ".shard0", "wb") as f:
        f.write(b"c0\tA\t0\nc0\tC\t1\n")
    with open(out + ".shard1", "wb") as f:
        f.write(b"c1\tG\t0\n")
    merge_shards(out, 2, ["c0", "c1"], out_pos=True)
    with open(out, "rb") as f:
        assert f.read() == b"c0\tA\t0\nc0\tC\t1\nc1\tG\t0\n"
