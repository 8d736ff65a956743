"""Host-sharded contig assignment + shard merging."""

import os

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


def test_completed_contigs_out_pos_and_trim(tmp_path):
    """--resume with --out_pos shards: completed_contigs must parse the TSV
    (it used to silently return empty and re-polish everything), dropping the
    possibly-partial last contig; trim_partial_output truncates that tail."""
    from nextpolish2_tpu.pipeline.orchestrator import (completed_contigs,
                                                       trim_partial_output)

    p = str(tmp_path / "out.pos")
    rows = (b"ctgA\tA\t0\nctgA\tC\t1\nctgB\tG\t0\nctgB\tT\t1\n"
            b"ctgC\tA\t0\n")  # ctgC possibly mid-write
    with open(p, "wb") as f:
        f.write(rows)
    done = completed_contigs(p, out_pos=True)
    assert done == {"ctgA", "ctgB"}
    trim_partial_output(p, out_pos=True)
    with open(p, "rb") as f:
        assert f.read() == (b"ctgA\tA\t0\nctgA\tC\t1\n"
                            b"ctgB\tG\t0\nctgB\tT\t1\n")


def test_trim_partial_output_fasta(tmp_path):
    from nextpolish2_tpu.pipeline.orchestrator import (completed_contigs,
                                                       trim_partial_output)

    p = str(tmp_path / "out.fa")
    with open(p, "wb") as f:
        f.write(b">ctgA start:0 end:3\nACGT\n>ctgB start:0 end:1\nAC")  # cut
    assert completed_contigs(p) >= {"ctgA"}
    trim_partial_output(p)
    with open(p, "rb") as f:
        assert f.read() == b">ctgA start:0 end:3\nACGT\n"


def test_finalize_shards_barrier_and_merge(tmp_path):
    """Host sentinels + host-0 merge: host 0 waits for every .done sentinel,
    merges shards into input order, and removes the sentinels."""
    from nextpolish2_tpu.parallel.distributed import (HostShard,
                                                      finalize_shards)

    fa = str(tmp_path / "asm.fa")
    with open(fa, "wb") as f:
        f.write(b">c0\nAAAA\n>c1\nCCCC\n>c2\nGGGG\n")
    out = str(tmp_path / "out.fa")
    # host 1 owns contig index 1; host 0 owns 0 and 2 (round-robin)
    with open(out + ".shard0", "wb") as f:
        f.write(b">c0 start:0 end:3\nAAAA\n>c2 start:0 end:3\nGGGG\n")
    with open(out + ".shard1", "wb") as f:
        f.write(b">c1 start:0 end:3\nCCCC\n")
    assert finalize_shards(out, HostShard(1, 2), fa) is False  # non-0: sentinel only
    assert os.path.exists(out + ".shard1.done")
    assert finalize_shards(out, HostShard(0, 2), fa, timeout_s=10) is True
    with open(out, "rb") as f:
        data = f.read()
    assert data == (b">c0 start:0 end:3\nAAAA\n>c1 start:0 end:3\nCCCC\n"
                    b">c2 start:0 end:3\nGGGG\n")
    assert not os.path.exists(out + ".shard0.done")
    assert not os.path.exists(out + ".shard1.done")


def test_finalize_shards_timeout(tmp_path):
    import pytest

    from nextpolish2_tpu.parallel.distributed import (HostShard,
                                                      finalize_shards)

    fa = str(tmp_path / "asm.fa")
    with open(fa, "wb") as f:
        f.write(b">c0\nAAAA\n")
    out = str(tmp_path / "out.fa")
    with open(out + ".shard0", "wb") as f:
        f.write(b">c0 start:0 end:3\nAAAA\n")
    # host 1 never completes
    with pytest.raises(TimeoutError):
        finalize_shards(out, HostShard(0, 2), fa, timeout_s=2.5)
