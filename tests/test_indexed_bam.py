"""Indexed, bounded-memory BAM ingest (np2native.cc BGZF random access).

The reference random-accesses contigs via htslib's BAI index
(main.rs:1741-1745 IndexedReader::fetch). Our native layer resolves per-tid
virtual-offset ranges from a .bai sidecar, a cached .np2idx linear index, or
a one-pass streaming scan — these tests pin all three paths to identical
extraction results, plus the BGZF writer's spec framing (BSIZE = total - 1).
"""

import gzip
import os
import shutil
import struct

import numpy as np
import pytest

from nextpolish2_tpu.config import PolishConfig
from nextpolish2_tpu.io import native
from nextpolish2_tpu.io.bam import BamReader
from nextpolish2_tpu.io.fastx import read_fastx
from nextpolish2_tpu.utils.seqcodes import ASCII2CODE

TESTDATA = os.path.join(os.path.dirname(__file__), "..", "testdata")
BAM = os.path.join(TESTDATA, "m20.bam")
FA = os.path.join(TESTDATA, "m20.fa")

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _codes(seq) -> np.ndarray:
    if isinstance(seq, str):
        seq = seq.encode()
    return np.ascontiguousarray(ASCII2CODE[np.frombuffer(seq, np.uint8)])


def _extract_all(bam_path: str, refs, fa, tids) -> list:
    cfg = PolishConfig()
    out = []
    for tid in tids:
        name, _ = refs[tid]
        r = native.extract_contig_native(bam_path, tid, _codes(fa[name]), cfg, 2)
        assert r is not None
        out.append(r)
    return out


def _read_np2idx(path: str):
    with open(path, "rb") as f:
        d = f.read()
    assert d[:5] == b"NP2I\x01"
    n_ref = struct.unpack("<I", d[21:25])[0]
    rng = []
    for i in range(n_ref):
        off = 25 + i * 16
        rng.append(struct.unpack("<QQ", d[off:off + 16]))
    return rng


def _write_bai(path: str, ranges, with_pseudo: bool) -> None:
    """Spec-shaped BAI (SAMv1 5.2): per ref one regular bin with the
    whole-contig chunk; optionally the samtools pseudo-bin 37450."""
    with open(path, "wb") as f:
        f.write(b"BAI\x01")
        f.write(struct.pack("<i", len(ranges)))
        for vbeg, vend in ranges:
            if vbeg == vend:
                f.write(struct.pack("<i", 0))  # n_bin
                f.write(struct.pack("<i", 0))  # n_intv
                continue
            n_bin = 2 if with_pseudo else 1
            f.write(struct.pack("<i", n_bin))
            f.write(struct.pack("<Ii", 4681, 1))          # regular bin, 1 chunk
            f.write(struct.pack("<QQ", vbeg, vend))
            if with_pseudo:
                f.write(struct.pack("<Ii", 37450, 2))     # pseudo-bin
                f.write(struct.pack("<QQ", vbeg, vend))   # (off_beg, off_end)
                f.write(struct.pack("<QQ", 0, 0))         # (n_mapped, n_unmapped)
            f.write(struct.pack("<i", 0))                 # n_intv
        f.write(struct.pack("<Q", 0))                     # n_no_coor


@pytest.fixture(scope="module")
def m20(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("idxbam")
    refs = native.bam_refs_native(BAM)
    fa = {n: s for n, s in read_fastx(FA)}
    return tmp, refs, fa


def test_scan_vs_np2idx_cache(m20):
    tmp, refs, fa = m20
    tids = [0, 1, 7, 19]
    a = str(tmp / "scan.bam")
    shutil.copy(BAM, a)
    os.environ["NP2_NO_IDXCACHE"] = "1"
    try:
        scan = _extract_all(a, refs, fa, tids)
        assert not os.path.exists(a + ".np2idx")
    finally:
        os.environ.pop("NP2_NO_IDXCACHE")
    b = str(tmp / "cached.bam")
    shutil.copy(BAM, b)
    first = _extract_all(b, refs, fa, tids)   # builds + writes the cache
    assert os.path.exists(b + ".np2idx")
    # fresh path that loads a pre-existing cache (no scan)
    c = str(tmp / "preloaded.bam")
    shutil.copy(BAM, c)
    shutil.copy(b + ".np2idx", c + ".np2idx")
    # mtime must match for the cache to validate
    st = os.stat(b)
    os.utime(c, ns=(st.st_atime_ns, st.st_mtime_ns))
    cached = _extract_all(c, refs, fa, tids)
    for sa, sb, sc in zip(scan, first, cached):
        for xa, xb, xc in zip(sa, sb, sc):
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(xa, xc)


def test_stale_np2idx_is_rebuilt(m20):
    tmp, refs, fa = m20
    b = str(tmp / "stale.bam")
    shutil.copy(BAM, b)
    # poison cache with wrong size/mtime stamp: must be ignored and rebuilt
    with open(b + ".np2idx", "wb") as f:
        f.write(b"NP2I\x01" + struct.pack("<QQI", 1, 1, len(refs))
                + b"\x00" * (16 * len(refs)))
    got = _extract_all(b, refs, fa, [3])
    ref = _extract_all(BAM, refs, fa, [3])
    for xa, xb in zip(got[0], ref[0]):
        np.testing.assert_array_equal(xa, xb)
    # the rebuilt cache now validates
    rng = _read_np2idx(b + ".np2idx")
    assert any(ve > vb for vb, ve in rng)


@pytest.mark.parametrize("with_pseudo", [True, False])
def test_bai_path(m20, with_pseudo):
    tmp, refs, fa = m20
    tids = [0, 5, 19]
    base = _extract_all(BAM, refs, fa, tids)
    rng = _read_np2idx(BAM + ".np2idx")  # built by prior opens
    name = f"bai{int(with_pseudo)}.bam"
    d = str(tmp / name)
    shutil.copy(BAM, d)
    _write_bai(d + ".bai", rng, with_pseudo)
    os.environ["NP2_NO_IDXCACHE"] = "1"  # make sure only .bai can serve
    try:
        got = _extract_all(d, refs, fa, tids)
    finally:
        os.environ.pop("NP2_NO_IDXCACHE")
    for sa, sb in zip(base, got):
        for xa, xb in zip(sa, sb):
            np.testing.assert_array_equal(xa, xb)


def test_bgzf_writer_spec_framing(tmp_path):
    """BSIZE extra field = total block length - 1, blocks chain exactly, and
    the python gzip module still reads the stream transparently."""
    from nextpolish2_tpu.io.bgzf import BgzfWriter, BGZF_EOF

    payload = os.urandom(200_000)  # > 3 blocks
    p = tmp_path / "x.bgzf"
    with open(p, "wb") as raw, BgzfWriter(raw) as w:
        w.write(payload)
    with gzip.open(p, "rb") as f:
        assert f.read() == payload
    d = p.read_bytes()
    off = 0
    nblk = 0
    while off < len(d):
        assert d[off:off + 4] == b"\x1f\x8b\x08\x04", hex(off)
        xlen = struct.unpack("<H", d[off + 10:off + 12])[0]
        assert xlen == 6
        assert d[off + 12:off + 16] == b"BC\x02\x00"
        bsize = struct.unpack("<H", d[off + 16:off + 18])[0] + 1
        isize = struct.unpack("<I", d[off + bsize - 4:off + bsize])[0]
        assert isize <= 65280
        off += bsize
        nblk += 1
    assert off == len(d) and nblk >= 4
    assert d.endswith(BGZF_EOF)


def test_indexed_matches_python_reader(m20):
    """Full-stack check: the indexed native stream matches the pure-Python
    (whole-file) reader's record set on one contig."""
    _, refs, fa = m20
    tid = 2
    name, _ = refs[tid]
    cfg = PolishConfig()
    r = native.extract_contig_native(BAM, tid, _codes(fa[name]), cfg, 2)
    n_native = len(r[2])
    n_py = sum(1 for rec in BamReader(BAM) if rec.tid == tid)
    # native keeps a filtered subset; the python walk yields all tid records
    assert 0 < n_native <= n_py
