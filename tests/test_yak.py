"""Unit tests for k-mer hashing, rolling k-mers, and yak table IO.

Oracles here are independent scalar re-implementations of the documented semantics
(reference src/utils/kmer.rs), so vectorized paths are checked against simple code.
"""

import numpy as np
import pytest

from nextpolish2_tpu.io.yak import (
    KmerTable,
    count_kmers,
    kmer_to_seq,
    load_yak,
    rolling_kmers,
    seq_kmers,
    write_yak,
    yak_hash64,
    yak_hash64_64,
)
from nextpolish2_tpu.utils.seqcodes import ASCII2CODE, revcomp, seq_to_codes

M64 = (1 << 64) - 1


def scalar_hash64(key: int, mask: int) -> int:
    key = (~key + (key << 21)) & M64 & mask
    key = key ^ (key >> 24)
    key = ((key + (key << 3)) + (key << 8)) & M64 & mask
    key = key ^ (key >> 14)
    key = ((key + (key << 2)) + (key << 4)) & M64 & mask
    key = key ^ (key >> 28)
    key = (key + (key << 31)) & M64 & mask
    return key


def scalar_kmers(seq: bytes, ksize: int):
    """Scalar port of iter2kmer semantics (kmer.rs:255-314)."""
    out = []
    l = 0
    if ksize < 32:
        shift = 2 * (ksize - 1)
        mask = (1 << (2 * ksize)) - 1
        f = r = 0
        for ch in seq:
            c = int(ASCII2CODE[ch])
            if c < 4:
                f = ((f << 2) | c) & mask
                r = (r >> 2) | ((3 ^ c) << shift)
                l += 1
            else:
                l = 0
            if l >= ksize:
                out.append(min(f, r))
    else:
        shift = ksize - 1
        mask = (1 << ksize) - 1
        x = [0, 0, 0, 0]
        for ch in seq:
            c = int(ASCII2CODE[ch])
            if c < 4:
                x[0] = ((x[0] << 1) | (c & 1)) & mask
                x[1] = ((x[1] << 1) | (c >> 1)) & mask
                x[2] = (x[2] >> 1) | ((1 - (c & 1)) << shift)
                x[3] = (x[3] >> 1) | ((1 - (c >> 1)) << shift)
                l += 1
            else:
                l = 0
            if l >= ksize:
                j = 0 if x[1] < x[3] else 1

                def h64(key):
                    key = (~key + (key << 21)) & M64
                    key = key ^ (key >> 24)
                    key = ((key + (key << 3)) + (key << 8)) & M64
                    key = key ^ (key >> 14)
                    key = ((key + (key << 2)) + (key << 4)) & M64
                    key = key ^ (key >> 28)
                    key = (key + (key << 31)) & M64
                    return key

                out.append((h64(x[j << 1]) + h64(x[j << 1 | 1])) & M64)
    return out


def test_seqcodes_roundtrip():
    assert list(seq_to_codes(b"ACGT-NM")) == [0, 1, 2, 3, 4, 5, 6]
    assert list(seq_to_codes(b"acgtUuX")) == [0, 1, 2, 3, 3, 3, 4]
    assert revcomp(b"ACGTN") == b"NACGT"
    # lowercase folds to UPPERCASE complement (secondary.rs:72-77)
    assert revcomp(b"acgt") == b"ACGT"


def test_yak_hash64_matches_scalar():
    rng = np.random.default_rng(0)
    for ksize in (5, 21, 31):
        mask = (1 << (2 * ksize)) - 1
        keys = rng.integers(0, mask + 1, size=200, dtype=np.uint64)
        got = yak_hash64(keys, mask)
        want = np.array([scalar_hash64(int(k), mask) for k in keys], dtype=np.uint64)
        np.testing.assert_array_equal(got, want)


def test_yak_hash64_64_matches_scalar():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 1 << 63, size=100, dtype=np.uint64)
    got = yak_hash64_64(keys)
    for k, g in zip(keys, got):
        key = int(k)
        key = (~key + (key << 21)) & M64
        key = key ^ (key >> 24)
        key = ((key + (key << 3)) + (key << 8)) & M64
        key = key ^ (key >> 14)
        key = ((key + (key << 2)) + (key << 4)) & M64
        key = key ^ (key >> 28)
        key = (key + (key << 31)) & M64
        assert int(g) == key


@pytest.mark.parametrize("ksize", [3, 5, 21, 31])
def test_rolling_kmers_small_k(ksize):
    rng = np.random.default_rng(2)
    seq = bytes(rng.choice(list(b"ACGTacgtN"), size=500).astype(np.uint8))
    got = seq_kmers(seq, ksize)
    want = scalar_kmers(seq, ksize)
    assert list(got) == want


@pytest.mark.parametrize("ksize", [32, 41, 63])
def test_rolling_kmers_large_k(ksize):
    rng = np.random.default_rng(3)
    seq = bytes(rng.choice(list(b"ACGTN"), size=300, p=[0.24, 0.24, 0.24, 0.24, 0.04]).astype(np.uint8))
    got = seq_kmers(seq, ksize)
    want = scalar_kmers(seq, ksize)
    assert [int(x) for x in got] == want


def test_canonical_is_strand_symmetric():
    seq = b"ACGTTGCATGCATGGCATCAGTTATATTCCGGA"
    for k in (7, 21):
        f = seq_kmers(seq, k)
        r = seq_kmers(revcomp(seq), k)
        assert sorted(map(int, f)) == sorted(map(int, r))


def test_kmer_to_seq():
    # AAC = 0b000001
    assert kmer_to_seq(0b000001, 3) == "AAC"
    assert kmer_to_seq(0, 4) == "AAAA"


def test_write_load_get_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    ksize = 21
    mask = (1 << (2 * ksize)) - 1
    kmers = rng.integers(0, mask, size=1000, dtype=np.uint64)
    hashes = yak_hash64(kmers, mask)
    hashes = np.unique(hashes)
    counts = rng.integers(1, 50, size=len(hashes))
    path = str(tmp_path / "t.yak")
    write_yak(path, ksize, hashes, counts)

    tab = load_yak(path)
    assert tab.ksize == ksize and tab.pre == 10
    got = tab.get(hashes)
    np.testing.assert_array_equal(got, counts.astype(np.uint16))
    # absent k-mers -> 0
    absent = (hashes ^ np.uint64(0x123456)) & np.uint64(mask)
    present_set = set((int(h) >> 10, int(h) & 1023) for h in hashes)
    miss = np.array([h for h in absent if (int(h) >> 10, int(h) & 1023) not in present_set],
                    dtype=np.uint64)
    assert (tab.get(miss) == 0).all()
    # min_count filtering: kept only if count >= min_count (kmer.rs:160-161)
    got5 = tab.get(hashes, min_count=5)
    np.testing.assert_array_equal(got5, np.where(counts >= 5, counts, 0).astype(np.uint16))


def test_count_kmers_counts_occurrences(tmp_path):
    seqs = [b"ACGTACGTACGT", b"ACGTACGTACGT"]
    hashes, counts = count_kmers(seqs, 5)
    # every 5-mer of the 12-mer appears twice across the two copies (some 5-mers repeat
    # within one sequence as well); total occurrences = 2 * 8
    assert counts.sum() == 16
    path = str(tmp_path / "c.yak")
    write_yak(path, 5, hashes, counts)
    tab = load_yak(path)
    km = seq_kmers(b"ACGTACGTACGT", 5)
    assert (tab.get(tab.to_hash(km)) >= 2).all()
